"""Verify drive (round-3): tiny DiT + diffusion_sample on the real TPU
chip — ancestral fused CFG, ancestral unfused, first-hitting. Asserts
no undecoded mask tokens and pairwise empirical TV < 0.03 over 8 seeds.
"""
import dataclasses
import time

import jax
import jax.numpy as jnp
import numpy as np

from ddg_tpu.diffusion import DiffusionSpec
from ddg_tpu.models import DIT, DITConfig, make_model_apply
from ddg_tpu.ops.noise_schedules import LogLinearNoise
from ddg_tpu.samplers import GuidanceSpec, SamplerSpec, diffusion_sample

print('devices:', jax.devices())

cfg = DITConfig(hidden_size=64, cond_dim=32, length=64, n_blocks=2,
                n_heads=2, dropout=0.0, vocab_size=33, num_classes=2,
                logits_dtype=jnp.bfloat16)
spec = DiffusionSpec(diffusion='absorbing_state', parameterization='subs',
                     noise=LogLinearNoise(), vocab_size=cfg.vocab_size,
                     mask_index=cfg.vocab_size - 1, num_classes=2)
model = DIT(cfg)
apply_fn = make_model_apply(model)

rng = jax.random.PRNGKey(0)
x0 = jax.random.randint(rng, (1, cfg.length), 0, cfg.vocab_size)
params = model.init(rng, x0, jnp.ones((1,)), jnp.zeros((1,), jnp.int32))['params']
guidance = GuidanceSpec(method='cfg', gamma=1.5, condition=0)
B = 16
cond = jnp.zeros((B,), jnp.int32)

variants = {
    'ancestral_fused': SamplerSpec(steps=64, fused=True, use_cache=False),
    'ancestral_unfused': SamplerSpec(steps=64, fused=False, use_cache=False),
    'first_hitting': SamplerSpec(steps=64, first_hitting=True),
}

hists = {}
for name, sampler in variants.items():
    @jax.jit
    def run(params, key, sampler=sampler):
        return diffusion_sample(spec, sampler, apply_fn, params, key,
                                batch_size=B, length=cfg.length,
                                guidance=guidance, cond=cond, dit_cfg=cfg)
    t0 = time.time()
    outs = []
    n_mask = 0
    for s in range(8):
        out = np.asarray(run(params, jax.random.PRNGKey(100 + s)))
        n_mask += int((out == spec.mask_index).sum())
        outs.append(out)
    allv = np.concatenate(outs).ravel()
    # Residual masks are a legitimate tail event of the reference
    # process: P(token never unmasks) = move_chance(eps) ~ 1e-5, so
    # E[masks] ~ 0.08 over 8192 tokens. Bound at 5 (P ~ 1e-9 if the
    # kernel is correct); exclude the mask channel from the TV check.
    print(f'{name}: residual masks = {n_mask} / {allv.size}')
    assert n_mask <= 5, f'{name}: {n_mask} mask tokens — kernel bug'
    h = np.bincount(allv, minlength=cfg.vocab_size).astype(np.float64)
    h[spec.mask_index] = 0
    hists[name] = h / h.sum()
    print(f'{name}: ok in {time.time()-t0:.1f}s, {allv.size} tokens')

names = list(hists)
N = 8 * B * cfg.length
for i in range(len(names)):
    for j in range(i + 1, len(names)):
        hi, hj = hists[names[i]], hists[names[j]]
        tv = 0.5 * np.abs(hi - hj).sum()
        # Two-sample binomial noise floor: both histograms are
        # empirical (variance doubles vs one-sided comparison):
        # E[TV] ~ 0.5 * sum_v sqrt(4 q_v (1-q_v) / (pi N)).
        q = 0.5 * (hi + hj)
        floor = 0.5 * np.sum(np.sqrt(4 * q * (1 - q) / (np.pi * N)))
        print(f'TV({names[i]}, {names[j]}) = {tv:.4f} '
              f'(floor {floor:.4f}, ratio {tv / floor:.2f})')
        assert tv < 2.0 * floor, \
            f'TV {tv} > 2x noise floor {floor}: {names[i]} vs {names[j]}'
print('VERIFY DRIVE PASSED')
