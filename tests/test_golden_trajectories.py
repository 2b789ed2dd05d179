"""Golden-trajectory regression tests.

Pin the exact sampled token trajectories of each sampler family on a
fixed seed/tiny model. Any refactor that changes the sampling
*distribution* or RNG plumbing trips these (the math-parity tests catch
formula errors; these catch accidental semantic drift). Goldens were
produced by the implementation validated against the reference math
(exact-Bayes posteriors, oracle-distribution checks) in round 1, on the
CPU backend pinned by tests/conftest.py.

If a deliberate change invalidates a golden, regenerate with:
    python tests/test_golden_trajectories.py --regen
"""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from ddg_tpu.diffusion import DiffusionSpec
from ddg_tpu.models import DIT, DITConfig, make_model_apply
from ddg_tpu.ops.noise_schedules import LogLinearNoise
from ddg_tpu.samplers import (GuidanceSpec, SamplerSpec, ar_sample,
                              diffusion_sample)

GOLDEN_PATH = os.path.join(os.path.dirname(__file__),
                           'golden_trajectories.json')
KEY = jax.random.PRNGKey(42)
V, MASK, B, L = 11, 10, 2, 16


def _cases():
    cfg = DITConfig(hidden_size=32, cond_dim=16, length=L, n_blocks=2,
                    n_heads=2, dropout=0.0, vocab_size=V, num_classes=3,
                    compute_dtype=jnp.float32)
    model = DIT(cfg)
    x = jax.random.randint(KEY, (B, L), 0, V)
    params = model.init(KEY, x, jnp.ones((B,)),
                        jnp.zeros((B,), jnp.int32))['params']
    params = jax.tree.map(
        lambda p: p + 0.05 * jax.random.normal(KEY, p.shape), params)
    apply_fn = make_model_apply(model)

    mdlm = DiffusionSpec(diffusion='absorbing_state',
                         parameterization='subs',
                         noise=LogLinearNoise(), vocab_size=V,
                         mask_index=MASK, num_classes=3)
    udlm = DiffusionSpec(diffusion='uniform', parameterization='d3pm',
                         noise=LogLinearNoise(), vocab_size=V,
                         mask_index=MASK, time_conditioning=True,
                         zero_recon_loss=True, num_classes=3)
    cond = jnp.ones((B,), jnp.int32)
    cfg_g = GuidanceSpec(method='cfg', gamma=2.0, condition=1)
    ar_cfg = DITConfig(hidden_size=32, cond_dim=16, length=L,
                       n_blocks=2, n_heads=2, dropout=0.0, vocab_size=V,
                       causal=True, use_adaLN=False,
                       compute_dtype=jnp.float32)
    ar_model = DIT(ar_cfg)
    ar_params = ar_model.init(KEY, x, None)['params']
    ar_params = jax.tree.map(
        lambda p: p + 0.05 * jax.random.normal(KEY, p.shape), ar_params)
    ar_apply = make_model_apply(ar_model)
    ar_spec = DiffusionSpec(diffusion='absorbing_state',
                            parameterization='ar',
                            noise=LogLinearNoise(), vocab_size=V,
                            mask_index=MASK)

    return {
        'mdlm_ancestral': lambda: diffusion_sample(
            mdlm, SamplerSpec(steps=8), apply_fn, params, KEY,
            batch_size=B, length=L),
        'mdlm_cfg': lambda: diffusion_sample(
            mdlm, SamplerSpec(steps=8), apply_fn, params, KEY,
            batch_size=B, length=L, guidance=cfg_g, cond=cond),
        'mdlm_first_hitting': lambda: diffusion_sample(
            mdlm, SamplerSpec(first_hitting=True), apply_fn, params,
            KEY, batch_size=B, length=L),
        'udlm_ancestral': lambda: diffusion_sample(
            udlm, SamplerSpec(steps=8, use_cache=False), apply_fn,
            params, KEY, batch_size=B, length=L),
        'udlm_cfg': lambda: diffusion_sample(
            udlm, SamplerSpec(steps=8, use_cache=False), apply_fn,
            params, KEY, batch_size=B, length=L, guidance=cfg_g,
            cond=cond),
        'ar': lambda: ar_sample(
            ar_spec, SamplerSpec(), ar_apply, ar_params, KEY,
            batch_size=B, length=L, bos_token_id=2),
    }


def test_golden_trajectories():
    golden = json.load(open(GOLDEN_PATH))
    for name, fn in _cases().items():
        got = np.asarray(fn()).tolist()
        assert got == golden[name], (
            f'{name} trajectory changed — if deliberate, regenerate '
            f'goldens (see module docstring)')


if __name__ == '__main__':
    import sys
    if '--regen' in sys.argv:
        out = {name: np.asarray(fn()).tolist()
               for name, fn in _cases().items()}
        json.dump(out, open(GOLDEN_PATH, 'w'), indent=1)
        print(f'wrote {GOLDEN_PATH}')
