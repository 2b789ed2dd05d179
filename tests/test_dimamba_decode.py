"""Stateful DiMamba decode must match the full unidirectional forward."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ddg_tpu.models.dimamba import DiMamba, DiMambaConfig
from ddg_tpu.models.dimamba_decode import decode_step, init_cache

KEY = jax.random.PRNGKey(0)
CFG = DiMambaConfig(hidden_size=16, cond_dim=16, length=20, n_blocks=2,
                    vocab_size=12, d_state=4, d_conv=4, scan_chunk=8,
                    bidirectional=False, use_adaLN=False, dropout=0.0,
                    compute_dtype=jnp.float32)


def test_decode_matches_full_forward():
    model = DiMamba(CFG)
    x = jax.random.randint(KEY, (2, CFG.length), 0, CFG.vocab_size)
    params = model.init(KEY, x, None)['params']
    params = jax.tree.map(
        lambda p: p + 0.02 * jax.random.normal(KEY, p.shape), params)
    full = model.apply({'params': params}, x, None)
    cache = init_cache(CFG, 2)
    for pos in range(CFG.length):
        logits, cache = decode_step(CFG, params, cache, x[:, pos])
        np.testing.assert_allclose(
            np.asarray(logits), np.asarray(full[:, pos]), atol=2e-3,
            rtol=1e-2, err_msg=f'pos {pos}')


def test_decode_with_adaln_cond():
    cfg = dataclasses.replace(CFG, use_adaLN=True, num_classes=3)
    model = DiMamba(cfg)
    x = jax.random.randint(KEY, (2, cfg.length), 0, cfg.vocab_size)
    cond = jnp.asarray([0, 2])
    # AR DiMamba: sigma None but cond present (CFG AR)
    params = model.init(KEY, x, None, cond)['params']
    params = jax.tree.map(
        lambda p: p + 0.02 * jax.random.normal(KEY, p.shape), params)
    full = model.apply({'params': params}, x, None, cond)
    cache = init_cache(cfg, 2)
    for pos in range(cfg.length):
        logits, cache = decode_step(cfg, params, cache, x[:, pos],
                                    cond=cond)
        np.testing.assert_allclose(
            np.asarray(logits), np.asarray(full[:, pos]), atol=2e-3,
            rtol=1e-2, err_msg=f'pos {pos}')


def test_decode_in_scan():
    model = DiMamba(CFG)
    x = jax.random.randint(KEY, (2, CFG.length), 0, CFG.vocab_size)
    params = model.init(KEY, x, None)['params']

    def step(carry, _):
        cache, tok = carry
        logits, cache = decode_step(CFG, params, cache, tok)
        nxt = logits.argmax(-1).astype(jnp.int32)
        return (cache, nxt), nxt

    (_, _), toks = jax.lax.scan(step, (init_cache(CFG, 2), x[:, 0]),
                                None, length=CFG.length - 1)
    assert toks.shape == (CFG.length - 1, 2)


def test_ar_sample_with_dimamba_decode():
    from ddg_tpu.diffusion import DiffusionSpec
    from ddg_tpu.models import make_model_apply
    from ddg_tpu.ops.noise_schedules import LogLinearNoise
    from ddg_tpu.samplers import SamplerSpec, ar_sample

    model = DiMamba(CFG)
    x = jax.random.randint(KEY, (2, CFG.length), 0, CFG.vocab_size)
    params = model.init(KEY, x, None)['params']
    params = jax.tree.map(
        lambda p: p + 0.02 * jax.random.normal(KEY, p.shape), params)
    spec = DiffusionSpec(diffusion='absorbing_state',
                         parameterization='ar',
                         noise=LogLinearNoise(),
                         vocab_size=CFG.vocab_size,
                         mask_index=CFG.vocab_size - 1)
    apply_fn = make_model_apply(model)
    slow = ar_sample(spec, SamplerSpec(), apply_fn, params, KEY,
                     batch_size=2, length=CFG.length, bos_token_id=2)
    fast = ar_sample(spec, SamplerSpec(), apply_fn, params, KEY,
                     batch_size=2, length=CFG.length, bos_token_id=2,
                     decode_cfg=CFG)
    # fp differences between scan paths can flip near-ties; require
    # exact agreement on >90% of positions and identical BOS
    agree = float((np.asarray(slow) == np.asarray(fast)).mean())
    assert agree > 0.9, agree
