"""KV-cache decode must match the full causal forward per position."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ddg_tpu.models.dit import DIT, DITConfig
from ddg_tpu.models.dit_decode import decode_step, init_cache

KEY = jax.random.PRNGKey(0)
CFG = DITConfig(hidden_size=32, cond_dim=16, length=12, n_blocks=2,
                n_heads=2, dropout=0.0, vocab_size=11, causal=True,
                use_adaLN=False, compute_dtype=jnp.float32)


def _setup(cfg=CFG, cond=None):
    model = DIT(cfg)
    x = jax.random.randint(KEY, (2, cfg.length), 0, cfg.vocab_size)
    params = model.init(KEY, x, None, cond)['params']
    params = jax.tree.map(
        lambda p: p + 0.02 * jax.random.normal(KEY, p.shape), params)
    return model, params, x


def test_decode_matches_full_forward():
    model, params, x = _setup()
    full = model.apply({'params': params}, x, None)
    cache = init_cache(CFG, 2)
    for pos in range(CFG.length):
        logits, cache = decode_step(CFG, params, cache, x[:, pos],
                                    jnp.asarray(pos))
        np.testing.assert_allclose(np.asarray(logits),
                                   np.asarray(full[:, pos]), atol=2e-4,
                                   rtol=1e-3)


def test_decode_with_cond_matches():
    cfg = dataclasses.replace(CFG, use_adaLN=True, num_classes=3)
    cond = jnp.asarray([0, 2])
    model, params, x = _setup(cfg, cond)
    full = model.apply({'params': params}, x, None, cond)
    cache = init_cache(cfg, 2)
    for pos in range(cfg.length):
        logits, cache = decode_step(cfg, params, cache, x[:, pos],
                                    jnp.asarray(pos), cond=cond)
        np.testing.assert_allclose(np.asarray(logits),
                                   np.asarray(full[:, pos]), atol=2e-4,
                                   rtol=1e-3)


def test_decode_int8_kv_close_to_fp():
    """int8 KV cache tracks the exact cache at quantization error.

    Per-row int8 over head_dim bounds the k/v relative error at
    ~1/254 per element; through the softmax+value dot the logits stay
    within ~1% relative of the exact path on random weights.
    """
    model, params, x = _setup()
    full = model.apply({'params': params}, x, None)
    cache = init_cache(CFG, 2, kv_int8=True)
    assert cache['k'].dtype == jnp.int8
    for pos in range(CFG.length):
        logits, cache = decode_step(CFG, params, cache, x[:, pos],
                                    jnp.asarray(pos))
        ref = np.asarray(full[:, pos])
        err = np.abs(np.asarray(logits) - ref).max()
        span = np.abs(ref).max()
        assert err < 0.02 * span, \
            f'pos {pos}: abs err {err} vs logit scale {span}'


def test_decode_in_scan():
    """decode_step composes with lax.scan (static shapes)."""
    model, params, x = _setup()

    def step(carry, pos):
        cache, tok = carry
        logits, cache = decode_step(CFG, params, cache, tok, pos)
        nxt = logits.argmax(-1).astype(jnp.int32)
        return (cache, nxt), nxt

    cache = init_cache(CFG, 2)
    (_, _), toks = jax.lax.scan(step, (cache, x[:, 0]),
                                jnp.arange(CFG.length - 1))
    assert toks.shape == (CFG.length - 1, 2)
