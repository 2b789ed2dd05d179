"""Equality tests for the fused short-sequence attention kernel
(ops/attention_pallas.py) against jax.nn.dot_product_attention —
values AND gradients (custom VJP recomputes through the jnp
reference). Interpret mode on CPU (no PRNG involved).

Reference being replaced: F.scaled_dot_product_attention
(/root/reference/models/dit.py:304-307).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ddg_tpu.ops.attention_pallas import short_seq_attention

B, L, H, D = 2, 32, 4, 16


def _qkv(seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 3)
    shape = (B, L, H, D)
    return tuple(jax.random.normal(k, shape, jnp.float32) * 0.5
                 for k in ks)


@pytest.mark.parametrize('causal', [False, True])
def test_matches_jax_nn(causal):
    q, k, v = _qkv()
    ref = jax.nn.dot_product_attention(q, k, v, is_causal=causal)
    out = short_seq_attention(q, k, v, causal=causal, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


@pytest.mark.parametrize('causal', [False, True])
def test_grads_match(causal):
    q, k, v = _qkv(1)

    def loss_ref(q, k, v):
        return (jax.nn.dot_product_attention(q, k, v, is_causal=causal)
                ** 2).sum()

    def loss_pal(q, k, v):
        return (short_seq_attention(q, k, v, causal=causal,
                                    interpret=True) ** 2).sum()

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    g_pal = jax.grad(loss_pal, argnums=(0, 1, 2))(q, k, v)
    for name, a, b in zip('qkv', g_ref, g_pal):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=5e-4, rtol=5e-4,
                                   err_msg=name)


def test_odd_head_count():
    # In-kernel head unroll must not assume powers of two.
    ks = jax.random.split(jax.random.PRNGKey(2), 3)
    q, k, v = (jax.random.normal(kk, (2, 32, 3, 16), jnp.float32) * 0.5
               for kk in ks)
    out = short_seq_attention(q, k, v, interpret=True)
    ref = jax.nn.dot_product_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def _rope_tables(length, head_dim):
    inv = 1.0 / (10000 ** (jnp.arange(0, head_dim, 2,
                                      dtype=jnp.float32) / head_dim))
    freqs = jnp.arange(length, dtype=jnp.float32)[:, None] * inv[None]
    return jnp.cos(freqs), jnp.sin(freqs)


def _rope_apply(x, cos, sin):
    # mirrors models/dit.py::apply_rope (contiguous-half convention)
    d2 = x.shape[-1] // 2
    c, s = cos[None, :, None, :], sin[None, :, None, :]
    x1, x2 = x[..., :d2], x[..., d2:]
    return jnp.concatenate([x1 * c - x2 * s, x2 * c + x1 * s], -1)


@pytest.mark.parametrize('causal', [False, True])
def test_fused_rope_attention(causal):
    """fused_rope_attention == apply_rope(q), apply_rope(k) -> sdpa
    (the DDiTBlock composition it replaces), values and grads."""
    from ddg_tpu.ops.attention_pallas import fused_rope_attention
    Dh = 64  # H*Dh = 256: 128-divisible, exercises the kernel path
    ks = jax.random.split(jax.random.PRNGKey(3), 3)
    q, k, v = (jax.random.normal(kk, (2, 32, 4, Dh), jnp.float32) * 0.5
               for kk in ks)
    cos, sin = _rope_tables(32, Dh)

    def composed(q, k, v):
        return jax.nn.dot_product_attention(
            _rope_apply(q, cos, sin), _rope_apply(k, cos, sin), v,
            is_causal=causal)

    ref = composed(q, k, v)
    out = fused_rope_attention(q, k, v, cos, sin, causal=causal,
                               interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)

    g_ref = jax.grad(lambda *a: (composed(*a) ** 2).sum(),
                     argnums=(0, 1, 2))(q, k, v)
    g_fus = jax.grad(
        lambda *a: (fused_rope_attention(*a, cos, sin, causal=causal,
                                         interpret=True) ** 2).sum(),
        argnums=(0, 1, 2))(q, k, v)
    for name, a, b in zip('qkv', g_ref, g_fus):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=5e-4, rtol=5e-4, err_msg=name)


def test_fused_rope_attention_fallback():
    # H*Dh not 128-divisible -> jnp fallback, still correct.
    from ddg_tpu.ops.attention_pallas import fused_rope_attention
    ks = jax.random.split(jax.random.PRNGKey(4), 3)
    q, k, v = (jax.random.normal(kk, (2, 16, 3, 16), jnp.float32) * 0.5
               for kk in ks)
    cos, sin = _rope_tables(16, 16)
    ref = jax.nn.dot_product_attention(
        _rope_apply(q, cos, sin), _rope_apply(k, cos, sin), v)
    out = fused_rope_attention(q, k, v, cos, sin)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)
