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
