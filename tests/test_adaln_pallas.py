"""Parity tests for the fused adaLN chain kernels
(ops/adaln_pallas.py) in Pallas interpret mode: kernel-level math vs
the naive chain, and full-model DIT forward+grad parity vs the unfused
path (same params — AdaLNLayerNorm's params_only accessor keeps the
tree identical)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ddg_tpu.models.dit import DIT, DITConfig
from ddg_tpu.ops.adaln_pallas import gate_res_ln_modulate, ln_modulate

B, L, D = 2, 256, 128


def _naive_ln(x, w):
    x32 = x.astype(jnp.float32)
    m1 = x32.mean(-1, keepdims=True)
    m2 = (x32 * x32).mean(-1, keepdims=True)
    var = jnp.maximum(m2 - m1 * m1, 0.0)
    return (x32 - m1) * jax.lax.rsqrt(var + 1e-5) * w


def _rand(key, *shape):
    return jax.random.normal(key, shape, jnp.float32)


@pytest.fixture(scope='module')
def tensors():
    ks = jax.random.split(jax.random.PRNGKey(0), 7)
    return dict(y=_rand(ks[0], B, L, D), skip=_rand(ks[1], B, L, D),
                gate=_rand(ks[2], B, D), w=1.0 + 0.1 * _rand(ks[3], D),
                shift=_rand(ks[4], B, D), scale=_rand(ks[5], B, D),
                dh=_rand(ks[6], B, L, D))


def test_ln_modulate_forward(tensors):
    t = tensors
    h = ln_modulate(t['y'], t['w'], t['shift'], t['scale'],
                    interpret=True)
    ref = (_naive_ln(t['y'], t['w']) * (1 + t['scale'][:, None])
           + t['shift'][:, None])
    np.testing.assert_allclose(np.asarray(h), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_ln_modulate_grads(tensors):
    t = tensors

    def fused(y, w, sh, sc):
        return jnp.sum(ln_modulate(y, w, sh, sc, interpret=True)
                       * t['dh'])

    def naive(y, w, sh, sc):
        return jnp.sum((_naive_ln(y, w) * (1 + sc[:, None])
                        + sh[:, None]) * t['dh'])

    gf = jax.grad(fused, argnums=(0, 1, 2, 3))(
        t['y'], t['w'], t['shift'], t['scale'])
    gn = jax.grad(naive, argnums=(0, 1, 2, 3))(
        t['y'], t['w'], t['shift'], t['scale'])
    for a, b in zip(gf, gn):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-4, rtol=1e-4)


def test_gate_res_forward(tensors):
    t = tensors
    x, h = gate_res_ln_modulate(t['y'], t['skip'], t['gate'], t['w'],
                                t['shift'], t['scale'], interpret=True)
    x_ref = t['skip'] + t['gate'][:, None] * t['y']
    h_ref = (_naive_ln(x_ref, t['w']) * (1 + t['scale'][:, None])
             + t['shift'][:, None])
    np.testing.assert_allclose(np.asarray(x), np.asarray(x_ref),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(h), np.asarray(h_ref),
                               atol=1e-5, rtol=1e-5)


def test_gate_res_grads(tensors):
    t = tensors
    dx = _rand(jax.random.PRNGKey(9), B, L, D)

    def fused(y, skip, gate, w, sh, sc):
        x, h = gate_res_ln_modulate(y, skip, gate, w, sh, sc,
                                    interpret=True)
        return jnp.sum(x * dx) + jnp.sum(h * t['dh'])

    def naive(y, skip, gate, w, sh, sc):
        x = skip + gate[:, None] * y
        h = _naive_ln(x, w) * (1 + sc[:, None]) + sh[:, None]
        return jnp.sum(x * dx) + jnp.sum(h * t['dh'])

    args = (t['y'], t['skip'], t['gate'], t['w'], t['shift'],
            t['scale'])
    gf = jax.grad(fused, argnums=tuple(range(6)))(*args)
    gn = jax.grad(naive, argnums=tuple(range(6)))(*args)
    for a, b in zip(gf, gn):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-4, rtol=1e-4)


def test_dit_model_parity_fused_adaln():
    """Full DIT forward + grads: fused_adaln='interpret' vs the
    unfused default, same params."""
    cfg = DITConfig(hidden_size=64, cond_dim=32, length=128,
                    n_blocks=2, n_heads=4, dropout=0.0, vocab_size=17,
                    num_classes=3, compute_dtype=jnp.float32,
                    fused_adaln=False)
    cfg_f = dataclasses.replace(cfg, fused_adaln='interpret')
    model_u, model_f = DIT(cfg), DIT(cfg_f)
    rng = jax.random.PRNGKey(0)
    x = jax.random.randint(rng, (2, 128), 0, 17)
    sigma = jnp.full((2,), 0.4)
    cond = jnp.array([0, 2], jnp.int32)
    params = model_u.init(rng, x, sigma, cond)
    w = jax.random.normal(jax.random.PRNGKey(1), (2, 128, 17)) / 256

    def loss(model):
        return lambda p: jnp.sum(model.apply(p, x, sigma, cond) * w)

    lu, gu = jax.value_and_grad(loss(model_u))(params)
    lf, gf = jax.value_and_grad(loss(model_f))(params)
    np.testing.assert_allclose(float(lu), float(lf), rtol=1e-5)
    for (path, a), b in zip(jax.tree_util.tree_leaves_with_path(gu),
                            jax.tree_util.tree_leaves(gf)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-5, rtol=1e-4,
            err_msg=jax.tree_util.keystr(path))
