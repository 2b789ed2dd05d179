"""Parity tests for the fused Mamba-block ("mamba_inner") Pallas
kernel (ops/mamba_block_pallas.py) against the unfused composite path
(in_proj -> conv+silu -> x_proj -> dt_proj -> selective_scan ->
out_proj with models/dimamba.py::selective_scan) — forward values AND
gradients wrt the input and every weight. Runs in TPU-interpret mode
on CPU.

Reference semantics being matched: mamba_inner_fn
(/root/reference/models/dimamba.py:176-195).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ddg_tpu.models.dimamba import selective_scan
from ddg_tpu.ops.mamba_block_pallas import mamba_inner_pallas

B, L, H, D_IN, N, R, K = 2, 64, 8, 16, 4, 2, 4
CHUNK, SEG = 16, 4


def _weights(seed=0, dtype=jnp.float32):
    ks = jax.random.split(jax.random.PRNGKey(seed), 11)
    h = jax.random.normal(ks[0], (B, L, H), dtype)
    W_in = jax.random.normal(ks[1], (H, 2 * D_IN), dtype) * 0.3
    conv_w = jax.random.normal(ks[2], (K, 1, D_IN), dtype) * 0.4
    conv_b = jax.random.normal(ks[3], (D_IN,), dtype) * 0.1
    W_x = jax.random.normal(ks[4], (D_IN, R + 2 * N), dtype) * 0.3
    W_dt = jax.random.normal(ks[5], (R, D_IN), jnp.float32) * 0.4
    b_dt = jax.random.normal(ks[6], (D_IN,), jnp.float32) * 0.2 - 1.0
    A = -jnp.exp(jax.random.normal(ks[7], (D_IN, N)) * 0.5)
    Dv = jax.random.normal(ks[8], (D_IN,), jnp.float32) * 0.5
    W_out = jax.random.normal(ks[9], (D_IN, H), dtype) * 0.3
    return h, W_in, conv_w, conv_b, W_x, W_dt, b_dt, A, Dv, W_out


def _composite(h, W_in, conv_w, conv_b, W_x, W_dt, b_dt, A, Dv, W_out,
               cd=jnp.float32):
    """The exact unfused chain of BiMambaWrapper + MambaCore
    (models/dimamba.py) for one direction."""
    xz = h.astype(cd) @ W_in.astype(cd)
    x, z = jnp.split(xz, 2, axis=-1)
    w = conv_w.astype(cd)
    acc = x * w[K - 1, 0][None, None, :]
    for j in range(K - 1):
        s = K - 1 - j
        shifted = jnp.pad(x[:, :-s], ((0, 0), (s, 0), (0, 0)))
        acc = acc + shifted * w[j, 0][None, None, :]
    u = jax.nn.silu(acc + conv_b.astype(cd))
    x_dbl = u @ W_x.astype(cd)
    dt_lr, Bc, Cc = jnp.split(x_dbl, [R, R + N], axis=-1)
    pre = jax.lax.dot_general(
        dt_lr.astype(jnp.float32), W_dt, (((2,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST) + b_dt
    delta = jax.nn.softplus(pre)
    y = selective_scan(u, delta, A, Bc, Cc, Dv, z, chunk=CHUNK)
    return (y.astype(cd) @ W_out.astype(cd)).astype(jnp.float32)


_fused = functools.partial(mamba_inner_pallas, d_state=N, dt_rank=R,
                           chunk=CHUNK, seg=SEG, seg_bwd=SEG,
                           interpret=True, compute_dtype=jnp.float32)


def test_forward_matches_composite():
    args = _weights()
    out_f = _fused(*args).astype(jnp.float32)
    out_c = _composite(*args)
    np.testing.assert_allclose(out_f, out_c, rtol=3e-5, atol=3e-5)


def test_forward_bf16_close():
    args = _weights(seed=3)
    out_f = jnp.asarray(
        mamba_inner_pallas(*args, d_state=N, dt_rank=R, chunk=CHUNK,
                           seg=SEG, seg_bwd=SEG, interpret=True,
                           compute_dtype=jnp.bfloat16),
        jnp.float32)
    out_c = _composite(*args, cd=jnp.bfloat16)
    # bf16 summation-order differences (conv tap order, fused matmul
    # rounding points) dominate: sanity bound, not bit parity.
    scale = float(jnp.max(jnp.abs(out_c))) + 1e-6
    np.testing.assert_allclose(out_f / scale, out_c / scale,
                               atol=8e-2)


def test_gradients_match_composite():
    args = _weights(seed=1)
    w = jax.random.normal(jax.random.PRNGKey(2), (B, L, H))

    def loss(fn, *a):
        return jnp.sum(fn(*a).astype(jnp.float32) * w)

    g_f = jax.grad(functools.partial(loss, _fused),
                   argnums=tuple(range(10)))(*args)
    g_c = jax.grad(functools.partial(loss, _composite),
                   argnums=tuple(range(10)))(*args)
    names = ['h', 'W_in', 'conv_w', 'conv_b', 'W_x', 'W_dt', 'b_dt',
             'A', 'D', 'W_out']
    for name, a, b in zip(names, g_f, g_c):
        scale = float(jnp.max(jnp.abs(b))) + 1e-6
        np.testing.assert_allclose(
            np.asarray(a, np.float32) / scale,
            np.asarray(b, np.float32) / scale,
            rtol=2e-4, atol=2e-4, err_msg=f'grad {name}')


def test_dimamba_model_fused_vs_unfused():
    """Full DiMamba with fused_block=True (interpret) matches the
    unfused model — identical param tree, forward logits, and grads."""
    from ddg_tpu.models.dimamba import DiMamba, DiMambaConfig

    base = dict(hidden_size=16, cond_dim=8, length=L, n_blocks=2,
                vocab_size=11, d_state=N, d_conv=K, expand=2,
                scan_chunk=CHUNK, scan_seg=SEG, scan_seg_bwd=SEG,
                pallas_scan=False, dropout=0.0,
                compute_dtype=jnp.float32)
    cfg_u = DiMambaConfig(**base, fused_block=False)
    cfg_f = DiMambaConfig(**base, fused_block=True,
                          pallas_interpret=True)
    rng = jax.random.PRNGKey(0)
    idx = jax.random.randint(jax.random.PRNGKey(1), (B, L), 0, 11)
    sigma = jnp.full((B,), 0.4)
    m_u, m_f = DiMamba(cfg_u), DiMamba(cfg_f)
    p_u = m_u.init(rng, idx, sigma)
    p_f = m_f.init(rng, idx, sigma)
    assert (jax.tree_util.tree_structure(p_u)
            == jax.tree_util.tree_structure(p_f))
    for ku, kf in zip(jax.tree_util.tree_leaves(p_u),
                      jax.tree_util.tree_leaves(p_f)):
        np.testing.assert_array_equal(np.asarray(ku), np.asarray(kf))

    out_u = m_u.apply(p_u, idx, sigma)
    out_f = m_f.apply(p_u, idx, sigma)
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_u),
                               rtol=2e-4, atol=2e-4)

    w = jax.random.normal(jax.random.PRNGKey(2), out_u.shape)

    def loss(m, p):
        return jnp.sum(m.apply(p, idx, sigma) * w)

    g_u = jax.grad(lambda p: loss(m_u, p))(p_u)
    g_f = jax.grad(lambda p: loss(m_f, p))(p_u)
    flat_u = jax.tree_util.tree_leaves_with_path(g_u)
    flat_f = jax.tree_util.tree_leaves(g_f)
    for (path, a), b in zip(flat_u, flat_f):
        scale = float(jnp.max(jnp.abs(a))) + 1e-6
        np.testing.assert_allclose(
            np.asarray(b, np.float32) / scale,
            np.asarray(a, np.float32) / scale,
            rtol=3e-4, atol=3e-4,
            err_msg=f'grad {jax.tree_util.keystr(path)}')


def test_chunk_boundary_carries():
    """Single-chunk vs multi-chunk fused results agree (halo + state
    carries across chunks are exact)."""
    args = _weights(seed=4)
    out_multi = _fused(*args)
    out_single = mamba_inner_pallas(
        *args, d_state=N, dt_rank=R, chunk=L, seg=SEG, seg_bwd=SEG,
        interpret=True, compute_dtype=jnp.float32)
    np.testing.assert_allclose(out_multi, out_single, rtol=3e-5,
                               atol=3e-5)
