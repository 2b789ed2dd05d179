"""Equality tests for the Pallas selective-scan kernel
(ops/selective_scan_pallas.py) against (a) the XLA chunked
associative-scan implementation (models/dimamba.py::selective_scan)
and (b) a naive sequential recurrence — forward values AND gradients
(custom VJP). Runs in TPU-interpret mode on CPU (no PRNG involved, so
the interpreter is faithful here).

Reference semantics being matched: mamba selective_scan_fn
(/root/reference/models/dimamba.py:230-249).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ddg_tpu.models.dimamba import selective_scan
from ddg_tpu.ops.selective_scan_pallas import selective_scan_pallas

B, L, D, N = 2, 37, 16, 4          # L deliberately not chunk-aligned
CHUNK = 16


def _inputs(seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 7)
    u = jax.random.normal(ks[0], (B, L, D))
    delta = jax.nn.softplus(jax.random.normal(ks[1], (B, L, D)) - 1)
    A = -jnp.exp(jax.random.normal(ks[2], (D, N)) * 0.5)
    Bc = jax.random.normal(ks[3], (B, L, N))
    Cc = jax.random.normal(ks[4], (B, L, N))
    Dp = jax.random.normal(ks[5], (D,))
    z = jax.random.normal(ks[6], (B, L, D))
    return u, delta, A, Bc, Cc, Dp, z


def _naive(u, delta, A, Bc, Cc, Dp, z):
    h = jnp.zeros((B, D, N))
    ys = []
    for t in range(L):
        a = jnp.exp(delta[:, t, :, None] * A[None])
        b = (delta[:, t] * u[:, t])[..., None] * Bc[:, t, None, :]
        h = a * h + b
        ys.append((h * Cc[:, t, None, :]).sum(-1))
    y = jnp.stack(ys, axis=1) + Dp[None, None] * u
    return y * jax.nn.silu(z)


_pallas = functools.partial(selective_scan_pallas, chunk=CHUNK,
                            d_tile=8, d_tile_bwd=8, interpret=True)


def test_forward_matches_xla_scan_and_naive():
    u, delta, A, Bc, Cc, Dp, z = _inputs()
    y_pl = _pallas(u, delta, A, Bc, Cc, Dp, z)
    y_xla = selective_scan(u, delta, A, Bc, Cc, Dp, z, chunk=CHUNK)
    y_naive = _naive(u, delta, A, Bc, Cc, Dp, z)
    np.testing.assert_allclose(y_pl, y_xla, rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(y_pl, y_naive, rtol=2e-5, atol=2e-5)


def test_gradients_match_xla_scan():
    u, delta, A, Bc, Cc, Dp, z = _inputs(seed=1)
    # Weighted-sum loss so every output position gets a distinct
    # cotangent (catches transposition/shift bugs in the adjoint).
    wkey = jax.random.PRNGKey(2)
    w = jax.random.normal(wkey, (B, L, D))

    def loss(fn, *args):
        return (fn(*args) * w).sum()

    args = (u, delta, A, Bc, Cc, Dp, z)
    g_pl = jax.grad(functools.partial(loss, _pallas),
                    argnums=tuple(range(7)))(*args)
    g_xla = jax.grad(
        functools.partial(
            loss, functools.partial(selective_scan, chunk=CHUNK)),
        argnums=tuple(range(7)))(*args)
    names = ['u', 'delta', 'A', 'B', 'C', 'D', 'z']
    for name, a, b in zip(names, g_pl, g_xla):
        np.testing.assert_allclose(a, b, rtol=5e-4, atol=5e-5,
                                   err_msg=f'grad mismatch: {name}')


def test_forward_bf16_inputs():
    u, delta, A, Bc, Cc, Dp, z = _inputs(seed=3)
    y_pl = _pallas(u.astype(jnp.bfloat16), delta, A,
                   Bc.astype(jnp.bfloat16), Cc.astype(jnp.bfloat16),
                   Dp, z.astype(jnp.bfloat16))
    y_xla = selective_scan(u.astype(jnp.bfloat16), delta, A,
                           Bc.astype(jnp.bfloat16),
                           Cc.astype(jnp.bfloat16), Dp,
                           z.astype(jnp.bfloat16), chunk=CHUNK)
    assert y_pl.dtype == y_xla.dtype == jnp.bfloat16
    np.testing.assert_allclose(y_pl.astype(jnp.float32),
                               y_xla.astype(jnp.float32),
                               rtol=2e-2, atol=2e-2)


def test_bf16_scan_dtype_close():
    """scan_dtype=bfloat16 runs the in-kernel affine scan at half VPU
    width via the slice+concat shift path (Mosaic has no sub-32-bit
    rotate); values stay within bf16 rounding of the fp32 kernel."""
    u, delta, A, Bc, Cc, Dp, z = _inputs(seed=6)
    y32 = _pallas(u, delta, A, Bc, Cc, Dp, z)
    y16 = functools.partial(
        selective_scan_pallas, chunk=CHUNK, d_tile=8, d_tile_bwd=8,
        interpret=True, scan_dtype=jnp.bfloat16)(
            u, delta, A, Bc, Cc, Dp, z)
    np.testing.assert_allclose(y16, y32, rtol=3e-2, atol=3e-2)


def test_seg_bwd_gradients_match():
    """A backward-pass segment length different from the forward's
    (the measured-fastest v5e config: seg=8 fwd / seg=4 bwd) changes
    only the in-kernel scan schedule, not the values."""
    u, delta, A, Bc, Cc, Dp, z = _inputs(seed=4)
    w = jax.random.normal(jax.random.PRNGKey(7), (B, L, D))
    args = (u, delta, A, Bc, Cc, Dp, z)

    def loss(fn, *a):
        return (fn(*a) * w).sum()

    mixed = functools.partial(selective_scan_pallas, chunk=CHUNK,
                              d_tile=8, d_tile_bwd=8, interpret=True,
                              seg=8, seg_bwd=4)
    g_mixed = jax.grad(functools.partial(loss, mixed),
                       argnums=tuple(range(7)))(*args)
    g_ref = jax.grad(functools.partial(loss, _pallas),
                     argnums=tuple(range(7)))(*args)
    for name, a, b in zip(['u', 'delta', 'A', 'B', 'C', 'D', 'z'],
                          g_mixed, g_ref):
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6,
                                   err_msg=f'grad mismatch: {name}')


def test_dt_lowrank_matches_composite():
    """dt-lowrank kernel (dt_proj + softplus in-kernel,
    selective_scan_pallas_dtlr) == softplus(dtlr @ W + b) fed to the
    plain kernel — forward exactly, all nine grads to ~1e-6."""
    from ddg_tpu.ops.selective_scan_pallas import \
        selective_scan_pallas_dtlr

    R = 4
    L_al = 32  # dtlr path requires chunk | L
    ks = jax.random.split(jax.random.PRNGKey(5), 9)
    u = jax.random.normal(ks[0], (B, L_al, D))
    dtlr = jax.random.normal(ks[1], (B, L_al, R)) * 0.5
    Wdt = jax.random.normal(ks[2], (R, D)) * 0.3
    bdt = jax.random.normal(ks[3], (D,)) - 1.0
    A = -jnp.exp(jax.random.normal(ks[4], (D, N)) * 0.5)
    Bc = jax.random.normal(ks[5], (B, L_al, N))
    Cc = jax.random.normal(ks[6], (B, L_al, N))
    Dp = jax.random.normal(ks[7], (D,))
    z = jax.random.normal(ks[8], (B, L_al, D))

    lr = functools.partial(selective_scan_pallas_dtlr, chunk=CHUNK,
                           d_tile=8, d_tile_bwd=8, interpret=True)

    def composite(u, dtlr, Wdt, bdt, A, Bc, Cc, Dp, z):
        delta = jax.nn.softplus(dtlr @ Wdt + bdt)
        return _pallas(u, delta, A, Bc, Cc, Dp, z)

    args = (u, dtlr, Wdt, bdt, A, Bc, Cc, Dp, z)
    np.testing.assert_allclose(lr(*args), composite(*args), atol=1e-6)

    w = jax.random.normal(jax.random.PRNGKey(6), (B, L_al, D))
    g_lr = jax.grad(lambda *a: (lr(*a) * w).sum(),
                    argnums=tuple(range(9)))(*args)
    g_ref = jax.grad(lambda *a: (composite(*a) * w).sum(),
                     argnums=tuple(range(9)))(*args)
    names = ['u', 'dtlr', 'Wdt', 'bdt', 'A', 'B', 'C', 'D', 'z']
    for name, a, b in zip(names, g_lr, g_ref):
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5,
                                   err_msg=f'grad mismatch: {name}')


def test_dt_lowrank_rejects_unaligned_length():
    from ddg_tpu.ops.selective_scan_pallas import \
        selective_scan_pallas_dtlr

    import pytest
    with pytest.raises(ValueError, match='chunk'):
        selective_scan_pallas_dtlr(
            jnp.zeros((1, 17, D)), jnp.zeros((1, 17, 4)),
            jnp.zeros((4, D)), jnp.zeros((D,)),
            -jnp.ones((D, N)), jnp.zeros((1, 17, N)),
            jnp.zeros((1, 17, N)), jnp.zeros((D,)),
            jnp.zeros((1, 17, D)), chunk=CHUNK, interpret=True)


def test_pps_scan_impl_matches():
    """'pps' (parallel-over-segments, sequential-within) is a pure
    schedule change of the within-chunk scan: forward values and all
    seven gradients must match the default 'hybrid' kernel."""
    u, delta, A, Bc, Cc, Dp, z = _inputs(seed=8)
    w = jax.random.normal(jax.random.PRNGKey(9), (B, L, D))
    args = (u, delta, A, Bc, Cc, Dp, z)
    pps = functools.partial(selective_scan_pallas, chunk=CHUNK,
                            d_tile=8, d_tile_bwd=8, interpret=True,
                            seg=4, seg_bwd=4, scan_impl='pps')
    y_pps = pps(*args)
    y_ref = _pallas(*args)
    np.testing.assert_allclose(y_pps, y_ref, rtol=2e-5, atol=2e-5)

    def loss(fn, *a):
        return (fn(*a) * w).sum()

    g_pps = jax.grad(functools.partial(loss, pps),
                     argnums=tuple(range(7)))(*args)
    g_ref = jax.grad(functools.partial(loss, _pallas),
                     argnums=tuple(range(7)))(*args)
    names = ['u', 'delta', 'A', 'B', 'C', 'D', 'z']
    for name, a, b in zip(names, g_pps, g_ref):
        np.testing.assert_allclose(a, b, rtol=5e-4, atol=5e-5,
                                   err_msg=f'grad mismatch: {name}')


def test_pps2_scan_impl_matches():
    """'pps2' (seeded-recompute pps; forward fuses the N-readout into
    the inner loop so h_all never materializes) is also a pure
    schedule change: values and all seven gradients must match."""
    u, delta, A, Bc, Cc, Dp, z = _inputs(seed=10)
    w = jax.random.normal(jax.random.PRNGKey(11), (B, L, D))
    args = (u, delta, A, Bc, Cc, Dp, z)
    pps2 = functools.partial(selective_scan_pallas, chunk=CHUNK,
                             d_tile=8, d_tile_bwd=8, interpret=True,
                             seg=4, seg_bwd=4, scan_impl='pps2')
    y_pps2 = pps2(*args)
    y_ref = _pallas(*args)
    np.testing.assert_allclose(y_pps2, y_ref, rtol=2e-5, atol=2e-5)

    def loss(fn, *a):
        return (fn(*a) * w).sum()

    g_pps2 = jax.grad(functools.partial(loss, pps2),
                      argnums=tuple(range(7)))(*args)
    g_ref = jax.grad(functools.partial(loss, _pallas),
                     argnums=tuple(range(7)))(*args)
    names = ['u', 'delta', 'A', 'B', 'C', 'D', 'z']
    for name, a, b in zip(names, g_pps2, g_ref):
        np.testing.assert_allclose(a, b, rtol=5e-4, atol=5e-5,
                                   err_msg=f'grad mismatch: {name}')


def test_pps2_nonaligned_seg_falls_back():
    """seg not dividing the chunk falls back to the hybrid scan —
    values still correct."""
    u, delta, A, Bc, Cc, Dp, z = _inputs(seed=12)
    y = selective_scan_pallas(u, delta, A, Bc, Cc, Dp, z, chunk=CHUNK,
                              d_tile=8, d_tile_bwd=8, interpret=True,
                              seg=7, scan_impl='pps2')
    np.testing.assert_allclose(y, _pallas(u, delta, A, Bc, Cc, Dp, z),
                               rtol=2e-5, atol=2e-5)


def test_pps3_scan_impl_matches():
    """'pps3' (consumer-fused backward: dh rows reduced in place,
    no (C, N, d) state/adjoint concats) is a pure schedule change:
    values and all seven gradients must match."""
    u, delta, A, Bc, Cc, Dp, z = _inputs(seed=13)
    w = jax.random.normal(jax.random.PRNGKey(14), (B, L, D))
    args = (u, delta, A, Bc, Cc, Dp, z)
    pps3 = functools.partial(selective_scan_pallas, chunk=CHUNK,
                             d_tile=8, d_tile_bwd=8, interpret=True,
                             seg=4, seg_bwd=4, scan_impl='pps3')
    y_pps3 = pps3(*args)
    y_ref = _pallas(*args)
    np.testing.assert_allclose(y_pps3, y_ref, rtol=2e-5, atol=2e-5)

    def loss(fn, *a):
        return (fn(*a) * w).sum()

    g_pps3 = jax.grad(functools.partial(loss, pps3),
                      argnums=tuple(range(7)))(*args)
    g_ref = jax.grad(functools.partial(loss, _pallas),
                     argnums=tuple(range(7)))(*args)
    names = ['u', 'delta', 'A', 'B', 'C', 'D', 'z']
    for name, a, b in zip(names, g_pps3, g_ref):
        np.testing.assert_allclose(a, b, rtol=5e-4, atol=5e-5,
                                   err_msg=f'grad mismatch: {name}')


def test_pps3_multi_chunk_carry():
    """Cross-chunk adjoint carry under the fused backward: a longer
    sequence spanning several chunks must still match grads."""
    ks = jax.random.split(jax.random.PRNGKey(15), 7)
    Lc = 3 * CHUNK  # multiple chunks, chunk-aligned
    u = jax.random.normal(ks[0], (1, Lc, D))
    delta = jax.nn.softplus(jax.random.normal(ks[1], (1, Lc, D)) - 1)
    A = -jnp.exp(jax.random.normal(ks[2], (D, N)) * 0.5)
    Bc = jax.random.normal(ks[3], (1, Lc, N))
    Cc = jax.random.normal(ks[4], (1, Lc, N))
    Dp = jax.random.normal(ks[5], (D,))
    z = jax.random.normal(ks[6], (1, Lc, D))
    w = jax.random.normal(jax.random.PRNGKey(16), (1, Lc, D))
    args = (u, delta, A, Bc, Cc, Dp, z)

    def loss(fn, *a):
        return (fn(*a) * w).sum()

    mk = lambda impl: functools.partial(
        selective_scan_pallas, chunk=CHUNK, d_tile=8, d_tile_bwd=8,
        interpret=True, seg=4, seg_bwd=4, scan_impl=impl)
    g3 = jax.grad(functools.partial(loss, mk('pps3')),
                  argnums=tuple(range(7)))(*args)
    g0 = jax.grad(functools.partial(loss, mk('hybrid')),
                  argnums=tuple(range(7)))(*args)
    for name, a, b in zip(['u', 'delta', 'A', 'B', 'C', 'D', 'z'],
                          g3, g0):
        np.testing.assert_allclose(a, b, rtol=5e-4, atol=5e-5,
                                   err_msg=f'grad mismatch: {name}')


def test_pps3_bf16_scan_dtype():
    """pps3 + scan_dtype=bfloat16: the fused backward mixes bf16 scan
    arithmetic with fp32 reductions — grads must stay within bf16
    rounding of the fp32 kernel."""
    u, delta, A, Bc, Cc, Dp, z = _inputs(seed=17)
    w = jax.random.normal(jax.random.PRNGKey(18), (B, L, D))
    args = (u, delta, A, Bc, Cc, Dp, z)

    def loss(fn, *a):
        return (fn(*a) * w).sum()

    p3_16 = functools.partial(selective_scan_pallas, chunk=CHUNK,
                              d_tile=8, d_tile_bwd=8, interpret=True,
                              seg=4, seg_bwd=4, scan_impl='pps3',
                              scan_dtype=jnp.bfloat16)
    np.testing.assert_allclose(p3_16(*args), _pallas(*args),
                               rtol=3e-2, atol=3e-2)
    g16 = jax.grad(functools.partial(loss, p3_16),
                   argnums=tuple(range(7)))(*args)
    g32 = jax.grad(functools.partial(loss, _pallas),
                   argnums=tuple(range(7)))(*args)
    for name, a, b in zip(['u', 'delta', 'A', 'B', 'C', 'D', 'z'],
                          g16, g32):
        rel = (np.abs(np.asarray(a) - np.asarray(b)).max()
               / (np.abs(np.asarray(b)).max() + 1e-9))
        assert rel < 5e-2, f'grad {name} rel-err {rel}'
