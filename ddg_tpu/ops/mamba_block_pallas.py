"""Fused Mamba block ("mamba_inner") Pallas TPU kernel: one kernel per
direction computing

    x, z = split(h @ W_in)                  (in_proj)
    u    = silu(causal_conv1d(x) + b_conv)  (depthwise, K taps)
    dt_lr, Bc, Cc = u @ W_x                 (x_proj, split columns)
    delta = softplus(dt_lr @ W_dt + b_dt)   (dt_proj, fp32)
    y    = selective_scan(u, delta, A, Bc, Cc, D, z)   (pps2 fused fwd)
    out  = y @ W_out                        (out_proj)

with a custom VJP whose backward kernel recomputes every activation
per chunk (seeded by the saved chunk-entry scan states h0s) and
accumulates all weight gradients in-kernel.

Parity target: the reference's CUDA `mamba_inner_fn`
(/root/reference/models/dimamba.py:176-195), which fuses exactly this
chain. The unfused TPU path (models/dimamba.py::MambaCore +
BiMambaWrapper in/out projections around ops/selective_scan_pallas)
round-trips every (B, L, d_inner) intermediate through HBM — the
measured ~108 ms non-scan phase of the Species10 train step sits ~2x
above its HBM floor (scripts/bench_dimamba_nonscan.py). Here the only
HBM traffic is: read h, write out, plus the tiny per-chunk boundary
states — matmuls stay on the MXU, the scan on the VPU, and nothing
else leaves VMEM.

TPU-specific choices:
  * grid (B, n_chunks) with chunks innermost; the scan state, the
    conv input halo (forward) and the conv adjoint halo (backward)
    are VMEM scratch carried across the sequential chunk steps.
  * the causal depthwise conv is expressed as K tiny 0/1-mask MXU
    matmuls (selection matrices built from `broadcasted_iota`
    comparisons) instead of sublane shifts/concats, which Mosaic does
    not reliably support on 2D (rows, lanes) values.
  * the within-chunk scan reuses the on-chip-validated pps2 fused
    forward (ops/selective_scan_pallas._fwd_fused_pps2); the backward
    is a VMEM-lean variant of the pps3 consumer-fused adjoint that
    recomputes a_t = exp(delta_t A) rows lazily instead of
    materializing the (C, N, d) a/b/a_up tensors (12 MB at the
    Species10 chunk shape — would not fit alongside the matmul
    operands in 16 MB of VMEM).
  * weight gradients accumulate into per-batch-row output blocks over
    the innermost (chunk) grid dimension — the safe consecutive-
    revisit Pallas accumulation pattern — and are summed over B
    outside.

Constraints: L % chunk == 0, chunk % seg == 0, chunk // seg >= 2,
d_conv <= 8 (halo scratch is 8 rows). The model falls back to the
unfused path when they don't hold.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ddg_tpu.ops.selective_scan_pallas import (
    _fwd_fused_pps2,
    _hs_scan,
    _shift_fwd,
    _shift_rev,
)

_HALO = 8  # conv halo rows carried across chunks (>= d_conv - 1)

# The backward kernel's recompute working set (per-row scan states for
# the whole chunk + matmul operands) is ~25 MB at the Species10 shape
# (chunk=128, d=512, N=16) — over Mosaic's conservative 16 MB scoped-
# vmem default but far under the v5e core's 128 MB of VMEM. Raise the
# cap; measured OOM: 24.82M requested at the default limit.
_COMPILER_PARAMS = pltpu.CompilerParams(
    vmem_limit_bytes=100 * 1024 * 1024)


def _dot(a, b, *, ta=False, tb=False):
    """MXU matmul with fp32 accumulation; ta/tb transpose via
    dot_general contraction dims (no data movement)."""
    ca = 0 if ta else 1
    cb = 1 if tb else 0
    return jax.lax.dot_general(
        a, b, (((ca,), (cb,)), ((), ())),
        preferred_element_type=jnp.float32)


def _dot_hi(a, b):
    """fp32 matmul at HIGHEST precision (multi-pass) — used for the
    dt_proj, matching the unfused path's Precision.HIGHEST Dense."""
    return jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)


def _sel(C_len, K, j, *, halo, dtype):
    """0/1 selection matrix for conv tap j (causal, K taps):
    body (C, C): S[t, q] = 1 iff q == t - (K-1) + j;
    halo (C, _HALO): S[t, q] = 1 iff q - _HALO == t - (K-1) + j
    (halo row q holds x[q - _HALO] of the previous chunk)."""
    if halo:
        rows = jax.lax.broadcasted_iota(jnp.int32, (C_len, _HALO), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (C_len, _HALO), 1)
        return (cols - _HALO == rows - (K - 1) + j).astype(dtype)
    rows = jax.lax.broadcasted_iota(jnp.int32, (C_len, C_len), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (C_len, C_len), 1)
    return (cols == rows - (K - 1) + j).astype(dtype)


def _sel_rev(C_len, K, j, *, halo, dtype):
    """Selection matrices for the conv adjoint: dx[t'] collects
    dxc[t' + (K-1) - j]; rows past the chunk end come from the next
    chunk's dxc (halo rows q hold dxc_next[q])."""
    if halo:
        rows = jax.lax.broadcasted_iota(jnp.int32, (C_len, _HALO), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (C_len, _HALO), 1)
        return (cols + C_len == rows + (K - 1) - j).astype(dtype)
    rows = jax.lax.broadcasted_iota(jnp.int32, (C_len, C_len), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (C_len, C_len), 1)
    return (cols == rows + (K - 1) - j).astype(dtype)


def _conv_taps(x, halo, K, dtype):
    """xs[j][t] = x_global[t - (K-1) + j] as K mask-matmul selections
    (exact: one 1.0 per row). x: (C, d); halo: (_HALO, d) = previous
    chunk's last rows. Returns list of K (C, d) arrays in `dtype`."""
    C_len = x.shape[0]
    out = []
    for j in range(K):
        v = _dot(_sel(C_len, K, j, halo=False, dtype=x.dtype), x)
        v = v + _dot(_sel(C_len, K, j, halo=True, dtype=halo.dtype),
                     halo)
        out.append(v.astype(dtype))
    return out


def _conv_adjoint(dxc, dxc_halo, K):
    """dx[t'] rows = sum_j w_j * dxc[t' + (K-1) - j]; returns the list
    of K selected (C, d) fp32 arrays (caller applies the per-channel
    weights)."""
    C_len = dxc.shape[0]
    out = []
    for j in range(K):
        v = _dot(_sel_rev(C_len, K, j, halo=False, dtype=dxc.dtype),
                 dxc)
        v = v + _dot(
            _sel_rev(C_len, K, j, halo=True, dtype=dxc_halo.dtype),
            dxc_halo)
        out.append(v)
    return out


# ---------------------------------------------------------------------
# VMEM-lean pps3 adjoint: a_t rows recomputed from delta lazily.
# ---------------------------------------------------------------------

def _row(x4, j):
    return jax.lax.slice_in_dim(x4, j, j + 1, axis=1)


def _scan_bwd_lazy(h0, dt, u32, Bc, Cc, gy, A, dvec, carry_in, *, seg,
                   scan_dtype):
    """Consumer-fused pps3 adjoint of the gated selective scan, with
    a = exp(dt A), b = dt u B and a_up recomputed per row from the
    (C, d)/(C, N) operands instead of materialized as (C, N, d)
    tensors (selective_scan_pallas._bwd_fused_pps3 materializes them;
    at d_tile = d_inner = 512 that is 12 MB of VMEM this kernel does
    not have). Returns (ddt, du, db, dc, y_pre, dA, dD, carry):
    ddt/du (C, d) fp32, db/dc (C, N) fp32, y_pre (C, d) (scan + D*u,
    pre-gate), dA (N, d), dD (1, d), carry (N, d) for the chunk to
    the left."""
    C_len, d_ = dt.shape
    N_ = A.shape[0]
    m = C_len // seg
    sd = scan_dtype
    dt4 = dt.reshape(m, seg, d_)
    u4 = u32.reshape(m, seg, d_)
    B4 = Bc.reshape(m, seg, N_)
    C4 = Cc.reshape(m, seg, N_)
    g4 = gy.reshape(m, seg, d_)

    def a_row(j):                                    # (m, 1, N, d)
        return jnp.exp(_row(dt4, j)[:, :, None, :] * A[None, None])

    def b_row(j):
        dtu = _row(dt4, j) * _row(u4, j)             # (m, 1, d)
        return dtu[:, :, None, :] * _row(B4, j)[..., None]

    # a_up at the last row of each segment = a of the NEXT segment's
    # first row (1 past the last segment; the cross-chunk boundary is
    # handled by carry_in added to w at the chunk's last row).
    a0 = a_row(0)
    a0_next = _shift_rev(a0, 1)
    ids_m = jax.lax.broadcasted_iota(jnp.int32, a0_next.shape, 0)
    a0_next = jnp.where(ids_m == m - 1, jnp.ones((), a0_next.dtype),
                        a0_next)

    def au_row(j):
        return a_row(j + 1) if j < seg - 1 else a0_next

    def w_row(j):
        wj = (_row(C4, j)[..., None]
              * _row(g4, j)[:, :, None, :])          # (m, 1, N, d)
        if j == seg - 1:
            ids = jax.lax.broadcasted_iota(jnp.int32, wj.shape, 0)
            wj = jnp.where(ids == m - 1, wj + carry_in[None, None],
                           wj)
        return wj

    # Pass 1 — segment summaries -> true entry state per segment.
    h = jnp.zeros((m, 1, N_, d_), sd)
    p = None
    for j in range(seg):
        a_j = a_row(j).astype(sd)
        h = a_j * h + b_row(j).astype(sd)
        p = a_j if p is None else p * a_j
    A_cum, B_resp = _hs_scan(p, h)                   # over axis 0, m
    g_end = A_cum * h0[None, None].astype(sd) + B_resp
    ent = _shift_fwd(g_end, 1)                       # e_i = g_end_{i-1}
    ids = jax.lax.broadcasted_iota(jnp.int32, ent.shape, 0)
    ent = jnp.where(ids == 0, h0[None, None].astype(ent.dtype), ent)

    # Pass 2 — forward states per row, seeded by true entries.
    hs = []
    h = ent
    for j in range(seg):
        h = a_row(j).astype(sd) * h + b_row(j).astype(sd)
        hs.append(h)

    # Pass 3 — adjoint segment summaries -> true carry per segment.
    dh = jnp.zeros((m, 1, N_, d_), sd)
    q = None
    for j in reversed(range(seg)):
        au_j = au_row(j).astype(sd)
        dh = w_row(j).astype(sd) + au_j * dh
        q = au_j if q is None else au_j * q
    _, dh_starts = _hs_scan(q, dh, reverse=True)
    nxt = _shift_rev(dh_starts, 1)
    ids = jax.lax.broadcasted_iota(jnp.int32, nxt.shape, 0)
    dh = jnp.where(ids == m - 1, jnp.zeros((), nxt.dtype), nxt)

    # Pass 4 — fused descending pass: each dh row reduced in place.
    acc_dA = jnp.zeros((N_, d_), jnp.float32)
    ddt_rows = [None] * seg
    du_rows = [None] * seg
    db_rows = [None] * seg
    dc_rows = [None] * seg
    ypre_rows = [None] * seg
    for j in reversed(range(seg)):
        dh = w_row(j).astype(sd) + au_row(j).astype(sd) * dh
        dh32 = dh.astype(jnp.float32)
        af_j = a_row(j)                              # fp32
        h_j = hs[j].astype(jnp.float32)
        hp_j = (hs[j - 1] if j > 0 else ent).astype(jnp.float32)
        daa = dh32 * hp_j * af_j                     # (m, 1, N, d)
        dt_j = _row(dt4, j)                          # (m, 1, d)
        u_j = _row(u4, j)
        gy_j = _row(g4, j)
        Bc_j = _row(B4, j)[..., None]                # (m, 1, N, 1)
        Cc_j = _row(C4, j)[..., None]
        dhB_j = jnp.sum(dh32 * Bc_j, axis=2)         # (m, 1, d)
        ddt_rows[j] = jnp.sum(daa * A[None, None], axis=2) \
            + dhB_j * u_j
        du_rows[j] = dhB_j * dt_j + gy_j * dvec[None]
        db_rows[j] = jnp.sum(dh32 * (dt_j * u_j)[:, :, None, :],
                             axis=3)                 # (m, 1, N)
        dc_rows[j] = jnp.sum(h_j * gy_j[:, :, None, :], axis=3)
        ypre_rows[j] = jnp.sum(h_j * Cc_j, axis=2)   # (m, 1, d)
        acc_dA = acc_dA + jnp.sum(daa * dt_j[:, :, None, :],
                                  axis=(0, 1))

    ddt = jnp.concatenate(ddt_rows, axis=1).reshape(C_len, d_)
    du = jnp.concatenate(du_rows, axis=1).reshape(C_len, d_)
    db = jnp.concatenate(db_rows, axis=1).reshape(C_len, N_)
    dc = jnp.concatenate(dc_rows, axis=1).reshape(C_len, N_)
    y_pre = jnp.concatenate(ypre_rows, axis=1).reshape(C_len, d_) \
        + dvec * u32
    dD = jnp.sum(gy * u32, axis=0, keepdims=True)    # (1, d)
    # Carry for the chunk to the left: a_{t=0} * dh_{t=0}.
    dt_0 = jax.lax.slice_in_dim(dt, 0, 1, axis=0)    # (1, d)
    a_t0 = jnp.exp(dt_0 * A)                         # (N, d)
    dh_t0 = jax.lax.slice(dh.astype(jnp.float32), (0, 0, 0, 0),
                          (1, 1, N_, d_)).reshape(N_, d_)
    return ddt, du, db, dc, y_pre, acc_dA, dD, a_t0 * dh_t0


# ---------------------------------------------------------------------
# Kernels.
# ---------------------------------------------------------------------

def _w_row(w, j):
    """Row j of a small (K, d) weight as (1, d) without sublane
    slicing: one-hot mask + reduce (K <= 8, negligible)."""
    ids = jax.lax.broadcasted_iota(jnp.int32, w.shape, 0)
    return jnp.sum(jnp.where(ids == j, w, jnp.zeros((), w.dtype)),
                   axis=0, keepdims=True)


def _recompute_front(h_in, halo, refs, *, K, cd):
    """Shared forward chain in_proj -> conv+silu -> x_proj -> dt_proj
    from the (C, H) input block and the (HALO, d) conv halo. Returns
    (x, z, xs, xc, u, dt_lr32, Bc, Cc, pre, dt)."""
    (wx_ref, wz_ref, cw_ref, cb_ref, wlr_ref, wb_ref, wc_ref, wdt_ref,
     bdt_ref) = refs
    x = _dot(h_in, wx_ref[...].astype(cd)).astype(cd)     # (C, d)
    z = _dot(h_in, wz_ref[...].astype(cd)).astype(cd)
    xs = _conv_taps(x, halo, K, cd)
    cw = cw_ref[...].astype(cd)                           # (K, d)
    acc = xs[0] * _w_row(cw, 0)
    for j in range(1, K):
        acc = acc + xs[j] * _w_row(cw, j)
    xc = acc + cb_ref[...].astype(cd)
    # silu in fp32: Mosaic's logistic lowering on bf16 vectors emits a
    # mixed-type vector.broadcast (f32 scalar -> bf16 vector) that
    # fails verification on the real chip (interpret mode accepts it).
    xc32 = xc.astype(jnp.float32)
    u = (xc32 * jax.nn.sigmoid(xc32)).astype(cd)
    # x_proj: bf16 round-trip matches the unfused Dense(dtype=cd).
    dt_lr32 = _dot(u, wlr_ref[...].astype(cd)).astype(cd) \
        .astype(jnp.float32)                              # (C, R)
    Bc = _dot(u, wb_ref[...].astype(cd)).astype(cd) \
        .astype(jnp.float32)                              # (C, N)
    Cc = _dot(u, wc_ref[...].astype(cd)).astype(cd) \
        .astype(jnp.float32)
    pre = _dot_hi(dt_lr32, wdt_ref[...].astype(jnp.float32)) \
        + bdt_ref[...].astype(jnp.float32)                # (C, d)
    dt = jax.nn.softplus(pre)
    return x, z, xs, xc, u, dt_lr32, Bc, Cc, pre, dt


def _mk_fwd_kernel(h_ref, wx_ref, wz_ref, cw_ref, cb_ref, wlr_ref,
                   wb_ref, wc_ref, wdt_ref, bdt_ref, alog_ref,
                   dvec_ref, wout_ref, out_ref, h0_ref, h_scr,
                   halo_scr, *, K, seg, scan_dtype, compute_dtype):
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _():
        h_scr[...] = jnp.zeros_like(h_scr)
        halo_scr[...] = jnp.zeros_like(halo_scr)

    cd = compute_dtype
    h0 = h_scr[...]                                       # (N, d)
    h0_ref[0, 0] = h0
    h_in = h_ref[0].astype(cd)                            # (C, H)
    refs = (wx_ref, wz_ref, cw_ref, cb_ref, wlr_ref, wb_ref, wc_ref,
            wdt_ref, bdt_ref)
    x, z, _, _, u, _, Bc, Cc, _, dt = _recompute_front(
        h_in, halo_scr[...], refs, K=K, cd=cd)
    C_len = x.shape[0]
    halo_scr[...] = jax.lax.slice_in_dim(x, C_len - _HALO, C_len,
                                         axis=0)

    A = -jnp.exp(alog_ref[...].astype(jnp.float32))       # (N, d)
    dvec = dvec_ref[...].astype(jnp.float32)              # (1, d)
    u32 = u.astype(jnp.float32)
    z32 = z.astype(jnp.float32)
    a = jnp.exp(dt[:, None, :] * A[None])                 # (C, N, d)
    b = (dt * u32)[:, None, :] * Bc[..., None]
    y_scan, h_last = _fwd_fused_pps2(
        h0.astype(scan_dtype), a.astype(scan_dtype),
        b.astype(scan_dtype), Cc, seg=seg)
    h_scr[...] = h_last
    y = (y_scan + dvec * u32) * (z32 * jax.nn.sigmoid(z32))
    out_ref[0] = _dot(y.astype(cd),
                      wout_ref[...].astype(cd)).astype(out_ref.dtype)


def _mk_bwd_kernel(h_ref, hprev_ref, g_ref, h0_ref, wx_ref, wz_ref,
                   cw_ref, cb_ref, wlr_ref, wb_ref, wc_ref, wdt_ref,
                   bdt_ref, alog_ref, dvec_ref, wout_ref,
                   dh_ref, dwx_ref, dwz_ref, dcw_ref, dcb_ref,
                   dwlr_ref, dwb_ref, dwc_ref, dwdt_ref, dbdt_ref,
                   dalog_ref, ddvec_ref, dwout_ref,
                   carry_scr, dxch_scr, *, K, seg, scan_dtype,
                   compute_dtype, nc):
    i = pl.program_id(1)                  # chunk k = nc - 1 - i

    @pl.when(i == 0)
    def _():
        carry_scr[...] = jnp.zeros_like(carry_scr)
        dxch_scr[...] = jnp.zeros_like(dxch_scr)
        for r in (dwx_ref, dwz_ref, dcw_ref, dcb_ref, dwlr_ref,
                  dwb_ref, dwc_ref, dwdt_ref, dbdt_ref, dalog_ref,
                  ddvec_ref, dwout_ref):
            r[0] = jnp.zeros_like(r[0])

    cd = compute_dtype
    h_in = h_ref[0].astype(cd)                            # (C, H)
    C_len = h_in.shape[0]
    # Conv input halo: last rows of the PREVIOUS chunk's x, recomputed
    # from the h block at chunk k-1 (zeros at the first chunk).
    hp = jax.lax.slice_in_dim(hprev_ref[0], C_len - _HALO, C_len,
                              axis=0).astype(cd)          # (HALO, H)
    halo = _dot(hp, wx_ref[...].astype(cd)).astype(cd)
    halo = jnp.where(i == nc - 1, jnp.zeros((), cd), halo)
    refs = (wx_ref, wz_ref, cw_ref, cb_ref, wlr_ref, wb_ref, wc_ref,
            wdt_ref, bdt_ref)
    x, z, xs, xc, u, dt_lr32, Bc, Cc, pre, dt = _recompute_front(
        h_in, halo, refs, K=K, cd=cd)
    A = -jnp.exp(alog_ref[...].astype(jnp.float32))
    dvec = dvec_ref[...].astype(jnp.float32)
    h0 = h0_ref[0, 0]
    u32 = u.astype(jnp.float32)
    z32 = z.astype(jnp.float32)

    # out_proj adjoint.
    g = g_ref[0].astype(cd)                               # (C, H)
    dy = _dot(g, wout_ref[...].astype(cd), tb=True)       # (C, d) f32
    sig = jax.nn.sigmoid(z32)
    sg = z32 * sig
    gy = dy * sg                                          # d/d y_pre

    ddt, du_s, db, dc, y_pre, dA, dD, carry = _scan_bwd_lazy(
        h0, dt, u32, Bc, Cc, gy, A, dvec, carry_scr[...], seg=seg,
        scan_dtype=scan_dtype)
    carry_scr[...] = carry
    dz = dy * y_pre * (sig + sg * (1.0 - sig))
    yg = (y_pre * sg).astype(cd)          # gated scan out, as fed to
    dwout_ref[0] += _dot(yg, g, ta=True)  # out_proj: (d, H)

    # dt_proj adjoint (fp32, HIGHEST like the forward).
    dpre = ddt * jax.nn.sigmoid(pre)                      # (C, d)
    wdt32 = wdt_ref[...].astype(jnp.float32)
    ddt_lr = jax.lax.dot_general(
        dpre, wdt32, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)              # (C, R)
    dwdt_ref[0] += jax.lax.dot_general(
        dt_lr32, dpre, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)              # (R, d)
    dbdt_ref[0] += jnp.sum(dpre, axis=0, keepdims=True)

    # x_proj adjoint (bf16 grads, like the unfused Dense).
    ddt_lr_c = ddt_lr.astype(cd)
    db_c = db.astype(cd)
    dc_c = dc.astype(cd)
    du_tot = du_s \
        + _dot(ddt_lr_c, wlr_ref[...].astype(cd), tb=True) \
        + _dot(db_c, wb_ref[...].astype(cd), tb=True) \
        + _dot(dc_c, wc_ref[...].astype(cd), tb=True)     # (C, d) f32
    dwlr_ref[0] += _dot(u, ddt_lr_c, ta=True)             # (d, R)
    dwb_ref[0] += _dot(u, db_c, ta=True)                  # (d, N)
    dwc_ref[0] += _dot(u, dc_c, ta=True)

    # conv + silu adjoint.
    xc32 = xc.astype(jnp.float32)
    sc = jax.nn.sigmoid(xc32)
    dxc = du_tot * (sc * (1.0 + xc32 * (1.0 - sc)))       # (C, d)
    dcb_ref[0] += jnp.sum(dxc, axis=0, keepdims=True)
    sel = _conv_adjoint(dxc, dxch_scr[...], K)
    dxch_scr[...] = jax.lax.slice_in_dim(dxc, 0, _HALO, axis=0)
    cw32 = cw_ref[...].astype(jnp.float32)
    dx32 = sel[0] * _w_row(cw32, 0)
    dcw_ids = jax.lax.broadcasted_iota(jnp.int32,
                                       (_HALO, dxc.shape[1]), 0)
    dcw_acc = jnp.where(
        dcw_ids == 0,
        jnp.sum(xs[0].astype(jnp.float32) * dxc, axis=0,
                keepdims=True), 0.0)
    for j in range(1, K):
        dx32 = dx32 + sel[j] * _w_row(cw32, j)
        dcw_acc = jnp.where(
            dcw_ids == j,
            jnp.sum(xs[j].astype(jnp.float32) * dxc, axis=0,
                    keepdims=True), dcw_acc)
    dcw_ref[0] += dcw_acc

    # in_proj adjoint.
    dx = dx32.astype(cd)
    dz_c = dz.astype(cd)
    dh_ref[0] = (_dot(dx, wx_ref[...].astype(cd), tb=True)
                 + _dot(dz_c, wz_ref[...].astype(cd), tb=True)) \
        .astype(dh_ref.dtype)                             # (C, H)
    dwx_ref[0] += _dot(h_in, dx, ta=True)                 # (H, d)
    dwz_ref[0] += _dot(h_in, dz_c, ta=True)

    dalog_ref[0] += dA * A
    ddvec_ref[0] += dD


# ---------------------------------------------------------------------
# pallas_call wrappers + custom VJP.
# ---------------------------------------------------------------------

def _weight_specs(H, d, N, K, R):
    def w(shape):
        nd = len(shape)
        return pl.BlockSpec(shape, lambda bi, k, _n=nd: (0,) * _n,
                            memory_space=pltpu.VMEM)
    return [w((H, d)), w((H, d)), w((K, d)), w((1, d)), w((d, R)),
            w((d, N)), w((d, N)), w((R, d)), w((1, d)), w((N, d)),
            w((1, d)), w((d, H))]


def _mk_fwd_call(h, ws, *, chunk, seg, interpret, scan_dtype,
                 compute_dtype):
    B, L, H = h.shape
    d = ws[0].shape[1]
    K = ws[2].shape[0]
    R = ws[4].shape[1]
    N = ws[5].shape[1]
    nc = L // chunk
    h_spec = pl.BlockSpec((1, chunk, H), lambda bi, k: (bi, k, 0),
                          memory_space=pltpu.VMEM)
    h0_spec = pl.BlockSpec((1, 1, N, d),
                           lambda bi, k: (bi, k, 0, 0),
                           memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_mk_fwd_kernel, K=K, seg=seg,
                          scan_dtype=scan_dtype,
                          compute_dtype=compute_dtype),
        grid=(B, nc),
        in_specs=[h_spec] + _weight_specs(H, d, N, K, R),
        out_specs=(h_spec, h0_spec),
        out_shape=(jax.ShapeDtypeStruct((B, L, H), compute_dtype),
                   jax.ShapeDtypeStruct((B, nc, N, d), jnp.float32)),
        scratch_shapes=[pltpu.VMEM((N, d), jnp.float32),
                        pltpu.VMEM((_HALO, d), compute_dtype)],
        compiler_params=_COMPILER_PARAMS,
        interpret=interpret,
    )(h, *ws)


def _mk_bwd_call(h, ws, h0s, g, *, chunk, seg, interpret, scan_dtype,
                 compute_dtype):
    B, L, H = h.shape
    d = ws[0].shape[1]
    K = ws[2].shape[0]
    R = ws[4].shape[1]
    N = ws[5].shape[1]
    nc = L // chunk
    kmap = lambda k: nc - 1 - k  # noqa: E731
    h_spec = pl.BlockSpec((1, chunk, H),
                          lambda bi, k: (bi, kmap(k), 0),
                          memory_space=pltpu.VMEM)
    hprev_spec = pl.BlockSpec(
        (1, chunk, H),
        lambda bi, k: (bi, jnp.maximum(kmap(k) - 1, 0), 0),
        memory_space=pltpu.VMEM)
    h0_spec = pl.BlockSpec((1, 1, N, d),
                           lambda bi, k: (bi, kmap(k), 0, 0),
                           memory_space=pltpu.VMEM)

    def acc(shape):
        nd = len(shape) + 1
        return pl.BlockSpec((1,) + shape,
                            lambda bi, k, _n=nd: (bi,) + (0,) * (_n - 1),
                            memory_space=pltpu.VMEM)

    grads = pl.pallas_call(
        functools.partial(_mk_bwd_kernel, K=K, seg=seg,
                          scan_dtype=scan_dtype,
                          compute_dtype=compute_dtype, nc=nc),
        grid=(B, nc),
        in_specs=([h_spec, hprev_spec, h_spec, h0_spec]
                  + _weight_specs(H, d, N, K, R)),
        out_specs=(h_spec, acc((H, d)), acc((H, d)), acc((_HALO, d)),
                   acc((1, d)), acc((d, R)), acc((d, N)), acc((d, N)),
                   acc((R, d)), acc((1, d)), acc((N, d)), acc((1, d)),
                   acc((d, H))),
        out_shape=(jax.ShapeDtypeStruct((B, L, H), compute_dtype),
                   jax.ShapeDtypeStruct((B, H, d), jnp.float32),
                   jax.ShapeDtypeStruct((B, H, d), jnp.float32),
                   jax.ShapeDtypeStruct((B, _HALO, d), jnp.float32),
                   jax.ShapeDtypeStruct((B, 1, d), jnp.float32),
                   jax.ShapeDtypeStruct((B, d, R), jnp.float32),
                   jax.ShapeDtypeStruct((B, d, N), jnp.float32),
                   jax.ShapeDtypeStruct((B, d, N), jnp.float32),
                   jax.ShapeDtypeStruct((B, R, d), jnp.float32),
                   jax.ShapeDtypeStruct((B, 1, d), jnp.float32),
                   jax.ShapeDtypeStruct((B, N, d), jnp.float32),
                   jax.ShapeDtypeStruct((B, 1, d), jnp.float32),
                   jax.ShapeDtypeStruct((B, d, H), jnp.float32)),
        scratch_shapes=[pltpu.VMEM((N, d), jnp.float32),
                        pltpu.VMEM((_HALO, d), jnp.float32)],
        compiler_params=_COMPILER_PARAMS,
        interpret=interpret,
    )(h, h, g, h0s, *ws)
    return grads


@functools.partial(jax.custom_vjp,
                   nondiff_argnums=(13, 14, 15, 16, 17, 18))
def _mamba_inner(h, wx, wz, cw, cb, wlr, wb, wc, wdt, bdt, alog, dvec,
                 wout, chunk, seg, seg_bwd, interpret, scan_dtype,
                 compute_dtype):
    out, _ = _mk_fwd_call(
        h, (wx, wz, cw, cb, wlr, wb, wc, wdt, bdt, alog, dvec, wout),
        chunk=chunk, seg=seg, interpret=interpret,
        scan_dtype=scan_dtype, compute_dtype=compute_dtype)
    return out


def _mamba_inner_fwd(h, wx, wz, cw, cb, wlr, wb, wc, wdt, bdt, alog,
                     dvec, wout, chunk, seg, seg_bwd, interpret,
                     scan_dtype, compute_dtype):
    ws = (wx, wz, cw, cb, wlr, wb, wc, wdt, bdt, alog, dvec, wout)
    out, h0s = _mk_fwd_call(h, ws, chunk=chunk, seg=seg,
                            interpret=interpret, scan_dtype=scan_dtype,
                            compute_dtype=compute_dtype)
    return out, (h, ws, h0s)


def _mamba_inner_bwd(chunk, seg, seg_bwd, interpret, scan_dtype,
                     compute_dtype, res, g):
    h, ws, h0s = res
    K = ws[2].shape[0]
    outs = _mk_bwd_call(h, ws, h0s, g.astype(compute_dtype),
                        chunk=chunk, seg=seg_bwd, interpret=interpret,
                        scan_dtype=scan_dtype,
                        compute_dtype=compute_dtype)
    dh = outs[0]
    wsum = [o.sum(axis=0) for o in outs[1:]]
    dcw = wsum[2][:K]                      # (_HALO, d) -> (K, d)
    grads = (dh, wsum[0], wsum[1], dcw, wsum[3], wsum[4], wsum[5],
             wsum[6], wsum[7], wsum[8], wsum[9], wsum[10], wsum[11])
    ins = (h, *ws)
    return tuple(gr.astype(x.dtype) for gr, x in zip(grads, ins))


_mamba_inner.defvjp(_mamba_inner_fwd, _mamba_inner_bwd)


def mamba_inner_pallas(h, W_in, conv_w, conv_b, W_x, W_dt, b_dt, A, D,
                       W_out, *, d_state, dt_rank, chunk=128, seg=64,
                       seg_bwd=64, interpret=False,
                       scan_dtype=jnp.float32,
                       compute_dtype=jnp.bfloat16):
    """Fused Mamba direction: out_proj(scan(conv_silu(in_proj(h)))).

    h: (B, L, H); W_in: (H, 2*d_inner) (x|z columns); conv_w:
    (K, 1, d_inner) depthwise taps; conv_b: (d_inner,); W_x:
    (d_inner, dt_rank + 2*d_state) (dt|B|C columns); W_dt:
    (dt_rank, d_inner); b_dt: (d_inner,); A: (d_inner, d_state)
    (= -exp(A_log)); D: (d_inner,); W_out: (d_inner, H). Returns
    (B, L, H) in compute_dtype. Differentiable wrt all tensor args.

    Parity: the reference mamba_inner_fn
    (/root/reference/models/dimamba.py:176-195) minus the final RMS
    norm/gating differences absorbed by the block (the gate silu(z)
    IS fused, as in selective_scan_fn's gated epilogue).
    """
    B, L, H = h.shape
    two_d = W_in.shape[1]
    d = two_d // 2
    K = conv_w.shape[0]
    if L % chunk:
        raise ValueError(f'L={L} must be divisible by chunk={chunk}')
    for s in (seg, seg_bwd):
        if chunk % s or chunk // s < 2:
            raise ValueError(
                f'chunk={chunk} needs seg | chunk and chunk/seg >= 2 '
                f'(got seg={s})')
    if K > _HALO:
        raise ValueError(f'd_conv={K} exceeds halo rows {_HALO}')
    wx = W_in[:, :d]
    wz = W_in[:, d:]
    cw = conv_w.reshape(K, d)
    wlr = W_x[:, :dt_rank]
    wb = W_x[:, dt_rank:dt_rank + d_state]
    wc = W_x[:, dt_rank + d_state:]
    alog = jnp.log(-A.astype(jnp.float32)).T            # (N, d)
    return _mamba_inner(
        h, wx, wz, cw, conv_b.reshape(1, d), wlr, wb, wc,
        W_dt.astype(jnp.float32),
        b_dt.astype(jnp.float32).reshape(1, d), alog,
        D.astype(jnp.float32).reshape(1, d), W_out, chunk, seg,
        seg_bwd, interpret, scan_dtype, compute_dtype)
