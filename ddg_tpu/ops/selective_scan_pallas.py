"""Pallas TPU kernel for the selective SSM scan (Mamba recurrence).

Replaces the XLA chunked `lax.associative_scan` in
models/dimamba.py::selective_scan for the hot inner recurrence
    h_t = a_t * h_{t-1} + b_t,   a_t = exp(delta_t A),
    b_t = delta_t B_t u_t,       y_t = sum_n C_{t,n} h_{t,n,:}
(parity target: the reference's CUDA `selective_scan_fn`,
/root/reference/models/dimamba.py:230-249).

Why a kernel: the XLA scan materializes every level of the
within-chunk associative scan in HBM — ~14 full passes over the
(B, C, d, N) work tensors per chunk. Here a/b/h only ever live in
VMEM: HBM traffic is ONE read of the inputs and one write of y (plus
tiny per-chunk boundary states), the speed-of-light for this
memory-bound op.

Layout: time-major blocks (chunk, N, d_tile) — d rides the 128-lane
axis, N the sublane axis, and the within-chunk prefix scan runs over
the leading (untiled) time axis as a Hillis-Steele log-depth scan
built on `pltpu.roll` (no strided slicing, Mosaic-friendly). The grid
is (B, d_tiles, n_chunks) with chunks innermost: the carried state h
lives in a VMEM scratch that persists across grid steps and resets at
chunk 0.

Backward: custom VJP. The forward additionally writes the chunk-entry
states h0 (B, nc, N, d) — 1/chunk-th of the full state stack — and the
backward kernel recomputes h within each chunk from h0 (the same
recompute-instead-of-store tradeoff the CUDA kernel makes), runs the
adjoint recurrence dh_t = C_t g_t + a_{t+1} dh_{t+1} right-to-left as
a suffix scan, and emits du, ddelta, dB, dC plus dA accumulated per
batch row (summed over B outside the kernel).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _time_row(x, idx: int):
    """Static slice of row `idx` along axis 0 (Mosaic has no
    dynamic_slice lowering, which is what jnp's `x[i]` becomes)."""
    if idx < 0:
        idx += x.shape[0]
    return jax.lax.slice_in_dim(x, idx, idx + 1, axis=0).reshape(
        x.shape[1:])


def _shift_fwd(x, s: int):
    """out[t] = x[t-s] for t >= s; rows t < s are undefined (callers
    mask them). 32-bit dtypes lower to tpu.dynamic_rotate; Mosaic has
    no sub-32-bit rotate, so narrower dtypes use a static slice+concat
    on the (untiled) leading axis instead."""
    if x.dtype.itemsize == 4:
        return pltpu.roll(x, s, 0)
    C = x.shape[0]
    head = jax.lax.slice_in_dim(x, 0, s, axis=0)
    body = jax.lax.slice_in_dim(x, 0, C - s, axis=0)
    return jnp.concatenate([head, body], axis=0)


def _shift_rev(x, s: int):
    """out[t] = x[t+s] for t < C-s; rows t >= C-s undefined."""
    if x.dtype.itemsize == 4:
        return pltpu.roll(x, x.shape[0] - s, 0)
    C = x.shape[0]
    body = jax.lax.slice_in_dim(x, s, C, axis=0)
    tail = jax.lax.slice_in_dim(x, 0, s, axis=0)
    return jnp.concatenate([body, tail], axis=0)


def _hs_scan(a, b, *, reverse: bool = False):
    """Log-depth inclusive affine scan over axis 0 of (C, N, d) pairs.

    Forward: out_t = (prod_{s<=t} a_s, response of b_0..b_t), i.e.
    h_t = a_t h_{t-1} + b_t unrolled from h_{-1} = 0.
    Reverse: suffix version — out_t = b_t + a_t b_{t+1}
    + a_t a_{t+1} b_{t+2} + ... (note: uses a_t as the weight applied
    to everything to the right; callers pre-shift a for the adjoint).
    """
    C = a.shape[0]
    t_ids = jax.lax.broadcasted_iota(jnp.int32, a.shape, 0)
    s = 1
    while s < C:
        if not reverse:
            a_sh = _shift_fwd(a, s)         # index t <- t-s
            b_sh = _shift_fwd(b, s)
            valid = t_ids >= s
            b = jnp.where(valid, a * b_sh + b, b)
            a = jnp.where(valid, a * a_sh, a)
        else:
            a_sh = _shift_rev(a, s)         # index t <- t+s
            b_sh = _shift_rev(b, s)
            valid = t_ids < C - s
            b = jnp.where(valid, b + a * b_sh, b)
            a = jnp.where(valid, a * a_sh, a)
        s *= 2
    return a, b


def _chunk_states(h0, a, b, *, seg: int = 8):
    """h_t for t in [0, C) from entry state h0.

    Hybrid scan: sequential over C/seg segments (carrying the state),
    log-depth Hillis-Steele within each segment. Arithmetic is
    ~(2*log2(seg)+2)*C*N*d vs (2*log2(C)+2)*C*N*d for the full
    log-depth scan — 2x less VPU work at C=128/seg=8 — while the
    sequential depth (C/seg segments) stays shallow enough to
    pipeline. Segments concatenate on the (untiled) leading time axis,
    which Mosaic supports."""
    C = a.shape[0]
    if C % seg or C <= seg:
        a_cum, b_resp = _hs_scan(a, b)
        return a_cum * h0[None] + b_resp
    h = h0
    outs = []
    for s in range(C // seg):
        a_s = jax.lax.slice_in_dim(a, s * seg, (s + 1) * seg, axis=0)
        b_s = jax.lax.slice_in_dim(b, s * seg, (s + 1) * seg, axis=0)
        a_cum, b_resp = _hs_scan(a_s, b_s)
        h_seg = a_cum * h[None] + b_resp
        outs.append(h_seg)
        h = _time_row(h_seg, -1)
    return jnp.concatenate(outs, axis=0)


def _suffix_scan(a_up, w, *, seg: int = 8):
    """dh_t = w_t + a_up_t dh_{t+1} (dh_C = 0), the adjoint suffix
    recurrence, with the same hybrid decomposition right-to-left."""
    C = a_up.shape[0]
    if C % seg or C <= seg:
        _, dh = _hs_scan(a_up, w, reverse=True)
        return dh
    N_, d_ = a_up.shape[1], a_up.shape[2]
    carry = jnp.zeros((N_, d_), jnp.float32)
    outs = []
    for s in reversed(range(C // seg)):
        a_s = jax.lax.slice_in_dim(a_up, s * seg, (s + 1) * seg,
                                   axis=0)
        w_s = jax.lax.slice_in_dim(w, s * seg, (s + 1) * seg, axis=0)
        a_cum, w_resp = _hs_scan(a_s, w_s, reverse=True)
        dh_seg = w_resp + a_cum * carry[None]
        outs.insert(0, dh_seg)
        carry = _time_row(dh_seg, 0)
    return jnp.concatenate(outs, axis=0)


def _chunk_states_pps(h0, a, b, *, seg: int = 8):
    """`_chunk_states` with the hybrid inverted: PARALLEL over the
    C/seg segments, SEQUENTIAL within each segment.

    The seg-step inner loop runs on full-width (C/seg, 1, N, d_tile)
    slabs — every step is 2 FMAs + 1 mul per element with NO
    roll/iota-mask overhead (the Hillis-Steele levels cost ~6-8 VPU
    ops per element per level in shifts and masks). Cross-segment
    carries are resolved by a log-depth scan over the C/seg
    segment-summary rows (negligible: (C/seg, N, d) elements) and a
    rank-1 fix-up h = h_local + p_cum * entry."""
    C, N_, d_ = a.shape
    m = C // seg
    if C % seg or m < 2:
        return _chunk_states(h0, a, b, seg=seg)
    a4 = a.reshape(m, seg, N_, d_)      # leading-axis split only
    b4 = b.reshape(m, seg, N_, d_)
    h = jnp.zeros((m, 1, N_, d_), a.dtype)
    p = None
    hs, ps = [], []
    for j in range(seg):
        a_j = jax.lax.slice_in_dim(a4, j, j + 1, axis=1)
        b_j = jax.lax.slice_in_dim(b4, j, j + 1, axis=1)
        h = a_j * h + b_j               # local state, segment h0 = 0
        p = a_j if p is None else p * a_j
        hs.append(h)
        ps.append(p)
    h_loc = jnp.concatenate(hs, axis=1)             # (m, seg, N, d)
    p_cum = jnp.concatenate(ps, axis=1)
    # Global state at each segment end: inclusive affine scan of the
    # (full-segment product, local end state) summaries against h0.
    A_cum, B_resp = _hs_scan(ps[-1], hs[-1])        # over axis 0, m
    g_end = A_cum * h0[None, None] + B_resp
    ent = _shift_fwd(g_end, 1)                      # e_i = g_end_{i-1}
    ids = jax.lax.broadcasted_iota(jnp.int32, ent.shape, 0)
    ent = jnp.where(ids == 0, h0[None, None].astype(ent.dtype), ent)
    return (h_loc + p_cum * ent).reshape(C, N_, d_)


def _suffix_scan_pps(a_up, w, *, seg: int = 8):
    """`_suffix_scan` (dh_t = w_t + a_up_t dh_{t+1}, dh_C = 0) with
    the parallel-over-segments decomposition, right-to-left."""
    C, N_, d_ = a_up.shape
    m = C // seg
    if C % seg or m < 2:
        return _suffix_scan(a_up, w, seg=seg)
    a4 = a_up.reshape(m, seg, N_, d_)
    w4 = w.reshape(m, seg, N_, d_)
    dh = jnp.zeros((m, 1, N_, d_), a_up.dtype)
    q = None
    dhs, qs = [None] * seg, [None] * seg
    for j in reversed(range(seg)):
        a_j = jax.lax.slice_in_dim(a4, j, j + 1, axis=1)
        w_j = jax.lax.slice_in_dim(w4, j, j + 1, axis=1)
        dh = w_j + a_j * dh             # local suffix, carry-in = 0
        q = a_j if q is None else a_j * q
        dhs[j] = dh
        qs[j] = q
    loc = jnp.concatenate(dhs, axis=1)
    q_cum = jnp.concatenate(qs, axis=1)
    # Global dh at segment starts: suffix scan of the summaries.
    _, dh_starts = _hs_scan(qs[0], dhs[0], reverse=True)
    nxt = _shift_rev(dh_starts, 1)      # dh at next segment's start
    ids = jax.lax.broadcasted_iota(jnp.int32, nxt.shape, 0)
    nxt = jnp.where(ids == m - 1, jnp.zeros((), nxt.dtype), nxt)
    return (loc + q_cum * nxt).reshape(C, N_, d_)


def _pps2_entries(h0, a4, b4):
    """Per-segment TRUE entry states for the seeded-recompute ('pps2')
    schedule: run the local recurrence once keeping only the running
    (state, product) pair — no per-step storage — then resolve the
    cross-segment carries with a log-depth scan over the m segment
    summaries. Returns ent (m, 1, N, d) with ent_0 = h0."""
    m, seg = a4.shape[0], a4.shape[1]
    h = jnp.zeros((m, 1) + a4.shape[2:], a4.dtype)
    p = None
    for j in range(seg):
        a_j = jax.lax.slice_in_dim(a4, j, j + 1, axis=1)
        b_j = jax.lax.slice_in_dim(b4, j, j + 1, axis=1)
        h = a_j * h + b_j
        p = a_j if p is None else p * a_j
    A_cum, B_resp = _hs_scan(p, h)                  # over axis 0, m
    g_end = A_cum * h0[None, None] + B_resp
    ent = _shift_fwd(g_end, 1)
    ids = jax.lax.broadcasted_iota(jnp.int32, ent.shape, 0)
    return jnp.where(ids == 0, h0[None, None].astype(ent.dtype), ent)


def _chunk_states_pps2(h0, a, b, *, seg: int = 8):
    """`_chunk_states_pps` with the fix-up replaced by a SEEDED
    RECOMPUTE: pass 1 computes only the m segment summaries (running
    state + running product, nothing stored per step), a tiny scan
    yields each segment's true entry state, and pass 2 re-runs the
    recurrence from those seeds — the emitted states are globally
    correct directly. Trades one extra FMA pass for never
    materializing the (C, N, d) p_cum tensor or paying the 2-op
    fix-up, and halves the number of big concats."""
    C, N_, d_ = a.shape
    m = C // seg
    if C % seg or m < 2:
        return _chunk_states(h0, a, b, seg=seg)
    a4 = a.reshape(m, seg, N_, d_)
    b4 = b.reshape(m, seg, N_, d_)
    h = _pps2_entries(h0, a4, b4)
    outs = []
    for j in range(seg):
        a_j = jax.lax.slice_in_dim(a4, j, j + 1, axis=1)
        b_j = jax.lax.slice_in_dim(b4, j, j + 1, axis=1)
        h = a_j * h + b_j
        outs.append(h)
    return jnp.concatenate(outs, axis=1).reshape(C, N_, d_)


def _fwd_fused_pps2(h0, a, b, Cc, *, seg: int = 8):
    """Seeded-recompute forward with the C-readout FUSED into the
    inner loop: returns (y_scan (C, d) = sum_n Cc_n * h_n, h_last
    (N, d)). The full (C, N, d) state tensor never exists — pass 2
    reduces each step's (m, 1, N, d) slab over N immediately, so the
    only per-step storage is the (m, 1, d) readout row (16x smaller
    at N=16)."""
    C, N_, d_ = a.shape
    m = C // seg
    if C % seg or m < 2:
        h_all = _chunk_states(h0, a, b, seg=seg)
        y = jnp.sum(h_all.astype(jnp.float32) * Cc[..., None], axis=1)
        return y, _time_row(h_all, -1).astype(jnp.float32)
    a4 = a.reshape(m, seg, N_, d_)
    b4 = b.reshape(m, seg, N_, d_)
    c4 = Cc.reshape(m, seg, N_)
    h = _pps2_entries(h0, a4, b4)
    ys = []
    for j in range(seg):
        a_j = jax.lax.slice_in_dim(a4, j, j + 1, axis=1)
        b_j = jax.lax.slice_in_dim(b4, j, j + 1, axis=1)
        c_j = jax.lax.slice_in_dim(c4, j, j + 1, axis=1)  # (m, 1, N)
        h = a_j * h + b_j
        ys.append(jnp.sum(h.astype(jnp.float32)
                          * c_j[..., None].astype(jnp.float32),
                          axis=2))                        # (m, 1, d)
    y = jnp.concatenate(ys, axis=1).reshape(C, d_)
    h_last = jax.lax.slice_in_dim(h, m - 1, m, axis=0).reshape(N_, d_)
    return y, h_last.astype(jnp.float32)


def _suffix_scan_pps2(a_up, w, *, seg: int = 8):
    """`_suffix_scan_pps` with the seeded-recompute schedule,
    right-to-left (see _chunk_states_pps2)."""
    C, N_, d_ = a_up.shape
    m = C // seg
    if C % seg or m < 2:
        return _suffix_scan(a_up, w, seg=seg)
    a4 = a_up.reshape(m, seg, N_, d_)
    w4 = w.reshape(m, seg, N_, d_)
    dh = jnp.zeros((m, 1, N_, d_), a_up.dtype)
    q = None
    for j in reversed(range(seg)):
        a_j = jax.lax.slice_in_dim(a4, j, j + 1, axis=1)
        w_j = jax.lax.slice_in_dim(w4, j, j + 1, axis=1)
        dh = w_j + a_j * dh
        q = a_j if q is None else a_j * q
    _, dh_starts = _hs_scan(q, dh, reverse=True)    # over axis 0, m
    nxt = _shift_rev(dh_starts, 1)      # dh at next segment's start
    ids = jax.lax.broadcasted_iota(jnp.int32, nxt.shape, 0)
    dh = jnp.where(ids == m - 1, jnp.zeros((), nxt.dtype), nxt)
    outs = [None] * seg
    for j in reversed(range(seg)):
        a_j = jax.lax.slice_in_dim(a4, j, j + 1, axis=1)
        w_j = jax.lax.slice_in_dim(w4, j, j + 1, axis=1)
        dh = w_j + a_j * dh
        outs[j] = dh
    return jnp.concatenate(outs, axis=1).reshape(C, N_, d_)


_STATES_IMPL = {'hybrid': _chunk_states, 'pps': _chunk_states_pps,
                'pps2': _chunk_states_pps2, 'pps3': _chunk_states_pps2}
_SUFFIX_IMPL = {'hybrid': _suffix_scan, 'pps': _suffix_scan_pps,
                'pps2': _suffix_scan_pps2, 'pps3': _suffix_scan_pps2}


def _states(h0, a, b, *, seg, impl):
    return _STATES_IMPL[impl](h0, a, b, seg=seg)


def _suffix(a_up, w, *, seg, impl):
    return _SUFFIX_IMPL[impl](a_up, w, seg=seg)


def _fwd_kernel(u_ref, dt_ref, b_ref, c_ref, a_log_ref, z_ref,
                d_vec_ref, y_ref, h0_out_ref, h_scr, *, seg,
                scan_dtype, scan_impl='hybrid'):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        h_scr[...] = jnp.zeros_like(h_scr)

    h0 = h_scr[...]                                   # (N, d)
    h0_out_ref[0, 0] = h0

    dt = dt_ref[0].astype(jnp.float32)                # (C, d)
    u = u_ref[0].astype(jnp.float32)                  # (C, d)
    Bc = b_ref[0].astype(jnp.float32)                 # (C, N)
    Cc = c_ref[0].astype(jnp.float32)                 # (C, N)
    A = -jnp.exp(a_log_ref[...].astype(jnp.float32))  # (N, d)
    z = z_ref[0].astype(jnp.float32)                  # (C, d)
    dvec = d_vec_ref[...].astype(jnp.float32)         # (1, d)

    a = jnp.exp(dt[:, None, :] * A[None])             # (C, N, d)
    b = (dt * u)[:, None, :] * Bc[..., None]          # (C, N, d)
    # Optional reduced-precision scan arithmetic (a in (0,1), b small:
    # the affine-scan FMAs tolerate bf16; cross-chunk state stays fp32
    # in the scratch so error does not compound across chunks).
    a = a.astype(scan_dtype)
    b = b.astype(scan_dtype)
    if scan_impl in ('pps2', 'pps3'):
        # Seeded-recompute schedule with the N-readout fused into the
        # inner loop: the (C, N, d) state tensor never materializes.
        y_scan, h_last = _fwd_fused_pps2(h0.astype(scan_dtype), a, b,
                                         Cc, seg=seg)
        h_scr[...] = h_last
        y_pre = y_scan + dvec * u
    else:
        h_all = _states(h0.astype(scan_dtype), a, b, seg=seg,
                        impl=scan_impl).astype(jnp.float32)
        h_scr[...] = _time_row(h_all, -1)
        y_pre = jnp.sum(h_all * Cc[..., None], axis=1) + dvec * u
    # Fused epilogue: y = (scan + D*u) * silu(z) — three elementwise
    # HBM passes of the unfused chain folded into the kernel.
    y_ref[0] = y_pre * (z * jax.nn.sigmoid(z))


def _bwd_fused_pps3(h0, a, b, a_up, dt, u, Bc, Cc, gy, A, dvec,
                    carry_in, *, seg, scan_dtype,
                    ddt_ref, du_ref, db_ref, dc_ref):
    """Consumer-fused seeded-recompute backward ('pps3').

    Pass 1 (ascending, seeded by the true segment entries) keeps the
    per-step forward states as a LIST of (m, 1, N, d) slabs — no
    (C, N, d) concat. Pass 2 (descending, seeded by the true
    cross-segment adjoint carries) computes each dh row and
    immediately reduces it into the per-row ddt/du/db/dc outputs and
    the dA accumulator, so the (C, N, d) adjoint stack never exists.
    Writes ddt/du (C, d) and db/dc (C, N) rows into the given refs;
    returns (y_pre (C, d), dA (N, d), dD (1, d), carry (N, d))."""
    C_len, N_, d_ = a.shape
    m = C_len // seg
    sd = scan_dtype
    a4 = a.astype(sd).reshape(m, seg, N_, d_)
    b4 = b.astype(sd).reshape(m, seg, N_, d_)
    au4 = a_up.astype(sd).reshape(m, seg, N_, d_)
    Cc4 = Cc.reshape(m, seg, N_)
    Bc4 = Bc.reshape(m, seg, N_)
    gy4 = gy.reshape(m, seg, d_)
    dt4 = dt.reshape(m, seg, d_)
    u4 = u.reshape(m, seg, d_)

    def row3(x4, j):                     # (m, seg, K) -> (m, 1, K)
        return jax.lax.slice_in_dim(x4, j, j + 1, axis=1)

    def row4(x4, j):                     # (m, seg, N, d) -> (m, 1, N, d)
        return jax.lax.slice_in_dim(x4, j, j + 1, axis=1)

    def w_row(j):
        wj = (row3(Cc4, j)[..., None]
              * row3(gy4, j)[:, :, None, :])         # (m, 1, N, d)
        if j == seg - 1:
            ids = jax.lax.broadcasted_iota(jnp.int32, wj.shape, 0)
            wj = jnp.where(ids == m - 1, wj + carry_in[None, None], wj)
        return wj

    # Forward states per step, seeded by true entries (list, no concat).
    ent = _pps2_entries(h0.astype(sd), a4, b4)        # (m, 1, N, d)
    hs = []
    h = ent
    for j in range(seg):
        h = row4(a4, j) * h + row4(b4, j)
        hs.append(h)

    # True adjoint carry-in per segment (descending summaries).
    dh = jnp.zeros((m, 1, N_, d_), sd)
    q = None
    for j in reversed(range(seg)):
        a_j = row4(au4, j)
        dh = w_row(j).astype(sd) + a_j * dh
        q = a_j if q is None else a_j * q
    _, dh_starts = _hs_scan(q, dh, reverse=True)      # over axis 0, m
    nxt = _shift_rev(dh_starts, 1)
    ids0 = jax.lax.broadcasted_iota(jnp.int32, nxt.shape, 0)
    dh = jnp.where(ids0 == m - 1, jnp.zeros((), nxt.dtype), nxt)

    # Fused descending pass: dh rows consumed in place.
    acc_dA = jnp.zeros((N_, d_), jnp.float32)
    ddt_rows = [None] * seg
    du_rows = [None] * seg
    db_rows = [None] * seg
    dc_rows = [None] * seg
    ypre_rows = [None] * seg
    for j in reversed(range(seg)):
        dh = w_row(j).astype(sd) + row4(au4, j) * dh
        dh32 = dh.astype(jnp.float32)
        af_j = row4(a4, j).astype(jnp.float32)
        h_j = hs[j].astype(jnp.float32)
        hp_j = (hs[j - 1] if j > 0 else ent).astype(jnp.float32)
        da_j = dh32 * hp_j                            # (m, 1, N, d)
        dt_j = row3(dt4, j)                           # (m, 1, d)
        u_j = row3(u4, j)
        gy_j = row3(gy4, j)
        Bc_j = row3(Bc4, j)[..., None]                # (m, 1, N, 1)
        Cc_j = row3(Cc4, j)[..., None]
        dhB_j = jnp.sum(dh32 * Bc_j, axis=2)          # (m, 1, d)
        daa = da_j * af_j
        ddt_rows[j] = jnp.sum(daa * A[None, None], axis=2) \
            + dhB_j * u_j
        du_rows[j] = dhB_j * dt_j + gy_j * dvec[None]
        db_rows[j] = jnp.sum(dh32 * (dt_j * u_j)[:, :, None, :],
                             axis=3)                  # (m, 1, N)
        dc_rows[j] = jnp.sum(h_j * gy_j[:, :, None, :], axis=3)
        ypre_rows[j] = jnp.sum(h_j * Cc_j, axis=2)    # (m, 1, d)
        acc_dA = acc_dA + jnp.sum(daa * dt_j[:, :, None, :],
                                  axis=(0, 1))

    ddt_ref[0] = jnp.concatenate(ddt_rows, axis=1).reshape(C_len, d_)
    du_ref[0] = jnp.concatenate(du_rows, axis=1).reshape(C_len, d_)
    db_ref[0, 0] = jnp.concatenate(db_rows, axis=1).reshape(C_len, N_)
    dc_ref[0, 0] = jnp.concatenate(dc_rows, axis=1).reshape(C_len, N_)
    y_pre = jnp.concatenate(ypre_rows, axis=1).reshape(C_len, d_) \
        + dvec * u
    dD = jnp.sum(gy * u, axis=0, keepdims=True)       # (1, d)
    # carry for the chunk to the left: a_{t=0} * dh_{t=0}.
    a_t0 = jax.lax.slice(a, (0, 0, 0), (1, N_, d_)).reshape(N_, d_)
    dh_t0 = jax.lax.slice(dh.astype(jnp.float32), (0, 0, 0, 0),
                          (1, 1, N_, d_)).reshape(N_, d_)
    return y_pre, acc_dA, dD, a_t0 * dh_t0


def _bwd_kernel(u_ref, dt_ref, b_ref, c_ref, a_log_ref, z_ref,
                d_vec_ref, h0_ref, g_ref,
                du_ref, ddt_ref, db_ref, dc_ref, da_log_ref, dz_ref,
                dd_vec_ref, carry_scr, *, seg, scan_dtype,
                scan_impl='hybrid'):
    """Adjoint scan; grid index k maps to chunk nc-1-k (reverse
    chunk order, see the index maps). carry_scr holds
    a_first*dh_first of the chunk to the right (zero at the last).
    The incoming g is the gradient wrt the GATED output
    (scan + D*u) * silu(z); the gate adjoint is handled in-kernel."""
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        carry_scr[...] = jnp.zeros_like(carry_scr)

    dt = dt_ref[0].astype(jnp.float32)                # (C, d)
    u = u_ref[0].astype(jnp.float32)                  # (C, d)
    Bc = b_ref[0].astype(jnp.float32)                 # (C, N)
    Cc = c_ref[0].astype(jnp.float32)                 # (C, N)
    g_gated = g_ref[0].astype(jnp.float32)            # (C, d)
    A = -jnp.exp(a_log_ref[...].astype(jnp.float32))  # (N, d)
    z = z_ref[0].astype(jnp.float32)                  # (C, d)
    dvec = d_vec_ref[...].astype(jnp.float32)         # (1, d)
    h0 = h0_ref[0, 0]                                 # (N, d)

    C_len, N_, d_ = dt.shape[0], A.shape[0], A.shape[1]
    t_ids = jax.lax.broadcasted_iota(jnp.int32, (C_len, N_, d_), 0)

    # Recompute within-chunk forward states.
    a = jnp.exp(dt[:, None, :] * A[None])             # (C, N, d)
    b = (dt * u)[:, None, :] * Bc[..., None]

    # Gate adjoint pieces: y = y_pre * silu(z), y_pre = scan + D*u.
    sig = jax.nn.sigmoid(z)
    sg = z * sig
    gy = g_gated * sg                                 # d/d y_pre

    # a_up_t = a_{t+1} (1 at t = C-1): suffix-scan coefficient.
    a_up = jnp.where(t_ids == C_len - 1, 1.0,
                     pltpu.roll(a, C_len - 1, 0))

    m_segs = C_len // seg
    if scan_impl == 'pps3' and C_len % seg == 0 and m_segs >= 2:
        # Consumer-FUSED seeded-recompute backward: neither the
        # (C, N, d) state stack nor the (C, N, d) adjoint stack is
        # ever concatenated — the descending pass computes dh rows and
        # immediately reduces them into the per-row ddt/du/db/dc
        # outputs (d- or N-wide rows, 16-64x smaller).
        y_pre, dA, dD, carry = _bwd_fused_pps3(
            h0, a, b, a_up, dt, u, Bc, Cc, gy, A, dvec,
            carry_scr[...], seg=seg, scan_dtype=scan_dtype,
            ddt_ref=ddt_ref, du_ref=du_ref, db_ref=db_ref,
            dc_ref=dc_ref)
        dz_ref[0] = g_gated * y_pre * (sig + sg * (1.0 - sig))
        carry_scr[...] = carry
    else:
        impl = 'pps2' if scan_impl == 'pps3' else scan_impl
        h_all = _states(h0.astype(scan_dtype), a.astype(scan_dtype),
                        b.astype(scan_dtype), seg=seg,
                        impl=impl).astype(jnp.float32)
        # h_{t-1}: shift down by one, h0 at t=0.
        h_prev = jnp.where(t_ids == 0, h0[None],
                           pltpu.roll(h_all, 1, 0))

        y_pre = jnp.sum(h_all * Cc[..., None], axis=1) + dvec * u
        # d silu(z)/dz = sig * (1 + z * (1 - sig))
        dz_ref[0] = g_gated * y_pre * (sig + sg * (1.0 - sig))

        # Adjoint: dh_t = w_t + a_{t+1} dh_{t+1}; suffix scan with
        # the cross-chunk carry folded into w at t=C-1.
        w = Cc[..., None] * gy[:, None, :]            # (C, N, d)
        w = jnp.where(t_ids == C_len - 1,
                      w + carry_scr[...][None], w)
        dh = _suffix(a_up.astype(scan_dtype), w.astype(scan_dtype),
                     seg=seg, impl=impl).astype(jnp.float32)

        carry_scr[...] = _time_row(a, 0) * _time_row(dh, 0)

        da = dh * h_prev                              # wrt a
        dhB = jnp.sum(dh * Bc[..., None], axis=1)     # (C, d)
        ddt_ref[0] = jnp.sum(da * a * A[None], axis=1) + dhB * u
        du_ref[0] = dhB * dt + gy * dvec
        # db/dc reduce over d, which is tiled across grid dim 1 —
        # emit per-d-tile partials (summed outside; non-consecutive
        # output revisits are not a safe accumulation pattern).
        db_ref[0, 0] = jnp.sum(dh * (dt * u)[:, None, :], axis=2)
        dc_ref[0, 0] = jnp.sum(h_all * gy[:, None, :], axis=2)

        # dA_log / dD accumulated over chunks (k innermost =>
        # consecutive revisits of the same (bi, di) output block, the
        # safe Pallas accumulation pattern); summed over B outside.
        dA = jnp.sum(da * a * dt[:, None, :], axis=0)  # (N, d)
        dD = jnp.sum(gy * u, axis=0, keepdims=True)    # (1, d)

    @pl.when(k == 0)
    def _():
        da_log_ref[0] = jnp.zeros_like(da_log_ref[0])
        dd_vec_ref[0] = jnp.zeros_like(dd_vec_ref[0])

    da_log_ref[0] += dA * A
    dd_vec_ref[0] += dD


def _specs(chunk, d_tile, N, *, rev, nc):
    kmap = (lambda k: nc - 1 - k) if rev else (lambda k: k)
    u_spec = pl.BlockSpec((1, chunk, d_tile),
                          lambda bi, di, k: (bi, kmap(k), di),
                          memory_space=pltpu.VMEM)
    n_spec = pl.BlockSpec((1, chunk, N),
                          lambda bi, di, k: (bi, kmap(k), 0),
                          memory_space=pltpu.VMEM)
    a_spec = pl.BlockSpec((N, d_tile), lambda bi, di, k: (0, di),
                          memory_space=pltpu.VMEM)
    h0_spec = pl.BlockSpec((1, 1, N, d_tile),
                           lambda bi, di, k: (bi, kmap(k), 0, di),
                           memory_space=pltpu.VMEM)
    return u_spec, n_spec, a_spec, h0_spec


def _fwd_call(u, delta, A_log, Bc, Cc, z, Dv, *, chunk, d_tile,
              interpret, seg=8, scan_dtype=jnp.float32,
              scan_impl='hybrid'):
    B, L, d = u.shape
    N = A_log.shape[0]
    nc = L // chunk
    u_spec, n_spec, a_spec, h0_spec = _specs(chunk, d_tile, N,
                                             rev=False, nc=nc)
    d_spec = pl.BlockSpec((1, d_tile), lambda bi, di, k: (0, di),
                          memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_fwd_kernel, seg=seg, scan_dtype=scan_dtype,
                          scan_impl=scan_impl),
        grid=(B, d // d_tile, nc),
        in_specs=[u_spec, u_spec, n_spec, n_spec, a_spec, u_spec,
                  d_spec],
        out_specs=(u_spec, h0_spec),
        out_shape=(jax.ShapeDtypeStruct((B, L, d), jnp.float32),
                   jax.ShapeDtypeStruct((B, nc, N, d), jnp.float32)),
        scratch_shapes=[pltpu.VMEM((N, d_tile), jnp.float32)],
        interpret=interpret,
    )(u, delta, Bc, Cc, A_log, z, Dv.reshape(1, d))


def _bwd_call(u, delta, A_log, Bc, Cc, z, Dv, h0s, g, *, chunk,
              d_tile, interpret, seg=8, scan_dtype=jnp.float32,
              scan_impl='hybrid'):
    B, L, d = u.shape
    N = A_log.shape[0]
    nc = L // chunk
    u_spec, n_spec, a_spec, h0_spec = _specs(chunk, d_tile, N,
                                             rev=True, nc=nc)
    dA_spec = pl.BlockSpec((1, N, d_tile),
                           lambda bi, di, k: (bi, 0, di),
                           memory_space=pltpu.VMEM)
    d_spec = pl.BlockSpec((1, d_tile), lambda bi, di, k: (0, di),
                          memory_space=pltpu.VMEM)
    dD_spec = pl.BlockSpec((1, 1, d_tile),
                           lambda bi, di, k: (bi, 0, di),
                           memory_space=pltpu.VMEM)
    n_d = d // d_tile
    kmap = lambda k: nc - 1 - k  # noqa: E731
    dn_spec = pl.BlockSpec((1, 1, chunk, N),
                           lambda bi, di, k: (di, bi, kmap(k), 0),
                           memory_space=pltpu.VMEM)
    du, ddt, db, dc, dAlog, dz, dD = pl.pallas_call(
        functools.partial(_bwd_kernel, seg=seg, scan_dtype=scan_dtype,
                          scan_impl=scan_impl),
        grid=(B, n_d, nc),
        in_specs=[u_spec, u_spec, n_spec, n_spec, a_spec, u_spec,
                  d_spec, h0_spec, u_spec],
        out_specs=(u_spec, u_spec, dn_spec, dn_spec, dA_spec, u_spec,
                   dD_spec),
        out_shape=(jax.ShapeDtypeStruct((B, L, d), jnp.float32),
                   jax.ShapeDtypeStruct((B, L, d), jnp.float32),
                   jax.ShapeDtypeStruct((n_d, B, L, N), jnp.float32),
                   jax.ShapeDtypeStruct((n_d, B, L, N), jnp.float32),
                   jax.ShapeDtypeStruct((B, N, d), jnp.float32),
                   jax.ShapeDtypeStruct((B, L, d), jnp.float32),
                   jax.ShapeDtypeStruct((B, 1, d), jnp.float32)),
        scratch_shapes=[pltpu.VMEM((N, d_tile), jnp.float32)],
        interpret=interpret,
    )(u, delta, Bc, Cc, A_log, z, Dv.reshape(1, d), h0s, g)
    return (du, ddt, db.sum(axis=0), dc.sum(axis=0),
            dAlog.sum(axis=0), dz, dD.sum(axis=0).reshape(d))


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9, 10, 11,
                                                    12, 13, 14))
def ssm_scan(u, delta, A_log, Bc, Cc, z, Dv, chunk=128, d_tile=256,
             d_tile_bwd=128, interpret=False, seg=8,
             scan_dtype=jnp.float32, seg_bwd=None,
             scan_impl='hybrid'):
    """y_t = (sum_n C_{t,n} h_{t,n,:} + D u_t) * silu(z_t) with the
    Mamba recurrence — skip connection and gate fused in-kernel.

    u, delta, z: (B, L, d); A_log: (N, d) with A = -exp(A_log);
    Bc, Cc: (B, L, N); Dv: (d,). Returns y (B, L, d) fp32.
    Differentiable wrt all seven tensor args. chunk must divide L;
    d_tile(|_bwd) divide d. seg = sequential-segment length of the
    within-chunk scan; scan_dtype = in-kernel dtype of the
    affine-scan FMAs (bfloat16 halves VPU width; cross-chunk state
    stays fp32); scan_impl = 'hybrid' (sequential over segments,
    log-depth within), 'pps' (parallel over segments, sequential
    within — no shift/mask overhead in the inner loop), 'pps2'
    (pps with a seeded-recompute second pass instead of the rank-1
    fix-up: no p_cum materialization, and the forward fuses the
    N-readout into the inner loop so the (C, N, d) state tensor never
    exists in VMEM), or 'pps3' (pps2 forward + consumer-fused
    backward: the descending pass reduces each dh row straight into
    the ddt/du/db/dc outputs, so neither the state stack nor the
    adjoint stack is ever concatenated).
    """
    y, _ = _fwd_call(u, delta, A_log, Bc, Cc, z, Dv, chunk=chunk,
                     d_tile=d_tile, interpret=interpret, seg=seg,
                     scan_dtype=scan_dtype, scan_impl=scan_impl)
    return y


def _ssm_scan_vjp_fwd(u, delta, A_log, Bc, Cc, z, Dv, chunk, d_tile,
                      d_tile_bwd, interpret, seg, scan_dtype, seg_bwd,
                      scan_impl):
    y, h0s = _fwd_call(u, delta, A_log, Bc, Cc, z, Dv, chunk=chunk,
                       d_tile=d_tile, interpret=interpret, seg=seg,
                       scan_dtype=scan_dtype, scan_impl=scan_impl)
    return y, (u, delta, A_log, Bc, Cc, z, Dv, h0s)


def _ssm_scan_vjp_bwd(chunk, d_tile, d_tile_bwd, interpret, seg,
                      scan_dtype, seg_bwd, scan_impl, res, g):
    u, delta, A_log, Bc, Cc, z, Dv, h0s = res
    du, ddt, db, dc, dAlog, dz, dD = _bwd_call(
        u, delta, A_log, Bc, Cc, z, Dv, h0s, g, chunk=chunk,
        d_tile=d_tile_bwd, interpret=interpret,
        seg=seg if seg_bwd is None else seg_bwd,
        scan_dtype=scan_dtype, scan_impl=scan_impl)
    return (du.astype(u.dtype), ddt.astype(delta.dtype),
            dAlog.astype(A_log.dtype), db.astype(Bc.dtype),
            dc.astype(Cc.dtype), dz.astype(z.dtype),
            dD.astype(Dv.dtype))


ssm_scan.defvjp(_ssm_scan_vjp_fwd, _ssm_scan_vjp_bwd)


def _divisor_tile(d: int, target: int) -> int:
    """Largest tile <= target that divides d (the grid floor-divides
    d // d_tile, so a non-divisor tile would drop trailing channels)."""
    t = min(d, target)
    while t > 1 and d % t:
        t -= 1
    return max(t, 1)


def _pad_time(x, chunk):
    pad = (-x.shape[1]) % chunk
    if not pad:
        return x
    widths = [(0, 0)] * x.ndim
    widths[1] = (0, pad)
    return jnp.pad(x, widths)


def selective_scan_pallas(u, delta, A, B, C, D, z, *, chunk=128,
                          d_tile=None, d_tile_bwd=None,
                          interpret=False, seg=8,
                          scan_dtype=jnp.float32, seg_bwd=None,
                          scan_impl='hybrid'):
    """Drop-in replacement for models/dimamba.py::selective_scan with
    the recurrence in a Pallas kernel. u, delta, z: (B, L, d);
    A: (d, N) (= -exp(A_log)); B, C: (B, L, N); D: (d,).

    delta must already be softplus'd (matching selective_scan). The
    padded tail (if chunk doesn't divide L) contributes delta=0 =>
    a=1, b=0: state passes through untouched and the pad rows are
    sliced off.
    """
    Bsz, L, d = u.shape
    # Default tile targets re-swept for the pps impl on v5e
    # (scripts/bench_scan_sweep.py --pps2/--pps4): fwd 512 / bwd 256
    # beat the hybrid-era 256/128 by ~12%/18% fwd / fwd+bwd at the
    # Species10 shape (chunk=128; chunk>=256 with these tiles
    # VMEM-OOMs, d_tile_bwd=512 too).
    if d_tile is None:
        d_tile = _divisor_tile(d, 512)
    if d_tile_bwd is None:
        d_tile_bwd = _divisor_tile(d, 256)
    if d % d_tile or d % d_tile_bwd:
        raise ValueError(
            f'd_inner={d} must be divisible by d_tile={d_tile} and '
            f'd_tile_bwd={d_tile_bwd} (grid floor-divides; a non-divisor '
            f'tile would silently skip trailing channels)')
    A_log = jnp.log(-A.astype(jnp.float32)).T          # (N, d)
    up = _pad_time(u, chunk)
    dtp = _pad_time(delta.astype(jnp.float32), chunk)
    Bp = _pad_time(B, chunk)
    Cp = _pad_time(C, chunk)
    zp = _pad_time(z, chunk)
    y = ssm_scan(up, dtp, A_log, Bp, Cp, zp,
                 D.astype(jnp.float32), chunk, d_tile, d_tile_bwd,
                 interpret, seg, scan_dtype, seg_bwd, scan_impl)
    return y[:, :L].astype(u.dtype)


# ---------------------------------------------------------------------------
# dt-lowrank variant: the dt_proj (R -> d) matmul + softplus run INSIDE
# the kernel, so the (B, L, d) fp32 delta tensor never exists in HBM —
# the kernel reads the low-rank dt (B, L, R) instead (R = d/32 at the
# Species10 shape). This folds the XLA-side dt_proj/softplus passes and
# their residuals into the scan (one more step toward the reference's
# mamba_inner_fn megakernel, /root/reference/models/dimamba.py:176-195).
# ---------------------------------------------------------------------------

def _delta_from_lr(dtlr, wdt, bdt):
    pre = jax.lax.dot_general(
        dtlr, wdt, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST) + bdt
    return jax.nn.softplus(pre), pre


def _fwd_kernel_lr(u_ref, dtlr_ref, wdt_ref, bdt_ref, b_ref, c_ref,
                   a_log_ref, z_ref, d_vec_ref, y_ref, h0_out_ref,
                   h_scr, *, seg, scan_dtype, scan_impl='hybrid'):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        h_scr[...] = jnp.zeros_like(h_scr)

    h0 = h_scr[...]
    h0_out_ref[0, 0] = h0

    dtlr = dtlr_ref[0].astype(jnp.float32)            # (C, R)
    wdt = wdt_ref[...].astype(jnp.float32)            # (R, d)
    bdt = bdt_ref[...].astype(jnp.float32)            # (1, d)
    dt, _ = _delta_from_lr(dtlr, wdt, bdt)            # (C, d)
    u = u_ref[0].astype(jnp.float32)
    Bc = b_ref[0].astype(jnp.float32)
    Cc = c_ref[0].astype(jnp.float32)
    A = -jnp.exp(a_log_ref[...].astype(jnp.float32))
    z = z_ref[0].astype(jnp.float32)
    dvec = d_vec_ref[...].astype(jnp.float32)

    a = jnp.exp(dt[:, None, :] * A[None])
    b = (dt * u)[:, None, :] * Bc[..., None]
    h_all = _states(h0.astype(scan_dtype), a.astype(scan_dtype),
                    b.astype(scan_dtype), seg=seg,
                    impl=scan_impl).astype(jnp.float32)
    h_scr[...] = _time_row(h_all, -1)
    y_pre = jnp.sum(h_all * Cc[..., None], axis=1) + dvec * u
    y_ref[0] = y_pre * (z * jax.nn.sigmoid(z))


def _bwd_kernel_lr(u_ref, dtlr_ref, wdt_ref, bdt_ref, b_ref, c_ref,
                   a_log_ref, z_ref, d_vec_ref, h0_ref, g_ref,
                   du_ref, ddtlr_ref, dwdt_ref, dbdt_ref, db_ref,
                   dc_ref, da_log_ref, dz_ref, dd_vec_ref, carry_scr,
                   *, seg, scan_dtype, scan_impl='hybrid'):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        carry_scr[...] = jnp.zeros_like(carry_scr)

    dtlr = dtlr_ref[0].astype(jnp.float32)            # (C, R)
    wdt = wdt_ref[...].astype(jnp.float32)            # (R, d)
    bdt = bdt_ref[...].astype(jnp.float32)            # (1, d)
    dt, pre = _delta_from_lr(dtlr, wdt, bdt)          # (C, d)
    u = u_ref[0].astype(jnp.float32)
    Bc = b_ref[0].astype(jnp.float32)
    Cc = c_ref[0].astype(jnp.float32)
    g_gated = g_ref[0].astype(jnp.float32)
    A = -jnp.exp(a_log_ref[...].astype(jnp.float32))
    z = z_ref[0].astype(jnp.float32)
    dvec = d_vec_ref[...].astype(jnp.float32)
    h0 = h0_ref[0, 0]

    C_len, N_, d_ = dt.shape[0], A.shape[0], A.shape[1]
    t_ids = jax.lax.broadcasted_iota(jnp.int32, (C_len, N_, d_), 0)

    a = jnp.exp(dt[:, None, :] * A[None])
    b = (dt * u)[:, None, :] * Bc[..., None]
    h_all = _states(h0.astype(scan_dtype), a.astype(scan_dtype),
                    b.astype(scan_dtype), seg=seg,
                    impl=scan_impl).astype(jnp.float32)
    h_prev = jnp.where(t_ids == 0, h0[None], pltpu.roll(h_all, 1, 0))

    sig = jax.nn.sigmoid(z)
    sg = z * sig
    gy = g_gated * sg
    y_pre = jnp.sum(h_all * Cc[..., None], axis=1) + dvec * u
    dz_ref[0] = g_gated * y_pre * (sig + sg * (1.0 - sig))

    w = Cc[..., None] * gy[:, None, :]
    w = jnp.where(t_ids == C_len - 1, w + carry_scr[...][None], w)
    a_up = jnp.where(t_ids == C_len - 1, 1.0,
                     pltpu.roll(a, C_len - 1, 0))
    dh = _suffix(a_up.astype(scan_dtype), w.astype(scan_dtype),
                 seg=seg, impl=scan_impl).astype(jnp.float32)

    carry_scr[...] = _time_row(a, 0) * _time_row(dh, 0)

    da = dh * h_prev
    dhB = jnp.sum(dh * Bc[..., None], axis=1)
    ddt = jnp.sum(da * a * A[None], axis=1) + dhB * u  # (C, d)
    du_ref[0] = dhB * dt + gy * dvec
    db_ref[0, 0] = jnp.sum(dh * (dt * u)[:, None, :], axis=2)
    dc_ref[0, 0] = jnp.sum(h_all * gy[:, None, :], axis=2)

    # dt = softplus(pre), pre = dtlr @ wdt + bdt:
    # dpre = ddt * sigmoid(pre); ddtlr = dpre @ wdt^T (per-d-tile
    # partial, summed outside); dwdt = dtlr^T @ dpre and dbdt = sum_t
    # dpre accumulated over chunks (k innermost => consecutive
    # revisits, the safe accumulation pattern), summed over B outside.
    dpre = ddt * jax.nn.sigmoid(pre)                  # (C, d)
    ddtlr_ref[0, 0] = jax.lax.dot_general(
        dpre, wdt, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)          # (C, R)
    dwdt = jax.lax.dot_general(
        dtlr, dpre, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)          # (R, d)
    dbdt = jnp.sum(dpre, axis=0, keepdims=True)       # (1, d)

    dA = jnp.sum(da * a * dt[:, None, :], axis=0)
    dD = jnp.sum(gy * u, axis=0, keepdims=True)

    @pl.when(k == 0)
    def _():
        da_log_ref[0] = jnp.zeros_like(da_log_ref[0])
        dd_vec_ref[0] = jnp.zeros_like(dd_vec_ref[0])
        dwdt_ref[0] = jnp.zeros_like(dwdt_ref[0])
        dbdt_ref[0] = jnp.zeros_like(dbdt_ref[0])

    da_log_ref[0] += dA * A
    dd_vec_ref[0] += dD
    dwdt_ref[0] += dwdt
    dbdt_ref[0] += dbdt


def _fwd_call_lr(u, dtlr, wdt, bdt, A_log, Bc, Cc, z, Dv, *, chunk,
                 d_tile, interpret, seg, scan_dtype,
                 scan_impl='hybrid'):
    B, L, d = u.shape
    N = A_log.shape[0]
    R = dtlr.shape[-1]
    nc = L // chunk
    u_spec, n_spec, a_spec, h0_spec = _specs(chunk, d_tile, N,
                                             rev=False, nc=nc)
    r_spec = pl.BlockSpec((1, chunk, R), lambda bi, di, k: (bi, k, 0),
                          memory_space=pltpu.VMEM)
    w_spec = pl.BlockSpec((R, d_tile), lambda bi, di, k: (0, di),
                          memory_space=pltpu.VMEM)
    d_spec = pl.BlockSpec((1, d_tile), lambda bi, di, k: (0, di),
                          memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_fwd_kernel_lr, seg=seg,
                          scan_dtype=scan_dtype, scan_impl=scan_impl),
        grid=(B, d // d_tile, nc),
        in_specs=[u_spec, r_spec, w_spec, d_spec, n_spec, n_spec,
                  a_spec, u_spec, d_spec],
        out_specs=(u_spec, h0_spec),
        out_shape=(jax.ShapeDtypeStruct((B, L, d), jnp.float32),
                   jax.ShapeDtypeStruct((B, nc, N, d), jnp.float32)),
        scratch_shapes=[pltpu.VMEM((N, d_tile), jnp.float32)],
        interpret=interpret,
    )(u, dtlr, wdt, bdt.reshape(1, d), Bc, Cc, A_log, z,
      Dv.reshape(1, d))


def _bwd_call_lr(u, dtlr, wdt, bdt, A_log, Bc, Cc, z, Dv, h0s, g, *,
                 chunk, d_tile, interpret, seg, scan_dtype,
                 scan_impl='hybrid'):
    B, L, d = u.shape
    N = A_log.shape[0]
    R = dtlr.shape[-1]
    nc = L // chunk
    u_spec, n_spec, a_spec, h0_spec = _specs(chunk, d_tile, N,
                                             rev=True, nc=nc)
    kmap = lambda k: nc - 1 - k  # noqa: E731
    r_spec = pl.BlockSpec((1, chunk, R),
                          lambda bi, di, k: (bi, kmap(k), 0),
                          memory_space=pltpu.VMEM)
    w_spec = pl.BlockSpec((R, d_tile), lambda bi, di, k: (0, di),
                          memory_space=pltpu.VMEM)
    d_spec = pl.BlockSpec((1, d_tile), lambda bi, di, k: (0, di),
                          memory_space=pltpu.VMEM)
    dA_spec = pl.BlockSpec((1, N, d_tile),
                           lambda bi, di, k: (bi, 0, di),
                           memory_space=pltpu.VMEM)
    dD_spec = pl.BlockSpec((1, 1, d_tile),
                           lambda bi, di, k: (bi, 0, di),
                           memory_space=pltpu.VMEM)
    dW_spec = pl.BlockSpec((1, R, d_tile),
                           lambda bi, di, k: (bi, 0, di),
                           memory_space=pltpu.VMEM)
    n_d = d // d_tile
    dn_spec = pl.BlockSpec((1, 1, chunk, N),
                           lambda bi, di, k: (di, bi, kmap(k), 0),
                           memory_space=pltpu.VMEM)
    dr_spec = pl.BlockSpec((1, 1, chunk, R),
                           lambda bi, di, k: (di, bi, kmap(k), 0),
                           memory_space=pltpu.VMEM)
    (du, ddtlr, dwdt, dbdt, db, dc, dAlog, dz,
     dD) = pl.pallas_call(
        functools.partial(_bwd_kernel_lr, seg=seg,
                          scan_dtype=scan_dtype, scan_impl=scan_impl),
        grid=(B, n_d, nc),
        in_specs=[u_spec, r_spec, w_spec, d_spec, n_spec, n_spec,
                  a_spec, u_spec, d_spec, h0_spec, u_spec],
        out_specs=(u_spec, dr_spec, dW_spec, dD_spec, dn_spec,
                   dn_spec, dA_spec, u_spec, dD_spec),
        out_shape=(jax.ShapeDtypeStruct((B, L, d), jnp.float32),
                   jax.ShapeDtypeStruct((n_d, B, L, R), jnp.float32),
                   jax.ShapeDtypeStruct((B, R, d), jnp.float32),
                   jax.ShapeDtypeStruct((B, 1, d), jnp.float32),
                   jax.ShapeDtypeStruct((n_d, B, L, N), jnp.float32),
                   jax.ShapeDtypeStruct((n_d, B, L, N), jnp.float32),
                   jax.ShapeDtypeStruct((B, N, d), jnp.float32),
                   jax.ShapeDtypeStruct((B, L, d), jnp.float32),
                   jax.ShapeDtypeStruct((B, 1, d), jnp.float32)),
        scratch_shapes=[pltpu.VMEM((N, d_tile), jnp.float32)],
        interpret=interpret,
    )(u, dtlr, wdt, bdt.reshape(1, d), Bc, Cc, A_log, z,
      Dv.reshape(1, d), h0s, g)
    return (du, ddtlr.sum(axis=0), dwdt.sum(axis=0),
            dbdt.sum(axis=0).reshape(d), db.sum(axis=0),
            dc.sum(axis=0), dAlog.sum(axis=0), dz,
            dD.sum(axis=0).reshape(d))


@functools.partial(jax.custom_vjp, nondiff_argnums=(9, 10, 11, 12, 13,
                                                    14, 15, 16))
def ssm_scan_dtlr(u, dtlr, wdt, bdt, A_log, Bc, Cc, z, Dv, chunk=128,
                  d_tile=256, d_tile_bwd=128, interpret=False, seg=8,
                  scan_dtype=jnp.float32, seg_bwd=None,
                  scan_impl='hybrid'):
    """ssm_scan with delta = softplus(dtlr @ wdt + bdt) computed
    in-kernel. dtlr: (B, L, R); wdt: (R, d); bdt: (d,); the rest as
    ssm_scan. Requires L % chunk == 0 (a padded tail would carry
    softplus(bdt) > 0 into the recurrence; the plain path pads with
    delta = 0)."""
    y, _ = _fwd_call_lr(u, dtlr, wdt, bdt, A_log, Bc, Cc, z, Dv,
                        chunk=chunk, d_tile=d_tile,
                        interpret=interpret, seg=seg,
                        scan_dtype=scan_dtype, scan_impl=scan_impl)
    return y


def _ssm_scan_dtlr_fwd(u, dtlr, wdt, bdt, A_log, Bc, Cc, z, Dv, chunk,
                       d_tile, d_tile_bwd, interpret, seg, scan_dtype,
                       seg_bwd, scan_impl):
    y, h0s = _fwd_call_lr(u, dtlr, wdt, bdt, A_log, Bc, Cc, z, Dv,
                          chunk=chunk, d_tile=d_tile,
                          interpret=interpret, seg=seg,
                          scan_dtype=scan_dtype, scan_impl=scan_impl)
    return y, (u, dtlr, wdt, bdt, A_log, Bc, Cc, z, Dv, h0s)


def _ssm_scan_dtlr_bwd(chunk, d_tile, d_tile_bwd, interpret, seg,
                       scan_dtype, seg_bwd, scan_impl, res, g):
    u, dtlr, wdt, bdt, A_log, Bc, Cc, z, Dv, h0s = res
    (du, ddtlr, dwdt, dbdt, db, dc, dAlog, dz, dD) = _bwd_call_lr(
        u, dtlr, wdt, bdt, A_log, Bc, Cc, z, Dv, h0s, g, chunk=chunk,
        d_tile=d_tile_bwd, interpret=interpret,
        seg=seg if seg_bwd is None else seg_bwd,
        scan_dtype=scan_dtype, scan_impl=scan_impl)
    return (du.astype(u.dtype), ddtlr.astype(dtlr.dtype),
            dwdt.astype(wdt.dtype), dbdt.astype(bdt.dtype),
            dAlog.astype(A_log.dtype), db.astype(Bc.dtype),
            dc.astype(Cc.dtype), dz.astype(z.dtype),
            dD.astype(Dv.dtype))


ssm_scan_dtlr.defvjp(_ssm_scan_dtlr_fwd, _ssm_scan_dtlr_bwd)


def selective_scan_pallas_dtlr(u, dt_lr, W_dt, b_dt, A, B, C, D, z, *,
                               chunk=128, d_tile=None, d_tile_bwd=None,
                               interpret=False, seg=8,
                               scan_dtype=jnp.float32, seg_bwd=None,
                               scan_impl='hybrid'):
    """selective_scan with the dt_proj + softplus fused in-kernel.

    dt_lr: (B, L, R) low-rank dt (the x_proj output slice, BEFORE
    dt_proj); W_dt: (R, d_inner); b_dt: (d_inner,). Other args as
    selective_scan_pallas. Requires L % chunk == 0."""
    Bsz, L, d = u.shape
    if L % chunk:
        raise ValueError(
            f'dt-lowrank path requires chunk | L (got L={L}, '
            f'chunk={chunk}); use selective_scan_pallas instead')
    if d_tile is None:
        d_tile = _divisor_tile(d, 256)
    if d_tile_bwd is None:
        d_tile_bwd = _divisor_tile(d, 128)
    A_log = jnp.log(-A.astype(jnp.float32)).T
    y = ssm_scan_dtlr(u, dt_lr.astype(jnp.float32),
                      W_dt.astype(jnp.float32),
                      b_dt.astype(jnp.float32), A_log, B, C, z,
                      D.astype(jnp.float32), chunk, d_tile, d_tile_bwd,
                      interpret, seg, scan_dtype, seg_bwd, scan_impl)
    return y.astype(u.dtype)
