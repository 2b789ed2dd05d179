"""Fused Pallas denoise-step kernels for absorbing-state sampling.

The north-star fusion (BASELINE.json): one kernel per reverse step that
takes raw denoiser logits and produces the next tokens, instead of the
reference's chain of separate ops (log_softmax -> exp -> posterior ->
divide -> Gumbel divide -> argmax, /root/reference/diffusion.py:1378-1420,
1738-1755), each of which is a full HBM pass over the (B, L, V) tensor.

Math (absorbing state / MDLM):
  x_theta = softmax(logits with mask-channel forced to -inf)
  q_xs[v != mask] = x_theta[v] * (mct - mcs) / mct
  q_xs[mask]      = mcs / mct
  xs ~ Gumbel-max(q_xs);  xs = xt where xt != mask (copy-over)

Gumbel-max is shift/scale invariant, so the kernel samples
  argmax_v [ log_tilde_q_v + G_v ]
with log_tilde_q_v = logits_v - LSE(logits) + log(mct - mcs) for
v != mask and log(mcs) for the mask channel — a single pass over V per
row computing LSE and the perturbed argmax, with Gumbel noise generated
on-chip (pltpu.prng_random_bits), i.e. zero extra HBM traffic beyond
one read of the logits.

CFG variant: log-probs are the gamma-interpolation of cond/uncond
log_softmax (diffusion.py:1475-1480); the kernel reads both logits
tiles and fuses interpolation + softmax + posterior + sampling.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -1e30


def _mix32(x):
    """murmur3 fmix32 finalizer (int32 wraparound arithmetic).

    The hardware PRNG gives no guarantee that *nearby* seeds produce
    decorrelated streams, and the per-(grid-cell) seeds are the
    sequential `seed + b*65537 + i` — hash them through an avalanche
    finalizer so every grid cell (and every step's base seed) lands on
    an uncorrelated stream."""
    x = x ^ jax.lax.shift_right_logical(x, 16)
    x = x * jnp.int32(-2048144789)          # 0x85ebca6b
    x = x ^ jax.lax.shift_right_logical(x, 13)
    x = x * jnp.int32(-1028477387)          # 0xc2b2ae35
    x = x ^ jax.lax.shift_right_logical(x, 16)
    return x


def _seed_cell(seed_ref, b, i):
    pltpu.prng_seed(_mix32(seed_ref[0] + jnp.int32(65537) * b + i))


def _gumbel(shape):
    """Standard Gumbel noise from the on-chip PRNG. int32 all the way
    (Mosaic has no uint32<->f32 path): logical-shift the random bits
    right by 8 for a non-negative 24-bit integer, scale to (0, 1)."""
    bits = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.int32)
    top = jax.lax.shift_right_logical(bits, 8)
    u = top.astype(jnp.float32) * (1.0 / (1 << 24)) + 1e-10
    return -jnp.log(-jnp.log(u))


def _row_sample(perturbed, vocab_size):
    """argmax over the (possibly padded) last (vocab) axis, written as
    max + index-select (Mosaic's argmax lowering hits an unrealized
    f32->i32 vector cast on this shape)."""
    v_ids = jax.lax.broadcasted_iota(jnp.int32, perturbed.shape,
                                     perturbed.ndim - 1)
    valid = v_ids < vocab_size
    perturbed = jnp.where(valid, perturbed, NEG)
    m = jnp.max(perturbed, axis=-1, keepdims=True)
    # lowest index attaining the max (ties -> first, like argmax)
    big = jnp.iinfo(jnp.int32).max
    idx = jnp.where(perturbed >= m, v_ids, big)
    return jnp.min(idx, axis=-1).astype(jnp.int32)



def _auto_tile(L: int, V: int) -> int:
    """Measured tile optima: 16 at LM1B vocab (30523; ~2 MB f32
    blocks), 128 at CIFAR vocab (256; larger tiles amortize the grid
    at narrow V — 1.43 vs 1.62/1.96/2.01 ms for 32/64/256). Pick the
    target by V, then shrink to a divisor of L."""
    t = min(128 if V <= 1024 else 16, L)
    while t > 1 and L % t:
        t //= 2
    return max(t, 1)


def _absorbing_kernel(seed_ref, xt_ref, mct_ref, mcs_ref, logits_ref,
                      *refs, vocab_size: int, mask_index: int,
                      external_gumbel: bool):
    # refs = (gumbel_ref, out_ref) when external_gumbel else (out_ref,)
    # — an external-noise path exists so CPU tests can run the kernel
    # under the plain interpreter with exact expected values (the
    # on-chip PRNG has no CPU lowering and the TPU interpreter's
    # device-barrier emulation deadlocks intermittently).
    out_ref = refs[-1]
    b = pl.program_id(0)
    i = pl.program_id(1)

    logits = logits_ref[...].astype(jnp.float32)  # (1, TL, Vp)
    v_ids = jax.lax.broadcasted_iota(jnp.int32, logits.shape,
                                     logits.ndim - 1)
    is_mask = v_ids == mask_index
    valid = v_ids < vocab_size
    # SUBS zero-masking: mask channel -> -inf before softmax
    masked_logits = jnp.where(is_mask | ~valid, NEG, logits)
    row_max = jnp.max(masked_logits, axis=-1, keepdims=True)
    lse = row_max + jnp.log(
        jnp.sum(jnp.exp(masked_logits - row_max), axis=-1,
                keepdims=True))

    mct = mct_ref[b]
    mcs = mcs_ref[b]
    log_move = jnp.log(mct - mcs)
    log_stay = jnp.log(mcs)

    log_q = jnp.where(is_mask, log_stay,
                      masked_logits - lse + log_move)
    if external_gumbel:
        g = refs[0][...].astype(jnp.float32)
    else:
        _seed_cell(seed_ref, b, i)
        g = _gumbel(logits.shape)
    xs = _row_sample(log_q + g, vocab_size)

    xt = xt_ref[0, 0, 0, :]
    out_ref[0, 0, 0, :] = jnp.where(xt != mask_index, xt, xs[0])


def _cfg_kernel(seed_ref, xt_ref, mct_ref, mcs_ref, gamma_ref,
                logits_c_ref, logits_u_ref, *refs,
                vocab_size: int, mask_index: int,
                external_gumbel: bool):
    out_ref = refs[-1]
    b = pl.program_id(0)
    i = pl.program_id(1)

    v_ids = jax.lax.broadcasted_iota(
        jnp.int32, logits_c_ref.shape, len(logits_c_ref.shape) - 1)
    is_mask = v_ids == mask_index
    valid = v_ids < vocab_size

    gamma = gamma_ref[0]
    # logit-space interpolation of x_theta (diffusion.py:1475-1477).
    # softmax(g*logp_c + (1-g)*logp_u) == softmax(g*lc + (1-g)*lu):
    # the per-row log-partition constants g*LSE_c + (1-g)*LSE_u shift
    # every channel equally and cancel in the renormalization, so ONE
    # log-sum-exp over the raw mixture suffices (the reference's two
    # inner log_softmax passes are per-row constants in disguise).
    mixed = (gamma * logits_c_ref[...].astype(jnp.float32)
             + (1 - gamma) * logits_u_ref[...].astype(jnp.float32))
    mixed = jnp.where(is_mask | ~valid, NEG, mixed)
    m = jnp.max(mixed, axis=-1, keepdims=True)
    lse = m + jnp.log(jnp.sum(jnp.exp(mixed - m), axis=-1,
                              keepdims=True))

    mct = mct_ref[b]
    mcs = mcs_ref[b]
    log_q = jnp.where(is_mask, jnp.log(mcs),
                      mixed - lse + jnp.log(mct - mcs))
    if external_gumbel:
        g = refs[0][...].astype(jnp.float32)
    else:
        _seed_cell(seed_ref, b, i)
        g = _gumbel(mixed.shape)
    xs = _row_sample(log_q + g, vocab_size)
    xt = xt_ref[0, 0, 0, :]
    out_ref[0, 0, 0, :] = jnp.where(xt != mask_index, xt, xs[0])


@functools.partial(jax.jit,
                   static_argnames=('mask_index', 'tile_l', 'interpret'))
def fused_absorbing_sample(seed, xt, logits, move_chance_t,
                           move_chance_s, *, mask_index: int,
                           tile_l=None, interpret=False,
                           gumbel=None):
    """Fused SUBS + posterior + Gumbel-argmax + copy-over.

    seed: int32 scalar; xt: (B, L) int32; logits: (B, L, V) fp32 or
    bf16 (read once, upcast in VMEM); move_chance_*: (B,) fp32.
    Returns xs (B, L) int32. Equivalent in distribution to the unfused
    reference chain. V needn't be 128-aligned: the edge of the last
    lane tile is masked in-kernel (`v_ids < vocab_size`), so no padded
    copy of the logits ever hits HBM.
    """
    B, L, V = logits.shape
    if tile_l is None:
        tile_l = _auto_tile(L, V)
    assert L % tile_l == 0, (L, tile_l)
    Vp = V
    n_tiles = L // tile_l
    grid = (B, n_tiles)
    # int32 token blocks cannot satisfy the (8, 128) VMEM tiling at
    # (1, tile_l); reshape to (B, n, 1, tile_l) so the block equals the
    # trailing array dims exactly (allowed by the Mosaic tiling rule).
    xt4 = xt.reshape(B, n_tiles, 1, tile_l)
    kernel = functools.partial(_absorbing_kernel, vocab_size=V,
                               mask_index=mask_index,
                               external_gumbel=gumbel is not None)
    logits_spec = pl.BlockSpec((1, tile_l, Vp), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM)
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec((1, 1, 1, tile_l),
                     lambda b, i: (b, i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec(memory_space=pltpu.SMEM),
        logits_spec,
    ]
    args = [jnp.asarray([seed], jnp.int32), xt4,
            move_chance_t.astype(jnp.float32),
            move_chance_s.astype(jnp.float32), logits]
    if gumbel is not None:
        in_specs.append(logits_spec)
        args.append(gumbel)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, 1, 1, tile_l),
                               lambda b, i: (b, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, n_tiles, 1, tile_l),
                                       jnp.int32),
        interpret=interpret,
    )(*args)
    return out.reshape(B, L)


@functools.partial(jax.jit,
                   static_argnames=('mask_index', 'tile_l', 'interpret'))
def fused_absorbing_cfg_sample(seed, xt, logits_cond, logits_uncond,
                               gamma, move_chance_t, move_chance_s, *,
                               mask_index: int, tile_l=None,
                               interpret=False, gumbel=None):
    """CFG variant: fused gamma-interpolation + softmax + posterior +
    Gumbel-argmax + copy-over (diffusion.py:1475-1480). Single-LSE
    mixture math (see _cfg_kernel); logits may be bf16."""
    B, L, V = logits_cond.shape
    if tile_l is None:
        tile_l = _auto_tile(L, V)
    assert L % tile_l == 0, (L, tile_l)
    Vp = V
    n_tiles = L // tile_l
    grid = (B, n_tiles)
    xt4 = xt.reshape(B, n_tiles, 1, tile_l)
    kernel = functools.partial(_cfg_kernel, vocab_size=V,
                               mask_index=mask_index,
                               external_gumbel=gumbel is not None)
    logits_spec = pl.BlockSpec((1, tile_l, Vp), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM)
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec((1, 1, 1, tile_l),
                     lambda b, i: (b, i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec(memory_space=pltpu.SMEM),
        logits_spec,
        logits_spec,
    ]
    args = [jnp.asarray([seed], jnp.int32), xt4,
            move_chance_t.astype(jnp.float32),
            move_chance_s.astype(jnp.float32),
            jnp.asarray([gamma], jnp.float32), logits_cond,
            logits_uncond]
    if gumbel is not None:
        in_specs.append(logits_spec)
        args.append(gumbel)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, 1, 1, tile_l),
                               lambda b, i: (b, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, n_tiles, 1, tile_l),
                                       jnp.int32),
        interpret=interpret,
    )(*args)
    return out.reshape(B, L)


# ---------------------------------------------------------------------------
# Uniform-state (UDLM) kernels. The posterior numerator
#   num_v = alpha_t*V*p_v*[v==xt] + (a_ts - alpha_t)*[v==xt]
#           + (alpha_s - alpha_t)*p_v + (1 - a_ts)*(1 - alpha_s)/V,
# a_ts = alpha_t/alpha_s (diffusion.py:367-394), has a per-row constant
# denominator — Gumbel-max needs only log(num), so the kernel samples
# argmax(log num + G) in one pass. The CFG variant interpolates LOG-
# POSTERIORS (diffusion.py:1481-1495): q ∝ num_c^g * num_u^(1-g), so
# perturbed = g*log(num_c) + (1-g)*log(num_u) + G (denominators cancel
# inside the row-wise renormalization).
# ---------------------------------------------------------------------------

def _uniform_num(logits, v_ids, valid, xt_f, a_t, a_s, vocab_size):
    lg = jnp.where(valid, logits, NEG)
    m = jnp.max(lg, axis=-1, keepdims=True)
    lse = m + jnp.log(jnp.sum(jnp.exp(lg - m), axis=-1, keepdims=True))
    p = jnp.exp(lg - lse)
    a_ts = a_t / a_s
    is_xt = (v_ids.astype(jnp.float32) == xt_f).astype(jnp.float32)
    num = (p * ((a_s - a_t) + is_xt * (a_t * vocab_size))
           + is_xt * (a_ts - a_t)
           + (1.0 - a_ts) * (1.0 - a_s) / vocab_size)
    return jnp.where(valid, jnp.log(num + 1e-35), NEG)


def _uniform_kernel(seed_ref, xt_ref, at_ref, as_ref, logits_ref,
                    *refs, vocab_size: int, external_gumbel: bool):
    out_ref = refs[-1]
    b = pl.program_id(0)
    i = pl.program_id(1)
    logits = logits_ref[...].astype(jnp.float32)      # (1, TL, V)
    v_ids = jax.lax.broadcasted_iota(jnp.int32, logits.shape,
                                     logits.ndim - 1)
    valid = v_ids < vocab_size
    log_q = _uniform_num(logits, v_ids, valid, xt_ref[...],
                         at_ref[b], as_ref[b], vocab_size)
    if external_gumbel:
        g = refs[0][...].astype(jnp.float32)
    else:
        _seed_cell(seed_ref, b, i)
        g = _gumbel(logits.shape)
    xs = _row_sample(log_q + g, vocab_size)
    out_ref[0, 0, 0, :] = xs[0]


def _uniform_cfg_kernel(seed_ref, xt_ref, at_ref, as_ref, gamma_ref,
                        logits_c_ref, logits_u_ref, *refs,
                        vocab_size: int, external_gumbel: bool):
    out_ref = refs[-1]
    b = pl.program_id(0)
    i = pl.program_id(1)
    lc = logits_c_ref[...].astype(jnp.float32)
    lu = logits_u_ref[...].astype(jnp.float32)
    v_ids = jax.lax.broadcasted_iota(jnp.int32, lc.shape, lc.ndim - 1)
    valid = v_ids < vocab_size
    xt_f = xt_ref[...]
    a_t, a_s = at_ref[b], as_ref[b]
    log_nc = _uniform_num(lc, v_ids, valid, xt_f, a_t, a_s, vocab_size)
    log_nu = _uniform_num(lu, v_ids, valid, xt_f, a_t, a_s, vocab_size)
    gamma = gamma_ref[0]
    mixed = gamma * log_nc + (1 - gamma) * log_nu
    mixed = jnp.where(valid, mixed, NEG)
    if external_gumbel:
        g = refs[0][...].astype(jnp.float32)
    else:
        _seed_cell(seed_ref, b, i)
        g = _gumbel(lc.shape)
    xs = _row_sample(mixed + g, vocab_size)
    out_ref[0, 0, 0, :] = xs[0]


def _uniform_call(kernel, seed, xt, alpha_t, alpha_s, logits_list,
                  extra_smem, *, tile_l, interpret, gumbel):
    B, L, V = logits_list[0].shape
    if tile_l is None:
        tile_l = _auto_tile(L, V)
    assert L % tile_l == 0, (L, tile_l)
    n_tiles = L // tile_l
    grid = (B, n_tiles)
    logits_spec = pl.BlockSpec((1, tile_l, V), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM)
    # xt as a (B, L, 1) f32 column so the per-(position, v) indicator
    # broadcasts against the (1, tile_l, V) logits block (int exact in
    # f32 for any real vocab size).
    xt3 = xt.astype(jnp.float32)[..., None]
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec((1, tile_l, 1), lambda b, i: (b, i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec(memory_space=pltpu.SMEM),
    ]
    args = [jnp.asarray([seed], jnp.int32), xt3,
            alpha_t.astype(jnp.float32), alpha_s.astype(jnp.float32)]
    for sm in extra_smem:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
        args.append(sm)
    for lg in logits_list:
        in_specs.append(logits_spec)
        args.append(lg)
    if gumbel is not None:
        in_specs.append(logits_spec)
        args.append(gumbel)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, 1, 1, tile_l),
                               lambda b, i: (b, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, n_tiles, 1, tile_l),
                                       jnp.int32),
        interpret=interpret,
    )(*args)
    return out.reshape(B, L)


@functools.partial(jax.jit,
                   static_argnames=('vocab_size', 'tile_l', 'interpret'))
def fused_uniform_sample(seed, xt, logits, alpha_t, alpha_s, *,
                         vocab_size: int, tile_l=None,
                         interpret=False, gumbel=None):
    """Fused uniform-posterior + Gumbel-argmax (UDLM reverse step;
    diffusion.py:1378-1420 uniform branch). xt: (B, L) int32;
    logits: (B, L, V) fp32/bf16; alpha_*: (B,)."""
    kernel = functools.partial(_uniform_kernel, vocab_size=vocab_size,
                               external_gumbel=gumbel is not None)
    return _uniform_call(kernel, seed, xt, alpha_t, alpha_s, [logits],
                         [], tile_l=tile_l, interpret=interpret,
                         gumbel=gumbel)


@functools.partial(jax.jit,
                   static_argnames=('vocab_size', 'tile_l', 'interpret'))
def fused_uniform_cfg_sample(seed, xt, logits_cond, logits_uncond,
                             gamma, alpha_t, alpha_s, *,
                             vocab_size: int, tile_l=None,
                             interpret=False, gumbel=None):
    """CFG variant: log-posterior interpolation + Gumbel-argmax
    (diffusion.py:1481-1495)."""
    kernel = functools.partial(_uniform_cfg_kernel,
                               vocab_size=vocab_size,
                               external_gumbel=gumbel is not None)
    return _uniform_call(kernel, seed, xt, alpha_t, alpha_s,
                         [logits_cond, logits_uncond],
                         [jnp.asarray([gamma], jnp.float32)],
                         tile_l=tile_l, interpret=interpret,
                         gumbel=gumbel)


# ---------------------------------------------------------------------------
# Head-fused absorbing kernel: the vocab projection ITSELF runs inside
# the sampling kernel, so the (B, L, V) logits tensor never exists in
# HBM (the reference materializes it every step, diffusion.py:1378-1420;
# the plain fused kernels above still write+read it once in bf16 —
# ~375 MB/step at the LM1B bench shape). Layout is vocab-on-sublanes:
#   logits^T = W^T (TV, D) @ feats^T (D, TL)  ->  (TV, TL)
# so the V-axis reductions (LSE, argmax) land on (1, TL) rows that
# persist per (b, l-tile) in VMEM scratch across the vocab-tile grid
# sweep (online-softmax accumulation + running Gumbel-argmax; the LSE
# shift is a per-row constant, so the argmax over non-mask channels can
# be tracked before the LSE is known, and the mask channel — whose
# posterior mass log(mcs) does NOT carry the LSE — is resolved against
# it in the final tile). Grid order (v, b, l) keeps each W^T tile
# resident across the whole batch sweep: HBM traffic per step is
# feats^T once per vocab tile + W^T once, ~3x less than the
# matmul-then-fused-kernel chain at the LM1B shape.
# ---------------------------------------------------------------------------

def _head_kernel(seed_ref, xt_ref, mct_ref, mcs_ref, feats_ref, w_ref,
                 bias_ref, *refs, vocab_size: int, mask_index: int,
                 n_v: int, tile_v: int, n_l: int,
                 external_gumbel: bool, quantized: bool = False):
    (out_ref, m_ref, s_ref, best_ref, idx_ref, mg_ref) = refs[-6:]
    v = pl.program_id(0)
    b = pl.program_id(1)
    i = pl.program_id(2)
    cell = b * n_l + i

    feats_t = feats_ref[0]                      # (D, TL)
    w_t = w_ref[...]                            # (TV, D)
    if quantized:
        # int8 head (round-5, VERDICT r4 next #5): s8 x s8 -> s32 MXU
        # dot at 2x the bf16 rate, rescaled exactly like
        # ops/quant.int8_dense (per-token activation scale x
        # per-vocab-row weight scale) — the composition that was
        # previously impossible (the bf16 fused head displaced the
        # int8 head matmul, measured -24%).
        wscale_ref, xscale_ref = refs[0], refs[1]
        acc = jax.lax.dot_general(
            w_t, feats_t, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)              # (TV, TL)
        # (acc * x_scale) * w_scale — the exact multiply order of
        # ops/quant.int8_dense, so logits are bit-identical to the
        # unfused int8 head.
        logits = (acc.astype(jnp.float32) * xscale_ref[0, 0]
                  * wscale_ref[...] + bias_ref[...])
    else:
        logits = jax.lax.dot_general(
            w_t, feats_t, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) + bias_ref[...]

    v_ids = v * tile_v + jax.lax.broadcasted_iota(
        jnp.int32, logits.shape, 0)
    is_mask = v_ids == mask_index
    valid = v_ids < vocab_size
    masked = jnp.where(is_mask | ~valid, NEG, logits)

    # online-LSE tile stats (exclude NEG channels from the sum)
    tm = jnp.max(masked, axis=0, keepdims=True)            # (1, TL)
    ts = jnp.sum(jnp.where(masked <= NEG / 2, 0.0,
                           jnp.exp(masked - tm)),
                 axis=0, keepdims=True)

    if external_gumbel:
        g_ref = refs[2] if quantized else refs[0]
        g = g_ref[0].astype(jnp.float32)                   # (TV, TL)
    else:
        pltpu.prng_seed(_mix32(seed_ref[0]
                               + jnp.int32(n_v) * cell + v))
        g = _gumbel(logits.shape)

    pert = jnp.where(masked <= NEG / 2, NEG, masked + g)
    tb = jnp.max(pert, axis=0, keepdims=True)              # (1, TL)
    big = jnp.iinfo(jnp.int32).max
    tidx = jnp.min(jnp.where(pert >= tb, v_ids, big),
                   axis=0, keepdims=True)
    mg_add = jnp.sum(jnp.where(is_mask & valid, g, 0.0),
                     axis=0, keepdims=True)

    @pl.when(v == 0)
    def _init():
        m_ref[cell] = tm
        s_ref[cell] = ts
        best_ref[cell] = tb
        idx_ref[cell] = tidx
        mg_ref[cell] = mg_add

    @pl.when(v != 0)
    def _merge():
        m_old, s_old = m_ref[cell], s_ref[cell]
        m_new = jnp.maximum(m_old, tm)
        m_ref[cell] = m_new
        s_ref[cell] = (s_old * jnp.exp(m_old - m_new)
                       + ts * jnp.exp(tm - m_new))
        b_old = best_ref[cell]
        take = tb > b_old
        best_ref[cell] = jnp.where(take, tb, b_old)
        idx_ref[cell] = jnp.where(take, tidx, idx_ref[cell])
        mg_ref[cell] = mg_ref[cell] + mg_add

    @pl.when(v == n_v - 1)
    def _final():
        lse = m_ref[cell] + jnp.log(s_ref[cell])
        mct = mct_ref[b]
        mcs = mcs_ref[b]
        pm_non = best_ref[cell] - lse + jnp.log(mct - mcs)
        pm_mask = jnp.log(mcs) + mg_ref[cell]
        xs = jnp.where(pm_non >= pm_mask, idx_ref[cell],
                       mask_index)[0]
        xt = xt_ref[0, 0, 0, :]
        out_ref[0, 0, 0, :] = jnp.where(xt != mask_index, xt, xs)


@functools.partial(jax.jit,
                   static_argnames=('vocab_size', 'mask_index',
                                    'tile_l', 'tile_v', 'interpret'))
def fused_absorbing_head_sample(seed, xt, feats_t, w_t, bias_col,
                                move_chance_t, move_chance_s, *,
                                vocab_size: int, mask_index: int,
                                tile_l=None, tile_v=2048,
                                interpret=False, gumbel_t=None):
    """SUBS + posterior + Gumbel-argmax + copy-over with the vocab
    matmul fused in.

    feats_t: (B, D, L) head features TRANSPOSED (bf16/fp32) — the
    output of dit_head_features, already gamma-mixed for CFG (the head
    is linear, samplers.py feature-mix path); w_t: (Vp, D) transposed
    output kernel, zero-padded to a multiple of tile_v; bias_col:
    (Vp, 1). Returns xs (B, L) int32, distribution-equivalent to
    dit_head_matmul + fused_absorbing_sample (fp32 accumulation in
    both; one bf16 rounding of the logits difference)."""
    B, D, L = feats_t.shape
    Vp = w_t.shape[0]
    assert Vp % tile_v == 0 and Vp >= vocab_size, (Vp, tile_v)
    if tile_l is None:
        t = min(128, L)
        while t > 1 and L % t:
            t //= 2
        tile_l = max(t, 1)
    assert L % tile_l == 0, (L, tile_l)
    n_l = L // tile_l
    n_v = Vp // tile_v
    grid = (n_v, B, n_l)
    xt4 = xt.reshape(B, n_l, 1, tile_l)
    kernel = functools.partial(
        _head_kernel, vocab_size=vocab_size, mask_index=mask_index,
        n_v=n_v, tile_v=tile_v, n_l=n_l,
        external_gumbel=gumbel_t is not None)
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec((1, 1, 1, tile_l), lambda v, b, i: (b, i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec((1, D, tile_l), lambda v, b, i: (b, 0, i),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((tile_v, D), lambda v, b, i: (v, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((tile_v, 1), lambda v, b, i: (v, 0),
                     memory_space=pltpu.VMEM),
    ]
    args = [jnp.asarray([seed], jnp.int32), xt4,
            move_chance_t.astype(jnp.float32),
            move_chance_s.astype(jnp.float32), feats_t, w_t,
            bias_col.astype(jnp.float32)]
    if gumbel_t is not None:
        in_specs.append(pl.BlockSpec(
            (1, tile_v, tile_l), lambda v, b, i: (b, v, i),
            memory_space=pltpu.VMEM))
        args.append(gumbel_t)
    cells = B * n_l
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, 1, 1, tile_l),
                               lambda v, b, i: (b, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, n_l, 1, tile_l), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((cells, 1, tile_l), jnp.float32),   # m
            pltpu.VMEM((cells, 1, tile_l), jnp.float32),   # s
            pltpu.VMEM((cells, 1, tile_l), jnp.float32),   # best
            pltpu.VMEM((cells, 1, tile_l), jnp.int32),     # best idx
            pltpu.VMEM((cells, 1, tile_l), jnp.float32),   # mask gumbel
        ],
        interpret=interpret,
    )(*args)
    return out.reshape(B, L)


@functools.partial(jax.jit,
                   static_argnames=('vocab_size', 'mask_index',
                                    'tile_l', 'tile_v', 'interpret'))
def fused_absorbing_head_sample_int8(seed, xt, feats_q_t, x_scale,
                                     w_q, w_scale, bias_col,
                                     move_chance_t, move_chance_s, *,
                                     vocab_size: int, mask_index: int,
                                     tile_l=None, tile_v=2048,
                                     interpret=False, gumbel_t=None):
    """int8 variant of fused_absorbing_head_sample: the vocab matmul
    runs s8 x s8 -> s32 on the MXU (2x the bf16 rate on v5e) with the
    SAME quantization scheme as ops/quant.int8_dense — per-token
    activation scales, per-output-channel weight scales — so it is the
    exact fused form of the int8 head matmul + fused_absorbing_sample
    chain, minus the (B, L, V) logits HBM round-trip.

    feats_q_t: (B, D, L) int8 (transposed quantized head features);
    x_scale: (B, 1, L) fp32 per-token scales; w_q: (Vp, D) int8
    (transposed, zero-padded); w_scale: (Vp, 1) fp32; bias_col:
    (Vp, 1) fp32. See quantize_head_inputs/quantize_head_weights.
    """
    B, D, L = feats_q_t.shape
    Vp = w_q.shape[0]
    assert Vp % tile_v == 0 and Vp >= vocab_size, (Vp, tile_v)
    if tile_l is None:
        t = min(128, L)
        while t > 1 and L % t:
            t //= 2
        tile_l = max(t, 1)
    assert L % tile_l == 0, (L, tile_l)
    n_l = L // tile_l
    n_v = Vp // tile_v
    grid = (n_v, B, n_l)
    xt4 = xt.reshape(B, n_l, 1, tile_l)
    xs4 = x_scale.astype(jnp.float32).reshape(B, n_l, 1, tile_l)
    kernel = functools.partial(
        _head_kernel, vocab_size=vocab_size, mask_index=mask_index,
        n_v=n_v, tile_v=tile_v, n_l=n_l,
        external_gumbel=gumbel_t is not None, quantized=True)
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec((1, 1, 1, tile_l), lambda v, b, i: (b, i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec((1, D, tile_l), lambda v, b, i: (b, 0, i),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((tile_v, D), lambda v, b, i: (v, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((tile_v, 1), lambda v, b, i: (v, 0),
                     memory_space=pltpu.VMEM),
        # w_scale, x_scale (the quantized=True extra refs, in order)
        pl.BlockSpec((tile_v, 1), lambda v, b, i: (v, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, 1, tile_l), lambda v, b, i: (b, i, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    args = [jnp.asarray([seed], jnp.int32), xt4,
            move_chance_t.astype(jnp.float32),
            move_chance_s.astype(jnp.float32), feats_q_t, w_q,
            bias_col.astype(jnp.float32),
            w_scale.astype(jnp.float32), xs4]
    if gumbel_t is not None:
        in_specs.append(pl.BlockSpec(
            (1, tile_v, tile_l), lambda v, b, i: (b, v, i),
            memory_space=pltpu.VMEM))
        args.append(gumbel_t)
    cells = B * n_l
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, 1, 1, tile_l),
                               lambda v, b, i: (b, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, n_l, 1, tile_l), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((cells, 1, tile_l), jnp.float32),   # m
            pltpu.VMEM((cells, 1, tile_l), jnp.float32),   # s
            pltpu.VMEM((cells, 1, tile_l), jnp.float32),   # best
            pltpu.VMEM((cells, 1, tile_l), jnp.int32),     # best idx
            pltpu.VMEM((cells, 1, tile_l), jnp.float32),   # mask gumbel
        ],
        interpret=interpret,
    )(*args)
    return out.reshape(B, L)


def quantize_head_weights(kernel, bias, tile_v: int = 2048):
    """One-time prep for fused_absorbing_head_sample_int8: symmetric
    absmax int8 per output channel (same scheme/rounding as
    ops/quant.quantize_colwise), transposed to (Vp, D) and zero-padded
    to a tile_v multiple. Loop-invariant — call outside the sampling
    scan (XLA hoists it when traced inside)."""
    from ddg_tpu.ops.quant import quantize_colwise
    D, V = kernel.shape
    q, scale = quantize_colwise(kernel)         # (D, V) s8, (V,) f32
    Vp = ((V + tile_v - 1) // tile_v) * tile_v
    w_q = jnp.pad(q.T, ((0, Vp - V), (0, 0)))
    w_scale = jnp.pad(scale, (0, Vp - V))[:, None]
    bias_col = jnp.pad(bias.astype(jnp.float32), (0, Vp - V))[:, None]
    return w_q, w_scale, bias_col


def quantize_head_inputs(feats):
    """Per-token int8 head features for the int8 fused head kernel:
    (B, L, D) fp32/bf16 -> ((B, D, L) int8, (B, 1, L) fp32 scales),
    the quantize_rowwise scheme transposed to the kernel layout."""
    from ddg_tpu.ops.quant import quantize_rowwise
    q, scale = quantize_rowwise(feats)          # (B, L, D), (B, L, 1)
    return jnp.swapaxes(q, 1, 2), jnp.swapaxes(scale, 1, 2)


def pad_head_weights(kernel, bias, tile_v: int = 2048):
    """One-time prep for fused_absorbing_head_sample: transpose the
    (D, V) output kernel to (Vp, D) and pad V up to a tile_v multiple
    (V is rarely 128-aligned — LM1B's 30523 — and the pad rows are
    masked in-kernel). Call OUTSIDE the sampling scan; the result is
    loop-invariant."""
    D, V = kernel.shape
    Vp = ((V + tile_v - 1) // tile_v) * tile_v
    w_t = jnp.pad(kernel.T, ((0, Vp - V), (0, 0)))
    bias_col = jnp.pad(bias.astype(jnp.float32), (0, Vp - V))[:, None]
    return w_t, bias_col
