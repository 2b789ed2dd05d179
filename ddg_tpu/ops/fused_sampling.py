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
                           tile_l: int = 16, interpret=False,
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
                               mask_index: int, tile_l: int = 16,
                               interpret=False, gumbel=None):
    """CFG variant: fused gamma-interpolation + softmax + posterior +
    Gumbel-argmax + copy-over (diffusion.py:1475-1480). Single-LSE
    mixture math (see _cfg_kernel); logits may be bf16."""
    B, L, V = logits_cond.shape
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
