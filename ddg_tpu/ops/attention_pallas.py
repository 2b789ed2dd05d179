"""Pallas TPU attention for short sequences (the DiT workloads:
L=128 LM1B, L=256 text8 — reference models/dit.py:304-307 calls cuDNN
F.scaled_dot_product_attention).

At these lengths a head's whole (L, L) score matrix fits in VMEM, so
one kernel fuses QK^T -> softmax -> PV and the (B, H, L, L)
probability tensor never exists in HBM. The kernel blocks on the
model's native token-major layout flattened to (B, L, H*D) — one
batch row per grid cell, heads as static lane slices — because an
explicit transpose to a heads-major layout costs more HBM traffic
than the fusion saves (measured: a transposing variant LOST 12%
end-to-end), and Mosaic only supports layout-preserving reshapes
(leading-unit/trailing collapses; no interior unit dims).

Differentiable via custom VJP: the backward recomputes the probs in
plain jnp from the saved q/k/v (flash-style recompute; the backward
only matters in training, where it matches what the unfused path
costs today).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -1e30


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float,
                 causal: bool, n_heads: int, head_dim: int):
    L = q_ref.shape[1]
    D = head_dim
    q = q_ref[0]                                         # (L, H*D)
    k = k_ref[0]
    v = v_ref[0]
    if causal:
        row = jax.lax.broadcasted_iota(jnp.int32, (L, L), 0)
        col = jax.lax.broadcasted_iota(jnp.int32, (L, L), 1)
        keep = col <= row
    outs = []
    for h in range(n_heads):
        qh = jax.lax.slice(q, (0, h * D), (L, (h + 1) * D))
        kh = jax.lax.slice(k, (0, h * D), (L, (h + 1) * D))
        vh = jax.lax.slice(v, (0, h * D), (L, (h + 1) * D))
        s = jax.lax.dot_general(
            qh, kh, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale  # (L, L)
        if causal:
            s = jnp.where(keep, s, NEG)
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        outs.append(jax.lax.dot_general(
            p.astype(vh.dtype), vh, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32))         # (L, D)
    o_ref[0] = jnp.concatenate(outs, axis=-1).astype(o_ref.dtype)


def _reference(qkv, scale, causal):
    """Plain jnp attention on (B, L, H, D) — the backward path and the
    CPU fallback. Matches jax.nn.dot_product_attention semantics."""
    q, k, v = qkv
    s = jnp.einsum('bqhd,bkhd->bhqk', q.astype(jnp.float32),
                   k.astype(jnp.float32)) * scale
    if causal:
        Lq = s.shape[-1]
        mask = jnp.tril(jnp.ones((Lq, Lq), bool))
        s = jnp.where(mask[None, None], s, NEG)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum('bhqk,bkhd->bqhd', p.astype(v.dtype), v).astype(
        v.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def _flash(q, k, v, scale, causal, head_dim, interpret):
    # q, k, v: (B, L, H*D) — token-major, heads flattened into lanes.
    B, L, HD = q.shape
    H = HD // head_dim
    spec = pl.BlockSpec((1, L, HD), lambda b: (b, 0, 0),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_attn_kernel, scale=scale, causal=causal,
                          n_heads=H, head_dim=head_dim),
        grid=(B,),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((B, L, HD), q.dtype),
        interpret=interpret,
    )(q, k, v)


def _flash_fwd(q, k, v, scale, causal, head_dim, interpret):
    return _flash(q, k, v, scale, causal, head_dim, interpret), \
        (q, k, v)


def _flash_bwd(scale, causal, head_dim, interpret, res, g):
    q, k, v = res
    B, L, HD = q.shape
    H = HD // head_dim

    def ref(q, k, v):
        un = lambda x: x.reshape(B, L, H, head_dim)  # noqa: E731
        return _reference((un(q), un(k), un(v)), scale,
                          causal).reshape(B, L, HD)

    _, vjp = jax.vjp(ref, q, k, v)
    return vjp(g.astype(v.dtype))


_flash.defvjp(_flash_fwd, _flash_bwd)


def short_seq_attention(q, k, v, *, causal: bool = False,
                        interpret: bool = False):
    """Drop-in for jax.nn.dot_product_attention at short L.

    q, k, v: (B, L, H, D). Returns (B, L, H, D) in the input dtype.
    Whole-row blocking: needs ~(3*L*H*D*2 + L*L*4) bytes of VMEM per
    grid cell. Falls back to plain jnp off-TPU unless `interpret`
    (the CPU test path).
    """
    B, L, H, D = q.shape
    scale = 1.0 / (D ** 0.5)
    if not interpret and jax.default_backend() != 'tpu':
        return _reference((q, k, v), scale, causal)
    flat = lambda x: x.reshape(B, L, H * D)  # noqa: E731
    o = _flash(flat(q), flat(k), flat(v), scale, causal, D, interpret)
    return o.reshape(B, L, H, D)


# ---------------------------------------------------------------------------
# Fused RoPE + attention: the rotary rotation of q/k runs INSIDE the
# kernel (rotate_half = one 32-lane circular roll within each 64-lane
# head slice, sign folded into a [-sin, sin] table), so the fp32
# rotated q/k never round-trip HBM. TPU counterpart of the reference's
# flash-attn apply_rotary_emb_qkv_ CUDA kernel + SDPA pair
# (reference models/dit.py:116-121, 304-307).
# ---------------------------------------------------------------------------


def _rope_attn_kernel(q_ref, k_ref, v_ref, cos_ref, sgnsin_ref, o_ref,
                      *, scale: float, causal: bool, n_heads: int,
                      head_dim: int):
    L = q_ref.shape[1]
    D = head_dim
    q = q_ref[0]                                         # (L, H*D)
    k = k_ref[0]
    v = v_ref[0]
    cos = cos_ref[...].astype(jnp.float32)               # (L, D)
    sgnsin = sgnsin_ref[...].astype(jnp.float32)
    if causal:
        row = jax.lax.broadcasted_iota(jnp.int32, (L, L), 0)
        col = jax.lax.broadcasted_iota(jnp.int32, (L, L), 1)
        keep = col <= row

    def rot(xh):
        # interleaved-half RoPE on one (L, D) head: rotate_half via a
        # D/2-lane circular roll (+D/2 == -D/2 mod D), fp32 math as in
        # models/dit.py::apply_rope, cast back for the MXU dot. The
        # roll runs on the fp32 copy (Mosaic has no sub-32-bit
        # rotate).
        x32 = xh.astype(jnp.float32)
        half = pltpu.roll(x32, D // 2, 1)
        return (x32 * cos + half * sgnsin).astype(xh.dtype)

    outs = []
    for h in range(n_heads):
        qh = rot(jax.lax.slice(q, (0, h * D), (L, (h + 1) * D)))
        kh = rot(jax.lax.slice(k, (0, h * D), (L, (h + 1) * D)))
        vh = jax.lax.slice(v, (0, h * D), (L, (h + 1) * D))
        s = jax.lax.dot_general(
            qh, kh, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale  # (L, L)
        if causal:
            s = jnp.where(keep, s, NEG)
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        outs.append(jax.lax.dot_general(
            p.astype(vh.dtype), vh, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32))         # (L, D)
    o_ref[0] = jnp.concatenate(outs, axis=-1).astype(o_ref.dtype)


def _rope_reference(q, k, v, cos, sin, scale, causal):
    """Plain jnp rope+attention on (B, L, H, D) — backward path and
    CPU fallback. Bit-matches models/dit.py::apply_rope + sdpa."""
    d2 = q.shape[-1] // 2
    c = cos[None, :, None, :]
    s = sin[None, :, None, :]

    def rope(x):
        x1 = x[..., :d2].astype(jnp.float32)
        x2 = x[..., d2:].astype(jnp.float32)
        return jnp.concatenate(
            [x1 * c - x2 * s, x2 * c + x1 * s], -1).astype(x.dtype)

    return _reference((rope(q), rope(k), v), scale, causal)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8))
def _rope_flash(q, k, v, cos, sgnsin, scale, causal, head_dim,
                interpret):
    B, L, HD = q.shape
    H = HD // head_dim
    spec = pl.BlockSpec((1, L, HD), lambda b: (b, 0, 0),
                        memory_space=pltpu.VMEM)
    tspec = pl.BlockSpec((L, head_dim), lambda b: (0, 0),
                         memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_rope_attn_kernel, scale=scale,
                          causal=causal, n_heads=H,
                          head_dim=head_dim),
        grid=(B,),
        in_specs=[spec, spec, spec, tspec, tspec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((B, L, HD), q.dtype),
        interpret=interpret,
    )(q, k, v, cos, sgnsin)


def _rope_flash_fwd(q, k, v, cos, sgnsin, scale, causal, head_dim,
                    interpret):
    return (_rope_flash(q, k, v, cos, sgnsin, scale, causal, head_dim,
                        interpret), (q, k, v, cos, sgnsin))


def _rope_flash_bwd(scale, causal, head_dim, interpret, res, g):
    q, k, v, cos, sgnsin = res
    B, L, HD = q.shape
    H = HD // head_dim
    d2 = head_dim // 2
    sin = jax.lax.slice(sgnsin, (0, d2), (L, head_dim))
    cos_h = jax.lax.slice(cos, (0, 0), (L, d2))

    def ref(q, k, v):
        un = lambda x: x.reshape(B, L, H, head_dim)  # noqa: E731
        return _rope_reference(un(q), un(k), un(v), cos_h, sin, scale,
                               causal).reshape(B, L, HD)

    _, vjp = jax.vjp(ref, q, k, v)
    dq, dk, dv = vjp(g.astype(v.dtype))
    return dq, dk, dv, None, None


_rope_flash.defvjp(_rope_flash_fwd, _rope_flash_bwd)


def fused_rope_attention(q, k, v, cos, sin, *, causal: bool = False,
                         interpret: bool = False):
    """RoPE(q), RoPE(k) and softmax attention in one Pallas kernel.

    q, k, v: (B, L, H, D); cos, sin: (L, D/2) position tables (the
    model's Rotary cache). Returns (B, L, H, D). Requires H*D % 128
    == 0 and even D on the TPU path; anything else (and CPU) falls
    back to the jnp composition, which this kernel bit-matches up to
    one extra bf16 rounding of the rotated q/k.
    """
    B, L, H, D = q.shape
    scale = 1.0 / (D ** 0.5)
    on_tpu = interpret or jax.default_backend() == 'tpu'
    if not on_tpu or (H * D) % 128 or D % 2:
        return _rope_reference(q, k, v, cos, sin, scale, causal)
    cos2 = jnp.concatenate([cos, cos], -1)               # (L, D)
    sgnsin = jnp.concatenate([-sin, sin], -1)
    flat = lambda x: x.reshape(B, L, H * D)  # noqa: E731
    o = _rope_flash(flat(q), flat(k), flat(v), cos2, sgnsin, scale,
                    causal, D, interpret)
    return o.reshape(B, L, H, D)
