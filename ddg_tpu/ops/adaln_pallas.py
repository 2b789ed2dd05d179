"""Fused adaLN chain Pallas kernels for the DiT block.

The reference fuses its elementwise block glue with torch.jit
(bias_dropout_add_scale / modulate_fused,
/root/reference/models/dit.py:53-79,124-128). On TPU the equivalent
hot chains are

    ln_modulate:          h = LN(x) * w * (1 + scale) + shift
    gate_res_ln_modulate: x' = skip + gate * y
                          h  = LN(x') * w * (1 + scale) + shift

(the attention -> MLP boundary of every DDiTBlock runs the second
form; the block entry runs the first). XLA executes these as separate
reduction + elementwise passes over the (B, L, D) stream; here each
chain is ONE Pallas kernel — one HBM read of the stream per direction
— with a custom VJP whose backward is also a single kernel (LN
statistics recomputed from the saved residual-stream tensor, all
conditioning gradients (dgate/dshift/dscale/dw) accumulated in-kernel
over the innermost grid dimension).

Math matches models.dit.AdaLNLayerNorm (one-pass E[x^2]-E[x]^2
moments, fp32, eps=1e-5, scale-only weight) + models.dit.modulate.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_EPS = 1e-5


def _row_tile(L):
    for r in (512, 256, 128):
        if L % r == 0:
            return r
    return L


def _ln_stats(x32):
    """One-pass LN stats over the last dim of (R, D) fp32 rows."""
    d = x32.shape[-1]
    m1 = jnp.sum(x32, axis=-1, keepdims=True) / d
    m2 = jnp.sum(x32 * x32, axis=-1, keepdims=True) / d
    var = jnp.maximum(m2 - m1 * m1, 0.0)
    r = jax.lax.rsqrt(var + _EPS)
    return (x32 - m1) * r, r


def _mod_fwd(x32, w_ref, shift_ref, scale_ref, h_ref):
    xn, _ = _ln_stats(x32)
    w32 = w_ref[...].astype(jnp.float32)
    sc = scale_ref[0].astype(jnp.float32)
    sh = shift_ref[0].astype(jnp.float32)
    h_ref[0] = (xn * (w32 * (1.0 + sc)) + sh).astype(h_ref.dtype)


def _mod_bwd(x32, dh, w_ref, scale_ref, dw_ref, dshift_ref,
             dscale_ref, *, init_perb, init_w):
    """Shared backward of h = LN(x)*w*(1+sc)+sh: accumulates the
    conditioning grads and returns dx_ln (fp32 rows)."""
    @pl.when(init_perb)
    def _():
        dshift_ref[0] = jnp.zeros_like(dshift_ref[0])
        dscale_ref[0] = jnp.zeros_like(dscale_ref[0])

    @pl.when(init_w)
    def _():
        dw_ref[...] = jnp.zeros_like(dw_ref[...])

    w32 = w_ref[...].astype(jnp.float32)
    sc = scale_ref[0].astype(jnp.float32)
    d = x32.shape[-1]
    xn, r = _ln_stats(x32)
    dshift_ref[0] += jnp.sum(dh, axis=0, keepdims=True)
    s_dhxn = jnp.sum(dh * xn, axis=0, keepdims=True)
    dscale_ref[0] += s_dhxn * w32
    dw_ref[...] += s_dhxn * (1.0 + sc)
    dxn = dh * (w32 * (1.0 + sc))
    md = jnp.sum(dxn, axis=-1, keepdims=True) / d
    mdx = jnp.sum(dxn * xn, axis=-1, keepdims=True) / d
    return r * (dxn - md - xn * mdx)


# ----------------------------------------------------------------
# Variant 1: h = LN(x)*w*(1+scale)+shift (block entry, norm1).
# ----------------------------------------------------------------

def _lm_fwd_kernel(x_ref, w_ref, shift_ref, scale_ref, h_ref):
    _mod_fwd(x_ref[0].astype(jnp.float32), w_ref, shift_ref,
             scale_ref, h_ref)


def _lm_bwd_kernel(x_ref, w_ref, scale_ref, dh_ref, dx_ref, dw_ref,
                   dshift_ref, dscale_ref):
    k = pl.program_id(1)
    dx_ln = _mod_bwd(
        x_ref[0].astype(jnp.float32), dh_ref[0].astype(jnp.float32),
        w_ref, scale_ref, dw_ref, dshift_ref, dscale_ref,
        init_perb=(k == 0), init_w=(k == 0) & (pl.program_id(0) == 0))
    dx_ref[0] = dx_ln.astype(dx_ref.dtype)


def _specs(R, D):
    row = pl.BlockSpec((1, R, D), lambda b, k: (b, k, 0),
                       memory_space=pltpu.VMEM)
    # Per-batch conditioning rides as (B, 1, D) with (1, 1, D) blocks:
    # Mosaic requires the last two block dims divisible by (8, 128) or
    # equal to the array dims — a (1, D) block over (B, D) is illegal
    # on the real chip (interpret mode does not enforce this).
    per_b = pl.BlockSpec((1, 1, D), lambda b, k: (b, 0, 0),
                         memory_space=pltpu.VMEM)
    w = pl.BlockSpec((1, D), lambda b, k: (0, 0),
                     memory_space=pltpu.VMEM)
    return row, per_b, w


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _ln_mod(x, w, shift, scale, interpret):
    out, _ = _ln_mod_fwd(x, w, shift, scale, interpret)
    return out


def _ln_mod_fwd(x, w, shift, scale, interpret):
    B, L, D = x.shape
    R = _row_tile(L)
    row, per_b, wspec = _specs(R, D)
    h = pl.pallas_call(
        _lm_fwd_kernel,
        grid=(B, L // R),
        in_specs=[row, wspec, per_b, per_b],
        out_specs=row,
        out_shape=jax.ShapeDtypeStruct((B, L, D), x.dtype),
        interpret=interpret,
    )(x, w.reshape(1, D), shift.reshape(B, 1, D),
      scale.reshape(B, 1, D))
    return h, (x, w, shift, scale)


def _ln_mod_bwd(interpret, res, dh):
    x, w, shift, scale = res
    B, L, D = x.shape
    R = _row_tile(L)
    row, per_b, wspec = _specs(R, D)
    dx, dw, dshift, dscale = pl.pallas_call(
        _lm_bwd_kernel,
        grid=(B, L // R),
        in_specs=[row, wspec, per_b, row],
        out_specs=(row, wspec, per_b, per_b),
        out_shape=(jax.ShapeDtypeStruct((B, L, D), x.dtype),
                   jax.ShapeDtypeStruct((1, D), jnp.float32),
                   jax.ShapeDtypeStruct((B, 1, D), jnp.float32),
                   jax.ShapeDtypeStruct((B, 1, D), jnp.float32)),
        interpret=interpret,
    )(x, w.reshape(1, D), scale.reshape(B, 1, D), dh)
    return (dx,
            dw.astype(w.dtype).reshape(w.shape),
            dshift.astype(shift.dtype).reshape(shift.shape),
            dscale.astype(scale.dtype).reshape(scale.shape))


_ln_mod.defvjp(_ln_mod_fwd, _ln_mod_bwd)


# ----------------------------------------------------------------
# Variant 2: x' = skip + gate*y; h = LN(x')*w*(1+scale)+shift
# (attention -> MLP boundary).
# ----------------------------------------------------------------

def _gr_fwd_kernel(y_ref, skip_ref, gate_ref, w_ref, shift_ref,
                   scale_ref, x_ref, h_ref):
    y32 = y_ref[0].astype(jnp.float32)
    g32 = gate_ref[0].astype(jnp.float32)
    x32 = skip_ref[0].astype(jnp.float32) + g32 * y32
    x_ref[0] = x32.astype(x_ref.dtype)
    _mod_fwd(x32, w_ref, shift_ref, scale_ref, h_ref)


def _gr_bwd_kernel(x_ref, y_ref, gate_ref, w_ref, scale_ref, dx_ref,
                   dh_ref, dy_ref, dskip_ref, dgate_ref, dw_ref,
                   dshift_ref, dscale_ref):
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _():
        dgate_ref[0] = jnp.zeros_like(dgate_ref[0])

    x32 = x_ref[0].astype(jnp.float32)
    dx_ln = _mod_bwd(
        x32, dh_ref[0].astype(jnp.float32), w_ref, scale_ref, dw_ref,
        dshift_ref, dscale_ref, init_perb=(k == 0),
        init_w=(k == 0) & (pl.program_id(0) == 0))
    dx_tot = dx_ref[0].astype(jnp.float32) + dx_ln
    y32 = y_ref[0].astype(jnp.float32)
    g32 = gate_ref[0].astype(jnp.float32)
    dgate_ref[0] += jnp.sum(dx_tot * y32, axis=0, keepdims=True)
    dy_ref[0] = (dx_tot * g32).astype(dy_ref.dtype)
    dskip_ref[0] = dx_tot.astype(dskip_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6,))
def _gate_res(y, skip, gate, w, shift, scale, interpret):
    out, _ = _gate_res_fwd(y, skip, gate, w, shift, scale, interpret)
    return out


def _gate_res_fwd(y, skip, gate, w, shift, scale, interpret):
    B, L, D = y.shape
    R = _row_tile(L)
    row, per_b, wspec = _specs(R, D)
    x_new, h = pl.pallas_call(
        _gr_fwd_kernel,
        grid=(B, L // R),
        in_specs=[row, row, per_b, wspec, per_b, per_b],
        out_specs=(row, row),
        out_shape=(jax.ShapeDtypeStruct((B, L, D), y.dtype),
                   jax.ShapeDtypeStruct((B, L, D), y.dtype)),
        interpret=interpret,
    )(y, skip, gate.reshape(B, 1, D), w.reshape(1, D),
      shift.reshape(B, 1, D), scale.reshape(B, 1, D))
    return (x_new, h), (x_new, y, gate, w, shift, scale)


def _gate_res_bwd(interpret, res, g):
    x_new, y, gate, w, shift, scale = res
    dx, dh = g
    B, L, D = x_new.shape
    R = _row_tile(L)
    row, per_b, wspec = _specs(R, D)
    outs = pl.pallas_call(
        _gr_bwd_kernel,
        grid=(B, L // R),
        in_specs=[row, row, per_b, wspec, per_b, row, row],
        out_specs=(row, row, per_b, wspec, per_b, per_b),
        out_shape=(jax.ShapeDtypeStruct((B, L, D), y.dtype),
                   jax.ShapeDtypeStruct((B, L, D), y.dtype),
                   jax.ShapeDtypeStruct((B, 1, D), jnp.float32),
                   jax.ShapeDtypeStruct((1, D), jnp.float32),
                   jax.ShapeDtypeStruct((B, 1, D), jnp.float32),
                   jax.ShapeDtypeStruct((B, 1, D), jnp.float32)),
        interpret=interpret,
    )(x_new, y, gate.reshape(B, 1, D), w.reshape(1, D),
      scale.reshape(B, 1, D), dx, dh)
    dy, dskip, dgate, dw, dshift, dscale = outs
    return (dy, dskip,
            dgate.astype(gate.dtype).reshape(gate.shape),
            dw.astype(w.dtype).reshape(w.shape),
            dshift.astype(shift.dtype).reshape(shift.shape),
            dscale.astype(scale.dtype).reshape(scale.shape))


_gate_res.defvjp(_gate_res_fwd, _gate_res_bwd)


def ln_modulate(x, w, shift, scale, *, interpret=False):
    """h = LN(x) * w * (1 + scale[:, None]) + shift[:, None] as one
    kernel. x: (B, L, D); w: (D,); shift/scale: (B, D)."""
    return _ln_mod(x, w, shift, scale, interpret)


def gate_res_ln_modulate(y, skip, gate, w, shift, scale, *,
                         interpret=False):
    """x' = skip + gate[:, None] * y; h = LN(x') * w *
    (1 + scale[:, None]) + shift[:, None]; returns (x', h) from one
    kernel. y/skip: (B, L, D); gate/shift/scale: (B, D); w: (D,)."""
    return _gate_res(y, skip, gate, w, shift, scale, interpret)
