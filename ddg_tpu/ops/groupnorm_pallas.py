"""One-pass fused GroupNorm(+SiLU) Pallas kernel for the UNet trunk.

Parity target: the reference UNet normalizes with torch GroupNorm
before every conv / attention stage (reference models/unet.py:88-182);
the flax equivalent (nn.GroupNorm) is what ddg_tpu/models/unet.py
shipped through round 4. XLA executes GroupNorm as a reduction pass
(stats) plus an elementwise pass (normalize -> silu), which reads the
(B, H, W, C) activation stream from HBM twice. The CIFAR sampling
forward is bandwidth-bound (DESIGN.md round-4 0b), so this kernel
computes stats AND applies normalize(+silu) in ONE pass over the
stream: each grid step holds one sample's (H, W, C) slab in VMEM,
reduces it, and writes the normalized output directly in the
requested output dtype.

Group reductions ride the MXU instead of lane-segmented reshapes
(Mosaic only supports layout-preserving reshapes): per-channel sums
are contracted with a (C, G) one-hot segment matrix built from
broadcasted_iota, and the per-group stats broadcast back through its
transpose. G <= C <= a few hundred at UNet shapes, so these matmuls
are noise next to the stream traffic.

Inference-only by design (no custom VJP): the UNet sampling loop is
the consumer; training keeps the flax path (same numerics, autodiff
for free).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _gn_kernel(x_ref, scale_ref, bias_ref, out_ref, *, num_groups,
               eps, act):
    H, W, C = x_ref.shape[1:]
    gs = C // num_groups
    x32 = x_ref[0].reshape(H * W, C).astype(jnp.float32)

    # (C, G) one-hot segment matrix: channel c belongs to group c//gs.
    cg = jax.lax.broadcasted_iota(jnp.int32, (C, num_groups), 0) // gs
    gg = jax.lax.broadcasted_iota(jnp.int32, (C, num_groups), 1)
    seg = (cg == gg).astype(jnp.float32)

    s1_c = jnp.sum(x32, axis=0, keepdims=True)            # (1, C)
    s2_c = jnp.sum(x32 * x32, axis=0, keepdims=True)      # (1, C)
    n = jnp.float32(H * W * gs)
    s1_g = jnp.dot(s1_c, seg, preferred_element_type=jnp.float32)
    s2_g = jnp.dot(s2_c, seg, preferred_element_type=jnp.float32)
    mean_g = s1_g / n
    var_g = jnp.maximum(s2_g / n - mean_g * mean_g, 0.0)
    rinv_g = jax.lax.rsqrt(var_g + eps)

    segT = seg.T                                          # (G, C)
    mean_c = jnp.dot(mean_g, segT,
                     preferred_element_type=jnp.float32)  # (1, C)
    rinv_c = jnp.dot(rinv_g, segT,
                     preferred_element_type=jnp.float32)  # (1, C)

    sc = scale_ref[...].astype(jnp.float32)               # (1, C)
    b = bias_ref[...].astype(jnp.float32)                 # (1, C)
    y = (x32 - mean_c) * (rinv_c * sc) + b
    if act:
        y = y * jax.nn.sigmoid(y)                         # silu
    out_ref[0] = y.astype(out_ref.dtype).reshape(H, W, C)


@functools.partial(jax.jit, static_argnames=('num_groups', 'eps',
                                             'act', 'out_dtype',
                                             'interpret'))
def fused_group_norm_act(x, scale, bias, *, num_groups: int,
                         eps: float = 1e-6, act: bool = False,
                         out_dtype=None, interpret: bool = False):
    """GroupNorm (flax nn.GroupNorm semantics: fp32 stats over
    spatial dims + channels within each group) optionally fused with
    SiLU, one HBM pass.

    x: (B, H, W, C); scale/bias: (C,). Returns (B, H, W, C) in
    out_dtype (default: x.dtype).
    """
    B, H, W, C = x.shape
    assert C % num_groups == 0, (C, num_groups)
    out_dtype = out_dtype or x.dtype
    kernel = functools.partial(_gn_kernel, num_groups=num_groups,
                               eps=eps, act=act)
    return pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, H, W, C), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, H, W, C), lambda b: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, W, C), out_dtype),
        interpret=interpret,
    )(x, scale.reshape(1, C), bias.reshape(1, C))
