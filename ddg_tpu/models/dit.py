"""Diffusion Transformer (DiT) denoiser + classifier, flax.linen.

TPU-first re-design of the reference DiT (/root/reference/models/dit.py):
  * RoPE applied as an einsum-style rotation fused by XLA (the reference
    calls flash-attn's CUDA `apply_rotary_emb_qkv_`, dit.py:116-121);
  * attention via `jax.nn.dot_product_attention` (maps to the XLA/TPU
    fused attention; the reference uses torch SDPA, dit.py:304-307);
  * adaLN-zero modulation (6 params/block) with zero-init modulation
    projections, matching dit.py:249-254;
  * timestep sinusoidal embedder + MLP (dit.py:155-199), label embedder
    with a null class for CFG (dit.py:202-213, 387-395);
  * bf16 trunk / fp32 logits dtype policy instead of the reference's
    per-layer fp16/bf16 autocast (dit.py:454-464) — on TPU the MXU is
    bf16-native and fp32 accumulation is the default.

The module is pure: parameters are a pytree, dropout/noise flows through
explicit rngs, and `return_hidden_states` exposes the final trunk state
for NOS guidance (dit.py:426-467).
"""

from __future__ import annotations

import dataclasses
import functools
import math
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class DITConfig:
    hidden_size: int = 768
    cond_dim: int = 128
    length: int = 1024
    n_blocks: int = 12
    n_heads: int = 12
    dropout: float = 0.1
    vocab_size: int = 258
    causal: bool = False          # True iff parameterization == 'ar'
    use_adaLN: bool = True        # False only for pure AR without cond
    num_classes: Optional[int] = None  # +1 null class added internally
    compute_dtype: jnp.dtype = jnp.bfloat16
    # Head matmul dtype. float32 is the parity default; bfloat16 runs
    # the (hidden x vocab) projection at full MXU rate and halves the
    # logits HBM traffic — sampling-quality impact is one bf16 rounding
    # of the logits.
    logits_dtype: jnp.dtype = jnp.float32
    # Fused short-sequence Pallas attention (ops/attention_pallas.py).
    # Measured SLOWER than XLA's attention at the DiT shapes (L<=256,
    # D=64: both a heads-major-transpose variant and a token-major
    # lane-sliced variant lost 10-18% end-to-end — the transposes /
    # serialized per-head matmuls cost more than skipping the HBM
    # probs tensor saves), so 'auto' resolves to OFF; True opts in.
    pallas_attention: 'str | bool' = 'auto'
    # Fused RoPE + attention Pallas kernel (rotate_half runs in VMEM
    # via a D/2-lane roll; the fp32 rotated q/k never round-trip HBM)
    # — the TPU counterpart of the reference's apply_rotary_emb_qkv_ +
    # SDPA CUDA pair (models/dit.py:116-121, 304-307). Measured
    # SLOWER in-model at the text8 train shape (B=256, L=256: infer
    # 168 vs 153 ms, fwd+bwd 480 vs 462 ms) — XLA fuses the rope into
    # neighboring elementwise passes, and the kernel's serialized
    # per-head (256x64x256) dots underuse the MXU — so 'auto'
    # resolves to OFF; True opts in (values bit-match either way).
    fused_rope_attn: 'str | bool' = 'auto'
    # In-tree production Pallas TPU flash attention
    # (jax.experimental.pallas.ops.tpu.flash_attention): online-softmax
    # fwd+bwd kernels that never write the (B, H, L, L) probs tensor to
    # HBM — the TPU counterpart of the reference's
    # F.scaled_dot_product_attention flash path (models/dit.py:304-307).
    # Requires a real TPU (no interpret mode) and L a multiple of the
    # 128 block; 'auto' resolves OFF (XLA wins at DiT's short L —
    # measured on v5e at B=256 L=256 H=12 D=64, see
    # scripts/bench_attention_flash.py); True opts in for long-L runs.
    tpu_flash_attn: 'str | bool' = 'auto'
    # Hand-rolled einsum attention with bf16 (B, H, L, L) probs across
    # the two matmul boundaries (softmax statistics fp32). On-chip A/B
    # at B=256 L=256 H=12 D=64 (scripts/bench_attention_flash.py)
    # found XLA's dot_product_attention ALREADY keeps the probs in
    # bf16 — this path is grad-bit-identical to it and lands within
    # ±1.5% (fwd 6.30 vs 6.21 ms, fwd+bwd 12.19 vs 12.31 ms); every
    # variant tried (einsum fp32/bf16, library flash block_b 1/8)
    # plateaus at ~6.2/12.3 ms, so attention at DiT shapes sits at
    # XLA's floor. Kept because it is pure-XLA and composes with
    # attn_remat below. 'auto' resolves OFF (throughput-neutral).
    attn_probs_bf16: 'str | bool' = 'auto'
    # Rematerialize attention in the backward pass (jax.checkpoint
    # over the scores->softmax->PV region): the residual probs
    # (~400 MB bf16 x 12 blocks at B=256 L=256) are never stored —
    # the flash-attention memory trade in plain XLA, costing one extra
    # QK^T recompute (+0.46 ms/block fwd+bwd measured, ~1% of the
    # step). Use to fit bigger per-chip batches (B=512 single-shot
    # OOMs at 20.5G vs 15.75G HBM without it). 'auto' resolves OFF.
    attn_remat: 'str | bool' = 'auto'
    # Megatron-style tensor parallelism (beyond the reference): name of
    # the mesh axis to shard attention heads + MLP hidden over. When
    # set, blocks emit with_sharding_constraint hints (bare
    # PartitionSpec — the jit call must run under a `with mesh:`
    # context, which parallel.mesh.shard_train_step provides) and
    # parallel.mesh.TENSOR_PARAM_RULES shard the matching kernels; XLA
    # inserts the per-block psum pair. Uses XLA attention (the Pallas
    # kernels are opaque custom calls GSPMD cannot partition).
    tensor_axis: Optional[str] = None
    # What the 'tensor' axis splits: 'heads' (Megatron TP — attention
    # heads + MLP hidden sharded, params split by
    # parallel.mesh.TENSOR_PARAM_RULES, psum pair per block),
    # 'sequence' (context parallel — activations sharded over L,
    # params replicated/fsdp; XLA all-gathers K/V for attention so
    # each device computes its L-shard of outputs; use for long-L
    # workloads where activations, not params, are the HBM bound), or
    # 'ring' (like 'sequence' but K/V stay sharded and circulate the
    # ring via ppermute with online-softmax accumulation,
    # ops/ring_attention.py — O(L/n) memory instead of the 'sequence'
    # mode's all-gathered O(L) K/V; requires jax.set_mesh, which
    # parallel.mesh.shard_train_step provides).
    tp_mode: str = 'heads'
    # Mesh axis carrying the batch shard, used only in the tensor-
    # parallel activation constraints so they don't wipe data sharding.
    batch_axis: str = 'data'
    # Fused adaLN elementwise chains (ops/adaln_pallas.py): the block
    # entry LN+modulate and the attention->MLP boundary
    # gate*attn + residual -> LN + modulate each run as ONE Pallas
    # kernel with a single-kernel custom VJP (conditioning grads
    # accumulate in-kernel) — the TPU counterpart of the reference's
    # torch.jit bias_dropout_add_scale/modulate_fused pair
    # (models/dit.py:53-79,124-128). Round-4 on-chip A/B at the text8
    # train shape (B=256, L=256): NEUTRAL at accum=2 (157.9 vs
    # 157.7K tok/s) and HBM-OOM single-shot at B=256 — the custom-VJP
    # residuals pin full (B,L,D) streams and the custom-call layout
    # constraints force copies that XLA's own fusion avoids. 'auto'
    # therefore resolves OFF; True opts in; 'interpret' runs the
    # kernels in Pallas interpret mode (CPU tests). Requires adaLN
    # conditioning and L % 128 == 0; disabled under tensor parallelism
    # (opaque custom calls, like the other Pallas paths).
    fused_adaln: 'str | bool' = 'auto'
    # Opt-in int8 dynamic-quant inference (ops/quant.py): the trunk
    # denses (qkv/out/mlp) and the vocab head run s8 x s8 -> s32 on the
    # MXU at 2x the bf16 rate (v5e: 394.5 TOPS vs 197 TFLOP/s).
    # Weights quantize per output channel (hoisted out of the sampling
    # scan — params are loop-invariant), activations per token row on
    # the fly. Param tree is unchanged (bf16-trained checkpoints load
    # as-is). Inference-only: train-mode use raises. Default OFF — the
    # 1e-3 reference-parity bar stays on the bf16/fp32 path; the
    # sampling-distribution impact is TV-validated on chip
    # (scripts/validate_quant_tpu.py) like the fused kernels were.
    quant_int8: bool = False


def timestep_embedding(t: jax.Array, dim: int,
                       max_period: float = 10_000.0) -> jax.Array:
    """Sinusoidal features of sigma, fp32 (reference dit.py:169-193)."""
    half = dim // 2
    freqs = jnp.exp(-math.log(max_period)
                    * jnp.arange(half, dtype=jnp.float32) / half)
    args = t[:, None].astype(jnp.float32) * freqs[None]
    emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2:
        emb = jnp.concatenate([emb, jnp.zeros_like(emb[:, :1])], axis=-1)
    return emb


def rope_cos_sin(length: int, head_dim: int, base: float = 10_000.0):
    """Rotary cos/sin tables, fp32, shape (L, head_dim//2)."""
    inv_freq = 1.0 / (base ** (jnp.arange(0, head_dim, 2,
                                          dtype=jnp.float32) / head_dim))
    t = jnp.arange(length, dtype=jnp.float32)
    freqs = jnp.einsum('i,j->ij', t, inv_freq)
    return jnp.cos(freqs), jnp.sin(freqs)


def apply_rope(x: jax.Array, cos: jax.Array, sin: jax.Array) -> jax.Array:
    """Rotate (B, L, H, D) q or k by interleaved-half RoPE.

    Matches the reference's rotate_half convention (dit.py:111-121): the
    head dim is split into two halves (x1, x2) and rotated as
    (x1*cos - x2*sin, x2*cos + x1*sin). fp32 rotation, cast back.
    """
    dtype = x.dtype
    d2 = x.shape[-1] // 2
    x1, x2 = x[..., :d2].astype(jnp.float32), x[..., d2:].astype(jnp.float32)
    cos = cos[None, :, None, :]
    sin = sin[None, :, None, :]
    out = jnp.concatenate(
        [x1 * cos - x2 * sin, x2 * cos + x1 * sin], axis=-1)
    return out.astype(dtype)


class AdaLNLayerNorm(nn.Module):
    """LayerNorm with learned scale only, fp32 normalization
    (reference LayerNorm, dit.py:131-139).

    Statistics via the one-pass moments E[x^2] - E[x]^2 (one fp32
    read of x instead of two; measured 22% faster standalone on v5e
    at the text8 train shape). Activations are O(1) here so the
    cancellation risk of the one-pass form is immaterial."""
    dim: int

    @nn.compact
    def __call__(self, x, *, params_only: bool = False):
        w = self.param('weight', nn.initializers.ones, (self.dim,))
        if params_only:
            # Hand the weight to a fused caller (ops/adaln_pallas.py)
            # under this module's param path, so checkpoints stay
            # interchangeable with the unfused path.
            return w
        x32 = x.astype(jnp.float32)
        m1 = x32.mean(-1, keepdims=True)
        m2 = (x32 * x32).mean(-1, keepdims=True)
        var = jnp.maximum(m2 - m1 * m1, 0.0)
        y = (x32 - m1) * jax.lax.rsqrt(var + 1e-5)
        return (y * w[None, None, :]).astype(x.dtype)


def einsum_attention(q, k, v, *, causal: bool,
                     probs_dtype=jnp.bfloat16, remat: bool = False):
    """Hand-rolled SDPA with an explicit probs dtype (see
    DITConfig.attn_probs_bf16). (B, L, H, D) layout, fp32 softmax
    statistics, probs cast to `probs_dtype` before the PV matmul."""
    def inner(q, k, v):
        scale = 1.0 / math.sqrt(q.shape[-1])
        s = jnp.einsum('blhd,bmhd->bhlm', q, k,
                       preferred_element_type=jnp.float32) * scale
        if causal:
            L = q.shape[1]
            mask = jnp.tril(jnp.ones((L, L), jnp.bool_))
            s = jnp.where(mask, s, -1e30)
        p = jax.nn.softmax(s, axis=-1).astype(probs_dtype)
        return jnp.einsum('bhlm,bmhd->blhd', p, v,
                          preferred_element_type=jnp.float32
                          ).astype(v.dtype)
    if remat:
        inner = jax.checkpoint(inner)
    return inner(q, k, v)


def modulate(x, shift, scale):
    """x * (1 + scale) + shift with (B, D) shift/scale (dit.py:124-125)."""
    return x * (1 + scale[:, None]) + shift[:, None]


def _ambient_axis_size(axis: str) -> int:
    """Size of a named axis in the ambient (jax.set_mesh) mesh, or 0
    when no mesh context is active (e.g. during model.init)."""
    try:
        mesh = jax.sharding.get_abstract_mesh()
        return int(dict(mesh.shape).get(axis, 0))
    except Exception:
        return 0


def _tp_constrain(x, *spec):
    """with_sharding_constraint that no-ops outside a mesh context
    (e.g. during model.init): a bare PartitionSpec needs `with mesh:`
    at trace time, which parallel.mesh.shard_train_step provides."""
    try:
        return jax.lax.with_sharding_constraint(
            x, jax.sharding.PartitionSpec(*spec))
    except RuntimeError:
        return x


class DDiTBlock(nn.Module):
    cfg: DITConfig

    @nn.compact
    def __call__(self, x, cos, sin, c, *, train: bool):
        cfg = self.cfg
        dim = cfg.hidden_size
        dt = cfg.compute_dtype
        if cfg.quant_int8 and train:
            raise ValueError(
                'quant_int8 is an inference-only transform (jnp.round '
                'kills gradients); train with it off and flip it on '
                'for sampling/eval')
        # int8 quant applies to the four big trunk matmuls; the tiny
        # zero-init adaLN modulation projection stays in compute_dtype.
        if cfg.quant_int8:
            from ddg_tpu.ops.quant import QDense as Dense
        else:
            Dense = nn.Dense

        use_adaLN = cfg.use_adaLN and c is not None
        if use_adaLN:
            mod = nn.Dense(6 * dim, use_bias=True,
                           kernel_init=nn.initializers.zeros,
                           bias_init=nn.initializers.zeros,
                           dtype=dt, name='adaLN_modulation')(c)
            (shift_msa, scale_msa, gate_msa,
             shift_mlp, scale_mlp, gate_mlp) = jnp.split(mod, 6, axis=-1)
        else:
            shift_msa = scale_msa = gate_msa = None
            shift_mlp = scale_mlp = gate_mlp = None

        # --- attention ---
        fused_adaln = (cfg.fused_adaln
                       if isinstance(cfg.fused_adaln, bool)
                       else cfg.fused_adaln == 'interpret')
        adaln_interp = cfg.fused_adaln == 'interpret'
        if (not use_adaLN or cfg.tensor_axis
                or (x.shape[1] % 128 != 0 and not adaln_interp)):
            fused_adaln = False
        if fused_adaln:
            from ddg_tpu.ops.adaln_pallas import (gate_res_ln_modulate,
                                                  ln_modulate)
        x_skip = x
        if fused_adaln:
            w1 = AdaLNLayerNorm(dim, name='norm1')(x, params_only=True)
            h = ln_modulate(x, w1, shift_msa, scale_msa,
                            interpret=adaln_interp)
        else:
            h = AdaLNLayerNorm(dim, name='norm1')(x)
            if use_adaLN:
                h = modulate(h, shift_msa, scale_msa)
        qkv = Dense(3 * dim, use_bias=False, dtype=dt,
                    name='attn_qkv')(h)
        B, L = x.shape[0], x.shape[1]
        head_dim = dim // cfg.n_heads
        qkv = qkv.reshape(B, L, 3, cfg.n_heads, head_dim)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        if cfg.tensor_axis and cfg.tp_mode == 'heads':
            q = _tp_constrain(q, cfg.batch_axis, None,
                              cfg.tensor_axis, None)
            k = _tp_constrain(k, cfg.batch_axis, None,
                              cfg.tensor_axis, None)
            v = _tp_constrain(v, cfg.batch_axis, None,
                              cfg.tensor_axis, None)
        elif cfg.tensor_axis and cfg.tp_mode == 'sequence':
            # Q stays L-sharded; K/V replicated over L (XLA inserts
            # the all-gather) so each device attends its L-shard of
            # queries against the full sequence.
            q = _tp_constrain(q, cfg.batch_axis, cfg.tensor_axis,
                              None, None)
            k = _tp_constrain(k, cfg.batch_axis, None, None, None)
            v = _tp_constrain(v, cfg.batch_axis, None, None, None)
        elif cfg.tensor_axis and cfg.tp_mode == 'ring':
            # K/V stay L-sharded too: they circulate the ring inside
            # ring_attention instead of being all-gathered.
            q = _tp_constrain(q, cfg.batch_axis, cfg.tensor_axis,
                              None, None)
            k = _tp_constrain(k, cfg.batch_axis, cfg.tensor_axis,
                              None, None)
            v = _tp_constrain(v, cfg.batch_axis, cfg.tensor_axis,
                              None, None)
        use_fused_rope = (cfg.fused_rope_attn
                          if isinstance(cfg.fused_rope_attn, bool)
                          else False)
        use_pallas = (cfg.pallas_attention
                      if isinstance(cfg.pallas_attention, bool)
                      else False)
        use_tpu_flash = (cfg.tpu_flash_attn
                         if isinstance(cfg.tpu_flash_attn, bool)
                         else False)
        if cfg.tensor_axis:
            # Pallas kernels are opaque custom calls GSPMD cannot
            # partition: under tensor/sequence parallelism they would
            # force a replicated (unsharded) attention. XLA attention
            # partitions cleanly over heads or L.
            use_fused_rope = use_pallas = use_tpu_flash = False
        if use_tpu_flash:
            from jax.experimental.pallas.ops.tpu import (
                flash_attention as _fa)
            q = apply_rope(q, cos, sin)
            k = apply_rope(k, cos, sin)
            # kernel layout is (B, H, L, D)
            o = _fa.flash_attention(
                q.swapaxes(1, 2), k.swapaxes(1, 2), v.swapaxes(1, 2),
                causal=cfg.causal, sm_scale=1.0 / math.sqrt(head_dim))
            attn = o.swapaxes(1, 2)
        elif use_fused_rope:
            from ddg_tpu.ops.attention_pallas import \
                fused_rope_attention
            attn = fused_rope_attention(q, k, v, cos, sin,
                                        causal=cfg.causal)
        elif use_pallas:
            from ddg_tpu.ops.attention_pallas import short_seq_attention
            q = apply_rope(q, cos, sin)
            k = apply_rope(k, cos, sin)
            attn = short_seq_attention(q, k, v, causal=cfg.causal)
        else:
            q = apply_rope(q, cos, sin)
            k = apply_rope(k, cos, sin)
            ring_n = (_ambient_axis_size(cfg.tensor_axis)
                      if cfg.tensor_axis and cfg.tp_mode == 'ring'
                      else 0)
            if ring_n > 1 and not cfg.causal:
                from ddg_tpu.ops.ring_attention import ring_attention
                attn = ring_attention(q, k, v, axis=cfg.tensor_axis,
                                      batch_axis=cfg.batch_axis)
            else:
                # ring mode falls back here outside a mesh context
                # (model.init) or on a 1-sized axis.
                bf16_probs = (cfg.attn_probs_bf16
                              if isinstance(cfg.attn_probs_bf16, bool)
                              else False)
                attn_remat = (cfg.attn_remat
                              if isinstance(cfg.attn_remat, bool)
                              else False)
                if bf16_probs:
                    attn_fn = functools.partial(
                        einsum_attention, causal=cfg.causal,
                        probs_dtype=jnp.bfloat16, remat=attn_remat)
                else:
                    attn_fn = functools.partial(
                        jax.nn.dot_product_attention,
                        is_causal=cfg.causal)
                    if attn_remat:
                        attn_fn = jax.checkpoint(attn_fn)
                attn = attn_fn(q, k, v)
        attn = attn.reshape(B, L, dim)
        if cfg.tensor_axis and cfg.tp_mode == 'heads':
            attn = _tp_constrain(attn, cfg.batch_axis, None,
                                 cfg.tensor_axis)
        elif cfg.tensor_axis and cfg.tp_mode in ('sequence', 'ring'):
            attn = _tp_constrain(attn, cfg.batch_axis,
                                 cfg.tensor_axis, None)
        h = Dense(dim, use_bias=False, dtype=dt, name='attn_out')(attn)
        h = nn.Dropout(cfg.dropout, deterministic=not train)(h)
        if fused_adaln:
            # gate + residual + norm2 + modulate as one kernel; x
            # becomes the new residual stream.
            w2 = AdaLNLayerNorm(dim, name='norm2')(x, params_only=True)
            x, h = gate_res_ln_modulate(
                h, x_skip, gate_msa, w2, shift_mlp, scale_mlp,
                interpret=adaln_interp)
            x_skip = x
        else:
            if use_adaLN:
                h = gate_msa[:, None] * h
            x = x_skip + h

            # --- mlp ---
            x_skip = x
            h = AdaLNLayerNorm(dim, name='norm2')(x)
            if use_adaLN:
                h = modulate(h, shift_mlp, scale_mlp)
        h = Dense(4 * dim, use_bias=True, dtype=dt, name='mlp_in')(h)
        h = nn.gelu(h, approximate=True)
        if cfg.tensor_axis and cfg.tp_mode == 'heads':
            h = _tp_constrain(h, cfg.batch_axis, None, cfg.tensor_axis)
        elif cfg.tensor_axis and cfg.tp_mode in ('sequence', 'ring'):
            h = _tp_constrain(h, cfg.batch_axis, cfg.tensor_axis, None)
        h = Dense(dim, use_bias=True, dtype=dt, name='mlp_out')(h)
        h = nn.Dropout(cfg.dropout, deterministic=not train)(h)
        if use_adaLN:
            h = gate_mlp[:, None] * h
        out = x_skip + h
        if cfg.tensor_axis and cfg.tp_mode in ('sequence', 'ring'):
            # Pin the residual stream L-sharded between blocks.
            out = _tp_constrain(out, cfg.batch_axis, cfg.tensor_axis,
                                None)
        return out


class TimestepEmbedder(nn.Module):
    cond_dim: int
    freq_dim: int = 256

    @nn.compact
    def __call__(self, sigma):
        h = timestep_embedding(sigma, self.freq_dim)
        h = nn.Dense(self.cond_dim, name='mlp1')(h)
        h = nn.silu(h)
        return nn.Dense(self.cond_dim, name='mlp2')(h)


class DIT(nn.Module):
    """Denoiser: (indices, sigma, cond, x_emb) -> logits (B, L, V).

    Signature parity with reference DIT.forward (dit.py:426-429);
    `x_emb` bypasses the trunk (NOS hook), `return_hidden_states` returns
    the final trunk hidden state alongside the logits.
    """
    cfg: DITConfig

    @nn.compact
    def __call__(self, indices, sigma, cond=None, x_emb=None, *,
                 train: bool = False, return_hidden_states: bool = False,
                 skip_head: bool = False):
        cfg = self.cfg
        if cfg.causal:
            c = None
        else:
            c = nn.silu(TimestepEmbedder(cfg.cond_dim,
                                         name='sigma_map')(sigma))
        if cond is not None:
            assert cfg.num_classes is not None, (
                'Conditioning variable provided, but model was not '
                'initialized with condition embedding layer.')
            cond_emb = nn.Embed(cfg.num_classes + 1, cfg.cond_dim,
                                name='cond_map')(cond)
            cond_emb = nn.silu(cond_emb)
            c = cond_emb if c is None else c + cond_emb
        if c is not None:
            c = c.astype(cfg.compute_dtype)

        if x_emb is None:
            embed = self.param(
                'vocab_embed',
                nn.initializers.variance_scaling(
                    1 / 3, 'fan_in', 'uniform'),
                (cfg.vocab_size, cfg.hidden_size))
            x = embed[indices].astype(cfg.compute_dtype)
            head_dim = cfg.hidden_size // cfg.n_heads
            cos, sin = rope_cos_sin(x.shape[1], head_dim)
            for i in range(cfg.n_blocks):
                x = DDiTBlock(cfg, name=f'block_{i}')(
                    x, cos, sin, c, train=train)
        else:
            x = x_emb.astype(cfg.compute_dtype)

        hidden = x
        if skip_head:
            # Trunk-only forward: callers that need logits at a few
            # positions apply the head via `dit_head_fn` (samplers) —
            # skips the (L x V) projection entirely.
            return hidden, (c if c is not None else jnp.zeros(
                (x.shape[0], cfg.cond_dim), cfg.compute_dtype))
        # Output head: fp32 logits (dtype policy; reference runs the head
        # in bf16 autocast but our parity target is the fp32 math).
        fused_adaln = (cfg.fused_adaln
                       if isinstance(cfg.fused_adaln, bool)
                       else cfg.fused_adaln == 'interpret')
        adaln_interp = cfg.fused_adaln == 'interpret'
        if (not (cfg.use_adaLN and c is not None) or cfg.tensor_axis
                or (x.shape[1] % 128 != 0 and not adaln_interp)):
            fused_adaln = False
        if cfg.use_adaLN and c is not None:
            mod = nn.Dense(2 * cfg.hidden_size, use_bias=True,
                           kernel_init=nn.initializers.zeros,
                           bias_init=nn.initializers.zeros,
                           dtype=cfg.compute_dtype,
                           name='final_adaLN')(c)
            shift, scale = jnp.split(mod, 2, axis=-1)
        if fused_adaln:
            from ddg_tpu.ops.adaln_pallas import ln_modulate
            wf = AdaLNLayerNorm(cfg.hidden_size, name='norm_final')(
                x, params_only=True)
            h = ln_modulate(x, wf, shift, scale,
                            interpret=adaln_interp)
        else:
            h = AdaLNLayerNorm(cfg.hidden_size, name='norm_final')(x)
            if cfg.use_adaLN and c is not None:
                h = modulate(h, shift, scale)
        if cfg.quant_int8:
            from ddg_tpu.ops.quant import QDense
            logits = QDense(cfg.vocab_size,
                            kernel_init=nn.initializers.zeros,
                            bias_init=nn.initializers.zeros,
                            dtype=cfg.logits_dtype,
                            name='output_linear')(h)
        else:
            logits = nn.Dense(cfg.vocab_size,
                              kernel_init=nn.initializers.zeros,
                              bias_init=nn.initializers.zeros,
                              dtype=cfg.logits_dtype,
                              name='output_linear')(
                h.astype(cfg.logits_dtype))
        if return_hidden_states:
            return logits, hidden
        return logits


class DITClassifier(nn.Module):
    """Classifier trunk + pooling head (reference dit.py:470-556).

    Accepts indices (B, L) or one-hot/soft inputs (B, L, V) — the latter
    enables d(log p)/d(one-hot) gradients for CBG-approx — and `x_emb`
    to classify a hidden state directly (NOS).
    Poolings: mean, max, cls, last, no_pooling (FUDGE), attention_mean.
    """
    cfg: DITConfig
    num_classes: int = 2
    pooling: str = 'mean'

    @nn.compact
    def __call__(self, indices_or_one_hots, sigma, x_emb=None,
                 attention_mask=None, *, train: bool = False):
        cfg = self.cfg
        if x_emb is None:
            embed = self.param(
                'vocab_embed',
                nn.initializers.variance_scaling(
                    1 / 3, 'fan_in', 'uniform'),
                (cfg.vocab_size, cfg.hidden_size))
            if indices_or_one_hots.ndim == 2:
                x = embed[indices_or_one_hots]
            else:
                x = indices_or_one_hots.astype(jnp.float32) @ embed
            x = x.astype(cfg.compute_dtype)
            if cfg.causal:
                c = None
            else:
                # Clean-sequence (eval) classifiers condition on
                # sigma=0 — the reference zeroes sigma when time
                # conditioning is off (classifier.py:484-489) and its
                # eval classifiers skip sigma entirely
                # (classifier.py:306-308).
                if sigma is None:
                    sigma = jnp.zeros((x.shape[0],), jnp.float32)
                c = nn.silu(TimestepEmbedder(cfg.cond_dim,
                                             name='sigma_map')(sigma))
                c = c.astype(cfg.compute_dtype)
            head_dim = cfg.hidden_size // cfg.n_heads
            cos, sin = rope_cos_sin(x.shape[1], head_dim)
            for i in range(cfg.n_blocks):
                x = DDiTBlock(cfg, name=f'block_{i}')(
                    x, cos, sin, c, train=train)
        else:
            x = x_emb.astype(cfg.compute_dtype)

        if self.pooling == 'mean':
            x = x.mean(axis=1)
        elif self.pooling == 'max':
            x = x.max(axis=1)
        elif self.pooling == 'cls':
            x = x[:, 0]
        elif self.pooling == 'last':
            x = x[:, -1]
        elif self.pooling == 'no_pooling':
            pass
        elif self.pooling == 'attention_mean':
            m = attention_mask[..., None].astype(x.dtype)
            x = (x * m).sum(axis=1) / (m.sum(axis=1) + 1e-15)
        else:
            raise NotImplementedError(
                f'`{self.pooling}` method not implemented.')
        return nn.Dense(self.num_classes, dtype=jnp.float32,
                        name='output_layer')(x.astype(jnp.float32))


def dit_head_features(cfg: DITConfig, params, hidden, c):
    """norm_final + final adaLN modulation WITHOUT the vocab matmul.

    hidden: (..., D); c: (batch, cond_dim) broadcast over any middle
    dims. The output head is linear in these features, which makes two
    algebraic shortcuts valid downstream: projecting only selected
    rows (first-hitting sampler) and gamma-mixing cond/uncond features
    before ONE vocab matmul (CFG; logits mix == feature mix @ W since
    the bias sums to bias: gamma*b + (1-gamma)*b = b).
    """
    h32 = hidden.astype(jnp.float32)
    mean = h32.mean(-1, keepdims=True)
    var = h32.var(-1, keepdims=True)
    h = (h32 - mean) * jax.lax.rsqrt(var + 1e-5)
    h = (h * params['norm_final']['weight']).astype(hidden.dtype)
    if cfg.use_adaLN and 'final_adaLN' in params:
        mod = c @ params['final_adaLN']['kernel'] \
            + params['final_adaLN']['bias']
        shift, scale = jnp.split(mod, 2, axis=-1)
        extra = (1,) * (hidden.ndim - 2)
        shift = shift.reshape(shift.shape[0], *extra, shift.shape[-1])
        scale = scale.reshape(scale.shape[0], *extra, scale.shape[-1])
        h = h * (1 + scale) + shift
    return h


def dit_head_matmul(cfg: DITConfig, params, feats):
    """The vocab projection on head features (dtype per logits_dtype).

    The bias is cast to logits_dtype BEFORE the add (as nn.Dense's
    dtype policy does): a fp32 bias would promote the whole (B, L, V)
    logits tensor to fp32 — an extra half-gigabyte HBM round-trip per
    sampling step at the LM1B scale."""
    dt = cfg.logits_dtype
    if cfg.quant_int8:
        from ddg_tpu.ops.quant import int8_dense
        return int8_dense(feats, params['output_linear']['kernel'],
                          params['output_linear']['bias'],
                          out_dtype=dt)
    h = feats.astype(dt)
    logits = h @ params['output_linear']['kernel'].astype(dt) \
        + params['output_linear']['bias'].astype(dt)
    return logits


def dit_head_fn(cfg: DITConfig, params, hidden_rows, c):
    """Apply the DIT output head to gathered hidden rows (B, D).

    Reproduces the final layer (norm_final + adaLN + output_linear)
    outside the module — used by the first-hitting sampler to project
    only the positions being decoded.
    """
    feats = dit_head_features(cfg, params, hidden_rows, c)
    return dit_head_matmul(cfg, params, feats).astype(jnp.float32)
