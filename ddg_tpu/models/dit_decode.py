"""KV-cache incremental decoding for the DiT AR family.

The reference recomputes the full prefix every AR step for DiT
(/root/reference/diffusion.py:1132-1133: `forward(x[:, :i+1])`), i.e.
O(L^3) attention work per sequence. This module provides O(L^2) decode:
one token per step against cached K/V, applied as pure functions over
the *same* parameter pytree as `models.dit.DIT` (so training/decoding
share checkpoints bit-for-bit).

Used by `samplers.ar_sample` as the fast path; correctness is pinned by
a test asserting per-position logits match the full causal forward.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from ddg_tpu.models.dit import DITConfig, rope_cos_sin, timestep_embedding


def init_cache(cfg: DITConfig, batch_size: int,
               kv_int8: bool = False) -> Dict:
    head_dim = cfg.hidden_size // cfg.n_heads
    shape = (cfg.n_blocks, batch_size, cfg.length, cfg.n_heads, head_dim)
    if kv_int8:
        # int8 rows + per-(block,b,l,h) scales: halves the per-step
        # HBM cache-read traffic that dominates batched decode
        # (dec_B=512: ~2.4 GB/step of bf16 k/v reads vs ~0.23 GB of
        # weights). Scales ride outside the MXU contractions — see
        # decode_step — so nothing is dequantized to a full bf16 copy.
        sshape = shape[:-1]
        return {'k': jnp.zeros(shape, jnp.int8),
                'v': jnp.zeros(shape, jnp.int8),
                'k_s': jnp.zeros(sshape, jnp.float32),
                'v_s': jnp.zeros(sshape, jnp.float32)}
    return {'k': jnp.zeros(shape, cfg.compute_dtype),
            'v': jnp.zeros(shape, cfg.compute_dtype)}


def _quant_row(x):
    """Per-(B,H) int8 row quant over head_dim. x: (B, H, D)."""
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1)
    scale = jnp.maximum(amax, 1e-12) / 127.0
    q = jnp.round(x.astype(jnp.float32) / scale[..., None])
    return q.astype(jnp.int8), scale


def _dense(p, x):
    # Match nn.Dense's dtype policy: params cast to the activation
    # dtype (fp32 params would otherwise promote a bf16 trunk to fp32
    # — and mismatch the bf16 KV cache).
    y = x @ p['kernel'].astype(x.dtype)
    if 'bias' in p:
        y = y + p['bias'].astype(x.dtype)
    return y


def _layer_norm(p, x):
    x32 = x.astype(jnp.float32)
    mean = x32.mean(-1, keepdims=True)
    var = x32.var(-1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + 1e-5)
    return (y * p['weight']).astype(x.dtype)


def _rope_at(pos, head_dim):
    """cos/sin row at a (traced) position."""
    inv_freq = 1.0 / (10_000 ** (jnp.arange(0, head_dim, 2,
                                            dtype=jnp.float32)
                                 / head_dim))
    f = pos.astype(jnp.float32) * inv_freq
    return jnp.cos(f), jnp.sin(f)


def _apply_rope_single(x, cos, sin):
    """x: (B, H, D) at one position."""
    d2 = x.shape[-1] // 2
    x1, x2 = x[..., :d2].astype(jnp.float32), x[..., d2:].astype(
        jnp.float32)
    out = jnp.concatenate([x1 * cos - x2 * sin, x2 * cos + x1 * sin],
                          axis=-1)
    return out.astype(x.dtype)


def decode_step(cfg: DITConfig, params, cache: Dict, token: jax.Array,
                pos: jax.Array, cond=None, *,
                window: int | None = None) -> Tuple[jax.Array, Dict]:
    """One AR decode step.

    token: (B,) int32; pos: scalar int32 (0-based). Returns
    (logits (B, V), new_cache). Matches DIT's causal forward at
    position `pos` exactly (test_dit_decode).

    window: STATIC upper bound on pos+1 — attention reads only the
    first `window` cache rows (early decode positions need only a
    prefix; reading all L rows at every step is the ~2x cache-read
    overhead of DESIGN known-gap C). Token-identical to window=None:
    rows in [pos+1, window) are masked to -1e30 either way, so the
    softmax weights of the live rows are unchanged.
    """
    B = token.shape[0]
    W = cfg.length if window is None else min(window, cfg.length)
    head_dim = cfg.hidden_size // cfg.n_heads
    x = params['vocab_embed'][token].astype(cfg.compute_dtype)  # (B, D)

    c = None
    if cond is not None:
        emb = params['cond_map']['embedding'][cond]
        c = jax.nn.silu(emb).astype(cfg.compute_dtype)

    cos, sin = _rope_at(pos, head_dim)
    k_all, v_all = cache['k'], cache['v']
    kv_int8 = 'k_s' in cache
    if kv_int8:
        ks_all, vs_all = cache['k_s'], cache['v_s']
    for i in range(cfg.n_blocks):
        p = params[f'block_{i}']
        if cfg.use_adaLN and c is not None:
            mod = _dense(p['adaLN_modulation'], c)
            (sh_msa, sc_msa, g_msa,
             sh_mlp, sc_mlp, g_mlp) = jnp.split(mod, 6, axis=-1)
        skip = x
        h = _layer_norm(p['norm1'], x)
        if cfg.use_adaLN and c is not None:
            h = h * (1 + sc_msa) + sh_msa
        qkv = _dense(p['attn_qkv'], h).reshape(B, 3, cfg.n_heads,
                                               head_dim)
        q, k, v = qkv[:, 0], qkv[:, 1], qkv[:, 2]
        q = _apply_rope_single(q, cos, sin)
        k = _apply_rope_single(k, cos, sin)
        # In-place row update of the stacked (n_blocks, B, L, H, Dh)
        # cache (XLA aliases the scan-carried buffer). The previous
        # slice-per-block + jnp.stack rebuilt the full cache every
        # step: ~2 full-cache copies (~2.4 GB/step at 2B=512) of pure
        # memory traffic.
        if kv_int8:
            kq, ksc = _quant_row(k)
            vq, vsc = _quant_row(v)
            k_all = jax.lax.dynamic_update_slice(
                k_all, kq[None, :, None], (i, 0, pos, 0, 0))
            v_all = jax.lax.dynamic_update_slice(
                v_all, vq[None, :, None], (i, 0, pos, 0, 0))
            ks_all = jax.lax.dynamic_update_slice(
                ks_all, ksc[None, :, None], (i, 0, pos, 0))
            vs_all = jax.lax.dynamic_update_slice(
                vs_all, vsc[None, :, None], (i, 0, pos, 0))
        else:
            k_all = jax.lax.dynamic_update_slice(
                k_all, k[None, :, None].astype(k_all.dtype),
                (i, 0, pos, 0, 0))
            v_all = jax.lax.dynamic_update_slice(
                v_all, v[None, :, None].astype(v_all.dtype),
                (i, 0, pos, 0, 0))
        k_cache = jax.lax.slice_in_dim(k_all[i], 0, W, axis=1)
        v_cache = jax.lax.slice_in_dim(v_all[i], 0, W, axis=1)
        # attention of the single query over positions <= pos — MXU
        # dots on the cache's own dtype with fp32 accumulation (the
        # same policy as the training forward's bf16 SDPA; the old
        # .astype(fp32) materialized fp32 cache copies, ~4.8 GB/step
        # at 2B=512). On the int8 cache, the per-row scales multiply
        # OUTSIDE the d-contraction (logits scale by k's row scale;
        # v's row scale folds into the softmax weights), so the dots
        # read int8 from HBM — half the bytes — and the int8->bf16
        # convert fuses into the dot operand, never materializing a
        # dequantized cache copy.
        logits = jnp.einsum(
            'bhd,blhd->bhl', q,
            k_cache.astype(q.dtype) if kv_int8 else k_cache,
            preferred_element_type=jnp.float32)
        if kv_int8:
            k_sc = jax.lax.slice_in_dim(ks_all[i], 0, W, axis=1)
            logits = logits * jnp.swapaxes(k_sc, 1, 2)
        logits = logits / jnp.sqrt(jnp.float32(head_dim))
        l_ids = jnp.arange(W)
        logits = jnp.where(l_ids[None, None, :] <= pos, logits, -1e30)
        w = jax.nn.softmax(logits, axis=-1)
        if kv_int8:
            v_sc = jax.lax.slice_in_dim(vs_all[i], 0, W, axis=1)
            w = (w * jnp.swapaxes(v_sc, 1, 2)).astype(cfg.compute_dtype)
            attn = jnp.einsum('bhl,blhd->bhd', w,
                              v_cache.astype(cfg.compute_dtype),
                              preferred_element_type=jnp.float32)
        else:
            w = w.astype(v_cache.dtype)
            attn = jnp.einsum('bhl,blhd->bhd', w, v_cache,
                              preferred_element_type=jnp.float32)
        attn = attn.reshape(B, cfg.hidden_size).astype(cfg.compute_dtype)
        h = _dense(p['attn_out'], attn)
        if cfg.use_adaLN and c is not None:
            h = g_msa * h
        x = skip + h
        skip = x
        h = _layer_norm(p['norm2'], x)
        if cfg.use_adaLN and c is not None:
            h = h * (1 + sc_mlp) + sh_mlp
        h = _dense(p['mlp_in'], h)
        h = jax.nn.gelu(h, approximate=True)
        h = _dense(p['mlp_out'], h)
        if cfg.use_adaLN and c is not None:
            h = g_mlp * h
        x = skip + h

    h = _layer_norm(params['norm_final'], x)
    if cfg.use_adaLN and c is not None and 'final_adaLN' in params:
        mod = _dense(params['final_adaLN'], c)
        shift, scale = jnp.split(mod, 2, axis=-1)
        h = h * (1 + scale) + shift
    logits = _dense(params['output_linear'],
                    h.astype(cfg.logits_dtype)).astype(jnp.float32)
    new_cache = {'k': k_all, 'v': v_all}
    if kv_int8:
        new_cache.update({'k_s': ks_all, 'v_s': vs_all})
    return logits, new_cache
