"""Stateful single-token decoding for unidirectional DiMamba (AR).

The reference decodes DiMamba autoregressively with per-layer conv and
SSM state caches updated by Triton/CUDA kernels
(/root/reference/models/dimamba.py:252-312 `step`,
selective_state_update). Here the same recurrence is a small jitted
update over the `models.dimamba.DiMamba` parameter pytree:

  conv state: the last d_conv inputs per channel (rolling window);
  ssm state:  h in R^{d_inner x N}, h' = exp(dt A) h + dt B x.

Only the forward (causal) direction exists for AR (bidirectional
decode is undefined, as in the reference dimamba.py:636-641).
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from ddg_tpu.models.dimamba import DiMambaConfig


def init_cache(cfg: DiMambaConfig, batch_size: int) -> Dict:
    d = cfg.d_inner
    return {
        'conv': jnp.zeros((cfg.n_blocks, batch_size, cfg.d_conv, d),
                          jnp.float32),
        'ssm': jnp.zeros((cfg.n_blocks, batch_size, d, cfg.d_state),
                         jnp.float32),
    }


def _dense(p, x):
    y = x @ p['kernel']
    if 'bias' in p:
        y = y + p['bias']
    return y


def _layer_norm(p, x):
    x32 = x.astype(jnp.float32)
    mean = x32.mean(-1, keepdims=True)
    var = x32.var(-1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + 1e-5)
    y = y * p['scale'] + p['bias']
    return y


def _mixer_step(cfg: DiMambaConfig, mp, conv_state, ssm_state, h):
    """One Mamba step for (B, D) input h. Returns (out, conv', ssm')."""
    core = mp['core_fwd']
    xz = _dense(mp['in_proj_fwd'], h)
    x, z = jnp.split(xz, 2, axis=-1)                 # (B, d_inner)

    # rolling conv window: drop oldest, append x
    conv_state = jnp.concatenate(
        [conv_state[:, 1:], x[:, None, :]], axis=1)  # (B, d_conv, d)
    kernel = core['conv1d_kernel'][:, 0, :]          # (d_conv, d)
    conv_out = (conv_state * kernel[None]).sum(1) + core['conv1d_bias']
    conv_out = jax.nn.silu(conv_out)

    x_dbl = conv_out @ core['x_proj']['kernel']
    dt, B_ssm, C_ssm = jnp.split(
        x_dbl, [cfg.dt_rank, cfg.dt_rank + cfg.d_state], axis=-1)
    delta = jax.nn.softplus(_dense(core['dt_proj'],
                                   dt.astype(jnp.float32)))
    A = -jnp.exp(core['A_log'])                      # (d, N)
    a = jnp.exp(delta[..., None] * A[None])          # (B, d, N)
    b = (delta[..., None] * B_ssm[:, None, :].astype(jnp.float32)
         * conv_out[..., None].astype(jnp.float32))
    ssm_state = a * ssm_state + b
    y = (ssm_state * C_ssm[:, None, :].astype(jnp.float32)).sum(-1) \
        + core['D'] * conv_out.astype(jnp.float32)
    y = y * jax.nn.silu(z.astype(jnp.float32))
    out = _dense(mp['out_proj_fwd'], y.astype(h.dtype))
    return out, conv_state, ssm_state


def decode_step(cfg: DiMambaConfig, params, cache: Dict,
                token: jax.Array, cond=None) -> Tuple[jax.Array, Dict]:
    """One AR decode step: token (B,) -> logits (B, V) + new cache.

    AR DiMamba has no sigma conditioning (reference dimamba.py:1083-1085);
    cond (CFG label) enters through the adaLN path when configured.
    """
    assert not cfg.bidirectional, (
        'stateful decode requires a unidirectional DiMamba '
        '(reference dimamba.py:636-641)')
    embed = params['word_embeddings']['embedding']
    x = embed[token].astype(jnp.float32)             # (B, D)
    c = None
    if cond is not None:
        ce = jax.nn.silu(params['cond_map']['embedding'][cond])
        c = ce.astype(jnp.float32)

    residual = None
    new_conv, new_ssm = [], []
    for i in range(cfg.n_blocks):
        bp = params[f'block_{i}']
        residual = x + residual if residual is not None else x
        h = _layer_norm(bp['norm'], residual)
        gate = None
        if cfg.use_adaLN and c is not None:
            mod = _dense(bp['adaLN_modulation'], c)
            shift, scale, gate = jnp.split(mod, 3, axis=-1)
            h = h * (1 + scale) + shift
        out, cs, ss = _mixer_step(cfg, bp['mixer'], cache['conv'][i],
                                  cache['ssm'][i], h)
        new_conv.append(cs)
        new_ssm.append(ss)
        if gate is not None:
            x = gate * out + residual
        else:
            x = out
    final = x + residual if residual is not None else x
    final = _layer_norm(params['norm_f'], final)
    if cfg.use_adaLN and c is not None and 'adaLN_final' in params:
        # Final adaLN after norm_f (reference adaLN_modulation_final,
        # dimamba.py:741-746,815-822) — must match DiMamba.__call__.
        mod = _dense(params['adaLN_final'], c)
        shift, scale = jnp.split(mod, 2, axis=-1)
        final = final * (1 + scale) + shift
    if cfg.tie_word_embeddings:
        logits = final @ embed.T
    else:
        logits = _dense(params['lm_head'], final)
    return logits.astype(jnp.float32), {
        'conv': jnp.stack(new_conv), 'ssm': jnp.stack(new_ssm)}
