"""HyenaDNA backbone + sequence classifier, flax.linen.

Native implementation of the architecture the reference loads as HF
remote code (`LongSafari/hyenadna-small-32k-seqlen-hf`) for the
Species10 protocol — the fine-tuned eval classifier
(reference classifier.py:166-178) and the real-vs-generated AUROC
discriminator built `from_config(..., pretrained=False)` and trained
inside the eval loop (reference guidance_eval/ten_species_eval.py:
468-478).  Because the discriminator is trained from scratch, this
module makes the full Species10 protocol architecture-faithful with no
pretrained assets at all; the fine-tuned eval-classifier path
additionally accepts real LongSafari weights through
`convert.import_hf_hyenadna` when they appear on disk.

Architecture (HyenaDNA, arXiv 2306.15794, operator from Hyena
arXiv 2302.10866): a GPT-style pre-norm stack where attention is
replaced by the Hyena operator — a data-controlled implicit long
convolution:

    u -> in_proj -> (x1 | x2 | v) -> short depthwise conv(3)
    v <- fftconv(v * x2, k) ;  y = out_proj(v * x1)

with the long filter k produced implicitly per layer: positional
features (t, Re/Im of complex exponentials) -> sine-activated MLP ->
exponential-decay modulation.  No positional embeddings; no attention.

TPU-first choices:
  * The O(L log L) long convolution is `jnp.fft.rfft/irfft` over a
    2L-padded axis in fp32 — XLA's TPU FFT — instead of the reference
    stack's custom CUDA FFT kernels.
  * The short depthwise conv is one `lax.conv_general_dilated` with
    `feature_group_count == channels` (VPU-mapped).
  * The implicit filter is computed once per layer per forward at
    (L, d) — batch-independent, so XLA hoists it out of the batched
    path; positional features are constants folded at trace time.
  * Trunk matmuls run in `compute_dtype` (bf16); the FFT path, filter
    MLP, and norms stay fp32.

Parameter tree mirrors the HF checkpoint module names
(`backbone.layers.{i}.mixer...`) so the converter is a near-identity
renaming; buffers (positional features, modulation decay rates) are
deterministic and recomputed rather than loaded.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional

import flax.linen as nn
import jax.numpy as jnp
from jax import lax


@dataclasses.dataclass(frozen=True)
class HyenaDNAConfig:
    """Field names/defaults follow the HF `HyenaConfig` of
    hyenadna-small-32k-seqlen; `import_hf_hyenadna` rebuilds this from
    the checkpoint's config.json, so defaults only matter for
    from-scratch training (the AUROC discriminator path)."""
    d_model: int = 256
    n_layer: int = 4
    d_inner: int = 1024
    vocab_size: int = 12
    pad_vocab_size_multiple: int = 8
    max_seq_len: int = 32770
    emb_dim: int = 5              # positional-feature channels (odd)
    filter_order: int = 64        # width of the implicit-filter MLP
    short_filter_order: int = 3
    hyena_order: int = 2
    num_inner_mlps: int = 2
    activation_freq: float = 10.0  # sine-activation frequency w
    train_freq: bool = True
    fast_decay_pct: float = 0.3   # exponential-modulation bounds
    slow_decay_pct: float = 1.5
    modulation_target: float = 1e-2
    modulation_shift: float = 0.0
    embed_dropout: float = 0.1
    hyena_dropout: float = 0.0
    resid_dropout: float = 0.0
    layer_norm_epsilon: float = 1e-5
    initializer_range: float = 0.02
    compute_dtype: jnp.dtype = jnp.bfloat16

    @property
    def padded_vocab_size(self) -> int:
        m = self.pad_vocab_size_multiple
        return ((self.vocab_size + m - 1) // m) * m


def positional_features(L: int, max_seq_len: int, emb_dim: int):
    """(1, L, emb_dim) fp32: [t, Re z_f, Im z_f] with
    z_f = exp(-i 2π f t_idx / max_len), f band frequencies — computed
    at max_seq_len then sliced so numerics match checkpoints trained
    at a longer l_max.  Returns (z, t) with t (1, L, 1) in [0, 1]."""
    n = max_seq_len
    t = jnp.linspace(0.0, 1.0, n, dtype=jnp.float32)[None, :, None]
    bands = (emb_dim - 1) // 2
    t_idx = jnp.linspace(0.0, n - 1, n, dtype=jnp.float32)[None, :, None]
    w = 2.0 * math.pi * t_idx / n                       # (1, n, 1)
    f = jnp.linspace(1e-4, bands - 1, bands,
                     dtype=jnp.float32)[None, None, :]  # (1, 1, bands)
    phase = f * w                                       # (1, n, bands)
    z = jnp.concatenate([t, jnp.cos(-phase), jnp.sin(-phase)], axis=-1)
    return z[:, :L], t[:, :L]


def fftconv(v: jnp.ndarray, k: jnp.ndarray,
            bias: jnp.ndarray) -> jnp.ndarray:
    """Circular-padded causal long conv: v (B, d, L), k (d, L),
    bias (d,) -> (B, d, L), all fp32.  2L zero-pad makes the circular
    FFT conv linear; `norm='forward'` + the 1/fft_size on k matches
    the reference normalization exactly."""
    L = v.shape[-1]
    fft_size = 2 * L
    k_f = jnp.fft.rfft(k, n=fft_size) / fft_size
    v_f = jnp.fft.rfft(v, n=fft_size)
    y = jnp.fft.irfft(v_f * k_f, n=fft_size, norm='forward')[..., :L]
    return y + v * bias[:, None]


class HyenaFilter(nn.Module):
    """Implicit long-filter: pos features -> sin-MLP -> exp modulation.
    Emits k (L, d_filter) fp32 where d_filter = d_model*(order-1)."""
    cfg: HyenaDNAConfig

    @nn.compact
    def __call__(self, L: int) -> jnp.ndarray:
        cfg = self.cfg
        d_filter = cfg.d_model * (cfg.hyena_order - 1)
        z, t = positional_features(L, cfg.max_seq_len, cfg.emb_dim)

        def sin_act(x, idx):
            if cfg.train_freq:
                freq = self.param(
                    f'freq_{idx}',
                    nn.initializers.constant(cfg.activation_freq),
                    (1, cfg.filter_order), jnp.float32)
            else:
                freq = cfg.activation_freq
            return jnp.sin(freq * x)

        h = nn.Dense(cfg.filter_order, dtype=jnp.float32,
                     name='mlp_in')(z)
        h = sin_act(h, 0)
        for i in range(cfg.num_inner_mlps):
            h = nn.Dense(cfg.filter_order, dtype=jnp.float32,
                         name=f'mlp_{i}')(h)
            h = sin_act(h, i + 1)
        h = nn.Dense(d_filter, use_bias=False, dtype=jnp.float32,
                     name='mlp_out')(h)                 # (1, L, d_f)

        # Exponential decay modulation: per-channel rates spread
        # log-linearly between slow/fast percentile bounds.
        max_decay = math.log(cfg.modulation_target) / cfg.fast_decay_pct
        min_decay = math.log(cfg.modulation_target) / cfg.slow_decay_pct
        deltas = jnp.linspace(min_decay, max_decay, d_filter,
                              dtype=jnp.float32)[None, None, :]
        decay = jnp.exp(-t * jnp.abs(deltas))           # (1, L, d_f)
        h = h * (decay + cfg.modulation_shift)
        return h[0]                                     # (L, d_f)


class HyenaOperator(nn.Module):
    """Order-2 Hyena mixer (in_proj -> short conv -> gated fftconv ->
    out_proj).  Input/output (B, L, d_model)."""
    cfg: HyenaDNAConfig

    @nn.compact
    def __call__(self, u: jnp.ndarray, *,
                 train: bool = False) -> jnp.ndarray:
        cfg = self.cfg
        B, L, d = u.shape
        order = cfg.hyena_order
        inner = d * (order + 1)
        dt = cfg.compute_dtype

        proj = nn.Dense(inner, dtype=dt, name='in_proj')(u)
        proj = proj.transpose(0, 2, 1)                  # (B, inner, L)

        # Short depthwise causal conv, kernel (ks, 1, inner) in flax's
        # HWIO-for-grouped layout; left-pad ks-1 then crop to L.
        ks = cfg.short_filter_order
        kernel = self.param(
            'short_filter_kernel',
            nn.initializers.normal(cfg.initializer_range),
            (ks, 1, inner), jnp.float32)
        sf_bias = self.param('short_filter_bias',
                             nn.initializers.zeros, (inner,),
                             jnp.float32)
        conv = lax.conv_general_dilated(
            proj.astype(jnp.float32), kernel.astype(jnp.float32),
            window_strides=(1,), padding=[(ks - 1, ks - 1)],
            dimension_numbers=('NCH', 'HIO', 'NCH'),
            feature_group_count=inner)[..., :L]
        conv = conv + sf_bias[None, :, None]

        parts = jnp.split(conv, order + 1, axis=1)      # [(B, d, L)]*3
        *x, v = parts                                   # x=[x1, x2]

        k_all = HyenaFilter(cfg, name='filter')(L)      # (L, (o-1)*d)
        k_all = k_all.T.reshape(order - 1, d, L)
        bias_all = self.param('filter_bias',
                              nn.initializers.normal(1.0),
                              (order - 1, d), jnp.float32)

        drop = nn.Dropout(cfg.hyena_dropout, deterministic=not train)
        for o, x_i in enumerate(reversed(x[1:])):
            v = drop(v * x_i)
            v = fftconv(v, k_all[o], bias_all[o])
        y = (v * x[0]).transpose(0, 2, 1).astype(dt)    # (B, L, d)
        return nn.Dense(d, dtype=dt, name='out_proj')(y)


class HyenaBlock(nn.Module):
    """Pre-norm block with carried residual (HF remote-code `Block`):
    residual accumulates in fp32, norms read it, mixer/MLP emit
    compute-dtype deltas."""
    cfg: HyenaDNAConfig

    @nn.compact
    def __call__(self, h, residual, *, train: bool = False):
        cfg = self.cfg
        drop = nn.Dropout(cfg.resid_dropout, deterministic=not train)
        residual = (drop(h).astype(jnp.float32) + residual
                    if residual is not None
                    else drop(h).astype(jnp.float32))
        h = nn.LayerNorm(epsilon=cfg.layer_norm_epsilon,
                         dtype=jnp.float32, name='norm1')(residual)
        h = HyenaOperator(cfg, name='mixer')(
            h.astype(cfg.compute_dtype), train=train)
        residual = drop(h).astype(jnp.float32) + residual
        h = nn.LayerNorm(epsilon=cfg.layer_norm_epsilon,
                         dtype=jnp.float32, name='norm2')(residual)
        h = h.astype(cfg.compute_dtype)
        h = nn.Dense(cfg.d_inner, dtype=cfg.compute_dtype,
                     name='mlp_fc1')(h)
        h = nn.gelu(h, approximate=True)
        h = nn.Dense(cfg.d_model, dtype=cfg.compute_dtype,
                     name='mlp_fc2')(h)
        return h, residual


class HyenaDNABackbone(nn.Module):
    """Embedding -> n_layer HyenaBlocks -> final norm.
    Returns (B, L, d_model) fp32 hidden states."""
    cfg: HyenaDNAConfig

    @nn.compact
    def __call__(self, input_ids, *, inputs_embeds=None,
                 train: bool = False):
        cfg = self.cfg
        embed = nn.Embed(
            cfg.padded_vocab_size, cfg.d_model,
            embedding_init=nn.initializers.normal(
                cfg.initializer_range),
            name='word_embeddings')
        if inputs_embeds is not None:
            h = inputs_embeds.astype(cfg.compute_dtype)
        elif input_ids.ndim == 2:
            h = embed(input_ids).astype(cfg.compute_dtype)
        else:  # one-hot / relaxed inputs (guidance API symmetry)
            h = (input_ids.astype(jnp.float32)
                 @ embed.embedding[:input_ids.shape[-1]]
                 ).astype(cfg.compute_dtype)
        h = nn.Dropout(cfg.embed_dropout,
                       deterministic=not train)(h)
        residual = None
        for i in range(cfg.n_layer):
            h, residual = HyenaBlock(cfg, name=f'layer_{i}')(
                h, residual, train=train)
        drop = nn.Dropout(cfg.resid_dropout, deterministic=not train)
        residual = drop(h).astype(jnp.float32) + residual
        return nn.LayerNorm(epsilon=cfg.layer_norm_epsilon,
                            dtype=jnp.float32, name='ln_f')(residual)


class HyenaDNAClassifier(nn.Module):
    """Sequence classifier: backbone -> pooling -> bias-free `score`
    head (the HF `HyenaDNAForSequenceClassification` layout; its
    GPT-2-style last-valid-token selection == pooling='last' for the
    pad-free Species10 tokenization).  Signature follows the
    `make_classifier_apply` protocol; `sigma` is accepted and ignored —
    the reference's `is_eval_classifier` path calls the model on clean
    tokens with no noise conditioning (classifier.py:300-308)."""
    cfg: HyenaDNAConfig
    num_classes: int = 2
    pooling: str = 'last'

    @nn.compact
    def __call__(self, indices_or_one_hots, sigma=None, x_emb=None,
                 attention_mask=None, *, train: bool = False):
        x = HyenaDNABackbone(self.cfg, name='backbone')(
            indices_or_one_hots, inputs_embeds=x_emb, train=train)
        if self.pooling == 'last':
            x = x[:, -1]
        elif self.pooling == 'mean':
            x = x.mean(axis=1)
        elif self.pooling == 'max':
            x = x.max(axis=1)
        elif self.pooling == 'cls':
            x = x[:, 0]
        elif self.pooling == 'attention_mean':
            m = attention_mask[..., None].astype(x.dtype)
            x = (x * m).sum(axis=1) / (m.sum(axis=1) + 1e-15)
        elif self.pooling == 'no_pooling':
            pass
        else:
            raise NotImplementedError(
                f'`{self.pooling}` method not implemented.')
        return nn.Dense(self.num_classes, use_bias=False,
                        dtype=jnp.float32, name='score')(x)


class HyenaDNALMHead(nn.Module):
    """Backbone + untied LM head (HF `HyenaDNAForCausalLM` layout) —
    completes the hub surface for real-weight round-trips."""
    cfg: HyenaDNAConfig

    @nn.compact
    def __call__(self, input_ids, *, train: bool = False):
        x = HyenaDNABackbone(self.cfg, name='backbone')(
            input_ids, train=train)
        return nn.Dense(self.cfg.padded_vocab_size, use_bias=False,
                        dtype=jnp.float32, name='lm_head')(x)
