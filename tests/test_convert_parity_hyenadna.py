"""Logit-parity: HyenaDNA math (torch mirror of the public LongSafari
HF remote code the reference loads, classifier.py:166-178) vs our flax
HyenaDNAClassifier loaded with converted weights.

The mirror re-executes the published architecture in torch — padded
vocab embedding -> carried-residual pre-norm blocks -> Hyena operator
(in_proj -> short depthwise conv -> implicit filter [pos features ->
sin MLP -> exponential modulation] -> gated fftconv -> out_proj) ->
tanh-GELU MLP -> ln_f -> bias-free score head on the last token — on a
synthetic HF-format state dict, and checks our model under
`convert_hyenadna_params` matches to < 1e-3 (the BASELINE.json parity
bar)."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from ddg_tpu.convert import (convert_hyenadna_params,
                             make_reference_hyenadna_state_dict)
from ddg_tpu.models.hyenadna import (HyenaDNAClassifier,
                                     HyenaDNAConfig)

D_MODEL, N_LAYER, D_INNER = 16, 2, 64
VOCAB, EMB_DIM, FILTER_ORDER, NUM_INNER = 12, 5, 8, 2
MAX_SEQ, B, L = 64, 2, 32
NUM_LABELS = 3


def _pos_emb(L, seq_len, emb_dim):
    t = torch.linspace(0, 1, seq_len)[None, :, None]
    bands = (emb_dim - 1) // 2
    t_rescaled = torch.linspace(0, seq_len - 1, seq_len)[None, :, None]
    w = 2 * math.pi * t_rescaled / seq_len
    f = torch.linspace(1e-4, bands - 1, bands)[None, None]
    z = torch.exp(-1j * f * w)
    z = torch.cat([t, z.real, z.imag], dim=-1)
    return z[:, :L], t[:, :L]


def _filter(s, p, L):
    """Implicit filter k (L, d_model) + modulation."""
    z, t = _pos_emb(L, MAX_SEQ, EMB_DIM)
    h = z @ s[p + 'implicit_filter.0.weight'].T \
        + s[p + 'implicit_filter.0.bias']
    h = torch.sin(s[p + 'implicit_filter.1.freq'] * h)
    for j in range(NUM_INNER):
        h = h @ s[p + f'implicit_filter.{2 + 2 * j}.weight'].T \
            + s[p + f'implicit_filter.{2 + 2 * j}.bias']
        h = torch.sin(s[p + f'implicit_filter.{3 + 2 * j}.freq'] * h)
    h = h @ s[p + f'implicit_filter.{2 * NUM_INNER + 2}.weight'].T
    # exponential modulation
    target, fast, slow = 1e-2, 0.3, 1.5
    max_decay = math.log(target) / fast
    min_decay = math.log(target) / slow
    deltas = torch.linspace(min_decay, max_decay, D_MODEL)[None, None]
    h = h * torch.exp(-t * deltas.abs())
    return h[0]                                       # (L, d_model)


def _fftconv(u, k, D):
    seqlen = u.shape[-1]
    fft_size = 2 * seqlen
    k_f = torch.fft.rfft(k, n=fft_size) / fft_size
    u_f = torch.fft.rfft(u.to(dtype=k.dtype), n=fft_size)
    y = torch.fft.irfft(u_f * k_f, n=fft_size,
                        norm='forward')[..., :seqlen]
    return (y + u * D.unsqueeze(-1)).to(dtype=u.dtype)


def _mixer(s, p, u):
    """HyenaOperator forward (order 2), u (B, L, d)."""
    L = u.shape[-2]
    u = u @ s[p + 'in_proj.weight'].T + s[p + 'in_proj.bias']
    u = u.transpose(1, 2)                              # (B, 3d, L)
    uc = F.conv1d(u, s[p + 'short_filter.weight'],
                  s[p + 'short_filter.bias'], padding=2,
                  groups=3 * D_MODEL)[..., :L]
    x1, x2, v = uc.split(D_MODEL, dim=1)
    k = _filter(s, p + 'filter_fn.', L)                # (L, d)
    k = k.T                                            # (d, L)
    bias = s[p + 'filter_fn.bias']                     # (d,)
    v = v * x2
    v = _fftconv(v, k, bias)
    y = (v * x1).transpose(1, 2)
    return y @ s[p + 'out_proj.weight'].T + s[p + 'out_proj.bias']


def _mirror_forward(sd, x):
    s = {k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()}
    bb = 'hyena.backbone.'
    h = s[bb + 'embeddings.word_embeddings.weight'][x]
    residual = None
    for i in range(N_LAYER):
        p = bb + f'layers.{i}.'
        residual = h + residual if residual is not None else h
        h = F.layer_norm(residual, (D_MODEL,), s[p + 'norm1.weight'],
                         s[p + 'norm1.bias'])
        h = _mixer(s, p + 'mixer.', h)
        residual = h + residual
        h = F.layer_norm(residual, (D_MODEL,), s[p + 'norm2.weight'],
                         s[p + 'norm2.bias'])
        h = h @ s[p + 'mlp.fc1.weight'].T + s[p + 'mlp.fc1.bias']
        h = F.gelu(h, approximate='tanh')
        h = h @ s[p + 'mlp.fc2.weight'].T + s[p + 'mlp.fc2.bias']
    residual = h + residual
    h = F.layer_norm(residual, (D_MODEL,), s[bb + 'ln_f.weight'],
                     s[bb + 'ln_f.bias'])
    logits = h @ s['score.weight'].T                   # (B, L, C)
    return logits[:, -1].detach().numpy()              # last-token


def test_hyenadna_logit_parity():
    rng = np.random.RandomState(0)
    sd = make_reference_hyenadna_state_dict(
        rng, d_model=D_MODEL, n_layer=N_LAYER, d_inner=D_INNER,
        vocab=VOCAB, emb_dim=EMB_DIM, filter_order=FILTER_ORDER,
        num_inner_mlps=NUM_INNER, num_labels=NUM_LABELS)
    x_np = rng.randint(0, VOCAB, size=(B, L))

    ref = _mirror_forward(sd, torch.from_numpy(x_np))

    cfg = HyenaDNAConfig(
        d_model=D_MODEL, n_layer=N_LAYER, d_inner=D_INNER,
        vocab_size=VOCAB, max_seq_len=MAX_SEQ, emb_dim=EMB_DIM,
        filter_order=FILTER_ORDER, num_inner_mlps=NUM_INNER,
        compute_dtype=jnp.float32)
    model = HyenaDNAClassifier(cfg, num_classes=NUM_LABELS,
                               pooling='last')
    params = convert_hyenadna_params(sd, n_layer=N_LAYER,
                                     num_inner_mlps=NUM_INNER)
    ours = model.apply({'params': jax.tree.map(jnp.asarray, params)},
                       jnp.asarray(x_np))
    np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-3,
                               rtol=1e-3)


def test_hyenadna_converted_tree_matches_init_shapes():
    """Converted param tree is structurally identical to model.init's
    (so real LongSafari checkpoints load with no shape surprises)."""
    rng = np.random.RandomState(1)
    sd = make_reference_hyenadna_state_dict(
        rng, d_model=D_MODEL, n_layer=N_LAYER, d_inner=D_INNER,
        vocab=VOCAB, emb_dim=EMB_DIM, filter_order=FILTER_ORDER,
        num_inner_mlps=NUM_INNER, num_labels=NUM_LABELS)
    cfg = HyenaDNAConfig(
        d_model=D_MODEL, n_layer=N_LAYER, d_inner=D_INNER,
        vocab_size=VOCAB, max_seq_len=MAX_SEQ, emb_dim=EMB_DIM,
        filter_order=FILTER_ORDER, num_inner_mlps=NUM_INNER)
    model = HyenaDNAClassifier(cfg, num_classes=NUM_LABELS)
    init = model.init(jax.random.PRNGKey(0),
                      jnp.zeros((1, L), jnp.int32))['params']
    conv = convert_hyenadna_params(sd, n_layer=N_LAYER,
                                   num_inner_mlps=NUM_INNER)
    init_shapes = jax.tree.map(lambda a: a.shape, init)
    conv_shapes = jax.tree.map(lambda a: tuple(a.shape), conv)
    assert jax.tree_util.tree_structure(init_shapes) \
        == jax.tree_util.tree_structure(conv_shapes)
    assert jax.tree.leaves(init_shapes) == jax.tree.leaves(conv_shapes)
