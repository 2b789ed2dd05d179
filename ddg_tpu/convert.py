"""Checkpoint conversion: reference torch checkpoints -> ddg_tpu params.

Enables 1e-3 logit-parity checks against pretrained reference weights
(kuleshov-group/udlm-lm1b etc., reference README.md:231-236) and lets
users of the reference migrate trained models.

Supported sources:
  * Lightning .ckpt files (state under 'state_dict' with 'backbone.'
    prefixes, plus 'ema' shadow params — reference diffusion.py:208-213);
  * plain torch state dicts / HF safetensors of the reference DIT.

Name mapping (reference models/dit.py -> ddg_tpu/models/dit.py):
  vocab_embed.embedding                  -> vocab_embed
  sigma_map.mlp.{0,2}                    -> sigma_map/mlp{1,2}
  cond_map.embedding_table               -> cond_map/embedding
  blocks.N.{norm1,norm2}.weight          -> block_N/{norm1,norm2}/weight
  blocks.N.attn_qkv                      -> block_N/attn_qkv
  blocks.N.attn_out                      -> block_N/attn_out
  blocks.N.mlp.{0,2}                     -> block_N/{mlp_in,mlp_out}
  blocks.N.adaLN_modulation              -> block_N/adaLN_modulation
  output_layer.norm_final.weight         -> norm_final/weight
  output_layer.linear                    -> output_linear
  output_layer.adaLN_modulation          -> final_adaLN
Torch Linear weights are (out, in) -> flax Dense kernels (in, out): transposed.
"""

from __future__ import annotations

import re
from typing import Dict

import numpy as np


def load_torch_state_dict(path: str, *, use_ema: bool = False) -> Dict:
    """Load a reference checkpoint into a flat {name: np.ndarray}."""
    import torch
    ckpt = torch.load(path, map_location='cpu', weights_only=False)
    if use_ema and isinstance(ckpt, dict) and 'ema' in ckpt:
        # EMA shadow params are stored as an ordered list aligned with
        # backbone.parameters() + noise.parameters()
        # (reference models/ema.py:96-101); map them onto the
        # state-dict param names in order.
        state = ckpt['state_dict']
        shadow = ckpt['ema']['shadow_params']
        param_names = [k for k in state
                       if k.startswith('backbone.')]
        assert len(shadow) >= len(param_names) - 1
        out = {}
        for name, val in zip(param_names, shadow):
            out[name] = val.float().numpy()
        return out
    state = ckpt.get('state_dict', ckpt)
    return {k: v.float().numpy() for k, v in state.items()
            if hasattr(v, 'numpy')}


def load_hf_udlm_state_dict(model_dir: str) -> Dict:
    """Load a reference HF-export UDLM checkpoint directory
    (kuleshov-group/udlm-* layout; reference models/hf/modeling_udlm.py
    wraps the DIT as `backbone.*`, so the inner names match
    `convert_dit_params` after prefix stripping)."""
    import os
    st_path = os.path.join(model_dir, 'model.safetensors')
    if os.path.exists(st_path):
        from safetensors.numpy import load_file
        return dict(load_file(st_path))
    bin_path = os.path.join(model_dir, 'pytorch_model.bin')
    if os.path.exists(bin_path):
        import torch
        sd = torch.load(bin_path, map_location='cpu',
                        weights_only=True)
        return {k: v.float().numpy() for k, v in sd.items()}
    raise FileNotFoundError(
        f'No model.safetensors or pytorch_model.bin in {model_dir}')


def _strip_prefix(state: Dict) -> Dict:
    out = {}
    for k, v in state.items():
        k = re.sub(r'^(model\.|backbone\.)', '', k)
        out[k] = v
    return out


def convert_dit_params(state: Dict, *, n_blocks: int) -> Dict:
    """Reference DIT state dict -> ddg_tpu DIT params pytree."""
    s = _strip_prefix(state)

    def T(x):
        return np.ascontiguousarray(x.T)

    params: Dict = {}
    params['vocab_embed'] = s['vocab_embed.embedding']
    if 'sigma_map.mlp.0.weight' in s:
        params['sigma_map'] = {
            'mlp1': {'kernel': T(s['sigma_map.mlp.0.weight']),
                     'bias': s['sigma_map.mlp.0.bias']},
            'mlp2': {'kernel': T(s['sigma_map.mlp.2.weight']),
                     'bias': s['sigma_map.mlp.2.bias']},
        }
    if 'cond_map.embedding_table.weight' in s:
        params['cond_map'] = {
            'embedding': s['cond_map.embedding_table.weight']}

    for i in range(n_blocks):
        p = f'blocks.{i}.'
        block = {
            'norm1': {'weight': s[p + 'norm1.weight']},
            'norm2': {'weight': s[p + 'norm2.weight']},
            'attn_qkv': {'kernel': T(s[p + 'attn_qkv.weight'])},
            'attn_out': {'kernel': T(s[p + 'attn_out.weight'])},
            'mlp_in': {'kernel': T(s[p + 'mlp.0.weight']),
                       'bias': s[p + 'mlp.0.bias']},
            'mlp_out': {'kernel': T(s[p + 'mlp.2.weight']),
                        'bias': s[p + 'mlp.2.bias']},
        }
        if p + 'adaLN_modulation.weight' in s:
            block['adaLN_modulation'] = {
                'kernel': T(s[p + 'adaLN_modulation.weight']),
                'bias': s[p + 'adaLN_modulation.bias']}
        params[f'block_{i}'] = block

    params['norm_final'] = {
        'weight': s['output_layer.norm_final.weight']}
    params['output_linear'] = {
        'kernel': T(s['output_layer.linear.weight']),
        'bias': s['output_layer.linear.bias']}
    if 'output_layer.adaLN_modulation.weight' in s:
        params['final_adaLN'] = {
            'kernel': T(s['output_layer.adaLN_modulation.weight']),
            'bias': s['output_layer.adaLN_modulation.bias']}
    return params


def make_reference_dit_state_dict(rng: np.random.RandomState, *,
                                  hidden: int, cond_dim: int,
                                  n_blocks: int, vocab: int,
                                  with_cond: bool = False) -> Dict:
    """Synthetic state dict with the reference's names/shapes — used to
    test the converter offline (no reference weights downloadable)."""
    s = {}
    r = lambda *shape: rng.randn(*shape).astype(np.float32) * 0.02
    s['vocab_embed.embedding'] = r(vocab, hidden)
    s['sigma_map.mlp.0.weight'] = r(cond_dim, 256)
    s['sigma_map.mlp.0.bias'] = r(cond_dim)
    s['sigma_map.mlp.2.weight'] = r(cond_dim, cond_dim)
    s['sigma_map.mlp.2.bias'] = r(cond_dim)
    if with_cond:
        s['cond_map.embedding_table.weight'] = r(3, cond_dim)
    for i in range(n_blocks):
        p = f'blocks.{i}.'
        s[p + 'norm1.weight'] = r(hidden) + 1
        s[p + 'norm2.weight'] = r(hidden) + 1
        s[p + 'attn_qkv.weight'] = r(3 * hidden, hidden)
        s[p + 'attn_out.weight'] = r(hidden, hidden)
        s[p + 'mlp.0.weight'] = r(4 * hidden, hidden)
        s[p + 'mlp.0.bias'] = r(4 * hidden)
        s[p + 'mlp.2.weight'] = r(hidden, 4 * hidden)
        s[p + 'mlp.2.bias'] = r(hidden)
        s[p + 'adaLN_modulation.weight'] = r(6 * hidden, cond_dim)
        s[p + 'adaLN_modulation.bias'] = r(6 * hidden)
    s['output_layer.norm_final.weight'] = r(hidden) + 1
    s['output_layer.linear.weight'] = r(vocab, hidden)
    s['output_layer.linear.bias'] = r(vocab)
    s['output_layer.adaLN_modulation.weight'] = r(2 * hidden, cond_dim)
    s['output_layer.adaLN_modulation.bias'] = r(2 * hidden)
    return s


def export_dit_params(params: Dict, *, n_blocks: int) -> Dict:
    """Inverse of `convert_dit_params`: ddg_tpu DIT params -> a state
    dict in the reference's naming (loadable by the reference DIT /
    HF-export UDLM after prefixing) — migration in both directions."""
    def T(x):
        return np.ascontiguousarray(np.asarray(x).T)

    def A(x):
        return np.asarray(x)

    s: Dict = {}
    s['vocab_embed.embedding'] = A(params['vocab_embed'])
    if 'sigma_map' in params:
        sm = params['sigma_map']
        s['sigma_map.mlp.0.weight'] = T(sm['mlp1']['kernel'])
        s['sigma_map.mlp.0.bias'] = A(sm['mlp1']['bias'])
        s['sigma_map.mlp.2.weight'] = T(sm['mlp2']['kernel'])
        s['sigma_map.mlp.2.bias'] = A(sm['mlp2']['bias'])
    if 'cond_map' in params:
        s['cond_map.embedding_table.weight'] = A(
            params['cond_map']['embedding'])
    for i in range(n_blocks):
        b = params[f'block_{i}']
        p = f'blocks.{i}.'
        s[p + 'norm1.weight'] = A(b['norm1']['weight'])
        s[p + 'norm2.weight'] = A(b['norm2']['weight'])
        s[p + 'attn_qkv.weight'] = T(b['attn_qkv']['kernel'])
        s[p + 'attn_out.weight'] = T(b['attn_out']['kernel'])
        s[p + 'mlp.0.weight'] = T(b['mlp_in']['kernel'])
        s[p + 'mlp.0.bias'] = A(b['mlp_in']['bias'])
        s[p + 'mlp.2.weight'] = T(b['mlp_out']['kernel'])
        s[p + 'mlp.2.bias'] = A(b['mlp_out']['bias'])
        if 'adaLN_modulation' in b:
            s[p + 'adaLN_modulation.weight'] = T(
                b['adaLN_modulation']['kernel'])
            s[p + 'adaLN_modulation.bias'] = A(
                b['adaLN_modulation']['bias'])
    s['output_layer.norm_final.weight'] = A(
        params['norm_final']['weight'])
    s['output_layer.linear.weight'] = T(
        params['output_linear']['kernel'])
    s['output_layer.linear.bias'] = A(params['output_linear']['bias'])
    if 'final_adaLN' in params:
        s['output_layer.adaLN_modulation.weight'] = T(
            params['final_adaLN']['kernel'])
        s['output_layer.adaLN_modulation.bias'] = A(
            params['final_adaLN']['bias'])
    return s


# ---------------------------------------------------------------------------
# DiMamba (reference models/dimamba.py: DiMamba -> BiMambaForMaskedLM ->
# BiMamba -> BiMambaMixerModel; key layout
# model.bimamba.backbone.{embeddings,layers.N,norm_f,adaLN_modulation_final}
# + model.lm_head + top-level sigma_map/cond_map)
# ---------------------------------------------------------------------------

def _mamba_core(s: Dict, p: str) -> Dict:
    """One direction's Mamba core (conv1d + x_proj + dt_proj + A/D;
    reference Mamba, dimamba.py:52-249)."""
    def T(x):
        return np.ascontiguousarray(np.asarray(x).T)

    return {
        # torch Conv1d weight (d, 1, k) -> lax 'LIO' (k, 1, d)
        'conv1d_kernel': np.ascontiguousarray(
            np.transpose(s[p + 'conv1d.weight'], (2, 1, 0))),
        'conv1d_bias': s[p + 'conv1d.bias'],
        'x_proj': {'kernel': T(s[p + 'x_proj.weight'])},
        'dt_proj': {'kernel': T(s[p + 'dt_proj.weight']),
                    'bias': s[p + 'dt_proj.bias']},
        'A_log': s[p + 'A_log'],
        'D': s[p + 'D'],
    }


def convert_dimamba_params(state: Dict, *, n_blocks: int,
                           bidirectional: bool = True,
                           weight_tie: bool = True) -> Dict:
    """Reference DiMamba state dict -> ddg_tpu DiMamba params pytree.

    Tying parity (reference BiMambaWrapper, dimamba.py:591-623): in/out
    projections are shared across directions when weight_tie; each
    direction keeps its own conv/x_proj/dt_proj/A/D core.
    """
    # Strip only Lightning's `backbone.` wrapper — `model.` is a real
    # DiMamba submodule (DiMamba.model = BiMambaForMaskedLM).
    s = {re.sub(r'^backbone\.', '', k): v for k, v in state.items()}

    def T(x):
        return np.ascontiguousarray(np.asarray(x).T)

    bb = 'model.bimamba.backbone.'
    params: Dict = {}
    params['word_embeddings'] = {
        'embedding': s[bb + 'embeddings.word_embeddings.weight']}
    if 'sigma_map.mlp.0.weight' in s:
        params['sigma_map'] = {
            'mlp1': {'kernel': T(s['sigma_map.mlp.0.weight']),
                     'bias': s['sigma_map.mlp.0.bias']},
            'mlp2': {'kernel': T(s['sigma_map.mlp.2.weight']),
                     'bias': s['sigma_map.mlp.2.bias']},
        }
    if 'cond_map.embedding_table.weight' in s:
        params['cond_map'] = {
            'embedding': s['cond_map.embedding_table.weight']}

    for i in range(n_blocks):
        p = bb + f'layers.{i}.'
        mixer = {
            'in_proj_fwd': {
                'kernel': T(s[p + 'mixer.mamba_fwd.in_proj.weight'])},
            'out_proj_fwd': {
                'kernel': T(s[p + 'mixer.mamba_fwd.out_proj.weight'])},
            'core_fwd': _mamba_core(s, p + 'mixer.mamba_fwd.'),
        }
        if bidirectional:
            mixer['core_rev'] = _mamba_core(s, p + 'mixer.mamba_rev.')
            if not weight_tie:
                mixer['in_proj_rev'] = {'kernel': T(
                    s[p + 'mixer.mamba_rev.in_proj.weight'])}
                mixer['out_proj_rev'] = {'kernel': T(
                    s[p + 'mixer.mamba_rev.out_proj.weight'])}
        block = {
            'norm': {'scale': s[p + 'norm.weight'],
                     'bias': s[p + 'norm.bias']},
            'mixer': mixer,
        }
        if p + 'adaLN_modulation.weight' in s:
            block['adaLN_modulation'] = {
                'kernel': T(s[p + 'adaLN_modulation.weight']),
                'bias': s[p + 'adaLN_modulation.bias']}
        params[f'block_{i}'] = block

    params['norm_f'] = {'scale': s[bb + 'norm_f.weight'],
                        'bias': s[bb + 'norm_f.bias']}
    if bb + 'adaLN_modulation_final.weight' in s:
        params['adaLN_final'] = {
            'kernel': T(s[bb + 'adaLN_modulation_final.weight']),
            'bias': s[bb + 'adaLN_modulation_final.bias']}
    if 'model.lm_head.weight' in s:
        w = s['model.lm_head.weight']
        params['lm_head'] = {'kernel': T(w),
                             'bias': np.zeros(w.shape[0], np.float32)}
    return params


def make_reference_dimamba_state_dict(rng: 'np.random.RandomState', *,
                                      hidden: int, cond_dim: int,
                                      n_blocks: int, vocab: int,
                                      d_state: int = 16,
                                      d_conv: int = 4,
                                      expand: int = 2,
                                      with_cond: bool = False,
                                      bidirectional: bool = True,
                                      weight_tie: bool = True) -> Dict:
    """Synthetic state dict with the reference DiMamba's names/shapes
    (models/dimamba.py), for offline converter/parity tests."""
    import math as _math
    d_inner = expand * hidden
    dt_rank = _math.ceil(hidden / 16)
    r = lambda *shape: rng.randn(*shape).astype(np.float32) * 0.05
    s: Dict = {}
    s['sigma_map.mlp.0.weight'] = r(cond_dim, 256)
    s['sigma_map.mlp.0.bias'] = r(cond_dim)
    s['sigma_map.mlp.2.weight'] = r(cond_dim, cond_dim)
    s['sigma_map.mlp.2.bias'] = r(cond_dim)
    if with_cond:
        s['cond_map.embedding_table.weight'] = r(3, cond_dim)
    bb = 'model.bimamba.backbone.'
    s[bb + 'embeddings.word_embeddings.weight'] = r(vocab, hidden)

    def core(p):
        s[p + 'conv1d.weight'] = r(d_inner, 1, d_conv)
        s[p + 'conv1d.bias'] = r(d_inner)
        s[p + 'x_proj.weight'] = r(dt_rank + 2 * d_state, d_inner)
        s[p + 'dt_proj.weight'] = r(d_inner, dt_rank)
        s[p + 'dt_proj.bias'] = (
            rng.rand(d_inner).astype(np.float32) * 2 - 4)
        s[p + 'A_log'] = np.log(np.broadcast_to(
            np.arange(1, d_state + 1, dtype=np.float32),
            (d_inner, d_state))).copy()
        s[p + 'D'] = np.ones(d_inner, np.float32) + r(d_inner)

    for i in range(n_blocks):
        p = bb + f'layers.{i}.'
        s[p + 'norm.weight'] = r(hidden) + 1
        s[p + 'norm.bias'] = r(hidden)
        s[p + 'adaLN_modulation.weight'] = r(3 * hidden, cond_dim)
        s[p + 'adaLN_modulation.bias'] = r(3 * hidden)
        s[p + 'mixer.mamba_fwd.in_proj.weight'] = r(2 * d_inner, hidden)
        s[p + 'mixer.mamba_fwd.out_proj.weight'] = r(hidden, d_inner)
        core(p + 'mixer.mamba_fwd.')
        if bidirectional:
            core(p + 'mixer.mamba_rev.')
            if weight_tie:
                s[p + 'mixer.mamba_rev.in_proj.weight'] = \
                    s[p + 'mixer.mamba_fwd.in_proj.weight']
                s[p + 'mixer.mamba_rev.out_proj.weight'] = \
                    s[p + 'mixer.mamba_fwd.out_proj.weight']
            else:
                s[p + 'mixer.mamba_rev.in_proj.weight'] = r(
                    2 * d_inner, hidden)
                s[p + 'mixer.mamba_rev.out_proj.weight'] = r(
                    hidden, d_inner)
    s[bb + 'norm_f.weight'] = r(hidden) + 1
    s[bb + 'norm_f.bias'] = r(hidden)
    s[bb + 'adaLN_modulation_final.weight'] = r(2 * hidden, cond_dim)
    s[bb + 'adaLN_modulation_final.bias'] = r(2 * hidden)
    s['model.lm_head.weight'] = r(vocab, hidden)
    return s


# ---------------------------------------------------------------------------
# HF export/import (reference models/hf: UDLM(PreTrainedModel) wrapping
# a DITBackbone under the `backbone.` prefix, modeling_udlm.py:438-487;
# config keys per configuration_udlm.py:8-36). The exported folder
# matches the kuleshov-group/udlm-* hub layout, so the reference's
# AutoModelForMaskedLM path (README.md:240-250) loads it with the hub
# repo's modeling code.
# ---------------------------------------------------------------------------

def export_hf_udlm(params: Dict, out_dir: str, *, vocab_size: int,
                   model_length: int, hidden_dim: int, cond_dim: int,
                   n_blocks: int, n_heads: int, dropout: float = 0.1,
                   time_conditioning: bool = True,
                   num_classes=None) -> str:
    """ddg_tpu DIT params -> HF UDLM folder (config.json +
    pytorch_model.bin). Returns out_dir."""
    import json
    import os

    import torch

    sd = export_dit_params(params, n_blocks=n_blocks)
    sd = {'backbone.' + k: torch.from_numpy(
        np.ascontiguousarray(np.asarray(v, np.float32)))
        for k, v in sd.items()}
    os.makedirs(out_dir, exist_ok=True)
    # Ship the remote-code files the auto_map points at (reference
    # models/hf/modeling_udlm.py + configuration_udlm.py travel with
    # the published checkpoints the same way), so the folder loads
    # standalone via AutoModelForMaskedLM(trust_remote_code=True).
    import shutil

    import ddg_tpu.hf_udlm as _hf_pkg
    pkg_dir = os.path.dirname(_hf_pkg.__file__)
    for fname in ('configuration_udlm.py', 'modeling_udlm.py'):
        shutil.copyfile(os.path.join(pkg_dir, fname),
                        os.path.join(out_dir, fname))
    config = {
        'model_type': 'udlm',
        'architectures': ['UDLM'],
        'auto_map': {
            'AutoConfig': 'configuration_udlm.UDLMConfig',
            'AutoModelForMaskedLM': 'modeling_udlm.UDLM'},
        'vocab_size': int(vocab_size),
        'model_length': int(model_length),
        'hidden_dim': int(hidden_dim),
        'cond_dim': int(cond_dim),
        'n_blocks': int(n_blocks),
        'n_heads': int(n_heads),
        'dropout': float(dropout),
        'time_conditioning': bool(time_conditioning),
        'cfg': num_classes is not None,
        'cfg_num_classes': int(num_classes)
        if num_classes is not None else -1,
    }
    with open(os.path.join(out_dir, 'config.json'), 'w') as f:
        json.dump(config, f, indent=2)
    torch.save(sd, os.path.join(out_dir, 'pytorch_model.bin'))
    return out_dir


def import_hf_udlm(model_dir: str):
    """HF UDLM folder -> (ddg_tpu DIT params pytree, config dict)."""
    import json
    import os

    import torch

    with open(os.path.join(model_dir, 'config.json')) as f:
        config = json.load(f)
    sd = torch.load(os.path.join(model_dir, 'pytorch_model.bin'),
                    map_location='cpu', weights_only=True)
    sd = {re.sub(r'^backbone\.', '', k): v.numpy()
          for k, v in sd.items()}
    params = convert_dit_params(sd, n_blocks=int(config['n_blocks']))
    return params, config


def torch_mirror_dit_forward(state: Dict, x_np, sigma_np, cond_np=None,
                             *, n_heads: int):
    """Reference DIT forward re-executed in torch fp32 on a
    reference-format state dict (mirrors
    /root/reference/models/dit.py:131-366,426-468; the reference module
    itself cannot be imported here — hard flash-attn dependency,
    dit.py:4-5). Works on SYNTHETIC state dicts today and on the REAL
    kuleshov-group/udlm-* checkpoints unchanged the day HF assets
    appear (scripts/verify_real_weight_parity.py): the real-weight
    parity bar of BASELINE.json.

    Shapes are inferred from the state dict. Returns logits (B, L, V)
    as numpy.
    """
    import math

    import torch
    import torch.nn.functional as F

    s = {k: torch.tensor(np.asarray(v)) for k, v in state.items()}
    vocab, hidden = s['vocab_embed.embedding'].shape
    n_blocks = 1 + max(int(k.split('.')[1]) for k in s
                       if k.startswith('blocks.'))
    x = torch.tensor(np.asarray(x_np))
    sigma = torch.tensor(np.asarray(sigma_np))
    B, L = x.shape

    def layer_norm(h, w):
        return F.layer_norm(h.float(), [h.shape[-1]]) * w[None, None, :]

    def modulate(h, shift, scale):
        return h * (1 + scale.unsqueeze(1)) + shift.unsqueeze(1)

    # timestep embedding (dit.py:169-199)
    half = 256 // 2
    freqs = torch.exp(-math.log(10000) * torch.arange(half) / half)
    args = sigma[:, None].float() * freqs[None]
    t_freq = torch.cat([torch.cos(args), torch.sin(args)], dim=-1)
    c = t_freq @ s['sigma_map.mlp.0.weight'].T + s['sigma_map.mlp.0.bias']
    c = F.silu(c)
    c = c @ s['sigma_map.mlp.2.weight'].T + s['sigma_map.mlp.2.bias']
    c = F.silu(c)
    if cond_np is not None:
        # c += silu(cond_map(cond)) (dit.py:437-446)
        emb = s['cond_map.embedding_table.weight'][
            torch.tensor(np.asarray(cond_np))]
        c = c + F.silu(emb)

    h = s['vocab_embed.embedding'][x]

    # RoPE tables (dit.py:82-121)
    head_dim = hidden // n_heads
    inv_freq = 1.0 / (10000 ** (torch.arange(0, head_dim, 2).float()
                                / head_dim))
    t = torch.arange(L).float()
    f = torch.einsum('i,j->ij', t, inv_freq)
    cos, sin = f.cos(), f.sin()

    def rope(q):  # (B, L, H, D)
        d2 = q.shape[-1] // 2
        q1, q2 = q[..., :d2], q[..., d2:]
        c_ = cos[None, :, None, :]
        s_ = sin[None, :, None, :]
        return torch.cat([q1 * c_ - q2 * s_, q2 * c_ + q1 * s_],
                         dim=-1)

    for i in range(n_blocks):
        p = f'blocks.{i}.'
        mod = c @ s[p + 'adaLN_modulation.weight'].T \
            + s[p + 'adaLN_modulation.bias']
        (sh_msa, sc_msa, g_msa, sh_mlp, sc_mlp, g_mlp) = mod.chunk(6, -1)
        skip = h
        hh = modulate(layer_norm(h, s[p + 'norm1.weight']), sh_msa,
                      sc_msa)
        qkv = hh @ s[p + 'attn_qkv.weight'].T
        qkv = qkv.view(B, L, 3, n_heads, head_dim)
        q, k, v = qkv.unbind(2)
        q, k = rope(q), rope(k)
        attn = F.scaled_dot_product_attention(
            q.transpose(1, 2), k.transpose(1, 2),
            v.transpose(1, 2)).transpose(1, 2).reshape(B, L, hidden)
        h = skip + g_msa.unsqueeze(1) * (attn
                                         @ s[p + 'attn_out.weight'].T)
        skip = h
        hh = modulate(layer_norm(h, s[p + 'norm2.weight']), sh_mlp,
                      sc_mlp)
        hh = hh @ s[p + 'mlp.0.weight'].T + s[p + 'mlp.0.bias']
        hh = F.gelu(hh, approximate='tanh')
        hh = hh @ s[p + 'mlp.2.weight'].T + s[p + 'mlp.2.bias']
        h = skip + g_mlp.unsqueeze(1) * hh

    mod = c @ s['output_layer.adaLN_modulation.weight'].T \
        + s['output_layer.adaLN_modulation.bias']
    shift, scale = mod.chunk(2, -1)
    h = modulate(layer_norm(h, s['output_layer.norm_final.weight']),
                 shift, scale)
    out = h @ s['output_layer.linear.weight'].T \
        + s['output_layer.linear.bias']
    return out.detach().numpy()


# ---------------------------------------------------------------------
# HyenaDNA (LongSafari hub layout; reference loads this as HF remote
# code — classifier.py:166-178, ten_species_eval.py:468-478)
# ---------------------------------------------------------------------

def make_reference_hyenadna_state_dict(
        rng: 'np.random.RandomState', *, d_model: int, n_layer: int,
        d_inner: int, vocab: int = 12, emb_dim: int = 5,
        filter_order: int = 16, num_inner_mlps: int = 2,
        short_filter_order: int = 3, num_labels: int = 2,
        activation_freq: float = 10.0,
        pad_vocab_size_multiple: int = 8) -> Dict:
    """Synthetic state dict in the HF HyenaDNAForSequenceClassification
    layout (LongSafari/hyenadna-*-hf remote code), for offline
    converter/parity tests; flips to real weights with no code change
    (scripts/fetch_and_verify_parity.sh)."""
    m = pad_vocab_size_multiple
    padded_vocab = ((vocab + m - 1) // m) * m
    d_filter = d_model  # order 2: d_model * (order - 1)
    r = lambda *shape: rng.randn(*shape).astype(np.float32) * 0.05
    s: Dict = {}
    bb = 'hyena.backbone.'
    s[bb + 'embeddings.word_embeddings.weight'] = r(padded_vocab,
                                                    d_model)
    for i in range(n_layer):
        p = bb + f'layers.{i}.'
        s[p + 'norm1.weight'] = r(d_model) + 1
        s[p + 'norm1.bias'] = r(d_model)
        s[p + 'norm2.weight'] = r(d_model) + 1
        s[p + 'norm2.bias'] = r(d_model)
        mx = p + 'mixer.'
        inner = 3 * d_model
        s[mx + 'in_proj.weight'] = r(inner, d_model)
        s[mx + 'in_proj.bias'] = r(inner)
        s[mx + 'short_filter.weight'] = r(inner, 1, short_filter_order)
        s[mx + 'short_filter.bias'] = r(inner)
        s[mx + 'out_proj.weight'] = r(d_model, d_model)
        s[mx + 'out_proj.bias'] = r(d_model)
        ff = mx + 'filter_fn.'
        s[ff + 'bias'] = rng.randn(d_filter).astype(np.float32)
        s[ff + 'implicit_filter.0.weight'] = r(filter_order, emb_dim)
        s[ff + 'implicit_filter.0.bias'] = r(filter_order)
        for j in range(num_inner_mlps):
            s[ff + f'implicit_filter.{2 + 2 * j}.weight'] = r(
                filter_order, filter_order)
            s[ff + f'implicit_filter.{2 + 2 * j}.bias'] = r(
                filter_order)
        for j in range(num_inner_mlps + 1):
            s[ff + f'implicit_filter.{1 + 2 * j}.freq'] = np.full(
                (1, filter_order), activation_freq, np.float32)
        s[ff + f'implicit_filter.{2 * num_inner_mlps + 2}.weight'] = \
            r(d_filter, filter_order)
        s[p + 'mlp.fc1.weight'] = r(d_inner, d_model)
        s[p + 'mlp.fc1.bias'] = r(d_inner)
        s[p + 'mlp.fc2.weight'] = r(d_model, d_inner)
        s[p + 'mlp.fc2.bias'] = r(d_model)
    s[bb + 'ln_f.weight'] = r(d_model) + 1
    s[bb + 'ln_f.bias'] = r(d_model)
    s['score.weight'] = r(num_labels, d_model)
    return s


def convert_hyenadna_params(state: Dict, *, n_layer: int,
                            num_inner_mlps: int = 2) -> Dict:
    """HF HyenaDNA state dict -> ddg_tpu HyenaDNAClassifier params.
    Buffers (pos_emb.z/t, modulation.deltas) are deterministic and
    recomputed by the flax module, so they are ignored here."""
    s = {re.sub(r'^(hyena\.|model\.|hyenadna\.)', '', k): v
         for k, v in state.items()}

    def T(x):
        return np.ascontiguousarray(x.T)

    def dense(w, b=None):
        out = {'kernel': T(w)}
        if b is not None:
            out['bias'] = b
        return out

    backbone: Dict = {
        'word_embeddings': {
            'embedding': s['backbone.embeddings.word_embeddings'
                           '.weight']},
        'ln_f': {'scale': s['backbone.ln_f.weight'],
                 'bias': s['backbone.ln_f.bias']},
    }
    for i in range(n_layer):
        p = f'backbone.layers.{i}.'
        mx = p + 'mixer.'
        ff = mx + 'filter_fn.'
        filt: Dict = {
            'mlp_in': dense(s[ff + 'implicit_filter.0.weight'],
                            s[ff + 'implicit_filter.0.bias']),
            'mlp_out': dense(
                s[ff + f'implicit_filter.{2 * num_inner_mlps + 2}'
                       '.weight']),
        }
        for j in range(num_inner_mlps):
            filt[f'mlp_{j}'] = dense(
                s[ff + f'implicit_filter.{2 + 2 * j}.weight'],
                s[ff + f'implicit_filter.{2 + 2 * j}.bias'])
        for j in range(num_inner_mlps + 1):
            filt[f'freq_{j}'] = s[ff +
                                  f'implicit_filter.{1 + 2 * j}.freq']
        d_filter = s[ff + 'bias'].shape[0]
        backbone[f'layer_{i}'] = {
            'norm1': {'scale': s[p + 'norm1.weight'],
                      'bias': s[p + 'norm1.bias']},
            'norm2': {'scale': s[p + 'norm2.weight'],
                      'bias': s[p + 'norm2.bias']},
            'mixer': {
                'in_proj': dense(s[mx + 'in_proj.weight'],
                                 s[mx + 'in_proj.bias']),
                # torch Conv1d (C, 1, ks) -> lax HIO (ks, 1, C)
                'short_filter_kernel': np.ascontiguousarray(
                    s[mx + 'short_filter.weight'].transpose(2, 1, 0)),
                'short_filter_bias': s[mx + 'short_filter.bias'],
                'filter': filt,
                'filter_bias': s[ff + 'bias'].reshape(1, d_filter),
                'out_proj': dense(s[mx + 'out_proj.weight'],
                                  s[mx + 'out_proj.bias']),
            },
            'mlp_fc1': dense(s[p + 'mlp.fc1.weight'],
                             s[p + 'mlp.fc1.bias']),
            'mlp_fc2': dense(s[p + 'mlp.fc2.weight'],
                             s[p + 'mlp.fc2.bias']),
        }
    params: Dict = {'backbone': backbone}
    if 'score.weight' in s:
        params['score'] = {'kernel': T(s['score.weight'])}
    if 'lm_head.weight' in s:
        params['lm_head'] = {'kernel': T(s['lm_head.weight'])}
    return params


def import_hf_hyenadna(model_dir: str):
    """(config, params) from a local LongSafari-layout checkpoint dir:
    reads config.json into HyenaDNAConfig and converts the weights.
    The asset on-ramp (scripts/fetch_and_verify_parity.sh) points this
    at real hub snapshots the day they appear."""
    import json
    import os

    from ddg_tpu.models.hyenadna import HyenaDNAConfig
    with open(os.path.join(model_dir, 'config.json')) as f:
        hc = json.load(f)
    cfg = HyenaDNAConfig(
        d_model=int(hc.get('d_model', 256)),
        n_layer=int(hc.get('n_layer', 4)),
        d_inner=int(hc.get('d_inner') or 4 * int(hc.get('d_model',
                                                        256))),
        vocab_size=int(hc.get('vocab_size', 12)),
        pad_vocab_size_multiple=int(
            hc.get('pad_vocab_size_multiple', 8)),
        max_seq_len=int(hc.get('max_seq_len', 32770)),
        emb_dim=int(hc.get('emb_dim', 5)),
        filter_order=int(hc.get('filter_order', 64)),
        short_filter_order=int(hc.get('short_filter_order', 3)),
        hyena_order=int(hc.get('hyena_order', 2)),
        num_inner_mlps=int(hc.get('num_inner_mlps', 2)),
        activation_freq=float(hc.get('activation_freq', 10.0)),
        train_freq=bool(hc.get('train_freq', True)),
        embed_dropout=float(hc.get('embed_dropout', 0.1)),
        hyena_dropout=float(hc.get('hyena_dropout', 0.0)),
        layer_norm_epsilon=float(hc.get('layer_norm_epsilon', 1e-5)))
    state = load_hf_udlm_state_dict(model_dir)  # same file layout
    params = convert_hyenadna_params(
        state, n_layer=cfg.n_layer,
        num_inner_mlps=cfg.num_inner_mlps)
    return cfg, params
