"""HF remote-code UDLM model (torch), shipped with exported folders.

Parity: /root/reference/models/hf/modeling_udlm.py:214-487 — same
class name (`UDLM`), config class, `base_model_prefix`, forward
signature (input_ids, timesteps, cond, output_hidden_states,
return_dict -> MaskedLMOutput) and STATE-DICT LAYOUT, so the
reference's published checkpoints load here and our exports load under
the reference's files. The implementation is independent: plain
`torch.nn.functional.scaled_dot_product_attention` + an explicit
rotate-half RoPE instead of the reference's hard flash-attn dependency
(modeling_udlm.py:8-10 — which makes the reference file unimportable
on CPU-only machines), and fp32 throughout instead of autocast
regions. Forward math mirrors ddg_tpu.convert.torch_mirror_dit_forward,
the repo's torch DiT oracle.
"""

import math
import typing

import torch
import torch.nn as nn
import torch.nn.functional as F
import transformers
from transformers import modeling_outputs

try:  # loaded as remote code inside a checkpoint folder
    from .configuration_udlm import UDLMConfig
except ImportError:  # loaded as ddg_tpu.hf_udlm.modeling_udlm
    from ddg_tpu.hf_udlm.configuration_udlm import UDLMConfig


class WeightOnlyLayerNorm(nn.Module):
    """LayerNorm with a scale and no bias, applied in fp32
    (reference dit.py:131-150 / modeling_udlm LayerNorm)."""

    def __init__(self, dim: int):
        super().__init__()
        self.weight = nn.Parameter(torch.ones([dim]))
        self.dim = dim

    def forward(self, x):
        with torch.amp.autocast('cuda', enabled=False):
            y = F.layer_norm(x.float(), [self.dim])
        return (y * self.weight[None, None, :]).to(x.dtype)


def modulate(x, shift, scale):
    return x * (1 + scale.unsqueeze(1)) + shift.unsqueeze(1)


class TimestepEmbedder(nn.Module):
    """Sinusoidal timestep features -> 2-layer SiLU MLP
    (reference dit.py:153-199)."""

    def __init__(self, hidden_size: int, frequency_embedding_size: int = 256):
        super().__init__()
        self.mlp = nn.Sequential(
            nn.Linear(frequency_embedding_size, hidden_size, bias=True),
            nn.SiLU(),
            nn.Linear(hidden_size, hidden_size, bias=True))
        self.frequency_embedding_size = frequency_embedding_size

    def forward(self, t):
        half = self.frequency_embedding_size // 2
        freqs = torch.exp(
            -math.log(10000)
            * torch.arange(half, dtype=torch.float32, device=t.device)
            / half)
        args = t[:, None].float() * freqs[None]
        emb = torch.cat([torch.cos(args), torch.sin(args)], dim=-1)
        if self.frequency_embedding_size % 2:
            emb = torch.cat([emb, torch.zeros_like(emb[:, :1])], dim=-1)
        return self.mlp(emb)


class LabelEmbedder(nn.Module):
    """Class-label embedding table (reference dit.py:202-213)."""

    def __init__(self, num_classes: int, cond_size: int):
        super().__init__()
        self.embedding_table = nn.Embedding(num_classes, cond_size)
        self.num_classes = num_classes

    def forward(self, labels):
        return self.embedding_table(labels)


class EmbeddingLayer(nn.Module):
    """Raw (V, H) embedding parameter, gathered by token id
    (reference dit.py:328-338)."""

    def __init__(self, dim: int, vocab_dim: int):
        super().__init__()
        self.embedding = nn.Parameter(torch.empty((vocab_dim, dim)))
        torch.nn.init.kaiming_uniform_(self.embedding, a=math.sqrt(5))

    def forward(self, x):
        return self.embedding[x]


def _apply_rope(q, cos, sin):
    """Rotate-half RoPE on (B, L, H, D): split D in half, rotate
    (same convention as flash-attn's apply_rotary_emb_qkv_, which the
    reference uses — dit.py:112-121)."""
    d2 = q.shape[-1] // 2
    q1, q2 = q[..., :d2], q[..., d2:]
    c = cos[None, :, None, :]
    s = sin[None, :, None, :]
    return torch.cat([q1 * c - q2 * s, q2 * c + q1 * s], dim=-1)


class DDiTBlock(nn.Module):
    """adaLN-zero DiT block (reference dit.py:230-325)."""

    def __init__(self, dim, n_heads, cond_dim, mlp_ratio=4, dropout=0.1):
        super().__init__()
        self.n_heads = n_heads
        self.dropout = dropout
        self.norm1 = WeightOnlyLayerNorm(dim)
        self.attn_qkv = nn.Linear(dim, 3 * dim, bias=False)
        self.attn_out = nn.Linear(dim, dim, bias=False)
        self.norm2 = WeightOnlyLayerNorm(dim)
        self.mlp = nn.Sequential(
            nn.Linear(dim, mlp_ratio * dim, bias=True),
            nn.GELU(approximate='tanh'),
            nn.Linear(mlp_ratio * dim, dim, bias=True))
        self.adaLN_modulation = nn.Linear(cond_dim, 6 * dim, bias=True)
        self.adaLN_modulation.weight.data.zero_()
        self.adaLN_modulation.bias.data.zero_()

    def forward(self, x, cos, sin, c):
        B, L, dim = x.shape
        head_dim = dim // self.n_heads
        (shift_msa, scale_msa, gate_msa, shift_mlp, scale_mlp,
         gate_mlp) = self.adaLN_modulation(c).chunk(6, dim=-1)

        h = modulate(self.norm1(x), shift_msa, scale_msa)
        qkv = self.attn_qkv(h).view(B, L, 3, self.n_heads, head_dim)
        q, k, v = qkv.unbind(2)
        q = _apply_rope(q, cos, sin)
        k = _apply_rope(k, cos, sin)
        attn = F.scaled_dot_product_attention(
            q.transpose(1, 2), k.transpose(1, 2), v.transpose(1, 2))
        attn = attn.transpose(1, 2).reshape(B, L, dim)
        attn = F.dropout(self.attn_out(attn), p=self.dropout,
                         training=self.training)
        x = x + gate_msa.unsqueeze(1) * attn

        h = modulate(self.norm2(x), shift_mlp, scale_mlp)
        h = F.dropout(self.mlp(h), p=self.dropout,
                      training=self.training)
        return x + gate_mlp.unsqueeze(1) * h


class DDitFinalLayer(nn.Module):
    """Final adaLN + zero-init linear head (reference dit.py:341-367)."""

    def __init__(self, hidden_size, out_channels, cond_dim):
        super().__init__()
        self.norm_final = WeightOnlyLayerNorm(hidden_size)
        self.linear = nn.Linear(hidden_size, out_channels)
        self.linear.weight.data.zero_()
        self.linear.bias.data.zero_()
        self.adaLN_modulation = nn.Linear(cond_dim, 2 * hidden_size,
                                          bias=True)
        self.adaLN_modulation.weight.data.zero_()
        self.adaLN_modulation.bias.data.zero_()

    def forward(self, x, c):
        shift, scale = self.adaLN_modulation(c).chunk(2, dim=-1)
        return self.linear(modulate(self.norm_final(x), shift, scale))


class DITBackbone(nn.Module):
    """DiT denoiser trunk (reference modeling_udlm.py:214-436)."""

    def __init__(self, config: UDLMConfig):
        super().__init__()
        self.config = config
        self.vocab_embed = EmbeddingLayer(config.hidden_dim,
                                          config.vocab_size)
        self.sigma_map = TimestepEmbedder(config.cond_dim)
        if config.cfg:
            self.cond_map = LabelEmbedder(config.cfg_num_classes + 1,
                                          config.cond_dim)
        else:
            self.cond_map = None
        head_dim = config.hidden_dim // config.n_heads
        # non-persistent: real checkpoints carry rotary_emb.inv_freq as
        # a buffer; we recompute it and ignore the stored copy.
        inv_freq = 1.0 / (10000 ** (
            torch.arange(0, head_dim, 2).float() / head_dim))
        self.register_buffer('rotary_inv_freq', inv_freq,
                             persistent=False)
        self.blocks = nn.ModuleList([
            DDiTBlock(config.hidden_dim, config.n_heads,
                      config.cond_dim, dropout=config.dropout)
            for _ in range(config.n_blocks)])
        self.output_layer = DDitFinalLayer(
            config.hidden_dim, config.vocab_size, config.cond_dim)

    def forward(self, indices, sigma, cond=None,
                output_hidden_states=False):
        if not self.config.time_conditioning:
            sigma = torch.zeros_like(sigma)
        all_hidden_states = []
        c = F.silu(self.sigma_map(sigma))
        if cond is not None:
            if self.cond_map is None:
                raise ValueError(
                    'Conditioning variable provided, but model was not '
                    'initialized with a condition embedding layer.')
            c = c + F.silu(self.cond_map(cond))

        x = self.vocab_embed(indices)
        if output_hidden_states:
            all_hidden_states.append(x)
        L = x.shape[1]
        t = torch.arange(L, device=x.device).float()
        freqs = torch.einsum('i,j->ij', t,
                             self.rotary_inv_freq.to(x.device))
        cos, sin = freqs.cos(), freqs.sin()
        for block in self.blocks:
            x = block(x, cos, sin, c)
            if output_hidden_states:
                all_hidden_states.append(x)
        logits = self.output_layer(x, c)
        return logits, all_hidden_states


class UDLM(transformers.PreTrainedModel):
    """HF-compatible UDLM wrapper (reference modeling_udlm.py:438-487)."""

    config_class = UDLMConfig
    base_model_prefix = 'udlm'
    _keys_to_ignore_on_load_unexpected = [r'backbone\.rotary_emb\..*']

    def __init__(self, config: UDLMConfig):
        super().__init__(config)
        self.backbone = DITBackbone(config)

    def forward(self,
                input_ids: torch.LongTensor = None,
                timesteps: torch.FloatTensor = None,
                cond: typing.Optional[torch.LongTensor] = None,
                output_hidden_states: typing.Optional[bool] = None,
                return_dict: typing.Optional[bool] = None,
                **kwargs) -> typing.Union[
                    torch.Tensor, typing.Tuple,
                    modeling_outputs.MaskedLMOutput]:
        output_hidden_states = (
            output_hidden_states if output_hidden_states is not None
            else self.config.output_hidden_states)
        return_dict = (return_dict if return_dict is not None
                       else self.config.use_return_dict)
        logits, all_hidden_states = self.backbone(
            indices=input_ids, sigma=timesteps, cond=cond,
            output_hidden_states=output_hidden_states)
        if return_dict:
            return modeling_outputs.MaskedLMOutput(
                logits=logits,
                hidden_states=(all_hidden_states
                               if output_hidden_states else None),
                loss=None)
        if output_hidden_states:
            return logits, all_hidden_states
        return logits
