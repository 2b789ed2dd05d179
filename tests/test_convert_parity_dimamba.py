"""Logit-parity: reference DiMamba math (torch mirror) vs our flax
DiMamba loaded with converted weights.

The reference models/dimamba.py cannot be imported here (hard
mamba_ssm/Triton dependency), so this test re-executes its exact eval
math in torch — in_proj -> causal depthwise conv1d -> silu -> x_proj ->
dt_proj(+bias, softplus) -> selective scan -> C·h + D·u -> ·silu(z) ->
out_proj, bidirectional add with tied in/out projections
(dimamba.py:146-250, 591-656), Block add->LN->adaLN(3)->mixer->gated
residual (dimamba.py:405-484), final norm + adaLN_modulation_final +
lm_head (dimamba.py:741-822) — on a synthetic reference-format state
dict, and checks our model under `convert_dimamba_params` matches to
< 1e-3 (the BASELINE.json parity bar).
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from ddg_tpu.convert import (convert_dimamba_params,
                             make_reference_dimamba_state_dict)
from ddg_tpu.models.dimamba import DiMamba, DiMambaConfig

HIDDEN, COND, BLOCKS, VOCAB = 32, 16, 2, 11
D_STATE, D_CONV, EXPAND = 4, 4, 2
B, L = 2, 16
D_INNER = EXPAND * HIDDEN
DT_RANK = math.ceil(HIDDEN / 16)


def _mamba_dir(s, p, h):
    """One direction of the reference Mamba core in torch
    (dimamba.py:146-250), h: (B, L, D)."""
    xz = h @ s[p + 'in_proj.weight'].T                # (B, L, 2*di)
    x, z = xz.chunk(2, dim=-1)
    x = x.transpose(1, 2)                             # (B, di, L)
    x = F.conv1d(x, s[p + 'conv1d.weight'],
                 s[p + 'conv1d.bias'], padding=D_CONV - 1,
                 groups=D_INNER)[..., :L]
    x = F.silu(x).transpose(1, 2)                     # (B, L, di)
    x_dbl = x @ s[p + 'x_proj.weight'].T
    dt, Bc, Cc = torch.split(x_dbl, [DT_RANK, D_STATE, D_STATE], -1)
    dt = dt @ s[p + 'dt_proj.weight'].T + s[p + 'dt_proj.bias']
    delta = F.softplus(dt.float())                    # (B, L, di)
    A = -torch.exp(s[p + 'A_log'].float())            # (di, N)
    hstate = torch.zeros(B, D_INNER, D_STATE)
    ys = []
    for t in range(L):
        a = torch.exp(delta[:, t, :, None] * A[None])
        bmat = (delta[:, t] * x[:, t].float())[..., None] \
            * Bc[:, t, None, :].float()
        hstate = a * hstate + bmat
        ys.append((hstate * Cc[:, t, None, :].float()).sum(-1))
    y = torch.stack(ys, dim=1) + s[p + 'D'].float() * x.float()
    y = y * F.silu(z.float())
    return y @ s[p + 'out_proj.weight'].T.float()


def torch_reference_dimamba(state, x_ids, sigma):
    s = {k: torch.tensor(v) for k, v in state.items()}

    # TimestepEmbedder (dit.py:169-199) + extra silu (dimamba.py:1127)
    half = 256 // 2
    freqs = torch.exp(-math.log(10000) * torch.arange(half) / half)
    args = sigma[:, None].float() * freqs[None]
    t_freq = torch.cat([torch.cos(args), torch.sin(args)], dim=-1)
    c = t_freq @ s['sigma_map.mlp.0.weight'].T + s['sigma_map.mlp.0.bias']
    c = F.silu(c)
    c = c @ s['sigma_map.mlp.2.weight'].T + s['sigma_map.mlp.2.bias']
    c = F.silu(c)

    bb = 'model.bimamba.backbone.'
    h = s[bb + 'embeddings.word_embeddings.weight'][x_ids]
    residual = None
    for i in range(BLOCKS):
        p = bb + f'layers.{i}.'
        residual = h + residual if residual is not None else h
        residual = residual.float()
        hh = F.layer_norm(residual, [HIDDEN], s[p + 'norm.weight'],
                          s[p + 'norm.bias'])
        mod = c @ s[p + 'adaLN_modulation.weight'].T \
            + s[p + 'adaLN_modulation.bias']
        shift, scale, gate = mod[:, None].chunk(3, dim=-1)
        hh = hh * (1 + scale) + shift
        out = _mamba_dir(s, p + 'mixer.mamba_fwd.', hh)
        out_rev = torch.flip(
            _mamba_dir(s, p + 'mixer.mamba_rev.',
                       torch.flip(hh, dims=(1,))), dims=(1,))
        mixer_out = out + out_rev
        # gated residual (dimamba.py:475-484); next block re-adds
        h = gate * mixer_out + residual
    final = h + residual
    final = F.layer_norm(final.float(), [HIDDEN],
                         s[bb + 'norm_f.weight'], s[bb + 'norm_f.bias'])
    mod = c @ s[bb + 'adaLN_modulation_final.weight'].T \
        + s[bb + 'adaLN_modulation_final.bias']
    shift, scale = mod[:, None].chunk(2, dim=-1)
    final = final * (1 + scale) + shift
    return final @ s['model.lm_head.weight'].T


def test_converted_dimamba_matches_torch_mirror():
    rng = np.random.RandomState(0)
    state = make_reference_dimamba_state_dict(
        rng, hidden=HIDDEN, cond_dim=COND, n_blocks=BLOCKS,
        vocab=VOCAB, d_state=D_STATE, d_conv=D_CONV, expand=EXPAND)
    x_np = rng.randint(0, VOCAB, (B, L))
    sigma_np = rng.rand(B).astype(np.float32) * 3

    with torch.no_grad():
        want = torch_reference_dimamba(
            state, torch.tensor(x_np), torch.tensor(sigma_np)).numpy()

    cfg = DiMambaConfig(hidden_size=HIDDEN, cond_dim=COND, length=L,
                        n_blocks=BLOCKS, vocab_size=VOCAB,
                        d_state=D_STATE, d_conv=D_CONV, expand=EXPAND,
                        scan_chunk=8, dropout=0.0, remat=False,
                        pallas_scan=False,
                        compute_dtype=jnp.float32)
    params = convert_dimamba_params(state, n_blocks=BLOCKS)
    model = DiMamba(cfg)
    ref_shapes = jax.tree.map(
        lambda a: a.shape,
        model.init(jax.random.PRNGKey(0), jnp.asarray(x_np),
                   jnp.asarray(sigma_np))['params'])
    got_shapes = jax.tree.map(lambda a: np.asarray(a).shape, params)
    assert ref_shapes == got_shapes, (
        f'param tree mismatch:\n{ref_shapes}\nvs\n{got_shapes}')

    got = model.apply({'params': jax.tree.map(jnp.asarray, params)},
                      jnp.asarray(x_np), jnp.asarray(sigma_np))
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-3,
                               rtol=1e-3)


def test_converted_dimamba_matches_pallas_scan_path():
    """Same parity through the Pallas selective-scan kernel (interpret
    mode), proving converted checkpoints run identically on the
    TPU-kernel path."""
    rng = np.random.RandomState(1)
    state = make_reference_dimamba_state_dict(
        rng, hidden=HIDDEN, cond_dim=COND, n_blocks=1, vocab=VOCAB,
        d_state=D_STATE, d_conv=D_CONV, expand=EXPAND)
    x_np = rng.randint(0, VOCAB, (B, L))
    sigma_np = rng.rand(B).astype(np.float32) * 3
    params = convert_dimamba_params(state, n_blocks=1)

    def run(pallas, dt_inkernel=False):
        cfg = DiMambaConfig(hidden_size=HIDDEN, cond_dim=COND,
                            length=L, n_blocks=1, vocab_size=VOCAB,
                            d_state=D_STATE, d_conv=D_CONV,
                            expand=EXPAND, scan_chunk=8, dropout=0.0,
                            remat=False, pallas_scan=pallas,
                            dt_inkernel=dt_inkernel,
                            compute_dtype=jnp.float32)
        return DiMamba(cfg).apply(
            {'params': jax.tree.map(jnp.asarray, params)},
            jnp.asarray(x_np), jnp.asarray(sigma_np))

    import ddg_tpu.ops.selective_scan_pallas as sp
    orig = sp.selective_scan_pallas
    orig_lr = sp.selective_scan_pallas_dtlr
    import functools
    sp.selective_scan_pallas = functools.partial(orig, interpret=True)
    sp.selective_scan_pallas_dtlr = functools.partial(
        orig_lr, interpret=True)
    try:
        got_pl = run(True)
        got_lr = run(True, dt_inkernel=True)
    finally:
        sp.selective_scan_pallas = orig
        sp.selective_scan_pallas_dtlr = orig_lr
    got_xla = run(False)
    np.testing.assert_allclose(np.asarray(got_pl), np.asarray(got_xla),
                               atol=2e-4, rtol=2e-4)
    np.testing.assert_allclose(np.asarray(got_lr), np.asarray(got_xla),
                               atol=2e-4, rtol=2e-4)
