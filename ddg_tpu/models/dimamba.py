"""DiMamba: bidirectional Mamba denoiser for long genomic sequences,
flax.linen with an associative-scan selective SSM.

TPU-first re-design of the reference DiMamba
(/root/reference/models/dimamba.py):
  * the CUDA `selective_scan_fn` / `mamba_inner_fn` kernels
    (dimamba.py:176-249) become a *chunked associative scan*:
    `lax.scan` over fixed-size chunks (bounded memory at L=32768) with
    `lax.associative_scan` inside each chunk (parallel on the VPU) —
    h_t = exp(dt_t A) h_{t-1} + dt_t B_t x_t composed as the affine
    monoid (a, b) o (a', b') = (a a', a b' + b);
  * the Triton fused add+RMSNorm (dimamba.py:26-41,445-459) is plain
    jnp (XLA fuses residual-add + norm natively);
  * the causal depthwise conv1d uses `lax.conv_general_dilated` with
    left padding (replacing causal_conv1d CUDA, dimamba.py:10-13);
  * bidirectionality: forward + flipped-sequence scan with tied
    in/out projections (dimamba.py:591-656), combine 'add' or
    'ew_multiply'.

Architecture parity: Block = add -> LayerNorm -> adaLN(3-param)
modulate -> BiMamba mixer -> gated residual (dimamba.py:370-482);
DiMamba top: sigma/cond embedders -> cond_embeds, lm head with
optional weight tying (dimamba.py:691-1151).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ddg_tpu.models.dit import TimestepEmbedder


@dataclasses.dataclass(frozen=True)
class DiMambaConfig:
    hidden_size: int = 256
    cond_dim: int = 128
    length: int = 32768
    n_blocks: int = 8
    vocab_size: int = 16
    d_state: int = 16
    d_conv: int = 4
    expand: int = 2
    bidirectional: bool = True
    bidirectional_strategy: str = 'add'
    bidirectional_weight_tie: bool = True
    tie_word_embeddings: bool = False
    num_classes: Optional[int] = None
    use_adaLN: bool = True
    # 128 measured fastest at Species10 scale on v5e (sweep: 32->2.15s,
    # 64->2.18s, 128->2.23s, 256->3.4s, 512->10.2s per train step —
    # large chunks spill VMEM).
    scan_chunk: int = 128
    # Run the selective scan as a Pallas TPU kernel
    # (ops/selective_scan_pallas.py): HBM-minimal, custom VJP. 'auto'
    # = on when the default backend is TPU; True/False force it.
    pallas_scan: str | bool = 'auto'
    # Fuse dt_proj + softplus into the scan kernel (delta never hits
    # HBM). Active only on the pallas path with scan_chunk | L; grads
    # validated on chip to ~3e-5 vs the composite. Default OFF: at the
    # Species10 shape the full train step measured neutral (411.7 ms
    # on vs 400.8 ms off — XLA already overlaps the dt_proj); the
    # HBM saving may pay at larger batch.
    dt_inkernel: bool = False
    # Segment lengths of the within-chunk scan inside the Pallas
    # kernel (fwd pass / bwd pass). Measured at the Species10 shape on
    # v5e with K=16 dispatch-amortized timing (scripts/decide_scan
    # pattern): 64/32 is the pps2 optimum; the hybrid impl peaked at
    # seg=8 fwd / seg=4 bwd.
    scan_seg: int = 64
    scan_seg_bwd: int = 64
    # Within-chunk scan decomposition inside the Pallas kernel:
    # 'hybrid' = sequential over segments, log-depth (Hillis-Steele)
    # within; 'pps' = parallel over segments, sequential within (no
    # shift/mask overhead in the inner loop); 'pps2' = pps with a
    # seeded-recompute second pass — no p_cum/fix-up, and the forward
    # fuses the N-readout so the (C, N, d) state tensor never
    # materializes; 'pps3' (default) = pps2 forward + consumer-fused
    # backward (each dh row reduces straight into ddt/du/db/dc — no
    # state/adjoint concats). On-chip at the Species10 shape (K=16
    # amortized): fwd 4.21 (pps) -> 3.8 ms, fwd+bwd 10.7 (pps2) ->
    # 8.56 ms (seg 64/64).
    scan_impl: str = 'pps3'
    # Fuse the whole per-direction Mamba block (in_proj, causal conv,
    # x_proj, dt_proj, selective scan, gate, out_proj) into ONE Pallas
    # kernel with in-kernel weight-gradient accumulation
    # (ops/mamba_block_pallas.py) — the TPU equivalent of the
    # reference's CUDA mamba_inner_fn (dimamba.py:176-195). 'auto' =
    # on when the Pallas scan is active, scan_impl is pps2/pps3, no
    # sequence parallelism, and the shape constraints hold
    # (scan_chunk | L, seg | scan_chunk, scan_chunk/seg >= 2,
    # d_conv <= 8); True forces it (asserts the constraints); False
    # uses the unfused path. Round-4 on-chip A/B at the Species10
    # shape (B=2, L=32768): train step 244.1 -> 185.3 ms (268 ->
    # 353.6K tok/s), loss bit-exact fwd, worst grad leaf 8.8e-3 rel
    # (bf16 per-chunk recompute) — default 'auto'.
    fused_block: str | bool = 'auto'
    # Run the fused-block kernel in Pallas interpret mode (CPU tests).
    pallas_interpret: bool = False
    dropout: float = 0.1
    # Rematerialize each block in the backward pass. Needed on the XLA
    # scan path, where autodiff stores h (B, L, d_inner, N) per
    # direction (~1 GB/layer/direction at L=32768). The Pallas kernel's
    # custom VJP already recomputes h in-kernel from inputs + per-chunk
    # states (like the reference's CUDA mamba_inner), so block remat
    # double-pays the projections there: measured 400.8 -> 324.0 ms
    # per Species10 train step when turned off. Default off; enable for
    # the XLA path or when activations exceed HBM.
    remat: bool = False
    compute_dtype: jnp.dtype = jnp.bfloat16
    # Sequence parallelism (beyond the reference): mesh axis to shard
    # L over. The scan runs via ops/ssm_sequence_parallel.py (local
    # scan per shard + closed-form cross-shard state combine +
    # fix-up); everything else (convs — halo exchange, flips, norms,
    # projections) is GSPMD-partitioned automatically. Requires
    # jax.set_mesh (parallel.mesh.shard_train_step provides it);
    # outside a mesh context this falls back to the single-device
    # scan. L must divide by the axis size, and the LOCAL L by
    # scan_chunk.
    sequence_axis: Optional[str] = None
    batch_axis: str = 'data'

    @property
    def d_inner(self) -> int:
        return self.expand * self.hidden_size

    @property
    def dt_rank(self) -> int:
        return math.ceil(self.hidden_size / 16)


def _ssm_chunk_scan(h0, a, b):
    """One chunk of h_t = a_t * h_{t-1} + b_t via associative scan.

    h0: (B, d, N); a, b: (B, C, d, N). Returns (h_all (B, C, d, N),
    h_last (B, d, N)).
    """
    def combine(left, right):
        a_l, b_l = left
        a_r, b_r = right
        return a_l * a_r, a_r * b_l + b_r

    a_cum, b_cum = jax.lax.associative_scan(combine, (a, b), axis=1)
    h_all = a_cum * h0[:, None] + b_cum
    return h_all, h_all[:, -1]


def selective_scan(u, delta, A, B, C, D, z, *, chunk: int = 256):
    """Selective SSM scan (parity with mamba selective_scan_fn,
    reference dimamba.py:230-249):
      h_t = exp(delta_t A) h_{t-1} + delta_t B_t u_t
      y_t = C_t . h_t + D u_t;  out = y * silu(z)

    u, delta, z: (B, L, d); A: (d, N); B, C: (B, L, N); D: (d,).
    fp32 recurrence for stability; output cast to u.dtype.
    """
    Bsz, L, d = u.shape
    N = A.shape[-1]
    delta = delta.astype(jnp.float32)
    u32 = u.astype(jnp.float32)

    # The (B, L, d, N) tensors a = exp(dt A) and b = dt B u would be
    # ~2 GB each at the Species10 scale (L=32768, d=512, N=16), and
    # materializing the state stack h over L costs the same again. So
    # a/b/h only ever exist per-chunk: the chunk body recomputes them
    # from the (B, chunk, ...) slices, emits y directly, and is
    # jax.checkpoint-ed so the backward pass recomputes instead of
    # stashing per-chunk internals (the reference's CUDA kernel makes
    # the same recompute-in-backward tradeoff).
    pad = (-L) % chunk

    def pad_l(x, value=0.0):
        if not pad:
            return x
        widths = [(0, 0), (0, pad)] + [(0, 0)] * (x.ndim - 2)
        return jnp.pad(x, widths, constant_values=value)

    n_chunks = (L + pad) // chunk

    def chunked(x):
        return x.reshape(Bsz, n_chunks, chunk,
                         *x.shape[2:]).swapaxes(0, 1)

    xs = (chunked(pad_l(delta)),
          chunked(pad_l(B.astype(jnp.float32))),
          chunked(pad_l(C.astype(jnp.float32))),
          chunked(pad_l(u32)))

    @jax.checkpoint
    def body(h, inp):
        delta_c, B_c, C_c, u_c = inp                 # (B, chunk, ...)
        a = jnp.exp(delta_c[..., None] * A[None, None])
        b = delta_c[..., None] * B_c[:, :, None, :] * u_c[..., None]
        h_all, h_last = _ssm_chunk_scan(h, a, b)
        y_c = (h_all * C_c[:, :, None, :]).sum(-1)   # (B, chunk, d)
        return h_last, y_c

    h0 = jnp.zeros((Bsz, d, N), jnp.float32)
    _, y_chunks = jax.lax.scan(body, h0, xs)         # (nc, B, chunk, d)
    y = y_chunks.swapaxes(0, 1).reshape(Bsz, n_chunks * chunk, d)
    y = y[:, :L] + D[None, None] * u32
    y = y * jax.nn.silu(z.astype(jnp.float32))
    return y.astype(u.dtype)


class MambaCore(nn.Module):
    """Conv + SSM core (everything between in_proj and out_proj);
    per-direction parameters (conv1d, x_proj, dt_proj, A_log, D)."""
    cfg: DiMambaConfig

    def _dt_dense(self):
        """dt_proj with the reference's variance-preserving init and
        softplus bias targeting dt in [1e-3, 0.1]
        (dimamba.py:108-128). precision=HIGHEST: the TPU default
        matmul is single-pass bf16; dt feeds exp() in the recurrence,
        which amplifies the ~1e-3 rounding. Matches the fused kernel's
        in-kernel dt matmul (and the reference's fp32 dt_proj)."""
        cfg = self.cfg
        dt_init_std = cfg.dt_rank ** -0.5

        def dt_bias_init(key, shape, dtype=jnp.float32):
            dt_val = jnp.exp(
                jax.random.uniform(key, shape)
                * (math.log(0.1) - math.log(0.001)) + math.log(0.001))
            dt_val = jnp.clip(dt_val, 1e-4, None)
            return dt_val + jnp.log(-jnp.expm1(-dt_val))

        return nn.Dense(
            cfg.d_inner, use_bias=True,
            kernel_init=nn.initializers.uniform(scale=2 * dt_init_std),
            bias_init=dt_bias_init,
            dtype=jnp.float32, precision=jax.lax.Precision.HIGHEST,
            name='dt_proj')

    def _ssm_params(self):
        """S4D-real init A = -(1..N) per channel plus the skip D
        (dimamba.py:131-139)."""
        cfg = self.cfg
        A_log = self.param(
            'A_log',
            lambda key, shape: jnp.log(jnp.broadcast_to(
                jnp.arange(1, cfg.d_state + 1, dtype=jnp.float32),
                shape)),
            (cfg.d_inner, cfg.d_state))
        D = self.param('D', nn.initializers.ones, (cfg.d_inner,))
        return A_log, D

    @nn.compact
    def __call__(self, x, z, *, params_only: bool = False):
        cfg = self.cfg
        d = cfg.d_inner
        # Causal depthwise conv1d, left padding d_conv-1
        # (reference conv1d with padding=d_conv-1, dimamba.py:87-96).
        conv_w = self.param(
            'conv1d_kernel',
            nn.initializers.variance_scaling(1 / 3, 'fan_in', 'uniform'),
            (cfg.d_conv, 1, d))
        conv_b = self.param('conv1d_bias', nn.initializers.zeros, (d,))
        if params_only:
            # Register the remaining params (same tree as the compute
            # path — checkpoints stay interchangeable) and hand them
            # to the caller for the fused-block kernel; no compute.
            x_proj = nn.Dense(cfg.dt_rank + 2 * cfg.d_state,
                              use_bias=False, dtype=cfg.compute_dtype,
                              name='x_proj')
            _ = x_proj(x[:, :1])
            dt_dense = self._dt_dense()
            _ = dt_dense(jnp.zeros((1, 1, cfg.dt_rank), jnp.float32))
            A_log, D = self._ssm_params()
            return dict(
                conv_w=conv_w, conv_b=conv_b,
                W_x=x_proj.variables['params']['kernel'],
                W_dt=dt_dense.variables['params']['kernel'],
                b_dt=dt_dense.variables['params']['bias'],
                A=-jnp.exp(A_log), D=D)
        # Causal depthwise conv as d_conv shifted multiply-adds — pure
        # elementwise FMAs that XLA fuses with the surrounding VPU ops
        # (no grouped-convolution lowering). Same math as
        # lax.conv_general_dilated with (k-1, 0) padding; measured
        # throughput-neutral vs the conv at Species10 scale (the step
        # is scan- and projection-bound), kept for the simpler fusion.
        xc = x.astype(cfg.compute_dtype)
        w = conv_w.astype(cfg.compute_dtype)
        acc = xc * w[cfg.d_conv - 1, 0][None, None, :]
        for j in range(cfg.d_conv - 1):
            s = cfg.d_conv - 1 - j
            shifted = jnp.pad(xc[:, :-s], ((0, 0), (s, 0), (0, 0)))
            acc = acc + shifted * w[j, 0][None, None, :]
        x = acc + conv_b.astype(cfg.compute_dtype)
        x = jax.nn.silu(x)

        x_dbl = nn.Dense(cfg.dt_rank + 2 * cfg.d_state, use_bias=False,
                         dtype=cfg.compute_dtype, name='x_proj')(x)
        dt, B_ssm, C_ssm = jnp.split(
            x_dbl, [cfg.dt_rank, cfg.dt_rank + cfg.d_state], axis=-1)

        dt_dense = self._dt_dense()
        dt_lr = dt.astype(jnp.float32)
        A_log, D = self._ssm_params()
        A = -jnp.exp(A_log)

        use_pallas = (cfg.pallas_scan if isinstance(cfg.pallas_scan,
                                                    bool)
                      else jax.default_backend() == 'tpu')
        L = x.shape[1]
        seq_n = 0
        if cfg.sequence_axis is not None:
            from ddg_tpu.models.dit import _ambient_axis_size
            seq_n = _ambient_axis_size(cfg.sequence_axis)
        if seq_n > 1:
            import functools as _ft

            from ddg_tpu.ops.ssm_sequence_parallel import \
                ssm_scan_sequence_parallel
            delta = jax.nn.softplus(dt_dense(dt_lr))
            if use_pallas:
                from ddg_tpu.ops.selective_scan_pallas import \
                    selective_scan_pallas
                local_scan = _ft.partial(
                    selective_scan_pallas, chunk=cfg.scan_chunk,
                    seg=cfg.scan_seg, seg_bwd=cfg.scan_seg_bwd,
                    scan_impl=cfg.scan_impl)
            else:
                local_scan = _ft.partial(selective_scan,
                                         chunk=cfg.scan_chunk)
            return ssm_scan_sequence_parallel(
                x, delta, A, B_ssm, C_ssm, D, z,
                local_scan=local_scan, axis=cfg.sequence_axis,
                batch_axis=cfg.batch_axis)
        if use_pallas and cfg.dt_inkernel and L % cfg.scan_chunk == 0:
            # dt-lowrank fast path: dt_proj + softplus run inside the
            # scan kernel, so the (B, L, d_inner) fp32 delta tensor
            # never exists in HBM. Params registered via a 1-row call
            # (same tree as the Dense path; the output is unused and
            # DCE'd).
            from ddg_tpu.ops.selective_scan_pallas import \
                selective_scan_pallas_dtlr
            _ = dt_dense(dt_lr[:, :1])
            W_dt = dt_dense.variables['params']['kernel']
            b_dt = dt_dense.variables['params']['bias']
            return selective_scan_pallas_dtlr(
                x, dt_lr, W_dt, b_dt, A, B_ssm, C_ssm, D, z,
                chunk=cfg.scan_chunk, seg=cfg.scan_seg,
                seg_bwd=cfg.scan_seg_bwd, scan_impl=cfg.scan_impl)
        delta = jax.nn.softplus(dt_dense(dt_lr))
        if use_pallas:
            from ddg_tpu.ops.selective_scan_pallas import \
                selective_scan_pallas
            return selective_scan_pallas(x, delta, A, B_ssm, C_ssm, D,
                                         z, chunk=cfg.scan_chunk,
                                         seg=cfg.scan_seg,
                                         seg_bwd=cfg.scan_seg_bwd,
                                         scan_impl=cfg.scan_impl)
        return selective_scan(x, delta, A, B_ssm, C_ssm, D, z,
                              chunk=cfg.scan_chunk)


def _use_fused_block(cfg: DiMambaConfig, L: int) -> bool:
    """Resolve cfg.fused_block ('auto'/True/False) against the fused
    kernel's shape constraints (ops/mamba_block_pallas.py docstring)."""
    constraints_ok = (
        L % cfg.scan_chunk == 0
        and all(cfg.scan_chunk % s == 0 and cfg.scan_chunk // s >= 2
                for s in (cfg.scan_seg, cfg.scan_seg_bwd))
        and cfg.d_conv <= 8)
    if cfg.fused_block is True:
        if not constraints_ok:
            raise ValueError(
                'fused_block=True but the kernel shape constraints do '
                f'not hold (L={L}, chunk={cfg.scan_chunk}, '
                f'seg={cfg.scan_seg}/{cfg.scan_seg_bwd}, '
                f'd_conv={cfg.d_conv})')
        return True
    if cfg.fused_block is False:
        return False
    use_pallas = (cfg.pallas_scan if isinstance(cfg.pallas_scan, bool)
                  else jax.default_backend() == 'tpu')
    return (use_pallas and cfg.scan_impl in ('pps2', 'pps3')
            and cfg.sequence_axis is None and constraints_ok)


class BiMambaWrapper(nn.Module):
    """Forward + reversed Mamba with optional in/out projection tying
    (reference dimamba.py:591-656)."""
    cfg: DiMambaConfig

    @nn.compact
    def __call__(self, h):
        cfg = self.cfg
        d = cfg.d_inner
        dt = cfg.compute_dtype
        in_fwd = nn.Dense(2 * d, use_bias=False, dtype=dt,
                          name='in_proj_fwd')
        out_fwd = nn.Dense(cfg.hidden_size, use_bias=False, dtype=dt,
                           name='out_proj_fwd')
        if cfg.bidirectional and not cfg.bidirectional_weight_tie:
            in_rev = nn.Dense(2 * d, use_bias=False, dtype=dt,
                              name='in_proj_rev')
            out_rev = nn.Dense(cfg.hidden_size, use_bias=False,
                               dtype=dt, name='out_proj_rev')
        else:
            in_rev, out_rev = in_fwd, out_fwd

        if _use_fused_block(cfg, h.shape[1]):
            # Fused mamba_inner path: the whole per-direction block
            # runs as ONE Pallas kernel (ops/mamba_block_pallas.py —
            # TPU analogue of the reference's CUDA mamba_inner_fn,
            # dimamba.py:176-195). Dense/core params are registered
            # via 1-row probe calls (identical tree to the unfused
            # path — checkpoints stay interchangeable) and handed to
            # the kernel as raw arrays.
            import functools as _ft

            from ddg_tpu.ops.mamba_block_pallas import \
                mamba_inner_pallas
            probe = jnp.zeros((1, 1, d), dt)
            _ = in_fwd(h[:, :1])
            _ = out_fwd(probe)
            fused = _ft.partial(
                mamba_inner_pallas, d_state=cfg.d_state,
                dt_rank=cfg.dt_rank, chunk=cfg.scan_chunk,
                seg=cfg.scan_seg, seg_bwd=cfg.scan_seg_bwd,
                interpret=cfg.pallas_interpret, compute_dtype=dt)

            def run(direction, h_dir, in_p, out_p):
                p = MambaCore(cfg, name=f'core_{direction}')(
                    probe, None, params_only=True)
                return fused(
                    h_dir, in_p.variables['params']['kernel'],
                    p['conv_w'], p['conv_b'], p['W_x'], p['W_dt'],
                    p['b_dt'], p['A'], p['D'],
                    out_p.variables['params']['kernel'])

            out = run('fwd', h, in_fwd, out_fwd)
            if cfg.bidirectional:
                if not cfg.bidirectional_weight_tie:
                    _ = in_rev(h[:, :1])
                    _ = out_rev(probe)
                out_r = run('rev', jnp.flip(h, axis=1), in_rev,
                            out_rev)
                out_r = jnp.flip(out_r, axis=1)
                if cfg.bidirectional_strategy == 'add':
                    out = out + out_r
                elif cfg.bidirectional_strategy == 'ew_multiply':
                    out = out * out_r
                else:
                    raise NotImplementedError(
                        f'`{cfg.bidirectional_strategy}` for '
                        'bi-directionality not implemented!')
            return out

        xz = in_fwd(h)
        x, z = jnp.split(xz, 2, axis=-1)
        out = out_fwd(MambaCore(cfg, name='core_fwd')(x, z))

        if cfg.bidirectional:
            h_flip = jnp.flip(h, axis=1)
            xz_r = in_rev(h_flip)
            x_r, z_r = jnp.split(xz_r, 2, axis=-1)
            out_r = out_rev(MambaCore(cfg, name='core_rev')(x_r, z_r))
            out_r = jnp.flip(out_r, axis=1)
            if cfg.bidirectional_strategy == 'add':
                out = out + out_r
            elif cfg.bidirectional_strategy == 'ew_multiply':
                out = out * out_r
            else:
                raise NotImplementedError(
                    f'`{cfg.bidirectional_strategy}` for '
                    'bi-directionality not implemented!')
        return out


class DiMambaBlock(nn.Module):
    """Add -> LayerNorm -> adaLN modulate -> mixer -> gated residual
    (reference Block, dimamba.py:370-482)."""
    cfg: DiMambaConfig

    @nn.compact
    def __call__(self, hidden_states, residual, cond_embeds,
                 train: bool = False):
        cfg = self.cfg
        residual = (hidden_states + residual
                    if residual is not None else hidden_states)
        residual = residual.astype(jnp.float32)  # residual_in_fp32
        h = nn.LayerNorm(dtype=jnp.float32, name='norm')(residual)
        h = h.astype(cfg.compute_dtype)

        gate = None
        if cfg.use_adaLN and cond_embeds is not None:
            mod = nn.Dense(3 * cfg.hidden_size,
                           kernel_init=nn.initializers.zeros,
                           bias_init=nn.initializers.zeros,
                           dtype=cfg.compute_dtype,
                           name='adaLN_modulation')(cond_embeds)
            shift, scale, gate = jnp.split(mod, 3, axis=-1)
            h = h * (1 + scale[:, None]) + shift[:, None]

        h = BiMambaWrapper(cfg, name='mixer')(h)
        if gate is not None:
            h = nn.Dropout(cfg.dropout, deterministic=not train)(h)
            h = gate[:, None] * h + residual.astype(h.dtype)
            # Reference parity (dimamba.py:461-482): the gated branch
            # returns (residual + gate*mixer, residual) and the next
            # block adds them AGAIN (residual' = hidden + residual) —
            # the residual stream deliberately re-accumulates.
            return h, residual
        return h, residual


class DiMamba(nn.Module):
    """Top-level denoiser with the common (indices, sigma, cond, x_emb)
    signature (reference dimamba.py:1077-1151)."""
    cfg: DiMambaConfig

    @nn.compact
    def __call__(self, indices, sigma, cond=None, x_emb=None, *,
                 train: bool = False, return_hidden_states: bool = False):
        cfg = self.cfg
        c = None
        if sigma is not None:
            c = nn.silu(TimestepEmbedder(cfg.cond_dim,
                                         name='sigma_map')(sigma))
        if cond is not None:
            assert cfg.num_classes is not None
            ce = nn.silu(nn.Embed(cfg.num_classes + 1, cfg.cond_dim,
                                  name='cond_map')(cond))
            c = ce if c is None else c + ce
        if c is not None:
            c = c.astype(cfg.compute_dtype)

        embed = nn.Embed(cfg.vocab_size, cfg.hidden_size,
                         name='word_embeddings')
        if x_emb is None:
            h = embed(indices).astype(cfg.compute_dtype)
        else:
            h = x_emb.astype(cfg.compute_dtype)
        residual = None
        block_cls = (nn.remat(DiMambaBlock,
                              static_argnums=(4,))
                     if cfg.remat else DiMambaBlock)
        for i in range(cfg.n_blocks):
            h, residual = block_cls(cfg, name=f'block_{i}')(
                h, residual, c, train)
        final = (h + residual.astype(h.dtype)
                 if residual is not None else h)
        final = nn.LayerNorm(dtype=jnp.float32,
                             name='norm_f')(final.astype(jnp.float32))
        if cfg.use_adaLN and c is not None:
            # Final adaLN modulation after norm_f (reference
            # adaLN_modulation_final, dimamba.py:741-746,815-822;
            # zero-init => identity at initialization).
            mod = nn.Dense(2 * cfg.hidden_size,
                           kernel_init=nn.initializers.zeros,
                           bias_init=nn.initializers.zeros,
                           dtype=jnp.float32,
                           name='adaLN_final')(c.astype(jnp.float32))
            shift, scale = jnp.split(mod, 2, axis=-1)
            final = final * (1 + scale[:, None]) + shift[:, None]
        hidden = final
        if cfg.tie_word_embeddings:
            logits = final @ embed.embedding.T.astype(jnp.float32)
        else:
            logits = nn.Dense(cfg.vocab_size, dtype=jnp.float32,
                              name='lm_head')(final)
        if return_hidden_states:
            return logits, hidden
        return logits


class DiMambaClassifier(nn.Module):
    """DiMamba trunk + pooling head (reference dimamba.py:1154-1235)."""
    cfg: DiMambaConfig
    num_classes: int = 2
    pooling: str = 'mean'

    @nn.compact
    def __call__(self, indices_or_one_hots, sigma, x_emb=None,
                 attention_mask=None, *, train: bool = False):
        cfg = self.cfg
        c = None
        if sigma is not None:
            c = nn.silu(TimestepEmbedder(cfg.cond_dim,
                                         name='sigma_map')(sigma))
            c = c.astype(cfg.compute_dtype)
        embed = nn.Embed(cfg.vocab_size, cfg.hidden_size,
                         name='word_embeddings')
        if x_emb is not None:
            h = x_emb.astype(cfg.compute_dtype)
        elif indices_or_one_hots.ndim == 2:
            h = embed(indices_or_one_hots).astype(cfg.compute_dtype)
        else:
            h = (indices_or_one_hots.astype(jnp.float32)
                 @ embed.embedding).astype(cfg.compute_dtype)
        residual = None
        for i in range(cfg.n_blocks):
            h, residual = DiMambaBlock(cfg, name=f'block_{i}')(
                h, residual, c, train)
        final = (h + residual.astype(h.dtype)
                 if residual is not None else h)
        x = nn.LayerNorm(dtype=jnp.float32,
                         name='norm_f')(final.astype(jnp.float32))
        if cfg.use_adaLN and c is not None:
            # reference adaLN_modulation_final (dimamba.py:741-746)
            mod = nn.Dense(2 * cfg.hidden_size,
                           kernel_init=nn.initializers.zeros,
                           bias_init=nn.initializers.zeros,
                           dtype=jnp.float32,
                           name='adaLN_final')(c.astype(jnp.float32))
            shift, scale = jnp.split(mod, 2, axis=-1)
            x = x * (1 + scale[:, None]) + shift[:, None]
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
                        name='output_layer')(x)
