"""Pipeline parallelism (GPipe) for the DiT trunk — beyond the
reference (which scales only by DDP/FSDP, configs/strategy/*.yaml).

TPU-native formulation: the 12 identical DDiT blocks are stacked into
one leading `block` axis, sharded over a 'pipe' mesh axis, and executed
under `shard_map` with a GPipe microbatch schedule — activations hop
stage-to-stage via `lax.ppermute` over ICI, and the whole schedule
(including the bubble) is a single `lax.scan`, so the compiled program
is one XLA module per device with static shapes. Backward is plain
reverse-mode AD through the scan + ppermute (transpose of ppermute is
the inverse permutation), which reproduces GPipe's fill-drain backward
schedule without any hand-written scheduling code.

Embedding, conditioning, and the output head run OUTSIDE the pipeline
region (replicated / data-sharded by GSPMD) — they are O(V*D + D^2)
versus the trunk's O(n_blocks * D^2 * L) and would otherwise force the
first/last stages to hold extra parameters.

Layout contract:
  * `to_pipeline_params(params, n_blocks)` converts a DIT params tree
    ('block_0'..'block_{n-1}' subtrees) into
    {'pipeline_blocks': stacked, <rest>} where every leaf of `stacked`
    has a leading (n_blocks, ...) axis. `from_pipeline_params` inverts
    (checkpoint interop).
  * `parallel.mesh.state_shardings` shards any '/pipeline_blocks/'
    leaf as P('pipe') on that leading axis when the mesh has a pipe
    axis > 1.

Constraints: diffusion DiT only (use_adaLN, non-causal), n_blocks must
divide by the pipe-axis size, the per-device batch by n_micro, and
`x_emb` / `return_hidden_states` hooks are not supported (use the
unpipelined model for NOS guidance).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P


def to_pipeline_params(params, n_blocks: int):
    """DIT params tree -> {'pipeline_blocks': stacked, **rest}."""
    params = dict(params)
    blocks = [params.pop(f'block_{i}') for i in range(n_blocks)]
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs, axis=0), *blocks)
    params['pipeline_blocks'] = stacked
    return params


def from_pipeline_params(params, n_blocks: int):
    """Inverse of `to_pipeline_params` (checkpoint interop)."""
    params = dict(params)
    stacked = params.pop('pipeline_blocks')
    for i in range(n_blocks):
        params[f'block_{i}'] = jax.tree.map(lambda x, i=i: x[i], stacked)
    return params


def make_pipeline_apply(cfg, mesh: Mesh, n_micro: int,
                        axis: str = 'pipe', batch_axis: str = 'data'):
    """ModelApply-protocol forward over pipeline-stacked params.

    Drop-in for `models.make_model_apply(DIT(cfg))` in the train/eval
    loss path: (params, x, sigma, cond, x_emb, *, train, rng) ->
    logits (B, L, V); params must be in `to_pipeline_params` layout.
    """
    from ddg_tpu.models.dit import (AdaLNLayerNorm, DDiTBlock,
                                    TimestepEmbedder, modulate,
                                    rope_cos_sin)

    n_stages = mesh.shape[axis]
    assert cfg.use_adaLN and not cfg.causal, (
        'pipeline_apply supports the diffusion DiT trunk only')
    assert cfg.n_blocks % n_stages == 0, (
        f'n_blocks {cfg.n_blocks} not divisible by pipe={n_stages}')
    n_local = cfg.n_blocks // n_stages
    block = DDiTBlock(cfg)
    dt = cfg.compute_dtype

    def trunk_body(stacked, x, c, cos, sin, key):
        # Everything here sees LOCAL shapes: stacked (n_local, ...),
        # x (B_local, L, D), c (B_local, C). key: (2,) uint32 or None.
        s = lax.axis_index(axis)
        if key is not None:
            # Decorrelate dropout across data shards: the key enters
            # shard_map replicated (in_specs P()), and folding only
            # (block, microbatch) below would give every data shard an
            # identical mask — a silent statistical deviation from the
            # unpipelined model's single full-batch mask.
            key = jax.random.fold_in(key, lax.axis_index(batch_axis))
        Bl, L, D = x.shape
        assert Bl % n_micro == 0, (
            f'local batch {Bl} not divisible by n_micro={n_micro}')
        Bm = Bl // n_micro
        xm = x.reshape(n_micro, Bm, L, D)
        cm = c.reshape(n_micro, Bm, c.shape[-1])

        def apply_stage(xb, cb, mi):
            def blk(h, scanned):
                bp, i = scanned
                rngs = None
                if key is not None:
                    gi = s * n_local + i
                    rngs = {'dropout': jax.random.fold_in(
                        jax.random.fold_in(key, gi), mi)}
                h = block.apply({'params': bp}, h, cos, sin, cb,
                                train=key is not None, rngs=rngs)
                return h, None
            y, _ = lax.scan(blk, xb, (stacked, jnp.arange(n_local)))
            return y

        n_ticks = n_micro + n_stages - 1
        perm = [(i, i + 1) for i in range(n_stages - 1)]
        out0 = jnp.zeros_like(xm)
        prev0 = jnp.zeros_like(xm[0])

        def tick(carry, t):
            prev, out = carry
            recv = lax.ppermute(prev, axis, perm) if perm else prev
            mi = jnp.clip(t - s, 0, n_micro - 1)  # micro idx at stage s
            inp = jnp.where(s == 0, xm[jnp.clip(t, 0, n_micro - 1)],
                            recv)
            cur = apply_stage(inp, cm[mi], mi)
            mo = t - (n_stages - 1)  # micro finishing at the last stage
            safe = jnp.clip(mo, 0, n_micro - 1)
            done = jnp.logical_and(s == n_stages - 1,
                                   jnp.logical_and(mo >= 0,
                                                   mo < n_micro))
            out = out.at[safe].set(jnp.where(done, cur, out[safe]))
            return (cur, out), None

        (_, out), _ = lax.scan(tick, (prev0, out0),
                               jnp.arange(n_ticks))
        # Broadcast the finished activations from the last stage.
        out = jnp.where(s == n_stages - 1, out, jnp.zeros_like(out))
        out = lax.psum(out, axis)
        return out.reshape(Bl, L, D)

    trunk = jax.shard_map(
        trunk_body, mesh=mesh,
        in_specs=(P(axis), P(batch_axis), P(batch_axis), P(), P(),
                  P()),
        out_specs=P(batch_axis), check_vma=False)

    def apply(params, x, sigma, cond=None, x_emb=None, *,
              train: bool = False, rng=None, **kwargs):
        assert x_emb is None and not kwargs.get('return_hidden_states'), \
            'pipeline_apply: x_emb/return_hidden_states unsupported'
        c = jax.nn.silu(TimestepEmbedder(cfg.cond_dim).apply(
            {'params': params['sigma_map']}, sigma))
        if cond is not None:
            ce = params['cond_map']['embedding'][cond]
            c = c + jax.nn.silu(ce)
        c = c.astype(dt)
        h = params['vocab_embed'][x].astype(dt)
        head_dim = cfg.hidden_size // cfg.n_heads
        cos, sin = rope_cos_sin(h.shape[1], head_dim)
        key = (rng if (train and rng is not None and cfg.dropout > 0)
               else None)
        if key is None:
            h = trunk_nokey(params['pipeline_blocks'], h, c, cos, sin)
        else:
            h = trunk(params['pipeline_blocks'], h, c, cos, sin, key)
        # Output head (identical math to models/dit.DIT.__call__).
        h = AdaLNLayerNorm(cfg.hidden_size).apply(
            {'params': params['norm_final']}, h)
        k = params['final_adaLN']['kernel'].astype(dt)
        b = params['final_adaLN']['bias'].astype(dt)
        shift, scale = jnp.split(c @ k + b, 2, axis=-1)
        h = modulate(h, shift, scale)
        ld = cfg.logits_dtype
        ok = params['output_linear']['kernel'].astype(ld)
        ob = params['output_linear']['bias'].astype(ld)
        return h.astype(ld) @ ok + ob

    def trunk_body_nokey(stacked, x, c, cos, sin):
        return trunk_body(stacked, x, c, cos, sin, None)

    trunk_nokey = jax.shard_map(
        trunk_body_nokey, mesh=mesh,
        in_specs=(P(axis), P(batch_axis), P(batch_axis), P(), P()),
        out_specs=P(batch_axis), check_vma=False)

    # The apply carries its own shard_map over (pipe, data): callers
    # (main.sample) must NOT wrap it in another shard_map — nesting
    # would put the inner shard_map inside a fully-Manual mesh context.
    apply._mesh_coupled = True
    return apply
