"""Ring attention: sequence-parallel attention with bounded memory.

The plain sequence-parallel mode (models/dit.py tp_mode='sequence')
lets GSPMD all-gather the full K/V onto every device — O(L) memory per
device regardless of the mesh. Ring attention (Liu et al. 2023,
arXiv:2310.01889) keeps K/V sharded: each device holds its L/n shard
of Q permanently and its K/V shard circulates around the 'tensor' ring
via `lax.ppermute` over ICI, with flash-attention-style online-softmax
accumulation so the (Lq, Lk) score block never materializes for more
than one ring step. Per-device memory is O(L/n), collectives are
point-to-point neighbor hops (ICI-friendly), and compute/communication
overlap is XLA's latency-hiding scheduler's job (the ppermute for step
t+1 is independent of step t's matmuls).

Non-causal only — the diffusion DiT trunk is bidirectional; the causal
AR path never runs sequence-parallel. Backward is plain AD through the
`lax.scan` ring (ppermute transposes to the reverse rotation).

Used by models/dit.py when DITConfig.tp_mode == 'ring'; requires the
jit to run under `jax.set_mesh(mesh)` (parallel/mesh.shard_train_step
provides it).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import PartitionSpec as P


def _ring_body(q, k, v, *, axis: str, n_ring: int):
    """Local online-softmax accumulation over the K/V ring.

    q, k, v: (B_local, L_local, H, Dh) — the local shards. Returns the
    local output shard (B_local, L_local, H, Dh).
    """
    scale = 1.0 / math.sqrt(q.shape[-1])
    qf = q.astype(jnp.float32) * scale
    B, Lq, H, Dh = qf.shape
    perm = [(i, (i + 1) % n_ring) for i in range(n_ring)]

    m0 = jnp.full((B, Lq, H, 1), -jnp.inf, jnp.float32)
    acc0 = jnp.zeros((B, Lq, H, Dh), jnp.float32)
    den0 = jnp.zeros((B, Lq, H, 1), jnp.float32)

    def step(carry, _):
        k_blk, v_blk, m, acc, den = carry
        s = jnp.einsum('blhd,bmhd->blhm', qf,
                       k_blk.astype(jnp.float32))
        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        corr = jnp.exp(m - m_new)
        acc = acc * corr + jnp.einsum('blhm,bmhd->blhd', p,
                                      v_blk.astype(jnp.float32))
        den = den * corr + jnp.sum(p, axis=-1, keepdims=True)
        # rotate the K/V shard to the next device; after n_ring steps
        # every device has seen every shard (and holds its own again).
        k_blk = lax.ppermute(k_blk, axis, perm)
        v_blk = lax.ppermute(v_blk, axis, perm)
        return (k_blk, v_blk, m_new, acc, den), None

    # Remat the ring step: without it, AD saves each step's
    # (B, Lq, H, Lk) probability block — n_ring of them is the FULL
    # (Lq, L) score matrix per device, i.e. exactly the O(L) blow-up
    # ring attention exists to avoid (~13 GB at L=32K, H=12, n=4,
    # fp32). Checkpointed, the backward recomputes s/p from the saved
    # per-step carries (K/V/m/acc/den shards, O(L/n) each), keeping
    # training memory O(L/n * n_ring) in small tensors only.
    step = jax.checkpoint(step, prevent_cse=False)
    (_, _, _, acc, den), _ = lax.scan(step, (k, v, m0, acc0, den0),
                                      None, length=n_ring)
    return (acc / den).astype(q.dtype)


def ring_attention(q, k, v, *, axis: str, batch_axis: str = 'data'):
    """Sequence-parallel non-causal attention over the `axis` ring.

    q, k, v: (B, L, H, Dh) GLOBAL arrays inside a jitted program under
    `jax.set_mesh`; L must divide by the axis size. Output matches
    `jax.nn.dot_product_attention(q, k, v)` up to fp32 accumulation
    order.
    """
    mesh = jax.sharding.get_abstract_mesh()
    n_ring = mesh.shape[axis]
    spec = P(batch_axis, axis, None, None)

    body = jax.shard_map(
        lambda q, k, v: _ring_body(q, k, v, axis=axis, n_ring=n_ring),
        in_specs=(spec, spec, spec), out_specs=spec, check_vma=False)
    return body(q, k, v)
