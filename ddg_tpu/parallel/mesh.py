"""Device mesh + sharding rules.

Replaces the reference's DDP/FSDP Lightning strategies
(/root/reference/configs/strategy/{ddp,fsdp}.yaml, SURVEY §2.8) with a
4-D `jax.sharding.Mesh` ('data', 'fsdp', 'tensor', 'pipe'):

  * data parallel  — batches sharded over 'data'; because the loss is a
    global mean inside one jitted program, XLA inserts the gradient
    psum over ICI automatically (the NCCL all-reduce equivalent).
  * fsdp (ZeRO / SHARD_GRAD_OP equivalent) — parameters and optimizer
    state sharded over 'fsdp' on their largest divisible axis; XLA
    inserts all-gathers for forward/backward and keeps optimizer
    updates sharded (reduce-scatter), matching FSDPStrategy semantics.
  * tensor parallel (beyond the reference, Megatron-style) — DiT
    attention heads and MLP hidden sharded over 'tensor'
    (TENSOR_PARAM_RULES below + the activation constraints
    models/dit.py emits when DITConfig.tensor_axis is set); XLA inserts
    the per-block psum pair over ICI.
  * sequence/context parallel (DITConfig.tp_mode='sequence') — the
    same 'tensor' axis shards ACTIVATIONS over L instead (params
    replicated/fsdp, tensor_rules=False here); XLA all-gathers K/V per
    attention so each device computes its L-shard. For long-L
    workloads where activations are the HBM bound.
  * pipeline parallel (parallel/pipeline.py, GPipe) — stacked DDiT
    blocks sharded over 'pipe' (leading block axis, rule below);
    activations hop stages via lax.ppermute inside shard_map, the
    schedule is one lax.scan.

Expert parallelism ('ep') is deliberately absent: none of the
reference's model families (DiT / DiMamba / UNet) has a
mixture-of-experts layer, so there is no expert axis to shard.

Everything is sharding-annotation driven: compute code never changes
(the one exception: DiT emits with_sharding_constraint hints under
tensor parallelism, no-ops otherwise).
"""

from __future__ import annotations

import re
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import mesh_utils
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(num_data: Optional[int] = None, num_fsdp: int = 1,
              num_tensor: int = 1, num_pipe: int = 1,
              devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    if num_data is None:
        num_data = len(devices) // (num_fsdp * num_tensor * num_pipe)
    assert num_data * num_fsdp * num_tensor * num_pipe == len(devices), (
        f'mesh {num_data}x{num_fsdp}x{num_tensor}x{num_pipe} != '
        f'{len(devices)} devices')
    dev_array = mesh_utils.create_device_mesh(
        (num_data, num_fsdp, num_tensor, num_pipe), devices=devices)
    return Mesh(dev_array, ('data', 'fsdp', 'tensor', 'pipe'))


# Megatron-style sharding for the DiT block params (matched against the
# '/'-joined param path, which optimizer/EMA mirrors share). attn_qkv
# stays replicated/fsdp: its fused output dim is (3, heads, head_dim)
# flattened, which 'tensor' cannot split contiguously; XLA slices it at
# the use point from the head-sharded activation constraint instead.
TENSOR_PARAM_RULES = (
    (re.compile(r'/attn_out/kernel$'), P('tensor', None)),
    (re.compile(r'/mlp_in/kernel$'), P(None, 'tensor')),
    (re.compile(r'/mlp_in/bias$'), P('tensor')),
    (re.compile(r'/mlp_out/kernel$'), P('tensor', None)),
)


def tensor_param_pspec(path: str, shape) -> Optional[P]:
    for rx, spec in TENSOR_PARAM_RULES:
        if rx.search(path):
            if len(spec) != len(shape):
                return None
            return spec
    return None


def batch_pspec(accum: bool = False) -> P:
    """Batch sharding: rows over the data axis.

    With grad accumulation the host batch carries a leading
    (accum, micro, ...) layout — the ROWS dim is dim 1 (sharding dim 0
    would scatter the accumulation steps across devices and force a
    gather on every scan iteration)."""
    return P(None, 'data') if accum else P('data')


def param_pspec(shape, fsdp_size: int, min_size: int = 2 ** 14) -> P:
    """Shard the largest fsdp-divisible axis; replicate small params."""
    if fsdp_size <= 1 or len(shape) == 0:
        return P()
    if int(np.prod(shape)) < min_size:
        return P()
    # Largest axis divisible by fsdp_size
    best = None
    for i, d in enumerate(shape):
        if d % fsdp_size == 0 and (best is None or d > shape[best]):
            best = i
    if best is None:
        return P()
    spec = [None] * len(shape)
    spec[best] = 'fsdp'
    return P(*spec)


def state_shardings(mesh: Mesh, state, min_size: int = 2 ** 14,
                    tensor_rules: bool = True):
    """NamedShardings for a TrainState-like pytree: arrays matching a
    tensor-parallel rule get tensor sharding, others the fsdp rule;
    scalars/rng replicated. Optimizer moments and EMA shadows mirror
    the param tree structure, so the path rules cover them too.
    tensor_rules=False skips the TP param rules (sequence/context
    parallelism: the tensor axis shards activations over L, params
    stay replicated/fsdp)."""
    fsdp_size = mesh.shape['fsdp']
    tensor_size = dict(mesh.shape).get('tensor', 1)

    pipe_size = dict(mesh.shape).get('pipe', 1)

    def leaf_sharding(path, x):
        shape = getattr(x, 'shape', ())
        pstr = '/' + '/'.join(
            str(getattr(k, 'key', getattr(k, 'name', k)))
            for k in path)
        if (pipe_size > 1 and '/pipeline_blocks/' in pstr
                and len(shape) >= 1 and shape[0] % pipe_size == 0):
            # Stacked DDiT blocks: leading axis = block index, one
            # contiguous slab of blocks per pipeline stage.
            return NamedSharding(mesh, P('pipe'))
        if tensor_rules and tensor_size > 1:
            spec = tensor_param_pspec(pstr, shape)
            if spec is not None and all(
                    d % tensor_size == 0 for d, a in zip(shape, spec)
                    if a == 'tensor'):
                return NamedSharding(mesh, spec)
        return NamedSharding(mesh, param_pspec(shape, fsdp_size,
                                               min_size=min_size))

    return jax.tree_util.tree_map_with_path(leaf_sharding, state)


def batch_shardings(mesh: Mesh, batch, accum: bool = False):
    return jax.tree.map(
        lambda _: NamedSharding(mesh, batch_pspec(accum)), batch)


def replicated(mesh: Mesh):
    return NamedSharding(mesh, P())


def shard_train_step(mesh: Mesh, train_step, state, batch,
                     tensor_rules: bool = True, accum: bool = False):
    """jit the train step with explicit in/out shardings.

    Returns (jitted_step, sharded_state, place_batch) where place_batch
    moves a host batch onto the mesh. `accum=True` marks batches with a
    leading (accum, micro, ...) layout so rows (dim 1) shard over data.
    """
    st_sh = state_shardings(mesh, state, tensor_rules=tensor_rules)
    b_sh = batch_shardings(mesh, batch, accum)
    metric_sh = replicated(mesh)

    # metric_sh is a prefix pytree: one sharding applies to all metrics.
    # Donating the input state lets XLA alias params/opt/EMA buffers
    # in-place instead of allocating+copying the full state every step
    # (~4x params bytes: params + 2 Adam moments + EMA shadow).
    jitted_raw = jax.jit(
        train_step,
        in_shardings=(st_sh, b_sh),
        out_shardings=(st_sh, metric_sh),
        donate_argnums=(0,))

    def jitted(state, batch):
        # Trace/execute under the ambient-mesh context so
        # bare-PartitionSpec with_sharding_constraint hints AND
        # ambient-mesh shard_map regions inside the model (tensor /
        # sequence / ring parallelism, models/dit.py) resolve axis
        # names.
        with jax.set_mesh(mesh):
            return jitted_raw(state, batch)

    # expose lower/compile for cost-analysis probes (__graft_entry__)
    def _lower(state, batch):
        with jax.set_mesh(mesh):
            return jitted_raw.lower(state, batch)
    jitted.lower = _lower

    def place_state(s):
        # Deep copy, not just placement: device_put is a no-op for a
        # leaf already on device with the right sharding, and the
        # donating step would then delete the CALLER's buffer (e.g. a
        # shared PRNG key) out from under it on the first execute.
        s = jax.tree.map(lambda x: jnp.array(x, copy=True), s)
        return jax.device_put(s, st_sh)

    def place_batch(b):
        return jax.device_put(b, batch_shardings(mesh, b, accum))

    return jitted, place_state, place_batch


def shard_sample_fn(mesh: Mesh, local_sample_fn, params):
    """Data-parallel guided generation (the BASELINE.json north-star
    layout): each device runs the FULL lax.scan reverse process on its
    shard of the sample batch with an independent fold-in PRNG key; no
    collectives during sampling.

    Built on shard_map (not plain jit sharding propagation) because the
    fused Pallas denoise kernels are opaque custom calls GSPMD cannot
    partition — inside shard_map each device sees local shapes and the
    kernel runs unmodified per-shard.

    local_sample_fn(params, key) -> (local_B, L) tokens; the caller
    bakes in local_B = global_B // mesh.shape['data'].

    Returns (jitted(params, key) -> (global_B, L), placed_params).
    """
    ndata = mesh.shape['data']
    rep = NamedSharding(mesh, P())

    def body(params, keys):
        return local_sample_fn(params, keys[0])

    sharded = jax.shard_map(body, mesh=mesh,
                            in_specs=(P(), P('data')),
                            out_specs=P('data'), check_vma=False)

    @jax.jit
    def global_fn(params, key):
        return sharded(params, jax.random.split(key, ndata))

    params = jax.device_put(params, rep)
    return global_fn, params
