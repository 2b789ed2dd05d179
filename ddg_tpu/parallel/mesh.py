"""Device mesh + sharding rules.

Replaces the reference's DDP/FSDP Lightning strategies
(/root/reference/configs/strategy/{ddp,fsdp}.yaml, SURVEY §2.8) with a
2-D `jax.sharding.Mesh` ('data', 'fsdp'):

  * data parallel  — batches sharded over 'data'; because the loss is a
    global mean inside one jitted program, XLA inserts the gradient
    psum over ICI automatically (the NCCL all-reduce equivalent).
  * fsdp (ZeRO / SHARD_GRAD_OP equivalent) — parameters and optimizer
    state sharded over 'fsdp' on their largest divisible axis; XLA
    inserts all-gathers for forward/backward and keeps optimizer
    updates sharded (reduce-scatter), matching FSDPStrategy semantics.

Everything is sharding-annotation driven: compute code never changes.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import mesh_utils
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(num_data: Optional[int] = None, num_fsdp: int = 1,
              devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    if num_data is None:
        num_data = len(devices) // num_fsdp
    assert num_data * num_fsdp == len(devices), (
        f'mesh {num_data}x{num_fsdp} != {len(devices)} devices')
    dev_array = mesh_utils.create_device_mesh(
        (num_data, num_fsdp), devices=devices)
    return Mesh(dev_array, ('data', 'fsdp'))


def batch_pspec() -> P:
    return P('data')


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


def state_shardings(mesh: Mesh, state, min_size: int = 2 ** 14):
    """NamedShardings for a TrainState-like pytree: arrays matching the
    param rule get fsdp sharding; scalars/rng replicated."""
    fsdp_size = mesh.shape['fsdp']

    def leaf_sharding(x):
        shape = getattr(x, 'shape', ())
        return NamedSharding(mesh, param_pspec(shape, fsdp_size,
                                               min_size=min_size))

    return jax.tree.map(leaf_sharding, state)


def batch_shardings(mesh: Mesh, batch):
    return jax.tree.map(
        lambda _: NamedSharding(mesh, batch_pspec()), batch)


def replicated(mesh: Mesh):
    return NamedSharding(mesh, P())


def shard_train_step(mesh: Mesh, train_step, state, batch):
    """jit the train step with explicit in/out shardings.

    Returns (jitted_step, sharded_state, place_batch) where place_batch
    moves a host batch onto the mesh.
    """
    st_sh = state_shardings(mesh, state)
    b_sh = batch_shardings(mesh, batch)
    metric_sh = replicated(mesh)

    # metric_sh is a prefix pytree: one sharding applies to all metrics.
    # Donating the input state lets XLA alias params/opt/EMA buffers
    # in-place instead of allocating+copying the full state every step
    # (~4x params bytes: params + 2 Adam moments + EMA shadow).
    jitted = jax.jit(
        train_step,
        in_shardings=(st_sh, b_sh),
        out_shardings=(st_sh, metric_sh),
        donate_argnums=(0,))

    def place_state(s):
        # Deep copy, not just placement: device_put is a no-op for a
        # leaf already on device with the right sharding, and the
        # donating step would then delete the CALLER's buffer (e.g. a
        # shared PRNG key) out from under it on the first execute.
        s = jax.tree.map(lambda x: jnp.array(x, copy=True), s)
        return jax.device_put(s, st_sh)

    def place_batch(b):
        return jax.device_put(b, batch_shardings(mesh, b))

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
