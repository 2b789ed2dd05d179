"""Denoiser backbones (DiT, DiMamba, UNet) and the ModelApply adapters
bridging flax modules to the functional diffusion core."""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ddg_tpu.models.dit import DIT, DITClassifier, DITConfig  # noqa: F401
from ddg_tpu.models.hyenadna import (HyenaDNAClassifier,  # noqa: F401
                                     HyenaDNAConfig)


def _dropout_rng(rng):
    """Dropout stream on the hardware RBG generator.

    Threefry mask bits are ~24% of a DiT-small train step on v5e
    (measured: 131K -> 163K tok/s with dropout off entirely); the
    dropout stream needs no counter-based reproducibility guarantees,
    so rebase the threefry key onto the fast 'rbg' impl. Loss/corruption
    RNG stays threefry (checkpoint/resume reproducibility)."""
    data = jax.random.key_data(rng)
    return jax.random.wrap_key_data(
        jnp.concatenate([data, data]).astype(jnp.uint32), impl='rbg')


def jit_init(module, rng, *args, **kwargs):
    """flax `module.init` as ONE locally-compiled program.

    Eager init executes the traced forward primitive-by-primitive, and
    on a remote-compile backend (the axon TPU tunnel) every distinct
    primitive signature is its own blocking compile round-trip:
    measured 263 s for a TINY 0.27M-param DiT init on chip. Jitting
    the init and running it remotely is no better (the one-off init
    program itself compiled for 300-460 s on the remote service), so
    on non-CPU backends the init runs as one jitted program on the
    HOST CPU backend and the params are uploaded with device_put —
    measured 3.7 s + 1.4 s for the same model. Bit-identical params
    either way: threefry RNG is backend-deterministic (the test suite
    already relies on this). Trace-time sharding guards
    (dit._tp_constrain/_ambient_axis_size) behave identically under
    jit with no ambient mesh."""
    if jax.default_backend() == 'cpu':
        return jax.jit(module.init)(rng, *args, **kwargs)
    try:
        cpu = jax.local_devices(backend='cpu')[0]
    except RuntimeError:
        return jax.jit(module.init)(rng, *args, **kwargs)
    rng, args, kwargs = jax.tree.map(
        lambda x: jax.device_put(x, cpu), (rng, args, kwargs))
    with jax.default_device(cpu):
        out = jax.jit(module.init)(rng, *args, **kwargs)
    return jax.device_put(out, jax.devices()[0])


def make_model_apply(module):
    """Wrap a flax denoiser module into the ModelApply protocol:
    (params, x, sigma, cond, x_emb, *, train, rng,
     return_hidden_states=False) -> logits [,(hidden)]."""

    def apply(params, x, sigma, cond=None, x_emb=None, *,
              train: bool = False, rng=None,
              return_hidden_states: bool = False, **kwargs):
        rngs = ({'dropout': _dropout_rng(rng)}
                if (train and rng is not None) else None)
        return module.apply(
            {'params': params}, x, sigma, cond, x_emb, train=train,
            return_hidden_states=return_hidden_states, rngs=rngs,
            **kwargs)

    # Mesh-coupled backbones (TP/SP sharding constraints, ring
    # attention's ambient-mesh shard_map, DiMamba sequence-parallel
    # scan) cannot run inside another shard_map's fully-Manual mesh
    # context — main.sample must take the direct-jit path for them.
    mcfg = getattr(module, 'cfg', None)
    apply._mesh_coupled = bool(
        getattr(mcfg, 'tensor_axis', None)
        or getattr(mcfg, 'sequence_axis', None))
    return apply


def make_classifier_apply(module):
    """Classifier protocol: (params, x_or_one_hot, sigma, x_emb=None,
    attention_mask=None) -> logits (B, ..., num_classes)."""

    def apply(params, x, sigma, x_emb=None, attention_mask=None, *,
              train: bool = False, rng=None):
        rngs = ({'dropout': _dropout_rng(rng)}
                if (train and rng is not None) else None)
        return module.apply({'params': params}, x, sigma, x_emb,
                            attention_mask, train=train, rngs=rngs)

    return apply
