"""Categorical sampling primitives (Gumbel-max, low-confidence, argmax).

Capability parity with the reference's `_sample_categorical` /
`_sample_token` (/root/reference/diffusion.py:1024-1038, 1738-1755).
Pure functions of (arrays, key); designed to live inside jit / lax.scan —
the Gumbel noise is derived from an explicit PRNG key rather than global
torch RNG state.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def gumbel_noise_like(key: jax.Array, shape, dtype=jnp.float32) -> jax.Array:
    """Standard Gumbel(0,1) noise, for log-prob-space Gumbel-max."""
    return jax.random.gumbel(key, shape, dtype=dtype)


def low_confidence_mask(probs: jax.Array, threshold: float) -> jax.Array:
    """Boolean mask of the bottom-`threshold` cumulative probability mass.

    Matches the reference's stable-sort formulation
    (diffusion.py:1741-1745): ascending sort, inclusive cumsum, keep
    classes whose cumulative mass is <= threshold, scattered back to
    vocab order. O(V log V) via argsort + take_along_axis inverse
    permutation — jit/scan-friendly static shapes at any vocab size.
    """
    order = jnp.argsort(probs, axis=-1, stable=True)
    sorted_probs = jnp.take_along_axis(probs, order, axis=-1)
    cum = jnp.cumsum(sorted_probs, axis=-1)
    keep_sorted = cum <= threshold
    inv = jnp.argsort(order, axis=-1)
    return jnp.take_along_axis(keep_sorted, inv, axis=-1)


def sample_categorical(key: jax.Array, probs: jax.Array, *,
                       low_confidence_sampling: bool = False,
                       low_confidence_threshold: float = 0.3,
                       argmax_sampling: bool = False) -> jax.Array:
    """Sample token ids from a probability tensor (..., V).

    Matches diffusion.py:1738-1755: Gumbel-max via
    argmax(probs / (1e-10 - log(U + 1e-10))).
    """
    if low_confidence_sampling:
        keep = low_confidence_mask(probs, low_confidence_threshold)
        probs = jnp.where(keep, probs, 0.0)
    if argmax_sampling:
        return jnp.argmax(probs, axis=-1)
    u = jax.random.uniform(key, probs.shape, dtype=probs.dtype)
    gumbel_norm = 1e-10 - jnp.log(u + 1e-10)
    return jnp.argmax(probs / gumbel_norm, axis=-1)


def sample_token(log_probs: jax.Array, noise: jax.Array, *,
                 low_confidence_sampling: bool = False,
                 low_confidence_threshold: float = 0.3) -> jax.Array:
    """AR token sampling with pre-drawn Gumbel noise (diffusion.py:1024-1038)."""
    if low_confidence_sampling:
        probs = jax.nn.softmax(log_probs, axis=-1)
        keep = low_confidence_mask(probs, low_confidence_threshold)
        log_probs = jnp.where(keep, log_probs, -jnp.inf)
    return jnp.argmax(log_probs + noise, axis=-1)
