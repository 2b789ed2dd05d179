"""Weight averaging (EMA / SWA) as pure pytree transforms.

Capability parity with the reference's `models/ema.py` and
`models/swa.py` (identical public semantics: update-per-optimizer-step,
copy_to/store/restore, state_dict round-trip), but stateless: averaging
state is a pytree inside the TrainState, updated inside the jitted train
step — no host-side parameter list walking.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class AveragingState:
    """Shadow parameters + counters; covers both EMA and SWA.

    EMA (ema.py:29-50): decay_t = min(decay, (1+n)/(10+n)) when
    use_num_updates, shadow <- shadow - (1-decay_t) * (shadow - params).
    SWA (swa.py:54-69): after start_step, every avg_frequency steps,
    shadow <- shadow + (params - shadow) / num_snapshots.
    """
    shadow_params: Any
    num_updates: jax.Array  # EMA update count / SWA snapshot count
    step_counter: jax.Array  # SWA: counts every update() call


@dataclasses.dataclass(frozen=True)
class AveragingSpec:
    kind: str                    # 'ema' | 'swa' | 'none'
    decay: float = 0.9999        # ema
    use_num_updates: bool = True  # ema
    start_step: int = 0          # swa
    avg_frequency: int = 1       # swa

    @staticmethod
    def ema(decay: float, use_num_updates: bool = True) -> 'AveragingSpec':
        return AveragingSpec(kind='ema', decay=decay,
                             use_num_updates=use_num_updates)

    @staticmethod
    def swa(max_steps: int, start_pct: float,
            num_snapshots: int) -> 'AveragingSpec':
        # Mirrors the derivation in reference diffusion.py:154-163.
        start_step = int(max_steps * start_pct)
        avg_frequency = max(1, (max_steps - start_step) // num_snapshots)
        return AveragingSpec(kind='swa', start_step=start_step,
                             avg_frequency=avg_frequency)


def init(spec: AveragingSpec, params) -> Optional[AveragingState]:
    if spec.kind == 'none':
        return None
    # jnp.asarray would alias the param buffers; the shadow must be a
    # COPY — the donated train step would otherwise try to donate the
    # same buffer through both state.params and state.averaging.
    return AveragingState(
        shadow_params=jax.tree.map(lambda p: jnp.array(p, copy=True),
                                   params),
        num_updates=jnp.zeros((), jnp.int32),
        step_counter=jnp.zeros((), jnp.int32))


def update(spec: AveragingSpec, state: Optional[AveragingState],
           params) -> Optional[AveragingState]:
    """One averaging step; call after each optimizer step."""
    if state is None:
        return None
    if spec.kind == 'ema':
        n = state.num_updates + 1
        decay = jnp.asarray(spec.decay, jnp.float32)
        if spec.use_num_updates:
            decay = jnp.minimum(decay, (1.0 + n) / (10.0 + n))
        shadow = jax.tree.map(
            lambda s, p: s - (1.0 - decay) * (s - p),
            state.shadow_params, params)
        return AveragingState(shadow, n, state.step_counter + 1)
    if spec.kind == 'swa':
        step = state.step_counter + 1
        past_burn_in = step >= spec.start_step
        on_snapshot = ((step - spec.start_step) % spec.avg_frequency) == 0
        take = jnp.logical_and(past_burn_in, on_snapshot)
        n = state.num_updates + take.astype(jnp.int32)
        inv_n = jnp.where(n > 0, 1.0 / jnp.maximum(n, 1), 0.0)
        shadow = jax.tree.map(
            lambda avg, p: jnp.where(take, avg + (p - avg) * inv_n, avg),
            state.shadow_params, params)
        return AveragingState(shadow, n, step)
    raise NotImplementedError(f'Averaging type {spec.kind} not implemented.')


def averaged_params(state: Optional[AveragingState], params):
    """Parameters to evaluate with: shadow if averaging, else live
    (reference `load_ema_params`, diffusion.py:923-930 — store/restore
    is unnecessary here because params are immutable pytrees)."""
    if state is None:
        return params
    return state.shadow_params
