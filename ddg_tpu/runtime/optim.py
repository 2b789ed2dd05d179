"""Optimizer + LR schedules.

Parity targets:
  * AdamW with (beta1, beta2, eps, weight_decay) from `optim` config and
    global-norm gradient clipping 1.0 (reference diffusion.py:290-302 +
    trainer.gradient_clip_val in configs/config.yaml).
  * `constant_warmup`: transformers.get_constant_schedule_with_warmup —
    linear 0 -> lr over num_warmup_steps, then constant
    (configs/lr_scheduler/constant_warmup.yaml).
  * `cosine_decay_warmup`: timm CosineLRScheduler with warmup_prefix —
    linear warmup_lr_init -> lr over warmup_t, then cosine lr -> lr_min
    over t_initial (configs/lr_scheduler/cosine_decay_warmup.yaml,
    reference utils.py:38-69).
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import optax


@dataclasses.dataclass(frozen=True)
class OptimSpec:
    lr: float = 3e-4
    beta1: float = 0.9
    beta2: float = 0.999
    eps: float = 1e-8
    weight_decay: float = 0.0
    grad_clip: float = 1.0
    scheduler: str = 'constant_warmup'
    num_warmup_steps: int = 2500
    # cosine_decay_warmup params (reference defaults):
    max_steps: int = 1_000_000
    warmup_frac: float = 0.1
    warmup_lr_init: float = 1e-6
    lr_min: float = 1e-6


def constant_warmup_schedule(lr: float, num_warmup_steps: int):
    if num_warmup_steps <= 0:
        return lambda step: jnp.asarray(lr, jnp.float32)

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = step / jnp.maximum(1.0, num_warmup_steps)
        return lr * jnp.minimum(1.0, warm)
    return schedule


def cosine_decay_warmup_schedule(lr: float, warmup_t: int,
                                 t_initial: int, warmup_lr_init: float,
                                 lr_min: float):
    """timm CosineLRScheduler(t_in_epochs=False, warmup_prefix=True)."""
    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = warmup_lr_init + step * (lr - warmup_lr_init) / jnp.maximum(
            1.0, warmup_t)
        t = jnp.clip(step - warmup_t, 0.0, t_initial)
        cos = lr_min + 0.5 * (lr - lr_min) * (
            1.0 + jnp.cos(jnp.pi * t / jnp.maximum(1.0, t_initial)))
        return jnp.where(step < warmup_t, warm, cos)
    return schedule


def make_schedule(spec: OptimSpec):
    if spec.scheduler == 'constant_warmup':
        return constant_warmup_schedule(spec.lr, spec.num_warmup_steps)
    if spec.scheduler == 'cosine_decay_warmup':
        warmup_t = int(spec.warmup_frac * spec.max_steps)
        t_initial = spec.max_steps - warmup_t
        return cosine_decay_warmup_schedule(
            spec.lr, warmup_t, t_initial, spec.warmup_lr_init,
            spec.lr_min)
    raise NotImplementedError(
        f'LR scheduler {spec.scheduler} not implemented.')


def make_optimizer(spec: OptimSpec) -> optax.GradientTransformation:
    schedule = make_schedule(spec)
    return optax.chain(
        optax.clip_by_global_norm(spec.grad_clip),
        optax.adamw(learning_rate=schedule, b1=spec.beta1, b2=spec.beta2,
                    eps=spec.eps, weight_decay=spec.weight_decay),
    )
