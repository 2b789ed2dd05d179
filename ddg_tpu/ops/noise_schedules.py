"""Noise schedules for discrete diffusion, as pure jittable functions.

Capability parity with the reference's `noise_schedule.py` (see
/root/reference/noise_schedule.py:13-160): loglinear, linear, geometric,
cosine, cosinesqr, plus the importance-sampling time transformations for
loglinear and linear.

Design: each schedule is a frozen dataclass of *static* Python floats.
Instances are hashable and are closed over by `jax.jit`-ed functions, so a
schedule change triggers a (cached) recompile instead of runtime branching —
there is no `nn.Module` state to carry through the train step. The (empty)
torch parameter list of the reference schedules never receives gradients, so
nothing is lost by making these static.

sigma(t) is the integrated noise ("total noise"); dsigma(t) = d sigma / dt
("rate noise"). Time t runs in [0, 1]. alpha(t) = exp(-sigma(t)) is the
keep-probability of the forward process.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Tuple

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class NoiseSchedule:
    """Base class. Subclasses implement total_noise / rate_noise."""

    def total_noise(self, t):
        raise NotImplementedError

    def rate_noise(self, t):
        raise NotImplementedError

    def inverse_total_noise(self, sigma):
        """t such that total_noise(t) == sigma (exists for every
        schedule here; used by the first-hitting sampler to map
        uniform move-chance quantiles to decode times)."""
        raise NotImplementedError

    def __call__(self, t) -> Tuple[jnp.ndarray, jnp.ndarray]:
        return self.total_noise(t), self.rate_noise(t)

    # sigma bounds used by change-of-variables / importance sampling.
    @property
    def sigma_min(self) -> float:
        raise NotImplementedError

    @property
    def sigma_max(self) -> float:
        raise NotImplementedError


@dataclasses.dataclass(frozen=True)
class LogLinearNoise(NoiseSchedule):
    """sigma(t) = -log1p(-(1 - eps) * t).

    The workhorse schedule: 1 - exp(-sigma(t)) = (1 - eps) * t, i.e. the
    move chance is linear in t (reference noise_schedule.py:134-160).
    """

    eps: float = 1e-3

    def rate_noise(self, t):
        return (1 - self.eps) / (1 - (1 - self.eps) * t)

    def total_noise(self, t):
        return -jnp.log1p(-(1 - self.eps) * t)

    def inverse_total_noise(self, sigma):
        return -jnp.expm1(-sigma) / (1 - self.eps)

    @property
    def sigma_min(self) -> float:
        # eps + total_noise(0) == eps (reference parity: sigma_min includes
        # the additive eps, noise_schedule.py:146-147).
        return self.eps

    @property
    def sigma_max(self) -> float:
        return -math.log1p(-(1 - self.eps))

    def importance_sampling_transformation(self, t):
        f_t = math.log1p(-math.exp(-self.sigma_max))
        f_0 = math.log1p(-math.exp(-self.sigma_min))
        sigma_t = -jnp.log1p(-jnp.exp(t * f_t + (1 - t) * f_0))
        return -jnp.expm1(-sigma_t) / (1 - self.eps)


@dataclasses.dataclass(frozen=True)
class LinearNoise(NoiseSchedule):
    """sigma(t) = sigma_min + t * (sigma_max - sigma_min)."""

    sigma_min_val: float = 0.0
    sigma_max_val: float = 10.0

    def rate_noise(self, t):
        return jnp.full_like(
            jnp.asarray(t, dtype=jnp.result_type(t, jnp.float32)),
            self.sigma_max_val - self.sigma_min_val)

    def total_noise(self, t):
        return self.sigma_min_val + t * (
            self.sigma_max_val - self.sigma_min_val)

    def inverse_total_noise(self, sigma):
        return (sigma - self.sigma_min_val) / (
            self.sigma_max_val - self.sigma_min_val)

    @property
    def sigma_min(self) -> float:
        return self.sigma_min_val

    @property
    def sigma_max(self) -> float:
        return self.sigma_max_val

    def importance_sampling_transformation(self, t):
        f_t = math.log1p(-math.exp(-self.sigma_max_val))
        f_0 = math.log1p(-math.exp(-self.sigma_min_val)) \
            if self.sigma_min_val > 0 else -float('inf')
        # For sigma_min == 0 the reference formula degenerates
        # (log1p(-exp(0)) = -inf); mirror the same math in float space.
        sigma_t = -jnp.log1p(-jnp.exp(t * f_t + (1 - t) * f_0))
        return (sigma_t - self.sigma_min_val) / (
            self.sigma_max_val - self.sigma_min_val)


@dataclasses.dataclass(frozen=True)
class GeometricNoise(NoiseSchedule):
    sigma_min_val: float = 1e-3
    sigma_max_val: float = 1.0

    def rate_noise(self, t):
        return (self.sigma_min_val ** (1 - t)
                * self.sigma_max_val ** t
                * (math.log(self.sigma_max_val)
                   - math.log(self.sigma_min_val)))

    def total_noise(self, t):
        return self.sigma_min_val ** (1 - t) * self.sigma_max_val ** t

    def inverse_total_noise(self, sigma):
        lo = math.log(self.sigma_min_val)
        hi = math.log(self.sigma_max_val)
        return (jnp.log(sigma) - lo) / (hi - lo)

    @property
    def sigma_min(self) -> float:
        return self.sigma_min_val

    @property
    def sigma_max(self) -> float:
        return self.sigma_max_val


@dataclasses.dataclass(frozen=True)
class CosineNoise(NoiseSchedule):
    eps: float = 1e-3

    def rate_noise(self, t):
        cos = (1 - self.eps) * jnp.cos(t * jnp.pi / 2)
        sin = (1 - self.eps) * jnp.sin(t * jnp.pi / 2)
        return (jnp.pi / 2) * sin / (cos + self.eps)

    def total_noise(self, t):
        cos = jnp.cos(t * jnp.pi / 2)
        return -jnp.log(self.eps + (1 - self.eps) * cos)

    def inverse_total_noise(self, sigma):
        cos = (jnp.exp(-sigma) - self.eps) / (1 - self.eps)
        return jnp.arccos(jnp.clip(cos, -1.0, 1.0)) * 2 / jnp.pi

    @property
    def sigma_min(self) -> float:
        return -math.log(self.eps + (1 - self.eps))

    @property
    def sigma_max(self) -> float:
        return -math.log(self.eps)


@dataclasses.dataclass(frozen=True)
class CosineSqrNoise(NoiseSchedule):
    eps: float = 1e-3

    def rate_noise(self, t):
        cos = (1 - self.eps) * jnp.cos(t * jnp.pi / 2) ** 2
        sin = (1 - self.eps) * jnp.sin(t * jnp.pi)
        return (jnp.pi / 2) * sin / (cos + self.eps)

    def total_noise(self, t):
        cos = jnp.cos(t * jnp.pi / 2) ** 2
        return -jnp.log(self.eps + (1 - self.eps) * cos)

    def inverse_total_noise(self, sigma):
        cos2 = (jnp.exp(-sigma) - self.eps) / (1 - self.eps)
        cos = jnp.sqrt(jnp.clip(cos2, 0.0, 1.0))
        return jnp.arccos(jnp.clip(cos, -1.0, 1.0)) * 2 / jnp.pi

    @property
    def sigma_min(self) -> float:
        return -math.log(self.eps + (1 - self.eps))

    @property
    def sigma_max(self) -> float:
        return -math.log(self.eps)


def get_noise(noise_type: str, sigma_min: float = 1e-4,
              sigma_max: float = 20.0) -> NoiseSchedule:
    """Factory matching the reference's `get_noise` dispatch."""
    if noise_type == 'loglinear':
        return LogLinearNoise()
    if noise_type == 'linear':
        return LinearNoise(sigma_min, sigma_max)
    if noise_type == 'geometric':
        return GeometricNoise(sigma_min, sigma_max)
    if noise_type == 'cosine':
        return CosineNoise()
    if noise_type == 'cosinesqr':
        return CosineSqrNoise()
    raise NotImplementedError(
        f'{noise_type} noise schedule is not implemented.')
