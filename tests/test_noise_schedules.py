"""Parity tests: our jnp noise schedules vs the reference torch ones.

The reference `noise_schedule.py` imports only torch, so we can load it
directly (CPU) and compare values to < 1e-6.
"""

import sys

import numpy as np
import pytest
import torch

sys.path.insert(0, "/root/reference")
import noise_schedule as ref_ns  # noqa: E402

from ddg_tpu.ops import noise_schedules as ns


TS = np.linspace(0.001, 0.999, 57).astype(np.float32)


def _compare(ours, ref, ts=TS, atol=2e-4, rtol=5e-4):
    t_torch = torch.tensor(ts)
    ref_total = ref.total_noise(t_torch).numpy()
    ref_rate = ref.rate_noise(t_torch)
    if not torch.is_tensor(ref_rate) or ref_rate.ndim == 0:
        ref_rate = np.broadcast_to(np.asarray(ref_rate), ts.shape)
    else:
        ref_rate = ref_rate.numpy()
    our_total = np.asarray(ours.total_noise(ts))
    our_rate = np.broadcast_to(np.asarray(ours.rate_noise(ts)), ts.shape)
    np.testing.assert_allclose(our_total, ref_total, atol=atol, rtol=rtol)
    np.testing.assert_allclose(our_rate, ref_rate, atol=atol, rtol=rtol)


def test_loglinear():
    _compare(ns.LogLinearNoise(), ref_ns.LogLinearNoise())


def test_loglinear_bounds():
    ours, ref = ns.LogLinearNoise(), ref_ns.LogLinearNoise()
    assert np.isclose(ours.sigma_max, ref.sigma_max.item())
    assert np.isclose(ours.sigma_min, ref.sigma_min.item())


def test_loglinear_importance_sampling():
    ours, ref = ns.LogLinearNoise(), ref_ns.LogLinearNoise()
    ref_t = ref.importance_sampling_transformation(
        torch.tensor(TS)).numpy()
    our_t = np.asarray(ours.importance_sampling_transformation(TS))
    np.testing.assert_allclose(our_t, ref_t, atol=2e-4, rtol=5e-4)


def test_linear():
    _compare(ns.LinearNoise(1e-4, 20.0), ref_ns.Linear(1e-4, 20.0))


def test_linear_importance_sampling():
    ours = ns.LinearNoise(1e-4, 20.0)
    ref = ref_ns.Linear(1e-4, 20.0)
    ref_t = ref.importance_sampling_transformation(
        torch.tensor(TS)).numpy()
    our_t = np.asarray(ours.importance_sampling_transformation(TS))
    np.testing.assert_allclose(our_t, ref_t, atol=2e-4, rtol=5e-4)


def test_geometric():
    _compare(ns.GeometricNoise(1e-3, 1.0), ref_ns.GeometricNoise(1e-3, 1.0))


def test_cosine():
    _compare(ns.CosineNoise(), ref_ns.CosineNoise())


def test_cosinesqr():
    _compare(ns.CosineSqrNoise(), ref_ns.CosineSqrNoise())


def test_factory_dispatch():
    for name, cls in [("loglinear", ns.LogLinearNoise),
                      ("linear", ns.LinearNoise),
                      ("geometric", ns.GeometricNoise),
                      ("cosine", ns.CosineNoise),
                      ("cosinesqr", ns.CosineSqrNoise)]:
        assert isinstance(ns.get_noise(name), cls)
    with pytest.raises(NotImplementedError):
        ns.get_noise("polynomial")


def test_schedules_are_hashable_static():
    # Frozen dataclasses must be usable as static jit arguments.
    import jax

    @jax.jit
    def sigma_of(t):
        return ns.LogLinearNoise().total_noise(t)

    assert np.isfinite(float(sigma_of(0.5)))


def test_inverse_total_noise_roundtrip():
    """t -> sigma -> t for every schedule (the first-hitting sampler
    maps move-chance quantiles through this inverse)."""
    import jax.numpy as jnp

    from ddg_tpu.ops.noise_schedules import (CosineNoise,
                                             CosineSqrNoise,
                                             GeometricNoise,
                                             LinearNoise,
                                             LogLinearNoise)
    t = jnp.linspace(0.01, 0.99, 23)
    for sched in [LogLinearNoise(), LinearNoise(0.1, 8.0),
                  GeometricNoise(1e-3, 1.0), CosineNoise(),
                  CosineSqrNoise()]:
        back = sched.inverse_total_noise(sched.total_noise(t))
        np.testing.assert_allclose(np.asarray(back), np.asarray(t),
                                   atol=1e-5, rtol=1e-5,
                                   err_msg=type(sched).__name__)
