"""Loss math tests: limits, non-negativity, continuous/discrete agreement."""

import jax
import jax.numpy as jnp
import numpy as np

from ddg_tpu.ops import forward_process as fp
from ddg_tpu.ops import losses
from ddg_tpu.ops.noise_schedules import LogLinearNoise

KEY = jax.random.PRNGKey(0)
V = 9
MASK = V - 1


def _rand_log_simplex(key, shape):
    x = jax.random.uniform(key, shape) + 1e-3
    return jnp.log(x / x.sum(-1, keepdims=True))


def test_smooth_one_hot_sums_to_one():
    x = jax.random.randint(KEY, (4, 6), 0, V)
    for eps in [0.0, 0.1]:
        s = losses.smooth_one_hot(x, V, eps)
        np.testing.assert_allclose(
            np.asarray(s.sum(-1)), 1.0 + eps / (V - 1), atol=1e-6)
        # note: reference spreads eps over V-1 classes but also keeps the
        # true class's share, total mass = 1 - eps + V * eps/(V-1).


def test_nll_loss_matches_manual():
    B, L = 3, 7
    log_p = _rand_log_simplex(KEY, (B, L, V))
    x0 = jax.random.randint(KEY, (B, L), 0, V)
    plain = losses.nll_loss(log_p, x0, 0.0)
    manual = -np.take_along_axis(np.asarray(log_p),
                                 np.asarray(x0)[..., None], -1).squeeze(-1)
    np.testing.assert_allclose(np.asarray(plain), manual, atol=1e-6)
    # label-smoothed version per reference formula
    eps = 0.2
    sm = losses.nll_loss(log_p, x0, eps)
    sum_all = np.asarray(log_p).sum(-1)
    smooth = -sum_all - manual  # -sum + log_p_true
    expected = (1 - eps) * manual + eps / (V - 1) * smooth
    np.testing.assert_allclose(np.asarray(sm), expected, atol=1e-5)


def test_d3pm_uniform_loss_is_kl():
    """KL >= 0 and == 0 when the model predicts the smoothed truth."""
    B, L, T = 2, 5, 16
    x0 = jax.random.randint(KEY, (B, L), 0, V)
    xt = jax.random.randint(jax.random.PRNGKey(1), (B, L), 0, V)
    t = jnp.full((B,), 0.5)
    # Perfect model: log of the (unsmoothed) one-hot of x0 -> KL == 0
    perfect = jnp.log(jax.nn.one_hot(x0, V) + 1e-30)
    zero = losses.d3pm_uniform_loss(perfect, xt, x0, t, T=T, vocab_size=V)
    np.testing.assert_allclose(np.asarray(zero), 0.0, atol=1e-4)
    rand = _rand_log_simplex(KEY, (B, L, V))
    pos = losses.d3pm_uniform_loss(rand, xt, x0, t, T=T, vocab_size=V)
    assert float(pos.min()) >= -1e-5


def test_d3pm_absorbing_masked_only():
    B, L, T = 2, 6, 8
    x0 = jax.random.randint(KEY, (B, L), 0, V - 1)
    xt = x0.at[:, ::2].set(MASK)
    t = jnp.full((B,), 0.6)
    out = losses.d3pm_absorbing_loss(
        _rand_log_simplex(KEY, (B, L, V)), xt, x0, t, T=T,
        mask_index=MASK)
    unmasked = np.asarray(xt != MASK)
    np.testing.assert_allclose(np.asarray(out)[unmasked], 0.0, atol=1e-6)


def test_subs_continuous_weight():
    noise = LogLinearNoise()
    t = jnp.asarray([0.3, 0.9])
    sigma, dsigma = noise(t)
    w = losses.subs_continuous_weight(sigma, dsigma)
    # For loglinear: dsigma/expm1(sigma) = [(1-e)/(1-(1-e)t)] / [(1-e)t/(1-(1-e)t)] = 1/t
    np.testing.assert_allclose(np.asarray(w[:, 0]), 1.0 / np.asarray(t),
                               rtol=1e-4)


def test_uniform_continuous_matches_discrete_limit():
    """The continuous UDLM ELBO is the T->inf limit of the discrete KL.

    With log-linear noise (alpha_t = 1 - t), d3pm_uniform_loss(T) should
    converge to uniform_continuous_loss as T grows.
    """
    B, L = 2, 4
    x0 = jax.random.randint(KEY, (B, L), 0, V)
    xt = jax.random.randint(jax.random.PRNGKey(2), (B, L), 0, V)
    log_x_theta = _rand_log_simplex(jax.random.PRNGKey(3), (B, L, V))
    t = jnp.full((B,), 0.41)

    cont = losses.uniform_continuous_loss(log_x_theta, xt, x0, t,
                                          vocab_size=V)
    prev = None
    for T in [256, 1024, 4096]:
        disc = losses.d3pm_uniform_loss(
            log_x_theta.astype(jnp.float64) if False else log_x_theta,
            xt, x0, t, T=T, vocab_size=V)
        err = float(jnp.abs(disc - cont).max())
        if prev is not None:
            assert err < prev * 0.6  # converging
        prev = err
    assert prev < 5e-2


def test_subs_continuous_matches_discrete_limit():
    """Continuous MDLM NELBO == T->inf limit of the absorbing D3PM loss,
    when the model output respects the SUBS parameterization."""
    B, L = 2, 6
    x0 = jax.random.randint(KEY, (B, L), 0, V - 1)
    xt = x0.at[:, 1::2].set(MASK)
    raw_logits = jax.random.normal(jax.random.PRNGKey(5), (B, L, V))
    log_x_theta = fp.subs_parameterization(raw_logits, xt, mask_index=MASK)
    t = jnp.full((B,), 0.37)
    noise = LogLinearNoise(eps=0.0)  # exact alpha_t = 1 - t
    sigma, dsigma = noise(t)
    cont = losses.subs_continuous_loss(log_x_theta, x0, sigma, dsigma)
    disc = losses.d3pm_absorbing_loss(log_x_theta, xt, x0, t, T=4096,
                                      mask_index=MASK)
    masked = np.asarray(xt == MASK)
    np.testing.assert_allclose(np.asarray(cont)[masked],
                               np.asarray(disc)[masked], rtol=2e-2,
                               atol=2e-2)
    # SUBS copy-over makes unmasked-token loss ~0 in the continuous case.
    np.testing.assert_allclose(np.asarray(cont)[~masked], 0.0, atol=1e-4)


def test_masked_mean_nll():
    nll = jnp.ones((2, 4))
    mask = jnp.asarray([[1, 1, 0, 0], [1, 0, 0, 0]], dtype=jnp.float32)
    assert float(losses.masked_mean_nll(nll, mask)) == 1.0
