"""ELBO / NLL losses for discrete diffusion, pure jnp.

Capability parity with the loss math in the reference
(/root/reference/diffusion.py:396-680): label-smoothed NLL, discrete-T
D3PM losses for absorbing and uniform diffusion, the continuous-time
SUBS (MDLM) NELBO weight, and the continuous-time uniform (UDLM) ELBO.

All functions return *per-token* losses of shape (B, L); masking and
reduction happen in the caller (ddg_tpu/diffusion.py) so the same kernels
serve training, validation, and PPL eval.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ddg_tpu.ops.forward_process import uniform_posterior


def smooth_one_hot(x: jax.Array, vocab_size: int,
                   label_smoothing: float, dtype=jnp.float32) -> jax.Array:
    """One-hot of x with epsilon mass spread over the other V-1 classes
    (diffusion.py:462-464)."""
    one_hot = jax.nn.one_hot(x, vocab_size, dtype=dtype)
    return (one_hot * (1.0 - label_smoothing)
            + label_smoothing / (vocab_size - 1))


def nll_loss(log_probs: jax.Array, x0: jax.Array,
             label_smoothing: float = 0.0) -> jax.Array:
    """Label-smoothed NLL (diffusion.py:466-478). Shape (B, L)."""
    vocab_size = log_probs.shape[-1]
    log_p_true = jnp.take_along_axis(
        log_probs, x0[..., None], axis=-1).squeeze(-1)
    nll = -log_p_true
    if label_smoothing == 0.0:
        return nll
    sum_all_log = log_probs.sum(axis=-1)
    smooth = -sum_all_log + log_p_true
    return ((1.0 - label_smoothing) * nll
            + (label_smoothing / (vocab_size - 1)) * smooth)


def d3pm_absorbing_loss(log_x_theta: jax.Array, xt: jax.Array,
                        x0: jax.Array, t: jax.Array, *, T: int,
                        mask_index: int,
                        label_smoothing: float = 0.0) -> jax.Array:
    """Discrete-T ELBO for absorbing-state diffusion (diffusion.py:408-426).

    Valid for log-linear noise only (alpha_t = 1 - t). Returns T * L_vb
    per token, shape (B, L).
    """
    vocab_size = log_x_theta.shape[-1]
    dt = 1.0 / T
    t = jnp.clip(t[:, None], 0.0, 1.0 - 1e-4)  # (B, 1)
    alpha_t = 1 - t
    alpha_s = 1 - (t - dt)

    x_smooth = smooth_one_hot(x0, vocab_size, label_smoothing,
                              dtype=log_x_theta.dtype)
    log_x_theta_at_x0 = (log_x_theta * x_smooth).sum(-1)
    log_x_theta_at_m = log_x_theta[..., mask_index]
    x_theta_at_m = jnp.exp(log_x_theta_at_m)

    term_1_coef = dt / t
    term_1_log_nr = jnp.log(alpha_t * x_theta_at_m / t + 1)
    term_1_log_dr = log_x_theta_at_x0

    term_2_coef = 1 - dt / t
    term_2_log_nr = term_1_log_nr
    term_2_log_dr = jnp.log(alpha_s * x_theta_at_m / (t - dt) + 1)

    l_vb_masked = (term_1_coef * (term_1_log_nr - term_1_log_dr)
                   + term_2_coef * (term_2_log_nr - term_2_log_dr))
    l_vb = l_vb_masked * (xt == mask_index)
    return T * l_vb


def d3pm_uniform_loss(log_x_theta: jax.Array, xt: jax.Array,
                      x0: jax.Array, t: jax.Array, *, T: int,
                      vocab_size: int,
                      label_smoothing: float = 0.0) -> jax.Array:
    """Discrete-T ELBO for uniform diffusion: KL(posterior || predicted
    posterior) per token (diffusion.py:427-441). Shape (B, L)."""
    dt = 1.0 / T
    t = jnp.clip(t[:, None], 0.0, 1.0 - 1e-4)  # (B, 1)
    alpha_t = (1 - t)[..., None]  # (B, 1, 1)
    alpha_s = (1 - (t - dt))[..., None]

    x_smooth = smooth_one_hot(x0, vocab_size, label_smoothing,
                              dtype=log_x_theta.dtype)
    posterior = uniform_posterior(
        x_smooth, xt, alpha_s, alpha_t, vocab_size=vocab_size)
    posterior_pred = uniform_posterior(
        jnp.exp(log_x_theta), xt, alpha_s, alpha_t,
        vocab_size=vocab_size)
    kl = (posterior * (jnp.log(posterior + 1e-12)
                       - jnp.log(posterior_pred))).sum(-1)
    return T * kl


def subs_continuous_weight(sigma: jax.Array, dsigma: jax.Array) -> jax.Array:
    """Continuous-time MDLM NELBO weight dsigma / expm1(sigma)
    (diffusion.py:622-625). Shape (B,) -> (B, 1)."""
    return (dsigma / jnp.expm1(sigma))[:, None]


def subs_continuous_loss(log_x_theta: jax.Array, x0: jax.Array,
                         sigma: jax.Array, dsigma: jax.Array, *,
                         label_smoothing: float = 0.0) -> jax.Array:
    """Continuous-time absorbing-state SUBS NELBO per token
    (diffusion.py:607-625). Shape (B, L)."""
    vocab_size = log_x_theta.shape[-1]
    x_smooth = smooth_one_hot(x0, vocab_size, label_smoothing,
                              dtype=log_x_theta.dtype)
    log_p_theta = (log_x_theta * x_smooth).sum(-1)
    return -log_p_theta * subs_continuous_weight(sigma, dsigma)


def uniform_continuous_loss(log_x_theta: jax.Array, xt: jax.Array,
                            x0: jax.Array, t: jax.Array, *,
                            vocab_size: int,
                            label_smoothing: float = 0.0) -> jax.Array:
    """Continuous-time uniform-state (UDLM) diffusion ELBO per token
    (diffusion.py:627-662).

    Hardcodes the log-linear schedule: alpha_t = 1 - t, alpha_t' = -1,
    matching the reference's closed form with
    x_bar = V * alpha_t * x + (1 - alpha_t).
    """
    alpha_t_prime = -1.0
    alpha_t = 1.0 - t[..., None, None]  # (B, 1, 1)

    x_smooth = smooth_one_hot(x0, vocab_size, label_smoothing,
                              dtype=log_x_theta.dtype)
    x_bar = vocab_size * alpha_t * x_smooth + 1 - alpha_t
    x_bar_theta = (vocab_size * alpha_t * jnp.exp(log_x_theta)
                   + 1 - alpha_t)

    coeff = alpha_t_prime / (vocab_size * alpha_t)  # (B, 1, 1)

    x_bar_zt = jnp.take_along_axis(x_bar, xt[..., None], axis=-1)
    x_bar_theta_zt = jnp.take_along_axis(
        x_bar_theta, xt[..., None], axis=-1)

    term1 = vocab_size / x_bar_zt - vocab_size / x_bar_theta_zt  # (B, L, 1)
    term2 = ((x_bar / x_bar_zt)
             * (jnp.log(x_bar_theta_zt) - jnp.log(x_bar_theta)
                + jnp.log(x_bar) - jnp.log(x_bar_zt))
             ).sum(axis=-1, keepdims=True)
    return (coeff * (term1 - term2)).squeeze(-1)  # (B, L)


def masked_mean_nll(nlls_per_token: jax.Array,
                    attention_mask: jax.Array) -> jax.Array:
    """Token-mean NLL over the attention mask (diffusion.py:808-817)."""
    nlls = nlls_per_token * attention_mask
    return nlls.sum() / attention_mask.sum()
