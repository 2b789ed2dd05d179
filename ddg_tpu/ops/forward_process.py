"""Forward corruption process and reverse posteriors, pure jnp.

Capability parity with the reference's forward/posterior math
(/root/reference/diffusion.py:321-514, 1378-1420). Everything here is a
pure function over arrays — no module state — so it composes with jit,
vmap, grad, and lax.scan, and XLA fuses the elementwise chains into the
surrounding matmuls.

Conventions:
  x0, xt      int32 token ids, shape (B, L)
  x / x_theta probability simplexes over vocab, shape (B, L, V)
  move_chance 1 - alpha(t), broadcastable to (B, 1) or (B, 1, 1)
  NEG_INFINITY matches the reference's -1e6 sentinel (not -inf) so that
  log_softmax over "forced" rows reproduces reference numerics exactly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

NEG_INFINITY = -1_000_000.0


def sample_t(key: jax.Array, n: int, *, sampling_eps: float,
             antithetic: bool = True, noise=None,
             importance_sampling: bool = False,
             dtype=jnp.float32) -> jax.Array:
    """Draw per-example diffusion times t in (eps, 1).

    Antithetic stratification: one uniform is shared across the batch and
    offset by i/n (reference diffusion.py:480-489).
    """
    eps_t = jax.random.uniform(key, (n,), dtype=dtype)
    if antithetic:
        offset = jnp.arange(n, dtype=dtype) / n
        eps_t = (eps_t / n + offset) % 1
    t = (1 - sampling_eps) * eps_t + sampling_eps
    if importance_sampling:
        t = noise.importance_sampling_transformation(t)
    return t


def discretize_t(t: jax.Array, T: int) -> jax.Array:
    """Map continuous t to the discrete grid {1/T, ..., 1} (diffusion.py:518-522)."""
    t = (t * T).astype(jnp.int32).astype(t.dtype) / T
    return t + 1.0 / T


def q_xt(key: jax.Array, x0: jax.Array, move_chance: jax.Array, *,
         diffusion: str, mask_index: int, vocab_size: int) -> jax.Array:
    """Sample the noisy latent x_t ~ q(x_t | x_0).

    move_chance has shape (B, 1) (broadcast over L). For 'absorbing_state'
    tokens jump to the mask id; for 'uniform' they jump to a uniformly
    random token (which may equal the original, as in the reference,
    diffusion.py:491-514).
    """
    move_key, unif_key = jax.random.split(key)
    move = jax.random.uniform(move_key, x0.shape,
                              dtype=move_chance.dtype) < move_chance
    if diffusion == 'absorbing_state':
        return jnp.where(move, mask_index, x0)
    if diffusion == 'uniform':
        uniform_tokens = jax.random.randint(
            unif_key, x0.shape, 0, vocab_size, dtype=x0.dtype)
        return jnp.where(move, uniform_tokens, x0)
    raise NotImplementedError(
        f'Diffusion type {diffusion} not implemented.')


def sample_prior(key: jax.Array, shape, *, diffusion: str,
                 mask_index: int, vocab_size: int) -> jax.Array:
    """Sample x_T from the limiting distribution (diffusion.py:1006-1022)."""
    if diffusion == 'absorbing_state':
        return jnp.full(shape, mask_index, dtype=jnp.int32)
    if diffusion == 'uniform':
        return jax.random.randint(key, shape, 0, vocab_size,
                                  dtype=jnp.int32)
    raise NotImplementedError(
        f'Diffusion type {diffusion} not implemented.')


def subs_parameterization(logits: jax.Array, xt: jax.Array, *,
                          mask_index: int) -> jax.Array:
    """MDLM SUBS parameterization (diffusion.py:321-337).

    1) Zero masking prob: add -1e6 to the mask-token logit.
    2) Copy-over: rows of unmasked tokens are forced to a (near-)one-hot
       at x_t: -1e6 everywhere, 0 at x_t.
    3) log_softmax so exp(out) is a distribution.
    """
    vocab_size = logits.shape[-1]
    mask_one_hot = jax.nn.one_hot(
        jnp.asarray(mask_index), vocab_size, dtype=logits.dtype)
    logits = logits + mask_one_hot * NEG_INFINITY

    unmasked = (xt != mask_index)[..., None]
    forced = jnp.where(
        jax.nn.one_hot(xt, vocab_size, dtype=jnp.bool_), 0.0, NEG_INFINITY
    ).astype(logits.dtype)
    logits = jnp.where(unmasked, forced, logits)
    return jax.nn.log_softmax(logits, axis=-1)


def uniform_posterior(x: jax.Array, xt: jax.Array, alpha_s: jax.Array,
                      alpha_t: jax.Array, *, vocab_size: int) -> jax.Array:
    """Uniform-diffusion posterior q(x_s | x_t, x) (diffusion.py:367-394).

    x is a probability simplex (B, L, V): either the (smoothed) one-hot of
    x_0 or the model's predicted x_theta. alpha_{s,t} broadcast as
    (B, 1, 1) or (B, L, 1). The limiting distribution is the uniform 1/V.
    """
    alpha_ts = alpha_t / alpha_s
    d_alpha = alpha_s - alpha_t
    xt_one_hot = jax.nn.one_hot(xt, vocab_size, dtype=x.dtype)
    x_at_xt = jnp.take_along_axis(x, xt[..., None], axis=-1)
    numerator = (alpha_t * vocab_size * x * xt_one_hot
                 + (alpha_ts - alpha_t) * xt_one_hot
                 + d_alpha * x
                 + (1 - alpha_ts) * (1 - alpha_s) / vocab_size)
    denominator = alpha_t * vocab_size * x_at_xt + (1 - alpha_t)
    return numerator / denominator


def absorbing_posterior(x_theta: jax.Array, move_chance_t: jax.Array,
                        move_chance_s: jax.Array, *,
                        mask_index: int) -> jax.Array:
    """Absorbing-state reverse posterior over x_s, as probabilities.

    q_xs = x_theta * (mct - mcs); q_xs[..., mask] = mcs; then / mct
    (diffusion.py:1398-1401). move_chance_* broadcast as (B, 1, 1).
    """
    vocab_size = x_theta.shape[-1]
    q_xs = x_theta * (move_chance_t - move_chance_s)
    mask_one_hot = jax.nn.one_hot(
        jnp.asarray(mask_index), vocab_size, dtype=q_xs.dtype)
    q_xs = q_xs * (1 - mask_one_hot) + mask_one_hot * move_chance_s
    return q_xs / move_chance_t


def absorbing_posterior_log(log_x_theta: jax.Array,
                            move_chance_t: jax.Array,
                            move_chance_s: jax.Array, *,
                            mask_index: int) -> jax.Array:
    """Log-space absorbing posterior, used by CBG/NOS (diffusion.py:1588-1593).

    log q_xs = log_x_theta + log(1 - mcs/mct); at the mask index it is
    log(mcs/mct).
    """
    vocab_size = log_x_theta.shape[-1]
    ratio = move_chance_s / move_chance_t
    out = log_x_theta + jnp.log(1.0 - ratio)
    mask_one_hot = jax.nn.one_hot(
        jnp.asarray(mask_index), vocab_size, dtype=jnp.bool_)
    return jnp.where(mask_one_hot, jnp.log(ratio), out)


def apply_copy_flag_probs(q_xs: jax.Array, xt: jax.Array, *,
                          mask_index: int) -> jax.Array:
    """Force rows of already-decoded tokens to the one-hot of x_t.

    Mirrors q_xs[copy_flag] = 0; q_xs[copy_flag, xt] = 1
    (diffusion.py:1414-1417).
    """
    copy = (xt != mask_index)[..., None]
    one_hot = jax.nn.one_hot(xt, q_xs.shape[-1], dtype=q_xs.dtype)
    return jnp.where(copy, one_hot, q_xs)


def apply_copy_flag_log(log_q_xs: jax.Array, xt: jax.Array, *,
                        mask_index: int) -> jax.Array:
    """Log-space analogue: -1e6 everywhere, 0 at x_t for decoded rows
    (diffusion.py:1608-1610)."""
    copy = (xt != mask_index)[..., None]
    forced = jnp.where(
        jax.nn.one_hot(xt, log_q_xs.shape[-1], dtype=jnp.bool_),
        0.0, NEG_INFINITY).astype(log_q_xs.dtype)
    return jnp.where(copy, forced, log_q_xs)


def apply_copy_flag_tokens(xs: jax.Array, xt: jax.Array, *,
                           mask_index: int) -> jax.Array:
    """Carry over already-decoded tokens: xs = where(xt != mask, xt, xs)."""
    return jnp.where(xt != mask_index, xt, xs)
