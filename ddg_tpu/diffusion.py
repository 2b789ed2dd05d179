"""Diffusion core: model wrapper, training losses (the reference's
`Diffusion._forward_pass_diffusion` / `_loss`, /root/reference/diffusion.py:350-838)
re-designed as pure functions over a static `DiffusionSpec`.

The Lightning module of the reference is replaced by:
  * `DiffusionSpec` — frozen static hyperparameters (hashable; closed
    over by jit so each config compiles once);
  * `log_x_theta` — backbone forward + parameterization transform;
  * `loss_fn` — the full ELBO/CE dispatch, returning a `Loss` pytree.

Mutable training state (params, optimizer, EMA, RNG) lives in
`ddg_tpu/runtime/train_state.py`.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp

from ddg_tpu.ops import losses as L
from ddg_tpu.ops import forward_process as fp
from ddg_tpu.ops import sampling as S
from ddg_tpu.ops.noise_schedules import NoiseSchedule

# model_apply(params, x, sigma, cond, x_emb, train, rng) -> logits (B, L, V)
ModelApply = Callable[..., jax.Array]


@dataclasses.dataclass(frozen=True)
class DiffusionSpec:
    """Static model/process hyperparameters (reference Diffusion.__init__,
    diffusion.py:70-182, and config.yaml)."""
    diffusion: str                  # 'absorbing_state' | 'uniform'
    parameterization: str           # 'subs' | 'd3pm' | 'ar'
    noise: NoiseSchedule
    vocab_size: int                 # includes mask token if added
    mask_index: int
    T: int = 0
    time_conditioning: bool = False
    subs_masking: bool = False
    sampling_eps: float = 1e-3
    antithetic_sampling: bool = True
    importance_sampling: bool = False
    change_of_variables: bool = False
    label_smoothing: float = 0.0
    zero_recon_loss: bool = False
    use_simple_ce_loss: bool = False
    compute_loss_on_pad_tokens: bool = False
    cond_dropout: float = 0.0
    num_classes: Optional[int] = None
    # fork features
    unrolling: bool = False
    unrolling_steps: int = 2
    unrolling_weight: float = 1.0
    unrolling_ignore_diffusion_loss: bool = False
    noise_schedule_warmup: bool = False
    noise_schedule_warmup_fraction: float = 0.1
    noise_schedule_uniform_warmup: bool = False
    max_steps: int = 1_000_000

    def __post_init__(self):
        # Config invariants (reference diffusion.py:184-192).
        assert not (self.change_of_variables and self.importance_sampling)
        if self.diffusion != 'absorbing_state':
            assert self.parameterization not in {'ar', 'subs'}
        if self.T > 0:
            assert self.parameterization in {'d3pm', 'subs'}
        if self.subs_masking:
            assert self.parameterization == 'd3pm'


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class Loss:
    """Loss pytree (reference Loss dataclass, diffusion.py:36-43)."""
    loss: jax.Array
    nlls: jax.Array
    token_mask: jax.Array
    recon_loss: Optional[jax.Array] = None
    diffusion_loss: Optional[jax.Array] = None
    unroll_loss: Optional[jax.Array] = None


def process_sigma(spec: DiffusionSpec, sigma):
    """Zero out sigma when the model is not time-conditioned
    (diffusion.py:339-348)."""
    if sigma is None:
        assert spec.parameterization == 'ar'
        return None
    if sigma.ndim > 1:
        sigma = sigma.squeeze(-1)
    if not spec.time_conditioning:
        sigma = jnp.zeros_like(sigma)
    return sigma


def log_x_theta(spec: DiffusionSpec, model_apply: ModelApply, params,
                xt: jax.Array, sigma, cond=None, x_emb=None, *,
                train: bool = False, rng=None) -> jax.Array:
    """Backbone forward + parameterization transform -> log-probs
    (reference Diffusion.forward, diffusion.py:350-365)."""
    sigma = process_sigma(spec, sigma)
    logits = model_apply(params, xt, sigma, cond, x_emb,
                         train=train, rng=rng)
    logits = logits.astype(jnp.float32)
    if spec.parameterization == 'subs':
        return fp.subs_parameterization(logits, xt,
                                        mask_index=spec.mask_index)
    if spec.parameterization in {'ar', 'd3pm'}:
        if spec.subs_masking:
            mask_oh = jax.nn.one_hot(jnp.asarray(spec.mask_index),
                                     spec.vocab_size, dtype=logits.dtype)
            logits = logits + mask_oh * fp.NEG_INFINITY
        return jax.nn.log_softmax(logits, axis=-1)
    return logits


def _reconstruction_loss(spec: DiffusionSpec, model_apply, params, x0,
                         cond, label_smoothing, *, train, rng):
    """Model NLL at t=0 (diffusion.py:447-460); loglinear-only like the
    reference."""
    t0 = jnp.zeros((x0.shape[0],), dtype=jnp.float32)
    sigma_t0 = spec.noise.total_noise(t0)
    out_t0 = log_x_theta(spec, model_apply, params, x0, sigma_t0,
                         cond=cond, train=train, rng=rng)
    return L.nll_loss(out_t0, x0, label_smoothing)


def _move_chance_warmup(spec: DiffusionSpec, move_chance, step):
    """Noise-schedule warmup cap on move_chance (diffusion.py:536-558)."""
    warmup_steps = int(spec.max_steps * spec.noise_schedule_warmup_fraction)
    cap = jnp.clip(step / max(warmup_steps, 1), 0.0, 1.0)
    if spec.noise_schedule_uniform_warmup:
        warmed = move_chance * cap
    else:
        warmed = jnp.minimum(move_chance, cap)
    return jnp.where(step < warmup_steps, warmed, move_chance)


def _k_step_ce(spec: DiffusionSpec, model_apply, params, xt, x0,
               time_cond, K, cond, label_smoothing, *, train, rng):
    """K-step unrolled CE (diffusion.py:720-739): forward -> CE ->
    resample from the model, no gradient through the resampling."""
    def body(carry, k):
        x_prev, acc = carry
        step_rng = jax.random.fold_in(rng, k)
        out = log_x_theta(spec, model_apply, params, x_prev, time_cond,
                          cond=cond, train=train,
                          rng=jax.random.fold_in(step_rng, 0))
        acc = acc + L.nll_loss(out, x0, label_smoothing)
        x_next = S.sample_categorical(
            jax.random.fold_in(step_rng, 1), jnp.exp(out))
        return (jax.lax.stop_gradient(x_next), acc), None

    init = (xt, jnp.zeros(x0.shape, dtype=jnp.float32))
    (_, acc), _ = jax.lax.scan(body, init, jnp.arange(K))
    return acc / K


def forward_pass_diffusion(spec: DiffusionSpec, model_apply: ModelApply,
                           params, x0: jax.Array, cond, rng, *,
                           train: bool, label_smoothing: float,
                           step=None) -> dict:
    """The diffusion training loss (diffusion.py:516-680).

    Returns a dict with 'loss' (B, L) and optional
    'recon_loss'/'diffusion_loss' components.
    """
    t_rng, q_rng, model_rng, recon_rng, unroll_rng = jax.random.split(rng, 5)
    t = fp.sample_t(t_rng, x0.shape[0], sampling_eps=spec.sampling_eps,
                    antithetic=spec.antithetic_sampling,
                    noise=spec.noise,
                    importance_sampling=spec.importance_sampling)
    if spec.T > 0:
        t = fp.discretize_t(t, spec.T)

    if spec.change_of_variables:
        time_conditioning = t[:, None]
        import math
        f_t = math.log1p(-math.exp(-spec.noise.sigma_max))
        f_0 = math.log1p(-math.exp(-spec.noise.sigma_min))
        move_chance = jnp.exp(f_0 + t * (f_t - f_0))[:, None]
        sigma, dsigma = None, None
    else:
        sigma, dsigma = spec.noise(t)
        time_conditioning = sigma[:, None]
        move_chance = 1 - jnp.exp(-sigma[:, None])

    if spec.noise_schedule_warmup and step is not None:
        move_chance = _move_chance_warmup(spec, move_chance, step)

    xt = fp.q_xt(q_rng, x0, move_chance, diffusion=spec.diffusion,
                 mask_index=spec.mask_index, vocab_size=spec.vocab_size)

    if (train and spec.unrolling
            and spec.unrolling_ignore_diffusion_loss):
        # K-step unrolled CE replaces the ELBO entirely
        # (diffusion.py:562-576).
        loss_map = _k_step_ce(
            spec, model_apply, params, xt, x0, time_conditioning,
            spec.unrolling_steps, cond, label_smoothing,
            train=train, rng=unroll_rng)
        return {'loss': loss_map}

    model_output = log_x_theta(spec, model_apply, params, xt,
                               time_conditioning, cond=cond,
                               train=train, rng=model_rng)

    if spec.T > 0:
        if spec.diffusion == 'absorbing_state':
            diffusion_loss = L.d3pm_absorbing_loss(
                model_output, xt, x0, t, T=spec.T,
                mask_index=spec.mask_index,
                label_smoothing=label_smoothing)
        else:
            diffusion_loss = L.d3pm_uniform_loss(
                model_output, xt, x0, t, T=spec.T,
                vocab_size=spec.vocab_size,
                label_smoothing=label_smoothing)
        if spec.parameterization == 'd3pm':
            recon = _reconstruction_loss(
                spec, model_apply, params, x0, cond, label_smoothing,
                train=train, rng=recon_rng)
            if train and spec.use_simple_ce_loss:
                loss = L.nll_loss(model_output, x0, label_smoothing)
            else:
                loss = recon + diffusion_loss
            return {'recon_loss': recon, 'diffusion_loss': diffusion_loss,
                    'loss': loss}
        # subs
        if train and spec.use_simple_ce_loss:
            loss = L.nll_loss(model_output, x0, label_smoothing)
        else:
            loss = diffusion_loss
        return {'diffusion_loss': diffusion_loss, 'loss': loss}

    # Continuous time
    if spec.diffusion == 'absorbing_state':
        if spec.change_of_variables or spec.importance_sampling:
            vocab = spec.vocab_size
            x_smooth = L.smooth_one_hot(x0, vocab, label_smoothing)
            log_p_theta = (model_output * x_smooth).sum(-1)
            import math
            w = math.log1p(-math.exp(-spec.noise.sigma_min))
            if train and spec.use_simple_ce_loss:
                return {'loss': -log_p_theta}
            return {'loss': log_p_theta * w}
        if train and spec.use_simple_ce_loss:
            return {'loss': L.nll_loss(model_output, x0, label_smoothing)}
        return {'loss': L.subs_continuous_loss(
            model_output, x0, sigma, dsigma,
            label_smoothing=label_smoothing)}

    if spec.diffusion == 'uniform':
        diffusion_loss = L.uniform_continuous_loss(
            model_output, xt, x0, t, vocab_size=spec.vocab_size,
            label_smoothing=label_smoothing)
        recon = _reconstruction_loss(
            spec, model_apply, params, x0, cond, label_smoothing,
            train=train, rng=recon_rng)
        if train and spec.use_simple_ce_loss:
            loss = L.nll_loss(model_output, x0, label_smoothing)
        elif spec.zero_recon_loss:
            loss = diffusion_loss
        else:
            loss = diffusion_loss + recon
        return {'recon_loss': recon, 'diffusion_loss': diffusion_loss,
                'loss': loss}

    raise NotImplementedError(
        f'Diffusion type {spec.diffusion} not implemented for '
        'continuous time.')


def loss_fn(spec: DiffusionSpec, model_apply: ModelApply, params,
            x0: jax.Array, attention_mask: jax.Array, cond, rng, *,
            train: bool, label_smoothing: Optional[float] = None,
            step=None) -> Loss:
    """Full loss with CFG cond-dropout, AR CE, unrolling aux, and
    mask-weighted reduction (reference `_loss`, diffusion.py:741-838).

    Note: `_maybe_sub_sample` (text8 crop / AR shift / flexible length)
    is handled in the data pipeline (ddg_tpu/data) where dynamic shapes
    are cheap, not inside jit.
    """
    if label_smoothing is None:
        label_smoothing = spec.label_smoothing if train else 0.0
    drop_rng, loss_rng, unroll_rng = jax.random.split(rng, 3)

    recon_loss = diffusion_loss = unroll_loss = None

    if (cond is not None and train and spec.cond_dropout > 0):
        # Null-label dropout for CFG training (diffusion.py:748-757).
        p = jax.random.bernoulli(drop_rng, spec.cond_dropout, cond.shape)
        cond = jnp.where(p, spec.num_classes, cond)

    if spec.parameterization == 'ar':
        # x0 here is the *input* tokens; AR targets are provided by the
        # data layer shift. For loss parity the caller passes
        # (input_tokens, output_tokens) via x0=(inputs, targets).
        inputs, targets = x0
        logprobs = log_x_theta(spec, model_apply, params, inputs, None,
                               cond=cond, train=train, rng=loss_rng)
        x_smooth = L.smooth_one_hot(targets, spec.vocab_size,
                                    label_smoothing)
        loss = -(logprobs * x_smooth).sum(-1)
    else:
        out = forward_pass_diffusion(
            spec, model_apply, params, x0, cond, loss_rng,
            train=train, label_smoothing=label_smoothing, step=step)
        recon_loss = out.get('recon_loss')
        diffusion_loss = out.get('diffusion_loss')
        loss = out['loss']

        if (train and spec.unrolling
                and not spec.unrolling_ignore_diffusion_loss
                and spec.unrolling_steps > 0):
            # Auxiliary K-step unrolled CE (diffusion.py:769-800).
            t_rng, q_rng, k_rng = jax.random.split(unroll_rng, 3)
            t = fp.sample_t(t_rng, x0.shape[0],
                            sampling_eps=spec.sampling_eps,
                            antithetic=spec.antithetic_sampling,
                            noise=spec.noise,
                            importance_sampling=spec.importance_sampling)
            sigma, _ = spec.noise(t)
            time_cond = sigma[:, None]
            move_chance = 1 - jnp.exp(-sigma)[:, None]
            xt = fp.q_xt(q_rng, x0, move_chance,
                         diffusion=spec.diffusion,
                         mask_index=spec.mask_index,
                         vocab_size=spec.vocab_size)
            ce_unroll = _k_step_ce(
                spec, model_apply, params, xt, x0, time_cond,
                spec.unrolling_steps, cond, label_smoothing,
                train=train, rng=k_rng)
            unroll_loss = spec.unrolling_weight * ce_unroll
            loss = loss + unroll_loss

    nlls = loss * attention_mask
    count = attention_mask.sum()
    if spec.compute_loss_on_pad_tokens and train:
        token_nll = loss.mean()
    else:
        token_nll = nlls.sum() / count

    def _reduce(x):
        if x is None:
            return None
        return jax.lax.stop_gradient((x * attention_mask).sum() / count)

    return Loss(loss=token_nll, nlls=nlls, token_mask=attention_mask,
                recon_loss=_reduce(recon_loss),
                diffusion_loss=_reduce(diffusion_loss),
                unroll_loss=_reduce(unroll_loss))
