"""Classifier runtime: noisy-input classifier training for guided
decoding (CBG / NOS) and clean-prefix per-position training (AR FUDGE).

Functional re-design of the reference's `classifier.Classifier`
Lightning module (/root/reference/classifier.py:132-490):
  * static `ClassifierSpec` + pure `classifier_loss_fn`;
  * the forward corruption is the *same* q_xt as the diffusion model
    (classifier.py:374-395 mirrors diffusion.py:491-514) — we reuse
    `ops.forward_process.q_xt` directly rather than duplicating it;
  * time-dependent label smoothing interpolates one-hot -> uniform with
    t (classifier.py:432-437);
  * FUDGE mode: per-position logits on clean inputs, CE at every valid
    position against the sequence label (classifier.py:439-447);
  * `get_log_probs` = log_softmax(forward), consumed by CBG/FUDGE/NOS
    (classifier.py:316-327).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import optax

from ddg_tpu.ops import forward_process as fp
from ddg_tpu.ops.noise_schedules import NoiseSchedule


@dataclasses.dataclass(frozen=True)
class ClassifierSpec:
    diffusion: str                 # 'absorbing_state' | 'uniform'
    parameterization: str          # diffusion param of the paired model
    noise: NoiseSchedule
    vocab_size: int
    mask_index: int
    num_classes: int
    T: int = 0
    time_conditioning: bool = False
    sampling_eps: float = 1e-3
    antithetic_sampling: bool = True
    importance_sampling: bool = False
    change_of_variables: bool = False
    use_label_smoothing: bool = False   # time-dependent smoothing
    is_fudge_classifier: bool = False
    # Eval classifiers (the reference's HyenaDNA Species10 judge,
    # classifier.py:166-178 + scripts/train_ten_species_eval_classifier
    # .sh) train on CLEAN sequences with no time conditioning.
    is_eval_classifier: bool = False


def process_sigma(spec: ClassifierSpec, sigma):
    if sigma is None:
        return None
    if sigma.ndim > 1:
        sigma = sigma.squeeze(-1)
    if not spec.time_conditioning:
        sigma = jnp.zeros_like(sigma)
    return sigma


def get_log_probs(spec: ClassifierSpec, classifier_apply, params, x,
                  sigma, x_emb=None):
    """log p(class | x, sigma) (reference classifier.py:316-327)."""
    sigma = process_sigma(spec, sigma) if sigma is not None else None
    logits = classifier_apply(params, x, sigma, x_emb=x_emb)
    return jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)


def classifier_loss_fn(spec: ClassifierSpec, classifier_apply, params,
                       batch, rng, *, train: bool = True):
    """Noisy-input CE loss (reference `_compute_loss`,
    classifier.py:395-471). batch: input_ids, attention_mask, label."""
    x0 = batch['input_ids']
    attention_mask = batch['attention_mask']
    y = batch['label']
    t_rng, q_rng, model_rng = jax.random.split(rng, 3)

    t = None
    if spec.parameterization == 'ar' or spec.is_eval_classifier:
        # FUDGE/PPLM classifiers train on clean prefixes; eval
        # classifiers (Species10 judge) on clean full sequences.
        logits = classifier_apply(params, x0, None,
                                  attention_mask=attention_mask,
                                  train=train, rng=model_rng)
    else:
        t = fp.sample_t(t_rng, x0.shape[0],
                        sampling_eps=spec.sampling_eps,
                        antithetic=spec.antithetic_sampling,
                        noise=spec.noise,
                        importance_sampling=spec.importance_sampling)
        if spec.T > 0:
            t = fp.discretize_t(t, spec.T)
        if spec.change_of_variables:
            import math
            time_conditioning = t[:, None]
            f_t = math.log1p(-math.exp(-spec.noise.sigma_max))
            f_0 = math.log1p(-math.exp(-spec.noise.sigma_min))
            move_chance = jnp.exp(f_0 + t * (f_t - f_0))[:, None]
        else:
            sigma, _ = spec.noise(t)
            time_conditioning = sigma[:, None]
            move_chance = 1 - jnp.exp(-sigma[:, None])
        xt = fp.q_xt(q_rng, x0, move_chance, diffusion=spec.diffusion,
                     mask_index=spec.mask_index,
                     vocab_size=spec.vocab_size)
        logits = classifier_apply(
            params, xt, process_sigma(spec, time_conditioning),
            attention_mask=attention_mask, train=train, rng=model_rng)

    logits = logits.astype(jnp.float32)
    if spec.is_fudge_classifier:
        # Per-position CE against the sequence label, masked positions
        # excluded (classifier.py:439-447).
        per_pos = optax.softmax_cross_entropy_with_integer_labels(
            logits, jnp.broadcast_to(y[:, None], logits.shape[:2]))
        loss = (per_pos * attention_mask).sum() / attention_mask.sum()
        return loss, logits
    if spec.use_label_smoothing and t is not None:
        labels = (jax.nn.one_hot(y, spec.num_classes)
                  * (1 - t)[..., None]
                  + (1.0 / spec.num_classes) * t[..., None])
        loss = optax.softmax_cross_entropy(logits, labels).mean()
    else:
        loss = optax.softmax_cross_entropy_with_integer_labels(
            logits, y).mean()
    return loss, logits


def accuracy(logits: jax.Array, y: jax.Array) -> jax.Array:
    """Micro accuracy (reference classifier.py:16-129 metric family)."""
    return (logits.argmax(-1) == y).mean()


def make_classifier_train_step(spec: ClassifierSpec, classifier_apply,
                               optim_spec, averaging_spec,
                               frozen_keys=()):
    """Classifier training step with the shared runtime
    (optimizer/EMA parity with the diffusion train step).

    frozen_keys: top-level param-tree keys whose gradients are zeroed —
    the frozen pretrained-encoder mode for PPLM/NOS classifiers
    (reference main.py:218-234: encoder params get requires_grad=False).
    """
    from ddg_tpu.runtime import averaging as avg_lib
    from ddg_tpu.runtime.optim import make_optimizer, make_schedule
    from ddg_tpu.runtime.train_state import TrainState

    tx = make_optimizer(optim_spec)
    schedule = make_schedule(optim_spec)
    frozen_keys = frozenset(frozen_keys)

    def train_step(state: TrainState, batch):
        rng, step_rng = jax.random.split(state.rng)

        def compute_loss(params):
            return classifier_loss_fn(spec, classifier_apply, params,
                                      batch, step_rng, train=True)

        (loss, logits), grads = jax.value_and_grad(
            compute_loss, has_aux=True)(state.params)
        if frozen_keys:
            grads = {k: (jax.tree.map(jnp.zeros_like, g)
                         if k in frozen_keys else g)
                     for k, g in grads.items()}
        updates, opt_state = tx.update(grads, state.opt_state,
                                       state.params)
        params = optax.apply_updates(state.params, updates)
        avg_state = avg_lib.update(averaging_spec, state.averaging,
                                   params)
        new_state = TrainState(step=state.step + 1, params=params,
                               opt_state=opt_state, averaging=avg_state,
                               rng=rng)
        metrics = {'loss': loss,
                   'lr': schedule(state.step)}
        if not spec.is_fudge_classifier:
            metrics['accuracy'] = accuracy(logits, batch['label'])
        return new_state, metrics

    return train_step
