"""TrainState pytree + jitted train/eval steps.

Replaces the reference's Lightning training_step/optimizer plumbing
(/root/reference/diffusion.py:290-319, 882-921) with a functional state:
one `train_step` is one fused XLA program — forward, backward, clip,
AdamW, EMA — with metrics returned as arrays (no host sync inside the
loop).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp
import optax

from ddg_tpu.diffusion import DiffusionSpec, loss_fn
from ddg_tpu.runtime import averaging
from ddg_tpu.runtime.averaging import AveragingSpec, AveragingState
from ddg_tpu.runtime.optim import OptimSpec, make_optimizer, make_schedule


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class TrainState:
    step: jax.Array
    params: Any
    opt_state: Any
    averaging: Optional[AveragingState]
    rng: jax.Array


def init_train_state(rng, params, optim_spec: OptimSpec,
                     averaging_spec: AveragingSpec) -> TrainState:
    tx = make_optimizer(optim_spec)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        opt_state=tx.init(params),
        averaging=averaging.init(averaging_spec, params),
        rng=rng)


def make_train_step(spec: DiffusionSpec, model_apply,
                    optim_spec: OptimSpec,
                    averaging_spec: AveragingSpec):
    """Build the (jittable) train step.

    batch: dict with 'input_ids' (B, L) int32, 'attention_mask' (B, L),
    optional 'cond' (B,). For AR, 'input_ids'/'output_ids' are the
    pre-shifted pair from the data layer.
    """
    tx = make_optimizer(optim_spec)
    schedule = make_schedule(optim_spec)

    def train_step(state: TrainState, batch):
        rng, step_rng = jax.random.split(state.rng)

        def compute_loss(params):
            if spec.parameterization == 'ar':
                x0 = (batch['input_ids'], batch['output_ids'])
            else:
                x0 = batch['input_ids']
            out = loss_fn(spec, model_apply, params, x0,
                          batch['attention_mask'], batch.get('cond'),
                          step_rng, train=True, step=state.step)
            return out.loss, out

        (loss, out), grads = jax.value_and_grad(
            compute_loss, has_aux=True)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state,
                                       state.params)
        params = optax.apply_updates(state.params, updates)
        avg_state = averaging.update(averaging_spec, state.averaging,
                                     params)
        new_state = TrainState(step=state.step + 1, params=params,
                               opt_state=opt_state, averaging=avg_state,
                               rng=rng)
        metrics = {
            'loss': loss,
            'nll_sum': (out.nlls).sum(),
            'token_count': out.token_mask.sum(),
            'lr': schedule(state.step),
            'grad_norm': optax.global_norm(grads),
        }
        for name, val in [('recon_loss', out.recon_loss),
                          ('diffusion_loss', out.diffusion_loss),
                          ('unroll_loss', out.unroll_loss)]:
            if val is not None:
                metrics[name] = val
        return new_state, metrics

    return train_step


def make_eval_step(spec: DiffusionSpec, model_apply, *,
                   use_averaged: bool = True):
    """Validation/PPL-eval step: EMA (or SWA) weights, label_smoothing=0
    (reference on_validation_epoch_start, diffusion.py:938-947)."""

    def eval_step(state: TrainState, batch, rng):
        params = (averaging.averaged_params(state.averaging, state.params)
                  if use_averaged else state.params)
        if spec.parameterization == 'ar':
            x0 = (batch['input_ids'], batch['output_ids'])
        else:
            x0 = batch['input_ids']
        out = loss_fn(spec, model_apply, params, x0,
                      batch['attention_mask'], batch.get('cond'), rng,
                      train=False, label_smoothing=0.0)
        return {'nll_sum': out.nlls.sum(),
                'token_count': out.token_mask.sum()}

    return eval_step
