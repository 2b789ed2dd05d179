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

from ddg_tpu.diffusion import DiffusionSpec, Loss, loss_fn
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
                    averaging_spec: AveragingSpec,
                    accum_steps: int = 1):
    """Build the (jittable) train step.

    batch: dict with 'input_ids' (B, L) int32, 'attention_mask' (B, L),
    optional 'cond' (B,). For AR, 'input_ids'/'output_ids' are the
    pre-shifted pair from the data layer.

    accum_steps > 1 (the reference's accumulate_grad_batches,
    configs/config.yaml trainer) expects batch leaves with a leading
    (accum, micro_batch, ...) shape; gradients are averaged via
    `lax.scan` over micro-batches inside the same compiled step, and
    the optimizer/EMA update once — exact Lightning accumulation
    semantics with no host round-trips.
    """
    tx = make_optimizer(optim_spec)
    schedule = make_schedule(optim_spec)

    def micro_loss(params, batch, step_rng, step):
        if spec.parameterization == 'ar':
            x0 = (batch['input_ids'], batch['output_ids'])
        else:
            x0 = batch['input_ids']
        out = loss_fn(spec, model_apply, params, x0,
                      batch['attention_mask'], batch.get('cond'),
                      step_rng, train=True, step=step)
        return out.loss, out

    def train_step(state: TrainState, batch):
        rng, step_rng = jax.random.split(state.rng)

        if accum_steps == 1:
            (loss, out), grads = jax.value_and_grad(
                micro_loss, has_aux=True)(state.params, batch, step_rng,
                                          state.step)
        else:
            def scan_body(carry, micro):
                grads_acc, loss_acc, nll_acc, cnt_acc = carry
                mb, idx = micro
                (l, o), g = jax.value_and_grad(
                    micro_loss, has_aux=True)(
                    state.params, mb,
                    jax.random.fold_in(step_rng, idx), state.step)
                grads_acc = jax.tree.map(jnp.add, grads_acc, g)
                return (grads_acc, loss_acc + l,
                        nll_acc + o.nlls.sum(),
                        cnt_acc + o.token_mask.sum()), None

            zero_grads = jax.tree.map(jnp.zeros_like, state.params)
            (grads, loss_sum, nll_sum, cnt_sum), _ = jax.lax.scan(
                scan_body,
                (zero_grads, jnp.zeros(()), jnp.zeros(()),
                 jnp.zeros(())),
                (batch, jnp.arange(accum_steps)))
            grads = jax.tree.map(lambda g: g / accum_steps, grads)
            loss = loss_sum / accum_steps
            out = Loss(loss=loss, nlls=nll_sum[None, None],
                       token_mask=cnt_sum[None, None])
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
