"""Minimize the text8 B=512 train-step compile failure (DESIGN gap:
B=256 compiles and runs; B=512 got HTTP 500 / subprocess exit 1 from
the remote compile helper).

Sweeps batch size x dropout (the RBG dropout-mask Pallas kernel is the
prime suspect: its mask shape scales with B*L*D) and compiles each
variant with .lower().compile() — no run — printing per-variant
pass/fail so the failing component is isolated.

Usage: PYTHONPATH=/root/repo python scripts/diag_train512.py
"""

import argparse
import traceback

import jax
import jax.numpy as jnp


def build_step(B, dropout):
    from ddg_tpu.diffusion import DiffusionSpec
    from ddg_tpu.models import DIT, DITConfig, make_model_apply
    from ddg_tpu.ops.noise_schedules import LogLinearNoise
    from ddg_tpu.runtime.averaging import AveragingSpec
    from ddg_tpu.runtime.optim import OptimSpec
    from ddg_tpu.runtime.train_state import (init_train_state,
                                             make_train_step)

    cfg = DITConfig(hidden_size=768, cond_dim=128, length=256,
                    n_blocks=12, n_heads=12, dropout=dropout,
                    vocab_size=35)
    spec = DiffusionSpec(diffusion='absorbing_state',
                         parameterization='subs',
                         noise=LogLinearNoise(),
                         vocab_size=cfg.vocab_size,
                         mask_index=cfg.vocab_size - 1)
    model = DIT(cfg)
    apply_fn = make_model_apply(model)
    rng = jax.random.PRNGKey(0)
    x = jax.random.randint(rng, (B, cfg.length), 0, cfg.vocab_size - 1)
    params = model.init(rng, x[:1], jnp.ones((1,)))['params']
    optim = OptimSpec(lr=3e-4, num_warmup_steps=2500)
    avg = AveragingSpec.ema(0.9999)
    state = init_train_state(rng, params, optim, avg)
    step = jax.jit(make_train_step(spec, apply_fn, optim, avg),
                   donate_argnums=(0,))
    batch = {'input_ids': x,
             'attention_mask': jnp.ones((B, cfg.length), jnp.float32)}
    return step, state, batch


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--variants', default='512:0.0,512:0.1,384:0.1')
    args = p.parse_args()
    for v in args.variants.split(','):
        b_s, d_s = v.split(':')
        B, dropout = int(b_s), float(d_s)
        try:
            step, state, batch = build_step(B, dropout)
            lowered = step.lower(state, batch)
            lowered.compile()
            print(f'B={B} dropout={dropout}: COMPILE OK', flush=True)
        except Exception as e:  # noqa: BLE001
            msg = str(e).splitlines()
            head = msg[0] if msg else repr(e)
            print(f'B={B} dropout={dropout}: FAIL — {head[:300]}',
                  flush=True)
            traceback.print_exc(limit=3)


if __name__ == '__main__':
    main()
