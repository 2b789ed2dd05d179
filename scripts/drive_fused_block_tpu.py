"""On-chip drive for the fused Mamba-block ("mamba_inner") kernel
(ops/mamba_block_pallas.py): full-model parity (loss + grads, fused vs
unfused pps3 path) at the Species10 production shape, then a sustained
full-train-step timing A/B (bench_dimamba protocol: one host-transfer
sync after the timed window — axon pipelines queued dispatches).

Parity target: reference mamba_inner_fn
(/root/reference/models/dimamba.py:176-195).

Usage (ONE TPU job at a time; kernel compiles take 10-25 min):
    PYTHONPATH=/root/repo:$PYTHONPATH \
        python scripts/drive_fused_block_tpu.py > /tmp/fused_drive.log 2>&1
"""

import dataclasses
import time

import jax
import jax.numpy as jnp
import numpy as np

from ddg_tpu.models.dimamba import DiMamba, DiMambaConfig

B, L = 2, 32768


def _sync(x):
    leaf = jax.tree.leaves(x)[0]
    s = jnp.sum(leaf) if getattr(leaf, 'ndim', 0) else leaf
    return float(jax.device_get(s))


def main():
    print('devices:', jax.devices(), flush=True)
    base = DiMambaConfig(hidden_size=256, n_blocks=8, length=L,
                         vocab_size=16, num_classes=10, dropout=0.0)
    cfg_f = dataclasses.replace(base, fused_block=True)
    model_u, model_f = DiMamba(base), DiMamba(cfg_f)

    rng = jax.random.PRNGKey(0)
    x = jax.random.randint(rng, (B, L), 0, base.vocab_size - 1)
    sigma = jnp.full((B,), 0.37)
    cond = jnp.zeros((B,), jnp.int32)
    t0 = time.perf_counter()
    params = model_u.init(rng, x[:1], sigma[:1], cond[:1])
    w = jax.random.normal(jax.random.PRNGKey(1),
                          (B, L, base.vocab_size)) / (B * L)
    print(f'init done {time.perf_counter()-t0:.1f}s', flush=True)

    # --- parity: loss + grads, fused vs unfused, same params ---
    def make_loss(model):
        def loss(p):
            return jnp.sum(model.apply(p, x, sigma, cond) * w)
        return jax.jit(jax.value_and_grad(loss))

    t0 = time.perf_counter()
    lu, gu = make_loss(model_u)(params)
    _sync(lu)
    print(f'unfused fwd+bwd compiled+run {time.perf_counter()-t0:.1f}s '
          f'loss={float(lu):.6f}', flush=True)
    t0 = time.perf_counter()
    lf, gf = make_loss(model_f)(params)
    _sync(lf)
    print(f'fused   fwd+bwd compiled+run {time.perf_counter()-t0:.1f}s '
          f'loss={float(lf):.6f}', flush=True)

    rel_loss = abs(float(lu) - float(lf)) / (abs(float(lu)) + 1e-12)
    worst = 0.0
    worst_name = ''
    for (path, a), b in zip(jax.tree_util.tree_leaves_with_path(gu),
                            jax.tree_util.tree_leaves(gf)):
        a = np.asarray(a, np.float32)
        b = np.asarray(b, np.float32)
        scale = float(np.max(np.abs(a))) + 1e-12
        err = float(np.max(np.abs(a - b))) / scale
        if err > worst:
            worst, worst_name = err, jax.tree_util.keystr(path)
    print(f'PARITY loss rel diff {rel_loss:.2e}; worst grad leaf '
          f'{worst_name}: {worst:.2e} (rel to max|g|)', flush=True)
    ok = rel_loss < 2e-3 and worst < 5e-2
    print('PARITY', 'PASS' if ok else 'FAIL', flush=True)

    # --- timing: full train step A/B (bench_dimamba protocol) ---
    from ddg_tpu.diffusion import DiffusionSpec
    from ddg_tpu.models import make_model_apply
    from ddg_tpu.ops.noise_schedules import LogLinearNoise
    from ddg_tpu.runtime.averaging import AveragingSpec
    from ddg_tpu.runtime.optim import OptimSpec
    from ddg_tpu.runtime.train_state import (init_train_state,
                                             make_train_step)

    spec = DiffusionSpec(diffusion='absorbing_state',
                         parameterization='subs',
                         noise=LogLinearNoise(),
                         vocab_size=base.vocab_size,
                         mask_index=base.vocab_size - 1,
                         num_classes=base.num_classes)
    batch = {'input_ids': x,
             'attention_mask': jnp.ones((B, L), jnp.float32),
             'cond': cond}
    optim = OptimSpec(lr=2e-3, num_warmup_steps=100)
    avg = AveragingSpec.ema(0.9999)

    for name, model in (('unfused', model_u), ('fused', model_f)):
        apply_fn = make_model_apply(model)
        state = init_train_state(jax.random.PRNGKey(0),
                                 params['params'], optim, avg)
        step = jax.jit(make_train_step(spec, apply_fn, optim, avg),
                       donate_argnums=(0,))
        t0 = time.perf_counter()
        state, m = step(state, batch)
        _sync(m['loss'])
        print(f'{name}: first step (compile) '
              f'{time.perf_counter()-t0:.1f}s', flush=True)
        iters = 8
        t0 = time.perf_counter()
        for _ in range(iters):
            state, m = step(state, batch)
        _sync(m['loss'])
        dt = (time.perf_counter() - t0) / iters
        print(f'{name}: step {dt*1e3:.1f} ms  '
              f'{B*L/dt/1e3:.1f}K tok/s  loss={float(m["loss"]):.4f}',
              flush=True)


if __name__ == '__main__':
    main()
