"""On-chip decomposition of the Species10 DiMamba train step.

Times, with honest host-transfer sync (block_until_ready returns early
on the axon remote runtime — see CLAUDE.md):
  * scan kernel fwd / fwd+bwd alone at the per-block shape
  * one full model fwd (loss only)
  * the full train step (fwd+bwd+optimizer)
so the non-scan remainder can be attributed before building the
mamba_inner-style megakernel (reference models/dimamba.py:176-195).

Usage: PYTHONPATH=/root/repo python scripts/bench_dimamba_phases.py
"""

import argparse
import time

import jax
import jax.numpy as jnp


def _sync(out):
    leaf = jax.tree.leaves(out)[0]
    s = jnp.sum(leaf) if getattr(leaf, 'ndim', 0) else leaf
    float(jax.device_get(s))


def _timeit(fn, *args, iters=10, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
        _sync(out)
    return (time.perf_counter() - t0) / iters


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--B', type=int, default=2)
    p.add_argument('--L', type=int, default=32768)
    p.add_argument('--hidden', type=int, default=256)
    p.add_argument('--blocks', type=int, default=8)
    p.add_argument('--iters', type=int, default=10)
    p.add_argument('--dt_inkernel', type=int, default=0)
    p.add_argument('--seg', type=int, default=64)
    p.add_argument('--seg_bwd', type=int, default=64)
    p.add_argument('--impl', default='pps3')
    p.add_argument('--remat', type=int, default=0)
    args = p.parse_args()

    from ddg_tpu.diffusion import DiffusionSpec, loss_fn
    from ddg_tpu.models import make_model_apply
    from ddg_tpu.models.dimamba import DiMamba, DiMambaConfig
    from ddg_tpu.ops.noise_schedules import LogLinearNoise
    from ddg_tpu.ops.selective_scan_pallas import ssm_scan
    from ddg_tpu.runtime.averaging import AveragingSpec
    from ddg_tpu.runtime.optim import OptimSpec
    from ddg_tpu.runtime.train_state import (init_train_state,
                                             make_train_step)

    B, L = args.B, args.L
    d = 2 * args.hidden
    N = 16

    # --- scan kernel alone (per-direction shape) ---
    ks = jax.random.split(jax.random.PRNGKey(0), 7)
    u = jax.random.normal(ks[0], (B, L, d), jnp.float32)
    delta = jax.nn.softplus(jax.random.normal(ks[1], (B, L, d)) - 1)
    A_log = jax.random.normal(ks[2], (N, d)) * 0.5
    Bc = jax.random.normal(ks[3], (B, L, N))
    Cc = jax.random.normal(ks[4], (B, L, N))
    Dv = jax.random.normal(ks[5], (d,))
    z = jax.random.normal(ks[6], (B, L, d), jnp.float32)

    # Amortize the ~30 ms per-dispatch overhead of the remote runtime:
    # chain K kernel invocations inside ONE jitted program (each
    # iteration's input perturbed by the previous result so XLA cannot
    # CSE them) and divide. Unrolled python loop — a lax.scan over the
    # pallas_call hit a TPU FailedPrecondition on chip.
    K = 16

    @jax.jit
    def scan_fwd(u, delta, A_log, Bc, Cc, z, Dv):
        acc = 0.0
        for _ in range(K):
            y = ssm_scan(u + acc * 1e-20, delta, A_log, Bc, Cc, z, Dv,
                         128, 512, 256, False, args.seg,
                         jnp.float32, args.seg_bwd, args.impl)
            acc = jnp.sum(y[0, 0])
        return acc

    @jax.jit
    def scan_fwdbwd(u, delta, A_log, Bc, Cc, z, Dv):
        def loss(*a):
            return jnp.sum(ssm_scan(*a, 128, 512, 256, False,
                                    args.seg, jnp.float32,
                                    args.seg_bwd, args.impl))

        acc = 0.0
        for _ in range(K):
            g = jax.grad(loss, argnums=(0, 1, 2, 3, 4, 5, 6))(
                u + acc * 1e-20, delta, A_log, Bc, Cc, z, Dv)[0]
            acc = jnp.sum(g[0, 0])
        return acc

    t_fwd = _timeit(scan_fwd, u, delta, A_log, Bc, Cc, z, Dv,
                    iters=3) / K
    t_fb = _timeit(scan_fwdbwd, u, delta, A_log, Bc, Cc, z, Dv,
                   iters=3) / K
    per_dir_blocks = 2 * args.blocks
    print(f'scan kernel: fwd {t_fwd*1e3:.2f} ms  fwd+bwd '
          f'{t_fb*1e3:.2f} ms  (x{per_dir_blocks} dir-blocks: '
          f'{t_fwd*per_dir_blocks*1e3:.0f} / '
          f'{t_fb*per_dir_blocks*1e3:.0f} ms)', flush=True)

    # --- fused mamba_inner megakernel alone (post-round-4
    # attribution, VERDICT r4 weak #4: where do the 0.187 s go
    # now that the whole direction-block is one kernel?) ---
    from ddg_tpu.ops.mamba_block_pallas import mamba_inner_pallas
    H = args.hidden
    dt_rank = max(1, H // 16)
    kf = jax.random.split(jax.random.PRNGKey(7), 10)
    hin = jax.random.normal(kf[0], (B, L, H), jnp.float32)
    W_in = jax.random.normal(kf[1], (H, 2 * d)) * 0.05
    conv_w = jax.random.normal(kf[2], (4, 1, d)) * 0.3
    conv_b = jax.random.normal(kf[3], (d,)) * 0.1
    W_x = jax.random.normal(kf[4], (d, dt_rank + 2 * N)) * 0.1
    W_dt = jax.random.normal(kf[5], (dt_rank, d)) * 0.1
    b_dt = jax.random.normal(kf[6], (d,)) * 0.1
    A_f = -jnp.exp(jax.random.normal(kf[7], (d, N)) * 0.5)
    D_f = jax.random.normal(kf[8], (d,))
    W_out = jax.random.normal(kf[9], (d, H)) * 0.05

    def _fused(h, *w):
        return mamba_inner_pallas(h, *w, d_state=N, dt_rank=dt_rank,
                                  seg=args.seg, seg_bwd=args.seg_bwd)

    @jax.jit
    def fused_fwd(h, *w):
        acc = 0.0
        for _ in range(K):
            y = _fused(h + acc * 1e-20, *w)
            acc = jnp.sum(y[0, 0].astype(jnp.float32))
        return acc

    @jax.jit
    def fused_fwdbwd(h, *w):
        def loss(*a):
            return jnp.sum(_fused(*a).astype(jnp.float32))
        acc = 0.0
        for _ in range(K):
            g = jax.grad(loss)(h + acc * 1e-20, *w)
            acc = jnp.sum(g[0, 0])
        return acc

    wts = (W_in, conv_w, conv_b, W_x, W_dt, b_dt, A_f, D_f, W_out)
    t_mfwd = _timeit(fused_fwd, hin, *wts, iters=3) / K
    t_mfb = _timeit(fused_fwdbwd, hin, *wts, iters=3) / K
    print(f'megakernel: fwd {t_mfwd*1e3:.2f} ms  fwd+bwd '
          f'{t_mfb*1e3:.2f} ms  (x{per_dir_blocks} dir-blocks: '
          f'{t_mfwd*per_dir_blocks*1e3:.0f} / '
          f'{t_mfb*per_dir_blocks*1e3:.0f} ms)', flush=True)

    # --- full model ---
    cfg = DiMambaConfig(hidden_size=args.hidden, n_blocks=args.blocks,
                        length=L, vocab_size=16, num_classes=10,
                        dt_inkernel=bool(args.dt_inkernel),
                        scan_seg=args.seg,
                        scan_seg_bwd=args.seg_bwd,
                        scan_impl=args.impl,
                        remat=bool(args.remat))
    spec = DiffusionSpec(diffusion='absorbing_state',
                         parameterization='subs',
                         noise=LogLinearNoise(),
                         vocab_size=cfg.vocab_size,
                         mask_index=cfg.vocab_size - 1,
                         num_classes=cfg.num_classes)
    model = DiMamba(cfg)
    apply_fn = make_model_apply(model)
    rng = jax.random.PRNGKey(0)
    x = jax.random.randint(rng, (B, L), 0, cfg.vocab_size - 1)
    cond = jnp.zeros((B,), jnp.int32)
    params = model.init(rng, x[:1], jnp.ones((1,)), cond[:1])['params']

    @jax.jit
    def fwd_loss(params, x, cond, key):
        out = loss_fn(spec, apply_fn, params, x,
                      jnp.ones_like(x, jnp.float32), cond, key,
                      train=False)
        return out.loss

    t_fwd_model = _timeit(fwd_loss, params, x, cond,
                          jax.random.PRNGKey(1), iters=args.iters)
    print(f'model fwd (loss): {t_fwd_model*1e3:.2f} ms', flush=True)

    optim = OptimSpec(lr=2e-3, num_warmup_steps=100)
    avg = AveragingSpec.ema(0.9999)
    state = init_train_state(rng, params, optim, avg)
    step = jax.jit(make_train_step(spec, apply_fn, optim, avg),
                   donate_argnums=(0,))
    batch = {'input_ids': x,
             'attention_mask': jnp.ones((B, L), jnp.float32),
             'cond': cond}
    state, m = step(state, batch)
    _sync(m['loss'])
    # Sustained async-dispatch timing (one sync after the window;
    # per-step sync pays ~30 ms dispatch+RTT each — see DESIGN.md).
    t0 = time.perf_counter()
    for _ in range(args.iters):
        state, m = step(state, batch)
    _sync(m['loss'])
    t_step = (time.perf_counter() - t0) / args.iters
    print(f'train step: {t_step*1e3:.2f} ms '
          f'({B*L/t_step/1e3:.0f}K tok/s)', flush=True)
    print(f'attribution (unfused scan): fwd+bwd x{per_dir_blocks} = '
          f'{t_fb*per_dir_blocks*1e3:.0f} ms; remainder = '
          f'{(t_step - t_fb*per_dir_blocks)*1e3:.0f} ms', flush=True)
    print(f'attribution (megakernel, the default step): fwd+bwd '
          f'x{per_dir_blocks} = {t_mfb*per_dir_blocks*1e3:.0f} ms; '
          f'remainder (embed/head/loss/opt/adaLN) = '
          f'{(t_step - t_mfb*per_dir_blocks)*1e3:.0f} ms', flush=True)


if __name__ == '__main__':
    main()
