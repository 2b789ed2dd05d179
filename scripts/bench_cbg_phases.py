"""On-chip CBG-exact phase attribution + chunk sweep (round 5).

The first QM9 D-CBG bench line measured 0.78 samples/s at 23.9% MFU —
well under the ~70% the same matmul shapes reach in the DiT train
step. This script attributes the step: (a) the tiny-classifier forward
alone at the edit-batch shape (K-amortized), (b) the denoiser forward,
(c) the full guided step at several cbg_chunk values, so the gap
separates into classifier-compute vs edit-plumbing vs map overhead.

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python scripts/bench_cbg_phases.py
"""

import argparse
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, '/root/repo')

import bench  # noqa: E402


def _sync(x):
    leaf = jax.tree.leaves(x)[0]
    float(jax.device_get(jnp.sum(leaf).astype(jnp.float32)))


def timeit(fn, *a, iters=4, warmup=1):
    for _ in range(warmup):
        out = fn(*a)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*a)
    _sync(out)
    return (time.perf_counter() - t0) / iters


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--chunks', type=int, nargs='*',
                   default=[128, 384, 1152])
    p.add_argument('--K', type=int, default=8)
    args = p.parse_args()
    print('devices:', jax.devices(), flush=True)

    (spec, cfg, clf_cfg, apply_fn, params, clf_apply,
     clf_params) = bench._qm9_cbg_setup(False)
    B, L, V = 16, cfg.length, cfg.vocab_size
    K = args.K

    # (a) classifier forward at the edit-batch shape, K-amortized.
    for rows in (2048, 4096, 18432):
        x = jax.random.randint(jax.random.PRNGKey(0), (rows, L), 0, V)
        sig = jnp.full((rows,), 0.5)

        @jax.jit
        def clfK(cp, x, sig):
            acc = jnp.float32(0.0)
            for _ in range(K):
                logits = clf_apply(cp, x + (acc == 1.0).astype(x.dtype),
                                   sig)
                acc = jnp.sum(logits[0]).astype(jnp.float32)
            return acc

        dt = timeit(clfK, clf_params, x, sig) / K
        flops = bench.dit_trunk_flops(rows, L, clf_cfg.hidden_size,
                                      clf_cfg.n_blocks)
        print(f'clf fwd rows={rows:6d}: {dt*1e3:8.2f} ms  '
              f'mfu={flops/dt/197e12:.3f}', flush=True)

    # (b) denoiser forward at (B, L), K-amortized.
    x = jax.random.randint(jax.random.PRNGKey(1), (B, L), 0, V)
    sig = jnp.full((B,), 0.5)

    @jax.jit
    def denK(p_, x, sig):
        acc = jnp.float32(0.0)
        for _ in range(K):
            lg = apply_fn(p_, x + (acc == 1.0).astype(x.dtype), sig,
                          None, None, train=False, rng=None)
            acc = jnp.sum(lg[0, 0]).astype(jnp.float32)
        return acc

    dt = timeit(denK, params, x, sig) / K
    print(f'denoiser fwd (B={B}): {dt*1e3:8.2f} ms', flush=True)

    # (c) full guided step at several chunk sizes.
    for chunk in args.chunks:
        a = argparse.Namespace(quick=False, batch=16, steps=32,
                               cbg_chunk=chunk)
        try:
            bench.bench_cbg(a, approx=False)
        except Exception as e:
            print(f'chunk={chunk} FAILED: {e}', flush=True)


if __name__ == '__main__':
    main()
