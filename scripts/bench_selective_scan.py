"""On-chip benchmark: Pallas selective-scan kernel vs the XLA chunked
associative scan, at the Species10 DiMamba shape (the production
workload: L=32768, d_inner=2*256=512, N=16; reference CUDA kernel being
replaced: /root/reference/models/dimamba.py:230-249).

Measures forward-only and forward+backward (value_and_grad wrt u/delta/
A/B/C) wall time, plus a correctness cross-check on the first batch.

Usage: python scripts/bench_selective_scan.py [--L 32768] [--d 512]
"""

import argparse
import time

import jax
import jax.numpy as jnp

from ddg_tpu.models.dimamba import selective_scan
from ddg_tpu.ops.selective_scan_pallas import selective_scan_pallas


def _sync(out):
    # block_until_ready returns EARLY on the axon remote runtime; only
    # a host transfer synchronizes (see bench.py _sync / CLAUDE.md).
    leaf = jax.tree.leaves(out)[0]
    s = jnp.sum(leaf) if getattr(leaf, 'ndim', 0) else leaf
    float(jax.device_get(s))


def _timeit(fn, *args, iters=20, warmup=3):
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
    p.add_argument('--d', type=int, default=512)
    p.add_argument('--N', type=int, default=16)
    p.add_argument('--chunk', type=int, default=128)
    p.add_argument('--iters', type=int, default=20)
    args = p.parse_args()
    B, L, d, N = args.B, args.L, args.d, args.N

    ks = jax.random.split(jax.random.PRNGKey(0), 7)
    u = jax.random.normal(ks[0], (B, L, d), jnp.float32)
    delta = jax.nn.softplus(jax.random.normal(ks[1], (B, L, d)) - 1)
    A = -jnp.exp(jax.random.normal(ks[2], (d, N)) * 0.5)
    Bc = jax.random.normal(ks[3], (B, L, N))
    Cc = jax.random.normal(ks[4], (B, L, N))
    D = jax.random.normal(ks[5], (d,))
    z = jax.random.normal(ks[6], (B, L, d))

    xla = jax.jit(lambda *a: selective_scan(*a, chunk=args.chunk))
    pallas = jax.jit(
        lambda *a: selective_scan_pallas(*a, chunk=args.chunk))

    y0 = xla(u, delta, A, Bc, Cc, D, z)
    y1 = pallas(u, delta, A, Bc, Cc, D, z)
    err = float(jnp.max(jnp.abs(y0 - y1))
                / (jnp.max(jnp.abs(y0)) + 1e-9))
    print(f'fwd rel err: {err:.2e}')

    # K calls inside one jit: a single axon dispatch carries ~30 ms
    # fixed overhead which would inflate both sides (CLAUDE.md rule);
    # the acc perturbation defeats CSE.
    K = 4

    def _K(fn):
        @jax.jit
        def wrapped(u, delta, A, Bc, Cc, D, z):
            acc = 0.0
            for _ in range(K):
                out = fn(u + acc * 1e-20, delta, A, Bc, Cc, D, z)
                leaf = out[0] if isinstance(out, tuple) else out
                acc = jnp.sum(leaf[0, 0])
            return acc
        return wrapped

    t_xla = _timeit(_K(lambda *a: selective_scan(*a, chunk=args.chunk)),
                    u, delta, A, Bc, Cc, D, z, iters=args.iters) / K
    t_pal = _timeit(
        _K(lambda *a: selective_scan_pallas(*a, chunk=args.chunk)),
        u, delta, A, Bc, Cc, D, z, iters=args.iters) / K
    print(f'fwd   XLA {t_xla*1e3:8.2f} ms   Pallas {t_pal*1e3:8.2f} ms '
          f'  speedup {t_xla/t_pal:.2f}x')

    def loss_xla(u, delta, A, Bc, Cc, D, z):
        return selective_scan(u, delta, A, Bc, Cc, D, z,
                              chunk=args.chunk).sum()

    def loss_pal(u, delta, A, Bc, Cc, D, z):
        return selective_scan_pallas(u, delta, A, Bc, Cc, D, z,
                                     chunk=args.chunk).sum()

    gx = jax.jit(jax.grad(loss_xla, argnums=(0, 1, 2, 3, 4, 5, 6)))
    gp = jax.jit(jax.grad(loss_pal, argnums=(0, 1, 2, 3, 4, 5, 6)))
    g0 = gx(u, delta, A, Bc, Cc, D, z)
    g1 = gp(u, delta, A, Bc, Cc, D, z)
    for name, a, b in zip(('du', 'ddelta', 'dA', 'dB', 'dC', 'dD',
                           'dz'), g0, g1):
        e = float(jnp.max(jnp.abs(a - b))
                  / (jnp.max(jnp.abs(a)) + 1e-9))
        print(f'grad {name}: rel err {e:.2e}')

    g7 = tuple(range(7))
    t_gx = _timeit(_K(lambda *a: jax.grad(loss_xla, argnums=g7)(*a)),
                   u, delta, A, Bc, Cc, D, z, iters=args.iters) / K
    t_gp = _timeit(_K(lambda *a: jax.grad(loss_pal, argnums=g7)(*a)),
                   u, delta, A, Bc, Cc, D, z, iters=args.iters) / K
    print(f'grad  XLA {t_gx*1e3:8.2f} ms   Pallas {t_gp*1e3:8.2f} ms '
          f'  speedup {t_gx/t_gp:.2f}x')


if __name__ == '__main__':
    main()
