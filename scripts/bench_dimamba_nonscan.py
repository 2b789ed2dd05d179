"""Piecewise attribution of the NON-scan phase of the Species10
DiMamba train step (the ~110 ms remainder after the 16 scan-kernel
calls — DESIGN.md round-5 queue A), to size the mamba_inner-style
megakernel before building it (reference models/dimamba.py:176-195).

Each component is timed at its true in-model shape with K-chained
dispatch amortization and one host-transfer sync per window (the axon
runtime pipelines queued dispatches; block_until_ready returns early —
see CLAUDE.md). fwd and fwd+bwd (grads wrt inputs AND weights, like
training) are reported per block-direction, then scaled by the
16 block-directions of the Species10 model.

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python \
    scripts/bench_dimamba_nonscan.py [--B 2 --L 32768]
"""

import argparse
import functools
import time

import jax
import jax.numpy as jnp

K = 16


def _sync(x):
    leaf = jax.tree.leaves(x)[0]
    s = jnp.sum(leaf) if getattr(leaf, 'ndim', 0) else leaf
    float(jax.device_get(s))


def _timeit(fn, *args, iters=3, warmup=1):
    for _ in range(warmup):
        out = fn(*args)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
        _sync(out)
    return (time.perf_counter() - t0) / iters / K


def _chain(f, perturb_arg=0):
    """K chained invocations of f inside one jit; each iteration's
    first arg is perturbed by the previous scalar so XLA cannot CSE."""
    @jax.jit
    def run(*args):
        acc = jnp.zeros((), jnp.float32)
        for _ in range(K):
            a = list(args)
            a[perturb_arg] = a[perturb_arg] + (acc * 1e-20).astype(
                a[perturb_arg].dtype)
            out = f(*a)
            leaf = jax.tree.leaves(out)[0]
            acc = acc + jnp.sum(leaf[(0,) * (leaf.ndim - 1)]).astype(
                jnp.float32)
        return acc
    return run


def _grad_chain(f, nargs):
    def loss(*a):
        return jnp.sum(f(*a).astype(jnp.float32))
    g = jax.grad(loss, argnums=tuple(range(nargs)))

    @jax.jit
    def run(*args):
        acc = jnp.zeros((), jnp.float32)
        for _ in range(K):
            a = list(args)
            a[0] = a[0] + (acc * 1e-20).astype(a[0].dtype)
            gs = g(*a)
            acc = acc + jnp.sum(gs[0][(0,) * (gs[0].ndim - 1)]).astype(
                jnp.float32)
        return acc
    return run


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--B', type=int, default=2)
    p.add_argument('--L', type=int, default=32768)
    p.add_argument('--hidden', type=int, default=256)
    args = p.parse_args()
    B, L, H = args.B, args.L, args.hidden
    d = 2 * H
    N = 16
    R = 16
    bf = jnp.bfloat16

    ks = jax.random.split(jax.random.PRNGKey(0), 12)
    h = jax.random.normal(ks[0], (B, L, H), bf)
    x = jax.random.normal(ks[1], (B, L, d), bf)
    y = jax.random.normal(ks[2], (B, L, d), bf)
    W_in = jax.random.normal(ks[3], (H, 2 * d), bf) * 0.05
    W_out = jax.random.normal(ks[4], (d, H), bf) * 0.05
    W_x = jax.random.normal(ks[5], (d, R + 2 * N), bf) * 0.05
    W_dt = jax.random.normal(ks[6], (R, d), jnp.float32) * 0.2
    b_dt = jax.random.normal(ks[7], (d,), jnp.float32) * 0.1
    dt_lr = jax.random.normal(ks[8], (B, L, R), jnp.float32)
    conv_w = jax.random.normal(ks[9], (4, 1, d), jnp.float32) * 0.3
    conv_b = jnp.zeros((d,), jnp.float32)
    res32 = jax.random.normal(ks[10], (B, L, H), jnp.float32)
    cmod = jax.random.normal(ks[11], (B, 3 * H), bf) * 0.1

    rows = []

    def report(name, t_fwd, t_fb, mult=16):
        rows.append((name, t_fwd, t_fb, mult))
        print(f'{name:28s} fwd {t_fwd*1e3:7.3f} ms  fwd+bwd '
              f'{t_fb*1e3:7.3f} ms  x{mult}: '
              f'{t_fwd*mult*1e3:6.1f} / {t_fb*mult*1e3:6.1f} ms',
              flush=True)

    # --- in_proj (h @ W_in) ---
    f = lambda h, W: h @ W  # noqa: E731
    report('in_proj 256->1024',
           _timeit(_chain(f), h, W_in),
           _timeit(_grad_chain(f, 2), h, W_in))

    # --- out_proj (y @ W_out) ---
    report('out_proj 512->256',
           _timeit(_chain(f), y, W_out),
           _timeit(_grad_chain(f, 2), y, W_out))

    # --- conv 4-tap FMA + bias + silu (as in MambaCore) ---
    def conv_silu(x, w, b):
        acc = x * w[3, 0][None, None, :].astype(bf)
        for j in range(3):
            s = 3 - j
            shifted = jnp.pad(x[:, :-s], ((0, 0), (s, 0), (0, 0)))
            acc = acc + shifted * w[j, 0][None, None, :].astype(bf)
        return jax.nn.silu(acc + b.astype(bf))
    report('conv4+silu',
           _timeit(_chain(conv_silu), x, conv_w, conv_b),
           _timeit(_grad_chain(conv_silu, 3), x, conv_w, conv_b))

    # --- x_proj (512 -> 48) ---
    report('x_proj 512->48',
           _timeit(_chain(f), x, W_x),
           _timeit(_grad_chain(f, 2), x, W_x))

    # --- dt_proj fp32 HIGHEST + softplus (writes fp32 (B,L,512)) ---
    def dtp(dt_lr, W, b):
        pre = jax.lax.dot_general(
            dt_lr, W, (((2,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST) + b
        return jax.nn.softplus(pre)
    report('dt_proj fp32 + softplus',
           _timeit(_chain(dtp), dt_lr, W_dt, b_dt),
           _timeit(_grad_chain(dtp, 3), dt_lr, W_dt, b_dt))

    # --- block chain: add + LN fp32 + adaLN modulate + gate+residual
    # (per BLOCK not per direction: mult 8) ---
    def block_chain(hid, res, cmod, mixer_out):
        res = (hid + res).astype(jnp.float32)
        mu = jnp.mean(res, axis=-1, keepdims=True)
        var = jnp.var(res, axis=-1, keepdims=True)
        hn = ((res - mu) * jax.lax.rsqrt(var + 1e-5)).astype(bf)
        shift, scale, gate = jnp.split(cmod, 3, axis=-1)
        hm = hn * (1 + scale[:, None]) + shift[:, None]
        out = gate[:, None] * mixer_out + res.astype(bf)
        return out + hm * 0  # keep both ends live
    report('block LN+adaLN+gate chain',
           _timeit(_chain(block_chain), h, res32, cmod, h),
           _timeit(_grad_chain(block_chain, 4), h, res32, cmod, h),
           mult=8)

    # --- flips (h_flip in + out_r flip out, per block: 2 flips fwd) ---
    def flips(hid):
        return jnp.flip(jnp.flip(hid, axis=1) * 1.000001, axis=1)
    report('2x flip (B,L,256)',
           _timeit(_chain(flips), h),
           _timeit(_grad_chain(flips, 1), h),
           mult=8)

    # --- scan-kernel input marshalling: pad casts (delta fp32 pad,
    # u/z/B/C pads are no-ops at L%128==0) — representative cast ---
    def casts(x):
        return x.astype(jnp.float32).astype(bf) * 1.000001
    report('fp32<->bf16 roundtrip (B,L,512)',
           _timeit(_chain(casts), x),
           _timeit(_grad_chain(casts, 1), x),
           mult=16)

    total_fwd = sum(t * m for _, t, _, m in rows)
    total_fb = sum(t * m for _, _, t, m in rows)
    print(f'\nTOTAL modeled non-scan: fwd {total_fwd*1e3:.0f} ms  '
          f'fwd+bwd {total_fb*1e3:.0f} ms '
          f'(measured remainder ~110 ms)', flush=True)


if __name__ == '__main__':
    main()
