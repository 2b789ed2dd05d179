"""A/B the in-tree Pallas TPU flash-attention vs XLA attention at DiT shapes.

The DiT train step is bound by attention: XLA's dot_product_attention
materializes the (B, H, L, L) probs tensor in HBM (~800 MB fp32 at the
text8 train shape B=256 L=256 H=12) while the matmul FLOPs are worth
<1 ms. `jax.experimental.pallas.ops.tpu.flash_attention` never writes
the probs tensor (online softmax in VMEM) and ships tuned fwd+bwd
kernels — unlike the hand-rolled kernels measured in rounds 2-3.

Timing per CLAUDE.md: K calls inside one jitted lax.scan (perturbing q
each iteration to defeat CSE), host-transfer sync, so the ~30 ms
per-dispatch axon overhead is amortized.

Usage: python scripts/bench_attention_flash.py [--shape 256 256 12 64]
"""

import argparse
import functools
import math
import time

import jax
import jax.numpy as jnp


def _sync(x):
    s = jnp.sum(x) if getattr(x, 'ndim', 0) else x
    float(jax.device_get(s))


def _timed(fn, args, iters=3):
    out = fn(*args)
    _sync(out)
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        _sync(out)
        ts.append(time.perf_counter() - t0)
    return min(ts)


def xla_attn(q, k, v, causal):
    return jax.nn.dot_product_attention(q, k, v, is_causal=causal)


def einsum_attn(q, k, v, causal, probs_dtype=jnp.float32, remat=False):
    """The SHIPPED einsum attention (ddg_tpu.models.dit
    ::einsum_attention, the model.attn_probs_bf16/attn_remat path) —
    imported, not copied, so the sweep always measures the production
    code."""
    from ddg_tpu.models.dit import einsum_attention
    return einsum_attention(q, k, v, causal=causal,
                            probs_dtype=probs_dtype, remat=remat)


def flash_attn(q, k, v, causal, block=None, block_b=1):
    from jax.experimental.pallas.ops.tpu import flash_attention as fa
    sizes = None
    if block is not None:
        b = block
        sizes = fa.BlockSizes(
            block_q=b, block_k_major=b, block_k=b, block_b=block_b,
            block_q_major_dkv=b, block_k_major_dkv=b, block_k_dkv=b,
            block_q_dkv=b, block_k_major_dq=b, block_k_dq=b,
            block_q_dq=b)
    # kernel wants (B, H, L, D); model layout is (B, L, H, D)
    qt, kt, vt = (t.swapaxes(1, 2) for t in (q, k, v))
    o = fa.flash_attention(qt, kt, vt, causal=causal,
                           sm_scale=1.0 / math.sqrt(q.shape[-1]),
                           block_sizes=sizes)
    return o.swapaxes(1, 2)


def bench(name, attn_fn, B, L, H, D, K, causal, bwd):
    key = jax.random.PRNGKey(0)
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (B, L, H, D), jnp.bfloat16)
    k = jax.random.normal(kk, (B, L, H, D), jnp.bfloat16)
    v = jax.random.normal(kv, (B, L, H, D), jnp.bfloat16)

    if bwd:
        def one(q, k, v):
            def loss(q, k, v):
                return jnp.sum(attn_fn(q, k, v, causal).astype(jnp.float32))
            gq, gk, gv = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
            return gq + gk + gv
    else:
        def one(q, k, v):
            return attn_fn(q, k, v, causal)

    @jax.jit
    def loop(q, k, v):
        def body(carry, i):
            qi = q + carry[:1, :1, :1, :1]  # perturb: defeat CSE
            o = one(qi, k, v)
            return o * 1e-9, ()
        out, _ = jax.lax.scan(body, jnp.zeros_like(q),
                              jnp.arange(K))
        return out

    t = _timed(loop, (q, k, v)) / K
    flops = 4 * B * H * L * L * D * (3 if bwd else 1)
    if causal:
        flops //= 2
    print(f'{name:28s} {"fwd+bwd" if bwd else "fwd":8s} '
          f'{t * 1e3:8.3f} ms  {flops / t / 1e12:6.1f} TFLOP/s',
          flush=True)
    return t


def check(B, L, H, D, causal):
    """Value + grad agreement: pallas flash vs XLA attention."""
    key = jax.random.PRNGKey(7)
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (B, L, H, D), jnp.bfloat16)
    k = jax.random.normal(kk, (B, L, H, D), jnp.bfloat16)
    v = jax.random.normal(kv, (B, L, H, D), jnp.bfloat16)

    def loss(attn_fn, q, k, v):
        return jnp.sum(attn_fn(q, k, v, causal).astype(jnp.float32) ** 2)

    for name, fn in (
            ('xla', xla_attn),
            ('flash', flash_attn),
            ('einsum-bf16',
             functools.partial(einsum_attn, probs_dtype=jnp.bfloat16)),
            ('einsum-bf16-remat',
             functools.partial(einsum_attn, probs_dtype=jnp.bfloat16,
                               remat=True))):
        f = jax.jit(jax.value_and_grad(
            functools.partial(loss, fn), argnums=(0, 1, 2)))
        try:
            val, grads = f(q, k, v)
        except ValueError as e:  # Pallas has no CPU lowering
            print(f'check {name}: skipped ({e})', flush=True)
            continue
        yield name, float(val), [jnp.asarray(g, jnp.float32) for g in grads]


def run_check(B, L, H, D, causal):
    (n0, v0, g0), *rest = check(B, L, H, D, causal)
    for n1, v1, g1 in rest:
        rel = abs(v1 - v0) / (abs(v0) + 1e-9)
        gerr = max(float(jnp.max(jnp.abs(a - b))) /
                   (float(jnp.max(jnp.abs(a))) + 1e-9)
                   for a, b in zip(g0, g1))
        print(f'check {n1} vs xla causal={causal}: loss rel-err '
              f'{rel:.2e}, max grad rel-err {gerr:.2e}', flush=True)
        assert rel < 2e-2 and gerr < 5e-2, f'{n1} vs xla mismatch'


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--shape', type=int, nargs=4, default=[256, 256, 12, 64],
                   metavar=('B', 'L', 'H', 'D'))
    p.add_argument('--iters', type=int, default=8,
                   help='K scan iterations per dispatch')
    p.add_argument('--causal', action='store_true')
    p.add_argument('--check', action='store_true',
                   help='assert flash matches XLA (values + grads)')
    p.add_argument('--block-b', type=int, nargs='*', default=[1, 8, 32],
                   dest='block_b',
                   help='flash BlockSizes.block_b values to sweep')
    args = p.parse_args()
    B, L, H, D = args.shape
    K = args.iters
    print(f'shape B={B} L={L} H={H} D={D} causal={args.causal} '
          f'(K={K} scan-amortized)', flush=True)
    if args.check:
        run_check(min(B, 8), L, H, D, args.causal)
    variants = [
        ('xla dot_product_attention', xla_attn),
        ('einsum probs=fp32',
         functools.partial(einsum_attn, probs_dtype=jnp.float32)),
        ('einsum probs=bf16',
         functools.partial(einsum_attn, probs_dtype=jnp.bfloat16)),
        ('einsum bf16 + remat',
         functools.partial(einsum_attn, probs_dtype=jnp.bfloat16,
                           remat=True)),
        ('pallas flash (default 128)', flash_attn),
    ]
    for bb in args.block_b:
        variants.append(
            (f'pallas flash (b={min(256, L)} block_b={bb})',
             functools.partial(flash_attn, block=min(256, L),
                               block_b=bb)))
    for bwd in (False, True):
        for name, fn in variants:
            try:
                bench(name, fn, B, L, H, D, K, args.causal, bwd)
            except Exception as e:  # noqa: BLE001 — sweep survives a leg
                print(f'{name:28s} {"fwd+bwd" if bwd else "fwd":8s} '
                      f'FAILED: {type(e).__name__}: {e}', flush=True)


if __name__ == '__main__':
    main()
