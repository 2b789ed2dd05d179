"""Phase-level timing of the ancestral D-CFG sampling step on chip.

Times each component of the step separately at several batch sizes to
locate scaling anomalies (e.g. the B=64 samples/sec drop):
  trunk  — DiT trunk-only forward at 2B (cond+uncond)
  head   — feature-mix + vocab matmul (B, L, D) @ (D, V)
  kernel — fused_absorbing_sample on (B, L, V) bf16 logits
  full   — one complete jitted sampling step

Usage: python scripts/bench_phases.py [--batches 16 32 48 64]
"""

import argparse
import time

import jax
import jax.numpy as jnp


def _sync(out):
    """block_until_ready returns EARLY on the axon remote runtime; only
    a host transfer synchronizes (see bench.py _sync / CLAUDE.md)."""
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
    p.add_argument('--batches', type=int, nargs='+',
                   default=[16, 32, 48, 64])
    args = p.parse_args()

    from __graft_entry__ import _flagship
    import dataclasses
    from ddg_tpu.models import DIT, make_model_apply
    from ddg_tpu.models.dit import dit_head_features, dit_head_matmul
    from ddg_tpu.ops.fused_sampling import fused_absorbing_sample
    from ddg_tpu.samplers import (GuidanceSpec, SamplerSpec,
                                  diffusion_sample)

    spec, cfg, model, apply_fn = _flagship()
    spec = dataclasses.replace(spec, num_classes=2)
    cfg = dataclasses.replace(cfg, num_classes=2,
                              logits_dtype=jnp.bfloat16)
    model = DIT(cfg)
    apply_fn = make_model_apply(model)
    rng = jax.random.PRNGKey(0)
    params = model.init(rng, jnp.zeros((1, cfg.length), jnp.int32),
                        jnp.ones((1,)), jnp.zeros((1,), jnp.int32)
                        )['params']
    L, V = cfg.length, spec.vocab_size
    gamma = 2.0

    # params stays an explicit argument everywhere: a jitted closure
    # over concrete arrays bakes them into the HLO as constants, and
    # the ~200 MB upload exceeds the remote-compile tunnel's request
    # limit (HTTP 413).
    @jax.jit
    def trunk(params, x2, s2, c2):
        return apply_fn(params, x2, s2, c2, None, train=False,
                        rng=None, skip_head=True)

    @jax.jit
    def head(params, hidden2, cvec2):
        B2 = hidden2.shape[0]
        B = B2 // 2
        feats2 = dit_head_features(cfg, params, hidden2, cvec2)
        fmix = (gamma * feats2[:B].astype(jnp.float32)
                + (1 - gamma) * feats2[B:].astype(jnp.float32))
        return dit_head_matmul(cfg, params,
                               fmix.astype(feats2.dtype)
                               ).astype(jnp.bfloat16)

    sampler = SamplerSpec(steps=100, use_cache=False, fused=True)
    guidance = GuidanceSpec(method='cfg', gamma=gamma, condition=0)

    # Pure-matmul reference: the same matmul shapes as 12 DiT blocks
    # (qkv/out/mlp-in/mlp-out) with no attention/norms/modulation —
    # the MXU floor for the trunk at each batch.
    D = cfg.hidden_size
    Wq = jnp.zeros((D, 3 * D), jnp.bfloat16)
    Wo = jnp.zeros((D, D), jnp.bfloat16)
    W1 = jnp.zeros((D, 4 * D), jnp.bfloat16)
    W2 = jnp.zeros((4 * D, D), jnp.bfloat16)

    @jax.jit
    def mmref(h, Wq, Wo, W1, W2):
        for _ in range(cfg.n_blocks):
            q = h @ Wq
            h = h + q[:, :, :D] @ Wo
            h = h + jax.nn.gelu(h @ W1) @ W2
        return h

    print(f'{"B":>4} {"trunk2B":>9} {"mmref2B":>9} {"head":>9} '
          f'{"kernel":>9} {"sum":>9} {"full/step":>10}')
    for B in args.batches:
        x2 = jnp.zeros((2 * B, L), jnp.int32)
        s2 = jnp.ones((2 * B,))
        c2 = jnp.concatenate([jnp.zeros((B,), jnp.int32),
                              jnp.full((B,), 2, jnp.int32)])
        hidden2, cvec2 = trunk(params, x2, s2, c2)
        t_trunk = _timeit(trunk, params, x2, s2, c2)
        h0 = jnp.zeros((2 * B, L, D), jnp.bfloat16)
        t_mm = _timeit(mmref, h0, Wq, Wo, W1, W2)
        logits = head(params, hidden2, cvec2)
        t_head = _timeit(head, params, hidden2, cvec2)
        xt = jnp.full((B, L), spec.mask_index, jnp.int32)
        mct = jnp.full((B,), 0.8)
        mcs = jnp.full((B,), 0.7)
        kern = jax.jit(lambda s, xt, lg, a, b: fused_absorbing_sample(
            s, xt, lg, a, b, mask_index=spec.mask_index))
        t_kern = _timeit(kern, jnp.int32(7), xt, logits, mct, mcs)

        cond = jnp.zeros((B,), jnp.int32)

        @jax.jit
        def full(params, key):
            return diffusion_sample(
                spec, sampler, apply_fn, params, key, batch_size=B,
                length=L, guidance=guidance, cond=cond, dit_cfg=cfg)

        t_full = _timeit(full, params, jax.random.PRNGKey(1), iters=3,
                         warmup=1) / sampler.steps
        print(f'{B:>4} {t_trunk*1e3:>8.2f}m {t_mm*1e3:>8.2f}m '
              f'{t_head*1e3:>8.2f}m {t_kern*1e3:>8.2f}m '
              f'{(t_trunk+t_head+t_kern)*1e3:>8.2f}m '
              f'{t_full*1e3:>9.2f}m', flush=True)


if __name__ == '__main__':
    main()
