"""Benchmark suite: one JSON line per workload.

The FIRST line is the driver-stable metric (unchanged format since
round 1): LM1B-class guided sampling via the first-hitting sampler —
DiT-small (hidden 768, 12 blocks/heads), vocab 30523 (bert-base +
mask), seq len 128, MDLM absorbing-state diffusion, D-CFG gamma=2,
B=32, samples/sec/chip.

Subsequent lines (default run) cover the rest of the perf story:
  * ancestral T=1000 D-CFG (the BASELINE.json-named workload,
    step-for-step exact; fused Pallas kernel + feature-mix CFG)
  * AR-CFG KV-cache decode
  * text8 training step (DiT-small, L=256, global batch 512)
  * Species10 DiMamba training step (hidden 256, 8 blocks, L=32768)
  * CIFAR10 UNet uniform-diffusion guided sampling (fused kernel)

Every line carries an `mfu` field: analytic model FLOPs (documented
closed forms below — XLA's cost_analysis counts while-loop bodies ONCE,
not x trip count, so it is useless for scan-driven samplers) / wall
time / peak bf16 FLOPs of the chip (v5e: 197e12). Lines are emitted as
each workload finishes, so a failure in one workload doesn't lose the
others.

`vs_baseline` is measured throughput over an estimated reference A100
throughput. The reference publishes no numbers (SURVEY §6), so the
denominator is FLOPs-based: A100 bf16 at 40% MFU = 125 TFLOP/s over
the same per-sample/per-token FLOPs. For the LM1B sampling workloads
that works out to ~2.2 samples/sec at T=1000 (2 sequential DiT-small
forwards/step, diffusion.py:1448-1455) — the north-star target is
vs_baseline >= 5 on the T=1000 ancestral line. For DiMamba the
reference path is memory-bound CUDA (FLOPs-based estimates are
meaningless), so vs_baseline is null there.

Single-workload flags: --ancestral, --ar, --train, --dimamba, --unet,
--first-hitting. Default (no flags) runs the full suite.
"""

import argparse
import dataclasses
import json
import time

import jax
import jax.numpy as jnp

A100_EFFECTIVE_FLOPS = 0.4 * 312e12     # bf16 at 40% MFU
A100_BASELINE_SAMPLES_PER_SEC = 2.2     # LM1B T=1000 D-CFG (docstring)
AR_BASELINE = 7.0                       # full-prefix recompute estimate


def _peak_flops():
    try:
        kind = jax.devices()[0].device_kind.lower()
    except Exception:
        return None
    for key, peak in (('v5 lite', 197e12), ('v5e', 197e12),
                      ('v5p', 459e12), ('v4', 275e12),
                      ('v6', 918e12), ('v5', 197e12)):
        if key in kind:
            return peak
    return None


def dit_trunk_flops(B, L, D, n_blocks):
    """One DiT trunk forward (matmul FLOPs; 2*m*n*k per matmul):
    per block qkv (6BLD^2) + attention QK^T/AV (4BL^2D) + out proj
    (2BLD^2) + MLP 4x (16BLD^2) = 24BLD^2 + 4BL^2D."""
    return n_blocks * (24 * B * L * D * D + 4 * B * L * L * D)


def dit_head_flops(B, L, D, V):
    return 2 * B * L * D * V


def dimamba_train_flops(B, L, D, n_blocks, d_state, *,
                        bidirectional=True, dt_rank=None):
    """DiMamba fwd matmul+scan FLOPs x3 for fwd+bwd (the standard
    fwd + 2x-bwd accounting; block remat is off by default — the scan
    kernel's in-kernel h recompute is part of its measured cost, not
    extra model FLOPs). Per block
    per direction: in_proj D->2*d_in (8BLD^2 at d_in=2D), x_proj
    (2BL*d_in*(dt_rank+2N)), dt_proj (2BL*dt_rank*d_in), out_proj
    (4BLD^2), conv (8BL*d_in), scan ~6 flops per (l, d_in, N) cell."""
    d_in = 2 * D
    dt_rank = dt_rank or max(1, D // 16)
    per_dir = (2 * B * L * D * (2 * d_in)
               + 2 * B * L * d_in * (dt_rank + 2 * d_state)
               + 2 * B * L * dt_rank * d_in
               + 2 * B * L * d_in * D
               + 8 * B * L * d_in
               + 6 * B * L * d_in * d_state)
    ndir = 2 if bidirectional else 1
    return 3 * n_blocks * ndir * per_dir


def _sync(out):
    """Force completion. jax.block_until_ready returns EARLY through
    the axon remote runtime (measured: a 5-call matmul chain 'blocks'
    in 0.3ms, then the scalar pull takes the real 200s+) — only a host
    transfer synchronizes reliably, so reduce one leaf to a scalar and
    pull it."""
    leaf = jax.tree.leaves(out)[0]
    s = jnp.sum(leaf) if getattr(leaf, 'ndim', 0) else leaf
    float(jax.device_get(s))


def _timeit(fn, args, iters, warmup=1):
    out = None
    for _ in range(warmup):
        out = fn(*args)
    _sync(out)
    # Sustained timing: sync ONCE after the window. The single-chip
    # axon runtime executes queued dispatches in order, so the final
    # pull bounds all of them; syncing per call adds ~30 ms
    # dispatch+RTT each (see DESIGN.md round-4 correction).
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _sync(out)
    return (time.perf_counter() - t0) / iters, out


def _emit(metric, value, unit, vs_baseline, mfu, **extra):
    rec = {'metric': metric, 'value': round(value, 4), 'unit': unit,
           'vs_baseline': (round(vs_baseline, 3)
                           if vs_baseline is not None else None),
           'mfu': round(mfu, 4) if mfu is not None else None}
    rec.update(extra)
    print(json.dumps(rec), flush=True)
    return rec


def _mfu(flops, dt):
    peak = _peak_flops()
    if not peak or not flops:
        return None
    return flops / dt / peak


def _lm1b_setup(quick, *, causal=False, num_classes=2,
                bf16_head=True, pallas_attn=False, int8=False):
    from __graft_entry__ import _flagship
    from ddg_tpu.models import jit_init, DIT, make_model_apply

    spec, cfg, model, apply_fn = _flagship(tiny=quick)
    spec = dataclasses.replace(spec, num_classes=num_classes)
    cfg = dataclasses.replace(cfg, num_classes=num_classes,
                              causal=causal)
    if bf16_head:
        cfg = dataclasses.replace(cfg, logits_dtype=jnp.bfloat16)
    if pallas_attn:
        cfg = dataclasses.replace(cfg, pallas_attention=True)
    if int8:
        cfg = dataclasses.replace(cfg, quant_int8=True)
    model = DIT(cfg)
    apply_fn = make_model_apply(model)
    rng = jax.random.PRNGKey(0)
    x = jax.random.randint(rng, (1, cfg.length), 0, cfg.vocab_size)
    sigma = None if causal else jnp.ones((1,))
    params = jit_init(model, rng, x, sigma,
                        jnp.zeros((1,), jnp.int32))['params']
    return spec, cfg, apply_fn, params


def bench_sampling(args, first_hitting):
    """LM1B D-CFG sampling: first-hitting (driver line) or ancestral."""
    from ddg_tpu.samplers import (GuidanceSpec, SamplerSpec,
                                  diffusion_sample)

    if first_hitting:
        batch = args.batch or 32
        fused, steps = False, args.steps
    else:
        # Measured per-chip optimum B=24 (the trunk scales
        # superlinearly in tokens past 2B=48; see README).
        batch = args.batch or 24
        fused, steps = args.fused is not False, args.steps
    spec, cfg, apply_fn, params = _lm1b_setup(
        args.quick, int8=bool(getattr(args, 'int8', False)))
    if args.quick:
        batch, steps = 4, 16
    sampler = SamplerSpec(steps=steps, use_cache=bool(args.cache),
                          fused=fused, first_hitting=first_hitting,
                          fused_head=bool(getattr(args, 'fused_head',
                                                  False)))
    guidance = GuidanceSpec(method='cfg', gamma=2.0, condition=0)
    cond = jnp.zeros((batch,), jnp.int32)

    @jax.jit
    def run(params, key):
        return diffusion_sample(spec, sampler, apply_fn, params, key,
                                batch_size=batch, length=cfg.length,
                                guidance=guidance, cond=cond,
                                dit_cfg=cfg)

    L, D, V = cfg.length, cfg.hidden_size, cfg.vocab_size
    if first_hitting:
        # L decode events, each one 2B-batched CFG trunk forward +
        # per-position head (vocab projection on ONE position).
        flops = L * (dit_trunk_flops(2 * batch, L, D, cfg.n_blocks)
                     + 2 * (2 * batch) * D * V)
    else:
        # T steps x (2B CFG trunk + feature-mix head on B rows)
        flops = steps * (dit_trunk_flops(2 * batch, L, D, cfg.n_blocks)
                         + dit_head_flops(batch, L, D, V))
    dt, _ = _timeit(run, (params, jax.random.PRNGKey(2)),
                    iters=1 if args.quick else 3)
    sps = batch / dt / jax.device_count()
    name = ('first-hitting ~ T=inf exact' if first_hitting
            else f'T={steps}')
    tag = ', int8' if getattr(args, 'int8', False) else ''
    if getattr(args, 'fused_head', False):
        tag += ', fused-head'
    return _emit(
        f'LM1B D-CFG samples/sec/chip ({name}, B={batch}, '
        + ('tiny' if args.quick else 'DiT-small') + tag + ')',
        sps, 'samples/sec/chip',
        sps / A100_BASELINE_SAMPLES_PER_SEC, _mfu(flops, dt))


def _qm9_cbg_setup(quick, *, approx=False, int8=False):
    """QM9 eval-protocol shapes (reference scripts/eval_qm9_guidance.sh
    + guidance_eval/qm9_eval.py:88-204): DiT-small denoiser (model=small,
    model.length=32) over the QM9 SMILES vocab (35 + mask), tiny DIT
    classifier (classifier_model=tiny-classifier: hidden 512, 8
    blocks), B=16, T=32."""
    from ddg_tpu.diffusion import DiffusionSpec
    from ddg_tpu.models import (jit_init, DIT, DITClassifier, DITConfig,
                                make_classifier_apply, make_model_apply)
    from ddg_tpu.ops.noise_schedules import LogLinearNoise

    if quick:
        cfg = DITConfig(hidden_size=64, cond_dim=32, length=16,
                        n_blocks=2, n_heads=2, dropout=0.0,
                        vocab_size=36)
        clf_cfg = dataclasses.replace(cfg, hidden_size=32, n_blocks=1,
                                      n_heads=1)
    else:
        cfg = DITConfig(hidden_size=768, cond_dim=128, length=32,
                        n_blocks=12, n_heads=12, dropout=0.0,
                        vocab_size=36)
        clf_cfg = dataclasses.replace(cfg, hidden_size=512, n_blocks=8,
                                      n_heads=8)
    if int8:
        # CBG-EXACT is pure forward scoring (no classifier gradients,
        # unlike approx/NOS/PPLM), so the int8 dynamic-quant trunk is
        # legitimate on both the denoiser and the edit classifier.
        assert not approx, 'int8 kills the approx-mode gradients'
        cfg = dataclasses.replace(cfg, quant_int8=True)
        clf_cfg = dataclasses.replace(clf_cfg, quant_int8=True)
    spec = DiffusionSpec(diffusion='absorbing_state',
                         parameterization='subs', noise=LogLinearNoise(),
                         vocab_size=cfg.vocab_size,
                         mask_index=cfg.vocab_size - 1)
    model = DIT(cfg)
    apply_fn = make_model_apply(model)
    rng = jax.random.PRNGKey(0)
    x = jax.random.randint(rng, (1, cfg.length), 0, cfg.vocab_size)
    params = jit_init(model, rng, x, jnp.ones((1,)))['params']
    clf = DITClassifier(clf_cfg, num_classes=2, pooling='mean')
    clf_apply = make_classifier_apply(clf)
    # CBG-approx differentiates through one-hot inputs; init with the
    # one-hot signature so tracing in-sampler matches.
    x_in = (jax.nn.one_hot(x, cfg.vocab_size) if approx else x)
    clf_params = jit_init(clf, jax.random.PRNGKey(1), x_in,
                          jnp.ones((1,)))['params']
    return spec, cfg, clf_cfg, apply_fn, params, clf_apply, clf_params


def bench_cbg(args, approx=False):
    """QM9 D-CBG guided sampling — the repo's namesake capability
    (reference diffusion.py:1511-1624 `_cbg_denoise`, measured at the
    qm9_eval.py protocol shape). Exact mode scores ALL B*L*V
    single-token edits with the classifier each reverse step (chunked
    lax.map, samplers.classifier_log_probs_edits); approx mode takes
    one classifier gradient at the one-hot of xt (first-order Taylor,
    diffusion.py:1532-1548)."""
    from ddg_tpu.samplers import (GuidanceSpec, SamplerSpec,
                                  diffusion_sample)

    q8 = bool(getattr(args, 'int8', False)) and not approx
    (spec, cfg, clf_cfg, apply_fn, params, clf_apply,
     clf_params) = _qm9_cbg_setup(args.quick, approx=approx, int8=q8)
    B = args.batch or 16
    steps = 32 if args.steps == 1000 else args.steps
    if args.quick:
        B, steps = 2, 4
    L, V = cfg.length, cfg.vocab_size
    # cbg_chunk: edits per lax.map chunk. On-chip sweep (round 5,
    # scripts/bench_cbg_phases.py): 128 > 384 > 1152 (0.906 / 0.801 /
    # 0.783 samples/s) — the 2048-row classifier batches of chunk=128
    # run at the best MFU, so small chunks are the default.
    chunk = getattr(args, 'cbg_chunk', None) or 128
    sampler = SamplerSpec(steps=steps, use_cache=False, fused=False)
    guidance = GuidanceSpec(method='cbg', gamma=2.0, condition=1,
                            use_approx=approx, cbg_chunk=chunk)

    @jax.jit
    def run(params, clf_params, key):
        return diffusion_sample(spec, sampler, apply_fn, params, key,
                                batch_size=B, length=L,
                                guidance=guidance,
                                classifier_apply=clf_apply,
                                classifier_params=clf_params)

    Dm, Dc = cfg.hidden_size, clf_cfg.hidden_size
    denoiser = dit_trunk_flops(B, L, Dm, cfg.n_blocks) \
        + dit_head_flops(B, L, Dm, V)
    if approx:
        # One classifier fwd+bwd (3x fwd) on one-hot inputs per step:
        # the one-hot embed is a real (B*L, V)x(V, Dc) matmul here.
        clf_flops = 3 * (dit_trunk_flops(B, L, Dc, clf_cfg.n_blocks)
                         + 2 * B * L * V * Dc)
    else:
        padded = -(-L * V // chunk) * chunk   # edits scored per sample
        clf_flops = dit_trunk_flops(B * padded, L, Dc, clf_cfg.n_blocks)
    flops = steps * (denoiser + clf_flops)
    dt, out = _timeit(run, (params, clf_params, jax.random.PRNGKey(2)),
                      iters=1 if args.quick else (2 if not approx
                                                  else 3))
    assert out.shape == (B, L)
    sps = B / dt / jax.device_count()
    baseline = A100_EFFECTIVE_FLOPS / (flops / B)
    mode = 'approx' if approx else f'exact, chunk={chunk}'
    if q8:
        mode += ', int8'
    return _emit(
        f'QM9 D-CBG samples/sec/chip ({mode}, T={steps}, B={B}, '
        + ('tiny' if args.quick else
           'DiT-small + tiny-classifier') + ')',
        sps, 'samples/sec/chip', sps / baseline, _mfu(flops, dt))


def bench_nos(args):
    """NOS guided sampling at the LM1B flagship shape (reference
    diffusion.py:1626-1736 `_nos_denoise`): per reverse step, Adagrad
    ascent on a hidden-state delta through the classifier head + the
    denoiser output head (the trunk runs once; the inner loop
    differentiates only the heads, reference dit.py:516-536 x_emb
    path)."""
    from ddg_tpu.models import jit_init, DITClassifier, make_classifier_apply
    from ddg_tpu.samplers import (GuidanceSpec, SamplerSpec,
                                  diffusion_sample)

    spec, cfg, apply_fn, params = _lm1b_setup(args.quick)
    B = args.batch or 16
    steps = 128 if args.steps == 1000 else args.steps
    nos_steps = getattr(args, 'nos_steps', None) or 1
    if args.quick:
        B, steps = 2, 4
    L, D, V = cfg.length, cfg.hidden_size, cfg.vocab_size
    # NOS classifier = pooling + linear head over the denoiser's
    # hidden states (frozen-encoder protocol, reference
    # main.py:218-234); init via the x_emb signature.
    clf = DITClassifier(cfg, num_classes=2, pooling='mean')
    clf_apply = make_classifier_apply(clf)
    clf_params = jit_init(clf, jax.random.PRNGKey(1),
                          jnp.zeros((1, L), jnp.int32), jnp.ones((1,)),
                          jnp.zeros((1, L, D)))['params']
    sampler = SamplerSpec(steps=steps, use_cache=False, fused=False)
    guidance = GuidanceSpec(method='nos', condition=1,
                            num_nos_steps=nos_steps, nos_step_size=0.1,
                            nos_stability_coef=0.01)

    @jax.jit
    def run(params, clf_params, key):
        return diffusion_sample(spec, sampler, apply_fn, params, key,
                                batch_size=B, length=L,
                                guidance=guidance,
                                classifier_apply=clf_apply,
                                classifier_params=clf_params)

    # Per step: one trunk fwd; the Adagrad loop differentiates the
    # vocab head (fwd+bwd ~ 3x) per inner step, plus the final guided
    # head fwd. Classifier head (D x 2) is negligible.
    head = dit_head_flops(B, L, D, V)
    flops = steps * (dit_trunk_flops(B, L, D, cfg.n_blocks)
                     + head * (2 + 3 * nos_steps))
    dt, out = _timeit(run, (params, clf_params, jax.random.PRNGKey(2)),
                      iters=1 if args.quick else 3)
    assert out.shape == (B, L)
    sps = B / dt / jax.device_count()
    baseline = A100_EFFECTIVE_FLOPS / (flops / B)
    return _emit(
        f'LM1B NOS samples/sec/chip (T={steps}, B={B}, '
        f'nos_steps={nos_steps}, '
        + ('tiny' if args.quick else 'DiT-small') + ')',
        sps, 'samples/sec/chip', sps / baseline, _mfu(flops, dt))


def bench_ar(args):
    from ddg_tpu.samplers import GuidanceSpec, SamplerSpec, ar_sample

    # B=256 default (measured 446.9 samples/s with bucketed cache
    # reads; the 4 GB of pre-sampled Gumbel noise fits the 16G HBM
    # with the caches at this shape). 2B CFG rows must be a multiple
    # of the 128-row MXU tile: B=32 half-fills it (168.9/s), B=64
    # (356.0/s) is the smallest full-tile batch.
    batch = args.batch or 256
    spec, cfg, apply_fn, params = _lm1b_setup(args.quick, causal=True)
    spec = dataclasses.replace(spec, parameterization='ar')
    if args.quick:
        batch = 4
    guidance = GuidanceSpec(method='cfg', gamma=2.0, condition=0)
    cond = jnp.zeros((batch,), jnp.int32)
    kv_int8 = bool(getattr(args, 'int8', False))
    sampler = SamplerSpec(steps=args.steps, ar_kv_int8=kv_int8)

    @jax.jit
    def run(params, key):
        return ar_sample(spec, sampler, apply_fn,
                         params, key, batch_size=batch,
                         length=cfg.length, bos_token_id=0,
                         guidance=guidance, cond=cond, decode_cfg=cfg)

    # Incremental KV-cache decode, 2B CFG rows: per generated token
    # 24D^2 matmul FLOPs/row + attention against the prefix (4D*l),
    # summed over l=1..L, + the per-token vocab head.
    L, D, V = cfg.length, cfg.hidden_size, cfg.vocab_size
    flops = (2 * batch) * cfg.n_blocks * (24 * D * D * L
                                          + 2 * D * L * L) \
        + L * 2 * (2 * batch) * D * V
    dt, _ = _timeit(run, (params, jax.random.PRNGKey(2)),
                    iters=1 if args.quick else 3)
    sps = batch / dt / jax.device_count()
    return _emit(
        f'LM1B AR-CFG samples/sec/chip (KV-cache decode, B={batch}, '
        + ('tiny' if args.quick else 'DiT-small')
        + (', int8-kv' if kv_int8 else '') + ')',
        sps, 'samples/sec/chip', sps / AR_BASELINE, _mfu(flops, dt))


def bench_train_text8(args):
    """text8 training step: DiT-small, L=256, global batch 512 on one
    chip (reference scripts/train_text8.sh protocol), synthetic batch,
    jitted step only (the input pipeline is benched by main.train's
    tok/s counters)."""
    from ddg_tpu.diffusion import DiffusionSpec
    from ddg_tpu.models import jit_init, DIT, DITConfig, make_model_apply
    from ddg_tpu.ops.noise_schedules import LogLinearNoise
    from ddg_tpu.runtime.averaging import AveragingSpec
    from ddg_tpu.runtime.optim import OptimSpec
    from ddg_tpu.runtime.train_state import (init_train_state,
                                             make_train_step)

    if args.quick:
        cfg = DITConfig(hidden_size=64, cond_dim=32, length=64,
                        n_blocks=2, n_heads=2, dropout=0.1,
                        vocab_size=35)
        B = 8
    else:
        cfg = DITConfig(hidden_size=768, cond_dim=128, length=256,
                        n_blocks=12, n_heads=12, dropout=0.1,
                        vocab_size=35)
        # Reference protocol global batch (train_text8.sh: 512).
        B = args.batch or 512
    if getattr(args, 'flash_attn', False):
        if getattr(args, 'attn_bf16', False) \
                or getattr(args, 'attn_remat', False):
            # The flash-attention branch runs before the einsum/remat
            # fallback in DDiTBlock, so these knobs would be silently
            # inert — refuse rather than mislabel the A/B.
            raise SystemExit('--flash-attn is mutually exclusive with '
                             '--attn-bf16/--attn-remat (the flash '
                             'branch bypasses them)')
        cfg = dataclasses.replace(cfg, tpu_flash_attn=True)
    if getattr(args, 'attn_bf16', False):
        cfg = dataclasses.replace(cfg, attn_probs_bf16=True)
    if getattr(args, 'attn_remat', False):
        cfg = dataclasses.replace(cfg, attn_remat=True)
    if getattr(args, 'fused_adaln', False):
        cfg = dataclasses.replace(cfg, fused_adaln=True)
    # Default accumulation keeps the micro-batch at 16: the round-4c
    # on-chip sweep at B=512 is monotone down to micro-16 and turns at
    # micro-8 (accum 4/8/16/32/64 = 159.6/176.4/209.9/236.7/222.9K
    # tok/s; 43.6 -> 64.7% MFU at micro-16) — per-micro activation
    # HBM traffic shrinks with micro-batch until weight re-reads
    # dominate. Grad accumulation is exact for the mean-reduced
    # masked loss (tests/test_runtime.py accum-vs-manual parity), so
    # global-batch semantics are unchanged. --accum N overrides.
    accum = getattr(args, 'accum', None) or \
        (B // 16 if B >= 32 and B % 16 == 0 else 1)
    accum = max(1, accum)
    spec = DiffusionSpec(diffusion='absorbing_state',
                         parameterization='subs', noise=LogLinearNoise(),
                         vocab_size=cfg.vocab_size,
                         mask_index=cfg.vocab_size - 1)
    model = DIT(cfg)
    apply_fn = make_model_apply(model)
    rng = jax.random.PRNGKey(0)
    x = jax.random.randint(rng, (B, cfg.length), 0, cfg.vocab_size - 1)
    params = jit_init(model, rng, x[:1], jnp.ones((1,)))['params']
    optim = OptimSpec(lr=3e-4, num_warmup_steps=2500)
    avg = AveragingSpec.ema(0.9999)
    state = init_train_state(rng, params, optim, avg)
    step = jax.jit(make_train_step(spec, apply_fn, optim, avg,
                                   accum_steps=accum),
                   donate_argnums=(0,))
    batch = {'input_ids': x,
             'attention_mask': jnp.ones((B, cfg.length), jnp.float32)}
    if accum > 1:
        # global batch B as (accum, micro, L): B=512 single-shot OOMs
        # the 16G HBM (compile-measured 20.5G); the in-step lax.scan
        # accumulation runs the same global batch in micro-chunks.
        batch = jax.tree.map(
            lambda a: a.reshape(accum, B // accum, *a.shape[1:]), batch)

    # fwd+bwd ~ 3x the forward matmul FLOPs
    flops = 3 * (dit_trunk_flops(B, cfg.length, cfg.hidden_size,
                                 cfg.n_blocks)
                 + dit_head_flops(B, cfg.length, cfg.hidden_size,
                                  cfg.vocab_size))
    # donation: thread the state through the timing loop. Sustained
    # async-dispatch timing: ONE host sync after the window (queued
    # executions pipeline on the axon runtime — syncing per step adds
    # ~30 ms dispatch+RTT per step, measured 292 vs 262 ms/step on
    # DiMamba); the sequential state dependency guarantees every step
    # ran before the final loss pull.
    state, m = step(state, batch)
    _sync(m['loss'])
    iters = 1 if args.quick else 10
    t0 = time.perf_counter()
    for _ in range(iters):
        state, m = step(state, batch)
    _sync(m['loss'])
    dt = (time.perf_counter() - t0) / iters
    tok_s = B * cfg.length / dt / jax.device_count()
    n_chips = jax.device_count()
    baseline = A100_EFFECTIVE_FLOPS / (flops / (B * cfg.length))
    tag = (f', accum={accum}' if accum > 1 else '')
    if getattr(args, 'flash_attn', False):
        tag += ', flash-attn'
    if getattr(args, 'attn_bf16', False):
        tag += ', attn-bf16'
    if getattr(args, 'attn_remat', False):
        tag += ', attn-remat'
    if getattr(args, 'fused_adaln', False):
        tag += ', fused-adaln'
    return _emit(
        f'text8 train tokens/sec/chip (DiT-small, L={cfg.length}, '
        f'B={B}' + tag + ')',
        tok_s, 'tokens/sec/chip', tok_s / baseline,
        _mfu(flops / n_chips, dt))


def bench_dimamba(args):
    """Species10 DiMamba training step at the reference production
    shape (scripts/train_ten_species_guidance.sh: hidden 256, 8 blocks,
    per-device batch 2, L=32768). vs_baseline is null: the reference
    path is memory-bound CUDA; FLOPs-based A100 estimates would be
    meaningless."""
    from ddg_tpu.diffusion import DiffusionSpec
    from ddg_tpu.models import jit_init, make_model_apply
    from ddg_tpu.models.dimamba import DiMamba, DiMambaConfig
    from ddg_tpu.ops.noise_schedules import LogLinearNoise
    from ddg_tpu.runtime.averaging import AveragingSpec
    from ddg_tpu.runtime.optim import OptimSpec
    from ddg_tpu.runtime.train_state import (init_train_state,
                                             make_train_step)

    if args.quick:
        cfg = DiMambaConfig(hidden_size=32, n_blocks=2, length=256,
                            vocab_size=16, num_classes=10)
        B = 2
    else:
        cfg = DiMambaConfig(hidden_size=256, n_blocks=8, length=32768,
                            vocab_size=16, num_classes=10)
        B = 2
    if getattr(args, 'xla_scan', False):
        # A/B: XLA chunked associative scan instead of the Pallas
        # kernel; block remat back on (the XLA path stores h per
        # direction without it and OOMs at this shape).
        cfg = dataclasses.replace(cfg, pallas_scan=False, remat=True)
    spec = DiffusionSpec(diffusion='absorbing_state',
                         parameterization='subs', noise=LogLinearNoise(),
                         vocab_size=cfg.vocab_size,
                         mask_index=cfg.vocab_size - 1,
                         num_classes=cfg.num_classes)
    model = DiMamba(cfg)
    apply_fn = make_model_apply(model)
    rng = jax.random.PRNGKey(0)
    x = jax.random.randint(rng, (B, cfg.length), 0, cfg.vocab_size - 1)
    cond = jnp.zeros((B,), jnp.int32)
    params = jit_init(model, rng, x[:1], jnp.ones((1,)), cond[:1])['params']
    optim = OptimSpec(lr=2e-3, num_warmup_steps=100)
    avg = AveragingSpec.ema(0.9999)
    state = init_train_state(rng, params, optim, avg)
    # --accum probes micro-batching here too (text8's round-4c lever);
    # default 1: at B=2 the candidate split is only micro-batch 1.
    dm_accum = max(1, getattr(args, 'accum', None) or 1)
    step = jax.jit(make_train_step(spec, apply_fn, optim, avg,
                                   accum_steps=dm_accum),
                   donate_argnums=(0,))
    batch = {'input_ids': x,
             'attention_mask': jnp.ones((B, cfg.length), jnp.float32),
             'cond': cond}
    if dm_accum > 1:
        batch = jax.tree.map(
            lambda a: a.reshape(dm_accum, B // dm_accum, *a.shape[1:]),
            batch)

    flops = dimamba_train_flops(B, cfg.length, cfg.hidden_size,
                                cfg.n_blocks, cfg.d_state,
                                bidirectional=cfg.bidirectional)
    state, m = step(state, batch)
    _sync(m['loss'])
    # Sustained async-dispatch timing — see bench_train_text8.
    iters = 1 if args.quick else 8
    t0 = time.perf_counter()
    for _ in range(iters):
        state, m = step(state, batch)
    _sync(m['loss'])
    dt = (time.perf_counter() - t0) / iters
    tok_s = B * cfg.length / dt / jax.device_count()
    return _emit(
        f'Species10 DiMamba train tokens/sec/chip (hidden '
        f'{cfg.hidden_size}, {cfg.n_blocks} blocks, L={cfg.length}, '
        f'B={B}'
        + (f', accum={dm_accum}' if dm_accum > 1 else '')
        + (', xla-scan' if getattr(args, 'xla_scan', False) else '')
        + ')', tok_s, 'tokens/sec/chip', None,
        _mfu(flops / jax.device_count(), dt),
        step_seconds=round(dt, 4))


def bench_unet(args):
    """CIFAR10 guided sampling: UNet + uniform (UDLM) diffusion, D-CFG,
    fused uniform Pallas kernel (reference workload:
    scripts/train_cifar10_unet_guidance.sh + config sampling.steps)."""
    from ddg_tpu.diffusion import DiffusionSpec
    from ddg_tpu.models import jit_init, make_model_apply
    from ddg_tpu.models.unet import UNet, UNetConfig
    from ddg_tpu.ops.noise_schedules import LogLinearNoise
    from ddg_tpu.samplers import (GuidanceSpec, SamplerSpec,
                                  diffusion_sample)

    # bf16 trunk = the reference protocol precision (its CIFAR runs
    # train/sample under 16-mixed autocast); --fp32 for the A/B;
    # --int8 A/Bs the s8 conv trunk (ops/quant.int8_conv).
    cd = jnp.float32 if getattr(args, 'fp32', False) else jnp.bfloat16
    q8 = bool(getattr(args, 'int8', False))
    # --norm-bf16: GroupNorm outputs in bf16 (halves the ~20 fp32
    # norm streams of the BW-bound forward; round-5 floor probe).
    nd = jnp.bfloat16 if getattr(args, 'norm_bf16', False) \
        else jnp.float32
    # --fused-norm: one-pass GroupNorm+SiLU Pallas kernel (stats +
    # apply in a single HBM read; round-5 Pallas probe on the
    # BW-bound trunk, VERDICT r4 next #2). Interpret mode on CPU.
    fnorm = bool(getattr(args, 'fused_norm', False))
    pinterp = fnorm and jax.default_backend() == 'cpu'
    if args.quick:
        cfg = UNetConfig(ch=16, num_res_blocks=1, num_scales=2,
                         ch_mult=(1, 1), image_size=8, num_classes=10,
                         dropout=0.0, compute_dtype=cd, quant_int8=q8,
                         norm_dtype=nd, fused_norm=fnorm,
                         pallas_interpret=pinterp)
        B, steps = 2, 4
    else:
        cfg = UNetConfig(ch=128, num_res_blocks=2, num_scales=4,
                         ch_mult=(1, 2, 2, 2), image_size=32,
                         num_classes=10, dropout=0.0, compute_dtype=cd,
                         quant_int8=q8, norm_dtype=nd,
                         fused_norm=fnorm, pallas_interpret=pinterp)
        # B=32 measured best on v5e (35.5 vs 34.1 at 16 / 34.1 at 64)
        B, steps = args.batch or 32, args.steps if args.steps != 1000 \
            else 128
    L = cfg.image_size * cfg.image_size * cfg.input_channels
    # uniform state: vocab has no mask token (reference main.py vision
    # branch: vocab = 256 pixel values)
    spec = DiffusionSpec(diffusion='uniform', parameterization='d3pm',
                         noise=LogLinearNoise(),
                         vocab_size=cfg.vocab_size, mask_index=-1,
                         num_classes=cfg.num_classes)
    model = UNet(cfg)
    apply_fn = make_model_apply(model)
    rng = jax.random.PRNGKey(0)
    x = jnp.zeros((1, L), jnp.int32)
    params = jit_init(model, rng, x, jnp.ones((1,)),
                        jnp.zeros((1,), jnp.int32))['params']
    guidance = GuidanceSpec(method='cfg', gamma=2.0, condition=0)
    cond = jnp.zeros((B,), jnp.int32)
    sampler = SamplerSpec(steps=steps, use_cache=False,
                          fused=args.fused is not False)

    @jax.jit
    def run(params, key):
        return diffusion_sample(spec, sampler, apply_fn, params, key,
                                batch_size=B, length=L,
                                guidance=guidance, cond=cond)

    # Per-forward FLOPs from XLA cost analysis of ONE un-scanned UNet
    # apply (cost_analysis is valid there — no while loop to undercount)
    # x steps; the CFG pair runs as one 2B-batched forward per step.
    @jax.jit
    def one_fwd(params, x, sigma, c):
        return apply_fn(params, x, sigma, c, None, train=False,
                        rng=None)

    x2 = jnp.zeros((2 * B, L), jnp.int32)
    s2 = jnp.ones((2 * B,))
    c2 = jnp.zeros((2 * B,), jnp.int32)
    fwd_flops = 0.0
    try:
        cost = one_fwd.lower(params, x2, s2, c2).compile() \
            .cost_analysis()
        cost = cost[0] if isinstance(cost, (list, tuple)) else cost
        fwd_flops = float(cost.get('flops', 0.0))
    except Exception:
        pass
    flops = steps * fwd_flops
    dt, out = _timeit(run, (params, jax.random.PRNGKey(2)),
                      iters=1 if args.quick else 3)
    assert out.shape == (B, L)
    sps = B / dt / jax.device_count()
    baseline = (A100_EFFECTIVE_FLOPS / (flops / B) if flops else None)
    return _emit(
        f'CIFAR10 UNet D-CFG samples/sec/chip (uniform, T={steps}, '
        f'B={B}, fused={"on" if sampler.fused else "off"}'
        + (', fp32' if getattr(args, 'fp32', False) else '')
        + (', int8' if q8 else '')
        + (', norm-bf16' if getattr(args, 'norm_bf16', False) else '')
        + (', fused-norm' if fnorm else '') + ')',
        sps, 'samples/sec/chip',
        sps / baseline if baseline else None, _mfu(flops, dt))


def _backend_ok(timeout=240):
    """Probe backend init in a SUBPROCESS with a timeout. Through the
    axon tunnel, jax.devices() can hang indefinitely when the tunnel is
    down (observed: multi-hour outages) — a hung bench run records
    nothing for the whole round, while a fast honest error line keeps
    the other evidence intact."""
    import os
    import subprocess
    import sys
    code = 'import jax; print(jax.devices()[0].platform)'
    try:
        r = subprocess.run([sys.executable, '-c', code],
                           capture_output=True, timeout=timeout,
                           text=True, env=dict(os.environ))
        if r.returncode == 0:
            platform = r.stdout.strip().splitlines()[-1]
            # A fast axon failure makes jax FALL BACK to CPU with only
            # a warning; recording CPU wall times as chip measurements
            # would poison the evidence table. Only accept a non-TPU
            # platform when the caller explicitly asked for it via
            # JAX_PLATFORMS.
            requested = os.environ.get('JAX_PLATFORMS', '').strip()
            if platform != 'tpu' and not requested:
                return False, (f'backend fell back to {platform!r} '
                               '(axon tunnel down?)'), False
            return True, platform, False
        return False, (r.stdout + r.stderr).strip()[-300:], False
    except subprocess.TimeoutExpired:
        return False, f'backend init timed out after {timeout}s', True


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--batch', type=int, default=None)
    p.add_argument('--accum', type=int, default=None,
                   help='grad-accumulation micro-steps for --train; '
                        'default keeps the micro-batch at 128 '
                        '(global batch --batch split into this many '
                        'in-step lax.scan micro-batches)')
    p.add_argument('--steps', type=int, default=1000)
    p.add_argument('--quick', action='store_true',
                   help='tiny models for CPU smoke runs')
    p.add_argument('--cache', action='store_true',
                   help='enable the MDLM NFE cache (loses at B>=24)')
    p.add_argument('--fused', action='store_true', default=None)
    p.add_argument('--no-fused', dest='fused', action='store_false')
    p.add_argument('--fp32', action='store_true',
                   help='--unet with an fp32 trunk (A/B vs the '
                        'default bf16 mixed-precision policy)')
    p.add_argument('--fused-head', dest='fused_head',
                   action='store_true',
                   help='fold the vocab projection into the sampling '
                        'kernel (ancestral; A/B vs plain --ancestral)')
    p.add_argument('--int8', action='store_true',
                   help='opt-in int8 dynamic-quant trunk+head for the '
                        'sampling workloads (A/B vs the bf16 default; '
                        '2x MXU rate on v5e, ops/quant.py)')
    p.add_argument('--flash-attn', dest='flash_attn',
                   action='store_true',
                   help='use the in-tree Pallas TPU flash-attention '
                        'kernel in --train (A/B vs XLA attention)')
    p.add_argument('--attn-bf16', dest='attn_bf16', action='store_true',
                   help='bf16 attention probs in --train '
                        '(DITConfig.attn_probs_bf16 A/B)')
    p.add_argument('--attn-remat', dest='attn_remat',
                   action='store_true',
                   help='remat attention in --train backward '
                        '(DITConfig.attn_remat A/B)')
    p.add_argument('--fused-adaln', dest='fused_adaln',
                   action='store_true',
                   help='fused adaLN-chain Pallas kernels in --train '
                        '(DITConfig.fused_adaln A/B)')
    p.add_argument('--xla-scan', dest='xla_scan', action='store_true',
                   help='--dimamba with the XLA associative scan '
                        '(+block remat) instead of the Pallas kernel')
    p.add_argument('--norm-bf16', dest='norm_bf16',
                   action='store_true',
                   help='--unet with bf16 GroupNorm outputs (A/B vs '
                        'the fp32-norm default)')
    p.add_argument('--fused-norm', dest='fused_norm',
                   action='store_true',
                   help='--unet with the one-pass fused GroupNorm+'
                        'SiLU Pallas kernel')
    p.add_argument('--cbg-chunk', dest='cbg_chunk', type=int,
                   default=None,
                   help='--cbg: edits per classifier chunk '
                        '(0/default = one chunk of all L*V edits)')
    p.add_argument('--nos-steps', dest='nos_steps', type=int,
                   default=None,
                   help='--nos: Adagrad inner steps (default 1, the '
                        'reference configs/guidance/nos.yaml)')
    # workload selectors (default: full suite)
    p.add_argument('--first-hitting', action='store_true')
    p.add_argument('--ancestral', action='store_true')
    p.add_argument('--ar', action='store_true')
    p.add_argument('--train', action='store_true')
    p.add_argument('--dimamba', action='store_true')
    p.add_argument('--unet', action='store_true')
    p.add_argument('--cbg', action='store_true',
                   help='QM9 D-CBG exact guided sampling (the '
                        'namesake classifier-guided workload)')
    p.add_argument('--cbg-approx', dest='cbg_approx',
                   action='store_true',
                   help='D-CBG first-order approximation at the QM9 '
                        'eval shape')
    p.add_argument('--nos', action='store_true',
                   help='NOS hidden-state-ascent guidance at the LM1B '
                        'flagship shape')
    args = p.parse_args()

    selected = {
        'first_hitting': args.first_hitting,
        'ancestral': args.ancestral,
        'ar': args.ar,
        'train': args.train,
        'dimamba': args.dimamba,
        'unet': args.unet,
        'cbg': args.cbg,
        'cbg_approx': args.cbg_approx,
        'nos': args.nos,
    }
    run_all = not any(selected.values())
    if run_all and not args.int8:
        # Extra default-suite workload: the headline sampler with the
        # opt-in int8 trunk+head (distribution-validated on chip,
        # scripts/validate_quant_tpu.py; +8% at B=32 on v5e). The
        # FIRST line stays the bf16 parity path — stable driver
        # metric. Registered BEFORE the backend probe so an outage
        # emits the same metric set as a healthy default run.
        selected['first_hitting_int8'] = False
        # Best measured T=1000 step-for-step composition (round-4
        # sweep, scripts/drive_ancestral_compose_tpu.py): int8 +
        # feature-mix CFG at B=24 = 1.60x. fused-head COMPOSES DOWN
        # with int8 (it forces the bf16 head over the int8 head
        # matmul: 1.21x) and is neutral under bf16 (1.355x vs 1.362x),
        # so the line runs int8 without it.
        selected['ancestral_int8'] = False
        # int8 conv trunk beats the bf16 UNet step by 7.6% on chip
        # (39.06 vs 36.3 samples/s, 0.945x vs 0.87x) — the round-3
        # "at XLA's floor" claim did not survive the A/B. Round 5
        # added norm_dtype=bf16 (halves every GroupNorm's fp32
        # output stream on the BW-bound forward): int8 + norm-bf16 =
        # 44.0 samples/s = **1.066x the A100 estimate** (norm-bf16
        # alone on bf16: 38.5, 0.925x), so the int8 line runs with
        # it. bf16/fp32-norm stays the parity line (reference
        # protocol is 16-mixed autocast with fp32 norms).
        selected['unet_int8'] = False
        # int8 KV cache (round-5 on chip): 647.0 vs 446.4 samples/s
        # at B=256 (+45%) — 3.11 ms/step, the first config under the
        # 3.6 ms/step target. Cache reads dominate the decode step, so
        # halving their bytes is the decisive lever. bf16 stays the
        # parity line.
        selected['ar_int8'] = False

    ok, note, timed_out = _backend_ok()
    if not ok and timed_out:
        time.sleep(120)                 # one retry, tunnel blips only:
        ok, note, _ = _backend_ok()     # a fast failure is permanent
    if not ok:
        for name, sel in selected.items():
            if run_all or sel:
                print(json.dumps({
                    'metric': name, 'value': 0.0, 'unit': 'unmeasured',
                    'vs_baseline': None, 'mfu': None,
                    'error': f'jax backend unavailable: {note}'}),
                    flush=True)
        return

    workloads = [
        ('first_hitting', lambda: bench_sampling(args, True)),
        ('ancestral', lambda: bench_sampling(args, False)),
        ('ar', lambda: bench_ar(args)),
        ('train', lambda: bench_train_text8(args)),
        ('dimamba', lambda: bench_dimamba(args)),
        ('unet', lambda: bench_unet(args)),
        # Classifier-guided sampling — the namesake capability
        # (diffusion.py:1511-1736): D-CBG exact at the QM9 eval-
        # protocol shape and NOS at the LM1B flagship shape run in
        # the default suite (VERDICT r4 next #1).
        ('cbg', lambda: bench_cbg(args, approx=False)),
        ('cbg_approx', lambda: bench_cbg(args, approx=True)),
        ('nos', lambda: bench_nos(args)),
    ]
    if 'first_hitting_int8' in selected:
        int8_args = argparse.Namespace(**{**vars(args), 'int8': True})
        workloads.append(
            ('first_hitting_int8',
             lambda: bench_sampling(int8_args, True)))
    if 'ancestral_int8' in selected:
        int8_args = argparse.Namespace(**{**vars(args), 'int8': True})
        workloads.append(
            ('ancestral_int8',
             lambda: bench_sampling(int8_args, False)))
    if 'unet_int8' in selected:
        int8_args = argparse.Namespace(**{**vars(args), 'int8': True,
                                          'norm_bf16': True})
        workloads.append(
            ('unet_int8', lambda: bench_unet(int8_args)))
    if 'ar_int8' in selected:
        int8_args = argparse.Namespace(**{**vars(args), 'int8': True})
        workloads.append(('ar_int8', lambda: bench_ar(int8_args)))
    for name, fn in workloads:
        if not (run_all or selected[name]):
            continue
        try:
            fn()
        except Exception as e:  # emit the failure, keep going
            print(json.dumps({'metric': name, 'error': str(e)[:500]}),
                  flush=True)


if __name__ == '__main__':
    main()
