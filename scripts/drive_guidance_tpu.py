"""Classifier-guided sampling validation drive (round 5).

On-chip evidence for the namesake capability (reference
diffusion.py:1511-1736 D-CBG exact/approx + NOS, diffusion.py:1188-1267
AR-FUDGE, and the AR-PPLM extension): tiny DiT denoiser + oracle
classifiers, run on the REAL TPU, asserting

  * steering: guided token-7 frequency > unguided (cbg exact, cbg
    approx, fudge) — the same oracle assertions the CPU tests pin
    (tests/test_classifier.py:170-190), now on hardware;
  * correctness: no residual mask tokens, finite outputs, NOS/PPLM
    produce a different distribution than unguided (the hidden-state
    ascent actually moved the posterior);
  * cross-backend parity: the emitted JSON (per-method token
    histograms over 8 seeds) from a TPU run and a CPU run must agree
    within the two-sample binomial noise floor (--compare mode).

Usage:
  # on the real chip (default axon env)
  python scripts/drive_guidance_tpu.py --out /tmp/guidance_tpu.json
  # CPU reference (PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu ...)
  python scripts/drive_guidance_tpu.py --out /tmp/guidance_cpu.json
  # distribution parity
  python scripts/drive_guidance_tpu.py --compare /tmp/guidance_tpu.json \
      /tmp/guidance_cpu.json
"""

import argparse
import json
import sys
import time

import numpy as np


def run_drive(out_path):
    import jax
    import jax.numpy as jnp

    from ddg_tpu.diffusion import DiffusionSpec
    from ddg_tpu.models import DIT, DITConfig, make_model_apply
    from ddg_tpu.ops.noise_schedules import LogLinearNoise
    from ddg_tpu.samplers import (GuidanceSpec, SamplerSpec, ar_sample,
                                  diffusion_sample)

    print('devices:', jax.devices())
    cfg = DITConfig(hidden_size=64, cond_dim=32, length=64, n_blocks=2,
                    n_heads=2, dropout=0.0, vocab_size=33,
                    num_classes=2)
    V, L, MASK = cfg.vocab_size, cfg.length, cfg.vocab_size - 1
    spec = DiffusionSpec(diffusion='absorbing_state',
                         parameterization='subs', noise=LogLinearNoise(),
                         vocab_size=V, mask_index=MASK, num_classes=2)
    model = DIT(cfg)
    apply_fn = make_model_apply(model)
    rng = jax.random.PRNGKey(0)
    x0 = jax.random.randint(rng, (1, L), 0, V)
    params = model.init(rng, x0, jnp.ones((1,)),
                        jnp.zeros((1,), jnp.int32))['params']

    def randomize_head(p, key):
        # DIT's output head is zero-init (adaLN-zero convention), so a
        # fresh-init model maps EVERY hidden state to constant logits —
        # hidden-state guidance (NOS/PPLM) would be a provable no-op.
        # Give the head real weights so the oracle steering is visible.
        k = p['output_linear']['kernel']
        p = jax.tree.map(lambda a: a, p)     # shallow copy
        p['output_linear'] = dict(p['output_linear'])
        p['output_linear']['kernel'] = 0.2 * jax.random.normal(
            key, k.shape, k.dtype)
        return p

    params = randomize_head(params, jax.random.PRNGKey(11))

    # Oracle classifiers: log p(class=1) rises with the token-7 count.
    def oracle_tokens(p, x, sigma, x_emb=None):
        if x.ndim == 3:                       # one-hots (cbg approx)
            score = x[..., 7].sum(-1).astype(jnp.float32)
        else:
            score = (x == 7).sum(-1).astype(jnp.float32)
        return jnp.stack([-score, score], axis=-1)

    def oracle_perpos(p, x, sigma, x_emb=None):
        # FUDGE: per-position logits, score = prefix count of 7.
        s = jnp.cumsum((x == 7).astype(jnp.float32), axis=-1)
        return jnp.stack([-s, s], axis=-1)

    vdir = jax.random.normal(jax.random.PRNGKey(7),
                             (cfg.hidden_size,))
    vdir = vdir / jnp.linalg.norm(vdir)

    def oracle_hidden(p, x, sigma, x_emb=None, attention_mask=None):
        # NOS/PPLM: differentiable in the hidden states.
        h = x_emb
        s = (h.astype(jnp.float32) @ vdir).mean(-1)
        return jnp.stack([-s, s], axis=-1)

    B, SEEDS = 16, 8
    base_sampler = SamplerSpec(steps=32, use_cache=False, fused=False)

    def collect(fn):
        outs, t0 = [], time.time()
        for s in range(SEEDS):
            outs.append(np.asarray(fn(jax.random.PRNGKey(100 + s))))
        arr = np.concatenate(outs)
        return arr, time.time() - t0

    runs = {}

    def diffusion_variant(name, guidance, clf):
        @jax.jit
        def go(key):
            return diffusion_sample(
                spec, base_sampler, apply_fn, params, key,
                batch_size=B, length=L, guidance=guidance,
                classifier_apply=clf, classifier_params=None)
        runs[name] = collect(go)

    diffusion_variant('unguided', None, None)
    diffusion_variant('cbg_exact',
                      GuidanceSpec(method='cbg', gamma=4.0, condition=1,
                                   cbg_chunk=264), oracle_tokens)
    diffusion_variant('cbg_approx',
                      GuidanceSpec(method='cbg', gamma=4.0, condition=1,
                                   use_approx=True), oracle_tokens)
    diffusion_variant('nos',
                      GuidanceSpec(method='nos', condition=1,
                                   num_nos_steps=2, nos_step_size=0.5,
                                   nos_stability_coef=0.01),
                      oracle_hidden)

    # AR paths (causal model, fallback full-forward scan).
    ar_cfg = DITConfig(hidden_size=64, cond_dim=32, length=64,
                       n_blocks=2, n_heads=2, dropout=0.0,
                       vocab_size=33, causal=True, use_adaLN=False)
    ar_model = DIT(ar_cfg)
    ar_apply = make_model_apply(ar_model)
    ar_params = randomize_head(ar_model.init(rng, x0, None)['params'],
                               jax.random.PRNGKey(12))
    ar_spec = DiffusionSpec(diffusion='absorbing_state',
                            parameterization='ar',
                            noise=LogLinearNoise(), vocab_size=V,
                            mask_index=MASK, num_classes=2)

    def ar_variant(name, guidance, clf):
        @jax.jit
        def go(key):
            return ar_sample(ar_spec, base_sampler, ar_apply, ar_params,
                             key, batch_size=B, length=L,
                             bos_token_id=0, guidance=guidance,
                             classifier_apply=clf,
                             classifier_params=None)
        runs[name] = collect(go)

    ar_variant('ar_unguided', None, None)
    ar_variant('ar_fudge',
               GuidanceSpec(method='fudge', gamma=4.0, condition=1,
                            topk=24), oracle_perpos)
    ar_variant('ar_pplm',
               GuidanceSpec(method='pplm', condition=1,
                            num_pplm_steps=2, pplm_step_size=0.5,
                            pplm_stability_coef=0.01), oracle_hidden)

    report = {'backend': jax.default_backend(), 'vocab': V,
              'tokens_per_run': int(SEEDS * B * L), 'methods': {}}
    failures = []
    for name, (arr, dt) in runs.items():
        n_mask = int((arr == MASK).sum()) if not name.startswith('ar') \
            else 0
        freq7 = float((arr == 7).mean())
        hist = np.bincount(arr.ravel(), minlength=V).astype(int)
        report['methods'][name] = {
            'freq7': freq7, 'n_mask': n_mask, 'seconds': round(dt, 2),
            'hist': hist.tolist()}
        print(f'{name:12s} freq7={freq7:.4f} masks={n_mask} '
              f'({dt:.1f}s)')
        if n_mask > 5:
            failures.append(f'{name}: {n_mask} residual masks')

    # Steering assertions (oracle prefers token 7).
    for guided, base in [('cbg_exact', 'unguided'),
                         ('cbg_approx', 'unguided'),
                         ('ar_fudge', 'ar_unguided')]:
        fg = report['methods'][guided]['freq7']
        fb = report['methods'][base]['freq7']
        print(f'steering {guided}: {fg:.4f} vs {base} {fb:.4f}')
        if not fg > fb:
            failures.append(f'{guided} did not steer ({fg} <= {fb})')
    # NOS/PPLM move the distribution (hidden-state oracle direction is
    # arbitrary, so require a shift, not a token-7 preference).
    for guided, base in [('nos', 'unguided'),
                         ('ar_pplm', 'ar_unguided')]:
        hg = np.array(report['methods'][guided]['hist'], float)
        hb = np.array(report['methods'][base]['hist'], float)
        hg, hb = hg / hg.sum(), hb / hb.sum()
        tv = 0.5 * np.abs(hg - hb).sum()
        q = 0.5 * (hg + hb)
        n = report['tokens_per_run']
        floor = 0.5 * np.sum(np.sqrt(4 * q * (1 - q) / (np.pi * n)))
        print(f'{guided} vs {base}: TV={tv:.4f} floor={floor:.4f}')
        if not tv > 2.0 * floor:
            failures.append(
                f'{guided} indistinguishable from {base} '
                f'(TV {tv:.4f} <= 2x floor {floor:.4f})')

    with open(out_path, 'w') as f:
        json.dump(report, f, indent=1)
    print('wrote', out_path)
    if failures:
        print('FAILURES:', failures)
        sys.exit(1)
    print('GUIDANCE DRIVE PASSED')


def compare(path_a, path_b):
    a = json.load(open(path_a))
    b = json.load(open(path_b))
    n = min(a['tokens_per_run'], b['tokens_per_run'])
    bad = []
    for name in a['methods']:
        ha = np.array(a['methods'][name]['hist'], float)
        hb = np.array(b['methods'][name]['hist'], float)
        ha, hb = ha / ha.sum(), hb / hb.sum()
        tv = 0.5 * np.abs(ha - hb).sum()
        q = 0.5 * (ha + hb)
        floor = 0.5 * np.sum(np.sqrt(4 * q * (1 - q) / (np.pi * n)))
        ratio = tv / floor
        print(f'{name:12s} {a["backend"]} vs {b["backend"]}: '
              f'TV={tv:.4f} floor={floor:.4f} ratio={ratio:.2f}')
        if tv > 2.0 * floor:
            bad.append(name)
    if bad:
        print('PARITY FAILED:', bad)
        sys.exit(1)
    print('CROSS-BACKEND GUIDANCE PARITY PASSED')


if __name__ == '__main__':
    p = argparse.ArgumentParser()
    p.add_argument('--out', default='/tmp/guidance_drive.json')
    p.add_argument('--compare', nargs=2, metavar=('A', 'B'))
    args = p.parse_args()
    if args.compare:
        compare(*args.compare)
    else:
        run_drive(args.out)
