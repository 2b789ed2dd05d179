"""Real-weight parity + gen-PPL on-ramp.

The BASELINE.json parity bar is "per-step logits match the reference to
1e-3" against the published checkpoints (kuleshov-group/udlm-lm1b|qm9,
/root/reference/README.md:231-236) and "gen-ppl parity" under the
gpt2-large judge (/root/reference/eval_utils.py:28-90). This image has
no HF cache, so those assets don't exist here — this script is the
ZERO-CODE-CHANGE on-ramp for the day they do:

  DDG_HF_ASSETS_DIR=/path/to/assets python scripts/verify_real_weight_parity.py

where the assets dir may contain:
  udlm-lm1b/   — HF checkpoint folder (config.json + pytorch_model.bin
                 or model.safetensors) in the kuleshov-group hub layout
  gpt2-large/  — the judge model (HF folder loadable by transformers)

Anything missing is substituted by a clearly-labeled SYNTHETIC
stand-in exercising the identical code path:
  * checkpoint: a synthetic reference-format state dict is written in
    the hub layout and consumed through the same loader;
  * judge: skipped with a SKIP line (the offline AR-judge alternative
    is covered by tests/test_main.py::test_gen_ppl_with_ar_judge).

Steps (same code path real or synthetic):
  1. load the HF folder -> convert to ddg_tpu DIT params
     (convert.import_hf_udlm)
  2. forward BOTH models on the same batch: our flax DIT vs the torch
     mirror of the reference math (convert.torch_mirror_dit_forward,
     re-executes /root/reference/models/dit.py:131-366,426-468)
  3. assert max |logit diff| < 1e-3   (the BASELINE.json bar)
  4. sample from the converted model and score gen-PPL under the judge
     if present.
"""

import argparse
import json
import os
import sys

import numpy as np


def ensure_checkpoint(assets_dir: str, work_dir: str) -> tuple:
    """Returns (ckpt_dir, is_real)."""
    real = os.path.join(assets_dir, 'udlm-lm1b')
    if os.path.isfile(os.path.join(real, 'config.json')):
        return real, True
    import torch

    from ddg_tpu.convert import make_reference_dit_state_dict
    print('[synthetic] udlm-lm1b not found under '
          f'{assets_dir!r}; writing a SYNTHETIC reference-format '
          'checkpoint (same hub layout, same loader path)')
    rng = np.random.RandomState(0)
    hidden, cond_dim, n_blocks, n_heads, vocab, length = \
        128, 64, 2, 4, 523, 64
    state = make_reference_dit_state_dict(
        rng, hidden=hidden, cond_dim=cond_dim, n_blocks=n_blocks,
        vocab=vocab)
    out = os.path.join(work_dir, 'udlm-lm1b-synthetic')
    os.makedirs(out, exist_ok=True)
    sd = {'backbone.' + k: torch.tensor(np.asarray(v))
          for k, v in state.items()}
    torch.save(sd, os.path.join(out, 'pytorch_model.bin'))
    with open(os.path.join(out, 'config.json'), 'w') as f:
        json.dump({'model_type': 'udlm', 'synthetic_standin': True,
                   'vocab_size': vocab, 'model_length': length,
                   'hidden_dim': hidden, 'cond_dim': cond_dim,
                   'n_blocks': n_blocks, 'n_heads': n_heads,
                   'dropout': 0.1, 'time_conditioning': True,
                   'cfg': False, 'cfg_num_classes': -1}, f, indent=2)
    return out, False


def check_parity(ckpt_dir: str, is_real: bool) -> float:
    import jax
    import jax.numpy as jnp

    from ddg_tpu.convert import (_strip_prefix, import_hf_udlm,
                                 load_hf_udlm_state_dict,
                                 torch_mirror_dit_forward)
    from ddg_tpu.models import DIT, DITConfig

    params, cfg = import_hf_udlm(ckpt_dir)
    state = _strip_prefix(load_hf_udlm_state_dict(ckpt_dir))
    n_heads = int(cfg['n_heads'])
    rng = np.random.RandomState(1)
    B = 2
    L = min(int(cfg['model_length']), 128)
    x = rng.randint(0, int(cfg['vocab_size']), (B, L))
    sigma = rng.rand(B).astype(np.float32) * 3

    want = torch_mirror_dit_forward(state, x, sigma, n_heads=n_heads)

    dit_cfg = DITConfig(
        hidden_size=int(cfg['hidden_dim']), cond_dim=int(cfg['cond_dim']),
        length=L, n_blocks=int(cfg['n_blocks']), n_heads=n_heads,
        dropout=0.0, vocab_size=int(cfg['vocab_size']),
        compute_dtype=jnp.float32)
    model = DIT(dit_cfg)
    got = model.apply({'params': jax.tree.map(jnp.asarray, params)},
                      jnp.asarray(x), jnp.asarray(sigma))
    diff = float(np.max(np.abs(np.asarray(got) - want)))
    tag = 'REAL' if is_real else 'SYNTHETIC'
    print(f'[parity:{tag}] max |logit diff| flax-vs-torch-reference = '
          f'{diff:.2e}  (bar: 1e-3)')
    assert diff < 1e-3, f'parity FAILED: {diff}'
    return diff


def maybe_gen_ppl(assets_dir: str, ckpt_dir: str,
                  work_dir: str = '/tmp/ddg_parity_work') -> None:
    judge = os.path.join(assets_dir, 'gpt2-large')
    judge_real = os.path.isdir(judge)
    import jax
    import jax.numpy as jnp

    from ddg_tpu.convert import import_hf_udlm
    from ddg_tpu.diffusion import DiffusionSpec
    from ddg_tpu.eval_utils import compute_generative_ppl
    from ddg_tpu.models import DIT, DITConfig, make_model_apply
    from ddg_tpu.ops.noise_schedules import LogLinearNoise
    from ddg_tpu.samplers import SamplerSpec, diffusion_sample

    params, cfg = import_hf_udlm(ckpt_dir)
    L = int(cfg['model_length'])
    dit_cfg = DITConfig(
        hidden_size=int(cfg['hidden_dim']),
        cond_dim=int(cfg['cond_dim']), length=L,
        n_blocks=int(cfg['n_blocks']), n_heads=int(cfg['n_heads']),
        dropout=0.0, vocab_size=int(cfg['vocab_size']))
    spec = DiffusionSpec(
        diffusion='absorbing_state', parameterization='subs',
        noise=LogLinearNoise(), vocab_size=dit_cfg.vocab_size,
        mask_index=dit_cfg.vocab_size - 1)
    model = DIT(dit_cfg)
    out = diffusion_sample(
        spec, SamplerSpec(steps=128, use_cache=False),
        make_model_apply(model),
        jax.tree.map(jnp.asarray, params), jax.random.PRNGKey(0),
        batch_size=8, length=L, dit_cfg=dit_cfg)
    try:
        from transformers import AutoTokenizer
        tok = AutoTokenizer.from_pretrained('bert-base-uncased')
        texts = tok.batch_decode(np.asarray(out),
                                 skip_special_tokens=True)
    except Exception:
        # bert vocab not cached (offline image): surrogate word-level
        # decode so the judge pipeline still runs on real sample ids.
        print('[gen-ppl] bert-base-uncased tokenizer unavailable -> '
              'surrogate "w<id>" decode')
        texts = [' '.join(f'w{i}' for i in row)
                 for row in np.asarray(out).tolist()]
    if not judge_real:
        # Execute the SAME protocol code path against a tiny local
        # random-weight judge (vocab built over the sample words) so
        # the pipeline is proven end-to-end; scores are meaningless
        # until the real judge is present.
        from ddg_tpu.eval_utils import save_synthetic_judge
        judge = os.path.join(work_dir, 'synthetic-judge')
        words = sorted({w for t in texts for w in t.split()})
        save_synthetic_judge(judge, words[:4096])
        print(f'[gen-ppl] judge not found at {assets_dir!r}/gpt2-large '
              '-> SYNTHETIC random-weight judge (same code path; '
              'scores not the published metric)')
    ppl = compute_generative_ppl(texts, judge_model_name=judge,
                                 max_length=1024)
    tag = 'REAL' if judge_real else 'SYNTHETIC'
    print(f'[gen-ppl:{tag}] generative PPL under '
          f'{"gpt2-large" if judge_real else "random judge"} = '
          f'{ppl:.3f}')


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--assets-dir',
                   default=os.environ.get('DDG_HF_ASSETS_DIR',
                                          '/root/hf_assets'))
    p.add_argument('--work-dir', default='/tmp/ddg_parity_work')
    args = p.parse_args()
    os.makedirs(args.work_dir, exist_ok=True)
    ckpt_dir, is_real = ensure_checkpoint(args.assets_dir,
                                          args.work_dir)
    check_parity(ckpt_dir, is_real)
    maybe_gen_ppl(args.assets_dir, ckpt_dir, args.work_dir)
    print('verify_real_weight_parity: PASSED'
          + ('' if is_real else ' (synthetic stand-in mode)'))
    return 0


if __name__ == '__main__':
    sys.exit(main())
