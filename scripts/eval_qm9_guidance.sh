#!/usr/bin/env bash
# QM9 guidance sweep -> validity/uniqueness/novelty (+QED when RDKit
# is present) metrics CSV
# (reference scripts/eval_qm9_guidance.sh + guidance_eval/qm9_eval.py:
# gamma 1..5, T=32, 64 batches x 16 samples).
# Env:
#   NUM_SAMPLE_BATCHES — batches per gamma (default 64, the reference
#     protocol; shrink for wiring demos)
#   OUTPUT_CSV — metrics CSV path (default qm9_guidance_eval.csv)
# guidance.method=cbg + guidance.classifier_checkpoint_path=... runs
# the classifier-guided variant instead of D-CFG.
set -euo pipefail
CKPT="${1:?usage: eval_qm9_guidance.sh <checkpoint_path>}"; shift || true
python - "$CKPT" "$@" <<'PY'
import os
import sys
from ddg_tpu.config import load_config
from ddg_tpu import main as M
from ddg_tpu.guidance_eval.runners import qm9_guidance_eval
from ddg_tpu.runtime.averaging import averaged_params

ckpt = sys.argv[1]
config = load_config('configs', overrides=[
    'data=qm9', 'diffusion=uniform', 'parameterization=d3pm',
    'time_conditioning=True', 'zero_recon_loss=True',
    'model.length=32', 'sampling.steps=32', 'guidance=cfg',
    f'eval.checkpoint_path={ckpt}', *sys.argv[2:]])
tokenizer, spec, apply_fn, state, model_cfg = M._restore_for_eval(config)
params = averaged_params(state.averaging, state.params)
sampler = M.build_sampler_spec(config)

method = str(config.guidance.method or 'cfg')
clf_apply = clf_params = None
if method in M._CLASSIFIER_GUIDED:
    clf_apply, clf_params = M._restore_classifier_for_sampling(config)

# Train-set SMILES for the novelty metric (qm9_eval.py:146-153).
train_smiles = None
try:
    data = M.build_data(config)
    train_smiles = tokenizer.batch_decode(
        data['train']['input_ids'][:10_000])
except Exception as e:  # novelty falls back to None without data
    print(f'train-set SMILES unavailable ({e}); novelty vs train '
          'skipped', file=sys.stderr)

results = qm9_guidance_eval(
    spec, sampler, apply_fn, params, tokenizer,
    guidance_method=method,
    condition=int(config.guidance.condition),
    batch_size=int(config.sampling.batch_size),
    num_sample_batches=int(os.environ.get('NUM_SAMPLE_BATCHES', '64')),
    length=int(config.model.length),
    train_smiles=train_smiles,
    classifier_apply=clf_apply, classifier_params=clf_params,
    dit_cfg=model_cfg,
    output_path=os.environ.get('OUTPUT_CSV', 'qm9_guidance_eval.csv'))
print(results)
PY
