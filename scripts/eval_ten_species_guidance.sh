#!/usr/bin/env bash
# Species10 guidance eval: per-class sampling -> pinned eval-classifier
# acc/F1/MCC + 3/6-mer JS + discriminator AUROC (reference
# scripts/eval_ten_species_guidance.sh +
# guidance_eval/ten_species_eval.py:298-523).
# Env: EVAL_CLASSIFIER_CKPT=<path to the trained eval classifier>
set -euo pipefail
CKPT="${1:?usage: eval_ten_species_guidance.sh <diffusion_checkpoint> [overrides...]}"; shift || true
python - "$CKPT" "$@" <<'PY'
import os
import sys
from ddg_tpu.config import load_config
from ddg_tpu import main as M
from ddg_tpu.guidance_eval.runners import (
    make_eval_classifier, ten_species_eval, train_eval_discriminator)
from ddg_tpu.runtime.averaging import averaged_params

overrides = [
    'data=ten_species', 'backbone=dimamba', 'model=dimamba',
    'diffusion=uniform', 'parameterization=d3pm',
    'time_conditioning=True', 'zero_recon_loss=True',
    'guidance=cfg',
    'classifier_backbone=dimamba',
    'classifier_model=species-eval-classifier',
    f'eval.checkpoint_path={sys.argv[1]}', *sys.argv[2:]]
config = load_config('configs', overrides=overrides)
tokenizer, spec, apply_fn, state, model_cfg = M._restore_for_eval(config)
params = averaged_params(state.averaging, state.params)
length = int(config.model.length)

eval_classifier = None
judge_ckpt = os.environ.get('EVAL_CLASSIFIER_CKPT', '')
if judge_ckpt:
    clf_apply, clf_params = M.restore_eval_classifier(config, judge_ckpt)
    eval_classifier = make_eval_classifier(
        clf_apply, clf_params, tokenizer, length=length)

data = M.build_data(config)
ref_seqs = tokenizer.batch_decode(data['valid']['input_ids'][:64])

def disc_scores(real, fake):
    # DISC_STEPS: reference protocol trains 200 steps
    # (ten_species_eval.py:408-523); shrink for wiring demos.
    fn = train_eval_discriminator(
        real, fake, tokenizer, length=min(length, 2048),
        vocab_size=spec.vocab_size,
        steps=int(os.environ.get('DISC_STEPS', '200')))
    return fn(real), fn(fake)

out = ten_species_eval(
    spec, M.build_sampler_spec(config), apply_fn, params, tokenizer,
    num_classes=int(config.data.num_classes),
    gamma=float(config.guidance.gamma), length=length,
    eval_classifier=eval_classifier, reference_sequences=ref_seqs,
    discriminator_scores=disc_scores, dit_cfg=model_cfg,
    output_path=os.environ.get('OUTPUT_JSON',
                               'ten_species_guidance_eval.json'))
print(out)
PY
