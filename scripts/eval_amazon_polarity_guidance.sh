#!/usr/bin/env bash
# Amazon-Polarity guidance eval: gamma sweep -> n-gram diversity +
# sentiment accuracy (+ gen-PPL when a judge is local)
# (reference scripts/eval_amazon_polarity_guidance.sh +
# guidance_eval/amazon_polarity_eval.py:66-215).
# Env:
#   SENTIMENT_CLASSIFIER_CKPT — checkpoint of a clean-sequence
#     sentiment judge trained with +is_eval_classifier=True (the
#     offline substitute for the reference's HF sentiment model,
#     amazon_polarity_eval.py:92-124; an HF model dir also works via
#     eval.generative_ppl_model_name_or_path for gen-PPL).
#   OUTPUT_CSV — metrics CSV path (default amazon_guidance_eval.csv)
set -euo pipefail
CKPT="${1:?usage: eval_amazon_polarity_guidance.sh <checkpoint_path> [overrides...]}"; shift || true
python - "$CKPT" "$@" <<'PY'
import os
import sys
from ddg_tpu.config import load_config
from ddg_tpu import main as M
from ddg_tpu.guidance_eval.runners import (amazon_polarity_eval,
                                           make_eval_classifier)
from ddg_tpu.runtime.averaging import averaged_params

config = load_config('configs', overrides=[
    'data=amazon_polarity', 'model=small', 'model.length=128',
    'guidance=cfg', f'eval.checkpoint_path={sys.argv[1]}',
    *sys.argv[2:]])
tokenizer, spec, apply_fn, state, model_cfg = M._restore_for_eval(config)
params = averaged_params(state.averaging, state.params)
length = int(config.model.length)

sentiment_classifier = None
judge_ckpt = os.environ.get('SENTIMENT_CLASSIFIER_CKPT', '')
if judge_ckpt:
    clf_apply, clf_params = M.restore_eval_classifier(config, judge_ckpt)
    sentiment_classifier = make_eval_classifier(
        clf_apply, clf_params, tokenizer, length=length)

results = amazon_polarity_eval(
    spec, M.build_sampler_spec(config), apply_fn, params, tokenizer,
    condition=int(config.guidance.condition),
    length=length,
    batch_size=int(config.sampling.batch_size),
    num_sample_batches=int(os.environ.get('NUM_SAMPLE_BATCHES', '4')),
    dit_cfg=model_cfg,
    sentiment_classifier=sentiment_classifier,
    judge_model_name=config.eval.get('generative_ppl_model_name_or_path'),
    output_path=os.environ.get('OUTPUT_CSV', 'amazon_guidance_eval.csv'))
print(results)
PY
