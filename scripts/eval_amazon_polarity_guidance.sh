#!/usr/bin/env bash
# Amazon-Polarity guidance eval: gamma sweep -> n-gram diversity +
# sentiment accuracy (+ gen-PPL when a judge is local)
# (reference scripts/eval_amazon_polarity_guidance.sh +
# guidance_eval/amazon_polarity_eval.py:66-215).
set -euo pipefail
CKPT="${1:?usage: eval_amazon_polarity_guidance.sh <checkpoint_path> [overrides...]}"; shift || true
python - "$CKPT" "$@" <<'PY'
import sys
from ddg_tpu.config import load_config
from ddg_tpu import main as M
from ddg_tpu.guidance_eval.runners import amazon_polarity_eval
from ddg_tpu.runtime.averaging import averaged_params

config = load_config('configs', overrides=[
    'data=amazon_polarity', 'model=small', 'model.length=128',
    'guidance=cfg', f'eval.checkpoint_path={sys.argv[1]}',
    *sys.argv[2:]])
tokenizer, spec, apply_fn, state, model_cfg = M._restore_for_eval(config)
params = averaged_params(state.averaging, state.params)
results = amazon_polarity_eval(
    spec, M.build_sampler_spec(config), apply_fn, params, tokenizer,
    condition=int(config.guidance.condition),
    length=int(config.model.length),
    dit_cfg=model_cfg,
    judge_model_name=config.eval.get('generative_ppl_model_name_or_path'),
    output_path='amazon_guidance_eval.csv')
print(results)
PY
