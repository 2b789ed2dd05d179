#!/usr/bin/env bash
# QM9 D-CFG guidance sweep -> validity/novelty metrics CSV
# (reference scripts/eval_qm9_guidance.sh: gamma 1..5, T=32).
set -euo pipefail
CKPT="${1:?usage: eval_qm9_guidance.sh <checkpoint_path>}"; shift || true
python - "$CKPT" "$@" <<'PY'
import sys
from ddg_tpu.config import load_config
from ddg_tpu import main as M
from ddg_tpu.guidance_eval.runners import qm9_guidance_eval
from ddg_tpu.runtime.averaging import averaged_params

ckpt = sys.argv[1]
config = load_config('configs', overrides=[
    'data=qm9', 'diffusion=uniform', 'parameterization=d3pm',
    'time_conditioning=True', 'zero_recon_loss=True',
    'model.length=32', 'sampling.steps=32',
    f'eval.checkpoint_path={ckpt}', *sys.argv[2:]])
tokenizer, spec, apply_fn, state, model_cfg = M._restore_for_eval(config)
params = averaged_params(state.averaging, state.params)
sampler = M.build_sampler_spec(config)
results = qm9_guidance_eval(
    spec, sampler, apply_fn, params, tokenizer,
    output_path='qm9_guidance_eval.csv')
print(results)
PY
