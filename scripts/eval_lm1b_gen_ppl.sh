#!/usr/bin/env bash
# Generative PPL under a judge LM (reference bash_scripts/eval_lm1b_gen_ppl.sh).
set -euo pipefail
CKPT="${1:?usage: eval_lm1b_gen_ppl.sh <checkpoint_path> [overrides...]}"; shift || true
python -m ddg_tpu.main \
  mode=gen_ppl_eval data=lm1b model=small model.length=128 \
  sampling.steps=1000 \
  eval.checkpoint_path="$CKPT" \
  +eval.generative_ppl_model_name_or_path="${GEN_PPL_JUDGE:-gpt2-large}" "$@"
