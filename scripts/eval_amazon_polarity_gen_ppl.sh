#!/usr/bin/env bash
# Generative PPL of Amazon-Polarity samples under a judge LM
# (reference scripts/eval_amazon_polarity_gen_ppl.sh).
set -euo pipefail
CKPT="${1:?usage: eval_amazon_polarity_gen_ppl.sh <checkpoint_path> [overrides...]}"; shift || true
python -m ddg_tpu.main \
  mode=gen_ppl_eval data=amazon_polarity model=small model.length=128 \
  sampling.steps="${SAMPLING_STEPS:-128}" \
  eval.checkpoint_path="$CKPT" \
  +eval.generative_ppl_model_name_or_path="${GEN_PPL_JUDGE:-gpt2-large}" "$@"
