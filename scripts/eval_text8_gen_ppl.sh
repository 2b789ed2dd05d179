#!/usr/bin/env bash
# Generative PPL of text8 samples under a judge LM; GEN_PPL_JUDGE env
# swaps in a local judge dir (reference
# scripts/eval_text8_gen_ppl.sh; T=256 sampling default for text8).
set -euo pipefail
CKPT="${1:?usage: eval_text8_gen_ppl.sh <checkpoint_path> [overrides...]}"; shift || true
python -m ddg_tpu.main \
  mode=gen_ppl_eval data=text8 model=small model.length=256 \
  sampling.steps="${SAMPLING_STEPS:-256}" \
  eval.checkpoint_path="$CKPT" \
  +eval.generative_ppl_model_name_or_path="${GEN_PPL_JUDGE:-gpt2-large}" "$@"
