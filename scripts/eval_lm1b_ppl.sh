#!/usr/bin/env bash
# Validation perplexity with EMA weights (reference scripts/eval_lm1b_ppl.sh).
set -euo pipefail
CKPT="${1:?usage: eval_lm1b_ppl.sh <checkpoint_path> [overrides...]}"; shift || true
python -m ddg_tpu.main \
  mode=ppl_eval data=lm1b model=small model.length=128 \
  eval.checkpoint_path="$CKPT" "$@"
