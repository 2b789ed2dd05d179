#!/usr/bin/env bash
# PPL at several sequence lengths (fork feature; reference
# bash_scripts/eval_lm1b_ppl_different_lengths.sh).
set -euo pipefail
CKPT="${1:?usage: eval_lm1b_ppl_different_lengths.sh <checkpoint_path>}"; shift || true
python -m ddg_tpu.main \
  mode=lengths_eval data=lm1b model=small \
  eval.checkpoint_path="$CKPT" "$@"
