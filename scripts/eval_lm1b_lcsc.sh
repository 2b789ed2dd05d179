#!/usr/bin/env bash
# LCSC evolutionary checkpoint-merge search over a run's step
# snapshots (reference bash_scripts/eval_lm1b_lcsc.sh ->
# main._lcsc_search). RUN_DIR must contain checkpoints/step-*.
set -euo pipefail
RUN_DIR="${1:?usage: eval_lm1b_lcsc.sh <run_dir> [overrides...]}"; shift || true
python -m ddg_tpu.main \
  mode=lcsc data=lm1b model=small model.length=128 \
  checkpointing.save_dir="$RUN_DIR" \
  +lcsc.metric=ppl "$@"
