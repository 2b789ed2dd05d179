#!/usr/bin/env bash
# LCSC sanity check: a 1-iteration tiny-population search must not
# degrade the best single checkpoint's PPL (reference
# bash_scripts/eval_lm1b_lcsc_sanity_check.sh).
set -euo pipefail
RUN_DIR="${1:?usage: eval_lm1b_lcsc_sanity_check.sh <run_dir> [overrides...]}"; shift || true
python -m ddg_tpu.main \
  mode=lcsc data=lm1b model=small model.length=128 \
  checkpointing.save_dir="$RUN_DIR" \
  +lcsc.metric=ppl \
  +lcsc.iterations=1 +lcsc.population_size=2 \
  +lcsc.offspring_per_iter=2 "$@"
