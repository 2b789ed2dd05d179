#!/usr/bin/env bash
# Evaluate every run directory under a models root with per-family
# config surgery + low-confidence/argmax PPL variants (reference
# bash_scripts/eval_lm1b_ppl_all.sh -> main.py:327-396).
set -euo pipefail
DIR="${1:?usage: eval_lm1b_ppl_all.sh <models_root> [overrides...]}"; shift || true
python -m ddg_tpu.main \
  mode=ppl_eval_all data=lm1b model=small model.length=128 \
  +eval.models_root="$DIR" "$@"
