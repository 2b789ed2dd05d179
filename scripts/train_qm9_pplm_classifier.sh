#!/usr/bin/env bash
# PPLM/NOS classifier on QM9: shares + freezes the pretrained
# unconditional diffusion trunk (reference
# scripts/train_qm9_pplm_classifier.sh; main.py:218-234 semantics).
set -euo pipefail
PRETRAINED="${1:?usage: train_qm9_pplm_classifier.sh <diffusion_checkpoint> [overrides...]}"; shift || true
python -m ddg_tpu.main \
  mode=train_classifier \
  +is_pplm_classifier=True \
  data=qm9 \
  diffusion=uniform parameterization=d3pm time_conditioning=True \
  classifier_model=small-classifier \
  model.length=32 classifier_model.length=32 \
  eval.checkpoint_path="$PRETRAINED" \
  trainer.max_steps=10000 "$@"
