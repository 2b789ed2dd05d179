#!/usr/bin/env bash
# Train a noisy-input classifier on QM9 for CBG/NOS guidance
# (reference scripts/train_qm9_classifier.sh pattern).
set -euo pipefail
python -m ddg_tpu.main \
  mode=train_classifier \
  data=qm9 \
  classifier_model=small-classifier \
  model.length=32 classifier_model.length=32 \
  diffusion=uniform parameterization=d3pm time_conditioning=True \
  trainer.max_steps=10000 "$@"
