#!/usr/bin/env bash
# Per-position FUDGE classifier on Species10 (reference
# scripts/train_ten_species_fudge_classifier.sh: causal, clean
# prefixes, no_pooling).
set -euo pipefail
python -m ddg_tpu.main \
  mode=train_classifier \
  +is_fudge_classifier=True \
  parameterization=ar \
  data=ten_species \
  backbone=dimamba model=dimamba \
  classifier_backbone=dimamba \
  classifier_model=tiny-dimamba-classifier \
  classifier_model.pooling=no_pooling \
  classifier_model.bidirectional=False \
  model.bidirectional=False \
  training.guidance=null \
  loader.global_batch_size=32 \
  optim.lr=2e-3 \
  trainer.max_steps=30000 "$@"
