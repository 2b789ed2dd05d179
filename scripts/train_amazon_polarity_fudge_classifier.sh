#!/usr/bin/env bash
# Per-position FUDGE classifier on Amazon-Polarity (reference
# scripts/train_amazon_polarity_fudge_classifier.sh: causal DiT,
# pooling=no_pooling, clean prefixes).
set -euo pipefail
python -m ddg_tpu.main \
  mode=train_classifier \
  +is_fudge_classifier=True \
  parameterization=ar \
  data=amazon_polarity \
  classifier_backbone=dit \
  classifier_model=tiny-classifier \
  classifier_model.pooling=no_pooling \
  model.length=128 classifier_model.length=128 \
  loader.global_batch_size=512 \
  optim.lr=3e-4 \
  training.guidance=null \
  trainer.max_steps=60000 "$@"
