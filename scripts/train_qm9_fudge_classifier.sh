#!/usr/bin/env bash
# Per-position FUDGE classifier on QM9 (reference
# scripts/train_qm9_fudge_classifier.sh: causal, no_pooling, clean
# prefixes; label from PROP=qed|ring_count percentile).
set -euo pipefail
PROP="${PROP:-qed}"
python -m ddg_tpu.main \
  mode=train_classifier \
  +is_fudge_classifier=True \
  parameterization=ar \
  data=qm9 \
  data.label_col="$PROP" \
  classifier_backbone=dit \
  classifier_model=small-classifier \
  classifier_model.pooling=no_pooling \
  model.length=32 classifier_model.length=32 \
  training.guidance=null \
  trainer.max_steps=10000 "$@"
