#!/usr/bin/env bash
# Noisy-input sentiment classifier for CBG/NOS on Amazon-Polarity
# (reference scripts/train_amazon_polarity_classifier.sh: tiny DiT
# classifier, 400K steps, cosine decay). DIFFUSION picks the forward
# process the paired diffusion model uses.
set -euo pipefail
DIFFUSION="${DIFFUSION:-absorbing_state}"
python -m ddg_tpu.main \
  mode=train_classifier \
  diffusion="$DIFFUSION" \
  T=0 \
  data=amazon_polarity \
  classifier_backbone=dit \
  classifier_model=tiny-classifier \
  model.length=128 classifier_model.length=128 \
  loader.global_batch_size=512 \
  optim.lr=3e-4 \
  lr_scheduler=cosine_decay_warmup \
  lr_scheduler.warmup_t=1000 \
  trainer.max_steps=400000 "$@"
