#!/usr/bin/env bash
# Noisy-input species classifier for CBG/NOS (reference
# scripts/train_ten_species_classifier.sh: bidirectional DiMamba
# classifier, 30K steps, lr 2e-3).
set -euo pipefail
DIFFUSION="${DIFFUSION:-uniform}"
python -m ddg_tpu.main \
  mode=train_classifier \
  diffusion="$DIFFUSION" \
  T=0 time_conditioning=True \
  data=ten_species \
  backbone=dimamba model=dimamba \
  classifier_backbone=dimamba \
  classifier_model=tiny-dimamba-classifier \
  loader.global_batch_size=32 \
  optim.lr=2e-3 \
  lr_scheduler=cosine_decay_warmup \
  lr_scheduler.warmup_t=3000 \
  trainer.max_steps=30000 "$@"
