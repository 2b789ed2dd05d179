#!/usr/bin/env bash
# Train the PINNED Species10 eval classifier (the judge used by
# eval_ten_species_guidance.sh). Reference:
# scripts/train_ten_species_eval_classifier.sh fine-tunes HyenaDNA
# (LongSafari/hyenadna-small-32k-seqlen-hf, 8 layers, lr 6e-5) on
# CLEAN sequences; HF remote code is unavailable offline, so the
# equivalent-scale judge is a bidirectional DiMamba classifier
# (configs/classifier_model/species-eval-classifier.yaml) trained via
# the same clean-sequence protocol (+is_eval_classifier=True).
set -euo pipefail
python -m ddg_tpu.main \
  mode=train_classifier \
  +is_eval_classifier=True \
  data=ten_species \
  backbone=dimamba model=dimamba \
  classifier_backbone=dimamba \
  classifier_model=species-eval-classifier \
  loader.global_batch_size=32 \
  optim.lr=6e-5 \
  lr_scheduler=cosine_decay_warmup \
  lr_scheduler.warmup_t=3000 \
  trainer.max_steps=30000 "$@"
