#!/usr/bin/env bash
# Train the Species10 eval classifier (the judge used by
# eval_ten_species_guidance.sh). Reference:
# scripts/train_ten_species_eval_classifier.sh trains HyenaDNA
# FROM SCRATCH ("hyenadna-small-32k_from-scratch_nlayer-8",
# classifier.py:166-178 from_config(pretrained=False), n_layer=8,
# lr 6e-5) on CLEAN sequences — no pretrained weights involved, so the
# native flax HyenaDNA (ddg_tpu/models/hyenadna.py) reproduces the
# protocol architecture-faithfully with no HF assets.
# Pass classifier_backbone=dimamba classifier_model=species-eval-classifier
# for the round-2 DiMamba judge recipe instead.
set -euo pipefail
python -m ddg_tpu.main \
  mode=train_classifier \
  +is_eval_classifier=True \
  data=ten_species \
  backbone=dimamba model=dimamba \
  classifier_backbone=hyenadna \
  classifier_model=hyenadna-classifier \
  classifier_model.n_layer=8 \
  loader.global_batch_size=32 \
  optim.lr=6e-5 \
  lr_scheduler=cosine_decay_warmup \
  lr_scheduler.warmup_t=3000 \
  trainer.max_steps=30000 "$@"
