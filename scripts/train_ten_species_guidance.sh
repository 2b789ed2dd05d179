#!/usr/bin/env bash
# Train UDLM with DiMamba on Species10 (reference
# scripts/train_ten_species_guidance.sh: 30K steps, global batch 32,
# len 32768, hidden 256, 8 blocks, lr 2e-3).
set -euo pipefail
python -m ddg_tpu.main \
  mode=train \
  data=ten_species \
  backbone=dimamba \
  model=dimamba \
  diffusion=uniform parameterization=d3pm time_conditioning=True zero_recon_loss=True \
  loader.global_batch_size=32 \
  optim.lr=2e-3 \
  training.guidance.cond_dropout=0.1 \
  trainer.max_steps=30000 "$@"
