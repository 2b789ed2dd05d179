#!/usr/bin/env bash
# Train UDLM UNet on discretized CIFAR10 (reference
# scripts/train_cifar10_unet_guidance.sh: 300K steps, batch 512).
set -euo pipefail
python -m ddg_tpu.main \
  mode=train \
  data=cifar10 \
  backbone=unet \
  model=unet \
  is_vision=True \
  diffusion=uniform parameterization=d3pm time_conditioning=True zero_recon_loss=True \
  loader.global_batch_size=512 \
  optim.lr=2e-4 \
  training.guidance.cond_dropout=0.1 \
  trainer.max_steps=300000 "$@"
