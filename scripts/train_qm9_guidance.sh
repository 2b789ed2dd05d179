#!/usr/bin/env bash
# Train UDLM on QM9 with CFG cond-dropout (reference
# scripts/train_qm9_guidance.sh: 25K steps, batch 2048, len 32,
# cosine decay, cond_dropout 0.1).
set -euo pipefail
MODEL="${MODEL:-udlm}"
case "$MODEL" in
  ar)   FLAGS="diffusion=absorbing_state parameterization=ar T=0 time_conditioning=False" ;;
  mdlm) FLAGS="diffusion=absorbing_state parameterization=subs T=0 time_conditioning=False" ;;
  udlm) FLAGS="diffusion=uniform parameterization=d3pm T=0 time_conditioning=True zero_recon_loss=True" ;;
esac
python -m ddg_tpu.main \
  mode=train \
  data=qm9 \
  model=small \
  model.length=32 \
  lr_scheduler=cosine_decay_warmup \
  loader.global_batch_size=2048 \
  training.guidance.cond_dropout=0.1 \
  trainer.max_steps=25000 \
  $FLAGS "$@"
