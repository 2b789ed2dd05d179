#!/usr/bin/env bash
# Unconditional QM9 training (reference scripts/train_qm9_no-guidance.sh:
# same recipe as guidance but training.guidance=null -> no label
# conditioning, used as the base model for CBG/NOS/PPLM).
set -euo pipefail
MODEL="${MODEL:-udlm}"
case "$MODEL" in
  ar)   FLAGS="diffusion=absorbing_state parameterization=ar T=0 time_conditioning=False" ;;
  mdlm) FLAGS="diffusion=absorbing_state parameterization=subs T=0 time_conditioning=False" ;;
  udlm) FLAGS="diffusion=uniform parameterization=d3pm T=0 time_conditioning=True zero_recon_loss=True" ;;
  *) echo "MODEL must be ar|mdlm|udlm" >&2; exit 1 ;;
esac
python -m ddg_tpu.main \
  mode=train \
  data=qm9 \
  model=small \
  model.length=32 \
  lr_scheduler=cosine_decay_warmup \
  loader.global_batch_size=2048 \
  training.guidance=null \
  trainer.max_steps=25000 \
  $FLAGS "$@"
