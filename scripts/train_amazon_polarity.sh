#!/usr/bin/env bash
# Train AR/MDLM/UDLM on Amazon-Polarity with CFG cond-dropout
# (reference scripts/train_amazon_polarity.sh: bert-base vocab,
# len 128, global batch 512; MODEL picks the family).
set -euo pipefail
MODEL="${MODEL:-udlm}"
USE_SIMPLE_CE_LOSS="${USE_SIMPLE_CE_LOSS:-False}"
case "$MODEL" in
  ar)   FLAGS="diffusion=absorbing_state parameterization=ar T=0 time_conditioning=False sampling.use_cache=False" ;;
  mdlm) FLAGS="diffusion=absorbing_state parameterization=subs T=0 time_conditioning=False" ;;
  udlm) FLAGS="diffusion=uniform parameterization=d3pm T=0 time_conditioning=True zero_recon_loss=True" ;;
  *) echo "MODEL must be ar|mdlm|udlm" >&2; exit 1 ;;
esac
python -m ddg_tpu.main \
  mode=train \
  data=amazon_polarity \
  model=small \
  model.length=128 \
  loader.global_batch_size=512 \
  training.guidance.cond_dropout=0.1 \
  training.use_simple_ce_loss="$USE_SIMPLE_CE_LOSS" \
  lr_scheduler=cosine_decay_warmup \
  trainer.max_steps=250000 \
  $FLAGS "$@"
