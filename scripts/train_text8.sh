#!/usr/bin/env bash
# Train AR / MDLM / UDLM on text8 (reference scripts/train_text8.sh).
# Usage: MODEL=<ar|mdlm|udlm> bash scripts/train_text8.sh [extra overrides...]
set -euo pipefail
MODEL="${MODEL:-mdlm}"
case "$MODEL" in
  ar)   FLAGS="diffusion=absorbing_state parameterization=ar T=0 time_conditioning=False" ;;
  mdlm) FLAGS="diffusion=absorbing_state parameterization=subs T=0 time_conditioning=False" ;;
  udlm) FLAGS="diffusion=uniform parameterization=d3pm T=0 time_conditioning=True zero_recon_loss=True" ;;
  *) echo "MODEL must be ar|mdlm|udlm" >&2; exit 1 ;;
esac
# loader.batch_size=16 keeps the per-device micro-batch at the
# measured v5e optimum (round-4c sweep: micro 128/64/32/16/8 =
# 159.6/176.4/209.9/236.7/222.9K tok/s at this exact shape) — the
# config resolvers then set accumulate_grad_batches=global/(devices*16)
# automatically, and accumulation is gradient-exact (DESIGN.md D).
python -m ddg_tpu.main \
  mode=train \
  data=text8 \
  model=small \
  model.length=256 \
  noise=loglinear \
  loader.global_batch_size=512 \
  loader.batch_size=16 \
  optim.lr=3e-4 \
  trainer.max_steps=1000000 \
  $FLAGS "$@"
