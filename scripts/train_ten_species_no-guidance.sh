#!/usr/bin/env bash
# Unconditional Species10 training (reference
# scripts/train_ten_species_no-guidance.sh) - base model for
# CBG/NOS/PPLM guidance.
set -euo pipefail
MODEL="${MODEL:-udlm}"
case "$MODEL" in
  ar)   FLAGS="diffusion=absorbing_state parameterization=ar T=0 time_conditioning=False model.bidirectional=False" ;;
  mdlm) FLAGS="diffusion=absorbing_state parameterization=subs T=0 time_conditioning=False" ;;
  udlm) FLAGS="diffusion=uniform parameterization=d3pm T=0 time_conditioning=True zero_recon_loss=True" ;;
  *) echo "MODEL must be ar|mdlm|udlm" >&2; exit 1 ;;
esac
python -m ddg_tpu.main \
  mode=train \
  data=ten_species \
  backbone=dimamba \
  model=dimamba \
  loader.global_batch_size=32 \
  optim.lr=2e-3 \
  training.guidance=null \
  trainer.max_steps=30000 \
  $FLAGS "$@"
