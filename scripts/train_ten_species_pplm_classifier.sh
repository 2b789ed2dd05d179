#!/usr/bin/env bash
# PPLM/NOS classifier on Species10: shares + freezes the pretrained
# unconditional DiMamba trunk (reference
# scripts/train_ten_species_pplm_classifier.sh).
set -euo pipefail
PRETRAINED="${1:?usage: train_ten_species_pplm_classifier.sh <diffusion_checkpoint> [overrides...]}"; shift || true
MODEL="${MODEL:-udlm}"
case "$MODEL" in
  mdlm) FLAGS="diffusion=absorbing_state parameterization=subs time_conditioning=False" ;;
  udlm) FLAGS="diffusion=uniform parameterization=d3pm time_conditioning=True" ;;
  *) echo "MODEL must be mdlm|udlm" >&2; exit 1 ;;
esac
python -m ddg_tpu.main \
  mode=train_classifier \
  +is_pplm_classifier=True \
  data=ten_species \
  backbone=dimamba model=dimamba \
  classifier_backbone=dimamba \
  classifier_model=tiny-dimamba-classifier \
  eval.checkpoint_path="$PRETRAINED" \
  loader.global_batch_size=32 \
  optim.lr=2e-3 \
  trainer.max_steps=30000 \
  $FLAGS "$@"
