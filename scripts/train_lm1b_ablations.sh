#!/usr/bin/env bash
# Fork ablation recipes (reference train_lm1b_*.sh): pick with ABLATION=
#   swa | no_ema | label_smoothing | noise_schedule | noise_schedule_uniform |
#   unrolling | unrolling_instead | flexible_length
set -euo pipefail
ABLATION="${ABLATION:?set ABLATION=swa|no_ema|label_smoothing|noise_schedule|noise_schedule_uniform|unrolling|unrolling_instead|flexible_length}"
case "$ABLATION" in
  swa)              FLAGS="weights_averaging=swa" ;;
  no_ema)           FLAGS="weights_averaging=none" ;;
  label_smoothing)  FLAGS="training.label_smoothing=0.1" ;;
  noise_schedule)   FLAGS="training.noise_schedule_warmup=True" ;;
  noise_schedule_uniform) FLAGS="training.noise_schedule_warmup=True training.noise_schedule_uniform=True" ;;
  unrolling)        FLAGS="training.unrolling=True training.unrolling_steps=2" ;;
  unrolling_instead) FLAGS="training.unrolling=True training.unrolling_ignore_diffusion_loss=True" ;;
  flexible_length)  FLAGS="training.flexible_length=True" ;;
  *) echo "unknown ABLATION $ABLATION" >&2; exit 1 ;;
esac
MODEL="${MODEL:-mdlm}" exec bash "$(dirname "$0")/train_lm1b.sh" $FLAGS "$@"
