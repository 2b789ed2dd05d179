#!/usr/bin/env bash
# ONE COMMAND for the full QM9 guidance-evaluation protocol
# (reference scripts/train_qm9_guidance.sh +
#  guidance_eval/qm9_eval.py:88-204):
#   1. train the guided UDLM DiT (CFG cond-dropout training) on QM9
#   2. gamma-sweep guided sampling -> validity / uniqueness / novelty
#      (+ QED/ring stats when RDKit is present) -> CSV
#
# Default scale is a PROTOCOL-DEMO on synthetic data that completes on
# one v5e chip in minutes (hidden 64, 200 steps, 4 batches/gamma).
# Reference scale = pass overrides:
#   scripts/run_qm9_protocol.sh /out/dir model=small \
#     trainer.max_steps=25000 loader.global_batch_size=2048 \
#     +data.synthetic=false
# and NUM_SAMPLE_BATCHES=64 (the paper protocol).
set -euo pipefail
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD:${PYTHONPATH:-}"

OUT="${1:?usage: run_qm9_protocol.sh <out_dir> [overrides...]}"; shift || true
mkdir -p "$OUT"

COMMON=(
  loader.global_batch_size=32 loader.batch_size=32
  loader.eval_global_batch_size=32
  trainer.max_steps=200 trainer.val_check_interval=200
  trainer.log_every_n_steps=50 trainer.limit_val_batches=0.05
  sampling.steps=32 sampling.batch_size=16
  '+data.synthetic=true' "data.cache_dir=$OUT/data"
  eval.generate_samples=False
  model.hidden_size=64 model.cond_dim=32 model.n_blocks=4 model.n_heads=4
)

echo "=== [1/2] train guided UDLM DiT on QM9 ==="
scripts/train_qm9_guidance.sh \
  "checkpointing.save_dir=$OUT/diffusion" "${COMMON[@]}" "$@"

echo "=== [2/2] gamma-sweep guidance eval ==="
NUM_SAMPLE_BATCHES="${NUM_SAMPLE_BATCHES:-4}" \
OUTPUT_CSV="$OUT/qm9_guidance_eval.csv" \
scripts/eval_qm9_guidance.sh "$OUT/diffusion/checkpoints/last" \
  "${COMMON[@]}" "$@"

echo "protocol artifacts in $OUT:"
ls -la "$OUT"
