#!/usr/bin/env bash
# ONE COMMAND for the full Amazon-Polarity guidance-evaluation protocol
# (reference scripts/train_amazon_polarity.sh +
#  guidance_eval/amazon_polarity_eval.py:66-215):
#   1. train the guided UDLM DiT (CFG cond-dropout training)
#   2. train a clean-sequence sentiment judge
#      (+is_eval_classifier=True — the offline substitute for the
#      reference's HF sentiment model, amazon_polarity_eval.py:92-124)
#   3. build a local synthetic gen-PPL judge (exact
#      compute_generative_ppl code path; swap for gpt2-large when the
#      HF asset exists — zero code changes)
#   4. gamma-sweep guided sampling -> n-gram diversity + sentiment
#      accuracy + gen-PPL -> CSV
#
# Default scale is a PROTOCOL-DEMO on synthetic data that completes on
# one v5e chip in minutes. Reference scale = pass overrides (model=small,
# trainer.max_steps=250000, +data.synthetic=false, real judges).
set -euo pipefail
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD:${PYTHONPATH:-}"
# Skip huggingface.co retry loops in zero-egress environments: the
# tokenizer falls back to FallbackWordTokenizer instantly, and a local
# HF cache still resolves under offline mode. Set HF_HUB_OFFLINE=0 to
# allow downloads.
export HF_HUB_OFFLINE="${HF_HUB_OFFLINE:-1}"

OUT="${1:?usage: run_amazon_protocol.sh <out_dir> [overrides...]}"; shift || true
mkdir -p "$OUT"

COMMON=(
  loader.global_batch_size=16 loader.batch_size=16
  loader.eval_global_batch_size=16
  trainer.max_steps=200 trainer.val_check_interval=200
  trainer.log_every_n_steps=50 trainer.limit_val_batches=0.05
  model.length=64 sampling.steps=32 sampling.batch_size=8
  '+data.synthetic=true' "data.cache_dir=$OUT/data"
  eval.generate_samples=False
  model.hidden_size=64 model.cond_dim=32 model.n_blocks=4 model.n_heads=4
)
CLF=(
  classifier_backbone=dit
  classifier_model=tiny-classifier
  classifier_model.hidden_size=64 classifier_model.cond_dim=32
  classifier_model.n_blocks=2 classifier_model.n_heads=4
  classifier_model.length=64
)

echo "=== [1/4] train guided UDLM DiT on Amazon-Polarity ==="
scripts/train_amazon_polarity.sh \
  "checkpointing.save_dir=$OUT/diffusion" "${COMMON[@]}" "$@"

echo "=== [2/4] train clean-sequence sentiment judge ==="
scripts/train_amazon_polarity_classifier.sh \
  "checkpointing.save_dir=$OUT/judge" '+is_eval_classifier=True' \
  lr_scheduler.warmup_t=20 "${COMMON[@]}" "${CLF[@]}" "$@"

echo "=== [3/4] build local synthetic gen-PPL judge ==="
python - "$OUT" <<'PY'
import sys
from ddg_tpu.eval_utils import save_synthetic_judge
words = [f'w{i}' for i in range(512)] + ['the', 'a', 'good', 'bad']
print(save_synthetic_judge(sys.argv[1] + '/genppl_judge', words))
PY

echo "=== [4/4] gamma-sweep guidance eval ==="
SENTIMENT_CLASSIFIER_CKPT="$OUT/judge/classifier_checkpoints/last" \
NUM_SAMPLE_BATCHES="${NUM_SAMPLE_BATCHES:-2}" \
OUTPUT_CSV="$OUT/amazon_guidance_eval.csv" \
scripts/eval_amazon_polarity_guidance.sh \
  "$OUT/diffusion/checkpoints/last" "${COMMON[@]}" "${CLF[@]}" \
  "+eval.generative_ppl_model_name_or_path=$OUT/genppl_judge" "$@"

echo "protocol artifacts in $OUT:"
ls -la "$OUT"
