#!/usr/bin/env bash
# ONE COMMAND for the full LM1B protocol
# (reference scripts/train_lm1b.sh + bash_scripts/eval_lm1b_ppl.sh /
#  eval_lm1b_gen_ppl.sh / eval_lm1b_lcsc.sh):
#   1. train MDLM on LM1B, keeping a step-snapshot trail
#   2. validation PPL with EMA weights (mode=ppl_eval)
#   3. build a local synthetic gen-PPL judge (exact
#      compute_generative_ppl code path; swap for gpt2-large when the
#      HF asset exists — zero code changes) and score samples
#   4. LCSC evolutionary checkpoint-merge search over the snapshot
#      trail (reference lcsc.py:94-195)
#
# Default scale is a PROTOCOL-DEMO on synthetic data that completes in
# minutes. Reference scale = pass overrides (model=small,
# trainer.max_steps=1000000, loader.global_batch_size=512,
# +data.synthetic=false, real bert tokenizer + gpt2-large judge).
set -euo pipefail
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD:${PYTHONPATH:-}"
# Skip huggingface.co retry loops in zero-egress environments (the
# tokenizer falls back instantly; a local HF cache still resolves).
export HF_HUB_OFFLINE="${HF_HUB_OFFLINE:-1}"

OUT="${1:?usage: run_lm1b_protocol.sh <out_dir> [overrides...]}"; shift || true
mkdir -p "$OUT"

COMMON=(
  data=lm1b model=small model.length=64
  model.hidden_size=64 model.cond_dim=32 model.n_blocks=4 model.n_heads=4
  loader.global_batch_size=16 loader.batch_size=16
  loader.eval_global_batch_size=16
  trainer.log_every_n_steps=50 trainer.limit_val_batches=0.05
  sampling.steps=32 sampling.batch_size=8 sampling.num_sample_batches=1
  '+data.synthetic=true' "data.cache_dir=$OUT/data"
  eval.generate_samples=False
)

echo "=== [1/4] train MDLM on LM1B (snapshot trail for LCSC) ==="
python -m ddg_tpu.main mode=train \
  diffusion=absorbing_state parameterization=subs noise=loglinear \
  trainer.max_steps=200 trainer.val_check_interval=100 \
  checkpointing.snapshot_every_n_steps=50 \
  "checkpointing.save_dir=$OUT/run" "${COMMON[@]}" "$@"

echo "=== [2/4] validation PPL (EMA weights) ==="
scripts/eval_lm1b_ppl.sh "$OUT/run/checkpoints/last" "${COMMON[@]}" "$@"

echo "=== [3/4] gen-PPL under a local judge ==="
python - "$OUT" <<'PY'
import sys
from ddg_tpu.eval_utils import save_synthetic_judge
words = [f'w{i}' for i in range(512)] + ['the', 'a', 'of', 'to']
print(save_synthetic_judge(sys.argv[1] + '/genppl_judge', words))
PY
GEN_PPL_JUDGE="$OUT/genppl_judge" \
scripts/eval_lm1b_gen_ppl.sh "$OUT/run/checkpoints/last" \
  sampling.steps=32 "${COMMON[@]}" "$@"

echo "=== [4/4] LCSC checkpoint-merge search over the snapshot trail ==="
scripts/eval_lm1b_lcsc.sh "$OUT/run" \
  +lcsc.iterations=3 +lcsc.population_size=6 +lcsc.offspring_per_iter=4 \
  +lcsc.fitness_batches=2 "${COMMON[@]}" "$@"

echo "protocol artifacts in $OUT:"
ls -la "$OUT"
