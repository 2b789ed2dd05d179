#!/usr/bin/env bash
# ONE COMMAND for the full text8 protocol
# (reference scripts/train_text8.sh + bash_scripts/eval_text8_gen_ppl.sh):
#   1. train AR / MDLM / UDLM on text8 (MODEL=<ar|mdlm|udlm>, default
#      mdlm) — character-level, id-identical Text8 tokenizer
#   2. validation PPL with EMA weights (mode=ppl_eval)
#   3. build a local synthetic gen-PPL judge (exact
#      compute_generative_ppl code path; swap for gpt2-large when the
#      HF asset exists — zero code changes) and score samples
#
# Default scale is a PROTOCOL-DEMO on synthetic data that completes in
# minutes. Reference scale = pass overrides (model=small,
# model.length=256, trainer.max_steps=1000000,
# loader.global_batch_size=512, +data.synthetic=false).
set -euo pipefail
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD:${PYTHONPATH:-}"
export HF_HUB_OFFLINE="${HF_HUB_OFFLINE:-1}"

OUT="${1:?usage: run_text8_protocol.sh <out_dir> [overrides...]}"; shift || true
mkdir -p "$OUT"

# family flags shared by every stage (train_text8.sh re-derives its own)
MODEL="${MODEL:-mdlm}"
case "$MODEL" in
  ar)   FAMILY=(diffusion=absorbing_state parameterization=ar T=0
               time_conditioning=False) ;;
  mdlm) FAMILY=(diffusion=absorbing_state parameterization=subs T=0
               time_conditioning=False) ;;
  udlm) FAMILY=(diffusion=uniform parameterization=d3pm T=0
               time_conditioning=True zero_recon_loss=True) ;;
  *) echo "MODEL must be ar|mdlm|udlm" >&2; exit 1 ;;
esac

COMMON=(
  model.length=64
  model.hidden_size=64 model.cond_dim=32 model.n_blocks=4 model.n_heads=4
  loader.global_batch_size=16 loader.batch_size=16
  loader.eval_global_batch_size=16
  trainer.log_every_n_steps=50 trainer.limit_val_batches=0.05
  sampling.steps=32 sampling.batch_size=8 sampling.num_sample_batches=1
  '+data.synthetic=true' "data.cache_dir=$OUT/data"
  eval.generate_samples=False
)

echo "=== [1/3] train $MODEL on text8 ==="
MODEL="$MODEL" scripts/train_text8.sh \
  trainer.max_steps=200 trainer.val_check_interval=200 \
  loader.global_batch_size=16 \
  "checkpointing.save_dir=$OUT/run" "${COMMON[@]}" "$@"

echo "=== [2/3] validation PPL (EMA weights) ==="
python -m ddg_tpu.main mode=ppl_eval data=text8 model=small \
  "${FAMILY[@]}" \
  "eval.checkpoint_path=$OUT/run/checkpoints/last" "${COMMON[@]}" "$@"

echo "=== [3/3] gen-PPL under a local judge ==="
python - "$OUT" <<'PY'
import sys
from ddg_tpu.eval_utils import save_synthetic_judge
# character-level samples re-tokenize as words under the judge's
# WordLevel tokenizer; include the alphabet so nothing maps to UNK
words = list('abcdefghijklmnopqrstuvwxyz') + [f'w{i}' for i in range(64)]
print(save_synthetic_judge(sys.argv[1] + '/genppl_judge', words))
PY
SAMPLING_STEPS=32 GEN_PPL_JUDGE="$OUT/genppl_judge" \
scripts/eval_text8_gen_ppl.sh "$OUT/run/checkpoints/last" \
  "${FAMILY[@]}" "${COMMON[@]}" "$@"

echo "protocol artifacts in $OUT:"
ls -la "$OUT"
