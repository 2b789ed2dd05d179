#!/usr/bin/env bash
# ONE COMMAND for the full Species10 guidance-evaluation protocol
# (reference guidance_eval/ten_species_eval.py:298-523):
#   1. train the guided UDLM DiMamba (cond_dropout CFG training)
#   2. train the pinned eval classifier (clean-sequence judge — the
#      HyenaDNA substitute, see train_ten_species_eval_classifier.sh)
#   3. guided per-class sampling -> judge acc/F1/MCC + 3/6-mer
#      Jensen-Shannon + discriminator AUROC -> JSON + CSV
#
# Default scale is a PROTOCOL-DEMO on synthetic data that completes on
# one v5e chip in tens of minutes (hidden 64, L=2048, 200 steps).
# Reference scale = pass overrides:
#   scripts/run_species10_protocol.sh /out/dir model.hidden_size=256 \
#     model.n_blocks=8 model.length=32768 trainer.max_steps=30000 \
#     +data.synthetic=false
set -euo pipefail
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD:${PYTHONPATH:-}"

OUT="${1:?usage: run_species10_protocol.sh <out_dir> [overrides...]}"; shift || true
mkdir -p "$OUT"

COMMON=(
  loader.global_batch_size=8 loader.batch_size=8
  loader.eval_global_batch_size=8
  trainer.max_steps=200 trainer.val_check_interval=200
  trainer.log_every_n_steps=50 trainer.limit_val_batches=0.05
  sampling.steps=32 sampling.batch_size=8
  '+data.synthetic=true' "data.cache_dir=$OUT/data"
  eval.generate_samples=False
)
DIFF=(
  model.hidden_size=64 model.cond_dim=32 model.n_blocks=4
  model.length=2048 '+model.d_state=8'
)
CLF=(
  # HyenaDNA judge (reference protocol; train script's default),
  # scaled to the demo size. The eval step re-declares backbone+model
  # so its restore matches the trained judge.
  classifier_backbone=hyenadna
  classifier_model=hyenadna-classifier
  classifier_model.d_model=64 classifier_model.n_layer=2
  classifier_model.d_inner=256 classifier_model.filter_order=16
  classifier_model.length=2048
)

echo "=== [1/3] train guided UDLM DiMamba ==="
scripts/train_ten_species_guidance.sh \
  "checkpointing.save_dir=$OUT/diffusion" "${COMMON[@]}" "${DIFF[@]}" "$@"

echo "=== [2/3] train pinned eval classifier ==="
scripts/train_ten_species_eval_classifier.sh \
  "checkpointing.save_dir=$OUT/judge" lr_scheduler.warmup_t=20 \
  "${COMMON[@]}" "${DIFF[@]}" "${CLF[@]}" "$@"

echo "=== [3/3] guided sampling + metrics ==="
EVAL_CLASSIFIER_CKPT="$OUT/judge/classifier_checkpoints/last" \
OUTPUT_JSON="$OUT/ten_species_guidance_eval.json" \
scripts/eval_ten_species_guidance.sh \
  "$OUT/diffusion/checkpoints/last" "${COMMON[@]}" "${DIFF[@]}" \
  "${CLF[@]}" "$@"

# CSV (the reference writes a CSV row per gamma,
# ten_species_eval.py:503-523)
python - "$OUT" <<'PY'
import csv
import json
import sys

out = sys.argv[1]
with open(f'{out}/ten_species_guidance_eval.json') as f:
    rows = json.load(f)
if isinstance(rows, dict):
    rows = [rows]
flat_rows = []
for r in rows:
    row = {}
    for k, v in r.items():
        if isinstance(v, dict):
            for kk, vv in v.items():
                if isinstance(vv, (int, float, str)):
                    row[f'{k}/{kk}'] = vv
        elif isinstance(v, (int, float, str)):
            row[k] = v
    flat_rows.append(row)
with open(f'{out}/ten_species_guidance_eval.csv', 'w', newline='') as f:
    w = csv.DictWriter(f, fieldnames=list(flat_rows[0]))
    w.writeheader()
    w.writerows(flat_rows)
print(f'CSV: {out}/ten_species_guidance_eval.csv')
print(json.dumps(flat_rows, indent=2)[:2000])
PY
