#!/usr/bin/env bash
# Round-5 on-chip queue (one TPU job at a time; run this script alone).
#   1. AR decode int8-KV A/B at B=256 (VERDICT r4 next #3)
#   2. fused-kernel validation incl. the NEW int8 head kernel
#   3. ancestral T=1000 composition re-sweep (int8-aware fused head,
#      VERDICT r4 next #5)
#   4. UNet norm-bf16 / int8 A/Bs (VERDICT r4 next #2)
#   5. megakernel 500-step convergence parity (VERDICT r4 next #4)
set -uo pipefail
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD:${PYTHONPATH:-}"
LOG="${LOG_DIR:-/tmp/r5a}"
mkdir -p "$LOG"

run() {
  name="$1"; shift
  echo "=== $name: $* ($(date +%H:%M:%S))"
  "$@" > "$LOG/$name.log" 2>&1
  rc=$?
  grep -v WARNING "$LOG/$name.log" | tail -15
  echo "=== $name done rc=$rc ($(date +%H:%M:%S))"
}

run ar_bf16       python bench.py --ar
run ar_int8       python bench.py --ar --int8
run validate_fused python scripts/validate_fused_tpu.py
run compose       python scripts/drive_ancestral_compose_tpu.py
run unet_int8_nbf16 python bench.py --unet --int8 --norm-bf16
run unet_nbf16    python bench.py --unet --norm-bf16
run megaparity    python scripts/drive_megakernel_parity.py --steps 500 \
                    --out "$LOG/megakernel_parity.json"
echo "ALL DONE ($(date +%H:%M:%S))"
