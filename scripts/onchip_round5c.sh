#!/usr/bin/env bash
# Round-5 on-chip queue, part C (after 5a/5b):
#   1. UNet fused GroupNorm+SiLU Pallas A/B matrix (VERDICT r4 #2):
#      the kernel saves one full HBM read per GN (stats+apply fused).
#   2. D-CBG exact with the int8 trunk (forward-only scoring, so
#      dynamic quant is legitimate on denoiser + edit classifier).
#   3. Post-megakernel DiMamba phase attribution (VERDICT r4 weak #4).
set -uo pipefail
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD:${PYTHONPATH:-}"
LOG="${LOG_DIR:-/tmp/r5c}"
mkdir -p "$LOG"

run() {
  name="$1"; shift
  echo "=== $name: $* ($(date +%H:%M:%S))"
  "$@" > "$LOG/$name.log" 2>&1
  rc=$?
  grep -v WARNING "$LOG/$name.log" | tail -12
  echo "=== $name done rc=$rc ($(date +%H:%M:%S))"
}

run unet_fnorm        python bench.py --unet --fused-norm
run unet_fnorm_nbf16  python bench.py --unet --fused-norm --norm-bf16
run unet_fnorm_int8   python bench.py --unet --fused-norm --norm-bf16 --int8
run cbg_int8          python bench.py --cbg --int8
run dimamba_phases    python scripts/bench_dimamba_phases.py
echo "ALL DONE ($(date +%H:%M:%S))"
