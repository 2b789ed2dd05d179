#!/usr/bin/env bash
# Round-4 first on-chip batch (after onchip_round3b.sh):
#   1. train_512_remat  — attn_remat frees ~9.6 GB of attention-probs
#                         residuals at B=512: does the single-shot step
#                         now fit, and does it beat the accum=2 path
#                         (130.7K tok/s)?
#   2. train_256_remat  — remat cost at the default batch (A/B vs the
#                         129.7K tok/s XLA-attention baseline).
#   3. dimamba_xla      — full-step A/B: XLA associative scan (+block
#                         remat) vs the Pallas scan kernel, after the
#                         kernel-level grad leg showed XLA at 0.86x
#                         (scripts/bench_selective_scan.py, round3b).
#   4. drive_verify     — re-verify the sampler surface after the
#                         attention-knob edits (commit gate).
set -uo pipefail
cd "$(dirname "$0")/.."
case ":${PYTHONPATH:-}:" in
  *:/root/.axon_site:*) ;;
  *) PYTHONPATH="${PYTHONPATH:+$PYTHONPATH:}/root/.axon_site" ;;
esac
export PYTHONPATH="$PWD:$PYTHONPATH"
LOGDIR="${LOGDIR:-/tmp/onchip_round4a}"
mkdir -p "$LOGDIR"

run_leg() {
  local name="$1" tmo="$2"; shift 2
  echo "=== $name ($(date)) -> $LOGDIR/$name.log"
  if timeout "$tmo" "$@" > "$LOGDIR/$name.log" 2>&1; then
    echo "    $name OK"
  else
    echo "    $name FAILED (rc=$?) — see $LOGDIR/$name.log"
  fi
}

run_leg train_512_remat 2400 python bench.py --train --batch 512 --attn-remat
run_leg train_256_remat 2400 python bench.py --train --attn-remat
run_leg dimamba_xla     3600 python bench.py --dimamba --xla-scan
run_leg drive_verify    2400 python scripts/drive_verify.py

echo "=== summary ==="
tail -n 2 "$LOGDIR"/*.log
