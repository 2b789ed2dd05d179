#!/usr/bin/env bash
# Round-3 second on-chip batch (run AFTER onchip_closeout.sh): the
# selective-scan follow-ups that depend on nothing in the closeout.
#   1. scan_vs_xla   — Pallas kernel vs XLA associative scan at the
#                      Species10 shape, at the CURRENT defaults
#                      (pps, tiles 512/256) — records the final ratio
#                      for the round-2 VERDICT item 7 ("fwd >= 7x or a
#                      written negative result").
#   2. pps_bf16      — bf16 scan arithmetic retested under pps (the
#                      round-3 negative result was hybrid-only: its
#                      Hillis-Steele shifts hit the sub-32-bit roll
#                      fallback; the pps inner loop is shift-free).
set -uo pipefail
cd "$(dirname "$0")/.."
case ":${PYTHONPATH:-}:" in
  *:/root/.axon_site:*) ;;
  *) PYTHONPATH="${PYTHONPATH:+$PYTHONPATH:}/root/.axon_site" ;;
esac
export PYTHONPATH="$PWD:$PYTHONPATH"
LOGDIR="${LOGDIR:-/tmp/onchip_round3b}"
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

run_leg scan_vs_xla 3600 python scripts/bench_selective_scan.py
run_leg pps_bf16    5400 python scripts/bench_scan_sweep.py --pps-bf16

echo "=== summary ==="
tail -n 4 "$LOGDIR"/*.log
