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

#   3. quant legs   — int8 dynamic-quant path: distribution validation
#                     (TV vs the 4000-draw eval noise floor) + the
#                     first-hitting / ancestral A/B vs the bf16 default
#                     (the driver-headline sampler is MXU-bound at ~75%
#                     of bf16 peak; int8 MXU rate is 2x on v5e).
run_leg scan_vs_xla    3600 python scripts/bench_selective_scan.py
run_leg pps_bf16       5400 python scripts/bench_scan_sweep.py --pps-bf16
run_leg validate_quant 2400 python scripts/validate_quant_tpu.py
run_leg fh_int8        2400 python bench.py --first-hitting --int8
run_leg ancestral_int8 3600 python bench.py --ancestral --int8

echo "=== summary ==="
tail -n 4 "$LOGDIR"/*.log
