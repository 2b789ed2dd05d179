#!/usr/bin/env bash
# Round-3 on-chip close-out: every leg that was queued while the axon
# tunnel was down, batched into ONE sequential session (one TPU job at
# a time — tunnel contention stalls both; Pallas compiles through the
# remote-compile tunnel take 10-25 min, so everything is batched here
# rather than iterated). Logs land in $LOGDIR; each leg is independent
# so a failure doesn't lose the rest.
#
# Legs:
#   1. drive_verify       — tiny-DiT sampler distribution drive on chip
#                           (ancestral fused/unfused + first-hitting TV)
#   2. validate_fused     — fused-kernel RNG/distribution checks vs
#                           analytic posteriors (incl. the head-fused
#                           kernel; interpret mode fakes the PRNG, so
#                           this MUST run on the real chip)
#   3. head-fused A/B     — bench.py --ancestral vs --ancestral
#                           --fused-head (decides the fused_head
#                           default; DESIGN.md round-4 queue item 0)
#   4. bench refresh      — full six-workload bench.py
set -uo pipefail
cd "$(dirname "$0")/.."
# /root/.axon_site is LOAD-BEARING for the axon TPU plugin (CLAUDE.md):
# append it unconditionally so a caller-exported PYTHONPATH that lacks
# it can't silently turn all "on-chip" legs into CPU runs.
case ":${PYTHONPATH:-}:" in
  *:/root/.axon_site:*) ;;
  *) PYTHONPATH="${PYTHONPATH:+$PYTHONPATH:}/root/.axon_site" ;;
esac
export PYTHONPATH="$PWD:$PYTHONPATH"
LOGDIR="${LOGDIR:-/tmp/onchip_closeout}"
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

#   5. attention A/B      — in-tree Pallas flash attention vs XLA at
#                           the text8 train shape (kernel-level +
#                           train-step-level); decides the tpu_flash
#                           'auto' policy for training
#   6. first-hitting B-sweep — the driver headline runs B=32; if B=48
#                           or B=64 amortizes the unmask-tail better,
#                           flip the bench default (same metric).
run_leg drive_verify      2400 python scripts/drive_verify.py
run_leg validate_fused    5400 python scripts/validate_fused_tpu.py
run_leg ab_ancestral      3600 python bench.py --ancestral
run_leg ab_fused_head     5400 python bench.py --ancestral --fused-head
run_leg attn_kernel_ab    3600 python scripts/bench_attention_flash.py
run_leg train_xla         2400 python bench.py --train
run_leg train_flash       3600 python bench.py --train --flash-attn
run_leg fh_b48            2400 python bench.py --first-hitting --batch 48
run_leg fh_b64            2400 python bench.py --first-hitting --batch 64
run_leg bench_full        7200 python bench.py

echo "=== summary ==="
tail -n 2 "$LOGDIR"/*.log
