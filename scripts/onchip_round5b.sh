#!/usr/bin/env bash
# Round-5 on-chip queue, part B (after onchip_round5a.sh):
#   1. classifier-guidance validation drive on the REAL chip
#      (VERDICT r4 next #1 — steering + parity evidence on hardware)
#   2. all five protocol runners at demo scale -> committed artifacts
#      (VERDICT r4 next #6)
# One TPU job at a time; run this script alone.
set -uo pipefail
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD:${PYTHONPATH:-}"
LOG="${LOG_DIR:-/tmp/r5b}"
ART="${ART_DIR:-$PWD/artifacts/round5}"
mkdir -p "$LOG" "$ART"

run() {
  name="$1"; shift
  echo "=== $name: $* ($(date +%H:%M:%S))"
  "$@" > "$LOG/$name.log" 2>&1
  rc=$?
  grep -v WARNING "$LOG/$name.log" | tail -12
  echo "=== $name done rc=$rc ($(date +%H:%M:%S))"
}

run guidance_tpu python scripts/drive_guidance_tpu.py \
    --out "$ART/guidance_tpu.json"
run guidance_cmp python scripts/drive_guidance_tpu.py \
    --compare "$ART/guidance_tpu.json" /tmp/guidance_cpu.json

run proto_qm9     scripts/run_qm9_protocol.sh     /tmp/proto/qm9
run proto_text8   scripts/run_text8_protocol.sh   /tmp/proto/text8
run proto_lm1b    scripts/run_lm1b_protocol.sh    /tmp/proto/lm1b
run proto_amazon  scripts/run_amazon_protocol.sh  /tmp/proto/amazon
run proto_species scripts/run_species10_protocol.sh /tmp/proto/species10

# harvest the protocol artifacts (CSV/JSON outputs only, no ckpts)
find /tmp/proto -maxdepth 2 \( -name '*.csv' -o -name '*.json' \) \
    ! -name 'config_tree*' -print -exec sh -c '
      dest="$1/$(basename "$(dirname "$2")")_$(basename "$2")";
      cp "$2" "$dest"' _ "$ART" {} \;
ls -la "$ART"
echo "ALL DONE ($(date +%H:%M:%S))"
