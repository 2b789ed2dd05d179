#!/usr/bin/env bash
# Round-5 on-chip queue, part D (after the megakernel-parity drive
# and onchip_round5c.sh, which carries the phase attribution):
#   All five run_*_protocol.sh at demo scale on the real chip
#   (VERDICT r4 next #6) -> CSV/JSON artifacts for the repo.
set -uo pipefail
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD:${PYTHONPATH:-}"
LOG="${LOG_DIR:-/tmp/r5d}"
PROTO="${PROTO_DIR:-/tmp/proto5}"
mkdir -p "$LOG" "$PROTO"

run() {
  name="$1"; shift
  echo "=== $name: $* ($(date +%H:%M:%S))"
  "$@" > "$LOG/$name.log" 2>&1
  rc=$?
  grep -v WARNING "$LOG/$name.log" | tail -8
  echo "=== $name done rc=$rc ($(date +%H:%M:%S))"
}

run proto_qm9       scripts/run_qm9_protocol.sh       "$PROTO/qm9"
run proto_text8     scripts/run_text8_protocol.sh     "$PROTO/text8"
run proto_amazon    scripts/run_amazon_protocol.sh    "$PROTO/amazon"
run proto_lm1b      scripts/run_lm1b_protocol.sh      "$PROTO/lm1b"
run proto_species10 scripts/run_species10_protocol.sh "$PROTO/species10"
echo "ALL DONE ($(date +%H:%M:%S))"
