#!/usr/bin/env bash
# Probe the axon TPU tunnel every PROBE_INTERVAL seconds; when it comes
# back, run the queued on-chip close-out (scripts/onchip_closeout.sh)
# exactly once and exit. Safe to leave running while CPU-mesh work
# proceeds — it starts at most ONE TPU job, and only when the tunnel
# answers a cheap devices() probe.
set -u
cd "$(dirname "$0")/.."
PROBE_INTERVAL="${PROBE_INTERVAL:-600}"
PROBE_TIMEOUT="${PROBE_TIMEOUT:-180}"
LOG="${TUNNEL_WATCH_LOG:-/tmp/tunnel_watch.log}"
case ":${PYTHONPATH:-}:" in
  *:/root/.axon_site:*) ;;
  *) PYTHONPATH="${PYTHONPATH:+$PYTHONPATH:}/root/.axon_site" ;;
esac
export PYTHONPATH="$PWD:$PYTHONPATH"

echo "[tunnel_watch] start $(date) interval=${PROBE_INTERVAL}s" >> "$LOG"
while true; do
  if timeout "$PROBE_TIMEOUT" python -c "import jax; assert jax.devices()" \
      >> "$LOG" 2>&1; then
    echo "[tunnel_watch] tunnel UP $(date) — launching onchip_closeout" >> "$LOG"
    bash scripts/onchip_closeout.sh >> "$LOG" 2>&1
    echo "[tunnel_watch] closeout done $(date)" >> "$LOG"
    exit 0
  fi
  echo "[tunnel_watch] tunnel still down $(date)" >> "$LOG"
  sleep "$PROBE_INTERVAL"
done
