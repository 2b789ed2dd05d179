#!/usr/bin/env bash
# Asset on-ramp: the moment real HF assets exist locally, this verifies
# the BASELINE.json real-weight parity bar and the gpt2-large gen-PPL
# protocol with ZERO code changes. Offline (this image) it runs the
# identical code path against clearly-labeled synthetic stand-ins.
#
# Usage:
#   DDG_HF_ASSETS_DIR=/path/to/assets scripts/fetch_and_verify_parity.sh
#
# Expected assets layout (each optional; missing -> synthetic/skip):
#   $DDG_HF_ASSETS_DIR/udlm-lm1b/   (kuleshov-group/udlm-lm1b HF folder)
#   $DDG_HF_ASSETS_DIR/gpt2-large/  (judge model HF folder)
#
# No network fetch is attempted here (zero-egress image); with egress,
# populate the dir first:
#   huggingface-cli download kuleshov-group/udlm-lm1b --local-dir "$DDG_HF_ASSETS_DIR/udlm-lm1b"
#   huggingface-cli download gpt2-large --local-dir "$DDG_HF_ASSETS_DIR/gpt2-large"
set -euo pipefail
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD:${PYTHONPATH:-}"

export DDG_HF_ASSETS_DIR="${DDG_HF_ASSETS_DIR:-/root/hf_assets}"
echo "assets dir: $DDG_HF_ASSETS_DIR"
ls "$DDG_HF_ASSETS_DIR" 2>/dev/null || echo "(assets dir absent -> synthetic stand-in mode)"

python scripts/verify_real_weight_parity.py "$@"

# With real assets present, also run the pytest marker suite:
if [ -f "$DDG_HF_ASSETS_DIR/udlm-lm1b/config.json" ]; then
  python -m pytest tests/test_hf_assets.py -m hf_assets -q
fi
