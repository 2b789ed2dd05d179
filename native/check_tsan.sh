#!/usr/bin/env bash
# Race-detection gate for the native data pipeline: build the stress
# driver + pipeline under ThreadSanitizer and run it. Fails (nonzero)
# on any data race or assertion. The reference has no race detection
# anywhere (SURVEY.md §5); this is the aux-subsystem equivalent for
# the one concurrent component in this framework's host runtime.
set -euo pipefail
cd "$(dirname "$0")"
out="${TSAN_BIN:-/tmp/ddg_pipeline_tsan}"
g++ -fsanitize=thread -O1 -g -std=c++17 -pthread \
    -o "$out" stress_data_pipeline.cpp data_pipeline.cpp
TSAN_OPTIONS="halt_on_error=1 exitcode=66" "$out"
echo "TSAN: no races detected"
