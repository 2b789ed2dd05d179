#!/usr/bin/env bash
# Build the native libraries (tokenization + data pipeline).
#
# Usage: build.sh [libfast_tokenize.so|libdata_pipeline.so]
#   With a target argument, builds only that library (so a compile
#   error in one source can't block the other). With no argument,
#   builds both; exits nonzero if any failed.
#
# Deliberately NO -march=native: the .so may be built on one machine
# and loaded on another (CDLL load would succeed, then the first call
# hits an unsupported instruction -> SIGILL). The hot path is
# memcpy/table-walk bound; generic -O3 codegen is within noise.
set -uo pipefail
cd "$(dirname "$0")"

build_one() {
  case "$1" in
    libfast_tokenize.so)
      g++ -O3 -shared -fPIC -std=c++17 \
          -o libfast_tokenize.so fast_tokenize.cpp ;;
    libdata_pipeline.so)
      g++ -O3 -shared -fPIC -std=c++17 -pthread \
          -o libdata_pipeline.so data_pipeline.cpp ;;
    *) echo "unknown target $1" >&2; return 2 ;;
  esac
}

if [ $# -ge 1 ]; then
  build_one "$1" && echo "built native/$1"
else
  rc=0
  for t in libfast_tokenize.so libdata_pipeline.so; do
    if build_one "$t"; then echo "built native/$t"; else rc=1; fi
  done
  exit "$rc"
fi
