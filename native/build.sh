#!/usr/bin/env bash
# Build the native tokenization library.
set -euo pipefail
cd "$(dirname "$0")"
g++ -O3 -march=native -shared -fPIC -std=c++17 \
    -o libfast_tokenize.so fast_tokenize.cpp
echo "built native/libfast_tokenize.so"
