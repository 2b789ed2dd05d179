#!/usr/bin/env bash
# Build the native libraries (tokenization + data pipeline).
set -euo pipefail
cd "$(dirname "$0")"
g++ -O3 -march=native -shared -fPIC -std=c++17 \
    -o libfast_tokenize.so fast_tokenize.cpp
g++ -O3 -march=native -shared -fPIC -std=c++17 -pthread \
    -o libdata_pipeline.so data_pipeline.cpp
echo "built native/libfast_tokenize.so native/libdata_pipeline.so"
