#!/bin/bash
# Round-4b on-chip queue (run AFTER drive_ancestral_compose_tpu.py
# frees the tunnel; ONE TPU job at a time):
#   1. DiT text8 train adaLN-chain A/B (VERDICT r3 next #4)
#   2. UNet CIFAR int8 conv-trunk A/B (VERDICT r3 next #8)
#   3. AR decode with length-bucketed cache reads (VERDICT r3 next #7)
# Each leg is its own process (donated train states make same-process
# A/Bs unreliable — round-4 fused-block lesson).
set -x
cd /root/repo
export PYTHONPATH=/root/repo:$PYTHONPATH

echo "=== adaLN A/B: baseline (B=256) ==="
timeout 3600 python bench.py --train
echo "=== adaLN A/B: fused (B=256) ==="
timeout 3600 python bench.py --train --fused-adaln
echo "=== UNet int8 trunk ==="
timeout 3600 python bench.py --unet --int8
echo "=== AR decode, bucketed cache (B=64 default) ==="
timeout 3600 python bench.py --ar
echo "=== AR decode, bucketed cache (B=256) ==="
timeout 3600 python bench.py --ar --batch 256
echo "=== round4b done ==="
