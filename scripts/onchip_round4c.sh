#!/bin/bash
# Round-4c on-chip queue (ONE TPU job at a time):
#   1. verify the new bench defaults (train B=512 accum=4, AR B=256)
#   2. UNet int8 batch re-sweep (the B=32 optimum was established
#      under bf16; int8 shifts the compute/BW balance)
#   3. train-knob re-test at the accum=4 micro-batch-128 shape
#      (fused-adaln was neutral at accum=2; attn-remat +0.8% at
#      single-shot B=256 — the HBM-pressure regime changed)
# Each leg is its own process (donated train states make same-process
# A/Bs unreliable — round-4 fused-block lesson).
set -x
cd /root/repo
export PYTHONPATH=/root/repo:$PYTHONPATH

echo "=== train default (B=512 accum=4) ==="
timeout 3600 python bench.py --train
echo "=== AR default (B=256, bucketed) ==="
timeout 3600 python bench.py --ar
echo "=== UNet int8 B=48 ==="
timeout 3600 python bench.py --unet --int8 --batch 48
echo "=== train accum=4 + fused-adaln ==="
timeout 3600 python bench.py --train --fused-adaln
echo "=== train accum=4 + attn-remat ==="
timeout 3600 python bench.py --train --attn-remat
echo "=== train micro-batch sweep (B=512; accum 8/16/32/64) ==="
for a in 8 16 32 64; do
  timeout 3600 python bench.py --train --accum $a
done
echo "=== round4c done ==="
