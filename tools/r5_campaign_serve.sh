#!/bin/bash
# Round-5 serving saturation campaign (VERDICT item 5): rates {4, 8, 12,
# 16} at the ceiling + one noise row; find the knee, complete rate=16.
# More requests at high rates so the measured window outlives warmup
# stragglers; every run under timeout.
set -x
cd "$(dirname "$0")/.."
LOG=tools/chiplog/22_r5_serve.log
{
  for rate in 4 8 12 16; do
    echo "=== serve rate=$rate ceiling $(date +%H:%M:%S)"
    timeout 1500 python benchmark/bench_serve.py --rate "$rate" --requests 96
    echo "rc=$?"
  done
  echo "=== serve rate=8 noise0.005 $(date +%H:%M:%S)"
  timeout 1500 python benchmark/bench_serve.py --rate 8 --requests 96 --draft-noise 0.005
  echo "rc=$?"
  echo "=== done $(date +%H:%M:%S)"
} >> "$LOG" 2>&1
