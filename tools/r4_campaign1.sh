#!/bin/bash
# Round-4 measurement campaign 1: adaptive-gamma rows + MoE re-measure.
# Serialized on the single chip; logs append to tools/chiplog/11_round4.log.
cd /root/repo || exit 1
L=tools/chiplog/11_round4.log
{
  echo "=== adaptive gamma (gamma=-1) noise 0.01 [$(date -u +%H:%M:%S)] ==="
  timeout 1800 python bench.py --gamma -1 --draft-noise 0.01
  echo "=== adaptive gamma (gamma=-1) noise 0.02 (CNNDM-like) [$(date -u +%H:%M:%S)] ==="
  timeout 1800 python bench.py --gamma -1 --draft-noise 0.02
  echo "=== moe row (round-4 one-hot dispatch/combine) [$(date -u +%H:%M:%S)] ==="
  timeout 1800 python bench.py --moe
  echo "CAMPAIGN1_DONE [$(date -u +%H:%M:%S)]"
} >> "$L" 2>&1
