#!/bin/bash
# bs=1 ceiling + noise re-run after the min-decode-bucket-8 numerics fix
# (expectation: scan/verify land in the bitwise-exact M>=8 schedule
# class, MAT 9.4 -> 14.0, speedup ~2.85x -> ~4x).
cd /root/repo || exit 1
L=tools/chiplog/10_bs_sweep.log
{
  echo "=== ceiling bs=1 RETRY (min decode bucket 8) [$(date -u +%H:%M:%S)] ==="
  timeout 2400 python bench.py --batch 1
  echo "=== noise0.005 bs=1 RETRY (min decode bucket 8) [$(date -u +%H:%M:%S)] ==="
  timeout 2400 python bench.py --batch 1 --draft-noise 0.005
  echo "CAMPAIGN5_DONE [$(date -u +%H:%M:%S)]"
} >> "$L" 2>&1
