#!/bin/bash
# Adaptive-gamma noise-0.02 retry with the EMPIRICAL per-gamma commit
# scorer (commit "Empirical per-gamma acceptance...") — the geometric
# model had ranked gamma 2 over the measured-better 4.
cd /root/repo || exit 1
L=tools/chiplog/11_round4.log
{
  echo "=== adaptive gamma RETRY-2 (empirical commits) noise 0.02 [$(date -u +%H:%M:%S)] ==="
  timeout 2400 python bench.py --gamma -1 --draft-noise 0.02
  echo "CAMPAIGN6_DONE [$(date -u +%H:%M:%S)]"
} >> "$L" 2>&1
