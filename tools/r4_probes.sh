#!/bin/bash
# Ceiling divergence probes at the two batch sizes whose MAT still
# leaks (bs=1: 9.4, bs=32: 12.15 vs the exact 14.0 at bs=8/16).
cd /root/repo || exit 1
L=tools/chiplog/14_longprompt_probes.log
{
  echo "=== ceiling divergence probe bs=1 [$(date -u +%H:%M:%S)] ==="
  timeout 1500 python tools/probe_ceiling_divergence2.py --batch 1
  echo "=== ceiling divergence probe bs=8 (control; engine MAT exact) [$(date -u +%H:%M:%S)] ==="
  timeout 1500 python tools/probe_ceiling_divergence2.py --batch 8
  echo "=== ceiling divergence probe bs=32 [$(date -u +%H:%M:%S)] ==="
  timeout 1500 python tools/probe_ceiling_divergence2.py --batch 32
  echo "PROBES_DONE [$(date -u +%H:%M:%S)]"
} >> "$L" 2>&1
