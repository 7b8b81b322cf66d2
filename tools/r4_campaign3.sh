#!/bin/bash
# Round-4 measurement campaign 3: serving goodput under Poisson
# arrivals (VERDICT r3 item 9) — three offered rates at the bitwise
# ceiling plus one realistic-acceptance rate, 64 requests each.
cd /root/repo || exit 1
L=tools/chiplog/13_serve.log
{
  for rate in 4 8 16; do
    echo "=== serve rate=${rate} ceiling [$(date -u +%H:%M:%S)] ==="
    timeout 1800 python benchmark/bench_serve.py --rate "$rate"
  done
  echo "=== serve rate=8 noise 0.005 [$(date -u +%H:%M:%S)] ==="
  timeout 1800 python benchmark/bench_serve.py --rate 8 --draft-noise 0.005
  echo "CAMPAIGN3_DONE [$(date -u +%H:%M:%S)]"
} >> "$L" 2>&1
