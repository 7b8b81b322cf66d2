#!/bin/bash
# Round-4 measurement campaign 4: synthetic_long re-measure (paged-prefix
# prefill kernel, VERDICT r3 item 5 — round-3 row was 1.21x), ceiling
# divergence probes at bs=1/32 (the two batch sizes whose MAT still
# leaks), and a final headline re-run on the warm cache.
cd /root/repo || exit 1
L=tools/chiplog/14_longprompt_probes.log
{
  echo "=== synthetic_long ceiling bs16 gamma14 (round-3 config; prefix kernel on) [$(date -u +%H:%M:%S)] ==="
  timeout 1800 python benchmark/eval_benchmark.py --layer-share 3,36 --token-ids \
    --data-path benchmark/data/synthetic_long.jsonl -bs 16 --gamma 14 \
    --num-pearl-steps 16 --num-samples 32 -ar
  echo "=== class-boundary probe: bs=32 gamma=7 (verify rows 224) [$(date -u +%H:%M:%S)] ==="
  # If MAT measures the exact 7.0 ceiling, the 448-row verify GEMM
  # schedule class is the whole remaining bs=32 leak (classes {1..4} /
  # {8..224} / {448+}) and a 224-row-chunked verify would close it.
  timeout 2400 python bench.py --batch 32 --gamma 7
  echo "=== headline re-run (warm cache) [$(date -u +%H:%M:%S)] ==="
  timeout 1800 python bench.py
  echo "CAMPAIGN4_DONE [$(date -u +%H:%M:%S)]"
} >> "$L" 2>&1
