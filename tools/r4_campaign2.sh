#!/bin/bash
# Round-4 measurement campaign 2 (take 2): the four real reference
# datasets (offline-tokenized by tools/tokenize_datasets.py), bs in
# {8, 32}, realistic acceptance (draft-noise 0.005), FIXED gamma=14 —
# the round-3 synthetic protocol. (Take 1 used the harness's gamma=-1
# default: the eval context seeds gamma from compile-contaminated
# profiling and 100 fixed rounds cannot climb the ladder — MAT 1.8-2.4,
# speedups 0.2-0.6x. bench.py's adaptive warmup loop is the supported
# gamma=-1 entry point; the dataset harness measures at fixed gamma.)
cd /root/repo || exit 1
L=tools/chiplog/12_datasets.log
run() {
  echo "=== $* [$(date -u +%H:%M:%S)] ==="
  timeout 1800 python benchmark/eval_benchmark.py --layer-share 3,36 \
    --token-ids --draft-noise 0.005 --gamma 14 --num-pearl-steps 28 -ar "$@"
}
{
  echo "--- take 2: fixed gamma=14, steps 28 (round-3 synthetic protocol) ---"
  for ds in HumanEval AIME GSM8K CNNDM; do
    run --data-path "benchmark/data/${ds}.tokens.jsonl" -bs 32 --num-samples 64
  done
  for ds in HumanEval AIME GSM8K CNNDM; do
    run --data-path "benchmark/data/${ds}.tokens.jsonl" -bs 8 --num-samples 32
  done
  echo "CAMPAIGN2_DONE [$(date -u +%H:%M:%S)]"
} >> "$L" 2>&1
