#!/bin/bash
# Round-4 measurement campaign 2: the four real reference datasets
# (offline-tokenized to token-id JSONL by tools/tokenize_datasets.py),
# bs in {8, 32}, realistic acceptance (draft-noise 0.005), adaptive
# gamma (eval harness default gamma=-1).
cd /root/repo || exit 1
L=tools/chiplog/12_datasets.log
run() {
  echo "=== $* [$(date -u +%H:%M:%S)] ==="
  timeout 1800 python benchmark/eval_benchmark.py --layer-share 3,36 \
    --token-ids --draft-noise 0.005 -ar "$@"
}
{
  for ds in HumanEval AIME GSM8K CNNDM; do
    run --data-path "benchmark/data/${ds}.tokens.jsonl" -bs 32 --num-samples 64
  done
  for ds in HumanEval AIME GSM8K CNNDM; do
    run --data-path "benchmark/data/${ds}.tokens.jsonl" -bs 8 --num-samples 32
  done
  echo "CAMPAIGN2_DONE [$(date -u +%H:%M:%S)]"
} >> "$L" 2>&1
