#!/bin/bash
# Round-5 dataset-matched acceptance calibration (VERDICT item 6).
# Stage A (this script, "cal"): map --draft-noise -> engine MAT at
#   bs=32 gamma=14 with bench.py steady-state runs, bracketing the
#   reference's Qwen2.5 bs=32 operating points (BASELINE.md):
#     AIME 13.58 / HumanEval 9.55 / GSM8K 7.26 / CNNDM 3.92
# Stage B ("data"): run the four offline-tokenized reference datasets
#   through benchmark/eval_benchmark.py at the calibrated noises.
set -x
cd "$(dirname "$0")/.."
LOG=tools/chiplog/23_r5_datasets.log
STAGE=${1:-cal}

if [ "$STAGE" = cal ]; then
  {
    for noise in 0.0003 0.001 0.0016 0.0045 0.013; do
      echo "=== cal noise=$noise $(date +%H:%M:%S)"
      timeout 1700 python bench.py --draft-noise "$noise" --profile ceiling
      echo "rc=$?"
    done
    # VERDICT item 3 target rows: the CNNDM-like low-MAT regime with the
    # r5 adaptive-gamma fixes (stale-anchor decay, force_gamma pinning)
    echo "=== noise 0.02 gamma=4 $(date +%H:%M:%S)"
    timeout 1700 python bench.py --draft-noise 0.02 --gamma 4
    echo "rc=$?"
    echo "=== noise 0.02 adaptive $(date +%H:%M:%S)"
    timeout 1700 python bench.py --draft-noise 0.02 --gamma -1
    echo "rc=$?"
    echo "=== cal done $(date +%H:%M:%S)"
  } >> "$LOG" 2>&1
else
  # Stage B fills in after reading stage-A results:
  #   tools/r5_campaign_datasets.sh data AIME_NOISE HE_NOISE GSM_NOISE CNN_NOISE
  A=${2:?aime noise} H=${3:?humaneval noise} G=${4:?gsm8k noise} C=${5:?cnndm noise}
  {
    for pair in "AIME:$A" "HumanEval:$H" "GSM8K:$G" "CNNDM:$C"; do
      ds=${pair%%:*}; noise=${pair##*:}
      echo "=== dataset $ds noise=$noise $(date +%H:%M:%S)"
      timeout 1700 python benchmark/eval_benchmark.py --layer-share 3,36 \
        --data-path "benchmark/data/${ds}.tokens.jsonl" --token-ids \
        -bs 32 --num-samples 64 --gamma 14 --draft-noise "$noise" \
        --profile ceiling -ar
      echo "rc=$?"
    done
    echo "=== data done $(date +%H:%M:%S)"
  } >> "$LOG" 2>&1
fi
