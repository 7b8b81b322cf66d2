#!/usr/bin/env bash
# Canonical reproduction recipe (counterpart of the reference's
# benchmark/bench_example.sh): one command per README headline row.
# Each prints ONE JSON line {"metric", "value", ...}. Runs on whatever
# JAX backend is available (the real chip through the axon tunnel here;
# pass --cpu for a CPU sanity run).
#
# Cold-compile note: the first run of a given shape pays the remote
# compiler (minutes); the persistent cache (.jax_cache/, set up by the
# engine itself) makes every repeat run fast.
set -euo pipefail
cd "$(dirname "$0")/.."

row="${1:-headline}"

case "$row" in
  headline)
    # 3L/36L layer-share pair, bs=32, gamma=14: the README headline.
    # Acceptance ceiling (target == draft logits bitwise), like the
    # reference's bench.py fixed-step protocol at its best-case MAT.
    exec python bench.py ;;
  mat20|mat9|mat4)
    # Realistic acceptance: gaussian noise on the draft's layer weights
    # de-aligns it from the target (MAT ~20 / ~9 / ~4 — the reference's
    # AIME / HumanEval / CNNDM regimes, docs/bench_summary.md:3-34).
    declare -A eps=([mat20]=0.02 [mat9]=0.05 [mat4]=0.12)
    exec python bench.py --draft-noise "${eps[$row]}" ;;
  moe)
    # sparse-MoE pair (Qwen3-MoE-style routing), 8 experts top-2
    exec python bench.py --moe ;;
  int8kv)
    # INT8 KV cache with in-kernel dequant paged attention
    exec python bench.py --kv-quant int8 ;;
  int8w)
    # INT8 weight-only quantization on both models
    exec python bench.py --quant int8 ;;
  quick)
    # 2-minute smoke (tiny shapes)
    exec python bench.py --quick ;;
  serve)
    # continuous-batching goodput under Poisson arrivals
    exec python benchmark/bench_serve.py ;;
  *)
    echo "usage: $0 [headline|mat20|mat9|mat4|moe|int8kv|int8w|quick|serve]" >&2
    exit 2 ;;
esac
