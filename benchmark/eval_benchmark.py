"""Dataset evaluation harness (reference: benchmark/eval_benchmark.py).

Runs PEARL and the AR baseline over a JSONL dataset in the reference's
format — one object per line: {"question_id", "category", "turns":
[prompt, ...]} (HumanEval / CNNDM / AIME / GSM8K ship in that shape) —
and reports throughput, MAT and speedup per batch.

Text prompts need a tokenizer in the target checkpoint dir; with
--token-ids the turns are treated as pre-tokenized id lists instead.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

import numpy as np


def parse_args():
    p = argparse.ArgumentParser(description="nano-pearl-tpu dataset eval")
    p.add_argument("--draft-model", "-d", default=None)
    p.add_argument("--target-model", "-t", default=None)
    p.add_argument(
        "--layer-share", type=str, default=None, metavar="DL,TL",
        help="weightless mode: build an in-memory layer-share pair with "
        "DL draft / TL target layers instead of loading checkpoints "
        "(bench.py's default scenario; use with --token-ids datasets)",
    )
    p.add_argument(
        "--draft-noise", type=float, default=0.0,
        help="layer-share mode: relative gaussian noise on the draft's "
        "layer weights (realistic acceptance; see bench.py --draft-noise)",
    )
    p.add_argument("--draft-tp", type=int, default=1)
    p.add_argument("--target-tp", type=int, default=1)
    p.add_argument("--data-path", required=True, help="JSONL dataset")
    p.add_argument("--num-samples", type=int, default=100)
    p.add_argument("--batch-size", "-bs", type=int, default=8)
    p.add_argument("--temperature", type=float, default=0.0)
    p.add_argument("--max-tokens", type=int, default=200)
    p.add_argument("--num-pearl-steps", type=int, default=100)
    p.add_argument("--gamma", type=int, default=-1)
    p.add_argument("--run-ar-benchmark", "-ar", action="store_true")
    p.add_argument(
        "--no-warmup", dest="warmup", action="store_false",
        help="skip the per-batch compile pass (timings then include "
        "compiles for any cold program)",
    )
    p.add_argument("--token-ids", action="store_true", help="turns are id lists")
    p.add_argument("--max-model-len", type=int, default=4096)
    p.add_argument(
        "--quant", type=str, default=None, choices=["int8", "fp8"],
        help="weight-only quantization for BOTH model groups "
        "(acceptance-rate parity check: compare MAT vs a bf16 run)",
    )
    p.add_argument(
        "--kv-quant", type=str, default=None, choices=["int8", "fp8"],
        help="KV-cache quantization for BOTH model groups",
    )
    p.add_argument("--seed", type=int, default=0)
    p.add_argument(
        "--profile", choices=["ceiling", "throughput"], default=None,
        help="kernel-schedule profile override (default: throughput when "
        "noise/checkpoints set acceptance, else ceiling; the round-5 "
        "split schedule makes ceiling run at deferred speed, so noisy "
        "runs may prefer it too)",
    )
    p.add_argument("--cpu", action="store_true", help="force CPU backend")
    return p.parse_args()


def load_dataset(path: str, limit: int):
    rows = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            rows.append(json.loads(line))
            if len(rows) >= limit:
                break
    return rows


def main():
    args = parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    from nano_pearl_tpu import PearlConfig, PearlEngine, SamplingParams, logger

    dparams = tparams = None
    draft_model, target_model = args.draft_model, args.target_model
    if args.layer_share:
        import sys as _sys

        _sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
        import bench as benchmod
        from nano_pearl_tpu.config import ModelConfig

        dl, tl = (int(x) for x in args.layer_share.split(","))

        def mc(layers):
            return ModelConfig(
                architecture="LlamaForCausalLM", hidden_size=1024,
                intermediate_size=4096, num_hidden_layers=layers,
                num_attention_heads=8, num_key_value_heads=2,
                vocab_size=32768, eos_token_id=1,
                dtype="float32" if args.cpu else "bfloat16",
                max_position_embeddings=args.max_model_len,
            )

        draft_model, target_model = mc(dl), mc(tl)
        dparams, tparams = benchmod.build_layer_share_pair(
            draft_model, target_model, args.seed, args.draft_noise
        )
    else:
        assert draft_model and target_model, "pass -d/-t or --layer-share"

    config = PearlConfig(
        draft_model=draft_model,
        target_model=target_model,
        draft_tp=args.draft_tp,
        target_tp=args.target_tp,
        max_model_len=args.max_model_len,
        gamma=args.gamma,
        seed=args.seed,
        draft_quant=args.quant, target_quant=args.quant,
        draft_kv_quant=args.kv_quant, target_kv_quant=args.kv_quant,
        # divergence-driven acceptance (real checkpoints / noisy draft)
        # -> the faster kernel schedule; bitwise layer-share ceiling ->
        # the acceptance-maximizing one (see PearlConfig.perf_profile)
        perf_profile=args.profile or (
            "throughput" if (args.draft_noise or args.draft_model) else "ceiling"
        ),
    )
    engine = PearlEngine(config, draft_params=dparams, target_params=tparams)
    rows = load_dataset(args.data_path, args.num_samples)
    prompts = [r["turns"][0] for r in rows]

    if args.gamma == -1 and args.warmup and prompts:
        # Adaptive-gamma settle loop (mirrors bench.py): the speed-ratio
        # seed comes from compile-contaminated profiling dispatches, and
        # one fixed-step run can only climb the ladder a rung or two —
        # without this, default-flag dataset runs measured MAT ~2 at
        # noise levels whose steady-state MAT is ~7. Each iteration also
        # feeds the engine's measured round-time / commit tables, so the
        # timed runs below start at a calibrated gamma with every
        # visited program compiled.
        batch0 = prompts[: args.batch_size]
        stable, prev_g = 0, None
        for _ in range(8):
            for prm in batch0:
                engine.add_request(
                    prm,
                    SamplingParams(
                        temperature=args.temperature, max_tokens=args.max_tokens
                    ),
                )
            engine.bench_generate(num_pearl_steps=24)
            g_now = engine.orchestrator.last_gamma
            stable = stable + 1 if g_now == prev_g else 0
            prev_g = g_now
            if stable >= 2:
                break
        logger.info(f"adaptive warmup settled at gamma {prev_g}")

    results = []
    for start in range(0, len(prompts), args.batch_size):
        batch = prompts[start : start + args.batch_size]
        sp = lambda: SamplingParams(
            temperature=args.temperature, max_tokens=args.max_tokens
        )
        ar_fn = engine.AR_generate_token_ids if args.token_ids else engine.AR_generate

        def run_pearl():
            for prm in batch:
                engine.add_request(prm, sp())
            return engine.bench_generate(num_pearl_steps=args.num_pearl_steps)

        def run_ar():
            for prm in batch:
                engine.add_request(prm, sp())
            return ar_fn()

        if args.warmup:
            # compile pass: each batch's prompt-length bucket compiles new
            # prefill (and possibly fused) programs — measure the SECOND
            # identical run so tok/s reflects steady state, not the
            # compiler (mirrors bench.py's warmup protocol)
            run_pearl()
            if args.run_ar_benchmark:
                run_ar()
        out, n_tok, acc, t = run_pearl()
        # committed-tokens-per-round MAT (same accounting as bench.py):
        # the reference's mean-of-emits degenerates under bench_generate's
        # forced ignore_eos — a fully-accepting sequence emits its acc
        # counter ONCE at the end, reporting the whole run as one round
        mat = [(n - 1) / args.num_pearl_steps for n in n_tok]
        pearl_tps = sum(n_tok) / t
        row = {
            "batch": len(batch),
            "pearl_tok_s": round(pearl_tps, 2),
            "mat": round(float(np.mean(mat)), 2),
        }
        if args.run_ar_benchmark:
            _, ar_tok, _, ar_t = run_ar()
            ar_tps = sum(ar_tok) / ar_t
            row["ar_tok_s"] = round(ar_tps, 2)
            row["speedup"] = round(pearl_tps / ar_tps, 2)
        results.append(row)
        logger.info(f"batch {start // args.batch_size}: {row}")

    agg = {
        "pearl_tok_s": round(float(np.mean([r["pearl_tok_s"] for r in results])), 2),
        "mat": round(float(np.mean([r["mat"] for r in results])), 2),
    }
    if args.run_ar_benchmark:
        agg["ar_tok_s"] = round(float(np.mean([r["ar_tok_s"] for r in results])), 2)
        agg["speedup"] = round(agg["pearl_tok_s"] / agg["ar_tok_s"], 2)
    print(json.dumps({"per_batch": results, "aggregate": agg}))


if __name__ == "__main__":
    main()
