"""Continuous-batching serving benchmark: goodput under request arrivals.

The reference has no serving story at all (continuous batching is a TODO,
reference: README.md:110); its benchmarks measure static batches only
(bench.py, benchmark/eval_benchmark.py). This harness drives the
engine's submit/serve_step API the way a production front-end does:
requests arrive over time (deterministic exponential/Poisson
inter-arrival gaps), join the running batch mid-flight, and finish
independently — and reports the serving metrics that matter:

  - request throughput (req/s) and token goodput (committed tok/s)
  - TTFT / TPOT / end-to-end latency p50/p95 (engine.stats percentiles)
  - mean batch occupancy (how full the continuous batch actually runs)

Usage (layer-share weightless pair, like bench.py):
  python benchmark/bench_serve.py --cpu --quick
  python benchmark/bench_serve.py --rate 8 --requests 64 --batch-cap 32

Prints ONE JSON line like bench.py for scripted consumption.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def parse_args():
    p = argparse.ArgumentParser(description="nano-pearl-tpu serving benchmark")
    p.add_argument("--quick", action="store_true", help="tiny shapes, smoke test")
    p.add_argument("--rate", type=float, default=8.0,
                   help="mean request arrival rate (req/s)")
    p.add_argument("--requests", type=int, default=64)
    p.add_argument("--prompt-len", type=int, default=64)
    p.add_argument("--max-tokens", type=int, default=128)
    p.add_argument("--gamma", type=int, default=8)
    p.add_argument("--fused-rounds", type=int, default=4)
    p.add_argument("--batch-cap", type=int, default=32, help="max_num_seqs")
    p.add_argument("--hidden", type=int, default=1024)
    p.add_argument("--ffn", type=int, default=4096)
    p.add_argument("--heads", type=int, default=16)
    p.add_argument("--kv-heads", type=int, default=2)
    p.add_argument("--vocab", type=int, default=32768)
    p.add_argument("--draft-layers", type=int, default=3)
    p.add_argument("--target-layers", type=int, default=36)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument(
        "--draft-noise", type=float, default=0.0,
        help="relative gaussian noise on the draft's layer weights "
        "(realistic acceptance; see bench.py --draft-noise)",
    )
    p.add_argument("--cpu", action="store_true")
    p.add_argument(
        "--profile", choices=["ceiling", "throughput"], default=None,
        help="kernel-schedule profile override (see PearlConfig.perf_profile)",
    )
    return p.parse_args()


def _start_stall_watchdog():
    """Tunnel-stall re-exec (same machinery as bench.py): the axon
    tunnel freezes mid-RPC for 10-25 min and killed every round-4
    rate=16 run inside its window. No progress for the limit -> re-exec
    with a fresh JAX client and the warm compile cache."""
    if os.environ.get("NANO_PEARL_BENCH_WATCHDOG", "1") != "1":
        return

    import threading

    limit = int(os.environ.get("NANO_PEARL_BENCH_STALL_LIMIT", "600"))

    def watch():
        while True:
            time.sleep(20)
            idle = time.monotonic() - _PROGRESS[0]
            if idle > limit:
                attempt = int(os.environ.get("NANO_PEARL_SERVE_ATTEMPT", "0"))
                if attempt >= 2:
                    print(
                        f"[bench_serve] watchdog: stalled {idle:.0f} s on the "
                        "last attempt; giving up", file=sys.stderr, flush=True,
                    )
                    os._exit(3)
                print(
                    f"[bench_serve] watchdog: no progress in {idle:.0f} s "
                    "(tunnel stall); re-exec'ing", file=sys.stderr, flush=True,
                )
                os.environ["NANO_PEARL_SERVE_ATTEMPT"] = str(attempt + 1)
                os.execv(sys.executable, [sys.executable] + sys.argv)

    threading.Thread(target=watch, daemon=True, name="serve-stall-watchdog").start()


_PROGRESS = [time.monotonic()]


def _touch_progress():
    _PROGRESS[0] = time.monotonic()


def _retryable(e: BaseException) -> bool:
    s = f"{type(e).__name__}: {e}"
    return (
        "UNAVAILABLE" in s
        or "worker process crashed" in s
        or "remote_compile" in s
    )


def main():
    try:
        return _main_inner()
    except Exception as e:  # noqa: BLE001 — retry only known transients
        attempt = int(os.environ.get("NANO_PEARL_SERVE_ATTEMPT", "0"))
        if not _retryable(e) or attempt >= 2:
            raise
        print(
            f"[bench_serve] attempt {attempt + 1}/3 hit a transient backend "
            f"error ({type(e).__name__}); re-exec'ing in 60 s",
            file=sys.stderr, flush=True,
        )
        time.sleep(60)
        os.environ["NANO_PEARL_SERVE_ATTEMPT"] = str(attempt + 1)
        os.execv(sys.executable, [sys.executable] + sys.argv)


def _main_inner():
    args = parse_args()
    _start_stall_watchdog()
    if args.quick:
        args.hidden, args.ffn, args.heads, args.kv_heads = 256, 512, 4, 2
        args.vocab, args.draft_layers, args.target_layers = 2048, 2, 4
        args.requests = min(args.requests, 12)
        args.max_tokens = min(args.max_tokens, 32)
        args.rate = min(args.rate, 50.0)
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    from nano_pearl_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()

    import bench as benchmod
    from nano_pearl_tpu import PearlEngine
    from nano_pearl_tpu.config import ModelConfig, PearlConfig, SamplingParams

    def mc(layers):
        return ModelConfig(
            architecture="LlamaForCausalLM", hidden_size=args.hidden,
            intermediate_size=args.ffn, num_hidden_layers=layers,
            num_attention_heads=args.heads, num_key_value_heads=args.kv_heads,
            vocab_size=args.vocab, eos_token_id=1,
            dtype="float32" if args.cpu else "bfloat16",
            max_position_embeddings=4096,
        )

    draft, target = mc(args.draft_layers), mc(args.target_layers)
    dparams, tparams = benchmod.build_layer_share_pair(
        draft, target, args.seed, args.draft_noise
    )
    cfg = PearlConfig(
        draft_model=draft, target_model=target, draft_tp=1, target_tp=1,
        max_model_len=2048, max_num_seqs=args.batch_cap, gamma=args.gamma,
        seed=args.seed,
        perf_profile=args.profile
        or ("throughput" if args.draft_noise else "ceiling"),
    )
    eng = PearlEngine(cfg, draft_params=dparams, target_params=tparams)

    rng = np.random.default_rng(args.seed)
    prompts = [
        [int(t) for t in rng.integers(2, args.vocab - 1, size=args.prompt_len)]
        for _ in range(args.requests)
    ]
    gaps = rng.exponential(1.0 / args.rate, size=args.requests)
    params = SamplingParams(
        temperature=0.0, max_tokens=args.max_tokens, ignore_eos=True
    )

    # warmup: compile every program shape the serve loop will hit. A
    # full batch-cap of requests with STAGGERED max_tokens drains the
    # running batch through every decode bucket (32 -> 16 -> 8 -> ...),
    # so no fused-chunk program compiles inside the timed window (a
    # single-request warmup left the larger buckets cold and their
    # first-hit compiles polluted TTFT/goodput).
    for i in range(args.batch_cap):
        eng.submit(
            prompts[i % len(prompts)],
            SamplingParams(
                temperature=0.0,
                max_tokens=8 + 8 * (i % max(1, args.batch_cap // 4)),
                ignore_eos=True,
            ),
        )
    while eng.has_work:
        eng.serve_step(args.fused_rounds)
    # low-rate arrivals admit 1-2 requests at a time: compile the SMALL
    # prefill buckets too (the batch-cap drain above only covers decode
    # buckets on the way down — a cold single-request prefill inside the
    # timed window showed up as 8-13 s TTFT p95 at rate=4, chiplog 22)
    for k in (1, 2):
        for i in range(k):
            eng.submit(prompts[i], SamplingParams(
                temperature=0.0, max_tokens=8, ignore_eos=True))
        while eng.has_work:
            eng.serve_step(args.fused_rounds)
    eng.scheduler.finished.clear()
    eng._lat.clear()  # warmup's compile-inflated latency must not skew percentiles

    # ---- timed serving run: arrivals interleave with serve_step ----
    t0 = time.perf_counter()
    arrivals = np.cumsum(gaps)  # seconds after t0
    next_req = 0
    completed = 0
    tokens_out = 0
    occupancy = []
    while completed < args.requests:
        now = time.perf_counter() - t0
        while next_req < args.requests and arrivals[next_req] <= now:
            eng.submit(prompts[next_req], params)
            next_req += 1
        if not eng.has_work:
            if next_req < args.requests:  # idle until the next arrival
                time.sleep(max(0.0, arrivals[next_req] - (time.perf_counter() - t0)))
            continue
        done, _ = eng.serve_step(args.fused_rounds, with_deltas=True)
        _touch_progress()  # each completed serve_step resets the stall watchdog
        occupancy.append(len(eng.scheduler.running) + len(done))
        for _sid, toks, _acc in done:
            completed += 1
            tokens_out += len(toks)
    elapsed = time.perf_counter() - t0

    stats = eng.stats()
    result = {
        "metric": "serving_goodput",
        "value": round(tokens_out / elapsed, 1),
        "unit": "tok/s",
        "vs_baseline": None,  # the reference cannot run this workload at all
        "req_per_s": round(completed / elapsed, 2),
        "offered_rate": args.rate,
        "requests": completed,
        "mean_batch_occupancy": round(float(np.mean(occupancy)), 1),
        "ttft_p50_s": stats.get("ttft_p50_s"),
        "ttft_p95_s": stats.get("ttft_p95_s"),
        "tpot_p50_s": stats.get("tpot_p50_s"),
        "e2e_p95_s": stats.get("e2e_p95_s"),
        "draft_noise": args.draft_noise,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
