"""Scaling-curve benchmark: tokens/s vs device count (north-star: "tokens/s
scaling efficiency measured at 1 chip, 1 host, N>=2 hosts").

Sweeps data-parallel replica counts (and optionally TP widths) over the
available devices and prints one JSON line per configuration:

    {"devices": D, "dp": R, "draft_tp": dt, "target_tp": tt,
     "pearl_tok_s": ..., "scaling_efficiency": tok_s / (R * tok_s_dp1)}

On real hardware the curve is meaningful; on a virtual CPU mesh
(XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu)
it validates that every configuration builds, shards, and produces
correct output — the same sweep then runs unchanged on a pod slice.
Multi-host: run under jax.distributed (parallel/distributed.py); devices
are the global device list.

Example (virtual mesh):
    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
    NANO_PEARL_PALLAS=0 JAX_PLATFORMS=cpu \
    python tools/scale_bench.py --quick --dp-list 1,2,4
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_args():
    p = argparse.ArgumentParser(description="nano-pearl-tpu scaling sweep")
    p.add_argument("--dp-list", type=str, default="1,2")
    p.add_argument("--draft-tp", type=int, default=1)
    p.add_argument("--target-tp", type=int, default=1)
    p.add_argument("--batch-per-replica", type=int, default=8)
    p.add_argument("--gamma", type=int, default=4)
    p.add_argument("--steps", type=int, default=20)
    p.add_argument("--prompt-len", type=int, default=32)
    p.add_argument("--quick", action="store_true", help="tiny models")
    p.add_argument("--hidden", type=int, default=1024)
    p.add_argument("--ffn", type=int, default=4096)
    p.add_argument("--heads", type=int, default=16)
    p.add_argument("--kv-heads", type=int, default=2)
    p.add_argument("--vocab", type=int, default=32768)
    p.add_argument("--draft-layers", type=int, default=3)
    p.add_argument("--target-layers", type=int, default=18)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument(
        "--cpu",
        action="store_true",
        help="force the CPU backend (the axon sitecustomize overrides "
        "JAX_PLATFORMS, so the env var alone is not enough)",
    )
    return p.parse_args()


def main():
    args = parse_args()
    if args.quick:
        args.hidden, args.ffn, args.heads, args.kv_heads = 128, 256, 4, 2
        args.vocab = 512
        args.draft_layers, args.target_layers = 2, 4

    import jax

    if args.cpu or os.environ.get("JAX_PLATFORMS") == "cpu":
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/nano_pearl_jax_cache")

    import bench as benchmod
    from nano_pearl_tpu.config import ModelConfig, PearlConfig, SamplingParams
    from nano_pearl_tpu.engine.dp import DataParallelEngine

    def mc(layers):
        return ModelConfig(
            architecture="LlamaForCausalLM",
            hidden_size=args.hidden,
            intermediate_size=args.ffn,
            num_hidden_layers=layers,
            num_attention_heads=args.heads,
            num_key_value_heads=args.kv_heads,
            vocab_size=args.vocab,
            eos_token_id=1,
            dtype="float32" if jax.default_backend() == "cpu" else "bfloat16",
            max_position_embeddings=2048,
        )

    dmc, tmc = mc(args.draft_layers), mc(args.target_layers)
    dparams, tparams = benchmod.build_layer_share_pair(dmc, tmc, args.seed)
    max_tokens = args.steps * (args.gamma + 1) + 8
    max_len = max(256, 1 << (args.prompt_len + max_tokens + 64).bit_length())
    rng = np.random.default_rng(args.seed)

    base_tok_s = None
    for dp in [int(x) for x in args.dp_list.split(",")]:
        cfg = PearlConfig(
            draft_model=dmc,
            target_model=tmc,
            draft_tp=args.draft_tp,
            target_tp=args.target_tp,
            max_model_len=max_len,
            max_num_batched_tokens=max(512, args.batch_per_replica * args.prompt_len),
            kvcache_block_size=64,
            num_kvcache_blocks=args.batch_per_replica * (max_len // 64) + 8,
            gamma=args.gamma,
            max_num_seqs=max(args.batch_per_replica, 4),
            seed=args.seed,
        )
        eng = DataParallelEngine(cfg, dp, draft_params=dparams, target_params=tparams)

        def fill():
            for _ in range(dp * args.batch_per_replica):
                ids = rng.integers(2, args.vocab - 1, args.prompt_len).tolist()
                eng.add_request(
                    ids,
                    SamplingParams(
                        temperature=0.0, max_tokens=max_tokens, ignore_eos=True
                    ),
                )

        fill()  # warmup (compiles)
        eng.generate_token_ids()
        fill()
        token_ids, n_tok, _, elapsed = eng.generate_token_ids()
        tok_s = sum(n_tok) / elapsed
        if base_tok_s is None:
            base_tok_s = tok_s / dp  # per-replica baseline
        eff = tok_s / (dp * base_tok_s)
        print(
            json.dumps(
                {
                    "devices": len(jax.devices()),
                    "dp": dp,
                    "draft_tp": args.draft_tp,
                    "target_tp": args.target_tp,
                    "batch_total": dp * args.batch_per_replica,
                    "pearl_tok_s": round(tok_s, 1),
                    "scaling_efficiency": round(eff, 3),
                    "backend": jax.default_backend(),
                }
            )
        )


if __name__ == "__main__":
    main()
