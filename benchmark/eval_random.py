"""Synthetic fixed-length benchmark (reference: benchmark/eval_random.py):
random token-id prompts of --input-len, PEARL vs AR."""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def parse_args():
    p = argparse.ArgumentParser(description="nano-pearl-tpu random-prompt eval")
    p.add_argument("--draft-model", "-d", default=None)
    p.add_argument("--target-model", "-t", default=None)
    p.add_argument(
        "--layer-share", action="store_true",
        help="no checkpoints: bench.py's synthetic layer-share pair "
        "(3L draft / 36L target, MAT == gamma at T=0)",
    )
    p.add_argument("--draft-layers", type=int, default=3)
    p.add_argument("--target-layers", type=int, default=36)
    p.add_argument("--draft-tp", type=int, default=1)
    p.add_argument("--target-tp", type=int, default=1)
    p.add_argument("--input-len", type=int, default=128)
    p.add_argument("--batch-size", "-bs", type=int, default=8)
    p.add_argument("--num-pearl-steps", type=int, default=100)
    p.add_argument("--gamma", type=int, default=-1)
    p.add_argument("--run-ar-benchmark", "-ar", action="store_true")
    p.add_argument("--max-model-len", type=int, default=4096)
    p.add_argument("--max-tokens", type=int, default=256)
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
    p.add_argument("--cpu", action="store_true", help="force CPU backend")
    return p.parse_args()


def main():
    args = parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    from nano_pearl_tpu import PearlConfig, PearlEngine, SamplingParams, logger

    dparams = tparams = None
    if args.layer_share:
        import bench as benchmod
        from nano_pearl_tpu.config import ModelConfig

        def mc(layers):
            return ModelConfig(
                architecture="LlamaForCausalLM", hidden_size=1024,
                intermediate_size=4096, num_hidden_layers=layers,
                num_attention_heads=16, num_key_value_heads=2,
                vocab_size=32768, eos_token_id=1,
                dtype="float32" if args.cpu else "bfloat16",
                max_position_embeddings=max(2048, args.max_model_len),
            )

        draft_model, target_model = mc(args.draft_layers), mc(args.target_layers)
        dparams, tparams = benchmod.build_layer_share_pair(
            draft_model, target_model, args.seed
        )
    else:
        assert args.draft_model and args.target_model, (
            "--draft-model/--target-model required without --layer-share"
        )
        draft_model, target_model = args.draft_model, args.target_model

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
    )
    engine = PearlEngine(config, draft_params=dparams, target_params=tparams)
    vocab = engine.config.target_config.valid_vocab_size
    rng = np.random.default_rng(args.seed)

    def add_batch():
        for _ in range(args.batch_size):
            ids = rng.integers(2, vocab - 1, args.input_len).tolist()
            engine.add_request(
                ids,
                SamplingParams(
                    temperature=0.0, max_tokens=args.max_tokens, ignore_eos=True
                ),
            )

    add_batch()
    _, n_tok, acc, t = engine.bench_generate(num_pearl_steps=args.num_pearl_steps)
    mat = float(np.mean([sum(a) / max(1, len(a)) for a in acc]))
    pearl_tps = sum(n_tok) / t
    result = {
        "input_len": args.input_len,
        "batch": args.batch_size,
        "pearl_tok_s": round(pearl_tps, 2),
        "mat": round(mat, 2),
    }
    if args.run_ar_benchmark:
        add_batch()
        _, ar_tok, _, ar_t = engine.AR_generate_token_ids()
        ar_tps = sum(ar_tok) / ar_t
        result["ar_tok_s"] = round(ar_tps, 2)
        result["speedup"] = round(pearl_tps / ar_tps, 2)
    logger.info(str(result))
    print(json.dumps(result))


if __name__ == "__main__":
    main()
