"""Per-round acceptance trace for the split-boundary schedule.

The engine-level split run measures MAT 13.72 of 14.0 (chiplog 20,
run D) while the isolated kernels are bitwise-equal — so ~1 round in 8
rejects somewhere the kernel probe doesn't cover. This probe runs the
OVERLAP path (per-round host sync, same split kernels via
runner.gamma_scan/verify_forward) on the layer-share pair and prints
every round's per-row accepted counts, so the leak's PATTERN is visible:
which round, which rows, after which event (prefill / accept / reject).

Usage (real chip): python tools/probe_split_leak.py [--batch 8]
[--rounds 24] [--no-split]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--gamma", type=int, default=14)
    p.add_argument("--rounds", type=int, default=24)
    p.add_argument("--prompt-len", type=int, default=600)
    p.add_argument("--no-split", action="store_true")
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()
    os.environ["NANO_PEARL_SPLIT"] = "0" if args.no_split else "1"
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from nano_pearl_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()

    from bench import build_layer_share_pair
    from nano_pearl_tpu import PearlEngine
    from nano_pearl_tpu.config import ModelConfig, PearlConfig, SamplingParams

    def mc(layers):
        return ModelConfig(
            architecture="LlamaForCausalLM",
            hidden_size=1024,
            intermediate_size=4096,
            num_hidden_layers=layers,
            num_attention_heads=8,
            num_key_value_heads=2,
            vocab_size=32768,
            eos_token_id=1,
            dtype="float32" if args.cpu else "bfloat16",
            max_position_embeddings=8192,
        )

    draft_model, target_model = mc(3), mc(36)
    dparams, tparams = build_layer_share_pair(draft_model, target_model, 0, 0.0)
    cfg = PearlConfig(
        draft_model=draft_model,
        target_model=target_model,
        max_model_len=4096,
        max_num_batched_tokens=16384,
        kvcache_block_size=256,
        num_kvcache_blocks=args.batch * 16 + 8,
        gamma=args.gamma,
        execution_mode="overlap",  # per-round sync for introspection
        max_num_seqs=max(args.batch, 8),
    )
    engine = PearlEngine(cfg, draft_params=dparams, target_params=tparams)
    orch = engine.orchestrator
    rng = np.random.default_rng(0)
    for i in range(args.batch):
        engine.add_request(
            [int(t) for t in rng.integers(2, 32000, size=args.prompt_len)],
            SamplingParams(temperature=0.0, max_tokens=3400, ignore_eos=True),
        )
    orch.prefill_all()
    g = args.gamma
    for r in range(args.rounds):
        seqs = list(engine.scheduler.running)
        lens0 = {s.seq_id: len(s.target) for s in seqs}
        pre0 = {s.seq_id: s.pre_verify for s in seqs}
        orch.pearl_round(g)
        rows = []
        events = []
        for s in seqs:
            dl = len(s.target) - lens0[s.seq_id]
            tag = "P" if pre0[s.seq_id] else " "
            # dl == g on accept; dl == 1 on pre-accept path start;
            # negative/small on reject (rollback)
            rows.append(f"{tag}{dl:+3d}")
            if dl != g and not (pre0[s.seq_id] and dl == 1):
                L0 = lens0[s.seq_id]
                events.append(
                    f"seq{s.seq_id}: L0={L0} window=[{L0 - g},{L0}) "
                    f"dl={dl} L0%256={L0 % 256} L0%1024={L0 % 1024}"
                )
        print(f"round {r:3d}: " + " ".join(rows), flush=True)
        for e in events:
            print("   REJECT " + e, flush=True)


if __name__ == "__main__":
    main()
