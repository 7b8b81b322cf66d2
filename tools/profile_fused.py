"""Decompose fused-PEARL round cost on the local chip.

Times, for each gamma in --gammas:
  - draft gamma-scan alone (gamma decode steps, 3L draft)
  - target packed verify forward alone (B*gamma rows, 18L target)
  - verdict alone
  - one full fused round (num_rounds=1 marginal: 25 rounds minus 5)
  - one AR step (marginal)

Usage: python tools/profile_fused.py [--gammas 6,8,10,12] [--batch 32]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, *args, iters=10, warmup=2):
    import jax

    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--gammas", type=str, default="6,8,10,12")
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--target-layers", type=int, default=18)
    p.add_argument("--block-size", type=int, default=64)
    p.add_argument("--steps-hi", type=int, default=25)
    p.add_argument("--steps-lo", type=int, default=5)
    args = p.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/nano_pearl_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    import jax.numpy as jnp

    import bench as benchmod
    from nano_pearl_tpu import PearlEngine
    from nano_pearl_tpu.config import PearlConfig, SamplingParams

    b = args.batch
    gammas = [int(g) for g in args.gammas.split(",")]

    # replicate bench.py default shapes
    class A:
        hidden, ffn, heads, kv_heads = 1024, 4096, 16, 2
        vocab = 32768
        draft_layers, target_layers = 3, args.target_layers
        prompt_len = 64
        seed = 0

    from nano_pearl_tpu.config import ModelConfig

    def mc(layers):
        return ModelConfig(
            architecture="LlamaForCausalLM",
            hidden_size=A.hidden,
            intermediate_size=A.ffn,
            num_hidden_layers=layers,
            num_attention_heads=A.heads,
            num_key_value_heads=A.kv_heads,
            vocab_size=A.vocab,
            eos_token_id=1,
            dtype="bfloat16",
            max_position_embeddings=2048,
        )

    dmc, tmc = mc(A.draft_layers), mc(A.target_layers)
    dparams, tparams = benchmod.build_layer_share_pair(dmc, tmc, A.seed)

    max_len = 2048
    cfg = PearlConfig(
        draft_model=dmc,
        target_model=tmc,
        max_model_len=max_len,
        max_num_batched_tokens=max(16384, b * A.prompt_len),
        kvcache_block_size=args.block_size,
        num_kvcache_blocks=b * (max_len // args.block_size) + 8,
        gamma=gammas[0],
        max_num_seqs=max(b, 8),
        seed=0,
    )
    engine = PearlEngine(cfg, draft_params=dparams, target_params=tparams)
    fused = engine.orchestrator.fused
    assert fused is not None
    rng = np.random.default_rng(0)

    def fill(n=b):
        for _ in range(n):
            prompt = rng.integers(2, A.vocab - 1, A.prompt_len).tolist()
            engine.add_request(
                prompt,
                SamplingParams(
                    temperature=0.0,
                    max_tokens=max_len - A.prompt_len - 8,
                    ignore_eos=True,
                ),
            )

    # --- AR marginal
    fill()
    engine.orchestrator.prefill_all(target_only=True)
    seqs = list(engine.scheduler.running)
    for s_ in seqs:
        s_.max_tokens = 2**30
    engine.scheduler.schedule_decode(
        lookahead=lambda s: 2 * args.steps_hi + 8, strict=False,
        ar_only=True,
    )
    state = engine.orchestrator._build_fused_state(seqs, ar_only=True)
    # run_* donate the state arrays: hand each call a fresh device copy
    # (the copy cost is fixed per call and cancels in the hi-lo margin)
    import jax as _jax

    def _st(st):
        return {
            k: (jnp.copy(v) if isinstance(v, _jax.Array) else v)
            for k, v in st.items()
        }

    t_lo = timeit(lambda: fused.run_ar(_st(state), args.steps_lo, 1), iters=3)
    t_hi = timeit(lambda: fused.run_ar(_st(state), args.steps_hi, 1), iters=3)
    ar_step = (t_hi - t_lo) / (args.steps_hi - args.steps_lo)
    print(f"AR marginal step: {ar_step*1e3:.2f} ms "
          f"({b/ar_step:.0f} tok/s marginal)")
    engine.scheduler.clear()

    # --- components per gamma
    draft, target = fused.draft, fused.target
    for gamma in gammas:
        fill()
        engine.orchestrator.prefill_all()
        seqs = list(engine.scheduler.running)
        for s_ in seqs:
            s_.max_tokens = 2**30
        engine.scheduler.schedule_decode(
            lookahead=lambda s: args.steps_hi * gamma + 2 * gamma + 8,
            strict=False,
        )
        state = engine.orchestrator._build_fused_state(seqs)
        tokens = state["tokens"]
        length = state["length"]
        bt_d, bt_t = state["bt_d"], state["bt_t"]

        last = jnp.take_along_axis(tokens, jnp.clip(length - 1, 0)[:, None], axis=1)[:, 0]

        dscan = jax.jit(
            lambda dp, dr, kv, lt, pos, bt, cl: fused._draft_gamma(
                dp, dr, kv, lt, pos, bt, cl, gamma
            )
        )
        t_draft = timeit(
            dscan, draft.params, draft.rope_table, draft.kv, last, length - 1, bt_d, length
        )

        num_input = jnp.full((b,), gamma, jnp.int32)
        tver = jax.jit(
            lambda tp, tr, kv, tok, ln, ni, bt: fused._target_packed(
                tp, tr, kv, tok, ln, ni, bt, gamma
            )
        )
        t_verify = timeit(
            tver, target.params, target.rope_table, target.kv, tokens, length, num_input, bt_t
        )

        # full fused marginal round
        t_lo = timeit(lambda: fused.run_pearl(_st(state), gamma, args.steps_lo, 1), iters=3)
        t_hi = timeit(lambda: fused.run_pearl(_st(state), gamma, args.steps_hi, 1), iters=3)
        t_round = (t_hi - t_lo) / (args.steps_hi - args.steps_lo)

        committed = (gamma + 1) * b
        print(
            f"gamma={gamma:2d}: draft_scan={t_draft*1e3:7.2f} ms  "
            f"verify_fwd={t_verify*1e3:7.2f} ms  "
            f"round_marginal={t_round*1e3:7.2f} ms  "
            f"-> {committed/t_round:7.0f} tok/s marginal  "
            f"(speedup vs AR marginal: {(committed/t_round)/(b/ar_step):.2f}x)"
        )
        engine.scheduler.clear()


if __name__ == "__main__":
    main()
