"""Time each host-side phase of a default-shape bench round-trip.

Replicates bench.py's default engine exactly (so compiled programs hit
the persistent cache) and wraps the orchestrator's phases with timers:
add_requests / prefill_all / fused dispatch / device sync / state fetch
/ host postprocess.
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/nano_pearl_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    import bench as benchmod
    from nano_pearl_tpu import PearlEngine
    from nano_pearl_tpu.config import ModelConfig, PearlConfig, SamplingParams

    # exactly bench.py defaults
    batch, gamma, steps, prompt_len, ar_max = 32, 12, 145, 64, 145 * 13
    hidden, ffn, heads, kvh, vocab = 1024, 4096, 16, 2, 32768
    dl, tl, block = 3, 36, 256

    def mc(layers):
        return ModelConfig(
            architecture="LlamaForCausalLM", hidden_size=hidden,
            intermediate_size=ffn, num_hidden_layers=layers,
            num_attention_heads=heads, num_key_value_heads=kvh,
            vocab_size=vocab, eos_token_id=1, dtype="bfloat16",
            max_position_embeddings=2048,
        )

    dmc, tmc = mc(dl), mc(tl)
    dparams, tparams = benchmod.build_layer_share_pair(dmc, tmc, 0)
    max_len = max(256, 1 << (prompt_len + steps * (gamma + 1) + 64).bit_length())
    cfg = PearlConfig(
        draft_model=dmc, target_model=tmc, max_model_len=max_len,
        max_num_batched_tokens=max(16384, batch * prompt_len),
        kvcache_block_size=block,
        num_kvcache_blocks=batch * (max_len // block) + 8,
        gamma=gamma, max_num_seqs=max(batch, 8), seed=0,
    )
    engine = PearlEngine(cfg, draft_params=dparams, target_params=tparams)
    orch = engine.orchestrator
    fused = orch.fused
    rng = np.random.default_rng(0)

    def fill():
        for _ in range(batch):
            prompt = rng.integers(2, vocab - 1, prompt_len).tolist()
            engine.add_request(
                prompt, SamplingParams(temperature=0.0, max_tokens=ar_max, ignore_eos=True)
            )

    # warmup all programs
    fill(); engine.bench_generate(num_pearl_steps=2)
    fill(); engine.AR_generate_token_ids()

    def t(label, fn):
        t0 = time.perf_counter()
        out = fn()
        dt = time.perf_counter() - t0
        print(f"  {label:28s} {dt*1e3:9.1f} ms")
        return out

    for trial in range(2):
        print(f"--- PEARL bench_generate({steps}) trial {trial}")
        t("add_requests", fill)
        t("prefill_all", orch.prefill_all)
        seqs = list(engine.scheduler.running)
        for s in seqs:
            s.max_tokens = 10**9
            s.ignore_eos = True
        state = t("build_fused_state", lambda: orch._build_fused_state(
            seqs, lambda s: steps * gamma + 2 * gamma + 4))
        t("fused dispatch (async)", lambda: state.update(
            fused.run_pearl(state, gamma, steps, 12345)) or None)
        t("device wait", lambda: jax.block_until_ready(state["tokens"]))
        t("fused_sync (fetch+host)", lambda: orch._fused_sync(seqs, state))
        t("collect+clear", lambda: (engine._collect(
            list(engine.scheduler.running) + engine.scheduler.finished),
            engine.scheduler.clear()))

        print(f"--- AR trial {trial}")
        t("add_requests", fill)
        t("prefill_all(target)", lambda: orch.prefill_all(target_only=True))
        seqs = list(engine.scheduler.running)
        state = t("build_fused_state", lambda: orch._build_fused_state(
            seqs, lambda s: (s.max_tokens - s.num_completion_tokens) + 2, ar_only=True))
        t("ar dispatch (async)", lambda: state.update(
            fused.run_ar(state, ar_max + 1, 999)) or None)
        t("device wait", lambda: jax.block_until_ready(state["tokens"]))
        t("fused_sync (fetch+host)", lambda: orch._fused_sync(seqs, state, ar_only=True))
        t("collect+clear", lambda: (engine._collect(
            list(engine.scheduler.running) + engine.scheduler.finished),
            engine.scheduler.clear()))


if __name__ == "__main__":
    main()
