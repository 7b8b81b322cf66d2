"""Worker script for the true multi-process (multi-controller) test.

Launched by tests/test_multihost.py as N separate Python processes, each
simulating one host with 4 virtual CPU devices. Every process builds the
SAME engine over the GLOBAL 8-device mesh (union placement: both models
TP-sharded over all devices, whole PEARL loop fused into one program) —
the multi-host execution model documented in parallel/distributed.py:
identical deterministic host loops on every controller, all fetched
arrays fully replicated.

Prints one JSON line with the generated token ids so the parent can
assert cross-process agreement; asserts PEARL == AR at T=0 in-process.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    process_id = int(sys.argv[1])
    num_processes = int(sys.argv[2])
    port = int(sys.argv[3])
    mode = sys.argv[4] if len(sys.argv) > 4 else "union"

    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=4"
    )
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["NANO_PEARL_PALLAS"] = "0"

    import jax

    jax.config.update("jax_platforms", "cpu")

    from nano_pearl_tpu.parallel.distributed import initialize_multihost

    initialize_multihost(
        coordinator_address=f"localhost:{port}",
        num_processes=num_processes,
        process_id=process_id,
    )
    assert jax.process_count() == num_processes
    n = len(jax.devices())
    assert n == 4 * num_processes, f"{n} global devices"

    from nano_pearl_tpu import PearlEngine
    from nano_pearl_tpu.config import ModelConfig, PearlConfig, SamplingParams

    def mc(layers):
        return ModelConfig(
            architecture="LlamaForCausalLM",
            hidden_size=64,
            intermediate_size=128,
            num_hidden_layers=layers,
            num_attention_heads=4,
            num_key_value_heads=2,
            vocab_size=256,
            eos_token_id=0,
            dtype="float32",
            max_position_embeddings=512,
        )

    if mode == "disjoint":
        # draft group = host 0's devices, target group = host 1's — the
        # reference's disjoint process-group topology at host granularity.
        # Each controller dispatches only its own group; draft tokens /
        # verdicts cross hosts via parallel/distributed.sync_from.
        per_host = n // num_processes
        tp_kwargs = dict(
            draft_tp=per_host,
            target_tp=n - per_host,
            placement="disjoint",
            execution_mode="overlap",
        )
    else:
        tp_kwargs = dict(
            draft_tp=n,
            target_tp=n,
            placement="union",
            execution_mode="fused",
        )
    cfg = PearlConfig(
        draft_model=mc(2),
        target_model=mc(3),
        max_model_len=256,
        max_num_batched_tokens=512,
        kvcache_block_size=16,
        num_kvcache_blocks=64,
        gamma=3,
        max_num_seqs=8,
        prefill_token_buckets=(32, 64, 128, 256),
        dtype="float32",
        devices=jax.devices(),
        **tp_kwargs,
    )
    engine = PearlEngine(cfg)
    prompts = [[1, 2, 3, 4, 5], [9, 8, 7]]
    sp = SamplingParams(temperature=0.0, max_tokens=12, ignore_eos=True)
    for p in prompts:
        engine.add_request(list(p), sp)
    pearl, n_tok, _, _ = engine.generate_token_ids()
    for p in prompts:
        engine.add_request(list(p), sp)
    ar, *_ = engine.AR_generate_token_ids()
    assert pearl == ar, f"p{process_id}: PEARL != AR"
    print("MHRESULT " + json.dumps({"pid": process_id, "tokens": pearl}), flush=True)


if __name__ == "__main__":
    main()
