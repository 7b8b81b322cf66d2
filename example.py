"""Minimal quickstart (reference: example.py).

With checkpoints:  python example.py -d DRAFT_DIR -t TARGET_DIR
No checkpoints:    python example.py --demo [--cpu]
                   (synthetic layer-share pair, token-id prompt)
"""

from __future__ import annotations

import argparse


def main():
    p = argparse.ArgumentParser(description="nano-pearl-tpu quickstart")
    p.add_argument("--draft-model", "-d", default="/path/to/draft/model")
    p.add_argument("--target-model", "-t", default="/path/to/target/model")
    p.add_argument("--demo", action="store_true", help="weightless demo pair")
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from nano_pearl_tpu import PearlConfig, PearlEngine, SamplingParams, logger

    dparams = tparams = None
    if args.demo:
        import bench as benchmod
        from nano_pearl_tpu.config import ModelConfig

        def mc(layers):
            return ModelConfig(
                architecture="LlamaForCausalLM", hidden_size=256,
                intermediate_size=1024, num_hidden_layers=layers,
                num_attention_heads=4, num_key_value_heads=2,
                vocab_size=8192, eos_token_id=1,
                dtype="float32" if args.cpu else "bfloat16",
                max_position_embeddings=2048,
            )

        draft, target = mc(2), mc(6)
        dparams, tparams = benchmod.build_layer_share_pair(draft, target, 0)
    else:
        draft, target = args.draft_model, args.target_model

    config = PearlConfig(draft, target, draft_tp=1, target_tp=1)
    engine = PearlEngine(config, draft_params=dparams, target_params=tparams)

    if args.demo:
        prompt = [3, 4, 1, 5, 9, 2, 6]  # token ids (no tokenizer in demo)
        sampling_params = SamplingParams(temperature=0.0, max_tokens=64, ignore_eos=True)
        engine.add_request(prompt, sampling_params)
        token_ids, num_tokens, num_acc_tokens, elapsed_time = engine.generate_token_ids()
        completion = token_ids[0]
    else:
        prompt = "Explain quantum computing in simple terms"
        sampling_params = SamplingParams(temperature=0.0, max_tokens=256, ignore_eos=False)
        engine.add_request(prompt, sampling_params)
        output_text, num_tokens, num_acc_tokens, elapsed_time = engine.generate()
        completion = output_text[0]

    logger.info("Completion:", color="yellow")
    logger.info(f"{completion}")
    mat = sum(num_acc_tokens[0]) / max(1, len(num_acc_tokens[0]))
    logger.info(
        f"Tokens: {num_tokens[0]}, Time: {elapsed_time:.2f}s, "
        f"Throughput: {num_tokens[0] / elapsed_time:.2f} tok/s, MAT: {mat:.2f}"
    )


if __name__ == "__main__":
    main()
