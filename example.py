"""Minimal quickstart (reference: example.py)."""

from nano_pearl_tpu import PearlConfig, PearlEngine, SamplingParams, logger


def main():
    draft_model_path = "/path/to/draft/model"
    target_model_path = "/path/to/target/model"

    config = PearlConfig(
        draft_model_path, target_model_path, draft_tp=1, target_tp=1
    )
    engine = PearlEngine(config)

    prompt = "Explain quantum computing in simple terms"
    sampling_params = SamplingParams(temperature=0.0, max_tokens=256, ignore_eos=False)
    engine.add_request(prompt, sampling_params)

    output_text, num_tokens, num_acc_tokens, elapsed_time = engine.generate()
    logger.info("Completion:", color="yellow")
    logger.info(f"{output_text[0]}")
    mat = sum(num_acc_tokens[0]) / max(1, len(num_acc_tokens[0]))
    logger.info(
        f"Tokens: {num_tokens[0]}, Time: {elapsed_time:.2f}s, "
        f"Throughput: {num_tokens[0] / elapsed_time:.2f} tok/s, MAT: {mat:.2f}"
    )


if __name__ == "__main__":
    main()
