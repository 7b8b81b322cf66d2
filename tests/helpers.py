"""Shared tiny-model fixtures for the test suite."""

from __future__ import annotations

from nano_pearl_tpu.config import ModelConfig, PearlConfig


def tiny_model_config(**over) -> ModelConfig:
    base = dict(
        architecture="LlamaForCausalLM",
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        vocab_size=256,
        eos_token_id=0,
        dtype="float32",
        max_position_embeddings=512,
    )
    base.update(over)
    return ModelConfig(**base)


def tiny_pearl_config(draft=None, target=None, **over) -> PearlConfig:
    base = dict(
        draft_model=draft or tiny_model_config(),
        target_model=target or tiny_model_config(),
        draft_tp=1,
        target_tp=1,
        max_model_len=256,
        max_num_batched_tokens=512,
        kvcache_block_size=16,
        num_kvcache_blocks=96,
        gamma=3,
        max_num_seqs=8,
        prefill_token_buckets=(32, 64, 128, 256, 512),
        dtype="float32",
    )
    base.update(over)
    return PearlConfig(**base)
