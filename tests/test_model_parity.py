"""Logits parity against HuggingFace transformers (torch CPU) for the
three supported families — validates model math, rope, the loader's
transpose/pad/stack pipeline, and the paged attention path end-to-end
(SURVEY.md §7 step-1 checkpoint)."""

from functools import partial

import jax.numpy as jnp
import numpy as np
import pytest

from nano_pearl_tpu.config import ModelConfig
from nano_pearl_tpu.models.transformer import compute_logits, forward, make_rope_table
from nano_pearl_tpu.ops.attention import paged_attention_jnp, prefill_attention_jnp
from nano_pearl_tpu.ops.kv_cache import make_kv_cache
from nano_pearl_tpu.utils.loader import load_params

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

BS = 16


def save_tiny_hf(tmp_path, arch):
    torch.manual_seed(0)
    common = dict(
        hidden_size=64,
        intermediate_size=112,
        num_hidden_layers=3,
        num_attention_heads=4,
        num_key_value_heads=2,
        vocab_size=211,
        max_position_embeddings=256,
        rope_theta=10000.0,
        torch_dtype="float32",
        tie_word_embeddings=False,
    )
    if arch == "llama":
        cfg = transformers.LlamaConfig(**common)
    elif arch == "llama_tied":
        cfg = transformers.LlamaConfig(**{**common, "tie_word_embeddings": True})
    elif arch == "qwen2":
        cfg = transformers.Qwen2Config(**common)
    elif arch == "qwen3":
        cfg = transformers.Qwen3Config(**common, head_dim=16)
    model = transformers.AutoModelForCausalLM.from_config(cfg)
    model = model.eval().float()
    path = str(tmp_path / arch)
    model.save_pretrained(path, safe_serialization=True)
    return model, path


def our_logits(mcfg: ModelConfig, params, token_ids, use_prefill_path=False):
    n = len(token_ids)
    nb = -(-n // BS)
    cache = make_kv_cache(
        mcfg.num_hidden_layers, nb, BS, mcfg.num_key_value_heads, mcfg.head_dim,
        dtype=jnp.float32,
    )
    tokens = jnp.asarray(token_ids, jnp.int32)
    pos = jnp.arange(n, dtype=jnp.int32)
    rope = make_rope_table(mcfg)
    if use_prefill_path:
        bt = jnp.arange(nb, dtype=jnp.int32)[None, :]
        attn = partial(prefill_attention_jnp, scale=mcfg.head_dim**-0.5)
        args = (bt, pos[None, :])
    else:
        bt = jnp.broadcast_to(jnp.arange(nb, dtype=jnp.int32), (n, nb))
        attn = partial(paged_attention_jnp, scale=mcfg.head_dim**-0.5)
        args = (bt, pos + 1)
    hidden, _ = forward(mcfg, params, cache, tokens, pos, pos, rope, attn, args)
    logits = np.asarray(compute_logits(mcfg, params, hidden))
    return logits[:, : mcfg.valid_vocab_size]


@pytest.mark.parametrize("arch", ["llama", "llama_tied", "qwen2", "qwen3"])
@pytest.mark.parametrize("path_kind", ["paged", "prefill"])
def test_logits_match_hf(tmp_path, arch, path_kind):
    hf_model, path = save_tiny_hf(tmp_path, arch)
    mcfg = ModelConfig.from_json(path)
    assert mcfg.qkv_bias == (arch == "qwen2")
    assert mcfg.qk_norm == (arch == "qwen3")
    params = load_params(mcfg, path, shardings=None, dtype=jnp.float32)

    ids = [1, 5, 9, 42, 7, 100, 3, 77, 8, 15, 2, 4, 6, 11, 13, 17, 19, 23]
    with torch.no_grad():
        want = hf_model(torch.tensor([ids])).logits[0].numpy()
    got = our_logits(mcfg, params, ids, use_prefill_path=(path_kind == "prefill"))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("kind", ["llama3", "linear"])
def test_rope_scaling_matches_hf(tmp_path, kind):
    """llama3/linear rope_scaling parity vs HF (needed for Llama 3.1+
    targets, e.g. the reference headline's Llama-3.1-70B). The reference
    silently ignores rope_scaling for llama (rotary_embedding.py:64-72);
    we apply it properly (ops/rope.py)."""
    torch.manual_seed(0)
    if kind == "llama3":
        scaling = dict(
            rope_type="llama3", factor=8.0, low_freq_factor=1.0,
            high_freq_factor=4.0, original_max_position_embeddings=64,
        )
    else:
        scaling = dict(rope_type="linear", factor=4.0)
    cfg = transformers.LlamaConfig(
        hidden_size=64, intermediate_size=112, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, vocab_size=211,
        max_position_embeddings=256, torch_dtype="float32",
        rope_scaling=scaling,
    )
    hf_model = transformers.AutoModelForCausalLM.from_config(cfg).eval().float()
    path = str(tmp_path / kind)
    hf_model.save_pretrained(path, safe_serialization=True)
    mcfg = ModelConfig.from_json(path)
    assert mcfg.rope_scaling
    params = load_params(mcfg, path, shardings=None, dtype=jnp.float32)
    # positions past original_max_position_embeddings exercise the scaled
    # low-frequency band
    ids = list(range(1, 101))
    with torch.no_grad():
        want = hf_model(torch.tensor([ids])).logits[0].numpy()
    got = our_logits(mcfg, params, ids)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_tp_padding_preserves_logits(tmp_path):
    """Non-power-of-2 TP padding (tp=3) must not change the math
    (reference capability: pearl_config.py:37-67)."""
    hf_model, path = save_tiny_hf(tmp_path, "llama")
    base = ModelConfig.from_json(path)
    padded = ModelConfig.from_json(path).pad_for_tp(3)
    assert padded.num_key_value_heads % 3 == 0
    assert padded.intermediate_size % (3 * 128) == 0
    assert padded.vocab_size % (3 * 128) == 0
    p1 = load_params(base, path, shardings=None, dtype=jnp.float32)
    p3 = load_params(padded, path, shardings=None, dtype=jnp.float32)
    ids = list(range(1, 20))
    l1 = our_logits(base, p1, ids)
    l3 = our_logits(padded, p3, ids)
    np.testing.assert_allclose(l1, l3, rtol=2e-4, atol=2e-4)
