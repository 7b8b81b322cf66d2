"""Mixture-of-Experts model support + expert parallelism.

New capability beyond the reference (SURVEY §2.8: expert parallelism
"No. Dense models only."): Qwen3-MoE / Mixtral families with the MoE MLP
block (nano_pearl_tpu/ops/moe.py) and the `ep` mesh axis
(parallel/sharding.py). Coverage:

- routing math vs a literal per-token HF transcription
- logits parity vs HuggingFace transformers (Qwen3Moe + Mixtral)
- EP/TP padding exactness (padded experts masked from routing)
- engine-level PEARL == AR at T=0 with an MoE target
- EP-sharded engine parity on the virtual multi-device mesh
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from helpers import tiny_model_config, tiny_pearl_config
from nano_pearl_tpu.config import ModelConfig, PearlConfig, SamplingParams
from nano_pearl_tpu.models.transformer import (
    compute_logits,
    forward,
    make_rope_table,
)
from nano_pearl_tpu.ops.attention import paged_attention_jnp
from nano_pearl_tpu.ops.kv_cache import make_kv_cache
from nano_pearl_tpu.ops.moe import moe_mlp, route
from nano_pearl_tpu.utils.loader import load_params

BS = 16


def tiny_moe_config(**over) -> ModelConfig:
    return tiny_model_config(
        architecture="Qwen3MoeForCausalLM",
        num_experts=4,
        num_experts_per_tok=2,
        moe_intermediate_size=96,
        **over,
    )


# ---------------------------------------------------------------- routing


def test_route_matches_naive():
    rng = np.random.default_rng(0)
    logits = jnp.asarray(rng.normal(size=(7, 5)), jnp.float32)
    gates = np.asarray(route(logits, top_k=2, norm_topk_prob=True))
    # literal per-token transcription of the HF scheme
    probs = np.asarray(jax.nn.softmax(logits, axis=-1))
    for n in range(7):
        idx = np.argsort(probs[n])[::-1][:2]
        want = np.zeros(5)
        want[idx] = probs[n][idx] / probs[n][idx].sum()
        np.testing.assert_allclose(gates[n], want, rtol=1e-6, atol=1e-7)
    # without renormalization the kept raw probabilities survive
    gates_raw = np.asarray(route(logits, top_k=2, norm_topk_prob=False))
    assert (gates_raw.sum(-1) < 1.0 + 1e-6).all()


def test_route_masks_padded_experts():
    logits = jnp.ones((3, 6), jnp.float32) * jnp.arange(6)  # expert 5 best
    gates = np.asarray(route(logits, 2, True, valid_num_experts=4))
    assert (gates[:, 4:] == 0).all()
    assert (gates[:, :4] > 0).sum() == 6  # top-2 per token from the valid 4


def test_moe_mlp_matches_per_token_loop():
    rng = np.random.default_rng(1)
    n, h, e, f, k = 5, 8, 4, 12, 2
    x = jnp.asarray(rng.normal(size=(n, h)), jnp.float32)
    router = jnp.asarray(rng.normal(size=(h, e)), jnp.float32)
    wg = jnp.asarray(rng.normal(size=(e, h, f)), jnp.float32) * 0.2
    wu = jnp.asarray(rng.normal(size=(e, h, f)), jnp.float32) * 0.2
    wd = jnp.asarray(rng.normal(size=(e, f, h)), jnp.float32) * 0.2
    got = np.asarray(moe_mlp(x, router, wg, wu, wd, k, True))

    gates = np.asarray(route(x @ router, k, True))
    want = np.zeros((n, h), np.float32)
    for i in range(n):
        for j in range(e):
            if gates[i, j] == 0:
                continue
            a = np.asarray(jax.nn.silu(x[i] @ wg[j])) * np.asarray(x[i] @ wu[j])
            want[i] += gates[i, j] * (a @ np.asarray(wd[j]))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("norm_topk", [True, False])
def test_moe_mlp_ragged_matches_dense(norm_topk):
    """The sorted ragged_dot dispatch (prefill path) == dense dispatch,
    including padded (EP-alignment) experts that must never be routed."""
    from nano_pearl_tpu.ops.moe import _RAGGED_MIN_ROWS

    rng = np.random.default_rng(2)
    n, h, e, f, k = max(192, _RAGGED_MIN_ROWS), 16, 6, 24, 2
    valid = e - 1  # one padding expert
    x = jnp.asarray(rng.normal(size=(n, h)), jnp.float32)
    router = jnp.asarray(rng.normal(size=(h, e)), jnp.float32)
    wg = jnp.asarray(rng.normal(size=(e, h, f)), jnp.float32) * 0.2
    wu = jnp.asarray(rng.normal(size=(e, h, f)), jnp.float32) * 0.2
    wd = jnp.asarray(rng.normal(size=(e, f, h)), jnp.float32) * 0.2
    dense = np.asarray(
        moe_mlp(x, router, wg, wu, wd, k, norm_topk, valid, allow_ragged=False)
    )
    ragged = np.asarray(
        jax.jit(
            lambda *a: moe_mlp(*a, k, norm_topk, valid, allow_ragged=True)
        )(x, router, wg, wu, wd)
    )
    np.testing.assert_allclose(ragged, dense, rtol=1e-5, atol=1e-5)


# ------------------------------------------------------- HF logits parity

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


def save_tiny_hf_moe(tmp_path, arch):
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
        num_experts_per_tok=2,
        eos_token_id=2,
    )
    if arch == "qwen3moe":
        cfg = transformers.Qwen3MoeConfig(
            **common,
            head_dim=16,
            num_experts=4,
            moe_intermediate_size=96,
            norm_topk_prob=True,
            decoder_sparse_step=1,
            mlp_only_layers=[],
        )
    else:
        cfg = transformers.MixtralConfig(**common, num_local_experts=4)
    model = transformers.AutoModelForCausalLM.from_config(cfg).eval().float()
    path = str(tmp_path / arch)
    model.save_pretrained(path, safe_serialization=True)
    return model, path


def our_logits(mcfg: ModelConfig, params, token_ids):
    n = len(token_ids)
    nb = -(-n // BS)
    cache = make_kv_cache(
        mcfg.num_hidden_layers, nb, BS, mcfg.num_key_value_heads, mcfg.head_dim,
        dtype=jnp.float32,
    )
    tokens = jnp.asarray(token_ids, jnp.int32)
    pos = jnp.arange(n, dtype=jnp.int32)
    rope = make_rope_table(mcfg)
    bt = jnp.broadcast_to(jnp.arange(nb, dtype=jnp.int32), (n, nb))
    attn = partial(paged_attention_jnp, scale=mcfg.head_dim**-0.5)
    hidden, _ = forward(mcfg, params, cache, tokens, pos, pos, rope, attn, (bt, pos + 1))
    logits = np.asarray(compute_logits(mcfg, params, hidden))
    return logits[:, : mcfg.valid_vocab_size]


@pytest.mark.parametrize("arch", ["qwen3moe", "mixtral"])
def test_moe_logits_match_hf(tmp_path, arch):
    hf_model, path = save_tiny_hf_moe(tmp_path, arch)
    mcfg = ModelConfig.from_json(path)
    assert mcfg.is_moe and mcfg.num_experts == 4
    assert mcfg.qk_norm == (arch == "qwen3moe")
    params = load_params(mcfg, path, shardings=None, dtype=jnp.float32)

    ids = [1, 5, 9, 42, 7, 100, 3, 77, 8, 15, 2, 4, 6, 11, 13, 17, 19, 23]
    with torch.no_grad():
        want = hf_model(torch.tensor([ids])).logits[0].numpy()
    got = our_logits(mcfg, params, ids)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_ep_tp_padding_preserves_logits(tmp_path):
    """ep=3 expert padding + tp=3 ffn padding must not change the math
    (padded experts are masked from routing: ops/moe.py)."""
    _, path = save_tiny_hf_moe(tmp_path, "qwen3moe")
    base = ModelConfig.from_json(path)
    padded = ModelConfig.from_json(path).pad_for_tp(3, ep=3)
    assert padded.num_experts == 6 and padded.valid_num_experts == 4
    assert padded.moe_intermediate_size % (3 * 128) == 0
    p1 = load_params(base, path, shardings=None, dtype=jnp.float32)
    p3 = load_params(padded, path, shardings=None, dtype=jnp.float32)
    ids = list(range(1, 20))
    np.testing.assert_allclose(
        our_logits(base, p1, ids), our_logits(padded, p3, ids), rtol=2e-4, atol=2e-4
    )


# ------------------------------------------------------------ engine level


def _generate(cfg: PearlConfig, prompts, max_tokens=24, **params):
    from nano_pearl_tpu import PearlEngine

    eng = PearlEngine(cfg, **params)
    for p in prompts:
        eng.add_request(p, SamplingParams(temperature=0.0, max_tokens=max_tokens))
    pearl, *_ = eng.generate_token_ids()
    for p in prompts:
        eng.add_request(p, SamplingParams(temperature=0.0, max_tokens=max_tokens))
    ar, *_ = eng.AR_generate_token_ids()
    return pearl, ar


PROMPTS = [[1, 2, 3, 4, 5], [9, 8, 7], [11, 12, 13, 14, 15, 16, 17]]


def test_pearl_equals_ar_moe_target():
    cfg = tiny_pearl_config(target=tiny_moe_config())
    pearl, ar = _generate(cfg, PROMPTS)
    assert pearl == ar


def test_pearl_equals_ar_moe_both_groups():
    cfg = tiny_pearl_config(draft=tiny_moe_config(), target=tiny_moe_config(num_hidden_layers=3))
    pearl, ar = _generate(cfg, PROMPTS)
    assert pearl == ar


def test_ep_sharded_engine_matches_unsharded(tmp_path):
    """target ep=2 (+ tp=2) on the virtual mesh == single-device outputs,
    given the SAME checkpoint. Logit margins are sharpened (x8 lm_head)
    so the ~1-ulp fp reduction-order changes sharding introduces cannot
    flip greedy argmax on random tiny-model near-ties (same trick as
    test_engine.test_tp_sharded_engine_matches_tp1)."""
    hf_model, t_path = save_tiny_hf_moe(tmp_path, "qwen3moe")
    with torch.no_grad():
        hf_model.lm_head.weight.mul_(8.0)
    hf_model.save_pretrained(t_path, safe_serialization=True)

    torch.manual_seed(7)
    d_cfg = transformers.LlamaConfig(
        hidden_size=64, intermediate_size=112, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, vocab_size=211,
        max_position_embeddings=256, torch_dtype="float32", eos_token_id=2,
    )
    d_model = transformers.AutoModelForCausalLM.from_config(d_cfg).float()
    with torch.no_grad():
        d_model.lm_head.weight.mul_(8.0)
    d_path = str(tmp_path / "draft")
    d_model.save_pretrained(d_path, safe_serialization=True)

    prompts = [[1, 2, 3, 4, 5], [9, 8, 7]]
    base = tiny_pearl_config(draft=d_path, target=t_path)
    ep = tiny_pearl_config(draft=d_path, target=t_path, target_tp=2, target_ep=2)
    out_base, ar_base = _generate(base, prompts, max_tokens=16)
    out_ep, ar_ep = _generate(ep, prompts, max_tokens=16)
    assert out_ep == out_base
    assert ar_ep == ar_base


def test_moe_weight_quant_engine_runs():
    """INT8 weight-only quantization composes with MoE expert weights."""
    cfg = tiny_pearl_config(target=tiny_moe_config(), target_quant="int8")
    pearl, ar = _generate(cfg, PROMPTS[:1], max_tokens=12)
    assert pearl == ar  # same quantized weights both paths -> lossless


def test_moe_mlp_ep_ragged_matches_dense():
    """Round-4 EP-sharded RAGGED dispatch (ops/moe.moe_mlp_ep): on an
    ep=2 virtual mesh, the shard_map segment/phantom-expert path must
    reproduce the dense-dispatch output (same exact routing)."""
    import jax
    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from nano_pearl_tpu.ops.moe import moe_mlp, moe_mlp_ep

    rng = np.random.default_rng(7)
    n, h, e, f, k = 160, 64, 6, 96, 2  # n >= _RAGGED_MIN_ROWS
    x = jnp.asarray(rng.standard_normal((n, h)).astype(np.float32))
    rw = jnp.asarray(rng.standard_normal((h, e)).astype(np.float32) * 0.1)
    wg = jnp.asarray(rng.standard_normal((e, h, f)).astype(np.float32) * 0.05)
    wu = jnp.asarray(rng.standard_normal((e, h, f)).astype(np.float32) * 0.05)
    wd = jnp.asarray(rng.standard_normal((e, f, h)).astype(np.float32) * 0.05)
    want = np.asarray(moe_mlp(x, rw, wg, wu, wd, k, True))

    mesh = Mesh(np.array(jax.devices()[:4]).reshape(2, 2), ("ep", "tp"))
    eshard = NamedSharding(mesh, P("ep"))
    wg_s, wu_s, wd_s = (jax.device_put(w, eshard) for w in (wg, wu, wd))
    got = np.asarray(
        jax.jit(
            lambda x, rw, a, b, c: moe_mlp_ep(mesh, x, rw, a, b, c, k, True)
        )(x, rw, wg_s, wu_s, wd_s)
    )
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_moe_mlp_ep_small_batch_falls_back_dense():
    import jax
    import numpy as np
    from jax.sharding import Mesh

    from nano_pearl_tpu.ops.moe import moe_mlp, moe_mlp_ep

    rng = np.random.default_rng(8)
    n, h, e, f, k = 8, 64, 4, 96, 2  # below _RAGGED_MIN_ROWS
    x = jnp.asarray(rng.standard_normal((n, h)).astype(np.float32))
    rw = jnp.asarray(rng.standard_normal((h, e)).astype(np.float32) * 0.1)
    wg = jnp.asarray(rng.standard_normal((e, h, f)).astype(np.float32) * 0.05)
    wu = jnp.asarray(rng.standard_normal((e, h, f)).astype(np.float32) * 0.05)
    wd = jnp.asarray(rng.standard_normal((e, f, h)).astype(np.float32) * 0.05)
    mesh = Mesh(np.array(jax.devices()[:2]).reshape(2, 1), ("ep", "tp"))
    want = np.asarray(moe_mlp(x, rw, wg, wu, wd, k, True))
    got = np.asarray(moe_mlp_ep(mesh, x, rw, wg, wu, wd, k, True))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
