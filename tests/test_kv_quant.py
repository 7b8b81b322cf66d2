"""INT8 KV-cache quantization: write/read numerics and end-to-end engine
behavior (north-star: KV-cache quantization at acceptance-rate parity)."""

import jax.numpy as jnp
import numpy as np
import pytest

from nano_pearl_tpu import PearlEngine
from nano_pearl_tpu.config import SamplingParams
from nano_pearl_tpu.ops.attention import paged_attention_jnp, prefill_attention_jnp
from nano_pearl_tpu.ops.kv_cache import make_kv_cache, write_kv

from helpers import tiny_pearl_config


def _filled_caches(rng, nb=4, bs=16, hkv=2, d=64, n=48):
    """Write the same random K/V rows into an fp32 and an int8 cache."""
    fp = make_kv_cache(1, nb, bs, hkv, d, dtype=jnp.float32)
    q8 = make_kv_cache(1, nb, bs, hkv, d, quant="int8")
    k = jnp.asarray(rng.standard_normal((n, hkv, d)).astype(np.float32)) * 3
    v = jnp.asarray(rng.standard_normal((n, hkv, d)).astype(np.float32))
    slots = jnp.arange(n, dtype=jnp.int32)
    return write_kv(fp, k, v, slots, 0), write_kv(q8, k, v, slots, 0)


def test_int8_cache_write_roundtrip():
    rng = np.random.default_rng(0)
    fp, q8 = _filled_caches(rng)
    from nano_pearl_tpu.ops.kv_cache import dequant_rows

    k_fp = np.asarray(fp[0, 0]).reshape(-1, 2, 64)[:48]
    k_q = np.asarray(dequant_rows(q8["q"][0, 0], q8["s"][0, 0], 64)).reshape(-1, 2, 64)[:48]
    scale = np.abs(k_fp).max(-1, keepdims=True) / 127.0
    assert np.all(np.abs(k_fp - k_q) <= scale * 0.51 + 1e-6)


def test_int8_paged_attention_close_to_fp():
    rng = np.random.default_rng(1)
    fp, q8 = _filled_caches(rng)
    n, hq, d = 3, 4, 64
    q = jnp.asarray(rng.standard_normal((n, hq, d)).astype(np.float32))
    bt = jnp.asarray(rng.integers(0, 3, (n, 3)).astype(np.int32))
    ctx = jnp.asarray(np.array([10, 30, 48], np.int32))
    a_fp = np.asarray(paged_attention_jnp(q, fp, 0, bt, ctx, 0.125))
    a_q8 = np.asarray(paged_attention_jnp(q, q8, 0, bt, ctx, 0.125))
    assert np.abs(a_fp - a_q8).max() < 0.05 * np.abs(a_fp).max() + 1e-3


def test_int8_prefill_attention_close_to_fp():
    rng = np.random.default_rng(2)
    fp, q8 = _filled_caches(rng)
    b, lq, hq, d = 2, 4, 4, 64
    q = jnp.asarray(rng.standard_normal((b * lq, hq, d)).astype(np.float32))
    bt = jnp.asarray(rng.integers(0, 3, (b, 3)).astype(np.int32))
    q_pos = jnp.asarray(np.array([[0, 1, 2, 3], [5, 6, 7, 8]], np.int32))
    a_fp = np.asarray(prefill_attention_jnp(q, fp, 0, bt, q_pos, 0.125))
    a_q8 = np.asarray(prefill_attention_jnp(q, q8, 0, bt, q_pos, 0.125))
    assert np.abs(a_fp - a_q8).max() < 0.05 * np.abs(a_fp).max() + 1e-3


def test_engine_with_int8_kv_cache_lossless_vs_own_ar():
    """PEARL with an int8 KV target equals that target's own AR stream at
    T=0 (losslessness holds whatever the cache precision, because draft
    and target both see their own caches consistently)."""
    cfg = tiny_pearl_config(target_kv_quant="int8", draft_kv_quant="int8")
    assert cfg.target_config.kv_quant == "int8"
    eng = PearlEngine(cfg)

    def add():
        eng.add_request([1, 2, 3, 4, 5], SamplingParams(temperature=0.0, max_tokens=16))

    add()
    p, _, _, _ = eng.generate_token_ids()
    add()
    a, _, _, _ = eng.AR_generate_token_ids()
    n = min(len(p[0]), len(a[0]))
    assert p[0][:n] == a[0][:n]


def test_int8_kv_acceptance_window_sanity():
    """Identical draft/target weights with int8 KV still sustain
    multi-token acceptance windows."""
    cfg = tiny_pearl_config(gamma=3, target_kv_quant="int8", draft_kv_quant="int8")
    donor = PearlEngine(tiny_pearl_config(gamma=3))
    eng = PearlEngine(cfg, draft_params=donor.target.params, target_params=donor.target.params)
    eng.add_request([1, 2, 3], SamplingParams(temperature=0.0, max_tokens=30, ignore_eos=True))
    _, _, acc, _ = eng.bench_generate(num_pearl_steps=6)
    mat = sum(acc[0]) / max(1, len(acc[0]))
    assert mat >= 2.0, f"int8-KV MAT {mat}"


# ------------------------------------------------------------------ fp8


def test_fp8_cache_write_roundtrip():
    from nano_pearl_tpu.ops.kv_cache import dequant_rows

    rng = np.random.default_rng(5)
    fp = make_kv_cache(1, 4, 16, 2, 64, dtype=jnp.float32)
    f8 = make_kv_cache(1, 4, 16, 2, 64, quant="fp8")
    assert f8["q"].dtype == jnp.float8_e4m3fn
    k = jnp.asarray(rng.standard_normal((48, 2, 64)).astype(np.float32)) * 3
    v = jnp.asarray(rng.standard_normal((48, 2, 64)).astype(np.float32))
    slots = jnp.arange(48, dtype=jnp.int32)
    fp = write_kv(fp, k, v, slots, 0)
    f8 = write_kv(f8, k, v, slots, 0)
    k_fp = np.asarray(fp[0, 0]).reshape(-1, 2, 64)[:48]
    k_q = np.asarray(dequant_rows(f8["q"][0, 0], f8["s"][0, 0], 64)).reshape(-1, 2, 64)[:48]
    assert np.all(np.abs(k_fp - k_q) <= np.abs(k_fp) * 0.0625 + 0.05)


def test_fp8_paged_attention_close_to_fp():
    rng = np.random.default_rng(6)
    fp = make_kv_cache(1, 4, 16, 2, 64, dtype=jnp.float32)
    f8 = make_kv_cache(1, 4, 16, 2, 64, quant="fp8")
    k = jnp.asarray(rng.standard_normal((48, 2, 64)).astype(np.float32)) * 3
    v = jnp.asarray(rng.standard_normal((48, 2, 64)).astype(np.float32))
    slots = jnp.arange(48, dtype=jnp.int32)
    fp = write_kv(fp, k, v, slots, 0)
    f8 = write_kv(f8, k, v, slots, 0)
    q = jnp.asarray(rng.standard_normal((3, 4, 64)).astype(np.float32))
    bt = jnp.asarray(rng.integers(0, 3, (3, 3)).astype(np.int32))
    ctx = jnp.asarray(np.array([10, 30, 48], np.int32))
    a_fp = np.asarray(paged_attention_jnp(q, fp, 0, bt, ctx, 0.125))
    a_q = np.asarray(paged_attention_jnp(q, f8, 0, bt, ctx, 0.125))
    # e4m3 resolution is 2^-4 per element (vs int8's ~1/127), so the
    # attention output tolerance is correspondingly looser than int8's
    assert np.abs(a_fp - a_q).max() < 0.10 * np.abs(a_fp).max() + 1e-3


def test_engine_with_fp8_kv_cache_lossless_vs_own_ar():
    cfg = tiny_pearl_config(target_kv_quant="fp8", draft_kv_quant="fp8")
    assert cfg.target_config.kv_quant == "fp8"
    eng = PearlEngine(cfg)

    def add():
        eng.add_request([1, 2, 3, 4, 5], SamplingParams(temperature=0.0, max_tokens=16))

    add()
    p, _, _, _ = eng.generate_token_ids()
    add()
    a, _, _, _ = eng.AR_generate_token_ids()
    n = min(len(p[0]), len(a[0]))
    assert p[0][:n] == a[0][:n]
