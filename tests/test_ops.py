"""Op-level numerics: paged/prefill attention vs a dense reference,
KV scatter, sampling distributions."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nano_pearl_tpu.ops.attention import paged_attention_jnp, prefill_attention_jnp
from nano_pearl_tpu.ops.kv_cache import make_kv_cache, write_kv
from nano_pearl_tpu.ops.sampling import greedy, mask_invalid_logits, norm_probs, sample


def dense_attention(q, k, v, scale, ctx_len):
    """[Hq, D] query against [S, Hkv, D] keys/values, first ctx_len valid."""
    hq, d = q.shape
    hkv = k.shape[1]
    g = hq // hkv
    qg = q.reshape(hkv, g, d)
    scores = np.einsum("kgd,skd->kgs", qg, k[:ctx_len]) * scale
    p = np.exp(scores - scores.max(-1, keepdims=True))
    p /= p.sum(-1, keepdims=True)
    return np.einsum("kgs,skd->kgd", p, v[:ctx_len]).reshape(hq, d)


def build_cache(rng, nb, bs, hkv, d, layers=1):
    cache = rng.standard_normal((layers, 2, nb + 1, bs, hkv * d)).astype(np.float32)
    return jnp.asarray(cache)


LI = 0  # layer index used throughout (single-layer caches)


def test_paged_attention_matches_dense():
    rng = np.random.default_rng(0)
    nb, bs, hkv, hq, d = 6, 8, 2, 4, 16
    cache = build_cache(rng, nb, bs, hkv, d)
    n = 3
    q = rng.standard_normal((n, hq, d)).astype(np.float32)
    block_tables = np.array([[0, 1, 2], [3, 4, 0], [5, 0, 0]], np.int32)
    ctx = np.array([20, 9, 3], np.int32)
    scale = d**-0.5
    out = np.asarray(paged_attention_jnp(jnp.asarray(q), cache, LI, jnp.asarray(block_tables), jnp.asarray(ctx), scale))

    kc = np.asarray(cache[0, 0])
    vc = np.asarray(cache[0, 1])
    for i in range(n):
        k = kc[block_tables[i]].reshape(-1, hkv, d)
        v = vc[block_tables[i]].reshape(-1, hkv, d)
        want = dense_attention(q[i], k, v, scale, int(ctx[i]))
        np.testing.assert_allclose(out[i], want, rtol=1e-5, atol=1e-5)


def test_paged_attention_zero_context_is_finite():
    rng = np.random.default_rng(1)
    cache = build_cache(rng, 2, 8, 2, 16)
    q = jnp.asarray(rng.standard_normal((1, 4, 16)).astype(np.float32))
    out = paged_attention_jnp(q, cache, LI, jnp.zeros((1, 1), jnp.int32), jnp.zeros((1,), jnp.int32), 0.25)
    assert np.isfinite(np.asarray(out)).all()


def test_prefill_attention_matches_dense_causal():
    rng = np.random.default_rng(2)
    nb, bs, hkv, hq, d = 4, 8, 2, 4, 16
    b, lq = 2, 5
    cache = build_cache(rng, nb, bs, hkv, d)
    block_tables = np.array([[0, 1], [2, 3]], np.int32)
    q_pos = np.array([[0, 1, 2, 3, 4], [3, 4, 5, 6, -1]], np.int32)  # seq2: prefix-cached 3, one pad
    q = rng.standard_normal((b * lq, hq, d)).astype(np.float32)
    scale = d**-0.5
    out = np.asarray(
        prefill_attention_jnp(jnp.asarray(q), cache, LI, jnp.asarray(block_tables), jnp.asarray(q_pos), scale)
    ).reshape(b, lq, hq, d)

    kc, vc = np.asarray(cache[0, 0]), np.asarray(cache[0, 1])
    for i in range(b):
        k = kc[block_tables[i]].reshape(-1, hkv, d)
        v = vc[block_tables[i]].reshape(-1, hkv, d)
        for j in range(lq):
            if q_pos[i, j] < 0:
                continue
            want = dense_attention(q.reshape(b, lq, hq, d)[i, j], k, v, scale, int(q_pos[i, j]) + 1)
            np.testing.assert_allclose(out[i, j], want, rtol=1e-5, atol=1e-5)


def test_write_kv_scatter_and_garbage():
    cache = make_kv_cache(1, 2, 4, 2, 8, dtype=jnp.float32)  # [1, 2, 3, 4, 2, 8]
    k = jnp.ones((3, 2, 8))
    v = jnp.full((3, 2, 8), 2.0)
    slots = jnp.asarray([0, 5, 2 * 4], jnp.int32)  # last goes to garbage block
    out = np.asarray(write_kv(cache, k, v, slots, 0))[0]
    assert (out[0, 0, 0] == 1).all() and (out[1, 0, 0] == 2).all()
    assert (out[0, 1, 1] == 1).all()
    assert (out[0, 2, 0] == 1).all()  # garbage block row written, harmless
    assert (out[0, 0, 1] == 0).all()  # untouched


def test_norm_probs_one_hot_and_softmax():
    logits = jnp.asarray([[1.0, 3.0, 2.0], [1.0, 3.0, 2.0]])
    temps = jnp.asarray([0.0, 1.0])
    p = np.asarray(norm_probs(logits, temps))
    np.testing.assert_allclose(p[0], [0, 1, 0])
    np.testing.assert_allclose(p[1], np.exp([1, 3, 2]) / np.exp([1, 3, 2]).sum(), rtol=1e-6)


def test_sample_greedy_at_zero_temp_and_distribution():
    logits = jnp.asarray([[1.0, 5.0, 2.0]])
    t0 = sample(logits, jnp.asarray([0.0]), jax.random.key(0))
    assert int(t0[0]) == 1
    # temperature sampling should hit every token eventually
    seen = set()
    for i in range(200):
        tok = sample(jnp.asarray([[1.0, 1.5, 1.2]]), jnp.asarray([1.0]), jax.random.key(i))
        seen.add(int(tok[0]))
    assert seen == {0, 1, 2}


def test_mask_invalid_logits_blocks_padded_vocab():
    logits = jnp.asarray([[0.1, 0.2, 99.0]])
    masked = mask_invalid_logits(logits, 2)
    assert int(greedy(masked)[0]) == 1
    tok = sample(masked, jnp.asarray([1.0]), jax.random.key(0))
    assert int(tok[0]) < 2


def test_prefill_attention_chunked_matches_paged_rows():
    """The chunked prefill path (Lq > 128, divisible) must agree with
    per-row paged attention on the same cache."""
    rng = np.random.default_rng(7)
    nb, bs, hkv, hq, d = 40, 16, 2, 4, 16
    cache = build_cache(rng, nb, bs, hkv, d)
    b, lq = 2, 256
    bt = jnp.asarray(rng.integers(0, nb, (b, 20)).astype(np.int32))
    q_pos = jnp.asarray(np.stack([np.arange(lq), np.arange(40, 40 + lq)]).astype(np.int32))
    q = jnp.asarray(rng.standard_normal((b * lq, hq, d)).astype(np.float32))
    chunked = prefill_attention_jnp(q, cache, LI, bt, q_pos, 0.25)
    rows = paged_attention_jnp(
        q, cache, LI, jnp.repeat(bt, lq, axis=0), (q_pos + 1).reshape(-1), 0.25
    )
    np.testing.assert_allclose(np.asarray(chunked), np.asarray(rows), rtol=2e-5, atol=2e-5)


def test_prefill_prefix_attention_matches_dense():
    """prefill_prefix_attention_jnp (pre-gathered cached prefix merged
    with fresh-KV causal self-attention via flash partials) must agree
    with dense attention over [prefix ++ visible fresh] keys, including
    padded rows and the chunked Lq path."""
    from nano_pearl_tpu.ops.attention import (
        gather_prefix_kv,
        prefill_prefix_attention_jnp,
    )

    rng = np.random.default_rng(11)
    nb, bs, hkv, hq, d = 6, 8, 2, 4, 16
    scale = d**-0.5
    for b, lq, cached in [(2, 5, (8, 3)), (1, 256, (16,))]:
        cache = build_cache(rng, nb, bs, hkv, d)
        bt = np.arange(b * 3, dtype=np.int32).reshape(b, 3)
        num_cached = np.asarray(cached, np.int32)
        # row j of seq i continues at absolute position num_cached[i]+j;
        # last row of seq 0 padded (-1) when lq is small
        q_pos = np.stack([np.arange(c, c + lq) for c in cached]).astype(np.int32)
        if lq == 5:
            q_pos[0, -1] = -1
        q = rng.standard_normal((b * lq, hq, d)).astype(np.float32)
        k = rng.standard_normal((b * lq, hkv, d)).astype(np.float32)
        v = rng.standard_normal((b * lq, hkv, d)).astype(np.float32)

        pk, pv = gather_prefix_kv(cache, jnp.asarray(bt), d)
        out = np.asarray(
            prefill_prefix_attention_jnp(
                jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), LI,
                pk, pv, jnp.asarray(num_cached), jnp.asarray(q_pos), scale,
            )
        ).reshape(b, lq, hq, d)

        kc, vc = np.asarray(cache[0, 0]), np.asarray(cache[0, 1])
        kf = k.reshape(b, lq, hkv, d)
        vf = v.reshape(b, lq, hkv, d)
        for i in range(b):
            pre_k = kc[bt[i]].reshape(-1, hkv, d)[: num_cached[i]]
            pre_v = vc[bt[i]].reshape(-1, hkv, d)[: num_cached[i]]
            for j in range(lq):
                if q_pos[i, j] < 0:
                    continue
                vis = (q_pos[i] >= 0) & (q_pos[i] <= q_pos[i, j])
                full_k = np.concatenate([pre_k, kf[i][vis]])
                full_v = np.concatenate([pre_v, vf[i][vis]])
                want = dense_attention(
                    q.reshape(b, lq, hq, d)[i, j], full_k, full_v, scale, len(full_k)
                )
                np.testing.assert_allclose(out[i, j], want, rtol=2e-5, atol=2e-5)
