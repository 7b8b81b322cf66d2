"""Pallas kernels vs jnp reference ops (interpret mode on CPU; the same
kernels compile natively on TPU where ops/pallas enables them)."""

import jax.numpy as jnp
import numpy as np
import pytest

from nano_pearl_tpu.ops.attention import paged_attention_jnp
from nano_pearl_tpu.ops.pallas.paged_attention import paged_attention_pallas


@pytest.mark.parametrize("seed", [0, 1])
@pytest.mark.parametrize("hq,hkv", [(8, 2), (4, 4), (14, 2)])
def test_paged_attention_pallas_matches_jnp(seed, hq, hkv):
    rng = np.random.default_rng(seed)
    nb, bs, d = 6, 16, 64
    cache = jnp.asarray(rng.standard_normal((1, 2, nb + 1, bs, hkv * d)).astype(np.float32))
    n, m = 5, 4
    q = jnp.asarray(rng.standard_normal((n, hq, d)).astype(np.float32))
    bt = jnp.asarray(rng.integers(0, nb, (n, m)).astype(np.int32))
    ctx = jnp.asarray(rng.integers(1, m * bs + 1, (n,)).astype(np.int32))
    scale = d**-0.5
    want = paged_attention_jnp(q, cache, 0, bt, ctx, scale)
    got = paged_attention_pallas(q, cache, 0, bt, ctx, scale, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=3e-5, atol=3e-5)


def test_paged_attention_pallas_staircase_ctx():
    """Per-token context lens (PEARL packed verify shape): each row of the
    same sequence sees one more token."""
    rng = np.random.default_rng(2)
    nb, bs, hkv, hq, d = 4, 16, 2, 8, 64
    cache = jnp.asarray(rng.standard_normal((1, 2, nb + 1, bs, hkv * d)).astype(np.float32))
    bt_row = rng.integers(0, nb, (1, 3)).astype(np.int32)
    bt = jnp.asarray(np.repeat(bt_row, 4, axis=0))
    q = jnp.asarray(rng.standard_normal((4, hq, d)).astype(np.float32))
    ctx = jnp.asarray(np.array([20, 21, 22, 23], np.int32))
    scale = d**-0.5
    want = paged_attention_jnp(q, cache, 0, bt, ctx, scale)
    got = paged_attention_pallas(q, cache, 0, bt, ctx, scale, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=3e-5, atol=3e-5)


def test_paged_attention_pallas_bf16():
    rng = np.random.default_rng(3)
    nb, bs, hkv, hq, d = 4, 16, 2, 8, 64
    cache = jnp.asarray(rng.standard_normal((1, 2, nb + 1, bs, hkv * d)), jnp.bfloat16)
    q = jnp.asarray(rng.standard_normal((3, hq, d)), jnp.bfloat16)
    bt = jnp.asarray(rng.integers(0, nb, (3, 2)).astype(np.int32))
    ctx = jnp.asarray(np.array([5, 16, 30], np.int32))
    scale = d**-0.5
    want = paged_attention_jnp(q, cache, 0, bt, ctx, scale)
    got = paged_attention_pallas(q, cache, 0, bt, ctx, scale, interpret=True)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32), rtol=2e-2, atol=2e-2
    )


@pytest.mark.parametrize("rows", [2, 4])
def test_paged_attention_pallas_grouped_matches_jnp(rows):
    """Grouped verify kernel: R rows per sequence share a block table;
    includes pre-verify-style groups (row 0 long, padding rows ctx=1)."""
    from nano_pearl_tpu.ops.pallas.paged_attention import paged_attention_pallas_grouped

    rng = np.random.default_rng(10 + rows)
    nb, bs, hkv, hq, d = 8, 16, 2, 8, 64
    cache = jnp.asarray(rng.standard_normal((2, 2, nb + 1, bs, hkv * d)).astype(np.float32))
    b, m = 3, 4
    bt = jnp.asarray(rng.integers(0, nb, (b, m)).astype(np.int32))
    ctx = np.ones((b, rows), np.int32)
    ctx[0] = np.arange(30, 30 + rows)  # staircase (post-verify)
    ctx[1, 0] = 40  # pre-verify: single long row, rest padding
    ctx[2] = np.arange(5, 5 + rows)
    ctx = jnp.asarray(ctx.reshape(-1))
    q = jnp.asarray(rng.standard_normal((b * rows, hq, d)).astype(np.float32))
    for li in (0, 1):
        want = paged_attention_jnp(q, cache, li, jnp.repeat(bt, rows, axis=0), ctx, 0.125)
        got = paged_attention_pallas_grouped(q, cache, li, bt, ctx, 0.125, rows, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=3e-5, atol=3e-5)


def _random_int8_cache(rng, l, nb, bs, hkv, d, quant="int8"):
    from nano_pearl_tpu.ops.kv_cache import make_kv_cache, write_kv

    cache = make_kv_cache(l, nb, bs, hkv, d, quant=quant)
    # fill every real slot through the write path (quantize-at-write)
    for li in range(l):
        k = jnp.asarray(rng.standard_normal((nb * bs, hkv, d)).astype(np.float32))
        v = jnp.asarray(rng.standard_normal((nb * bs, hkv, d)).astype(np.float32))
        cache = write_kv(cache, k, v, jnp.arange(nb * bs, dtype=jnp.int32), li)
    return cache


@pytest.mark.parametrize("hq,hkv", [(8, 2), (4, 4)])
def test_paged_attention_pallas_int8_matches_jnp(hq, hkv):
    """In-kernel dequant of the {"q","s"} int8 cache == jnp dequant path."""
    rng = np.random.default_rng(21)
    nb, bs, d, l = 6, 16, 64, 2
    cache = _random_int8_cache(rng, l, nb, bs, hkv, d)
    n, m = 5, 4
    q = jnp.asarray(rng.standard_normal((n, hq, d)).astype(np.float32))
    bt = jnp.asarray(rng.integers(0, nb, (n, m)).astype(np.int32))
    ctx = jnp.asarray(rng.integers(1, m * bs + 1, (n,)).astype(np.int32))
    for li in range(l):
        want = paged_attention_jnp(q, cache, li, bt, ctx, d**-0.5)
        got = paged_attention_pallas(q, cache, li, bt, ctx, d**-0.5, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=3e-5, atol=3e-5)


def test_paged_attention_pallas_grouped_int8_matches_jnp():
    from nano_pearl_tpu.ops.pallas.paged_attention import paged_attention_pallas_grouped

    rng = np.random.default_rng(22)
    nb, bs, hkv, hq, d, rows = 8, 16, 2, 8, 64, 3
    cache = _random_int8_cache(rng, 2, nb, bs, hkv, d)
    b, m = 3, 4
    bt = jnp.asarray(rng.integers(0, nb, (b, m)).astype(np.int32))
    ctx = np.ones((b, rows), np.int32)
    ctx[0] = np.arange(30, 30 + rows)
    ctx[1, 0] = 40
    ctx[2] = np.arange(5, 5 + rows)
    ctx = jnp.asarray(ctx.reshape(-1))
    q = jnp.asarray(rng.standard_normal((b * rows, hq, d)).astype(np.float32))
    for li in (0, 1):
        want = paged_attention_jnp(q, cache, li, jnp.repeat(bt, rows, axis=0), ctx, 0.125)
        got = paged_attention_pallas_grouped(q, cache, li, bt, ctx, 0.125, rows, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=3e-5, atol=3e-5)


@pytest.mark.parametrize("mono", [False, True])
@pytest.mark.parametrize("quant", ["int8", "fp8"])
def test_paged_attention_pallas_q8_db_mono_matches_jnp(mono, quant):
    """db/mono-generation quantized kernels (manual value + scale slab
    DMAs): bs=32 satisfies the 1-byte sublane tile so the fast path is
    taken (``_q8_fastpath_ok``), unlike the bs=16 legacy tests above
    which exercise the BlockSpec fallback."""
    from nano_pearl_tpu.ops.pallas.paged_attention import (
        _q8_fastpath_ok,
        _cache_parts,
    )

    rng = np.random.default_rng(31)
    nb, bs, hkv, hq, d = 6, 32, 2, 8, 64
    cache = _random_int8_cache(rng, 1, nb, bs, hkv, d, quant=quant)
    blocks, scales, *_ = _cache_parts(cache, 0, jnp.zeros((1, 1), jnp.int32), d)
    assert _q8_fastpath_ok(scales, bs, hkv, d)
    n, m = 4, 4
    q = jnp.asarray(rng.standard_normal((n, hq, d)).astype(np.float32))
    bt = jnp.asarray(rng.integers(0, nb, (n, m)).astype(np.int32))
    ctx = jnp.asarray(rng.integers(1, m * bs + 1, (n,)).astype(np.int32))
    want = paged_attention_jnp(q, cache, 0, bt, ctx, d**-0.5)
    got = paged_attention_pallas(
        q, cache, 0, bt, ctx, d**-0.5, interpret=True, mono=mono
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=3e-5, atol=3e-5)


@pytest.mark.parametrize("mono", [False, True])
def test_paged_attention_pallas_grouped_q8_db_mono_matches_jnp(mono):
    from nano_pearl_tpu.ops.pallas.paged_attention import (
        paged_attention_pallas_grouped,
    )

    rng = np.random.default_rng(32)
    nb, bs, hkv, hq, d, rows = 6, 32, 2, 8, 64, 3
    cache = _random_int8_cache(rng, 2, nb, bs, hkv, d)
    b, m = 2, 4
    bt = jnp.asarray(rng.integers(0, nb, (b, m)).astype(np.int32))
    ctx = np.ones((b, rows), np.int32)
    ctx[0] = np.arange(60, 60 + rows)  # staircase (post-verify)
    ctx[1, 0] = 80  # pre-verify: one long row + padding
    ctx = jnp.asarray(ctx.reshape(-1))
    q = jnp.asarray(rng.standard_normal((b * rows, hq, d)).astype(np.float32))
    for li in (0, 1):
        want = paged_attention_jnp(
            q, cache, li, jnp.repeat(bt, rows, axis=0), ctx, 0.125
        )
        got = paged_attention_pallas_grouped(
            q, cache, li, bt, ctx, 0.125, rows, interpret=True, mono=mono
        )
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=3e-5, atol=3e-5
        )


def test_prefill_self_attention_pallas_matches_jnp():
    from nano_pearl_tpu.ops.attention import prefill_self_attention_jnp
    from nano_pearl_tpu.ops.pallas.prefill_attention import (
        prefill_self_attention_pallas,
    )

    rng = np.random.default_rng(23)
    b, lq, hkv, hq, d = 3, 20, 2, 8, 64
    n = b * lq
    q = jnp.asarray(rng.standard_normal((n, hq, d)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((n, hkv, d)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((n, hkv, d)).astype(np.float32))
    # ragged: seq0 full, seq1 12 real rows (prefix-offset positions),
    # seq2 fully padded
    qpos = np.full((b, lq), -1, np.int32)
    qpos[0] = np.arange(lq)
    qpos[1, :12] = np.arange(7, 19)
    qpos = jnp.asarray(qpos)
    want = prefill_self_attention_jnp(q, k, v, 0, None, qpos, d**-0.5)
    got = prefill_self_attention_pallas(
        q, k, v, 0, None, qpos, d**-0.5, interpret=True
    )
    real = np.asarray(qpos).reshape(-1) >= 0
    np.testing.assert_allclose(
        np.asarray(got)[real], np.asarray(want)[real], rtol=3e-5, atol=3e-5
    )
    # fully-padded rows must be finite (0), never NaN
    assert np.all(np.isfinite(np.asarray(got)))


def test_prefill_self_attention_pallas_multitile():
    from nano_pearl_tpu.ops.attention import prefill_self_attention_jnp
    from nano_pearl_tpu.ops.pallas.prefill_attention import (
        prefill_self_attention_pallas,
    )

    rng = np.random.default_rng(24)
    b, lq, hkv, hq, d = 2, 300, 2, 4, 64  # 3 tiles of 128 (padded to 384)
    n = b * lq
    q = jnp.asarray(rng.standard_normal((n, hq, d)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((n, hkv, d)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((n, hkv, d)).astype(np.float32))
    qpos = np.full((b, lq), -1, np.int32)
    qpos[0] = np.arange(lq)
    qpos[1, :200] = np.arange(200)
    qpos = jnp.asarray(qpos)
    want = prefill_self_attention_jnp(q, k, v, 0, None, qpos, d**-0.5)
    got = prefill_self_attention_pallas(
        q, k, v, 0, None, qpos, d**-0.5, interpret=True
    )
    real = np.asarray(qpos).reshape(-1) >= 0
    np.testing.assert_allclose(
        np.asarray(got)[real], np.asarray(want)[real], rtol=3e-5, atol=3e-5
    )


def test_prefill_prefix_attention_pallas_matches_jnp():
    """Paged-prefix prefill kernel (round-4): flash over cached pages +
    causal fresh window == the jnp pre-gather/merge reference, including
    a no-prefix sequence and a fully-padded sequence."""
    from nano_pearl_tpu.ops.attention import (
        gather_prefix_kv,
        prefill_prefix_attention_jnp,
    )
    from nano_pearl_tpu.ops.kv_cache import make_kv_cache, write_kv
    from nano_pearl_tpu.ops.pallas.prefill_attention import (
        prefill_prefix_attention_pallas,
    )

    rng = np.random.default_rng(40)
    l, nb, bs, hkv, d = 2, 8, 16, 2, 64
    b, lq, hq = 3, 20, 8
    cache = make_kv_cache(l, nb, bs, hkv, d, dtype=jnp.float32)
    nfill = 6 * bs
    for li in range(l):
        kf = jnp.asarray(rng.standard_normal((nfill, hkv, d)).astype(np.float32))
        vf = jnp.asarray(rng.standard_normal((nfill, hkv, d)).astype(np.float32))
        cache = write_kv(cache, kf, vf, jnp.arange(nfill, dtype=jnp.int32), li)

    mpre = 3
    bt = jnp.asarray((rng.permutation(9) % 6).reshape(b, mpre).astype(np.int32))
    num_cached = jnp.asarray(np.array([40, 0, 33], np.int32))
    n_new = np.array([20, 12, 0], np.int32)
    q = jnp.asarray(rng.standard_normal((b * lq, hq, d)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((b * lq, hkv, d)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((b * lq, hkv, d)).astype(np.float32))
    qpos = np.full((b, lq), -1, np.int32)
    for i in range(b):
        qpos[i, : n_new[i]] = int(num_cached[i]) + np.arange(n_new[i])
    qpos = jnp.asarray(qpos)
    scale = d**-0.5
    for li in range(l):
        pk, pv = gather_prefix_kv(cache, bt, d)
        want = prefill_prefix_attention_jnp(
            q, k, v, li, pk, pv, num_cached, qpos, scale
        )
        got = prefill_prefix_attention_pallas(
            q, k, v, cache, li, bt, num_cached, jnp.asarray(n_new), qpos,
            scale, interpret=True,
        )
        real = np.asarray(qpos).reshape(-1) >= 0
        np.testing.assert_allclose(
            np.asarray(got)[real], np.asarray(want)[real], rtol=3e-5, atol=3e-5
        )
        assert np.isfinite(np.asarray(got)).all()
