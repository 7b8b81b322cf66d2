"""shard_map TP wrappers for the Pallas attention kernels
(parallel/tp_attn.py): head-sharded kernel results must match the
unsharded jnp reference bitwise-close."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from nano_pearl_tpu.ops.attention import (
    paged_attention_jnp,
    prefill_self_attention_jnp,
)
from nano_pearl_tpu.parallel.mesh import TP_AXIS
from nano_pearl_tpu.parallel.tp_attn import (
    tp_paged_attention,
    tp_paged_attention_grouped,
    tp_prefill_self_attention,
)

TP = 4


@pytest.fixture
def mesh():
    devs = jax.devices()
    if len(devs) < TP:
        pytest.skip(f"needs {TP} devices")
    return Mesh(np.array(devs[:TP]), (TP_AXIS,))


def _cache(rng, l, nb, bs, hkv, d):
    return jnp.asarray(
        rng.standard_normal((l, 2, nb + 1, bs, hkv * d)).astype(np.float32)
    )


def test_tp_paged_attention_matches_jnp(mesh):
    rng = np.random.default_rng(0)
    l, nb, bs, hkv, hq, d = 2, 8, 16, 4, 8, 64
    cache = _cache(rng, l, nb, bs, hkv, d)
    n, m = 5, 4
    q = jnp.asarray(rng.standard_normal((n, hq, d)).astype(np.float32))
    bt = jnp.asarray(rng.integers(0, nb, (n, m)).astype(np.int32))
    ctx = jnp.asarray(rng.integers(1, m * bs + 1, (n,)).astype(np.int32))
    for li in range(l):
        want = paged_attention_jnp(q, cache, li, bt, ctx, d**-0.5)
        got = tp_paged_attention(
            mesh, q, cache, jnp.int32(li), bt, ctx, d**-0.5, interpret=True
        )
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=3e-5, atol=3e-5)


def test_tp_paged_attention_grouped_matches_jnp(mesh):
    rng = np.random.default_rng(1)
    l, nb, bs, hkv, hq, d, rows = 2, 8, 16, 4, 8, 64, 3
    cache = _cache(rng, l, nb, bs, hkv, d)
    b, m = 3, 4
    q = jnp.asarray(rng.standard_normal((b * rows, hq, d)).astype(np.float32))
    bt = jnp.asarray(rng.integers(0, nb, (b, m)).astype(np.int32))
    ctx = jnp.asarray(rng.integers(1, m * bs + 1, (b * rows,)).astype(np.int32))
    want = paged_attention_jnp(
        q, cache, 0, jnp.repeat(bt, rows, axis=0), ctx, d**-0.5
    )
    got = tp_paged_attention_grouped(
        mesh, q, cache, jnp.int32(0), bt, ctx, d**-0.5, rows, interpret=True
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=3e-5, atol=3e-5)


def test_tp_prefill_self_attention_matches_jnp(mesh):
    rng = np.random.default_rng(2)
    b, lq, hkv, hq, d = 2, 12, 4, 8, 64
    n = b * lq
    q = jnp.asarray(rng.standard_normal((n, hq, d)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((n, hkv, d)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((n, hkv, d)).astype(np.float32))
    qpos = np.full((b, lq), -1, np.int32)
    qpos[0] = np.arange(lq)
    qpos[1, :7] = np.arange(3, 10)
    qpos = jnp.asarray(qpos)
    bt = jnp.zeros((b, 2), jnp.int32)  # unused by the fresh-KV flavor
    want = prefill_self_attention_jnp(q, k, v, 0, bt, qpos, d**-0.5)
    got = tp_prefill_self_attention(
        mesh, q, k, v, jnp.int32(0), bt, qpos, d**-0.5, interpret=True
    )
    real = np.asarray(qpos).reshape(-1) >= 0
    np.testing.assert_allclose(
        np.asarray(got)[real], np.asarray(want)[real], rtol=3e-5, atol=3e-5
    )


def test_tp_paged_attention_int8_cache(mesh):
    from nano_pearl_tpu.ops.kv_cache import make_kv_cache, write_kv

    rng = np.random.default_rng(3)
    l, nb, bs, hkv, hq, d = 2, 8, 16, 4, 8, 64
    cache = make_kv_cache(l, nb, bs, hkv, d, dtype=jnp.float32, quant="int8")
    # populate via the real write path so scales are meaningful
    rows = nb * bs
    for li in range(l):
        k = jnp.asarray(rng.standard_normal((rows, hkv, d)).astype(np.float32))
        v = jnp.asarray(rng.standard_normal((rows, hkv, d)).astype(np.float32))
        cache = write_kv(cache, k, v, jnp.arange(rows, dtype=jnp.int32), li)
    n, m = 4, 3
    q = jnp.asarray(rng.standard_normal((n, hq, d)).astype(np.float32))
    bt = jnp.asarray(rng.integers(0, nb, (n, m)).astype(np.int32))
    ctx = jnp.asarray(rng.integers(1, m * bs + 1, (n,)).astype(np.int32))
    want = paged_attention_jnp(q, cache, 0, bt, ctx, d**-0.5)
    got = tp_paged_attention(
        mesh, q, cache, jnp.int32(0), bt, ctx, d**-0.5, interpret=True
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=3e-3, atol=3e-3)
