"""Sequence (context) parallelism: exact parity with the plain paths.

The sp design (parallel/sp.py) is a capability beyond the reference
(SURVEY.md §2.8 marks sequence/context parallelism absent there): the
paged KV cache's block axis is sharded over an ``sp`` mesh axis and
attention merges per-shard partial softmaxes. These tests pin the
invariant that makes it safe to enable: every sp path is numerically
equivalent (f32, same contraction order per shard then exact sum) to its
single-shard counterpart, and the end-to-end engine emits the identical
greedy token stream with and without sp.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from nano_pearl_tpu.ops.attention import (
    paged_attention_grouped,
    paged_attention_jnp,
    prefill_attention_jnp,
)
from nano_pearl_tpu.ops.kv_cache import make_kv_cache, write_kv
from nano_pearl_tpu.parallel.sp import (
    sp_paged_attention,
    sp_paged_attention_grouped,
    sp_prefill_attention,
    sp_write_kv,
)

from helpers import tiny_model_config, tiny_pearl_config

L, NB, BS, HKV, HQ, D = 2, 7, 4, 2, 4, 16  # NB+1 = 8 divides sp
SCALE = D**-0.5


def _mesh(sp, tp):
    devs = np.array(jax.devices()[: sp * tp]).reshape(sp, tp)
    return Mesh(devs, ("sp", "tp"))


def _cache_pair(mesh, quant=None, seed=0):
    """(replicated plain cache, sp-sharded copy) with identical content."""
    kw = dict(dtype=jnp.float32) if not quant else dict(dtype=jnp.bfloat16)
    cache = make_kv_cache(L, NB, BS, HKV, D, quant=quant, **kw)
    # fill with deterministic noise so reads hit real data
    key = jax.random.key(seed)
    if isinstance(cache, dict):
        cache = {
            "q": (jax.random.normal(key, cache["q"].shape, jnp.float32) * 40).astype(cache["q"].dtype),
            "s": jnp.abs(jax.random.normal(jax.random.key(seed + 1), cache["s"].shape)) * 0.01,
        }
        spec = {"q": P(None, None, "sp", None, "tp"), "s": P(None, None, "sp", None, "tp")}
    else:
        cache = jax.random.normal(key, cache.shape, cache.dtype)
        spec = P(None, None, "sp", None, "tp")
    sharded = jax.device_put(
        cache, jax.tree.map(lambda s: NamedSharding(mesh, s), spec,
                            is_leaf=lambda x: isinstance(x, P))
    )
    return cache, sharded


@pytest.mark.parametrize("quant", [None, "int8"])
def test_sp_write_kv_matches_plain(quant):
    mesh = _mesh(2, 2)
    plain, sharded = _cache_pair(mesh, quant)
    n = 6
    k = jax.random.normal(jax.random.key(3), (n, HKV, D), jnp.float32)
    v = jax.random.normal(jax.random.key(4), (n, HKV, D), jnp.float32)
    # slots spanning both shards' block ranges + the garbage block
    slots = jnp.array([0, 5, 13, 17, 25, NB * BS + 1], jnp.int32)
    for li in range(L):
        ref = write_kv(plain, k, v, slots, jnp.int32(li))
        got = sp_write_kv(mesh, sharded, k, v, slots, jnp.int32(li))
        for r, g in zip(jax.tree.leaves(ref), jax.tree.leaves(got)):
            np.testing.assert_array_equal(np.asarray(r), np.asarray(g))


@pytest.mark.parametrize("quant", [None, "int8"])
def test_sp_decode_attention_matches_plain(quant):
    mesh = _mesh(2, 2)
    plain, sharded = _cache_pair(mesh, quant)
    n, m = 5, 4
    q = jax.random.normal(jax.random.key(7), (n, HQ, D), jnp.float32)
    bt = jax.random.randint(jax.random.key(8), (n, m), 0, NB, jnp.int32)
    ctx = jnp.array([1, 3, 9, 16, 14], jnp.int32)
    ref = paged_attention_jnp(q, plain, jnp.int32(1), bt, ctx, SCALE)
    got = sp_paged_attention(mesh, q, sharded, jnp.int32(1), bt, ctx, SCALE)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(got), rtol=1e-5, atol=1e-5)


def test_sp_prefill_attention_matches_plain():
    mesh = _mesh(2, 2)
    plain, sharded = _cache_pair(mesh)
    b, lq, m = 2, 4, 4
    q = jax.random.normal(jax.random.key(9), (b * lq, HQ, D), jnp.float32)
    bt = jax.random.randint(jax.random.key(10), (b, m), 0, NB, jnp.int32)
    q_pos = jnp.array([[2, 3, 4, 5], [0, 1, -1, -1]], jnp.int32)
    ref = prefill_attention_jnp(q, plain, jnp.int32(0), bt, q_pos, SCALE)
    got = sp_prefill_attention(mesh, q, sharded, jnp.int32(0), bt, q_pos, SCALE)
    valid = np.asarray(q_pos).reshape(-1) >= 0
    np.testing.assert_allclose(
        np.asarray(ref)[valid], np.asarray(got)[valid], rtol=1e-5, atol=1e-5
    )


def test_sp_grouped_attention_matches_plain():
    mesh = _mesh(2, 2)
    plain, sharded = _cache_pair(mesh)
    b, g, m = 2, 3, 4
    q = jax.random.normal(jax.random.key(11), (b * g, HQ, D), jnp.float32)
    gt = jax.random.randint(jax.random.key(12), (b, m), 0, NB, jnp.int32)
    ctx = jnp.array([4, 5, 6, 9, 10, 11], jnp.int32)
    ref = paged_attention_grouped(
        q, plain, jnp.int32(1), gt, ctx, SCALE, rows_per_group=g, use_pallas=False
    )
    got = sp_paged_attention_grouped(
        mesh, q, sharded, jnp.int32(1), gt, ctx, SCALE, rows_per_group=g
    )
    np.testing.assert_allclose(np.asarray(ref), np.asarray(got), rtol=1e-5, atol=1e-5)


def test_sp_engine_matches_plain_engine():
    """End-to-end: greedy PEARL streams are identical with and without
    sequence parallelism (same seeds -> same weights)."""
    from nano_pearl_tpu import PearlEngine
    from nano_pearl_tpu.config import SamplingParams

    prompts = [[1, 2, 3, 4, 5], [9, 8, 7], [42]]

    def run(**over):
        eng = PearlEngine(tiny_pearl_config(**over))
        for p in prompts:
            eng.add_request(p, SamplingParams(temperature=0.0, max_tokens=12))
        out, n, _, _ = eng.generate_token_ids()
        del eng
        return out, n

    base_out, base_n = run()
    sp_out, sp_n = run(draft_sp=2, target_sp=2, num_kvcache_blocks=95)
    assert sp_out == base_out
    assert sp_n == base_n


@pytest.mark.parametrize("quant", [None, "int8"])
def test_sp_decode_attention_pallas_partials(quant):
    """Pallas partial kernels + cross-shard merge == jnp reference."""
    mesh = _mesh(2, 2)
    plain, sharded = _cache_pair(mesh, quant)
    n, m = 5, 4
    q = jax.random.normal(jax.random.key(7), (n, HQ, D), jnp.float32)
    bt = jax.random.randint(jax.random.key(8), (n, m), 0, NB, jnp.int32)
    ctx = jnp.array([1, 3, 9, 16, 14], jnp.int32)
    ref = paged_attention_jnp(q, plain, jnp.int32(1), bt, ctx, SCALE)
    got = sp_paged_attention(
        mesh, q, sharded, jnp.int32(1), bt, ctx, SCALE,
        use_pallas=True, interpret=True,
    )
    tol = 1e-5 if quant is None else 3e-3
    np.testing.assert_allclose(np.asarray(ref), np.asarray(got), rtol=tol, atol=tol)


@pytest.mark.parametrize("quant", [None, "int8"])
def test_sp_grouped_attention_pallas_partials(quant):
    mesh = _mesh(2, 2)
    plain, sharded = _cache_pair(mesh, quant)
    b, g, m = 2, 3, 4
    q = jax.random.normal(jax.random.key(11), (b * g, HQ, D), jnp.float32)
    gt = jax.random.randint(jax.random.key(12), (b, m), 0, NB, jnp.int32)
    ctx = jnp.array([4, 5, 6, 9, 10, 11], jnp.int32)
    ref = paged_attention_grouped(
        q, plain, jnp.int32(1), gt, ctx, SCALE, rows_per_group=g, use_pallas=False
    )
    got = sp_paged_attention_grouped(
        mesh, q, sharded, jnp.int32(1), gt, ctx, SCALE, rows_per_group=g,
        use_pallas=True, interpret=True,
    )
    tol = 1e-5 if quant is None else 3e-3
    np.testing.assert_allclose(np.asarray(ref), np.asarray(got), rtol=tol, atol=tol)
