"""Deferred-write packed verify (VERDICT r1 item 4 follow-up).

The classic verify writes fresh K/V into the paged cache per layer and
reads them back through the grouped attention; the deferred path keeps
fresh rows in-operand and writes the cache back once after the layer
scan (ops/attention.paged_attention_grouped_fresh +
ops/kv_cache.write_fresh). These tests pin exact semantic equivalence:

- fresh-attention output == write-then-read grouped attention,
- the writeback (jnp scatter AND the Pallas strided-DMA kernel in
  interpret mode) leaves the cache bitwise equal to per-layer write_kv,
- the engine emits identical streams with the deferred path active
  (it is the default on plain meshes with unquantized caches).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nano_pearl_tpu.ops.attention import (
    paged_attention_grouped_fresh_jnp,
    paged_attention_jnp,
)
from nano_pearl_tpu.ops.kv_cache import make_kv_cache, write_fresh_jnp, write_kv

L, NB, BS, HKV, D = 3, 16, 16, 2, 64
HQ = 8


def _setup(seed, b, r):
    rng = np.random.default_rng(seed)
    cache = jnp.asarray(
        rng.standard_normal((L, 2, NB + 1, BS, HKV * D)).astype(np.float32)
    )
    q = jnp.asarray(rng.standard_normal((b * r, HQ, D)).astype(np.float32))
    fk = jnp.asarray(rng.standard_normal((L, b * r, HKV, D)).astype(np.float32))
    fv = jnp.asarray(rng.standard_normal((L, b * r, HKV, D)).astype(np.float32))
    # disjoint per-group tables: real block tables never alias blocks
    bt = jnp.asarray((np.arange(b)[:, None] * 4 + np.arange(4)[None, :]).astype(np.int32))
    return rng, cache, q, fk, fv, bt


def _ctx_arrays(b, r, ctx0_vals):
    """post-verify staircase ctx rows + one pre-verify group."""
    ctx = np.zeros((b, r), np.int32)
    for i, c0 in enumerate(ctx0_vals):
        ctx[i] = c0 + 1 + np.arange(r)
    ctx[-1] = 1  # pre-verify: single real row then pads
    ctx[-1, 0] = ctx0_vals[-1] + 1
    return jnp.asarray(ctx.reshape(-1))


def _slots(bt, ctx0_vals, r):
    """flat slots of the fresh rows: positions ctx0 .. ctx0+r-1."""
    out = np.zeros((len(ctx0_vals), r), np.int32)
    for i, c0 in enumerate(ctx0_vals):
        pos = c0 + np.arange(r)
        out[i] = np.asarray(bt)[i, pos // BS] * BS + pos % BS
    return jnp.asarray(out.reshape(-1))


@pytest.mark.parametrize("seed", [0, 1])
def test_fresh_attention_matches_write_then_read(seed):
    b, r = 3, 4
    rng, cache, q, fk, fv, bt = _setup(seed, b, r)
    ctx0_vals = [20, 9, 33]
    ctx = _ctx_arrays(b, r, ctx0_vals)
    slots = _slots(bt, ctx0_vals, r)
    ctx0 = jnp.asarray(ctx0_vals, jnp.int32)
    scale = D**-0.5
    bt_rows = jnp.repeat(bt, r, axis=0)
    for li in range(L):
        # classic: write fresh rows, then read through the cache
        written = write_kv(cache, fk[li], fv[li], slots, li)
        want = paged_attention_jnp(q, written, li, bt_rows, ctx, scale)
        got = paged_attention_grouped_fresh_jnp(
            q, cache, li, bt, ctx, ctx0, fk[li], fv[li], scale
        )
        w, g = np.asarray(want), np.asarray(got)
        # padding rows of the pre-verify group read garbage in the
        # classic path (their ctx=1 row 0 slot) — compare real rows
        real = np.asarray(ctx) > 1
        np.testing.assert_allclose(g[real], w[real], rtol=2e-5, atol=2e-5)
        assert np.isfinite(g).all()


def test_fresh_attention_pallas_matches_jnp():
    from nano_pearl_tpu.ops.pallas.paged_attention import (
        paged_attention_pallas_grouped_fresh,
    )

    b, r = 3, 4
    rng, cache, q, fk, fv, bt = _setup(7, b, r)
    cache = cache.astype(jnp.float32)
    ctx0_vals = [20, 9, 33]
    ctx = _ctx_arrays(b, r, ctx0_vals)
    ctx0 = jnp.asarray(ctx0_vals, jnp.int32)
    scale = D**-0.5
    for li in range(L):
        want = paged_attention_grouped_fresh_jnp(
            q, cache, li, bt, ctx, ctx0, fk[li], fv[li], scale
        )
        got = paged_attention_pallas_grouped_fresh(
            q, cache, li, bt, ctx, ctx0, fk[li], fv[li], scale, r,
            interpret=True,
        )
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=3e-5, atol=3e-5
        )


def test_fresh_attention_ctx0_zero_is_finite():
    """First verify of a 1-token-prompt sequence: no cache context at all."""
    b, r = 1, 4
    rng, cache, q, fk, fv, bt = _setup(3, b, r)
    ctx = jnp.asarray(np.arange(1, r + 1, dtype=np.int32))
    ctx0 = jnp.zeros((1,), jnp.int32)
    out = paged_attention_grouped_fresh_jnp(
        q, cache, 0, bt, ctx, ctx0, fk[0], fv[0], D**-0.5
    )
    assert np.isfinite(np.asarray(out)).all()
    from nano_pearl_tpu.ops.pallas.paged_attention import (
        paged_attention_pallas_grouped_fresh,
    )

    out_p = paged_attention_pallas_grouped_fresh(
        q, cache, 0, bt, ctx, ctx0, fk[0], fv[0], D**-0.5, r, interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(out_p), np.asarray(out), rtol=3e-5, atol=3e-5
    )


@pytest.mark.parametrize("crossing", [False, True])
def test_write_fresh_matches_per_layer_write_kv(crossing):
    rng = np.random.default_rng(11)
    b, r = 3, 4
    cache = jnp.asarray(
        rng.standard_normal((L, 2, NB + 1, BS, HKV * D)).astype(np.float32)
    )
    fresh = jnp.asarray(
        rng.standard_normal((L, 2, b * r, HKV * D)).astype(np.float32)
    )
    if crossing:
        # group 0 crosses a block boundary; group 2 routes pads to garbage
        s = [BS - 2 + 0, BS - 2 + 1, 2 * BS, 2 * BS + 1]  # blocks 0 -> 2
        slots = np.array(
            s + list(range(5 * BS, 5 * BS + r)) + [3 * BS, NB * BS, NB * BS + 1, NB * BS + 2],
            np.int32,
        )
    else:
        slots = np.concatenate(
            [np.arange(i * BS + 3, i * BS + 3 + r) for i in range(b)]
        ).astype(np.int32)
    slots = jnp.asarray(slots)

    want = cache
    for li in range(L):
        k = fresh[li, 0].reshape(b * r, HKV, D)
        v = fresh[li, 1].reshape(b * r, HKV, D)
        want = write_kv(want, k, v, slots, li)

    got_jnp = write_fresh_jnp(cache, fresh, slots)
    np.testing.assert_array_equal(np.asarray(want), np.asarray(got_jnp))

    from nano_pearl_tpu.ops.pallas.kv_writeback import write_fresh_pallas

    got_pl = write_fresh_pallas(cache, fresh, slots, r, interpret=True)
    np.testing.assert_array_equal(np.asarray(want), np.asarray(got_pl))


def test_engine_deferred_matches_ar():
    """End-to-end with the deferred path active (plain mesh, no quant):
    greedy PEARL == greedy AR, multi-round generation."""
    import sys

    sys.path.insert(0, "tests")
    from helpers import tiny_pearl_config

    from nano_pearl_tpu import PearlEngine
    from nano_pearl_tpu.config import SamplingParams

    eng = PearlEngine(tiny_pearl_config())
    assert eng.target._deferred_verify
    prompts = [[1, 2, 3, 4, 5], [9, 8, 7]]
    for p in prompts:
        eng.add_request(p, SamplingParams(temperature=0.0, max_tokens=24))
    pearl, n, acc, _ = eng.generate_token_ids()
    for p in prompts:
        eng.add_request(p, SamplingParams(temperature=0.0, max_tokens=24))
    ar, _, _, _ = eng.AR_generate_token_ids()
    assert pearl == ar


def test_cache_partials_merge_matches_jnp():
    """The "merge" deferred-attention mode (mono cache-partials kernel +
    dense fresh-window partials + (m, l) softmax combine) must equal the
    jnp fresh reference."""
    from nano_pearl_tpu.ops.attention import (
        fresh_window_partials,
        merge_attn_partials,
    )
    from nano_pearl_tpu.ops.pallas.paged_attention import (
        paged_attention_pallas_grouped_cache_partials,
    )

    b, r = 3, 4
    rng, cache, q, fk, fv, bt = _setup(11, b, r)
    cache = cache.astype(jnp.float32)
    ctx0_vals = [20, 9, 33]
    ctx = _ctx_arrays(b, r, ctx0_vals)
    ctx0 = jnp.asarray(ctx0_vals, jnp.int32)
    scale = D**-0.5
    ctx_cache = jnp.minimum(ctx, jnp.repeat(ctx0, r))
    for li in range(L):
        want = paged_attention_grouped_fresh_jnp(
            q, cache, li, bt, ctx, ctx0, fk[li], fv[li], scale
        )
        oc, mc, lc = paged_attention_pallas_grouped_cache_partials(
            q, cache, li, bt, ctx_cache, scale, r, interpret=True
        )
        of, mf, lf = fresh_window_partials(q, fk[li], fv[li], ctx, ctx0, scale, r)
        got = merge_attn_partials(oc, mc, lc, of, mf, lf, q.dtype)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=3e-5, atol=3e-5
        )


def test_cache_partials_merge_ctx0_zero():
    """First verify of a 1-token-prompt sequence: zero cache context —
    the cache side must export l = 0 and the fresh side must carry the
    row alone."""
    from nano_pearl_tpu.ops.attention import (
        fresh_window_partials,
        merge_attn_partials,
    )
    from nano_pearl_tpu.ops.pallas.paged_attention import (
        paged_attention_pallas_grouped_cache_partials,
    )

    b, r = 1, 4
    rng, cache, q, fk, fv, bt = _setup(12, b, r)
    cache = cache.astype(jnp.float32)
    ctx = jnp.asarray(np.arange(1, r + 1, dtype=np.int32))
    ctx0 = jnp.zeros((1,), jnp.int32)
    scale = D**-0.5
    want = paged_attention_grouped_fresh_jnp(
        q, cache, 0, bt, ctx, ctx0, fk[0], fv[0], scale
    )
    oc, mc, lc = paged_attention_pallas_grouped_cache_partials(
        q, cache, 0, bt, jnp.zeros_like(ctx), scale, r, interpret=True
    )
    of, mf, lf = fresh_window_partials(q, fk[0], fv[0], ctx, ctx0, scale, r)
    got = merge_attn_partials(oc, mc, lc, of, mf, lf, q.dtype)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=3e-5, atol=3e-5
    )
