"""Mosaic TPU lowering checks for every Pallas kernel wrapper — on CPU.

Interpret mode (the rest of the suite) validates kernel NUMERICS but
skips Mosaic's lowering rules (block-shape divisibility, memory spaces,
layout constraints), so a kernel can pass every CPU test and still fail
to compile on a real chip — exactly what happened to the partial-output
kernels' 2D (1, Hq) output blocks. ``jax.jit(f).trace(...).lower(
lowering_platforms=("tpu",))`` runs the full Mosaic lowering pipeline
without TPU hardware; these tests lower each wrapper at deliberately
awkward shapes (row counts not multiples of 8, non-power-of-2 rows per
group, bf16 + int8 + fp8 caches).
"""

import jax
import jax.numpy as jnp
import pytest

from nano_pearl_tpu.ops.kv_cache import make_kv_cache
from nano_pearl_tpu.ops.pallas.paged_attention import (
    paged_attention_pallas,
    paged_attention_pallas_grouped,
    paged_attention_pallas_grouped_partials,
    paged_attention_pallas_partials,
)
from nano_pearl_tpu.ops.pallas.prefill_attention import prefill_self_attention_pallas

L, NB, BS, HKV, D, HQ = 2, 6, 16, 2, 128, 8
SCALE = D**-0.5


def _lower_tpu(f, *args):
    jax.jit(f).trace(*args).lower(lowering_platforms=("tpu",))


def _cache(quant):
    return make_kv_cache(L, NB, BS, HKV, D, jnp.bfloat16, quant=quant)


QUANTS = [None, "int8", "fp8"]


@pytest.mark.parametrize("quant", QUANTS)
@pytest.mark.parametrize("n", [1, 5, 8])  # incl. rows not multiples of 8
def test_lower_decode(quant, n):
    m = 3
    args = (
        jnp.zeros((n, HQ, D), jnp.bfloat16),
        _cache(quant),
        jnp.int32(0),
        jnp.zeros((n, m), jnp.int32),
        jnp.ones((n,), jnp.int32),
    )
    _lower_tpu(lambda q, c, li, bt, cl: paged_attention_pallas(q, c, li, bt, cl, SCALE), *args)


@pytest.mark.parametrize("quant", QUANTS)
@pytest.mark.parametrize("b,r", [(1, 3), (3, 7), (2, 14)])  # odd rows-per-group
def test_lower_grouped(quant, b, r):
    m = 3
    args = (
        jnp.zeros((b * r, HQ, D), jnp.bfloat16),
        _cache(quant),
        jnp.int32(0),
        jnp.zeros((b, m), jnp.int32),
        jnp.ones((b * r,), jnp.int32),
    )
    _lower_tpu(
        lambda q, c, li, bt, cl: paged_attention_pallas_grouped(
            q, c, li, bt, cl, SCALE, rows_per_group=r
        ),
        *args,
    )


@pytest.mark.parametrize("quant", QUANTS)
@pytest.mark.parametrize("n", [1, 6, 8])  # incl. 8-aligned rows
def test_lower_partials(quant, n):
    m = 4
    args = (
        jnp.zeros((n, HQ, D), jnp.bfloat16),
        _cache(quant),
        jnp.int32(0),
        jnp.zeros((n, m), jnp.int32),
        jnp.ones((n,), jnp.int32),
        jnp.ones((n, m), jnp.int32),
    )
    _lower_tpu(
        lambda q, c, li, bt, cl, loc: paged_attention_pallas_partials(
            q, c, li, bt, cl, loc, SCALE
        ),
        *args,
    )


@pytest.mark.parametrize("quant", QUANTS)
@pytest.mark.parametrize("b,r", [(1, 5), (3, 7), (2, 14)])  # symmetric with test_lower_grouped
def test_lower_grouped_partials(quant, b, r):
    m = 4
    args = (
        jnp.zeros((b * r, HQ, D), jnp.bfloat16),
        _cache(quant),
        jnp.int32(0),
        jnp.zeros((b, m), jnp.int32),
        jnp.ones((b * r,), jnp.int32),
        jnp.ones((b, m), jnp.int32),
    )
    _lower_tpu(
        lambda q, c, li, bt, cl, loc: paged_attention_pallas_grouped_partials(
            q, c, li, bt, cl, loc, SCALE, rows_per_group=r
        ),
        *args,
    )


@pytest.mark.parametrize("b,lq", [(1, 64), (3, 40), (2, 200)])  # lq < and > 128
def test_lower_prefill_self(b, lq):
    n = b * lq
    args = (
        jnp.zeros((n, HQ, D), jnp.bfloat16),
        jnp.zeros((n, HKV, D), jnp.bfloat16),
        jnp.zeros((n, HKV, D), jnp.bfloat16),
        jnp.zeros((b, lq), jnp.int32),
    )
    _lower_tpu(
        lambda q, k, v, qp: prefill_self_attention_pallas(
            q, k, v, 0, None, qp, SCALE
        ),
        *args,
    )


@pytest.mark.parametrize("bs,hkv,d", [(256, 2, 64), (256, 8, 128), (64, 2, 64)])
def test_lower_db_kernels_bench_shapes(bs, hkv, d):
    """The double-buffered kernels at full-bench-like cache geometry
    (256-token blocks, folded Hkv*D minor dim): the round-2 Mosaic
    failure ('memref_slice must be aligned to tiling (128)') appeared
    only at these shapes, not the small lowering shapes above."""
    hq = hkv * 4
    cache = make_kv_cache(2, 6, bs, hkv, d, jnp.bfloat16)
    for n, r in ((3, 1), (2, 7)):
        args = (
            jnp.zeros((n * r, hq, d), jnp.bfloat16),
            cache,
            jnp.int32(0),
            jnp.zeros((n, 4), jnp.int32),
            jnp.ones((n * r,), jnp.int32),
        )
        if r == 1:
            _lower_tpu(
                lambda q, c, li, bt, cl: paged_attention_pallas(
                    q, c, li, bt, cl, SCALE
                ),
                args[0], args[1], args[2],
                jnp.zeros((n * r, 4), jnp.int32), args[4],
            )
        else:
            _lower_tpu(
                lambda q, c, li, bt, cl: paged_attention_pallas_grouped(
                    q, c, li, bt, cl, SCALE, rows_per_group=r
                ),
                *args,
            )


@pytest.mark.parametrize("bs,hkv,d", [(16, 2, 128), (256, 2, 128), (256, 8, 128)])
@pytest.mark.parametrize("b,r", [(2, 7), (3, 15)])
def test_lower_grouped_fresh(bs, hkv, d, b, r):
    """Deferred-write verify kernel (fresh K/V in-operand)."""
    from nano_pearl_tpu.ops.pallas.paged_attention import (
        paged_attention_pallas_grouped_fresh,
    )

    hq = hkv * 4
    cache = make_kv_cache(2, 6, bs, hkv, d, jnp.bfloat16)
    args = (
        jnp.zeros((b * r, hq, d), jnp.bfloat16),
        cache,
        jnp.int32(0),
        jnp.zeros((b, 4), jnp.int32),
        jnp.ones((b * r,), jnp.int32),
        jnp.zeros((b,), jnp.int32),
        jnp.zeros((b * r, hkv, d), jnp.bfloat16),
        jnp.zeros((b * r, hkv, d), jnp.bfloat16),
    )
    _lower_tpu(
        lambda q, c, li, bt, cl, c0, fk, fv: paged_attention_pallas_grouped_fresh(
            q, c, li, bt, cl, c0, fk, fv, SCALE, rows_per_group=r
        ),
        *args,
    )


@pytest.mark.parametrize("bs,hkv,d", [(16, 2, 128), (256, 2, 128)])
@pytest.mark.parametrize("b,r", [(2, 7), (3, 15)])
def test_lower_kv_writeback(bs, hkv, d, b, r):
    """Strided-DMA deferred writeback kernel."""
    from nano_pearl_tpu.ops.pallas.kv_writeback import write_fresh_pallas

    cache = make_kv_cache(2, 6, bs, hkv, d, jnp.bfloat16)
    fresh = jnp.zeros((2, 2, b * r, hkv * d), jnp.bfloat16)
    slots = jnp.zeros((b * r,), jnp.int32)
    _lower_tpu(
        lambda c, f, s: write_fresh_pallas(c, f, s, rows_per_group=r),
        cache, fresh, slots,
    )


@pytest.mark.parametrize("bs,hkv,d", [(256, 2, 128), (256, 8, 128), (32, 2, 64)])
@pytest.mark.parametrize("quant", ["int8", "fp8"])
@pytest.mark.parametrize("mono", [False, True])
def test_lower_q8_db_mono_kernels(bs, hkv, d, quant, mono):
    """Round-4 quantized db/mono kernels (manual value + scale DMAs) at
    bench-like cache geometry; these shapes take the fast path
    (_q8_fastpath_ok)."""
    from nano_pearl_tpu.ops.pallas.paged_attention import _q8_fastpath_ok

    hq = hkv * 4
    cache = make_kv_cache(2, 6, bs, hkv, d, jnp.bfloat16, quant=quant)
    s_cols = cache["s"].shape[-1]
    assert _q8_fastpath_ok(
        jnp.zeros((1, bs, s_cols), jnp.bfloat16), bs, hkv, d
    )
    for n, r in ((3, 1), (2, 7)):
        if r == 1:
            _lower_tpu(
                lambda q, c, li, bt, cl: paged_attention_pallas(
                    q, c, li, bt, cl, SCALE, mono=mono
                ),
                jnp.zeros((n, hq, d), jnp.bfloat16), cache, jnp.int32(0),
                jnp.zeros((n, 4), jnp.int32), jnp.ones((n,), jnp.int32),
            )
        else:
            _lower_tpu(
                lambda q, c, li, bt, cl: paged_attention_pallas_grouped(
                    q, c, li, bt, cl, SCALE, rows_per_group=r, mono=mono
                ),
                jnp.zeros((n * r, hq, d), jnp.bfloat16), cache, jnp.int32(0),
                jnp.zeros((n, 4), jnp.int32), jnp.ones((n * r,), jnp.int32),
            )


@pytest.mark.parametrize("bs,hkv,d", [(256, 2, 128), (256, 8, 128), (16, 2, 64)])
@pytest.mark.parametrize("b,lq", [(1, 256), (3, 40)])
def test_lower_prefill_prefix(bs, hkv, d, b, lq):
    """Round-4 paged-prefix prefill kernel (prefix pages streamed from
    the cache + causal fresh tiles)."""
    from nano_pearl_tpu.ops.pallas.prefill_attention import (
        prefill_prefix_attention_pallas,
    )

    hq = hkv * 4
    n = b * lq
    cache = make_kv_cache(2, 8, bs, hkv, d, jnp.bfloat16)
    args = (
        jnp.zeros((n, hq, d), jnp.bfloat16),
        jnp.zeros((n, hkv, d), jnp.bfloat16),
        jnp.zeros((n, hkv, d), jnp.bfloat16),
        cache,
        jnp.int32(0),
        jnp.zeros((b, 4), jnp.int32),
        jnp.full((b,), bs, jnp.int32),
        jnp.full((b,), lq, jnp.int32),
    )
    _lower_tpu(
        lambda q, k, v, c, li, bt, nc, nn: prefill_prefix_attention_pallas(
            q, k, v, c, li, bt, nc, nn, None, SCALE
        ),
        *args,
    )


def test_lower_pp_pallas_decode_and_verify():
    """Round-4: Pallas kernels inside a pipeline stage's partial-manual
    shard_map body (pp > 1, tp == 1) lower for TPU — decode and
    grouped-verify flavors via the manual_tp_attn shim."""
    from functools import partial

    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    import sys
    sys.path.insert(0, "tests")
    from helpers import tiny_model_config

    from nano_pearl_tpu.models.transformer import init_params, make_rope_table
    from nano_pearl_tpu.ops.attention import paged_attention, paged_attention_grouped
    from nano_pearl_tpu.parallel.pp import manual_tp_attn, pp_forward
    from nano_pearl_tpu.parallel.sharding import kv_cache_spec, param_specs

    cfg = tiny_model_config(
        num_hidden_layers=4, head_dim=128, hidden_size=512,
        num_attention_heads=4, num_key_value_heads=2, dtype="bfloat16",
    )
    mesh = Mesh(np.array(jax.devices()[:2]).reshape(2, 1), ("pp", "tp"))
    params = init_params(cfg, jax.random.key(0))
    rope = make_rope_table(cfg)
    kv = make_kv_cache(4, 7, 16, 2, 128, dtype=jnp.bfloat16)
    shard = lambda x, s: jax.device_put(x, NamedSharding(mesh, s))
    params_pp = jax.tree.map(
        shard, params, param_specs(cfg, pp=True), is_leaf=lambda x: isinstance(x, P)
    )
    kv_pp = shard(kv, kv_cache_spec(pp=True))
    n, m, r = 6, 4, 3
    vma = frozenset({"pp"})
    flavors = [
        (
            manual_tp_attn(
                mesh,
                partial(paged_attention, scale=0.1, use_pallas=True, mono=False, vma=vma),
            ),
            (jnp.zeros((n, m), jnp.int32), jnp.ones((n,), jnp.int32)),
            n,
        ),
        (
            manual_tp_attn(
                mesh,
                partial(
                    paged_attention_grouped, scale=0.1, use_pallas=True,
                    mono=False, vma=vma, rows_per_group=r,
                ),
            ),
            (jnp.zeros((n // r, m), jnp.int32), jnp.ones((n,), jnp.int32)),
            n,
        ),
    ]
    for attn, attn_args, rows in flavors:
        f = lambda p, c, t, pos, s, rt: pp_forward(
            mesh, cfg, p, c, t, pos, s, rt, attn, attn_args
        )
        args = (
            params_pp, kv_pp, jnp.zeros((rows,), jnp.int32),
            jnp.zeros((rows,), jnp.int32), jnp.zeros((rows,), jnp.int32), rope,
        )
        jax.jit(f).trace(*args).lower(lowering_platforms=("tpu",))


def test_lower_pp_tp_pallas_decode_and_verify():
    """Round-5: Pallas kernels under pp x tp — the tp_attn wrappers with
    mesh=None nest a tp shard_map INSIDE the pipeline stage's
    partial-manual body (engine/runner.py pp>1 & tp>1 selection), so the
    realistic 70B layout no longer forfeits the kernels (VERDICT r4
    item 4). Lowers decode, grouped-verify and fresh-KV prefill flavors
    for TPU on a (pp=2, tp=2) mesh."""
    from functools import partial

    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    import sys
    sys.path.insert(0, "tests")
    from helpers import tiny_model_config

    from nano_pearl_tpu.models.transformer import init_params, make_rope_table
    from nano_pearl_tpu.parallel.pp import pp_forward
    from nano_pearl_tpu.parallel.sharding import kv_cache_spec, param_specs
    from nano_pearl_tpu.parallel.tp_attn import (
        tp_paged_attention,
        tp_paged_attention_grouped,
        tp_prefill_self_attention,
    )

    cfg = tiny_model_config(
        num_hidden_layers=4, head_dim=128, hidden_size=512,
        num_attention_heads=4, num_key_value_heads=2, dtype="bfloat16",
    )
    mesh = Mesh(np.array(jax.devices()[:4]).reshape(2, 2), ("pp", "tp"))
    params = init_params(cfg, jax.random.key(0))
    rope = make_rope_table(cfg)
    kv = make_kv_cache(4, 7, 16, 2, 128, dtype=jnp.bfloat16)
    shard = lambda x, s: jax.device_put(x, NamedSharding(mesh, s))
    params_pp = jax.tree.map(
        shard, params, param_specs(cfg, pp=True), is_leaf=lambda x: isinstance(x, P)
    )
    kv_pp = shard(kv, kv_cache_spec(pp=True))
    n, m, r = 6, 4, 3
    vma = frozenset({"pp"})
    decode = partial(tp_paged_attention, None, scale=0.1, mono=False, vma=vma)
    grouped = partial(
        tp_paged_attention_grouped, None, scale=0.1, mono=False, vma=vma,
        rows_per_group=r,
    )
    prefill_self = partial(tp_prefill_self_attention, None, scale=0.1, vma=vma)
    prefill_self.wants_fresh_kv = True
    flavors = [
        (decode, (jnp.zeros((n, m), jnp.int32), jnp.ones((n,), jnp.int32)), n),
        (
            grouped,
            (jnp.zeros((n // r, m), jnp.int32), jnp.ones((n,), jnp.int32)),
            n,
        ),
        (
            prefill_self,
            (jnp.zeros((1, m), jnp.int32), jnp.zeros((1, n), jnp.int32)),
            n,
        ),
    ]
    for attn, attn_args, rows in flavors:
        f = lambda p, c, t, pos, s, rt: pp_forward(
            mesh, cfg, p, c, t, pos, s, rt, attn, attn_args
        )
        args = (
            params_pp, kv_pp, jnp.zeros((rows,), jnp.int32),
            jnp.zeros((rows,), jnp.int32), jnp.zeros((rows,), jnp.int32), rope,
        )
        jax.jit(f).trace(*args).lower(lowering_platforms=("tpu",))
