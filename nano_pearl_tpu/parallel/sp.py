"""Sequence (context) parallelism: KV cache sharded over blocks.

New capability beyond the reference (SURVEY §2.8: "Sequence/context
parallelism — No" there; long sequences were handled only by paged KV +
``max_model_len``). Here a model group's mesh gains an ``sp`` axis and
the paged KV cache's BLOCK axis is sharded over it: each sp shard owns a
contiguous range of block ids, so both KV memory and attention compute
scale with ``sp`` while every other layer of the model stays plain
tensor-parallel (weights replicated over sp — the FLOP duplication is
negligible exactly in the long-context regime where SP matters, because
attention dominates).

Mechanism (flash-decoding-style partial-softmax merge):

- writes: each shard localizes the global flat slot ids to its block
  range and drops the rest (``sp_write_kv``);
- reads: each shard computes attention scores ONLY over its local
  blocks (non-local block-table entries masked to -inf), takes the
  global running max with ``lax.pmax``, and the weighted numerator /
  denominator partials are summed with ``lax.psum`` — an exact softmax
  over the full context, with one small cross-shard collective pair per
  layer riding ICI.

Everything runs inside ``jax.shard_map`` over the group mesh: the ``tp``
axis stays manually partitioned too (attention is head-local, so the
body needs no tp collectives), and the surrounding GSPMD program keeps
handling the tensor-parallel linears.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from nano_pearl_tpu.ops.attention import NEG_INF, _gather_kv
from nano_pearl_tpu.ops.kv_cache import (
    cache_is_quantized,
    cache_kv_dims,
    write_kv,
)
from nano_pearl_tpu.parallel.mesh import SP_AXIS, TP_AXIS


def _smap(fn, mesh, in_specs, out_specs, nested: bool):
    """shard_map over (sp, tp) — either the full concrete mesh, or
    NESTED inside the pp partial-manual body (round-4 tp x pp x sp
    composition): the nested form omits the mesh (the context mesh
    already has pp manual) and manualizes just the remaining axes."""
    if nested:
        from nano_pearl_tpu.parallel.mesh import PP_AXIS

        inner = jax.shard_map(
            fn, in_specs=in_specs, out_specs=out_specs,
            axis_names={SP_AXIS, TP_AXIS}, check_vma=False,
        )

        def outer(*args):
            # check_vma=False strips varying-axis metadata; the pp body's
            # scan carries (the cache) need it back to type-match
            out = inner(*args)
            return jax.tree.map(
                lambda a: jax.lax.pcast(a, (PP_AXIS,), to="varying"), out
            )

        return outer
    return jax.shard_map(
        fn, mesh=mesh, in_specs=in_specs, out_specs=out_specs, check_vma=False
    )


def _cache_spec(cache):
    # folded cache [L, 2, NB+1, BS, Hkv*D]: tp shards the trailing folded
    # head axis (equivalent to sharding kv heads — pad_for_tp guarantees
    # hkv % tp == 0 so each shard gets whole heads)
    arr_spec = P(None, None, SP_AXIS, None, TP_AXIS)
    if cache_is_quantized(cache):
        return {"q": arr_spec, "s": P(None, None, SP_AXIS, None, TP_AXIS)}
    return arr_spec


def _local_block_range(cache):
    """(base, nb1_local) of this shard's global block-id range."""
    arr = cache["q"] if cache_is_quantized(cache) else cache
    nb1_local = arr.shape[2]
    return jax.lax.axis_index(SP_AXIS) * nb1_local, nb1_local


def sp_write_kv(mesh, cache, k, v, slots, layer_idx, nested: bool = False):
    """``ops.kv_cache.write_kv`` over a block-sharded cache: each shard
    rewrites global slots to its local range; out-of-range rows are sent
    to an always-out-of-bounds flat index so the scatter's ``mode="drop"``
    discards them (NOT merely offset — a negative local id would
    otherwise alias another layer's rows in the layer-folded flat
    layout)."""

    def body(cache, k, v, slots, layer_idx):
        base, nb1_local = _local_block_range(cache)
        arr = cache["q"] if cache_is_quantized(cache) else cache
        l, _, _, bs = arr.shape[:4]
        total_rows = l * 2 * nb1_local * bs
        block = slots // bs
        local_block = block - base
        ok = (local_block >= 0) & (local_block < nb1_local)
        local_slots = jnp.where(ok, local_block * bs + slots % bs, total_rows)
        return write_kv(cache, k, v, local_slots, layer_idx)

    cs = _cache_spec(cache)
    return _smap(
        body, mesh,
        (cs, P(None, TP_AXIS, None), P(None, TP_AXIS, None), P(), P()),
        cs, nested,
    )(cache, k, v, slots, layer_idx)


def _masked_partials(q, k, v, scores_mask, scale):
    """Per-shard flash partials with a global (pmax) running max.

    q [N, Hkv, G, D] f32, k/v [N, S, Hkv, D] f32, scores_mask [N, S].
    Returns (num [N,Hkv,G,D], den [N,Hkv,G,1]) already psum-merged."""
    scores = jnp.einsum("nkgd,nskd->nkgs", q, k) * scale
    scores = jnp.where(scores_mask[:, None, None, :], scores, NEG_INF)
    m_loc = jnp.max(scores, axis=-1, keepdims=True)
    m_glob = jax.lax.pmax(m_loc, SP_AXIS)
    p = jnp.exp(scores - m_glob)
    # rows with NO valid key anywhere get exp(0)=1 weights on garbage —
    # same as the non-sp path; such rows are padded and discarded
    p = jnp.where(scores_mask[:, None, None, :], p, 0.0)
    num = jnp.einsum("nkgs,nskd->nkgd", p, v)
    den = jnp.sum(p, axis=-1, keepdims=True)
    num = jax.lax.psum(num, SP_AXIS)
    den = jax.lax.psum(den, SP_AXIS)
    return num, den


def _local_kv(cache, layer_idx, tables, head_dim):
    """Gather this shard's rows for global block-table ``tables``;
    returns (k, v, is_local [..., M]) with non-local entries clamped (the
    clamped garbage is masked by the caller)."""
    base, nb1_local = _local_block_range(cache)
    local_tables = jnp.clip(tables - base, 0, nb1_local - 1)
    is_local = (tables >= base) & (tables < base + nb1_local)
    k, v = _gather_kv(cache, layer_idx, local_tables, head_dim)
    return k, v, is_local


def _dma_friendly_local_tables(tables, base, nb1_local):
    """(eff_tables, is_local): global ids localized to this shard; a
    non-local slot repeats the row's previous LOCAL block id so the
    Pallas pipeline sees an unchanged index and elides its HBM->VMEM
    copy (compute for the slot is skipped via the is_local prefetch)."""
    m = tables.shape[1]
    is_local = (tables >= base) & (tables < base + nb1_local)
    local = jnp.clip(tables - base, 0, nb1_local - 1)
    midx = jnp.where(is_local, jnp.arange(m, dtype=jnp.int32)[None, :], -1)
    last = jax.lax.cummax(midx, axis=1)
    eff = jnp.take_along_axis(local, jnp.clip(last, 0), axis=1)
    return eff, is_local


def _merge_partials(o, m_loc, l_loc, dtype):
    """Cross-shard softmax merge of (o_local, m, l) flash partials —
    identical math to the prefix-merge in ops/attention.py."""
    m_glob = jax.lax.pmax(m_loc, SP_AXIS)
    w = l_loc * jnp.exp(m_loc - m_glob)
    num = jax.lax.psum(o.astype(jnp.float32) * w[..., None], SP_AXIS)
    den = jax.lax.psum(w, SP_AXIS)
    return (num / jnp.maximum(den, 1e-30)[..., None]).astype(dtype)


def sp_paged_attention(
    mesh,
    q: jax.Array,  # [N, Hq, D]
    cache,
    layer_idx,
    block_tables: jax.Array,  # [N, M] global block ids
    context_lens: jax.Array,  # [N]
    scale: float,
    use_pallas: bool = False,
    interpret: bool = False,
    nested: bool = False,
) -> jax.Array:
    """Sequence-parallel decode/verify attention (per-token context
    lens), exact-match semantics with ``ops.attention.paged_attention_jnp``
    (tests/test_sp.py asserts bitwise-close equality). With
    ``use_pallas`` each shard runs the flash kernel over its local
    blocks and exports (o, m, l) partials for the cross-shard merge."""
    if use_pallas:
        from nano_pearl_tpu.ops.pallas.paged_attention import (
            paged_attention_pallas_partials,
        )

        def pbody(q, cache, layer_idx, tables, ctx):
            base, nb1_local = _local_block_range(cache)
            eff, is_local = _dma_friendly_local_tables(tables, base, nb1_local)
            o, m_loc, l_loc = paged_attention_pallas_partials(
                q, cache, layer_idx, eff, ctx, is_local, scale,
                interpret=interpret,
            )
            return _merge_partials(o, m_loc, l_loc, q.dtype)

        return _smap(
            pbody, mesh,
            (P(None, TP_AXIS, None), _cache_spec(cache), P(), P(), P()),
            P(None, TP_AXIS, None), nested,
        )(q, cache, layer_idx, block_tables, context_lens)

    def body(q, cache, layer_idx, tables, ctx):
        n, hq, d = q.shape
        bs, hkv, _ = cache_kv_dims(cache, d)
        m = tables.shape[1]
        s = m * bs
        g = hq // hkv
        k, v, is_local = _local_kv(cache, layer_idx, tables, d)
        slot_valid = jax.lax.broadcasted_iota(jnp.int32, (n, s), 1) < ctx[:, None]
        mask = slot_valid & jnp.repeat(is_local, bs, axis=1)
        num, den = _masked_partials(
            q.reshape(n, hkv, g, d).astype(jnp.float32), k, v, mask, scale
        )
        out = num / jnp.maximum(den, 1e-30)
        return out.reshape(n, hq, d).astype(q.dtype)

    return _smap(
        body, mesh,
        (P(None, TP_AXIS, None), _cache_spec(cache), P(), P(), P()),
        P(None, TP_AXIS, None), nested,
    )(q, cache, layer_idx, block_tables, context_lens)


def sp_prefill_attention(
    mesh,
    q: jax.Array,  # [N = B*Lq, Hq, D]
    cache,
    layer_idx,
    block_tables: jax.Array,  # [B, M]
    q_positions: jax.Array,  # [B, Lq]; -1 = padded row
    scale: float,
    nested: bool = False,
) -> jax.Array:
    """Sequence-parallel ragged causal prefill (the sp analogue of
    ``prefill_attention_jnp``: visibility = key position <= query
    position, which subsumes causality, raggedness, and prefix-cache
    reads)."""

    def body(q, cache, layer_idx, tables, q_pos):
        b, m = tables.shape
        n, hq, d = q.shape
        lq = n // b
        bs, hkv, _ = cache_kv_dims(cache, d)
        s = m * bs
        g = hq // hkv
        k, v, is_local = _local_kv(cache, layer_idx, tables, d)
        kv_pos = jax.lax.broadcasted_iota(jnp.int32, (b, lq, s), 2)
        visible = (kv_pos <= q_pos[:, :, None]) & jnp.repeat(is_local, bs, axis=1)[
            :, None, :
        ]  # [B, Lq, S]
        qb = q.reshape(b, lq, hkv, g, d).astype(jnp.float32)
        scores = jnp.einsum("blkgd,bskd->bklgs", qb, k) * scale
        scores = jnp.where(visible[:, None, :, None, :], scores, NEG_INF)
        m_loc = jnp.max(scores, axis=-1, keepdims=True)
        m_glob = jax.lax.pmax(m_loc, SP_AXIS)
        p = jnp.exp(scores - m_glob)
        p = jnp.where(visible[:, None, :, None, :], p, 0.0)
        num = jax.lax.psum(jnp.einsum("bklgs,bskd->blkgd", p, v), SP_AXIS)
        den = jax.lax.psum(jnp.sum(p, axis=-1), SP_AXIS)  # [B, Hkv, Lq, G]
        out = num / jnp.maximum(den.transpose(0, 2, 1, 3)[..., None], 1e-30)
        return out.reshape(n, hq, d).astype(q.dtype)

    return _smap(
        body, mesh,
        (P(None, TP_AXIS, None), _cache_spec(cache), P(), P(), P()),
        P(None, TP_AXIS, None), nested,
    )(q, cache, layer_idx, block_tables, q_positions)


def sp_paged_attention_grouped(
    mesh, q, cache, layer_idx, group_tables, context_lens, scale,
    rows_per_group, use_pallas: bool = False, interpret: bool = False,
    nested: bool = False,
):
    """Packed-verify attention under sp. With ``use_pallas`` the
    DMA-amortized grouped flash kernel runs per shard and the partials
    merge across sp; jnp path expands tables per-row and reuses the
    decode body."""
    if use_pallas:
        from nano_pearl_tpu.ops.pallas.paged_attention import (
            paged_attention_pallas_grouped_partials,
        )

        def pbody(q, cache, layer_idx, tables, ctx):
            base, nb1_local = _local_block_range(cache)
            eff, is_local = _dma_friendly_local_tables(tables, base, nb1_local)
            o, m_loc, l_loc = paged_attention_pallas_grouped_partials(
                q, cache, layer_idx, eff, ctx, is_local, scale,
                rows_per_group, interpret=interpret,
            )
            return _merge_partials(o, m_loc, l_loc, q.dtype)

        return _smap(
            pbody, mesh,
            (P(None, TP_AXIS, None), _cache_spec(cache), P(), P(), P()),
            P(None, TP_AXIS, None), nested,
        )(q, cache, layer_idx, group_tables, context_lens)

    bt_rows = jnp.repeat(group_tables, rows_per_group, axis=0)
    return sp_paged_attention(
        mesh, q, cache, layer_idx, bt_rows, context_lens, scale, nested=nested
    )
