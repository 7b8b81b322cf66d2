"""Unified paged attention with per-token context lengths.

One primitive serves every phase of the engine — this is the TPU
re-design of the reference's three attention paths
(reference: nano_pearl/layers/attention.py:71-80):

- ragged prefill (``flash_attn_varlen_func``): each new token is a query
  row whose context length equals its absolute position + 1; its K/V were
  just scattered into the paged cache, so attending over the paged cache
  with per-token lens reproduces causal varlen attention, including
  prefix-cache hits (cached blocks are simply part of the context).
- paged decode (``flash_attn_with_kvcache``): one query row per sequence,
  context length = sequence length.
- PEARL packed verify (reference: pearl_model_runner.py:560-588): gamma
  query rows per sequence with staircase context lengths — exactly the
  per-token-lens generality the other two are special cases of.

This module holds the jnp reference implementation (gather + masked
softmax, fp32 accumulation) which XLA maps onto the MXU; the Pallas
flash kernel with identical semantics lives in
nano_pearl_tpu/ops/pallas/ and is selected by ``paged_attention`` when
enabled.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from nano_pearl_tpu.ops.kv_cache import (
    cache_is_quantized,
    cache_kv_dims,
    dequant_rows,
    global_block_offsets,
)

NEG_INF = -1e30


def _gather_kv(cache, layer_idx, block_tables, head_dim):
    """Gather K and V rows for the given block-table rows from the FULL
    cache via layer-folded block indices (see kv_cache.global_block_offsets),
    dequantizing int8 caches after the gather (half the HBM read volume).
    Returns (k, v) shaped [..., M*BS, Hkv, D] in the cache dtype (f32 for
    quantized caches); the gathered copy is unfolded from the cache's
    [..., Hkv*D] storage layout. Downstream einsums accumulate in f32
    (preferred_element_type) — bf16 inputs are exact in f32, so keeping
    the gathered copy in bf16 halves its HBM traffic without changing a
    single bit of the result."""
    bs, hkv, d = cache_kv_dims(cache, head_dim)
    lead = block_tables.shape[:-1]
    m = block_tables.shape[-1]
    s_len = m * bs
    k_off, v_off = global_block_offsets(cache, layer_idx)
    if cache_is_quantized(cache):
        s_cols = cache["s"].shape[-1]  # Hkv * stride (kv_scale_stride)
        qb = cache["q"].reshape(-1, bs, hkv * d)
        sb = cache["s"].reshape(-1, bs, s_cols)
        kq = qb[block_tables + k_off].reshape(*lead, s_len, hkv * d)
        vq = qb[block_tables + v_off].reshape(*lead, s_len, hkv * d)
        ks = sb[block_tables + k_off].reshape(*lead, s_len, s_cols)
        vs = sb[block_tables + v_off].reshape(*lead, s_len, s_cols)
        return dequant_rows(kq, ks, d), dequant_rows(vq, vs, d)
    blocks = cache.reshape(-1, bs, hkv * d)
    k = blocks[block_tables + k_off].reshape(*lead, s_len, hkv, d)
    v = blocks[block_tables + v_off].reshape(*lead, s_len, hkv, d)
    return k, v


def paged_attention_jnp(
    q: jax.Array,  # [N, Hq, D]
    cache,  # FULL cache [L, 2, NB+1, BS, Hkv, D] (or int8 pytree)
    layer_idx,  # traced int32
    block_tables: jax.Array,  # [N, M] int32 (padded entries may be any valid id)
    context_lens: jax.Array,  # [N] int32, number of valid KV tokens incl. self
    scale: float,
) -> jax.Array:
    n, hq, d = q.shape
    bs, hkv, _d = cache_kv_dims(cache, d)
    m = block_tables.shape[1]
    s = m * bs
    g = hq // hkv

    k, v = _gather_kv(cache, layer_idx, block_tables, d)

    qg = q.reshape(n, hkv, g, d)
    scores = (
        jnp.einsum("nkgd,nskd->nkgs", qg, k, preferred_element_type=jnp.float32)
        * scale
    )

    valid = jax.lax.broadcasted_iota(jnp.int32, (n, s), 1) < context_lens[:, None]
    scores = jnp.where(valid[:, None, None, :], scores, NEG_INF)

    mx = jnp.max(scores, axis=-1, keepdims=True)
    p = jnp.exp(scores - mx)
    denom = jnp.sum(p, axis=-1, keepdims=True)
    p = p / jnp.maximum(denom, 1e-30)

    out = jnp.einsum("nkgs,nskd->nkgd", p, v, preferred_element_type=jnp.float32)
    return out.reshape(n, hq, d).astype(q.dtype)


def prefill_attention_jnp(
    q: jax.Array,  # [N = B*Lq, Hq, D] flat new-token queries, seq-major
    cache,  # FULL cache [L, 2, NB+1, BS, Hkv, D] (or int8 pytree)
    layer_idx,  # traced int32
    block_tables: jax.Array,  # [B, M] int32, one row per sequence
    q_positions: jax.Array,  # [B, Lq] int32 absolute positions; -1 = padded row
    scale: float,
) -> jax.Array:
    """Ragged causal prefill over the paged cache.

    Replaces the reference's ``flash_attn_varlen_func`` path including
    prefix-cache hits (reference: attention.py:71-76): new K/V were just
    scattered into the cache, so key position ``s`` is visible to the
    query at absolute position ``p`` iff ``s <= p`` — that single
    predicate is simultaneously the causal mask, the ragged-length mask,
    and the prefix-cache read (cached blocks hold s < num_cached).
    """
    b, m = block_tables.shape
    n, hq, d = q.shape
    lq = n // b
    bs, hkv, _d = cache_kv_dims(cache, d)
    s = m * bs
    g = hq // hkv

    k, v = _gather_kv(cache, layer_idx, block_tables, d)
    qb = q.reshape(b, lq, hkv, g, d)

    def chunk_attn(args):
        qc, qpos_c = args  # [B, C, Hkv, G, D], [B, C]
        c = qc.shape[1]
        scores = (
            jnp.einsum("blkgd,bskd->bklgs", qc, k, preferred_element_type=jnp.float32)
            * scale
        )
        kv_pos = jax.lax.broadcasted_iota(jnp.int32, (b, c, s), 2)
        visible = kv_pos <= qpos_c[:, :, None]  # [B, C, S]
        scores = jnp.where(visible[:, None, :, None, :], scores, NEG_INF)
        mx = jnp.max(scores, axis=-1, keepdims=True)
        p = jnp.exp(scores - mx)
        denom = jnp.sum(p, axis=-1, keepdims=True)
        p = p / jnp.maximum(denom, 1e-30)
        return jnp.einsum("bklgs,bskd->blkgd", p, v, preferred_element_type=jnp.float32)

    # bound the materialized [B, H, C, S] score tile: long prompts would
    # otherwise allocate O(Lq*S) at once (reference relies on flash-attn
    # tiling for the same reason)
    chunk = 128
    if lq <= chunk or lq % chunk != 0:
        out = chunk_attn((qb, q_positions))
    else:
        nc = lq // chunk
        qs = qb.reshape(b, nc, chunk, hkv, g, d).transpose(1, 0, 2, 3, 4, 5)
        ps = q_positions.reshape(b, nc, chunk).transpose(1, 0, 2)
        out = jax.lax.map(chunk_attn, (qs, ps))  # [nc, B, C, Hkv, G, D]
        out = out.transpose(1, 0, 2, 3, 4, 5).reshape(b, lq, hkv, g, d)
    return out.reshape(n, hq, d).astype(q.dtype)


def prefill_self_attention_jnp(
    q: jax.Array,  # [N = B*Lq, Hq, D] flat new-token queries, seq-major
    k: jax.Array,  # [N, Hkv, D] the batch's FRESH post-rope keys
    v: jax.Array,  # [N, Hkv, D]
    layer_idx,  # unused (protocol compatibility)
    block_tables: jax.Array,  # unused (protocol compatibility)
    q_positions: jax.Array,  # [B, Lq] int32 absolute positions; -1 = padded row
    scale: float,
) -> jax.Array:
    """Causal prefill self-attention over the batch's fresh K/V — the
    no-prefix-cache-hit case never needs to READ the paged cache (it just
    wrote these exact rows). Reading back through the cache makes the
    layer scatter-then-gather the 1+ GiB cache carry, which XLA lowers to
    a whole-cache copy per layer: measured 271 ms of the 330 ms target
    prefill on v5e (36L, 4096 rows) vs ~10 ms for this path. This is the
    reference's ``flash_attn_varlen_func``-without-block-table shape
    (reference: attention.py:71-76); prefix-cache hits take
    ``prefill_attention_jnp`` instead. Consumers mark this flavor with
    ``wants_fresh_kv`` (models/transformer.run_layers)."""
    b, lq = q_positions.shape
    n, hq, d = q.shape
    hkv = k.shape[1]
    g = hq // hkv
    qb = q.reshape(b, lq, hkv, g, d)
    kb = k.reshape(b, lq, hkv, d)
    vb = v.reshape(b, lq, hkv, d)
    kv_pos = q_positions  # keys are the same rows as the queries

    def chunk_attn(args):
        qc, qpos_c = args  # [B, C, Hkv, G, D], [B, C]
        scores = (
            jnp.einsum("blkgd,bskd->bklgs", qc, kb, preferred_element_type=jnp.float32)
            * scale
        )
        visible = (kv_pos[:, None, :] >= 0) & (
            kv_pos[:, None, :] <= qpos_c[:, :, None]
        )  # [B, C, Lq]
        scores = jnp.where(visible[:, None, :, None, :], scores, NEG_INF)
        mx = jnp.max(scores, axis=-1, keepdims=True)
        p = jnp.exp(scores - mx)
        denom = jnp.sum(p, axis=-1, keepdims=True)
        p = p / jnp.maximum(denom, 1e-30)
        return jnp.einsum("bklgs,bskd->blkgd", p, vb, preferred_element_type=jnp.float32)

    chunk = 128
    if lq <= chunk or lq % chunk != 0:
        out = chunk_attn((qb, q_positions))
    else:
        nc = lq // chunk
        qs = qb.reshape(b, nc, chunk, hkv, g, d).transpose(1, 0, 2, 3, 4, 5)
        ps = q_positions.reshape(b, nc, chunk).transpose(1, 0, 2)
        out = jax.lax.map(chunk_attn, (qs, ps))
        out = out.transpose(1, 0, 2, 3, 4, 5).reshape(b, lq, hkv, g, d)
    return out.reshape(n, hq, d).astype(q.dtype)


def prefill_self_attention(
    q, k, v, layer_idx, block_tables, q_positions, scale, use_pallas=None,
    vma=None,
):
    """Dispatch the fresh-KV prefill to the Pallas flash kernel when
    enabled (VMEM-resident flash statistics, no materialized score
    tiles), else the chunked jnp path."""
    if use_pallas is None:
        from nano_pearl_tpu.ops.pallas import attention_enabled

        use_pallas = attention_enabled()
    if use_pallas:
        from nano_pearl_tpu.ops.pallas.prefill_attention import (
            prefill_self_attention_pallas,
        )

        return prefill_self_attention_pallas(
            q, k, v, layer_idx, block_tables, q_positions, scale, vma=vma
        )
    return prefill_self_attention_jnp(
        q, k, v, layer_idx, block_tables, q_positions, scale
    )


def gather_prefix_kv(cache, block_tables: jax.Array, head_dim: int):
    """Pre-gather the cached-prefix K/V for ALL layers:
    [L, B, M*BS, Hkv, D] (x2). Runs BEFORE the layer scan, so the scan's
    KV scatters never conflict with a cache read and stay in place (see
    prefill_self_attention_jnp for why that matters). Quantized caches
    dequantize here (f32)."""
    if cache_is_quantized(cache):
        q, s = cache["q"], cache["s"]
        k = dequant_rows(q[:, 0][:, block_tables], s[:, 0][:, block_tables], head_dim)
        v = dequant_rows(q[:, 1][:, block_tables], s[:, 1][:, block_tables], head_dim)
        l, b, m, bs, hkv, d = k.shape
    else:
        k = cache[:, 0][:, block_tables]  # [L, B, M, BS, Hkv*D]
        v = cache[:, 1][:, block_tables]
        l, b, m, bs = k.shape[:4]
        d = head_dim
        hkv = k.shape[-1] // d
    return k.reshape(l, b, m * bs, hkv, d), v.reshape(l, b, m * bs, hkv, d)


def _partial_softmax(scores: jax.Array, visible: jax.Array, v: jax.Array):
    """Flash-style partials over the key axis (last): returns
    (m [.. ,1], l [.., 1], o_unnormalized) with -inf-safe masking."""
    scores = jnp.where(visible, scores, NEG_INF)
    m = jnp.max(scores, axis=-1, keepdims=True)
    # rows with nothing visible: exp(NEG_INF - NEG_INF) would be 1 — pin
    # the max at 0 so p underflows to exp(NEG_INF) = 0 instead
    m_safe = jnp.maximum(m, -1e29)
    p = jnp.exp(scores - m_safe)
    p = jnp.where(visible, p, 0.0)
    l = jnp.sum(p, axis=-1, keepdims=True)
    o = jnp.einsum("...s,...sd->...d", p, v, preferred_element_type=jnp.float32)
    return m_safe, l, o


def prefill_prefix_attention_jnp(
    q: jax.Array,  # [N = B*Lq, Hq, D] flat new-token queries, seq-major
    k: jax.Array,  # [N, Hkv, D] fresh post-rope keys for the new tokens
    v: jax.Array,  # [N, Hkv, D]
    layer_idx,  # traced int32
    prefix_k: jax.Array,  # [L, B, S_pre, Hkv, D] pre-gathered cached prefix
    prefix_v: jax.Array,  # [L, B, S_pre, Hkv, D]
    num_cached: jax.Array,  # [B] int32 cached-prefix lengths
    q_positions: jax.Array,  # [B, Lq] int32 absolute positions; -1 = padded
    scale: float,
) -> jax.Array:
    """Prefill attention for batches WITH prefix-cache hits: causal
    self-attention over the fresh K/V merged (log-sum-exp flash partials)
    with full attention over the pre-gathered cached prefix. Covers the
    reference's prefix-cache prefill (flash_attn_varlen_func with a
    paged block_table, attention.py:71-76) without reading the cache
    inside the layer scan. Marked ``wants_fresh_kv``."""
    b, lq = q_positions.shape
    n, hq, d = q.shape
    hkv = k.shape[1]
    g = hq // hkv
    qb = q.reshape(b, lq, hkv, g, d)
    kb = k.reshape(b, lq, hkv, d)
    vb = v.reshape(b, lq, hkv, d)
    pk = prefix_k[layer_idx].astype(jnp.float32)  # [B, S_pre, Hkv, D]
    pv = prefix_v[layer_idx].astype(jnp.float32)
    s_pre = pk.shape[1]
    kv_pos = q_positions

    # values pre-arranged for the partial einsum: [B, K, 1, 1, S, D]
    vb_e = vb.transpose(0, 2, 1, 3)[:, :, None, None]
    pv_e = pv.transpose(0, 2, 1, 3)[:, :, None, None]
    s_iota = jax.lax.broadcasted_iota(jnp.int32, (b, s_pre), 1)

    def chunk_attn(args):
        qc, qpos_c = args  # [B, C, Hkv, G, D], [B, C]
        # fresh-token (causal) part — scores [B, K, C, G, S=lq]
        sc_s = (
            jnp.einsum("blkgd,bskd->bklgs", qc, kb, preferred_element_type=jnp.float32)
            * scale
        )
        vis_s = (kv_pos[:, None, :] >= 0) & (kv_pos[:, None, :] <= qpos_c[:, :, None])
        m_s, l_s, o_s = _partial_softmax(sc_s, vis_s[:, None, :, None, :], vb_e)
        # prefix part: every real query row sees positions < num_cached
        sc_p = (
            jnp.einsum("blkgd,bskd->bklgs", qc, pk, preferred_element_type=jnp.float32)
            * scale
        )
        vis_p = (s_iota[:, None, :] < num_cached[:, None, None]) & (
            qpos_c[:, :, None] >= 0
        )
        m_p, l_p, o_p = _partial_softmax(sc_p, vis_p[:, None, :, None, :], pv_e)
        mx = jnp.maximum(m_s, m_p)
        a_s = jnp.exp(m_s - mx)
        a_p = jnp.exp(m_p - mx)
        l = l_s * a_s + l_p * a_p
        o = (o_s * a_s + o_p * a_p) / jnp.maximum(l, 1e-30)
        return o.transpose(0, 2, 1, 3, 4)  # [B, C, K, G, D]

    chunk = 128
    if lq <= chunk or lq % chunk != 0:
        out = chunk_attn((qb, q_positions))
    else:
        nc = lq // chunk
        qs = qb.reshape(b, nc, chunk, hkv, g, d).transpose(1, 0, 2, 3, 4, 5)
        ps = q_positions.reshape(b, nc, chunk).transpose(1, 0, 2)
        out = jax.lax.map(chunk_attn, (qs, ps))  # [nc, B, C, K, G, D]
        out = out.transpose(1, 0, 2, 3, 4, 5).reshape(b, lq, hkv, g, d)
    return out.reshape(n, hq, d).astype(q.dtype)


def paged_attention_grouped(
    q, cache, layer_idx, group_tables, context_lens, scale, rows_per_group,
    use_pallas=None, mono=None, vma=None,
):
    """Packed-verify attention: ``rows_per_group`` query rows per sequence
    share one block table (reference shape: pearl_model_runner.py:560-588).
    The Pallas path amortizes each KV-block DMA across the group's rows."""
    if use_pallas is None:
        from nano_pearl_tpu.ops.pallas import attention_enabled

        use_pallas = attention_enabled()
    if use_pallas:
        from nano_pearl_tpu.ops.pallas.paged_attention import (
            paged_attention_pallas_grouped,
        )

        return paged_attention_pallas_grouped(
            q, cache, layer_idx, group_tables, context_lens, scale,
            rows_per_group, mono=mono, vma=vma,
        )
    bt_rows = jnp.repeat(group_tables, rows_per_group, axis=0)
    return paged_attention_jnp(q, cache, layer_idx, bt_rows, context_lens, scale)


def paged_attention_grouped_fresh_jnp(
    q: jax.Array,  # [B*R, Hq, D]
    cache,  # FULL cache (READ-ONLY pre-round context — fresh rows NOT written)
    layer_idx,
    group_tables: jax.Array,  # [B, M]
    context_lens: jax.Array,  # [B*R] per-row ctx incl. visible fresh rows
    ctx0: jax.Array,  # [B] pre-round context per group (fresh rows excluded)
    fresh_k: jax.Array,  # [B*R, Hkv, D] this layer's post-rope fresh keys
    fresh_v: jax.Array,  # [B*R, Hkv, D]
    scale: float,
) -> jax.Array:
    """Packed-verify attention with DEFERRED KV writes: the cache holds
    only the pre-round context (positions < ctx0); this round's packed
    rows attend to it plus the fresh K/V passed in-operand. Equivalent to
    writing the fresh rows then running paged_attention_grouped, without
    the per-layer scatter (measured ~40 us per 448-row scatter on v5e —
    ~2.9 ms of a 9.6 ms verify forward; see tools/probe_kv_write.py).
    The engine writes the whole round's fresh KV back in ONE pass after
    the layer scan (ops/kv_cache.write_fresh / the Pallas writeback)."""
    n, hq, d = q.shape
    b, m = group_tables.shape
    r = n // b
    bs, hkv, _d = cache_kv_dims(cache, d)
    s = m * bs
    g = hq // hkv

    k, v = _gather_kv(cache, layer_idx, group_tables, d)  # [B, S, Hkv, D]
    fk = fresh_k.reshape(b, r, hkv, d).astype(k.dtype)
    fv = fresh_v.reshape(b, r, hkv, d).astype(v.dtype)
    k = jnp.concatenate([k, fk], axis=1)  # [B, S+R, Hkv, D]
    v = jnp.concatenate([v, fv], axis=1)

    qb = q.reshape(b, r, hkv, g, d)
    scores = (
        jnp.einsum("brkgd,bskd->brkgs", qb, k, preferred_element_type=jnp.float32)
        * scale
    )

    ctx_rows = context_lens.reshape(b, r)
    # cache slots: absolute position p visible iff p < min(ctx_row, ctx0)
    # (the cache beyond ctx0 is stale — fresh data is in-operand instead);
    # fresh slot t sits at absolute position ctx0 + t
    pos_c = jax.lax.broadcasted_iota(jnp.int32, (b, r, s), 2)
    lim_c = jnp.minimum(ctx_rows, ctx0[:, None])[:, :, None]
    vis_c = pos_c < lim_c
    pos_f = ctx0[:, None, None] + jax.lax.broadcasted_iota(jnp.int32, (b, r, r), 2)
    vis_f = pos_f < ctx_rows[:, :, None]
    visible = jnp.concatenate([vis_c, vis_f], axis=2)  # [B, R, S+R]
    scores = jnp.where(visible[:, :, None, None, :], scores, NEG_INF)

    mx = jnp.max(scores, axis=-1, keepdims=True)
    p = jnp.exp(scores - mx)
    denom = jnp.sum(p, axis=-1, keepdims=True)
    p = p / jnp.maximum(denom, 1e-30)
    out = jnp.einsum("brkgs,bskd->brkgd", p, v, preferred_element_type=jnp.float32)
    return out.reshape(n, hq, d).astype(q.dtype)


M_FLOOR = -1e29  # matches ops/pallas/paged_attention.M_FLOOR


def fresh_window_partials(
    q: jax.Array,  # [B*R, Hq, D]
    fresh_k: jax.Array,  # [B*R, Hkv, D] this layer's post-rope fresh keys
    fresh_v: jax.Array,  # [B*R, Hkv, D]
    context_lens: jax.Array,  # [B*R] per-row ctx incl. visible fresh rows
    ctx0: jax.Array,  # [B] pre-round context per group
    scale: float,
    rows_per_group: int,
):
    """Flash partials (o normalized, m, l) of each packed-verify row's
    attention over its group's FRESH window only (fresh slot t sits at
    absolute position ctx0 + t; row visibility is the staircase
    pos < ctx_row). Dense [B, R, R] scores — tiny — computed as plain
    XLA ops; merged with the cache-side Pallas partials by
    merge_attn_partials."""
    n, hq, d = q.shape
    r = rows_per_group
    b = n // r
    hkv = fresh_k.shape[1]
    g = hq // hkv
    qb = q.reshape(b, r, hkv, g, d)
    fk = fresh_k.reshape(b, r, hkv, d)
    fv = fresh_v.reshape(b, r, hkv, d)
    scores = (
        jnp.einsum(
            "brkgd,bskd->brkgs", qb, fk.astype(qb.dtype),
            preferred_element_type=jnp.float32,
        )
        * scale
    )
    ctx_rows = context_lens.reshape(b, r)
    pos_f = ctx0[:, None, None] + jax.lax.broadcasted_iota(jnp.int32, (b, r, r), 2)
    vis = (pos_f < ctx_rows[:, :, None])[:, :, None, None, :]
    scores = jnp.where(vis, scores, M_FLOOR)
    m = jnp.max(scores, axis=-1)  # [B, R, Hkv, G]
    p = jnp.where(vis, jnp.exp(scores - m[..., None]), 0.0)
    l = jnp.sum(p, axis=-1)
    o = jnp.einsum(
        "brkgs,bskd->brkgd", p, fv.astype(jnp.float32),
        preferred_element_type=jnp.float32,
    ) / jnp.maximum(l, 1e-30)[..., None]
    return (
        o.reshape(n, hq, d).astype(q.dtype),
        m.reshape(n, hq),
        l.reshape(n, hq),
    )


def merge_attn_partials(o1, m1, l1, o2, m2, l2, dtype):
    """Softmax-combine two flash partial sets (o normalized by the local
    denom, m row max, l sum-of-exp) — the same math as the SP cross-
    shard merge (parallel/sp.py:_merge_partials). A side with nothing
    visible carries l = 0 and contributes nothing."""
    m_g = jnp.maximum(m1, m2)
    w1 = l1 * jnp.exp(m1 - m_g)
    w2 = l2 * jnp.exp(m2 - m_g)
    num = o1.astype(jnp.float32) * w1[..., None] + o2.astype(jnp.float32) * w2[..., None]
    den = jnp.maximum(w1 + w2, 1e-30)
    return (num / den[..., None]).astype(dtype)


def paged_attention_grouped_fresh(
    q, cache, layer_idx, group_tables, context_lens, ctx0, fresh_k, fresh_v,
    scale, rows_per_group, use_pallas=None, mono=None, split=False,
):
    """Dispatch the deferred-write packed-verify attention.

    Pallas default under the mono schedule ("merge"): the mono
    cache-partials kernel attends the pre-round cache (uniform per-group
    context min(ctx, ctx0)) while the R x R fresh window runs as dense
    XLA ops, merged by (m, l) — the in-kernel per-group fresh update of
    the "kernel" mode (NANO_PEARL_FRESH_MODE=kernel) costs ~1.5 us x
    groups x layers of fixed VPU latency (~+1.7 ms/forward at bench
    shapes). The db schedule (mono off) takes the db fresh kernel — the
    cache-partials kernel is mono-only."""
    if use_pallas is None:
        from nano_pearl_tpu.ops.pallas import attention_enabled

        use_pallas = attention_enabled()
    if use_pallas:
        import os

        from nano_pearl_tpu.ops.pallas.paged_attention import _resolve_mono

        if split:
            # round-aligned split-boundary schedule: cell partition
            # bitwise-matches the split decode (paged_attention_split)
            from nano_pearl_tpu.ops.pallas.paged_attention import (
                paged_attention_pallas_grouped_fresh_split,
            )

            return paged_attention_pallas_grouped_fresh_split(
                q, cache, layer_idx, group_tables, context_lens, ctx0,
                fresh_k, fresh_v, scale, rows_per_group,
            )
        mono = _resolve_mono(mono)
        if mono and os.environ.get("NANO_PEARL_FRESH_MODE", "merge") == "merge":
            from nano_pearl_tpu.ops.pallas.paged_attention import (
                paged_attention_pallas_grouped_cache_partials,
            )

            b = group_tables.shape[0]
            r = rows_per_group
            ctx_cache = jnp.minimum(
                context_lens, jnp.repeat(ctx0, r, total_repeat_length=b * r)
            )
            oc, mc, lc = paged_attention_pallas_grouped_cache_partials(
                q, cache, layer_idx, group_tables, ctx_cache, scale, r
            )
            of, mf, lf = fresh_window_partials(
                q, fresh_k, fresh_v, context_lens, ctx0, scale, r
            )
            return merge_attn_partials(oc, mc, lc, of, mf, lf, q.dtype)
        from nano_pearl_tpu.ops.pallas.paged_attention import (
            paged_attention_pallas_grouped_fresh,
        )

        return paged_attention_pallas_grouped_fresh(
            q, cache, layer_idx, group_tables, context_lens, ctx0,
            fresh_k, fresh_v, scale, rows_per_group, mono=mono,
        )
    return paged_attention_grouped_fresh_jnp(
        q, cache, layer_idx, group_tables, context_lens, ctx0,
        fresh_k, fresh_v, scale,
    )


def paged_attention_split(
    q, cache, layer_idx, block_tables, context_lens, b1, scale,
    use_pallas=None, vma=None,
):
    """Decode attention on the round-aligned SPLIT-BOUNDARY schedule
    (ops/pallas/paged_attention.paged_attention_pallas_split): the draft
    gamma-scan flavor whose flash cell partition bitwise-matches the
    deferred-write verify's. ``b1`` = the VERIFYING round's fresh-window
    start per row. jnp fallback ignores the boundary (the jnp path is
    the associativity-agnostic reference)."""
    if use_pallas is None:
        from nano_pearl_tpu.ops.pallas import attention_enabled

        use_pallas = attention_enabled()
    if use_pallas:
        from nano_pearl_tpu.ops.pallas.paged_attention import (
            paged_attention_pallas_split,
        )

        return paged_attention_pallas_split(
            q, cache, layer_idx, block_tables, context_lens, b1, scale,
            vma=vma,
        )
    return paged_attention_jnp(q, cache, layer_idx, block_tables, context_lens, scale)


def paged_attention(q, cache, layer_idx, block_tables, context_lens, scale, use_pallas=None, mono=None, vma=None):
    """Dispatch to the Pallas kernel when enabled, else the jnp path."""
    if use_pallas is None:
        from nano_pearl_tpu.ops.pallas import attention_enabled

        use_pallas = attention_enabled()
    if use_pallas:
        from nano_pearl_tpu.ops.pallas.paged_attention import paged_attention_pallas

        return paged_attention_pallas(
            q, cache, layer_idx, block_tables, context_lens, scale, mono=mono,
            vma=vma,
        )
    return paged_attention_jnp(q, cache, layer_idx, block_tables, context_lens, scale)
