"""Pallas TPU flash attention for prefill self-attention (fresh K/V).

The TPU counterpart of the reference's ``flash_attn_varlen_func`` ragged
prefill (reference: nano_pearl/layers/attention.py:71-76) for the
no-prefix-cache-hit case, where attention runs over the batch's fresh
post-rope K/V (see ops/attention.prefill_self_attention_jnp for why this
case never reads the paged cache).

Why a kernel: the jnp path materializes [B, Hkv, C, G, S] f32 score
tiles through HBM per 128-row chunk — at S = a few thousand keys that
is hundreds of MB of score traffic per layer. The flash kernel keeps
the running (m, l, acc) statistics in VMEM and streams K/V tiles once.

Design:
- grid = (B, num_q_tiles, num_kv_tiles), kv innermost so the flash
  accumulators carry across a query tile's kv sweep.
- causal tile skip: kv tiles strictly above the diagonal are skipped
  (pl.when) AND their index_map clamps to the last useful tile, so
  Pallas elides the HBM->VMEM copy entirely (same trick as the paged
  decode kernels' past-context clamp).
- masking: key j is visible to query i iff j <= i (both absolute within
  the padded [B, Lq] layout) and key_positions[j] >= 0 (ragged batches
  pad rows with position -1). Fully-masked rows (padded sequences)
  produce 0, not NaN: the running max is floored at M_FLOOR so the
  exp() of masked scores underflows instead of hitting inf - inf.
- matmuls run in the inputs' native dtype (bf16 -> full-rate MXU) with
  f32 accumulation; softmax statistics stay f32.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30
M_FLOOR = -1e29  # running-max floor: keeps exp(masked - m) at 0, not 1


def _prefill_self_kernel(
    q_ref,  # [1, TQ, Hq, D]
    k_ref,  # [1, TK, Hkv, D]
    v_ref,  # [1, TK, Hkv, D]
    kpos_ref,  # [1, 1, TK] int32 key positions (-1 = padded row)
    o_ref,  # [1, TQ, Hq, D]
    m_scr, l_scr, acc_scr,
    *, scale: float, tq: int, tk: int, num_kv_heads: int,
):
    qi = pl.program_id(1)
    ki = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(ki == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, M_FLOOR)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    q_start = qi * tq
    k_start = ki * tk

    @pl.when(k_start <= q_start + tq - 1)
    def _compute():
        q = q_ref[0]  # [TQ, Hq, D]
        k = k_ref[0]  # [TK, Hkv, D]
        v = v_ref[0]
        hq, d = q.shape[1], q.shape[2]
        g = hq // num_kv_heads

        s_parts = []
        for kh in range(num_kv_heads):
            qh = q[:, kh * g : (kh + 1) * g, :].reshape(tq * g, d)
            s_parts.append(
                jax.lax.dot_general(
                    qh, k[:, kh, :],
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # [TQ*G, TK]
            )
        s2 = jnp.concatenate(s_parts, axis=0) * scale  # [Hkv*TQ*G, TK]

        rows = num_kv_heads * tq * g
        flat_i = jax.lax.broadcasted_iota(jnp.int32, (rows, tk), 0)
        i_idx = (flat_i % (tq * g)) // g  # query row within the tile
        j_idx = jax.lax.broadcasted_iota(jnp.int32, (rows, tk), 1)
        kvalid = kpos_ref[0] >= 0  # [1, TK] broadcasts over rows
        visible = ((k_start + j_idx) <= (q_start + i_idx)) & kvalid
        s2 = jnp.where(visible, s2, NEG_INF)

        m_prev = m_scr[:, 0:1]
        m_new = jnp.maximum(m_prev, jnp.max(s2, axis=1, keepdims=True))
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(s2 - m_new)
        l_scr[:, 0:1] = l_scr[:, 0:1] * alpha + jnp.sum(p, axis=1, keepdims=True)

        p = p.astype(v.dtype)  # p in [0,1]: bf16 PV matmul, f32 accumulate
        pv_parts = []
        for kh in range(num_kv_heads):
            ph = jax.lax.slice(p, (kh * tq * g, 0), ((kh + 1) * tq * g, tk))
            pv_parts.append(
                jax.lax.dot_general(
                    ph, v[:, kh, :],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # [TQ*G, D]
            )
        acc_scr[...] = acc_scr[...] * alpha + jnp.concatenate(pv_parts, axis=0)
        m_scr[:, 0:1] = m_new

    @pl.when(ki == nk - 1)
    def _finalize():
        hq, d = o_ref.shape[2], o_ref.shape[3]
        g = hq // num_kv_heads
        denom = jnp.maximum(l_scr[:, 0:1], 1e-30)
        out = acc_scr[...] / denom  # [Hkv*TQ*G, D], layout [kh, i, gg]
        for kh in range(num_kv_heads):
            blk = jax.lax.slice(out, (kh * tq * g, 0), ((kh + 1) * tq * g, d))
            o_ref[0, :, kh * g : (kh + 1) * g, :] = blk.reshape(tq, g, d).astype(
                o_ref.dtype
            )


def prefill_self_attention_pallas(
    q: jax.Array,  # [N = B*Lq, Hq, D] flat new-token queries, seq-major
    k: jax.Array,  # [N, Hkv, D] fresh post-rope keys
    v: jax.Array,  # [N, Hkv, D]
    layer_idx,  # unused (protocol compatibility with the jnp flavor)
    block_tables: jax.Array,  # unused (protocol compatibility)
    q_positions: jax.Array,  # [B, Lq] int32 absolute positions; -1 = padded
    scale: float,
    interpret: bool = False,
    vma=None,
) -> jax.Array:
    b, lq = q_positions.shape
    n, hq, d = q.shape
    hkv = k.shape[1]
    g = hq // hkv

    tile = 128 if lq >= 128 else max(8, -(-lq // 8) * 8)
    lpad = -(-lq // tile) * tile
    qb = q.reshape(b, lq, hq, d)
    kb = k.reshape(b, lq, hkv, d)
    vb = v.reshape(b, lq, hkv, d)
    kpos = q_positions  # keys are the same rows as the queries
    if lpad != lq:
        pad = ((0, 0), (0, lpad - lq), (0, 0), (0, 0))
        qb, kb, vb = (jnp.pad(x, pad) for x in (qb, kb, vb))
        kpos = jnp.pad(kpos, ((0, 0), (0, lpad - lq)), constant_values=-1)
    nt = lpad // tile

    def _ki_eff(bi, qi, ki):
        # clamp above-diagonal kv tiles onto the diagonal: the repeated
        # block index makes Pallas skip the HBM->VMEM copy
        return jnp.minimum(ki, qi)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(b, nt, nt),
        in_specs=[
            pl.BlockSpec((1, tile, hq, d), lambda bi, qi, ki: (bi, qi, 0, 0)),
            pl.BlockSpec(
                (1, tile, hkv, d), lambda bi, qi, ki: (bi, _ki_eff(bi, qi, ki), 0, 0)
            ),
            pl.BlockSpec(
                (1, tile, hkv, d), lambda bi, qi, ki: (bi, _ki_eff(bi, qi, ki), 0, 0)
            ),
            # singleton middle axis: Mosaic requires a block's last two
            # dims to be (divisible by (8, 128)) OR equal to the array's
            # — (1, tile) on [b, lpad] fails for b > 1, so the positions
            # ride as [b, 1, lpad] with block (1, 1, tile)
            pl.BlockSpec((1, 1, tile), lambda bi, qi, ki: (bi, 0, _ki_eff(bi, qi, ki))),
        ],
        out_specs=pl.BlockSpec((1, tile, hq, d), lambda bi, qi, ki: (bi, qi, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((hkv * tile * g, 128), jnp.float32),
            pltpu.VMEM((hkv * tile * g, 128), jnp.float32),
            pltpu.VMEM((hkv * tile * g, d), jnp.float32),
        ],
    )
    out = pl.pallas_call(
        functools.partial(
            _prefill_self_kernel, scale=scale, tq=tile, tk=tile, num_kv_heads=hkv
        ),
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((b, lpad, hq, d), q.dtype, vma=frozenset(vma))
            if vma is not None
            else jax.ShapeDtypeStruct((b, lpad, hq, d), q.dtype)
        ),
        interpret=interpret,
    )(qb, kb, vb, kpos[:, None, :])
    return out[:, :lq].reshape(n, hq, d)


# ---------------------------------------------- paged-prefix prefill
#
# Prefill for batches WITH prefix-cache hits (and every non-first
# chunked-prefill pass): each query tile flashes over (a) the
# sequence's CACHED prefix, streamed directly from the paged cache by
# double-buffered manual DMAs over its block table (no [L, B, S_pre,
# Hkv, D] pre-gather — the round-3 jnp path materialized the whole
# prefix per forward, engine/runner.py:_prefill_prefix_impl), then
# (b) the batch's fresh K/V tiles with the causal mask. Query positions
# are REGULAR by construction (row i of a sequence sits at absolute
# position num_cached + i; engine/runner.prefill builds them that way),
# so the kernel needs only the per-sequence scalars num_cached / n_new.


def _px_update(q3, k2, v2, vis_fn, m_scr, l_scr, acc_scr, *, scale, hkv):
    """One flash update of a [TQ, Hq, D] query tile against [C, Hkv*D]
    folded keys/values. ``vis_fn(i, j)`` maps [rows, C] iotas (query row
    within the tile, key column within the chunk) to visibility — built
    from iotas directly: a gather-style vis[i, j] lookup does not lower
    on Mosaic (2D-gather restriction)."""
    tq, hq, d = q3.shape
    g = hq // hkv
    c = k2.shape[0]
    s_parts = []
    for kh in range(hkv):
        qh = q3[:, kh * g : (kh + 1) * g, :].reshape(tq * g, d)
        kh_blk = jax.lax.slice(k2, (0, kh * d), (c, (kh + 1) * d))
        s_parts.append(
            jax.lax.dot_general(
                qh, kh_blk,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [TQ*G, C]
        )
    s2 = jnp.concatenate(s_parts, axis=0) * scale  # [Hkv*TQ*G, C]
    rows = hkv * tq * g
    i_idx = (jax.lax.broadcasted_iota(jnp.int32, (rows, c), 0) % (tq * g)) // g
    j_idx = jax.lax.broadcasted_iota(jnp.int32, (rows, c), 1)
    s2 = jnp.where(vis_fn(i_idx, j_idx), s2, NEG_INF)

    m_prev = m_scr[:, 0:1]
    m_new = jnp.maximum(m_prev, jnp.max(s2, axis=1, keepdims=True))
    alpha = jnp.exp(m_prev - m_new)
    p = jnp.exp(s2 - m_new)
    l_scr[:, 0:1] = l_scr[:, 0:1] * alpha + jnp.sum(p, axis=1, keepdims=True)
    p = p.astype(v2.dtype)
    pv_parts = []
    for kh in range(hkv):
        ph = jax.lax.slice(p, (kh * tq * g, 0), ((kh + 1) * tq * g, c))
        vh = jax.lax.slice(v2, (0, kh * d), (c, (kh + 1) * d))
        pv_parts.append(
            jax.lax.dot_general(
                ph, vh,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        )
    acc_scr[...] = acc_scr[...] * alpha + jnp.concatenate(pv_parts, axis=0)
    m_scr[:, 0:1] = m_new


def _prefill_prefix_kernel(
    bt_k_ref, bt_v_ref, nc_ref, nn_ref,  # scalar prefetch
    q_ref,  # [1, TQ, Hq, D] VMEM (BlockSpec)
    kf_hbm, vf_hbm,  # [B, NKT, TK, Hkv*D] ANY (manual DMA by leading dims)
    blocks_ref,  # [L*2*(NB+1), BS, Hkv*D] ANY — the paged cache
    o_ref,  # [1, TQ, Hq, D]
    kbuf, vbuf,  # VMEM (2, PPC*BS, Hkv*D) prefix chunks
    fkbuf, fvbuf,  # VMEM (2, TK, Hkv*D) fresh tiles
    m_scr, l_scr, acc_scr,
    kp_sems, vp_sems,  # DMA sems (2, PPC)
    fk_sems, fv_sems,  # DMA sems (2,)
    *, scale: float, block_size: int, num_kv_heads: int, tq: int, tk: int,
    ppc: int,
):
    from nano_pearl_tpu.ops.pallas.paged_attention import _chunk_dmas

    bi = pl.program_id(0)
    qi = pl.program_id(1)
    nc = nc_ref[bi]
    nn = nn_ref[bi]
    q3 = q_ref[0]
    bs = block_size

    m_scr[...] = jnp.full_like(m_scr, M_FLOOR)
    l_scr[...] = jnp.zeros_like(l_scr)
    acc_scr[...] = jnp.zeros_like(acc_scr)

    # ---- prefix phase: flash over the cached pages, all rows see nc
    pages = (nc + bs - 1) // bs
    nbc = (pages + ppc - 1) // ppc
    last_page = jnp.maximum(pages - 1, 0)

    def pdmas(slot, ci):
        return _chunk_dmas(
            blocks_ref, bt_k_ref, bi, ci, kbuf.at[slot], kp_sems.at[slot],
            bs, last_page, ppc,
        ) + _chunk_dmas(
            blocks_ref, bt_v_ref, bi, ci, vbuf.at[slot], vp_sems.at[slot],
            bs, last_page, ppc,
        )

    @pl.when(nbc > 0)
    def _prefix():
        for dma in pdmas(0, 0):
            dma.start()

        def body(ci, _):
            slot = jax.lax.rem(ci, 2)

            @pl.when(ci + 1 < nbc)
            def _():
                for dma in pdmas(jax.lax.rem(ci + 1, 2), ci + 1):
                    dma.start()

            for dma in pdmas(slot, ci):
                dma.wait()
            # per-page updates bound the score tile to [rows, BS]
            for j in range(ppc):
                start = (ci * ppc + j) * bs
                _px_update(
                    q3, kbuf[slot, j * bs : (j + 1) * bs],
                    vbuf[slot, j * bs : (j + 1) * bs],
                    # uniform: every new row sees the whole prefix
                    lambda i, jj, start=start: (start + jj) < nc,
                    m_scr, l_scr, acc_scr, scale=scale, hkv=num_kv_heads,
                )
            return 0

        jax.lax.fori_loop(0, nbc, body, 0)

    # ---- fresh phase: causal over the batch's own K/V tiles
    def fdmas(slot, ki):
        return [
            pltpu.make_async_copy(kf_hbm.at[bi, ki], fkbuf.at[slot], fk_sems.at[slot]),
            pltpu.make_async_copy(vf_hbm.at[bi, ki], fvbuf.at[slot], fv_sems.at[slot]),
        ]

    ntiles = qi + 1  # causal: tiles past the diagonal are invisible
    for dma in fdmas(0, 0):
        dma.start()

    def fbody(ki, _):
        slot = jax.lax.rem(ki, 2)

        @pl.when(ki + 1 < ntiles)
        def _():
            for dma in fdmas(jax.lax.rem(ki + 1, 2), ki + 1):
                dma.start()

        for dma in fdmas(slot, ki):
            dma.wait()
        _px_update(
            q3, fkbuf[slot], fvbuf[slot],
            # causal over fresh indices + real-row bound
            lambda i, j: ((ki * tk + j) <= (qi * tq + i)) & ((ki * tk + j) < nn),
            m_scr, l_scr, acc_scr, scale=scale, hkv=num_kv_heads,
        )
        return 0

    jax.lax.fori_loop(0, ntiles, fbody, 0)

    hq, d = o_ref.shape[2], o_ref.shape[3]
    g = hq // num_kv_heads
    denom = jnp.maximum(l_scr[:, 0:1], 1e-30)
    out = acc_scr[...] / denom
    for kh in range(num_kv_heads):
        blk = jax.lax.slice(out, (kh * tq * g, 0), ((kh + 1) * tq * g, d))
        o_ref[0, :, kh * g : (kh + 1) * g, :] = blk.reshape(tq, g, d).astype(
            o_ref.dtype
        )


def prefill_prefix_attention_pallas(
    q: jax.Array,  # [N = B*Lq, Hq, D] flat new-token queries, seq-major
    k: jax.Array,  # [N, Hkv, D] fresh post-rope keys
    v: jax.Array,  # [N, Hkv, D]
    cache,  # FULL cache [L, 2, NB+1, BS, Hkv*D] (bf16/f32, unquantized)
    layer_idx,  # traced int32
    block_tables_pre: jax.Array,  # [B, Mpre] prefix pages only
    num_cached: jax.Array,  # [B] cached-prefix lengths
    n_new: jax.Array,  # [B] real new rows per sequence
    q_positions: jax.Array,  # unused (regular by construction; kept for parity)
    scale: float,
    interpret: bool = False,
) -> jax.Array:
    """Flash prefill over cached-prefix pages + fresh causal window.

    Replaces the [L, B, S_pre, Hkv, D] prefix pre-gather of
    runner._prefill_prefix_impl (reference counterpart:
    flash_attn_varlen_func with a paged block_table,
    nano_pearl/layers/attention.py:71-76)."""
    from nano_pearl_tpu.ops.kv_cache import global_block_offsets

    b, mpre = block_tables_pre.shape
    n, hq, d = q.shape
    lq = n // b
    hkv = k.shape[1]
    g = hq // hkv
    l_, _, nb1, bs, hd = cache.shape
    assert hd == hkv * d and hd % 128 == 0

    tile = 128 if lq >= 128 else max(8, -(-lq // 8) * 8)
    lpad = -(-lq // tile) * tile
    qb = q.reshape(b, lq, hq, d)
    kb = k.reshape(b, lq, hkv * d)
    vb = v.reshape(b, lq, hkv * d)
    if lpad != lq:
        pad3 = ((0, 0), (0, lpad - lq), (0, 0))
        qb = jnp.pad(qb, ((0, 0), (0, lpad - lq), (0, 0), (0, 0)))
        kb = jnp.pad(kb, pad3)
        vb = jnp.pad(vb, pad3)
    nt = lpad // tile
    kb4 = kb.reshape(b, nt, tile, hkv * d)
    vb4 = vb.reshape(b, nt, tile, hkv * d)

    blocks = cache.reshape(l_ * 2 * nb1, bs, hd)
    k_off, v_off = global_block_offsets(cache, layer_idx)
    bt_k = block_tables_pre + k_off
    bt_v = block_tables_pre + v_off
    ppc = max(1, 512 // bs)  # ~512-token prefix chunks bound VMEM

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(b, nt),
        in_specs=[
            pl.BlockSpec((1, tile, hq, d), lambda bi, qi, *_: (bi, qi, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),  # kb4
            pl.BlockSpec(memory_space=pl.ANY),  # vb4
            pl.BlockSpec(memory_space=pl.ANY),  # blocks
        ],
        out_specs=pl.BlockSpec((1, tile, hq, d), lambda bi, qi, *_: (bi, qi, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, ppc * bs, hd), blocks.dtype),
            pltpu.VMEM((2, ppc * bs, hd), blocks.dtype),
            pltpu.VMEM((2, tile, hd), kb4.dtype),
            pltpu.VMEM((2, tile, hd), vb4.dtype),
            pltpu.VMEM((hkv * tile * g, 128), jnp.float32),
            pltpu.VMEM((hkv * tile * g, 128), jnp.float32),
            pltpu.VMEM((hkv * tile * g, d), jnp.float32),
            pltpu.SemaphoreType.DMA((2, ppc)),
            pltpu.SemaphoreType.DMA((2, ppc)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out = pl.pallas_call(
        functools.partial(
            _prefill_prefix_kernel, scale=scale, block_size=bs,
            num_kv_heads=hkv, tq=tile, tk=tile, ppc=ppc,
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, lpad, hq, d), q.dtype),
        interpret=interpret,
    )(bt_k, bt_v, num_cached, n_new, qb, kb4, vb4, blocks)
    return out[:, :lq].reshape(n, hq, d)
