"""Pallas TPU paged attention (decode / packed-verify path).

Speed-of-light replacement for the jnp gather implementation in
nano_pearl_tpu/ops/attention.py (the TPU counterpart of the reference's
``flash_attn_with_kvcache`` paged decode, reference:
nano_pearl/layers/attention.py:78-80, and of the packed multi-token
verify forward, reference: pearl_model_runner.py:560-588).

Design:
- grid = (N query rows, M table slots); the KV block for grid step
  (n, m) is selected *by the scalar-prefetched block table*
  (``PrefetchScalarGridSpec``): Pallas pipelines the HBM->VMEM copies of
  exactly the blocks each row needs — no materialized [N, S, H, D]
  gather like the jnp path, no reads beyond the row's context.
- online softmax (flash) accumulators live in VMEM scratch and persist
  across the sequential m-steps of a row; the output is written at the
  last m-step.
- per-row context lengths give the per-token staircase masking the
  PEARL verify forward needs; padded table entries point at the garbage
  block and are masked out by the context length.
- INT8 KV caches ({"q","s"} pytrees, ops/kv_cache.py) are dequantized
  in-kernel from the per-(slot, head) scales: half the HBM block traffic
  of bf16 at identical mask/softmax semantics (north-star KV-cache
  quantization at speed).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _sds(shape, dtype, vma=None):
    """ShapeDtypeStruct with optional varying-manual-axes annotation:
    kernels called inside a partial-manual shard_map (pipeline stages,
    parallel/pp.py) must declare their outputs' vma under check_vma."""
    if vma is not None:
        return jax.ShapeDtypeStruct(shape, dtype, vma=frozenset(vma))
    return jax.ShapeDtypeStruct(shape, dtype)


# --------------------------------------------------------- shared math


def _kv_head(arr, kh: int, d: int, scales=None, out_dt=None, num_kv_heads=None):
    """K/V rows for kv head ``kh`` -> [BS, D]. The cache stores the
    (Hkv, D) tail FOLDED into one lane-aligned [BS, Hkv*D] axis (TPU
    tiles the last two dims (8, 128): an unfolded [BS, Hkv, D] tail with
    few kv heads pads the sublane dim 2 -> 8, 4x HBM and 4x DMA
    traffic), so heads are column slices; the unfolded 3D layout is
    still accepted for fresh-KV operands. With ``scales`` ([BS,
    Hkv*stride] per-(slot, head) int8/fp8 scales, head ``h`` at column
    ``h*stride`` — kv_cache.kv_scale_stride) the head is dequantized
    here — only the slice actually used, on 2D shapes Mosaic
    vectorizes."""
    if arr.ndim == 3:
        h = arr[:, kh, :]
    else:
        h = jax.lax.slice(arr, (0, kh * d), (arr.shape[0], (kh + 1) * d))
    if scales is not None:
        stride = scales.shape[-1] // num_kv_heads
        s = jax.lax.slice(
            scales, (0, kh * stride), (scales.shape[0], kh * stride + 1)
        )  # [BS, 1]
        h = (h.astype(jnp.float32) * s.astype(jnp.float32)).astype(out_dt)
    return h


def _sr_update(q, k, v, ctx, block_start, m_scr, l_scr, acc_scr, *, scale,
               block_size, num_kv_heads, k_scales=None, v_scales=None,
               lo=None, hi=None):
    """One flash update for a single query row: q [Hq, D], k/v
    [BS, Hkv, D] or folded [BS, Hkv*D] in their NATIVE dtype (bf16 stays
    bf16 — the MXU runs bf16 x bf16 -> f32 at full rate, f32 x f32 at
    half), scalar ctx bound. Quantized blocks pass their scales and are
    dequantized per used head (see _kv_head). Softmax statistics and the
    accumulator stay f32.

    ``lo``/``hi`` restrict the update to absolute positions in
    [lo, hi) — the split-boundary schedule (see _kernel_db_split): a
    fully-masked update is an exact fp no-op PROVIDED an earlier update
    already set this row's running max (the caller's first executed
    update must contain an unmasked column)."""
    hq, d = q.shape
    g = hq // num_kv_heads
    vdt = q.dtype if v_scales is not None else v.dtype

    # per-kv-head 2D matmuls (static unroll over the few kv heads —
    # Mosaic wants plain [M,K]x[K,N] contractions on the MXU)
    s_parts = []
    for kh in range(num_kv_heads):
        qh = jax.lax.slice(q, (kh * g, 0), ((kh + 1) * g, d))  # [G, D]
        kh_blk = _kv_head(k, kh, d, k_scales, q.dtype, num_kv_heads)  # [BS, D]
        s_parts.append(
            jax.lax.dot_general(
                qh, kh_blk,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [G, BS]
        )
    s2 = jnp.concatenate(s_parts, axis=0) * scale  # [Hq, BS]
    pos = block_start + jax.lax.broadcasted_iota(jnp.int32, s2.shape, 1)
    mask = pos < ctx
    if lo is not None:
        mask &= pos >= lo
    if hi is not None:
        mask &= pos < hi
    s2 = jnp.where(mask, s2, NEG_INF)

    m_prev = m_scr[:, 0:1]
    m_new = jnp.maximum(m_prev, jnp.max(s2, axis=1, keepdims=True))
    alpha = jnp.exp(m_prev - m_new)
    p = jnp.exp(s2 - m_new)  # [Hq, BS]

    l_new = l_scr[:, 0:1] * alpha + jnp.sum(p, axis=1, keepdims=True)
    p = p.astype(vdt)  # p in [0,1]: bf16 PV matmul, f32 accumulate
    pv_parts = []
    for kh in range(num_kv_heads):
        ph = jax.lax.slice(p, (kh * g, 0), ((kh + 1) * g, block_size))  # [G, BS]
        vh = _kv_head(v, kh, d, v_scales, q.dtype, num_kv_heads)  # [BS, D]
        pv_parts.append(
            jax.lax.dot_general(
                ph, vh,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [G, D]
        )
    pv = jnp.concatenate(pv_parts, axis=0)  # [Hq, D]
    acc_scr[...] = acc_scr[...] * alpha + pv
    m_scr[:, 0:1] = m_new
    l_scr[:, 0:1] = l_new


def _gr_update(q, k, v, ctx_rows, block_start, m_scr, l_scr, acc_scr, *, scale,
               block_size, num_kv_heads, k_scales=None, v_scales=None,
               lo=None, hi=None):
    """One flash update for R grouped query rows sharing a KV block:
    q [R, Hq, D], k/v [BS, Hkv, D] or folded [BS, Hkv*D] in their NATIVE
    dtype (see _sr_update), ctx_rows: R scalars. ``lo``/``hi``: absolute
    position bounds of the split-boundary schedule (see _sr_update)."""
    r, hq, d = q.shape
    g = hq // num_kv_heads
    vdt = q.dtype if v_scales is not None else v.dtype

    # [R*G, 1] per-flat-row context bound (2D everywhere for Mosaic)
    ctx_col = jnp.concatenate(
        [jnp.full((g, 1), c, jnp.int32) for c in ctx_rows], axis=0
    )  # [R*G, 1]
    pos = block_start + jax.lax.broadcasted_iota(
        jnp.int32, (r * g, block_size), 1
    )
    row_mask = pos < ctx_col
    if lo is not None:
        row_mask &= pos >= lo
    if hi is not None:
        row_mask &= pos < hi

    s_parts = []
    for kh in range(num_kv_heads):
        qh = q[:, kh * g : (kh + 1) * g, :].reshape(r * g, d)
        s = jax.lax.dot_general(
            qh, _kv_head(k, kh, d, k_scales, q.dtype, num_kv_heads),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [R*G, BS]
        s_parts.append(jnp.where(row_mask, s * scale, NEG_INF))
    s2 = jnp.concatenate(s_parts, axis=0)  # [Hkv*R*G, BS]

    m_prev = m_scr[:, 0:1]
    m_new = jnp.maximum(m_prev, jnp.max(s2, axis=1, keepdims=True))
    alpha = jnp.exp(m_prev - m_new)
    p = jnp.exp(s2 - m_new)
    l_new = l_scr[:, 0:1] * alpha + jnp.sum(p, axis=1, keepdims=True)

    p = p.astype(vdt)  # p in [0,1]: bf16 PV matmul, f32 accumulate
    pv_parts = []
    for kh in range(num_kv_heads):
        ph = jax.lax.slice(p, (kh * r * g, 0), ((kh + 1) * r * g, block_size))
        pv_parts.append(
            jax.lax.dot_general(
                ph, _kv_head(v, kh, d, v_scales, q.dtype, num_kv_heads),
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [R*G, D]
        )
    pv = jnp.concatenate(pv_parts, axis=0)  # [Hkv*R*G, D]
    acc_scr[...] = acc_scr[...] * alpha + pv
    m_scr[:, 0:1] = m_new
    l_scr[:, 0:1] = l_new


def _gr_finalize(o_ref, l_scr, acc_scr, num_kv_heads):
    r = o_ref.shape[0]
    hq = o_ref.shape[1]
    d = o_ref.shape[2]
    g = hq // num_kv_heads
    denom = jnp.maximum(l_scr[:, 0:1], 1e-30)
    out = acc_scr[...] / denom  # [Hkv*R*G, D], layout [kh, r, j]
    for kh in range(num_kv_heads):
        blk = jax.lax.slice(out, (kh * r * g, 0), ((kh + 1) * r * g, d))
        o_ref[:, kh * g : (kh + 1) * g, :] = blk.reshape(r, g, d).astype(o_ref.dtype)


def _init_scratch(m_scr, l_scr, acc_scr):
    m_scr[...] = jnp.full_like(m_scr, NEG_INF)
    l_scr[...] = jnp.zeros_like(l_scr)
    acc_scr[...] = jnp.zeros_like(acc_scr)


# ------------------------------------------------------ bf16/f32 kernels


def _kernel(
    bt_k_ref, bt_v_ref, context_lens_ref,  # scalar prefetch (SMEM)
    q_ref,  # [1, Hq, D]
    k_ref,  # [1, BS, Hkv*D]
    v_ref,  # [1, BS, Hkv*D]
    o_ref,  # [1, Hq, D]
    m_scr, l_scr, acc_scr,
    *, scale: float, block_size: int, num_kv_heads: int,
):
    n = pl.program_id(0)
    m = pl.program_id(1)
    num_m = pl.num_programs(1)
    ctx = context_lens_ref[n]

    @pl.when(m == 0)
    def _init():
        _init_scratch(m_scr, l_scr, acc_scr)

    block_start = m * block_size

    @pl.when(block_start < ctx)
    def _compute():
        _sr_update(
            q_ref[0], k_ref[0], v_ref[0],
            ctx, block_start, m_scr, l_scr, acc_scr,
            scale=scale, block_size=block_size, num_kv_heads=num_kv_heads,
        )

    @pl.when(m == num_m - 1)
    def _finalize():
        denom = jnp.maximum(l_scr[:, 0:1], 1e-30)
        o_ref[0] = (acc_scr[...] / denom).astype(o_ref.dtype)


def _grouped_kernel(
    bt_k_ref, bt_v_ref, context_lens_ref,  # scalar prefetch
    q_ref,  # [R, Hq, D]
    k_ref, v_ref,  # [1, BS, Hkv*D]
    o_ref,  # [R, Hq, D]
    m_scr, l_scr, acc_scr,
    *, scale: float, block_size: int, num_kv_heads: int, rows: int,
):
    """Like _kernel but R query rows (one sequence's packed-verify window)
    share each KV block DMA — R x fewer HBM round trips for the PEARL
    verify forward (reference shape: pearl_model_runner.py:560-588)."""
    bi = pl.program_id(0)
    m = pl.program_id(1)
    num_m = pl.num_programs(1)

    @pl.when(m == 0)
    def _init():
        _init_scratch(m_scr, l_scr, acc_scr)

    block_start = m * block_size
    ctx_rows = [context_lens_ref[bi * rows + i] for i in range(rows)]
    ctx_max = ctx_rows[0]
    for c in ctx_rows[1:]:
        ctx_max = jnp.maximum(ctx_max, c)  # pad rows may have tiny ctx anywhere

    @pl.when(block_start < ctx_max)
    def _compute():
        _gr_update(
            q_ref[...], k_ref[0], v_ref[0],
            ctx_rows, block_start, m_scr, l_scr, acc_scr,
            scale=scale, block_size=block_size, num_kv_heads=num_kv_heads,
        )

    @pl.when(m == num_m - 1)
    def _finalize():
        _gr_finalize(o_ref, l_scr, acc_scr, num_kv_heads)


# ----------------------------------------- double-buffered loop kernels
#
# The original decode/verify kernels used grid = (rows, table_width):
# one 256-token KV block per grid step, one (row or group) per step. At
# bench shapes (32 rows x 16 table slots) that is 512 grid steps per
# layer, and the per-step fixed cost (scalar-core index maps, pipeline
# semaphores) measured ~2.7 us/step => ~1.4 ms/layer — 10x off the HBM
# roofline and the dominant cost of BOTH the AR step (52 ms at 36L) and
# the PEARL round. These kernels instead use grid = (rows,) with an
# in-kernel fori_loop over the row's ACTUAL context blocks and manually
# double-buffered HBM->VMEM DMAs (guide pattern): per-layer overhead
# drops to rows grid steps, DMA traffic to exactly ceil(ctx/BS) blocks.


CHUNK_TOKENS = 1024  # KV tokens DMA'd + computed per inner iteration


def _pages_per_chunk(block_size: int) -> int:
    """Pages per double-buffered chunk: enough pages to amortize the
    ~1.5 us per-DMA issue cost over >=CHUNK_TOKENS tokens, but never so
    many that the two chunk buffers blow the ~16 MB VMEM budget when the
    block size itself is large."""
    return max(1, CHUNK_TOKENS // block_size)


def _db_xstep_loop(bi, n_groups, cum_ref, start_fn, wait_fn, compute_fn):
    """Double-buffered chunk loop pipelined ACROSS grid steps.

    The chunk stream is global: ``cum_ref`` holds cumulative chunk
    counts per group ([n_groups + 1], prefetched), so the buffer slot of
    (group, chunk) is ``(cum[g] + c) % 2`` — consistent across grid
    steps because VMEM scratch persists between them. While computing
    this group's chunk ``ci`` the kernel starts the NEXT stream item's
    DMAs — chunk ``ci+1`` of this group, or chunk 0 of group ``bi+1``.
    Without the cross-step handoff a short context (one chunk, the bench
    regime: ctx ~1000 = one 1024-token chunk) leaves the double buffer
    with nothing to overlap and every grid step exposes the full DMA
    round trip.

    ``start_fn(slot, g, ci)`` must be reconstructible for the wait:
    ``wait_fn(slot, ci)`` waits the descriptors of (this group, ci)."""
    base = cum_ref[bi]
    nbc = cum_ref[bi + 1] - base

    @pl.when(bi == 0)
    def _cold_start():
        start_fn(0, 0, 0)

    def body(ci, _):
        slot = jax.lax.rem(base + ci, 2)
        nxt = jax.lax.rem(base + ci + 1, 2)

        @pl.when(ci + 1 < nbc)
        def _():
            start_fn(nxt, bi, ci + 1)

        @pl.when((ci + 1 == nbc) & (bi + 1 < n_groups))
        def _():
            start_fn(nxt, bi + 1, 0)

        wait_fn(slot, ci)
        compute_fn(slot, ci)
        return 0

    jax.lax.fori_loop(0, nbc, body, 0)


def _db_chunk_meta(ctx_max_per_group, block_size):
    """(cum [G+1], last_page [G]) prefetch arrays for _db_xstep_loop:
    exact per-group chunk counts (no uniform-max padding) computed on
    the host side of the pallas_call."""
    ppc = _pages_per_chunk(block_size)
    ctx = jnp.maximum(ctx_max_per_group, 1)
    pages = (ctx + block_size - 1) // block_size
    nbc = (pages + ppc - 1) // ppc
    cum = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(nbc).astype(jnp.int32)]
    )
    return cum, (pages - 1).astype(jnp.int32)


def _chunk_dmas(blocks_ref, bt_ref, row, ci, buf, sems, bs, last_page, ppc):
    """DMAs for one chunk: pages ci*C+j -> buf[j*bs:(j+1)*bs]. Page
    indices past the row's last page are clamped to it — their assigned
    positions land past the context and are masked in compute."""
    dmas = []
    for j in range(ppc):
        page = jnp.minimum(ci * ppc + j, last_page)
        dmas.append(
            pltpu.make_async_copy(
                blocks_ref.at[bt_ref[row, page]],
                buf.at[pl.ds(j * bs, bs), :],
                sems.at[j],
            )
        )
    return dmas


def _kernel_db(
    bt_k_ref, bt_v_ref, context_lens_ref, cum_ref, lp_ref,  # scalar prefetch
    q_ref,  # [1, Hq, D] VMEM
    blocks_ref,  # [L*2*(NB+1), BS, Hkv*D] HBM (manual DMA)
    o_ref,  # [1, Hq, D] VMEM
    kbuf, vbuf,  # VMEM (2, C*BS, Hkv*D)
    m_scr, l_scr, acc_scr,
    k_sems, v_sems,  # DMA semaphores (2, C)
    *, scale: float, block_size: int, num_kv_heads: int,
):
    ni = pl.program_id(0)
    n = pl.num_programs(0)
    ppc = _pages_per_chunk(block_size)
    ctx = context_lens_ref[ni]
    _init_scratch(m_scr, l_scr, acc_scr)

    def dmas(slot, g, ci):
        return _chunk_dmas(
            blocks_ref, bt_k_ref, g, ci, kbuf.at[slot], k_sems.at[slot],
            block_size, lp_ref[g], ppc,
        ) + _chunk_dmas(
            blocks_ref, bt_v_ref, g, ci, vbuf.at[slot], v_sems.at[slot],
            block_size, lp_ref[g], ppc,
        )

    def start(slot, g, ci):
        for dma in dmas(slot, g, ci):
            dma.start()

    def wait(slot, ci):
        for dma in dmas(slot, ni, ci):
            dma.wait()

    cbs = ppc * block_size

    def compute(slot, ci):
        _sr_update(
            q_ref[0], kbuf[slot], vbuf[slot], ctx, ci * cbs,
            m_scr, l_scr, acc_scr,
            scale=scale, block_size=cbs, num_kv_heads=num_kv_heads,
        )

    _db_xstep_loop(ni, n, cum_ref, start, wait, compute)
    denom = jnp.maximum(l_scr[:, 0:1], 1e-30)
    o_ref[0] = (acc_scr[...] / denom).astype(o_ref.dtype)


def _kernel_db_split(
    bt_k_ref, bt_v_ref, context_lens_ref, b1_ref, cum_ref, lp_ref,
    q_ref,  # [1, Hq, D] VMEM
    blocks_ref,  # HBM (manual DMA)
    o_ref,  # [1, Hq, D] VMEM
    kbuf, vbuf, m_scr, l_scr, acc_scr, k_sems, v_sems,
    *, scale: float, block_size: int, num_kv_heads: int,
):
    """_kernel_db with the round-aligned SPLIT-BOUNDARY schedule: each
    chunk applies up to two interval updates, partitioning the key
    stream at the per-row absolute boundary b1 — the VERIFYING round's
    fresh-window start — in addition to the chunk multiples.

    Why: bitwise decode<->verify agreement at the layer-share ceiling
    requires both streams to fold the SAME key-position cells into the
    flash accumulator in the SAME order. The deferred-write verify
    (_grouped_kernel_db_fresh_split) necessarily splits at b1 (its
    cache / in-operand boundary) and at the chunk multiples; the
    draft's gamma-scan decode — whose keys all live in its own cache —
    replicates that partition here with masked updates. b1 is the only
    extra boundary needed: the verify folds its whole fresh window
    [b1, ctx_row) as ONE staircase update, exactly like the decode's
    [b1, ctx) cell. A fully-masked interval update is an exact fp no-op
    (alpha = exp(0) = 1, p rows underflow to 0.0) once the row's first
    executed update contains an unmasked column — guaranteed because
    the first non-empty cell always starts at position 0 and every
    ctx >= 1."""
    ni = pl.program_id(0)
    n = pl.num_programs(0)
    ppc = _pages_per_chunk(block_size)
    ctx = context_lens_ref[ni]
    b1 = b1_ref[ni]
    _init_scratch(m_scr, l_scr, acc_scr)

    def dmas(slot, g, ci):
        return _chunk_dmas(
            blocks_ref, bt_k_ref, g, ci, kbuf.at[slot], k_sems.at[slot],
            block_size, lp_ref[g], ppc,
        ) + _chunk_dmas(
            blocks_ref, bt_v_ref, g, ci, vbuf.at[slot], v_sems.at[slot],
            block_size, lp_ref[g], ppc,
        )

    def start(slot, g, ci):
        for dma in dmas(slot, g, ci):
            dma.start()

    def wait(slot, ci):
        for dma in dmas(slot, ni, ci):
            dma.wait()

    cbs = ppc * block_size

    def compute(slot, ci):
        cstart = ci * cbs
        for lo, hi in ((jnp.int32(0), b1), (b1, ctx)):
            run = jnp.maximum(cstart, lo) < jnp.minimum(
                jnp.minimum(cstart + cbs, hi), ctx
            )

            @pl.when(run)
            def _(lo=lo, hi=hi):
                _sr_update(
                    q_ref[0], kbuf[slot], vbuf[slot], ctx, cstart,
                    m_scr, l_scr, acc_scr,
                    scale=scale, block_size=cbs, num_kv_heads=num_kv_heads,
                    lo=lo, hi=hi,
                )

    _db_xstep_loop(ni, n, cum_ref, start, wait, compute)
    denom = jnp.maximum(l_scr[:, 0:1], 1e-30)
    o_ref[0] = (acc_scr[...] / denom).astype(o_ref.dtype)


def _grouped_kernel_db(
    bt_k_ref, bt_v_ref, context_lens_ref, cum_ref, lp_ref,
    q_ref,  # [R, Hq, D] VMEM
    blocks_ref,  # HBM
    o_ref,  # [R, Hq, D]
    kbuf, vbuf, m_scr, l_scr, acc_scr, k_sems, v_sems,
    *, scale: float, block_size: int, num_kv_heads: int, rows: int,
):
    bi = pl.program_id(0)
    nb = pl.num_programs(0)
    ctx_rows = [context_lens_ref[bi * rows + i] for i in range(rows)]
    ppc = _pages_per_chunk(block_size)
    _init_scratch(m_scr, l_scr, acc_scr)

    def dmas(slot, g, ci):
        return _chunk_dmas(
            blocks_ref, bt_k_ref, g, ci, kbuf.at[slot], k_sems.at[slot],
            block_size, lp_ref[g], ppc,
        ) + _chunk_dmas(
            blocks_ref, bt_v_ref, g, ci, vbuf.at[slot], v_sems.at[slot],
            block_size, lp_ref[g], ppc,
        )

    def start(slot, g, ci):
        for dma in dmas(slot, g, ci):
            dma.start()

    def wait(slot, ci):
        for dma in dmas(slot, bi, ci):
            dma.wait()

    cbs = ppc * block_size

    def compute(slot, ci):
        _gr_update(
            q_ref[...], kbuf[slot], vbuf[slot], ctx_rows, ci * cbs,
            m_scr, l_scr, acc_scr,
            scale=scale, block_size=cbs, num_kv_heads=num_kv_heads,
        )

    _db_xstep_loop(bi, nb, cum_ref, start, wait, compute)
    _gr_finalize(o_ref, l_scr, acc_scr, num_kv_heads)


# ------------------------------------------------- mono (grid=1) kernels
#
# The db kernels cut DMA traffic to the actual context, but still pay
# Mosaic's per-grid-step fixed cost (scalar-core index maps + pipeline
# bookkeeping, ~2.7 us/step measured on v5e) once per ROW/GROUP: 32
# steps/layer x 36 layers ~ 3 ms of the bench verify forward and the
# dominant cost of the AR decode step. The mono kernels run the ENTIRE
# layer as ONE grid step: a flat in-kernel stream over (group, chunk)
# pairs (cum_ref gives the group boundaries), with the same
# double-buffered chunk DMAs plus q/o staged through VMEM by
# double-buffered DMAs of their own (q_hbm/o_hbm live in ANY space —
# per-group slabs are fetched/written at dynamic LEADING-dim offsets,
# the one dynamic-DMA form this Mosaic toolchain accepts; dynamic
# sublane-dim slices crash it, see ops/kv_cache.write_fresh).


def _mono_stream(
    n_groups, cum_ref, start_chunk, wait_chunk, start_q, begin_group,
    compute, end_group,
):
    """Walk the flat chunk stream t = 0..cum[n_groups) with one-item DMA
    lookahead. Every group has >= 1 chunk (ctx >= 1), so the group index
    advances by at most one per step."""
    total = cum_ref[n_groups]
    start_chunk(0, 0, 0)
    start_q(0)

    def body(t, g):
        g = jnp.where(t >= cum_ref[g + 1], g + 1, g)
        ci = t - cum_ref[g]
        slot = jax.lax.rem(t, 2)
        nxt = jax.lax.rem(t + 1, 2)
        g2 = jnp.where(t + 1 >= cum_ref[g + 1], g + 1, g)

        @pl.when(t + 1 < total)
        def _lookahead():
            start_chunk(nxt, g2, (t + 1) - cum_ref[g2])

            @pl.when(g2 != g)
            def _():
                start_q(g2)

        @pl.when(ci == 0)
        def _begin():
            begin_group(g)

        wait_chunk(slot, g, ci)
        compute(slot, g, ci)

        @pl.when(t + 1 == cum_ref[g + 1])
        def _end():
            end_group(g)

        return g

    jax.lax.fori_loop(0, total, body, 0)


def _grouped_kernel_db_mono(
    bt_k_ref, bt_v_ref, context_lens_ref, cum_ref, lp_ref,  # scalar prefetch
    q_hbm,  # [B, R, Hq, D] ANY
    blocks_ref,  # [L*2*(NB+1), BS, Hkv*D] HBM (manual DMA)
    o_hbm,  # [B, R, Hq, D] ANY (output)
    kbuf, vbuf,  # VMEM (2, C*BS, Hkv*D)
    qbuf, obuf,  # VMEM (2, R, Hq, D)
    m_scr, l_scr, acc_scr,
    k_sems, v_sems,  # DMA sems (2, C)
    q_sems, o_sems,  # DMA sems (2,)
    *, scale: float, block_size: int, num_kv_heads: int, rows: int,
    n_groups: int,
):
    ppc = _pages_per_chunk(block_size)
    cbs = ppc * block_size

    def chunk_dmas(slot, g, ci):
        return _chunk_dmas(
            blocks_ref, bt_k_ref, g, ci, kbuf.at[slot], k_sems.at[slot],
            block_size, lp_ref[g], ppc,
        ) + _chunk_dmas(
            blocks_ref, bt_v_ref, g, ci, vbuf.at[slot], v_sems.at[slot],
            block_size, lp_ref[g], ppc,
        )

    def start_chunk(slot, g, ci):
        for dma in chunk_dmas(slot, g, ci):
            dma.start()

    def wait_chunk(slot, g, ci):
        for dma in chunk_dmas(slot, g, ci):
            dma.wait()

    def q_dma(g):
        p = jax.lax.rem(g, 2)
        return pltpu.make_async_copy(q_hbm.at[g], qbuf.at[p], q_sems.at[p])

    def o_dma(g):
        p = jax.lax.rem(g, 2)
        return pltpu.make_async_copy(obuf.at[p], o_hbm.at[g], o_sems.at[p])

    def start_q(g):
        q_dma(g).start()

    def begin_group(g):
        # the obuf slot this group will write still has group g-2's
        # writeback potentially in flight
        @pl.when(g >= 2)
        def _():
            o_dma(g - 2).wait()

        q_dma(g).wait()
        _init_scratch(m_scr, l_scr, acc_scr)

    def compute(slot, g, ci):
        ctx_rows = [context_lens_ref[g * rows + i] for i in range(rows)]
        _gr_update(
            qbuf[jax.lax.rem(g, 2)], kbuf[slot], vbuf[slot], ctx_rows,
            ci * cbs, m_scr, l_scr, acc_scr,
            scale=scale, block_size=cbs, num_kv_heads=num_kv_heads,
        )

    def end_group(g):
        _gr_finalize(obuf.at[jax.lax.rem(g, 2)], l_scr, acc_scr, num_kv_heads)
        o_dma(g).start()

    _mono_stream(
        n_groups, cum_ref, start_chunk, wait_chunk, start_q, begin_group,
        compute, end_group,
    )
    # drain the last (up to) two output writebacks
    o_dma(n_groups - 1).wait()
    if n_groups >= 2:
        o_dma(n_groups - 2).wait()


def _mono_call(
    q4: jax.Array,  # [B, R, Hq, D]
    blocks: jax.Array,
    bt_k: jax.Array,  # [B, M] layer-folded
    bt_v: jax.Array,
    context_lens: jax.Array,  # [B*R]
    ctx_max_per_group: jax.Array,  # [B]
    scale: float,
    bs: int,
    hkv: int,
    interpret: bool = False,
    vma=None,
):
    b, r, hq, d = q4.shape
    g = hq // hkv
    cum, lp = _db_chunk_meta(ctx_max_per_group, bs)
    ppc = _pages_per_chunk(bs)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(1,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # q4
            pl.BlockSpec(memory_space=pl.ANY),  # blocks
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((2, ppc * bs, hkv * d), blocks.dtype),
            pltpu.VMEM((2, ppc * bs, hkv * d), blocks.dtype),
            pltpu.VMEM((2, r, hq, d), q4.dtype),
            pltpu.VMEM((2, r, hq, d), q4.dtype),
            pltpu.VMEM((hkv * r * g, 128), jnp.float32),
            pltpu.VMEM((hkv * r * g, 128), jnp.float32),
            pltpu.VMEM((hkv * r * g, d), jnp.float32),
            pltpu.SemaphoreType.DMA((2, ppc)),
            pltpu.SemaphoreType.DMA((2, ppc)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out = pl.pallas_call(
        functools.partial(
            _grouped_kernel_db_mono, scale=scale, block_size=bs,
            num_kv_heads=hkv, rows=r, n_groups=b,
        ),
        grid_spec=grid_spec,
        out_shape=_sds((b, r, hq, d), q4.dtype, vma),
        interpret=interpret,
    )(bt_k, bt_v, context_lens, cum, lp, q4, blocks)
    return out.reshape(b * r, hq, d)


def _use_mono() -> bool:
    """Mono kernels measure faster in isolation (verify forward 8.1 vs
    9.6 ms) but their different fp schedule shifts the layer-share
    bitwise-ceiling acceptance (engine MAT 12.4 -> ~10 at gamma=14,
    identical weights) — a net headline loss, so the db kernels stay the
    default. Realistic-acceptance scenarios (real model pairs, noise
    rows) are driven by genuine model divergence instead; select the
    'throughput' perf_profile (or NANO_PEARL_MONO=1) there. Full A/B:
    tools/chiplog + bench history 2026-08-20.

    This env read is only the FALLBACK for direct kernel calls (probes,
    tests): the engine resolves the schedule from PearlConfig.
    perf_profile once per runner and passes ``mono=`` explicitly."""
    import os

    return os.environ.get("NANO_PEARL_MONO", "0") == "1"


def _resolve_mono(mono) -> bool:
    return _use_mono() if mono is None else bool(mono)


# ---------------------------------------------------------- int8 kernels


def _kernel_q8(
    bt_k_ref, bt_v_ref, context_lens_ref,
    q_ref,  # [1, Hq, D]
    k_ref,  # [1, BS, Hkv*D] int8
    ks_ref,  # [1, BS, Hkv] f32 scales
    v_ref, vs_ref,
    o_ref,
    m_scr, l_scr, acc_scr,
    *, scale: float, block_size: int, num_kv_heads: int,
):
    n = pl.program_id(0)
    m = pl.program_id(1)
    num_m = pl.num_programs(1)
    ctx = context_lens_ref[n]

    @pl.when(m == 0)
    def _init():
        _init_scratch(m_scr, l_scr, acc_scr)

    block_start = m * block_size

    @pl.when(block_start < ctx)
    def _compute():
        # dequantize per used head inside the update (bf16 operands keep
        # the MXU at full rate; the dequant product is a VPU convert)
        _sr_update(
            q_ref[0], k_ref[0], v_ref[0],
            ctx, block_start, m_scr, l_scr, acc_scr,
            scale=scale, block_size=block_size, num_kv_heads=num_kv_heads,
            k_scales=ks_ref[0], v_scales=vs_ref[0],
        )

    @pl.when(m == num_m - 1)
    def _finalize():
        denom = jnp.maximum(l_scr[:, 0:1], 1e-30)
        o_ref[0] = (acc_scr[...] / denom).astype(o_ref.dtype)


def _grouped_kernel_q8(
    bt_k_ref, bt_v_ref, context_lens_ref,
    q_ref,  # [R, Hq, D]
    k_ref, ks_ref, v_ref, vs_ref,
    o_ref,
    m_scr, l_scr, acc_scr,
    *, scale: float, block_size: int, num_kv_heads: int, rows: int,
):
    bi = pl.program_id(0)
    m = pl.program_id(1)
    num_m = pl.num_programs(1)

    @pl.when(m == 0)
    def _init():
        _init_scratch(m_scr, l_scr, acc_scr)

    block_start = m * block_size
    ctx_rows = [context_lens_ref[bi * rows + i] for i in range(rows)]
    ctx_max = ctx_rows[0]
    for c in ctx_rows[1:]:
        ctx_max = jnp.maximum(ctx_max, c)

    @pl.when(block_start < ctx_max)
    def _compute():
        _gr_update(
            q_ref[...], k_ref[0], v_ref[0],
            ctx_rows, block_start, m_scr, l_scr, acc_scr,
            scale=scale, block_size=block_size, num_kv_heads=num_kv_heads,
            k_scales=ks_ref[0], v_scales=vs_ref[0],
        )

    @pl.when(m == num_m - 1)
    def _finalize():
        _gr_finalize(o_ref, l_scr, acc_scr, num_kv_heads)


# ---------------------------------------- q8 double-buffered/mono kernels
#
# Quantized-cache kernels of the db/mono GENERATION (the round-3 q8
# kernels above are the first, grid-per-block generation: 512 fixed-cost
# grid steps/layer at bench shapes made int8 KV *slower* than no
# speculation — 0.874x vs AR, tools/chiplog/5_kvq.log). These reuse the
# _db_xstep_loop/_mono_stream machinery: per-chunk manual HBM->VMEM DMAs
# fetch the 1-byte value pages AND their bf16 scale slabs (lane-aligned
# [BS, Hkv*stride] pages — kv_cache.kv_scale_stride) with the same
# cross-step double buffering; dequantization happens per used head in
# _sr_update/_gr_update. HBM traffic: (1 + 2*stride/D)/2 of the bf16
# kernels (0.625x at Hkv=8, D=128).


def _q8_chunk_dmas(blocks_ref, scales_ref, bt_k_ref, bt_v_ref, g, ci,
                   kbuf, vbuf, ksbuf, vsbuf, sems4, bs, last_page, ppc):
    """Value + scale DMAs of one chunk for both K and V pages.
    ``sems4``: (k_sems, v_sems, ks_sems, vs_sems), each already sliced
    to this buffer slot."""
    k_sems, v_sems, ks_sems, vs_sems = sems4
    return (
        _chunk_dmas(blocks_ref, bt_k_ref, g, ci, kbuf, k_sems, bs, last_page, ppc)
        + _chunk_dmas(blocks_ref, bt_v_ref, g, ci, vbuf, v_sems, bs, last_page, ppc)
        + _chunk_dmas(scales_ref, bt_k_ref, g, ci, ksbuf, ks_sems, bs, last_page, ppc)
        + _chunk_dmas(scales_ref, bt_v_ref, g, ci, vsbuf, vs_sems, bs, last_page, ppc)
    )


def _kernel_db_q8v2(
    bt_k_ref, bt_v_ref, context_lens_ref, cum_ref, lp_ref,  # scalar prefetch
    q_ref,  # [1, Hq, D] VMEM
    blocks_ref,  # [L*2*(NB+1), BS, Hkv*D] HBM int8/fp8 (manual DMA)
    scales_ref,  # [L*2*(NB+1), BS, Hkv*stride] HBM bf16 (manual DMA)
    o_ref,  # [1, Hq, D] VMEM
    kbuf, vbuf,  # VMEM (2, C*BS, Hkv*D) 1-byte
    ksbuf, vsbuf,  # VMEM (2, C*BS, Hkv*stride) bf16
    m_scr, l_scr, acc_scr,
    k_sems, v_sems, ks_sems, vs_sems,  # DMA semaphores (2, C)
    *, scale: float, block_size: int, num_kv_heads: int,
):
    """Decode over a quantized cache, db schedule (cf. _kernel_db)."""
    ni = pl.program_id(0)
    n = pl.num_programs(0)
    ppc = _pages_per_chunk(block_size)
    ctx = context_lens_ref[ni]
    _init_scratch(m_scr, l_scr, acc_scr)

    def dmas(slot, g, ci):
        return _q8_chunk_dmas(
            blocks_ref, scales_ref, bt_k_ref, bt_v_ref, g, ci,
            kbuf.at[slot], vbuf.at[slot], ksbuf.at[slot], vsbuf.at[slot],
            (k_sems.at[slot], v_sems.at[slot], ks_sems.at[slot], vs_sems.at[slot]),
            block_size, lp_ref[g], ppc,
        )

    def start(slot, g, ci):
        for dma in dmas(slot, g, ci):
            dma.start()

    def wait(slot, ci):
        for dma in dmas(slot, ni, ci):
            dma.wait()

    cbs = ppc * block_size

    def compute(slot, ci):
        _sr_update(
            q_ref[0], kbuf[slot], vbuf[slot], ctx, ci * cbs,
            m_scr, l_scr, acc_scr,
            scale=scale, block_size=cbs, num_kv_heads=num_kv_heads,
            k_scales=ksbuf[slot], v_scales=vsbuf[slot],
        )

    _db_xstep_loop(ni, n, cum_ref, start, wait, compute)
    denom = jnp.maximum(l_scr[:, 0:1], 1e-30)
    o_ref[0] = (acc_scr[...] / denom).astype(o_ref.dtype)


def _grouped_kernel_db_q8v2(
    bt_k_ref, bt_v_ref, context_lens_ref, cum_ref, lp_ref,
    q_ref,  # [R, Hq, D] VMEM
    blocks_ref, scales_ref,  # HBM
    o_ref,  # [R, Hq, D]
    kbuf, vbuf, ksbuf, vsbuf, m_scr, l_scr, acc_scr,
    k_sems, v_sems, ks_sems, vs_sems,
    *, scale: float, block_size: int, num_kv_heads: int, rows: int,
):
    """Packed verify over a quantized cache, db schedule (cf.
    _grouped_kernel_db)."""
    bi = pl.program_id(0)
    nb = pl.num_programs(0)
    ctx_rows = [context_lens_ref[bi * rows + i] for i in range(rows)]
    ppc = _pages_per_chunk(block_size)
    _init_scratch(m_scr, l_scr, acc_scr)

    def dmas(slot, g, ci):
        return _q8_chunk_dmas(
            blocks_ref, scales_ref, bt_k_ref, bt_v_ref, g, ci,
            kbuf.at[slot], vbuf.at[slot], ksbuf.at[slot], vsbuf.at[slot],
            (k_sems.at[slot], v_sems.at[slot], ks_sems.at[slot], vs_sems.at[slot]),
            block_size, lp_ref[g], ppc,
        )

    def start(slot, g, ci):
        for dma in dmas(slot, g, ci):
            dma.start()

    def wait(slot, ci):
        for dma in dmas(slot, bi, ci):
            dma.wait()

    cbs = ppc * block_size

    def compute(slot, ci):
        _gr_update(
            q_ref[...], kbuf[slot], vbuf[slot], ctx_rows, ci * cbs,
            m_scr, l_scr, acc_scr,
            scale=scale, block_size=cbs, num_kv_heads=num_kv_heads,
            k_scales=ksbuf[slot], v_scales=vsbuf[slot],
        )

    _db_xstep_loop(bi, nb, cum_ref, start, wait, compute)
    _gr_finalize(o_ref, l_scr, acc_scr, num_kv_heads)


def _grouped_kernel_db_mono_q8v2(
    bt_k_ref, bt_v_ref, context_lens_ref, cum_ref, lp_ref,  # scalar prefetch
    q_hbm,  # [B, R, Hq, D] ANY
    blocks_ref,  # [L*2*(NB+1), BS, Hkv*D] HBM int8/fp8 (manual DMA)
    scales_ref,  # [L*2*(NB+1), BS, Hkv*stride] HBM bf16 (manual DMA)
    o_hbm,  # [B, R, Hq, D] ANY (output)
    kbuf, vbuf,  # VMEM (2, C*BS, Hkv*D) 1-byte
    ksbuf, vsbuf,  # VMEM (2, C*BS, Hkv*stride) bf16
    qbuf, obuf,  # VMEM (2, R, Hq, D)
    m_scr, l_scr, acc_scr,
    k_sems, v_sems, ks_sems, vs_sems,  # DMA sems (2, C)
    q_sems, o_sems,  # DMA sems (2,)
    *, scale: float, block_size: int, num_kv_heads: int, rows: int,
    n_groups: int,
):
    """Whole-layer (grid=1) quantized decode/verify: the mono stream of
    _grouped_kernel_db_mono with per-chunk value+scale DMAs."""
    ppc = _pages_per_chunk(block_size)
    cbs = ppc * block_size

    def chunk_dmas(slot, g, ci):
        return _q8_chunk_dmas(
            blocks_ref, scales_ref, bt_k_ref, bt_v_ref, g, ci,
            kbuf.at[slot], vbuf.at[slot], ksbuf.at[slot], vsbuf.at[slot],
            (k_sems.at[slot], v_sems.at[slot], ks_sems.at[slot], vs_sems.at[slot]),
            block_size, lp_ref[g], ppc,
        )

    def start_chunk(slot, g, ci):
        for dma in chunk_dmas(slot, g, ci):
            dma.start()

    def wait_chunk(slot, g, ci):
        for dma in chunk_dmas(slot, g, ci):
            dma.wait()

    def q_dma(g):
        p = jax.lax.rem(g, 2)
        return pltpu.make_async_copy(q_hbm.at[g], qbuf.at[p], q_sems.at[p])

    def o_dma(g):
        p = jax.lax.rem(g, 2)
        return pltpu.make_async_copy(obuf.at[p], o_hbm.at[g], o_sems.at[p])

    def start_q(g):
        q_dma(g).start()

    def begin_group(g):
        @pl.when(g >= 2)
        def _():
            o_dma(g - 2).wait()

        q_dma(g).wait()
        _init_scratch(m_scr, l_scr, acc_scr)

    def compute(slot, g, ci):
        ctx_rows = [context_lens_ref[g * rows + i] for i in range(rows)]
        _gr_update(
            qbuf[jax.lax.rem(g, 2)], kbuf[slot], vbuf[slot], ctx_rows,
            ci * cbs, m_scr, l_scr, acc_scr,
            scale=scale, block_size=cbs, num_kv_heads=num_kv_heads,
            k_scales=ksbuf[slot], v_scales=vsbuf[slot],
        )

    def end_group(g):
        _gr_finalize(obuf.at[jax.lax.rem(g, 2)], l_scr, acc_scr, num_kv_heads)
        o_dma(g).start()

    _mono_stream(
        n_groups, cum_ref, start_chunk, wait_chunk, start_q, begin_group,
        compute, end_group,
    )
    o_dma(n_groups - 1).wait()
    if n_groups >= 2:
        o_dma(n_groups - 2).wait()


def _q8_fastpath_ok(scales, bs: int, hkv: int, d: int) -> bool:
    """The db/mono q8 kernels need lane-aligned manual DMA slabs: folded
    values % 128, strided scales % 128, and 1-byte sublane offsets on
    the 32-row int8 tile."""
    return (
        scales is not None
        and (hkv * d) % 128 == 0
        and scales.shape[-1] % 128 == 0
        and bs % 32 == 0
    )


def _mono_call_q8(
    q4: jax.Array,  # [B, R, Hq, D]
    blocks: jax.Array,
    scales: jax.Array,
    bt_k: jax.Array,  # [B, M] layer-folded
    bt_v: jax.Array,
    context_lens: jax.Array,  # [B*R]
    ctx_max_per_group: jax.Array,  # [B]
    scale: float,
    bs: int,
    hkv: int,
    interpret: bool = False,
    vma=None,
):
    b, r, hq, d = q4.shape
    g = hq // hkv
    s_cols = scales.shape[-1]
    cum, lp = _db_chunk_meta(ctx_max_per_group, bs)
    ppc = _pages_per_chunk(bs)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(1,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # q4
            pl.BlockSpec(memory_space=pl.ANY),  # blocks
            pl.BlockSpec(memory_space=pl.ANY),  # scales
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((2, ppc * bs, hkv * d), blocks.dtype),
            pltpu.VMEM((2, ppc * bs, hkv * d), blocks.dtype),
            pltpu.VMEM((2, ppc * bs, s_cols), scales.dtype),
            pltpu.VMEM((2, ppc * bs, s_cols), scales.dtype),
            pltpu.VMEM((2, r, hq, d), q4.dtype),
            pltpu.VMEM((2, r, hq, d), q4.dtype),
            pltpu.VMEM((hkv * r * g, 128), jnp.float32),
            pltpu.VMEM((hkv * r * g, 128), jnp.float32),
            pltpu.VMEM((hkv * r * g, d), jnp.float32),
            pltpu.SemaphoreType.DMA((2, ppc)),
            pltpu.SemaphoreType.DMA((2, ppc)),
            pltpu.SemaphoreType.DMA((2, ppc)),
            pltpu.SemaphoreType.DMA((2, ppc)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out = pl.pallas_call(
        functools.partial(
            _grouped_kernel_db_mono_q8v2, scale=scale, block_size=bs,
            num_kv_heads=hkv, rows=r, n_groups=b,
        ),
        grid_spec=grid_spec,
        out_shape=_sds((b, r, hq, d), q4.dtype, vma),
        interpret=interpret,
    )(bt_k, bt_v, context_lens, cum, lp, q4, blocks, scales)
    return out.reshape(b * r, hq, d)


def _db_call_q8_grouped(
    q, blocks, scales, bt_k, bt_v, context_lens, ctx_max_per_group,
    scale, bs, hkv, rows, interpret=False, vma=None,
):
    n, hq, d = q.shape
    b = n // rows
    g = hq // hkv
    s_cols = scales.shape[-1]
    cum, lp = _db_chunk_meta(ctx_max_per_group, bs)
    ppc = _pages_per_chunk(bs)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((rows, hq, d), lambda bi, *_: (bi, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((rows, hq, d), lambda bi, *_: (bi, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, ppc * bs, hkv * d), blocks.dtype),
            pltpu.VMEM((2, ppc * bs, hkv * d), blocks.dtype),
            pltpu.VMEM((2, ppc * bs, s_cols), scales.dtype),
            pltpu.VMEM((2, ppc * bs, s_cols), scales.dtype),
            pltpu.VMEM((hkv * rows * g, 128), jnp.float32),
            pltpu.VMEM((hkv * rows * g, 128), jnp.float32),
            pltpu.VMEM((hkv * rows * g, d), jnp.float32),
            pltpu.SemaphoreType.DMA((2, ppc)),
            pltpu.SemaphoreType.DMA((2, ppc)),
            pltpu.SemaphoreType.DMA((2, ppc)),
            pltpu.SemaphoreType.DMA((2, ppc)),
        ],
    )
    return pl.pallas_call(
        functools.partial(
            _grouped_kernel_db_q8v2, scale=scale, block_size=bs,
            num_kv_heads=hkv, rows=rows,
        ),
        grid_spec=grid_spec,
        out_shape=_sds((n, hq, d), q.dtype, vma),
        interpret=interpret,
    )(bt_k, bt_v, context_lens, cum, lp, q, blocks, scales)


def _db_call_q8_single(
    q, blocks, scales, bt_k, bt_v, context_lens, scale, bs, hkv,
    interpret=False, vma=None,
):
    n, hq, d = q.shape
    s_cols = scales.shape[-1]
    cum, lp = _db_chunk_meta(context_lens, bs)
    ppc = _pages_per_chunk(bs)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, hq, d), lambda ni, *_: (ni, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, hq, d), lambda ni, *_: (ni, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, ppc * bs, hkv * d), blocks.dtype),
            pltpu.VMEM((2, ppc * bs, hkv * d), blocks.dtype),
            pltpu.VMEM((2, ppc * bs, s_cols), scales.dtype),
            pltpu.VMEM((2, ppc * bs, s_cols), scales.dtype),
            pltpu.VMEM((hq, 128), jnp.float32),
            pltpu.VMEM((hq, 128), jnp.float32),
            pltpu.VMEM((hq, d), jnp.float32),
            pltpu.SemaphoreType.DMA((2, ppc)),
            pltpu.SemaphoreType.DMA((2, ppc)),
            pltpu.SemaphoreType.DMA((2, ppc)),
            pltpu.SemaphoreType.DMA((2, ppc)),
        ],
    )
    return pl.pallas_call(
        functools.partial(
            _kernel_db_q8v2, scale=scale, block_size=bs, num_kv_heads=hkv
        ),
        grid_spec=grid_spec,
        out_shape=_sds((n, hq, d), q.dtype, vma),
        interpret=interpret,
    )(bt_k, bt_v, context_lens, cum, lp, q, blocks, scales)


# ----------------------------------------------- partial-output kernels
#
# Sequence parallelism (parallel/sp.py) shards the cache's block axis:
# each shard computes flash statistics over its LOCAL blocks only and
# the shards' partials are merged outside (o = sum o_i * w_i / sum w_i,
# w_i = l_i * exp(m_i - max m)). These kernel variants therefore
# (a) take an extra scalar-prefetched is_local[.., M] slot mask — a
#     non-local table slot is skipped exactly like a past-context slot
#     (compute AND, via the pre-clamped tables the sp wrapper builds,
#     its HBM->VMEM copy), and
# (b) emit (o_local, m, l) instead of a normalized-only output; the
#     running max is floored (M_FLOOR) so shards with no local visible
#     key contribute l = 0, never NaN.

M_FLOOR = -1e29


def _init_scratch_floor(m_scr, l_scr, acc_scr):
    m_scr[...] = jnp.full_like(m_scr, M_FLOOR)
    l_scr[...] = jnp.zeros_like(l_scr)
    acc_scr[...] = jnp.zeros_like(acc_scr)


def _sr_finalize_partial(o_ref, m_ref, l_ref, m_scr, l_scr, acc_scr):
    # m/l refs are [1, 1, Hq] blocks: Mosaic requires the last two block
    # dims divisible by (8, 128) or equal to the array dims, which a 2D
    # [1, Hq] block violates for N not a multiple of 8 — so the wrapper
    # ships [N, 1, Hq] arrays and squeezes outside the kernel.
    denom = jnp.maximum(l_scr[:, 0:1], 1e-30)
    o_ref[0] = (acc_scr[...] / denom).astype(o_ref.dtype)
    m_ref[0, 0, :] = m_scr[:, 0]
    l_ref[0, 0, :] = l_scr[:, 0]


def _gr_finalize_partial(o_ref, m_ref, l_ref, m_scr, l_scr, acc_scr, num_kv_heads):
    # m/l refs are [1, R, Hq] blocks (see _sr_finalize_partial).
    r, hq, d = o_ref.shape
    g = hq // num_kv_heads
    denom = jnp.maximum(l_scr[:, 0:1], 1e-30)
    out = acc_scr[...] / denom  # [Hkv*R*G, D], layout [kh, r, j]
    m_all = m_scr[...]
    l_all = l_scr[...]
    for kh in range(num_kv_heads):
        sl = (kh * r * g, (kh + 1) * r * g)
        o_ref[:, kh * g : (kh + 1) * g, :] = (
            jax.lax.slice(out, (sl[0], 0), (sl[1], d)).reshape(r, g, d)
            .astype(o_ref.dtype)
        )
        m_ref[0, :, kh * g : (kh + 1) * g] = jax.lax.slice(
            m_all, (sl[0], 0), (sl[1], 1)
        ).reshape(r, g)
        l_ref[0, :, kh * g : (kh + 1) * g] = jax.lax.slice(
            l_all, (sl[0], 0), (sl[1], 1)
        ).reshape(r, g)


def _kernel_partial(
    bt_k_ref, bt_v_ref, context_lens_ref, is_local_ref,  # scalar prefetch
    q_ref, k_ref, v_ref,
    o_ref, m_ref, l_ref,
    m_scr, l_scr, acc_scr,
    *, scale: float, block_size: int, num_kv_heads: int,
):
    n = pl.program_id(0)
    m = pl.program_id(1)
    num_m = pl.num_programs(1)
    ctx = context_lens_ref[n]

    @pl.when(m == 0)
    def _init():
        _init_scratch_floor(m_scr, l_scr, acc_scr)

    block_start = m * block_size

    @pl.when((block_start < ctx) & (is_local_ref[n, m] != 0))
    def _compute():
        _sr_update(
            q_ref[0], k_ref[0], v_ref[0], ctx, block_start,
            m_scr, l_scr, acc_scr,
            scale=scale, block_size=block_size, num_kv_heads=num_kv_heads,
        )

    @pl.when(m == num_m - 1)
    def _finalize():
        _sr_finalize_partial(o_ref, m_ref, l_ref, m_scr, l_scr, acc_scr)


def _kernel_partial_q8(
    bt_k_ref, bt_v_ref, context_lens_ref, is_local_ref,
    q_ref, k_ref, ks_ref, v_ref, vs_ref,
    o_ref, m_ref, l_ref,
    m_scr, l_scr, acc_scr,
    *, scale: float, block_size: int, num_kv_heads: int,
):
    n = pl.program_id(0)
    m = pl.program_id(1)
    num_m = pl.num_programs(1)
    ctx = context_lens_ref[n]

    @pl.when(m == 0)
    def _init():
        _init_scratch_floor(m_scr, l_scr, acc_scr)

    block_start = m * block_size

    @pl.when((block_start < ctx) & (is_local_ref[n, m] != 0))
    def _compute():
        _sr_update(
            q_ref[0], k_ref[0], v_ref[0], ctx, block_start,
            m_scr, l_scr, acc_scr,
            scale=scale, block_size=block_size, num_kv_heads=num_kv_heads,
            k_scales=ks_ref[0], v_scales=vs_ref[0],
        )

    @pl.when(m == num_m - 1)
    def _finalize():
        _sr_finalize_partial(o_ref, m_ref, l_ref, m_scr, l_scr, acc_scr)


def _grouped_kernel_partial(
    bt_k_ref, bt_v_ref, context_lens_ref, is_local_ref,
    q_ref, k_ref, v_ref,
    o_ref, m_ref, l_ref,
    m_scr, l_scr, acc_scr,
    *, scale: float, block_size: int, num_kv_heads: int, rows: int,
):
    bi = pl.program_id(0)
    m = pl.program_id(1)
    num_m = pl.num_programs(1)

    @pl.when(m == 0)
    def _init():
        _init_scratch_floor(m_scr, l_scr, acc_scr)

    block_start = m * block_size
    ctx_rows = [context_lens_ref[bi * rows + i] for i in range(rows)]
    ctx_max = ctx_rows[0]
    for c in ctx_rows[1:]:
        ctx_max = jnp.maximum(ctx_max, c)

    @pl.when((block_start < ctx_max) & (is_local_ref[bi, m] != 0))
    def _compute():
        _gr_update(
            q_ref[...], k_ref[0], v_ref[0],
            ctx_rows, block_start, m_scr, l_scr, acc_scr,
            scale=scale, block_size=block_size, num_kv_heads=num_kv_heads,
        )

    @pl.when(m == num_m - 1)
    def _finalize():
        _gr_finalize_partial(o_ref, m_ref, l_ref, m_scr, l_scr, acc_scr, num_kv_heads)


def _grouped_kernel_partial_q8(
    bt_k_ref, bt_v_ref, context_lens_ref, is_local_ref,
    q_ref, k_ref, ks_ref, v_ref, vs_ref,
    o_ref, m_ref, l_ref,
    m_scr, l_scr, acc_scr,
    *, scale: float, block_size: int, num_kv_heads: int, rows: int,
):
    bi = pl.program_id(0)
    m = pl.program_id(1)
    num_m = pl.num_programs(1)

    @pl.when(m == 0)
    def _init():
        _init_scratch_floor(m_scr, l_scr, acc_scr)

    block_start = m * block_size
    ctx_rows = [context_lens_ref[bi * rows + i] for i in range(rows)]
    ctx_max = ctx_rows[0]
    for c in ctx_rows[1:]:
        ctx_max = jnp.maximum(ctx_max, c)

    @pl.when((block_start < ctx_max) & (is_local_ref[bi, m] != 0))
    def _compute():
        _gr_update(
            q_ref[...], k_ref[0], v_ref[0], ctx_rows, block_start,
            m_scr, l_scr, acc_scr,
            scale=scale, block_size=block_size, num_kv_heads=num_kv_heads,
            k_scales=ks_ref[0], v_scales=vs_ref[0],
        )

    @pl.when(m == num_m - 1)
    def _finalize():
        _gr_finalize_partial(o_ref, m_ref, l_ref, m_scr, l_scr, acc_scr, num_kv_heads)


# ------------------------------------------------------------- dispatch


def _cache_parts(cache, layer_idx, tables, head_dim):
    """(blocks, scales_or_None, bt_k, bt_v, dims). ``blocks`` is the
    cache flattened to [(L*2*(NB+1)), BS, Hkv*D] — the trailing head/dim
    axes stay FOLDED exactly as stored (ops/kv_cache.py layout note), so
    the leading-dim merge is a free bitcast and every kernel block keeps
    a lane-aligned minor dim; table entries are layer-folded global
    block ids."""
    from nano_pearl_tpu.ops.kv_cache import cache_is_quantized, global_block_offsets

    quant = cache_is_quantized(cache)
    arr = cache["q"] if quant else cache
    l, _, nb1, bs, hd = arr.shape
    hkv = hd // head_dim
    blocks = arr.reshape(l * 2 * nb1, bs, hd)
    # strided bf16 scales [.., BS, Hkv*stride] (kv_cache.kv_scale_stride)
    scales = (
        cache["s"].reshape(l * 2 * nb1, bs, cache["s"].shape[-1]) if quant else None
    )
    k_off, v_off = global_block_offsets(cache, layer_idx)
    return blocks, scales, tables + k_off, tables + v_off, (bs, hkv, head_dim)


def paged_attention_pallas_grouped(
    q: jax.Array,  # [B*R, Hq, D] (R packed rows per sequence, seq-major)
    cache,  # FULL cache [L, 2, NB+1, BS, Hkv*D] or int8 {"q","s"} pytree
    layer_idx,
    group_tables: jax.Array,  # [B, M] int32 (one table per sequence)
    context_lens: jax.Array,  # [B*R] int32
    scale: float,
    rows_per_group: int,
    interpret: bool = False,
    mono: bool | None = None,
    vma=None,
) -> jax.Array:
    n, hq, d = q.shape
    r = rows_per_group
    b = n // r
    m = group_tables.shape[1]
    blocks, scales, bt_k, bt_v, (bs, hkv, _) = _cache_parts(
        cache, layer_idx, group_tables, d
    )
    g = hq // hkv
    acc_scratch = [
        pltpu.VMEM((hkv * r * g, 128), jnp.float32),
        pltpu.VMEM((hkv * r * g, 128), jnp.float32),
        pltpu.VMEM((hkv * r * g, d), jnp.float32),
    ]

    if scales is None and (hkv * d) % 128 == 0:
        if _resolve_mono(mono):
            # mono kernel: the whole layer is ONE grid step (see the
            # mono section) — removes the ~2.7 us/grid-step fixed cost
            # that dominates the db kernel at decode/verify shapes
            return _mono_call(
                q.reshape(b, r, hq, d), blocks, bt_k, bt_v, context_lens,
                jnp.max(context_lens.reshape(b, r), axis=1), scale, bs,
                hkv, interpret, vma,
            )
        # double-buffered per-group kernel: grid (B,), manual DMA over
        # the group's ACTUAL context blocks, pipelined ACROSS grid steps
        # (_db_xstep_loop). Manual HBM DMA slices need the minor dim
        # 128-aligned, which the folded Hkv*D storage axis satisfies for
        # every realistic head count; non-aligned shapes take the
        # BlockSpec fallback below.
        cum, lp = _db_chunk_meta(
            jnp.max(context_lens.reshape(b, r), axis=1), bs
        )
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=5,
            grid=(b,),
            in_specs=[
                pl.BlockSpec((r, hq, d), lambda bi, *_: (bi, 0, 0)),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec((r, hq, d), lambda bi, *_: (bi, 0, 0)),
            scratch_shapes=[
                pltpu.VMEM((2, _pages_per_chunk(bs) * bs, hkv * d), blocks.dtype),
                pltpu.VMEM((2, _pages_per_chunk(bs) * bs, hkv * d), blocks.dtype),
                *acc_scratch,
                pltpu.SemaphoreType.DMA((2, _pages_per_chunk(bs))),
                pltpu.SemaphoreType.DMA((2, _pages_per_chunk(bs))),
            ],
        )
        return pl.pallas_call(
            functools.partial(
                _grouped_kernel_db, scale=scale, block_size=bs,
                num_kv_heads=hkv, rows=r,
            ),
            grid_spec=grid_spec,
            out_shape=_sds((n, hq, d), q.dtype, vma),
            interpret=interpret,
        )(bt_k, bt_v, context_lens, cum, lp, q, blocks)

    if _q8_fastpath_ok(scales, bs, hkv, d):
        # quantized cache on the db/mono machinery: per-chunk value +
        # scale DMAs, in-update dequantization
        ctx_max = jnp.max(context_lens.reshape(b, r), axis=1)
        if _resolve_mono(mono):
            return _mono_call_q8(
                q.reshape(b, r, hq, d), blocks, scales, bt_k, bt_v,
                context_lens, ctx_max, scale, bs, hkv, interpret, vma,
            )
        return _db_call_q8_grouped(
            q, blocks, scales, bt_k, bt_v, context_lens, ctx_max,
            scale, bs, hkv, r, interpret, vma,
        )

    # fallback: BlockSpec-pipelined grid (B, M) kernel (misaligned
    # shapes only)
    def _mi_eff(bi, mi, cl):
        # clamp the table slot to the group's last in-context block: grid
        # steps past the context re-reference the PREVIOUS block index, and
        # Pallas elides the HBM->VMEM copy when the block index is
        # unchanged — DMA traffic scales with the ACTUAL context, not the
        # padded table width
        ctx_max = cl[bi * r]
        for i in range(1, r):
            ctx_max = jnp.maximum(ctx_max, cl[bi * r + i])
        return jnp.minimum(mi, jnp.maximum(ctx_max - 1, 0) // bs)

    q_spec = pl.BlockSpec((r, hq, d), lambda bi, mi, btk, btv, cl: (bi, 0, 0))
    blk_k = pl.BlockSpec(
        (1, bs, hkv * d),
        lambda bi, mi, btk, btv, cl: (btk[bi, _mi_eff(bi, mi, cl)], 0, 0),
    )
    blk_v = pl.BlockSpec(
        (1, bs, hkv * d),
        lambda bi, mi, btk, btv, cl: (btv[bi, _mi_eff(bi, mi, cl)], 0, 0),
    )
    if scales is None:
        in_specs = [q_spec, blk_k, blk_v]
        inputs = (q, blocks, blocks)
        kernel = functools.partial(
            _grouped_kernel, scale=scale, block_size=bs, num_kv_heads=hkv, rows=r
        )
    else:
        s_k = pl.BlockSpec(
            (1, bs, scales.shape[-1]),
            lambda bi, mi, btk, btv, cl: (btk[bi, _mi_eff(bi, mi, cl)], 0, 0),
        )
        s_v = pl.BlockSpec(
            (1, bs, scales.shape[-1]),
            lambda bi, mi, btk, btv, cl: (btv[bi, _mi_eff(bi, mi, cl)], 0, 0),
        )
        in_specs = [q_spec, blk_k, s_k, blk_v, s_v]
        inputs = (q, blocks, scales, blocks, scales)
        kernel = functools.partial(
            _grouped_kernel_q8, scale=scale, block_size=bs, num_kv_heads=hkv, rows=r
        )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(b, m),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((r, hq, d), lambda bi, mi, btk, btv, cl: (bi, 0, 0)),
        scratch_shapes=acc_scratch,
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=_sds((n, hq, d), q.dtype, vma),
        interpret=interpret,
    )(bt_k, bt_v, context_lens, *inputs)


def _grouped_kernel_db_fresh(
    bt_k_ref, bt_v_ref, context_lens_ref, ctx0_ref, cum_ref, lp_ref,  # prefetch
    q_ref,  # [R, Hq, D] VMEM
    blocks_ref,  # [L*2*(NB+1), BS, Hkv*D] HBM (manual DMA) — READ-ONLY here
    fk_ref, fv_ref,  # [1, R, Hkv*D] VMEM: this group's fresh post-rope K/V
    # (3D with a leading 1: Mosaic requires the block's last two dims
    # divisible by (8, 128) or equal to the array dims — [B, R, HD]
    # blocks (1, R, HD) satisfy the latter for any R)
    o_ref,
    kbuf, vbuf, m_scr, l_scr, acc_scr, k_sems, v_sems,
    *, scale: float, block_size: int, num_kv_heads: int, rows: int,
):
    """Deferred-write packed verify: like _grouped_kernel_db but the
    round's fresh rows arrive IN-OPERAND instead of pre-scattered into
    the cache. Cache slots are masked to pos < min(ctx_row, ctx0) (the
    cache beyond ctx0 is stale) and a final flash update folds in the
    fresh rows at absolute positions ctx0 + t. Removes the per-layer
    XLA scatter from the verify forward (~40 us per 448 rows on v5e)."""
    bi = pl.program_id(0)
    nb = pl.num_programs(0)
    ctx_rows = [context_lens_ref[bi * rows + i] for i in range(rows)]
    c0 = ctx0_ref[bi]
    ctx_cache = [jnp.minimum(c, c0) for c in ctx_rows]
    ppc = _pages_per_chunk(block_size)
    _init_scratch(m_scr, l_scr, acc_scr)

    def dmas(slot, g, ci):
        return _chunk_dmas(
            blocks_ref, bt_k_ref, g, ci, kbuf.at[slot], k_sems.at[slot],
            block_size, lp_ref[g], ppc,
        ) + _chunk_dmas(
            blocks_ref, bt_v_ref, g, ci, vbuf.at[slot], v_sems.at[slot],
            block_size, lp_ref[g], ppc,
        )

    def start(slot, g, ci):
        for dma in dmas(slot, g, ci):
            dma.start()

    def wait(slot, ci):
        for dma in dmas(slot, bi, ci):
            dma.wait()

    cbs = ppc * block_size

    def compute(slot, ci):
        _gr_update(
            q_ref[...], kbuf[slot], vbuf[slot], ctx_cache, ci * cbs,
            m_scr, l_scr, acc_scr,
            scale=scale, block_size=cbs, num_kv_heads=num_kv_heads,
        )

    _db_xstep_loop(bi, nb, cum_ref, start, wait, compute)
    # fresh rows: one more flash update at block_start = ctx0 with the
    # per-row ctx staircase giving exactly the packed-verify visibility
    _gr_update(
        q_ref[...], fk_ref[0], fv_ref[0], ctx_rows, c0,
        m_scr, l_scr, acc_scr,
        scale=scale, block_size=rows, num_kv_heads=num_kv_heads,
    )
    _gr_finalize(o_ref, l_scr, acc_scr, num_kv_heads)


def _grouped_kernel_db_fresh_split(
    bt_k_ref, bt_v_ref, context_lens_ref, ctx0_ref, cum_ref, lp_ref,
    q_ref,  # [R, Hq, D] VMEM
    blocks_ref,  # HBM (manual DMA) — READ-ONLY here
    fk_ref, fv_ref,  # [1, R, Hkv*D] VMEM: this group's fresh post-rope K/V
    o_ref,
    kbuf, vbuf, m_scr, l_scr, acc_scr, k_sems, v_sems,
    *, scale: float, block_size: int, num_kv_heads: int, rows: int,
):
    """Deferred-write packed verify with the round-aligned SPLIT-BOUNDARY
    schedule (the target-side twin of _kernel_db_split).

    Partition of each row's key stream: chunk multiples, b1 = ctx0 (the
    cache / in-operand boundary — positions >= ctx0 arrive as fresh
    operand rows), and b2 = the draft's fresh-window start (length - 1 =
    max ctx over the group's rows - 1, derivable in-kernel). Cache
    chunks cover cells below ctx0; the fresh slab is folded in as up to
    three interval updates split at the one possible chunk multiple
    inside the window and at b2 — the exact cells, in the exact order,
    that the draft's split decode folds from its own cache. With
    identical cell values (GEMM-class-aligned K/V) the two streams'
    logits agree bitwise, which is what holds the layer-share
    acceptance ceiling (docs/DESIGN.md §8) WITHOUT the per-layer
    write-then-read scatter."""
    bi = pl.program_id(0)
    nb = pl.num_programs(0)
    ctx_rows = [context_lens_ref[bi * rows + i] for i in range(rows)]
    c0 = ctx0_ref[bi]
    ctx_max = ctx_rows[0]
    for c in ctx_rows[1:]:
        ctx_max = jnp.maximum(ctx_max, c)
    ppc = _pages_per_chunk(block_size)
    _init_scratch(m_scr, l_scr, acc_scr)

    def dmas(slot, g, ci):
        return _chunk_dmas(
            blocks_ref, bt_k_ref, g, ci, kbuf.at[slot], k_sems.at[slot],
            block_size, lp_ref[g], ppc,
        ) + _chunk_dmas(
            blocks_ref, bt_v_ref, g, ci, vbuf.at[slot], v_sems.at[slot],
            block_size, lp_ref[g], ppc,
        )

    def start(slot, g, ci):
        for dma in dmas(slot, g, ci):
            dma.start()

    def wait(slot, ci):
        for dma in dmas(slot, bi, ci):
            dma.wait()

    cbs = ppc * block_size

    def compute(slot, ci):
        cstart = ci * cbs
        # cache cells: [0, c0) — guard keeps a fully-masked FIRST update
        # from corrupting the running max (c0 == 0: no cache at all)
        run = cstart < jnp.minimum(c0, ctx_max)

        @pl.when(run)
        def _():
            _gr_update(
                q_ref[...], kbuf[slot], vbuf[slot], ctx_rows, cstart,
                m_scr, l_scr, acc_scr,
                scale=scale, block_size=cbs, num_kv_heads=num_kv_heads,
                hi=c0,
            )

    _db_xstep_loop(bi, nb, cum_ref, start, wait, compute)
    # fresh cells: [c0, cstar), [cstar, ctx-staircase) — cstar = the one
    # chunk multiple that can fall inside the < cbs-wide window; the
    # second cell is usually empty and skips
    cstar = (c0 // cbs + 1) * cbs
    for lo, hi in ((c0, cstar), (cstar, None)):
        hi_eff = ctx_max if hi is None else jnp.minimum(hi, ctx_max)
        run = lo < hi_eff

        @pl.when(run)
        def _(lo=lo, hi=hi):
            _gr_update(
                q_ref[...], fk_ref[0], fv_ref[0], ctx_rows, c0,
                m_scr, l_scr, acc_scr,
                scale=scale, block_size=rows, num_kv_heads=num_kv_heads,
                lo=lo, hi=hi,
            )

    _gr_finalize(o_ref, l_scr, acc_scr, num_kv_heads)


def _grouped_kernel_db_mono_fresh(
    bt_k_ref, bt_v_ref, context_lens_ref, ctx0_ref, cum_ref, lp_ref,  # prefetch
    q_hbm,  # [B, R, Hq, D] ANY
    blocks_ref,  # [L*2*(NB+1), BS, Hkv*D] HBM (manual DMA) — READ-ONLY here
    fk_hbm, fv_hbm,  # [B, R, Hkv*D] ANY: per-group fresh post-rope K/V
    o_hbm,  # [B, R, Hq, D] ANY (output)
    kbuf, vbuf, qbuf, obuf,
    fkbuf, fvbuf,  # VMEM (2, Rpad, Hkv*D) — R padded to a sublane multiple
    m_scr, l_scr, acc_scr,
    k_sems, v_sems, q_sems, o_sems, f_sems,
    *, scale: float, block_size: int, num_kv_heads: int, rows: int,
    rows_pad: int, n_groups: int,
):
    """Mono (grid=1) deferred-write packed verify: the whole layer as one
    grid step — _grouped_kernel_db_mono's flat (group, chunk) stream with
    _grouped_kernel_db_fresh's in-operand fresh-row handling (cache
    masked to pos < min(ctx, ctx0); one final flash update folds the
    fresh window in at absolute positions ctx0 + t). The fresh slabs ride
    the same per-group double-buffered leading-dim DMAs as q/o."""
    ppc = _pages_per_chunk(block_size)
    cbs = ppc * block_size

    def chunk_dmas(slot, g, ci):
        return _chunk_dmas(
            blocks_ref, bt_k_ref, g, ci, kbuf.at[slot], k_sems.at[slot],
            block_size, lp_ref[g], ppc,
        ) + _chunk_dmas(
            blocks_ref, bt_v_ref, g, ci, vbuf.at[slot], v_sems.at[slot],
            block_size, lp_ref[g], ppc,
        )

    def start_chunk(slot, g, ci):
        for dma in chunk_dmas(slot, g, ci):
            dma.start()

    def wait_chunk(slot, g, ci):
        for dma in chunk_dmas(slot, g, ci):
            dma.wait()

    def q_dmas(g):
        p = jax.lax.rem(g, 2)
        return [
            pltpu.make_async_copy(q_hbm.at[g], qbuf.at[p], q_sems.at[p]),
            pltpu.make_async_copy(fk_hbm.at[g], fkbuf.at[p], f_sems.at[p, 0]),
            pltpu.make_async_copy(fv_hbm.at[g], fvbuf.at[p], f_sems.at[p, 1]),
        ]

    def o_dma(g):
        p = jax.lax.rem(g, 2)
        return pltpu.make_async_copy(obuf.at[p], o_hbm.at[g], o_sems.at[p])

    def start_q(g):
        for dma in q_dmas(g):
            dma.start()

    def begin_group(g):
        @pl.when(g >= 2)
        def _():
            o_dma(g - 2).wait()

        for dma in q_dmas(g):
            dma.wait()
        _init_scratch(m_scr, l_scr, acc_scr)

    def compute(slot, g, ci):
        ctx_rows = [context_lens_ref[g * rows + i] for i in range(rows)]
        c0 = ctx0_ref[g]
        ctx_cache = [jnp.minimum(c, c0) for c in ctx_rows]
        _gr_update(
            qbuf[jax.lax.rem(g, 2)], kbuf[slot], vbuf[slot], ctx_cache,
            ci * cbs, m_scr, l_scr, acc_scr,
            scale=scale, block_size=cbs, num_kv_heads=num_kv_heads,
        )

    def end_group(g):
        p = jax.lax.rem(g, 2)
        ctx_rows = [context_lens_ref[g * rows + i] for i in range(rows)]
        # padded fresh rows land at positions ctx0 + rows.. >= every
        # row's ctx, so the staircase masks them
        _gr_update(
            qbuf[p], fkbuf[p], fvbuf[p], ctx_rows, ctx0_ref[g],
            m_scr, l_scr, acc_scr,
            scale=scale, block_size=rows_pad, num_kv_heads=num_kv_heads,
        )
        _gr_finalize(obuf.at[p], l_scr, acc_scr, num_kv_heads)
        o_dma(g).start()

    _mono_stream(
        n_groups, cum_ref, start_chunk, wait_chunk, start_q, begin_group,
        compute, end_group,
    )
    o_dma(n_groups - 1).wait()
    if n_groups >= 2:
        o_dma(n_groups - 2).wait()


def _grouped_kernel_db_mono_partial(
    bt_k_ref, bt_v_ref, context_lens_ref, cum_ref, lp_ref,  # scalar prefetch
    q_hbm,  # [B, R, Hq, D] ANY
    blocks_ref,  # [L*2*(NB+1), BS, Hkv*D] HBM (manual DMA) — read-only
    o_hbm,  # [B, R, Hq, D] ANY (output)
    m_hbm, l_hbm,  # [B, Rpad, 128] f32 ANY (outputs; first Hq lanes live —
    # manual DMA slabs need a 128-aligned lane dim, Hq = 8 is not)
    kbuf, vbuf, qbuf, obuf,
    mbuf, lbuf,  # VMEM (2, Rpad, 128) f32
    m_scr, l_scr, acc_scr,
    k_sems, v_sems, q_sems, o_sems, ml_sems,
    *, scale: float, block_size: int, num_kv_heads: int, rows: int,
    rows_pad: int, n_groups: int,
):
    """Mono grouped attention over the CACHE ONLY, exporting flash
    partials (o normalized, m, l) per row — the cache half of the
    deferred packed verify. The fresh-window half runs as a dense XLA
    batched attention outside the kernel and the two merge by the
    standard (m, l) softmax-combine (ops/attention.merge_attn_partials)
    — replacing the per-group in-kernel fresh updates of
    _grouped_kernel_db_mono_fresh, whose ~1.5 us/group fixed cost
    (36 layers x 32 groups) dominated the deferred win."""
    ppc = _pages_per_chunk(block_size)
    cbs = ppc * block_size
    g_heads = q_hbm.shape[2] // num_kv_heads

    def chunk_dmas(slot, g, ci):
        return _chunk_dmas(
            blocks_ref, bt_k_ref, g, ci, kbuf.at[slot], k_sems.at[slot],
            block_size, lp_ref[g], ppc,
        ) + _chunk_dmas(
            blocks_ref, bt_v_ref, g, ci, vbuf.at[slot], v_sems.at[slot],
            block_size, lp_ref[g], ppc,
        )

    def start_chunk(slot, g, ci):
        for dma in chunk_dmas(slot, g, ci):
            dma.start()

    def wait_chunk(slot, g, ci):
        for dma in chunk_dmas(slot, g, ci):
            dma.wait()

    def q_dma(g):
        p = jax.lax.rem(g, 2)
        return pltpu.make_async_copy(q_hbm.at[g], qbuf.at[p], q_sems.at[p])

    def out_dmas(g):
        p = jax.lax.rem(g, 2)
        return [
            pltpu.make_async_copy(obuf.at[p], o_hbm.at[g], o_sems.at[p]),
            pltpu.make_async_copy(mbuf.at[p], m_hbm.at[g], ml_sems.at[p, 0]),
            pltpu.make_async_copy(lbuf.at[p], l_hbm.at[g], ml_sems.at[p, 1]),
        ]

    def start_q(g):
        q_dma(g).start()

    def begin_group(g):
        @pl.when(g >= 2)
        def _():
            for dma in out_dmas(g - 2):
                dma.wait()

        q_dma(g).wait()
        _init_scratch_floor(m_scr, l_scr, acc_scr)

    def compute(slot, g, ci):
        ctx_rows = [context_lens_ref[g * rows + i] for i in range(rows)]
        _gr_update(
            qbuf[jax.lax.rem(g, 2)], kbuf[slot], vbuf[slot], ctx_rows,
            ci * cbs, m_scr, l_scr, acc_scr,
            scale=scale, block_size=cbs, num_kv_heads=num_kv_heads,
        )

    def end_group(g):
        p = jax.lax.rem(g, 2)
        denom = jnp.maximum(l_scr[:, 0:1], 1e-30)
        out = acc_scr[...] / denom  # [Hkv*R*G, D], layout [kh, r, j]
        m_all, l_all = m_scr[...], l_scr[...]
        r, hq = rows, num_kv_heads * g_heads
        for kh in range(num_kv_heads):
            sl = (kh * r * g_heads, (kh + 1) * r * g_heads)
            obuf[p, :, kh * g_heads : (kh + 1) * g_heads, :] = (
                jax.lax.slice(out, (sl[0], 0), (sl[1], out.shape[1]))
                .reshape(r, g_heads, out.shape[1]).astype(obuf.dtype)
            )
            mbuf[p, :r, kh * g_heads : (kh + 1) * g_heads] = jax.lax.slice(
                m_all, (sl[0], 0), (sl[1], 1)
            ).reshape(r, g_heads)
            lbuf[p, :r, kh * g_heads : (kh + 1) * g_heads] = jax.lax.slice(
                l_all, (sl[0], 0), (sl[1], 1)
            ).reshape(r, g_heads)
        for dma in out_dmas(g):
            dma.start()

    _mono_stream(
        n_groups, cum_ref, start_chunk, wait_chunk, start_q, begin_group,
        compute, end_group,
    )
    for dma in out_dmas(n_groups - 1):
        dma.wait()
    if n_groups >= 2:
        for dma in out_dmas(n_groups - 2):
            dma.wait()


def paged_attention_pallas_grouped_cache_partials(
    q: jax.Array,  # [B*R, Hq, D]
    cache,  # FULL cache [L, 2, NB+1, BS, Hkv*D] — bf16/f32 only
    layer_idx,
    group_tables: jax.Array,  # [B, M]
    context_lens: jax.Array,  # [B*R] CACHE-side context per row
    scale: float,
    rows_per_group: int,
    interpret: bool = False,
):
    """(o, m, l) flash partials of grouped attention over the paged
    cache only (rows with context 0 export l = 0 / m = floor). Mono
    (grid=1) kernel; no db fallback — callers gate on _use_mono()."""
    n, hq, d = q.shape
    r = rows_per_group
    b = n // r
    rpad = -(-r // 8) * 8
    blocks, scales, bt_k, bt_v, (bs, hkv, _) = _cache_parts(
        cache, layer_idx, group_tables, d
    )
    assert scales is None and (hkv * d) % 128 == 0
    g = hq // hkv
    cum, lp = _db_chunk_meta(
        jnp.max(context_lens.reshape(b, r), axis=1), bs
    )
    ppc = _pages_per_chunk(bs)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(1,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # q4
            pl.BlockSpec(memory_space=pl.ANY),  # blocks
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, ppc * bs, hkv * d), blocks.dtype),
            pltpu.VMEM((2, ppc * bs, hkv * d), blocks.dtype),
            pltpu.VMEM((2, r, hq, d), q.dtype),
            pltpu.VMEM((2, r, hq, d), q.dtype),
            pltpu.VMEM((2, rpad, 128), jnp.float32),
            pltpu.VMEM((2, rpad, 128), jnp.float32),
            pltpu.VMEM((hkv * r * g, 128), jnp.float32),
            pltpu.VMEM((hkv * r * g, 128), jnp.float32),
            pltpu.VMEM((hkv * r * g, d), jnp.float32),
            pltpu.SemaphoreType.DMA((2, ppc)),
            pltpu.SemaphoreType.DMA((2, ppc)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
    )
    o, m, l = pl.pallas_call(
        functools.partial(
            _grouped_kernel_db_mono_partial, scale=scale, block_size=bs,
            num_kv_heads=hkv, rows=r, rows_pad=rpad, n_groups=b,
        ),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((b, r, hq, d), q.dtype),
            jax.ShapeDtypeStruct((b, rpad, 128), jnp.float32),
            jax.ShapeDtypeStruct((b, rpad, 128), jnp.float32),
        ],
        interpret=interpret,
    )(bt_k, bt_v, context_lens, cum, lp, q.reshape(b, r, hq, d), blocks)
    return (
        o.reshape(n, hq, d),
        m[:, :r, :hq].reshape(n, hq),
        l[:, :r, :hq].reshape(n, hq),
    )


def _mono_call_fresh(
    q4, blocks, fk, fv, bt_k, bt_v, context_lens, ctx0, ctx_max_per_group,
    scale, bs, hkv, interpret=False, vma=None,
):
    b, r, hq, d = q4.shape
    g = hq // hkv
    # fresh slabs ride manual leading-dim DMAs, so their trailing (R, HD)
    # dims must be tile-aligned: pad R up to a sublane multiple (8). The
    # padded rows sit at positions ctx0 + r.. >= every row's ctx and are
    # masked by the staircase in the final _gr_update. (q/o slabs are 4D
    # [R, Hq, D] per group — their tiled dims are (Hq, D), already
    # aligned for any R.)
    rpad = -(-r // 8) * 8
    if rpad != r:
        pad = [(0, 0), (0, rpad - r), (0, 0)]
        fk = jnp.pad(fk, pad)
        fv = jnp.pad(fv, pad)
    cum, lp = _db_chunk_meta(ctx_max_per_group, bs)
    ppc = _pages_per_chunk(bs)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=6,
        grid=(1,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # q4
            pl.BlockSpec(memory_space=pl.ANY),  # blocks
            pl.BlockSpec(memory_space=pl.ANY),  # fk
            pl.BlockSpec(memory_space=pl.ANY),  # fv
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((2, ppc * bs, hkv * d), blocks.dtype),
            pltpu.VMEM((2, ppc * bs, hkv * d), blocks.dtype),
            pltpu.VMEM((2, r, hq, d), q4.dtype),
            pltpu.VMEM((2, r, hq, d), q4.dtype),
            pltpu.VMEM((2, rpad, hkv * d), blocks.dtype),
            pltpu.VMEM((2, rpad, hkv * d), blocks.dtype),
            pltpu.VMEM((hkv * r * g, 128), jnp.float32),
            pltpu.VMEM((hkv * r * g, 128), jnp.float32),
            pltpu.VMEM((hkv * r * g, d), jnp.float32),
            pltpu.SemaphoreType.DMA((2, ppc)),
            pltpu.SemaphoreType.DMA((2, ppc)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
    )
    out = pl.pallas_call(
        functools.partial(
            _grouped_kernel_db_mono_fresh, scale=scale, block_size=bs,
            num_kv_heads=hkv, rows=r, rows_pad=rpad, n_groups=b,
        ),
        grid_spec=grid_spec,
        out_shape=_sds((b, r, hq, d), q4.dtype, vma),
        interpret=interpret,
    )(bt_k, bt_v, context_lens, ctx0, cum, lp, q4, blocks, fk, fv)
    return out.reshape(b * r, hq, d)


def paged_attention_pallas_grouped_fresh(
    q: jax.Array,  # [B*R, Hq, D]
    cache,  # FULL cache [L, 2, NB+1, BS, Hkv*D] — bf16/f32 only
    layer_idx,
    group_tables: jax.Array,  # [B, M]
    context_lens: jax.Array,  # [B*R]
    ctx0: jax.Array,  # [B] pre-round context per group
    fresh_k: jax.Array,  # [B*R, Hkv, D] post-rope fresh keys (this layer)
    fresh_v: jax.Array,  # [B*R, Hkv, D]
    scale: float,
    rows_per_group: int,
    interpret: bool = False,
    mono: bool | None = None,
    vma=None,
) -> jax.Array:
    n, hq, d = q.shape
    r = rows_per_group
    b = n // r
    blocks, scales, bt_k, bt_v, (bs, hkv, _) = _cache_parts(
        cache, layer_idx, group_tables, d
    )
    assert scales is None and (hkv * d) % 128 == 0, (
        "deferred-write verify requires a bf16/f32 cache with a "
        "lane-aligned folded head axis (the caller gates on this)"
    )
    g = hq // hkv
    fk = fresh_k.reshape(b, r, hkv * d).astype(blocks.dtype)
    fv = fresh_v.reshape(b, r, hkv * d).astype(blocks.dtype)
    ctx_max = jnp.max(
        jnp.minimum(context_lens.reshape(b, r), ctx0[:, None]), axis=1
    )
    if _resolve_mono(mono):
        return _mono_call_fresh(
            q.reshape(b, r, hq, d), blocks, fk, fv, bt_k, bt_v,
            context_lens, ctx0, ctx_max, scale, bs, hkv, interpret, vma,
        )
    cum, lp = _db_chunk_meta(ctx_max, bs)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=6,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((r, hq, d), lambda bi, *_: (bi, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, r, hkv * d), lambda bi, *_: (bi, 0, 0)),
            pl.BlockSpec((1, r, hkv * d), lambda bi, *_: (bi, 0, 0)),
        ],
        out_specs=pl.BlockSpec((r, hq, d), lambda bi, *_: (bi, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, _pages_per_chunk(bs) * bs, hkv * d), blocks.dtype),
            pltpu.VMEM((2, _pages_per_chunk(bs) * bs, hkv * d), blocks.dtype),
            pltpu.VMEM((hkv * r * g, 128), jnp.float32),
            pltpu.VMEM((hkv * r * g, 128), jnp.float32),
            pltpu.VMEM((hkv * r * g, d), jnp.float32),
            pltpu.SemaphoreType.DMA((2, _pages_per_chunk(bs))),
            pltpu.SemaphoreType.DMA((2, _pages_per_chunk(bs))),
        ],
    )
    return pl.pallas_call(
        functools.partial(
            _grouped_kernel_db_fresh, scale=scale, block_size=bs,
            num_kv_heads=hkv, rows=r,
        ),
        grid_spec=grid_spec,
        out_shape=_sds((n, hq, d), q.dtype, vma),
        interpret=interpret,
    )(bt_k, bt_v, context_lens, ctx0, cum, lp, q, blocks, fk, fv)


def paged_attention_pallas_split(
    q: jax.Array,  # [N, Hq, D]
    cache,  # FULL cache [L, 2, NB+1, BS, Hkv*D] — bf16/f32 only
    layer_idx,
    block_tables: jax.Array,  # [N, M] int32
    context_lens: jax.Array,  # [N] int32
    b1: jax.Array,  # [N] int32 VERIFYING round's fresh-window start
    scale: float,
    interpret: bool = False,
    vma=None,
) -> jax.Array:
    """Decode attention on the SPLIT-BOUNDARY schedule (_kernel_db_split):
    the draft gamma-scan flavor of the unified kernel family — its flash
    cell partition matches the deferred-write verify's
    (paged_attention_pallas_grouped_fresh_split) bitwise. db generation
    only (bf16/f32, lane-aligned folded heads); callers gate."""
    n, hq, d = q.shape
    blocks, scales, bt_k, bt_v, (bs, hkv, _) = _cache_parts(
        cache, layer_idx, block_tables, d
    )
    assert scales is None and (hkv * d) % 128 == 0, (
        "split-schedule decode requires a bf16/f32 cache with a "
        "lane-aligned folded head axis (the caller gates on this)"
    )
    cum, lp = _db_chunk_meta(context_lens, bs)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=6,
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, hq, d), lambda ni, *_: (ni, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, hq, d), lambda ni, *_: (ni, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, _pages_per_chunk(bs) * bs, hkv * d), blocks.dtype),
            pltpu.VMEM((2, _pages_per_chunk(bs) * bs, hkv * d), blocks.dtype),
            pltpu.VMEM((hq, 128), jnp.float32),
            pltpu.VMEM((hq, 128), jnp.float32),
            pltpu.VMEM((hq, d), jnp.float32),
            pltpu.SemaphoreType.DMA((2, _pages_per_chunk(bs))),
            pltpu.SemaphoreType.DMA((2, _pages_per_chunk(bs))),
        ],
    )
    return pl.pallas_call(
        functools.partial(
            _kernel_db_split, scale=scale, block_size=bs, num_kv_heads=hkv
        ),
        grid_spec=grid_spec,
        out_shape=_sds((n, hq, d), q.dtype, vma),
        interpret=interpret,
    )(bt_k, bt_v, context_lens, b1, cum, lp, q, blocks)


def paged_attention_pallas_grouped_fresh_split(
    q: jax.Array,  # [B*R, Hq, D]
    cache,  # FULL cache [L, 2, NB+1, BS, Hkv*D] — bf16/f32 only
    layer_idx,
    group_tables: jax.Array,  # [B, M]
    context_lens: jax.Array,  # [B*R]
    ctx0: jax.Array,  # [B] pre-round context per group (= b1)
    fresh_k: jax.Array,  # [B*R, Hkv, D] post-rope fresh keys (this layer)
    fresh_v: jax.Array,  # [B*R, Hkv, D]
    scale: float,
    rows_per_group: int,
    interpret: bool = False,
    vma=None,
) -> jax.Array:
    """Deferred-write packed verify on the SPLIT-BOUNDARY schedule
    (_grouped_kernel_db_fresh_split): bitwise-matches the split decode
    (paged_attention_pallas_split) cell-for-cell, holding the
    layer-share acceptance ceiling without the per-layer scatter."""
    n, hq, d = q.shape
    r = rows_per_group
    b = n // r
    blocks, scales, bt_k, bt_v, (bs, hkv, _) = _cache_parts(
        cache, layer_idx, group_tables, d
    )
    assert scales is None and (hkv * d) % 128 == 0, (
        "split-schedule verify requires a bf16/f32 cache with a "
        "lane-aligned folded head axis (the caller gates on this)"
    )
    g = hq // hkv
    fk = fresh_k.reshape(b, r, hkv * d).astype(blocks.dtype)
    fv = fresh_v.reshape(b, r, hkv * d).astype(blocks.dtype)
    ctx_max = jnp.max(
        jnp.minimum(context_lens.reshape(b, r), ctx0[:, None]), axis=1
    )
    cum, lp = _db_chunk_meta(ctx_max, bs)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=6,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((r, hq, d), lambda bi, *_: (bi, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, r, hkv * d), lambda bi, *_: (bi, 0, 0)),
            pl.BlockSpec((1, r, hkv * d), lambda bi, *_: (bi, 0, 0)),
        ],
        out_specs=pl.BlockSpec((r, hq, d), lambda bi, *_: (bi, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, _pages_per_chunk(bs) * bs, hkv * d), blocks.dtype),
            pltpu.VMEM((2, _pages_per_chunk(bs) * bs, hkv * d), blocks.dtype),
            pltpu.VMEM((hkv * r * g, 128), jnp.float32),
            pltpu.VMEM((hkv * r * g, 128), jnp.float32),
            pltpu.VMEM((hkv * r * g, d), jnp.float32),
            pltpu.SemaphoreType.DMA((2, _pages_per_chunk(bs))),
            pltpu.SemaphoreType.DMA((2, _pages_per_chunk(bs))),
        ],
    )
    return pl.pallas_call(
        functools.partial(
            _grouped_kernel_db_fresh_split, scale=scale, block_size=bs,
            num_kv_heads=hkv, rows=r,
        ),
        grid_spec=grid_spec,
        out_shape=_sds((n, hq, d), q.dtype, vma),
        interpret=interpret,
    )(bt_k, bt_v, context_lens, ctx0, cum, lp, q, blocks, fk, fv)


def paged_attention_pallas_partials(
    q: jax.Array,  # [N, Hq, D]
    cache,  # LOCAL cache shard [L, 2, NB_loc, BS, Hkv*D] or int8 pytree
    layer_idx,
    block_tables: jax.Array,  # [N, M] LOCAL block ids (pre-clamped by caller)
    context_lens: jax.Array,  # [N]
    is_local: jax.Array,  # [N, M] int32: 1 = slot belongs to this shard
    scale: float,
    interpret: bool = False,
):
    """Flash partials over this shard's blocks: (o_local, m, l) for the
    cross-shard softmax merge (parallel/sp.py)."""
    n, hq, d = q.shape
    m = block_tables.shape[1]
    blocks, scales, bt_k, bt_v, (bs, hkv, _) = _cache_parts(
        cache, layer_idx, block_tables, d
    )

    def _mi_eff(ni, mi, cl):
        return jnp.minimum(mi, jnp.maximum(cl[ni] - 1, 0) // bs)

    q_spec = pl.BlockSpec((1, hq, d), lambda ni, mi, btk, btv, cl, loc: (ni, 0, 0))
    blk_k = pl.BlockSpec(
        (1, bs, hkv * d),
        lambda ni, mi, btk, btv, cl, loc: (btk[ni, _mi_eff(ni, mi, cl)], 0, 0),
    )
    blk_v = pl.BlockSpec(
        (1, bs, hkv * d),
        lambda ni, mi, btk, btv, cl, loc: (btv[ni, _mi_eff(ni, mi, cl)], 0, 0),
    )
    if scales is None:
        in_specs = [q_spec, blk_k, blk_v]
        inputs = (q, blocks, blocks)
        kernel = functools.partial(
            _kernel_partial, scale=scale, block_size=bs, num_kv_heads=hkv
        )
    else:
        s_k = pl.BlockSpec(
            (1, bs, scales.shape[-1]),
            lambda ni, mi, btk, btv, cl, loc: (btk[ni, _mi_eff(ni, mi, cl)], 0, 0),
        )
        s_v = pl.BlockSpec(
            (1, bs, scales.shape[-1]),
            lambda ni, mi, btk, btv, cl, loc: (btv[ni, _mi_eff(ni, mi, cl)], 0, 0),
        )
        in_specs = [q_spec, blk_k, s_k, blk_v, s_v]
        inputs = (q, blocks, scales, blocks, scales)
        kernel = functools.partial(
            _kernel_partial_q8, scale=scale, block_size=bs, num_kv_heads=hkv
        )

    row_spec = pl.BlockSpec((1, 1, hq), lambda ni, mi, btk, btv, cl, loc: (ni, 0, 0))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(n, m),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((1, hq, d), lambda ni, mi, btk, btv, cl, loc: (ni, 0, 0)),
            row_spec,
            row_spec,
        ],
        scratch_shapes=[
            pltpu.VMEM((hq, 128), jnp.float32),
            pltpu.VMEM((hq, 128), jnp.float32),
            pltpu.VMEM((hq, d), jnp.float32),
        ],
    )
    o, m_out, l_out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((n, hq, d), q.dtype),
            jax.ShapeDtypeStruct((n, 1, hq), jnp.float32),
            jax.ShapeDtypeStruct((n, 1, hq), jnp.float32),
        ],
        interpret=interpret,
    )(bt_k, bt_v, context_lens, is_local.astype(jnp.int32), *inputs)
    return o, m_out.reshape(n, hq), l_out.reshape(n, hq)


def paged_attention_pallas_grouped_partials(
    q: jax.Array,  # [B*R, Hq, D]
    cache,  # LOCAL cache shard
    layer_idx,
    group_tables: jax.Array,  # [B, M] LOCAL block ids (pre-clamped)
    context_lens: jax.Array,  # [B*R]
    is_local: jax.Array,  # [B, M]
    scale: float,
    rows_per_group: int,
    interpret: bool = False,
):
    n, hq, d = q.shape
    r = rows_per_group
    b = n // r
    m = group_tables.shape[1]
    blocks, scales, bt_k, bt_v, (bs, hkv, _) = _cache_parts(
        cache, layer_idx, group_tables, d
    )
    g = hq // hkv

    def _mi_eff(bi, mi, cl):
        ctx_max = cl[bi * r]
        for i in range(1, r):
            ctx_max = jnp.maximum(ctx_max, cl[bi * r + i])
        return jnp.minimum(mi, jnp.maximum(ctx_max - 1, 0) // bs)

    q_spec = pl.BlockSpec((r, hq, d), lambda bi, mi, btk, btv, cl, loc: (bi, 0, 0))
    blk_k = pl.BlockSpec(
        (1, bs, hkv * d),
        lambda bi, mi, btk, btv, cl, loc: (btk[bi, _mi_eff(bi, mi, cl)], 0, 0),
    )
    blk_v = pl.BlockSpec(
        (1, bs, hkv * d),
        lambda bi, mi, btk, btv, cl, loc: (btv[bi, _mi_eff(bi, mi, cl)], 0, 0),
    )
    if scales is None:
        in_specs = [q_spec, blk_k, blk_v]
        inputs = (q, blocks, blocks)
        kernel = functools.partial(
            _grouped_kernel_partial, scale=scale, block_size=bs,
            num_kv_heads=hkv, rows=r,
        )
    else:
        s_k = pl.BlockSpec(
            (1, bs, scales.shape[-1]),
            lambda bi, mi, btk, btv, cl, loc: (btk[bi, _mi_eff(bi, mi, cl)], 0, 0),
        )
        s_v = pl.BlockSpec(
            (1, bs, scales.shape[-1]),
            lambda bi, mi, btk, btv, cl, loc: (btv[bi, _mi_eff(bi, mi, cl)], 0, 0),
        )
        in_specs = [q_spec, blk_k, s_k, blk_v, s_v]
        inputs = (q, blocks, scales, blocks, scales)
        kernel = functools.partial(
            _grouped_kernel_partial_q8, scale=scale, block_size=bs,
            num_kv_heads=hkv, rows=r,
        )

    row_spec = pl.BlockSpec((1, r, hq), lambda bi, mi, btk, btv, cl, loc: (bi, 0, 0))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(b, m),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((r, hq, d), lambda bi, mi, btk, btv, cl, loc: (bi, 0, 0)),
            row_spec,
            row_spec,
        ],
        scratch_shapes=[
            pltpu.VMEM((hkv * r * g, 128), jnp.float32),
            pltpu.VMEM((hkv * r * g, 128), jnp.float32),
            pltpu.VMEM((hkv * r * g, d), jnp.float32),
        ],
    )
    o, m_out, l_out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((n, hq, d), q.dtype),
            jax.ShapeDtypeStruct((b, r, hq), jnp.float32),
            jax.ShapeDtypeStruct((b, r, hq), jnp.float32),
        ],
        interpret=interpret,
    )(bt_k, bt_v, context_lens, is_local.astype(jnp.int32), *inputs)
    return o, m_out.reshape(n, hq), l_out.reshape(n, hq)


def paged_attention_pallas(
    q: jax.Array,  # [N, Hq, D]
    cache,  # FULL cache [L, 2, NB+1, BS, Hkv*D] or int8 {"q","s"} pytree
    layer_idx,  # traced int32
    block_tables: jax.Array,  # [N, M] int32
    context_lens: jax.Array,  # [N] int32
    scale: float,
    interpret: bool = False,
    mono: bool | None = None,
    vma=None,
) -> jax.Array:
    n, hq, d = q.shape
    m = block_tables.shape[1]
    blocks, scales, bt_k, bt_v, (bs, hkv, _) = _cache_parts(
        cache, layer_idx, block_tables, d
    )
    acc_scratch = [
        pltpu.VMEM((hq, 128), jnp.float32),
        pltpu.VMEM((hq, 128), jnp.float32),
        pltpu.VMEM((hq, d), jnp.float32),
    ]

    if scales is None and (hkv * d) % 128 == 0:
        if _resolve_mono(mono):
            # mono kernel with one row per group (decode = grouped r=1)
            return _mono_call(
                q.reshape(n, 1, hq, d), blocks, bt_k, bt_v, context_lens,
                context_lens, scale, bs, hkv, interpret, vma,
            )
        # double-buffered per-row kernel (see paged_attention_pallas_grouped)
        cum, lp = _db_chunk_meta(context_lens, bs)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=5,
            grid=(n,),
            in_specs=[
                pl.BlockSpec((1, hq, d), lambda ni, *_: (ni, 0, 0)),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec((1, hq, d), lambda ni, *_: (ni, 0, 0)),
            scratch_shapes=[
                pltpu.VMEM((2, _pages_per_chunk(bs) * bs, hkv * d), blocks.dtype),
                pltpu.VMEM((2, _pages_per_chunk(bs) * bs, hkv * d), blocks.dtype),
                *acc_scratch,
                pltpu.SemaphoreType.DMA((2, _pages_per_chunk(bs))),
                pltpu.SemaphoreType.DMA((2, _pages_per_chunk(bs))),
            ],
        )
        return pl.pallas_call(
            functools.partial(
                _kernel_db, scale=scale, block_size=bs, num_kv_heads=hkv
            ),
            grid_spec=grid_spec,
            out_shape=_sds((n, hq, d), q.dtype, vma),
            interpret=interpret,
        )(bt_k, bt_v, context_lens, cum, lp, q, blocks)

    if _q8_fastpath_ok(scales, bs, hkv, d):
        if _resolve_mono(mono):
            return _mono_call_q8(
                q.reshape(n, 1, hq, d), blocks, scales, bt_k, bt_v,
                context_lens, context_lens, scale, bs, hkv, interpret, vma,
            )
        return _db_call_q8_single(
            q, blocks, scales, bt_k, bt_v, context_lens, scale, bs, hkv,
            interpret, vma,
        )

    # fallback: BlockSpec-pipelined grid (N, M) kernel
    def _mi_eff(ni, mi, cl):
        # clamped slot -> unchanged block index -> Pallas skips the copy
        # for past-context steps
        return jnp.minimum(mi, jnp.maximum(cl[ni] - 1, 0) // bs)

    q_spec = pl.BlockSpec((1, hq, d), lambda ni, mi, btk, btv, cl: (ni, 0, 0))
    blk_k = pl.BlockSpec(
        (1, bs, hkv * d),
        lambda ni, mi, btk, btv, cl: (btk[ni, _mi_eff(ni, mi, cl)], 0, 0),
    )
    blk_v = pl.BlockSpec(
        (1, bs, hkv * d),
        lambda ni, mi, btk, btv, cl: (btv[ni, _mi_eff(ni, mi, cl)], 0, 0),
    )
    if scales is None:
        in_specs = [q_spec, blk_k, blk_v]
        inputs = (q, blocks, blocks)
        kernel = functools.partial(
            _kernel, scale=scale, block_size=bs, num_kv_heads=hkv
        )
    else:
        s_k = pl.BlockSpec(
            (1, bs, scales.shape[-1]),
            lambda ni, mi, btk, btv, cl: (btk[ni, _mi_eff(ni, mi, cl)], 0, 0),
        )
        s_v = pl.BlockSpec(
            (1, bs, scales.shape[-1]),
            lambda ni, mi, btk, btv, cl: (btv[ni, _mi_eff(ni, mi, cl)], 0, 0),
        )
        in_specs = [q_spec, blk_k, s_k, blk_v, s_v]
        inputs = (q, blocks, scales, blocks, scales)
        kernel = functools.partial(
            _kernel_q8, scale=scale, block_size=bs, num_kv_heads=hkv
        )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(n, m),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, hq, d), lambda ni, mi, btk, btv, cl: (ni, 0, 0)),
        scratch_shapes=acc_scratch,
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=_sds((n, hq, d), q.dtype, vma),
        interpret=interpret,
    )(bt_k, bt_v, context_lens, *inputs)
