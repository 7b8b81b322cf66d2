"""Paged KV cache storage.

TPU-native replacement for the reference's Triton scatter kernel
(reference: nano_pearl/layers/attention.py:10-44, ``store_kvcache_kernel``).

Layout: one array per model, ``[L, 2, num_blocks + 1, block_size,
n_kv_heads * head_dim]``, sharded over the folded head axis. The head and
head-dim axes are FOLDED into one trailing axis deliberately: TPU tiles
an array's last two dims as (8, 128), so a ``[..., BS, Hkv, D]`` layout
with few KV heads pads the sublane dim 2 -> 8 — 4x physical HBM and 4x
slow, strided DMA/scatter traffic on every cache access (measured on
v5e: the packed-verify attention at 40 ms/forward against a ~1 ms
roofline). The folded ``[..., BS, Hkv*D]`` trailing dims tile exactly.
Per-head K/V are column slices ``[:, kh*D:(kh+1)*D]``.

The final "+1" block is a garbage block: padded batch rows (static-shape
bucketing, the TPU analogue of the reference's CUDA-graph padding with
slot==-1) write there instead of being skipped, so the scatter needs no
branch.

The scatter itself is a flat row-wise ``.at[slots].set`` which XLA
lowers to an in-place dynamic-update scatter; the Pallas attention
kernels DMA block slices directly from this layout
(nano_pearl_tpu/ops/pallas/paged_attention.py).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

LANE = 128  # TPU lane width; DMA slabs need lane-aligned minor dims


def kv_scale_stride(n_kv_heads: int, tp: int = 1) -> int:
    """Lane columns reserved per head in the quantized cache's scale
    array: head ``h``'s scale for a slot lives at column ``h * stride``
    of an ``[..., BS, Hkv*stride]`` bf16 array. The stride is the
    smallest value making every TP shard's column count (Hkv/tp * stride)
    a multiple of the 128-lane tile, so

    - per-page scale slabs are legal Mosaic DMA sources/destinations in
      the Pallas db/mono kernels (minor dim % 128 == 0), and
    - the array physically occupies exactly its logical size (an
      unpadded [..., BS, Hkv] array is tile-PADDED to 128 lanes in HBM
      anyway — the stride layout stores the same bytes but addressable),
    - TP sharding over the last axis assigns each shard exactly its own
      heads' columns (uniform stride).
    """
    h_local = max(1, n_kv_heads // max(1, tp))
    return LANE // math.gcd(h_local, LANE)


def make_kv_cache(
    num_layers: int,
    num_blocks: int,
    block_size: int,
    n_kv_heads: int,
    head_dim: int,
    dtype=jnp.bfloat16,
    sharding=None,
    quant: str | None = None,
    tp: int = 1,
):
    """Allocate the paged cache (+1 garbage block at index ``num_blocks``).

    Reference: pearl_model_runner.py:119-143 (allocate_kv_cache).

    ``quant="int8"`` / ``"fp8"`` store K/V as 1-byte values with one
    scale per (slot, head) — half the HBM traffic for the
    decode-attention reads (north-star KV-cache quantization). The cache
    is then the pytree
    {"q": int8|e4m3 [L,2,NB+1,BS,Hkv*D],
     "s": bf16 [L,2,NB+1,BS,Hkv*stride]} with head ``h``'s scale at
    column ``h*stride`` (see kv_scale_stride): lane-aligned slabs the
    Pallas kernels DMA per page alongside the 1-byte values. Scales are
    bf16 and quantization USES the bf16-rounded scale, so dequant is
    exact w.r.t. the stored scale.
    """
    from nano_pearl_tpu.ops.quant import quant_storage_dtype

    shape = (num_layers, 2, num_blocks + 1, block_size, n_kv_heads * head_dim)
    if quant in ("int8", "fp8"):
        qdt = quant_storage_dtype(quant)
        stride = kv_scale_stride(n_kv_heads, tp)
        s_shape = shape[:-1] + (n_kv_heads * stride,)
        q_sh = s_sh = None
        if sharding is not None:
            q_sh, s_sh = sharding["q"], sharding["s"]
        q = jnp.zeros(shape, dtype=qdt, device=q_sh) if q_sh else jnp.zeros(shape, qdt)
        s = (
            jnp.zeros(s_shape, dtype=jnp.bfloat16, device=s_sh)
            if s_sh
            else jnp.zeros(s_shape, jnp.bfloat16)
        )
        return {"q": q, "s": s}
    if sharding is not None:
        return jnp.zeros(shape, dtype=dtype, device=sharding)
    return jnp.zeros(shape, dtype=dtype)


def cache_is_quantized(layer_cache) -> bool:
    return isinstance(layer_cache, dict)


def cache_kv_dims(layer_cache, head_dim: int) -> tuple[int, int, int]:
    """(block_size, n_kv_heads, head_dim) of a cache node; the folded
    trailing axis needs ``head_dim`` supplied to recover the split."""
    arr = layer_cache["q"] if cache_is_quantized(layer_cache) else layer_cache
    return arr.shape[-2], arr.shape[-1] // head_dim, head_dim


def dequant_rows(q_rows: jax.Array, s_rows: jax.Array, head_dim: int) -> jax.Array:
    """1-byte gathered rows [..., Hkv*D] * strided scales
    [..., Hkv*stride] -> f32 [..., Hkv, D] (unfolded for the jnp
    attention paths). Head ``h``'s scale sits at column ``h*stride``
    (see kv_scale_stride)."""
    hkv = q_rows.shape[-1] // head_dim
    stride = s_rows.shape[-1] // hkv
    s = s_rows.reshape(s_rows.shape[:-1] + (hkv, stride))[..., 0]
    unfolded = q_rows.reshape(q_rows.shape[:-1] + (hkv, head_dim))
    return unfolded.astype(jnp.float32) * s.astype(jnp.float32)[..., None]


def write_fresh_jnp(cache, fresh: jax.Array, slots: jax.Array) -> jax.Array:
    """Deferred all-layer KV writeback: one scatter of ``fresh``
    [L, 2, N, Hkv*D] (collected during the layer scan) at flat ``slots``
    [N]. Semantically identical to L x 2 per-layer write_kv scatters;
    non-quantized caches only (the deferred verify path is gated to
    bf16/f32). The Pallas strided-DMA twin
    (ops/pallas/kv_writeback.write_fresh_pallas) replaces the scatter on
    TPU — XLA's dynamic-update scatter costs ~80 ns/row on v5e, ~2.9 ms
    per packed-verify forward at bench shapes (tools/probe_kv_write.py)."""
    l, _, nb1, bs, hd = cache.shape
    rows = cache.reshape(-1, hd)
    li = jnp.arange(l, dtype=jnp.int32)[:, None]
    k_idx = ((li * 2) * nb1 * bs + slots[None, :]).reshape(-1)
    v_idx = ((li * 2 + 1) * nb1 * bs + slots[None, :]).reshape(-1)
    idx = jnp.concatenate([k_idx, v_idx])
    vals = jnp.concatenate(
        [fresh[:, 0].reshape(-1, hd), fresh[:, 1].reshape(-1, hd)]
    ).astype(rows.dtype)
    return rows.at[idx].set(vals, mode="drop").reshape(cache.shape)


def write_fresh_windows(cache, fresh: jax.Array, slots: jax.Array, rows_per_group: int) -> jax.Array:
    """Deferred all-layer KV writeback as per-sequence WINDOW updates.

    Why not the row scatter (write_fresh_jnp): XLA lowers a TPU scatter
    to a ~80 ns/ROW path inside real programs regardless of batching or
    producer fencing — ~2.9 ms for a bench-shape verify round — while
    the same bytes as dynamic_update_slice windows move at bulk-DMA
    speed (~0.4 ms; bisected by tools/probe_kv_write3.py, v5e
    2026-08-20).

    Contract (both verify packers satisfy it): each sequence's ``R``
    rows are consecutive flat slots from ``slots[i*R]``, except rows
    that (a) cross into a second page — consecutive again from
    ``slots[i*R + rA]`` — or (b) are padding routed at or into the
    garbage page. The writeback covers each sequence with two R-row
    read-modify-write windows (window A clamped inside the first page,
    window B at the second page / the garbage page), gathering the old
    window, splicing the fresh rows at the right offset, and writing
    back with one dynamic_update_slice per window. Rows are thereby
    written EXACTLY at their slots when the pattern holds; padding rows
    may land in the sequence's own not-yet-visible future slots of the
    same page or the garbage page — both invisible (attention masks by
    context length; pages are owned block-granular; garbage content is
    never read unmasked).
    """
    l, _, nb1, bs, hd = cache.shape
    n = slots.shape[0]
    r = rows_per_group
    b = n // r
    m = nb1 * bs
    op = cache.reshape(l, 2, m, hd)
    fb = fresh.reshape(l, 2, b, r, hd).astype(cache.dtype)
    srows = slots.reshape(b, r)
    s0 = srows[:, 0]
    page_end_a = (s0 // bs + 1) * bs
    r_a = jnp.clip(page_end_a - s0, 0, r)  # fresh rows living in page A
    # window A: R rows clamped inside page A; d = old head rows
    w_a = jnp.maximum(jnp.minimum(s0, page_end_a - r), 0)
    d_a = s0 - w_a
    # window B: the flat slot of fresh row r_a (start of the second run),
    # or the garbage page when the whole round fits page A
    sb_idx = jnp.minimum(r_a, r - 1)
    s_b = jnp.where(
        r_a < r,
        jnp.take_along_axis(srows, sb_idx[:, None], axis=1)[:, 0],
        (nb1 - 1) * bs,
    )
    page_end_b = (s_b // bs + 1) * bs
    w_b = jnp.maximum(jnp.minimum(s_b, page_end_b - r), 0)
    d_b = s_b - w_b
    r_b = r - r_a

    # [W = 2B] windows (A windows then B windows): start, old-head rows,
    # fresh row offset, fresh count
    w = jnp.concatenate([w_a, w_b])
    dd = jnp.concatenate([d_a, d_b])
    f0 = jnp.concatenate([jnp.zeros_like(r_a), r_a])
    rr = jnp.concatenate([r_a, r_b])

    # Every op below is dynamic_slice / dynamic_update_slice / select —
    # NOT lax.gather / take_along_axis / scatter: on TPU those lower to
    # per-row (or worse) paths inside real programs (the first version
    # of this function used gather + take_along_axis and measured 24 ms
    # — 3x WORSE than the row scatter it replaced; probe_verify_
    # breakdown.py 2026-08-20). The dynamic fresh-row shift (window row
    # j holds fresh[f0 + j - dd]) is realized as a dynamic_slice at
    # offset r + f0 - dd into a fresh buffer zero-padded by r rows on
    # both sides of the row axis.
    fpad = jnp.pad(fb, ((0, 0), (0, 0), (0, 0), (r, r), (0, 0)))  # [L,2,B,3R,HD]
    j = jnp.arange(r, dtype=jnp.int32)

    def win(c, i):
        seq = jax.lax.rem(i, b)  # windows ordered [A_0..A_{b-1}, B_0..B_{b-1}]
        old = jax.lax.dynamic_slice(c, (0, 0, w[i], 0), (l, 2, r, hd))
        fw = jax.lax.dynamic_slice(
            fpad, (0, 0, seq, r + f0[i] - dd[i], 0), (l, 2, 1, r, hd)
        )[:, :, 0]
        m = (j >= dd[i]) & (j < dd[i] + rr[i])
        upd = jnp.where(m[None, None, :, None], fw, old)
        # windows of distinct sequences only ever alias in the garbage
        # page, whose content is don't-care — later windows win
        # deterministically under this sequential scan
        return jax.lax.dynamic_update_slice(c, upd, (0, 0, w[i], 0)), 0

    op, _ = jax.lax.scan(win, op, jnp.arange(2 * b))
    return op.reshape(cache.shape)


def write_fresh(cache, fresh, slots, rows_per_group: int, use_pallas=None):
    """Dispatch the deferred writeback.

    The windowed-DUS path (write_fresh_windows) whenever the window
    math applies (rows_per_group <= block_size); the plain row scatter
    otherwise. A Pallas strided-DMA twin exists
    (ops/pallas/kv_writeback.write_fresh_pallas, numerically validated
    in interpret mode) but its arbitrary-row-offset DMAs need dynamic
    sublane indexing this toolchain's Mosaic rejects (bisected on v5e
    2026-08-19), and the slab-RMW redesign measures ~10-15 us per
    window DMA (tools/probe_slab_dma.py) — no better than the DUS
    windows XLA already emits."""
    del use_pallas
    if rows_per_group <= cache.shape[3]:
        return write_fresh_windows(cache, fresh, slots, rows_per_group)
    return write_fresh_jnp(cache, fresh, slots)


def global_block_offsets(cache, layer_idx):
    """(k_off, v_off): block-index offsets of layer ``layer_idx`` inside
    the cache flattened to [(L*2*(NB+1)), BS, Hkv*D].

    Layer-folded addressing lets every KV write be a scatter INTO the
    full carried cache buffer and every read a gather FROM it — no
    dynamic-slice + write-back of a layer, which XLA can turn into a
    full-cache copy per layer inside scan/while loops."""
    arr = cache["q"] if cache_is_quantized(cache) else cache
    nb1 = arr.shape[2]
    k_off = (layer_idx * 2) * nb1
    return k_off, k_off + nb1


def _flat_rows(cache_arr):
    l, two, nb1, bs = cache_arr.shape[:4]
    return cache_arr.reshape((l * two * nb1,) + cache_arr.shape[3:])


def write_kv(
    cache,  # FULL cache [L, 2, NB+1, BS, Hkv*D] array or {"q","s"} pytree
    k: jax.Array,  # [N, Hkv, D]
    v: jax.Array,  # [N, Hkv, D]
    slots: jax.Array,  # [N] int32 flat slot = block_id * BS + offset
    layer_idx,  # traced int32 scalar
):
    """Scatter new K/V rows into the paged cache by flat slot index.

    Equivalent of the reference Triton ``store_kvcache`` (attention.py:36-44);
    padded rows carry slots pointing into the garbage block rather than -1.
    For a quantized cache, rows are quantized with a per-(token, head)
    scale at write time (int8: round-to-int grid; fp8 e4m3: convert).
    """
    n = k.shape[0]
    k_off, v_off = global_block_offsets(cache, layer_idx)
    if cache_is_quantized(cache):
        from nano_pearl_tpu.ops.quant import FP8_MAX

        qc, sc = cache["q"], cache["s"]
        bs = qc.shape[3]
        hkv = k.shape[1]
        stride = sc.shape[-1] // hkv
        kf = k.astype(jnp.float32)
        vf = v.astype(jnp.float32)
        k_amax = jnp.max(jnp.abs(kf), axis=-1)  # [N, Hkv]
        v_amax = jnp.max(jnp.abs(vf), axis=-1)
        # scales round to bf16 BEFORE quantizing, so the stored 1-byte
        # grid and the stored scale are mutually exact
        qmax = 127.0 if qc.dtype == jnp.int8 else FP8_MAX
        k_s = (jnp.maximum(k_amax, 1e-8) / qmax).astype(jnp.bfloat16)
        v_s = (jnp.maximum(v_amax, 1e-8) / qmax).astype(jnp.bfloat16)
        k_sf = k_s.astype(jnp.float32)[..., None]
        v_sf = v_s.astype(jnp.float32)[..., None]
        if qc.dtype == jnp.int8:
            k_q = jnp.clip(jnp.round(kf / k_sf), -127, 127).astype(jnp.int8)
            v_q = jnp.clip(jnp.round(vf / v_sf), -127, 127).astype(jnp.int8)
        else:  # float8_e4m3fn
            k_q = jnp.clip(kf / k_sf, -FP8_MAX, FP8_MAX).astype(qc.dtype)
            v_q = jnp.clip(vf / v_sf, -FP8_MAX, FP8_MAX).astype(qc.dtype)

        def strided(s):  # [N, Hkv] -> [N, Hkv*stride], scale at col h*stride
            return jnp.pad(s[..., None], ((0, 0), (0, 0), (0, stride - 1))).reshape(
                n, hkv * stride
            )

        qrows = _flat_rows(qc).reshape(-1, qc.shape[-1])  # [(L*2*NB1*BS), Hkv*D]
        srows = _flat_rows(sc).reshape(-1, sc.shape[-1])
        qrows = qrows.at[k_off * bs + slots].set(k_q.reshape(n, -1), mode="drop")
        qrows = qrows.at[v_off * bs + slots].set(v_q.reshape(n, -1), mode="drop")
        srows = srows.at[k_off * bs + slots].set(strided(k_s), mode="drop")
        srows = srows.at[v_off * bs + slots].set(strided(v_s), mode="drop")
        return {"q": qrows.reshape(qc.shape), "s": srows.reshape(sc.shape)}
    bs = cache.shape[3]
    rows = cache.reshape(-1, cache.shape[-1])  # [(L*2*NB1*BS), Hkv*D]
    rows = rows.at[k_off * bs + slots].set(
        k.reshape(n, -1).astype(rows.dtype), mode="drop"
    )
    rows = rows.at[v_off * bs + slots].set(
        v.reshape(n, -1).astype(rows.dtype), mode="drop"
    )
    return rows.reshape(cache.shape)


def garbage_slots(num_blocks: int, block_size: int, n: int) -> jnp.ndarray:
    """Distinct slots inside the garbage block for n padded rows."""
    base = num_blocks * block_size
    return base + (jnp.arange(n, dtype=jnp.int32) % block_size)
