"""Pallas KV writeback kernels for the deferred-write verify path.

The packed-verify forward collects each layer's fresh K/V into a dense
buffer ``fresh [L, 2, N, Hkv*D]`` (a contiguous dynamic_update_slice per
layer — free) instead of scattering rows into the paged cache per layer.
These kernels then write the WHOLE round back in one pass.

Why not XLA scatter: TPU lowers a row scatter to ~80 ns/row regardless
of batching (measured: tools/probe_kv_write.py), i.e. ~2.6 ms for the
32K (layer, k/v, row) cells of a bench-shape verify round.

``write_fresh_pallas`` below is PARKED, twice over:

- Its HBM->HBM strided DMAs are addressed at ROW granularity — a
  dynamic ds on the sublane-tiled dim, which this toolchain's Mosaic
  rejects (remote-compile HTTP 500; each needed construct was bisected
  to the crash on v5e 2026-08-19, see ops/kv_cache.write_fresh).
- The tile-aligned redesign (slab read-modify-write: view the cache as
  ``[L*2, M/8, 8, HD]`` — a bitcast, since XLA tiles the last two dims
  (8, 128) — and DMA whole ``[L*2, T, 8, HD]`` slabs at a dynamic TILE
  index, merging fresh rows in VMEM with static-variant shifts + iota
  masks) COMPILES and is value-correct on chip, but the probed DMA
  forms are ~3 orders of magnitude off bandwidth: ~8.6 ms per strided
  window DMA (dyn ds on an untiled middle dim, full leading slice) and
  ~6.9 ms per CONTIGUOUS 884 KB window DMA at a dynamic leading index
  inside a fori_loop (tools/probe_slab_dma.py, v5e 2026-08-20). The
  same contiguous-DMA form is fast in the mono attention kernels'
  grid-free streams, so the cost is specific to this loop/alias shape;
  not worth chasing while the XLA scatter baseline measures at roofline
  in isolation (tools/probe_kv_write2.py: 0.021 ms for a full
  bench-round writeback with a donated cache).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(
    slots_ref, slot0_ref, contig_ref,  # scalar prefetch (SMEM)
    fresh_ref,  # [L, 2, B, R, HD] (leading-dim indexing only: a sublane-
    # dim dynamic slice at a non-8-aligned offset is illegal once the
    # compiler places the buffer in VMEM)
    cache_in_ref,  # [L, 2, NB1*BS, HD] HBM (aliased with the output)
    o_ref,  # same buffer as cache_in_ref
    run_sems,  # DMA sems (2,)
    row_sems,  # DMA sems (2, R)
    *, rows: int,
):
    del cache_in_ref
    bi = pl.program_id(0)
    s0 = slot0_ref[bi]

    @pl.when(contig_ref[bi] != 0)
    def _contiguous():
        # one strided DMA per K/V plane: [L, R, HD] source rows ->
        # [L, R, HD] consecutive cache slots, all layers at once
        dmas = [
            pltpu.make_async_copy(
                fresh_ref.at[:, kv, bi],
                o_ref.at[:, kv, pl.ds(s0, rows), :],
                run_sems.at[kv],
            )
            for kv in (0, 1)
        ]
        for d in dmas:
            d.start()
        for d in dmas:
            d.wait()

    @pl.when(contig_ref[bi] == 0)
    def _per_row():
        dmas = [
            pltpu.make_async_copy(
                fresh_ref.at[:, kv, bi, pl.ds(j, 1), :],
                o_ref.at[:, kv, pl.ds(slots_ref[bi * rows + j], 1), :],
                row_sems.at[kv, j],
            )
            for kv in (0, 1)
            for j in range(rows)
        ]
        for d in dmas:
            d.start()
        for d in dmas:
            d.wait()


def write_fresh_pallas(
    cache: jax.Array,  # [L, 2, NB+1, BS, Hkv*D] bf16/f32
    fresh: jax.Array,  # [L, 2, N, Hkv*D]
    slots: jax.Array,  # [N] int32 flat slot per row
    rows_per_group: int,
    interpret: bool = False,
) -> jax.Array:
    l, two, nb1, bs, hd = cache.shape
    n = slots.shape[0]
    r = rows_per_group
    b = n // r
    flat = cache.reshape(l, 2, nb1 * bs, hd)  # leading-dim merge: free
    fresh = fresh.reshape(l, 2, b, r, hd)  # leading split: free
    srows = slots.reshape(b, r)
    slot0 = srows[:, 0]
    contig = jnp.all(srows[:, 1:] == srows[:, :-1] + 1, axis=1).astype(jnp.int32)
    # clamp runs that would overrun the buffer (garbage-slot padding
    # rows already stay in the garbage block by construction)
    slot0 = jnp.minimum(slot0, nb1 * bs - r)

    out = pl.pallas_call(
        functools.partial(_kernel, rows=r),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(b,),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            scratch_shapes=[
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2, r)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct(flat.shape, flat.dtype),
        input_output_aliases={4: 0},  # cache operand (after 3 prefetch + fresh)
        interpret=interpret,
    )(slots, slot0, contig, fresh.astype(flat.dtype), flat)
    return out.reshape(cache.shape)
