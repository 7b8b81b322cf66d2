"""On-chip micro-probe #2: WINDOWED KV-write variants at the bench verify shape.

probe_kv_write.py established that XLA's row scatter costs ~100 ns per
scattered ROW independent of row width (~3 ms for the 2*L*N = 32K rows
of a bench-shape packed-verify round, vs a 0.04 ms traffic roofline).
The verify rows of one sequence occupy CONSECUTIVE flat slots (post-
verify; pre-verify padding rows can be redirected there safely — future
slots of the same page are masked until overwritten), so the write is
expressible as far fewer scatter INDICES with multi-row WINDOWS:

  rowscatter   baseline: one scatter of 2*L*N rows (current write_fresh_jnp)
  win_lb       lax.scatter, L*2*B indices, window [R, HD]
  win_b        lax.scatter, B indices, window [L, 2, R, HD] (fresh transposed)
  gather_b     lax.gather,  B indices, slice  [L, 2, R, HD] (RMW read half)
  rmw          universal 2-windows-per-seq gather+merge+scatter (handles
               page-boundary crossings with clamped in-page windows)
  dus_seqs     lax.scan over B seqs, dynamic_update_slice [L,2,R,HD] each

Windows of distinct sequences are disjoint (block tables are disjoint),
so unique_indices=True is sound for the per-seq variants.

Run on the real chip: python tools/probe_kv_write2.py
"""

from __future__ import annotations

import os
import time

import jax
import jax.numpy as jnp
import numpy as np

if os.environ.get("PROBE_CPU"):  # correctness-check mode, tiny shapes
    jax.config.update("jax_platforms", "cpu")
    L, NB, BS, HKV, D = 4, 24, 16, 2, 128
    B, R = 8, 6
else:
    L, NB, BS, HKV, D = 36, 520, 256, 2, 128
    B, R = 32, 14  # sequences x packed rows (bench verify shape)
HD = HKV * D
N = B * R
M = (NB + 1) * BS


def timed(fn, args, iters=30):
    jfn = jax.jit(fn, donate_argnums=0)
    out = jfn(*args)
    jax.block_until_ready(out)
    args = (out,) + args[1:]
    t0 = time.perf_counter()
    for _ in range(iters):
        args = (jfn(*args),) + args[1:]
    jax.block_until_ready(args[0])
    return (time.perf_counter() - t0) / iters * 1e3


def make_inputs(crossing: bool):
    """fresh [L,2,N,HD], slots [N] — per-seq consecutive runs; when
    ``crossing`` some seqs straddle a page boundary (two blocks)."""
    rng = np.random.default_rng(0)
    blocks = rng.permutation(NB)[: 2 * B].reshape(B, 2)
    if crossing:
        offs = rng.integers(0, BS, size=B)  # arbitrary in-page start
    else:
        offs = rng.integers(0, BS - R, size=B)  # window fits in page
    slots = np.empty((B, R), np.int64)
    for i in range(B):
        pos = offs[i] + np.arange(R)
        blk = np.where(pos < BS, blocks[i, 0], blocks[i, 1])
        slots[i] = blk * BS + pos % BS
    fresh = rng.normal(size=(L, 2, N, HD)).astype(np.float32)
    return (
        jnp.asarray(fresh, jnp.bfloat16),
        jnp.asarray(slots.reshape(-1), jnp.int32),
    )


# ------------------------------------------------------------------ variants


def rowscatter(cache, fresh, slots):
    rows = cache.reshape(-1, HD)
    li = jnp.arange(L, dtype=jnp.int32)[:, None]
    nb1bs = (NB + 1) * BS
    k_idx = ((li * 2) * nb1bs + slots[None, :]).reshape(-1)
    v_idx = ((li * 2 + 1) * nb1bs + slots[None, :]).reshape(-1)
    idx = jnp.concatenate([k_idx, v_idx])
    vals = jnp.concatenate(
        [fresh[:, 0].reshape(-1, HD), fresh[:, 1].reshape(-1, HD)]
    ).astype(rows.dtype)
    return rows.at[idx].set(vals, mode="drop").reshape(cache.shape)


def win_lb(cache, fresh, slots):
    # [L2, M, HD] operand; L2*B indices of (l2, slot0); window [R, HD]
    op = cache.reshape(L * 2, M, HD)
    s0 = slots.reshape(B, R)[:, 0]
    l2 = jnp.arange(L * 2, dtype=jnp.int32)
    idx = jnp.stack(
        jnp.broadcast_arrays(l2[:, None], s0[None, :]), axis=-1
    ).reshape(-1, 2)
    upd = fresh.reshape(L * 2, B, R, HD).reshape(-1, R, HD)
    dn = jax.lax.ScatterDimensionNumbers(
        update_window_dims=(1, 2),
        inserted_window_dims=(0,),
        scatter_dims_to_operand_dims=(0, 1),
    )
    out = jax.lax.scatter(
        op, idx, upd, dn, unique_indices=True, mode="clip"
    )
    return out.reshape(cache.shape)


def win_b(cache, fresh, slots):
    # [L, 2, M, HD] operand; B indices of (slot0,); window [L, 2, R, HD]
    op = cache.reshape(L, 2, M, HD)
    s0 = slots.reshape(B, R)[:, :1]  # [B, 1]
    upd = fresh.reshape(L, 2, B, R, HD).transpose(2, 0, 1, 3, 4)
    dn = jax.lax.ScatterDimensionNumbers(
        update_window_dims=(1, 2, 3, 4),
        inserted_window_dims=(),
        scatter_dims_to_operand_dims=(2,),
    )
    return jax.lax.scatter(
        op, s0, upd, dn, unique_indices=True, mode="clip"
    ).reshape(cache.shape)


def gather_b(cache, fresh, slots):
    s0 = slots.reshape(B, R)[:, :1]
    dn = jax.lax.GatherDimensionNumbers(
        offset_dims=(1, 2, 3, 4), collapsed_slice_dims=(), start_index_map=(2,)
    )
    g = jax.lax.gather(
        cache.reshape(L, 2, M, HD), s0, dn, slice_sizes=(L, 2, R, HD),
        mode="clip",
    )
    # fold the gather into the cache so donation keeps the loop honest
    return cache.at[:, :, 0, :].add(g.mean() * 0)


def _rmw(cache, fresh, slots):
    """Universal RMW: two clamped in-page windows per sequence."""
    srows = slots.reshape(B, R)
    s0 = srows[:, 0]
    page0 = s0 // BS
    page_end = (page0 + 1) * BS
    wA = jnp.minimum(s0, page_end - R)  # clamped window A start
    d = s0 - wA  # rows of old data at window A head
    r1 = jnp.minimum(page_end - s0, R)  # fresh rows living in page A
    crosses = r1 < R
    # window B: first slot of the second page (row r1's slot), or the
    # garbage block when no crossing (self-overwrite there is harmless)
    t0 = jnp.where(
        crosses,
        jnp.take_along_axis(srows, jnp.minimum(r1, R - 1)[:, None], axis=1)[:, 0],
        NB * BS,
    )

    op = cache.reshape(L, 2, M, HD)
    gdn = jax.lax.GatherDimensionNumbers(
        offset_dims=(1, 2, 3, 4), collapsed_slice_dims=(), start_index_map=(2,)
    )
    starts = jnp.concatenate([wA, t0])[:, None]  # [2B, 1]
    old = jax.lax.gather(
        op, starts, gdn, slice_sizes=(L, 2, R, HD), mode="clip"
    )  # [2B, L, 2, R, HD]
    oldA, oldB = old[:B], old[B:]

    fb = fresh.reshape(L, 2, B, R, HD).transpose(2, 0, 1, 3, 4)  # [B,L,2,R,HD]
    r = jnp.arange(R, dtype=jnp.int32)
    # window A row r holds fresh[r - d] when r >= d (fresh rows 0..R-1-d)
    iA = jnp.clip(r[None, :] - d[:, None], 0, R - 1)[:, None, None, :, None]
    shiftA = jnp.take_along_axis(fb, iA, axis=3)
    updA = jnp.where(
        (r[None, :] >= d[:, None])[:, None, None, :, None], shiftA, oldA
    )
    # window B row r holds fresh[r + r1] when r + r1 < R
    iB = jnp.clip(r[None, :] + r1[:, None], 0, R - 1)[:, None, None, :, None]
    shiftB = jnp.take_along_axis(fb, iB, axis=3)
    validB = ((r[None, :] + r1[:, None]) < R) & crosses[:, None]
    updB = jnp.where(validB[:, None, None, :, None], shiftB, oldB)

    sdn = jax.lax.ScatterDimensionNumbers(
        update_window_dims=(1, 2, 3, 4),
        inserted_window_dims=(),
        scatter_dims_to_operand_dims=(2,),
    )
    upd = jnp.concatenate([updA, updB])
    # NOT unique: a non-crossing seq's window B aliases the garbage page
    return jax.lax.scatter(op, starts, upd, sdn, mode="clip").reshape(
        cache.shape
    )


def dus_seqs(cache, fresh, slots):
    s0 = slots.reshape(B, R)[:, 0]
    fb = fresh.reshape(L, 2, B, R, HD)

    def seq(c, i):
        c = jax.lax.dynamic_update_slice(
            c, fb[:, :, i], (0, 0, s0[i], 0)
        )
        return c, 0

    op = cache.reshape(L, 2, M, HD)
    op, _ = jax.lax.scan(seq, op, jnp.arange(B))
    return op.reshape(cache.shape)


def main():
    if not os.environ.get("PROBE_CPU"):
        import sys

        sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
        from nano_pearl_tpu.utils.compile_cache import enable_compile_cache

        enable_compile_cache()
    print(
        f"backend={jax.default_backend()} L={L} NB={NB} BS={BS} HD={HD} "
        f"B={B} R={R} rows={2 * L * N}",
        flush=True,
    )
    cache_shape = (L, 2, NB + 1, BS, HD)
    fresh, slots = make_inputs(crossing=False)

    if os.environ.get("PROBE_CPU"):
        # correctness: aligned case, every variant == rowscatter (the
        # TPU run skips this — each check is a full-shape recompile)
        small = jnp.zeros(cache_shape, jnp.bfloat16)
        ref = jax.jit(rowscatter)(small, fresh, slots)
        for name, fn in [("win_lb", win_lb), ("win_b", win_b), ("rmw", _rmw),
                         ("dus_seqs", dus_seqs)]:
            got = jax.jit(fn)(jnp.zeros(cache_shape, jnp.bfloat16), fresh, slots)
            ok = bool(
                jnp.all(got[:, :, :NB] == ref[:, :, :NB])
            )  # garbage block may differ
            print(f"  correctness[{name}, aligned]: {'OK' if ok else 'MISMATCH'}",
                  flush=True)
        # crossing case: rmw must still match
        fresh_x, slots_x = make_inputs(crossing=True)
        ref_x = jax.jit(rowscatter)(jnp.zeros(cache_shape, jnp.bfloat16), fresh_x, slots_x)
        got_x = jax.jit(_rmw)(jnp.zeros(cache_shape, jnp.bfloat16), fresh_x, slots_x)
        ok = bool(jnp.all(got_x[:, :, :NB] == ref_x[:, :, :NB]))
        print(f"  correctness[rmw, crossing]: {'OK' if ok else 'MISMATCH'}",
              flush=True)

    for name, fn in [
        ("rowscatter", rowscatter),
        ("win_lb", win_lb),
        ("win_b", win_b),
        ("gather_b", gather_b),
        ("rmw", _rmw),
        ("dus_seqs", dus_seqs),
    ]:
        cache = jnp.zeros(cache_shape, jnp.bfloat16)
        ms = timed(fn, (cache, fresh, slots))
        print(f"  {name:10s} {ms:8.3f} ms", flush=True)


if __name__ == "__main__":
    main()
