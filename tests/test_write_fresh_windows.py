"""Windowed-DUS deferred KV writeback (ops/kv_cache.write_fresh_windows).

The row-scatter writeback costs ~80 ns/row inside real TPU programs
(tools/probe_kv_write3.py), so write_fresh dispatches to per-sequence
read-modify-write WINDOWS realized as dynamic_update_slice. These tests
pin the contract for every slot pattern the verify packers produce:

- real rows land bitwise at their slots,
- every other modified cell is confined to don't-care regions: the
  sequence's own pages beyond its real rows, or the garbage page,
- cells outside the touched pages are bitwise untouched.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from nano_pearl_tpu.ops.kv_cache import (
    write_fresh,
    write_fresh_jnp,
    write_fresh_windows,
)

L, NB, BS, HD = 3, 12, 16, 256
M = (NB + 1) * BS


def _mk(seed, b, r):
    rng = np.random.default_rng(seed)
    cache = jnp.asarray(rng.normal(size=(L, 2, NB + 1, BS, HD)), jnp.float32)
    fresh = jnp.asarray(rng.normal(size=(L, 2, b * r, HD)), jnp.float32)
    return rng, cache, fresh


def _check(cache, out, fresh, slots, r, real_counts, own_pages):
    """real rows exact; other writes confined to own_pages ∪ garbage."""
    out = np.asarray(out)
    base = np.asarray(cache).reshape(L, 2, M, HD)
    outf = out.reshape(L, 2, M, HD)
    fb = np.asarray(fresh).reshape(L, 2, -1, r, HD)
    srows = np.asarray(slots).reshape(-1, r)
    b = srows.shape[0]
    garbage = NB  # garbage page index
    for i in range(b):
        for j in range(real_counts[i]):
            s = srows[i, j]
            np.testing.assert_array_equal(
                outf[:, :, s], fb[:, :, i, j], err_msg=f"seq {i} row {j}"
            )
    # changed cells confined to allowed pages
    changed = np.argwhere((outf != base).any(axis=(0, 1, 3)))[:, 0]
    allowed = set()
    for pages in own_pages:
        allowed.update(pages)
    allowed.add(garbage)
    for s in changed:
        assert s // BS in allowed, f"slot {s} (page {s // BS}) modified"


def test_no_crossing_matches_rowscatter():
    b, r = 4, 5
    rng, cache, fresh = _mk(0, b, r)
    # each seq: one page, run fits
    pages = rng.permutation(NB)[:b]
    offs = rng.integers(0, BS - r, size=b)
    slots = jnp.asarray(
        (pages[:, None] * BS + offs[:, None] + np.arange(r)[None, :]).reshape(-1),
        jnp.int32,
    )
    want = write_fresh_jnp(cache, fresh, slots)
    got = write_fresh_windows(cache, fresh, slots, r)
    # identical everywhere except the garbage page (window B RMW)
    np.testing.assert_array_equal(
        np.asarray(got)[:, :, :NB], np.asarray(want)[:, :, :NB]
    )


def test_page_crossing():
    b, r = 3, 6
    rng, cache, fresh = _mk(1, b, r)
    pages = rng.permutation(NB)[: 2 * b].reshape(b, 2)
    offs = np.array([BS - 2, BS - 5, 3])  # two crossers, one clean
    slots = np.empty((b, r), np.int64)
    for i in range(b):
        pos = offs[i] + np.arange(r)
        blk = np.where(pos < BS, pages[i, 0], pages[i, 1])
        slots[i] = blk * BS + pos % BS
    slots = jnp.asarray(slots.reshape(-1), jnp.int32)
    want = write_fresh_jnp(cache, fresh, slots)
    got = write_fresh_windows(cache, fresh, slots, r)
    np.testing.assert_array_equal(
        np.asarray(got)[:, :, :NB], np.asarray(want)[:, :, :NB]
    )


def test_preverify_same_garbage_slot_padding():
    """Overlap packer: pre-verify rows 1.. all carry THE SAME garbage
    slot; real row 0 must land, everything else stays in the seq's own
    page or the garbage page."""
    b, r = 2, 4
    rng, cache, fresh = _mk(2, b, r)
    g = NB * BS
    s0 = np.array([3 * BS + 7, 9 * BS + (BS - 2)])  # second is near page end
    slots = np.stack(
        [np.concatenate([[s0[i]], np.full(r - 1, g)]) for i in range(b)]
    )
    slots = jnp.asarray(slots.reshape(-1), jnp.int32)
    out = write_fresh_windows(cache, fresh, slots, r)
    _check(cache, out, fresh, slots, r, real_counts=[1, 1],
           own_pages=[[3], [9]])


def test_fused_garbage_consecutive_padding():
    """Fused packer: invalid rows get garbage_page_start + j — a
    consecutive run inside the garbage page."""
    b, r = 2, 4
    rng, cache, fresh = _mk(3, b, r)
    g = NB * BS
    rows0 = [5 * BS + 2, 5 * BS + 3, g + 2, g + 3]  # 2 real, 2 padded
    rows1 = [g + 0, g + 1, g + 2, g + 3]  # fully padded seq
    slots = jnp.asarray(np.array(rows0 + rows1), jnp.int32)
    out = write_fresh_windows(cache, fresh, slots, r)
    _check(cache, out, fresh, slots, r, real_counts=[2, 0],
           own_pages=[[5], []])


def test_dispatch_and_fallback():
    b, r = 2, 3
    rng, cache, fresh = _mk(4, b, r)
    pages = rng.permutation(NB)[:b]
    slots = jnp.asarray(
        (pages[:, None] * BS + 1 + np.arange(r)[None, :]).reshape(-1), jnp.int32
    )
    got = write_fresh(cache, fresh, slots, r)
    want = write_fresh_windows(cache, fresh, slots, r)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    # r > BS: windows can't cover a run — row scatter fallback
    r_big = BS + 8
    fresh_big = jnp.asarray(
        np.random.default_rng(5).normal(size=(L, 2, r_big, HD)), jnp.float32
    )
    slots_big = jnp.asarray(np.arange(r_big) + 2 * BS, jnp.int32)
    got_big = write_fresh(cache, fresh_big, slots_big, r_big)
    want_big = write_fresh_jnp(cache, fresh_big, slots_big)
    np.testing.assert_array_equal(np.asarray(got_big), np.asarray(want_big))


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_random_real_patterns_match(seed):
    """Randomized post-verify rounds (contiguous runs, random pages,
    random offsets incl. crossings) == rowscatter on all real pages."""
    b, r = 5, 7
    rng, cache, fresh = _mk(10 + seed, b, r)
    pages = rng.permutation(NB)[: 2 * b].reshape(b, 2)
    offs = rng.integers(0, BS, size=b)
    slots = np.empty((b, r), np.int64)
    for i in range(b):
        pos = offs[i] + np.arange(r)
        blk = np.where(pos < BS, pages[i, 0], pages[i, 1])
        slots[i] = blk * BS + pos % BS
    slots = jnp.asarray(slots.reshape(-1), jnp.int32)
    want = write_fresh_jnp(cache, fresh, slots)
    got = write_fresh_windows(cache, fresh, slots, r)
    np.testing.assert_array_equal(
        np.asarray(got)[:, :, :NB], np.asarray(want)[:, :, :NB]
    )
