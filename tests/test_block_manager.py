"""BlockManager semantics (reference: block_manager.py behaviors)."""

import pytest

from nano_pearl_tpu.engine.block_manager import BlockManager, chain_hash
from nano_pearl_tpu.engine.sequence import SeqView

BS = 16


def view(tokens):
    return SeqView(list(tokens), BS)


def test_allocate_and_deallocate():
    bm = BlockManager(8, BS)
    v = view(range(40))  # 3 blocks
    assert bm.can_allocate(v)
    bm.allocate(v)
    assert len(v.block_table) == 3
    assert bm.num_free_blocks == 5
    bm.deallocate(v)
    assert bm.num_free_blocks == 8
    assert v.block_table == []


def test_prefix_cache_hit():
    bm = BlockManager(16, BS)
    v1 = view(range(BS * 2))  # two full blocks
    bm.allocate(v1)
    v2 = view(list(range(BS * 2)) + [99])  # same prefix + 1
    bm.allocate(v2)
    assert v2.num_cached_tokens == BS * 2
    assert v2.block_table[:2] == v1.block_table[:2]
    assert bm.blocks[v1.block_table[0]].ref_count == 2


def test_prefix_cache_miss_on_divergence():
    bm = BlockManager(16, BS)
    v1 = view(range(BS * 2))
    bm.allocate(v1)
    diverged = list(range(BS)) + [777] + list(range(BS - 1))
    v2 = view(diverged)
    bm.allocate(v2)
    assert v2.num_cached_tokens == BS  # only the first block hits
    assert v2.block_table[0] == v1.block_table[0]
    assert v2.block_table[1] != v1.block_table[1]


def test_cached_block_revival_after_dealloc():
    """A freed block keeps its hash and can be revived from the free list
    (reference: block_manager.py:74-79)."""
    bm = BlockManager(16, BS)
    v1 = view(range(BS))
    bm.allocate(v1)
    block_id = v1.block_table[0]
    bm.deallocate(v1)
    v2 = view(list(range(BS)) + [99])
    bm.allocate(v2)
    assert v2.block_table[0] == block_id
    assert v2.num_cached_tokens == BS


def test_fully_cached_prompt_keeps_query_row():
    """When every prompt block prefix-hits, at least one block is forced
    back through prefill so a logits row exists to sample from."""
    bm = BlockManager(16, BS)
    v1 = view(range(BS * 2))
    bm.allocate(v1)
    v2 = view(range(BS * 2))
    bm.allocate(v2)
    assert v2.num_cached_tokens == BS  # not 2*BS


def test_rollback_frees_tail_blocks():
    bm = BlockManager(8, BS)
    v = view(range(BS * 2 + 4))  # 3 blocks, last holds 4
    bm.allocate(v)
    free_before = bm.num_free_blocks
    bm.rollback(v, 4 + BS)  # drop into the first block's range
    assert len(v) == BS
    assert len(v.block_table) == 1
    assert bm.num_free_blocks == free_before + 2


def test_rollback_within_block_frees_nothing():
    bm = BlockManager(8, BS)
    v = view(range(BS + 8))
    bm.allocate(v)
    free_before = bm.num_free_blocks
    bm.rollback(v, 4)
    assert len(v.block_table) == 2
    assert bm.num_free_blocks == free_before


def test_ensure_capacity_grows_and_hashes():
    bm = BlockManager(8, BS)
    v = view(range(BS - 1))
    bm.allocate(v)
    assert len(v.block_table) == 1
    v.append(123)
    v.append(124)  # crosses into block 2
    bm.ensure_capacity(v, 1)
    assert len(v.block_table) == 2
    # first block became full and must now be prefix-hashable
    h = chain_hash(v.block_tokens(0))
    assert bm.hash_to_block[h] == v.block_table[0]


def test_chain_hash_depends_on_prefix():
    toks = list(range(BS))
    assert chain_hash(toks, -1) != chain_hash(toks, 12345)
