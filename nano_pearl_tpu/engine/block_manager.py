"""Paged KV block allocator with hash-based prefix caching and PEARL rollback.

Reference: nano_pearl/pearl_engine/block_manager.py. Same capabilities —
chained xxhash64 prefix cache with ref-counting, incremental growth,
rollback that frees whole tail blocks — implemented against ``SeqView``s
(one manager per model group; the draft and target views have
independent block tables over independent device caches).

Capability extension over the reference's ``can_append``/``may_append``
single-token growth: ``ensure_capacity`` grows a view's table by any
number of future tokens in one call, which the PEARL loop uses to
reserve the whole gamma-token draft window before dispatching the
compiled gamma-step scan (no host round-trip per drafted token).
"""

from __future__ import annotations

from collections import deque

import numpy as np
import xxhash

from nano_pearl_tpu.engine.sequence import SeqView


def chain_hash(token_ids: list[int], prefix: int = -1) -> int:
    """Chained block hash (reference: block_manager.py:35-41)."""
    h = xxhash.xxh64()
    if prefix != -1:
        h.update(prefix.to_bytes(8, "little"))
    h.update(np.asarray(token_ids, dtype=np.int64).tobytes())
    return h.intdigest()


class _Block:
    __slots__ = ("block_id", "ref_count", "hash", "token_ids")

    def __init__(self, block_id: int):
        self.block_id = block_id
        self.ref_count = 0
        self.hash = -1
        self.token_ids: list[int] = []


class BlockManager:
    def __init__(self, num_blocks: int, block_size: int):
        assert num_blocks > 0
        self.num_blocks = num_blocks
        self.block_size = block_size
        self.blocks = [_Block(i) for i in range(num_blocks)]
        self.hash_to_block: dict[int, int] = {}
        self.free_ids: deque[int] = deque(range(num_blocks))
        self.used_ids: set[int] = set()

    @property
    def num_free_blocks(self) -> int:
        return len(self.free_ids)

    def _take(self, block_id: int) -> _Block:
        blk = self.blocks[block_id]
        assert blk.ref_count == 0
        blk.ref_count = 1
        blk.hash = -1
        blk.token_ids = []
        self.free_ids.remove(block_id)
        self.used_ids.add(block_id)
        return blk

    def _release(self, block_id: int):
        blk = self.blocks[block_id]
        blk.ref_count -= 1
        if blk.ref_count == 0:
            self.used_ids.remove(block_id)
            self.free_ids.append(block_id)

    def can_allocate(self, view: SeqView) -> bool:
        return self.num_free_blocks >= view.num_blocks

    def allocate(self, view: SeqView):
        """Allocate a fresh view's table, reusing prefix-cached full blocks
        (reference: block_manager.py:56-82)."""
        assert not view.block_table
        h = -1
        miss = False
        for i in range(view.num_blocks):
            toks = view.block_tokens(i)
            full = len(toks) == self.block_size
            h = chain_hash(toks, h) if full else -1
            cached = self.hash_to_block.get(h, -1)
            if cached == -1 or self.blocks[cached].token_ids != toks:
                miss = True
            if miss:
                blk = self._take(self.free_ids[0])
            else:
                view.num_cached_tokens += self.block_size
                blk = self.blocks[cached]
                if cached in self.used_ids:
                    blk.ref_count += 1
                else:
                    blk = self._take(cached)
            if h != -1:
                blk.hash = h
                blk.token_ids = toks
                self.hash_to_block[h] = blk.block_id
            view.block_table.append(blk.block_id)
        if view.num_cached_tokens == len(view):
            # fully-cached prompt: force at least the last block through
            # prefill so there is a query row to sample from (the
            # reference never hits this because its last block is full
            # only when hashes diverge; our guard makes it explicit)
            view.num_cached_tokens -= self.block_size

    def deallocate(self, view: SeqView):
        for block_id in reversed(view.block_table):
            self._release(block_id)
        view.block_table.clear()
        view.num_cached_tokens = 0

    def rollback(self, view: SeqView, n: int):
        """Truncate n tokens, freeing tail blocks that fall empty
        (reference: block_manager.py:93-106). KV data is never moved.
        The table may hold unfilled lookahead blocks beyond the blocks
        the current length occupies (``ensure_capacity`` reservations) —
        every entry past the new length is released, not just the
        previously-occupied range (releasing only [after:before] while
        deleting [after:] leaked each reservation on reject)."""
        view.truncate(n)
        after = view.num_blocks
        for block_id in view.block_table[after:]:
            self._release(block_id)
        del view.block_table[after:]

    def can_ensure(self, view: SeqView, extra_tokens: int) -> bool:
        need = -(-(len(view) + extra_tokens) // self.block_size) - len(view.block_table)
        return self.num_free_blocks >= max(0, need)

    def ensure_capacity(self, view: SeqView, extra_tokens: int):
        """Grow the table to hold ``extra_tokens`` beyond the current
        length, hashing blocks that became full since the last growth
        (generalizes reference may_append, block_manager.py:108-141)."""
        target_blocks = -(-(len(view) + extra_tokens) // self.block_size)
        self._hash_full_blocks(view)
        while len(view.block_table) < target_blocks:
            blk = self._take(self.free_ids[0])
            view.block_table.append(blk.block_id)

    def _hash_full_blocks(self, view: SeqView):
        """Lazily publish hashes for fully-written blocks so later
        requests can prefix-hit them (reference: block_manager.py:125-141)."""
        num_full = len(view) // self.block_size
        for i in range(len(view.block_table)):
            if i >= num_full:
                break
            blk = self.blocks[view.block_table[i]]
            if blk.hash == -1:
                prev = self.blocks[view.block_table[i - 1]].hash if i > 0 else -1
                toks = view.block_tokens(i)
                blk.hash = chain_hash(toks, prev)
                blk.token_ids = toks
                self.hash_to_block[blk.hash] = blk.block_id

    def clear_prefix_cache(self):
        """Reference: scheduler.py:86-99 (clear) wipes hashes."""
        self.hash_to_block.clear()
        for blk in self.blocks:
            blk.hash = -1
            blk.token_ids = []
