"""Native C++ block-manager core vs the Python implementation:
identical hashes, identical allocation/caching/rollback behavior under
randomized operation sequences."""

import numpy as np
import pytest

from nano_pearl_tpu.engine.block_manager import BlockManager, chain_hash
from nano_pearl_tpu.engine.sequence import SeqView

native = pytest.importorskip("nano_pearl_tpu.engine.native")

if native.load_native_lib() is None:
    pytest.skip("g++/native lib unavailable", allow_module_level=True)

BS = 16


def test_xxh64_chain_hash_parity():
    rng = np.random.default_rng(0)
    for n in (1, 3, 8, 16, 64):
        toks = rng.integers(0, 2**31, n).tolist()
        assert native.native_chain_hash(toks) == chain_hash(toks)
        assert native.native_chain_hash(toks, 12345) == chain_hash(toks, 12345)


def _pair(num_blocks=32):
    return (
        BlockManager(num_blocks, BS),
        native.NativeBlockManager(num_blocks, BS),
    )


def test_allocate_parity_with_prefix_cache():
    py, nat = _pair()
    streams = [
        list(range(40)),
        list(range(40)),  # full prefix hit
        list(range(16)) + [99] * 20,  # diverges after one block
        list(range(32)),  # fully-cached guard
    ]
    for toks in streams:
        vp, vn = SeqView(toks, BS), SeqView(toks, BS)
        py.allocate(vp)
        nat.allocate(vn)
        assert vp.num_cached_tokens == vn.num_cached_tokens, toks
        assert len(vp.block_table) == len(vn.block_table)
        assert py.num_free_blocks == nat.num_free_blocks


def test_randomized_op_sequence_parity():
    rng = np.random.default_rng(1)
    py, nat = _pair(48)
    live: list[tuple[SeqView, SeqView]] = []
    for step in range(200):
        op = rng.choice(["alloc", "ensure", "rollback", "dealloc"])
        if op == "alloc" or not live:
            n = int(rng.integers(1, 60))
            toks = rng.integers(0, 50, n).tolist()
            vp, vn = SeqView(toks, BS), SeqView(toks, BS)
            if py.can_allocate(vp) and nat.can_allocate(vn):
                py.allocate(vp)
                nat.allocate(vn)
                assert vp.num_cached_tokens == vn.num_cached_tokens
                live.append((vp, vn))
        elif op == "ensure":
            vp, vn = live[rng.integers(len(live))]
            extra = int(rng.integers(1, 24))
            grow = rng.integers(0, 50, extra).tolist()
            vp.token_ids.extend(grow)
            vn.token_ids.extend(grow)
            if py.can_ensure(vp, 1) and nat.can_ensure(vn, 1):
                py.ensure_capacity(vp, 1)
                nat.ensure_capacity(vn, 1)
                assert len(vp.block_table) == len(vn.block_table)
        elif op == "rollback":
            vp, vn = live[rng.integers(len(live))]
            if len(vp) > 2:
                n = int(rng.integers(1, len(vp) - 1))
                py.rollback(vp, n)
                nat.rollback(vn, n)
                assert vp.token_ids == vn.token_ids
                assert len(vp.block_table) == len(vn.block_table)
        else:
            i = rng.integers(len(live))
            vp, vn = live.pop(i)
            py.deallocate(vp)
            nat.deallocate(vn)
        assert py.num_free_blocks == nat.num_free_blocks, f"step {step} {op}"


def test_engine_with_native_block_manager():
    from nano_pearl_tpu import PearlEngine
    from nano_pearl_tpu.config import SamplingParams

    from helpers import tiny_pearl_config

    cfg = tiny_pearl_config(native_block_manager=True)
    eng = PearlEngine(cfg)
    eng.add_request([1, 2, 3, 4, 5], SamplingParams(temperature=0.0, max_tokens=16))
    p, n, _, _ = eng.generate_token_ids()
    eng.add_request([1, 2, 3, 4, 5], SamplingParams(temperature=0.0, max_tokens=16))
    a, _, _, _ = eng.AR_generate_token_ids()
    assert p == a
