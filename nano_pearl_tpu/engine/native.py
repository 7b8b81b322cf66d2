"""ctypes bindings for the native host-runtime core (native/block_manager.cc).

Exposes ``NativeBlockManager`` with the same interface as the Python
``BlockManager`` (engine/block_manager.py) over the C ABI. The library
is built on demand with g++ (no pybind11 dependency). Opt in with
``PearlConfig(native_block_manager=True)``; behavioral parity with the
Python implementation is enforced by tests/test_native.py, including
identical xxh64 chain digests so both can share prefix-cache semantics.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

from nano_pearl_tpu.engine.sequence import SeqView
from nano_pearl_tpu.utils.logging import logger

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(__file__))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libpearl_host.so")
_lib = None


def load_native_lib():
    """Load (building if needed) the native library; None on failure."""
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        src = os.path.join(_NATIVE_DIR, "block_manager.cc")
        if not os.path.exists(src):
            return None
        try:
            subprocess.run(
                ["g++", "-O2", "-shared", "-fPIC", "-std=c++17", "-o", _LIB_PATH, src],
                check=True,
                capture_output=True,
            )
        except Exception as e:
            logger.warning(f"native build failed ({e}); using Python block manager")
            return None
    lib = ctypes.CDLL(_LIB_PATH)
    lib.bm_create.restype = ctypes.c_void_p
    lib.bm_create.argtypes = [ctypes.c_int, ctypes.c_int]
    lib.bm_destroy.argtypes = [ctypes.c_void_p]
    lib.bm_num_free.restype = ctypes.c_int
    lib.bm_num_free.argtypes = [ctypes.c_void_p]
    lib.bm_chain_hash.restype = ctypes.c_uint64
    lib.bm_chain_hash.argtypes = [
        ctypes.POINTER(ctypes.c_int64), ctypes.c_int, ctypes.c_uint64, ctypes.c_int,
    ]
    lib.bm_allocate.restype = ctypes.c_int
    lib.bm_allocate.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_int64), ctypes.c_int,
        ctypes.POINTER(ctypes.c_int32),
    ]
    lib.bm_deallocate.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_int32), ctypes.c_int,
    ]
    lib.bm_rollback.restype = ctypes.c_int
    lib.bm_rollback.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_int32), ctypes.c_int, ctypes.c_int,
    ]
    lib.bm_ensure.restype = ctypes.c_int
    lib.bm_ensure.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_int64), ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_int32), ctypes.c_int, ctypes.c_int,
    ]
    lib.bm_clear_prefix_cache.argtypes = [ctypes.c_void_p]
    _lib = lib
    return lib


def native_chain_hash(token_ids, prefix: int = -1) -> int:
    lib = load_native_lib()
    toks = np.asarray(token_ids, np.int64)
    ptr = toks.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))
    return int(
        lib.bm_chain_hash(ptr, len(toks), ctypes.c_uint64(prefix & (2**64 - 1)), int(prefix != -1))
    )


def _i32ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


def _i64ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))


class NativeBlockManager:
    """Drop-in replacement for engine.block_manager.BlockManager."""

    def __init__(self, num_blocks: int, block_size: int):
        lib = load_native_lib()
        if lib is None:
            raise RuntimeError("native library unavailable")
        self._lib = lib
        self._h = lib.bm_create(num_blocks, block_size)
        self.num_blocks = num_blocks
        self.block_size = block_size

    def __del__(self):
        if getattr(self, "_h", None):
            self._lib.bm_destroy(self._h)
            self._h = None

    @property
    def num_free_blocks(self) -> int:
        return self._lib.bm_num_free(self._h)

    def can_allocate(self, view: SeqView) -> bool:
        return self.num_free_blocks >= view.num_blocks

    def allocate(self, view: SeqView):
        assert not view.block_table
        toks = np.asarray(view.token_ids, np.int64)
        out = np.zeros((view.num_blocks,), np.int32)
        cached = self._lib.bm_allocate(self._h, _i64ptr(toks), len(toks), _i32ptr(out))
        assert cached >= 0, "out of KV blocks"
        view.block_table = out.tolist()
        view.num_cached_tokens = cached

    def deallocate(self, view: SeqView):
        if view.block_table:
            table = np.asarray(view.block_table, np.int32)
            self._lib.bm_deallocate(self._h, _i32ptr(table), len(table))
        view.block_table.clear()
        view.num_cached_tokens = 0

    def rollback(self, view: SeqView, n: int):
        old_blocks = len(view.block_table)
        view.truncate(n)
        table = np.asarray(view.block_table, np.int32)
        keep = self._lib.bm_rollback(self._h, _i32ptr(table), old_blocks, len(view))
        del view.block_table[keep:]

    def can_ensure(self, view: SeqView, extra_tokens: int) -> bool:
        need = -(-(len(view) + extra_tokens) // self.block_size) - len(view.block_table)
        return self.num_free_blocks >= max(0, need)

    def ensure_capacity(self, view: SeqView, extra_tokens: int):
        target = -(-(len(view) + extra_tokens) // self.block_size)
        cap = max(target, len(view.block_table))
        table = np.zeros((cap,), np.int32)
        table[: len(view.block_table)] = view.block_table
        toks = np.asarray(view.token_ids, np.int64)
        new_len = self._lib.bm_ensure(
            self._h, _i64ptr(toks), len(toks), extra_tokens,
            _i32ptr(table), len(view.block_table), cap,
        )
        assert new_len >= 0, "out of KV blocks"
        view.block_table = table[:new_len].tolist()

    def clear_prefix_cache(self):
        self._lib.bm_clear_prefix_cache(self._h)
