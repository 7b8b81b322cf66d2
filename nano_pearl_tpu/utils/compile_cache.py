"""Persistent XLA compile cache setup.

The fused whole-loop PEARL/AR programs (engine/fused.py) are large; on
remote-compiler backends (the axon TPU tunnel) a cold compile of the
default bench profile takes minutes. The reference gets "warm starts"
for free from CUDA-graph capture living in process memory plus torch's
inductor cache; the JAX-native equivalent is the persistent compilation
cache, which must be enabled BEFORE the first compile.

The cache lives inside the repo checkout by default (not /tmp, which is
wiped between sessions here) so that a benchmark run in a fresh session
still hits it. Override with ``NANO_PEARL_CACHE_DIR``; set it to the
empty string to disable.
"""

from __future__ import annotations

import os

_DONE = False


def default_cache_dir() -> str:
    """<repo checkout root>/.jax_cache_<platforms> — survives session
    /tmp wipes. The directory is KEYED BY jax_platforms: a TPU-plugin
    process (axon) emits CPU AOT artifacts compiled with modified
    target features (+prefer-no-scatter/gather), and a plain-CPU
    process that loads such an entry from a shared cache ABORTS with a
    machine-feature mismatch (observed as a hard `Fatal Python error:
    Aborted` in backend_compile_and_load while the chip bench and the
    CPU test suite ran concurrently). One cache per platform config
    keeps the artifacts compatible by construction."""
    import jax

    pkg = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    platforms = jax.config.jax_platforms or "default"
    tag = "".join(c if c.isalnum() else "_" for c in platforms)
    return os.path.join(os.path.dirname(pkg), f".jax_cache_{tag}")


def enable_compile_cache() -> str | None:
    """Idempotently point JAX's persistent compilation cache at a durable
    directory. Returns the directory (None when disabled). Called from
    ``PearlEngine.__init__`` so every entry point — bench, serving, user
    scripts — gets warm compiles, not just bench.py (round-1 gap)."""
    global _DONE
    cache_dir = os.environ.get("NANO_PEARL_CACHE_DIR", default_cache_dir())
    if _DONE or not cache_dir:
        return cache_dir or None
    import jax

    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    # cache entries regardless of program size; the fused programs are
    # the whole point
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    _DONE = True
    return cache_dir
