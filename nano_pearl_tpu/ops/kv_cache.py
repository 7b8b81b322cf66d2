"""Paged KV cache storage.

TPU-native replacement for the reference's Triton scatter kernel
(reference: nano_pearl/layers/attention.py:10-44, ``store_kvcache_kernel``).

Layout: one array per model, ``[L, 2, num_blocks + 1, block_size,
n_kv_heads, head_dim]``, sharded over kv heads. The final "+1" block is
a garbage block: padded batch rows (static-shape bucketing, the TPU
analogue of the reference's CUDA-graph padding with slot==-1) write
there instead of being skipped, so the scatter needs no branch.

The scatter itself is a flat row-wise ``.at[slots].set`` which XLA
lowers to an efficient dynamic-update scatter; a Pallas kernel is kept
as an upgrade path in nano_pearl_tpu/ops/pallas/ for when profiling
shows the XLA scatter off speed-of-light.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def make_kv_cache(
    num_layers: int,
    num_blocks: int,
    block_size: int,
    n_kv_heads: int,
    head_dim: int,
    dtype=jnp.bfloat16,
    sharding=None,
) -> jax.Array:
    """Allocate the paged cache (+1 garbage block at index ``num_blocks``).

    Reference: pearl_model_runner.py:119-143 (allocate_kv_cache).
    """
    shape = (num_layers, 2, num_blocks + 1, block_size, n_kv_heads, head_dim)
    if sharding is not None:
        return jnp.zeros(shape, dtype=dtype, device=sharding)
    return jnp.zeros(shape, dtype=dtype)


def write_kv(
    layer_cache: jax.Array,  # [2, NB+1, BS, Hkv, D]
    k: jax.Array,  # [N, Hkv, D]
    v: jax.Array,  # [N, Hkv, D]
    slots: jax.Array,  # [N] int32 flat slot = block_id * BS + offset
) -> jax.Array:
    """Scatter new K/V rows into the paged cache by flat slot index.

    Equivalent of the reference Triton ``store_kvcache`` (attention.py:36-44);
    padded rows carry slots pointing into the garbage block rather than -1.
    """
    _, nb1, bs, hkv, d = layer_cache.shape
    flat = layer_cache.reshape(2, nb1 * bs, hkv, d)
    flat = flat.at[0, slots].set(k, mode="drop")
    flat = flat.at[1, slots].set(v, mode="drop")
    return flat.reshape(2, nb1, bs, hkv, d)


def garbage_slots(num_blocks: int, block_size: int, n: int) -> jnp.ndarray:
    """Distinct slots inside the garbage block for n padded rows."""
    base = num_blocks * block_size
    return base + (jnp.arange(n, dtype=jnp.int32) % block_size)
