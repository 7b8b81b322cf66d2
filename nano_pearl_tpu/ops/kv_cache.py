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
    quant: str | None = None,
):
    """Allocate the paged cache (+1 garbage block at index ``num_blocks``).

    Reference: pearl_model_runner.py:119-143 (allocate_kv_cache).

    ``quant="int8"`` stores K/V as int8 with one scale per (slot, head)
    — half the HBM traffic for the decode-attention gather (north-star
    KV-cache quantization). The cache is then the pytree
    {"q": int8 [L,2,NB+1,BS,Hkv,D], "s": f32 [L,2,NB+1,BS,Hkv]}.
    """
    shape = (num_layers, 2, num_blocks + 1, block_size, n_kv_heads, head_dim)
    if quant == "int8":
        q_sh = s_sh = None
        if sharding is not None:
            q_sh, s_sh = sharding["q"], sharding["s"]
        q = jnp.zeros(shape, dtype=jnp.int8, device=q_sh) if q_sh else jnp.zeros(shape, jnp.int8)
        s = (
            jnp.zeros(shape[:-1], dtype=jnp.float32, device=s_sh)
            if s_sh
            else jnp.zeros(shape[:-1], jnp.float32)
        )
        return {"q": q, "s": s}
    if sharding is not None:
        return jnp.zeros(shape, dtype=dtype, device=sharding)
    return jnp.zeros(shape, dtype=dtype)


def cache_is_quantized(layer_cache) -> bool:
    return isinstance(layer_cache, dict)


def cache_kv_dims(layer_cache) -> tuple[int, int, int]:
    """(block_size, n_kv_heads, head_dim) of a per-layer cache node."""
    arr = layer_cache["q"] if cache_is_quantized(layer_cache) else layer_cache
    return arr.shape[-3], arr.shape[-2], arr.shape[-1]


def dequant_rows(q_rows: jax.Array, s_rows: jax.Array) -> jax.Array:
    """int8 gathered rows [..., Hkv, D] * scales [..., Hkv] -> f32."""
    return q_rows.astype(jnp.float32) * s_rows[..., None]


def write_kv(
    layer_cache,  # [2, NB+1, BS, Hkv, D] array or {"q","s"} pytree
    k: jax.Array,  # [N, Hkv, D]
    v: jax.Array,  # [N, Hkv, D]
    slots: jax.Array,  # [N] int32 flat slot = block_id * BS + offset
):
    """Scatter new K/V rows into the paged cache by flat slot index.

    Equivalent of the reference Triton ``store_kvcache`` (attention.py:36-44);
    padded rows carry slots pointing into the garbage block rather than -1.
    For an int8 cache, rows are quantized with a per-(token, head) scale
    at write time.
    """
    if cache_is_quantized(layer_cache):
        qc, sc = layer_cache["q"], layer_cache["s"]
        _, nb1, bs, hkv, d = qc.shape
        kf = k.astype(jnp.float32)
        vf = v.astype(jnp.float32)
        k_amax = jnp.max(jnp.abs(kf), axis=-1)  # [N, Hkv]
        v_amax = jnp.max(jnp.abs(vf), axis=-1)
        k_s = jnp.maximum(k_amax, 1e-8) / 127.0
        v_s = jnp.maximum(v_amax, 1e-8) / 127.0
        k_q = jnp.clip(jnp.round(kf / k_s[..., None]), -127, 127).astype(jnp.int8)
        v_q = jnp.clip(jnp.round(vf / v_s[..., None]), -127, 127).astype(jnp.int8)
        qflat = qc.reshape(2, nb1 * bs, hkv, d)
        qflat = qflat.at[0, slots].set(k_q, mode="drop")
        qflat = qflat.at[1, slots].set(v_q, mode="drop")
        sflat = sc.reshape(2, nb1 * bs, hkv)
        sflat = sflat.at[0, slots].set(k_s, mode="drop")
        sflat = sflat.at[1, slots].set(v_s, mode="drop")
        return {"q": qflat.reshape(qc.shape), "s": sflat.reshape(sc.shape)}
    _, nb1, bs, hkv, d = layer_cache.shape
    flat = layer_cache.reshape(2, nb1 * bs, hkv, d)
    flat = flat.at[0, slots].set(k.astype(flat.dtype), mode="drop")
    flat = flat.at[1, slots].set(v.astype(flat.dtype), mode="drop")
    return flat.reshape(2, nb1, bs, hkv, d)


def garbage_slots(num_blocks: int, block_size: int, n: int) -> jnp.ndarray:
    """Distinct slots inside the garbage block for n padded rows."""
    base = num_blocks * block_size
    return base + (jnp.arange(n, dtype=jnp.int32) % block_size)
