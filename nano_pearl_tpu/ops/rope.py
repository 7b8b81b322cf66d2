"""Rotary position embeddings (reference: nano_pearl/layers/rotary_embedding.py).

Neox-style half-split rotation computed in fp32, applied from a
precomputed cos/sin table gathered by position — the torch.compile'd
table-gather apply of the reference becomes plain jnp that XLA fuses
into the surrounding QKV computation.
"""

from __future__ import annotations

import jax.numpy as jnp


def _scale_inv_freq(inv_freq: jnp.ndarray, scaling: dict) -> jnp.ndarray:
    """Frequency-domain rope scaling. Supports the HF schemes needed by
    the supported model zoo: "llama3" (Llama 3.1+; matches transformers
    ROPE_INIT_FUNCTIONS["llama3"]) and "linear". NOTE the reference
    silently IGNORES rope_scaling for llama (rotary_embedding.py:64-72
    builds unscaled tables) — we implement it properly instead; HF logits
    parity is tested in tests/test_ops.py."""
    kind = scaling.get("rope_type", scaling.get("type"))
    factor = float(scaling["factor"])
    if kind == "linear":
        return inv_freq / factor
    if kind == "llama3":
        low = float(scaling["low_freq_factor"])
        high = float(scaling["high_freq_factor"])
        old_len = float(scaling["original_max_position_embeddings"])
        wavelen = 2.0 * jnp.pi / inv_freq
        smooth = (old_len / wavelen - low) / (high - low)
        smoothed = (1.0 - smooth) * inv_freq / factor + smooth * inv_freq
        return jnp.where(
            wavelen < old_len / high,  # high-frequency: keep
            inv_freq,
            jnp.where(wavelen > old_len / low, inv_freq / factor, smoothed),
        )
    raise NotImplementedError(f"rope_scaling type {kind!r} not supported")


def build_rope_table(
    head_dim: int, max_position: int, base: float, rope_scaling: dict | None = None
) -> jnp.ndarray:
    """[max_position, head_dim] table: first half cos, second half sin
    (reference: rotary_embedding.py:27-33)."""
    inv_freq = 1.0 / (base ** (jnp.arange(0, head_dim, 2, dtype=jnp.float32) / head_dim))
    if rope_scaling:
        inv_freq = _scale_inv_freq(inv_freq, rope_scaling)
    t = jnp.arange(max_position, dtype=jnp.float32)
    freqs = jnp.outer(t, inv_freq)  # [max_pos, head_dim//2]
    return jnp.concatenate([jnp.cos(freqs), jnp.sin(freqs)], axis=-1)


def apply_rope(x: jnp.ndarray, rope_rows: jnp.ndarray) -> jnp.ndarray:
    """Rotate ``x`` [N, heads, head_dim] by per-row table entries
    ``rope_rows`` [N, head_dim] (reference: rotary_embedding.py:6-15)."""
    half = x.shape[-1] // 2
    cos = rope_rows[:, None, :half]
    sin = rope_rows[:, None, half:]
    xf = x.astype(jnp.float32)
    x1, x2 = xf[..., :half], xf[..., half:]
    y = jnp.concatenate([x1 * cos - x2 * sin, x2 * cos + x1 * sin], axis=-1)
    return y.astype(x.dtype)
