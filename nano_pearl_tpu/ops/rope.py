"""Rotary position embeddings (reference: nano_pearl/layers/rotary_embedding.py).

Neox-style half-split rotation computed in fp32, applied from a
precomputed cos/sin table gathered by position — the torch.compile'd
table-gather apply of the reference becomes plain jnp that XLA fuses
into the surrounding QKV computation.
"""

from __future__ import annotations

import jax.numpy as jnp


def build_rope_table(head_dim: int, max_position: int, base: float) -> jnp.ndarray:
    """[max_position, head_dim] table: first half cos, second half sin
    (reference: rotary_embedding.py:27-33)."""
    inv_freq = 1.0 / (base ** (jnp.arange(0, head_dim, 2, dtype=jnp.float32) / head_dim))
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
