"""Weight-only INT8 quantization (north-star capability, BASELINE.json:
"INT8/FP8 weight-only ... quantization for the target model, matching
reference acceptance rate at the same bit-width").

Scheme: symmetric per-output-channel int8. A quantized weight is a
pytree node ``{"q": int8 [..., out], "s": float32 [..., out-broadcast]}``
and every matmul site goes through ``mm`` which dequantizes on the fly —
the int8->bf16 convert fuses into the matmul's weight read on TPU, so
HBM traffic for weights halves, which is the whole game for
memory-bound decode. Acceptance-rate parity is tested in
tests/test_quant.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# keys quantized when ModelConfig.quant == "int8"; out-channel is the
# LAST axis for all of them (weights stored [in, out])
QUANTIZED_LAYER_KEYS = ("wq", "wk", "wv", "wo", "wgate", "wup", "wdown")


def quantize_int8(w: jax.Array, contract_axis: int = -2) -> dict:
    """Symmetric per-out-channel int8: q = round(w / s), s = amax/127,
    with amax over the contraction axis only (per layer and per output
    channel for stacked [L, in, out] weights)."""
    wf = jnp.asarray(w, jnp.float32)
    amax = jnp.max(jnp.abs(wf), axis=contract_axis, keepdims=True)
    s = jnp.maximum(amax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(wf / s), -127, 127).astype(jnp.int8)
    return {"q": q, "s": s.astype(jnp.float32)}


def dequantize(w: dict, dtype=jnp.bfloat16) -> jax.Array:
    return (w["q"].astype(jnp.float32) * w["s"]).astype(dtype)


def is_quantized(w) -> bool:
    return isinstance(w, dict) and "q" in w and "s" in w


def mm(x: jax.Array, w) -> jax.Array:
    """x @ w for plain or quantized weights (w: [in, out] or quant dict)."""
    if is_quantized(w):
        y = jax.lax.dot_general(
            x, w["q"].astype(x.dtype),
            dimension_numbers=(((x.ndim - 1,), (0,)), ((), ())),
        )
        scale = w["s"].reshape(w["s"].shape[-1]).astype(x.dtype)
        return y * scale
    return x @ w


def mm_t(x: jax.Array, w) -> jax.Array:
    """x @ w.T for plain or quantized weights stored [out, in]
    (the LM head layout, out-channel = axis 0)."""
    if is_quantized(w):
        y = jax.lax.dot_general(
            x, w["q"].astype(x.dtype),
            dimension_numbers=(((x.ndim - 1,), (1,)), ((), ())),
        )
        scale = w["s"].reshape(w["s"].shape[0]).astype(x.dtype)
        return y * scale
    return x @ w.T
