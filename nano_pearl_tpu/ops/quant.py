"""Weight-only INT8/FP8 quantization (north-star capability,
BASELINE.json: "INT8/FP8 weight-only ... quantization for the target
model, matching reference acceptance rate at the same bit-width").

Scheme: symmetric per-output-channel 1-byte storage. A quantized weight
is a pytree node ``{"q": int8|float8_e4m3fn [..., out], "s": float32
[..., out-broadcast]}`` and every matmul site goes through ``mm`` which
dequantizes on the fly — the 1-byte->bf16 convert fuses into the
matmul's weight read on TPU, so HBM traffic for weights halves, which
is the whole game for memory-bound decode. INT8 keeps uniform
resolution within a channel; FP8 (e4m3) trades a little mantissa for
per-element dynamic range, which tolerates outlier-heavy channels
better. Acceptance-rate parity is tested in tests/test_quant.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# keys quantized when ModelConfig.quant is set; out-channel is the
# LAST axis for all of them (weights stored [in, out])
QUANTIZED_LAYER_KEYS = ("wq", "wk", "wv", "wo", "wgate", "wup", "wdown")

FP8_DTYPE = jnp.float8_e4m3fn
FP8_MAX = 448.0  # largest finite e4m3fn value
WEIGHT_QUANT_KINDS = ("int8", "fp8")


def quantize_int8(w: jax.Array, contract_axis: int = -2) -> dict:
    """Symmetric per-out-channel int8: q = round(w / s), s = amax/127,
    with amax over the contraction axis only (per layer and per output
    channel for stacked [L, in, out] weights)."""
    wf = jnp.asarray(w, jnp.float32)
    amax = jnp.max(jnp.abs(wf), axis=contract_axis, keepdims=True)
    s = jnp.maximum(amax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(wf / s), -127, 127).astype(jnp.int8)
    return {"q": q, "s": s.astype(jnp.float32)}


def quantize_fp8(w: jax.Array, contract_axis: int = -2) -> dict:
    """Per-out-channel float8_e4m3fn: q = w / s in e4m3, s = amax/448.
    Same pytree shape as int8 so every downstream consumer is agnostic."""
    wf = jnp.asarray(w, jnp.float32)
    amax = jnp.max(jnp.abs(wf), axis=contract_axis, keepdims=True)
    s = jnp.maximum(amax, 1e-8) / FP8_MAX
    q = jnp.clip(wf / s, -FP8_MAX, FP8_MAX).astype(FP8_DTYPE)
    return {"q": q, "s": s.astype(jnp.float32)}


def quantize_weight(w: jax.Array, kind: str, contract_axis: int = -2) -> dict:
    if kind == "int8":
        return quantize_int8(w, contract_axis)
    if kind == "fp8":
        return quantize_fp8(w, contract_axis)
    raise ValueError(f"unknown weight quantization kind {kind!r}")


def quant_storage_dtype(kind: str):
    return jnp.int8 if kind == "int8" else FP8_DTYPE


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
