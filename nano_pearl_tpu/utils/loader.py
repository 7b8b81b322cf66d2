"""Safetensors checkpoint loading (reference: nano_pearl/utils/loader.py).

The reference streams HF safetensors into per-rank torch modules through
``weight_loader`` hooks (fused qkv/gate_up routing via
``packed_modules_mapping``, zero-fill padding for non-2-power TP). Here
loading is a pure data transformation to the functional param pytree:

1. map HF names to pytree paths (no fused-weight routing needed — q/k/v
   and gate/up stay separate matrices, sharded by GSPMD),
2. transpose [out, in] -> [in, out], zero-pad sharded dims to the padded
   config (reference: pearl_config.py:37-67, linear.py:9-20),
3. stack per-layer tensors along a leading L dim (the lax.scan layout),
4. ``jax.device_put`` with the target ``NamedSharding`` — for large
   stacked tensors, layer-by-layer through a donated device buffer so
   host memory stays bounded at one layer slice (70B-safe).
"""

from __future__ import annotations

import os
import re
from functools import partial
from glob import glob

import jax
import jax.numpy as jnp
import numpy as np

from nano_pearl_tpu.config import ModelConfig
from nano_pearl_tpu.utils.logging import logger

# bytes above which a stacked tensor is streamed layer-by-layer
_STREAM_THRESHOLD = 1 << 30


def _pad_to(x: np.ndarray, shape: tuple[int, ...]) -> np.ndarray:
    """Zero-pad at the tail of every dim (reference: linear.py:13-20
    ``pad_tensor`` — padding sharded dims keeps math exact because padded
    head/ffn/vocab lanes carry zeros end-to-end)."""
    if tuple(x.shape) == tuple(shape):
        return x
    pads = [(0, t - s) for s, t in zip(x.shape, shape)]
    return np.pad(x, pads)


def _expected_shapes(cfg: ModelConfig) -> dict:
    h, f, l = cfg.hidden_size, cfg.intermediate_size, cfg.num_hidden_layers
    d = cfg.head_dim
    hq, hkv = cfg.num_attention_heads * d, cfg.num_key_value_heads * d
    v = cfg.vocab_size
    layers = {
        "input_ln": (l, h),
        "wq": (l, h, hq),
        "wk": (l, h, hkv),
        "wv": (l, h, hkv),
        "wo": (l, hq, h),
        "post_ln": (l, h),
    }
    if cfg.is_moe:
        e, fm = cfg.num_experts, cfg.moe_intermediate_size
        layers.update({
            "router": (l, h, e),
            "wgate": (l, e, h, fm),
            "wup": (l, e, h, fm),
            "wdown": (l, e, fm, h),
        })
    else:
        layers.update({
            "wgate": (l, h, f),
            "wup": (l, h, f),
            "wdown": (l, f, h),
        })
    if cfg.qkv_bias:
        layers.update({"bq": (l, hq), "bk": (l, hkv), "bv": (l, hkv)})
    if cfg.qk_norm:
        layers.update({"q_norm": (l, d), "k_norm": (l, d)})
    return {"embed": (v, h), "layers": layers, "final_ln": (h,), "lm_head": (v, h)}


# HF tensor name -> (pytree path, transpose) ; {i} = layer index
_LAYER_MAP = {
    "input_layernorm.weight": ("input_ln", False),
    "self_attn.q_proj.weight": ("wq", True),
    "self_attn.k_proj.weight": ("wk", True),
    "self_attn.v_proj.weight": ("wv", True),
    "self_attn.q_proj.bias": ("bq", False),
    "self_attn.k_proj.bias": ("bk", False),
    "self_attn.v_proj.bias": ("bv", False),
    "self_attn.o_proj.weight": ("wo", True),
    "self_attn.q_norm.weight": ("q_norm", False),
    "self_attn.k_norm.weight": ("k_norm", False),
    "post_attention_layernorm.weight": ("post_ln", False),
    "mlp.gate_proj.weight": ("wgate", True),
    "mlp.up_proj.weight": ("wup", True),
    "mlp.down_proj.weight": ("wdown", True),
    # MoE routers (Qwen3-MoE / Mixtral): HF stores [E, H] -> ours [H, E]
    "mlp.gate.weight": ("router", True),
    "block_sparse_moe.gate.weight": ("router", True),
}
# MoE expert tensors: mlp.experts.{j}.gate_proj (Qwen3-MoE) /
# block_sparse_moe.experts.{j}.w1|w3|w2 (Mixtral w1=gate, w3=up, w2=down)
_EXPERT_RE = re.compile(
    r"^(?:mlp|block_sparse_moe)\.experts\.(\d+)\."
    r"(gate_proj|up_proj|down_proj|w1|w2|w3)\.weight$"
)
_EXPERT_KEY = {
    "gate_proj": "wgate", "w1": "wgate",
    "up_proj": "wup", "w3": "wup",
    "down_proj": "wdown", "w2": "wdown",
}
_TOP_MAP = {
    "model.embed_tokens.weight": "embed",
    "model.norm.weight": "final_ln",
    "lm_head.weight": "lm_head",
}
_LAYER_RE = re.compile(r"^model\.layers\.(\d+)\.(.+)$")


def _to_numpy(t) -> np.ndarray:
    """safetensors tensor -> numpy, bf16 carried via ml_dtypes."""
    return np.asarray(t)


def _open_all(path: str):
    from safetensors import safe_open

    files = sorted(glob(os.path.join(path, "*.safetensors")))
    if not files:
        raise FileNotFoundError(f"no *.safetensors under {path}")
    handles = [safe_open(f, framework="numpy") for f in files]
    index = {}
    for hd in handles:
        for name in hd.keys():
            index[name] = hd
    return handles, index


def _put(x: np.ndarray, dtype, sharding):
    arr = jnp.asarray(x).astype(dtype)
    return jax.device_put(arr, sharding) if sharding is not None else arr


@partial(jax.jit, donate_argnums=0)
def _set_layer(buf, slice_, i):
    return jax.lax.dynamic_update_index_in_dim(buf, slice_, i, axis=0)


def load_params(
    cfg: ModelConfig,
    path: str,
    shardings: dict | None = None,
    dtype=None,
) -> dict:
    """Load a HF checkpoint directory into the functional param pytree.

    ``cfg`` must already be TP-padded (``ModelConfig.pad_for_tp``);
    ``shardings`` is the pytree from ``parallel.sharding.param_shardings``
    (or None for single-device/host arrays in tests).
    """
    dtype = jnp.dtype(dtype or cfg.dtype)
    shapes = _expected_shapes(cfg)
    handles, index = _open_all(path)

    def sh(*path_keys):
        node = shardings
        for k in path_keys:
            if node is None:
                return None
            node = node[k]
        return node

    params: dict = {"layers": {}}

    # ---- top-level tensors ----
    quant = cfg.quant in ("int8", "fp8")
    from nano_pearl_tpu.ops.quant import (
        QUANTIZED_LAYER_KEYS,
        quant_storage_dtype,
        quantize_weight,
    )

    qdtype = quant_storage_dtype(cfg.quant) if quant else None

    def put_maybe_quant(x, key_sharding, contract_axis):
        """Quantize on host then place q/s with their shardings."""
        qd = quantize_weight(
            np.asarray(x, np.float32), cfg.quant, contract_axis=contract_axis
        )
        qsh = key_sharding if not isinstance(key_sharding, dict) else key_sharding
        return {
            "q": _put(np.asarray(qd["q"]), qdtype, qsh["q"] if isinstance(qsh, dict) else None),
            "s": _put(np.asarray(qd["s"]), jnp.float32, qsh["s"] if isinstance(qsh, dict) else None),
        }

    for hf_name, key in _TOP_MAP.items():
        if hf_name not in index:
            continue
        raw = _to_numpy(index[hf_name].get_tensor(hf_name))
        padded = _pad_to(raw, shapes[key])
        if key == "lm_head" and quant and not cfg.tie_word_embeddings:
            params[key] = put_maybe_quant(padded, sh(key), contract_axis=-1)
        else:
            params[key] = _put(padded, dtype, sh(key))
    if "lm_head" not in params:
        assert cfg.tie_word_embeddings, "checkpoint lacks lm_head and embeddings are not tied"
        params["lm_head"] = params["embed"]
    missing_top = {"embed", "final_ln"} - set(params)
    if missing_top:
        raise KeyError(f"checkpoint missing tensors for {missing_top}")

    # ---- layer-stacked tensors ----
    num_layers = cfg.num_hidden_layers
    per_layer: dict[str, dict[int, str]] = {}
    # expert-stacked tensors: key -> layer -> expert -> hf name
    per_expert: dict[str, dict[int, dict[int, str]]] = {}
    for name in index:
        m = _LAYER_RE.match(name)
        if not m:
            continue
        li, rest = int(m.group(1)), m.group(2)
        em = _EXPERT_RE.match(rest)
        if em:
            key = _EXPERT_KEY[em.group(2)]
            per_expert.setdefault(key, {}).setdefault(li, {})[int(em.group(1))] = name
            continue
        if rest not in _LAYER_MAP:
            logger.warning(f"ignoring unknown layer tensor {name}")
            continue
        key, _ = _LAYER_MAP[rest]
        per_layer.setdefault(key, {})[li] = name

    for key, shape in shapes["layers"].items():
        expert_key = cfg.is_moe and key in ("wgate", "wup", "wdown")
        if key not in (per_expert if expert_key else per_layer):
            raise KeyError(f"checkpoint missing layer tensors for {key!r}")
        slice_shape = shape[1:]
        nbytes = int(np.prod(shape)) * dtype.itemsize
        stream = nbytes > _STREAM_THRESHOLD and sh("layers", key) is not None

        if expert_key:
            enames = per_expert[key]
            assert len(enames) == num_layers, (
                f"{key}: {len(enames)} layers != {num_layers}"
            )

            def load_slice(i, enames=enames):
                # stack the layer's experts on the leading E axis; all HF
                # expert weights are [out, in] -> transpose each
                per_e = enames[i]
                assert len(per_e) == cfg.valid_num_experts, (
                    f"{key} layer {i}: {len(per_e)} experts != {cfg.valid_num_experts}"
                )
                rows = [
                    np.ascontiguousarray(
                        _to_numpy(index[per_e[j]].get_tensor(per_e[j])).T
                    )
                    for j in range(len(per_e))
                ]
                return _pad_to(np.stack(rows), slice_shape)
        else:
            names = per_layer[key]
            assert len(names) == num_layers, (
                f"{key}: {len(names)} tensors != {num_layers} layers"
            )
            _, transpose = next(v for k, v in _LAYER_MAP.items() if v[0] == key)

            def load_slice(i, names=names, transpose=transpose):
                raw = _to_numpy(index[names[i]].get_tensor(names[i]))
                if transpose:
                    raw = np.ascontiguousarray(raw.T)
                return _pad_to(raw, slice_shape)

        quant_key = quant and key in QUANTIZED_LAYER_KEYS
        if stream and not quant_key:
            buf = jnp.zeros(shape, dtype=dtype, device=sh("layers", key))
            for i in range(num_layers):
                row = _put(load_slice(i), dtype, None)
                buf = _set_layer(buf, row, i)
            params["layers"][key] = buf
        elif stream and quant_key:
            shd = sh("layers", key)
            buf_q = jnp.zeros(shape, dtype=qdtype, device=shd["q"] if shd else None)
            s_shape = (num_layers, *slice_shape[:-2], 1, slice_shape[-1])
            buf_s = jnp.zeros(s_shape, dtype=jnp.float32, device=shd["s"] if shd else None)

            for i in range(num_layers):
                qd = quantize_weight(
                    np.asarray(load_slice(i), np.float32), cfg.quant, contract_axis=-2
                )
                buf_q = _set_layer(buf_q, _put(np.asarray(qd["q"]), qdtype, None), i)
                buf_s = _set_layer(buf_s, _put(np.asarray(qd["s"]), jnp.float32, None), i)
            params["layers"][key] = {"q": buf_q, "s": buf_s}
        elif quant_key:
            stacked = np.stack([load_slice(i) for i in range(num_layers)])
            params["layers"][key] = put_maybe_quant(stacked, sh("layers", key), contract_axis=-2)
        else:
            stacked = np.stack([load_slice(i) for i in range(num_layers)])
            params["layers"][key] = _put(stacked, dtype, sh("layers", key))

    for hd in handles:
        del hd
    logger.info(f"loaded checkpoint from {path} ({len(index)} tensors)", color="green")
    return params
