"""Generic functional decoder-only transformer for the Llama family.

One implementation serves all three reference model definitions
(reference: nano_pearl/models/llama.py, qwen2.py, qwen3.py — which differ
only in qkv bias and per-head q/k norms), as pure functions over a
parameter pytree:

- parameters are stacked across layers (leading ``L`` dim) and the layer
  stack runs under ``lax.scan`` — one layer is traced/compiled once, the
  TPU-native replacement for CUDA-graph capture of an unrolled module
  list (reference: pearl_model_runner.py:264-301).
- every phase (prefill, decode, PEARL packed verify) uses the same
  forward: ``N`` flat token rows with per-row position, KV slot, block
  table and context length (see nano_pearl_tpu/ops/attention.py).
- tensor parallelism is pure GSPMD: see nano_pearl_tpu/parallel/sharding.py.

Parameter layout (all linear weights stored [in, out] so the forward is
``x @ w``; HF checkpoints store [out, in] and are transposed at load):

    embed:     [V, H]          layers.wq:   [L, H, Hq*D]
    final_ln:  [H]             layers.wk/wv:[L, H, Hkv*D]
    lm_head:   [V, H]          layers.wo:   [L, Hq*D, H]
    layers.input_ln/post_ln: [L, H]
    layers.wgate/wup: [L, H, F]   layers.wdown: [L, F, H]
    layers.bq/bk/bv: [L, Hq*D]/[L, Hkv*D] (qwen2)
    layers.q_norm/k_norm: [L, D] (qwen3)
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

from nano_pearl_tpu.config import ModelConfig
from nano_pearl_tpu.ops.kv_cache import write_kv
from nano_pearl_tpu.ops.quant import QUANTIZED_LAYER_KEYS, mm, mm_t
from nano_pearl_tpu.ops.rope import apply_rope, build_rope_table
from nano_pearl_tpu.ops.sampling import mask_invalid_logits

# Layer-scan unroll factor, captured ONCE at import (see run_layers).
_SCAN_UNROLL = int(os.environ.get("NANO_PEARL_SCAN_UNROLL", "1"))


def _dtype(cfg: ModelConfig):
    return jnp.dtype(cfg.dtype)


def rms_norm(x: jax.Array, weight: jax.Array, eps: float, out_dtype=None) -> jax.Array:
    """fp32 rms, cast back before the weight mul — matches both the
    reference (layernorm.py:17-25) and HF Llama for bitwise parity.
    ``out_dtype`` overrides the cast target (the f32 residual carry
    passes f32 sums but the GEMM inputs must stay in the model dtype)."""
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    return (xf * jax.lax.rsqrt(var + eps)).astype(out_dtype or x.dtype) * weight


def init_params(cfg: ModelConfig, key: jax.Array, scale: float = 0.02) -> dict:
    """Random init (tests / weightless benchmarks). Shapes match the loader."""
    dt = _dtype(cfg)
    h, f, l = cfg.hidden_size, cfg.intermediate_size, cfg.num_hidden_layers
    d = cfg.head_dim
    hq, hkv = cfg.num_attention_heads * d, cfg.num_key_value_heads * d
    v = cfg.vocab_size
    keys = iter(jax.random.split(key, 16))

    def rnd(*shape):
        return (jax.random.normal(next(keys), shape, jnp.float32) * scale).astype(dt)

    layers = {
        "input_ln": jnp.ones((l, h), dt),
        "wq": rnd(l, h, hq),
        "wk": rnd(l, h, hkv),
        "wv": rnd(l, h, hkv),
        "wo": rnd(l, hq, h),
        "post_ln": jnp.ones((l, h), dt),
    }
    if cfg.is_moe:
        # experts stacked on a leading E axis (ops/moe.py); router per layer
        e, fm = cfg.num_experts, cfg.moe_intermediate_size
        layers.update({
            "router": rnd(l, h, e),
            "wgate": rnd(l, e, h, fm),
            "wup": rnd(l, e, h, fm),
            "wdown": rnd(l, e, fm, h),
        })
    else:
        layers.update({
            "wgate": rnd(l, h, f),
            "wup": rnd(l, h, f),
            "wdown": rnd(l, f, h),
        })
    if cfg.qkv_bias:
        layers.update({"bq": rnd(l, hq), "bk": rnd(l, hkv), "bv": rnd(l, hkv)})
    if cfg.qk_norm:
        layers.update({"q_norm": jnp.ones((l, d), dt), "k_norm": jnp.ones((l, d), dt)})
    embed = rnd(v, h)
    params = {
        "embed": embed,
        "layers": layers,
        "final_ln": jnp.ones((h,), dt),
        "lm_head": embed if cfg.tie_word_embeddings else rnd(v, h),
    }
    if cfg.quant:
        from nano_pearl_tpu.ops.quant import quantize_weight

        for k in QUANTIZED_LAYER_KEYS:
            params["layers"][k] = quantize_weight(params["layers"][k], cfg.quant)
        if not cfg.tie_word_embeddings:
            params["lm_head"] = quantize_weight(
                params["lm_head"], cfg.quant, contract_axis=-1
            )
    return params


def fuse_projections(layers: dict) -> dict:
    """Concatenate wq|wk|wv -> wqkv and wgate|wup -> wgu on the out axis
    (``ModelConfig.fuse_proj``): one [H, Hq+2Hkv] and one [H, 2F] GEMM
    per layer instead of three/two — the TPU analogue of the reference's
    QKVParallelLinear / MergedColumnParallelLinear fused weights
    (reference: nano_pearl/layers/linear.py:92-150). Plain or
    weight-quantized ({"q","s"}) leaves; dense models only (MoE experts
    already batch their FFN GEMMs on the stacked E axis)."""
    from nano_pearl_tpu.ops.quant import is_quantized

    def cat(keys):
        vals = [layers[k] for k in keys]
        if is_quantized(vals[0]):
            return {
                "q": jnp.concatenate([v["q"] for v in vals], axis=-1),
                "s": jnp.concatenate([v["s"] for v in vals], axis=-1),
            }
        return jnp.concatenate(vals, axis=-1)

    drop = ("wq", "wk", "wv", "wgate", "wup", "bq", "bk", "bv")
    out = {k: v for k, v in layers.items() if k not in drop}
    out["wqkv"] = cat(["wq", "wk", "wv"])
    out["wgu"] = cat(["wgate", "wup"])
    if "bq" in layers:
        out["bqkv"] = jnp.concatenate(
            [layers["bq"], layers["bk"], layers["bv"]], axis=-1
        )
    return out


def forward(
    cfg: ModelConfig,
    params: dict,
    kv_cache: jax.Array,  # [L, 2, NB+1, BS, Hkv, D]
    tokens: jax.Array,  # [N] int32
    positions: jax.Array,  # [N] int32
    slots: jax.Array,  # [N] int32 flat KV slot per token (garbage block for pads)
    rope_table: jax.Array,  # [max_pos, D] from build_rope_table
    attn_fn,  # static: (q [N,Hq,D], cache, layer_idx, *attn_args) -> o [N,Hq,D]
    attn_args: tuple,  # traced attention metadata (block tables, lens, ...)
    kv_write_fn=write_kv,  # static; sequence-parallel groups localize writes (parallel/sp.py)
    moe_fn=None,  # static; mesh-aware MoE dispatch (EP ragged, ops/moe.moe_mlp_ep)
    moe_ragged=False,  # static; allow the sorted-ragged MoE dispatch.
    # PREFILL-ONLY by contract: the draft's gamma-scan decode and the
    # target's packed verify must run the SAME dispatch flavor (dense
    # one-hot) — ragged_dot's per-segment fp schedule differs from the
    # dense einsums', and a schedule mismatch between the two streams
    # flips near-tied argmaxes, leaking bitwise-ceiling acceptance
    # (measured: MoE ceiling MAT 11.25 vs dense 14.0 when verify rows
    # crossed _RAGGED_MIN_ROWS while decode stayed dense).
) -> tuple[jax.Array, jax.Array]:
    """Run the decoder stack; returns (hidden [N, H], updated kv_cache).

    The reference equivalent is {Llama,Qwen2,Qwen3}Model.forward
    (e.g. llama.py:213-223) with attention metadata carried in a context
    singleton; here the metadata is explicit arguments and the attention
    flavor (decode/verify vs prefill, see ops/attention.py) is a static
    closure.
    """
    d = cfg.head_dim
    n_q, n_kv = cfg.num_attention_heads, cfg.num_key_value_heads
    eps = cfg.rms_norm_eps
    qk_norm = cfg.qk_norm
    qkv_bias = cfg.qkv_bias

    x = params["embed"][tokens]  # [N, H] vocab-sharded gather
    rope_rows = rope_table[positions]  # [N, D]
    x, res, kv_cache = run_layers(
        cfg, params["layers"], kv_cache, x,
        jnp.zeros(x.shape, jnp.float32),  # f32 residual carry (layer_step)
        rope_rows, slots, attn_fn, attn_args, kv_write_fn, moe_fn,
        moe_ragged=moe_ragged,
    )
    final = x.astype(jnp.float32) + res
    hidden = rms_norm(final, params["final_ln"], eps, out_dtype=x.dtype)
    return hidden, kv_cache


def run_layers(
    cfg: ModelConfig,
    layers: dict,  # stacked layer params, leading dim L' (any chunk of the stack)
    kv_cache: jax.Array,  # cache for the SAME L' layers, [L', 2, NB+1, BS, Hkv, D]
    x: jax.Array,  # [N, H] current hidden
    res: jax.Array,  # [N, H] residual carried alongside (zeros at the stack top)
    rope_rows: jax.Array,  # [N, D]
    slots: jax.Array,
    attn_fn,
    attn_args: tuple,
    kv_write_fn=write_kv,
    moe_fn=None,
    moe_ragged=False,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """The decoder-layer scan of ``forward``, factored so pipeline
    parallelism (parallel/pp.py) can run one stage's layer CHUNK: the
    (x, res) pair composes across chunks exactly as across layers.
    Returns (x, res, kv_cache)."""
    d = cfg.head_dim
    n_q, n_kv = cfg.num_attention_heads, cfg.num_key_value_heads
    eps = cfg.rms_norm_eps
    qk_norm = cfg.qk_norm
    qkv_bias = cfg.qkv_bias

    def layer_step(carry, xs):
        # The residual stream ``res`` rides the scan carry in f32: a bf16
        # residual carry rounds (x + res) once per layer, which (a) loses
        # precision with depth and (b) makes logits depend on the LAYER
        # COUNT even for mathematically-passthrough layers — the
        # bitwise-acceptance leak at the layer-share ceiling traced to
        # exactly that one extra rounding (MAT 12.4 instead of 14 at
        # gamma=14; tools/probe_ceiling_divergence2.py, v5e 2026-08-20).
        # GEMM inputs are cast back to the model dtype inside rms_norm.
        x, res, cache = carry
        lp, li = xs

        res2 = x.astype(jnp.float32) + res  # f32, exact
        h1 = rms_norm(res2, lp["input_ln"], eps, out_dtype=x.dtype)

        if "wqkv" in lp:
            qkv = mm(h1, lp["wqkv"])
            if qkv_bias:
                qkv = qkv + lp["bqkv"]
            hq_w, hkv_w = n_q * d, n_kv * d
            q = qkv[:, :hq_w]
            k = qkv[:, hq_w : hq_w + hkv_w]
            v = qkv[:, hq_w + hkv_w :]
        else:
            q = mm(h1, lp["wq"])
            k = mm(h1, lp["wk"])
            v = mm(h1, lp["wv"])
            if qkv_bias:
                q, k, v = q + lp["bq"], k + lp["bk"], v + lp["bv"]
        q = q.reshape(-1, n_q, d)
        k = k.reshape(-1, n_kv, d)
        v = v.reshape(-1, n_kv, d)
        if qk_norm:
            q = rms_norm(q, lp["q_norm"], eps)
            k = rms_norm(k, lp["k_norm"], eps)
        q = apply_rope(q, rope_rows)
        k = apply_rope(k, rope_rows)

        # layer-folded scatter/gather on the FULL carried cache — no
        # per-layer dynamic-slice + write-back (which XLA can lower to a
        # whole-cache copy per layer inside the scan)
        cache = kv_write_fn(cache, k, v, slots, li)
        if getattr(attn_fn, "wants_fresh_and_cache", False):
            # paged-prefix prefill kernel: fresh K/V in-operand PLUS the
            # carried cache for the prefix pages (read-only below the
            # scatter frontier — ops/pallas/prefill_attention)
            o = attn_fn(q, k, v, cache, li, *attn_args)
        elif getattr(attn_fn, "wants_fresh_kv", False):
            # prefill self-attention flavors consume the fresh K/V
            # directly: gathering them back out of the just-scattered
            # cache forces XLA to copy the whole cache carry per layer
            # (ops/attention.prefill_self_attention_jnp)
            o = attn_fn(q, k, v, li, *attn_args)
        else:
            o = attn_fn(q, cache, li, *attn_args)
        attn_out = mm(o.reshape(-1, n_q * d), lp["wo"])

        res3 = attn_out.astype(jnp.float32) + res2  # f32 residual carry
        h2 = rms_norm(res3, lp["post_ln"], eps, out_dtype=x.dtype)
        if cfg.is_moe:
            if moe_fn is not None:
                # mesh-aware dispatch bound by the runner (EP-sharded
                # ragged path, ops/moe.moe_mlp_ep)
                mlp_out = moe_fn(h2, lp, moe_ragged)
            else:
                from nano_pearl_tpu.ops.moe import moe_mlp

                mlp_out = moe_mlp(
                    h2, lp["router"], lp["wgate"], lp["wup"], lp["wdown"],
                    cfg.num_experts_per_tok, cfg.norm_topk_prob,
                    cfg.valid_num_experts,
                    # the mesh-free ragged dispatch needs global
                    # group_sizes: ep > 1 without a bound moe_fn falls
                    # back to dense dispatch
                    allow_ragged=cfg.ep_size == 1 and moe_ragged,
                )
        elif "wgu" in lp:
            gu = mm(h2, lp["wgu"])
            f = gu.shape[-1] // 2
            act = jax.nn.silu(gu[:, :f].astype(jnp.float32)).astype(
                x.dtype
            ) * gu[:, f:]
            mlp_out = mm(act, lp["wdown"])
        else:
            act = jax.nn.silu(
                mm(h2, lp["wgate"]).astype(jnp.float32)
            ).astype(x.dtype) * mm(h2, lp["wup"])
            mlp_out = mm(act, lp["wdown"])
        return (mlp_out, res3, cache), None

    n_layers = jax.tree.leaves(layers)[0].shape[0]
    layer_ids = jnp.arange(n_layers, dtype=jnp.int32)
    # _SCAN_UNROLL (module constant, read once at import from
    # NANO_PEARL_SCAN_UNROLL) unrolls k layers per loop step: the
    # python-unrolled GEMM stack measured 0.65 ms/forward faster than the
    # rolled scan at bench shapes (tools/probe_verify_breakdown.py
    # sep_unroll vs sep_scan, v5e) — scan-body fixed costs and xs
    # dynamic-slicing. Default 1 (rolled): compile time scales with k on
    # the remote compiler. Read ONCE at import so every program compiled
    # in a process shares one fp schedule (a mid-process env change would
    # otherwise mix numerically divergent programs via the persistent
    # compile cache with no record of which was used).
    (x, res, kv_cache), _ = jax.lax.scan(
        layer_step, (x, res, kv_cache), (layers, layer_ids),
        unroll=min(_SCAN_UNROLL, n_layers) if _SCAN_UNROLL > 1 else 1,
    )
    return x, res, kv_cache


def compute_logits(cfg: ModelConfig, params: dict, hidden: jax.Array) -> jax.Array:
    """LM head over selected rows; padded vocab masked to -inf
    (reference: embed_head.py:51-75 gathers shards to the master rank and
    truncates — here the matmul stays sharded and sampling handles the
    sharded logits directly)."""
    logits = mm_t(hidden, params["lm_head"])
    return mask_invalid_logits(logits.astype(jnp.float32), cfg.valid_vocab_size)


def make_rope_table(cfg: ModelConfig) -> jax.Array:
    """Supports llama3/linear rope_scaling (Llama 3.1+ targets). The
    reference asserts rope_scaling is None for non-llama models
    (rotary_embedding.py:59) and silently ignores it for llama
    (:64-72) — here it is applied properly (ops/rope.py)."""
    return build_rope_table(
        cfg.head_dim, cfg.max_position_embeddings, cfg.rope_theta, cfg.rope_scaling
    )
