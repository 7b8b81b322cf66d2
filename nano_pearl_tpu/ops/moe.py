"""Mixture-of-Experts MLP block (Qwen3-MoE / Mixtral families).

New capability beyond the reference (SURVEY §2.8: expert parallelism
"No. Dense models only.") — the reference supports only dense Llama /
Qwen2 / Qwen3 (nano_pearl/models/). This adds the sparse-MoE decoder
MLP as a drop-in replacement for the SwiGLU block in
models/transformer.py, with expert parallelism as a pure GSPMD axis.

Design (TPU-first):

- Expert weights are STACKED on a leading E axis ([E, H, F] / [E, F, H])
  and computed with batched einsums — every expert's matmul rides the
  MXU at full tile size, there is no per-expert Python loop or dynamic
  gather of weight slices.
- Routing is the HF scheme shared by Mixtral and Qwen3-MoE
  (transformers Mixtral/Qwen3Moe SparseMoeBlock): fp32 softmax over ALL
  expert logits, top-k, optional renormalization of the kept weights
  (`norm_topk_prob`; Mixtral always renormalizes). The top-k selection
  is materialized as a dense [N, E] gate matrix (one-hot combine) so the
  whole block stays static-shaped — no ragged dispatch, no capacity
  dropping, numerics exactly match HF's exact (non-capacity) routing.
- Every expert processes every token ("dense dispatch") and the gate
  matrix zeroes the non-selected terms. For DECODE — the PEARL hot path —
  this is near-free: with batch x top_k selections spread over E experts
  essentially all expert weights must be read from HBM anyway, and
  decode is weight-bandwidth-bound, so dense compute costs what sparse
  compute would. For large-N prefill it spends E/top_k extra FLOPs;
  a capacity-based all_to_all dispatch is the documented follow-up if
  MoE prefill ever dominates.
- Expert parallelism (EP): shard the E axis over the `ep` mesh axis
  (parallel/sharding.py). The three expert einsums are then fully local
  per shard and the final gate-weighted combine contracts E, which GSPMD
  turns into one psum over `ep` — EP needs zero communication code here.
  The F axis stays sharded over `tp`, so EP composes with TP.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from nano_pearl_tpu.ops.quant import is_quantized


def route(
    router_logits: jax.Array,  # [N, E] (any float dtype)
    top_k: int,
    norm_topk_prob: bool,
    valid_num_experts: int | None = None,
) -> jax.Array:
    """HF Mixtral/Qwen3-MoE routing → dense gate matrix [N, E] (fp32).

    softmax over all experts in fp32, top-k, optional renormalization.
    ``valid_num_experts`` masks EP-padding experts (ModelConfig.pad_for_ep
    zero-fills their weights; they must never win top-k or the kept
    probability mass would be wrong).
    """
    logits = router_logits.astype(jnp.float32)
    n, e = logits.shape
    if valid_num_experts is not None and valid_num_experts < e:
        pad_mask = jnp.arange(e) >= valid_num_experts
        logits = jnp.where(pad_mask, -jnp.inf, logits)
    probs = jax.nn.softmax(logits, axis=-1)
    vals, idx = jax.lax.top_k(probs, top_k)  # [N, k]
    if norm_topk_prob:
        vals = vals / jnp.sum(vals, axis=-1, keepdims=True)
    # one-hot combine instead of scatter: static-shaped, shardable
    onehot = jax.nn.one_hot(idx, e, dtype=jnp.float32)  # [N, k, E]
    return jnp.einsum("nk,nke->ne", vals, onehot)  # [N, E]


def _mm_e(x: jax.Array, w) -> jax.Array:
    """[N, H] x [E, H, F] -> [E, N, F]; quantized experts dequant on the
    fly like ops.quant.mm (scale [E, 1, F] broadcasts over N)."""
    if is_quantized(w):
        y = jnp.einsum("nh,ehf->enf", x, w["q"].astype(x.dtype))
        return y * w["s"].astype(x.dtype)
    return jnp.einsum("nh,ehf->enf", x, w)


def _mm_e_down(a: jax.Array, w) -> jax.Array:
    """[E, N, F] x [E, F, H] -> [E, N, H] (quant scale [E, 1, H])."""
    if is_quantized(w):
        y = jnp.einsum("enf,efh->enh", a, w["q"].astype(a.dtype))
        return y * w["s"].astype(a.dtype)
    return jnp.einsum("enf,efh->enh", a, w)


def moe_mlp(
    x: jax.Array,  # [N, H]
    router_w: jax.Array,  # [H, E]
    wgate,  # [E, H, F] (or quant dict)
    wup,  # [E, H, F]
    wdown,  # [E, F, H]
    top_k: int,
    norm_topk_prob: bool,
    valid_num_experts: int | None = None,
) -> jax.Array:
    """Sparse-MoE SwiGLU block, exact HF numerics, returns [N, H]."""
    router_logits = x @ router_w  # [N, E]
    gates = route(router_logits, top_k, norm_topk_prob, valid_num_experts)
    g = _mm_e(x, wgate)  # [E, N, F]
    u = _mm_e(x, wup)
    a = jax.nn.silu(g.astype(jnp.float32)).astype(x.dtype) * u
    o = _mm_e_down(a, wdown)  # [E, N, H]
    # contract E: under EP this is the ONE cross-shard reduction (psum
    # over the ep axis, inserted by GSPMD)
    return jnp.einsum("ne,enh->nh", gates.astype(x.dtype), o)
