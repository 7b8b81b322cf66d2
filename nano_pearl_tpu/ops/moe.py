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
- DECODE uses dense dispatch: every expert processes every token and the
  gate matrix zeroes the non-selected terms. This is near-free for the
  PEARL hot path: with batch x top_k selections spread over E experts
  essentially all expert weights must be read from HBM anyway, and
  decode is weight-bandwidth-bound, so dense compute costs what sparse
  compute would.
- PREFILL (N >= _RAGGED_MIN_ROWS rows) uses SORTED RAGGED dispatch via
  ``jax.lax.ragged_dot``: token-expert assignments are sorted by expert
  and each expert multiplies exactly its own contiguous row segment —
  FLOPs drop from E*N*H*F to top_k*N*H*F with NO capacity dropping
  (bit-exact routing, unlike capacity-based MoE kernels). ragged_dot is
  the native TPU grouped-matmul primitive (MXU tiles per group). The
  ragged path currently requires ep_size == 1 (the caller gates on it:
  group_sizes are global, and GSPMD cannot shard the group axis of a
  ragged_dot) and bf16/f32 expert weights.
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


_RAGGED_MIN_ROWS = 128  # below this the dense einsum's waste is noise


def _route_topk(router_logits, top_k, norm_topk_prob, valid_num_experts):
    """(vals [N,k] fp32, idx [N,k] int32) — shared by both dispatches."""
    logits = router_logits.astype(jnp.float32)
    e = logits.shape[1]
    if valid_num_experts is not None and valid_num_experts < e:
        pad_mask = jnp.arange(e) >= valid_num_experts
        logits = jnp.where(pad_mask, -jnp.inf, logits)
    probs = jax.nn.softmax(logits, axis=-1)
    vals, idx = jax.lax.top_k(probs, top_k)
    if norm_topk_prob:
        vals = vals / jnp.sum(vals, axis=-1, keepdims=True)
    return vals, idx


def _moe_mlp_ragged(
    x, router_logits, wgate, wup, wdown, top_k, norm_topk_prob,
    valid_num_experts,
):
    """Sorted ragged dispatch (prefill): top_k*N rows through the expert
    FFNs instead of E*N, exact routing (no capacity drop).

    Dispatch (x rows -> sorted rows) and combine (sorted outputs ->
    gate-weighted token sums) are ONE-HOT MATMULS, not gather / scatter-
    add: inside real TPU programs row gathers and scatter-adds lower to
    ~80 ns/ROW paths (the original .at[ts].add combine measured ~2.6 ms
    per 36L verify round at bench shapes — see the write_fresh history,
    ops/kv_cache.py), while the [S, N] selection matmuls are microseconds
    of MXU work (S = top_k*N)."""
    n, h = x.shape
    e = router_logits.shape[1]
    vals, idx = _route_topk(router_logits, top_k, norm_topk_prob, valid_num_experts)
    e_flat = idx.reshape(-1)  # [S = N*k]
    s = e_flat.shape[0]
    tok_flat = jnp.repeat(jnp.arange(n, dtype=jnp.int32), top_k)
    order = jnp.argsort(e_flat)
    ts = tok_flat[order]  # source token of sorted row
    ws = vals.reshape(-1)[order]  # gate weight of sorted row
    group_sizes = jnp.bincount(e_flat, length=e).astype(jnp.int32)
    # dispatch: xg[s] = x[ts[s]]  ==  D @ x with D[s, n] = (ts[s] == n)
    tok_iota = jnp.arange(n, dtype=jnp.int32)
    disp = (ts[:, None] == tok_iota[None, :]).astype(x.dtype)  # [S, N]
    xg = disp @ x  # [S, H]
    g = jax.lax.ragged_dot(xg, wgate, group_sizes)
    u = jax.lax.ragged_dot(xg, wup, group_sizes)
    a = jax.nn.silu(g.astype(jnp.float32)).astype(x.dtype) * u
    o = jax.lax.ragged_dot(a, wdown, group_sizes)  # [S, H]
    # combine: out[n] = sum_s [ts[s] == n] * ws[s] * o[s]  ==  C @ o
    comb = jnp.where(
        ts[None, :] == tok_iota[:, None], ws[None, :], 0.0
    )  # [N, S] f32
    out = jax.lax.dot_general(
        comb, o.astype(jnp.float32),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return out.astype(x.dtype)


def moe_mlp_ep(
    mesh,
    x: jax.Array,  # [N, H] (replicated over ep)
    router_w: jax.Array,  # [H, E]
    wgate,  # [E, H, F], E sharded over the ep mesh axis
    wup,
    wdown,
    top_k: int,
    norm_topk_prob: bool,
    valid_num_experts: int | None = None,
    allow_ragged: bool = True,
) -> jax.Array:
    """EP-sharded MoE block with RAGGED dispatch (round-4; previously
    ragged required ep == 1 because group_sizes are global and GSPMD
    cannot shard a ragged_dot's group axis).

    Mechanics: routing, the global expert-sort and the one-hot
    dispatch/combine matmuls are replicated; a shard_map over the ep
    axis gives each shard its contiguous SEGMENT of the sorted rows —
    rows are rolled so the segment starts at 0, a phantom zero-weight
    expert absorbs the other shards' rows (ragged_dot group sizes must
    cover every row), and the rolled-back outputs psum over ep (each
    row's FFN output comes from exactly one shard; the rest contribute
    zeros). The per-expert F axis stays GSPMD-auto (tp). Small batches
    and quantized experts take the dense-dispatch path (moe_mlp)."""
    from jax.sharding import PartitionSpec as P

    from nano_pearl_tpu.parallel.mesh import EP_AXIS

    n, h = x.shape
    ep = mesh.shape.get(EP_AXIS, 1)
    if (
        ep == 1
        or not allow_ragged
        or n < _RAGGED_MIN_ROWS
        or is_quantized(wgate)
        or is_quantized(wup)
        or is_quantized(wdown)
    ):
        return moe_mlp(
            x, router_w, wgate, wup, wdown, top_k, norm_topk_prob,
            valid_num_experts, allow_ragged=allow_ragged and ep == 1,
        )
    router_logits = x @ router_w
    e = router_logits.shape[1]
    e_local = e // ep
    vals, idx = _route_topk(router_logits, top_k, norm_topk_prob, valid_num_experts)
    e_flat = idx.reshape(-1)  # [S]
    s = e_flat.shape[0]
    tok_flat = jnp.repeat(jnp.arange(n, dtype=jnp.int32), top_k)
    order = jnp.argsort(e_flat)
    ts = tok_flat[order]
    ws = vals.reshape(-1)[order]
    group_sizes = jnp.bincount(e_flat, length=e).astype(jnp.int32)
    cum = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(group_sizes).astype(jnp.int32)]
    )  # [E+1]
    tok_iota = jnp.arange(n, dtype=jnp.int32)
    disp = (ts[:, None] == tok_iota[None, :]).astype(x.dtype)  # [S, N]
    xg = disp @ x  # [S, H] replicated

    def body(xg, group_sizes, cum, wg, wu, wd):
        k = jax.lax.axis_index(EP_AXIS)
        start = cum[k * e_local]
        seg = cum[(k + 1) * e_local] - start
        sizes_local = jax.lax.dynamic_slice(group_sizes, (k * e_local,), (e_local,))
        gs = jnp.concatenate([sizes_local, (s - seg)[None]])  # + phantom
        xr = jnp.roll(xg, -start, axis=0)
        zpad = lambda w: jnp.concatenate([w, jnp.zeros_like(w[:1])], axis=0)
        g = jax.lax.ragged_dot(xr, zpad(wg), gs)
        u = jax.lax.ragged_dot(xr, zpad(wu), gs)
        a = jax.nn.silu(g.astype(jnp.float32)).astype(xg.dtype) * u
        o = jax.lax.ragged_dot(a, zpad(wd), gs)  # [S, H]; non-local rows 0
        o = jnp.roll(o, start, axis=0)
        return jax.lax.psum(o, EP_AXIS)

    ep_spec = P(EP_AXIS)
    o = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(P(), P(), P(), ep_spec, ep_spec, ep_spec),
        out_specs=P(),
        axis_names={EP_AXIS},
        check_vma=False,
    )(xg, group_sizes, cum, wgate, wup, wdown)
    comb = jnp.where(ts[None, :] == tok_iota[:, None], ws[None, :], 0.0)
    out = jax.lax.dot_general(
        comb, o.astype(jnp.float32),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return out.astype(x.dtype)


def moe_mlp(
    x: jax.Array,  # [N, H]
    router_w: jax.Array,  # [H, E]
    wgate,  # [E, H, F] (or quant dict)
    wup,  # [E, H, F]
    wdown,  # [E, F, H]
    top_k: int,
    norm_topk_prob: bool,
    valid_num_experts: int | None = None,
    allow_ragged: bool = False,
) -> jax.Array:
    """Sparse-MoE SwiGLU block, exact HF numerics, returns [N, H].

    ``allow_ragged`` (caller guarantees ep_size == 1) switches large-N
    calls to the sorted ragged_dot dispatch; decode and quantized experts
    stay on the dense-dispatch einsums."""
    router_logits = x @ router_w  # [N, E]
    if (
        allow_ragged
        and x.shape[0] >= _RAGGED_MIN_ROWS
        and not is_quantized(wgate)
        and not is_quantized(wup)
        and not is_quantized(wdown)
    ):
        return _moe_mlp_ragged(
            x, router_logits, wgate, wup, wdown, top_k, norm_topk_prob,
            valid_num_experts,
        )
    gates = route(router_logits, top_k, norm_topk_prob, valid_num_experts)
    g = _mm_e(x, wgate)  # [E, N, F]
    u = _mm_e(x, wup)
    a = jax.nn.silu(g.astype(jnp.float32)).astype(x.dtype) * u
    o = _mm_e_down(a, wdown)  # [E, N, H]
    # contract E: under EP this is the ONE cross-shard reduction (psum
    # over the ep axis, inserted by GSPMD)
    return jnp.einsum("ne,enh->nh", gates.astype(x.dtype), o)
