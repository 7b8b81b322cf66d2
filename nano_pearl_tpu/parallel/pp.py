"""Pipeline parallelism: decoder layers sharded over a ``pp`` mesh axis.

New capability beyond the reference (SURVEY §2.8: "Pipeline parallelism
— No" there). A model group's mesh gains a ``pp`` axis and every STACKED
layer parameter (leading ``L`` dim) plus the KV cache's layer axis is
sharded over it: each stage holds ``L/pp`` layers' weights and cache, so
model memory scales with ``pp`` while ``tp`` keeps operating inside each
stage (the ``tp`` axis stays GSPMD-auto inside the ``shard_map`` via
``axis_names={"pp"}`` — partial-manual lowering).

Two execution models:

- ``pp_forward`` — sequential wavefront for SINGLE forwards (prefill,
  one-step decode, packed verify): memory scaling only, 1/pp bubble.
- ``pp_gamma_rotate`` — microbatch ROTATION for the multi-step decode
  loop (the draft's gamma-scan): the batch splits into pp microbatches
  that chase each other around the stage ring, one step entering the
  pipe per tick per microbatch; in steady state every stage computes
  useful work every tick, so gamma steps cost ~(gamma + 1 - 1/pp) ticks
  of 1/pp-sized work instead of gamma*pp — throughput approaches pp x
  the wavefront for gamma >> pp (tests/test_pp.py measures it).

Wavefront execution model (v1, sequential):

- the activation pair ``(x, res)`` starts at stage 0 (every stage embeds
  the tokens — cheap and replicated), then ``pp`` ticks run: each tick
  every stage runs its layer chunk, but only the wavefront stage's
  result is kept, and ``lax.ppermute`` hands the activations to the next
  stage over ICI.
- off-wavefront stages run on stale activations; their KV writes are
  voided by routing the write slots out of bounds (the scatter's
  ``mode="drop"`` — see ops/kv_cache.write_kv), so the cache stays
  correct without a (bandwidth-hostile) whole-cache select per tick.
- the final hidden is produced on the last stage and ``psum``-broadcast
  so the (pp-replicated) LM head computes logits everywhere.

This schedule is a memory-scaling pipeline: wall-clock matches running
the full stack sequentially (the classic 1/pp bubble — one stage
computes usefully at a time), with TP still parallel inside each stage.
Use it to fit a model that exceeds ``tp``-only HBM, or to cut TP
all-reduce latency at high device counts; throughput-optimal microbatch
rotation is the designed upgrade path (the wavefront loop becomes a
rotation of pp live microbatches).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from nano_pearl_tpu.models.transformer import compute_logits, rms_norm, run_layers
from nano_pearl_tpu.ops.kv_cache import write_kv
from nano_pearl_tpu.ops.sampling import greedy
from nano_pearl_tpu.parallel.mesh import PP_AXIS

# far beyond any cache's flat row count, and safely below int32 overflow
# when the layer-folded base offset is added
_VOID_SLOT = jnp.int32(2**30)


def _spec_leaves(tree, spec):
    return jax.tree.map(lambda _: spec, tree)


def pp_forward(
    mesh,
    cfg,
    params: dict,
    kv_cache,
    tokens: jax.Array,  # [N]
    positions: jax.Array,  # [N]
    slots: jax.Array,  # [N]
    rope_table: jax.Array,
    attn_fn,
    attn_args: tuple,
    kv_write_fn=write_kv,
    moe_fn=None,
    moe_ragged=False,  # static; prefill-only (see transformer.forward)
) -> tuple[jax.Array, jax.Array]:
    """Drop-in replacement for ``models.transformer.forward`` on a
    ``("pp", "tp")`` group mesh (tests/test_pp.py asserts parity)."""
    pp = mesh.shape[PP_AXIS]
    eps = cfg.rms_norm_eps
    perm = [(i, (i + 1) % pp) for i in range(pp)]

    def body(params, cache, tokens, positions, slots, rope_table, attn_args):
        stage = jax.lax.axis_index(PP_AXIS)
        # the embed is replicated over pp; mark the activations as
        # pp-varying up front so the chunk scan's carry types are stable
        # (each stage's layer params make the scan output pp-varying)
        x = jax.lax.pcast(params["embed"][tokens], (PP_AXIS,), to="varying")
        res = jax.lax.pcast(  # f32 residual carry, pp-varying like x
            jnp.zeros(x.shape, jnp.float32), (PP_AXIS,), to="varying"
        )
        rope_rows = rope_table[positions]
        for s in range(pp):
            active = stage == s
            x2, res2, cache = run_layers(
                cfg, params["layers"], cache, x, res, rope_rows,
                jnp.where(active, slots, _VOID_SLOT),
                attn_fn, attn_args, kv_write_fn, moe_fn,
                moe_ragged=moe_ragged,
            )
            x = jnp.where(active, x2, x)
            res = jnp.where(active, res2, res)
            if s < pp - 1:
                x = jax.lax.ppermute(x, PP_AXIS, perm)
                res = jax.lax.ppermute(res, PP_AXIS, perm)
        final = x.astype(jnp.float32) + res
        hidden = rms_norm(final, params["final_ln"], eps, out_dtype=x.dtype)
        return jax.lax.psum(jnp.where(stage == pp - 1, hidden, 0), PP_AXIS), cache

    # stacked layer params + the cache shard their leading (layer) axis
    # over pp; everything else is pp-replicated. tp placement is NOT
    # described here — it stays GSPMD-auto (axis_names only names pp).
    param_spec = _pp_param_spec(params)
    cache_spec = _spec_leaves(kv_cache, P(PP_AXIS))
    return jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(
            param_spec, cache_spec, P(), P(), P(), P(),
            _spec_leaves(attn_args, P()),
        ),
        out_specs=(P(), cache_spec),
        # check_vma must stay ON: partial-manual shard_map (axis_names a
        # strict subset) mis-validates specs against the auto axes when
        # varying-manual-axis checking is disabled
        axis_names={PP_AXIS},
    )(params, kv_cache, tokens, positions, slots, rope_table, attn_args)


def _pp_param_spec(params):
    return {
        "embed": P(),
        "final_ln": P(),
        "lm_head": _spec_leaves(params["lm_head"], P()),
        "layers": _spec_leaves(params["layers"], P(PP_AXIS)),
    }


def pp_gamma_rotate(
    mesh,
    cfg,
    params: dict,
    kv_cache,
    tokens: jax.Array,  # [B] int32 current token per row
    positions: jax.Array,  # [B]
    block_tables: jax.Array,  # [B, M]
    context_lens: jax.Array,  # [B]
    rope_table: jax.Array,
    attn_fn,
    gamma: int,
    block_size: int,
    kv_write_fn=write_kv,
) -> tuple[jax.Array, jax.Array]:
    """The draft's gamma-step greedy decode loop as a microbatch-rotated
    pipeline over the ``pp`` mesh axis (same contract as
    GroupRunner._gamma_impl: returns (toks [gamma, B], kv_cache)).

    Schedule: the batch splits into ``pp`` contiguous microbatches of
    B/pp rows. At tick ``t`` stage ``s`` works on u = t - s: microbatch
    ``u % pp`` at decode step ``u // pp`` (invalid u -> voided compute).
    A microbatch's step r occupies stages 0..pp-1 at ticks
    m + r*pp .. m + r*pp + pp - 1; the last stage samples the next token
    and ``ppermute``s it to stage 0, which embeds it the very next tick
    — so each microbatch re-enters with zero gap and all pp stages stay
    busy in steady state. Total ticks = gamma*pp + pp - 1 of
    (B/pp)-row work vs the wavefront's gamma*pp ticks of B-row work.

    The KV cache stays layer-sharded over pp exactly as in pp_forward;
    each stage writes its own layers' rows for the microbatch it is
    holding, so after a full rotation every (layer, step) cell is
    written exactly once. Startup/drain ticks void their writes via the
    garbage-slot trick (mode="drop" scatter).
    """
    pp = mesh.shape[PP_AXIS]
    b = tokens.shape[0]
    bpad = (-b) % pp
    if bpad:
        # pad to a pp multiple exactly like the host-side bucket padding:
        # garbage tables, ctx 1, token/pos 0
        tokens = jnp.concatenate([tokens, jnp.zeros((bpad,), tokens.dtype)])
        positions = jnp.concatenate([positions, jnp.zeros((bpad,), positions.dtype)])
        context_lens = jnp.concatenate(
            [context_lens, jnp.ones((bpad,), context_lens.dtype)]
        )
        nb1 = (kv_cache["q"] if isinstance(kv_cache, dict) else kv_cache).shape[2]
        block_tables = jnp.concatenate(
            [block_tables, jnp.full((bpad, block_tables.shape[1]), nb1 - 1,
                                    block_tables.dtype)]
        )
    bt_width = block_tables.shape[1]
    n = b + bpad
    mbs = n // pp  # microbatch rows
    eps = cfg.rms_norm_eps
    ring = [(i, (i + 1) % pp) for i in range(pp)]
    last_to_first = [(pp - 1, 0)]
    ticks = gamma * pp + pp - 1

    def body(params, cache, tokens0, positions0, bt, ctx0, rope_table):
        stage = jax.lax.axis_index(PP_AXIS)
        h = params["embed"].shape[-1]
        vary = lambda a: jax.lax.pcast(a, (PP_AXIS,), to="varying")
        x0 = vary(jnp.zeros((mbs, h), params["embed"].dtype))
        tok0 = vary(jnp.zeros((mbs,), jnp.int32))
        toks0 = vary(jnp.zeros((gamma, n), jnp.int32))

        def tick(carry, t):
            cache, x, res, tok_in, toks = carry
            u = t - stage
            m = u % pp  # jnp mod: in [0, pp) for negative u too
            r = u // pp  # floor division
            valid = (u >= 0) & (r < gamma)
            rr = jnp.maximum(r, 0)
            start = m * mbs
            pos_m = jax.lax.dynamic_slice(positions0, (start,), (mbs,)) + rr
            ctx_m = jax.lax.dynamic_slice(ctx0, (start,), (mbs,)) + rr
            bt_m = jax.lax.dynamic_slice(bt, (start, 0), (mbs, bt_width))
            toks0_m = jax.lax.dynamic_slice(tokens0, (start,), (mbs,))

            # stage 0 embeds the microbatch's entering token (the initial
            # token at step 0, else the token sampled by the last stage
            # one tick ago); later stages continue the incoming (x, res)
            tok_cur = jnp.where(r == 0, toks0_m, tok_in)
            first = stage == 0
            x_in = jnp.where(first, params["embed"][tok_cur].astype(x.dtype), x)
            res_in = jnp.where(first, jnp.zeros_like(res), res)  # res: f32

            slot_m = (
                jnp.take_along_axis(bt_m, (pos_m // block_size)[:, None], axis=1)[:, 0]
                * block_size
                + pos_m % block_size
            )
            # void startup/drain ticks AND internally-padded rows (b was
            # rounded up to a pp multiple) — neither may touch the cache
            row_ok = start + jnp.arange(mbs, dtype=jnp.int32) < b
            slot_m = jnp.where(valid & row_ok, slot_m, _VOID_SLOT)
            x2, res2, cache = run_layers(
                cfg, params["layers"], cache, x_in, res_in, rope_table[pos_m],
                slot_m, attn_fn, (bt_m, ctx_m), kv_write_fn,
            )

            # the last stage finishes the step: final norm, lm head, greedy
            final = x2.astype(jnp.float32) + res2
            hidden = rms_norm(final, params["final_ln"], eps, out_dtype=x2.dtype)
            nxt = greedy(compute_logits(cfg, params, hidden))  # [mbs]
            emit = valid & (stage == pp - 1)
            cur = jax.lax.dynamic_slice(toks, (rr, start), (1, mbs))
            toks = jax.lax.dynamic_update_slice(
                toks, jnp.where(emit, nxt[None, :], cur), (rr, start)
            )

            x_nxt = jax.lax.ppermute(x2, PP_AXIS, ring)
            res_nxt = jax.lax.ppermute(res2, PP_AXIS, ring)
            tok_nxt = jax.lax.ppermute(
                jnp.where(emit, nxt, 0), PP_AXIS, last_to_first
            )
            return (cache, x_nxt, res_nxt, tok_nxt, toks), None

        (cache, _, _, _, toks), _ = jax.lax.scan(
            tick,
            (cache, x0,
             jax.lax.pcast(jnp.zeros(x0.shape, jnp.float32), (PP_AXIS,), to="varying"),
             tok0, toks0),
            jnp.arange(ticks, dtype=jnp.int32),
        )
        # toks is only populated on the last stage
        toks = jax.lax.psum(jnp.where(stage == pp - 1, toks, 0), PP_AXIS)
        return toks, cache

    cache_spec = _spec_leaves(kv_cache, P(PP_AXIS))
    toks, kv_cache = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(_pp_param_spec(params), cache_spec, P(), P(), P(), P(), P()),
        out_specs=(P(), cache_spec),
        axis_names={PP_AXIS},  # check_vma stays ON (see pp_forward)
    )(params, kv_cache, tokens, positions, block_tables, context_lens, rope_table)
    return toks[:, :b], kv_cache


def manual_tp_attn(mesh, fn):
    """Wrap an attention callable for use INSIDE the pp partial-manual
    shard_map body: the tp axis there is still GSPMD-auto and Mosaic
    kernels refuse auto axes ("cannot be automatically partitioned"), so
    the wrapper manualizes it around the kernel call. pp x tp>1 keeps
    the jnp attention paths (engine/runner gates use_pallas off), so tp
    is size 1 here and every operand is trivially replicated over it."""
    assert mesh.shape["tp"] == 1, "manual_tp_attn is a pp-with-tp==1 shim"

    def wrapped(*args, **kw):
        from functools import partial as _partial

        f = _partial(fn, **kw) if kw else fn  # static kwargs (rows_per_group)
        specs = jax.tree.map(lambda _: P(), args)
        # mesh omitted: the nested shard_map picks up the CONTEXT mesh
        # (pp already manual) — passing the concrete mesh would clash
        # with its Manual axis types
        return jax.shard_map(
            f, in_specs=specs, out_specs=P(),
            axis_names={"tp"}, check_vma=False,
        )(*args)

    return wrapped
