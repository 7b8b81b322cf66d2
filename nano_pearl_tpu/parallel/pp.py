"""Pipeline parallelism: decoder layers sharded over a ``pp`` mesh axis.

New capability beyond the reference (SURVEY §2.8: "Pipeline parallelism
— No" there). A model group's mesh gains a ``pp`` axis and every STACKED
layer parameter (leading ``L`` dim) plus the KV cache's layer axis is
sharded over it: each stage holds ``L/pp`` layers' weights and cache, so
model memory scales with ``pp`` while ``tp`` keeps operating inside each
stage (the ``tp`` axis stays GSPMD-auto inside the ``shard_map`` via
``axis_names={"pp"}`` — partial-manual lowering).

Execution model (v1, sequential wavefront):

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

from nano_pearl_tpu.models.transformer import rms_norm, run_layers
from nano_pearl_tpu.ops.kv_cache import write_kv
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
        res = jnp.zeros_like(x)
        rope_rows = rope_table[positions]
        for s in range(pp):
            active = stage == s
            x2, res2, cache = run_layers(
                cfg, params["layers"], cache, x, res, rope_rows,
                jnp.where(active, slots, _VOID_SLOT),
                attn_fn, attn_args, kv_write_fn,
            )
            x = jnp.where(active, x2, x)
            res = jnp.where(active, res2, res)
            if s < pp - 1:
                x = jax.lax.ppermute(x, PP_AXIS, perm)
                res = jax.lax.ppermute(res, PP_AXIS, perm)
        final = (x.astype(jnp.float32) + res.astype(jnp.float32)).astype(x.dtype)
        hidden = rms_norm(final, params["final_ln"], eps)
        return jax.lax.psum(jnp.where(stage == pp - 1, hidden, 0), PP_AXIS), cache

    # stacked layer params + the cache shard their leading (layer) axis
    # over pp; everything else is pp-replicated. tp placement is NOT
    # described here — it stays GSPMD-auto (axis_names only names pp).
    param_spec = {
        "embed": P(),
        "final_ln": P(),
        "lm_head": _spec_leaves(params["lm_head"], P()),
        "layers": _spec_leaves(params["layers"], P(PP_AXIS)),
    }
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
