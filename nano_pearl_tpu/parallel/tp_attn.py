"""Tensor-parallel wrappers for the Pallas attention kernels.

GSPMD cannot partition a ``pallas_call`` (it is an opaque custom call),
so under tp > 1 it would all-gather the sharded q/cache operands and run
the kernel replicated on every device — correct but wasting ICI
bandwidth and kernel time. Attention is head-local (each query head
attends only to its own kv head's cache rows; reference shards kv heads
per rank the same way, pearl_model_runner.py:125,134), so the right
partitioning is trivial: ``shard_map`` over the group mesh's ``tp``
axis, each shard running the kernel on its local Hq/t query heads and
Hkv/t cache heads with the (replicated) block tables — zero collectives
inside the body. The output stays head-sharded, feeding the
row-parallel wo matmul whose GSPMD reduce follows as usual.

Composes with the head-dim padding of non-power-of-2 TP (heads already
divide tp after ``ModelConfig.pad_for_tp``). Sequence-parallel groups
use parallel/sp.py instead (block-sharded cache needs the partial-
softmax merge).

pp x tp (round 5): pass ``mesh=None`` to run INSIDE a pipeline stage's
partial-manual shard_map body (parallel/pp.py) — the nested shard_map
picks up the context mesh (pp already manual) and manualizes the
still-auto tp axis around the kernel with the same head shardings;
``vma={"pp"}`` makes the kernel declare its output pp-varying for the
outer body's check_vma.
"""

from __future__ import annotations

import jax
from jax.sharding import PartitionSpec as P

from nano_pearl_tpu.ops.kv_cache import cache_is_quantized
from nano_pearl_tpu.parallel.mesh import TP_AXIS


def _cache_spec(cache):
    # folded cache [L, 2, NB+1, BS, Hkv*D]: tp shards the trailing folded
    # head axis; pad_for_tp guarantees hkv % tp == 0 so each shard gets
    # whole heads (column slices of the folded axis)
    arr_spec = P(None, None, None, None, TP_AXIS)
    if cache_is_quantized(cache):
        return {"q": arr_spec, "s": P(None, None, None, None, TP_AXIS)}
    return arr_spec


def _smap(body, mesh, in_specs, out_specs):
    """shard_map over tp; mesh=None -> context mesh (nested inside a
    pp partial-manual body, see module docstring)."""
    kw = {} if mesh is None else {"mesh": mesh}
    return jax.shard_map(
        body, in_specs=in_specs, out_specs=out_specs,
        axis_names={TP_AXIS}, check_vma=False, **kw,
    )


def tp_paged_attention(
    mesh, q, cache, layer_idx, block_tables, context_lens, scale,
    interpret: bool = False, mono=None, vma=None,
):
    from nano_pearl_tpu.ops.pallas.paged_attention import paged_attention_pallas

    def body(q, cache, layer_idx, bt, cl):
        return paged_attention_pallas(
            q, cache, layer_idx, bt, cl, scale, interpret=interpret,
            mono=mono, vma=vma,
        )

    return _smap(
        body, mesh,
        in_specs=(P(None, TP_AXIS, None), _cache_spec(cache), P(), P(), P()),
        out_specs=P(None, TP_AXIS, None),
    )(q, cache, layer_idx, block_tables, context_lens)


def tp_paged_attention_grouped(
    mesh, q, cache, layer_idx, group_tables, context_lens, scale,
    rows_per_group, interpret: bool = False, mono=None, vma=None,
):
    from nano_pearl_tpu.ops.pallas.paged_attention import (
        paged_attention_pallas_grouped,
    )

    def body(q, cache, layer_idx, bt, cl):
        return paged_attention_pallas_grouped(
            q, cache, layer_idx, bt, cl, scale, rows_per_group,
            interpret=interpret, mono=mono, vma=vma,
        )

    return _smap(
        body, mesh,
        in_specs=(P(None, TP_AXIS, None), _cache_spec(cache), P(), P(), P()),
        out_specs=P(None, TP_AXIS, None),
    )(q, cache, layer_idx, group_tables, context_lens)


def tp_paged_attention_grouped_fresh(
    mesh, q, cache, layer_idx, group_tables, context_lens, ctx0,
    fresh_k, fresh_v, scale, rows_per_group, interpret: bool = False,
    mono=None, vma=None,
):
    """Deferred-write packed verify under tp: fresh K/V rows are
    head-sharded exactly like the cache's folded head axis."""
    from nano_pearl_tpu.ops.pallas.paged_attention import (
        paged_attention_pallas_grouped_fresh,
    )

    def body(q, cache, li, bt, cl, c0, fk, fv):
        return paged_attention_pallas_grouped_fresh(
            q, cache, li, bt, cl, c0, fk, fv, scale, rows_per_group,
            interpret=interpret, mono=mono, vma=vma,
        )

    return _smap(
        body, mesh,
        in_specs=(
            P(None, TP_AXIS, None), _cache_spec(cache), P(), P(), P(), P(),
            P(None, TP_AXIS, None), P(None, TP_AXIS, None),
        ),
        out_specs=P(None, TP_AXIS, None),
    )(q, cache, layer_idx, group_tables, context_lens, ctx0, fresh_k, fresh_v)


def tp_prefill_self_attention(
    mesh, q, k, v, layer_idx, block_tables, q_positions, scale,
    interpret: bool = False, vma=None,
):
    """Fresh-KV flash prefill under tp: fresh k/v rows are head-sharded
    exactly like the cache."""
    from nano_pearl_tpu.ops.pallas.prefill_attention import (
        prefill_self_attention_pallas,
    )

    def body(q, k, v, layer_idx, bt, qp):
        return prefill_self_attention_pallas(
            q, k, v, layer_idx, bt, qp, scale, interpret=interpret, vma=vma
        )

    return _smap(
        body, mesh,
        in_specs=(
            P(None, TP_AXIS, None),
            P(None, TP_AXIS, None),
            P(None, TP_AXIS, None),
            P(), P(), P(),
        ),
        out_specs=P(None, TP_AXIS, None),
    )(q, k, v, layer_idx, block_tables, q_positions)
