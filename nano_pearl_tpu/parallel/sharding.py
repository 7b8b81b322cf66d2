"""GSPMD sharding specs for model parameters and KV caches.

TPU-native replacement for the reference's torch TP layer zoo
(reference: nano_pearl/layers/linear.py, embed_head.py). Instead of
Column/Row/QKV/MergedColumn parallel modules with explicit NCCL
all-reduces, every parameter carries a ``PartitionSpec`` over the group
mesh's ``tp`` axis and XLA inserts the collectives:

- wq/wk/wv, wgate/wup: output-dim sharded  (ColumnParallelLinear, linear.py:67-150)
- wo, wdown:           input-dim sharded   (RowParallelLinear,    linear.py:153-178;
                       the trailing all-reduce becomes a GSPMD reduce)
- embed / lm_head:     vocab-dim sharded   (VocabParallelEmbedding / ParallelLMHead,
                       embed_head.py:11-75; the masked-embed all-reduce and
                       the logits gather become GSPMD collectives)
- norms, rope tables:  replicated

Non-power-of-2 TP needs no special casing here: dims were padded to
divide ``tp`` in ``ModelConfig.pad_for_tp`` (reference: pearl_config.py:37-67).
"""

from __future__ import annotations

from jax.sharding import NamedSharding, PartitionSpec as P

from nano_pearl_tpu.config import ModelConfig
from nano_pearl_tpu.parallel.mesh import TP_AXIS, GroupMesh


def param_specs(cfg: ModelConfig, pp: bool = False) -> dict:
    """PartitionSpec pytree matching ``models.transformer.init_params``.
    With ``pp``, every stacked layer leaf additionally shards its leading
    (layer) axis over the pipeline axis (parallel/pp.py)."""
    t = TP_AXIS
    layers = {
        "input_ln": P(),
        "wq": P(None, None, t),
        "wk": P(None, None, t),
        "wv": P(None, None, t),
        "wo": P(None, t, None),
        "post_ln": P(),
    }
    if cfg.is_moe:
        # experts shard over `ep` on their stacked E axis, per-expert FFN
        # over `tp` — the gate-weighted combine's E contraction becomes
        # one GSPMD psum over ep (ops/moe.py). The ep axis only exists in
        # the mesh when the group was built with ep > 1.
        from nano_pearl_tpu.parallel.mesh import EP_AXIS

        e = EP_AXIS if cfg.ep_size > 1 else None
        layers.update({
            "router": P(),
            "wgate": P(None, e, None, t),
            "wup": P(None, e, None, t),
            "wdown": P(None, e, t, None),
        })
    else:
        layers.update({
            "wgate": P(None, None, t),
            "wup": P(None, None, t),
            "wdown": P(None, t, None),
        })
    if cfg.qkv_bias:
        layers.update({"bq": P(None, t), "bk": P(None, t), "bv": P(None, t)})
    if cfg.qk_norm:
        layers.update({"q_norm": P(), "k_norm": P()})
    lm_head = P(t, None)
    if cfg.quant:
        # quantized leaves: {"q": int8/e4m3 like the original, "s": per-out-
        # channel scale with the contraction dim collapsed to 1 — so the
        # scale shards on the OUT dim only (replicated for row-parallel
        # weights whose out dim is unsharded)
        from nano_pearl_tpu.ops.quant import QUANTIZED_LAYER_KEYS

        col_scale = P(None, None, t)  # [L, 1, out-sharded]
        row_scale = P()  # [L, 1, H] replicated
        for k in QUANTIZED_LAYER_KEYS:
            spec = layers[k]
            if cfg.is_moe and k in ("wgate", "wup", "wdown"):
                # expert scales keep the E axis: [L, E, 1, out]
                ep_ax = spec[1]
                s = P(None, ep_ax, None, t if k != "wdown" else None)
            else:
                s = row_scale if k in ("wo", "wdown") else col_scale
            layers[k] = {"q": spec, "s": s}
        if not cfg.tie_word_embeddings:
            lm_head = {"q": lm_head, "s": P(t, None)}  # scale [V, 1]
    if pp:
        from nano_pearl_tpu.parallel.mesh import PP_AXIS
        import jax

        layers = jax.tree.map(
            lambda s: P(PP_AXIS, *s[1:]),
            layers,
            is_leaf=lambda x: isinstance(x, P),
        )
    return {
        "embed": P(t, None),
        "layers": layers,
        "final_ln": P(),
        "lm_head": lm_head,
    }


def param_shardings(cfg: ModelConfig, gmesh: GroupMesh) -> dict:
    import jax

    return jax.tree.map(
        lambda spec: NamedSharding(gmesh.mesh, spec),
        param_specs(cfg, pp=gmesh.pp_size > 1),
        is_leaf=lambda x: isinstance(x, P),
    )


def kv_cache_spec(sp: bool = False, pp: bool = False) -> P:
    """KV cache layout [L, 2, num_blocks, block_size, n_kv_heads*head_dim],
    tp-sharded over the FOLDED trailing head axis (each shard owns whole
    heads' cache — pad_for_tp guarantees hkv %% tp == 0; reference:
    pearl_model_runner.py:125,134 shards kv heads per rank); under
    sequence parallelism additionally over the block axis (parallel/sp.py);
    under pipeline parallelism over the layer axis (parallel/pp.py)."""
    from nano_pearl_tpu.parallel.mesh import PP_AXIS, SP_AXIS

    return P(
        PP_AXIS if pp else None,
        None,
        SP_AXIS if sp else None,
        None,
        TP_AXIS,
    )


def kv_cache_sharding(gmesh: GroupMesh, quant: str | None = None):
    from nano_pearl_tpu.parallel.mesh import PP_AXIS, SP_AXIS

    sp = gmesh.sp_size > 1
    pp = gmesh.pp_size > 1
    if quant in ("int8", "fp8"):
        return {
            "q": NamedSharding(gmesh.mesh, kv_cache_spec(sp, pp)),
            # scales drop the head_dim axis
            "s": NamedSharding(
                gmesh.mesh,
                P(
                    PP_AXIS if pp else None,
                    None,
                    SP_AXIS if sp else None,
                    None,
                    TP_AXIS,
                ),
            ),
        }
    return NamedSharding(gmesh.mesh, kv_cache_spec(sp, pp))
