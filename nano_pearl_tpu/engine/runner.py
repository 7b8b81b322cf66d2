"""Per-group device runner: compiled programs + device state.

TPU-native replacement for the reference's per-GPU worker processes
(reference: nano_pearl/pearl_engine/pearl_model_runner.py). One
``GroupRunner`` owns a model group's parameters, paged KV cache and
jit-compiled step programs on that group's sub-mesh; there is no RPC —
the PEARL orchestrator (engine/pearl.py) calls both runners from the
single controller and relies on JAX async dispatch for cross-group
overlap.

CUDA-graph capture per batch bucket (reference: :264-301) becomes
jit-compilation per static shape bucket; the per-token gamma-loop of the
draft (reference: :492-507, one Python iteration + graph replay per
token) becomes ONE compiled ``lax.scan`` over gamma decode steps, so a
full draft round is a single dispatch.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from nano_pearl_tpu.config import ModelConfig, PearlConfig
from nano_pearl_tpu.engine.sequence import SeqView
from nano_pearl_tpu.models.transformer import (
    compute_logits,
    forward,
    init_params,
    make_rope_table,
)
from nano_pearl_tpu.ops.attention import (
    gather_prefix_kv,
    paged_attention,
    paged_attention_grouped,
    prefill_attention_jnp,
    prefill_prefix_attention_jnp,
    prefill_self_attention,
)
from nano_pearl_tpu.ops.kv_cache import make_kv_cache, write_kv
from nano_pearl_tpu.ops.sampling import apply_top_k_top_p, greedy, sample
from nano_pearl_tpu.ops.verify import verify_verdict
from nano_pearl_tpu.parallel.mesh import GroupMesh
from nano_pearl_tpu.parallel.sharding import kv_cache_sharding, param_shardings
from nano_pearl_tpu.utils.loader import load_params
from nano_pearl_tpu.utils.logging import logger

_DEFAULT_CPU_BLOCKS = 512


def next_pow2(n: int) -> int:
    return 1 << max(0, (n - 1).bit_length())


class GroupRunner:
    def __init__(
        self,
        pcfg: PearlConfig,
        mcfg: ModelConfig,
        gmesh: GroupMesh,
        *,
        params: dict | None = None,
        seed: int = 0,
    ):
        self.pcfg = pcfg
        self.cfg = mcfg
        self.gmesh = gmesh
        self.name = gmesh.name
        self.block_size = pcfg.kvcache_block_size
        self.scale = mcfg.head_dim**-0.5
        # Pallas kernels keyed off the platform this group ACTUALLY runs
        # on (may differ from jax.default_backend(): e.g. a CPU dry-run
        # mesh while a TPU plugin owns the default backend)
        from nano_pearl_tpu.ops.pallas import attention_enabled

        self.use_pallas = attention_enabled(
            next(iter(gmesh.mesh.devices.flat)).platform
        )
        # Kernel-schedule profile (config.PearlConfig.perf_profile),
        # resolved ONCE here — explicit env vars override, but nothing is
        # ever written back to os.environ, so engines with different
        # profiles coexist in one process.
        import os as _os

        _env_mono = _os.environ.get("NANO_PEARL_MONO")
        self.use_mono = (
            (_env_mono == "1")
            if _env_mono is not None
            else pcfg.perf_profile == "throughput"
        )
        _env_dv = _os.environ.get("NANO_PEARL_DEFERRED_VERIFY")
        self._deferred_requested = (
            (_env_dv == "1")
            if _env_dv is not None
            else pcfg.perf_profile == "throughput"
        )
        # Verify sequence-group chunk cap (classic path only): split the
        # packed verify into <=cap-group chunks so its GEMMs run at the
        # M in [8, 224] schedule class that matches the decode stream
        # bitwise (the 448-row shape is its own class and seeds the
        # bs=32 ceiling leak, probe_ceiling_divergence2). 0 = off.
        _env_cap = _os.environ.get("NANO_PEARL_VERIFY_GROUP_CAP")
        self._verify_group_cap = (
            int(_env_cap) if _env_cap is not None else pcfg.verify_group_cap
        )
        # Ragged MoE dispatch in the PACKED VERIFY: the dense-everywhere
        # rule exists so decode (gamma-scan) and verify share one dispatch
        # flavor at the bitwise ceiling (docs/DESIGN.md §8) — under the
        # 'throughput' profile acceptance is set by real model divergence,
        # so large verifies keep the faster sorted-ragged path (advisor r4)
        self._moe_ragged_verify = pcfg.perf_profile == "throughput"
        # Split-boundary unified schedule (round 5): deferred-write verify
        # (windowed-DUS writeback, no per-layer scatter) whose flash cell
        # partition bitwise-matches the split gamma-scan decode — the
        # bitwise ceiling at deferred speed (ops/pallas/paged_attention
        # _kernel_db_split / _grouped_kernel_db_fresh_split; on-chip
        # compiled validation maxdiff 0.0, tests/test_split_schedule.py).
        # db kernel generation only; single-shard meshes, unquantized
        # lane-aligned caches. NANO_PEARL_SPLIT=0/1 overrides.
        _env_sp = _os.environ.get("NANO_PEARL_SPLIT")
        _hkv_aligned = (
            mcfg.num_key_value_heads // gmesh.tp_size * mcfg.head_dim
        ) % 128 == 0
        # default OFF: measured on v5e at bs=32 gamma=14, split+vcap16 is
        # 3.568x / MAT 13.79 vs classic's 3.66x / 14.0 — the in-kernel
        # per-group fresh updates (~1.5us x groups x layers) eat the
        # scatter savings and a rare (~0.5%/round-row) leak remains
        # (chiplog 20 runs C-F, chiplog 24). NANO_PEARL_SPLIT=1 enables.
        self._split_schedule = (
            ((_env_sp == "1") if _env_sp is not None else False)
            and self.use_pallas
            and not self.use_mono
            and gmesh.tp_size == 1
            and gmesh.pp_size == 1
            and gmesh.sp_size == 1
            and mcfg.kv_quant is None
            and _hkv_aligned
        )

        # Disjoint multi-host placement: a controller whose process owns
        # none of this group's devices builds the runner WITHOUT weights
        # or KV cache (it cannot place arrays on remote-only meshes and
        # never dispatches this group's programs — the orchestrator gates
        # on ownership and receives this group's outputs via
        # parallel/distributed.sync_from).
        from nano_pearl_tpu.parallel.distributed import mesh_is_local

        self.is_local = mesh_is_local(gmesh.mesh)

        shardings = param_shardings(mcfg, gmesh) if self.is_local else None
        if not self.is_local:
            self.params = None
        elif params is not None:
            if mcfg.quant and not isinstance(params["layers"]["wq"], dict):
                # caller handed plain weights but the config asks for
                # weight-only quantization: quantize on device
                from nano_pearl_tpu.ops.quant import QUANTIZED_LAYER_KEYS, quantize_weight

                def _quantize(p):
                    p = dict(p, layers=dict(p["layers"]))
                    for k in QUANTIZED_LAYER_KEYS:
                        p["layers"][k] = quantize_weight(p["layers"][k], mcfg.quant)
                    if not mcfg.tie_word_embeddings:
                        p["lm_head"] = quantize_weight(
                            p["lm_head"], mcfg.quant, contract_axis=-1
                        )
                    return p

                with gmesh.mesh:
                    self.params = jax.jit(_quantize, out_shardings=shardings)(params)
            else:
                self.params = jax.device_put(params, shardings)
        elif mcfg.model_path:
            self.params = load_params(mcfg, mcfg.model_path, shardings)
        else:
            logger.warning(f"[{self.name}] no checkpoint path; random-initializing weights")
            with gmesh.mesh:
                self.params = jax.jit(
                    lambda s: init_params(mcfg, jax.random.key(s)),
                    out_shardings=shardings,
                )(np.int64(seed))
        if self.is_local and mcfg.fuse_proj and not mcfg.is_moe and gmesh.pp_size == 1:
            # fused qkv / gate|up projections (ModelConfig.fuse_proj):
            # concat on device with the donated separate weights freed
            from jax.sharding import NamedSharding, PartitionSpec as P

            from nano_pearl_tpu.models.transformer import fuse_projections
            from nano_pearl_tpu.parallel.mesh import TP_AXIS

            col = NamedSharding(gmesh.mesh, P(None, None, TP_AXIS))
            lsh = {
                k: v
                for k, v in shardings["layers"].items()
                if k not in ("wq", "wk", "wv", "wgate", "wup", "bq", "bk", "bv")
            }
            lsh["wqkv"] = {"q": col, "s": col} if mcfg.quant else col
            lsh["wgu"] = {"q": col, "s": col} if mcfg.quant else col
            if mcfg.qkv_bias:
                lsh["bqkv"] = NamedSharding(gmesh.mesh, P(None, TP_AXIS))
            with gmesh.mesh:
                fused_layers = jax.jit(
                    fuse_projections, out_shardings=lsh, donate_argnums=0
                )(self.params["layers"])
            self.params = dict(self.params, layers=fused_layers)
        self.rope_table = (
            jax.device_put(make_rope_table(mcfg), gmesh.replicated)
            if self.is_local
            else None
        )

        # Pipeline parallelism: layer-sharded forward via shard_map
        # (parallel/pp.py); the plain forward otherwise. Picked ONCE here
        # so every program builder below is agnostic.
        self.pp_size = gmesh.pp_size
        if self.pp_size > 1:
            from nano_pearl_tpu.parallel.pp import pp_forward

            assert mcfg.num_hidden_layers % self.pp_size == 0, (
                f"[{self.name}] num_hidden_layers={mcfg.num_hidden_layers} "
                f"must divide pp={self.pp_size}"
            )
            self._forward = partial(pp_forward, gmesh.mesh)
            # attention runs on each stage's LOCAL layer chunk inside the
            # partial-manual shard_map body. The Pallas kernels are
            # layer-chunk-agnostic (layer-folded offsets are computed
            # from the local cache shard) so pp-only groups keep them.
            # Round-4: pp-only (tp==1) keeps the kernels via the
            # manual_tp_attn shim; round-5: pp x tp nests the REAL tp
            # shard_map wrappers inside the partial-manual body
            # (parallel/tp_attn.py with mesh=None -> context mesh), so
            # use_pallas is never forced off by axis composition.
        else:
            self._forward = forward
        if mcfg.is_moe and gmesh.ep_size > 1:
            # EP-sharded ragged MoE dispatch needs the mesh (shard_map
            # over the ep axis, ops/moe.moe_mlp_ep); bind it once so
            # every program builder below is agnostic
            from nano_pearl_tpu.ops.moe import moe_mlp_ep

            _mesh = gmesh.mesh

            def _moe_fn(h2, lp, moe_ragged=False):
                return moe_mlp_ep(
                    _mesh, h2, lp["router"], lp["wgate"], lp["wup"],
                    lp["wdown"], mcfg.num_experts_per_tok,
                    mcfg.norm_topk_prob, mcfg.valid_num_experts,
                    allow_ragged=moe_ragged,
                )

            self._forward = partial(self._forward, moe_fn=_moe_fn)

        # Sequence parallelism: sp-sharded KV + shard_map attention
        # (parallel/sp.py); plain paths otherwise. The attention flavor
        # and write path are picked ONCE here so every program builder
        # below is agnostic.
        self.sp_size = gmesh.sp_size
        if self.sp_size > 1:
            from nano_pearl_tpu.parallel.sp import (
                sp_paged_attention,
                sp_paged_attention_grouped,
                sp_prefill_attention,
                sp_write_kv,
            )

            mesh = gmesh.mesh
            # pp x sp composition (round-4): inside the pp partial-manual
            # body the sp wrappers run as NESTED shard_maps over the
            # remaining (sp, tp) axes
            nested = self.pp_size > 1
            self._attn_decode = partial(
                sp_paged_attention, mesh, scale=self.scale,
                use_pallas=self.use_pallas, nested=nested,
            )  # SP uses the partials kernels (no mono/db split there)
            self._attn_prefill = partial(
                sp_prefill_attention, mesh, scale=self.scale, nested=nested
            )
            self._attn_grouped = partial(
                sp_paged_attention_grouped, mesh, scale=self.scale,
                use_pallas=self.use_pallas, nested=nested,
            )
            self._kv_write = partial(sp_write_kv, mesh, nested=nested)
        elif self.use_pallas and gmesh.tp_size > 1:
            # Pallas kernels under tp: GSPMD cannot partition the opaque
            # pallas_call (it would all-gather and replicate it), but
            # attention is head-local — shard_map over tp runs each
            # shard's kernel on its local heads (parallel/tp_attn.py)
            from nano_pearl_tpu.parallel.tp_attn import (
                tp_paged_attention,
                tp_paged_attention_grouped,
            )

            # pp x tp (round-5): inside the pp partial-manual body the
            # tp axis is still GSPMD-auto — mesh=None makes the wrapper's
            # nested shard_map pick up the context mesh and manualize tp
            # around the kernel; vma declares the output pp-varying for
            # the outer body's check_vma
            nested = self.pp_size > 1
            mesh = None if nested else gmesh.mesh
            _vma = frozenset({"pp"}) if nested else None
            self._attn_decode = partial(
                tp_paged_attention, mesh, scale=self.scale,
                mono=self.use_mono, vma=_vma,
            )
            self._attn_prefill = partial(prefill_attention_jnp, scale=self.scale)
            self._attn_grouped = partial(
                tp_paged_attention_grouped, mesh, scale=self.scale,
                mono=self.use_mono, vma=_vma,
            )
            from nano_pearl_tpu.ops.kv_cache import write_fresh
            from nano_pearl_tpu.parallel.tp_attn import (
                tp_paged_attention_grouped_fresh,
            )

            self._grouped_fresh = partial(
                tp_paged_attention_grouped_fresh, mesh, scale=self.scale,
                mono=self.use_mono, vma=_vma,
            )
            # jnp scatter writeback (GSPMD partitions it over the cache's
            # tp-sharded trailing dim); see ops/kv_cache.write_fresh for
            # why the Pallas DMA twin is parked
            self._write_fresh = write_fresh
            self._kv_write = write_kv
        else:
            # kernels inside a pipeline stage run under a partial-manual
            # shard_map: their outputs must declare the pp axis varying
            _vma = frozenset({"pp"}) if self.pp_size > 1 else None
            self._attn_decode = partial(
                paged_attention, scale=self.scale, use_pallas=self.use_pallas,
                mono=self.use_mono, vma=_vma,
            )
            self._attn_prefill = partial(prefill_attention_jnp, scale=self.scale)
            self._attn_grouped = partial(
                paged_attention_grouped, scale=self.scale,
                use_pallas=self.use_pallas, mono=self.use_mono, vma=_vma,
            )
            from nano_pearl_tpu.ops.attention import paged_attention_grouped_fresh
            from nano_pearl_tpu.ops.kv_cache import write_fresh

            self._grouped_fresh = partial(
                paged_attention_grouped_fresh, scale=self.scale,
                use_pallas=self.use_pallas, mono=self.use_mono,
                split=self._split_schedule,
            )
            self._write_fresh = partial(write_fresh, use_pallas=self.use_pallas)
            self._kv_write = write_kv
        if self._split_schedule:
            from nano_pearl_tpu.ops.attention import paged_attention_split

            # draft gamma-scan decode on the split schedule (same cell
            # partition as the deferred verify); AR/pre-verify decode
            # keeps the plain kernel (self-consistent streams)
            self._attn_decode_split = partial(
                paged_attention_split, scale=self.scale,
                use_pallas=self.use_pallas,
            )
        else:
            self._attn_decode_split = None
        # fresh-KV prefill self-attention (no cache READ — valid whenever
        # no admitted sequence has prefix-cache hits; cache-free, so it
        # composes with sp/pp/union unchanged)
        if self.use_pallas and gmesh.tp_size > 1 and gmesh.sp_size == 1:
            from nano_pearl_tpu.parallel.tp_attn import tp_prefill_self_attention

            self._attn_prefill_self = partial(
                tp_prefill_self_attention,
                None if self.pp_size > 1 else gmesh.mesh,
                scale=self.scale,
                vma=frozenset({"pp"}) if self.pp_size > 1 else None,
            )
        else:
            self._attn_prefill_self = partial(
                prefill_self_attention, scale=self.scale,
                use_pallas=self.use_pallas,
                vma=frozenset({"pp"}) if self.pp_size > 1 else None,
            )
        self._attn_prefill_self.wants_fresh_kv = True
        if (
            self.pp_size > 1 and self.use_pallas and self.sp_size == 1
            and gmesh.tp_size == 1
        ):
            # Mosaic kernels inside the pp partial-manual body need the
            # remaining (size-1) tp axis manualized (parallel/pp.py);
            # tp > 1 already nests the real tp wrappers above
            from nano_pearl_tpu.parallel.pp import manual_tp_attn

            self._attn_decode = manual_tp_attn(gmesh.mesh, self._attn_decode)
            self._attn_grouped = manual_tp_attn(gmesh.mesh, self._attn_grouped)
            aps = manual_tp_attn(gmesh.mesh, self._attn_prefill_self)
            aps.wants_fresh_kv = True
            self._attn_prefill_self = aps
        # prefix-hit prefill: fresh-KV self-attention merged with a
        # PRE-GATHERED cached prefix (no cache read inside the layer scan
        # either — see _prefill_prefix_impl); plain meshes only
        self._attn_prefill_prefix = partial(
            prefill_prefix_attention_jnp, scale=self.scale
        )
        self._attn_prefill_prefix.wants_fresh_kv = True
        # Pallas paged-prefix prefill (round-4): flash directly over the
        # cached pages + the fresh causal window — no [L, B, S_pre, Hkv,
        # D] prefix pre-gather at all. Single-shard meshes with the
        # lane-aligned folded head axis and an unquantized cache.
        self._prefix_kernel_ok = (
            self.use_pallas
            and gmesh.tp_size == 1
            and self.sp_size == 1
            and self.pp_size == 1
            and mcfg.kv_quant is None
            and (mcfg.num_key_value_heads * mcfg.head_dim) % 128 == 0
        )
        if self._prefix_kernel_ok:
            from nano_pearl_tpu.ops.pallas.prefill_attention import (
                prefill_prefix_attention_pallas,
            )

            def _prefix_attn(q, k, v, cache, li, bt_pre, nc, nn):
                return prefill_prefix_attention_pallas(
                    q, k, v, cache, li, bt_pre, nc, nn, None, self.scale
                )

            _prefix_attn.wants_fresh_and_cache = True
            self._attn_prefill_prefix_pallas = _prefix_attn

        self.num_blocks = self._decide_num_blocks(pcfg, mcfg) if self.is_local else 0
        if self.sp_size > 1:
            # the cache's block axis (num_blocks + 1 garbage block) is
            # sharded over sp — round down so it divides evenly
            self.num_blocks = max(
                self.sp_size - 1,
                (self.num_blocks + 1) // self.sp_size * self.sp_size - 1,
            )
        from nano_pearl_tpu.parallel import distributed as dist

        if dist.is_multihost() and not dist.mesh_spans_all(gmesh.mesh):
            # disjoint-across-hosts placement: every controller's
            # replicated scheduler needs the SAME block count, but only
            # owners can read device memory stats — take the owner's
            # value (a one-time init collective; all processes construct
            # their runners in the same order)
            self.num_blocks = int(
                dist.sync_from(
                    dist.owner_process(gmesh.mesh),
                    np.int64(self.num_blocks),
                )
            )
        if self.is_local:
            self.kv = make_kv_cache(
                mcfg.num_hidden_layers,
                self.num_blocks,
                self.block_size,
                mcfg.num_key_value_heads,
                mcfg.head_dim,
                dtype=jnp.dtype(mcfg.dtype),
                sharding=kv_cache_sharding(gmesh, mcfg.kv_quant),
                quant=mcfg.kv_quant,
                tp=gmesh.tp_size,
            )
            kv_bytes = sum(a.nbytes for a in jax.tree.leaves(self.kv))
            logger.info(
                f"[{self.name}] kv cache: {self.num_blocks} blocks x {self.block_size} tokens "
                f"({kv_bytes / 2**30:.2f} GiB global"
                + (f", {mcfg.kv_quant}" if mcfg.kv_quant else "") + ")",
                color="green",
            )
        else:
            self.kv = None
            logger.info(
                f"[{self.name}] remote group ({self.num_blocks} blocks tracked, "
                "no local devices)",
                color="yellow",
            )
        self.garbage_block = self.num_blocks  # extra block appended by make_kv_cache

        # Deferred-write packed verify (ops/attention.paged_attention_
        # grouped_fresh + ops/kv_cache.write_fresh): fresh K/V collected
        # in-operand during the layer scan, cache written back ONCE after
        # it. Removes the per-layer XLA row scatter — which costs
        # ~80 ns/ROW inside real programs however it is batched or
        # fenced (~2.9 ms of the bench verify forward;
        # tools/probe_kv_write3.py) — in favor of the windowed-DUS
        # writeback (ops/kv_cache.write_fresh_windows, bulk-DMA speed).
        # Wall-clock it wins (~1.1 ms/round at bench shapes), but its
        # different fp schedule costs MORE in layer-share bitwise-
        # ceiling acceptance (MAT 12.43 -> 11.18, net -4% headline), so
        # under Pallas it is part of the 'throughput' perf_profile
        # (NANO_PEARL_DEFERRED_VERIFY overrides; resolved once at init,
        # see self._deferred_requested) — realistic-acceptance workloads
        # where MAT is set by genuine model divergence are the target.
        # jnp backends keep it on (same numerics class as their grouped
        # path, suite-tested).
        import os as _os

        hkv_local = mcfg.num_key_value_heads // gmesh.tp_size
        _deferred_ok_pallas = (
            (hkv_local * mcfg.head_dim) % 128 == 0
            and (self._deferred_requested or self._split_schedule)
        )
        self._deferred_verify = (
            self.pp_size == 1
            and self.sp_size == 1
            and mcfg.kv_quant is None
            and (not self.use_pallas or _deferred_ok_pallas)
        )
        self._verify_rowwise = (
            _os.environ.get("NANO_PEARL_VERIFY_ROWWISE", "0") == "1"
        )
        if self._verify_rowwise:
            self._deferred_verify = False

        # params and rope are explicit jit arguments: closure-captured
        # jax Arrays would be inlined into the HLO as constants
        self._jit_prefill = jax.jit(self._prefill_impl, donate_argnums=2)
        self._jit_prefill_self = jax.jit(self._prefill_self_impl, donate_argnums=2)
        self._jit_prefill_prefix = jax.jit(
            self._prefill_prefix_impl, donate_argnums=2, static_argnames="m_pre"
        )
        self._jit_decode = jax.jit(self._decode_impl, donate_argnums=2)
        self._jit_gamma = jax.jit(self._gamma_impl, donate_argnums=2, static_argnames="gamma")
        self._jit_verify_fwd = jax.jit(self._verify_fwd_impl, donate_argnums=2)
        self._jit_verdict = jax.jit(
            self._verdict_impl, static_argnames=("gamma", "greedy_only", "filtered")
        )
        self._jit_sample = jax.jit(
            self._sample_impl, static_argnames=("greedy_only", "filtered")
        )

    # ------------------------------------------------------------------ setup

    def _decide_num_blocks(self, pcfg: PearlConfig, mcfg: ModelConfig) -> int:
        if pcfg.num_kvcache_blocks > 0:
            return pcfg.num_kvcache_blocks
        # Derive from per-device free HBM like the reference's
        # allocate_kv_cache (pearl_model_runner.py:119-133).
        dev = self.gmesh.mesh.devices.flat[0]
        stats = None
        try:
            stats = dev.memory_stats()
        except Exception:
            pass
        if not stats or "bytes_limit" not in stats:
            return _DEFAULT_CPU_BLOCKS
        free = stats["bytes_limit"] * pcfg.hbm_utilization - stats.get("bytes_in_use", 0)
        if mcfg.kv_quant in ("int8", "fp8"):
            from nano_pearl_tpu.ops.kv_cache import kv_scale_stride

            stride = kv_scale_stride(mcfg.num_key_value_heads, self.gmesh.tp_size)
            # 1-byte values + bf16 strided scales (kv_scale_stride)
            per_slot = mcfg.num_key_value_heads * (mcfg.head_dim + 2 * stride)
        else:
            per_slot = (
                mcfg.num_key_value_heads * mcfg.head_dim
                * jnp.dtype(mcfg.dtype).itemsize
            )
        block_bytes = mcfg.num_hidden_layers * 2 * self.block_size * per_slot
        # cache is sharded over kv heads (tp), blocks (sp) AND layers
        # (pp): global capacity scales with the whole group
        num = int(
            free * self.gmesh.tp_size * self.gmesh.sp_size * self.gmesh.pp_size
        ) // block_bytes
        assert num > 0, f"[{self.name}] not enough HBM for any KV block"
        return num

    # --------------------------------------------------------------- programs

    def _prefill_impl(self, params, rope, kv, tokens, positions, slots, block_tables, q_positions, sel_rows):
        """Flat [B*Lq] prefill; returns logits at each sequence's last row
        (reference: prefill path of run_model + ParallelLMHead last-token
        gather, embed_head.py:66-68)."""
        hidden, kv = self._forward(
            self.cfg, params, kv, tokens, positions, slots, rope,
            self._attn_prefill, (block_tables, q_positions),
            kv_write_fn=self._kv_write, moe_ragged=True,
        )
        return kv, compute_logits(self.cfg, params, hidden[sel_rows])

    def _prefill_self_impl(self, params, rope, kv, tokens, positions, slots, block_tables, q_positions, sel_rows):
        """Prefill variant for batches with NO prefix-cache hits: attention
        runs over the fresh K/V (ops/attention.prefill_self_attention_jnp)
        instead of gathering them back out of the just-written cache —
        which XLA lowers to a whole-cache copy per layer (measured 271 ms
        of a 330 ms 36L prefill on v5e). K/V are still scattered into the
        cache for the decode rounds that follow."""
        hidden, kv = self._forward(
            self.cfg, params, kv, tokens, positions, slots, rope,
            self._attn_prefill_self, (block_tables, q_positions),
            kv_write_fn=self._kv_write, moe_ragged=True,
        )
        return kv, compute_logits(self.cfg, params, hidden[sel_rows])

    def _prefill_prefix_impl(self, params, rope, kv, tokens, positions, slots, block_tables, q_positions, sel_rows, num_cached, *, m_pre):
        """Prefill variant for batches WITH prefix-cache hits.

        Pallas path (``self._prefix_kernel_ok``): the paged-prefix flash
        kernel streams the cached pages straight out of the cache per
        query tile (ops/pallas/prefill_attention._prefill_prefix_kernel)
        — KV-sized prefix traffic, zero pre-gather materialization.

        jnp path: the cached prefix K/V are gathered ONCE before the
        layer scan (read-only, so the scan's scatters stay in place) and
        attention merges the prefix and fresh-KV partial softmaxes
        (ops/attention.prefill_prefix_attention_jnp)."""
        if self._prefix_kernel_ok:
            n_new = jnp.sum(q_positions >= 0, axis=1).astype(jnp.int32)
            hidden, kv = self._forward(
                self.cfg, params, kv, tokens, positions, slots, rope,
                self._attn_prefill_prefix_pallas,
                (block_tables[:, :m_pre], num_cached, n_new),
                kv_write_fn=self._kv_write, moe_ragged=True,
            )
            return kv, compute_logits(self.cfg, params, hidden[sel_rows])
        pk, pv = gather_prefix_kv(kv, block_tables[:, :m_pre], self.cfg.head_dim)
        hidden, kv = self._forward(
            self.cfg, params, kv, tokens, positions, slots, rope,
            self._attn_prefill_prefix, (pk, pv, num_cached, q_positions),
            kv_write_fn=self._kv_write, moe_ragged=True,
        )
        return kv, compute_logits(self.cfg, params, hidden[sel_rows])

    def _decode_impl(self, params, rope, kv, tokens, positions, slots, block_tables, context_lens):
        """One decode step for B rows (reference: step(), :319-331)."""
        hidden, kv = self._forward(
            self.cfg, params, kv, tokens, positions, slots, rope,
            self._attn_decode, (block_tables, context_lens),
            kv_write_fn=self._kv_write,
        )
        return kv, compute_logits(self.cfg, params, hidden)

    def _gamma_impl(self, params, rope, kv, tokens, positions, block_tables, context_lens, b1, *, gamma):
        """The draft's whole PEARL round as one compiled scan: gamma greedy
        decode steps feeding sampled tokens forward (reference:
        DraftModelRunner.pearl_step :492-507 — gamma Python iterations of
        CUDA-graph replays + in-group broadcasts; here zero host round-trips).

        On a pp>1 mesh the loop runs as a microbatch-rotated pipeline
        (parallel/pp.pp_gamma_rotate) — all stages busy every tick —
        instead of gamma sequential wavefronts.
        """
        if self.pp_size > 1:
            from nano_pearl_tpu.parallel.pp import pp_gamma_rotate

            toks, kv = pp_gamma_rotate(
                self.gmesh.mesh, self.cfg, params, kv, tokens, positions,
                block_tables, context_lens, rope, self._attn_decode, gamma,
                self.block_size, kv_write_fn=self._kv_write,
            )
            return kv, toks
        bs = self.block_size
        split = self._attn_decode_split is not None
        # Split-boundary schedule: each proposal must be folded with the
        # cell partition of the round that VERIFIES it — step 0's token
        # is checked by THIS round's verify (cells split at its
        # fresh-window start b1 = L - num_input), steps >= 1 by the NEXT
        # round's (full-accept path: b1 = L); rejected tails are
        # discarded unverified, so only the accept-path boundary matters
        # (tests/test_split_schedule.py; engine MAT probe r5).
        if split:
            b1_next = context_lens  # round-start length L per row

        def step(carry, t):
            kv, toks, pos, ctx = carry
            slots = (
                jnp.take_along_axis(block_tables, (pos // bs)[:, None], axis=1)[:, 0] * bs
                + pos % bs
            )
            if split:
                b1_t = jnp.where(t == 0, b1, b1_next)
                attn, aargs = self._attn_decode_split, (block_tables, ctx, b1_t)
            else:
                attn, aargs = self._attn_decode, (block_tables, ctx)
            hidden, kv = self._forward(
                self.cfg, params, kv, toks, pos, slots, rope,
                attn, aargs,
                kv_write_fn=self._kv_write,
            )
            logits = compute_logits(self.cfg, params, hidden)
            nxt = greedy(logits)  # draft decodes greedily (reference :498-500)
            return (kv, nxt, pos + 1, ctx + 1), nxt

        (kv, _, _, _), toks = jax.lax.scan(
            step, (kv, tokens, positions, context_lens),
            jnp.arange(gamma, dtype=jnp.int32),
        )
        return kv, toks  # toks: [gamma, B]

    def packed_verify_forward(
        self, params, rope, kv, tokens, positions, slots, block_tables,
        context_lens, gamma,
    ):
        """The target's packed verify forward on FLAT [B*gamma] row
        arrays; returns (kv, hidden). Two regimes:

        - deferred-write (``self._deferred_verify``): fresh K/V collected
          into a dense [L, 2, N, Hkv*D] buffer during the layer scan
          (contiguous per-layer dynamic_update_slice), attention reads
          cache-prefix + in-operand fresh rows
          (ops/attention.paged_attention_grouped_fresh), and the cache is
          written back ONCE after the scan (ops/kv_cache.write_fresh /
          the Pallas strided-DMA kernel) — removes the ~80 ns/row
          per-layer XLA scatter (~30% of the bench verify forward).
        - classic write-then-read otherwise (sp/pp/quantized caches).

        ``NANO_PEARL_VERIFY_ROWWISE=1`` (classic path only) runs the
        verify attention through the per-row DECODE flavor with repeated
        block tables instead of the grouped kernel: each verify row then
        takes the exact same kernel/chunking as the draft's gamma-scan
        decode of that position, removing the attention-side numeric
        divergence between the two streams (at the layer-share bitwise
        ceiling, fp-schedule differences between grouped-verify and
        decode logits reject ~1 in 6 tokens at identical weights —
        GEMM-shape divergence remains). Costs per-row KV re-reads
        (no cross-row DMA sharing).
        """
        if not self._deferred_verify:
            if self._verify_rowwise:
                n = tokens.shape[0]
                bt_rows = jnp.repeat(
                    block_tables, gamma, axis=0, total_repeat_length=n
                )
                return self._forward(
                    self.cfg, params, kv, tokens, positions, slots, rope,
                    self._attn_decode, (bt_rows, context_lens),
                    kv_write_fn=self._kv_write,
                    moe_ragged=self._moe_ragged_verify,
                )
            cap = self._verify_group_cap
            b = block_tables.shape[0]
            if cap and b > cap:
                # Sequence-group chunking: groups are disjoint sequences
                # (chunk j+1's rows never attend chunk j's), so the only
                # cross-chunk state is the cache, threaded as the scan
                # carry. Each chunk runs the SAME <=cap-group program
                # shape whose GEMM schedule class matches the decode
                # stream bitwise; the cost is streaming the weights once
                # per chunk instead of once per verify.
                k = -(-b // cap)
                while b % k:
                    k += 1
                bc = b // k
            if cap and b > cap and bc * gamma < 8:
                # a non-power-of-two batch (e.g. prime) can only be
                # divided into tiny chunks that FALL OUT of the
                # M in [8, 224] schedule class the cap exists to hit
                # (advisor r4) — run unchunked instead
                logger.warning(
                    f"[{self.name}] verify_group_cap={cap}: batch {b} "
                    f"only divides into {bc}-group chunks "
                    f"({bc * gamma} rows < 8); verify runs unchunked"
                )
                cap = 0
            if cap and b > cap:
                n = tokens.shape[0]
                nc = n // k
                part = lambda x: x.reshape(k, nc)
                stacked = (
                    part(tokens), part(positions), part(slots),
                    block_tables.reshape(k, bc, -1), part(context_lens),
                )

                def chunk(kv, a):
                    tk, ps, sl, bt, cl = a
                    hidden, kv = self._forward(
                        self.cfg, params, kv, tk, ps, sl, rope,
                        partial(self._attn_grouped, rows_per_group=gamma),
                        (bt, cl),
                        kv_write_fn=self._kv_write,
                        moe_ragged=self._moe_ragged_verify,
                    )
                    return kv, hidden

                kv, hiddens = jax.lax.scan(chunk, kv, stacked)
                return hiddens.reshape(n, -1), kv
            return self._forward(
                self.cfg, params, kv, tokens, positions, slots, rope,
                partial(self._attn_grouped, rows_per_group=gamma),
                (block_tables, context_lens),
                kv_write_fn=self._kv_write,
                moe_ragged=self._moe_ragged_verify,
            )
        cap = self._verify_group_cap
        b = block_tables.shape[0]
        if cap and b > cap:
            # sequence-group chunking of the DEFERRED verify: same
            # GEMM-class motivation as the classic path above; each chunk
            # collects its own fresh buffer and writes it back before the
            # next chunk's layers run (chunks are disjoint sequences)
            k = -(-b // cap)
            while b % k:
                k += 1
            bc = b // k
            if bc * gamma >= 8:
                n = tokens.shape[0]
                nc = n // k
                part = lambda x: x.reshape(k, nc)
                stacked = (
                    part(tokens), part(positions), part(slots),
                    block_tables.reshape(k, bc, -1), part(context_lens),
                )

                def chunk(kv, a):
                    tk, ps, sl, bt, cl = a
                    hidden, kv = self._deferred_forward(
                        params, rope, kv, tk, ps, sl, bt, cl, gamma
                    )
                    return kv, hidden

                kv, hiddens = jax.lax.scan(chunk, kv, stacked)
                return hiddens.reshape(n, -1), kv
            logger.warning(
                f"[{self.name}] verify_group_cap={cap}: batch {b} "
                f"only divides into {bc}-group chunks "
                f"({bc * gamma} rows < 8); deferred verify runs unchunked"
            )
        return self._deferred_forward(
            params, rope, kv, tokens, positions, slots, block_tables,
            context_lens, gamma,
        )

    def _deferred_forward(self, params, rope, kv, tokens, positions, slots, block_tables, context_lens, gamma):
        """Deferred-write packed verify for one (chunk of the) batch:
        fresh K/V collected in-operand during the layer scan, attention
        reads cache-prefix + fresh rows, one windowed-DUS writeback after
        the scan (see packed_verify_forward docstring)."""
        cfg = self.cfg
        n = tokens.shape[0]
        b = n // gamma
        hd = cfg.num_key_value_heads * cfg.head_dim
        # pre-round context per group: row 0 is always a real row whose
        # ctx includes exactly itself of the fresh window
        ctx0 = context_lens.reshape(b, gamma)[:, 0] - 1
        fresh0 = jnp.zeros((cfg.num_hidden_layers, 2, n, hd), kv.dtype)

        def collect(buf, k, v, _slots, li):
            pair = jnp.stack([k.reshape(n, -1), v.reshape(n, -1)])[None]
            return jax.lax.dynamic_update_slice(
                buf, pair.astype(buf.dtype), (li, 0, 0, 0)
            )

        def attn(q, k, v, li, cache, bt, ctx, c0):
            return self._grouped_fresh(
                q, cache, li, bt, ctx, c0, k, v, rows_per_group=gamma
            )

        attn.wants_fresh_kv = True
        hidden, fresh = self._forward(
            cfg, params, fresh0, tokens, positions, slots, rope,
            attn, (kv, block_tables, context_lens, ctx0), kv_write_fn=collect,
            moe_ragged=self._moe_ragged_verify,
        )
        kv = self._write_fresh(kv, fresh, slots, gamma)
        return hidden, kv

    def _verify_fwd_impl(self, params, rope, kv, tokens, positions, slots, block_tables, context_lens):
        """Target packed verify forward: B*gamma rows with per-token
        context lens (reference: TargetModelRunner.prepare_pearl_decode +
        run_model, :560-596). block_tables is [B, M]; rows are repeated
        on-device to per-token granularity."""
        b, g = tokens.shape
        flat = lambda x: x.reshape(b * g)
        hidden, kv = self.packed_verify_forward(
            params, rope, kv, flat(tokens), flat(positions), flat(slots),
            block_tables, flat(context_lens), g,
        )
        logits = compute_logits(self.cfg, params, hidden)
        return kv, logits.reshape(b, g, -1)

    def _verdict_impl(self, logits, tbv, is_pre, temps, num_completion, max_tokens, ignore_eos, eos_ids, seed, tk, tp, *, gamma, greedy_only, filtered):
        # seed -> key inside the jit so inputs stay device-neutral (host
        # ints place onto this group's mesh; a pre-committed key from the
        # default backend would conflict with CPU-mesh dry runs)
        if filtered:
            logits = apply_top_k_top_p(
                logits, tk[:, None], tp[:, None], temps[:, None]
            )
        return verify_verdict(
            logits, tbv, is_pre, temps, num_completion, max_tokens, ignore_eos,
            eos_ids, jax.random.key(seed), gamma, greedy=greedy_only,
        )

    def _sample_impl(self, logits, temps, seed, tk, tp, *, greedy_only=False, filtered=False):
        if greedy_only:
            return greedy(logits)
        if filtered:
            logits = apply_top_k_top_p(logits, tk, tp, temps)
        return sample(logits, temps, jax.random.key(seed))

    # ------------------------------------------------------------- host API

    def prefill(
        self,
        views: list[SeqView],
        lq_pad: int,
        b_pad: int,
        m_pad: int,
        fresh_only: bool = False,
        limit: int | None = None,
    ):
        """Returns logits [b_pad, V] (device, async). Program choice:
        ``fresh_only`` (no prefix-cache hits anywhere) -> fresh-KV
        self-attention (_prefill_self_impl); prefix hits on a plain mesh
        -> pre-gathered prefix merge (_prefill_prefix_impl); otherwise
        the cache-reading fallback (_prefill_impl).

        ``limit`` caps the new tokens processed per view (chunked
        prefill, engine/pearl.py prefill_all): KV is written for the
        first ``limit`` uncached tokens only, and the returned logits
        are meaningless for capped views (the caller advances
        ``num_cached_tokens`` and prefills the remainder later)."""
        bs = self.block_size
        b = len(views)
        tokens = np.zeros((b_pad, lq_pad), np.int32)
        positions = np.zeros((b_pad, lq_pad), np.int32)
        q_positions = np.full((b_pad, lq_pad), -1, np.int32)
        slots = np.full((b_pad, lq_pad), self.garbage_block * bs, np.int32)
        block_tables = np.full((b_pad, m_pad), self.garbage_block, np.int32)
        sel_rows = np.zeros((b_pad,), np.int32)
        for i, v in enumerate(views):
            start = v.num_cached_tokens
            end = len(v.token_ids) if limit is None else min(start + limit, len(v.token_ids))
            new = v.token_ids[start:end]
            n = len(new)
            assert 0 < n <= lq_pad
            tokens[i, :n] = new
            positions[i, :n] = np.arange(start, start + n)
            q_positions[i, :n] = positions[i, :n]
            slots[i, :n] = [v.token_to_slot(t) for t in range(start, start + n)]
            block_tables[i, : len(v.block_table)] = v.block_table
            sel_rows[i] = i * lq_pad + n - 1
        args = (
            self.params, self.rope_table, self.kv, tokens.reshape(-1),
            positions.reshape(-1), slots.reshape(-1), block_tables, q_positions, sel_rows,
        )
        if fresh_only:
            self.kv, logits = self._jit_prefill_self(*args)
        elif self.sp_size == 1 and self.pp_size == 1 and self._prefix_disjoint(views):
            num_cached = np.zeros((b_pad,), np.int32)
            num_cached[:b] = [v.num_cached_tokens for v in views]
            m_pre = min(
                next_pow2(max(1, -(-int(num_cached.max()) // bs))), m_pad
            )
            self.kv, logits = self._jit_prefill_prefix(
                *args, num_cached, m_pre=m_pre
            )
        else:
            self.kv, logits = self._jit_prefill(*args)
        return logits

    @staticmethod
    def _prefix_disjoint(views: list[SeqView]) -> bool:
        """True when no view's cached-prefix blocks are WRITTEN by another
        view in this same batch (within-batch prefix sharing: the shared
        blocks are only filled during this forward, so the pre-gathered
        prefix path would read zeros — those batches take the
        cache-reading fallback)."""
        written = set()
        for v in views:
            written.update(v.block_table[v.num_cached_tokens // v.block_size:])
        return all(
            not written.intersection(v.block_table[: v.num_cached_blocks])
            for v in views
        )

    def _decode_arrays(self, views: list[SeqView], b_pad: int, m_pad: int, with_slots: bool):
        bs = self.block_size
        tokens = np.zeros((b_pad,), np.int32)
        positions = np.zeros((b_pad,), np.int32)
        context_lens = np.ones((b_pad,), np.int32)
        block_tables = np.full((b_pad, m_pad), self.garbage_block, np.int32)
        slots = np.full((b_pad,), self.garbage_block * bs, np.int32)
        for i, v in enumerate(views):
            n = len(v)
            tokens[i] = v.last_token
            positions[i] = n - 1
            context_lens[i] = n
            block_tables[i, : len(v.block_table)] = v.block_table
            if with_slots:
                slots[i] = v.token_to_slot(n - 1)
        return tokens, positions, context_lens, block_tables, slots

    def decode(self, views: list[SeqView], b_pad: int, m_pad: int):
        """One AR decode step (reference: prepare_decode + run_model,
        :220-236, :245-262). Returns logits [b_pad, V] (device, async)."""
        tokens, positions, context_lens, block_tables, slots = self._decode_arrays(
            views, b_pad, m_pad, with_slots=True
        )
        self.kv, logits = self._jit_decode(
            self.params, self.rope_table, self.kv, tokens, positions, slots,
            block_tables, context_lens,
        )
        return logits

    def gamma_scan(self, views: list[SeqView], gamma: int, b_pad: int, m_pad: int, is_pre=None):
        """Dispatch the draft round; returns draft tokens [gamma, b_pad]
        (device, async). Block tables must already cover len+gamma tokens
        (Scheduler.schedule_decode lookahead). ``is_pre`` feeds the
        split-schedule boundaries (b1 = target fresh-window start,
        b2 = draft fresh-window start; ignored off the split path)."""
        tokens, positions, context_lens, block_tables, _ = self._decode_arrays(
            views, b_pad, m_pad, with_slots=False
        )
        b1 = np.zeros((b_pad,), np.int32)
        for i, v in enumerate(views):
            n = len(v)
            num_input = 1 if (is_pre is None or is_pre[i]) else gamma
            b1[i] = n - num_input
        self.kv, toks = self._jit_gamma(
            self.params, self.rope_table, self.kv, tokens, positions, block_tables,
            context_lens, b1, gamma=gamma,
        )
        return toks

    def verify_forward(self, views: list[SeqView], is_pre: np.ndarray, gamma: int, b_pad: int, m_pad: int):
        """Dispatch the target's packed forward; returns logits
        [b_pad, gamma, V] (device, async). Row j of sequence i holds the
        logits after target token (len - num_input + j)."""
        bs = self.block_size
        tokens = np.zeros((b_pad, gamma), np.int32)
        positions = np.zeros((b_pad, gamma), np.int32)
        context_lens = np.ones((b_pad, gamma), np.int32)
        slots = np.full((b_pad, gamma), self.garbage_block * bs, np.int32)
        block_tables = np.full((b_pad, m_pad), self.garbage_block, np.int32)
        for i, v in enumerate(views):
            num_input = 1 if is_pre[i] else gamma
            n = len(v)
            toks = v.token_ids[n - num_input :]
            tokens[i, :num_input] = toks
            pos = np.arange(n - num_input, n)
            positions[i, :num_input] = pos
            context_lens[i, :num_input] = pos + 1
            slots[i, :num_input] = [v.token_to_slot(p) for p in pos]
            block_tables[i, : len(v.block_table)] = v.block_table
        self.kv, logits = self._jit_verify_fwd(
            self.params, self.rope_table, self.kv, tokens, positions, slots,
            block_tables, context_lens,
        )
        return logits

    def verdict(self, logits, tbv, is_pre, temps, num_completion, max_tokens, ignore_eos, seed: int, gamma: int, top_ks=None, top_ps=None, stops=None):
        # stops: optional [B, S] per-request stop matrix (global EOS plus
        # request stop_token_ids, -1 padded); None -> the global EOS list
        eos_ids = (
            np.asarray(stops, np.int32)
            if stops is not None
            else np.asarray(self.cfg.eos_ids, np.int32)
        )
        greedy_only = bool(np.all(np.asarray(temps) == 0.0))
        filtered = top_ks is not None and not greedy_only
        b = np.asarray(temps).shape[0]
        tk = np.asarray(top_ks, np.int32) if filtered else np.zeros((b,), np.int32)
        tp = np.asarray(top_ps, np.float32) if filtered else np.ones((b,), np.float32)
        return self._jit_verdict(
            logits, tbv, is_pre, temps, num_completion, max_tokens,
            ignore_eos, eos_ids, np.int64(seed), tk, tp,
            gamma=gamma, greedy_only=greedy_only, filtered=filtered,
        )

    def sample_tokens(self, logits, temps: np.ndarray, seed: int, top_ks=None, top_ps=None) -> jax.Array:
        greedy_only = bool(np.all(np.asarray(temps) == 0.0))
        filtered = top_ks is not None and not greedy_only
        b = np.asarray(temps).shape[0]
        tk = np.asarray(top_ks, np.int32) if filtered else np.zeros((b,), np.int32)
        tp = np.asarray(top_ps, np.float32) if filtered else np.ones((b,), np.float32)
        return self._jit_sample(
            logits, np.asarray(temps, np.float32), np.int64(seed), tk, tp,
            greedy_only=greedy_only, filtered=filtered,
        )
