"""Pallas TPU flash attention for prefill self-attention (fresh K/V).

The TPU counterpart of the reference's ``flash_attn_varlen_func`` ragged
prefill (reference: nano_pearl/layers/attention.py:71-76) for the
no-prefix-cache-hit case, where attention runs over the batch's fresh
post-rope K/V (see ops/attention.prefill_self_attention_jnp for why this
case never reads the paged cache).

Why a kernel: the jnp path materializes [B, Hkv, C, G, S] f32 score
tiles through HBM per 128-row chunk — at S = a few thousand keys that
is hundreds of MB of score traffic per layer. The flash kernel keeps
the running (m, l, acc) statistics in VMEM and streams K/V tiles once.

Design:
- grid = (B, num_q_tiles, num_kv_tiles), kv innermost so the flash
  accumulators carry across a query tile's kv sweep.
- causal tile skip: kv tiles strictly above the diagonal are skipped
  (pl.when) AND their index_map clamps to the last useful tile, so
  Pallas elides the HBM->VMEM copy entirely (same trick as the paged
  decode kernels' past-context clamp).
- masking: key j is visible to query i iff j <= i (both absolute within
  the padded [B, Lq] layout) and key_positions[j] >= 0 (ragged batches
  pad rows with position -1). Fully-masked rows (padded sequences)
  produce 0, not NaN: the running max is floored at M_FLOOR so the
  exp() of masked scores underflows instead of hitting inf - inf.
- matmuls run in the inputs' native dtype (bf16 -> full-rate MXU) with
  f32 accumulation; softmax statistics stay f32.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30
M_FLOOR = -1e29  # running-max floor: keeps exp(masked - m) at 0, not 1


def _prefill_self_kernel(
    q_ref,  # [1, TQ, Hq, D]
    k_ref,  # [1, TK, Hkv, D]
    v_ref,  # [1, TK, Hkv, D]
    kpos_ref,  # [1, 1, TK] int32 key positions (-1 = padded row)
    o_ref,  # [1, TQ, Hq, D]
    m_scr, l_scr, acc_scr,
    *, scale: float, tq: int, tk: int, num_kv_heads: int,
):
    qi = pl.program_id(1)
    ki = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(ki == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, M_FLOOR)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    q_start = qi * tq
    k_start = ki * tk

    @pl.when(k_start <= q_start + tq - 1)
    def _compute():
        q = q_ref[0]  # [TQ, Hq, D]
        k = k_ref[0]  # [TK, Hkv, D]
        v = v_ref[0]
        hq, d = q.shape[1], q.shape[2]
        g = hq // num_kv_heads

        s_parts = []
        for kh in range(num_kv_heads):
            qh = q[:, kh * g : (kh + 1) * g, :].reshape(tq * g, d)
            s_parts.append(
                jax.lax.dot_general(
                    qh, k[:, kh, :],
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # [TQ*G, TK]
            )
        s2 = jnp.concatenate(s_parts, axis=0) * scale  # [Hkv*TQ*G, TK]

        rows = num_kv_heads * tq * g
        flat_i = jax.lax.broadcasted_iota(jnp.int32, (rows, tk), 0)
        i_idx = (flat_i % (tq * g)) // g  # query row within the tile
        j_idx = jax.lax.broadcasted_iota(jnp.int32, (rows, tk), 1)
        kvalid = kpos_ref[0] >= 0  # [1, TK] broadcasts over rows
        visible = ((k_start + j_idx) <= (q_start + i_idx)) & kvalid
        s2 = jnp.where(visible, s2, NEG_INF)

        m_prev = m_scr[:, 0:1]
        m_new = jnp.maximum(m_prev, jnp.max(s2, axis=1, keepdims=True))
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(s2 - m_new)
        l_scr[:, 0:1] = l_scr[:, 0:1] * alpha + jnp.sum(p, axis=1, keepdims=True)

        p = p.astype(v.dtype)  # p in [0,1]: bf16 PV matmul, f32 accumulate
        pv_parts = []
        for kh in range(num_kv_heads):
            ph = jax.lax.slice(p, (kh * tq * g, 0), ((kh + 1) * tq * g, tk))
            pv_parts.append(
                jax.lax.dot_general(
                    ph, v[:, kh, :],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # [TQ*G, D]
            )
        acc_scr[...] = acc_scr[...] * alpha + jnp.concatenate(pv_parts, axis=0)
        m_scr[:, 0:1] = m_new

    @pl.when(ki == nk - 1)
    def _finalize():
        hq, d = o_ref.shape[2], o_ref.shape[3]
        g = hq // num_kv_heads
        denom = jnp.maximum(l_scr[:, 0:1], 1e-30)
        out = acc_scr[...] / denom  # [Hkv*TQ*G, D], layout [kh, i, gg]
        for kh in range(num_kv_heads):
            blk = jax.lax.slice(out, (kh * tq * g, 0), ((kh + 1) * tq * g, d))
            o_ref[0, :, kh * g : (kh + 1) * g, :] = blk.reshape(tq, g, d).astype(
                o_ref.dtype
            )


def prefill_self_attention_pallas(
    q: jax.Array,  # [N = B*Lq, Hq, D] flat new-token queries, seq-major
    k: jax.Array,  # [N, Hkv, D] fresh post-rope keys
    v: jax.Array,  # [N, Hkv, D]
    layer_idx,  # unused (protocol compatibility with the jnp flavor)
    block_tables: jax.Array,  # unused (protocol compatibility)
    q_positions: jax.Array,  # [B, Lq] int32 absolute positions; -1 = padded
    scale: float,
    interpret: bool = False,
) -> jax.Array:
    b, lq = q_positions.shape
    n, hq, d = q.shape
    hkv = k.shape[1]
    g = hq // hkv

    tile = 128 if lq >= 128 else max(8, -(-lq // 8) * 8)
    lpad = -(-lq // tile) * tile
    qb = q.reshape(b, lq, hq, d)
    kb = k.reshape(b, lq, hkv, d)
    vb = v.reshape(b, lq, hkv, d)
    kpos = q_positions  # keys are the same rows as the queries
    if lpad != lq:
        pad = ((0, 0), (0, lpad - lq), (0, 0), (0, 0))
        qb, kb, vb = (jnp.pad(x, pad) for x in (qb, kb, vb))
        kpos = jnp.pad(kpos, ((0, 0), (0, lpad - lq)), constant_values=-1)
    nt = lpad // tile

    def _ki_eff(bi, qi, ki):
        # clamp above-diagonal kv tiles onto the diagonal: the repeated
        # block index makes Pallas skip the HBM->VMEM copy
        return jnp.minimum(ki, qi)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(b, nt, nt),
        in_specs=[
            pl.BlockSpec((1, tile, hq, d), lambda bi, qi, ki: (bi, qi, 0, 0)),
            pl.BlockSpec(
                (1, tile, hkv, d), lambda bi, qi, ki: (bi, _ki_eff(bi, qi, ki), 0, 0)
            ),
            pl.BlockSpec(
                (1, tile, hkv, d), lambda bi, qi, ki: (bi, _ki_eff(bi, qi, ki), 0, 0)
            ),
            # singleton middle axis: Mosaic requires a block's last two
            # dims to be (divisible by (8, 128)) OR equal to the array's
            # — (1, tile) on [b, lpad] fails for b > 1, so the positions
            # ride as [b, 1, lpad] with block (1, 1, tile)
            pl.BlockSpec((1, 1, tile), lambda bi, qi, ki: (bi, 0, _ki_eff(bi, qi, ki))),
        ],
        out_specs=pl.BlockSpec((1, tile, hq, d), lambda bi, qi, ki: (bi, qi, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((hkv * tile * g, 128), jnp.float32),
            pltpu.VMEM((hkv * tile * g, 128), jnp.float32),
            pltpu.VMEM((hkv * tile * g, d), jnp.float32),
        ],
    )
    out = pl.pallas_call(
        functools.partial(
            _prefill_self_kernel, scale=scale, tq=tile, tk=tile, num_kv_heads=hkv
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, lpad, hq, d), q.dtype),
        interpret=interpret,
    )(qb, kb, vb, kpos[:, None, :])
    return out[:, :lq].reshape(n, hq, d)
