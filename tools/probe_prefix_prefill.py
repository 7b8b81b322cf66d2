"""Time the prefix-hit prefill: Pallas paged-prefix kernel vs the jnp
pre-gather/merge path (round-4 item 5).

Scenario: B sequences, each with a cached prefix of ``--cached`` tokens
(block-aligned, as the engine guarantees) and ``--fresh`` new tokens —
the shape of every chunked-prefill pass and every prefix-cache hit.

Usage (real chip): python tools/probe_prefix_prefill.py
"""

from __future__ import annotations

import argparse
import os
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--cached", type=int, default=2048)
    p.add_argument("--fresh", type=int, default=512)
    p.add_argument("--layers", type=int, default=36)
    p.add_argument("--hidden", type=int, default=1024)
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp

    from nano_pearl_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    from nano_pearl_tpu.config import ModelConfig
    from nano_pearl_tpu.models.transformer import (
        compute_logits,
        forward,
        init_params,
        make_rope_table,
    )
    from nano_pearl_tpu.ops.attention import (
        gather_prefix_kv,
        prefill_prefix_attention_jnp,
    )
    from nano_pearl_tpu.ops.pallas.prefill_attention import (
        prefill_prefix_attention_pallas,
    )
    from nano_pearl_tpu.ops.kv_cache import make_kv_cache, write_kv

    b, lq, nc = args.batch, args.fresh, args.cached
    mc = ModelConfig(
        hidden_size=args.hidden, intermediate_size=4096,
        num_hidden_layers=args.layers, num_attention_heads=8,
        num_key_value_heads=2, vocab_size=32768,
        dtype="float32" if args.cpu else "bfloat16",
        max_position_embeddings=8192, eos_token_id=1,
    )
    params = jax.jit(lambda s: init_params(mc, jax.random.key(s)))(0)
    rope = make_rope_table(mc)
    bs = 256
    m_pre = nc // bs
    nb = b * (m_pre + lq // bs + 2) + 4
    rng = np.random.default_rng(0)
    scale = mc.head_dim**-0.5
    bt = np.zeros((b, m_pre), np.int32)
    for i in range(b):
        bt[i] = np.arange(i * (m_pre + 3), i * (m_pre + 3) + m_pre)
    bt = jnp.asarray(bt)

    @jax.jit
    def build_cache(kf, vf):
        c = make_kv_cache(
            mc.num_hidden_layers, nb, bs, mc.num_key_value_heads, mc.head_dim,
            dtype=jnp.dtype(mc.dtype),
        )
        slots = (bt[:, :, None] * bs + jnp.arange(bs)[None, None, :]).reshape(-1)
        return write_kv(c, kf, vf, slots, 0)

    nrows = b * m_pre * bs
    kf = rng.standard_normal((nrows, 2, mc.head_dim)).astype(np.float32)
    vf = rng.standard_normal((nrows, 2, mc.head_dim)).astype(np.float32)
    cache = build_cache(kf, vf)

    n = b * lq
    toks = jnp.asarray(rng.integers(2, 32767, (n,)).astype(np.int32))
    pos = jnp.asarray((nc + np.tile(np.arange(lq), (b, 1))).reshape(-1).astype(np.int32))
    slots_g = jnp.asarray(((nb - 1) * bs + np.arange(n) % bs).astype(np.int32))
    num_cached = jnp.full((b,), nc, jnp.int32)
    n_new = jnp.full((b,), lq, jnp.int32)
    qpos = jnp.asarray((nc + np.tile(np.arange(lq), (b, 1))).astype(np.int32))

    def fwd_kernel(params, rope, cache, toks, pos, slots):
        def attn(q, k, v, c, li, btp, ncached, nnew):
            return prefill_prefix_attention_pallas(
                q, k, v, c, li, btp, ncached, nnew, None, scale
            )

        attn.wants_fresh_and_cache = True
        hidden, cache = forward(
            mc, params, cache, toks, pos, slots, rope, attn,
            (bt, num_cached, n_new), kv_write_fn=write_kv,
        )
        return compute_logits(mc, params, hidden[:: lq])

    def fwd_jnp(params, rope, cache, toks, pos, slots):
        pk, pv = gather_prefix_kv(cache, bt, mc.head_dim)
        attn = partial(prefill_prefix_attention_jnp, scale=scale)
        attn.wants_fresh_kv = True
        hidden, cache = forward(
            mc, params, cache, toks, pos, slots, rope, attn,
            (pk, pv, num_cached, qpos), kv_write_fn=write_kv,
        )
        return compute_logits(mc, params, hidden[:: lq])

    for name, f in (("kernel", fwd_kernel), ("jnp_pregather", fwd_jnp)):
        jf = jax.jit(f)
        out = jf(params, rope, cache, toks, pos, slots_g)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = jf(params, rope, cache, toks, pos, slots_g)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / args.iters * 1e3
        print(
            f"{name:14s} {dt:8.2f} ms/forward  "
            f"(B={b}, cached={nc}, fresh={lq}, {args.layers}L)",
            flush=True,
        )
        if name == "kernel":
            ref = out
    # numerics cross-check on the logits rows
    a = np.asarray(ref, np.float32)
    bb = np.asarray(out, np.float32)
    print("kernel-vs-jnp logits maxdiff:", float(np.abs(a - bb).max()), flush=True)


if __name__ == "__main__":
    main()
