"""Bisect the bitwise-ceiling acceptance leak (round-4 item 2).

At identical draft/target weights, MAT at gamma=14 is ~12.4 instead of
~14: the draft's gamma-scan decode program ([B]-row forwards) and the
target's packed verify ([B*gamma]-row forward) are different XLA
schedules whose bf16 noise flips ~1 argmax in 9. This probe isolates
WHERE the divergence enters by running the same rows through both
shapes and comparing bitwise:

  gemm        bare x @ W (bf16): rows 0..B-1 identical in [B] and [B*G]
  gemm_f32    same with f32 accumulation output (no bf16 round)
  rmsnorm     rms_norm rows in both shapes
  layer_fwd   full transformer forward (paged attention, real cache)
  logits      argmax flips on the final lm_head

Usage (real chip): python tools/probe_ceiling_divergence.py
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--gamma", type=int, default=14)
    p.add_argument("--hidden", type=int, default=1024)
    p.add_argument("--ffn", type=int, default=4096)
    p.add_argument("--vocab", type=int, default=32768)
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp

    b, g, h = args.batch, args.gamma, args.hidden
    n = b * g
    rng = np.random.default_rng(0)
    # all array construction on HOST (numpy) — eager jnp ops against the
    # axon tunnel are one remote compile each (see verify skill)
    x_big_np = rng.standard_normal((n, h)).astype(np.float32)
    x_small = jnp.asarray(x_big_np[:b], jnp.bfloat16)
    x_big = jnp.asarray(x_big_np, jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal((h, args.ffn)) * 0.02, jnp.bfloat16)
    w2 = jnp.asarray(rng.standard_normal((h, args.vocab)) * 0.02, jnp.bfloat16)

    def report(name, a, b_):
        a = np.asarray(a, np.float32)
        b_ = np.asarray(b_, np.float32)
        neq = np.mean(a != b_)
        md = np.abs(a - b_).max()
        print(f"{name:12s} frac_bits_neq={neq:.4f} max_abs_diff={md:.3e}", flush=True)

    # --- bare GEMM: does a row's result depend on the batch dimension?
    mm = jax.jit(lambda x: (x @ w).astype(jnp.bfloat16))
    report("gemm", mm(x_small), mm(x_big)[:b])
    mm32 = jax.jit(
        lambda x: jax.lax.dot_general(
            x, w, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
    )
    report("gemm_f32", mm32(x_small), mm32(x_big)[:b])

    # --- lm-head shaped GEMM + argmax flips
    lm = jax.jit(
        lambda x: jax.lax.dot_general(
            x, w2, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
    )
    ls, lb = lm(x_small), lm(x_big)[:b]
    flips = np.mean(np.asarray(ls).argmax(-1) != np.asarray(lb).argmax(-1))
    report("lm_gemm", ls, lb)
    print(f"lm argmax flips: {flips:.4f}", flush=True)

    # --- rmsnorm
    def rms(x):
        v = jnp.mean(jnp.square(x.astype(jnp.float32)), axis=-1, keepdims=True)
        return (x.astype(jnp.float32) * jax.lax.rsqrt(v + 1e-6)).astype(jnp.bfloat16)

    rj = jax.jit(rms)
    report("rmsnorm", rj(x_small), rj(x_big)[:b])

    # --- silu-mlp block (two GEMMs + elementwise)
    wg = jnp.asarray(rng.standard_normal((h, args.ffn)) * 0.02, jnp.bfloat16)
    wd = jnp.asarray(rng.standard_normal((args.ffn, h)) * 0.02, jnp.bfloat16)

    def mlp(x):
        a = jax.nn.silu((x @ wg).astype(jnp.float32)).astype(jnp.bfloat16) * (x @ w)
        return (a @ wd).astype(jnp.bfloat16)

    mj = jax.jit(mlp)
    report("mlp", mj(x_small), mj(x_big)[:b])

    # --- full transformer layer-stack forward, decode vs verify shape
    from nano_pearl_tpu.config import ModelConfig
    from nano_pearl_tpu.models.transformer import (
        compute_logits,
        forward,
        init_params,
        make_rope_table,
    )
    from nano_pearl_tpu.ops.attention import paged_attention, paged_attention_grouped
    from nano_pearl_tpu.ops.kv_cache import make_kv_cache, write_kv
    from functools import partial

    mc = ModelConfig(
        hidden_size=h,
        intermediate_size=args.ffn,
        num_hidden_layers=6,
        num_attention_heads=8,
        num_key_value_heads=2,
        vocab_size=args.vocab,
        dtype="float32" if args.cpu else "bfloat16",
        max_position_embeddings=4096,
        eos_token_id=1,
    )
    params = jax.jit(lambda s: init_params(mc, jax.random.key(s)))(0)
    rope = make_rope_table(mc)
    bs = 256
    m = 8
    nb = b * m + 4
    n_fill = 4 * bs
    kf = rng.standard_normal((n_fill, mc.num_key_value_heads, mc.head_dim)).astype(np.float32)
    vf = rng.standard_normal((n_fill, mc.num_key_value_heads, mc.head_dim)).astype(np.float32)

    @jax.jit
    def build_cache(kf, vf):
        c = make_kv_cache(
            mc.num_hidden_layers, nb, bs, mc.num_key_value_heads, mc.head_dim,
            dtype=jnp.bfloat16 if not args.cpu else jnp.float32,
        )
        return write_kv(c, kf, vf, jnp.arange(n_fill, dtype=jnp.int32), 0)

    cache = build_cache(kf, vf)
    scale = mc.head_dim**-0.5

    ctx0 = 1000
    bt = jnp.asarray(rng.integers(0, nb - 1, (b, m)).astype(np.int32))
    toks_b = rng.integers(2, args.vocab - 1, (b,)).astype(np.int32)
    pos_b = np.full((b,), ctx0 - 1, np.int32)
    slots_garbage = (nb - 1) * bs + np.arange(n, dtype=np.int32) % bs

    use_pallas = not args.cpu

    # params/rope/bt are jit ARGUMENTS: closure-captured arrays are
    # inlined into the HLO as constants (runner.py note) — a captured 6L
    # model blows the remote-compile payload limit (HTTP 413).
    @jax.jit
    def decode_fwd(params, rope, bt, cache, toks, pos, slots, ctx):
        hidden, cache2 = forward(
            mc, params, cache, toks, pos, slots, rope,
            partial(paged_attention, scale=scale, use_pallas=use_pallas, mono=False),
            (bt, ctx),
            kv_write_fn=write_kv,
        )
        return compute_logits(mc, params, hidden)

    @jax.jit
    def verify_fwd(params, rope, bt, cache, toks, pos, slots, ctx):
        hidden, cache2 = forward(
            mc, params, cache, toks, pos, slots, rope,
            partial(
                paged_attention_grouped, scale=scale, rows_per_group=g,
                use_pallas=use_pallas, mono=False,
            ),
            (bt, ctx),
            kv_write_fn=write_kv,
        )
        return compute_logits(mc, params, hidden)

    # decode shape: rows are sequence tails at position ctx0-1
    ctx_b = np.full((b,), ctx0, np.int32)
    ld = decode_fwd(
        params, rope, bt, cache, jnp.asarray(toks_b), jnp.asarray(pos_b),
        jnp.asarray(slots_garbage[:b]), jnp.asarray(ctx_b),
    )
    # verify shape: row i*g+0 carries the SAME (token, pos, ctx) as
    # decode row i; remaining rows are the staircase continuation
    toks_n = rng.integers(2, args.vocab - 1, (b, g)).astype(np.int32)
    toks_n[:, 0] = toks_b
    pos_n = (ctx0 - 1 + np.tile(np.arange(g), (b, 1))).astype(np.int32)
    ctx_n = pos_n + 1
    lv = verify_fwd(
        params, rope, bt, cache, jnp.asarray(toks_n.reshape(-1)), jnp.asarray(pos_n.reshape(-1)),
        jnp.asarray(slots_garbage), jnp.asarray(ctx_n.reshape(-1)),
    )
    ld_np = np.asarray(ld)
    lv0 = np.asarray(lv).reshape(b, g, -1)[:, 0]
    flips = np.mean(ld_np.argmax(-1) != lv0.argmax(-1))
    report("full_fwd", ld_np, lv0)
    print(f"full-forward argmax flips (row 0 of each group): {flips:.4f}", flush=True)


if __name__ == "__main__":
    main()
