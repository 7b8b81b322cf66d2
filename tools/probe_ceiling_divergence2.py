"""Ceiling-leak bisection, part 2 (round-4 item 2).

probe_ceiling_divergence established that decode-shape ([B]-row) and
verify-shape ([B*G]-row) forwards are BITWISE IDENTICAL on v5e — GEMMs,
rmsnorm, mlp, and the full model with db Pallas attention (r=1 vs r=14).
So the engine's MAT leak at the bitwise ceiling is NOT a batch-shape
effect. Remaining suspects, isolated here on the layer-share pair:

  scan0      draft gamma-scan step 0 logits vs the standalone decode
             forward on identical state (does lax.scan change numerics?)
  share36    target(36L layer-share) logits vs draft(3L) logits on the
             SAME decode-shaped input (does scan LENGTH change the
             per-iteration numerics?)
  round      one full PEARL round: gamma-scan tokens vs packed-verify
             argmax agreement (the engine's actual acceptance test)

Usage (real chip): python tools/probe_ceiling_divergence2.py
"""

from __future__ import annotations

import argparse
import os
import sys
from functools import partial

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--gamma", type=int, default=14)
    p.add_argument("--draft-layers", type=int, default=3)
    p.add_argument("--target-layers", type=int, default=36)
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

    from nano_pearl_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()

    from bench import build_layer_share_pair
    from nano_pearl_tpu.config import ModelConfig
    from nano_pearl_tpu.models.transformer import (
        compute_logits,
        forward,
        make_rope_table,
    )
    from nano_pearl_tpu.ops.attention import paged_attention, paged_attention_grouped
    from nano_pearl_tpu.ops.kv_cache import make_kv_cache, write_kv
    from nano_pearl_tpu.ops.sampling import greedy

    b, g, h = args.batch, args.gamma, args.hidden
    dt = "float32" if args.cpu else "bfloat16"

    def mc(layers):
        return ModelConfig(
            hidden_size=h,
            intermediate_size=args.ffn,
            num_hidden_layers=layers,
            num_attention_heads=8,
            num_key_value_heads=2,
            vocab_size=args.vocab,
            dtype=dt,
            max_position_embeddings=4096,
            eos_token_id=1,
        )

    mcd, mct = mc(args.draft_layers), mc(args.target_layers)
    dparams, tparams = build_layer_share_pair(mcd, mct, 0)
    rope = make_rope_table(mcd)
    bs = 256
    m = 4
    nb = b * m + 4
    scale = mcd.head_dim**-0.5
    use_pallas = not args.cpu
    rng = np.random.default_rng(0)
    bt = np.zeros((b, m), np.int32)
    for i in range(b):
        bt[i] = np.arange(i * m, (i + 1) * m)
    bt = jnp.asarray(bt)

    def mk_cache(mcfg):
        return make_kv_cache(
            mcfg.num_hidden_layers, nb, bs, mcfg.num_key_value_heads,
            mcfg.head_dim, dtype=jnp.dtype(dt),
        )

    # ---- shared prefill: run Lq prompt tokens through both models
    lq = 64
    toks0 = rng.integers(2, args.vocab - 1, (b, lq)).astype(np.int32)

    def prefill(mcfg, params, cache):
        from nano_pearl_tpu.ops.attention import prefill_self_attention

        @jax.jit
        def run(params, rope, cache, toks):
            n = b * lq
            pos = jnp.tile(jnp.arange(lq, dtype=jnp.int32), (b, 1))
            slots = (bt[:, :1] * bs + pos).reshape(n)
            attn = partial(
                prefill_self_attention, scale=scale, use_pallas=use_pallas
            )
            attn.wants_fresh_kv = True
            hidden, cache = forward(
                mcfg, params, cache, toks.reshape(n), pos.reshape(n), slots,
                rope, attn, (None, pos), kv_write_fn=write_kv,
            )
            sel = jnp.arange(b, dtype=jnp.int32) * lq + (lq - 1)
            return cache, greedy(compute_logits(mcfg, params, hidden[sel]))

        return run(params, rope, cache, jnp.asarray(toks0))

    dkv, tok_d = prefill(mcd, dparams, mk_cache(mcd))
    tkv, tok_t = prefill(mct, tparams, mk_cache(mct))
    agree = np.mean(np.asarray(tok_d) == np.asarray(tok_t))
    print(f"prefill argmax agreement draft-vs-target: {agree:.4f}", flush=True)

    # ---- draft gamma-scan (engine shape) vs standalone decode step 0
    def row_slots(pos):
        blk = jnp.take_along_axis(bt, pos[:, None] // bs, axis=1)[:, 0]
        return blk * bs + pos % bs

    def dec_fwd(mcfg, params, rope, cache, toks, pos, ctx):
        hidden, cache = forward(
            mcfg, params, cache, toks, pos, row_slots(pos), rope,
            partial(paged_attention, scale=scale, use_pallas=use_pallas, mono=False),
            (bt, ctx),
            kv_write_fn=write_kv,
        )
        return cache, compute_logits(mcfg, params, hidden)

    def make_gamma_scan(mcfg):
        @jax.jit
        def gamma_scan(params, rope, cache, toks, pos, ctx):
            def step(carry, _):
                cache, tk, p, c = carry
                cache, logits = dec_fwd(mcfg, params, rope, cache, tk, p, c)
                nxt = greedy(logits)
                return (cache, nxt, p + 1, c + 1), (nxt, logits)

            (cache, _, _, _), (toks_out, logits_out) = jax.lax.scan(
                step, (cache, toks, pos, ctx), None, length=g
            )
            return cache, toks_out, logits_out

        return gamma_scan

    def make_dec(mcfg):
        return jax.jit(partial(dec_fwd, mcfg))

    pos0 = jnp.full((b,), lq - 1, jnp.int32) + 1  # position of tok_d
    ctx0 = pos0 + 1
    _, toks_scan, logits_scan = make_gamma_scan(mcd)(
        dparams, rope, dkv, tok_d, pos0, ctx0
    )
    _, logits_single = make_dec(mcd)(dparams, rope, dkv, tok_d, pos0, ctx0)
    l0 = np.asarray(logits_scan[0])
    ls = np.asarray(logits_single)
    neq = np.mean(l0 != ls)
    flips = np.mean(l0.argmax(-1) != ls.argmax(-1))
    print(f"scan0: frac_neq={neq:.4f} argmax_flips={flips:.4f}", flush=True)

    # ---- scan length: target 36L vs draft 3L on the same decode input
    # (layer-share: extension layers are passthrough, logits should match)
    _, logits_t36 = make_dec(mct)(tparams, rope, tkv, tok_d, pos0, ctx0)
    lt = np.asarray(logits_t36)
    neq = np.mean(lt != ls)
    flips = np.mean(lt.argmax(-1) != ls.argmax(-1))
    print(f"share36(decode-shape): frac_neq={neq:.4f} argmax_flips={flips:.4f}", flush=True)

    # ---- one full PEARL round: scan tokens vs packed verify agreement
    toks_scan_np = np.asarray(toks_scan)  # [g, b]

    def verify_fwd_impl(mcfg, params, rope, cache, toks, pos, ctx):
        n = b * g
        blk = jnp.take_along_axis(bt, pos // bs, axis=1)  # [b, g]
        vslots = (blk * bs + pos % bs).reshape(n)
        hidden, cache = forward(
            mcfg, params, cache, toks.reshape(n), pos.reshape(n),
            vslots, rope,
            partial(
                paged_attention_grouped, scale=scale, rows_per_group=g,
                use_pallas=use_pallas, mono=False,
            ),
            (bt, ctx.reshape(n)),
            kv_write_fn=write_kv,
        )
        return cache, compute_logits(mcfg, params, hidden).reshape(b, g, -1)

    # target verifies [tok_d, scan_toks[0..g-2]]: row j logits predict
    # scan token j (the engine's acceptance test at the ceiling)
    vt = np.concatenate([np.asarray(tok_d)[None], toks_scan_np[:-1]], 0).T  # [b, g]
    vpos = np.asarray(pos0)[:, None] + np.arange(g)[None, :]
    _, vlogits = jax.jit(partial(verify_fwd_impl, mct))(
        tparams, rope, tkv, jnp.asarray(vt), jnp.asarray(vpos),
        jnp.asarray(vpos + 1),
    )
    pred = np.asarray(vlogits).argmax(-1)  # [b, g]
    agree = np.mean(pred == toks_scan_np.T)
    print(f"round: verify-argmax vs scan-token agreement = {agree:.4f}", flush=True)
    per_pos = np.mean(pred == toks_scan_np.T, axis=0)
    print("per-position agreement:", np.round(per_pos, 3).tolist(), flush=True)

    # ---- per-position BITWISE comparison of verify logits vs the scan's
    # own logits (logits_scan[j] predicts token j+1; verify row j's
    # logits predict token j — shift by one)
    lscan = np.asarray(logits_scan)  # [g, b, V]
    lver = np.asarray(vlogits)  # [b, g, V]
    for j in range(min(g, 6)):
        # verify row j consumes the same (token, position) as scan step j
        a = lscan[j]
        bb = lver[:, j]
        neq = np.mean(a != bb)
        md = np.abs(a - bb).max()
        fl = np.mean(a.argmax(-1) != bb.argmax(-1))
        print(
            f"  bitwise scan[{j}] vs verify[{j}]: frac_neq={neq:.4f} "
            f"maxdiff={md:.2e} flips={fl:.4f}",
            flush=True,
        )

    # ---- is the scan's INTERNAL greedy consistent with the argmax of
    # its own emitted logits? (a mismatch means argmax-in-scan takes a
    # different numeric/reduction path than the post-hoc argmax)
    for j in range(3):
        internal = toks_scan_np[j]
        post = lscan[j].argmax(-1)
        ver_am = lver[:, j].argmax(-1)
        mxv = lscan[j].max(-1, keepdims=True)
        nties = (lscan[j] == mxv).sum(-1)
        print(
            f"  j={j}: internal-greedy==emitted-argmax {np.mean(internal == post):.4f}; "
            f"emitted-argmax==verify-argmax {np.mean(post == ver_am):.4f}; "
            f"mean top ties {nties.mean():.2f} max {nties.max()}",
            flush=True,
        )

    # ---- PREFILL-written K/V: do the 3L and 36L models' prefill
    # programs write bitwise-identical prompt rows at the shared layers?
    dpre = np.asarray(dkv[: args.draft_layers, :, :, :lq]).astype(np.float32)
    tpre = np.asarray(tkv[: args.draft_layers, :, :, :lq]).astype(np.float32)
    neq = np.mean(dpre != tpre)
    md = np.abs(dpre - tpre).max()
    print(f"prefill prompt K/V (shared layers): frac_neq={neq:.6f} maxdiff={md:.2e}", flush=True)
    if md > 0:
        d_l = np.abs(dpre - tpre).reshape(args.draft_layers, -1).max(axis=1)
        print("  per-layer maxdiff:", [f"{x:.1e}" for x in d_l], flush=True)

    # ---- cache contents: draft layer-i K/V vs target layer-i K/V at the
    # round's fresh positions (did the two sides WRITE different values?)
    dkv2, _, _ = make_gamma_scan(mcd)(dparams, rope, dkv, tok_d, pos0, ctx0)
    tkv2, _ = jax.jit(partial(verify_fwd_impl, mct))(
        tparams, rope, tkv, jnp.asarray(vt), jnp.asarray(vpos),
        jnp.asarray(vpos + 1),
    )
    # fresh positions lq..lq+g-1 live in block bt[:, 0] rows lq..lq+g-1
    # (lq + g < bs); compare layer 0..draft_layers-1
    dk = np.asarray(dkv2[: args.draft_layers, :, :, lq : lq + g - 1])
    tk_ = np.asarray(tkv2[: args.draft_layers, :, :, lq : lq + g - 1])
    neq = np.mean(dk != tk_)
    md = np.abs(
        dk.astype(np.float32) - tk_.astype(np.float32)
    ).max()
    print(f"cache fresh-row K/V (shared layers): frac_neq={neq:.4f} maxdiff={md:.2e}", flush=True)


if __name__ == "__main__":
    main()
