"""Bisect the PEARL packed-verify forward cost on the local chip.

The perf ledger has the 36L/448-row verify forward at ~12 ms on v5e
(~33% of GEMM speed-of-light). This probe separates:

  full        exact fused._target_packed (grouped pallas attn + kv write)
  id_attn     same forward, attention replaced by identity (o = q)
  id_nokv     identity attention AND kv write skipped
  sep_scan    bare GEMM stack (rms/rope/residual kept), lax.scan layers
  fused_scan  same but qkv fused into one GEMM and gate|up fused
  sep_unroll  bare GEMM stack, python-unrolled layers (no scan slicing)
  lm_head     compute_logits alone on the 448-row hidden

Method: each variant runs inside ONE jit as a lax.scan with a chained
carry (loop-invariant hoisting defeated), timed at two trip counts and
differenced; a scalar is fetched to force execution (block_until_ready
lies over the axon tunnel).

Usage: python tools/probe_verify_breakdown.py [--gamma 14] [--batch 32]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--gamma", type=int, default=14)
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--target-layers", type=int, default=36)
    p.add_argument("--lo", type=int, default=3)
    p.add_argument("--hi", type=int, default=13)
    p.add_argument("--cpu", action="store_true")
    p.add_argument(
        "--ctx", type=int, default=0,
        help="override per-seq context length (randomized block tables)",
    )
    p.add_argument(
        "--only", type=str, default=None,
        help="comma list of variants to run (full,full_g7,id_attn,id_nokv,"
        "sep_scan,fused_scan,sep_unroll,lm_head)",
    )
    args = p.parse_args()
    only = set(args.only.split(",")) if args.only else None

    def want(name):
        return only is None or name in only

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
        os.environ["NANO_PEARL_PALLAS"] = "0"
    import jax

    from nano_pearl_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    import jax.numpy as jnp

    import bench as benchmod
    from nano_pearl_tpu import PearlEngine
    from nano_pearl_tpu.config import ModelConfig, PearlConfig, SamplingParams
    from nano_pearl_tpu.models.transformer import compute_logits, rms_norm
    from nano_pearl_tpu.ops.rope import apply_rope

    b, gamma = args.batch, args.gamma
    n_rows = b * gamma

    def mc(layers):
        return ModelConfig(
            architecture="LlamaForCausalLM", hidden_size=1024,
            intermediate_size=4096, num_hidden_layers=layers,
            num_attention_heads=8, num_key_value_heads=2,
            vocab_size=32768, eos_token_id=1,
            dtype="float32" if args.cpu else "bfloat16",
            max_position_embeddings=2048,
        )

    dmc, tmc = mc(3), mc(args.target_layers)
    dparams, tparams = benchmod.build_layer_share_pair(dmc, tmc, 0)
    max_len, block = 2048, 256
    cfg = PearlConfig(
        draft_model=dmc, target_model=tmc, max_model_len=max_len,
        max_num_batched_tokens=max(16384, b * 64),
        kvcache_block_size=block,
        num_kvcache_blocks=b * (max_len // block) + 8,
        gamma=gamma, max_num_seqs=max(b, 8), seed=0,
    )
    engine = PearlEngine(cfg, draft_params=dparams, target_params=tparams)
    fused = engine.orchestrator.fused
    assert fused is not None
    target = fused.target
    tcfg = target.cfg
    eps = tcfg.rms_norm_eps

    rng = np.random.default_rng(0)
    rng_bt = np.random.default_rng(1)
    for _ in range(b):
        prompt = rng.integers(2, 32766, 64).tolist()
        engine.add_request(
            prompt,
            SamplingParams(temperature=0.0, max_tokens=max_len - 80, ignore_eos=True),
        )
    engine.orchestrator.prefill_all()
    seqs = list(engine.scheduler.running)
    for s_ in seqs:
        s_.max_tokens = 2**30
    engine.scheduler.schedule_decode(lookahead=lambda s: max_len - 80, strict=False)
    state = engine.orchestrator._build_fused_state(seqs)
    if args.ctx:
        # steady-state context: distinct random block ids per sequence so
        # the attention kernels pay the real per-block DMA traffic
        nb = engine.orchestrator.fused.target.num_blocks
        m = np.asarray(state["bt_t"]).shape[1]
        bt = np.stack(
            [rng_bt.choice(nb, size=m, replace=False) for _ in range(b)]
        ).astype(np.int32)
        state["bt_t"] = jnp.asarray(bt)
        state["length"] = jnp.full((b,), args.ctx, jnp.int32)
    tokens, length, bt_t = state["tokens"], state["length"], state["bt_t"]
    num_input = jnp.full((b,), gamma, jnp.int32)

    def timed(make_body, init_carry, extra):
        """Time one body evaluation by chaining async dispatches of the
        SMALL jitted body (carry threads the dependency) and differencing
        two rep counts — the former scan-differencing approach compiled
        scan(hi)-sized programs that the remote compiler could not handle
        (50-min compiles, broken-pipe failures)."""
        prog = jax.jit(make_body, donate_argnums=0)

        def run(reps):
            # donation invalidates the input arrays (several variants
            # seed from the same target.kv): chain from a private copy
            c = jax.block_until_ready(
                prog(jax.tree.map(jnp.copy, init_carry), extra)
            )  # compile
            best = 1e9
            for _ in range(2):
                cc = c
                t0 = time.perf_counter()
                for _ in range(reps):
                    cc = prog(cc, extra)
                jax.block_until_ready(cc)
                best = min(best, time.perf_counter() - t0)
                c = cc
            return best

        t_lo, t_hi = run(args.lo), run(args.hi)
        return max(t_hi - t_lo, 1e-9) / (args.hi - args.lo)

    class _Results(dict):
        # print incrementally (labelled provisional — the final summary
        # repeats them with derived rows): compiles are minutes-long over
        # the tunnel and a timed-out run should still leave its numbers
        def __setitem__(self, k, v):
            print(f"  [{k}] {v*1e3:.3f} ms (provisional)", flush=True)
            super().__setitem__(k, v)

    results = _Results()

    # ---- 1. full verify forward (kv carried = real dependency chain;
    # logits folded into the carry so the lm head isn't DCE'd)
    # params/rope travel as jit ARGUMENTS (the `extra` slot): closure
    # captures would inline the full weight set into the HLO as constants
    # — gigabyte programs the remote compiler cannot digest (this is why
    # every previous on-chip probe run hung or broke the compile service)
    pr = (target.params, target.rope_table)

    def body_full(carry, pr_):
        params, rope = pr_
        kv, c = carry
        kv2, logits = fused._target_packed(
            params, rope, kv, tokens, length, num_input, bt_t, gamma,
        )
        return kv2, c + logits.mean()

    if want("full"):
        results["full"] = timed(body_full, (target.kv, jnp.float32(0)), pr)

    # slope probe: same engine, smaller packed window -> separates the
    # per-row cost from the per-forward fixed cost
    if want("full_g7"):
        g2 = max(1, gamma // 2)
        ni2 = jnp.full((b,), g2, jnp.int32)

        def body_full_g2(carry, pr_):
            params, rope = pr_
            kv, c = carry
            kv2, logits = fused._target_packed(
                params, rope, kv, tokens, length, ni2, bt_t, g2,
            )
            return kv2, c + logits.mean()

        r = timed(body_full_g2, (target.kv, jnp.float32(0)), pr)
        results[f"full_g{g2}"] = r
        if "full" in results:
            slope = (results["full"] - r) / (b * (gamma - g2))
            fixed = results["full"] - slope * n_rows
            print(f"  slope {slope*1e6:.2f} us/row, fixed {fixed*1e3:.3f} ms")

    # ---- 2. identity attention (kv write kept)
    def _fwd_with(attn_fn, kv_write):
        from nano_pearl_tpu.models.transformer import forward

        def body(carry, pr_):
            params, rope = pr_
            kv, c = carry
            bsz = block
            j = jnp.arange(gamma, dtype=jnp.int32)[None, :]
            idx = jnp.clip(length[:, None] - num_input[:, None] + j, 0)
            toks = jnp.take_along_axis(tokens, idx, axis=1)
            blk = jnp.take_along_axis(bt_t, idx // bsz, axis=1)
            slots = blk * bsz + idx % bsz
            flat = lambda x: x.reshape(b * gamma)
            hidden, kv2 = forward(
                tcfg, params, kv, flat(toks), flat(idx), flat(slots),
                rope, attn_fn, (bt_t, flat(idx + 1)),
                kv_write_fn=kv_write,
            )
            logits = compute_logits(tcfg, params, hidden)
            return kv2, c + logits.mean()

        return body

    id_attn = lambda q, cache, li, *a: q
    if want("id_attn"):
        results["id_attn"] = timed(
            _fwd_with(id_attn, target._kv_write), (target.kv, jnp.float32(0)), pr
        )
    if want("id_nokv"):
        results["id_nokv"] = timed(
            _fwd_with(id_attn, lambda c, k, v, s, li: c),
            (target.kv, jnp.float32(0)), pr,
        )

    # ---- GEMM-stack variants on a chained hidden carry
    layers = target.params["layers"]
    dt = jnp.dtype(tcfg.dtype)
    x0 = jnp.asarray(
        rng.standard_normal((n_rows, 1024)) * 0.02, dt
    )
    rope_rows = target.rope_table[jnp.tile(jnp.arange(gamma), b)]
    d = tcfg.head_dim
    n_q, n_kv = tcfg.num_attention_heads, tcfg.num_key_value_heads

    def sep_layer(x, lp):
        h1 = rms_norm(x, lp["input_ln"], eps)
        q = h1 @ lp["wq"]
        k = h1 @ lp["wk"]
        v = h1 @ lp["wv"]
        q = apply_rope(q.reshape(-1, n_q, d), rope_rows).reshape(-1, n_q * d)
        k = apply_rope(k.reshape(-1, n_kv, d), rope_rows).reshape(-1, n_kv * d)
        attn = q @ lp["wo"]
        res = (attn.astype(jnp.float32) + x.astype(jnp.float32)).astype(dt)
        h2 = rms_norm(res, lp["post_ln"], eps)
        act = jax.nn.silu((h2 @ lp["wgate"]).astype(jnp.float32)).astype(dt) * (
            h2 @ lp["wup"]
        )
        out = act @ lp["wdown"]
        return (out.astype(jnp.float32) + res.astype(jnp.float32)).astype(dt) + 0 * (
            v.sum()
        )

    def body_sep_scan(x, ls):
        def step(c, lp):
            return sep_layer(c, lp), None

        x, _ = jax.lax.scan(step, x, ls)
        return x

    if want("sep_scan"):
        results["sep_scan"] = timed(body_sep_scan, x0, layers)

    wqkv = jnp.concatenate([layers["wq"], layers["wk"], layers["wv"]], axis=2)
    wgu = jnp.concatenate([layers["wgate"], layers["wup"]], axis=2)
    fused_layers = {
        "input_ln": layers["input_ln"], "post_ln": layers["post_ln"],
        "wqkv": wqkv, "wo": layers["wo"], "wgu": wgu, "wdown": layers["wdown"],
    }
    hq, hkv = n_q * d, n_kv * d

    def fused_layer(x, lp):
        h1 = rms_norm(x, lp["input_ln"], eps)
        qkv = h1 @ lp["wqkv"]
        q, k, v = qkv[:, :hq], qkv[:, hq : hq + hkv], qkv[:, hq + hkv :]
        q = apply_rope(q.reshape(-1, n_q, d), rope_rows).reshape(-1, hq)
        k = apply_rope(k.reshape(-1, n_kv, d), rope_rows).reshape(-1, hkv)
        attn = q @ lp["wo"]
        res = (attn.astype(jnp.float32) + x.astype(jnp.float32)).astype(dt)
        h2 = rms_norm(res, lp["post_ln"], eps)
        gu = h2 @ lp["wgu"]
        act = jax.nn.silu(gu[:, :4096].astype(jnp.float32)).astype(dt) * gu[:, 4096:]
        out = act @ lp["wdown"]
        return (out.astype(jnp.float32) + res.astype(jnp.float32)).astype(dt) + 0 * (
            v.sum()
        )

    def body_fused_scan(x, ls):
        def step(c, lp):
            return fused_layer(c, lp), None

        x, _ = jax.lax.scan(step, x, ls)
        return x

    if want("fused_scan"):
        results["fused_scan"] = timed(body_fused_scan, x0, fused_layers)

    per_layer = [
        jax.tree.map(lambda a: a[i], layers) for i in range(args.target_layers)
    ]

    def body_sep_unroll(x, ls):
        for lp in ls:
            x = sep_layer(x, lp)
        return x

    if want("sep_unroll"):
        results["sep_unroll"] = timed(body_sep_unroll, x0, per_layer)

    # ---- lm head alone
    def body_lm(x, pr_):
        logits = compute_logits(tcfg, pr_[0], x)
        return (x.astype(jnp.float32) + 1e-6 * logits[:, :1024]).astype(dt)

    if want("lm_head"):
        results["lm_head+chain"] = timed(body_lm, x0, pr)

    print(f"\nrows={n_rows} layers={args.target_layers} "
          f"backend={jax.default_backend()}")
    for k, v in results.items():
        print(f"  {k:14s} {v*1e3:8.3f} ms  ({v/n_rows*1e6:6.2f} us/row)")
    if "full" in results and "id_attn" in results:
        print(f"  attn-implied   {(results['full']-results['id_attn'])*1e3:8.3f} ms")
    if "id_attn" in results and "id_nokv" in results:
        print(f"  kvwrite-impl   {(results['id_attn']-results['id_nokv'])*1e3:8.3f} ms")


if __name__ == "__main__":
    main()
