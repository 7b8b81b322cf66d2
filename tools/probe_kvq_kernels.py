"""On-chip timing probe: bf16 vs int8/fp8 paged-attention kernels.

Round-4 check for the db/mono-generation quantized kernels
(ops/pallas/paged_attention.py q8v2 section): times one layer's decode
and packed-verify attention at bench shapes against the bf16 kernels.
Run on the real chip:

    python tools/probe_kvq_kernels.py [--kv-heads 2|8] [--ctx 1024]
"""

from __future__ import annotations

import argparse
import time

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--kv-heads", type=int, default=2)
    p.add_argument("--heads", type=int, default=8)
    p.add_argument("--head-dim", type=int, default=128)
    p.add_argument("--ctx", type=int, default=1024)
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--gamma", type=int, default=14)
    p.add_argument("--layers", type=int, default=36)
    p.add_argument("--block-size", type=int, default=256)
    p.add_argument("--iters", type=int, default=30)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from nano_pearl_tpu.ops.kv_cache import make_kv_cache, write_kv
    from nano_pearl_tpu.ops.pallas.paged_attention import (
        paged_attention_pallas,
        paged_attention_pallas_grouped,
    )

    bs = args.block_size
    hkv, hq, d = args.kv_heads, args.heads, args.head_dim
    b, g = args.batch, args.gamma
    m = -(-args.ctx // bs) + 1
    nb = b * m + 4
    l = args.layers
    rng = np.random.default_rng(0)

    def fill(cache):
        n_fill = min(nb * bs, 4 * bs)  # fill a few blocks; timing reads all
        k = jnp.asarray(rng.standard_normal((n_fill, hkv, d)), jnp.bfloat16)
        v = jnp.asarray(rng.standard_normal((n_fill, hkv, d)), jnp.bfloat16)
        return write_kv(cache, k, v, jnp.arange(n_fill, dtype=jnp.int32), 0)

    results = {}
    for quant in (None, "int8", "fp8"):
        cache = make_kv_cache(
            l, nb, bs, hkv, d, dtype=jnp.bfloat16, quant=quant
        )
        cache = fill(cache)
        sz = sum(a.nbytes for a in jax.tree.leaves(cache)) / 2**20
        # decode: one row per sequence
        q1 = jnp.asarray(rng.standard_normal((b, hq, d)), jnp.bfloat16)
        bt = jnp.asarray(
            rng.integers(0, nb - 1, (b, m)).astype(np.int32)
        )
        ctx1 = jnp.full((b,), args.ctx, jnp.int32)
        # verify: gamma rows per sequence, staircase
        qg = jnp.asarray(rng.standard_normal((b * g, hq, d)), jnp.bfloat16)
        ctxg = jnp.asarray(
            (args.ctx + np.tile(np.arange(g), b)).astype(np.int32)
        )

        for name, fn in (
            (
                "decode",
                jax.jit(
                    lambda q, c, t, x: paged_attention_pallas(
                        q, c, 0, t, x, d**-0.5, mono=False
                    )
                ),
            ),
            (
                "decode_mono",
                jax.jit(
                    lambda q, c, t, x: paged_attention_pallas(
                        q, c, 0, t, x, d**-0.5, mono=True
                    )
                ),
            ),
            (
                "verify",
                jax.jit(
                    lambda q, c, t, x: paged_attention_pallas_grouped(
                        q, c, 0, t, x, d**-0.5, g, mono=False
                    )
                ),
            ),
            (
                "verify_mono",
                jax.jit(
                    lambda q, c, t, x: paged_attention_pallas_grouped(
                        q, c, 0, t, x, d**-0.5, g, mono=True
                    )
                ),
            ),
        ):
            qq, cc = (q1, ctx1) if name.startswith("decode") else (qg, ctxg)
            out = fn(qq, cache, bt, cc)
            jax.block_until_ready(out)
            t0 = time.perf_counter()
            for _ in range(args.iters):
                out = fn(qq, cache, bt, cc)
            jax.block_until_ready(out)
            dt = (time.perf_counter() - t0) / args.iters * 1e6
            key = f"{quant or 'bf16'}:{name}"
            results[key] = dt
            print(f"{key:24s} {dt:9.1f} us/layer  (cache {sz:.0f} MiB)", flush=True)

    print()
    for name in ("decode", "decode_mono", "verify", "verify_mono"):
        base = results.get(f"bf16:{name}")
        for quant in ("int8", "fp8"):
            k = f"{quant}:{name}"
            if k in results and base:
                print(f"{k:24s} {results[k] / base:5.2f}x of bf16")


if __name__ == "__main__":
    main()
