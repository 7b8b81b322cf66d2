"""On-chip probe: mono (grid=1) paged-attention kernels vs the db kernels.

Validates numerics on the chip (mono == db on real data) and times one
layer of decode attention (r=1, B rows) and one layer of grouped verify
attention (R rows/group) at the bench shapes, for both kernels. The db
kernels pay ~2.7 us per grid step (32 steps/layer); the mono kernels run
the layer as ONE grid step with an in-kernel (group, chunk) stream.

Writes progress unbuffered; run as:  python tools/probe_mono_attn.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from nano_pearl_tpu.utils.compile_cache import enable_compile_cache

L, NB, BS, HKV, D = 36, 520, 256, 2, 128
HQ = 8
HD = HKV * D
B, R = 32, 14
CTX = 1000  # per-row context (bench regime)


def timed(fn, args, iters=50):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    enable_compile_cache()
    print(f"backend={jax.default_backend()}", flush=True)
    from nano_pearl_tpu.ops.pallas import paged_attention as pa

    rng = np.random.default_rng(0)
    cache = jnp.asarray(
        rng.normal(size=(L, 2, NB + 1, BS, HD)).astype(np.float32), jnp.bfloat16
    )
    scale = D**-0.5

    # ---- decode shape: B rows, each its own table
    q1 = jnp.asarray(rng.normal(size=(B, HQ, D)).astype(np.float32), jnp.bfloat16)
    m = (CTX + BS - 1) // BS + 2
    bt1 = jnp.asarray(
        rng.permutation(NB)[: B * m].reshape(B, m).astype(np.int32)
    )
    ctx1 = jnp.asarray(rng.integers(1, CTX, size=B).astype(np.int32))

    def run(mono: bool, grouped: bool):
        os.environ["NANO_PEARL_MONO"] = "1" if mono else "0"
        if grouped:
            fn = jax.jit(
                lambda q, c, bt, cl: pa.paged_attention_pallas_grouped(
                    q, c, 7, bt, cl, scale, R
                )
            )
            return fn
        fn = jax.jit(
            lambda q, c, bt, cl: pa.paged_attention_pallas(q, c, 7, bt, cl, scale)
        )
        return fn

    print("[decode] compiling db...", flush=True)
    o_db = run(False, False)(q1, cache, bt1, ctx1)
    jax.block_until_ready(o_db)
    print("[decode] compiling mono...", flush=True)
    o_mono = run(True, False)(q1, cache, bt1, ctx1)
    jax.block_until_ready(o_mono)
    diff = float(jnp.max(jnp.abs(o_db.astype(jnp.float32) - o_mono.astype(jnp.float32))))
    print(f"[decode] mono vs db max|diff| = {diff:.2e}", flush=True)
    t_db = timed(run(False, False), (q1, cache, bt1, ctx1))
    t_mono = timed(run(True, False), (q1, cache, bt1, ctx1))
    print(f"[decode] db {t_db:.3f} ms/layer  mono {t_mono:.3f} ms/layer "
          f"({t_db / t_mono:.2f}x)", flush=True)

    # ---- grouped verify shape: B groups x R rows
    qg = jnp.asarray(
        rng.normal(size=(B * R, HQ, D)).astype(np.float32), jnp.bfloat16
    )
    ctxg = (
        ctx1[:, None] + jnp.arange(R, dtype=jnp.int32)[None, :]
    ).reshape(-1)
    print("[verify] compiling db...", flush=True)
    g_db = run(False, True)(qg, cache, bt1, ctxg)
    jax.block_until_ready(g_db)
    print("[verify] compiling mono...", flush=True)
    g_mono = run(True, True)(qg, cache, bt1, ctxg)
    jax.block_until_ready(g_mono)
    diff = float(jnp.max(jnp.abs(g_db.astype(jnp.float32) - g_mono.astype(jnp.float32))))
    print(f"[verify] mono vs db max|diff| = {diff:.2e}", flush=True)
    t_db = timed(run(False, True), (qg, cache, bt1, ctxg))
    t_mono = timed(run(True, True), (qg, cache, bt1, ctxg))
    print(f"[verify] db {t_db:.3f} ms/layer  mono {t_mono:.3f} ms/layer "
          f"({t_db / t_mono:.2f}x)", flush=True)


if __name__ == "__main__":
    main()
