"""On-chip micro-probe: KV-write scatter variants at the bench verify shape.

The verify-breakdown probe (tools/probe_verify_breakdown.py) implies
~2.9 ms of KV-write cost per packed-verify forward (448 rows x 36
layers) after the folded-cache-layout fix — against a traffic roofline
of ~0.04 ms (448 rows x 512 B x 2 x 36 layers = 16.5 MB at 819 GB/s).
This probe times the scatter in isolation and A/Bs variants:

  sep      two .at[].set scatters per layer (k, v) — the current write_kv
  fused    ONE scatter per layer (k and v rows concatenated)
  dus      per-sequence dynamic_update_slice runs (verify rows of one
           sequence are CONTIGUOUS slots when they don't cross a block
           boundary — here aligned by construction)

Run on the real chip: python tools/probe_kv_write.py
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

L, NB, BS, HKV, D = 36, 520, 256, 2, 128
B, R = 32, 14  # sequences x packed rows (bench verify shape)
N = B * R


def timed(fn, args, iters=30):
    jfn = jax.jit(fn, donate_argnums=0)
    out = jfn(*args)
    jax.block_until_ready(out)
    args = (out,) + args[1:]
    t0 = time.perf_counter()
    for _ in range(iters):
        args = (jfn(*args),) + args[1:]
    jax.block_until_ready(args[0])
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    print(f"backend={jax.default_backend()} shape L={L} NB={NB} BS={BS} "
          f"HkvD={HKV * D} rows={N}")
    k = jnp.ones((N, HKV * D), jnp.bfloat16)
    v = jnp.full((N, HKV * D), 2.0, jnp.bfloat16)
    # per-seq contiguous slots, block-aligned so each seq is ONE run
    base = (np.arange(B) * 3) % NB
    slots = jnp.asarray(
        (base[:, None] * BS + np.arange(R)[None, :]).reshape(-1), jnp.int32
    )
    nb1 = NB + 1

    def sep(cache, k, v, slots):
        def layer(c, li):
            rows = c.reshape(-1, HKV * D)
            k_off = (li * 2) * nb1 * BS
            v_off = (li * 2 + 1) * nb1 * BS
            rows = rows.at[k_off + slots].set(k, mode="drop")
            rows = rows.at[v_off + slots].set(v, mode="drop")
            return rows.reshape(c.shape), 0
        c, _ = jax.lax.scan(layer, cache, jnp.arange(L))
        return c

    def fused(cache, k, v, slots):
        kv = jnp.concatenate([k, v])
        def layer(c, li):
            rows = c.reshape(-1, HKV * D)
            k_off = (li * 2) * nb1 * BS
            v_off = (li * 2 + 1) * nb1 * BS
            idx = jnp.concatenate([k_off + slots, v_off + slots])
            rows = rows.at[idx].set(kv, mode="drop")
            return rows.reshape(c.shape), 0
        c, _ = jax.lax.scan(layer, cache, jnp.arange(L))
        return c

    def dus(cache, k, v, slots):
        # per-sequence contiguous runs: R rows per dynamic_update_slice
        kb = k.reshape(B, R, HKV * D)
        vb = v.reshape(B, R, HKV * D)
        starts = slots.reshape(B, R)[:, 0]
        def layer(c, li):
            rows = c.reshape(-1, HKV * D)
            k_off = (li * 2) * nb1 * BS
            v_off = (li * 2 + 1) * nb1 * BS
            def seq(rows, i):
                rows = jax.lax.dynamic_update_slice(rows, kb[i], (k_off + starts[i], 0))
                rows = jax.lax.dynamic_update_slice(rows, vb[i], (v_off + starts[i], 0))
                return rows, 0
            rows, _ = jax.lax.scan(seq, rows, jnp.arange(B))
            return rows.reshape(c.shape), 0
        c, _ = jax.lax.scan(layer, cache, jnp.arange(L))
        return c

    # in-situ shape: interleave a per-layer GEMM chain with the scatter
    # (the verify breakdown implies ~2.9 ms of write cost INSIDE the real
    # forward vs ~0.04 ms isolated — these variants hunt the interaction)
    H = 1024
    w = jnp.ones((L, H, H), jnp.bfloat16) * 0.01
    x0 = jnp.ones((N, H), jnp.bfloat16)

    def gemm_only(cache, k, v, slots):
        def layer(carry, wi):
            x = carry
            return jnp.dot(x, wi, preferred_element_type=jnp.float32).astype(x.dtype), 0
        x, _ = jax.lax.scan(layer, x0, w)
        return cache + x.mean().astype(cache.dtype) * 0

    def gemm_sep(cache, k, v, slots):
        def layer(carry, xs):
            x, c = carry
            wi, li = xs
            x = jnp.dot(x, wi, preferred_element_type=jnp.float32).astype(x.dtype)
            kk = x[:, : HKV * D]
            rows = c.reshape(-1, HKV * D)
            k_off = (li * 2) * nb1 * BS
            v_off = (li * 2 + 1) * nb1 * BS
            rows = rows.at[k_off + slots].set(kk, mode="drop")
            rows = rows.at[v_off + slots].set(kk, mode="drop")
            return (x, rows.reshape(c.shape)), 0
        (x, c), _ = jax.lax.scan(layer, (x0, cache), (w, jnp.arange(L)))
        return c

    def gemm_fused(cache, k, v, slots):
        def layer(carry, xs):
            x, c = carry
            wi, li = xs
            x = jnp.dot(x, wi, preferred_element_type=jnp.float32).astype(x.dtype)
            kk = x[:, : HKV * D]
            rows = c.reshape(-1, HKV * D)
            k_off = (li * 2) * nb1 * BS
            v_off = (li * 2 + 1) * nb1 * BS
            idx = jnp.concatenate([k_off + slots, v_off + slots])
            rows = rows.at[idx].set(jnp.concatenate([kk, kk]), mode="drop")
            return (x, rows.reshape(c.shape)), 0
        (x, c), _ = jax.lax.scan(layer, (x0, cache), (w, jnp.arange(L)))
        return c

    def gemm_dus(cache, k, v, slots):
        kb_starts = slots.reshape(B, R)[:, 0]
        def layer(carry, xs):
            x, c = carry
            wi, li = xs
            x = jnp.dot(x, wi, preferred_element_type=jnp.float32).astype(x.dtype)
            kk = x[:, : HKV * D].reshape(B, R, HKV * D)
            rows = c.reshape(-1, HKV * D)
            k_off = (li * 2) * nb1 * BS
            v_off = (li * 2 + 1) * nb1 * BS
            def seq(rows, i):
                rows = jax.lax.dynamic_update_slice(rows, kk[i], (k_off + kb_starts[i], 0))
                rows = jax.lax.dynamic_update_slice(rows, kk[i], (v_off + kb_starts[i], 0))
                return rows, 0
            rows, _ = jax.lax.scan(seq, rows, jnp.arange(B))
            return (x, rows.reshape(c.shape)), 0
        (x, c), _ = jax.lax.scan(layer, (x0, cache), (w, jnp.arange(L)))
        return c

    def gemm_deferred(cache, k, v, slots):
        # stack per-layer k as scan OUTPUTS, one big scatter after
        def layer(carry, wi):
            x = carry
            x = jnp.dot(x, wi, preferred_element_type=jnp.float32).astype(x.dtype)
            return x, x[:, : HKV * D]
        x, ks = jax.lax.scan(layer, x0, w)  # ks [L, N, HkvD]
        li = jnp.arange(L, dtype=jnp.int32)[:, None]
        k_idx = (li * 2) * nb1 * BS + slots[None, :]
        v_idx = (li * 2 + 1) * nb1 * BS + slots[None, :]
        rows = cache.reshape(-1, HKV * D)
        idx = jnp.concatenate([k_idx.reshape(-1), v_idx.reshape(-1)])
        vals = jnp.concatenate([ks.reshape(-1, HKV * D)] * 2)
        rows = rows.at[idx].set(vals, mode="drop")
        return rows.reshape(cache.shape)

    for name, fn in [
        ("sep", sep), ("fused", fused), ("dus", dus),
        ("gemm_only", gemm_only), ("gemm_sep", gemm_sep),
        ("gemm_fused", gemm_fused), ("gemm_dus", gemm_dus),
        ("gemm_deferred", gemm_deferred),
    ]:
        # fresh cache per variant: timed() donates it
        cache = jnp.zeros((L, 2, NB + 1, BS, HKV * D), jnp.bfloat16)
        ms = timed(fn, (cache, k, v, slots))
        print(f"  {name:10s} {ms:8.3f} ms  ({ms / L * 1e3:6.1f} us/layer)")


if __name__ == "__main__":
    main()
