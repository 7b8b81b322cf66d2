"""On-chip micro-probe #3: WHY do KV writes cost ~2.9 ms inside the real
forward when the identical scatters are ~0.03 ms isolated?

probe_verify_breakdown.py (id_attn - id_nokv) pins +2.9 ms on the write
path of the 36L/448-row verify forward; probe_kv_write.py measures the
same scan-of-scatters at 0.03 ms when it is the ONLY thing in the
program; an optimization_barrier fence between producers and scatter
changed nothing. These variants separate the remaining structural
candidates — every one is a 36-iteration lax.scan carrying
(x [448,1024], cache [36,2,265,256,256] bf16 donated), differing only in
what touches the cache per iteration:

  chain        GEMM chain only; cache passes through the carry untouched
  dep448       chain + per-layer scatter of 2x448 CHAIN-DERIVED rows
               (the real forward's pattern; expect chain+2.9ms if this
               probe reproduces the breakdown)
  const448     chain + per-layer scatter of 2x448 rows taken from an
               INPUT buffer (no data dependence on the chain)
  dep1         chain + per-layer scatter of 2x1 chain-derived row
               (if this also costs ~2.9 ms the cost is per-SCATTER-OP /
               carry-aliasing, not per-row)
  dep448_dus   chain + per-layer in-place update expressed as ONE
               dynamic_update_slice of a [448] contiguous run per plane
               (no scatter op at all; slots contiguous 8-aligned)

Deferred-writeback candidates (chain stacks per-layer K rows into
fresh [L, N, HD]; ONE writeback after the scan):

  def_rowsct   row scatter of 2*L*N rows (write_fresh_jnp today)
  def_winsct   lax.scatter with B window indices, window [L, 2, R, HD]
               (probe_kv_write2 win_b, now measured IN SITU)
  def_dusloop  lax.scan over B seqs, one dynamic_update_slice
               [L, 2, R, HD] per seq

First-round verdict (v5e 2026-08-20): scatter cost is ~80 ns per ROW
in situ regardless of data dependence (dep448 == const448 ~ +2.84 ms)
while the same write as DUS is +0.38 ms — scatters lower to a per-row
path, DUS to bulk DMA.

Run on the real chip: python tools/probe_kv_write3.py
"""

from __future__ import annotations

import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

L, NB, BS, HD = 36, 264, 256, 256
B, R = 32, 14
N = B * R
H = 1024
nb1 = NB + 1


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
    from nano_pearl_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    print(f"backend={jax.default_backend()} L={L} NB={NB} rows={N}", flush=True)
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.normal(size=(L, H, H)) * 0.02, jnp.bfloat16)
    x0 = jnp.asarray(rng.normal(size=(N, H)), jnp.bfloat16)
    kfix = jnp.asarray(rng.normal(size=(N, HD)), jnp.bfloat16)
    # per-seq contiguous 8-aligned runs (the bench verify pattern)
    base = (np.arange(B) * 5 + 1) % NB
    slots = jnp.asarray(
        (base[:, None] * BS + 8 * (np.arange(R)[None, :] // 8) * 0
         + np.arange(R)[None, :]).reshape(-1),
        jnp.int32,
    )

    def scatter(cache, li, kk, vv, nrows):
        rows = cache.reshape(-1, HD)
        k_off = (li * 2) * nb1 * BS
        v_off = (li * 2 + 1) * nb1 * BS
        s = slots[:nrows]
        rows = rows.at[k_off + s].set(kk[:nrows], mode="drop")
        rows = rows.at[v_off + s].set(vv[:nrows], mode="drop")
        return rows.reshape(cache.shape)

    def make(variant):
        deferred = variant.startswith("def_")

        def fn(cache, x0):
            def layer(carry, xs):
                x, c = carry
                wi, li = xs
                x = jnp.dot(x, wi, preferred_element_type=jnp.float32).astype(x.dtype)
                if variant == "chain" or deferred:
                    pass
                elif variant == "dep448":
                    c = scatter(c, li, x[:, :HD], x[:, HD : 2 * HD], N)
                elif variant == "const448":
                    c = scatter(c, li, kfix, kfix, N)
                elif variant == "dep1":
                    c = scatter(c, li, x[:1, :HD], x[:1, HD : 2 * HD], 1)
                elif variant == "dep448_dus":
                    flat = c.reshape(-1, HD)
                    k_off = (li * 2) * nb1 * BS + BS  # block 1, aligned
                    v_off = (li * 2 + 1) * nb1 * BS + BS
                    flat = jax.lax.dynamic_update_slice(flat, x[:, :HD], (k_off, 0))
                    flat = jax.lax.dynamic_update_slice(
                        flat, x[:, HD : 2 * HD], (v_off, 0)
                    )
                    c = flat.reshape(c.shape)
                return (x, c), x[:, :HD] if deferred else 0

            (x, cache), ks = jax.lax.scan(layer, (x0, cache), (w, jnp.arange(L)))
            if deferred:
                fresh = jnp.stack([ks, ks], axis=1)  # [L, 2, N, HD]
                s0 = slots.reshape(B, R)[:, 0]
                if variant == "def_rowsct":
                    rows = cache.reshape(-1, HD)
                    li = jnp.arange(L, dtype=jnp.int32)[:, None]
                    k_idx = ((li * 2) * nb1 * BS + slots[None, :]).reshape(-1)
                    v_idx = ((li * 2 + 1) * nb1 * BS + slots[None, :]).reshape(-1)
                    idx = jnp.concatenate([k_idx, v_idx])
                    vals = jnp.concatenate(
                        [fresh[:, 0].reshape(-1, HD), fresh[:, 1].reshape(-1, HD)]
                    )
                    cache = rows.at[idx].set(vals, mode="drop").reshape(cache.shape)
                elif variant == "def_winsct":
                    op = cache.reshape(L, 2, nb1 * BS, HD)
                    upd = fresh.reshape(L, 2, B, R, HD).transpose(2, 0, 1, 3, 4)
                    dn = jax.lax.ScatterDimensionNumbers(
                        update_window_dims=(1, 2, 3, 4),
                        inserted_window_dims=(),
                        scatter_dims_to_operand_dims=(2,),
                    )
                    cache = jax.lax.scatter(
                        op, s0[:, None], upd, dn, unique_indices=True,
                        mode="clip",
                    ).reshape(cache.shape)
                elif variant == "def_dusloop":
                    fb = fresh.reshape(L, 2, B, R, HD)

                    def seq(c, i):
                        return jax.lax.dynamic_update_slice(
                            c, fb[:, :, i], (0, 0, s0[i], 0)
                        ), 0

                    op = cache.reshape(L, 2, nb1 * BS, HD)
                    op, _ = jax.lax.scan(seq, op, jnp.arange(B))
                    cache = op.reshape(cache.shape)
            # fold x into one cache cell so neither the chain nor the
            # writes can be dead-code-eliminated, without a full-cache op
            return cache.at[0, 0, 0, 0, 0].add(x.astype(jnp.float32).mean().astype(cache.dtype))

        return fn

    for name in (
        "chain", "dep448", "const448", "dep1", "dep448_dus",
        "def_rowsct", "def_winsct", "def_dusloop",
    ):
        cache = jnp.zeros((L, 2, nb1, BS, HD), jnp.bfloat16)
        ms = timed(make(name), (cache, x0))
        print(f"  {name:12s} {ms:8.3f} ms", flush=True)


if __name__ == "__main__":
    main()
