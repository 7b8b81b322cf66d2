"""Compile-validate the Pallas kernels' native Mosaic lowering on the
real TPU chip (everything here runs interpret-mode in CI; the native
lowering — notably the partial kernels' ``m_ref[0, :] = m_scr[:, 0]``
sublane->lane finalize write — is only exercised on hardware).

Covers, on one-device ("sp","tp") meshes so no multi-chip is needed:
  1. paged_attention_pallas              (decode, bf16 + int8 cache)
  2. paged_attention_pallas_grouped      (packed verify, bf16 + int8)
  3. sp_paged_attention(use_pallas)      -> _kernel_partial[_q8]
  4. sp_paged_attention_grouped(.)       -> _grouped_kernel_partial[_q8]
  5. tp_* shard_map wrappers             (decode/grouped/prefill)
Each case compares against paged_attention_jnp on-chip.

Usage: timeout 1200 python tools/validate_partial_kernels_chip.py
"""

from __future__ import annotations

import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

jax.config.update("jax_compilation_cache_dir", "/tmp/nano_pearl_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

from nano_pearl_tpu.ops.attention import paged_attention_jnp
from nano_pearl_tpu.ops.kv_cache import make_kv_cache, write_kv
from nano_pearl_tpu.ops.pallas.paged_attention import (
    paged_attention_pallas,
    paged_attention_pallas_grouped,
)
from nano_pearl_tpu.parallel import sp as spmod
from nano_pearl_tpu.parallel import tp_attn


def _mesh():
    dev = np.array(jax.devices()[:1]).reshape(1, 1)
    return Mesh(dev, ("sp", "tp"))


def _inputs(rng, *, quant=None, dtype=jnp.bfloat16):
    nb, bs, hkv, hq, d, n, m = 8, 16, 2, 8, 64, 6, 4
    cache = make_kv_cache(2, nb, bs, hkv, d, dtype=jnp.bfloat16, quant=quant)
    k = jnp.asarray(rng.standard_normal((nb * bs, hkv, d)), dtype)
    v = jnp.asarray(rng.standard_normal((nb * bs, hkv, d)), dtype)
    slots = jnp.arange(nb * bs, dtype=jnp.int32)
    for li in range(2):
        cache = jax.jit(write_kv, static_argnums=())(cache, k, v, slots, li)
    q = jnp.asarray(rng.standard_normal((n, hq, d)), dtype)
    bt = jnp.asarray(rng.integers(0, nb, (n, m)).astype(np.int32))
    ctx = jnp.asarray(rng.integers(1, m * bs + 1, (n,)).astype(np.int32))
    return cache, q, bt, ctx, d**-0.5


def _check(name, got, want, tol=2e-2):
    g = np.asarray(got, np.float32)
    w = np.asarray(want, np.float32)
    err = float(np.max(np.abs(g - w)))
    ok = err < tol
    print(f"{'PASS' if ok else 'FAIL'} {name}: max|err|={err:.2e}")
    return ok


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--interpret", action="store_true",
                    help="CPU plumbing smoke (native Mosaic needs the chip)")
    args = ap.parse_args()
    itp = args.interpret
    if itp:
        jax.config.update("jax_platforms", "cpu")

    rng = np.random.default_rng(0)
    mesh = _mesh()
    ok = True
    for quant in (None, "int8"):
        tag = quant or "bf16"
        cache, q, bt, ctx, scale = _inputs(rng, quant=quant)
        want = jax.jit(paged_attention_jnp, static_argnums=(5,))(
            q, cache, 0, bt, ctx, scale
        )

        got = jax.jit(
            functools.partial(paged_attention_pallas, scale=scale, interpret=itp)
        )(q, cache, 0, bt, ctx)
        ok &= _check(f"decode/{tag}", got, want)

        rows = 3
        gq = jnp.asarray(np.random.default_rng(1).standard_normal((2 * rows, 8, 64)), q.dtype)
        gbt = bt[:2]
        gctx = jnp.asarray(
            np.array([10, 11, 12, 40, 1, 1], np.int32)  # staircase + pre-verify pad
        )
        gwant = jax.jit(paged_attention_jnp, static_argnums=(5,))(
            gq, cache, 0, jnp.repeat(gbt, rows, axis=0), gctx, scale
        )
        got = jax.jit(
            functools.partial(paged_attention_pallas_grouped, scale=scale,
                              rows_per_group=rows, interpret=itp)
        )(gq, cache, 0, gbt, gctx)
        ok &= _check(f"grouped/{tag}", got, gwant)

        with mesh:
            got = jax.jit(
                functools.partial(spmod.sp_paged_attention, mesh, scale=scale,
                                  use_pallas=True, interpret=itp)
            )(q, cache, 0, bt, ctx)
            ok &= _check(f"sp-partial/{tag}", got, want)

            got = jax.jit(
                functools.partial(spmod.sp_paged_attention_grouped, mesh,
                                  scale=scale, rows_per_group=rows,
                                  use_pallas=True, interpret=itp)
            )(gq, cache, 0, gbt, gctx)
            ok &= _check(f"sp-grouped-partial/{tag}", got, gwant)

            got = jax.jit(
                functools.partial(tp_attn.tp_paged_attention, mesh, scale=scale,
                                  interpret=itp)
            )(q, cache, 0, bt, ctx)
            ok &= _check(f"tp-wrapper/{tag}", got, want)

            got = jax.jit(
                functools.partial(tp_attn.tp_paged_attention_grouped, mesh,
                                  scale=scale, rows_per_group=rows,
                                  interpret=itp)
            )(gq, cache, 0, gbt, gctx)
            ok &= _check(f"tp-grouped-wrapper/{tag}", got, gwant)

    print("ALL PASS" if ok else "FAILURES PRESENT")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
