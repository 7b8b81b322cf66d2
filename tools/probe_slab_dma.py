"""On-chip Mosaic construct probe for the slab-RMW KV writeback kernel.

The parked kernel (ops/pallas/kv_writeback.py) needs a DMA at an
arbitrary ROW offset — a dynamic ds on the sublane-tiled dim, which this
toolchain's Mosaic rejects (remote-compile HTTP 500; bisected 2026-08-19,
see ops/kv_cache.write_fresh). The slab-RMW design sidesteps it by making
tile alignment STRUCTURAL: view the cache [L2, M, HD] as
[L2, M/8, 8, HD] (a bitcast — XLA tiles the last two dims (8,128), so an
(8, HD) slab is exactly a tile row-group) and DMA whole slabs at a
dynamic TILE index, i.e. a dynamic ds on an untiled MIDDLE dim with a
full leading slice:

    cache4.at[:, pl.ds(rt, T)]          (probe A — one strided DMA)

Fallback if A crashes: tile-major layout [M/8, L2, 8, HD] with the
dynamic ds on the LEADING dim (the known-good form used by the mono
attention kernels' q/o staging):

    cache_tm.at[pl.ds(rt, T)]           (probe B — contiguous DMA)

Each probe round-trips slabs HBM->VMEM->HBM and checks the values land
where expected; timings give the per-DMA cost at bench-shape slab sizes.

Measured (v5e 2026-08-20, WITH the donation fix — the first run forgot
donate_argnums and measured the 604 MB aliasing copy instead):
  A strided  [L2,NT,8,HD] dyn dim1: OK, ~14.7 us/window DMA
  B tile-major [NT,L2,8,HD] dyn dim0: OK, ~10.1 us/window DMA
Both forms compile and are correct; at 64 windows/round that is
~0.6-0.9 ms serialized — no better than the windowed-DUS writeback XLA
emits (ops/kv_cache.write_fresh_windows, ~0.4 ms), so the Pallas slab
kernel stays unbuilt.

Run on the real chip: python tools/probe_slab_dma.py
"""

from __future__ import annotations

import functools
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

L2, NT, HD = 72, 2048, 256  # 72 kv planes x 2048 tile-groups x 256 folded
T = 3  # tiles per window (gamma=14 + 7 misalign <= 24 rows)
B = 32  # windows (sequences)


def _kernel_a(rt_ref, src, dst, buf, in_sems, out_sems, *, nwin):
    # [L2, NT, 8, HD]: dynamic ds on dim 1, full slice on dim 0
    def body(i, _):
        s = jax.lax.rem(i, 2)
        d_in = pltpu.make_async_copy(
            src.at[:, pl.ds(rt_ref[i], T)], buf.at[s], in_sems.at[s]
        )
        d_in.start()
        d_in.wait()
        d_out = pltpu.make_async_copy(
            buf.at[s], dst.at[:, pl.ds(rt_ref[i], T)], out_sems.at[s]
        )
        d_out.start()
        d_out.wait()
        return 0

    jax.lax.fori_loop(0, nwin, body, 0)


def _kernel_b(rt_ref, src, dst, buf, in_sems, out_sems, *, nwin):
    # tile-major [NT, L2, 8, HD]: dynamic ds on the leading dim
    def body(i, _):
        s = jax.lax.rem(i, 2)
        d_in = pltpu.make_async_copy(
            src.at[pl.ds(rt_ref[i], T)], buf.at[s], in_sems.at[s]
        )
        d_in.start()
        d_in.wait()
        d_out = pltpu.make_async_copy(
            buf.at[s], dst.at[pl.ds(rt_ref[i], T)], out_sems.at[s]
        )
        d_out.start()
        d_out.wait()
        return 0

    jax.lax.fori_loop(0, nwin, body, 0)


def _call(kernel, src, rt, buf_shape):
    return pl.pallas_call(
        functools.partial(kernel, nwin=rt.shape[0]),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(1,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            scratch_shapes=[
                pltpu.VMEM(buf_shape, src.dtype),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct(src.shape, src.dtype),
        input_output_aliases={1: 0},
    )(rt, src)


def run(name, kernel, shape, buf_shape, sel):
    rng = np.random.default_rng(0)
    rt = jnp.asarray(
        rng.choice(NT - T, size=B, replace=False).astype(np.int32)
    )
    src = jnp.asarray(rng.normal(size=shape), jnp.bfloat16)
    expect = np.asarray(src)
    try:
        # donate: the pallas-level input_output_aliases needs the jit
        # input donated, else XLA copies the whole 604 MB cache per call
        # (the first version of this probe measured exactly that artifact)
        f = jax.jit(lambda s: _call(kernel, s, rt, buf_shape), donate_argnums=0)
        out = f(src)
        jax.block_until_ready(out)
    except Exception as e:  # noqa: BLE001
        print(f"  {name}: CRASH {type(e).__name__}: {str(e)[:200]}", flush=True)
        return
    ok = bool(np.array_equal(np.asarray(out), expect))
    iters = 50
    o = out
    t0 = time.perf_counter()
    for _ in range(iters):
        o = f(o)
    jax.block_until_ready(o)
    ms = (time.perf_counter() - t0) / iters * 1e3
    per_dma = ms / (2 * B) * 1e3
    print(
        f"  {name}: {'OK' if ok else 'VALUE MISMATCH'}  {ms:.3f} ms for "
        f"{2 * B} window DMAs ({per_dma:.2f} us/DMA)",
        flush=True,
    )


def main():
    from nano_pearl_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    print(f"backend={jax.default_backend()} L2={L2} NT={NT} HD={HD} T={T} B={B}",
          flush=True)
    run("A strided [L2,NT,8,HD] dyn dim1", _kernel_a, (L2, NT, 8, HD),
        (2, L2, T, 8, HD), None)
    run("B tile-major [NT,L2,8,HD] dyn dim0", _kernel_b, (NT, L2, 8, HD),
        (2, T, L2, 8, HD), None)


if __name__ == "__main__":
    main()
