#!/usr/bin/env python
"""Micro-bench: per-window cost of a VMEM-resident masked add vs the
per-window U-tile DMA of the deployed region kernel.

The candidate extend-add redesign ("gblock") stages C blocks in VMEM and
turns each window's U-tile HBM DMA (~170 ns issue) into a VMEM
dynamic-slice masked subtract.  Whether that wins is decided by the
scalar-core issue cost of the VMEM op — measured here with a synthetic
kernel: one resident store tile + one resident C buffer, N windows of
packed (ds, dc, uoff, len) applied in a fori loop.

    PYTHONPATH=/root/repo python scripts_vmemwin_bench.py [nwin]
"""

import functools
import sys
import time

import numpy as np


def main():
    from sparsecholesky_tpu.utils.cache import setup_runtime

    setup_runtime()
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    LANE = 128
    T = 16
    RB = 1024
    CROWS = 4096

    nwin = int(sys.argv[1]) if len(sys.argv) > 1 else 65536
    rng = np.random.default_rng(7)
    ds = rng.integers(0, RB - T, size=nwin)
    dc = rng.integers(0, CROWS - T, size=nwin)
    uoff = rng.integers(0, 4, size=nwin)
    vlen = rng.integers(1, T - 3, size=nwin)
    w1 = ((ds << 20) | (dc << 8) | (uoff << 4) | vlen).astype(np.int32)

    def kern(w1_ref, c_hbm, lx_ref, _out, wbuf, cbuf, wsem, csem, *, nw):
        pltpu.make_async_copy(lx_ref.at[pl.ds(0, RB)], wbuf, wsem).start()
        pltpu.make_async_copy(c_hbm.at[pl.ds(0, CROWS)], cbuf, csem).start()
        pltpu.make_async_copy(lx_ref.at[pl.ds(0, RB)], wbuf, wsem).wait()
        pltpu.make_async_copy(c_hbm.at[pl.ds(0, CROWS)], cbuf, csem).wait()
        kk = jax.lax.broadcasted_iota(jnp.int32, (T, 1), 0)

        def body(r, _):
            w = w1_ref[r]
            s = w >> 20
            c = (w >> 8) & 0xFFF
            uo = (w >> 4) & 0xF
            ln = w & 0xF
            mask = (kk >= uo) & (kk < uo + ln)
            cur = wbuf[pl.ds(s, T)]
            wbuf[pl.ds(s, T)] = cur - jnp.where(mask, cbuf[pl.ds(c, T)], 0.0)
            return 0

        jax.lax.fori_loop(0, nw, body, 0, unroll=False)
        pltpu.make_async_copy(wbuf, lx_ref.at[pl.ds(0, RB)], wsem).start()
        pltpu.make_async_copy(wbuf, lx_ref.at[pl.ds(0, RB)], wsem).wait()

    @functools.partial(jax.jit, static_argnames=("nw",))
    def run(Lx, Cf, w1, nw):
        return pl.pallas_call(
            functools.partial(kern, nw=nw),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(1,),
                in_specs=[
                    pl.BlockSpec(memory_space=pltpu.ANY),
                    pl.BlockSpec(memory_space=pltpu.ANY),
                ],
                out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
                scratch_shapes=[
                    pltpu.VMEM((RB, LANE), jnp.float32),
                    pltpu.VMEM((CROWS, LANE), jnp.float32),
                    pltpu.SemaphoreType.DMA,
                    pltpu.SemaphoreType.DMA,
                ],
            ),
            out_shape=jax.ShapeDtypeStruct(Lx.shape, Lx.dtype),
            input_output_aliases={2: 0},
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
        )(w1, Cf, Lx)

    Lx = jnp.zeros((RB + 8, LANE), jnp.float32)
    Cf = jnp.ones((CROWS, LANE), jnp.float32)
    w1j = jnp.asarray(w1)

    out = run(Lx, Cf, w1j, nwin)
    float(jnp.sum(out[:8]))
    K = 10
    t0 = time.time()
    for _ in range(K):
        out = run(out, Cf, w1j, nwin)
    float(jnp.sum(out[:8]))
    per = (time.time() - t0) / K / nwin * 1e9
    print(f"vmem window op: {per:.0f} ns/window ({nwin} windows)",
          flush=True)


if __name__ == "__main__":
    main()
