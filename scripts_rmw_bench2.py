"""Deeper-pipelined run-RMW kernel variants (extends scripts_rmw_bench.py).

D: NBUF=8, deferred out-wait: body(r) waits out(r-NBUF+1) (if any) before
   starting in(r+NBUF); all outs drained at the end.  Conflict spacing
   requirement grows to 2*NBUF-1 (plan-side scheduling handles it).
E: like D but the U (update rows) input rides the automatic Pallas pipeline
   via a scalar-prefetch-driven BlockSpec index_map.
"""
import functools
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

R_L = 2_000_000
LANE = 128


def sync(x):
    return float(jnp.sum(x[:8]))


def timeit(f, *args, reps=8):
    out = f(*args)
    sync(out)
    t0 = time.time()
    for _ in range(reps):
        out = f(*args)
    sync(out)
    return (time.time() - t0) / reps


def _kern_d(starts_ref, u_hbm, lx_ref, out_dummy, scratch, usc, sems, usems,
            *, T, nruns, NBUF):
    def in_dma(slot, r):
        return pltpu.make_async_copy(
            lx_ref.at[pl.ds(starts_ref[r], T)], scratch.at[slot],
            sems.at[slot, 0])

    def out_dma(slot, r):
        return pltpu.make_async_copy(
            scratch.at[slot], lx_ref.at[pl.ds(starts_ref[r], T)],
            sems.at[slot, 1])

    def u_dma(slot, r):
        return pltpu.make_async_copy(
            u_hbm.at[pl.ds(r * T, T)], usc.at[slot], usems.at[slot])

    for k in range(min(NBUF, nruns)):
        in_dma(k, k).start()
        u_dma(k, k).start()

    def body(r, _):
        slot = r % NBUF
        in_dma(slot, r).wait()
        u_dma(slot, r).wait()
        scratch[slot] = scratch[slot] + usc[slot]
        out_dma(slot, r).start()

        @pl.when(r + NBUF < nruns)
        def _():
            # the slot we are about to prefetch into was last written by
            # run r+NBUF-NBUF = r ... its out started just above; wait the
            # PREVIOUS occupant of the next slot: run r+1-NBUF+... simpler:
            # wait out of (r+NBUF)-NBUF = r? that's the serial variant.
            # Here: next prefetch goes to slot (r+NBUF)%NBUF == slot, whose
            # last out is the one just started -> must wait it.  To defer,
            # use 2*NBUF scratch slots below instead.
            out_dma(slot, r).wait()
            in_dma(slot, r + NBUF).start()
            u_dma(slot, r + NBUF).start()
        return 0

    jax.lax.fori_loop(0, nruns, body, 0)


def _kern_d2(starts_ref, u_hbm, lx_ref, out_dummy, scratch, usc, sems, usems,
             *, T, nruns, NSLOT):
    """2x slots: slot cycle length NSLOT=2*NBUF; wait of a slot's previous
    out happens NSLOT runs later -> write latency fully hidden."""
    def in_dma(slot, r):
        return pltpu.make_async_copy(
            lx_ref.at[pl.ds(starts_ref[r], T)], scratch.at[slot],
            sems.at[slot, 0])

    def out_dma(slot, r):
        return pltpu.make_async_copy(
            scratch.at[slot], lx_ref.at[pl.ds(starts_ref[r], T)],
            sems.at[slot, 1])

    def u_dma(slot, r):
        return pltpu.make_async_copy(
            u_hbm.at[pl.ds(r * T, T)], usc.at[slot], usems.at[slot])

    for k in range(min(NSLOT, nruns)):
        in_dma(k, k).start()
        u_dma(k, k).start()

    def body(r, _):
        slot = r % NSLOT
        in_dma(slot, r).wait()
        u_dma(slot, r).wait()
        scratch[slot] = scratch[slot] + usc[slot]
        out_dma(slot, r).start()

        @pl.when(r + NSLOT < nruns)
        def _():
            out_dma(slot, r).wait()   # deferred: this out already had NSLOT
            in_dma(slot, r + NSLOT).start()   # runs of latency to finish
            u_dma(slot, r + NSLOT).start()
        return 0

    jax.lax.fori_loop(0, nruns, body, 0)
    # drain tail outs
    for k in range(min(NSLOT, nruns)):
        r = nruns - min(NSLOT, nruns) + k
        out_dma(r % NSLOT, r).wait()


@functools.partial(jax.jit, static_argnames=("T", "variant", "depth"))
def pallas_rmw2(Lx, starts, U, T, variant="d2", depth=8):
    nruns = starts.shape[0]
    kern = functools.partial(
        _kern_d2 if variant == "d2" else _kern_d,
        T=T, nruns=nruns, **({"NSLOT": depth} if variant == "d2" else {"NBUF": depth}),
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        scratch_shapes=[
            pltpu.VMEM((depth, T, LANE), jnp.float32),
            pltpu.VMEM((depth, T, LANE), jnp.float32),
            pltpu.SemaphoreType.DMA((depth, 2)),
            pltpu.SemaphoreType.DMA((depth,)),
        ],
    )
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(Lx.shape, Lx.dtype),
        input_output_aliases={2: 0},
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(starts, U.reshape(-1, LANE), Lx)


def main():
    rng = np.random.default_rng(0)
    Lx = jnp.zeros((R_L, LANE), jnp.float32)
    for variant, depth in (("d2", 8), ("d2", 16)):
        for T in (8, 16, 32):
            nruns = 2_000_000 // T
            starts = rng.choice(R_L // T, size=nruns, replace=False).astype(np.int32) * T
            starts = jnp.asarray(starts)
            U = jnp.ones((nruns, T, LANE), jnp.float32)
            try:
                dt = timeit(pallas_rmw2, Lx, starts, U, T, variant, depth)
                gb = nruns * T * LANE * 4 * 3 / 1e9
                print(f"{variant} depth={depth} T={T:>3}: nruns={nruns:>8,} "
                      f"{dt*1e3:7.2f} ms  {gb/dt:7.1f} GB/s  "
                      f"{dt/nruns*1e9:6.1f} ns/run")
            except Exception as e:
                print(f"{variant} depth={depth} T={T}: FAILED {type(e).__name__} {str(e)[:200]}")


if __name__ == "__main__":
    main()
