"""Microbenchmark: extend-add RMW mechanism candidates on the real chip.

Candidates for scatter-adding K update rows (each 128 lanes f32) into a
[R_L, 128] store:
  A. row scatter-add (current):        Lx.at[rows].add(C)
  B. windowed scatter-add of T-row runs: lax.scatter_add with window (T,128)
  C. Pallas run-RMW kernel: per run, DMA Lx[start:start+T] to VMEM,
     add C tile, DMA back (double-buffered)

Timing: host readback (float(jnp.sum(...))) — block_until_ready does not
wait on the axon backend (CLAUDE.md).
"""
import functools
import time
import sys

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

R_L = 2_000_000          # 1 GB store
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


# --- A: row scatter-add -----------------------------------------------------
@jax.jit
def row_scatter(Lx, rows, C):
    return Lx.at[rows].add(C, mode="drop")


# --- B: windowed scatter-add ------------------------------------------------
@functools.partial(jax.jit, static_argnames=("T",))
def win_scatter(Lx, starts, U, T):
    # U: [nruns, T, LANE]; starts: [nruns] row starts
    dnums = jax.lax.ScatterDimensionNumbers(
        update_window_dims=(1, 2),
        inserted_window_dims=(),
        scatter_dims_to_operand_dims=(0,),
    )
    return jax.lax.scatter_add(
        Lx, starts[:, None], U, dnums,
        mode=jax.lax.GatherScatterMode.CLIP,
    )


# --- C: Pallas run-RMW kernel ----------------------------------------------
def _rmw_kernel(starts_ref, u_hbm, lx_ref, out_dummy, scratch, sems,
                *, T, nruns):
    NBUF = 4

    def in_dma(slot, r):
        return pltpu.make_async_copy(
            lx_ref.at[pl.ds(starts_ref[r], T)],
            scratch.at[slot],
            sems.at[slot, 0],
        )

    def u_dma(slot, r):
        return pltpu.make_async_copy(
            u_hbm.at[pl.ds(r * T, T)],
            scratch.at[NBUF + slot],
            sems.at[slot, 2],
        )

    for k in range(min(NBUF, nruns)):
        in_dma(k, k).start()
        u_dma(k, k).start()

    def body(r, _):
        slot = r % NBUF
        in_dma(slot, r).wait()
        u_dma(slot, r).wait()
        scratch[slot] = scratch[slot] + scratch[NBUF + slot]
        out = pltpu.make_async_copy(
            scratch.at[slot],
            lx_ref.at[pl.ds(starts_ref[r], T)],
            sems.at[slot, 1],
        )
        out.start()

        @pl.when(r + NBUF < nruns)
        def _():
            # wait for this slot's previous write-back before reuse
            pltpu.make_async_copy(
                scratch.at[slot],
                lx_ref.at[pl.ds(starts_ref[r], T)],
                sems.at[slot, 1],
            ).wait()
            in_dma(slot, r + NBUF).start()
            u_dma(slot, r + NBUF).start()

        return 0

    jax.lax.fori_loop(0, nruns, body, 0)
    # drain write-backs
    for k in range(min(NBUF, nruns)):
        r = nruns - min(NBUF, nruns) + k
        slot = r % NBUF
        pltpu.make_async_copy(
            scratch.at[slot],
            lx_ref.at[pl.ds(starts_ref[r], T)],
            sems.at[slot, 1],
        ).wait()


@functools.partial(jax.jit, static_argnames=("T",))
def pallas_rmw(Lx, starts, U, T):
    nruns = starts.shape[0]
    kern = functools.partial(_rmw_kernel, T=T, nruns=nruns)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),   # U stays in HBM
            pl.BlockSpec(memory_space=pltpu.ANY),   # Lx stays in HBM
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        scratch_shapes=[
            pltpu.VMEM((8, T, LANE), jnp.float32),
            pltpu.SemaphoreType.DMA((4, 3)),
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
    print(f"store: {R_L*LANE*4/1e9:.2f} GB; device: {jax.devices()}")

    results = {}
    # A: K random distinct rows
    for K in (1_000_000, 2_000_000):
        rows = jnp.asarray(rng.choice(R_L, size=K, replace=False).astype(np.int32))
        C = jnp.ones((K, LANE), jnp.float32)
        dt = timeit(row_scatter, Lx, rows, C)
        gb = K * LANE * 4 * 3 / 1e9   # RMW traffic: read C + read+write target
        results[f"A row-scatter K={K}"] = (dt, gb / dt)
        print(f"A row-scatter   K={K:>9,}: {dt*1e3:7.2f} ms  {gb/dt:7.1f} GB/s(RMW)")

    # B: windowed runs, distinct aligned starts
    for T in (8, 16, 32, 64, 128):
        nruns = 16_000_000 // (T * LANE * 4 // 128)  # ~2M rows total
        nruns = min(nruns, R_L // T)
        starts = rng.choice(R_L // T, size=nruns, replace=False).astype(np.int32) * T
        starts = jnp.asarray(starts)
        U = jnp.ones((nruns, T, LANE), jnp.float32)
        dt = timeit(win_scatter, Lx, starts, U, T)
        gb = nruns * T * LANE * 4 * 3 / 1e9
        results[f"B win-scatter T={T}"] = (dt, gb / dt)
        print(f"B win-scatter  T={T:>4}: nruns={nruns:>8,} {dt*1e3:7.2f} ms  {gb/dt:7.1f} GB/s(RMW)")

    # C: pallas run kernel, distinct aligned starts
    for T in (8, 16, 32, 128):
        nruns = 2_000_000 // T
        nruns = min(nruns, R_L // T)
        starts = rng.choice(R_L // T, size=nruns, replace=False).astype(np.int32) * T
        starts = jnp.asarray(starts)
        U = jnp.ones((nruns, T, LANE), jnp.float32)
        try:
            dt = timeit(pallas_rmw, Lx, starts, U, T)
            gb = nruns * T * LANE * 4 * 3 / 1e9
            results[f"C pallas-rmw T={T}"] = (dt, gb / dt)
            print(f"C pallas-rmw   T={T:>4}: nruns={nruns:>8,} {dt*1e3:7.2f} ms  {gb/dt:7.1f} GB/s(RMW)")
        except Exception as e:
            print(f"C pallas-rmw   T={T:>4}: FAILED {type(e).__name__}: {str(e)[:300]}")

    return results


if __name__ == "__main__":
    main()
