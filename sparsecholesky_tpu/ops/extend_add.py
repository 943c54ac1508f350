"""Pallas TPU kernel for the extend-add window RMW.

The Schur-complement extend-add is the memory-bound heart of sparse
supernodal Cholesky (the reference's ``apply_update`` scatter,
/root/reference/include/chol.hpp:1196-1216).  On TPU, XLA's row
scatter-add runs at ~70-90 GB/s of RMW traffic; this kernel instead
processes the plan-compiled *window table* (numeric._window_table): each
window is RUN_TILE consecutive store rows that receive RUN_TILE
consecutive rows of the update tensor C.  Per window, a pipelined DMA
chain

    HBM store rows  -> VMEM   (read)
    HBM C rows      -> VMEM   (update tile)
    VMEM            -> HBM    (write back  store - masked C)

keeps RUN_NBUF windows in flight and reaches 80-260 GB/s depending on
tile size (scripts_rmw_bench.py measurements on v5e).

Correctness contract with the planner (numeric._hazard_schedule): any two
windows whose store-row intervals overlap are scheduled >= RUN_NBUF apart.
The kernel completes window r's write-back inside iteration r (the
slot-reuse wait), so a window's read can never observe a conflicting
predecessor's un-landed write.  Rows outside a window's valid range
[uoff, uoff+len) contribute 0 and are written back unchanged; zero-length
dummy windows aim at the dead store tail rows (plan.STORE_TAIL_PAD).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..plan import LANE, RUN_TILE, REGION_BLK  # noqa: F401

#: in-flight window pipeline depth; must equal numeric.RUN_NBUF
NBUF = 4

#: U-tile prefetch depth of the region kernel
NUBUF = 8

#: C-block prefetch depth of the gblock kernel
NCB = 8

#: region ring depth of the region/gblock kernels.  Reads are issued
#: PF=NRB-2 regions ahead: the old 2-slot in-place scheme serialized
#: every region read behind the previous region's write-back (~2 us DMA
#: round-trip x ~23k regions was most of the measured RMW wall on
#: poisson3d:48); unflagged regions overlap NO predecessor (anchored
#: ascending bases make overlap transitive), so their reads are safe to
#: issue early, and flagged regions degrade to the serialized order.
NRB = 4


def _rmw_kernel(rstart_ref, rcoff_ref, rlen_ref, c_hbm, lx_ref, _out,
                wscratch, uscratch, wsem, usem, *, nw: int, T: int):
    """One sequential pass over the window table with an NBUF-deep DMA
    pipeline (grid is (1,); TPU grids are sequential anyway and the manual
    chain lets the scalar core race ahead issuing DMAs)."""

    def w_in(slot, r):
        return pltpu.make_async_copy(
            lx_ref.at[pl.ds(rstart_ref[r], T)], wscratch.at[slot],
            wsem.at[slot, 0],
        )

    def w_out(slot, r):
        return pltpu.make_async_copy(
            wscratch.at[slot], lx_ref.at[pl.ds(rstart_ref[r], T)],
            wsem.at[slot, 1],
        )

    def u_in(slot, r):
        return pltpu.make_async_copy(
            c_hbm.at[pl.ds(rcoff_ref[r], T)], uscratch.at[slot],
            usem.at[slot],
        )

    kk = jax.lax.broadcasted_iota(jnp.int32, (T, 1), 0)

    for k in range(min(NBUF, nw)):
        w_in(k, k).start()
        u_in(k, k).start()

    def body(r, _):
        slot = r % NBUF
        packed = rlen_ref[r]
        uoff = packed >> 8
        vlen = packed & 0xFF
        w_in(slot, r).wait()
        u_in(slot, r).wait()
        mask = (kk >= uoff) & (kk < uoff + vlen)
        wscratch[slot] = wscratch[slot] - jnp.where(
            mask, uscratch[slot], 0.0
        )
        w_out(slot, r).start()
        # slot-reuse guard: the write-back must land before this slot's
        # next read starts; it also orders conflicting windows >= NBUF
        # apart (see module docstring)
        w_out(slot, r).wait()

        @pl.when(r + NBUF < nw)
        def _():
            w_in(slot, r + NBUF).start()
            u_in(slot, r + NBUF).start()

        return 0

    jax.lax.fori_loop(0, nw, body, 0, unroll=False)


@functools.partial(jax.jit, static_argnames=("T", "interpret"))
def run_rmw(Lx, Cf, rstart, rcoff, rlen, *, T: int = RUN_TILE,
            interpret: bool = False):
    """Apply ``Lx[rstart[r] : rstart[r]+T] -= masked C rows`` for every
    window r of the table, in table order.  Cf is the chunk's update
    tensor reshaped to [NC, LANE] rows (NC >= T).  In-place on Lx
    (donated via input/output aliasing)."""
    nw = rstart.shape[0]
    kern = functools.partial(_rmw_kernel, nw=nw, T=T)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(1,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),   # Cf stays in HBM
            pl.BlockSpec(memory_space=pltpu.ANY),   # Lx stays in HBM
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        scratch_shapes=[
            pltpu.VMEM((NBUF, T, LANE), Lx.dtype),
            pltpu.VMEM((NBUF, T, LANE), Lx.dtype),
            pltpu.SemaphoreType.DMA((NBUF, 2)),
            pltpu.SemaphoreType.DMA((NBUF,)),
        ],
    )
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(Lx.shape, Lx.dtype),
        input_output_aliases={4: 0},
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(rstart, rcoff, rlen, Cf, Lx)


# ---------------------------------------------------------------------------
# Region-batched RMW: windows sorted by store row and grouped into fixed
# REGION_BLK-row tiles (numeric._pack_windows "region" mode).  One region
# DMA pair amortizes all its windows' read-modify-writes (the window
# kernel above pays ~3 DMA issues per window; here a window costs one
# U-tile DMA + one VMEM add).  Conflicts inside a region serialize in
# VMEM; adjacent tiles overlap by up to T rows, so a region flagged in
# rgnf waits for its predecessor's write-back before reading.


def _region_kernel(rgrow_ref, rgnf_ref, rgwoff_ref, rcoff_ref,
                   rlen_ref, c_hbm, lx_ref, _out, wbuf, ubuf, wsem, usem,
                   *, nrg: int, nw: int, T: int, RB: int):
    def rg_in(slot, r):
        return pltpu.make_async_copy(
            lx_ref.at[pl.ds(rgrow_ref[r], RB)], wbuf.at[slot],
            wsem.at[slot, 0],
        )

    def rg_out(slot, r):
        return pltpu.make_async_copy(
            wbuf.at[slot], lx_ref.at[pl.ds(rgrow_ref[r], RB)],
            wsem.at[slot, 1],
        )

    def u_in(slot, wi):
        return pltpu.make_async_copy(
            c_hbm.at[pl.ds(rcoff_ref[wi], T)], ubuf.at[slot],
            usem.at[slot],
        )

    kk = jax.lax.broadcasted_iota(jnp.int32, (T, 1), 0)
    for i in range(min(NUBUF, nw)):
        u_in(i, i).start()
    rg_in(0, 0).start()

    def body(r, _):
        slot = r % 2
        rg_in(slot, r).wait()
        n = rgnf_ref[r] >> 1
        w0 = rgwoff_ref[r]

        def wbody(i, _c):
            wi = w0 + i
            su = wi % NUBUF
            u_in(su, wi).wait()
            # region windows pack (row offset inside the region << 16) |
            # (uoff << 8) | valid_length into one SMEM word — 8 B of
            # scalar-prefetch per window instead of 12 keeps big chunks
            # under the ~1 MB SMEM roof (the absolute store row lives only
            # in the plan's rstart field, for the runs_xla reference path)
            packed = rlen_ref[wi]
            uoff = (packed >> 8) & 0xFF
            vlen = packed & 0xFF
            off = packed >> 16
            mask = (kk >= uoff) & (kk < uoff + vlen)
            cur = wbuf[slot, pl.ds(off, T)]
            wbuf[slot, pl.ds(off, T)] = cur - jnp.where(
                mask, ubuf[su], 0.0
            )

            @pl.when(wi + NUBUF < nw)
            def _():
                u_in(su, wi + NUBUF).start()

            return 0

        jax.lax.fori_loop(0, n, wbody, 0, unroll=False)
        rg_out(slot, r).start()

        @pl.when(r + 1 < nrg)
        def _():
            nslot = (r + 1) % 2
            # slot reuse: wait region r-1's write-back UNLESS it was
            # already consumed by iteration r-1's overlap wait (each out
            # semaphore must be waited exactly once)
            @pl.when((r >= 1) & ((rgnf_ref[r] & 1) == 0))
            def _():
                rg_out(nslot, r - 1).wait()

            @pl.when((rgnf_ref[r + 1] & 1) == 1)
            def _():
                rg_out(slot, r).wait()        # adjacent-tile overlap

            rg_in(nslot, r + 1).start()

        return 0

    jax.lax.fori_loop(0, nrg, body, 0, unroll=False)
    # drain outstanding write-backs (respecting single-wait semantics)
    rg_out((nrg - 1) % 2, nrg - 1).wait()
    if nrg >= 2:
        @pl.when((rgnf_ref[nrg - 1] & 1) == 0)
        def _():
            rg_out((nrg - 2) % 2, nrg - 2).wait()


@functools.partial(jax.jit, static_argnames=("T", "interpret"))
def region_rmw(Lx, Cf, rcoff, rlen, rgrow, rgnf, rgwoff, *,
               T: int = RUN_TILE, interpret: bool = False):
    """Region-batched variant of run_rmw (see module section above).

    Scalar-prefetch SMEM cost: 8 B per window (rcoff + packed rlen) plus
    12 B per region — numeric.build_runs only picks region packing for a
    chunk when this fits numeric.SMEM_CAP."""
    nw = rcoff.shape[0]
    nrg = rgrow.shape[0]
    kern = functools.partial(_region_kernel, nrg=nrg, nw=nw, T=T,
                             RB=REGION_BLK)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(1,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),   # Cf stays in HBM
            pl.BlockSpec(memory_space=pltpu.ANY),   # Lx stays in HBM
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        scratch_shapes=[
            pltpu.VMEM((2, REGION_BLK, LANE), Lx.dtype),
            pltpu.VMEM((NUBUF, T, LANE), Lx.dtype),
            pltpu.SemaphoreType.DMA((2, 2)),
            pltpu.SemaphoreType.DMA((NUBUF,)),
        ],
    )
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(Lx.shape, Lx.dtype),
        input_output_aliases={6: 0},
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(rgrow, rgnf, rgwoff, rcoff, rlen, Cf, Lx)


# ---------------------------------------------------------------------------
# Group-block RMW ("gblock", numeric._pack_windows mode="gblock"): like the
# region kernel, but the per-window U-tile HBM DMA (~190 ns issue, the
# measured round-3 floor at 288k runs on poisson3d:48) is replaced by a
# VMEM read from a C *block* staged wholesale: windows are sorted
# (region, owner group, store row) and consecutive windows of one owner
# group — whose C rows are CONTIGUOUS (the einsum's i-range) — share one
# CBLK-row C DMA.  The per-window work drops to a VMEM dynamic-slice
# masked subtract (measured 50 ns/window with the manual 2x unroll,
# scripts_vmemwin_bench.py).  Store-side region double-buffering, the
# adjacent-tile overlap flag, and the single-wait discipline are the
# region kernel's.


def _gblock_kernel(rgrow_ref, rgnf_ref, bc_ref, bnw_ref, rcoff_ref,
                   rlen_ref, c_hbm, lx_ref, _out, wbuf, cbuf, wsem, csem,
                   *, nrg: int, nb: int, T: int, RB: int, CBLK: int):
    def rg_in(slot, r):
        return pltpu.make_async_copy(
            lx_ref.at[pl.ds(rgrow_ref[r], RB)], wbuf.at[slot],
            wsem.at[slot, 0],
        )

    def rg_out(slot, r):
        return pltpu.make_async_copy(
            wbuf.at[slot], lx_ref.at[pl.ds(rgrow_ref[r], RB)],
            wsem.at[slot, 1],
        )

    def c_in(slot, bi):
        return pltpu.make_async_copy(
            c_hbm.at[pl.ds(bc_ref[bi], CBLK)], cbuf.at[slot],
            csem.at[slot],
        )

    kk = jax.lax.broadcasted_iota(jnp.int32, (T, 1), 0)
    for i in range(min(NCB, nb)):
        c_in(i, i).start()
    # NRB-deep region ring, reads issued NRB-2 ahead (module docstring at
    # NRB): an UNFLAGGED region overlaps no predecessor (anchored
    # ascending bases make overlap transitive through the flag chain), so
    # its read is safe to issue early; a flagged region's read is issued
    # at its own iteration, after its predecessor's write-back.
    # Write-sem single-wait schedule: write(x) is waited at body x+1 when
    # flag(x+1) is set (RMW ordering), else at body x+2 (slot retire).
    rg_in(0, 0).start()
    if nrg > 1:
        @pl.when((rgnf_ref[1] & 1) == 0)
        def _():
            rg_in(1 % NRB, 1).start()

    def body(r, carry):
        bi0, wi0 = carry                    # running block / window index
        slot = r % NRB

        # slot-retire wait for write(r-2) (unless flag(r-1) consumed it)
        @pl.when((r >= 2) & ((rgnf_ref[jnp.maximum(r - 1, 0)] & 1) == 0))
        def _():
            rg_out((r - 2) % NRB, r - 2).wait()

        # flagged region: wait predecessor write-back, then read now
        @pl.when((rgnf_ref[r] & 1) == 1)
        def _():
            rg_out((r - 1) % NRB, r - 1).wait()
            rg_in(slot, r).start()

        rg_in(slot, r).wait()
        nblk = rgnf_ref[r] >> 1

        def bbody(j, c2):
            bi, wi = c2
            sb = bi % NCB
            c_in(sb, bi).wait()
            base = bc_ref[bi]
            nwb = bnw_ref[bi]

            def apply(w):
                packed = rlen_ref[w]
                off = packed >> 16
                uoff = (packed >> 8) & 0xFF
                vlen = packed & 0xFF
                dc = rcoff_ref[w] - base
                mask = (kk >= uoff) & (kk < uoff + vlen)
                cur = wbuf[slot, pl.ds(off, T)]
                wbuf[slot, pl.ds(off, T)] = cur - jnp.where(
                    mask, cbuf[sb, pl.ds(dc, T)], 0.0
                )

            def wbody4(k, _):
                # manual 4x unroll: cuts the measured per-window
                # scalar-issue cost ~2x vs no unroll (Mosaic rejects
                # fori partial unroll, so unroll by hand)
                apply(wi + 4 * k)
                apply(wi + 4 * k + 1)
                apply(wi + 4 * k + 2)
                apply(wi + 4 * k + 3)
                return 0

            jax.lax.fori_loop(0, nwb >> 2, wbody4, 0, unroll=False)

            def tail(j, _):
                apply(wi + (nwb & ~3) + j)
                return 0

            jax.lax.fori_loop(0, nwb & 3, tail, 0, unroll=False)

            @pl.when(bi + NCB < nb)
            def _():
                c_in(sb, bi + NCB).start()

            return (bi + 1, wi + nwb)

        bi0, wi0 = jax.lax.fori_loop(0, nblk, bbody, (bi0, wi0),
                                     unroll=False)
        rg_out(slot, r).start()

        # prefetch read for r+2 (its slot's occupant r-2 was retired
        # above; unflagged regions only)
        @pl.when((r + 2 < nrg) & ((rgnf_ref[jnp.minimum(r + 2, nrg - 1)]
                                   & 1) == 0))
        def _():
            rg_in((r + 2) % NRB, r + 2).start()

        return (bi0, wi0)

    jax.lax.fori_loop(0, nrg, body, (0, 0), unroll=False)
    rg_out((nrg - 1) % NRB, nrg - 1).wait()
    if nrg >= 2:
        @pl.when((rgnf_ref[nrg - 1] & 1) == 0)
        def _():
            rg_out((nrg - 2) % NRB, nrg - 2).wait()


@functools.partial(jax.jit,
                   static_argnames=("T", "CBLK", "RB", "interpret"))
def gblock_rmw(Lx, Cf, rcoff, rlen, rgrow, rgnf, bc, bnw, *,
               T: int = RUN_TILE, CBLK: int = 256, RB: int = 1024,
               interpret: bool = False):
    """Group-block variant of region_rmw (see module section above).

    ``bc``/``bnw`` are the per-block C base row and window count; the
    planner guarantees every block's windows satisfy
    0 <= rcoff - bc <= CBLK - T and Cf has >= bc + CBLK rows.  Regions
    are greedy base-ANCHORED RB-row spans (numeric._anchored_regions):
    ascending bases, overlap-with-predecessor flagged in rgnf bit 0
    (transitively safe: each region's read waits its flagged
    predecessor's write-back, whose read waited ITS predecessor).
    Scalar SMEM: 8 B per window (rcoff + rlen) + 8 B per region + 8 B
    per block."""
    nrg = rgrow.shape[0]
    nb = bc.shape[0]
    kern = functools.partial(_gblock_kernel, nrg=nrg, nb=nb, T=T,
                             RB=RB, CBLK=CBLK)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=6,
        grid=(1,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),   # Cf stays in HBM
            pl.BlockSpec(memory_space=pltpu.ANY),   # Lx stays in HBM
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        scratch_shapes=[
            pltpu.VMEM((NRB, RB, LANE), Lx.dtype),
            pltpu.VMEM((NCB, CBLK, LANE), Lx.dtype),
            pltpu.SemaphoreType.DMA((NRB, 2)),
            pltpu.SemaphoreType.DMA((NCB,)),
        ],
    )
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(Lx.shape, Lx.dtype),
        input_output_aliases={7: 0},
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(rgrow, rgnf, bc, bnw, rcoff, rlen, Cf, Lx)
