"""Extend-add window-table path: equality with the scatter path, hazard
scheduler invariants, window-table consistency.

The Pallas kernel itself (ops/extend_add.py) only compiles on real TPUs;
its semantics are pinned here through the runs_xla mode, which reproduces
the kernel's exact summation grouping with XLA gathers/scatters (the
TPU-side bitwise kernel-vs-runs_xla equality is exercised by the bench /
smoke scripts on hardware).
"""

import numpy as np
import pytest

from sparsecholesky_tpu.models.generators import (
    poisson2d,
    poisson3d,
    random_sparse,
)
from sparsecholesky_tpu.ordering import compute_ordering
from sparsecholesky_tpu.plan import compile_plan, update_chunks
from sparsecholesky_tpu import numeric


def _factor_dense(plan, A, extend):
    arrays = numeric.device_arrays(plan)
    Lx, _d = numeric.factorize(plan, A.data, arrays=arrays, extend=extend)
    L = plan.extract_csc(np.asarray(Lx))
    return np.asarray(Lx), L


@pytest.mark.parametrize(
    "mk",
    [
        lambda: (poisson2d(16), None),
        lambda: (poisson3d(8), (8, 8, 8)),
        lambda: (random_sparse(150, 0.08), None),
    ],
)
def test_runs_matches_scatter(mk):
    A, gs = mk()
    perm = compute_ordering(A, "nd-grid" if gs else "natural", grid_shape=gs)
    plan = compile_plan(A, perm=perm, dtype=np.float32)
    Lx_s, L_s = _factor_dense(plan, A, "scatter")
    Lx_r, L_r = _factor_dense(plan, A, "runs_xla")
    # both are valid factorizations of P A P^T at fp32 tolerance
    PAP = A.to_scipy().tocsr()[perm][:, perm]
    R = L_r.to_scipy() @ L_r.to_scipy().T - PAP
    assert abs(R).max() < 1e-3 * abs(A.data).max()
    # the two extend paths apply identical update sets (summation order
    # may differ, so compare to fp32 round-off, not bitwise)
    assert np.allclose(Lx_s, Lx_r, rtol=2e-5, atol=2e-5)


def test_window_table_covers_all_updates():
    """Expanded windows must hit exactly the (row, C-row) pairs the up
    maps describe: every valid (i, g) update row appears exactly once."""
    A = poisson2d(12)
    plan = compile_plan(A, dtype=np.float32)
    T = plan.run_tile
    itemsize = plan.dtype.itemsize
    for lev in plan.levels:
        for b in lev:
            if b.up is None:
                continue
            rs, rc, rl, _rg, _rn, _rw, pcounts, _ncs = numeric._window_table(
                b, b.utile_g, 10**9, itemsize, T
            )
            counts = [c[0] for c in pcounts]
            # collect (store_row, chunk_idx, c_row) from windows
            got = set()
            off = 0
            for ci, (ti, i0, i1, gt, b0, b1) in enumerate(update_chunks(
                    b.batch, b.mb_pad, b.g_pad, b.utile_g, itemsize)):
                cnt = counts[ci]
                tlen = i1 - i0
                for wj in range(off, off + cnt):
                    uoff, vlen = int(rl[wj]) >> 8, int(rl[wj]) & 0xFF
                    for k in range(uoff, uoff + vlen):
                        crow = int(rc[wj]) + k
                        # decode c row -> (bsrc, g, i)
                        bg, irel = divmod(crow, tlen)
                        bs, g = divmod(bg, gt)
                        got.add((int(rs[wj]) + k, bs + b0, g, irel + i0))
                off += cnt
            want = set()
            for kb in range(b.batch):
                mb = int(b.mb[kb])
                for g in range(int(b.uG[kb])):
                    j0 = int(b.uj0[kb, g])
                    for i in range(j0, mb):
                        row = int(b.urow0[kb, g]) + int(b.up[kb, i, g])
                        want.add((row, kb, g, i))
            assert got == want


def test_hazard_schedule_spacing():
    rng = np.random.default_rng(0)
    T = 16
    n = 4000
    # adversarial: many windows crowded into a small row range
    ws = rng.integers(0, 400, size=n).astype(np.int64)
    wc = np.arange(n, dtype=np.int64)
    wl = np.full(n, T, dtype=np.int64)
    s, c, l = numeric._hazard_schedule(ws, wc, wl, 10**6, 0, T)
    nbuf = numeric.RUN_NBUF
    real = l != 0
    for d in range(1, nbuf):
        a, bb = s[d:], s[:-d]
        m = real[d:] & real[:-d]
        assert (np.abs(a[m] - bb[m]) >= T).all()
    # all real windows survive with payload intact
    kept = sorted(zip(s[real].tolist(), c[real].tolist()))
    orig = sorted(zip(ws.tolist(), wc.tolist()))
    assert kept == orig


def test_chunk_mode_cost_model():
    # many windows crowded into few regions -> region packing wins;
    # sparse windows (one region each) -> the window kernel wins
    assert numeric._chunk_mode(10000, 10, 16) == "region"
    assert numeric._chunk_mode(10, 10, 16) == "interleave"


def test_smem_cap_forces_interleave(monkeypatch):
    """Under a tiny scalar-prefetch budget no chunk may pack region-mode
    tables (they ride SMEM whole), and the window path must still factor
    correctly — oversized irregular chunks fall back to this path (the
    irregular3d SMEM overflow regression)."""
    monkeypatch.setattr(numeric, "SMEM_CAP", 64)
    A = poisson2d(16)
    plan = compile_plan(A, dtype=np.float32)
    _flat, meta = numeric.build_runs(plan)
    for _kind, _spec, _utile_g, _wm, rchunks, *_flags in meta:
        for _nw, nrg, _nc, nb, _cblk, _rb in rchunks:
            assert nrg == 0 and nb == 0
    Lx_s, _ = _factor_dense(plan, A, "scatter")
    Lx_r, _ = _factor_dense(plan, A, "runs_xla")
    assert np.allclose(Lx_s, Lx_r, rtol=2e-5, atol=2e-5)


def test_run_tile_selection_bounds():
    A = poisson2d(16)
    plan = compile_plan(A, dtype=np.float32)
    from sparsecholesky_tpu.plan import _RUN_TILES

    assert plan.run_tile in _RUN_TILES


def test_gblock_packing_covers_and_is_wellformed():
    """gblock packing must cover the same windows, keep every window
    inside its region tile AND its C block (0 <= wc - bc <= CBLK - T),
    and partition windows/blocks consistently (region block counts sum
    to nb, block window counts sum to nw, block C reads stay inside the
    grown C buffer)."""
    from sparsecholesky_tpu.plan import REGION_BLK

    A = poisson2d(16)
    plan = compile_plan(A, dtype=np.float32)
    T = plan.run_tile
    itemsize = plan.dtype.itemsize
    CBLK = 256
    RB = 512
    checked = 0
    for lev in plan.levels:
        for b in lev:
            if b.up is None:
                continue
            wins, ncs = numeric._chunk_windows(b, b.utile_g, itemsize, T,
                                               with_gid=True)
            for ci, (ws, wc, wl, gd) in enumerate(wins):
                if not len(ws):
                    continue
                rs, rc, rl, rg, rn, rw, nrg = numeric._pack_windows(
                    ws, wc, wl, ncs[ci], "gblock", 10**9, T,
                    gid=gd, cblk=CBLK, rb=RB, row_cap=10**9 + T
                )
                nb = len(rg) - nrg
                assert nb >= 1
                # same multiset of windows
                assert (sorted(zip(ws, wc, wl))
                        == sorted(zip(rs, rc, rl & 0xFFFF)))
                regions, blocks = rg[:nrg], rg[nrg:]
                rnf, bnw = rn[:nrg], rn[nrg:]
                # block counts per region sum to nb; windows per block to nw
                assert (rnf >> 1).sum() == nb
                assert bnw.sum() == len(rs)
                # every block's windows stay in its C window and region
                NC = ncs[ci] + CBLK - T  # the caller-side growth
                bi = np.repeat(np.arange(nb), bnw)
                ri = np.repeat(np.arange(nrg), rnf >> 1)  # region per block
                dc = rc - blocks[bi]
                assert (dc >= 0).all() and (dc + T <= CBLK).all()
                assert (blocks + CBLK <= NC).all()
                off = rs - regions[ri[bi]]
                assert (off >= 0).all() and (off + T <= RB).all()
                assert (off == (rl >> 16)).all()
                # anchored regions: ascending bases, overlap flagged
                if nrg > 1:
                    assert (np.diff(regions) > 0).all()
                    adj = (np.diff(regions) < RB)
                    assert ((rnf & 1)[1:] == adj.astype(rn.dtype)).all()
                checked += 1
    assert checked > 0


def test_region_packing_covers_and_is_wellformed():
    """Region-mode packing must cover the same windows, keep each window
    inside its REGION_BLK tile, and set overlap flags for adjacent
    tiles."""
    from sparsecholesky_tpu.plan import REGION_BLK

    A = poisson2d(16)
    plan = compile_plan(A, dtype=np.float32)
    T = plan.run_tile
    itemsize = plan.dtype.itemsize
    stride = REGION_BLK - T
    checked = 0
    for lev in plan.levels:
        for b in lev:
            if b.up is None:
                continue
            wins, ncs = numeric._chunk_windows(b, b.utile_g, itemsize, T)
            for ci, (ws, wc, wl) in enumerate(wins):
                if not len(ws):
                    continue
                rs, rc, rl, rg, rn, rw = numeric._pack_windows(
                    ws, wc, wl, ncs[ci], "region", 10**9, T
                )
                # same multiset of windows (rl bits 16+ carry the
                # in-region row offset the kernel uses; mask them off)
                assert (sorted(zip(ws, wc, wl))
                        == sorted(zip(rs, rc, rl & 0xFFFF)))
                # region structure
                n = rn >> 1
                flag = rn & 1
                assert n.sum() == len(rs)
                assert (rw == np.concatenate([[0], np.cumsum(n)[:-1]])).all()
                for gi in range(len(rg)):
                    sl = slice(rw[gi], rw[gi] + n[gi])
                    off = rs[sl] - rg[gi]
                    assert (off >= 0).all() and (off + T <= REGION_BLK).all()
                    # packed offset must agree with absolute row - region
                    assert (off == (rl[sl] >> 16)).all()
                # flags iff adjacent tiles
                if len(rg) > 1:
                    adj = (np.diff(rg) == stride)
                    assert (flag[1:] == adj.astype(flag.dtype)).all()
                checked += 1
    assert checked > 0


def test_large_run_tile_underflow_grows_c_buffer(monkeypatch):
    """A window whose U DMA would overrun a tiny C chunk shifts back by
    uoff; when the target store row is too small to absorb the shift
    (early supernodes + large run tile), the chunk's C buffer must grow
    instead (the apply site zero-pads Cf to NC) — and the factorization
    stays correct."""
    import sparsecholesky_tpu as sc

    monkeypatch.setenv("SPARSECHOL_RUN_TILE", "96")
    A = sc.load_matrix_market(sc.bundled_matrix("bcsstk01"))
    plan = compile_plan(A, dtype=np.float32, pad_profile="coarse")
    assert plan.run_tile == 96
    _flat, meta = numeric.build_runs(plan)
    grown = False
    for _kind, _spec, _utile_g, _wm, rchunks, *_flags in meta:
        for _nw, _nrg, nc, _nb, _cblk, _rb in rchunks:
            assert nc >= plan.run_tile
            grown |= nc > plan.run_tile
    assert grown, "expected at least one chunk to grow its C buffer"
    Lx_s, _ = _factor_dense(plan, A, "scatter")
    Lx_r, _ = _factor_dense(plan, A, "runs_xla")
    assert np.allclose(Lx_s, Lx_r, rtol=2e-5, atol=2e-5)
