"""Store-row-space solve (solve_store.py): equality vs the legacy
element-granular sweeps across layouts/orderings, multi-RHS blocks, and
the api routing."""

import numpy as np
import pytest

import sparsecholesky_tpu as sc
from sparsecholesky_tpu import numeric, solve as legacy, solve_store
from sparsecholesky_tpu.models import generators
from sparsecholesky_tpu.ordering import compute_ordering, nd_grid
from sparsecholesky_tpu.plan import compile_plan


def _check(A, perm=None, layout=None, k=3):
    kw = {} if layout is None else {"layout": layout}
    plan = compile_plan(A, perm=perm, **kw)
    arrays = numeric.device_arrays(plan)
    Lx, d = numeric.factorize(plan, A.data, arrays=arrays,
                              extend="scatter")
    b = np.random.default_rng(0).standard_normal((plan.n, k))
    x1 = np.asarray(legacy.solve(plan, Lx, b, d=d, arrays=arrays))
    ctx = solve_store.build_context(plan, Lx, arrays)
    x2 = solve_store.solve_rows(plan, b, ctx=ctx, d=d, arrays=arrays)
    scale = max(float(np.abs(x1).max()), 1e-30)
    np.testing.assert_allclose(x2, x1, atol=1e-10 * scale, rtol=0)
    # 1-D rhs round-trips with the same programs (k rides the lanes)
    x3 = solve_store.solve_rows(plan, b[:, 0], ctx=ctx, d=d,
                                arrays=arrays)
    assert x3.ndim == 1
    np.testing.assert_allclose(x3, x1[:, 0], atol=1e-10 * scale, rtol=0)
    return plan, ctx


def test_bcsstk01(bcsstk01):
    _check(bcsstk01)


def test_1138bus_amd(bus1138):
    _check(bus1138, perm=compute_ordering(bus1138, "amd"))


def test_poisson3d_nd_aligned():
    A = generators.poisson3d(10)
    _check(A, perm=nd_grid((10, 10, 10)))


def test_compact_layout():
    A = generators.poisson2d(24)
    _check(A, perm=nd_grid((24, 24)), layout="compact")


def test_irregular_amd_multiblock_rhs():
    # k = 130 exercises the 128-lane block loop (two blocks)
    A = generators.irregular3d(8)
    _check(A, perm=compute_ordering(A, "amd"), k=130)


def test_canonical_row_map_bijective():
    A = generators.fem3d(8, 3)
    plan = compile_plan(A, perm=compute_ordering(A, "amd"))
    ybuf, ymeta, yof, yinv = solve_store.build_ygrids(plan)
    # one canonical row per column, all distinct, inverse consistent
    assert len(np.unique(yof)) == plan.n
    assert (yof < plan.R_L).all()
    np.testing.assert_array_equal(yinv[yof], np.arange(plan.n))
    # grids mirror build_runs' grouping run-for-run
    arrays = numeric.device_arrays(plan)
    assert len(ymeta) == len(arrays["meta"].value)


def test_api_routes_store_path_opt_in(bus1138, monkeypatch):
    from sparsecholesky_tpu.api import chol

    monkeypatch.setenv("SPARSECHOL_SOLVE_STORE", "1")
    F = chol(bus1138, ordering="amd")
    x = F.solve(np.ones(bus1138.n))
    assert F._yctx not in (None, False), "store path should have engaged"
    r = bus1138.to_scipy() @ x - 1.0
    assert np.linalg.norm(r) / np.sqrt(bus1138.n) < 1e-8


def test_api_default_is_legacy(bus1138):
    # round-5 measurement: the legacy sweeps + batched inverses are the
    # fastest device-resident path at every k; store-row is opt-in
    from sparsecholesky_tpu.api import chol

    F = chol(bus1138, ordering="amd")
    x = F.solve(np.ones(bus1138.n))
    assert F._yctx is False
    r = bus1138.to_scipy() @ x - 1.0
    assert np.linalg.norm(r) / np.sqrt(bus1138.n) < 1e-8


def test_api_cap_falls_back_to_legacy(bus1138, monkeypatch):
    from sparsecholesky_tpu.api import chol

    monkeypatch.setenv("SPARSECHOL_SOLVE_STORE", "1")
    monkeypatch.setenv("SPARSECHOL_SOLVE_STORE_CAP", "1")
    F = chol(bus1138, ordering="amd")
    x = F.solve(np.ones(bus1138.n))
    assert F._yctx is False
    r = bus1138.to_scipy() @ x - 1.0
    assert np.linalg.norm(r) / np.sqrt(bus1138.n) < 1e-8


def test_refactorize_rebuilds_store_ctx(bus1138, monkeypatch):
    """refactorize must not reuse the old values' WP store (_yctx)."""
    from sparsecholesky_tpu.api import chol

    monkeypatch.setenv("SPARSECHOL_SOLVE_STORE", "1")
    F = chol(bus1138, ordering="amd")
    F.solve(np.ones(bus1138.n), refine=0)
    assert F._yctx not in (None, False)
    Ax2 = bus1138.data * 4.0
    F2 = F.refactorize(Ax2)
    assert F2._yctx is None
    x2 = F2.solve(np.ones(bus1138.n), refine=0)
    # solution of 4A x = b is x/4
    x1 = F.solve(np.ones(bus1138.n), refine=0)
    np.testing.assert_allclose(x2, x1 / 4.0, rtol=1e-5)


def test_chunked_sweep(monkeypatch):
    # force the chunked multi-executable sweep path on a small plan
    monkeypatch.setattr(solve_store, "CHUNK_RUNS", 4)
    A = generators.poisson2d(16)
    _check(A, perm=nd_grid((16, 16)))
