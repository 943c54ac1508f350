"""Plan serialization round-trip and profiling cost-model tests."""

import numpy as np

import sparsecholesky_tpu as sc
from sparsecholesky_tpu import numeric
from sparsecholesky_tpu.api import chol
from sparsecholesky_tpu.models import generators
from sparsecholesky_tpu.ordering import compute_ordering
from sparsecholesky_tpu.plan import compile_plan
from sparsecholesky_tpu.serialize import load_plan, save_plan
from sparsecholesky_tpu.utils.profiling import PhaseTimer, plan_cost, speed_of_light


def test_plan_roundtrip(tmp_path, bcsstk01):
    A = bcsstk01
    perm = compute_ordering(A, "amd")
    plan = compile_plan(A, perm=perm, dtype=np.float64)
    path = str(tmp_path / "plan.npz")
    save_plan(path, plan)
    plan2 = load_plan(path)

    assert plan2.n == plan.n
    assert plan2.R_L == plan.R_L
    assert plan2.dtype == plan.dtype
    np.testing.assert_array_equal(plan2.perm, plan.perm)
    np.testing.assert_array_equal(plan2.entry_row, plan.entry_row)
    np.testing.assert_array_equal(plan2.entry_lane, plan.entry_lane)
    assert len(plan2.levels) == len(plan.levels)
    for l1, l2 in zip(plan.levels, plan2.levels):
        assert len(l1) == len(l2)
        for b1, b2 in zip(l1, l2):
            assert (b1.w_pad, b1.mb_pad) == (b2.w_pad, b2.mb_pad)
            np.testing.assert_array_equal(b1.row0, b2.row0)
            np.testing.assert_array_equal(b1.col_idx, b2.col_idx)
            if b1.up is not None:
                np.testing.assert_array_equal(b1.up, b2.up)
    # symbolic factor round-trips
    assert plan2.S.ns == plan.S.ns
    np.testing.assert_array_equal(plan2.S.sparent, plan.S.sparent)

    # a factorization from the LOADED plan matches one from the original
    Lx1, _ = numeric.factorize(plan, A.data)
    Lx2, _ = numeric.factorize(plan2, A.data)
    L1 = plan.extract_csc(np.asarray(Lx1)).to_dense()
    L2 = plan2.extract_csc(np.asarray(Lx2)).to_dense()
    np.testing.assert_allclose(L1, L2, rtol=0, atol=0)


def test_plan_roundtrip_identity_ordering(tmp_path):
    A = generators.random_sparse(50, 0.15, seed=9)
    plan = compile_plan(A, dtype=np.float64)
    path = str(tmp_path / "p.npz")
    save_plan(path, plan)
    plan2 = load_plan(path)
    b = np.linspace(1, 2, A.n)
    from sparsecholesky_tpu import solve as _solve

    Lx, d = numeric.factorize(plan2, A.data)
    x = np.asarray(_solve.solve(plan2, Lx, b, d=d))
    r = np.linalg.norm(A.to_scipy() @ x - b)
    assert r < 1e-8


def test_phase_timer():
    t = PhaseTimer()
    with t.phase("a"):
        pass
    with t.phase("a"):
        pass
    with t.phase("b"):
        pass
    rep = t.report()
    assert set(rep) == {"total_s", "a", "b"}
    assert rep["total_s"] >= rep["a"] >= 0


def test_plan_cost_model(bcsstk01):
    plan = compile_plan(bcsstk01, dtype=np.float32)
    cost = plan_cost(plan)
    assert cost["true_flops"] == plan.true_flops() > 0
    assert cost["padded_flops"] >= cost["true_flops"]
    assert cost["bytes_moved"] > 0
    sol = speed_of_light(plan, seconds=1e-3)
    assert 0 < sol["speed_of_light_fraction"]
    assert sol["roofline_bound"] in ("compute", "memory")


def test_factor_roundtrip(tmp_path, bcsstk01):
    """save_factor/load_factor: the loaded factor solves without
    refactorizing and matches the original solution."""
    from sparsecholesky_tpu.api import chol
    from sparsecholesky_tpu.serialize import save_factor, load_factor

    F = chol(bcsstk01, ordering="amd", scale=True)
    b = np.linspace(1, 2, bcsstk01.n)
    x0 = F.solve(b, refine=0)
    path = str(tmp_path / "factor.npz")
    save_factor(path, F)
    F2 = load_factor(path)                 # no A: refinement unavailable
    x1 = F2.solve(b, refine=0)
    np.testing.assert_allclose(np.asarray(x1), np.asarray(x0),
                               rtol=1e-12, atol=1e-12)
    F3 = load_factor(path, A=bcsstk01)     # with A: refinement works
    x2 = F3.solve(b)
    Asp = bcsstk01.to_scipy()
    r = np.linalg.norm(Asp @ x2 - b) / np.linalg.norm(b)
    assert r < 1e-10
