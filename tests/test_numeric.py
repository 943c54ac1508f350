"""Device (XLA-on-CPU) supernodal factorization tests vs dense oracle,
following the reference's oracle pattern (/root/reference/tests/test_chol.cpp:99-137)
extended with residual, permutation, refactorization and non-PD cases."""

import numpy as np
import pytest

import sparsecholesky_tpu as sc
from sparsecholesky_tpu.api import chol
from sparsecholesky_tpu.models import generators

from conftest import dense_chol


def _check_factor(A, F, tol=1e-9):
    """Entrywise check of L against the dense oracle of P A P^T."""
    perm = F.plan.perm
    Ad = A.to_dense()[np.ix_(perm, perm)]
    expected = np.linalg.cholesky(Ad)
    got = np.tril(F.L().to_dense())
    np.testing.assert_allclose(got, expected, atol=tol * max(1.0, np.abs(expected).max()))


def test_supernodal_tiny(tiny_spd):
    F = chol(tiny_spd)
    _check_factor(tiny_spd, F)


def test_supernodal_bcsstk01(bcsstk01):
    F = chol(bcsstk01)
    _check_factor(bcsstk01, F)
    # residual
    Ld = np.tril(F.L().to_dense())
    Ad = bcsstk01.to_dense()
    rel = np.linalg.norm(Ad - Ld @ Ld.T) / np.linalg.norm(Ad)
    assert rel < 1e-12


def test_supernodal_1138bus(bus1138):
    # AMD instead of natural: same correctness coverage (natural-order
    # supernodal is pinned on bcsstk01 below) at ~8x less fill — the
    # natural-order 1138_bus chunked compile alone cost 3 minutes of the
    # 1-core suite budget
    F = chol(bus1138, ordering="amd")
    Ld = np.tril(F.L().to_dense())
    perm = F.plan.perm
    Ad = bus1138.to_dense()[perm][:, perm]   # L factors P A P^T
    rel = np.linalg.norm(Ad - Ld @ Ld.T) / np.linalg.norm(Ad)
    assert rel < 1e-12


def test_matches_simplicial_oracle(bcsstk01):
    from sparsecholesky_tpu import oracle

    F = chol(bcsstk01, ordering="natural")
    L_dev = np.tril(F.L().to_dense())
    L_cpu = np.tril(oracle.chol_simplicial(bcsstk01).to_dense())
    np.testing.assert_allclose(L_dev, L_cpu, atol=1e-9 * np.abs(L_cpu).max())


@pytest.mark.parametrize("ordering", ["natural", "rcm", "amd"])
def test_orderings(bcsstk01, ordering):
    F = chol(bcsstk01, ordering=ordering)
    _check_factor(bcsstk01, F)
    x = F.solve(np.ones(bcsstk01.n))
    r = bcsstk01.to_scipy() @ x - 1.0
    assert np.linalg.norm(r) < 1e-8


def test_random_matrices():
    for n, density, seed in [(30, 0.4, 1), (77, 0.2, 2), (150, 0.08, 3)]:
        A = generators.random_sparse(n, density, seed=seed)
        F = chol(A)
        _check_factor(A, F)


def test_poisson2d():
    A = generators.poisson2d(12)
    F = chol(A, ordering="nd-grid", grid_shape=(12, 12))
    _check_factor(A, F)


def test_solve(bus1138):
    F = chol(bus1138, ordering="amd")
    rng = np.random.default_rng(0)
    b = rng.standard_normal(bus1138.n)
    x = F.solve(b)
    r = np.linalg.norm(bus1138.to_scipy() @ x - b) / np.linalg.norm(b)
    assert r < 1e-10


def test_solve_multiple_rhs_sequential():
    A = generators.random_sparse(50, 0.3, seed=9)
    F = chol(A)
    for seed in range(3):
        b = np.random.default_rng(seed).standard_normal(50)
        x = F.solve(b)
        assert np.linalg.norm(A.to_scipy() @ x - b) < 1e-9


def test_refactorize(bcsstk01):
    F = chol(bcsstk01)
    # scale values: factor of 4 scales L by 2
    F2 = F.refactorize(bcsstk01.data * 4.0)
    L1 = F.L().to_dense()
    L2 = F2.L().to_dense()
    np.testing.assert_allclose(L2, 2.0 * L1, rtol=1e-12)


def test_not_positive_definite():
    A = sc.triplet_to_csc([0, 0, 1], [0, 1, 1], [1.0, 9.0, 1.0], 2)
    with pytest.raises(sc.NotPositiveDefiniteError) as ei:
        chol(A)
    assert ei.value.supernode is not None
    # reference-parity diagnostics (/root/reference/include/chol.hpp:1265-1281):
    # offending column and a diagonal dump ride the exception
    assert ei.value.column is not None
    c0, c1 = ei.value.column_range
    assert c0 <= ei.value.column < c1
    assert ei.value.diagonal is not None and len(ei.value.diagonal) >= 1
    assert "offending column" in str(ei.value)


def test_log_det(bcsstk01):
    F = chol(bcsstk01)
    sign, logdet = np.linalg.slogdet(bcsstk01.to_dense())
    assert sign > 0
    assert F.log_det() == pytest.approx(logdet, rel=1e-10)


def test_determinism(bcsstk01):
    F1 = chol(bcsstk01)
    F2 = chol(bcsstk01)
    np.testing.assert_array_equal(np.asarray(F1.Lx), np.asarray(F2.Lx))


def test_factorization_deterministic(bcsstk01):
    """SURVEY.md §5: the static plan makes the device path race-free by
    construction — two factorizations must agree bitwise."""
    from sparsecholesky_tpu.plan import compile_plan
    from sparsecholesky_tpu import numeric

    plan = compile_plan(bcsstk01, dtype=np.float32)
    arrays = numeric.device_arrays(plan)
    Lx1, _ = numeric.factorize(plan, bcsstk01.data, arrays=arrays, scale=True)
    Lx2, _ = numeric.factorize(plan, bcsstk01.data, arrays=arrays, scale=True)
    assert np.array_equal(np.asarray(Lx1), np.asarray(Lx2))


def test_multi_rhs_solve(bcsstk01):
    from sparsecholesky_tpu.api import chol

    F = chol(bcsstk01, scale=True)
    rng = np.random.default_rng(7)
    B = rng.standard_normal((bcsstk01.n, 5))
    X = F.solve(B)
    Asp = bcsstk01.to_scipy()
    for k in range(5):
        r = np.linalg.norm(Asp @ X[:, k] - B[:, k]) / np.linalg.norm(B[:, k])
        assert r < 1e-4, r


def test_chunked_execution_matches(monkeypatch):
    """Large plans compile as several chunked executables; results must be
    identical to the single-program path."""
    from sparsecholesky_tpu.plan import compile_plan
    from sparsecholesky_tpu import numeric, solve as _solve
    from sparsecholesky_tpu.models import generators

    from sparsecholesky_tpu.ordering import nd_grid

    A = generators.poisson2d(16)
    plan = compile_plan(A, perm=nd_grid((16, 16)), dtype=np.float64)
    arrays = numeric.device_arrays(plan)
    assert len(arrays["meta"].value) > 3
    Lx_ref, d = numeric.factorize(plan, A.data, arrays=arrays, scale=True)
    b = np.linspace(1, 2, plan.n)
    x_ref = np.asarray(_solve.solve(plan, Lx_ref, b, d=d, arrays=arrays))
    r0 = np.linalg.norm(A.to_scipy() @ x_ref - b) / np.linalg.norm(b)
    assert r0 < 1e-10

    monkeypatch.setattr(numeric, "CHUNK_RUNS", 3)
    Lx_c, d_c = numeric.factorize(plan, A.data, arrays=arrays, scale=True)
    np.testing.assert_array_equal(np.asarray(Lx_c), np.asarray(Lx_ref))
    x_c = np.asarray(_solve.solve(plan, Lx_c, b, d=d_c, arrays=arrays))
    np.testing.assert_allclose(x_c, x_ref, rtol=1e-12)
    linv = numeric.diag_inverses(arrays, Lx_c, plan.R_L, np.dtype(np.float64))
    x_l = np.asarray(_solve.solve(plan, Lx_c, b, d=d_c, arrays=arrays,
                                  linv=linv))
    r = np.linalg.norm(A.to_scipy() @ x_l - b) / np.linalg.norm(b)
    assert r < 1e-6


def test_dense_instore_path(monkeypatch):
    """Very wide supernodes factor blocked in-store; force the path by
    lowering the threshold and compare against the normal path."""
    from sparsecholesky_tpu.plan import compile_plan
    from sparsecholesky_tpu import numeric
    from sparsecholesky_tpu.models import generators

    # dense 300x300: one 300-wide supernode (segmented, nseg=3) plus a
    # bordered sparse part so the wide supernode also has below rows
    A = generators.random_sparse(300, 1.0, seed=4)
    plan = compile_plan(A, dtype=np.float64)
    arrays = numeric.device_arrays(plan)
    Lx_ref, _ = numeric.factorize(plan, A.data, arrays=arrays)
    L_ref = plan.extract_csc(np.asarray(Lx_ref)).to_dense()

    monkeypatch.setattr(numeric, "DENSE_INSTORE", 256)
    monkeypatch.setattr(numeric, "DENSE_KB", 128)
    arrays2 = numeric.device_arrays(plan)
    Lx_d, _ = numeric.factorize(plan, A.data, arrays=arrays2)
    L_d = plan.extract_csc(np.asarray(Lx_d)).to_dense()
    np.testing.assert_allclose(L_d, L_ref, atol=1e-8)
    Ld = np.linalg.cholesky(A.to_dense())
    np.testing.assert_allclose(np.tril(L_d), Ld, atol=1e-8)


def test_dense_instore_with_below_rows(monkeypatch):
    from sparsecholesky_tpu.plan import compile_plan
    from sparsecholesky_tpu import numeric
    from sparsecholesky_tpu.models import generators
    from sparsecholesky_tpu.ordering import nd_grid

    # ND-ordered 2D Poisson has a wide-ish final separator with updates
    A = generators.poisson2d(20)
    plan = compile_plan(A, perm=nd_grid((20, 20)), dtype=np.float64)
    monkeypatch.setattr(numeric, "DENSE_INSTORE", 128)
    monkeypatch.setattr(numeric, "DENSE_KB", 64)
    arrays = numeric.device_arrays(plan)
    Lx, _ = numeric.factorize(plan, A.data, arrays=arrays)
    L = plan.extract_csc(np.asarray(Lx)).to_scipy()
    Ap = A.to_scipy().toarray()[np.ix_(plan.perm, plan.perm)]
    res = np.linalg.norm((L @ L.T).toarray() - Ap) / np.linalg.norm(Ap)
    assert res < 1e-12


def test_pad_profile_coarse(bcsstk01):
    """The coarse padding-tier profile factors identically (up to fp) to
    the default fine profile."""
    from sparsecholesky_tpu.plan import compile_plan
    from sparsecholesky_tpu import numeric

    p_fine = compile_plan(bcsstk01)
    p_coarse = compile_plan(bcsstk01, pad_profile="coarse")
    Lf, _ = numeric.factorize(p_fine, bcsstk01.data)
    Lc, _ = numeric.factorize(p_coarse, bcsstk01.data)
    Ff = p_fine.extract_csc(np.asarray(Lf)).to_dense()
    Fc = p_coarse.extract_csc(np.asarray(Lc)).to_dense()
    np.testing.assert_allclose(Fc, Ff, atol=1e-9 * max(1.0, np.abs(Ff).max()))


def test_hbm_guard(monkeypatch):
    """device_arrays fails fast with guidance when the estimated factorize
    working set exceeds the HBM budget (instead of an opaque
    RESOURCE_EXHAUSTED mid-dispatch), and 0 disables the guard."""
    from sparsecholesky_tpu import numeric
    from sparsecholesky_tpu.plan import compile_plan

    A = generators.poisson2d(12)
    plan = compile_plan(A)
    monkeypatch.setenv("SPARSECHOL_HBM_CAP", "1024")
    with pytest.raises(MemoryError, match="partition across chips"):
        numeric.device_arrays(plan)
    monkeypatch.setenv("SPARSECHOL_HBM_CAP", "0")
    numeric.device_arrays(plan)


def test_chunk_boundaries_persist_across_processes(monkeypatch, tmp_path):
    """Adaptive chunk-split discoveries persist in the on-disk cache so a
    fresh process skips compiles the TPU compiler already rejected."""
    from sparsecholesky_tpu import numeric

    monkeypatch.setenv("SPARSECHOL_CACHE", str(tmp_path))
    meta = (("single", (("w", (0, (4,))),), (), None, (), True, True),) * 7
    discovered = [(0, 3), (3, 5), (5, 7)]
    numeric._save_chunk_plan(meta, discovered)
    numeric._CHUNK_PLANS.clear()   # simulate a new process
    assert numeric._chunk_boundaries(meta) == discovered
    # unknown plans fall back to the uniform split
    other = meta + meta
    numeric._CHUNK_PLANS.clear()
    uniform = numeric._chunk_boundaries(other)
    assert uniform[0][0] == 0 and uniform[-1][1] == len(other)
