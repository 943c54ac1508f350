"""Aligned store layout (plan.compile_plan(layout="aligned")).

The aligned layout stores each supernode block padded to its bucket's
panel shape, concatenated in step order, so panel assembly runs as dense
slab slices (numeric._slab_gather) instead of row gathers.  These tests
pin exact factor equality against the compact layout (the two layouts
execute the same arithmetic in the same order) and against the dense
oracle, across every consumer of the store: factorize (batched, segmented,
in-store dense), the window-table extend-add, solve, and serialization.
"""

import numpy as np
import pytest

from sparsecholesky_tpu.models import generators
from sparsecholesky_tpu.plan import compile_plan
from sparsecholesky_tpu import numeric, solve as _solve


def _dense_chol(A):
    return np.linalg.cholesky(A.to_dense())


@pytest.mark.parametrize(
    "mk",
    [
        lambda: generators.poisson2d(12),
        lambda: generators.random_sparse(120, 0.08, seed=3),
        lambda: generators.fem3d(6, 3),
    ],
)
def test_aligned_matches_compact_and_oracle(mk):
    A = mk()
    pc = compile_plan(A, layout="compact")
    pa = compile_plan(A, layout="aligned")
    ac = numeric.device_arrays(pc)
    aa = numeric.device_arrays(pa)
    # the aligned plan must actually take the slab fast path; the compact
    # plan may slab only the (rare) buckets whose exact-tier-fit placement
    # already coincides with the panel layout
    assert any(m[5] for m in aa["meta"].value)
    assert (sum(m[5] for m in aa["meta"].value)
            >= sum(m[5] for m in ac["meta"].value))
    Lc, _ = numeric.factorize(pc, A.data, arrays=ac)
    La, _ = numeric.factorize(pa, A.data, arrays=aa)
    Ec = pc.extract_csc(np.asarray(Lc)).to_dense()
    Ea = pa.extract_csc(np.asarray(La)).to_dense()
    assert np.array_equal(Ec, Ea)  # same arithmetic, same order: bitwise
    assert np.abs(Ea - _dense_chol(A)).max() < 1e-9


def test_aligned_wide_segmented_and_instore(monkeypatch):
    """Segmented (nseg > 1) supernodes under the aligned layout, through
    both the step path and the in-store blocked dense path."""
    A = generators.random_sparse(300, 1.0, seed=4)
    pa = compile_plan(A, layout="aligned")
    Lref = _dense_chol(A)
    aa = numeric.device_arrays(pa)
    La, _ = numeric.factorize(pa, A.data, arrays=aa)
    assert np.abs(pa.extract_csc(np.asarray(La)).to_dense() - Lref).max() < 1e-9

    monkeypatch.setattr(numeric, "DENSE_INSTORE", 256)
    monkeypatch.setattr(numeric, "DENSE_KB", 128)
    ad = numeric.device_arrays(pa)
    Ld, _ = numeric.factorize(pa, A.data, arrays=ad)
    assert np.abs(pa.extract_csc(np.asarray(Ld)).to_dense() - Lref).max() < 1e-9


def test_aligned_window_table_extend():
    """The run/window extend-add tables (kernel-semantics reference path)
    must encode the aligned row offsets exactly."""
    A = generators.poisson2d(16)
    pa = compile_plan(A, layout="aligned")
    aa = numeric.device_arrays(pa)
    L1, _ = numeric.factorize(pa, A.data, arrays=aa, extend="scatter")
    L2, _ = numeric.factorize(pa, A.data, arrays=aa, extend="runs_xla")
    assert np.array_equal(np.asarray(L1), np.asarray(L2))


def test_aligned_solve_and_refactorize():
    A = generators.poisson2d(20)
    pa = compile_plan(A, layout="aligned")
    aa = numeric.device_arrays(pa)
    La, d = numeric.factorize(pa, A.data, arrays=aa)
    x = np.asarray(_solve.solve(pa, La, np.ones(A.n), d=d, arrays=aa))
    r = np.linalg.norm(A.to_scipy() @ x - 1.0)
    assert r < 1e-8
    # refactorize with scaled values on the same plan/arrays
    L2, d2 = numeric.refactorize(pa, A.data * 4.0, aa)
    x2 = np.asarray(_solve.solve(pa, L2, np.ones(A.n), d=d2, arrays=aa))
    assert np.linalg.norm(A.to_scipy() @ (4.0 * x2) - 1.0) < 1e-8


def test_aligned_auto_cap(monkeypatch):
    """layout="auto" picks aligned under the cap, hybrid above it."""
    A = generators.poisson2d(12)
    p1 = compile_plan(A, layout="auto")
    assert p1.layout == "aligned"
    monkeypatch.setenv("SPARSECHOL_ALIGN_CAP", "1")
    p2 = compile_plan(A, layout="auto")
    assert p2.layout == "hybrid"
    # a 1-byte budget aligns nothing: placement is compact everywhere
    assert np.array_equal(p2.seg_stride, p2.block_m)
    assert np.array_equal(p2.below_off, p2.block_w)


def test_hybrid_budget_and_equality(monkeypatch):
    """A hybrid plan under a tight budget mixes aligned and compact
    buckets, stays within the cap, and factors bitwise-identically to
    both pure layouts."""
    A = generators.fem3d(6, 3)
    pc = compile_plan(A, layout="compact")
    pa = compile_plan(A, layout="aligned")
    assert pa.R_L > pc.R_L  # alignment actually costs rows here
    # budget halfway between compact and fully aligned forces a real mix
    cap_bytes = (pc.R_L + (pa.R_L - pc.R_L) // 2) * 128 * pc.dtype.itemsize
    monkeypatch.setenv("SPARSECHOL_ALIGN_CAP", str(cap_bytes))
    ph = compile_plan(A, layout="hybrid")
    assert ph.layout == "hybrid"
    assert pc.R_L < ph.R_L <= cap_bytes // (128 * pc.dtype.itemsize)
    al = ph.seg_stride != ph.block_m
    co = ~al
    assert al.any() and co.any(), "must be a true mix"
    ah = numeric.device_arrays(ph)
    assert any(m[5] for m in ah["meta"].value)  # some slab steps
    Lh, _ = numeric.factorize(ph, A.data, arrays=ah)
    Lc, _ = numeric.factorize(pc, A.data)
    La, _ = numeric.factorize(pa, A.data)
    Eh = ph.extract_csc(np.asarray(Lh)).to_dense()
    assert np.array_equal(Eh, pc.extract_csc(np.asarray(Lc)).to_dense())
    assert np.array_equal(Eh, pa.extract_csc(np.asarray(La)).to_dense())
    assert np.abs(Eh - _dense_chol(A)).max() < 1e-9


def test_hybrid_solve_and_window_extend(monkeypatch):
    A = generators.poisson2d(16)
    pc = compile_plan(A, layout="compact")
    pa = compile_plan(A, layout="aligned")
    cap_bytes = (pc.R_L + (pa.R_L - pc.R_L) // 2) * 128 * pc.dtype.itemsize
    monkeypatch.setenv("SPARSECHOL_ALIGN_CAP", str(cap_bytes))
    ph = compile_plan(A, layout="hybrid")
    ah = numeric.device_arrays(ph)
    L1, d = numeric.factorize(ph, A.data, arrays=ah, extend="scatter")
    L2, _ = numeric.factorize(ph, A.data, arrays=ah, extend="runs_xla")
    assert np.array_equal(np.asarray(L1), np.asarray(L2))
    x = np.asarray(_solve.solve(ph, L1, np.ones(A.n), d=d, arrays=ah))
    assert np.linalg.norm(A.to_scipy() @ x - 1.0) < 1e-8


def test_hybrid_instore_threshold():
    """plan.py's hybrid eligibility mirrors numeric.DENSE_INSTORE: keep
    the literal in compile_plan in sync with the numeric constant."""
    import inspect
    from sparsecholesky_tpu import plan as _plan

    src = inspect.getsource(_plan.compile_plan)
    assert f"w_pad_s < {numeric.DENSE_INSTORE}" in src


def test_aligned_serialize_roundtrip(tmp_path):
    from sparsecholesky_tpu import serialize

    A = generators.poisson2d(12)
    pa = compile_plan(A, layout="aligned")
    path = str(tmp_path / "plan.npz")
    serialize.save_plan(path, pa)
    pb = serialize.load_plan(path)
    assert pb.layout == "aligned"
    assert np.array_equal(pa.below_off, pb.below_off)
    assert np.array_equal(pa.seg_stride, pb.seg_stride)
    ab = numeric.device_arrays(pb)
    La, _ = numeric.factorize(pa, A.data, arrays=numeric.device_arrays(pa))
    Lb, _ = numeric.factorize(pb, A.data, arrays=ab)
    assert np.array_equal(np.asarray(La), np.asarray(Lb))


def test_parallel_requires_compact():
    from sparsecholesky_tpu.parallel import pstore

    A = generators.poisson2d(12)
    pa = compile_plan(A, layout="aligned")
    with pytest.raises(ValueError, match="compact-layout"):
        pstore.build_layout(pa, 2)


def test_hybrid_serialize_roundtrip(tmp_path, monkeypatch):
    from sparsecholesky_tpu import serialize

    A = generators.fem3d(6, 3)
    pc = compile_plan(A, layout="compact")
    pa = compile_plan(A, layout="aligned")
    cap_bytes = (pc.R_L + (pa.R_L - pc.R_L) // 2) * 128 * pc.dtype.itemsize
    monkeypatch.setenv("SPARSECHOL_ALIGN_CAP", str(cap_bytes))
    ph = compile_plan(A, layout="hybrid")
    path = str(tmp_path / "plan.npz")
    serialize.save_plan(path, ph)
    pb = serialize.load_plan(path)
    assert pb.layout == "hybrid"
    assert np.array_equal(ph.below_off, pb.below_off)
    assert np.array_equal(ph.seg_stride, pb.seg_stride)
    La, _ = numeric.factorize(ph, A.data)
    Lb, _ = numeric.factorize(pb, A.data)
    assert np.array_equal(np.asarray(La), np.asarray(Lb))
