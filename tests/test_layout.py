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
    # the aligned plan must actually take the slab fast path
    assert any(m[5] for m in aa["meta"].value)
    assert not any(m[5] for m in ac["meta"].value)
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
    """layout="auto" picks aligned under the cap, compact above it."""
    A = generators.poisson2d(12)
    p1 = compile_plan(A, layout="auto")
    assert p1.layout == "aligned"
    monkeypatch.setenv("SPARSECHOL_ALIGN_CAP", "1")
    p2 = compile_plan(A, layout="auto")
    assert p2.layout == "compact"


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
