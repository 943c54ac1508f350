"""CPU oracle tests vs the dense Cholesky (dpotrf_ role), matching the
reference's oracle pattern (/root/reference/tests/test_chol.cpp:59-97)."""

import numpy as np
import pytest

import sparsecholesky_tpu as sc
from sparsecholesky_tpu import oracle
from sparsecholesky_tpu.models import generators

from conftest import dense_chol


def test_simplicial_tiny(tiny_spd):
    L = oracle.chol_simplicial(tiny_spd)
    expected = dense_chol(tiny_spd)
    np.testing.assert_allclose(np.tril(L.to_dense()), expected, atol=1e-9)


def test_simplicial_bcsstk01(bcsstk01):
    L = oracle.chol_simplicial(bcsstk01)
    expected = dense_chol(bcsstk01)
    np.testing.assert_allclose(np.tril(L.to_dense()), expected, atol=1e-6 * np.abs(expected).max())
    # residual check: || A - L L^T ||_F / || A ||_F
    A = bcsstk01.to_dense()
    Ld = L.to_dense()
    rel = np.linalg.norm(A - np.tril(Ld) @ np.tril(Ld).T) / np.linalg.norm(A)
    assert rel < 1e-12


def test_simplicial_random():
    A = generators.random_sparse(60, 0.3)
    L = oracle.chol_simplicial(A)
    expected = dense_chol(A)
    np.testing.assert_allclose(np.tril(L.to_dense()), expected, atol=1e-9)


def test_simplicial_not_pd():
    # indefinite matrix: diagonal not dominant
    A = sc.triplet_to_csc([0, 0, 1], [0, 1, 1], [1.0, 5.0, 1.0], 2)
    with pytest.raises(sc.NotPositiveDefiniteError):
        oracle.chol_simplicial(A)
