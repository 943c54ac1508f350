"""Test configuration.

Multi-chip sharding tests run on a virtual 8-device CPU mesh
(XLA_FLAGS=--xla_force_host_platform_device_count=8), per SURVEY.md §4.
These env vars must be set before jax is first imported, so this conftest
sets them at collection time.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
# fp64 on CPU so oracle comparisons hold at reference tolerance (1e-9)
os.environ.setdefault("JAX_ENABLE_X64", "true")

import jax  # noqa: E402

# The axon sitecustomize force-selects the TPU platform via
# jax.config.update at interpreter start; override it back to CPU before
# any backend initializes (tests must not touch the real chip).
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402

import sparsecholesky_tpu as sc  # noqa: E402
from sparsecholesky_tpu.models import generators  # noqa: E402


@pytest.fixture
def thesis_A():
    """The 7x7 pattern matrix from the thesis (reference test fixture)."""
    return sc.csc_from_pattern(generators.THESIS_PATTERN)


@pytest.fixture
def tiny_spd():
    """The reference's 3x3 SPD test matrix
    (/root/reference/tests/test_chol.cpp:77-79)."""
    ti = [0, 0, 0, 1, 1, 2]
    tj = [0, 1, 2, 1, 2, 2]
    tx = [4.0, 1.0, 1.0, 3.0, 0.0, 2.0]
    return sc.triplet_to_csc(ti, tj, tx, 3)


@pytest.fixture(scope="session")
def bcsstk01():
    return sc.load_matrix_market(sc.bundled_matrix("bcsstk01"))


@pytest.fixture(scope="session")
def bus1138():
    return sc.load_matrix_market(sc.bundled_matrix("1138_bus"))


def dense_chol(A: "sc.CSCMatrix") -> np.ndarray:
    """Dense lower-Cholesky oracle (the reference's dpotrf_ role,
    /root/reference/tests/test_chol.cpp:73)."""
    return np.linalg.cholesky(A.to_dense())
