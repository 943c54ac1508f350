"""sparsecholesky_tpu — a TPU-native sparse Cholesky framework.

Brand-new JAX/XLA/Pallas implementation of the capabilities of the
evanwporter/SparseCholesky reference library (symbolic analysis, supernodal
SPD factorization, ingestion, generators, inspection) extended with the
pieces a production solver needs: triangular solves, fill-reducing
orderings, benchmarking, and multi-chip execution over a device mesh.

Architecture (SURVEY.md §7): all irregular, data-dependent work happens
once on the host (symbolic analysis -> static plan of padded supernode
panels + precomputed gather/scatter index maps); the numeric phase is a
pure jittable function of (plan constants, values) built from MXU panel
kernels.
"""

from .csc import CSCMatrix, triplet_to_csc
from .errors import (
    IngestionError,
    NotPositiveDefiniteError,
    SparseCholeskyError,
    SymbolicError,
)
from .symbolic import SymbolicFactor, analyze, etree, post_order, col_count, ereach
from .utils.io import load_matrix_market, csc_from_pattern, bundled_matrix

__version__ = "0.1.0"

__all__ = [
    "CSCMatrix",
    "triplet_to_csc",
    "SymbolicFactor",
    "analyze",
    "etree",
    "post_order",
    "col_count",
    "ereach",
    "load_matrix_market",
    "csc_from_pattern",
    "bundled_matrix",
    "SparseCholeskyError",
    "NotPositiveDefiniteError",
    "SymbolicError",
    "IngestionError",
]
