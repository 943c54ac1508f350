"""High-level user API.

The reference's top-level surface is ``chol(A)`` / ``chol_sn(A)`` /
``schol(A)`` returning ``std::expected`` (/root/reference/include/chol.hpp:750,
:874, :1407).  The TPU framework exposes the same split as:

    S    = analyze(A)                      # symbolic (host, reusable)
    F    = chol(A)                         # full pipeline -> CholeskyFactor
    x    = F.solve(b)                      # new capability (BASELINE cfg 1)
    F2   = F.refactorize(new_values)       # schol/chol split, explicit
    L    = F.L()                           # lower CSC, reference-comparable
"""

from __future__ import annotations

import dataclasses

import numpy as np

from .csc import CSCMatrix
from .ordering import compute_ordering
from .plan import FactorizePlan, compile_plan
from . import numeric as _numeric
from . import solve as _solve


@dataclasses.dataclass
class CholeskyFactor:
    """Factorization result: plan + device factor, with solve/export."""

    plan: FactorizePlan
    arrays: dict
    Lx: object  # device array, block store (N_L + 1 slots)

    def solve(self, rhs) -> np.ndarray:
        """Solve A x = rhs (rhs in original index order)."""
        return np.asarray(
            _solve.solve(self.plan, self.Lx, rhs, arrays=self.arrays)
        )

    def L(self) -> CSCMatrix:
        """Export the factor of P A P^T as sorted lower CSC (host)."""
        return self.plan.extract_csc(np.asarray(self.Lx[: self.plan.N_L]))

    def log_det(self) -> float:
        """log det(A) = 2 * sum(log diag L)."""
        diag = self.diag()
        return float(2.0 * np.sum(np.log(diag)))

    def diag(self) -> np.ndarray:
        """Diagonal of L (in permuted order)."""
        Lx = np.asarray(self.Lx)
        out = np.empty(self.plan.n, dtype=Lx.dtype)
        S = self.plan.S
        for s in range(S.ns):
            w = int(self.plan.block_w[s])
            off = int(self.plan.block_off[s])
            for j in range(w):
                out[int(S.sn_ptr[s]) + j] = Lx[off + j * w + j]
        return out

    def refactorize(self, Ax) -> "CholeskyFactor":
        """Numeric-only refactorization with new values on the same pattern
        (the reference's schol/chol split as a first-class operation)."""
        Lx = _numeric.factorize(self.plan, Ax, arrays=self.arrays)
        return CholeskyFactor(self.plan, self.arrays, Lx)

    @property
    def perm(self) -> np.ndarray:
        return self.plan.perm


def chol(
    A: CSCMatrix,
    *,
    ordering: str = "natural",
    grid_shape=None,
    backend: str = "xla",
    dtype=None,
    analyze_kwargs: dict | None = None,
) -> CholeskyFactor:
    """Full sparse Cholesky pipeline: ordering -> symbolic -> plan -> numeric.

    Matches the reference's chol_sn(A) contract (supernodal factorization of
    an SPD matrix in canonical upper CSC), raising NotPositiveDefiniteError
    instead of returning std::unexpected.
    """
    perm = compute_ordering(A, ordering, grid_shape=grid_shape)
    plan = compile_plan(A, perm=perm, dtype=dtype, analyze_kwargs=analyze_kwargs)
    arrays = _numeric.device_arrays(plan)
    Lx = _numeric.factorize(plan, A.data, arrays=arrays, backend=backend)
    return CholeskyFactor(plan, arrays, Lx)
