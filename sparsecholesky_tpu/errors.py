"""Error types for sparsecholesky_tpu.

The reference library reports numerical failure through ``std::expected``
carrying a string ("A is not positive definite.", /root/reference/include/chol.hpp:849-850)
and, in the supernodal path, a detailed message with the offending supernode
range and a dump of the diagonal entries
(/root/reference/include/chol.hpp:1265-1281).  We carry the same information
as a structured Python exception.
"""

from __future__ import annotations


class SparseCholeskyError(Exception):
    """Base class for all sparsecholesky_tpu errors."""


class NotPositiveDefiniteError(SparseCholeskyError):
    """Raised when a non-positive pivot is encountered during factorization.

    Mirrors the reference's error contract: the simplicial path reports a
    plain message, the supernodal path reports the supernode id / column
    range and pivot value so the failure can be localized.
    """

    def __init__(
        self,
        message: str = "A is not positive definite.",
        *,
        supernode: int | None = None,
        column_range: tuple[int, int] | None = None,
        pivot: float | None = None,
        column: int | None = None,
        diagonal=None,
    ):
        detail = message
        if supernode is not None:
            detail += f" (supernode {supernode}"
            if column_range is not None:
                detail += f", columns [{column_range[0]}, {column_range[1]})"
            if column is not None:
                detail += f", offending column {column}"
            if pivot is not None:
                detail += f", smallest pivot {pivot:.6e}"
            detail += ")"
        if diagonal is not None:
            # the reference dumps the panel's diagonal entries on failure
            # (/root/reference/include/chol.hpp:1265-1281); ours are the
            # factored L diagonals — finite entries are sqrt(pivot), the
            # failure point onward is nan/<=0
            vals = ", ".join(f"{float(v):.6e}" for v in diagonal[:16])
            if len(diagonal) > 16:
                vals += ", ..."
            detail += f"\n  supernode L diagonal: [{vals}]"
        super().__init__(detail)
        self.supernode = supernode
        self.column_range = column_range
        self.pivot = pivot
        self.column = column
        self.diagonal = diagonal


class SymbolicError(SparseCholeskyError):
    """Raised for malformed inputs to the symbolic phase."""


class IngestionError(SparseCholeskyError):
    """Raised for malformed triplet / MatrixMarket inputs."""
