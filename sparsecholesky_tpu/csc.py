"""Host-side compressed-sparse-column storage.

TPU-native re-design of the reference's CSC containers
(``internal::csc_storage`` /root/reference/include/chol.hpp:38-97 and
``csc_matrix<T, sym>`` /root/reference/include/chol.hpp:134-299).

Design differences from the reference, on purpose:

* Struct-of-arrays NumPy int32/float arrays instead of ``std::vector`` —
  these feed the host-side symbolic phase and the static plan compiler;
  nothing here ever lands on the TPU directly.
* Symmetry is a storage *convention*, not an access-time index flip: a
  symmetric SPD matrix is canonically stored as its **upper triangle**,
  sorted by (col, row) with duplicates merged, exactly the invariant the
  reference establishes in ``triplet_to_csc_matrix``
  (/root/reference/include/chol.hpp:309-369).  All symbolic routines consume
  this canonical form.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from .errors import IngestionError

INDEX_DTYPE = np.int32


@dataclasses.dataclass
class CSCMatrix:
    """A square sparse matrix in CSC form.

    Attributes:
      n: matrix order (square).
      indptr: int32[n+1] column pointers.
      indices: int32[nnz] row indices, sorted within each column.
      data: float[nnz] values.
      sym: one of "upper", "lower", "none".  "upper"/"lower" means only that
        triangle is stored and the matrix is implicitly symmetric.
    """

    n: int
    indptr: np.ndarray
    indices: np.ndarray
    data: np.ndarray
    sym: str = "upper"

    def __post_init__(self):
        self.indptr = np.asarray(self.indptr, dtype=INDEX_DTYPE)
        self.indices = np.asarray(self.indices, dtype=INDEX_DTYPE)
        self.data = np.asarray(self.data)
        if self.indptr.shape != (self.n + 1,):
            raise IngestionError(
                f"indptr has shape {self.indptr.shape}, expected ({self.n + 1},)"
            )
        if self.indices.shape != self.data.shape:
            raise IngestionError("indices and data length mismatch")
        if self.sym not in ("upper", "lower", "none"):
            raise IngestionError(f"bad symmetry tag {self.sym!r}")

    @property
    def nnz(self) -> int:
        return int(self.indptr[-1])

    @property
    def shape(self) -> tuple[int, int]:
        return (self.n, self.n)

    @property
    def dtype(self):
        return self.data.dtype

    def find_index(self, i: int, j: int) -> int:
        """Position of stored entry (i, j) in ``indices``/``data``, or -1.

        Binary search within column j, mirroring ``find_index``
        (/root/reference/include/chol.hpp:72-96) but via searchsorted.
        Symmetric tags flip (i, j) into the stored triangle like the
        reference's ``operator[](i, j)`` (/root/reference/include/chol.hpp:219-241).
        """
        if self.sym == "upper" and i > j:
            i, j = j, i
        elif self.sym == "lower" and i < j:
            i, j = j, i
        lo, hi = int(self.indptr[j]), int(self.indptr[j + 1])
        pos = lo + int(np.searchsorted(self.indices[lo:hi], i))
        if pos < hi and self.indices[pos] == i:
            return pos
        return -1

    def __getitem__(self, key) -> float:
        i, j = key
        pos = self.find_index(i, j)
        return self.data[pos] if pos >= 0 else self.data.dtype.type(0)

    def transpose_pattern(self) -> tuple[np.ndarray, np.ndarray]:
        """(indptr, indices) of the structural transpose (counting sort).

        Port of the role of ``transpose_pattern``
        (/root/reference/include/chol.hpp:507-534); vectorized.
        """
        counts = np.bincount(self.indices, minlength=self.n)
        tp = np.zeros(self.n + 1, dtype=INDEX_DTYPE)
        np.cumsum(counts, out=tp[1:])
        order = np.argsort(self.indices, kind="stable")
        cols = np.repeat(np.arange(self.n, dtype=INDEX_DTYPE), np.diff(self.indptr))
        return tp, cols[order]

    def transpose(self) -> "CSCMatrix":
        """Full transpose with values (reference: /root/reference/include/chol.hpp:244-298)."""
        counts = np.bincount(self.indices, minlength=self.n)
        tp = np.zeros(self.n + 1, dtype=INDEX_DTYPE)
        np.cumsum(counts, out=tp[1:])
        order = np.argsort(self.indices, kind="stable")
        cols = np.repeat(np.arange(self.n, dtype=INDEX_DTYPE), np.diff(self.indptr))
        sym = {"upper": "lower", "lower": "upper"}.get(self.sym, "none")
        return CSCMatrix(self.n, tp, cols[order], self.data[order], sym=sym)

    def to_dense(self) -> np.ndarray:
        """Densify with symmetry mirroring (reference ``csc_to_dense``,
        /root/reference/include/chol.hpp:1449-1479)."""
        out = np.zeros((self.n, self.n), dtype=self.data.dtype)
        cols = np.repeat(np.arange(self.n), np.diff(self.indptr))
        rows = self.indices
        out[rows, cols] = self.data
        if self.sym in ("upper", "lower"):
            mirror = out.T.copy()
            np.fill_diagonal(mirror, 0)
            out = out + mirror
        return out

    def to_scipy(self):
        """Convert to a scipy.sparse.csc_matrix of the *full* symmetric matrix."""
        import scipy.sparse as sp

        m = sp.csc_matrix(
            (self.data, self.indices, self.indptr), shape=(self.n, self.n)
        )
        if self.sym in ("upper", "lower"):
            d = sp.diags(m.diagonal())
            m = m + m.T - d
        return m


def triplet_to_csc(
    rows, cols, vals, n: int, *, mirror_to_upper: bool = True, dtype=np.float64
) -> CSCMatrix:
    """Build a canonical upper-triangle CSC from COO triplets.

    Same contract as the reference's ``triplet_to_csc_matrix``
    (/root/reference/include/chol.hpp:309-369): every entry is mirrored to the
    upper triangle (swap when col < row), entries are sorted by (col, row),
    and duplicates are merged **by summing**.  Vectorized with lexsort +
    reduceat instead of the reference's scalar sort/merge loops.
    """
    rows = np.asarray(rows, dtype=np.int64)
    cols = np.asarray(cols, dtype=np.int64)
    vals = np.asarray(vals, dtype=dtype)
    if rows.shape != cols.shape or rows.shape != vals.shape:
        raise IngestionError("triplet arrays must have equal length")
    if rows.size and (rows.min() < 0 or cols.min() < 0 or rows.max() >= n or cols.max() >= n):
        raise IngestionError("triplet index out of range")

    if mirror_to_upper:
        lo = np.minimum(rows, cols)
        hi = np.maximum(rows, cols)
        rows, cols = lo, hi

    order = np.lexsort((rows, cols))
    rows, cols, vals = rows[order], cols[order], vals[order]

    if rows.size:
        key = cols * np.int64(n) + rows
        first = np.ones(rows.size, dtype=bool)
        first[1:] = key[1:] != key[:-1]
        starts = np.flatnonzero(first)
        merged_vals = np.add.reduceat(vals, starts)
        rows, cols = rows[starts], cols[starts]
    else:
        merged_vals = vals

    indptr = np.zeros(n + 1, dtype=INDEX_DTYPE)
    counts = np.bincount(cols, minlength=n)
    indptr[1:] = np.cumsum(counts)
    sym = "upper" if mirror_to_upper else "none"
    return CSCMatrix(n, indptr, rows.astype(INDEX_DTYPE), merged_vals, sym=sym)
