"""Test/benchmark matrix generators.

TPU-native equivalents of the reference's random SPD generators
(/root/reference/include/chol.hpp:964-1034): same diagonal-dominance
recipes and fixed seeds (21 / 42), NumPy Generator instead of pcg32.
Adds structured-grid Laplacians (2D 5-point, 3D 7-point) for the
BASELINE.json Poisson configs — the reference has no analogue.
"""

from __future__ import annotations

import numpy as np

from ..csc import CSCMatrix, triplet_to_csc

#: The 7x7 pattern from page 26 of the thesis, used by the reference's tests
#: (/root/reference/tests/test_chol.cpp:7-15).  Per-row adjacency lists.
THESIS_PATTERN = [
    [0],
    [1],
    [0, 2],
    [3],
    [0, 2, 4],
    [0, 1, 3, 5],
    [0, 2, 5, 6],
]

#: Expected elimination tree / column-5 reach for THESIS_PATTERN
#: (/root/reference/tests/test_chol.cpp:21,38).
THESIS_ETREE = [2, 5, 4, 5, 5, 6, -1]
THESIS_REACH_COL5 = [3, 1, 0, 2, 4, 5, 6]


def random_sparse(
    n: int, density: float = 0.25, *, positive_definite: bool = True, seed: int = 21,
    dtype=np.float64,
) -> CSCMatrix:
    """Random SPD matrix: density-filtered upper-triangle entries, diagonal
    always kept and boosted by +n (reference recipe,
    /root/reference/include/chol.hpp:964-995, seed 21)."""
    rng = np.random.default_rng(seed)
    iu, ju = np.triu_indices(n)
    gate = rng.uniform(-n, n, size=iu.size)
    keep = (np.abs(gate) < density * n) | (iu == ju)
    iu, ju = iu[keep], ju[keep]
    vals = rng.uniform(-n, n, size=iu.size).astype(dtype)
    if positive_definite:
        # The reference's flat +n boost does not actually guarantee SPD at
        # moderate density; make the matrix strictly diagonally dominant
        # instead (diag = n + sum of |row|), which does.
        offdiag = np.where(iu != ju, np.abs(vals), 0.0)
        rowsum = np.bincount(iu, weights=offdiag, minlength=n) + np.bincount(
            ju, weights=offdiag, minlength=n
        )
        diag = iu == ju
        vals = np.where(diag, n + rowsum[iu], vals)
    return triplet_to_csc(iu, ju, vals, n, dtype=dtype)


def random_sparse_on_pattern(
    Lp: np.ndarray, Li: np.ndarray, n: int, *, positive_definite: bool = True,
    seed: int = 42, dtype=np.float64,
) -> CSCMatrix:
    """Random SPD values on an existing lower-triangular pattern (reference
    /root/reference/include/chol.hpp:1004-1034, seed 42): diagonal
    1.5*(|u| + n), off-diagonals |u|*10 with u ~ U(-1, 1).  Returned in
    canonical upper CSC."""
    rng = np.random.default_rng(seed)
    nnz = int(Lp[-1])
    cols = np.repeat(np.arange(n, dtype=np.int64), np.diff(Lp))
    rows = np.asarray(Li[:nnz], dtype=np.int64)
    u = rng.uniform(-1.0, 1.0, size=nnz)
    diag = rows == cols
    vals = np.where(
        diag,
        1.5 * (np.abs(u) + (n if positive_definite else 0)),
        np.abs(u) * 10.0,
    ).astype(dtype)
    return triplet_to_csc(rows, cols, vals, n, dtype=dtype)


def poisson2d(nx: int, ny: int | None = None, dtype=np.float64) -> CSCMatrix:
    """2D 5-point Laplacian on an nx-by-ny grid (SPD, n = nx*ny)."""
    ny = ny or nx
    n = nx * ny
    idx = np.arange(n).reshape(ny, nx)
    ti = [np.arange(n)]
    tj = [np.arange(n)]
    tx = [np.full(n, 4.0)]
    # right neighbors
    a, b = idx[:, :-1].ravel(), idx[:, 1:].ravel()
    ti.append(a); tj.append(b); tx.append(np.full(a.size, -1.0))
    # down neighbors
    a, b = idx[:-1, :].ravel(), idx[1:, :].ravel()
    ti.append(a); tj.append(b); tx.append(np.full(a.size, -1.0))
    return triplet_to_csc(
        np.concatenate(ti), np.concatenate(tj), np.concatenate(tx), n, dtype=dtype
    )


def fem3d(
    nx: int, dofs: int = 3, *, dtype=np.float64, seed: int = 7
) -> CSCMatrix:
    """Structural-mechanics-style SPD matrix: a 3D hex grid with ``dofs``
    unknowns per node and dense dof-block coupling along a 7-point stencil
    (plus diagonal coupling within a node's block).  Structurally similar
    to the SuiteSparse bcsstk family (BASELINE config 3 is bcsstk17-class,
    ~11k rows: fem3d(16, 3) -> 12,288); values are randomized
    symmetric-positive via diagonal dominance."""
    rng = np.random.default_rng(seed)
    nn = nx * nx * nx
    n = nn * dofs
    idx = np.arange(nn).reshape(nx, nx, nx)
    pairs = [np.stack([idx.ravel(), idx.ravel()], axis=1)]
    for a, b in (
        (idx[:, :, :-1], idx[:, :, 1:]),
        (idx[:, :-1, :], idx[:, 1:, :]),
        (idx[:-1, :, :], idx[1:, :, :]),
    ):
        pairs.append(np.stack([a.ravel(), b.ravel()], axis=1))
    pairs = np.concatenate(pairs, axis=0)
    # expand node pairs into dense dofs x dofs blocks (upper wedge)
    di, dj = np.meshgrid(np.arange(dofs), np.arange(dofs), indexing="ij")
    ti = (pairs[:, 0, None, None] * dofs + di[None]).ravel()
    tj = (pairs[:, 1, None, None] * dofs + dj[None]).ravel()
    keep = tj >= ti
    ti, tj = ti[keep], tj[keep]
    vals = rng.uniform(-1.0, 1.0, size=len(ti)).astype(dtype)
    off = ti != tj
    rowsum = np.bincount(ti, np.abs(vals) * off, minlength=n) + np.bincount(
        tj, np.abs(vals) * off, minlength=n
    )
    vals = np.where(off, vals, 1.0 + rowsum[ti])
    return triplet_to_csc(ti, tj, vals, n, dtype=dtype)


def irregular3d(
    nx: int, *, drop: float = 0.25, extra: float = 0.08, dofs: int = 1,
    dtype=np.float64, seed: int = 13
) -> CSCMatrix:
    """Irregular-mesh SPD matrix (BASELINE config 5 is audikw_1-class):
    a 3D grid graph with a random ``drop`` fraction of stencil edges
    removed and ``extra`` * n random longer-range edges added, so perfect
    grid separators do not exist and the fill-reducing ordering (AMD /
    BFS-ND) actually has to work.  irregular3d(100) -> 1M rows."""
    rng = np.random.default_rng(seed)
    nn = nx * nx * nx
    idx = np.arange(nn).reshape(nx, nx, nx)
    ei, ej = [], []
    for a, b in (
        (idx[:, :, :-1], idx[:, :, 1:]),
        (idx[:, :-1, :], idx[:, 1:, :]),
        (idx[:-1, :, :], idx[1:, :, :]),
    ):
        keep = rng.uniform(size=a.size) >= drop
        ei.append(a.ravel()[keep])
        ej.append(b.ravel()[keep])
    nex = int(extra * nn)
    # short-range random edges (within a small neighborhood, like crossing
    # element diagonals in an unstructured mesh)
    src = rng.integers(0, nn, size=nex)
    jump = rng.integers(1, nx * nx + 2, size=nex)
    dst = np.minimum(nn - 1, src + jump)
    ei.append(src)
    ej.append(dst)
    ei = np.concatenate(ei)
    ej = np.concatenate(ej)
    if dofs > 1:
        di, dj = np.meshgrid(np.arange(dofs), np.arange(dofs), indexing="ij")
        ei = (ei[:, None, None] * dofs + di[None]).ravel()
        ej = (ej[:, None, None] * dofs + dj[None]).ravel()
    n = nn * dofs
    ti = np.concatenate([np.arange(n), ei])
    tj = np.concatenate([np.arange(n), ej])
    vals = rng.uniform(-1.0, 1.0, size=len(ti)).astype(dtype)
    off = ti != tj
    lo = np.minimum(ti, tj)
    hi = np.maximum(ti, tj)
    rowsum = np.bincount(lo, np.abs(vals) * off, minlength=n) + np.bincount(
        hi, np.abs(vals) * off, minlength=n
    )
    vals = np.where(off, vals, 1.0 + rowsum[ti])
    return triplet_to_csc(ti, tj, vals, n, dtype=dtype)


def poisson3d(nx: int, ny: int | None = None, nz: int | None = None, dtype=np.float64) -> CSCMatrix:
    """3D 7-point Laplacian on an nx*ny*nz grid (the BASELINE.json 1M-row
    Poisson config at nx=ny=nz=100)."""
    ny = ny or nx
    nz = nz or nx
    n = nx * ny * nz
    idx = np.arange(n).reshape(nz, ny, nx)
    ti = [np.arange(n)]
    tj = [np.arange(n)]
    tx = [np.full(n, 6.0)]
    for a, b in (
        (idx[:, :, :-1], idx[:, :, 1:]),
        (idx[:, :-1, :], idx[:, 1:, :]),
        (idx[:-1, :, :], idx[1:, :, :]),
    ):
        ti.append(a.ravel()); tj.append(b.ravel())
        tx.append(np.full(a.size, -1.0))
    return triplet_to_csc(
        np.concatenate(ti), np.concatenate(tj), np.concatenate(tx), n, dtype=dtype
    )
