"""Fill-reducing orderings.

The reference never permutes (SURVEY.md: "no fill-reducing ordering"; the
thesis discusses Minimum Degree in §5.4 but the code never implements it).
For large matrices an ordering is mandatory, so the TPU framework provides:

  * "natural"  — identity (reference-equivalent behavior)
  * "rcm"      — reverse Cuthill-McKee via scipy.sparse.csgraph
  * "amd"      — approximate minimum degree (own implementation)
  * "nd-grid"  — exact nested dissection for matrices generated from
                 structured grids (models.poisson2d/3d), the BASELINE.json
                 1M-row Poisson config
  * "auto"     — amd, falling back to natural on failure

All return perm such that the factorized matrix is (P A P^T)[i, j] =
A[perm[i], perm[j]].
"""

from __future__ import annotations

import numpy as np

from .csc import CSCMatrix


def natural(A: CSCMatrix) -> np.ndarray:
    return np.arange(A.n, dtype=np.int64)


def rcm(A: CSCMatrix) -> np.ndarray:
    import scipy.sparse as sp
    from scipy.sparse.csgraph import reverse_cuthill_mckee

    M = A.to_scipy().tocsr()
    perm = reverse_cuthill_mckee(M, symmetric_mode=True)
    return perm.astype(np.int64)


def amd(A: CSCMatrix) -> np.ndarray:
    """Approximate minimum degree (simplified quotient-graph variant).

    A compact AMD: eliminate the node of (approximately) minimum external
    degree, merging its adjacency into a quotient-graph element.  Uses true
    degrees recomputed lazily; adequate fill reduction for the benchmark
    classes without SuiteSparse.
    """
    import heapq

    n = A.n
    # full symmetric adjacency (sets), excluding the diagonal
    adj: list[set[int]] = [set() for _ in range(n)]
    cols = np.repeat(np.arange(A.n), np.diff(A.indptr))
    for i, j in zip(A.indices.tolist(), cols.tolist()):
        if i != j:
            adj[i].add(j)
            adj[j].add(i)

    alive = np.ones(n, dtype=bool)
    heap = [(len(adj[v]), v) for v in range(n)]
    heapq.heapify(heap)
    perm = np.empty(n, dtype=np.int64)
    k = 0
    stamp = np.zeros(n, dtype=np.int64)
    while heap:
        d, v = heapq.heappop(heap)
        if not alive[v] or d != len(adj[v]):
            continue
        perm[k] = v
        k += 1
        alive[v] = False
        nbrs = [u for u in adj[v] if alive[u]]
        # eliminate v: clique its alive neighbors
        for u in nbrs:
            adj[u].discard(v)
        for idx, u in enumerate(nbrs):
            au = adj[u]
            for t in nbrs[idx + 1 :]:
                if t not in au:
                    au.add(t)
                    adj[t].add(u)
        adj[v].clear()
        for u in nbrs:
            heapq.heappush(heap, (len(adj[u]), u))
    assert k == n
    return perm


def nd_grid(shape: tuple[int, ...]) -> np.ndarray:
    """Exact nested dissection for a structured grid of the given shape
    (matching models.poisson2d/3d index layout: C-order, x fastest)."""
    dims = tuple(int(s) for s in shape)
    n = int(np.prod(dims))
    idx = np.arange(n).reshape(dims[::-1])  # poisson uses (z, y, x) layout
    order: list[np.ndarray] = []

    def dissect(block: np.ndarray):
        if block.size == 0:
            return
        if block.size <= 8:
            order.append(block.ravel())
            return
        ax = int(np.argmax(block.shape))
        if block.shape[ax] < 3:
            order.append(block.ravel())
            return
        mid = block.shape[ax] // 2
        lo = [slice(None)] * block.ndim
        hi = [slice(None)] * block.ndim
        sep = [slice(None)] * block.ndim
        lo[ax] = slice(0, mid)
        hi[ax] = slice(mid + 1, None)
        sep[ax] = slice(mid, mid + 1)
        dissect(block[tuple(lo)])
        dissect(block[tuple(hi)])
        order.append(block[tuple(sep)].ravel())

    dissect(idx)
    perm = np.concatenate(order)
    assert len(perm) == n
    return perm.astype(np.int64)


def compute_ordering(A: CSCMatrix, method: str = "auto", *, grid_shape=None) -> np.ndarray:
    if method == "natural":
        return natural(A)
    if method == "rcm":
        return rcm(A)
    if method == "amd":
        return amd(A)
    if method == "nd-grid":
        if grid_shape is None:
            raise ValueError("nd-grid ordering needs grid_shape")
        return nd_grid(grid_shape)
    if method == "auto":
        try:
            return amd(A)
        except Exception:
            return natural(A)
    raise ValueError(f"unknown ordering {method!r}")
