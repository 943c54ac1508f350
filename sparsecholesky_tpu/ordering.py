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
  * "auto"     — best of nd/amd by predicted fill (small n), nd (large)

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
    """Approximate minimum degree (Amestoy-Davis-Duff quotient graph).

    Prefers the native C++ engine (native/symbolic.cpp sct_amd_order):
    full AMD with A_u\\Lp pruning, |Le\\Lp| approximate degrees,
    aggressive element absorption and supervariable mass elimination —
    measured within ~10%% of scipy's MMD fill on every workload class and
    near-linear in time.  Falls back to the pure-Python exact-degree
    variant below (quadratic-ish; small n only).
    """
    try:
        from . import _native

        return _native.amd_order(A)
    except Exception:
        if A.n > 8000:
            import warnings

            warnings.warn(
                f"native AMD engine unavailable; falling back to the "
                f"quadratic-ish Python AMD for n={A.n} (this can take "
                f"hours on large matrices — check the native/ build)",
                RuntimeWarning,
                stacklevel=2,
            )
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


def nested_dissection(A: CSCMatrix, *, leaf: int = 96) -> np.ndarray:
    """General-graph nested dissection via BFS level-set bisection.

    The TPU-relevant property of ND over minimum degree: it concentrates
    fill into a few *wide dense separators* (big MXU panels, shallow
    assembly trees) instead of many thin supernodes.  Separator choice:
    from a pseudo-peripheral source, take the BFS level nearest the median
    node that has the smallest size — a standard level-structure separator
    (the approach METIS falls back to on graphs without good geometry).
    Runs on the host in O(E log V) with vectorized frontier BFS.
    """
    import scipy.sparse as sp

    n = A.n
    G = A.to_scipy().tocsr()
    G = (G + G.T).tocsr()
    G.data[:] = 1

    order: list[np.ndarray] = []

    def bfs_levels(indptr, indices, nsub, src):
        lev = np.full(nsub, -1, dtype=np.int64)
        lev[src] = 0
        frontier = np.array([src], dtype=np.int64)
        d = 0
        while frontier.size:
            d += 1
            # all neighbors of the frontier (vectorized per level)
            starts, ends = indptr[frontier], indptr[frontier + 1]
            total = int((ends - starts).sum())
            if total == 0:
                break
            nbr = np.concatenate(
                [indices[s:e] for s, e in zip(starts, ends)]
            ) if len(frontier) < 1024 else indices[
                np.concatenate([np.arange(s, e) for s, e in zip(starts, ends)])
            ]
            nbr = nbr[lev[nbr] < 0]
            if nbr.size == 0:
                break
            nbr = np.unique(nbr)
            lev[nbr] = d
            frontier = nbr
        return lev

    def rec(nodes: np.ndarray, depth: int):
        m = len(nodes)
        if m <= leaf:
            order.append(nodes)
            return
        sub = G[nodes][:, nodes].tocsr()
        indptr, indices = sub.indptr, sub.indices
        lev = bfs_levels(indptr, indices, m, 0)
        unreached = lev < 0
        if unreached.any():
            # disconnected: recurse per piece
            rec(nodes[~unreached], depth)
            rec(nodes[unreached], depth)
            return
        # pseudo-peripheral: restart from a farthest node
        src = int(np.argmax(lev))
        lev = bfs_levels(indptr, indices, m, src)
        nlev = int(lev.max()) + 1
        if nlev < 3:
            order.append(nodes)  # near-clique: no useful separator
            return
        counts = np.bincount(lev, minlength=nlev)
        csum = np.cumsum(counts)
        midlev = int(np.searchsorted(csum, m // 2))
        midlev = min(max(midlev, 1), nlev - 2)
        # smallest level within a +-20% band around the median level
        band = max(1, nlev // 5)
        lo = max(1, midlev - band)
        hi = min(nlev - 2, midlev + band)
        sep_lev = lo + int(np.argmin(counts[lo : hi + 1]))
        sep = lev == sep_lev
        left = lev < sep_lev
        right = lev > sep_lev
        rec(nodes[left], depth + 1)
        rec(nodes[right], depth + 1)
        order.append(nodes[sep])

    rec(np.arange(n, dtype=np.int64), 0)
    perm = np.concatenate(order)
    assert len(perm) == n
    return perm


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
    if method == "nd":
        return nested_dissection(A)
    if method == "auto":
        try:
            # Both candidates are fill-compared by cheap column counts.
            # Measured nnz(L): AMD wins on fem3d (2.52M vs 2.61M) and
            # irregular meshes (7.2M vs 16.4M at n=27k), BFS-ND on
            # regular Poisson grids (6.0M vs 7.6M at 32^3); no single
            # default dominates.  Above ~150k rows the BFS-ND candidate
            # is dropped: it costs ~minutes at 1M rows (AMD: 2s) and has
            # lost on every irregular mesh measured — callers with
            # regular grids should pass grid_shape for nd-grid anyway.
            if A.n > 150_000:
                return amd(A)
            cands = []
            for fn in (nested_dissection, amd):
                try:
                    p = fn(A)
                    cands.append((predicted_nnzL(A, p), p))
                except Exception:
                    pass
            if cands:
                return min(cands, key=lambda t: t[0])[1]
            return natural(A)
        except Exception:
            return natural(A)
    raise ValueError(f"unknown ordering {method!r}")


def predicted_nnzL(A: CSCMatrix, perm: np.ndarray) -> int:
    """nnz(L) under ``perm`` from the column counts alone (O(|A| alpha) —
    no pattern materialization), for ordering-quality comparisons."""
    from .symbolic import etree, post_order, col_count

    n = A.n
    iperm = np.empty(n, dtype=np.int64)
    iperm[perm] = np.arange(n, dtype=np.int64)
    cols = np.repeat(np.arange(n, dtype=np.int64), np.diff(A.indptr))
    pr, pc = iperm[A.indices.astype(np.int64)], iperm[cols]
    lo, hi = np.minimum(pr, pc), np.maximum(pr, pc)
    order = np.lexsort((lo, hi))
    indptr = np.zeros(n + 1, dtype=np.int64)
    indptr[1:] = np.cumsum(np.bincount(hi, minlength=n))
    pA = CSCMatrix(n, indptr, lo[order], np.zeros(len(lo)), sym="upper")
    parent = etree(pA)
    post = post_order(parent)
    return int(col_count(pA, parent, post).sum())
