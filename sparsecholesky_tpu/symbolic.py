"""Host-side symbolic analysis for sparse Cholesky.

This is the TPU-native re-design of the reference's symbolic layer
(/root/reference/include/chol.hpp:378-946 and /root/reference/src/chol.cpp).
Everything here runs once on the host in NumPy/Python and produces a fully
static description of the factorization — elimination tree, postorder,
column counts, the pattern of L, a supernode partition (with relaxed
amalgamation the reference lacks), the assembly tree, and a level-set
wavefront schedule.  The numeric phase (see plan.py / numeric.py) consumes
this as compile-time constants; no data-dependent control flow ever reaches
the device.

The graph algorithms are the classical ones (Liu's elimination-tree
algorithm, SuiteSparse-style postorder and skeleton column counts, etree
reach sets); the reference implements the same family:
  * etree        — /root/reference/include/chol.hpp:378-410
  * post_order   — /root/reference/include/chol.hpp:445-499
  * col_count    — /root/reference/include/chol.hpp:537-622
  * ereach       — /root/reference/include/chol.hpp:689-739
  * schol        — /root/reference/include/chol.hpp:874-946
  * compute_supernodes / atree / compute_levels — /root/reference/src/chol.cpp:7-136

Unlike the reference, the symbolic L pattern here is *supernodal*: after
amalgamation every column of a supernode stores the supernode's full row
union (CHOLMOD-style), which may include a bounded number of explicit
zeros.  That is what lets the numeric phase run dense MXU panels.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from .csc import CSCMatrix, INDEX_DTYPE
from .errors import SymbolicError

# ---------------------------------------------------------------------------
# Elimination tree


def etree(A: CSCMatrix) -> np.ndarray:
    """Elimination tree of an SPD matrix stored as upper-triangle CSC.

    Liu's algorithm with ancestor path compression; parent[j] = -1 for roots.
    Behavioral contract matches ``etree`` (/root/reference/include/chol.hpp:378-410).
    """
    if A.sym != "upper":
        raise SymbolicError("etree expects canonical upper-triangle CSC input")
    n = A.n
    parent = np.full(n, -1, dtype=INDEX_DTYPE)
    ancestor = np.full(n, -1, dtype=INDEX_DTYPE)
    Ap, Ai = A.indptr, A.indices
    for k in range(n):
        for p in range(Ap[k], Ap[k + 1]):
            i = Ai[p]
            while i != -1 and i < k:
                inext = ancestor[i]
                ancestor[i] = k
                if inext == -1:
                    parent[i] = k
                i = inext
    return parent


# ---------------------------------------------------------------------------
# Postorder


def post_order(parent: np.ndarray) -> np.ndarray:
    """Postorder of the elimination tree (iterative DFS).

    Same output contract as ``post_order`` (/root/reference/include/chol.hpp:445-499):
    children are visited youngest-first via head/next sibling lists, roots in
    increasing order.
    """
    n = len(parent)
    head = np.full(n, -1, dtype=np.int64)
    nxt = np.full(n, -1, dtype=np.int64)
    # Build child lists; iterating j descending makes each head the youngest child.
    for j in range(n - 1, -1, -1):
        p = parent[j]
        if p != -1:
            nxt[j] = head[p]
            head[p] = j
    post = np.empty(n, dtype=INDEX_DTYPE)
    k = 0
    stack = []
    for root in range(n):
        if parent[root] != -1:
            continue
        stack.append(root)
        while stack:
            j = stack[-1]
            child = head[j]
            if child == -1:
                post[k] = j
                k += 1
                stack.pop()
            else:
                head[j] = nxt[child]
                stack.append(child)
    if k != n:
        raise SymbolicError("parent vector is not a forest")
    return post


# ---------------------------------------------------------------------------
# Column counts (skeleton / LCA algorithm)


def col_count(A: CSCMatrix, parent: np.ndarray, post: np.ndarray) -> np.ndarray:
    """nnz of each column of L (including the diagonal).

    Skeleton-matrix algorithm with first-descendant / max-first /
    previous-leaf / LCA path compression — the reference's ``col_count``
    (/root/reference/include/chol.hpp:537-622), O(|A| α(n)).
    """
    n = A.n
    delta = np.zeros(n, dtype=np.int64)
    first = np.full(n, -1, dtype=np.int64)
    # First-descendant pass: delta[j] = 1 iff j is a leaf of its subtree.
    for k in range(n):
        j = int(post[k])
        delta[j] = 1 if first[j] == -1 else 0
        while j != -1 and first[j] == -1:
            first[j] = k
            j = int(parent[j])

    # Iterate rows of the upper triangle: entry (j, i) with i > j is reached
    # by walking column j of A's structural transpose.
    ATp, ATi = A.transpose_pattern()

    maxfirst = np.full(n, -1, dtype=np.int64)
    prevleaf = np.full(n, -1, dtype=np.int64)
    ancestor = np.arange(n, dtype=np.int64)
    for k in range(n):
        j = int(post[k])
        pj = int(parent[j])
        if pj != -1:
            delta[pj] -= 1  # j is not a root
        for p in range(ATp[j], ATp[j + 1]):
            i = int(ATi[p])
            if i <= j:
                continue
            # leaf test for j in the row subtree of i
            if first[j] <= maxfirst[i]:
                continue
            maxfirst[i] = first[j]
            jprev = prevleaf[i]
            prevleaf[i] = j
            delta[j] += 1
            if jprev != -1:
                # subsequent leaf: subtract at LCA(jprev, j)
                q = int(jprev)
                while q != ancestor[q]:
                    q = int(ancestor[q])
                s = int(jprev)
                while s != q:
                    sparent = int(ancestor[s])
                    ancestor[s] = q
                    s = sparent
                delta[q] -= 1
        if pj != -1:
            ancestor[j] = pj

    counts = delta
    for j in range(n):
        pj = int(parent[j])
        if pj != -1:
            counts[pj] += counts[j]
    return counts.astype(np.int64)


# ---------------------------------------------------------------------------
# Reach sets


def ereach(
    A: CSCMatrix, k: int, parent: np.ndarray, *, mark_diagonal: bool = False
) -> np.ndarray:
    """Row-subtree reach of column k, in the reference's emission order.

    Walks up the elimination tree from each entry of A(:, k), exactly the
    reference's ``ereach_impl`` (/root/reference/include/chol.hpp:689-716):
    with ``mark_diagonal=False`` (the reference's bare call, as exercised by
    its ColumnReach test) the walk passes through k up to the root, so the
    result includes k and its ancestors; the numeric driver pre-marks
    w[k] = k before calling (/root/reference/include/chol.hpp:807), which
    ``mark_diagonal=True`` reproduces — then the result is exactly the
    pattern of row k of L excluding the diagonal, in topological order.
    """
    n = A.n
    w = np.full(n, -1, dtype=np.int64)
    s = np.empty(n, dtype=np.int64)
    top = n
    if mark_diagonal:
        w[k] = k
    Ap, Ai = A.indptr, A.indices
    for p in range(Ap[k], Ap[k + 1]):
        i = int(Ai[p])
        if i > k:
            continue
        ln = 0
        while i != -1 and w[i] != k:
            s[ln] = i
            ln += 1
            w[i] = k
            i = int(parent[i])
        while ln > 0:
            ln -= 1
            top -= 1
            s[top] = s[ln]
    return s[top:n].astype(INDEX_DTYPE)


# ---------------------------------------------------------------------------
# Full symbolic factorization (strict pattern of L, lower CSC, sorted)


def symbolic_pattern(
    A: CSCMatrix, parent: np.ndarray, counts: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """(indptr, indices) of L's strict pattern, lower CSC, sorted columns.

    Role of ``schol`` (/root/reference/include/chol.hpp:874-946).  The
    reference fills per-level in parallel with atomic cursors and leaves
    columns unsorted; here a single host pass fills via row-subtree reach
    sets and sorts — determinism is a design requirement (§5 of SURVEY.md).
    """
    n = A.n
    Lp = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(counts, out=Lp[1:])
    nnz = int(Lp[-1])
    Li = np.empty(nnz, dtype=INDEX_DTYPE)
    cursor = Lp[:-1].copy()

    # Diagonal first: every column j contains row j.
    Li[cursor] = np.arange(n, dtype=INDEX_DTYPE)
    cursor += 1

    w = np.full(n, -1, dtype=np.int64)
    s = np.empty(n, dtype=np.int64)
    Ap, Ai = A.indptr, A.indices
    for k in range(n):
        # inline ereach(A, k) — row k of L: columns j < k with L(k, j) != 0
        top = n
        w[k] = k
        for p in range(Ap[k], Ap[k + 1]):
            i = int(Ai[p])
            if i > k:
                continue
            ln = 0
            while w[i] != k:
                s[ln] = i
                ln += 1
                w[i] = k
                i = int(parent[i])
            while ln > 0:
                ln -= 1
                top -= 1
                s[top] = s[ln]
        for t in range(top, n):
            j = int(s[t])
            Li[cursor[j]] = k
            cursor[j] += 1

    if not np.array_equal(cursor, Lp[1:]):
        raise SymbolicError("column counts disagree with reach fill")
    # Rows within a column are appended in increasing k, hence already sorted.
    return Lp.astype(np.int64), Li


# ---------------------------------------------------------------------------
# Supernodes


def fundamental_supernodes(
    Lp: np.ndarray, parent: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """Strict supernode partition by the column-replication test.

    Column j joins column j-1's supernode iff parent[j-1] == j and
    nnz(L(:,j)) == nnz(L(:,j-1)) - 1 — the reference's ``compute_supernodes``
    (/root/reference/src/chol.cpp:42-100).

    Returns (sn_ptr, sn_id): sn_ptr is colptr-like over columns,
    sn_id maps column -> supernode.
    """
    n = len(parent)
    boundaries = [0]
    sn_id = np.zeros(n, dtype=INDEX_DTYPE)
    sid = 0
    for j in range(1, n):
        lenj = Lp[j + 1] - Lp[j]
        lenjm1 = Lp[j] - Lp[j - 1]
        if parent[j - 1] == j and lenj == lenjm1 - 1:
            sn_id[j] = sid
        else:
            boundaries.append(j)
            sid += 1
            sn_id[j] = sid
    boundaries.append(n)
    return np.asarray(boundaries, dtype=np.int64), sn_id


def amalgamate(
    sn_ptr: np.ndarray,
    sn_rows: list[np.ndarray],
    parent: np.ndarray,
    *,
    relax_ratio: float = 0.35,
    small: int = 16,
    max_width: int = 128,
) -> tuple[np.ndarray, list[np.ndarray]]:
    """Relaxed supernode amalgamation (not present in the reference).

    The reference's strict rule yields many width-1..4 supernodes — hopeless
    for a 128x128 MXU.  Greedily merge a supernode into its successor when
    the columns are contiguous, the etree links them (parent of the last
    column is the first column of the successor), and the fraction of
    explicit zeros introduced stays below ``relax_ratio`` (always merge when
    both are ``small``).  This is the standard relaxation CHOLMOD/MUMPS use.

    sn_rows[s] must be the sorted row union of supernode s (its first
    (width) entries are exactly its own columns).
    """
    ns = len(sn_ptr) - 1
    # Single left-to-right pass with an accumulator (append-only — the
    # greedy "merge s into s+1, retry" loop is equivalent to folding each
    # successor into a running current segment; the old list-surgery
    # version was O(ns^2) via repeated del, ADVICE/VERDICT r3 weak #8).
    out_starts: list[int] = []
    out_ends: list[int] = []
    out_rows: list[np.ndarray] = []
    cs, ce = int(sn_ptr[0]), int(sn_ptr[1])
    cr = np.asarray(sn_rows[0], dtype=np.int64)
    for s in range(1, ns):
        b0, b1 = int(sn_ptr[s]), int(sn_ptr[s + 1])
        br = np.asarray(sn_rows[s], dtype=np.int64)
        if ce == b0 and parent[ce - 1] == ce:
            wa, wb = ce - cs, b1 - b0
            w_new = wa + wb
            if w_new <= max_width:
                union = np.union1d(cr, br)
                # new block is |union| x w_new; count structural entries kept
                nz_old = wa * len(cr) + wb * len(br)
                nz_new = w_new * len(union)
                waste = (nz_new - nz_old) / max(nz_new, 1)
                if waste <= relax_ratio or (wa <= small and wb <= small and waste <= 0.75):
                    ce, cr = b1, union
                    continue
        out_starts.append(cs)
        out_ends.append(ce)
        out_rows.append(cr)
        cs, ce, cr = b0, b1, br
    out_starts.append(cs)
    out_ends.append(ce)
    out_rows.append(cr)
    new_ptr = np.asarray(out_starts + [out_ends[-1]], dtype=np.int64)
    return new_ptr, out_rows


def supernode_rows(
    Lp: np.ndarray, Li: np.ndarray, sn_ptr: np.ndarray
) -> list[np.ndarray]:
    """Sorted row union of each supernode from the strict pattern of L.

    Replaces the reference's per-factorization ``supernode_rows`` re-reach
    (/root/reference/include/chol.hpp:1040-1059) with a one-time union over
    the already-computed pattern (SURVEY.md flags the recompute as waste).
    """
    out = []
    for s in range(len(sn_ptr) - 1):
        c0, c1 = int(sn_ptr[s]), int(sn_ptr[s + 1])
        segs = [Li[Lp[j] : Lp[j + 1]] for j in range(c0, c1)]
        rows = np.unique(np.concatenate(segs)) if segs else np.empty(0, np.int64)
        out.append(rows.astype(np.int64))
    return out


def assembly_tree(
    sn_ptr: np.ndarray, sn_rows: list[np.ndarray], sn_id: np.ndarray
) -> np.ndarray:
    """Supernodal elimination (assembly) tree.

    parent(s) = smallest supernode owning any row of s below s's columns —
    the reference's ``atree`` (/root/reference/src/chol.cpp:102-136).
    """
    ns = len(sn_ptr) - 1
    sparent = np.full(ns, -1, dtype=INDEX_DTYPE)
    for s in range(ns):
        end = sn_ptr[s + 1]
        below = sn_rows[s][sn_rows[s] >= end]
        if below.size:
            sparent[s] = int(sn_id[below[0]])  # rows sorted -> first is smallest
    return sparent


def compute_levels(parent: np.ndarray) -> list[np.ndarray]:
    """Wavefront levels of a forest, leaves first.

    Matches ``compute_levels`` (/root/reference/src/chol.cpp:7-40): nodes
    bucketed by depth, then reversed so that level 0 holds the deepest
    leaves and every node's children appear in strictly earlier levels.
    """
    n = len(parent)
    depth = np.full(n, -1, dtype=np.int64)
    for j in range(n):
        if depth[j] != -1:
            continue
        v = j
        path = []
        while v != -1 and depth[v] == -1:
            path.append(v)
            v = int(parent[v])
        base = 0 if v == -1 else int(depth[v]) + 1
        for node in reversed(path):
            depth[node] = base
            base += 1
    if n == 0:
        return []
    maxd = int(depth.max())
    levels = [np.flatnonzero(depth == d).astype(np.int64) for d in range(maxd + 1)]
    levels.reverse()
    return levels


# ---------------------------------------------------------------------------
# SymbolicFactor — the full static analysis result


@dataclasses.dataclass
class SymbolicFactor:
    """Complete symbolic analysis of an SPD matrix (the reference's ``SChol``
    role, /root/reference/include/chol.hpp:99-132, extended with the
    supernodal machinery of /root/reference/src/chol.cpp).

    All row structures are *supernodal*: column j of supernode s has row
    pattern sn_rows[s] clipped at j (possibly a superset of the strict
    pattern after amalgamation; the extras carry explicit zeros).
    """

    n: int
    parent: np.ndarray          # etree over columns, int32[n]
    post: np.ndarray            # postorder, int32[n]
    counts: np.ndarray          # strict nnz per column of L, int64[n]
    sn_ptr: np.ndarray          # supernode -> first column, int64[ns+1]
    sn_id: np.ndarray           # column -> supernode, int32[n]
    sn_rows: list[np.ndarray]   # per supernode sorted row union (int64)
    sparent: np.ndarray         # assembly tree, int32[ns]
    levels: list[np.ndarray]    # wavefront schedule over supernodes
    # upper pattern of the analyzed matrix (for lazy strict-pattern fill)
    A_indptr: np.ndarray | None = None
    A_indices: np.ndarray | None = None
    _strict: tuple | None = dataclasses.field(default=None, repr=False)

    @property
    def ns(self) -> int:
        return len(self.sn_ptr) - 1

    @property
    def strict_nnz(self) -> int:
        return int(self.counts.sum())

    def _strict_pattern(self) -> tuple[np.ndarray, np.ndarray]:
        """Strict (non-supernodal) pattern of L, computed lazily: the
        numeric path never needs it, only oracle/inspection consumers do."""
        if self._strict is None:
            if self.A_indptr is None:
                raise SymbolicError("strict pattern unavailable: analysis "
                                    "did not retain the input pattern")
            A = CSCMatrix(self.n, self.A_indptr, self.A_indices,
                          np.zeros(len(self.A_indices)), sym="upper")
            try:
                from . import _native

                _, _, _, Lp, Li = _native.symbolic_pipeline(A)
            except Exception:
                Lp, Li = symbolic_pattern(A, self.parent, self.counts.copy())
            self._strict = (Lp, Li)
        return self._strict

    def has_entry(self, i: int, j: int) -> bool:
        """Structural probe of L's strict pattern (symmetry-aware) — the
        reference's ``SChol::operator[](i, j)``
        (/root/reference/include/chol.hpp:113-124)."""
        if i < j:
            i, j = j, i
        Lp, Li = self._strict_pattern()
        lo, hi = int(Lp[j]), int(Lp[j + 1])
        k = int(np.searchsorted(Li[lo:hi], i))
        return k < hi - lo and int(Li[lo + k]) == i

    @property
    def strict_Lp(self) -> np.ndarray:
        return self._strict_pattern()[0]

    @property
    def strict_Li(self) -> np.ndarray:
        return self._strict_pattern()[1]

    def sn_width(self, s: int) -> int:
        return int(self.sn_ptr[s + 1] - self.sn_ptr[s])

    def sn_height(self, s: int) -> int:
        return int(len(self.sn_rows[s]))

    def flops(self) -> int:
        """Exact factorization flop count from the supernodal structure:
        sum over supernodes of w^3/3 + w^2*mb + w*mb^2 (BASELINE.md §3)."""
        total = 0
        for s in range(self.ns):
            w = self.sn_width(s)
            mb = self.sn_height(s) - w
            total += w**3 // 3 + w * w * mb + w * mb * mb
        return total

    def supernodal_nnz(self) -> int:
        """Stored entries in the supernodal (block) representation of L."""
        total = 0
        for s in range(self.ns):
            w = self.sn_width(s)
            m = self.sn_height(s)
            total += w * (w + 1) // 2 + w * (m - w)
        return total


def analyze(
    A: CSCMatrix,
    *,
    amalgamation: bool = True,
    relax_ratio: float = 0.35,
    small: int = 16,
    max_width: int = 128,
) -> SymbolicFactor:
    """Run the full symbolic phase. The reference's ``schol`` +
    ``compute_supernodes`` + ``atree`` + ``compute_levels`` pipeline
    (/root/reference/include/chol.hpp:874, /root/reference/src/chol.cpp),
    executed once on host.

    Fast path: the native engine's one-shot supernodal analysis, which
    never materializes the strict pattern of L (its O(nnz L) scatter fill
    dominates host time for large matrices); the strict pattern stays
    available lazily via SymbolicFactor.strict_Lp/strict_Li."""
    try:
        from . import _native

        parent, post, counts, sn_ptr, rows = _native.supernodal_analyze(
            A,
            relax_ratio=relax_ratio if amalgamation else 0.0,
            small=small if amalgamation else 0,
            max_width=max_width if amalgamation else 1 << 30,
            small_ratio=0.75 if amalgamation else 0.0,
        )
        sn_ptr = np.asarray(sn_ptr, dtype=np.int64)
    except Exception:
        parent = etree(A)
        post = post_order(parent)
        counts = col_count(A, parent, post)
        Lp, Li = symbolic_pattern(A, parent, counts)
        sn_ptr, _ = fundamental_supernodes(Lp, parent)
        rows = supernode_rows(Lp, Li, sn_ptr)
        if amalgamation:
            sn_ptr, rows = amalgamate(
                sn_ptr, rows, parent,
                relax_ratio=relax_ratio, small=small, max_width=max_width,
            )
    # NOTE: wide fundamental supernodes (dense separators/tails) are NOT
    # split — the numeric layer stores them segmented and factors them as
    # single tall panels (plan.py "segmented" layout), which eliminates the
    # chain of inter-chunk Schur updates a split would create.
    ns = len(sn_ptr) - 1
    sn_id = np.zeros(A.n, dtype=INDEX_DTYPE)
    for s in range(ns):
        sn_id[sn_ptr[s] : sn_ptr[s + 1]] = s
    sparent = assembly_tree(sn_ptr, rows, sn_id)
    levels = compute_levels(sparent)
    return SymbolicFactor(
        n=A.n,
        parent=np.asarray(parent, dtype=INDEX_DTYPE),
        post=np.asarray(post, dtype=INDEX_DTYPE),
        counts=np.asarray(counts, dtype=np.int64),
        sn_ptr=sn_ptr,
        sn_id=sn_id,
        sn_rows=rows,
        sparent=sparent,
        levels=levels,
        A_indptr=np.asarray(A.indptr, dtype=np.int64),
        A_indices=np.asarray(A.indices, dtype=INDEX_DTYPE),
    )
