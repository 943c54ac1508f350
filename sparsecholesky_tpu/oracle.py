"""CPU oracle: simplicial sparse Cholesky in NumPy.

Plays the role the reference's second backend plays
(``factorize_sn_eigen``, /root/reference/include/chol.hpp:1346-1404) and of
its simplicial ``chol`` (/root/reference/include/chol.hpp:750-863): a slow,
obviously-correct factorization the TPU path is validated against.  Serial
up-looking/left-looking hybrid over etree reach sets — same math as the
reference's ``chol`` minus the OpenMP wavefront and atomic cursors (the
static symbolic pattern makes them unnecessary).
"""

from __future__ import annotations

import numpy as np

from .csc import CSCMatrix, INDEX_DTYPE
from .errors import NotPositiveDefiniteError
from . import symbolic as sym


def chol_simplicial(A: CSCMatrix) -> CSCMatrix:
    """Left-looking simplicial Cholesky; returns L as sorted lower CSC.

    Mirrors the reference ``chol`` inner loop
    (/root/reference/include/chol.hpp:819-855): per column k, scatter A(:,k)
    via the reach, apply cmod updates from each reach column, divide, sqrt.
    """
    if A.sym != "upper":
        raise ValueError("chol_simplicial expects canonical upper CSC")
    n = A.n
    parent = sym.etree(A)
    post = sym.post_order(parent)
    counts = sym.col_count(A, parent, post)
    Lp, Li = sym.symbolic_pattern(A, parent, counts)
    Lx = np.zeros(int(Lp[-1]), dtype=A.data.dtype)

    # position of row i within column j of L, for the cmod scatter
    # (the reference uses append cursors; with a sorted static pattern we
    #  can searchsorted instead)
    x = np.zeros(n, dtype=A.data.dtype)
    Ap, Ai, Ax = A.indptr, A.indices, A.data
    w = np.full(n, -1, dtype=np.int64)
    s = np.empty(n, dtype=np.int64)
    filled = np.zeros(n, dtype=np.int64)  # entries appended per column so far

    for k in range(n):
        # ereach with numeric scatter of A(:, k) into workspace x
        top = n
        w[k] = k
        d = 0.0
        for p in range(Ap[k], Ap[k + 1]):
            i = int(Ai[p])
            if i > k:
                continue
            if i == k:
                d = Ax[p]
                continue
            x[i] = Ax[p]
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
            i = int(s[t])
            base = int(Lp[i])
            lki = x[i] / Lx[base]  # divide by L(i, i)
            x[i] = 0.0
            # cmod: x[Li[p]] -= Lx[p] * lki over the filled part of column i
            for p in range(base + 1, base + int(filled[i])):
                x[int(Li[p])] -= Lx[p] * lki
            d -= lki * lki
            # append L(k, i): row k lands at the next filled slot of column i
            q = base + int(filled[i])
            assert Li[q] == k
            Lx[q] = lki
            filled[i] += 1

        if d <= 0:
            raise NotPositiveDefiniteError(pivot=float(d))
        assert Li[Lp[k]] == k
        Lx[int(Lp[k])] = np.sqrt(d)
        filled[k] = 1

    return CSCMatrix(n, Lp.astype(INDEX_DTYPE), Li, Lx, sym="none")
