"""Inspection / debug printers.

TPU-native equivalent of the reference's pretty-printer family
(/root/reference/include/pprinter.hpp:9-70, /root/reference/src/pprinter.cpp:7-63):
dense-formatted matrix dumps and star/dot sparsity "spy" grids.
"""

from __future__ import annotations

import numpy as np


def spy(indptr, indices, n: int, *, star: str = "*", dot: str = ".") -> str:
    """Star/dot pattern grid of a CSC pattern, like the reference's
    ``operator<<`` for SChol (/root/reference/src/pprinter.cpp:7-35)."""
    grid = [[dot] * n for _ in range(n)]
    for j in range(n):
        for p in range(indptr[j], indptr[j + 1]):
            grid[int(indices[p])][j] = star
    return "\n".join(" ".join(row) for row in grid)


def dense_str(mat: np.ndarray, *, fmt: str = "{:8.4f}") -> str:
    """Dense matrix dump like the reference's csc_matrix printer
    (/root/reference/include/pprinter.hpp:9-32)."""
    return "\n".join(" ".join(fmt.format(v) for v in row) for row in np.asarray(mat))


def panel_str(panel: np.ndarray, rows, cols, *, fmt: str = "{:8.4f}") -> str:
    """Labeled supernode panel dump (reference panel printer,
    /root/reference/include/pprinter.hpp:34-55)."""
    header = "        " + " ".join(f"{c:8d}" for c in cols)
    lines = [header]
    for r, row in zip(rows, np.asarray(panel)):
        lines.append(f"{r:6d}  " + " ".join(fmt.format(v) for v in row))
    return "\n".join(lines)


def supernode_summary(S) -> str:
    """One-line-per-supernode summary of a SymbolicFactor."""
    lines = [f"n={S.n} ns={S.ns} nnz(L)={S.strict_nnz} flops={S.flops()}"]
    for s in range(S.ns):
        w = S.sn_width(s)
        m = S.sn_height(s)
        lines.append(
            f"  sn {s:5d}: cols [{int(S.sn_ptr[s])},{int(S.sn_ptr[s+1])}) "
            f"w={w:4d} m={m:5d} parent={int(S.sparent[s])}"
        )
    return "\n".join(lines)
