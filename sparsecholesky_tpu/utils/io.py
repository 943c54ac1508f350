"""Matrix ingestion: MatrixMarket files, triplets, adjacency patterns.

TPU-native equivalents of the reference's ingestion layer:
  * load_matrix_market   — /root/reference/include/mtx_reader.hpp:17-62
  * triplet_to_csc       — /root/reference/include/chol.hpp:309-369 (see csc.py)
  * pattern builder      — /root/reference/include/chol.hpp:416-435
"""

from __future__ import annotations

import io as _io
import gzip
import os

import numpy as np

from ..csc import CSCMatrix, triplet_to_csc
from ..errors import IngestionError


def load_matrix_market(path_or_file, dtype=np.float64) -> CSCMatrix:
    """Read a MatrixMarket coordinate file into canonical upper CSC.

    Matches the reference reader's behavior (skip ``%`` comment lines, read
    ``rows cols nnz``, 1-based indices, mirror every entry into the upper
    triangle, require square; /root/reference/include/mtx_reader.hpp:17-62)
    but additionally honors the header: ``pattern`` files get unit values,
    and an explicit ``general`` symmetry still works because duplicates are
    merged by summing only for truly duplicated coordinates.
    """
    if hasattr(path_or_file, "read"):
        text = path_or_file.read()
        if isinstance(text, bytes):
            text = text.decode()
    else:
        opener = gzip.open if str(path_or_file).endswith(".gz") else open
        with opener(path_or_file, "rt") as f:
            text = f.read()

    lines = iter(text.splitlines())
    header = next(lines, "")
    is_pattern = "pattern" in header.lower()
    is_general = "general" in header.lower()

    size_line = None
    for line in lines:
        if line.startswith("%") or not line.strip():
            continue
        size_line = line
        break
    if size_line is None:
        raise IngestionError("MatrixMarket file has no size line")
    parts = size_line.split()
    nrow, ncol, nnz = int(parts[0]), int(parts[1]), int(parts[2])
    if nrow != ncol:
        raise IngestionError("Matrix must be square for Cholesky")

    body = "\n".join(lines)
    arr = np.loadtxt(_io.StringIO(body), ndmin=2)
    if arr.shape[0] != nnz:
        raise IngestionError(f"expected {nnz} entries, found {arr.shape[0]}")
    ti = arr[:, 0].astype(np.int64) - 1
    tj = arr[:, 1].astype(np.int64) - 1
    tx = arr[:, 2].astype(dtype) if arr.shape[1] >= 3 else np.ones(nnz, dtype=dtype)

    if is_general:
        # A structurally-symmetric "general" file stores both triangles;
        # mirroring-then-summing (what the reference would do) doubles every
        # off-diagonal, so keep only the upper-triangle copies.
        keep = ti <= tj
        ti, tj, tx = ti[keep], tj[keep], tx[keep]

    return triplet_to_csc(ti, tj, tx, nrow, dtype=dtype)


def csc_from_pattern(pattern: list[list[int]], dtype=np.float64) -> CSCMatrix:
    """Build an SPD *pattern* matrix (all stored values 1) from per-row
    adjacency lists — the reference's ``build_csc_matrix_from_pattern``
    (/root/reference/include/chol.hpp:416-435), used by the thesis fixtures."""
    ti, tj = [], []
    for i, row in enumerate(pattern):
        for j in row:
            ti.append(i)
            tj.append(j)
    tx = np.ones(len(ti), dtype=dtype)
    return triplet_to_csc(ti, tj, tx, len(pattern), dtype=dtype)


def save_npz(path: str, obj: dict) -> None:
    np.savez_compressed(path, **obj)


def bundled_matrix(name: str) -> str:
    """Path to a matrix vendored with this package (bcsstk01, 1138_bus).

    The two public Harwell-Boeing files ship as package data under
    ``sparsecholesky_tpu/data/`` (the reference bundles the same files,
    /root/reference/data/*/*.mtx, loaded by src/main.cpp:344).
    ``SPARSECHOL_DATA`` overrides the search root.
    """
    pkg_data = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "data")
    base = os.environ.get("SPARSECHOL_DATA") or pkg_data
    path = os.path.join(base, name, f"{name}.mtx")
    if not os.path.exists(path):
        raise IngestionError(f"bundled matrix {name!r} not found at {path}")
    return path
