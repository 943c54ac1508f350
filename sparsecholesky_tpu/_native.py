"""ctypes binding to the native symbolic engine (native/symbolic.cpp).

Loaded lazily; if the shared library is missing it is built with the
repo's Makefile (single translation unit, sub-second).  Every entry point
has a NumPy fallback in symbolic.py — the native path is a performance
component for large matrices, not a correctness dependency.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_NATIVE_DIR = os.path.join(_HERE, "native")
_SO = os.path.join(_NATIVE_DIR, "libsctsymbolic.so")
_SRC = os.path.join(_NATIVE_DIR, "symbolic.cpp")
_TAG = _SO + ".srchash"

_lib = None


def _src_hash() -> str:
    import hashlib

    with open(_SRC, "rb") as f:
        return hashlib.sha256(f.read()).hexdigest()


def _stale() -> bool:
    """A fresh checkout equalizes every mtime, so make's timestamp rule
    cannot detect a shared library built from an older source revision;
    compare a recorded source-content hash instead."""
    if not os.path.exists(_SO):
        return True
    try:
        with open(_TAG) as f:
            return f.read().strip() != _src_hash()
    except OSError:
        return True


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if _stale():
        subprocess.run(
            ["make", "-C", _NATIVE_DIR, "-sB"],
            check=True,
            capture_output=True,
            timeout=120,
        )
        with open(_TAG, "w") as f:
            f.write(_src_hash() + "\n")
    lib = ctypes.CDLL(_SO)
    i64p = ctypes.POINTER(ctypes.c_int64)
    i32p = ctypes.POINTER(ctypes.c_int32)
    lib.sct_symbolic_analyze.restype = ctypes.c_int64
    lib.sct_symbolic_analyze.argtypes = [ctypes.c_int64, i64p, i32p, i32p, i32p, i64p]
    lib.sct_symbolic_fill.restype = ctypes.c_int32
    lib.sct_symbolic_fill.argtypes = [ctypes.c_int64, i64p, i32p, i32p, i64p, i64p, i32p]
    lib.sct_supernode_rows.restype = ctypes.c_int64
    lib.sct_supernode_rows.argtypes = [
        ctypes.c_int64, i64p, i32p, ctypes.c_int64, i64p, i64p, i32p, ctypes.c_int64,
    ]
    lib.sct_supernodal_analyze.restype = ctypes.POINTER(_SctResult)
    lib.sct_supernodal_analyze.argtypes = [
        ctypes.c_int64, i64p, i32p,
        ctypes.c_double, ctypes.c_int64, ctypes.c_int64, ctypes.c_double,
    ]
    lib.sct_free_result.restype = None
    lib.sct_free_result.argtypes = [ctypes.POINTER(_SctResult)]
    lib.sct_amd_order.restype = ctypes.c_int32
    lib.sct_amd_order.argtypes = [ctypes.c_int64, i64p, i32p, i32p]
    _lib = lib
    return lib


class _SctResult(ctypes.Structure):
    _fields_ = [
        ("n", ctypes.c_int64),
        ("ns", ctypes.c_int64),
        ("total_rows", ctypes.c_int64),
        ("parent", ctypes.POINTER(ctypes.c_int32)),
        ("post", ctypes.POINTER(ctypes.c_int32)),
        ("counts", ctypes.POINTER(ctypes.c_int64)),
        ("sn_ptr", ctypes.POINTER(ctypes.c_int64)),
        ("row_off", ctypes.POINTER(ctypes.c_int64)),
        ("rows", ctypes.POINTER(ctypes.c_int32)),
    ]


def _p64(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))


def _p32(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


def symbolic_pipeline(A):
    """(parent, post, counts, Lp, Li) for a canonical upper-CSC matrix."""
    lib = _load()
    n = A.n
    Ap = np.ascontiguousarray(A.indptr, dtype=np.int64)
    Ai = np.ascontiguousarray(A.indices, dtype=np.int32)
    parent = np.empty(n, dtype=np.int32)
    post = np.empty(n, dtype=np.int32)
    counts = np.empty(n, dtype=np.int64)
    nnz = lib.sct_symbolic_analyze(n, _p64(Ap), _p32(Ai), _p32(parent), _p32(post), _p64(counts))
    if nnz < n:
        raise RuntimeError("native symbolic_analyze failed")
    Lp = np.empty(n + 1, dtype=np.int64)
    Li = np.empty(nnz, dtype=np.int32)
    rc = lib.sct_symbolic_fill(n, _p64(Ap), _p32(Ai), _p32(parent), _p64(counts), _p64(Lp), _p32(Li))
    if rc != 0:
        raise RuntimeError("native symbolic_fill failed (counts mismatch)")
    return parent, post, counts, Lp, Li


def supernode_rows(Lp, Li, sn_ptr, n):
    """Sorted row union per supernode from L's pattern (native)."""
    lib = _load()
    Lp = np.ascontiguousarray(Lp, dtype=np.int64)
    Li = np.ascontiguousarray(Li, dtype=np.int32)
    sn_ptr = np.ascontiguousarray(sn_ptr, dtype=np.int64)
    ns = len(sn_ptr) - 1
    cap = int(Lp[-1]) + n  # union sizes are bounded by nnz(L) per-col sums
    offsets = np.empty(ns + 1, dtype=np.int64)
    rows = np.empty(cap, dtype=np.int32)
    total = lib.sct_supernode_rows(n, _p64(Lp), _p32(Li), ns, _p64(sn_ptr), _p64(offsets), _p32(rows), cap)
    if total < 0:
        raise RuntimeError("native supernode_rows capacity exceeded")
    return [rows[offsets[s] : offsets[s + 1]].astype(np.int64) for s in range(ns)]


def supernodal_analyze(A, *, relax_ratio=0.35, small=16, max_width=128,
                       small_ratio=0.75):
    """One-shot native supernodal symbolic analysis (no strict-pattern fill).

    Returns (parent, post, counts, sn_ptr, sn_rows) where sn_rows is the
    list of per-supernode sorted row unions after relaxed amalgamation.
    """
    lib = _load()
    n = A.n
    Ap = np.ascontiguousarray(A.indptr, dtype=np.int64)
    Ai = np.ascontiguousarray(A.indices, dtype=np.int32)
    res = lib.sct_supernodal_analyze(
        n, _p64(Ap), _p32(Ai),
        float(relax_ratio), int(small), int(max_width), float(small_ratio),
    )
    try:
        r = res.contents
        parent = np.ctypeslib.as_array(r.parent, (n,)).copy()
        post = np.ctypeslib.as_array(r.post, (n,)).copy()
        counts = np.ctypeslib.as_array(r.counts, (n,)).copy()
        ns = int(r.ns)
        sn_ptr = np.ctypeslib.as_array(r.sn_ptr, (ns + 1,)).copy()
        row_off = np.ctypeslib.as_array(r.row_off, (ns + 1,)).copy()
        rows = np.ctypeslib.as_array(r.rows, (max(int(r.total_rows), 1),))
        sn_rows = [
            rows[row_off[s] : row_off[s + 1]].astype(np.int64)
            for s in range(ns)
        ]
    finally:
        lib.sct_free_result(res)
    return parent, post, counts, sn_ptr, sn_rows


def amd_order(A):
    """Native approximate-minimum-degree permutation (quotient graph)."""
    lib = _load()
    Ap = np.ascontiguousarray(A.indptr, dtype=np.int64)
    Ai = np.ascontiguousarray(A.indices, dtype=np.int32)
    perm = np.empty(A.n, dtype=np.int32)
    rc = lib.sct_amd_order(A.n, _p64(Ap), _p32(Ai), _p32(perm))
    if rc != 0:
        raise RuntimeError("native amd_order failed")
    return perm.astype(np.int64)
