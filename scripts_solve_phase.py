#!/usr/bin/env python
"""Solve perf decomposition (VERDICT r3 item 4): raw-solve latency vs
right-hand-side count.  If wall time is ~flat in k, the sweeps are
row-ISSUE bound (element-granular y gathers/scatters), and multi-RHS
throughput is nearly free.

    PYTHONPATH=/root/repo python scripts_solve_phase.py [matrix]
"""
import os
import sys
import time

import numpy as np


def main():
    from sparsecholesky_tpu.utils.cache import setup_runtime

    setup_runtime()
    import jax.numpy as jnp
    from sparsecholesky_tpu.cli import _load
    from sparsecholesky_tpu.api import chol

    matrix = sys.argv[1] if len(sys.argv) > 1 else \
        os.environ.get("SPARSECHOL_BENCH_MATRIX", "poisson3d:48")
    A, grid = _load(matrix)
    F = chol(A, ordering="nd-grid" if grid else "auto", grid_shape=grid,
             dtype=np.float32, scale="auto")
    Asp = A.to_scipy()
    nrmA = np.abs(Asp).sum(axis=1).max()

    for k in (1, 8, 32, 128):
        b = np.linspace(1.0, 2.0, A.n * k).reshape(A.n, k)
        bb = b[:, 0] if k == 1 else b
        x = F.solve(bb, refine=0)   # warm/compile
        t0 = time.time()
        reps = 5
        for _ in range(reps):
            x = F.solve(bb, refine=0)
        np.asarray(x)
        t = (time.time() - t0) / reps
        xa = np.asarray(x, np.float64).reshape(A.n, k)
        be = np.linalg.norm(Asp @ xa - b) / (
            nrmA * np.linalg.norm(xa) + np.linalg.norm(b))
        print(f"{matrix} solve k={k:4d}: {t*1e3:8.2f} ms total, "
              f"{t/k*1e3:7.3f} ms/RHS, bkw-err {be:.1e}", flush=True)


if __name__ == "__main__":
    main()
