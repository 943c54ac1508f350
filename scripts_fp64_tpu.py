#!/usr/bin/env python
"""fp64-on-TPU validation run (VERDICT r3 item 6 / SURVEY §7 "report
both"): factor on the real chip with dtype=float64 (XLA native f64 on
the VPU — slow, correctness-only) and compare the extracted factor
entrywise against the CPU fp64 golden factor at the reference's
1e-9-class tolerance (/root/reference/tests/test_chol.cpp:93).

    PYTHONPATH=/root/repo python scripts_fp64_tpu.py [matrix ...]
"""
import sys
import time

import numpy as np


def main():
    from sparsecholesky_tpu.utils.cache import setup_runtime

    setup_runtime()
    import jax

    jax.config.update("jax_enable_x64", True)
    from sparsecholesky_tpu.cli import _load
    from sparsecholesky_tpu.api import chol
    from sparsecholesky_tpu import oracle

    matrices = sys.argv[1:] or ["1138_bus", "fem3d:8:3"]
    fails = 0
    for m in matrices:
        A, grid = _load(m)
        t0 = time.time()
        F = chol(A, ordering="amd" if not grid else "nd-grid",
                 grid_shape=grid, dtype=np.float64, scale=False)
        t_f = time.time() - t0
        L = F.L().to_dense()     # factor of P A P^T, permuted coordinates
        # CPU fp64 golden factor of the same permuted matrix (the
        # reference's dpotrf-oracle pattern, permutation-aligned)
        perm = F.plan.perm
        Ad = A.to_dense()[np.ix_(perm, perm)]
        G = np.linalg.cholesky(Ad)
        diff = np.abs(np.tril(L) - np.tril(G)).max()
        ok = diff <= 1e-9
        fails += not ok
        print(f"{m}: n={A.n} tpu-fp64 factor {t_f:.1f}s "
              f"max|L - L_cpu64| = {diff:.3e} "
              f"{'OK (<=1e-9)' if ok else 'FAIL'}", flush=True)
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
