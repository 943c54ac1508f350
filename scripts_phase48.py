#!/usr/bin/env python
"""Phase decomposition of the steady-state factorize on the real chip.

Times the numeric refactorization with the extend-add progressively
enabled (none -> einsum -> full RMW per mechanism) to attribute the wall
time to datapath / panel math / extend einsum / RMW.  Run on the TPU:

    PYTHONPATH=/root/repo python scripts_phase48.py [matrix]
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
    from sparsecholesky_tpu import numeric as _numeric

    matrix = sys.argv[1] if len(sys.argv) > 1 else \
        os.environ.get("SPARSECHOL_BENCH_MATRIX", "poisson3d:48")
    A, grid = _load(matrix)
    F = chol(A, ordering="nd-grid" if grid else "auto", grid_shape=grid,
             dtype=np.float32, scale=True)
    Ax = jnp.asarray(A.data)

    def sync(x):
        float(jnp.sum(x[:8]))

    def run(extend, K=8):
        Lx = None
        Lx, _ = _numeric.factorize(F.plan, Ax, arrays=F.arrays, scale=True,
                                   check=False, extend=extend)
        sync(Lx)
        t0 = time.time()
        for _ in range(K):
            Lx, _ = _numeric.factorize(F.plan, Ax, arrays=F.arrays,
                                       scale=True, check=False,
                                       extend=extend)
        sync(Lx)
        return (time.time() - t0) / K

    results = {}
    for extend in ("none", "einsum", "scatter", "runs_pallas"):
        try:
            results[extend] = run(extend)
            print(f"{matrix} extend={extend}: {results[extend]*1e3:.1f} ms",
                  flush=True)
        except Exception as e:
            print(f"{matrix} extend={extend}: FAILED {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)
    if "none" in results:
        base = results["none"]
        print(f"-- datapath+panel floor {base*1e3:.1f} ms")
        if "einsum" in results:
            print(f"-- extend einsum+V     {(results['einsum']-base)*1e3:.1f} ms")
        for k in ("scatter", "runs_pallas"):
            if k in results and "einsum" in results:
                print(f"-- RMW via {k}: {(results[k]-results['einsum'])*1e3:.1f} ms")


if __name__ == "__main__":
    main()
