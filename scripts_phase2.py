#!/usr/bin/env python
"""Fine-grained phase decomposition of the steady-state factorize:

  (copy, none)        pure datapath: slab/grid gather+scatter + glue
  (xla,  none)        + batched chol + trsm
  (xla,  vonly)       + extend-add V placement gather
  (xla,  einsum)      + update einsum (C compute)
  (xla,  runs_pallas) + RMW kernel      == the full factorize

    PYTHONPATH=/root/repo python scripts_phase2.py [matrix]
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
             dtype=np.float32, scale="auto")
    Ax = jnp.asarray(A.data)

    def sync(x):
        float(jnp.sum(x[:8]))

    def run(backend, extend, K=8):
        Lx, _ = _numeric.factorize(F.plan, Ax, arrays=F.arrays,
                                   scale=F.scaled, check=False,
                                   extend=extend, backend=backend)
        sync(Lx)
        t0 = time.time()
        for _ in range(K):
            Lx, _ = _numeric.factorize(F.plan, Ax, arrays=F.arrays,
                                       scale=F.scaled, check=False,
                                       extend=extend, backend=backend)
        sync(Lx)
        return (time.time() - t0) / K

    stages = [("copy", "none"), ("xla", "none"), ("xla", "vonly"),
              ("xla", "einsum"), ("xla", "runs_pallas")]
    results = {}
    for be, ext in stages:
        try:
            results[(be, ext)] = run(be, ext)
            print(f"{matrix} backend={be} extend={ext}: "
                  f"{results[(be, ext)]*1e3:.1f} ms", flush=True)
        except Exception as e:
            print(f"{matrix} backend={be} extend={ext}: FAILED "
                  f"{type(e).__name__}: {str(e)[:200]}", flush=True)
    labels = ["datapath", "chol+trsm", "V placement", "einsum C", "RMW"]
    prev = 0.0
    for (key, lab) in zip(stages, labels):
        if key in results:
            print(f"-- {lab:12s} {(results[key]-prev)*1e3:7.1f} ms")
            prev = results[key]


if __name__ == "__main__":
    main()
