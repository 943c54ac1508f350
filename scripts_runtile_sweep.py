#!/usr/bin/env python
"""On-chip sweep of the extend-add RMW window tile (plan.run_tile).

For each T, rebuilds the plan (SPARSECHOL_RUN_TILE override), times the
steady-state factorize with extend=runs_pallas, and prints the split vs
the extend="einsum" floor.  Run on the TPU:

    PYTHONPATH=/root/repo python scripts_runtile_sweep.py poisson3d:48 24 64 128
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

    matrix = sys.argv[1] if len(sys.argv) > 1 else "poisson3d:48"
    tiles = [int(t) for t in sys.argv[2:]] or [24, 64, 128]
    A, grid = _load(matrix)
    Ax = jnp.asarray(A.data)

    def sync(x):
        float(jnp.sum(x[:8]))

    for T in tiles:
        os.environ["SPARSECHOL_RUN_TILE"] = str(T)
        F = chol(A, ordering="nd-grid" if grid else "auto", grid_shape=grid,
                 dtype=np.float32, scale=True)

        def run(extend, K=8):
            Lx, _ = _numeric.factorize(F.plan, Ax, arrays=F.arrays,
                                       scale=True, check=False, extend=extend)
            sync(Lx)
            t0 = time.time()
            for _ in range(K):
                Lx, _ = _numeric.factorize(F.plan, Ax, arrays=F.arrays,
                                           scale=True, check=False,
                                           extend=extend)
            sync(Lx)
            return (time.time() - t0) / K

        t_e = run("einsum")
        t_p = run("runs_pallas")
        print(f"T={T:4d}: full {t_p*1e3:7.1f} ms  (einsum floor "
              f"{t_e*1e3:6.1f} ms, RMW {(t_p-t_e)*1e3:6.1f} ms)", flush=True)
        del F


if __name__ == "__main__":
    main()
