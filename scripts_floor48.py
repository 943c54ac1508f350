#!/usr/bin/env python
"""Decompose the extend="none" floor: datapath (slab gather/scatter +
step overhead) vs batched panel math (cholesky+triangular_solve).

Times the steady-state factorize with extend="none" twice — stock, and
with numeric._panel_factor monkeypatched to an identity passthrough —
on the real chip:

    PYTHONPATH=/root/repo python scripts_floor48.py [matrix]
"""

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
    A, grid = _load(matrix)
    F = chol(A, ordering="nd-grid" if grid else "auto", grid_shape=grid,
             dtype=np.float32, scale=True)
    Ax = jnp.asarray(A.data)

    def sync(x):
        float(jnp.sum(x[:8]))

    def run(K=8):
        Lx, _ = _numeric.factorize(F.plan, Ax, arrays=F.arrays, scale=True,
                                   check=False, extend="none")
        sync(Lx)
        t0 = time.time()
        for _ in range(K):
            Lx, _ = _numeric.factorize(F.plan, Ax, arrays=F.arrays,
                                       scale=True, check=False,
                                       extend="none")
        sync(Lx)
        return (time.time() - t0) / K

    t_full = run()
    print(f"{matrix} extend=none, real panel math: {t_full*1e3:.1f} ms",
          flush=True)

    orig = _numeric._panel_factor

    def fake_panel(P, w_pad, backend):
        import jax.numpy as jnp
        return P, jnp.ones((P.shape[0],), P.dtype)

    _numeric._panel_factor = fake_panel
    _numeric._chunk_jit.clear_cache()   # force a re-trace with the stub
    _numeric._CHUNK_EXES.clear()
    try:
        t_nopanel = run()
    finally:
        _numeric._panel_factor = orig
        _numeric._chunk_jit.clear_cache()
        _numeric._CHUNK_EXES.clear()
    print(f"{matrix} extend=none, identity panels:  {t_nopanel*1e3:.1f} ms",
          flush=True)
    print(f"-- datapath+overhead {t_nopanel*1e3:.1f} ms; "
          f"panel math {(t_full-t_nopanel)*1e3:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
