#!/usr/bin/env python
"""On-chip extend-add kernel validation: factor with extend="runs_xla"
(the kernel-semantics XLA reference) and extend="runs_pallas" (the DMA
kernel) and compare the extracted factors.  Pallas interpret mode cannot
validate these kernels (it drops DMA writes to the aliased input), so
this must run on the real TPU:

    PYTHONPATH=/root/repo python scripts_kernel_check.py [matrix ...]
"""

import sys

import numpy as np


def main():
    from sparsecholesky_tpu.utils.cache import setup_runtime

    setup_runtime()
    import jax.numpy as jnp
    from sparsecholesky_tpu.cli import _load
    from sparsecholesky_tpu.ordering import compute_ordering
    from sparsecholesky_tpu.plan import compile_plan
    from sparsecholesky_tpu import numeric as N

    matrices = sys.argv[1:] or ["poisson3d:16", "poisson3d:24", "fem3d:10:3"]
    fails = 0
    for m in matrices:
        A, grid = _load(m)
        perm = compute_ordering(A, "nd-grid" if grid else "auto",
                                grid_shape=grid)
        P = compile_plan(A, perm=perm, dtype=np.float32)
        arrays = N.device_arrays(P)
        # report the packing-mode mix the planner chose (gblock/region/
        # interleave), so this check visibly covers each deployed kernel
        mix = {"gblock": 0, "region": 0, "interleave": 0}
        for rmeta in arrays["meta"].value:
            for entry in rmeta[4]:
                if not entry[0]:
                    continue
                nb = entry[3] if len(entry) > 3 else 0
                nrg = entry[1]
                mix["gblock" if nb else "region" if nrg
                    else "interleave"] += 1
        print(f"{m}: chunk modes {mix}", flush=True)
        Ax = jnp.asarray(A.data)
        outs = {}
        for ext in ("runs_xla", "runs_pallas"):
            Lx, _d = N.factorize(P, Ax, arrays=arrays, check=False,
                                 extend=ext)
            outs[ext] = np.tril(P.extract_csc(np.asarray(Lx)).to_dense())
        diff = np.abs(outs["runs_xla"] - outs["runs_pallas"]).max()
        scale = np.abs(outs["runs_xla"]).max()
        ok = diff <= 1e-5 * scale
        fails += not ok
        print(f"{m}: |xla - pallas|_max = {diff:.3e} (scale {scale:.3e}) "
              f"{'OK' if ok else 'MISMATCH'}", flush=True)
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
