#!/usr/bin/env python
"""Config-3-class small-plan experiment (VERDICT r4 item 7): fem3d:16:3
steady-state wall under pad profiles (fine vs coarse) — small plans are
per-executed-op bound (171 single-bucket steps at B=1-2), so fewer/
bigger buckets should transfer directly to wall clock.

Usage: python scripts_smallplan.py [matrix]
"""
import os, sys, time, json
import numpy as np

sys.path.insert(0, "/root/repo")
from sparsecholesky_tpu.utils.cache import setup_runtime
setup_runtime()
import jax.numpy as jnp
from sparsecholesky_tpu.cli import _load
from sparsecholesky_tpu.ordering import compute_ordering
from sparsecholesky_tpu import numeric as N

matrix = sys.argv[1] if len(sys.argv) > 1 else "fem3d:16:3"
A, grid = _load(matrix)
perm = compute_ordering(A, "nd-grid" if grid else "auto", grid_shape=grid)
out = {}
import sparsecholesky_tpu.plan as _PL
_PL._PAD_PROFILES.setdefault("small", ((8, 16, 32, 64, 128), (16, 48, 128, 320, 768, 1536), 1024))
for prof in ("fine", "small", "coarse"):
    os.environ["SPARSECHOL_PAD"] = prof
    from sparsecholesky_tpu.plan import compile_plan
    P = compile_plan(A, perm=perm, dtype=np.float32)
    arrays = N.device_arrays(P)
    groups = N.step_groups(P)
    Ax = jnp.asarray(A.data)
    # the bench protocol (sparsecholesky_tpu/bench.py): K pipelined
    # dispatches, ONE final sync — the production many-in-flight pattern
    Lx, d = N.factorize(P, Ax, arrays=arrays, scale=False, check=False)
    float(jnp.sum(Lx[:8]))
    reps = 10
    t0 = time.time()
    for _ in range(reps):
        Lx, d = N.factorize(P, Ax, arrays=arrays, scale=False, check=False)
    float(jnp.sum(Lx[:8]))
    t = (time.time() - t0) / reps
    gf = P.true_flops() / t / 1e9
    print(f"{prof}: buckets={sum(len(l) for l in P.levels)} runs={len(groups)} "
          f"true_GF={P.true_flops()/1e9:.2f} "
          f"wall={t*1e3:.1f} ms -> {gf:.1f} GF/s", flush=True)
    out[prof] = {"wall_ms": round(t * 1e3, 2), "gflops": round(gf, 1),
                 "runs": len(groups)}
print(json.dumps({"matrix": matrix, **out}), flush=True)
