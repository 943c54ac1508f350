#!/usr/bin/env python
"""Measure the store-row-space solve (solve_store.py) on the real chip:
build cost, k-scaling, and comparison against the legacy sweeps
(VERDICT r4 item 1 'done' criteria: :48 solve <= 25 ms single-RHS and
<= 5 ms/RHS at k=128).

Usage: python scripts_solve_store_bench.py [matrix] [k1,k2,...]
"""
import sys, time, json
import numpy as np

sys.path.insert(0, "/root/repo")
from sparsecholesky_tpu.utils.cache import setup_runtime
setup_runtime()
import jax.numpy as jnp
from sparsecholesky_tpu.cli import _load
from sparsecholesky_tpu.ordering import compute_ordering
from sparsecholesky_tpu.plan import compile_plan
from sparsecholesky_tpu import numeric as N, solve as legacy, solve_store as SS

matrix = sys.argv[1] if len(sys.argv) > 1 else "poisson3d:48"
ks = [int(x) for x in (sys.argv[2].split(",") if len(sys.argv) > 2
                       else ["1", "8", "32", "128"])]

A, grid = _load(matrix)
perm = compute_ordering(A, "nd-grid" if grid else "auto", grid_shape=grid)
P = compile_plan(A, perm=perm, dtype=np.float32)
arrays = N.device_arrays(P)
t0 = time.time()
Lx, d = N.factorize(P, jnp.asarray(A.data), arrays=arrays, scale=True)
float(jnp.sum(jnp.abs(Lx)))
print(f"factorized in {time.time()-t0:.2f}s (incl. compile)", flush=True)

t0 = time.time()
ctx = SS.build_context(P, Lx, arrays)
float(jnp.sum(jnp.abs(ctx["wp"])))
t_build = time.time() - t0
print(f"ctx build (WP + grids, incl. compile): {t_build:.2f}s", flush=True)

def timeit(fn, reps=3):
    fn()  # warm
    t0 = time.time()
    for _ in range(reps): fn()
    return (time.time() - t0) / reps

rng = np.random.default_rng(0)
out = {"matrix": matrix, "ctx_build_s": t_build}
Asp = A.to_scipy()

# device-resident sweep cost (no host<->device RHS traffic): time the
# two sweeps + a 1-element readback on a Y already on device
from sparsecholesky_tpu.numeric import _chunk_boundaries, CHUNK_RUNS
meta = arrays["meta"].value
bounds = ([(0, len(meta))] if len(meta) <= CHUNK_RUNS
          else list(_chunk_boundaries(meta)))
Y0 = SS._yinit(ctx, jnp.asarray(np.ones((P.n, 1), np.float32)), d,
               jnp.dtype(np.float32))
def sweeps_only():
    Y = Y0
    for lo, hi in bounds:
        Y = SS._ysweep_chunk(arrays, ctx, ctx["wp"], Y, P.R_L,
                             jnp.dtype(np.float32), lo, hi, True)
    for lo, hi in reversed(bounds):
        Y = SS._ysweep_chunk(arrays, ctx, ctx["wp"], Y, P.R_L,
                             jnp.dtype(np.float32), lo, hi, False)
    return float(jnp.sum(Y[:1, :1]))
t_dev = timeit(sweeps_only)
print(f"device-resident 2-sweep time: {t_dev*1e3:.2f} ms", flush=True)
out["sweeps_device_ms"] = round(t_dev * 1e3, 2)
for k in ks:
    b = rng.standard_normal((P.n, k))
    x = SS.solve_rows(P, b, ctx=ctx, d=d, arrays=arrays)  # compile+warm
    bw = float(np.linalg.norm(Asp @ x - b) / np.linalg.norm(b))
    t = timeit(lambda: SS.solve_rows(P, b, ctx=ctx, d=d, arrays=arrays))
    print(f"store k={k:4d}: {t*1e3:8.2f} ms  ({t/k*1e3:7.3f} ms/RHS)  bwd-resid {bw:.2e}", flush=True)
    out[f"store_k{k}_ms"] = round(t * 1e3, 2)
# legacy comparison at k=1 and 32 (wall incl. transfers)
linv = N.diag_inverses(arrays, Lx, P.R_L, jnp.dtype(np.float32))
for k in (1, 32):
    b = rng.standard_normal((P.n, k)) if k > 1 else rng.standard_normal(P.n)
    legacy.solve(P, Lx, b, d=d, arrays=arrays, linv=linv)
    t = timeit(lambda: np.asarray(legacy.solve(P, Lx, b, d=d, arrays=arrays, linv=linv)), reps=2)
    print(f"legacy k={k:3d}: {t*1e3:8.2f} ms ({t/k*1e3:7.3f} ms/RHS)", flush=True)
    out[f"legacy_k{k}_ms"] = round(t * 1e3, 2)

# legacy DEVICE-RESIDENT (rhs pre-uploaded, 1-element readback): the r4
# k-table was measured through np round-trips, i.e. partly the tunnel
for k in (1, 32):
    bdev = jnp.asarray(rng.standard_normal((P.n, k)).astype(np.float32))
    def leg_dev():
        x = legacy.solve(P, Lx, bdev, d=d, arrays=arrays, linv=linv)
        return float(jnp.sum(x[:1]))
    leg_dev()
    t = timeit(leg_dev, reps=2)
    print(f"legacy-devres k={k:3d}: {t*1e3:8.2f} ms ({t/k*1e3:7.3f} ms/RHS)", flush=True)
    out[f"legacy_devres_k{k}_ms"] = round(t * 1e3, 2)
print(json.dumps(out), flush=True)
