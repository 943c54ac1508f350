"""TPU smoke: factorize + solve on the real chip, fp32 + equilibration."""
import time
import numpy as np
import jax
print("devices:", jax.devices(), flush=True)

import sparsecholesky_tpu as sc
from sparsecholesky_tpu.api import chol
from sparsecholesky_tpu.models import generators

def run(name, A, **kw):
    Asp = A.to_scipy()
    nrmA = np.abs(Asp).sum(axis=1).max()
    t0 = time.time()
    F = chol(A, dtype=np.float32, scale=True, **kw)
    t_first = time.time() - t0
    t0 = time.time()
    F = F.refactorize(A.data); np.asarray(F.Lx)
    t_re = time.time() - t0
    b = np.linspace(1, 2, A.n)
    t0 = time.time(); x = F.solve(b); t_solve1 = time.time() - t0
    t0 = time.time(); x = F.solve(b); t_solve = time.time() - t0
    be = np.linalg.norm(Asp @ np.asarray(x,np.float64) - b) / (nrmA*np.linalg.norm(x)+np.linalg.norm(b))
    gf = F.plan.true_flops() / t_re / 1e9
    print(f"{name}: n={A.n} nnz(L)={F.plan.nnz_L():,} tflops={F.plan.true_flops():,} "
          f"padded={F.plan.padded_flops():,}\n"
          f"  first={t_first:.1f}s refac={t_re*1e3:.1f}ms ({gf:.2f} GF/s) "
          f"solve first={t_solve1:.1f}s steady={t_solve*1e3:.1f}ms bkw-err={be:.1e} "
          f"levels={len(F.plan.levels)} buckets={sum(len(l) for l in F.plan.levels)}", flush=True)
    return F

run("1138_bus/amd", sc.load_matrix_market(sc.bundled_matrix("1138_bus")), ordering="amd")
A = generators.poisson2d(32)
run("poisson2d(32)/nd", A, ordering="nd-grid", grid_shape=(32,32))
print("TPU SMOKE OK", flush=True)
