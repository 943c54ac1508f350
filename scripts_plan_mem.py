"""Host-side memory audit of the poisson3d:100 plan (no TPU needed)."""
import os, sys, time
os.environ.setdefault("JAX_PLATFORMS", "cpu")
import numpy as np
from sparsecholesky_tpu.cli import _load
from sparsecholesky_tpu.api import chol  # noqa: F401  (not used; plan only)
from sparsecholesky_tpu import symbolic, plan as planmod
from sparsecholesky_tpu.numeric import UPDATE_TILE, DENSE_INSTORE

matrix = sys.argv[1] if len(sys.argv) > 1 else "poisson3d:100"
A, grid_shape = _load(matrix)
print(f"n={A.n} nnz={A.nnz}", flush=True)
t0 = time.time()
from sparsecholesky_tpu.ordering import compute_ordering
perm = compute_ordering(A, "nd-grid" if grid_shape else "amd", grid_shape=grid_shape)
print(f"ordering {time.time()-t0:.1f}s", flush=True)
t0 = time.time()
P = planmod.compile_plan(A, perm=perm, dtype=np.dtype("float32"))
print(f"plan {time.time()-t0:.1f}s", flush=True)

store = P.store_bytes()
flat = 0
max_tr = 0
worst = None
for lev in P.levels:
    for b in lev:
        B = b.batch
        for f in ("col_idx", "below_idx", "ug", "ujloc", "up", "urow0",
                  "ustride", "uj0", "uG", "row0", "w", "mb"):
            a = getattr(b, f)
            if a is not None:
                flat += a.size * 4
        # transient estimate for a step
        w_pad, mb_pad, g_pad = b.w_pad, b.mb_pad, b.g_pad
        m_pad = w_pad + mb_pad
        P_bytes = B * m_pad * w_pad * 4
        V = B * g_pad * 128 * w_pad * 4
        gt = max(b.utile_g) if b.utile_g else g_pad
        C = B * gt * min(UPDATE_TILE, mb_pad) * 128 * 4
        rows = B * gt * min(UPDATE_TILE, mb_pad) * 4
        tr = 3 * P_bytes + V + 2 * C + rows
        if tr > max_tr:
            max_tr = tr
            worst = (B, w_pad, mb_pad, g_pad, gt, P_bytes, V, C)
gb = 1 / 2**30
print(f"store          {store*gb:8.3f} GiB  (R_L={P.R_L})")
print(f"flat plan idx  {flat*gb:8.3f} GiB")
print(f"max step trans {max_tr*gb:8.3f} GiB  worst={worst}")
print(f"nnz_L={P.nnz_L():,} true_flops={P.true_flops():,} padded={P.padded_flops():,}")
# top-10 transient steps
steps = []
for lev in P.levels:
    for b in lev:
        B, w_pad, mb_pad, g_pad = b.batch, b.w_pad, b.mb_pad, b.g_pad
        m_pad = w_pad + mb_pad
        gt = max(b.utile_g) if b.utile_g else g_pad
        tr = 3*B*m_pad*w_pad*4 + B*g_pad*128*w_pad*4 + 2*B*gt*min(UPDATE_TILE,mb_pad)*128*4
        up_b = 0 if b.up is None else b.up.size*4
        steps.append((tr, B, w_pad, mb_pad, g_pad, gt, up_b))
steps.sort(reverse=True)
print("top transient steps (tr_bytes, B, w_pad, mb_pad, g_pad, gt, up_bytes):")
for s in steps[:10]:
    print("  ", tuple(f"{x/2**20:.1f}M" if i in (0, 6) else x for i, x in enumerate(s)))
up_total = sum(s[6] for s in steps)
print(f"up total {up_total*gb:.3f} GiB")
