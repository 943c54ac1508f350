"""Per-tier panel-factorize backend benchmark on the real chip.

Compares the three _panel_factor backends (xla = cholesky+triangular_solve,
fused = one fori_loop rank-1 sweep, pallas = ops/panel_chol.py Mosaic
kernel) on the (B, w_pad, mb_pad) tiers that actually occur in the
poisson3d:48 plan, plus the diag-inverse-free shapes.  Timing via host
readback (axon: block_until_ready does not wait).
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp

from sparsecholesky_tpu.cli import _load
from sparsecholesky_tpu.ordering import compute_ordering
from sparsecholesky_tpu.plan import compile_plan
from sparsecholesky_tpu import numeric


def sync(x):
    return float(jnp.sum(jnp.ravel(x)[:8]))


def main(spec="poisson3d:48"):
    A, gs = _load(spec)
    perm = compute_ordering(A, "nd-grid" if gs else "amd", grid_shape=gs)
    plan = compile_plan(A, perm=perm, dtype=np.float32)

    # collect distinct (B, w_pad, mb_pad) with occurrence counts
    tiers = {}
    for lev in plan.levels:
        for b in lev:
            key = (b.batch, b.w_pad, b.mb_pad)
            tiers[key] = tiers.get(key, 0) + 1
    # top tiers by (occurrences * panel work)
    scored = sorted(
        tiers.items(),
        key=lambda kv: -kv[1] * kv[0][0] * kv[0][1] ** 2 * (kv[0][1] + kv[0][2]),
    )[:10]

    import functools

    @functools.partial(jax.jit, static_argnames=("w_pad", "backend"))
    def run(P, w_pad, backend):
        with jax.default_matmul_precision("highest"):
            return numeric._panel_factor(P, w_pad, backend)

    rng = np.random.default_rng(0)
    print(f"{'B':>5} {'w':>5} {'mb':>5} {'#':>4} | xla_ms fused_ms pallas_ms")
    totals = {"xla": 0.0, "fused": 0.0, "pallas": 0.0}
    for (B, w_pad, mb_pad), cnt in scored:
        m_pad = w_pad + mb_pad
        X = rng.standard_normal((B, m_pad, w_pad)).astype(np.float32)
        # SPD-ify diag block
        for k in range(B):
            D = X[k, :w_pad] @ X[k, :w_pad].T
            X[k, :w_pad] = np.tril(D / np.abs(D).max() + np.eye(w_pad) * 2)
        P = jnp.asarray(X)
        row = f"{B:>5} {w_pad:>5} {mb_pad:>5} {cnt:>4} |"
        for bk in ("xla", "fused", "pallas"):
            try:
                L, mp = run(P, w_pad, bk)
                sync(L)
                reps = 10
                t0 = time.time()
                for _ in range(reps):
                    L, mp = run(P, w_pad, bk)
                sync(L)
                dt = (time.time() - t0) / reps
                totals[bk] += dt * cnt
                row += f" {dt*1e3:8.3f}"
            except Exception as e:
                row += f"  FAIL({type(e).__name__})"
        print(row, flush=True)
    print("weighted totals over sampled tiers (s):",
          {k: round(v, 4) for k, v in totals.items()})


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "poisson3d:48")
