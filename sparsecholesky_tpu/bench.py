"""Benchmark harness.

Metric (BASELINE.json): factorization GFLOP/s/chip and nnz(L)/s, measured
on the steady-state numeric refactorization (symbolic plan reused — the
schol/chol split both codebases share).

The reference publishes no numbers (BASELINE.md), so ``vs_baseline`` is the
speedup of this framework's steady-state numeric factorization over
scipy.sparse.linalg.splu's numeric-only refactorization (its
``options=dict(Fact='SamePattern')`` equivalent is not exposed, so full
splu time serves as the CPU direct-solver baseline) on the same matrix and
host — the closest available stand-in for the reference's CPU supernodal
path, which does not compile here (needs C++23 std::expected; g++ 12).
"""

from __future__ import annotations

import time

import numpy as np


def _cpu_baseline_seconds(A, repeats: int = 3) -> float:
    """CPU direct-factorization baseline: scipy splu numeric time.

    Large problems run the baseline once (splu on this host is minutes at
    n ~ 10^5+); above 500k rows it is skipped entirely (returns nan)."""
    import os

    import scipy.sparse as sp
    import scipy.sparse.linalg as spla

    if A.n > 500_000 or os.environ.get("SPARSECHOL_BENCH_SKIP_CPU"):
        return float("nan")
    if A.n > 60_000:
        repeats = 1
    M = A.to_scipy().tocsc()
    best = np.inf
    for _ in range(repeats):
        t0 = time.time()
        spla.splu(M, permc_spec="MMD_AT_PLUS_A")
        best = min(best, time.time() - t0)
    return best


def run_bench(
    matrix: str = "poisson3d:48",
    ordering: str = "auto-grid",
    dtype: str = "float32",
    backend: str = "xla",
    repeats: int = 5,
    scale: bool = True,
) -> dict:
    from .cli import _load
    from .api import chol

    A, grid_shape = _load(matrix)
    if ordering == "auto-grid":
        ordering = "nd-grid" if grid_shape is not None else "auto"

    t_sym0 = time.time()
    F = chol(
        A,
        ordering=ordering,
        grid_shape=grid_shape,
        dtype=np.dtype(dtype),
        scale=scale,
        backend=backend,
    )
    t_build = time.time() - t_sym0

    # steady-state numeric refactorization.  Dispatches are async; the
    # host<->device link on this setup has a ~30ms round-trip floor, so the
    # honest per-factorization time is K pipelined dispatches / K with one
    # final sync (the production pattern: many refactorizations in flight).
    from . import numeric as _numeric
    import jax.numpy as jnp

    Ax = jnp.asarray(A.data)

    def sync(x):
        # block_until_ready does not actually wait on the axon backend
        # (CLAUDE.md); a tiny host readback is the reliable barrier.
        float(jnp.sum(x[:8]))

    # Big stores (GiB-class at ~1M rows) cannot hold several pipelined
    # factorizations in HBM at once: drop the initial factor, run strictly
    # one at a time, and reinstate the (identical) factor afterwards.
    big = F.plan.store_bytes() > 1_500_000_000
    if big:
        F.Lx = None
        F._linv = None
    Lx = None
    warm, _ = _numeric.factorize(F.plan, Ax, arrays=F.arrays, scale=scale,
                                 check=False)  # warm
    sync(warm)
    if big:
        del warm
    K = 3 if big else max(repeats, 8)
    t0 = time.time()
    for _ in range(K):
        if big and Lx is not None:
            sync(Lx)
            del Lx  # free the previous store before dispatching the next
        Lx, _d = _numeric.factorize(
            F.plan, Ax, arrays=F.arrays, scale=scale, check=False
        )
    sync(Lx)
    best = (time.time() - t0) / K
    if big:
        F.Lx = Lx
        F.d = _d
    # single-dispatch latency (includes link round trip), for context
    if big:
        single = best  # the loop above was already fully synchronous
    else:
        t0 = time.time()
        Lx, _d = _numeric.factorize(
            F.plan, Ax, arrays=F.arrays, scale=scale, check=False
        )
        sync(Lx)
        single = time.time() - t0

    flops = F.plan.true_flops()
    nnzL = F.plan.nnz_L()
    gflops = flops / best / 1e9

    # correctness: solve backward error
    b = np.ones(A.n)
    x = F.solve(b, refine="auto")
    Asp = A.to_scipy()
    nrmA = np.abs(Asp).sum(axis=1).max()
    be = float(
        np.linalg.norm(Asp @ x - b)
        / (nrmA * np.linalg.norm(x) + np.linalg.norm(b))
    )

    # solve latency: raw fp32 vs fused on-device refinement (refine.py)
    def _time_solve(**kw):
        try:
            F.solve(b, **kw)  # warm/compile
            t0 = time.time()
            for _ in range(3):
                F.solve(b, **kw)
            return (time.time() - t0) / 3
        except Exception:
            return float("nan")

    t_solve_raw = _time_solve(refine=0)
    t_solve_dev = _time_solve(refine="device")
    t_solve_auto = _time_solve(refine="auto")

    cpu_s = _cpu_baseline_seconds(A)
    vs = cpu_s / best
    if not np.isfinite(vs):
        vs = 0.0  # baseline skipped (too large for this host's CPU)
    # the honest one-shot comparison includes OUR symbolic+plan+compile
    # side too (scipy splu cannot separate its symbolic phase; SuperLU's
    # Fact=SamePattern numeric-only path is not exposed through scipy) —
    # vs_baseline is steady-state refactorization (the production pattern),
    # vs_baseline_one_shot charges us the full cold build
    vs_one = cpu_s / (t_build + best)
    if not np.isfinite(vs_one):
        vs_one = 0.0

    return {
        "metric": f"supernodal factorize GFLOP/s/chip ({matrix}, {ordering}, {dtype})",
        "value": round(gflops, 4),
        "unit": "GFLOP/s",
        "vs_baseline": round(vs, 4),
        "vs_baseline_one_shot": round(vs_one, 4),
        "detail": {
            "n": A.n,
            "nnz_A": A.nnz,
            "nnz_L": nnzL,
            "layout": F.plan.layout,
            "store_bytes": F.plan.store_bytes(),
            "true_flops": flops,
            "padded_flops": F.plan.padded_flops(),
            "numeric_seconds_pipelined": best,
            "numeric_seconds_single_dispatch": single,
            "nnzL_per_s": nnzL / best,
            "build_seconds_incl_compile": t_build,
            "solve_backward_error": be,
            "solve_seconds_raw": t_solve_raw,
            "solve_seconds_device_refined": t_solve_dev,
            "solve_seconds_auto_refined": t_solve_auto,
            "cpu_splu_seconds": cpu_s,
            "baseline_def": (
                "scipy splu full factorize wall-time on this host vs our "
                "steady-state numeric refactorization (vs_baseline) and vs "
                "our cold build+factorize incl. symbolic/plan/jit-compile "
                "(vs_baseline_one_shot); splu's symbolic phase is not "
                "separable through scipy"
            ),
        },
    }
