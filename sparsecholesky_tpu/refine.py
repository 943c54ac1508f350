"""On-device iterative refinement (double-float residual, one dispatch).

The host refinement loop (api.CholeskyFactor.solve) costs one device
round-trip per step — at the ~25ms axon dispatch RTT that dominates
small-matrix solve latency.  This module fuses K refinement steps into a
single jitted program:

    x    = solve(b)                       (fp32 factor)
    loop: r  = b - A x   in double-float  (ops/dfloat.py, ~48-bit mantissa)
          dx = solve(r)                   (fp32)
          x += dx        in double-float

A rides along as a padded ELL [n, K] (row-major fixed-width sparse) whose
values are stored as exact fp32 (hi, lo) pairs of the fp64 input.  The
matvec gathers x rows at the ELL column indices (row-granular, index n ->
fill 0) and reduces over the K axis with a compensated binary tree, so the
residual is accurate to ~1e-13..1e-15 relative — far below eps_f32, which
is what refinement needs to converge (it stalls at the residual's
precision, not the factor's).

The reference has no solve at all (SURVEY.md §2); this augments BASELINE
config 1/2 with a latency-optimal solve mode.  Accuracy ladder:
  refine=0        one dispatch, O(cond * eps32) backward error
  refine="device" one dispatch, ~1e-13-class backward error
  refine="auto"   device steps + host-fp64 polish, ~1e-16-class,
                  one to two host SpMV round-trips instead of 3-5.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

from .ops.dfloat import df_add, two_prod
from .solve import _solve_impl

#: device-refinement ELL budget: n * K entries, 12 bytes each (idx+hi+lo)
ELL_CAP = 64 * 1024 * 1024


def build_ell(A):
    """Padded ELL of the full symmetric A: (idx [n,K] int32 with n = pad,
    hi [n,K], lo [n,K]) where hi+lo is the exact fp64 value.  Returns None
    when n*K exceeds ELL_CAP (host refinement stays available)."""
    M = A.to_scipy().tocsr()
    M.sum_duplicates()
    n = M.shape[0]
    counts = np.diff(M.indptr)
    K = int(counts.max()) if n else 1
    if n * K > ELL_CAP:
        return None
    idx = np.full((n, K), n, np.int32)
    v64 = np.zeros((n, K), np.float64)
    # rows are contiguous in CSR: place entry t of row r at slot t
    r = np.repeat(np.arange(n), counts)
    t = np.arange(M.nnz) - np.repeat(M.indptr[:-1], counts)
    idx[r, t] = M.indices
    v64[r, t] = M.data
    hi = v64.astype(np.float32)
    lo = (v64 - hi.astype(np.float64)).astype(np.float32)
    return jnp.asarray(idx), jnp.asarray(hi), jnp.asarray(lo)


def _ell_matvec_df(idx, ahi, alo, xh, xl):
    """y = A x in double-float: per-slot TwoProd + first-order cross
    terms, compensated binary-tree reduction over the K axis.  x may be
    [n] or [n, k] (multi-RHS); y matches."""
    flat = idx.reshape(-1)
    tail = xh.shape[1:]
    shp = idx.shape + tail
    gh = jnp.take(xh, flat, axis=0, mode="fill", fill_value=0).reshape(shp)
    gl = jnp.take(xl, flat, axis=0, mode="fill", fill_value=0).reshape(shp)
    a_hi = ahi.reshape(idx.shape + (1,) * len(tail))
    a_lo = alo.reshape(idx.shape + (1,) * len(tail))
    p, pe = two_prod(a_hi, gh)
    pe = pe + a_hi * gl + a_lo * gh
    h, l = p, pe
    while h.shape[1] > 1:
        k = h.shape[1]
        if k % 2:
            pad = [(0, 0)] * h.ndim
            pad[1] = (0, 1)
            h = jnp.pad(h, pad)
            l = jnp.pad(l, pad)
            k += 1
        h, l = df_add(h[:, 0::2], l[:, 0::2], h[:, 1::2], l[:, 1::2])
    return h[:, 0], l[:, 0]


def _residual_df(ell, bh, bl, xh, xl):
    idx, ahi, alo = ell
    yh, yl = _ell_matvec_df(idx, ahi, alo, xh, xl)
    return df_add(bh, bl, -yh, -yl)


@functools.partial(
    jax.jit, static_argnames=("n", "R_L", "dtype", "steps"))
def _device_refine_jit(arrays, Lx, ell, bh, bl, d, linv, n, R_L, dtype,
                       steps):
    """solve + ``steps`` fused refinement iterations; returns (xh, xl).

    Runs as a fori_loop from x = 0 (iteration 0's residual is b, so its
    correction IS the initial solve) — the compiled program contains ONE
    copy of the solve body regardless of ``steps``, keeping program size
    (and TPU compile time) at a single solve's."""
    with jax.default_matmul_precision("highest"):
        solve1 = lambda r: _solve_impl(
            arrays, Lx, r, d, n=n, R_L=R_L, dtype=dtype, linv=linv)

        def body(_, carry):
            xh, xl = carry
            rh, rl = _residual_df(ell, bh, bl, xh, xl)
            dx = solve1(rh + rl)
            return df_add(xh, xl, dx, jnp.zeros_like(dx))

        z = jnp.zeros_like(bh)
        return jax.lax.fori_loop(0, steps + 1, body, (z, z))


@jax.jit
def _residual_rhs_jit(ell, bh, bl, xh, xl):
    """fp32 collapse of the double-float residual (the next correction's
    right-hand side), one device dispatch."""
    rh, rl = _residual_df(ell, bh, bl, xh, xl)
    return rh + rl


@jax.jit
def _df_accum_jit(xh, xl, dx):
    return df_add(xh, xl, dx, jnp.zeros_like(dx))


def device_refined_solve(plan, Lx, ell, rhs, *, d, arrays, linv=None,
                         steps: int = 3):
    """Run solve + ``steps`` double-float refinement iterations with zero
    host round-trips before the final readback.  ``rhs`` is a host fp64
    vector (or [n, k] multi-RHS block) in original index order; returns a
    host fp64 solution accurate to the double-float residual floor.

    Single-jit plans (<= numeric.CHUNK_RUNS runs) fuse everything into ONE
    dispatch (_device_refine_jit).  Chunked plans run the same iteration
    as a Python loop of ASYNC device dispatches (residual -> chunked
    sweeps -> accumulate): values never return to the host between steps,
    so the cost over the fused form is per-dispatch overhead only — this
    is what makes refine="device" available on exactly the large matrices
    that compile chunked (VERDICT r2 item 6)."""
    from .numeric import CHUNK_RUNS

    rhs = np.asarray(rhs, np.float64)
    bh_h = rhs.astype(np.float32)
    bl_h = (rhs - bh_h.astype(np.float64)).astype(np.float32)
    bh, bl = jnp.asarray(bh_h), jnp.asarray(bl_h)
    if len(arrays["meta"].value) <= CHUNK_RUNS:
        xh, xl = _device_refine_jit(
            arrays, Lx, ell, bh, bl, d, linv,
            plan.n, plan.R_L, jnp.dtype(plan.dtype), steps,
        )
    else:
        from . import solve as _solve

        z = jnp.zeros_like(bh)
        xh, xl = z, z
        for _ in range(steps + 1):
            r = _residual_rhs_jit(ell, bh, bl, xh, xl)
            dx = _solve.solve(plan, Lx, r, d=d, arrays=arrays, linv=linv)
            xh, xl = _df_accum_jit(xh, xl, dx)
    return np.asarray(xh, np.float64) + np.asarray(xl, np.float64)
