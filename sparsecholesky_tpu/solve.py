"""Level-scheduled supernodal sparse triangular solve (SpTRSV).

The reference never solves Ax=b (SURVEY.md: "no solve routine"); this is a
required capability of the TPU framework (BASELINE.json config 1/2).  The
solve reuses the factorization plan's step sequence (numeric.build_runs) —
same-shape stretches execute as one lax.scan:

  forward  (L y = b), steps in plan order:
      z = L11^{-1} y[cols]           (batched triangular solve / MXU matmul
                                      against precomputed inverses)
      y[below] -= L21 @ z            (batched matvec + scatter-add)
      y[cols]  = z
  backward (L^T x = y), steps reversed:
      v = L21^T @ x[below]
      x[cols] = L11^{-T} (y[cols] - v)

Correctness follows from the wavefront argument (SURVEY.md §2c): in the
forward pass a supernode's columns depend only on strict assembly-tree
descendants (strictly earlier steps), and its below-rows belong to strict
ancestors (strictly later steps), so immediate per-step commits never
interfere; the backward pass is the mirror image.

Identity padding makes everything maskless: padded columns solve to 0,
padded rows gather 0 and scatter to the dropped slot.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .plan import FactorizePlan
from .numeric import gather_panels, iter_runs


def _solve_impl(arrays, Lx, rhs, d, *, n: int, R_L: int, dtype, linv=None):
    """Pure jittable solve of A x = rhs for one right-hand side in ORIGINAL
    index order: applies perm and the equilibration d (the stored factor is
    of D (P A P^T) D, so x = P^T D L^-T L^-1 D P rhs), then iperm.

    ``linv`` (run-aligned list from numeric.diag_inverses) replaces the
    loop-lowered triangular solves with batched MXU matmuls.
    """
    perm = arrays["perm"]
    rhs = rhs.astype(dtype)
    squeeze = rhs.ndim == 1
    if squeeze:
        rhs = rhs[:, None]
    y = rhs[perm] * d[:, None]  # permuted + equilibrated RHS, [n, k]

    # one shared definition of the sweep kernels (advisor: the inline
    # copies here and _make_steps used to duplicate line-for-line)
    fstep, bstep = _make_steps(arrays, Lx, n, R_L, dtype)

    runs = [(k, rb, sl, al)
            for k, rb, _u, _wm, _rc, sl, al in iter_runs(arrays)]
    lv = linv if linv is not None else [None] * len(runs)

    # ---- forward: L y = b ----
    for (kind, rb, sl, al), Dinv in zip(runs, lv):
        if kind == "single":
            y = fstep(y, rb, Dinv, sl, al)
        else:
            xs = (rb, Dinv) if Dinv is not None else (rb,)
            y = jax.lax.scan(
                lambda c, x, sl=sl, al=al: (
                    fstep(c, x[0], x[1] if len(x) > 1 else None, sl, al), 0),
                y, xs,
            )[0]

    # ---- backward: L^T x = y ----
    x = y
    for (kind, rb, sl, al), Dinv in zip(reversed(runs), list(reversed(lv))):
        if kind == "single":
            x = bstep(x, rb, Dinv, sl, al)
        else:
            xs = (rb, Dinv) if Dinv is not None else (rb,)
            x = jax.lax.scan(
                lambda c, t, sl=sl, al=al: (
                    bstep(c, t[0], t[1] if len(t) > 1 else None, sl, al), 0),
                x, xs, reverse=True,
            )[0]

    x = x * d[:, None]
    x = x[arrays["iperm"]]
    return x[:, 0] if squeeze else x


@functools.partial(jax.jit, static_argnames=("n", "R_L", "dtype"))
def _solve_jit(arrays, Lx, rhs, d, linv, n, R_L, dtype):
    with jax.default_matmul_precision("highest"):
        return _solve_impl(arrays, Lx, rhs, d, n=n, R_L=R_L, dtype=dtype,
                           linv=linv)


# ---------------------------------------------------------------------------
# Chunked solve for very large plans (see numeric.CHUNK_RUNS): the forward
# and backward sweeps compile as several smaller executables.


@functools.partial(
    jax.jit,
    static_argnames=("n", "R_L", "dtype", "lo", "hi", "forward", "first"),
)
def _sweep_chunk(arrays, Lx, vec, d, linv, n, R_L, dtype, lo, hi, forward,
                 first):
    from .numeric import _Static

    sub = {**arrays, "meta": _Static(arrays["meta"].value[lo:hi])}
    with jax.default_matmul_precision("highest"):
        return _sweep_impl(sub, Lx, vec, d, n=n, R_L=R_L, dtype=dtype,
                           linv=linv, forward=forward, first=first)


def _sweep_impl(arrays, Lx, vec, d, *, n, R_L, dtype, linv, forward, first):
    """One direction of the solve over the runs in ``arrays`` only."""
    runs = [(k, rb, sl, al)
            for k, rb, _u, _wm, _rc, sl, al in iter_runs(arrays)]
    lv = linv if linv is not None else [None] * len(runs)
    fstep, bstep = _make_steps(arrays, Lx, n, R_L, dtype)
    if first and forward:
        vec = vec.astype(dtype)
        squeeze = vec.ndim == 1
        if squeeze:
            vec = vec[:, None]
        vec = vec[arrays["perm"]] * d[:, None]
    if forward:
        for (kind, rb, sl, al), Dinv in zip(runs, lv):
            if kind == "single":
                vec = fstep(vec, rb, Dinv, sl, al)
            else:
                xs = (rb, Dinv) if Dinv is not None else (rb,)
                vec = jax.lax.scan(
                    lambda c, x, sl=sl, al=al: (
                        fstep(c, x[0], x[1] if len(x) > 1 else None,
                              sl, al), 0),
                    vec, xs,
                )[0]
    else:
        for (kind, rb, sl, al), Dinv in zip(reversed(runs),
                                            list(reversed(lv))):
            if kind == "single":
                vec = bstep(vec, rb, Dinv, sl, al)
            else:
                xs = (rb, Dinv) if Dinv is not None else (rb,)
                vec = jax.lax.scan(
                    lambda c, t, sl=sl, al=al: (
                        bstep(c, t[0], t[1] if len(t) > 1 else None,
                              sl, al), 0),
                    vec, xs, reverse=True,
                )[0]
    return vec


@functools.partial(jax.jit, static_argnames=("dtype",))
def _finish_solve(arrays, x, d, dtype):
    x = x * d[:, None]
    return x[arrays["iperm"]]


def _make_steps(arrays, Lx, n, R_L, dtype):
    def _lsolve(D, t, transpose, inverted):
        if inverted:
            eq = "bji,bjk->bik" if transpose else "bij,bjk->bik"
            return jnp.einsum(eq, D, t, preferred_element_type=dtype)
        return jax.lax.linalg.triangular_solve(
            D, t, left_side=True, lower=True, transpose_a=transpose
        )

    def fstep(y, b, Dinv, slab=False, aligned=False):
        w_pad = b.w_pad
        P = gather_panels(Lx, b, R_L, aligned=aligned, slab=slab)
        D = Dinv if Dinv is not None else jnp.tril(P[:, :w_pad, :])
        cidx = jnp.where(b.col_idx < 0, n, b.col_idx)
        ycols = jnp.take(y, cidx, axis=0, mode="fill", fill_value=0)
        z = _lsolve(D, ycols, transpose=False, inverted=Dinv is not None)
        y = y.at[cidx].set(z, mode="drop")
        if b.mb_pad:
            L21 = P[:, w_pad:, :]
            u = jnp.einsum("bij,bjk->bik", L21, z,
                           preferred_element_type=dtype)
            bidx = jnp.where(b.below_idx < 0, n, b.below_idx)
            y = y.at[bidx].add(-u, mode="drop")
        return y

    def bstep(x, b, Dinv, slab=False, aligned=False):
        w_pad = b.w_pad
        P = gather_panels(Lx, b, R_L, aligned=aligned, slab=slab)
        D = Dinv if Dinv is not None else jnp.tril(P[:, :w_pad, :])
        cidx = jnp.where(b.col_idx < 0, n, b.col_idx)
        t = jnp.take(x, cidx, axis=0, mode="fill", fill_value=0)
        if b.mb_pad:
            L21 = P[:, w_pad:, :]
            bidx = jnp.where(b.below_idx < 0, n, b.below_idx)
            xb = jnp.take(x, bidx, axis=0, mode="fill", fill_value=0)
            t = t - jnp.einsum("bij,bik->bjk", L21, xb,
                               preferred_element_type=dtype)
        z = _lsolve(D, t, transpose=True, inverted=Dinv is not None)
        return x.at[cidx].set(z, mode="drop")

    return fstep, bstep


def solve(plan: FactorizePlan, Lx, rhs, *, d=None, arrays=None, linv=None):
    """Solve A x = rhs given the factor block-store Lx (from factorize).

    Pass ``linv`` (numeric.diag_inverses) for the loop-free MXU fast path.
    """
    from .numeric import CHUNK_RUNS, device_arrays

    if arrays is None:
        arrays = device_arrays(plan)
    dtype = jnp.dtype(plan.dtype)
    if d is None:
        d = jnp.ones((plan.n,), dtype=dtype)
    nruns = len(arrays["meta"].value)
    if nruns <= CHUNK_RUNS:
        return _solve_jit(arrays, Lx, jnp.asarray(rhs), d, linv, plan.n,
                          plan.R_L, dtype)
    from .numeric import _chunk_boundaries

    rhs = jnp.asarray(rhs)
    squeeze = rhs.ndim == 1
    vec = rhs
    lv = linv if linv is not None else [None] * nruns
    bounds = list(_chunk_boundaries(arrays["meta"].value))
    first = True
    i = 0
    while i < len(bounds):
        lo, hi = bounds[i]
        try:
            vec = _sweep_chunk(arrays, Lx, vec, d, lv[lo:hi], plan.n,
                               plan.R_L, dtype, lo, hi, True, first)
        except Exception:
            if hi - lo <= 1:
                raise
            mid = (lo + hi) // 2
            bounds[i : i + 1] = [(lo, mid), (mid, hi)]
            continue
        first = False
        i += 1
    i = len(bounds) - 1
    while i >= 0:
        lo, hi = bounds[i]
        try:
            vec = _sweep_chunk(arrays, Lx, vec, d, lv[lo:hi], plan.n,
                               plan.R_L, dtype, lo, hi, False, False)
        except Exception:
            if hi - lo <= 1:
                raise
            mid = (lo + hi) // 2
            bounds[i : i + 1] = [(lo, mid), (mid, hi)]
            i += 1
            continue
        i -= 1
    x = _finish_solve(arrays, vec, d, dtype)
    return x[:, 0] if squeeze else x
