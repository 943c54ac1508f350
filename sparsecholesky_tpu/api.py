"""High-level user API.

The reference's top-level surface is ``chol(A)`` / ``chol_sn(A)`` /
``schol(A)`` returning ``std::expected`` (/root/reference/include/chol.hpp:750,
:874, :1407).  The TPU framework exposes the same split as:

    S    = analyze(A)                      # symbolic (host, reusable)
    F    = chol(A)                         # full pipeline -> CholeskyFactor
    x    = F.solve(b)                      # new capability (BASELINE cfg 1)
    F2   = F.refactorize(new_values)       # schol/chol split, explicit
    L    = F.L()                           # lower CSC, reference-comparable

Extras the reference lacks but production solvers need:
  * ``scale=True`` — symmetric Jacobi equilibration (factor D A D with
    unit diagonal), which keeps ill-scaled SPD matrices factorizable in
    fp32 on the MXU;
  * ``F.solve(b, refine=k)`` — k steps of iterative refinement with the
    residual computed in fp64 on host, recovering fp64-class solution
    accuracy from an fp32 factor.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from .csc import CSCMatrix
from .ordering import compute_ordering
from .plan import FactorizePlan, compile_plan
from . import numeric as _numeric
from . import solve as _solve


@dataclasses.dataclass
class CholeskyFactor:
    """Factorization result: plan + device factor, with solve/export."""

    plan: FactorizePlan
    arrays: dict
    Lx: object   # device array, [R_L, 128] block store, factor of D A D
    d: object    # device array [n], equilibration vector (ones if unscaled)
    A: CSCMatrix | None = None  # original matrix (for refinement residuals)
    backend: str = "xla"
    scaled: bool = False
    _linv: object = None  # lazy diagonal-block inverses (solve fast path)
    _ell: object = None   # lazy device ELL of A (on-device refinement)
    _yctx: object = None  # lazy store-row solve context (solve_store.py)

    def _store_ctx(self):
        """Lazy store-row-space solve context (Y/WP in [R_L, 128] row
        space — solve_store.py).  False = ineligible (opt-out, byte
        budget exceeded, or build failed).

        The store-row path is OPT-IN (``SPARSECHOL_SOLVE_STORE=1``): the
        round-5 on-chip measurement falsified the design's premise — the
        round-4 "25.5 ms/RHS legacy floor" it was built to beat was the
        remote tunnel's host<->device transfer, not the device.  With
        the RHS device-resident, the legacy sweeps with batched-inverse
        matmuls run :48 at 55.5 ms (k=1) and a FLAT ~86 ms for k=8..128
        (0.68 ms/RHS at 128), while the store path's [R_L, 128]-row
        traffic costs 127 ms at every k (BASELINE.md round-5 solve
        section)."""
        if self._yctx is None:
            import os

            from . import solve_store as _ss

            if (os.environ.get("SPARSECHOL_SOLVE_STORE") != "1"
                    or not _ss.eligible(self.plan)):
                self._yctx = False
            else:
                try:
                    self._yctx = _ss.build_context(
                        self.plan, self.Lx, self.arrays)
                except Exception:
                    self._yctx = False
        return self._yctx or None

    def _solve_raw(self, rhs):
        """One raw factor solve (no refinement): the legacy sweeps with
        the batched-inverse MXU fast path (measured-fastest at every k,
        see _store_ctx), or the opt-in store-row path."""
        ctx = self._store_ctx()
        if ctx is not None:
            from . import solve_store as _ss

            return _ss.solve_rows(self.plan, rhs, ctx=ctx, d=self.d,
                                  arrays=self.arrays)
        return np.asarray(
            _solve.solve(self.plan, self.Lx, rhs, d=self.d,
                         arrays=self.arrays, linv=self._diag_inv()))

    def _diag_inv(self):
        if self._linv is None:
            import jax.numpy as jnp

            dt = jnp.dtype(self.plan.dtype)
            # explicit per-supernode inverse blocks cost B*w_pad^2 each;
            # past ~1 GiB total (1M-row plans) the HBM is better spent on
            # the factor itself — fall back to in-solve triangular solves
            est = sum(
                b.batch * b.w_pad * b.w_pad * dt.itemsize
                for lev in self.plan.levels
                for b in lev
            )
            if est > 1 << 30:
                self._linv = False
            else:
                self._linv = _numeric.diag_inverses(
                    self.arrays, self.Lx, self.plan.R_L, dt
                )
        return self._linv or None

    def _device_ell(self):
        """Lazy padded-ELL upload of A for on-device refinement; False when
        ineligible (no A, or over the ELL budget).  Chunked plans are
        eligible: refine.device_refined_solve runs their refinement loop as
        async chunked dispatches with no host round-trips."""
        if self._ell is None:
            from . import refine as _refine

            eligible = (
                self.A is not None
                and np.dtype(self.plan.dtype) == np.float32
            )
            self._ell = (_refine.build_ell(self.A) if eligible else None) \
                or False
        return self._ell or None

    def solve(self, rhs, *, refine=None) -> np.ndarray:
        """Solve A x = rhs (rhs in original index order).

        ``refine`` > 0 runs that many iterative-refinement steps: the
        residual r = b - A x is computed in fp64 on host against the
        original values, and the correction is solved with the existing
        factor.  Requires the factor to have been built via chol() (which
        retains A).  The default (None) auto-refines whenever A is
        available — an fp32 factor of an ill-conditioned matrix would
        otherwise silently return an O(cond * eps) solution; pass
        ``refine=0`` for the raw single-precision solve.  Refinement
        stops as soon as the residual stalls (typically 2-4 steps).

        ``refine="device"`` fuses the solve and 3 refinement steps with a
        double-float residual (ops/dfloat.py) into ONE device dispatch —
        the latency-optimal mode (~1e-13-class backward error; the host
        loop's fp64 residual reaches ~1e-16 at one round-trip per step).
        The auto mode runs the device steps first when available, so its
        host polish typically needs a single round-trip.
        """
        if refine is None:
            refine = "auto" if self.A is not None else 0
        x = None
        if refine in ("auto", "device") and np.ndim(rhs) in (1, 2):
            ell = self._device_ell()
            if ell is not None:
                from . import refine as _refine

                try:
                    x = _refine.device_refined_solve(
                        self.plan, self.Lx, ell, rhs, d=self.d,
                        arrays=self.arrays, linv=self._diag_inv(),
                    )
                except Exception:
                    # e.g. the TPU compiler rejecting the fused program on
                    # a near-chunk-size plan: auto falls back to the host
                    # loop; the explicit device mode surfaces the error
                    if refine == "device":
                        raise
                    self._ell = False   # don't retry per solve
                    x = None
                if x is not None and refine == "device":
                    return x
            elif refine == "device":
                raise ValueError(
                    "device refinement unavailable: needs the original "
                    "matrix, a single-jit plan, and n*K within the ELL "
                    "budget")
        if x is None:
            x = np.asarray(self._solve_raw(rhs))
        if refine:
            if self.A is None:
                raise ValueError("refinement needs the original matrix")
            max_steps = 30 if refine in (True, "auto") else int(refine)
            Asp = self.A.to_scipy()
            b64 = np.asarray(rhs, dtype=np.float64)
            x = x.astype(np.float64)
            rnorm_prev = np.inf
            for _ in range(max_steps):
                r = b64 - Asp @ x
                rnorm = float(np.linalg.norm(r))
                if not (rnorm < 0.5 * rnorm_prev):  # stalled / converged
                    break
                rnorm_prev = rnorm
                dx = np.asarray(self._solve_raw(r))
                x = x + dx
        return x

    def L(self) -> CSCMatrix:
        """Export the factor of P A P^T as sorted lower CSC (host).

        The stored factor is of D A D; rows are unscaled by 1/d so that
        L @ L.T == P A P^T exactly like the reference's output."""
        Lx = np.asarray(self.Lx).astype(np.float64)
        dinv = 1.0 / np.asarray(self.d, dtype=np.float64)
        return self.plan.extract_csc(Lx, row_scale=dinv)

    def log_det(self) -> float:
        """log det(A) = 2 sum(log diag L') - 2 sum(log d)."""
        diag = self._scaled_diag()
        dv = np.asarray(self.d, dtype=np.float64)
        return float(2.0 * (np.sum(np.log(diag)) - np.sum(np.log(dv))))

    def diag(self) -> np.ndarray:
        """Diagonal of L (of P A P^T, unscaled), in permuted order."""
        dv = np.asarray(self.d, dtype=np.float64)
        return self._scaled_diag() / dv

    def _scaled_diag(self) -> np.ndarray:
        Lx = np.asarray(self.Lx)
        S = self.plan.S
        out = np.empty(self.plan.n, dtype=np.float64)
        for s in range(S.ns):
            w = int(self.plan.block_w[s])
            r0 = int(self.plan.row_off[s])
            m = int(self.plan.block_m[s])
            jj = np.arange(w)
            # segment-major: diagonal (j, j) lives in segment j//128, row j
            out[int(S.sn_ptr[s]) + jj] = Lx[r0 + (jj // 128) * m + jj, jj % 128]
        return out

    def refactorize(self, Ax) -> "CholeskyFactor":
        """Numeric-only refactorization with new values on the same pattern
        (the reference's schol/chol split as a first-class operation)."""
        Lx, d = _numeric.factorize(
            self.plan, Ax, arrays=self.arrays, backend=self.backend,
            scale=self.scaled,
        )
        newA = None
        if self.A is not None:
            newA = CSCMatrix(
                self.A.n, self.A.indptr, self.A.indices,
                np.asarray(Ax), sym=self.A.sym,
            )
        # _yctx holds the transformed factor store (WP) of the OLD values
        # and must rebuild against the new Lx
        return dataclasses.replace(self, Lx=Lx, d=d, A=newA, _linv=None,
                                   _ell=None, _yctx=None)

    @property
    def perm(self) -> np.ndarray:
        return self.plan.perm


def chol(
    A: CSCMatrix,
    *,
    ordering: str = "natural",
    grid_shape=None,
    backend: str = "xla",
    dtype=None,
    scale: bool | str = False,
    precision: str = "highest",
    analyze_kwargs: dict | None = None,
    layout: str = "auto",
) -> CholeskyFactor:
    """Full sparse Cholesky pipeline: ordering -> symbolic -> plan -> numeric.

    Matches the reference's chol_sn(A) contract (supernodal factorization of
    an SPD matrix in canonical upper CSC), raising NotPositiveDefiniteError
    instead of returning std::unexpected.

    ``scale="auto"`` equilibrates only when the matrix actually needs it
    (diagonal dynamic range > _SCALE_AUTO_RATIO): equilibration is a
    numerical remedy for ill-scaled fp32 inputs, but it costs ~9 ms of
    element-granular d-gathers per factorization on a 110k-row plan —
    a pure tax on well-scaled matrices (the Poisson family's diagonal is
    constant).
    """
    if scale == "auto":
        scale = _needs_equilibration(A)
    perm = compute_ordering(A, ordering, grid_shape=grid_shape)
    plan = compile_plan(A, perm=perm, dtype=dtype,
                        analyze_kwargs=analyze_kwargs, layout=layout)
    arrays = _numeric.device_arrays(plan)
    Lx, d = _numeric.factorize(
        plan, A.data, arrays=arrays, backend=backend, scale=scale,
        precision=precision,
    )
    return CholeskyFactor(
        plan, arrays, Lx, d, A=A, backend=backend, scaled=scale
    )


#: diagonal dynamic-range threshold above which scale="auto" equilibrates
_SCALE_AUTO_RATIO = 100.0


def _needs_equilibration(A: CSCMatrix) -> bool:
    """Host-side check of the diagonal dynamic range (the driver of fp32
    factorization error on the SuiteSparse bcsstk/bus families)."""
    if not A.n or not len(A.indices):
        # zero stored entries: nothing to equilibrate, and indexing the
        # empty indices array below would raise — let the factorization's
        # own NPD handling report the structural failure
        return False
    # canonical upper CSC: a column's diagonal entry is its LAST entry
    last = np.maximum(A.indptr[1:] - 1, 0)
    has = (A.indptr[1:] > A.indptr[:-1]) & (
        A.indices[last] == np.arange(A.n))
    d = np.where(has, np.abs(A.data[last]), 0.0)
    dmax = d.max() if A.n else 0.0
    dmin = d[d > 0].min() if (d > 0).any() else 0.0
    return bool(not dmin or dmax / dmin > _SCALE_AUTO_RATIO)


def analyze_and_plan(A: CSCMatrix, **kw) -> FactorizePlan:
    """Symbolic-only entry point (the reference's schol)."""
    perm = compute_ordering(A, kw.pop("ordering", "natural"),
                            grid_shape=kw.pop("grid_shape", None))
    return compile_plan(A, perm=perm, **kw)
