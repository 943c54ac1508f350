"""Store-row-space multi-RHS solve (the round-5 solve redesign).

The legacy sweep (solve.py) is bound by element-granular y-row issue: a
[n, 1] vector's "rows" are 4 bytes, and the 504 step bodies of a :48
solve each pay ~150 us of gather/scatter issue (BASELINE.md round-4
floor analysis) — the same disease the factorize extend-add had before
the window kernels.  This path carries the solve state in STORE-ROW
space so every access is a full 512-byte lane row:

  * ``Y[R_L, 128]`` — lanes are up to 128 right-hand sides.  Matrix
    column j has ONE canonical Y row: the store row of L[j, j]
    (``row_off[s] + (c // LANE) * seg_stride[s] + c`` with
    ``c = j - col0(s)`` — the same address the factorize's extend-add
    owner groups use, plan.py:751-757).  All other store rows are dead.
  * ``WPx[R_L, 128]`` — a transformed factor store with the SAME layout
    as ``Lx`` so the factorize's panel machinery (dense slab slices on
    aligned plans, one row-gather otherwise) assembles its panels:

        WP_panel = [ Dinv - I  ;  -L21 @ Dinv ],   Dinv = L11^{-1}

  * forward step (L y = b): one panel gather + one Y-row gather + one
    MXU einsum + ONE row scatter-add::

        v  = Y[yprow[:, :w_pad]]            # y'(cols), [B, w_pad, 128]
        zu = WP @ v                         # [B, m_pad, 128]
        Y[yprow] += zu                      # top: z - y'  -> Y holds z
                                            # below: -L21 z (extend-add)

  * backward step (L^T x = y): the transposed einsum, scatter on the
    diagonal rows only::

        v = Y[yprow]                        # [y(cols); x(below)]
        Y[yprow[:, :w_pad]] += einsum(WP^T, v)   # = x - y -> Y holds x

Correctness is the legacy argument (solve.py:17-24) verbatim: forward
contributions only flow to strict assembly-tree ancestors (strictly
later steps), the backward pass is the mirror image, and the identity
padding of gather_panels plus the R_L out-of-bounds sentinel make every
step maskless.  Per step: 4 executed ops at row granularity for ANY
k <= 128, and the compiled program is k-independent (k rides the lanes).

The reference has no solve at all (SURVEY.md "What the reference does
NOT have"); BASELINE configs 1/2 require SpTRSV.
"""

from __future__ import annotations

import functools
import math

import numpy as np

import jax
import jax.numpy as jnp

from .plan import FactorizePlan, LANE
from .numeric import (
    CHUNK_RUNS,
    _Static,
    _chunk_boundaries,
    device_arrays,
    gather_panels,
    iter_runs,
    scatter_panels,
    step_groups,
)

#: Y + WPx cost one factor-store copy each; above this byte budget the
#: api falls back to the legacy element-granular solve (1M-row plans)
STORE_SOLVE_CAP = 3 << 30


def eligible(plan: FactorizePlan) -> bool:
    import os

    cap = int(os.environ.get("SPARSECHOL_SOLVE_STORE_CAP", STORE_SOLVE_CAP))
    return 2 * plan.R_L * LANE * plan.dtype.itemsize <= cap


# ---------------------------------------------------------------------------
# Host-side canonical-row grids


def build_ygrids(plan: FactorizePlan):
    """Per-run [B, m_pad] canonical-Y-row grids (scan groups stacked),
    mirroring build_runs' grouping run-for-run via numeric.step_groups.

    Returns (ybuf int32[.], ymeta tuple of (offset, shape), yof int32[n],
    yinv int32[R_L]): ``yof[j]`` is column j's canonical Y row,
    ``yinv`` its inverse (R_L-sized, sentinel n where no column lives).
    """
    S = plan.S
    n = plan.n
    seg_stride = np.asarray(getattr(plan, "seg_stride", plan.block_m),
                            dtype=np.int64)
    cols = np.arange(n, dtype=np.int64)
    sid = S.sn_id[cols].astype(np.int64)
    c = cols - S.sn_ptr[sid]
    yof = (plan.row_off[sid] + (c // LANE) * seg_stride[sid] + c).astype(
        np.int64)
    yofx = np.concatenate([yof, [plan.R_L]]).astype(np.int32)  # sentinel

    bufs, metas, off = [], [], 0
    for group in step_groups(plan):
        arrs = []
        for b in group:
            yp = np.full((b.batch, b.w_pad + b.mb_pad), plan.R_L, np.int32)
            ci = np.asarray(b.col_idx, dtype=np.int64)
            yp[:, : b.w_pad] = yofx[np.where(ci >= 0, ci, n)]
            if b.mb_pad:
                bi = np.asarray(b.below_idx, dtype=np.int64)
                yp[:, b.w_pad:] = yofx[np.where(bi >= 0, bi, n)]
            arrs.append(yp)
        arr = np.stack(arrs) if len(group) > 1 else arrs[0]
        bufs.append(arr.ravel())
        metas.append((off, arr.shape))
        off += arr.size
    ybuf = (np.concatenate(bufs) if bufs
            else np.zeros(0, np.int32))
    yinv = np.full(plan.R_L, n, np.int32)
    yinv[yof] = np.arange(n, dtype=np.int32)
    return ybuf, tuple(metas), yof.astype(np.int32), yinv


# ---------------------------------------------------------------------------
# WP store construction (one pass over the factored store)


def _wp_step(WPx, Lx, b, *, R_L, dtype, slab, aligned):
    w_pad = b.w_pad
    P = gather_panels(Lx, b, R_L, aligned=aligned, slab=slab)
    L11 = jnp.tril(P[:, :w_pad, :])
    eye = jnp.eye(w_pad, dtype=dtype)[None]
    Dinv = jax.lax.linalg.triangular_solve(
        L11, jnp.broadcast_to(eye, L11.shape), left_side=True, lower=True
    )
    top = Dinv - eye
    if P.shape[1] > w_pad:
        bot = -jnp.einsum("bij,bjk->bik", P[:, w_pad:, :], Dinv,
                          preferred_element_type=dtype)
        WP = jnp.concatenate([top, bot], axis=1)
    else:
        WP = top
    return scatter_panels(WPx, b, WP, R_L, aligned=aligned, slab=slab)


def _build_wp_impl(arrays, Lx, WPx, *, R_L, dtype, lo, hi):
    runs = list(iter_runs(arrays))[lo:hi]
    for kind, rb, _u, _wm, _rc, slab, al in runs:
        if kind == "single":
            WPx = _wp_step(WPx, Lx, rb, R_L=R_L, dtype=dtype, slab=slab,
                           aligned=al)
        else:
            WPx = jax.lax.scan(
                lambda c, t, slab=slab, al=al: (
                    _wp_step(c, Lx, t, R_L=R_L, dtype=dtype, slab=slab,
                             aligned=al), 0),
                WPx, rb,
            )[0]
    return WPx


@functools.partial(jax.jit,
                   static_argnames=("R_L", "dtype", "lo", "hi"))
def _build_wp_chunk(arrays, Lx, WPx, R_L, dtype, lo, hi):
    sub = {**arrays, "meta": _Static(arrays["meta"].value[lo:hi])}
    with jax.default_matmul_precision("highest"):
        return _build_wp_impl(sub, Lx, WPx, R_L=R_L, dtype=dtype, lo=0,
                              hi=None)


def build_wp(plan: FactorizePlan, Lx, arrays=None):
    """The transformed factor store [Dinv - I; -L21 Dinv] (same layout as
    Lx).  One-time per factorization; chunk-compiled like the factorize
    for plans over CHUNK_RUNS."""
    if arrays is None:
        arrays = device_arrays(plan)
    dtype = jnp.dtype(plan.dtype)
    WPx = jnp.zeros((plan.R_L, LANE), dtype=dtype)
    meta = arrays["meta"].value
    if len(meta) <= CHUNK_RUNS:
        return _build_wp_chunk(arrays, Lx, WPx, plan.R_L, dtype, 0,
                               len(meta))
    for lo, hi in _chunk_boundaries(meta):
        WPx = _build_wp_chunk(arrays, Lx, WPx, plan.R_L, dtype, lo, hi)
    return WPx


# ---------------------------------------------------------------------------
# The sweeps


def _ystep(Y, b, yp, WPx, *, R_L, dtype, slab, aligned, forward):
    w_pad = b.w_pad
    WP = gather_panels(WPx, b, R_L, aligned=aligned, slab=slab)
    if forward:
        v = jnp.take(Y, yp[:, :w_pad], axis=0, mode="fill", fill_value=0)
        zu = jnp.einsum("bmw,bwk->bmk", WP, v,
                        preferred_element_type=dtype)
        return Y.at[yp].add(zu, mode="drop")
    v = jnp.take(Y, yp, axis=0, mode="fill", fill_value=0)
    xz = jnp.einsum("bmw,bmk->bwk", WP, v, preferred_element_type=dtype)
    return Y.at[yp[:, :w_pad]].add(xz, mode="drop")


def _ysweep_impl(arrays, ybuf, ymeta, WPx, Y, *, R_L, dtype, forward):
    items = []
    for run, (yofs, yshape) in zip(iter_runs(arrays), ymeta):
        kind, rb, _u, _wm, _rc, slab, al = run
        size = int(np.prod(yshape))
        yp = jax.lax.slice(ybuf, (yofs,), (yofs + size,)).reshape(yshape)
        items.append((kind, rb, yp, slab, al))
    if not forward:
        items.reverse()
    for kind, rb, yp, slab, al in items:
        if kind == "single":
            Y = _ystep(Y, rb, yp, WPx, R_L=R_L, dtype=dtype, slab=slab,
                       aligned=al, forward=forward)
        else:
            Y = jax.lax.scan(
                lambda c, t, slab=slab, al=al: (
                    _ystep(c, t[0], t[1], WPx, R_L=R_L, dtype=dtype,
                           slab=slab, aligned=al, forward=forward), 0),
                Y, (rb, yp), reverse=not forward,
            )[0]
    return Y


@functools.partial(
    jax.jit, static_argnames=("R_L", "dtype", "lo", "hi", "forward"))
def _ysweep_chunk(arrays, ybundle, WPx, Y, R_L, dtype, lo, hi, forward):
    sub = {**arrays, "meta": _Static(arrays["meta"].value[lo:hi])}
    ymeta = ybundle["meta"].value[lo:hi]
    with jax.default_matmul_precision("highest"):
        return _ysweep_impl(sub, ybundle["buf"], ymeta, WPx, Y, R_L=R_L,
                            dtype=dtype, forward=forward)


@functools.partial(jax.jit, static_argnames=("dtype",))
def _yinit(ybundle, bp, d, dtype):
    """Permute + equilibrate + scatter the RHS block into canonical rows:
    Y = bp_ext[yinv] (one row gather; dead rows read the zero pad row).
    The host ships only [n, kb]; lane padding to the sweeps' 128 happens
    HERE — the axon tunnel makes a [n, 128] host upload the dominant
    cost of a small-k solve otherwise (round-5 measurement)."""
    bp = jnp.take(bp, ybundle["perm"], axis=0)
    bpd = (bp * d[:, None]).astype(dtype)
    kb = bp.shape[1]
    if kb < LANE:
        bpd = jnp.pad(bpd, ((0, 0), (0, LANE - kb)))
    bpx = jnp.concatenate([bpd, jnp.zeros((1, LANE), dtype)], axis=0)
    return jnp.take(bpx, ybundle["yinv"], axis=0)


@functools.partial(jax.jit, static_argnames=("dtype", "kb"))
def _yfinish(ybundle, Y, d, dtype, kb):
    x = jnp.take(Y, ybundle["yof"], axis=0)[:, :kb] * d[:, None]
    return jnp.take(x, ybundle["iperm"], axis=0)


# ---------------------------------------------------------------------------
# Public entry


def build_context(plan: FactorizePlan, Lx, arrays=None) -> dict:
    """Device context for the store-row solve: the WP store + grids."""
    if arrays is None:
        arrays = device_arrays(plan)
    ybuf, ymeta, yof, yinv = build_ygrids(plan)
    return {
        "wp": build_wp(plan, Lx, arrays),
        "buf": jnp.asarray(ybuf),
        "meta": _Static(ymeta),
        "yof": jnp.asarray(yof),
        "yinv": jnp.asarray(yinv),
        "iperm": arrays["iperm"],
        "perm": arrays["perm"],
    }


def solve_rows(plan: FactorizePlan, rhs, *, ctx, d=None, arrays=None):
    """Solve A x = rhs (1-D or [n, k]) through the store-row path.

    ``ctx`` comes from build_context (holds the WP store, so Lx itself is
    not needed).  k > 128 right-hand sides run in 128-lane blocks; the
    compiled sweeps are k-independent.
    """
    if arrays is None:
        arrays = device_arrays(plan)
    dtype = jnp.dtype(plan.dtype)
    if d is None:
        d = jnp.ones((plan.n,), dtype=dtype)
    rhs = np.asarray(rhs)
    squeeze = rhs.ndim == 1
    R = np.ascontiguousarray(rhs.reshape(plan.n, -1), dtype=plan.dtype)
    k = R.shape[1]
    meta = arrays["meta"].value
    bounds = ([(0, len(meta))] if len(meta) <= CHUNK_RUNS
              else list(_chunk_boundaries(meta)))
    outs = []
    for k0 in range(0, k, LANE):
        kb = min(LANE, k - k0)
        # pad kb to a power-of-two tier: the init/finish programs are
        # kb-static (host<->device traffic is [n, kb_pad]), the sweeps
        # are k-independent (128 lanes)
        kb_pad = 1 << max(0, (kb - 1).bit_length())
        bp = R[:, k0 : k0 + kb]
        if kb_pad > kb:
            bp = np.pad(bp, ((0, 0), (0, kb_pad - kb)))
        Y = _yinit(ctx, jnp.asarray(bp), d, dtype)
        for lo, hi in bounds:
            Y = _ysweep_chunk(arrays, ctx, ctx["wp"], Y, plan.R_L, dtype,
                              lo, hi, True)
        for lo, hi in reversed(bounds):
            Y = _ysweep_chunk(arrays, ctx, ctx["wp"], Y, plan.R_L, dtype,
                              lo, hi, False)
        x = _yfinish(ctx, Y, d, dtype, kb_pad)
        outs.append(np.asarray(x)[:, :kb])
    out = outs[0] if len(outs) == 1 else np.concatenate(outs, axis=1)
    return out[:, 0] if squeeze else out
