"""Numeric supernodal Cholesky on device.

The TPU-native replacement for the reference's numeric layer: the
``chol_sn`` driver (/root/reference/include/chol.hpp:1407-1446), the
``factorize_sn`` BLAS panel triple (dpotrf/dtrsm/dsyrk,
/root/reference/include/chol.hpp:1232-1335) and the ``apply_update``
Schur scatter (/root/reference/include/chol.hpp:1196-1216).

Execution model (see plan.py for the data layout):
  * the wavefront over assembly-tree levels is *traced* — each level is a
    handful of batched ops; within a level all supernodes of one padded
    shape go through a single batched panel factorization;
  * panel gather/scatter index grids are affine in the block store and are
    computed on device from three scalars per supernode (off/w/mb) with
    broadcasted iota — HBM holds only the factor and O(small) plan arrays;
  * panel factorize = batched dense Cholesky of the w_pad x w_pad diagonal
    block (MXU via XLA, or the fused Pallas kernel in ops/panel_chol.py)
    + batched triangular solve for the below-block;
  * trailing update = one batched SYRK (pure MXU matmul) + one
    deterministic scatter-add through the factored update map, replacing
    the reference's racy sparse ``apply_update`` (SURVEY.md §2c item 5);
  * non-positive-definiteness is detected per supernode and reported after
    the (fully static) factorization completes, with supernode id, column
    range and pivot — matching the reference's detailed dpotrf-info message
    (/root/reference/include/chol.hpp:1265-1281).

The whole numeric phase is a pure function of (plan arrays, Ax): calling it
again with new values on the same pattern re-uses the compiled executable —
the schol/chol split of the reference, preserved by construction.
"""

from __future__ import annotations

import dataclasses
import functools

import numpy as np

import jax
import jax.numpy as jnp

from .errors import NotPositiveDefiniteError
from .plan import FactorizePlan

# ---------------------------------------------------------------------------
# Device-side plan arrays (a pytree mirroring the bucket structure)


@dataclasses.dataclass(frozen=True)
class _BucketArrays:
    off: jax.Array          # [B] (or [ndev, B] sharded)
    w: jax.Array
    mb: jax.Array
    col_idx: jax.Array      # [B, w_pad]
    below_idx: jax.Array    # [B, mb_pad]
    ucolbase: jax.Array | None
    utw: jax.Array | None
    ug: jax.Array | None
    up: jax.Array | None    # [B, mb_pad, G_pad]

    def tree_flatten(self):
        return (
            self.off, self.w, self.mb, self.col_idx, self.below_idx,
            self.ucolbase, self.utw, self.ug, self.up,
        ), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @property
    def w_pad(self) -> int:
        return self.col_idx.shape[-1]

    @property
    def mb_pad(self) -> int:
        return self.below_idx.shape[-1]

    def index_leading(self, i):
        """Strip a leading device axis (sharded layouts)."""
        take = lambda a: None if a is None else a[i]
        return _BucketArrays(
            take(self.off), take(self.w), take(self.mb),
            take(self.col_idx), take(self.below_idx),
            take(self.ucolbase), take(self.utw), take(self.ug), take(self.up),
        )


jax.tree_util.register_pytree_node(
    _BucketArrays, _BucketArrays.tree_flatten, _BucketArrays.tree_unflatten
)


@dataclasses.dataclass(frozen=True)
class _Run:
    """One execution step group: kind='single' (one traced step) or
    kind='scan' (stacked same-shape steps run under lax.scan).  ``kind`` is
    pytree aux data, so it stays static under jit."""

    kind: str
    b: _BucketArrays


jax.tree_util.register_pytree_node(
    _Run,
    lambda r: ((r.b,), r.kind),
    lambda kind, children: _Run(kind, children[0]),
)


def _bucket_device(b) -> _BucketArrays:
    return _BucketArrays(
        off=jnp.asarray(b.off),
        w=jnp.asarray(b.w),
        mb=jnp.asarray(b.mb),
        col_idx=jnp.asarray(b.col_idx),
        below_idx=jnp.asarray(b.below_idx),
        ucolbase=None if b.ucolbase is None else jnp.asarray(b.ucolbase),
        utw=None if b.utw is None else jnp.asarray(b.utw),
        ug=None if b.ug is None else jnp.asarray(b.ug),
        up=None if b.up is None else jnp.asarray(b.up),
    )


def _bucket_sig(b) -> tuple:
    """Static shape signature — steps with equal signatures can share one
    compiled scan body."""
    G = 0 if b.up is None else b.up.shape[2]
    return (b.w_pad, b.mb_pad, len(b.sn_ids), G)


def _stack_buckets(bs) -> _BucketArrays:
    def st(get):
        vals = [get(b) for b in bs]
        if vals[0] is None:
            return None
        return jnp.asarray(np.stack(vals, axis=0))

    return _BucketArrays(
        off=st(lambda b: b.off),
        w=st(lambda b: b.w),
        mb=st(lambda b: b.mb),
        col_idx=st(lambda b: b.col_idx),
        below_idx=st(lambda b: b.below_idx),
        ucolbase=st(lambda b: b.ucolbase),
        utw=st(lambda b: b.utw),
        ug=st(lambda b: b.ug),
        up=st(lambda b: b.up),
    )


def build_runs(plan: FactorizePlan):
    """Compress the linear step sequence (levels flattened in order) into
    runs: maximal stretches of identically-shaped buckets become one
    lax.scan over stacked plan arrays, everything else stays a single
    traced step.  The linear order refines the wavefront level order, and
    Schur updates only ever target strict assembly-tree ancestors (strictly
    later levels), so full sequentialization is correct; on one chip XLA
    executes the wavefront sequentially anyway.  This is what keeps the XLA
    program size O(distinct shapes), not O(supernode buckets) — the root
    chain of a large matrix alone contributes hundreds of same-shape steps.
    """
    steps = [b for lev in plan.levels for b in lev]
    runs = []
    i = 0
    while i < len(steps):
        sig = _bucket_sig(steps[i])
        j = i + 1
        while j < len(steps) and _bucket_sig(steps[j]) == sig:
            j += 1
        if j - i >= 2:
            runs.append(_Run("scan", _stack_buckets(steps[i:j])))
        else:
            runs.append(_Run("single", _bucket_device(steps[i])))
        i = j
    return runs


def device_arrays(plan: FactorizePlan):
    """Upload the plan's index maps once; reuse across factorize/solve calls."""
    return {
        "runs": build_runs(plan),
        "entry_slot": jnp.asarray(plan.entry_slot.astype(np.int32)),
        "entry_plo": jnp.asarray(plan.entry_plo.astype(np.int32)),
        "entry_phi": jnp.asarray(plan.entry_phi.astype(np.int32)),
        "diag_map": jnp.asarray(plan.diag_map.astype(np.int32)),
        "perm": jnp.asarray(plan.perm.astype(np.int32)),
        "iperm": jnp.asarray(plan.iperm.astype(np.int32)),
    }


# ---------------------------------------------------------------------------
# Affine panel index grids (device-computed; see plan.py layout)


def panel_indices(b: _BucketArrays, N_L: int, *, w_pad: int, mb_pad: int):
    """(gather_idx, scatter_idx) int32[B, w_pad+mb_pad, w_pad] for a bucket.

    Gather: diagonal-block rows map to slot off + i*w + j, identity-padding
    rows map to the permanent ones slot N_L, everything else to the
    out-of-bounds slot (reads 0 via mode='fill', drops via mode='drop').
    Scatter: same affine slots for valid positions only (identity rows
    dropped).  The strict-upper slots of the diagonal block ARE written —
    they are meaningless scratch that every reader masks with tril, which
    lets kernels stash per-panel scalars there (ops/panel_chol.py).
    """
    m_pad = w_pad + mb_pad
    ii = jax.lax.broadcasted_iota(jnp.int32, (1, m_pad, 1), 1)
    jj = jax.lax.broadcasted_iota(jnp.int32, (1, 1, w_pad), 2)
    offb = b.off[:, None, None]
    wb = b.w[:, None, None]
    mbb = b.mb[:, None, None]
    r = jnp.where(ii < w_pad, ii, ii - w_pad + wb)
    valid = (jj < wb) & ((ii < wb) | ((ii >= w_pad) & (ii - w_pad < mbb)))
    slot = offb + r * wb + jj
    ident = (ii >= wb) & (ii < w_pad) & (jj == ii)
    oob = jnp.int32(N_L + 1)
    gidx = jnp.where(valid, slot, jnp.where(ident, jnp.int32(N_L), oob))
    sidx = jnp.where(valid, slot, oob)
    return gidx, sidx


def update_indices(b: _BucketArrays, N_L: int, i0=0, i1=None, j0=0, j1=None):
    """int32[B, i1-i0, j1-j0] Schur-update target slots for the given tile
    of the below-rows clique (lower triangle; everything else
    out-of-bounds -> dropped)."""
    mb_pad = b.mb_pad
    i1 = mb_pad if i1 is None else i1
    j1 = mb_pad if j1 is None else j1
    pos = jnp.take_along_axis(
        b.up[:, i0:i1, :], b.ug[:, None, j0:j1], axis=2
    )  # [B, i, j]
    idx = b.ucolbase[:, None, j0:j1] + pos * b.utw[:, None, j0:j1]
    ii = i0 + jax.lax.broadcasted_iota(jnp.int32, (1, i1 - i0, 1), 1)
    jj = j0 + jax.lax.broadcasted_iota(jnp.int32, (1, 1, j1 - j0), 2)
    mbb = b.mb[:, None, None]
    valid = (ii >= jj) & (ii < mbb) & (jj < mbb)
    return jnp.where(valid, idx, jnp.int32(N_L + 1))


# Tile edge for Schur updates: below-blocks taller than this are updated in
# (ti >= tj) tile pairs, bounding transient memory to B*UPDATE_TILE^2 and
# skipping the strictly-upper half of the symmetric product.
UPDATE_TILE = 2048


def apply_schur_update(Lx, b: _BucketArrays, L21, N_L: int, dtype):
    """Lx -= scatter(L21 @ L21^T) over the bucket's update map (tiled)."""
    mb_pad = b.mb_pad
    if mb_pad <= UPDATE_TILE:
        C = jnp.einsum("bik,bjk->bij", L21, L21, preferred_element_type=dtype)
        return Lx.at[update_indices(b, N_L)].add(-C, mode="drop")
    ntile = -(-mb_pad // UPDATE_TILE)
    for ti in range(ntile):
        i0, i1 = ti * UPDATE_TILE, min(mb_pad, (ti + 1) * UPDATE_TILE)
        for tj in range(ti + 1):
            j0, j1 = tj * UPDATE_TILE, min(mb_pad, (tj + 1) * UPDATE_TILE)
            C = jnp.einsum(
                "bik,bjk->bij", L21[:, i0:i1], L21[:, j0:j1],
                preferred_element_type=dtype,
            )
            idx = update_indices(b, N_L, i0, i1, j0, j1)
            Lx = Lx.at[idx].add(-C, mode="drop")
    return Lx


def gather_panels(Lx, b: _BucketArrays, N_L: int):
    gidx, _ = panel_indices(b, N_L, w_pad=b.w_pad, mb_pad=b.mb_pad)
    return jnp.take(Lx, gidx, mode="fill", fill_value=0)


# ---------------------------------------------------------------------------
# Panel factorization backends


def _panel_factor_xla(P: jax.Array, w_pad: int):
    """Batched panel factorize via XLA's native Cholesky + triangular solve.

    P: [B, w_pad + mb_pad, w_pad] assembled panels (identity-padded).
    Returns (L_panel [same shape], minpiv [B]).
    """
    P11 = P[:, :w_pad, :]
    # symmetrize the lower-stored diagonal block (upper slots gather as 0)
    P11 = jnp.tril(P11) + jnp.swapaxes(jnp.tril(P11, -1), -1, -2)
    L11 = jnp.linalg.cholesky(P11)
    # XLA cholesky yields NaN rows on non-PD input; surface via min diag.
    diag = jnp.diagonal(L11, axis1=-2, axis2=-1)
    minpiv = jnp.min(jnp.where(jnp.isnan(diag), -jnp.inf, diag), axis=-1)
    L11 = jnp.where(jnp.isnan(L11), 0.0, L11)
    if P.shape[1] > w_pad:
        P21 = P[:, w_pad:, :]
        # L21 = P21 * L11^{-T}  (right-solve against the lower factor),
        # the reference's cblas_dtrsm Right/Lower/Trans call
        # (/root/reference/include/chol.hpp:1292).
        L21 = jax.lax.linalg.triangular_solve(
            L11, P21, left_side=False, lower=True, transpose_a=True
        )
        L = jnp.concatenate([L11, L21], axis=1)
    else:
        L = L11
    return L, minpiv


def _panel_factor_fused(P: jax.Array, w_pad: int):
    """Fused panel LLT+TRSM as one batched XLA fori_loop (the same
    tall-panel right-looking column algorithm as the Pallas kernel in
    ops/panel_chol.py, expressed on values).  One while-loop per bucket
    instead of XLA's cholesky loop + triangular-solve loop, and the below
    block is eliminated in the same pass.
    """
    B, m_pad, w = P.shape
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (1, 1, w_pad), 2)

    def body(j, carry):
        A, minpiv = carry
        colj = jax.lax.dynamic_slice(A, (0, 0, j), (B, m_pad, 1))   # [B,m,1]
        piv = jax.lax.dynamic_slice(colj, (0, j, 0), (B, 1, 1))     # [B,1,1]
        minpiv = jnp.minimum(minpiv, piv[:, 0, 0])
        inv = jax.lax.rsqrt(jnp.where(piv > 0, piv, 1.0))
        Lcol = colj * inv                                           # [B,m,1]
        u = jnp.swapaxes(Lcol[:, :w_pad, :], 1, 2)                  # [B,1,w]
        mask = (col_ids > j).astype(A.dtype)
        A = A - Lcol * (u * mask)                                   # rank-1
        A = jax.lax.dynamic_update_slice(A, Lcol, (0, 0, j))
        return A, minpiv

    A, minpiv = jax.lax.fori_loop(
        0, w_pad, body, (P, jnp.full((B,), jnp.inf, P.dtype))
    )
    return A, minpiv


def _panel_factor(P, w_pad, backend: str):
    if backend == "pallas":
        from .ops.panel_chol import panel_cholesky

        return panel_cholesky(P, w_pad)
    if backend == "fused":
        return _panel_factor_fused(P, w_pad)
    return _panel_factor_xla(P, w_pad)


# ---------------------------------------------------------------------------
# Factorization driver


def _initial_values(arrays, Ax, *, N_L: int, dtype, scale: bool):
    """Scatter A's entries into the zero block store; returns (Lx, d).
    Lx has N_L + 1 slots: N_L real plus the permanent-one slot N_L.  Masked
    positions use index N_L + 1, which is OUT OF BOUNDS by construction:
    gathers fill 0 (mode='fill'), scatters drop (mode='drop')."""
    if scale:
        diag = Ax[arrays["diag_map"]]
        d = jax.lax.rsqrt(jnp.abs(diag))
        vals = Ax * d[arrays["entry_plo"]] * d[arrays["entry_phi"]]
        d = d.astype(dtype)
    else:
        d = jnp.ones((arrays["diag_map"].shape[0],), dtype=dtype)
        vals = Ax
    vals = vals.astype(dtype)
    Lx = jnp.zeros((N_L + 1,), dtype=dtype)
    Lx = Lx.at[N_L].set(1.0)
    Lx = Lx.at[arrays["entry_slot"]].add(vals, mode="drop")
    return Lx, d


def _factorize_impl(arrays, Ax, *, N_L: int, dtype, backend: str,
                    scale: bool = False):
    """Pure jittable numeric factorization.
    Returns (Lx, minpiv_flat, d) where d is the symmetric Jacobi
    equilibration vector (ones when ``scale`` is off): the factor stored is
    of D A D with D = diag(d), d_i = 1/sqrt(a_ii).  Equilibration keeps
    ill-scaled matrices (the SuiteSparse bcsstk/bus families) factorizable
    in fp32 on the MXU — a capability fp64-only CPU codes like the
    reference never needed.
    """
    Ax = Ax.astype(jnp.result_type(Ax.dtype))
    Lx, d = _initial_values(arrays, Ax, N_L=N_L, dtype=dtype, scale=scale)

    def step(Lx, b):
        w_pad, mb_pad = b.w_pad, b.mb_pad
        gidx, sidx = panel_indices(b, N_L, w_pad=w_pad, mb_pad=mb_pad)
        P = jnp.take(Lx, gidx, mode="fill", fill_value=0)
        L, minpiv = _panel_factor(P, w_pad, backend)
        Lx = Lx.at[sidx].set(L, mode="drop")
        if mb_pad:
            # Schur updates target strictly later levels (assembly-tree
            # ancestors), never a peer, so immediate application is safe.
            Lx = apply_schur_update(Lx, b, L[:, w_pad:, :], N_L, dtype)
        return Lx, minpiv

    minpivs = []
    for r in arrays["runs"]:
        if r.kind == "single":
            Lx, mp = step(Lx, r.b)
            minpivs.append(mp)
        else:
            Lx, mps = jax.lax.scan(step, Lx, r.b)
            minpivs.append(mps.reshape(-1))
    minpiv_flat = (
        jnp.concatenate(minpivs) if minpivs else jnp.zeros((0,), dtype=dtype)
    )
    return Lx, minpiv_flat, d


@functools.partial(
    jax.jit, static_argnames=("N_L", "dtype", "backend", "scale")
)
def _factorize_jit(arrays, Ax, N_L, dtype, backend, scale):
    # TPU matmuls default to bfloat16 passes; the SYRK / dense-cholesky /
    # triangular-solve chain needs true fp32 accumulation or equilibrated
    # fp32 factorizations lose ~3 decimal digits and ill-conditioned
    # matrices go non-PD.
    with jax.default_matmul_precision("highest"):
        return _factorize_impl(
            arrays, Ax, N_L=N_L, dtype=dtype, backend=backend, scale=scale
        )


def factorize(
    plan: FactorizePlan,
    Ax,
    *,
    arrays=None,
    backend: str = "xla",
    scale: bool = False,
    check: bool = True,
):
    """Numeric factorization of the matrix whose values are Ax (on the
    pattern/permutation the plan was compiled for).

    Returns (Lx, d): the block-store factor (N_L + 1 slots) of
    D A D and the equilibration vector d (ones when scale is off).
    Raises NotPositiveDefiniteError (with supernode id / column range /
    pivot) if ``check`` and a non-positive pivot occurred.
    """
    if arrays is None:
        arrays = device_arrays(plan)
    dtype = jnp.dtype(plan.dtype)
    Lx, minpiv, d = _factorize_jit(
        arrays, jnp.asarray(Ax), plan.N_L, dtype, backend, scale
    )
    if check:
        mp = np.asarray(minpiv)
        if mp.size and not (mp > 0).all():
            sn_order = np.concatenate(
                [b.sn_ids for lev in plan.levels for b in lev]
            )
            bad = int(np.argmax(mp <= 0))
            s = int(sn_order[bad])
            raise NotPositiveDefiniteError(
                supernode=s,
                column_range=(int(plan.S.sn_ptr[s]), int(plan.S.sn_ptr[s + 1])),
                pivot=float(mp[bad]),
            )
    return Lx, d


# ---------------------------------------------------------------------------
# Refactorization helper: same plan, new values — the reference's
# schol/chol split (symbolic reuse) as a first-class operation.


def refactorize(plan: FactorizePlan, Ax, arrays, **kw):
    return factorize(plan, Ax, arrays=arrays, **kw)


# ---------------------------------------------------------------------------
# Diagonal-block inverses: one-time cost that turns every SpTRSV level into
# pure MXU matmuls (no loop-lowered triangular solves on the hot path).


def _diag_inverses_impl(arrays, Lx, *, N_L: int, dtype):
    def one(b):
        w_pad = b.w_pad
        gidx, _ = panel_indices(b, N_L, w_pad=w_pad, mb_pad=0)
        P11 = jnp.take(Lx, gidx, mode="fill", fill_value=0)
        L11 = jnp.tril(P11)
        eye = jnp.broadcast_to(jnp.eye(w_pad, dtype=dtype), P11.shape)
        return jax.lax.linalg.triangular_solve(
            L11, eye, left_side=True, lower=True
        )

    out = []
    for r in arrays["runs"]:
        if r.kind == "single":
            out.append(one(r.b))
        else:
            out.append(jax.lax.scan(lambda c, b: (c, one(b)), 0, r.b)[1])
    return out


@functools.partial(jax.jit, static_argnames=("N_L", "dtype"))
def diag_inverses(arrays, Lx, N_L, dtype):
    with jax.default_matmul_precision("highest"):
        return _diag_inverses_impl(arrays, Lx, N_L=N_L, dtype=dtype)
