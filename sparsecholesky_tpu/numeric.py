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
  * panel factorize = batched dense Cholesky of the w_pad x w_pad diagonal
    block (MXU via XLA, or the fused Pallas kernel in ops/panel_chol.py)
    + batched triangular solve for the below-block;
  * trailing update = one batched SYRK (pure MXU matmul) + one
    deterministic scatter-add, replacing the reference's racy sparse
    ``apply_update`` (SURVEY.md §2c item 5);
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
    gather_idx: jax.Array
    scatter_idx: jax.Array
    update_idx: jax.Array | None
    col_idx: jax.Array
    below_idx: jax.Array

    def tree_flatten(self):
        children = (
            self.gather_idx,
            self.scatter_idx,
            self.update_idx,
            self.col_idx,
            self.below_idx,
        )
        return children, None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


jax.tree_util.register_pytree_node(
    _BucketArrays, _BucketArrays.tree_flatten, _BucketArrays.tree_unflatten
)


def device_arrays(plan: FactorizePlan):
    """Upload the plan's index maps once; reuse across factorize/solve calls.

    Sentinels: the plan marks dead slots with -1, but JAX *wraps* negative
    indices in both gather (take mode='fill') and scatter (mode='drop') —
    only indices >= size fill/drop.  So every -1 is rewritten here to the
    out-of-bounds slot N_L + 1 (the buffer has N_L + 1 slots, 0..N_L).
    """
    oob = plan.N_L + 1

    def _ix(idx):
        return jnp.asarray(np.where(idx < 0, oob, idx).astype(np.int32))

    levels = []
    for lev in plan.levels:
        bl = []
        for b in lev:
            bl.append(
                _BucketArrays(
                    gather_idx=_ix(b.gather_idx),
                    scatter_idx=_ix(b.scatter_idx),
                    update_idx=(
                        _ix(b.update_idx) if b.update_idx is not None else None
                    ),
                    col_idx=jnp.asarray(b.col_idx),
                    below_idx=jnp.asarray(b.below_idx),
                )
            )
        levels.append(bl)
    return {
        "levels": levels,
        "init_map": jnp.asarray(plan.init_map.astype(np.int32)),
        "slot_row": jnp.asarray(plan.slot_row.astype(np.int32)),
        "slot_col": jnp.asarray(plan.slot_col.astype(np.int32)),
        "diag_map": jnp.asarray(plan.diag_map.astype(np.int32)),
        "perm": jnp.asarray(plan.perm.astype(np.int32)),
        "iperm": jnp.asarray(plan.iperm.astype(np.int32)),
    }


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


def _factorize_impl(arrays, Ax, *, N_L: int, dtype, backend: str,
                    scale: bool = False):
    """Pure jittable numeric factorization.
    Returns (Lx_ext, minpiv_flat, d) where d is the symmetric Jacobi
    equilibration vector (ones when ``scale`` is off): the factor stored is
    of D A D with D = diag(d), d_i = 1/sqrt(a_ii).  Equilibration keeps
    ill-scaled matrices (the SuiteSparse bcsstk/bus families) factorizable
    in fp32 on the MXU — a capability fp64-only CPU codes like the
    reference never needed.

    Lx_ext has N_L + 1 slots; the last permanently holds 1.0 (gather target
    for padded diagonal positions).
    """
    init_map = arrays["init_map"]
    Ax = Ax.astype(jnp.result_type(Ax.dtype))
    vals64 = jnp.where(init_map >= 0, Ax[jnp.clip(init_map, 0)], 0)
    if scale:
        diag = Ax[arrays["diag_map"]]
        d = jax.lax.rsqrt(jnp.abs(diag))
        vals64 = vals64 * d[arrays["slot_row"]] * d[arrays["slot_col"]]
        d = d.astype(dtype)
    else:
        d = jnp.ones((arrays["diag_map"].shape[0],), dtype=dtype)
    vals = vals64.astype(dtype)
    Lx = jnp.concatenate([vals, jnp.ones((1,), dtype=dtype)])

    minpivs = []
    for buckets in arrays["levels"]:
        level_updates = []
        for b in buckets:
            w_pad = b.gather_idx.shape[2]
            P = jnp.take(Lx, b.gather_idx, mode="fill", fill_value=0)
            L, minpiv = _panel_factor(P, w_pad, backend)
            minpivs.append(minpiv)
            Lx = Lx.at[b.scatter_idx].set(L, mode="drop")
            if b.update_idx is not None:
                L21 = L[:, w_pad:, :]
                C = jnp.einsum(
                    "bik,bjk->bij", L21, L21, preferred_element_type=dtype
                )
                level_updates.append((b.update_idx, C))
        # Schur updates target strictly later levels, so applying them after
        # all panels of this level is equivalent and keeps the adds batched.
        for idx, C in level_updates:
            Lx = Lx.at[idx].add(-C, mode="drop")
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

    Returns (Lx_ext, d): the block-store factor (N_L + 1 slots) of
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


def _diag_inverses_impl(arrays, Lx, *, dtype):
    out = []
    for buckets in arrays["levels"]:
        bl = []
        for b in buckets:
            w_pad = b.gather_idx.shape[2]
            P11 = jnp.take(
                Lx, b.gather_idx[:, :w_pad, :], mode="fill", fill_value=0
            )
            L11 = jnp.tril(P11)
            eye = jnp.broadcast_to(
                jnp.eye(w_pad, dtype=dtype), P11.shape
            )
            inv = jax.lax.linalg.triangular_solve(
                L11, eye, left_side=True, lower=True
            )
            bl.append(inv)
        out.append(bl)
    return out


@functools.partial(jax.jit, static_argnames=("dtype",))
def diag_inverses(arrays, Lx, dtype):
    with jax.default_matmul_precision("highest"):
        return _diag_inverses_impl(arrays, Lx, dtype=dtype)
