"""Fused supernode panel factorization kernel (Pallas, TPU).

TPU-native replacement for the reference's BLAS panel triple
``factorize_sn`` (/root/reference/include/chol.hpp:1232-1335): one kernel
fuses the dpotrf of the w x w diagonal block and the dtrsm of the mb x w
below-block by running the classic tall-panel right-looking column
Cholesky over the whole (w_pad + mb_pad) x w_pad panel in VMEM:

    for j in 0..w_pad:
        piv   = P[j, j]
        Lcol  = P[:, j] * rsqrt(piv)          # scales diag AND below rows
        P    -= Lcol * Lcol[:w_pad]^T  (columns > j only)
        P[:, j] = Lcol

Identity padding (plan.py) makes the loop maskless w.r.t. the real sizes:
padded columns are e_j with unit pivot and zero multipliers, padded rows
are zero.  Non-positive pivots are clamped (pivot -> 1) so the kernel is
total; the minimum pivot per panel is returned for the host-side non-PD
check, mirroring the reference's dpotrf info decoding
(/root/reference/include/chol.hpp:1265-1281).

The trailing SYRK stays outside the kernel: it is a plain batched matmul
the MXU/XLA already executes at speed of light.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _panel_kernel(p_ref, l_ref, *, w_pad: int, m_pad: int):
    # Mosaic cannot dynamic-slice register values, so the working panel
    # lives in the output VMEM ref and per-column access goes through
    # ref indexing with pl.ds.
    l_ref[0] = p_ref[0]
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (1, w_pad), 1)
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (m_pad, 1), 0)

    def body(j, minpiv):
        piv = l_ref[0, pl.ds(j, 1), pl.ds(j, 1)][0, 0]
        minpiv = jnp.minimum(minpiv, piv)
        inv = jax.lax.rsqrt(jnp.where(piv > 0, piv, 1.0))
        colj = l_ref[0, :, pl.ds(j, 1)]                             # [m, 1]
        Lcol = colj * inv
        # the rank-1 multiplier row: u[0, k] = Lcol[k] for k < w_pad.
        # Mosaic handles a (m,1)->(1,m) transpose poorly; build the row by
        # a masked all-to-all broadcast instead: (1,w) = sum_i Lcol[i] δ_{ik}
        u_row = _column_to_row(Lcol, w_pad, m_pad)
        mask = (col_ids > j).astype(Lcol.dtype)                     # [1, w]
        l_ref[0] = l_ref[0] - Lcol * (u_row * mask)                 # rank-1
        l_ref[0, :, pl.ds(j, 1)] = Lcol
        return minpiv

    minpiv = jax.lax.fori_loop(
        0, w_pad, body, jnp.asarray(jnp.inf, p_ref.dtype)
    )
    # Stash minpiv in a structurally dead slot of the panel: (row 0,
    # col w_pad-1) is in the strict upper triangle of the diagonal block,
    # which the plan's scatter map always drops.  (Mosaic cannot store
    # scalars to VMEM and SMEM outputs have blocking restrictions, so a
    # separate scalar output is not practical.)
    row0 = l_ref[0, 0:1, :]
    l_ref[0, 0:1, :] = jnp.where(col_ids == w_pad - 1, minpiv, row0)


def _column_to_row(col, w_pad: int, m_pad: int):
    """(m_pad, 1) column -> (1, w_pad) row holding col[:w_pad].

    Lowered as a tiny MXU matmul with a one-hot matrix: row = colᵀ · I is
    exactly dot(I_wm, col)ᵀ; we use dot_general contracting the m axis:
    row[0, k] = sum_i onehot[i, k] * col[i, 0].
    """
    onehot = (
        jax.lax.broadcasted_iota(jnp.int32, (m_pad, w_pad), 0)
        == jax.lax.broadcasted_iota(jnp.int32, (m_pad, w_pad), 1)
    ).astype(col.dtype)
    return jax.lax.dot_general(
        col, onehot,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=col.dtype,
    )  # [1, w_pad]


@functools.partial(jax.jit, static_argnames=("w_pad", "interpret"))
def panel_cholesky(P: jax.Array, w_pad: int, *, interpret: bool | None = None):
    """Batched fused panel LLT+TRSM.

    P: [B, w_pad + mb_pad, w_pad] assembled panels (identity-padded).
    Returns (L, minpiv[B]).
    """
    B, m_pad, w = P.shape
    assert w == w_pad
    if interpret is None:
        # compile for Mosaic on any real TPU backend (the axon tunnel
        # reports platform "axon", not "tpu"); interpret elsewhere
        interpret = jax.default_backend() not in ("tpu", "axon")

    kernel = functools.partial(_panel_kernel, w_pad=w_pad, m_pad=m_pad)
    flops = B * (w_pad * w_pad * (w_pad // 3 + (m_pad - w_pad)))
    L = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec(
                (1, m_pad, w_pad), lambda b: (b, 0, 0), memory_space=pltpu.VMEM
            )
        ],
        out_specs=pl.BlockSpec(
            (1, m_pad, w_pad), lambda b: (b, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct(P.shape, P.dtype),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=2 * P.size * P.dtype.itemsize,
            transcendentals=B * w_pad,
        ),
        interpret=interpret,
    )(P)
    return L, L[:, 0, w_pad - 1]
