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


def _panel_kernel(p_ref, l_ref, piv_ref, *, w_pad: int, m_pad: int):
    A0 = p_ref[0]
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (1, w_pad), 1)

    def body(j, carry):
        A, minpiv = carry
        colj = jax.lax.dynamic_slice(A, (0, j), (m_pad, 1))        # [m, 1]
        piv = jax.lax.dynamic_slice(colj, (j, 0), (1, 1))[0, 0]
        minpiv = jnp.minimum(minpiv, piv)
        inv = jax.lax.rsqrt(jnp.where(piv > 0, piv, 1.0))
        Lcol = colj * inv                                           # [m, 1]
        u = jax.lax.slice(Lcol, (0, 0), (w_pad, 1))                 # [w, 1]
        mask = (col_ids > j).astype(A.dtype)                        # [1, w]
        A = A - Lcol * (jnp.transpose(u) * mask)                    # rank-1
        A = jax.lax.dynamic_update_slice(A, Lcol, (0, j))
        return A, minpiv

    A, minpiv = jax.lax.fori_loop(
        0, w_pad, body, (A0, jnp.asarray(jnp.inf, A0.dtype))
    )
    l_ref[0] = A
    piv_ref[0, 0] = minpiv


@functools.partial(jax.jit, static_argnames=("w_pad", "interpret"))
def panel_cholesky(P: jax.Array, w_pad: int, *, interpret: bool | None = None):
    """Batched fused panel LLT+TRSM.

    P: [B, w_pad + mb_pad, w_pad] assembled panels (identity-padded).
    Returns (L, minpiv[B]).
    """
    B, m_pad, w = P.shape
    assert w == w_pad
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    kernel = functools.partial(_panel_kernel, w_pad=w_pad, m_pad=m_pad)
    flops = B * (w_pad * w_pad * (w_pad // 3 + (m_pad - w_pad)))
    L, piv = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec(
                (1, m_pad, w_pad), lambda b: (b, 0, 0), memory_space=pltpu.VMEM
            )
        ],
        out_specs=(
            pl.BlockSpec(
                (1, m_pad, w_pad), lambda b: (b, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((1, 1), lambda b: (b, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct(P.shape, P.dtype),
            jax.ShapeDtypeStruct((B, 1), P.dtype),
        ),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=2 * P.size * P.dtype.itemsize,
            transcendentals=B * w_pad,
        ),
        interpret=interpret,
    )(P)
    return L, piv[:, 0]
