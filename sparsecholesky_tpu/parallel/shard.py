"""Multi-chip supernodal factorization over a JAX device mesh.

The reference's only parallelism is an OpenMP wavefront within one process
(/root/reference/include/chol.hpp:1424, SURVEY.md §2c); there is no
distributed backend.  This module is the TPU-native scaling story
(BASELINE.json north star): elimination-wavefront parallelism *across
chips* via shard_map over a 1D mesh.

Design (round 1 — replicated factor, sharded work):
  * the block-store factor Lx is replicated on every chip;
  * each wavefront level's supernodes are partitioned across chips
    (host-side, load-balanced by padded flops);
  * each chip gathers/factors only its own panels and accumulates its
    column results and Schur updates into a local delta over the block
    store; a single psum over the mesh merges the level — the "halo
    exchange" of update panels rides the ICI as one fused collective;
  * set-as-add trick: a chip that factors a supernode contributes
    (L_new - current) at the column slots, so the psum result is exactly
    the new factor state — deterministic, race-free by construction
    (contrast with the reference's racy apply_update, SURVEY.md §2c).

Dead-lane padding: per level each chip gets the same batch shape; chips
with fewer supernodes get "dead" panels whose gather map assembles the
identity (factorizes to itself, contributes zero delta, pivot 1).
"""

from __future__ import annotations

import dataclasses
import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..plan import FactorizePlan, Bucket
from ..errors import NotPositiveDefiniteError


# ---------------------------------------------------------------------------
# Host-side plan sharding


def _dead_bucket_rows(w_pad, mb_pad, N_L):
    """Gather/scatter rows for a dead (identity) panel."""
    m_pad = w_pad + mb_pad
    gather = np.full((m_pad, w_pad), -1, dtype=np.int64)
    for i in range(w_pad):
        gather[i, i] = N_L  # ones slot -> identity diagonal
    scatter = np.full((m_pad, w_pad), -1, dtype=np.int64)
    return gather, scatter


def shard_plan(plan: FactorizePlan, ndev: int):
    """Partition every level's buckets across ndev devices.

    Returns the same nested levels/buckets structure with a leading device
    axis on every index array: gather [ndev, Bd, m_pad, w_pad] etc.
    Assignment: supernodes of a bucket are dealt round-robin after sorting
    levels' buckets — within a bucket all panels cost the same (same padded
    shape), so round-robin is flop-balanced.
    """
    oob = plan.N_L + 1

    def _ix(idx):
        return jnp.asarray(np.where(idx < 0, oob, idx).astype(np.int32))

    levels = []
    for lev in plan.levels:
        bl = []
        for b in lev:
            B = b.batch
            Bd = -(-B // ndev)
            total = Bd * ndev
            pad = total - B

            def _expand(arr, dead_row):
                if pad:
                    dead = np.broadcast_to(
                        dead_row, (pad,) + arr.shape[1:]
                    )
                    arr = np.concatenate([arr, dead], axis=0)
                return arr.reshape(ndev, Bd, *arr.shape[1:])

            g_dead, s_dead = _dead_bucket_rows(b.w_pad, b.mb_pad, plan.N_L)
            gather = _expand(b.gather_idx, g_dead)
            scatter = _expand(b.scatter_idx, s_dead)
            update = (
                _expand(b.update_idx, np.full((b.mb_pad, b.mb_pad), -1))
                if b.update_idx is not None
                else None
            )
            col_idx = _expand(b.col_idx, np.full((b.w_pad,), -1))
            below_idx = (
                _expand(b.below_idx, np.full((b.mb_pad,), -1))
                if b.mb_pad
                else np.zeros((ndev, Bd, 0), dtype=np.int64)
            )
            bl.append(
                dict(
                    gather_idx=_ix(gather),
                    scatter_idx=_ix(scatter),
                    update_idx=_ix(update) if update is not None else None,
                    col_idx=jnp.asarray(col_idx.astype(np.int32)),
                    below_idx=jnp.asarray(below_idx.astype(np.int32)),
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
# Device-side sharded factorize


def _sharded_factorize_body(arrays, Ax, *, N_L, dtype, axis: str, scale: bool):
    """Runs per device inside shard_map; index arrays arrive device-local
    (leading device axis stripped to size 1 by the sharding)."""
    from ..numeric import _panel_factor

    init_map = arrays["init_map"]
    vals = jnp.where(init_map >= 0, Ax[jnp.clip(init_map, 0)], 0)
    if scale:
        diag = Ax[arrays["diag_map"]]
        d = jax.lax.rsqrt(jnp.abs(diag))
        vals = vals * d[arrays["slot_row"]] * d[arrays["slot_col"]]
        d = d.astype(dtype)
    else:
        d = jnp.ones((arrays["diag_map"].shape[0],), dtype=dtype)
    vals = vals.astype(dtype)
    Lx = jnp.concatenate([vals, jnp.ones((1,), dtype=dtype)])

    minpivs = []
    for buckets in arrays["levels"]:
        delta = jnp.zeros_like(Lx)
        for b in buckets:
            gidx = b["gather_idx"][0]
            sidx = b["scatter_idx"][0]
            w_pad = gidx.shape[-1]
            Pn = jnp.take(Lx, gidx, mode="fill", fill_value=0)
            L, piv = _panel_factor(Pn, w_pad, "xla")
            minpivs.append(piv)
            # set-as-add: scatter slots currently hold Pn's values
            delta = delta.at[sidx].add(L - Pn, mode="drop")
            if b["update_idx"] is not None:
                L21 = L[:, w_pad:, :]
                C = jnp.einsum("bik,bjk->bij", L21, L21,
                               preferred_element_type=dtype)
                delta = delta.at[b["update_idx"][0]].add(-C, mode="drop")
        delta = jax.lax.psum(delta, axis)
        # the ones slot must stay exactly 1.0 (dead panels scatter nothing,
        # but numerical noise must not accumulate there)
        delta = delta.at[N_L].set(0.0)
        Lx = Lx + delta
    minpiv_flat = (
        jnp.concatenate(minpivs) if minpivs else jnp.zeros((0,), dtype=dtype)
    )
    return Lx, minpiv_flat, d


def factorize_sharded(plan: FactorizePlan, Ax, mesh: Mesh, *, arrays=None,
                      scale: bool = False, check: bool = True):
    """Distributed numeric factorization over a 1D mesh.

    Returns (Lx, d): the replicated block-store factor (same contents on
    every device, identical to the single-chip result up to float summation
    order inside psum) and the equilibration vector.
    """
    axis = mesh.axis_names[0]
    ndev = mesh.devices.size
    if arrays is None:
        arrays = shard_plan(plan, ndev)
    dtype = jnp.dtype(plan.dtype)

    # bucket index arrays are sharded over their leading device axis;
    # everything else (init maps, Ax, Lx) is replicated
    in_specs = (
        {
            "levels": jax.tree.map(lambda _: P(axis), arrays["levels"]),
            "init_map": P(),
            "slot_row": P(),
            "slot_col": P(),
            "diag_map": P(),
            "perm": P(),
            "iperm": P(),
        },
        P(),
    )

    body = functools.partial(
        _sharded_factorize_body, N_L=plan.N_L, dtype=dtype, axis=axis,
        scale=scale,
    )
    fn = jax.jit(
        jax.shard_map(
            body,
            mesh=mesh,
            in_specs=in_specs,
            out_specs=(P(), P(axis), P()),
            check_vma=False,
        )
    )
    with jax.default_matmul_precision("highest"):
        Lx, minpiv, d = fn(arrays, jnp.asarray(Ax))
    if check:
        mp = np.asarray(minpiv)
        if mp.size and not (mp > 0).all():
            raise NotPositiveDefiniteError(pivot=float(mp.min()))
    return Lx, d


def make_mesh(ndev: int | None = None, axis: str = "x") -> Mesh:
    devs = jax.devices()
    if ndev is not None:
        devs = devs[:ndev]
    return Mesh(np.array(devs), (axis,))
