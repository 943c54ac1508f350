"""Multi-chip supernodal factorization over a JAX device mesh.

The reference's only parallelism is an OpenMP wavefront within one process
(/root/reference/include/chol.hpp:1424, SURVEY.md §2c); there is no
distributed backend.  This module is the TPU-native scaling story
(BASELINE.json north star): elimination-wavefront parallelism *across
chips* via shard_map over a 1D mesh.

Design (round 1 — replicated factor, sharded work):
  * the block-store factor Lx is replicated on every chip;
  * each wavefront level's supernodes are partitioned across chips
    (host-side, one batch shape per chip);
  * each chip gathers/factors only its own panels and accumulates its
    column results and Schur updates into a local delta over the block
    store; a single psum over the mesh merges the level — the "halo
    exchange" of update panels rides the ICI as one fused collective;
  * set-as-add trick: a chip that factors a supernode contributes
    (L_new - current) at the column slots, so the psum result is exactly
    the new factor state — deterministic, race-free by construction
    (contrast with the reference's racy apply_update, SURVEY.md §2c).

Dead-lane padding: per level each chip gets the same batch shape; chips
with fewer supernodes get "dead" panels with w = mb = 0, whose affine
gather assembles the identity (factorizes to itself, contributes zero
delta, pivot 1).
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..plan import FactorizePlan
from ..errors import NotPositiveDefiniteError
from ..numeric import (
    _BucketArrays,
    _initial_values,
    _panel_factor,
    apply_schur_update,
    panel_indices,
)


# ---------------------------------------------------------------------------
# Host-side plan sharding


def shard_plan(plan: FactorizePlan, ndev: int):
    """Partition every level's buckets across ndev devices.

    Returns the same nested levels/buckets structure with a leading device
    axis on every per-supernode array: off [ndev, Bd], col_idx
    [ndev, Bd, w_pad], ...  Assignment: supernodes of a bucket are dealt
    round-robin — within a bucket all panels cost the same (same padded
    shape), so round-robin is flop-balanced.
    """

    levels = []
    for lev in plan.levels:
        bl = []
        for b in lev:
            B = b.batch
            Bd = -(-B // ndev)
            pad = Bd * ndev - B

            def _expand(arr, fill):
                if arr is None:
                    return None
                if pad:
                    dead = np.full((pad,) + arr.shape[1:], fill, arr.dtype)
                    arr = np.concatenate([arr, dead], axis=0)
                return jnp.asarray(arr.reshape(ndev, Bd, *arr.shape[1:]))

            bl.append(
                _BucketArrays(
                    off=_expand(b.off, 0),
                    w=_expand(b.w, 0),       # dead panel: w = mb = 0
                    mb=_expand(b.mb, 0),
                    col_idx=_expand(b.col_idx, -1),
                    below_idx=_expand(b.below_idx, -1),
                    ucolbase=_expand(b.ucolbase, 0),
                    utw=_expand(b.utw, 1),
                    ug=_expand(b.ug, 0),
                    up=_expand(b.up, 0),
                )
            )
        levels.append(bl)
    return {
        "levels": levels,
        "entry_slot": jnp.asarray(plan.entry_slot.astype(np.int32)),
        "entry_plo": jnp.asarray(plan.entry_plo.astype(np.int32)),
        "entry_phi": jnp.asarray(plan.entry_phi.astype(np.int32)),
        "diag_map": jnp.asarray(plan.diag_map.astype(np.int32)),
        "perm": jnp.asarray(plan.perm.astype(np.int32)),
        "iperm": jnp.asarray(plan.iperm.astype(np.int32)),
    }


# ---------------------------------------------------------------------------
# Device-side sharded factorize


def _sharded_factorize_body(arrays, Ax, *, N_L, dtype, axis: str, scale: bool):
    """Runs per device inside shard_map; bucket arrays arrive device-local
    (leading device axis of size 1 under the sharding)."""
    Lx, d = _initial_values(arrays, Ax, N_L=N_L, dtype=dtype, scale=scale)

    minpivs = []
    for buckets in arrays["levels"]:
        delta = jnp.zeros_like(Lx)
        for b in buckets:
            bl = b.index_leading(0)
            gidx, sidx = panel_indices(
                bl, N_L, w_pad=bl.w_pad, mb_pad=bl.mb_pad
            )
            Pn = jnp.take(Lx, gidx, mode="fill", fill_value=0)
            L, piv = _panel_factor(Pn, bl.w_pad, "xla")
            minpivs.append(piv)
            # set-as-add: scatter slots currently hold Pn's values
            delta = delta.at[sidx].add(L - Pn, mode="drop")
            if bl.mb_pad:
                delta = apply_schur_update(
                    delta, bl, L[:, bl.w_pad:, :], N_L, dtype
                )
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
    # everything else (entry/diag maps, Ax, Lx) is replicated
    in_specs = (
        {
            "levels": jax.tree.map(lambda _: P(axis), arrays["levels"]),
            "entry_slot": P(),
            "entry_plo": P(),
            "entry_phi": P(),
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
