"""Multi-chip supernodal factorization over a JAX device mesh.

The reference's only parallelism is an OpenMP wavefront within one process
(/root/reference/include/chol.hpp:1424, SURVEY.md §2c); there is no
distributed backend.  This module is the TPU-native scaling story
(BASELINE.json north star): elimination-wavefront parallelism *across
chips* via shard_map over a 1D mesh.

Design (round 1 — replicated factor, sharded work):
  * the [R_L, 128] block-store factor is replicated on every chip;
  * each wavefront level's supernodes are partitioned across chips
    (host-side, one batch shape per chip);
  * each chip gathers/factors only its own panels and accumulates its
    column results and Schur updates into a local delta over the block
    store; a single psum over the mesh merges the level — the "halo
    exchange" of update panels rides the ICI as one fused collective;
  * set-as-add trick: a chip that factors a supernode contributes
    (L_new - current) at the panel rows, so the psum result is exactly
    the new factor state — deterministic, race-free by construction
    (contrast with the reference's racy apply_update, SURVEY.md §2c).

Dead-lane padding: per level each chip gets the same batch shape; chips
with fewer supernodes get "dead" panels with w = mb = 0, whose gather
assembles the identity (factorizes to itself, contributes zero delta,
pivot 1).
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
    _FIELDS,
    _Static,
    _initial_values,
    _np_fields,
    _panel_factor,
    apply_schur_update,
    gather_panels,
    scatter_panels,
)


# ---------------------------------------------------------------------------
# Host-side plan sharding


def shard_plan(plan: FactorizePlan, ndev: int):
    """Partition every level's buckets across ndev devices.

    Per-supernode arrays gain a leading device axis (row0 [ndev, Bd], ...),
    are flattened per field into ONE [ndev, total] buffer (jit arity stays
    O(1); see numeric.build_runs), and ship with a static per-level meta.
    Assignment: supernodes of a bucket are dealt round-robin — within a
    bucket all panels cost the same (same padded shape), so round-robin is
    flop-balanced.  Chips with fewer supernodes get "dead" panels with
    w = mb = 0, whose gather assembles the identity.
    """
    chunks = {f: [] for f in _FIELDS}
    offs = {f: 0 for f in _FIELDS}
    meta = []
    xchunks = []          # per-level touched-row sets (the psum halo)
    xoff = 0
    xmeta = []
    for lev in plan.levels:
        lmeta = []
        touched = []
        for b in lev:
            for k in range(b.batch):
                r0 = int(b.row0[k]); wk = int(b.w[k]); mbk = int(b.mb[k])
                nseg = -(-wk // 128) if wk else 1
                touched.append(np.arange(r0, r0 + (wk + mbk) * nseg))
                if b.ug is not None and mbk:
                    G = int(b.uG[k])
                    for g in range(G):
                        j0 = int(b.uj0[k, g])
                        touched.append(
                            b.urow0[k, g]
                            + b.up[k, j0:mbk, g] * b.ustride[k, g]
                        )
        xrows = (
            np.unique(np.concatenate(touched)).astype(np.int64)
            if touched else np.zeros(0, dtype=np.int64)
        )
        xchunks.append(xrows.astype(np.int32))
        xmeta.append((xoff, len(xrows)))
        xoff += len(xrows)
        for b in lev:
            B = b.batch
            Bd = -(-B // ndev)
            pad = Bd * ndev - B
            fills = dict(row0=0, w=0, mb=0, col_idx=-1, below_idx=-1,
                         ug=0, ujloc=0, up=0, urow0=0, ustride=1,
                         uj0=b.mb_pad, uG=0)
            spec = {}
            fv = _np_fields(b)
            for f in _FIELDS:
                arr = fv[f]
                if arr is None:
                    spec[f] = None
                    continue
                if pad:
                    dead = np.full((pad,) + arr.shape[1:], fills[f], arr.dtype)
                    arr = np.concatenate([arr, dead], axis=0)
                arr = arr.reshape(ndev, Bd, *arr.shape[1:])
                flat2 = np.ascontiguousarray(arr, dtype=np.int32).reshape(ndev, -1)
                chunks[f].append(flat2)
                spec[f] = (offs[f], arr.shape[1:])
                offs[f] += flat2.shape[1]
            lmeta.append((tuple(sorted(spec.items())), b.utile_g))
        meta.append(tuple(lmeta))
    flat = {
        f: jnp.asarray(
            np.concatenate(chunks[f], axis=1)
            if chunks[f] else np.zeros((ndev, 0), np.int32)
        )
        for f in _FIELDS
    }
    return {
        "flat": flat,
        "xrows": jnp.asarray(
            np.concatenate(xchunks) if xchunks else np.zeros(0, np.int32)
        ),
        "meta": _Static((tuple(meta), tuple(xmeta))),
        "entry_row": jnp.asarray(plan.entry_row.astype(np.int32)),
        "entry_lane": jnp.asarray(plan.entry_lane.astype(np.int32)),
        "entry_plo": jnp.asarray(plan.entry_plo.astype(np.int32)),
        "entry_phi": jnp.asarray(plan.entry_phi.astype(np.int32)),
        "diag_map": jnp.asarray(plan.diag_map.astype(np.int32)),
        "perm": jnp.asarray(plan.perm.astype(np.int32)),
        "iperm": jnp.asarray(plan.iperm.astype(np.int32)),
    }


def _unpack_local(flat, spec) -> _BucketArrays:
    """Device-local bucket arrays from the [1, total] sharded buffers."""
    fields = {}
    for f, fs in spec:
        if fs is None:
            fields[f] = None
        else:
            off, shape = fs
            size = int(np.prod(shape))
            fields[f] = jax.lax.slice(
                flat[f], (0, off), (1, off + size)
            ).reshape(shape)
    return _BucketArrays(**fields)


# ---------------------------------------------------------------------------
# Device-side sharded factorize


def _sharded_factorize_body(arrays, Ax, *, R_L, dtype, axis: str, scale: bool):
    """Runs per device inside shard_map; bucket arrays arrive device-local
    (leading device axis of size 1 under the sharding)."""
    Lx, d = _initial_values(arrays, Ax, R_L=R_L, dtype=dtype, scale=scale)

    minpivs = []
    levels_meta, xmeta = arrays["meta"].value
    for lmeta, (xoff, xlen) in zip(levels_meta, xmeta):
        delta = jnp.zeros_like(Lx)
        for spec, utile_g in lmeta:
            bl = _unpack_local(arrays["flat"], spec)
            Pn = gather_panels(Lx, bl, R_L)
            L, piv = _panel_factor(Pn, bl.w_pad, "xla")
            minpivs.append(piv)
            # set-as-add: the panel rows currently hold Pn minus the
            # arithmetic identity padding, which lives at dropped rows
            delta = scatter_panels(delta, bl, L - Pn, R_L)
            if bl.mb_pad:
                delta = apply_schur_update(
                    delta, bl, L[:, bl.w_pad:, :], R_L, dtype, utile_g
                )
        # halo exchange: only the rows this level writes (panel rows +
        # update targets, a static host-computed union) ride the psum.
        xrows = jax.lax.slice(arrays["xrows"], (xoff,), (xoff + xlen,))
        h = jnp.take(delta, xrows, axis=0, mode="fill", fill_value=0)
        h = jax.lax.psum(h, axis)
        Lx = Lx.at[xrows].add(h, mode="drop")
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
            "flat": {f: P(axis) for f in _FIELDS},
            "xrows": P(),
            # _Static carries no array leaves; a vacuous leaf spec suffices
            "meta": P(),
            "entry_row": P(),
            "entry_lane": P(),
            "entry_plo": P(),
            "entry_phi": P(),
            "diag_map": P(),
            "perm": P(),
            "iperm": P(),
        },
        P(),
    )

    body = functools.partial(
        _sharded_factorize_body, R_L=plan.R_L, dtype=dtype, axis=axis,
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
