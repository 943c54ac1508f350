"""Multi-chip supernodal factorization over a JAX device mesh.

The reference's only parallelism is an OpenMP wavefront within one process
(/root/reference/include/chol.hpp:1424, SURVEY.md §2c); there is no
distributed backend.  This module is the TPU-native scaling story
(BASELINE.json north star): elimination-tree parallelism *across chips*
via shard_map over a 1D mesh.  Two strategies:

``strategy="subtree"`` (default — the north-star design):
  * the assembly tree is cut at a host-computed frontier; below it, whole
    subtrees are assigned to chips with LPT flop balancing (proportional
    mapping).  A chip's panels below the frontier read only rows its own
    subtrees wrote, so the entire lower phase runs with ZERO collectives —
    elimination-tree parallelism is communication-free below the subtree
    roots;
  * updates from subtree supernodes into above-frontier ancestors
    accumulate in the chip's local store; ONE psum of the (static,
    host-computed) frontier rows merges them, using a set-as-add
    contribution (local value minus the replicated initial A values);
  * the few levels above the frontier run wavefront-partitioned with a
    per-level psum halo exchange (they hold the big dense separators —
    flops dominate communication there);
  * one final masked psum assembles the replicated factor: each row is
    taken from its owning chip (top rows from chip 0).

``strategy="wavefront"`` (round-1 scheme, kept for comparison/tests):
  * every level's supernodes are round-robined across chips and every
    level pays one psum of its touched rows (set-as-add deltas).

Both are deterministic and race-free by construction (contrast with the
reference's racy apply_update, SURVEY.md §2c).  Dead-panel padding keeps
per-chip shapes uniform under shard_map: chips with fewer supernodes in a
step get panels with w = mb = 0, whose gather assembles the identity
(factorizes to itself, contributes nothing, pivot 1).
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


def subtree_partition(plan: FactorizePlan, ndev: int, expand: int = 4):
    """Cut the assembly tree into >= expand*ndev candidate subtrees and
    LPT-assign them to chips by exact subtree flops (proportional mapping).

    Returns (owner, is_top): ``owner[s]`` = chip of supernode s, or -1 for
    above-frontier ("top") supernodes; ``is_top`` = boolean mask.
    """
    import heapq

    S = plan.S
    ns = S.ns
    w = plan.block_w.astype(np.float64)
    mb = plan.block_m.astype(np.float64) - w
    node_f = w**3 / 3 + w * w * mb + w * mb * mb
    par = S.sparent
    sub_f = node_f.copy()
    for s in range(ns):          # children always precede parents
        p = int(par[s])
        if p >= 0:
            sub_f[p] += sub_f[s]
    children: list[list[int]] = [[] for _ in range(ns)]
    for s in range(ns):
        p = int(par[s])
        if p >= 0:
            children[p].append(s)

    is_top = np.zeros(ns, dtype=bool)
    roots = [s for s in range(ns) if par[s] < 0]
    heap = [(-sub_f[s], s) for s in roots]
    heapq.heapify(heap)
    kept: list[int] = []
    target = max(expand * ndev, ndev)
    # stop only when BOTH the candidate count suffices AND the heaviest
    # candidate is small enough to balance: stopping on count alone left
    # one 11-of-15 GF subtree on a single chip at irregular3d:32
    # (balance_efficiency 0.16, evidence/scaling_projection.md)
    total_f = sum(sub_f[s] for s in roots)
    cap_f = total_f / target if target else 0.0
    iters = 0
    while heap and iters < 50 * target and (
            len(heap) + len(kept) < target or -heap[0][0] > cap_f):
        iters += 1
        negf, s = heapq.heappop(heap)
        if not children[s]:
            kept.append(s)           # unsplittable leaf subtree
            continue
        is_top[s] = True             # expand: s joins the top set
        for c in children[s]:
            heapq.heappush(heap, (-sub_f[c], c))
    kept += [s for _, s in heap]

    # LPT: heaviest subtree to the least-loaded chip
    owner = np.full(ns, -1, dtype=np.int64)
    load = np.zeros(ndev)
    for s in sorted(kept, key=lambda s: -sub_f[s]):
        c = int(np.argmin(load))
        load[c] += sub_f[s]
        stack = [s]
        while stack:
            t = stack.pop()
            owner[t] = c
            stack.extend(children[t])
    return owner, is_top


def _deal_bucket(b, per_chip: list[np.ndarray], ndev: int, chunks, offs,
                 slots=None):
    """Pack one plan bucket into [ndev, Bd, ...] arrays following the given
    per-chip index lists (into the bucket's batch axis), dead-padding chips
    with fewer supernodes.  Appends to the flat chunks (and each chip's
    pivot-slot -> supernode map to ``slots``); returns the static
    (spec, utile_g)."""
    Bd = max(len(p) for p in per_chip)
    if slots is not None:
        for c in range(ndev):
            ids = [int(b.sn_ids[k]) for k in per_chip[c]]
            slots[c].extend(ids + [-1] * (Bd - len(ids)))
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
        rows = []
        for c in range(ndev):
            take = arr[per_chip[c]]
            pad = Bd - len(per_chip[c])
            if pad:
                dead = np.full((pad,) + arr.shape[1:], fills[f], arr.dtype)
                take = np.concatenate([take, dead], axis=0)
            rows.append(take)
        out = np.stack(rows, axis=0)           # [ndev, Bd, ...]
        flat2 = np.ascontiguousarray(out, dtype=np.int32).reshape(ndev, -1)
        chunks[f].append(flat2)
        spec[f] = (offs[f], out.shape[1:])
        offs[f] += flat2.shape[1]
    return (tuple(sorted(spec.items())), b.utile_g)


def _bucket_update_rows(b, ks) -> list[np.ndarray]:
    """Store rows the Schur updates of supernodes ``ks`` of bucket b hit."""
    out = []
    if b.ug is None:
        return out
    for k in ks:
        mbk = int(b.mb[k])
        if not mbk:
            continue
        for g in range(int(b.uG[k])):
            j0 = int(b.uj0[k, g])
            out.append(
                b.urow0[k, g] + b.up[k, j0:mbk, g] * b.ustride[k, g]
            )
    return out


def _bucket_panel_rows(b, ks) -> list[np.ndarray]:
    out = []
    for k in ks:
        r0 = int(b.row0[k]); wk = int(b.w[k]); mbk = int(b.mb[k])
        nseg = -(-wk // 128) if wk else 1
        out.append(np.arange(r0, r0 + (wk + mbk) * nseg))
    return out


def shard_plan(plan: FactorizePlan, ndev: int, strategy: str = "subtree"):
    """Build the sharded device plan (see module docstring for the two
    strategies).  Per-supernode arrays gain a leading device axis, are
    flattened per field into ONE [ndev, total] buffer (jit arity stays
    O(1); see numeric.build_runs), and ship with a static meta:

      ("wavefront", per-level (steps, xrow span))
      ("subtree",  local steps, frontier xrow span, per-top-level
                   (steps, xrow span))

    plus an ``ownrow`` [ndev, R_L] row-ownership mask (subtree only).
    """
    chunks = {f: [] for f in _FIELDS}
    offs = {f: 0 for f in _FIELDS}
    xchunks = []          # concatenated psum row sets
    xoff = 0
    slots: list[list[int]] = [[] for _ in range(ndev)]  # pivot -> supernode

    def push_xrows(rowlists) -> tuple[int, int]:
        nonlocal xoff
        xrows = (
            np.unique(np.concatenate(rowlists)).astype(np.int32)
            if rowlists else np.zeros(0, dtype=np.int32)
        )
        span = (xoff, len(xrows))
        xchunks.append(xrows)
        xoff += len(xrows)
        return span

    if strategy == "wavefront":
        meta = []
        for lev in plan.levels:
            rowlists = []
            for b in lev:
                ks = range(b.batch)
                rowlists += _bucket_panel_rows(b, ks)
                rowlists += _bucket_update_rows(b, ks)
            span = push_xrows(rowlists)
            lmeta = []
            for b in lev:
                rr = np.arange(b.batch)
                per = [rr[rr % ndev == c] for c in range(ndev)]
                lmeta.append(_deal_bucket(b, per, ndev, chunks, offs, slots))
            meta.append((tuple(lmeta), span))
        static = ("wavefront", tuple(meta))
        ownrow = None
    elif strategy == "subtree":
        owner, is_top = subtree_partition(plan, ndev)
        # --- local phase: per (level, bucket), per-chip supernode lists ---
        local_meta = []
        fr_rowlists = []          # update rows landing on top supernodes
        row_off = plan.row_off
        nrows_of = plan.block_m * plan.block_nseg
        for lev in plan.levels:
            for b in lev:
                own = owner[b.sn_ids]
                loc = np.where(own >= 0)[0]
                if not len(loc):
                    continue
                per = [loc[own[loc] == c] for c in range(ndev)]
                local_meta.append(
                    _deal_bucket(b, per, ndev, chunks, offs, slots))
                # frontier rows: local updates hitting top supernodes
                for rows in _bucket_update_rows(b, loc):
                    t = np.searchsorted(row_off, rows, side="right") - 1
                    fr_rowlists.append(rows[is_top[t]])
        fr_span = push_xrows(fr_rowlists)
        # --- top phase: wavefront with per-level psum --------------------
        top_meta = []
        for lev in plan.levels:
            lmeta = []
            rowlists = []
            for b in lev:
                topk = np.where(owner[b.sn_ids] < 0)[0]
                if not len(topk):
                    continue
                rowlists += _bucket_panel_rows(b, topk)
                rowlists += _bucket_update_rows(b, topk)
                per = [topk[topk % ndev == c] for c in range(ndev)]
                lmeta.append(_deal_bucket(b, per, ndev, chunks, offs, slots))
            if lmeta:
                top_meta.append((tuple(lmeta), push_xrows(rowlists)))
        static = ("subtree", tuple(local_meta), fr_span, tuple(top_meta))
        # --- row ownership mask (top rows -> chip 0) ---------------------
        ownrow = np.zeros((ndev, plan.R_L), dtype=np.int8)
        for s in range(plan.ns):
            c = int(owner[s])
            r0 = int(row_off[s]); r1 = r0 + int(nrows_of[s])
            ownrow[max(c, 0), r0:r1] = 1
    else:
        raise ValueError(f"unknown shard strategy {strategy!r}")

    flat = {
        f: jnp.asarray(
            np.concatenate(chunks[f], axis=1)
            if chunks[f] else np.zeros((ndev, 0), np.int32)
        )
        for f in _FIELDS
    }
    out = {
        "flat": flat,
        "xrows": jnp.asarray(
            np.concatenate(xchunks) if xchunks else np.zeros(0, np.int32)
        ),
        "meta": _Static(static),
        "sn_slots": _Static(tuple(tuple(c) for c in slots)),
        "entry_row": jnp.asarray(plan.entry_row.astype(np.int32)),
        "entry_lane": jnp.asarray(plan.entry_lane.astype(np.int32)),
        "entry_plo": jnp.asarray(plan.entry_plo.astype(np.int32)),
        "entry_phi": jnp.asarray(plan.entry_phi.astype(np.int32)),
        "diag_map": jnp.asarray(plan.diag_map.astype(np.int32)),
        "perm": jnp.asarray(plan.perm.astype(np.int32)),
        "iperm": jnp.asarray(plan.iperm.astype(np.int32)),
    }
    if ownrow is not None:
        out["ownrow"] = jnp.asarray(ownrow)
    return out


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


def _psum_level(Lx, arrays, lmeta, span, *, R_L, dtype, axis, minpivs):
    """One wavefront level: factor local panels into a zero delta, psum the
    level's touched rows, commit.  The set-as-add trick makes the psum
    result exactly the new factor state."""
    xoff, xlen = span
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
    return Lx.at[xrows].add(h, mode="drop")


def _sharded_factorize_body(arrays, Ax, *, R_L, dtype, axis: str, scale: bool):
    """Runs per device inside shard_map; bucket arrays arrive device-local
    (leading device axis of size 1 under the sharding)."""
    Lx, d = _initial_values(arrays, Ax, R_L=R_L, dtype=dtype, scale=scale)
    minpivs = []
    static = arrays["meta"].value

    if static[0] == "wavefront":
        for lmeta, span in static[1]:
            Lx = _psum_level(Lx, arrays, lmeta, span, R_L=R_L, dtype=dtype,
                             axis=axis, minpivs=minpivs)
    else:
        _tag, local_meta, (fr_off, fr_len), top_meta = static
        # ---- local phase: whole subtrees per chip, ZERO collectives -----
        frows = jax.lax.slice(arrays["xrows"], (fr_off,), (fr_off + fr_len,))
        fr_init = jnp.take(Lx, frows, axis=0, mode="fill", fill_value=0)
        for spec, utile_g in local_meta:
            bl = _unpack_local(arrays["flat"], spec)
            Pn = gather_panels(Lx, bl, R_L)
            L, piv = _panel_factor(Pn, bl.w_pad, "xla")
            minpivs.append(piv)
            Lx = scatter_panels(Lx, bl, L, R_L)
            if bl.mb_pad:
                Lx = apply_schur_update(
                    Lx, bl, L[:, bl.w_pad:, :], R_L, dtype, utile_g
                )
        # ---- frontier: merge all subtree contributions into top rows ----
        h = jnp.take(Lx, frows, axis=0, mode="fill", fill_value=0) - fr_init
        h = jax.lax.psum(h, axis)
        Lx = Lx.at[frows].set(fr_init + h, mode="drop")
        # ---- top phase: few levels, per-level psum ----------------------
        for lmeta, span in top_meta:
            Lx = _psum_level(Lx, arrays, lmeta, span, R_L=R_L, dtype=dtype,
                             axis=axis, minpivs=minpivs)
        # ---- final merge: every row from its owning chip ----------------
        mask = arrays["ownrow"][0].astype(dtype)[:, None]
        Lx = jax.lax.psum(Lx * mask, axis)

    minpiv_flat = (
        jnp.concatenate(minpivs) if minpivs else jnp.zeros((0,), dtype=dtype)
    )
    return Lx, minpiv_flat, d


def factorize_sharded(plan: FactorizePlan, Ax, mesh: Mesh, *, arrays=None,
                      scale: bool = False, check: bool = True,
                      strategy: str = "subtree"):
    """Distributed numeric factorization over a 1D mesh.

    Returns (Lx, d): the replicated block-store factor (same contents on
    every device, identical to the single-chip result up to float summation
    order inside psum) and the equilibration vector.
    """
    if getattr(plan, "layout", "compact") != "compact":
        raise ValueError(
            "the partitioned/sharded store requires a compact-layout plan "
            "(compile_plan(..., layout=\"compact\")); the aligned layout "
            "is single-chip only")
    axis = mesh.axis_names[0]
    ndev = mesh.devices.size
    if arrays is None:
        arrays = shard_plan(plan, ndev, strategy)
    dtype = jnp.dtype(plan.dtype)

    # bucket index arrays (and the row-ownership mask) are sharded over
    # their leading device axis; everything else (entry/diag maps, Ax, Lx)
    # is replicated
    spec = {
        "flat": {f: P(axis) for f in _FIELDS},
        "xrows": P(),
        # _Static carries no array leaves; a vacuous leaf spec suffices
        "meta": P(),
        "sn_slots": P(),
        "entry_row": P(),
        "entry_lane": P(),
        "entry_plo": P(),
        "entry_phi": P(),
        "diag_map": P(),
        "perm": P(),
        "iperm": P(),
    }
    if "ownrow" in arrays:
        spec["ownrow"] = P(axis)
    in_specs = (spec, P())

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
            # localize: pivots arrive chip-major in _deal_bucket slot order
            sn_slots = arrays["sn_slots"].value
            bad = int(np.argmax(mp <= 0))
            nslot = len(sn_slots[0]) if sn_slots else 0
            s = (sn_slots[bad // nslot][bad % nslot]
                 if nslot and bad // nslot < len(sn_slots) else -1)
            kw = dict(pivot=float(mp[bad]))
            if s >= 0:
                kw.update(
                    supernode=s,
                    column_range=(int(plan.S.sn_ptr[s]),
                                  int(plan.S.sn_ptr[s + 1])),
                )
            raise NotPositiveDefiniteError(**kw)
    return Lx, d


def make_mesh(ndev: int | None = None, axis: str = "x") -> Mesh:
    devs = jax.devices()
    if ndev is not None:
        devs = devs[:ndev]
    return Mesh(np.array(devs), (axis,))
