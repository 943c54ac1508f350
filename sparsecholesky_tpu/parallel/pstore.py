"""Partitioned-store multi-chip factorization (round-2 scaling design).

Round 1's shard.py partitions COMPUTE but replicates the whole [R_L, 128]
factor store on every chip, so N chips cannot factor a matrix one chip
cannot hold (VERDICT round 1, missing item 3).  This module partitions the
STORE:

  per-chip local store  =  [ top region | owned subtree blocks | tail pad ]

* ``subtree_partition`` (shard.py) assigns whole assembly subtrees to
  chips; a chip's local store holds only its own subtree blocks plus one
  shared copy of the above-frontier ("top") supernode blocks.  Per-chip
  memory is R_top + R_L/ndev + pad instead of R_L.
* Zero halo below the frontier: a subtree supernode's Schur updates only
  ever target assembly-tree ancestors, which are either in the same
  owned subtree or in the top region — both chip-local by construction.
* The top region sits at local rows [0, R_top) with an identical layout
  on every chip, so the frontier merge is ONE psum of a contiguous slice
  (chip 0 contributes A's top entries; everyone contributes accumulated
  updates), and the few top wavefront levels run round-robin with a
  per-level psum of touched top rows — dense-slice collectives, no
  gather/scatter on the exchange path.
* The result stays partitioned (a [ndev, R_local] sharded store);
  ``gather_full`` reassembles the replicated global store for the solve
  and for single-chip-equality tests.

The reference has no distributed story at all (SURVEY.md §2c: OpenMP only);
the north star is BASELINE.json's "block-row partition of L by subtree
across chips".
"""

from __future__ import annotations

import dataclasses
import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..plan import FactorizePlan, LANE, STORE_TAIL_PAD
from ..errors import NotPositiveDefiniteError
from ..numeric import (
    _BucketArrays,
    _FIELDS,
    _RUN_FIELDS,
    _Static,
    _panel_factor,
    _window_table,
    apply_schur_update,
    gather_panels,
    scatter_panels,
)
from .shard import subtree_partition


# ---------------------------------------------------------------------------
# Host-side layout + plan sharding


@dataclasses.dataclass(frozen=True)
class StoreLayout:
    """Host-side description of the partitioned store."""

    ndev: int
    R_top: int                # rows of the shared top region
    R_local: int              # uniform per-chip store rows (incl. tail pad)
    owner: np.ndarray         # [ns] chip of each supernode (-1 = top)
    local_start: np.ndarray   # [ndev, ns] local first row of block s on its
                              # holder chips; -1 where the chip holds no copy
    nrows_of: np.ndarray      # [ns] store rows of each block

    def global_to_local(self, c: int):
        """Shift table: global store row -> chip-c local row per block."""
        return self.local_start[c]


def build_layout(plan: FactorizePlan, ndev: int) -> StoreLayout:
    owner, _is_top = subtree_partition(plan, ndev)
    ns = plan.ns
    nrows_of = (plan.block_m * plan.block_nseg).astype(np.int64)
    local_start = np.full((ndev, ns), -1, dtype=np.int64)
    off = 0
    for s in range(ns):
        if owner[s] < 0:
            local_start[:, s] = off     # top region: same slot on all chips
            off += int(nrows_of[s])
    R_top = off
    ends = []
    for c in range(ndev):
        o = R_top
        for s in range(ns):
            if owner[s] == c:
                local_start[c, s] = o
                o += int(nrows_of[s])
        ends.append(o)
    R_local = max(ends) + STORE_TAIL_PAD
    return StoreLayout(ndev=ndev, R_top=R_top, R_local=R_local,
                       owner=owner, local_start=local_start,
                       nrows_of=nrows_of)


def _chip_bucket(plan, b, members, lay: StoreLayout, c: int, Bd: int):
    """Chip-c view of plan bucket ``b`` restricted to ``members`` (indices
    into the bucket batch), dead-padded to Bd, with every store-row field
    remapped into chip-c local coordinates."""
    from ..plan import Bucket

    shift = lay.local_start[c] - plan.row_off  # valid where chip holds s
    k = np.asarray(members, dtype=np.int64)
    nm = len(k)
    pad = Bd - nm

    def take(arr, fill):
        out = arr[k]
        if pad:
            dead = np.full((pad,) + arr.shape[1:], fill, arr.dtype)
            out = np.concatenate([out, dead], axis=0)
        return out

    sn = b.sn_ids[k].astype(np.int64)
    row0 = b.row0[k].astype(np.int64) + shift[sn]
    if pad:
        row0 = np.concatenate([row0, np.zeros(pad, np.int64)])
        sn_p = np.concatenate([sn, np.full(pad, -1, np.int64)])
    else:
        sn_p = sn

    fields = dict(
        sn_ids=sn_p.astype(np.int32),
        row0=row0.astype(np.int32),
        w=take(b.w, 0), mb=take(b.mb, 0),
        col_idx=take(b.col_idx, -1), below_idx=take(b.below_idx, -1),
        w_pad=b.w_pad, mb_pad=b.mb_pad, utile_g=b.utile_g,
    )
    if b.ug is None:
        fields.update(ug=None, ujloc=None, up=None, urow0=None,
                      ustride=None, uj0=None, uG=None, runs_raw=None)
        return Bucket(**fields)

    # urow0 remap: owner block of each group found from its global row0
    urow0 = b.urow0[k].astype(np.int64)
    gsn = np.searchsorted(plan.row_off, urow0, side="right") - 1
    urow0 = urow0 + shift[gsn]
    if pad:
        urow0 = np.concatenate([urow0, np.zeros((pad, urow0.shape[1]), np.int64)])
    fields.update(
        ug=take(b.ug, 0), ujloc=take(b.ujloc, 0), up=take(b.up, 0),
        urow0=urow0.astype(np.int32),
        ustride=take(b.ustride, 1), uj0=take(b.uj0, b.mb_pad),
        uG=take(b.uG, 0),
    )
    # runs: filter to members, renumber source slots, remap store rows
    rr = b.runs_raw
    if rr is not None and len(rr):
        sel = np.isin(rr[:, 0], k)
        rr = rr[sel].astype(np.int64)
        slot_of = np.full(int(b.batch), -1, np.int64)
        slot_of[k] = np.arange(nm)
        rr[:, 0] = slot_of[rr[:, 0]]
        rsn = np.searchsorted(plan.row_off, rr[:, 4], side="right") - 1
        rr[:, 4] = rr[:, 4] + shift[rsn]
        order = np.lexsort((rr[:, 2], rr[:, 1], rr[:, 0]))
        rr = rr[order]
    else:
        rr = np.zeros((0, 5), np.int64)
    fields.update(runs_raw=rr.astype(np.int32))
    return Bucket(**fields)


def _np32(a):
    return np.ascontiguousarray(a, dtype=np.int32).ravel()


def shard_plan_partitioned(plan: FactorizePlan, ndev: int,
                           extend: str = "scatter"):
    """Compile the partitioned-store device plan.

    Returns the arrays dict for ``factorize_partitioned`` plus the
    StoreLayout (host-side).  Flat buffers are [ndev, total] (device axis
    sharded over the mesh); meta is static:
      (local steps, R_top, top levels [(steps, xrow span)], nw meta)
    """
    lay = build_layout(plan, ndev)
    owner = lay.owner
    itemsize = plan.dtype.itemsize
    dummy_row = lay.R_local - plan.run_tile
    use_runs = extend != "scatter"

    chunks = {f: [] for f in _FIELDS + _RUN_FIELDS}
    offs = {f: 0 for f in _FIELDS + _RUN_FIELDS}
    xchunks, xoff = [], 0
    slots: list[list[int]] = [[] for _ in range(ndev)]

    def deal(cbuckets, rchunks):
        """Stack chip buckets' device fields into the flat buffers."""
        spec = {}
        for f in _FIELDS:
            vals = [getattr(cb, f) for cb in cbuckets]
            if vals[0] is None:
                spec[f] = None
                continue
            out = np.stack(vals, axis=0)
            flat2 = np.ascontiguousarray(out, np.int32).reshape(ndev, -1)
            chunks[f].append(flat2)
            spec[f] = (offs[f], out.shape[1:])
            offs[f] += flat2.shape[1]
        if use_runs and cbuckets[0].mb_pad:
            tabs = [
                _window_table(cb, cbuckets[0].utile_g, dummy_row, itemsize,
                              plan.run_tile)
                for cb in cbuckets
            ]
            ncs = len(tabs[0][3])
            maxn = tuple(max(t[3][ch] for t in tabs) for ch in range(ncs))
            names = ("rstart", "rcoff", "rlen")
            stacked = {f: [] for f in names}
            for rs, rc, rl, counts, ncl in tabs:
                segs = {f: [] for f in names}
                off = 0
                for ch in range(ncs):
                    cnt = counts[ch]
                    segs["rstart"].append(rs[off:off + cnt])
                    segs["rcoff"].append(rc[off:off + cnt])
                    segs["rlen"].append(rl[off:off + cnt])
                    padn = maxn[ch] - cnt
                    if padn:
                        segs["rstart"].append(np.full(padn, dummy_row, np.int64))
                        segs["rcoff"].append(
                            np.full(padn, ncl[ch] - plan.run_tile, np.int64))
                        segs["rlen"].append(np.zeros(padn, np.int64))
                    off += cnt
                for f in names:
                    stacked[f].append(np.concatenate(segs[f])
                                      if segs[f] else np.zeros(0, np.int64))
            for f in names:
                out = np.stack(stacked[f], axis=0)
                flat2 = np.ascontiguousarray(out, np.int32).reshape(ndev, -1)
                chunks[f].append(flat2)
                spec[f] = (offs[f], out.shape[1:])
                offs[f] += flat2.shape[1]
            rchunks.append(maxn)
        else:
            rchunks.append(())
        for f in _RUN_FIELDS:
            spec.setdefault(f, None)
        return tuple(sorted(spec.items()))

    # ---- local (subtree) phase: chip-owned buckets, plan order ----------
    local_meta = []
    for lev in plan.levels:
        for b in lev:
            own = owner[b.sn_ids]
            loc = np.where(own >= 0)[0]
            if not len(loc):
                continue
            per = [loc[own[loc] == c] for c in range(ndev)]
            Bd = max(len(p) for p in per)
            for c in range(ndev):
                ids = [int(b.sn_ids[i]) for i in per[c]]
                slots[c].extend(ids + [-1] * (Bd - len(ids)))
            cbs = [_chip_bucket(plan, b, per[c], lay, c, Bd)
                   for c in range(ndev)]
            rch: list = []
            spec = deal(cbs, rch)
            local_meta.append((spec, b.utile_g, rch[0]))

    # ---- top phase: wavefront round-robin inside the shared region ------
    # every chip addresses the top region identically; chip index c==0
    # is the canonical holder for A's entries
    top_meta = []
    for lev in plan.levels:
        lmeta = []
        rowlists = []
        for b in lev:
            topk = np.where(owner[b.sn_ids] < 0)[0]
            if not len(topk):
                continue
            per = [topk[topk % ndev == c] for c in range(ndev)]
            Bd = max(len(p) for p in per)
            for c in range(ndev):
                ids = [int(b.sn_ids[i]) for i in per[c]]
                slots[c].extend(ids + [-1] * (Bd - len(ids)))
            cbs = [_chip_bucket(plan, b, per[c], lay, c, Bd)
                   for c in range(ndev)]
            rch = []
            spec = deal(cbs, rch)
            lmeta.append((spec, b.utile_g, rch[0]))
            # touched local top rows: panel rows + update targets (all in
            # the top region under any chip's coordinates; use chip 0's)
            for i in topk:
                s = int(b.sn_ids[i])
                r0 = int(lay.local_start[0, s])
                rowlists.append(np.arange(r0, r0 + int(lay.nrows_of[s])))
            # update-target rows from EVERY chip's runs (the top region is
            # addressed identically on all chips)
            for cb in cbs:
                rrr = cb.runs_raw
                if rrr is not None and len(rrr):
                    for st, ln in zip(rrr[:, 4], rrr[:, 3]):
                        rowlists.append(np.arange(st, st + ln))
        if lmeta:
            xrows = (np.unique(np.concatenate(rowlists)).astype(np.int32)
                     if rowlists else np.zeros(0, np.int32))
            span = (xoff, len(xrows))
            xchunks.append(xrows)
            xoff += len(xrows)
            top_meta.append((tuple(lmeta), span))

    # ---- per-chip entry scatter maps ------------------------------------
    # entry e lands in block t = supernode of its column; top entries go to
    # chip 0 only (the frontier psum would multiply duplicates), owned
    # entries to their owner chip; all other chips drop to out-of-bounds.
    ecol = plan.entry_plo.astype(np.int64)   # permuted column = L column
    t = plan.S.sn_id[ecol].astype(np.int64)
    erow = np.empty((ndev, len(ecol)), dtype=np.int64)
    for c in range(ndev):
        shift = lay.local_start[c] - plan.row_off
        keep = (owner[t] == c) | ((owner[t] < 0) & (c == 0))
        erow[c] = np.where(keep, plan.entry_row + shift[t], lay.R_local)

    flat = {
        f: jnp.asarray(
            np.concatenate(chunks[f], axis=1)
            if chunks[f] else np.zeros((ndev, 0), np.int32)
        )
        for f in _FIELDS + _RUN_FIELDS
    }
    arrays = {
        "flat": flat,
        "xrows": jnp.asarray(
            np.concatenate(xchunks) if xchunks else np.zeros(0, np.int32)
        ),
        "meta": _Static((tuple(local_meta), lay.R_top, tuple(top_meta))),
        "sn_slots": _Static(tuple(tuple(c) for c in slots)),
        "rtile": _Static(plan.run_tile),
        "entry_row": jnp.asarray(erow.astype(np.int32)),
        "entry_lane": jnp.asarray(
            np.broadcast_to(plan.entry_lane.astype(np.int32),
                            (ndev, len(ecol))).copy()
        ),
        "entry_plo": jnp.asarray(plan.entry_plo.astype(np.int32)),
        "entry_phi": jnp.asarray(plan.entry_phi.astype(np.int32)),
        "diag_map": jnp.asarray(plan.diag_map.astype(np.int32)),
        "perm": jnp.asarray(plan.perm.astype(np.int32)),
        "iperm": jnp.asarray(plan.iperm.astype(np.int32)),
    }
    return arrays, lay


def _unpack_chip(flat, spec) -> _BucketArrays:
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
# Device-side partitioned factorize


def _body(arrays, Ax, *, R_local, dtype, axis, scale, extend, rtile):
    local_meta, R_top, top_meta = arrays["meta"].value

    # initial values into the local store (per-chip entry map)
    if scale:
        diag = Ax[arrays["diag_map"]]
        d = jax.lax.rsqrt(jnp.abs(diag))
        vals = Ax * d[arrays["entry_plo"]] * d[arrays["entry_phi"]]
        d = d.astype(dtype)
    else:
        d = jnp.ones((arrays["diag_map"].shape[0],), dtype=dtype)
        vals = Ax
    vals = vals.astype(dtype)
    Lx = jnp.zeros((R_local, LANE), dtype=dtype)
    Lx = Lx.at[arrays["entry_row"][0], arrays["entry_lane"][0]].add(
        vals, mode="drop"
    )

    minpivs = []

    def step(Lx, spec, utile_g, rchunks):
        bl = _unpack_chip(arrays["flat"], spec)
        Pn = gather_panels(Lx, bl, R_local)
        L, piv = _panel_factor(Pn, bl.w_pad, "xla")
        minpivs.append(piv)
        Lx = scatter_panels(Lx, bl, L, R_local)
        if bl.mb_pad:
            Lx = apply_schur_update(Lx, bl, L[:, bl.w_pad:, :], R_local,
                                    dtype, utile_g, extend, rchunks, rtile)
        return Lx

    # ---- local phase: zero collectives ---------------------------------
    for spec, utile_g, rchunks in local_meta:
        Lx = step(Lx, spec, utile_g, rchunks)

    # ---- frontier: one psum of the shared top region --------------------
    if R_top:
        top = jax.lax.slice(Lx, (0, 0), (R_top, LANE))
        top = jax.lax.psum(top, axis)
        Lx = jax.lax.dynamic_update_slice(Lx, top, (0, 0))

    # ---- top phase: per-level psum of touched rows ----------------------
    for lmeta, (xo, xl) in top_meta:
        delta = jnp.zeros_like(Lx)
        for spec, utile_g, rchunks in lmeta:
            bl = _unpack_chip(arrays["flat"], spec)
            Pn = gather_panels(Lx, bl, R_local)
            L, piv = _panel_factor(Pn, bl.w_pad, "xla")
            minpivs.append(piv)
            delta = scatter_panels(delta, bl, L - Pn, R_local)
            if bl.mb_pad:
                delta = apply_schur_update(delta, bl, L[:, bl.w_pad:, :],
                                           R_local, dtype, utile_g, extend,
                                           rchunks, rtile)
        xr = jax.lax.slice(arrays["xrows"], (xo,), (xo + xl,))
        h = jnp.take(delta, xr, axis=0, mode="fill", fill_value=0)
        h = jax.lax.psum(h, axis)
        Lx = Lx.at[xr].add(h, mode="drop")

    minpiv = (jnp.concatenate(minpivs) if minpivs
              else jnp.zeros((0,), dtype=dtype))
    return Lx, minpiv, d


def factorize_partitioned(plan: FactorizePlan, Ax, mesh: Mesh, *,
                          arrays=None, layout: StoreLayout | None = None,
                          scale: bool = False, check: bool = True,
                          extend: str = "scatter"):
    """Distributed numeric factorization on the partitioned store.

    Returns (Lx_sharded [ndev, R_local, 128], layout, d).  Use
    ``gather_full`` to reassemble the replicated global store.
    """
    axis = mesh.axis_names[0]
    ndev = mesh.devices.size
    if arrays is None or layout is None:
        arrays, layout = shard_plan_partitioned(plan, ndev, extend)
    dtype = jnp.dtype(plan.dtype)

    spec = {
        "flat": {f: P(axis) for f in _FIELDS + _RUN_FIELDS},
        "xrows": P(),
        "meta": P(),
        "sn_slots": P(),
        "rtile": P(),
        "entry_row": P(axis),
        "entry_lane": P(axis),
        "entry_plo": P(),
        "entry_phi": P(),
        "diag_map": P(),
        "perm": P(),
        "iperm": P(),
    }
    body = functools.partial(
        _body, R_local=layout.R_local, dtype=dtype, axis=axis, scale=scale,
        extend=extend, rtile=plan.run_tile,
    )
    fn = jax.jit(
        jax.shard_map(
            body, mesh=mesh, in_specs=(spec, P()),
            out_specs=(P(axis), P(axis), P()),
            check_vma=False,
        )
    )
    with jax.default_matmul_precision("highest"):
        Lx, minpiv, d = fn(arrays, jnp.asarray(Ax))
    if check:
        mp = np.asarray(minpiv)
        if mp.size and not (mp > 0).all():
            sn_slots = arrays["sn_slots"].value
            bad = int(np.argmax(mp <= 0))
            nslot = len(sn_slots[0]) if sn_slots else 0
            s = (sn_slots[bad // nslot][bad % nslot]
                 if nslot and bad // nslot < len(sn_slots) else -1)
            kw = dict(pivot=float(mp[bad]))
            if s >= 0:
                kw.update(supernode=s,
                          column_range=(int(plan.S.sn_ptr[s]),
                                        int(plan.S.sn_ptr[s + 1])))
            raise NotPositiveDefiniteError(**kw)
    return Lx, layout, d


def gather_full(plan: FactorizePlan, Lx_sharded, layout: StoreLayout
                ) -> np.ndarray:
    """Reassemble the replicated [R_L, 128] global store on the host from
    the partitioned per-chip stores."""
    Lxs = np.asarray(Lx_sharded)
    # out_specs P(axis) concatenates chips along axis 0
    Lxs = Lxs.reshape(layout.ndev, layout.R_local, LANE)
    out = np.zeros((plan.R_L, LANE), Lxs.dtype)
    for s in range(plan.ns):
        c = int(layout.owner[s])
        src = Lxs[max(c, 0)]
        r0 = int(layout.local_start[max(c, 0), s])
        g0 = int(plan.row_off[s])
        nr = int(layout.nrows_of[s])
        out[g0 : g0 + nr] = src[r0 : r0 + nr]
    return out


def per_chip_bytes(layout: StoreLayout, itemsize: int = 4) -> int:
    return layout.R_local * LANE * itemsize


# ---------------------------------------------------------------------------
# Partitioned sharded SpTRSV (VERDICT round-1 item 5)
#
# The solution vector stays replicated ([n, k] is tiny next to the factor),
# so distribution is about reading panels from the LOCAL store:
#   forward:  each chip sweeps its own subtree supernodes (sets on owned
#             columns, adds into ancestor entries — owned-or-top, both
#             chip-local); ONE psum of (y - y_init) merges everything
#             (untouched entries have zero delta); the top forward then
#             runs redundantly on every chip's identical top region copy
#             (communication-free).
#   backward: top backward redundant, then each chip back-solves its own
#             subtrees (below reads hit owned-or-top entries only).
#   assembly: owner-masked psum over columns (top columns from chip 0).


def _solve_steps(arrays, Lx, n, R_local, dtype):
    def fstep(y, bl):
        w_pad = bl.w_pad
        Pn = gather_panels(Lx, bl, R_local)
        D = jnp.tril(Pn[:, :w_pad, :])
        cidx = jnp.where(bl.col_idx < 0, n, bl.col_idx)
        ycols = jnp.take(y, cidx, axis=0, mode="fill", fill_value=0)
        z = jax.lax.linalg.triangular_solve(
            D, ycols, left_side=True, lower=True
        )
        y = y.at[cidx].set(z, mode="drop")
        if bl.mb_pad:
            L21 = Pn[:, w_pad:, :]
            u = jnp.einsum("bij,bjk->bik", L21, z,
                           preferred_element_type=dtype)
            bidx = jnp.where(bl.below_idx < 0, n, bl.below_idx)
            y = y.at[bidx].add(-u, mode="drop")
        return y

    def bstep(x, bl):
        w_pad = bl.w_pad
        Pn = gather_panels(Lx, bl, R_local)
        D = jnp.tril(Pn[:, :w_pad, :])
        cidx = jnp.where(bl.col_idx < 0, n, bl.col_idx)
        t = jnp.take(x, cidx, axis=0, mode="fill", fill_value=0)
        if bl.mb_pad:
            L21 = Pn[:, w_pad:, :]
            bidx = jnp.where(bl.below_idx < 0, n, bl.below_idx)
            xb = jnp.take(x, bidx, axis=0, mode="fill", fill_value=0)
            t = t - jnp.einsum("bij,bik->bjk", L21, xb,
                               preferred_element_type=dtype)
        z = jax.lax.linalg.triangular_solve(
            D, t, left_side=True, lower=True, transpose_a=True
        )
        return x.at[cidx].set(z, mode="drop")

    return fstep, bstep


def _solve_body(arrays, Lx, rhs, d, colmask, *, n, R_local, dtype, axis):
    local_meta, _R_top, top_meta = arrays["meta"].value
    fstep, bstep = _solve_steps(arrays, Lx, n, R_local, dtype)

    rhs = rhs.astype(dtype)
    y = rhs[arrays["perm"]] * d[:, None]
    y0 = y
    # forward, local subtrees (zero collectives)
    for spec, _u, _r in local_meta:
        y = fstep(y, _unpack_chip(arrays["flat"], spec))
    # merge: untouched entries have zero delta
    y = y0 + jax.lax.psum(y - y0, axis)
    # forward, top: supernodes are dealt round-robin, so each level's
    # results merge with a per-level delta psum (mirrors factorize)
    for lmeta, _span in top_meta:
        yp = y
        for spec, _u, _r in lmeta:
            y = fstep(y, _unpack_chip(arrays["flat"], spec))
        y = yp + jax.lax.psum(y - yp, axis)
    # backward, top then local subtrees
    x = y
    for lmeta, _span in reversed(top_meta):
        xp = x
        for spec, _u, _r in reversed(lmeta):
            x = bstep(x, _unpack_chip(arrays["flat"], spec))
        x = xp + jax.lax.psum(x - xp, axis)
    for spec, _u, _r in reversed(local_meta):
        x = bstep(x, _unpack_chip(arrays["flat"], spec))
    # owner-masked assembly + unscale + unpermute
    x = jax.lax.psum(x * colmask[0][:, None], axis)
    x = x * d[:, None]
    return x[arrays["iperm"]]


def solve_partitioned(plan: FactorizePlan, Lx_sharded, rhs, *, arrays,
                      layout: StoreLayout, mesh: Mesh, d=None):
    """Solve A x = rhs on the partitioned factor, fully under the mesh."""
    axis = mesh.axis_names[0]
    ndev = mesh.devices.size
    dtype = jnp.dtype(plan.dtype)
    if d is None:
        d = jnp.ones((plan.n,), dtype=dtype)
    rhs = jnp.asarray(rhs)
    squeeze = rhs.ndim == 1
    if squeeze:
        rhs = rhs[:, None]

    # per-chip column ownership mask (top columns -> chip 0)
    colowner = layout.owner[plan.S.sn_id].astype(np.int64)
    mask = np.zeros((ndev, plan.n), dtype=np.float32)
    for c in range(ndev):
        mask[c] = (colowner == c) | ((colowner < 0) & (c == 0))
    colmask = jnp.asarray(mask.astype(np.dtype(dtype)))

    spec_in = {
        "flat": {f: P(axis) for f in _FIELDS + _RUN_FIELDS},
        "xrows": P(),
        "meta": P(),
        "sn_slots": P(),
        "rtile": P(),
        "entry_row": P(axis),
        "entry_lane": P(axis),
        "entry_plo": P(),
        "entry_phi": P(),
        "diag_map": P(),
        "perm": P(),
        "iperm": P(),
    }
    body = functools.partial(
        _solve_body, n=plan.n, R_local=layout.R_local, dtype=dtype,
        axis=axis,
    )
    fn = jax.jit(
        jax.shard_map(
            body, mesh=mesh,
            in_specs=(spec_in, P(axis), P(), P(), P(axis)),
            out_specs=P(),
            check_vma=False,
        )
    )
    with jax.default_matmul_precision("highest"):
        x = fn(arrays, Lx_sharded, rhs, d, colmask)
    return x[:, 0] if squeeze else x
