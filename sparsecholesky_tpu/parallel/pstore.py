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
    _DERIVED_FIELDS,
    _FIELDS,
    _RUN_FIELDS,
    _Static,
    _host_panel_rows,
    _host_vsrc,
    _panel_factor,
    apply_schur_update,
    default_extend,
    pack_group_run_tables,
    gather_panels,
    scatter_panels,
)
from .shard import subtree_partition


# ---------------------------------------------------------------------------
# Host-side layout + plan sharding


@dataclasses.dataclass(frozen=True)
class StoreLayout:
    """Host-side description of the partitioned store.

    Per-chip local layout (C2, with distributed wide separators):

      [ narrow top | own wide segments | own subtrees | halo | pad ]

    Narrow top = above-frontier supernodes with < wide_nseg lane segments,
    replicated with identical addressing on every chip.  Wide top
    supernodes are distributed SEGMENT-CYCLIC: lane segment k of wide
    supernode s (an [m_s, 128] contiguous chunk, segment-major store)
    lives only on chip (woff[s] + k) % ndev, with the per-supernode offset
    chosen greedily for flop balance.  Updates that target a wide segment
    are written to a chip-local HALO copy of that segment and merged into
    the owner by an exchange (one psum over the touched-segment union)
    at the frontier and at each top wavefront level."""

    ndev: int
    R_top: int                # rows of the (narrow) shared top region
    R_local: int              # uniform per-chip store rows (incl. tail pad)
    owner: np.ndarray         # [ns] chip of each supernode (-1 = top)
    local_start: np.ndarray   # [ndev, ns] local first row of block s on its
                              # holder chips; -1 where the chip holds no copy
    nrows_of: np.ndarray      # [ns] store rows of each block
    wide: np.ndarray | None = None       # [ns] wide-top mask
    wseg_start: dict | None = None       # (s, k) -> owner-local row
    wslots: tuple | None = None          # per chip: tuple of (s, k) held
    halo_start: dict | None = None       # (c, s, k) -> halo-local row
    halo_span: tuple | None = None       # per chip (first_row, nrows)
    exch: tuple | None = None            # sorted touched (s, k) pairs
    woff: np.ndarray | None = None       # [ns] cyclic offset per supernode

    def wide_owner(self, s: int, k: int) -> int:
        o = int(self.woff[s]) if self.woff is not None else s
        return (o + k) % self.ndev

    def global_to_local(self, c: int):
        """Shift table: global store row -> chip-c local row per block."""
        return self.local_start[c]


def _touched_wide_segments(plan, owner, wide, ndev):
    """(chip -> set of (s, seg)) update targets landing on wide blocks,
    plus the union.  Wide supernodes' own trailing updates are computed
    (partially) on EVERY chip, and narrow-top sources run round-robin, so
    their wide targets count for all chips.  Fully vectorized: a 1M-row
    wide-separator plan has millions of raw runs, and the former
    per-run/per-segment Python loop was a plan-compile wall (VERDICT r2
    weak item 7)."""
    row_off = plan.row_off
    block_m = plan.block_m
    nseg_max = int(plan.block_nseg.max()) + 1
    owned_keys = []          # (chip, t, g) for single-chip sources
    top_keys = []            # (t, g) touched by every chip
    for lev in plan.levels:
        for b in lev:
            if b.runs_raw is None or not len(b.runs_raw):
                continue
            rr = b.runs_raw.astype(np.int64)
            tgt = np.searchsorted(row_off, rr[:, 4], side="right") - 1
            wmask = wide[tgt]
            if not wmask.any():
                continue
            rw = rr[wmask]
            tw = tgt[wmask]
            seg = (rw[:, 4] - row_off[tw]) // block_m[tw]
            # a window may cross into the next segment by < run_tile rows
            seg2 = np.minimum(
                (rw[:, 4] + rw[:, 3] - 1 + plan.run_tile - row_off[tw])
                // block_m[tw],
                plan.block_nseg[tw] - 1,
            )
            oc = owner[b.sn_ids[rw[:, 0]]]
            # expand [seg, seg2] spans into individual (t, g) pairs
            span = (seg2 - seg + 1).astype(np.int64)
            idx = np.repeat(np.arange(len(tw)), span)
            g = (np.arange(int(span.sum()))
                 - np.repeat(np.cumsum(span) - span, span)) + seg[idx]
            key = tw[idx] * nseg_max + g
            oce = oc[idx]
            top_keys.append(key[oce < 0])
            ow = oce >= 0
            if ow.any():
                owned_keys.append(oce[ow] * (plan.ns * nseg_max)
                                  + key[ow])
    topk = (np.unique(np.concatenate(top_keys)) if top_keys
            else np.zeros(0, np.int64))
    ownk = (np.unique(np.concatenate(owned_keys)) if owned_keys
            else np.zeros(0, np.int64))
    top_pairs = {(int(k) // nseg_max, int(k) % nseg_max) for k in topk}
    per_chip = [set(top_pairs) for _ in range(ndev)]
    for k in ownk:
        c, rest = divmod(int(k), plan.ns * nseg_max)
        per_chip[c].add((rest // nseg_max, rest % nseg_max))
    union = sorted(set().union(*per_chip)) if per_chip else []
    return per_chip, union


def build_layout(plan: FactorizePlan, ndev: int,
                 wide_nseg: int | None = 1) -> StoreLayout:
    """Partition the store over ``ndev`` chips.

    ``wide_nseg=1`` (default): EVERY top supernode with >= 1 lane segment
    distributes segment-cyclically — the scaling projection
    (evidence/scaling_projection.md) shows it dominates wide_nseg=2 on
    every config, since the replicated narrow-top region shrinks to the
    supernodes with zero full segments.  Pass ``None`` to replicate the
    whole top (no distributed wides), or a larger threshold to only
    distribute the widest separators.
    """
    if getattr(plan, "layout", "compact") != "compact":
        raise ValueError(
            "the partitioned/sharded store requires a compact-layout plan "
            "(compile_plan(..., layout=\"compact\")); the aligned layout "
            "is single-chip only")
    owner, _is_top = subtree_partition(plan, ndev)
    ns = plan.ns
    nrows_of = (plan.block_m * plan.block_nseg).astype(np.int64)
    wide = np.zeros(ns, dtype=bool)
    if wide_nseg is not None:
        wide = (owner < 0) & (plan.block_nseg >= wide_nseg)
    local_start = np.full((ndev, ns), -1, dtype=np.int64)
    off = 0
    for s in range(ns):
        if owner[s] < 0 and not wide[s]:
            local_start[:, s] = off     # narrow top: same slot on all chips
            off += int(nrows_of[s])
    R_top = off

    # flop-aware cyclic offsets (round 5): segment k of wide supernode s
    # lives on chip (woff[s] + k) % ndev.  The fixed round-2 offset
    # woff[s] = s ignored per-segment flops, leaving the wide phase
    # 0.75-balanced at irregular3d:32 / 8 dev; a greedy min-max placement
    # over per-segment weights (node flops / nseg, on top of the subtree
    # base loads) reaches 0.98 (evidence/scaling_projection.md round 5).
    woff = np.arange(ns, dtype=np.int64) % max(ndev, 1)
    if wide.any():
        wf = plan.block_w.astype(np.float64)
        mbf = plan.block_m.astype(np.float64) - wf
        node_f = wf ** 3 / 3 + wf * wf * mbf + wf * mbf * mbf
        load = np.zeros(ndev)
        for s in range(ns):
            if owner[s] >= 0:
                load[owner[s]] += node_f[s]
        witems = sorted(
            ((node_f[s] / max(int(plan.block_nseg[s]), 1), int(s))
             for s in np.flatnonzero(wide)),
            reverse=True,
        )
        for pseg, s in witems:
            nseg = max(int(plan.block_nseg[s]), 1)
            ks = np.arange(nseg)
            best_off, best_max = 0, np.inf
            for off in range(ndev):
                trial = load.copy()
                np.add.at(trial, (off + ks) % ndev, pseg)
                tm = trial.max()
                if tm < best_max:
                    best_off, best_max = off, tm
            woff[s] = best_off
            np.add.at(load, (best_off + ks) % ndev, pseg)

    # wide segments, cyclic by (woff[s] + k) % ndev, in (s, k) order per
    # chip (slot j of a chip's copies of s is always segment j*ndev + k0,
    # so the k -> slot map k // ndev holds for any offset)
    wseg_start: dict = {}
    wslots: list[list] = [[] for _ in range(ndev)]
    wends = [R_top] * ndev
    for s in range(ns):
        if not wide[s]:
            continue
        m = int(plan.block_m[s])
        for k in range(int(plan.block_nseg[s])):
            c = (int(woff[s]) + k) % ndev
            wseg_start[(s, k)] = wends[c]
            wslots[c].append((s, k))
            wends[c] += m
    wtop = max(wends)

    ends = []
    for c in range(ndev):
        o = wtop
        for s in range(ns):
            if owner[s] == c:
                local_start[c, s] = o
                o += int(nrows_of[s])
        ends.append(o)
    sub_end = max(ends)

    halo_start: dict = {}
    halo_span: list = []
    exch: list = []
    if wide.any():
        per_chip, exch = _touched_wide_segments(plan, owner, wide, ndev)
        hends = []
        for c in range(ndev):
            o = sub_end
            h0 = o
            for (s, k) in sorted(per_chip[c]):
                halo_start[(c, s, k)] = o
                o += int(plan.block_m[s])
            halo_span.append((h0, o - h0))
            hends.append(o)
        R_local = max(hends) + STORE_TAIL_PAD
    else:
        halo_span = [(sub_end, 0)] * ndev
        R_local = sub_end + STORE_TAIL_PAD
    return StoreLayout(ndev=ndev, R_top=R_top, R_local=R_local,
                       owner=owner, local_start=local_start,
                       nrows_of=nrows_of, wide=wide,
                       wseg_start=wseg_start,
                       wslots=tuple(tuple(w) for w in wslots),
                       halo_start=halo_start, halo_span=tuple(halo_span),
                       exch=tuple(exch), woff=woff)


def _remap_rows(plan, lay: StoreLayout, c: int, grows: np.ndarray
                ) -> np.ndarray:
    """Global store rows -> chip-c local rows.  Wide-block rows map to the
    chip's HALO copy of the containing segment (the uniform rule for
    update targets); rows of blocks the chip does not hold map out of
    bounds."""
    grows = np.asarray(grows, dtype=np.int64)
    t = np.searchsorted(plan.row_off, grows, side="right") - 1
    out = np.full(len(grows), lay.R_local, dtype=np.int64)
    rel = grows - plan.row_off[t]
    widet = lay.wide[t] if lay.wide is not None else np.zeros(len(t), bool)
    # non-wide: plain shift where held
    held = ~widet & (lay.local_start[c][t] >= 0)
    out[held] = lay.local_start[c][t[held]] + rel[held]
    # wide: halo segment copy
    wi = np.where(widet)[0]
    for i in wi:
        s = int(t[i])
        m = int(plan.block_m[s])
        k = int(rel[i]) // m
        h = lay.halo_start.get((c, s, k))
        if h is not None:
            out[i] = h + int(rel[i]) - k * m
    return out


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

    # urow0 remap: wide-aware (wide targets -> chip halo segment copies)
    urow0 = b.urow0[k].astype(np.int64)
    urow0 = _remap_rows(plan, lay, c, urow0.ravel()).reshape(urow0.shape)
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
        rr[:, 4] = _remap_rows(plan, lay, c, rr[:, 4])
        order = np.lexsort((rr[:, 2], rr[:, 1], rr[:, 0]))
        rr = rr[order]
    else:
        rr = np.zeros((0, 5), np.int64)
    fields.update(runs_raw=rr.astype(np.int32))
    return Bucket(**fields)


def _np32(a):
    return np.ascontiguousarray(a, dtype=np.int32).ravel()


def shard_plan_partitioned(plan: FactorizePlan, ndev: int,
                           extend: str = "auto",
                           wide_nseg: int | None = 1):
    """Compile the partitioned-store device plan.

    Returns the arrays dict for ``factorize_partitioned`` plus the
    StoreLayout (host-side).  Flat buffers are [ndev, total] (device axis
    sharded over the mesh); meta is static:
      (local steps, R_top, top levels [(steps, xrow span, wide steps)])
    ``wide_nseg`` enables distributed wide separators: top supernodes with
    at least that many lane segments are segment-cyclically distributed
    and factored cooperatively (see _wide_step).
    """
    if getattr(plan, "layout", "compact") != "compact":
        raise ValueError(
            "the partitioned/sharded store requires a compact-layout plan "
            "(compile_plan(..., layout=\"compact\")); the aligned layout "
            "is single-chip only")
    if extend == "auto":
        extend = default_extend()
    lay = build_layout(plan, ndev, wide_nseg)
    owner = lay.owner
    wide = lay.wide
    itemsize = plan.dtype.itemsize
    dummy_row = lay.R_local - plan.run_tile
    use_runs = extend != "scatter"

    chunks = {f: [] for f in _FIELDS + _RUN_FIELDS + _DERIVED_FIELDS}
    offs = {f: 0 for f in _FIELDS + _RUN_FIELDS + _DERIVED_FIELDS}
    xchunks, xoff = [], 0
    slots: list[list[int]] = [[] for _ in range(ndev)]

    def deal(cbuckets, rchunks, panels=True):
        """Stack chip buckets' device fields into the flat buffers.
        ``panels=False`` skips the pridx grid (wide steps never
        gather/scatter whole panels)."""
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
        # host-precomputed index grids (chip-local row coordinates)
        derived = {}
        if panels:
            derived["pridx"] = [_host_panel_rows(cb, lay.R_local)
                                for cb in cbuckets]
        if cbuckets[0].mb_pad:
            derived["vsrc"] = [_host_vsrc(cb) for cb in cbuckets]
        for f in _DERIVED_FIELDS:
            vals = derived.get(f)
            if vals is None:
                spec[f] = None
                continue
            out = np.stack(vals, axis=0)
            flat2 = np.ascontiguousarray(out, np.int32).reshape(ndev, -1)
            chunks[f].append(flat2)
            spec[f] = (offs[f], out.shape[1:])
            offs[f] += flat2.shape[1]
        if use_runs and cbuckets[0].mb_pad:
            # group-consistent packed window(+region) tables across the
            # ndev chip views — the same planner the single-chip scan
            # groups use (numeric.pack_group_run_tables), so the Pallas
            # region/window kernels run identically under shard_map
            stacked, maxn = pack_group_run_tables(
                cbuckets, cbuckets[0].utile_g, itemsize, plan.run_tile,
                dummy_row)
            for f in _RUN_FIELDS:
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
    # every chip addresses the narrow top region identically; chip index
    # c==0 is the canonical holder for A's narrow-top entries.  Wide top
    # supernodes become dedicated distributed steps (_wide_step).
    # per-(chip, supernode) wide-slot lists, built once (the former
    # per-step wslots scan was quadratic in the wide-supernode count)
    _slots_by: dict = {}
    if wide is not None and wide.any():
        for c in range(ndev):
            for (ws, wk) in lay.wslots[c]:
                _slots_by.setdefault((c, ws), []).append(wk)

    def wide_step_meta(s: int, b, bi: int):
        """Static + dealt fields of one distributed wide supernode."""
        nseg = int(plan.block_nseg[s])
        m = int(plan.block_m[s])
        nsegc = -(-nseg // ndev)
        seg_start = np.full((ndev, nsegc), lay.R_local, np.int64)
        seg_id = np.full((ndev, nsegc), -1, np.int64)
        for c in range(ndev):
            for j, wk in enumerate(_slots_by.get((c, s), ())):
                seg_start[c, j] = lay.wseg_start[(s, wk)]
                seg_id[c, j] = wk
        so = offs["row0"]  # piggyback extra ints on the row0 buffer
        extra = np.concatenate([seg_start, seg_id], axis=1)
        chunks["row0"].append(
            np.ascontiguousarray(extra, np.int32).reshape(ndev, -1))
        offs["row0"] += extra.shape[1]
        # the wide supernode's own Schur-update bucket (partial updates
        # from each chip's owned columns; targets remapped to halos)
        rch: list = []
        cbs = [_chip_bucket(plan, b, [bi], lay, c, 1) for c in range(ndev)]
        spec = deal(cbs, rch, panels=False)
        for c in range(ndev):
            slots[c].append(int(s))
        return (int(s), int(plan.block_w[s]),
                int(plan.block_m[s] - plan.block_w[s]), m, nseg, nsegc,
                b.w_pad, b.mb_pad, spec, b.utile_g, rch[0], so,
                int(plan.S.sn_ptr[s]),
                int(lay.woff[s]) if lay.woff is not None else int(s))

    top_meta = []
    for lev in plan.levels:
        lmeta = []
        wmeta = []
        rowlists = []
        for b in lev:
            istop = owner[b.sn_ids] < 0
            iswide = wide[b.sn_ids]
            for bi in np.where(istop & iswide)[0]:
                wmeta.append(wide_step_meta(int(b.sn_ids[bi]), b, int(bi)))
            topk = np.where(istop & ~iswide)[0]
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
            # touched local narrow-top rows: panel rows + update targets
            # (identical addressing on all chips)
            for i in topk:
                s = int(b.sn_ids[i])
                r0 = int(lay.local_start[0, s])
                rowlists.append(np.arange(r0, r0 + int(lay.nrows_of[s])))
            # narrow update-target rows from EVERY chip's runs (wide
            # targets ride the halo exchange instead)
            for cb in cbs:
                rrr = cb.runs_raw
                if rrr is not None and len(rrr):
                    keep = rrr[:, 4] < lay.R_top
                    for st, ln in zip(rrr[keep, 4], rrr[keep, 3]):
                        rowlists.append(np.arange(st, st + ln))
        if lmeta or wmeta:
            xrows = (np.unique(np.concatenate(rowlists)).astype(np.int32)
                     if rowlists else np.zeros(0, np.int32))
            span = (xoff, len(xrows))
            xchunks.append(xrows)
            xoff += len(xrows)
            top_meta.append((tuple(lmeta), span, tuple(wmeta)))

    # ---- per-chip entry scatter maps ------------------------------------
    # entry e lands in block t = supernode of its column; narrow-top
    # entries go to chip 0 only (the frontier psum would multiply
    # duplicates), owned entries to their owner chip, wide entries to the
    # target segment's owner; all other chips drop to out-of-bounds.
    ecol = plan.entry_plo.astype(np.int64)   # permuted column = L column
    t = plan.S.sn_id[ecol].astype(np.int64)
    rel = plan.entry_row.astype(np.int64) - plan.row_off[t]
    is_w = wide[t]
    m_t = plan.block_m[t]
    seg = np.where(is_w, rel // np.maximum(m_t, 1), 0)
    segrel = rel - seg * m_t
    woffa = (lay.woff if lay.woff is not None
             else np.arange(plan.ns, dtype=np.int64))
    woc = (woffa[t] + seg) % ndev
    wbase = np.zeros(len(ecol), dtype=np.int64)
    wi = np.where(is_w)[0]
    for i in wi:
        wbase[i] = lay.wseg_start.get((int(t[i]), int(seg[i])), lay.R_local)
    erow = np.empty((ndev, len(ecol)), dtype=np.int64)
    for c in range(ndev):
        shift = lay.local_start[c] - plan.row_off
        keep = (~is_w) & ((owner[t] == c) | ((owner[t] < 0) & (c == 0)))
        erow[c] = np.where(keep, plan.entry_row + shift[t], lay.R_local)
        erow[c][wi] = np.where(
            woc[wi] == c, wbase[wi] + segrel[wi], lay.R_local
        )

    # ---- wide-segment exchange spec -------------------------------------
    # one buffer row per row of every touched wide segment (lay.exch):
    # each chip contributes its halo copy (zeros where it has none), the
    # psum'd sum lands in the owner's live segment.
    XR = int(sum(plan.block_m[s] for s, _k in lay.exch)) if lay.exch else 0
    exch_src = np.full((ndev, max(XR, 1)), lay.R_local, np.int64)
    exch_dst = np.full((ndev, max(XR, 1)), lay.R_local, np.int64)
    xo = 0
    for (s, k) in lay.exch:
        m = int(plan.block_m[s])
        oc = lay.wide_owner(s, k)
        for c in range(ndev):
            h = lay.halo_start.get((c, s, k))
            if h is not None:
                exch_src[c, xo : xo + m] = np.arange(h, h + m)
        exch_dst[oc, xo : xo + m] = np.arange(
            lay.wseg_start[(s, k)], lay.wseg_start[(s, k)] + m
        )
        xo += m
    halo0 = lay.halo_span[0][0] if lay.halo_span else lay.R_local
    halo_max = max((hl for _h0, hl in lay.halo_span), default=0)

    flat = {
        f: jnp.asarray(
            np.concatenate(chunks[f], axis=1)
            if chunks[f] else np.zeros((ndev, 0), np.int32)
        )
        for f in _FIELDS + _RUN_FIELDS + _DERIVED_FIELDS
    }
    arrays = {
        "flat": flat,
        "xrows": jnp.asarray(
            np.concatenate(xchunks) if xchunks else np.zeros(0, np.int32)
        ),
        "exch_src": jnp.asarray(exch_src.astype(np.int32)),
        "exch_dst": jnp.asarray(exch_dst.astype(np.int32)),
        "meta": _Static((tuple(local_meta), lay.R_top, tuple(top_meta),
                         (XR, halo0, halo_max))),
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


def _wide_step(Lx, delta, arrays, wm, *, R_local, dtype, axis, ndev,
               minpivs, extend, rtile):
    """Cooperatively factor one segment-cyclically-distributed wide top
    supernode (the sharded counterpart of numeric._dense_instore_step):
    per lane segment k, the owner chip factors the 128-wide column panel
    from its local segment, the panel broadcasts with one masked psum, and
    every chip right-looking-updates its own later segments — a 1D
    column-cyclic distributed blocked LLT.  The trailing Schur update to
    assembly-tree ancestors is computed PARTIALLY per chip (its own
    columns only; partial sums meet at the halo exchange) through the
    ordinary apply_schur_update on a zero-padded full-width L21."""
    (_s, w, mb, m, nseg, nsegc, w_pad, mb_pad, spec, utile_g, rchunks,
     so, _sp0, o) = wm
    ss = jax.lax.slice(
        arrays["flat"]["row0"], (0, so), (1, so + 2 * nsegc)
    ).reshape(2, nsegc)
    segst, segid = ss[0], ss[1]
    me = jax.lax.axis_index(axis)
    rr = jax.lax.broadcasted_iota(jnp.int32, (LANE, 1), 0)
    minpiv = jnp.asarray(jnp.inf, dtype)

    # padded row space: the last segment's 128-row diagonal block may
    # extend past the block's m true rows (w not a lane multiple, small
    # mb); pad rows are zero and factor to identity via the dead-lane term
    M = max(m, nseg * LANE)
    cc = jax.lax.broadcasted_iota(jnp.int32, (1, LANE), 1)
    mm = jax.lax.broadcasted_iota(jnp.int32, (LANE, 1), 0)

    def read_seg(j):
        return jax.lax.dynamic_slice(Lx, (segst[j], jnp.int32(0)), (m, LANE))

    def write_seg(j, S):
        return jax.lax.dynamic_update_slice(Lx, S, (segst[j], jnp.int32(0)))

    def candidate(k, seg):
        """Factor the 128-wide column panel of segment k from its (fully
        updated) local chunk; returns (cand [M,128], min pivot)."""
        wk = min(LANE, w - k * LANE)
        segp = jnp.pad(seg, ((0, M - m), (0, 0))) if M > m else seg
        D = segp[k * LANE : (k + 1) * LANE]
        D = jnp.tril(D) + jnp.swapaxes(jnp.tril(D, -1), 0, 1)
        dead = (cc >= wk) | (mm + k * LANE >= m)
        D = D + ((rr == cc) & dead).astype(dtype)         # dead ident
        Lkk = jnp.linalg.cholesky(D)
        dg = jnp.diagonal(Lkk)[:wk]
        piv = jnp.min(jnp.where(jnp.isnan(dg), -jnp.inf, dg))
        Lkk = jnp.where(jnp.isnan(Lkk), 0.0, Lkk)
        rest = segp[(k + 1) * LANE :]
        L21s = jax.lax.linalg.triangular_solve(
            Lkk, rest, left_side=False, lower=True, transpose_a=True
        )
        # mask the solve's dead lanes too: rest's dead lanes are zero in
        # the store, but the solve back-substitutes through Lkk's junk
        # dead columns (the B1*L22^-T / chol(I - X X^T) block of a
        # last-segment window that overlaps below rows), producing
        # nonzero garbage there; written back unmasked it violates the
        # dead-lanes-stay-zero store invariant and leaks into the partial
        # Schur update (bug found on irregular3d(18): a wide supernode
        # with mb > 0 and w % 128 != 0)
        L21s = jnp.where(cc < wk, L21s, 0.0)
        Lkk_m = jnp.where(cc < wk, Lkk, 0.0)              # zero dead lanes
        return jnp.concatenate(
            [jnp.zeros((k * LANE, LANE), dtype), Lkk_m, L21s], axis=0
        ), piv

    def seg_update(k, panel, j, S):
        """Apply broadcast panel k's trailing update to slot j's chunk."""
        kj = segid[j]
        valid = (kj > k) & (kj >= 0)
        wj = jnp.clip(w - kj * LANE, 0, LANE)
        panelp = jnp.concatenate(
            [panel, jnp.zeros((LANE, LANE), dtype)], axis=0
        )
        Pj = jax.lax.dynamic_slice(
            panelp, (jnp.maximum(kj, 0) * LANE, jnp.int32(0)), (LANE, LANE)
        )
        Pj = jnp.where(rr < wj, Pj, 0.0)
        upd = jnp.einsum("ik,jk->ij", panel[:m], Pj,
                         preferred_element_type=dtype)
        return S - jnp.where(valid, 1.0, 0.0) * upd

    # Software-pipelined column-cyclic LLT (the comm/compute overlap,
    # SURVEY.md §7 step 7): after panel k's broadcast lands, the chip
    # holding segment k+1 updates THAT slot first and issues segment
    # k+1's masked-psum broadcast; the remaining slots' rank-128 trailing
    # updates are dataflow-independent of it, so XLA's latency-hiding
    # scheduler runs the k+1 collective concurrently with panel k's
    # trailing compute.
    own0 = me == (o + 0) % ndev
    cand, piv = candidate(0, read_seg(0))
    panel = jax.lax.psum(jnp.where(own0, cand, 0.0), axis)
    minpiv = jnp.minimum(
        minpiv, jax.lax.psum(jnp.where(own0, piv, 0.0), axis)
    )
    Lx = write_seg(0, jnp.where(own0, panel[:m], read_seg(0)))
    for k in range(nseg):
        nxt = k + 1
        if nxt < nseg:
            jn = nxt // ndev
            ownn = me == (o + nxt) % ndev
            # early-update the next panel's slot, factor, issue broadcast
            Sn = seg_update(k, panel, jn, read_seg(jn))
            Lx = write_seg(jn, Sn)
            candn, pivn = candidate(nxt, Sn)
            paneln = jax.lax.psum(jnp.where(ownn, candn, 0.0), axis)
            minpiv = jnp.minimum(
                minpiv, jax.lax.psum(jnp.where(ownn, pivn, 0.0), axis)
            )
        # trailing updates on the remaining slots overlap the broadcast
        for j in range(nsegc):
            if nxt < nseg and j == nxt // ndev:
                continue  # already updated above
            Lx = write_seg(j, seg_update(k, panel, j, read_seg(j)))
        if nxt < nseg:
            jn = nxt // ndev
            ownn = me == (o + nxt) % ndev
            Lx = write_seg(jn, jnp.where(ownn, paneln[:m], read_seg(jn)))
            panel = paneln
    minpivs.append(minpiv[None])

    # partial Schur update to ancestors from my own columns
    if mb and mb_pad:
        L21p = jnp.zeros((mb, w_pad), dtype)
        colp = jax.lax.broadcasted_iota(jnp.int32, (LANE, w_pad), 1)
        rowp = jax.lax.broadcasted_iota(jnp.int32, (LANE, w_pad), 0)
        for j in range(nsegc):
            kj = segid[j]
            segv = jax.lax.dynamic_slice(
                Lx, (segst[j] + w, jnp.int32(0)), (mb, LANE)
            )
            E = ((colp == kj * LANE + rowp) & (kj >= 0)).astype(dtype)
            L21p = L21p + jnp.einsum("ik,kc->ic", segv, E,
                                     preferred_element_type=dtype)
        if mb_pad > mb:
            L21p = jnp.pad(L21p, ((0, mb_pad - mb), (0, 0)))
        bl = _unpack_chip(arrays["flat"], spec)
        delta = apply_schur_update(delta, bl, L21p[None], R_local, dtype,
                                   utile_g, extend, rchunks, rtile)
    return Lx, delta


def _body(arrays, Ax, *, R_local, dtype, axis, ndev, scale, extend, rtile):
    local_meta, R_top, top_meta, (XR, halo0, halo_max) = arrays["meta"].value

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

    def exchange(Lx, src_of):
        """Merge halo contributions into segment owners: one psum over the
        touched-segment union buffer.  ``src_of`` is the array holding the
        contributions (Lx in the local phase, the level delta above)."""
        if not XR:
            return Lx
        contrib = jnp.take(src_of, arrays["exch_src"][0], axis=0,
                           mode="fill", fill_value=0)
        contrib = jax.lax.psum(contrib, axis)
        return Lx.at[arrays["exch_dst"][0]].add(contrib, mode="drop")

    # ---- local phase: zero collectives ---------------------------------
    for spec, utile_g, rchunks in local_meta:
        Lx = step(Lx, spec, utile_g, rchunks)

    # ---- frontier: one psum of the shared narrow-top region, plus the
    # halo exchange for wide segments ------------------------------------
    if R_top:
        top = jax.lax.slice(Lx, (0, 0), (R_top, LANE))
        top = jax.lax.psum(top, axis)
        Lx = jax.lax.dynamic_update_slice(Lx, top, (0, 0))
    if XR:
        Lx = exchange(Lx, Lx)
        Lx = jax.lax.dynamic_update_slice(
            Lx, jnp.zeros((halo_max, LANE), dtype), (halo0, 0)
        )

    # ---- top phase: per-level psum of touched narrow rows + halo
    # exchange; wide separators factor cooperatively ----------------------
    for lmeta, (xo, xl), wmeta in top_meta:
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
        for wm in wmeta:
            Lx, delta = _wide_step(
                Lx, delta, arrays, wm, R_local=R_local, dtype=dtype,
                axis=axis, ndev=ndev, minpivs=minpivs, extend=extend,
                rtile=rtile,
            )
        xr = jax.lax.slice(arrays["xrows"], (xo,), (xo + xl,))
        h = jnp.take(delta, xr, axis=0, mode="fill", fill_value=0)
        h = jax.lax.psum(h, axis)
        Lx = Lx.at[xr].add(h, mode="drop")
        Lx = exchange(Lx, delta)

    minpiv = (jnp.concatenate(minpivs) if minpivs
              else jnp.zeros((0,), dtype=dtype))
    return Lx, minpiv, d


def factorize_partitioned(plan: FactorizePlan, Ax, mesh: Mesh, *,
                          arrays=None, layout: StoreLayout | None = None,
                          scale: bool = False, check: bool = True,
                          extend: str = "auto",
                          wide_nseg: int | None = 1):
    """Distributed numeric factorization on the partitioned store.

    Returns (Lx_sharded [ndev, R_local, 128], layout, d).  Use
    ``gather_full`` to reassemble the replicated global store.

    ``extend="auto"`` resolves like the single-chip path
    (numeric.default_extend): the Pallas DMA kernels on real TPUs, the
    portable XLA scatter on CPU meshes.
    """
    axis = mesh.axis_names[0]
    ndev = mesh.devices.size
    if extend == "auto":
        extend = default_extend()
    if arrays is None or layout is None:
        arrays, layout = shard_plan_partitioned(plan, ndev, extend,
                                                wide_nseg)
    dtype = jnp.dtype(plan.dtype)

    spec = {
        "flat": {f: P(axis) for f in _FIELDS + _RUN_FIELDS + _DERIVED_FIELDS},
        "xrows": P(),
        "exch_src": P(axis),
        "exch_dst": P(axis),
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
        _body, R_local=layout.R_local, dtype=dtype, axis=axis, ndev=ndev,
        scale=scale, extend=extend, rtile=plan.run_tile,
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
        if layout.wide is not None and layout.wide[s]:
            m = int(plan.block_m[s])
            g0 = int(plan.row_off[s])
            for k in range(int(plan.block_nseg[s])):
                c = layout.wide_owner(s, k)
                r0 = int(layout.wseg_start[(s, k)])
                out[g0 + k * m : g0 + (k + 1) * m] = Lxs[c][r0 : r0 + m]
            continue
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


def _wide_unpack(arrays, wm, axis):
    """Shared wide-step context: segment-slot start rows + ids, my chip
    index, and the below-target solution indices."""
    (_s, w, mb, m, nseg, nsegc, w_pad, mb_pad, spec, _ug, _rc, so,
     sp0, o) = wm
    ss = jax.lax.slice(
        arrays["flat"]["row0"], (0, so), (1, so + 2 * nsegc)
    ).reshape(2, nsegc)
    bidx = None
    if mb:
        bl = _unpack_chip(arrays["flat"], spec)
        bidx = bl.below_idx.reshape(-1)[:mb_pad]
    me = jax.lax.axis_index(axis)
    return o, w, mb, m, nseg, sp0, ss[0], me, bidx


def _wide_fsolve(y, Lx, arrays, wm, *, axis, ndev, dtype, n):
    """Forward-substitute one distributed wide supernode: column-cyclic
    blocked SpTRSV, the solve counterpart of _wide_step's LLT.  Per lane
    segment k the owner chip solves the 128-wide triangular block and
    computes the trailing update from its local segment (it holds ALL m
    rows of its columns); one masked psum broadcasts (z_k, update) and
    every chip applies it to its replicated y — the result is bitwise
    identical across chips, so no level-delta merge is involved."""
    o, w, mb, m, nseg, sp0, segst, me, bidx = _wide_unpack(arrays, wm, axis)
    nrhs = y.shape[1]
    M = max(m, nseg * LANE)
    cc = jax.lax.broadcasted_iota(jnp.int32, (1, LANE), 1)
    rr = jax.lax.broadcasted_iota(jnp.int32, (LANE, 1), 0)

    # rows 0..w-1: supernode rhs values; w..m-1: below-contribution
    # accumulator (starts zero); m..M-1: segment padding
    ysup = jax.lax.dynamic_slice(y, (jnp.int32(sp0), jnp.int32(0)), (w, nrhs))
    ysup = jnp.pad(ysup, ((0, M - w), (0, 0)))

    for k in range(nseg):
        j = k // ndev
        own = me == (o + k) % ndev
        S = jax.lax.dynamic_slice(Lx, (segst[j], jnp.int32(0)), (m, LANE))
        Sp = jnp.pad(S, ((0, M - m), (0, 0))) if M > m else S
        wk = min(LANE, w - k * LANE)
        D = jnp.tril(Sp[k * LANE : (k + 1) * LANE])
        D = D + ((rr == cc) & (cc >= wk)).astype(dtype)   # dead ident
        yk = ysup[k * LANE : (k + 1) * LANE]
        # rows >= wk inside the window are BELOW rows (or pads): their
        # store lanes >= wk are zero and ride the dead-identity diagonal,
        # so the solve returns y[r] - L21[r, :wk] z — exactly the updated
        # below accumulator.  Keep the full window; mask to the true
        # column entries only for the trailing term.
        zk = jax.lax.linalg.triangular_solve(
            D, yk, left_side=True, lower=True
        )
        zku = jnp.where(rr < wk, zk, 0.0)
        u = jnp.einsum("rc,ck->rk", Sp[(k + 1) * LANE :], zku,
                       preferred_element_type=dtype)
        payload = jnp.concatenate(
            [jnp.zeros((k * LANE, nrhs), dtype), zk, u], axis=0
        )
        payload = jax.lax.psum(jnp.where(own, payload, 0.0), axis)
        ysup = jnp.concatenate(
            [ysup[: k * LANE],
             payload[k * LANE : (k + 1) * LANE],
             ysup[(k + 1) * LANE :] - payload[(k + 1) * LANE :]],
            axis=0,
        )
    y = jax.lax.dynamic_update_slice(y, ysup[:w], (jnp.int32(sp0), jnp.int32(0)))
    if mb:
        bidx = jnp.where(bidx < 0, n, bidx)[:mb]
        y = y.at[bidx].add(ysup[w : w + mb], mode="drop")
    return y


def _wide_bsolve(x, Lx, arrays, wm, *, axis, ndev, dtype, n):
    """Backward-substitute one distributed wide supernode.  x_k depends on
    L[r, k-cols]^T x[r] for every later row r — and segment k's owner
    holds ALL m rows of its columns, so the transposed-gather is local;
    segments run last-to-first, one masked psum broadcast each."""
    o, w, mb, m, nseg, sp0, segst, me, bidx = _wide_unpack(arrays, wm, axis)
    nrhs = x.shape[1]
    M = max(m, nseg * LANE)
    cc = jax.lax.broadcasted_iota(jnp.int32, (1, LANE), 1)
    rr = jax.lax.broadcasted_iota(jnp.int32, (LANE, 1), 0)

    xs = jax.lax.dynamic_slice(x, (jnp.int32(sp0), jnp.int32(0)), (w, nrhs))
    if mb:
        bidx_s = jnp.where(bidx < 0, n, bidx)[:mb]
        xb = jnp.take(x, bidx_s, axis=0, mode="fill", fill_value=0)
        xr = jnp.concatenate(
            [xs, xb, jnp.zeros((M - m, nrhs), dtype)], axis=0
        )
    else:
        xr = jnp.pad(xs, ((0, M - w), (0, 0)))

    for k in reversed(range(nseg)):
        j = k // ndev
        own = me == (o + k) % ndev
        S = jax.lax.dynamic_slice(Lx, (segst[j], jnp.int32(0)), (m, LANE))
        Sp = jnp.pad(S, ((0, M - m), (0, 0))) if M > m else S
        wk = min(LANE, w - k * LANE)
        D = jnp.tril(Sp[k * LANE : (k + 1) * LANE])
        D = D + ((rr == cc) & (cc >= wk)).astype(dtype)
        t = xr[k * LANE : (k + 1) * LANE] - jnp.einsum(
            "rc,rk->ck", Sp[(k + 1) * LANE :], xr[(k + 1) * LANE :],
            preferred_element_type=dtype,
        )
        # the transposed solve pulls in L21[r, c] x[r] for below rows r
        # that sit INSIDE this window (rows >= wk carry their x values and
        # a dead-identity diagonal), so in-window below contributions are
        # handled by the solve itself; only the true column entries are
        # written back — rows >= wk keep their (below) values for earlier
        # segments' trailing terms.
        xk = jax.lax.linalg.triangular_solve(
            D, t, left_side=True, lower=True, transpose_a=True
        )
        xk = jax.lax.psum(jnp.where(own, xk, 0.0), axis)
        win = xr[k * LANE : (k + 1) * LANE]
        xk = jnp.where(rr < wk, xk, win)
        xr = jnp.concatenate(
            [xr[: k * LANE], xk, xr[(k + 1) * LANE :]], axis=0
        )
    return jax.lax.dynamic_update_slice(x, xr[:w], (jnp.int32(sp0), jnp.int32(0)))


def _solve_body(arrays, Lx, rhs, d, colmask, *, n, R_local, dtype, axis,
                ndev):
    local_meta, _R_top, top_meta, _exch = arrays["meta"].value
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
    # results merge with a per-level delta psum (mirrors factorize);
    # distributed wide supernodes follow — their steps are internally
    # psum-broadcast, so y stays replicated-identical with no extra merge
    for lmeta, _span, wmeta in top_meta:
        yp = y
        for spec, _u, _r in lmeta:
            y = fstep(y, _unpack_chip(arrays["flat"], spec))
        y = yp + jax.lax.psum(y - yp, axis)
        for wm in wmeta:
            y = _wide_fsolve(y, Lx, arrays, wm, axis=axis, ndev=ndev,
                             dtype=dtype, n=n)
    # backward, top then local subtrees
    x = y
    for lmeta, _span, wmeta in reversed(top_meta):
        for wm in reversed(wmeta):
            x = _wide_bsolve(x, Lx, arrays, wm, axis=axis, ndev=ndev,
                             dtype=dtype, n=n)
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
        "flat": {f: P(axis) for f in _FIELDS + _RUN_FIELDS + _DERIVED_FIELDS},
        "xrows": P(),
        "exch_src": P(axis),
        "exch_dst": P(axis),
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
        axis=axis, ndev=ndev,
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


def partition_report(plan: FactorizePlan, layout: StoreLayout) -> dict:
    """Estimated per-chip work/memory balance of a partitioned plan
    (VERDICT round-1 item 4: the shard_plan balance report).

    Flop attribution model (matches what factorize_partitioned actually
    executes — round 4 fixed the stale model that charged the narrow top
    as fully replicated compute):
      * subtree supernodes (owner >= 0): all flops on the owner chip;
      * wide top supernodes: segment-cyclic — panel, trailing-update and
        partial-Schur work all scale with the lane segments a chip holds,
        so each chip gets flops * (its segments / nseg);
      * narrow top supernodes: DEALT round-robin per bucket
        (shard_plan_partitioned's ``topk % ndev``), merged by the
        per-level delta psum.  Every chip executes the bucket dead-padded
        to the per-chip max count Bd at the bucket's padded tier shape,
        so the per-chip wall model charges Bd * tier_flops to ALL chips;
        the excess over the true top flops / ndev is reported as
        ``replicated_fraction`` (top-phase padding+sync overhead — only
        the narrow-top STORE is replicated, R_top rows).
    """
    S = plan.S
    ndev = layout.ndev
    local = np.zeros(ndev, dtype=np.int64)
    widef = np.zeros(ndev, dtype=np.int64)

    def fl_of(w, mb):
        return w ** 3 // 3 + w * w * mb + w * mb * mb

    for s in range(plan.ns):
        w = S.sn_width(s)
        mb = S.sn_height(s) - w
        fl = fl_of(w, mb)
        c = int(layout.owner[s])
        if c >= 0:
            local[c] += fl
        elif layout.wide is not None and layout.wide[s]:
            nseg = int(plan.block_nseg[s])
            segs = np.zeros(ndev, dtype=np.int64)
            for k in range(nseg):
                segs[layout.wide_owner(s, k)] += 1
            widef += fl * segs // nseg

    # narrow-top wall model: per bucket, dealt count per chip is
    # ceil-balanced by bucket position; all chips run the padded max
    top_per_chip = 0
    top_true = 0
    wide = layout.wide if layout.wide is not None else np.zeros(
        plan.ns, bool)
    for lev in plan.levels:
        for b in lev:
            own = layout.owner[b.sn_ids]
            topk = np.where((own < 0) & ~wide[b.sn_ids])[0]
            if not len(topk):
                continue
            Bd = int(np.bincount(topk % ndev, minlength=ndev).max())
            top_per_chip += Bd * fl_of(b.w_pad, b.mb_pad)
            for i in topk:
                s = int(b.sn_ids[i])
                top_true += fl_of(S.sn_width(s), S.sn_height(s)
                                  - S.sn_width(s))
    total = local + widef + top_per_chip
    mean_t, max_t = float(total.mean()), float(total.max())
    overhead = top_per_chip - top_true / ndev
    return {
        "ndev": ndev,
        "local_flops": local.tolist(),
        "wide_flops": widef.tolist(),
        "top_flops_per_chip": int(top_per_chip),
        "top_true_flops": int(top_true),
        "total_flops": total.tolist(),
        "store_bytes_per_chip": per_chip_bytes(layout, plan.dtype.itemsize),
        "replicated_store_rows": int(layout.R_top),
        "balance_efficiency": mean_t / max_t if max_t else 1.0,
        "replicated_fraction": overhead / max_t if max_t else 0.0,
    }
