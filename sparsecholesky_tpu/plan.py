"""Static plan compiler: symbolic analysis -> device-ready index maps.

This is the layer the reference does not have, and the one that makes the
design TPU-native (SURVEY.md §7 "design stance"): every irregular,
data-dependent decision — supernode shapes, panel row structures, where A's
values land, where each Schur-complement entry must be added — is resolved
*once* on the host into compact int32 arrays of static shape.  The numeric
phase (numeric.py) is then a pure jittable function of (plan arrays, Ax)
whose only device ops are row gathers, batched dense panel factorizations
on the MXU, batched SYRK-style matmuls, and row scatter-adds.

Storage layout of the factor ("lane-aligned block store"):
  L is stored per supernode as a dense block whose rows are sn_rows[s] and
  whose columns are the supernode's columns — the supernodal layout CHOLMOD
  uses.  Every block row occupies one full 128-lane row of a global
  [R_L, 128] fp array: row (s, i) lives at Lx[row_off[s] + i, 0:w_s]; lanes
  >= w_s are dead (always zero).  Rationale: on TPU, element-granular
  gather/scatter runs ~3 orders of magnitude below HBM bandwidth, while
  whole-row (128-lane) gathers/scatters run near it — every indexed access
  in the numeric phase is therefore row-granular.  Strict-upper positions
  of the diagonal block exist but carry no meaning: every consumer masks
  them with tril, so kernels may freely write scratch there.

Affine panel addressing:
  The row index of panel row i of supernode s is row_off[s] + i — affine in
  one scalar per supernode, so gather/scatter row-index grids are computed
  on device with broadcasted iota; nothing of O(nnz(L)) size is ever
  materialized on the host.  Identity padding (rows [w, w_pad) of the
  assembled panel) is added arithmetically at gather time.

Initial values:
  One scatter of A's nnz entries at (entry_row, entry_lane) into the zeroed
  block store.

Schur updates ("extend-add"):
  After factoring supernode s, C = L21 @ L21^T must be subtracted from the
  ancestor entries (r_i, r_j) for below-rows r_i >= r_j.  The reference
  does this with a racy sparse scatter (apply_update,
  /root/reference/include/chol.hpp:1196-1216, race noted in SURVEY.md §2c).
  Here the update is decomposed per distinct ancestor supernode g (of which
  the below rows touch only a few):
    1. place L21's rows into a per-target workspace V[g, lane, :] at each
       column's lane ujloc(j) (one row-granular scatter),
    2. C_g = L21 @ V_g^T on the MXU — C_g[i, lane] is exactly the update for
       target row position up[i, g], already lane-aligned,
    3. one row-granular scatter-add into the target blocks.
  Pair terms with r_i < r_j land on strict-upper scratch positions and are
  harmless; rows i with no valid pair in g (i < uj0[g]) are masked to the
  out-of-bounds row.  Every (r_i >= r_j) target provably exists in the
  supernodal pattern: both lie in s's row set, so r_i is in the strict
  pattern of column r_j (fill path through s), which is contained in the
  row union of r_j's supernode.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from .csc import CSCMatrix, INDEX_DTYPE
from .errors import SymbolicError
from .symbolic import SymbolicFactor, analyze

# Lane width of the block store (f32 vector lane count).  Supernodes wider
# than LANE are stored SEGMENTED *segment-major*: lane segment k (columns
# [k*LANE, (k+1)*LANE) of the supernode) occupies m consecutive store rows
# at row_off[s] + k*m + i, so dense separators factor as single tall
# panels instead of chains of 128-column chunks exchanging Schur updates
# through the store.  Segment-major (rather than interleaving a logical
# row's segments) makes every Schur-update target a STRIDE-1 row run:
# consecutive positions within one (ancestor, segment) owner are
# consecutive store rows regardless of the ancestor's width, which is what
# lets the extend-add execute as contiguous run RMW instead of row
# scatter-add (see numeric.apply_schur_update / ops/extend_add.py).
LANE = 128

# Dead store rows appended past the last supernode block so run-granular
# RMW windows and region tiles (ops/extend_add.py) may safely overrun
# block boundaries, and so dummy windows/regions have a home.  These rows
# are ordinary dead rows: they stay zero (only ever receive masked +0),
# and the out-of-bounds sentinel row index R_L stays one past the
# allocation as before.  Must be >= REGION_BLK + max run tile.
STORE_TAIL_PAD = 1152

# Region tile of the region-batched extend-add kernel: windows sorted by
# target row are grouped into fixed tiles of REGION_BLK store rows
# (stride REGION_BLK - T so a window never straddles its tile); the
# kernel DMAs each region once and applies all its windows in VMEM.
REGION_BLK = 1024

# Padding tiers. Second-to-last dim of a f32 tile is 8; lane dim 128.
# Profiles trade padding waste (issued flops) against step-shape diversity
# (executed op count / dispatch overhead): "fine" minimizes padded flops,
# "coarse" minimizes distinct shapes.  Select per-plan via compile_plan's
# pad_profile or the SPARSECHOL_PAD env var.
_PAD_PROFILES = {
    "fine": (
        (8, 16, 32, 64, 128),
        (8, 16, 24, 32, 48, 64, 80, 96, 128, 160, 192, 224, 256, 320, 384,
         448, 512, 640, 768, 896, 1024, 1280, 1536),
        256,
    ),
    "fine-r1": (   # round-1 tier set, kept for comparison
        (8, 16, 32, 64, 128),
        (8, 16, 32, 48, 64, 96, 128, 192, 256, 384, 512, 768, 1024),
        512,
    ),
    "coarse": ((8, 32, 128), (32, 128, 512, 1024), 1024),
}


def _profile(name: str | None):
    import os

    name = name or os.environ.get("SPARSECHOL_PAD", "fine")
    return _PAD_PROFILES[name]


def _pad_w(w: int, tiers=_PAD_PROFILES["fine"][0]) -> int:
    for t in tiers:
        if w <= t:
            return t
    # wide (segmented) supernodes: multiples of LANE, coarser when huge —
    # there are only a handful of them (one per separator), so fine tiers
    # cost little compile time and save panel padding
    if w <= 2048:
        return -(-w // LANE) * LANE
    return -(-w // 512) * 512


def _pad_w_vec(w: np.ndarray, tiers) -> np.ndarray:
    t = np.asarray(tiers, dtype=np.int64)
    out = t[np.minimum(np.searchsorted(t, w), len(t) - 1)]
    out = np.where(w <= t[-1], out, -(-w // LANE) * LANE)
    return np.where(w <= 2048, out, -(-w // 512) * 512)


def _pad_mb_vec(mb: np.ndarray, tiers, coarse: int) -> np.ndarray:
    t = np.asarray(tiers, dtype=np.int64)
    out = t[np.minimum(np.searchsorted(t, mb), len(t) - 1)]
    out = np.where(mb <= t[-1], out, -(-mb // coarse) * coarse)
    return np.where(mb == 0, 0, out)


def _pad_mb(mb: int, tiers=_PAD_PROFILES["fine"][1], coarse: int = 512) -> int:
    if mb == 0:
        return 0
    for t in tiers:
        if mb <= t:
            return t
    return -(-mb // coarse) * coarse


# Tile edge for the extend-add i-dimension; must match numeric.UPDATE_TILE.
_UPDATE_TILE = 512

# Default row length of one extend-add RMW window (ops/extend_add.py).
# Runs of consecutive update-target store rows are chunked into windows of
# run_tile rows; the window DMA is run_tile x 128 regardless of the run's
# true length (tail rows add 0).  The per-plan tile is selected from the
# run-length histogram by _select_run_tile; the kernel is DMA-issue-bound
# at ~(250 + 4*T) ns/window (scripts_rmw_bench.py measurements on v5e), so
# small matrices favor small tiles and long-run large matrices favor
# 32-64.
RUN_TILE = 16

#: run-tile candidates (STORE_TAIL_PAD covers REGION_BLK + max tile)
_RUN_TILES = (8, 16, 24, 32, 48, 64, 96, 128)


def _select_run_tile(levels) -> int:
    """Pick the extend-add window length minimizing the modeled kernel
    time nwindows(T) * (250 + 4*T) ns over the plan's run lengths.
    ``SPARSECHOL_RUN_TILE`` overrides the choice (perf experiments)."""
    import os

    env = os.environ.get("SPARSECHOL_RUN_TILE")
    if env:
        T = int(env)
        if T not in _RUN_TILES:
            raise ValueError(f"SPARSECHOL_RUN_TILE must be one of "
                             f"{_RUN_TILES}, got {T}")
        return T
    lens = []
    for lev in levels:
        for b in lev:
            if b.runs_raw is not None and len(b.runs_raw):
                lens.append(b.runs_raw[:, 3].astype(np.int64))
    if not lens:
        return RUN_TILE
    lens = np.concatenate(lens)
    best, best_cost = RUN_TILE, np.inf
    for T in _RUN_TILES:
        cost = int(np.sum(-(-lens // T))) * (250 + 4 * T)
        if cost < best_cost:
            best, best_cost = T, cost
    return best

# Extend-add einsum transient cap per chunk (bytes); shared by the plan's
# run-table chunking and numeric.apply_schur_update.
C_CAP = 192 * 2**20


def update_chunks(B: int, mb_pad: int, g_pad: int, utile_g, itemsize: int):
    """The static (i-tile, batch-chunk) decomposition of one bucket's Schur
    update, shared verbatim between the einsum execution
    (numeric.apply_schur_update) and the run-table compiler (the rcoff
    layout of each chunk's C transient depends on it).

    Yields (ti, i0, i1, gt, b0, b1) with C chunk shape [b1-b0, gt, i1-i0,
    LANE] laid out row-major."""
    ntiles = -(-mb_pad // _UPDATE_TILE)
    if not utile_g:
        utile_g = (g_pad,) * ntiles
    for ti in range(ntiles):
        i0 = ti * _UPDATE_TILE
        i1 = min(mb_pad, i0 + _UPDATE_TILE)
        gt = min(int(utile_g[ti]), g_pad)
        per_b = gt * (i1 - i0) * LANE * itemsize
        bchunk = max(1, min(B, C_CAP // max(per_b, 1)))
        for b0 in range(0, B, bchunk):
            yield ti, i0, i1, gt, b0, min(B, b0 + bchunk)


def _pad_g(g: int) -> int:
    # ~1.2x-spaced tiers: the V workspace is [B, G_pad, LANE, w_pad], so
    # G rounding is pure gather/write padding traffic (0.115 GB of the
    # :48 V stream under the former 1.5x tiers, scripts round 5); finer
    # tiers trade a few more distinct bucket sigs for ~2/3 of that
    for t in (1, 2, 3, 4, 5, 6, 8, 10, 12, 14, 16, 20, 24, 28, 32, 40,
              48, 56, 64, 80, 96, 112, 128):
        if g <= t:
            return t
    return -(-g // 32) * 32


@dataclasses.dataclass
class Bucket:
    """One batch of same-padded-shape supernodes within a level.

    All index arrays are compact: O(B * (w_pad + mb_pad * G)) total.  Panel
    row grids derive on device from row0/w/mb (numeric.panel_rows)."""

    w_pad: int
    mb_pad: int
    sn_ids: np.ndarray        # int32[B] supernode ids (for error reporting)
    row0: np.ndarray          # int32[B] first store row of each supernode
    w: np.ndarray             # int32[B] true width
    mb: np.ndarray            # int32[B] true below-row count
    col_idx: np.ndarray       # int32[B, w_pad] global (permuted) column ids / -1
    below_idx: np.ndarray     # int32[B, mb_pad] global (permuted) row ids / -1
    # factored Schur-update map (all None when mb_pad == 0):
    # Distinct "owners" are (ancestor supernode, 128-lane segment) pairs,
    # so every owner spans <= LANE lanes even when the ancestor is wide.
    ug: np.ndarray | None     # int32[B, mb_pad] rank of column j's owner
    ujloc: np.ndarray | None  # int32[B, mb_pad] lane of column j in its owner
    up: np.ndarray | None     # int32[B, mb_pad, G_pad] row position in owner
    urow0: np.ndarray | None  # int32[B, G_pad] store row of owner's row 0
    ustride: np.ndarray | None  # int32[B, G_pad] store rows per owner row
    uj0: np.ndarray | None    # int32[B, G_pad] first below index owned
    uG: np.ndarray | None     # int32[B] number of real owners
    # static schedule hint: for each UPDATE_TILE i-tile, the max (over the
    # batch) number of leading owner groups with uj0 < tile end — owners are
    # sorted by uj0, so groups beyond this bound have no valid row in the
    # tile and their C slice is never computed (kills the triangle + G
    # padding waste of the extend-add)
    utile_g: tuple = ()
    # raw update-target runs, host-only (compiled into per-chunk hazard-
    # scheduled window tables by numeric.build_runs, whose chunk layout
    # depends on scan-group-wide utile_g maxima): int32[nr, 5] rows of
    # (bsrc, g, i_start, length, rstart) — a maximal stretch of below rows
    # i_start..i_start+length-1 whose owner positions are consecutive, so
    # their updates land at consecutive store rows rstart.., all within one
    # UPDATE_TILE i-tile.  Stride is always 1 (segment-major store).
    runs_raw: np.ndarray | None = None

    @property
    def batch(self) -> int:
        return len(self.sn_ids)

    @property
    def m_pad(self) -> int:
        return self.w_pad + self.mb_pad

    @property
    def g_pad(self) -> int:
        return 0 if self.up is None else self.up.shape[2]

    def flops(self, itemsize: int = 4) -> int:
        """MXU flops actually issued for this bucket (padded shapes):
        panel LLT + TRSM + the lane-aligned extend-add matmuls.  The
        extend-add term follows the executed chunk schedule
        (update_chunks + the per-tile owner bound utile_g), not the full
        [G_pad, mb_pad] grid."""
        B, w, mb = self.batch, self.w_pad, self.mb_pad
        f = B * (w**3 // 3 + w * w * mb)
        if mb:
            for _ti, i0, i1, gt, b0, b1 in update_chunks(
                    B, mb, self.g_pad, self.utile_g, itemsize):
                f += (b1 - b0) * gt * (i1 - i0) * LANE * w * 2
        return f


@dataclasses.dataclass
class FactorizePlan:
    """Everything the numeric phase needs, fully host-resident."""

    S: SymbolicFactor
    n: int
    R_L: int                  # total block-store rows (the store is [R_L, 128])
    perm: np.ndarray          # permuted index -> original index
    iperm: np.ndarray         # original index -> permuted index
    row_off: np.ndarray       # int64[ns] first store row of each supernode
    block_w: np.ndarray       # int64[ns]
    block_m: np.ndarray       # int64[ns]
    block_nseg: np.ndarray    # int64[ns] store rows per logical block row
    entry_row: np.ndarray     # int64[nnz(A)] store row of each A entry
    entry_lane: np.ndarray    # int64[nnz(A)] store lane of each A entry
    entry_plo: np.ndarray     # int32[nnz(A)] permuted min coordinate (L column)
    entry_phi: np.ndarray     # int32[nnz(A)] permuted max coordinate (L row)
    diag_map: np.ndarray      # int32[n] -> index of A(i,i) in original Ax
    levels: list[list[Bucket]]
    dtype: np.dtype
    run_tile: int = RUN_TILE  # extend-add RMW window rows (_select_run_tile)
    # Store layout (see module docstring):
    #   "compact": supernode s's segment k occupies block_m[s] rows at
    #     row_off[s] + k*block_m[s]; below rows directly follow the diagonal
    #     block (offset block_w[s]).  Row offsets in supernode-id order.
    #   "aligned": each supernode's block is padded to its bucket's panel
    #     shape — segment stride seg_stride[s] = w_pad + mb_pad rows, below
    #     rows at offset below_off[s] = w_pad — and blocks are laid out in
    #     STEP order so a bucket's panels are ONE contiguous store slab.
    #     Panel assembly then runs as a dense slice + reshape at HBM copy
    #     bandwidth instead of a row-granular gather (the measured ~10 GB/s
    #     datapath floor of the compact layout), at the cost of a larger
    #     store (the padding rows).
    #   "hybrid": per-bucket-key mix — keys chosen by compile_plan get
    #     aligned placement (and the slab fast path), the rest compact;
    #     per-supernode below_off/seg_stride carry the truth and
    #     numeric.build_runs re-derives each bucket's addressing from
    #     them, so the execution layer has no layout-global switch.
    layout: str = "compact"
    below_off: np.ndarray | None = None   # int64[ns] row offset of below rows
    seg_stride: np.ndarray | None = None  # int64[ns] store rows per segment

    def __post_init__(self):
        # compact-layout defaults (also upgrades plans deserialized from
        # pre-layout archives)
        if self.below_off is None:
            self.below_off = self.block_w.astype(np.int64)
        if self.seg_stride is None:
            self.seg_stride = self.block_m.astype(np.int64)

    @property
    def ns(self) -> int:
        return self.S.ns

    def true_flops(self) -> int:
        return self.S.flops()

    def padded_flops(self) -> int:
        return sum(b.flops() for lev in self.levels for b in lev)

    def nnz_L(self) -> int:
        return self.S.supernodal_nnz()

    def store_bytes(self) -> int:
        return self.R_L * LANE * self.dtype.itemsize

    def block(self, Lx2d: np.ndarray, s: int) -> np.ndarray:
        """Host view of supernode s's (m x w) block from the 2D store
        (segment-major: segment k occupies rows [r0 + k*stride, ...); in the
        aligned layout the below rows sit at offset below_off[s] and the
        padding rows in between are skipped)."""
        r0 = int(self.row_off[s])
        m = int(self.block_m[s])
        w = int(self.block_w[s])
        nseg = int(self.block_nseg[s])
        stride = int(self.seg_stride[s])
        boff = int(self.below_off[s])
        rows = (
            np.asarray(Lx2d[r0 : r0 + stride * nseg])
            .reshape(nseg, stride, LANE)
            .transpose(1, 0, 2)
            .reshape(stride, nseg * LANE)
        )
        rows = np.concatenate([rows[:w], rows[boff : boff + (m - w)]])
        return rows[:, :w]

    def extract_csc(self, Lx2d: np.ndarray, row_scale: np.ndarray | None = None
                    ) -> CSCMatrix:
        """Block store -> lower-triangular CSC (sorted), for inspection and
        oracle comparison — the export role of the reference's final L
        (/root/reference/include/chol.hpp:1407-1446 returns CSC directly).

        ``row_scale`` (length n, permuted order) multiplies each row, used
        to undo equilibration."""
        S = self.S
        n = self.n
        cols, rows, vals = [], [], []
        for s in range(S.ns):
            c0, c1 = int(S.sn_ptr[s]), int(S.sn_ptr[s + 1])
            w = c1 - c0
            r = S.sn_rows[s]
            m = len(r)
            block = self.block(Lx2d, s)
            for j in range(w):
                keep = np.arange(j, m)
                rows.append(r[keep])
                cols.append(np.full(m - j, c0 + j, dtype=np.int64))
                v = block[keep, j]
                if row_scale is not None:
                    v = v * row_scale[r[keep]]
                vals.append(v)
        rows = np.concatenate(rows)
        cols = np.concatenate(cols)
        vals = np.concatenate(vals)
        order = np.lexsort((rows, cols))
        rows, cols, vals = rows[order], cols[order], vals[order]
        indptr = np.zeros(n + 1, dtype=INDEX_DTYPE)
        indptr[1:] = np.cumsum(np.bincount(cols, minlength=n))
        return CSCMatrix(n, indptr, rows.astype(INDEX_DTYPE), vals, sym="none")


def _permuted_upper(A: CSCMatrix, iperm: np.ndarray):
    """Canonical upper CSC of P A P^T with, per stored entry, the index of
    the originating entry in A.data (so refactorization with new values
    needs no host work)."""
    n = A.n
    cols = np.repeat(np.arange(n, dtype=np.int64), np.diff(A.indptr))
    rows = A.indices.astype(np.int64)
    pr = iperm[rows]
    pc = iperm[cols]
    lo = np.minimum(pr, pc)
    hi = np.maximum(pr, pc)
    eidx = np.arange(A.nnz, dtype=np.int64)
    order = np.lexsort((lo, hi))
    lo, hi, eidx = lo[order], hi[order], eidx[order]
    # canonical upper CSC: column hi, row lo (entries unique after merge in A)
    indptr = np.zeros(n + 1, dtype=np.int64)
    indptr[1:] = np.cumsum(np.bincount(hi, minlength=n))
    return indptr, lo, eidx


def compile_plan(
    A: CSCMatrix,
    S: SymbolicFactor | None = None,
    *,
    perm: np.ndarray | None = None,
    dtype=None,
    analyze_kwargs: dict | None = None,
    pad_profile: str | None = None,
    layout: str = "compact",
) -> FactorizePlan:
    """Compile the static factorization plan for A (optionally permuted).

    ``perm`` maps permuted index -> original index; the factorization is of
    P A P^T.  ``S`` must be the symbolic analysis of the *permuted* matrix;
    if omitted it is computed here.

    ``layout`` selects the store layout (see FactorizePlan): "aligned" is
    the fast single-chip layout (panel assembly = dense slab slices);
    "compact" is the minimal-memory layout required by the partitioned
    multi-chip store (parallel/pstore.py); "hybrid" aligns only the
    bucket keys with the best panel-traffic-per-padding-row ratio under
    the SPARSECHOL_ALIGN_CAP budget (the big-plan middle ground: hot
    small buckets slab, the wide separators stay compact); "auto" picks
    aligned when the fully padded store fits SPARSECHOL_ALIGN_CAP bytes
    (default 8 GiB), else hybrid.
    """
    if layout not in ("compact", "aligned", "hybrid", "auto"):
        raise ValueError(f"unknown store layout {layout!r}")
    if A.sym != "upper":
        raise SymbolicError("compile_plan expects canonical upper CSC")
    if A.n == 0:
        raise SymbolicError("cannot factorize an empty (0 x 0) matrix")
    n = A.n
    if perm is None:
        perm = np.arange(n, dtype=np.int64)
    perm = np.asarray(perm, dtype=np.int64)
    iperm = np.empty(n, dtype=np.int64)
    iperm[perm] = np.arange(n, dtype=np.int64)

    pAp, pAi, pAe = _permuted_upper(A, iperm)

    if S is None:
        pA = CSCMatrix(
            n,
            pAp.astype(INDEX_DTYPE),
            pAi.astype(INDEX_DTYPE),
            np.zeros(len(pAi)),
            sym="upper",
        )
        kw = dict(analyze_kwargs or {})
        kw.setdefault("max_width", LANE)
        S = analyze(pA, **kw)

    ns = S.ns
    block_w = (S.sn_ptr[1:] - S.sn_ptr[:-1]).astype(np.int64)
    block_m = np.array([len(r) for r in S.sn_rows], dtype=np.int64)
    block_nseg = -(-block_w // LANE)

    import os

    # padded bucket key per supernode (shared by the store layout and the
    # per-level bucket grouping below — they MUST agree).
    # NOTE (round-5 falsification, scripts_smallplan.py): auto-selecting
    # the coarse profile for small plans looked like a 2.5x win under a
    # sync-every-iteration protocol (212.7 -> 84.6 ms on fem3d:16:3) but
    # LOSES under the production pipelined-dispatch pattern (27.5 ms fine
    # vs 35.1 ms coarse): with dispatch overlapped, the coarse mb tiers'
    # padded update-grid traffic dominates.  Fine tiers stay the one
    # default at every size.
    wt, mbt, mbc = _profile(pad_profile)
    w_pad_s = _pad_w_vec(block_w, wt)
    mb_pad_s = _pad_mb_vec(block_m - block_w, mbt, mbc)

    cap = int(os.environ.get("SPARSECHOL_ALIGN_CAP", 8 * 2**30))
    itemsize = np.dtype(dtype or A.data.dtype).itemsize
    if layout == "auto":
        aligned_rows = int(
            ((w_pad_s + mb_pad_s) * block_nseg).sum()
        ) + STORE_TAIL_PAD
        layout = "aligned" if aligned_rows * LANE * itemsize <= cap \
            else "hybrid"

    if layout in ("aligned", "hybrid"):
        m_pad_s = w_pad_s + mb_pad_s
        if layout == "aligned":
            sn_aligned = np.ones(ns, dtype=bool)
        else:
            # Hybrid: align (pad + slab-place) only the bucket keys whose
            # panel-assembly traffic best justifies their padding rows,
            # under the SPARSECHOL_ALIGN_CAP store budget.  Eligibility =
            # the key can actually take the dense-slab fast path
            # (numeric._slab_ok: segments per store block == w_pad/LANE
            # uniformly) and is not an in-store dense separator (which
            # never gathers panels, so alignment buys nothing there).
            nsp_s = np.maximum(1, w_pad_s // LANE)
            slabbable = (block_nseg == nsp_s) & (
                (w_pad_s <= LANE) | (w_pad_s == nsp_s * LANE)
            )
            # DENSE_INSTORE mirror (numeric.DENSE_INSTORE; kept in sync by
            # tests/test_layout.py::test_hybrid_instore_threshold)
            slabbable &= w_pad_s < 4096
            extra_s = (m_pad_s - block_m) * block_nseg      # rows added
            traffic_s = nsp_s * m_pad_s                     # rows copied
            keys = {}
            for s in range(ns):
                k = (int(w_pad_s[s]), int(mb_pad_s[s]))
                e = keys.setdefault(k, [0, 0, True])
                e[0] += int(extra_s[s])
                e[1] += int(traffic_s[s])
                e[2] = e[2] and bool(slabbable[s])
            compact_rows = int((block_m * block_nseg).sum()) + STORE_TAIL_PAD
            budget = cap // (LANE * itemsize) - compact_rows
            take = set()
            order_keys = sorted(
                (k for k, (ex, tr, el) in keys.items() if el),
                key=lambda k: keys[k][1] / (keys[k][0] + 1), reverse=True,
            )
            for k in order_keys:
                ex = keys[k][0]
                if ex <= budget:
                    take.add(k)
                    budget -= ex
            sn_aligned = np.array(
                [(int(w_pad_s[s]), int(mb_pad_s[s])) in take
                 for s in range(ns)], dtype=bool)
        below_off = np.where(sn_aligned, w_pad_s, block_w).astype(np.int64)
        seg_stride = np.where(sn_aligned, m_pad_s, block_m).astype(np.int64)
        block_alloc = seg_stride * block_nseg
        # step-order allocation: iterate levels, buckets in sorted-key
        # order, members in level order — each bucket's blocks become one
        # contiguous slab
        order = []
        for lev in S.levels:
            groups: dict[tuple[int, int], list[int]] = {}
            for s in lev:
                s = int(s)
                groups.setdefault(
                    (int(w_pad_s[s]), int(mb_pad_s[s])), []
                ).append(s)
            for key in sorted(groups):
                order.extend(groups[key])
        order = np.asarray(order, dtype=np.int64)
        sizes = block_alloc[order]
        offs = np.zeros(len(order), dtype=np.int64)
        np.cumsum(sizes[:-1], out=offs[1:])
        row_off = np.zeros(ns, dtype=np.int64)
        row_off[order] = offs
    else:
        below_off = block_w.astype(np.int64)
        seg_stride = block_m.astype(np.int64)
        block_alloc = block_m * block_nseg
        row_off = np.zeros(ns, dtype=np.int64)
        np.cumsum(block_alloc[:-1], out=row_off[1:])
    R_L = int(block_alloc.sum()) + STORE_TAIL_PAD
    if R_L + 2 >= np.iinfo(np.int32).max:
        raise SymbolicError(
            f"block store of {R_L} rows exceeds int32 addressing; "
            "partition the matrix (multi-chip block store) instead"
        )

    # ---- global sorted row-key table for O(log) position lookups --------
    # Segment s of R holds sn_rows[s] (sorted); key = s*n + row is globally
    # strictly increasing, so one searchsorted resolves (supernode, row) ->
    # position-within-supernode for any batch of queries.
    sn_row_off = np.zeros(ns + 1, dtype=np.int64)
    np.cumsum(block_m, out=sn_row_off[1:])
    R = np.concatenate(S.sn_rows) if ns else np.zeros(0, dtype=np.int64)
    seg_of = np.repeat(np.arange(ns, dtype=np.int64), block_m)
    K = seg_of * n + R

    sn_ptr = S.sn_ptr.astype(np.int64)

    def _positions(t: np.ndarray, r: np.ndarray) -> np.ndarray:
        """Position of row r within supernode t's row list (vectorized)."""
        g = np.searchsorted(K, t * n + r)
        return g - sn_row_off[t]

    # ---- entry scatter map: original A entry -> store (row, lane) -------
    # Entry (lo, hi) of the permuted upper pattern is L(hi, lo): owner
    # supernode t = sn_id[lo]; segment-major addressing:
    # row = row_off[t] + (jloc//LANE)*m_t + pos(hi), lane = jloc % LANE.
    lo = pAi.astype(np.int64)
    hi = np.repeat(np.arange(n, dtype=np.int64), np.diff(pAp))
    t = S.sn_id[lo].astype(np.int64)
    pos = _positions(t, hi)
    jloc = lo - sn_ptr[t]
    # aligned layout: below positions shift past the identity-padding rows
    off = pos + (pos >= block_w[t]) * (below_off[t] - block_w[t])
    entry_row = np.empty(A.nnz, dtype=np.int64)
    entry_lane = np.empty(A.nnz, dtype=np.int64)
    entry_plo = np.empty(A.nnz, dtype=np.int64)
    entry_phi = np.empty(A.nnz, dtype=np.int64)
    entry_row[pAe] = row_off[t] + (jloc // LANE) * seg_stride[t] + off
    entry_lane[pAe] = jloc % LANE
    entry_plo[pAe] = lo
    entry_phi[pAe] = hi

    # diagonal entry index of each permuted column in the ORIGINAL Ax
    diag_map = np.full(n, -1, dtype=np.int64)
    isdiag = lo == hi
    diag_map[lo[isdiag]] = pAe[isdiag]
    if (diag_map < 0).any():
        raise SymbolicError("matrix has structurally missing diagonal entries")

    # ---- per-level buckets ---------------------------------------------
    levels_out: list[list[Bucket]] = []
    for lev in S.levels:
        groups: dict[tuple[int, int], list[int]] = {}
        for s in lev:
            s = int(s)
            key = (int(w_pad_s[s]), int(mb_pad_s[s]))
            groups.setdefault(key, []).append(s)
        buckets = []
        for (w_pad, mb_pad), sns in sorted(groups.items()):
            buckets.append(
                _build_bucket(
                    S, sns, w_pad, mb_pad, row_off, block_w, block_m,
                    block_nseg, sn_row_off, K, n,
                    below_off=below_off, seg_stride=seg_stride,
                )
            )
        levels_out.append(buckets)

    return FactorizePlan(
        S=S,
        n=n,
        R_L=R_L,
        perm=perm,
        iperm=iperm,
        row_off=row_off,
        block_w=block_w,
        block_m=block_m,
        block_nseg=block_nseg,
        entry_row=entry_row,
        entry_lane=entry_lane,
        entry_plo=entry_plo,
        entry_phi=entry_phi,
        diag_map=diag_map,
        levels=levels_out,
        dtype=np.dtype(dtype or A.data.dtype),
        run_tile=_select_run_tile(levels_out),
        layout=layout,
        below_off=below_off,
        seg_stride=seg_stride,
    )


def _build_bucket(
    S, sns, w_pad, mb_pad, row_off, block_w, block_m, block_nseg,
    sn_row_off, K, n, *, below_off=None, seg_stride=None,
) -> Bucket:
    if below_off is None:
        below_off = block_w
    if seg_stride is None:
        seg_stride = block_m
    B = len(sns)
    sns_a = np.asarray(sns, dtype=np.int64)
    row0 = row_off[sns_a]
    w = block_w[sns_a]
    mb = block_m[sns_a] - w

    col_idx = np.full((B, w_pad), -1, dtype=np.int64)
    below_idx = np.full((B, mb_pad), -1, dtype=np.int64)
    sn_ptr = S.sn_ptr

    # distinct owners each panel's below rows touch: (ancestor supernode,
    # 128-lane segment) pairs, encoded as t * segbound + jloc // LANE so
    # every owner spans <= LANE lanes even when the ancestor is wide
    segbound = n // LANE + 2
    G_max = 1
    per_sn = []
    for b, s in enumerate(sns):
        c0 = int(sn_ptr[s])
        wb = int(w[b])
        mbb = int(mb[b])
        col_idx[b, :wb] = c0 + np.arange(wb)
        if mbb:
            br = S.sn_rows[s][wb:]
            below_idx[b, :mbb] = br
            tgt = S.sn_id[br].astype(np.int64)   # non-decreasing (br sorted)
            jloc = br - sn_ptr[tgt]
            keys = tgt * segbound + jloc // LANE  # sorted (br sorted)
            distinct = np.unique(keys)
            G_max = max(G_max, len(distinct))
            per_sn.append((b, br, tgt, jloc, keys, distinct))

    if mb_pad == 0:
        return Bucket(
            w_pad=w_pad, mb_pad=0,
            sn_ids=sns_a.astype(INDEX_DTYPE),
            row0=row0.astype(INDEX_DTYPE),
            w=w.astype(INDEX_DTYPE),
            mb=mb.astype(INDEX_DTYPE),
            col_idx=col_idx.astype(INDEX_DTYPE),
            below_idx=below_idx.astype(INDEX_DTYPE),
            ug=None, ujloc=None, up=None, urow0=None, ustride=None,
            uj0=None, uG=None,
        )

    G_pad = _pad_g(G_max)
    # the big maps are born INDEX_DTYPE: at 1M rows `up` alone is ~GB-scale
    # and the astype copies used to dominate plan compile time
    ug = np.zeros((B, mb_pad), dtype=INDEX_DTYPE)
    ujloc_a = np.zeros((B, mb_pad), dtype=INDEX_DTYPE)
    up = np.zeros((B, mb_pad, G_pad), dtype=INDEX_DTYPE)
    urow0 = np.zeros((B, G_pad), dtype=np.int64)
    ustride = np.ones((B, G_pad), dtype=np.int64)
    uj0 = np.full((B, G_pad), mb_pad, dtype=np.int64)  # pad: mask everything
    uG = np.zeros(B, dtype=np.int64)
    run_rows: list[np.ndarray] = []
    inc: list[tuple[int, int, int]] = []
    for pi, (b, br, tgt, jloc, keys, distinct) in enumerate(per_sn):
        mbb = len(br)
        G = len(distinct)
        uG[b] = G
        ug[b, :mbb] = np.searchsorted(distinct, keys)
        ujloc_a[b, :mbb] = jloc % LANE
        dt = distinct // segbound          # owner supernode of each group
        dseg = distinct % segbound         # owner lane segment
        # segment-major store: owner segment dseg starts seg_stride[t] rows
        # into the owner's block, and consecutive positions are consecutive
        # store rows (stride 1) for every owner width
        urow0[b, :G] = row_off[dt] + dseg * seg_stride[dt]
        ustride[b, :G] = 1
        uj0[b, :G] = np.searchsorted(keys, distinct)
        for gi, t in enumerate(dt.tolist()):
            inc.append((t, pi, gi))

    # position of every below row within every distinct owner's rows:
    # scatter each owner's row -> position table once, then gather per
    # (member, owner-group) incidence.  (This replaces a searchsorted into
    # the global 14M-key table per query, which dominated 1M-row plan
    # compiles at ~30s.)  Entries for rows not in the owner's list (the
    # i < uj0 masked region) read whatever the table holds — garbage by
    # contract, identical in role to the old insertion positions.
    inc.sort()
    tmp = np.zeros(n, dtype=np.int64)
    cur_t = -1
    for t, pi, gi in inc:
        if t != cur_t:
            rows_t = S.sn_rows[t]
            offv = np.arange(len(rows_t), dtype=np.int64)
            # store-row offset within the owner's segment: below positions
            # shift past the owner's identity-padding rows (aligned layout;
            # compact: below_off == w, no-op).  Runs of consecutive
            # positions crossing the w boundary split automatically at the
            # diff != 1 break below.
            wt_ = int(block_w[t])
            offv[wt_:] += int(below_off[t]) - wt_
            tmp[rows_t] = offv
            cur_t = t
        b, br = per_sn[pi][0], per_sn[pi][1]
        up[b, : len(br), gi] = tmp[br]

    for b, br, tgt, jloc, keys, distinct in per_sn:
        mbb = len(br)
        G = len(distinct)
        # raw runs: per owner group, maximal stretches of consecutive
        # positions (== consecutive store rows), split at i-tile edges —
        # vectorized over ALL groups at once (the per-group numpy-call
        # loop dominated 1M-row plan compiles)
        M = up[b, :mbb, :G]                      # [mbb, G]
        jj = np.arange(mbb)[:, None]
        valid = jj >= uj0[b, None, :G]
        brk = np.ones((mbb, G), dtype=bool)
        if mbb > 1:
            brk[1:] = (np.diff(M, axis=0) != 1) | (
                (jj[1:] % _UPDATE_TILE) == 0)
        isstart = valid & (brk | (jj == uj0[b, None, :G]))
        # gi-major flatten keeps each group's starts ascending in j
        flat = isstart.T.ravel()
        sidx = np.flatnonzero(flat)
        if len(sidx):
            gid = sidx // mbb
            jst = sidx % mbb
            nxt_j = np.empty(len(sidx), dtype=np.int64)
            nxt_j[:-1] = np.where(gid[:-1] == gid[1:], jst[1:], mbb)
            nxt_j[-1] = mbb
            rr = np.empty((len(sidx), 5), dtype=np.int64)
            rr[:, 0] = b
            rr[:, 1] = gid
            rr[:, 2] = jst
            rr[:, 3] = nxt_j - jst
            rr[:, 4] = urow0[b, gid] + M[jst, gid]
            run_rows.append(rr)

    # per-i-tile owner-group bound (owners sorted by uj0 within a panel)
    tile = _UPDATE_TILE
    ntiles = -(-mb_pad // tile)
    # padding entries hold uj0 == mb_pad and i1 <= mb_pad, so a plain
    # count of uj0 < i1 equals the original per-row searchsorted
    i1s = np.minimum(mb_pad, (np.arange(ntiles) + 1) * tile)
    counts = (uj0[None, :, :] < i1s[:, None, None]).sum(axis=2).max(axis=1)
    utile_g = np.maximum(counts, 1).tolist()

    return Bucket(
        w_pad=w_pad, mb_pad=mb_pad,
        sn_ids=sns_a.astype(INDEX_DTYPE),
        row0=row0.astype(INDEX_DTYPE),
        w=w.astype(INDEX_DTYPE),
        mb=mb.astype(INDEX_DTYPE),
        col_idx=col_idx.astype(INDEX_DTYPE),
        below_idx=below_idx.astype(INDEX_DTYPE),
        ug=ug,
        ujloc=ujloc_a,
        up=up,
        urow0=urow0.astype(INDEX_DTYPE),
        ustride=ustride.astype(INDEX_DTYPE),
        uj0=uj0.astype(INDEX_DTYPE),
        uG=uG.astype(INDEX_DTYPE),
        utile_g=tuple(utile_g),
        runs_raw=(
            np.concatenate(run_rows).astype(INDEX_DTYPE)
            if run_rows else np.zeros((0, 5), dtype=INDEX_DTYPE)
        ),
    )
