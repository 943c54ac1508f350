"""Static plan compiler: symbolic analysis -> device-ready index maps.

This is the layer the reference does not have, and the one that makes the
design TPU-native (SURVEY.md §7 "design stance"): every irregular,
data-dependent decision — supernode shapes, panel row structures, where A's
values land, where each Schur-complement entry must be added — is resolved
*once* on the host into int32 index arrays of static shape.  The numeric
phase (numeric.py) is then a pure jittable function of (plan arrays, Ax)
whose only device ops are gathers, batched dense panel factorizations on
the MXU, batched SYRKs, and scatter-adds.

Storage layout of the factor ("block store"):
  L is stored per supernode as a dense (m_s x w_s) row-major block whose
  rows are sn_rows[s] and whose columns are the supernode's columns —
  the supernodal layout CHOLMOD uses, replacing the reference's global CSC
  + per-panel memoized scatter indices (panel::indices_,
  /root/reference/include/chol.hpp:1093).  Blocks are concatenated into one
  flat value buffer Lx of size N_L; slot N_L (one extra) permanently holds
  1.0 and is the gather target for padded diagonal positions.

Panel layout handed to the kernels (identity padding, maskless):
  Each supernode is padded to a bucket shape (w_pad, mb_pad) and assembled
  as a (w_pad + mb_pad) x w_pad panel:
    rows [0, w)            : the supernode's own columns (diagonal block)
    rows [w, w_pad)        : identity padding (1 on the diagonal)
    rows [w_pad, w_pad+mb) : the below-diagonal rows
    rows [w_pad+mb, ...)   : zero padding
  The padded panel is exactly blockdiag(real panel, I) plus zero rows, so
  the factorization of the padded panel *is* the factorization of the real
  panel — no masks anywhere on the device.

Schur updates ("extend-add"):
  After factoring supernode s, C = L21 @ L21^T must be subtracted from the
  ancestor entries (r_i, r_j) for below-rows r_i >= r_j.  The reference
  does this with a racy sparse scatter (apply_update,
  /root/reference/include/chol.hpp:1196-1216, race noted in SURVEY.md §2c);
  here every target is a precomputed flat slot in the block store and the
  device op is a single deterministic scatter-add.  Pairs whose target slot
  does not exist in the (amalgamation-expanded) pattern provably carry an
  exactly-zero contribution and are dropped via index -1.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from .csc import CSCMatrix, INDEX_DTYPE
from .errors import SymbolicError
from .symbolic import SymbolicFactor, analyze

# Padding tiers. Second-to-last dim of a f32 tile is 8; lane dim 128.
_W_TIERS = (8, 16, 32, 64, 128, 256)


def _pad_w(w: int) -> int:
    for t in _W_TIERS:
        if w <= t:
            return t
    return -(-w // 128) * 128


def _pad_mb(mb: int) -> int:
    if mb == 0:
        return 0
    tiers = (8, 16, 32, 48, 64, 96, 128, 192, 256, 384, 512, 768, 1024)
    for t in tiers:
        if mb <= t:
            return t
    return -(-mb // 512) * 512


@dataclasses.dataclass
class Bucket:
    """One batch of same-shape supernodes within a level."""

    w_pad: int
    mb_pad: int
    sn_ids: np.ndarray        # int32[B] supernode ids (for error reporting)
    gather_idx: np.ndarray    # int32[B, w_pad+mb_pad, w_pad] -> Lx_ext slot / -1
    scatter_idx: np.ndarray   # int32[B, w_pad+mb_pad, w_pad] -> Lx slot / -1
    update_idx: np.ndarray | None  # int32[B, mb_pad, mb_pad] -> Lx slot / -1
    col_idx: np.ndarray       # int32[B, w_pad] global (permuted) column ids / -1
    below_idx: np.ndarray     # int32[B, mb_pad] global (permuted) row ids / -1

    @property
    def batch(self) -> int:
        return len(self.sn_ids)

    @property
    def m_pad(self) -> int:
        return self.w_pad + self.mb_pad

    def flops(self) -> int:
        """MXU flops actually issued for this bucket (padded shapes)."""
        B, w, mb = self.batch, self.w_pad, self.mb_pad
        return B * (w**3 // 3 + w * w * mb + w * mb * mb)


@dataclasses.dataclass
class FactorizePlan:
    """Everything the numeric phase needs, fully host-resident."""

    S: SymbolicFactor
    n: int
    N_L: int                  # total block-store slots (excl. the ones slot)
    perm: np.ndarray          # permuted index -> original index
    iperm: np.ndarray         # original index -> permuted index
    block_off: np.ndarray     # int64[ns] offset of each supernode block
    block_w: np.ndarray       # int64[ns]
    block_m: np.ndarray       # int64[ns]
    init_map: np.ndarray      # int32[N_L] -> index into original Ax / -1
    slot_row: np.ndarray      # int32[N_L] global (permuted) row of each slot
    slot_col: np.ndarray      # int32[N_L] global (permuted) col of each slot
    diag_map: np.ndarray      # int32[n] -> index of A(i,i) in original Ax
    levels: list[list[Bucket]]
    dtype: np.dtype

    @property
    def ns(self) -> int:
        return self.S.ns

    def true_flops(self) -> int:
        return self.S.flops()

    def padded_flops(self) -> int:
        return sum(b.flops() for lev in self.levels for b in lev)

    def nnz_L(self) -> int:
        return self.S.supernodal_nnz()

    def extract_csc(self, Lx: np.ndarray) -> CSCMatrix:
        """Block store -> lower-triangular CSC (sorted), for inspection and
        oracle comparison — the export role of the reference's final L
        (/root/reference/include/chol.hpp:1407-1446 returns CSC directly)."""
        S = self.S
        n = self.n
        cols, rows, vals = [], [], []
        for s in range(S.ns):
            c0, c1 = int(S.sn_ptr[s]), int(S.sn_ptr[s + 1])
            w = c1 - c0
            r = S.sn_rows[s]
            m = len(r)
            block = np.asarray(Lx[self.block_off[s] : self.block_off[s] + m * w])
            block = block.reshape(m, w)
            for j in range(w):
                keep = np.arange(j, m)
                rows.append(r[keep])
                cols.append(np.full(m - j, c0 + j, dtype=np.int64))
                vals.append(block[keep, j])
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
) -> FactorizePlan:
    """Compile the static factorization plan for A (optionally permuted).

    ``perm`` maps permuted index -> original index; the factorization is of
    P A P^T.  ``S`` must be the symbolic analysis of the *permuted* matrix;
    if omitted it is computed here.
    """
    if A.sym != "upper":
        raise SymbolicError("compile_plan expects canonical upper CSC")
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
        S = analyze(pA, **(analyze_kwargs or {}))

    ns = S.ns
    block_w = (S.sn_ptr[1:] - S.sn_ptr[:-1]).astype(np.int64)
    block_m = np.array([len(r) for r in S.sn_rows], dtype=np.int64)
    block_sz = block_m * block_w
    block_off = np.zeros(ns, dtype=np.int64)
    np.cumsum(block_sz[:-1], out=block_off[1:])
    N_L = int(block_sz.sum())

    # ---- init map: block slot -> original Ax index (or -1) -------------
    # slot (s, i, j) holds L(global_row=rows[s][i], global_col=c0+j); its
    # initial value is (P A P^T)(row, col) = permuted-upper entry (col, row).
    # The permuted-upper entries are lexsorted by (column=hi, row=lo), so
    # key = hi*n + lo is globally sorted and one searchsorted resolves all
    # slots at once.
    init_map = np.full(N_L, -1, dtype=np.int64)
    slot_row = np.zeros(N_L, dtype=np.int64)
    slot_col = np.zeros(N_L, dtype=np.int64)
    entry_keys = pAi.astype(np.int64)  # lo (row within upper column)
    # recover the column (hi) of each entry from pAp
    entry_cols = np.repeat(np.arange(n, dtype=np.int64), np.diff(pAp))
    entry_keys = entry_cols * n + entry_keys
    q_keys, q_slots = [], []
    for s in range(ns):
        c0 = int(S.sn_ptr[s])
        w = int(block_w[s])
        m = int(block_m[s])
        rows = S.sn_rows[s]
        off = int(block_off[s])
        for j in range(w):
            gcol = c0 + j
            i = np.arange(j, m)  # rows[:w] == columns, so rows[j] == gcol
            slots = off + i * w + j
            slot_row[slots] = rows[i]
            slot_col[slots] = gcol
            # entry (gcol, rows[i]) lives in permuted-upper column rows[i]
            q_keys.append(rows[i] * n + gcol)
            q_slots.append(slots)
    if q_keys:
        q_keys = np.concatenate(q_keys)
        q_slots = np.concatenate(q_slots)
        pos = np.searchsorted(entry_keys, q_keys)
        pos_c = np.minimum(pos, max(len(entry_keys) - 1, 0))
        hit = (len(entry_keys) > 0) & (entry_keys[pos_c] == q_keys)
        init_map[q_slots[hit]] = pAe[pos_c[hit]]

    # diagonal entry index of each permuted column in the ORIGINAL Ax
    # (permuted-upper diagonal entries have lo == hi == j)
    diag_map = np.full(n, -1, dtype=np.int64)
    dkeys = np.arange(n, dtype=np.int64) * (n + 1)  # j*n + j
    dpos = np.searchsorted(entry_keys, dkeys)
    dpos_c = np.minimum(dpos, max(len(entry_keys) - 1, 0))
    dhit = (len(entry_keys) > 0) & (entry_keys[dpos_c] == dkeys)
    diag_map[dhit] = pAe[dpos_c[dhit]]

    # ---- per-level buckets ---------------------------------------------
    sn_of_col = S.sn_id
    levels_out: list[list[Bucket]] = []
    for lev in S.levels:
        groups: dict[tuple[int, int], list[int]] = {}
        for s in lev:
            s = int(s)
            w = int(block_w[s])
            mb = int(block_m[s]) - w
            key = (_pad_w(w), _pad_mb(mb))
            groups.setdefault(key, []).append(s)
        buckets = []
        for (w_pad, mb_pad), sns in sorted(groups.items()):
            buckets.append(
                _build_bucket(S, sns, w_pad, mb_pad, block_off, block_w, block_m, N_L)
            )
        levels_out.append(buckets)

    return FactorizePlan(
        S=S,
        n=n,
        N_L=N_L,
        perm=perm,
        iperm=iperm,
        block_off=block_off,
        block_w=block_w,
        block_m=block_m,
        init_map=init_map,
        slot_row=slot_row,
        slot_col=slot_col,
        diag_map=diag_map,
        levels=levels_out,
        dtype=np.dtype(dtype or A.data.dtype),
    )


def _build_bucket(S, sns, w_pad, mb_pad, block_off, block_w, block_m, N_L) -> Bucket:
    B = len(sns)
    m_pad = w_pad + mb_pad
    gather = np.full((B, m_pad, w_pad), -1, dtype=np.int64)
    scatter = np.full((B, m_pad, w_pad), -1, dtype=np.int64)
    update = np.full((B, mb_pad, mb_pad), -1, dtype=np.int64) if mb_pad else None
    col_idx = np.full((B, w_pad), -1, dtype=np.int64)
    below_idx = np.full((B, mb_pad), -1, dtype=np.int64) if mb_pad else np.zeros((B, 0), dtype=np.int64)

    ii = np.arange(m_pad)
    for b, s in enumerate(sns):
        c0 = int(S.sn_ptr[s])
        w = int(block_w[s])
        m = int(block_m[s])
        mb = m - w
        off = int(block_off[s])
        rows = S.sn_rows[s]

        # diagonal block rows [0, w): slot (i, j) -> off + i*w + j
        jj = np.arange(w)
        for i in range(w):
            base = off + i * w
            gather[b, i, :w] = base + jj
            # upper-triangle slots of the diagonal block are structurally
            # unused: gather 0 (they are never read meaningfully), scatter -1
            scatter[b, i, : i + 1] = base + jj[: i + 1]
        # identity padding rows [w, w_pad): diagonal -> ones slot N_L
        for i in range(w, w_pad):
            gather[b, i, i] = N_L
        # below rows [w_pad, w_pad + mb)
        for t in range(mb):
            base = off + (w + t) * w
            gather[b, w_pad + t, :w] = base + jj
            scatter[b, w_pad + t, :w] = base + jj

        col_idx[b, :w] = c0 + jj
        if mb:
            below_idx[b, :mb] = rows[w:]

        # update map: C[t_i, t_j] for below rows r_i >= r_j subtracts into
        # the slot of (r_i, r_j) in r_j's supernode block.
        if mb:
            br = rows[w:]
            tgt_sn = S.sn_id[br]  # supernode owning each below row as a column
            for tj in range(mb):
                r_j = int(br[tj])
                t = int(tgt_sn[tj])
                t_c0 = int(S.sn_ptr[t])
                t_w = int(block_w[t])
                t_off = int(block_off[t])
                t_rows = S.sn_rows[t]
                jloc = r_j - t_c0
                # positions of r_i (i >= j) within t's row list
                ri = br[tj:]
                pos = np.searchsorted(t_rows, ri)
                ok = (pos < len(t_rows)) & (t_rows[np.minimum(pos, len(t_rows) - 1)] == ri)
                flat = t_off + pos * t_w + jloc
                update[b, tj + np.arange(len(ri)), tj] = np.where(ok, flat, -1)

    # update was built transposed-in-j loop: update[b, i, j] currently holds
    # targets at column tj for rows >= tj — that is exactly C[i, j] lower.
    return Bucket(
        w_pad=w_pad,
        mb_pad=mb_pad,
        sn_ids=np.asarray(sns, dtype=INDEX_DTYPE),
        gather_idx=gather.astype(INDEX_DTYPE),
        scatter_idx=scatter.astype(INDEX_DTYPE),
        update_idx=update.astype(INDEX_DTYPE) if update is not None else None,
        col_idx=col_idx.astype(INDEX_DTYPE),
        below_idx=below_idx.astype(INDEX_DTYPE),
    )
