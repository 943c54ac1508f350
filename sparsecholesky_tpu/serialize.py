"""Plan serialization: save/load the compiled factorization plan.

The reference has no checkpoint/resume story (SURVEY.md §5); for sparse
direct solvers the artifact worth persisting is the *symbolic plan* — the
expensive host analysis — so a later process can numeric-factorize new
values on the same pattern without re-running analysis (the schol/chol
split as an on-disk contract).

Format: a single .npz (numpy archive).  Every bucket array is stored under
a "lev{i}/b{k}/<field>" key; list structure is reconstructed from a small
integer header.  No pickle anywhere — the file is pure arrays and loads
with allow_pickle=False.
"""

from __future__ import annotations

import os

import numpy as np

from .csc import INDEX_DTYPE
from .plan import Bucket, FactorizePlan
from .symbolic import SymbolicFactor

_FORMAT_VERSION = 6  # v6: store layout flag + per-sn below_off/seg_stride


def _bucket_fields(b: Bucket) -> dict:
    out = {
        "w_pad": np.int64(b.w_pad),
        "mb_pad": np.int64(b.mb_pad),
        "sn_ids": b.sn_ids,
        "row0": b.row0,
        "w": b.w,
        "mb": b.mb,
        "col_idx": b.col_idx,
        "below_idx": b.below_idx,
    }
    if b.ug is not None:
        out.update(ug=b.ug, ujloc=b.ujloc, up=b.up, urow0=b.urow0,
                   ustride=b.ustride, uj0=b.uj0, uG=b.uG,
                   utile_g=np.asarray(b.utile_g, dtype=np.int64),
                   runs_raw=b.runs_raw)
    return out


def save_plan(path: str, plan: FactorizePlan) -> None:
    """Serialize a FactorizePlan (including its SymbolicFactor) to .npz."""
    _write(path, _plan_payload(plan))


def _plan_payload(plan: FactorizePlan) -> dict:
    S = plan.S
    sn_row_off = np.zeros(S.ns + 1, dtype=np.int64)
    sn_row_off[1:] = np.cumsum([len(r) for r in S.sn_rows])
    sn_rows_flat = (
        np.concatenate(S.sn_rows) if S.ns else np.zeros(0, dtype=np.int64)
    )
    lev_off = np.zeros(len(S.levels) + 1, dtype=np.int64)
    lev_off[1:] = np.cumsum([len(l) for l in S.levels])
    levels_flat = (
        np.concatenate(S.levels) if S.levels else np.zeros(0, dtype=np.int64)
    )

    data = {
        "format_version": np.int64(_FORMAT_VERSION),
        "n": np.int64(plan.n),
        "R_L": np.int64(plan.R_L),
        "run_tile": np.int64(plan.run_tile),
        "layout": np.frombuffer(plan.layout.encode(), dtype=np.uint8),
        "below_off": plan.below_off,
        "seg_stride": plan.seg_stride,
        "dtype": np.frombuffer(str(plan.dtype).encode(), dtype=np.uint8),
        "perm": plan.perm,
        "iperm": plan.iperm,
        "row_off": plan.row_off,
        "block_w": plan.block_w,
        "block_m": plan.block_m,
        "block_nseg": plan.block_nseg,
        "entry_row": plan.entry_row,
        "entry_lane": plan.entry_lane,
        "entry_plo": plan.entry_plo,
        "entry_phi": plan.entry_phi,
        "diag_map": plan.diag_map,
        # symbolic factor
        "S/parent": S.parent,
        "S/post": S.post,
        "S/counts": S.counts,
        "S/sn_ptr": S.sn_ptr,
        "S/sn_id": S.sn_id,
        "S/sn_row_off": sn_row_off,
        "S/sn_rows_flat": sn_rows_flat,
        "S/sparent": S.sparent,
        "S/lev_off": lev_off,
        "S/levels_flat": levels_flat,
        "n_levels": np.int64(len(plan.levels)),
        "buckets_per_level": np.asarray(
            [len(l) for l in plan.levels], dtype=np.int64
        ),
    }
    if S.A_indptr is not None:
        data["S/A_indptr"] = S.A_indptr
        data["S/A_indices"] = S.A_indices
    for i, lev in enumerate(plan.levels):
        for k, b in enumerate(lev):
            for name, arr in _bucket_fields(b).items():
                data[f"lev{i}/b{k}/{name}"] = arr
    return data


def _write(path: str, data: dict) -> None:
    tmp = path + ".tmp.npz"
    np.savez_compressed(tmp, **data)
    os.replace(tmp, path)


def load_plan(path: str) -> FactorizePlan:
    """Load a FactorizePlan written by save_plan."""
    z = np.load(path, allow_pickle=False)
    ver = int(z["format_version"])
    if ver != _FORMAT_VERSION:
        raise ValueError(
            f"plan file format {ver} != supported {_FORMAT_VERSION}"
        )
    sn_ptr = z["S/sn_ptr"]
    ns = len(sn_ptr) - 1
    sn_row_off = z["S/sn_row_off"]
    flat = z["S/sn_rows_flat"]
    sn_rows = [
        flat[sn_row_off[s] : sn_row_off[s + 1]].astype(np.int64)
        for s in range(ns)
    ]
    lev_off = z["S/lev_off"]
    lflat = z["S/levels_flat"]
    levels_sched = [
        lflat[lev_off[i] : lev_off[i + 1]].astype(np.int64)
        for i in range(len(lev_off) - 1)
    ]
    S = SymbolicFactor(
        n=int(z["n"]),
        parent=z["S/parent"].astype(INDEX_DTYPE),
        post=z["S/post"].astype(INDEX_DTYPE),
        counts=z["S/counts"],
        sn_ptr=sn_ptr.astype(np.int64),
        sn_id=z["S/sn_id"].astype(INDEX_DTYPE),
        sn_rows=sn_rows,
        sparent=z["S/sparent"].astype(INDEX_DTYPE),
        levels=levels_sched,
        A_indptr=z["S/A_indptr"] if "S/A_indptr" in z else None,
        A_indices=(
            z["S/A_indices"].astype(INDEX_DTYPE)
            if "S/A_indices" in z
            else None
        ),
    )
    nlev = int(z["n_levels"])
    bpl = z["buckets_per_level"]
    levels = []
    for i in range(nlev):
        bl = []
        for k in range(int(bpl[i])):
            pre = f"lev{i}/b{k}/"
            has_upd = pre + "ug" in z
            bl.append(
                Bucket(
                    w_pad=int(z[pre + "w_pad"]),
                    mb_pad=int(z[pre + "mb_pad"]),
                    sn_ids=z[pre + "sn_ids"],
                    row0=z[pre + "row0"],
                    w=z[pre + "w"],
                    mb=z[pre + "mb"],
                    col_idx=z[pre + "col_idx"],
                    below_idx=z[pre + "below_idx"],
                    ug=z[pre + "ug"] if has_upd else None,
                    ujloc=z[pre + "ujloc"] if has_upd else None,
                    up=z[pre + "up"] if has_upd else None,
                    urow0=z[pre + "urow0"] if has_upd else None,
                    ustride=z[pre + "ustride"] if has_upd else None,
                    uj0=z[pre + "uj0"] if has_upd else None,
                    uG=z[pre + "uG"] if has_upd else None,
                    utile_g=(
                        tuple(int(v) for v in z[pre + "utile_g"])
                        if has_upd else ()
                    ),
                    runs_raw=z[pre + "runs_raw"] if has_upd else None,
                )
            )
        levels.append(bl)
    return FactorizePlan(
        S=S,
        n=int(z["n"]),
        R_L=int(z["R_L"]),
        perm=z["perm"],
        iperm=z["iperm"],
        row_off=z["row_off"],
        block_w=z["block_w"],
        block_m=z["block_m"],
        block_nseg=z["block_nseg"],
        entry_row=z["entry_row"],
        entry_lane=z["entry_lane"],
        entry_plo=z["entry_plo"],
        entry_phi=z["entry_phi"],
        diag_map=z["diag_map"],
        levels=levels,
        dtype=np.dtype(bytes(z["dtype"]).decode()),
        run_tile=int(z["run_tile"]),
        layout=bytes(z["layout"]).decode() if "layout" in z else "compact",
        below_off=z["below_off"] if "below_off" in z else None,
        seg_stride=z["seg_stride"] if "seg_stride" in z else None,
    )


# ---------------------------------------------------------------------------
# Factor serialization: the plan PLUS the numeric factor store — a complete
# on-disk solver state (load and solve without refactorizing).


def save_factor(path: str, F) -> None:
    """Serialize a CholeskyFactor (plan + [R_L,128] store + equilibration
    vector) to one .npz.  The original matrix A is NOT stored; reattach it
    at load time (``load_factor(path, A=A)``) to enable refinement."""
    data = _plan_payload(F.plan)
    data["factor/Lx"] = np.asarray(F.Lx)
    data["factor/d"] = np.asarray(F.d)
    data["factor/scaled"] = np.int64(bool(F.scaled))
    _write(path, data)


def load_factor(path: str, A=None):
    """Load a CholeskyFactor saved by save_factor.  Pass the original
    CSCMatrix ``A`` to re-enable iterative refinement (values must match
    the factored ones for refinement to converge)."""
    import jax.numpy as jnp

    from . import numeric as _numeric
    from .api import CholeskyFactor

    plan = load_plan(path)
    with np.load(path, allow_pickle=False) as z:
        Lx = jnp.asarray(z["factor/Lx"])
        d = jnp.asarray(z["factor/d"])
        scaled = bool(int(z["factor/scaled"]))
    arrays = _numeric.device_arrays(plan)
    return CholeskyFactor(plan, arrays, Lx, d, A=A, scaled=scaled)
