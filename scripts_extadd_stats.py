"""Host-side structural analysis of the extend-add update targets.

Answers the questions that decide the round-2 extend-add redesign:
  1. How many update rows (512B store-row RMWs) does the current scheme issue,
     and how much padding waste rides along?
  2. Run structure: if consecutive below rows map to consecutive positions in
     their owner (stride = owner nseg), long runs can execute as contiguous
     dynamic-slice RMW (~300 GB/s) instead of row scatter-add (~20-30 GB/s).
  3. Sibling collisions: how many scatter rows per level hit the same store
     row (batch-level pre-accumulation potential)?

Usage: python scripts_extadd_stats.py [poisson3d:48]
"""
import sys
import numpy as np

sys.path.insert(0, "/root/repo")
from sparsecholesky_tpu.cli import _load
from sparsecholesky_tpu.ordering import compute_ordering
from sparsecholesky_tpu.plan import compile_plan


def main(spec="poisson3d:48"):
    A, grid_shape = _load(spec)
    perm = compute_ordering(A, "nd-grid" if grid_shape else "amd",
                            grid_shape=grid_shape)
    plan = compile_plan(A, perm=perm, dtype=np.float32)

    tot_valid = 0          # valid (i, g) update rows
    tot_padded = 0         # rows incl. i/g padding the einsum actually computes
    run_hist = {}          # run length -> count (runs = consecutive positions)
    runs_total = 0
    stride_rows = {}       # ustride -> valid rows
    level_collision = []   # (level, rows, distinct_rows)
    span_inflate_num = 0   # sum of (span) over (b,g) vs valid rows
    per_owner_pairs = 0    # (source, ancestor-supernode) pairs after merging segments
    seg_groups = 0

    for li, lev in enumerate(plan.levels):
        lev_rows = []
        for b in lev:
            if b.up is None:
                continue
            B = b.batch
            ntile = -(-b.mb_pad // 512)
            for k in range(B):
                G = int(b.uG[k])
                mb = int(b.mb[k])
                seg_groups += G
                # padded rows the einsum computes: per tile, utile_g groups
                for ti in range(ntile):
                    i0, i1 = ti * 512, min(b.mb_pad, (ti + 1) * 512)
                    gt = min(b.utile_g[ti] if b.utile_g else b.g_pad, b.g_pad)
                    tot_padded += (i1 - i0) * gt
                owners = {}
                for g in range(G):
                    j0 = int(b.uj0[k, g])
                    if j0 >= mb:
                        continue
                    pos = b.up[k, j0:mb, g].astype(np.int64)
                    stride = int(b.ustride[k, g])
                    rows = int(b.urow0[k, g]) + pos * stride
                    nv = mb - j0
                    tot_valid += nv
                    stride_rows[stride] = stride_rows.get(stride, 0) + nv
                    lev_rows.append(rows)
                    # maximal runs of consecutive positions
                    brk = np.flatnonzero(np.diff(pos) != 1)
                    lens = np.diff(np.concatenate([[-1], brk, [nv - 1]]))
                    for L in lens:
                        run_hist[int(L)] = run_hist.get(int(L), 0) + 1
                    runs_total += len(lens)
                    span_inflate_num += int(pos.max() - pos.min() + 1)
                    okey = (int(b.urow0[k, g]) - 0, stride)  # approx owner id
                    owners.setdefault(okey, 0)
                per_owner_pairs += len(owners)
        if lev_rows:
            allr = np.concatenate(lev_rows)
            level_collision.append((li, len(allr), len(np.unique(allr))))

    print(f"=== {spec}  n={A.n} ===")
    print(f"valid update rows:   {tot_valid:,}  ({tot_valid*512/1e9:.3f} GB "
          f"written; RMW traffic ~3x)")
    print(f"einsum-computed rows:{tot_padded:,}  "
          f"(padding factor {tot_padded/max(tot_valid,1):.2f})")
    print(f"owner (b,g) groups:  {seg_groups:,}; runs: {runs_total:,}; "
          f"mean run len {tot_valid/max(runs_total,1):.1f}")
    print(f"span inflation (contig-slab RMW per group): "
          f"{span_inflate_num/max(tot_valid,1):.2f}x")
    byst = sorted(stride_rows.items())
    print("rows by owner stride:", {k: f"{v:,}" for k, v in byst})
    # run length CDF
    lens = sorted(run_hist.items())
    csum = 0
    tot = sum(l * c for l, c in lens)
    print("run-length CDF (rows covered by runs >= L):")
    acc = tot
    shown = []
    for L, c in lens:
        if L in (1, 2, 4, 8, 16, 32, 64, 128) or L == lens[-1][0]:
            ge = sum(l2 * c2 for l2, c2 in lens if l2 >= L)
            shown.append(f"  >={L}: {ge/tot:.3f}")
    print("\n".join(shown))
    coll = [(r, d) for _, r, d in level_collision]
    rows_all = sum(r for r, _ in coll)
    dist_all = sum(d for _, d in coll)
    print(f"per-level collision: {rows_all:,} rows -> {dist_all:,} distinct "
          f"({rows_all/max(dist_all,1):.2f}x dedup potential)")
    worst = sorted(level_collision, key=lambda t: t[1] - t[2])[-5:]
    print("worst levels (level, rows, distinct):", worst)


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "poisson3d:48")
