#!/usr/bin/env python
"""Scaling-efficiency projection for BASELINE configs 4/5 (VERDICT r3
item 7): from host-built partition layouts (pstore.build_layout) +
measured single-chip throughput, model 4/8-chip efficiency and show
replicated_fraction shrinking with n.

Model (documented in evidence/scaling_projection.md):
  T_chip(c)  = total_flops[c] / rate        (measured single-chip GF/s)
  T_comm     = psum_bytes * 2(ndev-1)/ndev / BW_ici + n_psum * lat
  efficiency = T_1chip / (ndev * (max_c T_chip + T_comm))

Usage: python scripts_scaling_projection.py
"""
import json
import sys

import numpy as np

sys.path.insert(0, "/root/repo")
import jax

jax.config.update("jax_platforms", "cpu")

#: measured single-chip true-GFLOP/s by workload class (BASELINE.md r3)
RATE = {"irregular3d": 300e9,   # conservative: irregular plans are less
                                # regular than poisson (measured r4 below)
        "poisson3d": 635e9}
BW_ICI = 180e9     # v5e ICI per-link ~45GB/s x 4 links, allreduce effective
PSUM_LAT = 5e-6    # per-collective latency (ICI hop + sync)


def project(spec, maker, ordering, ndevs=(4, 8), wide_nsegs=(1, 2)):
    from sparsecholesky_tpu.ordering import compute_ordering
    from sparsecholesky_tpu.plan import compile_plan, LANE
    from sparsecholesky_tpu.parallel import pstore

    A, grid = maker()
    perm = compute_ordering(A, ordering, grid_shape=grid)
    plan = compile_plan(A, perm=perm, layout="compact", dtype=np.float32)
    rate = RATE["poisson3d" if grid else "irregular3d"]
    rows = []
    for ndev in ndevs:
      for wide_nseg in wide_nsegs:
        lay = pstore.build_layout(plan, ndev, wide_nseg)
        rep = pstore.partition_report(plan, lay)
        # communication volume: frontier psum of the narrow top (R_top
        # rows) + one psum per top wavefront level of the touched top
        # region (upper bound: R_top) + halo segment exchanges
        owner = lay.owner
        top_sns = np.flatnonzero(owner < 0)
        if len(top_sns):
            lev_of = {}
            for li, lev in enumerate(plan.levels):
                for b in lev:
                    for s in b.sn_ids:
                        lev_of[int(s)] = li
            top_levels = len({lev_of[int(s)] for s in top_sns})
        else:
            top_levels = 0
        halo_rows = 0
        if lay.exch:
            halo_rows = sum(int(lay.nrows_of[s]) // max(int(plan.block_nseg[s]), 1)
                            for (s, k) in lay.exch)
        psum_bytes = (lay.R_top * LANE * 4) * (1 + top_levels) \
            + halo_rows * LANE * 4 * 2
        n_wide = int(lay.wide.sum()) if lay.wide is not None else 0
        # each distributed wide supernode factors cooperatively with >= 1
        # masked-psum broadcast per lane-segment group
        n_psum = 1 + top_levels * 2 + n_wide
        t_chips = np.array(rep["total_flops"], float) / rate
        t_comm = psum_bytes * 2 * (ndev - 1) / ndev / BW_ICI \
            + n_psum * PSUM_LAT
        t_1 = plan.true_flops() / rate
        eff = t_1 / (ndev * (t_chips.max() + t_comm))
        rows.append(dict(
            spec=spec, n=A.n, ndev=ndev, wide_nseg=wide_nseg,
            n_wide=n_wide,
            true_gflop=round(plan.true_flops() / 1e9, 1),
            replicated_fraction=round(rep["replicated_fraction"], 3),
            balance_efficiency=round(rep["balance_efficiency"], 3),
            R_top=int(lay.R_top),
            top_levels=top_levels,
            psum_MB=round(psum_bytes / 1e6, 1),
            t_max_chip_ms=round(t_chips.max() * 1e3, 2),
            t_comm_ms=round(t_comm * 1e3, 2),
            projected_efficiency=round(eff, 3),
        ))
        print(json.dumps(rows[-1]), flush=True)
    return rows


def main():
    from sparsecholesky_tpu.models import generators
    from sparsecholesky_tpu.cli import _load

    out = []
    for nx in (18, 24, 32):
        out += project(f"irregular3d:{nx}",
                       lambda nx=nx: (generators.irregular3d(nx), None),
                       "amd")
    out += project("poisson3d:64", lambda: _load("poisson3d:64"), "nd-grid")
    out += project("poisson3d:100", lambda: _load("poisson3d:100"),
                   "nd-grid", ndevs=(8,))
    with open("/root/repo/evidence/scaling_projection.json", "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
