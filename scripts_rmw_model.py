#!/usr/bin/env python
"""Host-side modeled cost of the extend-add RMW phase: per-chunk chosen
packing mode, window/region/block counts, and the planner's modeled ns —
compared against the measured wall to expose unmodeled overhead (kernel
call count x fixed per-call cost).

Usage: python scripts_rmw_model.py [poisson3d:48]
"""
import sys
from collections import Counter

import numpy as np

sys.path.insert(0, "/root/repo")
import jax

jax.config.update("jax_platforms", "cpu")


def main(spec="poisson3d:48"):
    from sparsecholesky_tpu.cli import _load
    from sparsecholesky_tpu.ordering import compute_ordering
    from sparsecholesky_tpu.plan import compile_plan
    from sparsecholesky_tpu import numeric as N

    A, grid = _load(spec)
    perm = compute_ordering(A, "nd-grid" if grid else "auto",
                            grid_shape=grid)
    plan = compile_plan(A, perm=perm, dtype=np.float32)
    arrays = N.device_arrays(plan)

    modes = Counter()
    calls = 0
    tot_nw = tot_nrg = tot_nb = 0
    model_ns = 0.0
    c_dma_bytes = 0      # gblock C-block staging traffic
    rg_bytes = 0         # store region read+write traffic
    for rmeta in arrays["meta"].value:
        kind = rmeta[0]
        rchunks = rmeta[4]
        nmem = 1
        if kind == "scan":
            spec_d = dict(rmeta[1])
            nmem = spec_d["row0"][1][0]  # stacked leading dim
        for entry in rchunks:
            if not entry[0]:
                continue
            nw, nrg = entry[0], entry[1]
            nb = entry[3] if len(entry) > 3 else 0
            cblk = entry[4] if len(entry) > 4 else 0
            rbc = entry[5] if len(entry) > 5 else 0
            calls += nmem
            tot_nw += nw * nmem if kind != "scan" else nw  # stacked: nw is per-member
            if kind == "scan":
                calls += 0  # already counted nmem above
            if nb:
                modes["gblock"] += nmem
                model_ns += nmem * N._gblock_cost(nw, nrg, nb, cblk, rbc)
                c_dma_bytes += nmem * nb * cblk * 512
                rg_bytes += nmem * nrg * rbc * 512 * 2
                tot_nrg += nrg * nmem
                tot_nb += nb * nmem
            elif nrg:
                modes["region"] += nmem
                from sparsecholesky_tpu.plan import REGION_BLK
                model_ns += nmem * (nrg * N._REGION_NS + nw * N._REGION_WIN_NS)
                rg_bytes += nmem * nrg * REGION_BLK * 512 * 2
                tot_nrg += nrg * nmem
            else:
                modes["interleave"] += nmem
                model_ns += nmem * nw * N._WIN_NS(arrays["rtile"].value)

    print(f"{spec}: kernel calls={calls} modes={dict(modes)}")
    print(f"  windows={tot_nw} regions={tot_nrg} blocks={tot_nb}")
    print(f"  modeled RMW time: {model_ns/1e6:.1f} ms")
    print(f"  C-block DMA traffic: {c_dma_bytes/1e9:.2f} GB "
          f"({c_dma_bytes/700e9*1e3:.1f} ms @700GB/s)")
    print(f"  store region traffic: {rg_bytes/1e9:.2f} GB "
          f"({rg_bytes/700e9*1e3:.1f} ms @700GB/s)")
    print(f"  per-call overhead to explain X ms gap: "
          f"X/{calls} ms/call")


if __name__ == "__main__":
    main(*sys.argv[1:])
