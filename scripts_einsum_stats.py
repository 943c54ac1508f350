#!/usr/bin/env python
"""Host-side accounting of the extend einsum + V-placement phase:
per-chunk V bytes (gather write), einsum operand/output bytes and flops,
and the executed-op budget of the datapath (steps, scan groups).

Targets VERDICT r4 item 1: decide whether the 21.6 ms einsum+V term is
V-gather-bound, einsum-flop-bound, or C-write-bound, and what the
28.1 ms datapath floor is made of.

Usage: python scripts_einsum_stats.py [poisson3d:48]
"""
import sys

import numpy as np

sys.path.insert(0, "/root/repo")
import jax

jax.config.update("jax_platforms", "cpu")  # sitecustomize force-selects TPU
from sparsecholesky_tpu.cli import _load
from sparsecholesky_tpu.ordering import compute_ordering
from sparsecholesky_tpu.plan import compile_plan, update_chunks, LANE


def main(spec="poisson3d:48"):
    A, grid_shape = _load(spec)
    perm = compute_ordering(A, "nd-grid" if grid_shape else "auto",
                            grid_shape=grid_shape)
    plan = compile_plan(A, perm=perm, dtype=np.float32)
    item = 4

    v_bytes = 0          # V workspace write (gather output)
    l21_read = 0         # einsum L21 operand reads
    v_read = 0           # einsum V operand reads
    c_bytes = 0          # einsum C output writes
    flops = 0            # einsum MACs x2
    n_chunks = 0
    n_steps = 0
    n_scan_groups = 0
    n_upd_steps = 0
    tot_gpad = 0
    tot_used_g = 0

    for lev in plan.levels:
        for b in lev:
            n_steps += 1
            if b.mb_pad == 0:
                continue
            n_upd_steps += 1
            B, mb_pad, w_pad, G_pad = b.batch, b.mb_pad, b.w_pad, b.g_pad
            v_bytes += B * G_pad * LANE * w_pad * item
            tot_gpad += B * G_pad
            tot_used_g += int(np.sum(b.uG)) if b.uG is not None else 0
            for ti, i0, i1, gt, b0, b1 in update_chunks(
                    B, mb_pad, G_pad, b.utile_g or (), item):
                n_chunks += 1
                bs, t = b1 - b0, i1 - i0
                l21_read += bs * t * w_pad * item
                v_read += bs * gt * LANE * w_pad * item
                c_rows = bs * gt * t
                c_bytes += c_rows * LANE * item
                flops += 2 * c_rows * LANE * w_pad

    print(f"{spec}: n={plan.n} steps={n_steps} (upd {n_upd_steps}) "
          f"chunks={n_chunks}")
    print(f"  V workspace write : {v_bytes/1e9:.3f} GB")
    print(f"  einsum L21 read   : {l21_read/1e9:.3f} GB")
    print(f"  einsum V read     : {v_read/1e9:.3f} GB")
    print(f"  einsum C write    : {c_bytes/1e9:.3f} GB")
    print(f"  einsum flops      : {flops/1e9:.1f} GFLOP "
          f"(@24 TF/s = {flops/24e12*1e3:.1f} ms)")
    print(f"  G utilization     : used {tot_used_g} / padded {tot_gpad} "
          f"({tot_used_g/max(tot_gpad,1):.2f})")
    # bandwidth model at ~700 GB/s effective HBM
    bw = 700e9
    print(f"  V write @{bw/1e9:.0f}GB/s : {v_bytes/bw*1e3:.1f} ms "
          f"(+ gather-read of L21 {l21_read and v_bytes/bw*1e3:.1f} ms)")
    print(f"  einsum mem traffic : "
          f"{(l21_read+v_read+c_bytes)/bw*1e3:.1f} ms")

    # --- executed-op budget of the datapath --------------------------------
    from sparsecholesky_tpu import numeric as N
    arrays = N.device_arrays(plan)
    kinds = {"single": 0, "scan": 0}
    scan_iters = 0
    dense = 0
    for kind, rb, utile_g, wm, rchunks, slab, al in N.iter_runs(arrays):
        if kind == "single":
            if wm is not None and rb.w_pad >= N.DENSE_INSTORE:
                dense += 1
            else:
                kinds["single"] += 1
        else:
            kinds["scan"] += 1
            scan_iters += int(rb.row0.shape[0])
    print(f"  runs: single={kinds['single']} dense={dense} "
          f"scan_groups={kinds['scan']} scan_iters={scan_iters} "
          f"(executed steps={kinds['single']+dense+scan_iters})")


if __name__ == "__main__":
    main(*sys.argv[1:])
