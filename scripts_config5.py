#!/usr/bin/env python
"""BASELINE config 5 (audikw_1-class: irregular mesh, N chips) evidence run.

Exercises the partitioned store end-to-end on the config's *shape* — an
irregular3d matrix (no clean grid separators, AMD ordering) factored AND
solved via the distributed path with wide separators segment-cyclically
distributed — on the 8-fake-device CPU mesh, at a scale the 1-core test
host can execute.  Prints the partition_report (per-chip flop/memory
balance), the single-chip equality check, and the distributed-solve
residual; the committed output lives in evidence/config5_partitioned.md.

On a real multi-chip TPU the same calls run with extend="runs_pallas"
(the default_extend() resolution) and real ICI collectives.

    PYTHONPATH=/root/repo python scripts_config5.py [nx] [ndev] [wide_nseg]
"""

import json
import sys
import time

import numpy as np


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    import os

    os.environ.setdefault(
        "XLA_FLAGS", "--xla_force_host_platform_device_count=8"
    )
    jax.config.update("jax_enable_x64", True)

    from sparsecholesky_tpu import numeric, ordering, solve as _solve
    from sparsecholesky_tpu.models import generators
    from sparsecholesky_tpu.parallel import pstore, shard
    from sparsecholesky_tpu.plan import compile_plan

    nx = int(sys.argv[1]) if len(sys.argv) > 1 else 14
    ndev = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    wide_nseg = int(sys.argv[3]) if len(sys.argv) > 3 else 2

    t0 = time.time()
    A = generators.irregular3d(nx)
    perm = ordering.compute_ordering(A, "amd")
    plan = compile_plan(A, perm=perm, layout="compact")
    t_plan = time.time() - t0
    S = plan.S
    widths = [S.sn_width(s) for s in range(plan.ns)]
    print(
        f"irregular3d({nx}): n={A.n} nnz(A)={A.nnz} nnz(L)={plan.nnz_L()} "
        f"ns={plan.ns} max_width={max(widths)} plan={t_plan:.1f}s",
        flush=True,
    )

    mesh = shard.make_mesh(ndev)
    t0 = time.time()
    arrays, layout = pstore.shard_plan_partitioned(
        plan, ndev, extend="scatter", wide_nseg=wide_nseg
    )
    t_shard = time.time() - t0
    rep = pstore.partition_report(plan, layout)
    print(f"shard_plan_partitioned: {t_shard:.1f}s", flush=True)
    print("partition_report:", json.dumps(rep, indent=2), flush=True)

    t0 = time.time()
    Lx_s, layout, d = pstore.factorize_partitioned(
        plan, A.data, mesh, arrays=arrays, layout=layout, scale=True,
        extend="scatter", wide_nseg=wide_nseg,
    )
    t_fact = time.time() - t0
    full = pstore.gather_full(plan, Lx_s, layout)
    print(f"factorize_partitioned: {t_fact:.1f}s (incl. compile)", flush=True)

    Lx1, d1 = numeric.factorize(plan, A.data, scale=True)
    err = float(
        np.abs(full - np.asarray(Lx1)).max()
        / max(1.0, float(np.abs(np.asarray(Lx1)).max()))
    )
    print(f"max |partitioned - single| / |single|_max = {err:.3e}", flush=True)
    assert err < 1e-10, err

    b = np.linspace(1.0, 2.0, A.n)
    x = np.asarray(
        pstore.solve_partitioned(
            plan, Lx_s, b, arrays=arrays, layout=layout, mesh=mesh, d=d
        )
    )
    r = float(np.linalg.norm(A.to_scipy() @ x - b) / np.linalg.norm(b))
    print(f"distributed solve residual = {r:.3e}", flush=True)
    assert r < 1e-8, r

    nwide = int(np.sum(layout.wide)) if layout.wide is not None else 0
    print(
        json.dumps(
            {
                "config": f"irregular3d({nx}) AMD partitioned x{ndev}",
                "n": A.n,
                "nnz_L": int(plan.nnz_L()),
                "wide_separators_distributed": nwide,
                "balance_efficiency": rep["balance_efficiency"],
                "replicated_fraction": rep["replicated_fraction"],
                "store_bytes_per_chip": rep["store_bytes_per_chip"],
                "equality_vs_single_chip": err,
                "solve_residual": r,
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
