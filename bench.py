#!/usr/bin/env python
"""Driver benchmark: prints ONE JSON line
{"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.

Runs the supernodal factorization benchmark on the default workload
(ND-ordered 3D Poisson) on whatever accelerator JAX selects (the real TPU
chip under the driver).  See sparsecholesky_tpu/bench.py for the metric and
baseline definitions.
"""

import json
import os
import sys


def main():
    from sparsecholesky_tpu.utils.cache import setup_runtime

    setup_runtime()
    from sparsecholesky_tpu.bench import run_bench

    matrix = os.environ.get("SPARSECHOL_BENCH_MATRIX", "poisson3d:48")

    # the headline prints the moment the factorization throughput is
    # measured — BEFORE the solve-latency extras — so a wall-clock budget
    # expiring during the extras still yields the parsed JSON line
    def emit(headline):
        print(json.dumps(headline), flush=True)

    result = run_bench(matrix=matrix, on_headline=emit)
    # full detail on stderr for humans
    print(json.dumps(result, indent=2), file=sys.stderr)
    # the on-chip extend-add kernel equality check is a GATE: a Mosaic or
    # planner regression must not ship silently behind a green headline
    if result["detail"].get("kernel_check_ok") is False:
        print("FATAL: extend-add kernel check failed "
              f"({result['detail']})", file=sys.stderr)
        sys.exit(2)


if __name__ == "__main__":
    main()
