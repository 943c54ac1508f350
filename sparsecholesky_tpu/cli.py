"""Command-line interface: factorize / solve / bench / info.

The reference's only executable is a demo main() that loads one hardcoded
matrix and discards the result (/root/reference/src/main.cpp:343-350).
The framework exposes a real CLI instead:

    python -m sparsecholesky_tpu factorize FILE.mtx [--ordering amd] ...
    python -m sparsecholesky_tpu solve FILE.mtx [--rhs ones] ...
    python -m sparsecholesky_tpu bench [--matrix poisson3d:24] ...
    python -m sparsecholesky_tpu info FILE.mtx
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np


def _load(spec: str):
    """Load a matrix from a file path or a generator spec like
    'poisson2d:64', 'poisson3d:24', 'random:200:0.1', 'bcsstk01'."""
    from . import load_matrix_market, bundled_matrix
    from .models import generators

    if spec.endswith(".mtx") or spec.endswith(".mtx.gz"):
        return load_matrix_market(spec), None
    parts = spec.split(":")
    if parts[0] == "poisson2d":
        k = int(parts[1])
        return generators.poisson2d(k), (k, k)
    if parts[0] == "poisson3d":
        k = int(parts[1])
        return generators.poisson3d(k), (k, k, k)
    if parts[0] == "random":
        n = int(parts[1])
        dens = float(parts[2]) if len(parts) > 2 else 0.1
        return generators.random_sparse(n, dens), None
    if parts[0] == "fem3d":
        k = int(parts[1])
        dofs = int(parts[2]) if len(parts) > 2 else 3
        return generators.fem3d(k, dofs), None
    if parts[0] == "irregular3d":
        k = int(parts[1])
        return generators.irregular3d(k), None
    return load_matrix_market(bundled_matrix(spec)), None


def _chol_from_args(args):
    from .api import chol

    A, grid_shape = _load(args.matrix)
    ordering = args.ordering
    if ordering == "nd-grid" and grid_shape is None:
        raise SystemExit("nd-grid ordering requires a generated grid matrix")
    if ordering == "auto-grid":
        ordering = "nd-grid" if grid_shape is not None else "auto"
    t0 = time.time()
    F = chol(
        A,
        ordering=ordering,
        grid_shape=grid_shape,
        dtype=np.dtype(args.dtype),
        scale=args.scale,
        backend=args.backend,
    )
    t = time.time() - t0
    return A, F, t


def cmd_factorize(args):
    A, F, t = _chol_from_args(args)
    plan = F.plan
    print(f"n={A.n} nnz(A)={A.nnz} nnz(L)={plan.nnz_L()}")
    print(f"supernodes={plan.ns} levels={len(plan.levels)} "
          f"flops={plan.true_flops():,} padded_flops={plan.padded_flops():,}")
    print(f"factorize (incl. symbolic + compile): {t:.3f}s")
    t0 = time.time()
    F.refactorize(A.data)
    dt = time.time() - t0
    print(f"numeric refactorize (steady state): {dt*1e3:.2f}ms")
    if args.profile:
        from .utils.profiling import speed_of_light

        print(json.dumps(speed_of_light(plan, dt), indent=2))
    if args.save_plan:
        from .serialize import save_plan

        save_plan(args.save_plan, plan)
        print(f"plan saved to {args.save_plan}")
    if getattr(args, "save_factor", None):
        from .serialize import save_factor

        save_factor(args.save_factor, F)
        print(f"factor saved to {args.save_factor}")
    if args.verify:
        Ld = np.tril(F.L().to_dense())
        perm = plan.perm
        Ad = A.to_dense()[np.ix_(perm, perm)]
        rel = np.linalg.norm(Ad - Ld @ Ld.T) / np.linalg.norm(Ad)
        print(f"relative residual ||PAP'-LL'||/||A|| = {rel:.3e}")
    return 0


def cmd_solve(args):
    A, F, t = _chol_from_args(args)
    rng = np.random.default_rng(0)
    b = np.ones(A.n) if args.rhs == "ones" else rng.standard_normal(A.n)
    refine = args.refine
    if refine in ("0", "false", "no"):
        refine = 0
    elif refine in ("1", "true", "yes", "auto"):
        refine = "auto"
    x = F.solve(b, refine=refine)
    Asp = A.to_scipy()
    nrmA = np.abs(Asp).sum(axis=1).max()
    be = np.linalg.norm(Asp @ x - b) / (nrmA * np.linalg.norm(x) + np.linalg.norm(b))
    print(f"n={A.n} solve backward error = {be:.3e}")
    return 0


def cmd_info(args):
    from . import analyze

    A, _ = _load(args.matrix)
    S = analyze(A)
    from .utils.pprint import supernode_summary

    lines = supernode_summary(S).splitlines()
    print("\n".join(lines[: args.max_lines]))
    if len(lines) > args.max_lines:
        print(f"... ({len(lines) - args.max_lines} more supernodes)")
    if args.ndev:
        # estimated multi-chip balance of the partitioned store/compute
        from .plan import compile_plan
        from .parallel import pstore

        plan = compile_plan(A, layout="compact")
        lay = pstore.build_layout(plan, args.ndev)
        print(json.dumps(pstore.partition_report(plan, lay), indent=2))
    return 0


def cmd_bench(args):
    from .bench import run_bench

    result = run_bench(
        matrix=args.matrix,
        ordering=args.ordering,
        dtype=args.dtype,
        backend=args.backend,
        repeats=args.repeats,
    )
    print(json.dumps(result))
    return 0


def main(argv=None):
    from .utils.cache import setup_runtime

    setup_runtime()
    p = argparse.ArgumentParser(prog="sparsecholesky_tpu")
    sub = p.add_subparsers(dest="cmd", required=True)

    def common(sp):
        sp.add_argument("matrix", nargs="?", default="1138_bus")
        sp.add_argument("--ordering", default="auto-grid",
                        choices=["natural", "rcm", "amd", "nd", "nd-grid", "auto", "auto-grid"])
        sp.add_argument("--dtype", default="float32")
        sp.add_argument("--backend", default="xla",
                        choices=["xla", "fused", "pallas"])
        sp.add_argument("--scale", action=argparse.BooleanOptionalAction, default=True)

    sp = sub.add_parser("factorize", help="symbolic + numeric factorization")
    common(sp)
    sp.add_argument("--verify", action="store_true")
    sp.add_argument("--profile", action="store_true",
                    help="print the roofline/speed-of-light report")
    sp.add_argument("--save-factor", metavar="FILE.npz",
                    help="serialize the full factor (plan + store) for "
                         "later load_factor() solves")
    sp.add_argument("--save-plan", metavar="FILE.npz",
                    help="serialize the compiled plan for later reuse")
    sp.set_defaults(fn=cmd_factorize)

    sp = sub.add_parser("solve", help="factorize + solve Ax=b")
    common(sp)
    sp.add_argument("--rhs", default="ones", choices=["ones", "random"])
    sp.add_argument("--refine", default="auto",
                    help="auto (host fp64 polish), device (one-dispatch "
                         "double-float), 0/false (raw fp32)")
    sp.set_defaults(fn=cmd_solve)

    sp = sub.add_parser("bench", help="benchmark; prints one JSON line")
    common(sp)
    sp.add_argument("--repeats", type=int, default=5)
    sp.set_defaults(fn=cmd_bench)

    sp = sub.add_parser("info", help="symbolic analysis summary")
    sp.add_argument("matrix", nargs="?", default="1138_bus")
    sp.add_argument("--max-lines", type=int, default=30)
    sp.add_argument("--ndev", type=int, default=0,
                    help="also print the estimated per-chip flop/memory "
                         "balance of the partitioned plan at N chips")
    sp.set_defaults(fn=cmd_info)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
