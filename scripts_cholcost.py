#!/usr/bin/env python
"""Chol/trsm call-cost scaling on the axon TPU: vs batch B at fixed w,
and vs w at fixed B.  Decides the level-batched diag-chol design (round 4
item 1): if chol cost is ~batch-independent (column-loop-bound), one
width-padded chol per LEVEL beats one per bucket ~5x.

PYTHONPATH=/root/repo python scripts_cholcost.py
"""
import time


def main():
    from sparsecholesky_tpu.utils.cache import setup_runtime

    setup_runtime()
    import jax
    import jax.numpy as jnp

    print("device:", jax.devices(), flush=True)

    def timeit(f, *a, n=10):
        r = f(*a)
        float(jnp.sum(r.reshape(-1)[:8]))
        t0 = time.time()
        for _ in range(n):
            r = f(*a)
        float(jnp.sum(r.reshape(-1)[:8]))
        return (time.time() - t0) / n

    def marginal(make, K1=8, K2=40):
        t1, t2 = timeit(make(K1)), timeit(make(K2))
        return (t2 - t1) / (K2 - K1)

    import numpy as np

    for (B, w) in ((1, 64), (8, 64), (32, 64), (128, 64), (512, 64),
                   (32, 8), (32, 16), (32, 32), (8, 128), (64, 128),
                   (200, 64)):
        P0 = jnp.broadcast_to(
            jnp.eye(w, dtype=jnp.float32)[None] * 4.0, (B, w, w)) + 0.01

        def make(K):
            @jax.jit
            def chols(P):
                for i in range(K):
                    L = jnp.linalg.cholesky(P)
                    P = P + L[:, :1, :1] * 1e-9
                return P
            return lambda: chols(P0)
        m = marginal(make)
        print(f"chol B={B:4d} w={w:4d}: {m*1e6:8.1f} us/call "
              f"({m/B*1e6:6.2f} us/panel)", flush=True)

    # triangular_solve scaling vs B (right-solve, the L21 use)
    for (B, mb, w) in ((1, 256, 64), (32, 256, 64), (128, 64, 64)):
        L0 = jnp.broadcast_to(
            jnp.eye(w, dtype=jnp.float32)[None] * 2.0, (B, w, w))
        Pb0 = jnp.ones((B, mb, w), jnp.float32)

        def make(K):
            @jax.jit
            def trsms(L, Pb):
                for i in range(K):
                    Pb = jax.lax.linalg.triangular_solve(
                        L, Pb, left_side=False, lower=True, transpose_a=True)
                return Pb
            return lambda: trsms(L0, Pb0)
        m = marginal(make)
        print(f"trsm B={B:4d} mb={mb:4d} w={w:4d}: {m*1e6:8.1f} us/call",
              flush=True)


if __name__ == "__main__":
    main()
