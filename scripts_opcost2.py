#!/usr/bin/env python
"""Per-executed-op overhead on the axon TPU, measured with a host
readback barrier (block_until_ready does NOT wait on axon — CLAUDE.md).

Programs: K chained ops of several representative kinds; slope of t(K)
is the per-op cost.  Run: PYTHONPATH=/root/repo python scripts_opcost2.py
"""
import time

import numpy as np


def main():
    from sparsecholesky_tpu.utils.cache import setup_runtime

    setup_runtime()
    import jax
    import jax.numpy as jnp

    print("device:", jax.devices(), flush=True)

    def timeit(f, *a, n=10):
        r = f(*a)
        float(jnp.sum(r.reshape(-1)[:8]))  # sync
        t0 = time.time()
        for _ in range(n):
            r = f(*a)
        float(jnp.sum(r.reshape(-1)[:8]))
        return (time.time() - t0) / n

    R = 400_000
    x = jnp.ones((R, 128), jnp.float32)

    # 1) K dependent dynamic-slice + update-slice pairs (the slab path)
    for K in (16, 64, 256):
        @jax.jit
        def slabs(x, K=K):
            for i in range(K):
                blk = jax.lax.dynamic_slice(x, ((i * 1024) % (R - 2048), 0),
                                            (1024, 128))
                x = jax.lax.dynamic_update_slice(
                    x, blk * 0.999999, ((i * 1024) % (R - 2048), 0))
            return x
        t = timeit(slabs, x)
        print(f"slab pair K={K:4d}: {t*1e3:8.2f} ms ({t/K*1e6:7.1f} us/pair)",
              flush=True)

    # 2) K batched small choleskys (dependent chain via +eps)
    for (B, w) in ((32, 64), (8, 128)):
        P = jnp.eye(w, dtype=jnp.float32)[None] * 4.0
        P = jnp.broadcast_to(P, (B, w, w)) + 0.01
        for K in (8, 32, 128):
            @jax.jit
            def chols(P, K=K):
                for i in range(K):
                    L = jnp.linalg.cholesky(P)
                    P = P + L[:, :1, :1] * 1e-9
                return P
            t = timeit(chols, P)
            print(f"chol B={B} w={w} K={K:4d}: {t*1e3:8.2f} ms "
                  f"({t/K*1e6:7.1f} us/call)", flush=True)

    # 3) K batched triangular solves [B, mb, w]
    for (B, mb, w) in ((32, 256, 64), (8, 2048, 128)):
        L = jnp.eye(w, dtype=jnp.float32)[None] * 2.0
        L = jnp.broadcast_to(L, (B, w, w))
        Pb = jnp.ones((B, mb, w), jnp.float32)
        for K in (8, 32, 128):
            @jax.jit
            def trsms(L, Pb, K=K):
                for i in range(K):
                    Pb = jax.lax.linalg.triangular_solve(
                        L, Pb, left_side=False, lower=True, transpose_a=True)
                return Pb
            t = timeit(trsms, L, Pb)
            print(f"trsm B={B} mb={mb} w={w} K={K:4d}: {t*1e3:8.2f} ms "
                  f"({t/K*1e6:7.1f} us/call)", flush=True)

    # 4) matmul of same shapes (the TRTRI+GEMM alternative)
    for (B, mb, w) in ((32, 256, 64), (8, 2048, 128)):
        Li = jnp.eye(w, dtype=jnp.float32)[None] * 0.5
        Li = jnp.broadcast_to(Li, (B, w, w))
        Pb = jnp.ones((B, mb, w), jnp.float32)
        for K in (8, 32, 128):
            @jax.jit
            def mms(Li, Pb, K=K):
                with jax.default_matmul_precision("highest"):
                    for i in range(K):
                        Pb = jnp.einsum("bik,bjk->bij", Pb, Li)
                return Pb
            t = timeit(mms, Li, Pb)
            print(f"gemm B={B} mb={mb} w={w} K={K:4d}: {t*1e3:8.2f} ms "
                  f"({t/K*1e6:7.1f} us/call)", flush=True)

    # 5) small elementwise fusions (step glue)
    y = jnp.ones((1024, 128), jnp.float32)
    for K in (64, 256, 1024):
        @jax.jit
        def el(y, K=K):
            for i in range(K):
                y = y * 0.999999 + 1e-9
            return y
        t = timeit(el, y)
        print(f"fusion K={K:5d}: {t*1e3:8.2f} ms ({t/K*1e6:7.1f} us/op)",
              flush=True)


if __name__ == "__main__":
    main()
