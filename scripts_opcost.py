"""Measure axon TPU per-op overhead: chained-op programs vs scan loops.

Run on the real chip:  python scripts_opcost.py
"""
import time
import jax
import jax.numpy as jnp
import numpy as np

dev = jax.devices()[0]
print("device:", dev)


def timeit(f, *a, n=5):
    r = f(*a)
    jax.block_until_ready(r)
    t0 = time.time()
    for _ in range(n):
        r = f(*a)
    jax.block_until_ready(r)
    return (time.time() - t0) / n


x = jnp.ones((1024, 128), jnp.float32)
idx = jnp.arange(1024, dtype=jnp.int32)

# 1) K sequential scatter-add ops in one jit program
for K in (10, 100, 400):
    @jax.jit
    def chain(x, idx, K=K):
        for i in range(K):
            x = x.at[idx].add(0.001)
        return x
    t = timeit(chain, x, idx)
    print(f"chain   K={K:4d}: {t*1e3:8.2f} ms  ({t/K*1e3:.3f} ms/op)")

# 2) same work as ONE scan of K iterations
for K in (10, 100, 400):
    @jax.jit
    def scanned(x, idx, K=K):
        def body(c, _):
            return c.at[idx].add(0.001), 0
        return jax.lax.scan(body, x, None, length=K)[0]
    t = timeit(scanned, x, idx)
    print(f"scan    K={K:4d}: {t*1e3:8.2f} ms  ({t/K*1e3:.3f} ms/iter)")

# 3) K matmul ops (bigger op payload) in one program
y = jnp.ones((512, 512), jnp.float32)
for K in (10, 100):
    @jax.jit
    def mm(y, K=K):
        for i in range(K):
            y = y @ y * 1e-3
        return y
    t = timeit(mm, y)
    print(f"matmul  K={K:4d}: {t*1e3:8.2f} ms  ({t/K*1e3:.3f} ms/op)")

# 4) dispatch RTT floor: trivial program
@jax.jit
def triv(x):
    return x + 1
t = timeit(triv, x, n=20)
print(f"trivial dispatch: {t*1e3:.2f} ms")
