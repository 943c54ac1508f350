#!/usr/bin/env python
"""Cold-path program-granularity experiment (VERDICT r4 item 3): does
the warm-cache first-factorize load time scale with program BYTES or
program COUNT?  Sweep SPARSECHOL_CHUNK_RUNS; per setting:

  phase A (subprocess): compile + cache the :48 chunk programs
  phase B (fresh subprocess, tunnel already warm): time host plan,
          upload, and the first factorize (executable load from cache)

Usage: python scripts_cold_chunks.py [matrix] [chunk_runs,...]
"""
import json
import os
import subprocess
import sys

MATRIX = sys.argv[1] if len(sys.argv) > 1 else "poisson3d:48"
SWEEP = [int(x) for x in (sys.argv[2].split(",") if len(sys.argv) > 2
                          else ["48", "96", "192"])]

CHILD = r'''
import sys, time, json
import numpy as np
sys.path.insert(0, "/root/repo")
from sparsecholesky_tpu.utils.cache import setup_runtime
setup_runtime()
import jax.numpy as jnp
from sparsecholesky_tpu.cli import _load
from sparsecholesky_tpu.ordering import compute_ordering
from sparsecholesky_tpu.plan import compile_plan
from sparsecholesky_tpu import numeric as N

t_all = time.time()
A, grid = _load("%(matrix)s")
# wake/probe the device first so the timings below exclude the tunnel wake
t0 = time.time()
float(jnp.sum(jnp.ones((8, 128))))
t_wake = time.time() - t0
t0 = time.time()
perm = compute_ordering(A, "nd-grid" if grid else "auto", grid_shape=grid)
P = compile_plan(A, perm=perm, dtype=np.float32, layout="auto")
t_plan = time.time() - t0
t0 = time.time()
arrays = N.device_arrays(P)
t_up = time.time() - t0
t0 = time.time()
Lx, d = N.factorize(P, jnp.asarray(A.data), arrays=arrays, scale=False,
                    check=False)
float(jnp.sum(Lx[:8]))
t_first = time.time() - t0
import sparsecholesky_tpu.numeric as NN
print("COLD " + json.dumps(dict(
    chunk_runs=NN.CHUNK_RUNS, wake_s=round(t_wake, 2),
    plan_s=round(t_plan, 2), upload_s=round(t_up, 2),
    first_factorize_s=round(t_first, 2),
    total_excl_wake_s=round(time.time() - t_all - t_wake, 2))), flush=True)
'''


def run_child(chunk_runs, tag):
    env = dict(os.environ, SPARSECHOL_CHUNK_RUNS=str(chunk_runs))
    r = subprocess.run([sys.executable, "-c", CHILD % {"matrix": MATRIX}],
                       capture_output=True, text=True, timeout=4200,
                       env=env)
    line = next((ln for ln in r.stdout.splitlines()
                 if ln.startswith("COLD ")), None)
    if line is None:
        tail = (r.stderr or "").strip().splitlines()
        print(f"{tag} chunk_runs={chunk_runs}: FAILED "
              f"({tail[-1][:160] if tail else 'no output'})", flush=True)
        return None
    d = json.loads(line[len("COLD "):])
    print(f"{tag} chunk_runs={chunk_runs}: {json.dumps(d)}", flush=True)
    return d


out = {}
for cr in SWEEP:
    a = run_child(cr, "compile")    # phase A: compile (or confirm cached)
    b = run_child(cr, "coldload")   # phase B: pure cache-load timing
    out[cr] = {"compile": a, "coldload": b}
print(json.dumps({"matrix": MATRIX, "sweep": out}))
