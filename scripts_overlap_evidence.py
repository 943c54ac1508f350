"""Generate committed evidence for the wide-separator comm/compute overlap.

VERDICT round-1 item 6 asks for trace-level evidence that the distributed
wide-separator LLT (parallel/pstore.py::_wide_step) overlaps the segment
k+1 panel broadcast with panel k's trailing updates.  Real multi-chip TPU
hardware is not available (one v5e behind the axon tunnel), so the
strongest obtainable evidence is the compiled HLO's dependency structure
on the 8-fake-device CPU mesh: if the k+1 all-reduce's transitive input
cone excludes panel k's trailing-update matmuls, XLA's latency-hiding
scheduler is free to run the collective concurrently with that compute on
a real mesh (async all-reduce-start/done pairs).

This script lowers the partitioned factorize body with a forced-wide
separator, parses the optimized HLO, and for every consecutive pair of
panel all-reduces verifies the later one does NOT transitively depend on
the dot ops that consume the earlier one's result (other than the single
early-updated slot).  Output: evidence/wide_overlap_hlo.md.

Run: PYTHONPATH=/root/repo python scripts_overlap_evidence.py
"""

from __future__ import annotations

import os
import re
import sys

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import functools

import numpy as np
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

sys.path.insert(0, "/root/repo")

from sparsecholesky_tpu.models import generators
from sparsecholesky_tpu.ordering import nd_grid
from sparsecholesky_tpu.plan import compile_plan
from sparsecholesky_tpu.parallel import pstore, shard


NDEV = 2  # 3-segment separator over 2 chips -> chip 0 holds 2 slots, so
#           panel k's trailing update on the second slot is real compute
#           that must NOT gate panel k+1's broadcast.


def lower_hlo():
    g = 17  # root separator g*g = 289 cols -> nseg = 3 lane segments
    A = generators.poisson3d(g)
    plan = compile_plan(A, perm=nd_grid((g, g, g)), layout="compact")
    mesh = shard.make_mesh(NDEV)
    arrays, lay = pstore.shard_plan_partitioned(plan, NDEV, wide_nseg=2)
    assert lay.wide.any(), "fixture must contain a distributed wide supernode"
    nwide = int(lay.wide.sum())
    wsegs = [int(plan.block_nseg[s]) for s in np.where(lay.wide)[0]]
    # the [M,128] payload shapes of _wide_step panel broadcasts
    wM = sorted({
        max(int(plan.block_m[s]), int(plan.block_nseg[s]) * 128)
        for s in np.where(lay.wide)[0]
    })

    axis = mesh.axis_names[0]
    spec = {
        "flat": {f: P(axis) for f in pstore._FIELDS + pstore._RUN_FIELDS
                 + pstore._DERIVED_FIELDS},
        "xrows": P(), "exch_src": P(axis), "exch_dst": P(axis),
        "meta": P(), "sn_slots": P(), "rtile": P(),
        "entry_row": P(axis), "entry_lane": P(axis),
        "entry_plo": P(), "entry_phi": P(),
        "diag_map": P(), "perm": P(), "iperm": P(),
    }
    body = functools.partial(
        pstore._body, R_local=lay.R_local, dtype=jnp.dtype(plan.dtype),
        axis=axis, ndev=NDEV, scale=False, extend="scatter",
        rtile=plan.run_tile,
    )
    fn = jax.jit(jax.shard_map(body, mesh=mesh, in_specs=(spec, P()),
                               out_specs=(P(axis), P(axis), P()),
                               check_vma=False))
    lowered = fn.lower(arrays, jnp.asarray(A.data))
    hlo = lowered.compile().as_text()
    return hlo, nwide, wsegs, wM


_INSTR = re.compile(r"^\s*(?:ROOT\s+)?%?([\w.\-]+)\s*=\s*\S+\s+(\S+?)\(")
_OPND = re.compile(r"%([\w.\-]+)")


def parse_deps(hlo: str):
    """name -> (opcode, operand names); computation-call edges included."""
    ops: dict[str, tuple[str, list[str]]] = {}
    comp_roots: dict[str, list[str]] = {}
    cur_comp = None
    comp_ops: dict[str, list[str]] = {}
    for line in hlo.splitlines():
        mcomp = re.match(r"^\s*%?([\w.\-]+)\s*\((.*?)\)\s*->", line)
        if ("{" in line and mcomp and "=" not in line.split("{")[0]):
            cur_comp = mcomp.group(1)
            comp_ops[cur_comp] = []
            continue
        m = _INSTR.match(line)
        if not m:
            continue
        name, opcode = m.group(1), m.group(2)
        # operands: everything inside the first (...) that looks like %ref
        after = line.split("=", 1)[1]
        paren = after[after.index("(") + 1:] if "(" in after else ""
        depth, buf = 1, []
        for ch in paren:
            if ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
                if depth == 0:
                    break
            buf.append(ch)
        opnds = _OPND.findall("".join(buf))
        # calls to fusions/computations: pull in to_apply/calls names
        for key in ("to_apply=", "calls="):
            if key in line:
                tgt = line.split(key, 1)[1].split(",")[0].split("}")[0]
                tgt = tgt.strip().lstrip("%")
                opnds.append(f"__comp__{tgt}")
        ops[name] = (opcode, opnds)
        if cur_comp is not None:
            comp_ops[cur_comp].append(name)
        if line.strip().startswith("ROOT"):
            if cur_comp is not None:
                comp_roots[cur_comp] = [name]
    return ops, comp_roots


def cone(ops, comp_roots, start: str) -> set[str]:
    """Transitive input cone of instruction `start` (within + across
    computations via __comp__ edges)."""
    seen: set[str] = set()
    stack = [start]
    while stack:
        n = stack.pop()
        if n in seen:
            continue
        seen.add(n)
        if n.startswith("__comp__"):
            stack.extend(comp_roots.get(n[8:], []))
            continue
        _, opnds = ops.get(n, ("", []))
        stack.extend(opnds)
    return seen


def main():
    hlo, nwide, wsegs, wM = lower_hlo()
    ops, comp_roots = parse_deps(hlo)
    order = list(ops.keys())
    ars = [n for n in order if ops[n][0].startswith("all-reduce")]
    # _wide_step panel broadcasts carry exactly [M,128] payloads with
    # M = max(m, nseg*128) of a wide supernode; level/halo psums have
    # xrow-span shapes and pivot psums are scalar.
    lines = {n: next(l for l in hlo.splitlines() if re.match(
        rf"^\s*(ROOT\s+)?%?{re.escape(n)}\s*=", l)) for n in ars}
    shape_pat = "|".join(rf"f\d+\[{M},128\]" for M in wM)
    panel_ars = [n for n in ars if re.search(shape_pat, lines[n])]

    report = []
    report.append("# Wide-separator comm/compute overlap — HLO evidence\n")
    report.append(
        f"Generated by `scripts_overlap_evidence.py` ({NDEV}-fake-device "
        "CPU mesh, poisson3d(17), nd_grid order, `wide_nseg=2`; the "
        "3-segment root separator over 2 chips gives chip 0 two local "
        "slots, so panel k has a real trailing-update matmul that must "
        "not gate panel k+1's broadcast).  The partitioned plan "
        f"distributes {nwide} wide top supernode(s) with {wsegs} lane "
        f"segments (panel payload shapes [M,128], M in {wM}).  The "
        f"compiled module contains {len(ars)} all-reduce ops, "
        f"{len(panel_ars)} of them wide-step panel broadcasts.\n")
    report.append(
        "Claim (parallel/pstore.py::_wide_step): the segment k+1 panel "
        "broadcast is dataflow-independent of panel k's trailing updates, "
        "so on a real multi-chip TPU XLA's latency-hiding scheduler can "
        "overlap the collective with the trailing compute.  Verification: "
        "for each consecutive pair of panel all-reduces, the later one's "
        "transitive input cone must contain at most ONE of the dot ops "
        "that consume the earlier one's result (the early-updated slot), "
        "never the remaining trailing-update dots.\n")

    ok = True
    rows = ["| k-th panel AR | consumers (dots) of AR_k | of those in "
            "AR_{k+1}'s input cone | overlapped (free to run during "
            "AR_{k+1}) |", "|---|---|---|---|"]
    checked = overlapped_total = 0
    for a, b in zip(panel_ars, panel_ars[1:]):
        cb = cone(ops, comp_roots, b)
        if a not in cb:
            # different wide supernode (no dependency at all) — skip pair
            continue
        # dots that (transitively within one step) consume a
        consumers = [n for n in order
                     if ops[n][0] == "dot" and a in cone(ops, comp_roots, n)]
        in_cone = [n for n in consumers if n in cb]
        overlapped = len(consumers) - len(in_cone)
        overlapped_total += overlapped
        checked += 1
        if len(in_cone) > 1:
            ok = False
        rows.append(f"| `{a}` | {len(consumers)} | {len(in_cone)} | "
                    f"{overlapped} |")
    ok = ok and checked > 0 and overlapped_total > 0
    report.append("\n".join(rows) + "\n")
    report.append(
        f"\nResult: **{'PASS' if ok else 'FAIL'}** — "
        f"{checked} consecutive panel-broadcast pairs checked, "
        f"{overlapped_total} trailing-update dot(s) overlapped in total; "
        "every k+1 broadcast depends on at most the single early-updated "
        "slot's dot, leaving the remaining trailing-update dots "
        "concurrent with the collective.  On real multi-chip TPUs these "
        "psums lower to async all-reduce-start/done pairs and XLA's "
        "latency-hiding scheduler moves the independent dots between "
        "them; the CPU backend lowers collectives synchronously, so the "
        "dependency structure is the hardware-independent part of the "
        "evidence.\n")

    # excerpt: the region around the first two panel all-reduces
    if len(panel_ars) >= 2:
        hlolines = hlo.splitlines()
        idx = [i for i, l in enumerate(hlolines)
               if re.match(rf"^\s*(ROOT\s+)?%?{re.escape(panel_ars[0])}\s*=",
                           l)
               or re.match(rf"^\s*(ROOT\s+)?%?{re.escape(panel_ars[1])}\s*=",
                           l)]
        if idx:
            lo = max(0, idx[0] - 3)
            hi = min(len(hlolines), idx[-1] + 4)
            report.append("\nHLO excerpt (first two panel broadcasts):\n")
            report.append("```\n" + "\n".join(
                l[:240] for l in hlolines[lo:hi]) + "\n```\n")

    os.makedirs("evidence", exist_ok=True)
    with open("evidence/wide_overlap_hlo.md", "w") as f:
        f.write("\n".join(report))
    print(f"panel all-reduces: {len(panel_ars)}, pairs checked: {checked}, "
          f"ok={ok}")
    print("wrote evidence/wide_overlap_hlo.md")


if __name__ == "__main__":
    main()
