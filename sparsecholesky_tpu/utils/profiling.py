"""Profiling / observability.

The reference has zero instrumentation — not even a clock call (SURVEY.md
§5 "tracing/profiling: absent").  Production factorization on TPU needs
three things, provided here:

  * phase timers (ordering / symbolic / plan / compile / numeric / solve)
    with a structured report,
  * exact per-plan flop and byte counters derived from the symbolic
    structure (a supernode costs w^3/3 + w^2*mb + w*mb^2 flops — SURVEY.md
    §5), giving honest GFLOP/s and speed-of-light fractions,
  * optional jax.profiler trace capture around any phase for Tensorboard.
"""

from __future__ import annotations

import contextlib
import dataclasses
import json
import time


@dataclasses.dataclass
class PhaseTimer:
    """Named phase timing collector.

    >>> t = PhaseTimer()
    >>> with t.phase("symbolic"): ...
    >>> t.report()
    """

    phases: dict = dataclasses.field(default_factory=dict)

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.phases[name] = self.phases.get(name, 0.0) + dt

    def report(self) -> dict:
        total = sum(self.phases.values())
        return {"total_s": total, **{k: v for k, v in self.phases.items()}}

    def json(self) -> str:
        return json.dumps(self.report(), indent=2)


@contextlib.contextmanager
def jax_trace(logdir: str | None):
    """Capture a jax.profiler trace (Tensorboard/xprof format) around the
    enclosed phase when ``logdir`` is set; no-op otherwise."""
    if not logdir:
        yield
        return
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


# ---------------------------------------------------------------------------
# Speed-of-light model


@dataclasses.dataclass
class ChipModel:
    """Peak numbers for the speed-of-light estimate."""

    name: str
    peak_fp32_tflops: float
    hbm_gbps: float


# v5e ("v5 lite"): 197 bf16 TFLOP/s -> ~49 fp32 via MXU passes; 819 GB/s HBM.
TPU_V5E = ChipModel("tpu-v5e", peak_fp32_tflops=49.0, hbm_gbps=819.0)


def detect_chip() -> ChipModel:
    try:
        import jax

        kind = jax.devices()[0].device_kind.lower()
    except Exception:
        return TPU_V5E
    if "v5 lite" in kind or "v5e" in kind:
        return TPU_V5E
    if "v4" in kind:
        return ChipModel("tpu-v4", peak_fp32_tflops=40.0, hbm_gbps=1228.0)
    if "v5p" in kind or "v5" in kind:
        return ChipModel("tpu-v5p", peak_fp32_tflops=115.0, hbm_gbps=2765.0)
    if "v6" in kind:
        return ChipModel("tpu-v6e", peak_fp32_tflops=230.0, hbm_gbps=1640.0)
    return TPU_V5E


def plan_cost(plan) -> dict:
    """Exact cost model of one numeric factorization under a plan.

    Flops: true (supernodal structure) and padded (what the MXU actually
    executes).  Bytes: one read + one write of every padded panel, the
    Schur-update read-modify-write traffic, and the factor store itself —
    the HBM floor for this memory-bound workload.
    """
    true_f = plan.true_flops()
    padded_f = plan.padded_flops()
    itemsize = plan.dtype.itemsize
    LANE = 128
    panel_elems = 0
    update_elems = 0
    for lev in plan.levels:
        for b in lev:
            panel_elems += b.batch * (b.w_pad + b.mb_pad) * LANE
            if b.mb_pad:
                # one row scatter-add per (group, below row): RMW traffic
                update_elems += b.batch * b.g_pad * b.mb_pad * LANE
    bytes_moved = itemsize * (
        2 * panel_elems          # row gather + row scatter of every panel
        + 3 * update_elems       # read target rows, add, write back
        + plan.R_L * LANE        # initial value store
    )
    return {
        "true_flops": true_f,
        "padded_flops": padded_f,
        "padding_overhead": padded_f / max(true_f, 1),
        "bytes_moved": bytes_moved,
        "arithmetic_intensity": padded_f / max(bytes_moved, 1),
    }


def speed_of_light(plan, seconds: float, chip: ChipModel | None = None) -> dict:
    """Achieved vs attainable (roofline) for one numeric factorization."""
    chip = chip or detect_chip()
    cost = plan_cost(plan)
    t_compute = cost["padded_flops"] / (chip.peak_fp32_tflops * 1e12)
    t_memory = cost["bytes_moved"] / (chip.hbm_gbps * 1e9)
    t_roof = max(t_compute, t_memory)
    return {
        **cost,
        "chip": chip.name,
        "seconds": seconds,
        "gflops_true": cost["true_flops"] / seconds / 1e9,
        "gflops_padded": cost["padded_flops"] / seconds / 1e9,
        "roofline_seconds": t_roof,
        "roofline_bound": "compute" if t_compute >= t_memory else "memory",
        "speed_of_light_fraction": t_roof / seconds,
    }
