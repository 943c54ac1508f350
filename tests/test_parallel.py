"""Multi-chip tests on the virtual 8-device CPU mesh (SURVEY.md §4)."""

import numpy as np
import pytest

import jax

import sparsecholesky_tpu as sc
from sparsecholesky_tpu.api import chol
from sparsecholesky_tpu.models import generators
from sparsecholesky_tpu.parallel import shard
from sparsecholesky_tpu.plan import compile_plan


@pytest.fixture(scope="module")
def mesh8():
    assert len(jax.devices()) >= 8, "conftest must fake 8 CPU devices"
    return shard.make_mesh(8)


def _check_sharded(A, mesh, **kw):
    plan = compile_plan(A)
    Lx, d = shard.factorize_sharded(plan, A.data, mesh, **kw)
    from sparsecholesky_tpu import numeric

    Lx1, d1 = numeric.factorize(plan, A.data, **{k: v for k, v in kw.items() if k == "scale"})
    np.testing.assert_allclose(
        np.asarray(Lx), np.asarray(Lx1), atol=1e-11 * max(1.0, float(np.abs(np.asarray(Lx1)).max()))
    )
    return plan, Lx, d


@pytest.mark.parametrize("strategy", ["subtree", "wavefront"])
def test_sharded_matches_single_bcsstk01(bcsstk01, mesh8, strategy):
    _check_sharded(bcsstk01, mesh8, strategy=strategy)


@pytest.mark.parametrize("strategy", ["subtree", "wavefront"])
def test_sharded_matches_single_random(mesh8, strategy):
    A = generators.random_sparse(120, 0.15, seed=11)
    _check_sharded(A, mesh8, strategy=strategy)


def test_subtree_partition_covers_all(bcsstk01):
    plan = compile_plan(bcsstk01)
    owner, is_top = shard.subtree_partition(plan, 4)
    # every supernode is either owned by a chip or in the top set
    assert ((owner >= 0) ^ is_top).all()
    # owners are closed under descendants: a child's owner matches its
    # parent's unless the parent is top
    par = plan.S.sparent
    for s in range(plan.ns):
        p = int(par[s])
        if p >= 0 and not is_top[p]:
            assert owner[s] == owner[p]


def test_sharded_solve(mesh8):
    # NOTE: this host simulates 8 devices on very few cores and XLA CPU
    # collectives spin-wait with a hard 40s rendezvous abort, so the
    # sharded tests must stay small (few wavefront levels).  Real-chip
    # meshes do not have this constraint.
    from sparsecholesky_tpu import solve as _solve

    A = generators.poisson2d(12)
    plan = compile_plan(A)
    Lx, d = shard.factorize_sharded(plan, A.data, mesh8)
    b = np.linspace(1, 2, A.n)
    x = np.asarray(_solve.solve(plan, Lx, b, d=d))
    r = np.linalg.norm(A.to_scipy() @ x - b) / np.linalg.norm(b)
    assert r < 1e-8


def test_sharded_scaled(mesh8):
    A = generators.random_sparse(80, 0.25, seed=3)
    plan, Lx, d = _check_sharded(A, mesh8, scale=True)
    assert not np.allclose(np.asarray(d), 1.0)


def test_sharded_nondivisible_devices(bcsstk01):
    # 3 devices: batches not divisible -> dead-lane padding path
    mesh = shard.make_mesh(3)
    _check_sharded(bcsstk01, mesh)


def test_sharded_non_pd(mesh8):
    A = sc.triplet_to_csc([0, 0, 1], [0, 1, 1], [1.0, 9.0, 1.0], 2)
    plan = compile_plan(A)
    with pytest.raises(sc.NotPositiveDefiniteError):
        shard.factorize_sharded(plan, A.data, mesh8)


# ---------------------------------------------------------------------------
# Partitioned store (round 2): per-chip memory = top region + owned subtrees


def _check_partitioned(A, mesh, extend="scatter", perm=None, **kw):
    from sparsecholesky_tpu.parallel import pstore
    from sparsecholesky_tpu import numeric

    plan = compile_plan(A, perm=perm)
    Lx_s, lay, d = pstore.factorize_partitioned(
        plan, A.data, mesh, extend=extend, **kw
    )
    full = pstore.gather_full(plan, Lx_s, lay)
    Lx1, d1 = numeric.factorize(
        plan, A.data, extend="scatter",
        **{k: v for k, v in kw.items() if k == "scale"},
    )
    np.testing.assert_allclose(
        full, np.asarray(Lx1),
        atol=1e-10 * max(1.0, float(np.abs(np.asarray(Lx1)).max())),
    )
    return plan, lay


def test_partitioned_matches_single_bcsstk01(bcsstk01, mesh8):
    _check_partitioned(bcsstk01, mesh8)


def test_partitioned_matches_single_poisson(mesh8):
    # ND ordering produces a bushy assembly tree, exercising real subtree
    # distribution (a natural-order 12x12 grid is nearly all "top")
    from sparsecholesky_tpu.ordering import nd_grid

    A = generators.poisson2d(12)
    _check_partitioned(A, mesh8, perm=nd_grid((12, 12)))


def test_partitioned_runs_extend_matches(mesh8):
    from sparsecholesky_tpu.ordering import nd_grid

    A = generators.poisson2d(12)
    _check_partitioned(A, mesh8, extend="runs_xla", perm=nd_grid((12, 12)))


def test_partitioned_scale_matches(bcsstk01, mesh8):
    _check_partitioned(bcsstk01, mesh8, scale=True)


def test_partitioned_store_actually_partitions(mesh8):
    """VERDICT round-1 item 3: per-device store bytes must scale as
    R_top + R_L/ndev + pad, not R_L."""
    from sparsecholesky_tpu.parallel import pstore
    from sparsecholesky_tpu.plan import STORE_TAIL_PAD
    from sparsecholesky_tpu.ordering import nd_grid

    A = generators.poisson2d(32)
    plan = compile_plan(A, perm=nd_grid((32, 32)))
    # wide_nseg=None: the pure narrow-top layout whose row arithmetic is
    # exact (the default wide_nseg=1 adds wide segments + halo regions)
    lay = pstore.build_layout(plan, 8, wide_nseg=None)
    owned_rows = [
        int(lay.nrows_of[lay.owner == c].sum()) for c in range(8)
    ]
    assert lay.R_local == lay.R_top + max(owned_rows) + STORE_TAIL_PAD
    # the partitioned store must be materially smaller than replication
    assert lay.R_local < 0.55 * plan.R_L
    # and every block must live somewhere exactly once (plus top copies)
    total_owned = sum(owned_rows)
    assert total_owned + lay.R_top == plan.R_L - STORE_TAIL_PAD
    # the default (wide_nseg=1) layout distributes the wide top as well:
    # strictly less replicated store than the narrow-top-only layout
    lay1 = pstore.build_layout(plan, 8)
    assert lay1.wide is not None and lay1.wide.any()
    assert lay1.R_top < lay.R_top
    # halo copies make the wide layout's constant term bigger on a tiny
    # fixture; it must still beat replication
    assert lay1.R_local < 0.80 * plan.R_L


def test_partitioned_nonpd_localized(mesh8):
    from sparsecholesky_tpu.parallel import pstore
    from sparsecholesky_tpu.errors import NotPositiveDefiniteError

    A = generators.poisson2d(12)
    A2 = A.copy() if hasattr(A, "copy") else A
    data = A.data.copy()
    data[A.data == 4.0] = -4.0
    plan = compile_plan(A)
    with pytest.raises(NotPositiveDefiniteError) as ei:
        pstore.factorize_partitioned(plan, data, mesh8)
    assert ei.value.supernode is not None


def test_partitioned_solve_matches_single(mesh8):
    from sparsecholesky_tpu.parallel import pstore
    from sparsecholesky_tpu import numeric, solve as _solve
    from sparsecholesky_tpu.ordering import nd_grid

    A = generators.poisson2d(12)
    plan = compile_plan(A, perm=nd_grid((12, 12)))
    arrays, lay = pstore.shard_plan_partitioned(plan, 8)
    Lx_s, lay, d = pstore.factorize_partitioned(
        plan, A.data, mesh8, arrays=arrays, layout=lay
    )
    b = np.arange(1, plan.n + 1, dtype=np.float64)
    x = pstore.solve_partitioned(plan, Lx_s, b, arrays=arrays, layout=lay,
                                 mesh=mesh8, d=d)
    # reference: single-chip factor + solve
    Lx1, d1 = numeric.factorize(plan, A.data)
    x1 = _solve.solve(plan, Lx1, b, d=d1)
    np.testing.assert_allclose(np.asarray(x), np.asarray(x1), rtol=1e-9,
                               atol=1e-9 * float(np.abs(np.asarray(x1)).max()))
    # and it actually solves the system
    r = A.to_scipy() @ np.asarray(x, dtype=np.float64) - b
    assert np.linalg.norm(r) / np.linalg.norm(b) < 1e-5


# ---------------------------------------------------------------------------
# C2: distributed wide separators (forced-wide threshold on the fake mesh,
# per VERDICT round-1 item 4)


@pytest.fixture(scope="module")
def p3d12():
    """Shared ND-ordered poisson3d(12) fixture for the wide tests: the
    plan and single-chip reference factor are identical across them, and
    each costs ~10s of the 1-core suite budget."""
    from sparsecholesky_tpu import numeric
    from sparsecholesky_tpu.ordering import nd_grid

    A = generators.poisson3d(12)
    plan = compile_plan(A, perm=nd_grid((12, 12, 12)))
    Lx1, _d1 = numeric.factorize(plan, A.data, extend="scatter")
    return A, plan, np.asarray(Lx1)


def _check_wide(A, mesh, wide_nseg, perm=None, extend="scatter", ndev=8,
                pre=None):
    from sparsecholesky_tpu.parallel import pstore
    from sparsecholesky_tpu import numeric

    if pre is not None:
        A, plan, Lx1 = pre
    else:
        plan = compile_plan(A, perm=perm)
        Lx1, _d1 = numeric.factorize(plan, A.data, extend="scatter")
        Lx1 = np.asarray(Lx1)
    Lx_s, lay, d = pstore.factorize_partitioned(
        plan, A.data, mesh, extend=extend, wide_nseg=wide_nseg,
    )
    assert lay.wide.any(), "fixture must actually contain a wide supernode"
    full = pstore.gather_full(plan, Lx_s, lay)
    np.testing.assert_allclose(
        full, Lx1,
        atol=1e-9 * max(1.0, float(np.abs(Lx1).max())),
    )
    return lay


def test_wide_separator_distributed(mesh8, p3d12):
    # poisson3d(12) ND: root separator has 144 columns -> 2 lane segments
    lay = _check_wide(None, mesh8, wide_nseg=2, pre=p3d12)
    # the wide block's segments really live on different chips
    ws = np.where(lay.wide)[0]
    owners = {lay.wide_owner(int(s), k)
              for s in ws for k in range(2)}
    assert len(owners) > 1


def test_wide_all_top_distributed(mesh8):
    # wide_nseg=1: EVERY top supernode distributes (empty narrow region),
    # exercising wide->wide partial updates and the halo exchange
    from sparsecholesky_tpu.ordering import nd_grid

    A = generators.poisson2d(16)
    _check_wide(A, mesh8, wide_nseg=1, perm=nd_grid((16, 16)))


def test_wide_irregular_amd(mesh8):
    # irregular/AMD fixture (VERDICT r4 item 4): an AMD-ordered irregular
    # mesh exercises mode/offset mixes (greedy flop-aware woff, a
    # 2-segment wide supernode, 16 wavefront levels) that the regular-grid
    # fixtures never hit on the partitioned path
    from sparsecholesky_tpu.ordering import compute_ordering

    A = generators.irregular3d(12)
    perm = compute_ordering(A, "amd")
    lay = _check_wide(A, mesh8, wide_nseg=1, perm=perm)
    assert int(np.max([int(lay.wide[s]) for s in range(len(lay.wide))])) == 1


def test_wide_below_rows_dead_lane_mask(mesh8, p3d12):
    # regression (found on irregular3d(18)): a distributed wide supernode
    # with BELOW rows (mb > 0) and a non-lane-multiple width — the last
    # 128-row window's triangular solve back-substitutes through Lkk's
    # junk dead columns and must be column-masked, or garbage lands in
    # the store's dead lanes and leaks into the partial Schur update.
    # wide_nseg=1 on 3D ND makes mid-level separators (w % 128 != 0,
    # m > 128) distribute.
    _check_wide(None, mesh8, wide_nseg=1, pre=p3d12)


def test_wide_runs_extend(mesh8, p3d12):
    _check_wide(None, mesh8, wide_nseg=2, extend="runs_xla", pre=p3d12)


def _check_wide_solve(A, mesh, wide_nseg, perm):
    """Sharded SpTRSV over distributed wide separators (VERDICT r2
    item 3): the fully-sharded solve must match the single-chip solve on
    a factor whose wide top supernodes are segment-cyclically
    distributed."""
    from sparsecholesky_tpu.parallel import pstore
    from sparsecholesky_tpu import numeric, solve as _solve

    plan = compile_plan(A, perm=perm)
    arrays, lay = pstore.shard_plan_partitioned(plan, 8,
                                                wide_nseg=wide_nseg)
    assert lay.wide.any()
    Lx_s, lay, d = pstore.factorize_partitioned(
        plan, A.data, mesh, arrays=arrays, layout=lay)
    b = np.arange(1, plan.n + 1, dtype=np.float64)
    x = pstore.solve_partitioned(plan, Lx_s, b, arrays=arrays, layout=lay,
                                 mesh=mesh, d=d)
    Lx1, d1 = numeric.factorize(plan, A.data)
    x1 = _solve.solve(plan, Lx1, b, d=d1)
    np.testing.assert_allclose(
        np.asarray(x), np.asarray(x1), rtol=1e-9,
        atol=1e-9 * float(np.abs(np.asarray(x1)).max()))
    r = A.to_scipy() @ np.asarray(x, dtype=np.float64) - b
    assert np.linalg.norm(r) / np.linalg.norm(b) < 1e-6


def test_wide_solve_matches_single(mesh8):
    from sparsecholesky_tpu.ordering import nd_grid

    _check_wide_solve(generators.poisson3d(12), mesh8, 2,
                      nd_grid((12, 12, 12)))


def test_wide_solve_all_top(mesh8):
    # wide_nseg=1: every top supernode distributes (empty narrow top
    # region) — the edge case where the solve's top sweeps are ONLY wide
    from sparsecholesky_tpu.ordering import nd_grid

    _check_wide_solve(generators.poisson2d(16), mesh8, 1,
                      nd_grid((16, 16)))


def test_partition_balance_efficiency_pinned():
    """A partitioning regression must not ship silently (VERDICT r2 weak
    item 8): pin balance_efficiency on a representative ND-ordered 3D
    plan.  Measured 0.84 on this fixture at 4 chips; 0.70 is the BASELINE
    protocol's scaling-efficiency floor."""
    from sparsecholesky_tpu.parallel import pstore
    from sparsecholesky_tpu.ordering import nd_grid

    A = generators.poisson3d(16)
    plan = compile_plan(A, perm=nd_grid((16, 16, 16)), layout="compact")
    rep = pstore.partition_report(
        plan, pstore.build_layout(plan, 4, wide_nseg=2))
    assert rep["balance_efficiency"] >= 0.90, rep["balance_efficiency"]
    # wide_nseg=1 distributes EVERY top supernode: the replicated-work
    # fraction must then collapse (measured 0.0009 on this fixture) —
    # this is the knob config 5 uses to kill top replication at scale
    # (single-segment "wide" supernodes land whole on one chip, so
    # balance dips on a tiny fixture — 0.56 measured; the flop count,
    # not the balance, is what this mode trades for zero replication)
    rep1 = pstore.partition_report(
        plan, pstore.build_layout(plan, 4, wide_nseg=1))
    assert rep1["balance_efficiency"] >= 0.50, rep1["balance_efficiency"]
    assert rep1["replicated_fraction"] <= 0.05, rep1["replicated_fraction"]


def test_partition_report_invariants():
    # host-only: the estimated per-chip balance report (VERDICT item 4)
    from sparsecholesky_tpu.parallel import pstore
    from sparsecholesky_tpu.ordering import nd_grid

    A = generators.poisson3d(12)
    plan = compile_plan(A, perm=nd_grid((12, 12, 12)), layout="compact")
    lay = pstore.build_layout(plan, 4, wide_nseg=2)
    rep = pstore.partition_report(plan, lay)
    assert rep["ndev"] == 4
    S = plan.S
    fl = [S.sn_width(s) ** 3 // 3
          + S.sn_width(s) ** 2 * (S.sn_height(s) - S.sn_width(s))
          + S.sn_width(s) * (S.sn_height(s) - S.sn_width(s)) ** 2
          for s in range(plan.ns)]
    # local parts partition the owned-supernode flops exactly
    owned = sum(f for s, f in enumerate(fl) if lay.owner[s] >= 0)
    assert sum(rep["local_flops"]) == owned
    # wide shares never exceed the wide flop total (floor rounding) and
    # actually distribute across more than one chip
    widetot = sum(f for s, f in enumerate(fl)
                  if lay.owner[s] < 0 and lay.wide[s])
    assert widetot > 0 and 0 < sum(rep["wide_flops"]) <= widetot
    assert np.count_nonzero(rep["wide_flops"]) > 1
    # accounting closes: every flop is local, wide, or replicated-narrow
    # narrow-top compute is DEALT (round 4): the report carries its true
    # flop total and a per-chip padded wall model >= the ideal share
    narrow = sum(f for s, f in enumerate(fl)
                 if lay.owner[s] < 0 and not lay.wide[s])
    assert rep["top_true_flops"] == narrow
    assert rep["top_flops_per_chip"] >= narrow // rep["ndev"]
    assert owned + widetot + narrow == plan.true_flops()
    assert 0 < rep["balance_efficiency"] <= 1.0
    assert rep["store_bytes_per_chip"] == (
        lay.R_local * 128 * plan.dtype.itemsize
    )
