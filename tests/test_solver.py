"""Invariants for the E3 solver loop (simulation/solver.py): symmetric
spring forces conserve momentum, the snapshot cadence writes
step-partitioned output, and the loop is deterministic."""

from __future__ import annotations

from pyspark.sql import functions as F

from columnarmodeling_spark.simulation.solver import (
    run_solver,
    run_solver_blocked,
    spring_forces,
)


def _square(spark):
    # unit square, springs on the edges, rest length 0.8 (compressed)
    state = spark.createDataFrame(
        [
            (1, 0.0, 0.0, 0.0, 0.0, 1.0),
            (2, 1.0, 0.0, 0.0, 0.0, 1.0),
            (3, 1.0, 1.0, 0.0, 0.0, 1.0),
            (4, 0.0, 1.0, 0.0, 0.0, 1.0),
        ],
        "id long, x double, y double, vx double, vy double, m double",
    )
    bonds = spark.createDataFrame(
        [(1, 2, 0.8), (2, 3, 0.8), (3, 4, 0.8), (4, 1, 0.8)],
        "src long, dst long, rest double",
    )
    return state, bonds


def test_forces_are_symmetric(spark):
    state, bonds = _square(spark)
    f = spring_forces(state, bonds, k=1.0).agg(
        F.sum("fx").alias("sx"), F.sum("fy").alias("sy")
    ).collect()[0]
    assert abs(f["sx"]) < 1e-9 and abs(f["sy"]) < 1e-9


def test_solver_contracts_compressed_springs(spark):
    state, bonds = _square(spark)
    out = {
        r["id"]: (r["x"], r["y"])
        for r in run_solver(state, bonds, n_steps=10, k=1.0, dt=0.05).collect()
    }
    # compressed springs pull the square inward, symmetrically
    assert out[1][0] > 0.0 and out[3][0] < 1.0
    cx = sum(x for x, _ in out.values()) / 4
    cy = sum(y for _, y in out.values()) / 4
    assert abs(cx - 0.5) < 1e-9 and abs(cy - 0.5) < 1e-9  # centroid fixed


def test_solver_determinism(spark):
    state, bonds = _square(spark)
    a = sorted(map(tuple, run_solver(state, bonds, 5, 1.0, 0.05).collect()))
    b = sorted(map(tuple, run_solver(state, bonds, 5, 1.0, 0.05).collect()))
    assert a == b


def test_snapshot_cadence_and_pruning(spark, tmp_path):
    state, bonds = _square(spark)
    out = str(tmp_path / "snaps")
    run_solver(state, bonds, n_steps=10, k=1.0, dt=0.05, n_out=5, out_path=out)
    snaps = spark.read.parquet(out)
    assert sorted(
        r["step"] for r in snaps.select("step").distinct().collect()
    ) == [5, 10]
    pruned = snaps.filter(F.col("step") == 10)
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(step" in plan
    assert pruned.count() == 4


def _lattice(spark, nx=12, ny=6, spacing=1.0):
    """Rectangular spring lattice with slightly compressed rest lengths."""
    pts = [
        (j * nx + i, i * spacing, j * spacing, 0.0, 0.0, 1.0)
        for j in range(ny)
        for i in range(nx)
    ]
    edges = []
    for j in range(ny):
        for i in range(nx):
            a = j * nx + i
            if i + 1 < nx:
                edges.append((a, a + 1, 0.9 * spacing))
            if j + 1 < ny:
                edges.append((a, a + nx, 0.9 * spacing))
    state = spark.createDataFrame(
        pts, "id long, x double, y double, vx double, vy double, m double"
    )
    bonds = spark.createDataFrame(edges, "src long, dst long, rest double")
    return state, bonds


def test_fused_solver_matches_per_step(spark):
    """fuse>1 only changes job boundaries, never the numbers."""
    state, bonds = _square(spark)
    a = sorted(map(tuple, run_solver(state, bonds, 8, 1.0, 0.05).collect()))
    b = sorted(
        map(tuple, run_solver(state, bonds, 8, 1.0, 0.05, fuse=4).collect())
    )
    assert a == b


def test_blocked_solver_matches_per_step(spark):
    """Halo-exchange block solver must be exact for owned particles: the
    halo covers `fuse` bond-hops, and influence travels one hop per
    explicit-Euler step (the correctness argument in the docstring)."""
    state, bonds = _lattice(spark)
    ref = {
        r["id"]: r
        for r in run_solver(state, bonds, 10, k=1.0, dt=0.02).collect()
    }
    got = {
        r["id"]: r
        for r in run_solver_blocked(
            state, bonds, 10, k=1.0, dt=0.02, fuse=5, block=6.0, reach=1.2
        ).collect()
    }
    assert set(got) == set(ref)
    for i in ref:
        for c in ("x", "y", "vx", "vy"):
            assert abs(got[i][c] - ref[i][c]) < 1e-9, (i, c)


def test_blocked_solver_multi_block(spark):
    """Small blocks force real halo traffic across ≥ 4 blocks."""
    state, bonds = _lattice(spark, nx=16, ny=8)
    ref = sorted(
        map(tuple, run_solver(state, bonds, 6, k=0.5, dt=0.02).collect())
    )
    got = sorted(
        map(
            tuple,
            run_solver_blocked(
                state, bonds, 6, k=0.5, dt=0.02, fuse=3, block=4.0, reach=1.0
            ).collect(),
        )
    )
    assert len(got) == len(ref)
    for a, b in zip(got, ref):
        assert a[0] == b[0]
        for u, v in zip(a[1:], b[1:]):
            assert abs(u - v) < 1e-9


def test_coincident_particles_exert_no_force(spark):
    # dist = 0: no defined bond axis -> zero force, no ANSI
    # DIVIDE_BY_ZERO (regression: sf0.1 customer table has duplicate
    # (acctbal, custkey%97) coordinates)
    state = spark.createDataFrame(
        [
            (1, 0.5, 0.5, 0.0, 0.0, 1.0),
            (2, 0.5, 0.5, 0.0, 0.0, 1.0),
            (3, 1.5, 0.5, 0.0, 0.0, 1.0),
        ],
        "id long, x double, y double, vx double, vy double, m double",
    )
    bonds = spark.createDataFrame(
        [(1, 2, 0.0), (2, 3, 0.9)],
        "src long, dst long, rest double",
    )
    rows = {
        r["id"]: r
        for r in spring_forces(state, bonds, k=1.0).collect()
    }
    assert rows[1]["fx"] == 0.0 and rows[1]["fy"] == 0.0
    # the 2-3 spring is stretched (1.0 > 0.9): pulls 2 toward 3
    assert rows[2]["fx"] > 0.0
