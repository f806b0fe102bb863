"""Lattice-spring time loop as an iterative DataFrame pipeline (E3).

The reference's solver (closed-source ``4D-LSM 8.230.exe``) advances
particle state per step ``dT`` over a fixed spring-bond network and
appends output every ``nOutLoops`` steps
(``/root/reference/UniaxialCompressionTest/MLS00con.dat:4-7``, field
docs ``SysFile.ini:55-63``; bonds ``MLSBond.dat``; snapshots
``Output/MLSOut*.bin``). The engine re-expresses one explicit-integration
step as pure relational algebra:

1. edge join: state ⋈ bonds (both directions) → per-bond spring force
   ``k·(dist − rest_length)`` along the bond axis;
2. force aggregation per particle (hash agg — partial+final);
3. integration: ``v += (F/m)·dT`` , ``x += v·dT`` (map-side expressions);
4. every *n_out* steps, append the state to Parquet partitioned by
   ``step`` (S9/S10: the snapshot store; filename-embedded step becomes
   partition pruning on read-back).

The driver loop carries only the DataFrame handle; state stays
distributed and lineage is truncated per step (``localCheckpoint``, the
same discipline as Lloyd/connected-components). At 100 TB the state
shuffle is keyed by particle id and the bond join by src id — both
pre-partitionable (bucketing) so steady-state steps reuse partitioning.
OpenMP threads (``CORENUM.txt``) map to executor cores.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def spring_forces(state: DataFrame, bonds: DataFrame, k: float) -> DataFrame:
    """Per-particle net spring force from the bond edge list.

    *state*: ``id, x, y, vx, vy, m``; *bonds*: ``src, dst, rest`` (one
    row per undirected bond). Returns ``id, fx, fy``.
    """
    both = bonds.select("src", "dst", "rest").union(
        bonds.select(
            F.col("dst").alias("src"), F.col("src").alias("dst"), "rest"
        )
    )
    a = state.select(
        F.col("id").alias("src"), F.col("x").alias("ax"), F.col("y").alias("ay")
    )
    b = state.select(
        F.col("id").alias("dst"), F.col("x").alias("bx"), F.col("y").alias("by")
    )
    e = both.join(a, "src").join(b, "dst")
    dx, dy = F.col("bx") - F.col("ax"), F.col("by") - F.col("ay")
    dist = F.sqrt(dx * dx + dy * dy)
    # force on src toward dst when stretched (dist > rest); coincident
    # particles (dist = 0) have no defined bond axis and exert no force —
    # the guard also keeps ANSI mode from raising DIVIDE_BY_ZERO
    mag = F.lit(k) * (dist - F.col("rest"))
    ux = F.when(dist > 0, dx / dist).otherwise(F.lit(0.0))
    uy = F.when(dist > 0, dy / dist).otherwise(F.lit(0.0))
    fx, fy = mag * ux, mag * uy
    return (
        e.select(F.col("src").alias("id"), fx.alias("fx"), fy.alias("fy"))
        .groupBy("id")
        .agg(F.sum("fx").alias("fx"), F.sum("fy").alias("fy"))
    )


def step(state: DataFrame, bonds: DataFrame, k: float, dt: float) -> DataFrame:
    """One explicit-Euler step; returns the next state DataFrame."""
    f = spring_forces(state, bonds, k)
    s = state.join(f, "id", "left").fillna(0.0, ["fx", "fy"])
    vx = F.col("vx") + F.col("fx") / F.col("m") * dt
    vy = F.col("vy") + F.col("fy") / F.col("m") * dt
    return s.select(
        "id",
        (F.col("x") + vx * dt).alias("x"),
        (F.col("y") + vy * dt).alias("y"),
        vx.alias("vx"),
        vy.alias("vy"),
        "m",
    )


def run_solver(
    state: DataFrame,
    bonds: DataFrame,
    n_steps: int,
    k: float = 1.0,
    dt: float = 0.01,
    n_out: int = 0,
    out_path: str | None = None,
) -> DataFrame:
    """Advance *n_steps*; optionally append every *n_out*-th state to a
    step-partitioned Parquet snapshot store (the MLSOut cadence)."""
    bonds = bonds.localCheckpoint(eager=False)
    for i in range(1, n_steps + 1):
        state = step(state, bonds, k, dt).localCheckpoint()
        if n_out and out_path and i % n_out == 0:
            state.withColumn("step", F.lit(i)).write.mode("append").partitionBy(
                "step"
            ).parquet(out_path)
    return state
