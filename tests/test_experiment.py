"""End-to-end experiment invariants (SURVEY §3 E3 + §5 golden-output
strategy): the full chain — lattice → gap-join bonds → blocked solver →
step-partitioned snapshots → E/B series — must reproduce the physical
behavior the reference's canonical cases document: a compressed
uniaxial specimen pushes its platens apart, momentum stays ~zero, and
snapshot partitions prune on step."""

from __future__ import annotations

from pyspark.sql import functions as F

from columnarmodeling_spark.simulation.experiment import (
    ExperimentConfig,
    run_experiment,
)


def _lattice(spark, nx=20, ny=10):
    pts = [
        (j * nx + i, float(i), float(j))
        for j in range(ny)
        for i in range(nx)
    ]
    return spark.createDataFrame(pts, "id long, x double, y double")


def test_uniaxial_experiment_end_to_end(spark, tmp_path):
    out = str(tmp_path / "snaps")
    cfg = ExperimentConfig(
        d_gap=1.5, k=1.0, dt=0.005, n_steps=40, n_out=20, fuse=20
    )
    res = run_experiment(spark, _lattice(spark), cfg, out)

    # all particles survive the loop
    assert res["final"].count() == 200

    # E series: one row per platen per output step
    e = {
        (r["step"], r["platen"]): r
        for r in res["e_series"].collect()
    }
    assert set(e) == {(20, "top"), (20, "bottom"), (40, "top"), (40, "bottom")}
    # compressed springs push the platens apart: top moves up over time,
    # bottom moves down (uniaxial rebound)
    assert e[(40, "top")]["mean_y"] > e[(20, "top")]["mean_y"] - 1e-9
    assert e[(40, "bottom")]["mean_y"] < e[(20, "bottom")]["mean_y"] + 1e-9

    # B series: bbox expands in y as the specimen rebounds; momentum ~0
    b = {r["step"]: r for r in res["b_series"].collect()}
    assert b[40]["y_max"] - b[40]["y_min"] >= b[20]["y_max"] - b[20]["y_min"] - 1e-9
    mom = res["final"].agg(F.sum("vy")).collect()[0][0]
    assert abs(mom) < 1e-6

    # S9 snapshot store: one partition per cadence point, pruned reads
    snaps = spark.read.parquet(out)
    assert sorted(
        r["step"] for r in snaps.select("step").distinct().collect()
    ) == [20, 40]
    pruned = snaps.filter(F.col("step") == 40)
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(step" in plan
    assert pruned.count() == 200
