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


def test_load_curve_ramp_drives_platen(spark, tmp_path):
    """E3 load-curve BCs (MLSLD00.dat value rows + Load_Data curve):
    a two-segment ramp-then-hold curve on the top platen prescribes its
    velocity each sub-step, so the platen trajectory must equal the
    closed-form integral of the curve — independent of spring forces —
    while the clamped bottom row stays exactly put."""
    import numpy as np

    nx, ny = 20, 10
    dt, n_steps = 0.005, 40
    t_half = 20 * dt  # ramp ends at step 20
    cfg = ExperimentConfig(
        d_gap=1.5,
        k=1.0,
        dt=dt,
        n_steps=n_steps,
        n_out=20,
        fuse=20,
        platen_vy=-0.5,
        load_curve=((0.0, 0.0), (t_half, 1.0), (2 * t_half, 1.0)),
    )
    res = run_experiment(spark, _lattice(spark, nx, ny), cfg, str(tmp_path / "s"))
    final = {r["id"]: r for r in res["final"].collect()}

    # closed form: y(N) = y0 + platen_vy * dt * sum_i scale(i*dt)
    ct = [p[0] for p in cfg.load_curve]
    cv = [p[1] for p in cfg.load_curve]
    y_top = float(ny - 1)
    for i in range(1, n_steps + 1):
        y_top += cfg.platen_vy * float(np.interp(i * dt, ct, cv)) * dt
    for i in range(nx):  # top row: ids (ny-1)*nx .. (ny-1)*nx+nx-1
        pid = (ny - 1) * nx + i
        assert abs(final[pid]["y"] - y_top) < 1e-9
        assert abs(final[pid]["vy"] - cfg.platen_vy) < 1e-12  # hold seg
    for i in range(nx):  # bottom row clamped at zero exactly
        assert final[i]["y"] == 0.0
        assert final[i]["vy"] == 0.0

    # E series: top platen sum_vy = 20 particles x prescribed velocity
    # (scale hits 1.0 exactly at both cadence points)
    e = {(r["step"], r["platen"]): r for r in res["e_series"].collect()}
    assert abs(e[(20, "top")]["sum_vy"] - nx * cfg.platen_vy) < 1e-6
    assert abs(e[(40, "top")]["sum_vy"] - nx * cfg.platen_vy) < 1e-6
    assert e[(40, "top")]["mean_y"] < e[(20, "top")]["mean_y"]
