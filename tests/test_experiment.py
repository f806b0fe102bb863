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


def test_measure_series_and_solver_config(spark, tmp_path):
    """MeasurePar.dat probes + MLS00con.dat gravity/damping fields: the
    experiment emits an M-series with one row per probe per cadence
    point, displacement consistent with the snapshot positions, and the
    config parsers round-trip the reference file layouts."""
    from columnarmodeling_spark.sources.text_tables import (
        read_measure_points,
        read_solver_config,
    )

    # parser: the shipped MeasurePar layout (mode, n, items, ids...)
    mp = tmp_path / "MeasurePar.dat"
    mp.write_text("0\n2\n2\n71756\n102380\n")
    got = read_measure_points(spark, str(mp))
    assert got == {"mode": 0, "n_items": 2, "ids": (71756, 102380)}

    # parser: the 13-field MLS00con block (gravity fields 10-12, Dp 13)
    con = tmp_path / "MLS00con.dat"
    con.write_text("50 50 50\n2\n0.5\n1e-007\n0.05\n0.0001\n250\n0\n0\n0\n0.6\n")
    # note: the shipped file packs Lx Ly Lz on one line — 13 tokens total
    cfgd = read_solver_config(spark, str(con))
    assert cfgd["dGap"] == 0.5 and cfgd["Dp"] == 0.6 and cfgd["Gx"] == 0.0

    cfg = ExperimentConfig(
        d_gap=1.5, k=1.0, dt=0.005, n_steps=40, n_out=20, fuse=20,
        gravity=(0.0, -0.1), damping=0.3, measure_ids=(0, 105, 199),
    )
    res = run_experiment(spark, _lattice(spark), cfg, str(tmp_path / "s"))
    m = {(r["step"], r["id"]): r for r in res["m_series"].collect()}
    assert set(m) == {
        (s, i) for s in (20, 40) for i in (0, 105, 199)
    }
    # displacement = position - initial (squeezed) position; probe rows
    # agree with the snapshot store at the same step
    snaps = spark.read.parquet(str(tmp_path / "s"))
    s40 = {
        r["id"]: r
        for r in snaps.filter("step = 40 AND id IN (0, 105, 199)").collect()
    }
    for pid in (0, 105, 199):
        assert abs(m[(40, pid)]["x"] - round(s40[pid]["x"], 6)) < 1e-9
        assert abs(m[(40, pid)]["ux"] - (m[(40, pid)]["x"] - m[(20, pid)]["x"]
                   + m[(20, pid)]["ux"])) < 1e-5
    # gravity pulls the specimen down: mean displacement uy < 0 at end
    mean_uy = sum(m[(40, i)]["uy"] for i in (0, 105, 199)) / 3
    assert mean_uy < 0.0


def test_explicit_bond_list_input(spark, tmp_path):
    """MLSBond.dat path: an explicit edge list (flag line + 'src dst
    type' rows, read by the S3 scan) replaces the dGap bond build; rest
    lengths fill from initial center distances, so a run over the
    gap-join's own edge set is identical to the built-in path."""
    from columnarmodeling_spark.simulation.experiment import build_bonds
    from columnarmodeling_spark.sources.text_tables import read_edge_list

    pts = _lattice(spark)
    cfg = ExperimentConfig(
        d_gap=1.5, k=1.0, dt=0.005, n_steps=20, n_out=20, fuse=20
    )
    built = build_bonds(pts, cfg)

    # write the built edge set in MLSBond.dat layout, read it back
    f = tmp_path / "MLSBond.dat"
    lines = ["0"] + [
        f"{r['src']} {r['dst']} 10" for r in built.collect()
    ]
    f.write_text("\n".join(lines) + "\n")
    edges = read_edge_list(spark, str(f))
    assert edges.count() == built.count()

    a = run_experiment(spark, pts, cfg, str(tmp_path / "a"))
    b = run_experiment(spark, pts, cfg, str(tmp_path / "b"), bonds=edges)
    fa = {r["id"]: r for r in a["final"].collect()}
    fb = {r["id"]: r for r in b["final"].collect()}
    assert set(fa) == set(fb)
    for i in fa:
        for c in ("x", "y", "vx", "vy"):
            assert abs(fa[i][c] - fb[i][c]) < 1e-9, (i, c)
