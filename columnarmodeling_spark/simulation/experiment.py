"""End-to-end experiment runner — the engine's analog of running one of
the reference's canonical test cases (SURVEY §3 E3; README.md:29-33
"cd into a case folder and run the exe").

The reference workflow per case folder (e.g. UniaxialCompressionTest):
manifest (``mls.c``) names the particle table, materials, boundary
conditions and output prefix; the solver links particles whose surface
gap is below ``dGap`` into spring bonds (``MLS00con.dat:1-3``), applies
range-predicate boundary conditions (``MLSLD00.dat``), advances
``T/dT`` explicit steps, and appends outputs every ``nOutLoops`` steps:
binary particle snapshots (``Output/MLSOut*.bin``) plus the E series
(per-platen reaction forces → stress–strain curve) and B series
(global bbox + damage scalar).

This module chains the engine's operators into that exact pipeline:

1. bond build = J1 ``grid_proximity_join`` (dGap semantics);
2. BC selection = P2 range predicate (platen = y-range band);
3. time loop = halo-exchange block solver (fuse steps/shuffle round);
4. snapshot sink = S9 step-partitioned parquet (partition pruning);
5. E series = A7 per-platen reaction aggregation per output step;
6. B series = A8 global bbox aggregation per output step.

Everything stays distributed: the only driver-side values are the
per-output-step E/B summary rows (a handful per cadence point).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from columnarmodeling_spark.operators.proximity import grid_proximity_join
from columnarmodeling_spark.simulation.solver import (
    BoundaryCondition,
    run_solver_blocked,
    run_solver_blocked_breaking,
    weibull_strengths,
)


@dataclass
class ExperimentConfig:
    """The ``MLS00con.dat`` scalar block, engine-side (SysFile.ini:45-71
    field docs): gap threshold, spring stiffness, step size, total
    steps, output cadence."""

    d_gap: float = 1.5
    k: float = 1.0
    dt: float = 0.005
    n_steps: int = 40
    n_out: int = 20  # output cadence (nOutLoops)
    fuse: int = 20
    platen_frac: float = 0.08  # top/bottom band thickness for E probes
    # strain threshold for bond failure; None = unbreakable network
    # (the pre-round-4 behavior) unless weibull is set
    strain_limit: float | None = None
    # per-bond Weibull strength heterogeneity (Webull.dat:1 — shape m,
    # scale sigma0): when set, every bond draws its own strength via
    # solver.weibull_strengths and strain_limit is ignored
    weibull: tuple[float, float] | None = None
    # time-varying loading program (MLSLD00.dat value rows + Load_Data
    # curve, SysFile.ini:72-186): when platen_vy is set, the top platen
    # band is DRIVEN — its velocity is prescribed each sub-step as
    # platen_vy × piecewise_linear(load_curve, t) and the bottom band is
    # clamped at zero, exactly the shipped uniaxial case's two BC blocks
    # (bottom 0-valued, top -20-valued ramp). load_curve=None with
    # platen_vy set = constant loading; platen_vy=None = the undriven
    # squeeze-and-relax initial condition (pre-round-6 behavior).
    platen_vy: float | None = None
    load_curve: tuple[tuple[float, float], ...] | None = None
    # MLS00con.dat fields 10-13: gravity vector + local damping Dp
    # (the shipped uniaxial case runs Dp=0.6)
    gravity: tuple[float, float] = (0.0, 0.0)
    damping: float = 0.0
    # MeasurePar.dat probe particles: when set, run_experiment also
    # returns an m_series (per-output-step state + displacement rows
    # for these ids — the Output/MLSOut00M.dat analog)
    measure_ids: tuple[int, ...] | None = None


def build_bonds(particles: DataFrame, cfg: ExperimentConfig) -> DataFrame:
    """J1: link particle pairs with surface gap < d_gap (MLSBond.dat
    shape ``src dst rest``; rest = initial center distance so the
    network starts at equilibrium)."""
    pairs = grid_proximity_join(
        particles,
        eps=cfg.d_gap,
        coords=("x", "y"),
        id_col="id",
        radius_col="r" if "r" in particles.columns else None,
    )
    return pairs.select("src", "dst", F.col("dist").alias("rest"))


def run_experiment(
    spark: SparkSession,
    particles: DataFrame,
    cfg: ExperimentConfig,
    out_path: str,
    bonds: DataFrame | None = None,
) -> dict[str, DataFrame]:
    """Run the full case: returns dict with ``final`` state, ``e_series``
    (per-platen reactions per output step), ``b_series`` (bbox +
    displacement scalar per output step) and — when
    ``cfg.measure_ids`` is set (MeasurePar.dat probes) — ``m_series``
    (per-probe state + displacement rows, the MLSOut00M.dat analog);
    snapshots land under *out_path* partitioned by ``step``.

    The initial state is squeezed 2% in y (uniaxial compression analog:
    the platen displacement of ``MLSLD00.dat``'s -20-valued BC rows),
    so the compressed spring network pushes back and the E series shows
    a relaxing reaction force.
    """
    bounds = particles.agg(
        F.min("y").alias("y0"), F.max("y").alias("y1")
    ).collect()[0]
    y0, y1 = float(bounds["y0"]), float(bounds["y1"])
    band = (y1 - y0) * cfg.platen_frac

    if bonds is None:
        # dGap bond build (the solver's own linking pass)
        bonds = build_bonds(particles, cfg).localCheckpoint(eager=False)
    else:
        # explicit MLSBond.dat-style edge list (src, dst[, type]):
        # rest length = initial center distance, same equilibrium
        # convention as build_bonds
        pa = particles.select(
            F.col("id").alias("src"),
            F.col("x").alias("__ax"),
            F.col("y").alias("__ay"),
        )
        pb = particles.select(
            F.col("id").alias("dst"),
            F.col("x").alias("__bx"),
            F.col("y").alias("__by"),
        )
        if "rest" not in bonds.columns:
            bonds = (
                bonds.join(pa, "src")
                .join(pb, "dst")
                .withColumn(
                    "rest",
                    F.sqrt(
                        (F.col("__bx") - F.col("__ax")) ** 2
                        + (F.col("__by") - F.col("__ay")) ** 2
                    ),
                )
                .drop("__ax", "__ay", "__bx", "__by")
            )
        bonds = bonds.drop("type").localCheckpoint(eager=False)

    if cfg.platen_vy is not None:
        # load-driven run: the two MLSLD00.dat BC blocks — bottom slab
        # clamped, top platen velocity follows the Load_Data curve.
        # The lattice starts at rest; all deformation comes from the BC.
        bcs: tuple[BoundaryCondition, ...] | None = (
            BoundaryCondition(y1=y0 + band, kind="velocity", vx=0.0, vy=0.0),
            BoundaryCondition(
                y0=y1 - band,
                kind="velocity",
                vx=0.0,
                vy=cfg.platen_vy,
                curve=cfg.load_curve,
            ),
        )
        state = particles.select(
            "id",
            "x",
            "y",
            F.lit(0.0).alias("vx"),
            F.lit(0.0).alias("vy"),
            F.lit(1.0).alias("m"),
        )
    else:
        bcs = None
        # uniaxial squeeze: positions compressed toward the mid-plane
        mid = 0.5 * (y0 + y1)
        state = particles.select(
            "id",
            "x",
            (mid + (F.col("y") - mid) * 0.98).alias("y"),
            F.lit(0.0).alias("vx"),
            F.lit(0.0).alias("vy"),
            F.lit(1.0).alias("m"),
        )

    breaking = cfg.strain_limit is not None or cfg.weibull is not None
    if cfg.weibull is not None:
        # Webull.dat heterogeneity: every bond draws its own strength
        m_shape, sigma0 = cfg.weibull
        bonds = weibull_strengths(bonds, m_shape, sigma0).localCheckpoint(eager=False)
    bond_cols = bonds.columns

    n_bonds_total = bonds.count()
    if cfg.measure_ids:
        # MeasurePar.dat probes: displacement baseline = the t=0 state
        m_base = state.filter(F.col("id").isin(*cfg.measure_ids)).select(
            "id", F.col("x").alias("x0"), F.col("y").alias("y0")
        ).localCheckpoint(eager=False)
    e_rows: list[DataFrame] = []
    b_rows: list[DataFrame] = []
    m_rows: list[DataFrame] = []
    step = 0
    while step < cfg.n_steps:
        burst = min(cfg.n_out, cfg.n_steps - step)
        if not breaking:
            state = run_solver_blocked(
                state, bonds, burst, k=cfg.k, dt=cfg.dt, fuse=cfg.fuse,
                bcs=bcs, step0=step, gravity=cfg.gravity,
                damping=cfg.damping,
            )
            n_alive = n_bonds_total
        else:
            # A8 damage: bonds past the strain limit fail and stay
            # failed — the surviving network feeds the next burst
            state, bond_log = run_solver_blocked_breaking(
                state,
                bonds,
                burst,
                strain_limit=cfg.strain_limit,
                k=cfg.k,
                dt=cfg.dt,
                fuse=cfg.fuse,
                step0=step,  # keep logged break steps global across bursts
                bcs=bcs,
                gravity=cfg.gravity,
                damping=cfg.damping,
            )
            bonds = (
                bond_log.filter("break_step < 0")
                .select(*bond_cols)
                .localCheckpoint(eager=False)
            )
            n_alive = bonds.count()
        step += burst
        # S9 snapshot sink: parquet partitioned by step → the read side
        # prunes on the step partition column like the reference's
        # filename-embedded step
        state.withColumn("step", F.lit(step)).write.mode("append").partitionBy(
            "step"
        ).parquet(out_path)

        # A7 E-series: per-platen mean displacement + reaction proxy
        platen = F.when(F.col("y") >= y1 - band, F.lit("top")).when(
            F.col("y") <= y0 + band, F.lit("bottom")
        )
        e_rows.append(
            state.withColumn("platen", platen)
            .filter(F.col("platen").isNotNull())
            .groupBy("platen")
            .agg(
                F.round(F.avg("y"), 6).alias("mean_y"),
                F.round(F.sum("vy"), 6).alias("sum_vy"),
                F.count("*").alias("n"),
            )
            .withColumn("step", F.lit(step))
        )
        # A8 B-series: global bbox + mean displacement magnitude +
        # damage (broken-bond ratio — the reference B-file's scalar)
        b_rows.append(
            state.agg(
                F.round(F.min("x"), 6).alias("x_min"),
                F.round(F.max("x"), 6).alias("x_max"),
                F.round(F.min("y"), 6).alias("y_min"),
                F.round(F.max("y"), 6).alias("y_max"),
                F.round(
                    F.avg(F.sqrt(F.col("vx") ** 2 + F.col("vy") ** 2)), 6
                ).alias("mean_speed"),
            )
            .withColumn("step", F.lit(step))
            .withColumn("n_alive_bonds", F.lit(n_alive))
            .withColumn(
                "damage",
                F.round(
                    F.lit(
                        (n_bonds_total - n_alive) / max(n_bonds_total, 1)
                    ),
                    6,
                ),
            )
        )
        # M-series: per-probe state + displacement at the output cadence
        # (MeasurePar.dat ids → Output/MLSOut00M.dat rows)
        if cfg.measure_ids:
            m_rows.append(
                state.filter(F.col("id").isin(*cfg.measure_ids))
                .join(F.broadcast(m_base), "id")
                .select(
                    F.lit(step).cast("long").alias("step"),
                    "id",
                    F.round("x", 6).alias("x"),
                    F.round("y", 6).alias("y"),
                    F.round("vx", 6).alias("vx"),
                    F.round("vy", 6).alias("vy"),
                    F.round(F.col("x") - F.col("x0"), 6).alias("ux"),
                    F.round(F.col("y") - F.col("y0"), 6).alias("uy"),
                )
            )

    e_series = e_rows[0]
    for df in e_rows[1:]:
        e_series = e_series.unionByName(df)
    b_series = b_rows[0]
    for df in b_rows[1:]:
        b_series = b_series.unionByName(df)
    out = {"final": state, "e_series": e_series, "b_series": b_series}
    if cfg.measure_ids:
        m_series = m_rows[0]
        for df in m_rows[1:]:
            m_series = m_series.unionByName(df)
        out["m_series"] = m_series
    return out
