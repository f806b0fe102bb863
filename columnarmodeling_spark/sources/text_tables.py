"""Whitespace / positional text-table scans (SURVEY §2.1 S1-S5).

The reference's interchange IR is whitespace-separated positional text:
point tables with 2-or-3-column arity tolerance and bad-line skipping
(``BooleanOperation.py:43-66``), count-headed particle tables
(``BALL3D_PSLICE.dat:1``), flag-headed edge lists (``MLSBond.dat:1``),
and the two-section geometry∥attribute file (``MLSJDat.dat``). Field
meaning is positional — documented only in ``SysFile.ini`` — so every
scan here takes an explicit schema; nothing is inferred.

All scans parse with JVM-side column expressions (split + element_at),
not Python row loops.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

POINT_SCHEMA = T.StructType(
    [
        T.StructField("x", T.DoubleType()),
        T.StructField("y", T.DoubleType()),
        T.StructField("z", T.DoubleType()),
    ]
)


def _tokens(line=None):
    line = line if line is not None else F.col("value")
    return F.filter(F.split(F.trim(line), r"\s+"), lambda s: s != "")


def read_point_table(spark: SparkSession, path: str) -> DataFrame:
    """S1: x y [z] lines; z defaults to 0.0; malformed lines dropped.

    Mirrors ``BooleanOperation.py:43-66``: the 2-vs-3 arity branch
    (:52-59) becomes a ``when`` on token count; the invalid-line log
    (:60-61) becomes a filter (count the rejects separately if needed
    via ``read_point_table_rejects``).
    """
    toks = _tokens()
    num = r"^-?\d+(\.\d+)?([eE][-+]?\d+)?$"
    lines = spark.read.text(path).select(toks.alias("t"))
    ok = lines.filter(
        (F.size("t").isin(2, 3))
        & F.forall("t", lambda s: s.rlike(num))
    )
    return ok.select(
        F.element_at("t", 1).cast("double").alias("x"),
        F.element_at("t", 2).cast("double").alias("y"),
        F.when(F.size("t") == 3, F.element_at("t", 3).cast("double"))
        .otherwise(F.lit(0.0))
        .alias("z"),
    )


def read_point_table_rejects(spark: SparkSession, path: str) -> DataFrame:
    """The malformed lines S1 skips (arity or non-numeric), for logging."""
    toks = _tokens()
    num = r"^-?\d+(\.\d+)?([eE][-+]?\d+)?$"
    lines = spark.read.text(path).select(F.col("value"), toks.alias("t"))
    return lines.filter(
        ~(
            (F.size("t").isin(2, 3))
            & F.forall("t", lambda s: s.rlike(num))
        )
        & (F.size("t") > 0)
    ).select("value")


def read_count_headed(
    spark: SparkSession, path: str, cols: list[str], validate: bool = True
) -> DataFrame:
    """S2: first line = row count, then fixed-arity numeric rows
    (``BALL3D_PSLICE.dat``). Header recognized by arity (a single
    token); optional validation asserts the declared count.
    """
    arity = len(cols)
    toks = _tokens()
    lines = spark.read.text(path).select(toks.alias("t"))
    data = lines.filter(F.size("t") == arity).select(
        *[
            F.element_at("t", i + 1).cast("double").alias(c)
            for i, c in enumerate(cols)
        ]
    )
    if validate:
        header = (
            lines.filter(F.size("t") == 1)
            .select(F.element_at("t", 1).cast("long").alias("n"))
            .collect()
        )
        if header:
            declared = header[0]["n"]
            actual = data.count()
            if declared is not None and declared != actual:
                raise ValueError(
                    f"count-headed table {path}: header declares {declared} "
                    f"rows, found {actual}"
                )
    return data


def read_edge_list(spark: SparkSession, path: str) -> DataFrame:
    """S3: flag line then ``src dst type`` rows (``MLSBond.dat``)."""
    toks = _tokens()
    lines = spark.read.text(path).select(toks.alias("t"))
    return lines.filter(F.size("t") == 3).select(
        F.element_at("t", 1).cast("long").alias("src"),
        F.element_at("t", 2).cast("long").alias("dst"),
        F.element_at("t", 3).cast("int").alias("type"),
    )


def read_two_section(
    spark: SparkSession,
    path: str,
    geo_cols: list[str],
    attr_cols: list[str],
) -> DataFrame:
    """S4/J5: N geometry rows followed by N attribute rows, aligned by
    row position (``MLSJDat.dat``: 406 triangle rows then 406 joint-
    material rows). File order is semantic, so this scan indexes lines
    with ``zipWithIndex`` (the one legitimately order-dependent source;
    text partitions preserve in-file order) and equi-joins the two
    sections on row index.
    """
    rdd = spark.sparkContext.textFile(path).zipWithIndex()
    lines = spark.createDataFrame(rdd, "value STRING, idx LONG")
    toks = _tokens()
    parsed = lines.select("idx", toks.alias("t")).filter(
        F.size("t") == len(geo_cols)
    )
    # after dropping headers/attr rows of different arity, re-rank
    from pyspark.sql import Window as W

    if len(geo_cols) == len(attr_cols):
        # same arity: split by position (first half geometry, second half
        # attributes) using the count
        n = parsed.count() // 2
        ranked = parsed.withColumn(
            "rn", F.row_number().over(W.orderBy("idx"))
        )
        geo = ranked.filter(F.col("rn") <= n).select(
            (F.col("rn") - 1).alias("row_id"),
            *[
                F.element_at("t", i + 1).cast("double").alias(c)
                for i, c in enumerate(geo_cols)
            ],
        )
        attr = ranked.filter(F.col("rn") > n).select(
            (F.col("rn") - 1 - n).alias("row_id"),
            *[
                F.element_at("t", i + 1).cast("double").alias(c)
                for i, c in enumerate(attr_cols)
            ],
        )
    else:
        geo_rows = lines.select("idx", toks.alias("t")).filter(
            F.size("t") == len(geo_cols)
        )
        attr_rows = lines.select("idx", toks.alias("t")).filter(
            F.size("t") == len(attr_cols)
        )
        geo = geo_rows.withColumn(
            "row_id", F.row_number().over(W.orderBy("idx")) - 1
        ).select(
            "row_id",
            *[
                F.element_at("t", i + 1).cast("double").alias(c)
                for i, c in enumerate(geo_cols)
            ],
        )
        attr = attr_rows.withColumn(
            "row_id", F.row_number().over(W.orderBy("idx")) - 1
        ).select(
            "row_id",
            *[
                F.element_at("t", i + 1).cast("double").alias(c)
                for i, c in enumerate(attr_cols)
            ],
        )
    return geo.join(attr, "row_id")


def read_config_scalars(
    spark: SparkSession, path: str, field_names: list[str]
) -> dict[str, float]:
    """S5: positional key-less scalar config → driver dict.

    The reference's solver params are bare numbers, one file per concern
    (``MLS00con.dat:1-11`` — 13 values whose meaning lives only in
    ``SysFile.ini:45-71``; likewise ``CORENUM.txt``, ``Webull.dat``).
    They parameterize every operator (dGap, CellSize, dT, nOutLoops), so
    the engine reads them driver-side and injects them as ``lit()``
    columns / broadcast config — never as a joined table (they are
    O(10) scalars; a join would shuffle for nothing).

    Whitespace-tolerant: values may be spread across lines. Extra values
    beyond *field_names* are ignored; missing ones raise.
    """
    tokens: list[str] = []
    # driver-side read of a tiny config file — not a Spark scan on
    # purpose (a 10-byte file per job step does not need an executor)
    with open(path) as fh:
        for line in fh:
            tokens.extend(line.split())
    if len(tokens) < len(field_names):
        raise ValueError(
            f"{path}: expected >= {len(field_names)} values, got {len(tokens)}"
        )
    return {name: float(v) for name, v in zip(field_names, tokens)}


MLS_CON_FIELDS = [
    "Lx", "Ly", "Lz", "CellSize", "dGap", "dT", "T", "dURatio",
    "nOutLoops", "Gx", "Gy", "Gz", "Dp",
]


def read_solver_config(spark: SparkSession, path: str) -> dict[str, float]:
    """The full 13-field ``MLS00con.dat`` block in SysFile.ini order
    (``SysFile.ini:45-71``): search box, cell size, bond gap, time
    step/horizon, output cadence, gravity vector and the local damping
    coefficient Dp (the shipped uniaxial case runs Dp=0.6)."""
    return read_config_scalars(spark, path, MLS_CON_FIELDS)


def read_measure_points(spark: SparkSession, path: str) -> dict:
    """``MeasurePar.dat`` (SysFile.ini:14-15 'Measure_Points'): the
    probe-particle list whose per-step state items append to the
    M-series output (``Output/MLSOut00M.dat``).

    Observed layout in every shipped case (e.g.
    ``UniaxialCompressionTest/MeasurePar.dat:1-5`` = ``0 2 2 71756
    102380``): a mode flag, the measure-point count n, an item-group
    count, then n particle ids. Returns ``{"mode": int, "n_items":
    int, "ids": tuple[int, ...]}``; driver-side like the other O(10)
    scalar configs (the ids become a broadcast isin filter, never a
    joined table).
    """
    tokens: list[str] = []
    with open(path) as fh:
        for line in fh:
            tokens.extend(line.split())
    if len(tokens) < 3:
        raise ValueError(f"{path}: expected >= 3 values, got {len(tokens)}")
    mode, n, n_items = int(tokens[0]), int(tokens[1]), int(tokens[2])
    ids = tuple(int(v) for v in tokens[3 : 3 + n])
    if len(ids) != n:
        raise ValueError(
            f"{path}: declared {n} measure points, found {len(ids)} ids"
        )
    return {"mode": mode, "n_items": n_items, "ids": ids}


def read_joint_facets(spark: SparkSession, path: str) -> DataFrame:
    """``MLSJDat.dat`` scan: a set-flag line, a facet-count line, then
    N 9-float rows — one triangle (x1 y1 z1  x2 y2 z2  x3 y3 z3) of the
    triangulated joint surface (the 4D-LSM discontinuity geometry;
    ``UniaxialCompressionTest/MLSJDat.dat:1-3`` = ``1``, ``406``, then
    406 triangles). Validates the declared facet count like the S2
    count-headed scan."""
    cols = ["x1", "y1", "z1", "x2", "y2", "z2", "x3", "y3", "z3"]
    toks = _tokens()
    lines = spark.read.text(path).select(toks.alias("t"))
    data = lines.filter(F.size("t") == 9).select(
        *[
            F.element_at("t", i + 1).cast("double").alias(c)
            for i, c in enumerate(cols)
        ]
    )
    headers = [
        r["n"]
        for r in lines.filter(F.size("t") == 1)
        .select(F.element_at("t", 1).cast("long").alias("n"))
        .collect()
    ]
    # two single-token header lines: [set_flag, facet_count]
    if len(headers) >= 2 and headers[1] is not None:
        actual = data.count()
        if headers[1] != actual:
            raise ValueError(
                f"joint table {path}: header declares {headers[1]} "
                f"facets, found {actual}"
            )
    return data


def read_joint_material(spark: SparkSession, path: str) -> dict:
    """``MLSJMat.dat``: a count line then one row of joint-material
    parameters per set (observed layout
    ``UniaxialCompressionTest/MLSJMat.dat:1-2``: ``1`` then
    ``0 90e5 45e5 1800 25 2530 0 1`` — normal/shear stiffness pair in
    positions 2-3, friction angle in position 5; exact field semantics
    are undocumented in SysFile.ini, so the values are returned
    positionally). Driver-side like the other O(10) scalar configs."""
    tokens: list[str] = []
    with open(path) as fh:
        for line in fh:
            tokens.extend(line.split())
    if not tokens:
        raise ValueError(f"{path}: empty joint material file")
    n = int(float(tokens[0]))
    vals = tuple(float(v) for v in tokens[1:])
    per_set = len(vals) // n if n else 0
    return {
        "n_sets": n,
        "params": tuple(
            vals[i * per_set : (i + 1) * per_set] for i in range(n)
        ),
    }


def read_centrifuge(spark: SparkSession, path: str) -> tuple[float, float]:
    """``Centrifuge.dat`` (shipped in every case folder, e.g.
    ``UniaxialCompressionTest/Centrifuge.dat:1-2`` = ``20`` / ``60``):
    centrifuge loading — target g-level multiple and spin-up ramp
    time. Feed ``solver.run_solver_blocked(gravity_curve=
    ((0, 1), (ramp, target)))`` to ramp gravity from 1 g to target·g
    over the spin-up window (endpoint-clamped thereafter)."""
    vals = read_config_scalars(spark, path, ["target_g", "ramp_time"])
    return vals["target_g"], vals["ramp_time"]
