"""Piecewise-linear load-curve evaluation (the reference's ``Load_Data``
boundary-condition curves).

Every BC block in the reference's ``MLSLD00.dat`` carries a load-curve
field (``Load_Data`` — "Apply_the_loading_curve", documented for each of
the Displacement/Velocity/Force/Acceleration BC kinds at
``SysFile.ini:94,117,140,163``), and the shipped uniaxial case drives its
top platen with a ramp (the ``-20``-valued velocity rows of
``UniaxialCompressionTest/MLSLD00.dat``; the E-series platen displacement
is ``uz = -20·t``). The curve is a small table of ``(t, value)`` points;
the solver needs its piecewise-linear interpolation at every step time.

Scalable plan: NO range join. Tag curve points (kind 0) and probe times
(kind 1), union them, and resolve the bracketing segment with ONE
window sort per curve: ``last(ignorenulls)`` looking backward gives the
segment start, ``first(ignorenulls)`` looking forward gives the segment
end — both windows share the same partitioning + sort, so Catalyst
plans a single shuffle + sort. Probe times outside the curve domain
clamp to the nearest endpoint (constant extrapolation), matching the
solver convention that a curve holds its last value.

This is the distributed/batch form; the in-kernel form (``np.interp``
inside the block solver, ``simulation/solver.py``) uses the same
clamping semantics so batch replays match the simulation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F


def interpolate_curves(
    curves: DataFrame,
    probes: DataFrame,
    key: str = "curve_id",
    t_col: str = "t",
    v_col: str = "v",
    out_col: str = "value",
    ndigits: int | None = 6,
) -> DataFrame:
    """Evaluate each curve at each probe time.

    *curves*: ``(key, t, v)`` — the control points, one row per point,
    (key, t) unique. *probes*: ``(key, t)`` — the query times, (key, t)
    unique. Returns ``(key, t, out_col)`` with one row per probe row;
    probes whose key has no curve points are dropped (inner semantics).

    A probe exactly on a control point returns that point's value (the
    union sorts curve rows before probe rows at equal ``t``, so the
    backward pass picks the point up as the segment start and the
    interpolation factor is 0).
    """
    cu = curves.select(
        F.col(key).alias("__k"),
        F.col(t_col).cast("double").alias("__t"),
        F.lit(0).alias("__kind"),
        F.col(t_col).cast("double").alias("__ct"),
        F.col(v_col).cast("double").alias("__cv"),
    )
    pr = probes.select(
        F.col(key).alias("__k"),
        F.col(t_col).cast("double").alias("__t"),
        F.lit(1).alias("__kind"),
        F.lit(None).cast("double").alias("__ct"),
        F.lit(None).cast("double").alias("__cv"),
    )
    back = (
        W.partitionBy("__k")
        .orderBy("__t", "__kind")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    fwd = (
        W.partitionBy("__k")
        .orderBy("__t", "__kind")
        .rowsBetween(W.currentRow, W.unboundedFollowing)
    )
    t0 = F.last("__ct", ignorenulls=True).over(back)
    v0 = F.last("__cv", ignorenulls=True).over(back)
    t1 = F.first("__ct", ignorenulls=True).over(fwd)
    v1 = F.first("__cv", ignorenulls=True).over(fwd)
    val = (
        F.when(t0.isNull(), v1)  # before first point: clamp forward
        .when(t1.isNull(), v0)  # after last point: clamp backward
        .when(t1 == t0, v0)  # exactly on a control point
        .otherwise(v0 + (v1 - v0) * (F.col("__t") - t0) / (t1 - t0))
    )
    if ndigits is not None:
        val = F.round(val, ndigits)
    return (
        cu.unionByName(pr)
        .withColumn("__val", val)
        .filter((F.col("__kind") == 1) & F.col("__val").isNotNull())
        .select(
            F.col("__k").alias(key),
            F.col("__t").alias(t_col),
            F.col("__val").alias(out_col),
        )
    )
