"""Columnar extrusion + facet generation (SURVEY §2.3 J8 / §2.5 W1 /
§2.2 P7: ``GenerateColumnar.py:211-232`` extrusion with stochastic
taper, ``:318-325`` side-quad construction with wraparound vertex
pairing, ``:189-218`` shrink-toward-centroid).

All pure column expressions: posexplode the ring, lead() with
coalesce(first()) for the (j, (j+1) mod n) pairing, arithmetic for the
z-extrusion and the affine shrink. One shuffle (the window by grain).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F


def shrink_toward_centroid(cells: DataFrame, scale_col) -> DataFrame:
    """P7 affine: v' = c + s·(v − c) per grain (GenerateColumnar.py:189-218).

    ``cells`` must have grain_id, cx, cy, xs, ys; scale_col is a Column
    (clamped by the caller per P6 semantics).
    """
    s = scale_col
    return cells.withColumn(
        "xs", F.transform("xs", lambda x: F.col("cx") + s * (x - F.col("cx")))
    ).withColumn(
        "ys", F.transform("ys", lambda y: F.col("cy") + s * (y - F.col("cy")))
    )


def side_facets(cells: DataFrame, z_top_col) -> DataFrame:
    """Side quads of the extruded prism: one facet per ring edge,
    wraparound included — facet k spans vertices k and (k+1) mod n at
    z=0 and z=z_top (J8/W1)."""
    ring = cells.select(
        "grain_id",
        z_top_col.alias("z_top"),
        F.posexplode(F.arrays_zip("xs", "ys")).alias("pos", "v"),
    ).select(
        "grain_id",
        "z_top",
        "pos",
        F.col("v.xs").alias("vx"),
        F.col("v.ys").alias("vy"),
    )
    w = W.partitionBy("grain_id").orderBy("pos")
    wfull = w.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    nxt_x = F.coalesce(F.lead("vx").over(w), F.first("vx").over(wfull))
    nxt_y = F.coalesce(F.lead("vy").over(w), F.first("vy").over(wfull))
    return ring.select(
        "grain_id",
        F.col("pos").alias("facet_pos"),
        F.struct(F.col("vx").alias("x"), F.col("vy").alias("y"), F.lit(0.0).alias("z")).alias("p1"),
        F.struct(nxt_x.alias("x"), nxt_y.alias("y"), F.lit(0.0).alias("z")).alias("p2"),
        F.struct(nxt_x.alias("x"), nxt_y.alias("y"), F.col("z_top").alias("z")).alias("p3"),
        F.struct(F.col("vx").alias("x"), F.col("vy").alias("y"), F.col("z_top").alias("z")).alias("p4"),
    )
