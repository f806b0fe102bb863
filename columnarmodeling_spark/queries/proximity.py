"""Flagship join queries: binned proximity (gap) join, bond typing,
as-of join (SURVEY §2.3 J1, §2.4 A9).

The proximity join regenerates the reference's bond-list construction
(``MLSBond.dat``: pairs with gap < dGap found via CellSize grid hashing,
``SysFile.ini:45-55``) on testdata points; the oracle is the naive theta
self-join, which DuckDB can afford at sf0.01 — the Spark side must
produce the *identical* pair set from the binned plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from columnarmodeling_spark.operators.asof import asof_join
from columnarmodeling_spark.operators.proximity import grid_proximity_join
from columnarmodeling_spark.queries import register
from columnarmodeling_spark.queries._util import t

# Point cloud derived deterministically from customer: x spreads over
# acctbal (range ~11k), y over a 97-residue lattice scaled by 25.
_POINTS_SQL = """
    SELECT c_custkey AS id, c_acctbal AS x,
           CAST(c_custkey % 97 AS DOUBLE) * 25.0 AS y,
           c_nationkey AS grain
    FROM customer
"""

_EPS = 30.0


def _points(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = t(spark, sf_dir, "customer")
    return c.select(
        F.col("c_custkey").alias("id"),
        F.col("c_acctbal").alias("x"),
        ((F.col("c_custkey") % 97).cast("double") * 25.0).alias("y"),
        F.col("c_nationkey").alias("grain"),
    )


@register(
    "q30_proximity_pairs",
    oracle=f"""
    WITH pts AS ({_POINTS_SQL})
    SELECT a.id AS src, b.id AS dst,
           round(sqrt((a.x-b.x)*(a.x-b.x) + (a.y-b.y)*(a.y-b.y)), 6) AS dist
    FROM pts a JOIN pts b
      ON a.id < b.id
     AND sqrt((a.x-b.x)*(a.x-b.x) + (a.y-b.y)*(a.y-b.y)) < {_EPS}
    """,
    doc="Binned proximity join (SURVEY §2.3 J1: dGap bond linking via "
    "CellSize grid hashing, SysFile.ini:45-55 → MLSBond.dat). Spark "
    "side uses the grid-explode equi-join; oracle is the naive theta "
    "join — identical pair sets required.",
    tags=("join", "proximity", "J1", "flagship"),
)
def q30_proximity_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    pairs = grid_proximity_join(_points(spark, sf_dir), eps=_EPS, id_col="id")
    return pairs.select("src", "dst", F.round("dist", 6).alias("dist"))


@register(
    "q31_bond_type_histogram",
    oracle=f"""
    WITH pts AS ({_POINTS_SQL})
    SELECT CASE WHEN a.grain = b.grain THEN 1 ELSE 10 END AS bond_type,
           count(*) AS n_bonds,
           round(avg(sqrt((a.x-b.x)*(a.x-b.x) + (a.y-b.y)*(a.y-b.y))), 6)
               AS avg_len
    FROM pts a JOIN pts b
      ON a.id < b.id
     AND sqrt((a.x-b.x)*(a.x-b.x) + (a.y-b.y)*(a.y-b.y)) < {_EPS}
    GROUP BY 1
    """,
    doc="Bond typing + histogram (SURVEY §2.4 A9: MLSBond.dat type 1 = "
    "intra-grain vs type 10 = joint bonds, verified 3142/10670 split). "
    "Type 1 when both endpoints share a grain id.",
    tags=("join", "proximity", "agg", "A9", "J1"),
)
def q31_bond_type_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    pairs = grid_proximity_join(
        _points(spark, sf_dir), eps=_EPS, id_col="id", keep_cols=("grain",)
    )
    return (
        pairs.withColumn(
            "bond_type",
            F.when(F.col("grain_src") == F.col("grain_dst"), 1).otherwise(10),
        )
        .groupBy("bond_type")
        .agg(
            F.count("*").alias("n_bonds"),
            F.round(F.avg("dist"), 6).alias("avg_len"),
        )
    )


@register(
    "q32_asof_join",
    oracle="""
    WITH last AS (
        SELECT e.event_id AS eid, max(o.o_orderdate) AS asof_ts
        FROM events e JOIN orders o
          ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts
        GROUP BY e.event_id)
    SELECT e.event_id, l.asof_ts, max(o.o_orderkey) AS o_orderkey
    FROM events e
    JOIN last l ON e.event_id = l.eid
    JOIN orders o ON o.o_custkey = e.user_id AND o.o_orderdate = l.asof_ts
    GROUP BY e.event_id, l.asof_ts
    """,
    doc="As-of join (SURVEY §2.8: load-curve evaluation — most recent "
    "curve point at-or-before each solver step, SysFile.ini:94): for "
    "each event, the latest order at-or-before its timestamp. "
    "Implemented as union-tag + single window pass per key "
    "(operators/asof.py), no theta join.",
    tags=("join", "asof", "window", "scale"),
)
def q32_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    orders = t(spark, sf_dir, "orders").withColumn("user_id", F.col("o_custkey"))
    return asof_join(
        left=orders,
        right=ev,
        key="user_id",
        left_ts="o_orderdate",
        right_ts="ts",
        left_val_cols=("o_orderkey",),
        right_id_cols=("event_id",),
        tie_break="o_orderkey",
    ).select("event_id", "asof_ts", "o_orderkey")
