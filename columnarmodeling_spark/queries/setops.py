"""Set operations (SURVEY §2.6 U1-U4).

The reference's set algebra: mirror unions (GenerateColumnar.py:80-86),
eligible-minus-excluded difference (:285-289), node-set disjointness
(:261,297). U1's mirror union lives in relational.q19; here are the
difference / intersection / disjointness forms.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from columnarmodeling_spark.queries import register
from columnarmodeling_spark.queries._util import t


@register(
    "q27_set_algebra",
    oracle="""
    (SELECT s_suppkey FROM supplier WHERE s_acctbal > 5000
     INTERSECT
     SELECT s_suppkey FROM supplier WHERE s_nationkey < 13)
    UNION
    (SELECT s_suppkey FROM supplier WHERE s_acctbal > 5000
     EXCEPT
     SELECT s_suppkey FROM supplier WHERE s_acctbal > 8000)
    """,
    doc="INTERSECT / EXCEPT / UNION distinct composition (SURVEY §2.6 "
    "U2: eligible ∖ excluded, GenerateColumnar.py:285-289).",
    tags=("setop", "U2"),
)
def q27_set_algebra(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = t(spark, sf_dir, "supplier")
    high = s.filter(F.col("s_acctbal") > 5000).select("s_suppkey")
    west = s.filter(F.col("s_nationkey") < 13).select("s_suppkey")
    vhigh = s.filter(F.col("s_acctbal") > 8000).select("s_suppkey")
    return high.intersect(west).union(high.subtract(vhigh)).distinct()


@register(
    "q28_disjointness",
    oracle="""
    WITH sets AS (SELECT DISTINCT o_orderpriority AS pri, o_custkey AS ck
                  FROM orders)
    SELECT a.pri AS pri_a, b.pri AS pri_b,
           (count(CASE WHEN a.ck = b.ck THEN 1 END) = 0) AS disjoint,
           count(CASE WHEN a.ck = b.ck THEN 1 END) AS n_shared
    FROM sets a JOIN sets b ON a.pri < b.pri AND a.ck = b.ck
    GROUP BY a.pri, b.pri
    """,
    doc="Node-set disjointness test (SURVEY §2.6 U3: "
    "set(...).isdisjoint(...), GenerateColumnar.py:261,297) as "
    "size(array_intersect(a,b)) == 0 over collected key sets.",
    tags=("setop", "U3", "array"),
)
def q28_disjointness(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders")
    sets = (
        o.select(F.col("o_orderpriority").alias("pri"), F.col("o_custkey").alias("ck"))
        .distinct()
        .groupBy("pri")
        .agg(F.collect_set("ck").alias("cks"))
    )
    a = sets.select(F.col("pri").alias("pri_a"), F.col("cks").alias("cks_a"))
    b = sets.select(F.col("pri").alias("pri_b"), F.col("cks").alias("cks_b"))
    inter = F.size(F.array_intersect("cks_a", "cks_b"))
    return (
        a.join(F.broadcast(b), F.col("pri_a") < F.col("pri_b"))
        .select(
            "pri_a",
            "pri_b",
            (inter == 0).alias("disjoint"),
            inter.cast("long").alias("n_shared"),
        )
        # disjoint pairs share no keys; oracle's inner join can only see
        # overlapping pairs, so restrict to those for parity
        .filter(F.col("n_shared") > 0)
    )


@register(
    "q337_disjointness_keyjoin",
    oracle="""
    WITH sets AS (SELECT DISTINCT o_orderpriority AS pri, o_custkey AS ck
                  FROM orders)
    SELECT a.pri AS pri_a, b.pri AS pri_b,
           (count(CASE WHEN a.ck = b.ck THEN 1 END) = 0) AS disjoint,
           count(CASE WHEN a.ck = b.ck THEN 1 END) AS n_shared
    FROM sets a JOIN sets b ON a.pri < b.pri AND a.ck = b.ck
    GROUP BY a.pri, b.pri
    """,
    doc="Node-set disjointness, KEY-LEVEL EQUI-JOIN form — the 100 TB "
    "escape for q28's collect_set payload (PLANCENSUS's one standing "
    "honest caveat since r12: q28 materializes each group's full key "
    "set in a single aggregation buffer, data-proportional per "
    "group). Same semantics and same oracle as q28 — overlapping "
    "group pairs with shared-key counts — but |A ∩ B| is computed by "
    "self-joining the distinct (group, key) relation ON THE KEY and "
    "counting per pair (the q42 shingle-intersection skeleton): "
    "every operator is a hash agg or equi-join on well-spread keys, "
    "per-row state is constant, and a hot key's fan-out is bounded "
    "by the number of GROUPS it appears in (<= |priorities|), never "
    "by corpus size. q28 stays registered as the reference-faithful "
    "U3 array form (SURVEY §2.6, set(...).isdisjoint(...)); this is "
    "the form a 100 TB deployment runs.",
    tags=("setop", "U3", "join", "scale"),
)
def q337_disjointness_keyjoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders")
    sets = o.select(
        F.col("o_orderpriority").alias("pri"), F.col("o_custkey").alias("ck")
    ).distinct()
    a = sets.select(F.col("pri").alias("pri_a"), "ck")
    b = sets.select(F.col("pri").alias("pri_b"), "ck")
    return (
        a.join(b, "ck")
        .filter(F.col("pri_a") < F.col("pri_b"))
        .groupBy("pri_a", "pri_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .select(
            "pri_a",
            "pri_b",
            (F.col("n_shared") == 0).alias("disjoint"),
            F.col("n_shared").cast("long").alias("n_shared"),
        )
    )


@register(
    "q29_intersect_projection",
    oracle="""
    SELECT c_nationkey AS nk FROM customer WHERE c_acctbal > 7000
    INTERSECT
    SELECT s_nationkey AS nk FROM supplier WHERE s_acctbal > 7000
    """,
    doc="INTERSECT of two filtered projections (SURVEY §2.6 U4: vertex-set "
    "∩ domain box, GenerateColumnar.py:104,135 — relational form).",
    tags=("setop", "U4"),
)
def q29_intersect_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = t(spark, sf_dir, "customer")
    s = t(spark, sf_dir, "supplier")
    return c.filter(F.col("c_acctbal") > 7000).select(
        F.col("c_nationkey").alias("nk")
    ).intersect(
        s.filter(F.col("s_acctbal") > 7000).select(F.col("s_nationkey").alias("nk"))
    )
