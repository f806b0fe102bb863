"""Event/catalog analytics operators: ordered funnel conversion and the
Pareto-frontier (skyline) query.

Both are classic warehouse asks a 100 TB analytics engine must answer
without a single-partition bottleneck: the funnel is a chain of
user-keyed aggregations (state never leaves the user's shuffle
partition), and the skyline rides the two-pass global prefix-max from
``operators/indexing`` (range partition → per-partition maxes → driver
prefix over #partitions values → broadcast), never a global window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from columnarmodeling_spark.operators.indexing import with_global_running_max
from columnarmodeling_spark.queries import register
from columnarmodeling_spark.queries._util import t


@register(
    "q135_funnel",
    oracle="""
    WITH v AS MATERIALIZED (
      SELECT user_id, min(epoch_us(ts)) AS t1
      FROM events WHERE event_type = 'view' GROUP BY 1),
    c AS MATERIALIZED (
      SELECT e.user_id, min(v.t1) AS t1, min(epoch_us(e.ts)) AS t2
      FROM events e JOIN v ON v.user_id = e.user_id
      WHERE e.event_type = 'click' AND epoch_us(e.ts) > v.t1
      GROUP BY 1),
    p AS MATERIALIZED (
      SELECT e.user_id, min(c.t1) AS t1, min(epoch_us(e.ts)) AS t3
      FROM events e JOIN c ON c.user_id = e.user_id
      WHERE e.event_type = 'purchase' AND epoch_us(e.ts) > c.t2
      GROUP BY 1)
    SELECT 'view' AS stage, CAST(count(*) AS BIGINT) AS users,
           CAST(0 AS BIGINT) AS total_lag_micros FROM v
    UNION ALL
    SELECT 'click', count(*), CAST(coalesce(sum(t2 - t1), 0) AS BIGINT)
    FROM c
    UNION ALL
    SELECT 'purchase', count(*), CAST(coalesce(sum(t3 - t1), 0) AS BIGINT)
    FROM p
    """,
    doc="Ordered funnel conversion (view → click → purchase) over the "
    "events stream — the product-analytics staple: per user, the "
    "FIRST view, the first click strictly after it, the first "
    "purchase strictly after that; per stage, how many users got "
    "there and the summed view-to-stage latency. Spark side is a "
    "chain of three user-keyed min-aggregations with an equi-join "
    "between stages — every shuffle keys on user_id, so at 100 TB "
    "the chain re-uses one hash partitioning and no per-user event "
    "ordering (sort/window) ever materializes; timestamps are "
    "compared in integer epoch-micros, so both engines replay the "
    "strictly-after semantics exactly.",
    tags=("events", "funnel", "analytics", "agg", "scale"),
)
def q135_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = t(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        # ts is TIMESTAMP_NTZ; the session TZ is pinned to UTC, so the
        # cast makes unix_micros agree with DuckDB's epoch_us exactly
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
    )
    v = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("us").alias("t1"))
    )
    c = (
        e.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("us") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("t1").alias("t1"), F.min("us").alias("t2"))
    )
    p = (
        e.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("us") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("t1").alias("t1"), F.min("us").alias("t3"))
    )

    def stage(df: DataFrame, name: str, lag) -> DataFrame:
        return df.agg(
            F.count("*").cast("long").alias("users"),
            F.coalesce(F.sum(lag), F.lit(0)).cast("long").alias(
                "total_lag_micros"
            ),
        ).select(F.lit(name).alias("stage"), "users", "total_lag_micros")

    return (
        stage(v, "view", F.lit(0))
        .unionByName(stage(c, "click", F.col("t2") - F.col("t1")))
        .unionByName(stage(p, "purchase", F.col("t3") - F.col("t1")))
    )


@register(
    "q136_skyline",
    oracle="""
    SELECT x.p_partkey, x.p_retailprice, CAST(x.p_size AS BIGINT) AS p_size
    FROM part x
    WHERE NOT EXISTS (
      SELECT 1 FROM part y
      WHERE y.p_retailprice <= x.p_retailprice AND y.p_size >= x.p_size
        AND (y.p_retailprice < x.p_retailprice OR y.p_size > x.p_size))
    """,
    doc="Skyline / Pareto frontier (minimize price, maximize size): a "
    "part is dominated when another is no worse in both dimensions "
    "and strictly better in one; ties on both keep both. The 2-D "
    "skyline reduces to a GLOBAL strict-prefix max: keep a price "
    "level iff its best size beats the best size of every strictly "
    "cheaper level. Spark side: one hash agg to per-price max-size "
    "levels, then operators/indexing.with_global_running_max (range "
    "partition on price → per-partition maxes → driver prefix over "
    "#partitions values → broadcast + in-partition window) — the "
    "same two-pass pattern as q130's prefix sum, so no "
    "single-partition window exists at any scale — and a semi-join "
    "back to re-attach every tied survivor row. The oracle is the "
    "naive NOT EXISTS dominance scan DuckDB can afford at sf0.01.",
    tags=("analytics", "skyline", "window", "prefix-max", "scale"),
)
def q136_skyline(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = t(spark, sf_dir, "part").select(
        "p_partkey", "p_retailprice", F.col("p_size").cast("long")
    )
    levels = part.groupBy("p_retailprice").agg(
        F.max("p_size").alias("smax")
    )
    pref = with_global_running_max(
        levels, ["p_retailprice"], "smax", out_col="best_lt"
    )
    sky_levels = pref.filter(
        F.col("best_lt").isNull() | (F.col("smax") > F.col("best_lt"))
    ).select("p_retailprice", F.col("smax").alias("p_size"))
    # the surviving level set IS the skyline (tiny by construction —
    # one row per undominated price level): broadcast it rather than
    # letting unknown checkpoint stats force a sort-merge join
    return part.join(
        F.broadcast(sky_levels), ["p_retailprice", "p_size"], "left_semi"
    ).select("p_partkey", "p_retailprice", "p_size")
