"""Window / neighbor / ordering operators (SURVEY §2.5 W1-W5).

The reference's neighbor semantics: facet wraparound pairing
(``GenerateColumnar.py:318-325``), every-4-rows face grouping
(``BooleanOperation.py:72-73``), time-series deltas on the probe series
(``Output/MLSOut00E.dat``). All window orderings here carry a unique
tie-break key so row content is deterministic across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from columnarmodeling_spark.operators.indexing import with_global_index
from columnarmodeling_spark.queries import register
from columnarmodeling_spark.queries._util import t


@register(
    "q22_window_rank_lag",
    oracle="""
    SELECT o_custkey, o_orderkey,
           row_number() OVER w AS rn,
           rank() OVER (PARTITION BY o_custkey
                        ORDER BY o_totalprice DESC, o_orderkey) AS price_rank,
           round(o_totalprice - lag(o_totalprice) OVER w, 2) AS delta_price
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
    doc="rank/lag/delta windows (SURVEY §2.5 W3: strain-rate and force "
    "deltas between output steps of MLSOut00E.dat; W5 ranking).",
    tags=("window", "W3", "W5"),
)
def q22_window_rank_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    wp = W.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.row_number().over(w).alias("rn"),
        F.rank().over(wp).alias("price_rank"),
        F.round(
            F.col("o_totalprice") - F.lag("o_totalprice").over(w), 2
        ).alias("delta_price"),
    )


@register(
    "q23_wraparound_neighbor",
    oracle="""
    SELECT o_custkey, o_orderkey,
           coalesce(lead(o_orderkey) OVER w,
                    first_value(o_orderkey) OVER w) AS next_key
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
    doc="Consecutive-vertex pairing with wraparound (SURVEY §2.3 J8 / "
    "§2.5 W1: side-quad construction pairs vertex j with (j+1) mod n, "
    "GenerateColumnar.py:318-325). lead() + coalesce(first_value()).",
    tags=("window", "W1", "J8"),
)
def q23_wraparound_neighbor(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    wfull = w.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.coalesce(
            F.lead("o_orderkey").over(w),
            F.first("o_orderkey").over(wfull),
        ).alias("next_key"),
    )


@register(
    "q24_running_total",
    oracle="""
    SELECT o_custkey, o_orderkey,
           round(sum(o_totalprice) OVER (PARTITION BY o_custkey
                                         ORDER BY o_orderdate, o_orderkey
                                         ROWS BETWEEN UNBOUNDED PRECEDING
                                         AND CURRENT ROW), 2) AS running_spend
    FROM orders
    """,
    doc="Running (cumulative) aggregation — the damage-accumulation shape "
    "of MLSOut00B.dat (SURVEY §2.8: cumulative damage ratio per step).",
    tags=("window", "running"),
)
def q24_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders")
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.sum("o_totalprice").over(w), 2).alias("running_spend"),
    )


@register(
    "q25_row_grouping",
    oracle="""
    WITH idx AS (
        SELECT l_quantity,
               row_number() OVER (ORDER BY l_orderkey, l_linenumber) AS rn
        FROM lineitem)
    SELECT (rn - 1) // 4 AS face_id,
           count(*) AS n_points,
           round(sum(l_quantity), 2) AS qty
    FROM idx
    GROUP BY (rn - 1) // 4
    """,
    doc="Every-4-consecutive-rows grouping (SURVEY §2.5 W2: 4 text points "
    "→ one face, BooleanOperation.py:72-73). Uses the scale-safe global "
    "index (range-partition + per-partition row_number + prefix-sum "
    "offsets, operators/indexing.py) instead of a single-partition "
    "global window.",
    tags=("window", "W2", "scale"),
)
def q25_row_grouping(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_quantity"
    )
    idx = with_global_index(li, ["l_orderkey", "l_linenumber"], "rn")
    return (
        idx.withColumn("face_id", ((F.col("rn") - 1) / 4).cast("long"))
        .groupBy("face_id")
        .agg(
            F.count("*").alias("n_points"),
            F.round(F.sum("l_quantity"), 2).alias("qty"),
        )
    )


@register(
    "q26_sessionization",
    oracle="""
    WITH g AS (
        SELECT user_id, event_id, value, ts,
               CASE WHEN floor(epoch(ts)) - floor(epoch(lag(ts) OVER w)) > 1800
                         OR lag(ts) OVER w IS NULL
                    THEN 1 ELSE 0 END AS is_new
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    s AS (
        SELECT user_id, event_id, value,
               CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS BIGINT) AS session_id
        FROM g)
    SELECT user_id, session_id, count(*) AS n_events,
           round(sum(value), 2) AS session_value
    FROM s GROUP BY user_id, session_id
    """,
    doc="Sessionization via lag-gap + cumulative sum (SURVEY §2.8 "
    "extension; the reference's output cadence is a fixed 250-step "
    "session, MLS00con.dat:7).",
    tags=("window", "session"),
)
def q26_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    wcum = w.rowsBetween(W.unboundedPreceding, W.currentRow)
    gap = F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
    return (
        ev.withColumn(
            "is_new",
            F.when(gap.isNull() | (gap > 1800), 1).otherwise(0),
        )
        .withColumn("session_id", F.sum("is_new").over(wcum))
        .groupBy("user_id", "session_id")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("session_value"),
        )
    )


@register(
    "q65_ranking_family",
    oracle="""
    SELECT o_orderkey, o_custkey,
           ntile(4)       OVER w AS quartile,
           round(percent_rank() OVER w, 6) AS pct_rank,
           round(cume_dist()    OVER w, 6) AS cdist,
           first_value(o_orderkey) OVER w AS first_in_cust,
           nth_value(o_orderkey, 2) OVER w AS second_in_cust
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderkey)
    """,
    doc="Ranking-function family (SURVEY §2.5 W5 note: rank/dense_rank "
    "exposed for oracle tests — completed here with ntile, "
    "percent_rank, cume_dist, first/nth_value over the per-customer "
    "order sequence).",
    tags=("window", "W5", "ranking"),
)
def q65_ranking_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderkey")
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.ntile(4).over(w).alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cdist"),
        F.first("o_orderkey").over(w).alias("first_in_cust"),
        F.nth_value("o_orderkey", 2).over(w).alias("second_in_cust"),
    )


@register(
    "q99_rollup_cascade",
    oracle="""
    WITH base AS MATERIALIZED (
      SELECT event_type, date_trunc('minute', ts) AS m_ts,
             CAST(round(value * 1000000.0) AS BIGINT) AS vq
      FROM events),
    g AS (
      SELECT 'minute' AS grain, event_type, m_ts AS bucket_ts,
             count(*) AS n_events, sum(vq) AS sq, min(vq) AS mn, max(vq) AS mx
      FROM base GROUP BY event_type, m_ts
      UNION ALL
      SELECT 'hour', event_type, date_trunc('hour', m_ts),
             count(*), sum(vq), min(vq), max(vq)
      FROM base GROUP BY event_type, date_trunc('hour', m_ts)
      UNION ALL
      SELECT 'day', event_type, date_trunc('day', m_ts),
             count(*), sum(vq), min(vq), max(vq)
      FROM base GROUP BY event_type, date_trunc('day', m_ts))
    SELECT grain, event_type, bucket_ts,
           CAST(n_events AS BIGINT) AS n_events,
           round(CAST(sq AS DOUBLE) / 1000000.0, 6) AS sum_v,
           round(CAST(mn AS DOUBLE) / 1000000.0, 6) AS min_v,
           round(CAST(mx AS DOUBLE) / 1000000.0, 6) AS max_v
    FROM g
    """,
    doc="Hypertable-style rollup cascade (continuous-aggregate pattern): "
    "minute-grain partials per event_type are computed ONCE from the "
    "raw events, then the hour grain re-aggregates the minute PARTIALS "
    "and the day grain the hour partials — never re-reading raw data. "
    "Decomposable aggregates only (count->sum, sum->sum, min->min, "
    "max->max); values are quantized to exact integers (round(v*1e6)) "
    "before summing so re-aggregation order cannot perturb floats — the "
    "cascade is bit-identical to direct aggregation, which is exactly "
    "what the oracle computes (each grain straight from raw). At 100 TB "
    "each grain is ~60x smaller than the one below it, so the cascade "
    "reads raw data once instead of three times and the coarse grains "
    "aggregate tiny inputs — the same reason streaming rollups persist "
    "partials per window.",
    tags=("window", "rollup", "timeseries", "scale"),
)
def q99_rollup_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events").select(
        "event_type",
        F.date_trunc("minute", "ts").alias("m_ts"),
        F.round(F.col("value") * 1000000.0, 0).cast("long").alias("vq"),
    )
    minute = (
        ev.groupBy("event_type", "m_ts")
        .agg(
            F.count("*").alias("n_events"),
            F.sum("vq").alias("sq"),
            F.min("vq").alias("mn"),
            F.max("vq").alias("mx"),
        )
        .cache()
    )
    hour = (
        minute.groupBy("event_type", F.date_trunc("hour", "m_ts").alias("h_ts"))
        .agg(
            F.sum("n_events").alias("n_events"),
            F.sum("sq").alias("sq"),
            F.min("mn").alias("mn"),
            F.max("mx").alias("mx"),
        )
        .cache()
    )
    day = hour.groupBy("event_type", F.date_trunc("day", "h_ts").alias("d_ts")).agg(
        F.sum("n_events").alias("n_events"),
        F.sum("sq").alias("sq"),
        F.min("mn").alias("mn"),
        F.max("mx").alias("mx"),
    )

    def fin(df, grain: str, ts_col: str):
        return df.select(
            F.lit(grain).alias("grain"),
            "event_type",
            F.col(ts_col).alias("bucket_ts"),
            F.col("n_events").cast("long").alias("n_events"),
            F.round(F.col("sq").cast("double") / 1000000.0, 6).alias("sum_v"),
            F.round(F.col("mn").cast("double") / 1000000.0, 6).alias("min_v"),
            F.round(F.col("mx").cast("double") / 1000000.0, 6).alias("max_v"),
        )

    return (
        fin(minute, "minute", "m_ts")
        .unionByName(fin(hour, "hour", "h_ts"))
        .unionByName(fin(day, "day", "d_ts"))
    )


@register(
    "q103_range_frame",
    oracle="""
    WITH base AS (
      SELECT user_id, event_id,
             CAST(floor(epoch(ts)) AS BIGINT) AS sec,
             CAST(round(value * 1000000.0) AS BIGINT) AS vq
      FROM events),
    f AS (
      SELECT user_id, event_id, sec,
             CAST(sum(vq) OVER w AS BIGINT) AS sq,
             count(*) OVER w AS n_win
      FROM base
      WINDOW w AS (PARTITION BY user_id ORDER BY sec
                   RANGE BETWEEN 600 PRECEDING AND CURRENT ROW))
    SELECT user_id, event_id,
           CAST(n_win AS BIGINT) AS n_win,
           round((CAST(sq AS DOUBLE) / n_win) / 1000000.0, 6) AS avg_10m
    FROM f
    """,
    doc="RANGE-frame moving aggregate: per user, the trailing-10-minute "
    "average event value — the frame is bounded by the ORDER-BY VALUE "
    "(epoch seconds), not a row count, so ties and gaps are handled by "
    "time distance (every row whose timestamp is within 600 s "
    "precedes). Values are quantized to exact integer micro-units "
    "before the frame sum, making the moving aggregate immune to "
    "frame-internal summation order (frames overlap, so engines are "
    "otherwise free to re-associate differently). The window "
    "partitions by user_id — per-key state, no global sort.",
    tags=("window", "range_frame", "timeseries"),
)
def q103_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    base = t(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        F.floor(F.unix_timestamp("ts")).cast("long").alias("sec"),
        F.round(F.col("value") * 1000000.0, 0).cast("long").alias("vq"),
    )
    w = (
        W.partitionBy("user_id")
        .orderBy("sec")
        .rangeBetween(-600, W.currentRow)
    )
    f = base.select(
        "user_id",
        "event_id",
        F.sum("vq").over(w).alias("sq"),
        F.count("*").over(w).alias("n_win"),
    )
    return f.select(
        "user_id",
        "event_id",
        F.col("n_win").cast("long").alias("n_win"),
        F.round(
            (F.col("sq").cast("double") / F.col("n_win")) / 1000000.0, 6
        ).alias("avg_10m"),
    )
