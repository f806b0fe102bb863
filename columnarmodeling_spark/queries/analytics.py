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

from columnarmodeling_spark.functions.text import tokens
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


_QUANTS = (0.25, 0.5, 0.75, 0.9)


@register(
    "q147_global_quantiles",
    oracle=f"""
    WITH v AS (
      SELECT l_extendedprice AS x,
             row_number() OVER (ORDER BY l_extendedprice, l_orderkey,
                                l_linenumber) AS rn,
             count(*) OVER () AS n
      FROM lineitem),
    qs AS (SELECT CAST(unnest(ARRAY{list(_QUANTS)}) AS DOUBLE) AS q)
    SELECT qs.q, v.x AS value
    FROM qs JOIN v
      ON v.rn = CAST(floor(qs.q * (v.n - 1)) AS BIGINT) + 1
    """,
    doc="EXACT global order statistics without a global sort — the "
    "scale-path complement of q37's per-group percentile() (which "
    "buffers each group's values): the k-th value of 100 TB of rows "
    "via operators/indexing.with_global_index — range partition on "
    "the (unique) sort key, per-partition row_number + driver prefix "
    "over #partitions counts — then a broadcast join of the 4 target "
    "ranks (floor(q·(n-1))+1, lower discrete quantile) against the "
    "dense rank column. No single-partition window, no sort of the "
    "full relation beyond the range exchange. Ordering is made "
    "unique by the (price, orderkey, linenumber) tiebreak, so the "
    "selected rows are deterministic on both engines.",
    tags=("analytics", "percentile", "order-statistics", "scale"),
)
def q147_global_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from columnarmodeling_spark.operators.indexing import with_global_index

    li = t(spark, sf_dir, "lineitem").select(
        F.col("l_extendedprice").alias("x"), "l_orderkey", "l_linenumber"
    )
    idx = with_global_index(li, ["x", "l_orderkey", "l_linenumber"])
    n = li.agg(F.count("*").alias("n"))
    qs = spark.createDataFrame([(q,) for q in _QUANTS], "q DOUBLE")
    ranks = qs.crossJoin(F.broadcast(n)).select(
        "q",
        (
            F.floor(F.col("q") * (F.col("n") - 1)).cast("long") + 1
        ).alias("rn"),
    )
    return idx.join(F.broadcast(ranks), "rn").select(
        "q", F.col("x").alias("value")
    )


@register(
    "q148_scd2_history",
    oracle="""
    WITH e AS (
      SELECT user_id, event_type, event_id,
             epoch_us(ts) AS us
      FROM events),
    chg AS (
      SELECT user_id, event_type, us,
             CASE WHEN lag(event_type) OVER w IS DISTINCT FROM event_type
                  THEN 1 ELSE 0 END AS is_chg
      FROM e
      WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
    runs AS (
      SELECT user_id, event_type, us,
             sum(is_chg) OVER (PARTITION BY user_id ORDER BY us
                               ROWS UNBOUNDED PRECEDING) AS run_id
      FROM chg),
    grp AS (
      -- event_type is CONSTANT within a run (runs are maximal
      -- same-type stretches), so it rides the GROUP BY: string KEYS
      -- hash-aggregate fine, string min() BUFFERS demote Spark to
      -- SortAggregate (the r13 plan census caught this)
      SELECT user_id, run_id, event_type,
             min(us) AS valid_from_us, count(*) AS n_events
      FROM runs GROUP BY 1, 2, 3)
    SELECT user_id, event_type,
           CAST(valid_from_us AS BIGINT) AS valid_from_us,
           CAST(coalesce(lead(valid_from_us)
                  OVER (PARTITION BY user_id ORDER BY run_id), -1)
                AS BIGINT) AS valid_to_us,
           CAST(n_events AS BIGINT) AS n_events
    FROM grp
    """,
    doc="SCD type-2 history build (slowly-changing-dimension "
    "versioning — the warehouse pattern for 'what was this entity's "
    "state at time t'): per user, consecutive runs of the same "
    "event_type collapse into validity intervals "
    "[valid_from, valid_to) via gaps-and-islands (change flag -> "
    "running sum -> run group), with the current row open-ended "
    "(valid_to = -1). ALL windows partition by user_id — one hash "
    "partitioning serves the change detection, the run numbering and "
    "the interval chaining, so nothing ever funnels through a single "
    "partition; timestamps are integer epoch-micros with an event_id "
    "tiebreak, so both engines build identical histories.",
    tags=("analytics", "scd2", "window", "gaps-islands", "scale"),
)
def q148_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    e = t(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        "event_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
    )
    w = W.partitionBy("user_id").orderBy("us", "event_id")
    chg = e.withColumn(
        "is_chg",
        F.when(
            ~F.lag("event_type").over(w).eqNullSafe(F.col("event_type")),
            1,
        ).otherwise(0),
    )
    runs = chg.withColumn(
        "run_id",
        F.sum("is_chg").over(
            W.partitionBy("user_id")
            .orderBy("us", "event_id")
            .rowsBetween(W.unboundedPreceding, W.currentRow)
        ),
    )
    # event_type is constant within a run: grouping by it keeps the
    # aggregate a HashAggregate (string KEYS hash fine; a string min()
    # BUFFER is not hash-mutable and demotes to SortAggregate — the
    # r13 plan census caught exactly that here)
    grp = runs.groupBy("user_id", "run_id", "event_type").agg(
        F.min("us").alias("valid_from_us"),
        F.count("*").alias("n_events"),
    )
    wr = W.partitionBy("user_id").orderBy("run_id")
    return grp.select(
        "user_id",
        "event_type",
        F.col("valid_from_us").cast("long").alias("valid_from_us"),
        F.coalesce(F.lead("valid_from_us").over(wr), F.lit(-1))
        .cast("long")
        .alias("valid_to_us"),
        F.col("n_events").cast("long").alias("n_events"),
    )


def _morton_spread(v: str) -> list[tuple[str, str]]:
    """Staged 16→32-bit Morton spread as (col, expr) pairs.

    Shifts are written as multiplications by powers of two so the SAME
    expression text is valid Spark SQL and DuckDB SQL (DuckDB has no
    shiftleft(), Spark's << operator is newer than its function form);
    masks are the classic interleave constants in decimal.
    """
    return [
        (f"{v}1", f"(({v}0 | ({v}0 * 256)) & 16711935)"),
        (f"{v}2", f"(({v}1 | ({v}1 * 16)) & 252645135)"),
        (f"{v}3", f"(({v}2 | ({v}2 * 4)) & 858993459)"),
        (f"{v}4", f"(({v}3 | ({v}3 * 2)) & 1431655765)"),
    ]


_MORTON_STAGES = _morton_spread("x") + _morton_spread("y")
_MORTON_BUCKET = 4_194_304  # 2^22: top 10 interleaved bits form the bucket


def _zorder_oracle() -> str:
    stages = ",\n    ".join(
        f"s{i + 1} AS (SELECT *, {expr} AS {col} FROM s{i})"
        for i, (col, expr) in enumerate(_MORTON_STAGES)
    )
    return f"""
    WITH s0 AS (
      SELECT c_custkey,
             least(65535, greatest(0,
               CAST(floor((c_acctbal + 1000.0) * 5.9) AS BIGINT))) AS x0,
             (c_custkey % 97) * 675 AS y0
      FROM customer),
    {stages},
    m AS (SELECT c_custkey, x0, y0,
                 (x4 | (y4 * 2)) AS morton FROM s{len(_MORTON_STAGES)})
    SELECT morton // {_MORTON_BUCKET} AS bucket,
           count(*) AS n,
           CAST(min(x0) AS BIGINT) AS xmin, CAST(max(x0) AS BIGINT) AS xmax,
           CAST(min(y0) AS BIGINT) AS ymin, CAST(max(y0) AS BIGINT) AS ymax
    FROM m GROUP BY 1
    """


@register(
    "q155_zorder_layout",
    oracle=_zorder_oracle(),
    doc="Morton (Z-order) curve layout key — the data-layout operator "
    "behind multi-dimensional file skipping (Delta/Iceberg OPTIMIZE "
    "ZORDER BY): quantize two columns to 16-bit grids, interleave "
    "their bits (four mask-and-spread rounds written as "
    "multiply-by-power-of-two so the arithmetic is engine-portable), "
    "and bucket rows by the top 10 interleaved bits. Writing 100 TB "
    "clustered by this key makes BOTH per-column min/max ranges tight "
    "within every file, so a 2-D range predicate prunes ~√ of the "
    "files a 1-D sort would scan — the per-bucket xmin/xmax/ymin/ymax "
    "this query emits are exactly the footer stats a scan would prune "
    "on, making the locality measurable and oracle-checkable. "
    "All-integer end to end (the only float op, the quantization "
    "multiply, runs the same IEEE expression on both engines); one "
    "hash agg after a pure projection — no shuffle beyond it.",
    tags=("analytics", "zorder", "layout", "clustering", "scale"),
)
def q155_zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = t(spark, sf_dir, "customer").select(
        "c_custkey",
        F.expr(
            "least(65535, greatest(0, "
            "CAST(floor((c_acctbal + 1000.0) * 5.9) AS BIGINT)))"
        ).alias("x0"),
        ((F.col("c_custkey") % 97) * 675).alias("y0"),
    )
    for col, expr in _MORTON_STAGES:
        df = df.withColumn(col, F.expr(expr))
    m = df.select(
        "c_custkey", "x0", "y0", F.expr("x4 | (y4 * 2)").alias("morton")
    )
    return (
        m.groupBy(
            F.expr(f"div(morton, {_MORTON_BUCKET})").alias("bucket")
        )
        .agg(
            F.count("*").alias("n"),
            F.min("x0").cast("long").alias("xmin"),
            F.max("x0").cast("long").alias("xmax"),
            F.min("y0").cast("long").alias("ymin"),
            F.max("y0").cast("long").alias("ymax"),
        )
    )


_HIST_BUCKETS = 16


@register(
    "q157_equidepth_hist",
    oracle=f"""
    WITH v AS (
      SELECT CAST(round(l_extendedprice * 100) AS BIGINT) AS pc,
             row_number() OVER (ORDER BY l_extendedprice, l_orderkey,
                                l_linenumber) AS rn,
             count(*) OVER () AS n
      FROM lineitem)
    SELECT (rn - 1) * {_HIST_BUCKETS} // n AS bucket,
           count(*) AS n_rows,
           CAST(min(pc) AS BIGINT) AS lo_cents,
           CAST(max(pc) AS BIGINT) AS hi_cents
    FROM v GROUP BY 1
    """,
    doc="Equi-depth (equal-height) histogram of l_extendedprice in 16 "
    "buckets — the statistic a cost-based optimizer keeps per column, "
    "and the partition-boundary computation behind range "
    "repartitioning: bucket k holds ranks [k·n/B, (k+1)·n/B), so "
    "every bucket carries n/B ± 1 rows no matter how skewed the "
    "values. The rank comes from operators/indexing.with_global_index "
    "(range partition → per-partition row_number → driver prefix over "
    "#partitions counts → broadcast), NOT a single-partition global "
    "window — at 100 TB the oracle's row_number() OVER (ORDER BY …) "
    "simply does not execute, which is why the operator exists. "
    "Bucket arithmetic is pure int64 ((rn−1)·B div n) on identical "
    "ranks, and the unique (price, orderkey, linenumber) tiebreak "
    "makes the rank assignment deterministic on both engines.",
    tags=("analytics", "histogram", "order-statistics", "scale"),
)
def q157_equidepth_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    from columnarmodeling_spark.operators.indexing import with_global_index

    li = t(spark, sf_dir, "lineitem").select(
        F.col("l_extendedprice").alias("x"),
        "l_orderkey",
        "l_linenumber",
        F.round(F.col("l_extendedprice") * 100, 0).cast("long").alias("pc"),
    )
    idx = with_global_index(li, ["x", "l_orderkey", "l_linenumber"])
    n = li.agg(F.count("*").alias("n"))
    return (
        idx.crossJoin(F.broadcast(n))
        .groupBy(
            F.expr(f"div((rn - 1) * {_HIST_BUCKETS}, n)").alias("bucket")
        )
        .agg(
            F.count("*").alias("n_rows"),
            F.min("pc").cast("long").alias("lo_cents"),
            F.max("pc").cast("long").alias("hi_cents"),
        )
    )


@register(
    "q158_cube_aggregate",
    oracle="""
    SELECT coalesce(l_returnflag, 'ALL') AS rf,
           coalesce(l_linestatus, 'ALL') AS ls,
           CAST(2 * grouping(l_returnflag) + grouping(l_linestatus)
                AS BIGINT) AS gid,
           count(*) AS n,
           CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT)
             AS qty_cents
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
    doc="CUBE aggregation (all 2^2 grouping sets of return flag × line "
    "status, completing the multi-granularity family next to q35's "
    "ROLLUP): every subtotal level in ONE pass — Spark expands the "
    "cube map-side and aggregates all four grouping sets through a "
    "single shuffle, which at 100 TB replaces four separate scans "
    "with one. The grouping() bit-vector is computed explicitly as "
    "2·g(rf)+g(ls) on both engines (bit order of the built-in "
    "grouping_id() is engine-specific — the explicit form is "
    "portable), and NULL-vs-subtotal ambiguity is resolved the "
    "standard way (coalesce to 'ALL' + the gid column, exercising "
    "grouping() as the disambiguator since the source columns are "
    "non-null). Quantities stay integer cents.",
    tags=("analytics", "cube", "grouping-sets", "agg", "scale"),
)
def q158_cube_aggregate(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        "l_linestatus",
        F.round(F.col("l_quantity") * 100, 0).cast("long").alias("qc"),
    )
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(
            (
                2 * F.grouping("l_returnflag") + F.grouping("l_linestatus")
            )
            .cast("long")
            .alias("gid"),
            F.count("*").alias("n"),
            F.sum("qc").cast("long").alias("qty_cents"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("rf"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("ls"),
            "gid",
            "n",
            "qty_cents",
        )
    )


@register(
    "q161_column_profile",
    oracle="""
    WITH o AS (
      SELECT o_orderkey, o_custkey,
             CAST(round(o_totalprice * 100) AS BIGINT) AS price_cents,
             o_orderstatus, o_orderpriority,
             epoch_us(o_orderdate) // 86400000000 AS order_day
      FROM orders)
    SELECT 'o_orderkey' AS col, count(o_orderkey) AS n_nonnull,
           CAST(count(DISTINCT o_orderkey) AS BIGINT) AS n_distinct,
           CAST(min(o_orderkey) AS VARCHAR) AS min_val,
           CAST(max(o_orderkey) AS VARCHAR) AS max_val
    FROM o
    UNION ALL
    SELECT 'o_custkey', count(o_custkey),
           CAST(count(DISTINCT o_custkey) AS BIGINT),
           CAST(min(o_custkey) AS VARCHAR), CAST(max(o_custkey) AS VARCHAR)
    FROM o
    UNION ALL
    SELECT 'price_cents', count(price_cents),
           CAST(count(DISTINCT price_cents) AS BIGINT),
           CAST(min(price_cents) AS VARCHAR),
           CAST(max(price_cents) AS VARCHAR)
    FROM o
    UNION ALL
    SELECT 'o_orderstatus', count(o_orderstatus),
           CAST(count(DISTINCT o_orderstatus) AS BIGINT),
           min(o_orderstatus), max(o_orderstatus)
    FROM o
    UNION ALL
    SELECT 'o_orderpriority', count(o_orderpriority),
           CAST(count(DISTINCT o_orderpriority) AS BIGINT),
           min(o_orderpriority), max(o_orderpriority)
    FROM o
    UNION ALL
    SELECT 'order_day', count(order_day),
           CAST(count(DISTINCT order_day) AS BIGINT),
           CAST(min(order_day) AS VARCHAR), CAST(max(order_day) AS VARCHAR)
    FROM o
    """,
    doc="Dataset column profiler (the data-quality sweep every "
    "warehouse runs on landing: non-null count, exact distinct "
    "count, min/max per column, normalized to strings so one "
    "relation carries all columns): six profile rows over orders, "
    "money in integer cents and dates as epoch-days so the "
    "stringified extrema agree byte-for-byte across engines. The "
    "Spark side computes ALL six columns' profiles in a single "
    "job — one pass over the table with six independent agg "
    "branches unioned; the exact distincts are per-branch hash "
    "aggs (Spark plans count(DISTINCT) as expand+two-phase agg, "
    "map-side partialed; at 100 TB swap in approx_count_distinct "
    "per q10's sketch variants if exactness is negotiable).",
    tags=("analytics", "profiling", "data-quality", "agg", "scale"),
)
def q161_column_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        F.round(F.col("o_totalprice") * 100, 0)
        .cast("long")
        .alias("price_cents"),
        "o_orderstatus",
        "o_orderpriority",
        F.expr(
            "div(CAST(floor(unix_timestamp(o_orderdate)) AS BIGINT), 86400)"
        ).alias("order_day"),
    )

    def prof(col: str) -> DataFrame:
        return o.agg(
            F.count(col).alias("n_nonnull"),
            F.countDistinct(col).cast("long").alias("n_distinct"),
            F.min(col).cast("string").alias("min_val"),
            F.max(col).cast("string").alias("max_val"),
        ).select(
            F.lit(col).alias("col"),
            "n_nonnull",
            "n_distinct",
            "min_val",
            "max_val",
        )

    def prof_str(col: str) -> DataFrame:
        # STRING columns: min/max string BUFFERS are not hash-agg
        # mutable — fused with count(DISTINCT)'s two-level expansion
        # they demoted the whole data-sized pass to SortAggregate (r13
        # plan census). Restructured: the big pass is a plain groupBy
        # on the VALUE (string keys hash fine), and min/max/distinct
        # fold over the <=|distinct| value relation — the only
        # SortAggregate left is bounded by column cardinality.
        d = o.groupBy(col).agg(F.count(F.lit(1)).alias("cnt"))
        return d.agg(
            F.coalesce(
                F.sum(F.when(F.col(col).isNotNull(), F.col("cnt"))),
                F.lit(0),
            )
            .cast("long")
            .alias("n_nonnull"),
            F.count(col).cast("long").alias("n_distinct"),
            F.min(col).cast("string").alias("min_val"),
            F.max(col).cast("string").alias("max_val"),
        ).select(
            F.lit(col).alias("col"),
            "n_nonnull",
            "n_distinct",
            "min_val",
            "max_val",
        )

    str_cols = {"o_orderstatus", "o_orderpriority"}
    cols = [
        "o_orderkey",
        "o_custkey",
        "price_cents",
        "o_orderstatus",
        "o_orderpriority",
        "order_day",
    ]
    out = prof(cols[0])
    for c in cols[1:]:
        out = out.unionByName(prof_str(c) if c in str_cols else prof(c))
    return out


_BUCKETS_N = 8
_BUCKET_PATH = "/tmp/spark_graft_bucketed"


@register(
    "q162_bucketed_join",
    oracle="""
    SELECT o.o_orderpriority,
           count(*) AS n,
           CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT))
                AS BIGINT) AS rev_cents
    FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
    GROUP BY 1
    """,
    doc="Bucket-pruned co-located join: both sides are first written as "
    "bucketed tables (8 buckets, hashed and sorted on the order key — "
    "Spark's native-datasource bucketing, no Hive needed), then "
    "joined bucket-to-bucket. THE 100 TB technique for a join both "
    "of whose sides are too big to broadcast and which runs "
    "repeatedly (the fact-to-fact case): the bucketed layout "
    "pre-pays the shuffle ONCE at write time, and every subsequent "
    "join/aggregation on the bucket key runs with ZERO exchange on "
    "either side (tests/test_timeseries.py asserts the joined plan "
    "is exchange-free under a disabled broadcast threshold). The "
    "registered query does write+join in one call so the oracle "
    "checks end-to-end semantics; in production the write "
    "amortizes across every downstream consumer. Result is the "
    "plain per-priority revenue roll-up in integer cents.",
    tags=("analytics", "bucketing", "join", "layout", "scale"),
)
def q162_bucketed_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        F.round(F.col("l_extendedprice") * 100, 0).cast("long").alias("pc"),
    )
    o = t(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    for name, df, key in (
        ("bk_lineitem", li, "l_orderkey"),
        ("bk_orders", o, "o_orderkey"),
    ):
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        (
            df.write.bucketBy(_BUCKETS_N, key)
            .sortBy(key)
            .option("path", f"{_BUCKET_PATH}/{name}")
            .mode("overwrite")
            .saveAsTable(name)
        )
    j = spark.table("bk_lineitem").join(
        spark.table("bk_orders"),
        F.col("l_orderkey") == F.col("o_orderkey"),
    )
    return j.groupBy("o_orderpriority").agg(
        F.count("*").alias("n"),
        F.sum("pc").cast("long").alias("rev_cents"),
    )


@register(
    "q165_mad_robust",
    oracle="""
    WITH q AS (
      SELECT l_returnflag,
             CAST(round(l_quantity * 100) AS BIGINT) AS xc,
             l_orderkey, l_linenumber
      FROM lineitem),
    r1 AS (
      SELECT l_returnflag, xc,
             row_number() OVER (PARTITION BY l_returnflag
                                ORDER BY xc, l_orderkey, l_linenumber) AS rn,
             count(*) OVER (PARTITION BY l_returnflag) AS n
      FROM q),
    med AS (
      SELECT l_returnflag, n, xc AS median_c
      FROM r1 WHERE rn = (n + 1) // 2),
    d AS (
      SELECT q.l_returnflag, abs(q.xc - m.median_c) AS dc,
             q.l_orderkey, q.l_linenumber, m.n, m.median_c
      FROM q JOIN med m USING (l_returnflag)),
    r2 AS (
      SELECT l_returnflag, n, median_c, dc,
             row_number() OVER (PARTITION BY l_returnflag
                                ORDER BY dc, l_orderkey, l_linenumber) AS rn
      FROM d)
    SELECT l_returnflag, CAST(n AS BIGINT) AS n,
           median_c, dc AS mad_c
    FROM r2 WHERE rn = (n + 1) // 2
    """,
    doc="Robust location/scale per group: exact lower median and median "
    "absolute deviation (MAD — the outlier-resistant alternative to "
    "mean/stddev that q156's anomaly rule would use under heavy "
    "tails), both in integer centi-units so every comparison is "
    "engine-exact. The oracle's per-group row_number() is the "
    "few-giant-groups trap: PARTITION BY a 3-value column sorts a "
    "third of 100 TB in each of 3 tasks. The Spark side instead "
    "runs the q147/q157 two-pass global index over the COMPOSITE "
    "key (flag, value, tiebreak) — range partition, per-partition "
    "row_number, driver prefix over #partitions counts — then "
    "derives each group's local rank as rn − min(rn) + 1 from a "
    "broadcast per-group offset join; the median row is a broadcast "
    "rank probe. Two such passes (values, then absolute "
    "deviations); no per-group sort task ever exists.",
    tags=("analytics", "robust", "median", "order-statistics", "scale"),
)
def q165_mad_robust(spark: SparkSession, sf_dir: str) -> DataFrame:
    from columnarmodeling_spark.operators.indexing import with_group_rank

    def group_median(df: DataFrame, val: str) -> DataFrame:
        """Exact per-group lower median via operators/indexing.
        with_group_rank (one composite-key global index; no per-group
        sort task)."""
        rk = with_group_rank(
            df, ["l_returnflag"], [val, "l_orderkey", "l_linenumber"],
            rank_col="grk", count_col="gn",
        )
        return rk.filter(
            F.col("grk") == F.expr("div(gn + 1, 2)")
        ).select(
            "l_returnflag",
            F.col("gn").alias("n"),
            F.col(val).alias(f"med_{val}"),
        )

    q = t(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        F.round(F.col("l_quantity") * 100, 0).cast("long").alias("xc"),
        "l_orderkey",
        "l_linenumber",
    )
    med = group_median(q, "xc")
    d = q.join(
        F.broadcast(med.select("l_returnflag", "med_xc")), "l_returnflag"
    ).select(
        "l_returnflag",
        F.abs(F.col("xc") - F.col("med_xc")).alias("dc"),
        "l_orderkey",
        "l_linenumber",
    )
    mad = group_median(d, "dc")
    return (
        med.join(mad.select("l_returnflag", "med_dc"), "l_returnflag")
        .select(
            "l_returnflag",
            F.col("n").cast("long").alias("n"),
            F.col("med_xc").alias("median_c"),
            F.col("med_dc").alias("mad_c"),
        )
    )


@register(
    "q167_cdf_features",
    oracle="""
    WITH v AS (
      SELECT l_orderkey, l_linenumber,
             CAST(round(l_extendedprice * 100) AS BIGINT) AS pc,
             row_number() OVER (ORDER BY l_extendedprice, l_orderkey,
                                l_linenumber) AS rn,
             count(*) OVER () AS n
      FROM lineitem)
    SELECT l_orderkey, l_linenumber, pc,
           1000000 * (rn - 1) // (n - 1) AS cdf_micro
    FROM v
    """,
    doc="Empirical-CDF (percentile-rank) feature transform — the "
    "distribution-free normalization a training pipeline applies to "
    "heavy-tailed numerics before they reach a model (maps any "
    "distribution to uniform [0,1], immune to outliers that wreck "
    "min-max or z-score scaling): every row gains its exact rank "
    "position 10⁶·(rn−1)/(n−1) in integer micro-units. Rank comes "
    "from the q147/q157 two-pass global index (range exchange, "
    "per-partition row_number, broadcast partition offsets) — the "
    "oracle's global row_number() OVER (ORDER BY …) is exactly the "
    "single-partition sort this operator exists to avoid; the "
    "unique (price, orderkey, linenumber) tiebreak keeps the rank "
    "assignment engine-deterministic and the floor division keeps "
    "the output exact int64.",
    tags=("analytics", "normalization", "order-statistics", "scale"),
)
def q167_cdf_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    from columnarmodeling_spark.operators.indexing import with_global_index

    li = t(spark, sf_dir, "lineitem").select(
        F.col("l_extendedprice").alias("x"),
        "l_orderkey",
        "l_linenumber",
        F.round(F.col("l_extendedprice") * 100, 0).cast("long").alias("pc"),
    )
    idx = with_global_index(li, ["x", "l_orderkey", "l_linenumber"])
    n = li.agg(F.count("*").alias("n"))
    return idx.crossJoin(F.broadcast(n)).select(
        "l_orderkey",
        "l_linenumber",
        "pc",
        F.expr("div(1000000 * (rn - 1), n - 1)").alias("cdf_micro"),
    )


_SKETCH_B = 1024  # fixed histogram width: the sketch's constant state size
_SKETCH_QS = (0.25, 0.5, 0.75, 0.9)


@register(
    "q170_hist_quantiles",
    oracle=f"""
    WITH v AS (
      SELECT CAST(round(l_extendedprice * 100) AS BIGINT) AS pc,
             l_orderkey, l_linenumber
      FROM lineitem),
    mm AS (SELECT min(pc) AS mn, max(pc) AS mx, count(*) AS n FROM v),
    h AS (
      SELECT (v.pc - m.mn) * {_SKETCH_B} // (m.mx - m.mn + 1) AS b,
             count(*) AS cnt
      FROM v CROSS JOIN mm m GROUP BY 1),
    hc AS (
      SELECT b, cnt,
             CAST(sum(cnt) OVER (ORDER BY b
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS cum
      FROM h),
    qs AS (SELECT CAST(unnest(ARRAY{list(_SKETCH_QS)}) AS DOUBLE) AS q),
    tg AS (
      SELECT qs.q,
             CAST(floor(qs.q * (m.n - 1)) AS BIGINT) + 1 AS rk,
             m.mn, m.mx
      FROM qs CROSS JOIN mm m),
    ap AS (
      SELECT t.q, t.rk,
             min(t.mn + hc.b * (t.mx - t.mn + 1) // {_SKETCH_B})
               AS approx_c
      FROM tg t JOIN hc ON hc.cum >= t.rk AND hc.cum - hc.cnt < t.rk
      GROUP BY 1, 2),
    ex AS (
      SELECT t.q, w.pc AS exact_c
      FROM tg t JOIN (
        SELECT pc, row_number() OVER (ORDER BY pc, l_orderkey,
                                      l_linenumber) AS rn
        FROM v) w ON w.rn = t.rk)
    SELECT a.q, a.rk, a.approx_c, e.exact_c,
           abs(a.approx_c - e.exact_c) AS err_c,
           (SELECT (mx - mn + 1) // {_SKETCH_B} + 1 FROM mm) AS bound_c
    FROM ap a JOIN ex e USING (q)
    """,
    doc="Mergeable histogram quantile sketch vs exact — the "
    "bounded-state pattern that replaces exact order statistics "
    "when 100 TB won't pay for a range exchange: ONE "
    "map-side-combinable hash agg builds a fixed 1024-bucket "
    "equi-width histogram (state size is the sketch width, "
    "REGARDLESS of row count — shard-mergeable by addition like "
    "q132's Count-Min), the cumulative pass runs over ≤1024 rows "
    "via the two-pass running sum, and each quantile reads the "
    "bucket whose cumulative count crosses its target rank. The "
    "query emits approx AND exact (q147 machinery) side by side "
    "with the error and its a-priori bound (one bucket width) — "
    "all integer, so the accuracy claim is oracle-checkable, the "
    "same eval discipline as q104/q110/q134. Deterministic "
    "min/max come from one broadcast agg; every division is int64 "
    "floor division.",
    tags=("analytics", "sketch", "quantile", "histogram", "scale"),
)
def q170_hist_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from columnarmodeling_spark.operators.indexing import (
        with_global_index,
        with_global_running_sum,
    )

    v = t(spark, sf_dir, "lineitem").select(
        F.round(F.col("l_extendedprice") * 100, 0).cast("long").alias("pc"),
        "l_orderkey",
        "l_linenumber",
    )
    mm = v.agg(
        F.min("pc").alias("mn"), F.max("pc").alias("mx"),
        F.count("*").alias("n"),
    )
    h = (
        v.crossJoin(F.broadcast(mm))
        .groupBy(
            F.expr(f"div((pc - mn) * {_SKETCH_B}, mx - mn + 1)").alias("b")
        )
        .agg(F.count("*").alias("cnt"))
    )
    hc = with_global_running_sum(h, ["b"], "cnt", out_col="cum")
    qs = spark.createDataFrame([(q,) for q in _SKETCH_QS], "q DOUBLE")
    tg = qs.crossJoin(F.broadcast(mm)).select(
        "q",
        (F.floor(F.col("q") * (F.col("n") - 1)).cast("long") + 1).alias(
            "rk"
        ),
        "mn",
        "mx",
    )
    ap = (
        tg.join(
            F.broadcast(hc),
            (F.col("cum") >= F.col("rk"))
            & (F.col("cum") - F.col("cnt") < F.col("rk")),
        )
        .groupBy("q", "rk")
        .agg(
            F.min(
                F.col("mn")
                + F.expr(f"div(b * (mx - mn + 1), {_SKETCH_B})")
            ).alias("approx_c")
        )
    )
    idx = with_global_index(v, ["pc", "l_orderkey", "l_linenumber"])
    ex = idx.join(
        F.broadcast(tg.select("q", F.col("rk").alias("rn"))), "rn"
    ).select("q", F.col("pc").alias("exact_c"))
    bound = mm.select(
        (F.expr(f"div(mx - mn + 1, {_SKETCH_B})") + 1).alias("bound_c")
    )
    return (
        ap.join(ex, "q")
        .crossJoin(F.broadcast(bound))
        .select(
            "q",
            "rk",
            "approx_c",
            "exact_c",
            F.abs(F.col("approx_c") - F.col("exact_c")).alias("err_c"),
            "bound_c",
        )
    )


_PIT_OFFSET_US = 3_600_000_000  # probe each sampled event 1h after it fired


@register(
    "q180_point_in_time_join",
    oracle=f"""
    WITH e AS (
      SELECT user_id, event_type, event_id, epoch_us(ts) AS us
      FROM events),
    chg AS (
      SELECT user_id, event_type, us,
             CASE WHEN lag(event_type) OVER w IS DISTINCT FROM event_type
                  THEN 1 ELSE 0 END AS is_chg
      FROM e
      WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
    runs AS (
      SELECT user_id, event_type, us,
             sum(is_chg) OVER (PARTITION BY user_id ORDER BY us
                               ROWS UNBOUNDED PRECEDING) AS run_id
      FROM chg),
    grp AS (
      -- event_type constant within a run -> group key, not a string
      -- min() buffer (hash-agg demotion; see q148)
      SELECT user_id, run_id, event_type,
             min(us) AS valid_from_us
      FROM runs GROUP BY 1, 2, 3),
    hist AS (
      SELECT user_id, event_type, valid_from_us,
             coalesce(lead(valid_from_us)
               OVER (PARTITION BY user_id ORDER BY run_id),
               9223372036854775807) AS valid_to_us
      FROM grp),
    probes AS (
      SELECT event_id, user_id, us + {_PIT_OFFSET_US} AS t
      FROM e WHERE event_id % 7 = 0)
    SELECT p.event_id, p.user_id, CAST(p.t AS BIGINT) AS t_us,
           h.event_type AS state_at_t,
           CAST(h.valid_from_us AS BIGINT) AS valid_from_us
    FROM probes p JOIN hist h
      ON h.user_id = p.user_id
     AND p.t >= h.valid_from_us AND p.t < h.valid_to_us
    """,
    doc="Point-in-time dimension join against the SCD2 history — the "
    "feature-store correctness primitive ('what was this entity's "
    "state when the training label fired?' — get it wrong and the "
    "model trains on leaked future state): q148's gaps-and-islands "
    "history rebuilt inline with an open-ended MAX_LONG current "
    "version, probed by every 7th event one hour after it fired; "
    "interval containment picks exactly one version per probe "
    "(validity intervals tile each user's timeline by "
    "construction). The join is an equi-join on user_id with the "
    "BETWEEN as a residual — per-user version chains bound the "
    "fan-out, and both sides ride ONE user_id partitioning end to "
    "end (history windows, probe filter, join). All integer "
    "epoch-micros.",
    tags=("analytics", "scd2", "point-in-time", "join", "scale"),
)
def q180_point_in_time_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    e = t(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        "event_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
    )
    w = W.partitionBy("user_id").orderBy("us", "event_id")
    chg = e.withColumn(
        "is_chg",
        F.when(
            ~F.lag("event_type").over(w).eqNullSafe(F.col("event_type")), 1
        ).otherwise(0),
    )
    runs = chg.withColumn(
        "run_id",
        F.sum("is_chg").over(
            w.rowsBetween(W.unboundedPreceding, W.currentRow)
        ),
    )
    # event_type constant within a run -> group key (see q148)
    grp = runs.groupBy("user_id", "run_id", "event_type").agg(
        F.min("us").alias("valid_from_us"),
    )
    wr = W.partitionBy("user_id").orderBy("run_id")
    hist = grp.select(
        "user_id",
        "event_type",
        "valid_from_us",
        F.coalesce(
            F.lead("valid_from_us").over(wr),
            F.lit(9223372036854775807),
        ).alias("valid_to_us"),
    )
    probes = e.filter(F.col("event_id") % 7 == 0).select(
        "event_id",
        "user_id",
        (F.col("us") + _PIT_OFFSET_US).alias("t"),
    )
    return (
        probes.join(hist, "user_id")
        .filter(
            (F.col("t") >= F.col("valid_from_us"))
            & (F.col("t") < F.col("valid_to_us"))
        )
        .select(
            "event_id",
            "user_id",
            F.col("t").cast("long").alias("t_us"),
            F.col("event_type").alias("state_at_t"),
            F.col("valid_from_us").cast("long").alias("valid_from_us"),
        )
    )


_WF_WINDOW_US = 3_600_000_000  # funnel must complete within 1 hour


@register(
    "q183_window_funnel",
    oracle=f"""
    WITH v AS (
      SELECT user_id, min(epoch_us(ts)) AS t1
      FROM events WHERE event_type = 'view' GROUP BY 1),
    c AS (
      SELECT e.user_id, min(v.t1) AS t1, min(epoch_us(e.ts)) AS t2
      FROM events e JOIN v ON v.user_id = e.user_id
      WHERE e.event_type = 'click' AND epoch_us(e.ts) > v.t1
        AND epoch_us(e.ts) <= v.t1 + {_WF_WINDOW_US}
      GROUP BY 1),
    p AS (
      SELECT e.user_id, min(c.t1) AS t1
      FROM events e JOIN c ON c.user_id = e.user_id
      WHERE e.event_type = 'purchase' AND epoch_us(e.ts) > c.t2
        AND epoch_us(e.ts) <= c.t1 + {_WF_WINDOW_US}
      GROUP BY 1)
    SELECT CAST((SELECT count(*) FROM v) AS BIGINT) AS step1_users,
           CAST((SELECT count(*) FROM c) AS BIGINT) AS step2_users,
           CAST((SELECT count(*) FROM p) AS BIGINT) AS step3_users
    """,
    doc="Time-bounded window funnel (ClickHouse windowFunnel / Amplitude "
    "semantics: the whole view→click→purchase chain must complete "
    "within 1 hour of the FIRST view — q135's unbounded funnel "
    "over-counts eventually-converted users; product analytics wants "
    "conversion within a session-scale deadline): the same chain of "
    "user-keyed min-aggregations with the deadline carried forward "
    "as an integer epoch-micros bound on each stage (anchored at "
    "the stage-1 time, per the standard semantics). One hash "
    "partitioning serves the whole chain; the final counts are "
    "three scalar aggs — no window, no sort, no per-user event "
    "buffering.",
    tags=("analytics", "funnel", "window-funnel", "agg", "scale"),
)
def q183_window_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = t(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
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
        .filter(
            (F.col("us") > F.col("t1"))
            & (F.col("us") <= F.col("t1") + _WF_WINDOW_US)
        )
        .groupBy("user_id")
        .agg(F.min("t1").alias("t1"), F.min("us").alias("t2"))
    )
    p = (
        e.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(
            (F.col("us") > F.col("t2"))
            & (F.col("us") <= F.col("t1") + _WF_WINDOW_US)
        )
        .groupBy("user_id")
        .agg(F.min("t1").alias("t1"))
    )
    return (
        v.agg(F.count("*").cast("long").alias("step1_users"))
        .crossJoin(
            F.broadcast(
                c.agg(F.count("*").cast("long").alias("step2_users"))
            )
        )
        .crossJoin(
            F.broadcast(
                p.agg(F.count("*").cast("long").alias("step3_users"))
            )
        )
    )


@register(
    "q184_period_over_period",
    oracle="""
    WITH d AS (
      SELECT epoch_us(ts) // 86400000000 AS day,
             CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
               AS rev_c
      FROM events GROUP BY 1),
    w AS (
      SELECT day, rev_c,
             lag(rev_c, 7) OVER (ORDER BY day) AS rev_c_prev
      FROM d)
    SELECT day, rev_c, rev_c_prev,
           CASE WHEN rev_c_prev IS NULL OR rev_c_prev = 0 THEN NULL
                ELSE 1000000 * (rev_c - rev_c_prev) // rev_c_prev
           END AS wow_micro
    FROM w
    """,
    doc="Week-over-week change (the BI dashboard staple: each day's "
    "value beside the same weekday last week, with the percent "
    "change): per-day centi-quantized sums, lag(7) over the day "
    "axis, delta ratio in integer floor-division micro-units (NULL "
    "when no prior week exists). The day-axis window is bounded by "
    "the calendar (30 rows here, 36 500 rows for a century) — the "
    "ONE place a single-partition window is legitimately "
    "scale-safe, because the relation is the time axis itself, not "
    "the data volume; the heavy lifting (the per-day sum over 100 "
    "TB of events) happens in the map-side-combinable hash agg "
    "below it.",
    tags=("analytics", "period-over-period", "window", "agg", "scale"),
)
def q184_period_over_period(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    d = (
        t(spark, sf_dir, "events")
        .select(
            F.expr(
                "div(unix_micros(cast(ts AS timestamp)), 86400000000)"
            ).alias("day"),
            F.round(F.col("value") * 100, 0).cast("long").alias("vc"),
        )
        .groupBy("day")
        .agg(F.sum("vc").cast("long").alias("rev_c"))
    )
    w = W.orderBy("day")
    out = d.withColumn("rev_c_prev", F.lag("rev_c", 7).over(w))
    return out.select(
        "day",
        "rev_c",
        "rev_c_prev",
        F.when(
            F.col("rev_c_prev").isNotNull() & (F.col("rev_c_prev") != 0),
            F.expr("div(1000000 * (rev_c - rev_c_prev), rev_c_prev)"),
        ).alias("wow_micro"),
    )


@register(
    "q187_table_fingerprint",
    oracle="""
    WITH o AS (
      SELECT bit_xor(CAST(('0x' || substr(md5(
               CAST(o_orderkey AS VARCHAR) || '|' ||
               CAST(o_custkey AS VARCHAR) || '|' ||
               CAST(CAST(round(o_totalprice * 100) AS BIGINT) AS VARCHAR)
               || '|' || o_orderstatus || '|' || o_orderpriority || '|' ||
               CAST(epoch_us(o_orderdate) // 86400000000 AS VARCHAR)
             ), 1, 15)) AS BIGINT)) AS sig,
             count(*) AS n
      FROM orders),
    l AS (
      SELECT bit_xor(CAST(('0x' || substr(md5(
               CAST(l_orderkey AS VARCHAR) || '|' ||
               CAST(l_linenumber AS VARCHAR) || '|' ||
               CAST(CAST(round(l_extendedprice * 100) AS BIGINT) AS VARCHAR)
               || '|' || l_returnflag
             ), 1, 15)) AS BIGINT)) AS sig,
             count(*) AS n
      FROM lineitem)
    SELECT 'orders' AS tbl, CAST(o.n AS BIGINT) AS n_rows, o.sig FROM o
    UNION ALL
    SELECT 'lineitem', CAST(l.n AS BIGINT), l.sig FROM l
    """,
    doc="Order-insensitive table fingerprint (replication/migration "
    "audit: did 100 TB arrive intact? — the check this engine's own "
    "round driver performs on every query result, exposed as an "
    "operator): each row is canonicalized to an integer-quantized "
    "string, hashed to a 60-bit md5 prefix, and the per-table "
    "signature is the XOR of all row hashes — commutative and "
    "associative, so it is ONE map-side-combinable agg with 8 bytes "
    "of state, immune to row order, partitioning, and shard "
    "boundaries (sum would overflow int64 and need modular "
    "arithmetic; XOR needs nothing). Two tables fingerprinted in "
    "one pass each; a single changed/missing/duplicated row flips "
    "the signature (a pair of identical duplicate rows cancels — "
    "the documented XOR blind spot; pair it with the count column, "
    "which catches cardinality changes).",
    tags=("analytics", "fingerprint", "audit", "agg", "scale"),
)
def q187_table_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    from columnarmodeling_spark.functions.text import hex_hash

    o = t(spark, sf_dir, "orders").select(
        F.concat_ws(
            "|",
            F.col("o_orderkey").cast("string"),
            F.col("o_custkey").cast("string"),
            F.round(F.col("o_totalprice") * 100, 0)
            .cast("long")
            .cast("string"),
            "o_orderstatus",
            "o_orderpriority",
            F.expr(
                "div(unix_micros(cast(o_orderdate AS timestamp)), "
                "86400000000)"
            ).cast("string"),
        ).alias("row_str")
    )
    li = t(spark, sf_dir, "lineitem").select(
        F.concat_ws(
            "|",
            F.col("l_orderkey").cast("string"),
            F.col("l_linenumber").cast("string"),
            F.round(F.col("l_extendedprice") * 100, 0)
            .cast("long")
            .cast("string"),
            "l_returnflag",
        ).alias("row_str")
    )

    def fp(df: DataFrame, name: str) -> DataFrame:
        return df.select(hex_hash("row_str").alias("u")).agg(
            F.expr("bit_xor(u)").alias("sig"),
            F.count("*").cast("long").alias("n_rows"),
        ).select(F.lit(name).alias("tbl"), "n_rows", "sig")

    return fp(o, "orders").unionByName(fp(li, "lineitem"))


@register(
    "q191_ab_test",
    oracle="""
    WITH arms AS (
      SELECT user_id,
             CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 4))
                  AS BIGINT) % 2 AS arm,
             CASE WHEN count(*) FILTER (event_type = 'purchase')
                       > count(*) FILTER (event_type = 'click')
                  THEN 1 ELSE 0 END AS converted
      FROM events GROUP BY user_id),
    s AS (
      SELECT
        CAST(count(*) FILTER (arm = 0) AS BIGINT) AS n_a,
        CAST(coalesce(sum(converted) FILTER (arm = 0), 0) AS BIGINT) AS c_a,
        CAST(count(*) FILTER (arm = 1) AS BIGINT) AS n_b,
        CAST(coalesce(sum(converted) FILTER (arm = 1), 0) AS BIGINT) AS c_b
      FROM arms)
    SELECT n_a, c_a, n_b, c_b,
           CASE WHEN n_a > 0 AND n_b > 0
                THEN 1000000 * c_a // n_a - 1000000 * c_b // n_b
                ELSE NULL END AS rate_diff_micro,
           CASE WHEN n_a > 0 AND n_b > 0
                     AND c_a + c_b > 0 AND c_a + c_b < n_a + n_b
                THEN CAST(round(
                  (CAST(c_a AS DOUBLE) / n_a - CAST(c_b AS DOUBLE) / n_b)
                  / sqrt((CAST(c_a + c_b AS DOUBLE) / (n_a + n_b))
                         * (1.0 - CAST(c_a + c_b AS DOUBLE) / (n_a + n_b))
                         * (1.0 / n_a + 1.0 / n_b)) * 1000000) AS BIGINT)
                ELSE NULL END AS z_micro
    FROM s
    """,
    doc="Two-proportion A/B test (experimentation analytics: did arm A "
    "convert better than arm B, and is the difference more than "
    "noise?): users hash-split into two arms by a 16-bit md5 bucket "
    "(the same composable assignment rule as q87/q178 — "
    "deterministic, so both engines and any re-run agree on every "
    "user's arm), per-user conversion = strictly more purchases than "
    "clicks (a relative definition that stays non-degenerate at any "
    "scale factor, unlike 'any purchase' which saturates to 100% "
    "once users have enough events), pooled two-proportion "
    "z-statistic in closed form. Counts are exact int64 from two "
    "user-keyed aggs; the z arithmetic is one shared expression over "
    "int64-derived doubles whose only libm call is the "
    "IEEE-correctly-rounded sqrt, quantized to integer micro-units "
    "per the repo's exactness discipline. Degenerate pools (an empty "
    "arm, 0% or 100% pooled conversion) yield NULL statistics via "
    "explicit CASE guards instead of a DIVIDE_BY_ZERO under ANSI "
    "mode. At 100 TB this is one agg over the assignment projection; "
    "the statistic itself costs a 2-row reduction.",
    tags=("analytics", "ab-test", "experiment", "agg", "scale"),
)
def q191_ab_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    arms = (
        t(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            (
                F.count(F.when(F.col("event_type") == "purchase", 1))
                > F.count(F.when(F.col("event_type") == "click", 1))
            )
            .cast("int")
            .alias("converted")
        )
        .select(
            (
                F.conv(
                    F.substring(
                        F.md5(F.col("user_id").cast("string")), 1, 4
                    ),
                    16,
                    10,
                ).cast("long")
                % 2
            ).alias("arm"),
            "converted",
        )
    )
    s = arms.agg(
        F.count(F.when(F.col("arm") == 0, 1)).cast("long").alias("n_a"),
        F.coalesce(
            F.sum(F.when(F.col("arm") == 0, F.col("converted"))), F.lit(0)
        )
        .cast("long")
        .alias("c_a"),
        F.count(F.when(F.col("arm") == 1, 1)).cast("long").alias("n_b"),
        F.coalesce(
            F.sum(F.when(F.col("arm") == 1, F.col("converted"))), F.lit(0)
        )
        .cast("long")
        .alias("c_b"),
    )
    pa = F.col("c_a").cast("double") / F.col("n_a")
    pb = F.col("c_b").cast("double") / F.col("n_b")
    pp = (F.col("c_a") + F.col("c_b")).cast("double") / (
        F.col("n_a") + F.col("n_b")
    )
    both_arms = (F.col("n_a") > 0) & (F.col("n_b") > 0)
    pooled_ok = both_arms & (
        (F.col("c_a") + F.col("c_b") > 0)
        & (F.col("c_a") + F.col("c_b") < F.col("n_a") + F.col("n_b"))
    )
    return s.select(
        "n_a",
        "c_a",
        "n_b",
        "c_b",
        F.when(
            both_arms,
            F.expr("div(1000000 * c_a, n_a)")
            - F.expr("div(1000000 * c_b, n_b)"),
        ).alias("rate_diff_micro"),
        F.when(
            pooled_ok,
            F.round(
                (pa - pb)
                / F.sqrt(
                    pp * (F.lit(1.0) - pp)
                    * (
                        F.lit(1.0) / F.col("n_a")
                        + F.lit(1.0) / F.col("n_b")
                    )
                )
                * 1000000
            ).cast("long"),
        ).alias("z_micro"),
    )


@register(
    "q197_rfm_segments",
    oracle="""
    WITH m AS (
      SELECT o_custkey AS custkey,
             max(epoch_us(o_orderdate)) AS r_us,
             CAST(count(*) AS BIGINT) AS f_cnt,
             CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                  AS BIGINT) AS m_cents
      FROM orders GROUP BY 1),
    n AS (SELECT count(*) AS n FROM m),
    r AS (
      SELECT custkey, r_us, f_cnt, m_cents,
             row_number() OVER (ORDER BY r_us, custkey) AS rr,
             row_number() OVER (ORDER BY f_cnt, custkey) AS fr,
             row_number() OVER (ORDER BY m_cents, custkey) AS mr
      FROM m)
    SELECT custkey, r_us, f_cnt, m_cents,
           (rr - 1) * 5 // (SELECT n FROM n) + 1 AS r_score,
           (fr - 1) * 5 // (SELECT n FROM n) + 1 AS f_score,
           (mr - 1) * 5 // (SELECT n FROM n) + 1 AS m_score,
           ((rr - 1) * 5 // (SELECT n FROM n) + 1) * 100
           + ((fr - 1) * 5 // (SELECT n FROM n) + 1) * 10
           + ((mr - 1) * 5 // (SELECT n FROM n) + 1) AS segment
    FROM r
    """,
    doc="RFM customer segmentation (the marketing-analytics staple: "
    "recency / frequency / monetary quintile scores, 111-555 segment "
    "codes): per-customer metrics from one orders agg — recency as "
    "epoch-micros of the last order, monetary as exact integer cents "
    "— then each metric's quintile from a GLOBAL rank with custkey "
    "tie-break (score = (rank-1)*5 div n + 1: pure positive-int "
    "arithmetic, identical div semantics on both engines; ntile() "
    "would shuffle remainder rows differently and is avoided). The "
    "oracle's three global row_number()s are exactly what a naive "
    "Spark build would do in ONE task each; the engine instead runs "
    "operators/indexing.with_global_index per metric — range "
    "partition, per-partition window, broadcast offsets — the "
    "documented scale-safe global-order shape (q177/q181). Output is "
    "all-integer, hash-exact.",
    tags=("analytics", "rfm", "segmentation", "ranking", "scale"),
)
def q197_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    from columnarmodeling_spark.operators.indexing import with_global_index

    m = (
        t(spark, sf_dir, "orders")
        .groupBy(F.col("o_custkey").alias("custkey"))
        .agg(
            F.max(
                F.unix_micros(F.col("o_orderdate").cast("timestamp"))
            ).alias("r_us"),
            F.count("*").cast("long").alias("f_cnt"),
            F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("long"))
            .cast("long")
            .alias("m_cents"),
        )
        .localCheckpoint(eager=False)
    )
    ranked = m
    for col, rank_col in (
        ("r_us", "rr"), ("f_cnt", "fr"), ("m_cents", "mr")
    ):
        ranked = with_global_index(
            ranked, [col, "custkey"], index_col=rank_col
        )
    nn = m.agg(F.count("*").alias("n"))
    score = lambda rk: (  # noqa: E731
        F.expr(f"div(({rk} - 1) * 5, n)") + 1
    )
    return ranked.crossJoin(F.broadcast(nn)).select(
        "custkey",
        "r_us",
        "f_cnt",
        "m_cents",
        score("rr").alias("r_score"),
        score("fr").alias("f_score"),
        score("mr").alias("m_score"),
        (
            score("rr") * 100 + score("fr") * 10 + score("mr")
        ).alias("segment"),
    )


_BOOT_B = 8  # bootstrap replicas
# Poisson(1) CDF thresholds (exact repr round-trip doubles — both
# engines compare the SAME literals against the same md5 uniform, so
# every (row, replica) weight is identical); weights capped at 9
# (remaining mass ~1.1e-6, a documented truncation both sides share).
_POIS_CDF = (
    "0.36787944117144233", "0.7357588823428847", "0.9196986029286058",
    "0.9810118431238463", "0.9963401531726563", "0.9994058151824183",
    "0.999916758850712", "0.9999897508033253", "0.999998874797402",
)
_POIS_DEN = 1 << 60  # md5 60-bit prefix -> uniform in [0, 1)


def _pois_weight_sql(u: str) -> str:
    """weight = #CDF thresholds <= u (branchless sum — identical
    integer result in both dialects)."""
    terms = " + ".join(
        f"CASE WHEN {u} >= {t} THEN 1 ELSE 0 END" for t in _POIS_CDF
    )
    return f"({terms})"


@register(
    "q199_poisson_bootstrap",
    oracle=f"""
    WITH x AS (
      SELECT o_orderkey AS k,
             CAST(round(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders),
    d AS (
      SELECT x.k, x.cents, b.b,
             {_pois_weight_sql(
                 "(CAST(('0x' || substr(md5(CAST(x.k AS VARCHAR) || '#' || "
                 "CAST(b.b AS VARCHAR)), 1, 15)) AS BIGINT)"
                 f" / CAST({_POIS_DEN} AS DOUBLE))"
             )} AS w
      FROM x CROSS JOIN (SELECT unnest(range(1, {_BOOT_B} + 1)) AS b) b)
    SELECT CAST(b AS BIGINT) AS replica,
           CAST(sum(w) AS BIGINT) AS n_eff,
           CAST(sum(w * cents) AS BIGINT) AS sum_cents,
           round(CAST(sum(w * cents) AS DOUBLE) / sum(w), 6) AS mean_cents
    FROM d GROUP BY 1
    """,
    doc="Deterministic Poisson bootstrap of the mean order value — THE "
    "distributed bootstrap (Chamandy et al. 2012, 'Estimating "
    "uncertainty for massive data streams'): classical resampling "
    "needs n draws WITH replacement from n rows (a global shuffle per "
    "replica), while the Poisson approximation gives every row an "
    "independent Poisson(1) weight per replica — one map-side "
    "expression, no resampling shuffle, exact at the 1/n level. The "
    "per-(row, replica) weight is the inverse-CDF of a 60-bit md5 "
    "uniform against exact repr-round-trip Poisson(1) thresholds "
    "(capped at 9, mass ~1e-6 — both engines share the truncation), "
    "so the draw is DETERMINISTIC: re-runs, retries and both engines "
    "agree on every weight — the q87/q178/q196 discipline applied to "
    "uncertainty quantification, vs q189's jackknife which covers the "
    "small-B regime. Sums are exact int64; the per-replica mean is "
    "one two-integer division. At 100 TB: a constant B-way fan-out "
    "and one hash agg — the bootstrap costs B scans' worth of map "
    "work and nothing else.",
    tags=("analytics", "bootstrap", "uncertainty", "agg", "scale"),
)
def q199_poisson_bootstrap(spark: SparkSession, sf_dir: str) -> DataFrame:
    x = t(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("k"),
        F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("cents"),
    )
    bs = spark.range(1, _BOOT_B + 1).select(F.col("id").alias("b"))
    u = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        "#",
                        F.col("k").cast("string"),
                        F.col("b").cast("string"),
                    )
                ),
                1,
                15,
            ),
            16,
            10,
        ).cast("long")
        / F.lit(float(_POIS_DEN))
    )
    w = None
    for thr in _POIS_CDF:
        term = F.when(u >= float(thr), 1).otherwise(0)
        w = term if w is None else w + term
    d = x.crossJoin(F.broadcast(bs)).select(
        "b", "cents", w.alias("w")
    )
    return d.groupBy(F.col("b").cast("long").alias("replica")).agg(
        F.sum("w").cast("long").alias("n_eff"),
        F.sum(F.col("w") * F.col("cents")).cast("long").alias("sum_cents"),
        F.round(
            F.sum(F.col("w") * F.col("cents")).cast("double")
            / F.sum("w"),
            6,
        ).alias("mean_cents"),
    )


@register(
    "q200_calibration_curve",
    oracle="""
    WITH u AS (
      SELECT user_id,
             CAST(count(*) FILTER (event_type = 'click') AS BIGINT)
               AS n_clicks,
             CASE WHEN count(*) FILTER (event_type = 'purchase')
                       > count(*) FILTER (event_type = 'click')
                  THEN 1 ELSE 0 END AS converted
      FROM events GROUP BY 1),
    n AS (SELECT count(*) AS n FROM u),
    r AS (
      SELECT user_id, n_clicks, converted,
             row_number() OVER (ORDER BY n_clicks, user_id) AS rk
      FROM u)
    SELECT (rk - 1) * 10 // (SELECT n FROM n) + 1 AS score_decile,
           CAST(count(*) AS BIGINT) AS n_users,
           CAST(sum(converted) AS BIGINT) AS n_converted,
           CASE WHEN count(*) > 0
                THEN 1000000 * CAST(sum(converted) AS BIGINT) // count(*)
                ELSE NULL END AS conv_rate_micro
    FROM r GROUP BY 1
    """,
    doc="Score calibration / reliability curve (the model-eval staple: "
    "does the k-th score decile actually convert at a monotone rate?) "
    "over q191's conversion definition, scored by per-user click "
    "count: users rank globally on (score, user_id) — the engine uses "
    "operators/indexing.with_global_index, never a single-task global "
    "window — then decile = (rank-1)*10 div n + 1 (pure positive-int "
    "arithmetic, identical div in both dialects; engine-divergent "
    "ntile() avoided, the q197 rule), and each decile reports exact "
    "integer user/conversion counts plus the rate in micro-units. 10 "
    "output rows at any corpus size; the only data-sized work is one "
    "user-keyed agg and the two-pass global rank.",
    tags=("analytics", "calibration", "eval", "ranking", "scale"),
)
def q200_calibration_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    from columnarmodeling_spark.operators.indexing import with_global_index

    u = (
        t(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.count(F.when(F.col("event_type") == "click", 1))
            .cast("long")
            .alias("n_clicks"),
            (
                F.count(F.when(F.col("event_type") == "purchase", 1))
                > F.count(F.when(F.col("event_type") == "click", 1))
            )
            .cast("int")
            .alias("converted"),
        )
        .localCheckpoint(eager=False)
    )
    ranked = with_global_index(u, ["n_clicks", "user_id"], index_col="rk")
    nn = u.agg(F.count("*").alias("n"))
    return (
        ranked.crossJoin(F.broadcast(nn))
        .select(
            (F.expr("div((rk - 1) * 10, n)") + 1).alias("score_decile"),
            "converted",
        )
        .groupBy("score_decile")
        .agg(
            F.count("*").cast("long").alias("n_users"),
            F.sum("converted").cast("long").alias("n_converted"),
            F.when(
                F.count("*") > 0,
                F.expr("div(1000000 * sum(converted), count(1))"),
            ).alias("conv_rate_micro"),
        )
    )


@register(
    "q204_chisq_homogeneity",
    oracle="""
    WITH o AS (
      SELECT CASE WHEN dayofweek(ts) IN (0, 6) THEN 1 ELSE 0 END AS wk,
             event_type,
             CAST(count(*) AS BIGINT) AS o_cnt
      FROM events GROUP BY 1, 2),
    rt AS (SELECT wk, CAST(sum(o_cnt) AS BIGINT) AS r FROM o GROUP BY 1),
    ct AS (SELECT event_type,
                  CAST(sum(o_cnt) AS BIGINT) AS c FROM o GROUP BY 1),
    n AS (SELECT CAST(sum(o_cnt) AS BIGINT) AS n FROM o),
    terms AS (
      SELECT o.wk, o.event_type, o.o_cnt,
             CAST(round(
               (CAST(n.n AS DOUBLE) * o.o_cnt - CAST(rt.r AS DOUBLE) * ct.c)
               * (CAST(n.n AS DOUBLE) * o.o_cnt - CAST(rt.r AS DOUBLE) * ct.c)
               / (CAST(n.n AS DOUBLE) * rt.r * ct.c)
               * 1000000) AS BIGINT) AS t_micro
      FROM o
      JOIN rt ON rt.wk = o.wk
      JOIN ct ON ct.event_type = o.event_type
      CROSS JOIN n)
    SELECT CAST(count(*) AS BIGINT) AS n_cells,
           CAST((count(DISTINCT event_type) - 1)
                * (count(DISTINCT wk) - 1) AS BIGINT) AS dof,
           CAST(sum(t_micro) AS BIGINT) AS chisq_micro
    FROM terms
    """,
    doc="Chi-square homogeneity test: does the event-type mix differ "
    "between weekends and weekdays? (The categorical drift test "
    "beside q203's continuous PSI and q191's two-proportion z — "
    "together the standard monitoring battery.) Observed counts per "
    "(weekend-flag, type) cell; each cell's (O−E)²/E term is computed "
    "in the cleared-denominator form (n·O − r·c)²/(n·r·c) whose "
    "inputs are exact int64 converted once to double — identical "
    "operand sequences on both engines — and quantized to integer "
    "micro-units BEFORE the sum, so the statistic (χ² in 1e-6 units) "
    "is an exact integer total; dof = (types−1)·(groups−1) with both "
    "factors computed from the data, so a degenerate slice containing "
    "only one of the weekend/weekday groups correctly reports dof=0 "
    "(per-round ADVICE fix). One hash agg "
    "plus broadcast-size margins at any corpus scale. The weekend "
    "flag derives from dayofweek under the UTC-pinned session, "
    "mirrored exactly by DuckDB's dayofweek.",
    tags=("analytics", "chisq", "drift", "monitoring", "agg", "scale"),
)
def q204_chisq_homogeneity(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Spark dayofweek: Sunday=1..Saturday=7; DuckDB dayofweek:
    # Sunday=0..Saturday=6 — weekend = {Sun, Sat} either way
    o = (
        t(spark, sf_dir, "events")
        .groupBy(
            F.when(F.dayofweek("ts").isin(1, 7), 1)
            .otherwise(0)
            .alias("wk"),
            "event_type",
        )
        .agg(F.count("*").cast("long").alias("o_cnt"))
        .localCheckpoint(eager=False)
    )
    rt = o.groupBy("wk").agg(F.sum("o_cnt").cast("long").alias("r"))
    ct = o.groupBy("event_type").agg(
        F.sum("o_cnt").cast("long").alias("c")
    )
    n = o.agg(F.sum("o_cnt").cast("long").alias("n"))
    num = (
        F.col("n").cast("double") * F.col("o_cnt")
        - F.col("r").cast("double") * F.col("c")
    )
    terms = (
        o.join(F.broadcast(rt), "wk")
        .join(F.broadcast(ct), "event_type")
        .crossJoin(F.broadcast(n))
        .select(
            "event_type",
            "wk",
            F.round(
                num * num
                / (F.col("n").cast("double") * F.col("r") * F.col("c"))
                * 1000000.0
            )
            .cast("long")
            .alias("t_micro"),
        )
    )
    return terms.agg(
        F.count("*").cast("long").alias("n_cells"),
        (
            (F.countDistinct("event_type") - 1)
            * (F.countDistinct("wk") - 1)
        )
        .cast("long")
        .alias("dof"),
        F.sum("t_micro").cast("long").alias("chisq_micro"),
    )


# --- q216: Mann-Whitney U (nonparametric two-sample test) ------------------


@register(
    "q216_mann_whitney",
    oracle="""
    WITH ev AS (
      SELECT value,
             CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS g1
      FROM events WHERE event_type IN ('click', 'view')),
    grp AS (
      SELECT value, CAST(count(*) AS BIGINT) AS cnt,
             CAST(sum(g1) AS BIGINT) AS cnt1
      FROM ev GROUP BY 1),
    cum AS (
      SELECT value, cnt, cnt1,
             CAST(coalesce(sum(cnt) OVER (ORDER BY value
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS BIGINT) AS cnt_lt
      FROM grp),
    s AS (
      SELECT CAST(sum(cnt1) AS BIGINT) AS n1,
             CAST(sum(cnt) - sum(cnt1) AS BIGINT) AS n2,
             CAST(sum(cnt) AS BIGINT) AS n,
             CAST(round(sum(CAST(cnt1 AS DOUBLE) * (2 * cnt_lt + cnt + 1)))
               AS BIGINT) AS r1_x2,
             CAST(round(sum(CAST(cnt AS DOUBLE) * cnt * cnt - cnt))
               AS BIGINT) AS tie_term
      FROM cum)
    SELECT n1, n2,
           CAST(round(r1_x2 - CAST(n1 AS DOUBLE) * (n1 + 1)) AS BIGINT)
             AS u1_x2,
           tie_term,
           CAST(round(1000000.0
             * ((r1_x2 - CAST(n1 AS DOUBLE) * (n1 + 1)
                 - CAST(n1 AS DOUBLE) * n2) / 2.0)
             / sqrt((CAST(n1 AS DOUBLE) * n2 / 12.0)
                    * ((n + 1.0) - CAST(tie_term AS DOUBLE)
                       / (CAST(n AS DOUBLE) * (n - 1.0))))) AS BIGINT)
             AS z_micro
    FROM s
    """,
    doc="MANN-WHITNEY U — the nonparametric two-sample test every "
    "eval battery reaches for when metric distributions are skewed "
    "and a t/z test on means lies (complements q191's proportion "
    "z-test and q204's chi-square): does 'click' event value "
    "stochastically dominate 'view'? Rank machinery with NO per-row "
    "global sort: group by exact value first (the q167 CDF shape), "
    "then ONE running-sum window over the distinct-value histogram "
    "gives every value's midrank as 2*cnt_lt + cnt + 1 (doubled to "
    "stay integer); R1, U1 and the tie correction sum(t^3 - t) come "
    "from a single agg with every count product evaluated in DOUBLE "
    "(the q255/q289 overflow rule: cnt_lt ~ N and t^3 wrap int64 at "
    "scale; integer-valued double sums stay exact below 2^53, and "
    "round() before the BIGINT cast closes the Spark-truncates vs "
    "DuckDB-rounds gap). The z arithmetic is one shared expression "
    "whose only libm call is the IEEE-exact sqrt, quantized to "
    "micro-units (q191 discipline). Scale: state is the value histogram, not the "
    "event stream; the one global window runs over distinct values "
    "(range-partitionable exactly like q147's distributed sort).",
    tags=("analytics", "stats", "ab-test", "rank", "window", "scale"),
)
def q216_mann_whitney(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = (
        t(spark, sf_dir, "events")
        .filter(F.col("event_type").isin("click", "view"))
        .select(
            "value",
            (F.col("event_type") == "click").cast("long").alias("g1"),
        )
    )
    grp = ev.groupBy("value").agg(
        F.count(F.lit(1)).cast("long").alias("cnt"),
        F.sum("g1").cast("long").alias("cnt1"),
    )
    win = Window.orderBy("value").rowsBetween(
        Window.unboundedPreceding, -1
    )
    cum = grp.withColumn(
        "cnt_lt",
        F.coalesce(F.sum("cnt").over(win), F.lit(0)).cast("long"),
    )
    s = cum.agg(
        F.sum("cnt1").cast("long").alias("n1"),
        (F.sum("cnt") - F.sum("cnt1")).cast("long").alias("n2"),
        F.sum("cnt").cast("long").alias("n"),
        # per-row rank/tie products evaluate in DOUBLE (the q255/q289
        # overflow rule: cnt_lt ~ N and cnt^3 wrap int64 at ~2e6-tie
        # groups / ~3e9 rows); integer-valued double sums stay EXACT
        # below 2^53, and round() before the cast closes the Spark-
        # truncates vs DuckDB-rounds CAST gap
        F.round(
            F.sum(
                F.col("cnt1").cast("double")
                * (2 * F.col("cnt_lt") + F.col("cnt") + 1)
            )
        )
        .cast("long")
        .alias("r1_x2"),
        F.round(
            F.sum(
                F.col("cnt").cast("double") * F.col("cnt") * F.col("cnt")
                - F.col("cnt")
            )
        )
        .cast("long")
        .alias("tie_term"),
    )
    u1_x2 = F.col("r1_x2") - F.col("n1").cast("double") * (F.col("n1") + 1)
    num = (u1_x2 - F.col("n1").cast("double") * F.col("n2")) / F.lit(2.0)
    var = (
        F.col("n1").cast("double") * F.col("n2") / F.lit(12.0)
    ) * (
        (F.col("n") + F.lit(1.0))
        - F.col("tie_term").cast("double")
        / (F.col("n").cast("double") * (F.col("n") - F.lit(1.0)))
    )
    return s.select(
        "n1",
        "n2",
        F.round(u1_x2).cast("long").alias("u1_x2"),
        "tie_term",
        F.round(F.lit(1000000.0) * num / F.sqrt(var))
        .cast("long")
        .alias("z_micro"),
    )


# --- q217: Kruskal-Wallis H (k-group rank test) ----------------------------


@register(
    "q217_kruskal_wallis",
    oracle="""
    WITH vh AS (
      SELECT value, CAST(count(*) AS BIGINT) AS cnt
      FROM events GROUP BY 1),
    cum AS (
      SELECT value, cnt,
             CAST(coalesce(sum(cnt) OVER (ORDER BY value
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS BIGINT) AS cnt_lt
      FROM vh),
    gj AS (
      SELECT value, event_type, CAST(count(*) AS BIGINT) AS cnt_g
      FROM events GROUP BY 1, 2),
    rj AS (
      SELECT gj.event_type,
             CAST(sum(gj.cnt_g) AS BIGINT) AS n_j,
             CAST(round(sum(CAST(gj.cnt_g AS DOUBLE)
                            * (2 * c.cnt_lt + c.cnt + 1))) AS BIGINT)
               AS r_j_x2
      FROM gj JOIN cum c ON gj.value = c.value
      GROUP BY 1),
    nn AS (SELECT CAST(sum(n_j) AS BIGINT) AS n,
                  CAST(count(*) AS BIGINT) AS k
           FROM rj),
    terms AS (
      SELECT rj.event_type, rj.n_j,
             CAST(round(1000000.0
               * ((CAST(rj.r_j_x2 AS DOUBLE) * CAST(rj.r_j_x2 AS DOUBLE))
                  / (4.0 * rj.n_j))
               / (CAST(nn.n AS DOUBLE) * (nn.n + 1.0))) AS BIGINT)
               AS term_micro
      FROM rj, nn),
    s AS (
      SELECT CAST(sum(term_micro) AS BIGINT) AS sum_term_micro
      FROM terms),
    ties AS (
      SELECT CAST(round(sum(CAST(cnt AS DOUBLE) * cnt * cnt - cnt))
               AS BIGINT) AS tie_term
      FROM vh)
    SELECT nn.n, nn.k, ties.tie_term,
           CAST(round(1000000.0
             * (12.0 * (CAST(s.sum_term_micro AS DOUBLE) / 1000000.0)
                - 3.0 * (nn.n + 1.0))) AS BIGINT) AS h_micro,
           CAST(round(1000000.0
             * (12.0 * (CAST(s.sum_term_micro AS DOUBLE) / 1000000.0)
                - 3.0 * (nn.n + 1.0))
             / (1.0 - CAST(ties.tie_term AS DOUBLE)
                / (CAST(nn.n AS DOUBLE) * nn.n * nn.n - nn.n))) AS BIGINT)
             AS h_corr_micro
    FROM s, ties, nn
    """,
    doc="KRUSKAL-WALLIS H — the k-group generalization of q216's "
    "Mann-Whitney (one-way ANOVA on midranks): do the five event "
    "types draw value from the same distribution? Same "
    "value-histogram midrank machinery (2*cnt_lt + cnt + 1, doubled "
    "to stay integer; one running-sum window over DISTINCT values, "
    "never a per-row global sort), per-group rank sums R_j and the "
    "tie correction sum(t^3 - t) with count products in DOUBLE + "
    "round-before-cast (the q216 overflow discipline; exact below "
    "2^53). The "
    "per-group R_j^2/(4 n_j) terms are pre-scaled by 1/(N(N+1)) — "
    "H's natural scale; raw-term micro-units overflow int64 past "
    "~100k rows — and THEN quantized to integer micro-units BEFORE "
    "the cross-group sum: a 5-double FP sum has engine-dependent "
    "association, an int64 sum does not (the repo's ln-quantization "
    "discipline applied to a sum of squares; the quantization is "
    "part of the operator definition, |dH| <= 6k micro-units, and "
    "the int64 bound now holds to N*n_j < 3.7e13); H and its "
    "tie-corrected form then use only exact-operand ops. Scale: everything downstream of the event "
    "scan is histogram-sized; the one global window "
    "range-partitions like q147.",
    tags=("analytics", "stats", "rank", "window", "agg", "scale"),
)
def q217_kruskal_wallis(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = t(spark, sf_dir, "events")
    vh = ev.groupBy("value").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    win = Window.orderBy("value").rowsBetween(
        Window.unboundedPreceding, -1
    )
    cum = vh.withColumn(
        "cnt_lt",
        F.coalesce(F.sum("cnt").over(win), F.lit(0)).cast("long"),
    )
    gj = ev.groupBy("value", "event_type").agg(
        F.count(F.lit(1)).cast("long").alias("cnt_g")
    )
    rj = (
        gj.join(cum.select("value", "cnt", "cnt_lt"), "value")
        .groupBy("event_type")
        .agg(
            F.sum("cnt_g").cast("long").alias("n_j"),
            # rank products in DOUBLE + round-before-cast (the q216
            # overflow discipline: cnt_lt ~ N wraps int64 at ~3e9 rows)
            F.round(
                F.sum(
                    F.col("cnt_g").cast("double")
                    * (2 * F.col("cnt_lt") + F.col("cnt") + 1)
                )
            )
            .cast("long")
            .alias("r_j_x2"),
        )
    )
    nn = rj.agg(
        F.sum("n_j").cast("long").alias("n"),
        F.count(F.lit(1)).cast("long").alias("k"),
    )
    terms = rj.crossJoin(F.broadcast(nn)).withColumn(
        "term_micro",
        F.round(
            F.lit(1000000.0)
            * (
                (
                    F.col("r_j_x2").cast("double")
                    * F.col("r_j_x2").cast("double")
                )
                / (F.lit(4.0) * F.col("n_j"))
            )
            / (F.col("n").cast("double") * (F.col("n") + F.lit(1.0)))
        ).cast("long"),
    )
    s = terms.agg(
        F.sum("term_micro").cast("long").alias("sum_term_micro")
    )
    ties = vh.agg(
        F.round(
            F.sum(
                F.col("cnt").cast("double") * F.col("cnt") * F.col("cnt")
                - F.col("cnt")
            )
        )
        .cast("long")
        .alias("tie_term")
    )
    h = F.lit(12.0) * (
        F.col("sum_term_micro").cast("double") / F.lit(1000000.0)
    ) - F.lit(3.0) * (F.col("n") + F.lit(1.0))
    corr = F.lit(1.0) - F.col("tie_term").cast("double") / (
        F.col("n").cast("double") * F.col("n") * F.col("n") - F.col("n")
    )
    return s.crossJoin(ties).crossJoin(F.broadcast(nn)).select(
        "n",
        "k",
        "tie_term",
        F.round(F.lit(1000000.0) * h).cast("long").alias("h_micro"),
        F.round(F.lit(1000000.0) * h / corr)
        .cast("long")
        .alias("h_corr_micro"),
    )


# --- q218: reciprocal-rank fusion ------------------------------------------


@register(
    "q218_rrf_fusion",
    oracle="""
    WITH agg AS (
      SELECT event_type, user_id,
             CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
               AS s_cents,
             CAST(count(*) AS BIGINT) AS n_ev
      FROM events GROUP BY 1, 2),
    rk AS (
      SELECT event_type, user_id,
             row_number() OVER (PARTITION BY event_type
               ORDER BY s_cents DESC, user_id) AS ra,
             row_number() OVER (PARTITION BY event_type
               ORDER BY n_ev DESC, user_id) AS rb
      FROM agg),
    fused AS (
      SELECT event_type, user_id,
             CAST(round(1000000.0 / (60 + ra))
                  + round(1000000.0 / (60 + rb)) AS BIGINT)
               AS fused_micro
      FROM rk)
    SELECT event_type, user_id, fused_micro,
           CAST(fused_rank AS BIGINT) AS fused_rank
    FROM (
      SELECT event_type, user_id, fused_micro,
             row_number() OVER (PARTITION BY event_type
               ORDER BY fused_micro DESC, user_id) AS fused_rank
      FROM fused)
    WHERE fused_rank <= 20
    """,
    doc="RECIPROCAL-RANK FUSION (Cormack et al. 2009 — the standard "
    "zero-tuning way to merge heterogeneous rankings; every hybrid "
    "retrieval stack fuses lexical + vector lists exactly like "
    "this): per event type, rank users by total value and, "
    "independently, by event count, then fuse with "
    "score = sum 1/(60 + rank) and report the top 20. Exactness: "
    "value totals are quantized to integer cents BEFORE summation "
    "(FP sums have engine-dependent association; int64 sums do "
    "not), ranks tie-break on user_id so every row_number is "
    "deterministic, and each 1/(60+r) term is rounded to integer "
    "micro-units before the two-term add — the fused score is an "
    "exact integer on both engines. Plan: one user-keyed partial/"
    "final hash agg, three event_type-partitioned windows over the "
    "per-user relation (users-per-type sized, not event sized); at "
    "scale the final top-20 prunes with a per-partition top-k "
    "(q17's shape) before the window.",
    tags=("analytics", "ranking", "fusion", "window", "scale"),
)
def q218_rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    agg = (
        t(spark, sf_dir, "events")
        .groupBy("event_type", "user_id")
        .agg(
            F.sum(F.round(F.col("value") * 100).cast("long"))
            .cast("long")
            .alias("s_cents"),
            F.count(F.lit(1)).cast("long").alias("n_ev"),
        )
    )
    wa = Window.partitionBy("event_type").orderBy(
        F.col("s_cents").desc(), "user_id"
    )
    wb = Window.partitionBy("event_type").orderBy(
        F.col("n_ev").desc(), "user_id"
    )
    fused = (
        agg.withColumn("ra", F.row_number().over(wa))
        .withColumn("rb", F.row_number().over(wb))
        .select(
            "event_type",
            "user_id",
            (
                F.round(F.lit(1000000.0) / (F.lit(60) + F.col("ra")))
                + F.round(F.lit(1000000.0) / (F.lit(60) + F.col("rb")))
            )
            .cast("long")
            .alias("fused_micro"),
        )
    )
    wf = Window.partitionBy("event_type").orderBy(
        F.col("fused_micro").desc(), "user_id"
    )
    return (
        fused.withColumn("fused_rank", F.row_number().over(wf))
        .filter(F.col("fused_rank") <= 20)
        .select(
            "event_type",
            "user_id",
            "fused_micro",
            F.col("fused_rank").cast("long").alias("fused_rank"),
        )
    )


# --- q219: consistent-hash shard layout ------------------------------------

_CH_V = 64  # virtual nodes per shard


def _ch_sql_ring(k: int) -> str:
    return f"""
      SELECT s.range AS shard,
             CAST(('0x' || substr(md5(CAST(s.range AS VARCHAR) || ':'
                   || CAST(v.range AS VARCHAR)), 1, 15)) AS BIGINT) AS pt
      FROM range(0, {k}) s, range(0, {_CH_V}) v"""


@register(
    "q219_consistent_hash",
    oracle=f"""
    WITH r16 AS ({_ch_sql_ring(16)}),
    r17 AS ({_ch_sql_ring(17)}),
    l16 AS (SELECT list(pt) AS pts, min(pt) AS mn FROM r16),
    l17 AS (SELECT list(pt) AS pts, min(pt) AS mn FROM r17),
    d AS (
      SELECT doc_id,
             CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))
                  AS BIGINT) AS dp
      FROM documents),
    a AS (
      SELECT d.doc_id, d.dp,
             coalesce(list_min(list_filter(l16.pts, p -> p >= d.dp)),
                      l16.mn) AS s16,
             coalesce(list_min(list_filter(l17.pts, p -> p >= d.dp)),
                      l17.mn) AS s17
      FROM d, l16, l17),
    m AS (
      SELECT a.doc_id, a.dp,
             min(r16.shard) AS shard16, min(r17.shard) AS shard17
      FROM a JOIN r16 ON r16.pt = a.s16 JOIN r17 ON r17.pt = a.s17
      GROUP BY 1, 2),
    s AS (
      SELECT CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(CASE WHEN shard16 <> shard17 THEN 1 ELSE 0 END)
                  AS BIGINT) AS moved_ch,
             CAST(sum(CASE WHEN dp % 16 <> dp % 17 THEN 1 ELSE 0 END)
                  AS BIGINT) AS moved_mod
      FROM m)
    SELECT n_docs, moved_ch, moved_mod,
           CAST(round(1000.0 * moved_ch / n_docs) AS BIGINT)
             AS ch_permille,
           CAST(round(1000.0 * moved_mod / n_docs) AS BIGINT)
             AS mod_permille
    FROM s
    """,
    doc="CONSISTENT-HASH shard layout with the minimal-movement "
    "property MEASURED — the data-layout question every growing "
    "corpus store faces (add one shard to 16: how much data moves?): "
    "docs and 64 virtual nodes per shard hash onto a 60-bit ring "
    "(the repo's md5 idiom), each doc lands on its clockwise "
    "successor vnode, and the query compares assignments under 16 "
    "vs 17 shards against naive mod-hashing. Consistent hashing "
    "moves ~1/17 of docs (only those whose successor is a new "
    "vnode); mod moves ~16/17 — both permille rates are exact "
    "integers from the same relation. Plan shape: the ring is a "
    "k*64-row relation folded to ONE sorted-list row and "
    "cross-joined (broadcast) — successor lookup is a per-doc "
    "list_filter/array_min over 1k entries in codegen, O(ring) "
    "map-side work with NO shuffle of the corpus; the pt -> shard "
    "resolution is a broadcast equi-join on the tiny ring. At 100 "
    "TB the ring is still 1k rows; everything scales with one "
    "corpus scan.",
    tags=("analytics", "layout", "hashing", "broadcast", "scale"),
)
def q219_consistent_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    def ring(k: int):
        return (
            spark.range(k)
            .withColumnRenamed("id", "shard")
            .crossJoin(
                spark.range(_CH_V).withColumnRenamed("id", "v")
            )
            .select(
                "shard",
                F.conv(
                    F.substring(
                        F.md5(
                            F.concat_ws(
                                ":",
                                F.col("shard").cast("string"),
                                F.col("v").cast("string"),
                            )
                        ),
                        1,
                        15,
                    ),
                    16,
                    10,
                )
                .cast("long")
                .alias("pt"),
            )
        )

    r16, r17 = ring(16), ring(17)
    l16 = r16.agg(
        F.array_sort(F.collect_list("pt")).alias("pts16"),
        F.min("pt").alias("mn16"),
    )
    l17 = r17.agg(
        F.array_sort(F.collect_list("pt")).alias("pts17"),
        F.min("pt").alias("mn17"),
    )
    d = t(spark, sf_dir, "documents").select(
        "doc_id",
        F.conv(
            F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15),
            16,
            10,
        )
        .cast("long")
        .alias("dp"),
    )
    a = (
        d.crossJoin(F.broadcast(l16))
        .crossJoin(F.broadcast(l17))
        .select(
            "doc_id",
            "dp",
            F.coalesce(
                F.array_min(
                    F.filter(
                        "pts16", lambda p: p >= F.col("dp")
                    )
                ),
                F.col("mn16"),
            ).alias("s16"),
            F.coalesce(
                F.array_min(
                    F.filter(
                        "pts17", lambda p: p >= F.col("dp")
                    )
                ),
                F.col("mn17"),
            ).alias("s17"),
        )
    )
    m = (
        a.join(
            F.broadcast(
                r16.select(
                    F.col("pt").alias("s16"),
                    F.col("shard").alias("sh16"),
                )
            ),
            "s16",
        )
        .join(
            F.broadcast(
                r17.select(
                    F.col("pt").alias("s17"),
                    F.col("shard").alias("sh17"),
                )
            ),
            "s17",
        )
        .groupBy("doc_id", "dp")
        .agg(
            F.min("sh16").alias("shard16"),
            F.min("sh17").alias("shard17"),
        )
    )
    s = m.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(
            (F.col("shard16") != F.col("shard17")).cast("long")
        )
        .cast("long")
        .alias("moved_ch"),
        F.sum(
            (F.col("dp") % 16 != F.col("dp") % 17).cast("long")
        )
        .cast("long")
        .alias("moved_mod"),
    )
    return s.select(
        "n_docs",
        "moved_ch",
        "moved_mod",
        F.round(F.lit(1000.0) * F.col("moved_ch") / F.col("n_docs"))
        .cast("long")
        .alias("ch_permille"),
        F.round(F.lit(1000.0) * F.col("moved_mod") / F.col("n_docs"))
        .cast("long")
        .alias("mod_permille"),
    )


# --- q227: Benford first-digit test ----------------------------------------


@register(
    "q227_benford_digits",
    oracle="""
    WITH d AS (
      SELECT CAST(substr(CAST(CAST(round(l_extendedprice * 100) AS BIGINT)
                   AS VARCHAR), 1, 1) AS BIGINT) AS digit
      FROM lineitem),
    obs AS (
      SELECT digit, CAST(count(*) AS BIGINT) AS n_obs
      FROM d GROUP BY 1),
    n AS (SELECT CAST(sum(n_obs) AS BIGINT) AS n FROM obs),
    grid AS (
      SELECT g.range AS digit,
             CAST(round(1000000.0
               * (ln(1.0 + 1.0 / g.range) / ln(10.0))) AS BIGINT)
               AS p_micro
      FROM range(1, 10) g),
    terms AS (
      SELECT grid.digit,
             CAST(coalesce(obs.n_obs, 0) AS BIGINT) AS n_obs,
             grid.p_micro,
             CAST(round(1000000.0
               * (CAST(coalesce(obs.n_obs, 0) AS DOUBLE)
                  - CAST(n.n AS DOUBLE) * grid.p_micro / 1000000.0)
               * (CAST(coalesce(obs.n_obs, 0) AS DOUBLE)
                  - CAST(n.n AS DOUBLE) * grid.p_micro / 1000000.0)
               / (CAST(n.n AS DOUBLE) * grid.p_micro / 1000000.0))
               AS BIGINT) AS chi_term_micro
      FROM grid LEFT JOIN obs ON grid.digit = obs.digit, n)
    SELECT digit, n_obs, p_micro, chi_term_micro FROM terms
    UNION ALL
    SELECT CAST(0 AS BIGINT), n.n, NULL,
           CAST(sum(chi_term_micro) AS BIGINT)
    FROM terms, n GROUP BY n.n
    """,
    doc="BENFORD FIRST-DIGIT test over line-item prices — the "
    "fraud/synthetic-data screen (organically-grown monetary values "
    "follow P(d) = log10(1 + 1/d); fabricated or uniformly-generated "
    "values don't, and a chi-square against the Benford grid flags "
    "the table — a standard data-forensics gate before ingesting a "
    "third-party financial table). First digit comes from "
    "INTEGER-to-string of the cent-quantized price (no log10-floor "
    "digit extraction, whose libm boundary at exact powers of ten "
    "flips digits between engines); expected probabilities are "
    "ln-derived but micro-quantized (q203 discipline), and each "
    "digit's chi term is quantized before the 9-term sum. Output: "
    "one row per digit plus the chi-square total row (digit 0). "
    "Uniformly-generated testdata prices FAIL Benford loudly — the "
    "screen's positive path. One hash agg over the scan; the grid "
    "is 9 rows at any scale.",
    tags=("analytics", "quality", "benford", "agg", "scale"),
)
def q227_benford_digits(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "lineitem").select(
        F.substring(
            F.round(F.col("l_extendedprice") * 100)
            .cast("long")
            .cast("string"),
            1,
            1,
        )
        .cast("long")
        .alias("digit")
    )
    obs = d.groupBy("digit").agg(
        F.count(F.lit(1)).cast("long").alias("n_obs")
    )
    n = obs.agg(F.sum("n_obs").cast("long").alias("n"))
    grid = spark.range(1, 10).select(
        F.col("id").alias("digit"),
        F.round(
            F.lit(1000000.0)
            * (
                F.log(F.lit(1.0) + F.lit(1.0) / F.col("id"))
                / F.log(F.lit(10.0))
            )
        )
        .cast("long")
        .alias("p_micro"),
    )
    e = F.col("n").cast("double") * F.col("p_micro") / F.lit(1000000.0)
    o = F.coalesce(F.col("n_obs"), F.lit(0)).cast("double")
    terms = (
        grid.join(obs, "digit", "left")
        .crossJoin(F.broadcast(n))
        .select(
            "digit",
            F.coalesce(F.col("n_obs"), F.lit(0))
            .cast("long")
            .alias("n_obs"),
            "p_micro",
            F.round(F.lit(1000000.0) * (o - e) * (o - e) / e)
            .cast("long")
            .alias("chi_term_micro"),
        )
    )
    total = terms.crossJoin(F.broadcast(n)).groupBy("n").agg(
        F.lit(0).cast("long").alias("digit"),
        F.lit(None).cast("long").alias("p_micro"),
        F.sum("chi_term_micro").cast("long").alias("chi_term_micro"),
    ).select(
        "digit",
        F.col("n").cast("long").alias("n_obs"),
        "p_micro",
        "chi_term_micro",
    )
    return terms.unionByName(total)


# --- q228: two-sample Kolmogorov-Smirnov test ------------------------------


@register(
    "q228_ks_test",
    oracle="""
    WITH ev AS (
      SELECT value,
             CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS g1
      FROM events WHERE event_type IN ('click', 'view')),
    grp AS (
      SELECT value, CAST(count(*) AS BIGINT) AS cnt,
             CAST(sum(g1) AS BIGINT) AS cnt1
      FROM ev GROUP BY 1),
    cum AS (
      SELECT CAST(sum(cnt1) OVER (ORDER BY value
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS c1,
             CAST(sum(cnt) OVER (ORDER BY value
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS call
      FROM grp),
    tot AS (
      SELECT CAST(sum(cnt1) AS BIGINT) AS n1,
             CAST(sum(cnt) - sum(cnt1) AS BIGINT) AS n2
      FROM grp),
    d AS (
      SELECT CAST(round(max(abs(CAST(c1 AS DOUBLE) * t.n2
                 - (call - c1) * CAST(t.n1 AS DOUBLE)))) AS BIGINT)
               AS d_num
      FROM cum, tot t)
    SELECT t.n1, t.n2, d.d_num,
           CAST(round(1000000.0 * (CAST(d.d_num AS DOUBLE)
             / (CAST(t.n1 AS DOUBLE) * t.n2))) AS BIGINT) AS d_micro,
           CAST(round(1000000.0
             * (CAST(d.d_num AS DOUBLE) / (CAST(t.n1 AS DOUBLE) * t.n2))
             * sqrt((CAST(t.n1 AS DOUBLE) * t.n2)
                    / CAST(t.n1 + t.n2 AS DOUBLE))) AS BIGINT)
             AS lambda_micro,
           CAST(round(1000000.0 * 2.0 * exp(-2.0
             * ((CAST(d.d_num AS DOUBLE) / (CAST(t.n1 AS DOUBLE) * t.n2))
                * sqrt((CAST(t.n1 AS DOUBLE) * t.n2)
                       / CAST(t.n1 + t.n2 AS DOUBLE)))
             * ((CAST(d.d_num AS DOUBLE) / (CAST(t.n1 AS DOUBLE) * t.n2))
                * sqrt((CAST(t.n1 AS DOUBLE) * t.n2)
                       / CAST(t.n1 + t.n2 AS DOUBLE)))))
             AS BIGINT) AS p_approx_micro
    FROM d, tot t
    """,
    doc="TWO-SAMPLE KOLMOGOROV-SMIRNOV — the shape-sensitive "
    "complement to q216's Mann-Whitney (MW detects location shift; "
    "KS catches any ECDF divergence: variance, bimodality, tail "
    "inflation — the standard distribution-drift gate between a "
    "treatment and control metric stream). D = max|F1-F2| computed "
    "EXACTLY in integers: per distinct value, inclusive cumulative "
    "counts c1/call from one running-sum window over the value "
    "histogram (the q216 shape), and |c1*n2 - c2*n1| is an int64 "
    "whose max over values is D*n1*n2 with zero float error. The "
    "asymptotic lambda = D*sqrt(n1*n2/(n1+n2)) uses only the "
    "IEEE-exact sqrt on identical operands; the one-term "
    "Kolmogorov tail 2*exp(-2*lambda^2) is the single libm exp, "
    "quantized at output (the q203 ln discipline applied to exp). "
    "Scale: state is the distinct-value histogram, the global "
    "window range-partitions like q147's sort, everything else is "
    "one-row broadcast arithmetic.",
    tags=("analytics", "stats", "ab-test", "drift", "window", "scale"),
)
def q228_ks_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = (
        t(spark, sf_dir, "events")
        .filter(F.col("event_type").isin("click", "view"))
        .select(
            "value",
            (F.col("event_type") == "click").cast("long").alias("g1"),
        )
    )
    grp = ev.groupBy("value").agg(
        F.count(F.lit(1)).cast("long").alias("cnt"),
        F.sum("g1").cast("long").alias("cnt1"),
    )
    win = Window.orderBy("value").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = grp.select(
        F.sum("cnt1").over(win).cast("long").alias("c1"),
        F.sum("cnt").over(win).cast("long").alias("call"),
    )
    tot = grp.agg(
        F.sum("cnt1").cast("long").alias("n1"),
        (F.sum("cnt") - F.sum("cnt1")).cast("long").alias("n2"),
    )
    d = (
        cum.crossJoin(F.broadcast(tot))
        .agg(
            # CDF cross-products in DOUBLE + round-before-cast (the
            # q216 overflow discipline: c1*n2 ~ N^2 wraps at ~3e9 rows)
            F.round(
                F.max(
                    F.abs(
                        F.col("c1").cast("double") * F.col("n2")
                        - (F.col("call") - F.col("c1"))
                        * F.col("n1").cast("double")
                    )
                )
            )
            .cast("long")
            .alias("d_num")
        )
    )
    dd = F.col("d_num").cast("double") / (
        F.col("n1").cast("double") * F.col("n2")
    )
    lam = dd * F.sqrt(
        (F.col("n1").cast("double") * F.col("n2"))
        / (F.col("n1") + F.col("n2")).cast("double")
    )
    return d.crossJoin(F.broadcast(tot)).select(
        "n1",
        "n2",
        "d_num",
        F.round(F.lit(1000000.0) * dd).cast("long").alias("d_micro"),
        F.round(F.lit(1000000.0) * lam).cast("long").alias(
            "lambda_micro"
        ),
        F.round(
            F.lit(1000000.0) * 2.0 * F.exp(F.lit(-2.0) * lam * lam)
        )
        .cast("long")
        .alias("p_approx_micro"),
    )


# --- q229: Spearman rank correlation per group -----------------------------


@register(
    "q229_spearman",
    oracle="""
    WITH d AS (
      SELECT lang, CAST(n_chars AS BIGINT) AS x,
             CAST(len(list_distinct(list_filter(
               regexp_split_to_array(lower(text), '[^a-z0-9]+'),
               t -> t <> ''))) AS BIGINT) AS y
      FROM documents),
    r AS (
      SELECT lang,
             CAST(2 * rank() OVER (PARTITION BY lang ORDER BY x)
               + count(*) OVER (PARTITION BY lang, x) - 1
               AS BIGINT) AS rx2,
             CAST(2 * rank() OVER (PARTITION BY lang ORDER BY y)
               + count(*) OVER (PARTITION BY lang, y) - 1
               AS BIGINT) AS ry2
      FROM d),
    s AS (
      SELECT lang,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(rx2) AS BIGINT) AS sx,
             CAST(sum(ry2) AS BIGINT) AS sy,
             CAST(sum(rx2 * ry2) AS BIGINT) AS sxy,
             CAST(sum(rx2 * rx2) AS BIGINT) AS sxx,
             CAST(sum(ry2 * ry2) AS BIGINT) AS syy
      FROM r GROUP BY 1)
    SELECT lang, n,
           CAST(round(1000000.0
             * ((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
                / sqrt((CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
                       * (CAST(n AS DOUBLE) * syy
                          - CAST(sy AS DOUBLE) * sy))))
             AS BIGINT) AS rho_micro
    FROM s ORDER BY lang
    """,
    doc="SPEARMAN RANK CORRELATION per language — the monotone-"
    "association screen between two per-document signals (here "
    "document length vs distinct-token count): robust to outliers "
    "and nonlinearity where Pearson is not, it is the standard "
    "redundancy check before adding a new quality signal to a "
    "training-data filter stack. Tie handling is exact midranks, "
    "DOUBLED to stay integer: 2*avgrank = 2*rank() + ties - 1 from "
    "two per-group windows (the q216 midrank identity, no value-"
    "histogram join needed), then Pearson over the integer doubled "
    "ranks — all five sums are exact int64 per group; the rho "
    "numerator/denominator combine in DOUBLE (n*sxy overflows int64 "
    "at ~1e9 docs/group; identical-operand FP is bit-identical "
    "cross-engine, q221 discipline) with the one IEEE-exact sqrt. "
    "Scale: windows partition by (lang) and (lang, value) — no "
    "global window; per-group state is five int64 cells.",
    tags=("analytics", "stats", "rank", "correlation", "window",
          "scale"),
)
def q229_spearman(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    d = t(spark, sf_dir, "documents").select(
        "lang",
        F.col("n_chars").cast("long").alias("x"),
        F.size(F.array_distinct(tokens("text"))).cast("long").alias("y"),
    )
    rx2 = (
        2 * F.rank().over(Window.partitionBy("lang").orderBy("x"))
        + F.count(F.lit(1)).over(Window.partitionBy("lang", "x"))
        - 1
    ).cast("long")
    ry2 = (
        2 * F.rank().over(Window.partitionBy("lang").orderBy("y"))
        + F.count(F.lit(1)).over(Window.partitionBy("lang", "y"))
        - 1
    ).cast("long")
    r = d.select("lang", rx2.alias("rx2"), ry2.alias("ry2"))
    s = r.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("rx2").cast("long").alias("sx"),
        F.sum("ry2").cast("long").alias("sy"),
        F.sum(F.col("rx2") * F.col("ry2")).cast("long").alias("sxy"),
        F.sum(F.col("rx2") * F.col("rx2")).cast("long").alias("sxx"),
        F.sum(F.col("ry2") * F.col("ry2")).cast("long").alias("syy"),
    )
    num = (
        F.col("n").cast("double") * F.col("sxy")
        - F.col("sx").cast("double") * F.col("sy")
    )
    den = F.sqrt(
        (
            F.col("n").cast("double") * F.col("sxx")
            - F.col("sx").cast("double") * F.col("sx")
        )
        * (
            F.col("n").cast("double") * F.col("syy")
            - F.col("sy").cast("double") * F.col("sy")
        )
    )
    return s.select(
        "lang",
        "n",
        F.round(F.lit(1000000.0) * (num / den))
        .cast("long")
        .alias("rho_micro"),
    ).orderBy("lang")


# --- q234: per-group OLS with R^2 ------------------------------------------


@register(
    "q234_grouped_ols",
    oracle="""
    WITH d AS (
      SELECT lang,
             CAST(len(list_filter(regexp_split_to_array(lower(text),
                  '[^a-z0-9]+'), t -> t <> '')) AS BIGINT) AS x,
             CAST(n_chars AS BIGINT) AS y
      FROM documents),
    s AS (
      SELECT lang,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x) AS BIGINT) AS sx,
             CAST(sum(y) AS BIGINT) AS sy,
             CAST(sum(x * y) AS BIGINT) AS sxy,
             CAST(sum(x * x) AS BIGINT) AS sxx,
             CAST(sum(y * y) AS BIGINT) AS syy
      FROM d GROUP BY 1)
    SELECT lang, n,
           CAST(round(1000000.0
             * ((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
                / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)))
             AS BIGINT) AS slope_micro,
           CAST(round(1000000.0
             * ((CAST(sy AS DOUBLE)
                 - ((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
                    / (CAST(n AS DOUBLE) * sxx
                       - CAST(sx AS DOUBLE) * sx)) * sx)
                / CAST(n AS DOUBLE))) AS BIGINT) AS intercept_micro,
           CAST(round(1000000.0
             * (((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
                 * (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy))
                / ((CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
                   * (CAST(n AS DOUBLE) * syy
                      - CAST(sy AS DOUBLE) * sy))))
             AS BIGINT) AS r2_micro
    FROM s ORDER BY lang
    """,
    doc="PER-GROUP OLS with R^2 — grouped simple regression (chars "
    "per token by language: the calibration line behind q215's "
    "fertility ratios, with the goodness-of-fit the ratio alone "
    "hides; complements q221's global log-log fit). Moment "
    "machinery: the six sums are exact int64 per group from ONE "
    "map-side-combinable hash agg; slope, intercept and R^2 = "
    "num^2/(denx*deny) combine those sums in DOUBLE in the "
    "projection (n*sxy overflows int64 at ~1e9 docs/group; "
    "identical-operand FP is bit-identical cross-engine, q221 "
    "discipline) — no second pass over the data, no window. "
    "Scale: one agg, #langs output rows, nothing else.",
    tags=("analytics", "stats", "regression", "agg", "scale"),
)
def q234_grouped_ols(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents").select(
        "lang",
        F.size(tokens("text")).cast("long").alias("x"),
        F.col("n_chars").cast("long").alias("y"),
    )
    s = d.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("long").alias("syy"),
    )
    nd = F.col("n").cast("double")
    num = nd * F.col("sxy") - F.col("sx").cast("double") * F.col("sy")
    denx = nd * F.col("sxx") - F.col("sx").cast("double") * F.col("sx")
    deny = nd * F.col("syy") - F.col("sy").cast("double") * F.col("sy")
    slope = num / denx
    return s.select(
        "lang",
        "n",
        F.round(F.lit(1000000.0) * slope).cast("long").alias(
            "slope_micro"
        ),
        F.round(
            F.lit(1000000.0)
            * ((F.col("sy").cast("double") - slope * F.col("sx")) / nd)
        )
        .cast("long")
        .alias("intercept_micro"),
        F.round(F.lit(1000000.0) * ((num * num) / (denx * deny)))
        .cast("long")
        .alias("r2_micro"),
    ).orderBy("lang")


# --- q237: Theil's U (uncertainty coefficient) -----------------------------


@register(
    "q237_theil_u",
    oracle="""
    WITH c AS (
      SELECT lang, source, CAST(count(*) AS BIGINT) AS cls
      FROM documents GROUP BY 1, 2),
    cl AS (SELECT lang, CAST(sum(cls) AS BIGINT) AS cl
           FROM c GROUP BY 1),
    cs AS (SELECT source, CAST(sum(cls) AS BIGINT) AS cs
           FROM c GROUP BY 1),
    n AS (SELECT CAST(sum(cls) AS BIGINT) AS n FROM c),
    a AS (
      SELECT
        (SELECT CAST(sum(cs * CAST(round(1000000.0
           * ln(CAST(cs AS DOUBLE))) AS BIGINT)) AS BIGINT) FROM cs)
          AS a_s,
        (SELECT CAST(sum(cl * CAST(round(1000000.0
           * ln(CAST(cl AS DOUBLE))) AS BIGINT)) AS BIGINT) FROM cl)
          AS a_l,
        (SELECT CAST(sum(cls * CAST(round(1000000.0
           * ln(CAST(cls AS DOUBLE))) AS BIGINT)) AS BIGINT) FROM c)
          AS a_ls,
        (SELECT CAST(round(1000000.0 * ln(CAST(n AS DOUBLE)))
           AS BIGINT) FROM n) AS lq_n,
        (SELECT n FROM n) AS n)
    SELECT n,
           CAST(round(lq_n - CAST(a_s AS DOUBLE) / n) AS BIGINT)
             AS h_s_micro,
           CAST(round((CAST(a_l AS DOUBLE) - a_ls) / n) AS BIGINT)
             AS h_cond_micro,
           CAST(round(1000000.0
             * (((lq_n - CAST(a_s AS DOUBLE) / n)
                 - (CAST(a_l AS DOUBLE) - a_ls) / n)
                / (lq_n - CAST(a_s AS DOUBLE) / n))) AS BIGINT)
             AS u_micro
    FROM a
    """,
    doc="THEIL'S U (uncertainty coefficient) for lang -> source — "
    "the ASYMMETRIC categorical-association measure that finishes "
    "what q204's chi-square starts (chi2 says 'dependent'; U says "
    "'knowing the language removes this fraction of the entropy of "
    "the source label', the quantity a stratified-sampling design "
    "actually needs): U = (H(S) - H(S|L)) / H(S) with every "
    "entropy assembled from c*ln(c) sums. Exactness: each ln is "
    "quantized to integer micro-nats BEFORE its count-weighted sum "
    "(q203 discipline), the three sums are exact int64 over the "
    "(lang x source) CONTINGENCY relation (bounded — never the "
    "corpus), and the final ratio combines them in double. Scale: "
    "one groupBy builds the contingency table; everything after is "
    "arithmetic over <=|L|*|S| rows on the driver-side-broadcast "
    "scale.",
    tags=("analytics", "stats", "entropy", "association", "scale"),
)
def q237_theil_u(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = (
        t(spark, sf_dir, "documents")
        .groupBy("lang", "source")
        .agg(F.count(F.lit(1)).cast("long").alias("cls"))
    )

    def wsum(df: DataFrame, cnt: str, alias: str) -> DataFrame:
        lq = F.round(
            F.lit(1000000.0) * F.log(F.col(cnt).cast("double"))
        ).cast("long")
        return df.agg(
            F.sum(F.col(cnt) * lq).cast("long").alias(alias)
        )

    cl = c.groupBy("lang").agg(F.sum("cls").cast("long").alias("cl"))
    cs = c.groupBy("source").agg(
        F.sum("cls").cast("long").alias("cs")
    )
    n = c.agg(F.sum("cls").cast("long").alias("n"))
    a = (
        wsum(cs, "cs", "a_s")
        .crossJoin(F.broadcast(wsum(cl, "cl", "a_l")))
        .crossJoin(F.broadcast(wsum(c, "cls", "a_ls")))
        .crossJoin(
            F.broadcast(
                n.select(
                    "n",
                    F.round(
                        F.lit(1000000.0)
                        * F.log(F.col("n").cast("double"))
                    )
                    .cast("long")
                    .alias("lq_n"),
                )
            )
        )
    )
    h_s = F.col("lq_n") - F.col("a_s").cast("double") / F.col("n")
    h_cond = (
        F.col("a_l").cast("double") - F.col("a_ls")
    ) / F.col("n")
    return a.select(
        "n",
        F.round(h_s).cast("long").alias("h_s_micro"),
        F.round(h_cond).cast("long").alias("h_cond_micro"),
        F.round(F.lit(1000000.0) * ((h_s - h_cond) / h_s))
        .cast("long")
        .alias("u_micro"),
    )


# --- q238: trimmed and winsorized mean per group ---------------------------

_TRIM_DECILE = 10  # drop bottom and top n/10 rows


@register(
    "q238_trimmed_mean",
    oracle=f"""
    WITH v AS (
      SELECT event_type,
             CAST(round(1000000.0 * value) AS BIGINT) AS vq,
             event_id
      FROM events),
    r AS (
      SELECT event_type, vq,
             row_number() OVER (PARTITION BY event_type
               ORDER BY vq, event_id) AS rn,
             count(*) OVER (PARTITION BY event_type) AS n
      FROM v),
    kept AS (
      SELECT event_type, CAST(min(n) AS BIGINT) AS n,
             CAST(count(*) AS BIGINT) AS n_kept,
             CAST(sum(vq) AS BIGINT) AS s_kept,
             CAST(min(vq) AS BIGINT) AS v_lo,
             CAST(max(vq) AS BIGINT) AS v_hi
      FROM r
      WHERE rn > n // {_TRIM_DECILE} AND rn <= n - n // {_TRIM_DECILE}
      GROUP BY event_type)
    SELECT event_type, n, n_kept,
           CAST(round(CAST(s_kept AS DOUBLE) / n_kept) AS BIGINT)
             AS trimmed_mean_micro,
           CAST(round((CAST(s_kept AS DOUBLE)
             + CAST(n // {_TRIM_DECILE} AS DOUBLE) * v_lo
             + CAST(n // {_TRIM_DECILE} AS DOUBLE) * v_hi) / n)
             AS BIGINT) AS winsor_mean_micro
    FROM kept ORDER BY event_type
    """,
    doc="TRIMMED + WINSORIZED MEAN per event type — the robust "
    "location estimators between q37's raw percentiles and q154's "
    "median/MAD: drop (trimmed) or clamp (winsorized) the extreme "
    "deciles so a heavy-tailed metric's 'average' stops being a "
    "tail artifact. One rank pass per group (row_number + count "
    "windows, event_id tie-break for determinism), then a single "
    "agg of the kept band yields BOTH estimators: the winsorized "
    "sum is s_kept + floor(n/10)*(v_lo + v_hi) because every "
    "clamped row takes the band edge's value — no second pass, no "
    "join back. Values are micro-quantized integers before any "
    "sum (cross-engine exactness); the two means are one final "
    "division each. Scale: windows partition by event_type; for a "
    "group too hot for one partition the rank pass range-"
    "partitions exactly like q147's distributed sort.",
    tags=("analytics", "stats", "robust", "window", "scale"),
)
def q238_trimmed_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    v = t(spark, sf_dir, "events").select(
        "event_type",
        F.round(F.lit(1000000.0) * F.col("value"))
        .cast("long")
        .alias("vq"),
        "event_id",
    )
    r = v.select(
        "event_type",
        "vq",
        F.row_number()
        .over(
            Window.partitionBy("event_type").orderBy("vq", "event_id")
        )
        .alias("rn"),
        F.count(F.lit(1))
        .over(Window.partitionBy("event_type"))
        .alias("n"),
    )
    k = F.col("n") - (F.col("n") / _TRIM_DECILE).cast("long")
    kept = (
        r.filter(
            (F.col("rn") > (F.col("n") / _TRIM_DECILE).cast("long"))
            & (F.col("rn") <= k)
        )
        .groupBy("event_type")
        .agg(
            F.min("n").cast("long").alias("n"),
            F.count(F.lit(1)).cast("long").alias("n_kept"),
            F.sum("vq").cast("long").alias("s_kept"),
            F.min("vq").cast("long").alias("v_lo"),
            F.max("vq").cast("long").alias("v_hi"),
        )
    )
    ntrim = (F.col("n") / _TRIM_DECILE).cast("long").cast("double")
    return kept.select(
        "event_type",
        "n",
        "n_kept",
        F.round(F.col("s_kept").cast("double") / F.col("n_kept"))
        .cast("long")
        .alias("trimmed_mean_micro"),
        F.round(
            (
                F.col("s_kept").cast("double")
                + ntrim * F.col("v_lo")
                + ntrim * F.col("v_hi")
            )
            / F.col("n")
        )
        .cast("long")
        .alias("winsor_mean_micro"),
    ).orderBy("event_type")


# --- q240: Welch's unequal-variance t-test ---------------------------------


@register(
    "q240_welch_ttest",
    oracle="""
    WITH ev AS (
      SELECT CAST(round(1000.0 * value) AS BIGINT) AS vq,
             CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS g1
      FROM events WHERE event_type IN ('click', 'view')),
    s AS (
      SELECT CAST(sum(g1) AS BIGINT) AS n1,
             CAST(count(*) - sum(g1) AS BIGINT) AS n2,
             CAST(sum(CASE WHEN g1 = 1 THEN vq ELSE 0 END) AS BIGINT)
               AS sv1,
             CAST(sum(CASE WHEN g1 = 0 THEN vq ELSE 0 END) AS BIGINT)
               AS sv2,
             CAST(sum(CASE WHEN g1 = 1 THEN vq * vq ELSE 0 END)
               AS BIGINT) AS svv1,
             CAST(sum(CASE WHEN g1 = 0 THEN vq * vq ELSE 0 END)
               AS BIGINT) AS svv2
      FROM ev)
    SELECT n1, n2,
           CAST(round(1000.0 * (CAST(sv1 AS DOUBLE) / n1
                                - CAST(sv2 AS DOUBLE) / n2))
             AS BIGINT) AS diff_micro,
           CAST(round(1000000.0
             * ((CAST(sv1 AS DOUBLE) / n1 - CAST(sv2 AS DOUBLE) / n2)
                / sqrt(((CAST(svv1 AS DOUBLE)
                         - CAST(sv1 AS DOUBLE) * sv1 / n1)
                        / (n1 - 1.0)) / n1
                       + ((CAST(svv2 AS DOUBLE)
                           - CAST(sv2 AS DOUBLE) * sv2 / n2)
                          / (n2 - 1.0)) / n2))) AS BIGINT) AS t_micro,
           CAST(round(1000.0
             * ((((CAST(svv1 AS DOUBLE)
                   - CAST(sv1 AS DOUBLE) * sv1 / n1)
                  / (n1 - 1.0)) / n1
                 + ((CAST(svv2 AS DOUBLE)
                     - CAST(sv2 AS DOUBLE) * sv2 / n2)
                    / (n2 - 1.0)) / n2)
                * (((CAST(svv1 AS DOUBLE)
                     - CAST(sv1 AS DOUBLE) * sv1 / n1)
                    / (n1 - 1.0)) / n1
                   + ((CAST(svv2 AS DOUBLE)
                       - CAST(sv2 AS DOUBLE) * sv2 / n2)
                      / (n2 - 1.0)) / n2)
                / ((((CAST(svv1 AS DOUBLE)
                      - CAST(sv1 AS DOUBLE) * sv1 / n1)
                     / (n1 - 1.0)) / n1)
                   * (((CAST(svv1 AS DOUBLE)
                        - CAST(sv1 AS DOUBLE) * sv1 / n1)
                       / (n1 - 1.0)) / n1) / (n1 - 1.0)
                   + (((CAST(svv2 AS DOUBLE)
                        - CAST(sv2 AS DOUBLE) * sv2 / n2)
                       / (n2 - 1.0)) / n2)
                     * (((CAST(svv2 AS DOUBLE)
                          - CAST(sv2 AS DOUBLE) * sv2 / n2)
                         / (n2 - 1.0)) / n2) / (n2 - 1.0))))
             AS BIGINT) AS dof_milli
    FROM s
    """,
    doc="WELCH'S UNEQUAL-VARIANCE t-TEST — the parametric member of "
    "the two-sample battery (q191 proportions, q216 ranks, q228 "
    "shapes): mean click-value vs view-value without the equal-"
    "variance assumption a plain t-test smuggles in, plus the "
    "Welch-Satterthwaite effective dof. One conditional-sum hash "
    "agg yields all six moments as exact int64 over MILLI-quantized "
    "values (micro would push sum(vq^2) past int64 at this row "
    "count; at petabyte rows the quantum coarsens again — a "
    "constant, not a semantics change). The t and dof expressions "
    "combine those sums in double with one IEEE-exact sqrt, "
    "quantized at output. Scale: a single map-side-combinable agg "
    "over the event scan; one output row.",
    tags=("analytics", "stats", "ab-test", "agg", "scale"),
)
def q240_welch_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = (
        t(spark, sf_dir, "events")
        .filter(F.col("event_type").isin("click", "view"))
        .select(
            F.round(F.lit(1000.0) * F.col("value"))
            .cast("long")
            .alias("vq"),
            (F.col("event_type") == "click").cast("long").alias("g1"),
        )
    )
    s = ev.agg(
        F.sum("g1").cast("long").alias("n1"),
        (F.count(F.lit(1)) - F.sum("g1")).cast("long").alias("n2"),
        F.sum(F.when(F.col("g1") == 1, F.col("vq")).otherwise(0))
        .cast("long")
        .alias("sv1"),
        F.sum(F.when(F.col("g1") == 0, F.col("vq")).otherwise(0))
        .cast("long")
        .alias("sv2"),
        F.sum(
            F.when(F.col("g1") == 1, F.col("vq") * F.col("vq")).otherwise(0)
        )
        .cast("long")
        .alias("svv1"),
        F.sum(
            F.when(F.col("g1") == 0, F.col("vq") * F.col("vq")).otherwise(0)
        )
        .cast("long")
        .alias("svv2"),
    )
    m1 = F.col("sv1").cast("double") / F.col("n1")
    m2 = F.col("sv2").cast("double") / F.col("n2")
    se1 = (
        (
            F.col("svv1").cast("double")
            - F.col("sv1").cast("double") * F.col("sv1") / F.col("n1")
        )
        / (F.col("n1") - F.lit(1.0))
    ) / F.col("n1")
    se2 = (
        (
            F.col("svv2").cast("double")
            - F.col("sv2").cast("double") * F.col("sv2") / F.col("n2")
        )
        / (F.col("n2") - F.lit(1.0))
    ) / F.col("n2")
    se = se1 + se2
    dof = (se * se) / (
        se1 * se1 / (F.col("n1") - F.lit(1.0))
        + se2 * se2 / (F.col("n2") - F.lit(1.0))
    )
    return s.select(
        "n1",
        "n2",
        F.round(F.lit(1000.0) * (m1 - m2)).cast("long").alias(
            "diff_micro"
        ),
        F.round(F.lit(1000000.0) * ((m1 - m2) / F.sqrt(se)))
        .cast("long")
        .alias("t_micro"),
        F.round(F.lit(1000.0) * dof).cast("long").alias("dof_milli"),
    )


# --- q244: unbounded (rolling) retention curve over the event log ----------

_COHORT_DAY_US = 86_400_000_000


@register(
    "q244_rolling_retention",
    oracle=f"""
    WITH ev AS (
      SELECT user_id, epoch_us(ts) // {_COHORT_DAY_US} AS day
      FROM events),
    u AS (
      SELECT user_id, min(day) AS cohort_day,
             max(day) - min(day) AS last_off
      FROM ev GROUP BY 1),
    sz AS (
      SELECT cohort_day, CAST(count(*) AS BIGINT) AS cohort_size
      FROM u GROUP BY 1),
    lvl AS (
      SELECT cohort_day, last_off, CAST(count(*) AS BIGINT) AS n_at
      FROM u GROUP BY 1, 2),
    mx AS (SELECT cohort_day, max(last_off) AS mo FROM lvl GROUP BY 1),
    grid AS (
      SELECT cohort_day, unnest(generate_series(0, mo)) AS offset_day
      FROM mx),
    j AS (
      SELECT g.cohort_day, g.offset_day,
             CAST(coalesce(l.n_at, 0) AS BIGINT) AS n_at
      FROM grid g LEFT JOIN lvl l
        ON l.cohort_day = g.cohort_day AND l.last_off = g.offset_day),
    r AS (
      SELECT cohort_day, offset_day,
             CAST(sum(n_at) OVER (
               PARTITION BY cohort_day ORDER BY offset_day DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS n_retained
      FROM j)
    SELECT r.cohort_day, r.offset_day, s.cohort_size, r.n_retained,
           CAST((1000000 * r.n_retained) // s.cohort_size AS BIGINT)
             AS retention_micro
    FROM r JOIN sz s USING (cohort_day)
    ORDER BY r.cohort_day, r.offset_day
    """,
    doc="UNBOUNDED (ROLLING) RETENTION curve per first-active-day "
    "cohort — the survival-function face of retention, distinct "
    "from q172's classic triangle by both metric and computation: "
    "q172 counts users ACTIVE ON day k (dips when users skip a "
    "day); this counts users STILL ALIVE AT day k — active on any "
    "day >= k — the monotone non-increasing curve churn analyses "
    "and LTV models consume. Computation: one per-user lifetime "
    "agg (min day, max-min last offset) REPLACES the full "
    "activity relation, then the curve is a REVERSE cumulative "
    "count over the (cohort, last-offset) histogram on the dense "
    "0..max offset grid — a Kaplan-Meier-style survival count "
    "with no censoring. Exact: epoch-day integer floor-division, "
    "int64 counts, one truncating micro-division. Scale: the "
    "event scan folds to the user_id-keyed lifetime agg "
    "(map-side combinable); everything after runs on relations "
    "bounded by users then by the day span — the descending "
    "window partitions by cohort over clock-bounded rows, and "
    "offset-0 retention = 1e6 is a built-in invariant.",
    tags=("analytics", "retention", "survival", "events", "scale"),
)
def q244_rolling_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    ev = t(spark, sf_dir, "events").select(
        "user_id",
        F.expr(
            f"div(unix_micros(cast(ts AS timestamp)), {_COHORT_DAY_US})"
        ).alias("day"),
    )
    u = ev.groupBy("user_id").agg(
        F.min("day").alias("cohort_day"),
        (F.max("day") - F.min("day")).alias("last_off"),
    )
    sz = u.groupBy("cohort_day").agg(
        F.count(F.lit(1)).cast("long").alias("cohort_size")
    )
    lvl = u.groupBy("cohort_day", "last_off").agg(
        F.count(F.lit(1)).cast("long").alias("n_at")
    )
    grid = (
        lvl.groupBy("cohort_day")
        .agg(F.max("last_off").alias("mo"))
        .select(
            "cohort_day",
            F.explode(F.sequence(F.lit(0).cast("long"), "mo")).alias(
                "offset_day"
            ),
        )
    )
    j = (
        grid.join(
            lvl.withColumnRenamed("last_off", "offset_day"),
            ["cohort_day", "offset_day"],
            "left",
        )
        .select(
            "cohort_day",
            "offset_day",
            F.coalesce("n_at", F.lit(0)).cast("long").alias("n_at"),
        )
    )
    w = (
        W.partitionBy("cohort_day")
        .orderBy(F.col("offset_day").desc())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    r = j.select(
        "cohort_day",
        "offset_day",
        F.sum("n_at").over(w).cast("long").alias("n_retained"),
    )
    return (
        r.join(F.broadcast(sz), "cohort_day")
        .select(
            "cohort_day",
            "offset_day",
            "cohort_size",
            "n_retained",
            F.expr("div(1000000 * n_retained, cohort_size)")
            .cast("long")
            .alias("retention_micro"),
        )
        .orderBy("cohort_day", "offset_day")
    )


# --- q245: rank-based ROC AUC per order-priority segment -------------------


@register(
    "q245_roc_auc",
    oracle="""
    WITH scored AS (
      SELECT o_orderpriority AS segment,
             CAST(round(o_totalprice * 100) AS BIGINT) AS score,
             CAST(o_orderstatus = 'F' AS BIGINT) AS pos
      FROM orders),
    lvl AS (
      SELECT segment, score,
             CAST(sum(pos) AS BIGINT) AS pos_at,
             CAST(count(*) - sum(pos) AS BIGINT) AS neg_at
      FROM scored GROUP BY 1, 2),
    cum AS (
      SELECT segment, score, pos_at, neg_at,
             CAST(coalesce(sum(neg_at) OVER (
               PARTITION BY segment ORDER BY score
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS BIGINT) AS neg_below
      FROM lvl),
    agg AS (
      SELECT segment,
             CAST(sum(pos_at) AS BIGINT) AS npos,
             CAST(sum(neg_at) AS BIGINT) AS nneg,
             CAST(sum(pos_at * (2 * neg_below + neg_at)) AS BIGINT)
               AS numer2
      FROM cum GROUP BY 1)
    SELECT segment, npos, nneg,
           CAST((1000000 * numer2) // (2 * npos * nneg) AS BIGINT)
             AS auc_micro
    FROM agg ORDER BY segment
    """,
    doc="ROC AUC per segment by the rank statistic — the eval-battery "
    "member that scores a CONTINUOUS classifier score against a "
    "binary label (q216's Mann-Whitney U is the same statistic as "
    "a two-sample test; this is its classifier-evaluation face, "
    "AUC = U/(n+ * n-)): per (segment, distinct score level) count "
    "positives and negatives, a running sum over score order gives "
    "negatives-strictly-below, and AUC's tie-corrected numerator "
    "sum(pos_at * (2*neg_below + neg_at)) stays EXACT int64 — "
    "concordant pairs count 2, tied-score pairs count 1 — with one "
    "truncating micro-division at the end (no float anywhere; "
    "score = exact cents via the repo-standard half-away round). "
    "Scale: level compaction is a map-side-combinable agg that "
    "shrinks the relation to distinct scores per segment; the "
    "window partitions by segment over compacted levels; the pair "
    "arithmetic is closed-form — no pair relation is ever "
    "materialized, unlike a naive O(n^2) AUC join.",
    tags=("analytics", "eval", "auc", "ranking", "window", "scale"),
)
def q245_roc_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    scored = t(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("segment"),
        F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("score"),
        (F.col("o_orderstatus") == "F").cast("long").alias("pos"),
    )
    lvl = scored.groupBy("segment", "score").agg(
        F.sum("pos").cast("long").alias("pos_at"),
        (F.count(F.lit(1)) - F.sum("pos")).cast("long").alias("neg_at"),
    )
    w = (
        W.partitionBy("segment")
        .orderBy("score")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    cum = lvl.select(
        "segment",
        "pos_at",
        "neg_at",
        F.coalesce(F.sum("neg_at").over(w), F.lit(0))
        .cast("long")
        .alias("neg_below"),
    )
    agg = cum.groupBy("segment").agg(
        F.sum("pos_at").cast("long").alias("npos"),
        F.sum("neg_at").cast("long").alias("nneg"),
        F.sum(
            F.col("pos_at") * (2 * F.col("neg_below") + F.col("neg_at"))
        )
        .cast("long")
        .alias("numer2"),
    )
    return agg.select(
        "segment",
        "npos",
        "nneg",
        F.expr("div(1000000 * numer2, 2 * npos * nneg)")
        .cast("long")
        .alias("auc_micro"),
    ).orderBy("segment")


# --- q250: Simpson's-reversal screen over the order book --------------------


@register(
    "q250_simpson_reversal",
    oracle="""
    WITH j AS (
      SELECT c.c_mktsegment AS segment,
             CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                  THEN 1 ELSE 0 END AS treat,
             CASE WHEN o.o_orderstatus = 'F' THEN 1 ELSE 0 END AS conv
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey),
    seg AS (
      SELECT segment,
             CAST(sum(treat) AS BIGINT) AS n_treat,
             CAST(sum(treat * conv) AS BIGINT) AS k_treat,
             CAST(sum(1 - treat) AS BIGINT) AS n_ctrl,
             CAST(sum((1 - treat) * conv) AS BIGINT) AS k_ctrl
      FROM j GROUP BY 1),
    allr AS (
      SELECT '_ALL' AS segment,
             CAST(sum(n_treat) AS BIGINT) AS n_treat,
             CAST(sum(k_treat) AS BIGINT) AS k_treat,
             CAST(sum(n_ctrl) AS BIGINT) AS n_ctrl,
             CAST(sum(k_ctrl) AS BIGINT) AS k_ctrl
      FROM seg),
    u AS (SELECT * FROM seg UNION ALL SELECT * FROM allr),
    sgn AS (
      SELECT segment, n_treat, k_treat, n_ctrl, k_ctrl,
             CAST(sign(k_treat * n_ctrl - k_ctrl * n_treat) AS BIGINT)
               AS diff_sign
      FROM u),
    gl2 AS (
      SELECT CAST(sum(CASE WHEN diff_sign > 0
                            AND segment <> '_ALL' THEN 1 ELSE 0 END)
                  AS BIGINT) AS strata_pos,
             CAST(sum(CASE WHEN diff_sign < 0
                            AND segment <> '_ALL' THEN 1 ELSE 0 END)
                  AS BIGINT) AS strata_neg,
             CAST(max(CASE WHEN segment = '_ALL' THEN diff_sign END)
                  AS BIGINT) AS pooled_sign
      FROM sgn)
    SELECT n.segment, n.n_treat, n.k_treat, n.n_ctrl, n.k_ctrl,
           CAST((1000000 * n.k_treat) // n.n_treat AS BIGINT)
             AS rate_treat_micro,
           CAST((1000000 * n.k_ctrl) // n.n_ctrl AS BIGINT)
             AS rate_ctrl_micro,
           n.diff_sign,
           CAST(g.strata_pos AS BIGINT) AS strata_pos,
           CAST(g.strata_neg AS BIGINT) AS strata_neg,
           CAST(CASE WHEN (g.pooled_sign > 0 AND g.strata_pos = 0
                           AND g.strata_neg > 0)
                       OR (g.pooled_sign < 0 AND g.strata_neg = 0
                           AND g.strata_pos > 0)
                     THEN 1 ELSE 0 END AS BIGINT) AS reversal_flag
    FROM sgn n, gl2 g
    ORDER BY n.segment
    """,
    doc="SIMPSON'S-REVERSAL SCREEN — the aggregation-bias audit "
    "missing between q191 (A/B z-test, no strata) and q204 "
    "(chi-square homogeneity, no direction): per market segment, "
    "the urgent-priority 'treatment' vs the finished-order "
    "'outcome' as exact integer rate differences, then the pooled "
    "margin — flagging the Simpson configuration where every "
    "stratum's effect points one way and the pooled effect points "
    "the other (the confounded readout that makes naive pooled "
    "dashboards lie). Exactness: the per-stratum sign is the "
    "int64 cross-product sign(k_t*n_c - k_c*n_t) — no division "
    "before comparison; rates are truncating micro-divisions. "
    "The cross-product stays in int64 up to ~3e9 rows per cell "
    "(3e9 squared < 2^63); past that, rescale counts to k-units "
    "first — the q241 discipline. "
    "Scale: one orders-customer equi-join on the natural custkey "
    "(AQE may broadcast the dim side), two map-side-combinable "
    "hash aggs onto <= |segments|+1 rows; the global flag relation "
    "is one broadcast row.",
    tags=("analytics", "stats", "simpson", "ab-test", "scale"),
)
def q250_simpson_reversal(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders").select(
        "o_custkey",
        F.when(
            F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1
        )
        .otherwise(0)
        .alias("treat"),
        F.when(F.col("o_orderstatus") == "F", 1).otherwise(0).alias(
            "conv"
        ),
    )
    c = t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"),
        F.col("c_mktsegment").alias("segment"),
    )
    seg = (
        o.join(c, "o_custkey")
        .groupBy("segment")
        .agg(
            F.sum("treat").cast("long").alias("n_treat"),
            F.sum(F.col("treat") * F.col("conv"))
            .cast("long")
            .alias("k_treat"),
            F.sum(F.lit(1) - F.col("treat"))
            .cast("long")
            .alias("n_ctrl"),
            F.sum((F.lit(1) - F.col("treat")) * F.col("conv"))
            .cast("long")
            .alias("k_ctrl"),
        )
    )
    seg = seg.localCheckpoint(eager=False)
    allr = seg.agg(
        F.sum("n_treat").cast("long").alias("n_treat"),
        F.sum("k_treat").cast("long").alias("k_treat"),
        F.sum("n_ctrl").cast("long").alias("n_ctrl"),
        F.sum("k_ctrl").cast("long").alias("k_ctrl"),
    ).select(
        F.lit("_ALL").alias("segment"),
        "n_treat",
        "k_treat",
        "n_ctrl",
        "k_ctrl",
    )
    u = seg.unionByName(allr)
    sgn = u.select(
        "segment",
        "n_treat",
        "k_treat",
        "n_ctrl",
        "k_ctrl",
        F.signum(
            (
                F.col("k_treat") * F.col("n_ctrl")
                - F.col("k_ctrl") * F.col("n_treat")
            ).cast("double")
        )
        .cast("long")
        .alias("diff_sign"),
    )
    sgn = sgn.localCheckpoint(eager=False)
    gl = sgn.agg(
        F.sum(
            F.when(
                (F.col("diff_sign") > 0) & (F.col("segment") != "_ALL"),
                1,
            ).otherwise(0)
        )
        .cast("long")
        .alias("strata_pos"),
        F.sum(
            F.when(
                (F.col("diff_sign") < 0) & (F.col("segment") != "_ALL"),
                1,
            ).otherwise(0)
        )
        .cast("long")
        .alias("strata_neg"),
        F.max(
            F.when(F.col("segment") == "_ALL", F.col("diff_sign"))
        )
        .cast("long")
        .alias("pooled_sign"),
    )
    rev = (
        (
            (F.col("pooled_sign") > 0)
            & (F.col("strata_pos") == 0)
            & (F.col("strata_neg") > 0)
        )
        | (
            (F.col("pooled_sign") < 0)
            & (F.col("strata_neg") == 0)
            & (F.col("strata_pos") > 0)
        )
    )
    return (
        sgn.crossJoin(F.broadcast(gl))
        .select(
            "segment",
            "n_treat",
            "k_treat",
            "n_ctrl",
            "k_ctrl",
            F.expr("div(1000000 * k_treat, n_treat)")
            .cast("long")
            .alias("rate_treat_micro"),
            F.expr("div(1000000 * k_ctrl, n_ctrl)")
            .cast("long")
            .alias("rate_ctrl_micro"),
            "diff_sign",
            "strata_pos",
            "strata_neg",
            F.when(rev, 1).otherwise(0).cast("long").alias(
                "reversal_flag"
            ),
        )
        .orderBy("segment")
    )


# --- q252: exact weighted quantiles by level compaction ---------------------


@register(
    "q252_weighted_quantiles",
    oracle="""
    WITH ev AS (
      SELECT event_type,
             CAST(round(value * 100) AS BIGINT) AS value_cent,
             CAST(regexp_extract(props, '"k": (-?[0-9]+)', 1) AS BIGINT)
               AS w
      FROM events),
    lvl AS (
      SELECT event_type, value_cent, CAST(sum(w) AS BIGINT) AS w
      FROM ev GROUP BY 1, 2),
    cum AS (
      SELECT event_type, value_cent, w,
             CAST(sum(w) OVER (
               PARTITION BY event_type ORDER BY value_cent
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS cumw
      FROM lvl),
    tot AS (
      SELECT event_type, CAST(sum(w) AS BIGINT) AS w_total
      FROM lvl GROUP BY 1)
    SELECT c.event_type, t.w_total,
           CAST(min(CASE WHEN 4 * c.cumw >= 1 * t.w_total
                         THEN c.value_cent END) AS BIGINT) AS p25_cent,
           CAST(min(CASE WHEN 4 * c.cumw >= 2 * t.w_total
                         THEN c.value_cent END) AS BIGINT) AS p50_cent,
           CAST(min(CASE WHEN 4 * c.cumw >= 3 * t.w_total
                         THEN c.value_cent END) AS BIGINT) AS p75_cent
    FROM cum c JOIN tot t USING (event_type)
    GROUP BY 1, 2
    ORDER BY 1
    """,
    doc="EXACT WEIGHTED QUANTILES per event type — the missing face "
    "between q37 (unweighted percentiles) and q147/q170 "
    "(approximate sketches): each observation carries an integer "
    "weight (the props payload's k field), and the weighted "
    "quartile is min{{v : 4*cumw(v) >= q*W}} — the lower weighted "
    "quantile, decided entirely by int64 cross-multiplication "
    "(4*cumw vs q*W) with NO division or float anywhere. Values "
    "are quantized to cents first, so the running window runs "
    "over the LEVEL-COMPACTED (type, value_cent) relation — the "
    "q245 discipline: compaction bounds the window input by the "
    "value domain (a few thousand cent levels), not the row "
    "count. Scale: the scan folds to the (type, cent) hash agg "
    "map-side; the cumulative window partitions by type over "
    "domain-bounded rows; totals ride a broadcast.",
    tags=("analytics", "stats", "quantiles", "weighted", "scale"),
)
def q252_weighted_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    ev = t(spark, sf_dir, "events").select(
        "event_type",
        F.round(F.col("value") * 100).cast("long").alias("value_cent"),
        F.get_json_object("props", "$.k").cast("long").alias("w"),
    )
    lvl = ev.groupBy("event_type", "value_cent").agg(
        F.sum("w").cast("long").alias("w")
    )
    lvl = lvl.localCheckpoint(eager=False)
    w = (
        W.partitionBy("event_type")
        .orderBy("value_cent")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    cum = lvl.select(
        "event_type",
        "value_cent",
        F.sum("w").over(w).cast("long").alias("cumw"),
    )
    tot = lvl.groupBy("event_type").agg(
        F.sum("w").cast("long").alias("w_total")
    )
    j = cum.join(F.broadcast(tot), "event_type")

    def pick(q: int):
        return (
            F.min(
                F.when(
                    4 * F.col("cumw") >= q * F.col("w_total"),
                    F.col("value_cent"),
                )
            )
            .cast("long")
            .alias(f"p{q * 25}_cent")
        )

    return (
        j.groupBy("event_type", "w_total")
        .agg(pick(1), pick(2), pick(3))
        .orderBy("event_type")
    )


# --- q259: leave-one-group-out OLS cross-validation -------------------------


@register(
    "q259_loo_cv_ols",
    oracle="""
    WITH d AS (
      SELECT lang,
             CAST(len(list_filter(regexp_split_to_array(lower(text),
                  '[^a-z0-9]+'), t -> t <> '')) AS BIGINT) AS x,
             CAST(n_chars AS BIGINT) AS y
      FROM documents),
    s AS (
      SELECT lang,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x) AS BIGINT) AS sx,
             CAST(sum(y) AS BIGINT) AS sy,
             CAST(sum(x * y) AS BIGINT) AS sxy,
             CAST(sum(x * x) AS BIGINT) AS sxx,
             CAST(sum(y * y) AS BIGINT) AS syy
      FROM d GROUP BY 1),
    g AS (
      SELECT CAST(sum(n) AS BIGINT) AS tn, CAST(sum(sx) AS BIGINT) AS tsx,
             CAST(sum(sy) AS BIGINT) AS tsy,
             CAST(sum(sxy) AS BIGINT) AS tsxy,
             CAST(sum(sxx) AS BIGINT) AS tsxx
      FROM s),
    r AS (
      SELECT s.lang, s.n, s.sx, s.sy, s.sxy, s.sxx, s.syy,
             g.tn - s.n AS rn, g.tsx - s.sx AS rsx, g.tsy - s.sy AS rsy,
             g.tsxy - s.sxy AS rsxy, g.tsxx - s.sxx AS rsxx
      FROM s CROSS JOIN g),
    fit AS (
      SELECT lang, n, sx, sy, sxy, sxx, syy, rn, rsx, rsy,
             (CAST(rn AS DOUBLE) * rsxy - CAST(rsx AS DOUBLE) * rsy)
               / (CAST(rn AS DOUBLE) * rsxx - CAST(rsx AS DOUBLE) * rsx)
               AS b
      FROM r),
    ab AS (
      SELECT lang, n, sx, sy, sxy, sxx, syy, b,
             (CAST(rsy AS DOUBLE) - b * rsx) / rn AS a
      FROM fit),
    e AS (
      SELECT lang, n, a, b,
             (CAST(syy AS DOUBLE) - 2.0 * a * sy - 2.0 * b * sxy
              + 2.0 * a * b * sx + a * a * n + b * b * sxx) / n AS mse
      FROM ab)
    SELECT lang, n AS n_held,
           CAST(round(1000000.0 * b) AS BIGINT) AS slope_micro,
           CAST(round(1000000.0 * a) AS BIGINT) AS intercept_micro,
           CAST(round(1000.0 * sqrt(greatest(mse, 0.0))) AS BIGINT)
             AS rmse_milli
    FROM e ORDER BY lang
    """,
    doc="LEAVE-ONE-GROUP-OUT OLS CROSS-VALIDATION (the generalization "
    "check q234's in-group fits cannot give: fit chars-per-token on "
    "every language EXCEPT g, then score the held-out g — per-group "
    "train/test without a second pass): the rest-of-corpus "
    "sufficient statistics are GLOBAL SUMS MINUS GROUP SUMS (exact "
    "int64 subtraction — the classic jackknife/moment trick, q189 "
    "family), so one map-side-combinable agg yields every fold's "
    "train fit AND its held-out MSE, expanded as syy - 2a*sy - "
    "2b*sxy + 2ab*sx + a^2*n + b^2*sxx from the same six sums. All "
    "double combining happens in textually identical expressions on "
    "both engines (identical-operand IEEE discipline, q234); "
    "greatest(mse, 0) guards the cancellation-epsilon corner before "
    "sqrt. Scale: one agg to |langs| rows, a one-row broadcast of "
    "the totals, arithmetic on the broadcast scale — the fold loop "
    "every CV harness runs is ZERO extra passes here.",
    tags=("analytics", "stats", "regression", "cv", "jackknife", "scale"),
)
def q259_loo_cv_ols(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents").select(
        "lang",
        F.size(tokens("text")).cast("long").alias("x"),
        F.col("n_chars").cast("long").alias("y"),
    )
    s = d.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("long").alias("syy"),
    )
    g = s.agg(
        F.sum("n").cast("long").alias("tn"),
        F.sum("sx").cast("long").alias("tsx"),
        F.sum("sy").cast("long").alias("tsy"),
        F.sum("sxy").cast("long").alias("tsxy"),
        F.sum("sxx").cast("long").alias("tsxx"),
    )
    r = s.crossJoin(F.broadcast(g)).select(
        "lang", "n", "sx", "sy", "sxy", "sxx", "syy",
        (F.col("tn") - F.col("n")).alias("rn"),
        (F.col("tsx") - F.col("sx")).alias("rsx"),
        (F.col("tsy") - F.col("sy")).alias("rsy"),
        (F.col("tsxy") - F.col("sxy")).alias("rsxy"),
        (F.col("tsxx") - F.col("sxx")).alias("rsxx"),
    )
    # Textually identical arithmetic on both engines (IEEE discipline).
    fit = r.withColumn(
        "b",
        F.expr(
            "(CAST(rn AS DOUBLE) * rsxy - CAST(rsx AS DOUBLE) * rsy)"
            " / (CAST(rn AS DOUBLE) * rsxx - CAST(rsx AS DOUBLE) * rsx)"
        ),
    )
    ab = fit.withColumn(
        "a", F.expr("(CAST(rsy AS DOUBLE) - b * rsx) / rn")
    )
    e = ab.withColumn(
        "mse",
        F.expr(
            "(CAST(syy AS DOUBLE) - 2.0 * a * sy - 2.0 * b * sxy"
            " + 2.0 * a * b * sx + a * a * n + b * b * sxx) / n"
        ),
    )
    return e.select(
        "lang",
        F.col("n").alias("n_held"),
        F.expr("CAST(round(1000000.0 * b) AS BIGINT)").alias("slope_micro"),
        F.expr("CAST(round(1000000.0 * a) AS BIGINT)").alias(
            "intercept_micro"
        ),
        F.expr(
            "CAST(round(1000.0 * sqrt(greatest(mse, 0.0))) AS BIGINT)"
        ).alias("rmse_milli"),
    ).orderBy("lang")


# --- q270: James-Stein / empirical-Bayes shrinkage of per-source means -------


@register(
    "q270_js_shrinkage",
    oracle="""
    WITH d AS (
      SELECT source,
             CAST(len(list_filter(regexp_split_to_array(lower(text),
                  '[^a-z0-9]+'), t -> t <> '')) AS BIGINT) AS x
      FROM documents),
    s AS (
      SELECT source, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x) AS BIGINT) AS sx,
             CAST(sum(x * x) AS BIGINT) AS sxx
      FROM d GROUP BY 1),
    g AS (
      SELECT CAST(count(*) AS BIGINT) AS k, CAST(sum(n) AS BIGINT) AS nn,
             CAST(sum(sx) AS BIGINT) AS st,
             CAST(sum(sxx) AS BIGINT) AS sst,
             CAST(sum(CAST(round(1000.0
               * (CAST(sx AS DOUBLE) * sx / n)) AS BIGINT)) AS BIGINT)
               AS swb_milli
      FROM s),
    p AS (
      SELECT s.source, s.n, s.sx, g.k, g.nn, g.st,
             (CAST(g.sst AS DOUBLE) - CAST(g.swb_milli AS DOUBLE) / 1000.0)
               / (g.nn - g.k) AS vw,
             greatest((CAST(g.swb_milli AS DOUBLE) / 1000.0
               - (CAST(g.st AS DOUBLE) * g.st / g.nn)) / (g.k - 1)
               - (CAST(g.sst AS DOUBLE)
                  - CAST(g.swb_milli AS DOUBLE) / 1000.0) / (g.nn - g.k),
               0.0) / (CAST(g.nn AS DOUBLE) / g.k) AS tau2
      FROM s CROSS JOIN g),
    w AS (
      SELECT source, n, k, nn, st, tau2, vw,
             tau2 / (tau2 + vw / n) AS wgt,
             CAST(sx AS DOUBLE) / n AS mu_i,
             CAST(st AS DOUBLE) / nn AS mu
      FROM p)
    SELECT source, n AS n_docs,
           CAST(round(1000.0 * mu_i) AS BIGINT) AS mean_milli,
           CAST(round(1000000.0 * wgt) AS BIGINT) AS weight_micro,
           CAST(round(1000.0 * (mu + wgt * (mu_i - mu))) AS BIGINT)
             AS shrunk_milli
    FROM w ORDER BY source
    """,
    doc="JAMES-STEIN / EMPIRICAL-BAYES SHRINKAGE of per-source mean "
    "token counts toward the grand mean — the estimator a curator "
    "should use before ranking sources on a per-group statistic "
    "(small sources' raw means are noise; the normal-normal EB "
    "posterior mean m + w_i(x_i - m) with w_i = tau^2/(tau^2 + "
    "vw/n_i) dominates the raw means in total squared error — "
    "Stein's paradox, operationalized): method-of-moments tau^2 = "
    "max(between-MS - within-MS, 0)/n_bar from the SAME three "
    "int64 sums (n, sum x, sum x^2) per source. Exactness: the "
    "group fold is exact int64; every variance/weight is an "
    "identical-operand double expression shared textually with "
    "the oracle; the sx^2/n terms quantize to int64 MILLI before "
    "their sum (order-free — no float accumulation anywhere; the "
    "milli quantum bounds the term at ~1e12 per source at sf, "
    "lower it for exa-scale sums). Scale: ONE "
    "map-side-combinable agg to |sources| rows; everything after "
    "is arithmetic on a one-row broadcast.",
    tags=("analytics", "stats", "shrinkage", "empirical-bayes", "scale"),
)
def q270_js_shrinkage(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents").select(
        "source", F.size(tokens("text")).cast("long").alias("x")
    )
    s = d.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
    )
    s = s.localCheckpoint(eager=False)
    g = s.agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum("n").cast("long").alias("nn"),
        F.sum("sx").cast("long").alias("st"),
        F.sum("sxx").cast("long").alias("sst"),
        F.sum(
            F.expr(
                "CAST(round(1000.0 * (CAST(sx AS DOUBLE) * sx / n))"
                " AS BIGINT)"
            )
        )
        .cast("long")
        .alias("swb_milli"),
    )
    p = s.crossJoin(F.broadcast(g)).select(
        "source",
        "n",
        "sx",
        "k",
        "nn",
        "st",
        F.expr(
            "(CAST(sst AS DOUBLE) - CAST(swb_milli AS DOUBLE) / 1000.0)"
            " / (nn - k)"
        ).alias("vw"),
        F.expr(
            "greatest((CAST(swb_milli AS DOUBLE) / 1000.0"
            " - (CAST(st AS DOUBLE) * st / nn)) / (k - 1)"
            " - (CAST(sst AS DOUBLE)"
            " - CAST(swb_milli AS DOUBLE) / 1000.0) / (nn - k), 0.0)"
            " / (CAST(nn AS DOUBLE) / k)"
        ).alias("tau2"),
    )
    w = p.select(
        "source",
        "n",
        F.expr("tau2 / (tau2 + vw / n)").alias("wgt"),
        F.expr("CAST(sx AS DOUBLE) / n").alias("mu_i"),
        F.expr("CAST(st AS DOUBLE) / nn").alias("mu"),
    )
    return w.select(
        "source",
        F.col("n").alias("n_docs"),
        F.expr("CAST(round(1000.0 * mu_i) AS BIGINT)").alias("mean_milli"),
        F.expr("CAST(round(1000000.0 * wgt) AS BIGINT)").alias(
            "weight_micro"
        ),
        F.expr(
            "CAST(round(1000.0 * (mu + wgt * (mu_i - mu))) AS BIGINT)"
        ).alias("shrunk_milli"),
    ).orderBy("source")


# --- q274: join-key skew profiler --------------------------------------------

_SKEW_TOP = 5  # heaviest keys reported


@register(
    "q274_join_skew_profile",
    oracle=f"""
    WITH kc AS (
      SELECT user_id, CAST(count(*) AS BIGINT) AS c
      FROM events GROUP BY 1),
    s AS (
      SELECT CAST(sum(c) AS BIGINT) AS n_events,
             CAST(count(*) AS BIGINT) AS n_keys,
             CAST(max(c) AS BIGINT) AS mx
      FROM kc),
    r AS (
      SELECT c, row_number() OVER (ORDER BY c, user_id) AS rn
      FROM kc),
    p99 AS (
      SELECT CAST(r.c AS BIGINT) AS p99_cnt
      FROM r CROSS JOIN s
      WHERE r.rn = (99 * s.n_keys + 99) // 100),
    top AS (
      SELECT user_id, c,
             row_number() OVER (ORDER BY c DESC, user_id) AS rk
      FROM kc)
    SELECT t.rk AS rank, t.user_id, t.c AS cnt,
           CAST(round(1000000.0 * t.c / s.n_events) AS BIGINT)
             AS share_micro,
           s.n_events, s.n_keys,
           CAST(round(1000.0 * s.mx * s.n_keys / s.n_events) AS BIGINT)
             AS skew_milli,
           p.p99_cnt
    FROM top t CROSS JOIN s CROSS JOIN p99 p
    WHERE t.rk <= {_SKEW_TOP}
    ORDER BY t.rk
    """,
    doc="JOIN-KEY SKEW PROFILER over events.user_id — the 'should I "
    f"salt this join?' report (top-{_SKEW_TOP} heaviest keys with "
    "their traffic share, the max/mean skew factor, and the p99 "
    "key frequency; a skew factor near 1 means hash partitions "
    "balance, >>1 means one task owns the hot key's whole fan-out "
    "— the diagnostic BEHIND the q38 salting and q208 segmented "
    "escapes, turned into a query, and CONSUMED as a live plan "
    "decision by q310's adaptive salted aggregation): skew = "
    "max/(N/K) cross-"
    "multiplied as max*K/N, p99 by exact order statistic at rank "
    "ceil(0.99K) (integer (99K+99)//100, floor-safe on both "
    "engines for non-negative operands). Exactness: one int64 "
    "fold to key counts; every output is integer until the two "
    "quantized divisions. Scale: the fold is map-side combinable "
    "onto the KEY relation; the rank windows run over that "
    "bounded relation (q221 vocab-scale discipline — pre-bucket "
    "by count if the key space itself shards); output is "
    f"{_SKEW_TOP} rows.",
    tags=("analytics", "diagnostics", "skew", "profiling", "scale"),
)
def q274_join_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    kc = (
        t(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    kc = kc.localCheckpoint(eager=False)
    s = kc.agg(
        F.sum("c").cast("long").alias("n_events"),
        F.count(F.lit(1)).cast("long").alias("n_keys"),
        F.max("c").cast("long").alias("mx"),
    )
    r = kc.select(
        "c",
        F.row_number()
        .over(W.partitionBy().orderBy("c", "user_id"))
        .alias("rn"),
    )
    p99 = (
        r.crossJoin(F.broadcast(s))
        .where(
            F.col("rn") == F.expr("div(99 * n_keys + 99, 100)")
        )
        .select(F.col("c").alias("p99_cnt"))
    )
    top = kc.select(
        "user_id",
        "c",
        F.row_number()
        .over(W.partitionBy().orderBy(F.desc("c"), "user_id"))
        .alias("rk"),
    ).where(F.col("rk") <= _SKEW_TOP)
    return (
        top.crossJoin(F.broadcast(s))
        .crossJoin(F.broadcast(p99))
        .select(
            F.col("rk").alias("rank"),
            "user_id",
            F.col("c").alias("cnt"),
            F.expr(
                "CAST(round(1000000.0 * c / n_events) AS BIGINT)"
            ).alias("share_micro"),
            "n_events",
            "n_keys",
            F.expr(
                "CAST(round(1000.0 * mx * n_keys / n_events) AS BIGINT)"
            ).alias("skew_milli"),
            "p99_cnt",
        )
        .orderBy("rank")
    )


# --- q276: Murphy decomposition of the Brier score ----------------------------


@register(
    "q276_brier_decomposition",
    oracle="""
    WITH u AS (
      SELECT user_id,
             least(20, CAST(count(*) FILTER (event_type = 'click')
               AS BIGINT)) AS c,
             CASE WHEN count(*) FILTER (event_type = 'purchase')
                       > count(*) FILTER (event_type = 'click')
                  THEN 1 ELSE 0 END AS o
      FROM events GROUP BY 1),
    b AS (
      SELECT c, CAST(count(*) AS BIGINT) AS n, CAST(sum(o) AS BIGINT) AS s
      FROM u GROUP BY 1),
    g AS (
      SELECT CAST(sum(n) AS BIGINT) AS nn, CAST(sum(s) AS BIGINT) AS ss,
             CAST(sum(n * c * c - 40 * c * s + 400 * s) AS BIGINT) AS bq
      FROM b),
    terms AS (
      SELECT g.nn, g.ss, g.bq,
             CAST(sum(CAST(round(1000000.0
               * (CAST(b.c * b.n - 20 * b.s AS DOUBLE)
                  * (b.c * b.n - 20 * b.s)) / (400.0 * b.n)) AS BIGINT))
               AS BIGINT) AS rel_q,
             CAST(sum(CAST(round(1000000.0 * b.n
               * (CAST(b.s AS DOUBLE) / b.n - CAST(g.ss AS DOUBLE) / g.nn)
               * (CAST(b.s AS DOUBLE) / b.n - CAST(g.ss AS DOUBLE) / g.nn))
               AS BIGINT)) AS BIGINT) AS res_q
      FROM b CROSS JOIN g
      GROUP BY 1, 2, 3)
    SELECT nn AS n_users,
           CAST(round(1000000.0 * ss / nn) AS BIGINT) AS base_rate_micro,
           CAST(round(1000000.0 * bq / (400.0 * nn)) AS BIGINT)
             AS brier_micro,
           CAST(round(CAST(rel_q AS DOUBLE) / nn) AS BIGINT)
             AS reliability_micro,
           CAST(round(CAST(res_q AS DOUBLE) / nn) AS BIGINT)
             AS resolution_micro,
           CAST(round(1000000.0 * (CAST(ss AS DOUBLE) / nn)
             * (1.0 - CAST(ss AS DOUBLE) / nn)) AS BIGINT)
             AS uncertainty_micro
    FROM terms
    """,
    doc="MURPHY DECOMPOSITION of the Brier score — BS = reliability "
    "- resolution + uncertainty — for the fixed-point click-count "
    "forecaster f = min(20, clicks)/20 against q191/q200's "
    "conversion outcome: the proper-scoring-rule companion to "
    "q200's reliability CURVE (the curve shows WHERE calibration "
    "fails; the decomposition says how much of the score is "
    "miscalibration vs genuine discrimination vs irreducible base-"
    "rate noise — the number that tells you whether recalibration "
    "or a better model is the fix). Exactness: the raw Brier sum "
    "is PURE INT64 in 400ths (n c^2 - 40 c s + 400 s per bin — "
    "no float until the final division); reliability/resolution "
    "terms are identical-operand doubles quantized per bin to "
    "micro BEFORE their <= 21-term int64 sums ((cn - 20s)^2 "
    "composed in double to dodge the n^2 overflow). Scale: one "
    "user-keyed agg, one fold onto <= 21 forecast bins, "
    "broadcast-scale arithmetic; output is ONE row.",
    tags=("analytics", "eval", "brier", "calibration", "scale"),
)
def q276_brier_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    u = (
        t(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.least(
                F.lit(20).cast("long"),
                F.count(F.when(F.col("event_type") == "click", 1))
                .cast("long"),
            ).alias("c"),
            F.when(
                F.count(F.when(F.col("event_type") == "purchase", 1))
                > F.count(F.when(F.col("event_type") == "click", 1)),
                F.lit(1),
            )
            .otherwise(F.lit(0))
            .alias("o"),
        )
    )
    b = u.groupBy("c").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("o").cast("long").alias("s"),
    )
    b = b.localCheckpoint(eager=False)
    g = b.agg(
        F.sum("n").cast("long").alias("nn"),
        F.sum("s").cast("long").alias("ss"),
        F.sum(
            F.col("n") * F.col("c") * F.col("c")
            - F.lit(40) * F.col("c") * F.col("s")
            + F.lit(400) * F.col("s")
        )
        .cast("long")
        .alias("bq"),
    )
    terms = (
        b.crossJoin(F.broadcast(g))
        .groupBy("nn", "ss", "bq")
        .agg(
            F.sum(
                F.expr(
                    "CAST(round(1000000.0"
                    " * (CAST(c * n - 20 * s AS DOUBLE)"
                    " * (c * n - 20 * s)) / (400.0 * n)) AS BIGINT)"
                )
            )
            .cast("long")
            .alias("rel_q"),
            F.sum(
                F.expr(
                    "CAST(round(1000000.0 * n"
                    " * (CAST(s AS DOUBLE) / n - CAST(ss AS DOUBLE) / nn)"
                    " * (CAST(s AS DOUBLE) / n - CAST(ss AS DOUBLE) / nn))"
                    " AS BIGINT)"
                )
            )
            .cast("long")
            .alias("res_q"),
        )
    )
    return terms.select(
        F.col("nn").alias("n_users"),
        F.expr("CAST(round(1000000.0 * ss / nn) AS BIGINT)").alias(
            "base_rate_micro"
        ),
        F.expr(
            "CAST(round(1000000.0 * bq / (400.0 * nn)) AS BIGINT)"
        ).alias("brier_micro"),
        F.expr("CAST(round(CAST(rel_q AS DOUBLE) / nn) AS BIGINT)").alias(
            "reliability_micro"
        ),
        F.expr("CAST(round(CAST(res_q AS DOUBLE) / nn) AS BIGINT)").alias(
            "resolution_micro"
        ),
        F.expr(
            "CAST(round(1000000.0 * (CAST(ss AS DOUBLE) / nn)"
            " * (1.0 - CAST(ss AS DOUBLE) / nn)) AS BIGINT)"
        ).alias("uncertainty_micro"),
    )


# --- q281: Benjamini-Hochberg FDR screen ------------------------------------


@register(
    "q281_bh_fdr",
    oracle="""
    WITH d AS (
      SELECT source,
             CASE WHEN lang = 'en' THEN 'en'
                  WHEN lang = 'zh' THEN 'zh' ELSE 'ot' END AS bkt
      FROM documents),
    per AS (
      SELECT source,
             CAST(sum(CASE WHEN bkt = 'en' THEN 1 ELSE 0 END) AS BIGINT)
               AS a1,
             CAST(sum(CASE WHEN bkt = 'zh' THEN 1 ELSE 0 END) AS BIGINT)
               AS a2,
             CAST(sum(CASE WHEN bkt = 'ot' THEN 1 ELSE 0 END) AS BIGINT)
               AS a3
      FROM d GROUP BY source),
    tot AS (
      SELECT CAST(sum(a1) AS BIGINT) AS t1, CAST(sum(a2) AS BIGINT) AS t2,
             CAST(sum(a3) AS BIGINT) AS t3,
             CAST(count(*) AS BIGINT) AS m
      FROM per),
    chi AS (
      -- zero-denominator convention (mirrors q282): a cell whose column
      -- total or row total is 0 contributes 0 to chi2 (its limit)
      SELECT source, a1, a2, a3, m,
             CAST(round(1000000.0 * (
               CASE WHEN t1 = 0 OR (a1 + a2 + a3) = 0 THEN 0.0 ELSE
               (CAST(a1 AS DOUBLE) - CAST(a1 + a2 + a3 AS DOUBLE) * t1
                  / (t1 + t2 + t3))
               * (CAST(a1 AS DOUBLE) - CAST(a1 + a2 + a3 AS DOUBLE) * t1
                  / (t1 + t2 + t3))
               / (CAST(a1 + a2 + a3 AS DOUBLE) * t1 / (t1 + t2 + t3)) END
             + CASE WHEN t2 = 0 OR (a1 + a2 + a3) = 0 THEN 0.0 ELSE
               (CAST(a2 AS DOUBLE) - CAST(a1 + a2 + a3 AS DOUBLE) * t2
                  / (t1 + t2 + t3))
               * (CAST(a2 AS DOUBLE) - CAST(a1 + a2 + a3 AS DOUBLE) * t2
                  / (t1 + t2 + t3))
               / (CAST(a1 + a2 + a3 AS DOUBLE) * t2 / (t1 + t2 + t3)) END
             + CASE WHEN t3 = 0 OR (a1 + a2 + a3) = 0 THEN 0.0 ELSE
               (CAST(a3 AS DOUBLE) - CAST(a1 + a2 + a3 AS DOUBLE) * t3
                  / (t1 + t2 + t3))
               * (CAST(a3 AS DOUBLE) - CAST(a1 + a2 + a3 AS DOUBLE) * t3
                  / (t1 + t2 + t3))
               / (CAST(a1 + a2 + a3 AS DOUBLE) * t3 / (t1 + t2 + t3)) END
             + CASE WHEN t1 = 0 OR (t1 + t2 + t3 - a1 - a2 - a3) = 0
               THEN 0.0 ELSE
               (CAST(t1 - a1 AS DOUBLE) - CAST(t1 + t2 + t3 - a1 - a2 - a3
                  AS DOUBLE) * t1 / (t1 + t2 + t3))
               * (CAST(t1 - a1 AS DOUBLE) - CAST(t1 + t2 + t3 - a1 - a2 - a3
                  AS DOUBLE) * t1 / (t1 + t2 + t3))
               / (CAST(t1 + t2 + t3 - a1 - a2 - a3 AS DOUBLE) * t1
                  / (t1 + t2 + t3)) END
             + CASE WHEN t2 = 0 OR (t1 + t2 + t3 - a1 - a2 - a3) = 0
               THEN 0.0 ELSE
               (CAST(t2 - a2 AS DOUBLE) - CAST(t1 + t2 + t3 - a1 - a2 - a3
                  AS DOUBLE) * t2 / (t1 + t2 + t3))
               * (CAST(t2 - a2 AS DOUBLE) - CAST(t1 + t2 + t3 - a1 - a2 - a3
                  AS DOUBLE) * t2 / (t1 + t2 + t3))
               / (CAST(t1 + t2 + t3 - a1 - a2 - a3 AS DOUBLE) * t2
                  / (t1 + t2 + t3)) END
             + CASE WHEN t3 = 0 OR (t1 + t2 + t3 - a1 - a2 - a3) = 0
               THEN 0.0 ELSE
               (CAST(t3 - a3 AS DOUBLE) - CAST(t1 + t2 + t3 - a1 - a2 - a3
                  AS DOUBLE) * t3 / (t1 + t2 + t3))
               * (CAST(t3 - a3 AS DOUBLE) - CAST(t1 + t2 + t3 - a1 - a2 - a3
                  AS DOUBLE) * t3 / (t1 + t2 + t3))
               / (CAST(t1 + t2 + t3 - a1 - a2 - a3 AS DOUBLE) * t3
                  / (t1 + t2 + t3)) END
             )) AS BIGINT) AS chi2_micro
      FROM per, tot),
    p AS (
      SELECT source, chi2_micro, m,
             CAST(round(1000000.0
               * exp(-CAST(chi2_micro AS DOUBLE) / 2000000.0)) AS BIGINT)
               AS p_micro
      FROM chi),
    r AS (
      SELECT source, chi2_micro, p_micro, m,
             CAST(row_number() OVER (ORDER BY p_micro, source) AS BIGINT)
               AS k
      FROM p),
    km AS (
      SELECT COALESCE(max(CASE WHEN p_micro * m <= 50000 * k THEN k END),
                      0) AS kmax
      FROM r)
    SELECT source, chi2_micro, p_micro, k,
           k <= kmax AS rejected
    FROM r, km
    ORDER BY k
    """,
    doc="BENJAMINI-HOCHBERG FDR screen over per-source language-mix "
    "drift tests — the multiple-testing correction every per-slice "
    "drift dashboard needs (20 sources at alpha=.05 yields ~1 false "
    "alarm per refresh uncorrected): per source, a 2x3 independence "
    "chi-square of {en,zh,other} vs rest-of-corpus; dof=2 makes the "
    "survival function CLOSED-FORM, p = exp(-chi2/2) — no incomplete "
    "gamma, exact on both engines. Step-up rule: reject ranks 1..kmax "
    "where kmax = max{k : p_k <= alpha*k/m}, decided by the INTEGER "
    "cross-multiplication p_micro*m <= 50000*k (alpha=.05; no "
    "threshold rounding at all). Degenerate data: a cell whose column "
    "total (globally empty language bucket) or row total is 0 "
    "contributes 0 to chi2 — its limit — on BOTH engines, per the "
    "q282 zero-denominator convention, instead of Inf/NaN divergence. "
    "Exactness: counts int64 from one "
    "scan; chi2 is quantized to micro BEFORE exp; the rank window "
    "and kmax fold run on the |sources|-bounded relation. Scale: the "
    "doc scan folds map-side onto |sources| rows; everything after "
    "is arithmetic on that bounded relation.",
    tags=("analytics", "fdr", "multiple-testing", "chi-square", "scale"),
)
def q281_bh_fdr(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    d = t(spark, sf_dir, "documents").select(
        "source",
        F.when(F.col("lang") == "en", "en")
        .when(F.col("lang") == "zh", "zh")
        .otherwise("ot")
        .alias("bkt"),
    )
    per = d.groupBy("source").agg(
        F.sum(F.when(F.col("bkt") == "en", 1).otherwise(0))
        .cast("long")
        .alias("a1"),
        F.sum(F.when(F.col("bkt") == "zh", 1).otherwise(0))
        .cast("long")
        .alias("a2"),
        F.sum(F.when(F.col("bkt") == "ot", 1).otherwise(0))
        .cast("long")
        .alias("a3"),
    )
    tot = per.agg(
        F.sum("a1").cast("long").alias("t1"),
        F.sum("a2").cast("long").alias("t2"),
        F.sum("a3").cast("long").alias("t3"),
        F.count(F.lit(1)).cast("long").alias("m"),
    )

    def cell(o: str, ct: str, rt: str) -> str:
        # Zero-denominator convention (mirrors q282): a cell whose column
        # total or row total is 0 has expected count 0 and contributes 0
        # to chi2 (its limit), instead of dividing by zero — which Spark's
        # non-ANSI cast would clamp to Long.MaxValue while DuckDB errors.
        n = "(t1 + t2 + t3)"
        e = f"(CAST({rt} AS DOUBLE) * {ct} / {n})"
        core = f"(CAST({o} AS DOUBLE) - {e}) * (CAST({o} AS DOUBLE) - {e}) / {e}"
        return f"(CASE WHEN {ct} = 0 OR {rt} = 0 THEN 0.0 ELSE {core} END)"

    ra = "(a1 + a2 + a3)"
    rb = "(t1 + t2 + t3 - a1 - a2 - a3)"
    chi_expr = " + ".join(
        [
            cell("a1", "t1", ra),
            cell("a2", "t2", ra),
            cell("a3", "t3", ra),
            cell("(t1 - a1)", "t1", rb),
            cell("(t2 - a2)", "t2", rb),
            cell("(t3 - a3)", "t3", rb),
        ]
    )
    chi = per.crossJoin(F.broadcast(tot)).select(
        "source",
        "m",
        F.expr(f"CAST(round(1000000.0 * ({chi_expr})) AS BIGINT)").alias(
            "chi2_micro"
        ),
    )
    p = chi.select(
        "source",
        "chi2_micro",
        "m",
        F.expr(
            "CAST(round(1000000.0"
            " * exp(-CAST(chi2_micro AS DOUBLE) / 2000000.0)) AS BIGINT)"
        ).alias("p_micro"),
    )
    # rank + step-up run on the |sources|-bounded relation: the single
    # partition these windows collapse to holds one row per source, not
    # per document — bounded state by construction.
    r = p.withColumn(
        "k",
        F.row_number()
        .over(Window.orderBy("p_micro", "source"))
        .cast("long"),
    )
    kmax = r.agg(
        F.coalesce(
            F.max(
                F.when(
                    F.col("p_micro") * F.col("m") <= 50000 * F.col("k"),
                    F.col("k"),
                )
            ),
            F.lit(0).cast("long"),
        ).alias("kmax")
    )
    return (
        r.crossJoin(F.broadcast(kmax))
        .select(
            "source",
            "chi2_micro",
            "p_micro",
            "k",
            (F.col("k") <= F.col("kmax")).alias("rejected"),
        )
        .orderBy("k")
    )


# --- q282: Mantel-Haenszel pooled odds ratio --------------------------------


@register(
    "q282_mantel_haenszel",
    oracle="""
    WITH per AS (
      SELECT source,
             CAST(sum(CASE WHEN lang = 'en' AND n_chars >= 300
                      THEN 1 ELSE 0 END) AS BIGINT) AS a,
             CAST(sum(CASE WHEN lang = 'en' AND n_chars < 300
                      THEN 1 ELSE 0 END) AS BIGINT) AS b,
             CAST(sum(CASE WHEN lang <> 'en' AND n_chars >= 300
                      THEN 1 ELSE 0 END) AS BIGINT) AS c,
             CAST(sum(CASE WHEN lang <> 'en' AND n_chars < 300
                      THEN 1 ELSE 0 END) AS BIGINT) AS d
      FROM documents GROUP BY source),
    q AS (
      SELECT a,
             CAST(round(1000000.0 * a * d / (a + b + c + d)) AS BIGINT)
               AS ad_micro,
             CAST(round(1000000.0 * b * c / (a + b + c + d)) AS BIGINT)
               AS bc_micro,
             CAST(round(1000000.0 * (a + b) * (a + c)
                  / (a + b + c + d)) AS BIGINT) AS e_micro,
             CASE WHEN a + b + c + d > 1 THEN
               CAST(round(1000000.0 * ((CAST(a + b AS DOUBLE) * (c + d))
                    * (CAST(a + c AS DOUBLE) * (b + d)))
                    / ((CAST(a + b + c + d AS DOUBLE)
                        * (a + b + c + d)) * (a + b + c + d - 1)))
                    AS BIGINT)
             ELSE 0 END AS v_micro
      FROM per),
    s AS (
      SELECT CAST(count(*) AS BIGINT) AS n_strata,
             CAST(sum(a) AS BIGINT) AS sum_a,
             CAST(sum(ad_micro) AS BIGINT) AS sum_ad_micro,
             CAST(sum(bc_micro) AS BIGINT) AS sum_bc_micro,
             CAST(sum(e_micro) AS BIGINT) AS sum_e_micro,
             CAST(sum(v_micro) AS BIGINT) AS sum_v_micro
      FROM q)
    SELECT n_strata, sum_a, sum_ad_micro, sum_bc_micro,
           CAST(CASE WHEN sum_bc_micro > 0 THEN
                round(1000.0 * sum_ad_micro / sum_bc_micro)
                ELSE 0 END AS BIGINT) AS or_mh_milli,
           CAST(CASE WHEN sum_v_micro > 0 THEN
                round((CAST(1000000 * sum_a - sum_e_micro AS DOUBLE)
                       * (1000000 * sum_a - sum_e_micro)) / 1000000.0
                      / sum_v_micro)
                ELSE 0 END AS BIGINT) AS cmh_chi2_milli
    FROM s
    """,
    doc="MANTEL-HAENSZEL pooled odds ratio + Cochran-Mantel-Haenszel "
    "test across source strata: does being English associate with "
    "long documents (n_chars >= 300) AFTER controlling for source? "
    "The stratified-confounding companion to q250's Simpson screen — "
    "q250 flags the reversal, MH gives the adjusted effect size and "
    "its significance. Per source a 2x2 of {en, not} x {long, short}; "
    "OR_MH = sum(a_i*d_i/n_i) / sum(b_i*c_i/n_i); CMH chi2 (1 dof, no "
    "continuity correction — documented) = (sum a_i - sum E_i)^2 / "
    "sum V_i with the hypergeometric E_i, V_i. Exactness: cells are "
    "int64 from ONE scan; each per-stratum rational term (ad/n, bc/n, "
    "E, V) is quantized to integer micro BEFORE the cross-strata sum "
    "(the standing q100 discipline), so the sums are exact int64 on "
    "both engines; the two final divisions are single double ops on "
    "those int64s. Zero-denominator guards return 0 (documented "
    "convention, matches q277). Scale: the scan folds map-side onto "
    "|sources| rows; everything after is arithmetic on one row.",
    tags=("analytics", "stratified", "odds-ratio", "cmh", "scale"),
)
def q282_mantel_haenszel(spark: SparkSession, sf_dir: str) -> DataFrame:
    per = (
        t(spark, sf_dir, "documents")
        .select(
            "source",
            (F.col("lang") == "en").alias("en"),
            (F.col("n_chars") >= 300).alias("lng"),
        )
        .groupBy("source")
        .agg(
            F.sum(F.when(F.col("en") & F.col("lng"), 1).otherwise(0))
            .cast("long")
            .alias("a"),
            F.sum(F.when(F.col("en") & ~F.col("lng"), 1).otherwise(0))
            .cast("long")
            .alias("b"),
            F.sum(F.when(~F.col("en") & F.col("lng"), 1).otherwise(0))
            .cast("long")
            .alias("c"),
            F.sum(F.when(~F.col("en") & ~F.col("lng"), 1).otherwise(0))
            .cast("long")
            .alias("d"),
        )
    )
    q = per.select(
        "a",
        F.expr(
            "CAST(round(1000000.0 * a * d / (a + b + c + d)) AS BIGINT)"
        ).alias("ad_micro"),
        F.expr(
            "CAST(round(1000000.0 * b * c / (a + b + c + d)) AS BIGINT)"
        ).alias("bc_micro"),
        F.expr(
            "CAST(round(1000000.0 * (a + b) * (a + c)"
            " / (a + b + c + d)) AS BIGINT)"
        ).alias("e_micro"),
        F.expr(
            "CASE WHEN a + b + c + d > 1 THEN"
            " CAST(round(1000000.0 * ((CAST(a + b AS DOUBLE) * (c + d))"
            " * (CAST(a + c AS DOUBLE) * (b + d)))"
            " / ((CAST(a + b + c + d AS DOUBLE)"
            " * (a + b + c + d)) * (a + b + c + d - 1)))"
            " AS BIGINT) ELSE 0 END"
        ).alias("v_micro"),
    )
    s = q.agg(
        F.count(F.lit(1)).cast("long").alias("n_strata"),
        F.sum("a").cast("long").alias("sum_a"),
        F.sum("ad_micro").cast("long").alias("sum_ad_micro"),
        F.sum("bc_micro").cast("long").alias("sum_bc_micro"),
        F.sum("e_micro").cast("long").alias("sum_e_micro"),
        F.sum("v_micro").cast("long").alias("sum_v_micro"),
    )
    return s.select(
        "n_strata",
        "sum_a",
        "sum_ad_micro",
        "sum_bc_micro",
        F.expr(
            "CAST(CASE WHEN sum_bc_micro > 0 THEN"
            " round(1000.0 * sum_ad_micro / sum_bc_micro)"
            " ELSE 0 END AS BIGINT)"
        ).alias("or_mh_milli"),
        F.expr(
            "CAST(CASE WHEN sum_v_micro > 0 THEN"
            " round((CAST(1000000 * sum_a - sum_e_micro AS DOUBLE)"
            " * (1000000 * sum_a - sum_e_micro)) / 1000000.0"
            " / sum_v_micro) ELSE 0 END AS BIGINT)"
        ).alias("cmh_chi2_milli"),
    )


# --- q283: Cramer's V association matrix ------------------------------------


@register(
    "q283_cramers_v",
    oracle="""
    WITH base AS (
      SELECT lang AS x1, source AS x2,
             CAST(n_chars // 100 AS BIGINT) AS x3,
             CAST(count(*) AS BIGINT) AS cnt
      FROM documents GROUP BY 1, 2, 3),
    pairs AS (
      SELECT 'lang_x_source' AS pair, x1 AS u, x2 AS v, sum(cnt) AS o
      FROM base GROUP BY 2, 3
      UNION ALL
      SELECT 'lang_x_lenb', x1, CAST(x3 AS VARCHAR), sum(cnt)
      FROM base GROUP BY 2, 3
      UNION ALL
      SELECT 'source_x_lenb', x2, CAST(x3 AS VARCHAR), sum(cnt)
      FROM base GROUP BY 2, 3),
    marg AS (
      SELECT pair, u, v, o,
             sum(o) OVER (PARTITION BY pair, u) AS rt,
             sum(o) OVER (PARTITION BY pair, v) AS ct,
             sum(o) OVER (PARTITION BY pair) AS n
      FROM pairs),
    chi AS (
      SELECT pair,
             CAST(max(n) AS BIGINT) AS n,
             CAST(count(DISTINCT u) AS BIGINT) AS r,
             CAST(count(DISTINCT v) AS BIGINT) AS c,
             CAST(sum(CAST(round(1000000.0
               * (CAST(o AS DOUBLE) - CAST(rt AS DOUBLE) * ct / n)
               * (CAST(o AS DOUBLE) - CAST(rt AS DOUBLE) * ct / n)
               / (CAST(rt AS DOUBLE) * ct / n)) AS BIGINT)) AS BIGINT)
               AS chi2_micro
      FROM marg GROUP BY pair)
    SELECT pair, n, r, c, chi2_micro,
           CAST(round(1000.0 * sqrt((CAST(chi2_micro AS DOUBLE)
                / 1000000.0) / (CAST(n AS DOUBLE)
                * least(r - 1, c - 1)))) AS BIGINT) AS v_milli
    FROM chi
    ORDER BY pair
    """,
    doc="CRAMER'S V association matrix over the three categorical "
    "axes of the corpus (lang, source, and the n_chars//100 length "
    "bucket) — the normalized does-X-predict-Y screen a mixture "
    "designer reads before trusting per-source quotas (chi-square "
    "alone grows with n; V in [0,1] is comparable across pairs). ONE "
    "document scan folds to the bounded lang x source x lenb cube; "
    "all three pairwise contingency tables, their marginals (windows "
    "over the bounded relation), and the chi-squares derive from that "
    "cube without touching documents again. Exactness: cube counts "
    "are int64; each cell's (O-E)^2/E is quantized to integer micro "
    "BEFORE the per-pair sum (standing q100 discipline); V's sqrt is "
    "a single double op on the int64 sum, rounded to milli. Zero "
    "cells contribute nothing by construction (absent cube rows), "
    "matching the observed-cells chi-square both engines compute. "
    "Scale: cube size is a product of categorical cardinalities — "
    "independent of corpus rows; the windows run on that bounded "
    "relation.",
    tags=("analytics", "association", "chi-square", "cramers-v", "scale"),
)
def q283_cramers_v(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    base = (
        t(spark, sf_dir, "documents")
        .select(
            F.col("lang").alias("x1"),
            F.col("source").alias("x2"),
            F.expr("CAST(n_chars DIV 100 AS BIGINT)").alias("x3"),
        )
        .groupBy("x1", "x2", "x3")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    pairs = (
        base.groupBy(
            F.lit("lang_x_source").alias("pair"),
            F.col("x1").alias("u"),
            F.col("x2").alias("v"),
        )
        .agg(F.sum("cnt").alias("o"))
        .unionAll(
            base.groupBy(
                F.lit("lang_x_lenb").alias("pair"),
                F.col("x1").alias("u"),
                F.col("x3").cast("string").alias("v"),
            ).agg(F.sum("cnt").alias("o"))
        )
        .unionAll(
            base.groupBy(
                F.lit("source_x_lenb").alias("pair"),
                F.col("x2").alias("u"),
                F.col("x3").cast("string").alias("v"),
            ).agg(F.sum("cnt").alias("o"))
        )
    )
    # the windows below run on the bounded contingency relation (a few
    # hundred cells), not on documents — single-partition is by design
    marg = (
        pairs.withColumn("rt", F.sum("o").over(Window.partitionBy("pair", "u")))
        .withColumn("ct", F.sum("o").over(Window.partitionBy("pair", "v")))
        .withColumn("n", F.sum("o").over(Window.partitionBy("pair")))
    )
    chi = marg.groupBy("pair").agg(
        F.max("n").cast("long").alias("n"),
        F.countDistinct("u").cast("long").alias("r"),
        F.countDistinct("v").cast("long").alias("c"),
        F.sum(
            F.expr(
                "CAST(round(1000000.0"
                " * (CAST(o AS DOUBLE) - CAST(rt AS DOUBLE) * ct / n)"
                " * (CAST(o AS DOUBLE) - CAST(rt AS DOUBLE) * ct / n)"
                " / (CAST(rt AS DOUBLE) * ct / n)) AS BIGINT)"
            )
        )
        .cast("long")
        .alias("chi2_micro"),
    )
    return chi.select(
        "pair",
        "n",
        "r",
        "c",
        "chi2_micro",
        F.expr(
            "CAST(round(1000.0 * sqrt((CAST(chi2_micro AS DOUBLE)"
            " / 1000000.0) / (CAST(n AS DOUBLE)"
            " * least(r - 1, c - 1)))) AS BIGINT)"
        ).alias("v_milli"),
    ).orderBy("pair")


# --- q286: logistic regression via exact-quantized IRLS ----------------------
#
# The per-step expression templates are shared VERBATIM between the Spark
# side (F.expr) and the DuckDB oracle: both engines parse the same text
# into the same IEEE double operation tree, and every cross-row sum is of
# per-row int64-quantized contributions, so the fitted coefficients are
# bit-identical by construction.

_LR_X = (
    "CAST(n_chars AS DOUBLE) / 100.0 AS x1, "
    "CAST(length(text) - length(replace(text, ' ', '')) AS DOUBLE)"
    " / 100.0 AS x2, "
    "CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END AS y"
)

_LR_MU = (
    "(1.0 / (1.0 + exp(-(CAST(w0 AS DOUBLE) / 1000000.0"
    " + CAST(w1 AS DOUBLE) / 1000000.0 * x1"
    " + CAST(w2 AS DOUBLE) / 1000000.0 * x2))))"
)


def _lr_contribs() -> str:
    """Per-row int64-quantized gradient/Hessian contributions at w."""
    mu, out = _LR_MU, []
    for name, expr in [
        ("g0c", f"(y - {mu})"),
        ("g1c", f"x1 * (y - {mu})"),
        ("g2c", f"x2 * (y - {mu})"),
        ("h00c", f"({mu} * (1.0 - {mu}))"),
        ("h01c", f"({mu} * (1.0 - {mu})) * x1"),
        ("h02c", f"({mu} * (1.0 - {mu})) * x2"),
        ("h11c", f"({mu} * (1.0 - {mu})) * x1 * x1"),
        ("h12c", f"({mu} * (1.0 - {mu})) * x1 * x2"),
        ("h22c", f"({mu} * (1.0 - {mu})) * x2 * x2"),
    ]:
        out.append(
            f"CAST(round(1000000.0 * {expr}) AS BIGINT) AS {name}"
        )
    return ", ".join(out)


_LR_SUMS = ", ".join(
    f"CAST(sum({c}c) AS BIGINT) AS {c}"
    for c in ("g0", "g1", "g2", "h00", "h01", "h02", "h11", "h12", "h22")
)


def _lr_solve() -> str:
    """Newton update w += H^-1 g by Cramer's rule on the int64 sums
    (CAST to double before every product — triple products overflow
    int64), emitted as the three new w*_micro columns."""
    det = (
        "(CAST(h00 AS DOUBLE) * (CAST(h11 AS DOUBLE) * h22"
        " - CAST(h12 AS DOUBLE) * h12)"
        " - CAST(h01 AS DOUBLE) * (CAST(h01 AS DOUBLE) * h22"
        " - CAST(h12 AS DOUBLE) * h02)"
        " + CAST(h02 AS DOUBLE) * (CAST(h01 AS DOUBLE) * h12"
        " - CAST(h11 AS DOUBLE) * h02))"
    )
    d0 = (
        "(CAST(g0 AS DOUBLE) * (CAST(h11 AS DOUBLE) * h22"
        " - CAST(h12 AS DOUBLE) * h12)"
        " - CAST(h01 AS DOUBLE) * (CAST(g1 AS DOUBLE) * h22"
        " - CAST(h12 AS DOUBLE) * g2)"
        " + CAST(h02 AS DOUBLE) * (CAST(g1 AS DOUBLE) * h12"
        " - CAST(h11 AS DOUBLE) * g2))"
    )
    d1 = (
        "(CAST(h00 AS DOUBLE) * (CAST(g1 AS DOUBLE) * h22"
        " - CAST(g2 AS DOUBLE) * h12)"
        " - CAST(g0 AS DOUBLE) * (CAST(h01 AS DOUBLE) * h22"
        " - CAST(h12 AS DOUBLE) * h02)"
        " + CAST(h02 AS DOUBLE) * (CAST(h01 AS DOUBLE) * g2"
        " - CAST(g1 AS DOUBLE) * h02))"
    )
    d2 = (
        "(CAST(h00 AS DOUBLE) * (CAST(h11 AS DOUBLE) * g2"
        " - CAST(h12 AS DOUBLE) * g1)"
        " - CAST(h01 AS DOUBLE) * (CAST(h01 AS DOUBLE) * g2"
        " - CAST(g1 AS DOUBLE) * h02)"
        " + CAST(g0 AS DOUBLE) * (CAST(h01 AS DOUBLE) * h12"
        " - CAST(h11 AS DOUBLE) * h02))"
    )
    outs = []
    for k, dk in (("0", d0), ("1", d1), ("2", d2)):
        outs.append(
            f"CASE WHEN abs({det}) > 0.0 THEN w{k}"
            f" + CAST(round(1000000.0 * ({dk} / {det})) AS BIGINT)"
            f" ELSE w{k} END AS w{k}"
        )
    return ", ".join(outs)


_LR_LL = (
    "CAST(sum(CAST(round(1000000.0 * (y * ln(greatest("
    f"{_LR_MU}, 1e-12)) + (1.0 - y) * ln(greatest(1.0 - {_LR_MU},"
    " 1e-12)))) AS BIGINT)) AS BIGINT) AS ll_micro,"
    " CAST(count(*) AS BIGINT) AS n"
)


def _irls_weights(spark: SparkSession, base: DataFrame) -> DataFrame:
    """Two Newton steps from w = 0 on the shared templates; returns the
    one-row (w0, w1, w2) micro-int64 weight relation."""
    w = spark.range(1).selectExpr(
        "CAST(0 AS BIGINT) AS w0", "CAST(0 AS BIGINT) AS w1",
        "CAST(0 AS BIGINT) AS w2",
    )
    for _ in range(2):
        c = base.crossJoin(F.broadcast(w)).selectExpr(
            *_split_top(_lr_contribs())
        )
        s = c.selectExpr(*_split_top(_LR_SUMS))
        w = s.crossJoin(F.broadcast(w)).selectExpr(*_split_top(_lr_solve()))
    return w


def _lr_chain_sql() -> str:
    """The two-step IRLS fit as a CTE chain ending in w_2 — shared by
    q286 (reports the fit) and q303 (mines with it)."""
    return f"""base AS (
      SELECT {_LR_X} FROM documents),
    w_init AS (
      SELECT CAST(0 AS BIGINT) AS w0, CAST(0 AS BIGINT) AS w1,
             CAST(0 AS BIGINT) AS w2),
    c1 AS (
      SELECT {_lr_contribs()}
      FROM base CROSS JOIN w_init),
    s1 AS (SELECT {_LR_SUMS} FROM c1),
    w_1 AS (
      SELECT {_lr_solve()}
      FROM s1 CROSS JOIN w_init),
    c2 AS (
      SELECT {_lr_contribs()}
      FROM base CROSS JOIN w_1),
    s2 AS (SELECT {_LR_SUMS} FROM c2),
    w_2 AS (
      SELECT {_lr_solve()}
      FROM s2 CROSS JOIN w_1)"""


@register(
    "q286_irls_logistic",
    oracle=f"""
    WITH {_lr_chain_sql()},
    ll AS (
      SELECT {_LR_LL}
      FROM base CROSS JOIN w_2)
    SELECT ll.n, w_2.w0 AS w0_micro, w_2.w1 AS w1_micro,
           w_2.w2 AS w2_micro, ll.ll_micro
    FROM w_2 CROSS JOIN ll
    """,
    doc="LOGISTIC REGRESSION by two unrolled IRLS/Newton steps — the "
    "quality-classifier fit (P[lang=en] from document length and "
    "word-count features) done INSIDE the engine, no sklearn, no "
    "driver-side math: per step, one scan computes per-row gradient "
    "and Hessian contributions at the current w, each quantized to "
    "integer micro BEFORE the cross-row sum (float sums are "
    "order-dependent across engines; int64 sums are exact — the "
    "standing q100 discipline applied to an ITERATIVE fit), and the "
    "3x3 Newton solve is Cramer's rule on those int64 sums with the "
    "shared-verbatim expression template, so Spark and DuckDB walk "
    "the IDENTICAL IEEE operation tree: coefficients match to the "
    "bit. w is carried between steps as micro int64 (w0: mu = 0.5 "
    "exactly on both engines). Final row: n, the step-2 coefficients, "
    "and the micro-quantized log-likelihood (mu clamped at 1e-12 for "
    "ln). Scale: 3 scans by design (2 Newton steps + LL eval), each "
    "folding map-side to one 9-cell row; the weight relation rides a "
    "one-row broadcast; per-row contributions stay in codegen. int64 "
    "caveat: contribution sums stay exact under 2^63 (~1e12 rows at "
    "these feature scales); beyond that drop the quantum to 1e3.",
    tags=("analytics", "regression", "logistic", "irls", "iterative",
          "scale"),
)
def q286_irls_logistic(spark: SparkSession, sf_dir: str) -> DataFrame:
    base = t(spark, sf_dir, "documents").selectExpr(*_split_top(_LR_X))
    w = _irls_weights(spark, base)
    ll = base.crossJoin(F.broadcast(w)).selectExpr(*_split_top(_LR_LL))
    return w.crossJoin(F.broadcast(ll)).selectExpr(
        "n", "w0 AS w0_micro", "w1 AS w1_micro", "w2 AS w2_micro",
        "ll_micro",
    )


def _split_top(select_list: str) -> list[str]:
    """Split a SQL select list on top-level commas (the shared templates
    contain commas inside parens)."""
    out, depth, cur = [], 0, []
    for ch in select_list:
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        if ch == "," and depth == 0:
            out.append("".join(cur).strip())
            cur = []
        else:
            cur.append(ch)
    if cur:
        out.append("".join(cur).strip())
    return out


# --- q287: isotonic (PAV) calibration via the minimax formula -----------------


@register(
    "q287_isotonic_calibration",
    oracle="""
    WITH u AS (
      SELECT user_id,
             least(20, CAST(sum(CASE WHEN event_type = 'click'
                      THEN 1 ELSE 0 END) AS BIGINT)) AS c,
             CASE WHEN sum(CASE WHEN event_type = 'purchase'
                      THEN 1 ELSE 0 END)
                   > sum(CASE WHEN event_type = 'click'
                      THEN 1 ELSE 0 END)
                  THEN 1 ELSE 0 END AS o
      FROM events GROUP BY user_id),
    b AS (
      SELECT c, CAST(count(*) AS BIGINT) AS n, CAST(sum(o) AS BIGINT) AS s
      FROM u GROUP BY c),
    ivl AS (
      SELECT ja.c AS cj, kb.c AS ck,
             CAST(round(1000000.0 * sum(m.s) / sum(m.n)) AS BIGINT)
               AS avg_micro
      FROM b ja JOIN b kb ON kb.c >= ja.c
      JOIN b m ON m.c BETWEEN ja.c AND kb.c
      GROUP BY 1, 2),
    mn AS (
      SELECT b.c, ivl.cj, min(ivl.avg_micro) AS lo
      FROM b JOIN ivl ON ivl.cj <= b.c AND ivl.ck >= b.c
      GROUP BY 1, 2),
    fit AS (
      SELECT c, CAST(max(lo) AS BIGINT) AS fitted_micro
      FROM mn GROUP BY c)
    SELECT b.c, b.n, b.s,
           CAST(round(1000000.0 * b.s / b.n) AS BIGINT) AS raw_micro,
           fit.fitted_micro
    FROM b JOIN fit ON fit.c = b.c
    ORDER BY b.c
    """,
    doc="ISOTONIC (PAV) CALIBRATION of the q276 forecast-bin frame — "
    "the monotone recalibration map every probability consumer wants "
    "when q200's reliability curve wiggles: fit the least-squares "
    "NON-DECREASING g(bin) to the observed rates. Computed by the "
    "pool-adjacent-violators CLOSED FORM g(i) = max_{j<=i} min_{k>=i} "
    "weightedAvg(rates over bins j..k) — no sequential stack, no "
    "driver loop: with <= 21 forecast bins the interval relation is "
    "<= 231 rows, so the triangle self-join, the per-(bin, j) min, "
    "and the per-bin max are all joins/aggs on a BOUNDED relation. "
    "Exactness: bin counts are int64 from one user-keyed scan; each "
    "interval's weighted average sum(s)/sum(n) is one double division "
    "quantized to micro; min/max on those int64s are exact (the "
    "minimax runs ON the quantized averages — both engines build the "
    "identical map; it can differ from infinite-precision PAV only "
    "at sub-micro ties, documented). Scale: the only corpus-sized "
    "work is the user-keyed agg; everything isotonic happens on 21 "
    "rows.",
    tags=("analytics", "calibration", "isotonic", "pav", "scale"),
)
def q287_isotonic_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    u = (
        t(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.least(
                F.lit(20).cast("long"),
                F.count(F.when(F.col("event_type") == "click", 1))
                .cast("long"),
            ).alias("c"),
            F.when(
                F.count(F.when(F.col("event_type") == "purchase", 1))
                > F.count(F.when(F.col("event_type") == "click", 1)),
                F.lit(1),
            )
            .otherwise(F.lit(0))
            .alias("o"),
        )
    )
    b = u.groupBy("c").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("o").cast("long").alias("s"),
    )
    # the bounded (<= 21 rows) bin relation feeds four consumers below;
    # checkpoint so the user-keyed scan runs once
    b = b.localCheckpoint(eager=False)
    ja = b.select(F.col("c").alias("cj"))
    kb = b.select(F.col("c").alias("ck"))
    m = b.select(F.col("c").alias("cm"), "n", "s")
    ivl = (
        ja.join(F.broadcast(kb), F.col("ck") >= F.col("cj"))
        .join(
            F.broadcast(m),
            (F.col("cm") >= F.col("cj")) & (F.col("cm") <= F.col("ck")),
        )
        .groupBy("cj", "ck")
        .agg(
            F.expr(
                "CAST(round(1000000.0 * sum(s) / sum(n)) AS BIGINT)"
            ).alias("avg_micro")
        )
    )
    mn = (
        b.select("c")
        .join(
            F.broadcast(ivl),
            (F.col("cj") <= F.col("c")) & (F.col("ck") >= F.col("c")),
        )
        .groupBy("c", "cj")
        .agg(F.min("avg_micro").alias("lo"))
    )
    fit = mn.groupBy("c").agg(
        F.max("lo").cast("long").alias("fitted_micro")
    )
    return (
        b.join(F.broadcast(fit), "c")
        .select(
            "c",
            "n",
            "s",
            F.expr("CAST(round(1000000.0 * s / n) AS BIGINT)").alias(
                "raw_micro"
            ),
            "fitted_micro",
        )
        .orderBy("c")
    )


# --- q298: weight-of-evidence / information value ------------------------------

_WOE_BINS = 10


@register(
    "q298_woe_iv",
    oracle=f"""
    WITH d AS (
      SELECT doc_id, n_chars,
             CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
      FROM documents),
    rk AS (
      SELECT doc_id, n_chars, y,
             row_number() OVER (ORDER BY n_chars, doc_id) AS rn,
             count(*) OVER () AS n
      FROM d),
    binned AS (
      SELECT CAST((rn - 1) * {_WOE_BINS} // n AS BIGINT) AS bin, y
      FROM rk),
    per AS (
      SELECT bin,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(y) AS BIGINT) AS g,
             CAST(count(*) - sum(y) AS BIGINT) AS b
      FROM binned GROUP BY bin),
    tot AS (
      SELECT CAST(sum(g) AS BIGINT) AS gt, CAST(sum(b) AS BIGINT) AS bt
      FROM per)
    SELECT bin, per.n, g, b,
           CAST(round(1000000.0 * ln(((CAST(g AS DOUBLE) + 0.5) / gt)
                / ((CAST(b AS DOUBLE) + 0.5) / bt))) AS BIGINT)
             AS woe_micro,
           CAST(round(1000000.0 * (((CAST(g AS DOUBLE) + 0.5) / gt)
                - ((CAST(b AS DOUBLE) + 0.5) / bt))
                * round(1000000.0 * ln(((CAST(g AS DOUBLE) + 0.5) / gt)
                / ((CAST(b AS DOUBLE) + 0.5) / bt))) / 1000000.0)
             AS BIGINT) AS iv_contrib_micro
    FROM per CROSS JOIN tot
    ORDER BY bin
    """,
    doc="WEIGHT OF EVIDENCE / INFORMATION VALUE of document length "
    "for the lang=en target — the credit-scoring-style predictive- "
    "power screen a feature pipeline runs before q286's logistic "
    "fit (IV < 0.02: drop the feature; > 0.3: strong): equi-depth "
    "decile bins by the deterministic total order (n_chars, "
    "doc_id), per-bin WoE = ln((g/G)/(b/B)) with the standard "
    "0.5-cell adjustment (zero-cell safe), and the per-bin IV "
    "contribution. Exactness: bin = (rn-1)*10 DIV n on exact "
    "int64 ranks (no NTILE — its tie placement is not pinned "
    "across engines); WoE is micro-quantized from the shared "
    "double chain; the IV product re-uses the ALREADY-QUANTIZED "
    "WoE (so both engines multiply the identical int64). Scale: "
    "the rank here is one window; the registered escape is the "
    "two-pass global index of q165/q167 (operators/indexing), "
    "which this query uses on the Spark side — everything after "
    "is arithmetic on {_WOE_BINS} rows.",
    tags=("analytics", "woe", "iv", "binning", "scale"),
)
def q298_woe_iv(spark: SparkSession, sf_dir: str) -> DataFrame:
    from columnarmodeling_spark.operators.indexing import with_global_index

    d = t(spark, sf_dir, "documents").select(
        "doc_id",
        "n_chars",
        F.when(F.col("lang") == "en", 1).otherwise(0).alias("y"),
    )
    rk = with_global_index(d, ["n_chars", "doc_id"], index_col="rn")
    n_tot = rk.agg(F.count(F.lit(1)).cast("long").alias("n"))
    binned = rk.crossJoin(F.broadcast(n_tot)).select(
        F.expr(f"CAST((rn - 1) * {_WOE_BINS} DIV n AS BIGINT)").alias("bin"),
        "y",
    )
    per = binned.groupBy("bin").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("y").cast("long").alias("g"),
        (F.count(F.lit(1)) - F.sum("y")).cast("long").alias("b"),
    )
    tot = per.agg(
        F.sum("g").cast("long").alias("gt"),
        F.sum("b").cast("long").alias("bt"),
    )
    return (
        per.crossJoin(F.broadcast(tot))
        .select(
            "bin",
            "n",
            "g",
            "b",
            F.expr(
                "CAST(round(1000000.0 * ln(((CAST(g AS DOUBLE) + 0.5) / gt)"
                " / ((CAST(b AS DOUBLE) + 0.5) / bt))) AS BIGINT)"
            ).alias("woe_micro"),
            F.expr(
                "CAST(round(1000000.0 * (((CAST(g AS DOUBLE) + 0.5) / gt)"
                " - ((CAST(b AS DOUBLE) + 0.5) / bt))"
                " * round(1000000.0 * ln(((CAST(g AS DOUBLE) + 0.5) / gt)"
                " / ((CAST(b AS DOUBLE) + 0.5) / bt))) / 1000000.0)"
                " AS BIGINT)"
            ).alias("iv_contrib_micro"),
        )
        .orderBy("bin")
    )


# --- q300: split-conformal coverage eval --------------------------------------


@register(
    "q300_conformal_coverage",
    oracle="""
    WITH u AS (
      SELECT user_id,
             50 * least(20, CAST(sum(CASE WHEN event_type = 'click'
                      THEN 1 ELSE 0 END) AS BIGINT)) AS p_milli,
             CASE WHEN sum(CASE WHEN event_type = 'purchase'
                      THEN 1 ELSE 0 END)
                   > sum(CASE WHEN event_type = 'click'
                      THEN 1 ELSE 0 END)
                  THEN 1000 ELSE 0 END AS o_milli,
             CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 4))
                  AS BIGINT) % 2 AS grp
      FROM events GROUP BY user_id),
    a AS (SELECT grp, abs(o_milli - p_milli) AS a FROM u),
    ncal AS (
      SELECT CAST(count(*) AS BIGINT) AS n_cal
      FROM a WHERE grp = 0),
    dist AS (
      SELECT a, count(*) AS c,
             sum(count(*)) OVER (ORDER BY a) AS cum
      FROM a WHERE grp = 0 GROUP BY a),
    qh AS (
      SELECT min(a) AS q_hat
      FROM dist, ncal
      WHERE cum >= CAST(ceil(0.9 * (n_cal + 1)) AS BIGINT)),
    ev AS (
      SELECT CAST(count(*) AS BIGINT) AS n_eval,
             CAST(sum(CASE WHEN a.a <= qh.q_hat THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_covered
      FROM a CROSS JOIN qh WHERE grp = 1)
    SELECT ncal.n_cal, ev.n_eval, CAST(qh.q_hat AS BIGINT) AS q_hat_milli,
           ev.n_covered,
           CAST(round(1000.0 * ev.n_covered / ev.n_eval) AS BIGINT)
             AS coverage_milli
    FROM ncal CROSS JOIN qh CROSS JOIN ev
    """,
    doc="SPLIT-CONFORMAL COVERAGE eval of the q276 forecast frame — "
    "the distribution-free calibration check that turns any score "
    "into a coverage guarantee: nonconformity a = |outcome - "
    "forecast| in exact milli units, the 90% conformal quantile "
    "q_hat = the ceil(0.9*(n+1))-th smallest a on an md5-hash "
    "calibration split, and the empirical coverage P[a <= q_hat] on "
    "the disjoint eval split (marginal validity >= 90% in "
    "expectation over splits — the number a forecast consumer "
    "audits). Exactness: a takes <= 42 distinct values (o in {0,1}, "
    "p in {0..20}/20), so the order statistic folds to a BOUNDED "
    "distribution relation and the cumulative window runs on it — "
    "never a global sort of users; all counts int64, one rounded "
    "division. Scale: the user-keyed agg is the only corpus-sized "
    "work (the q276/q287 shape); everything conformal runs on the "
    "bounded a-distribution.",
    tags=("analytics", "conformal", "calibration", "eval", "scale"),
)
def q300_conformal_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    u = (
        t(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            (
                F.lit(50)
                * F.least(
                    F.lit(20).cast("long"),
                    F.count(
                        F.when(F.col("event_type") == "click", 1)
                    ).cast("long"),
                )
            ).alias("p_milli"),
            F.when(
                F.count(F.when(F.col("event_type") == "purchase", 1))
                > F.count(F.when(F.col("event_type") == "click", 1)),
                F.lit(1000),
            )
            .otherwise(F.lit(0))
            .alias("o_milli"),
        )
        .withColumn(
            "grp",
            F.expr(
                "CAST(conv(substr(md5(CAST(user_id AS STRING)), 1, 4),"
                " 16, 10) AS BIGINT) % 2"
            ),
        )
    )
    a = u.select(
        "grp", F.abs(F.col("o_milli") - F.col("p_milli")).alias("a")
    ).localCheckpoint(eager=False)
    cal = a.where(F.col("grp") == 0)
    ncal = cal.agg(F.count(F.lit(1)).cast("long").alias("n_cal"))
    # the cumulative window runs on the <=42-row bounded distribution
    dist = (
        cal.groupBy("a")
        .agg(F.count(F.lit(1)).alias("c"))
        .withColumn("cum", F.sum("c").over(Window.orderBy("a")))
    )
    qh = (
        dist.crossJoin(F.broadcast(ncal))
        .where(
            F.col("cum")
            >= F.expr("CAST(ceil(0.9 * (n_cal + 1)) AS BIGINT)")
        )
        .agg(F.min("a").alias("q_hat"))
    )
    ev = (
        a.where(F.col("grp") == 1)
        .crossJoin(F.broadcast(qh))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_eval"),
            F.sum(F.when(F.col("a") <= F.col("q_hat"), 1).otherwise(0))
            .cast("long")
            .alias("n_covered"),
        )
    )
    return (
        ncal.crossJoin(F.broadcast(qh))
        .crossJoin(F.broadcast(ev))
        .select(
            "n_cal",
            "n_eval",
            F.col("q_hat").cast("long").alias("q_hat_milli"),
            "n_covered",
            F.expr(
                "CAST(round(1000.0 * n_covered / n_eval) AS BIGINT)"
            ).alias("coverage_milli"),
        )
    )


# --- q303: hard-example mining with the q286 model ----------------------------

_HEM_K = 5  # hardest docs kept per source

_LR_ROW_LOSS = (
    "CAST(round(-1000000.0 * (y * ln(greatest("
    f"{_LR_MU}, 1e-12)) + (1.0 - y) * ln(greatest(1.0 - {_LR_MU},"
    " 1e-12)))) AS BIGINT)"
)


@register(
    "q303_hard_example_mining",
    oracle=f"""
    WITH {_lr_chain_sql()},
    base2 AS (
      SELECT doc_id, source, {_LR_X} FROM documents),
    scored AS (
      SELECT doc_id, source, CAST(y AS BIGINT) AS y,
             {_LR_ROW_LOSS} AS loss_micro
      FROM base2 CROSS JOIN w_2),
    rk AS (
      SELECT doc_id, source, y, loss_micro,
             row_number() OVER (PARTITION BY source
                                ORDER BY loss_micro DESC, doc_id) AS rn
      FROM scored)
    SELECT source, CAST(rn AS BIGINT) AS pick, doc_id, y, loss_micro
    FROM rk WHERE rn <= {_HEM_K}
    ORDER BY source, pick
    """,
    doc="HARD-EXAMPLE MINING with the q286 model — the active-learning "
    f"loop closed inside the engine: refit the two-step IRLS logistic "
    f"(the shared _lr_chain templates, bit-identical weights), score "
    f"EVERY document's per-row log loss at the fitted w, and keep the "
    f"{_HEM_K} hardest docs per source — the relabel/inspect queue a "
    "data curator actually pulls (high-loss docs are mislabels, "
    "drift, or genuinely hard — all worth eyes). Exactness: the "
    "weights are the q286 int64 micro relation; each doc's loss is "
    "one shared-template IEEE chain quantized to micro BEFORE the "
    "rank (ties broken by doc_id, so both engines pick the identical "
    "queue). Scale: 2 fit scans + 1 scoring scan, all map-side; the "
    "per-source rank is a partitioned window (never global), with "
    "the q272 per-partition-top-k escape applying at extreme "
    "per-source cardinality.",
    tags=("analytics", "mining", "logistic", "active-learning", "scale"),
)
def q303_hard_example_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    docs = t(spark, sf_dir, "documents")
    base = docs.selectExpr(*_split_top(_LR_X))
    w = _irls_weights(spark, base)
    base2 = docs.selectExpr("doc_id", "source", *_split_top(_LR_X))
    scored = base2.crossJoin(F.broadcast(w)).select(
        "doc_id",
        "source",
        F.col("y").cast("long").alias("y"),
        F.expr(_LR_ROW_LOSS).alias("loss_micro"),
    )
    rk = scored.select(
        "doc_id",
        "source",
        "y",
        "loss_micro",
        F.row_number()
        .over(W.partitionBy("source").orderBy(F.desc("loss_micro"), "doc_id"))
        .cast("long")
        .alias("pick"),
    )
    return (
        rk.where(F.col("pick") <= _HEM_K)
        .select("source", "pick", "doc_id", "y", "loss_micro")
        .orderBy("source", "pick")
    )


# --- q304: data-quality rule audit ---------------------------------------------


@register(
    "q304_dq_audit",
    oracle="""
    SELECT 'lineitem_qty_range' AS rule,
           CAST(count(*) AS BIGINT) AS n_checked,
           CAST(sum(CASE WHEN l_quantity < 1 OR l_quantity > 50
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_violations
    FROM lineitem
    UNION ALL
    SELECT 'orders_custkey_fk',
           CAST((SELECT count(*) FROM orders) AS BIGINT),
           CAST((SELECT count(*) FROM orders o
                 WHERE NOT EXISTS (SELECT 1 FROM customer c
                                   WHERE c.c_custkey = o.o_custkey))
                AS BIGINT)
    UNION ALL
    SELECT 'part_pk_unique',
           CAST((SELECT count(*) FROM part) AS BIGINT),
           CAST((SELECT count(*) - count(DISTINCT p_partkey) FROM part)
                AS BIGINT)
    UNION ALL
    SELECT 'events_value_finite',
           CAST(count(*) AS BIGINT),
           CAST(sum(CASE WHEN value IS NULL OR isnan(value)
                    THEN 1 ELSE 0 END) AS BIGINT)
    FROM events
    UNION ALL
    SELECT 'documents_nchars_consistent',
           CAST(count(*) AS BIGINT),
           CAST(sum(CASE WHEN n_chars <> length(text)
                    THEN 1 ELSE 0 END) AS BIGINT)
    FROM documents
    ORDER BY rule
    """,
    doc="DATA-QUALITY RULE AUDIT — the Deequ/dbt-tests-style "
    "constraint sweep a 100 TB warehouse runs on every load: five "
    "rule families over five tables in one result (range check on "
    "lineitem quantity, referential integrity orders->customer via "
    "anti-join, primary-key uniqueness on part, NULL/NaN screen on "
    "event values, and the derived-column consistency n_chars = "
    "length(text)) — each row reports checked/violation counts, so "
    "a scheduler alerts on n_violations > 0 per rule rather than on "
    "a whole-job boolean. Exactness: every check is an exact int64 "
    "count (the FK check is an anti-join count, the PK check is "
    "count - count(distinct)). Scale: each rule is one map-side "
    "fold over its table; the FK anti-join is an equi-join on the "
    "key (broadcastable dim); nothing quadratic, no sort.",
    tags=("analytics", "data-quality", "audit", "scale"),
)
def q304_dq_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem").agg(
        F.count(F.lit(1)).cast("long").alias("n_checked"),
        F.sum(
            F.when(
                (F.col("l_quantity") < 1) | (F.col("l_quantity") > 50), 1
            ).otherwise(0)
        )
        .cast("long")
        .alias("n_violations"),
    ).select(F.lit("lineitem_qty_range").alias("rule"), "n_checked",
             "n_violations")
    orders = t(spark, sf_dir, "orders")
    cust = t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey")
    )
    fk_bad = orders.join(F.broadcast(cust), "o_custkey", "left_anti").agg(
        F.count(F.lit(1)).cast("long").alias("n_violations")
    )
    fk = orders.agg(
        F.count(F.lit(1)).cast("long").alias("n_checked")
    ).crossJoin(F.broadcast(fk_bad)).select(
        F.lit("orders_custkey_fk").alias("rule"), "n_checked",
        "n_violations",
    )
    part = t(spark, sf_dir, "part").agg(
        F.count(F.lit(1)).cast("long").alias("n_checked"),
        (F.count(F.lit(1)) - F.countDistinct("p_partkey"))
        .cast("long")
        .alias("n_violations"),
    ).select(F.lit("part_pk_unique").alias("rule"), "n_checked",
             "n_violations")
    ev = t(spark, sf_dir, "events").agg(
        F.count(F.lit(1)).cast("long").alias("n_checked"),
        F.sum(
            F.when(F.col("value").isNull() | F.isnan("value"), 1).otherwise(0)
        )
        .cast("long")
        .alias("n_violations"),
    ).select(F.lit("events_value_finite").alias("rule"), "n_checked",
             "n_violations")
    docs = t(spark, sf_dir, "documents").agg(
        F.count(F.lit(1)).cast("long").alias("n_checked"),
        F.sum(
            F.when(F.col("n_chars") != F.length("text"), 1).otherwise(0)
        )
        .cast("long")
        .alias("n_violations"),
    ).select(F.lit("documents_nchars_consistent").alias("rule"),
             "n_checked", "n_violations")
    return (
        li.unionByName(fk)
        .unionByName(part)
        .unionByName(ev)
        .unionByName(docs)
        .orderBy("rule")
    )


# --- q306: sequential probability ratio test (SPRT) ---------------------------

# H0: P[value > 50] = 0.30  vs  H1: p = 0.40; alpha = beta = 0.05.
# Boundaries +/- ln(19); increments ln(p1/p0), ln((1-p1)/(1-p0)) — all
# embedded as engine-side constant expressions so both engines fold the
# identical IEEE values.
_SPRT_S = "CAST(round(1000000.0 * ln(0.4 / 0.3)) AS BIGINT)"
_SPRT_F = "CAST(round(1000000.0 * ln(0.6 / 0.7)) AS BIGINT)"
_SPRT_B = "CAST(round(1000000.0 * ln(19.0)) AS BIGINT)"


@register(
    "q306_sprt",
    oracle=f"""
    WITH ev AS (
      SELECT event_type, epoch_us(ts) AS us, event_id,
             CASE WHEN value > 50 THEN {_SPRT_S} ELSE {_SPRT_F} END AS inc
      FROM events),
    walk AS (
      SELECT event_type,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY us, event_id) AS rn,
             sum(inc) OVER (PARTITION BY event_type
                            ORDER BY us, event_id
                            ROWS UNBOUNDED PRECEDING) AS llr
      FROM ev),
    crossing AS (
      SELECT event_type,
             min(rn) AS rn
      FROM walk
      WHERE llr >= {_SPRT_B} OR llr <= -{_SPRT_B}
      GROUP BY event_type),
    att AS (
      SELECT c.event_type, c.rn, w.llr
      FROM crossing c JOIN walk w
        ON w.event_type = c.event_type AND w.rn = c.rn),
    fin AS (
      SELECT event_type, CAST(count(*) AS BIGINT) AS n_total,
             CAST(sum(inc) AS BIGINT) AS llr_final
      FROM ev GROUP BY event_type)
    SELECT f.event_type,
           CASE WHEN a.rn IS NULL THEN 'continue'
                WHEN a.llr >= {_SPRT_B} THEN 'accept_h1'
                ELSE 'accept_h0' END AS decision,
           CAST(coalesce(a.rn, f.n_total) AS BIGINT) AS n_at_decision,
           CAST(coalesce(a.llr, f.llr_final) AS BIGINT) AS llr_micro
    FROM fin f LEFT JOIN att a ON a.event_type = f.event_type
    ORDER BY f.event_type
    """,
    doc="SEQUENTIAL PROBABILITY RATIO TEST per event type — Wald's "
    "always-valid sequential decision (H0: P[value>50] = 0.30 vs H1: "
    "0.40, alpha = beta = 0.05): walk the events in time order, add "
    "ln(p1/p0) per success and ln(q1/q0) per failure, decide at the "
    "FIRST +/- ln(19) crossing — the early-stopping discipline a "
    "fixed-horizon z-test (q191) can't give, reporting how many "
    "events the decision actually needed. Exactness: both increments "
    "and the boundary are engine-side constant-folded expressions "
    "quantized to micro int64, so the running LLR is an exact "
    "integer walk — the crossing row is unambiguous on both engines "
    "(ties in ts broken by event_id). Scale: the walk is a per-type "
    "running sum (window partitioned by event_type); at extreme "
    "per-type volume the registered escape is the q208 segmented "
    "associative prefix-sum (chunk sums compose), since only the "
    "FIRST crossing chunk needs its interior walk expanded.",
    tags=("analytics", "sprt", "sequential", "ab-test", "scale"),
)
def q306_sprt(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    ev = t(spark, sf_dir, "events").select(
        "event_type",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
        "event_id",
        F.expr(
            f"CASE WHEN value > 50 THEN {_SPRT_S} ELSE {_SPRT_F} END"
        ).alias("inc"),
    )
    w = W.partitionBy("event_type").orderBy("us", "event_id")
    walk = ev.select(
        "event_type",
        F.row_number().over(w).alias("rn"),
        F.sum("inc")
        .over(w.rowsBetween(W.unboundedPreceding, 0))
        .alias("llr"),
    ).localCheckpoint(eager=False)
    crossing = (
        walk.where(
            (F.col("llr") >= F.expr(_SPRT_B))
            | (F.col("llr") <= -F.expr(_SPRT_B))
        )
        .groupBy("event_type")
        .agg(F.min("rn").alias("rn"))
    )
    att = crossing.join(walk, ["event_type", "rn"])
    fin = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_total"),
        F.sum("inc").cast("long").alias("llr_final"),
    )
    return (
        fin.join(att, "event_type", "left")
        .select(
            "event_type",
            F.expr(
                f"CASE WHEN rn IS NULL THEN 'continue'"
                f" WHEN llr >= {_SPRT_B} THEN 'accept_h1'"
                f" ELSE 'accept_h0' END"
            ).alias("decision"),
            F.coalesce("rn", "n_total").cast("long").alias("n_at_decision"),
            F.coalesce("llr", "llr_final").cast("long").alias("llr_micro"),
        )
        .orderBy("event_type")
    )


# --- q307: cumulative gains / lift table ---------------------------------------

_LR_SCORE = f"CAST(round(1000000.0 * {_LR_MU}) AS BIGINT)"


@register(
    "q307_gains_table",
    oracle=f"""
    WITH {_lr_chain_sql()},
    base2 AS (
      SELECT doc_id, {_LR_X} FROM documents),
    scored AS (
      SELECT doc_id, CAST(y AS BIGINT) AS y,
             {_LR_SCORE} AS score_micro
      FROM base2 CROSS JOIN w_2),
    rk AS (
      SELECT y,
             row_number() OVER (ORDER BY score_micro DESC, doc_id) AS rn,
             count(*) OVER () AS n
      FROM scored),
    dec AS (
      SELECT CAST((rn - 1) * 10 // n AS BIGINT) AS decile, y
      FROM rk),
    per AS (
      SELECT decile,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(y) AS BIGINT) AS pos
      FROM dec GROUP BY decile),
    cum AS (
      SELECT decile, n, pos,
             CAST(sum(pos) OVER (ORDER BY decile) AS BIGINT) AS cum_pos,
             CAST(sum(pos) OVER () AS BIGINT) AS tot_pos,
             CAST(sum(n) OVER () AS BIGINT) AS tot_n
      FROM per)
    SELECT decile, n, pos, cum_pos,
           CAST(round(1000.0 * cum_pos / tot_pos) AS BIGINT) AS gain_milli,
           CAST(round(1000.0 * (CAST(pos AS DOUBLE) / n)
                / (CAST(tot_pos AS DOUBLE) / tot_n)) AS BIGINT)
             AS lift_milli
    FROM cum
    ORDER BY decile
    """,
    doc="CUMULATIVE GAINS / LIFT TABLE of the q286 model — the decile "
    "chart every targeting decision reads (if I act on the top 10% "
    "scored docs, what fraction of all positives do I capture, and "
    "at what multiple of the base rate?): score every document with "
    "the shared-template IRLS fit, decile by the deterministic "
    "(score desc, doc_id) order, report per-decile counts, the "
    "cumulative capture curve, and per-decile lift. Complements "
    "q245's ROC AUC (threshold-free discrimination) and q298's IV "
    "(pre-fit feature power) with the POST-fit actionability view. "
    "Exactness: scores are micro-quantized int64 before the rank "
    "(deterministic ties); decile = (rn-1)*10 DIV n on exact ranks; "
    "counts int64, the two ratios single rounded divisions. Scale: "
    "one global rank (the q298 note applies — the two-pass global "
    "index is the registered escape, used on the Spark side); the "
    "decile windows run on 10 rows.",
    tags=("analytics", "gains", "lift", "logistic", "eval", "scale"),
)
def q307_gains_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    from columnarmodeling_spark.operators.indexing import with_global_index

    docs = t(spark, sf_dir, "documents")
    base = docs.selectExpr(*_split_top(_LR_X))
    w = _irls_weights(spark, base)
    scored = (
        docs.selectExpr("doc_id", *_split_top(_LR_X))
        .crossJoin(F.broadcast(w))
        .select(
            "doc_id",
            F.col("y").cast("long").alias("y"),
            F.expr(_LR_SCORE).alias("score_micro"),
        )
        .withColumn("neg_score", -F.col("score_micro"))
    )
    rk = with_global_index(scored, ["neg_score", "doc_id"], index_col="rn")
    n_tot = rk.agg(F.count(F.lit(1)).cast("long").alias("n"))
    dec = rk.crossJoin(F.broadcast(n_tot)).select(
        F.expr("CAST((rn - 1) * 10 DIV n AS BIGINT)").alias("decile"), "y"
    )
    per = dec.groupBy("decile").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("y").cast("long").alias("pos"),
    )
    # the cumulative windows run on the 10-row decile relation
    cum = (
        per.withColumn(
            "cum_pos", F.sum("pos").over(W.orderBy("decile")).cast("long")
        )
        .withColumn("tot_pos", F.sum("pos").over(W.partitionBy()).cast("long"))
        .withColumn("tot_n", F.sum("n").over(W.partitionBy()).cast("long"))
    )
    return cum.select(
        "decile",
        "n",
        "pos",
        "cum_pos",
        F.expr(
            "CAST(round(1000.0 * cum_pos / tot_pos) AS BIGINT)"
        ).alias("gain_milli"),
        F.expr(
            "CAST(round(1000.0 * (CAST(pos AS DOUBLE) / n)"
            " / (CAST(tot_pos AS DOUBLE) / tot_n)) AS BIGINT)"
        ).alias("lift_milli"),
    ).orderBy("decile")


# --- q308: Count-Min join-size estimation vs exact ------------------------------

_JSZ_W = 8192  # counters per sketch row
_JSZ_D = 3     # hash rows (first 3 of the shared minhash family)


def _jsz_hash_sql(u: str, j: int) -> str:
    from columnarmodeling_spark.functions.text import MERSENNE_P, MINHASH_AB

    a, b = MINHASH_AB[j]
    return f"(({a} * {u} + {b}) % {MERSENNE_P}) % {_JSZ_W}"


def _jsz_u_sql(key: str) -> str:
    from columnarmodeling_spark.functions.text import MERSENNE_P

    return (
        f"CAST(('0x' || substr(md5(CAST({key} AS VARCHAR)), 1, 15))"
        f" AS BIGINT) % {MERSENNE_P}"
    )


def _jsz_u_spark(key: str) -> str:
    from columnarmodeling_spark.functions.text import MERSENNE_P

    return (
        f"CAST(conv(substr(md5(CAST({key} AS STRING)), 1, 15),"
        f" 16, 10) AS BIGINT) % {MERSENNE_P}"
    )


@register(
    "q308_join_size_sketch",
    oracle=f"""
    WITH ea AS (
      SELECT {_jsz_u_sql('user_id')} AS u, user_id AS k FROM events),
    ob AS (
      SELECT {_jsz_u_sql('o_custkey')} AS u, o_custkey AS k FROM orders),
    sa AS (
      SELECT j, col, CAST(count(*) AS BIGINT) AS c FROM (
        {" UNION ALL ".join(
            f"SELECT {j} AS j, {_jsz_hash_sql('u', j)} AS col FROM ea"
            for j in range(_JSZ_D))})
      GROUP BY j, col),
    sb AS (
      SELECT j, col, CAST(count(*) AS BIGINT) AS c FROM (
        {" UNION ALL ".join(
            f"SELECT {j} AS j, {_jsz_hash_sql('u', j)} AS col FROM ob"
            for j in range(_JSZ_D))})
      GROUP BY j, col),
    est AS (
      SELECT sa.j, CAST(sum(sa.c * sb.c) AS BIGINT) AS est
      FROM sa JOIN sb ON sb.j = sa.j AND sb.col = sa.col
      GROUP BY sa.j),
    exact AS (
      SELECT CAST(sum(a.c * b.c) AS BIGINT) AS exact_size
      FROM (SELECT k, count(*) AS c FROM ea GROUP BY k) a
      JOIN (SELECT k, count(*) AS c FROM ob GROUP BY k) b ON b.k = a.k)
    SELECT exact.exact_size,
           CAST(min(est.est) AS BIGINT) AS est_min,
           CAST(max(est.est) AS BIGINT) AS est_max,
           CAST(round(1000.0 * min(est.est) / exact.exact_size)
                AS BIGINT) AS over_milli
    FROM est CROSS JOIN exact
    GROUP BY exact.exact_size
    """,
    doc="COUNT-MIN JOIN-SIZE ESTIMATION — the optimizer's question "
    "answered with sketches: estimate |events JOIN orders ON user = "
    "custkey| from two Count-Min sketches (3 rows x 8192 counters, "
    "the shared minhash hash family) via the row-wise inner product "
    "sum(cA*cB), taking the min across rows — NEVER touching the "
    "join itself; then score it against the exact size sum(na*nb) "
    "over matched keys. The AMS/CM inner-product estimate is an "
    "UPPER BOUND per row (collisions only add mass), so est_min >= "
    "exact always — the property the test pins. Why it matters at "
    "100 TB: a skew-aware planner wants join cardinality BEFORE "
    "paying the shuffle; two 4 KB sketches built map-side answer it "
    "in one pass per side (3 x 8192 x 8 B = 192 KB each). "
    "Exactness: counters and inner products "
    "are exact int64 (bucket ids from the md5->Mersenne hash chain, "
    "identical both engines); one rounded ratio. Scale: each sketch "
    "is a map-side fold to <= 3*8192 cells; the estimate join is "
    "sketch-sized; the exact baseline (for scoring only) is the "
    "key-grouped equi-join.",
    tags=("analytics", "sketch", "count-min", "join", "cardinality",
          "scale"),
)
def q308_join_size_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    ea = t(spark, sf_dir, "events").selectExpr(
        f"{_jsz_u_spark('user_id')} AS u", "user_id AS k"
    ).localCheckpoint(eager=False)
    ob = t(spark, sf_dir, "orders").selectExpr(
        f"{_jsz_u_spark('o_custkey')} AS u", "o_custkey AS k"
    ).localCheckpoint(eager=False)

    def sketch(df):
        rows = None
        for j in range(_JSZ_D):
            r = df.selectExpr(
                f"{j} AS j", f"{_jsz_hash_sql('u', j)} AS col"
            )
            rows = r if rows is None else rows.unionByName(r)
        return rows.groupBy("j", "col").agg(
            F.count(F.lit(1)).cast("long").alias("c")
        )

    sa = sketch(ea)
    sb = sketch(ob).withColumnRenamed("c", "cb")
    est = (
        sa.join(sb, ["j", "col"])
        .groupBy("j")
        .agg(F.sum(F.col("c") * F.col("cb")).cast("long").alias("est"))
    )
    exact = (
        ea.groupBy("k")
        .agg(F.count(F.lit(1)).alias("ca"))
        .join(
            ob.groupBy("k").agg(F.count(F.lit(1)).alias("cb")), "k"
        )
        .agg(F.sum(F.col("ca") * F.col("cb")).cast("long").alias("exact_size"))
    )
    return (
        est.crossJoin(F.broadcast(exact))
        .groupBy("exact_size")
        .agg(
            F.min("est").cast("long").alias("est_min"),
            F.max("est").cast("long").alias("est_max"),
        )
        .select(
            "exact_size",
            "est_min",
            "est_max",
            F.expr(
                "CAST(round(1000.0 * est_min / exact_size) AS BIGINT)"
            ).alias("over_milli"),
        )
    )


# --- q313: Fellegi-Sunter probabilistic record linkage -------------------------
#
# Per-field (m, u) probabilities are fixed model constants. The
# agree/disagree log-weights are pre-quantized to integer micro-nats in
# PYTHON and embedded as literals in both engines' SQL: ln() on the two
# engines' libm can differ in the last ulp, which round(1e6*ln(x)) then
# amplifies to an off-by-one per field — model constants must never be
# re-derived per engine.

import math as _math


def _micro(x: float) -> int:
    return round(1_000_000 * _math.log(x))


_FS_W = {
    "seg": (_micro(0.9 / 0.2), _micro(0.1 / 0.8)),
    "bal": (_micro(0.85 / 0.05), _micro(0.15 / 0.95)),
    "phon": (_micro(0.8 / 0.01), _micro(0.2 / 0.99)),
}


def _fs_w(field: str) -> str:
    agree, disagree = _FS_W[field]
    return (
        f"CASE WHEN {field} = 1 "
        f"THEN CAST({agree} AS BIGINT) "
        f"ELSE CAST({disagree} AS BIGINT) END"
    )


_FS_WEIGHT_SQL = " + ".join(_fs_w(f) for f in _FS_W)


@register(
    "q313_record_linkage",
    oracle=f"""
    WITH c AS (
      SELECT c_custkey AS k, c_nationkey AS nat,
             CAST(floor(c_acctbal / 1000) AS BIGINT) AS band,
             c_mktsegment AS seg_v, c_acctbal AS bal_v,
             CAST(substr(c_name, 10) AS BIGINT) % 97 AS phon_v
      FROM customer),
    pairs AS (
      SELECT CASE WHEN a.seg_v = b.seg_v THEN 1 ELSE 0 END AS seg,
             CASE WHEN abs(a.bal_v - b.bal_v) <= 100.0 THEN 1 ELSE 0 END
               AS bal,
             CASE WHEN a.phon_v = b.phon_v THEN 1 ELSE 0 END AS phon
      FROM c a JOIN c b ON a.nat = b.nat AND a.band = b.band
                       AND a.k < b.k),
    scored AS (
      SELECT seg, bal, phon,
             {_FS_WEIGHT_SQL} AS weight_micro
      FROM pairs)
    SELECT CASE WHEN weight_micro >= 4000000 THEN 'match'
                WHEN weight_micro <= 0 THEN 'nonmatch'
                ELSE 'review' END AS decision,
           CAST(seg AS BIGINT) AS seg,
           CAST(bal AS BIGINT) AS bal,
           CAST(phon AS BIGINT) AS phon,
           CAST(count(*) AS BIGINT) AS n_pairs,
           CAST(min(weight_micro) AS BIGINT) AS weight_micro
    FROM scored
    GROUP BY 1, 2, 3, 4
    ORDER BY weight_micro DESC, seg, bal, phon
    """,
    doc="FELLEGI-SUNTER PROBABILISTIC RECORD LINKAGE (the 1969 "
    "entity-resolution model every dedup/master-data pipeline runs): "
    "candidate pairs come from BLOCKING on (nation, acctbal-band) — "
    "never the O(n^2) cross space; each pair gets a per-field "
    "agreement vector (market segment equality, balance proximity "
    "<= 100, a mod-97 name-key as the phonetic-key stand-in) and the "
    "classic log2-style weights w = ln(m/u) on agreement, "
    "ln((1-m)/(1-u)) on disagreement, with fixed (m, u) model "
    "constants; totals classify into match / review / nonmatch by "
    "the standard two-threshold rule. Exactness: each field weight "
    "is micro-quantized through identical expression text on both "
    "engines, so pair totals and thresholds are exact int64. Scale: "
    "the blocked self-join is the same bounded-pair-space skeleton "
    "as the dedup tier (block size bounds each join group; a hot "
    "block would take the max_df-style cap of "
    "jaccard_pairs_from_shingles); scoring is per-row expression "
    "work and the rollup is a tiny hash agg over <= 24 agreement "
    "patterns.",
    tags=("analytics", "linkage", "entity-resolution", "join", "scale"),
)
def q313_record_linkage(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("k"),
        F.col("c_nationkey").alias("nat"),
        F.expr("CAST(floor(c_acctbal / 1000) AS BIGINT)").alias("band"),
        F.col("c_mktsegment").alias("seg_v"),
        F.col("c_acctbal").alias("bal_v"),
        F.expr("CAST(substr(c_name, 10) AS BIGINT) % 97").alias("phon_v"),
    )
    a = c.select(*(F.col(x).alias(f"a_{x}") for x in c.columns))
    b = c.select(*(F.col(x).alias(f"b_{x}") for x in c.columns))
    pairs = a.join(
        b,
        (F.col("a_nat") == F.col("b_nat"))
        & (F.col("a_band") == F.col("b_band"))
        & (F.col("a_k") < F.col("b_k")),
    ).select(
        F.when(F.col("a_seg_v") == F.col("b_seg_v"), 1).otherwise(0).alias("seg"),
        F.when(F.abs(F.col("a_bal_v") - F.col("b_bal_v")) <= 100.0, 1)
        .otherwise(0)
        .alias("bal"),
        F.when(F.col("a_phon_v") == F.col("b_phon_v"), 1).otherwise(0).alias("phon"),
    )
    scored = pairs.select(
        "seg", "bal", "phon", F.expr(_FS_WEIGHT_SQL).alias("weight_micro")
    )
    return (
        scored.select(
            F.when(F.col("weight_micro") >= 4000000, "match")
            .when(F.col("weight_micro") <= 0, "nonmatch")
            .otherwise("review")
            .alias("decision"),
            F.col("seg").cast("long").alias("seg"),
            F.col("bal").cast("long").alias("bal"),
            F.col("phon").cast("long").alias("phon"),
            "weight_micro",
        )
        .groupBy("decision", "seg", "bal", "phon")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_pairs"),
            F.min("weight_micro").cast("long").alias("weight_micro"),
        )
        .orderBy(F.col("weight_micro").desc(), "seg", "bal", "phon")
    )


# --- q314: Kaplan-Meier survival curve -----------------------------------------


@register(
    "q314_kaplan_meier",
    oracle="""
    WITH sign AS (
      SELECT user_id, min(epoch_us(ts)) AS t0
      FROM events WHERE event_type = 'signup' GROUP BY 1),
    err AS (
      SELECT e.user_id, min(epoch_us(e.ts)) AS te
      FROM events e JOIN sign s ON e.user_id = s.user_id
      WHERE e.event_type = 'error' AND epoch_us(e.ts) > s.t0
      GROUP BY 1),
    mx AS (SELECT max(epoch_us(ts)) AS tmax FROM events),
    dur AS (
      SELECT s.user_id,
             CAST(CASE WHEN e.te IS NOT NULL
                       THEN (e.te - s.t0) // 86400000000
                       ELSE (mx.tmax - s.t0) // 86400000000 END
                  AS BIGINT) AS day,
             CASE WHEN e.te IS NOT NULL THEN 1 ELSE 0 END AS ev
      FROM sign s LEFT JOIN err e ON s.user_id = e.user_id CROSS JOIN mx),
    per AS (
      SELECT day, CAST(sum(ev) AS BIGINT) AS d,
             CAST(sum(1 - ev) AS BIGINT) AS c
      FROM dur GROUP BY day),
    tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM dur),
    risk AS (
      SELECT day, d, c,
             n - COALESCE(sum(d + c) OVER (ORDER BY day
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS at_risk
      FROM per CROSS JOIN tot),
    km AS (
      SELECT day, d, c, at_risk,
             max(CASE WHEN d >= at_risk THEN 1 ELSE 0 END)
               OVER (ORDER BY day) AS hit0,
             sum(CASE WHEN d > 0 AND d < at_risk
                      THEN ln(1.0 - CAST(d AS DOUBLE) / at_risk)
                      ELSE 0.0 END) OVER (ORDER BY day) AS lsum
      FROM risk)
    SELECT day, d AS events, c AS censored,
           CAST(at_risk AS BIGINT) AS at_risk,
           CASE WHEN hit0 = 1 THEN CAST(0 AS BIGINT)
                ELSE CAST(round(1000000.0 * exp(lsum)) AS BIGINT) END
             AS surv_micro
    FROM km ORDER BY day
    """,
    doc="KAPLAN-MEIER PRODUCT-LIMIT SURVIVAL ESTIMATOR with right "
    "censoring — the churn/retention curve an analytics engine owes "
    "the growth team: per user, time-to-first-error after signup "
    "(users with no error are censored at the observation horizon); "
    "risk sets n_i = N - cumulative(exits before day i) are EXACT "
    "integer window arithmetic (no >= theta join), and "
    "S(t) = prod(1 - d_i/n_i) rides exp(cumsum(ln)) over the "
    "day-ordered axis with the d_i = n_i absorbing state handled by "
    "a running max flag (ln(0)-safe). Float discipline: the only "
    "doubles are the per-day ln factors summed in a DETERMINISTIC "
    "order (ORDER BY day), micro-quantized at the end. Scale: the "
    "per-user reductions are user-keyed hash aggs; everything after "
    "the per-day rollup operates on <= horizon-days rows, so the "
    "unpartitioned cumulative windows are bounded by the time axis, "
    "not the data (the q298 discipline: aggregate first, window on "
    "the reduced axis).",
    tags=("analytics", "survival", "window", "scale"),
)
def q314_kaplan_meier(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    ev = t(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
    )
    sign = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("us").alias("t0"))
    )
    err = (
        ev.filter(F.col("event_type") == "error")
        .join(sign, "user_id")
        .filter(F.col("us") > F.col("t0"))
        .groupBy("user_id")
        .agg(F.min("us").alias("te"))
    )
    mx = ev.agg(F.max("us").alias("tmax"))
    dur = (
        sign.join(err, "user_id", "left")
        .crossJoin(F.broadcast(mx))
        .select(
            F.expr(
                "CAST(CASE WHEN te IS NOT NULL"
                " THEN (te - t0) DIV 86400000000"
                " ELSE (tmax - t0) DIV 86400000000 END AS BIGINT)"
            ).alias("day"),
            F.when(F.col("te").isNotNull(), 1).otherwise(0).alias("ev"),
        )
    )
    per = dur.groupBy("day").agg(
        F.sum("ev").cast("long").alias("d"),
        F.sum(1 - F.col("ev")).cast("long").alias("c"),
    )
    tot = dur.agg(F.count(F.lit(1)).cast("long").alias("n"))
    w_prev = (
        Window.orderBy("day").rowsBetween(Window.unboundedPreceding, -1)
    )
    w_cum = Window.orderBy("day")
    risk = per.crossJoin(F.broadcast(tot)).select(
        "day",
        "d",
        "c",
        (
            F.col("n")
            - F.coalesce(F.sum(F.col("d") + F.col("c")).over(w_prev), F.lit(0))
        ).alias("at_risk"),
    )
    km = risk.select(
        "day",
        "d",
        "c",
        "at_risk",
        F.max(F.when(F.col("d") >= F.col("at_risk"), 1).otherwise(0))
        .over(w_cum)
        .alias("hit0"),
        F.sum(
            F.when(
                (F.col("d") > 0) & (F.col("d") < F.col("at_risk")),
                F.log(1.0 - F.col("d").cast("double") / F.col("at_risk")),
            ).otherwise(0.0)
        )
        .over(w_cum)
        .alias("lsum"),
    )
    return km.select(
        "day",
        F.col("d").alias("events"),
        F.col("c").alias("censored"),
        F.col("at_risk").cast("long").alias("at_risk"),
        F.when(F.col("hit0") == 1, F.lit(0).cast("long"))
        .otherwise(
            F.expr("CAST(round(1000000.0 * exp(lsum)) AS BIGINT)")
        )
        .alias("surv_micro"),
    ).orderBy("day")


# --- q315: difference-in-differences --------------------------------------------

# 2024-01-16 00:00:00 UTC in microseconds — the intervention cutoff.
_DID_CUTOFF_US = 1_705_363_200_000_000


@register(
    "q315_diff_in_differences",
    oracle=f"""
    WITH p AS (
      SELECT CAST(user_id % 2 AS BIGINT) AS treat,
             CASE WHEN epoch_us(ts) >= {_DID_CUTOFF_US} THEN 1 ELSE 0 END
               AS post,
             value AS x
      FROM events WHERE event_type = 'purchase'),
    cell AS (
      SELECT treat, post, CAST(count(*) AS BIGINT) AS n,
             sum(x) AS sx, sum(x * x) AS sxx
      FROM p GROUP BY treat, post),
    piv AS (
      SELECT
        max(CASE WHEN treat = 1 AND post = 0 THEN n END) AS n_t0,
        max(CASE WHEN treat = 1 AND post = 1 THEN n END) AS n_t1,
        max(CASE WHEN treat = 0 AND post = 0 THEN n END) AS n_c0,
        max(CASE WHEN treat = 0 AND post = 1 THEN n END) AS n_c1,
        max(CASE WHEN treat = 1 AND post = 0 THEN sx END) AS sx_t0,
        max(CASE WHEN treat = 1 AND post = 1 THEN sx END) AS sx_t1,
        max(CASE WHEN treat = 0 AND post = 0 THEN sx END) AS sx_c0,
        max(CASE WHEN treat = 0 AND post = 1 THEN sx END) AS sx_c1,
        max(CASE WHEN treat = 1 AND post = 0 THEN sxx END) AS sxx_t0,
        max(CASE WHEN treat = 1 AND post = 1 THEN sxx END) AS sxx_t1,
        max(CASE WHEN treat = 0 AND post = 0 THEN sxx END) AS sxx_c0,
        max(CASE WHEN treat = 0 AND post = 1 THEN sxx END) AS sxx_c1
      FROM cell)
    SELECT n_t0, n_t1, n_c0, n_c1,
           CAST(round(1000000.0 * sx_t0 / n_t0) AS BIGINT) AS mean_t0_micro,
           CAST(round(1000000.0 * sx_t1 / n_t1) AS BIGINT) AS mean_t1_micro,
           CAST(round(1000000.0 * sx_c0 / n_c0) AS BIGINT) AS mean_c0_micro,
           CAST(round(1000000.0 * sx_c1 / n_c1) AS BIGINT) AS mean_c1_micro,
           CAST(round(1000000.0 * ((sx_t1 / n_t1 - sx_t0 / n_t0)
                - (sx_c1 / n_c1 - sx_c0 / n_c0))) AS BIGINT) AS did_micro,
           CAST(round(1000000.0 * sqrt(
               ((sxx_t1 - sx_t1 * sx_t1 / n_t1) / (n_t1 - 1)) / n_t1
             + ((sxx_t0 - sx_t0 * sx_t0 / n_t0) / (n_t0 - 1)) / n_t0
             + ((sxx_c1 - sx_c1 * sx_c1 / n_c1) / (n_c1 - 1)) / n_c1
             + ((sxx_c0 - sx_c0 * sx_c0 / n_c0) / (n_c0 - 1)) / n_c0))
             AS BIGINT) AS se_micro,
           CAST(round(1000.0 * ((sx_t1 / n_t1 - sx_t0 / n_t0)
                - (sx_c1 / n_c1 - sx_c0 / n_c0)) / sqrt(
               ((sxx_t1 - sx_t1 * sx_t1 / n_t1) / (n_t1 - 1)) / n_t1
             + ((sxx_t0 - sx_t0 * sx_t0 / n_t0) / (n_t0 - 1)) / n_t0
             + ((sxx_c1 - sx_c1 * sx_c1 / n_c1) / (n_c1 - 1)) / n_c1
             + ((sxx_c0 - sx_c0 * sx_c0 / n_c0) / (n_c0 - 1)) / n_c0))
             AS BIGINT) AS t_milli
    FROM piv
    """,
    doc="DIFFERENCE-IN-DIFFERENCES ESTIMATOR — the quasi-experimental "
    "causal read every product-analytics engine runs when an A/B "
    "randomization wasn't available: purchase value by (treat = "
    "user_id parity, post = ts >= the 2024-01-16 intervention "
    "cutoff), DiD = (T,post - T,pre) - (C,post - C,pre), with the "
    "large-sample SE from the four independent cell variances "
    "(Welch-style, the q240 convention) and the t statistic. All "
    "four cell moments (n, sum, sum-of-squares) come from ONE "
    "hash aggregate over the filtered fact scan; the pivot and the "
    "estimator are arithmetic on a single row. Doubles: value is "
    "already DOUBLE; means/variances are micro-quantized at the "
    "final projection (the shared-chain rule), and every sxx - "
    "sx*sx/n evaluates in DOUBLE from the start, the q255/q289 "
    "overflow lesson. Scale: one map-side-combinable agg on a "
    "4-group key; no window, no join, no second scan.",
    tags=("analytics", "causal", "did", "scale"),
)
def q315_diff_in_differences(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = (
        t(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .select(
            (F.col("user_id") % 2).cast("long").alias("treat"),
            F.when(
                F.unix_micros(F.col("ts").cast("timestamp"))
                >= _DID_CUTOFF_US,
                1,
            )
            .otherwise(0)
            .alias("post"),
            F.col("value").alias("x"),
        )
    )
    cell = p.groupBy("treat", "post").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").alias("sx"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    piv_cols = []
    for m in ("n", "sx", "sxx"):
        for tr, po, tag in ((1, 0, "t0"), (1, 1, "t1"), (0, 0, "c0"), (0, 1, "c1")):
            piv_cols.append(
                F.max(
                    F.when(
                        (F.col("treat") == tr) & (F.col("post") == po),
                        F.col(m),
                    )
                ).alias(f"{m}_{tag}")
            )
    piv = cell.agg(*piv_cols)
    var_sum = (
        "((sxx_t1 - sx_t1 * sx_t1 / n_t1) / (n_t1 - 1)) / n_t1"
        " + ((sxx_t0 - sx_t0 * sx_t0 / n_t0) / (n_t0 - 1)) / n_t0"
        " + ((sxx_c1 - sx_c1 * sx_c1 / n_c1) / (n_c1 - 1)) / n_c1"
        " + ((sxx_c0 - sx_c0 * sx_c0 / n_c0) / (n_c0 - 1)) / n_c0"
    )
    did = (
        "((sx_t1 / n_t1 - sx_t0 / n_t0) - (sx_c1 / n_c1 - sx_c0 / n_c0))"
    )
    return piv.select(
        "n_t0",
        "n_t1",
        "n_c0",
        "n_c1",
        F.expr("CAST(round(1000000.0 * sx_t0 / n_t0) AS BIGINT)").alias(
            "mean_t0_micro"
        ),
        F.expr("CAST(round(1000000.0 * sx_t1 / n_t1) AS BIGINT)").alias(
            "mean_t1_micro"
        ),
        F.expr("CAST(round(1000000.0 * sx_c0 / n_c0) AS BIGINT)").alias(
            "mean_c0_micro"
        ),
        F.expr("CAST(round(1000000.0 * sx_c1 / n_c1) AS BIGINT)").alias(
            "mean_c1_micro"
        ),
        F.expr(f"CAST(round(1000000.0 * {did}) AS BIGINT)").alias("did_micro"),
        F.expr(
            f"CAST(round(1000000.0 * sqrt({var_sum})) AS BIGINT)"
        ).alias("se_micro"),
        F.expr(
            f"CAST(round(1000.0 * {did} / sqrt({var_sum})) AS BIGINT)"
        ).alias("t_milli"),
    )


# --- q321: adaptive histogram binning (Freedman-Diaconis vs Sturges) -----------

_FDH_CAP = 512  # bin-count guard


@register(
    "q321_adaptive_histogram",
    oracle=f"""
    WITH v AS (
      SELECT value AS x, event_id FROM events),
    rk AS (
      SELECT x, row_number() OVER (ORDER BY x, event_id) AS rn,
             count(*) OVER () AS n
      FROM v),
    qs AS (
      SELECT any_value(n) AS n,
             max(CASE WHEN rn = (n + 3) // 4 THEN x END) AS q1,
             max(CASE WHEN rn = (3 * n + 3) // 4 THEN x END) AS q3,
             min(x) AS lo, max(x) AS hi
      FROM rk),
    par AS (
      SELECT n, lo, hi, q3 - q1 AS iqr,
             2.0 * (q3 - q1) / pow(CAST(n AS DOUBLE), 1.0 / 3.0) AS h,
             CAST(ceil(ln(CAST(n AS DOUBLE)) / ln(2.0)) + 1 AS BIGINT)
               AS k_sturges
      FROM qs),
    dec AS (
      SELECT n, lo, hi, iqr, k_sturges,
             CASE WHEN iqr > 0.0 THEN
               (CAST(round(1000000000.0 * (hi - lo) / h) AS BIGINT)
                + 999999999) // 1000000000
             ELSE CAST(0 AS BIGINT) END AS k_fd
      FROM par),
    choice AS (
      SELECT n, lo, hi, k_fd, k_sturges,
             CASE WHEN k_fd > 0 THEN 'fd' ELSE 'sturges' END AS rule,
             least({_FDH_CAP}, greatest(1,
               CASE WHEN k_fd > 0 THEN k_fd ELSE k_sturges END)) AS k
      FROM dec)
    SELECT c.rule, CAST(c.k AS BIGINT) AS k_used,
           CAST(c.k_fd AS BIGINT) AS k_fd,
           CAST(c.k_sturges AS BIGINT) AS k_sturges,
           CAST(CASE WHEN c.hi = c.lo THEN 0 ELSE
                least(c.k - 1, CAST(floor((v.x - c.lo) / (c.hi - c.lo)
                * c.k) AS BIGINT)) END AS BIGINT) AS bin,
           CAST(count(*) AS BIGINT) AS cnt
    FROM v CROSS JOIN choice c
    GROUP BY 1, 2, 3, 4, 5
    ORDER BY bin
    """,
    doc="ADAPTIVE HISTOGRAM BINNING — the fourth leg of the adaptive-"
    "planning family (q310 agg strategy, q311 join strategy, q317 "
    "LSH banding; this picks the bin COUNT from the data): "
    "Freedman-Diaconis h = 2*IQR/cbrt(n) from EXACT rank-based "
    "quartiles (type-1, (n+3) DIV 4 ranks with an event_id "
    "tie-break — no interpolated quantiles, whose tie rules differ "
    "across engines), falling back to Sturges ceil(log2 n)+1 when "
    "IQR = 0 (degenerate spike distribution), capped at "
    f"{_FDH_CAP}; the rule, both candidate k's and the chosen k "
    "ride the output so the oracle checks the DECISION (q310 "
    "convention). Exactness: the one non-IEEE-exact libm call "
    "(pow^1/3) is nano-quantized BEFORE the integer ceil, so an "
    "ulp of cbrt drift cannot flip the bin count; bin assignment "
    "is the shared double chain (identical operand order). Scale: "
    "the rank pass is the q165/q167 two-pass global-index shape; "
    "everything after the quartile row is ONE map-side-combinable "
    "agg onto <= k groups.",
    tags=("analytics", "histogram", "adaptive", "scale"),
)
def q321_adaptive_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    from columnarmodeling_spark.operators.indexing import with_global_index

    v = t(spark, sf_dir, "events").select(
        F.col("value").alias("x"), "event_id"
    )
    rk = with_global_index(v, ["x", "event_id"], index_col="rn")
    n_tot = rk.agg(F.count(F.lit(1)).cast("long").alias("n"))
    qs = (
        rk.crossJoin(F.broadcast(n_tot))
        .agg(
            F.first("n").alias("n"),
            F.max(
                F.when(F.col("rn") == F.expr("(n + 3) DIV 4"), F.col("x"))
            ).alias("q1"),
            F.max(
                F.when(
                    F.col("rn") == F.expr("(3 * n + 3) DIV 4"), F.col("x")
                )
            ).alias("q3"),
            F.min("x").alias("lo"),
            F.max("x").alias("hi"),
        )
    )
    par = qs.select(
        "n",
        "lo",
        "hi",
        (F.col("q3") - F.col("q1")).alias("iqr"),
        F.expr(
            "2.0 * (q3 - q1) / pow(CAST(n AS DOUBLE), 1.0 / 3.0)"
        ).alias("h"),
        F.expr(
            "CAST(ceil(ln(CAST(n AS DOUBLE)) / ln(2.0)) + 1 AS BIGINT)"
        ).alias("k_sturges"),
    )
    dec = par.select(
        "n",
        "lo",
        "hi",
        "iqr",
        "k_sturges",
        F.expr(
            "CASE WHEN iqr > 0.0 THEN"
            " (CAST(round(1000000000.0 * (hi - lo) / h) AS BIGINT)"
            "  + 999999999) DIV 1000000000"
            " ELSE CAST(0 AS BIGINT) END"
        ).alias("k_fd"),
    )
    choice = dec.select(
        "lo",
        "hi",
        "k_fd",
        "k_sturges",
        F.when(F.col("k_fd") > 0, "fd").otherwise("sturges").alias("rule"),
        F.expr(
            f"least({_FDH_CAP}, greatest(1,"
            " CASE WHEN k_fd > 0 THEN k_fd ELSE k_sturges END))"
        ).alias("k"),
    )
    return (
        v.crossJoin(F.broadcast(choice))
        .select(
            "rule",
            F.col("k").cast("long").alias("k_used"),
            F.col("k_fd").cast("long").alias("k_fd"),
            F.col("k_sturges").cast("long").alias("k_sturges"),
            # hi = lo (all values equal) makes (x-lo)/(hi-lo) 0/0: Spark
            # (non-ANSI) silently casts the NaN to 0 while DuckDB errors
            # casting NaN to BIGINT — guard the degenerate constant
            # table to bin 0 explicitly on BOTH engines.
            F.expr(
                "CAST(CASE WHEN hi = lo THEN 0 ELSE"
                " least(k - 1, CAST(floor((x - lo) / (hi - lo) * k)"
                " AS BIGINT)) END AS BIGINT)"
            ).alias("bin"),
        )
        .groupBy("rule", "k_used", "k_fd", "k_sturges", "bin")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        .orderBy("bin")
    )


# --- q322: token-budget waterfill mix allocation ---------------------------------


@register(
    "q322_budget_waterfill",
    oracle="""
    WITH src AS (
      SELECT source,
             CAST(sum(n_chars) // 4 AS BIGINT) AS tokens,
             CAST(round(1000000.0 * sum(CASE WHEN lang = 'en' THEN 1
                  ELSE 0 END) / count(*)) AS BIGINT) AS en_micro,
             CAST(count(*) AS BIGINT) AS n_docs
      FROM documents GROUP BY source),
    tot AS (
      SELECT CAST((4 * sum(tokens)) // 10 AS BIGINT) AS budget FROM src),
    ranked AS (
      SELECT source, tokens, en_micro, n_docs,
             row_number() OVER (ORDER BY en_micro DESC, source) AS rk,
             CAST(coalesce(sum(tokens) OVER (ORDER BY en_micro DESC, source
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS BIGINT) AS taken_before
      FROM src)
    SELECT r.source, CAST(r.rk AS BIGINT) AS rk, r.en_micro, r.tokens,
           CAST(greatest(0, least(r.tokens, t.budget - r.taken_before))
                AS BIGINT) AS alloc,
           CAST(CASE WHEN t.budget - r.taken_before <= 0 THEN 1
                     WHEN t.budget - r.taken_before < r.tokens THEN 2
                     ELSE 0 END AS BIGINT) AS boundary
    FROM ranked r CROSS JOIN tot t
    ORDER BY rk
    """,
    doc="TOKEN-BUDGET WATERFILL MIX ALLOCATION — the planning step a "
    "training-mix builder runs before q95's sampling executes it: "
    "given per-source token inventories and a 40% global token "
    "budget, fill sources in quality order (en-share as the "
    "target-likeness proxy, the q316 target) — full inventory "
    "until the budget boundary, the remainder at the boundary "
    "source, zero after — i.e. the greedy solution of the "
    "budget-constrained selection LP, which is optimal because "
    "the objective is linear in tokens. The boundary column marks "
    "full/partial/starved so the oracle checks the DECISION "
    "structure, not just totals. Exactness: inventories, the "
    "budget and the exclusive running sum are pure int64 (DIV-"
    "quantized token estimate, no floats anywhere). Scale: one "
    "hash agg to the source grain, then a window over |sources| "
    "rows — the same aggregate-first discipline as q298/q314; at "
    "millions of hosts the rank window range-partitions like "
    "q147's distributed sort.",
    tags=("analytics", "llm", "mix", "allocation", "window", "scale"),
)
def q322_budget_waterfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    src = t(spark, sf_dir, "documents").groupBy("source").agg(
        F.expr("CAST(sum(n_chars) DIV 4 AS BIGINT)").alias("tokens"),
        F.expr(
            "CAST(round(1000000.0 * sum(CASE WHEN lang = 'en' THEN 1"
            " ELSE 0 END) / count(*)) AS BIGINT)"
        ).alias("en_micro"),
        F.count(F.lit(1)).cast("long").alias("n_docs"),
    )
    tot = src.agg(
        F.expr("CAST((4 * sum(tokens)) DIV 10 AS BIGINT)").alias("budget")
    )
    w_ord = Window.orderBy(F.col("en_micro").desc(), "source")
    w_prev = w_ord.rowsBetween(Window.unboundedPreceding, -1)
    ranked = src.select(
        "source",
        "tokens",
        "en_micro",
        F.row_number().over(w_ord).alias("rk"),
        F.coalesce(F.sum("tokens").over(w_prev), F.lit(0))
        .cast("long")
        .alias("taken_before"),
    )
    return (
        ranked.crossJoin(F.broadcast(tot))
        .select(
            "source",
            F.col("rk").cast("long").alias("rk"),
            "en_micro",
            "tokens",
            F.greatest(
                F.lit(0),
                F.least(
                    F.col("tokens"), F.col("budget") - F.col("taken_before")
                ),
            )
            .cast("long")
            .alias("alloc"),
            F.when(F.col("budget") - F.col("taken_before") <= 0, 1)
            .when(
                F.col("budget") - F.col("taken_before") < F.col("tokens"), 2
            )
            .otherwise(0)
            .cast("long")
            .alias("boundary"),
        )
        .orderBy("rk")
    )


# --- q324: O'Brien-Fleming group-sequential monitoring ---------------------------

_GS_LOOKS = 5
_GS_Z_FINAL_MICRO = 1_959_964  # two-sided 5% final boundary, fixed literal
_GS_DAY_US = 86_400_000_000
_GS_T0_US = 1_704_067_200_000_000  # 2024-01-01 00:00:00 UTC


@register(
    "q324_obrien_fleming",
    oracle=f"""
    WITH p AS (
      SELECT CAST(user_id % 2 AS BIGINT) AS arm, value AS x,
             least({_GS_LOOKS} - 1,
                   (epoch_us(ts) - {_GS_T0_US})
                   // (6 * {_GS_DAY_US})) AS slice
      FROM events WHERE event_type = 'purchase'),
    looks AS (SELECT unnest(range(1, {_GS_LOOKS} + 1)) AS k),
    cum AS (
      SELECT l.k, p.arm,
             CAST(count(*) AS BIGINT) AS n,
             sum(p.x) AS sx, sum(p.x * p.x) AS sxx
      FROM looks l JOIN p ON p.slice < l.k
      GROUP BY 1, 2),
    piv AS (
      SELECT k,
             max(CASE WHEN arm = 1 THEN n END) AS n_t,
             max(CASE WHEN arm = 0 THEN n END) AS n_c,
             max(CASE WHEN arm = 1 THEN sx END) AS sx_t,
             max(CASE WHEN arm = 0 THEN sx END) AS sx_c,
             max(CASE WHEN arm = 1 THEN sxx END) AS sxx_t,
             max(CASE WHEN arm = 0 THEN sxx END) AS sxx_c
      FROM cum GROUP BY k),
    z AS (
      SELECT k, n_t, n_c,
             CAST(round(1000.0 * (sx_t / n_t - sx_c / n_c) / sqrt(
               ((sxx_t - sx_t * sx_t / n_t) / (n_t - 1)) / n_t
               + ((sxx_c - sx_c * sx_c / n_c) / (n_c - 1)) / n_c))
               AS BIGINT) AS z_milli,
             CAST(round(({_GS_Z_FINAL_MICRO} / 1000.0)
               * sqrt(CAST({_GS_LOOKS} AS DOUBLE) / k)) AS BIGINT)
               AS bound_milli
      FROM piv),
    dec AS (
      SELECT k, n_t, n_c, z_milli, bound_milli,
             CASE WHEN abs(z_milli) >= bound_milli THEN 1 ELSE 0 END
               AS crossed
      FROM z)
    SELECT k, n_t, n_c, z_milli, bound_milli, CAST(crossed AS BIGINT)
             AS crossed,
           CAST(CASE WHEN crossed = 1 AND coalesce(sum(crossed)
                  OVER (ORDER BY k ROWS BETWEEN UNBOUNDED PRECEDING
                        AND 1 PRECEDING), 0) = 0
                THEN 1 ELSE 0 END AS BIGINT) AS first_stop
    FROM dec ORDER BY k
    """,
    doc="O'BRIEN-FLEMING GROUP-SEQUENTIAL MONITORING — the fixed-"
    "schedule interim-analysis design that complements q306's "
    "fully-sequential SPRT (what an experimentation platform "
    "actually ships: K=5 planned looks, early stopping only on "
    "overwhelming evidence): cumulative Welch z per look over the "
    "purchase-value metric (arm = user parity), against the "
    "classic OBF boundary b_k = z_final * sqrt(K/k) — very "
    "conservative early (b_1 ~ 4.38), the final look spends "
    "nearly the full alpha. The z_final constant is a fixed "
    "integer-micro literal (the q313 rule: model constants are "
    "never re-derived per engine). first_stop marks the earliest "
    "crossing via an exclusive running sum, so the oracle checks "
    "the STOPPING DECISION, not just the statistics. Scale: the "
    "look x arm cumulative moments come from one slice-bucketed "
    f"agg joined to the {_GS_LOOKS}-row look table (never K scans "
    "of the fact stream); everything after is arithmetic on 2K "
    "rows.",
    tags=("analytics", "ab-test", "sequential", "scale"),
)
def q324_obrien_fleming(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    p = (
        t(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .select(
            (F.col("user_id") % 2).cast("long").alias("arm"),
            F.col("value").alias("x"),
            F.expr(
                f"least({_GS_LOOKS} - 1,"
                f" (unix_micros(cast(ts AS timestamp)) - {_GS_T0_US})"
                f" DIV (6 * {_GS_DAY_US}))"
            ).alias("slice"),
        )
    )
    looks = spark.range(1, _GS_LOOKS + 1).select(
        F.col("id").cast("long").alias("k")
    )
    cum = (
        F.broadcast(looks)
        .join(p, p["slice"] < F.col("k"))
        .groupBy("k", "arm")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("x").alias("sx"),
            F.sum(F.col("x") * F.col("x")).alias("sxx"),
        )
    )
    piv = cum.groupBy("k").agg(
        F.max(F.when(F.col("arm") == 1, F.col("n"))).alias("n_t"),
        F.max(F.when(F.col("arm") == 0, F.col("n"))).alias("n_c"),
        F.max(F.when(F.col("arm") == 1, F.col("sx"))).alias("sx_t"),
        F.max(F.when(F.col("arm") == 0, F.col("sx"))).alias("sx_c"),
        F.max(F.when(F.col("arm") == 1, F.col("sxx"))).alias("sxx_t"),
        F.max(F.when(F.col("arm") == 0, F.col("sxx"))).alias("sxx_c"),
    )
    z = piv.select(
        "k",
        "n_t",
        "n_c",
        F.expr(
            "CAST(round(1000.0 * (sx_t / n_t - sx_c / n_c) / sqrt("
            "((sxx_t - sx_t * sx_t / n_t) / (n_t - 1)) / n_t"
            " + ((sxx_c - sx_c * sx_c / n_c) / (n_c - 1)) / n_c))"
            " AS BIGINT)"
        ).alias("z_milli"),
        F.expr(
            f"CAST(round(({_GS_Z_FINAL_MICRO} / 1000.0)"
            f" * sqrt(CAST({_GS_LOOKS} AS DOUBLE) / k)) AS BIGINT)"
        ).alias("bound_milli"),
    )
    dec = z.withColumn(
        "crossed",
        F.when(F.abs(F.col("z_milli")) >= F.col("bound_milli"), 1)
        .otherwise(0)
        .cast("long"),
    )
    w_prev = Window.orderBy("k").rowsBetween(Window.unboundedPreceding, -1)
    return dec.select(
        "k",
        "n_t",
        "n_c",
        "z_milli",
        "bound_milli",
        "crossed",
        F.when(
            (F.col("crossed") == 1)
            & (
                F.coalesce(F.sum("crossed").over(w_prev), F.lit(0)) == 0
            ),
            1,
        )
        .otherwise(0)
        .cast("long")
        .alias("first_stop"),
    ).orderBy("k")


# --- q325: CUPED variance reduction ----------------------------------------------

_CUPED_SPLIT_US = 1_705_363_200_000_000  # 2024-01-16, the q315 cutoff


@register(
    "q325_cuped",
    oracle=f"""
    WITH per_user AS (
      SELECT user_id,
             CAST(user_id % 2 AS BIGINT) AS arm,
             sum(CASE WHEN epoch_us(ts) < {_CUPED_SPLIT_US}
                      AND event_type = 'purchase'
                      THEN value ELSE 0.0 END) AS pre,
             sum(CASE WHEN epoch_us(ts) >= {_CUPED_SPLIT_US}
                      AND event_type = 'purchase'
                      THEN value ELSE 0.0 END) AS post
      FROM events GROUP BY 1, 2),
    m AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             sum(pre) AS sp, sum(post) AS so,
             sum(pre * pre) AS spp, sum(post * post) AS soo,
             sum(pre * post) AS spo
      FROM per_user),
    th AS (
      SELECT n, sp, so,
             (spo - sp * so / n) / (spp - sp * sp / n) AS theta,
             (soo - so * so / n) / (n - 1) AS var_post,
             ((soo - so * so / n)
              - (spo - sp * so / n) * (spo - sp * so / n)
                / (spp - sp * sp / n)) / (n - 1) AS var_adj
      FROM m),
    adj AS (
      SELECT u.arm,
             CAST(count(*) AS BIGINT) AS n_arm,
             sum(u.post - t.theta * (u.pre - t.sp / t.n)) AS s_adj
      FROM per_user u CROSS JOIN th t
      GROUP BY 1)
    SELECT t.n AS n_users,
           CAST(round(1000000.0 * t.theta) AS BIGINT) AS theta_micro,
           CAST(round(1000000.0 * t.var_post) AS BIGINT) AS var_post_micro,
           CAST(round(1000000.0 * t.var_adj) AS BIGINT) AS var_adj_micro,
           CAST(round(1000.0 * (1.0 - t.var_adj / t.var_post)) AS BIGINT)
             AS reduction_milli,
           CAST(round(1000000.0
             * (max(CASE WHEN a.arm = 1 THEN a.s_adj END)
                / max(CASE WHEN a.arm = 1 THEN a.n_arm END)
                - max(CASE WHEN a.arm = 0 THEN a.s_adj END)
                / max(CASE WHEN a.arm = 0 THEN a.n_arm END)))
             AS BIGINT) AS adj_diff_micro
    FROM adj a CROSS JOIN th t
    GROUP BY 1, 2, 3, 4, 5
    """,
    doc="CUPED VARIANCE REDUCTION (Deng et al. 2013 — the industry-"
    "standard pre-period adjustment every experimentation platform "
    "applies before q315/q324 read the effect): per-user pre/post "
    "purchase value from ONE zero-filled conditional agg over the "
    "event scan, theta = cov(pre,post)/var(pre) from the five "
    "moment sums, adjusted metric Y - theta*(X - mean(X)), and the "
    "achieved variance reduction 1 - var_adj/var_post = rho^2. "
    "Every sxx-style term evaluates in DOUBLE from the start (the "
    "q255/q289 rule — the sums are already doubles here) and "
    "var_adj uses the closed form var_post - cov^2/var_pre, so "
    "no second pass over the adjusted values is needed for the "
    "variance; the per-arm adjusted means DO take the one extra "
    "broadcast-theta pass (two scans of the per-user relation "
    "total, both map-side-combinable). Scale: user-keyed hash agg "
    "then arithmetic on one row + two arm rows.",
    tags=("analytics", "ab-test", "cuped", "scale"),
)
def q325_cuped(spark: SparkSession, sf_dir: str) -> DataFrame:
    per_user = (
        t(spark, sf_dir, "events")
        .groupBy("user_id", (F.col("user_id") % 2).cast("long").alias("arm"))
        .agg(
            F.sum(
                F.when(
                    (
                        F.unix_micros(F.col("ts").cast("timestamp"))
                        < _CUPED_SPLIT_US
                    )
                    & (F.col("event_type") == "purchase"),
                    F.col("value"),
                ).otherwise(0.0)
            ).alias("pre"),
            F.sum(
                F.when(
                    (
                        F.unix_micros(F.col("ts").cast("timestamp"))
                        >= _CUPED_SPLIT_US
                    )
                    & (F.col("event_type") == "purchase"),
                    F.col("value"),
                ).otherwise(0.0)
            ).alias("post"),
        )
    )
    m = per_user.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("pre").alias("sp"),
        F.sum("post").alias("so"),
        F.sum(F.col("pre") * F.col("pre")).alias("spp"),
        F.sum(F.col("post") * F.col("post")).alias("soo"),
        F.sum(F.col("pre") * F.col("post")).alias("spo"),
    )
    th = m.select(
        "n",
        "sp",
        "so",
        F.expr("(spo - sp * so / n) / (spp - sp * sp / n)").alias("theta"),
        F.expr("(soo - so * so / n) / (n - 1)").alias("var_post"),
        F.expr(
            "((soo - so * so / n)"
            " - (spo - sp * so / n) * (spo - sp * so / n)"
            " / (spp - sp * sp / n)) / (n - 1)"
        ).alias("var_adj"),
    )
    adj = (
        per_user.crossJoin(F.broadcast(th))
        .groupBy("arm")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_arm"),
            F.sum(
                F.col("post")
                - F.col("theta") * (F.col("pre") - F.col("sp") / F.col("n"))
            ).alias("s_adj"),
        )
    )
    return (
        adj.crossJoin(F.broadcast(th))
        .groupBy(
            F.col("n").alias("n_users"),
            F.expr("CAST(round(1000000.0 * theta) AS BIGINT)").alias(
                "theta_micro"
            ),
            F.expr("CAST(round(1000000.0 * var_post) AS BIGINT)").alias(
                "var_post_micro"
            ),
            F.expr("CAST(round(1000000.0 * var_adj) AS BIGINT)").alias(
                "var_adj_micro"
            ),
            F.expr(
                "CAST(round(1000.0 * (1.0 - var_adj / var_post)) AS BIGINT)"
            ).alias("reduction_milli"),
        )
        .agg(
            F.expr(
                "CAST(round(1000000.0"
                " * (max(CASE WHEN arm = 1 THEN s_adj END)"
                " / max(CASE WHEN arm = 1 THEN n_arm END)"
                " - max(CASE WHEN arm = 0 THEN s_adj END)"
                " / max(CASE WHEN arm = 0 THEN n_arm END))) AS BIGINT)"
            ).alias("adj_diff_micro")
        )
    )


# --- q326: sample-size / power planning from pilot moments -----------------------

_PWR_Z_HALF_ALPHA_MICRO = 1_959_964  # z_{0.975}
_PWR_Z_BETA_MICRO = 841_621  # z_{0.80}
_PWR_MDE_PCT = 2  # minimum detectable effect: 2% of control mean


@register(
    "q326_power_planning",
    oracle=f"""
    WITH pilot AS (
      SELECT CAST(user_id % 2 AS BIGINT) AS arm, value AS x
      FROM events WHERE event_type = 'purchase'),
    m AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             sum(x) AS sx, sum(x * x) AS sxx
      FROM pilot WHERE arm = 0),
    par AS (
      SELECT n, sx / n AS mu,
             (sxx - sx * sx / n) / (n - 1) AS s2,
             ({_PWR_MDE_PCT} / 100.0) * (sx / n) AS delta
      FROM m),
    req AS (
      SELECT n, mu, s2, delta,
             CAST(ceil(
               (({_PWR_Z_HALF_ALPHA_MICRO} + {_PWR_Z_BETA_MICRO})
                 / 1000000.0)
               * (({_PWR_Z_HALF_ALPHA_MICRO} + {_PWR_Z_BETA_MICRO})
                 / 1000000.0)
               * 2.0 * s2 / (delta * delta)) AS BIGINT) AS n_per_arm
      FROM par)
    SELECT n AS pilot_n,
           CAST(round(1000000.0 * mu) AS BIGINT) AS control_mean_micro,
           CAST(round(1000000.0 * s2) AS BIGINT) AS variance_micro,
           CAST(round(1000000.0 * delta) AS BIGINT) AS mde_micro,
           n_per_arm,
           CAST(CASE WHEN n_per_arm > n THEN 1 ELSE 0 END AS BIGINT)
             AS underpowered
    FROM req
    """,
    doc="SAMPLE-SIZE / POWER PLANNING from pilot moments — the "
    "pre-experiment arithmetic that decides whether q315/q324/q325 "
    "are even worth running: n per arm = (z_a/2 + z_b)^2 * 2 "
    "sigma^2 / delta^2 at 80% power, two-sided 5%, MDE = "
    f"{_PWR_MDE_PCT}% of the control mean, with sigma^2 estimated "
    "from the control arm of the pilot. Both z constants are fixed "
    "integer-micro literals (the q313 rule — normal quantiles "
    "re-derived per engine would need an inverse-CDF neither "
    "engine guarantees bit-identical); the variance evaluates in "
    "DOUBLE throughout. underpowered flags the decision so the "
    "oracle checks it. Scale: one filtered scan folding map-side "
    "to a single moment row; everything else is scalar "
    "arithmetic.",
    tags=("analytics", "ab-test", "power", "scale"),
)
def q326_power_planning(spark: SparkSession, sf_dir: str) -> DataFrame:
    m = (
        t(spark, sf_dir, "events")
        .filter(
            (F.col("event_type") == "purchase")
            & (F.col("user_id") % 2 == 0)
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("value").alias("sx"),
            F.sum(F.col("value") * F.col("value")).alias("sxx"),
        )
    )
    par = m.select(
        "n",
        F.expr("sx / n").alias("mu"),
        F.expr("(sxx - sx * sx / n) / (n - 1)").alias("s2"),
        F.expr(f"({_PWR_MDE_PCT} / 100.0) * (sx / n)").alias("delta"),
    )
    zsum = f"(({_PWR_Z_HALF_ALPHA_MICRO} + {_PWR_Z_BETA_MICRO}) / 1000000.0)"
    return par.select(
        F.col("n").alias("pilot_n"),
        F.expr("CAST(round(1000000.0 * mu) AS BIGINT)").alias(
            "control_mean_micro"
        ),
        F.expr("CAST(round(1000000.0 * s2) AS BIGINT)").alias(
            "variance_micro"
        ),
        F.expr("CAST(round(1000000.0 * delta) AS BIGINT)").alias(
            "mde_micro"
        ),
        F.expr(
            f"CAST(ceil({zsum} * {zsum} * 2.0 * s2 / (delta * delta))"
            " AS BIGINT)"
        ).alias("n_per_arm"),
        F.expr(
            f"CAST(CASE WHEN CAST(ceil({zsum} * {zsum} * 2.0 * s2"
            " / (delta * delta)) AS BIGINT) > n THEN 1 ELSE 0 END"
            " AS BIGINT)"
        ).alias("underpowered"),
    )


# --- q332: quality-classifier calibration (reliability bins + ECE/Brier) ---------
#
# Fixed linear model over exact integer document-quality features; the
# squashing function is the ALGEBRAIC sigmoid s = 1/2 + z/(2(1+|z|)) —
# rational arithmetic only, so both engines evaluate bit-identical
# doubles (exp/ln ulp drift, the q255 class, is designed out rather
# than quantized around). Model constants are fixed integer-micro
# literals (the q313 rule: never re-derived per engine).

_QC_W_TOK = 30_000  # micro-weight per token above the 54-token center
_QC_W_DR = 4_000  # micro-weight per milli of distinct-token ratio
_QC_W_SR = 10_000  # micro-weight per milli of stopword ratio
_QC_C_TOK = 54
_QC_C_DR = 500
_QC_C_SR = 62

_QC_Z = (
    f"CAST({_QC_W_TOK} * (n_tok - {_QC_C_TOK})"
    f" + {_QC_W_DR} * (dr_milli - {_QC_C_DR})"
    f" + {_QC_W_SR} * (sr_milli - {_QC_C_SR}) AS BIGINT)"
)
# z is CAST to DOUBLE before any literal touches it: Spark parses a
# bare `1000000.0` as DECIMAL and would run the whole sigmoid in
# decimal arithmetic (HALF_UP at intermediate scales) while DuckDB
# runs it in DOUBLE — a 1-micro drift at round() boundaries (caught by
# the strict replica on 4 of 500 docs). With the cast, every later op
# promotes to DOUBLE on both engines and the IEEE results are
# bit-identical.
_QC_S = (
    "CAST(round(1000000.0 * (0.5 + (CAST(z_micro AS DOUBLE) / 1000000.0)"
    " / (2.0 * (1.0 + abs(CAST(z_micro AS DOUBLE) / 1000000.0)))))"
    " AS BIGINT)"
)


@register(
    "q332_quality_calibration",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, lang,
             list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                         t -> t <> '') AS arr
      FROM documents),
    feat AS (
      SELECT doc_id,
             CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS label,
             CAST(len(arr) AS BIGINT) AS n_tok,
             CAST(round(1000.0 * CAST(len(list_distinct(arr)) AS DOUBLE) / len(arr))
                  AS BIGINT) AS dr_milli,
             CAST(round(1000.0 * CAST(len(list_filter(arr,
                  t -> t IN ('the', 'a'))) AS DOUBLE) / len(arr))
                  AS BIGINT) AS sr_milli
      FROM toks WHERE len(arr) > 0),
    z AS (SELECT doc_id, label, {_QC_Z} AS z_micro FROM feat),
    s AS (
      SELECT doc_id, label, {_QC_S} AS s_micro FROM z),
    e AS (
      SELECT label, s_micro,
             least(9, s_micro // 100000) AS bin,
             CAST(round(1000000.0 * ((CAST(s_micro AS DOUBLE) / 1000000.0 - label)
                  * (CAST(s_micro AS DOUBLE) / 1000000.0 - label)))
                  AS BIGINT) AS sq_micro
      FROM s),
    bins AS (
      SELECT bin,
             CAST(count(*) AS BIGINT) AS n_docs,
             CAST(round(CAST(sum(s_micro) AS DOUBLE) / count(*)) AS BIGINT)
               AS mean_pred_micro,
             1000000 * CAST(sum(label) AS BIGINT) // count(*)
               AS frac_pos_micro,
             CAST(sum(sq_micro) AS BIGINT) AS sum_sq_micro
      FROM e GROUP BY bin),
    gaps AS (
      SELECT bin, n_docs, mean_pred_micro, frac_pos_micro, sum_sq_micro,
             abs(mean_pred_micro - frac_pos_micro) AS cal_gap_micro
      FROM bins),
    tot AS (
      SELECT CAST(round(CAST(sum(n_docs * cal_gap_micro) AS DOUBLE)
                  / sum(n_docs)) AS BIGINT) AS ece_micro,
             CAST(round(CAST(sum(sum_sq_micro) AS DOUBLE) / sum(n_docs))
                  AS BIGINT) AS brier_micro
      FROM gaps)
    SELECT g.bin, g.n_docs, g.mean_pred_micro, g.frac_pos_micro,
           g.cal_gap_micro, t.ece_micro, t.brier_micro
    FROM gaps g CROSS JOIN tot t
    ORDER BY g.bin
    """,
    doc="QUALITY-CLASSIFIER CALIBRATION — the eval step that decides "
    "whether a quality filter's scores can be USED as probabilities "
    "(reliability bins + ECE + Brier, the proper-scoring "
    "complement to q200's rank-decile curve): a fixed linear model "
    "over exact integer doc features (token count, distinct-token "
    "ratio, stopword ratio — all milli-quantized BEFORE the dot "
    "product, the q100 rule) squashed by the ALGEBRAIC sigmoid "
    "1/2 + z/(2(1+|z|)) — rational ops only, so the engines agree "
    "bit-for-bit with no transcendental ulp risk (the q255 class "
    "designed out). label = (lang = 'en'); 10 equal-width "
    "probability bins; per-bin mean prediction vs observed rate, "
    "|gap|, and corpus ECE/Brier in micro-units (per-doc squared "
    "error micro-quantized before the sum, so the fold is exact "
    "int64). Scale: one doc-grain projection + one hash-agg onto "
    "<= 10 bins (map-side combinable); the totals fold runs on "
    "the 10-row bin relation. Composes with q325: CUPED-adjusting "
    "a metric by a calibrated score requires THIS check first.",
    tags=("analytics", "llm", "quality", "calibration", "eval", "scale"),
)
def q332_quality_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    toks = t(spark, sf_dir, "documents").select(
        "doc_id",
        "lang",
        F.filter(
            F.split(F.lower(F.col("text")), "[^a-z0-9]+"), lambda x: x != ""
        ).alias("arr"),
    )
    feat = toks.filter(F.size("arr") > 0).select(
        "doc_id",
        F.when(F.col("lang") == "en", 1).otherwise(0).alias("label"),
        F.size("arr").cast("long").alias("n_tok"),
        F.expr(
            "CAST(round(1000.0 * CAST(size(array_distinct(arr)) AS DOUBLE)"
            " / size(arr))"
            " AS BIGINT)"
        ).alias("dr_milli"),
        F.expr(
            "CAST(round(1000.0 * CAST(size(filter(arr,"
            " t -> t IN ('the', 'a'))) AS DOUBLE) / size(arr)) AS BIGINT)"
        ).alias("sr_milli"),
    )
    s = feat.withColumn("z_micro", F.expr(_QC_Z)).withColumn(
        "s_micro", F.expr(_QC_S)
    )
    e = s.select(
        "label",
        "s_micro",
        F.expr("least(9, s_micro div 100000)").alias("bin"),
        F.expr(
            "CAST(round(1000000.0 * ((CAST(s_micro AS DOUBLE) / 1000000.0 - label)"
            " * (CAST(s_micro AS DOUBLE) / 1000000.0 - label))) AS BIGINT)"
        ).alias("sq_micro"),
    )
    bins = e.groupBy("bin").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.expr(
            "CAST(round(CAST(sum(s_micro) AS DOUBLE) / count(1)) AS BIGINT)"
        ).alias("mean_pred_micro"),
        F.expr("1000000 * sum(label) div count(1)")
        .cast("long")
        .alias("frac_pos_micro"),
        F.sum("sq_micro").cast("long").alias("sum_sq_micro"),
    )
    gaps = bins.withColumn(
        "cal_gap_micro",
        F.abs(F.col("mean_pred_micro") - F.col("frac_pos_micro")).cast("long"),
    )
    tot = gaps.agg(
        F.expr(
            "CAST(round(CAST(sum(n_docs * cal_gap_micro) AS DOUBLE)"
            " / sum(n_docs)) AS BIGINT)"
        ).alias("ece_micro"),
        F.expr(
            "CAST(round(CAST(sum(sum_sq_micro) AS DOUBLE) / sum(n_docs))"
            " AS BIGINT)"
        ).alias("brier_micro"),
    )
    return (
        gaps.crossJoin(F.broadcast(tot))
        .select(
            F.col("bin").cast("long").alias("bin"),
            "n_docs",
            "mean_pred_micro",
            "frac_pos_micro",
            "cal_gap_micro",
            "ece_micro",
            "brier_micro",
        )
        .orderBy("bin")
    )
