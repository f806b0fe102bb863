"""Relational core: scans, filters, equi/semi/anti/positional/range joins,
hash aggregations, grouping sets, pivot, scalar functions.

Each query re-expresses an operator from SURVEY.md §2 on the driver's
testdata tables, with the DuckDB oracle form attached. Reference
citations (file:line under /root/reference/) are in each docstring.

Scale notes apply to every query here: filters/projections are written
directly on the scan so Catalyst pushes them into the Parquet reader;
small dimensions are broadcast explicitly; aggregations are plain
``groupBy`` so partial (map-side) aggregation happens before the shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from columnarmodeling_spark.operators.indexing import with_global_index
from columnarmodeling_spark.queries import register
from columnarmodeling_spark.queries._util import t

# ---------------------------------------------------------------------------
# Scan → filter → aggregate (the reference's stress–strain pipeline shape:
# S2 particle scan + P2 platen range filter + A7 reaction aggregation,
# cf. BALL3D_PSLICE.dat / MLSLD00.dat / MLSOut00E.dat)
# ---------------------------------------------------------------------------


@register(
    "q01_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2)                                       AS sum_qty,
           round(sum(l_extendedprice), 2)                                  AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 2)               AS sum_disc_price,
           round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
           round(avg(l_quantity), 4)                                       AS avg_qty,
           round(avg(l_extendedprice), 4)                                  AS avg_price,
           round(avg(l_discount), 4)                                       AS avg_disc,
           count(*)                                                        AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
    doc="Flagship scan→filter→agg: the reference's per-step reaction-force "
    "aggregation (Output/MLSOut00E.dat, SURVEY §2.4 A7) as TPC-H Q1 shape.",
    tags=("scan", "filter", "agg", "A7", "P2", "S2"),
)
def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc), 2).alias("sum_disc_price"),
            F.round(F.sum(disc * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


@register(
    "q02_regional_revenue",
    oracle="""
    SELECT r_name, n_name,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           count(*) AS n_items
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1998-01-01'
    GROUP BY r_name, n_name
    """,
    doc="Multiway star join with broadcast dims (SURVEY §2.3 J2/J6: "
    "particle.group→material and facet.jmat→joint-material lookups, "
    "MLSMat00.dat / MLSJMat.dat).",
    tags=("join", "broadcast", "J2", "J6"),
)
def q02_regional_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    orders = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    cust = t(spark, sf_dir, "customer")
    nat = t(spark, sf_dir, "nation")
    reg = t(spark, sf_dir, "region")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nat), cust.c_nationkey == nat.n_nationkey)
        .join(F.broadcast(reg), nat.n_regionkey == reg.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


@register(
    "q03_semi_join_orders",
    oracle="""
    SELECT o_orderkey, o_orderpriority
    FROM orders
    WHERE EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_quantity >= 48)
    """,
    doc="Semi-join probe lookup (SURVEY §2.3 J4: MeasurePar.dat measured "
    "particle ids kept via semi-join).",
    tags=("join", "semi", "J4"),
)
def q03_semi_join_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders")
    big = t(spark, sf_dir, "lineitem").filter(F.col("l_quantity") >= 48)
    return orders.join(
        big, orders.o_orderkey == big.l_orderkey, "left_semi"
    ).select("o_orderkey", "o_orderpriority")


@register(
    "q04_anti_join_customers",
    oracle="""
    SELECT c_custkey, c_mktsegment
    FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey AND o_orderstatus = 'P')
    """,
    doc="Anti-join exclusion (SURVEY §2.3 J3: layer-2 pool = eligible ∖ "
    "(selected ∪ neighbors), GenerateColumnar.py:285-289). Filtered to "
    "pending orders so the exclusion set is non-trivial at every sf.",
    tags=("join", "anti", "J3", "U2"),
)
def q04_anti_join_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = t(spark, sf_dir, "customer")
    pending = t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "P")
    return cust.join(
        pending, cust.c_custkey == pending.o_custkey, "left_anti"
    ).select("c_custkey", "c_mktsegment")


@register(
    "q05_positional_sections",
    oracle="""
    WITH a AS (SELECT row_number() OVER (ORDER BY n_nationkey) AS rn, n_name
               FROM nation),
         b AS (SELECT row_number() OVER (ORDER BY n_nationkey) AS rn, n_regionkey
               FROM nation)
    SELECT a.rn AS rn, a.n_name AS n_name, b.n_regionkey AS n_regionkey
    FROM a JOIN b ON a.rn = b.rn
    """,
    doc="Two-section positional join (SURVEY §2.1 S4 / §2.3 J5: "
    "MLSJDat.dat geometry rows ∥ attribute rows aligned by row index).",
    tags=("join", "positional", "S4", "J5"),
)
def q05_positional_sections(spark: SparkSession, sf_dir: str) -> DataFrame:
    nat = t(spark, sf_dir, "nation")
    w = W.orderBy("n_nationkey")
    a = nat.select(F.row_number().over(w).alias("rn"), "n_name")
    b = nat.select(F.row_number().over(w).alias("rn2"), "n_regionkey")
    return a.join(b, a.rn == b.rn2).select("rn", "n_name", "n_regionkey")


@register(
    "q06_range_band_join",
    oracle="""
    SELECT r_name AS band,
           count(*) AS n_customers,
           round(sum(c_acctbal), 2) AS sum_bal
    FROM customer
    JOIN region ON c_acctbal >= r_regionkey * 2000.0
               AND c_acctbal <  r_regionkey * 2000.0 + 2000.0
    GROUP BY r_name
    """,
    doc="Broadcast range (theta) join: the boundary-condition table applied "
    "to particles by coordinate range (SURVEY §2.2 P2 / §2.3 J6: "
    "MLSLD00.dat ranges, SysFile.ini:74-93).",
    tags=("join", "range", "theta", "P2", "J6"),
)
def q06_range_band_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = t(spark, sf_dir, "customer")
    bands = t(spark, sf_dir, "region").select(
        F.col("r_name"),
        (F.col("r_regionkey") * 2000.0).alias("lo"),
        (F.col("r_regionkey") * 2000.0 + 2000.0).alias("hi"),
    )
    return (
        cust.join(
            F.broadcast(bands),
            (cust.c_acctbal >= bands.lo) & (cust.c_acctbal < bands.hi),
        )
        .groupBy(F.col("r_name").alias("band"))
        .agg(
            F.count("*").alias("n_customers"),
            F.round(F.sum("c_acctbal"), 2).alias("sum_bal"),
        )
    )


@register(
    "q07_rounded_dedup_dense_id",
    oracle="""
    WITH d AS (SELECT DISTINCT round(c_acctbal, -2) + 0.0 AS bal_bucket,
                      c_nationkey
               FROM customer)
    SELECT bal_bucket, c_nationkey,
           row_number() OVER (ORDER BY bal_bucket, c_nationkey) AS dense_id
    FROM d
    """,
    doc="Rounded-key dedup + dense id assignment (SURVEY §2.4 A3: node dedup "
    "on round(x,6) keys with incremental ids, GenerateColumnar.py:146-151). "
    "Dense ids come from the two-pass range-partitioned global index "
    "(operators/indexing.py) — NOT a single-partition global window. "
    "`+ 0.0` on both sides normalizes IEEE -0.0 (DuckDB round(-x,-2) "
    "emits -0.0, Spark emits 0.0 — equal values, different strings).",
    tags=("dedup", "A3", "window"),
)
def q07_rounded_dedup_dense_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = t(spark, sf_dir, "customer")
    d = cust.select(
        (F.round("c_acctbal", -2) + F.lit(0.0)).alias("bal_bucket"),
        "c_nationkey",
    ).distinct()
    return with_global_index(d, ["bal_bucket", "c_nationkey"], "dense_id")


@register(
    "q08_flag_quota",
    oracle="""
    SELECT CAST(sum(CASE WHEN l_discount > 0.05 THEN 1 ELSE 0 END)
                AS BIGINT)                                    AS n_discounted,
           count(*)                                           AS n_total,
           CAST(ceil(sum(CASE WHEN l_discount > 0.05 THEN 1 ELSE 0 END) / 4.0)
                AS BIGINT)                                    AS quota
    FROM lineitem
    """,
    doc="Boolean-flag counting + quota (SURVEY §2.4 A5/A6: boundary-grain "
    "count and num_select=ceil(|eligible|/n_joint), "
    "GenerateColumnar.py:247-251).",
    tags=("agg", "A5", "A6"),
)
def q08_flag_quota(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    flagged = F.sum(F.when(F.col("l_discount") > 0.05, 1).otherwise(0))
    return li.agg(
        flagged.alias("n_discounted"),
        F.count("*").alias("n_total"),
        F.ceil(flagged / 4.0).cast("long").alias("quota"),
    )


@register(
    "q09_group_centroids",
    oracle="""
    SELECT c_nationkey,
           round(avg(c_acctbal), 6) AS cx,
           round(avg(c_custkey), 6) AS cy,
           count(*) AS n_members
    FROM customer
    GROUP BY c_nationkey
    """,
    doc="Per-group centroid (SURVEY §2.4 A1: polygon centroid = mean of "
    "member coordinates, GenerateColumnar.py:107,195). Hash aggregate: "
    "partial (map-side) + final for free.",
    tags=("agg", "A1"),
)
def q09_group_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = t(spark, sf_dir, "customer")
    return cust.groupBy("c_nationkey").agg(
        F.round(F.avg("c_acctbal"), 6).alias("cx"),
        F.round(F.avg("c_custkey"), 6).alias("cy"),
        F.count("*").alias("n_members"),
    )


@register(
    "q10_event_histogram",
    oracle="""
    SELECT event_type, count(*) AS n,
           round(sum(value), 2) AS sum_value,
           count(DISTINCT user_id) AS n_users
    FROM events
    GROUP BY event_type
    """,
    doc="Edge-type histogram (SURVEY §2.4 A9: bond-type counts in "
    "MLSBond.dat — 3142 type-1 vs 10670 type-10).",
    tags=("agg", "A9"),
)
def q10_event_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.round(F.sum("value"), 2).alias("sum_value"),
        F.countDistinct("user_id").alias("n_users"),
    )


# ---------------------------------------------------------------------------
# Grouping sets / cube / pivot (absent in the reference; exposed per
# SURVEY §2.4 note, free in Spark, oracle-testable)
# ---------------------------------------------------------------------------


@register(
    "q11_grouping_sets",
    oracle="""
    SELECT o_orderpriority, o_orderstatus,
           grouping(o_orderpriority) AS g_pri,
           grouping(o_orderstatus)   AS g_st,
           count(*) AS n, round(sum(o_totalprice), 2) AS total
    FROM orders
    GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus), ())
    """,
    doc="GROUPING SETS on the order fact (SURVEY §2.4 note: exposed beyond "
    "the reference's surface).",
    tags=("agg", "grouping-sets"),
)
def q11_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    t(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT o_orderpriority, o_orderstatus,
               cast(grouping(o_orderpriority) AS INT) AS g_pri,
               cast(grouping(o_orderstatus) AS INT)   AS g_st,
               count(*) AS n, round(sum(o_totalprice), 2) AS total
        FROM orders
        GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus), ())
        """
    )


@register(
    "q12_cube_agg",
    oracle="""
    SELECT l_returnflag, l_linestatus, count(*) AS n,
           round(sum(l_quantity), 2) AS sum_qty
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
    doc="CUBE over the lineitem fact (SURVEY §2.4 note).",
    tags=("agg", "cube"),
)
def q12_cube_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.count("*").alias("n"),
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
    )


@register(
    "q13_pivot_qty",
    oracle="""
    SELECT l_returnflag,
           round(sum(CASE WHEN l_linestatus = 'O' THEN l_quantity END), 2) AS qty_O,
           round(sum(CASE WHEN l_linestatus = 'F' THEN l_quantity END), 2) AS qty_F
    FROM lineitem
    GROUP BY l_returnflag
    """,
    doc="Pivot (wide aggregation) — engine extension; oracle is the "
    "CASE-WHEN expansion.",
    tags=("agg", "pivot"),
)
def q13_pivot_qty(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    p = (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(F.round(F.sum("l_quantity"), 2))
    )
    return p.select(
        "l_returnflag",
        F.col("O").alias("qty_O"),
        F.col("F").alias("qty_F"),
    )


# ---------------------------------------------------------------------------
# Scalar function surface (SURVEY §2.7)
# ---------------------------------------------------------------------------


@register(
    "q14_string_funcs",
    oracle="""
    SELECT p_partkey,
           upper(p_name)                    AS name_upper,
           length(p_name)                   AS name_len,
           substr(p_brand, 7, 2)            AS brand_code,
           concat(p_type, '/', p_brand)     AS type_brand,
           replace(p_name, ' ', '_')        AS name_snake,
           len(string_split(p_name, ' '))   AS n_words
    FROM part
    """,
    doc="String scalar functions (SURVEY §2.7: split/strip parse "
    "BooleanOperation.py:52, join :169, fixed-format "
    "GenerateColumnar.py:327-330).",
    tags=("scalar", "string"),
)
def q14_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = t(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.length("p_name").alias("name_len"),
        F.substring("p_brand", 7, 2).alias("brand_code"),
        F.concat_ws("/", "p_type", "p_brand").alias("type_brand"),
        F.regexp_replace("p_name", " ", "_").alias("name_snake"),
        F.size(F.split("p_name", " ")).alias("n_words"),
    )


@register(
    "q15_datetime_funcs",
    oracle="""
    SELECT o_orderkey,
           CAST(extract(year FROM o_orderdate) AS INT)    AS yr,
           CAST(extract(month FROM o_orderdate) AS INT)   AS mo,
           CAST(extract(day FROM o_orderdate) AS INT)     AS dy,
           CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
           CAST(floor(epoch(o_orderdate)) AS BIGINT)      AS epoch_s
    FROM orders
    """,
    doc="Datetime scalar functions — the reference's time axis is "
    "step*dT (MLS00con.dat:4, SysFile.ini:55-59); exposed on real "
    "timestamps. UTC session TZ keeps epoch identical to the oracle.",
    tags=("scalar", "datetime"),
)
def q15_datetime_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("yr"),
        F.month("o_orderdate").alias("mo"),
        F.dayofmonth("o_orderdate").alias("dy"),
        F.date_trunc("month", "o_orderdate").alias("month_start"),
        F.unix_timestamp("o_orderdate").alias("epoch_s"),
    )


@register(
    "q16_math_clamp",
    oracle="""
    SELECT p_partkey,
           round(sqrt(p_retailprice), 6)                       AS sqrt_price,
           round(ln(p_retailprice + 1.0), 6)                   AS ln_price,
           abs(p_size - 25)                                    AS dev,
           CAST(sign(p_size - 25) AS INT)                      AS sgn,
           round(greatest(0.01, least(p_size / 3.0, 15.0)), 6) AS clamped,
           round(power(p_size, 2), 2)                          AS size_sq
    FROM part
    """,
    doc="Math scalar functions + clamp projection (SURVEY §2.2 P6: "
    "max(0.01, min(angle, 15.0)) GenerateColumnar.py:187,210; §2.7 "
    "tan/radians/sqrt/ceil/round).",
    tags=("scalar", "math", "P6"),
)
def q16_math_clamp(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = t(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.round(F.sqrt("p_retailprice"), 6).alias("sqrt_price"),
        F.round(F.log(F.col("p_retailprice") + 1.0), 6).alias("ln_price"),
        F.abs(F.col("p_size") - 25).alias("dev"),
        F.signum(F.col("p_size") - 25).cast("int").alias("sgn"),
        F.round(
            F.greatest(F.lit(0.01), F.least(F.col("p_size") / 3.0, F.lit(15.0))), 6
        ).alias("clamped"),
        F.round(F.pow("p_size", F.lit(2)), 2).alias("size_sq"),
    )


@register(
    "q17_topk_per_group",
    oracle="""
    SELECT * FROM (
        SELECT o_orderpriority, o_orderkey, o_totalprice,
               row_number() OVER (PARTITION BY o_orderpriority
                                  ORDER BY o_totalprice DESC, o_orderkey) AS rk
        FROM orders)
    WHERE rk <= 3
    """,
    doc="Top-k per group (SURVEY §2.5: W4's quota break as limit-after-"
    "ordered-window; GenerateColumnar.py:258).",
    tags=("window", "topk", "W4"),
)
def q17_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders")
    w = W.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        o.select(
            "o_orderpriority",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).alias("rk"),
        )
        .filter(F.col("rk") <= 3)
    )


# ---------------------------------------------------------------------------
# Ragged-array operators (SURVEY §1.1 element table; §2.2 P1 higher-order
# predicates over variable-length vertex lists)
# ---------------------------------------------------------------------------


@register(
    "q18_array_hof",
    oracle="""
    SELECT l_orderkey,
           count(*)                                        AS n_items,
           bool_or(l_quantity > 49)                        AS has_big,
           bool_and(l_discount <= 0.1)                     AS all_low_disc,
           CAST(sum(CASE WHEN l_quantity > 25 THEN 1 ELSE 0 END)
                AS BIGINT)                                   AS n_over_half,
           round(sum(l_quantity), 2)                       AS qty_sum
    FROM lineitem
    GROUP BY l_orderkey
    """,
    doc="Higher-order functions over ragged arrays (SURVEY §2.2 P1: "
    "exists(vertices, v -> v.x <= tol) boundary predicate, "
    "GenerateColumnar.py:236-243; arrays built per §2.4 A2 "
    "collect_list). exists/forall/filter/aggregate on ArrayType.",
    tags=("array", "hof", "P1", "A2"),
)
def q18_array_hof(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    grains = li.groupBy("l_orderkey").agg(
        F.collect_list(F.struct("l_quantity", "l_discount")).alias("vs")
    )
    return grains.select(
        "l_orderkey",
        F.size("vs").cast("long").alias("n_items"),
        F.exists("vs", lambda v: v.l_quantity > 49).alias("has_big"),
        F.forall("vs", lambda v: v.l_discount <= 0.1).alias("all_low_disc"),
        F.size(F.filter("vs", lambda v: v.l_quantity > 25))
        .cast("long")
        .alias("n_over_half"),
        F.round(
            F.aggregate(
                "vs", F.lit(0.0), lambda acc, v: acc + v.l_quantity
            ),
            2,
        ).alias("qty_sum"),
    )


@register(
    "q19_mirror_union",
    oracle="""
    SELECT 'c'  AS copy, s_suppkey, round(s_acctbal, 2) + 0.0 AS x, CAST(s_suppkey % 50 AS DOUBLE) + 0.0 AS y FROM supplier
    UNION ALL
    SELECT 'mx' AS copy, s_suppkey, round(-s_acctbal, 2) + 0.0 AS x, CAST(s_suppkey % 50 AS DOUBLE) + 0.0 AS y FROM supplier
    UNION ALL
    SELECT 'px' AS copy, s_suppkey, round(2*12000.0 - s_acctbal, 2) + 0.0 AS x, CAST(s_suppkey % 50 AS DOUBLE) + 0.0 AS y FROM supplier
    UNION ALL
    SELECT 'my' AS copy, s_suppkey, round(s_acctbal, 2) + 0.0 AS x, CAST(-(s_suppkey % 50) AS DOUBLE) + 0.0 AS y FROM supplier
    UNION ALL
    SELECT 'py' AS copy, s_suppkey, round(s_acctbal, 2) + 0.0 AS x, CAST(2*50 - (s_suppkey % 50) AS DOUBLE) + 0.0 AS y FROM supplier
    """,
    doc="5-way mirror union (SURVEY §2.6 U1: mirrored seed copies for "
    "unbounded Voronoi cells, GenerateColumnar.py:80-86,116-121).",
    tags=("setop", "union", "U1"),
)
def q19_mirror_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = t(spark, sf_dir, "supplier").select(
        "s_suppkey",
        F.col("s_acctbal").alias("x0"),
        (F.col("s_suppkey") % 50).cast("double").alias("y0"),
    )

    def copy(tag: str, x, y) -> DataFrame:
        # `+ 0.0` collapses IEEE -0.0 (from mirroring a zero coordinate)
        # to 0.0 so both engines stringify identically.
        return s.select(
            F.lit(tag).alias("copy"),
            "s_suppkey",
            (F.round(x, 2) + F.lit(0.0)).alias("x"),
            (y.cast("double") + F.lit(0.0)).alias("y"),
        )

    x0, y0 = F.col("x0"), F.col("y0")
    return (
        copy("c", x0, y0)
        .unionByName(copy("mx", -x0, y0))
        .unionByName(copy("px", 2 * 12000.0 - x0, y0))
        .unionByName(copy("my", x0, -y0))
        .unionByName(copy("py", x0, 2 * 50 - y0))
    )


@register(
    "q20_boundary_touch",
    oracle="""
    SELECT s_nationkey,
           count(*) AS n_vertices,
           bool_or(s_acctbal <= 0.0 OR s_acctbal >= 9000.0
                   OR s_suppkey % 50 <= 1 OR s_suppkey % 50 >= 48) AS touches
    FROM supplier
    GROUP BY s_nationkey
    """,
    doc="Boundary-touch predicate over ragged vertex arrays (SURVEY §2.2 "
    "P1, GenerateColumnar.py:236-243): exists() over the collected "
    "per-grain vertex list.",
    tags=("array", "hof", "P1", "A5"),
)
def q20_boundary_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = t(spark, sf_dir, "supplier").select(
        "s_nationkey",
        F.struct(
            F.col("s_acctbal").alias("x"),
            (F.col("s_suppkey") % 50).cast("double").alias("y"),
        ).alias("v"),
    )
    grains = s.groupBy("s_nationkey").agg(F.collect_list("v").alias("vs"))
    touch = lambda v: (  # noqa: E731
        (v.x <= 0.0) | (v.x >= 9000.0) | (v.y <= 1.0) | (v.y >= 48.0)
    )
    return grains.select(
        "s_nationkey",
        F.size("vs").cast("long").alias("n_vertices"),
        F.exists("vs", touch).alias("touches"),
    )


@register(
    "q21_json_extract",
    oracle="""
    SELECT event_id,
           CAST(regexp_extract(props, '"k": (-?[0-9]+)', 1) AS BIGINT) AS k_val
    FROM events
    """,
    doc="Semi-structured field extraction from the events props payload "
    "(engine extension; the reference has no string data at all, "
    "SURVEY §1.2).",
    tags=("scalar", "json"),
)
def q21_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("long").alias("k_val"),
    )


@register(
    "q33_affine_projection",
    oracle="""
    WITH pts AS (
      SELECT p_partkey, p_brand,
             p_retailprice - 950.0 AS x,
             (p_size - 25) * 2.0   AS y
      FROM part),
    cent AS (
      SELECT p_brand,
             avg(x) AS cx, avg(y) AS cy
      FROM pts GROUP BY p_brand)
    SELECT p.p_partkey,
           round(p.x * cos(radians(30.0)) - p.y * sin(radians(30.0)) + 5.0, 6)
               AS rx,
           round(p.x * sin(radians(30.0)) + p.y * cos(radians(30.0)) - 2.0, 6)
               AS ry,
           round(c.cx + (p.x - c.cx) * 0.8, 6) AS sx,
           round(c.cy + (p.y - c.cy) * 0.8, 6) AS sy
    FROM pts p JOIN cent c ON p.p_brand = c.p_brand
    """,
    doc="Affine projections (SURVEY §2.2 P7: translate / rotate about a "
    "point / scale-toward-centroid, BooleanOperation.py:26-27,199-210, "
    "GenerateColumnar.py:211-218): rotation as cos/sin withColumn "
    "arithmetic; shrink factor 0.8 toward the per-group centroid "
    "(broadcast A1 centroid join). Pure JVM expressions — whole-stage "
    "codegen, no UDF.",
    tags=("scalar", "projection", "P7", "A1"),
)
def q33_affine_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = t(spark, sf_dir, "part").select(
        "p_partkey",
        "p_brand",
        (F.col("p_retailprice") - 950.0).alias("x"),
        ((F.col("p_size") - 25) * 2.0).alias("y"),
    )
    cent = p.groupBy("p_brand").agg(
        F.avg("x").alias("cx"), F.avg("y").alias("cy")
    )
    th = F.radians(F.lit(30.0))
    return p.join(F.broadcast(cent), "p_brand").select(
        "p_partkey",
        F.round(F.col("x") * F.cos(th) - F.col("y") * F.sin(th) + 5.0, 6).alias("rx"),
        F.round(F.col("x") * F.sin(th) + F.col("y") * F.cos(th) - 2.0, 6).alias("ry"),
        F.round(F.col("cx") + (F.col("x") - F.col("cx")) * 0.8, 6).alias("sx"),
        F.round(F.col("cy") + (F.col("y") - F.col("cy")) * 0.8, 6).alias("sy"),
    )


@register(
    "q34_reject_filters",
    oracle="""
    WITH faces AS (
      SELECT l_orderkey,
             list(l_quantity ORDER BY l_linenumber)      AS zs,
             count(*)                                    AS nv
      FROM lineitem GROUP BY l_orderkey),
    typed AS (
      SELECT f.l_orderkey, f.zs, f.nv
      FROM faces f JOIN orders o ON f.l_orderkey = o.o_orderkey
      WHERE o.o_orderstatus <> 'F')
    SELECT l_orderkey, nv
    FROM typed
    WHERE nv >= 3
      AND NOT EXISTS (
        SELECT 1 FROM unnest(typed.zs) AS u(z) WHERE z < 5.0 OR z > 45.0)
    """,
    doc="Spatial-reject + type + degenerate filters over ragged vertex "
    "arrays (SURVEY §2.2 P3: drop faces crossing the clip planes, "
    "BooleanOperation.py:129-149; P4: delete line-type objects :151-155; "
    "P5: drop degenerate geometry, size < 3). Vertex list assembled per "
    "key (A2), then NOT exists(zs, z -> out-of-range) — higher-order "
    "array predicate, JVM-side.",
    tags=("array", "hof", "P3", "P4", "P5", "A2"),
)
def q34_reject_filters(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_quantity"
    )
    faces = (
        li.groupBy("l_orderkey")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("l_linenumber", "l_quantity"))
            ).alias("vs")
        )
        .select(
            "l_orderkey",
            F.transform("vs", lambda v: v["l_quantity"]).alias("zs"),
            F.size("vs").alias("nv"),
        )
    )
    orders = t(spark, sf_dir, "orders").select("o_orderkey", "o_orderstatus")
    return (
        faces.join(
            orders.filter(F.col("o_orderstatus") != "F"),
            faces.l_orderkey == orders.o_orderkey,
        )
        .filter(F.col("nv") >= 3)
        .filter(~F.exists("zs", lambda z: (z < 5.0) | (z > 45.0)))
        .select("l_orderkey", "nv")
    )


@register(
    "q41_epsilon_dedup",
    oracle="""
    WITH pts AS (
      SELECT p_partkey AS id,
             p_retailprice      AS x,
             p_size * 2.0       AS y
      FROM part)
    SELECT a.id, round(a.x, 2) AS x, round(a.y, 2) AS y
    FROM pts a
    WHERE NOT EXISTS (
      SELECT 1 FROM pts b
      WHERE b.id < a.id
        AND sqrt((a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y)) < 0.75)
    """,
    doc="Epsilon near-duplicate elimination (SURVEY §2.4 A4: drop faces "
    "whose centroid lies within 1e-6 of an earlier-kept face, "
    "BooleanOperation.py:85-95 — the reference's O(n^2) loop replaced by "
    "the binned self-join: grid cells of size eps, 9-cell candidate "
    "pairs, survivor = row with no smaller id within eps). Deterministic "
    "variant: 'smaller id wins' instead of the loop's arrival order — "
    "same observable dedup on the reference data where clusters are "
    "mutual. The oracle is the naive quadratic NOT EXISTS; the engine "
    "side never materializes the pair space (same J1 skeleton as q30).",
    tags=("dedup", "A4", "join", "scale"),
)
def q41_epsilon_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from columnarmodeling_spark.operators.proximity import grid_proximity_join

    pts = t(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("id"),
        F.col("p_retailprice").alias("x"),
        (F.col("p_size") * 2.0).alias("y"),
    )
    pairs = grid_proximity_join(pts, eps=0.75, coords=("x", "y"), id_col="id")
    # any pair (src < dst) within eps eliminates dst
    dropped = pairs.select(F.col("dst").alias("id")).distinct()
    return pts.join(dropped, "id", "left_anti").select(
        "id", F.round("x", 2).alias("x"), F.round("y", 2).alias("y")
    )


@register(
    "q35_rollup",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           count(*) AS n_orders,
           round(sum(o_totalprice), 2) AS revenue,
           GROUPING(o_orderstatus) + 2 * GROUPING(o_orderpriority) AS gid
    FROM orders
    GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """,
    doc="ROLLUP hierarchy aggregation — completes the grouping trio with "
    "q11 (GROUPING SETS) and q12 (CUBE); SURVEY §2.4 note: exposed "
    "beyond the reference's surface, free in Spark, oracle-testable.",
    tags=("agg", "rollup"),
)
def q35_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders")
    return (
        o.rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
            (
                F.grouping("o_orderstatus")
                + F.lit(2) * F.grouping("o_orderpriority")
            ).alias("gid"),
        )
        .select("o_orderstatus", "o_orderpriority", "n_orders", "revenue", "gid")
    )


@register(
    "q37_percentiles",
    oracle="""
    SELECT l_returnflag,
           round(quantile_cont(l_quantity, 0.25), 6) AS p25,
           round(quantile_cont(l_quantity, 0.50), 6) AS p50,
           round(quantile_cont(l_quantity, 0.95), 6) AS p95,
           round(quantile_cont(l_extendedprice, 0.50), 6) AS price_p50
    FROM lineitem GROUP BY l_returnflag
    """,
    doc="Exact interpolated percentiles per group (order statistics over "
    "the snapshot fact — the engine's quantile surface; Spark "
    "percentile() and DuckDB quantile_cont share the linear-"
    "interpolation definition). EXACTNESS CONSTRAINT (guide §5, "
    "accepted): exact percentile() buffers EVERY value per group in "
    "the agg state — bounded here only because l_returnflag has 3 "
    "groups of sf-proportional size; do NOT 'optimize' this into "
    "percentile_approx (t-digest) — the approximate sketch changes "
    "the values and breaks oracle parity. At scale the approximate "
    "path is percentile_approx — same call shape, sketch-mergeable "
    "across partitions — but it is a DIFFERENT query contract.",
    tags=("agg", "percentile", "stats"),
)
def q37_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    # one percentile() buffer per column: the array form computes all
    # three l_quantity order statistics from a single per-group buffer
    # instead of three (same interpolation, same values — r15)
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.expr(
                "percentile(l_quantity, array(0.25D, 0.50D, 0.95D))"
            ).alias("qs"),
            F.expr("percentile(l_extendedprice, 0.50D)").alias("ep"),
        )
        .select(
            "l_returnflag",
            F.round(F.col("qs")[0], 6).alias("p25"),
            F.round(F.col("qs")[1], 6).alias("p50"),
            F.round(F.col("qs")[2], 6).alias("p95"),
            F.round("ep", 6).alias("price_p50"),
        )
    )


@register(
    "q38_salted_agg",
    oracle="""
    SELECT user_id, count(*) AS n, round(sum(value), 2) AS total
    FROM events GROUP BY user_id
    """,
    doc="Skew-resistant two-stage (salted) aggregation: stage 1 groups "
    "by (key, salt) so one hot key spreads over 8 reducers, stage 2 "
    "merges partials per key — the mitigation for the proximity join's "
    "hot central cells (SURVEY §4) and any power-law key at 100 TB. "
    "Observable result identical to the plain groupBy (the oracle).",
    tags=("agg", "skew", "salt", "scale"),
)
def q38_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    partial = (
        ev.withColumn("salt", F.pmod(F.col("event_id"), F.lit(8)))
        .groupBy("user_id", "salt")
        .agg(F.count("*").alias("pn"), F.sum("value").alias("pv"))
    )
    return partial.groupBy("user_id").agg(
        F.sum("pn").alias("n"),
        F.round(F.sum("pv"), 2).alias("total"),
    )


# --- q310: profiler-driven adaptive salting -----------------------------------

# Salt when the sampled skew factor max/(N/K) crosses 2x — below that a
# plain hash agg balances fine and the extra shuffle stage is pure cost.
_ADAPTIVE_SKEW_MILLI = 2000
_ADAPTIVE_SAMPLE_MOD = 37  # deterministic ~2.7% profile sample
_ADAPTIVE_SALT = 8


@register(
    "q310_skew_adaptive_agg",
    oracle=f"""
    WITH prof AS (
      SELECT CAST(coalesce(round(1000.0 * max(c) * count(*) / sum(c)), 0)
                  AS BIGINT) AS skew_milli
      FROM (SELECT user_id, CAST(count(*) AS BIGINT) AS c
            FROM events
            WHERE event_id % {_ADAPTIVE_SAMPLE_MOD} = 0
            GROUP BY user_id))
    SELECT e.user_id,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(round(100.0 * e.value) AS BIGINT)) AS BIGINT)
             AS total_cents,
           p.skew_milli,
           p.skew_milli >= {_ADAPTIVE_SKEW_MILLI} AS salted
    FROM events e CROSS JOIN prof p
    GROUP BY e.user_id, p.skew_milli
    """,
    doc="PROFILER-DRIVEN ADAPTIVE SALTING — the q274 skew report turned "
    "into a plan decision (r10 verdict item 6: the profiler reported, "
    "nothing consumed it): a cheap deterministic ~2.7% profile pass "
    f"(event_id % {_ADAPTIVE_SAMPLE_MOD} = 0) estimates the key-skew "
    "factor max/(N/K); at skew >= "
    f"{_ADAPTIVE_SKEW_MILLI / 1000:.0f}x the per-user aggregation runs "
    "as q38's two-stage salted shape (hot key spread over "
    f"{_ADAPTIVE_SALT} reducers, partials merged per key), below it as "
    "the plain one-shuffle hash agg — the extra stage is pure cost on "
    "balanced keys. The decision rides the output (skew_milli, salted) "
    "so the oracle checks the BRANCH CHOICE, not just the aggregate; "
    "both branches produce identical observable results (the synthetic "
    "events corpus profiles ~2.7x, taking the salted branch; "
    "tests/test_dedup_skew.py forces both on crafted corpora). "
    "Exactness: totals are int64 cent sums (order-independent under "
    "re-association, unlike double sums — the salted tree adds in a "
    "different order); the profile statistic is one double expression "
    "on three int64s, identical operand order on both engines. Scale: "
    "the profile pass folds map-side onto the sampled KEY relation and "
    "collects ONE row; the decision is driver-side plan selection, the "
    "same place AQE's skew-join mitigation lives. Caveats: (1) the "
    f"modulo sample assumes event_id is DENSE — a corpus whose ids "
    f"avoid multiples of {_ADAPTIVE_SAMPLE_MOD} yields an empty sample, "
    "coalesce reports skew_milli=0 and the plain branch runs even on "
    "heavy skew (perf-only blind spot: the output stays oracle-"
    "consistent either way, only the plan choice degrades); (2) this "
    "spec is EAGER (eager=True): building the DataFrame runs the "
    "profile job before any action on the result.",
    tags=("agg", "skew", "salt", "adaptive", "diagnostics", "scale"),
    eager=True,
)
def q310_skew_adaptive_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    (prof,) = (
        ev.filter(
            F.pmod(F.col("event_id"), F.lit(_ADAPTIVE_SAMPLE_MOD)) == 0
        )
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .agg(
            F.expr(
                "CAST(coalesce(round(1000.0 * max(c) * count(*) / sum(c)),"
                " 0) AS BIGINT)"
            ).alias("skew_milli")
        )
        .collect()  # bounded: exactly one row (the profile statistic)
    )
    skew_milli = prof["skew_milli"]
    salted = skew_milli >= _ADAPTIVE_SKEW_MILLI
    cents = F.expr("CAST(round(100.0 * value) AS BIGINT)")
    if salted:
        agg = (
            ev.withColumn(
                "salt", F.pmod(F.col("event_id"), F.lit(_ADAPTIVE_SALT))
            )
            .groupBy("user_id", "salt")
            .agg(
                F.count(F.lit(1)).cast("long").alias("pn"),
                F.sum(cents).cast("long").alias("pv"),
            )
            .groupBy("user_id")
            .agg(
                F.sum("pn").cast("long").alias("n"),
                F.sum("pv").cast("long").alias("total_cents"),
            )
        )
    else:
        agg = ev.groupBy("user_id").agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(cents).cast("long").alias("total_cents"),
        )
    return agg.select(
        "user_id",
        "n",
        "total_cents",
        F.lit(skew_milli).cast("long").alias("skew_milli"),
        F.lit(bool(salted)).alias("salted"),
    )


# --- q311: profiler-driven adaptive join strategy -----------------------------

# Broadcast when the estimated build side is at most this many rows
# (~5 MB at 100 B/row — the classic autoBroadcastJoinThreshold bar,
# expressed in rows so the decision is exactly replayable in SQL).
_JADAPT_BC_ROWS = 50_000
_JADAPT_SKEW_MILLI = 2000  # the q310 2x salting bar, on the probe key
_JADAPT_MOD = 37  # deterministic ~2.7% profile sample (q310 rule)
_JADAPT_SALT = 8


@register(
    "q311_join_adaptive_strategy",
    oracle=f"""
    WITH prof_b AS (
      SELECT CAST(count(*) * {_JADAPT_MOD} AS BIGINT) AS est_build_rows
      FROM orders WHERE o_orderkey % {_JADAPT_MOD} = 0),
    prof_s AS (
      SELECT CAST(coalesce(round(1000.0 * max(c) * count(*) / sum(c)), 0)
                  AS BIGINT) AS skew_milli
      FROM (SELECT user_id, CAST(count(*) AS BIGINT) AS c
            FROM events
            WHERE event_id % {_JADAPT_MOD} = 0
            GROUP BY user_id)),
    d AS (
      SELECT est_build_rows, skew_milli,
             CASE WHEN est_build_rows <= {_JADAPT_BC_ROWS}
                    THEN 'broadcast'
                  WHEN skew_milli >= {_JADAPT_SKEW_MILLI}
                    THEN 'salted_shuffle'
                  ELSE 'shuffle' END AS strategy
      FROM prof_b CROSS JOIN prof_s)
    SELECT e.event_type,
           CAST(count(*) AS BIGINT) AS n_pairs,
           CAST(sum(CAST(round(100.0 * e.value) AS BIGINT)) AS BIGINT)
             AS val_cents,
           CAST(sum(CAST(round(100.0 * o.o_totalprice) AS BIGINT)) AS BIGINT)
             AS ord_cents,
           d.est_build_rows, d.skew_milli, d.strategy
    FROM events e
    JOIN orders o ON o.o_custkey = e.user_id
    CROSS JOIN d
    GROUP BY e.event_type, d.est_build_rows, d.skew_milli, d.strategy
    ORDER BY e.event_type
    """,
    doc="PROFILER-DRIVEN ADAPTIVE JOIN STRATEGY — q310's driver-side "
    "plan selection extended from aggregation to the join side (r11 "
    "verdict item 3), closing the loop the q274 skew profile and the "
    "q308 Count-Min join-size estimate opened: a cheap deterministic "
    f"~2.7% profile pass (modulo-{_JADAPT_MOD} sample on both tables, "
    "one Spark job, two 1-row aggs crossJoined and collected once) "
    "estimates (a) the build-side row count and (b) the probe-key skew "
    "factor max/(N/K), then picks the fact-fact join strategy: "
    f"build <= {_JADAPT_BC_ROWS} rows -> BROADCAST (no probe shuffle, "
    "skew irrelevant); else probe skew >= "
    f"{_JADAPT_SKEW_MILLI / 1000:.0f}x -> SALTED shuffle (probe salt = "
    f"event_id % {_JADAPT_SALT}, build replicated {_JADAPT_SALT}x via "
    "explode, equi-join on (key, salt) — every probe row meets exactly "
    "one replica, so results are join-identical); else plain "
    "sort-merge. The decision rides the output (est_build_rows, "
    "skew_milli, strategy) so the oracle checks the BRANCH CHOICE, not "
    "just the join result; all three branches produce identical "
    "observable aggregates (sf0.01 estimates the build at ~15k rows "
    "and broadcasts; tests/test_join_adaptive.py forces all three on "
    "crafted corpora). This is the reference-parity extension SURVEY "
    "§4 anticipated: the reference ships exactly one custom join "
    "strategy (the binned proximity join) chosen statically; here the "
    "strategy is chosen from measured stats, the same place AQE's "
    "runtime re-planning lives. Exactness: totals are int64 cent sums "
    "(re-association safe — the salted tree adds in a different "
    "order); both profile statistics are int64 or one double "
    "expression with identical operand order on both engines. Scale: "
    "the profile folds map-side onto the sampled relations and "
    "collects ONE row; the broadcast bar is rows, not bytes, so the "
    "same decision replays at any SF with the sample scaling "
    "linearly. Caveats (the q310 pair): (1) modulo sampling assumes "
    "dense ids — a corpus avoiding multiples of "
    f"{_JADAPT_MOD} profiles est=0/skew=0 and falls to the broadcast "
    "branch (output stays oracle-consistent; only the plan choice "
    "degrades, and an est of 0 broadcasting an actually-huge build "
    "would OOM exactly like a mis-sized autoBroadcastJoinThreshold — "
    "the documented trade of sampling-based planning); (2) this spec "
    "is EAGER (eager=True): building the DataFrame runs the profile "
    "job.",
    tags=("join", "skew", "salt", "broadcast", "adaptive", "diagnostics",
          "scale"),
    eager=True,
)
def q311_join_adaptive_strategy(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    od = t(spark, sf_dir, "orders")
    pb = od.filter(
        F.pmod(F.col("o_orderkey"), F.lit(_JADAPT_MOD)) == 0
    ).agg(
        (F.count(F.lit(1)) * _JADAPT_MOD).cast("long").alias("est_build_rows")
    )
    ps = (
        ev.filter(F.pmod(F.col("event_id"), F.lit(_JADAPT_MOD)) == 0)
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .agg(
            F.expr(
                "CAST(coalesce(round(1000.0 * max(c) * count(*) / sum(c)),"
                " 0) AS BIGINT)"
            ).alias("skew_milli")
        )
    )
    # bounded: exactly one row (the two profile statistics)
    (prof,) = pb.crossJoin(ps).collect()
    est_build = prof["est_build_rows"]
    skew_milli = prof["skew_milli"]
    build = od.select("o_custkey", "o_totalprice")
    if est_build <= _JADAPT_BC_ROWS:
        strategy = "broadcast"
        joined = ev.join(
            F.broadcast(build), ev.user_id == build.o_custkey
        )
    elif skew_milli >= _JADAPT_SKEW_MILLI:
        strategy = "salted_shuffle"
        evs = ev.withColumn(
            "salt", F.pmod(F.col("event_id"), F.lit(_JADAPT_SALT))
        )
        ods = build.withColumn(
            "bsalt",
            F.explode(
                F.array(*[F.lit(i) for i in range(_JADAPT_SALT)])
            ),
        ).hint("merge")
        joined = evs.join(
            ods,
            (evs.user_id == ods.o_custkey) & (evs.salt == ods.bsalt),
        )
    else:
        strategy = "shuffle"
        joined = ev.join(
            build.hint("merge"), ev.user_id == build.o_custkey
        )
    agg = joined.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.sum(F.expr("CAST(round(100.0 * value) AS BIGINT)"))
        .cast("long")
        .alias("val_cents"),
        F.sum(F.expr("CAST(round(100.0 * o_totalprice) AS BIGINT)"))
        .cast("long")
        .alias("ord_cents"),
    )
    return agg.select(
        "event_type",
        "n_pairs",
        "val_cents",
        "ord_cents",
        F.lit(est_build).cast("long").alias("est_build_rows"),
        F.lit(skew_milli).cast("long").alias("skew_milli"),
        F.lit(strategy).alias("strategy"),
    ).orderBy("event_type")


@register(
    "q36_map_funcs",
    oracle="""
    WITH per_type AS (
      SELECT user_id, event_type, count(*) AS c
      FROM events GROUP BY user_id, event_type)
    SELECT user_id,
           string_agg(event_type || ':' || c, ',' ORDER BY event_type)
               AS type_counts,
           count(*) AS n_types
    FROM per_type GROUP BY user_id
    """,
    doc="Map-typed aggregation (SURVEY §2.7 note: map functions absent "
    "in the reference, provided free by Spark): per-user event-type "
    "histogram built as a map via map_from_entries, then canonicalized "
    "to sorted 'k:v' text so both engines compare exactly (DuckDB's MAP "
    "ordering is not hashable cross-engine). Exercises "
    "map_from_entries / map_keys / transform / sort_array.",
    tags=("scalar", "map", "agg"),
)
def q36_map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    per_type = ev.groupBy("user_id", "event_type").agg(F.count("*").alias("c"))
    m = per_type.groupBy("user_id").agg(
        F.map_from_entries(
            F.sort_array(F.collect_list(F.struct("event_type", "c")))
        ).alias("m")
    )
    entries = F.transform(
        F.map_keys("m"),
        lambda k: F.concat(k, F.lit(":"), F.element_at("m", k).cast("string")),
    )
    return m.select(
        "user_id",
        F.array_join(entries, ",").alias("type_counts"),
        F.size("m").cast("long").alias("n_types"),
    )


@register(
    "q39_scalar_subquery",
    oracle="""
    SELECT l.l_partkey,
           round(sum(l.l_extendedprice), 2) AS small_qty_revenue,
           count(*) AS n_small
    FROM lineitem l
    WHERE l.l_quantity < (
      SELECT 0.5 * avg(l2.l_quantity) FROM lineitem l2
      WHERE l2.l_partkey = l.l_partkey)
    GROUP BY l.l_partkey
    """,
    doc="Correlated scalar subquery (TPC-H Q17 shape — below-half-average "
    "quantity per part). Catalyst decorrelates it into an aggregate + "
    "equi-join; no per-row subquery execution survives in the physical "
    "plan — the decorrelation rewrite is the point of this entry.",
    tags=("subquery", "decorrelation", "join", "agg"),
)
def q39_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    t(spark, sf_dir, "lineitem").createOrReplaceTempView("__li")
    return spark.sql(
        """
        SELECT l.l_partkey,
               round(sum(l.l_extendedprice), 2) AS small_qty_revenue,
               count(*) AS n_small
        FROM __li l
        WHERE l.l_quantity < (
          SELECT 0.5 * avg(l2.l_quantity) FROM __li l2
          WHERE l2.l_partkey = l.l_partkey)
        GROUP BY l.l_partkey
        """
    )


@register(
    "q57_exists_subquery",
    oracle="""
    SELECT o.o_orderpriority, count(*) AS n_orders
    FROM orders o
    WHERE EXISTS (
      SELECT 1 FROM lineitem l
      WHERE l.l_orderkey = o.o_orderkey AND l.l_discount > 0.08)
    GROUP BY o.o_orderpriority
    """,
    doc="Correlated EXISTS subquery (TPC-H Q4 shape — orders with at "
    "least one deeply-discounted line). Catalyst rewrites to a left "
    "semi join; equivalent to q03's explicit semi-join, here arriving "
    "via subquery decorrelation instead.",
    tags=("subquery", "semi", "decorrelation"),
)
def q57_exists_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    t(spark, sf_dir, "orders").createOrReplaceTempView("__ord")
    t(spark, sf_dir, "lineitem").createOrReplaceTempView("__li2")
    return spark.sql(
        """
        SELECT o.o_orderpriority, count(*) AS n_orders
        FROM __ord o
        WHERE EXISTS (
          SELECT 1 FROM __li2 l
          WHERE l.l_orderkey = o.o_orderkey AND l.l_discount > 0.08)
        GROUP BY o.o_orderpriority
        """
    )


@register(
    "q66_conditional_aggs",
    oracle="""
    SELECT l_linestatus,
           count(*) FILTER (l_discount > 0.05)            AS n_discounted,
           count(DISTINCT l_suppkey)                      AS n_suppliers,
           bool_and(l_quantity > 0)                       AS all_positive,
           bool_or(l_quantity > 45)                       AS any_large,
           min(CASE WHEN l_tax > 0 THEN l_tax END)        AS min_nonzero_tax
    FROM lineitem GROUP BY l_linestatus
    """,
    doc="Conditional/boolean aggregation family (count FILTER, distinct "
    "count, every/any, conditional min) — the reference's sanity "
    "counters (SURVEY §2.4 A5) generalized to the full Spark agg "
    "surface.",
    tags=("agg", "conditional", "A5"),
)
def q66_conditional_aggs(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    return li.groupBy("l_linestatus").agg(
        F.count(F.when(F.col("l_discount") > 0.05, 1)).alias("n_discounted"),
        F.countDistinct("l_suppkey").alias("n_suppliers"),
        F.every(F.col("l_quantity") > 0).alias("all_positive"),
        F.some(F.col("l_quantity") > 45).alias("any_large"),
        F.min(F.when(F.col("l_tax") > 0, F.col("l_tax"))).alias(
            "min_nonzero_tax"
        ),
    )


@register(
    "q67_array_set_funcs",
    oracle="""
    WITH per_cust AS (
      SELECT o_custkey,
             coalesce(list_sort(list(DISTINCT o_orderpriority)
                       FILTER (o_orderstatus = 'O')), []) AS open_prios,
             coalesce(list_sort(list(DISTINCT o_orderpriority)
                       FILTER (o_orderstatus = 'F')), []) AS done_prios
      FROM orders GROUP BY o_custkey)
    SELECT o_custkey,
           coalesce(array_to_string(open_prios, ','), '') AS open_prios,
           coalesce(array_to_string(done_prios, ','), '') AS done_prios,
           coalesce(array_to_string(
               list_sort(list_intersect(open_prios, done_prios)), ','), '')
               AS both_prios,
           len(list_distinct(list_concat(open_prios, done_prios))) AS n_all
    FROM per_cust
    """,
    doc="Array set algebra (SURVEY §2.6 U3/U4 primitives as array "
    "functions: array_intersect / array_union / array_distinct / "
    "array_sort over per-key collected sets). Array outputs are "
    "serialized to ','-joined strings on both sides: the driver's "
    "canonicalizer sorts rows in pandas, and ndarray cells are "
    "unhashable there (CORRECTNESS_r01 q67 err).",
    tags=("array", "setop", "U3", "U4"),
)
def q67_array_set_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders")
    per = o.groupBy("o_custkey").agg(
        F.sort_array(
            F.array_distinct(
                F.collect_list(
                    F.when(F.col("o_orderstatus") == "O", F.col("o_orderpriority"))
                )
            )
        ).alias("open_prios"),
        F.sort_array(
            F.array_distinct(
                F.collect_list(
                    F.when(F.col("o_orderstatus") == "F", F.col("o_orderpriority"))
                )
            )
        ).alias("done_prios"),
    )
    return per.select(
        "o_custkey",
        F.array_join("open_prios", ",").alias("open_prios"),
        F.array_join("done_prios", ",").alias("done_prios"),
        F.array_join(
            F.sort_array(F.array_intersect("open_prios", "done_prios")), ","
        ).alias("both_prios"),
        F.size(F.array_distinct(F.concat("open_prios", "done_prios")))
        .cast("long")
        .alias("n_all"),
    )


@register(
    "q68_stats_aggs",
    oracle="""
    SELECT l_returnflag,
           round(stddev_samp(l_quantity), 4)  AS sd_qty,
           round(var_samp(l_quantity), 4)     AS var_qty,
           round(corr(l_quantity, l_extendedprice), 4) AS corr_qty_price,
           round(covar_samp(l_quantity, l_discount), 4) AS cov_qty_disc,
           round(skewness(l_quantity), 4)     AS skew_qty
    FROM lineitem GROUP BY l_returnflag
    """,
    doc="Statistical aggregate family (stddev/variance/correlation/"
    "covariance/skewness) — the snapshot-analysis statistics surface; "
    "all partial+final mergeable (one shuffle). Rounded to 4dp: the "
    "two engines use different numerically-stable merge formulas, "
    "identical to ~1e-9 relative.",
    tags=("agg", "stats"),
)
def q68_stats_aggs(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.stddev_samp("l_quantity"), 4).alias("sd_qty"),
        F.round(F.var_samp("l_quantity"), 4).alias("var_qty"),
        F.round(F.corr("l_quantity", "l_extendedprice"), 4).alias(
            "corr_qty_price"
        ),
        F.round(F.covar_samp("l_quantity", "l_discount"), 4).alias(
            "cov_qty_disc"
        ),
        F.round(F.skewness("l_quantity"), 4).alias("skew_qty"),
    )


@register(
    "q74_sketch_aggs",
    oracle="""
    SELECT o_orderpriority,
           count(DISTINCT o_custkey) AS exact_distinct,
           abs(approx_count_distinct(o_custkey)
               - count(DISTINCT o_custkey))
             <= 0.15 * count(DISTINCT o_custkey) AS hll_within_15pct,
           abs(approx_quantile(o_totalprice, 0.5)
               - quantile_cont(o_totalprice, 0.5))
             <= 0.05 * quantile_cont(o_totalprice, 0.5) AS p50_within_5pct
    FROM orders GROUP BY o_orderpriority
    """,
    doc="Sketch aggregate family (SURVEY §2.4 A9 'distinct-count "
    "variants'): HyperLogLog++ approximate distinct and quantile-sketch "
    "approximate median, each validated against its exact counterpart "
    "inside the query. The sketches differ bit-wise across engines "
    "(Spark HLL++/Greenwald-Khanna vs DuckDB HLL/t-digest), so the "
    "cross-engine contract is the within-tolerance BOOLEAN plus the "
    "exact count — at 100 TB the sketch is the only affordable path "
    "(mergeable partials, fixed memory; exact distinct is a full "
    "shuffle of the key space).",
    tags=("agg", "sketch", "approx", "scale"),
)
def q74_sketch_aggs(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders")
    agg = o.groupBy("o_orderpriority").agg(
        F.countDistinct("o_custkey").alias("exact_distinct"),
        F.approx_count_distinct("o_custkey", rsd=0.05).alias("ad"),
        F.expr("percentile_approx(o_totalprice, 0.5, 10000)").alias("p50a"),
        F.expr("percentile(o_totalprice, 0.5)").alias("p50e"),
    )
    return agg.select(
        "o_orderpriority",
        "exact_distinct",
        (
            F.abs(F.col("ad") - F.col("exact_distinct"))
            <= 0.15 * F.col("exact_distinct")
        ).alias("hll_within_15pct"),
        (F.abs(F.col("p50a") - F.col("p50e")) <= 0.05 * F.col("p50e")).alias(
            "p50_within_5pct"
        ),
    )


@register(
    "q77_consistency_checks",
    oracle="""
    SELECT 'lineitem_order_fk' AS check_name,
           (SELECT count(*) FROM lineitem l
            WHERE NOT EXISTS (SELECT 1 FROM orders o
                              WHERE o.o_orderkey = l.l_orderkey))
             AS violations
    UNION ALL
    SELECT 'orders_customer_fk',
           (SELECT count(*) FROM orders o
            WHERE NOT EXISTS (SELECT 1 FROM customer c
                              WHERE c.c_custkey = o.o_custkey))
    UNION ALL
    SELECT 'events_user_domain',
           (SELECT count(*) FROM events e
            WHERE NOT EXISTS (SELECT 1 FROM customer c
                              WHERE c.c_custkey = e.user_id))
    UNION ALL
    SELECT 'lineitem_positive_measures',
           (SELECT count(*) FROM lineitem
            WHERE l_quantity <= 0 OR l_extendedprice < 0)
    UNION ALL
    SELECT 'documents_char_count',
           (SELECT count(*) FROM documents WHERE n_chars <> length(text))
    """,
    doc="Startup consistency pass (SURVEY §3 E3: the solver's 'Make "
    "Consistency Begin/End' validation, DLSM Log.txt:1-4 — bond "
    "endpoints must reference real particles, materials must resolve, "
    "counts must match headers). Re-expressed as a declarative "
    "data-quality suite: FK orphan checks via broadcast anti-joins, "
    "domain checks, and derived-column consistency — each check one "
    "row (name, violation count). At 100 TB each anti-join "
    "broadcasts the key side or degenerates to a shuffled semi-join; "
    "all five checks share table scans via a single job.",
    tags=("validation", "E3", "anti-join"),
)
def q77_consistency_checks(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    ev = t(spark, sf_dir, "events")
    d = t(spark, sf_dir, "documents")

    def one(name: str, df: DataFrame) -> DataFrame:
        return df.agg(
            F.lit(name).alias("check_name"),
            F.count("*").cast("long").alias("violations"),
        )

    checks = [
        one(
            "lineitem_order_fk",
            li.join(o, li["l_orderkey"] == o["o_orderkey"], "left_anti"),
        ),
        one(
            "orders_customer_fk",
            o.join(c, o["o_custkey"] == c["c_custkey"], "left_anti"),
        ),
        one(
            "events_user_domain",
            ev.join(c, ev["user_id"] == c["c_custkey"], "left_anti"),
        ),
        one(
            "lineitem_positive_measures",
            li.filter((F.col("l_quantity") <= 0) | (F.col("l_extendedprice") < 0)),
        ),
        one(
            "documents_char_count",
            d.filter(F.col("n_chars") != F.length("text")),
        ),
    ]
    out = checks[0]
    for df in checks[1:]:
        out = out.unionByName(df)
    return out


@register(
    "q79_unpivot",
    oracle="""
    SELECT o_orderpriority, measure, round(val, 2) AS val
    FROM (
      SELECT o_orderpriority,
             round(sum(o_totalprice), 2) AS total_price,
             round(avg(o_totalprice), 2) AS avg_price,
             CAST(count(*) AS DOUBLE) AS n_orders
      FROM orders GROUP BY o_orderpriority) w
    UNPIVOT (val FOR measure IN (total_price, avg_price, n_orders))
    """,
    doc="Unpivot / melt (wide → long, the inverse of q13's pivot): the "
    "per-priority measure block becomes (measure, value) rows via "
    "Spark's native unpivot (SQL UNPIVOT in the oracle). Wide-to-long "
    "is the standard shape for feeding metric tables to downstream "
    "consumers; executes as a generate (expand) projection — no "
    "shuffle beyond the feeding aggregate.",
    tags=("reshape", "unpivot"),
)
def q79_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders")
    wide = o.groupBy("o_orderpriority").agg(
        F.round(F.sum("o_totalprice"), 2).alias("total_price"),
        F.round(F.avg("o_totalprice"), 2).alias("avg_price"),
        F.count("*").cast("double").alias("n_orders"),
    )
    return wide.unpivot(
        ids=["o_orderpriority"],
        values=["total_price", "avg_price", "n_orders"],
        variableColumnName="measure",
        valueColumnName="raw_val",
    ).select("o_orderpriority", "measure", F.round("raw_val", 2).alias("val"))


@register(
    "q88_grouped_agg_udaf",
    oracle="""
    SELECT l_returnflag,
           round(sqrt(avg(l_quantity * l_quantity)), 6) AS rms_qty,
           round(sum(l_quantity * (1 - l_discount))
                 / sum(1 - l_discount), 6) AS wmean_qty
    FROM lineitem GROUP BY l_returnflag
    """,
    doc="GROUPED_AGG pandas UDAF (SURVEY §2.9: the UDM.dll constitutive-"
    "model extension point as a user-defined aggregate): RMS and "
    "discount-weighted mean of quantity per return flag, computed in "
    "NumPy over Arrow-delivered group vectors. Unlike built-in "
    "aggregates a GROUPED_AGG UDF has no partial/merge path — the "
    "whole group ships to one worker — so at 100 TB it is reserved "
    "for aggregates inexpressible as built-ins (the built-in form is "
    "the oracle; rounding absorbs summation-order differences).",
    tags=("agg", "udaf", "pandas-udf"),
)
def q88_grouped_agg_udaf(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np

    from pyspark.sql.functions import PandasUDFType, pandas_udf

    # explicit functionType: the module-wide `from __future__ import
    # annotations` stringifies type hints, so hint inference can't see
    # the Series -> scalar (GROUPED_AGG) shape
    @pandas_udf("double", PandasUDFType.GROUPED_AGG)
    def rms(v):
        a = v.to_numpy(dtype=np.float64)
        return float(np.sqrt(np.mean(a * a)))

    @pandas_udf("double", PandasUDFType.GROUPED_AGG)
    def wmean(v, w):
        a = v.to_numpy(dtype=np.float64)
        b = w.to_numpy(dtype=np.float64)
        return float(np.sum(a * b) / np.sum(b))

    li = t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(rms(F.col("l_quantity")), 6).alias("rms_qty"),
        F.round(
            wmean(F.col("l_quantity"), 1 - F.col("l_discount")), 6
        ).alias("wmean_qty"),
    )


@register(
    "q102_full_outer_recon",
    oracle="""
    WITH ev AS (
      SELECT user_id, count(*) AS n_events,
             round(sum(value), 2) AS events_value
      FROM events GROUP BY user_id),
    od AS (
      SELECT o_custkey, count(*) AS n_orders
      FROM orders GROUP BY o_custkey)
    SELECT coalesce(ev.user_id, od.o_custkey) AS cust_id,
           CAST(coalesce(ev.n_events, 0) AS BIGINT) AS n_events,
           coalesce(ev.events_value, 0.0) AS events_value,
           CAST(coalesce(od.n_orders, 0) AS BIGINT) AS n_orders,
           CASE WHEN ev.user_id IS NULL THEN 'orders_only'
                WHEN od.o_custkey IS NULL THEN 'events_only'
                ELSE 'both' END AS presence
    FROM ev FULL OUTER JOIN od ON ev.user_id = od.o_custkey
    """,
    doc="Full-outer reconciliation of two per-key aggregate streams "
    "(event activity vs order activity) — the audit/backfill join "
    "shape: keys present on either side survive, absent-side metrics "
    "coalesce to zero, and a presence flag classifies the mismatch. "
    "Both inputs are pre-aggregated (one row per key) before the full "
    "outer join, so the shuffle carries aggregate rows, not raw "
    "events — at 100 TB the join input is bounded by key cardinality "
    "and AQE picks sort-merge vs shuffled-hash per side.",
    tags=("join", "full_outer", "recon"),
)
def q102_full_outer_recon(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = (
        t(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("events_value"),
        )
    )
    od = (
        t(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.count("*").alias("n_orders"))
    )
    j = ev.join(od, ev["user_id"] == od["o_custkey"], "full_outer")
    return j.select(
        F.coalesce("user_id", "o_custkey").alias("cust_id"),
        F.coalesce("n_events", F.lit(0)).cast("long").alias("n_events"),
        F.coalesce("events_value", F.lit(0.0)).alias("events_value"),
        F.coalesce("n_orders", F.lit(0)).cast("long").alias("n_orders"),
        F.when(F.col("user_id").isNull(), "orders_only")
        .when(F.col("o_custkey").isNull(), "events_only")
        .otherwise("both")
        .alias("presence"),
    )


@register(
    "q152_status_pivot",
    oracle="""
    SELECT o_orderpriority,
           CAST(count(*) FILTER (o_orderstatus = 'F') AS BIGINT) AS f_n,
           CAST(coalesce(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                FILTER (o_orderstatus = 'F'), 0) AS BIGINT) AS f_cents,
           CAST(count(*) FILTER (o_orderstatus = 'O') AS BIGINT) AS o_n,
           CAST(coalesce(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                FILTER (o_orderstatus = 'O'), 0) AS BIGINT) AS o_cents,
           CAST(count(*) FILTER (o_orderstatus = 'P') AS BIGINT) AS p_n,
           CAST(coalesce(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                FILTER (o_orderstatus = 'P'), 0) AS BIGINT) AS p_cents
    FROM orders GROUP BY 1
    """,
    doc="Pivot (long→wide reshape, the inverse of q79's unpivot): "
    "order count and integer-cents revenue per priority × status "
    "cell, statuses spread into columns. The Spark side uses "
    "DataFrame.pivot WITH THE VALUE LIST PINNED — the load-bearing "
    "scale detail: an unpinned pivot first runs a distinct-values "
    "job over 100 TB and then builds a schema the planner can't "
    "predict, while a pinned pivot compiles directly to the same "
    "single-shuffle conditional aggregation the oracle spells out "
    "(one hash agg, map-side combined, 3×2 when-branches per row). "
    "Money stays in round(×100) int64 cents end to end, so the "
    "pivoted sums are exact on both engines.",
    tags=("relational", "pivot", "agg", "reshape", "scale"),
)
def q152_status_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders").select(
        "o_orderpriority",
        "o_orderstatus",
        F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("pc"),
    )
    wide = (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.count(F.lit(1)).alias("n"), F.sum("pc").alias("cents"))
    )
    return wide.select(
        "o_orderpriority",
        F.coalesce("F_n", F.lit(0)).cast("long").alias("f_n"),
        F.coalesce("F_cents", F.lit(0)).cast("long").alias("f_cents"),
        F.coalesce("O_n", F.lit(0)).cast("long").alias("o_n"),
        F.coalesce("O_cents", F.lit(0)).cast("long").alias("o_cents"),
        F.coalesce("P_n", F.lit(0)).cast("long").alias("p_n"),
        F.coalesce("P_cents", F.lit(0)).cast("long").alias("p_cents"),
    )


@register(
    "q177_ordered_export",
    oracle="""
    SELECT c_nationkey,
           CAST(count(*) AS BIGINT) AS n,
           string_agg(CAST(c_custkey AS VARCHAR), ',' ORDER BY c_custkey)
             AS keys_csv
    FROM customer
    GROUP BY c_nationkey
    """,
    doc="Deterministic ordered string aggregation (the export/report "
    "shape behind S7/S8's fixed-format sinks: a keyed CSV line per "
    "group, element order pinned): DuckDB's ORDER BY inside "
    "string_agg vs Spark's collect_list → sort_array → cast → "
    "concat_ws — byte-identical because the element order is fully "
    "specified, the classic trap being unordered collect_list "
    "(partition-order-dependent, non-deterministic across runs). "
    "Scale note: per-group line width grows with group size — this "
    "is the one aggregate whose OUTPUT row can become the memory "
    "unit; for 100 TB exports, pre-split groups (q25's "
    "every-N-rows grouping) before the string agg.",
    tags=("relational", "string-agg", "export", "S7"),
)
def q177_ordered_export(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = t(spark, sf_dir, "customer")
    return c.groupBy("c_nationkey").agg(
        F.count("*").cast("long").alias("n"),
        F.concat_ws(
            ",",
            F.expr(
                "transform(sort_array(collect_list(c_custkey)), "
                "x -> cast(x AS string))"
            ),
        ).alias("keys_csv"),
    )


# --- q329: profiler-driven adaptive join ORDERING ------------------------------
#
# The fifth leg of the adaptive-planning family — q310 picked the agg
# strategy, q311 the join ALGORITHM, q317 the LSH banding, q321 the bin
# count; this picks the join ORDER for a 3-table star from exact
# profile counts (the optimizer's join-reordering move, made explicit
# and oracle-checkable).

_JORD_STATUS = "F"
_JORD_QTY = 45.0


def _q329_result(spark: SparkSession, sf_dir: str, customer_first: bool):
    """The 3-table join in either order; inner joins commute, so the
    RESULT is order-independent — only the intermediate sizes differ."""
    o = t(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == _JORD_STATUS
    )
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > _JORD_QTY)
    c = t(spark, sf_dir, "customer")
    if customer_first:
        j = o.join(c, o["o_custkey"] == c["c_custkey"]).join(
            li, F.col("o_orderkey") == li["l_orderkey"]
        )
    else:
        j = o.join(li, F.col("o_orderkey") == li["l_orderkey"]).join(
            c, F.col("o_custkey") == c["c_custkey"]
        )
    return j.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).cast("long").alias("n_items"),
        F.expr(
            "CAST(round(100.0 * sum(l_extendedprice * (1 - l_discount)))"
            " AS BIGINT)"
        ).alias("revenue_cents"),
    )


@register(
    "q329_join_order_adaptive",
    oracle=f"""
    WITH st AS (
      SELECT
        (SELECT count(*) FROM orders
          WHERE o_orderstatus = '{_JORD_STATUS}') AS n_of,
        (SELECT count(*) FROM orders) AS n_o,
        (SELECT count(*) FROM lineitem
          WHERE l_quantity > {_JORD_QTY}) AS n_lf),
    dec AS (
      SELECT CAST(n_of AS BIGINT) AS est_oc_rows,
             CAST(round(1000.0 * n_lf * n_of / n_o) AS BIGINT)
               AS est_ol_milli
      FROM st),
    res AS (
      SELECT c.c_mktsegment,
             CAST(count(*) AS BIGINT) AS n_items,
             CAST(round(100.0 * sum(l.l_extendedprice
               * (1 - l.l_discount))) AS BIGINT) AS revenue_cents
      FROM orders o
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN lineitem l ON o.o_orderkey = l.l_orderkey
      WHERE o.o_orderstatus = '{_JORD_STATUS}'
        AND l.l_quantity > {_JORD_QTY}
      GROUP BY 1)
    SELECT r.c_mktsegment, r.n_items, r.revenue_cents,
           d.est_oc_rows, d.est_ol_milli,
           CASE WHEN 1000 * d.est_oc_rows <= d.est_ol_milli
                THEN 'customer_first' ELSE 'lineitem_first' END
             AS join_order
    FROM res r CROSS JOIN dec d
    ORDER BY r.c_mktsegment
    """,
    doc="PROFILER-DRIVEN ADAPTIVE JOIN ORDERING — the fifth leg of the "
    "adaptive-planning family (q310 agg strategy, q311 join "
    "algorithm, q317 LSH banding, q321 bin count): a 3-table star "
    "(filtered orders x customer x filtered lineitem) is joined in "
    "the order that minimizes the FIRST intermediate, chosen from "
    "exact profile counts — |O'xC| = |O'| (key-FK join preserves "
    "cardinality) vs |O'xL'| ~ |L'| * |O'|/|O| (uniform-key "
    "estimate, milli-quantized so the comparison is exact int64 on "
    "both engines). Inner joins commute, so the RESULT is "
    "order-invariant — what the decision changes is the plan, and "
    "the decision columns (both estimates + the chosen order) ride "
    "the output so the oracle checks the optimizer's CHOICE "
    "against the same arithmetic. The spec is EAGER (eager=True): "
    "building the DataFrame runs the one-row stats job, q310/q311 "
    "convention. Scale: the profile is three count aggs (map-side "
    "folds); the chosen plan is the normal shuffled star join that "
    "AQE further refines at runtime — this query is the explicit, "
    "testable version of the reordering a cost-based optimizer "
    "does implicitly.",
    tags=("relational", "join", "adaptive", "scale"),
    eager=True,
)
def q329_join_order_adaptive(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders")
    li = t(spark, sf_dir, "lineitem")
    stats = (
        o.agg(
            F.count(F.lit(1)).cast("long").alias("n_o"),
            F.sum(
                F.when(F.col("o_orderstatus") == _JORD_STATUS, 1).otherwise(0)
            )
            .cast("long")
            .alias("n_of"),
        )
        .crossJoin(
            li.agg(
                F.sum(F.when(F.col("l_quantity") > _JORD_QTY, 1).otherwise(0))
                .cast("long")
                .alias("n_lf")
            )
        )
        # The milli-quantized estimate is evaluated ENGINE-SIDE with the
        # same expression text the oracle uses: Spark's round() on
        # DOUBLE is HALF_UP, matching DuckDB, whereas Python's round()
        # is banker's (half-to-even) and can differ by 1 on an exact .5
        # quotient — enough to flip the join_order decision.
        .withColumn(
            "est_ol_milli",
            F.expr("CAST(round(1000.0 * n_lf * n_of / n_o) AS BIGINT)"),
        )
        .collect()[0]
    )
    est_oc_rows = int(stats["n_of"])
    est_ol_milli = int(stats["est_ol_milli"])
    customer_first = 1000 * est_oc_rows <= est_ol_milli
    res = _q329_result(spark, sf_dir, customer_first)
    return res.select(
        "c_mktsegment",
        "n_items",
        "revenue_cents",
        F.lit(est_oc_rows).cast("long").alias("est_oc_rows"),
        F.lit(est_ol_milli).cast("long").alias("est_ol_milli"),
        F.lit(
            "customer_first" if customer_first else "lineitem_first"
        ).alias("join_order"),
    ).orderBy("c_mktsegment")
