"""Unit tests for the custom operators beyond their oracle queries:
as-of join edge cases, 3-D proximity, bucketed co-located joins
(SURVEY §4 'bucketing for co-located joins' scale claim)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from columnarmodeling_spark.operators.asof import asof_join
from columnarmodeling_spark.operators.proximity import grid_proximity_join


def _asof(spark, left_rows, right_rows):
    left = spark.createDataFrame(left_rows, "k long, lts long, lval string")
    right = spark.createDataFrame(right_rows, "k long, rts long, rid long")
    return asof_join(
        left,
        right,
        key="k",
        left_ts="lts",
        right_ts="rts",
        left_val_cols=("lval",),
        right_id_cols=("rid",),
        tie_break="lval",
    ).collect()


def test_asof_basic_and_no_prior(spark):
    out = _asof(
        spark,
        [(1, 10, "a"), (1, 20, "b"), (2, 99, "z")],
        [(1, 15, 100), (1, 25, 101), (1, 5, 102), (2, 98, 103)],
    )
    got = {(r["rid"], r["asof_ts"], r["lval"]) for r in out}
    # rid=102 (ts 5): no prior left row -> dropped (inner semantics)
    # rid=103 (k=2, ts 98): curve point is at 99 -> dropped
    assert got == {(100, 10, "a"), (101, 20, "b")}


def test_asof_equal_ts_inclusive_and_tie_break(spark):
    out = _asof(
        spark,
        [(1, 10, "a"), (1, 10, "b")],  # tie on ts -> largest tie_break wins
        [(1, 10, 100)],
    )
    assert [(r["rid"], r["asof_ts"], r["lval"]) for r in out] == [(100, 10, "b")]


def test_grid_join_3d(spark):
    """The reference search box is 3-D (Lx Ly Lz, SysFile.ini:45-55)."""
    rows = [
        (1, 0.0, 0.0, 0.0),
        (2, 1.0, 1.0, 1.0),   # dist sqrt(3) ~ 1.732
        (3, 10.0, 10.0, 10.0),
    ]
    df = spark.createDataFrame(rows, "id long, x double, y double, z double")
    got = {
        (r["src"], r["dst"], round(r["dist"], 3))
        for r in grid_proximity_join(df, eps=2.0, coords=("x", "y", "z")).collect()
    }
    assert got == {(1, 2, 1.732)}


def test_bucketed_join_no_shuffle(spark, tmp_path):
    """Co-located join: both sides bucketed by the key -> SortMergeJoin
    with NO Exchange on either side (the 100 TB repeated-join pattern;
    SURVEY §4). Guard: the same join on plain parquet DOES shuffle."""
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        spark.sql("DROP TABLE IF EXISTS bt_a")
        spark.sql("DROP TABLE IF EXISTS bt_b")
        wh = str(tmp_path)
        a = spark.range(0, 10000).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("va")
        )
        b = spark.range(0, 10000).select(
            F.col("id").alias("k"), (F.col("id") * 3).alias("vb")
        )
        for name, df in (("bt_a", a), ("bt_b", b)):
            (
                df.write.bucketBy(8, "k")
                .sortBy("k")
                .option("path", f"{wh}/{name}")
                .saveAsTable(name)
            )
        joined = spark.table("bt_a").join(spark.table("bt_b"), "k")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan
        assert joined.count() == 10000

        plain = a.join(b, "k")
        plain_plan = plain._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" in plain_plan
    finally:
        spark.sql("DROP TABLE IF EXISTS bt_a")
        spark.sql("DROP TABLE IF EXISTS bt_b")
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.adaptive.enabled", "true")


def test_connected_components_chain(spark):
    """Multi-round propagation: a 10-node chain (diameter 9) plus an
    isolated node must all collapse to the chain's min id."""
    from columnarmodeling_spark.operators.graph import connected_components

    nodes = spark.createDataFrame([(i,) for i in range(11)], "id long")
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(9)], "src long, dst long"
    )
    got = {
        (r["id"], r["component"])
        for r in connected_components(nodes, edges).collect()
    }
    assert got == {(i, 0) for i in range(10)} | {(10, 10)}


def test_star_components_long_chain(spark):
    """Adversarial-diameter case: a 200-node path graph needs ~200
    propagation rounds but only O(log² n) large-star/small-star rounds
    — the 100 TB escape the propagation docstring points to."""
    from columnarmodeling_spark.operators.graph import (
        connected_components_star,
    )

    n = 200
    nodes = spark.createDataFrame([(i,) for i in range(n + 1)], "id long")
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "src long, dst long"
    )
    got = {
        (r["id"], r["component"])
        for r in connected_components_star(nodes, edges).collect()
    }
    assert got == {(i, 0) for i in range(n)} | {(n, n)}


def test_star_components_matches_propagation(spark):
    """Both algorithms must label identically on a random multi-component
    graph (same canonical-min contract)."""
    import random

    from columnarmodeling_spark.operators.graph import (
        connected_components,
        connected_components_star,
    )

    rng = random.Random(42)
    n = 120
    edges_py = [
        (rng.randrange(n), rng.randrange(n)) for _ in range(90)
    ]
    nodes = spark.createDataFrame([(i,) for i in range(n)], "id long")
    edges = spark.createDataFrame(edges_py, "src long, dst long").filter(
        "src != dst"
    )
    a = sorted(
        (r["id"], r["component"])
        for r in connected_components(nodes, edges).collect()
    )
    b = sorted(
        (r["id"], r["component"])
        for r in connected_components_star(nodes, edges).collect()
    )
    assert a == b


def test_subqueries_decorrelated(spark, sf_dir):
    """q39/q57 claim Catalyst decorrelates their subqueries: the
    physical plan must contain joins, not per-row subquery nodes."""
    from columnarmodeling_spark.queries import REGISTRY

    for name, needle in (
        ("q57_exists_subquery", "LeftSemi"),
        ("q39_scalar_subquery", "Join"),
    ):
        df = REGISTRY[name].fn(spark, sf_dir)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert needle in plan, f"{name}: expected {needle} in plan"
        assert "Subquery" not in plan, f"{name}: subquery not decorrelated"


def test_aqe_splits_skewed_join(spark):
    """SURVEY §4 skew claim: the hot-cell key skew of the proximity join
    is handled by AQE skew-join splitting — prove AQE actually splits a
    skewed sort-merge join on this session config."""
    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "256KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "64KB",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.forceOptimizeSkewedJoin": "true",
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        left = spark.range(0, 160_000).select(
            F.when(F.col("id") < 150_000, 0).otherwise(F.col("id")).alias("k"),
            F.concat(F.lit("x" * 64), F.col("id").cast("string")).alias("pad"),
        )
        right = spark.range(0, 500).select(
            F.col("id").alias("k"), F.lit("r").alias("tag")
        )
        joined = left.join(right, "k")
        # execute THIS DataFrame so its adaptive plan finalizes (count()
        # would spawn a separate query execution and leave this one unplanned)
        assert len(joined.collect()) == 150_000  # only key 0 matches
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "skew=true" in plan, plan[:2000]
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_interpolate_curves_matches_numpy(spark):
    """operators/load_curves vs np.interp (the in-kernel BC path): same
    piecewise-linear values, same endpoint clamping, exact hit on
    control points, and inner semantics for keys with no curve."""
    import numpy as np

    from columnarmodeling_spark.operators.load_curves import (
        interpolate_curves,
    )

    ct = [0.0, 1.0, 3.0, 7.0]
    cv = [2.0, -4.0, 5.0, 5.5]
    curves = spark.createDataFrame(
        [("a", t, v) for t, v in zip(ct, cv)],
        "curve_id string, t double, v double",
    )
    probe_ts = [-2.0, 0.0, 0.5, 1.0, 2.9, 3.0, 6.999, 7.0, 11.0]
    probes = spark.createDataFrame(
        [("a", t) for t in probe_ts] + [("orphan", 1.0)],
        "curve_id string, t double",
    )
    got = {
        (r["curve_id"], r["t"]): r["value"]
        for r in interpolate_curves(curves, probes).collect()
    }
    assert set(k for k, _ in got) == {"a"}  # orphan key dropped (inner)
    for t in probe_ts:
        expect = round(float(np.interp(t, ct, cv)), 6)
        assert got[("a", t)] == pytest.approx(expect, abs=1e-9), t


def test_with_group_rank_matches_window(spark):
    """with_group_rank == row_number() OVER (PARTITION BY g ORDER BY ...)
    on data small enough for the naive window to be trusted."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from columnarmodeling_spark.operators.indexing import with_group_rank

    df = spark.range(500).select(
        (F.col("id") % 7).alias("g"),
        ((F.col("id") * 37) % 101).alias("v"),
        F.col("id"),
    )
    got = with_group_rank(df, ["g"], ["v", "id"], rank_col="grk",
                          count_col="gn")
    w = W.partitionBy("g").orderBy("v", "id")
    want = df.withColumn("grk", F.row_number().over(w)).withColumn(
        "gn", F.count("*").over(W.partitionBy("g"))
    )
    assert (
        got.join(want, ["g", "v", "id", "grk", "gn"], "inner").count()
        == df.count()
    )


def test_mg_candidates_superset_under_forced_eviction(spark):
    """k far below the distinct count forces the batched-decrement path;
    every item with global count > N/k must survive (the MG guarantee
    q210's exact second pass relies on)."""
    import random

    from columnarmodeling_spark.operators.heavy_hitters import mg_candidates

    rng = random.Random(7)
    # zipf-ish: a few hot keys + a long tail of singletons
    items = (
        ["hot_a"] * 400 + ["hot_b"] * 250 + ["hot_c"] * 120
        + [f"tail_{i}" for i in range(2000)]
    )
    rng.shuffle(items)
    df = spark.createDataFrame(
        [(x,) for x in items], "gram string"
    ).repartition(4)
    k = 30  # distinct=2003 >> k: eviction must fire in every partition
    cand = {r.gram for r in mg_candidates(df, "gram", k).collect()}
    assert len(cand) <= 4 * k
    n = len(items)
    heavy = {"hot_a", "hot_b", "hot_c"}
    assert all(items.count(h) * k > n for h in heavy)
    assert heavy <= cand


def test_mg_candidates_no_eviction_is_exact_distinct(spark):
    from columnarmodeling_spark.operators.heavy_hitters import mg_candidates

    df = spark.createDataFrame(
        [(f"g{i % 5}",) for i in range(100)], "gram string"
    ).repartition(3)
    cand = {r.gram for r in mg_candidates(df, "gram", 1000).collect()}
    assert cand == {f"g{i}" for i in range(5)}


def test_q210_two_pass_equals_plain_groupby(spark):
    """The MG-candidate + exact-verify pipeline must emit exactly the
    plain full-groupBy heavy-hitter set (partitioning-independent)."""
    from columnarmodeling_spark.functions.text import tokens, word_shingles
    from columnarmodeling_spark.queries import REGISTRY
    from columnarmodeling_spark.queries._util import t

    sf = "/root/testdata/sf0.001"
    got = {
        (r.gram, r.cnt, r.n_total)
        for r in REGISTRY["q210_heavy_hitters"].fn(spark, sf).collect()
    }
    grams = (
        t(spark, sf, "documents")
        .select(tokens("text").alias("tk"))
        .select(F.explode(word_shingles("tk", 3)).alias("gram"))
    )
    n = grams.count()
    plain = {
        (r.gram, r.cnt, n)
        for r in grams.groupBy("gram")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        .filter(F.col("cnt") * 5000 > n)
        .collect()
    }
    assert got == plain and len(got) > 0
