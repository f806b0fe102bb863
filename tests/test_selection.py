"""Exact-semantics tests for the W4 greedy disjoint selection
(GenerateColumnar.py:253-263 behavior: ordered scan, accept unless key
overlap, stop at quota)."""

from __future__ import annotations

from columnarmodeling_spark.operators.selection import greedy_disjoint_select


def _df(spark, rows):
    return spark.createDataFrame(
        rows, "id LONG, ord STRING, ks ARRAY<STRING>"
    )


def test_greedy_respects_order_and_disjointness(spark):
    df = _df(
        spark,
        [
            (1, "a", ["n1", "n2"]),
            (2, "b", ["n2", "n3"]),  # overlaps 1 → skipped
            (3, "c", ["n4"]),
            (4, "d", ["n5"]),
        ],
    )
    sel = greedy_disjoint_select(df, "ord", "id", "ks", quota=10)
    assert sel == [1, 3, 4]


def test_greedy_quota_break(spark):
    df = _df(spark, [(i, chr(97 + i), [f"n{i}"]) for i in range(6)])
    sel = greedy_disjoint_select(df, "ord", "id", "ks", quota=3)
    assert sel == [0, 1, 2]  # early break at quota (reference :258)


def test_greedy_empty_pool(spark):
    df = _df(spark, [])
    assert greedy_disjoint_select(df, "ord", "id", "ks", quota=3) == []
