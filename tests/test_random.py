"""Seeded-randomness determinism (SURVEY §2.7 random functions; §5
determinism strategy: same seed + same partitioning => identical
output — the engine's replacement for NumPy seed parity, SURVEY §4
'deterministic seeded randomness')."""

from __future__ import annotations

from pyspark.sql import functions as F


def _sample(spark, seed: int, partitions: int):
    return (
        spark.range(0, 1000, 1, partitions)
        .select(
            "id",
            F.rand(seed).alias("u"),
            F.randn(seed + 1).alias("g"),
            # weighted categorical via inverse-CDF when-chain
            # (GenerateColumnar.py:181-184 shape: 60/30/10 mixture)
            F.when(F.rand(seed + 2) < 0.6, F.lit("a"))
            .when(F.rand(seed + 2) < 0.9, F.lit("b"))
            .otherwise(F.lit("c"))
            .alias("cat"),
        )
        .collect()
    )


def test_same_seed_same_partitioning_identical(spark):
    assert _sample(spark, 42, 8) == _sample(spark, 42, 8)


def test_different_seed_differs(spark):
    a = {r["u"] for r in _sample(spark, 42, 8)}
    b = {r["u"] for r in _sample(spark, 43, 8)}
    assert a != b


def test_weighted_categorical_proportions(spark):
    rows = _sample(spark, 7, 8)
    n = len(rows)
    share_a = sum(1 for r in rows if r["cat"] == "a") / n
    share_b = sum(1 for r in rows if r["cat"] == "b") / n
    assert abs(share_a - 0.6) < 0.08
    assert abs(share_b - 0.3) < 0.08


def test_shuffle_via_rand_order_deterministic(spark):
    """orderBy(rand(seed)) — the reference's random.shuffle analog
    (GenerateColumnar.py:256,293) — is reproducible given the seed."""
    df = spark.range(0, 200, 1, 4)
    a = [r["id"] for r in df.orderBy(F.rand(11), "id").collect()]
    b = [r["id"] for r in df.orderBy(F.rand(11), "id").collect()]
    assert a == b and a != sorted(a)
