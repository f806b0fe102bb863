"""Property tests for the flagship J1 binned proximity join: the
grid-hash equi-join + residual filter must produce exactly the pairs a
naive O(n^2) scan produces (SURVEY §2.3 J1, §4 'uniform-grid spatial
hashing' — /root/reference/SysFile.ini:45-55 semantics)."""

from __future__ import annotations

import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from columnarmodeling_spark.operators.proximity import grid_proximity_join

_coord = st.floats(
    min_value=-50.0, max_value=50.0, allow_nan=False, allow_infinity=False
)


def _naive_pairs(rows, eps, with_radius=False):
    out = set()
    for i, a in enumerate(rows):
        for b in rows[i + 1 :]:
            d = math.sqrt((a[1] - b[1]) ** 2 + (a[2] - b[2]) ** 2)
            gap = d - a[3] - b[3] if with_radius else d
            if gap < eps:
                lo, hi = min(a[0], b[0]), max(a[0], b[0])
                out.add((lo, hi))
    return out


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    pts=st.lists(
        st.tuples(_coord, _coord), min_size=2, max_size=40, unique=True
    ),
    eps=st.floats(min_value=0.5, max_value=20.0),
)
def test_grid_join_matches_naive(spark, pts, eps):
    rows = [(i, x, y, 0.0) for i, (x, y) in enumerate(pts)]
    df = spark.createDataFrame(
        [(i, x, y) for i, x, y, _ in rows], "id long, x double, y double"
    )
    got = {
        (r["src"], r["dst"])
        for r in grid_proximity_join(df, eps=eps, coords=("x", "y")).collect()
    }
    assert got == _naive_pairs(rows, eps)


def test_grid_join_radius_semantics(spark):
    """dGap semantics: link when surface gap (dist - r1 - r2) < eps."""
    df = spark.createDataFrame(
        [(1, 0.0, 0.0, 2.0), (2, 5.0, 0.0, 2.0), (3, 20.0, 0.0, 0.1)],
        "id long, x double, y double, r double",
    )
    got = {
        (r["src"], r["dst"])
        for r in grid_proximity_join(
            df, eps=1.5, coords=("x", "y"), radius_col="r"
        ).collect()
    }
    # gap(1,2) = 5 - 4 = 1 < 1.5 -> linked; 3 is far from both
    assert got == {(1, 2)}


def test_grid_join_hot_cell(spark):
    """Skew shape: many points in one cell must still be exact (the AQE
    skew-join mitigation changes partitioning, never the result)."""
    rows = [(i, 0.001 * i, 0.0) for i in range(60)]  # all in one cell
    df = spark.createDataFrame(rows, "id long, x double, y double")
    got = grid_proximity_join(df, eps=1.0, coords=("x", "y")).count()
    assert got == 60 * 59 // 2


def test_grid_join_salted_exactness_and_bound(spark):
    """The salt skew escape (SURVEY §4 hot-central-cell case): forcing
    every point into ONE grid cell, the salted join must (a) return
    exactly the unsalted pair set and (b) bound every (cell, salt) join
    group to ~n/salt right-side rows, so no single task sees the whole
    O(n²) cell."""
    import pyspark.sql.functions as F

    n, salt = 80, 8
    rows = [(i, 0.001 * i, 0.0005 * i) for i in range(n)]  # one cell
    df = spark.createDataFrame(rows, "id long, x double, y double")

    plain = {
        (r["src"], r["dst"])
        for r in grid_proximity_join(df, eps=1.0, coords=("x", "y")).collect()
    }
    salted = {
        (r["src"], r["dst"])
        for r in grid_proximity_join(
            df, eps=1.0, coords=("x", "y"), salt=salt
        ).collect()
    }
    assert salted == plain == {
        (a, b) for a in range(n) for b in range(a + 1, n)
    }

    # Bounded-group property: the right side shards into `salt` sub-keys
    # of ≈ n/salt rows each (deterministic hash → fixed assignment).
    shard_sizes = (
        df.select(F.pmod(F.xxhash64("id"), F.lit(salt)).alias("s"))
        .groupBy("s")
        .count()
        .collect()
    )
    assert len(shard_sizes) == salt
    assert max(r["count"] for r in shard_sizes) <= 3 * n // salt
