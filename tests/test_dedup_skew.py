"""Skew-escape test for the n-gram Jaccard join: the max_df hot-shingle
cutoff (llm_dedup.jaccard_pairs_from_shingles) must drop stopword-like
shingles whose document frequency would degenerate the shingle equi-join
into the O(n²) pair space (SURVEY §7 'hot shingles are the skew risk')."""

from __future__ import annotations

import pyspark.sql.functions as F

from columnarmodeling_spark.queries.llm_dedup import jaccard_pairs_from_shingles

N_DOCS = 30


def _shingles(spark):
    # Every doc: 3 unique shingles + ONE shingle shared by all docs (the
    # stopword-gram case — "of the and" appears in every document).
    rows = []
    for i in range(N_DOCS):
        rows += [(i, f"u{i}a"), (i, f"u{i}b"), (i, f"u{i}c"), (i, "hot")]
    return spark.createDataFrame(rows, "doc_id long, s string")


def test_hot_shingle_degenerates_without_cutoff(spark):
    sh = _shingles(spark)
    pairs = jaccard_pairs_from_shingles(sh, tau=0.1)
    # jaccard(any two docs) = 1/7 ≈ 0.1429 via the hot shingle alone:
    # the single stopword gram links ALL C(30,2) pairs.
    assert pairs.count() == N_DOCS * (N_DOCS - 1) // 2


def test_max_df_cutoff_bounds_join_groups(spark):
    sh = _shingles(spark)
    pairs = jaccard_pairs_from_shingles(sh, tau=0.1, max_df=5)
    # The hot shingle (df=30 > 5) is dropped; docs share nothing else.
    assert pairs.count() == 0

    # Bounded-partition property: after the cutoff, every join key's
    # group is ≤ max_df rows per side — no key can produce more than
    # max_df² join rows regardless of corpus-wide shingle popularity.
    keep = (
        sh.groupBy("s")
        .agg(F.count("*").alias("df"))
        .filter(F.col("df") <= 5)
    )
    filtered = sh.join(keep.select("s"), "s")
    max_group = (
        filtered.groupBy("s").count().agg(F.max("count")).collect()[0][0]
    )
    assert max_group <= 5


def test_max_df_keeps_real_duplicates(spark):
    # Two genuine near-dups sharing 3 rare shingles survive the cutoff.
    rows = []
    for i in range(N_DOCS):
        rows += [(i, f"u{i}a"), (i, f"u{i}b"), (i, "hot")]
    rows += [(100, "dupx"), (100, "dupy"), (100, "dupz"), (100, "hot")]
    rows += [(101, "dupx"), (101, "dupy"), (101, "dupz"), (101, "hot")]
    sh = spark.createDataFrame(rows, "doc_id long, s string")
    got = {
        (r["doc_a"], r["doc_b"], r["jaccard"])
        for r in jaccard_pairs_from_shingles(sh, tau=0.5, max_df=5).collect()
    }
    # After dropping "hot": docs 100/101 have identical {dupx,dupy,dupz}.
    assert got == {(100, 101, 1.0)}


def test_q211_flags_planted_full_containment(spark):
    """The planted duplicate partners must appear with containment 1.0
    in BOTH directions (exact copies contain each other)."""
    from pyspark.sql import functions as F

    from columnarmodeling_spark.queries import REGISTRY

    res = REGISTRY["q211_containment_pairs"].fn(
        spark, "/root/testdata/sf0.001"
    )
    rows = res.collect()
    assert len(rows) > 0
    full = {(r.doc_a, r.doc_b) for r in rows if r.containment == 1.0}
    assert full  # planted subset-duplicates exist
    # the ASYMMETRY the screen exists for: at least one doc fully
    # contained in a partner that is NOT fully contained back
    # (the strict-subset case Jaccard under-scores)
    assert any((b, a) not in full for a, b in full)
    # every row satisfies the integer threshold it claims
    assert all(r.inter * 5 >= r.n_a * 4 for r in rows)
    # directed pair keys are unique
    assert len({(r.doc_a, r.doc_b) for r in rows}) == len(rows)


def _write_events(tmp_path, rows):
    import pandas as pd

    df = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    df["ts"] = pd.to_datetime(df["ts"], unit="s")
    d = str(tmp_path)
    df.to_parquet(d + "/events.parquet", index=False)
    return d


def _q310(spark, d):
    from columnarmodeling_spark.queries import REGISTRY

    rows = REGISTRY["q310_skew_adaptive_agg"].fn(spark, d).collect()
    return {r.user_id: r for r in rows}


def test_q310_uniform_keys_take_plain_branch(spark, tmp_path):
    """Balanced keys: sampled skew factor ~1x, far below the 2x salting
    threshold — the plain branch must run and still aggregate exactly."""
    # 8 users x 74 events each; event_id dense so the %37 sample hits
    # every user twice -> sampled counts perfectly uniform
    rows = [
        (i, 1_700_000_000 + i, i % 8, "click", (i % 10) / 4.0, "{}")
        for i in range(8 * 74)
    ]
    d = _write_events(tmp_path, rows)
    got = _q310(spark, d)
    assert len(got) == 8
    for u, r in got.items():
        assert r.salted is False
        assert r.skew_milli < 2000
        assert r.n == 74
        want_cents = sum(
            round(100.0 * ((i % 10) / 4.0))
            for i in range(8 * 74)
            if i % 8 == u
        )
        assert r.total_cents == want_cents


def test_q310_hot_key_takes_salted_branch(spark, tmp_path):
    """One user owns 90% of events: sampled skew factor = max/(N/K)
    ~ 0.9*K >> 2 — the salted two-stage branch must run and produce the
    identical observable aggregate."""
    n = 1000
    rows = [
        (
            i,
            1_700_000_000 + i,
            0 if i % 10 != 9 else 1 + (i // 10) % 9,  # user 0 gets 90%
            "click",
            (i % 7) / 8.0,
            "{}",
        )
        for i in range(n)
    ]
    d = _write_events(tmp_path, rows)
    got = _q310(spark, d)
    assert got[0].salted is True
    assert got[0].skew_milli >= 2000
    assert got[0].n == 900
    import math

    # half-up like Spark/DuckDB round(), not Python's banker's rounding
    assert got[0].total_cents == sum(
        math.floor(100.0 * ((i % 7) / 8.0) + 0.5)
        for i in range(n)
        if i % 10 != 9
    )
    # salting must not perturb the cold keys either: the 100 cold
    # events cycle over 9 users -> one gets 12, the rest 11
    assert sum(got[u].n for u in range(1, 10)) == 100
    for u in range(1, 10):
        assert got[u].n in (11, 12)


def test_q310_matches_oracle_on_both_branches(spark, tmp_path):
    """The DuckDB oracle replays the profile + branch decision on the
    same crafted corpora: decision column and aggregates must match
    bit-for-bit on BOTH sides of the threshold."""
    import duckdb

    from columnarmodeling_spark.queries import REGISTRY
    from tests.oracle_utils import canonical_rows

    spec = REGISTRY["q310_skew_adaptive_agg"]
    for case in ("uniform", "hot"):
        if case == "uniform":
            rows = [
                (i, 1_700_000_000 + i, i % 8, "click", (i % 10) / 4.0, "{}")
                for i in range(8 * 74)
            ]
        else:
            rows = [
                (
                    i,
                    1_700_000_000 + i,
                    0 if i % 10 != 9 else 1 + (i // 10) % 9,
                    "click",
                    (i % 7) / 8.0,
                    "{}",
                )
                for i in range(1000)
            ]
        sub = tmp_path / case
        sub.mkdir()
        d = _write_events(sub, rows)
        got = spec.fn(spark, d)
        mine_cols = got.columns
        mine_rows = [tuple(r) for r in got.collect()]
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW events AS SELECT * FROM '{d}/events.parquet'"
        )
        cur = con.execute(spec.oracle)
        ocols = [c[0] for c in cur.description]
        orows = cur.fetchall()
        assert sorted(mine_cols) == sorted(ocols)
        assert canonical_rows(mine_cols, mine_rows) == canonical_rows(
            ocols, orows
        ), case
