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
