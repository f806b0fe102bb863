"""Property tests for the round-13 operator additions (q330-q332).

The differential oracle tests in test_queries_oracle.py pin both engines
to identical values; these pin the SEMANTICS — invariants a refactor
could break while both engines drift together. q330's exactness is
checked against a brute-force all-pairs repeat finder on crafted
corpora (the whole point of the suffix-array form is matching that
oracle without the quadratic scan).
"""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from columnarmodeling_spark.queries import REGISTRY
from columnarmodeling_spark.queries.llm_dedup import (
    _SA_K,
    crosslingual_matches,
    suffix_repeat_stats,
)

SF = "/root/testdata/sf0.001"


def _tok(s: str) -> list[str]:
    return [w for w in re.split(r"[^a-z0-9]+", s.lower()) if w]


def _brute_repeats(texts: dict[int, str], k: int) -> dict[int, tuple[int, int]]:
    """All-pairs oracle: for every suffix, the longest prefix (capped at
    k) shared with ANY other suffix in the corpus; per doc, (max, count
    >= t) with t supplied by the caller via closure-free second pass."""
    suf = []  # (doc, pos, tuple of <= k tokens)
    for d, txt in texts.items():
        arr = _tok(txt)
        for i in range(len(arr)):
            suf.append((d, i, tuple(arr[i : i + k])))
    best: dict[tuple[int, int], int] = {}
    for i, (da, pa, sa) in enumerate(suf):
        m = 0
        for j, (db, pb, sb) in enumerate(suf):
            if i == j:
                continue
            l = 0
            while l < len(sa) and l < len(sb) and sa[l] == sb[l]:
                l += 1
            m = max(m, l)
        best[(da, pa)] = m
    out: dict[int, tuple[int, int]] = {}
    for d in texts:
        vals = [v for (dd, _), v in best.items() if dd == d]
        out[d] = (max(vals) if vals else 0, vals)
    return out


# --- q330: suffix-array ExactSubstr ------------------------------------------


def test_q330_matches_bruteforce_cross_doc(spark):
    texts = {
        0: "alpha beta gamma delta eps zeta",
        1: "xx yy gamma delta eps qq rr",
        2: "pp qq rr ss tt uu",
        3: "alpha beta gamma delta www",
    }
    docs = spark.createDataFrame(
        [(d, s) for d, s in texts.items()], "doc_id LONG, text STRING"
    )
    got = {
        r.doc_id: (r.max_repeat, r.n_rep_pos)
        for r in suffix_repeat_stats(docs, k=6, rep_t=2).collect()
    }
    brute = _brute_repeats(texts, k=6)
    for d in texts:
        mx, vals = brute[d]
        assert got[d][0] == mx, f"doc {d}: max_repeat {got[d][0]} != {mx}"
        assert got[d][1] == sum(1 for v in vals if v >= 2)


def test_q330_within_doc_repeats_count(spark):
    # 'm n m n m n' repeats within ONE document — ExactSubstr semantics
    # count self-repeats (Lee et al. remove those too)
    docs = spark.createDataFrame(
        [(0, "m n m n m n"), (1, "a b c d e f")],
        "doc_id LONG, text STRING",
    )
    rows = {r.doc_id: r for r in suffix_repeat_stats(docs, k=6, rep_t=2).collect()}
    # suffixes at pos 0 and 2 share 'm n m n' (4 tokens)
    assert rows[0].max_repeat == 4
    assert rows[1].max_repeat == 0


def test_q330_cap_and_bounds(spark):
    df = REGISTRY["q330_suffix_repeats"].fn(spark, SF)
    rows = df.collect()
    assert len(rows) == spark.read.parquet(f"{SF}/documents.parquet").count()
    for r in rows:
        assert 0 <= r.max_repeat <= _SA_K
        assert 0 <= r.n_rep_pos <= r.n_tokens
    # corpus has near-dup docs -> the cap must actually be hit somewhere
    assert max(r.max_repeat for r in rows) == _SA_K


def test_q330_exact_duplicate_docs_saturate(spark):
    dup = "one two three four five six seven eight nine ten eleven twelve more"
    docs = spark.createDataFrame(
        [(0, dup), (1, dup), (2, "totally different words here")],
        "doc_id LONG, text STRING",
    )
    rows = {r.doc_id: r for r in suffix_repeat_stats(docs, k=5, rep_t=3).collect()}
    assert rows[0].max_repeat == 5 and rows[1].max_repeat == 5  # capped
    # every position of the dup docs starts a repeat >= 3 except the
    # last 2 (suffixes shorter than 3 tokens cannot reach the threshold
    # ... they CAN: equal short suffixes have lcp = their full length)
    assert rows[0].n_rep_pos >= rows[0].n_tokens - 2
    assert rows[2].max_repeat == 0


# --- q331: cross-lingual near-dup ---------------------------------------------


def test_q331_translated_duplicate_found(spark):
    # same token set, different lang label -> concept sets identical ->
    # est_jaccard = 1.0 and the pair must surface
    docs = spark.createDataFrame(
        [
            (0, "spark hash join table scan filter group", "en"),
            (1, "spark hash join table scan filter group", "de"),
            (2, "completely unrelated vocabulary tokens entirely", "en"),
            (3, "nothing shared with anything at all xyz", "zh"),
        ],
        "doc_id LONG, text STRING, lang STRING",
    )
    rows = crosslingual_matches(docs).collect()
    by_xx = {r.doc_xx: r for r in rows}
    assert 1 in by_xx and by_xx[1].doc_en == 0
    assert by_xx[1].est_micro == 1_000_000
    assert 3 not in by_xx  # nothing shared -> below tau


def test_q331_output_contract(spark):
    df = REGISTRY["q331_crosslingual_neardup"].fn(spark, SF)
    rows = df.collect()
    langs = {
        r.lang
        for r in spark.read.parquet(f"{SF}/documents.parquet")
        .select("lang")
        .distinct()
        .collect()
    }
    seen = set()
    for r in rows:
        assert r.lang != "en" and r.lang in langs
        assert r.est_micro >= 500_000
        assert r.doc_xx not in seen  # top-1 per non-en doc
        seen.add(r.doc_xx)


# --- q332: quality-classifier calibration --------------------------------------


def test_q332_calibration_identities(spark):
    df = REGISTRY["q332_quality_calibration"].fn(spark, SF)
    rows = df.collect()
    assert 1 <= len(rows) <= 10
    n_total = sum(r.n_docs for r in rows)
    n_docs = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .where(F.length("text") > 0)
        .count()
    )
    assert n_total == n_docs
    ece = rows[0].ece_micro
    brier = rows[0].brier_micro
    for r in rows:
        assert 0 <= r.bin <= 9
        # bin boundaries: mean prediction lives inside its bin (+/- the
        # half-micro rounding of the mean itself)
        assert r.bin * 100_000 - 1 <= r.mean_pred_micro <= (r.bin + 1) * 100_000
        assert 0 <= r.frac_pos_micro <= 1_000_000
        assert r.cal_gap_micro == abs(r.mean_pred_micro - r.frac_pos_micro)
        assert r.ece_micro == ece and r.brier_micro == brier  # replicated
    # ECE is the n-weighted mean of the per-bin gaps (re-derive)
    expect = round(sum(r.n_docs * r.cal_gap_micro for r in rows) / n_total)
    assert abs(ece - expect) <= 1
    assert 0 <= brier <= 1_000_000


def test_q332_sigmoid_is_rational_and_bounded(spark):
    # the algebraic sigmoid never leaves (0, 1) and is monotone in z
    from columnarmodeling_spark.queries.analytics import _QC_S

    df = spark.createDataFrame(
        [(z,) for z in [-10_000_000, -1_000_000, 0, 1_000_000, 10_000_000]],
        "z_micro LONG",
    ).withColumn("s_micro", F.expr(_QC_S))
    vals = [r.s_micro for r in df.orderBy("z_micro").collect()]
    assert vals == sorted(vals)
    assert all(0 < v < 1_000_000 for v in vals)
    assert vals[2] == 500_000  # z = 0 -> exactly one half


# --- q333: cluster-aware split --------------------------------------------------


def test_q333_no_leakage_and_partition(spark):
    from columnarmodeling_spark.queries.llm_dedup import q333_cluster_split

    rows = q333_cluster_split(spark, SF).collect()
    assert rows, "split rollup must be non-empty"
    # the audit column is the guarantee: zero clusters span splits
    assert all(r.leak_clusters == 0 for r in rows)
    splits = {r.split for r in rows}
    assert splits <= {"train", "dev", "test"}
    n_total = sum(r.n_docs for r in rows)
    n_docs = spark.read.parquet(f"{SF}/documents.parquet").count()
    assert n_total == n_docs  # every doc assigned exactly once
    # 80/10/10 hash split: train must dominate
    by_split = {}
    for r in rows:
        by_split[r.split] = by_split.get(r.split, 0) + r.n_docs
    assert by_split.get("train", 0) > by_split.get("dev", 0)
    assert by_split.get("train", 0) > by_split.get("test", 0)


def test_q333_neardups_share_split(spark):
    """Two near-duplicate docs (same cluster) must land in ONE split."""
    from columnarmodeling_spark.queries.llm_dedup import q42_ngram_jaccard_pairs
    from columnarmodeling_spark.operators.graph import connected_components
    from columnarmodeling_spark.functions.text import hex_hash
    from columnarmodeling_spark.queries.llm_dedup import _CS_TRAIN_BUCKETS

    docs = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id")
    pairs = q42_ngram_jaccard_pairs(spark, SF).select("doc_a", "doc_b")
    if pairs.limit(1).count() == 0:
        return  # no near-dups at this sf — vacuous
    cc = connected_components(
        docs, pairs, id_col="doc_id", src_col="doc_a", dst_col="doc_b"
    )
    bucket = hex_hash(F.col("component").cast("string")) % 10
    per_cluster = (
        cc.select(
            "component",
            F.when(bucket < _CS_TRAIN_BUCKETS, "train")
            .when(bucket == _CS_TRAIN_BUCKETS, "dev")
            .otherwise("test")
            .alias("split"),
        )
        .groupBy("component")
        .agg(F.countDistinct("split").alias("ns"))
    )
    assert per_cluster.filter(F.col("ns") > 1).count() == 0


# --- q334: streaming near-dup gate ----------------------------------------------


def test_q334_row_sig_equals_grouped_sig(spark):
    """The stateless per-row signature (the q334 trick) must equal the
    q43 groupBy-based signature on the same corpus."""
    from columnarmodeling_spark.functions.text import tokens
    from columnarmodeling_spark.queries.llm_dedup import _minhash_signatures
    from columnarmodeling_spark.queries.streaming import _SNG_N, _spark_row_sig

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    row_sig = _spark_row_sig(
        docs.withColumn("tk", tokens("text")).filter(F.size("tk") >= _SNG_N)
    ).select("doc_id", *[f"mh{i}" for i in range(8)])
    grp_sig = _minhash_signatures(spark, SF)
    a = {r.doc_id: tuple(r[i + 1] for i in range(8)) for r in row_sig.collect()}
    b = {r.doc_id: tuple(r[i + 1] for i in range(8)) for r in grp_sig.collect()}
    shared = set(a) & set(b)
    assert shared, "corpora must overlap"
    for d in shared:
        assert a[d] == b[d], f"doc {d}: row-sig {a[d]} != grouped {b[d]}"


def test_q334_gate_contract(spark):
    from columnarmodeling_spark.queries import REGISTRY

    rows = REGISTRY["q334_stream_neardup_gate"].fn(spark, SF).collect()
    for r in rows:
        assert r.doc_id % 10 != 0  # stream side only
        assert r.cand % 10 == 0  # candidates come from the index corpus
        assert 1 <= r.n_band_hits <= 4
