"""Unit/property tests for the analytics tier: HLL mergeability,
skyline exactness vs a naive dominance scan, funnel ordering semantics,
and BFS distances on a known graph."""

from __future__ import annotations

from pyspark.sql import functions as F

from columnarmodeling_spark.operators.indexing import with_global_running_max


def _hll_registers(spark, values, m=512):
    """Build (bucket, r) HLL registers over a string column the same way
    q134 does."""
    from columnarmodeling_spark.functions.text import hex_hash

    df = spark.createDataFrame([(v,) for v in values], "tk STRING")
    h = df.select(hex_hash("tk").alias("u"))
    w = F.expr(f"div(u, {m})")
    rho = F.when(w == F.lit(0), F.lit(52)).otherwise(
        F.lit(52) - F.length(F.bin(w))
    )
    return (
        h.select((F.col("u") % m).alias("bucket"), rho.alias("rho"))
        .groupBy("bucket")
        .agg(F.max("rho").alias("r"))
    )


def test_hll_registers_merge(spark):
    """The sketch property the 100 TB design hangs on: registers built
    per shard and merged by max equal registers built on the union."""
    shard_a = [f"tok{i}" for i in range(400)]
    shard_b = [f"tok{i}" for i in range(200, 700)]  # overlaps a

    union_regs = {
        (r["bucket"], r["r"])
        for r in _hll_registers(spark, shard_a + shard_b).collect()
    }
    a = _hll_registers(spark, shard_a)
    b = _hll_registers(spark, shard_b)
    merged = {
        (r["bucket"], r["r"])
        for r in (
            a.unionByName(b)
            .groupBy("bucket")
            .agg(F.max("r").alias("r"))
            .collect()
        )
    }
    assert merged == union_regs


def test_hll_estimate_within_expected_error(spark, sf_dir):
    """Raw HLL with m=512 has ~1.04/sqrt(512) = 4.6% std error; every
    per-lang estimate should land well within 4 sigma."""
    from columnarmodeling_spark.queries import REGISTRY

    rows = REGISTRY["q134_hll_distinct"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["exact_distinct"] > 0
        assert abs(r["rel_err"]) < 4 * 0.046, (r["lang"], r["rel_err"])


def test_skyline_matches_naive(spark):
    """Two-pass prefix-max skyline == naive NOT EXISTS dominance on a
    synthetic set with duplicate points and price ties, across an
    adversarial (tiny) partition count."""
    pts = [
        (1, 10.0, 5),
        (2, 10.0, 5),   # exact duplicate: both kept
        (3, 10.0, 4),   # dominated within the same price level
        (4, 9.0, 3),    # cheaper, smaller: kept
        (5, 11.0, 6),   # pricier but bigger: kept
        (6, 12.0, 6),   # pricier, no bigger: dominated by 5
        (7, 8.0, 1),
        (8, 8.0, 1),    # duplicate at the cheap end
        (9, 13.0, 2),   # dominated by nearly everything
    ]
    df = spark.createDataFrame(
        pts, "p_partkey LONG, p_retailprice DOUBLE, p_size LONG"
    ).repartition(3)

    levels = df.groupBy("p_retailprice").agg(F.max("p_size").alias("smax"))
    pref = with_global_running_max(
        levels, ["p_retailprice"], "smax", out_col="best_lt",
        num_partitions=3,
    )
    sky_levels = pref.filter(
        F.col("best_lt").isNull() | (F.col("smax") > F.col("best_lt"))
    ).select("p_retailprice", F.col("smax").alias("p_size"))
    got = {
        r["p_partkey"]
        for r in df.join(
            sky_levels, ["p_retailprice", "p_size"], "left_semi"
        ).collect()
    }

    naive = {
        pk
        for pk, pr, sz in pts
        if not any(
            p2 <= pr and s2 >= sz and (p2 < pr or s2 > sz)
            for _, p2, s2 in pts
        )
    }
    assert got == naive == {1, 2, 4, 5, 7, 8}


def test_funnel_strictly_after_semantics(spark):
    """A click at/before the first view must not count; a purchase
    before the click must not count."""
    import datetime as dt

    base = dt.datetime(2024, 1, 1)

    def ts(s):
        return base + dt.timedelta(seconds=s)

    rows = [
        # user 1: proper view -> click -> purchase
        (1, "view", ts(0)), (1, "click", ts(10)), (1, "purchase", ts(20)),
        # user 2: click exactly AT the view instant -> no click stage
        (2, "view", ts(0)), (2, "click", ts(0)), (2, "purchase", ts(5)),
        # user 3: purchase before the click -> view+click only
        (3, "view", ts(0)), (3, "purchase", ts(1)), (3, "click", ts(2)),
        # user 4: no view at all -> nothing counts
        (4, "click", ts(0)), (4, "purchase", ts(1)),
    ]
    e = spark.createDataFrame(
        rows, "user_id LONG, event_type STRING, ts TIMESTAMP_NTZ"
    )
    v = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min(F.unix_micros(F.col("ts").cast("timestamp"))).alias("t1"))
    )
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    c = (
        e.filter(F.col("event_type") == "click")
        .withColumn("us", us)
        .join(v, "user_id")
        .filter(F.col("us") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("t1").alias("t1"), F.min("us").alias("t2"))
    )
    p = (
        e.filter(F.col("event_type") == "purchase")
        .withColumn("us", us)
        .join(c, "user_id")
        .filter(F.col("us") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("us").alias("t3"))
    )
    assert {r["user_id"] for r in v.collect()} == {1, 2, 3}
    assert {r["user_id"] for r in c.collect()} == {1, 3}
    assert {r["user_id"] for r in p.collect()} == {1}


def test_bfs_known_path_graph(spark):
    """Hand-checked hop distances: a 0-1-2-...-9 path seeded at node 0
    reaches exactly hop<=3 within 3 rounds; the rest stay at infinity."""
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(9)], "src LONG, dst LONG"
    )
    und = edges.unionByName(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).localCheckpoint()
    dist = (
        und.select(F.col("src").alias("id"))
        .distinct()
        .select(
            "id",
            F.when(F.col("id") == 0, F.lit(0))
            .otherwise(F.lit(999_999))
            .cast("long")
            .alias("d"),
        )
    )
    for _ in range(3):
        relaxed = (
            und.join(dist.withColumnRenamed("id", "src"), "src")
            .groupBy(F.col("dst").alias("id"))
            .agg(F.min(F.col("d") + 1).alias("nd"))
        )
        dist = dist.join(relaxed, "id", "left").select(
            "id",
            F.least(
                F.col("d"), F.coalesce(F.col("nd"), F.lit(999_999))
            ).alias("d"),
        ).localCheckpoint()
    got = {r["id"]: r["d"] for r in dist.collect()}
    want = {i: (i if i <= 3 else 999_999) for i in range(10)}
    assert got == want


def test_rfm_quintiles_balanced(spark, sf_dir):
    """q197: every score is in 1..5 and each quintile holds floor or
    ceil of n/5 customers (the (rank-1)*5 div n + 1 arithmetic)."""
    from columnarmodeling_spark.queries import REGISTRY

    rows = REGISTRY["q197_rfm_segments"].fn(spark, sf_dir).collect()
    n = len(rows)
    assert n > 0
    import collections

    for metric in ("r_score", "f_score", "m_score"):
        counts = collections.Counter(r[metric] for r in rows)
        assert set(counts) <= {1, 2, 3, 4, 5}
        lo, hi = n // 5, -(-n // 5)
        assert all(lo <= c <= hi for c in counts.values())
    for r in rows:
        assert r["segment"] == (
            r["r_score"] * 100 + r["f_score"] * 10 + r["m_score"]
        )


def test_ewma_bounded_by_value_range(spark, sf_dir):
    """q194: a convex-combination fold can never leave the per-user
    value range."""
    from pyspark.sql import functions as F

    from columnarmodeling_spark.queries import REGISTRY
    from columnarmodeling_spark.queries._util import t

    ew = REGISTRY["q194_ewma_smoothing"].fn(spark, sf_dir)
    rng = (
        t(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.min("value").alias("lo"), F.max("value").alias("hi"))
    )
    bad = ew.join(rng, "user_id").filter(
        (F.col("ewma") < F.col("lo") - 1e-6)
        | (F.col("ewma") > F.col("hi") + 1e-6)
    )
    assert ew.count() > 0 and bad.count() == 0


def test_negative_sampling_shape_and_flags(spark, sf_dir):
    """q196: exactly k=2 draws per positive pair, candidates inside the
    part-key range, and the collision flag agrees with membership in
    the positive set."""
    from pyspark.sql import functions as F

    from columnarmodeling_spark.queries import REGISTRY
    from columnarmodeling_spark.queries._util import t

    out = REGISTRY["q196_negative_sampling"].fn(spark, sf_dir).cache()
    per = out.groupBy("custkey", "partkey").agg(F.count("*").alias("c"))
    assert per.filter("c != 2").count() == 0
    mp = t(spark, sf_dir, "part").agg(F.max("p_partkey")).collect()[0][0]
    assert out.filter(
        (F.col("neg_partkey") < 1) | (F.col("neg_partkey") > mp)
    ).count() == 0
    pos = (
        out.select(
            F.col("custkey").alias("pc"), F.col("partkey").alias("pp")
        )
        .distinct()
        .localCheckpoint()
    )
    flagged = out.filter("is_collision").join(
        pos,
        (F.col("custkey") == F.col("pc"))
        & (F.col("neg_partkey") == F.col("pp")),
        "left_anti",
    )
    assert flagged.count() == 0
    out.unpersist()


def test_poisson_bootstrap_replicas_sane(spark, sf_dir):
    """q199: every replica's effective n is within a few sigma of the
    row count (sum of n Poisson(1) ~ n +- sqrt(n)), means stay inside
    the value range, and replicas differ (the draw is per-replica)."""
    from columnarmodeling_spark.queries import REGISTRY
    from columnarmodeling_spark.queries._util import t

    rows = REGISTRY["q199_poisson_bootstrap"].fn(spark, sf_dir).collect()
    assert len(rows) == 8
    n = t(spark, sf_dir, "orders").count()
    import math

    for r in rows:
        assert abs(r["n_eff"] - n) <= 6 * math.sqrt(n) + 1
        assert r["sum_cents"] > 0
    assert len({r["n_eff"] for r in rows}) > 1


def test_calibration_deciles_partition_users(spark, sf_dir):
    """q200: deciles 1..10 partition the user set with floor/ceil(n/10)
    sizes and conversion counts bounded by bucket size."""
    from columnarmodeling_spark.queries import REGISTRY

    rows = REGISTRY["q200_calibration_curve"].fn(spark, sf_dir).collect()
    total = sum(r["n_users"] for r in rows)
    assert {r["score_decile"] for r in rows} <= set(range(1, 11))
    lo, hi = total // 10, -(-total // 10)
    for r in rows:
        assert lo <= r["n_users"] <= hi
        assert 0 <= r["n_converted"] <= r["n_users"]
        assert 0 <= r["conv_rate_micro"] <= 1000000


def test_psi_nonnegative(spark, sf_dir):
    """q203: each PSI term (p-q)*ln(p/q) is nonnegative (signs agree),
    and quantization preserves sign — so the total must be >= 0."""
    from columnarmodeling_spark.queries import REGISTRY

    r = REGISTRY["q203_psi_drift"].fn(spark, sf_dir).collect()[0]
    assert r["n_buckets"] == 64
    assert r["psi_pico"] >= 0


def test_chisq_nonnegative_dof(spark, sf_dir):
    """q204: chi-square is a sum of squares (>= 0) and dof =
    (types-1)*(groups-1) with both factors data-derived, so a slice
    holding only one weekend/weekday group reports dof = 0."""
    from pyspark.sql import functions as F

    from columnarmodeling_spark.queries import REGISTRY
    from columnarmodeling_spark.queries._util import t

    r = REGISTRY["q204_chisq_homogeneity"].fn(spark, sf_dir).collect()[0]
    assert r["chisq_micro"] >= 0
    ev = t(spark, sf_dir, "events")
    n_types = ev.select("event_type").distinct().count()
    n_groups = (
        ev.select(
            F.when(F.dayofweek("ts").isin(1, 7), 1).otherwise(0).alias("wk")
        )
        .distinct()
        .count()
    )
    assert r["dof"] == (n_types - 1) * (n_groups - 1)
    assert r["n_cells"] <= 2 * n_types


def test_winnowing_shared_span_shares_fingerprint(spark):
    """The winnowing guarantee q213 is built on: two documents sharing
    any run of >= w + k - 1 tokens (here w=4, k=1 grams over synthetic
    integer 'hashes') share at least one selected fingerprint hash."""
    from columnarmodeling_spark.operators.fingerprints import winnow_selected

    # doc 1 and doc 2 share hashes 100..107 (8 >= w+k-1 for w=4, k=5
    # is q213's config; with k folded into the hash a run of w+... the
    # shared HASH run of length >= 2w-1 guarantees a shared full
    # window) — use a shared run of 8 >= 2*4-1
    shared = [101, 9, 105, 3, 107, 55, 104, 7]
    d1 = [(1, i, h) for i, h in enumerate([91, 88] + shared + [77])]
    d2 = [(2, i, h) for i, h in enumerate(shared + [66, 64])]
    g = spark.createDataFrame(d1 + d2, "doc_id long, pos long, h long")
    sel = winnow_selected(g, 4).collect()
    f1 = {r.h for r in sel if r.doc_id == 1}
    f2 = {r.h for r in sel if r.doc_id == 2}
    assert f1 and f2
    assert f1 & f2, "shared run must share a fingerprint"


def test_winnowing_selects_every_window_min(spark):
    """Every complete w-window's min hash appears among the selected
    fingerprints, and density lands in (0, 1]."""
    import random

    from columnarmodeling_spark.operators.fingerprints import winnow_selected

    rng = random.Random(11)
    hs = [rng.randrange(10**9) for _ in range(200)]
    g = spark.createDataFrame(
        [(7, i, h) for i, h in enumerate(hs)],
        "doc_id long, pos long, h long",
    )
    w = 4
    sel = {(r.sel_pos, r.h) for r in winnow_selected(g, w).collect()}
    for s in range(len(hs) - w + 1):
        window = hs[s : s + w]
        m = min(window)
        rightmost = s + max(i for i, h in enumerate(window) if h == m)
        assert (rightmost, m) in sel, (s, window)
    assert 0 < len(sel) <= len(hs)


def test_winnowing_tie_breaks_to_rightmost(spark):
    """The MOSS tie rule the r15 struct-min rewrite must preserve: when
    a window's minimum hash occurs at several positions, the RIGHTMOST
    occurrence is selected. Forced duplicate minima (the random test
    above never produces ties), brute-force reference per window."""
    from columnarmodeling_spark.operators.fingerprints import winnow_selected

    #            pos: 0  1  2  3  4  5  6  7  8
    hs = [5, 2, 9, 2, 2, 7, 1, 1, 8]
    w = 3
    g = spark.createDataFrame(
        [(3, i, h) for i, h in enumerate(hs)],
        "doc_id long, pos long, h long",
    )
    sel = {(r.sel_pos, r.h) for r in winnow_selected(g, w).collect()}
    expect = set()
    for s in range(len(hs) - w + 1):
        window = hs[s : s + w]
        m = min(window)
        expect.add((s + max(i for i, h in enumerate(window) if h == m), m))
    assert sel == expect
    # windows [2,2,7] (pos 2..4... min 2 at pos 3 AND 4) and [1,1,8]
    # (min 1 at pos 6 AND 7) contain in-window duplicate minima; the
    # rightmost occurrences 4 and 7 must be among the selections
    assert (4, 2) in sel and (7, 1) in sel
    # a leftmost-tie implementation would select (2, 9, 2)'s pos 1 for
    # window s=1 instead of pos 3 — i.e. (3, 2) would vanish
    assert (3, 2) in sel


def test_q214_spans_consistent_with_q209(spark):
    """Every doc q214 reports a span for is q209-contaminated, spans
    are >= the 8-token seed length, and run/partner counts cohere."""
    from columnarmodeling_spark.queries import REGISTRY

    sf = "/root/testdata/sf0.001"
    spans = REGISTRY["q214_contamination_spans"].fn(spark, sf).collect()
    assert spans, "sf0.001 must exercise the positive path"
    flagged = {
        r.doc_id
        for r in REGISTRY["q209_decontamination"].fn(spark, sf).collect()
        if r.contaminated == 1
    }
    for r in spans:
        assert r.max_span_tokens >= 8
        assert r.n_runs >= r.n_partner_docs >= 1
        assert r.doc_id in flagged, r.doc_id


def test_q215_fertility_invariants(spark):
    from columnarmodeling_spark.queries import REGISTRY

    rows = REGISTRY["q215_tokenizer_fertility"].fn(
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert rows
    for r in rows:
        # UTF-8 bytes >= codepoints; alnum-run tokens never outnumber
        # chars; milli ratios are the exact rounded quotients
        assert r.n_bytes >= r.n_chars >= r.n_tokens > 0
        assert r.chars_per_tok_milli == round(
            1000.0 * r.n_chars / r.n_tokens
        )
        assert r.bytes_per_tok_milli >= r.chars_per_tok_milli


def test_q216_mann_whitney_bounds(spark):
    from columnarmodeling_spark.queries import REGISTRY

    r = REGISTRY["q216_mann_whitney"].fn(
        spark, "/root/testdata/sf0.001"
    ).collect()[0]
    assert r.n1 > 0 and r.n2 > 0
    # 0 <= U1 <= n1*n2, doubled invariant
    assert 0 <= r.u1_x2 <= 2 * r.n1 * r.n2
    assert r.tie_term >= 0


def test_q217_kruskal_wallis_nonnegative(spark):
    from columnarmodeling_spark.queries import REGISTRY

    r = REGISTRY["q217_kruskal_wallis"].fn(
        spark, "/root/testdata/sf0.001"
    ).collect()[0]
    assert r.k == 5 and r.n > 0
    # H is a weighted variance of group mean ranks: >= 0 up to the
    # documented micro-quantization (|dH| <= 6k micro-units)
    assert r.h_micro >= -6 * r.k
    assert r.h_corr_micro >= r.h_micro  # ties correction divides by <= 1


def test_q218_rrf_shape_and_monotonicity(spark):
    from collections import defaultdict

    from columnarmodeling_spark.queries import REGISTRY

    rows = REGISTRY["q218_rrf_fusion"].fn(
        spark, "/root/testdata/sf0.001"
    ).collect()
    by_type = defaultdict(list)
    for r in rows:
        by_type[r.event_type].append(r)
    assert len(by_type) == 5
    for evs in by_type.values():
        evs.sort(key=lambda r: r.fused_rank)
        assert [r.fused_rank for r in evs] == list(
            range(1, len(evs) + 1)
        )
        assert len(evs) <= 20
        scores = [r.fused_micro for r in evs]
        assert scores == sorted(scores, reverse=True)


def test_q219_consistent_hash_minimal_movement(spark):
    """Consistent hashing's minimal-movement property, measured: adding
    one shard to 16 must move well under half the corpus, while
    mod-hashing reshuffles nearly everything."""
    from columnarmodeling_spark.queries import REGISTRY

    r = REGISTRY["q219_consistent_hash"].fn(
        spark, "/root/testdata/sf0.001"
    ).collect()[0]
    assert r.n_docs > 0
    assert r.moved_ch + r.moved_mod <= 2 * r.n_docs
    # theory: ~1/17 (59 permille) vs ~16/17 (941 permille); generous
    # bands for small-sample noise
    assert r.ch_permille < 250, r.ch_permille
    assert r.mod_permille > 700, r.mod_permille
    assert r.ch_permille < r.mod_permille


def test_q220_confusion_matrix_consistency(spark):
    """TP/FP/FN bookkeeping must cohere with q52's predictions."""
    from columnarmodeling_spark.queries import REGISTRY

    sf = "/root/testdata/sf0.001"
    rows = {r.c: r for r in
            REGISTRY["q220_langid_confusion"].fn(spark, sf).collect()}
    assert set(rows) == {"en", "es", "zh", "macro"}
    preds = REGISTRY["q52_lang_id"].fn(spark, sf).collect()
    n_docs = len(preds)
    # every doc contributes exactly one prediction: sum of per-class
    # (tp + fp) over the classifier's range = n_docs
    assert sum(rows[c].tp + rows[c].fp for c in ("en", "es", "zh")) == n_docs
    macro = rows["macro"]
    assert macro.tp == sum(rows[c].tp for c in ("en", "es", "zh"))
    for c in ("en", "es", "zh"):
        r = rows[c]
        if r.f1_milli is not None:
            assert 0 <= r.f1_milli <= 1000


def test_q221_zipf_slope_negative(spark):
    from columnarmodeling_spark.queries import REGISTRY

    r = REGISTRY["q221_token_zipf"].fn(
        spark, "/root/testdata/sf0.001"
    ).collect()[0]
    assert r.n_vocab >= r.n_fit > 2
    # rank-frequency is monotonically non-increasing by construction,
    # so the OLS slope over (ln rank, ln count) cannot be positive
    assert r.slope_micro <= 0


def test_q223_novelty_planted_dups_score_low(spark):
    """Planted near-duplicate partners must score materially lower
    novelty than the corpus median; every score is a valid permille."""
    from columnarmodeling_spark.queries import REGISTRY

    sf = "/root/testdata/sf0.001"
    rows = REGISTRY["q223_ngram_novelty"].fn(spark, sf).collect()
    assert rows
    scores = sorted(r.novelty_permille for r in rows)
    assert all(0 <= s <= 1000 for s in scores)
    # the near-dup partners (q56 clusters of size > 1) with the LARGER
    # doc_id copy someone else's grams -> novelty near zero
    clusters = REGISTRY["q56_dup_clusters"].fn(spark, sf).collect()
    by_c = {}
    for r in clusters:
        by_c.setdefault(r.cluster_id, []).append(r.doc_id)
    later_copies = {
        max(ds) for ds in by_c.values() if len(ds) > 1
    }
    assert later_copies, "testdata must contain near-dup clusters"
    nov = {r.doc_id: r.novelty_permille for r in rows}
    med = scores[len(scores) // 2]
    for d in later_copies:
        assert nov[d] < med, (d, nov[d], med)


def test_q224_histogram_mass_conserves(spark):
    from columnarmodeling_spark.queries import REGISTRY

    sf = "/root/testdata/sf0.001"
    hist = REGISTRY["q224_dup_size_histogram"].fn(spark, sf).collect()
    n_docs_total = sum(r.n_docs for r in hist)
    n_corpus = REGISTRY["q56_dup_clusters"].fn(spark, sf).count()
    assert n_docs_total == n_corpus
    for r in hist:
        assert r.n_docs == r.cluster_size * r.n_clusters
    assert any(r.cluster_size > 1 for r in hist), "planted dups expected"


def test_q225_centroid_cosine_bounds_and_symmetry(spark):
    from columnarmodeling_spark.queries import REGISTRY

    rows = REGISTRY["q225_label_centroid_cosine"].fn(
        spark, "/root/testdata/sf0.001"
    ).collect()
    labels = set()
    for r in rows:
        assert r.label_a < r.label_b
        labels.update((r.label_a, r.label_b))
        assert -1_000_001 <= r.cos_micro <= 1_000_001
    k = len(labels)
    assert len(rows) == k * (k - 1) // 2


def test_q226_funnel_conserves_documents(spark):
    from columnarmodeling_spark.queries import REGISTRY

    rows = sorted(
        REGISTRY["q226_filter_funnel"].fn(
            spark, "/root/testdata/sf0.001"
        ).collect(),
        key=lambda r: r.stage,
    )
    assert [r.rule for r in rows] == [
        "min_length", "stopword_floor", "repetition_cap",
    ]
    # stage k's survivors = stage k+1's dropped + surviving
    for a, b in zip(rows, rows[1:]):
        assert a.n_surviving == b.n_dropped + b.n_surviving
    assert rows[0].n_dropped + rows[0].n_surviving > 0


def test_q227_benford_chi_and_terms(spark):
    from columnarmodeling_spark.queries import REGISTRY

    rows = REGISTRY["q227_benford_digits"].fn(
        spark, "/root/testdata/sf0.001"
    ).collect()
    digits = {r.digit: r for r in rows}
    assert set(digits) == set(range(10))
    total = digits[0]
    assert total.chi_term_micro == sum(
        digits[d].chi_term_micro for d in range(1, 10)
    )
    assert total.n_obs == sum(digits[d].n_obs for d in range(1, 10))
    # Benford probabilities sum to 1 (micro-quantized)
    assert abs(
        sum(digits[d].p_micro for d in range(1, 10)) - 1_000_000
    ) <= 5
    # uniformly generated prices are loudly non-Benford: chi2 >> the
    # 8-dof 99.9% critical value (~26.1)
    assert total.chi_term_micro > 26_100_000


def test_q228_ks_matches_numpy_ecdf(spark):
    import numpy as np
    import pandas as pd

    from columnarmodeling_spark.queries import REGISTRY

    r = REGISTRY["q228_ks_test"].fn(
        spark, "/root/testdata/sf0.001"
    ).collect()[0]
    ev = pd.read_parquet("/root/testdata/sf0.001/events.parquet")
    a = np.sort(ev.loc[ev.event_type == "click", "value"].to_numpy())
    b = np.sort(ev.loc[ev.event_type == "view", "value"].to_numpy())
    assert (r.n1, r.n2) == (len(a), len(b))
    pts = np.union1d(a, b)
    c1 = np.searchsorted(a, pts, side="right")
    c2 = np.searchsorted(b, pts, side="right")
    d_num = int(np.max(np.abs(c1 * len(b) - c2 * len(a))))
    assert r.d_num == d_num
    assert 0 <= r.d_micro <= 1_000_000
    assert r.lambda_micro >= 0
    # one-term Kolmogorov tail is bounded by 2
    assert 0 <= r.p_approx_micro <= 2_000_000


def test_q229_spearman_matches_pandas(spark):
    import pandas as pd

    from columnarmodeling_spark.queries import REGISTRY

    rows = REGISTRY["q229_spearman"].fn(
        spark, "/root/testdata/sf0.001"
    ).collect()
    docs = pd.read_parquet("/root/testdata/sf0.001/documents.parquet")
    import re

    docs["y"] = docs.text.map(
        lambda s: len(set(t for t in re.split(r"[^a-z0-9]+", s.lower()) if t))
    )
    assert len(rows) == docs.lang.nunique()
    for r in rows:
        assert r.n > 0 and abs(r.rho_micro) <= 1_000_000
        g = docs[docs.lang == r.lang]
        rho = g.n_chars.rank().corr(g.y.rank())  # midrank Pearson
        assert abs(r.rho_micro - round(1e6 * rho)) <= 2, r.lang


def test_q230_gini_matches_python_fold(spark):
    import re
    from collections import Counter

    import pandas as pd

    from columnarmodeling_spark.queries import REGISTRY

    rows = REGISTRY["q230_token_gini"].fn(
        spark, "/root/testdata/sf0.001"
    ).collect()
    docs = pd.read_parquet("/root/testdata/sf0.001/documents.parquet")
    for r in rows:
        cnt = Counter()
        for s in docs.loc[docs.lang == r.lang, "text"]:
            cnt.update(t for t in re.split(r"[^a-z0-9]+", s.lower()) if t)
        f = sorted(cnt.values())
        n, s_tot = len(f), sum(f)
        si = sum((i + 1) * c for i, c in enumerate(f))
        assert (r.n_vocab, r.n_tokens) == (n, s_tot)
        gini = (2.0 * si - (n + 1.0) * s_tot) / (n * 1.0 * s_tot)
        assert abs(r.gini_micro - round(1e6 * gini)) <= 1
        assert 0 <= r.gini_micro <= 1_000_000


def test_q231_runs_match_python_scan(spark):
    import re

    import pandas as pd

    from columnarmodeling_spark.queries import REGISTRY

    rows = {
        r.doc_id: r
        for r in REGISTRY["q231_repetition_runs"]
        .fn(spark, "/root/testdata/sf0.001")
        .collect()
    }
    docs = pd.read_parquet("/root/testdata/sf0.001/documents.parquet")
    for doc_id, text in zip(docs.doc_id, docs.text):
        tk = [t for t in re.split(r"[^a-z0-9]+", text.lower()) if t]
        if not tk:
            assert doc_id not in rows
            continue
        best_len, best_tok, cur = 0, None, 1
        for i, tok in enumerate(tk):
            cur = cur + 1 if i and tok == tk[i - 1] else 1
            if cur > best_len or (cur == best_len and tok < best_tok):
                best_len, best_tok = cur, tok
        r = rows[doc_id]
        assert (r.n_tok, r.max_run, r.run_tok) == (
            len(tk), best_len, best_tok,
        ), doc_id
        assert r.flag_repetitive == int(best_len >= 3)


def _tokenize_docs(path):
    import re

    import pandas as pd

    docs = pd.read_parquet(path)
    docs["tk"] = docs.text.map(
        lambda s: [t for t in re.split(r"[^a-z0-9]+", s.lower()) if t]
    )
    return docs


def test_q233_kl_nonneg_and_matches_python(spark):
    import math
    from collections import Counter

    from columnarmodeling_spark.queries import REGISTRY

    rows = REGISTRY["q233_kl_source_mix"].fn(
        spark, "/root/testdata/sf0.001"
    ).collect()
    docs = _tokenize_docs("/root/testdata/sf0.001/documents.parquet")
    corpus = Counter()
    per = {}
    for src, g in docs.groupby("source"):
        c = Counter()
        for tk in g.tk:
            c.update(tk)
        per[src] = c
        corpus.update(c)
    n_c = sum(corpus.values())
    assert len(rows) == len(per)
    for r in rows:
        c = per[r.source]
        n_s = sum(c.values())
        assert (r.n_tokens, r.n_vocab) == (n_s, len(c))
        kl = sum(
            (cs / n_s) * math.log((cs * n_c) / (corpus[t] * n_s))
            for t, cs in c.items()
        )
        # micro-quantized per-term sums track the float fold closely
        assert abs(r.kl_micro - 1e6 * kl) <= 1000, r.source
        assert r.kl_micro >= -5  # KL >= 0 up to quantization slack


def test_q234_ols_matches_numpy(spark):
    import numpy as np

    from columnarmodeling_spark.queries import REGISTRY

    rows = REGISTRY["q234_grouped_ols"].fn(
        spark, "/root/testdata/sf0.001"
    ).collect()
    docs = _tokenize_docs("/root/testdata/sf0.001/documents.parquet")
    docs["x"] = docs.tk.map(len)
    for r in rows:
        g = docs[docs.lang == r.lang]
        slope, intercept = np.polyfit(g.x, g.n_chars, 1)
        cc = np.corrcoef(g.x, g.n_chars)[0, 1]
        assert abs(r.slope_micro - 1e6 * slope) <= 2, r.lang
        assert abs(r.intercept_micro - 1e6 * intercept) <= 2, r.lang
        assert abs(r.r2_micro - 1e6 * cc * cc) <= 2, r.lang
        assert 0 <= r.r2_micro <= 1_000_001


def test_q235_overlap_bounds_and_sizes(spark):
    from columnarmodeling_spark.queries import REGISTRY

    rows = REGISTRY["q235_source_overlap"].fn(
        spark, "/root/testdata/sf0.001"
    ).collect()
    docs = _tokenize_docs("/root/testdata/sf0.001/documents.parquet")
    vocab = {
        src: set().union(*g.tk) for src, g in docs.groupby("source")
    }
    k = len(vocab)
    # every co-vocabulary pair present exactly once, a < b
    assert len(rows) == sum(
        1
        for a in vocab
        for b in vocab
        if a < b and vocab[a] & vocab[b]
    )
    for r in rows:
        assert r.src_a < r.src_b
        assert (r.v_a, r.v_b) == (
            len(vocab[r.src_a]), len(vocab[r.src_b]),
        )
        inter = len(vocab[r.src_a] & vocab[r.src_b])
        assert r.n_inter == inter
        assert r.jaccard_micro == round(
            1e6 * inter / (r.v_a + r.v_b - inter)
        )


def test_q236_skipgram_counts_match_python(spark):
    import math
    from collections import Counter

    from columnarmodeling_spark.queries import REGISTRY
    from columnarmodeling_spark.queries.llm_text import (
        _SKIP_K,
        _SKIP_MIN_CNT,
    )

    rows = REGISTRY["q236_skipgram_pmi"].fn(
        spark, "/root/testdata/sf0.001"
    ).collect()
    docs = _tokenize_docs("/root/testdata/sf0.001/documents.parquet")
    pairs, uni = Counter(), Counter()
    for tk in docs.tk:
        uni.update(tk)
        for i, w1 in enumerate(tk):
            for j in range(i + 1, min(i + _SKIP_K, len(tk) - 1) + 1):
                pairs[(w1, tk[j])] += 1
    t_pairs, n_tok = sum(pairs.values()), sum(uni.values())
    expect = {p: c for p, c in pairs.items() if c >= _SKIP_MIN_CNT}
    assert {(r.w1, r.w2): r.cnt for r in rows} == expect
    for r in rows:
        pmi = math.log(
            (r.cnt * n_tok * n_tok)
            / (t_pairs * uni[r.w1] * uni[r.w2])
        )
        assert abs(r.pmi_micro - 1e6 * pmi) <= 2, (r.w1, r.w2)


def test_q237_theil_u_bounds_and_entropies(spark):
    import math
    from collections import Counter

    import pandas as pd

    from columnarmodeling_spark.queries import REGISTRY

    r = REGISTRY["q237_theil_u"].fn(
        spark, "/root/testdata/sf0.001"
    ).collect()[0]
    docs = pd.read_parquet("/root/testdata/sf0.001/documents.parquet")
    n = len(docs)
    cs = Counter(docs.source)
    c_ls = Counter(zip(docs.lang, docs.source))
    cl = Counter(docs.lang)
    h_s = math.log(n) - sum(c * math.log(c) for c in cs.values()) / n
    h_cond = (
        sum(c * math.log(c) for c in cl.values())
        - sum(c * math.log(c) for c in c_ls.values())
    ) / n
    assert r.n == n
    assert abs(r.h_s_micro - 1e6 * h_s) <= 1000
    assert abs(r.h_cond_micro - 1e6 * h_cond) <= 1000
    assert 0 <= r.h_cond_micro <= r.h_s_micro + 5
    assert -5 <= r.u_micro <= 1_000_005


def test_q238_trimmed_winsorized_match_python(spark):
    import pandas as pd

    from columnarmodeling_spark.queries import REGISTRY

    rows = REGISTRY["q238_trimmed_mean"].fn(
        spark, "/root/testdata/sf0.001"
    ).collect()
    ev = pd.read_parquet("/root/testdata/sf0.001/events.parquet")
    for r in rows:
        g = ev[ev.event_type == r.event_type].copy()
        g["vq"] = (1e6 * g.value).round().astype("int64")
        g = g.sort_values(["vq", "event_id"]).reset_index(drop=True)
        n = len(g)
        cut = n // 10
        kept = g.vq.iloc[cut: n - cut]
        assert (r.n, r.n_kept) == (n, n - 2 * cut)
        assert abs(
            r.trimmed_mean_micro - kept.sum() / len(kept)
        ) <= 0.51
        wins = (kept.sum() + cut * kept.iloc[0] + cut * kept.iloc[-1]) / n
        assert abs(r.winsor_mean_micro - wins) <= 0.51
        # robustness: trimmed mean within the kept band
        assert kept.iloc[0] <= r.trimmed_mean_micro <= kept.iloc[-1]


def test_q239_snm_pairs_are_real_neardups(spark):
    import re

    import pandas as pd

    from columnarmodeling_spark.queries import REGISTRY

    rows = REGISTRY["q239_sorted_neighborhood"].fn(
        spark, "/root/testdata/sf0.01"
    ).collect()
    assert rows  # planted near-dups must surface
    docs = pd.read_parquet("/root/testdata/sf0.01/documents.parquet")
    texts = dict(zip(docs.doc_id, docs.text))

    def shingles(s):
        tk = [t for t in re.split(r"[^a-z0-9]+", s.lower()) if t]
        return {
            " ".join(tk[i: i + 3]) for i in range(len(tk) - 2)
        }

    for r in rows:
        a, b = shingles(texts[r.doc_a]), shingles(texts[r.doc_b])
        inter, union = len(a & b), len(a | b)
        assert (r.n_inter, r.n_union) == (inter, union)
        # survivors really pass the Jaccard >= 0.5 gate
        assert 2 * inter >= union
        assert r.jac_milli == 1000 * inter // union


def test_q240_welch_consistent_with_mw_direction(spark):
    import numpy as np
    import pandas as pd

    from columnarmodeling_spark.queries import REGISTRY

    r = REGISTRY["q240_welch_ttest"].fn(
        spark, "/root/testdata/sf0.001"
    ).collect()[0]
    ev = pd.read_parquet("/root/testdata/sf0.001/events.parquet")
    a = np.round(1000.0 * ev.loc[ev.event_type == "click", "value"]).astype(
        "int64"
    )
    b = np.round(1000.0 * ev.loc[ev.event_type == "view", "value"]).astype(
        "int64"
    )
    assert (r.n1, r.n2) == (len(a), len(b))
    se1 = a.var(ddof=1) / len(a)
    se2 = b.var(ddof=1) / len(b)
    tstat = (a.mean() - b.mean()) / np.sqrt(se1 + se2)
    dof = (se1 + se2) ** 2 / (
        se1**2 / (len(a) - 1) + se2**2 / (len(b) - 1)
    )
    assert abs(r.t_micro - 1e6 * tstat) <= 2
    assert abs(r.dof_milli - 1e3 * dof) <= 2
    # dof bounded by min-1 .. n1+n2-2
    assert 1000 * (min(len(a), len(b)) - 1) <= r.dof_milli
    assert r.dof_milli <= 1000 * (len(a) + len(b) - 2)


def test_q241_acf_matches_numpy(spark):
    import numpy as np
    import pandas as pd

    from columnarmodeling_spark.queries import REGISTRY

    rows = REGISTRY["q241_acf"].fn(
        spark, "/root/testdata/sf0.001"
    ).collect()
    ev = pd.read_parquet("/root/testdata/sf0.001/events.parquet")
    hr = (
        ev.ts.astype("datetime64[us]").astype("int64") // 3_600_000_000
    )  # unit-pinned micros -> hour buckets
    lo, hi = hr.min(), hr.max()
    x = np.zeros(hi - lo + 1, dtype="int64")
    for h, c in hr.value_counts().items():
        x[h - lo] = c
    n = len(x)
    d = n * x - x.sum()
    den = float((d * d).sum())
    assert len(rows) == 6
    for r in rows:
        num = float((d[: n - r.lag] * d[r.lag:]).sum())
        assert r.n_terms == n - r.lag
        assert abs(r.r_micro - round(1e6 * num / den)) <= 1
        assert abs(r.r_micro) <= 1_000_000


def test_q242_stationary_mass_and_fixpoint(spark):
    from columnarmodeling_spark.queries import REGISTRY

    rows = REGISTRY["q242_markov_stationary"].fn(
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert len(rows) == 5
    total = sum(r.v_micro for r in rows)
    # per-term floor leaks < k micro per iteration
    assert 1_000_000 - 5 * 20 * 5 <= total <= 1_000_000
    assert all(r.v_micro > 0 for r in rows)
    # stationarity: one more exact-integer step moves nothing
    import pandas as pd

    ev = pd.read_parquet("/root/testdata/sf0.001/events.parquet")
    ev = ev.sort_values(["user_id", "ts", "event_id"])
    m = {}
    for (u), g in ev.groupby("user_id"):
        ts = list(g.event_type)
        for a, b in zip(ts, ts[1:]):
            m[(a, b)] = m.get((a, b), 0) + 1
    rt = {}
    for (a, _), c in m.items():
        rt[a] = rt.get(a, 0) + c
    v = {r.event_type: r.v_micro for r in rows}
    nxt = {}
    for (a, b), c in m.items():
        if a in v:
            nxt[b] = nxt.get(b, 0) + (v[a] * c) // rt[a]
    for s in v:
        assert abs(nxt.get(s, 0) - v[s]) <= 100, s


def test_q243_cusum_matches_sequential_recursion(spark):
    """The closed form R_k - min(0, min prefix R) must equal the
    textbook sequential recursion S_k = max(0, S_{k-1} + d_k)."""
    import numpy as np
    import pandas as pd

    from columnarmodeling_spark.queries import REGISTRY

    rows = REGISTRY["q243_cusum_changepoint"].fn(
        spark, "/root/testdata/sf0.001"
    ).collect()
    ev = pd.read_parquet("/root/testdata/sf0.001/events.parquet")
    hr = ev.ts.astype("datetime64[us]").astype("int64") // 3_600_000_000
    lo, hi = hr.min(), hr.max()
    n = hi - lo + 1
    got = {r.event_type: r for r in rows}
    for ty, g in ev.groupby("event_type"):
        x = np.zeros(n, dtype="int64")
        for h, c in (
            g.ts.astype("datetime64[us]").astype("int64") // 3_600_000_000
        ).value_counts().items():
            x[h - lo] = c
        d = n * x - x.sum()
        s, peak, peak_i = 0, 0, 0
        for i, dv in enumerate(d):
            s = max(0, s + dv)
            if s > peak:
                peak, peak_i = s, i
        r = got[ty]
        assert r.n_hours == n
        assert r.n_events == x.sum()
        assert r.peak == peak
        assert r.peak_hr == lo + peak_i


def test_q244_rolling_retention_is_survival_count(spark):
    import pandas as pd

    from columnarmodeling_spark.queries import REGISTRY

    rows = REGISTRY["q244_rolling_retention"].fn(
        spark, "/root/testdata/sf0.001"
    ).collect()
    ev = pd.read_parquet("/root/testdata/sf0.001/events.parquet")
    day = ev.ts.astype("datetime64[us]").astype("int64") // 86_400_000_000
    df = pd.DataFrame({"user_id": ev.user_id, "day": day})
    g = df.groupby("user_id")["day"]
    u = pd.DataFrame({"cohort": g.min(), "last_off": g.max() - g.min()})
    sizes = u.cohort.value_counts().to_dict()
    want_rows = 0
    for c, grp in u.groupby("cohort"):
        want_rows += grp.last_off.max() + 1
    assert len(rows) == want_rows
    by_cohort: dict = {}
    for r in rows:
        # survival definition: users whose last activity is >= offset
        want = int(
            ((u.cohort == r.cohort_day) & (u.last_off >= r.offset_day)).sum()
        )
        assert r.n_retained == want
        assert r.cohort_size == sizes[r.cohort_day]
        assert (
            r.retention_micro == 1_000_000 * r.n_retained // r.cohort_size
        )
        if r.offset_day == 0:  # everyone survives to their first day
            assert r.retention_micro == 1_000_000
        by_cohort.setdefault(r.cohort_day, []).append(
            (r.offset_day, r.n_retained)
        )
    for curve in by_cohort.values():  # monotone non-increasing
        curve.sort()
        vals = [v for _, v in curve]
        assert all(a >= b for a, b in zip(vals, vals[1:]))
        assert vals[-1] >= 1  # the max-offset user is still alive there


def test_q245_auc_matches_bruteforce_pairs(spark):
    import numpy as np
    import pandas as pd

    from columnarmodeling_spark.queries import REGISTRY

    rows = REGISTRY["q245_roc_auc"].fn(
        spark, "/root/testdata/sf0.001"
    ).collect()
    od = pd.read_parquet("/root/testdata/sf0.001/orders.parquet")
    # exact cents, half-away-from-zero (prices are positive)
    od["score"] = np.floor(od.o_totalprice * 100 + 0.5).astype("int64")
    for r in rows:
        g = od[od.o_orderpriority == r.segment]
        pos = g.loc[g.o_orderstatus == "F", "score"].to_numpy()
        neg = g.loc[g.o_orderstatus != "F", "score"].to_numpy()
        assert (r.npos, r.nneg) == (len(pos), len(neg))
        diff = pos[:, None] - neg[None, :]
        numer2 = 2 * int((diff > 0).sum()) + int((diff == 0).sum())
        assert r.auc_micro == 1_000_000 * numer2 // (
            2 * len(pos) * len(neg)
        )
        assert 0 <= r.auc_micro <= 1_000_000


def test_q246_hits_matches_integer_replay(spark):
    import numpy as np
    import pandas as pd

    from columnarmodeling_spark.queries import REGISTRY

    rows = REGISTRY["q246_hits"].fn(
        spark, "/root/testdata/sf0.001"
    ).collect()
    c = pd.read_parquet("/root/testdata/sf0.001/customer.parquet")
    ids = c.c_custkey.to_numpy()
    x = c.c_acctbal.to_numpy()
    y = (ids % 97).astype("float64") * 25.0
    edges = []
    for i in range(len(ids)):
        for j in range(len(ids)):
            if ids[i] < ids[j]:
                d = np.sqrt((x[i] - x[j]) ** 2 + (y[i] - y[j]) ** 2)
                if d < 30.0:
                    edges.append((int(ids[i]), int(ids[j])))
    nodes = sorted({u for e in edges for u in e})
    h = {u: 1_000_000 for u in nodes}
    a = {}
    for _ in range(2):
        a = {u: 0 for u in nodes}
        for s, d in edges:
            a[d] += h[s]
        m = max(a.values())
        a = {u: 1_000_000 * v // m for u, v in a.items()}
        h = {u: 0 for u in nodes}
        for s, d in edges:
            h[s] += a[d]
        m = max(h.values())
        h = {u: 1_000_000 * v // m for u, v in h.items()}
    assert len(rows) == len(nodes)
    for r in rows:
        assert r.auth_micro == a[r.id]
        assert r.hub_micro == h[r.id]
    assert max(r.auth_micro for r in rows) == 1_000_000
    assert max(r.hub_micro for r in rows) == 1_000_000


def test_q247_jsd_bounds_and_replay(spark):
    import math
    import re
    from collections import Counter

    import pandas as pd

    from columnarmodeling_spark.queries import REGISTRY

    rows = REGISTRY["q247_js_divergence"].fn(
        spark, "/root/testdata/sf0.001"
    ).collect()
    docs = pd.read_parquet("/root/testdata/sf0.001/documents.parquet")
    cs: dict = {}
    for _, row in docs.iterrows():
        tk = [t for t in re.split(r"[^a-z0-9]+", row.text.lower()) if t]
        cs.setdefault(row.source, Counter()).update(tk)
    total = Counter()
    for c in cs.values():
        total.update(c)
    topv = [
        t for t, _ in sorted(total.items(), key=lambda kv: (-kv[1], kv[0]))
    ][:400]
    tv = set(topv)
    n = {s: sum(v for t, v in c.items() if t in tv) for s, c in cs.items()}
    got = {(r.src_a, r.src_b): r.jsd_micro for r in rows}
    srcs = sorted(cs)
    assert len(rows) == len(srcs) * (len(srcs) - 1) // 2
    for ai in range(len(srcs)):
        for bi in range(ai + 1, len(srcs)):
            sa, sb = srcs[ai], srcs[bi]
            na, nb = n[sa], n[sb]
            sum_a = sum_b = 0
            for tk in topv:
                ca, cb = cs[sa].get(tk, 0), cs[sb].get(tk, 0)
                if ca + cb == 0:
                    continue
                den = ca * nb + cb * na
                if ca > 0:
                    sum_a += ca * round(1e6 * math.log(2 * ca * nb / den))
                if cb > 0:
                    sum_b += cb * round(1e6 * math.log(2 * cb * na / den))
            want = round((sum_a / na + sum_b / nb) / 2.0)
            assert abs(got[(sa, sb)] - want) <= 1
            # JSD in nats is bounded by ln 2
            assert 0 <= got[(sa, sb)] <= 693_148


def test_q248_heaps_curve_matches_pandas(spark):
    import math
    import re

    import pandas as pd

    from columnarmodeling_spark.queries import REGISTRY

    rows = REGISTRY["q248_heaps_law"].fn(
        spark, "/root/testdata/sf0.001"
    ).collect()
    docs = pd.read_parquet("/root/testdata/sf0.001/documents.parquet")
    docs = docs.sort_values("doc_id").reset_index(drop=True)
    seen: set = set()
    cum_tok, cum_voc = [], []
    nt = nv = 0
    for txt in docs.text:
        tk = [t for t in re.split(r"[^a-z0-9]+", txt.lower()) if t]
        nt += len(tk)
        for t_ in tk:
            if t_ not in seen:
                seen.add(t_)
                nv += 1
        cum_tok.append(nt)
        cum_voc.append(nv)
    n = len(docs)
    want = {min(2**i, n) for i in range(41)}
    assert {r.rank_cp for r in rows} == want
    for r in rows:
        assert r.cum_tokens == cum_tok[r.rank_cp - 1]
        assert r.cum_vocab == cum_voc[r.rank_cp - 1]
    # curves are monotone non-decreasing and vocab <= tokens
    srt = sorted(rows, key=lambda r: r.rank_cp)
    for a, b in zip(srt, srt[1:]):
        assert b.cum_tokens >= a.cum_tokens
        assert b.cum_vocab >= a.cum_vocab
    assert srt[-1].cum_vocab == len(seen)
    # fit replay on the micro-quantized points
    pts = [
        (round(1e6 * math.log(r.cum_tokens)),
         round(1e6 * math.log(r.cum_vocab)))
        for r in srt if r.cum_tokens > 0 and r.cum_vocab > 0
    ]
    k = len(pts)
    sx = sum(x for x, _ in pts)
    sy = sum(y for _, y in pts)
    sxy = sum(x * y for x, y in pts)
    sxx = sum(x * x for x, _ in pts)
    slope = (k * sxy - sx * sy) / (k * sxx - sx * sx)
    assert srt[0].beta_micro == round(1e6 * slope)
    assert srt[0].intercept_micro == round((sy - slope * sx) / k)
    # a text corpus grows vocabulary sub-linearly
    assert 0 <= srt[0].beta_micro <= 1_000_000


def test_q249_leakage_matches_bruteforce(spark):
    import re

    import pandas as pd

    from columnarmodeling_spark.queries import REGISTRY

    rows = REGISTRY["q249_split_leakage"].fn(
        spark, "/root/testdata/sf0.001"
    ).collect()
    docs = pd.read_parquet("/root/testdata/sf0.001/documents.parquet")
    sh = {}
    for d, txt in zip(docs.doc_id, docs.text):
        tk = [t for t in re.split(r"[^a-z0-9]+", txt.lower()) if t]
        sh[d] = {
            " ".join(tk[i : i + 3]) for i in range(len(tk) - 2)
        }

    def split(d):
        r = d % 10
        return "val" if r == 8 else ("test" if r == 9 else "train")

    want: dict = {}
    ids = sorted(sh)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            inter = len(sh[a] & sh[b])
            if not inter:
                continue
            un = len(sh[a] | sh[b])
            j = inter / un
            if j < 0.2:
                continue
            key = tuple(sorted((split(a), split(b))))
            e = want.setdefault(key, [0, set(), 0.0])
            e[0] += 1
            e[1] |= {a, b}
            e[2] = max(e[2], round(j, 6))
    got = {(r.split_lo, r.split_hi): r for r in rows}
    assert set(got) == set(want)
    for key, (n_pairs, ds, mx) in want.items():
        r = got[key]
        assert r.n_pairs == n_pairs
        assert r.n_docs == len(ds)
        assert abs(r.max_jaccard - mx) < 1e-9


def test_q250_simpson_replay_and_invariants(spark):
    import pandas as pd

    from columnarmodeling_spark.queries import REGISTRY

    rows = REGISTRY["q250_simpson_reversal"].fn(
        spark, "/root/testdata/sf0.001"
    ).collect()
    o = pd.read_parquet("/root/testdata/sf0.001/orders.parquet")
    c = pd.read_parquet("/root/testdata/sf0.001/customer.parquet")
    j = o.merge(c, left_on="o_custkey", right_on="c_custkey")
    j["treat"] = j.o_orderpriority.isin(["1-URGENT", "2-HIGH"]).astype(int)
    j["conv"] = (j.o_orderstatus == "F").astype(int)
    by = {r.segment: r for r in rows}
    segs = [s for s in by if s != "_ALL"]
    assert "_ALL" in by and len(segs) == j.c_mktsegment.nunique()
    strata_pos = strata_neg = 0
    for s in segs:
        g = j[j.c_mktsegment == s]
        nt = int(g.treat.sum())
        kt = int((g.treat * g.conv).sum())
        nc = int((1 - g.treat).sum())
        kc = int(((1 - g.treat) * g.conv).sum())
        r = by[s]
        assert (r.n_treat, r.k_treat, r.n_ctrl, r.k_ctrl) == (nt, kt, nc, kc)
        cross = kt * nc - kc * nt
        sign = (cross > 0) - (cross < 0)
        assert r.diff_sign == sign
        assert r.rate_treat_micro == 1_000_000 * kt // nt
        strata_pos += sign > 0
        strata_neg += sign < 0
    al = by["_ALL"]
    assert al.n_treat == sum(by[s].n_treat for s in segs)
    assert al.k_ctrl == sum(by[s].k_ctrl for s in segs)
    assert al.strata_pos == strata_pos and al.strata_neg == strata_neg
    want_rev = int(
        (al.diff_sign > 0 and strata_pos == 0 and strata_neg > 0)
        or (al.diff_sign < 0 and strata_neg == 0 and strata_pos > 0)
    )
    for r in rows:  # flag is a constant column
        assert r.reversal_flag == want_rev
        assert (r.strata_pos, r.strata_neg) == (strata_pos, strata_neg)


def test_q252_weighted_quantiles_match_bruteforce(spark):
    import json

    import pandas as pd

    from columnarmodeling_spark.queries import REGISTRY

    rows = REGISTRY["q252_weighted_quantiles"].fn(
        spark, "/root/testdata/sf0.001"
    ).collect()
    ev = pd.read_parquet("/root/testdata/sf0.001/events.parquet")
    ev["cent"] = (ev.value * 100).round().astype("int64")
    ev["w"] = [json.loads(p)["k"] for p in ev.props]
    for r in rows:
        g = ev[ev.event_type == r.event_type]
        W = int(g.w.sum())
        assert r.w_total == W
        lv = g.groupby("cent").w.sum().sort_index()
        cum = lv.cumsum()
        for q, col in ((1, r.p25_cent), (2, r.p50_cent), (3, r.p75_cent)):
            want = int(cum.index[(4 * cum >= q * W).argmax()])
            assert col == want, (r.event_type, q)
        assert r.p25_cent <= r.p50_cent <= r.p75_cent
    assert len(rows) == ev.event_type.nunique()


def test_q253_k_anonymity_replay(spark):
    import pandas as pd

    from columnarmodeling_spark.queries import REGISTRY

    rows = REGISTRY["q253_k_anonymity"].fn(
        spark, "/root/testdata/sf0.001"
    ).collect()
    d = pd.read_parquet("/root/testdata/sf0.001/documents.parquet")
    d["len_b"] = d.n_chars // 200
    sz = d.groupby(["lang", "source", "len_b"]).size()
    by = {r.lang: r for r in rows}
    langs = sorted(d.lang.unique())
    assert set(by) == set(langs) | {"_ALL"}
    for lang in langs:
        s = sz[sz.index.get_level_values(0) == lang]
        r = by[lang]
        assert r.n_groups == len(s)
        assert r.n_risky_groups == int((s < 5).sum())
        assert r.n_docs == int(s.sum())
        assert r.n_risky_docs == int(s[s < 5].sum())
        assert r.min_group_size == int(s.min())
        assert r.risk_micro == 1_000_000 * r.n_risky_docs // r.n_docs
    al = by["_ALL"]
    assert al.n_docs == len(d)
    assert al.n_groups == sum(by[x].n_groups for x in langs)
    assert al.min_group_size == min(by[x].min_group_size for x in langs)


def test_q256_wasserstein_matches_scipy_style(spark):
    import numpy as np
    import pandas as pd

    from columnarmodeling_spark.queries import REGISTRY

    sf = "/root/testdata/sf0.001"
    rows = REGISTRY["q256_wasserstein"].fn(spark, sf).collect()
    d = pd.read_parquet(f"{sf}/documents.parquet")
    srcs = sorted(d.source.unique())
    assert len(rows) == len(srcs) * (len(srcs) - 1) // 2

    def w1(a, b):
        # area between empirical CDFs over the merged level grid
        av, bv = np.sort(a), np.sort(b)
        lv = np.unique(np.concatenate([av, bv]))
        fa = np.searchsorted(av, lv, side="right") / len(av)
        fb = np.searchsorted(bv, lv, side="right") / len(bv)
        return float(np.sum(np.abs(fa - fb)[:-1] * np.diff(lv)))

    got = {(r.source_a, r.source_b): r for r in rows}
    for i, sa in enumerate(srcs):
        for sb in srcs[i + 1 :]:
            a = d[d.source == sa].n_chars.to_numpy()
            b = d[d.source == sb].n_chars.to_numpy()
            r = got[(sa, sb)]
            assert (r.n_a, r.n_b) == (len(a), len(b))
            assert abs(r.w1_milli - round(1000 * w1(a, b))) <= 1
            assert r.w1_milli >= 0


def test_q257_interarrival_replay(spark):
    import math

    import pandas as pd

    from columnarmodeling_spark.queries import REGISTRY

    sf = "/root/testdata/sf0.001"
    rows = REGISTRY["q257_interarrival"].fn(spark, sf).collect()
    ev = pd.read_parquet(f"{sf}/events.parquet")
    ev["us"] = ev.ts.astype("datetime64[us]").astype("int64")
    ev = ev.sort_values(["user_id", "event_type", "us", "event_id"])
    g = ev.groupby(["user_id", "event_type"]).us.diff().dropna()
    g = g.astype("int64")
    ty = ev.loc[g.index, "event_type"]
    assert len(rows) == ev.event_type.nunique()
    for r in rows:
        gi = g[ty == r.event_type]
        n = len(gi)
        assert r.n_gaps == n
        assert r.mean_gap_us == int(gi.sum()) // n
        gs = gi // 1_000_000
        sm, smm = int(gs.sum()), int((gs * gs).sum())
        mu = sm / n
        sd = math.sqrt((n * smm - sm * sm) / (n * (n - 1)))
        assert r.cv_micro == round(1e6 * sd / mu)
        n_over = int((gi * n > int(gi.sum())).sum())
        assert r.tail_over_mean_micro == 1_000_000 * n_over // n
        # a renewal process tail fraction lives strictly inside (0, 1)
        assert 0 < r.tail_over_mean_micro < 1_000_000


def test_q259_loo_cv_matches_numpy(spark):
    import math
    import re

    import pandas as pd

    from columnarmodeling_spark.queries import REGISTRY

    rows = REGISTRY["q259_loo_cv_ols"].fn(
        spark, "/root/testdata/sf0.001"
    ).collect()
    docs = pd.read_parquet("/root/testdata/sf0.001/documents.parquet")
    per = {}
    for _, doc in docs.iterrows():
        x = len([t for t in re.split(r"[^a-z0-9]+", doc.text.lower()) if t])
        y = int(doc.n_chars)
        n, sx, sy, sxy, sxx, syy = per.get(doc.lang, (0,) * 6)
        per[doc.lang] = (
            n + 1, sx + x, sy + y, sxy + x * y, sxx + x * x, syy + y * y,
        )
    tot = [sum(v[i] for v in per.values()) for i in range(5)]
    assert len(rows) == len(per)
    for r in rows:
        n, sx, sy, sxy, sxx, syy = per[r.lang]
        rn, rsx, rsy, rsxy, rsxx = (
            tot[0] - n, tot[1] - sx, tot[2] - sy, tot[3] - sxy, tot[4] - sxx,
        )
        b = (float(rn) * rsxy - float(rsx) * rsy) / (
            float(rn) * rsxx - float(rsx) * rsx
        )
        a = (float(rsy) - b * rsx) / rn
        mse = (
            float(syy) - 2.0 * a * sy - 2.0 * b * sxy
            + 2.0 * a * b * sx + a * a * n + b * b * sxx
        ) / n
        assert r.n_held == n
        assert r.slope_micro == round(1000000.0 * b)
        assert r.intercept_micro == round(1000000.0 * a)
        assert r.rmse_milli == round(1000.0 * math.sqrt(max(mse, 0.0)))
        # chars-per-token slope from a real corpus is positive
        assert r.slope_micro > 0


def test_q260_mi_matches_python_contingency(spark):
    import math
    import re
    from collections import Counter

    import pandas as pd

    from columnarmodeling_spark.queries import REGISTRY
    from columnarmodeling_spark.queries.llm_text import _MI_TOP_K

    rows = REGISTRY["q260_token_source_mi"].fn(
        spark, "/root/testdata/sf0.001"
    ).collect()
    docs = pd.read_parquet("/root/testdata/sf0.001/documents.parquet")
    df = Counter()
    cell = Counter()
    n_s = Counter()
    for _, doc in docs.iterrows():
        n_s[doc.source] += 1
        for tok in set(
            t for t in re.split(r"[^a-z0-9]+", doc.text.lower()) if t
        ):
            df[tok] += 1
            cell[(tok, doc.source)] += 1
    n = len(docs)
    topk = sorted(df.items(), key=lambda kv: (-kv[1], kv[0]))[:_MI_TOP_K]
    assert len(rows) == len(topk)
    want = {}
    for tok, dfi in topk:
        acc = 0
        for src, ns in n_s.items():
            c1 = cell.get((tok, src), 0)
            if c1 > 0:
                acc += c1 * round(
                    1000000.0 * math.log((float(c1) * n) / (float(dfi) * ns))
                )
            c0 = ns - c1
            if c0 > 0:
                acc += c0 * round(
                    1000000.0
                    * math.log((float(c0) * n) / (float(n - dfi) * ns))
                )
        want[tok] = (dfi, round(float(acc) / n))
    for r in rows:
        dfi, mi = want[r.tok]
        assert (r.df, r.mi_micro) == (dfi, mi), r.tok
        # MI is non-negative up to the micro-quantization slack
        assert r.mi_micro >= -1


def test_q261_unseen_mass_matches_python_counts(spark):
    import re
    from collections import Counter

    import pandas as pd

    from columnarmodeling_spark.queries import REGISTRY

    rows = REGISTRY["q261_unseen_mass"].fn(
        spark, "/root/testdata/sf0.001"
    ).collect()
    docs = pd.read_parquet("/root/testdata/sf0.001/documents.parquet")
    counts = {}
    for _, doc in docs.iterrows():
        c = counts.setdefault(doc.source, Counter())
        for t in re.split(r"[^a-z0-9]+", doc.text.lower()):
            if t:
                c[t] += 1
    assert len(rows) == len(counts)
    for r in rows:
        c = counts[r.source]
        n, v = sum(c.values()), len(c)
        f1 = sum(1 for x in c.values() if x == 1)
        f2 = sum(1 for x in c.values() if x == 2)
        assert (r.n_tokens, r.v_types, r.f1, r.f2) == (n, v, f1, f2)
        assert r.chao1_milli == round(
            1000.0 * (v + float(f1) * (f1 - 1) / (2.0 * (f2 + 1)))
        )
        assert r.unseen_micro == round(1000000.0 * f1 / n)
        # the asymptote can only exceed what was observed
        assert r.chao1_milli >= 1000 * v
        assert 0 <= r.unseen_micro <= 1000000


def test_q262_hellinger_matches_python_pairs(spark):
    import math
    from collections import Counter
    import re

    import pandas as pd

    from columnarmodeling_spark.queries import REGISTRY

    rows = REGISTRY["q262_hellinger"].fn(
        spark, "/root/testdata/sf0.001"
    ).collect()
    docs = pd.read_parquet("/root/testdata/sf0.001/documents.parquet")
    counts = {}
    for _, doc in docs.iterrows():
        c = counts.setdefault(doc.source, Counter())
        for t in re.split(r"[^a-z0-9]+", doc.text.lower()):
            if t:
                c[t] += 1
    srcs = sorted(counts)
    npairs = len(srcs) * (len(srcs) - 1) // 2
    assert len(rows) == npairs
    tot = {s: sum(c.values()) for s, c in counts.items()}
    for r in rows:
        ca, cb = counts[r.source_a], counts[r.source_b]
        na, nb = tot[r.source_a], tot[r.source_b]
        assert (r.n_a, r.n_b) == (na, nb)
        bc = sum(
            round(
                1000000000000.0
                * math.sqrt((float(ca[t_]) * cb[t_]) / (float(na) * nb))
            )
            for t_ in ca
            if t_ in cb
        )
        assert r.bc_micro == round(float(bc) / 1000000.0)
        assert r.hellinger_micro == round(
            1000000.0 * math.sqrt(max(1.0 - float(bc) / 1e12, 0.0))
        )
        # a bounded metric: BC and H both live in [0, 1]
        assert 0 <= r.bc_micro <= 1000001
        assert 0 <= r.hellinger_micro <= 1000000


def test_q263_coverage_matches_python_cumsum(spark):
    import re
    from collections import Counter

    import pandas as pd

    from columnarmodeling_spark.queries import REGISTRY
    from columnarmodeling_spark.queries.llm_text import _COVERAGE_KS

    rows = REGISTRY["q263_vocab_coverage"].fn(
        spark, "/root/testdata/sf0.001"
    ).collect()
    docs = pd.read_parquet("/root/testdata/sf0.001/documents.parquet")
    c = Counter(
        t
        for txt in docs.text
        for t in re.split(r"[^a-z0-9]+", txt.lower())
        if t
    )
    n, v = sum(c.values()), len(c)
    ranked = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))
    cum = []
    acc = 0
    for _, cnt in ranked:
        acc += cnt
        cum.append(acc)
    assert len(rows) == len(_COVERAGE_KS)
    prev = -1
    for r in sorted(rows, key=lambda r: r.k):
        assert (r.n_vocab, r.n_tokens) == (v, n)
        want = cum[min(r.k, v) - 1]
        assert r.cum_tokens == want
        assert r.coverage_micro == round(1000000.0 * want / n)
        # coverage is monotone in the budget and ends at 100%
        assert r.coverage_micro >= prev
        prev = r.coverage_micro
        if r.k >= v:
            assert r.coverage_micro == 1000000


def _emb_cov(emb):
    """Quantized covariance replay shared by the q264/q267 tests:
    eq = round(1e5 x) int64, C_ij = (G_ij/n - (s_i/n)(s_j/n))/1e10."""
    n, d = len(emb), len(emb[0])
    eq = [[round(100000.0 * float(x)) for x in row] for row in emb]
    g = [[sum(eq[r][i] * eq[r][j] for r in range(n)) for j in range(d)]
         for i in range(d)]
    s = [sum(eq[r][i] for r in range(n)) for i in range(d)]
    return [
        [(g[i][j] / n - (s[i] / n) * (s[j] / n)) / 10000000000.0
         for j in range(d)]
        for i in range(d)
    ], n, d


def test_q264_pca_power_matches_integer_replay(spark):
    import pandas as pd

    from columnarmodeling_spark.queries import REGISTRY
    from columnarmodeling_spark.queries.llm_similarity import (
        _PCA_ITERS,
        _PCA_UNIT,
    )

    rows = REGISTRY["q264_pca_power"].fn(
        spark, "/root/testdata/sf0.001"
    ).collect()
    emb = pd.read_parquet(
        "/root/testdata/sf0.001/embeddings.parquet"
    ).embedding.tolist()
    c, n, d = _emb_cov(emb)
    v = [_PCA_UNIT] * d
    for _ in range(_PCA_ITERS):
        w = [
            sum(round(c[i][j] * v[j]) for j in range(d)) for i in range(d)
        ]
        m = max(abs(x) for x in w)
        v = [
            (abs(_PCA_UNIT * x) // m) * (1 if x >= 0 else -1) for x in w
        ]
    num = sum(
        round(c[i][j] * v[i] * v[j]) for i in range(d) for j in range(d)
    )
    den = sum(x * x for x in v)
    tr_pico = sum(round(1000000000000.0 * c[i][i]) for i in range(d))
    assert len(rows) == d
    got = {r.dim: r for r in rows}
    for i in range(d):
        r = got[i + 1]
        assert r.v_micro == v[i], i
        assert r.lambda_nano == round(1000000000.0 * num / den)
        assert r.share_micro == round(
            1000000.0 * (num / den) / (tr_pico / 1000000000000.0)
        )
    # the iterate is max-normalized; the top eigenpair is non-trivial
    assert max(abs(r.v_micro) for r in rows) == _PCA_UNIT
    assert rows[0].lambda_nano > 0
    assert 0 < rows[0].share_micro < 1000000


def test_q267_participation_ratio_matches_replay(spark):
    import math

    import pandas as pd

    from columnarmodeling_spark.queries import REGISTRY

    def half_up(x):
        # both engines round half AWAY from zero; Python round() is
        # half-to-even, which diverges on the exact .5 ties the 4096
        # squared-cell terms occasionally hit
        return int(math.floor(x + 0.5)) if x >= 0 else -int(
            math.floor(-x + 0.5)
        )

    (row,) = REGISTRY["q267_participation_ratio"].fn(
        spark, "/root/testdata/sf0.001"
    ).collect()
    emb = pd.read_parquet(
        "/root/testdata/sf0.001/embeddings.parquet"
    ).embedding.tolist()
    c, n, d = _emb_cov(emb)
    tr_pico = sum(half_up(1000000000000.0 * c[i][i]) for i in range(d))
    tr2_atto = sum(
        half_up(1000000000000000000.0 * c[i][j] * c[i][j])
        for i in range(d)
        for j in range(d)
    )
    assert (row.n, row.d) == (n, d)
    assert row.tr_pico == tr_pico
    assert row.tr2_atto == tr2_atto
    assert row.pr_milli == round(
        1000.0
        * (tr_pico / 1000000000000.0)
        * (tr_pico / 1000000000000.0)
        / (tr2_atto / 1000000000000000000.0)
    )
    # PR lives in [1, d] by Cauchy-Schwarz on the spectrum
    assert 1000 <= row.pr_milli <= 1000 * d


def test_q265_fisher_matches_replay(spark):
    from collections import defaultdict

    import pandas as pd

    from columnarmodeling_spark.queries import REGISTRY

    rows = REGISTRY["q265_fisher_ratio"].fn(
        spark, "/root/testdata/sf0.001"
    ).collect()
    df = pd.read_parquet("/root/testdata/sf0.001/embeddings.parquet")
    d = len(df.embedding.iloc[0])
    s = defaultdict(lambda: [0] * d)
    nc = defaultdict(int)
    ssq = defaultdict(int)
    for _, r in df.iterrows():
        lab = int(r.label)
        nc[lab] += 1
        for i, x in enumerate(r.embedding):
            x = float(x)
            s[lab][i] += round(1000000.0 * x)
            ssq[lab] += round(10000000000.0 * x * x)
    gs = [sum(s[c][i] for c in s) for i in range(d)]
    gn = sum(nc.values())
    per = {}
    for c in s:
        pico = sum(
            round(
                1000000000000.0
                * (s[c][i] / nc[c] / 1000000.0)
                * (s[c][i] / nc[c] / 1000000.0)
            )
            for i in range(d)
        )
        dpico = sum(
            round(
                1000000000000.0
                * ((s[c][i] / nc[c] - gs[i] / gn) / 1000000.0)
                * ((s[c][i] / nc[c] - gs[i] / gn) / 1000000.0)
            )
            for i in range(d)
        )
        w = round(
            1000.0
            * (ssq[c] / 10000000000.0 - nc[c] * (pico / 1000000000000.0))
        )
        b = round(1000.0 * nc[c] * (dpico / 1000000000000.0))
        per[str(c)] = (nc[c], w, b)
    per["_ALL"] = (
        gn,
        sum(v[1] for k, v in per.items() if k != "_ALL"),
        sum(v[2] for k, v in per.items() if k != "_ALL"),
    )
    assert len(rows) == len(per)
    for r in rows:
        n, w, b = per[r.label_s]
        assert (r.n, r.within_milli, r.between_milli) == (n, w, b), r.label_s
        assert r.fisher_micro == round(1000000.0 * b / w)
        # scatter traces are non-negative; within is strictly positive
        assert r.within_milli > 0
        assert r.between_milli >= 0


def test_q266_anisotropy_matches_replay(spark):
    import math
    from collections import defaultdict

    import pandas as pd

    from columnarmodeling_spark.queries import REGISTRY

    rows = REGISTRY["q266_anisotropy"].fn(
        spark, "/root/testdata/sf0.001"
    ).collect()
    df = pd.read_parquet("/root/testdata/sf0.001/embeddings.parquet")
    d = len(df.embedding.iloc[0])
    su = defaultdict(lambda: [0] * d)
    nc = defaultdict(int)
    for _, r in df.iterrows():
        xs = [float(x) for x in r.embedding]
        n2q = sum(round(10000000000.0 * x * x) for x in xs)
        nrm = math.sqrt(n2q / 10000000000.0)
        lab = str(int(r.label))
        nc[lab] += 1
        for i, x in enumerate(xs):
            su[lab][i] += round(1000000.0 * (x / nrm))
    su["_ALL"] = [sum(su[c][i] for c in list(su)) for i in range(d)]
    nc["_ALL"] = sum(nc.values())
    want = {}
    for c, n in nc.items():
        if n <= 1:
            continue
        pico = sum(
            round(
                1000000000000.0
                * (su[c][i] / n / 1000000.0)
                * (su[c][i] / n / 1000000.0)
            )
            for i in range(d)
        )
        want[c] = (
            n,
            pico,
            round(
                1000000.0 * (n * (pico / 1000000000000.0) - 1.0) / (n - 1)
            ),
        )
    assert len(rows) == len(want)
    for r in rows:
        n, pico, mc = want[r.label_s]
        assert (r.n, r.m2_pico, r.mean_cos_micro) == (n, pico, mc), r.label_s
        # a cosine mean lives in [-1, 1]
        assert -1000000 <= r.mean_cos_micro <= 1000000


def test_q270_js_shrinkage_matches_replay(spark):
    import re

    import pandas as pd

    from columnarmodeling_spark.queries import REGISTRY

    rows = REGISTRY["q270_js_shrinkage"].fn(
        spark, "/root/testdata/sf0.001"
    ).collect()
    docs = pd.read_parquet("/root/testdata/sf0.001/documents.parquet")
    per = {}
    for _, doc in docs.iterrows():
        x = len([t for t in re.split(r"[^a-z0-9]+", doc.text.lower()) if t])
        n, sx, sxx = per.get(doc.source, (0, 0, 0))
        per[doc.source] = (n + 1, sx + x, sxx + x * x)
    k = len(per)
    nn = sum(v[0] for v in per.values())
    st = sum(v[1] for v in per.values())
    sst = sum(v[2] for v in per.values())
    swb_milli = sum(
        round(1000.0 * (float(sx) * sx / n)) for n, sx, _ in per.values()
    )
    vw = (float(sst) - float(swb_milli) / 1000.0) / (nn - k)
    tau2 = max(
        (float(swb_milli) / 1000.0 - (float(st) * st / nn)) / (k - 1)
        - (float(sst) - float(swb_milli) / 1000.0) / (nn - k),
        0.0,
    ) / (float(nn) / k)
    mu = float(st) / nn
    assert len(rows) == k
    for r in rows:
        n, sx, _ = per[r.source]
        wgt = tau2 / (tau2 + vw / n)
        mu_i = float(sx) / n
        assert r.n_docs == n
        assert r.mean_milli == round(1000.0 * mu_i)
        assert r.weight_micro == round(1000000.0 * wgt)
        assert r.shrunk_milli == round(1000.0 * (mu + wgt * (mu_i - mu)))
        # shrinkage moves every group mean TOWARD the grand mean
        gm = round(1000.0 * mu)
        assert min(r.mean_milli, gm) - 1 <= r.shrunk_milli <= max(
            r.mean_milli, gm
        ) + 1
        assert 0 <= r.weight_micro <= 1000000


def test_q271_capture_recapture_matches_replay(spark):
    import hashlib

    import pandas as pd

    from columnarmodeling_spark.queries import REGISTRY

    (row,) = REGISTRY["q271_capture_recapture"].fn(
        spark, "/root/testdata/sf0.001"
    ).collect()
    docs = pd.read_parquet("/root/testdata/sf0.001/documents.parquet")
    flags = {}
    for _, doc in docs.iterrows():
        f = hashlib.md5(doc.text.encode()).hexdigest()
        a, b = flags.get(f, (0, 0))
        flags[f] = (
            a | (doc.doc_id % 3 == 0),
            b | (doc.doc_id % 2 == 0),
        )
    v = len(flags)
    n1 = sum(a for a, _ in flags.values())
    n2 = sum(b for _, b in flags.values())
    m = sum(a and b for a, b in flags.values())
    assert (row.n1, row.n2, row.m, row.v_true) == (n1, n2, m, v)
    assert row.lp_milli == round(1000.0 * (float(n1) * n2) / m)
    chap = (float(n1 + 1) * (n2 + 1)) / (m + 1) - 1.0
    assert row.chapman_milli == round(1000.0 * chap)
    assert row.chapman_err_micro == round(1000000.0 * (chap - v) / v)
    # the overlap can never exceed either sample
    assert m <= min(n1, n2)
    # both estimators are at least the observed union lower bound pieces
    assert row.lp_milli >= 1000 * m


def test_q273_laplacian_matches_integer_replay(spark):
    import numpy as np
    import pandas as pd

    from columnarmodeling_spark.queries import REGISTRY

    (row,) = REGISTRY["q273_laplacian_lambda"].fn(
        spark, "/root/testdata/sf0.001"
    ).collect()
    c = pd.read_parquet("/root/testdata/sf0.001/customer.parquet")
    ids = c.c_custkey.to_numpy()
    x = c.c_acctbal.to_numpy()
    y = (ids % 97).astype("float64") * 25.0
    edges = []
    for i in range(len(ids)):
        for j in range(len(ids)):
            if ids[i] < ids[j]:
                d = np.sqrt((x[i] - x[j]) ** 2 + (y[i] - y[j]) ** 2)
                if d < 30.0:
                    edges.append((int(ids[i]), int(ids[j])))
    und = edges + [(b, a) for a, b in edges]
    nodes = sorted({u for e in und for u in e})
    deg = {u: 0 for u in nodes}
    for s, _ in und:
        deg[s] += 1
    v = {
        u: (1 if u % 2 == 0 else -1) * (1_000_000 + u % 997)
        for u in nodes
    }
    for _ in range(3):
        nb = {u: 0 for u in nodes}
        for s, d in und:
            nb[s] += v[d]
        w = {u: deg[u] * v[u] - nb[u] for u in nodes}
        m = max(max(abs(t) for t in w.values()), 1)
        v = {
            u: (abs(1_000_000 * t) // m) * (1 if t >= 0 else -1)
            for u, t in w.items()
        }
    nb = {u: 0 for u in nodes}
    for s, d in und:
        nb[s] += v[d]
    num = sum(v[u] * (deg[u] * v[u] - nb[u]) for u in nodes)
    den = sum(t * t for t in v.values())
    assert (row.n_nodes, row.n_edges, row.max_deg) == (
        len(nodes),
        len(edges),
        max(deg.values()),
    )
    assert row.lambda_max_milli == round(1000.0 * num / den)
    # Rayleigh on a PSD matrix is non-negative; Gershgorin caps at 2*max_deg
    assert 0 <= row.lambda_max_milli <= 2000 * row.max_deg
    # a connected non-bipartite-free graph pushes lambda past max_deg + 1
    assert row.lambda_max_milli >= 1000 * row.max_deg


def test_q274_skew_profile_matches_replay(spark):
    from collections import Counter

    import pandas as pd

    from columnarmodeling_spark.queries import REGISTRY
    from columnarmodeling_spark.queries.analytics import _SKEW_TOP

    rows = REGISTRY["q274_join_skew_profile"].fn(
        spark, "/root/testdata/sf0.001"
    ).collect()
    ev = pd.read_parquet("/root/testdata/sf0.001/events.parquet")
    kc = Counter(int(u) for u in ev.user_id)
    n = sum(kc.values())
    k = len(kc)
    mx = max(kc.values())
    asc = sorted(kc.items(), key=lambda kv: (kv[1], kv[0]))
    p99 = asc[(99 * k + 99) // 100 - 1][1]
    top = sorted(kc.items(), key=lambda kv: (-kv[1], kv[0]))[:_SKEW_TOP]
    assert len(rows) == min(_SKEW_TOP, k)
    for r in rows:
        u, c = top[r.rank - 1]
        assert (r.user_id, r.cnt) == (u, c)
        assert r.share_micro == round(1000000.0 * c / n)
        assert (r.n_events, r.n_keys, r.p99_cnt) == (n, k, p99)
        assert r.skew_milli == round(1000.0 * mx * k / n)
        # max/mean skew is at least 1 (the max can't be under the mean)
        assert r.skew_milli >= 1000
        assert r.p99_cnt <= mx


def test_q275_mmr_matches_greedy_replay(spark):
    import math

    import pandas as pd

    from columnarmodeling_spark.queries import REGISTRY
    from columnarmodeling_spark.queries.llm_similarity import (
        _MMR_K,
        _MMR_LAM3,
        _MMR_LAM7,
    )

    rows = REGISTRY["q275_mmr_selection"].fn(
        spark, "/root/testdata/sf0.001"
    ).collect()
    df = pd.read_parquet("/root/testdata/sf0.001/embeddings.parquet")
    eq = {
        int(r.vec_id): [round(1000000.0 * float(x)) for x in r.embedding]
        for _, r in df.iterrows()
    }
    lab0 = [int(r.vec_id) for _, r in df.iterrows() if int(r.label) == 0]
    d = len(next(iter(eq.values())))
    n0 = len(lab0)
    q = [
        round(float(sum(eq[v][i] for v in lab0)) / n0) for i in range(d)
    ]
    n2 = {v: sum(e * e for e in es) for v, es in eq.items()}
    qn2 = sum(e * e for e in q)

    def cos(a, b, na, nb):
        dot = sum(x * y for x, y in zip(a, b))
        return round(
            1000000.0 * float(dot) / (math.sqrt(na) * math.sqrt(nb))
        )

    rel = {v: cos(es, q, n2[v], qn2) for v, es in eq.items()}
    first = min(eq, key=lambda v: (-rel[v], v))
    picks = [(1, first, rel[first], 0)]
    ms = {}
    for rank in range(2, _MMR_K + 1):
        new = picks[-1][1]
        for v in eq:
            c = cos(eq[v], eq[new], n2[v], n2[new])
            ms[v] = max(ms.get(v, -2000000), c)
        chosen = {p[1] for p in picks}
        nxt = min(
            (v for v in eq if v not in chosen),
            key=lambda v: (-(_MMR_LAM7 * rel[v] - _MMR_LAM3 * ms[v]), v),
        )
        picks.append((rank, nxt, rel[nxt], ms[nxt]))
    assert len(rows) == _MMR_K
    for r, (rank, v, rl, m) in zip(sorted(rows, key=lambda x: x.rank),
                                   picks):
        assert (r.rank, r.vec_id, r.rel_micro, r.maxsim_micro) == (
            rank, v, rl, m,
        )
        assert r.mmr_score == _MMR_LAM7 * rl - _MMR_LAM3 * m
    # the selected set is diverse: no pick is a near-clone of an earlier one
    for r in rows:
        if r.rank > 1:
            assert r.maxsim_micro < 999000


def test_q276_brier_decomposition_matches_replay(spark):
    from collections import Counter, defaultdict

    import pandas as pd

    from columnarmodeling_spark.queries import REGISTRY

    (row,) = REGISTRY["q276_brier_decomposition"].fn(
        spark, "/root/testdata/sf0.001"
    ).collect()
    ev = pd.read_parquet("/root/testdata/sf0.001/events.parquet")
    clicks = Counter(
        int(u) for u, t_ in zip(ev.user_id, ev.event_type) if t_ == "click"
    )
    buys = Counter(
        int(u)
        for u, t_ in zip(ev.user_id, ev.event_type)
        if t_ == "purchase"
    )
    users = sorted({int(u) for u in ev.user_id})
    bins = defaultdict(lambda: [0, 0])
    for u in users:
        c = min(20, clicks.get(u, 0))
        o = 1 if buys.get(u, 0) > clicks.get(u, 0) else 0
        bins[c][0] += 1
        bins[c][1] += o
    nn = sum(n for n, _ in bins.values())
    ss = sum(s for _, s in bins.values())
    bq = sum(
        n * c * c - 40 * c * s + 400 * s for c, (n, s) in bins.items()
    )
    rel_q = sum(
        round(
            1000000.0
            * (float(c * n - 20 * s) * (c * n - 20 * s))
            / (400.0 * n)
        )
        for c, (n, s) in bins.items()
    )
    res_q = sum(
        round(
            1000000.0
            * n
            * (float(s) / n - float(ss) / nn)
            * (float(s) / n - float(ss) / nn)
        )
        for c, (n, s) in bins.items()
    )
    assert row.n_users == nn
    assert row.base_rate_micro == round(1000000.0 * ss / nn)
    assert row.brier_micro == round(1000000.0 * bq / (400.0 * nn))
    assert row.reliability_micro == round(float(rel_q) / nn)
    assert row.resolution_micro == round(float(res_q) / nn)
    assert row.uncertainty_micro == round(
        1000000.0 * (float(ss) / nn) * (1.0 - float(ss) / nn)
    )
    # the Murphy identity holds up to per-bin quantization slack
    assert (
        abs(
            row.brier_micro
            - (
                row.reliability_micro
                - row.resolution_micro
                + row.uncertainty_micro
            )
        )
        <= 25
    )
    # each component is a non-negative variance-like quantity
    assert row.reliability_micro >= 0
    assert row.resolution_micro >= 0
    assert 0 <= row.uncertainty_micro <= 250000


def test_q277_mcnemar_matches_replay(spark):
    import re

    import pandas as pd

    from columnarmodeling_spark.queries import REGISTRY

    (row,) = REGISTRY["q277_mcnemar"].fn(
        spark, "/root/testdata/sf0.001"
    ).collect()
    docs = pd.read_parquet("/root/testdata/sf0.001/documents.parquet")
    ma = {
        "en": {"the", "and", "of", "row", "table"},
        "es": {"el", "la", "de", "fila", "tabla"},
        "zh": {"zh", "biao", "hang", "lie", "shuju"},
    }
    mb = {"en": {"the"}, "es": {"de"}, "zh": {"zh"}}

    def guess(tk, m):
        s = {c: sum(1 for t_ in tk if t_ in m[c]) for c in ("en", "es", "zh")}
        if s["en"] >= s["es"] and s["en"] >= s["zh"]:
            return "en"
        return "es" if s["es"] >= s["zh"] else "zh"

    br = bw = ao = bo = 0
    for _, doc in docs.iterrows():
        tk = [t for t in re.split(r"[^a-z0-9]+", doc.text.lower()) if t]
        ga, gb = guess(tk, ma), guess(tk, mb)
        a_ok, b_ok = ga == doc.lang, gb == doc.lang
        br += a_ok and b_ok
        bw += (not a_ok) and (not b_ok)
        ao += a_ok and not b_ok
        bo += b_ok and not a_ok
    n = len(docs)
    assert (row.n, row.both_right, row.both_wrong, row.a_only,
            row.b_only) == (n, br, bw, ao, bo)
    assert row.acc_a_milli == round(1000.0 * (br + ao) / n)
    assert row.acc_b_milli == round(1000.0 * (br + bo) / n)
    want = (
        round(1000.0 * (float(ao - bo) * (ao - bo)) / (ao + bo))
        if ao + bo > 0
        else 0
    )
    assert row.mcnemar_milli == want
    # the richer marker set can only tie or beat its own subset rule
    assert row.acc_a_milli >= row.acc_b_milli


def test_q278_cochran_q_matches_replay(spark):
    import re

    import pandas as pd

    from columnarmodeling_spark.queries import REGISTRY

    (row,) = REGISTRY["q278_cochran_q"].fn(
        spark, "/root/testdata/sf0.001"
    ).collect()
    docs = pd.read_parquet("/root/testdata/sf0.001/documents.parquet")
    rules = [
        {
            "en": {"the", "and", "of", "row", "table"},
            "es": {"el", "la", "de", "fila", "tabla"},
            "zh": {"zh", "biao", "hang", "lie", "shuju"},
        },
        {
            "en": {"the", "and", "of"},
            "es": {"el", "la", "de"},
            "zh": {"zh", "biao", "hang"},
        },
        {"en": {"the"}, "es": {"de"}, "zh": {"zh"}},
    ]

    def guess(tk, m):
        s = {c: sum(1 for t_ in tk if t_ in m[c]) for c in ("en", "es", "zh")}
        if s["en"] >= s["es"] and s["en"] >= s["zh"]:
            return "en"
        return "es" if s["es"] >= s["zh"] else "zh"

    g = [0, 0, 0]
    s1 = s2 = 0
    for _, doc in docs.iterrows():
        tk = [t for t in re.split(r"[^a-z0-9]+", doc.text.lower()) if t]
        r_i = 0
        for j, m in enumerate(rules):
            ok = guess(tk, m) == doc.lang
            g[j] += ok
            r_i += ok
        s1 += r_i
        s2 += r_i * r_i
    assert (row.n, row.g_a, row.g_b, row.g_c, row.s1, row.s2) == (
        len(docs), g[0], g[1], g[2], s1, s2,
    )
    want = (
        round(
            1000.0
            * (2.0 * (3.0 * (g[0] ** 2 + g[1] ** 2 + g[2] ** 2) - float(s1) * s1))
            / (3 * s1 - s2)
        )
        if 3 * s1 - s2 > 0
        else 0
    )
    assert row.cochran_q_milli == want
    # Q is non-negative by construction (it is a scaled variance)
    assert row.cochran_q_milli >= 0
    # per-rule totals are bounded by n and the marker-set nesting makes
    # rule A at least as accurate as its subsets on this corpus
    assert 0 <= row.g_c <= row.n and 0 <= row.g_a <= row.n


def test_q279_cohen_kappa_matches_replay(spark):
    import re
    from collections import Counter

    import pandas as pd

    from columnarmodeling_spark.queries import REGISTRY

    (row,) = REGISTRY["q279_cohen_kappa"].fn(
        spark, "/root/testdata/sf0.001"
    ).collect()
    docs = pd.read_parquet("/root/testdata/sf0.001/documents.parquet")
    ma = {
        "en": {"the", "and", "of", "row", "table"},
        "es": {"el", "la", "de", "fila", "tabla"},
        "zh": {"zh", "biao", "hang", "lie", "shuju"},
    }
    mc = {"en": {"the"}, "es": {"de"}, "zh": {"zh"}}

    def guess(tk, m):
        s = {c: sum(1 for t_ in tk if t_ in m[c]) for c in ("en", "es", "zh")}
        if s["en"] >= s["es"] and s["en"] >= s["zh"]:
            return "en"
        return "es" if s["es"] >= s["zh"] else "zh"

    agree = 0
    ca, cc = Counter(), Counter()
    for _, doc in docs.iterrows():
        tk = [t for t in re.split(r"[^a-z0-9]+", doc.text.lower()) if t]
        ga, gc = guess(tk, ma), guess(tk, mc)
        agree += ga == gc
        ca[ga] += 1
        cc[gc] += 1
    n = len(docs)
    pe_num = sum(ca[c] * cc[c] for c in ("en", "es", "zh"))
    assert (row.n, row.agree, row.pe_num) == (n, agree, pe_num)
    if n * n > pe_num:
        want = round(1000.0 * (float(n) * agree - pe_num) / (float(n) * n - pe_num))
    else:
        want = 1000
    assert row.kappa_milli == want
    # kappa cannot exceed perfect agreement
    assert row.kappa_milli <= 1000


def test_q281_bh_fdr_matches_replay(spark):
    import math
    from collections import Counter

    import pandas as pd

    from columnarmodeling_spark.queries import REGISTRY

    rows = REGISTRY["q281_bh_fdr"].fn(
        spark, "/root/testdata/sf0.001"
    ).collect()
    docs = pd.read_parquet("/root/testdata/sf0.001/documents.parquet")
    per = {}
    for _, doc in docs.iterrows():
        bkt = doc.lang if doc.lang in ("en", "zh") else "ot"
        per.setdefault(doc.source, Counter())[bkt] += 1
    t1 = sum(c["en"] for c in per.values())
    t2 = sum(c["zh"] for c in per.values())
    t3 = sum(c["ot"] for c in per.values())
    m = len(per)
    n = t1 + t2 + t3
    recs = []
    for src, c in per.items():
        a = (c["en"], c["zh"], c["ot"])
        ra = sum(a)
        rb = n - ra
        chi = 0.0
        for o, ct, rt in [
            (a[0], t1, ra), (a[1], t2, ra), (a[2], t3, ra),
            (t1 - a[0], t1, rb), (t2 - a[1], t2, rb), (t3 - a[2], t3, rb),
        ]:
            e = float(rt) * ct / n
            chi += (o - e) * (o - e) / e
        chi_micro = round(1000000.0 * chi)
        p_micro = round(1000000.0 * math.exp(-chi_micro / 2000000.0))
        recs.append((src, chi_micro, p_micro))
    recs.sort(key=lambda r: (r[2], r[0]))
    kmax = 0
    for k, (_, _, pm) in enumerate(recs, 1):
        if pm * m <= 50000 * k:
            kmax = k
    assert len(rows) == m
    for r, (src, cm, pm) in zip(rows, recs):
        assert (r.source, r.chi2_micro, r.p_micro, r.rejected) == (
            src, cm, pm, r.k <= kmax,
        )
    # the step-up property: every rejected rank precedes every kept one
    flags = [r.rejected for r in rows]
    assert flags == sorted(flags, reverse=True)


def test_q282_mantel_haenszel_matches_replay(spark):
    import pandas as pd

    from columnarmodeling_spark.queries import REGISTRY

    (row,) = REGISTRY["q282_mantel_haenszel"].fn(
        spark, "/root/testdata/sf0.001"
    ).collect()
    docs = pd.read_parquet("/root/testdata/sf0.001/documents.parquet")
    cells = {}
    for _, doc in docs.iterrows():
        en, lng = doc.lang == "en", doc.n_chars >= 300
        k = (en and lng, en and not lng, (not en) and lng,
             (not en) and not lng)
        c = cells.setdefault(doc.source, [0, 0, 0, 0])
        c[k.index(True)] += 1
    sum_a = sum_ad = sum_bc = sum_e = sum_v = 0
    for a, b, c_, d in cells.values():
        n = a + b + c_ + d
        sum_a += a
        sum_ad += round(1000000.0 * a * d / n)
        sum_bc += round(1000000.0 * b * c_ / n)
        sum_e += round(1000000.0 * (a + b) * (a + c_) / n)
        if n > 1:
            sum_v += round(
                1000000.0 * (float(a + b) * (c_ + d))
                * (float(a + c_) * (b + d))
                / ((float(n) * n) * (n - 1))
            )
    assert (row.n_strata, row.sum_a, row.sum_ad_micro, row.sum_bc_micro) == (
        len(cells), sum_a, sum_ad, sum_bc,
    )
    want_or = round(1000.0 * sum_ad / sum_bc) if sum_bc > 0 else 0
    diff = 1000000 * sum_a - sum_e
    want_chi = (
        round(float(diff) * diff / 1000000.0 / sum_v) if sum_v > 0 else 0
    )
    assert (row.or_mh_milli, row.cmh_chi2_milli) == (want_or, want_chi)
    # the pooled OR is positive whenever any discordant mass exists
    assert row.or_mh_milli >= 0 and row.cmh_chi2_milli >= 0


def test_q283_cramers_v_matches_replay(spark):
    import math
    from collections import Counter

    import pandas as pd

    from columnarmodeling_spark.queries import REGISTRY

    rows = REGISTRY["q283_cramers_v"].fn(
        spark, "/root/testdata/sf0.001"
    ).collect()
    docs = pd.read_parquet("/root/testdata/sf0.001/documents.parquet")
    axes = {
        "lang_x_source": list(zip(docs.lang, docs.source)),
        "lang_x_lenb": list(zip(docs.lang, (docs.n_chars // 100).astype(str))),
        "source_x_lenb": list(
            zip(docs.source, (docs.n_chars // 100).astype(str))
        ),
    }
    want = {}
    for pair, uv in axes.items():
        o = Counter(uv)
        rt, ct = Counter(), Counter()
        for (u, v), k in o.items():
            rt[u] += k
            ct[v] += k
        n = sum(o.values())
        chi = sum(
            round(1000000.0 * (k - rt[u] * ct[v] / n) ** 2
                  / (rt[u] * ct[v] / n))
            for (u, v), k in o.items()
        )
        vm = round(
            1000.0 * math.sqrt((chi / 1000000.0)
                               / (n * min(len(rt) - 1, len(ct) - 1)))
        )
        want[pair] = (n, len(rt), len(ct), chi, vm)
    assert len(rows) == 3
    for r in rows:
        assert (r.n, r.r, r.c, r.chi2_micro, r.v_milli) == want[r.pair], r.pair
        # V is a normalized association: inside [0, 1] up to quantization
        assert 0 <= r.v_milli <= 1000


def test_q286_irls_logistic_matches_replay(spark):
    import math

    import pandas as pd

    from columnarmodeling_spark.queries import REGISTRY

    (row,) = REGISTRY["q286_irls_logistic"].fn(
        spark, "/root/testdata/sf0.001"
    ).collect()
    docs = pd.read_parquet("/root/testdata/sf0.001/documents.parquet")

    def rnd(x):  # SQL round: half away from zero
        return math.floor(x + 0.5) if x >= 0 else -math.floor(-x + 0.5)

    base = [
        (
            doc.n_chars / 100.0,
            (len(doc.text) - len(doc.text.replace(" ", ""))) / 100.0,
            1.0 if doc.lang == "en" else 0.0,
        )
        for _, doc in docs.iterrows()
    ]

    def step(w0, w1, w2):
        s = [0] * 9
        for x1, x2, y in base:
            mu = 1.0 / (1.0 + math.exp(
                -(w0 / 1000000.0 + w1 / 1000000.0 * x1
                  + w2 / 1000000.0 * x2)))
            v = mu * (1.0 - mu)
            for i, e in enumerate([
                y - mu, x1 * (y - mu), x2 * (y - mu),
                v, v * x1, v * x2, v * x1 * x1, v * x1 * x2, v * x2 * x2,
            ]):
                s[i] += rnd(1000000.0 * e)
        g0, g1, g2, h00, h01, h02, h11, h12, h22 = s
        det = (
            float(h00) * (float(h11) * h22 - float(h12) * h12)
            - float(h01) * (float(h01) * h22 - float(h12) * h02)
            + float(h02) * (float(h01) * h12 - float(h11) * h02)
        )
        if abs(det) == 0.0:
            return w0, w1, w2
        d0 = (
            float(g0) * (float(h11) * h22 - float(h12) * h12)
            - float(h01) * (float(g1) * h22 - float(h12) * g2)
            + float(h02) * (float(g1) * h12 - float(h11) * g2)
        )
        d1 = (
            float(h00) * (float(g1) * h22 - float(g2) * h12)
            - float(g0) * (float(h01) * h22 - float(h12) * h02)
            + float(h02) * (float(h01) * g2 - float(g1) * h02)
        )
        d2 = (
            float(h00) * (float(h11) * g2 - float(h12) * g1)
            - float(h01) * (float(h01) * g2 - float(g1) * h02)
            + float(g0) * (float(h01) * h12 - float(h11) * h02)
        )
        return (
            w0 + rnd(1000000.0 * (d0 / det)),
            w1 + rnd(1000000.0 * (d1 / det)),
            w2 + rnd(1000000.0 * (d2 / det)),
        )

    w = step(*step(0, 0, 0))
    ll = sum(
        rnd(1000000.0 * (
            y * math.log(max(
                1.0 / (1.0 + math.exp(
                    -(w[0] / 1000000.0 + w[1] / 1000000.0 * x1
                      + w[2] / 1000000.0 * x2))), 1e-12))
            + (1.0 - y) * math.log(max(
                1.0 - 1.0 / (1.0 + math.exp(
                    -(w[0] / 1000000.0 + w[1] / 1000000.0 * x1
                      + w[2] / 1000000.0 * x2))), 1e-12))))
        for x1, x2, y in base
    )
    assert (row.n, row.w0_micro, row.w1_micro, row.w2_micro,
            row.ll_micro) == (len(base), *w, ll)
    # the fitted LL must beat the w=0 model (every Newton step from 0
    # on a concave LL with a full-rank Hessian improves it here)
    assert ll > len(base) * 1000000.0 * math.log(0.5)
    assert ll <= 0


def test_q287_isotonic_matches_replay_and_pav(spark):
    import math
    from collections import Counter

    import pandas as pd

    from columnarmodeling_spark.queries import REGISTRY

    rows = REGISTRY["q287_isotonic_calibration"].fn(
        spark, "/root/testdata/sf0.001"
    ).collect()
    ev = pd.read_parquet("/root/testdata/sf0.001/events.parquet")
    per = {}
    for _, e in ev.iterrows():
        d = per.setdefault(e.user_id, Counter())
        d[e.event_type] += 1
    bins = {}
    for d in per.values():
        c = min(20, d["click"])
        n, s = bins.get(c, (0, 0))
        bins[c] = (n + 1, s + (1 if d["purchase"] > d["click"] else 0))
    cs = sorted(bins)

    def rnd(x):
        return math.floor(x + 0.5) if x >= 0 else -math.floor(-x + 0.5)

    avg = {}
    for j in range(len(cs)):
        for k in range(j, len(cs)):
            nn = sum(bins[c][0] for c in cs[j:k + 1])
            ss = sum(bins[c][1] for c in cs[j:k + 1])
            avg[(j, k)] = rnd(1000000.0 * ss / nn)
    fitted = {
        cs[i]: max(
            min(avg[(j, k)] for k in range(i, len(cs)))
            for j in range(i + 1)
        )
        for i in range(len(cs))
    }
    assert len(rows) == len(cs)
    for r in rows:
        n, s = bins[r.c]
        assert (r.n, r.s, r.raw_micro, r.fitted_micro) == (
            n, s, rnd(1000000.0 * s / n), fitted[r.c],
        ), r.c
    # PAV output is monotone non-decreasing in the forecast bin
    seq = [r.fitted_micro for r in rows]
    assert seq == sorted(seq)
    # and pools to the overall rate: weighted mean of fitted == global
    # mean (within quantization slack of one micro per bin)
    tot_n = sum(n for n, _ in bins.values())
    tot_s = sum(s for _, s in bins.values())
    wm = sum(bins[r.c][0] * r.fitted_micro for r in rows) / tot_n
    assert abs(wm - 1000000.0 * tot_s / tot_n) <= len(cs)


def test_q298_woe_iv_matches_replay(spark):
    import math

    import pandas as pd

    from columnarmodeling_spark.queries import REGISTRY

    rows = REGISTRY["q298_woe_iv"].fn(
        spark, "/root/testdata/sf0.001"
    ).collect()
    docs = pd.read_parquet("/root/testdata/sf0.001/documents.parquet")
    ranked = sorted(
        (int(r.n_chars), int(r.doc_id), 1 if r.lang == "en" else 0)
        for _, r in docs.iterrows()
    )
    n = len(ranked)
    bins = {}
    for rn, (_, _, y) in enumerate(ranked, 1):
        b = (rn - 1) * 10 // n
        cnt, g = bins.get(b, (0, 0))
        bins[b] = (cnt + 1, g + y)
    gt = sum(g for _, g in bins.values())
    bt = sum(cnt - g for cnt, g in bins.values())

    def rnd(x):
        return math.floor(x + 0.5) if x >= 0 else -math.floor(-x + 0.5)

    got = {r.bin: r for r in rows}
    assert sorted(got) == sorted(bins)
    iv_total = 0
    for b, (cnt, g) in bins.items():
        bad = cnt - g
        woe = rnd(1000000.0 * math.log(((g + 0.5) / gt) / ((bad + 0.5) / bt)))
        iv = rnd(
            1000000.0 * (((g + 0.5) / gt) - ((bad + 0.5) / bt))
            * woe / 1000000.0
        )
        r = got[b]
        assert (r.n, r.g, r.b, r.woe_micro, r.iv_contrib_micro) == (
            cnt, g, bad, woe, iv,
        ), b
        iv_total += iv
        # IV contributions are non-negative by construction:
        # (p_g - p_b) and ln(p_g/p_b) always share a sign
        assert iv >= 0
    assert iv_total >= 0


def test_q299_clustering_matches_replay(spark):
    import math

    import pandas as pd

    from columnarmodeling_spark.queries import REGISTRY

    rows = REGISTRY["q299_clustering_coefficient"].fn(
        spark, "/root/testdata/sf0.001"
    ).collect()
    c = pd.read_parquet("/root/testdata/sf0.001/customer.parquet")
    pts = [
        (int(r.c_custkey), float(r.c_acctbal), (int(r.c_custkey) % 97) * 25.0)
        for _, r in c.iterrows()
    ]
    adj = {}
    ids = [p[0] for p in pts]
    for i, a in enumerate(pts):
        for b in pts[i + 1:]:
            if math.sqrt((a[1] - b[1]) ** 2 + (a[2] - b[2]) ** 2) < 30.0:
                adj.setdefault(a[0], set()).add(b[0])
                adj.setdefault(b[0], set()).add(a[0])
    tri = {v: 0 for v in adj}
    for v in adj:
        for u in adj[v]:
            if u > v:
                for w in adj[v] & adj[u]:
                    if w > u:
                        tri[v] += 1
                        tri[u] += 1
                        tri[w] += 1
    got = {r.id: r for r in rows}
    assert sorted(got) == sorted(adj)
    for v, r in got.items():
        d = len(adj[v])
        cc = round(1000.0 * 2 * tri[v] / (d * (d - 1))) if d >= 2 else 0
        assert (r.degree, r.n_triangles, r.cc_milli) == (d, tri[v], cc), v
        # cc is a fraction of realized wedges
        assert 0 <= r.cc_milli <= 1000


def test_q300_conformal_coverage_matches_replay(spark):
    import hashlib
    import math
    from collections import Counter

    import pandas as pd

    from columnarmodeling_spark.queries import REGISTRY

    (row,) = REGISTRY["q300_conformal_coverage"].fn(
        spark, "/root/testdata/sf0.001"
    ).collect()
    ev = pd.read_parquet("/root/testdata/sf0.001/events.parquet")
    per = {}
    for _, e in ev.iterrows():
        d = per.setdefault(e.user_id, Counter())
        d[e.event_type] += 1
    cal, evl = [], []
    for uid, d in per.items():
        p = 50 * min(20, d["click"])
        o = 1000 if d["purchase"] > d["click"] else 0
        a = abs(o - p)
        grp = int(
            hashlib.md5(str(uid).encode()).hexdigest()[:4], 16
        ) % 2
        (cal if grp == 0 else evl).append(a)
    cal.sort()
    k = math.ceil(0.9 * (len(cal) + 1))
    q_hat = cal[k - 1]
    covered = sum(1 for a in evl if a <= q_hat)
    assert (row.n_cal, row.n_eval, row.q_hat_milli, row.n_covered) == (
        len(cal), len(evl), q_hat, covered,
    )
    assert row.coverage_milli == round(1000.0 * covered / len(evl))
    # q_hat is an observed nonconformity value, bounded by the scale
    assert 0 <= row.q_hat_milli <= 1000


def test_q303_hard_example_mining_matches_replay(spark):
    import math

    import pandas as pd

    from columnarmodeling_spark.queries import REGISTRY

    rows = REGISTRY["q303_hard_example_mining"].fn(
        spark, "/root/testdata/sf0.001"
    ).collect()
    # the fitted weights must equal q286's (shared chain)
    (wrow,) = REGISTRY["q286_irls_logistic"].fn(
        spark, "/root/testdata/sf0.001"
    ).collect()
    w = (wrow.w0_micro, wrow.w1_micro, wrow.w2_micro)
    docs = pd.read_parquet("/root/testdata/sf0.001/documents.parquet")

    def rnd(x):
        return math.floor(x + 0.5) if x >= 0 else -math.floor(-x + 0.5)

    per = {}
    for _, doc in docs.iterrows():
        x1 = doc.n_chars / 100.0
        x2 = (len(doc.text) - len(doc.text.replace(" ", ""))) / 100.0
        y = 1.0 if doc.lang == "en" else 0.0
        mu = 1.0 / (1.0 + math.exp(
            -(w[0] / 1000000.0 + w[1] / 1000000.0 * x1
              + w[2] / 1000000.0 * x2)))
        loss = rnd(-1000000.0 * (
            y * math.log(max(mu, 1e-12))
            + (1.0 - y) * math.log(max(1.0 - mu, 1e-12))))
        per.setdefault(doc.source, []).append(
            (loss, int(doc.doc_id), int(y))
        )
    want = {}
    for src_, lst in per.items():
        lst.sort(key=lambda r: (-r[0], r[1]))
        want[src_] = lst[:5]
    assert len(rows) == sum(min(5, len(v)) for v in want.values())
    for r in rows:
        loss, doc_id, y = want[r.source][r.pick - 1]
        assert (r.doc_id, r.y, r.loss_micro) == (doc_id, y, loss), (
            r.source, r.pick,
        )
        # log loss is non-negative
        assert r.loss_micro >= 0


def test_q304_dq_audit_matches_replay(spark):
    import math

    import pandas as pd

    from columnarmodeling_spark.queries import REGISTRY

    rows = {
        r.rule: r
        for r in REGISTRY["q304_dq_audit"].fn(
            spark, "/root/testdata/sf0.001"
        ).collect()
    }
    sf = "/root/testdata/sf0.001"
    li = pd.read_parquet(f"{sf}/lineitem.parquet")
    orders = pd.read_parquet(f"{sf}/orders.parquet")
    cust = pd.read_parquet(f"{sf}/customer.parquet")
    part = pd.read_parquet(f"{sf}/part.parquet")
    ev = pd.read_parquet(f"{sf}/events.parquet")
    docs = pd.read_parquet(f"{sf}/documents.parquet")
    want = {
        "lineitem_qty_range": (
            len(li),
            int(((li.l_quantity < 1) | (li.l_quantity > 50)).sum()),
        ),
        "orders_custkey_fk": (
            len(orders),
            int((~orders.o_custkey.isin(set(cust.c_custkey))).sum()),
        ),
        "part_pk_unique": (
            len(part), len(part) - part.p_partkey.nunique(),
        ),
        "events_value_finite": (
            len(ev),
            int(sum(1 for v in ev.value
                    if v is None or (isinstance(v, float) and math.isnan(v)))),
        ),
        "documents_nchars_consistent": (
            len(docs),
            int(sum(1 for _, d in docs.iterrows()
                    if d.n_chars != len(d.text))),
        ),
    }
    assert sorted(rows) == sorted(want)
    for rule, (n, v) in want.items():
        assert (rows[rule].n_checked, rows[rule].n_violations) == (n, v), rule
        assert 0 <= rows[rule].n_violations <= rows[rule].n_checked


def test_q306_sprt_matches_replay(spark):
    import math

    import pandas as pd

    from columnarmodeling_spark.queries import REGISTRY

    rows = REGISTRY["q306_sprt"].fn(
        spark, "/root/testdata/sf0.001"
    ).collect()
    ev = pd.read_parquet("/root/testdata/sf0.001/events.parquet")

    def rnd(x):
        return math.floor(x + 0.5) if x >= 0 else -math.floor(-x + 0.5)

    S = rnd(1000000.0 * math.log(0.4 / 0.3))
    FL = rnd(1000000.0 * math.log(0.6 / 0.7))
    B = rnd(1000000.0 * math.log(19.0))
    per = {}
    for _, e in ev.iterrows():
        per.setdefault(e.event_type, []).append(
            (e.ts.value // 1000, e.event_id, e.value)
        )
    got = {r.event_type: r for r in rows}
    assert sorted(got) == sorted(per)
    for ty, lst in per.items():
        lst.sort()
        llr, hit = 0, None
        for rn, (_, _, v) in enumerate(lst, 1):
            llr += S if v > 50 else FL
            if hit is None and (llr >= B or llr <= -B):
                hit = (rn, llr)
        r = got[ty]
        if hit is None:
            assert (r.decision, r.n_at_decision, r.llr_micro) == (
                "continue", len(lst), llr,
            ), ty
        else:
            want = "accept_h1" if hit[1] >= B else "accept_h0"
            assert (r.decision, r.n_at_decision, r.llr_micro) == (
                want, hit[0], hit[1],
            ), ty
            # the decision LLR sits just past the boundary, not far past
            assert abs(r.llr_micro) < B + max(S, -FL) + 1


def test_q307_gains_table_matches_replay(spark):
    import math

    import pandas as pd

    from columnarmodeling_spark.queries import REGISTRY

    rows = REGISTRY["q307_gains_table"].fn(
        spark, "/root/testdata/sf0.001"
    ).collect()
    (wrow,) = REGISTRY["q286_irls_logistic"].fn(
        spark, "/root/testdata/sf0.001"
    ).collect()
    w = (wrow.w0_micro, wrow.w1_micro, wrow.w2_micro)
    docs = pd.read_parquet("/root/testdata/sf0.001/documents.parquet")

    def rnd(x):
        return math.floor(x + 0.5) if x >= 0 else -math.floor(-x + 0.5)

    scored = []
    for _, doc in docs.iterrows():
        x1 = doc.n_chars / 100.0
        x2 = (len(doc.text) - len(doc.text.replace(" ", ""))) / 100.0
        y = 1 if doc.lang == "en" else 0
        mu = 1.0 / (1.0 + math.exp(
            -(w[0] / 1000000.0 + w[1] / 1000000.0 * x1
              + w[2] / 1000000.0 * x2)))
        scored.append((-rnd(1000000.0 * mu), int(doc.doc_id), y))
    scored.sort()
    n = len(scored)
    per = {}
    for rn, (_, _, y) in enumerate(scored, 1):
        d = (rn - 1) * 10 // n
        cnt, pos = per.get(d, (0, 0))
        per[d] = (cnt + 1, pos + y)
    tot_pos = sum(p for _, p in per.values())
    got = {r.decile: r for r in rows}
    assert sorted(got) == sorted(per)
    cum = 0
    for d in sorted(per):
        cnt, pos = per[d]
        cum += pos
        r = got[d]
        assert (r.n, r.pos, r.cum_pos) == (cnt, pos, cum), d
        assert r.gain_milli == rnd(1000.0 * cum / tot_pos)
        assert r.lift_milli == rnd(1000.0 * (pos / cnt) / (tot_pos / n))
    # the cumulative gain curve is monotone and ends at 100%
    gains = [got[d].gain_milli for d in sorted(got)]
    assert gains == sorted(gains) and gains[-1] == 1000


def test_q308_join_size_sketch_matches_replay(spark):
    import hashlib
    from collections import Counter

    import pandas as pd

    from columnarmodeling_spark.queries import REGISTRY
    from columnarmodeling_spark.functions.text import MERSENNE_P, MINHASH_AB

    (row,) = REGISTRY["q308_join_size_sketch"].fn(
        spark, "/root/testdata/sf0.001"
    ).collect()
    ev = pd.read_parquet("/root/testdata/sf0.001/events.parquet")
    orders = pd.read_parquet("/root/testdata/sf0.001/orders.parquet")

    def u_of(k):
        return int(
            hashlib.md5(str(k).encode()).hexdigest()[:15], 16
        ) % MERSENNE_P

    W = 8192
    ca, cb = Counter(ev.user_id), Counter(orders.o_custkey)
    exact = sum(c * cb.get(k, 0) for k, c in ca.items())
    ests = []
    for j in range(3):
        a, b = MINHASH_AB[j]
        sa, sb = Counter(), Counter()
        for k, c in ca.items():
            sa[(a * u_of(k) + b) % MERSENNE_P % W] += c
        for k, c in cb.items():
            sb[(a * u_of(k) + b) % MERSENNE_P % W] += c
        ests.append(sum(c * sb.get(col, 0) for col, c in sa.items()))
    assert (row.exact_size, row.est_min, row.est_max) == (
        exact, min(ests), max(ests),
    )
    assert row.over_milli == round(1000.0 * min(ests) / exact)
    # the CM inner product is an upper bound on the true join size
    assert row.est_min >= row.exact_size


def test_q281_bh_fdr_empty_bucket_guard(spark, tmp_path):
    """Degenerate corpus with a globally EMPTY 'zh' bucket (t3 = 0):
    the per-cell zero-total guard (ADVICE r10) must keep chi2 finite
    and bit-identical on both engines — unguarded, the expected-count
    divisor is 0, Spark's non-ANSI cast clamps Inf to Long.MaxValue
    and DuckDB errors on the cast."""
    import duckdb
    import pandas as pd

    from columnarmodeling_spark.queries import REGISTRY
    from tests.oracle_utils import canonical_rows

    docs = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4, 5],
            "text": ["hello world", "more text", "hola mundo",
                     "otra fila", "third doc"],
            "lang": ["en", "en", "es", "es", "en"],  # no 'zh' anywhere
            "source": ["src_a", "src_a", "src_b", "src_b", "src_b"],
            "n_chars": [11, 9, 10, 9, 9],
        }
    )
    d = str(tmp_path)
    docs.to_parquet(d + "/documents.parquet", index=False)
    spec = REGISTRY["q281_bh_fdr"]
    got = spec.fn(spark, d)
    mine_cols = got.columns
    mine_rows = [tuple(r) for r in got.collect()]
    # finite chi2 on the degenerate bucket (no Long.MaxValue clamp)
    chi_i = mine_cols.index("chi2_micro")
    assert all(abs(r[chi_i]) < 10**15 for r in mine_rows)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{d}/documents.parquet'"
    )
    cur = con.execute(spec.oracle)
    ocols = [c[0] for c in cur.description]
    orows = cur.fetchall()
    assert sorted(mine_cols) == sorted(ocols)
    assert canonical_rows(mine_cols, mine_rows) == canonical_rows(
        ocols, orows
    )
