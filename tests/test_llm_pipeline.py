"""Semantic invariants for the composed training-data pipeline queries
(q94 contamination, q95 training mix) beyond the differential oracle:
known-answer contamination on a crafted corpus, and the mix's
rate-monotone subset property (a lower rate samples a subset)."""

from __future__ import annotations

from pyspark.sql import functions as F

from columnarmodeling_spark.queries import REGISTRY
from columnarmodeling_spark.queries.llm_dedup import _shingle_rows


def test_contamination_known_answer(spark, tmp_path):
    # doc 10 (eval) copies doc 3 (train) verbatim -> contamination 1.0;
    # doc 20 (eval) shares no 3-gram with any train doc -> 0.0.
    leaked = "alpha beta gamma delta epsilon zeta eta theta"
    rows = [
        (3, leaked, "en", "src0", len(leaked)),
        (7, "one two three four five six seven eight", "en", "src1", 40),
        (10, leaked, "en", "src2", len(leaked)),
        (20, "red orange yellow green blue indigo violet", "en", "src3", 42),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    d = str(tmp_path / "docs")
    df.coalesce(1).write.parquet(d + "/documents.parquet")
    out = {
        r["doc_id"]: r
        for r in REGISTRY["q94_contamination"].fn(spark, d).collect()
    }
    assert set(out) == {10, 20}
    assert out[10]["contamination"] == 1.0
    assert out[20]["contamination"] == 0.0
    # shingle counts: 8 tokens -> 6 3-grams
    assert out[10]["n_shingles"] == 6
    assert out[10]["n_contaminated"] == 6


def test_mix_sampling_is_rate_monotone(spark, sf_dir):
    # The 16-bit-md5 sampling rule is composable: every doc kept at a
    # given rate is kept at any higher rate. The per-source doc counts
    # of the mix therefore cannot exceed the rate-1.0 (dedup-only)
    # universe, and the hk threshold partitions doc ids identically
    # across runs (determinism: two runs agree row-for-row).
    mix = REGISTRY["q95_training_mix"].fn(spark, sf_dir)
    a = {(r["source"], r["n_docs"], r["n_tokens"]) for r in mix.collect()}
    b = {(r["source"], r["n_docs"], r["n_tokens"]) for r in mix.collect()}
    assert a == b and len(a) > 0
    rates = {r["source"]: r["mix_rate"] for r in mix.collect()}
    for src, rate in rates.items():
        assert rate in (1.0, 0.5, 0.25)
        idx = int(src[3:])
        expected = 1.0 if idx < 5 else (0.5 if idx < 10 else 0.25)
        assert rate == expected


def test_contamination_join_fanout_bounded(spark, sf_dir):
    # The train side is DISTINCT shingles: probing it can never return
    # more rows than probed. This is the skew-immunity property the
    # docstring claims -- check it holds on real data.
    sh = _shingle_rows(spark, sf_dir)
    ev = sh.filter(F.col("doc_id") % 10 == 0)
    tr = sh.filter(F.col("doc_id") % 10 != 0).select("s").distinct()
    n_probe = ev.count()
    n_joined = ev.join(tr, "s").count()
    assert n_joined <= n_probe


def test_recall_curve_monotone_in_nprobe(spark, sf_dir):
    """q113: probing more IVF cells can only add candidates, so total
    exact-neighbor hits (and mean recall) must be non-decreasing in
    nprobe, and every row shares the same query count."""
    rows = {
        r["nprobe"]: r
        for r in REGISTRY["q113_ivf_recall_curve"].fn(spark, sf_dir).collect()
    }
    assert sorted(rows) == [1, 2, 4]
    nq = {r["n_queries"] for r in rows.values()}
    assert len(nq) == 1 and nq.pop() > 0
    assert rows[1]["total_hits"] <= rows[2]["total_hits"] <= rows[4]["total_hits"]
    assert (
        rows[1]["mean_recall_at_k"]
        <= rows[2]["mean_recall_at_k"]
        <= rows[4]["mean_recall_at_k"]
    )
    assert rows[4]["total_hits"] > 0  # the sweep actually finds neighbors
    for r in rows.values():
        assert 0.0 <= r["mean_recall_at_k"] <= 1.0
        assert 0 <= r["n_perfect"] <= r["n_queries"]


def test_bpe_apply_merges_known_word(spark):
    """'there' under the fixed merge table: t+h merges first; e+r
    outranks th+e, so the final th+e merge finds no adjacent pair —
    real greedy-priority BPE behavior (merged symbols may participate
    in later merges, but only in priority order)."""
    from pyspark.sql import functions as F

    from columnarmodeling_spark.queries.llm_text import (
        _bpe_merge_chain,
        _bpe_nsym,
    )

    df = spark.createDataFrame(
        [("there",), ("inner",), ("zzz",)], "w string"
    ).withColumn(
        "seq", F.concat(F.lit("|"), F.regexp_replace("w", "(.)", "$1|"))
    ).withColumn("seq2", F.expr(_bpe_merge_chain("seq"))).withColumn(
        "n", F.expr(_bpe_nsym("seq2"))
    )
    got = {r["w"]: (r["seq2"], r["n"]) for r in df.collect()}
    # t h e r e -> th e r e -> th e re -> (th+e) the re
    assert got["there"] == ("|th|er|e|", 3)
    # i n n e r -> in n e r -> in n er
    assert got["inner"] == ("|in|n|er|", 3)
    # no merges apply: one symbol per char
    assert got["zzz"] == ("|z|z|z|", 3)


def test_incremental_dedup_invariants(spark):
    """Survivors are unique vs history AND within the batch; exactly
    one survivor per new content hash (first by doc_id)."""
    from columnarmodeling_spark.queries import REGISTRY

    out = REGISTRY["q121_incremental_dedup"].fn(
        spark, "/root/testdata/sf0.001"
    ).cache()
    rows = out.collect()
    assert len(rows) > 0
    kept = [r for r in rows if not r["is_dup"]]
    # kept hashes are unique within the batch
    assert len({r["content_hash"] for r in kept}) == len(kept)
    # every kept row is the min doc_id among batch rows with its hash
    by_hash = {}
    for r in rows:
        by_hash.setdefault(r["content_hash"], []).append(r)
    for r in kept:
        assert not r["in_history"]
        assert r["doc_id"] == min(x["doc_id"] for x in by_hash[r["content_hash"]])
    # flags compose
    for r in rows:
        assert r["is_dup"] == (r["in_history"] or r["dup_in_batch"])


def test_pq_codes_seed_identity(spark):
    """A codebook seed vector must encode to ITSELF in every subspace
    (d2 = 0, code = its own rank) — and every (vec, sub) pair appears
    exactly once."""
    from pyspark.sql import functions as F

    from columnarmodeling_spark.queries import REGISTRY

    sf = "/root/testdata/sf0.001"
    out = REGISTRY["q123_pq_codes"].fn(spark, sf).cache()
    n_vec = out.select("vec_id").distinct().count()
    assert out.count() == n_vec * 8
    # d2 = 0 rows are exactly self-matches of the 16 seeds (assuming no
    # duplicate sub-vectors among seeds; tolerate >= to stay robust)
    zero = out.filter("d2 = 0")
    seeds_with_zero = zero.select("vec_id").distinct().count()
    assert seeds_with_zero >= 16 or n_vec < 16
    # each seed vector has all 8 subspaces at zero distortion
    per = zero.groupBy("vec_id").agg(F.count("*").alias("c")).collect()
    full = [r for r in per if r["c"] == 8]
    assert len(full) >= min(16, n_vec)


def test_pq_adc_beats_chance(spark):
    """ADC recall@3 must beat random guessing by a wide margin (PQ with
    16-entry codebooks keeps signal) while staying below exact recall."""
    from columnarmodeling_spark.queries import REGISTRY

    r = REGISTRY["q124_pq_adc_recall"].fn(
        spark, "/root/testdata/sf0.001"
    ).collect()[0]
    # chance rate is against the full candidate pool (the corpus), not
    # the sampled probe count the eval now scores on
    n_corpus = spark.read.parquet(
        "/root/testdata/sf0.001/embeddings.parquet"
    ).count()
    chance = 3.0 / max(n_corpus - 1, 1)
    assert 0.0 < r["mean_recall_at_k"] < 1.0
    assert r["mean_recall_at_k"] > 3 * chance
    assert r["total_hits"] <= r["n_queries"] * 3


def test_incremental_neardup_flags_compose(spark):
    """Every incoming doc appears exactly once; the flag equals
    n_candidates > 0 and best_est_jaccard is 0 for clean docs."""
    from columnarmodeling_spark.queries import REGISTRY

    rows = REGISTRY["q125_incremental_neardup"].fn(
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert len(rows) == len({r["doc_id"] for r in rows}) > 0
    for r in rows:
        assert r["is_neardup"] == (r["n_candidates"] > 0)
        if not r["is_neardup"]:
            assert r["best_est_jaccard"] == 0.0
        else:
            assert 0.0 < r["best_est_jaccard"] <= 1.0


def test_ivfpq_matches_full_adc_on_probed_cells(spark):
    """q126's ADC distances must agree with q124's full (un-routed) ADC
    relation on every (query, neighbor) pair q126 emits — routing may
    only RESTRICT the candidate set, never change a distance — and
    every emitted neighbor must live in one of the query's probed
    cells."""
    from pyspark.sql import functions as F

    from columnarmodeling_spark.queries import REGISTRY
    from columnarmodeling_spark.queries.llm_similarity import (
        _pq_codes_from_subd,
        _pq_subd,
        _quantized,
    )

    sf = "/root/testdata/sf0.001"
    out = REGISTRY["q126_ivfpq_search"].fn(spark, sf).cache()
    n_q = out.select("vec_id").distinct().count()
    assert n_q > 0
    # exactly top-3 (or fewer if probed cells are tiny) per query, rk dense
    per = out.groupBy("vec_id").agg(
        F.count("*").alias("c"), F.max("rk").alias("mx")
    )
    assert per.filter("c != mx OR c > 3").count() == 0
    # recompute ADC for the emitted pairs from the LUT directly
    # (fresh scans -> distinct lineages, no ambiguous attributes)
    codes = _pq_codes_from_subd(_pq_subd(spark, sf)).select(
        F.col("vec_id").alias("neighbor"),
        F.col("sub").alias("sub_c"),
        "code",
    )
    subd_l = _pq_subd(spark, sf).select(
        F.col("vec_id").alias("q_l"),
        F.col("sub").alias("sub_l"),
        F.col("rank").alias("rank_l"),
        "d2",
    )
    full = (
        out.select("vec_id", "neighbor", "adc")
        .join(codes, "neighbor")
        .join(
            subd_l,
            (F.col("q_l") == F.col("vec_id"))
            & (F.col("sub_l") == F.col("sub_c"))
            & (F.col("rank_l") == F.col("code")),
        )
        .groupBy("vec_id", "neighbor", "adc")
        .agg(F.sum("d2").alias("adc2"))
    )
    assert full.filter("adc != adc2").count() == 0
    # neighbors are confined to probed cells: every emitted neighbor's
    # home cell (adaptive crk=1 route) must be one of the query's
    # nprobe=2 probed cells
    from columnarmodeling_spark.queries.llm_similarity import (
        _ROUTED_SCHEMA,
        _adaptive_seed_broadcast,
        _make_route_fn,
    )

    n = _quantized(spark, sf)
    route = _make_route_fn(_adaptive_seed_broadcast(spark, n), 2)
    routed = (
        n.select("vec_id", "qv", "n2")
        .mapInPandas(route, schema=_ROUTED_SCHEMA)
        .select("vec_id", "cell", "crk")
        .cache()
    )
    probes = routed.filter("crk <= 2").select("vec_id", "cell")
    homes = routed.filter("crk = 1").select(
        F.col("vec_id").alias("neighbor"), F.col("cell").alias("home")
    )
    bad = (
        out.join(homes, "neighbor")
        .join(
            probes.withColumnRenamed("cell", "pcell"), "vec_id", "left"
        )
        .groupBy("vec_id", "neighbor", "home")
        .agg(
            F.max(
                F.when(F.col("pcell") == F.col("home"), 1).otherwise(0)
            ).alias("in_probed")
        )
        .filter("in_probed = 0")
    )
    assert bad.count() == 0


def test_bloom_prefilter_guarantees(spark):
    """Bloom membership has NO false negatives (every exact hit is a
    bloom hit), hit counts are bounded by shingle counts, and the
    cross-split shared vocabulary produces real exact hits somewhere."""
    from columnarmodeling_spark.queries import REGISTRY

    rows = REGISTRY["q127_bloom_prefilter"].fn(
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert rows
    for r in rows:
        assert r["doc_id"] % 4 == 0  # probe split only
        assert 0 <= r["n_exact_hits"] <= r["n_bloom_hits"] <= r["n_shingles"]
        assert r["n_false_pos"] == r["n_bloom_hits"] - r["n_exact_hits"]
        assert 0.0 <= r["fp_rate"] <= 1.0
    assert sum(r["n_exact_hits"] for r in rows) > 0


def test_prefix_filter_join_is_exact_and_prunes(spark):
    """q129 must return EXACTLY the pairs with shingle-Jaccard >= 3/5
    (no false negatives — the prefix-filter guarantee — and none
    below threshold), and its candidate space must be smaller than
    the every-shared-shingle join's pair space."""
    from pyspark.sql import functions as F

    from columnarmodeling_spark.queries import REGISTRY
    from columnarmodeling_spark.queries.llm_dedup import _shingle_rows

    sf = "/root/testdata/sf0.001"
    got = {
        (r["doc_a"], r["doc_b"]): (r["inter"], r["jaccard"])
        for r in REGISTRY["q129_prefix_filter_join"].fn(spark, sf).collect()
    }
    # brute force: every pair sharing any shingle, exact Jaccard
    sh = _shingle_rows(spark, sf).cache()
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n"))
    a = sh.select(F.col("doc_id").alias("da"), "s")
    b = sh.select(F.col("doc_id").alias("db"), F.col("s").alias("sb"))
    inter = (
        a.join(b, (F.col("s") == F.col("sb")) & (F.col("da") < F.col("db")))
        .groupBy("da", "db")
        .agg(F.count("*").alias("i"))
    )
    full = (
        inter.join(sizes.select(F.col("doc_id").alias("da"),
                                F.col("n").alias("na")), "da")
        .join(sizes.select(F.col("doc_id").alias("db"),
                           F.col("n").alias("nb")), "db")
        .collect()
    )
    want = {}
    for r in full:
        union = r["na"] + r["nb"] - r["i"]
        if 5 * r["i"] >= 3 * union:
            want[(r["da"], r["db"])] = r["i"]
    assert set(got) == set(want)
    for k, (i, j) in got.items():
        assert i == want[k]
        assert j >= 0.6 - 1e-9
    # pruning: candidates strictly fewer than all shingle-sharing pairs
    n_sharing = len(full)
    assert n_sharing == 0 or len(got) <= n_sharing


def test_sequence_packing_conservation(spark):
    """Every chunk except the last holds exactly 512 tokens; token
    occupancy sums to the corpus total; chunk ids are dense from 0;
    spanning counts match docs whose offset precedes the chunk."""
    from pyspark.sql import functions as F

    from columnarmodeling_spark.functions.text import tokens
    from columnarmodeling_spark.queries import REGISTRY
    from columnarmodeling_spark.queries._util import t

    sf = "/root/testdata/sf0.001"
    rows = sorted(
        REGISTRY["q130_sequence_packing"].fn(spark, sf).collect(),
        key=lambda r: r["chunk"],
    )
    assert rows
    chunks = [r["chunk"] for r in rows]
    assert chunks == list(range(len(rows)))  # dense from 0
    total = (
        t(spark, sf, "documents")
        .select(F.size(tokens("text")).alias("nt"))
        .agg(F.sum("nt"))
        .collect()[0][0]
    )
    assert sum(r["n_tokens"] for r in rows) == total
    for r in rows[:-1]:
        assert r["n_tokens"] == 512
    assert 0 < rows[-1]["n_tokens"] <= 512
    for r in rows:
        assert 0 <= r["n_spanning"] <= 1 or r["n_spanning"] <= r["n_docs"]
        assert r["n_docs"] >= 1
    # chunk 0 can have no spanning doc
    assert rows[0]["n_spanning"] == 0


def test_bpe_train_known_corpus(spark, tmp_path):
    """Hand-traced 4-round BPE on {aaab, aab, ab}: round 1 ties
    (a,a)=3 vs (a,b)=3 -> lexicographic winner (a,a); merges then
    compound exactly as greedy BPE dictates."""
    import pyspark.sql.functions as F

    from columnarmodeling_spark.queries import REGISTRY

    df = spark.createDataFrame(
        [(1, "aaab aab ab", "en", "s", 11)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    d = str(tmp_path / "bpe")
    df.coalesce(1).write.parquet(d + "/documents.parquet")
    got = [
        (r["merge_round"], r["lhs"], r["rhs"], r["cnt"])
        for r in sorted(
            REGISTRY["q131_bpe_train"].fn(spark, d).collect(),
            key=lambda r: r["merge_round"],
        )
    ]
    assert got == [
        (1, "a", "a", 3),
        (2, "a", "b", 2),
        (3, "aa", "ab", 1),
        (4, "aa", "b", 1),
    ]


def test_feature_hashing_mass_conservation(spark, sf_dir):
    """q195: |weight| summed over buckets never exceeds the doc's token
    count, and the signed total has the token count's parity (each
    token contributes exactly +-1)."""
    from pyspark.sql import functions as F

    from columnarmodeling_spark.queries import REGISTRY
    from columnarmodeling_spark.queries._util import t
    from columnarmodeling_spark.functions.text import tokens

    fh = (
        REGISTRY["q195_feature_hashing"].fn(spark, sf_dir)
        .groupBy("doc_id")
        .agg(
            F.sum(F.abs("weight")).alias("mass"),
            F.sum("weight").alias("net"),
        )
    )
    tk = t(spark, sf_dir, "documents").select(
        "doc_id", F.size(tokens("text")).alias("ntok")
    )
    j = fh.join(tk, "doc_id")
    assert j.count() > 0
    assert j.filter(F.col("mass") > F.col("ntok")).count() == 0
    assert j.filter(
        F.pmod(F.col("net") - F.col("ntok"), F.lit(2)) != 0
    ).count() == 0


def test_residual_vq_refines(spark, sf_dir):
    """q198: the level-2 codebook contains the explicit zero entry, so
    per-vector distortion can only improve: d2 <= d1 for EVERY vector,
    and codes are in range."""
    from pyspark.sql import functions as F

    out = REGISTRY["q198_residual_vq"].fn(spark, sf_dir).cache()
    assert out.count() > 0
    assert out.filter(F.col("d2") > F.col("d1")).count() == 0
    assert out.filter(
        (F.col("c1") < 1) | (F.col("c1") > 16)
        | (F.col("c2") < 0) | (F.col("c2") > 16)
    ).count() == 0
    # refinement must actually do something on real data
    assert out.filter(F.col("d2") < F.col("d1")).count() > 0
    out.unpersist()


def test_decontamination_flags_planted_duplicates(spark, sf_dir):
    """q209: training docs that are planted near-duplicates of an
    eval-split doc must be flagged; counts are consistent; eval docs
    never appear in the output (they are the benchmark, not the
    corpus being screened)."""
    rows = REGISTRY["q209_decontamination"].fn(spark, sf_dir).collect()
    assert all(r["doc_id"] % 10 != 0 for r in rows)
    flagged = [r for r in rows if r["contaminated"] == 1]
    # the testdata's planted duplicate clusters straddle the %10 split
    # at every shipped sf (verified 7 docs at sf0.001, 6 at sf0.01) —
    # the positive path must actually fire
    assert len(flagged) >= 1
    for r in rows:
        assert 0 <= r["n_hit_grams"] <= r["n_grams"]
        assert r["contaminated"] == (1 if r["n_hit_grams"] > 0 else 0)
    # cross-check one flagged doc against q94's eval-side view: a
    # training doc sharing 8-grams with an eval doc implies that eval
    # doc shares 3-grams with the training split (8-grams contain
    # 3-grams), so q94 must report nonzero contamination somewhere
    q94 = REGISTRY["q94_contamination"].fn(spark, sf_dir).collect()
    assert any(r["n_contaminated"] > 0 for r in q94)


def test_q232_greedy_packing_matches_python_fold(spark):
    import re

    import pandas as pd

    from columnarmodeling_spark.queries import REGISTRY
    from columnarmodeling_spark.queries.llm_pipeline import _PACK_BUDGET

    rows = REGISTRY["q232_greedy_packing"].fn(
        spark, "/root/testdata/sf0.001"
    ).collect()
    docs = pd.read_parquet("/root/testdata/sf0.001/documents.parquet")
    assert len(rows) == len(docs)
    by_src = {}
    for r in sorted(rows, key=lambda r: (r.source, r.doc_id)):
        by_src.setdefault(r.source, []).append(r)
    for src, rs in by_src.items():
        g = docs[docs.source == src].sort_values("doc_id")
        b, c = 0, 0
        for r, (_, doc) in zip(rs, g.iterrows()):
            tk = [
                t
                for t in re.split(r"[^a-z0-9]+", doc.text.lower())
                if t
            ]
            n = len(tk)
            if b == 0:
                b, c = 1, n
            elif c + n <= _PACK_BUDGET:
                c += n
            else:
                b, c = b + 1, n
            assert (r.doc_id, r.n_tok, r.bin_id, r.bin_cum) == (
                doc.doc_id, n, b, c,
            ), (src, r.doc_id)
        # bins fill within budget except single-doc overflow bins
        fills = {}
        for r in rs:
            fills[r.bin_id] = max(fills.get(r.bin_id, 0), r.bin_cum)
        for bid, fill in fills.items():
            ndocs = sum(1 for r in rs if r.bin_id == bid)
            assert fill <= _PACK_BUDGET or ndocs == 1


def test_q258_reweighting_matches_python_fold(spark):
    import re

    import pandas as pd

    from columnarmodeling_spark.queries import REGISTRY

    rows = REGISTRY["q258_source_reweighting"].fn(
        spark, "/root/testdata/sf0.001"
    ).collect()
    docs = pd.read_parquet("/root/testdata/sf0.001/documents.parquet")
    per = {}
    for _, doc in docs.iterrows():
        n = len([t for t in re.split(r"[^a-z0-9]+", doc.text.lower()) if t])
        d, s = per.get(doc.source, (0, 0))
        per[doc.source] = (d + 1, s + n)
    k = len(per)
    n_total = sum(s for _, s in per.values())
    assert len(rows) == k
    for r in rows:
        d, s = per[r.source]
        assert (r.n_docs, r.n_tokens) == (d, s)
        assert r.weight_milli == round(1000.0 * n_total / (k * s))
        assert r.capped_milli == min(r.weight_milli, 1000)
        assert r.eff_tokens == s * r.capped_milli // 1000
        # downsample-only: the capped mix never repeats data
        assert r.eff_tokens <= r.n_tokens
    # the capped mix fits inside the corpus budget
    assert sum(r.eff_tokens for r in rows) <= n_total


def test_q272_weighted_topk_matches_replay(spark):
    import hashlib
    import math
    import re

    import pandas as pd

    from columnarmodeling_spark.queries import REGISTRY
    from columnarmodeling_spark.queries.llm_pipeline import _ES_K, _ES_U

    rows = REGISTRY["q272_weighted_topk_sample"].fn(
        spark, "/root/testdata/sf0.001"
    ).collect()
    docs = pd.read_parquet("/root/testdata/sf0.001/documents.parquet")
    keyed = {}
    for _, doc in docs.iterrows():
        nt = len(
            [t for t in re.split(r"[^a-z0-9]+", doc.text.lower()) if t]
        )
        if nt == 0:
            continue
        hk = int(
            hashlib.md5(str(doc.doc_id).encode()).hexdigest()[:5], 16
        )
        key = round(1000000.0 * math.log((hk + 1.0) / _ES_U) / nt)
        keyed.setdefault(doc.source, []).append((key, int(doc.doc_id), nt))
    want = {}
    for src, lst in keyed.items():
        lst.sort(key=lambda kv: (-kv[0], kv[1]))
        want[src] = lst[:_ES_K]
    assert len(rows) == sum(min(_ES_K, len(v)) for v in want.values())
    for r in rows:
        key, doc_id, nt = want[r.source][r.pick - 1]
        assert (r.doc_id, r.nt, r.key_micro) == (doc_id, nt, key), (
            r.source,
            r.pick,
        )
        # the ES key is ln of a (0,1] uniform scaled by 1/w: never positive
        assert r.key_micro <= 0


def test_q280_gtest_keyness_matches_replay(spark):
    import math
    import re
    from collections import Counter

    import pandas as pd

    rows = REGISTRY["q280_gtest_keyness"].fn(
        spark, "/root/testdata/sf0.001"
    ).collect()
    docs = pd.read_parquet("/root/testdata/sf0.001/documents.parquet")
    cnt_en, cnt_rest = Counter(), Counter()
    for _, doc in docs.iterrows():
        tk = [t for t in re.split(r"[^a-z0-9]+", doc.text.lower()) if t]
        tgt = cnt_en if doc.lang == "en" else cnt_rest
        for t_ in tk:
            tgt[t_] += 1
    na = sum(cnt_en.values())
    nb = sum(cnt_rest.values())

    def g(tok):
        a, b = cnt_en[tok], cnt_rest[tok]
        tot = a + b
        ga = (
            a * round(1000000.0 * math.log(a * (na + nb) / (na * tot)))
            if a > 0
            else 0
        )
        gb = (
            b * round(1000000.0 * math.log(b * (na + nb) / (nb * tot)))
            if b > 0
            else 0
        )
        return 2 * (ga + gb)

    vocab = set(cnt_en) | set(cnt_rest)
    want = sorted(((g(t_), t_) for t_ in vocab), key=lambda x: (-x[0], x[1]))
    assert len(rows) == 20
    for r, (gm, tok) in zip(rows, want[:20]):
        assert (r.tok, r.cnt_en, r.cnt_rest, r.g_micro) == (
            tok, cnt_en[tok], cnt_rest[tok], gm,
        )
    # a token seen ONLY in the en sub-corpus has positive keyness
    only_en = next(
        (t_ for t_ in vocab if cnt_rest[t_] == 0 and cnt_en[t_] > 0), None
    )
    if only_en is not None:
        assert g(only_en) > 0


def test_q284_neyman_sample_matches_replay(spark):
    import hashlib
    import math
    import re

    import pandas as pd

    rows = REGISTRY["q284_neyman_sample"].fn(
        spark, "/root/testdata/sf0.001"
    ).collect()
    docs = pd.read_parquet("/root/testdata/sf0.001/documents.parquet")
    per = {}
    for _, doc in docs.iterrows():
        nt = len([t for t in re.split(r"[^a-z0-9]+", doc.text.lower()) if t])
        key = int(hashlib.md5(str(doc.doc_id).encode()).hexdigest()[:5], 16)
        per.setdefault(doc.source, []).append((key, int(doc.doc_id), nt))
    stats = {}
    for src, lst in per.items():
        n = len(lst)
        sy = sum(nt for _, _, nt in lst)
        sy2 = sum(nt * nt for _, _, nt in lst)
        s_micro = (
            round(1000000.0 * math.sqrt((n * sy2 - sy * sy)
                                        / (float(n) * (n - 1))))
            if n > 1
            else 0
        )
        stats[src] = (n, s_micro)
    tot_w = sum(n * s for n, s in stats.values())
    alloc = {
        src: min(n, round(100.0 * (n * s) / tot_w) if tot_w > 0 else 0)
        for src, (n, s) in stats.items()
    }
    want = {}
    for src, lst in per.items():
        lst.sort(key=lambda kv: (-kv[0], kv[1]))
        want[src] = lst[: alloc[src]]
    assert len(rows) == sum(len(v) for v in want.values())
    for r in rows:
        key, doc_id, nt = want[r.source][r.pick - 1]
        assert (r.doc_id, r.nt, r.n_alloc, r.s_micro) == (
            doc_id, nt, alloc[r.source], stats[r.source][1],
        ), (r.source, r.pick)
    # allocation respects stratum size and lands near the budget
    assert all(alloc[s] <= stats[s][0] for s in alloc)
    assert abs(sum(alloc.values()) - 100) <= len(alloc)


def test_q285_burrows_delta_matches_replay(spark):
    import math
    import re
    from collections import Counter

    import pandas as pd

    rows = REGISTRY["q285_burrows_delta"].fn(
        spark, "/root/testdata/sf0.001"
    ).collect()

    def rnd(x):  # SQL round: half away from zero (Python round is half-even)
        return math.floor(x + 0.5) if x >= 0 else -math.floor(-x + 0.5)

    docs = pd.read_parquet("/root/testdata/sf0.001/documents.parquet")
    cnt = {}
    for _, doc in docs.iterrows():
        c = cnt.setdefault(doc.source, Counter())
        for tk in re.split(r"[^a-z0-9]+", doc.text.lower()):
            if tk:
                c[tk] += 1
    tot = Counter()
    for c in cnt.values():
        tot.update(c)
    markers = [
        tk for tk, _ in sorted(tot.items(), key=lambda kv: (-kv[1], kv[0]))
    ][:30]
    srcs = sorted(cnt)
    nt = {s: sum(cnt[s].values()) for s in srcs}
    f = {
        (s, tk): rnd(1000000.0 * cnt[s][tk] / nt[s])
        for s in srcs
        for tk in markers
    }
    z = {}
    m = len(srcs)
    for tk in markers:
        vals = [f[(s, tk)] for s in srcs]
        sf, sf2 = sum(vals), sum(v * v for v in vals)
        if m > 1 and m * sf2 > sf * sf:
            sd = math.sqrt((m * sf2 - sf * sf) / (float(m) * (m - 1)))
            for s in srcs:
                z[(s, tk)] = rnd(1000.0 * (f[(s, tk)] - sf / m) / sd)
        else:
            for s in srcs:
                z[(s, tk)] = 0
    assert len(rows) == m * (m - 1) // 2
    for r in rows:
        sa = sum(abs(z[(r.s1, tk)] - z[(r.s2, tk)]) for tk in markers)
        assert (r.sum_abs, r.delta_milli) == (sa, rnd(sa / 30.0)), (
            r.s1, r.s2,
        )
        # Delta is a metric-like distance: non-negative, symmetric pairs
        assert r.delta_milli >= 0 and r.s1 < r.s2


def test_q293_lsh_blocking_recall_matches_replay(spark):
    import hashlib
    import re
    from collections import Counter

    import pandas as pd

    (row,) = REGISTRY["q293_lsh_blocking_recall"].fn(
        spark, "/root/testdata/sf0.001"
    ).collect()
    docs = pd.read_parquet("/root/testdata/sf0.001/documents.parquet")
    P = 2147483647
    # repo constants — import to stay in lockstep
    from columnarmodeling_spark.queries.llm_dedup import MINHASH_AB as AB
    sh = {}
    for _, doc in docs.iterrows():
        tk = [t for t in re.split(r"[^a-z0-9]+", doc.text.lower()) if t]
        sh[doc.doc_id] = {
            " ".join(tk[i:i + 3]) for i in range(len(tk) - 2)
        }
    truth = set()
    ids = sorted(sh)
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            inter = len(sh[a] & sh[b])
            if inter and 3 * inter >= len(sh[a]) + len(sh[b]):
                truth.add((a, b))
    sig = {}
    for d, ss in sh.items():
        us = [
            int(hashlib.md5(s.encode()).hexdigest()[:15], 16) % P
            for s in ss
        ]
        sig[d] = (
            [min((a * u + b) % P for u in us) for a, b in AB]
            if us
            else None
        )
    buckets = {}
    for d, mh in sig.items():
        if mh is None:
            continue
        for k in range(4):
            buckets.setdefault(
                (k, mh[2 * k] * P + mh[2 * k + 1]), []
            ).append(d)
    cand = set()
    for mem in buckets.values():
        for i, a in enumerate(sorted(mem)):
            for b in sorted(mem)[i + 1:]:
                cand.add((a, b))
    hit = truth & cand
    assert (row.n_truth, row.n_cand, row.n_hit) == (
        len(truth), len(cand), len(hit),
    )
    assert row.n_truth > 0 and row.n_cand > 0  # non-trivial eval
    want_r = round(1000.0 * len(hit) / len(truth)) if truth else 0
    want_p = round(1000.0 * len(hit) / len(cand)) if cand else 0
    assert (row.recall_milli, row.precision_milli) == (want_r, want_p)


def test_q294_kwic_matches_replay(spark):
    import re

    import pandas as pd

    rows = REGISTRY["q294_kwic_concordance"].fn(
        spark, "/root/testdata/sf0.001"
    ).collect()
    docs = pd.read_parquet("/root/testdata/sf0.001/documents.parquet")
    want = []
    for _, doc in docs.iterrows():
        tk = [t for t in re.split(r"[^a-z0-9]+", doc.text.lower()) if t]
        for i, term in enumerate(tk):
            if term in ("data", "row", "table"):
                want.append((
                    doc.doc_id, i + 1, term,
                    " ".join(tk[max(i - 2, 0):i]),
                    " ".join(tk[i + 1:i + 3]),
                ))
    want.sort()
    got = sorted(
        (r.doc_id, r.pos, r.term, r.left_ctx, r.right_ctx) for r in rows
    )
    assert got == want
    assert len(got) > 0
    # boundary behavior: the first-token occurrences have empty left ctx
    firsts = [g for g in got if g[1] == 1]
    assert all(g[3] == "" for g in firsts)


def test_q295_heldout_perplexity_matches_replay(spark):
    import hashlib
    import math
    import re
    from collections import Counter

    import pandas as pd

    rows = REGISTRY["q295_heldout_perplexity"].fn(
        spark, "/root/testdata/sf0.001"
    ).collect()
    docs = pd.read_parquet("/root/testdata/sf0.001/documents.parquet")

    def split(doc_id):
        return int(
            hashlib.md5(str(doc_id).encode()).hexdigest()[:4], 16
        ) % 10

    tr_bg, vocab = Counter(), set()
    te = []
    for _, doc in docs.iterrows():
        tk = [t for t in re.split(r"[^a-z0-9]+", doc.text.lower()) if t]
        if split(doc.doc_id) != 0:
            vocab.update(tk)
            tr_bg.update(zip(tk, tk[1:]))
        else:
            te.append((doc.source, tk))
    tr_uni = Counter()
    for (w1, _), c in tr_bg.items():
        tr_uni[w1] += c
    v = len(vocab) + 1
    per = {}
    for source, tk in te:
        mapped = [
            (w if w in vocab else "<unk>", 0 if w in vocab else 1)
            for w in tk
        ]
        for (w1, o1), (w2, o2) in zip(mapped, mapped[1:]):
            lp = round(
                1000000.0 * math.log(
                    (tr_bg.get((w1, w2), 0) + 1)
                    / (tr_uni.get(w1, 0) + v)
                )
            )
            n, oo, s = per.get(source, (0, 0, 0))
            per[source] = (n + 1, oo + (1 if o1 + o2 > 0 else 0), s + lp)
    got = {r.source: r for r in rows}
    assert sorted(got) == sorted(per)
    for src_, (n, oo, s) in per.items():
        r = got[src_]
        assert (r.n_bigrams, r.n_oov_bigrams, r.sum_logp_micro) == (n, oo, s)
        want = round(1000.0 * math.exp(-(s / 1000000.0) / n))
        assert r.ppl_milli == want
        # add-one smoothed perplexity is bounded by vocab+1 (uniform)
        assert 1000 <= r.ppl_milli <= 1000 * v


def test_q296_sq8_distortion_matches_replay(spark):
    import math

    import pandas as pd

    rows = REGISTRY["q296_sq8_distortion"].fn(
        spark, "/root/testdata/sf0.001"
    ).collect()
    emb = pd.read_parquet("/root/testdata/sf0.001/embeddings.parquet")
    # exact float32 -> float64 widening, matching both engines' CASTs
    # (numpy float32 intermediates would differ in the 7th digit)
    vecs = {
        r.vec_id: [float(x) for x in r.embedding] for _, r in emb.iterrows()
    }
    n_dim = len(next(iter(vecs.values())))
    mn = [min(v[i] for v in vecs.values()) for i in range(n_dim)]
    mx = [max(v[i] for v in vecs.values()) for i in range(n_dim)]

    def rnd(x):
        return math.floor(x + 0.5) if x >= 0 else -math.floor(-x + 0.5)

    want = {}
    for vid, v in vecs.items():
        s = 0
        for i in range(n_dim):
            if mx[i] > mn[i]:
                scale = (mx[i] - mn[i]) / 255.0
                rec = mn[i] + rnd((v[i] - mn[i]) / scale) * scale
                s += rnd(1e12 * (v[i] - rec) * (v[i] - rec))
        want[vid] = s
    got = {r.vec_id: r for r in rows}
    assert sorted(got) == sorted(want)
    for vid, r in got.items():
        assert r.n_dims == n_dim
        assert r.sq_err_pico == want[vid], vid
        # each dim errs at most (scale/2)^2; bound the vector total
        bound = sum(
            rnd(1e12 * ((mx[i] - mn[i]) / 510.0) ** 2) + 1
            for i in range(n_dim)
        )
        assert 0 <= r.sq_err_pico <= bound


def test_q302_fisher_separability_matches_replay(spark):
    import math

    import pandas as pd

    rows = REGISTRY["q302_fisher_separability"].fn(
        spark, "/root/testdata/sf0.001"
    ).collect()
    emb = pd.read_parquet("/root/testdata/sf0.001/embeddings.parquet")

    def rnd(x):
        return math.floor(x + 0.5) if x >= 0 else -math.floor(-x + 0.5)

    per = {}
    for _, r in emb.iterrows():
        for i, x in enumerate(r.embedding, 1):
            u = rnd(1000000.0 * float(x))
            n, s, s2 = per.get((i, r.label), (0, 0, 0))
            per[(i, r.label)] = (n + 1, s + u, s2 + u * u)
    dims = {}
    for (i, _), (n, s, s2) in per.items():
        ssw_c = rnd(float(s2) - float(s) * s / n)
        sb_c = rnd(float(s) * s / n)
        k, nn, st, ssw, sb = dims.get(i, (0, 0, 0, 0, 0))
        dims[i] = (k + 1, nn + n, st + s, ssw + ssw_c, sb + sb_c)
    got = {r.dim: r for r in rows}
    assert sorted(got) == sorted(dims)
    for i, (k, n, st, ssw, sb) in dims.items():
        ssb = sb - rnd(float(st) * st / n)
        r = got[i]
        assert (r.k, r.n, r.ssb, r.ssw) == (k, n, ssb, ssw), i
        want = (
            rnd(1000.0 * (ssb / (k - 1)) / (ssw / (n - k)))
            if ssw > 0 and k > 1 and n > k
            else 0
        )
        assert r.f_milli == want, i
    # F ratios are non-negative up to the per-class quantization noise
    assert all(r.f_milli >= -1 for r in rows)


def test_q305_ivf_mrr_bounds(spark):
    """MRR invariants against its own components: every found query
    contributes a reciprocal rank in [1/3, 1] (top-3 list), misses
    contribute 0, and the mean respects those bounds; the query count
    is the fixed md5 probe sample."""
    (row,) = REGISTRY["q305_ivf_mrr"].fn(
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert 0 < row.n_queries <= 32
    assert 0 <= row.n_found <= row.n_queries
    assert 333333 * row.n_found <= row.sum_rr_micro <= 1000000 * row.n_found
    assert row.mrr_micro == round(row.sum_rr_micro / row.n_queries)
    assert 0 <= row.mrr_micro <= 1000000
    # the eval must actually find neighbors on this corpus
    assert row.n_found > 0


def test_q305_ivf_mrr_matches_replay(spark):
    """Pure-pandas replay of the full MRR tail at sf0.001 — the exact
    top-1 per md5-sampled probe, its rank inside the nprobe=2
    adaptive-IVF top-3 (sqrt-n md5 seeds, min-d2 cell assignment), and
    the micro-quantized reciprocal-rank sum — so the query's numeric
    correctness no longer rests solely on the generic oracle-parity
    harness (ADVICE r10), matching the q293/q295 replay discipline."""
    import hashlib
    import math

    import numpy as np
    import pandas as pd

    (row,) = REGISTRY["q305_ivf_mrr"].fn(
        spark, "/root/testdata/sf0.001"
    ).collect()
    emb = pd.read_parquet("/root/testdata/sf0.001/embeddings.parquet")

    def rnd(x):
        return math.floor(x + 0.5) if x >= 0 else -math.floor(-x + 0.5)

    ids = emb.vec_id.to_numpy(np.int64)
    mat = np.array(
        [[rnd(1000.0 * float(x)) for x in v] for v in emb.embedding],
        dtype=np.int64,
    )
    n2 = (mat * mat).sum(axis=1)
    # md5-ranked prefix draws: 32 probes and ceil(sqrt(n)) seeds
    md5rk = sorted(
        range(len(ids)),
        key=lambda i: (
            hashlib.md5(str(int(ids[i])).encode()).hexdigest(),
            int(ids[i]),
        ),
    )
    probe_pos = md5rk[:32]
    seed_pos = md5rk[: math.ceil(math.sqrt(len(ids)))]
    # route every vector: crk by (d2-to-seed, sid); cell ids are seed ids
    cells_1 = {}  # vec pos -> assigned seed id (crk == 1)
    cells_2 = {}  # vec pos -> the two probed seed ids (crk <= 2)
    for i in range(len(ids)):
        d2 = [
            (int(((mat[i] - mat[s]) ** 2).sum()), int(ids[s]))
            for s in seed_pos
        ]
        d2.sort()
        cells_1[i] = d2[0][1]
        cells_2[i] = {d2[0][1], d2[1][1]}
    # integer-quantized cosine: c9 = rnd(1e9 * dot / sqrt(n2a*n2b))
    dots = mat @ mat.T
    inv = 1.0 / np.sqrt(n2[:, None].astype(np.float64) * n2[None, :])
    c9 = np.vectorize(rnd)(1e9 * dots * inv).astype(np.int64)
    by_cell = {}
    for i in range(len(ids)):
        by_cell.setdefault(cells_1[i], []).append(i)
    sum_rr = 0
    n_found = 0
    for p in probe_pos:
        order = sorted(
            (j for j in range(len(ids)) if j != p),
            key=lambda j: (-c9[p, j], int(ids[j])),
        )
        exact1 = order[0]
        cand = sorted(
            (
                j
                for cell in cells_2[p]
                for j in by_cell.get(cell, [])
                if j != p
            ),
            key=lambda j: (-c9[p, j], int(ids[j])),
        )[:3]
        if exact1 in cand:
            n_found += 1
            sum_rr += rnd(1000000.0 / (cand.index(exact1) + 1))
    assert row.n_queries == 32
    assert row.n_found == n_found
    assert row.sum_rr_micro == sum_rr
    assert row.mrr_micro == rnd(sum_rr / 32.0)


def test_q309_langid_macro_f1_matches_replay(spark):
    import math
    import re

    import pandas as pd

    rows = REGISTRY["q309_langid_macro_f1"].fn(
        spark, "/root/testdata/sf0.001"
    ).collect()
    docs = pd.read_parquet("/root/testdata/sf0.001/documents.parquet")
    m = {
        "en": {"the", "and", "of", "row", "table"},
        "es": {"el", "la", "de", "fila", "tabla"},
        "zh": {"zh", "biao", "hang", "lie", "shuju"},
    }

    def rnd(x):
        return math.floor(x + 0.5) if x >= 0 else -math.floor(-x + 0.5)

    per = {}
    for _, doc in docs.iterrows():
        tk = [t for t in re.split(r"[^a-z0-9]+", doc.text.lower()) if t]
        s = {c: sum(1 for t_ in tk if t_ in m[c]) for c in ("en", "es", "zh")}
        if s["en"] >= s["es"] and s["en"] >= s["zh"]:
            g = "en"
        elif s["es"] >= s["zh"]:
            g = "es"
        else:
            g = "zh"
        per.setdefault(doc.source, []).append((doc.lang, g))
    got = {r.source: r for r in rows}
    assert sorted(got) == sorted(per)
    for src_, pairs in per.items():
        n = len(pairs)
        n_correct = sum(1 for y, g in pairs if y == g)
        f1s = []
        for c in ("en", "es", "zh"):
            tp = sum(1 for y, g in pairs if y == c and g == c)
            fp = sum(1 for y, g in pairs if y != c and g == c)
            fn = sum(1 for y, g in pairs if y == c and g != c)
            f1s.append(
                rnd(1000000.0 * 2 * tp / (2 * tp + fp + fn))
                if 2 * tp + fp + fn > 0
                else 0
            )
        r = got[src_]
        assert (r.n, r.n_correct) == (n, n_correct), src_
        assert r.accuracy_milli == rnd(1000.0 * n_correct / n)
        assert r.macro_f1_micro == rnd(sum(f1s) / 3.0), src_
        # macro F1 and accuracy are both rates
        assert 0 <= r.macro_f1_micro <= 1000000
