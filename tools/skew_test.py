"""Measure the documented skew escapes.

1. Hot-cell proximity join: every point lands in ONE grid cell, so the
   unsalted equi-join computes the whole O(n²) candidate space in a
   single task; ``salt`` shards it into `salt` parallel tasks.
2. Hot-shingle Jaccard join: one stopword shingle in every document
   links all C(n,2) pairs; ``max_df`` drops it before the join.
3. Forced-hot-4-gram span dedup (q109): a boilerplate sentence in EVERY
   document makes its 4-grams maximally hot (df = n_docs). Unlike the
   Jaccard pair join there is no pair space to explode — the hot side is
   DISTINCT grams, so the spans join fans out <= 1 per gram occurrence,
   and df counting is a two-phase agg. Expected: boilerplate-everywhere
   costs about the same as a clean corpus at equal token count.

4. Hub-node LPA round (q193 core): a star graph puts one node at
   degree n-1. The most-frequent-label pick is a lexicographic
   struct-max HASH AGG (partial/final combinable), so the hub's label
   counts combine map-side instead of serializing through one window
   partition. Expected: star ~ ring at equal edge count.
5. Hot-user EWMA fold (q194 core): all events on ONE user makes a
   single collect_list buffer + one sequential fold task. Measured to
   document the stated bound (linear single-task cost; the associative
   affine (A, B) segmented form is the escape past ~1e8 events).

Usage: python tools/skew_test.py [n_points] [n_docs]
Prints one timing line per variant (steady-state: untimed warm pass
first at small n to JIT/codegen, then the measured run).
"""

from __future__ import annotations

import random
import sys
import time

import pyspark.sql.functions as F

sys.path.insert(0, "/root/repo")

from columnarmodeling_spark.operators.proximity import grid_proximity_join
from columnarmodeling_spark.queries.llm_dedup import jaccard_pairs_from_shingles
from columnarmodeling_spark.session import get_spark


def main() -> None:
    n_pts = int(sys.argv[1]) if len(sys.argv) > 1 else 6000
    n_docs = int(sys.argv[2]) if len(sys.argv) > 2 else 2000
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    rng = random.Random(7)

    # --- hot-cell proximity: all points inside one eps-cell -------------
    pts = [
        (i, rng.random() * 0.9, rng.random() * 0.9) for i in range(n_pts)
    ]
    df = spark.createDataFrame(pts, "id long, x double, y double").cache()
    df.count()

    for salt in (1, 16):
        t0 = time.time()
        n_pairs = grid_proximity_join(
            df, eps=1.0, coords=("x", "y"), salt=salt
        ).count()
        print(
            f"proximity hot-cell n={n_pts} salt={salt}: "
            f"{time.time() - t0:.2f}s pairs={n_pairs}"
        )

    # --- hot-shingle jaccard: one stopword gram in every doc ------------
    rows = []
    for i in range(n_docs):
        rows += [(i, f"u{i}{j}") for j in range(8)] + [(i, "hot")]
    sh = spark.createDataFrame(rows, "doc_id long, s string").cache()
    sh.count()

    for max_df in (None, 50):
        t0 = time.time()
        n_pairs = jaccard_pairs_from_shingles(sh, tau=0.01, max_df=max_df)
        n = n_pairs.count()
        print(
            f"jaccard hot-shingle docs={n_docs} max_df={max_df}: "
            f"{time.time() - t0:.2f}s pairs={n}"
        )

    # --- forced-hot-4-gram span dedup (q109 core) -----------------------
    from columnarmodeling_spark.queries.llm_dedup import span_dedup_stats

    boiler = "terms of service apply to all content herein"  # 8 tokens
    for variant in ("clean", "boilerplate"):
        rows = []
        for i in range(n_docs):
            uniq = " ".join(f"u{i}x{j}" for j in range(40))
            text = uniq if variant == "clean" else f"{boiler} {uniq}"
            rows.append((i, text))
        docs = spark.createDataFrame(rows, "doc_id long, text string").cache()
        docs.count()
        # warm pass then timed (steady-state, same discipline as above)
        for timed in (False, True):
            t0 = time.time()
            agg = span_dedup_stats(docs).agg(
                F.sum("n_spans"), F.sum("n_removed")
            ).collect()[0]
            if timed:
                print(
                    f"span-dedup {variant} docs={n_docs}: "
                    f"{time.time() - t0:.2f}s spans={agg[0]} "
                    f"removed={agg[1]}"
                )
        docs.unpersist()

    # --- hot-term TF-IDF cosine join (q169 core) ------------------------
    # One stopword term in EVERY document: without the df cutoff the
    # posting self-join on that term alone produces C(n_docs, 2) pairs in
    # one task; with the cutoff its postings are dropped BEFORE the join
    # (the exact max_df escape as the Jaccard case, on the weighted
    # join). Docs also share per-cluster rare terms so real pairs exist.
    wt_rows = []
    for i in range(n_docs):
        wt_rows.append((i, "hot", 100))          # df = n_docs
        for j in range(6):
            wt_rows.append((i, f"c{i // 4}t{j}", 500))  # df = 4 cluster terms
    wt = spark.createDataFrame(
        wt_rows, "doc_id long, w string, wgt long"
    ).cache()
    wt.count()
    dfreq = wt.groupBy("w").agg(F.count("*").alias("df")).cache()
    dfreq.count()

    for cutoff in (None, 50):
        posts = wt.join(dfreq, "w")
        if cutoff is not None:
            posts = posts.filter(F.col("df") <= cutoff)
        a = posts.select(
            F.col("doc_id").alias("src"), "w", F.col("wgt").alias("wa")
        )
        b = wt.select(
            F.col("doc_id").alias("dst"), "w", F.col("wgt").alias("wb")
        )
        for timed in (False, True):
            t0 = time.time()
            n = (
                a.join(b, "w")
                .filter(F.col("src") < F.col("dst"))
                .groupBy("src", "dst")
                .agg(F.sum(F.col("wa") * F.col("wb")).alias("dp"))
                .count()
            )
            if timed:
                print(
                    f"tfidf hot-term docs={n_docs} max_df={cutoff}: "
                    f"{time.time() - t0:.2f}s pairs={n}"
                )

    _round7_scenarios(spark, n_nodes=max(n_pts, 6000))
    _round8_scenarios(spark)
    _round14_scenarios(spark)


def _round7_scenarios(spark, n_nodes: int) -> None:
    # --- hub-node LPA round (q193 core) ---------------------------------
    star = spark.createDataFrame(
        [(0, i) for i in range(1, n_nodes)], "src long, dst long"
    )
    ring = spark.createDataFrame(
        [(i, (i + 1) % n_nodes) for i in range(n_nodes)],
        "src long, dst long",
    )
    for name, edges in (("star", star), ("ring", ring)):
        und = edges.unionByName(
            edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        ).cache()
        und.count()
        lbl = (
            und.select(F.col("src").alias("id"))
            .distinct()
            .select("id", F.col("id").alias("lbl"))
            .cache()
        )
        lbl.count()
        for timed in (False, True):
            t0 = time.time()
            n = (
                und.join(
                    lbl.select(F.col("id").alias("dst"), "lbl"), "dst"
                )
                .groupBy(F.col("src").alias("id"), "lbl")
                .agg(F.count("*").alias("cnt"))
                .groupBy("id")
                .agg(
                    F.max(
                        F.struct(F.col("cnt"), (-F.col("lbl")).alias("nl"))
                    ).alias("m")
                )
                .count()
            )
            if timed:
                print(
                    f"lpa-round {name} nodes={n_nodes}: "
                    f"{time.time() - t0:.2f}s picks={n}"
                )
        und.unpersist()
        lbl.unpersist()

    # --- hot-user EWMA fold (q194 core) ---------------------------------
    n_ev = n_nodes * 4
    for name, n_users in (("spread", 500), ("one-user", 1)):
        ev = spark.range(n_ev).select(
            (F.col("id") % n_users).alias("user_id"),
            F.col("id").alias("us"),
            F.col("id").alias("event_id"),
            (F.col("id") % 97).cast("double").alias("value"),
        ).cache()
        ev.count()
        g = ev.groupBy("user_id").agg(
            F.array_sort(
                F.collect_list(F.struct("us", "event_id", "value"))
            ).alias("s")
        )
        vals = F.transform("s", lambda e: e["value"])
        ewma = F.aggregate(
            F.slice(vals, 2, F.greatest(F.size(vals) - 1, F.lit(0))),
            F.element_at(vals, 1),
            lambda acc, x: F.lit(0.25) * x + F.lit(0.75) * acc,
        )
        for timed in (False, True):
            t0 = time.time()
            g.select("user_id", ewma.alias("e")).count()
            if timed:
                print(
                    f"ewma {name} events={n_ev} users={n_users}: "
                    f"{time.time() - t0:.2f}s"
                )
        ev.unpersist()


def _round8_scenarios(spark, n_ev: int = 1_000_000) -> None:
    # --- single-user 1M-event EWMA: plain fold vs segmented (q208) ------
    # The q194 docstring's stated bound: one user's whole history in one
    # collect_list buffer + one sequential fold task. q208's registered
    # escape chunks the history (here 64 chunks), so no buffer exceeds
    # n_ev/64 and chunk folds run in parallel; results must agree to
    # re-association noise.
    from columnarmodeling_spark.queries.timeseries import segmented_ewma

    ev = spark.range(n_ev).select(
        F.lit(0).cast("long").alias("user_id"),
        F.col("id").alias("us"),
        F.col("id").alias("event_id"),
        (F.col("id") % 97).cast("double").alias("value"),
    ).cache()
    ev.count()

    g = ev.groupBy("user_id").agg(
        F.array_sort(
            F.collect_list(F.struct("us", "event_id", "value"))
        ).alias("s")
    )
    vals = F.transform("s", lambda e: e["value"])
    plain = g.select(
        "user_id",
        F.aggregate(
            F.slice(vals, 2, F.greatest(F.size(vals) - 1, F.lit(0))),
            F.element_at(vals, 1),
            lambda acc, x: F.lit(0.25) * x + F.lit(0.75) * acc,
        ).alias("ewma"),
    )
    seg = segmented_ewma(ev, max(1, n_ev // 64))
    results = {}
    for name, df in (("plain-fold", plain), ("segmented-64", seg)):
        for timed in (False, True):
            t0 = time.time()
            row = df.collect()[0]
            if timed:
                results[name] = row["ewma"]
                print(
                    f"ewma one-user events={n_ev} {name}: "
                    f"{time.time() - t0:.2f}s ewma={row['ewma']:.9f}"
                )
    print(
        "ewma one-user plain-vs-segmented |diff| = "
        f"{abs(results['plain-fold'] - results['segmented-64']):.3e}"
    )
    ev.unpersist()


def _round14_scenarios(spark, n_docs: int = 20_000) -> None:
    # --- Zipf-hot head token in the q330 suffix sort ---------------------
    # Every other token is "the", so HALF of all corpus suffixes share
    # one head token — with the escape off that is ONE window partition
    # (one straggler sort task holding n_docs*30 suffix rows); with the
    # escape on the hot head auto-widens to (head, second token) and the
    # second tokens are document-unique, so the hot mass shards across
    # the cluster. The r13 forced-scale row used disjoint-vocab replicas
    # that CANNOT exhibit this skew (r13 verdict item 2); this is the
    # forced-skew measurement that can. Outputs must agree exactly —
    # the escape's whole point is being lossless.
    from columnarmodeling_spark.queries.llm_dedup import suffix_repeat_stats

    docs = spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        F.expr(
            "concat_ws(' ', transform(sequence(1, 60), "
            "i -> IF(i % 2 = 0, 'the', concat('d', id, 'x', i))))"
        ).alias("text"),
    ).cache()
    docs.count()
    results = {}
    for name, thresh in (("escape-off", 1 << 60), ("escape-on", 100_000)):
        for timed in (False, True):
            # rebuild the pipeline per pass: a reused DataFrame would
            # skip its shuffle map stages on the second collect and the
            # "timed" number would measure only the final stage
            agg = suffix_repeat_stats(
                docs, hot_head_threshold=thresh
            ).agg(
                F.sum("max_repeat").alias("smr"),
                F.sum("n_rep_pos").alias("srp"),
            )
            t0 = time.time()
            row = agg.collect()[0]
            if timed:
                results[name] = (row["smr"], row["srp"])
                print(
                    f"q330 zipf-hot-head docs={n_docs} {name}: "
                    f"{time.time() - t0:.2f}s sum_max_repeat={row['smr']} "
                    f"sum_n_rep_pos={row['srp']}"
                )
    assert results["escape-off"] == results["escape-on"], results
    print("q330 zipf-hot-head escape-off == escape-on: outputs identical")
    docs.unpersist()


if __name__ == "__main__":
    main()
