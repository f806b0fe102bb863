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


if __name__ == "__main__":
    main()
