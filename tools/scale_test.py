"""Scale experiment: replicate the sf0.1 tables K× (key-shifted) into a
scratch dir and measure flagship operators at 1× vs K×.

The point is evidence for the 100 TB design claims: the binned joins,
LSH dedup, and hash aggregations must scale ~linearly in rows (and the
brute-force ANN baseline must NOT — its quadratic growth is exactly why
q47/q49 are the documented scale paths).

Run: python tools/scale_test.py [K] [SRC_SF_DIR] [SCRATCH]
Writes results as a JSON line; SCALE.md narrates the findings.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from columnarmodeling_spark.queries import REGISTRY  # noqa: E402
from columnarmodeling_spark.session import get_spark  # noqa: E402

# key-shift offsets comfortably above any sf0.1 key range
_SHIFT = 10_000_000

_MEASURE = [
    "q01_pricing_summary",
    "q30_proximity_pairs",
    "q42_ngram_jaccard_pairs",
    "q44_lsh_candidates",
    "q49_embedding_neardup",
    "q51_quality_score",
    "q56_dup_clusters",
    "q96_ivf_adaptive",
    "q97_bm25_topterms",
    "q99_rollup_cascade",
    "q103_range_frame",
    "q107_bond_breaks",
    "q109_span_dedup",
]

# events is nanos-typed at the driver-provided source; the replica is
# read through the catalog (ns -> µs truncation) and re-written as µs,
# which the catalog passes through unchanged — same instants either way.
_TABLES = [
    "lineitem", "customer", "documents", "embeddings", "orders", "events",
    "part", "nation",
]


def build(spark, src: str, out: str, k: int) -> None:
    reps = spark.range(k).withColumnRenamed("id", "rep")
    from columnarmodeling_spark.catalog import table

    for name in _TABLES:
        if os.path.exists(os.path.join(out, f"{name}.parquet")):
            continue  # per-table idempotent: late-added tables backfill
        df = (
            table(spark, src, name)
            if name == "events"
            else spark.read.parquet(os.path.join(src, f"{name}.parquet"))
        )
        r = df.crossJoin(F.broadcast(reps))
        shift = F.col("rep") * _SHIFT
        if name == "lineitem":
            r = r.withColumn("l_orderkey", F.col("l_orderkey") + shift)
        elif name == "orders":
            r = r.withColumn("o_orderkey", F.col("o_orderkey") + shift)
            r = r.withColumn("o_custkey", F.col("o_custkey") + shift)
        elif name == "customer":
            r = r.withColumn("c_custkey", F.col("c_custkey") + shift)
            # replicas become SPATIALLY disjoint for the solver law
            # kernels (q192/q205 use c_acctbal as the x coordinate):
            # +20k per replica clears the ~[-1k, 10k] acctbal range, so
            # a K× corpus is K disjoint domains at CONSTANT density —
            # the 100 TB scale-up semantics (more domain, same physics).
            # Without this the replicas interleave in the same band and
            # the proximity pair space grows ~K² per grid cell, which
            # measures densification, not scale.
            r = r.withColumn(
                "c_acctbal", F.col("c_acctbal") + F.col("rep") * 20_000.0
            )
        elif name == "documents":
            r = r.withColumn("doc_id", F.col("doc_id") + shift)
            # prefix every token with the replica id: replicas become
            # shingle-disjoint, so the near-dup pair space grows linearly
            # (k independent corpora), not quadratically (k^2 clone pairs)
            r = r.withColumn(
                "text",
                F.regexp_replace(
                    F.col("text"),
                    F.lit("([a-z0-9]+)"),
                    F.concat(F.lit("r"), F.col("rep").cast("string"), F.lit("$1")),
                ),
            )
        elif name == "embeddings":
            r = r.withColumn("vec_id", F.col("vec_id") + shift)
        elif name == "events":
            r = r.withColumn("event_id", F.col("event_id") + shift)
            r = r.withColumn("user_id", F.col("user_id") + shift)
        elif name == "part":
            # prices/sizes stay identical across replicas: the skyline's
            # per-price agg must absorb 16 duplicates per level
            r = r.withColumn("p_partkey", F.col("p_partkey") + shift)
        elif name == "nation":
            # 16x more polygons for q182, at fresh deterministic centers
            # (the center arithmetic mods the shifted key back into range)
            r = r.withColumn("n_nationkey", F.col("n_nationkey") + shift)
        r.drop("rep").write.mode("overwrite").parquet(
            os.path.join(out, f"{name}.parquet")
        )


def run(spark, sf_dir: str, names: list[str]) -> dict[str, float]:
    out = {}
    for name in names:
        # untimed warm pass, then timed (steady-state; see bench.py)
        for timed in (False, True):
            t0 = time.perf_counter()
            REGISTRY[name].fn(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            if timed:
                out[name] = round(time.perf_counter() - t0, 3)
    return out


def main() -> None:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    src = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    scratch = sys.argv[3] if len(sys.argv) > 3 else f"/tmp/scale{k}"
    # optional 4th arg: comma-separated query subset (default: all)
    global _MEASURE
    if len(sys.argv) > 4:
        _MEASURE = [q for q in sys.argv[4].split(",") if q]
    spark = get_spark("scale-test")
    spark.sparkContext.setLogLevel("ERROR")

    build(spark, src, scratch, k)  # per-table idempotent

    base = run(spark, src, _MEASURE)
    scaled = run(spark, scratch, _MEASURE)
    ratios = {
        n: round(scaled[n] / base[n], 2) if base[n] > 0 else None
        for n in _MEASURE
    }
    print(
        json.dumps(
            {"k": k, "base_s": base, "scaled_s": scaled, "ratio": ratios}
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
