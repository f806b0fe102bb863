"""Composed training-data pipeline operators: corpus-mix construction
and train/eval contamination detection.

These are the LLM-tier analog of the simulation tier's end-to-end
experiment runner (``simulation/experiment.py``): where the individual
operators (q40 exact dedup, q51 quality, q87 hash sampling, q42 shingle
join) are the instruments, these queries chain them into the two
workflows a training-data team actually runs:

- **q95_training_mix** — quality floor → exact dedup (canonical = min
  doc_id per content hash) → per-source deterministic hash sampling at
  mix-specific rates → per-source corpus statistics. Every stage is a
  map-side filter or a single keyed shuffle; nothing is collected.
- **q94_contamination** — n-gram overlap between an eval split and the
  training split: the standard benchmark-leakage check. The train side
  is reduced to a DISTINCT shingle set before the join, so every probe
  row matches at most once — the join fan-out is bounded by design (no
  hot-shingle k² blowup, unlike a raw doc×doc shingle join; compare
  ``jaccard_pairs_from_shingles``'s ``max_df`` escape).

Both have exact DuckDB oracles (same md5-prefix hash arithmetic as the
rest of the tier, ``functions/text.py``).

Scale notes (100 TB): q95 is scan → filter → one window shuffle (hash
partition on content hash) → map filter → per-source agg; the sampling
filter rides the scan output, so the expensive shuffle sees only
deduped survivors. q94's two shingle relations shuffle on the shingle
string; at corpus scale the DISTINCT train side is the big relation and
the right physical plan is a shuffle hash join (not broadcast) — for a
small eval split, flipping the build side or a bloom-filter pre-pass
are the standard refinements; semantics are unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from columnarmodeling_spark.functions.text import tokens
from columnarmodeling_spark.queries import register
from columnarmodeling_spark.queries._util import t
from columnarmodeling_spark.queries.llm_dedup import _shingle_rows, _SQL_SHINGLES

# Mix-rate menu keyed on the numeric source suffix: low-numbered
# sources play the "curated" role (keep all), mid the "reference"
# role (half), the long tail the "web-crawl" role (quarter).
_RATE_CASE_SQL = """
         CASE WHEN CAST(substr(source, 4) AS INTEGER) < 5 THEN 1.0
              WHEN CAST(substr(source, 4) AS INTEGER) < 10 THEN 0.5
              ELSE 0.25 END
"""
_MIN_TOKENS = 10


@register(
    "q94_contamination",
    oracle=f"""
    WITH {_SQL_SHINGLES},
    ev AS (SELECT doc_id, s FROM sh WHERE doc_id % 10 = 0),
    tr AS (SELECT DISTINCT s FROM sh WHERE doc_id % 10 <> 0),
    tot AS (SELECT doc_id, count(*) AS n_shingles FROM ev GROUP BY doc_id),
    hits AS (
      SELECT e.doc_id, count(*) AS n_hit
      FROM ev e JOIN tr ON e.s = tr.s
      GROUP BY e.doc_id)
    SELECT t.doc_id,
           t.n_shingles,
           CAST(coalesce(h.n_hit, 0) AS BIGINT) AS n_contaminated,
           round(coalesce(h.n_hit, 0) * 1.0 / t.n_shingles, 6)
               AS contamination
    FROM tot t LEFT JOIN hits h ON t.doc_id = h.doc_id
    """,
    doc="Train/eval contamination detection (LLM-pipeline tier): for "
    "every eval-split document (doc_id % 10 = 0), the fraction of its "
    "word 3-grams that also occur anywhere in the train split — the "
    "standard benchmark-leakage scan. Train side is DISTINCT shingles, "
    "so the equi-join fan-out is at most 1 per probe row: skew-immune "
    "by construction.",
    tags=("text", "llm", "contamination", "join", "scale"),
)
def q94_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    sh = _shingle_rows(spark, sf_dir).cache()
    ev = sh.filter(F.col("doc_id") % 10 == 0)
    tr = sh.filter(F.col("doc_id") % 10 != 0).select("s").distinct()
    tot = ev.groupBy("doc_id").agg(F.count("*").alias("n_shingles"))
    hits = (
        ev.join(tr, "s")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_hit"))
    )
    n_hit = F.coalesce("n_hit", F.lit(0))
    return tot.join(hits, "doc_id", "left").select(
        "doc_id",
        "n_shingles",
        n_hit.cast("long").alias("n_contaminated"),
        F.round(n_hit / F.col("n_shingles"), 6).alias("contamination"),
    )


@register(
    "q95_training_mix",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, source, text,
             list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                         t -> t <> '') AS tk
      FROM documents),
    q AS (SELECT * FROM toks WHERE len(tk) >= {_MIN_TOKENS}),
    dd AS (SELECT *, min(doc_id) OVER (PARTITION BY md5(text)) AS mn FROM q),
    kept AS (SELECT doc_id, source, tk FROM dd WHERE doc_id = mn),
    rated AS (
      SELECT doc_id, source, tk,
             CAST({_RATE_CASE_SQL} AS DOUBLE) AS rate,
             CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))
                  AS INTEGER) AS hk
      FROM kept),
    sampled AS (SELECT * FROM rated WHERE hk < CAST(rate * 65536 AS INTEGER))
    SELECT source,
           round(rate, 6) AS mix_rate,
           count(*) AS n_docs,
           CAST(sum(len(tk)) AS BIGINT) AS n_tokens,
           round(avg(len(tk)), 6) AS mean_tokens
    FROM sampled
    GROUP BY source, rate
    """,
    doc="Training-mix construction, end-to-end (LLM-pipeline capstone): "
    "quality floor (>= 10 tokens) -> exact dedup (canonical = min "
    "doc_id per md5(text), one hash-partitioned window) -> per-source "
    "deterministic hash sampling at mix rates (curated 1.0 / reference "
    "0.5 / web 0.25) -> per-source doc and token counts. The sampling "
    "predicate is the q87 composable 16-bit-md5 rule: re-running at a "
    "lower rate yields a subset, and the decision is reproducible "
    "across engines, runs and partitionings.",
    tags=("text", "llm", "sampling", "dedup", "pipeline", "scale"),
)
def q95_training_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents").withColumn("tk", tokens("text"))
    q = d.filter(F.size("tk") >= _MIN_TOKENS)
    kept = (
        q.withColumn(
            "mn", F.min("doc_id").over(W.partitionBy(F.md5("text")))
        )
        .filter(F.col("doc_id") == F.col("mn"))
        .select("doc_id", "source", "tk")
    )
    suffix = F.substring("source", 4, 10).cast("int")
    rate = (
        F.when(suffix < 5, F.lit(1.0))
        .when(suffix < 10, F.lit(0.5))
        .otherwise(F.lit(0.25))
    )
    hk = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4), 16, 10
    ).cast("int")
    sampled = kept.withColumn("rate", rate).filter(
        hk < (F.col("rate") * 65536).cast("int")
    )
    return sampled.groupBy("source", "rate").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.size("tk")).cast("bigint").alias("n_tokens"),
        F.round(F.avg(F.size("tk")), 6).alias("mean_tokens"),
    ).select(
        "source",
        F.round("rate", 6).alias("mix_rate"),
        "n_docs",
        "n_tokens",
        "mean_tokens",
    )


# --- sequence packing (concat-and-chunk) -----------------------------------

_PACK_C = 512  # tokens per training sequence


@register(
    "q130_sequence_packing",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, len(list_filter(regexp_split_to_array(lower(text),
             '[^a-z0-9]+'), t -> t <> '')) AS nt
      FROM documents),
    nz AS (SELECT doc_id, nt FROM toks WHERE nt > 0),
    cum AS (
      SELECT doc_id, nt,
             sum(nt) OVER (ORDER BY doc_id
                           ROWS UNBOUNDED PRECEDING) - nt AS off
      FROM nz),
    spans AS (
      SELECT doc_id, nt, off,
             unnest(range(CAST(off // {_PACK_C} AS BIGINT),
                          CAST((off + nt - 1) // {_PACK_C} + 1 AS BIGINT))) AS chunk
      FROM cum)
    SELECT chunk,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(least(off + nt, (chunk + 1) * {_PACK_C})
                    - greatest(off, chunk * {_PACK_C})) AS BIGINT)
               AS n_tokens,
           CAST(sum(CASE WHEN off < chunk * {_PACK_C} THEN 1 ELSE 0 END)
                AS BIGINT) AS n_spanning
    FROM spans GROUP BY chunk
    """,
    doc="Sequence packing (concat-and-chunk) — how pretraining actually "
    "batches documents: the corpus is concatenated in doc_id order "
    "and cut into fixed 512-token sequences; a document whose token "
    "span crosses a cut belongs to both chunks. Needs each doc's "
    "GLOBAL token offset — the scale-safe exclusive prefix sum via "
    "operators/indexing.with_global_running_sum (range partition -> "
    "per-partition sums -> driver prefix over #partitions values -> "
    "broadcast offsets), never a single-partition global window. "
    "Chunk membership is a sequence() explode bounded by each doc's "
    "own span; per-chunk doc counts, exact token occupancy (= 512 "
    "everywhere but the tail) and boundary-spanning counts are "
    "all-integer. The oracle's plain cumulative window is the "
    "sf-small equivalent of the two-pass prefix.",
    tags=("llm", "packing", "window", "prefix-sum", "scale"),
)
def q130_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    from columnarmodeling_spark.operators.indexing import (
        with_global_running_sum,
    )

    d = t(spark, sf_dir, "documents").select(
        "doc_id", F.size(tokens("text")).alias("nt")
    )
    nz = d.filter(F.col("nt") > 0)
    cum = with_global_running_sum(
        nz, ["doc_id"], "nt", out_col="cum"
    ).withColumn("off", F.col("cum") - F.col("nt"))
    c = F.lit(_PACK_C)
    spans = cum.select(
        "doc_id",
        "nt",
        "off",
        F.explode(
            F.sequence(
                (F.col("off") / c).cast("long"),
                ((F.col("off") + F.col("nt") - 1) / c).cast("long"),
            )
        ).alias("chunk"),
    )
    occ = F.least(
        F.col("off") + F.col("nt"), (F.col("chunk") + 1) * c
    ) - F.greatest(F.col("off"), F.col("chunk") * c)
    return spans.groupBy("chunk").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum(occ).cast("long").alias("n_tokens"),
        F.sum(
            F.when(F.col("off") < F.col("chunk") * c, 1).otherwise(0)
        )
        .cast("long")
        .alias("n_spanning"),
    )


# --- weighted (Poisson) sampling with Horvitz-Thompson accounting -----------

_WS_SCALE = 1_048_576  # 2^20 fixed-point probability resolution
_WS_REF = 512  # tokens at/above which a doc is kept with certainty


@register(
    "q142_weighted_sample",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, source,
             len(list_filter(regexp_split_to_array(lower(text),
                 '[^a-z0-9]+'), t -> t <> '')) AS nt
      FROM documents),
    nz AS (SELECT doc_id, source, nt FROM toks WHERE nt > 0),
    pr AS (
      SELECT doc_id, source, nt,
             least({_WS_SCALE}, nt * {_WS_SCALE // _WS_REF}) AS p_scaled,
             CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 5))
                  AS BIGINT) AS hk
      FROM nz),
    kept AS (
      SELECT source, nt,
             (nt * {_WS_SCALE}) // p_scaled AS ht
      FROM pr WHERE hk < p_scaled)
    SELECT t.source,
           CAST(coalesce(k.n_kept, 0) AS BIGINT) AS n_kept,
           CAST(coalesce(k.kept_tokens, 0) AS BIGINT) AS kept_tokens,
           CAST(coalesce(k.ht_tokens_est, 0) AS BIGINT) AS ht_tokens_est,
           CAST(t.true_tokens AS BIGINT) AS true_tokens
    FROM (SELECT source, sum(nt) AS true_tokens FROM nz GROUP BY 1) t
    LEFT JOIN (
      SELECT source, count(*) AS n_kept, sum(nt) AS kept_tokens,
             sum(ht) AS ht_tokens_est
      FROM kept GROUP BY 1) k USING (source)
    """,
    doc="Weight-proportional Poisson sampling with Horvitz-Thompson "
    "accounting — the length-aware corpus downsampler (short docs are "
    "cheap to keep; long docs are kept with certainty): each doc's "
    "inclusion probability is min(1, tokens/512) in 2^20 fixed-point, "
    "the inclusion decision is the q87/q95 deterministic md5 rule "
    "(5 hex chars = an exact 20-bit uniform, reproducible across "
    "engines, runs, partitionings — re-running at a lower weight "
    "yields a subset), and the HT estimate sum(nt/p) of each source's "
    "TRUE token total is computed in integer micro-units (floor "
    "division — documented bias well under the sampling noise) so "
    "both engines replay it exactly, alongside the true total for "
    "comparison. Everything is map-side expressions + one per-source "
    "hash agg: no shuffle sees the full corpus.",
    tags=("llm", "sampling", "pipeline", "scale"),
)
def q142_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents").select(
        "doc_id", "source", F.size(tokens("text")).alias("nt")
    )
    nz = d.filter(F.col("nt") > 0)
    p_scaled = F.least(
        F.lit(_WS_SCALE), F.col("nt") * (_WS_SCALE // _WS_REF)
    )
    hk = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 5), 16, 10
    ).cast("long")
    pr = nz.select(
        "source", "nt", p_scaled.alias("p_scaled"), hk.alias("hk")
    )
    kept = pr.filter(F.col("hk") < F.col("p_scaled")).select(
        "source",
        "nt",
        F.expr(f"div(nt * {_WS_SCALE}, p_scaled)").alias("ht"),
    )
    totals = nz.groupBy("source").agg(F.sum("nt").alias("true_tokens"))
    kstats = kept.groupBy("source").agg(
        F.count("*").alias("n_kept"),
        F.sum("nt").alias("kept_tokens"),
        F.sum("ht").alias("ht_tokens_est"),
    )
    return totals.join(kstats, "source", "left").select(
        "source",
        F.coalesce("n_kept", F.lit(0)).cast("long").alias("n_kept"),
        F.coalesce("kept_tokens", F.lit(0))
        .cast("long")
        .alias("kept_tokens"),
        F.coalesce("ht_tokens_est", F.lit(0))
        .cast("long")
        .alias("ht_tokens_est"),
        F.col("true_tokens").cast("long").alias("true_tokens"),
    )


_MIX_ALPHA = 0.7  # sampling temperature: rate ∝ tokens^alpha
_MIX_BUDGET = 1_000_000  # token budget the rates are applied to


@register(
    "q163_mix_temperature",
    oracle=f"""
    WITH toks AS (
      SELECT source,
             len(list_filter(regexp_split_to_array(lower(text),
                 '[^a-z0-9]+'), t -> t <> '')) AS n_tok
      FROM documents),
    per_src AS (
      SELECT source, CAST(sum(n_tok) AS BIGINT) AS n,
             count(*) AS n_docs
      FROM toks GROUP BY source),
    wt AS (
      SELECT source, n, n_docs,
             CAST(round(pow(CAST(n AS DOUBLE), {_MIX_ALPHA}) * 1000000.0)
                  AS BIGINT) AS w
      FROM per_src),
    tot AS (SELECT CAST(sum(w) AS BIGINT) AS tw FROM wt)
    SELECT wt.source, wt.n AS src_tokens, CAST(wt.n_docs AS BIGINT) AS n_docs,
           round(CAST(wt.w AS DOUBLE) / CAST(t.tw AS DOUBLE), 6) AS rate,
           {_MIX_BUDGET} * wt.w // t.tw AS budget_tokens
    FROM wt CROSS JOIN tot t
    """,
    doc="Temperature-scaled data-mixing rates (the multinomial "
    "source-sampling rule every multi-corpus training run uses, "
    "rate_s ∝ tokens_s^α with α=0.7 — upweights small sources "
    "relative to proportional sampling so one giant crawl doesn't "
    "drown the curated corpora): per source, exact token counts, "
    "the normalized sampling rate, and the integer token budget at "
    "1M. Complements q95 (which applies FIXED per-source rates "
    "end-to-end) by computing the rates themselves. Float "
    "discipline: the single pow() per source is quantized to "
    "integer micro-units before the normalizing sum (the q100 "
    "micro-nat pattern), the rate is one IEEE division on identical "
    "int64-derived operands, and the budget allocation is exact "
    "integer floor division. One token-count hash agg (doc-keyed, "
    "map-side combined), a per-source roll-up bounded by the number "
    "of sources, and a one-row broadcast total.",
    tags=("llm", "pipeline", "mixing", "sampling", "scale"),
)
def q163_mix_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents").select(
        "source", F.size(tokens("text")).cast("long").alias("n_tok")
    )
    per_src = d.groupBy("source").agg(
        F.sum("n_tok").alias("n"), F.count("*").alias("n_docs")
    )
    wt = per_src.select(
        "source",
        "n",
        "n_docs",
        F.round(
            F.pow(F.col("n").cast("double"), float(_MIX_ALPHA)) * 1000000.0,
            0,
        )
        .cast("long")
        .alias("w"),
    )
    tot = wt.agg(F.sum("w").cast("long").alias("tw"))
    return wt.crossJoin(F.broadcast(tot)).select(
        "source",
        F.col("n").alias("src_tokens"),
        F.col("n_docs").cast("long").alias("n_docs"),
        F.round(
            F.col("w").cast("double") / F.col("tw").cast("double"), 6
        ).alias("rate"),
        F.expr(f"div({_MIX_BUDGET} * w, tw)").alias("budget_tokens"),
    )


_STRAT_K = 10  # exact per-stratum sample size


@register(
    "q178_stratified_exact_k",
    oracle=f"""
    WITH r AS (
      SELECT doc_id, source,
             row_number() OVER (
               PARTITION BY source
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
      FROM documents)
    SELECT doc_id, source, CAST(rk AS BIGINT) AS rk
    FROM r WHERE rk <= {_STRAT_K}
    """,
    doc="Exact k-per-stratum sampling (eval/holdout-set construction: "
    "exactly 10 documents per source, reproducibly — q87's md5-rate "
    "sampling gives an EXPECTED fraction, this gives an exact count "
    "per stratum): rank within each source by the md5 hex string of "
    "the doc id (lexicographic order of the hash IS the uniform "
    "order, identical on both engines — no integer conversion "
    "needed) with a doc_id tie-break, keep rank ≤ k. One window "
    "partitioned by the stratum — per-key frames, and Spark plans "
    "the rank ≤ k filter as WindowGroupLimit, so each partition "
    "retains only k rows before the shuffle at 100 TB.",
    tags=("llm", "pipeline", "sampling", "stratified", "scale"),
)
def q178_stratified_exact_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        F.md5(F.col("doc_id").cast("string")).alias("h"),
    )
    w = W.partitionBy("source").orderBy("h", "doc_id")
    return (
        d.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= _STRAT_K)
        .select("doc_id", "source", F.col("rk").cast("long").alias("rk"))
    )


_NEG_K = 2  # deterministic negatives drawn per positive pair


@register(
    "q196_negative_sampling",
    oracle=f"""
    WITH pos AS MATERIALIZED (
      SELECT DISTINCT o.o_custkey AS custkey, l.l_partkey AS partkey
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey),
    mx AS (SELECT max(p_partkey) AS mp FROM part),
    draw AS (
      SELECT p.custkey, p.partkey, j.j,
             CAST(('0x' || substr(md5(CAST(p.custkey AS VARCHAR) || '#'
                   || CAST(p.partkey AS VARCHAR) || '#'
                   || CAST(j.j AS VARCHAR)), 1, 15)) AS BIGINT)
               % (SELECT mp FROM mx) + 1 AS neg_partkey
      FROM pos p
      CROSS JOIN (SELECT unnest(range(1, {_NEG_K} + 1)) AS j) j)
    SELECT d.custkey, d.partkey, CAST(d.j AS BIGINT) AS neg_rank,
           d.neg_partkey,
           (c.custkey IS NOT NULL) AS is_collision
    FROM draw d
    LEFT JOIN pos c
      ON c.custkey = d.custkey AND c.partkey = d.neg_partkey
    """,
    doc="Deterministic negative sampling for contrastive training pairs "
    "(the data-side half of every two-tower / matrix-factorization "
    "recommender and of embedding-model hard-negative mining): for "
    "each observed (customer, part) purchase pair, draw k=2 "
    "pseudo-random candidate parts via the repo's 60-bit md5 idiom "
    "keyed on (custkey, partkey, draw-index) — deterministic, so both "
    "engines and any re-run produce the SAME negatives (RNG-based "
    "samplers are unverifiable and non-resumable; the md5 draw is the "
    "q87/q178 assignment discipline applied to sampling). Collisions "
    "with true positives are FLAGGED, not silently resampled "
    "(resample-until-clean is an unbounded loop; training pipelines "
    "downweight or drop flagged rows instead) via a left join back to "
    "the positive set on the (custkey, candidate) key. At 100 TB: one "
    "distinct agg, a constant k-way fan-out, and one equi-join "
    "co-partitioned on custkey — no RNG state, no driver loop.",
    tags=("llm", "sampling", "negatives", "join", "scale"),
)
def q196_negative_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    pos = (
        o.join(li, o["o_orderkey"] == li["l_orderkey"])
        .select(
            F.col("o_custkey").alias("custkey"),
            F.col("l_partkey").alias("partkey"),
        )
        .distinct()
        .localCheckpoint(eager=False)
    )
    mx = t(spark, sf_dir, "part").agg(F.max("p_partkey").alias("mp"))
    js = spark.range(1, _NEG_K + 1).select(F.col("id").alias("j"))
    u = F.conv(
        F.substring(
            F.md5(
                F.concat_ws(
                    "#",
                    F.col("custkey").cast("string"),
                    F.col("partkey").cast("string"),
                    F.col("j").cast("string"),
                )
            ),
            1,
            15,
        ),
        16,
        10,
    ).cast("long")
    draw = (
        pos.crossJoin(F.broadcast(js))
        .crossJoin(F.broadcast(mx))
        .select(
            "custkey",
            "partkey",
            F.col("j").cast("long").alias("neg_rank"),
            (u % F.col("mp") + 1).alias("neg_partkey"),
        )
    )
    chk = pos.select(
        F.col("custkey").alias("c2"), F.col("partkey").alias("neg2")
    )
    return draw.join(
        chk,
        (F.col("custkey") == F.col("c2"))
        & (F.col("neg_partkey") == F.col("neg2")),
        "left",
    ).select(
        "custkey",
        "partkey",
        "neg_rank",
        "neg_partkey",
        F.col("c2").isNotNull().alias("is_collision"),
    )


# --- q232: greedy whole-document bin packing --------------------------------

_PACK_BUDGET = 256


@register(
    "q232_greedy_packing",
    oracle=f"""
    WITH RECURSIVE toks AS (
      SELECT doc_id, source,
             CAST(len(list_filter(regexp_split_to_array(lower(text),
                  '[^a-z0-9]+'), t -> t <> '')) AS BIGINT) AS n_tok
      FROM documents),
    seq AS (
      SELECT doc_id, source, n_tok,
             row_number() OVER (PARTITION BY source ORDER BY doc_id)
               AS rn
      FROM toks),
    rec AS (
      SELECT doc_id, source, n_tok, rn,
             CAST(1 AS BIGINT) AS bin_id, n_tok AS bin_cum
      FROM seq WHERE rn = 1
      UNION ALL
      SELECT s.doc_id, s.source, s.n_tok, s.rn,
             CASE WHEN r.bin_cum + s.n_tok <= {_PACK_BUDGET}
                  THEN r.bin_id ELSE r.bin_id + 1 END,
             CASE WHEN r.bin_cum + s.n_tok <= {_PACK_BUDGET}
                  THEN r.bin_cum + s.n_tok ELSE s.n_tok END
      FROM rec r JOIN seq s
        ON s.source = r.source AND s.rn = r.rn + 1)
    SELECT doc_id, source, n_tok, bin_id, bin_cum FROM rec
    """,
    doc="GREEDY WHOLE-DOCUMENT BIN PACKING — the padding-free "
    "loader strategy that keeps every document INTACT (vs q130's "
    "concat-and-chunk, which slices documents across chunk "
    "boundaries): walk documents in deterministic order, filling "
    "fixed token-budget context windows "
    "(budget {B} here), opening a new bin when the next document "
    "would overflow; an over-budget document gets a bin of its own. "
    "The accept/continue decision depends on the running bin fill, "
    "so the fold is inherently sequential WITHIN a shard (the q63 "
    "W4 precedent) — the engine keeps exact semantics by folding "
    "per shard in one Arrow-batched applyInPandas, with the shard "
    "key (source) as the parallelism unit. The oracle replays the "
    "identical fold as a recursive CTE over per-shard row numbers. "
    "All integers; no float discipline needed. Scale: a 100 TB "
    "corpus packs within bounded shards by construction (packing "
    "across shard boundaries is neither needed nor wanted — shard "
    "= one loader worker's stream); state per shard is two int64 "
    "cells, and token counting is the same linear pass every text "
    "query pays.".format(B=_PACK_BUDGET),
    tags=("llm", "pipeline", "packing", "sequential", "scale"),
)
def q232_greedy_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd

    docs = t(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        F.size(tokens("text")).cast("long").alias("n_tok"),
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id").reset_index(drop=True)
        bin_ids, bin_cums = [], []
        b, c = 0, 0
        for ntok in pdf["n_tok"]:
            n = int(ntok)
            if b == 0:
                b, c = 1, n
            elif c + n <= _PACK_BUDGET:
                c += n
            else:
                b, c = b + 1, n
            bin_ids.append(b)
            bin_cums.append(c)
        pdf["bin_id"] = pd.Series(bin_ids, dtype="int64")
        pdf["bin_cum"] = pd.Series(bin_cums, dtype="int64")
        return pdf[["doc_id", "source", "n_tok", "bin_id", "bin_cum"]]

    return docs.groupBy("source").applyInPandas(
        pack,
        schema="doc_id long, source string, n_tok long, "
        "bin_id long, bin_cum long",
    )


# --- q258: target-mix source reweighting ------------------------------------


@register(
    "q258_source_reweighting",
    oracle="""
    WITH d AS (
      SELECT source,
             CAST(len(list_filter(regexp_split_to_array(lower(text),
                  '[^a-z0-9]+'), t -> t <> '')) AS BIGINT) AS n_tok
      FROM documents),
    s AS (
      SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(n_tok) AS BIGINT) AS n_tokens
      FROM d GROUP BY 1),
    g AS (
      SELECT CAST(count(*) AS BIGINT) AS k,
             CAST(sum(n_tokens) AS BIGINT) AS n_total
      FROM s),
    w AS (
      SELECT s.source, s.n_docs, s.n_tokens,
             CAST(round(1000.0 * g.n_total / (g.k * s.n_tokens)) AS BIGINT)
               AS weight_milli
      FROM s CROSS JOIN g)
    SELECT source, n_docs, n_tokens, weight_milli,
           least(weight_milli, 1000) AS capped_milli,
           CAST((n_tokens * least(weight_milli, 1000)) // 1000 AS BIGINT)
             AS eff_tokens
    FROM w
    ORDER BY source
    """,
    doc="TARGET-MIX SOURCE REWEIGHTING (the sampling-weight table a "
    "data-mix curator feeds the loader: given a target of equal "
    "token share per source, what weight does each source's data "
    "carry?): weight_s = (N/k)/n_s in milli-units, then the "
    "downsample-only policy caps at 1000 (never upsample: a source "
    "below its target share keeps weight 1.0 rather than repeating "
    "data), and eff_tokens = floor(n_tokens * capped / 1000) is "
    "the post-sampling token budget the capped mix actually "
    "yields. Integer end-to-end except the ONE quantized weight "
    "division (identical-operand double, q221 discipline); the "
    "floor-div is over non-negative terms so Spark div() and "
    "DuckDB // agree. Scale: one map-side-combinable agg folds the "
    "corpus to |sources| rows; k and N ride a one-row broadcast; "
    "everything downstream is arithmetic on the broadcast scale.",
    tags=("llm", "pipeline", "mix", "sampling", "scale"),
)
def q258_source_reweighting(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = (
        t(spark, sf_dir, "documents")
        .select("source", F.size(tokens("text")).cast("long").alias("n_tok"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_tok").cast("long").alias("n_tokens"),
        )
    )
    g = s.agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum("n_tokens").cast("long").alias("n_total"),
    )
    w = s.crossJoin(F.broadcast(g)).withColumn(
        "weight_milli",
        F.round(
            F.lit(1000.0)
            * F.col("n_total")
            / (F.col("k") * F.col("n_tokens"))
        ).cast("long"),
    )
    return (
        w.withColumn(
            "capped_milli",
            F.least(F.col("weight_milli"), F.lit(1000).cast("long")),
        )
        .select(
            "source",
            "n_docs",
            "n_tokens",
            "weight_milli",
            "capped_milli",
            F.expr("CAST(div(n_tokens * capped_milli, 1000) AS BIGINT)")
            .alias("eff_tokens"),
        )
        .orderBy("source")
    )


# --- q272: exact-k weighted sampling without replacement (ES / Gumbel) -------

_ES_K = 5  # docs kept per source
_ES_U = 1_048_576  # 2^20 uniform resolution (the q87/q142 md5 rule)


@register(
    "q272_weighted_topk_sample",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, source,
             CAST(len(list_filter(regexp_split_to_array(lower(text),
                  '[^a-z0-9]+'), t -> t <> '')) AS BIGINT) AS nt
      FROM documents),
    nz AS (SELECT doc_id, source, nt FROM toks WHERE nt > 0),
    keyed AS (
      SELECT doc_id, source, nt,
             CAST(round(1000000.0
               * ln((CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)),
                           1, 5)) AS BIGINT) + 1.0) / {_ES_U})
               / nt) AS BIGINT) AS key_micro
      FROM nz),
    rk AS (
      SELECT doc_id, source, nt, key_micro,
             row_number() OVER (PARTITION BY source
                                ORDER BY key_micro DESC, doc_id) AS rn
      FROM keyed)
    SELECT source, rn AS pick, doc_id, nt, key_micro
    FROM rk WHERE rn <= {_ES_K}
    ORDER BY source, pick
    """,
    doc=f"EXACT-k WEIGHTED SAMPLING WITHOUT REPLACEMENT — Efraimidis-"
    "Spirakis A-Res (equivalently Gumbel-top-k): keep the top-"
    f"{_ES_K} docs per source by the key u^(1/w), w = token count "
    "— the fixed-budget companion to q142's Poisson sampler "
    "(Poisson gives a RANDOM-SIZE sample; a loader shard wants "
    "exactly k) and the mechanism that realizes q258's weights as "
    "an actual pick. Determinism/exactness: u is the q87/q142 "
    "20-bit md5 uniform (+1 to dodge ln 0), the key is compared "
    "as ln(u)/w — the monotone log transform of u^(1/w), so no "
    "cross-engine pow — quantized to integer micro BEFORE the "
    "rank (q203 ln discipline), ties broken by doc_id: both "
    "engines pick the IDENTICAL sample. Scale: one rank window "
    "per source partition (never global); at extreme per-source "
    "cardinality the standard escape is per-partition top-k then "
    "re-rank the k x partitions survivors (TakeOrdered shape).",
    tags=("llm", "pipeline", "sampling", "weighted", "gumbel", "scale"),
)
def q272_weighted_topk_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    nz = (
        t(spark, sf_dir, "documents")
        .select(
            "doc_id",
            "source",
            F.size(tokens("text")).cast("long").alias("nt"),
        )
        .where(F.col("nt") > 0)
    )
    keyed = nz.select(
        "doc_id",
        "source",
        "nt",
        F.expr(
            "CAST(round(1000000.0"
            " * ln((CAST(conv(substr(md5(CAST(doc_id AS STRING)), 1, 5),"
            " 16, 10) AS BIGINT) + 1.0) / "
            f"{_ES_U})"
            " / nt) AS BIGINT)"
        ).alias("key_micro"),
    )
    rk = keyed.select(
        "doc_id",
        "source",
        "nt",
        "key_micro",
        F.row_number()
        .over(W.partitionBy("source").orderBy(F.desc("key_micro"), "doc_id"))
        .alias("rn"),
    )
    return (
        rk.where(F.col("rn") <= _ES_K)
        .select(
            "source",
            F.col("rn").alias("pick"),
            "doc_id",
            "nt",
            "key_micro",
        )
        .orderBy("source", "pick")
    )


# --- q284: Neyman-allocation stratified sampler ------------------------------

_NEY_TARGET = 100  # total sample budget across strata
_NEY_U = 1_048_576  # 2^20 uniform resolution (the q87/q142 md5 rule)


@register(
    "q284_neyman_sample",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, source,
             CAST(len(list_filter(regexp_split_to_array(lower(text),
                  '[^a-z0-9]+'), t -> t <> '')) AS BIGINT) AS nt
      FROM documents),
    st AS (
      SELECT source,
             CAST(count(*) AS BIGINT) AS nh,
             CAST(sum(nt) AS BIGINT) AS sy,
             CAST(sum(nt * nt) AS BIGINT) AS sy2
      FROM toks GROUP BY source),
    sd AS (
      SELECT source, nh,
             CASE WHEN nh > 1 THEN
               CAST(round(1000000.0 * sqrt(
                 (CAST(nh AS DOUBLE) * sy2 - CAST(sy AS DOUBLE) * sy)
                 / (CAST(nh AS DOUBLE) * (nh - 1)))) AS BIGINT)
             ELSE 0 END AS s_micro
      FROM st),
    w AS (
      SELECT source, nh, s_micro, nh * s_micro AS wh,
             sum(nh * s_micro) OVER () AS tot_w
      FROM sd),
    alloc AS (
      SELECT source, nh, s_micro,
             CAST(least(nh, CASE WHEN tot_w > 0 THEN
               round({_NEY_TARGET}.0 * wh / tot_w) ELSE 0 END) AS BIGINT)
               AS n_alloc
      FROM w),
    keyed AS (
      SELECT doc_id, source, nt,
             CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 5))
                  AS BIGINT) AS key
      FROM toks),
    rk AS (
      SELECT doc_id, source, nt, key,
             row_number() OVER (PARTITION BY source
                                ORDER BY key DESC, doc_id) AS rn
      FROM keyed)
    SELECT rk.source, CAST(rk.rn AS BIGINT) AS pick, rk.doc_id, rk.nt,
           alloc.n_alloc, alloc.s_micro
    FROM rk JOIN alloc ON alloc.source = rk.source
    WHERE rk.rn <= alloc.n_alloc
    ORDER BY rk.source, pick
    """,
    doc=f"NEYMAN-ALLOCATION STRATIFIED SAMPLER: split a fixed budget of "
    f"{_NEY_TARGET} docs across source strata proportional to N_h*S_h "
    "(stratum size x token-count stddev) — the variance-optimal "
    "allocation for estimating the corpus mean, vs q87's proportional "
    "split (which over-samples large homogeneous strata). Pass 1 folds "
    "ONE scan to per-stratum int64 (N, sum y, sum y^2); the sample "
    "stddev is one sqrt on those exact sums, quantized to micro; "
    "allocations are round(T*w_h/W) capped at N_h (rounding may "
    "over/undershoot T by a few — documented, the audit columns "
    "expose it). Pass 2 ranks docs per stratum by the 20-bit md5 "
    "uniform (q87/q142 rule) and keeps rank <= n_h via a broadcast "
    "of the |sources|-bounded allocation. Determinism: both engines "
    "pick the IDENTICAL sample (integer keys, doc_id tie-break). "
    "Scale: two scans by design (allocation needs global stats); "
    "rank windows are per-stratum, never global; the N*sum(y^2) "
    "moment products evaluate in DOUBLE on both engines (the "
    "q289/q255 overflow guard — int64 would wrap in Spark and "
    "error in DuckDB once sum(y) ~ 3e9).",
    tags=("llm", "pipeline", "sampling", "stratified", "neyman", "scale"),
)
def q284_neyman_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    toks = t(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        F.size(tokens("text")).cast("long").alias("nt"),
    )
    st = toks.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("nh"),
        F.sum("nt").cast("long").alias("sy"),
        F.sum(F.col("nt") * F.col("nt")).cast("long").alias("sy2"),
    )
    sd = st.select(
        "source",
        "nh",
        F.expr(
            "CASE WHEN nh > 1 THEN"
            " CAST(round(1000000.0 * sqrt("
            " (CAST(nh AS DOUBLE) * sy2 - CAST(sy AS DOUBLE) * sy)"
            " / (CAST(nh AS DOUBLE) * (nh - 1)))) AS BIGINT)"
            " ELSE 0 END"
        ).alias("s_micro"),
    )
    # the allocation window runs on the |sources|-bounded relation
    w = sd.withColumn("wh", F.col("nh") * F.col("s_micro")).withColumn(
        "tot_w", F.sum(F.col("nh") * F.col("s_micro")).over(W.partitionBy())
    )
    alloc = w.select(
        "source",
        "s_micro",
        F.expr(
            f"CAST(least(nh, CASE WHEN tot_w > 0 THEN"
            f" round({_NEY_TARGET}.0 * wh / tot_w) ELSE 0 END) AS BIGINT)"
        ).alias("n_alloc"),
    )
    keyed = toks.select(
        "doc_id",
        "source",
        "nt",
        F.expr(
            "CAST(conv(substr(md5(CAST(doc_id AS STRING)), 1, 5),"
            " 16, 10) AS BIGINT)"
        ).alias("key"),
    )
    rk = keyed.select(
        "source",
        "doc_id",
        "nt",
        F.row_number()
        .over(W.partitionBy("source").orderBy(F.desc("key"), "doc_id"))
        .cast("long")
        .alias("pick"),
    )
    return (
        rk.join(F.broadcast(alloc), "source")
        .where(F.col("pick") <= F.col("n_alloc"))
        .select("source", "pick", "doc_id", "nt", "n_alloc", "s_micro")
        .orderBy("source", "pick")
    )


# --- q342: end-to-end CommonCrawl-style curation pipeline -------------------------
#
# The r14 verdict's item 7: every stage of a web-corpus curation run
# exists as its own registered operator (q327 blocklist, q312 URL canon,
# q319 host quota, q52 lang-id, q226 quality funnel, q339 chunk dedup,
# q209 decontamination, q258/q95 mix); this composes them into ONE
# pipeline with per-stage survival accounting — the artifact a data
# curator actually ships, and the remaining scale claim (where the
# composition checkpoints, which stages see survivor sets vs the full
# corpus).

_CP_QM = 3          # host-quota multiplier: keep 3*ceil(sqrt(n)) per host (q319)
_CP_LANG_MIN = 1    # lang-id confidence floor: >= 1 English marker token
_CP_MINTOK = 45     # minimum token count (q226's rule, tuned to this corpus)
_CP_STOP_MILLI = 50   # stopword ratio floor 5%
_CP_REP_MILLI = 120   # max-token-frequency cap 12%
_CP_W = 8           # chunk width (q339's)
_CP_KEEP_NUM, _CP_KEEP_DEN = 1, 2  # chunk-survival floor: n_kept/n_chunks >= 1/2
_CP_MIX_CAP = 10    # per-source cap in the final mix

_CP_STAGES = [
    (1, "blocklist"),
    (2, "host_quota"),
    (3, "lang_id"),
    (4, "min_length"),
    (5, "stopword_floor"),
    (6, "repetition_cap"),
    (7, "chunk_dedup"),
    (8, "decontamination"),
    (9, "source_mix"),
]


def _cp_oracle_ctes() -> str:
    """The q342/q344 shared oracle CTE chain: base + the survivor sets
    s0..s9 (one per pipeline stage). q342 folds them into the funnel;
    q344 labels every doc with its first drop stage."""
    from columnarmodeling_spark.queries.llm_text import (
        _BLOCKLIST,
        _LANG_MARKERS,
        _STOPWORDS,
        _URL_DIRTY_SQL,
        _url_canon_steps,
    )

    layers = [
        "u0 AS (SELECT doc_id, n_chars, source, text, "
        f"{_URL_DIRTY_SQL} AS url FROM documents)"
    ]
    prev = "u0"
    for i, (col, expr) in enumerate(_url_canon_steps("duck"), start=1):
        layers.append(f"u{i} AS (SELECT *, {expr} AS {col} FROM {prev})")
        prev = f"u{i}"
    canon = ",\n    ".join(layers)
    bl_sql = ", ".join(f"('{e}')" for e in _BLOCKLIST)
    en, es, zh = (_LANG_MARKERS[lang] for lang in ("en", "es", "zh"))
    W = _CP_W
    return f"""
    WITH {canon},
    base AS (
      SELECT doc_id, n_chars, source, host,
             lower(split_part(split_part(split_part(url, '://', 2),
                   '/', 1), ':', 1)) AS rawhost,
             list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                         t -> t <> '') AS tk
      FROM {prev}),
    s0 AS (SELECT doc_id FROM base),
    bl AS (SELECT * FROM (VALUES {bl_sql}) AS b(entry)),
    s1 AS (SELECT doc_id FROM base b WHERE NOT EXISTS (
            SELECT 1 FROM bl
            WHERE b.rawhost = bl.entry
               OR b.rawhost LIKE '%.' || bl.entry)),
    r2 AS (SELECT b.doc_id,
                  row_number() OVER (PARTITION BY b.host
                    ORDER BY b.n_chars DESC, b.doc_id) AS rk,
                  count(*) OVER (PARTITION BY b.host) AS n
           FROM base b JOIN s1 USING (doc_id)),
    s2 AS (SELECT doc_id FROM r2
           WHERE rk <= {_CP_QM} * ceil(sqrt(CAST(n AS DOUBLE)))),
    lng AS (SELECT doc_id,
             len(list_filter(tk, x -> list_contains({en!r}, x))) AS s_en,
             len(list_filter(tk, x -> list_contains({es!r}, x))) AS s_es,
             len(list_filter(tk, x -> list_contains({zh!r}, x))) AS s_zh
            FROM base),
    s3 AS (SELECT l.doc_id FROM lng l JOIN s2 USING (doc_id)
           WHERE s_en >= s_es AND s_en >= s_zh AND s_en >= {_CP_LANG_MIN}),
    q AS (SELECT doc_id, len(tk) AS n_tok,
            len(list_filter(tk, x -> list_contains({_STOPWORDS!r}, x)))
              AS n_stop
          FROM base),
    tf AS (SELECT doc_id, max(c) AS mx FROM (
             SELECT doc_id, w, count(*) AS c
             FROM (SELECT doc_id, unnest(tk) AS w FROM base)
             GROUP BY 1, 2) GROUP BY 1),
    s4 AS (SELECT q.doc_id FROM q JOIN s3 USING (doc_id)
           WHERE n_tok >= {_CP_MINTOK}),
    s5 AS (SELECT q.doc_id FROM q JOIN s4 USING (doc_id)
           WHERE 1000 * n_stop >= {_CP_STOP_MILLI} * n_tok),
    s6 AS (SELECT q.doc_id FROM q JOIN s5 USING (doc_id)
           JOIN tf USING (doc_id)
           WHERE 1000 * mx <= {_CP_REP_MILLI} * n_tok),
    chunks AS (
      SELECT b.doc_id, i AS idx,
             CAST(('0x' || substr(md5(
               array_to_string(tk[(i*{W}+1):(i*{W}+{W})], ' ')
             ), 1, 15)) AS BIGINT) AS hv
      FROM base b JOIN s6 USING (doc_id),
           LATERAL unnest(generate_series(
             0, CAST(floor((len(tk) - 1) / {W}.0) AS INT))) t(i)
      WHERE len(tk) >= 1),
    firsts AS (SELECT hv, min(row(doc_id, idx)) AS fkey
               FROM chunks GROUP BY hv),
    ckept AS (SELECT c.doc_id, count(*) AS n_chunks,
                     sum(CASE WHEN row(c.doc_id, c.idx) = f.fkey
                         THEN 1 ELSE 0 END) AS n_kept
              FROM chunks c JOIN firsts f ON c.hv = f.hv GROUP BY 1),
    s7 AS (SELECT doc_id FROM ckept
           WHERE {_CP_KEEP_DEN} * n_kept >= {_CP_KEEP_NUM} * n_chunks),
    g AS (SELECT DISTINCT doc_id,
            unnest(list_transform(range(1, len(tk) - 6), i ->
              tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2] || ' ' ||
              tk[i+3] || ' ' || tk[i+4] || ' ' || tk[i+5] || ' ' ||
              tk[i+6] || ' ' || tk[i+7])) AS gr
          FROM base),
    bench AS (SELECT DISTINCT gr FROM g WHERE doc_id % 10 = 0),
    hits AS (SELECT DISTINCT g.doc_id
             FROM g JOIN s7 USING (doc_id) JOIN bench USING (gr)),
    s8 AS (SELECT doc_id FROM s7 WHERE NOT EXISTS (
            SELECT 1 FROM hits h WHERE h.doc_id = s7.doc_id)),
    r9 AS (SELECT b.doc_id,
                  row_number() OVER (PARTITION BY b.source
                    ORDER BY CAST(('0x' || substr(md5(
                      CAST(b.doc_id AS VARCHAR)), 1, 15)) AS BIGINT),
                    b.doc_id) AS rk
           FROM base b JOIN s8 USING (doc_id)),
    s9 AS (SELECT doc_id FROM r9 WHERE rk <= {_CP_MIX_CAP})"""


def _q342_oracle() -> str:
    funnel_rows = "\n      UNION ALL ".join(
        f"SELECT {s} AS stage, '{r}' AS rule, "
        f"(SELECT count(*) FROM s{s - 1}) - (SELECT count(*) FROM s{s})"
        f" AS n_dropped, (SELECT count(*) FROM s{s}) AS n_surviving"
        for s, r in _CP_STAGES
    )
    return f"""{_cp_oracle_ctes()},
    funnel AS (
      {funnel_rows})
    SELECT CAST(stage AS INT) AS stage, rule,
           CAST(n_dropped AS BIGINT) AS n_dropped,
           CAST(n_surviving AS BIGINT) AS n_surviving
    FROM funnel ORDER BY stage
    """


def _q344_oracle() -> str:
    joins = "\n    ".join(
        f"LEFT JOIN s{s} m{s} ON b.doc_id = m{s}.doc_id"
        for s, _ in _CP_STAGES
    )
    first_null = "\n           ".join(
        f"WHEN m{s}.doc_id IS NULL THEN {s}" for s, _ in _CP_STAGES
    )
    rule_case = "\n           ".join(
        f"WHEN m{s}.doc_id IS NULL THEN '{r}'" for s, r in _CP_STAGES
    )
    return f"""{_cp_oracle_ctes()}
    SELECT b.doc_id,
           CAST(CASE {first_null}
           ELSE 10 END AS INT) AS drop_stage,
           CASE {rule_case}
           ELSE 'kept' END AS rule
    FROM base b
    {joins}
    ORDER BY b.doc_id
    """


@register(
    "q342_curation_pipeline",
    oracle=_q342_oracle(),
    doc="END-TO-END CURATION PIPELINE — the CommonCrawl-style run that "
    "chains the registered single-purpose operators in production "
    "order, each stage filtering the PREVIOUS stage's survivors: "
    "(1) blocklist gate on the raw host (q327 semantics), (2) "
    "sqrt-damped per-host quota on the q312-canonicalized host "
    "(q319), (3) lang-id argmax with a marker-evidence floor (q52), "
    "(4-6) the Gopher/C4 quality gates — min length, stopword "
    "floor, repetition cap (q226), (7) chunk-level first-occurrence "
    "dedup among survivors, keep docs with >= 1/2 surviving chunks "
    "(q339), (8) 8-gram decontamination against the doc_id%10==0 "
    "eval slice of the ORIGINAL corpus (q209 — the eval suite is "
    "external, so its gram set does not shrink as stages drop "
    "training docs), (9) deterministic per-source mix cap (q258's "
    "hash-order selection). Output: the 9-row funnel with per-stage "
    "n_dropped/n_surviving (telescoping, property-tested). Scale: "
    "per-doc stage flags are computed once each and combined into a "
    "single first-drop-stage label (one CASE over left joins), so "
    "the funnel is ONE doc-grain pass + a <=10-row rollup — never 9 "
    "repeated corpus scans; the blocklist verdict is computed at "
    "HOST grain and shuffle-joined back (never a data-proportional "
    "broadcast); windows partition by host/source (the q319/q17 "
    "top-k shape, group-rank escape registered); chunk and gram "
    "relations carry 8-byte hashes only. The stage constants are "
    "corpus-calibrated so every rule's boundary is live at sf0.01.",
    tags=("llm", "pipeline", "curation", "funnel", "composition", "scale"),
)
def q342_curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    lab = _curation_label_rel(spark, sf_dir)
    per = lab.groupBy("drop_stage").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    stages = spark.createDataFrame(_CP_STAGES, "stage INT, rule STRING")
    return (
        stages.crossJoin(F.broadcast(per))
        .groupBy("stage", "rule")
        .agg(
            F.sum(
                F.when(F.col("drop_stage") == F.col("stage"), F.col("cnt"))
                .otherwise(0)
            )
            .cast("long")
            .alias("n_dropped"),
            F.sum(
                F.when(F.col("drop_stage") > F.col("stage"), F.col("cnt"))
                .otherwise(0)
            )
            .cast("long")
            .alias("n_surviving"),
        )
        .orderBy("stage")
    )


def _curation_label_rel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The q342/q344 shared core: one doc-grain relation
    ``(doc_id, drop_stage)`` where drop_stage is the FIRST pipeline
    stage that drops the doc (10 = survived all nine)."""
    from columnarmodeling_spark.functions.text import (
        hex_hash,
        word_shingles,
    )
    from columnarmodeling_spark.queries.llm_dedup import (
        _first_occurrence_key,
    )
    from columnarmodeling_spark.queries.llm_text import (
        _BLOCKLIST,
        _LANG_MARKERS,
        _STOPWORDS,
        _URL_DIRTY_SQL,
        _url_canon_steps,
    )

    stop_arr = F.array(*[F.lit(s) for s in _STOPWORDS])

    def _marker_count(lang: str) -> F.Column:
        arr = F.array(*[F.lit(w) for w in _LANG_MARKERS[lang]])
        return (
            F.size(F.filter("tk", lambda x: F.array_contains(arr, x)))
            .cast("long")
            .alias(f"s_{lang}")
        )

    d = t(spark, sf_dir, "documents").select(
        "doc_id", "n_chars", "source", "text",
        F.expr(_URL_DIRTY_SQL).alias("url"),
    )
    for col, expr in _url_canon_steps("spark"):
        d = d.withColumn(col, F.expr(expr))
    base = d.select(
        "doc_id",
        "n_chars",
        "source",
        "host",
        F.expr(
            "lower(split_part(split_part(split_part(url, '://', 2),"
            " '/', 1), ':', 1))"
        ).alias("rawhost"),
        tokens("text").alias("tk"),
    ).withColumn("n_tok", F.size("tk").cast("long")).withColumn(
        "n_stop",
        F.size(F.filter("tk", lambda x: F.array_contains(stop_arr, x)))
        .cast("long"),
    ).withColumn("s_en", _marker_count("en")).withColumn(
        "s_es", _marker_count("es")
    ).withColumn("s_zh", _marker_count("zh"))

    # stage 1 — blocklist: verdict at HOST grain (q327's plan: the
    # broadcast NL join runs against <=|hosts| rows), shuffle-joined
    # back to doc grain on rawhost
    bl = spark.createDataFrame(
        [(e,) for e in _BLOCKLIST], "entry STRING"
    )
    hostflag = (
        base.groupBy("rawhost")
        .agg(F.count(F.lit(1)).alias("_n"))
        .join(
            F.broadcast(bl),
            (F.col("rawhost") == F.col("entry"))
            | F.col("rawhost").endswith(
                F.concat(F.lit("."), F.col("entry"))
            ),
            "left",
        )
        .groupBy("rawhost")
        .agg(
            F.max(F.when(F.col("entry").isNotNull(), 1).otherwise(0))
            .alias("blocked")
        )
    )
    b1 = base.join(hostflag, "rawhost")
    s1 = b1.filter(F.col("blocked") == 0).select("doc_id")

    # stage 2 — host quota: rank within canonical host by the
    # (n_chars desc, doc_id) quality proxy over stage-1 survivors
    r2 = (
        base.join(s1, "doc_id")
        .select(
            "doc_id",
            "host",
            F.row_number()
            .over(
                W.partitionBy("host").orderBy(
                    F.col("n_chars").desc(), "doc_id"
                )
            )
            .alias("rk2"),
            F.count(F.lit(1)).over(W.partitionBy("host")).alias("n2"),
        )
        .withColumn(
            "cap2",
            F.expr(
                f"CAST({_CP_QM} * ceil(sqrt(CAST(n2 AS DOUBLE))) AS BIGINT)"
            ),
        )
        .select("doc_id", "rk2", "cap2")
    )
    s2 = r2.filter(F.col("rk2") <= F.col("cap2")).select("doc_id")

    # stages 3-6 — per-doc gates (flags live in base)
    lang_pass = (
        (F.col("s_en") >= F.col("s_es"))
        & (F.col("s_en") >= F.col("s_zh"))
        & (F.col("s_en") >= _CP_LANG_MIN)
    )
    s3 = base.join(s2, "doc_id").filter(lang_pass).select("doc_id")
    s4 = (
        base.join(s3, "doc_id")
        .filter(F.col("n_tok") >= _CP_MINTOK)
        .select("doc_id")
    )
    s5 = (
        base.join(s4, "doc_id")
        .filter(1000 * F.col("n_stop") >= _CP_STOP_MILLI * F.col("n_tok"))
        .select("doc_id")
    )
    # repetition cap needs the per-doc max token frequency — computed
    # over stage-5 survivors only (values identical to a full-corpus
    # computation for the docs that reach the gate)
    tf = (
        base.join(s5, "doc_id")
        .select("doc_id", F.explode("tk").alias("w"))
        .groupBy("doc_id", "w")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id")
        .agg(F.max("c").cast("long").alias("mx"))
    )
    s6 = (
        base.join(tf, "doc_id")
        .filter(1000 * F.col("mx") <= _CP_REP_MILLI * F.col("n_tok"))
        .select("doc_id")
    )

    # stage 7 — chunk-level first-occurrence dedup AMONG SURVIVORS
    # (q339's machinery; the chunk hash is the only payload shuffled)
    Wc = _CP_W
    chunks = (
        base.join(s6, "doc_id")
        .filter(F.size("tk") >= 1)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    f"transform(sequence(0, CAST(floor((size(tk) - 1) / {Wc}.0) AS INT)), "
                    f"i -> struct(i AS idx, concat_ws(' ', slice(tk, i*{Wc}+1, {Wc})) AS chunk))"
                )
            ).alias("c"),
        )
        .select(
            "doc_id",
            F.col("c.idx").cast("long").alias("idx"),
            hex_hash(F.col("c.chunk")).alias("hv"),
        )
        .withColumn("fkey", _first_occurrence_key("doc_id", "idx"))
        .localCheckpoint(eager=False)
    )
    firsts = chunks.groupBy("hv").agg(F.min("fkey").alias("first_fkey"))
    ckept = (
        chunks.join(firsts, "hv")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_chunks"),
            F.sum(
                F.when(F.col("fkey") == F.col("first_fkey"), 1).otherwise(0)
            )
            .cast("long")
            .alias("n_kept"),
        )
    )
    s7 = ckept.filter(
        _CP_KEEP_DEN * F.col("n_kept") >= _CP_KEEP_NUM * F.col("n_chunks")
    ).select("doc_id")

    # stage 8 — decontamination: eval grams come from the FULL corpus
    # slice (the suite is external and fixed — broadcast-pinned, q209)
    g_all = base.select(
        "doc_id", F.explode(word_shingles("tk", 8)).alias("gr")
    ).distinct()
    bench = (
        g_all.filter(F.col("doc_id") % 10 == 0).select("gr").distinct()
    )
    hits = (
        g_all.join(s7, "doc_id")
        .join(F.broadcast(bench), "gr")
        .select("doc_id")
        .distinct()
        .withColumn("hit", F.lit(1))
    )
    s8 = (
        s7.join(hits, "doc_id", "left_anti").select("doc_id")
    )

    # stage 9 — deterministic per-source mix cap (hash-order pick)
    r9 = (
        base.join(s8, "doc_id")
        .select(
            "doc_id",
            "source",
            F.row_number()
            .over(
                W.partitionBy("source").orderBy(
                    hex_hash(F.col("doc_id").cast("string")), "doc_id"
                )
            )
            .alias("rk9"),
        )
        .select("doc_id", "rk9")
    )

    # one doc-grain pass: label every doc with its first drop stage
    # (10 = survived the whole pipeline)
    return (
        b1.select(
            "doc_id", "blocked", "n_tok", "n_stop",
            "s_en", "s_es", "s_zh",
        )
        .join(r2, "doc_id", "left")
        .join(tf, "doc_id", "left")
        .join(ckept, "doc_id", "left")
        .join(hits, "doc_id", "left")
        .join(r9, "doc_id", "left")
        .select(
            "doc_id",
            F.when(F.col("blocked") == 1, 1)
            .when(F.col("rk2") > F.col("cap2"), 2)
            .when(~lang_pass, 3)
            .when(F.col("n_tok") < _CP_MINTOK, 4)
            .when(
                1000 * F.col("n_stop") < _CP_STOP_MILLI * F.col("n_tok"), 5
            )
            .when(1000 * F.col("mx") > _CP_REP_MILLI * F.col("n_tok"), 6)
            .when(
                _CP_KEEP_DEN * F.col("n_kept")
                < _CP_KEEP_NUM * F.col("n_chunks"),
                7,
            )
            .when(F.col("hit") == 1, 8)
            .when(F.col("rk9") > _CP_MIX_CAP, 9)
            .otherwise(10)
            .cast("int")
            .alias("drop_stage"),
        )
    )


@register(
    "q344_curation_manifest",
    oracle=_q344_oracle(),
    doc="PER-DOC CURATION MANIFEST — the other artifact a curation run "
    "ships alongside q342's funnel: every document labeled with the "
    "FIRST pipeline stage that dropped it (and the stage's rule "
    "name), 'kept' for full survivors. Same stage machinery as q342 "
    "(the label relation is literally shared — q342 is this rolled "
    "up to 9 rows), but the oracle check is much stronger here: the "
    "driver hashes the per-document DECISIONS, so a single doc "
    "swapping stages is a hash mismatch even when the funnel counts "
    "happen to balance. This is the relation a debugging curator "
    "joins back to raw docs ('why did doc X disappear?') and the "
    "provenance record reproducibility audits replay. Scale: "
    "identical to q342 minus the final rollup — the manifest IS the "
    "doc-grain labeling pass, written out instead of counted.",
    tags=("llm", "pipeline", "curation", "manifest", "provenance", "scale"),
)
def q344_curation_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    lab = _curation_label_rel(spark, sf_dir)
    stages = spark.createDataFrame(_CP_STAGES, "stage INT, rule STRING")
    return (
        lab.join(
            F.broadcast(stages),
            lab["drop_stage"] == stages["stage"],
            "left",
        )
        .select(
            "doc_id",
            "drop_stage",
            F.coalesce("rule", F.lit("kept")).alias("rule"),
        )
        .orderBy("doc_id")
    )
