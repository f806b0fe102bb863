"""Text-analysis operators over the documents table: token counting,
quality scoring, language ID, fingerprinting.

Training-data-pipeline tier (BASELINE.json north star). All JVM-side
column expressions — no Python in the hot path — each with an exact
DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from columnarmodeling_spark.functions.text import (
    MERSENNE_P,
    hex_hash,
    tokens,
    word_shingles,
)
from columnarmodeling_spark.queries import register
from columnarmodeling_spark.queries._util import t

_STOPWORDS = ["the", "a", "of", "to", "and", "in", "is", "for"]


@register(
    "q50_token_stats",
    oracle="""
    WITH toks AS (
      SELECT doc_id, length(text) AS n_chars_text,
             list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                         t -> t <> '') AS tk
      FROM documents)
    SELECT doc_id,
           len(tk) AS n_tokens,
           n_chars_text,
           round(list_sum(list_transform(tk, x -> length(x))) * 1.0
                 / len(tk), 6) AS avg_token_len
    FROM toks WHERE len(tk) > 0
    """,
    doc="Token counting (whitespace/punct split) — LLM-pipeline tier; "
    "token stats per document, JVM-side split + array arithmetic.",
    tags=("text", "llm", "tokens"),
)
def q50_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents").withColumn("tk", tokens("text"))
    return d.filter(F.size("tk") > 0).select(
        "doc_id",
        F.size("tk").cast("long").alias("n_tokens"),
        F.length("text").cast("long").alias("n_chars_text"),
        F.round(
            F.aggregate(
                F.transform("tk", lambda x: F.length(x).cast("long")),
                F.lit(0).cast("long"),
                lambda acc, x: acc + x,
            )
            * 1.0
            / F.size("tk"),
            6,
        ).alias("avg_token_len"),
    )


@register(
    "q51_quality_score",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, text,
             list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                         t -> t <> '') AS tk
      FROM documents),
    m AS (
      SELECT doc_id,
             len(tk) AS n_tok,
             length(text) AS n_chr,
             len(regexp_extract_all(text, '[.,;:!?]')) AS n_punct,
             len(list_filter(tk,
                 x -> list_contains({_STOPWORDS!r}, x))) AS n_stop
      FROM toks WHERE len(tk) > 0)
    SELECT doc_id,
           round(n_punct * 1.0 / n_chr, 6)        AS punct_ratio,
           round(n_stop * 1.0 / n_tok, 6)         AS stopword_ratio,
           round(n_chr * 1.0 / n_tok, 6)          AS chars_per_token,
           round(least(1.0, n_tok / 50.0) * 0.5
                 + (n_stop * 1.0 / n_tok) * 0.3
                 + least(0.2, n_punct * 1.0 / n_chr), 6) AS quality
    FROM m
    """,
    doc="Document quality scoring: length / punctuation / stopword-ratio "
    "heuristics (LLM-pipeline tier), composed into one bounded score.",
    tags=("text", "llm", "quality"),
)
def q51_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents").withColumn("tk", tokens("text"))
    stop_arr = F.array(*[F.lit(s) for s in _STOPWORDS])
    m = d.filter(F.size("tk") > 0).select(
        "doc_id",
        F.size("tk").cast("long").alias("n_tok"),
        F.length("text").cast("long").alias("n_chr"),
        F.regexp_count("text", F.lit("[.,;:!?]")).cast("long").alias("n_punct"),
        F.size(F.filter("tk", lambda x: F.array_contains(stop_arr, x)))
        .cast("long")
        .alias("n_stop"),
    )
    return m.select(
        "doc_id",
        F.round(F.col("n_punct") / F.col("n_chr"), 6).alias("punct_ratio"),
        F.round(F.col("n_stop") / F.col("n_tok"), 6).alias("stopword_ratio"),
        F.round(F.col("n_chr") / F.col("n_tok"), 6).alias("chars_per_token"),
        F.round(
            F.least(F.lit(1.0), F.col("n_tok") / 50.0) * 0.5
            + (F.col("n_stop") / F.col("n_tok")) * 0.3
            + F.least(F.lit(0.2), F.col("n_punct") / F.col("n_chr")),
            6,
        ).alias("quality"),
    )


_LANG_MARKERS = {
    "en": ["the", "and", "of", "row", "table"],
    "es": ["el", "la", "de", "fila", "tabla"],
    "zh": ["zh", "biao", "hang", "lie", "shuju"],
}


@register(
    "q52_lang_id",
    oracle="""
    WITH toks AS (
      SELECT doc_id, lang,
             list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                         t -> t <> '') AS tk
      FROM documents),
    sc AS (
      SELECT doc_id, lang,
             len(list_filter(tk, x -> list_contains(['the','and','of','row','table'], x))) AS s_en,
             len(list_filter(tk, x -> list_contains(['el','la','de','fila','tabla'], x))) AS s_es,
             len(list_filter(tk, x -> list_contains(['zh','biao','hang','lie','shuju'], x))) AS s_zh
      FROM toks)
    SELECT doc_id, lang AS lang_actual,
           CASE WHEN s_en >= s_es AND s_en >= s_zh THEN 'en'
                WHEN s_es >= s_zh THEN 'es'
                ELSE 'zh' END AS lang_guess,
           s_en, s_es, s_zh
    FROM sc
    """,
    doc="Language ID via marker-token scoring with deterministic argmax "
    "tie-break (en > es > zh) — LLM-pipeline tier n-gram heuristic.",
    tags=("text", "llm", "langid"),
)
def q52_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents").withColumn("tk", tokens("text"))

    def score(lang: str) -> F.Column:
        arr = F.array(*[F.lit(w) for w in _LANG_MARKERS[lang]])
        return (
            F.size(F.filter("tk", lambda x: F.array_contains(arr, x)))
            .cast("long")
            .alias(f"s_{lang}")
        )

    sc = d.select(
        "doc_id", F.col("lang").alias("lang_actual"), score("en"), score("es"), score("zh")
    )
    return sc.select(
        "doc_id",
        "lang_actual",
        F.when(
            (F.col("s_en") >= F.col("s_es")) & (F.col("s_en") >= F.col("s_zh")), "en"
        )
        .when(F.col("s_es") >= F.col("s_zh"), "es")
        .otherwise("zh")
        .alias("lang_guess"),
        "s_en",
        "s_es",
        "s_zh",
    )


@register(
    "q53_fingerprint",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id,
             list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                         t -> t <> '') AS tk
      FROM documents),
    sh AS (
      SELECT doc_id,
             unnest(list_transform(range(1, len(tk)-1),
                    i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])) AS s
      FROM toks),
    h AS (
      SELECT doc_id,
             CAST(('0x' || substr(md5(s), 1, 15)) AS BIGINT) % {MERSENNE_P} AS u
      FROM sh)
    SELECT doc_id,
           min(u)   AS fp_min,
           max(u)   AS fp_max,
           count(*) AS n_shingles
    FROM h GROUP BY doc_id
    """,
    doc="Document fingerprinting: winnowing-style min/max over rolling "
    "shingle hashes (LLM-pipeline tier). Hash = md5-prefix→int mod "
    "2^31−1, identical arithmetic on both engines.",
    tags=("text", "llm", "fingerprint"),
)
def q53_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents").withColumn("tk", tokens("text"))
    sh = d.select("doc_id", F.explode(word_shingles("tk", 3)).alias("s"))
    h = sh.select("doc_id", (hex_hash("s") % MERSENNE_P).alias("u"))
    return h.groupBy("doc_id").agg(
        F.min("u").alias("fp_min"),
        F.max("u").alias("fp_max"),
        F.count("*").alias("n_shingles"),
    )


@register(
    "q54_repetition_ratio",
    oracle="""
    WITH toks AS (
      SELECT doc_id, list_filter(regexp_split_to_array(lower(text),
             '[^a-z0-9]+'), t -> t <> '') AS tk
      FROM documents),
    tok AS (SELECT doc_id, unnest(tk) AS w FROM toks),
    freq AS (
      SELECT doc_id, w, count(*) AS c
      FROM tok GROUP BY doc_id, w)
    SELECT doc_id,
           CAST(sum(c) AS BIGINT)              AS n_tokens,
           count(*)                            AS n_distinct,
           round(max(c) * 1.0 / sum(c), 6)     AS top_word_share,
           round(count(*) * 1.0 / sum(c), 6)   AS distinct_ratio
    FROM freq GROUP BY doc_id
    """,
    doc="Repetition-ratio quality signal (Gopher-style rule used by "
    "production LLM data pipelines): share of the most frequent token "
    "and distinct-token ratio per document — high repetition flags "
    "boilerplate/spam for filtering. Two hash aggregations, map-side "
    "combined; no pair space.",
    tags=("text", "llm", "quality", "repetition"),
)
def q54_repetition_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents").withColumn("tk", tokens("text"))
    tok = d.select("doc_id", F.explode("tk").alias("w"))
    freq = tok.groupBy("doc_id", "w").agg(F.count("*").alias("c"))
    return freq.groupBy("doc_id").agg(
        F.sum("c").alias("n_tokens"),
        F.count("*").alias("n_distinct"),
        F.round(F.max("c") / F.sum("c"), 6).alias("top_word_share"),
        F.round(F.count("*") / F.sum("c"), 6).alias("distinct_ratio"),
    )


@register(
    "q55_pii_redaction",
    oracle="""
    WITH msgs AS (
      SELECT c_custkey,
             'contact ' || c_name || ' at 555-' ||
             lpad(CAST(c_custkey % 10000 AS VARCHAR), 4, '0') ||
             ' re ' || c_mktsegment AS msg
      FROM customer)
    SELECT c_custkey,
           regexp_replace(
             regexp_replace(msg, '[0-9]{3}-[0-9]{4}', '[PHONE]', 'g'),
             'Customer#[0-9]+', '[NAME]', 'g')          AS redacted,
           len(regexp_extract_all(msg, '[0-9]{3}-[0-9]{4}'))
             + len(regexp_extract_all(msg, 'Customer#[0-9]+')) AS n_redacted
    FROM msgs
    """,
    doc="PII redaction (LLM-pipeline tier: scrub phone-shaped and "
    "id-shaped spans before training). Synthetic PII is constructed "
    "deterministically from customer fields, then removed with global "
    "regexp_replace; n_redacted counts the scrubbed spans. Pure JVM "
    "regex — codegen keeps it on the scan, no shuffle at all.",
    tags=("text", "llm", "pii", "redaction"),
)
def q55_pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = t(spark, sf_dir, "customer")
    msg = F.concat(
        F.lit("contact "),
        F.col("c_name"),
        F.lit(" at 555-"),
        F.lpad((F.col("c_custkey") % 10000).cast("string"), 4, "0"),
        F.lit(" re "),
        F.col("c_mktsegment"),
    )
    phone = "[0-9]{3}-[0-9]{4}"
    name = "Customer#[0-9]+"
    return c.select(
        "c_custkey",
        F.regexp_replace(
            F.regexp_replace(msg, phone, "[PHONE]"), name, "[NAME]"
        ).alias("redacted"),
        (
            F.size(F.regexp_extract_all(msg, F.lit(phone), 0))
            + F.size(F.regexp_extract_all(msg, F.lit(name), 0))
        ).alias("n_redacted"),
    )


@register(
    "q59_length_histogram",
    oracle="""
    WITH b AS (
      SELECT doc_id, length(text) AS n,
             CAST(length(text) // 50 AS BIGINT) AS bucket
      FROM documents)
    SELECT bucket,
           bucket * 50      AS lo,
           bucket * 50 + 49 AS hi,
           count(*)         AS n_docs,
           min(n)           AS min_len,
           max(n)           AS max_len
    FROM b GROUP BY bucket
    """,
    doc="Document-length histogram (training-data analysis tier: length "
    "distributions drive truncation/packing decisions). Fixed-width "
    "binning by integer division — one map-side expression + hash agg; "
    "the same binning primitive as the proximity grid, in 1-D.",
    tags=("text", "llm", "histogram", "agg"),
)
def q59_length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents")
    b = d.select(
        F.length("text").alias("n"),
        (F.length("text") / 50).cast("long").alias("bucket"),
    )
    return b.groupBy("bucket").agg(
        (F.col("bucket") * 50).alias("lo"),
        (F.col("bucket") * 50 + 49).alias("hi"),
        F.count("*").alias("n_docs"),
        F.min("n").alias("min_len"),
        F.max("n").alias("max_len"),
    )


@register(
    "q75_chunk_udtf",
    oracle="""
    WITH toks AS (
      SELECT doc_id, list_filter(regexp_split_to_array(lower(text),
             '[^a-z0-9]+'), t -> t <> '') AS tk
      FROM documents),
    idx AS (
      SELECT doc_id, tk,
             unnest(range(0, (len(tk) + 31) // 32)) AS chunk_idx
      FROM toks WHERE len(tk) > 0)
    SELECT doc_id, CAST(chunk_idx AS INT) AS chunk_idx,
           array_to_string(tk[chunk_idx * 32 + 1 : chunk_idx * 32 + 32], ' ')
               AS chunk_text,
           CAST(least(32, len(tk) - chunk_idx * 32) AS INT) AS n_tokens
    FROM idx
    """,
    doc="Context packing via a real Python UDTF (SURVEY §2.9 UDTF "
    "surface): split each document into max-32-token chunks — the "
    "training-data packing primitive. One input row yields N output "
    "rows from the UDTF's eval generator (LATERAL join in the plan); "
    "tokenization inside the UDTF replays the engine-wide '[^a-z0-9]+' "
    "rule so the oracle slices the identical token list.",
    tags=("text", "llm", "udtf", "chunking"),
)
def q75_chunk_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    import re

    from pyspark.sql.functions import udtf

    @udtf(returnType="chunk_idx int, chunk_text string, n_tokens int")
    class Chunker:
        def eval(self, text: str):
            toks = [t for t in re.split("[^a-z0-9]+", (text or "").lower()) if t]
            for i in range(0, len(toks), 32):
                chunk = toks[i : i + 32]
                yield i // 32, " ".join(chunk), len(chunk)

    spark.udtf.register("chunker_udtf", Chunker)
    t(spark, sf_dir, "documents").createOrReplaceTempView("__docs_udtf")
    return spark.sql(
        """
        SELECT d.doc_id, c.chunk_idx, c.chunk_text, c.n_tokens
        FROM __docs_udtf d, LATERAL chunker_udtf(d.text) c
        """
    )


@register(
    "q76_bpe_pretokenize",
    oracle=r"""
    WITH pieces AS (
      SELECT doc_id,
             regexp_extract_all(lower(text),
                                ' ?[a-z]+| ?[0-9]+| ?[^a-z0-9\s]+') AS pc,
             list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                         t -> t <> '') AS wd
      FROM documents)
    SELECT doc_id,
           len(pc) AS n_pieces,
           len(wd) AS n_words,
           round(len(pc) * 1.0 / len(wd), 6) AS fertility
    FROM pieces WHERE len(wd) > 0
    """,
    doc="BPE-ish pre-tokenization (LLM-pipeline tier): GPT-2-style piece "
    "regex (space-prefixed letter runs / digit runs / punctuation runs; "
    "the lookahead-free subset so Java regex and RE2 agree) vs "
    "whitespace words, per-document fertility = pieces/words — the "
    "standard tokenizer-cost estimate before a real BPE merge table. "
    "Pure JVM-side regexp_extract_all; no Python in the hot path.",
    tags=("text", "llm", "tokens"),
)
def q76_bpe_pretokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents")
    pc = F.expr(
        r"regexp_extract_all(lower(text), ' ?[a-z]+| ?[0-9]+| ?[^a-z0-9\\s]+', 0)"
    )
    wd = F.filter(
        F.split(F.lower("text"), "[^a-z0-9]+"), lambda x: x != F.lit("")
    )
    out = d.select("doc_id", pc.alias("pc"), wd.alias("wd"))
    return out.filter(F.size("wd") > 0).select(
        "doc_id",
        F.size("pc").cast("long").alias("n_pieces"),
        F.size("wd").cast("long").alias("n_words"),
        F.round(F.size("pc") / F.size("wd"), 6).alias("fertility"),
    )


@register(
    "q87_hash_sample",
    oracle="""
    WITH keyed AS (
      SELECT source, doc_id,
             CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))
                  AS INTEGER) AS hk
      FROM documents),
    sampled AS (
      SELECT source, doc_id FROM keyed
      WHERE hk < CAST(0.2 * 65536 AS INTEGER))
    SELECT source,
           count(*) AS n_sampled,
           min(doc_id) AS min_doc,
           max(doc_id) AS max_doc
    FROM sampled GROUP BY source
    """,
    doc="Deterministic hash-based stratified sampling (training-mix "
    "construction, LLM tier): keep a document iff the first 16 bits of "
    "md5(doc_id) fall under the 20%% threshold — reproducible across "
    "engines, runs, and partitionings (unlike rand()-based sampleBy), "
    "and composable (a 10%% re-sample of the 20%% sample is the 10%% "
    "sample). Pure map-side filter + hash agg; at 100 TB the filter "
    "rides the scan and no shuffle precedes the per-source counts.",
    tags=("text", "llm", "sampling", "scale"),
)
def q87_hash_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents")
    hk = F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4), 16, 10).cast(
        "int"
    )
    sampled = d.withColumn("hk", hk).filter(F.col("hk") < int(0.2 * 65536))
    return sampled.groupBy("source").agg(
        F.count("*").alias("n_sampled"),
        F.min("doc_id").alias("min_doc"),
        F.max("doc_id").alias("max_doc"),
    )


@register(
    "q97_bm25_topterms",
    oracle="""
    WITH toks AS MATERIALIZED (
      SELECT doc_id,
             list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                         t -> t <> '') AS tk
      FROM documents),
    dl AS MATERIALIZED (SELECT doc_id, len(tk) AS dl FROM toks),
    tf AS MATERIALIZED (
      SELECT doc_id, w AS term, count(*) AS tf
      FROM (SELECT doc_id, unnest(tk) AS w FROM toks)
      GROUP BY doc_id, w),
    dfreq AS MATERIALIZED (SELECT term, count(*) AS df FROM tf GROUP BY term),
    stats AS (
      SELECT (SELECT count(*) FROM documents) AS n_docs,
             CAST((SELECT sum(dl) FROM dl) AS DOUBLE)
               / (SELECT count(*) FROM documents) AS avgdl),
    scored AS (
      SELECT t.doc_id, t.term, t.tf, f.df,
             round(ln(1.0 + (CAST(s.n_docs AS DOUBLE) - f.df + 0.5)
                            / (f.df + 0.5))
                   * ((CAST(t.tf AS DOUBLE) * 2.2)
                      / (CAST(t.tf AS DOUBLE)
                         + 1.2 * (0.25 + 0.75 * (CAST(d.dl AS DOUBLE)
                                                 / s.avgdl)))),
                   9) AS s9
      FROM tf t
      JOIN dfreq f USING (term)
      JOIN dl d ON d.doc_id = t.doc_id
      CROSS JOIN stats s),
    r AS (
      SELECT doc_id, term, tf, df, round(s9, 6) AS bm25,
             row_number() OVER (PARTITION BY doc_id
                                ORDER BY s9 DESC, term) AS rk
      FROM scored)
    SELECT doc_id, term, tf, df, bm25, rk FROM r WHERE rk <= 3
    """,
    doc="BM25 top-terms per document (Robertson k1=1.2, b=0.75 — the "
    "standard relevance/quality-scoring primitive for training-data "
    "selection). Corpus stats are two exact integer aggregates (doc "
    "count, total token count); tf and df come from hash aggs on "
    "(doc_id, term) and term. Cross-engine float discipline: Spark and "
    "DuckDB ln() differ at 1 ulp on ~8%% of inputs (measured), so "
    "ranking uses round(score, 9) with a term tie-break — the same "
    "cos9 pattern as the ANN tier — and only round(score, 6) is "
    "emitted. Scale: the df join shuffles on term; stopword-grade hot "
    "terms are bounded because df is a pre-aggregated one-row-per-term "
    "table (no fan-out), and the per-doc ranking window partitions by "
    "doc_id. Nothing is collected to the driver; the one-row stats "
    "frame rides a broadcast cross join.",
    tags=("text", "llm", "bm25", "tfidf", "ranking", "scale"),
)
def q97_bm25_topterms(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    d = t(spark, sf_dir, "documents").select("doc_id", tokens("text").alias("tk"))
    dl = d.select("doc_id", F.size("tk").alias("dl"))
    tf = (
        d.select("doc_id", F.explode("tk").alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
    )
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    stats = dl.agg(
        F.count("*").alias("n_docs"),
        (F.sum("dl").cast("double") / F.count("*")).alias("avgdl"),
    )
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs").cast("double") - F.col("df") + F.lit(0.5))
        / (F.col("df") + F.lit(0.5))
    )
    tfc = (F.col("tf").cast("double") * F.lit(2.2)) / (
        F.col("tf").cast("double")
        + F.lit(1.2)
        * (F.lit(0.25) + F.lit(0.75) * (F.col("dl").cast("double") / F.col("avgdl")))
    )
    scored = (
        tf.join(dfreq, "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .withColumn("s9", F.round(idf * tfc, 9))
    )
    return (
        scored.withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("doc_id").orderBy(F.col("s9").desc(), "term")
            ),
        )
        .filter(F.col("rk") <= 3)
        .select("doc_id", "term", "tf", "df", F.round("s9", 6).alias("bm25"), "rk")
    )


@register(
    "q100_bigram_logprob",
    oracle="""
    WITH toks AS MATERIALIZED (
      SELECT doc_id,
             list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                         t -> t <> '') AS tk
      FROM documents),
    pairs AS MATERIALIZED (
      SELECT doc_id, tk[i] AS w1, tk[i + 1] AS w2
      FROM toks CROSS JOIN LATERAL (
        SELECT unnest(range(1, len(tk))) AS i) idx
      WHERE len(tk) >= 2),
    c2 AS MATERIALIZED (
      SELECT w1, w2, count(*) AS c2 FROM pairs GROUP BY w1, w2),
    c1 AS MATERIALIZED (
      SELECT w1, count(*) AS c1 FROM pairs GROUP BY w1),
    vocab AS (
      SELECT count(DISTINCT w) AS v
      FROM (SELECT unnest(tk) AS w FROM toks)),
    scored AS (
      SELECT p.doc_id,
             CAST(round(ln((CAST(c2.c2 AS DOUBLE) + 1.0)
                           / (CAST(c1.c1 AS DOUBLE) + CAST(vo.v AS DOUBLE)))
                        * 1000000.0) AS BIGINT) AS lq
      FROM pairs p
      JOIN c2 ON p.w1 = c2.w1 AND p.w2 = c2.w2
      JOIN c1 ON p.w1 = c1.w1
      CROSS JOIN vocab vo)
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_bigrams,
           round((CAST(sum(lq) AS DOUBLE) / count(*)) / 1000000.0, 6)
             AS avg_logprob
    FROM scored GROUP BY doc_id
    """,
    doc="Bigram-LM document scoring (KenLM-style quality filter for "
    "training-data selection): corpus bigram model with add-one "
    "smoothing, P(w2|w1) = (c2+1)/(c1+V), per-doc mean log-prob. "
    "Float discipline: each ln is quantized to integer micro-nats "
    "(round(ln*1e6)) BEFORE the per-doc sum, so the aggregate is exact "
    "integer arithmetic and immune to summation order — the only "
    "cross-engine float ops are the ln itself (1-ulp differences "
    "vanish in the quantization) and one final division. Scale: two "
    "hash aggs build the model (bigram and unigram-context counts), "
    "the scoring join shuffles on (w1, w2) — hot function-word bigrams "
    "are bounded because counts are pre-aggregated (fan-out 1 per "
    "probe row); the vocab size rides a one-row broadcast.",
    tags=("text", "llm", "lm", "quality", "scale"),
)
def q100_bigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents").select("doc_id", tokens("text").alias("tk"))
    pairs = (
        d.filter(F.size("tk") >= 2)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(sequence(0, size(tk) - 2), "
                    "i -> struct(tk[i] as w1, tk[i + 1] as w2))"
                )
            ).alias("p"),
        )
        .select("doc_id", "p.w1", "p.w2")
    )
    c2 = pairs.groupBy("w1", "w2").agg(F.count("*").alias("c2"))
    c1 = pairs.groupBy("w1").agg(F.count("*").alias("c1"))
    vocab = (
        d.select(F.explode("tk").alias("w"))
        .agg(F.countDistinct("w").alias("v"))
    )
    lq = F.round(
        F.log(
            (F.col("c2").cast("double") + F.lit(1.0))
            / (F.col("c1").cast("double") + F.col("v").cast("double"))
        )
        * 1000000.0,
        0,
    ).cast("long")
    scored = (
        pairs.join(c2, ["w1", "w2"])
        .join(c1, "w1")
        .crossJoin(F.broadcast(vocab))
        .withColumn("lq", lq)
    )
    return scored.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_bigrams"),
        F.round(
            (F.sum("lq").cast("double") / F.count("*")) / 1000000.0, 6
        ).alias("avg_logprob"),
    )


@register(
    "q101_bpe_merge_topk",
    oracle="""
    WITH toks AS MATERIALIZED (
      SELECT doc_id,
             list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                         t -> t <> '') AS tk
      FROM documents),
    words AS MATERIALIZED (
      SELECT w FROM (SELECT unnest(tk) AS w FROM toks) WHERE length(w) >= 2),
    cpairs AS (
      SELECT substr(w, i, 1) || substr(w, i + 1, 1) AS pair
      FROM words CROSS JOIN LATERAL (
        SELECT unnest(range(1, length(w))) AS i) idx),
    counts AS (
      SELECT pair, count(*) AS cnt FROM cpairs GROUP BY pair)
    SELECT pair, cnt,
           row_number() OVER (ORDER BY cnt DESC, pair) AS rk
    FROM counts
    QUALIFY rk <= 20
    """,
    doc="One BPE merge iteration (tokenizer training primitive): count "
    "every adjacent character pair across all token OCCURRENCES "
    "(frequency-weighted, as BPE training requires) and rank the top "
    "20 merge candidates. The count is one hash agg over exploded "
    "pairs — at 100 TB the pair alphabet is tiny (<=36^2 symbols after "
    "lowercasing) so the final agg state is constant-size and the "
    "top-k is a TakeOrdered (per-partition top-20 then a 20-row driver "
    "merge; the row_number window runs on the already-limited 20 rows, "
    "never on the full distribution). Iterating merges re-runs this "
    "with the learned symbol table applied — each round is the same "
    "shuffle shape.",
    tags=("text", "llm", "bpe", "tokenizer", "scale"),
)
def q101_bpe_merge_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    d = t(spark, sf_dir, "documents").select("doc_id", tokens("text").alias("tk"))
    words = d.select(F.explode("tk").alias("w")).filter(F.length("w") >= 2)
    cpairs = words.select(
        F.explode(
            F.expr(
                "transform(sequence(1, length(w) - 1), "
                "i -> concat(substring(w, i, 1), substring(w, i + 1, 1)))"
            )
        ).alias("pair")
    )
    counts = cpairs.groupBy("pair").agg(F.count("*").alias("cnt"))
    top = counts.orderBy(F.col("cnt").desc(), "pair").limit(20)
    return top.withColumn(
        "rk",
        F.row_number().over(Window.orderBy(F.col("cnt").desc(), "pair")),
    )


# --- BPE merge application (tokenizer inference half; q101 is training) ----

# a fixed learned merge table, priority order — later merges may
# reference earlier merge products (th+e), exactly like a real BPE
# tokenizer file
_BPE_MERGES = (
    ("t", "h"), ("h", "e"), ("i", "n"), ("e", "r"),
    ("a", "n"), ("r", "e"), ("o", "n"), ("th", "e"),
)
# fixed replace passes per merge: replace() consumes the shared '|'
# delimiter, so a run of identical pairs needs ceil(log2(run)) passes;
# 3 passes cover runs up to 8 — beyond any natural-language token —
# and, being fixed, both engines compute the identical fixpoint
_BPE_PASSES = 3


def _bpe_merge_chain(expr: str) -> str:
    """Engine-shared SQL: apply the merge table to a '|'-delimited
    symbol sequence via literal replace() chains (identical semantics
    in Spark SQL and DuckDB — left-to-right, non-overlapping)."""
    for a, b in _BPE_MERGES:
        for _ in range(_BPE_PASSES):
            expr = f"replace({expr}, '|{a}|{b}|', '|{a}{b}|')"
    return expr


def _bpe_nsym(expr: str) -> str:
    """Symbols in a delimited sequence = pipes - 1."""
    return f"(length({expr}) - length(replace({expr}, '|', ''))) - 1"


@register(
    "q120_bpe_apply",
    oracle=f"""
    WITH toks AS MATERIALIZED (
      SELECT doc_id,
             list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                         t -> t <> '') AS tk
      FROM documents),
    words AS (
      SELECT doc_id, unnest(tk) AS w FROM toks),
    seqs AS (
      SELECT doc_id, w,
             '|' || regexp_replace(w, '(.)', '\\1|', 'g') AS seq
      FROM words),
    applied AS (
      SELECT doc_id, w,
             {_bpe_merge_chain("seq")} AS seq2
      FROM seqs)
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_words,
           CAST(sum(length(w)) AS BIGINT) AS n_chars,
           CAST(sum({_bpe_nsym("seq2")}) AS BIGINT) AS n_symbols,
           round(sum({_bpe_nsym("seq2")}) * 1.0 / count(*), 6) AS fertility
    FROM applied
    GROUP BY doc_id
    """,
    doc="BPE merge application — the inference half of the tokenizer "
    "story (q101 trains the merge ranking; this applies a learned "
    "merge table to the corpus and measures fertility, the "
    "tokens-per-word number a 100 TB pipeline budget hangs on). Each "
    "word becomes a '|'-delimited symbol sequence; the 8-merge table "
    "applies in priority order as literal replace() chains (3 fixed "
    "passes per merge — replace() consumes the shared delimiter, so a "
    "fixed pass count makes the fixpoint engine-exact; merges may "
    "reference earlier merge products, e.g. th+e). Pure JVM string "
    "expressions inside whole-stage codegen — no UDF; one hash agg "
    "per doc. The oracle runs the IDENTICAL generated replace chain "
    "in DuckDB.",
    tags=("text", "llm", "bpe", "tokenizer"),
)
def q120_bpe_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents").select(
        "doc_id", tokens("text").alias("tk")
    )
    words = d.select("doc_id", F.explode("tk").alias("w"))
    seqs = words.withColumn(
        "seq",
        F.concat(F.lit("|"), F.regexp_replace("w", "(.)", "$1|")),
    )
    applied = seqs.withColumn("seq2", F.expr(_bpe_merge_chain("seq")))
    nsym = F.expr(_bpe_nsym("seq2"))
    return applied.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_words"),
        F.sum(F.length("w")).cast("long").alias("n_chars"),
        F.sum(nsym).cast("long").alias("n_symbols"),
        F.round(F.sum(nsym) / F.count("*"), 6).alias("fertility"),
    )


# --- BPE TRAINING loop (q101 = one counting round; this iterates) ----------

_BPE_TRAIN_ROUNDS = 4


def _bpe_train_oracle(rounds: int) -> str:
    """Unroll the BPE training loop as chained CTEs: round r counts
    adjacent symbol pairs of seq{r-1}, picks the (count desc, a, b)
    argmax merge, and applies it via the same fixed replace passes the
    engine uses (scalar subqueries carry the learned pair)."""
    ctes = [
        """toks AS MATERIALIZED (
      SELECT list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                         t -> t <> '') AS tk
      FROM documents),
    seq0 AS MATERIALIZED (
      SELECT '|' || regexp_replace(w, '(.)', '\\1|', 'g') AS seq
      FROM (SELECT unnest(tk) AS w FROM toks))"""
    ]
    for r in range(1, rounds + 1):
        prev = f"seq{r - 1}"
        a_sub = f"(SELECT a FROM m{r})"
        b_sub = f"(SELECT b FROM m{r})"
        pat = f"'|' || {a_sub} || '|' || {b_sub} || '|'"
        rep = f"'|' || {a_sub} || {b_sub} || '|'"
        apply_expr = "seq"
        for _ in range(_BPE_PASSES):
            apply_expr = f"replace({apply_expr}, {pat}, {rep})"
        ctes.append(
            f"""sym{r} AS (
      SELECT list_filter(regexp_split_to_array(seq, '\\|'),
                         x -> x <> '') AS sy
      FROM {prev}),
    pc{r} AS (
      SELECT sy[i] AS a, sy[i + 1] AS b, count(*) AS cnt
      FROM sym{r} CROSS JOIN LATERAL (
        SELECT unnest(range(1, len(sy))) AS i) ix
      GROUP BY 1, 2),
    m{r} AS MATERIALIZED (
      SELECT a, b, cnt FROM pc{r} ORDER BY cnt DESC, a, b LIMIT 1),
    seq{r} AS MATERIALIZED (
      SELECT {apply_expr} AS seq FROM {prev})"""
        )
        prev = f"seq{r}"
    finals = "\n    UNION ALL ".join(
        f"SELECT {r} AS merge_round, a AS lhs, b AS rhs,"
        f" CAST(cnt AS BIGINT) AS cnt FROM m{r}"
        for r in range(1, rounds + 1)
    )
    return "WITH " + ",\n    ".join(ctes) + "\n    " + finals


@register(
    "q131_bpe_train",
    oracle=_bpe_train_oracle(_BPE_TRAIN_ROUNDS),
    doc="BPE TRAINING loop — the full tokenizer-training iteration "
    "q101's docstring promises: 4 rounds of [count adjacent symbol "
    "pairs across all word occurrences -> argmax merge (count desc, "
    "then lexicographic — deterministic) -> apply the merge to every "
    "sequence via the q120 fixed replace passes]. Learned merges "
    "COMPOUND: later rounds count pairs over merged symbols. The "
    "Spark side is a driver loop whose per-round shuffle is one hash "
    "agg over the pair alphabet (constant-size state) + a 1-row "
    "TakeOrdered argmax — the ONLY thing ever collected; sequences "
    "stay distributed and localCheckpoint truncates the replace-chain "
    "lineage each round (the Lloyd/solver iteration pattern, SURVEY "
    "§4). The oracle unrolls the identical 4 rounds as chained CTEs "
    "with scalar-subquery merges. All-integer counts, string-exact "
    "merges.",
    tags=("text", "llm", "bpe", "tokenizer", "iterative", "scale"),
)
def q131_bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents").select(tokens("text").alias("tk"))
    seq = (
        d.select(F.explode("tk").alias("w"))
        .select(
            F.concat(
                F.lit("|"), F.regexp_replace("w", "(.)", "$1|")
            ).alias("seq")
        )
        .localCheckpoint(eager=False)
    )
    learned = []
    for r in range(1, _BPE_TRAIN_ROUNDS + 1):
        pairs = seq.select(
            F.explode(
                F.expr(
                    "transform(sequence(1, size(filter(split(seq, '\\\\|'),"
                    " x -> x <> '')) - 1), i -> struct("
                    "get(filter(split(seq, '\\\\|'), x -> x <> ''), i - 1)"
                    " AS a,"
                    " get(filter(split(seq, '\\\\|'), x -> x <> ''), i)"
                    " AS b))"
                )
            ).alias("p")
        ).select("p.a", "p.b")
        # single-symbol sequences: Spark's sequence(1, 0) DESCENDS and
        # fabricates null-padded index pairs — drop them (the oracle's
        # range(1, 1) is empty, so it never sees such rows)
        pairs = pairs.filter(
            F.col("a").isNotNull() & F.col("b").isNotNull()
        )
        win = (
            pairs.groupBy("a", "b")
            .agg(F.count("*").alias("cnt"))
            .orderBy(F.col("cnt").desc(), "a", "b")
            .limit(1)
            .collect()[0]
        )
        learned.append((r, win["a"], win["b"], win["cnt"]))
        pat, rep = f"|{win['a']}|{win['b']}|", f"|{win['a']}{win['b']}|"
        for _ in range(_BPE_PASSES):
            seq = seq.withColumn(
                "seq", F.expr(f"replace(seq, '{pat}', '{rep}')")
            )
        seq = seq.localCheckpoint(eager=False)
    return spark.createDataFrame(
        learned, "merge_round int, lhs string, rhs string, cnt long"
    )


# --- Count-Min sketch heavy hitters ----------------------------------------

_CMS_D = 4  # hash rows (first 4 members of the minhash family)
_CMS_W = 1024  # counters per row
_CMS_TOPK = 20


def _cms_ab_sql() -> str:
    from columnarmodeling_spark.functions.text import MINHASH_AB

    rows = ", ".join(
        f"({j}, {a}, {b})" for j, (a, b) in enumerate(MINHASH_AB[:_CMS_D])
    )
    return f"(VALUES {rows}) AS ab(j, a, b)"


@register(
    "q132_countmin_sketch",
    oracle=f"""
    WITH toks AS MATERIALIZED (
      SELECT unnest(list_filter(regexp_split_to_array(lower(text),
             '[^a-z0-9]+'), t -> t <> '')) AS tk
      FROM documents),
    h AS MATERIALIZED (
      SELECT tk,
             CAST(('0x' || substr(md5(tk), 1, 15)) AS BIGINT)
               % {MERSENNE_P} AS u
      FROM toks),
    cms AS MATERIALIZED (
      SELECT ab.j, ((ab.a * h.u + ab.b) % {MERSENNE_P}) % {_CMS_W} AS col,
             count(*) AS cnt
      FROM h CROSS JOIN {_cms_ab_sql()}
      GROUP BY 1, 2),
    exact AS MATERIALIZED (
      SELECT tk, any_value(u) AS u, count(*) AS exact_cnt
      FROM h GROUP BY tk),
    top AS MATERIALIZED (
      SELECT tk, u, exact_cnt
      FROM exact
      QUALIFY row_number() OVER (ORDER BY exact_cnt DESC, tk)
              <= {_CMS_TOPK}),
    est AS (
      SELECT t.tk, t.exact_cnt, min(c.cnt) AS cms_est
      FROM top t
      CROSS JOIN {_cms_ab_sql()}
      JOIN cms c ON c.j = ab.j
               AND c.col = ((ab.a * t.u + ab.b) % {MERSENNE_P}) % {_CMS_W}
      GROUP BY 1, 2)
    SELECT tk, CAST(exact_cnt AS BIGINT) AS exact_cnt,
           CAST(cms_est AS BIGINT) AS cms_est,
           CAST(cms_est - exact_cnt AS BIGINT) AS overcount
    FROM est
    """,
    doc="Count-Min sketch heavy hitters — the space-bounded frequency "
    "primitive a 100 TB token-statistics job keeps instead of a "
    "vocabulary-sized hash table (Cormode & Muthukrishnan 2005): a "
    "4 x 1024 counter matrix built as ONE hash aggregate over "
    "(row, LCG-hashed column) pairs — 4096 rows of state REGARDLESS "
    "of vocabulary size, map-side combinable and mergeable across "
    "corpus shards by simple addition. The eval joins the exact "
    "top-20 tokens (TakeOrdered) against the sketch: est = min over "
    "the 4 rows, always >= the true count (one-sided error — "
    "property-tested), with the overcount column pinning collision "
    "noise. Same md5-prefix + minhash-family hashing as the "
    "Bloom/minhash tier; all-integer end-to-end.",
    tags=("text", "llm", "sketch", "countmin", "scale"),
)
def q132_countmin_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    from columnarmodeling_spark.functions.text import (
        MERSENNE_P,
        MINHASH_AB,
        hex_hash,
    )

    ab = spark.createDataFrame(
        [(j, a, b) for j, (a, b) in enumerate(MINHASH_AB[:_CMS_D])],
        "j INT, a LONG, b LONG",
    )
    toks = (
        t(spark, sf_dir, "documents")
        .select(F.explode(tokens("text")).alias("tk"))
    )
    h = toks.select(
        "tk", (hex_hash("tk") % MERSENNE_P).alias("u")
    ).localCheckpoint(eager=False)
    col = ((F.col("a") * F.col("u") + F.col("b")) % MERSENNE_P) % F.lit(
        _CMS_W
    )
    cms = (
        h.crossJoin(F.broadcast(ab))
        .select("j", col.alias("col"))
        .groupBy("j", "col")
        .agg(F.count("*").alias("cnt"))
    )
    exact = h.groupBy("tk").agg(
        F.first("u").alias("u"), F.count("*").alias("exact_cnt")
    )
    top = (
        exact.withColumn(
            "rk",
            F.row_number().over(
                Window.orderBy(F.col("exact_cnt").desc(), "tk")
            ),
        )
        .filter(F.col("rk") <= _CMS_TOPK)
        .select("tk", "u", "exact_cnt")
    )
    probe = top.crossJoin(F.broadcast(ab)).select(
        "tk", "exact_cnt", "j", col.alias("col")
    )
    est = (
        probe.join(F.broadcast(cms), ["j", "col"])
        .groupBy("tk", "exact_cnt")
        .agg(F.min("cnt").alias("cms_est"))
    )
    return est.select(
        "tk",
        F.col("exact_cnt").cast("long").alias("exact_cnt"),
        F.col("cms_est").cast("long").alias("cms_est"),
        (F.col("cms_est") - F.col("exact_cnt"))
        .cast("long")
        .alias("overcount"),
    )


# --- HyperLogLog distinct-count sketch --------------------------------------

_HLL_M = 512  # registers (p = 9)
# alpha_m * m^2 * 2^52: every factor is a power of two except the alpha
# double, so the product is ONE deterministic double literal shared with
# the oracle (multiplying a double by 2^k is exact — no rounding).
_HLL_ALPHA_NUM = repr(0.7213 / (1.0 + 1.079 / 512.0) * 512 * 512 * 2.0**52)


@register(
    "q134_hll_distinct",
    oracle=f"""
    WITH toks AS (
      SELECT lang, list_filter(regexp_split_to_array(lower(text),
             '[^a-z0-9]+'), t -> t <> '') AS tk
      FROM documents),
    sh AS (
      SELECT lang,
             unnest(list_transform(range(1, len(tk)-1),
                    i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])) AS tk
      FROM toks),
    h AS MATERIALIZED (
      SELECT lang, tk,
             CAST(('0x' || substr(md5(tk), 1, 15)) AS BIGINT) AS u
      FROM sh),
    reg AS (
      SELECT lang, u % {_HLL_M} AS bucket,
             max(CASE WHEN u // {_HLL_M} = 0 THEN 52
                      ELSE 52 - length(bin(u // {_HLL_M})) END) AS r
      FROM h GROUP BY 1, 2),
    sk AS (
      SELECT lang, count(*) AS occupied,
             sum(CAST(1 AS BIGINT) << (52 - r)) AS z_occ
      FROM reg GROUP BY 1),
    ex AS (
      SELECT lang, count(DISTINCT tk) AS exact_distinct FROM h GROUP BY 1),
    est AS (
      SELECT lang, occupied,
             {_HLL_ALPHA_NUM} / (z_occ + ({_HLL_M} - occupied)
                                 * (CAST(1 AS BIGINT) << 52)) AS e
      FROM sk)
    SELECT x.lang,
           CAST(x.exact_distinct AS BIGINT) AS exact_distinct,
           CAST(s.occupied AS BIGINT) AS occupied,
           round(s.e, 3) AS hll_est,
           round((s.e - x.exact_distinct) / x.exact_distinct, 4) AS rel_err
    FROM ex x JOIN est s USING (lang)
    """,
    doc="HyperLogLog distinct-count sketch (Flajolet et al. 2007) — "
    "completes the mergeable-sketch family (Bloom membership q127, "
    "Count-Min frequency q132, MinHash similarity q43): per-lang "
    "3-shingle vocabulary cardinality (3k-9k true — comfortably "
    "above the 2.5m small-range bound where the raw estimator is "
    "valid) from 512 registers instead of a vocabulary-sized "
    "distinct agg. One hash agg builds the "
    "registers (bucket = low 9 hash bits, rho = leading-zero rank "
    "of the remaining 51 via length(bin()) — pure JVM expressions); "
    "registers merge across corpus shards by max, the property that "
    "lets a 100 TB scan keep 4 KB of state per group. The harmonic "
    "denominator is summed in EXACT integer arithmetic (sum of "
    "1<<(52-rho), zeros counted at 1<<52), and the alpha*m^2/Z "
    "estimate performs exactly ONE float division against a shared "
    "double literal, so Spark and DuckDB replay it bit-for-bit; the "
    "raw (uncorrected) estimator is emitted with exact distinct and "
    "relative error alongside. approx_count_distinct (Spark's "
    "HLL++) covers the built-in path in q74; this is the engine's "
    "own portable, mergeable register layout.",
    tags=("text", "llm", "sketch", "hll", "scale"),
)
def q134_hll_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    m = _HLL_M
    toks = (
        t(spark, sf_dir, "documents")
        .withColumn("tk", tokens("text"))
        .select("lang", F.explode(word_shingles("tk", 3)).alias("tk"))
    )
    h = toks.select("lang", "tk", hex_hash("tk").alias("u")).localCheckpoint(eager=False)
    w = F.expr(f"div(u, {m})")
    rho = F.when(w == F.lit(0), F.lit(52)).otherwise(
        F.lit(52) - F.length(F.bin(w))
    )
    reg = (
        h.select("lang", (F.col("u") % m).alias("bucket"), rho.alias("rho"))
        .groupBy("lang", "bucket")
        .agg(F.max("rho").alias("r"))
    )
    sk = reg.groupBy("lang").agg(
        F.count("*").alias("occupied"),
        F.sum(F.expr("shiftleft(CAST(1 AS BIGINT), 52 - r)")).alias("z_occ"),
    )
    ex = h.groupBy("lang").agg(F.countDistinct("tk").alias("exact_distinct"))
    e = F.lit(float(_HLL_ALPHA_NUM)) / (
        F.col("z_occ") + (m - F.col("occupied")) * F.lit(1 << 52)
    )
    return (
        ex.join(sk, "lang")
        .withColumn("e", e)
        .select(
            "lang",
            F.col("exact_distinct").cast("long").alias("exact_distinct"),
            F.col("occupied").cast("long").alias("occupied"),
            F.round("e", 3).alias("hll_est"),
            F.round(
                (F.col("e") - F.col("exact_distinct"))
                / F.col("exact_distinct"),
                4,
            ).alias("rel_err"),
        )
    )


_PMI_MIN_COUNT = 5


@register(
    "q151_pmi_collocations",
    oracle=f"""
    WITH toks AS MATERIALIZED (
      SELECT doc_id,
             list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                         t -> t <> '') AS tk
      FROM documents),
    pairs AS MATERIALIZED (
      SELECT tk[i] AS w1, tk[i + 1] AS w2
      FROM toks CROSS JOIN LATERAL (
        SELECT unnest(range(1, len(tk))) AS i) idx
      WHERE len(tk) >= 2),
    c2 AS MATERIALIZED (
      SELECT w1, w2, count(*) AS c2 FROM pairs GROUP BY w1, w2
      HAVING count(*) >= {_PMI_MIN_COUNT}),
    cw AS MATERIALIZED (
      SELECT w, count(*) AS cw
      FROM (SELECT unnest(tk) AS w FROM toks) GROUP BY w),
    tot AS (
      SELECT (SELECT count(*) FROM pairs) AS np,
             (SELECT CAST(sum(len(tk)) AS BIGINT) FROM toks) AS nt)
    SELECT c2.w1, c2.w2, CAST(c2.c2 AS BIGINT) AS c2,
           CAST(round(ln((CAST(c2.c2 AS DOUBLE) * CAST(t.nt AS DOUBLE)
                          * CAST(t.nt AS DOUBLE))
                         / (CAST(t.np AS DOUBLE) * CAST(a.cw AS DOUBLE)
                            * CAST(b.cw AS DOUBLE)))
                      * 1000000.0) AS BIGINT) AS pmi_micro
    FROM c2
    JOIN cw a ON a.w = c2.w1
    JOIN cw b ON b.w = c2.w2
    CROSS JOIN tot t
    """,
    doc="PMI collocation mining (phrase discovery for tokenizer/vocab "
    "construction — the classic pointwise-mutual-information filter "
    "over corpus bigrams): PMI(w1,w2) = ln(P(w1,w2)/(P(w1)P(w2))) "
    "with P from exact corpus counts, reported for every bigram seen "
    "at least 5 times. Float discipline follows q100: all counts stay "
    "int64, exactly one ln per surviving bigram runs on an "
    "identically-computed double ratio, and the score is quantized to "
    "integer micro-nats — no float aggregation anywhere. Scale: the "
    "min-count HAVING prunes the bigram relation BEFORE the unigram "
    "joins (the Zipf tail — most of the pair space — never shuffles "
    "again); both joins are equi-joins keyed on a word, fan-out 1 per "
    "surviving bigram since counts are pre-aggregated; the two corpus "
    "totals ride a one-row broadcast.",
    tags=("text", "llm", "pmi", "collocation", "scale"),
)
def q151_pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents").select(
        "doc_id", tokens("text").alias("tk")
    )
    pairs = (
        d.filter(F.size("tk") >= 2)
        .select(
            F.explode(
                F.expr(
                    "transform(sequence(0, size(tk) - 2), "
                    "i -> struct(tk[i] as w1, tk[i + 1] as w2))"
                )
            ).alias("p")
        )
        .select("p.w1", "p.w2")
    )
    c2 = (
        pairs.groupBy("w1", "w2")
        .agg(F.count("*").alias("c2"))
        .filter(F.col("c2") >= _PMI_MIN_COUNT)
    )
    cw = (
        d.select(F.explode("tk").alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("cw"))
    )
    tot = pairs.agg(F.count("*").alias("np")).crossJoin(
        d.select(F.explode("tk").alias("w")).agg(
            F.count("*").cast("long").alias("nt")
        )
    )
    ratio = (
        F.col("c2").cast("double")
        * F.col("nt").cast("double")
        * F.col("nt").cast("double")
    ) / (
        F.col("np").cast("double")
        * F.col("cw1").cast("double")
        * F.col("cw2").cast("double")
    )
    return (
        c2.join(cw.select(F.col("w").alias("w1"), F.col("cw").alias("cw1")), "w1")
        .join(cw.select(F.col("w").alias("w2"), F.col("cw").alias("cw2")), "w2")
        .crossJoin(F.broadcast(tot))
        .select(
            "w1",
            "w2",
            F.col("c2").cast("long").alias("c2"),
            F.round(F.log(ratio) * 1000000.0, 0)
            .cast("long")
            .alias("pmi_micro"),
        )
    )


@register(
    "q154_token_entropy",
    oracle="""
    WITH toks AS (
      SELECT doc_id,
             list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                         t -> t <> '') AS tk
      FROM documents),
    freq AS (
      SELECT doc_id, w, count(*) AS c
      FROM (SELECT doc_id, unnest(tk) AS w FROM toks)
      GROUP BY doc_id, w),
    agg AS (
      SELECT doc_id,
             CAST(sum(c) AS BIGINT) AS n,
             count(*) AS n_distinct,
             CAST(sum(c * CAST(round(ln(CAST(c AS DOUBLE)) * 1000000.0)
                               AS BIGINT)) AS BIGINT) AS sq
      FROM freq GROUP BY doc_id)
    SELECT doc_id, n AS n_tokens, CAST(n_distinct AS BIGINT) AS n_distinct,
           CAST(round(CAST(round(ln(CAST(n AS DOUBLE)) * 1000000.0) AS BIGINT)
                      - CAST(sq AS DOUBLE) / n) AS BIGINT) AS entropy_micro
    FROM agg
    """,
    doc="Per-document token-distribution Shannon entropy (quality "
    "signal: low entropy flags boilerplate and keyword-stuffed spam, "
    "complementing q54's repetition ratio): H = ln(n) − Σ c·ln(c)/n "
    "over the document's token frequency table, in nats. Float "
    "discipline follows q100: each ln(c) is quantized to integer "
    "micro-nats BEFORE the weighted per-doc sum, so the aggregation "
    "is exact int64 arithmetic immune to summation order; the only "
    "remaining float ops (one division by n, one subtraction) run on "
    "identical int64-derived doubles on both engines. Scale: two "
    "map-side-combinable hash aggs, both keyed on doc_id — the "
    "per-document frequency table never leaves the document's "
    "shuffle partition, no corpus-global state at all.",
    tags=("text", "llm", "entropy", "quality", "scale"),
)
def q154_token_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents").select(
        "doc_id", tokens("text").alias("tk")
    )
    freq = (
        d.select("doc_id", F.explode("tk").alias("w"))
        .groupBy("doc_id", "w")
        .agg(F.count("*").alias("c"))
    )
    lnq = F.round(F.log(F.col("c").cast("double")) * 1000000.0, 0).cast(
        "long"
    )
    agg = freq.groupBy("doc_id").agg(
        F.sum("c").cast("long").alias("n"),
        F.count("*").alias("n_distinct"),
        F.sum(F.col("c") * lnq).cast("long").alias("sq"),
    )
    lnn = F.round(F.log(F.col("n").cast("double")) * 1000000.0, 0).cast(
        "long"
    )
    return agg.select(
        "doc_id",
        F.col("n").alias("n_tokens"),
        F.col("n_distinct").cast("long").alias("n_distinct"),
        F.round(lnn - F.col("sq").cast("double") / F.col("n"), 0)
        .cast("long")
        .alias("entropy_micro"),
    )


_HSA_LANGS = ("en", "es")


@register(
    "q185_hll_set_algebra",
    oracle=f"""
    WITH toks AS (
      SELECT lang, list_filter(regexp_split_to_array(lower(text),
             '[^a-z0-9]+'), t -> t <> '') AS tk
      FROM documents WHERE lang IN ('en', 'es')),
    sh AS (
      SELECT lang,
             unnest(list_transform(range(1, len(tk)-1),
                    i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])) AS tk
      FROM toks),
    h AS MATERIALIZED (
      SELECT lang, tk,
             CAST(('0x' || substr(md5(tk), 1, 15)) AS BIGINT) AS u
      FROM sh),
    reg AS (
      SELECT lang, u % {_HLL_M} AS bucket,
             max(CASE WHEN u // {_HLL_M} = 0 THEN 52
                      ELSE 52 - length(bin(u // {_HLL_M})) END) AS r
      FROM h GROUP BY 1, 2),
    ureg AS (
      SELECT bucket, max(r) AS r FROM reg GROUP BY bucket),
    est1 AS (
      SELECT lang,
             {_HLL_ALPHA_NUM} / (sum(CAST(1 AS BIGINT) << (52 - r))
               + ({_HLL_M} - count(*)) * (CAST(1 AS BIGINT) << 52)) AS e
      FROM reg GROUP BY lang),
    estu AS (
      SELECT {_HLL_ALPHA_NUM} / (sum(CAST(1 AS BIGINT) << (52 - r))
               + ({_HLL_M} - count(*)) * (CAST(1 AS BIGINT) << 52)) AS eu
      FROM ureg),
    exact AS (
      SELECT
        (SELECT count(DISTINCT tk) FROM h WHERE lang = 'en') AS xa,
        (SELECT count(DISTINCT tk) FROM h WHERE lang = 'es') AS xb,
        (SELECT count(*) FROM
          (SELECT tk FROM h WHERE lang = 'en'
           INTERSECT SELECT tk FROM h WHERE lang = 'es')) AS xi)
    SELECT round(a.e, 3) AS est_a, round(b.e, 3) AS est_b,
           round(u.eu, 3) AS est_union,
           round(a.e + b.e - u.eu, 3) AS est_inter,
           CAST(x.xa AS BIGINT) AS exact_a, CAST(x.xb AS BIGINT) AS exact_b,
           CAST(x.xi AS BIGINT) AS exact_inter
    FROM est1 a, est1 b, estu u, exact x
    WHERE a.lang = 'en' AND b.lang = 'es'
    """,
    doc="HLL set algebra — the sketch-union/intersection trick that "
    "answers cross-shard overlap questions ('how much does corpus A's "
    "vocabulary overlap corpus B's?') from 4 KB of state per corpus "
    "instead of a distinct-join: the union sketch is the per-bucket "
    "MAX of the two register sets (exactly the map-side merge a 100 "
    "TB scan already does — union costs nothing), and the "
    "intersection falls out of inclusion-exclusion est(A)+est(B)−"
    "est(A∪B) (noisier, as the emitted exact columns show — the "
    "documented trade-off vs the exact q42-style join). Exactness "
    "discipline is q134's: integer registers, exact integer harmonic "
    "denominators, one float division per estimate against the "
    "shared alpha literal, inclusion-exclusion as two IEEE adds on "
    "identical doubles.",
    tags=("text", "llm", "sketch", "hll", "set-algebra", "scale"),
)
def q185_hll_set_algebra(spark: SparkSession, sf_dir: str) -> DataFrame:
    m = _HLL_M
    toks = (
        t(spark, sf_dir, "documents")
        .filter(F.col("lang").isin(*_HSA_LANGS))
        .withColumn("tk", tokens("text"))
        .select("lang", F.explode(word_shingles("tk", 3)).alias("tk"))
    )
    h = toks.select("lang", "tk", hex_hash("tk").alias("u")).localCheckpoint(eager=False)
    w = F.expr(f"div(u, {m})")
    rho = F.when(w == F.lit(0), F.lit(52)).otherwise(
        F.lit(52) - F.length(F.bin(w))
    )
    reg = (
        h.select("lang", (F.col("u") % m).alias("bucket"), rho.alias("rho"))
        .groupBy("lang", "bucket")
        .agg(F.max("rho").alias("r"))
        .localCheckpoint(eager=False)
    )
    ureg = reg.groupBy("bucket").agg(F.max("r").alias("r"))

    def estimate(regs: DataFrame, out: str) -> DataFrame:
        return regs.agg(
            (
                F.lit(float(_HLL_ALPHA_NUM))
                / (
                    F.sum(
                        F.expr("shiftleft(CAST(1 AS BIGINT), 52 - r)")
                    )
                    + (m - F.count("*")) * F.lit(1 << 52)
                )
            ).alias(out)
        )

    ea = estimate(reg.filter(F.col("lang") == _HSA_LANGS[0]), "ea")
    eb = estimate(reg.filter(F.col("lang") == _HSA_LANGS[1]), "eb")
    eu = estimate(ureg, "eu")
    a_set = h.filter(F.col("lang") == _HSA_LANGS[0]).select("tk").distinct()
    b_set = h.filter(F.col("lang") == _HSA_LANGS[1]).select("tk").distinct()
    exact = (
        a_set.agg(F.count("*").cast("long").alias("exact_a"))
        .crossJoin(
            F.broadcast(
                b_set.agg(F.count("*").cast("long").alias("exact_b"))
            )
        )
        .crossJoin(
            F.broadcast(
                a_set.intersect(b_set).agg(
                    F.count("*").cast("long").alias("exact_inter")
                )
            )
        )
    )
    return (
        ea.crossJoin(F.broadcast(eb))
        .crossJoin(F.broadcast(eu))
        .crossJoin(F.broadcast(exact))
        .select(
            F.round("ea", 3).alias("est_a"),
            F.round("eb", 3).alias("est_b"),
            F.round("eu", 3).alias("est_union"),
            F.round(F.col("ea") + F.col("eb") - F.col("eu"), 3).alias(
                "est_inter"
            ),
            "exact_a",
            "exact_b",
            "exact_inter",
        )
    )


@register(
    "q190_cms_join_size",
    oracle=f"""
    WITH ta AS MATERIALIZED (
      SELECT unnest(list_filter(regexp_split_to_array(lower(text),
             '[^a-z0-9]+'), t -> t <> '')) AS tk
      FROM documents WHERE lang = 'en'),
    tb AS MATERIALIZED (
      SELECT unnest(list_filter(regexp_split_to_array(lower(text),
             '[^a-z0-9]+'), t -> t <> '')) AS tk
      FROM documents WHERE lang = 'es'),
    ha AS MATERIALIZED (
      SELECT tk, CAST(('0x' || substr(md5(tk), 1, 15)) AS BIGINT)
             % {MERSENNE_P} AS u FROM ta),
    hb AS MATERIALIZED (
      SELECT tk, CAST(('0x' || substr(md5(tk), 1, 15)) AS BIGINT)
             % {MERSENNE_P} AS u FROM tb),
    ca AS MATERIALIZED (
      SELECT ab.j, ((ab.a * u + ab.b) % {MERSENNE_P}) % {_CMS_W} AS col,
             count(*) AS cnt
      FROM ha CROSS JOIN {_cms_ab_sql()} GROUP BY 1, 2),
    cb AS MATERIALIZED (
      SELECT ab.j, ((ab.a * u + ab.b) % {MERSENNE_P}) % {_CMS_W} AS col,
             count(*) AS cnt
      FROM hb CROSS JOIN {_cms_ab_sql()} GROUP BY 1, 2),
    est AS (
      SELECT ca.j, CAST(round(sum(CAST(ca.cnt AS DOUBLE) * cb.cnt))
               AS BIGINT) AS e
      FROM ca JOIN cb ON cb.j = ca.j AND cb.col = ca.col
      GROUP BY ca.j),
    exact AS (
      SELECT CAST(round(sum(CAST(a.c AS DOUBLE) * b.c)) AS BIGINT) AS x
      FROM (SELECT tk, count(*) AS c FROM ta GROUP BY tk) a
      JOIN (SELECT tk, count(*) AS c FROM tb GROUP BY tk) b
        ON a.tk = b.tk)
    SELECT x.x AS exact_join_size,
           CAST(min(e.e) AS BIGINT) AS cms_est,
           CAST(min(e.e) - x.x AS BIGINT) AS overcount
    FROM est e CROSS JOIN exact x GROUP BY x.x
    """,
    doc="Join-size estimation from Count-Min sketch inner products "
    "(AGMS/CMS classic — the cardinality estimate a 100 TB planner "
    "needs BEFORE paying for an equi-join: |A ⋈ B| = Σ_k cA(k)·cB(k) "
    "is exactly the inner product of the two frequency vectors, and "
    "the sketch inner product Σ_col cmsA[d]·cmsB[d], minimized over "
    "hash rows, upper-bounds it with ε·‖A‖₁‖B‖₁ error): the en and "
    "es token streams each build the q132 4×1024 sketch (one "
    "map-side-combinable agg, constant state), the estimate touches "
    "only 4×1024 counter pairs, and the exact inner product is "
    "emitted beside it — the q170/q104 eval discipline. All "
    "integer: counters, products, the min over rows; the estimate "
    "is provably ≥ exact (one-sided), which the test pins.",
    tags=("text", "llm", "sketch", "cms", "join-size", "scale"),
)
def q190_cms_join_size(spark: SparkSession, sf_dir: str) -> DataFrame:
    from columnarmodeling_spark.functions.text import (
        MERSENNE_P as P,
        MINHASH_AB,
        hex_hash,
    )

    ab = spark.createDataFrame(
        [(j, a, b) for j, (a, b) in enumerate(MINHASH_AB[:_CMS_D])],
        "j INT, a LONG, b LONG",
    )

    def side(lang: str):
        toks = (
            t(spark, sf_dir, "documents")
            .filter(F.col("lang") == lang)
            .select(F.explode(tokens("text")).alias("tk"))
        )
        h = toks.select("tk", (hex_hash("tk") % P).alias("u"))
        cms = (
            h.crossJoin(F.broadcast(ab))
            .groupBy(
                "j",
                (
                    ((F.col("a") * F.col("u") + F.col("b")) % P)
                    % _CMS_W
                ).alias("col"),
            )
            .agg(F.count("*").alias("cnt"))
        )
        freq = h.groupBy("tk").agg(F.count("*").alias("c"))
        return cms, freq

    ca, fa = side("en")
    cb, fb = side("es")
    est = (
        ca.join(
            cb.select("j", "col", F.col("cnt").alias("cnt_b")),
            ["j", "col"],
        )
        .groupBy("j")
        # hot-cell count products in DOUBLE + round-before-cast (the
        # q216 overflow discipline: a single hot key puts cnt ~ N in
        # one cell, cnt^2 wraps int64 at ~3e9 rows)
        .agg(
            F.round(F.sum(F.col("cnt").cast("double") * F.col("cnt_b")))
            .alias("e")
        )
        .agg(F.min("e").cast("long").alias("cms_est"))
    )
    exact = (
        fa.join(fb.select("tk", F.col("c").alias("cb")), "tk")
        .agg(
            F.round(F.sum(F.col("c").cast("double") * F.col("cb")))
            .cast("long")
            .alias("exact_join_size")
        )
    )
    return exact.crossJoin(F.broadcast(est)).select(
        "exact_join_size",
        "cms_est",
        (F.col("cms_est") - F.col("exact_join_size"))
        .cast("long")
        .alias("overcount"),
    )


_FH_DIM = 64  # hashed feature dimensionality (2^6)


@register(
    "q195_feature_hashing",
    oracle=f"""
    WITH tk AS (
      SELECT doc_id,
             unnest(list_filter(regexp_split_to_array(lower(text),
                    '[^a-z0-9]+'), t -> t <> '')) AS tk
      FROM documents),
    h AS (
      SELECT doc_id,
             CAST(('0x' || substr(md5(tk), 1, 15)) AS BIGINT) AS u
      FROM tk)
    SELECT doc_id,
           u % {_FH_DIM} AS bucket,
           CAST(sum(CASE WHEN (u // {_FH_DIM}) % 2 = 0
                         THEN 1 ELSE -1 END) AS BIGINT) AS weight
    FROM h
    GROUP BY 1, 2
    HAVING sum(CASE WHEN (u // {_FH_DIM}) % 2 = 0
                    THEN 1 ELSE -1 END) <> 0
    """,
    doc="Feature hashing (the 'hashing trick', Weinberger et al. 2009 — "
    "the fixed-width featurizer that turns unbounded vocabularies "
    "into trainable vectors with NO vocabulary build, dictionary "
    "broadcast, or second pass): every token occurrence hashes to one "
    "of 64 buckets via the repo's 60-bit md5 idiom, with a SIGN bit "
    "drawn from the next hash bit so collisions cancel in expectation "
    "(the signed-sum variance fix from the paper). Output is the "
    "sparse (doc, bucket, weight) triple relation, zero-weight cells "
    "dropped on BOTH engines (HAVING vs post-agg filter). One "
    "explode + one hash agg — map-side combinable, no joins, no "
    "driver state; the 100 TB featurization pass is embarrassingly "
    "parallel and the model dimension is a constant.",
    tags=("llm", "text", "features", "hashing", "agg", "scale"),
)
def q195_feature_hashing(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents").select(
        "doc_id", F.explode(tokens("text")).alias("tk")
    )
    u = F.conv(F.substring(F.md5("tk"), 1, 15), 16, 10).cast("long")
    h = d.select("doc_id", u.alias("u"))
    sign = F.when(
        F.expr(f"div(u, {_FH_DIM})") % 2 == 0, F.lit(1)
    ).otherwise(F.lit(-1))
    return (
        h.groupBy(
            "doc_id", (F.col("u") % _FH_DIM).alias("bucket")
        )
        .agg(F.sum(sign).cast("long").alias("weight"))
        .filter(F.col("weight") != 0)
    )


@register(
    "q203_psi_drift",
    oracle=f"""
    WITH tk AS (
      SELECT lang,
             unnest(list_filter(regexp_split_to_array(lower(text),
                    '[^a-z0-9]+'), t -> t <> '')) AS tk
      FROM documents WHERE lang IN ('en', 'es')),
    h AS (
      SELECT lang,
             CAST(('0x' || substr(md5(tk), 1, 15)) AS BIGINT)
               % {_FH_DIM} AS bucket
      FROM tk),
    grid AS (
      SELECT l.lang, b.bucket
      FROM (SELECT unnest(['en', 'es']) AS lang) l
      CROSS JOIN (SELECT unnest(range(0, {_FH_DIM})) AS bucket) b),
    c AS (
      SELECT g.lang, g.bucket,
             CAST(count(h.bucket) + 1 AS BIGINT) AS c1
      FROM grid g
      LEFT JOIN h ON h.lang = g.lang AND h.bucket = g.bucket
      GROUP BY 1, 2),
    tot AS (
      SELECT lang, CAST(sum(c1) AS BIGINT) AS t FROM c GROUP BY 1),
    p AS (
      SELECT c.bucket,
             CAST(c.c1 AS DOUBLE) / t.t AS p,
             c.lang
      FROM c JOIN tot t ON t.lang = c.lang),
    w AS (
      SELECT a.bucket,
             CAST(round((a.p - b.p) * 1000000) AS BIGINT) AS d_micro,
             CAST(round(ln(a.p / b.p) * 1000000) AS BIGINT) AS l_micro
      FROM (SELECT bucket, p FROM p WHERE lang = 'en') a
      JOIN (SELECT bucket, p FROM p WHERE lang = 'es') b
        ON b.bucket = a.bucket)
    SELECT CAST({_FH_DIM} AS BIGINT) AS n_buckets,
           CAST(sum(d_micro * l_micro) AS BIGINT) AS psi_pico
    FROM w
    """,
    doc="Population-stability-index drift detection between two corpus "
    "slices (the production-ML monitoring staple: PSI < 0.1 stable, "
    "> 0.25 drifted — run between yesterday's and today's training "
    "shard before a model retrain): token distributions over the q195 "
    "64-bucket hash space (add-one smoothed so no bucket is empty), "
    "PSI = Σ (p−q)·ln(p/q). Exactness by the q186/q100 micro-nat "
    "discipline, factor by factor: p and q are single divisions of "
    "exact int64 (identical doubles), the difference and the ratio "
    "are exact-operand IEEE ops, and BOTH factors are quantized to "
    "integer micro-units BEFORE the product-sum — so the reported "
    "PSI (in 1e-12 units) is an exact integer sum and the only "
    "cross-engine exposure is a 1-ulp libm ln landing exactly on a "
    "round() boundary (~1e-10/bucket). One hash agg per slice over a "
    "constant 64-bucket grid — the comparison itself costs nothing "
    "at any corpus size.",
    tags=("llm", "text", "drift", "psi", "monitoring", "agg", "scale"),
)
def q203_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents").filter(
        F.col("lang").isin("en", "es")
    ).select("lang", F.explode(tokens("text")).alias("tk"))
    h = d.select(
        "lang",
        (
            F.conv(F.substring(F.md5("tk"), 1, 15), 16, 10).cast("long")
            % _FH_DIM
        ).alias("bucket"),
    )
    grid = (
        spark.createDataFrame([("en",), ("es",)], "lang string")
        .crossJoin(
            spark.range(_FH_DIM).select(F.col("id").alias("bucket"))
        )
    )
    # add-one smoothing over the full (lang, bucket) grid so no bucket
    # is empty and ln never sees 0
    c = (
        h.groupBy("lang", "bucket")
        .agg(F.count("*").alias("n"))
        .join(grid, ["lang", "bucket"], "right")
        .select(
            "lang",
            "bucket",
            (F.coalesce("n", F.lit(0)) + 1).cast("long").alias("c1"),
        )
    )
    tot = c.groupBy("lang").agg(F.sum("c1").cast("long").alias("t"))
    p = c.join(tot, "lang").select(
        "lang", "bucket", (F.col("c1").cast("double") / F.col("t")).alias("p")
    )
    a = p.filter("lang = 'en'").select("bucket", F.col("p").alias("pa"))
    b = p.filter("lang = 'es'").select("bucket", F.col("p").alias("pb"))
    w = a.join(b, "bucket").select(
        F.round((F.col("pa") - F.col("pb")) * 1000000.0)
        .cast("long")
        .alias("d_micro"),
        F.round(F.log(F.col("pa") / F.col("pb")) * 1000000.0)
        .cast("long")
        .alias("l_micro"),
    )
    return w.agg(
        F.lit(_FH_DIM).cast("long").alias("n_buckets"),
        F.sum(F.col("d_micro") * F.col("l_micro"))
        .cast("long")
        .alias("psi_pico"),
    )


# --- q210: two-pass exact heavy hitters ------------------------------------

_HH_K = 5000  # report grams with count > N/K; MG slots per partition = K


@register(
    "q210_heavy_hitters",
    oracle="""
    WITH t0 AS (
      SELECT list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                         t -> t <> '') AS tk
      FROM documents),
    tk AS (
      SELECT unnest(list_transform(range(1, len(tk) - 1),
                    i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])) AS gram
      FROM t0),
    tot AS (SELECT CAST(count(*) AS BIGINT) AS n_total FROM tk),
    c AS (SELECT gram, CAST(count(*) AS BIGINT) AS cnt FROM tk GROUP BY 1)
    SELECT c.gram, c.cnt, tot.n_total
    FROM c, tot WHERE c.cnt * 5000 > tot.n_total
    """,
    doc="TWO-PASS EXACT HEAVY HITTERS (Misra-Gries candidates + exact "
    "verify) over corpus 3-grams: every gram with count > N/5000 (>0.02% "
    "of the token-trigram mass), with its EXACT count. Pass 1 runs a "
    "k=5000-slot Misra-Gries summary PER PARTITION inside one "
    "mapInPandas (pandas value_counts per Arrow batch merged into the "
    "running summary; the batched decrement subtracts the (size-k)-th "
    "smallest counter from all and drops non-positives, the standard "
    "many-single-decrements equivalence) and emits only surviving keys "
    "plus ONE totals row per partition carrying its row count -- "
    "map-side only, state bounded by k entries between batches "
    "(k + batch-distinct transiently). The union over partitions is a PROVABLE "
    "superset of the global heavy hitters: count > N/K implies some "
    "partition has count_p > n_p/K (pigeonhole), and MG with k=K slots "
    "keeps any such item since its estimate >= count_p - n_p/(k+1) > 0. "
    "Pass 2 broadcast-semi-joins the candidate set (<= #partitions * k "
    "keys) and exact-counts ONLY those, so the big shuffle a plain "
    "groupBy-all-grams would pay (16k distinct at sf0.01, billions at "
    "100 TB) shrinks to the candidate slice; the final filter against "
    "the global N makes the output deterministic and "
    "partitioning-independent. The global N is the SUM of the "
    "per-partition totals rows the MG pass emits, and the tiny summary "
    "relation (<= partitions*(k+1) rows) is eagerly localCheckpointed "
    "so candidates and N are both read from it -- the corpus is "
    "tokenized exactly TWICE (MG pass, exact-count join), not three "
    "times (round-8 verdict #3). The oracle is the plain exact "
    "HAVING-count query. At the test SFs the per-partition distinct "
    "count never reaches k, so eviction is a no-op (the output is "
    "identical either way -- the guarantee is what the unit test "
    "forces with a tiny k); at scale the summary stays k entries while "
    "the plain plan's hash agg grows with the vocabulary.",
    tags=("llm", "text", "sketch", "heavy-hitters", "two-pass", "scale"),
)
def q210_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from columnarmodeling_spark.operators.heavy_hitters import mg_summary

    grams = (
        t(spark, sf_dir, "documents")
        .select(tokens("text").alias("tk"))
        .select(F.explode(word_shingles("tk", 3)).alias("gram"))
    )
    # one corpus scan yields BOTH the candidate superset and the global
    # N (per-partition totals rows); the summary is <= partitions*(k+1)
    # rows, so the eager localCheckpoint that lets two consumers read it
    # without recomputing the scan is O(candidates), not O(corpus)
    summary = mg_summary(grams, "gram", _HH_K).localCheckpoint(eager=True)
    cand = summary.filter(F.col("n_p").isNull()).select("gram").distinct()
    tot = summary.agg(F.sum("n_p").cast("long").alias("n_total"))
    exact = (
        grams.join(F.broadcast(cand), "gram")
        .groupBy("gram")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    return (
        exact.crossJoin(F.broadcast(tot))
        .filter(F.col("cnt") * _HH_K > F.col("n_total"))
        .select("gram", "cnt", "n_total")
    )


# --- q213: winnowing fingerprints (MOSS-style local fingerprinting) --------

_WIN_K = 5   # tokens per gram
_WIN_W = 4   # winnow window (grams per window)


@register(
    "q213_winnowing",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, list_filter(regexp_split_to_array(lower(text),
             '[^a-z0-9]+'), t -> t <> '') AS tk
      FROM documents),
    g AS (
      SELECT doc_id, i - 1 AS pos,
             CAST(('0x' || substr(md5(tk[i] || ' ' || tk[i+1] || ' ' ||
                   tk[i+2] || ' ' || tk[i+3] || ' ' || tk[i+4]), 1, 15))
                  AS BIGINT) AS h
      FROM toks,
           LATERAL unnest(generate_series(1, greatest(0, len(tk) - {_WIN_K - 1})))
             t(i)),
    w AS (
      SELECT doc_id, pos AS p, wmin FROM (
        SELECT doc_id, pos,
               min(h) OVER (PARTITION BY doc_id ORDER BY pos
                 ROWS BETWEEN {_WIN_W - 1} PRECEDING AND CURRENT ROW) AS wmin
        FROM g)
      WHERE pos >= {_WIN_W - 1}),
    sel AS (
      SELECT w.doc_id, w.p, w.wmin AS h, max(g.pos) AS sel_pos
      FROM w JOIN g ON g.doc_id = w.doc_id AND g.h = w.wmin
                    AND g.pos BETWEEN w.p - {_WIN_W - 1} AND w.p
      GROUP BY 1, 2, 3),
    fp AS (SELECT DISTINCT doc_id, sel_pos, h FROM sel),
    nd AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_grams
           FROM g GROUP BY 1)
    SELECT nd.doc_id, nd.n_grams,
           CAST(count(fp.sel_pos) AS BIGINT) AS n_fps,
           CAST(coalesce(sum(fp.h % 1000003), 0) AS BIGINT) AS fp_checksum
    FROM nd LEFT JOIN fp ON nd.doc_id = fp.doc_id
    GROUP BY 1, 2
    """,
    doc="WINNOWING document fingerprints (Schleimer/Wilkerson/Aiken "
    "2003 — the MOSS algorithm; the local fingerprinting scheme real "
    "plagiarism/near-dup pipelines use when positional evidence "
    "matters): hash every 5-token gram, slide a window of 4 "
    "consecutive gram hashes per document, and select each window's "
    "minimum (rightmost occurrence on ties — the relational argmax "
    "below), guaranteeing any shared run of >= w+k-1 tokens between "
    "two documents shares at least one selected fingerprint while "
    "keeping ~2/(w+1) of the grams. Plan shape: one scan -> "
    "posexplode -> a doc-keyed trailing-window min (state = w hashes "
    "per doc partition), then the rightmost-min resolution as an "
    "equi-join on (doc, hash) with a +-w position band (fan-out "
    "structurally <= w) and a distinct. Per-doc output: gram count, "
    "selected-fingerprint count, and a mod-1000003 checksum so the "
    "full selection is value-pinned without shipping every "
    "fingerprint row. Docs shorter than k tokens have no grams and "
    "are absent; docs with < w+k-1 tokens have no complete window "
    "and report 0 fingerprints (both engines). At 100 TB the state "
    "is the window, the join fan-out is <= w, and the fingerprint "
    "relation is a ~1/(w+1) sample of gram volume — strictly "
    "sub-linear downstream work, the same reason MOSS scales.",
    tags=("llm", "text", "dedup", "fingerprint", "window", "scale"),
)
def q213_winnowing(spark: SparkSession, sf_dir: str) -> DataFrame:
    from columnarmodeling_spark.functions.text import hex_hash
    from columnarmodeling_spark.operators.fingerprints import (
        winnow_selected,
    )

    d = t(spark, sf_dir, "documents").select(
        "doc_id", tokens("text").alias("tk")
    )
    g = (
        d.select("doc_id", F.posexplode(word_shingles("tk", _WIN_K)))
        .withColumnRenamed("col", "gram")
        .select("doc_id", "pos", hex_hash("gram").alias("h"))
        # deliberately NOT checkpointed despite three consumers: this is
        # a pure narrow pipeline (no shuffle to save — contrast q239's
        # distinct-bearing shingle relation), and pinning the 64x gram
        # relation in the unified pool starved the window sort of
        # execution memory (measured at 64x: ~64s recomputing vs
        # 55-335s highly variable with a checkpoint)
    )
    fp = winnow_selected(g, _WIN_W)
    nd = g.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_grams")
    )
    return (
        nd.join(fp, "doc_id", "left")
        .groupBy("doc_id", "n_grams")
        .agg(
            F.count("sel_pos").cast("long").alias("n_fps"),
            F.coalesce(F.sum(F.col("h") % 1000003), F.lit(0))
            .cast("long")
            .alias("fp_checksum"),
        )
    )


# --- q215: tokenizer fertility / compression stats -------------------------


@register(
    "q215_tokenizer_fertility",
    oracle="""
    WITH d AS (
      SELECT lang,
             CAST(len(list_filter(regexp_split_to_array(lower(text),
                  '[^a-z0-9]+'), t -> t <> '')) AS BIGINT) AS n_tok,
             CAST(length(text) AS BIGINT) AS n_chars,
             CAST(strlen(text) AS BIGINT) AS n_bytes
      FROM documents),
    a AS (
      SELECT lang,
             CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(n_tok) AS BIGINT) AS n_tokens,
             CAST(sum(n_chars) AS BIGINT) AS n_chars,
             CAST(sum(n_bytes) AS BIGINT) AS n_bytes
      FROM d GROUP BY 1)
    SELECT lang, n_docs, n_tokens, n_chars, n_bytes,
           CAST(round(1000.0 * n_chars / n_tokens) AS BIGINT)
             AS chars_per_tok_milli,
           CAST(round(1000.0 * n_bytes / n_tokens) AS BIGINT)
             AS bytes_per_tok_milli,
           CAST(round(1000.0 * n_tokens / n_docs) AS BIGINT)
             AS toks_per_doc_milli
    FROM a
    """,
    doc="TOKENIZER FERTILITY stats per language — the byte/char/token "
    "compression ratios every training-data pipeline tracks when "
    "sizing a tokenizer and a data mix (fertility = units consumed "
    "per token emitted; multi-byte scripts and tokenizer mismatch "
    "show up here first). One scan, one hash agg keyed by lang: doc "
    "count, total whitespace-regex tokens, total characters "
    "(codepoints, Spark length == DuckDB length), total bytes (Spark "
    "octet_length == DuckDB strlen — UTF-8 octets, verified on "
    "multi-byte input), then milli-unit ratios computed as ONE "
    "int64->double division each and rounded (exact-operand IEEE op, "
    "bit-identical cross-engine per the repo's exactness discipline). "
    "Constant agg state per lang; trivially scale-safe.",
    tags=("llm", "text", "stats", "agg", "scale"),
)
def q215_tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents").select(
        "lang",
        F.size(tokens("text")).cast("long").alias("n_tok"),
        F.length("text").cast("long").alias("n_chars"),
        F.octet_length("text").cast("long").alias("n_bytes"),
    )
    a = d.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_tok").cast("long").alias("n_tokens"),
        F.sum("n_chars").cast("long").alias("n_chars"),
        F.sum("n_bytes").cast("long").alias("n_bytes"),
    )
    return a.select(
        "lang",
        "n_docs",
        "n_tokens",
        "n_chars",
        "n_bytes",
        F.round(F.lit(1000.0) * F.col("n_chars") / F.col("n_tokens"))
        .cast("long")
        .alias("chars_per_tok_milli"),
        F.round(F.lit(1000.0) * F.col("n_bytes") / F.col("n_tokens"))
        .cast("long")
        .alias("bytes_per_tok_milli"),
        F.round(F.lit(1000.0) * F.col("n_tokens") / F.col("n_docs"))
        .cast("long")
        .alias("toks_per_doc_milli"),
    )


# --- q220: lang-id confusion matrix + macro-F1 -----------------------------


@register(
    "q220_langid_confusion",
    oracle="""
    WITH toks AS (
      SELECT doc_id, lang,
             list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                         t -> t <> '') AS tk
      FROM documents),
    sc AS (
      SELECT doc_id, lang,
             len(list_filter(tk, x -> list_contains(['the','and','of','row','table'], x))) AS s_en,
             len(list_filter(tk, x -> list_contains(['el','la','de','fila','tabla'], x))) AS s_es,
             len(list_filter(tk, x -> list_contains(['zh','biao','hang','lie','shuju'], x))) AS s_zh
      FROM toks),
    pred AS (
      SELECT lang AS lang_actual,
             CASE WHEN s_en >= s_es AND s_en >= s_zh THEN 'en'
                  WHEN s_es >= s_zh THEN 'es'
                  ELSE 'zh' END AS lang_guess
      FROM sc),
    cls AS (SELECT unnest(['en', 'es', 'zh']) AS c),
    st AS (
      SELECT cls.c,
             CAST(sum(CASE WHEN lang_actual = cls.c
                            AND lang_guess = cls.c THEN 1 ELSE 0 END)
                  AS BIGINT) AS tp,
             CAST(sum(CASE WHEN lang_guess = cls.c
                            AND lang_actual <> cls.c THEN 1 ELSE 0 END)
                  AS BIGINT) AS fp,
             CAST(sum(CASE WHEN lang_actual = cls.c
                            AND lang_guess <> cls.c THEN 1 ELSE 0 END)
                  AS BIGINT) AS fn
      FROM pred CROSS JOIN cls GROUP BY 1),
    st2 AS (
      SELECT c, tp, fp, fn,
             CASE WHEN tp + fp > 0
                  THEN CAST(round(1000.0 * tp / (tp + fp)) AS BIGINT)
                  ELSE NULL END AS precision_milli,
             CASE WHEN tp + fn > 0
                  THEN CAST(round(1000.0 * tp / (tp + fn)) AS BIGINT)
                  ELSE NULL END AS recall_milli,
             CASE WHEN 2 * tp + fp + fn > 0
                  THEN CAST(round(2000.0 * tp / (2 * tp + fp + fn))
                       AS BIGINT)
                  ELSE NULL END AS f1_milli
      FROM st)
    SELECT c, tp, fp, fn, precision_milli, recall_milli, f1_milli
    FROM st2
    UNION ALL
    SELECT 'macro', CAST(sum(tp) AS BIGINT), CAST(sum(fp) AS BIGINT),
           CAST(sum(fn) AS BIGINT), NULL, NULL,
           CAST(round(sum(f1_milli) / 3.0) AS BIGINT)
    FROM st2
    """,
    doc="LANG-ID CONFUSION MATRIX + macro-F1 — the classifier EVAL "
    "the q52 heuristic was missing (a pipeline that routes documents "
    "by predicted language needs to know per-class precision/recall "
    "against labeled data before trusting the router; macro-F1 is "
    "the balance-insensitive summary). Re-runs q52's exact "
    "marker-token argmax (same tie-break), cross-joins the 3-row "
    "class table, and reduces to per-class TP/FP/FN in one hash agg "
    "— docs labeled with languages outside the classifier's range "
    "count toward FP of whatever was predicted, the honest "
    "open-set accounting. F1 uses the division-stable 2TP/(2TP+FP+"
    "FN) form, one rounded division per cell (exact-operand "
    "discipline); the macro row averages the three integer "
    "per-class F1s. Scale: the matrix is 3 rows at any corpus "
    "size; the only corpus-sized work is q52's token scan.",
    tags=("llm", "text", "langid", "eval", "agg", "scale"),
)
def q220_langid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    pred = q52_lang_id(spark, sf_dir).select("lang_actual", "lang_guess")
    cls = spark.createDataFrame(
        [("en",), ("es",), ("zh",)], "c string"
    )
    st = (
        pred.crossJoin(F.broadcast(cls))
        .groupBy("c")
        .agg(
            F.sum(
                (
                    (F.col("lang_actual") == F.col("c"))
                    & (F.col("lang_guess") == F.col("c"))
                ).cast("long")
            )
            .cast("long")
            .alias("tp"),
            F.sum(
                (
                    (F.col("lang_guess") == F.col("c"))
                    & (F.col("lang_actual") != F.col("c"))
                ).cast("long")
            )
            .cast("long")
            .alias("fp"),
            F.sum(
                (
                    (F.col("lang_actual") == F.col("c"))
                    & (F.col("lang_guess") != F.col("c"))
                ).cast("long")
            )
            .cast("long")
            .alias("fn"),
        )
    )
    st2 = st.select(
        "c",
        "tp",
        "fp",
        "fn",
        F.when(
            F.col("tp") + F.col("fp") > 0,
            F.round(
                F.lit(1000.0) * F.col("tp") / (F.col("tp") + F.col("fp"))
            ).cast("long"),
        ).alias("precision_milli"),
        F.when(
            F.col("tp") + F.col("fn") > 0,
            F.round(
                F.lit(1000.0) * F.col("tp") / (F.col("tp") + F.col("fn"))
            ).cast("long"),
        ).alias("recall_milli"),
        F.when(
            2 * F.col("tp") + F.col("fp") + F.col("fn") > 0,
            F.round(
                F.lit(2000.0)
                * F.col("tp")
                / (2 * F.col("tp") + F.col("fp") + F.col("fn"))
            ).cast("long"),
        ).alias("f1_milli"),
    )
    macro = st2.agg(
        F.lit("macro").alias("c"),
        F.sum("tp").cast("long").alias("tp"),
        F.sum("fp").cast("long").alias("fp"),
        F.sum("fn").cast("long").alias("fn"),
        F.lit(None).cast("long").alias("precision_milli"),
        F.lit(None).cast("long").alias("recall_milli"),
        F.round(F.sum("f1_milli") / F.lit(3.0))
        .cast("long")
        .alias("f1_milli"),
    )
    return st2.unionByName(macro)


# --- q221: Zipf rank-frequency fit -----------------------------------------

_ZIPF_TOP = 1000  # fit over the top-N ranks (standard practice)


@register(
    "q221_token_zipf",
    oracle=f"""
    WITH tk AS (
      SELECT unnest(list_filter(regexp_split_to_array(lower(text),
             '[^a-z0-9]+'), t -> t <> '')) AS tok
      FROM documents),
    tf AS (
      SELECT tok, CAST(count(*) AS BIGINT) AS cnt FROM tk GROUP BY 1),
    rk AS (
      SELECT tok, cnt,
             row_number() OVER (ORDER BY cnt DESC, tok) AS rnk
      FROM tf),
    q AS (
      SELECT CAST(round(1000000.0 * ln(CAST(rnk AS DOUBLE))) AS BIGINT)
               AS xq,
             CAST(round(1000000.0 * ln(CAST(cnt AS DOUBLE))) AS BIGINT)
               AS yq
      FROM rk WHERE rnk <= {_ZIPF_TOP}),
    s AS (
      SELECT CAST(count(*) AS BIGINT) AS n_fit,
             CAST(sum(xq) AS BIGINT) AS sx,
             CAST(sum(yq) AS BIGINT) AS sy,
             CAST(sum(xq * yq) AS BIGINT) AS sxy,
             CAST(sum(xq * xq) AS BIGINT) AS sxx
      FROM q),
    v AS (SELECT CAST(count(*) AS BIGINT) AS n_vocab FROM tf)
    SELECT v.n_vocab, s.n_fit,
           CAST(round(1000000.0
             * ((CAST(s.n_fit AS DOUBLE) * s.sxy
                 - CAST(s.sx AS DOUBLE) * s.sy)
                / (CAST(s.n_fit AS DOUBLE) * s.sxx
                   - CAST(s.sx AS DOUBLE) * s.sx)))
             AS BIGINT) AS slope_micro,
           CAST(round(
             (CAST(s.sy AS DOUBLE)
              - ((CAST(s.n_fit AS DOUBLE) * s.sxy
                  - CAST(s.sx AS DOUBLE) * s.sy)
                 / (CAST(s.n_fit AS DOUBLE) * s.sxx
                    - CAST(s.sx AS DOUBLE) * s.sx))
                * s.sx) / s.n_fit) AS BIGINT) AS intercept_micro
    FROM s, v
    """,
    doc="ZIPF RANK-FREQUENCY FIT — the corpus-health diagnostic "
    "(natural text sits near slope -1 on log rank vs log frequency; "
    "templated/synthetic/boilerplate corpora bend it, so the slope "
    "is a standing data-quality monitor next to q186's degree "
    "power law): token frequencies, a deterministic global rank "
    "(count desc, token asc tie-break — with_global_index's "
    "two-pass range partition on the Spark side, never a "
    "single-task window), and an OLS fit over the top-1000 "
    "(rank, count) points in log-log space. Cross-engine exactness: "
    "ln values are quantized to integer micro-units BEFORE the OLS "
    "sums (the q203 ln discipline — sums of int64 are "
    "association-free), and the slope/intercept are single "
    "divisions of those exact sums. Scale: the fit relation is "
    "1000 rows at any corpus; the vocabulary agg is map-side "
    "combinable; the rank pass range-partitions.",
    tags=("llm", "text", "stats", "zipf", "scale"),
)
def q221_token_zipf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from columnarmodeling_spark.operators.indexing import with_global_index

    tf = (
        t(spark, sf_dir, "documents")
        .select(F.explode(tokens("text")).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    rk = with_global_index(
        tf.withColumn("neg_cnt", -F.col("cnt")),
        ["neg_cnt", "tok"],
        index_col="rnk",
    )
    q = rk.filter(F.col("rnk") <= _ZIPF_TOP).select(
        F.round(F.lit(1000000.0) * F.log(F.col("rnk").cast("double")))
        .cast("long")
        .alias("xq"),
        F.round(F.lit(1000000.0) * F.log(F.col("cnt").cast("double")))
        .cast("long")
        .alias("yq"),
    )
    s = q.agg(
        F.count(F.lit(1)).cast("long").alias("n_fit"),
        F.sum("xq").cast("long").alias("sx"),
        F.sum("yq").cast("long").alias("sy"),
        F.sum(F.col("xq") * F.col("yq")).cast("long").alias("sxy"),
        F.sum(F.col("xq") * F.col("xq")).cast("long").alias("sxx"),
    )
    v = tf.agg(F.count(F.lit(1)).cast("long").alias("n_vocab"))
    # combine in DOUBLE: at real-corpus scale n_fit*sxy overflows
    # int64 (~2e20 for a 100 TB corpus); identical-operand FP ops stay
    # bit-identical cross-engine, and the slope is micro-quantized
    num = (
        F.col("n_fit").cast("double") * F.col("sxy")
        - F.col("sx").cast("double") * F.col("sy")
    )
    den = (
        F.col("n_fit").cast("double") * F.col("sxx")
        - F.col("sx").cast("double") * F.col("sx")
    )
    slope = num / den
    return s.crossJoin(F.broadcast(v)).select(
        "n_vocab",
        "n_fit",
        F.round(F.lit(1000000.0) * slope).cast("long").alias(
            "slope_micro"
        ),
        F.round(
            (F.col("sy").cast("double") - slope * F.col("sx"))
            / F.col("n_fit")
        )
        .cast("long")
        .alias("intercept_micro"),
    )


# --- q226: quality filter funnel report ------------------------------------

_FUNNEL_MIN_TOK = 30
_FUNNEL_MIN_STOP_MILLI = 100   # stopword ratio >= 0.10
_FUNNEL_MAX_REP_MILLI = 150    # max token freq / n_tok <= 0.15


@register(
    "q226_filter_funnel",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id,
             list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                         t -> t <> '') AS tk
      FROM documents),
    tf AS (
      SELECT doc_id, w, count(*) AS c
      FROM (SELECT doc_id, unnest(tk) AS w FROM toks)
      GROUP BY 1, 2),
    m AS (
      SELECT t.doc_id,
             CAST(len(t.tk) AS BIGINT) AS n_tok,
             CAST(len(list_filter(t.tk,
                 x -> list_contains({_STOPWORDS!r}, x))) AS BIGINT)
               AS n_stop,
             mx.mx AS max_tf
      FROM toks t
      JOIN (SELECT doc_id, CAST(max(c) AS BIGINT) AS mx
            FROM tf GROUP BY 1) mx
        ON t.doc_id = mx.doc_id
      WHERE len(t.tk) > 0),
    flags AS (
      SELECT doc_id,
             CASE WHEN n_tok < {_FUNNEL_MIN_TOK} THEN 1 ELSE 0 END AS f1,
             CASE WHEN 1000 * n_stop < {_FUNNEL_MIN_STOP_MILLI} * n_tok
                  THEN 1 ELSE 0 END AS f2,
             CASE WHEN 1000 * max_tf > {_FUNNEL_MAX_REP_MILLI} * n_tok
                  THEN 1 ELSE 0 END AS f3
      FROM m),
    stages AS (
      SELECT 1 AS stage, 'min_length' AS rule,
             CAST(sum(f1) AS BIGINT) AS n_dropped,
             CAST(sum(1 - f1) AS BIGINT) AS n_surviving
      FROM flags
      UNION ALL
      SELECT 2, 'stopword_floor',
             CAST(sum(CASE WHEN f1 = 0 AND f2 = 1 THEN 1 ELSE 0 END)
                  AS BIGINT),
             CAST(sum(CASE WHEN f1 = 0 AND f2 = 0 THEN 1 ELSE 0 END)
                  AS BIGINT)
      FROM flags
      UNION ALL
      SELECT 3, 'repetition_cap',
             CAST(sum(CASE WHEN f1 = 0 AND f2 = 0 AND f3 = 1
                      THEN 1 ELSE 0 END) AS BIGINT),
             CAST(sum(CASE WHEN f1 = 0 AND f2 = 0 AND f3 = 0
                      THEN 1 ELSE 0 END) AS BIGINT)
      FROM flags)
    SELECT stage, rule, n_dropped, n_surviving
    FROM stages
    """,
    doc="QUALITY FILTER FUNNEL report — the pipeline-ops view the "
    "per-doc rules (q51/q54) don't give: apply the standard gates in "
    "their production order (minimum length, stopword-ratio floor, "
    "repetition cap — the Gopher/C4 rule family) and report, per "
    "stage, how many documents the stage drops and how many survive "
    "it cumulatively. This is the report a data curator reads to see "
    "WHICH rule is doing the work and whether a rule change starves "
    "the corpus. All thresholds compare in cross-multiplied integer "
    "arithmetic (1000*n_stop < 100*n_tok), no division anywhere; the "
    "per-doc max token frequency comes from one (doc, token) hash "
    "agg + a doc-keyed max. Output is 3 rows at any corpus size.",
    tags=("llm", "text", "quality", "pipeline", "agg", "scale"),
)
def q226_filter_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = (
        t(spark, sf_dir, "documents")
        .withColumn("tk", tokens("text"))
        .filter(F.size("tk") > 0)
    )
    stop_arr = F.array(*[F.lit(s) for s in _STOPWORDS])
    tf = (
        d.select("doc_id", F.explode("tk").alias("w"))
        .groupBy("doc_id", "w")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id")
        .agg(F.max("c").cast("long").alias("max_tf"))
    )
    m = d.select(
        "doc_id",
        F.size("tk").cast("long").alias("n_tok"),
        F.size(F.filter("tk", lambda x: F.array_contains(stop_arr, x)))
        .cast("long")
        .alias("n_stop"),
    ).join(tf, "doc_id")
    flags = m.select(
        (F.col("n_tok") < _FUNNEL_MIN_TOK).cast("long").alias("f1"),
        (
            1000 * F.col("n_stop")
            < F.lit(_FUNNEL_MIN_STOP_MILLI) * F.col("n_tok")
        )
        .cast("long")
        .alias("f2"),
        (
            1000 * F.col("max_tf")
            > F.lit(_FUNNEL_MAX_REP_MILLI) * F.col("n_tok")
        )
        .cast("long")
        .alias("f3"),
    )
    s1 = flags.agg(
        F.lit(1).cast("int").alias("stage"),
        F.lit("min_length").alias("rule"),
        F.sum("f1").cast("long").alias("n_dropped"),
        F.sum(1 - F.col("f1")).cast("long").alias("n_surviving"),
    )
    s2 = flags.agg(
        F.lit(2).cast("int").alias("stage"),
        F.lit("stopword_floor").alias("rule"),
        F.sum(((F.col("f1") == 0) & (F.col("f2") == 1)).cast("long"))
        .cast("long")
        .alias("n_dropped"),
        F.sum(((F.col("f1") == 0) & (F.col("f2") == 0)).cast("long"))
        .cast("long")
        .alias("n_surviving"),
    )
    s3 = flags.agg(
        F.lit(3).cast("int").alias("stage"),
        F.lit("repetition_cap").alias("rule"),
        F.sum(
            (
                (F.col("f1") == 0)
                & (F.col("f2") == 0)
                & (F.col("f3") == 1)
            ).cast("long")
        )
        .cast("long")
        .alias("n_dropped"),
        F.sum(
            (
                (F.col("f1") == 0)
                & (F.col("f2") == 0)
                & (F.col("f3") == 0)
            ).cast("long")
        )
        .cast("long")
        .alias("n_surviving"),
    )
    return s1.unionByName(s2).unionByName(s3)


# --- q230: token-frequency Gini coefficient per language -------------------


@register(
    "q230_token_gini",
    oracle="""
    WITH tk AS (
      SELECT lang,
             unnest(list_filter(regexp_split_to_array(lower(text),
                    '[^a-z0-9]+'), t -> t <> '')) AS tok
      FROM documents),
    tf AS (
      SELECT lang, tok, CAST(count(*) AS BIGINT) AS cnt
      FROM tk GROUP BY 1, 2),
    rk AS (
      SELECT lang, cnt,
             CAST(row_number() OVER (PARTITION BY lang
               ORDER BY cnt, tok) AS BIGINT) AS i
      FROM tf),
    s AS (
      SELECT lang,
             CAST(count(*) AS BIGINT) AS n_vocab,
             CAST(sum(cnt) AS BIGINT) AS n_tokens,
             CAST(sum(i * cnt) AS BIGINT) AS si
      FROM rk GROUP BY 1)
    SELECT lang, n_vocab, n_tokens,
           CAST(round(1000000.0
             * ((2.0 * CAST(si AS DOUBLE)
                 - (CAST(n_vocab AS DOUBLE) + 1.0) * n_tokens)
                / (CAST(n_vocab AS DOUBLE) * n_tokens)))
             AS BIGINT) AS gini_micro
    FROM s ORDER BY lang
    """,
    doc="TOKEN-FREQUENCY GINI per language — the vocabulary-"
    "concentration diagnostic that pairs with q221's Zipf slope: a "
    "Gini near 1 means a few tokens dominate (templated/boilerplate "
    "corpus slice), near 0 means a flat, unnatural distribution; "
    "per-language trend lines are a standing data-mix health "
    "monitor. Exact integer core: frequencies rank ascending per "
    "language with a deterministic (cnt, tok) tie-break, and the "
    "Lorenz sum S_i = sum(i*cnt) is exact int64, so Gini = "
    "(2*S_i - (n+1)*S) / (n*S) has an integer-exact numerator and "
    "denominator combined in DOUBLE only at the end (n*S overflows "
    "int64 at web-corpus scale; identical-operand FP is "
    "bit-identical cross-engine, q221 discipline). Scale: the "
    "window partitions by language over the VOCABULARY relation "
    "(bounded, not the token stream); the frequency agg is "
    "map-side combinable.",
    tags=("llm", "text", "stats", "quality", "window", "scale"),
)
def q230_token_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    tf = (
        t(spark, sf_dir, "documents")
        .select("lang", F.explode(tokens("text")).alias("tok"))
        .groupBy("lang", "tok")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    rk = tf.select(
        "lang",
        "cnt",
        F.row_number()
        .over(W.partitionBy("lang").orderBy("cnt", "tok"))
        .cast("long")
        .alias("i"),
    )
    s = rk.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_vocab"),
        F.sum("cnt").cast("long").alias("n_tokens"),
        F.sum(F.col("i") * F.col("cnt")).cast("long").alias("si"),
    )
    gini = (
        F.lit(2.0) * F.col("si").cast("double")
        - (F.col("n_vocab").cast("double") + F.lit(1.0))
        * F.col("n_tokens")
    ) / (F.col("n_vocab").cast("double") * F.col("n_tokens"))
    return s.select(
        "lang",
        "n_vocab",
        "n_tokens",
        F.round(F.lit(1000000.0) * gini).cast("long").alias(
            "gini_micro"
        ),
    ).orderBy("lang")


# --- q231: repeated-token run-length filter (gap-and-island) ---------------

_RUN_FLAG_MIN = 3


@register(
    "q231_repetition_runs",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id,
             list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                         t -> t <> '') AS tk
      FROM documents),
    pos AS (
      SELECT doc_id, i, tk[i] AS tok
      FROM toks CROSS JOIN LATERAL (
        SELECT unnest(range(1, len(tk) + 1)) AS i) idx
      WHERE len(tk) > 0),
    isl AS (
      SELECT doc_id, tok,
             i - row_number() OVER (PARTITION BY doc_id, tok ORDER BY i)
               AS island
      FROM pos),
    runs AS (
      SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS run_len
      FROM isl GROUP BY doc_id, tok, island),
    best AS (
      SELECT doc_id, tok AS run_tok, run_len,
             row_number() OVER (PARTITION BY doc_id
               ORDER BY run_len DESC, tok) AS rn
      FROM runs),
    n AS (
      SELECT doc_id, CAST(len(tk) AS BIGINT) AS n_tok FROM toks)
    SELECT n.doc_id, n.n_tok, b.run_len AS max_run, b.run_tok,
           CAST(CASE WHEN b.run_len >= {_RUN_FLAG_MIN} THEN 1 ELSE 0 END
                AS BIGINT) AS flag_repetitive
    FROM n JOIN best b ON b.doc_id = n.doc_id AND b.rn = 1
    """,
    doc="REPEATED-TOKEN RUN FILTER — the repetition screen every "
    "pretraining pipeline runs (degenerate generations and scraped "
    "boilerplate show long runs of one token; C4/Gopher-style rules "
    "drop documents whose max run exceeds a threshold). The classic "
    "gap-and-island trick, per document: position minus "
    "row_number() within (doc, token) is constant exactly on a "
    "consecutive run, so one window plus one count gives every "
    "run's length with no self-join; a per-doc (run_len DESC, tok) "
    "row_number picks the deterministic winner. All integers end to "
    "end — no float discipline needed. Scale: both windows "
    "partition by doc_id (and token) — state never leaves the "
    "document's shuffle partition, the exact shape that survives a "
    "billion-document corpus; the token explode is the same linear "
    "pass every text query pays.",
    tags=("llm", "text", "quality", "window", "island", "scale"),
)
def q231_repetition_runs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    d = t(spark, sf_dir, "documents").select(
        "doc_id", tokens("text").alias("tk")
    )
    pos = d.filter(F.size("tk") > 0).select(
        "doc_id", F.posexplode("tk").alias("i0", "tok")
    ).select("doc_id", (F.col("i0") + 1).alias("i"), "tok")
    isl = pos.select(
        "doc_id",
        "tok",
        (
            F.col("i")
            - F.row_number().over(
                W.partitionBy("doc_id", "tok").orderBy("i")
            )
        ).alias("island"),
    )
    runs = isl.groupBy("doc_id", "tok", "island").agg(
        F.count(F.lit(1)).cast("long").alias("run_len")
    )
    best = runs.select(
        "doc_id",
        F.col("tok").alias("run_tok"),
        "run_len",
        F.row_number()
        .over(
            W.partitionBy("doc_id").orderBy(
                F.col("run_len").desc(), F.col("tok")
            )
        )
        .alias("rn"),
    ).filter(F.col("rn") == 1)
    n = d.filter(F.size("tk") > 0).select(
        "doc_id", F.size("tk").cast("long").alias("n_tok")
    )
    return n.join(best, "doc_id").select(
        "doc_id",
        "n_tok",
        F.col("run_len").alias("max_run"),
        "run_tok",
        (F.col("run_len") >= _RUN_FLAG_MIN)
        .cast("long")
        .alias("flag_repetitive"),
    )


# --- q233: KL divergence of per-source token mix vs corpus -----------------


@register(
    "q233_kl_source_mix",
    oracle="""
    WITH tk AS (
      SELECT source,
             unnest(list_filter(regexp_split_to_array(lower(text),
                    '[^a-z0-9]+'), t -> t <> '')) AS tok
      FROM documents),
    tfs AS (
      SELECT source, tok, CAST(count(*) AS BIGINT) AS cs
      FROM tk GROUP BY 1, 2),
    ns AS (
      SELECT source, CAST(sum(cs) AS BIGINT) AS n_s,
             CAST(count(*) AS BIGINT) AS vocab_s
      FROM tfs GROUP BY 1),
    tfc AS (
      SELECT tok, CAST(sum(cs) AS BIGINT) AS cc FROM tfs GROUP BY 1),
    nc AS (SELECT CAST(sum(cc) AS BIGINT) AS n_c FROM tfc),
    terms AS (
      SELECT s.source,
             CAST(s.cs * CAST(round(1000000.0
               * ln((CAST(s.cs AS DOUBLE) * x.n_c)
                    / (CAST(c.cc AS DOUBLE) * n.n_s))) AS BIGINT)
               AS BIGINT) AS term
      FROM tfs s
      JOIN tfc c ON c.tok = s.tok
      JOIN ns n ON n.source = s.source
      CROSS JOIN nc x)
    SELECT n.source, n.n_s AS n_tokens, n.vocab_s AS n_vocab,
           CAST(round(CAST(sum(t.term) AS DOUBLE) / n.n_s) AS BIGINT)
             AS kl_micro
    FROM terms t JOIN ns n ON n.source = t.source
    GROUP BY n.source, n.n_s, n.vocab_s
    ORDER BY n.source
    """,
    doc="KL DIVERGENCE of each source's token distribution from the "
    "corpus mix — the per-domain drift monitor a data-mix curator "
    "watches (PSI q203 bins a numeric feature; this is the "
    "distribution-over-VOCABULARY counterpart): KL(source||corpus) "
    "= sum p_s ln(p_s/p_c), always finite because every source "
    "token is a corpus token. Exactness: each token's log-ratio "
    "ln((cs*Nc)/(cc*Ns)) is quantized to integer micro-nats BEFORE "
    "the weighted sum (q203 ln discipline), the cs-weighted sum is "
    "exact int64, and one final division lands micro-nats per "
    "token. At the 100 TB tier the micro quantum is rescaled to "
    "milli so cs*lq stays inside int64 — the quantum is a "
    "constant, not a semantics change. Scale: two map-side-"
    "combinable aggs build the mixes; the term join shuffles on "
    "tok over the VOCABULARY relation; N_c rides a one-row "
    "broadcast and n_s a 20-row broadcast.",
    tags=("llm", "text", "stats", "drift", "mix", "scale"),
)
def q233_kl_source_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    tfs = (
        t(spark, sf_dir, "documents")
        .select("source", F.explode(tokens("text")).alias("tok"))
        .groupBy("source", "tok")
        .agg(F.count(F.lit(1)).cast("long").alias("cs"))
    )
    ns = tfs.groupBy("source").agg(
        F.sum("cs").cast("long").alias("n_s"),
        F.count(F.lit(1)).cast("long").alias("vocab_s"),
    )
    tfc = tfs.groupBy("tok").agg(F.sum("cs").cast("long").alias("cc"))
    nc = tfc.agg(F.sum("cc").cast("long").alias("n_c"))
    lq = F.round(
        F.lit(1000000.0)
        * F.log(
            (F.col("cs").cast("double") * F.col("n_c"))
            / (F.col("cc").cast("double") * F.col("n_s"))
        )
    ).cast("long")
    terms = (
        tfs.join(tfc, "tok")
        .join(F.broadcast(ns), "source")
        .crossJoin(F.broadcast(nc))
        .select("source", (F.col("cs") * lq).cast("long").alias("term"))
    )
    return (
        terms.join(F.broadcast(ns), "source")
        .groupBy("source", "n_s", "vocab_s")
        .agg(
            F.round(F.sum("term").cast("double") / F.first("n_s"))
            .cast("long")
            .alias("kl_micro")
        )
        .select(
            "source",
            F.col("n_s").alias("n_tokens"),
            F.col("vocab_s").alias("n_vocab"),
            "kl_micro",
        )
        .orderBy("source")
    )


# --- q235: source-pair vocabulary overlap matrix ---------------------------


@register(
    "q235_source_overlap",
    oracle="""
    WITH vt AS (
      SELECT DISTINCT source,
             unnest(list_filter(regexp_split_to_array(lower(text),
                    '[^a-z0-9]+'), t -> t <> '')) AS tok
      FROM documents),
    sz AS (
      SELECT source, CAST(count(*) AS BIGINT) AS v FROM vt GROUP BY 1),
    inter AS (
      SELECT a.source AS src_a, b.source AS src_b,
             CAST(count(*) AS BIGINT) AS n_inter
      FROM vt a JOIN vt b ON a.tok = b.tok AND a.source < b.source
      GROUP BY 1, 2)
    SELECT i.src_a, i.src_b, sa.v AS v_a, sb.v AS v_b, i.n_inter,
           CAST(round(1000000.0 * i.n_inter
             / (sa.v + sb.v - i.n_inter)) AS BIGINT) AS jaccard_micro
    FROM inter i
    JOIN sz sa ON sa.source = i.src_a
    JOIN sz sb ON sb.source = i.src_b
    ORDER BY i.src_a, i.src_b
    """,
    doc="SOURCE-PAIR VOCABULARY OVERLAP matrix — the corpus-mix "
    "redundancy diagnostic (two crawls of the same domain show "
    "near-1 vocabulary Jaccard long before document-level dedup "
    "fires; a source whose vocabulary is disjoint from everything "
    "is either gold or garbage): distinct (source, token) pairs, "
    "a token-keyed self-join counts every pairwise intersection, "
    "and per-source vocabulary sizes close the Jaccard. All "
    "integers plus one final division. Scale: the self-join runs "
    "over the VOCABULARY relation, not the corpus, and per-token "
    "fan-out is bounded by #sources^2 (a constant — sources are "
    "20ish, not millions); the result is the #sources-choose-2 "
    "matrix, broadcast-size by construction.",
    tags=("llm", "text", "mix", "join", "set", "scale"),
)
def q235_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    vt = (
        t(spark, sf_dir, "documents")
        .select("source", F.explode(tokens("text")).alias("tok"))
        .distinct()
    )
    sz = vt.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("v")
    )
    a = vt.alias("a")
    b = vt.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.tok") == F.col("b.tok"))
            & (F.col("a.source") < F.col("b.source")),
        )
        .groupBy(
            F.col("a.source").alias("src_a"),
            F.col("b.source").alias("src_b"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_inter"))
    )
    sa = F.broadcast(sz.select(F.col("source").alias("src_a"), F.col("v").alias("v_a")))
    sb = F.broadcast(sz.select(F.col("source").alias("src_b"), F.col("v").alias("v_b")))
    return (
        inter.join(sa, "src_a")
        .join(sb, "src_b")
        .select(
            "src_a",
            "src_b",
            "v_a",
            "v_b",
            "n_inter",
            F.round(
                F.lit(1000000.0)
                * F.col("n_inter")
                / (F.col("v_a") + F.col("v_b") - F.col("n_inter"))
            )
            .cast("long")
            .alias("jaccard_micro"),
        )
        .orderBy("src_a", "src_b")
    )


# --- q236: window-k skip-gram co-occurrence + PMI --------------------------

_SKIP_K = 3
_SKIP_MIN_CNT = 50


@register(
    "q236_skipgram_pmi",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id,
             list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                         t -> t <> '') AS tk
      FROM documents),
    pos AS (
      SELECT doc_id, i, tk[i] AS tok, len(tk) AS nt
      FROM toks CROSS JOIN LATERAL (
        SELECT unnest(range(1, len(tk) + 1)) AS i) idx),
    pairs AS (
      SELECT a.doc_id, a.tok AS w1, b.tok AS w2
      FROM (SELECT doc_id, i, tok, nt,
                   unnest(range(i + 1,
                                least(i + {_SKIP_K}, nt) + 1)) AS j
            FROM pos) a
      JOIN pos b ON b.doc_id = a.doc_id AND b.i = a.j),
    pc AS (
      SELECT w1, w2, CAST(count(*) AS BIGINT) AS cnt
      FROM pairs GROUP BY 1, 2),
    tt AS (SELECT CAST(sum(cnt) AS BIGINT) AS t_pairs FROM pc),
    uni AS (
      SELECT tok, CAST(count(*) AS BIGINT) AS c FROM pos GROUP BY 1),
    un AS (SELECT CAST(sum(c) AS BIGINT) AS n_tok FROM uni)
    SELECT p.w1, p.w2, p.cnt,
           CAST(round(1000000.0
             * ln((CAST(p.cnt AS DOUBLE) * u.n_tok * u.n_tok)
                  / (CAST(t.t_pairs AS DOUBLE) * c1.c * c2.c)))
             AS BIGINT) AS pmi_micro
    FROM pc p
    JOIN uni c1 ON c1.tok = p.w1
    JOIN uni c2 ON c2.tok = p.w2
    CROSS JOIN tt t CROSS JOIN un u
    WHERE p.cnt >= {_SKIP_MIN_CNT}
    ORDER BY p.w1, p.w2
    """,
    doc="WINDOW-k SKIP-GRAM co-occurrence + PMI — the word2vec/GloVe "
    "training-pair extraction (q119's PMI reads ADJACENT bigrams; "
    "embedding training wants every ordered pair within a +/-k "
    "window, which changes both the counts and the normalizer): "
    "pairs are generated by an offset EXPLODE (each position emits "
    "its <=k forward offsets) joined back on (doc, position) — an "
    "equi-join with fan-out exactly k, never the per-document "
    "quadratic a doc_id-only join would generate. PMI compares the "
    "pair frequency against the unigram product under the "
    "skip-gram total T; the single ln per surviving pair is "
    "quantized to micro-nats at output. The cnt >= {_SKIP_MIN_CNT} "
    "floor bounds the result to the frequent-pair relation. "
    "Scale: positions and pairs are linear in corpus tokens (x k); "
    "both aggs are map-side combinable; T and N ride one-row "
    "broadcasts and the unigram joins shuffle on the VOCABULARY "
    "relation.",
    tags=("llm", "text", "pmi", "skipgram", "join", "scale"),
)
def q236_skipgram_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents").select(
        "doc_id", tokens("text").alias("tk")
    )
    pos = d.select(
        "doc_id",
        F.size("tk").alias("nt"),
        F.posexplode("tk").alias("i0", "tok"),
    ).select(
        "doc_id", (F.col("i0") + 1).alias("i"), "tok", "nt"
    )
    # filter i < nt first: F.sequence(a, b) with a > b yields a
    # DESCENDING sequence (DuckDB's range yields empty), so the last
    # position must never reach the explode
    offs = pos.filter(F.col("i") < F.col("nt")).select(
        "doc_id",
        F.col("tok").alias("w1"),
        F.explode(
            F.sequence(
                F.col("i") + 1,
                F.least(F.col("i") + _SKIP_K, F.col("nt")),
            )
        ).alias("j"),
    )
    pairs = offs.join(
        pos.select("doc_id", F.col("i").alias("j"), F.col("tok").alias("w2")),
        ["doc_id", "j"],
    )
    pc = pairs.groupBy("w1", "w2").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    tt = pc.agg(F.sum("cnt").cast("long").alias("t_pairs"))
    uni = pos.groupBy("tok").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    un = uni.agg(F.sum("c").cast("long").alias("n_tok"))
    c1 = uni.select(F.col("tok").alias("w1"), F.col("c").alias("c1"))
    c2 = uni.select(F.col("tok").alias("w2"), F.col("c").alias("c2"))
    pmi = F.round(
        F.lit(1000000.0)
        * F.log(
            (
                F.col("cnt").cast("double")
                * F.col("n_tok")
                * F.col("n_tok")
            )
            / (
                F.col("t_pairs").cast("double")
                * F.col("c1")
                * F.col("c2")
            )
        )
    ).cast("long")
    return (
        pc.filter(F.col("cnt") >= _SKIP_MIN_CNT)
        .join(c1, "w1")
        .join(c2, "w2")
        .crossJoin(F.broadcast(tt))
        .crossJoin(F.broadcast(un))
        .select("w1", "w2", "cnt", pmi.alias("pmi_micro"))
        .orderBy("w1", "w2")
    )


# --- q247: pairwise Jensen-Shannon divergence between source mixes ---------

_JSD_TOPV = 400


@register(
    "q247_js_divergence",
    oracle=f"""
    WITH tk AS (
      SELECT source,
             unnest(list_filter(regexp_split_to_array(lower(text),
                    '[^a-z0-9]+'), t -> t <> '')) AS tok
      FROM documents),
    tfs AS (
      SELECT source, tok, CAST(count(*) AS BIGINT) AS cs
      FROM tk GROUP BY 1, 2),
    tfc AS (
      SELECT tok, CAST(sum(cs) AS BIGINT) AS cc FROM tfs GROUP BY 1),
    topv AS (
      SELECT tok FROM (
        SELECT tok, row_number() OVER (ORDER BY cc DESC, tok) AS rk
        FROM tfc) WHERE rk <= {_JSD_TOPV}),
    tfv AS (
      SELECT s.source, s.tok, s.cs
      FROM tfs s JOIN topv v ON v.tok = s.tok),
    ns AS (
      SELECT source, CAST(sum(cs) AS BIGINT) AS n FROM tfv GROUP BY 1),
    mat AS (
      SELECT n.source, v.tok, CAST(coalesce(f.cs, 0) AS BIGINT) AS cs
      FROM ns n CROSS JOIN topv v
      LEFT JOIN tfv f ON f.source = n.source AND f.tok = v.tok),
    pairterm AS (
      SELECT a.source AS src_a, b.source AS src_b,
             CASE WHEN a.cs > 0 THEN a.cs * CAST(round(1000000.0
               * ln(CAST(2 * a.cs * nb.n AS DOUBLE)
                    / CAST(a.cs * nb.n + b.cs * na.n AS DOUBLE)))
               AS BIGINT) ELSE 0 END AS term_a,
             CASE WHEN b.cs > 0 THEN b.cs * CAST(round(1000000.0
               * ln(CAST(2 * b.cs * na.n AS DOUBLE)
                    / CAST(a.cs * nb.n + b.cs * na.n AS DOUBLE)))
               AS BIGINT) ELSE 0 END AS term_b
      FROM mat a
      JOIN mat b ON b.tok = a.tok AND a.source < b.source
      JOIN ns na ON na.source = a.source
      JOIN ns nb ON nb.source = b.source
      WHERE a.cs + b.cs > 0),
    sums AS (
      SELECT src_a, src_b,
             CAST(sum(term_a) AS BIGINT) AS sum_a,
             CAST(sum(term_b) AS BIGINT) AS sum_b
      FROM pairterm GROUP BY 1, 2)
    SELECT s.src_a, s.src_b,
           CAST(round((CAST(s.sum_a AS DOUBLE) / na.n
                     + CAST(s.sum_b AS DOUBLE) / nb.n) / 2.0)
             AS BIGINT) AS jsd_micro
    FROM sums s
    JOIN ns na ON na.source = s.src_a
    JOIN ns nb ON nb.source = s.src_b
    ORDER BY s.src_a, s.src_b
    """,
    doc="PAIRWISE JENSEN-SHANNON DIVERGENCE between source token "
    "mixes over the top-{V} global vocabulary — the symmetric, "
    "always-finite companion to q233's KL-vs-corpus (JSD(a,b) = "
    "(KL(a||m) + KL(b||m))/2, m the even mixture) that a mix "
    "curator reads as a source-distance matrix (q235 compares "
    "vocabulary SETS; this compares the distributions on them). "
    "Conditioning on the deterministic top-V (global count desc, "
    "token asc tie-break) bounds every pair's support; absent "
    "tokens are true zeros contributing 0 by the CASE guard. "
    "Exactness: each log-ratio's operands are exact int64 "
    "products cast once to double, one IEEE division, ln "
    "quantized to micro-nats BEFORE the cs-weighted int64 sum "
    "(q233 discipline); the final two divisions and the half are "
    "single IEEE ops on int64-derived doubles. Scale: the "
    "matrix relation is |sources| x V (metadata-bounded, "
    "broadcastable); the pair join keys on tok over that bounded "
    "relation — K^2 V rows, never corpus-sized; the corpus scan "
    "folds to the (source, tok) agg, map-side combinable.".format(
        V=_JSD_TOPV
    ),
    tags=("llm", "text", "stats", "mix", "jsd", "scale"),
)
def q247_js_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    tfs = (
        t(spark, sf_dir, "documents")
        .select("source", F.explode(tokens("text")).alias("tok"))
        .groupBy("source", "tok")
        .agg(F.count(F.lit(1)).cast("long").alias("cs"))
    )
    tfc = tfs.groupBy("tok").agg(F.sum("cs").cast("long").alias("cc"))
    # TakeOrderedAndProject top-V: distributed per-partition top-V then
    # a V-row merge on the driver -- never a single-partition global sort
    # of the vocabulary relation (the q101 idiom).
    topv = (
        tfc.orderBy(F.col("cc").desc(), "tok")
        .limit(_JSD_TOPV)
        .select("tok")
    )
    tfv = tfs.join(F.broadcast(topv), "tok")
    ns = tfv.groupBy("source").agg(F.sum("cs").cast("long").alias("n"))
    mat = (
        ns.select("source")
        .crossJoin(F.broadcast(topv))
        .join(tfv, ["source", "tok"], "left")
        .select(
            "source", "tok", F.coalesce("cs", F.lit(0)).cast("long").alias("cs")
        )
    )
    a = mat.select(
        F.col("source").alias("src_a"),
        "tok",
        F.col("cs").alias("cs_a"),
    )
    b = mat.select(
        F.col("source").alias("src_b"),
        F.col("tok").alias("tok_b"),
        F.col("cs").alias("cs_b"),
    )
    na = ns.select(F.col("source").alias("src_a"), F.col("n").alias("n_a"))
    nb = ns.select(F.col("source").alias("src_b"), F.col("n").alias("n_b"))
    den = (
        F.col("cs_a") * F.col("n_b") + F.col("cs_b") * F.col("n_a")
    ).cast("double")
    lq_a = F.round(
        F.lit(1000000.0)
        * F.log((2 * F.col("cs_a") * F.col("n_b")).cast("double") / den)
    ).cast("long")
    lq_b = F.round(
        F.lit(1000000.0)
        * F.log((2 * F.col("cs_b") * F.col("n_a")).cast("double") / den)
    ).cast("long")
    pairterm = (
        a.join(b, (F.col("tok_b") == F.col("tok"))
               & (F.col("src_a") < F.col("src_b")))
        .join(F.broadcast(na), "src_a")
        .join(F.broadcast(nb), "src_b")
        .filter(F.col("cs_a") + F.col("cs_b") > 0)
        .select(
            "src_a",
            "src_b",
            "n_a",
            "n_b",
            F.when(F.col("cs_a") > 0, F.col("cs_a") * lq_a)
            .otherwise(F.lit(0))
            .cast("long")
            .alias("term_a"),
            F.when(F.col("cs_b") > 0, F.col("cs_b") * lq_b)
            .otherwise(F.lit(0))
            .cast("long")
            .alias("term_b"),
        )
    )
    return (
        pairterm.groupBy("src_a", "src_b", "n_a", "n_b")
        .agg(
            F.sum("term_a").cast("long").alias("sum_a"),
            F.sum("term_b").cast("long").alias("sum_b"),
        )
        .select(
            "src_a",
            "src_b",
            F.round(
                (
                    F.col("sum_a").cast("double") / F.col("n_a")
                    + F.col("sum_b").cast("double") / F.col("n_b")
                )
                / 2.0
            )
            .cast("long")
            .alias("jsd_micro"),
        )
        .orderBy("src_a", "src_b")
    )


# --- q248: Heaps' law vocabulary-growth fit ---------------------------------


@register(
    "q248_heaps_law",
    oracle="""
    WITH toks AS (
      SELECT doc_id,
             list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                         t -> t <> '') AS tk
      FROM documents),
    rk AS (
      SELECT doc_id, CAST(len(tk) AS BIGINT) AS n_tok,
             row_number() OVER (ORDER BY doc_id) AS rnk
      FROM toks),
    fo AS (
      SELECT tok, min(rnk) AS fr
      FROM (SELECT r.rnk, unnest(t.tk) AS tok
            FROM toks t JOIN rk r USING (doc_id))
      GROUP BY 1),
    newv AS (SELECT fr AS rnk, CAST(count(*) AS BIGINT) AS nv
             FROM fo GROUP BY 1),
    pr AS (
      SELECT r.rnk, r.n_tok, CAST(coalesce(v.nv, 0) AS BIGINT) AS nv
      FROM rk r LEFT JOIN newv v USING (rnk)),
    mx AS (SELECT max(rnk) AS m FROM rk),
    cps AS (
      SELECT DISTINCT least(CAST(power(2.0, CAST(i AS DOUBLE)) AS BIGINT),
                            mx.m) AS rank_cp
      FROM (SELECT unnest(range(0, 41)) AS i), mx),
    curve AS (
      SELECT c.rank_cp,
             CAST(sum(p.n_tok) AS BIGINT) AS cum_tokens,
             CAST(sum(p.nv) AS BIGINT) AS cum_vocab
      FROM cps c JOIN pr p ON p.rnk <= c.rank_cp
      GROUP BY 1),
    q AS (
      SELECT CAST(round(1000000.0 * ln(CAST(cum_tokens AS DOUBLE)))
               AS BIGINT) AS xq,
             CAST(round(1000000.0 * ln(CAST(cum_vocab AS DOUBLE)))
               AS BIGINT) AS yq
      FROM curve WHERE cum_tokens > 0 AND cum_vocab > 0),
    s AS (
      SELECT CAST(count(*) AS BIGINT) AS n_fit,
             CAST(sum(xq) AS BIGINT) AS sx,
             CAST(sum(yq) AS BIGINT) AS sy,
             CAST(sum(xq * yq) AS BIGINT) AS sxy,
             CAST(sum(xq * xq) AS BIGINT) AS sxx
      FROM q)
    SELECT c.rank_cp, c.cum_tokens, c.cum_vocab,
           CAST(round(1000000.0
             * ((CAST(s.n_fit AS DOUBLE) * s.sxy
                 - CAST(s.sx AS DOUBLE) * s.sy)
                / (CAST(s.n_fit AS DOUBLE) * s.sxx
                   - CAST(s.sx AS DOUBLE) * s.sx)))
             AS BIGINT) AS beta_micro,
           CAST(round(
             (CAST(s.sy AS DOUBLE)
              - ((CAST(s.n_fit AS DOUBLE) * s.sxy
                  - CAST(s.sx AS DOUBLE) * s.sy)
                 / (CAST(s.n_fit AS DOUBLE) * s.sxx
                    - CAST(s.sx AS DOUBLE) * s.sx))
                * s.sx) / s.n_fit) AS BIGINT) AS intercept_micro
    FROM curve c, s
    ORDER BY c.rank_cp
    """,
    doc="HEAPS' LAW VOCABULARY-GROWTH FIT — q221 Zipf's companion "
    "corpus-health diagnostic: natural text grows vocabulary as "
    "V(N) ~ K*N^beta with beta ~ 0.4-0.6; a saturating curve "
    "(beta ~ 0) flags a templated/synthetic corpus, a beta near 1 "
    "flags noise/OCR garbage. Docs are ranked in doc_id order "
    "(with_global_index's two-pass range partition — never a "
    "single-task window); each token's FIRST rank is a min-agg; "
    "the growth curve is evaluated only at power-of-2 rank "
    "checkpoints (<= 41 at ANY corpus size), each checkpoint a "
    "sum over the per-rank (n_tok, new_vocab) relation via a "
    "broadcast theta-join — no global prefix-sum window exists "
    "anywhere. The log-log OLS follows the q221 discipline: ln "
    "values integer-micro-quantized BEFORE the sums, slope/"
    "intercept combined in identical-operand DOUBLE arithmetic. "
    "Scale: tokenize folds to two map-side-combinable aggs (per-"
    "doc counts, per-token min-rank); everything after runs on "
    "doc-bounded then 41-row relations.",
    tags=("llm", "text", "stats", "heaps", "vocabulary", "scale"),
)
def q248_heaps_law(spark: SparkSession, sf_dir: str) -> DataFrame:
    from columnarmodeling_spark.operators.indexing import with_global_index

    d = (
        t(spark, sf_dir, "documents")
        .select("doc_id", tokens("text").alias("tk"))
    )
    rk = with_global_index(
        d.select("doc_id", F.size("tk").cast("long").alias("n_tok")),
        ["doc_id"],
        index_col="rnk",
    )
    fo = (
        d.select("doc_id", F.explode("tk").alias("tok"))
        .join(rk.select("doc_id", "rnk"), "doc_id")
        .groupBy("tok")
        .agg(F.min("rnk").alias("fr"))
    )
    newv = fo.groupBy(F.col("fr").alias("rnk")).agg(
        F.count(F.lit(1)).cast("long").alias("nv")
    )
    pr = (
        rk.select("rnk", "n_tok")
        .join(newv, "rnk", "left")
        .select(
            "rnk",
            "n_tok",
            F.coalesce("nv", F.lit(0)).cast("long").alias("nv"),
        )
    )
    mx = rk.agg(F.max("rnk").alias("m"))
    cps = (
        spark.range(0, 41)
        .crossJoin(F.broadcast(mx))
        .select(
            F.least(
                F.pow(F.lit(2.0), F.col("id").cast("double")).cast("long"),
                F.col("m"),
            ).alias("rank_cp")
        )
        .distinct()
    )
    curve = (
        pr.crossJoin(F.broadcast(cps))
        .filter(F.col("rnk") <= F.col("rank_cp"))
        .groupBy("rank_cp")
        .agg(
            F.sum("n_tok").cast("long").alias("cum_tokens"),
            F.sum("nv").cast("long").alias("cum_vocab"),
        )
    )
    q = curve.filter(
        (F.col("cum_tokens") > 0) & (F.col("cum_vocab") > 0)
    ).select(
        F.round(
            F.lit(1000000.0) * F.log(F.col("cum_tokens").cast("double"))
        )
        .cast("long")
        .alias("xq"),
        F.round(
            F.lit(1000000.0) * F.log(F.col("cum_vocab").cast("double"))
        )
        .cast("long")
        .alias("yq"),
    )
    s = q.agg(
        F.count(F.lit(1)).cast("long").alias("n_fit"),
        F.sum("xq").cast("long").alias("sx"),
        F.sum("yq").cast("long").alias("sy"),
        F.sum(F.col("xq") * F.col("yq")).cast("long").alias("sxy"),
        F.sum(F.col("xq") * F.col("xq")).cast("long").alias("sxx"),
    )
    num = (
        F.col("n_fit").cast("double") * F.col("sxy")
        - F.col("sx").cast("double") * F.col("sy")
    )
    den = (
        F.col("n_fit").cast("double") * F.col("sxx")
        - F.col("sx").cast("double") * F.col("sx")
    )
    slope = num / den
    return (
        curve.crossJoin(F.broadcast(s))
        .select(
            "rank_cp",
            "cum_tokens",
            "cum_vocab",
            F.round(F.lit(1000000.0) * slope).cast("long").alias(
                "beta_micro"
            ),
            F.round(
                (F.col("sy").cast("double") - slope * F.col("sx"))
                / F.col("n_fit")
            )
            .cast("long")
            .alias("intercept_micro"),
        )
        .orderBy("rank_cp")
    )


# --- q253: k-anonymity risk audit -------------------------------------------

_KANON_K = 5
_KANON_LEN_BUCKET = 200


@register(
    "q253_k_anonymity",
    oracle=f"""
    WITH qi AS (
      SELECT lang, source, n_chars // {_KANON_LEN_BUCKET} AS len_b,
             CAST(count(*) AS BIGINT) AS sz
      FROM documents GROUP BY 1, 2, 3),
    per AS (
      SELECT lang,
             CAST(count(*) AS BIGINT) AS n_groups,
             CAST(sum(CASE WHEN sz < {_KANON_K} THEN 1 ELSE 0 END)
               AS BIGINT) AS n_risky_groups,
             CAST(sum(sz) AS BIGINT) AS n_docs,
             CAST(sum(CASE WHEN sz < {_KANON_K} THEN sz ELSE 0 END)
               AS BIGINT) AS n_risky_docs,
             CAST(min(sz) AS BIGINT) AS min_group_size
      FROM qi GROUP BY 1),
    allr AS (
      SELECT '_ALL' AS lang,
             CAST(sum(n_groups) AS BIGINT) AS n_groups,
             CAST(sum(n_risky_groups) AS BIGINT) AS n_risky_groups,
             CAST(sum(n_docs) AS BIGINT) AS n_docs,
             CAST(sum(n_risky_docs) AS BIGINT) AS n_risky_docs,
             CAST(min(min_group_size) AS BIGINT) AS min_group_size
      FROM per)
    SELECT lang, n_groups, n_risky_groups, n_docs, n_risky_docs,
           min_group_size,
           CAST((1000000 * n_risky_docs) // n_docs AS BIGINT)
             AS risk_micro
    FROM (SELECT * FROM per UNION ALL SELECT * FROM allr)
    ORDER BY lang
    """,
    doc="K-ANONYMITY RISK AUDIT over the corpus metadata — the "
    "privacy screen a release pipeline runs before publishing a "
    "dataset: every document falls into a quasi-identifier cell "
    "(lang, source, length bucket of {B} chars), and a cell with "
    "fewer than k={K} members re-identifies its members by "
    "metadata alone. Reports, per language plus the _ALL rollup: "
    "cell count, risky-cell count, docs at risk, the smallest "
    "cell, and the at-risk fraction as an exact truncating "
    "micro-division. Everything is int64 counting — no floats "
    "exist. Scale: one map-side-combinable hash agg onto the QI "
    "cell space (bounded by the attribute domains, not rows), "
    "then a second agg onto |langs|+1 rows. The QI cell relation "
    "is exactly the generalization lattice node a k-anonymization "
    "run would coarsen next, so the audit is also the first step "
    "of the fix.".format(B=_KANON_LEN_BUCKET, K=_KANON_K),
    tags=("llm", "privacy", "k-anonymity", "audit", "scale"),
)
def q253_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    qi = (
        t(spark, sf_dir, "documents")
        .select(
            "lang",
            "source",
            F.expr(f"div(n_chars, {_KANON_LEN_BUCKET})").alias("len_b"),
        )
        .groupBy("lang", "source", "len_b")
        .agg(F.count(F.lit(1)).cast("long").alias("sz"))
    )
    risky = F.col("sz") < _KANON_K
    per = qi.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_groups"),
        F.sum(F.when(risky, 1).otherwise(0))
        .cast("long")
        .alias("n_risky_groups"),
        F.sum("sz").cast("long").alias("n_docs"),
        F.sum(F.when(risky, F.col("sz")).otherwise(0))
        .cast("long")
        .alias("n_risky_docs"),
        F.min("sz").cast("long").alias("min_group_size"),
    )
    per = per.localCheckpoint(eager=False)
    allr = per.agg(
        F.sum("n_groups").cast("long").alias("n_groups"),
        F.sum("n_risky_groups").cast("long").alias("n_risky_groups"),
        F.sum("n_docs").cast("long").alias("n_docs"),
        F.sum("n_risky_docs").cast("long").alias("n_risky_docs"),
        F.min("min_group_size").cast("long").alias("min_group_size"),
    ).select(
        F.lit("_ALL").alias("lang"),
        "n_groups",
        "n_risky_groups",
        "n_docs",
        "n_risky_docs",
        "min_group_size",
    )
    return (
        per.unionByName(allr)
        .select(
            "lang",
            "n_groups",
            "n_risky_groups",
            "n_docs",
            "n_risky_docs",
            "min_group_size",
            F.expr("div(1000000 * n_risky_docs, n_docs)")
            .cast("long")
            .alias("risk_micro"),
        )
        .orderBy("lang")
    )


# --- q256: Wasserstein-1 distance between source length distributions -------


@register(
    "q256_wasserstein",
    oracle="""
    WITH lv AS (
      SELECT source, n_chars AS len,
             CAST(count(*) AS BIGINT) AS c
      FROM documents GROUP BY 1, 2),
    lens AS (SELECT DISTINCT len FROM lv),
    gaps AS (
      SELECT len,
             lead(len) OVER (ORDER BY len) - len AS gap
      FROM lens),
    srcs AS (SELECT DISTINCT source FROM lv),
    grid AS (
      SELECT s.source, l.len, CAST(coalesce(v.c, 0) AS BIGINT) AS c
      FROM srcs s CROSS JOIN lens l
      LEFT JOIN lv v ON v.source = s.source AND v.len = l.len),
    cum AS (
      SELECT source, len,
             CAST(sum(c) OVER (
               PARTITION BY source ORDER BY len
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS cum
      FROM grid),
    tot AS (
      SELECT source, CAST(sum(c) AS BIGINT) AS n FROM lv GROUP BY 1),
    terms AS (
      SELECT a.source AS source_a, b.source AS source_b,
             ta.n AS n_a, tb.n AS n_b,
             CAST(sum(abs(a.cum * tb.n - b.cum * ta.n) * g.gap)
               AS BIGINT) AS area
      FROM cum a
      JOIN cum b ON a.len = b.len AND a.source < b.source
      JOIN gaps g ON g.len = a.len AND g.gap IS NOT NULL
      JOIN tot ta ON ta.source = a.source
      JOIN tot tb ON tb.source = b.source
      GROUP BY 1, 2, 3, 4)
    SELECT source_a, source_b, n_a, n_b,
           CAST(round(1000.0 * CAST(area AS DOUBLE)
             / (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)))
             AS BIGINT) AS w1_milli
    FROM terms
    ORDER BY source_a, source_b
    """,
    doc="WASSERSTEIN-1 (EARTH-MOVER) DISTANCE between every pair of "
    "sources' document-length distributions — the integral-form "
    "companion to q228's KS sup-statistic: W1 = integral "
    "|F_a - F_b| dx reads as 'average characters of length shift "
    "needed to turn one source's distribution into the other's', "
    "the drift number a mixing/rebalance decision actually wants "
    "(KS says WHETHER they differ; W1 says BY HOW MUCH in char "
    "units). Exact: distributions are level-compacted onto the "
    "shared distinct-length grid; each term is the int64 cross "
    "product |cumA*nB - cumB*nA| times the integer gap to the "
    "next level; ONE double division at the end, quantized to "
    "milli-chars. Scale: the corpus folds to (source, len) "
    "counts map-side; the CDF window and pair join run over the "
    "|sources| x |length-domain| grid (domain-bounded, q252 "
    "discipline); the pair space is |sources| choose 2. Counts "
    "up to ~3e9 keep the cross product in int64; past that "
    "rescale to k-units (q250 note).",
    tags=("llm", "stats", "wasserstein", "drift", "scale"),
)
def q256_wasserstein(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    lv = (
        t(spark, sf_dir, "documents")
        .groupBy("source", F.col("n_chars").alias("len"))
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    lv = lv.localCheckpoint(eager=False)
    lens = lv.select("len").distinct()
    gaps = lens.select(
        "len",
        (
            F.lead("len").over(W.partitionBy().orderBy("len"))
            - F.col("len")
        ).alias("gap"),
    ).filter(F.col("gap").isNotNull())
    srcs = lv.select("source").distinct()
    grid = (
        srcs.crossJoin(lens)
        .join(lv, ["source", "len"], "left")
        .select(
            "source",
            "len",
            F.coalesce("c", F.lit(0)).cast("long").alias("c"),
        )
    )
    wc = (
        W.partitionBy("source")
        .orderBy("len")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    cum = grid.select(
        "source", "len", F.sum("c").over(wc).cast("long").alias("cum")
    )
    cum = cum.localCheckpoint(eager=False)
    tot = lv.groupBy("source").agg(F.sum("c").cast("long").alias("n"))
    a = cum.select(
        F.col("source").alias("source_a"),
        "len",
        F.col("cum").alias("cum_a"),
    )
    b = cum.select(
        F.col("source").alias("source_b"),
        F.col("len").alias("len_b"),
        F.col("cum").alias("cum_b"),
    )
    ta = tot.select(
        F.col("source").alias("source_a"), F.col("n").alias("n_a")
    )
    tb = tot.select(
        F.col("source").alias("source_b"), F.col("n").alias("n_b")
    )
    terms = (
        a.join(
            b,
            (F.col("len") == F.col("len_b"))
            & (F.col("source_a") < F.col("source_b")),
        )
        .join(F.broadcast(gaps), "len")
        .join(F.broadcast(ta), "source_a")
        .join(F.broadcast(tb), "source_b")
        .groupBy("source_a", "source_b", "n_a", "n_b")
        .agg(
            F.sum(
                F.abs(
                    F.col("cum_a") * F.col("n_b")
                    - F.col("cum_b") * F.col("n_a")
                )
                * F.col("gap")
            )
            .cast("long")
            .alias("area")
        )
    )
    return terms.select(
        "source_a",
        "source_b",
        "n_a",
        "n_b",
        F.round(
            F.lit(1000.0)
            * F.col("area").cast("double")
            / (F.col("n_a").cast("double") * F.col("n_b").cast("double"))
        )
        .cast("long")
        .alias("w1_milli"),
    ).orderBy("source_a", "source_b")


# --- q260: token <-> source mutual information screen ------------------------

_MI_TOP_K = 20  # most-document-frequent tokens screened


@register(
    "q260_token_source_mi",
    oracle=f"""
    WITH dt AS (
      SELECT doc_id, source,
             unnest(list_distinct(list_filter(regexp_split_to_array(
                    lower(text), '[^a-z0-9]+'), t -> t <> ''))) AS tok
      FROM documents),
    df AS (
      SELECT tok, CAST(count(*) AS BIGINT) AS df
      FROM dt GROUP BY 1),
    topk AS (
      SELECT tok, df FROM df ORDER BY df DESC, tok LIMIT {_MI_TOP_K}),
    ns AS (
      SELECT source, CAST(count(*) AS BIGINT) AS n_s
      FROM documents GROUP BY 1),
    nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
    dws AS (
      SELECT d.tok, d.source, CAST(count(*) AS BIGINT) AS c1
      FROM dt d JOIN topk k ON k.tok = d.tok
      GROUP BY 1, 2),
    grid AS (
      SELECT k.tok, k.df, s.source, s.n_s,
             CAST(coalesce(w.c1, 0) AS BIGINT) AS c1
      FROM topk k CROSS JOIN ns s
      LEFT JOIN dws w ON w.tok = k.tok AND w.source = s.source),
    terms AS (
      SELECT g.tok, g.df,
             CASE WHEN g.c1 > 0 THEN g.c1 * CAST(round(1000000.0
               * ln((CAST(g.c1 AS DOUBLE) * x.n)
                    / (CAST(g.df AS DOUBLE) * g.n_s))) AS BIGINT)
               ELSE 0 END
             + CASE WHEN g.n_s - g.c1 > 0 THEN
                 (g.n_s - g.c1) * CAST(round(1000000.0
                   * ln((CAST(g.n_s - g.c1 AS DOUBLE) * x.n)
                        / (CAST(x.n - g.df AS DOUBLE) * g.n_s)))
                   AS BIGINT)
               ELSE 0 END AS term,
             x.n AS n
      FROM grid g CROSS JOIN nn x)
    SELECT tok, df,
           CAST(round(CAST(sum(term) AS DOUBLE) / n) AS BIGINT) AS mi_micro
    FROM terms GROUP BY tok, df, n
    ORDER BY tok
    """,
    doc="MUTUAL INFORMATION between source and token PRESENCE for the "
    f"{_MI_TOP_K} most document-frequent tokens — the feature-"
    "selection screen behind 'which tokens identify their source?' "
    "(q237's Theil U measures lang<->source association; this "
    "measures source<->VOCABULARY, the signal a contamination or "
    "style probe trains on): MI(S; 1[w in doc]) = sum over "
    "(source, present/absent) cells of p ln(p/(p_row p_col)), "
    "assembled from the (tok, source) document-frequency "
    "CONTINGENCY relation with zero-count cells contributing 0. "
    "Exactness: each cell's log-ratio ln(c*N/(rowtot*n_s)) is "
    "quantized to integer micro-nats BEFORE the count-weighted "
    "int64 sum (q203/q233 ln discipline); ONE double division per "
    "token at the end. Scale: the distinct (doc, tok) relation "
    "folds map-side to per-token df; top-k is a bounded global "
    "sort of the VOCAB relation (q221 discipline); the cell "
    "counts join a BROADCAST k-row token list against the same "
    "distinct relation; the grid is k x |sources| arithmetic on "
    "the broadcast scale.",
    tags=("llm", "text", "stats", "mi", "feature-selection", "scale"),
)
def q260_token_source_mi(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    dt = docs.select(
        "doc_id",
        "source",
        F.explode(F.array_distinct(tokens("text"))).alias("tok"),
    )
    df = dt.groupBy("tok").agg(F.count(F.lit(1)).cast("long").alias("df"))
    topk = df.orderBy(F.desc("df"), "tok").limit(_MI_TOP_K)
    ns = docs.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_s")
    )
    nn = docs.agg(F.count(F.lit(1)).cast("long").alias("n"))
    dws = (
        dt.join(F.broadcast(topk.select("tok")), "tok")
        .groupBy("tok", "source")
        .agg(F.count(F.lit(1)).cast("long").alias("c1"))
    )
    grid = (
        F.broadcast(topk)
        .crossJoin(F.broadcast(ns))
        .join(dws, ["tok", "source"], "left")
        .select(
            "tok",
            "df",
            "source",
            "n_s",
            F.coalesce("c1", F.lit(0)).cast("long").alias("c1"),
        )
    )
    terms = grid.crossJoin(F.broadcast(nn)).select(
        "tok",
        "df",
        "n",
        (
            F.when(
                F.col("c1") > 0,
                F.col("c1")
                * F.round(
                    F.lit(1000000.0)
                    * F.log(
                        (F.col("c1").cast("double") * F.col("n"))
                        / (F.col("df").cast("double") * F.col("n_s"))
                    )
                ).cast("long"),
            ).otherwise(F.lit(0).cast("long"))
            + F.when(
                (F.col("n_s") - F.col("c1")) > 0,
                (F.col("n_s") - F.col("c1"))
                * F.round(
                    F.lit(1000000.0)
                    * F.log(
                        (
                            (F.col("n_s") - F.col("c1")).cast("double")
                            * F.col("n")
                        )
                        / (
                            (F.col("n") - F.col("df")).cast("double")
                            * F.col("n_s")
                        )
                    )
                ).cast("long"),
            ).otherwise(F.lit(0).cast("long"))
        ).alias("term"),
    )
    return (
        terms.groupBy("tok", "df", "n")
        .agg(
            F.round(F.sum("term").cast("double") / F.first("n"))
            .cast("long")
            .alias("mi_micro")
        )
        .select("tok", "df", "mi_micro")
        .orderBy("tok")
    )


# --- q262: Hellinger / Bhattacharyya source-pair distance --------------------


@register(
    "q262_hellinger",
    oracle="""
    WITH tk AS (
      SELECT source,
             unnest(list_filter(regexp_split_to_array(lower(text),
                    '[^a-z0-9]+'), t -> t <> '')) AS tok
      FROM documents),
    tfs AS (
      SELECT source, tok, CAST(count(*) AS BIGINT) AS cs
      FROM tk GROUP BY 1, 2),
    ns AS (
      SELECT source, CAST(sum(cs) AS BIGINT) AS n FROM tfs GROUP BY 1),
    bc AS (
      SELECT a.source AS source_a, b.source AS source_b,
             ta.n AS n_a, tb.n AS n_b,
             CAST(sum(CAST(round(1000000000000.0
               * sqrt((CAST(a.cs AS DOUBLE) * b.cs)
                      / (CAST(ta.n AS DOUBLE) * tb.n))) AS BIGINT))
               AS BIGINT) AS bc_pico
      FROM tfs a
      JOIN tfs b ON b.tok = a.tok AND a.source < b.source
      JOIN ns ta ON ta.source = a.source
      JOIN ns tb ON tb.source = b.source
      GROUP BY 1, 2, 3, 4)
    SELECT source_a, source_b, n_a, n_b,
           CAST(round(CAST(bc_pico AS DOUBLE) / 1000000.0) AS BIGINT)
             AS bc_micro,
           CAST(round(1000000.0 * sqrt(greatest(
             1.0 - CAST(bc_pico AS DOUBLE) / 1000000000000.0, 0.0)))
             AS BIGINT) AS hellinger_micro
    FROM bc ORDER BY source_a, source_b
    """,
    doc="HELLINGER DISTANCE (via the Bhattacharyya coefficient) "
    "between every source pair's unigram distributions — the "
    "bounded-metric member of the drift family (q233 KL is "
    "unbounded and asymmetric; q247 JSD is smoothed; Hellinger is "
    "a TRUE METRIC in [0,1], the one you threshold for 'same "
    "distribution?' gating): BC = sum sqrt(p_a p_b) over the "
    "shared vocabulary, H = sqrt(1-BC). Exactness: each term's "
    "sqrt((cs_a*cs_b)/(n_a*n_b)) is one identical-operand double "
    "quantized to integer PICO units before the exact int64 sum "
    "(Cauchy-Schwarz bounds the sum by 1e12 — no overflow at any "
    "scale; per-term rounding error is <= 0.5e-12 * |vocab|, "
    "invisible at the published micro quantum); the final sqrt is "
    "single-operand IEEE. Scale: corpus folds map-side to the "
    "(source, tok) relation; the pair join shuffles on tok over "
    "the VOCABULARY (q235 discipline); output is |sources| "
    "choose 2.",
    tags=("llm", "text", "stats", "hellinger", "drift", "scale"),
)
def q262_hellinger(spark: SparkSession, sf_dir: str) -> DataFrame:
    tfs = (
        t(spark, sf_dir, "documents")
        .select("source", F.explode(tokens("text")).alias("tok"))
        .groupBy("source", "tok")
        .agg(F.count(F.lit(1)).cast("long").alias("cs"))
    )
    tfs = tfs.localCheckpoint(eager=False)
    ns = tfs.groupBy("source").agg(F.sum("cs").cast("long").alias("n"))
    a = tfs.select(
        F.col("source").alias("source_a"), "tok", F.col("cs").alias("cs_a")
    )
    b = tfs.select(
        F.col("source").alias("source_b"),
        F.col("tok").alias("tok_b"),
        F.col("cs").alias("cs_b"),
    )
    ta = ns.select(F.col("source").alias("source_a"), F.col("n").alias("n_a"))
    tb = ns.select(F.col("source").alias("source_b"), F.col("n").alias("n_b"))
    term = F.round(
        F.lit(1000000000000.0)
        * F.sqrt(
            (F.col("cs_a").cast("double") * F.col("cs_b"))
            / (F.col("n_a").cast("double") * F.col("n_b"))
        )
    ).cast("long")
    bc = (
        a.join(
            b,
            (F.col("tok_b") == F.col("tok"))
            & (F.col("source_a") < F.col("source_b")),
        )
        .join(F.broadcast(ta), "source_a")
        .join(F.broadcast(tb), "source_b")
        .groupBy("source_a", "source_b", "n_a", "n_b")
        .agg(F.sum(term).cast("long").alias("bc_pico"))
    )
    return bc.select(
        "source_a",
        "source_b",
        "n_a",
        "n_b",
        F.expr(
            "CAST(round(CAST(bc_pico AS DOUBLE) / 1000000.0) AS BIGINT)"
        ).alias("bc_micro"),
        F.expr(
            "CAST(round(1000000.0 * sqrt(greatest("
            "1.0 - CAST(bc_pico AS DOUBLE) / 1000000000000.0, 0.0)))"
            " AS BIGINT)"
        ).alias("hellinger_micro"),
    ).orderBy("source_a", "source_b")


# --- q263: vocabulary coverage curve ----------------------------------------

_COVERAGE_KS = (100, 1000, 10000)  # vocabulary budgets probed


@register(
    "q263_vocab_coverage",
    oracle=f"""
    WITH tk AS (
      SELECT unnest(list_filter(regexp_split_to_array(lower(text),
                    '[^a-z0-9]+'), t -> t <> '')) AS tok
      FROM documents),
    tf AS (
      SELECT tok, CAST(count(*) AS BIGINT) AS c FROM tk GROUP BY 1),
    tot AS (
      SELECT CAST(sum(c) AS BIGINT) AS n, CAST(count(*) AS BIGINT) AS v
      FROM tf),
    r AS (
      SELECT c, row_number() OVER (ORDER BY c DESC, tok) AS rk
      FROM tf),
    cum AS (
      SELECT rk, CAST(sum(c) OVER (
               ORDER BY rk
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS cum_tokens
      FROM r),
    ks AS (
      SELECT CAST(unnest([{", ".join(str(k) for k in _COVERAGE_KS)}])
               AS BIGINT) AS k)
    SELECT k.k, t.v AS n_vocab, t.n AS n_tokens, c.cum_tokens,
           CAST(round(1000000.0 * c.cum_tokens / t.n) AS BIGINT)
             AS coverage_micro
    FROM ks k
    CROSS JOIN tot t
    JOIN cum c ON c.rk = least(k.k, t.v)
    ORDER BY k.k
    """,
    doc="VOCABULARY COVERAGE CURVE — what fraction of corpus token "
    "OCCURRENCES do the top-k most frequent types cover, at k = "
    f"{_COVERAGE_KS} (the tokenizer-budget question 'how big must "
    "the vocab be?' that q221's Zipf exponent implies but never "
    "answers, and the OOV-rate complement: 1 - coverage IS the "
    "OOV mass at budget k): rank types by (count desc, tok), "
    "running-sum the counts, probe the cumsum at each budget "
    "(clamped to the vocab size). Integer end-to-end except the "
    "ONE quantized coverage division. Scale: the corpus folds "
    "map-side to the VOCAB relation; the rank and running sum are "
    "a single global-order window over that bounded relation "
    "(q221 discipline — acceptable because vocab << corpus; the "
    "two-level escape is ranged pre-bucketing by count if vocab "
    "itself sharded); the probe join is 3 rows against the "
    "cumsum.",
    tags=("llm", "text", "vocab", "coverage", "tokenizer", "scale"),
)
def q263_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    tf = (
        t(spark, sf_dir, "documents")
        .select(F.explode(tokens("text")).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    tf = tf.localCheckpoint(eager=False)
    tot = tf.agg(
        F.sum("c").cast("long").alias("n"),
        F.count(F.lit(1)).cast("long").alias("v"),
    )
    r = tf.select(
        "c",
        F.row_number()
        .over(W.partitionBy().orderBy(F.desc("c"), "tok"))
        .alias("rk"),
    )
    cum = r.select(
        "rk",
        F.sum("c")
        .over(
            W.partitionBy()
            .orderBy("rk")
            .rowsBetween(W.unboundedPreceding, W.currentRow)
        )
        .cast("long")
        .alias("cum_tokens"),
    )
    ks = spark.range(0).sparkSession.createDataFrame(
        [(int(k),) for k in _COVERAGE_KS], "k long"
    )
    return (
        F.broadcast(ks)
        .crossJoin(F.broadcast(tot))
        .join(cum, F.col("rk") == F.least(F.col("k"), F.col("v")))
        .select(
            "k",
            F.col("v").alias("n_vocab"),
            F.col("n").alias("n_tokens"),
            "cum_tokens",
            F.expr(
                "CAST(round(1000000.0 * cum_tokens / n) AS BIGINT)"
            ).alias("coverage_micro"),
        )
        .orderBy("k")
    )


# --- q261: unseen-mass / Chao1 vocabulary richness ---------------------------


@register(
    "q261_unseen_mass",
    oracle="""
    WITH tk AS (
      SELECT source,
             unnest(list_filter(regexp_split_to_array(lower(text),
                    '[^a-z0-9]+'), t -> t <> '')) AS tok
      FROM documents),
    tfs AS (
      SELECT source, tok, CAST(count(*) AS BIGINT) AS c
      FROM tk GROUP BY 1, 2),
    s AS (
      SELECT source,
             CAST(sum(c) AS BIGINT) AS n_tokens,
             CAST(count(*) AS BIGINT) AS v_types,
             CAST(count(*) FILTER (WHERE c = 1) AS BIGINT) AS f1,
             CAST(count(*) FILTER (WHERE c = 2) AS BIGINT) AS f2
      FROM tfs GROUP BY 1)
    SELECT source, n_tokens, v_types, f1, f2,
           CAST(round(1000.0 * (v_types + CAST(f1 AS DOUBLE) * (f1 - 1)
             / (2.0 * (f2 + 1)))) AS BIGINT) AS chao1_milli,
           CAST(round(1000000.0 * f1 / n_tokens) AS BIGINT) AS unseen_micro
    FROM s ORDER BY source
    """,
    doc="UNSEEN-MASS + CHAO1 VOCABULARY RICHNESS per source — the "
    "extrapolation the in-sample vocab family cannot give (q248 "
    "Heaps fits growth OBSERVED so far; q263 covers budget over "
    "types SEEN; this estimates what is NOT yet seen): Good-Turing "
    "missing mass p0 = f1/N (the probability the NEXT token drawn "
    "from source s is a never-seen type — the sampling-adequacy "
    "gate for 'is this source crawled out?') and the bias-corrected "
    "Chao1 asymptotic richness V + f1(f1-1)/(2(f2+1)) (defined even "
    "at f2=0, where the classic f1^2/(2 f2) form blows up), both "
    "from the singleton/doubleton counts-of-counts. Exactness: "
    "counts are exact int64 all the way; each estimator is ONE "
    "textually identical double expression quantized at the end "
    "(q234 identical-operand IEEE discipline). Scale: corpus folds "
    "map-side to the (source, tok) relation; the counts-of-counts "
    "fold is a second map-side-combinable agg on that bounded "
    "relation keyed by source (no skew: hot sources fold in their "
    "combiners); output is |sources| rows.",
    tags=("llm", "text", "vocab", "richness", "good-turing", "scale"),
)
def q261_unseen_mass(spark: SparkSession, sf_dir: str) -> DataFrame:
    tfs = (
        t(spark, sf_dir, "documents")
        .select("source", F.explode(tokens("text")).alias("tok"))
        .groupBy("source", "tok")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    s = tfs.groupBy("source").agg(
        F.sum("c").cast("long").alias("n_tokens"),
        F.count(F.lit(1)).cast("long").alias("v_types"),
        F.count_if(F.col("c") == 1).cast("long").alias("f1"),
        F.count_if(F.col("c") == 2).cast("long").alias("f2"),
    )
    return s.select(
        "source",
        "n_tokens",
        "v_types",
        "f1",
        "f2",
        F.expr(
            "CAST(round(1000.0 * (v_types + CAST(f1 AS DOUBLE) * (f1 - 1)"
            " / (2.0 * (f2 + 1)))) AS BIGINT)"
        ).alias("chao1_milli"),
        F.expr(
            "CAST(round(1000000.0 * f1 / n_tokens) AS BIGINT)"
        ).alias("unseen_micro"),
    ).orderBy("source")


# --- q277: McNemar's paired test between two lang-id rules --------------------


@register(
    "q277_mcnemar",
    oracle="""
    WITH toks AS (
      SELECT lang,
             list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                         t -> t <> '') AS tk
      FROM documents),
    sc AS (
      SELECT lang,
             len(list_filter(tk, x -> list_contains(
               ['the','and','of','row','table'], x))) AS a_en,
             len(list_filter(tk, x -> list_contains(
               ['el','la','de','fila','tabla'], x))) AS a_es,
             len(list_filter(tk, x -> list_contains(
               ['zh','biao','hang','lie','shuju'], x))) AS a_zh,
             len(list_filter(tk, x -> x = 'the')) AS b_en,
             len(list_filter(tk, x -> x = 'de')) AS b_es,
             len(list_filter(tk, x -> x = 'zh')) AS b_zh
      FROM toks),
    pred AS (
      SELECT lang,
             CASE WHEN a_en >= a_es AND a_en >= a_zh THEN 'en'
                  WHEN a_es >= a_zh THEN 'es' ELSE 'zh' END AS ga,
             CASE WHEN b_en >= b_es AND b_en >= b_zh THEN 'en'
                  WHEN b_es >= b_zh THEN 'es' ELSE 'zh' END AS gb
      FROM sc),
    c AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CASE WHEN ga = lang AND gb = lang THEN 1 ELSE 0 END)
               AS BIGINT) AS both_right,
             CAST(sum(CASE WHEN ga <> lang AND gb <> lang THEN 1 ELSE 0
               END) AS BIGINT) AS both_wrong,
             CAST(sum(CASE WHEN ga = lang AND gb <> lang THEN 1 ELSE 0
               END) AS BIGINT) AS a_only,
             CAST(sum(CASE WHEN ga <> lang AND gb = lang THEN 1 ELSE 0
               END) AS BIGINT) AS b_only
      FROM pred)
    SELECT n, both_right, both_wrong, a_only, b_only,
           CAST(round(1000.0 * (both_right + a_only) / n) AS BIGINT)
             AS acc_a_milli,
           CAST(round(1000.0 * (both_right + b_only) / n) AS BIGINT)
             AS acc_b_milli,
           CAST(CASE WHEN a_only + b_only > 0 THEN
             round(1000.0 * (CAST(a_only - b_only AS DOUBLE)
               * (a_only - b_only)) / (a_only + b_only))
             ELSE 0 END AS BIGINT) AS mcnemar_milli
    FROM c
    """,
    doc="McNEMAR'S PAIRED TEST between two lang-id rules on the SAME "
    "documents — the right significance test for 'is classifier A "
    "actually better than B?' (comparing two accuracies with q191's "
    "two-sample z-test is wrong on paired predictions; McNemar "
    "conditions on the discordant pairs only): A = q52's full "
    "5-marker argmax, B = the degenerate single-marker variant "
    "(the,de,zh), chi^2_1 = (b01-b10)^2/(b01+b10) from the exact "
    "discordant counts, plus both accuracies and the full 2x2 "
    "agreement table. Exactness: ONE token scan feeds both rules; "
    "every cell is an int64 conditional count; the statistic is "
    "one identical-operand double (squared difference composed in "
    "double to dodge overflow), guarded at zero discordance. "
    "Scale: the scan folds map-side to one row — the 3.84 "
    "critical value then decides the router swap at ANY corpus "
    "size.",
    tags=("llm", "text", "eval", "mcnemar", "paired-test", "scale"),
)
def q277_mcnemar(spark: SparkSession, sf_dir: str) -> DataFrame:
    tk = tokens("text")
    a_en = F.size(
        F.filter(
            tk,
            lambda x: x.isin("the", "and", "of", "row", "table"),
        )
    )
    a_es = F.size(
        F.filter(tk, lambda x: x.isin("el", "la", "de", "fila", "tabla"))
    )
    a_zh = F.size(
        F.filter(
            tk, lambda x: x.isin("zh", "biao", "hang", "lie", "shuju")
        )
    )
    b_en = F.size(F.filter(tk, lambda x: x == "the"))
    b_es = F.size(F.filter(tk, lambda x: x == "de"))
    b_zh = F.size(F.filter(tk, lambda x: x == "zh"))
    sc = t(spark, sf_dir, "documents").select(
        "lang",
        a_en.alias("a_en"),
        a_es.alias("a_es"),
        a_zh.alias("a_zh"),
        b_en.alias("b_en"),
        b_es.alias("b_es"),
        b_zh.alias("b_zh"),
    )
    pred = sc.select(
        "lang",
        F.when(
            (F.col("a_en") >= F.col("a_es"))
            & (F.col("a_en") >= F.col("a_zh")),
            F.lit("en"),
        )
        .when(F.col("a_es") >= F.col("a_zh"), F.lit("es"))
        .otherwise(F.lit("zh"))
        .alias("ga"),
        F.when(
            (F.col("b_en") >= F.col("b_es"))
            & (F.col("b_en") >= F.col("b_zh")),
            F.lit("en"),
        )
        .when(F.col("b_es") >= F.col("b_zh"), F.lit("es"))
        .otherwise(F.lit("zh"))
        .alias("gb"),
    )
    c = pred.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(
            F.when(
                (F.col("ga") == F.col("lang"))
                & (F.col("gb") == F.col("lang")),
                1,
            ).otherwise(0)
        )
        .cast("long")
        .alias("both_right"),
        F.sum(
            F.when(
                (F.col("ga") != F.col("lang"))
                & (F.col("gb") != F.col("lang")),
                1,
            ).otherwise(0)
        )
        .cast("long")
        .alias("both_wrong"),
        F.sum(
            F.when(
                (F.col("ga") == F.col("lang"))
                & (F.col("gb") != F.col("lang")),
                1,
            ).otherwise(0)
        )
        .cast("long")
        .alias("a_only"),
        F.sum(
            F.when(
                (F.col("ga") != F.col("lang"))
                & (F.col("gb") == F.col("lang")),
                1,
            ).otherwise(0)
        )
        .cast("long")
        .alias("b_only"),
    )
    return c.select(
        "n",
        "both_right",
        "both_wrong",
        "a_only",
        "b_only",
        F.expr(
            "CAST(round(1000.0 * (both_right + a_only) / n) AS BIGINT)"
        ).alias("acc_a_milli"),
        F.expr(
            "CAST(round(1000.0 * (both_right + b_only) / n) AS BIGINT)"
        ).alias("acc_b_milli"),
        F.expr(
            "CAST(CASE WHEN a_only + b_only > 0 THEN"
            " round(1000.0 * (CAST(a_only - b_only AS DOUBLE)"
            " * (a_only - b_only)) / (a_only + b_only))"
            " ELSE 0 END AS BIGINT)"
        ).alias("mcnemar_milli"),
    )


# --- q278/q279: multi-rule paired-classifier tests --------------------------
#
# Reference parity: the reference validates the solver by re-running the
# same canonical experiment under variant configurations and comparing
# outcomes on identical inputs (README.md:29-33, the four shipped test
# folders). q278/q279 are the statistical version of that workflow for
# classifier variants sharing one evaluation set: Cochran's Q extends
# q277's McNemar to k=3 rules, Cohen's kappa scores inter-rule agreement
# beyond chance.

_LANGID_PRED_SQL = """
    toks AS (
      SELECT lang,
             list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                         t -> t <> '') AS tk
      FROM documents),
    sc AS (
      SELECT lang,
             len(list_filter(tk, x -> list_contains(
               ['the','and','of','row','table'], x))) AS a_en,
             len(list_filter(tk, x -> list_contains(
               ['el','la','de','fila','tabla'], x))) AS a_es,
             len(list_filter(tk, x -> list_contains(
               ['zh','biao','hang','lie','shuju'], x))) AS a_zh,
             len(list_filter(tk, x -> list_contains(
               ['the','and','of'], x))) AS b_en,
             len(list_filter(tk, x -> list_contains(
               ['el','la','de'], x))) AS b_es,
             len(list_filter(tk, x -> list_contains(
               ['zh','biao','hang'], x))) AS b_zh,
             len(list_filter(tk, x -> x = 'the')) AS c_en,
             len(list_filter(tk, x -> x = 'de')) AS c_es,
             len(list_filter(tk, x -> x = 'zh')) AS c_zh
      FROM toks),
    pred AS (
      SELECT lang,
             CASE WHEN a_en >= a_es AND a_en >= a_zh THEN 'en'
                  WHEN a_es >= a_zh THEN 'es' ELSE 'zh' END AS ga,
             CASE WHEN b_en >= b_es AND b_en >= b_zh THEN 'en'
                  WHEN b_es >= b_zh THEN 'es' ELSE 'zh' END AS gb,
             CASE WHEN c_en >= c_es AND c_en >= c_zh THEN 'en'
                  WHEN c_es >= c_zh THEN 'es' ELSE 'zh' END AS gc
      FROM sc)
"""

_MARKERS_A = {
    "en": ("the", "and", "of", "row", "table"),
    "es": ("el", "la", "de", "fila", "tabla"),
    "zh": ("zh", "biao", "hang", "lie", "shuju"),
}
_MARKERS_B = {
    "en": ("the", "and", "of"),
    "es": ("el", "la", "de"),
    "zh": ("zh", "biao", "hang"),
}
_MARKERS_C = {"en": ("the",), "es": ("de",), "zh": ("zh",)}


def _langid_pred_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lang + per-rule argmax guesses ga/gb/gc from ONE token scan."""
    tk = tokens("text")

    def score(markers):
        return {
            lang: F.size(F.filter(tk, lambda x: x.isin(*words)))
            for lang, words in markers.items()
        }

    def argmax(s, prefix):
        return (
            F.when((s["en"] >= s["es"]) & (s["en"] >= s["zh"]), F.lit("en"))
            .when(s["es"] >= s["zh"], F.lit("es"))
            .otherwise(F.lit("zh"))
            .alias(prefix)
        )

    sa, sb, sc = (
        score(_MARKERS_A),
        score(_MARKERS_B),
        score(_MARKERS_C),
    )
    return t(spark, sf_dir, "documents").select(
        "lang", argmax(sa, "ga"), argmax(sb, "gb"), argmax(sc, "gc")
    )


@register(
    "q278_cochran_q",
    oracle=f"""
    WITH {_LANGID_PRED_SQL.strip()},
    x AS (
      SELECT CASE WHEN ga = lang THEN 1 ELSE 0 END AS xa,
             CASE WHEN gb = lang THEN 1 ELSE 0 END AS xb,
             CASE WHEN gc = lang THEN 1 ELSE 0 END AS xc
      FROM pred),
    c AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(xa) AS BIGINT) AS g_a,
             CAST(sum(xb) AS BIGINT) AS g_b,
             CAST(sum(xc) AS BIGINT) AS g_c,
             CAST(sum(xa + xb + xc) AS BIGINT) AS s1,
             CAST(sum((xa + xb + xc) * (xa + xb + xc)) AS BIGINT) AS s2
      FROM x)
    SELECT n, g_a, g_b, g_c, s1, s2,
           CAST(CASE WHEN 3 * s1 - s2 > 0 THEN
             round(1000.0 * (2.0 * (3.0 * (g_a * g_a + g_b * g_b
               + g_c * g_c) - CAST(s1 AS DOUBLE) * s1))
               / (3 * s1 - s2))
             ELSE 0 END AS BIGINT) AS cochran_q_milli
    FROM c
    """,
    doc="COCHRAN'S Q TEST across THREE paired lang-id rules on the same "
    "documents — the k-treatment generalization of q277's McNemar "
    "(k=2 Cochran reduces to it): rules A/B/C are the 5-marker, "
    "3-marker and 1-marker argmax variants, Q = (k-1)(k*Sum G_j^2 - "
    "S1^2)/(k*S1 - S2) with column totals G_j, S1 = Sum R_i, "
    "S2 = Sum R_i^2 over per-doc success counts R_i. Exactness: ONE "
    "token scan scores all nine marker sets in-row; every total is "
    "an int64 conditional sum; the statistic is one double ratio of "
    "integer-derived operands, milli-quantized, guarded at the "
    "degenerate 3*S1 = S2 (all rows unanimous) case. Scale: the scan "
    "folds map-side to one row — chi^2_2 critical value 5.99 then "
    "ranks the three rules at ANY corpus size.",
    tags=("llm", "text", "eval", "cochran-q", "paired-test", "scale"),
)
def q278_cochran_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    x = _langid_pred_frame(spark, sf_dir).select(
        F.when(F.col("ga") == F.col("lang"), 1).otherwise(0).alias("xa"),
        F.when(F.col("gb") == F.col("lang"), 1).otherwise(0).alias("xb"),
        F.when(F.col("gc") == F.col("lang"), 1).otherwise(0).alias("xc"),
    )
    c = x.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("xa").cast("long").alias("g_a"),
        F.sum("xb").cast("long").alias("g_b"),
        F.sum("xc").cast("long").alias("g_c"),
        F.sum(F.col("xa") + F.col("xb") + F.col("xc"))
        .cast("long")
        .alias("s1"),
        F.sum(
            (F.col("xa") + F.col("xb") + F.col("xc"))
            * (F.col("xa") + F.col("xb") + F.col("xc"))
        )
        .cast("long")
        .alias("s2"),
    )
    return c.select(
        "n",
        "g_a",
        "g_b",
        "g_c",
        "s1",
        "s2",
        F.expr(
            "CAST(CASE WHEN 3 * s1 - s2 > 0 THEN"
            " round(1000.0 * (2.0 * (3.0 * (g_a * g_a + g_b * g_b"
            " + g_c * g_c) - CAST(s1 AS DOUBLE) * s1))"
            " / (3 * s1 - s2))"
            " ELSE 0 END AS BIGINT)"
        ).alias("cochran_q_milli"),
    )


@register(
    "q279_cohen_kappa",
    oracle=f"""
    WITH {_LANGID_PRED_SQL.strip()},
    c AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CASE WHEN ga = gc THEN 1 ELSE 0 END) AS BIGINT)
               AS agree,
             CAST(sum(CASE WHEN ga = 'en' THEN 1 ELSE 0 END) AS BIGINT)
               AS a_en,
             CAST(sum(CASE WHEN ga = 'es' THEN 1 ELSE 0 END) AS BIGINT)
               AS a_es,
             CAST(sum(CASE WHEN ga = 'zh' THEN 1 ELSE 0 END) AS BIGINT)
               AS a_zh,
             CAST(sum(CASE WHEN gc = 'en' THEN 1 ELSE 0 END) AS BIGINT)
               AS c_en,
             CAST(sum(CASE WHEN gc = 'es' THEN 1 ELSE 0 END) AS BIGINT)
               AS c_es,
             CAST(sum(CASE WHEN gc = 'zh' THEN 1 ELSE 0 END) AS BIGINT)
               AS c_zh
      FROM pred)
    SELECT n, agree,
           CAST(CAST(a_en AS DOUBLE) * c_en + CAST(a_es AS DOUBLE) * c_es
                + CAST(a_zh AS DOUBLE) * c_zh AS BIGINT) AS pe_num,
           CAST(CASE WHEN CAST(n AS DOUBLE) * n
                  > CAST(a_en AS DOUBLE) * c_en + CAST(a_es AS DOUBLE) * c_es
                    + CAST(a_zh AS DOUBLE) * c_zh
             THEN round(1000.0 * (CAST(n AS DOUBLE) * agree
               - (CAST(a_en AS DOUBLE) * c_en + CAST(a_es AS DOUBLE) * c_es
                  + CAST(a_zh AS DOUBLE) * c_zh))
               / (CAST(n AS DOUBLE) * n
                  - (CAST(a_en AS DOUBLE) * c_en + CAST(a_es AS DOUBLE) * c_es
                     + CAST(a_zh AS DOUBLE) * c_zh)))
             ELSE 1000 END AS BIGINT) AS kappa_milli
    FROM c
    """,
    doc="COHEN'S KAPPA between the 5-marker and 1-marker lang-id rules "
    "— chance-corrected agreement (raw agreement is inflated when "
    "both raters over-predict the majority class): kappa = (n*agree "
    "- Sum_c rowA_c*rowC_c) / (n^2 - Sum_c rowA_c*rowC_c), the "
    "integer-cleared form of (po-pe)/(1-pe). Exactness: marginals "
    "and the diagonal are int64 conditional counts from the shared "
    "one-scan prediction frame; kappa is one double ratio of "
    "integer-derived operands, milli-quantized, guarded at pe = 1 "
    "(both raters constant — kappa pinned to 1000 with agreement "
    "then perfect by construction). Scale: folds map-side to one "
    "row at any corpus size.",
    tags=("llm", "text", "eval", "kappa", "agreement", "scale"),
)
def q279_cohen_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    pred = _langid_pred_frame(spark, sf_dir)

    def cnt(col, v, prefix):
        # prefix is explicit (not derived from the column spelling) so a
        # rename of the prediction columns fails loudly at the agg, not
        # as a confusing downstream expression error.
        return (
            F.sum(F.when(F.col(col) == v, 1).otherwise(0))
            .cast("long")
            .alias(f"{prefix}_{v}")
        )

    c = pred.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.when(F.col("ga") == F.col("gc"), 1).otherwise(0))
        .cast("long")
        .alias("agree"),
        cnt("ga", "en", "a"),
        cnt("ga", "es", "a"),
        cnt("ga", "zh", "a"),
        cnt("gc", "en", "c"),
        cnt("gc", "es", "c"),
        cnt("gc", "zh", "c"),
    )
    return c.select(
        "n",
        "agree",
        # every count product evaluates in DOUBLE (the q255/q289 overflow
        # rule: n*n and marginal products wrap int64 at n ~ 3e9 docs —
        # Spark silently, DuckDB with an error); pe_num stays exact as
        # long as each product < 2^53 and degrades gracefully past it
        F.expr(
            "CAST(CAST(a_en AS DOUBLE) * c_en + CAST(a_es AS DOUBLE) * c_es"
            " + CAST(a_zh AS DOUBLE) * c_zh AS BIGINT)"
        ).alias("pe_num"),
        F.expr(
            "CAST(CASE WHEN CAST(n AS DOUBLE) * n"
            " > CAST(a_en AS DOUBLE) * c_en + CAST(a_es AS DOUBLE) * c_es"
            "   + CAST(a_zh AS DOUBLE) * c_zh"
            " THEN round(1000.0 * (CAST(n AS DOUBLE) * agree"
            " - (CAST(a_en AS DOUBLE) * c_en + CAST(a_es AS DOUBLE) * c_es"
            "    + CAST(a_zh AS DOUBLE) * c_zh))"
            " / (CAST(n AS DOUBLE) * n"
            "    - (CAST(a_en AS DOUBLE) * c_en + CAST(a_es AS DOUBLE) * c_es"
            "       + CAST(a_zh AS DOUBLE) * c_zh)))"
            " ELSE 1000 END AS BIGINT)"
        ).alias("kappa_milli"),
    )


# --- q280: G-test keyness ---------------------------------------------------


@register(
    "q280_gtest_keyness",
    oracle="""
    WITH toks AS (
      SELECT CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS is_en, u.tok
      FROM documents,
           UNNEST(list_filter(regexp_split_to_array(lower(text),
                  '[^a-z0-9]+'), t -> t <> '')) AS u(tok)),
    cnt AS (
      SELECT tok,
             CAST(sum(is_en) AS BIGINT) AS cnt_en,
             CAST(sum(1 - is_en) AS BIGINT) AS cnt_rest
      FROM toks GROUP BY tok),
    tot AS (
      SELECT CAST(sum(cnt_en) AS BIGINT) AS na,
             CAST(sum(cnt_rest) AS BIGINT) AS nb
      FROM cnt),
    g AS (
      SELECT tok, cnt_en, cnt_rest,
             2 * (cnt_en * (CASE WHEN cnt_en > 0 THEN
                    CAST(round(1000000.0 * ln((CAST(cnt_en AS DOUBLE)
                      * (na + nb)) / (CAST(na AS DOUBLE)
                      * (cnt_en + cnt_rest)))) AS BIGINT) ELSE 0 END)
                + cnt_rest * (CASE WHEN cnt_rest > 0 THEN
                    CAST(round(1000000.0 * ln((CAST(cnt_rest AS DOUBLE)
                      * (na + nb)) / (CAST(nb AS DOUBLE)
                      * (cnt_en + cnt_rest)))) AS BIGINT) ELSE 0 END))
               AS g_micro
      FROM cnt, tot)
    SELECT tok, cnt_en, cnt_rest, g_micro
    FROM g
    ORDER BY g_micro DESC, tok
    LIMIT 20
    """,
    doc="G-TEST KEYNESS (Dunning log-likelihood): the 20 tokens most "
    "characteristic of the English sub-corpus vs the rest — the "
    "standard corpus-linguistics keyword extractor, and the "
    "significance-aware alternative to raw frequency ratio (which "
    "explodes on rare tokens): G = 2*Sum O*ln(O/E) over the 2-cell "
    "partition, E from the corpus marginals. Exactness: counts are "
    "int64 from ONE tokenize scan; each ln is quantized to integer "
    "micro-nats BEFORE the int64 count product (the standing q100 "
    "discipline — a 1-ulp libm difference only matters exactly on a "
    ".5 boundary), zero-count cells contribute the other side only; "
    "top-20 is TakeOrdered with the token tie-break. Scale: "
    "vocab-bounded grouped agg (map-side combinable) + a one-row "
    "broadcast total; per-partition top-k, never a global sort. "
    "Caveat noted: the double products O*N stay exact under 2^53 — "
    "beyond that the micro-nat quantization absorbs the ulp.",
    tags=("llm", "text", "keyness", "g-test", "scale"),
)
def q280_gtest_keyness(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents").select(
        F.when(F.col("lang") == "en", 1).otherwise(0).alias("is_en"),
        F.explode(tokens("text")).alias("tok"),
    )
    cnt = d.groupBy("tok").agg(
        F.sum("is_en").cast("long").alias("cnt_en"),
        F.sum(1 - F.col("is_en")).cast("long").alias("cnt_rest"),
    )
    tot = cnt.agg(
        F.sum("cnt_en").cast("long").alias("na"),
        F.sum("cnt_rest").cast("long").alias("nb"),
    )
    g = cnt.crossJoin(F.broadcast(tot)).select(
        "tok",
        "cnt_en",
        "cnt_rest",
        F.expr(
            "2 * (cnt_en * (CASE WHEN cnt_en > 0 THEN"
            " CAST(round(1000000.0 * ln((CAST(cnt_en AS DOUBLE)"
            " * (na + nb)) / (CAST(na AS DOUBLE)"
            " * (cnt_en + cnt_rest)))) AS BIGINT) ELSE 0 END)"
            " + cnt_rest * (CASE WHEN cnt_rest > 0 THEN"
            " CAST(round(1000000.0 * ln((CAST(cnt_rest AS DOUBLE)"
            " * (na + nb)) / (CAST(nb AS DOUBLE)"
            " * (cnt_en + cnt_rest)))) AS BIGINT) ELSE 0 END))"
        ).alias("g_micro"),
    )
    return g.orderBy(F.desc("g_micro"), "tok").limit(20)


# --- q285: Burrows' Delta stylometric distance ------------------------------

_BD_M = 30  # marker vocabulary: the corpus's top-M tokens


@register(
    "q285_burrows_delta",
    oracle=f"""
    WITH toks AS (
      SELECT source, u.tok
      FROM documents,
           UNNEST(list_filter(regexp_split_to_array(lower(text),
                  '[^a-z0-9]+'), t -> t <> '')) AS u(tok)),
    cnt AS (
      SELECT source, tok, CAST(count(*) AS BIGINT) AS c
      FROM toks GROUP BY 1, 2),
    marker AS (
      SELECT tok FROM (
        SELECT tok, sum(c) AS tot FROM cnt GROUP BY tok
        ORDER BY tot DESC, tok LIMIT {_BD_M})),
    srctot AS (
      SELECT source, CAST(sum(c) AS BIGINT) AS nt
      FROM cnt GROUP BY source),
    grid AS (
      SELECT s.source, m.tok, s.nt,
             CAST(coalesce(c.c, 0) AS BIGINT) AS c
      FROM srctot s CROSS JOIN marker m
      LEFT JOIN cnt c ON c.source = s.source AND c.tok = m.tok),
    f AS (
      SELECT source, tok,
             CAST(round(1000000.0 * c / nt) AS BIGINT) AS f_micro
      FROM grid),
    mstat AS (
      SELECT tok,
             CAST(count(*) AS BIGINT) AS m,
             CAST(sum(f_micro) AS BIGINT) AS sf,
             CAST(sum(f_micro * f_micro) AS BIGINT) AS sf2
      FROM f GROUP BY tok),
    z AS (
      SELECT f.source, f.tok,
             CASE WHEN ms.m > 1 AND ms.m * ms.sf2 > ms.sf * ms.sf THEN
               CAST(round(1000.0
                 * (CAST(f.f_micro AS DOUBLE) - CAST(ms.sf AS DOUBLE) / ms.m)
                 / sqrt(CAST(ms.m * ms.sf2 - ms.sf * ms.sf AS DOUBLE)
                        / (CAST(ms.m AS DOUBLE) * (ms.m - 1)))) AS BIGINT)
             ELSE 0 END AS z_milli
      FROM f JOIN mstat ms ON ms.tok = f.tok),
    pairs AS (
      SELECT a.source AS s1, b.source AS s2,
             CAST(sum(abs(a.z_milli - b.z_milli)) AS BIGINT) AS sum_abs
      FROM z a JOIN z b ON a.tok = b.tok AND a.source < b.source
      GROUP BY 1, 2)
    SELECT s1, s2, sum_abs,
           CAST(round(CAST(sum_abs AS DOUBLE) / {_BD_M}) AS BIGINT)
             AS delta_milli
    FROM pairs
    ORDER BY s1, s2
    """,
    doc=f"BURROWS' DELTA stylometric distance between sources — the "
    "standard authorship/register attribution measure (mean |z| "
    "difference over the top-{m} marker tokens' relative "
    "frequencies, z-scored across sources): which sources 'write "
    "alike'? Complements q280's keyness (which finds WHAT differs; "
    "Delta says HOW FAR apart two registers sit) and q235's raw "
    "vocab overlap (Delta is frequency-profile, not set, based). "
    "ONE tokenize scan folds to the (source x token) count relation; "
    "the top-{m} marker vocab is a TakeOrdered on the vocab-bounded "
    "rollup; everything downstream (dense source x marker grid, "
    "per-marker mean/std, z, pairwise fold) runs on |sources| x {m} "
    "rows. Exactness: relative frequencies quantized to micro from "
    "int64 counts; per-marker mean/std from exact int64 sums of "
    "those; z quantized to milli before the pairwise |z1-z2| sums "
    "(int64); sqrt and the two divisions are single IEEE double ops. "
    "sigma=0 markers contribute z=0 on both engines (guard). Scale: "
    "pair space is |sources|^2 x {m} on a broadcast-size relation — "
    "never a document-level pair join.".replace("{m}", str(_BD_M)),
    tags=("llm", "text", "stylometry", "burrows-delta", "scale"),
)
def q285_burrows_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    cnt = (
        t(spark, sf_dir, "documents")
        .select("source", F.explode(tokens("text")).alias("tok"))
        .groupBy("source", "tok")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    marker = (
        cnt.groupBy("tok")
        .agg(F.sum("c").alias("tot"))
        .orderBy(F.desc("tot"), "tok")
        .limit(_BD_M)
        .select("tok")
    )
    srctot = cnt.groupBy("source").agg(F.sum("c").cast("long").alias("nt"))
    grid = (
        srctot.crossJoin(F.broadcast(marker))
        .join(cnt, ["source", "tok"], "left")
        .select(
            "source",
            "tok",
            F.expr(
                "CAST(round(1000000.0 * coalesce(c, 0) / nt) AS BIGINT)"
            ).alias("f_micro"),
        )
    )
    mstat = grid.groupBy("tok").agg(
        F.count(F.lit(1)).cast("long").alias("m"),
        F.sum("f_micro").cast("long").alias("sf"),
        F.sum(F.col("f_micro") * F.col("f_micro")).cast("long").alias("sf2"),
    )
    z = grid.join(F.broadcast(mstat), "tok").select(
        "source",
        "tok",
        F.expr(
            "CASE WHEN m > 1 AND m * sf2 > sf * sf THEN"
            " CAST(round(1000.0"
            " * (CAST(f_micro AS DOUBLE) - CAST(sf AS DOUBLE) / m)"
            " / sqrt(CAST(m * sf2 - sf * sf AS DOUBLE)"
            " / (CAST(m AS DOUBLE) * (m - 1)))) AS BIGINT)"
            " ELSE 0 END"
        ).alias("z_milli"),
    )
    za = z.select(
        F.col("source").alias("s1"), "tok", F.col("z_milli").alias("z1")
    )
    zb = z.select(
        F.col("source").alias("s2"), "tok", F.col("z_milli").alias("z2")
    )
    pairs = (
        za.join(F.broadcast(zb), "tok")
        .where(F.col("s1") < F.col("s2"))
        .groupBy("s1", "s2")
        .agg(F.sum(F.abs(F.col("z1") - F.col("z2"))).cast("long").alias("sum_abs"))
    )
    return pairs.select(
        "s1",
        "s2",
        "sum_abs",
        F.expr(
            f"CAST(round(CAST(sum_abs AS DOUBLE) / {_BD_M}) AS BIGINT)"
        ).alias("delta_milli"),
    ).orderBy("s1", "s2")


# --- q294: keyword-in-context (KWIC) concordance -----------------------------

_KWIC_TERMS = ("data", "row", "table")
_KWIC_W = 2  # context tokens each side


@register(
    "q294_kwic_concordance",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, list_filter(regexp_split_to_array(lower(text),
             '[^a-z0-9]+'), t -> t <> '') AS tk
      FROM documents),
    pos AS (
      SELECT doc_id, tk, u.i
      FROM toks,
           LATERAL unnest(generate_series(1, len(tk))) AS u(i)
      WHERE tk[i] IN {str(tuple(_KWIC_TERMS))})
    SELECT doc_id, CAST(i AS BIGINT) AS pos, tk[i] AS term,
           coalesce(array_to_string(
             tk[greatest(i - {_KWIC_W}, 1):i - 1], ' '), '') AS left_ctx,
           coalesce(array_to_string(
             tk[i + 1:least(i + {_KWIC_W}, len(tk))], ' '), '') AS right_ctx
    FROM pos
    ORDER BY doc_id, pos
    """,
    doc="KEYWORD-IN-CONTEXT concordance — the corpus-inspection tool "
    "every keyness hit (q280) gets pasted into: for each occurrence "
    f"of the probe terms {_KWIC_TERMS} emit the 1-based token "
    f"position and {_KWIC_W} tokens of context each side, so a "
    "curator reads HOW a term is used, not just how often. ONE "
    "tokenize scan; posexplode over the retained token array keeps "
    "the context slices as in-row array ops (slice + array_join in "
    "codegen — no self-join back to the document, no second scan); "
    "the term filter collapses the fan-out to matching positions "
    "only. Exactness: pure integer positions and string slices — "
    "the engines agree exactly (window clamps via greatest/least "
    "mirror DuckDB's inclusive 1-based list slicing). Scale: output "
    "is occurrence-bounded; everything is per-row codegen after the "
    "explode, no shuffle at all until the driver's presentation "
    "sort.",
    tags=("llm", "text", "kwic", "concordance", "scale"),
)
def q294_kwic_concordance(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents").select(
        "doc_id", tokens("text").alias("tk")
    )
    e = d.select(
        "doc_id", "tk", F.posexplode("tk").alias("p0", "term")
    ).where(F.col("term").isin(*_KWIC_TERMS))
    w = _KWIC_W
    return e.select(
        "doc_id",
        (F.col("p0") + 1).cast("long").alias("pos"),
        "term",
        F.expr(
            f"array_join(slice(tk, greatest(p0 + 1 - {w}, 1),"
            f" (p0 + 1 - 1) - greatest(p0 + 1 - {w}, 1) + 1), ' ')"
        ).alias("left_ctx"),
        F.expr(
            f"array_join(slice(tk, p0 + 2,"
            f" least(p0 + 1 + {w}, size(tk)) - (p0 + 2) + 1), ' ')"
        ).alias("right_ctx"),
    ).orderBy("doc_id", "pos")


# --- q295: held-out bigram perplexity per source ------------------------------


@register(
    "q295_heldout_perplexity",
    oracle="""
    WITH toks AS (
      SELECT doc_id, source,
             list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                         t -> t <> '') AS tk
      FROM documents),
    tr_tok AS (
      SELECT u.tok FROM toks,
           UNNEST(tk) AS u(tok)
      WHERE CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))
              AS BIGINT) % 10 <> 0),
    vocab AS (SELECT DISTINCT tok FROM tr_tok),
    vs AS (SELECT CAST(count(*) + 1 AS BIGINT) AS v FROM vocab),
    tr_bg AS (
      SELECT tk[i] AS w1, tk[i + 1] AS w2,
             CAST(count(*) AS BIGINT) AS c12
      FROM toks, LATERAL unnest(generate_series(1, len(tk) - 1)) AS u(i)
      WHERE CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))
              AS BIGINT) % 10 <> 0
      GROUP BY 1, 2),
    tr_uni AS (
      SELECT w1, CAST(sum(c12) AS BIGINT) AS c1
      FROM tr_bg GROUP BY 1),
    te_pos AS (
      SELECT t.doc_id, t.source, u.i, tk[u.i] AS tok0
      FROM toks t,
           LATERAL unnest(generate_series(1, len(tk))) AS u(i)
      WHERE CAST(('0x' || substr(md5(CAST(t.doc_id AS VARCHAR)), 1, 4))
              AS BIGINT) % 10 = 0),
    te_tok AS (
      SELECT p.doc_id, p.source, p.i,
             CASE WHEN v.tok IS NULL THEN '<unk>' ELSE p.tok0 END AS tok,
             CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END AS oov
      FROM te_pos p LEFT JOIN vocab v ON v.tok = p.tok0),
    te_bg AS (
      SELECT a.source, a.tok AS w1, b.tok AS w2, a.oov + b.oov AS oov
      FROM te_tok a JOIN te_tok b
        ON b.doc_id = a.doc_id AND b.i = a.i + 1),
    scored AS (
      SELECT g.source, g.oov,
             CAST(round(1000000.0 * ln(
               (CAST(coalesce(bg.c12, 0) + 1 AS DOUBLE))
               / (coalesce(un.c1, 0) + vs.v))) AS BIGINT) AS logp_micro
      FROM te_bg g
      CROSS JOIN vs
      LEFT JOIN tr_bg bg ON bg.w1 = g.w1 AND bg.w2 = g.w2
      LEFT JOIN tr_uni un ON un.w1 = g.w1)
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_bigrams,
           CAST(sum(CASE WHEN oov > 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_oov_bigrams,
           CAST(sum(logp_micro) AS BIGINT) AS sum_logp_micro,
           CAST(round(1000.0 * exp(-(CAST(sum(logp_micro) AS DOUBLE)
                / 1000000.0) / count(*))) AS BIGINT) AS ppl_milli
    FROM scored
    GROUP BY source
    ORDER BY source
    """,
    doc="HELD-OUT BIGRAM PERPLEXITY per source — the eval-side LM "
    "discipline q100's in-corpus scorer skips: train an add-one "
    "bigram LM on a 90% md5-hash split (the q87 16-bit-uniform rule — "
    "the modulus split correlates with the synthetic source "
    "assignment and starves per-source rows), score the 10% held-out docs with unseen tokens "
    "mapped to <unk> (vocab+1 smoothing mass), report per-source "
    "perplexity — the number that says WHICH source's text the "
    "corpus model explains worst (a drift/quality signal no "
    "frequency ratio gives). Exactness: every ln((c12+1)/(c1+V)) is "
    "quantized to integer micro-nats per test bigram BEFORE the "
    "int64 sum (q100/q203 discipline); history counts c1 are the "
    "bigram-table marginal (train-final tokens are never histories, "
    "consistent on both engines); ppl is one exp on the exact "
    "sums, rounded to milli. Scale: train tables are vocab-bounded "
    "grouped aggs; test bigrams re-assemble via the (doc, pos) "
    "offset equi-join (the q236 shape, fan-out exactly 1); scoring "
    "is two equi-joins against broadcastable vocab-sized relations.",
    tags=("llm", "text", "lm", "perplexity", "eval", "scale"),
)
def q295_heldout_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents").select(
        "doc_id", "source", tokens("text").alias("tk")
    )
    split = F.expr(
        "CAST(conv(substr(md5(CAST(doc_id AS STRING)), 1, 4), 16, 10)"
        " AS BIGINT) % 10"
    )
    tr = d.where(split != 0)
    vocab = (
        tr.select(F.explode("tk").alias("tok")).distinct().localCheckpoint(
            eager=False
        )
    )
    vs = vocab.agg((F.count(F.lit(1)) + 1).cast("long").alias("v"))
    # Bigram assembly is a NARROW array transform (tk[i], tk[i+1]) —
    # the old posexplode + (doc_id, i+1) self-join shuffled every token
    # twice to recover adjacency the array already has (guide §2.4:
    # remove shuffles outright). Docs with < 2 tokens yield no bigrams
    # on either path, so the size guard changes nothing.
    bigrams = F.expr(
        "transform(sequence(0, size(tk) - 2),"
        " i -> struct(tk[i] AS w1, tk[i + 1] AS w2))"
    )
    tr_bg = (
        tr.where(F.size("tk") >= 2)
        .select(F.explode(bigrams).alias("bg"))
        .groupBy(
            F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("c12"))
        .localCheckpoint(eager=False)
    )
    tr_uni = tr_bg.groupBy("w1").agg(F.sum("c12").cast("long").alias("c1"))
    # Test bigrams: same narrow assembly, then TWO broadcast vocab
    # lookups (one per endpoint) replace the old explode → broadcast
    # lookup → token-level self-join chain.
    te_bg = (
        d.where(split == 0)
        .where(F.size("tk") >= 2)
        .select("source", F.explode(bigrams).alias("bg"))
        .select(
            "source",
            F.col("bg.w1").alias("tok_a"),
            F.col("bg.w2").alias("tok_b"),
        )
        .join(
            F.broadcast(
                vocab.select(
                    F.col("tok").alias("tok_a"), F.lit(1).alias("seen_a")
                )
            ),
            "tok_a",
            "left",
        )
        .join(
            F.broadcast(
                vocab.select(
                    F.col("tok").alias("tok_b"), F.lit(1).alias("seen_b")
                )
            ),
            "tok_b",
            "left",
        )
        .select(
            "source",
            F.when(F.col("seen_a").isNull(), F.lit("<unk>"))
            .otherwise(F.col("tok_a"))
            .alias("w1"),
            F.when(F.col("seen_b").isNull(), F.lit("<unk>"))
            .otherwise(F.col("tok_b"))
            .alias("w2"),
            (
                F.when(F.col("seen_a").isNull(), 1).otherwise(0)
                + F.when(F.col("seen_b").isNull(), 1).otherwise(0)
            ).alias("oov"),
        )
    )
    scored = (
        te_bg.crossJoin(F.broadcast(vs))
        .join(F.broadcast(tr_bg), ["w1", "w2"], "left")
        .join(F.broadcast(tr_uni), "w1", "left")
        .select(
            "source",
            "oov",
            F.expr(
                "CAST(round(1000000.0 * ln("
                " (CAST(coalesce(c12, 0) + 1 AS DOUBLE))"
                " / (coalesce(c1, 0) + v))) AS BIGINT)"
            ).alias("logp_micro"),
        )
    )
    return (
        scored.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_bigrams"),
            F.sum(F.when(F.col("oov") > 0, 1).otherwise(0))
            .cast("long")
            .alias("n_oov_bigrams"),
            F.sum("logp_micro").cast("long").alias("sum_logp_micro"),
        )
        .select(
            "source",
            "n_bigrams",
            "n_oov_bigrams",
            "sum_logp_micro",
            F.expr(
                "CAST(round(1000.0 * exp(-(CAST(sum_logp_micro AS DOUBLE)"
                " / 1000000.0) / n_bigrams)) AS BIGINT)"
            ).alias("ppl_milli"),
        )
        .orderBy("source")
    )


# --- q309: per-source macro-F1 of the lang-id rule ----------------------------


@register(
    "q309_langid_macro_f1",
    oracle="""
    WITH sc AS (
      SELECT source, lang,
             len(list_filter(regexp_split_to_array(lower(text),
                 '[^a-z0-9]+'), t -> t IN ('the','and','of','row','table')))
               AS s_en,
             len(list_filter(regexp_split_to_array(lower(text),
                 '[^a-z0-9]+'), t -> t IN ('el','la','de','fila','tabla')))
               AS s_es,
             len(list_filter(regexp_split_to_array(lower(text),
                 '[^a-z0-9]+'), t -> t IN ('zh','biao','hang','lie','shuju')))
               AS s_zh
      FROM documents),
    pred AS (
      SELECT source, lang,
             CASE WHEN s_en >= s_es AND s_en >= s_zh THEN 'en'
                  WHEN s_es >= s_zh THEN 'es' ELSE 'zh' END AS g
      FROM sc),
    cls AS (
      SELECT pred.source, c.c,
             CAST(sum(CASE WHEN lang = c.c AND g = c.c
                      THEN 1 ELSE 0 END) AS BIGINT) AS tp,
             CAST(sum(CASE WHEN lang <> c.c AND g = c.c
                      THEN 1 ELSE 0 END) AS BIGINT) AS fp,
             CAST(sum(CASE WHEN lang = c.c AND g <> c.c
                      THEN 1 ELSE 0 END) AS BIGINT) AS fn
      FROM pred CROSS JOIN (SELECT unnest(['en','es','zh']) AS c) c
      GROUP BY 1, 2),
    f1 AS (
      SELECT source, c,
             CASE WHEN 2 * tp + fp + fn > 0 THEN
               CAST(round(1000000.0 * (2 * tp)
                    / (2 * tp + fp + fn)) AS BIGINT)
             ELSE 0 END AS f1_micro
      FROM cls),
    per AS (
      SELECT source,
             CAST(round(CAST(sum(f1_micro) AS DOUBLE) / count(*))
                  AS BIGINT) AS macro_f1_micro
      FROM f1 GROUP BY source),
    acc AS (
      SELECT source, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CASE WHEN g = lang THEN 1 ELSE 0 END) AS BIGINT)
               AS n_correct
      FROM pred GROUP BY source)
    SELECT acc.source, acc.n, acc.n_correct,
           CAST(round(1000.0 * acc.n_correct / acc.n) AS BIGINT)
             AS accuracy_milli,
           per.macro_f1_micro
    FROM acc JOIN per ON per.source = acc.source
    ORDER BY acc.source
    """,
    doc="PER-SOURCE MACRO-F1 of the marker lang-id rule — the summary "
    "metric an evaluator quotes from q220's confusion matrix: "
    "per-class F1 = 2TP/(2TP+FP+FN) over {en, es, zh}, averaged "
    "unweighted (macro — the class-imbalance-honest aggregate; "
    "micro-F1 for single-label multiclass IS accuracy, reported "
    "alongside as accuracy_milli). Which SOURCES does the rule "
    "serve worst? — the per-slice view q220's global matrix "
    "aggregates away. Exactness: TP/FP/FN are int64 from ONE scan "
    "(the q277/q278 in-row HOF scoring, argmax ties broken "
    "en > es > zh on both engines); each class F1 is quantized to "
    "micro BEFORE the 3-way macro mean; accuracy is one rounded "
    "division. Scale: the scan folds map-side onto |sources| x 3 "
    "cells; everything after is arithmetic on that bounded "
    "relation.",
    tags=("llm", "text", "langid", "f1", "eval", "scale"),
)
def q309_langid_macro_f1(spark: SparkSession, sf_dir: str) -> DataFrame:
    tk = tokens("text")
    sc = t(spark, sf_dir, "documents").select(
        "source",
        "lang",
        F.size(
            F.filter(tk, lambda x: x.isin("the", "and", "of", "row", "table"))
        ).alias("s_en"),
        F.size(
            F.filter(tk, lambda x: x.isin("el", "la", "de", "fila", "tabla"))
        ).alias("s_es"),
        F.size(
            F.filter(
                tk, lambda x: x.isin("zh", "biao", "hang", "lie", "shuju")
            )
        ).alias("s_zh"),
    )
    pred = sc.select(
        "source",
        "lang",
        F.when(
            (F.col("s_en") >= F.col("s_es"))
            & (F.col("s_en") >= F.col("s_zh")),
            F.lit("en"),
        )
        .when(F.col("s_es") >= F.col("s_zh"), F.lit("es"))
        .otherwise(F.lit("zh"))
        .alias("g"),
    ).localCheckpoint(eager=False)
    cls = (
        pred.crossJoin(
            F.broadcast(
                spark.createDataFrame([("en",), ("es",), ("zh",)], "c string")
            )
        )
        .groupBy("source", "c")
        .agg(
            F.sum(
                F.when((F.col("lang") == F.col("c"))
                       & (F.col("g") == F.col("c")), 1).otherwise(0)
            )
            .cast("long")
            .alias("tp"),
            F.sum(
                F.when((F.col("lang") != F.col("c"))
                       & (F.col("g") == F.col("c")), 1).otherwise(0)
            )
            .cast("long")
            .alias("fp"),
            F.sum(
                F.when((F.col("lang") == F.col("c"))
                       & (F.col("g") != F.col("c")), 1).otherwise(0)
            )
            .cast("long")
            .alias("fn"),
        )
    )
    f1 = cls.select(
        "source",
        F.expr(
            "CASE WHEN 2 * tp + fp + fn > 0 THEN"
            " CAST(round(1000000.0 * (2 * tp)"
            " / (2 * tp + fp + fn)) AS BIGINT)"
            " ELSE 0 END"
        ).alias("f1_micro"),
    )
    per = f1.groupBy("source").agg(
        F.expr(
            "CAST(round(CAST(sum(f1_micro) AS DOUBLE) / count(*))"
            " AS BIGINT)"
        ).alias("macro_f1_micro")
    )
    acc = pred.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.when(F.col("g") == F.col("lang"), 1).otherwise(0))
        .cast("long")
        .alias("n_correct"),
    )
    return (
        acc.join(per, "source")
        .select(
            "source",
            "n",
            "n_correct",
            F.expr(
                "CAST(round(1000.0 * n_correct / n) AS BIGINT)"
            ).alias("accuracy_milli"),
            "macro_f1_micro",
        )
        .orderBy("source")
    )


# --- q312: URL canonicalization + host rollup --------------------------------
#
# The canonicalization chain is GENERATED once and rendered for both
# engines (engine-specific array-function names substituted), so the
# Spark columns and the DuckDB CTE layers evaluate the identical
# expression text — the same shared-chain discipline the micro-quantized
# float queries use, applied to string surgery.

_URL_DIRTY_SQL = (
    "CASE CAST(doc_id % 4 AS INT) "
    "WHEN 0 THEN 'https://WWW.' || source || '.Example.com/Page/' "
    "|| CAST(doc_id AS STRING) || '/' "
    "WHEN 1 THEN 'HTTP://' || source || '.example.COM:80/page/' "
    "|| CAST(doc_id AS STRING) || '?utm_source=feed&ref=' "
    "|| CAST(doc_id % 7 AS STRING) "
    "WHEN 2 THEN 'https://' || source || '.example.com:443/page/' "
    "|| CAST(doc_id AS STRING) || '?id=' || CAST(doc_id AS STRING) "
    "|| '&utm_campaign=x#frag' "
    "ELSE 'http://m.' || source || '.example.com/page/' "
    "|| CAST(doc_id AS STRING) || '?b=2&a=1' END"
)


def _url_canon_steps(engine: str) -> list[tuple[str, str]]:
    """Ordered (column, SQL-expression) canonicalization steps.

    *engine* is ``"duck"`` or ``"spark"`` — only the array-function
    names differ; every scalar step is byte-identical.
    """
    duck = engine == "duck"
    filt = "list_filter" if duck else "filter"
    sort = "list_sort" if duck else "array_sort"
    join = "array_to_string" if duck else "array_join"
    splitarr = "string_split" if duck else "split"
    return [
        ("scheme", "lower(split_part(url, '://', 1))"),
        ("rest", "split_part(url, '://', 2)"),
        ("nofrag", "split_part(rest, '#', 1)"),
        ("hostport", "split_part(nofrag, '/', 1)"),
        ("rawhost", "lower(split_part(hostport, ':', 1))"),
        ("port", "split_part(hostport, ':', 2)"),
        # the + quantifier keeps the rule IDEMPOTENT: www.m.ex.net
        # must fold to ex.net in one pass, not via two different
        # canonical forms (caught by the differential grid test)
        ("host", "regexp_replace(rawhost, '^((www|m)\\.)+', '')"),
        (
            "portpart",
            "CASE WHEN port = '' OR (scheme = 'http' AND port = '80') "
            "OR (scheme = 'https' AND port = '443') "
            "THEN '' ELSE ':' || port END",
        ),
        ("pathq", "substr(nofrag, length(hostport) + 1)"),
        ("path0", "split_part(pathq, '?', 1)"),
        ("path1", "CASE WHEN path0 = '' THEN '/' ELSE path0 END"),
        (
            "path",
            "CASE WHEN length(path1) > 1 AND path1 LIKE '%/' "
            "THEN substr(path1, 1, length(path1) - 1) ELSE path1 END",
        ),
        ("qs", "split_part(pathq, '?', 2)"),
        (
            "keep",
            f"{join}({sort}({filt}({splitarr}(qs, '&'), "
            "p -> substr(p, 1, 4) <> 'utm_')), '&')",
        ),
        (
            "canon_url",
            "scheme || '://' || host || portpart || path "
            "|| CASE WHEN keep <> '' THEN '?' || keep ELSE '' END",
        ),
    ]


def _url_canon_oracle() -> str:
    layers = ["u0 AS (SELECT doc_id, n_chars, "
              f"{_URL_DIRTY_SQL} AS url FROM documents)"]
    prev = "u0"
    for i, (col, expr) in enumerate(_url_canon_steps("duck"), start=1):
        layers.append(f"u{i} AS (SELECT *, {expr} AS {col} FROM {prev})")
        prev = f"u{i}"
    return (
        "WITH " + ",\n    ".join(layers) + f""",
    rollup AS (
      SELECT host,
             CAST(count(*) AS BIGINT) AS n_docs,
             CAST(count(DISTINCT canon_url) AS BIGINT) AS n_urls,
             CAST(sum(CASE WHEN scheme = 'https' THEN 1 ELSE 0 END)
                  AS BIGINT) AS https_docs,
             CAST(sum(n_chars) AS BIGINT) AS sum_chars,
             CAST(min(('0x' || substr(md5(canon_url), 1, 15))::BIGINT)
                  AS BIGINT) AS min_h
      FROM {prev}
      GROUP BY host),
    sample AS (
      SELECT u.host, min(u.canon_url) AS sample_url
      FROM {prev} u
      JOIN rollup r ON u.host = r.host
        AND ('0x' || substr(md5(u.canon_url), 1, 15))::BIGINT = r.min_h
      GROUP BY u.host)
    SELECT r.host, r.n_docs, r.n_urls, r.https_docs, r.sum_chars,
           s.sample_url
    FROM rollup r JOIN sample s ON r.host = s.host
    ORDER BY r.host
    """
    )


@register(
    "q312_url_canonicalize",
    oracle=_url_canon_oracle(),
    doc="URL CANONICALIZATION + host-level rollup — the CommonCrawl-"
    "style ingest step every web-scale training-data pipeline runs "
    "before URL-keyed dedup: lowercase scheme/host, strip default "
    "ports (http:80 / https:443, non-default preserved), drop "
    "fragments, strip www./m. host prefixes, drop utm_* tracking "
    "params, SORT the surviving query params (param-order-insensitive "
    "key), trim trailing path slashes. Dirty URLs are derived "
    "deterministically from (doc_id, source) — four dirt patterns "
    "covering every rule — because the synthetic corpus carries no "
    "URL column; the operator under test is the canonicalization "
    "chain, which is code-GENERATED once and rendered for both "
    "engines (only array-function NAMES differ). Rollup: per "
    "canonical host, doc/distinct-URL counts, scheme mix, byte mass. "
    "Scale: pure per-row string expressions (whole-stage codegen, no "
    "UDF, no shuffle until the host rollup) followed by one hash "
    "aggregate on a low-cardinality key; count(DISTINCT canon_url) "
    "expands to the standard two-level agg — no single-partition "
    "bottleneck. The sample-URL slot deliberately aggregates the "
    "60-bit URL hash (long buffer, stays HashAggregate) instead of "
    "min(STRING) (which demotes the whole rollup to SortAggregate — "
    "string agg buffers are not hash-mutable), then recovers the "
    "URL from the min-hash row; ties pin via min-url.",
    tags=("text", "llm", "url", "canonicalize", "scale"),
)
def q312_url_canonicalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents").select(
        "doc_id", "n_chars", "source", F.expr(_URL_DIRTY_SQL).alias("url")
    )
    for col, expr in _url_canon_steps("spark"):
        d = d.withColumn(col, F.expr(expr))
    # min(STRING) would force SortAggregate (string agg buffers are not
    # hash-agg mutable) — the hot rollup instead takes min over the
    # 60-bit URL hash (long buffer, HashAggregate) and the sample URL is
    # recovered by probing the min-hash row per host and reducing the
    # handful of matches (min-url tie-break pins hash collisions).
    rollup = d.groupBy("host").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.countDistinct("canon_url").cast("long").alias("n_urls"),
        F.sum(F.when(F.col("scheme") == "https", 1).otherwise(0))
        .cast("long")
        .alias("https_docs"),
        F.sum("n_chars").cast("long").alias("sum_chars"),
        F.min(hex_hash("canon_url")).cast("long").alias("min_h"),
    )
    sample = (
        d.select("host", "canon_url")
        .join(
            F.broadcast(rollup.select("host", "min_h")),
            on=["host"],
        )
        .filter(hex_hash("canon_url") == F.col("min_h"))
        .groupBy("host")
        .agg(F.min("canon_url").alias("sample_url"))
    )
    return (
        rollup.join(F.broadcast(sample), "host")
        .select(
            "host",
            "n_docs",
            "n_urls",
            "https_docs",
            "sum_chars",
            "sample_url",
        )
        .orderBy("host")
    )


# --- q316: DSIR-style importance resampling -----------------------------------

_DSIR_BUCKETS = 64
_DSIR_TOP = 100


@register(
    "q316_dsir_importance",
    oracle=f"""
    WITH toks AS MATERIALIZED (
      SELECT doc_id,
             unnest(list_filter(regexp_split_to_array(lower(text),
                    '[^a-z0-9]+'), t -> t <> '')) AS w
      FROM documents),
    feat AS MATERIALIZED (
      SELECT doc_id,
             ('0x' || substr(md5(w), 1, 15))::BIGINT % {_DSIR_BUCKETS}
               AS bucket
      FROM toks),
    tgt AS (SELECT doc_id FROM documents WHERE lang = 'en'),
    cnt AS (
      SELECT bucket,
             CAST(count(*) AS BIGINT) AS ca,
             CAST(sum(CASE WHEN tgt.doc_id IS NOT NULL THEN 1 ELSE 0 END)
                  AS BIGINT) AS ct
      FROM feat LEFT JOIN tgt ON feat.doc_id = tgt.doc_id
      GROUP BY bucket),
    tot AS (
      SELECT CAST(sum(ca) AS BIGINT) AS ta, CAST(sum(ct) AS BIGINT) AS tt
      FROM cnt),
    w AS (
      SELECT bucket,
             CAST(round(1000000.0 * ln(
               ((CAST(ct AS DOUBLE) + 1.0) / (tt + {_DSIR_BUCKETS}))
               / ((CAST(ca AS DOUBLE) + 1.0) / (ta + {_DSIR_BUCKETS}))))
               AS BIGINT) AS logw_micro
      FROM cnt CROSS JOIN tot),
    scored AS (
      SELECT f.doc_id, CAST(sum(w.logw_micro) AS BIGINT) AS score_micro
      FROM feat f JOIN w ON f.bucket = w.bucket
      GROUP BY f.doc_id),
    ranked AS (
      SELECT s.doc_id, d.lang, d.source, s.score_micro,
             row_number() OVER (ORDER BY s.score_micro DESC, s.doc_id)
               AS rn
      FROM scored s JOIN documents d ON s.doc_id = d.doc_id)
    SELECT doc_id, lang, source, score_micro, CAST(rn AS BIGINT) AS rn
    FROM ranked WHERE rn <= {_DSIR_TOP}
    ORDER BY rn
    """,
    doc=f"DSIR-STYLE IMPORTANCE RESAMPLING (Xie et al. 2023, 'Data "
    "Selection for Language Models via Importance Resampling') — the "
    "data-mix curation step that scores every raw document by how "
    "target-like its hashed n-gram features are, then keeps the top "
    "slice: tokens hash into 64 buckets (the 60-bit md5 hash shared "
    "with the dedup tier, mod B); the target distribution p is "
    "estimated from the lang=en slice and the raw distribution q from "
    "the whole corpus, both add-one smoothed over B buckets; per-doc "
    "importance = sum over tokens of log(p_b/q_b). Float discipline: "
    "each bucket's log-ratio is micro-quantized BEFORE the per-doc "
    "sum (the q100 rule), so doc scores are exact int64 arithmetic "
    f"and the top-{_DSIR_TOP} cut plus (score, doc_id) tie-break is "
    "deterministic across engines. Scale: the bucket-weight table is "
    f"B={_DSIR_BUCKETS} rows — a broadcast; scoring is one hash-agg "
    "over the exploded tokens (map-side partial sums); the global "
    "top-k is Spark's TakeOrdered (per-partition heaps + driver "
    "merge of k*P rows), never a full sort. The exploded feature "
    "relation is localCheckpoint-ed once for its two consumers — "
    "measured 2.5x at 64x vs recompute (SCALE.md): the tokenize+hash "
    "subtree is compute-dominated, the case the q213 recompute rule "
    "does NOT cover.",
    tags=("text", "llm", "dsir", "sampling", "scale"),
)
def q316_dsir_importance(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents")
    feat = d.select(
        "doc_id", F.explode(tokens("text")).alias("w")
    ).select(
        "doc_id",
        (hex_hash("w") % _DSIR_BUCKETS).alias("bucket"),
    )
    # feat feeds TWO consumers (bucket-count agg + scoring join). The
    # q213 rule said recompute narrow pipelines — but this one is
    # compute-dominated (regex tokenize + md5 per token), and the 64x
    # head-to-head measured materialize-once at 30.4s vs recompute at
    # 75.1s (SCALE.md). Lazy localCheckpoint keeps the spec non-eager.
    feat = feat.localCheckpoint(eager=False)
    tgt = d.filter(F.col("lang") == "en").select("doc_id")
    cnt = (
        feat.join(F.broadcast(tgt.withColumn("__t", F.lit(1))), "doc_id", "left")
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("long").alias("ca"),
            F.sum(F.when(F.col("__t").isNotNull(), 1).otherwise(0))
            .cast("long")
            .alias("ct"),
        )
    )
    tot = cnt.agg(
        F.sum("ca").cast("long").alias("ta"),
        F.sum("ct").cast("long").alias("tt"),
    )
    w = cnt.crossJoin(F.broadcast(tot)).select(
        "bucket",
        F.expr(
            f"CAST(round(1000000.0 * ln("
            f"((CAST(ct AS DOUBLE) + 1.0) / (tt + {_DSIR_BUCKETS}))"
            f" / ((CAST(ca AS DOUBLE) + 1.0) / (ta + {_DSIR_BUCKETS}))))"
            " AS BIGINT)"
        ).alias("logw_micro"),
    )
    scored = (
        feat.join(F.broadcast(w), "bucket")
        .groupBy("doc_id")
        .agg(F.sum("logw_micro").cast("long").alias("score_micro"))
    )
    top = (
        scored.join(d.select("doc_id", "lang", "source"), "doc_id")
        .orderBy(F.col("score_micro").desc(), "doc_id")
        .limit(_DSIR_TOP)
    )
    from pyspark.sql.window import Window

    rn = F.row_number().over(
        Window.orderBy(F.col("score_micro").desc(), "doc_id")
    )
    return top.select(
        "doc_id",
        "lang",
        "source",
        "score_micro",
        rn.cast("long").alias("rn"),
    ).orderBy("rn")


# --- q318: T5-style span-corruption mask planning -------------------------------

_SPAN_LEN = 3  # mean noise-span length (T5 default)
_NOISE_PCT = 15  # noise density, percent (integer arithmetic only)


@register(
    "q318_span_corruption_plan",
    oracle=f"""
    WITH toks AS MATERIALIZED (
      SELECT doc_id,
             list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                         t -> t <> '') AS tk
      FROM documents),
    meta AS (
      SELECT doc_id, len(tk) AS n,
             ({_NOISE_PCT} * len(tk) + 50) // 100 AS n_noise
      FROM toks),
    plan AS (
      SELECT doc_id, n, n_noise,
             CASE WHEN n >= 8
                  THEN greatest(1, (n_noise + {_SPAN_LEN} - 1)
                                   // {_SPAN_LEN})
                  ELSE 0 END AS n_spans
      FROM meta),
    cand AS (
      SELECT p.doc_id, p.n, p.n_spans, pos,
             ('0x' || substr(md5(CAST(p.doc_id AS STRING) || ':'
                 || CAST(pos AS STRING)), 1, 15))::BIGINT AS h
      FROM plan p CROSS JOIN LATERAL (
        SELECT unnest(range(1, p.n - {_SPAN_LEN} + 2)) AS pos) c
      WHERE p.n_spans > 0),
    starts AS (
      SELECT doc_id, n, n_spans, pos AS s,
             pos + {_SPAN_LEN} - 1 AS e
      FROM (SELECT *, row_number() OVER (PARTITION BY doc_id
                       ORDER BY h, pos) AS rk FROM cand)
      WHERE rk <= n_spans),
    isl AS (
      SELECT doc_id, n, s, e,
             CASE WHEN s > COALESCE(max(e) OVER (PARTITION BY doc_id
                  ORDER BY s ROWS BETWEEN UNBOUNDED PRECEDING
                  AND 1 PRECEDING), -1) THEN 1 ELSE 0 END AS new_isl
      FROM starts),
    grp AS (
      SELECT doc_id, n,
             sum(new_isl) OVER (PARTITION BY doc_id ORDER BY s
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS island, s, e
      FROM isl),
    merged AS (
      SELECT doc_id, any_value(n) AS n,
             least(max(e), any_value(n)) - min(s) + 1 AS masked
      FROM grp GROUP BY doc_id, island),
    agg AS (
      SELECT doc_id, any_value(n) AS n,
             CAST(count(*) AS BIGINT) AS n_sentinels,
             CAST(sum(masked) AS BIGINT) AS masked_tokens
      FROM merged GROUP BY doc_id)
    SELECT p.doc_id, CAST(p.n AS BIGINT) AS n_tokens,
           CAST(p.n_spans AS BIGINT) AS n_spans,
           COALESCE(a.n_sentinels, 0) AS n_sentinels,
           COALESCE(a.masked_tokens, 0) AS masked_tokens,
           CAST(p.n AS BIGINT) - COALESCE(a.masked_tokens, 0)
             AS visible_tokens
    FROM plan p LEFT JOIN agg a ON p.doc_id = a.doc_id
    ORDER BY p.doc_id
    """,
    doc="T5-STYLE SPAN-CORRUPTION MASK PLANNING — the denoising-"
    "objective prep step a pretraining pipeline runs per document: "
    "noise budget = 15% of tokens (EXACT integer arithmetic, "
    "(15n+50) DIV 100 — no float round), spans of mean length 3, "
    "span starts drawn DETERMINISTICALLY by ranking candidate "
    "positions on the shared 60-bit md5 hash of (doc_id, pos) — the "
    "engine's hash-based pseudo-randomness convention (q87/q142), "
    "so both engines plan the identical mask; overlapping spans "
    "merge via the q214 interval-island pattern (running-max end, "
    "new-island flag, per-island extent clipped to the doc) and "
    "each merged island becomes ONE sentinel. Output: per-doc mask "
    "accounting (spans planned, sentinels after merge, masked / "
    "visible token counts — exactly what the batch packer needs to "
    "size encoder/decoder sequences). Scale: every window is "
    "PARTITIONED BY doc_id (no global window); candidates are "
    "bounded by doc length; the rest is per-group integer "
    "arithmetic.",
    tags=("text", "llm", "pretraining", "mask", "window", "scale"),
)
def q318_span_corruption_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    d = t(spark, sf_dir, "documents").select(
        "doc_id", tokens("text").alias("tk")
    )
    plan = d.select(
        "doc_id",
        F.size("tk").cast("long").alias("n"),
        F.expr(f"({_NOISE_PCT} * size(tk) + 50) DIV 100").alias("n_noise"),
    ).withColumn(
        "n_spans",
        F.expr(
            f"CASE WHEN n >= 8 THEN greatest(1, (n_noise + {_SPAN_LEN} - 1)"
            f" DIV {_SPAN_LEN}) ELSE 0 END"
        ),
    )
    cand = (
        plan.filter(F.col("n_spans") > 0)
        .select(
            "doc_id",
            "n",
            "n_spans",
            F.explode(
                F.expr(f"sequence(1, n - {_SPAN_LEN} + 1)")
            ).alias("pos"),
        )
        .withColumn(
            "h",
            hex_hash(
                F.concat_ws(
                    ":",
                    F.col("doc_id").cast("string"),
                    F.col("pos").cast("string"),
                )
            ),
        )
    )
    rk = F.row_number().over(
        Window.partitionBy("doc_id").orderBy("h", "pos")
    )
    starts = (
        cand.withColumn("rk", rk)
        .filter(F.col("rk") <= F.col("n_spans"))
        .select(
            "doc_id",
            "n",
            F.col("pos").alias("s"),
            (F.col("pos") + _SPAN_LEN - 1).alias("e"),
        )
    )
    w_prev = (
        Window.partitionBy("doc_id")
        .orderBy("s")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_cum = (
        Window.partitionBy("doc_id")
        .orderBy("s")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    grp = starts.withColumn(
        "new_isl",
        F.when(
            F.col("s") > F.coalesce(F.max("e").over(w_prev), F.lit(-1)), 1
        ).otherwise(0),
    ).withColumn("island", F.sum("new_isl").over(w_cum))
    merged = grp.groupBy("doc_id", "island").agg(
        F.first("n").alias("n"),
        (
            F.least(F.max("e"), F.first("n")) - F.min("s") + 1
        ).alias("masked"),
    )
    agg = merged.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_sentinels"),
        F.sum("masked").cast("long").alias("masked_tokens"),
    )
    return (
        plan.join(agg, "doc_id", "left")
        .select(
            "doc_id",
            F.col("n").alias("n_tokens"),
            F.col("n_spans").cast("long").alias("n_spans"),
            F.coalesce(F.col("n_sentinels"), F.lit(0)).alias("n_sentinels"),
            F.coalesce(F.col("masked_tokens"), F.lit(0)).alias(
                "masked_tokens"
            ),
            (
                F.col("n")
                - F.coalesce(F.col("masked_tokens"), F.lit(0))
            ).alias("visible_tokens"),
        )
        .orderBy("doc_id")
    )


# --- q319: per-host quota cap (sqrt-damped domain mix) ---------------------------


def _q319_host_oracle_layers() -> str:
    layers = [
        "u0 AS (SELECT doc_id, n_chars, "
        f"{_URL_DIRTY_SQL} AS url FROM documents)"
    ]
    prev = "u0"
    for i, (col, expr) in enumerate(_url_canon_steps("duck"), start=1):
        layers.append(f"u{i} AS (SELECT *, {expr} AS {col} FROM {prev})")
        prev = f"u{i}"
    return ",\n    ".join(layers) + f",\n    docs AS (SELECT doc_id, n_chars, host FROM {prev})"


@register(
    "q319_host_quota_cap",
    oracle=f"""
    WITH {_q319_host_oracle_layers()},
    ranked AS (
      SELECT doc_id, n_chars, host,
             row_number() OVER (PARTITION BY host
                                ORDER BY n_chars DESC, doc_id) AS rk,
             count(*) OVER (PARTITION BY host) AS n_docs
      FROM docs),
    capped AS (
      SELECT host, n_docs,
             CAST(3 * ceil(sqrt(CAST(n_docs AS DOUBLE))) AS BIGINT) AS cap,
             CASE WHEN rk <= 3 * ceil(sqrt(CAST(n_docs AS DOUBLE)))
                  THEN 1 ELSE 0 END AS keep,
             n_chars
      FROM ranked)
    SELECT host,
           CAST(any_value(n_docs) AS BIGINT) AS n_docs,
           any_value(cap) AS cap,
           CAST(sum(keep) AS BIGINT) AS kept,
           CAST(sum(1 - keep) AS BIGINT) AS dropped,
           CAST(sum(CASE WHEN keep = 1 THEN n_chars ELSE 0 END) AS BIGINT)
             AS kept_chars,
           CAST(sum(CASE WHEN keep = 0 THEN n_chars ELSE 0 END) AS BIGINT)
             AS dropped_chars
    FROM capped
    GROUP BY host
    ORDER BY host
    """,
    doc="PER-HOST QUOTA CAP with sqrt damping — the domain-mix rule "
    "web-scale corpora apply after URL canonicalization (FineWeb/C4 "
    "style: no host may dominate the training mix, but bigger hosts "
    "still contribute more): documents resolve to their canonical "
    "host through the EXACT q312 chain (this query consumes that "
    "operator, the way q310 consumed q274's profile), rank within "
    "host by the (n_chars, doc_id) quality proxy, keep the top "
    "3*ceil(sqrt(n_host)) — sublinear in host size, so a 100x "
    "bigger host gets only 10x the slots. Output: per-host "
    "admission accounting (cap, kept/dropped docs and bytes). "
    "Exactness: sqrt/ceil are IEEE-correctly-rounded on both "
    "engines and feed integer comparisons only. Scale: one window "
    "rank PARTITIONED BY host; a pathological giant host is the "
    "q17 top-k-per-group shape and the registered escape is "
    "operators/indexing.with_group_rank (q181) — never a global "
    "sort.",
    tags=("text", "llm", "mix", "quota", "window", "scale"),
)
def q319_host_quota_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    d = t(spark, sf_dir, "documents").select(
        "doc_id", "n_chars", "source", F.expr(_URL_DIRTY_SQL).alias("url")
    )
    for col, expr in _url_canon_steps("spark"):
        d = d.withColumn(col, F.expr(expr))
    docs = d.select("doc_id", "n_chars", "host")
    w_rank = Window.partitionBy("host").orderBy(
        F.col("n_chars").desc(), "doc_id"
    )
    w_host = Window.partitionBy("host")
    ranked = docs.select(
        "host",
        "n_chars",
        F.row_number().over(w_rank).alias("rk"),
        F.count(F.lit(1)).over(w_host).alias("n_docs"),
    )
    capped = ranked.select(
        "host",
        "n_docs",
        F.expr("CAST(3 * ceil(sqrt(CAST(n_docs AS DOUBLE))) AS BIGINT)").alias(
            "cap"
        ),
        F.when(
            F.col("rk")
            <= F.expr("3 * ceil(sqrt(CAST(n_docs AS DOUBLE)))"),
            1,
        )
        .otherwise(0)
        .alias("keep"),
        "n_chars",
    )
    return (
        capped.groupBy("host")
        .agg(
            F.first("n_docs").cast("long").alias("n_docs"),
            F.first("cap").alias("cap"),
            F.sum("keep").cast("long").alias("kept"),
            F.sum(1 - F.col("keep")).cast("long").alias("dropped"),
            F.sum(F.when(F.col("keep") == 1, F.col("n_chars")).otherwise(0))
            .cast("long")
            .alias("kept_chars"),
            F.sum(F.when(F.col("keep") == 0, F.col("n_chars")).otherwise(0))
            .cast("long")
            .alias("dropped_chars"),
        )
        .orderBy("host")
    )


# --- q320: Kneser-Ney smoothed bigram LM scoring --------------------------------

# Absolute discount, in fixed micro units so both engines subtract the
# identical constant (0.75 is exactly representable, but the convention
# keeps every model constant single-sourced).
_KN_D = 0.75


@register(
    "q320_kneser_ney_bigram",
    oracle=f"""
    WITH toks AS MATERIALIZED (
      SELECT doc_id,
             list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                         t -> t <> '') AS tk
      FROM documents),
    pairs AS MATERIALIZED (
      SELECT doc_id, tk[i] AS w1, tk[i + 1] AS w2
      FROM toks CROSS JOIN LATERAL (
        SELECT unnest(range(1, len(tk))) AS i) idx
      WHERE len(tk) >= 2),
    c2 AS MATERIALIZED (
      SELECT w1, w2, CAST(count(*) AS BIGINT) AS c12
      FROM pairs GROUP BY w1, w2),
    fwd AS (
      SELECT w1, CAST(sum(c12) AS BIGINT) AS c1,
             CAST(count(*) AS BIGINT) AS n1f
      FROM c2 GROUP BY w1),
    rev AS (
      SELECT w2, CAST(count(*) AS BIGINT) AS n1r
      FROM c2 GROUP BY w2),
    tot AS (
      SELECT CAST(count(*) AS BIGINT) AS n1all FROM c2),
    scored AS (
      SELECT p.doc_id,
             CAST(round(1000000.0 * ln(
               greatest(CAST(c2.c12 AS DOUBLE) - {_KN_D}, 0.0) / fwd.c1
               + ({_KN_D} * fwd.n1f / fwd.c1)
                 * (CAST(rev.n1r AS DOUBLE) / tot.n1all)))
               AS BIGINT) AS lq
      FROM pairs p
      JOIN c2 ON p.w1 = c2.w1 AND p.w2 = c2.w2
      JOIN fwd ON p.w1 = fwd.w1
      JOIN rev ON p.w2 = rev.w2
      CROSS JOIN tot)
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_bigrams,
           round((CAST(sum(lq) AS DOUBLE) / count(*)) / 1000000.0, 6)
             AS avg_logprob
    FROM scored GROUP BY doc_id
    """,
    doc="KNESER-NEY SMOOTHED BIGRAM LM SCORING — the real-LM upgrade "
    "over q100's add-one baseline (interpolated KN with absolute "
    "discount d=0.75 is what KenLM-grade quality filters actually "
    "ship): P(w2|w1) = max(c12-d, 0)/c1 + (d*N1+(w1,.)/c1) * "
    "Pcont(w2), where the continuation probability Pcont(w2) = "
    "N1+(.,w2)/N1+(.,.) counts CONTEXTS, not tokens — the "
    "'francisco problem' fix that frequency-proportional smoothing "
    "gets wrong. All four model tables (bigram counts, forward "
    "context totals+fanouts, reverse fanouts, distinct-bigram "
    "total) derive from ONE bigram hash agg; per-bigram log-probs "
    "are micro-quantized before the per-doc sum (the q100 rule), "
    "so doc scores are exact int64 arithmetic. Scale: the scoring "
    "joins are key-grouped equi-joins on pre-aggregated counts "
    "(fan-out exactly 1 per probe row, hot function words bounded "
    "by pre-aggregation); the one-row bigram-vocabulary total "
    "rides a broadcast — the q295 64x row measured this exact "
    "join skeleton sub-linear under a doubly-64x corpus+vocab "
    "load.",
    tags=("text", "llm", "lm", "quality", "scale"),
)
def q320_kneser_ney_bigram(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents").select(
        "doc_id", tokens("text").alias("tk")
    )
    pairs = (
        d.filter(F.size("tk") >= 2)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(sequence(0, size(tk) - 2), "
                    "i -> struct(tk[i] as w1, tk[i + 1] as w2))"
                )
            ).alias("p"),
        )
        .select("doc_id", "p.w1", "p.w2")
    )
    c2 = pairs.groupBy("w1", "w2").agg(F.count("*").cast("long").alias("c12"))
    fwd = c2.groupBy("w1").agg(
        F.sum("c12").cast("long").alias("c1"),
        F.count("*").cast("long").alias("n1f"),
    )
    rev = c2.groupBy("w2").agg(F.count("*").cast("long").alias("n1r"))
    tot = c2.agg(F.count("*").cast("long").alias("n1all"))
    scored = (
        pairs.join(c2, ["w1", "w2"])
        .join(fwd, "w1")
        .join(rev, "w2")
        .crossJoin(F.broadcast(tot))
        .select(
            "doc_id",
            F.expr(
                f"CAST(round(1000000.0 * ln("
                f"greatest(CAST(c12 AS DOUBLE) - {_KN_D}, 0.0) / c1"
                f" + ({_KN_D} * n1f / c1)"
                " * (CAST(n1r AS DOUBLE) / n1all))) AS BIGINT)"
            ).alias("lq"),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_bigrams"),
        F.round(
            (F.sum("lq").cast("double") / F.count("*")) / 1000000.0, 6
        ).alias("avg_logprob"),
    )


# --- q323: leave-one-source-out perplexity ablation -----------------------------


@register(
    "q323_source_ablation_ppl",
    oracle="""
    WITH toks AS MATERIALIZED (
      SELECT doc_id, source,
             list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                         t -> t <> '') AS tk
      FROM documents),
    pairs AS MATERIALIZED (
      SELECT doc_id, source, tk[i] AS w1, tk[i + 1] AS w2
      FROM toks CROSS JOIN LATERAL (
        SELECT unnest(range(1, len(tk))) AS i) idx
      WHERE len(tk) >= 2),
    held AS MATERIALIZED (
      SELECT w1, w2, CAST(count(*) AS BIGINT) AS hc
      FROM pairs WHERE ('0x' || substr(md5(CAST(doc_id AS STRING)), 1, 15))::BIGINT % 10 = 0 GROUP BY 1, 2),
    train AS MATERIALIZED (
      SELECT source, w1, w2 FROM pairs WHERE NOT (('0x' || substr(md5(CAST(doc_id AS STRING)), 1, 15))::BIGINT % 10 = 0)),
    c2 AS MATERIALIZED (
      SELECT w1, w2, CAST(count(*) AS BIGINT) AS c2
      FROM train GROUP BY 1, 2),
    c1 AS MATERIALIZED (
      SELECT w1, CAST(count(*) AS BIGINT) AS c1 FROM train GROUP BY 1),
    c2s AS MATERIALIZED (
      SELECT source, w1, w2, CAST(count(*) AS BIGINT) AS c2s
      FROM train GROUP BY 1, 2, 3),
    c1s AS MATERIALIZED (
      SELECT source, w1, CAST(count(*) AS BIGINT) AS c1s
      FROM train GROUP BY 1, 2),
    vocab AS (
      SELECT CAST(count(DISTINCT w) AS BIGINT) AS v
      FROM (SELECT unnest(tk) AS w FROM toks WHERE NOT (('0x' || substr(md5(CAST(doc_id AS STRING)), 1, 15))::BIGINT % 10 = 0))),
    fullq AS (
      SELECT h.w1, h.w2, h.hc,
             coalesce(c2.c2, 0) AS c2, coalesce(c1.c1, 0) AS c1,
             CAST(round(1000000.0 * ln(
               (CAST(coalesce(c2.c2, 0) AS DOUBLE) + 1.0)
               / (CAST(coalesce(c1.c1, 0) AS DOUBLE) + vo.v)))
               AS BIGINT) AS lq_full
      FROM held h
      LEFT JOIN c2 ON h.w1 = c2.w1 AND h.w2 = c2.w2
      LEFT JOIN c1 ON h.w1 = c1.w1
      CROSS JOIN vocab vo),
    ftot AS (
      SELECT CAST(sum(hc) AS BIGINT) AS n_big,
             CAST(sum(hc * lq_full) AS BIGINT) AS full_sum
      FROM fullq),
    touched AS (
      SELECT f.w1, f.w2, f.hc, f.c2, f.c1, f.lq_full, s.source,
             coalesce(x.c2s, 0) AS c2s, s.c1s
      FROM fullq f
      JOIN c1s s ON f.w1 = s.w1
      LEFT JOIN c2s x ON x.source = s.source AND x.w1 = f.w1
                     AND x.w2 = f.w2),
    deltas AS (
      SELECT source,
             CAST(sum(hc * (CAST(round(1000000.0 * ln(
               (CAST(c2 - c2s AS DOUBLE) + 1.0)
               / (CAST(c1 - c1s AS DOUBLE) + vo.v))) AS BIGINT)
               - lq_full)) AS BIGINT) AS delta_sum
      FROM touched CROSS JOIN vocab vo
      GROUP BY source),
    srcs AS (SELECT DISTINCT source FROM train)
    SELECT s.source,
           t.n_big AS n_heldout_bigrams,
           CAST(round(CAST(t.full_sum AS DOUBLE) / t.n_big) AS BIGINT)
             AS full_avg_micro,
           CAST(round(CAST(t.full_sum + coalesce(d.delta_sum, 0) AS DOUBLE)
             / t.n_big) AS BIGINT) AS ablated_avg_micro,
           CAST(round(CAST(coalesce(d.delta_sum, 0) AS DOUBLE) / t.n_big)
             AS BIGINT) AS contribution_micro
    FROM srcs s
    LEFT JOIN deltas d ON d.source = s.source
    CROSS JOIN ftot t
    ORDER BY contribution_micro, s.source
    """,
    doc="LEAVE-ONE-SOURCE-OUT PERPLEXITY ABLATION — data valuation "
    "without retraining (the Shapley-flavored 'which sources "
    "actually help the model?' read a mix builder wants before "
    "q322 allocates budget): the add-one bigram LM (q100's "
    "convention) is scored ONCE on the hash-split holdout (md5 of "
    "doc_id, the q87 convention — a doc_id MOD rule would correlate "
    "with the synthetic source assignment, exactly the q249 split- "
    "leakage failure), "
    "then each source's ablated model comes from COUNT ALGEBRA — "
    "c2 - c2_s and c1 - c1_s — never a per-source re-aggregation "
    "of the corpus; a source only perturbs the heldout bigrams "
    "whose context it touched, so the delta join's fan-out is "
    "bounded by |sources| per bigram and the 19 untouched sources "
    "cost nothing. contribution = ablated - full mean log-prob "
    "(negative contribution_micro: removing the source HURTS, the "
    "source helps). Fixed train vocabulary across ablations "
    "(documented simplification: V enters only the smoothing "
    "denominator). Float discipline: every ln is micro-quantized "
    "before the exact int64 weighted sums (q100 rule). Scale: "
    "model tables are hash aggs; the heldout scoring joins are "
    "fan-out-1; the ablation join is fan-out-|sources| on "
    "pre-aggregated counts — at 100 TB this is the difference "
    "between 20 LM retrainings and ONE extra bounded join.",
    tags=("text", "llm", "valuation", "ablation", "scale"),
)
def q323_source_ablation_ppl(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents").select(
        "doc_id", "source", tokens("text").alias("tk")
    )
    pairs = (
        d.filter(F.size("tk") >= 2)
        .select(
            "doc_id",
            "source",
            F.explode(
                F.expr(
                    "transform(sequence(0, size(tk) - 2), "
                    "i -> struct(tk[i] as w1, tk[i + 1] as w2))"
                )
            ).alias("p"),
        )
        .select("doc_id", "source", "p.w1", "p.w2")
    )
    held = (
        pairs.filter(hex_hash(F.col("doc_id").cast("string")) % 10 == 0)
        .groupBy("w1", "w2")
        .agg(F.count("*").cast("long").alias("hc"))
    )
    train = pairs.filter(hex_hash(F.col("doc_id").cast("string")) % 10 != 0)
    c2 = train.groupBy("w1", "w2").agg(
        F.count("*").cast("long").alias("c2")
    )
    c1 = train.groupBy("w1").agg(F.count("*").cast("long").alias("c1"))
    c2s = train.groupBy("source", "w1", "w2").agg(
        F.count("*").cast("long").alias("c2s")
    )
    c1s = train.groupBy("source", "w1").agg(
        F.count("*").cast("long").alias("c1s")
    )
    vocab = (
        d.filter(hex_hash(F.col("doc_id").cast("string")) % 10 != 0)
        .select(F.explode("tk").alias("w"))
        .agg(F.countDistinct("w").cast("long").alias("v"))
    )
    fullq = (
        held.join(c2, ["w1", "w2"], "left")
        .join(c1, "w1", "left")
        .crossJoin(F.broadcast(vocab))
        .select(
            "w1",
            "w2",
            "hc",
            F.coalesce("c2", F.lit(0)).alias("c2"),
            F.coalesce("c1", F.lit(0)).alias("c1"),
            "v",
            F.expr(
                "CAST(round(1000000.0 * ln("
                "(CAST(coalesce(c2, 0) AS DOUBLE) + 1.0)"
                " / (CAST(coalesce(c1, 0) AS DOUBLE) + v))) AS BIGINT)"
            ).alias("lq_full"),
        )
    )
    ftot = fullq.agg(
        F.sum("hc").cast("long").alias("n_big"),
        F.sum(F.col("hc") * F.col("lq_full")).cast("long").alias("full_sum"),
    )
    touched = (
        fullq.join(c1s, "w1")
        .join(c2s, ["source", "w1", "w2"], "left")
        .select(
            "source",
            "hc",
            "c2",
            "c1",
            "v",
            "lq_full",
            F.coalesce("c2s", F.lit(0)).alias("c2s"),
            "c1s",
        )
    )
    deltas = touched.groupBy("source").agg(
        F.sum(
            F.col("hc")
            * (
                F.expr(
                    "CAST(round(1000000.0 * ln("
                    "(CAST(c2 - c2s AS DOUBLE) + 1.0)"
                    " / (CAST(c1 - c1s AS DOUBLE) + v))) AS BIGINT)"
                )
                - F.col("lq_full")
            )
        )
        .cast("long")
        .alias("delta_sum")
    )
    srcs = train.select("source").distinct()
    return (
        srcs.join(deltas, "source", "left")
        .crossJoin(F.broadcast(ftot))
        .select(
            "source",
            F.col("n_big").alias("n_heldout_bigrams"),
            F.expr(
                "CAST(round(CAST(full_sum AS DOUBLE) / n_big) AS BIGINT)"
            ).alias("full_avg_micro"),
            F.expr(
                "CAST(round(CAST(full_sum + coalesce(delta_sum, 0)"
                " AS DOUBLE) / n_big) AS BIGINT)"
            ).alias("ablated_avg_micro"),
            F.expr(
                "CAST(round(CAST(coalesce(delta_sum, 0) AS DOUBLE) / n_big)"
                " AS BIGINT)"
            ).alias("contribution_micro"),
        )
        .orderBy("contribution_micro", "source")
    )


# --- q327: blocklist / domain-suffix filtering ----------------------------------

# Deterministic denylist: exact hosts AND registrable-domain entries that
# must also catch every subdomain (the wildcard semantics real blocklists
# carry). Matching runs on the RAW host (before www/m folding) — lists
# are published against what appears in URLs.
# src1 hits the EXACT-match arm (its dirt case carries no host prefix),
# src3/src7 hit the SUBDOMAIN-suffix arm (their dirt cases prefix m.),
# badhost.invalid matches nothing — all three rule paths execute.
_BLOCKLIST = [
    "src1.example.com",
    "src3.example.com",
    "src7.example.com",
    "badhost.invalid",
]
_BLOCKLIST_SQL = ", ".join(f"('{e}')" for e in _BLOCKLIST)


@register(
    "q327_blocklist_filter",
    oracle=f"""
    WITH u0 AS (
      SELECT doc_id, n_chars, {_URL_DIRTY_SQL} AS url FROM documents),
    h AS (
      SELECT doc_id, n_chars,
             lower(split_part(split_part(split_part(url, '://', 2),
                   '/', 1), ':', 1)) AS rawhost
      FROM u0),
    bl AS (SELECT * FROM (VALUES {_BLOCKLIST_SQL}) AS b(entry)),
    flagged AS (
      SELECT h.doc_id, h.n_chars, h.rawhost,
             CASE WHEN EXISTS (
               SELECT 1 FROM bl
               WHERE h.rawhost = bl.entry
                  OR h.rawhost LIKE '%.' || bl.entry)
             THEN 1 ELSE 0 END AS blocked
      FROM h)
    SELECT rawhost AS host,
           CAST(any_value(blocked) AS BIGINT) AS blocked,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS sum_chars
    FROM flagged
    GROUP BY rawhost
    ORDER BY rawhost
    """,
    doc="BLOCKLIST / DOMAIN-SUFFIX FILTERING — the denylist gate a "
    "web-corpus ingest runs before anything else (robots opt-outs, "
    "abuse lists, licensing exclusions): an entry blocks its exact "
    "host AND every subdomain (the wildcard semantics published "
    "lists carry), matched against the RAW pre-normalization host "
    "(lists name what appears in URLs, so www.src3.example.com "
    "must fall to the src3.example.com entry via the suffix rule, "
    "not via the q312 folding). Semantics: host = entry OR host "
    "ends with '.' || entry. Scale: the blocklist is a broadcast "
    "(the per-row cost is |list| suffix checks); at millions of "
    "entries the registered escape is equality-joining on the "
    "REGISTRABLE domain (extract the entry-length suffix, one "
    "equi-join per label depth — the same bounded-fan-out trick "
    "as the shingle joins), never a per-row scan of a giant list. "
    "Per-host rollup with the blocked decision in the output so "
    "the oracle checks the GATE, not just counts.",
    tags=("text", "llm", "ingest", "filter", "scale"),
)
def q327_blocklist_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    h = t(spark, sf_dir, "documents").select(
        "doc_id",
        "n_chars",
        F.expr(_URL_DIRTY_SQL).alias("url"),
    ).select(
        "doc_id",
        "n_chars",
        F.expr(
            "lower(split_part(split_part(split_part(url, '://', 2),"
            " '/', 1), ':', 1))"
        ).alias("rawhost"),
    )
    bl = spark.createDataFrame([(e,) for e in _BLOCKLIST], "entry STRING")
    # blocked is a function of rawhost ALONE, so the document relation is
    # touched exactly once: one doc-grain hash agg rolls up to the
    # <=|hosts| relation, and the blocklist predicate runs there — one
    # broadcast NL join of the |list|-entry table against HOSTS, never a
    # per-document join (the r12 plan did the semi-join at doc grain and
    # broadcast the data-proportional hit set back; at 100 TB with a
    # high block rate that broadcast is unbounded).
    hosts = h.groupBy("rawhost").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_chars").cast("long").alias("sum_chars"),
    )
    return (
        hosts.join(
            F.broadcast(bl),
            (F.col("rawhost") == F.col("entry"))
            | F.col("rawhost").endswith(
                F.concat(F.lit("."), F.col("entry"))
            ),
            "left",
        )
        # a host can match several entries (exact + suffix): re-fold the
        # <=|hosts|+|matches| rows back to host grain
        .groupBy(F.col("rawhost").alias("host"))
        .agg(
            F.max(
                F.when(F.col("entry").isNotNull(), 1).otherwise(0)
            ).cast("long").alias("blocked"),
            F.max("n_docs").cast("long").alias("n_docs"),
            F.max("sum_chars").cast("long").alias("sum_chars"),
        )
        .orderBy("host")
    )


# --- q328: gazetteer phrase tagging ---------------------------------------------

# Dictionary entities over the corpus vocabulary: unigrams and bigrams
# (multi-token phrases are what separates gazetteer matching from plain
# token lookup). Deterministic fixed list — the gazetteer is an INPUT.
_GAZETTEER = [
    ("spark",),
    ("stream",),
    ("big", "table"),
    ("hash", "join"),
    ("fast", "scan"),
]
_GAZ_UNI_SQL = ", ".join(
    f"('{e[0]}')" for e in _GAZETTEER if len(e) == 1
)
_GAZ_BI_SQL = ", ".join(
    f"('{e[0]}', '{e[1]}')" for e in _GAZETTEER if len(e) == 2
)


@register(
    "q328_gazetteer_tagging",
    oracle=f"""
    WITH toks AS MATERIALIZED (
      SELECT doc_id,
             list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                         t -> t <> '') AS tk
      FROM documents),
    uni AS (
      SELECT doc_id, unnest(tk) AS w FROM toks),
    bi AS (
      SELECT doc_id, tk[i] AS w1, tk[i + 1] AS w2
      FROM toks CROSS JOIN LATERAL (
        SELECT unnest(range(1, len(tk))) AS i) idx
      WHERE len(tk) >= 2),
    gu AS (SELECT * FROM (VALUES {_GAZ_UNI_SQL}) AS g(w)),
    gb AS (SELECT * FROM (VALUES {_GAZ_BI_SQL}) AS g(w1, w2)),
    hits AS (
      SELECT u.doc_id, gu.w AS entity FROM uni u JOIN gu ON u.w = gu.w
      UNION ALL
      SELECT b.doc_id, gb.w1 || ' ' || gb.w2 AS entity
      FROM bi b JOIN gb ON b.w1 = gb.w1 AND b.w2 = gb.w2)
    SELECT entity,
           CAST(count(*) AS BIGINT) AS n_mentions,
           CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
    FROM hits
    GROUP BY entity
    ORDER BY entity
    """,
    doc="GAZETTEER PHRASE TAGGING — dictionary-based entity matching "
    "(the brand/keyword/PII-list tagging step a corpus pipeline "
    "runs when regexes (q55) are the wrong tool because the "
    "dictionary IS the spec): unigram entries match the token "
    "relation, MULTI-TOKEN entries match the consecutive-bigram "
    "relation — phrase matching via position-adjacent joins, not "
    "string CONTAINS (which would false-positive across token "
    "boundaries and inside longer words). Output: per-entity "
    "mention and document frequencies. Scale: both gazetteer "
    "tables are broadcasts; the probes are equi-joins on the "
    "token/bigram relations (fan-out bounded by dictionary "
    "multiplicity, which is 1 for a deduplicated gazetteer); "
    "count(DISTINCT doc_id) expands to the standard two-level "
    "agg. An n-token gazetteer generalizes with one join per "
    "phrase length — never a per-row loop over the dictionary.",
    tags=("text", "llm", "gazetteer", "tagging", "scale"),
)
def q328_gazetteer_tagging(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents").select(
        "doc_id", tokens("text").alias("tk")
    )
    uni = d.select("doc_id", F.explode("tk").alias("w"))
    bi = (
        d.filter(F.size("tk") >= 2)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(sequence(0, size(tk) - 2), "
                    "i -> struct(tk[i] as w1, tk[i + 1] as w2))"
                )
            ).alias("p"),
        )
        .select("doc_id", "p.w1", "p.w2")
    )
    gu = spark.createDataFrame(
        [(e[0],) for e in _GAZETTEER if len(e) == 1], "w STRING"
    )
    gb = spark.createDataFrame(
        [e for e in _GAZETTEER if len(e) == 2], "w1 STRING, w2 STRING"
    )
    hits = uni.join(F.broadcast(gu), "w").select(
        "doc_id", F.col("w").alias("entity")
    ).unionByName(
        bi.join(F.broadcast(gb), ["w1", "w2"]).select(
            "doc_id",
            F.concat_ws(" ", "w1", "w2").alias("entity"),
        )
    )
    return (
        hits.groupBy("entity")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_mentions"),
            F.countDistinct("doc_id").cast("long").alias("n_docs"),
        )
        .orderBy("entity")
    )


# --- q338: Gopher repetition filters (dup n-gram / top n-gram fractions) ---------
#
# The repetition tier of the Gopher quality rules (Rae et al. 2021,
# "Scaling Language Models: ... Gopher", Table A1 — public): documents
# dominated by repeated n-grams are boilerplate/spam; the filter
# computes, per document, the duplicate-2/3-gram fraction and the
# most-frequent-2-gram share, and keeps docs below the published
# thresholds (0.20 / 0.18 / 0.20 — token-count analogs of the paper's
# character-fraction rules, the standard simplification when chars
# aren't tracked). Micro-quantized (round to 1e-6) so both engines
# agree bit-exactly, the module's standard.

_GR_DUP2_MAX = 200_000  # dup 2-gram fraction threshold (micro)
_GR_DUP3_MAX = 180_000  # dup 3-gram fraction threshold (micro)
_GR_TOP2_MAX = 200_000  # top 2-gram share threshold (micro)


def _gr_gram_sql(n: int) -> str:
    gram = " || ' ' || ".join(f"arr[i+{j}]" for j in range(n))
    return f"""g{n} AS (
      SELECT doc_id, {gram} AS g
      FROM toks, LATERAL unnest(generate_series(1, len(arr) - {n - 1})) t(i)
      WHERE len(arr) >= {n}),
    c{n} AS (SELECT doc_id, g, count(*) AS c FROM g{n} GROUP BY 1, 2),
    s{n} AS (
      SELECT doc_id,
             CAST(round(1000000.0 * (sum(c) - count(*)) / sum(c)) AS BIGINT)
               AS dup{n}_micro,
             CAST(round(1000000.0 * max(c) / sum(c)) AS BIGINT)
               AS top{n}_micro
      FROM c{n} GROUP BY doc_id)"""


@register(
    "q338_gopher_repetition",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id,
             list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                         t -> t <> '') AS arr
      FROM documents),
    {_gr_gram_sql(2)},
    {_gr_gram_sql(3)}
    SELECT t.doc_id,
           CAST(len(t.arr) AS BIGINT) AS n_tokens,
           coalesce(s2.dup2_micro, 0) AS dup2_micro,
           coalesce(s2.top2_micro, 0) AS top2_micro,
           coalesce(s3.dup3_micro, 0) AS dup3_micro,
           (coalesce(s2.dup2_micro, 0) <= {_GR_DUP2_MAX}
            AND coalesce(s3.dup3_micro, 0) <= {_GR_DUP3_MAX}
            AND coalesce(s2.top2_micro, 0) <= {_GR_TOP2_MAX}) AS keep
    FROM toks t
    LEFT JOIN s2 ON t.doc_id = s2.doc_id
    LEFT JOIN s3 ON t.doc_id = s3.doc_id
    ORDER BY t.doc_id
    """,
    doc="GOPHER REPETITION FILTERS (Rae et al. 2021 Table A1, public "
    "rules) — the quality-filter tier q51 lacks: per doc, the "
    "duplicate-2-gram fraction (1 - distinct/total), duplicate-3-gram "
    "fraction, and most-frequent-2-gram share, micro-quantized; keep "
    "iff all three sit under the published thresholds (0.20/0.18/"
    "0.20, token-count analogs). Shape: per-n-gram counts are a "
    "two-level hash agg — groupBy(doc, gram) then groupBy(doc) — so "
    "per-row aggregation state is constant (count/max/sum), nothing "
    "collects a gram LIST per doc; the shuffle key (doc_id, gram) is "
    "maximally spread and a boilerplate-hot gram is still keyed by "
    "doc_id (no global hot key exists, unlike the corpus-wide df "
    "aggregations). Short docs (< n tokens) produce no grams and "
    "keep by definition (fractions 0 via the left join).",
    tags=("llm", "text", "quality", "gopher", "agg"),
)
def q338_gopher_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    return gopher_repetition_stats(t(spark, sf_dir, "documents"))


def gopher_repetition_stats(docs: DataFrame) -> DataFrame:
    """The q338 core over any (doc_id, text) relation — factored for
    crafted-corpus property tests (pure repetition, pure novelty, short
    docs) and forced-scale replays."""
    # toks has THREE consumers and no covering exchange — but it does
    # NOT get the q316/q331 localCheckpoint: the 256× doubling protocol
    # measured the materialized token-ARRAY relation super-linear
    # (64×→256×: ckpt 39.5s→246.2s = 6.2× for 4× data, recompute
    # 41.2s→174.1s = 4.2× ≈ linear — block-manager storage pressure
    # grows with the array payload, while re-running the stateless
    # tokenize costs a flat ~5%). The checkpoint policy's payload
    # corollary: materialize compact relations (q339's 8-byte hashes),
    # recompute wide ones. A contended 64× A/B had shown ckpt −24%;
    # the clean doubling exposed the inversion.
    toks = docs.select("doc_id", tokens("text").alias("tk"))

    def gram_stats(n: int) -> DataFrame:
        g = toks.select(
            "doc_id", F.explode(word_shingles("tk", n)).alias("g")
        )
        per = g.groupBy("doc_id", "g").agg(F.count(F.lit(1)).alias("c"))
        dup = F.round(
            1000000.0 * (F.sum("c") - F.count(F.lit(1))) / F.sum("c")
        ).cast("long")
        top = F.round(1000000.0 * F.max("c") / F.sum("c")).cast("long")
        return per.groupBy("doc_id").agg(
            dup.alias(f"dup{n}_micro"), top.alias(f"top{n}_micro")
        )

    s2, s3 = gram_stats(2), gram_stats(3)
    keep = (
        (F.col("dup2_micro") <= _GR_DUP2_MAX)
        & (F.col("dup3_micro") <= _GR_DUP3_MAX)
        & (F.col("top2_micro") <= _GR_TOP2_MAX)
    )
    return (
        toks.select("doc_id", F.size("tk").cast("long").alias("n_tokens"))
        .join(s2, "doc_id", "left")
        .join(s3.select("doc_id", "dup3_micro"), "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            F.coalesce("dup2_micro", F.lit(0)).alias("dup2_micro"),
            F.coalesce("top2_micro", F.lit(0)).alias("top2_micro"),
            F.coalesce("dup3_micro", F.lit(0)).alias("dup3_micro"),
        )
        .withColumn("keep", keep)
        .orderBy("doc_id")
    )
