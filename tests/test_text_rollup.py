"""Known-answer semantic tests (crafted corpora) for the text-ranking and
rollup queries added in round 2: BM25 term ranking (q97), the rollup
cascade's partial-reaggregation consistency (q99), bigram-LM scoring
monotonicity (q100), and the BPE merge step (q101). The differential
oracle tests in test_queries_oracle.py pin cross-engine equality; these
pin the semantics themselves on inputs with hand-computable answers."""

from __future__ import annotations

import datetime

from columnarmodeling_spark.queries import REGISTRY

DOC_SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"


def _write_docs(spark, tmp_path, rows):
    d = str(tmp_path / "docs")
    spark.createDataFrame(rows, DOC_SCHEMA).coalesce(1).write.parquet(
        d + "/documents.parquet"
    )
    return d


def test_bm25_rare_term_outranks_common(spark, tmp_path):
    # "zebra" appears only in doc 1 (df=1); "common" appears in all three
    # docs (df=3). Same tf within doc 1 -> the rarer term must rank first.
    rows = [
        (1, "common zebra common zebra", "en", "s", 25),
        (2, "common filler words here", "en", "s", 24),
        (3, "common other tokens too", "en", "s", 23),
    ]
    d = _write_docs(spark, tmp_path, rows)
    out = REGISTRY["q97_bm25_topterms"].fn(spark, d).collect()
    doc1 = sorted(
        (r for r in out if r["doc_id"] == 1), key=lambda r: r["rk"]
    )
    assert doc1[0]["term"] == "zebra" and doc1[0]["df"] == 1
    assert doc1[0]["bm25"] > [r for r in doc1 if r["term"] == "common"][0]["bm25"]


def test_rollup_cascade_partials_consistent(spark, tmp_path):
    ts = datetime.datetime(2024, 3, 1, 10, 15, 30)
    rows = [
        (1, ts, 1, "click", 1.25, "{}"),
        (2, ts + datetime.timedelta(seconds=10), 1, "click", 2.5, "{}"),
        (3, ts + datetime.timedelta(minutes=5), 2, "click", 4.0, "{}"),
        (4, ts + datetime.timedelta(hours=3), 2, "click", 8.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    d = str(tmp_path / "ev")
    df.coalesce(1).write.parquet(d + "/events.parquet")
    out = REGISTRY["q99_rollup_cascade"].fn(spark, d).collect()
    by_grain = {}
    for r in out:
        by_grain.setdefault(r["grain"], []).append(r)
    # minute grain: 3 buckets (10:15 x2 events, 10:20, 13:15)
    assert len(by_grain["minute"]) == 3
    # hour grain: 10:00 bucket aggregates the first three events
    h10 = [r for r in by_grain["hour"] if r["bucket_ts"].hour == 10][0]
    assert h10["n_events"] == 3
    assert h10["sum_v"] == 7.75 and h10["min_v"] == 1.25 and h10["max_v"] == 4.0
    # day grain: one bucket holding everything
    (day,) = by_grain["day"]
    assert day["n_events"] == 4 and day["sum_v"] == 15.75
    # cascade consistency: every hour row equals the sum/min/max of its
    # minute partials (the property that makes partial reuse legal)
    for h in by_grain["hour"]:
        mins = [
            m
            for m in by_grain["minute"]
            if m["event_type"] == h["event_type"]
            and m["bucket_ts"].replace(minute=0) == h["bucket_ts"]
        ]
        assert h["n_events"] == sum(m["n_events"] for m in mins)
        assert h["min_v"] == min(m["min_v"] for m in mins)
        assert h["max_v"] == max(m["max_v"] for m in mins)


def test_bigram_logprob_prefers_predictable_text(spark, tmp_path):
    # doc 1 repeats one bigram (maximally predictable); doc 2 is a chain
    # of one-off bigrams. The LM must score doc 1 strictly higher.
    rows = [
        (1, "ping pong ping pong ping pong ping pong", "en", "s", 39),
        (2, "one two three four five six seven eight", "en", "s", 39),
    ]
    d = _write_docs(spark, tmp_path, rows)
    out = {r["doc_id"]: r for r in REGISTRY["q100_bigram_logprob"].fn(spark, d).collect()}
    assert out[1]["n_bigrams"] == 7 and out[2]["n_bigrams"] == 7
    assert out[1]["avg_logprob"] > out[2]["avg_logprob"]


def test_bpe_merge_counts_weighted_by_occurrence(spark, tmp_path):
    # token "aaab" twice -> pairs aa,aa,ab per occurrence: aa=4, ab=2;
    # "cd" once -> cd=1. Single-char tokens contribute nothing.
    rows = [(1, "aaab aaab cd x", "en", "s", 14)]
    d = _write_docs(spark, tmp_path, rows)
    out = {r["pair"]: r for r in REGISTRY["q101_bpe_merge_topk"].fn(spark, d).collect()}
    assert out["aa"]["cnt"] == 4 and out["aa"]["rk"] == 1
    assert out["ab"]["cnt"] == 2
    assert out["cd"]["cnt"] == 1
    assert "x" not in out
