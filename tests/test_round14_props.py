"""Hypothesis differential tests for the round-14 operators: randomized
small-vocab corpora (heavy collisions by construction) against exact
pure-Python references. These complement test_round14_ops's crafted
cases with shrinkable random search over the input space.

Corpora stay <= ~30 tokens/doc so micro-quantization (round(1e6 * k/n))
never lands on an exact .5 (needs 2^7 | n, impossible at n <= 127) —
the same boundary-avoidance discipline as the engine's other
micro-quantized ops, here keeping Python's banker's rounding a valid
reference for Spark's HALF_UP.
"""

from __future__ import annotations

from collections import Counter

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from columnarmodeling_spark.queries.llm_dedup import (
    chunk_dedup_stats,
    suffix_repeat_stats,
)
from columnarmodeling_spark.queries.llm_text import gopher_repetition_stats

_VOCAB = ["the", "of", "cat", "dog", "x9"]

_corpus = st.lists(
    st.lists(st.sampled_from(_VOCAB), min_size=0, max_size=24),
    min_size=1,
    max_size=6,
)

_settings = settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _docs_df(spark, corpus):
    return spark.createDataFrame(
        [(i, " ".join(toks)) for i, toks in enumerate(corpus)],
        "doc_id LONG, text STRING",
    )


# --- q338 vs exact reference ----------------------------------------------------


def _ref_gopher(corpus):
    out = {}
    for d, toks in enumerate(corpus):
        row = {"n_tokens": len(toks)}
        for n in (2, 3):
            grams = [tuple(toks[i : i + n]) for i in range(len(toks) - n + 1)]
            if grams:
                c = Counter(grams)
                tot, dst, top = len(grams), len(c), max(c.values())
                row[f"dup{n}"] = round(1e6 * (tot - dst) / tot)
                row[f"top{n}"] = round(1e6 * top / tot)
            else:
                row[f"dup{n}"], row[f"top{n}"] = 0, 0
        out[d] = row
    return out


@_settings
@given(corpus=_corpus)
def test_q338_matches_reference(spark, corpus):
    ref = _ref_gopher(corpus)
    got = {
        r.doc_id: r.asDict()
        for r in gopher_repetition_stats(_docs_df(spark, corpus)).collect()
    }
    assert set(got) == set(ref)
    for d, e in ref.items():
        g = got[d]
        assert (g["n_tokens"], g["dup2_micro"], g["top2_micro"], g["dup3_micro"]) == (
            e["n_tokens"], e["dup2"], e["top2"], e["dup3"],
        ), f"doc {d}: {g} != {e}"


# --- q339 vs exact reference ----------------------------------------------------


def _ref_chunks(corpus, w):
    seen = {}
    per = {}
    chunks_by_doc = {}
    for d, toks in enumerate(corpus):
        chunks_by_doc[d] = [
            tuple(toks[i : i + w]) for i in range(0, len(toks), w)
        ]
    for d in sorted(chunks_by_doc):
        for idx, ch in enumerate(chunks_by_doc[d]):
            seen.setdefault(ch, (d, idx))
    for d, chs in chunks_by_doc.items():
        kept = sum(1 for idx, ch in enumerate(chs) if seen[ch] == (d, idx))
        n = len(chs)
        per[d] = (n, kept, round(1e6 * kept / n) if n else 0)
    return per


@_settings
@given(corpus=_corpus, w=st.sampled_from([3, 8]))
def test_q339_matches_reference(spark, corpus, w):
    ref = _ref_chunks(corpus, w)
    got = {
        r.doc_id: (r.n_chunks, r.n_kept, r.kept_micro)
        for r in chunk_dedup_stats(_docs_df(spark, corpus), width=w).collect()
    }
    assert got == ref


# --- q330 hot-head escape vs brute force (shrinkable variant) -------------------


def _ref_repeats(corpus, k, t):
    suf = []
    for d, toks in enumerate(corpus):
        for i in range(len(toks)):
            suf.append((d, tuple(toks[i : i + k])))
    out = {}
    for d in range(len(corpus)):
        vals = []
        for i, (da, sa) in enumerate(suf):
            if da != d:
                continue
            m = 0
            for j, (db, sb) in enumerate(suf):
                if i != j:
                    l = 0
                    while l < len(sa) and l < len(sb) and sa[l] == sb[l]:
                        l += 1
                    m = max(m, l)
            vals.append(m)
        out[d] = (max(vals) if vals else 0, sum(1 for v in vals if v >= t))
    return out


@_settings
@given(
    corpus=st.lists(
        st.lists(st.sampled_from(_VOCAB), min_size=0, max_size=10),
        min_size=1,
        max_size=5,
    )
)
def test_q330_hot_escape_matches_brute(spark, corpus):
    ref = _ref_repeats(corpus, k=4, t=2)
    got = {
        r.doc_id: (r.max_repeat, r.n_rep_pos)
        for r in suffix_repeat_stats(
            _docs_df(spark, corpus), k=4, rep_t=2, hot_head_threshold=2
        ).collect()
    }
    assert got == ref
