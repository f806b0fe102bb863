"""Hypothesis differential tests for the round-15 operators: randomized
small-vocab corpora (heavy collisions by construction) against exact
pure-Python references, shrinkable on failure — the same discipline as
test_round14_props.

- q340: banding + verify vs brute-force all-pairs Hamming over
  independently recomputed fingerprints (the pigeonhole
  no-false-negative claim searched over random corpora).
- q341: span removal vs brute-force LCP + interval merge, plus the
  token-conservation invariant on every example.
- q343: components over q340 pairs vs pure-Python union-find
  (transitive closure searched over random corpora).
"""

from __future__ import annotations

import hashlib

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from columnarmodeling_spark.queries.llm_dedup import (
    exact_span_removal,
    simhash_hamming_pairs,
)

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


def _fp(toks, bits=60):
    votes = [0] * bits
    for w in toks:
        u = int(hashlib.md5(w.encode()).hexdigest()[:15], 16)
        for j in range(bits):
            votes[j] += 1 if (u >> j) & 1 else -1
    return sum(1 << j for j in range(bits) if votes[j] > 0)


def _brute_pairs(corpus, k=3):
    fps = {d: _fp(t) for d, t in enumerate(corpus) if t}
    out = {}
    ids = sorted(fps)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            h = bin(fps[a] ^ fps[b]).count("1")
            if h <= k:
                out[(a, b)] = h
    return out


# --- q340 vs brute-force Hamming ------------------------------------------------


@_settings
@given(corpus=_corpus)
def test_q340_matches_brute_force(spark, corpus):
    want = _brute_pairs(corpus)
    got = {
        (r.doc_a, r.doc_b): r.hamming
        for r in simhash_hamming_pairs(_docs_df(spark, corpus)).collect()
    }
    assert got == want


# --- q341 vs brute-force LCP + interval merge -----------------------------------


def _ref_removal(corpus, k=5, t=3):
    suf = []
    for d, toks in enumerate(corpus):
        for i in range(len(toks)):
            suf.append((d, i + 1, tuple(toks[i : i + k])))
    out = {}
    for d, toks in enumerate(corpus):
        spans = []
        for dd, pos, sa in suf:
            if dd != d:
                continue
            m = 0
            for db, pb, sb in suf:
                if (db, pb) == (dd, pos):
                    continue
                l = 0
                while l < len(sa) and l < len(sb) and sa[l] == sb[l]:
                    l += 1
                m = max(m, l)
            if m >= t:
                spans.append((pos, pos + m - 1))
        merged: list[list[int]] = []
        for s, e in sorted(spans):
            if merged and s <= merged[-1][1]:
                merged[-1][1] = max(merged[-1][1], e)
            else:
                merged.append([s, e])
        removed = sum(e - s + 1 for s, e in merged)
        out[d] = (len(toks), len(merged), removed, len(toks) - removed)
    return out


@_settings
@given(corpus=_corpus)
def test_q341_matches_reference_and_conserves(spark, corpus):
    ref = _ref_removal(corpus)
    rows = exact_span_removal(
        _docs_df(spark, corpus), k=5, cut_t=3
    ).collect()
    got = {
        r.doc_id: (r.n_tokens, r.n_spans, r.n_removed, r.n_kept)
        for r in rows
    }
    assert got == ref
    for r in rows:
        assert r.n_removed + r.n_kept == r.n_tokens


# --- q343 vs pure-python union-find ---------------------------------------------


@_settings
@given(corpus=_corpus)
def test_q343_components_match_union_find(spark, corpus):
    from columnarmodeling_spark.operators.graph import connected_components

    parent = {d: d for d in range(len(corpus))}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in _brute_pairs(corpus):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = {d: find(d) for d in range(len(corpus))}

    docs = _docs_df(spark, corpus)
    pairs = simhash_hamming_pairs(docs).select("doc_a", "doc_b")
    cc = connected_components(
        docs.select("doc_id"), pairs, id_col="doc_id",
        src_col="doc_a", dst_col="doc_b",
    )
    got = {r.id: r.component for r in cc.collect()}
    assert got == want
