"""Property tests for the round-14 additions.

1. q330's hot-head skew escape (auto-widened 2-token bucket + max(lcp,1)
   floor) must be EXACT, not approximate: forced-low thresholds route
   every head through the widened path and the results must equal both
   the unwidened form and a brute-force all-pairs oracle — including
   the two cases the widening could break (true LCP == 1 partners that
   disagree on token 2, and length-1 suffixes with no second token).
2. q335 (sharded-index stream gate) must drain to state byte-identical
   to q334 (the shard key is a pure function of the join key).
3. q336 (learned-lexicon cross-lingual near-dup) must find translated
   duplicates with ZERO surface-form overlap — the capability the
   hashed-interlingua q331 structurally cannot have, and the reason a
   real lexicon is worth a broadcast join.
"""

from __future__ import annotations

import re

from columnarmodeling_spark.queries import REGISTRY
from columnarmodeling_spark.queries.llm_dedup import (
    lexicon_crosslingual_matches,
    suffix_repeat_stats,
)

SF = "/root/testdata/sf0.001"

_HUGE = 1 << 60  # threshold that disables the hot-head path


def _tok(s: str) -> list[str]:
    return [w for w in re.split(r"[^a-z0-9]+", s.lower()) if w]


def _brute(texts: dict[int, str], k: int, t: int) -> dict[int, tuple[int, int]]:
    suf = []
    for d, txt in texts.items():
        arr = _tok(txt)
        for i in range(len(arr)):
            suf.append((d, tuple(arr[i : i + k])))
    out: dict[int, tuple[int, int]] = {}
    for d, txt in texts.items():
        vals = []
        for i, (da, sa) in enumerate(suf):
            if da != d:
                continue
            m = 0
            for j, (db, sb) in enumerate(suf):
                if i == j:
                    continue
                l = 0
                while l < len(sa) and l < len(sb) and sa[l] == sb[l]:
                    l += 1
                m = max(m, l)
            vals.append(m)
        out[d] = (max(vals) if vals else 0, sum(1 for v in vals if v >= t))
    return out


def _stats(spark, texts, k, t, thresh):
    docs = spark.createDataFrame(
        [(d, s) for d, s in texts.items()], "doc_id LONG, text STRING"
    )
    return {
        r.doc_id: (r.max_repeat, r.n_rep_pos)
        for r in suffix_repeat_stats(
            docs, k=k, rep_t=t, hot_head_threshold=thresh
        ).collect()
    }


# --- q330 hot-head escape -----------------------------------------------------


def test_q330_hot_escape_zipf_corpus_exact(spark):
    # "the" heads ~half of all suffixes — the Zipf shape the escape
    # exists for. threshold=2 forces EVERY repeated head through the
    # widened path; both forms must equal brute force.
    texts = {
        0: "the cat the dog the fox ran over the hill",
        1: "the dog the fox ran fast the cat slept",
        2: "a quiet zebra the fox ran over the dog",
        3: "unique tokens only here nothing repeats much",
    }
    brute = _brute(texts, k=6, t=2)
    wide = _stats(spark, texts, 6, 2, thresh=2)
    plain = _stats(spark, texts, 6, 2, thresh=_HUGE)
    assert wide == brute
    assert plain == brute


def test_q330_hot_escape_lcp1_floor(spark):
    # true LCP == 1: partners agree on the (hot) head token but nothing
    # else — the widened bucket separates them, the max(lcp,1) floor
    # must restore the value.
    texts = {0: "a b", 1: "a c", 2: "a d"}
    wide = _stats(spark, texts, 4, 1, thresh=2)
    assert wide == {0: (1, 1), 1: (1, 1), 2: (1, 1)}
    assert wide == _stats(spark, texts, 4, 1, thresh=_HUGE)


def test_q330_hot_escape_length1_suffix(spark):
    # length-1 suffixes (doc-final hot token): no second token, bucket
    # under the sentinel; their only possible repeat (LCP 1) must
    # survive via the floor.
    texts = {0: "x a", 1: "y a"}
    wide = _stats(spark, texts, 4, 1, thresh=2)
    # per doc: the final "a" suffix repeats (LCP 1); "x a"/"y a" heads
    # are unique (LCP 0) -> max 1, one position >= 1
    assert wide == {0: (1, 1), 1: (1, 1)}
    assert wide == _stats(spark, texts, 4, 1, thresh=_HUGE)


def test_q330_hot_escape_randomized(spark):
    # small-vocab random corpus: heavy repeats at every length; the
    # widened form must stay exact against brute force.
    import random

    rng = random.Random(1404)
    vocab = ["the", "of", "to", "cat", "dog"]
    texts = {
        d: " ".join(rng.choice(vocab) for _ in range(rng.randint(1, 12)))
        for d in range(8)
    }
    brute = _brute(texts, k=5, t=3)
    assert _stats(spark, texts, 5, 3, thresh=2) == brute
    assert _stats(spark, texts, 5, 3, thresh=_HUGE) == brute


def test_q330_default_threshold_inert_at_test_scale(spark):
    # at sf0.001 no head is near _SA_HOT: the registered query must be
    # unaffected by the escape machinery (pure no-op join against an
    # empty hot set). r14 ADVICE: assert full-output equality against
    # the escape-DISABLED form (huge threshold) on the same relation —
    # "some repeats exist" alone would miss a regression where an
    # empty hot set still perturbs results.
    from columnarmodeling_spark.queries._util import t as _t

    got = REGISTRY["q330_suffix_repeats"].fn(spark, SF).collect()
    assert any(r.max_repeat > 0 for r in got)
    disabled = (
        suffix_repeat_stats(
            _t(spark, SF, "documents"), hot_head_threshold=_HUGE
        )
        .collect()
    )
    assert [tuple(r) for r in got] == [tuple(r) for r in disabled]


# --- q335 sharded stream gate ≡ q334 broadcast gate ---------------------------


def test_q335_equals_q334_drained_state(spark):
    a = REGISTRY["q334_stream_neardup_gate"].fn(spark, SF).collect()
    b = REGISTRY["q335_stream_neardup_gate_sharded"].fn(spark, SF).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]
    assert len(a) > 0


# --- q336 learned-lexicon cross-lingual near-dup ------------------------------


def test_q336_finds_zero_overlap_translations(spark):
    # en and zh docs share NO surface token; the lexicon aligns them to
    # the same concepts -> q336 must match them. q331's hashed
    # interlingua (surface-form hashing) structurally cannot.
    docs = spark.createDataFrame(
        [
            (1, "en", "table row filter join table row"),
            (2, "zh", "biao hang guolv lianjie biao hang"),
            (3, "zh", "wuguan cihui zhan"),
        ],
        "doc_id LONG, lang STRING, text STRING",
    )
    lex = spark.createDataFrame(
        [
            ("table", "en", 0), ("biao", "zh", 0),
            ("row", "en", 1), ("hang", "zh", 1),
            ("filter", "en", 2), ("guolv", "zh", 2),
            ("join", "en", 3), ("lianjie", "zh", 3),
        ],
        "word STRING, wlang STRING, c LONG",
    )
    got = lexicon_crosslingual_matches(docs, lex).collect()
    assert len(got) == 1
    r = got[0]
    # identical concept SETS -> identical signatures -> est 1.0
    assert (r.doc_xx, r.lang, r.doc_en, r.est_micro) == (2, "zh", 1, 1000000)


def test_q336_oov_tokens_drop(spark):
    # a doc of only-OOV tokens produces no concepts and never matches
    docs = spark.createDataFrame(
        [
            (1, "en", "table row"),
            (2, "zh", "zzz qqq ppp"),
        ],
        "doc_id LONG, lang STRING, text STRING",
    )
    lex = spark.createDataFrame(
        [("table", "en", 0), ("row", "en", 1)],
        "word STRING, wlang STRING, c LONG",
    )
    assert lexicon_crosslingual_matches(docs, lex).count() == 0


# --- q337 key-join disjointness ≡ q28 array form -------------------------------


def test_q337_equals_q28(spark):
    a = {
        (r.pri_a, r.pri_b): (r.disjoint, r.n_shared)
        for r in REGISTRY["q28_disjointness"].fn(spark, SF).collect()
    }
    b = {
        (r.pri_a, r.pri_b): (r.disjoint, r.n_shared)
        for r in REGISTRY["q337_disjointness_keyjoin"].fn(spark, SF).collect()
    }
    assert a == b
    assert len(b) > 0


# --- q338 Gopher repetition filters --------------------------------------------


def test_q338_crafted_fractions(spark):
    from columnarmodeling_spark.queries.llm_text import (
        gopher_repetition_stats,
    )

    docs = spark.createDataFrame(
        [
            (0, "x x x x x x"),          # pure repetition
            (1, "a b c d e f"),          # pure novelty
            (2, "one"),                  # too short for any gram
            (3, "p q p q p q p q"),      # alternating
        ],
        "doc_id LONG, text STRING",
    )
    got = {
        r.doc_id: r.asDict() for r in gopher_repetition_stats(docs).collect()
    }
    # doc 0: five 2-grams, all "x x" -> dup 4/5, top 5/5; keep False
    assert got[0]["dup2_micro"] == 800000
    assert got[0]["top2_micro"] == 1000000
    assert got[0]["keep"] is False
    # doc 1: all grams distinct -> 0/low; keep True
    assert got[1]["dup2_micro"] == 0
    assert got[1]["dup3_micro"] == 0
    assert got[1]["keep"] is True
    # doc 2: no grams at all -> zeros, keep True
    assert got[2] == {
        "doc_id": 2, "n_tokens": 1, "dup2_micro": 0, "top2_micro": 0,
        "dup3_micro": 0, "keep": True,
    }
    # doc 3: seven 2-grams = 4x "p q" + 3x "q p" -> dup 5/7, top 4/7
    assert got[3]["dup2_micro"] == round(1e6 * 5 / 7)
    assert got[3]["top2_micro"] == round(1e6 * 4 / 7)
    assert got[3]["keep"] is False


# --- q339 chunk-level first-occurrence dedup ------------------------------------


def test_q339_first_occurrence_wins(spark):
    from columnarmodeling_spark.queries.llm_dedup import chunk_dedup_stats

    boiler = "b1 b2 b3 b4"  # one 4-token chunk at width=4
    docs = spark.createDataFrame(
        [
            (0, boiler),                           # owns the first copy
            (1, f"{boiler} u1 u2 u3 u4"),          # copy drops, tail kept
            (2, "s1 s2 s3 s4 s1 s2 s3 s4"),        # within-doc duplicate
            (3, ""),                               # empty doc
            (4, "t1 t2"),                          # partial chunk only
        ],
        "doc_id LONG, text STRING",
    )
    got = {
        r.doc_id: (r.n_chunks, r.n_kept, r.kept_micro)
        for r in chunk_dedup_stats(docs, width=4).collect()
    }
    assert got[0] == (1, 1, 1000000)
    assert got[1] == (2, 1, 500000)   # boilerplate chunk deduped away
    assert got[2] == (2, 1, 500000)   # second within-doc copy drops
    assert got[3] == (0, 0, 0)
    assert got[4] == (1, 1, 1000000)  # partial chunk is still content
