"""Property tests for the round-12 operator additions (q312-q322).

The differential oracle tests in test_queries_oracle.py already pin both
engines to identical values; these tests pin the SEMANTICS — the
invariants a refactor could silently break while both engines drift
together.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from columnarmodeling_spark.queries import REGISTRY

SF = "/root/testdata/sf0.001"


# --- q312: URL canonicalization ----------------------------------------------


def _canonicalize(spark, urls: list[str]):
    """Run the q312 canonicalization chain over arbitrary URL literals."""
    from columnarmodeling_spark.queries.llm_text import _url_canon_steps

    df = spark.createDataFrame([(u,) for u in urls], "url STRING")
    for col, expr in _url_canon_steps("spark"):
        df = df.withColumn(col, F.expr(expr))
    return dict(zip(urls, [r.canon_url for r in df.select("canon_url").collect()]))


def test_q312_canonicalization_rules(spark):
    got = _canonicalize(
        spark,
        [
            "HTTP://WWW.Ex.COM:80/a/b/?utm_source=x&z=1&a=2#frag",
            "https://ex.com:443/a",
            "https://ex.com:8443/a",  # non-default port preserved
            "http://m.ex.com/",
            "https://ex.com/a?utm_a=1&utm_b=2",  # all params stripped
        ],
    )
    assert got["HTTP://WWW.Ex.COM:80/a/b/?utm_source=x&z=1&a=2#frag"] == (
        "http://ex.com/a/b?a=2&z=1"
    )
    assert got["https://ex.com:443/a"] == "https://ex.com/a"
    assert got["https://ex.com:8443/a"] == "https://ex.com:8443/a"
    assert got["http://m.ex.com/"] == "http://ex.com/"
    assert got["https://ex.com/a?utm_a=1&utm_b=2"] == "https://ex.com/a"


def test_q312_canonicalization_idempotent(spark):
    """Canonicalizing a canonical URL must be a no-op (fixed point)."""
    dirty = [
        "HTTP://WWW.Ex.COM:80/a/b/?utm_source=x&z=1&a=2#frag",
        "https://ex.com:8443/p/?b=2&a=1",
        "http://m.ex.com/x?utm_x=1",
    ]
    once = _canonicalize(spark, dirty)
    twice = _canonicalize(spark, list(once.values()))
    for u in dirty:
        assert twice[once[u]] == once[u]


def test_q312_host_rollup_accounts_every_doc(spark):
    df = REGISTRY["q312_url_canonicalize"].fn(spark, SF)
    rows = df.collect()
    n_docs = sum(r.n_docs for r in rows)
    total = spark.read.parquet(f"{SF}/documents.parquet").count()
    assert n_docs == total
    for r in rows:
        # four dirt patterns -> at most 4 distinct canonical URLs per doc_id,
        # every host is the stripped registrable form
        assert r.n_urls <= r.n_docs
        assert not r.host.startswith(("www.", "m."))
        assert r.sample_url.startswith(("http://", "https://"))
        assert "#" not in r.sample_url and "utm_" not in r.sample_url


# --- q313: Fellegi-Sunter record linkage --------------------------------------


def test_q313_weights_and_thresholds(spark):
    from columnarmodeling_spark.queries.analytics import _FS_W

    rows = REGISTRY["q313_record_linkage"].fn(spark, SF).collect()
    assert rows, "blocking produced no candidate pairs"
    for r in rows:
        expected = sum(
            _FS_W[f][0] if getattr(r, f) == 1 else _FS_W[f][1]
            for f in ("seg", "bal", "phon")
        )
        assert r.weight_micro == expected
        if r.weight_micro >= 4_000_000:
            assert r.decision == "match"
        elif r.weight_micro <= 0:
            assert r.decision == "nonmatch"
        else:
            assert r.decision == "review"
    # full-agreement pattern outranks every other pattern it appears with
    weights = {(r.seg, r.bal, r.phon): r.weight_micro for r in rows}
    if (1, 1, 1) in weights:
        assert weights[(1, 1, 1)] == max(weights.values())


def test_q313_pair_count_matches_blocking(spark):
    rows = REGISTRY["q313_record_linkage"].fn(spark, SF).collect()
    n_pairs = sum(r.n_pairs for r in rows)
    c = spark.read.parquet(f"{SF}/customer.parquet").select(
        F.col("c_nationkey").alias("nat"),
        F.expr("CAST(floor(c_acctbal / 1000) AS BIGINT)").alias("band"),
    )
    blocks = c.groupBy("nat", "band").count().collect()
    expected = sum(b["count"] * (b["count"] - 1) // 2 for b in blocks)
    assert n_pairs == expected


# --- q314: Kaplan-Meier --------------------------------------------------------


def test_q314_km_invariants(spark):
    rows = REGISTRY["q314_kaplan_meier"].fn(spark, SF).collect()
    assert rows
    prev_day = -1
    prev_surv = 1_000_000
    total_exits = 0
    n0 = rows[0].at_risk + 0  # first-day risk set = cohort size
    for r in rows:
        assert r.day > prev_day
        # survival is non-increasing and only drops on event days
        assert r.surv_micro <= prev_surv
        if r.events == 0:
            assert r.surv_micro == prev_surv
        # risk set = cohort minus everyone who exited strictly earlier
        assert r.at_risk == n0 - total_exits
        total_exits += r.events + r.censored
        prev_day, prev_surv = r.day, r.surv_micro
    assert total_exits == n0  # everyone exits by the horizon


def test_q314_km_matches_pure_python(spark):
    """Replay the product-limit estimator in plain Python."""
    rows = REGISTRY["q314_kaplan_meier"].fn(spark, SF).collect()
    s = 1.0
    dead = False
    for r in rows:
        if r.events >= r.at_risk:
            dead = True
        if not dead and r.events > 0:
            s *= 1.0 - r.events / r.at_risk
        expect = 0 if dead else round(1_000_000 * s)
        assert r.surv_micro == expect


# --- q315: difference-in-differences -------------------------------------------


def test_q315_did_identity(spark):
    r = REGISTRY["q315_diff_in_differences"].fn(spark, SF).collect()[0]
    did = (r.mean_t1_micro - r.mean_t0_micro) - (
        r.mean_c1_micro - r.mean_c0_micro
    )
    # did is quantized once from doubles, the identity from the four
    # already-quantized means can differ by the four roundings
    assert abs(r.did_micro - did) <= 2
    assert r.se_micro > 0
    assert abs(r.t_milli - round(1000 * r.did_micro / r.se_micro)) <= 1
    assert min(r.n_t0, r.n_t1, r.n_c0, r.n_c1) > 1


# --- q316: DSIR importance -----------------------------------------------------


def test_q316_top_slice_is_target_enriched(spark):
    df = REGISTRY["q316_dsir_importance"].fn(spark, SF)
    rows = df.collect()
    assert len(rows) > 0
    assert [r.rn for r in rows] == list(range(1, len(rows) + 1))
    scores = [r.score_micro for r in rows]
    assert scores == sorted(scores, reverse=True)
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    base_rate = (
        docs.filter(F.col("lang") == "en").count() / docs.count()
    )
    top_rate = sum(1 for r in rows if r.lang == "en") / len(rows)
    # importance resampling must enrich the target distribution
    assert top_rate > base_rate


def test_q316_scores_replay_in_python(spark):
    """Recompute the bucket weights + one doc score in plain Python."""
    import hashlib
    import re
    from collections import Counter

    B = 64
    docs = spark.read.parquet(f"{SF}/documents.parquet").collect()

    def buckets(text):
        toks = [t for t in re.split("[^a-z0-9]+", text.lower()) if t]
        return [
            int(hashlib.md5(t.encode()).hexdigest()[:15], 16) % B
            for t in toks
        ]

    ca: Counter = Counter()
    ct: Counter = Counter()
    for d in docs:
        bs = buckets(d.text)
        ca.update(bs)
        if d.lang == "en":
            ct.update(bs)
    ta, tt = sum(ca.values()), sum(ct.values())
    w = {
        b: round(
            1_000_000
            * math.log(
                ((ct.get(b, 0) + 1.0) / (tt + B))
                / ((ca.get(b, 0) + 1.0) / (ta + B))
            )
        )
        for b in ca
    }
    expect = {
        d.doc_id: sum(w[b] for b in buckets(d.text))
        for d in docs
        if buckets(d.text)
    }
    got = {
        r.doc_id: r.score_micro
        for r in REGISTRY["q316_dsir_importance"].fn(spark, SF).collect()
    }
    for doc_id, score in got.items():
        assert expect[doc_id] == score


# --- q317: LSH parameter tuning ------------------------------------------------


def test_q317_grid_and_decision(spark):
    rows = REGISTRY["q317_lsh_param_tuning"].fn(spark, SF).collect()
    assert {(r.bands, r.rows_per_band) for r in rows} == {
        (16, 1), (8, 2), (4, 4), (2, 8), (1, 16)
    }
    assert sum(r.chosen for r in rows) == 1
    costs = [r.cost_micro for r in rows]
    assert costs == sorted(costs)
    assert rows[0].chosen == 1
    for r in rows:
        assert r.cost_micro == r.fn_micro + r.fp_micro
        assert r.fn_micro >= 0 and r.fp_micro >= 0


def test_q317_scurve_monotonicity(spark):
    """More rows per band -> stricter candidates: FN mass rises, FP falls."""
    rows = sorted(
        REGISTRY["q317_lsh_param_tuning"].fn(spark, SF).collect(),
        key=lambda r: r.rows_per_band,
    )
    fns = [r.fn_micro for r in rows]
    fps = [r.fp_micro for r in rows]
    assert fns == sorted(fns)
    assert fps == sorted(fps, reverse=True)


# --- q318: span-corruption planning ---------------------------------------------


def test_q318_mask_accounting(spark):
    rows = REGISTRY["q318_span_corruption_plan"].fn(spark, SF).collect()
    assert rows
    for r in rows:
        assert r.visible_tokens == r.n_tokens - r.masked_tokens
        assert 0 <= r.masked_tokens <= r.n_tokens
        assert r.n_sentinels <= r.n_spans
        if r.n_spans == 0:
            assert r.masked_tokens == 0 and r.n_sentinels == 0
        else:
            # merged islands cover at least one span and at most all of
            # them laid end-to-end
            assert r.n_sentinels >= 1
            assert r.masked_tokens <= 3 * r.n_spans


def test_q318_replays_in_python(spark):
    import hashlib
    import re

    docs = spark.read.parquet(f"{SF}/documents.parquet").collect()
    got = {
        r.doc_id: r
        for r in REGISTRY["q318_span_corruption_plan"].fn(spark, SF).collect()
    }
    for d in docs[:50]:
        toks = [t for t in re.split("[^a-z0-9]+", d.text.lower()) if t]
        n = len(toks)
        n_noise = (15 * n + 50) // 100
        n_spans = max(1, (n_noise + 2) // 3) if n >= 8 else 0
        r = got[d.doc_id]
        assert r.n_tokens == n and r.n_spans == n_spans
        if n_spans == 0:
            continue
        cands = sorted(
            range(1, n - 2 + 1),
            key=lambda p: (
                int(
                    hashlib.md5(f"{d.doc_id}:{p}".encode()).hexdigest()[:15],
                    16,
                ),
                p,
            ),
        )[:n_spans]
        spans = sorted((s, s + 2) for s in cands)
        islands = []
        for s, e in spans:
            if islands and s <= islands[-1][1]:
                islands[-1][1] = max(islands[-1][1], e)
            else:
                islands.append([s, e])
        masked = sum(min(e, n) - s + 1 for s, e in islands)
        assert r.n_sentinels == len(islands)
        assert r.masked_tokens == masked


# --- q319: host quota cap --------------------------------------------------------


def test_q319_quota_arithmetic(spark):
    rows = REGISTRY["q319_host_quota_cap"].fn(spark, SF).collect()
    assert rows
    for r in rows:
        assert r.cap == 3 * math.ceil(math.sqrt(r.n_docs))
        assert r.kept == min(r.cap, r.n_docs)
        assert r.kept + r.dropped == r.n_docs
        assert r.kept_chars >= 0 and r.dropped_chars >= 0
    total = sum(r.n_docs for r in rows)
    assert total == spark.read.parquet(f"{SF}/documents.parquet").count()


def test_q319_sqrt_damping_is_sublinear():
    """The cap rule itself: 100x the docs -> ~10x the slots."""
    assert 3 * math.ceil(math.sqrt(100)) == 30
    assert 3 * math.ceil(math.sqrt(10000)) == 300


# --- q320: Kneser-Ney ------------------------------------------------------------


def test_q320_kn_probability_mass(spark):
    """Sum of P(w2|w1) over OBSERVED w2 must be <= 1 for every context
    (the discounted mass funds unseen continuations)."""
    import re
    from collections import Counter, defaultdict

    docs = spark.read.parquet(f"{SF}/documents.parquet").collect()
    c2: Counter = Counter()
    for d in docs:
        toks = [t for t in re.split("[^a-z0-9]+", d.text.lower()) if t]
        c2.update(zip(toks, toks[1:]))
    c1: Counter = Counter()
    n1f: Counter = Counter()
    n1r: Counter = Counter()
    for (w1, w2), c in c2.items():
        c1[w1] += c
        n1f[w1] += 1
        n1r[w2] += 1
    n1all = len(c2)
    by_ctx = defaultdict(float)
    for (w1, w2), c in c2.items():
        p = max(c - 0.75, 0.0) / c1[w1] + (0.75 * n1f[w1] / c1[w1]) * (
            n1r[w2] / n1all
        )
        by_ctx[w1] += p
    assert all(s <= 1.0 + 1e-9 for s in by_ctx.values())


def test_q320_matches_pure_python(spark):
    import re
    from collections import Counter

    docs = spark.read.parquet(f"{SF}/documents.parquet").collect()
    c2: Counter = Counter()
    toks_by_doc = {}
    for d in docs:
        toks = [t for t in re.split("[^a-z0-9]+", d.text.lower()) if t]
        toks_by_doc[d.doc_id] = toks
        c2.update(zip(toks, toks[1:]))
    c1: Counter = Counter()
    n1f: Counter = Counter()
    n1r: Counter = Counter()
    for (w1, w2), c in c2.items():
        c1[w1] += c
        n1f[w1] += 1
        n1r[w2] += 1
    n1all = len(c2)
    got = {
        r.doc_id: r
        for r in REGISTRY["q320_kneser_ney_bigram"].fn(spark, SF).collect()
    }
    for doc_id, toks in toks_by_doc.items():
        bigrams = list(zip(toks, toks[1:]))
        if not bigrams:
            assert doc_id not in got
            continue
        lqs = [
            round(
                1_000_000
                * math.log(
                    max(c2[b] - 0.75, 0.0) / c1[b[0]]
                    + (0.75 * n1f[b[0]] / c1[b[0]]) * (n1r[b[1]] / n1all)
                )
            )
            for b in bigrams
        ]
        r = got[doc_id]
        assert r.n_bigrams == len(bigrams)
        # Python's round() is banker's, Spark/DuckDB round HALF_UP — on
        # an exact .5 tie the last digit differs by 1e-6; compare to the
        # unrounded mean instead of re-rounding.
        assert abs(r.avg_logprob - (sum(lqs) / len(lqs)) / 1_000_000) <= 1e-6


# --- q321: adaptive histogram binning --------------------------------------------


def test_q321_decision_and_coverage(spark):
    rows = REGISTRY["q321_adaptive_histogram"].fn(spark, SF).collect()
    assert rows
    r0 = rows[0]
    assert r0.rule in ("fd", "sturges")
    if r0.rule == "fd":
        assert r0.k_used == min(512, max(1, r0.k_fd))
    else:
        assert r0.k_fd == 0 and r0.k_used == min(512, max(1, r0.k_sturges))
    bins = [r.bin for r in rows]
    assert all(0 <= b < r0.k_used for b in bins)
    assert len(set(bins)) == len(bins)
    total = sum(r.cnt for r in rows)
    assert total == spark.read.parquet(f"{SF}/events.parquet").count()


def test_q321_fd_width_matches_numpy_convention(spark):
    """k_fd must equal ceil(span / (2*IQR/cbrt(n))) on rank-based quartiles."""
    import math as m

    ev = sorted(
        (r.value, r.event_id)
        for r in spark.read.parquet(f"{SF}/events.parquet").collect()
    )
    xs = [v for v, _ in ev]
    n = len(xs)
    q1 = xs[(n + 3) // 4 - 1]
    q3 = xs[(3 * n + 3) // 4 - 1]
    h = 2.0 * (q3 - q1) / n ** (1.0 / 3.0)
    want = m.ceil(round(1e9 * (xs[-1] - xs[0]) / h) / 1e9)
    r0 = REGISTRY["q321_adaptive_histogram"].fn(spark, SF).collect()[0]
    assert r0.k_fd == want


# --- q322: budget waterfill --------------------------------------------------------


def test_q322_waterfill_structure(spark):
    rows = REGISTRY["q322_budget_waterfill"].fn(spark, SF).collect()
    assert rows
    total_tokens = sum(r.tokens for r in rows)
    budget = (4 * total_tokens) // 10
    assert sum(r.alloc for r in rows) == min(budget, total_tokens)
    # quality-ordered: full allocations first, at most one partial, then zeros
    states = [r.boundary for r in rows]  # 0 full, 2 partial, 1 starved
    seen_partial = seen_starved = False
    for st, r in zip(states, rows):
        if st == 0:
            assert not seen_partial and not seen_starved
            assert r.alloc == r.tokens
        elif st == 2:
            assert not seen_partial and not seen_starved
            seen_partial = True
            assert 0 < r.alloc < r.tokens
        else:
            seen_starved = True
            assert r.alloc == 0
    ens = [r.en_micro for r in rows]
    assert ens == sorted(ens, reverse=True)


# --- q323: leave-one-source-out ablation ------------------------------------------


def test_q323_ablation_structure(spark):
    rows = REGISTRY["q323_source_ablation_ppl"].fn(spark, SF).collect()
    assert rows
    from columnarmodeling_spark.functions.text import hex_hash

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    train_sources = {
        r.source
        for r in docs.filter(
            hex_hash(F.col("doc_id").cast("string")) % 10 != 0
        )
        .select("source")
        .distinct()
        .collect()
    }
    assert {r.source for r in rows} == train_sources
    full = {r.full_avg_micro for r in rows}
    assert len(full) == 1  # the full-model score is source-independent
    for r in rows:
        assert r.ablated_avg_micro - r.full_avg_micro == pytest.approx(
            r.contribution_micro, abs=1
        )


def test_q323_removing_a_source_perturbs_both_ways(spark):
    """Some sources must help (removal hurts: negative contribution) and,
    with add-one smoothing, shrinking counts can also help — the test
    pins that the deltas are non-trivial rather than all zero."""
    rows = REGISTRY["q323_source_ablation_ppl"].fn(spark, SF).collect()
    assert any(r.contribution_micro != 0 for r in rows)
    contribs = [r.contribution_micro for r in rows]
    assert contribs == sorted(contribs)


def test_q323_count_algebra_matches_direct_retrain(spark):
    """The count-algebra ablation must equal a direct rebuild of the LM
    without the source — verified in pure Python for one source."""
    import re
    from collections import Counter

    docs = spark.read.parquet(f"{SF}/documents.parquet").collect()

    def bigrams(text):
        toks = [t for t in re.split("[^a-z0-9]+", text.lower()) if t]
        return list(zip(toks, toks[1:]))

    import hashlib

    def is_held(doc_id):
        return (
            int(hashlib.md5(str(doc_id).encode()).hexdigest()[:15], 16) % 10
            == 0
        )

    held: Counter = Counter()
    vocab = set()
    for d in docs:
        if is_held(d.doc_id):
            held.update(bigrams(d.text))
        else:
            vocab.update(
                t for t in re.split("[^a-z0-9]+", d.text.lower()) if t
            )
    rows = REGISTRY["q323_source_ablation_ppl"].fn(spark, SF).collect()
    target = rows[0].source  # most negative contribution
    c2: Counter = Counter()
    c1: Counter = Counter()
    for d in docs:
        if is_held(d.doc_id) or d.source == target:
            continue
        bs = bigrams(d.text)
        c2.update(bs)
        c1.update(b[0] for b in bs)
    v = len(vocab)
    tot = 0
    n = 0
    for b, hc in held.items():
        lq = round(
            1_000_000
            * math.log((c2.get(b, 0) + 1.0) / (c1.get(b[0], 0) + v))
        )
        tot += hc * lq
        n += hc
    want = round(tot / n)
    got = {r.source: r.ablated_avg_micro for r in rows}[target]
    assert got == want


# --- q324: O'Brien-Fleming group-sequential -----------------------------------------


def test_q324_boundary_shape_and_stop_rule(spark):
    rows = REGISTRY["q324_obrien_fleming"].fn(spark, SF).collect()
    assert [r.k for r in rows] == [1, 2, 3, 4, 5]
    bounds = [r.bound_milli for r in rows]
    # OBF boundary is strictly decreasing and ends at the final z
    assert bounds == sorted(bounds, reverse=True)
    assert bounds[-1] == 1960  # round(1.959964 * 1000)
    assert bounds[0] == round(1959.964 * (5 ** 0.5))
    # sample sizes are cumulative
    nts = [r.n_t for r in rows]
    assert nts == sorted(nts)
    # first_stop marks exactly the first crossing (or nowhere)
    crossing = [r.k for r in rows if r.crossed == 1]
    stops = [r.k for r in rows if r.first_stop == 1]
    if crossing:
        assert stops == [crossing[0]]
    else:
        assert stops == []


# --- q325: CUPED ---------------------------------------------------------------------


def test_q325_cuped_reduction_is_rho_squared(spark):
    r = REGISTRY["q325_cuped"].fn(spark, SF).collect()[0]
    assert 0 <= r.reduction_milli <= 1000
    assert r.var_adj_micro <= r.var_post_micro
    # reduction == 1 - var_adj/var_post at milli precision
    assert r.reduction_milli == pytest.approx(
        round(1000 * (1 - r.var_adj_micro / r.var_post_micro)), abs=1
    )


def test_q325_cuped_matches_pure_python(spark):
    rows = spark.read.parquet(f"{SF}/events.parquet").collect()
    pre = {}
    post = {}
    cut = 1_705_363_200_000_000
    for e in rows:
        us = int(e.ts.timestamp() * 1_000_000)
        pre.setdefault(e.user_id, 0.0)
        post.setdefault(e.user_id, 0.0)
        if e.event_type == "purchase":
            if us < cut:
                pre[e.user_id] += e.value
            else:
                post[e.user_id] += e.value
    users = sorted(pre)
    n = len(users)
    sp = sum(pre[u] for u in users)
    so = sum(post[u] for u in users)
    spp = sum(pre[u] ** 2 for u in users)
    soo = sum(post[u] ** 2 for u in users)
    spo = sum(pre[u] * post[u] for u in users)
    theta = (spo - sp * so / n) / (spp - sp * sp / n)
    r = REGISTRY["q325_cuped"].fn(spark, SF).collect()[0]
    assert r.n_users == n
    assert abs(r.theta_micro - round(1e6 * theta)) <= 2


# --- q326: power planning --------------------------------------------------------------


def test_q326_sample_size_formula(spark):
    r = REGISTRY["q326_power_planning"].fn(spark, SF).collect()[0]
    mu = r.control_mean_micro / 1e6
    s2 = r.variance_micro / 1e6
    delta = r.mde_micro / 1e6
    assert delta == pytest.approx(0.02 * mu, rel=1e-3)
    want = math.ceil((1.959964 + 0.841621) ** 2 * 2 * s2 / delta**2)
    # micro-quantized moments reach the same n within the rounding slack
    assert abs(r.n_per_arm - want) <= max(2, want // 1000)
    assert r.underpowered == (1 if r.n_per_arm > r.pilot_n else 0)


def _py_canonicalize(url: str) -> str:
    """Independent pure-Python reference for the q312 rules."""
    scheme, _, rest = url.partition("://")
    scheme = scheme.lower()
    nofrag = rest.partition("#")[0]
    hostport = nofrag.partition("/")[0]
    rawhost = hostport.partition(":")[0].lower()
    port = hostport.partition(":")[2]
    import re as _re

    host = _re.sub(r"^((www|m)\.)+", "", rawhost)
    if port == "" or (scheme, port) in (("http", "80"), ("https", "443")):
        portpart = ""
    else:
        portpart = ":" + port
    pathq = nofrag[len(hostport):]
    path = pathq.partition("?")[0] or "/"
    if len(path) > 1 and path.endswith("/"):
        path = path[:-1]
    qs = pathq.partition("?")[2]
    keep = "&".join(sorted(p for p in qs.split("&") if p[:4] != "utm_"))
    return scheme + "://" + host + portpart + path + (
        "?" + keep if keep else ""
    )


def test_q312_grid_against_python_reference(spark):
    """Differential grid: every combination of scheme, host case/prefix,
    port, trailing slash, params and fragment must canonicalize to what
    the independent Python reference produces — and be idempotent."""
    urls = []
    for scheme in ("http", "HTTP", "https"):
        for host in ("ex.com", "WWW.Ex.COM", "m.ex.org", "www.m.ex.net"):
            for port in ("", ":80", ":443", ":8080"):
                for path in ("", "/", "/a", "/a/b/", "/A/"):
                    for q in ("", "?z=1&a=2", "?utm_s=x", "?utm_s=x&b=3"):
                        for frag in ("", "#f"):
                            urls.append(
                                f"{scheme}://{host}{port}{path}{q}{frag}"
                            )
    got = _canonicalize(spark, urls)
    expect = {u: _py_canonicalize(u) for u in urls}
    mismatches = {u: (got[u], expect[u]) for u in urls if got[u] != expect[u]}
    assert not mismatches, list(mismatches.items())[:5]
    # idempotence over the whole canonical set
    canon = sorted(set(got.values()))
    twice = _canonicalize(spark, canon)
    assert all(twice[c] == c for c in canon)


# --- q327: blocklist filtering -------------------------------------------------------


def test_q327_blocklist_semantics(spark):
    rows = REGISTRY["q327_blocklist_filter"].fn(spark, SF).collect()
    assert rows
    from columnarmodeling_spark.queries.llm_text import _BLOCKLIST

    def expect_blocked(host):
        return any(
            host == e or host.endswith("." + e) for e in _BLOCKLIST
        )

    for r in rows:
        assert r.blocked == (1 if expect_blocked(r.host) else 0)
    # all three rule paths are live on the synthetic corpus: at least
    # one exact match, one subdomain match, and unblocked hosts
    blocked_hosts = {r.host for r in rows if r.blocked}
    assert any(h in _BLOCKLIST for h in blocked_hosts)  # exact arm
    assert any(
        h not in _BLOCKLIST and expect_blocked(h) for h in blocked_hosts
    )  # suffix arm
    assert any(r.blocked == 0 for r in rows)
    # a blocklist entry must never leak: unblocked hosts truly miss
    for r in rows:
        if not r.blocked:
            assert not expect_blocked(r.host)


# --- q328: gazetteer tagging -----------------------------------------------------------


def test_q328_phrase_matching_not_substring(spark):
    """Multi-token entities must match consecutive tokens only, and
    unigram matches must be whole-token (never inside longer words)."""
    import re

    rows = {
        r.entity: r
        for r in REGISTRY["q328_gazetteer_tagging"].fn(spark, SF).collect()
    }
    docs = spark.read.parquet(f"{SF}/documents.parquet").collect()
    from columnarmodeling_spark.queries.llm_text import _GAZETTEER

    for ent in _GAZETTEER:
        mentions = 0
        ndocs = 0
        for d in docs:
            toks = [t for t in re.split("[^a-z0-9]+", d.text.lower()) if t]
            if len(ent) == 1:
                c = sum(1 for w in toks if w == ent[0])
            else:
                c = sum(
                    1
                    for a, b in zip(toks, toks[1:])
                    if (a, b) == ent
                )
            mentions += c
            ndocs += 1 if c else 0
        key = " ".join(ent)
        if mentions:
            assert rows[key].n_mentions == mentions
            assert rows[key].n_docs == ndocs
        else:
            assert key not in rows


# --- q329: adaptive join ordering --------------------------------------------------------


def test_q329_both_orders_agree_and_decision_is_consistent(spark):
    from columnarmodeling_spark.queries.relational import _q329_result

    a = {
        r.c_mktsegment: (r.n_items, r.revenue_cents)
        for r in _q329_result(spark, SF, customer_first=True).collect()
    }
    b = {
        r.c_mktsegment: (r.n_items, r.revenue_cents)
        for r in _q329_result(spark, SF, customer_first=False).collect()
    }
    assert a == b  # inner joins commute: the order changes only the plan
    rows = REGISTRY["q329_join_order_adaptive"].fn(spark, SF).collect()
    assert rows
    r0 = rows[0]
    want = (
        "customer_first"
        if 1000 * r0.est_oc_rows <= r0.est_ol_milli
        else "lineitem_first"
    )
    assert all(r.join_order == want for r in rows)
    got = {r.c_mktsegment: (r.n_items, r.revenue_cents) for r in rows}
    assert got == a
