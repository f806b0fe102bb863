"""Property tests for the round-6 series/layout operators (q149-q156):
invariants the DuckDB differential can't express — grid contiguity,
Morton invertibility, anomaly-window preconditions."""

from __future__ import annotations

from pyspark.sql import functions as F

from columnarmodeling_spark.queries import REGISTRY


def test_gap_fill_grid_is_contiguous_and_filled(spark, sf_dir):
    out = REGISTRY["q149_gap_fill"].fn(spark, sf_dir).cache()
    # no NULL survives the LOCF fill (grids start at each user's first
    # observed hour, so there is no leading-null edge case)
    assert out.filter(F.col("v_fill").isNull()).count() == 0
    # per user: contiguous hourly grid — row count == hi - lo + 1
    g = out.groupBy("user_id").agg(
        F.count("*").alias("n"),
        (F.max("hr") - F.min("hr") + 1).alias("span"),
    )
    assert g.filter(F.col("n") != F.col("span")).count() == 0
    # every non-gap row carries its own observation (v_obs == v_fill is
    # implied by LOCF; check the gap flag partitions the grid)
    n_obs = out.filter(F.col("is_gap") == 0).count()
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    want = (
        ev.select(
            "user_id",
            F.expr("div(unix_micros(cast(ts AS timestamp)), 3600000000)"),
        )
        .distinct()
        .count()
    )
    assert n_obs == want
    out.unpersist()


def _morton_py(x: int, y: int) -> int:
    def spread(v: int) -> int:
        v = (v | (v << 8)) & 0x00FF00FF
        v = (v | (v << 4)) & 0x0F0F0F0F
        v = (v | (v << 2)) & 0x33333333
        v = (v | (v << 1)) & 0x55555555
        return v

    return spread(x) | (spread(y) << 1)


def test_morton_stages_match_reference_bit_interleave(spark, sf_dir):
    """The multiply-based SQL spread equals the canonical shift-based
    interleave, checked exhaustively on a 64x64 corner grid."""
    from columnarmodeling_spark.queries.analytics import _MORTON_STAGES

    pts = [(x, y) for x in range(64) for y in range(64)]
    df = spark.createDataFrame(pts, "x0 BIGINT, y0 BIGINT")
    for col, expr in _MORTON_STAGES:
        df = df.withColumn(col, F.expr(expr))
    got = {
        (r["x0"], r["y0"]): r["m"]
        for r in df.select(
            "x0", "y0", F.expr("x4 | (y4 * 2)").alias("m")
        ).collect()
    }
    for x, y in pts:
        assert got[(x, y)] == _morton_py(x, y)


def test_zorder_buckets_partition_all_rows(spark, sf_dir):
    out = REGISTRY["q155_zorder_layout"].fn(spark, sf_dir)
    total = out.agg(F.sum("n")).collect()[0][0]
    want = spark.read.parquet(f"{sf_dir}/customer.parquet").count()
    assert total == want


def test_rolling_anomaly_needs_min_window(spark, sf_dir):
    out = REGISTRY["q156_rolling_anomaly"].fn(spark, sf_dir)
    assert (
        out.filter((F.col("is_anom") == 1) & (F.col("n_window") < 5)).count()
        == 0
    )
    # row-preserving: one output row per event
    want = spark.read.parquet(f"{sf_dir}/events.parquet").count()
    assert out.count() == want


def test_sssp_dominated_by_bfs_hops_times_max_weight(spark, sf_dir):
    """Weighted distance is at most 7x the hop distance (max edge weight)
    and at least the hop distance (min weight 1) for reached nodes."""
    sp = REGISTRY["q150_sssp_weighted"].fn(spark, sf_dir)
    hops = REGISTRY["q137_bfs_hops"].fn(spark, sf_dir)
    j = sp.join(hops, "id").filter(F.col("hops") < 999_999)
    bad = j.filter(
        (F.col("dist") > F.col("hops") * 7) | (F.col("dist") < F.col("hops"))
    )
    assert bad.count() == 0


def test_equidepth_buckets_are_balanced(spark, sf_dir):
    out = REGISTRY["q157_equidepth_hist"].fn(spark, sf_dir).collect()
    assert len(out) == 16
    counts = [r["n_rows"] for r in out]
    assert max(counts) - min(counts) <= 1
    # buckets tile the value range without overlap
    rows = sorted(out, key=lambda r: r["bucket"])
    for a, b in zip(rows, rows[1:]):
        assert a["hi_cents"] <= b["lo_cents"]


def test_cube_subtotals_reconcile(spark, sf_dir):
    out = REGISTRY["q158_cube_aggregate"].fn(spark, sf_dir).collect()
    grand = [r for r in out if r["gid"] == 3]
    assert len(grand) == 1
    for gid in (0, 1, 2):
        part = sum(r["n"] for r in out if r["gid"] == gid)
        assert part == grand[0]["n"]


def test_jl_distortion_concentrates_near_one(spark, sf_dir):
    rows = REGISTRY["q160_jl_distortion"].fn(spark, sf_dir).collect()
    ratios = [r["ratio"] for r in rows if r["ratio"] is not None]
    assert ratios, "no evaluable pairs"
    # JL with k=8: mean distortion within 25% of 1; per-pair ratios are
    # chi-square_8/8 distributed, so with 250 pairs the observed tail
    # reaches ~0.05/~4 — bound at the distribution's practical support
    mean = sum(ratios) / len(ratios)
    assert 0.75 < mean < 1.25
    assert all(0.02 < r < 8.0 for r in ratios)


def test_dbscan_roles_are_consistent(spark, sf_dir):
    out = REGISTRY["q159_dbscan_cores"].fn(spark, sf_dir)
    bad_core = out.filter(
        (F.col("role") == "core") & (F.col("degree") + 1 < 4)
    ).count()
    bad_noise = out.filter(
        (F.col("role") == "noise") & (F.col("degree") + 1 >= 4)
    ).count()
    assert bad_core == 0 and bad_noise == 0


def test_bucketed_join_plan_has_no_exchange(spark, sf_dir):
    """The whole point of q162: once both sides are bucketed on the join
    key, the join + aggregation runs with ZERO shuffle on either side.
    Broadcast is disabled so the planner can't hide the property."""
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        REGISTRY["q162_bucketed_join"].fn(spark, sf_dir).count()
        j = spark.table("bk_lineitem").join(
            spark.table("bk_orders"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert "SortMergeJoin" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_mix_temperature_budget_conserves(spark, sf_dir):
    rows = REGISTRY["q163_mix_temperature"].fn(spark, sf_dir).collect()
    rates = sum(r["rate"] for r in rows)
    assert abs(rates - 1.0) < 1e-4
    # floor-division allocation never exceeds the budget, and the
    # shortfall is bounded by one token per source
    total = sum(r["budget_tokens"] for r in rows)
    assert 1_000_000 - len(rows) <= total <= 1_000_000
    # temperature upweights small sources: budget share > raw share for
    # the smallest source, < for the largest
    by_n = sorted(rows, key=lambda r: r["src_tokens"])
    raw_total = sum(r["src_tokens"] for r in rows)
    small, big = by_n[0], by_n[-1]
    assert small["budget_tokens"] / 1e6 > small["src_tokens"] / raw_total
    assert big["budget_tokens"] / 1e6 < big["src_tokens"] / raw_total


def test_hist_quantile_error_within_bound(spark, sf_dir):
    rows = REGISTRY["q170_hist_quantiles"].fn(spark, sf_dir).collect()
    assert len(rows) == 4
    for r in rows:
        assert r["err_c"] <= r["bound_c"], r


def test_tfidf_cosine_bounded_and_thresholded(spark, sf_dir):
    rows = REGISTRY["q169_tfidf_cosine_pairs"].fn(spark, sf_dir).collect()
    for r in rows:
        assert 0.5 <= r["cos6"] <= 1.0 + 1e-9, r
        assert r["src"] < r["dst"]


def test_attribution_accounts_every_purchase(spark, sf_dir):
    out = REGISTRY["q174_attribution"].fn(spark, sf_dir)
    got = out.agg(F.sum("purchases")).collect()[0][0]
    want = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .filter(F.col("event_type") == "purchase")
        .count()
    )
    assert got == want
    # lag is credited strictly backwards in time
    assert (
        out.filter(
            (F.col("touch_type") != "none")
            & (F.col("total_lag_micros") < 0)
        ).count()
        == 0
    )


def test_cusum_changepoint_bounds(spark, sf_dir):
    rows = REGISTRY["q175_cusum_changepoint"].fn(spark, sf_dir).collect()
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    assert len(rows) == ev.select("user_id").distinct().count()
    for r in rows:
        assert 1 <= r["cp_index"] <= r["n"] - 1


def test_cooccurrence_overlap_bounded(spark, sf_dir):
    out = REGISTRY["q176_cooccurrence"].fn(spark, sf_dir)
    assert (
        out.filter(
            (F.col("overlap_micro") < 0) | (F.col("overlap_micro") > 1_000_000)
        ).count()
        == 0
    )
    assert out.filter(F.col("item_a") >= F.col("item_b")).count() == 0


def test_segmented_ewma_matches_plain_fold(spark, sf_dir):
    """q208's chunked affine composition is algebraically q194's fold
    (uniform maps + s0 = first value reproduce the seed exactly), so
    the two queries must agree to re-association noise on real data —
    and stay chunk-width invariant."""
    from columnarmodeling_spark.queries.timeseries import segmented_ewma

    plain = {
        r["user_id"]: (r["n_events"], r["ewma"])
        for r in REGISTRY["q194_ewma_smoothing"].fn(spark, sf_dir).collect()
    }
    seg = {
        r["user_id"]: (r["n_events"], r["ewma"], r["n_chunks"])
        for r in REGISTRY["q208_ewma_segmented"].fn(spark, sf_dir).collect()
    }
    assert set(plain) == set(seg)
    multi = 0
    for u, (n, e) in plain.items():
        ns, es, nc = seg[u]
        assert ns == n
        assert abs(es - e) <= 2e-6  # 6dp rounding + re-association
        multi += nc > 1
    # the chunking must actually split histories for this to test the
    # composition, not the degenerate one-chunk case
    assert multi >= 10

    # a different chunk width re-associates differently but must stay
    # within fold noise of the plain result
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "user_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
        "event_id",
        "value",
    )
    other = {
        r["user_id"]: r["ewma"]
        for r in segmented_ewma(ev, 21_600_000_000).collect()  # 6h chunks
    }
    for u, (_, e) in plain.items():
        assert abs(other[u] - e) <= 2e-6


def test_q251_crosscorr_matches_numpy(spark):
    import numpy as np
    import pandas as pd

    from columnarmodeling_spark.queries import REGISTRY

    rows = REGISTRY["q251_crosscorr"].fn(
        spark, "/root/testdata/sf0.001"
    ).collect()
    ev = pd.read_parquet("/root/testdata/sf0.001/events.parquet")
    hr = ev.ts.astype("datetime64[us]").astype("int64") // 3_600_000_000
    lo, hi = hr.min(), hr.max()
    n = hi - lo + 1
    types = sorted(ev.event_type.unique())
    series = {}
    for ty in types:
        x = np.zeros(n, dtype=np.int64)
        vc = hr[ev.event_type == ty].value_counts()
        x[vc.index.to_numpy() - lo] = vc.to_numpy()
        series[ty] = n * x - x.sum()  # exact integer centering
    got = {(r.type_a, r.type_b, r.lag): r for r in rows}
    n_pairs = len(types) * (len(types) - 1) // 2
    assert len(rows) == n_pairs * 13
    for i, ta in enumerate(types):
        for tb in types[i + 1 :]:
            da, db = series[ta], series[tb]
            dena, denb = (da * da).sum(), (db * db).sum()
            for lag in range(-6, 7):
                # overlap window: t and t+lag both inside the grid
                if lag >= 0:
                    num = int((da[: n - lag] * db[lag:]).sum())
                    n_terms = n - lag
                else:
                    num = int((da[-lag:] * db[: n + lag]).sum())
                    n_terms = n + lag
                r = got[(ta, tb, lag)]
                assert r.n_terms == n_terms
                want = round(
                    1e6 * num / np.sqrt(float(dena) * float(denb))
                )
                assert r.r_micro == want, (ta, tb, lag)
                assert -1_100_000 <= r.r_micro <= 1_100_000
    # lag-reversal identity: corr(a,b,-l) uses the same pair ordering,
    # so the matrix is complete without (b,a) rows
    assert all(r.type_a < r.type_b for r in rows)


def test_q254_entropy_rate_replay_and_bounds(spark):
    import math

    import pandas as pd

    from columnarmodeling_spark.queries import REGISTRY

    sf = "/root/testdata/sf0.001"
    rows = REGISTRY["q254_entropy_rate"].fn(spark, sf).collect()
    ev = pd.read_parquet(f"{sf}/events.parquet").sort_values(
        ["user_id", "ts", "event_id"]
    )
    # transition counts
    m: dict = {}
    for _, g in ev.groupby("user_id"):
        ts = list(g.event_type)
        for a, b in zip(ts, ts[1:]):
            m[(a, b)] = m.get((a, b), 0) + 1
    rt: dict = {}
    for (a, _), c in m.items():
        rt[a] = rt.get(a, 0) + c
    # pi: the integer power iteration (q242 semantics)
    k = len(rt)
    v = {s: 1_000_000 // k for s in rt}
    for _ in range(20):
        nxt: dict = {}
        for (a, b), c in m.items():
            if a in v:
                nxt[b] = nxt.get(b, 0) + (v[a] * c) // rt[a]
        v = nxt
    # row entropies with per-term micro-quantized ln
    h: dict = {}
    for (a, b), c in m.items():
        lq = round(1e6 * math.log(c / rt[a]))
        h[a] = h.get(a, 0) + (c * (-lq)) // rt[a]
    by = {r.event_type: r for r in rows}
    types = sorted(rt)
    assert set(by) == set(types) | {"_ALL"}
    total = 0
    for ty in types:
        r = by[ty]
        assert r.pi_micro == v[ty]
        assert r.h_state_micro == h[ty]
        want_contrib = (v[ty] * h[ty]) // 1_000_000
        assert r.contrib_micro == want_contrib
        # a |types|-state chain's row entropy is bounded by ln k
        assert 0 <= r.h_state_micro <= round(1e6 * math.log(k)) + k
        total += want_contrib
    al = by["_ALL"]
    assert al.h_state_micro == al.contrib_micro == total
    assert 0 <= total <= round(1e6 * math.log(k)) + k


def test_q255_fano_matches_numpy(spark):
    import numpy as np
    import pandas as pd

    from columnarmodeling_spark.queries import REGISTRY

    sf = "/root/testdata/sf0.001"
    rows = REGISTRY["q255_fano_factor"].fn(spark, sf).collect()
    ev = pd.read_parquet(f"{sf}/events.parquet")
    hr = ev.ts.astype("datetime64[us]").astype("int64") // 3_600_000_000
    lo, hi = hr.min(), hr.max()
    n = hi - lo + 1
    assert len(rows) == ev.event_type.nunique()
    for r in rows:
        x = np.zeros(n, dtype=np.int64)
        vc = hr[ev.event_type == r.event_type].value_counts()
        x[vc.index.to_numpy() - lo] = vc.to_numpy()
        assert r.n_hours == n
        S, Q = int(x.sum()), int((x * x).sum())
        assert r.mean_milli == 1000 * S // n
        fano = (n * Q - S * S) / ((n - 1) * S)
        assert r.fano_micro == round(1e6 * fano)
        var = np.var(x, ddof=1)
        assert abs(fano - var / x.mean()) < 1e-9  # exact-moment identity
        sig, mu = np.sqrt(var), x.mean()
        assert r.burstiness_micro == round(1e6 * (sig - mu) / (sig + mu))
        assert -1_000_000 <= r.burstiness_micro <= 1_000_000


def test_q268_theil_sen_matches_replay(spark):
    from collections import Counter

    import pandas as pd

    from columnarmodeling_spark.queries import REGISTRY

    sf = "/root/testdata/sf0.001"
    rows = REGISTRY["q268_theil_sen"].fn(spark, sf).collect()
    ev = pd.read_parquet(f"{sf}/events.parquet")
    ev["hr"] = ev.ts.astype("datetime64[us]").astype("int64") // (
        3_600_000_000
    )
    lo, hi = int(ev.hr.min()), int(ev.hr.max())
    types = sorted(ev.event_type.unique())
    assert len(rows) == len(types)
    cnt = Counter(zip(ev.event_type, ev.hr))
    for r in rows:
        xs = [cnt.get((r.event_type, h), 0) for h in range(lo, hi + 1)]
        n = len(xs)
        assert r.n_hours == n
        slopes = sorted(
            round(1000000.0 * (xs[b] - xs[a]) / (b - a))
            for a in range(n)
            for b in range(a + 1, n)
        )
        assert r.n_pairs == n * (n - 1) // 2 == len(slopes)
        slope = slopes[(len(slopes) + 1) // 2 - 1]
        assert r.slope_micro == slope
        res = sorted(1000000 * xs[h] - slope * h for h in range(n))
        assert r.intercept_micro == res[(n + 1) // 2 - 1]


def test_q269_seasonality_matches_replay(spark):
    from collections import Counter

    import pandas as pd

    from columnarmodeling_spark.queries import REGISTRY

    sf = "/root/testdata/sf0.001"
    rows = REGISTRY["q269_seasonality"].fn(spark, sf).collect()
    ev = pd.read_parquet(f"{sf}/events.parquet")
    us = ev.ts.astype("datetime64[us]").astype("int64")
    ev["day"] = us // 86_400_000_000
    ev["hod"] = (us // 3_600_000_000) % 24
    lo, hi = int(ev.day.min()), int(ev.day.max())
    nd = hi - lo + 1
    types = sorted(ev.event_type.unique())
    assert len(rows) == 24 * len(types)
    cnt = Counter(zip(ev.event_type, ev.day, ev.hod))
    for ty in types:
        s_hod = {
            hod: sum(
                cnt.get((ty, d, hod), 0) for d in range(lo, hi + 1)
            )
            for hod in range(24)
        }
        ss_hod = {
            hod: sum(
                cnt.get((ty, d, hod), 0) ** 2 for d in range(lo, hi + 1)
            )
            for hod in range(24)
        }
        n = 24 * nd
        st = sum(s_hod.values())
        sst = sum(ss_hod.values())
        s2t = sum(v * v for v in s_hod.values())
        denom = n * sst - st * st
        eta = (
            round(1000000.0 * (24 * s2t - st * st) / denom)
            if denom > 0
            else 0
        )
        for r in [x for x in rows if x.event_type == ty]:
            assert r.n_days == nd
            assert r.mean_milli == 1000 * s_hod[r.hod] // nd
            assert r.grand_milli == 1000 * st // n
            assert r.eta2_micro == eta
            # a variance ratio lives in [0, 1]
            assert 0 <= r.eta2_micro <= 1000000


def test_q288_holt_segmented_matches_replay(spark):
    import pandas as pd

    rows = REGISTRY["q288_holt_segmented"].fn(
        spark, "/root/testdata/sf0.001"
    ).collect()
    ev = pd.read_parquet("/root/testdata/sf0.001/events.parquet")
    W = 172_800_000_000
    per = {}
    for _, e in ev.iterrows():
        us = e.ts.value // 1000  # ns -> us
        per.setdefault(e.user_id, []).append((us, e.event_id, e.value))

    ident = (1.0, 0.0, 0.0, 1.0, 0.0, 0.0)

    def compose(acc, m):
        return (
            m[0] * acc[0] + m[1] * acc[2],
            m[0] * acc[1] + m[1] * acc[3],
            m[2] * acc[0] + m[3] * acc[2],
            m[2] * acc[1] + m[3] * acc[3],
            m[0] * acc[4] + m[1] * acc[5] + m[4],
            m[2] * acc[4] + m[3] * acc[5] + m[5],
        )

    got = {r.user_id: r for r in rows}
    assert len(got) == len(per)
    for uid, evs in per.items():
        evs.sort()
        chunks = {}
        for us, eid, v in evs:
            chunks.setdefault(us // W if us >= 0 else -((-us) // W),
                              []).append((us, eid, v))
        acc = ident
        for c in sorted(chunks):
            ck = ident
            for us, eid, v in chunks[c]:
                ck = compose(
                    ck, (0.75, 0.75, -0.125, 0.875, 0.25 * v, 0.125 * v)
                )
            acc = compose(acc, ck)
        v0 = evs[0][2]
        level = acc[0] * v0 + acc[4]
        trend = acc[2] * v0 + acc[5]
        r = got[uid]
        assert (r.n_events, r.n_chunks) == (len(evs), len(chunks))
        assert r.level == round(level, 6) and r.trend == round(trend, 6)
        assert r.forecast3 == round(level + 3.0 * trend, 6)


def test_q288_holt_constant_series_is_flat(spark):
    # a constant series must smooth to (level = const, trend = 0) no
    # matter how the chunked association groups the events
    rows = [
        (i, 1_700_000_000_000_000 + i * 90_000_000_000, 7, 5.5)
        for i in range(40)
    ]
    df = spark.createDataFrame(
        rows, "event_id long, us long, user_id long, value double"
    ).selectExpr(
        "event_id", "CAST(us / 1000000 AS TIMESTAMP) AS ts", "user_id",
        "'x' AS event_type", "value", "'{}' AS props",
    )
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        df.coalesce(1).write.parquet(d + "/events.parquet")
        (row,) = REGISTRY["q288_holt_segmented"].fn(spark, d).collect()
    assert row.n_events == 40 and row.n_chunks > 1
    assert row.level == 5.5 and row.trend == 0.0 and row.forecast3 == 5.5


def test_q291_mann_kendall_matches_replay(spark):
    import math
    from collections import Counter

    import pandas as pd

    rows = REGISTRY["q291_mann_kendall"].fn(
        spark, "/root/testdata/sf0.001"
    ).collect()
    ev = pd.read_parquet("/root/testdata/sf0.001/events.parquet")
    H = 3_600_000_000
    obs = Counter(
        (e.event_type, (e.ts.value // 1000) // H) for _, e in ev.iterrows()
    )
    hrs = [h for _, h in obs]
    lo, hi = min(hrs), max(hrs)
    types = sorted({ty for ty, _ in obs})
    got = {r.event_type: r for r in rows}
    assert sorted(got) == types
    for ty in types:
        xs = [obs.get((ty, h), 0) for h in range(lo, hi + 1)]
        n = len(xs)
        s = sum(
            (1 if xs[j] > xs[i] else -1 if xs[j] < xs[i] else 0)
            for i in range(n)
            for j in range(i + 1, n)
        )
        tie = sum(
            t * (t - 1) * (2 * t + 5)
            for t in Counter(xs).values()
            if t > 1
        )
        var18 = n * (n - 1) * (2 * n + 5) - tie
        if var18 > 0 and s != 0:
            z = round(
                1000.0 * (s - (1 if s > 0 else -1))
                / math.sqrt(var18 / 18.0)
            )
        else:
            z = 0
        r = got[ty]
        assert (r.n, r.s, r.var18, r.z_milli) == (n, s, var18, z), ty
        # |S| is bounded by the number of pairs
        assert abs(r.s) <= n * (n - 1) // 2


def test_q297_time_decayed_matches_replay(spark):
    import math

    import pandas as pd

    rows = REGISTRY["q297_time_decayed_features"].fn(
        spark, "/root/testdata/sf0.001"
    ).collect()
    ev = pd.read_parquet("/root/testdata/sf0.001/events.parquet")
    HL = 86_400_000_000
    LN2 = 0.6931471805599453
    us = [e.ts.value // 1000 for _, e in ev.iterrows()]
    t = max(us)

    def rnd(x):
        return math.floor(x + 0.5) if x >= 0 else -math.floor(-x + 0.5)

    per = {}
    for (_, e), u in zip(ev.iterrows(), us):
        wm = rnd(1000000.0 * math.exp(-LN2 * ((t - u) / HL)))
        wv = rnd(1000000.0 * (math.exp(-LN2 * ((t - u) / HL)) * e.value))
        n, c, v = per.get(e.user_id, (0, 0, 0))
        per[e.user_id] = (n + 1, c + wm, v + wv)
    got = {r.user_id: r for r in rows}
    assert sorted(got) == sorted(per)
    for uid, (n, c, v) in per.items():
        r = got[uid]
        assert (r.n_events, r.decayed_count_micro,
                r.decayed_value_micro) == (n, c, v), uid
        # each weight is in (0, 1]: decayed count <= raw count
        assert 0 <= r.decayed_count_micro <= 1000000 * r.n_events


def test_q301_trailing_distinct_matches_replay(spark):
    import pandas as pd

    rows = REGISTRY["q301_trailing_distinct_users"].fn(
        spark, "/root/testdata/sf0.001"
    ).collect()
    ev = pd.read_parquet("/root/testdata/sf0.001/events.parquet")
    D = 86_400_000_000
    du = {(e.ts.value // 1000 // D, e.user_id) for _, e in ev.iterrows()}
    days = [d for d, _ in du]
    lo, hi = min(days), max(days)
    want = {}
    for d in range(lo, hi + 1):
        want[d - lo] = len(
            {u for (dd, u) in du if d - 6 <= dd <= d}
        )
    got = {r.day_index: r.wau7 for r in rows}
    assert got == want
    # WAU7 dominates any single day's DAU
    dau = {}
    for dd, u in du:
        dau[dd - lo] = dau.get(dd - lo, 0) + 1
    assert all(got[i] >= dau.get(i, 0) for i in got)
