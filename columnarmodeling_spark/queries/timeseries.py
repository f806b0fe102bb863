"""Time-series preparation operators: grid gap-fill with last-observation
carry-forward, per-group OLS trend fit, and rolling-window anomaly flags.

These complete the engine's series post-processing tier (SURVEY §1.1
probe time-series ``Output/MLSOut00E.dat``; §2.5 W3 deltas): a real
monitoring pipeline over the solver's E/B series — or any 100 TB event
stream — needs (a) a regular time grid even when output steps are
missing (the reference's ``nOutLoops`` cadence guarantees regularity;
ingest gaps break it), (b) a linear trend per series (the stress–strain
elastic-modulus fit, ``README.md:24``), and (c) outlier flags computed
from a bounded trailing window.

Cross-engine float discipline (see ``queries/__init__`` docstring):
every value is quantized to integer centi-units with the repo-standard
``CAST(round(x * 100) AS BIGINT)`` before any aggregation, so sums are
order-independent int64 arithmetic on both engines; the few final
divisions run on identical int64-derived doubles, which IEEE 754 makes
bit-identical across Spark and DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from columnarmodeling_spark.queries import register
from columnarmodeling_spark.queries._util import t

# one hour in epoch-micros: the gap-fill grid resolution
_HOUR_US = 3_600_000_000


@register(
    "q149_gap_fill",
    oracle=f"""
    WITH obs AS (
      SELECT user_id,
             epoch_us(ts) // {_HOUR_US} AS hr,
             CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sc,
             count(*) AS cnt
      FROM events GROUP BY 1, 2),
    b AS (SELECT user_id, min(hr) AS lo, max(hr) AS hi FROM obs GROUP BY 1),
    grid AS (
      SELECT user_id, unnest(generate_series(lo, hi)) AS hr FROM b),
    j AS (
      SELECT g.user_id, g.hr,
             CASE WHEN o.cnt IS NULL THEN NULL
                  ELSE round((CAST(o.sc AS DOUBLE) / o.cnt) / 100.0, 6)
             END AS v_obs
      FROM grid g LEFT JOIN obs o USING (user_id, hr))
    SELECT user_id, hr,
           last_value(v_obs IGNORE NULLS) OVER (
             PARTITION BY user_id ORDER BY hr
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v_fill,
           CAST(v_obs IS NULL AS BIGINT) AS is_gap
    FROM j
    """,
    doc="Regular-grid gap fill with last-observation carry-forward "
    "(LOCF): per user, hourly buckets spanning [first, last] observed "
    "hour via sequence()/generate_series, a left join against the "
    "observed hourly means, and a per-key IGNORE NULLS running last() "
    "to fill the holes — the canonical resample step before any "
    "rolling statistic on an irregular stream (the reference's E/B "
    "series are regular by construction, MLS00con.dat:7; ingest gaps "
    "at 100 TB are not). Every stage — the bucket agg, the grid "
    "explode, the join, the fill window — keys on user_id, so one "
    "hash partitioning serves the whole plan and nothing funnels "
    "through a single partition; the grid explode fans out to "
    "hours-per-user rows, bounded by the observed span, never a "
    "cross join. Hourly means go through the repo-standard integer "
    "centi-quantization so both engines fill identical doubles.",
    tags=("timeseries", "gap-fill", "window", "resample", "scale"),
)
def q149_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = t(spark, sf_dir, "events").select(
        "user_id",
        F.expr(f"div(unix_micros(cast(ts AS timestamp)), {_HOUR_US})").alias(
            "hr"
        ),
        F.round(F.col("value") * 100, 0).cast("long").alias("vc"),
    )
    obs = e.groupBy("user_id", "hr").agg(
        F.sum("vc").alias("sc"), F.count("*").alias("cnt")
    )
    grid = (
        obs.groupBy("user_id")
        .agg(F.min("hr").alias("lo"), F.max("hr").alias("hi"))
        .select(
            "user_id", F.explode(F.sequence("lo", "hi")).alias("hr")
        )
    )
    j = grid.join(obs, ["user_id", "hr"], "left").select(
        "user_id",
        "hr",
        F.when(
            F.col("cnt").isNotNull(),
            F.round(
                (F.col("sc").cast("double") / F.col("cnt")) / 100.0, 6
            ),
        ).alias("v_obs"),
    )
    fill = W.partitionBy("user_id").orderBy("hr").rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    return j.select(
        "user_id",
        "hr",
        F.last("v_obs", ignorenulls=True).over(fill).alias("v_fill"),
        F.col("v_obs").isNull().cast("long").alias("is_gap"),
    )


@register(
    "q153_ols_trend",
    oracle="""
    WITH q AS (
      SELECT l_returnflag,
             CAST(round(l_quantity * 100) AS BIGINT)      AS xq,
             CAST(round(l_extendedprice * 100) AS BIGINT) AS yq
      FROM lineitem),
    s AS (
      SELECT l_returnflag,
             count(*)                    AS n,
             CAST(sum(xq) AS BIGINT)      AS sx,
             CAST(sum(yq) AS BIGINT)      AS sy,
             CAST(sum(xq * xq) AS BIGINT) AS sxx,
             CAST(sum(xq * yq) AS BIGINT) AS sxy
      FROM q GROUP BY 1)
    SELECT l_returnflag, CAST(n AS BIGINT) AS n,
           round((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
                 / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx), 6)
             AS slope,
           round((CAST(sy AS DOUBLE)
                  - ((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
                     / (CAST(n AS DOUBLE) * sxx
                        - CAST(sx AS DOUBLE) * sx)) * sx)
                 / (CAST(n AS DOUBLE) * 100.0), 6) AS intercept_c
    FROM s
    """,
    doc="Per-group closed-form OLS line fit (price-vs-quantity per "
    "return flag — the relational analog of the stress–strain "
    "elastic-modulus fit the reference's E-series exists to produce, "
    "README.md:24): slope and intercept from the five classic sums "
    "(n, Σx, Σy, Σx², Σxy) in ONE map-side-combinable hash "
    "aggregation — the single-pass shape that beats two-pass "
    "mean-centering at 100 TB because no second scan and no "
    "broadcast of per-group means is needed. Inputs are quantized to "
    "integer centi-units so the sums are exact int64 on both "
    "engines; the final slope/intercept arithmetic runs the same "
    "IEEE double expression on identical int64-derived operands, so "
    "both engines emit bit-identical doubles before the final "
    "round(…, 6).",
    tags=("timeseries", "regression", "agg", "A7", "scale"),
)
def q153_ols_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    q = t(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        F.round(F.col("l_quantity") * 100, 0).cast("long").alias("xq"),
        F.round(F.col("l_extendedprice") * 100, 0).cast("long").alias("yq"),
    )
    s = q.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        F.sum("xq").alias("sx"),
        F.sum("yq").alias("sy"),
        F.sum(F.col("xq") * F.col("xq")).alias("sxx"),
        F.sum(F.col("xq") * F.col("yq")).alias("sxy"),
    )
    nd = F.col("n").cast("double")
    sxd = F.col("sx").cast("double")
    slope = (nd * F.col("sxy") - sxd * F.col("sy")) / (
        nd * F.col("sxx") - sxd * F.col("sx")
    )
    return s.select(
        "l_returnflag",
        F.col("n").cast("long").alias("n"),
        F.round(slope, 6).alias("slope"),
        F.round(
            (F.col("sy").cast("double") - slope * F.col("sx"))
            / (nd * 100.0),
            6,
        ).alias("intercept_c"),
    )


# rolling anomaly window: the 10 rows strictly before the current one
_ANOM_LOOKBACK = 10
_ANOM_MIN_N = 5


@register(
    "q156_rolling_anomaly",
    oracle=f"""
    WITH q AS (
      SELECT user_id, event_id,
             epoch_us(ts) AS us,
             CAST(round(value * 100) AS BIGINT) AS xc
      FROM events),
    w AS (
      SELECT user_id, event_id, xc,
             count(xc)  OVER lb              AS n,
             CAST(coalesce(sum(xc)      OVER lb, 0) AS BIGINT) AS s,
             CAST(coalesce(sum(xc * xc) OVER lb, 0) AS BIGINT) AS s2
      FROM q
      WINDOW lb AS (PARTITION BY user_id ORDER BY us, event_id
                    ROWS BETWEEN {_ANOM_LOOKBACK} PRECEDING
                             AND 1 PRECEDING))
    SELECT user_id, event_id, xc, CAST(n AS BIGINT) AS n_window,
           CAST(n >= {_ANOM_MIN_N}
                AND (n * xc - s) * (n * xc - s) > 4 * (n * s2 - s * s)
                AS BIGINT) AS is_anom
    FROM w
    """,
    doc="Trailing-window anomaly flag (monitoring staple over the "
    "solver's probe series or any event stream): each reading is "
    "compared against the mean/variance of the 10 readings strictly "
    "before it in its own series; flagged when at least 5 priors "
    "exist and |x − μ| > 2σ. The test is algebraically cleared of "
    "divisions — (n·x − s)² > 4·(n·s2 − s²) — over centi-quantized "
    "int64 sums, so the whole query is EXACT integer arithmetic on "
    "both engines (bounded by 10 values ≤ 49 002 centi-units, no "
    "overflow); no float variance ever materializes, sidestepping "
    "the sliding-window-recurrence rounding that differs between "
    "engines. One window pass, partitioned by user_id with a "
    "(us, event_id) tiebreak — per-key bounded frames, no global "
    "sort, scale-indifferent.",
    tags=("timeseries", "anomaly", "window", "W3", "scale"),
)
def q156_rolling_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    q = t(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
        F.round(F.col("value") * 100, 0).cast("long").alias("xc"),
    )
    lb = (
        W.partitionBy("user_id")
        .orderBy("us", "event_id")
        .rowsBetween(-_ANOM_LOOKBACK, -1)
    )
    w = q.select(
        "user_id",
        "event_id",
        "xc",
        F.count("xc").over(lb).alias("n"),
        F.coalesce(F.sum("xc").over(lb), F.lit(0)).alias("s"),
        F.coalesce(F.sum(F.col("xc") * F.col("xc")).over(lb), F.lit(0)).alias(
            "s2"
        ),
    )
    dev = F.col("n") * F.col("xc") - F.col("s")
    var4 = 4 * (F.col("n") * F.col("s2") - F.col("s") * F.col("s"))
    return w.select(
        "user_id",
        "event_id",
        "xc",
        F.col("n").cast("long").alias("n_window"),
        ((F.col("n") >= _ANOM_MIN_N) & (dev * dev > var4))
        .cast("long")
        .alias("is_anom"),
    )


@register(
    "q164_event_transitions",
    oracle="""
    WITH e AS (
      SELECT user_id, event_type,
             lead(event_type) OVER (PARTITION BY user_id
                                    ORDER BY epoch_us(ts), event_id)
               AS next_type
      FROM events),
    c AS (
      SELECT event_type AS from_type, next_type AS to_type,
             count(*) AS c
      FROM e WHERE next_type IS NOT NULL
      GROUP BY 1, 2),
    tot AS (
      SELECT from_type, CAST(sum(c) AS BIGINT) AS row_total
      FROM c GROUP BY 1)
    SELECT c.from_type, c.to_type, CAST(c.c AS BIGINT) AS c,
           1000000 * c.c // t.row_total AS p_micro
    FROM c JOIN tot t USING (from_type)
    """,
    doc="First-order Markov transition matrix over per-user event "
    "sequences (the clickstream/session-modeling staple — next-step "
    "probabilities feed recommendation priors and bot detection): "
    "consecutive event pairs from ONE lead() pass per user (ordered "
    "by integer epoch-micros with an event_id tiebreak), corpus "
    "counts per (from, to), and the row-conditional probability in "
    "exact integer floor-division micro-units — no float anywhere. "
    "Scale: the lead window keys on user_id (per-key frames, no "
    "global sort), the transition agg is map-side combinable and "
    "its state is bounded by |event types|² regardless of event "
    "volume, and the row-total join touches a relation of that same "
    "tiny size.",
    tags=("timeseries", "markov", "window", "sequence", "scale"),
)
def q164_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = t(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
        "event_id",
    )
    w = W.partitionBy("user_id").orderBy("us", "event_id")
    pairs = (
        e.withColumn("next_type", F.lead("event_type").over(w))
        .filter(F.col("next_type").isNotNull())
        .select(
            F.col("event_type").alias("from_type"),
            F.col("next_type").alias("to_type"),
        )
    )
    c = pairs.groupBy("from_type", "to_type").agg(F.count("*").alias("c"))
    tot = c.groupBy("from_type").agg(
        F.sum("c").cast("long").alias("row_total")
    )
    return c.join(F.broadcast(tot), "from_type").select(
        "from_type",
        "to_type",
        F.col("c").cast("long").alias("c"),
        F.expr("div(1000000 * c, row_total)").alias("p_micro"),
    )


@register(
    "q171_twap",
    oracle="""
    WITH e AS (
      SELECT user_id,
             epoch_us(ts) AS us,
             event_id,
             CAST(round(value * 100) AS BIGINT) AS vc
      FROM events),
    seg AS (
      SELECT user_id, vc,
             lead(us) OVER (PARTITION BY user_id
                            ORDER BY us, event_id) - us AS dt
      FROM e),
    agg AS (
      SELECT user_id,
             count(*) AS n_held,
             CAST(sum(dt) AS BIGINT) AS span_us,
             CAST(sum(vc * dt) AS BIGINT) AS wsum
      FROM seg WHERE dt IS NOT NULL
      GROUP BY user_id)
    SELECT user_id, CAST(n_held AS BIGINT) AS n_held, span_us,
           round((CAST(wsum AS DOUBLE) / span_us) / 100.0, 6) AS twap
    FROM agg
    """,
    doc="Time-weighted average value per series (TWAP — the "
    "irregular-sampling-correct mean: each reading is weighted by "
    "how long it was the latest one, so burst periods don't "
    "dominate the way they do in a plain avg; the standard "
    "aggregate for sensor/price series like the solver's E-curve "
    "under uneven output cadence): one lead() pass per user gives "
    "each reading's holding interval, then one hash agg forms "
    "Σ value·dt / Σ dt. Exactness: centi-value × micro-duration "
    "products and both sums are pure int64 (bounded: max value "
    "49 002 centi × 30-day span ≈ 1.3e17 < 2^63); the single final "
    "division runs on identical int64-derived doubles. Scale: the "
    "window and the agg share one user_id partitioning; no global "
    "state, no sort beyond per-key frames.",
    tags=("timeseries", "twap", "window", "agg", "scale"),
)
def q171_twap(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = t(spark, sf_dir, "events").select(
        "user_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
        "event_id",
        F.round(F.col("value") * 100, 0).cast("long").alias("vc"),
    )
    w = W.partitionBy("user_id").orderBy("us", "event_id")
    seg = e.select(
        "user_id", "vc", (F.lead("us").over(w) - F.col("us")).alias("dt")
    ).filter(F.col("dt").isNotNull())
    return (
        seg.groupBy("user_id")
        .agg(
            F.count("*").cast("long").alias("n_held"),
            F.sum("dt").cast("long").alias("span_us"),
            F.sum(F.col("vc") * F.col("dt")).cast("long").alias("wsum"),
        )
        .select(
            "user_id",
            "n_held",
            "span_us",
            F.round(
                (F.col("wsum").cast("double") / F.col("span_us")) / 100.0,
                6,
            ).alias("twap"),
        )
    )


_DAY_US = 86_400_000_000


@register(
    "q172_retention_cohorts",
    oracle=f"""
    WITH e AS (
      SELECT user_id, epoch_us(ts) // {_DAY_US} AS day
      FROM events),
    cohort AS (
      SELECT user_id, min(day) AS c_day FROM e GROUP BY user_id),
    act AS (SELECT DISTINCT user_id, day FROM e)
    SELECT c.c_day AS cohort_day,
           a.day - c.c_day AS age_days,
           CAST(count(DISTINCT a.user_id) AS BIGINT) AS active_users
    FROM act a JOIN cohort c USING (user_id)
    GROUP BY 1, 2
    """,
    doc="Retention cohort matrix (the growth-analytics triangle: users "
    "grouped by first-seen day, activity counted per days-since-"
    "signup — the table every DAU/retention dashboard renders): a "
    "per-user min-agg forms the cohort assignment, a distinct "
    "(user, day) relation forms activity, and one join + count "
    "builds the matrix. All epoch-day integer arithmetic. Scale: "
    "cohort assignment and the activity dedup both key on user_id "
    "(one partitioning, map-side combinable), the join fans out "
    "1 per active day, and the output is bounded by days² "
    "regardless of event volume.",
    tags=("timeseries", "retention", "cohort", "agg", "scale"),
)
def q172_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = t(spark, sf_dir, "events").select(
        "user_id",
        F.expr(
            f"div(unix_micros(cast(ts AS timestamp)), {_DAY_US})"
        ).alias("day"),
    )
    cohort = e.groupBy("user_id").agg(F.min("day").alias("c_day"))
    act = e.distinct()
    return (
        act.join(cohort, "user_id")
        .groupBy(
            F.col("c_day").alias("cohort_day"),
            (F.col("day") - F.col("c_day")).alias("age_days"),
        )
        .agg(F.countDistinct("user_id").cast("long").alias("active_users"))
    )


_WAU_WINDOW = 7  # rolling window, days


@register(
    "q173_rolling_active",
    oracle=f"""
    WITH e AS (
      SELECT DISTINCT user_id, epoch_us(ts) // {_DAY_US} AS day
      FROM events),
    days AS (SELECT min(day) AS lo, max(day) AS hi FROM e),
    dau AS (
      SELECT day, CAST(count(*) AS BIGINT) AS dau FROM e GROUP BY day),
    spread AS (
      SELECT e.user_id, e.day + ofs.o AS day
      FROM e CROSS JOIN LATERAL (
        SELECT unnest(generate_series(0, {_WAU_WINDOW - 1})) AS o) ofs),
    wau AS (
      SELECT s.day, CAST(count(DISTINCT s.user_id) AS BIGINT) AS wau
      FROM spread s CROSS JOIN days d
      WHERE s.day BETWEEN d.lo AND d.hi
      GROUP BY s.day)
    SELECT w.day, coalesce(u.dau, 0) AS dau, w.wau
    FROM wau w LEFT JOIN dau u USING (day)
    """,
    doc="Rolling 7-day active users (DAU/WAU — the canonical sliding "
    "DISTINCT aggregation, which no window frame can express because "
    "distinct doesn't decompose): each (user, day) activity row is "
    "exploded to the 7 future days it keeps the user 'active' for "
    "(a BOUNDED generator — 7 rows per active day, the same "
    "bounded-explode discipline as the q145 interval buckets), then "
    "one distinct count per day. At 100 TB the explode factor is "
    "the window length, constant — versus the naive per-day "
    "self-join over a 7-day BETWEEN, whose pair space is "
    "events × window. All epoch-day integers; DAU rides the same "
    "deduped relation.",
    tags=("timeseries", "dau-wau", "sliding-distinct", "agg", "scale"),
)
def q173_rolling_active(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = (
        t(spark, sf_dir, "events")
        .select(
            "user_id",
            F.expr(
                f"div(unix_micros(cast(ts AS timestamp)), {_DAY_US})"
            ).alias("day"),
        )
        .distinct()
    )
    days = e.agg(F.min("day").alias("lo"), F.max("day").alias("hi"))
    dau = e.groupBy("day").agg(F.count("*").cast("long").alias("dau"))
    spread = e.select(
        "user_id",
        F.explode(
            F.sequence(F.col("day"), F.col("day") + (_WAU_WINDOW - 1))
        ).alias("day"),
    )
    wau = (
        spread.crossJoin(F.broadcast(days))
        .filter(F.col("day").between(F.col("lo"), F.col("hi")))
        .groupBy("day")
        .agg(F.countDistinct("user_id").cast("long").alias("wau"))
    )
    return wau.join(dau, "day", "left").select(
        "day",
        F.coalesce("dau", F.lit(0)).cast("long").alias("dau"),
        "wau",
    )


@register(
    "q174_attribution",
    oracle="""
    WITH e AS (
      SELECT user_id, event_id, event_type,
             epoch_us(ts) AS us
      FROM events),
    marked AS (
      SELECT user_id, event_id, event_type, us,
             last_value(CASE WHEN event_type <> 'purchase'
                             THEN event_type END IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY us, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS touch_type,
             last_value(CASE WHEN event_type <> 'purchase'
                             THEN us END IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY us, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS touch_us
      FROM e)
    SELECT coalesce(touch_type, 'none') AS touch_type,
           CAST(count(*) AS BIGINT) AS purchases,
           CAST(coalesce(sum(us - touch_us), 0) AS BIGINT)
             AS total_lag_micros
    FROM marked WHERE event_type = 'purchase'
    GROUP BY 1
    """,
    doc="Last-touch conversion attribution (which interaction gets "
    "credit for each purchase — the marketing-analytics sibling of "
    "q135's funnel, but per-conversion rather than per-user): for "
    "every purchase, the most recent PRECEDING non-purchase event "
    "in the same user's stream supplies the credited touch type and "
    "the conversion lag; purchases with no prior touch land in "
    "'none'. ONE IGNORE-NULLS last_value window pass per user "
    "(frame ends at 1 PRECEDING so a purchase never credits "
    "itself), then a tiny per-type roll-up — the same single-"
    "partitioning discipline as q148/q164; integer epoch-micros "
    "with the event_id tiebreak keep both engines' credit "
    "assignments identical.",
    tags=("timeseries", "attribution", "window", "scale"),
)
def q174_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = t(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        "event_type",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
    )
    prior = (
        W.partitionBy("user_id")
        .orderBy("us", "event_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    not_p = F.col("event_type") != "purchase"
    marked = e.select(
        "event_type",
        "us",
        F.last(F.when(not_p, F.col("event_type")), ignorenulls=True)
        .over(prior)
        .alias("touch_type"),
        F.last(F.when(not_p, F.col("us")), ignorenulls=True)
        .over(prior)
        .alias("touch_us"),
    )
    return (
        marked.filter(F.col("event_type") == "purchase")
        .groupBy(
            F.coalesce("touch_type", F.lit("none")).alias("touch_type")
        )
        .agg(
            F.count("*").cast("long").alias("purchases"),
            F.coalesce(F.sum(F.col("us") - F.col("touch_us")), F.lit(0))
            .cast("long")
            .alias("total_lag_micros"),
        )
    )


@register(
    "q175_cusum_changepoint",
    oracle="""
    WITH e AS (
      SELECT user_id,
             epoch_us(ts) AS us, event_id,
             CAST(round(value * 100) AS BIGINT) AS xc
      FROM events),
    stats AS (
      SELECT user_id, count(*) AS n, CAST(sum(xc) AS BIGINT) AS tot
      FROM e GROUP BY user_id),
    pre AS (
      SELECT e.user_id, s.n, s.tot,
             row_number() OVER w AS k,
             CAST(sum(e.xc) OVER (PARTITION BY e.user_id
               ORDER BY e.us, e.event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS pk
      FROM e JOIN stats s USING (user_id)
      WINDOW w AS (PARTITION BY e.user_id ORDER BY e.us, e.event_id)),
    dev AS (
      SELECT user_id, n, k,
             abs(n * pk - k * tot) AS d
      FROM pre WHERE k < n),
    mx AS (
      SELECT user_id, max(n) AS n, max(d) AS dmax FROM dev GROUP BY user_id)
    SELECT m.user_id, CAST(m.n AS BIGINT) AS n,
           CAST(min(v.k) AS BIGINT) AS cp_index,
           CAST(m.dmax AS BIGINT) AS cusum_n
    FROM mx m JOIN dev v ON v.user_id = m.user_id AND v.d = m.dmax
    GROUP BY m.user_id, m.n, m.dmax
    """,
    doc="CUSUM changepoint detection per series (where did the level "
    "shift? — the classic offline single-changepoint statistic: "
    "split at the k maximizing |mean-left − mean-right|, "
    "equivalently |n·prefix_k − k·total|, the division-free CUSUM "
    "form): per user, one prefix-sum window pass over "
    "centi-quantized values, then an argmax with a deterministic "
    "smallest-k tie-break. All int64 (n ≤ events-per-user, prefix "
    "≤ n·max-centi — no overflow at any realistic series length); "
    "the argmax is made engine-portable as max-deviation first, "
    "then min-k among the ties (two user-keyed aggs + one "
    "equi-join — no order-sensitive aggregate). The prefix window "
    "and every agg share ONE user_id partitioning.",
    tags=("timeseries", "changepoint", "cusum", "window", "scale"),
)
def q175_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = t(spark, sf_dir, "events").select(
        "user_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
        "event_id",
        F.round(F.col("value") * 100, 0).cast("long").alias("xc"),
    )
    stats = e.groupBy("user_id").agg(
        F.count("*").alias("n"), F.sum("xc").cast("long").alias("tot")
    )
    w = W.partitionBy("user_id").orderBy("us", "event_id")
    pre = (
        e.join(stats, "user_id")
        .select(
            "user_id",
            "n",
            "tot",
            F.row_number().over(w).alias("k"),
            F.sum("xc")
            .over(w.rowsBetween(W.unboundedPreceding, W.currentRow))
            .cast("long")
            .alias("pk"),
        )
        .filter(F.col("k") < F.col("n"))
    )
    dev = pre.select(
        "user_id",
        "n",
        "k",
        F.abs(F.col("n") * F.col("pk") - F.col("k") * F.col("tot")).alias(
            "d"
        ),
    )
    # portable argmax: max deviation per user, then smallest k at it
    dev = dev.localCheckpoint(eager=False)
    mx = dev.groupBy("user_id").agg(
        F.max("n").alias("n_mx"), F.max("d").alias("dmax")
    )
    return (
        dev.select("user_id", "k", "d")
        .join(mx, "user_id")
        .filter(F.col("d") == F.col("dmax"))
        .groupBy("user_id")
        .agg(
            F.max("n_mx").cast("long").alias("n"),
            F.min("k").cast("long").alias("cp_index"),
            F.max("dmax").cast("long").alias("cusum_n"),
        )
    )


_COOC_MIN_USERS = 3


@register(
    "q176_cooccurrence",
    oracle=f"""
    WITH items AS (
      SELECT DISTINCT user_id,
             CAST(regexp_extract(props, '"k": (-?[0-9]+)', 1) AS BIGINT)
               AS item
      FROM events),
    pairs AS (
      SELECT a.item AS item_a, b.item AS item_b,
             count(*) AS users_both
      FROM items a JOIN items b
        ON a.user_id = b.user_id AND a.item < b.item
      GROUP BY 1, 2
      HAVING count(*) >= {_COOC_MIN_USERS}),
    pop AS (SELECT item, count(*) AS users FROM items GROUP BY item)
    SELECT p.item_a, p.item_b, CAST(p.users_both AS BIGINT) AS users_both,
           1000000 * p.users_both // least(pa.users, pb.users)
             AS overlap_micro
    FROM pairs p
    JOIN pop pa ON pa.item = p.item_a
    JOIN pop pb ON pb.item = p.item_b
    """,
    doc="Item co-occurrence graph (market-basket / 'users who touched "
    "X also touched Y' — the bipartite user-item projection behind "
    "co-view recommenders), items taken from the props payload's k "
    "field: distinct (user, item) pairs self-join WITHIN each user "
    "(the per-key bounded quadratic every basket analysis pays — "
    "fan-out is items-per-user², bounded by the item vocabulary, "
    "NEVER users²), pair support counts with a min-support HAVING, "
    "and the overlap coefficient |A∩B|/min(|A|,|B|) in exact "
    "integer micro-units. The popularity joins key on single items "
    "against a relation bounded by |items|. At 100 TB a hot user "
    "(bot) caps at vocabulary², and the support filter prunes "
    "before the popularity joins.",
    tags=("analytics", "cooccurrence", "market-basket", "graph", "scale"),
)
def q176_cooccurrence(spark: SparkSession, sf_dir: str) -> DataFrame:
    items = (
        t(spark, sf_dir, "events")
        .select(
            "user_id",
            F.get_json_object("props", "$.k").cast("long").alias("item"),
        )
        .distinct()
    )
    a = items.select("user_id", F.col("item").alias("item_a"))
    b = items.select("user_id", F.col("item").alias("item_b"))
    pairs = (
        a.join(b, "user_id")
        .filter(F.col("item_a") < F.col("item_b"))
        .groupBy("item_a", "item_b")
        .agg(F.count("*").alias("users_both"))
        .filter(F.col("users_both") >= _COOC_MIN_USERS)
    )
    pop = items.groupBy("item").agg(F.count("*").alias("users"))
    return (
        pairs.join(
            pop.select(F.col("item").alias("item_a"), F.col("users").alias("ua")),
            "item_a",
        )
        .join(
            pop.select(F.col("item").alias("item_b"), F.col("users").alias("ub")),
            "item_b",
        )
        .select(
            "item_a",
            "item_b",
            F.col("users_both").cast("long").alias("users_both"),
            F.expr(
                "div(1000000 * users_both, least(ua, ub))"
            ).alias("overlap_micro"),
        )
    )


_PATH_TOPK = 20


@register(
    "q188_path_trigrams",
    oracle=f"""
    WITH e AS (
      SELECT user_id, event_type,
             lead(event_type) OVER w AS t2,
             lead(event_type, 2) OVER w AS t3
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)),
    tri AS (
      SELECT event_type || '>' || t2 || '>' || t3 AS path,
             count(*) AS c
      FROM e WHERE t3 IS NOT NULL
      GROUP BY 1),
    rk AS (
      SELECT path, c,
             row_number() OVER (ORDER BY c DESC, path) AS rk
      FROM tri)
    SELECT path, CAST(c AS BIGINT) AS c, CAST(rk AS BIGINT) AS rk
    FROM rk WHERE rk <= {_PATH_TOPK}
    """,
    doc="Top user-journey trigrams (path analysis: the most common "
    "3-step event sequences — what product flows actually look "
    "like, the n-gram generalization of q164's transition matrix): "
    "two lead() offsets in ONE user-keyed window pass build each "
    "3-step path, a map-side-combinable count aggregates them "
    "(state bounded by |types|³ = 125 regardless of volume), and "
    "the top-20 ranks deterministically with a path tie-break over "
    "that tiny relation — the final window sees ≤125 rows, the "
    "q184 calendar-axis exemption. All ordering in integer "
    "epoch-micros with event_id tiebreaks.",
    tags=("timeseries", "path-analysis", "sequence", "window", "scale"),
)
def q188_path_trigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = t(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
        "event_id",
    )
    w = W.partitionBy("user_id").orderBy("us", "event_id")
    tri = (
        e.select(
            "event_type",
            F.lead("event_type").over(w).alias("t2"),
            F.lead("event_type", 2).over(w).alias("t3"),
        )
        .filter(F.col("t3").isNotNull())
        .select(
            F.concat_ws(">", "event_type", "t2", "t3").alias("path")
        )
        .groupBy("path")
        .agg(F.count("*").alias("c"))
    )
    rk = W.orderBy(F.col("c").desc(), "path")
    return (
        tri.withColumn("rk", F.row_number().over(rk))
        .filter(F.col("rk") <= _PATH_TOPK)
        .select(
            "path",
            F.col("c").cast("long").alias("c"),
            F.col("rk").cast("long").alias("rk"),
        )
    )


_JK_BUCKETS = 10


@register(
    "q189_jackknife_ci",
    oracle=f"""
    WITH q AS (
      SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS pc,
             CAST(('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 4))
                  AS BIGINT) % {_JK_BUCKETS} AS b
      FROM orders),
    per AS (
      SELECT b, CAST(sum(pc) AS BIGINT) AS s, count(*) AS n
      FROM q GROUP BY b),
    tot AS (
      SELECT CAST(sum(s) AS BIGINT) AS st, CAST(sum(n) AS BIGINT) AS nt
      FROM per),
    loo AS (
      SELECT p.b,
             (CAST(t.st - p.s AS DOUBLE) / (t.nt - p.n)) AS mu_i
      FROM per p CROSS JOIN tot t),
    jk AS (
      SELECT CAST(sum(CAST(round(mu_i) AS BIGINT)) AS BIGINT) AS smu,
             CAST(sum(CAST(round(mu_i) AS BIGINT)
                      * CAST(round(mu_i) AS BIGINT)) AS BIGINT) AS smu2,
             count(*) AS g
      FROM loo)
    SELECT CAST(t.nt AS BIGINT) AS n_rows,
           round(CAST(t.st AS DOUBLE) / t.nt / 100.0, 6) AS mean_value,
           round((CAST(j.g - 1 AS DOUBLE) / j.g)
                 * (j.smu2 - CAST(j.smu AS DOUBLE) * j.smu / j.g)
                 / 10000.0, 6) AS jk_var
    FROM tot t CROSS JOIN jk j
    """,
    doc="Delete-one-group jackknife variance of the mean — DETERMINISTIC "
    "uncertainty quantification (a bootstrap needs RNG, which no "
    "cross-engine oracle can replay; the grouped jackknife gets a "
    "principled standard error from md5-assigned buckets instead): "
    "orders hash into 10 groups, each leave-one-group-out mean is "
    "computed from the complement's EXACT integer sums, the "
    "pseudo-value variance ((g-1)/g)·Σ(μ_i − μ̄)² is assembled from "
    "centi-quantized μ_i in exact int64 (immune to summation "
    "order; micro units would overflow the squares), and only the "
    "final scaling runs in shared-literal "
    "float ops. One hash agg over the data, then arithmetic over "
    "10 rows — at 100 TB the jackknife costs one aggregation.",
    tags=("timeseries", "jackknife", "uncertainty", "agg", "scale"),
)
def q189_jackknife_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    from columnarmodeling_spark.functions.text import hex_hash  # noqa: F401

    q = t(spark, sf_dir, "orders").select(
        F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("pc"),
        (
            F.conv(
                F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 4),
                16,
                10,
            ).cast("long")
            % _JK_BUCKETS
        ).alias("b"),
    )
    per = q.groupBy("b").agg(
        F.sum("pc").cast("long").alias("s"), F.count("*").alias("n")
    )
    tot = per.agg(
        F.sum("s").cast("long").alias("st"),
        F.sum("n").cast("long").alias("nt"),
    )
    loo = per.crossJoin(F.broadcast(tot)).select(
        (
            (F.col("st") - F.col("s")).cast("double")
            / (F.col("nt") - F.col("n"))
        ).alias("mu_i")
    )
    # quantize each leave-one-out mean to 1 centi-unit: exact int64
    # (micro units would square past 2^63 — means are ~1.5e7 centi)
    muq = F.round(F.col("mu_i"), 0).cast("long")
    jk = loo.select(muq.alias("mq")).agg(
        F.sum("mq").cast("long").alias("smu"),
        F.sum(F.col("mq") * F.col("mq")).cast("long").alias("smu2"),
        F.count("*").alias("g"),
    )
    return tot.crossJoin(F.broadcast(jk)).select(
        F.col("nt").cast("long").alias("n_rows"),
        F.round(
            F.col("st").cast("double") / F.col("nt") / 100.0, 6
        ).alias("mean_value"),
        F.round(
            ((F.col("g") - 1).cast("double") / F.col("g"))
            * (
                F.col("smu2")
                - F.col("smu").cast("double") * F.col("smu") / F.col("g")
            )
            / 10000.0,
            6,
        ).alias("jk_var"),
    )


@register(
    "q194_ewma_smoothing",
    oracle="""
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_events,
           round(list_reduce(
             list(value ORDER BY epoch_us(ts), event_id),
             (acc, x) -> 0.25 * x + 0.75 * acc), 6) AS ewma
    FROM events
    GROUP BY user_id
    """,
    doc="Per-user exponentially-weighted moving average of the event "
    "value stream (alpha = 0.25 — exactly representable, so the "
    "recurrence s = 0.25*x + 0.75*s is two exact-operand IEEE "
    "multiplies and one add per element): the classic smoothing "
    "primitive behind rate limiting, engagement scores and anomaly "
    "baselines. An EWMA is a sequential fold, which SQL windows can't "
    "express without numerically-explosive a^(-i) weight tricks — "
    "instead BOTH engines fold the identical (ts, event_id)-ordered "
    "per-user list left-to-right with the first element as seed "
    "(Spark: array_sort(collect_list(struct)) + aggregate() over the "
    "tail; DuckDB: list(... ORDER BY) + list_reduce) — the same IEEE "
    "op sequence on the same operands, hence bit-identical before the "
    "6dp rounding. Per-user lists are bounded by per-user activity "
    "(the q164/q166 state argument); at 100 TB the groupBy "
    "distributes on user_id and the fold is map-side within each "
    "group — one shuffle total. SKEW BOUND (the with_group_rank-style "
    "stated requirement): collect_list materializes one user's full "
    "history in one agg buffer, so a pathological user with ~10^8 "
    "events needs the segmented form instead — an EWMA over a segment "
    "is the affine map s_out = A*s_in + B with A = 0.75^len, and "
    "affine maps compose ASSOCIATIVELY, so per-chunk (A, B) pairs "
    "reduce in any order; that variant trades the bit-exact "
    "cross-engine fold for re-association noise, which is why the "
    "registered query keeps the plain fold; the segmented variant "
    "is registered separately as q208 with its own chunk-association "
    "oracle.",
    tags=("timeseries", "ewma", "fold", "agg", "scale"),
)
def q194_ewma_smoothing(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events").select(
        "user_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
        "event_id",
        "value",
    )
    g = ev.groupBy("user_id").agg(
        F.count("*").cast("long").alias("n_events"),
        F.array_sort(
            F.collect_list(F.struct("us", "event_id", "value"))
        ).alias("s"),
    )
    vals = F.transform("s", lambda e: e["value"])
    ewma = F.aggregate(
        F.slice(vals, 2, F.greatest(F.size(vals) - 1, F.lit(0))),
        F.element_at(vals, 1),
        lambda acc, x: F.lit(0.25) * x + F.lit(0.75) * acc,
    )
    return g.select(
        "user_id", "n_events", F.round(ewma, 6).alias("ewma")
    )


# --- q208: the segmented associative EWMA (q194's stated skew escape) ------

_SEG_W = 172_800_000_000  # 2-day chunk width in epoch-micros


@register(
    "q208_ewma_segmented",
    oracle=f"""
    WITH ev AS (
      SELECT user_id, epoch_us(ts) AS us, event_id, value,
             epoch_us(ts) // {_SEG_W} AS chunk
      FROM events),
    ck AS (
      SELECT user_id, chunk, count(*) AS cn,
             list_reduce(
               list_prepend(struct_pack(a := 1.0::DOUBLE, b := 0.0::DOUBLE),
                 list(struct_pack(a := 0.75::DOUBLE, b := 0.25 * value)
                      ORDER BY us, event_id)),
               (acc, m) -> struct_pack(a := m.a * acc.a,
                                       b := m.a * acc.b + m.b)) AS m
      FROM ev GROUP BY 1, 2),
    u AS (
      SELECT user_id,
             CAST(sum(cn) AS BIGINT) AS n_events,
             CAST(count(*) AS BIGINT) AS n_chunks,
             list_reduce(
               list_prepend(struct_pack(a := 1.0::DOUBLE, b := 0.0::DOUBLE),
                 list(struct_pack(a := m.a, b := m.b) ORDER BY chunk)),
               (acc, c) -> struct_pack(a := c.a * acc.a,
                                       b := c.a * acc.b + c.b)) AS t
      FROM ck GROUP BY 1),
    s0 AS (
      SELECT user_id, first(value ORDER BY us, event_id) AS v0
      FROM ev GROUP BY 1)
    SELECT u.user_id, u.n_events, u.n_chunks,
           round(u.t.a * s0.v0 + u.t.b, 6) AS ewma
    FROM u JOIN s0 USING (user_id)
    """,
    doc="SEGMENTED associative EWMA — the registered form of the skew "
    "escape q194's docstring states (round-7 verdict #3): an EWMA "
    "over a segment is the affine map s_out = A·s_in + B with "
    "A = 0.75^len, and affine maps COMPOSE ASSOCIATIVELY, so no agg "
    "buffer ever holds more than one time-chunk of one user's "
    "history. Events chunk into fixed 2-day windows; each "
    "(user, chunk) folds its own sorted values to an (A, B) pair "
    "[per-event map (0.75, 0.25·x), identity-seeded]; per user the "
    "bounded chunk-map list composes in window order and applies to "
    "s0 = the first value — algebraically identical to q194's fold "
    "(uniform maps with s0 = x1 reproduce the seed exactly: "
    "0.75·x1 + 0.25·x1 = x1), differing only by FP re-association, "
    "which is why this is a SEPARATE query with an oracle replaying "
    "the exact chunked association rather than q194's plain fold. "
    "A 10^8-event user now costs max(events-per-chunk) buffer, not "
    "their whole history; the single-user skew probe is in SCALE.md.",
    tags=("timeseries", "ewma", "segmented", "agg", "skew", "scale"),
)
def q208_ewma_segmented(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events").select(
        "user_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
        "event_id",
        "value",
    )
    return segmented_ewma(ev, _SEG_W)


def segmented_ewma(ev: DataFrame, chunk_width: int) -> DataFrame:
    """The q208 plan on any (user_id, us, event_id, value) frame —
    exposed so the skew probe (tools/skew_test.py single-user run) and
    tests can drive it at chosen chunk widths."""
    # cross-engine exactness on negative (pre-1970) epochs: Spark's
    # div() truncates toward zero, and DuckDB's BIGINT // ALSO truncates
    # toward zero (probed on v1.0.0: (-7)::BIGINT // 2 = -3, -1 // 3 =
    # 0; only its FLOAT // floors), so the two sides agree on every
    # input with no non-negativity assumption (round-8 ADVICE checked —
    # its floor-division premise held only for DuckDB doubles).
    ev = ev.withColumn("chunk", F.expr(f"div(us, {chunk_width})"))
    ident = F.struct(F.lit(1.0).alias("a"), F.lit(0.0).alias("b"))
    per_chunk = (
        ev.groupBy("user_id", "chunk")
        .agg(
            F.count("*").alias("cn"),
            F.array_sort(
                F.collect_list(F.struct("us", "event_id", "value"))
            ).alias("s"),
        )
        .select(
            "user_id",
            "chunk",
            "cn",
            F.aggregate(
                F.transform("s", lambda e: e["value"]),
                ident,
                lambda acc, x: F.struct(
                    (F.lit(0.75) * acc["a"]).alias("a"),
                    (F.lit(0.25) * x + F.lit(0.75) * acc["b"]).alias("b"),
                ),
            ).alias("m"),
            F.element_at(F.col("s"), 1).alias("first_e"),
        )
    )
    per_user = per_chunk.groupBy("user_id").agg(
        F.sum("cn").cast("long").alias("n_events"),
        F.count("*").cast("long").alias("n_chunks"),
        F.array_sort(F.collect_list(F.struct("chunk", "m"))).alias("maps"),
        F.min(F.struct("chunk", "first_e")).alias("f0"),
    )
    comp = F.aggregate(
        F.col("maps"),
        ident,
        lambda acc, c: F.struct(
            (c["m"]["a"] * acc["a"]).alias("a"),
            (c["m"]["a"] * acc["b"] + c["m"]["b"]).alias("b"),
        ),
    )
    s0 = F.col("f0")["first_e"]["value"]
    return per_user.select(
        "user_id",
        "n_events",
        "n_chunks",
        F.round(comp["a"] * s0 + comp["b"], 6).alias("ewma"),
    )


# --- q241: autocorrelation of the hourly event-count series ----------------

_ACF_MAX_LAG = 6


@register(
    "q241_acf",
    oracle=f"""
    WITH obs AS (
      SELECT epoch_us(ts) // {_HOUR_US} AS hr,
             CAST(count(*) AS BIGINT) AS x
      FROM events GROUP BY 1),
    b AS (SELECT min(hr) AS lo, max(hr) AS hi FROM obs),
    grid AS (
      SELECT g.hr, CAST(coalesce(o.x, 0) AS BIGINT) AS x
      FROM (SELECT unnest(generate_series(lo, hi)) AS hr FROM b) g
      LEFT JOIN obs o USING (hr)),
    s AS (
      SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(x) AS BIGINT) AS sx
      FROM grid),
    cen AS (
      SELECT g.hr, CAST(s.n * g.x - s.sx AS BIGINT) AS d
      FROM grid g, s),
    den AS (SELECT CAST(sum(d * d) AS BIGINT) AS den FROM cen),
    lags AS (SELECT unnest(range(1, {_ACF_MAX_LAG} + 1)) AS lag),
    num AS (
      SELECT l.lag, CAST(count(*) AS BIGINT) AS n_terms,
             CAST(sum(a.d * b.d) AS BIGINT) AS num
      FROM lags l
      JOIN cen a ON true
      JOIN cen b ON b.hr = a.hr + l.lag
      GROUP BY 1)
    SELECT n.lag, n.n_terms,
           CAST(round(1000000.0 * CAST(n.num AS DOUBLE) / d.den)
             AS BIGINT) AS r_micro
    FROM num n, den d ORDER BY n.lag
    """,
    doc="AUTOCORRELATION FUNCTION (lags 1..{L}) of the hourly event-"
    "count series — the seasonality/burstiness fingerprint that "
    "decides whether q156's anomaly rule needs a seasonal term and "
    "what period q183's seasonal split should use. The series is "
    "the ZERO-FILLED hourly grid (gaps are real zeros for a count "
    "series — q149's LOCF would be wrong here); centering is exact "
    "integer: d_t = N*x_t - S avoids the fractional mean, the "
    "num/den sums are int64 (count-scale products; at petabyte "
    "rows the counts rescale to k-units first), and each r is one "
    "final division quantized to micro. Scale: the event scan "
    "folds to the hourly-bucket agg (map-side combinable); every "
    "window-free join after that runs over the GRID relation, "
    "whose size is the time span in hours — bounded by the clock, "
    "not the data.".format(L=_ACF_MAX_LAG),
    tags=("timeseries", "stats", "acf", "seasonality", "scale"),
)
def q241_acf(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = t(spark, sf_dir, "events").select(
        F.expr(f"div(unix_micros(cast(ts AS timestamp)), {_HOUR_US})")
        .alias("hr")
    )
    obs = e.groupBy("hr").agg(F.count(F.lit(1)).cast("long").alias("x"))
    b = obs.agg(F.min("hr").alias("lo"), F.max("hr").alias("hi"))
    grid = (
        b.select(F.explode(F.sequence("lo", "hi")).alias("hr"))
        .join(obs, "hr", "left")
        .select("hr", F.coalesce("x", F.lit(0)).cast("long").alias("x"))
    )
    s = grid.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
    )
    cen = grid.crossJoin(F.broadcast(s)).select(
        "hr",
        (F.col("n") * F.col("x") - F.col("sx")).cast("long").alias("d"),
    )
    den = cen.agg(
        F.sum(F.col("d") * F.col("d")).cast("long").alias("den")
    )
    lags = spark.range(1, _ACF_MAX_LAG + 1).select(
        F.col("id").alias("lag")
    )
    a = cen.crossJoin(F.broadcast(lags))
    bb = cen.select(
        F.col("hr").alias("hr_b"), F.col("d").alias("d_b")
    )
    num = (
        a.join(bb, F.col("hr_b") == F.col("hr") + F.col("lag"))
        .groupBy("lag")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_terms"),
            F.sum(F.col("d") * F.col("d_b")).cast("long").alias("num"),
        )
    )
    return (
        num.crossJoin(F.broadcast(den))
        .select(
            "lag",
            "n_terms",
            F.round(
                F.lit(1000000.0)
                * F.col("num").cast("double")
                / F.col("den")
            )
            .cast("long")
            .alias("r_micro"),
        )
        .orderBy("lag")
    )


# --- q242: Markov stationary distribution (power iteration) ----------------

_ST_ITERS = 20
_ST_SCALE = 1_000_000


def _markov_chain_cte() -> str:
    """Shared WITH body: transition counts, row totals, and the
    unrolled integer power iteration through it{_ST_ITERS} — composed
    (not spliced) into the q242 and q254 oracles."""
    head = f"""
    WITH pairs AS (
      SELECT event_type AS from_type,
             lead(event_type) OVER (PARTITION BY user_id
               ORDER BY epoch_us(ts), event_id) AS to_type
      FROM events),
    m AS (
      SELECT from_type, to_type, CAST(count(*) AS BIGINT) AS c
      FROM pairs WHERE to_type IS NOT NULL GROUP BY 1, 2),
    rt AS (
      SELECT from_type, CAST(sum(c) AS BIGINT) AS row_total
      FROM m GROUP BY 1),
    k AS (SELECT CAST(count(*) AS BIGINT) AS k FROM rt),
    it0 AS (
      SELECT from_type AS j, CAST({_ST_SCALE} // k.k AS BIGINT) AS v
      FROM rt, k)"""
    steps = [
        f""",
    it{i + 1} AS (
      SELECT m.to_type AS j,
             CAST(sum((v.v * m.c) // r.row_total) AS BIGINT) AS v
      FROM it{i} v
      JOIN m ON m.from_type = v.j
      JOIN rt r ON r.from_type = m.from_type
      GROUP BY 1)"""
        for i in range(_ST_ITERS)
    ]
    return head + "".join(steps)


def _stationary_oracle() -> str:
    return (
        _markov_chain_cte()
        + f"""
    SELECT j AS event_type, v AS v_micro
    FROM it{_ST_ITERS} ORDER BY j
    """
    )


@register(
    "q242_markov_stationary",
    oracle=_stationary_oracle(),
    doc="MARKOV STATIONARY DISTRIBUTION by power iteration over "
    "q164's transition matrix — the long-run state occupancy that "
    "turns next-step probabilities into traffic shares (PageRank's "
    "kernel on the event-type chain). Iteration semantics are "
    "INTEGER end to end so both engines walk bit-identical states: "
    "v lives in micro-mass units, each step's term is the exact "
    "truncating division (v_i * c_ij) div rowtotal_i summed in "
    "int64 — no float ever, the per-term floor leaks < k micro "
    "per step by design (documented, deterministic). {N} unrolled "
    "iterations; the oracle replays them as {N} chained CTEs. "
    "Scale: the transition counts aggregate distributed (map-side "
    "combinable, state <= |types|^2); the iteration itself folds "
    "on the driver over the COLLECTED |types|^2-row matrix — the "
    "q63 bounded-relation precedent (5 event types; a 1e6-state "
    "chain would move the same integer fold into a joined "
    "iteration like q143's k-means rounds).".format(N=_ST_ITERS),
    tags=("timeseries", "markov", "iterative", "graph", "scale"),
)
def q242_markov_stationary(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = t(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
        "event_id",
    )
    pairs = e.select(
        F.col("event_type").alias("from_type"),
        F.lead("event_type")
        .over(
            W.partitionBy("user_id").orderBy("us", "event_id")
        )
        .alias("to_type"),
    ).filter(F.col("to_type").isNotNull())
    m = (
        pairs.groupBy("from_type", "to_type")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .collect()
    )  # bounded: <= |event types|^2 rows
    rt: dict = {}
    for r in m:
        rt[r.from_type] = rt.get(r.from_type, 0) + r.c
    k = len(rt)
    v = {s: _ST_SCALE // k for s in rt}
    for _ in range(_ST_ITERS):
        nxt: dict = {}
        for r in m:
            if r.from_type in v:
                nxt[r.to_type] = nxt.get(r.to_type, 0) + (
                    v[r.from_type] * r.c
                ) // rt[r.from_type]
        v = nxt
    out = sorted(v.items())
    return spark.createDataFrame(
        [(s, int(x)) for s, x in out], "event_type string, v_micro long"
    )


# --- q243: CUSUM changepoint statistic per event-type series ---------------


@register(
    "q243_cusum_changepoint",
    oracle=f"""
    WITH obs AS (
      SELECT event_type, epoch_us(ts) // {_HOUR_US} AS hr,
             CAST(count(*) AS BIGINT) AS x
      FROM events GROUP BY 1, 2),
    b AS (SELECT min(hr) AS lo, max(hr) AS hi FROM obs),
    ty AS (SELECT DISTINCT event_type FROM obs),
    grid AS (
      SELECT t.event_type, g.hr, CAST(coalesce(o.x, 0) AS BIGINT) AS x
      FROM ty t
      CROSS JOIN (SELECT unnest(generate_series(lo, hi)) AS hr FROM b) g
      LEFT JOIN obs o
        ON o.event_type = t.event_type AND o.hr = g.hr),
    s AS (
      SELECT event_type, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x) AS BIGINT) AS sx
      FROM grid GROUP BY 1),
    pref AS (
      SELECT g.event_type, g.hr,
             sum(s.n * g.x - s.sx) OVER (
               PARTITION BY g.event_type ORDER BY g.hr
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS r
      FROM grid g JOIN s ON s.event_type = g.event_type),
    cus AS (
      SELECT event_type, hr,
             r - least(CAST(0 AS BIGINT),
                       min(r) OVER (
                         PARTITION BY event_type ORDER BY hr
                         ROWS BETWEEN UNBOUNDED PRECEDING
                         AND CURRENT ROW)) AS cusum
      FROM pref),
    pk AS (
      SELECT event_type, CAST(max(cusum) AS BIGINT) AS peak
      FROM cus GROUP BY 1)
    SELECT p.event_type, s.n AS n_hours, s.sx AS n_events, p.peak,
           CAST(min(c.hr) AS BIGINT) AS peak_hr
    FROM pk p
    JOIN s ON s.event_type = p.event_type
    JOIN cus c ON c.event_type = p.event_type AND c.cusum = p.peak
    GROUP BY p.event_type, s.n, s.sx, p.peak
    ORDER BY p.event_type
    """,
    doc="PAGE'S SEQUENTIAL CUSUM per event-type hourly series — the "
    "ONLINE drift detector complementing q175's offline "
    "single-split statistic (q175 argmaxes |n·prefix−k·total| over "
    "a per-user VALUE series; this runs the max(0, ·) reflected "
    "random walk over the zero-filled hourly COUNT grid, the form "
    "a monitor evaluates as data arrives): the one-sided "
    "CUSUM recursion S_k = max(0, S_(k-1) + d_k) is rewritten in "
    "closed form as S_k = R_k - min(0, min_(j<=k) R_j) over the "
    "prefix sums R of the integer-centered deviations d_t = "
    "N*x_t - S (the q241 exact-centering trick: no fractional "
    "mean), which turns a sequential recurrence into two STOCK "
    "window functions — a running sum and a running min — that "
    "both engines replay bit-identically in int64. The peak and "
    "its earliest hour (deterministic tie-break) locate the most "
    "likely changepoint. Scale: the event scan folds to the "
    "hourly agg (map-side combinable); windows partition by "
    "event_type over the clock-bounded grid, so no partition "
    "exceeds the time span in hours regardless of row count.",
    tags=("timeseries", "cusum", "changepoint", "window", "scale"),
)
def q243_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = t(spark, sf_dir, "events").select(
        "event_type",
        F.expr(f"div(unix_micros(cast(ts AS timestamp)), {_HOUR_US})")
        .alias("hr"),
    )
    obs = e.groupBy("event_type", "hr").agg(
        F.count(F.lit(1)).cast("long").alias("x")
    )
    b = obs.agg(F.min("hr").alias("lo"), F.max("hr").alias("hi"))
    ty = obs.select("event_type").distinct()
    grid = (
        ty.crossJoin(
            F.broadcast(
                b.select(F.explode(F.sequence("lo", "hi")).alias("hr"))
            )
        )
        .join(obs, ["event_type", "hr"], "left")
        .select(
            "event_type",
            "hr",
            F.coalesce("x", F.lit(0)).cast("long").alias("x"),
        )
    )
    s = grid.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
    )
    w = W.partitionBy("event_type").orderBy("hr")
    cus = (
        grid.join(F.broadcast(s), "event_type")
        .select(
            "event_type",
            "hr",
            F.sum(F.col("n") * F.col("x") - F.col("sx")).over(w).alias("r"),
        )
        .select(
            "event_type",
            "hr",
            (
                F.col("r")
                - F.least(F.lit(0).cast("long"), F.min("r").over(w))
            ).alias("cusum"),
        )
    )
    pk = cus.groupBy("event_type").agg(
        F.max("cusum").cast("long").alias("peak")
    )
    return (
        pk.join(F.broadcast(s), "event_type")
        .join(
            cus.withColumnRenamed("cusum", "peak").select(
                "event_type", "hr", "peak"
            ),
            ["event_type", "peak"],
        )
        .groupBy("event_type", "n", "sx", "peak")
        .agg(F.min("hr").cast("long").alias("peak_hr"))
        .select(
            "event_type",
            F.col("n").alias("n_hours"),
            F.col("sx").alias("n_events"),
            "peak",
            "peak_hr",
        )
        .orderBy("event_type")
    )


# --- q251: lead-lag cross-correlation between event-type series -------------

_XC_MAX_LAG = 6


@register(
    "q251_crosscorr",
    oracle=f"""
    WITH obs AS (
      SELECT event_type, epoch_us(ts) // {_HOUR_US} AS hr,
             CAST(count(*) AS BIGINT) AS x
      FROM events GROUP BY 1, 2),
    b AS (SELECT min(hr) AS lo, max(hr) AS hi FROM obs),
    types AS (SELECT DISTINCT event_type FROM obs),
    grid AS (
      SELECT t.event_type, g.hr, CAST(coalesce(o.x, 0) AS BIGINT) AS x
      FROM types t
      CROSS JOIN (SELECT unnest(generate_series(lo, hi)) AS hr FROM b) g
      LEFT JOIN obs o
        ON o.event_type = t.event_type AND o.hr = g.hr),
    s AS (
      SELECT event_type, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x) AS BIGINT) AS sx
      FROM grid GROUP BY 1),
    cen AS (
      SELECT g.event_type, g.hr,
             CAST(s.n * g.x - s.sx AS BIGINT) AS d
      FROM grid g JOIN s USING (event_type)),
    den AS (
      SELECT event_type, CAST(sum(d * d) AS BIGINT) AS den
      FROM cen GROUP BY 1),
    lags AS (
      SELECT unnest(range(-{_XC_MAX_LAG}, {_XC_MAX_LAG} + 1)) AS lag),
    num AS (
      SELECT a.event_type AS type_a, c.event_type AS type_b, l.lag,
             CAST(count(*) AS BIGINT) AS n_terms,
             CAST(sum(a.d * c.d) AS BIGINT) AS num
      FROM lags l
      JOIN cen a ON true
      JOIN cen c ON c.hr = a.hr + l.lag AND a.event_type < c.event_type
      GROUP BY 1, 2, 3)
    SELECT n.type_a, n.type_b, n.lag, n.n_terms,
           CAST(round(1000000.0 * CAST(n.num AS DOUBLE)
             / sqrt(CAST(da.den AS DOUBLE) * CAST(db.den AS DOUBLE)))
             AS BIGINT) AS r_micro
    FROM num n
    JOIN den da ON da.event_type = n.type_a
    JOIN den db ON db.event_type = n.type_b
    ORDER BY n.type_a, n.type_b, n.lag
    """,
    doc="LEAD-LAG CROSS-CORRELATION between every pair of event-type "
    "hourly count series — q241 ACF's bivariate companion: does a "
    "click burst LEAD an error burst (capacity), or lag it "
    "(retry storms)? Both series live on the SAME zero-filled "
    "global hourly grid (shared window so lags align; gaps are "
    "real zeros); centering is q241's exact integer d = n*x - S "
    "per series; the lag-l numerator sums d_a(t)*d_b(t+l) over "
    "the overlap (n_terms reported) for l in -{L}..{L}, and the "
    "normalizer is sqrt(den_a * den_b) computed as ONE identical-"
    "operand double expression on both engines (IEEE sqrt is "
    "correctly rounded — deterministic), quantized to micro. "
    "Scale: the event scan folds to the (type, hour) bucket agg; "
    "every join after runs on the grid relation (|types| x "
    "clock-bounded hours) with the 13-row lag table broadcast; "
    "|types| is schema-bounded, so the pair space never grows "
    "with rows.".format(L=_XC_MAX_LAG),
    tags=("timeseries", "stats", "crosscorr", "leadlag", "scale"),
)
def q251_crosscorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = t(spark, sf_dir, "events").select(
        "event_type",
        F.expr(f"div(unix_micros(cast(ts AS timestamp)), {_HOUR_US})")
        .alias("hr"),
    )
    obs = e.groupBy("event_type", "hr").agg(
        F.count(F.lit(1)).cast("long").alias("x")
    )
    b = obs.agg(F.min("hr").alias("lo"), F.max("hr").alias("hi"))
    types = obs.select("event_type").distinct()
    hours = b.select(F.explode(F.sequence("lo", "hi")).alias("hr"))
    grid = (
        types.crossJoin(hours)
        .join(obs, ["event_type", "hr"], "left")
        .select(
            "event_type",
            "hr",
            F.coalesce("x", F.lit(0)).cast("long").alias("x"),
        )
    )
    s = grid.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
    )
    cen = grid.join(F.broadcast(s), "event_type").select(
        "event_type",
        "hr",
        (F.col("n") * F.col("x") - F.col("sx")).cast("long").alias("d"),
    )
    cen = cen.localCheckpoint(eager=False)
    den = cen.groupBy("event_type").agg(
        F.sum(F.col("d") * F.col("d")).cast("long").alias("den")
    )
    lags = spark.range(-_XC_MAX_LAG, _XC_MAX_LAG + 1).select(
        F.col("id").alias("lag")
    )
    a = cen.select(
        F.col("event_type").alias("type_a"),
        F.col("hr").alias("hr_a"),
        F.col("d").alias("d_a"),
    ).crossJoin(F.broadcast(lags))
    c = cen.select(
        F.col("event_type").alias("type_b"),
        F.col("hr").alias("hr_b"),
        F.col("d").alias("d_b"),
    )
    num = (
        a.join(
            c,
            (F.col("hr_b") == F.col("hr_a") + F.col("lag"))
            & (F.col("type_a") < F.col("type_b")),
        )
        .groupBy("type_a", "type_b", "lag")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_terms"),
            F.sum(F.col("d_a") * F.col("d_b")).cast("long").alias("num"),
        )
    )
    da = den.select(
        F.col("event_type").alias("type_a"), F.col("den").alias("den_a")
    )
    db = den.select(
        F.col("event_type").alias("type_b"), F.col("den").alias("den_b")
    )
    return (
        num.join(F.broadcast(da), "type_a")
        .join(F.broadcast(db), "type_b")
        .select(
            "type_a",
            "type_b",
            "lag",
            "n_terms",
            F.round(
                F.lit(1000000.0)
                * F.col("num").cast("double")
                / F.sqrt(
                    F.col("den_a").cast("double")
                    * F.col("den_b").cast("double")
                )
            )
            .cast("long")
            .alias("r_micro"),
        )
        .orderBy("type_a", "type_b", "lag")
    )


# --- q254: Markov chain entropy rate ----------------------------------------


def _entropy_rate_oracle() -> str:
    return (
        _markov_chain_cte()
        + f"""
    ,
    lq AS (
      SELECT m.from_type, m.to_type, m.c, r.row_total,
             CAST(round(1000000.0 * ln(CAST(m.c AS DOUBLE)
                                       / CAST(r.row_total AS DOUBLE)))
               AS BIGINT) AS lq
      FROM m JOIN rt r USING (from_type)),
    h AS (
      SELECT from_type,
             CAST(sum((c * (-lq)) // row_total) AS BIGINT)
               AS h_state_micro
      FROM lq GROUP BY 1),
    st AS (
      SELECT j AS from_type, v AS pi_micro FROM it{_ST_ITERS}),
    per AS (
      SELECT h.from_type AS event_type, st.pi_micro, h.h_state_micro,
             CAST((st.pi_micro * h.h_state_micro) // 1000000 AS BIGINT)
               AS contrib_micro
      FROM h JOIN st USING (from_type)),
    allr AS (
      SELECT '_ALL' AS event_type, CAST(1000000 AS BIGINT) AS pi_micro,
             CAST(sum(contrib_micro) AS BIGINT) AS h_state_micro,
             CAST(sum(contrib_micro) AS BIGINT) AS contrib_micro
      FROM per)
    SELECT * FROM (SELECT * FROM per UNION ALL SELECT * FROM allr)
    ORDER BY event_type
    """
    )


@register(
    "q254_entropy_rate",
    oracle=_entropy_rate_oracle(),
    doc="MARKOV CHAIN ENTROPY RATE — the single number that closes "
    "the q164/q242/q237 family: H = sum_i pi_i * H(row_i), the "
    "per-step unpredictability of the event-type process (ln-nats "
    "micro-units; a near-zero rate means sequences are templated "
    "and q237's Theil U will find strong structure, ln|types| "
    "means white noise). Exactness: each row entropy is "
    "sum_j (c_ij * -lnq_ij) div rowtotal_i with the per-term ln "
    "micro-quantized IN the engines before any arithmetic (the "
    "q203/q221 discipline; 1-ulp libm skew vanishes at micro "
    "grain), and pi is q242's bit-identical 20-step integer "
    "power iteration, so every output cell is an int64 both "
    "engines compute identically. Scale: the transition agg is "
    "map-side combinable onto <= |types|^2 rows; the iteration "
    "and entropy fold run on that bounded relation (q63 "
    "precedent), reported per state plus the _ALL rate.",
    tags=("timeseries", "markov", "entropy", "stats", "scale"),
)
def q254_entropy_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = t(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
        "event_id",
    )
    pairs = e.select(
        F.col("event_type").alias("from_type"),
        F.lead("event_type")
        .over(W.partitionBy("user_id").orderBy("us", "event_id"))
        .alias("to_type"),
    ).filter(F.col("to_type").isNotNull())
    m = pairs.groupBy("from_type", "to_type").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    m = m.localCheckpoint(eager=False)  # bounded: <= |types|^2 rows
    rt = m.groupBy("from_type").agg(
        F.sum("c").cast("long").alias("row_total")
    )
    # pi: q242's integer power iteration over the collected matrix
    rows = m.collect()
    totals: dict = {}
    for r in rows:
        totals[r.from_type] = totals.get(r.from_type, 0) + r.c
    k = len(totals)
    v = {s: _ST_SCALE // k for s in totals}
    for _ in range(_ST_ITERS):
        nxt: dict = {}
        for r in rows:
            if r.from_type in v:
                nxt[r.to_type] = nxt.get(r.to_type, 0) + (
                    v[r.from_type] * r.c
                ) // totals[r.from_type]
        v = nxt
    st = spark.createDataFrame(
        sorted((s, int(x)) for s, x in v.items()),
        "from_type string, pi_micro long",
    )
    lq = m.join(F.broadcast(rt), "from_type").select(
        "from_type",
        "c",
        "row_total",
        F.round(
            F.lit(1000000.0)
            * F.log(
                F.col("c").cast("double")
                / F.col("row_total").cast("double")
            )
        )
        .cast("long")
        .alias("lq"),
    )
    h = (
        lq.select(
            "from_type",
            F.expr("div(c * (-lq), row_total)").alias("term"),
        )
        .groupBy("from_type")
        .agg(F.sum("term").cast("long").alias("h_state_micro"))
    )
    per = h.join(F.broadcast(st), "from_type").select(
        F.col("from_type").alias("event_type"),
        "pi_micro",
        "h_state_micro",
        F.expr("div(pi_micro * h_state_micro, 1000000)")
        .cast("long")
        .alias("contrib_micro"),
    )
    per = per.localCheckpoint(eager=False)
    allr = per.agg(
        F.sum("contrib_micro").cast("long").alias("h_state_micro"),
        F.sum("contrib_micro").cast("long").alias("contrib_micro"),
    ).select(
        F.lit("_ALL").alias("event_type"),
        F.lit(1000000).cast("long").alias("pi_micro"),
        "h_state_micro",
        "contrib_micro",
    )
    return per.unionByName(allr).orderBy("event_type")


# --- q255: Fano factor / burstiness per event-type hourly series ------------


@register(
    "q255_fano_factor",
    oracle=f"""
    WITH obs AS (
      SELECT event_type, epoch_us(ts) // {_HOUR_US} AS hr,
             CAST(count(*) AS BIGINT) AS x
      FROM events GROUP BY 1, 2),
    b AS (SELECT min(hr) AS lo, max(hr) AS hi FROM obs),
    ty AS (SELECT DISTINCT event_type FROM obs),
    grid AS (
      SELECT t.event_type, g.hr, CAST(coalesce(o.x, 0) AS BIGINT) AS x
      FROM ty t
      CROSS JOIN (SELECT unnest(generate_series(lo, hi)) AS hr FROM b) g
      LEFT JOIN obs o
        ON o.event_type = t.event_type AND o.hr = g.hr),
    s AS (
      SELECT event_type,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x) AS BIGINT) AS sx,
             CAST(sum(x * x) AS BIGINT) AS sxx
      FROM grid GROUP BY 1)
    SELECT event_type, n AS n_hours,
           CAST((1000 * sx) // n AS BIGINT) AS mean_milli,
           CAST(round(1000000.0
             * (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
             / (CAST(n - 1 AS DOUBLE) * CAST(sx AS DOUBLE)))
             AS BIGINT) AS fano_micro,
           CAST(round(1000000.0
             * (sqrt((CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
                     / (CAST(n AS DOUBLE) * CAST(n - 1 AS DOUBLE)))
                - CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))
             / (sqrt((CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
                     / (CAST(n AS DOUBLE) * CAST(n - 1 AS DOUBLE)))
                + CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)))
             AS BIGINT) AS burstiness_micro
    FROM s ORDER BY event_type
    """,
    doc="FANO FACTOR + BURSTINESS per event-type hourly series — the "
    "dispersion fingerprint next to q241's ACF and q243's CUSUM: "
    "a Poisson arrival process has F = Var/Mean = 1; F >> 1 means "
    "bursty traffic (the regime where q156's anomaly thresholds "
    "need widening), F < 1 means regularized/throttled. Also "
    "reports Goh-Barabasi burstiness B = (sigma-mu)/(sigma+mu) in "
    "[-1, 1]. The series is the zero-filled hourly grid (q241 "
    "discipline); moments are exact int64 (n, sum, sum of "
    "squares), the n*sxx - sx*sx numerator evaluates in DOUBLE "
    "on both engines (the q289 overflow guard — int64 wraps in "
    "Spark / errors in DuckDB near sx ~ 3e9), F is ONE double "
    "division, and B's sigma is IEEE sqrt (correctly rounded, "
    "cross-engine safe) over the same identical-operand "
    "expression text in both engines, each quantized to micro. "
    "Scale: the scan folds to the (type, hour) bucket agg "
    "map-side; the moment agg runs over the clock-bounded grid; "
    "output is |types| rows.",
    tags=("timeseries", "stats", "fano", "burstiness", "scale"),
)
def q255_fano_factor(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = t(spark, sf_dir, "events").select(
        "event_type",
        F.expr(f"div(unix_micros(cast(ts AS timestamp)), {_HOUR_US})")
        .alias("hr"),
    )
    obs = e.groupBy("event_type", "hr").agg(
        F.count(F.lit(1)).cast("long").alias("x")
    )
    b = obs.agg(F.min("hr").alias("lo"), F.max("hr").alias("hi"))
    grid = (
        obs.select("event_type")
        .distinct()
        .crossJoin(b.select(F.explode(F.sequence("lo", "hi")).alias("hr")))
        .join(obs, ["event_type", "hr"], "left")
        .select(
            "event_type",
            "hr",
            F.coalesce("x", F.lit(0)).cast("long").alias("x"),
        )
    )
    s = grid.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
    )
    # n*sxx and sx*sx evaluate in DOUBLE (the q289 guard): at ~3e9 hourly
    # events the int64 products wrap silently in Spark and error in
    # DuckDB, so both engines must run the identical double expression.
    num = F.col("n").cast("double") * F.col("sxx") - F.col("sx").cast(
        "double"
    ) * F.col("sx")
    var = num / (F.col("n").cast("double") * (F.col("n") - 1).cast("double"))
    sigma = F.sqrt(var)
    mu = F.col("sx").cast("double") / F.col("n").cast("double")
    return s.select(
        "event_type",
        F.col("n").alias("n_hours"),
        F.expr("div(1000 * sx, n)").cast("long").alias("mean_milli"),
        F.round(
            F.lit(1000000.0)
            * num
            / ((F.col("n") - 1).cast("double") * F.col("sx").cast("double"))
        )
        .cast("long")
        .alias("fano_micro"),
        F.round(F.lit(1000000.0) * (sigma - mu) / (sigma + mu))
        .cast("long")
        .alias("burstiness_micro"),
    ).orderBy("event_type")


# --- q257: inter-arrival exponentiality screen -------------------------------


@register(
    "q257_interarrival",
    oracle="""
    WITH ev AS (
      SELECT user_id, event_type, event_id,
             epoch_us(ts) AS us
      FROM events),
    gaps AS (
      SELECT event_type,
             us - lag(us) OVER (PARTITION BY user_id, event_type
               ORDER BY us, event_id) AS g
      FROM ev),
    gg AS (SELECT event_type, g, g // 1000000 AS gms
           FROM gaps WHERE g IS NOT NULL),
    s AS (
      SELECT event_type,
             CAST(count(*) AS BIGINT) AS n_gaps,
             CAST(sum(g) AS BIGINT) AS sg,
             CAST(sum(gms) AS BIGINT) AS sm,
             CAST(sum(gms * gms) AS BIGINT) AS smm
      FROM gg GROUP BY 1),
    tail AS (
      SELECT g.event_type,
             CAST(sum(CASE WHEN g.g * s.n_gaps > s.sg
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_over
      FROM gg g JOIN s USING (event_type)
      GROUP BY 1)
    SELECT s.event_type, s.n_gaps,
           CAST(s.sg // s.n_gaps AS BIGINT) AS mean_gap_us,
           CAST(round(1000000.0
             * sqrt((CAST(s.n_gaps AS DOUBLE) * CAST(s.smm AS DOUBLE)
                     - CAST(s.sm AS DOUBLE) * CAST(s.sm AS DOUBLE))
                    / (CAST(s.n_gaps AS DOUBLE)
                       * CAST(s.n_gaps - 1 AS DOUBLE)))
             / (CAST(s.sm AS DOUBLE) / CAST(s.n_gaps AS DOUBLE)))
             AS BIGINT) AS cv_micro,
           CAST((1000000 * t.n_over) // s.n_gaps AS BIGINT)
             AS tail_over_mean_micro
    FROM s JOIN tail t USING (event_type)
    ORDER BY s.event_type
    """,
    doc="INTER-ARRIVAL EXPONENTIALITY SCREEN per event type — the "
    "gap-domain dual of q255's count-domain Fano factor: a "
    "memoryless (Poisson) process has per-user inter-arrival "
    "gaps with CV = sigma/mu = 1 and P(gap > mean) = 1/e ~ "
    "0.367879; CV >> 1 or a fat tail fraction flags bursty "
    "sessions, CV << 1 flags scheduled/bot traffic. Gaps are "
    "exact microsecond int64 lags per (user, type) — the "
    "per-user partition is the event log's natural key, never a "
    "global per-type ordering (q26 discipline). Exactness: n and "
    "sum(g) are int64; the tail test is the cross-multiplication "
    "g*n > sum(g) — no division; the CV moments run on "
    "second-TRUNCATED gaps (g // 1e6 us, identical truncating "
    "div both engines) so sum(g_s^2) stays in exact int64 — no "
    "float aggregation exists (20-day max gaps square to ~3e12; "
    "~1e6 worst-case gaps per type fit; beyond that truncate to "
    "minutes, same rescale note as q241); CV is one "
    "IEEE-sqrt expression over the integer moments quantized to "
    "micro. Scale: two "
    "map-side-combinable aggs keyed (user,type) then type; the "
    "tail join broadcasts |types| moment rows.",
    tags=("timeseries", "stats", "poisson", "interarrival", "scale"),
)
def q257_interarrival(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        "event_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
    )
    gaps = ev.select(
        "event_type",
        (
            F.col("us")
            - F.lag("us").over(
                W.partitionBy("user_id", "event_type").orderBy(
                    "us", "event_id"
                )
            )
        ).alias("g"),
    ).filter(F.col("g").isNotNull())
    gaps = gaps.withColumn("gms", F.expr("div(g, 1000000)"))
    gaps = gaps.localCheckpoint(eager=False)
    s = gaps.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_gaps"),
        F.sum("g").cast("long").alias("sg"),
        F.sum("gms").cast("long").alias("sm"),
        F.sum(F.col("gms") * F.col("gms")).cast("long").alias("smm"),
    )
    tail = (
        gaps.join(F.broadcast(s), "event_type")
        .groupBy("event_type")
        .agg(
            F.sum(
                F.when(F.col("g") * F.col("n_gaps") > F.col("sg"), 1)
                .otherwise(0)
            )
            .cast("long")
            .alias("n_over")
        )
    )
    mu = F.col("sm").cast("double") / F.col("n_gaps").cast("double")
    sd = F.sqrt(
        (
            F.col("n_gaps").cast("double") * F.col("smm").cast("double")
            - F.col("sm").cast("double") * F.col("sm").cast("double")
        )
        / (
            F.col("n_gaps").cast("double")
            * (F.col("n_gaps") - 1).cast("double")
        )
    )
    return (
        s.join(tail, "event_type")
        .select(
            "event_type",
            "n_gaps",
            F.expr("div(sg, n_gaps)").cast("long").alias("mean_gap_us"),
            F.round(F.lit(1000000.0) * sd / mu)
            .cast("long")
            .alias("cv_micro"),
            F.expr("div(1000000 * n_over, n_gaps)")
            .cast("long")
            .alias("tail_over_mean_micro"),
        )
        .orderBy("event_type")
    )


# --- q268: Theil-Sen robust trend per event-type hourly series ---------------


@register(
    "q268_theil_sen",
    oracle=f"""
    WITH obs AS (
      SELECT event_type, epoch_us(ts) // {_HOUR_US} AS hr,
             CAST(count(*) AS BIGINT) AS x
      FROM events GROUP BY 1, 2),
    b AS (SELECT min(hr) AS lo, max(hr) AS hi FROM obs),
    ty AS (SELECT DISTINCT event_type FROM obs),
    grid AS (
      SELECT t.event_type, g.hr - b.lo AS h,
             CAST(coalesce(o.x, 0) AS BIGINT) AS x
      FROM ty t
      CROSS JOIN b
      CROSS JOIN (SELECT unnest(generate_series(lo, hi)) AS hr FROM b) g
      LEFT JOIN obs o
        ON o.event_type = t.event_type AND o.hr = g.hr),
    pairs AS (
      SELECT a.event_type,
             CAST(round(1000000.0 * (b2.x - a.x) / (b2.h - a.h))
               AS BIGINT) AS s
      FROM grid a
      JOIN grid b2
        ON b2.event_type = a.event_type AND b2.h > a.h),
    rk AS (
      SELECT event_type, s,
             row_number() OVER (PARTITION BY event_type ORDER BY s)
               AS rn,
             count(*) OVER (PARTITION BY event_type) AS np
      FROM pairs),
    med AS (
      SELECT event_type, CAST(np AS BIGINT) AS n_pairs,
             CAST(s AS BIGINT) AS slope_micro
      FROM rk WHERE rn = (np + 1) // 2),
    res AS (
      SELECT g.event_type, m.n_pairs, m.slope_micro,
             1000000 * g.x - m.slope_micro * g.h AS r
      FROM grid g JOIN med m USING (event_type)),
    rrk AS (
      SELECT event_type, n_pairs, slope_micro, r,
             row_number() OVER (PARTITION BY event_type ORDER BY r)
               AS rn,
             count(*) OVER (PARTITION BY event_type) AS nh
      FROM res)
    SELECT event_type, CAST(nh AS BIGINT) AS n_hours, n_pairs,
           slope_micro, CAST(r AS BIGINT) AS intercept_micro
    FROM rrk WHERE rn = (nh + 1) // 2
    ORDER BY event_type
    """,
    doc="THEIL-SEN ROBUST TREND per event-type hourly series — the "
    "breakdown-resistant member of the trend family (q153's OLS "
    "slope moves arbitrarily far under one corrupted bucket; the "
    "median-of-pairwise-slopes estimator tolerates 29% gross "
    "outliers — the right trend for traffic data where q255 just "
    "showed burstiness): slope = lower median over all C(n,2) "
    "pairwise (dx/dh) on the zero-filled hourly grid (q241/q255 "
    "discipline, hours re-based to the window start), intercept = "
    "lower median of the integer residuals 1e6*x - slope*h. "
    "Exactness: each pairwise slope is ONE identical-operand "
    "double division quantized to micro BEFORE ranking; medians "
    "are pure order statistics at rank (n+1)//2 (both engines "
    "floor positive division); residuals are exact int64. Scale: "
    "the pair space is CLOCK-BOUNDED (C(hours, 2) per type — "
    "independent of event volume, the q251 grid argument); the "
    "scan folds map-side onto the grid before any pairing; the "
    "rank windows partition by type over that bounded space.",
    tags=("timeseries", "stats", "robust", "trend", "scale"),
)
def q268_theil_sen(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = t(spark, sf_dir, "events").select(
        "event_type",
        F.expr(f"div(unix_micros(cast(ts AS timestamp)), {_HOUR_US})")
        .alias("hr"),
    )
    obs = e.groupBy("event_type", "hr").agg(
        F.count(F.lit(1)).cast("long").alias("x")
    )
    b = obs.agg(F.min("hr").alias("lo"), F.max("hr").alias("hi"))
    grid = (
        obs.select("event_type")
        .distinct()
        .crossJoin(F.broadcast(b))
        .select(
            "event_type",
            "lo",
            F.explode(F.sequence("lo", "hi")).alias("hr"),
        )
        .join(obs, ["event_type", "hr"], "left")
        .select(
            "event_type",
            (F.col("hr") - F.col("lo")).alias("h"),
            F.coalesce("x", F.lit(0)).cast("long").alias("x"),
        )
        .localCheckpoint(eager=False)
    )
    a = grid.select(
        "event_type", F.col("h").alias("ha"), F.col("x").alias("xa")
    )
    b2 = grid.select(
        "event_type", F.col("h").alias("hb"), F.col("x").alias("xb")
    )
    pairs = a.join(
        b2,
        ["event_type"],
    ).where(F.col("hb") > F.col("ha")).select(
        "event_type",
        F.expr(
            "CAST(round(1000000.0 * (xb - xa) / (hb - ha)) AS BIGINT)"
        ).alias("s"),
    )
    rk = pairs.select(
        "event_type",
        "s",
        F.row_number()
        .over(W.partitionBy("event_type").orderBy("s"))
        .alias("rn"),
        F.count(F.lit(1))
        .over(W.partitionBy("event_type"))
        .alias("np"),
    )
    med = rk.where(
        F.col("rn") == F.expr("div(np + 1, 2)")
    ).select(
        "event_type",
        F.col("np").cast("long").alias("n_pairs"),
        F.col("s").cast("long").alias("slope_micro"),
    )
    res = grid.join(F.broadcast(med), "event_type").select(
        "event_type",
        "n_pairs",
        "slope_micro",
        (
            F.lit(1000000).cast("long") * F.col("x")
            - F.col("slope_micro") * F.col("h")
        ).alias("r"),
    )
    rrk = res.select(
        "event_type",
        "n_pairs",
        "slope_micro",
        "r",
        F.row_number()
        .over(W.partitionBy("event_type").orderBy("r"))
        .alias("rn"),
        F.count(F.lit(1))
        .over(W.partitionBy("event_type"))
        .alias("nh"),
    )
    return (
        rrk.where(F.col("rn") == F.expr("div(nh + 1, 2)"))
        .select(
            "event_type",
            F.col("nh").cast("long").alias("n_hours"),
            "n_pairs",
            "slope_micro",
            F.col("r").cast("long").alias("intercept_micro"),
        )
        .orderBy("event_type")
    )


# --- q269: hour-of-day seasonality profile + ANOVA strength ------------------

_DAY_US = 86_400_000_000


@register(
    "q269_seasonality",
    oracle=f"""
    WITH obs AS (
      SELECT event_type,
             epoch_us(ts) // {_DAY_US} AS day,
             (epoch_us(ts) // {_HOUR_US}) % 24 AS hod,
             CAST(count(*) AS BIGINT) AS x
      FROM events GROUP BY 1, 2, 3),
    b AS (SELECT min(day) AS lo, max(day) AS hi FROM obs),
    ty AS (SELECT DISTINCT event_type FROM obs),
    grid AS (
      SELECT t.event_type, d.day, h.hod,
             CAST(coalesce(o.x, 0) AS BIGINT) AS x
      FROM ty t
      CROSS JOIN (SELECT unnest(generate_series(lo, hi)) AS day FROM b) d
      CROSS JOIN (SELECT unnest(generate_series(0, 23)) AS hod) h
      LEFT JOIN obs o ON o.event_type = t.event_type
        AND o.day = d.day AND o.hod = h.hod),
    hodagg AS (
      SELECT event_type, hod,
             CAST(count(*) AS BIGINT) AS nd,
             CAST(sum(x) AS BIGINT) AS s,
             CAST(round(sum(CAST(x AS DOUBLE) * x)) AS BIGINT) AS ss
      FROM grid GROUP BY 1, 2),
    tyagg AS (
      SELECT event_type,
             CAST(sum(nd) AS BIGINT) AS n,
             CAST(sum(s) AS BIGINT) AS st,
             CAST(sum(ss) AS BIGINT) AS sst,
             CAST(round(sum(CAST(s AS DOUBLE) * s)) AS BIGINT) AS s2t
      FROM hodagg GROUP BY 1)
    SELECT h.event_type, h.hod, h.nd AS n_days,
           CAST((1000 * h.s) // h.nd AS BIGINT) AS mean_milli,
           CAST((1000 * t.st) // t.n AS BIGINT) AS grand_milli,
           CAST(CASE WHEN CAST(t.n AS DOUBLE) * t.sst
                  - CAST(t.st AS DOUBLE) * t.st > 0 THEN
             round(1000000.0 * (24.0 * t.s2t - CAST(t.st AS DOUBLE) * t.st)
               / (CAST(t.n AS DOUBLE) * t.sst
                  - CAST(t.st AS DOUBLE) * t.st))
             ELSE 0 END AS BIGINT) AS eta2_micro
    FROM hodagg h JOIN tyagg t USING (event_type)
    ORDER BY h.event_type, h.hod
    """,
    doc="HOUR-OF-DAY SEASONALITY — the 24-slot diurnal profile per "
    "event type plus the one-way-ANOVA seasonality strength eta^2 "
    "= SS_between/SS_total (the 'how much of the variance is just "
    "time-of-day?' number that q241's lag-24 ACF hints at and "
    "q255's burstiness confounds; a forecaster subtracts THIS "
    "profile before hunting real anomalies): cells are the "
    "zero-filled (day x hour-of-day) calendar grid, so every hod "
    "stratum holds exactly n_days cells and the balanced-design "
    "identity turns eta^2 into a PURE INT64 cross-multiplied "
    "ratio (24*sum s_hod^2 - S^2) / (N*SS - S^2) — ONE quantized "
    "double division per type, zero intermediate float. Profile "
    "means are floor-milli (non-negative, so Spark div and DuckDB "
    "// agree). Scale: the scan folds map-side onto the calendar "
    "grid (clock-bounded); both aggs run on bounded relations; "
    "output is |types| x 24 rows.",
    tags=("timeseries", "stats", "seasonality", "anova", "scale"),
)
def q269_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = t(spark, sf_dir, "events").select(
        "event_type",
        F.expr(f"div(unix_micros(cast(ts AS timestamp)), {_DAY_US})")
        .alias("day"),
        F.expr(
            f"div(unix_micros(cast(ts AS timestamp)), {_HOUR_US}) % 24"
        ).alias("hod"),
    )
    obs = e.groupBy("event_type", "day", "hod").agg(
        F.count(F.lit(1)).cast("long").alias("x")
    )
    b = obs.agg(F.min("day").alias("lo"), F.max("day").alias("hi"))
    grid = (
        obs.select("event_type")
        .distinct()
        .crossJoin(F.broadcast(b))
        .select("event_type", F.explode(F.sequence("lo", "hi")).alias("day"))
        .crossJoin(
            F.broadcast(
                obs.sparkSession.range(24).select(F.col("id").alias("hod"))
            )
        )
        .join(obs, ["event_type", "day", "hod"], "left")
        .select(
            "event_type",
            "day",
            "hod",
            F.coalesce("x", F.lit(0)).cast("long").alias("x"),
        )
    )
    hodagg = grid.groupBy("event_type", "hod").agg(
        F.count(F.lit(1)).cast("long").alias("nd"),
        F.sum("x").cast("long").alias("s"),
        # squared calendar-cell counts in DOUBLE + round-before-cast
        # (the q255/q289 overflow rule: x ~ N/cells, x^2 wraps int64)
        F.round(F.sum(F.col("x").cast("double") * F.col("x")))
        .cast("long")
        .alias("ss"),
    )
    hodagg = hodagg.localCheckpoint(eager=False)
    tyagg = hodagg.groupBy("event_type").agg(
        F.sum("nd").cast("long").alias("n"),
        F.sum("s").cast("long").alias("st"),
        F.sum("ss").cast("long").alias("sst"),
        F.round(F.sum(F.col("s").cast("double") * F.col("s")))
        .cast("long")
        .alias("s2t"),
    )
    return (
        hodagg.join(F.broadcast(tyagg), "event_type")
        .select(
            "event_type",
            "hod",
            F.col("nd").alias("n_days"),
            F.expr("CAST(div(1000 * s, nd) AS BIGINT)").alias("mean_milli"),
            F.expr("CAST(div(1000 * st, n) AS BIGINT)").alias("grand_milli"),
            F.expr(
                "CAST(CASE WHEN CAST(n AS DOUBLE) * sst"
                " - CAST(st AS DOUBLE) * st > 0 THEN"
                " round(1000000.0 * (24.0 * s2t"
                " - CAST(st AS DOUBLE) * st)"
                " / (CAST(n AS DOUBLE) * sst - CAST(st AS DOUBLE) * st))"
                " ELSE 0 END AS BIGINT)"
            ).alias("eta2_micro"),
        )
        .orderBy("event_type", "hod")
    )


# --- q288: segmented associative Holt linear-trend smoothing -----------------
#
# Per event, Holt's level/trend update with dyadic alpha=0.25, beta=0.5:
#   l' = 0.25 x + 0.75 l + 0.75 b
#   b' = 0.125 x - 0.125 l + 0.875 b
# i.e. state (l, b) maps through the CONSTANT matrix
#   A = [[0.75, 0.75], [-0.125, 0.875]]   c = (0.25 x, 0.125 x)
# Affine maps compose associatively, so the q208 segmentation carries
# over verbatim with a 2x2-matrix state instead of a scalar: per
# (user, 2-day chunk) fold the sorted events, per user compose the
# bounded chunk-map list, apply to s0 = (first value, 0) — which the
# first event's own map fixes exactly (0.25x+0.75x = x, 0.125x-0.125x
# = 0), the same seed trick q208 uses.


@register(
    "q288_holt_segmented",
    # Oracle gotcha (probed on DuckDB 1.x): inside a list_reduce lambda,
    # struct_pack(a11 := ..., a21 := ... acc.a11 ...) resolves acc.a11 in
    # LATER assignments to the ALREADY-ASSIGNED new a11 (sequential alias
    # shadowing) — q208's scalar fold never trips this because its second
    # field only reads acc.b. The accumulator is therefore a 6-element
    # LIST [a11, a12, a21, a22, b1, b2] (1-based), which has no named
    # assignments to shadow.
    oracle=f"""
    WITH ev AS (
      SELECT user_id, epoch_us(ts) AS us, event_id, value,
             epoch_us(ts) // {_SEG_W} AS chunk
      FROM events),
    ck AS (
      SELECT user_id, chunk, count(*) AS cn,
             list_reduce(
               list_prepend([1.0::DOUBLE, 0.0, 0.0, 1.0, 0.0, 0.0],
                 list([0.75::DOUBLE, 0.75, -0.125, 0.875,
                       0.25 * value, 0.125 * value]
                      ORDER BY us, event_id)),
               (acc, m) -> [m[1] * acc[1] + m[2] * acc[3],
                            m[1] * acc[2] + m[2] * acc[4],
                            m[3] * acc[1] + m[4] * acc[3],
                            m[3] * acc[2] + m[4] * acc[4],
                            m[1] * acc[5] + m[2] * acc[6] + m[5],
                            m[3] * acc[5] + m[4] * acc[6] + m[6]]) AS m
      FROM ev GROUP BY 1, 2),
    u AS (
      SELECT user_id,
             CAST(sum(cn) AS BIGINT) AS n_events,
             CAST(count(*) AS BIGINT) AS n_chunks,
             list_reduce(
               list_prepend([1.0::DOUBLE, 0.0, 0.0, 1.0, 0.0, 0.0],
                 list(m ORDER BY chunk)),
               (acc, c) -> [c[1] * acc[1] + c[2] * acc[3],
                            c[1] * acc[2] + c[2] * acc[4],
                            c[3] * acc[1] + c[4] * acc[3],
                            c[3] * acc[2] + c[4] * acc[4],
                            c[1] * acc[5] + c[2] * acc[6] + c[5],
                            c[3] * acc[5] + c[4] * acc[6] + c[6]]) AS t
      FROM ck GROUP BY 1),
    s0 AS (
      SELECT user_id, first(value ORDER BY us, event_id) AS v0
      FROM ev GROUP BY 1)
    SELECT u.user_id, u.n_events, u.n_chunks,
           round(u.t[1] * s0.v0 + u.t[5], 6) AS level,
           round(u.t[3] * s0.v0 + u.t[6], 6) AS trend,
           round((u.t[1] * s0.v0 + u.t[5])
                 + 3.0 * (u.t[3] * s0.v0 + u.t[6]), 6) AS forecast3
    FROM u JOIN s0 USING (user_id)
    """,
    doc="SEGMENTED ASSOCIATIVE HOLT smoothing — the trend-aware "
    "generalization of q208's EWMA (a plain EWMA lags a drifting "
    "series forever; Holt's level+trend pair tracks it and yields "
    "an h-step forecast): per event the (level, trend) state maps "
    "through a CONSTANT 2x2 matrix plus an x-dependent offset with "
    "dyadic alpha=0.25, beta=0.5, and affine maps compose "
    "associatively, so the q208 skew escape carries over verbatim — "
    "per (user, 2-day chunk) fold, bounded per-user chunk-map "
    "composition, apply to s0 = (first value, 0), which the first "
    "event's own map fixes exactly. No agg buffer ever holds more "
    "than one chunk of one user. Exactness: every coefficient is a "
    "dyadic binary fraction, the oracle replays the IDENTICAL "
    "chunked association (same fold order, same left-assoc "
    "three-term sums), and the output rounds to 6dp on identical "
    "doubles. Output: per-user level, trend, and the 3-step-ahead "
    "forecast l + 3b. Scale: same shape as q208 — the skew-probed "
    "segmented fold; a 10^8-event user costs max-events-per-chunk "
    "buffer, never their whole history.",
    tags=("timeseries", "holt", "trend", "segmented", "agg", "skew",
          "scale"),
)
def q288_holt_segmented(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events").select(
        "user_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
        "event_id",
        "value",
    )
    ev = ev.withColumn("chunk", F.expr(f"div(us, {_SEG_W})"))
    ident = F.struct(
        F.lit(1.0).alias("a11"), F.lit(0.0).alias("a12"),
        F.lit(0.0).alias("a21"), F.lit(1.0).alias("a22"),
        F.lit(0.0).alias("b1"), F.lit(0.0).alias("b2"),
    )

    def compose(acc, m):
        return F.struct(
            (m["a11"] * acc["a11"] + m["a12"] * acc["a21"]).alias("a11"),
            (m["a11"] * acc["a12"] + m["a12"] * acc["a22"]).alias("a12"),
            (m["a21"] * acc["a11"] + m["a22"] * acc["a21"]).alias("a21"),
            (m["a21"] * acc["a12"] + m["a22"] * acc["a22"]).alias("a22"),
            (m["a11"] * acc["b1"] + m["a12"] * acc["b2"] + m["b1"]).alias("b1"),
            (m["a21"] * acc["b1"] + m["a22"] * acc["b2"] + m["b2"]).alias("b2"),
        )

    def event_map(e):
        return F.struct(
            F.lit(0.75).alias("a11"), F.lit(0.75).alias("a12"),
            F.lit(-0.125).alias("a21"), F.lit(0.875).alias("a22"),
            (F.lit(0.25) * e["value"]).alias("b1"),
            (F.lit(0.125) * e["value"]).alias("b2"),
        )

    per_chunk = (
        ev.groupBy("user_id", "chunk")
        .agg(
            F.count("*").alias("cn"),
            F.array_sort(
                F.collect_list(F.struct("us", "event_id", "value"))
            ).alias("s"),
        )
        .select(
            "user_id",
            "chunk",
            "cn",
            F.aggregate(
                F.transform("s", event_map), ident, compose
            ).alias("m"),
            F.element_at(F.col("s"), 1).alias("first_e"),
        )
    )
    per_user = per_chunk.groupBy("user_id").agg(
        F.sum("cn").cast("long").alias("n_events"),
        F.count("*").cast("long").alias("n_chunks"),
        F.array_sort(F.collect_list(F.struct("chunk", "m"))).alias("maps"),
        F.min(F.struct("chunk", "first_e")).alias("f0"),
    )
    comp = F.aggregate(
        F.transform("maps", lambda c: c["m"]), ident, compose
    )
    v0 = F.col("f0")["first_e"]["value"]
    level = comp["a11"] * v0 + comp["b1"]
    trend = comp["a21"] * v0 + comp["b2"]
    return per_user.select(
        "user_id",
        "n_events",
        "n_chunks",
        F.round(level, 6).alias("level"),
        F.round(trend, 6).alias("trend"),
        F.round(level + F.lit(3.0) * trend, 6).alias("forecast3"),
    )


# --- q291: Mann-Kendall trend test -------------------------------------------


@register(
    "q291_mann_kendall",
    oracle=f"""
    WITH obs AS (
      SELECT event_type, epoch_us(ts) // {_HOUR_US} AS hr,
             CAST(count(*) AS BIGINT) AS x
      FROM events GROUP BY 1, 2),
    b AS (SELECT min(hr) AS lo, max(hr) AS hi FROM obs),
    ty AS (SELECT DISTINCT event_type FROM obs),
    grid AS (
      SELECT t.event_type, g.hr - b.lo AS h,
             CAST(coalesce(o.x, 0) AS BIGINT) AS x
      FROM ty t
      CROSS JOIN b
      CROSS JOIN (SELECT unnest(generate_series(lo, hi)) AS hr FROM b) g
      LEFT JOIN obs o
        ON o.event_type = t.event_type AND o.hr = g.hr),
    s AS (
      SELECT a.event_type,
             CAST(sum(CASE WHEN b2.x > a.x THEN 1
                           WHEN b2.x < a.x THEN -1 ELSE 0 END)
                  AS BIGINT) AS s
      FROM grid a
      JOIN grid b2
        ON b2.event_type = a.event_type AND b2.h > a.h
      GROUP BY 1),
    nn AS (
      SELECT event_type, CAST(count(*) AS BIGINT) AS n
      FROM grid GROUP BY 1),
    ties AS (
      SELECT event_type,
             CAST(coalesce(sum(t_ * (t_ - 1) * (2 * t_ + 5)), 0)
                  AS BIGINT) AS tie_term
      FROM (SELECT event_type, x, CAST(count(*) AS BIGINT) AS t_
            FROM grid GROUP BY 1, 2)
      WHERE t_ > 1 GROUP BY 1),
    v AS (
      SELECT nn.event_type, nn.n, s.s,
             CAST(nn.n * (nn.n - 1) * (2 * nn.n + 5)
                  - coalesce(ties.tie_term, 0) AS BIGINT) AS var18
      FROM nn JOIN s USING (event_type)
      LEFT JOIN ties USING (event_type))
    SELECT event_type, n, s, var18,
           CAST(CASE WHEN var18 > 0 AND s > 0 THEN
                  round(1000.0 * (s - 1)
                        / sqrt(CAST(var18 AS DOUBLE) / 18.0))
                WHEN var18 > 0 AND s < 0 THEN
                  round(1000.0 * (s + 1)
                        / sqrt(CAST(var18 AS DOUBLE) / 18.0))
                ELSE 0 END AS BIGINT) AS z_milli
    FROM v
    ORDER BY event_type
    """,
    doc="MANN-KENDALL trend test per event-type hourly series — the "
    "nonparametric IS-there-a-trend significance test that pairs "
    "with q268's Theil-Sen (which estimates HOW STEEP; MK says "
    "whether to believe it): S = sum of pairwise sign(x_j - x_i) "
    "over the same CLOCK-BOUNDED zero-filled hourly grid, variance "
    "with the tie correction (zero-filled idle hours tie heavily — "
    "skipping the correction overstates significance), and the "
    "continuity-corrected z = (S -/+ 1)/sqrt(Var). Exactness: S, n, "
    "and 18*Var are exact int64 from sign sums and tie-group "
    "counts; z is one sqrt + one division on those, rounded to "
    "milli; S = 0 or degenerate variance returns 0. Scale: the "
    "pair space is hours-squared — bounded by the CLOCK, not by "
    "event volume (the q268 argument); everything else is grouped "
    "aggs on the grid.",
    tags=("timeseries", "trend", "mann-kendall", "scale"),
)
def q291_mann_kendall(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = t(spark, sf_dir, "events").select(
        "event_type",
        F.expr(f"div(unix_micros(cast(ts AS timestamp)), {_HOUR_US})")
        .alias("hr"),
    )
    obs = e.groupBy("event_type", "hr").agg(
        F.count(F.lit(1)).cast("long").alias("x")
    )
    b = obs.agg(F.min("hr").alias("lo"), F.max("hr").alias("hi"))
    grid = (
        obs.select("event_type")
        .distinct()
        .crossJoin(F.broadcast(b))
        .select(
            "event_type",
            "lo",
            F.explode(F.sequence("lo", "hi")).alias("hr"),
        )
        .join(obs, ["event_type", "hr"], "left")
        .select(
            "event_type",
            (F.col("hr") - F.col("lo")).alias("h"),
            F.coalesce("x", F.lit(0)).cast("long").alias("x"),
        )
        .localCheckpoint(eager=False)
    )
    a = grid.select("event_type", F.col("h").alias("ha"),
                    F.col("x").alias("xa"))
    b2 = grid.select("event_type", F.col("h").alias("hb"),
                     F.col("x").alias("xb"))
    s = (
        a.join(b2, ["event_type"])
        .where(F.col("hb") > F.col("ha"))
        .groupBy("event_type")
        .agg(
            F.sum(
                F.when(F.col("xb") > F.col("xa"), 1)
                .when(F.col("xb") < F.col("xa"), -1)
                .otherwise(0)
            )
            .cast("long")
            .alias("s")
        )
    )
    nn = grid.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    ties = (
        grid.groupBy("event_type", "x")
        .agg(F.count(F.lit(1)).cast("long").alias("t_"))
        .where(F.col("t_") > 1)
        .groupBy("event_type")
        .agg(
            F.coalesce(
                F.sum(
                    F.col("t_") * (F.col("t_") - 1) * (2 * F.col("t_") + 5)
                ),
                F.lit(0),
            )
            .cast("long")
            .alias("tie_term")
        )
    )
    v = (
        nn.join(s, "event_type")
        .join(ties, "event_type", "left")
        .select(
            "event_type",
            "n",
            "s",
            F.expr(
                "CAST(n * (n - 1) * (2 * n + 5)"
                " - coalesce(tie_term, 0) AS BIGINT)"
            ).alias("var18"),
        )
    )
    return v.select(
        "event_type",
        "n",
        "s",
        "var18",
        F.expr(
            "CAST(CASE WHEN var18 > 0 AND s > 0 THEN"
            " round(1000.0 * (s - 1)"
            " / sqrt(CAST(var18 AS DOUBLE) / 18.0))"
            " WHEN var18 > 0 AND s < 0 THEN"
            " round(1000.0 * (s + 1)"
            " / sqrt(CAST(var18 AS DOUBLE) / 18.0))"
            " ELSE 0 END AS BIGINT)"
        ).alias("z_milli"),
    ).orderBy("event_type")


# --- q297: time-decayed feature aggregates ------------------------------------

_DECAY_HL_US = 86_400_000_000  # 24h half-life in epoch-micros


@register(
    "q297_time_decayed_features",
    oracle=f"""
    WITH ev AS (
      SELECT user_id, epoch_us(ts) AS us, value FROM events),
    ref AS (SELECT max(us) AS t FROM ev),
    w AS (
      SELECT user_id,
             CAST(round(1000000.0
               * exp(-0.6931471805599453 * (CAST(t - us AS DOUBLE)
                     / {_DECAY_HL_US}))) AS BIGINT) AS w_micro,
             CAST(round(1000000.0
               * (exp(-0.6931471805599453 * (CAST(t - us AS DOUBLE)
                      / {_DECAY_HL_US})) * value)) AS BIGINT) AS wv_micro
      FROM ev CROSS JOIN ref)
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(w_micro) AS BIGINT) AS decayed_count_micro,
           CAST(sum(wv_micro) AS BIGINT) AS decayed_value_micro
    FROM w
    GROUP BY user_id
    ORDER BY user_id
    """,
    doc="TIME-DECAYED feature aggregates — the feature-store staple "
    "(recency-weighted activity at a reference instant, 24h "
    "half-life): unlike q194/q208's EVENT-indexed EWMA, the decay "
    "here is WALL-CLOCK anchored (exp(-ln2 * age / halflife) at the "
    "corpus max timestamp), so two users with identical event "
    "sequences but different timing get different features — the "
    "churn/recency signal batch counts can't express. Exactness: "
    "ages are exact int64 micros; each event's weight and "
    "weighted-value are quantized to micro int64 BEFORE the "
    "user-level sums (one exp per event on identical int64 inputs — "
    "both engines evaluate the same IEEE chain; ln 2 is embedded as "
    "the same 17-digit literal); sums are exact. Scale: one scan, "
    "one broadcast scalar (the reference time), one user-keyed "
    "map-side-combinable agg — no window, no state.",
    tags=("timeseries", "decay", "features", "scale"),
)
def q297_time_decayed_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events").select(
        "user_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
        "value",
    )
    ref = ev.agg(F.max("us").alias("t"))
    w = ev.crossJoin(F.broadcast(ref)).select(
        "user_id",
        F.expr(
            f"CAST(round(1000000.0"
            f" * exp(-0.6931471805599453 * (CAST(t - us AS DOUBLE)"
            f" / {_DECAY_HL_US}))) AS BIGINT)"
        ).alias("w_micro"),
        F.expr(
            f"CAST(round(1000000.0"
            f" * (exp(-0.6931471805599453 * (CAST(t - us AS DOUBLE)"
            f" / {_DECAY_HL_US})) * value)) AS BIGINT)"
        ).alias("wv_micro"),
    )
    return (
        w.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum("w_micro").cast("long").alias("decayed_count_micro"),
            F.sum("wv_micro").cast("long").alias("decayed_value_micro"),
        )
        .orderBy("user_id")
    )


# --- q301: trailing 7-day distinct users --------------------------------------

_DAY_US = 86_400_000_000


@register(
    "q301_trailing_distinct_users",
    oracle=f"""
    WITH du AS (
      SELECT DISTINCT epoch_us(ts) // {_DAY_US} AS day, user_id
      FROM events),
    b AS (SELECT min(day) AS lo, max(day) AS hi FROM du),
    contrib AS (
      SELECT DISTINCT du.day + j.j AS day, du.user_id
      FROM du CROSS JOIN (SELECT unnest(generate_series(0, 6)) AS j) j
      CROSS JOIN b
      WHERE du.day + j.j <= b.hi),
    daily AS (
      SELECT day, CAST(count(*) AS BIGINT) AS wau7
      FROM contrib GROUP BY day),
    grid AS (
      SELECT g.day FROM b,
           LATERAL unnest(generate_series(b.lo, b.hi)) AS g(day))
    SELECT grid.day - b.lo AS day_index,
           CAST(coalesce(daily.wau7, 0) AS BIGINT) AS wau7
    FROM grid CROSS JOIN b LEFT JOIN daily ON daily.day = grid.day
    ORDER BY day_index
    """,
    doc="TRAILING 7-DAY DISTINCT USERS per day (the WAU curve) — the "
    "canonical sliding-window DISTINCT, which no window function "
    "computes (count(distinct) over a RANGE frame re-scans the frame "
    "per row): each (day, user) first-class pair CONTRIBUTES ITSELF "
    "to the 7 trailing windows it falls in (a bounded explode of "
    "exactly 7), and a second distinct + count per target day "
    "finishes the job — two dedup aggs and one 7-way fan-out, "
    "never a per-day rescan. Exactness: pure int64 day arithmetic "
    "and counts (div truncation consistent on both engines for the "
    "positive epoch range, the q208 probe). Days with no activity "
    "in their trailing week report 0 via the clock-bounded grid. "
    "Scale: the fan-out is a fixed x7 on the ALREADY-DEDUPED "
    "(day, user) relation (<< raw events); both dedups are "
    "map-side-combinable hash aggs keyed by (day, user); the grid "
    "is clock-bounded.",
    tags=("timeseries", "distinct", "sliding-window", "wau", "scale"),
)
def q301_trailing_distinct_users(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    du = (
        t(spark, sf_dir, "events")
        .select(
            F.expr(
                f"div(unix_micros(cast(ts AS timestamp)), {_DAY_US})"
            ).alias("day"),
            "user_id",
        )
        .distinct()
        .localCheckpoint(eager=False)
    )
    b = du.agg(F.min("day").alias("lo"), F.max("day").alias("hi"))
    contrib = (
        du.select(
            F.explode(F.expr("sequence(day, day + 6)")).alias("day"),
            "user_id",
        )
        .crossJoin(F.broadcast(b))
        .where(F.col("day") <= F.col("hi"))
        .select("day", "user_id", "lo")
        .distinct()
    )
    daily = contrib.groupBy("day", "lo").agg(
        F.count(F.lit(1)).cast("long").alias("wau7")
    )
    grid = b.select(
        "lo", F.explode(F.sequence("lo", "hi")).alias("day")
    )
    return (
        grid.join(daily, ["day", "lo"], "left")
        .select(
            (F.col("day") - F.col("lo")).alias("day_index"),
            F.coalesce("wau7", F.lit(0)).cast("long").alias("wau7"),
        )
        .orderBy("day_index")
    )
