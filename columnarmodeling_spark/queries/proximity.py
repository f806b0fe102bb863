"""Flagship join queries: binned proximity (gap) join, bond typing,
as-of join (SURVEY §2.3 J1, §2.4 A9).

The proximity join regenerates the reference's bond-list construction
(``MLSBond.dat``: pairs with gap < dGap found via CellSize grid hashing,
``SysFile.ini:45-55``) on testdata points; the oracle is the naive theta
self-join, which DuckDB can afford at sf0.01 — the Spark side must
produce the *identical* pair set from the binned plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from columnarmodeling_spark.operators.asof import asof_join
from columnarmodeling_spark.operators.proximity import grid_proximity_join
from columnarmodeling_spark.queries import register
from columnarmodeling_spark.queries._util import t

# Point cloud derived deterministically from customer: x spreads over
# acctbal (range ~11k), y over a 97-residue lattice scaled by 25.
_POINTS_SQL = """
    SELECT c_custkey AS id, c_acctbal AS x,
           CAST(c_custkey % 97 AS DOUBLE) * 25.0 AS y,
           c_nationkey AS grain
    FROM customer
"""

_EPS = 30.0


def _points(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = t(spark, sf_dir, "customer")
    return c.select(
        F.col("c_custkey").alias("id"),
        F.col("c_acctbal").alias("x"),
        ((F.col("c_custkey") % 97).cast("double") * 25.0).alias("y"),
        F.col("c_nationkey").alias("grain"),
    )


@register(
    "q30_proximity_pairs",
    oracle=f"""
    WITH pts AS ({_POINTS_SQL})
    SELECT a.id AS src, b.id AS dst,
           round(sqrt((a.x-b.x)*(a.x-b.x) + (a.y-b.y)*(a.y-b.y)), 6) AS dist
    FROM pts a JOIN pts b
      ON a.id < b.id
     AND sqrt((a.x-b.x)*(a.x-b.x) + (a.y-b.y)*(a.y-b.y)) < {_EPS}
    """,
    doc="Binned proximity join (SURVEY §2.3 J1: dGap bond linking via "
    "CellSize grid hashing, SysFile.ini:45-55 → MLSBond.dat). Spark "
    "side uses the grid-explode equi-join; oracle is the naive theta "
    "join — identical pair sets required.",
    tags=("join", "proximity", "J1", "flagship"),
)
def q30_proximity_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    pairs = grid_proximity_join(_points(spark, sf_dir), eps=_EPS, id_col="id")
    return pairs.select("src", "dst", F.round("dist", 6).alias("dist"))


@register(
    "q31_bond_type_histogram",
    oracle=f"""
    WITH pts AS ({_POINTS_SQL})
    SELECT CASE WHEN a.grain = b.grain THEN 1 ELSE 10 END AS bond_type,
           count(*) AS n_bonds,
           round(avg(sqrt((a.x-b.x)*(a.x-b.x) + (a.y-b.y)*(a.y-b.y))), 6)
               AS avg_len
    FROM pts a JOIN pts b
      ON a.id < b.id
     AND sqrt((a.x-b.x)*(a.x-b.x) + (a.y-b.y)*(a.y-b.y)) < {_EPS}
    GROUP BY 1
    """,
    doc="Bond typing + histogram (SURVEY §2.4 A9: MLSBond.dat type 1 = "
    "intra-grain vs type 10 = joint bonds, verified 3142/10670 split). "
    "Type 1 when both endpoints share a grain id.",
    tags=("join", "proximity", "agg", "A9", "J1"),
)
def q31_bond_type_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    pairs = grid_proximity_join(
        _points(spark, sf_dir), eps=_EPS, id_col="id", keep_cols=("grain",)
    )
    return (
        pairs.withColumn(
            "bond_type",
            F.when(F.col("grain_src") == F.col("grain_dst"), 1).otherwise(10),
        )
        .groupBy("bond_type")
        .agg(
            F.count("*").alias("n_bonds"),
            F.round(F.avg("dist"), 6).alias("avg_len"),
        )
    )


@register(
    "q32_asof_join",
    oracle="""
    WITH last AS (
        SELECT e.event_id AS eid, max(o.o_orderdate) AS asof_ts
        FROM events e JOIN orders o
          ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts
        GROUP BY e.event_id)
    SELECT e.event_id, l.asof_ts, max(o.o_orderkey) AS o_orderkey
    FROM events e
    JOIN last l ON e.event_id = l.eid
    JOIN orders o ON o.o_custkey = e.user_id AND o.o_orderdate = l.asof_ts
    GROUP BY e.event_id, l.asof_ts
    """,
    doc="As-of join (SURVEY §2.8: load-curve evaluation — most recent "
    "curve point at-or-before each solver step, SysFile.ini:94): for "
    "each event, the latest order at-or-before its timestamp. "
    "Implemented as union-tag + single window pass per key "
    "(operators/asof.py), no theta join.",
    tags=("join", "asof", "window", "scale"),
)
def q32_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    orders = t(spark, sf_dir, "orders").withColumn("user_id", F.col("o_custkey"))
    return asof_join(
        left=orders,
        right=ev,
        key="user_id",
        left_ts="o_orderdate",
        right_ts="ts",
        left_val_cols=("o_orderkey",),
        right_id_cols=("event_id",),
        tie_break="o_orderkey",
    ).select("event_id", "asof_ts", "o_orderkey")


@register(
    "q128_triangle_count",
    oracle=f"""
    WITH pts AS ({_POINTS_SQL}),
    e AS MATERIALIZED (
      SELECT a.id AS src, b.id AS dst
      FROM pts a JOIN pts b
        ON a.id < b.id
       AND sqrt((a.x-b.x)*(a.x-b.x) + (a.y-b.y)*(a.y-b.y)) < {_EPS}),
    tri AS (
      SELECT e1.src AS a, e1.dst AS b, e2.dst AS c
      FROM e e1
      JOIN e e2 ON e2.src = e1.dst
      JOIN e e3 ON e3.src = e1.src AND e3.dst = e2.dst),
    tn AS (
      SELECT id, count(*) AS n_tri FROM (
        SELECT a AS id FROM tri
        UNION ALL SELECT b FROM tri
        UNION ALL SELECT c FROM tri)
      GROUP BY id),
    deg AS (
      SELECT id, count(*) AS degree FROM (
        SELECT src AS id FROM e UNION ALL SELECT dst AS id FROM e)
      GROUP BY id)
    SELECT d.id, CAST(d.degree AS BIGINT) AS degree,
           CAST(coalesce(t.n_tri, 0) AS BIGINT) AS n_triangles,
           CASE WHEN d.degree < 2 THEN 0.0
                ELSE round(2.0 * coalesce(t.n_tri, 0)
                           / (d.degree * (d.degree - 1)), 6)
           END AS clustering
    FROM deg d LEFT JOIN tn t USING (id)
    """,
    doc="Per-node triangle count + clustering coefficient on the bond "
    "graph (the q30 proximity pairs — triangles are the closed "
    "coordination loops of the bond network the reference's MLSBond "
    "edge list encodes). The Spark side is the DEGREE-ORIENTED "
    "algorithm (Cohen 2009 / Suri-Vassilvitskii 2011): each edge is "
    "directed from its (degree, id)-smaller endpoint to the larger, "
    "wedges enumerate ordered out-neighbor pairs, and the closing "
    "edge probe is one more equi-join — O(m^1.5) wedge volume, "
    "skew-proof (a degree-d hub contributes wedges only as the "
    "SMALLER endpoint, bounding per-node fan-out by sqrt(m)), versus "
    "the oracle's naive 3-way id-ordered join which a 100 TB hub "
    "would detonate. Identical triangle sets, exact integer counts; "
    "the clustering ratio is the one rounded column.",
    tags=("graph", "join", "triangle", "scale", "J1"),
)
def q128_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    edges = (
        grid_proximity_join(_points(spark, sf_dir), eps=_EPS, id_col="id")
        .select("src", "dst")
        .localCheckpoint(eager=False)
    )
    und = edges.unionByName(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    deg = und.groupBy(F.col("src").alias("id")).agg(
        F.count("*").alias("degree")
    )
    # orient every edge from the (degree, id)-smaller endpoint to the
    # larger; carry the head endpoint's order key for the wedge sort
    dg = lambda side: deg.select(  # noqa: E731
        F.col("id").alias(side), F.col("degree").alias(f"deg_{side}")
    )
    ed = edges.join(dg("src"), "src").join(dg("dst"), "dst")
    fwd = F.struct("deg_src", "src") < F.struct("deg_dst", "dst")
    oriented = ed.select(
        F.when(fwd, F.col("src")).otherwise(F.col("dst")).alias("u"),
        F.when(fwd, F.col("dst")).otherwise(F.col("src")).alias("v"),
        F.when(
            fwd,
            F.struct(
                F.col("deg_dst").alias("d"), F.col("dst").alias("i")
            ),
        )
        .otherwise(
            F.struct(F.col("deg_src").alias("d"), F.col("src").alias("i"))
        )
        .alias("vkey"),
    ).localCheckpoint(eager=False)
    o1 = oriented.select("u", F.col("v").alias("b"), F.col("vkey").alias("bk"))
    o2 = oriented.select("u", F.col("v").alias("c"), F.col("vkey").alias("ck"))
    wedges = o1.join(o2, "u").filter(F.col("bk") < F.col("ck")).select(
        "u", "b", "c"
    )
    closing = oriented.select(F.col("u").alias("b"), F.col("v").alias("c"))
    tri = wedges.join(closing, ["b", "c"])
    tn = (
        tri.select(F.explode(F.array("u", "b", "c")).alias("id"))
        .groupBy("id")
        .agg(F.count("*").alias("n_tri"))
    )
    nt = F.coalesce("n_tri", F.lit(0))
    return deg.join(tn, "id", "left").select(
        "id",
        F.col("degree").cast("long").alias("degree"),
        nt.cast("long").alias("n_triangles"),
        F.when(F.col("degree") < 2, F.lit(0.0))
        .otherwise(
            F.round(
                2.0 * nt / (F.col("degree") * (F.col("degree") - 1)), 6
            )
        )
        .alias("clustering"),
    )


_PR_ITERS = 3
_PR_UNIT = 1_000_000  # micro-units: all PageRank arithmetic is integer


def _pr_oracle() -> str:
    """Unroll the integer PageRank iterations as CTEs: share(u) =
    pr(u) // deg(u); pr'(v) = 0.15 + 0.85 * inflow, all in micro-units
    with integer division — deterministic and summation-order-free on
    both engines."""
    ctes = [
        f"""pts AS ({_POINTS_SQL}),
    e AS MATERIALIZED (
      SELECT a.id AS src, b.id AS dst
      FROM pts a JOIN pts b
        ON a.id < b.id
       AND sqrt((a.x-b.x)*(a.x-b.x) + (a.y-b.y)*(a.y-b.y)) < {_EPS}),
    und AS MATERIALIZED (
      SELECT src, dst FROM e UNION ALL SELECT dst AS src, src AS dst FROM e),
    deg AS MATERIALIZED (
      SELECT src AS id, count(*) AS degree FROM und GROUP BY 1),
    pr0 AS (SELECT id, CAST({_PR_UNIT} AS BIGINT) AS pr FROM deg)"""
    ]
    for r in range(1, _PR_ITERS + 1):
        ctes.append(
            f"""sh{r} AS (
      SELECT u.dst AS id, p.pr // d.degree AS share
      FROM und u
      JOIN pr{r - 1} p ON p.id = u.src
      JOIN deg d ON d.id = u.src),
    pr{r} AS MATERIALIZED (
      SELECT id,
             150000 + (850000 * sum(share)) // {_PR_UNIT} AS pr
      FROM sh{r} GROUP BY id)"""
        )
    return (
        "WITH "
        + ",\n    ".join(ctes)
        + f"""
    SELECT d.id, CAST(d.degree AS BIGINT) AS degree,
           CAST(p.pr AS BIGINT) AS pr_micro
    FROM deg d JOIN pr{_PR_ITERS} p USING (id)"""
    )


@register(
    "q133_pagerank",
    oracle=_pr_oracle(),
    doc="Integer PageRank on the bond graph (3 iterations, damping "
    "0.85) — the iterative link-analysis member of the graph tier "
    "(q56 components, q128 triangles): per round, each node ships "
    "pr // degree to its neighbors (integer division in micro-units, "
    "so the sum is order-independent and both engines replay it "
    "bit-for-bit — the same cross-engine-exactness discipline as the "
    "solver's quantized replays) and collects 0.15 + 0.85 * inflow. "
    "Spark side is a driver loop: one equi-join (edges x ranks, "
    "co-partitioned on src across rounds) + one hash agg per "
    "iteration, localCheckpoint truncating lineage each round — the "
    "Lloyd/solver/q131 iteration pattern; rounds are data-independent "
    "in count (fixed 3), so the plan never grows with the graph. The "
    "oracle unrolls the identical rounds as CTEs.",
    tags=("graph", "pagerank", "iterative", "scale"),
)
def q133_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    edges = (
        grid_proximity_join(_points(spark, sf_dir), eps=_EPS, id_col="id")
        .select("src", "dst")
    )
    und = edges.unionByName(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).localCheckpoint(eager=False)
    deg = und.groupBy(F.col("src").alias("id")).agg(
        F.count("*").alias("degree")
    ).localCheckpoint(eager=False)
    pr = deg.select("id", F.lit(_PR_UNIT).cast("long").alias("pr"))
    src_deg = deg.select(
        F.col("id").alias("src"), F.col("degree").alias("src_deg")
    )
    for _ in range(_PR_ITERS):
        shares = (
            und.join(pr.withColumnRenamed("id", "src"), "src")
            .join(src_deg, "src")
            .select(
                F.col("dst").alias("id"),
                F.expr("div(pr, src_deg)").alias("share"),
            )
        )
        pr = (
            shares.groupBy("id")
            .agg(
                (
                    F.lit(150000)
                    + F.expr(f"div(850000 * sum(share), {_PR_UNIT})")
                ).alias("pr")
            )
            .localCheckpoint(eager=False)
        )
    return deg.join(pr, "id").select(
        "id",
        F.col("degree").cast("long").alias("degree"),
        F.col("pr").cast("long").alias("pr_micro"),
    )


_BFS_ROUNDS = 3
_BFS_INF = 999_999  # integer infinity: exact on both engines


def _bfs_oracle() -> str:
    """Unroll the min-plus BFS relaxations as CTEs — one LEFT JOIN +
    min-agg per round, identical to the Spark loop body."""
    ctes = [
        f"""pts AS ({_POINTS_SQL}),
    e AS MATERIALIZED (
      SELECT a.id AS src, b.id AS dst
      FROM pts a JOIN pts b
        ON a.id < b.id
       AND sqrt((a.x-b.x)*(a.x-b.x) + (a.y-b.y)*(a.y-b.y)) < {_EPS}),
    und AS MATERIALIZED (
      SELECT src, dst FROM e UNION ALL SELECT dst AS src, src AS dst FROM e),
    nodes AS MATERIALIZED (SELECT DISTINCT src AS id FROM und),
    d0 AS (
      SELECT id, CASE WHEN id % 50 = 0 THEN 0 ELSE {_BFS_INF} END AS d
      FROM nodes)"""
    ]
    for r in range(1, _BFS_ROUNDS + 1):
        ctes.append(
            f"""d{r} AS MATERIALIZED (
      SELECT a.id, least(a.d, coalesce(min(p.d + 1), {_BFS_INF})) AS d
      FROM d{r - 1} a
      LEFT JOIN und u ON u.dst = a.id
      LEFT JOIN d{r - 1} p ON p.id = u.src
      GROUP BY a.id, a.d)"""
        )
    return (
        "WITH "
        + ",\n    ".join(ctes)
        + f"""
    SELECT id, CAST(d AS BIGINT) AS hops FROM d{_BFS_ROUNDS}"""
    )


@register(
    "q137_bfs_hops",
    oracle=_bfs_oracle(),
    doc="Multi-source BFS hop distance on the bond graph (3 min-plus "
    "relaxation rounds from the id%50==0 seed set) — completes the "
    "graph tier's traversal family (q56 components, q128 triangles, "
    "q133 PageRank): per round every node takes the min of its own "
    "distance and neighbor distance + 1, all-integer with an "
    "explicit 999999 infinity so both engines replay it exactly. "
    "Spark side is a driver loop: ONE edge-ranks equi-join (keyed "
    "on src, co-partitioned across rounds) + one min hash-agg per "
    "round, localCheckpoint truncating lineage — the q133 iteration "
    "shape; rounds are a fixed hop budget, so the plan never grows "
    "with the graph, and unreached nodes stay at the integer "
    "infinity instead of NULL-propagating.",
    tags=("graph", "bfs", "iterative", "scale"),
)
def q137_bfs_hops(spark: SparkSession, sf_dir: str) -> DataFrame:
    edges = grid_proximity_join(
        _points(spark, sf_dir), eps=_EPS, id_col="id"
    ).select("src", "dst")
    und = edges.unionByName(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).localCheckpoint(eager=False)
    dist = (
        und.select(F.col("src").alias("id"))
        .distinct()
        .select(
            "id",
            F.when(F.col("id") % 50 == 0, F.lit(0))
            .otherwise(F.lit(_BFS_INF))
            .cast("long")
            .alias("d"),
        )
        .localCheckpoint(eager=False)
    )
    for _ in range(_BFS_ROUNDS):
        relaxed = (
            und.join(dist.withColumnRenamed("id", "src"), "src")
            .groupBy(F.col("dst").alias("id"))
            .agg(F.min(F.col("d") + 1).alias("nd"))
        )
        dist = (
            dist.join(relaxed, "id", "left")
            .select(
                "id",
                F.least(
                    F.col("d"), F.coalesce(F.col("nd"), F.lit(_BFS_INF))
                ).alias("d"),
            )
            .localCheckpoint(eager=False)
        )
    return dist.select("id", F.col("d").cast("long").alias("hops"))


_KCORE_K = 3
_KCORE_ROUNDS = 3
# denser graph than the q30/_EPS band: at _EPS=30 the bond graph's max
# degree is 3 (sf0.01), so any k >= 2 core is near-empty — the peel
# needs a regime where the cascade actually runs
_KCORE_EPS = 80.0


def _kcore_oracle() -> str:
    """Unroll the bounded k-core peel: per round, drop nodes with
    degree < k and keep only edges between survivors."""
    ctes = [
        f"""pts AS ({_POINTS_SQL}),
    e AS MATERIALIZED (
      SELECT a.id AS src, b.id AS dst
      FROM pts a JOIN pts b
        ON a.id < b.id
       AND sqrt((a.x-b.x)*(a.x-b.x) + (a.y-b.y)*(a.y-b.y)) < {_KCORE_EPS}),
    e0 AS MATERIALIZED (
      SELECT src, dst FROM e UNION ALL SELECT dst AS src, src AS dst FROM e)"""
    ]
    for r in range(1, _KCORE_ROUNDS + 1):
        p = r - 1
        ctes.append(
            f"""k{r} AS MATERIALIZED (
      SELECT src AS id FROM e{p} GROUP BY 1
      HAVING count(*) >= {_KCORE_K}),
    e{r} AS MATERIALIZED (
      SELECT e.src, e.dst
      FROM e{p} e JOIN k{r} a ON a.id = e.src JOIN k{r} b ON b.id = e.dst)"""
        )
    return (
        "WITH "
        + ",\n    ".join(ctes)
        + f"""
    SELECT src AS id, CAST(count(*) AS BIGINT) AS degree
    FROM e{_KCORE_ROUNDS} GROUP BY 1"""
    )


@register(
    "q141_kcore_peel",
    oracle=_kcore_oracle(),
    doc="Bounded k-core peel on the bond graph (3 rounds at k=3, on "
    "the eps=80 densified band — the default band's max degree is 3, "
    "so no interesting core exists there) — the "
    "degeneracy-ordering member of the graph tier (q56 components, "
    "q128 triangles, q133 PageRank, q137 BFS): per round, nodes with "
    "degree < k are removed and only survivor-survivor edges remain; "
    "peeling cascades (removing a node lowers its neighbors' degree), "
    "which is why the loop repeats — a fixed round budget like the "
    "BFS hop budget, documented as bounded rather than run to "
    "convergence. Spark side is a driver loop: one degree hash-agg + "
    "two left_semi joins per round (all keyed on the endpoint ids, "
    "co-partitioned across rounds), localCheckpoint truncating "
    "lineage. All-integer; the oracle unrolls the identical rounds.",
    tags=("graph", "kcore", "iterative", "scale"),
)
def q141_kcore_peel(spark: SparkSession, sf_dir: str) -> DataFrame:
    edges = grid_proximity_join(
        _points(spark, sf_dir), eps=_KCORE_EPS, id_col="id"
    ).select("src", "dst")
    und = edges.unionByName(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).localCheckpoint(eager=False)
    e = und
    for _ in range(_KCORE_ROUNDS):
        keep = (
            e.groupBy("src")
            .agg(F.count("*").alias("deg"))
            .filter(F.col("deg") >= _KCORE_K)
            .select(F.col("src").alias("id"))
        )
        e = (
            e.join(keep.withColumnRenamed("id", "src"), "src", "left_semi")
            .join(keep.withColumnRenamed("id", "dst"), "dst", "left_semi")
            .localCheckpoint(eager=False)
        )
    return e.groupBy(F.col("src").alias("id")).agg(
        F.count("*").cast("long").alias("degree")
    )


_IV_BUCKET = 32  # days per bucket; max interval length is 29 days, so
#                  every interval spans at most 2 buckets


@register(
    "q145_interval_join",
    oracle=f"""
    WITH iv AS (
      SELECT CAST(floor(epoch(l_shipdate)) AS BIGINT) // 86400 AS sd,
             CAST(floor(epoch(l_shipdate)) AS BIGINT) // 86400
               + 1 + (l_orderkey + l_linenumber) % 28 AS ed,
             CAST(round(l_quantity * 100) AS BIGINT) AS qc
      FROM lineitem),
    pts AS (
      SELECT o_orderkey,
             CAST(floor(epoch(o_orderdate)) AS BIGINT) // 86400 AS d
      FROM orders),
    j AS (
      SELECT p.o_orderkey, i.qc
      FROM pts p JOIN iv i ON p.d BETWEEN i.sd AND i.ed)
    SELECT p.o_orderkey,
           CAST(coalesce(a.n_cover, 0) AS BIGINT) AS n_cover,
           CAST(coalesce(a.qty_cents, 0) AS BIGINT) AS qty_cents
    FROM pts p LEFT JOIN (
      SELECT o_orderkey, count(*) AS n_cover, sum(qc) AS qty_cents
      FROM j GROUP BY 1) a USING (o_orderkey)
    """,
    doc="Big-big INTERVAL JOIN executed as a binned equi-join — the "
    "1-D temporal sibling of the J1 grid join (SURVEY §4: Catalyst "
    "would happily BroadcastNestedLoopJoin a naive BETWEEN predicate "
    "between two large relations; the engine must bin): shipment "
    "validity windows [shipdate, shipdate + 1..28 days] against order "
    "dates, per order counting covering shipments and their quantity "
    "total (integer cents). Intervals explode to the <= 2 fixed "
    "32-day buckets they overlap (bucket width >= max duration "
    "bounds the fan-out), points map to exactly ONE bucket — so each "
    "qualifying pair meets exactly once, no post-dedup — and the "
    "BETWEEN becomes a residual filter behind a shuffle hash join on "
    "the bucket key (AQE splits hot buckets). Day arithmetic is "
    "integer epoch-days on both engines; the oracle is the naive "
    "theta join DuckDB's IEJoin can afford at sf0.01.",
    tags=("join", "interval", "temporal", "J1", "scale"),
)
def q145_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders")
    sd = F.expr("div(CAST(floor(unix_timestamp(l_shipdate)) AS BIGINT), 86400)")
    iv = li.select(
        sd.alias("sd"),
        (
            sd + 1 + (F.col("l_orderkey") + F.col("l_linenumber")) % 28
        ).alias("ed"),
        F.round(F.col("l_quantity") * 100, 0).cast("long").alias("qc"),
    ).withColumn(
        "bucket",
        F.explode(
            F.sequence(
                F.expr(f"div(sd, {_IV_BUCKET})"),
                F.expr(f"div(ed, {_IV_BUCKET})"),
            )
        ),
    )
    pts = o.select(
        "o_orderkey",
        F.expr(
            "div(CAST(floor(unix_timestamp(o_orderdate)) AS BIGINT), 86400)"
        ).alias("d"),
    ).withColumn("bucket", F.expr(f"div(d, {_IV_BUCKET})"))
    j = pts.join(iv, "bucket").filter(
        F.col("d").between(F.col("sd"), F.col("ed"))
    )
    agg = j.groupBy("o_orderkey").agg(
        F.count("*").alias("n_cover"), F.sum("qc").alias("qty_cents")
    )
    return pts.select("o_orderkey").join(agg, "o_orderkey", "left").select(
        "o_orderkey",
        F.coalesce("n_cover", F.lit(0)).cast("long").alias("n_cover"),
        F.coalesce("qty_cents", F.lit(0)).cast("long").alias("qty_cents"),
    )


_SSSP_ROUNDS = 3
_SSSP_INF = 999_999  # integer infinity, as in q137


def _sssp_oracle() -> str:
    """Unroll the weighted min-plus relaxations (Bellman–Ford rounds) as
    CTEs — identical join/agg shape to the Spark loop body."""
    ctes = [
        f"""pts AS ({_POINTS_SQL}),
    e AS MATERIALIZED (
      SELECT a.id AS src, b.id AS dst,
             1 + (a.id + b.id) % 7 AS w
      FROM pts a JOIN pts b
        ON a.id < b.id
       AND sqrt((a.x-b.x)*(a.x-b.x) + (a.y-b.y)*(a.y-b.y)) < {_EPS}),
    und AS MATERIALIZED (
      SELECT src, dst, w FROM e
      UNION ALL SELECT dst AS src, src AS dst, w FROM e),
    d0 AS (
      SELECT id, CASE WHEN id % 50 = 0 THEN 0 ELSE {_SSSP_INF} END AS d
      FROM (SELECT DISTINCT src AS id FROM und))"""
    ]
    for r in range(1, _SSSP_ROUNDS + 1):
        ctes.append(
            f"""d{r} AS MATERIALIZED (
      SELECT a.id, least(a.d, coalesce(min(p.d + u.w), {_SSSP_INF})) AS d
      FROM d{r - 1} a
      LEFT JOIN und u ON u.dst = a.id
      LEFT JOIN d{r - 1} p ON p.id = u.src
      GROUP BY a.id, a.d)"""
        )
    return (
        "WITH "
        + ",\n    ".join(ctes)
        + f"""
    SELECT id, CAST(least(d, {_SSSP_INF}) AS BIGINT) AS dist
    FROM d{_SSSP_ROUNDS}"""
    )


@register(
    "q150_sssp_weighted",
    oracle=_sssp_oracle(),
    doc="Weighted single-source(-set) shortest paths on the bond graph "
    "— the weighted generalization of q137's BFS (Bellman–Ford "
    "min-plus relaxation, 3 rounds from the id%50==0 seed set, "
    "deterministic integer edge weights 1 + (src+dst)%7): per round "
    "every node takes min(own, neighbor + edge weight). All-integer "
    "with the explicit 999999 infinity clamped after the last round, "
    "so both engines replay the rounds exactly — no float distances. "
    "Spark side is the q133/q137 driver-loop shape: ONE edge×dist "
    "equi-join (keyed on src, co-partitioned across rounds) + one "
    "min hash-agg per round, localCheckpoint truncating lineage; "
    "the fixed round budget means the physical plan never grows "
    "with the graph, and each round's shuffle moves one (id, dist) "
    "row per node plus one message per edge — the textbook "
    "Pregel-on-DataFrames layout.",
    tags=("graph", "sssp", "iterative", "scale"),
)
def q150_sssp_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    edges = grid_proximity_join(
        _points(spark, sf_dir), eps=_EPS, id_col="id"
    ).select(
        "src", "dst", (1 + (F.col("src") + F.col("dst")) % 7).alias("w")
    )
    und = edges.unionByName(
        edges.select(
            F.col("dst").alias("src"), F.col("src").alias("dst"), "w"
        )
    ).localCheckpoint(eager=False)
    dist = (
        und.select(F.col("src").alias("id"))
        .distinct()
        .select(
            "id",
            F.when(F.col("id") % 50 == 0, F.lit(0))
            .otherwise(F.lit(_SSSP_INF))
            .cast("long")
            .alias("d"),
        )
        .localCheckpoint(eager=False)
    )
    for _ in range(_SSSP_ROUNDS):
        relaxed = (
            und.join(dist.withColumnRenamed("id", "src"), "src")
            .groupBy(F.col("dst").alias("id"))
            .agg(F.min(F.col("d") + F.col("w")).alias("nd"))
        )
        dist = (
            dist.join(relaxed, "id", "left")
            .select(
                "id",
                F.least(
                    F.col("d"), F.coalesce(F.col("nd"), F.lit(_SSSP_INF))
                ).alias("d"),
            )
            .localCheckpoint(eager=False)
        )
    return dist.select(
        "id",
        F.least(F.col("d"), F.lit(_SSSP_INF)).cast("long").alias("dist"),
    )


_DBSCAN_MINPTS = 4  # core = at least minPts points in the eps-ball, self included


@register(
    "q159_dbscan_cores",
    oracle=f"""
    WITH pts AS ({_POINTS_SQL}),
    e AS MATERIALIZED (
      SELECT a.id AS src, b.id AS dst
      FROM pts a JOIN pts b
        ON a.id < b.id
       AND sqrt((a.x-b.x)*(a.x-b.x) + (a.y-b.y)*(a.y-b.y)) < {_EPS}),
    und AS MATERIALIZED (
      SELECT src, dst FROM e UNION ALL SELECT dst AS src, src AS dst FROM e),
    deg AS (SELECT src AS id, count(*) AS dg FROM und GROUP BY 1),
    lab AS (
      SELECT p.id, coalesce(d.dg, 0) AS degree,
             coalesce(d.dg, 0) + 1 >= {_DBSCAN_MINPTS} AS is_core
      FROM pts p LEFT JOIN deg d ON d.id = p.id)
    SELECT l.id, CAST(l.degree AS BIGINT) AS degree,
           CASE WHEN l.is_core THEN 'core'
                WHEN EXISTS (SELECT 1 FROM und u JOIN lab c ON c.id = u.src
                             WHERE u.dst = l.id AND c.is_core)
                  THEN 'border'
                ELSE 'noise' END AS role
    FROM lab l
    """,
    doc="DBSCAN point classification (core / border / noise at eps=30, "
    "minPts=4) — the density-clustering complement to q143's k-means "
    "(which assumes convex, similar-size clusters; density handles "
    "the elongated grain-boundary shapes the reference's "
    "tessellations produce): a point is core when its eps-ball holds "
    "at least minPts points (itself included), border when non-core "
    "but inside some core's ball, noise otherwise. The eps-ball "
    "membership comes from the SAME grid-binned proximity join as "
    "q30 (operators/proximity.py — bounded 9-cell explode, "
    "equi-join on cell, exact distance post-filter), so no pair "
    "space beyond the physical neighbor pairs ever exists; degree "
    "count and the border probe are one hash agg + one semi-join "
    "against the broadcast-size core set. All-integer degrees, "
    "label strings — exact on both engines.",
    tags=("proximity", "clustering", "dbscan", "J1", "scale"),
)
def q159_dbscan_cores(spark: SparkSession, sf_dir: str) -> DataFrame:
    pts = _points(spark, sf_dir)
    edges = grid_proximity_join(pts, eps=_EPS, id_col="id").select(
        "src", "dst"
    )
    und = edges.unionByName(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).localCheckpoint(eager=False)
    deg = und.groupBy(F.col("src").alias("id")).agg(
        F.count("*").alias("dg")
    )
    lab = (
        pts.select("id")
        .join(deg, "id", "left")
        .select(
            "id",
            F.coalesce("dg", F.lit(0)).alias("degree"),
            (F.coalesce("dg", F.lit(0)) + 1 >= _DBSCAN_MINPTS).alias(
                "is_core"
            ),
        )
        .localCheckpoint(eager=False)
    )
    core_ids = lab.filter("is_core").select(F.col("id").alias("src"))
    bordered = (
        und.join(core_ids, "src", "left_semi")
        .select(F.col("dst").alias("id"))
        .distinct()
        .withColumn("near_core", F.lit(True))
    )
    return (
        lab.join(bordered, "id", "left")
        .select(
            "id",
            F.col("degree").cast("long").alias("degree"),
            F.when(F.col("is_core"), "core")
            .when(F.col("near_core").isNotNull(), "border")
            .otherwise("noise")
            .alias("role"),
        )
    )


@register(
    "q186_degree_powerlaw",
    oracle=f"""
    WITH pts AS ({_POINTS_SQL}),
    e AS MATERIALIZED (
      SELECT a.id AS src, b.id AS dst
      FROM pts a JOIN pts b
        ON a.id < b.id
       AND sqrt((a.x-b.x)*(a.x-b.x) + (a.y-b.y)*(a.y-b.y)) < {_KCORE_EPS}),
    und AS (
      SELECT src, dst FROM e UNION ALL SELECT dst AS src, src AS dst FROM e),
    deg AS (SELECT src AS id, count(*) AS d FROM und GROUP BY 1),
    hist AS (SELECT d, count(*) AS c FROM deg GROUP BY d),
    pt AS (
      SELECT CAST(round(ln(CAST(d AS DOUBLE)) * 1000000.0) AS BIGINT) AS lx,
             CAST(round(ln(CAST(c AS DOUBLE)) * 1000000.0) AS BIGINT) AS ly
      FROM hist),
    s AS (
      SELECT count(*) AS n,
             CAST(sum(lx) AS BIGINT) AS sx, CAST(sum(ly) AS BIGINT) AS sy,
             CAST(sum(lx * lx) AS BIGINT) AS sxx,
             CAST(sum(lx * ly) AS BIGINT) AS sxy
      FROM pt)
    SELECT CAST(n AS BIGINT) AS n_degree_levels,
           round((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
                 / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx), 6)
             AS alpha
    FROM s
    """,
    doc="Degree-distribution power-law exponent (the scale-free-ness "
    "diagnostic that tells a graph engine whether hub-skew defenses "
    "like q128's degree orientation will matter): histogram the bond "
    "graph's degrees, fit ln(count) against ln(degree) by the q153 "
    "closed-form OLS. Composes three shipped disciplines — the "
    "binned proximity join for edges, micro-nat ln quantization "
    "(q100) so the regression inputs are exact int64, and the "
    "single-pass five-sum OLS (q153) whose final arithmetic is "
    "IEEE-identical on both engines. The regression relation is "
    "degree LEVELS (≤ max degree, tiny at any corpus scale); the "
    "heavy work is the one degree hash agg.",
    tags=("graph", "powerlaw", "regression", "agg", "scale"),
)
def q186_degree_powerlaw(spark: SparkSession, sf_dir: str) -> DataFrame:
    edges = grid_proximity_join(
        _points(spark, sf_dir), eps=_KCORE_EPS, id_col="id"
    ).select("src", "dst")
    und = edges.unionByName(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    deg = und.groupBy(F.col("src").alias("id")).agg(
        F.count("*").alias("d")
    )
    hist = deg.groupBy("d").agg(F.count("*").alias("c"))
    lq = lambda col: F.round(  # noqa: E731
        F.log(F.col(col).cast("double")) * 1000000.0, 0
    ).cast("long")
    pt = hist.select(lq("d").alias("lx"), lq("c").alias("ly"))
    s = pt.agg(
        F.count("*").alias("n"),
        F.sum("lx").alias("sx"),
        F.sum("ly").alias("sy"),
        F.sum(F.col("lx") * F.col("lx")).alias("sxx"),
        F.sum(F.col("lx") * F.col("ly")).alias("sxy"),
    )
    nd = F.col("n").cast("double")
    sxd = F.col("sx").cast("double")
    return s.select(
        F.col("n").cast("long").alias("n_degree_levels"),
        F.round(
            (nd * F.col("sxy") - sxd * F.col("sy"))
            / (nd * F.col("sxx") - sxd * F.col("sx")),
            6,
        ).alias("alpha"),
    )


# --- q193: label-propagation communities (round 7) ------------------------

_LPA_ROUNDS = 4


def _lpa_oracle(rounds: int) -> str:
    """Unroll synchronous label propagation as a DuckDB CTE chain: per
    round every node adopts the most frequent label among its
    neighbors (ties to the SMALLEST label — the determinism rule that
    makes sync LPA replayable), isolated nodes keep their own. All
    integer, so the compare is exact."""
    head = f"""
    WITH pts AS ({_POINTS_SQL}),
    e AS MATERIALIZED (
      SELECT a.id AS src, b.id AS dst
      FROM pts a JOIN pts b
        ON a.id < b.id
       AND sqrt((a.x-b.x)*(a.x-b.x) + (a.y-b.y)*(a.y-b.y)) < {_EPS}),
    und AS MATERIALIZED (
      SELECT src, dst FROM e UNION ALL SELECT dst AS src, src AS dst FROM e),
    l0 AS (SELECT id, id AS lbl FROM pts)"""
    steps = []
    for i in range(1, rounds + 1):
        p = i - 1
        steps.append(f""",
    c{i} AS (
      SELECT u.src AS id, l.lbl, count(*) AS cnt
      FROM und u JOIN l{p} l ON l.id = u.dst
      GROUP BY 1, 2),
    w{i} AS (
      SELECT id, lbl FROM (
        SELECT id, lbl,
               row_number() OVER (PARTITION BY id
                                  ORDER BY cnt DESC, lbl) AS rn
        FROM c{i})
      WHERE rn = 1),
    l{i} AS (
      SELECT l.id, coalesce(w.lbl, l.lbl) AS lbl
      FROM l{p} l LEFT JOIN w{i} w ON w.id = l.id)""")
    tail = f"""
    SELECT l.id, l.lbl AS community,
           CAST(s.n AS BIGINT) AS community_size
    FROM l{rounds} l
    JOIN (SELECT lbl, count(*) AS n FROM l{rounds} GROUP BY 1) s
      ON s.lbl = l.lbl
    """
    return head + "".join(steps) + tail


@register(
    "q193_label_propagation",
    oracle=_lpa_oracle(_LPA_ROUNDS),
    doc="Synchronous label-propagation community detection on the bond "
    "network (the near-linear community pass of Raghavan et al. 2007, "
    "and the standard first cut for grouping a contact/bond graph "
    "into grains/clusters): 4 fixed rounds, every node adopts the "
    "most frequent neighbor label with ties to the SMALLEST label — "
    "the determinism rule that makes sync LPA exactly replayable on "
    "both engines (classic async LPA is run-order-dependent and "
    "unverifiable). Per round: one join of the undirected edge "
    "relation against current labels, one (node, label) count agg, "
    "one per-node top-1 via a lexicographic struct-max HASH AGG "
    "(max(cnt, -lbl)) — partial/final combinable, so even a "
    "10M-degree hub never funnels through a single window "
    "partition — then a left join that lets "
    "isolated nodes keep their own label; localCheckpoint truncates "
    "lineage per round, the q56/q133 iteration discipline. Fixed "
    "round count = fixed shuffle count at any scale; all-integer so "
    "the oracle's unrolled replay is hash-exact.",
    tags=("graph", "community", "lpa", "iterative", "scale"),
)
def q193_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    pts = _points(spark, sf_dir).select("id")
    edges = grid_proximity_join(
        _points(spark, sf_dir), eps=_EPS, id_col="id"
    ).select("src", "dst")
    und = edges.unionByName(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).localCheckpoint(eager=False)
    lbl = pts.select("id", F.col("id").alias("lbl"))
    for _ in range(_LPA_ROUNDS):
        c = (
            und.join(
                lbl.select(F.col("id").alias("dst"), "lbl"), "dst"
            )
            .groupBy(F.col("src").alias("id"), "lbl")
            .agg(F.count("*").alias("cnt"))
        )
        # top-1 label with (cnt DESC, lbl ASC) tie-break as a pure hash
        # agg: lexicographic max of (cnt, -lbl) — no per-node window, so
        # a 10M-degree hub costs a partial/final agg instead of one
        # 10M-row window partition (the oracle's row_number() picks the
        # identical row; ids are positive, so -lbl orders ties)
        pick = (
            c.groupBy("id")
            .agg(
                F.max(
                    F.struct(F.col("cnt"), (-F.col("lbl")).alias("nl"))
                ).alias("m")
            )
            .select("id", (-F.col("m.nl")).alias("new_lbl"))
        )
        lbl = (
            lbl.join(pick, "id", "left")
            .select(
                "id", F.coalesce("new_lbl", "lbl").alias("lbl")
            )
            # LAZY (r16): fixed round count means no per-round action is
            # needed at all — plan truncation is eagerness-independent,
            # and the final action materializes all four cache-backed
            # rounds in ONE job instead of one eager job per round
            .localCheckpoint(eager=False)
        )
    sizes = lbl.groupBy("lbl").agg(F.count("*").alias("n"))
    return lbl.join(sizes, "lbl").select(
        "id",
        F.col("lbl").alias("community"),
        F.col("n").cast("long").alias("community_size"),
    )


def _modularity_oracle(rounds: int) -> str:
    """q193's unrolled LPA chain extended with the Newman modularity of
    the final partition. Exactness: Q = (4m·intra − Σ_c d_c²) / (4m²)
    — the numerator and denominator are EXACT int64 (no per-community
    float summation), so the only float op is one shared division."""
    base = _lpa_oracle(rounds)
    # keep the CTE chain, replace the per-node SELECT tail
    tail_start = base.index(f"\n    SELECT l.id, l.lbl AS community")
    head = base[:tail_start]
    return head + f""",
    deg AS (
      SELECT src AS id, count(*) AS deg FROM und GROUP BY 1),
    lc AS (
      SELECT CAST(count(*) AS BIGINT) AS intra
      FROM e
      JOIN l{rounds} la ON la.id = e.src
      JOIN l{rounds} lb ON lb.id = e.dst
      WHERE la.lbl = lb.lbl),
    dc AS (
      SELECT l.lbl, CAST(sum(d.deg) AS BIGINT) AS dsum
      FROM deg d JOIN l{rounds} l ON l.id = d.id
      GROUP BY 1),
    sq AS (
      SELECT CAST(coalesce(round(sum(CAST(dsum AS DOUBLE) * dsum)), 0)
               AS BIGINT) AS sd2
      FROM dc),
    me AS (SELECT CAST(count(*) AS BIGINT) AS m FROM e),
    nc AS (
      SELECT CAST(count(DISTINCT lbl) AS BIGINT) AS n
      FROM l{rounds})
    SELECT nc.n AS n_communities,
           me.m AS m_edges,
           lc.intra AS intra_edges,
           sq.sd2 AS degree_sq_sum,
           CAST(round(1000000.0
                      * (4.0 * me.m * lc.intra - sq.sd2)
                      / (4.0 * me.m * me.m)) AS BIGINT) AS q_micro
    FROM nc, me, lc, sq
    """


@register(
    "q202_graph_modularity",
    oracle=_modularity_oracle(_LPA_ROUNDS),
    doc="Newman modularity of the q193 label-propagation partition — "
    "the quality number that tells you whether the communities mean "
    "anything (Q ≈ 0: no better than random; Q ≳ 0.3: real "
    "structure): Q = Σ_c [L_c/m − (d_c/2m)²], computed in the "
    "float-summation-free form (4m·intra − Σ d_c²)/(4m²) so the "
    "numerator and denominator are EXACT int64 from three hash aggs "
    "(intra-community edge count via two label joins, per-community "
    "degree sums, squared and summed) and the ONLY float op is one "
    "shared division — hash-exact across engines, the q186 OLS "
    "discipline applied to graph quality. Isolated nodes count as "
    "singleton communities (distinct final labels), contribute zero "
    "to both terms. One row out at any scale; cost is the LPA rounds "
    "plus two edge-label joins.",
    tags=("graph", "community", "modularity", "agg", "scale"),
)
def q202_graph_modularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    comm = (
        q193_label_propagation(spark, sf_dir)
        .select("id", F.col("community").alias("lbl"))
        # lazy: computes once on the final action, reused by all four
        # consumers below via the cache-backed checkpoint RDD
        .localCheckpoint(eager=False)
    )
    edges = grid_proximity_join(
        _points(spark, sf_dir), eps=_EPS, id_col="id"
    ).select("src", "dst").localCheckpoint(eager=False)
    und = edges.unionByName(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    deg = und.groupBy(F.col("src").alias("id")).agg(
        F.count("*").alias("deg")
    )
    la = comm.select(F.col("id").alias("src"), F.col("lbl").alias("la"))
    lb = comm.select(F.col("id").alias("dst"), F.col("lbl").alias("lb"))
    intra = (
        edges.join(la, "src")
        .join(lb, "dst")
        .filter(F.col("la") == F.col("lb"))
        .agg(F.count("*").cast("long").alias("intra"))
    )
    sd2 = (
        deg.join(comm, "id")
        .groupBy("lbl")
        .agg(F.sum("deg").cast("long").alias("dsum"))
        .agg(
            # community degree-sum squares in DOUBLE + round-before-
            # cast (q216 overflow rule: dsum ~ 2|E| on one giant
            # community, dsum^2 wraps int64 at ~1.5e9 edges)
            F.coalesce(
                F.round(
                    F.sum(F.col("dsum").cast("double") * F.col("dsum"))
                ),
                F.lit(0),
            )
            .cast("long")
            .alias("sd2")
        )
    )
    me = edges.agg(F.count("*").cast("long").alias("m"))
    nc = comm.agg(F.countDistinct("lbl").cast("long").alias("n"))
    return (
        nc.crossJoin(me)
        .crossJoin(intra)
        .crossJoin(sd2)
        .select(
            F.col("n").alias("n_communities"),
            F.col("m").alias("m_edges"),
            F.col("intra").alias("intra_edges"),
            F.col("sd2").alias("degree_sq_sum"),
            F.round(
                F.lit(1000000.0)
                * (
                    F.lit(4.0) * F.col("m") * F.col("intra")
                    - F.col("sd2")
                )
                / (4.0 * F.col("m") * F.col("m"))
            )
            .cast("long")
            .alias("q_micro"),
        )
    )


# --- q246: HITS hubs & authorities on the directed bond graph --------------

_HITS_ITERS = 2
_HITS_UNIT = 1_000_000


def _hits_oracle() -> str:
    """Unroll the HITS half-steps as CTEs: per round, authority = sum of
    hub over in-edges, rescaled to max=1e6 by truncating integer
    division, then hub = sum of the NEW authority over out-edges,
    rescaled the same way — identical to the Spark loop body."""
    ctes = [
        f"""pts AS ({_POINTS_SQL}),
    e AS MATERIALIZED (
      SELECT a.id AS src, b.id AS dst
      FROM pts a JOIN pts b
        ON a.id < b.id
       AND sqrt((a.x-b.x)*(a.x-b.x) + (a.y-b.y)*(a.y-b.y)) < {_EPS}),
    nodes AS MATERIALIZED (
      SELECT DISTINCT id
      FROM (SELECT src AS id FROM e UNION ALL SELECT dst AS id FROM e)),
    h0 AS (SELECT id, CAST({_HITS_UNIT} AS BIGINT) AS v FROM nodes)"""
    ]
    for r in range(1, _HITS_ITERS + 1):
        ctes.append(
            f"""a{r}raw AS (
      SELECT e.dst AS id, CAST(sum(h.v) AS BIGINT) AS v
      FROM e JOIN h{r - 1} h ON h.id = e.src GROUP BY 1),
    a{r}all AS (
      SELECT n.id, CAST(coalesce(r.v, 0) AS BIGINT) AS v
      FROM nodes n LEFT JOIN a{r}raw r USING (id)),
    a{r}mx AS (SELECT max(v) AS m FROM a{r}all),
    a{r} AS (
      SELECT id, CAST(({_HITS_UNIT} * v) // m AS BIGINT) AS v
      FROM a{r}all, a{r}mx),
    h{r}raw AS (
      SELECT e.src AS id, CAST(sum(a.v) AS BIGINT) AS v
      FROM e JOIN a{r} a ON a.id = e.dst GROUP BY 1),
    h{r}all AS (
      SELECT n.id, CAST(coalesce(r.v, 0) AS BIGINT) AS v
      FROM nodes n LEFT JOIN h{r}raw r USING (id)),
    h{r}mx AS (SELECT max(v) AS m FROM h{r}all),
    h{r} AS (
      SELECT id, CAST(({_HITS_UNIT} * v) // m AS BIGINT) AS v
      FROM h{r}all, h{r}mx)"""
        )
    return (
        "WITH "
        + ",\n    ".join(ctes)
        + f"""
    SELECT a.id, a.v AS auth_micro, h.v AS hub_micro
    FROM a{_HITS_ITERS} a JOIN h{_HITS_ITERS} h USING (id)"""
    )


@register(
    "q246_hits",
    oracle=_hits_oracle(),
    doc="HITS HUBS & AUTHORITIES on the DIRECTED bond graph (edge "
    "src -> dst with src < dst, the proximity join's native "
    "orientation) — the link-analysis dual of q133's PageRank "
    "that separates pointers-to-important (hubs) from pointed-at "
    "(authorities), 2 full mutual-reinforcement rounds: authority "
    "= sum of in-neighbor hub mass, hub = sum of out-neighbor "
    "NEW authority mass. Exactness is the PageRank integer "
    "replay: scores live in micro-units, every half-step is an "
    "order-independent int64 sum followed by one max-normalizing "
    "truncating division (max is order-independent too), so both "
    "engines walk bit-identical state — no float L2 norm, by "
    "design. Scale: each half-step is one equi-join (edges x "
    "scores, co-partitioned on the join key across rounds) + one "
    "map-side-combinable hash agg; the driver loop is "
    "data-independent (fixed 2 rounds) with localCheckpoint "
    "truncating lineage, the q133/q143 iteration pattern.",
    tags=("graph", "hits", "iterative", "proximity", "scale"),
)
def q246_hits(spark: SparkSession, sf_dir: str) -> DataFrame:
    edges = (
        grid_proximity_join(_points(spark, sf_dir), eps=_EPS, id_col="id")
        .select("src", "dst")
        .localCheckpoint(eager=False)
    )
    nodes = (
        edges.select(F.col("src").alias("id"))
        .unionByName(edges.select(F.col("dst").alias("id")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    h = nodes.select("id", F.lit(_HITS_UNIT).cast("long").alias("v"))
    a = None
    for _ in range(_HITS_ITERS):
        a_raw = (
            edges.join(h.withColumnRenamed("id", "src"), "src")
            .groupBy(F.col("dst").alias("id"))
            .agg(F.sum("v").cast("long").alias("v"))
        )
        a = _hits_rescale(nodes, a_raw)
        h_raw = (
            edges.join(
                a.select(F.col("id").alias("dst"), "v"), "dst"
            )
            .groupBy(F.col("src").alias("id"))
            .agg(F.sum("v").cast("long").alias("v"))
        )
        h = _hits_rescale(nodes, h_raw)
    return nodes.join(
        a.select("id", F.col("v").alias("auth_micro")), "id"
    ).join(h.select("id", F.col("v").alias("hub_micro")), "id")


def _hits_rescale(nodes: DataFrame, raw: DataFrame) -> DataFrame:
    """Left-join scores onto the full node set (absent -> 0), then
    rescale to max = _HITS_UNIT with exact truncating division."""
    full = nodes.join(raw, "id", "left").select(
        "id", F.coalesce("v", F.lit(0)).cast("long").alias("v")
    )
    mx = full.agg(F.max("v").alias("m"))
    return (
        full.crossJoin(F.broadcast(mx))
        .select(
            "id",
            F.expr(f"div({_HITS_UNIT} * v, m)").cast("long").alias("v"),
        )
        .localCheckpoint(eager=False)
    )


# --- q273: Laplacian spectral radius by integer power iteration --------------

_LAP_ITERS = 3
_LAP_UNIT = 1_000_000


def _lap_oracle() -> str:
    """Unroll L v = deg*v - sum of neighbor v as CTEs — EXACT int64
    end-to-end (no quantization: the matvec is integer arithmetic on
    integer state), signed truncating max-rescale per round (q246/q264
    discipline), Rayleigh quotient as a ratio of two exact int64 sums."""
    ctes = [
        f"""pts AS ({_POINTS_SQL}),
    e AS MATERIALIZED (
      SELECT a.id AS src, b.id AS dst
      FROM pts a JOIN pts b
        ON a.id < b.id
       AND sqrt((a.x-b.x)*(a.x-b.x) + (a.y-b.y)*(a.y-b.y)) < {_EPS}),
    und AS MATERIALIZED (
      SELECT src, dst FROM e
      UNION ALL SELECT dst AS src, src AS dst FROM e),
    nodes AS MATERIALIZED (SELECT DISTINCT src AS id FROM und),
    deg AS MATERIALIZED (
      SELECT src AS id, CAST(count(*) AS BIGINT) AS d
      FROM und GROUP BY 1),
    v0 AS (
      SELECT id, CAST((CASE WHEN id % 2 = 0 THEN 1 ELSE -1 END)
               * ({_LAP_UNIT} + id % 997) AS BIGINT) AS v
      FROM nodes)"""
    ]
    for r in range(1, _LAP_ITERS + 1):
        ctes.append(
            f"""nb{r} AS (
      SELECT u.src AS id, CAST(sum(v.v) AS BIGINT) AS s
      FROM und u JOIN v{r - 1} v ON v.id = u.dst GROUP BY 1),
    w{r} AS (
      SELECT d.id, CAST(d.d * v.v - coalesce(n.s, 0) AS BIGINT) AS w
      FROM deg d
      JOIN v{r - 1} v USING (id)
      LEFT JOIN nb{r} n USING (id)),
    m{r} AS (SELECT CAST(greatest(max(abs(w)), 1) AS BIGINT) AS m
             FROM w{r}),
    v{r} AS (
      SELECT id,
             CAST(CASE WHEN w >= 0 THEN ({_LAP_UNIT} * w) // m
                  ELSE -(({_LAP_UNIT} * (-w)) // m) END AS BIGINT) AS v
      FROM w{r}, m{r})"""
        )
    last = f"v{_LAP_ITERS}"
    return (
        "WITH "
        + ",\n    ".join(ctes)
        + f""",
    nbf AS (
      SELECT u.src AS id, CAST(sum(v.v) AS BIGINT) AS s
      FROM und u JOIN {last} v ON v.id = u.dst GROUP BY 1),
    ray AS (
      SELECT CAST(sum(v.v * (d.d * v.v - coalesce(n.s, 0))) AS BIGINT)
               AS num_q,
             CAST(sum(v.v * v.v) AS BIGINT) AS den_q
      FROM {last} v JOIN deg d USING (id) LEFT JOIN nbf n USING (id)),
    cnt AS (
      SELECT CAST((SELECT count(*) FROM nodes) AS BIGINT) AS n_nodes,
             CAST((SELECT count(*) FROM e) AS BIGINT) AS n_edges,
             CAST((SELECT max(d) FROM deg) AS BIGINT) AS max_deg)
    SELECT c.n_nodes, c.n_edges, c.max_deg,
           CAST(CASE WHEN r.den_q > 0 THEN
             round(1000.0 * CAST(r.num_q AS DOUBLE) / r.den_q)
             ELSE 0 END AS BIGINT) AS lambda_max_milli
    FROM cnt c CROSS JOIN ray r"""
    )


@register(
    "q273_laplacian_lambda",
    oracle=_lap_oracle(),
    doc="LAPLACIAN SPECTRAL RADIUS of the proximity bond graph by "
    f"POWER ITERATION — {_LAP_ITERS} rounds of w = L v = deg*v - "
    "sum(neighbor v) on the q246 integer-state discipline, and the "
    "spectral member the graph tier lacked (q133 PageRank and "
    "q246 HITS probe adjacency's top space; lambda_max(L) bounds "
    "synchronizability/diffusion speed and caps the safe step "
    "size of any graph-diffusion smoother at 2/lambda_max). "
    "Sharper than q264: the matvec is EXACT int64 on integer "
    "state — zero quantization anywhere in the loop — because L "
    "has integer entries; the all-ones vector is L's null space, "
    "so the deterministic start alternates sign by id parity with an id-dependent magnitude (UNIT + id mod 997 — non-constant on any generic component; degenerate graphs fall back to lambda 0 via the guarded rescale) "
    "(never orthogonal to the top eigenvector in a generic "
    "graph). Rescale is the signed truncating division (Spark "
    "div = trunc; DuckDB // floors, negatives routed through "
    "-((-x)//m)). Rayleigh lambda = v'Lv / v'v as ONE division "
    "of exact int64 sums; Gershgorin sanity lambda <= 2*max_deg. "
    "Scale: each round is one edges-x-state equi-join + hash agg "
    "(co-partitioned across rounds, q133/q193 pattern); state is "
    "|nodes| longs; localCheckpoint truncates lineage per round.",
    tags=("graph", "spectral", "laplacian", "iterative", "scale"),
)
def q273_laplacian_lambda(spark: SparkSession, sf_dir: str) -> DataFrame:
    edges = (
        grid_proximity_join(_points(spark, sf_dir), eps=_EPS, id_col="id")
        .select("src", "dst")
        .localCheckpoint(eager=False)
    )
    und = edges.unionByName(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).localCheckpoint(eager=False)
    deg = und.groupBy(F.col("src").alias("id")).agg(
        F.count(F.lit(1)).cast("long").alias("d")
    )
    deg = deg.localCheckpoint(eager=False)
    v = deg.select(
        "id",
        (
            F.when(F.col("id") % 2 == 0, F.lit(1)).otherwise(F.lit(-1))
            * (F.lit(_LAP_UNIT) + F.col("id") % 997)
        )
        .cast("long")
        .alias("v"),
    )
    for _ in range(_LAP_ITERS):
        nb = (
            und.join(v.select(F.col("id").alias("dst"), "v"), "dst")
            .groupBy(F.col("src").alias("id"))
            .agg(F.sum("v").cast("long").alias("s"))
        )
        w = (
            deg.join(v, "id")
            .join(nb, "id", "left")
            .select(
                "id",
                (
                    F.col("d") * F.col("v")
                    - F.coalesce(F.col("s"), F.lit(0))
                )
                .cast("long")
                .alias("w"),
            )
        )
        mx = w.agg(
            F.greatest(F.max(F.abs(F.col("w"))), F.lit(1))
            .cast("long")
            .alias("m")
        )
        v = (
            w.crossJoin(F.broadcast(mx))
            .select(
                "id",
                F.expr(
                    f"CAST(CASE WHEN w >= 0 THEN div({_LAP_UNIT} * w, m)"
                    f" ELSE -div({_LAP_UNIT} * (-w), m) END AS BIGINT)"
                ).alias("v"),
            )
            .localCheckpoint(eager=False)
        )
    nbf = (
        und.join(v.select(F.col("id").alias("dst"), "v"), "dst")
        .groupBy(F.col("src").alias("id"))
        .agg(F.sum("v").cast("long").alias("s"))
    )
    ray = (
        v.join(deg, "id")
        .join(nbf, "id", "left")
        .agg(
            F.sum(
                F.col("v")
                * (
                    F.col("d") * F.col("v")
                    - F.coalesce(F.col("s"), F.lit(0))
                )
            )
            .cast("long")
            .alias("num_q"),
            F.sum(F.col("v") * F.col("v")).cast("long").alias("den_q"),
        )
    )
    cnt = (
        deg.agg(
            F.count(F.lit(1)).cast("long").alias("n_nodes"),
            F.max("d").cast("long").alias("max_deg"),
        )
        .crossJoin(
            F.broadcast(
                edges.agg(F.count(F.lit(1)).cast("long").alias("n_edges"))
            )
        )
    )
    return cnt.crossJoin(F.broadcast(ray)).select(
        "n_nodes",
        "n_edges",
        "max_deg",
        F.expr(
            "CAST(CASE WHEN den_q > 0 THEN"
            " round(1000.0 * CAST(num_q AS DOUBLE) / den_q)"
            " ELSE 0 END AS BIGINT)"
        ).alias("lambda_max_milli"),
    )


# --- q289: degree assortativity of the bond graph ----------------------------


@register(
    "q289_degree_assortativity",
    oracle=f"""
    WITH pts AS ({_POINTS_SQL}),
    e AS MATERIALIZED (
      SELECT a.id AS src, b.id AS dst
      FROM pts a JOIN pts b
        ON a.id < b.id
       AND sqrt((a.x-b.x)*(a.x-b.x) + (a.y-b.y)*(a.y-b.y)) < {_EPS}),
    deg AS (
      SELECT id, CAST(count(*) AS BIGINT) AS d
      FROM (SELECT src AS id FROM e UNION ALL SELECT dst AS id FROM e)
      GROUP BY id),
    j AS (
      SELECT ds.d AS dx, dd.d AS dy
      FROM e JOIN deg ds ON ds.id = e.src
             JOIN deg dd ON dd.id = e.dst),
    s AS (
      SELECT CAST((SELECT count(*) FROM deg) AS BIGINT) AS n_nodes,
             CAST(count(*) AS BIGINT) AS n_edges,
             CAST(2 * count(*) AS BIGINT) AS m,
             CAST(sum(dx + dy) AS BIGINT) AS sx,
             CAST(sum(dx * dx + dy * dy) AS BIGINT) AS sxx,
             CAST(2 * sum(dx * dy) AS BIGINT) AS sxy
      FROM j)
    SELECT n_nodes, n_edges, sx, sxx, sxy,
           CAST(CASE WHEN CAST(m AS DOUBLE) * sxx
                          - CAST(sx AS DOUBLE) * sx > 0 THEN
                round(1000.0 * (CAST(m AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sx)
                      / (CAST(m AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx))
                ELSE 0 END AS BIGINT) AS r_milli
    FROM s
    """,
    doc="DEGREE ASSORTATIVITY (Newman's r) of the undirected bond "
    "graph — do high-degree nodes bond to high-degree nodes? The "
    "one-number mixing diagnostic that tells a partitioner whether "
    "the graph has a dense core (r > 0: hubs cluster, the skew-join "
    "danger zone q274 profiles) or a hub-and-spoke shape (r < 0). "
    "Pearson correlation of endpoint degrees over the symmetrized "
    "edge list, computed WITHOUT materializing 2E rows: each "
    "undirected edge contributes both orientations analytically "
    "(sx = sum(dx+dy), sxx = sum(dx^2+dy^2), sxy = 2*sum(dx*dy) — "
    "symmetric marginals make x- and y-moments equal). Exactness: "
    "degrees and all five moments are exact int64 sums from one "
    "edge pass; r is one double expression on them, rounded to "
    "milli; degenerate variance returns 0 via a guard evaluated in "
    "DOUBLE on both engines (an int64 guard would overflow at "
    "sx*sx ~ 2^63, i.e. sx ~ 3e9 — Spark would wrap silently into "
    "the wrong branch while DuckDB errors; the double guard matches "
    "the numerator's own precision). Scale: degree "
    "agg + two equi-joins on the edge key, all map-side-combinable "
    "folds to one row; the int64 MOMENT sums themselves stay exact "
    "while sxx < 2^63 (sum of squared degrees; the double-precision "
    "guard is the binding constraint well before that).",
    tags=("graph", "assortativity", "proximity", "scale"),
)
def q289_degree_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    edges = (
        grid_proximity_join(_points(spark, sf_dir), eps=_EPS, id_col="id")
        .select("src", "dst")
        .localCheckpoint(eager=False)
    )
    deg = (
        edges.select(F.col("src").alias("id"))
        .unionByName(edges.select(F.col("dst").alias("id")))
        .groupBy("id")
        .agg(F.count(F.lit(1)).cast("long").alias("d"))
        .localCheckpoint(eager=False)
    )
    j = (
        edges.join(deg.select(F.col("id").alias("src"),
                              F.col("d").alias("dx")), "src")
        .join(deg.select(F.col("id").alias("dst"),
                         F.col("d").alias("dy")), "dst")
    )
    n_nodes = deg.count()
    s = j.agg(
        F.lit(n_nodes).cast("long").alias("n_nodes"),
        F.count(F.lit(1)).cast("long").alias("n_edges"),
        (F.lit(2) * F.count(F.lit(1))).cast("long").alias("m"),
        F.sum(F.col("dx") + F.col("dy")).cast("long").alias("sx"),
        F.sum(F.col("dx") * F.col("dx") + F.col("dy") * F.col("dy"))
        .cast("long")
        .alias("sxx"),
        (F.lit(2) * F.sum(F.col("dx") * F.col("dy")))
        .cast("long")
        .alias("sxy"),
    )
    return s.select(
        "n_nodes",
        "n_edges",
        "sx",
        "sxx",
        "sxy",
        F.expr(
            "CAST(CASE WHEN CAST(m AS DOUBLE) * sxx"
            " - CAST(sx AS DOUBLE) * sx > 0 THEN"
            " round(1000.0 * (CAST(m AS DOUBLE) * sxy"
            " - CAST(sx AS DOUBLE) * sx)"
            " / (CAST(m AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx))"
            " ELSE 0 END AS BIGINT)"
        ).alias("r_milli"),
    )


# --- q299: local clustering coefficient ---------------------------------------


@register(
    "q299_clustering_coefficient",
    oracle=f"""
    WITH pts AS ({_POINTS_SQL}),
    e AS MATERIALIZED (
      SELECT a.id AS src, b.id AS dst
      FROM pts a JOIN pts b
        ON a.id < b.id
       AND sqrt((a.x-b.x)*(a.x-b.x) + (a.y-b.y)*(a.y-b.y)) < {_EPS}),
    deg AS (
      SELECT id, CAST(count(*) AS BIGINT) AS degree
      FROM (SELECT src AS id FROM e UNION ALL SELECT dst AS id FROM e)
      GROUP BY id),
    tri AS (
      SELECT e1.src AS a, e1.dst AS b, e2.dst AS c
      FROM e e1
      JOIN e e2 ON e2.src = e1.dst
      JOIN e e3 ON e3.src = e1.src AND e3.dst = e2.dst),
    pertri AS (
      SELECT id, CAST(count(*) AS BIGINT) AS tri
      FROM (SELECT a AS id FROM tri
            UNION ALL SELECT b AS id FROM tri
            UNION ALL SELECT c AS id FROM tri)
      GROUP BY id)
    SELECT d.id, d.degree,
           CAST(coalesce(p.tri, 0) AS BIGINT) AS n_triangles,
           CAST(CASE WHEN d.degree >= 2 THEN
                round(1000.0 * (2 * coalesce(p.tri, 0))
                      / (CAST(d.degree AS DOUBLE) * (d.degree - 1)))
                ELSE 0 END AS BIGINT) AS cc_milli
    FROM deg d LEFT JOIN pertri p ON p.id = d.id
    ORDER BY d.id
    """,
    doc="LOCAL CLUSTERING COEFFICIENT per node — the per-node "
    "companion of q128's global triangle count (q128 says how many "
    "triangles the graph has; this says WHICH nodes sit in tight "
    "cliques vs bridge positions — the feature community detectors "
    "and fraud screens read): cc(v) = 2*tri(v) / (deg(v)*(deg(v)-1)). "
    "Triangles enumerate via the src<dst-oriented two-join (each "
    "triangle found exactly once as a<b<c, each corner credited via "
    "the three-way union); degrees from the symmetrized edge agg. "
    "Exactness: triangle and degree counts are exact int64; cc is "
    "one double division rounded to milli, deg<2 guard returns 0. "
    "Scale: the wedge join fans out by adjacency, not all-pairs; at "
    "power-law skew the q128 degree-orientation escape applies "
    "verbatim (orient edges low-degree -> high-degree before the "
    "wedge join) — the native src<dst orientation is kept here for "
    "oracle parity on the near-uniform bond graph.",
    tags=("graph", "triangles", "clustering", "proximity", "scale"),
)
def q299_clustering_coefficient(spark: SparkSession, sf_dir: str) -> DataFrame:
    edges = (
        grid_proximity_join(_points(spark, sf_dir), eps=_EPS, id_col="id")
        .select("src", "dst")
        .localCheckpoint(eager=False)
    )
    deg = (
        edges.select(F.col("src").alias("id"))
        .unionByName(edges.select(F.col("dst").alias("id")))
        .groupBy("id")
        .agg(F.count(F.lit(1)).cast("long").alias("degree"))
    )
    e1 = edges.select(F.col("src").alias("a"), F.col("dst").alias("b"))
    e2 = edges.select(F.col("src").alias("b"), F.col("dst").alias("c"))
    e3 = edges.select(F.col("src").alias("a"), F.col("dst").alias("c"))
    tri = e1.join(e2, "b").join(e3, ["a", "c"])
    pertri = (
        tri.select(F.col("a").alias("id"))
        .unionByName(tri.select(F.col("b").alias("id")))
        .unionByName(tri.select(F.col("c").alias("id")))
        .groupBy("id")
        .agg(F.count(F.lit(1)).cast("long").alias("tri"))
    )
    return (
        deg.join(pertri, "id", "left")
        .select(
            "id",
            "degree",
            F.coalesce("tri", F.lit(0)).cast("long").alias("n_triangles"),
            F.expr(
                "CAST(CASE WHEN degree >= 2 THEN"
                " round(1000.0 * (2 * coalesce(tri, 0))"
                " / (CAST(degree AS DOUBLE) * (degree - 1)))"
                " ELSE 0 END AS BIGINT)"
            ).alias("cc_milli"),
        )
        .orderBy("id")
    )
