"""Connected components by iterative min-label propagation.

The engine's union-find analog for dedup clustering: the near-dup pair
list (n-gram Jaccard q42, MinHash-LSH q44, embedding LSH q49) is an edge
list; the canonical document per duplicate cluster is the minimum doc_id
in the connected component — the same "canonical = min id" rule as the
exact-dedup operator (q40).

Also the graph layer for the reference's bond network
(``/root/reference/UniaxialCompressionTest/MLSBond.dat`` edge list;
adjacency self-joins SURVEY §2.3 J2): component labeling over spring
bonds identifies fractured fragments after bond breakage.

Two interchangeable algorithms:

- :func:`connected_components` — min-label propagation. Rounds = graph
  diameter (dup clusters and grain fragments are small-diameter, so a
  handful). Each round is one shuffle (edge join + min agg); lineage is
  truncated with lazy ``localCheckpoint`` and TWO rounds share one
  convergence-count job (the same iterative-loop discipline as Lloyd,
  SURVEY §4).
- :func:`connected_components_star` — the large-star/small-star
  edge-rewriting algorithm (Kiveris et al., "Connected Components in
  MapReduce and Beyond", SoCC'14 — public algorithm): alternately hook
  every larger neighbor (large-star) / every smaller neighbor
  (small-star) of each node to the minimum of its closed neighborhood,
  until the edge set is a stable star forest. Converges in O(log² n)
  rounds regardless of diameter — the 100 TB path for adversarial
  long-chain graphs, where propagation's diameter-many rounds stall
  (measured: 200-node path graph = 200 propagation rounds vs ~5 star
  rounds; equivalence property-tested).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components_star(
    nodes: DataFrame,
    edges: DataFrame,
    id_col: str = "id",
    src_col: str = "src",
    dst_col: str = "dst",
    max_iter: int = 40,
) -> DataFrame:
    """Large-star/small-star connected components: O(log² n) rounds.

    Same contract as :func:`connected_components` — returns
    ``DataFrame[id, component]`` with component = min reachable id;
    isolated nodes keep their own id.
    """
    und = (
        edges.select(F.col(src_col).alias("u"), F.col(dst_col).alias("v"))
        .union(
            edges.select(
                F.col(dst_col).alias("u"), F.col(src_col).alias("v")
            )
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint(eager=False)
    )

    def closed_min(e: DataFrame) -> DataFrame:
        # m(u) = min over Γ(u) ∪ {u}
        return e.groupBy("u").agg(
            F.least(F.min("v"), F.first("u")).alias("m")
        )

    for _ in range(max_iter):
        # large-star: hook every neighbor v > u onto m(u)
        m = closed_min(und)
        large = (
            und.filter(F.col("v") > F.col("u"))
            .join(m, "u")
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
        )
        kept = und.filter(F.col("v") <= F.col("u"))
        e1 = (
            large.union(kept)
            .filter(F.col("u") != F.col("v"))
            .distinct()
            .localCheckpoint(eager=False)
        )
        # small-star: over edges directed high→low, hook every neighbor
        # (and u itself) onto the closed-neighborhood min
        lo = e1.select(
            F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
        ).distinct()
        m2 = closed_min(lo)
        small = (
            lo.select("u", "v")
            .unionByName(lo.select(F.col("u").alias("u"), F.col("u").alias("v")))
            .distinct()
            .join(m2, "u")
            .filter(F.col("v") != F.col("m"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .distinct()
            .localCheckpoint(eager=False)
        )
        # converged when the (undirected) edge set is unchanged
        new_und = (
            small.union(small.select(F.col("v").alias("u"), F.col("u").alias("v")))
            .filter(F.col("u") != F.col("v"))
            .distinct()
            .localCheckpoint(eager=False)
        )
        # one convergence job per round, not two eager checkpoints plus
        # two counts: the union of the two limit-1 probes materializes
        # every lazy checkpoint above as a side effect (r16, guide §1.2)
        diff = (
            new_und.exceptAll(und)
            .limit(1)
            .union(und.exceptAll(new_und).limit(1))
            .count()
        )
        und = new_und
        if diff == 0:
            break
    else:
        raise RuntimeError(
            f"connected_components_star did not stabilize in {max_iter} "
            "rounds"
        )

    comp = und.groupBy(F.col("u").alias("id")).agg(
        F.least(F.min("v"), F.first("u")).alias("component")
    )
    return (
        nodes.select(F.col(id_col).alias("id"))
        .join(comp, "id", "left")
        .select(
            "id", F.coalesce("component", F.col("id")).alias("component")
        )
    )


def propagation_round(und: DataFrame, labels: DataFrame) -> DataFrame:
    """One min-label propagation round (the loop body, lazily built).

    One shuffle: edge join + min agg; the left join back to labels is
    key-co-partitioned with the agg. Exposed separately so the captured
    per-round plan (PLANS.md q56) shows the shape the loop repeats.
    """
    neigh = (
        und.join(labels, und.u == labels.id)
        .groupBy(F.col("v").alias("id"))
        .agg(F.min("component").alias("nmin"))
    )
    return labels.join(neigh, "id", "left").select(
        "id",
        F.least(F.col("component"), F.coalesce("nmin", "component")).alias(
            "component"
        ),
        (F.coalesce("nmin", "component") < F.col("component")).alias("__chg"),
    )


def connected_components(
    nodes: DataFrame,
    edges: DataFrame,
    id_col: str = "id",
    src_col: str = "src",
    dst_col: str = "dst",
    max_iter: int = 25,
) -> DataFrame:
    """Label every node with the min node id reachable from it.

    Returns ``DataFrame[id, component]``. Deterministic; isolated nodes
    keep their own id as component.
    """
    und = edges.select(
        F.col(src_col).alias("u"), F.col(dst_col).alias("v")
    ).union(edges.select(F.col(dst_col).alias("u"), F.col(src_col).alias("v")))
    # NOTE (r15 optimization round, measured and rejected): hash-
    # partitioning und by the join key here (repartition("u")) to let
    # the per-round join reuse the partitioning made q56 ~0.6 s SLOWER
    # at sf0.1 — the per-round label join is a BROADCAST join (labels
    # are one row per node), so und is never shuffled per round and the
    # repartition is a pure extra exchange. At a scale where labels
    # outgrow the broadcast threshold, AQE picks the shuffle plan and
    # the pre-partition becomes the right call — revisit then.
    und = und.distinct().localCheckpoint(eager=False)

    labels = nodes.select(
        F.col(id_col).alias("id"), F.col(id_col).alias("component")
    )
    changed = 0
    # TWO propagation rounds per materialization + LAZY checkpoints
    # (r16, guide §2.4/§5): the old loop paid 2 jobs per round (eager
    # checkpoint + convergence count); now ONE count job drives two
    # rounds — the count materializes both cache-backed checkpoints.
    # Convergence stays exact: if the SECOND round changed nothing, its
    # input was already a fixpoint (propagation is a deterministic
    # function of the labels), and labels == that fixpoint.
    for _ in range(max_iter):
        mid = (
            propagation_round(und, labels)
            .drop("__chg")
            .localCheckpoint(eager=False)
        )
        new_labels = propagation_round(und, mid).localCheckpoint(
            eager=False
        )
        changed = new_labels.filter(F.col("__chg")).count()
        labels = new_labels.drop("__chg")
        if changed == 0:
            break
    if changed:
        # Partially-propagated labels are silently wrong (the oracle's
        # recursive CTE computes the true closure) — fail loudly instead.
        raise RuntimeError(
            f"connected_components did not converge in {2 * max_iter} "
            f"propagation rounds ({changed} labels still changing); graph "
            "diameter exceeds the round budget — raise max_iter or switch "
            "to the large-star/small-star rewrite for adversarial-diameter "
            "graphs"
        )
    return labels
