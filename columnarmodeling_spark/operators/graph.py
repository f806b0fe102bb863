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

Algorithm: start label = own id; per round, every node takes the min of
its label and its neighbors' labels; stop when no label changes. Rounds
needed = graph diameter (dup clusters and grain fragments are
small-diameter, so a handful). Each round is one shuffle (edge join +
min agg); lineage is truncated per round with ``localCheckpoint`` (the
same iterative-loop discipline as Lloyd, SURVEY §4). At the 100 TB tier
with adversarial long-chain graphs, swap the propagation body for the
large-star/small-star rewrite (Kiveris et al.) — same driver loop, same
convergence test, fewer rounds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


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
    und = und.distinct().localCheckpoint(eager=False)

    labels = nodes.select(
        F.col(id_col).alias("id"), F.col(id_col).alias("component")
    )
    changed = 0
    for _ in range(max_iter):
        neigh = (
            und.join(labels, und.u == labels.id)
            .groupBy(F.col("v").alias("id"))
            .agg(F.min("component").alias("nmin"))
        )
        new_labels = (
            labels.join(neigh, "id", "left")
            .select(
                "id",
                F.least(
                    F.col("component"), F.coalesce("nmin", "component")
                ).alias("component"),
                (F.coalesce("nmin", "component") < F.col("component")).alias(
                    "__chg"
                ),
            )
        ).localCheckpoint()  # eager: truncate lineage, reuse for test+next round
        changed = new_labels.filter(F.col("__chg")).count()
        labels = new_labels.drop("__chg")
        if changed == 0:
            break
    if changed:
        # Partially-propagated labels are silently wrong (the oracle's
        # recursive CTE computes the true closure) — fail loudly instead.
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds "
            f"({changed} labels still changing); graph diameter exceeds "
            "max_iter — raise max_iter or switch to the large-star/"
            "small-star rewrite for adversarial-diameter graphs"
        )
    return labels
