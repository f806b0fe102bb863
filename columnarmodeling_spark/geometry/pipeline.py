"""End-to-end mesh-generation pipeline (SURVEY §3 E1, re-expressed
Spark-first): seeds → Lloyd relaxation → bounded Voronoi grains →
boundary classification (P1) → two-layer greedy selection (W4) →
shrink-toward-centroid (P7/P6) → prism extrusion + side facets (J8/W1).

Deviations from the reference, by design (SURVEY §4): mirror-union →
direct box clipping (same observable cells); random.shuffle → md5
ordering (engine-independent determinism); O(n²) global bisector scan →
tile+halo locality.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from columnarmodeling_spark.geometry.extrude import (
    shrink_toward_centroid,
    side_facets,
)
from columnarmodeling_spark.geometry.voronoi import (
    adaptive_tile,
    lloyd_relax,
    voronoi_cells_verified,
)
from columnarmodeling_spark.operators.selection import greedy_disjoint_select


def generate_columnar_mesh(
    spark: SparkSession,
    seeds: DataFrame,
    width: float,
    height: float,
    depth: float,
    lloyd_iters: int = 2,
    boundary_tol: float = 1.0,
    select_quota: int = 10,
    shrink_scale: float = 0.85,
) -> tuple[DataFrame, DataFrame]:
    """Returns (grains, facets).

    grains: grain_id, cx, cy, area, n_vertices, is_boundary, selected
    facets: grain_id, facet_pos, p1..p4 (struct<x,y,z>)
    """
    # Tile from seed density, not domain size: a fixed max(W,H)/4 tile
    # violates the halo invariant when seeds are sparse (cells wider
    # than the tile → overlapping tessellation). One cheap count();
    # the verified build then repairs any cell whose per-cell exactness
    # certificate fails (2·r_max > tile) via a bounded tile-ring
    # rebuild, so skewed scatters that beat the density heuristic still
    # tessellate exactly (tools/geometry_scale.py measures such shapes).
    tile = adaptive_tile(width, height, seeds.count())
    relaxed = lloyd_relax(seeds, width, height, tile, lloyd_iters)
    cells = voronoi_cells_verified(relaxed, width, height, tile).filter(
        F.col("n_vertices") >= 3
    )

    # P1 boundary classification: any vertex within tol of the domain edge
    touches = lambda v: (  # noqa: E731
        (v <= boundary_tol) | (v >= width - boundary_tol)
    )
    cells = cells.withColumn(
        "is_boundary",
        F.exists("xs", touches)
        | F.exists(
            "ys",
            lambda v: (v <= boundary_tol) | (v >= height - boundary_tol),
        ),
    ).localCheckpoint()

    # W4 greedy selection on interior grains, md5-deterministic order,
    # disjoint on rounded shared-vertex keys (grains sharing an edge
    # share rounded vertex keys — the node-set analog)
    cand = (
        cells.filter(~F.col("is_boundary"))
        .select(
            "grain_id",
            F.md5(F.col("grain_id").cast("string")).alias("ord"),
            F.transform(
                F.arrays_zip("xs", "ys"),
                lambda v: F.concat_ws(
                    ":",
                    F.round(v["xs"], 4).cast("string"),
                    F.round(v["ys"], 4).cast("string"),
                ),
            ).alias("vkeys"),
        )
    )
    chosen = greedy_disjoint_select(
        cand, order_col="ord", id_col="grain_id", key_set_col="vkeys", quota=select_quota
    )
    chosen_df = F.broadcast(
        spark.createDataFrame([(int(c),) for c in chosen] or [(-1,)], "grain_id LONG")
        .withColumn("selected", F.lit(True))
    )
    grains = cells.join(chosen_df, "grain_id", "left").withColumn(
        "selected", F.coalesce("selected", F.lit(False))
    )

    # P6 clamp + P7 shrink on selected grains only
    scale = F.when(F.col("selected"), F.lit(shrink_scale)).otherwise(F.lit(1.0))
    shrunk = shrink_toward_centroid(grains, F.greatest(F.lit(0.01), scale))

    facets = side_facets(shrunk, F.lit(depth))
    return (
        grains.select(
            "grain_id", "cx", "cy", "area", "n_vertices", "is_boundary", "selected"
        ),
        facets,
    )
