"""Geometry-tier queries (SURVEY §3 E1): distributed Voronoi mesh
generation and facet extrusion, driven from deterministic seeds derived
from the supplier table.

Iterative geometric kernels are not SQL-expressible → rows-only checks;
the exact-semantics evidence is in tests/test_geometry.py (area
conservation, facet-count = Σ ring vertices, boundary classification).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from columnarmodeling_spark.geometry.pipeline import generate_columnar_mesh
from columnarmodeling_spark.queries import register
from columnarmodeling_spark.queries._util import t

_W, _H, _D = 200.0, 200.0, 25.0


def _seeds(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = t(spark, sf_dir, "supplier")
    return s.select(
        F.col("s_suppkey").alias("id"),
        (F.pmod(F.col("s_acctbal"), F.lit(_W - 2.0)) + 1.0).alias("x"),
        (F.pmod(F.col("s_suppkey") * 37.0, F.lit(_H - 2.0)) + 1.0).alias("y"),
    )


@register(
    "q90_voronoi_grains",
    oracle=None,  # iterative geometry — rows-only; properties in tests
    doc="Distributed Lloyd-relaxed bounded Voronoi tessellation "
    "(SURVEY §3 E1: GenerateColumnar.py:61-160). Tile+halo "
    "applyInPandas cells, driver-loop Lloyd with localCheckpoint; "
    "boundary classification via exists() (P1); greedy selection (W4).",
    tags=("geometry", "E1", "pandas-udf", "iterative"),
)
def q90_voronoi_grains(spark: SparkSession, sf_dir: str) -> DataFrame:
    grains, _ = generate_columnar_mesh(
        spark, _seeds(spark, sf_dir), _W, _H, _D, lloyd_iters=2
    )
    return grains.select(
        "grain_id",
        F.round("cx", 6).alias("cx"),
        F.round("cy", 6).alias("cy"),
        F.round("area", 6).alias("area"),
        "n_vertices",
        "is_boundary",
        "selected",
    )


@register(
    "q91_mesh_facets",
    oracle=None,  # depends on q90's geometry — rows-only
    doc="Prism side-facet generation (SURVEY §2.3 J8 / §2.5 W1: "
    "wraparound vertex pairing, GenerateColumnar.py:318-325; "
    "extrusion :225-232). One quad per ring edge; summary stats per "
    "grain (facet count must equal ring length — property-tested).",
    tags=("geometry", "J8", "W1"),
)
def q91_mesh_facets(spark: SparkSession, sf_dir: str) -> DataFrame:
    _, facets = generate_columnar_mesh(
        spark, _seeds(spark, sf_dir), _W, _H, _D, lloyd_iters=1
    )
    edge_len = F.sqrt(
        (F.col("p2.x") - F.col("p1.x")) * (F.col("p2.x") - F.col("p1.x"))
        + (F.col("p2.y") - F.col("p1.y")) * (F.col("p2.y") - F.col("p1.y"))
    )
    return facets.groupBy("grain_id").agg(
        F.count("*").alias("n_facets"),
        F.round(F.sum(edge_len), 6).alias("perimeter"),
    )


@register(
    "q92_clipped_facets",
    oracle=None,  # CAD-cut analog — rows-only; properties in tests
    doc="Boolean-cut join analog (SURVEY §2.3 J7: every face cut against "
    "the specimen solid, BooleanOperation.py:99-125): the FULL cutter "
    "menu of :178-188 — z-slab/box planes, sphere specimen, and the "
    "Brazilian-split z-cylinder — via closed-form Sutherland-Hodgman "
    "(exact quadric edge crossings, chordal boundary) in mapInPandas; "
    "same observable trim as the Rhino _-Split + reject pipeline for "
    "convex cutters, with no CAD kernel and no shuffle "
    "(embarrassingly parallel per facet).",
    tags=("geometry", "J7", "pandas-udf"),
)
def q92_clipped_facets(spark: SparkSession, sf_dir: str) -> DataFrame:
    from columnarmodeling_spark.geometry.clip import (
        clip_facets,
        cylinder_cutters,
        slab_halfspaces,
        sphere_cutter,
    )

    _, facets = generate_columnar_mesh(
        spark, _seeds(spark, sf_dir), _W, _H, _D, lloyd_iters=1
    )
    ring = facets.select(
        "grain_id",
        "facet_pos",
        F.array("p1", "p2", "p3", "p4").alias("vertices"),
    )
    # The reference's three specimen shapes, scaled to our domain: slab
    # (box z-planes), centered sphere, and the Brazilian-split cylinder
    # (base point, radius, height — BooleanOperation.py:183-188).
    menu = {
        "slab": slab_halfspaces(2.0, _D - 2.0),
        "sphere": [sphere_cutter(_W / 2, _H / 2, _D / 2, 70.0)],
        "cylinder": cylinder_cutters(_W / 2, _H / 2, 2.0, 80.0, _D - 4.0),
    }
    zs = F.transform("vertices", lambda v: v["z"])
    out = None
    for kind, cutters in menu.items():
        part = clip_facets(ring, cutters).select(
            F.lit(kind).alias("cutter"),
            "grain_id",
            "facet_pos",
            "nv",
            F.round(
                F.aggregate(zs, F.lit(0.0), lambda a, x: a + x) / F.col("nv"),
                6,
            ).alias("mean_z"),
        )
        out = part if out is None else out.unionByName(part)
    return out
