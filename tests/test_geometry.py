"""Property tests for the geometry tier (SURVEY §5: clip area ≤ cell
area, tessellation covers the domain, facet count = Σ ring vertices,
determinism under fixed seeds)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from columnarmodeling_spark.geometry.pipeline import generate_columnar_mesh
from columnarmodeling_spark.geometry.voronoi import (
    _cell_for_seed,
    voronoi_cells,
)

W_, H_, D_ = 100.0, 100.0, 25.0


@pytest.fixture(scope="module")
def seeds(spark):
    rng = np.random.RandomState(42)
    pts = rng.uniform(2, 98, size=(40, 2))
    return spark.createDataFrame(
        [(i, float(x), float(y)) for i, (x, y) in enumerate(pts)],
        "id LONG, x DOUBLE, y DOUBLE",
    )


def test_cells_partition_domain(spark, seeds):
    cells = voronoi_cells(seeds, W_, H_, tile_size=50.0)
    rows = cells.collect()
    assert len(rows) == 40
    total_area = sum(r["area"] for r in rows)
    # Voronoi cells clipped to the box partition it exactly
    assert abs(total_area - W_ * H_) < 1e-6
    for r in rows:
        assert r["n_vertices"] >= 3
        assert all(-1e-9 <= x <= W_ + 1e-9 for x in r["xs"])
        assert all(-1e-9 <= y <= H_ + 1e-9 for y in r["ys"])


def test_cell_kernel_square():
    # 4 symmetric seeds in a unit-ish box → equal quarter cells
    ox = np.array([3.0, 1.0, 3.0])
    oy = np.array([1.0, 3.0, 3.0])
    xs, ys, area, cx, cy = _cell_for_seed(1.0, 1.0, ox, oy, 4.0, 4.0)
    assert abs(area - 4.0) < 1e-9  # quarter of the 4x4 box
    assert abs(cx - 1.0) < 1e-9 and abs(cy - 1.0) < 1e-9


def test_mesh_pipeline_properties(spark, seeds):
    grains, facets = generate_columnar_mesh(
        spark, seeds, W_, H_, D_, lloyd_iters=1, select_quota=5
    )
    g = grains.collect()
    assert len(g) == 40
    assert any(r["is_boundary"] for r in g)
    assert sum(1 for r in g if r["selected"]) <= 5
    # selected grains are interior only
    assert all(not r["is_boundary"] for r in g if r["selected"])

    # facet count per grain == ring length (J8 wraparound)
    fc = {
        r["grain_id"]: r["n"]
        for r in facets.groupBy("grain_id").agg(F.count("*").alias("n")).collect()
    }
    nv = {r["grain_id"]: r["n_vertices"] for r in g}
    assert fc == {k: v for k, v in nv.items()}


def test_lloyd_determinism(spark, seeds):
    a = voronoi_cells(seeds, W_, H_, 50.0).orderBy("grain_id").collect()
    b = voronoi_cells(seeds, W_, H_, 50.0).orderBy("grain_id").collect()
    assert [(r["grain_id"], r["area"]) for r in a] == [
        (r["grain_id"], r["area"]) for r in b
    ]
