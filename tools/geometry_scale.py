"""Measure Voronoi cell-build scaling under the density-adaptive tile.

For K seeds in a fixed W×H domain, ``adaptive_tile`` shrinks the tile
as ~3·sqrt(W·H/K), so the tile count grows linearly with K and the
per-tile O(#home × #halo) bisector work stays bounded. The scatter
here is deliberately adversarial — 8 seed stripes with 20-unit empty
gaps, hash-jittered so seeds are distinct points — and beats the
uniform-density heuristic badly: the raw ``voronoi_cells`` measures
Σarea 450 718 vs the 40 000 domain at K=100k (gap-bridging cells are
~10× wider than the density pitch). The verified
build (``voronoi_cells_verified``) repairs every cell whose exactness
certificate fails (2·r_max > tile) via a bounded tile-ring rebuild, so
this tool both measures cost and proves the partition invariant
(Σ cell area = W·H) at every K.

Usage: python tools/geometry_scale.py [K ...]   (default 1000 10000 100000)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from columnarmodeling_spark.geometry.voronoi import (  # noqa: E402
    adaptive_tile,
    voronoi_cells_verified,
)
from columnarmodeling_spark.session import get_spark  # noqa: E402

W = H = 200.0


def seeds_df(spark, k: int):
    # Deterministic ADVERSARIAL scatter: 8 vertical stripes of width 4
    # with 20-wide empty gaps (cells bridging a gap are far wider than
    # the uniform-density pitch → uncertified → repair path), hash-based
    # jitter so seeds are distinct points (a multiplicative lattice
    # collides: x(id) has period 19800, which double-counts cells and
    # makes Σarea = W·H unattainable by ANY tessellation).
    u1 = F.pmod(F.xxhash64(F.col("id"), F.lit(1)), F.lit(1000000007)) / 1e9
    u2 = F.pmod(F.xxhash64(F.col("id"), F.lit(2)), F.lit(1000000007)) / 1e9
    stripe = F.pmod(F.xxhash64(F.col("id"), F.lit(3)), F.lit(8))
    return spark.range(k).select(
        F.col("id"),
        (2.0 + stripe * 24.0 + u1 * 4.0).alias("x"),
        (u2 * (H - 2.0) + 1.0).alias("y"),
    )


def main() -> None:
    ks = [int(a) for a in sys.argv[1:]] or [1_000, 10_000, 100_000]
    spark = get_spark("geometry-scale")
    spark.sparkContext.setLogLevel("ERROR")
    print(f"{'K':>8} {'tile':>8} {'n_tiles':>8} {'sec':>7}  Σarea (want {W*H:.0f})")
    for k in ks:
        seeds = seeds_df(spark, k).cache()
        seeds.count()
        tile = adaptive_tile(W, H, k)
        n_tiles = int((W // tile + 1) * (H // tile + 1))
        # warm pass untimed (codegen/Arrow), then timed steady-state
        voronoi_cells_verified(seeds, W, H, tile).agg(F.sum("area")).collect()
        t0 = time.perf_counter()
        total = voronoi_cells_verified(seeds, W, H, tile).agg(
            F.sum("area").alias("a")
        ).collect()[0]["a"]
        dt = time.perf_counter() - t0
        ok = abs(total - W * H) < 1e-6 * W * H
        print(
            f"{k:>8} {tile:>8.2f} {n_tiles:>8} {dt:>7.2f}  "
            f"{total:.4f} {'OK' if ok else 'VIOLATED'}",
            flush=True,
        )
        seeds.unpersist()
    spark.stop()


if __name__ == "__main__":
    main()
