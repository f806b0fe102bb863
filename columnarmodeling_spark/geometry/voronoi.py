"""Distributed bounded-Voronoi tessellation + Lloyd relaxation
(SURVEY §3 E1: ``GenerateColumnar.py:61-160`` — seed points → mirror
union → Voronoi → per-cell clip + centroid → move points, ×N iterations).

No SciPy/qhull in this environment, so the cell construction is pure
numpy: each seed's bounded cell is the domain box clipped by the
perpendicular-bisector half-plane against every nearby seed
(Sutherland–Hodgman). The reference's mirror-union trick
(``GenerateColumnar.py:80-86``) made unbounded cells finite; clipping
against the domain box achieves the same observable cells directly.

Scale story: cells are local — a seed's cell is determined by seeds
within twice the largest cell radius. Seeds are binned into tiles; each
tile's cells are built inside one ``applyInPandas`` group from its home
seeds plus a one-tile halo (same bin-explode shape as the J1 proximity
join). ``tile_size`` must exceed the largest cell diameter (documented
invariant — with K seeds uniform in W×H, cells are ~sqrt(WH/K) across).
The O(#home × #halo) bisector work is per-tile, not global O(n²).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

CELL_SCHEMA = (
    "grain_id long, cx double, cy double, area double, n_vertices int, "
    "xs array<double>, ys array<double>"
)


def adaptive_tile(
    width: float, height: float, n_seeds: int, c: float = 3.0
) -> float:
    """Tile size satisfying the locality invariant at any seed density.

    The invariant (``voronoi_cells``): tile_size > max cell diameter,
    else true bisector neighbors fall outside the one-tile halo and
    cells overlap. With K seeds ~uniform in W×H the expected cell pitch
    is sqrt(W·H/K); ``c`` covers size dispersion (c=3 bounds the largest
    cell of a uniform/Lloyd-relaxed tessellation with wide margin —
    validated by the q106 Σarea=W·H invariant at sf0.001 and sf0.01).
    Sparse seedings degrade to one global tile (tile ≥ max(W, H) puts
    every seed in bin 0 — correct, just not parallel); dense seedings
    get tiles ~c·pitch, so tile count grows linearly with K and the
    per-tile O(#home × #halo) bisector work stays bounded — the 100 TB
    path.
    """
    if n_seeds <= 0:
        return max(width, height)
    tile = c * float(np.sqrt(width * height / n_seeds))
    return min(max(tile, 1e-9), max(width, height))


def _clip_halfplane(xs, ys, a, b, c):
    """Keep the region a*x + b*y <= c of polygon (xs, ys)."""
    out_x, out_y = [], []
    n = len(xs)
    for k in range(n):
        px, py = xs[k], ys[k]
        qx, qy = xs[(k + 1) % n], ys[(k + 1) % n]
        pv, qv = a * px + b * py - c, a * qx + b * qy - c
        if pv <= 0:
            out_x.append(px)
            out_y.append(py)
        if (pv <= 0) != (qv <= 0):
            t = pv / (pv - qv)
            out_x.append(px + t * (qx - px))
            out_y.append(py + t * (qy - py))
    return out_x, out_y


def _cell_for_seed(sx, sy, ox, oy, width, height):
    """Bounded Voronoi cell of (sx, sy) against neighbor seeds (ox, oy)."""
    xs = [0.0, width, width, 0.0]
    ys = [0.0, 0.0, height, height]
    order = np.argsort((ox - sx) ** 2 + (oy - sy) ** 2)
    for j in order:
        a, b = ox[j] - sx, oy[j] - sy
        if a == 0.0 and b == 0.0:
            continue
        c = (ox[j] ** 2 + oy[j] ** 2 - sx**2 - sy**2) / 2.0
        xs, ys = _clip_halfplane(xs, ys, a, b, c)
        if len(xs) < 3:
            return [], [], 0.0, 0.0, 0.0
    arr_x, arr_y = np.asarray(xs), np.asarray(ys)
    x2, y2 = np.roll(arr_x, -1), np.roll(arr_y, -1)
    cross = arr_x * y2 - x2 * arr_y
    area = cross.sum() / 2.0
    if abs(area) < 1e-12:
        return xs, ys, 0.0, sx, sy
    cx = ((arr_x + x2) * cross).sum() / (6.0 * area)
    cy = ((arr_y + y2) * cross).sum() / (6.0 * area)
    return xs, ys, abs(area), cx, cy


def voronoi_cells(
    seeds: DataFrame,
    width: float,
    height: float,
    tile_size: float,
    id_col: str = "id",
    x_col: str = "x",
    y_col: str = "y",
) -> DataFrame:
    """Bounded Voronoi cells for every seed, distributed by spatial tile.

    Invariant: ``tile_size`` > max cell diameter, so the one-tile halo
    contains every seed that can shape a home cell.
    """
    base = seeds.select(
        F.col(id_col).alias("gid"),
        F.col(x_col).alias("sx"),
        F.col(y_col).alias("sy"),
        F.floor(F.col(x_col) / tile_size).cast("long").alias("tx"),
        F.floor(F.col(y_col) / tile_size).cast("long").alias("ty"),
    )
    offsets = F.array(
        *[
            F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
            for dx in (-1, 0, 1)
            for dy in (-1, 0, 1)
        ]
    )
    # every seed is shipped to its own tile (home) and its 8 neighbors (halo)
    exploded = base.select(
        "gid",
        "sx",
        "sy",
        "tx",
        "ty",
        F.explode(offsets).alias("o"),
    ).select(
        "gid",
        "sx",
        "sy",
        (F.col("tx") + F.col("o.dx")).alias("htx"),
        (F.col("ty") + F.col("o.dy")).alias("hty"),
        ((F.col("o.dx") == 0) & (F.col("o.dy") == 0)).alias("is_home"),
    )

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        all_x = pdf["sx"].to_numpy()
        all_y = pdf["sy"].to_numpy()
        rows = []
        home = pdf[pdf["is_home"]]
        for gid, sx, sy in zip(home["gid"], home["sx"], home["sy"]):
            others = ~((all_x == sx) & (all_y == sy))
            xs, ys, area, cx, cy = _cell_for_seed(
                sx, sy, all_x[others], all_y[others], width, height
            )
            rows.append(
                {
                    "grain_id": gid,
                    "cx": cx,
                    "cy": cy,
                    "area": area,
                    "n_vertices": len(xs),
                    "xs": list(xs),
                    "ys": list(ys),
                }
            )
        return pd.DataFrame(
            rows,
            columns=[
                "grain_id",
                "cx",
                "cy",
                "area",
                "n_vertices",
                "xs",
                "ys",
            ],
        )

    return exploded.groupBy("htx", "hty").applyInPandas(
        lambda _, pdf: build(pdf), schema=CELL_SCHEMA
    )


def lloyd_relax(
    seeds: DataFrame,
    width: float,
    height: float,
    tile_size: float,
    iterations: int,
) -> DataFrame:
    """Lloyd's algorithm: move every seed to its cell centroid, ×N.

    Driver loop over distributed iterations; ``localCheckpoint`` per
    pass truncates the growing lineage (SURVEY §4: iterative-loop
    lineage blowup).
    """
    cur = seeds
    for _ in range(iterations):
        cells = voronoi_cells(cur, width, height, tile_size)
        cur = cells.select(
            F.col("grain_id").alias("id"),
            F.col("cx").alias("x"),
            F.col("cy").alias("y"),
        ).localCheckpoint()
    return cur
