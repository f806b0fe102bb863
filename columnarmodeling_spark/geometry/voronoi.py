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
# voronoi_cells additionally emits a per-cell exactness certificate and
# the squared max seed→vertex distance its repair radius derives from
CELL_CERT_SCHEMA = CELL_SCHEMA + ", certified boolean, r2max double"


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
    """Bounded Voronoi cell of (sx, sy) against neighbor seeds (ox, oy).

    Neighbors are processed nearest-first with the standard security
    cutoff: a neighbor at squared distance d² clips the current polygon
    only if d ≤ 2·r_max (its bisector lies at d/2 from the seed), so
    once the next candidate exceeds twice the current max seed→vertex
    distance no later one can matter. This turns the per-cell cost from
    O(#candidates) clips into O(actual Delaunay degree) clips + one
    argsort — the difference between seconds and hours when a cell is
    rebuilt against the full seed set (voronoi_cells_verified) or the
    halo is dense."""
    xs = [0.0, width, width, 0.0]
    ys = [0.0, 0.0, height, height]
    d2 = (ox - sx) ** 2 + (oy - sy) ** 2
    order = np.argsort(d2)
    r2max = max((vx - sx) ** 2 + (vy - sy) ** 2 for vx, vy in zip(xs, ys))
    for j in order:
        if d2[j] > 4.0 * r2max:
            break  # bisector cannot reach the cell; neither can any later
        a, b = ox[j] - sx, oy[j] - sy
        if a == 0.0 and b == 0.0:
            continue
        c = (ox[j] ** 2 + oy[j] ** 2 - sx**2 - sy**2) / 2.0
        new_xs, new_ys = _clip_halfplane(xs, ys, a, b, c)
        if len(new_xs) < 3:
            return [], [], 0.0, 0.0, 0.0
        if len(new_xs) != len(xs) or new_xs != xs or new_ys != ys:
            xs, ys = new_xs, new_ys
            r2max = max(
                (vx - sx) ** 2 + (vy - sy) ** 2 for vx, vy in zip(xs, ys)
            )
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
    contains every seed that can shape a home cell. Seeds must be
    distinct points — exactly coincident seeds each receive the full
    shared cell (the standard Voronoi degeneracy; dedup first if the
    source can repeat coordinates), which q106-style Σarea invariants
    flag loudly.
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
            # Exactness certificate: a neighbor at distance d clips the
            # cell only if its bisector (at d/2 from the seed) crosses
            # it, i.e. d ≤ 2·r where r is the max seed→vertex distance
            # of the (superset) computed cell. The one-tile halo covers
            # every seed within distance tile_size of the home tile, so
            # 2·r ≤ tile_size proves no clipping neighbor was missed.
            # Conservative: boundary-box-clipped cells may be exact yet
            # uncertified — the verified wrapper just re-checks them.
            if len(xs):
                r2 = max(
                    (vx - sx) ** 2 + (vy - sy) ** 2 for vx, vy in zip(xs, ys)
                )
                certified = 4.0 * r2 <= tile_size * tile_size
            else:
                r2 = 0.0
                certified = True  # degenerate cell: nothing to repair
            rows.append(
                {
                    "grain_id": gid,
                    "cx": cx,
                    "cy": cy,
                    "area": area,
                    "n_vertices": len(xs),
                    "xs": list(xs),
                    "ys": list(ys),
                    "certified": certified,
                    "r2max": float(r2),
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
                "certified",
                "r2max",
            ],
        )

    return exploded.groupBy("htx", "hty").applyInPandas(
        lambda _, pdf: build(pdf), schema=CELL_CERT_SCHEMA
    )


def voronoi_cells_verified(
    seeds: DataFrame,
    width: float,
    height: float,
    tile_size: float | None = None,
    id_col: str = "id",
    x_col: str = "x",
    y_col: str = "y",
) -> DataFrame:
    """Voronoi cells with the halo invariant *verified*, not assumed.

    ``adaptive_tile`` sizes the tile for ~uniform seed density; skewed
    scatters (striped, clustered — measured in tools/geometry_scale.py)
    can still contain cells wider than c·pitch, which the fixed-tile
    build silently mis-tessellates (a too-small halo can only *miss*
    bisector clips, so every wrong cell is a strict superset of the
    true cell). Each cell therefore carries an exactness certificate
    from the build (2·r_max ≤ tile — see ``voronoi_cells``), and only
    the uncertified cells are repaired. The repair is itself bounded:
    every seed that can clip a suspect's cell lies within 2·r_max of
    its seed (the same security-radius argument the certificate uses),
    so each suspect joins only the tile ring covering its 2·r_max
    disk — an equi-join on the tile key whose output volume is the true
    candidate volume Σ_i O(r_i²·density), never an S·K cross product.
    Steady-state cost when the density heuristic holds is zero (the
    certificate rides the build); skewed scatters repair a few cells;
    a pathological all-suspect scatter degrades to the exact
    computation it needs anyway, tile ring by tile ring.
    """
    # Pin the seed scatter once: this function re-reads the seeds plan
    # in three subtrees (build, suspect lookup, repair ring join), and a
    # non-deterministic plan (e.g. unseeded rand() jitter) would hand
    # the repair different positions than the build saw, silently
    # producing an inconsistent tessellation (round-5 ADVICE).
    seeds = seeds.localCheckpoint()
    if tile_size is None:
        tile_size = adaptive_tile(width, height, seeds.count())
    cells = voronoi_cells(
        seeds, width, height, tile_size, id_col=id_col, x_col=x_col,
        y_col=y_col,
    ).localCheckpoint()
    suspects = cells.filter(~F.col("certified")).select("grain_id", "r2max")
    if suspects.isEmpty():
        return cells.drop("certified", "r2max")

    # suspect seeds with their repair reach (2·r_max, grazing margin)
    sus_seeds = (
        seeds.join(
            suspects,
            seeds[id_col] == suspects["grain_id"],
        )
        .select(
            F.col(id_col).alias("sid"),
            F.col(x_col).alias("ssx"),
            F.col(y_col).alias("ssy"),
            (2.0000001 * F.sqrt("r2max")).alias("reach"),
        )
    )
    # every tile the suspect's reach-disk touches (bounded explode)
    sus_tiles = sus_seeds.select(
        "sid",
        "ssx",
        "ssy",
        "reach",
        F.explode(
            F.sequence(
                F.floor((F.col("ssx") - F.col("reach")) / tile_size),
                F.floor((F.col("ssx") + F.col("reach")) / tile_size),
            )
        ).alias("tx"),
    ).select(
        "sid",
        "ssx",
        "ssy",
        "tx",
        F.explode(
            F.sequence(
                F.floor((F.col("ssy") - F.col("reach")) / tile_size),
                F.floor((F.col("ssy") + F.col("reach")) / tile_size),
            )
        ).alias("ty"),
    )
    binned = seeds.select(
        F.col(x_col).alias("ox"),
        F.col(y_col).alias("oy"),
        F.floor(F.col(x_col) / tile_size).cast("long").alias("tx"),
        F.floor(F.col(y_col) / tile_size).cast("long").alias("ty"),
    )
    # no broadcast hint: the suspect tile list is tiny when the density
    # heuristic nearly holds but can be large on adversarial scatters —
    # AQE picks broadcast vs shuffle from the actual size
    paired = binned.join(sus_tiles, ["tx", "ty"]).select(
        "sid", "ssx", "ssy", "ox", "oy"
    )

    def rebuild(pdf: pd.DataFrame) -> pd.DataFrame:
        sid = int(pdf["sid"].iloc[0])
        sx = float(pdf["ssx"].iloc[0])
        sy = float(pdf["ssy"].iloc[0])
        ox = pdf["ox"].to_numpy()
        oy = pdf["oy"].to_numpy()
        others = ~((ox == sx) & (oy == sy))
        xs, ys, area, cx, cy = _cell_for_seed(
            sx, sy, ox[others], oy[others], width, height
        )
        return pd.DataFrame(
            [
                {
                    "grain_id": sid,
                    "cx": cx,
                    "cy": cy,
                    "area": area,
                    "n_vertices": len(xs),
                    "xs": list(xs),
                    "ys": list(ys),
                }
            ]
        )

    repaired = paired.groupBy("sid").applyInPandas(
        lambda _, pdf: rebuild(pdf), schema=CELL_SCHEMA
    )
    return (
        cells.filter("certified")
        .drop("certified", "r2max")
        .unionByName(repaired)
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
        cells = voronoi_cells_verified(cur, width, height, tile_size)
        cur = cells.select(
            F.col("grain_id").alias("id"),
            F.col("cx").alias("x"),
            F.col("cy").alias("y"),
        ).localCheckpoint()
    return cur
