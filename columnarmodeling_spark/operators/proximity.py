"""Binned proximity (gap) join — the engine's flagship custom join.

The reference builds its bond network by linking every particle pair
whose surface gap is below ``dGap``, using uniform-grid spatial hashing
(``CellSize`` sub-cells of the ``Lx×Ly×Lz`` search box) to avoid the
O(n²) pair scan — semantics documented at
``/root/reference/SysFile.ini:45-55`` (params
``UniaxialCompressionTest/MLS00con.dat:1-3``), output shape
``MLSBond.dat`` (edge list ``src dst type``).

Catalyst will not invent this plan: a naive ``dist(a,b) < eps`` join
predicate becomes a BroadcastNestedLoopJoin (O(n²) compares). We make the
theta join shuffle-friendly:

1. bin every point into an eps-sized grid cell (``floor(coord/eps)``);
2. explode the LEFT side to its 3^d neighbor cells (any pair within eps
   lies in adjacent cells, so each qualifying pair meets in exactly one
   (left-neighbor-cell == right-home-cell) combination — no dedup pass);
3. shuffle-hash equi-join on the cell key (partial aggregation, AQE
   skew-split, and codegen all apply — it's a plain equi-join to Spark);
4. residual filter: exact squared distance (and optional per-point radii
   for the surface-gap form) + ``id_l < id_r`` to keep one row per pair.

Scale behavior at 100 TB: the shuffle is keyed by cell, so density skew
(the reference's "hot central cells") maps to key skew — handled by AQE
skew-join splitting (enabled in session.py); for pathological density the
``salt`` parameter shards each cell key into ``salt`` sub-keys: the right
side hashes each row to one deterministic sub-key, the left side is
replicated across all of them, so every qualifying pair still meets
exactly once while the largest join group shrinks from |L|·|R| to
|L|·|R|/salt rows. Cost is O(n · 3^d · salt + pairs-in-adjacent-cells),
not O(n²).
"""

from __future__ import annotations

from itertools import product

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def grid_proximity_join(
    points: DataFrame,
    eps: float,
    coords: tuple[str, ...] = ("x", "y"),
    id_col: str = "id",
    radius_col: str | None = None,
    keep_cols: tuple[str, ...] = (),
    cell_size: float | None = None,
    salt: int = 1,
) -> DataFrame:
    """All pairs (a, b), a.id < b.id, with dist(a,b) [− r_a − r_b] < eps.

    Returns columns ``src``, ``dst``, ``dist`` plus ``<col>_src`` /
    ``<col>_dst`` for every name in *keep_cols*.

    *cell_size* is the reference's ``CellSize`` knob: the adjacent-cell
    search only finds pairs whose CENTER distance is < cell_size, so it
    must be ≥ the largest qualifying center distance — ``eps`` for plain
    points, ``eps + 2·max(radius)`` for the surface-gap form (two big
    particles can have gap < eps while their centers sit far apart).
    When omitted it is derived (one tiny agg job for the max radius).

    *salt* > 1 enables the skew escape for pathologically dense cells
    (the reference's hot-central-cell case at 100× density, SURVEY §4):
    each right-side row lands in one of ``salt`` deterministic sub-keys
    (``hash(id) mod salt``); the left side is exploded across the full
    salt range, so each qualifying pair still meets exactly once but the
    biggest shuffle group is ``salt``× smaller. Output is identical to
    the unsalted join for any salt value.
    """
    dims = len(coords)
    if cell_size is None:
        if radius_col is None:
            cell_size = float(eps)
        else:
            max_r = points.agg(F.max(radius_col)).collect()[0][0] or 0.0
            cell_size = float(eps) + 2.0 * float(max_r)
    cells = [
        F.floor(F.col(c) / F.lit(float(cell_size))).cast("long") for c in coords
    ]
    base = points.select(
        F.col(id_col).alias("__id"),
        *[F.col(c).alias(f"__c{i}") for i, c in enumerate(coords)],
        *([F.col(radius_col).alias("__r")] if radius_col else []),
        *[F.col(c) for c in keep_cols],
        *[cell.alias(f"__cell{i}") for i, cell in enumerate(cells)],
    )

    offsets = list(product((-1, 0, 1), repeat=dims))
    offset_arr = F.array(
        *[
            F.struct(*[F.lit(o[i]).alias(f"d{i}") for i in range(dims)])
            for o in offsets
        ]
    )
    left = base.select(
        *[F.col(c) for c in base.columns if not c.startswith("__cell")],
        F.explode(offset_arr).alias("__off"),
        *[F.col(f"__cell{i}") for i in range(dims)],
    ).select(
        *[F.col(c) for c in base.columns if not c.startswith("__cell")],
        *[
            (F.col(f"__cell{i}") + F.col(f"__off.d{i}")).alias(f"__cell{i}")
            for i in range(dims)
        ],
    )

    def side(df: DataFrame, tag: str) -> DataFrame:
        renames = {"__id": f"id_{tag}"}
        renames.update({f"__c{i}": f"c{i}_{tag}" for i in range(dims)})
        if radius_col:
            renames["__r"] = f"r_{tag}"
        renames.update({c: f"{c}_{tag}" for c in keep_cols})
        out = df
        for old, new in renames.items():
            out = out.withColumnRenamed(old, new)
        return out

    l = side(left, "src")
    r = side(base, "dst")
    join_keys = [f"__cell{i}" for i in range(dims)]
    if salt > 1:
        # Deterministic sub-key: xxhash64 (not rand()) so retried tasks
        # re-derive the same shard and the pair meets exactly once.
        r = r.withColumn(
            "__salt", F.pmod(F.xxhash64(F.col("id_dst")), F.lit(salt))
        )
        l = l.withColumn(
            "__salt", F.explode(F.array(*[F.lit(s) for s in range(salt)]))
        )
        join_keys = join_keys + ["__salt"]
    joined = l.join(r, join_keys)

    sq = None
    for i in range(dims):
        d = F.col(f"c{i}_src") - F.col(f"c{i}_dst")
        sq = d * d if sq is None else sq + d * d
    dist = F.sqrt(sq)
    gap = dist
    if radius_col:
        gap = dist - F.col("r_src") - F.col("r_dst")

    return (
        joined.filter(F.col("id_src") < F.col("id_dst"))
        .filter(gap < F.lit(float(eps)))
        .select(
            F.col("id_src").alias("src"),
            F.col("id_dst").alias("dst"),
            dist.alias("dist"),
            *[F.col(f"{c}_src") for c in keep_cols],
            *[F.col(f"{c}_dst") for c in keep_cols],
        )
    )
