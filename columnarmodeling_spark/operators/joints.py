"""Joint (discontinuity) model — the 4D-LSM "Belt" feature the
reference ships in every case folder: ``MLSJDat.dat`` is a triangulated
joint surface (header flag + facet count, then 9-float triangle rows)
and ``MLSJMat.dat`` a one-row joint material; spring bonds crossing the
joint surface take the joint material's (weaker) stiffness/strength
instead of the intact block material, which is what localizes failure
on the discontinuity.

Engine mapping (2D analog, same plane as the solver): joints are line
segments; a bond is re-materialized when its segment PROPERLY crosses
any joint segment. The crossing test is the classic orientation
predicate — ``cross(C,D,A)·cross(C,D,B) < 0`` and
``cross(A,B,C)·cross(A,B,D) < 0`` — pure double arithmetic with strict
inequalities, so a DuckDB oracle replays it bit-for-bit and
endpoint-on-joint degeneracies resolve deterministically (not crossed).

Scale shape: the joint table is O(100–10k facets) → ``broadcast``; the
bond×joint pairing is a broadcast nested-loop join, linear in bonds.
The per-pair predicate is cheap JVM arithmetic inside whole-stage
codegen. (A joint set too large to broadcast would bin facets into the
same grid cells as ``grid_proximity_join`` — not needed for any
reference case.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _cross(px, py, qx, qy, rx, ry):
    """z of (Q-P) × (R-P) — the orientation of R relative to ray PQ."""
    return (qx - px) * (ry - py) - (qy - py) * (rx - px)


def joint_crossings(
    bonds: DataFrame, state: DataFrame, joints: DataFrame
) -> DataFrame:
    """Flag each bond with whether it properly crosses any joint.

    *bonds*: ``src, dst, ...``; *state*: ``id, x, y, ...`` (bond
    endpoint positions); *joints*: ``joint_id, jx1, jy1, jx2, jy2``.
    Returns *bonds* plus a ``crossed`` boolean column.
    """
    a = state.select(
        F.col("id").alias("src"), F.col("x").alias("ax"), F.col("y").alias("ay")
    )
    b = state.select(
        F.col("id").alias("dst"), F.col("x").alias("bx"), F.col("y").alias("by")
    )
    e = bonds.join(a, "src").join(b, "dst")
    ax, ay = F.col("ax"), F.col("ay")
    bx, by = F.col("bx"), F.col("by")
    cx, cy = F.col("jx1"), F.col("jy1")
    dx, dy = F.col("jx2"), F.col("jy2")
    d1 = _cross(cx, cy, dx, dy, ax, ay)
    d2 = _cross(cx, cy, dx, dy, bx, by)
    d3 = _cross(ax, ay, bx, by, cx, cy)
    d4 = _cross(ax, ay, bx, by, dx, dy)
    crossed_pairs = (
        e.join(F.broadcast(joints), (d1 * d2 < 0) & (d3 * d4 < 0))
        .select("src", "dst")
        .distinct()
        .withColumn("crossed", F.lit(True))
    )
    return bonds.join(crossed_pairs, ["src", "dst"], "left").withColumn(
        "crossed", F.coalesce("crossed", F.lit(False))
    )


def apply_joint_material(
    flagged_bonds: DataFrame,
    k_joint: float,
    strength_joint: float,
) -> DataFrame:
    """Re-materialize crossed bonds (MLSJMat.dat): a crossed bond takes
    the joint stiffness/strength, an intact one keeps its own ``k`` /
    ``strength`` columns (which must already be present — see
    ``bond_stiffness_from_materials`` / ``weibull_strengths``). The
    output feeds either block solver directly."""
    return flagged_bonds.withColumn(
        "k",
        F.when(F.col("crossed"), F.lit(float(k_joint))).otherwise(F.col("k")),
    ).withColumn(
        "strength",
        F.when(F.col("crossed"), F.lit(float(strength_joint))).otherwise(
            F.col("strength")
        ),
    )
