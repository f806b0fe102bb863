"""Winnowing fingerprint selection (Schleimer/Wilkerson/Aiken 2003 —
the MOSS local fingerprinting algorithm), as a reusable relational
operator over a (doc_id, pos, h) gram-hash relation.

Guarantee (the reason winnowing beats 0 mod p selection): every window
of ``w`` consecutive gram hashes contributes its minimum (rightmost
occurrence on ties), so two documents sharing any token run of at
least ``w + k - 1`` tokens (k = gram width) share at least one
selected fingerprint — while the expected density of selected grams
is ~2/(w+1).

Relational shape: ONE doc-keyed trailing-window min over the struct
``(h, -pos)`` (state = w structs) — lexicographic struct ordering
resolves the rightmost occurrence of the minimum hash inside the same
window pass — and a distinct. No join, no global sort, no pair space.
(Before round 15 the rightmost-min resolution was a separate equi-join
on (doc_id, hash) with a ±w position band: one extra shuffle of the
full gram relation plus a groupBy, removed per guide §2.4.)
Used by q213.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def winnow_selected(g: DataFrame, w: int) -> DataFrame:
    """Selected fingerprints of a ``(doc_id, pos, h)`` relation.

    Returns distinct ``(doc_id, sel_pos, h)`` rows: for every complete
    window of *w* consecutive positions, the window's minimum hash at
    its rightmost attaining position. Documents with fewer than *w*
    grams yield no rows (no complete window exists).
    """
    win = Window.partitionBy("doc_id").orderBy("pos").rowsBetween(
        -(w - 1), 0
    )
    # min of (h, -pos) = (smallest hash, rightmost attaining position):
    # struct ordering is lexicographic, so the tie-break the MOSS rule
    # needs falls out of the same window min — no re-join against g.
    sel = F.min(F.struct(F.col("h"), (-F.col("pos")).alias("np"))).over(win)
    return (
        g.withColumn("ms", sel)
        .filter(F.col("pos") >= w - 1)
        .select(
            "doc_id",
            (-F.col("ms.np")).alias("sel_pos"),
            F.col("ms.h").alias("h"),
        )
        .distinct()
    )
