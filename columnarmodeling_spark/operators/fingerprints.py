"""Winnowing fingerprint selection (Schleimer/Wilkerson/Aiken 2003 —
the MOSS local fingerprinting algorithm), as a reusable relational
operator over a (doc_id, pos, h) gram-hash relation.

Guarantee (the reason winnowing beats 0 mod p selection): every window
of ``w`` consecutive gram hashes contributes its minimum (rightmost
occurrence on ties), so two documents sharing any token run of at
least ``w + k - 1`` tokens (k = gram width) share at least one
selected fingerprint — while the expected density of selected grams
is ~2/(w+1).

Relational shape: ONE doc-keyed trailing-window min (state = w
hashes), then the rightmost-min resolution as an equi-join on
(doc_id, hash) with a ±w position band — fan-out structurally ≤ w —
and a distinct. No global sort, no pair space. Used by q213.
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
    wm = (
        g.withColumn("wmin", F.min("h").over(win))
        .filter(F.col("pos") >= w - 1)
        .select("doc_id", F.col("pos").alias("p"), "wmin")
    )
    return (
        wm.alias("w")
        .join(
            g.alias("g"),
            (F.col("g.doc_id") == F.col("w.doc_id"))
            & (F.col("g.h") == F.col("w.wmin"))
            & (F.col("g.pos") >= F.col("w.p") - (w - 1))
            & (F.col("g.pos") <= F.col("w.p")),
        )
        .groupBy("w.doc_id", "w.p", "w.wmin")
        .agg(F.max("g.pos").alias("sel_pos"))
        .select(
            F.col("doc_id"), "sel_pos", F.col("wmin").alias("h")
        )
        .distinct()
    )
