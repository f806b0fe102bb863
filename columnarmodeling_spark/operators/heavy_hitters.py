"""Misra-Gries heavy-hitter candidate generation (pass 1 of the
two-pass exact heavy-hitters pattern, q210).

Per-partition frequent-items summary (Misra & Gries 1982; the batched
merge is the SpaceSaving-style "subtract the (size-k)-th smallest
counter from all" step, equivalent to running the classic one-decrement
loop until <= k counters remain). State bound: k entries BETWEEN Arrow
batches; transiently k + (batch-distinct) entries while a batch's
value_counts is merged, since the trim runs after the merge — still
O(k + batch) regardless of total input size, never proportional to the
partition's vocabulary. Guarantee used by the caller: for any item
whose count in a partition exceeds n_partition/k, the item survives
that partition's summary, because its final counter
>= count_p - n_p/(k+1) > 0. Union the per-partition survivors and you
have a superset of every item with global count > N/k (pigeonhole over
partitions), so an exact second pass over just the candidates loses
nothing.

Spark shape: one ``mapInPandas`` over the item column -- Arrow batches
aggregated with pandas ``value_counts`` (vectorized; the only Python
loop is over summary-merge events, bounded by distinct keys per batch),
state persists across the partition's batch iterator, and each
partition emits at most k candidate rows PLUS one totals row carrying
the partition's row count (so the caller gets the global N from the
summary instead of paying a third scan of the corpus -- round-8
verdict #3). No shuffle, no driver collect; the caller broadcast-joins
the (#partitions x (k+1))-bounded summary relation.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def mg_summary(df: DataFrame, col: str, k: int) -> DataFrame:
    """Per-partition Misra-Gries summary of ``df[col]`` plus row totals.

    Returns a 2-column DataFrame ``(col, n_p)``: per partition, at most
    ``k`` candidate rows (``n_p`` null) and exactly one totals row
    (``col`` null, ``n_p`` = the partition's row count). The caller
    derives the candidate superset from the null-``n_p`` rows and the
    exact global N from ``sum(n_p)`` — one corpus scan covers both.
    """
    in_schema = df.select(col).schema
    out_schema = f"{col} {in_schema[0].dataType.simpleString()}, n_p long"

    def summarize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counts: dict = {}
        n_p = 0
        for pdf in batches:
            n_p += len(pdf)
            for key, c in pdf[col].value_counts().items():
                counts[key] = counts.get(key, 0) + int(c)
            if len(counts) > k:
                # batched decrement: subtracting the (size-k)-th
                # smallest counter from every entry performs that many
                # rounds of the classic "decrement all k+1" step at once
                cut = sorted(counts.values())[len(counts) - k - 1]
                counts = {
                    key: c - cut for key, c in counts.items() if c > cut
                }
        yield pd.DataFrame(
            {
                col: pd.array(list(counts.keys()) + [None], dtype="object"),
                "n_p": pd.array(
                    [None] * len(counts) + [n_p], dtype="Int64"
                ),
            }
        )

    return df.select(col).mapInPandas(summarize, schema=out_schema)


def mg_candidates(df: DataFrame, col: str, k: int) -> DataFrame:
    """Distinct per-partition Misra-Gries survivors of ``df[col]``.

    Returns a 1-column DataFrame (same column name) with at most
    ``k`` rows per input partition, deduplicated across partitions.
    """
    return (
        mg_summary(df, col, k)
        .filter(F.col("n_p").isNull())
        .select(col)
        .distinct()
    )
