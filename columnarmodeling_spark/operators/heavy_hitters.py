"""Misra-Gries heavy-hitter candidate generation (pass 1 of the
two-pass exact heavy-hitters pattern, q210).

Per-partition frequent-items summary with a hard k-entry state bound
(Misra & Gries 1982; the batched merge is the SpaceSaving-style
"subtract the (size-k)-th smallest counter from all" step, equivalent
to running the classic one-decrement loop until <= k counters remain).
Guarantee used by the caller: for any item whose count in a partition
exceeds n_partition/k, the item survives that partition's summary,
because its final counter >= count_p - n_p/(k+1) > 0. Union the
per-partition survivors and you have a superset of every item with
global count > N/k (pigeonhole over partitions), so an exact second
pass over just the candidates loses nothing.

Spark shape: one ``mapInPandas`` over the item column -- Arrow batches
aggregated with pandas ``value_counts`` (vectorized; the only Python
loop is over summary-merge events, bounded by distinct keys per batch),
state persists across the partition's batch iterator, and each
partition emits at most k candidate rows. No shuffle, no driver
collect; the caller broadcast-joins the (#partitions x k)-bounded
candidate relation.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame


def mg_candidates(df: DataFrame, col: str, k: int) -> DataFrame:
    """Distinct per-partition Misra-Gries survivors of ``df[col]``.

    Returns a 1-column DataFrame (same column name) with at most
    ``k`` rows per input partition, deduplicated across partitions.
    """

    def summarize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counts: dict = {}
        for pdf in batches:
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
        yield pd.DataFrame({col: list(counts.keys())})

    return df.select(col).mapInPandas(
        summarize, schema=df.select(col).schema
    ).distinct()
