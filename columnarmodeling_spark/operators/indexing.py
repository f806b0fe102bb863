"""Scalable global row indexing.

The reference assigns dense incremental ids with a driver-side counter
(``GenerateColumnar.py:147-150``) and groups every 4 consecutive text rows
into one face (``BooleanOperation.py:72-73``) — both need a *global* row
number in sort order.

A naive ``row_number().over(Window.orderBy(...))`` funnels the whole
dataset through ONE partition — fine at 60k rows, fatal at 100 TB. This
module implements the scale-safe pattern:

1. range-partition by the sort key (``repartitionByRange`` — Spark samples
   split points, so partitions are balanced);
2. sort within partitions (no global shuffle beyond the range exchange);
3. count rows per partition (cheap scan), prefix-sum the counts on the
   driver (#partitions values, not #rows);
4. per-partition ``row_number`` + broadcast offset = exact global index.

Deterministic as long as the sort key is unique: the global index equals
the rank in total sort order regardless of where the sampled split points
land.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F


def with_global_index(
    df: DataFrame,
    sort_cols: list[str],
    index_col: str = "rn",
    num_partitions: int | None = None,
) -> DataFrame:
    """Add a dense 1-based global index in (unique) sort-key order."""
    n = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    part = df.repartitionByRange(n, *sort_cols).withColumn(
        "__pid", F.spark_partition_id()
    )
    part = part.localCheckpoint(eager=False)  # reuse one shuffle for both passes

    counts = part.groupBy("__pid").count().collect()
    offsets = {}
    acc = 0
    for row in sorted(counts, key=lambda r: r["__pid"]):
        offsets[row["__pid"]] = acc
        acc += row["count"]

    spark = df.sparkSession
    off_df = F.broadcast(
        spark.createDataFrame(
            [(pid, off) for pid, off in offsets.items()], "__pid INT, __off LONG"
        )
    )
    w = W.partitionBy("__pid").orderBy(*sort_cols)
    return (
        part.join(off_df, "__pid")
        .withColumn(index_col, F.row_number().over(w) + F.col("__off"))
        .drop("__pid", "__off")
    )


def with_global_running_max(
    df: DataFrame,
    sort_cols: list[str],
    val_col: str,
    out_col: str = "cummax",
    num_partitions: int | None = None,
) -> DataFrame:
    """Add the EXCLUSIVE global running max of ``val_col`` in (unique)
    sort-key order — the max over all strictly-preceding rows, NULL for
    the global first row. Same two-pass shape as
    :func:`with_global_index` (range partition → per-partition maxes →
    driver prefix over #partitions values → broadcast offsets +
    in-partition window), so no single-partition global window exists
    anywhere. The skyline operator keys on this: "best value among all
    strictly-cheaper rows" at any scale."""
    n = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    part = df.repartitionByRange(n, *sort_cols).withColumn(
        "__pid", F.spark_partition_id()
    )
    part = part.localCheckpoint(eager=False)

    maxes = part.groupBy("__pid").agg(F.max(val_col).alias("m")).collect()
    offsets = {}
    acc = None
    for row in sorted(maxes, key=lambda r: r["__pid"]):
        offsets[row["__pid"]] = acc
        if row["m"] is not None and (acc is None or row["m"] > acc):
            acc = row["m"]

    spark = df.sparkSession
    val_type = dict(df.dtypes)[val_col]
    off_df = F.broadcast(
        spark.createDataFrame(
            [(pid, off) for pid, off in offsets.items()],
            f"__pid INT, __off {val_type}",
        )
    )
    w = (
        W.partitionBy("__pid")
        .orderBy(*sort_cols)
        .rowsBetween(W.unboundedPreceding, -1)
    )
    # greatest() skips nulls: NULL only when no preceding row exists at all
    return (
        part.join(off_df, "__pid")
        .withColumn(out_col, F.greatest(F.max(val_col).over(w), F.col("__off")))
        .drop("__pid", "__off")
    )


def with_global_running_sum(
    df: DataFrame,
    sort_cols: list[str],
    val_col: str,
    out_col: str = "cum",
    num_partitions: int | None = None,
) -> DataFrame:
    """Add the INCLUSIVE global running sum of ``val_col`` in (unique)
    sort-key order — same two-pass shape as :func:`with_global_index`
    (range partition → per-partition sums → driver prefix over
    #partitions values → broadcast offsets + in-partition window), so
    no single-partition global window exists anywhere. The exclusive
    prefix is ``out_col - val_col``."""
    n = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    part = df.repartitionByRange(n, *sort_cols).withColumn(
        "__pid", F.spark_partition_id()
    )
    part = part.localCheckpoint(eager=False)

    sums = part.groupBy("__pid").agg(F.sum(val_col).alias("s")).collect()
    offsets = {}
    acc = 0
    for row in sorted(sums, key=lambda r: r["__pid"]):
        offsets[row["__pid"]] = acc
        acc += row["s"] or 0

    spark = df.sparkSession
    off_df = F.broadcast(
        spark.createDataFrame(
            [(pid, off) for pid, off in offsets.items()],
            "__pid INT, __off LONG",
        )
    )
    w = (
        W.partitionBy("__pid")
        .orderBy(*sort_cols)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        part.join(off_df, "__pid")
        .withColumn(out_col, F.sum(val_col).over(w) + F.col("__off"))
        .drop("__pid", "__off")
    )


def with_group_rank(
    df: DataFrame,
    group_cols: list[str],
    order_cols: list[str],
    rank_col: str = "grk",
    count_col: str | None = "gn",
    num_partitions: int | None = None,
) -> DataFrame:
    """Add a dense 1-based PER-GROUP rank (and optionally the group
    size) without ever sorting a whole group in one task.

    ``row_number() OVER (PARTITION BY group ORDER BY ...)`` puts each
    group's entire data through a single task — fatal when a few giant
    groups hold most of 100 TB (the q165 trap). This instead runs ONE
    :func:`with_global_index` over the composite key
    ``group_cols + order_cols`` (range partition → per-partition
    window → broadcast offsets), then derives the group rank as
    ``global_rn − min(global_rn per group) + 1`` via a broadcast-size
    per-group offset join. The composite ordering must be unique
    (same contract as ``with_global_index``); the offset relation has
    one row per group.

    The offset relation is UNCONDITIONALLY broadcast, so the GROUP
    COUNT must be broadcast-sized (roughly ≤ a few million one-row
    groups / the 8 GB broadcast ceiling) — the inverse of the window
    trap this helper exists to avoid: it trades per-group task size
    for a per-group driver-side relation. Callers here have 3–64
    groups. For high-cardinality grouping keys, drop the
    ``F.broadcast`` hint (a shuffle hash join on group_cols is then
    the right plan) or use a plain window, which is safe when every
    group is small.
    """
    idx = with_global_index(
        df, [*group_cols, *order_cols], index_col="__grn",
        num_partitions=num_partitions,
    )
    aggs = [F.min("__grn").alias("__g0")]
    if count_col:
        aggs.append(F.count("*").alias(count_col))
    g = idx.groupBy(*group_cols).agg(*aggs)
    out = (
        idx.join(F.broadcast(g), group_cols)
        .withColumn(
            rank_col, F.col("__grn") - F.col("__g0") + F.lit(1)
        )
        .drop("__grn", "__g0")
    )
    return out
