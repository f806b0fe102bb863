"""Distributed as-of join (latest left-row at-or-before each right-row).

Spark has no native as-of join. The scalable plan avoids any theta join:
tag both sides, union them, and run ONE window pass per key — the
"last non-null value seen so far" trick. Cost: a single shuffle on the
join key + a sort within partitions, versus the naive
range-join-then-argmax which shuffles the full cross product of
key-matched rows.

This is the engine's generalization of the reference's load-curve
application (``MLSLD00.dat`` ``Load_Data`` curves evaluated at each
solver step, ``SysFile.ini:94,117,140,163``): for each (step, BC) the
solver needs the most recent curve point at-or-before the step time.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    left_val_cols: tuple[str, ...],
    right_id_cols: tuple[str, ...],
    tie_break: str,
) -> DataFrame:
    """For each *right* row, attach the latest *left* row with
    ``left_ts <= right_ts`` on the same *key* (inner semantics: right
    rows with no prior left row are dropped).

    Ties on ``left_ts`` resolve to the largest *tie_break* value —
    deterministic across engines.
    """
    lt = left.select(
        F.col(key).alias("__k"),
        F.col(left_ts).alias("__ts"),
        F.lit(0).alias("__kind"),
        F.struct(
            F.col(left_ts).alias("asof_ts"),
            *[F.col(c) for c in left_val_cols],
        ).alias("__payload"),
        F.col(tie_break).alias("__tb"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(c) for c in right_id_cols],
    )
    rt = right.select(
        F.col(key).alias("__k"),
        F.col(right_ts).alias("__ts"),
        F.lit(1).alias("__kind"),
        F.lit(None).cast(lt.schema["__payload"].dataType).alias("__payload"),
        F.lit(None).cast(lt.schema["__tb"].dataType).alias("__tb"),
        *[F.col(c) for c in right_id_cols],
    )
    w = (
        W.partitionBy("__k")
        .orderBy("__ts", "__kind", "__tb")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        lt.unionByName(rt)
        .withColumn("__last", F.last("__payload", ignorenulls=True).over(w))
        .filter((F.col("__kind") == 1) & F.col("__last").isNotNull())
        .select(
            F.col("__k").alias(key),
            *[F.col(c) for c in right_id_cols],
            F.col("__last.asof_ts").alias("asof_ts"),
            *[F.col(f"__last.{c}").alias(c) for c in left_val_cols],
        )
    )
