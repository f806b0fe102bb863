"""Structured Streaming tier (SURVEY §2.8).

The reference's solver is a micro-batched time loop: state advances per
step, results append every ``nOutLoops=250`` steps to the ``Output/``
folder (``MLS00con.dat:7``, ``SysFile.ini:61-63``). The engine mirrors
that as a file-source stream: ``readStream`` over the snapshot/event
folder, tumbling windows per output interval, watermark as the
correctness guard (the reference has no late data — the watermark is
free insurance), memory sink for synchronous test drains.
"""

from __future__ import annotations

import os
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from columnarmodeling_spark.session import tune

_EVENTS_NANOS_DDL = (
    "event_id LONG, ts LONG, user_id LONG, event_type STRING, "
    "value DOUBLE, props STRING"
)
_EVENTS_MICROS_DDL = (
    "event_id LONG, ts TIMESTAMP, user_id LONG, event_type STRING, "
    "value DOUBLE, props STRING"
)


def events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream over the events table.

    The parquet's physical timestamp unit has drifted across testdata
    generations (TIMESTAMP(NANOS) vs TIMESTAMP(MICROS)), so the stream
    schema is derived from the batch reader's view of the same file —
    the exact guard ``catalog.table`` applies (catalog.py). If the batch
    schema already yields TimestampType, the file is micros and is
    declared TIMESTAMP directly; only legacy nanos files (surfaced as
    LongType under ``nanosAsLong``) take the ns→µs truncation. Either
    way the stream sees the same instants as the batch path and the
    DuckDB oracle.

    SINGLE-BATCH ASSUMPTION (the q166/q201 exactness contract): no
    ``maxFilesPerTrigger`` is set, so with ``availableNow`` every
    pending file lands in ONE micro-batch. That is what makes the
    per-batch-tail state of q166/q201 bit-identical to the batch fold
    even though a Spark-written events.parquet directory's part files
    are neither internally time-contiguous nor enumerated in timestamp
    order — a future trigger cap would split the parts into
    out-of-order micro-batches and silently break those two queries'
    batch↔stream equivalence. If a rate cap is ever needed, use the
    late-data-robust q206/q207 variants, whose max-timestamp state
    drops and counts out-of-order rows instead of folding them.
    """
    tune(spark)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    batch_ts = (
        spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
        .schema["ts"]
        .dataType
    )
    nanos = isinstance(batch_ts, T.LongType)
    ddl = _EVENTS_NANOS_DDL if nanos else _EVENTS_MICROS_DDL
    ev_path = os.path.join(sf_dir, "events.parquet")
    if os.path.isdir(ev_path):
        # Spark-written dataset: events.parquet is a DIRECTORY of part
        # files — stream it directly (a pathGlobFilter on the parent
        # would match no part file and silently yield an empty stream;
        # found via the 16x scale replica, whose tables are re-written
        # by Spark)
        raw = spark.readStream.schema(ddl).parquet(ev_path)
    else:
        # driver-provided flat file: file-source streams need a
        # directory, so glob-filter the parent to the single file
        raw = (
            spark.readStream.schema(ddl)
            .option("pathGlobFilter", "events.parquet")
            .parquet(sf_dir)
        )
    if nanos:
        raw = raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return raw


def drain_to_memory(
    stream_df: DataFrame, mode: str = "complete", partitions: int | None = None
) -> DataFrame:
    """Run a streaming aggregation to completion against the available
    input (the solver-run analog: process every pending micro-batch,
    then stop) and return the result as a batch DataFrame.

    Stateful streaming spins up one state-store instance PER shuffle
    partition per stateful operator; at the batch tier's 32 partitions
    that fixed cost dwarfs the sf-small data. *partitions* temporarily
    lowers ``spark.sql.shuffle.partitions`` while the stream drains
    (state-store parallelism is a per-query choice a real deployment
    sizes to its key cardinality — this is configuration, not
    semantics; AQE does the equivalent resizing for batch plans but is
    disabled inside stateful streaming). The previous value is restored
    before returning so batch queries are unaffected.

    The default is SCALE-DERIVED (r16; the r15 constant 4 was a
    local-mode tune): ``max(4, defaultParallelism // 8)`` — the r15
    4/8/16/32 sweep on the stream-stream join (q85, sf0.1) showed
    per-instance state-store fixed cost dominating until roughly one
    instance per 8 cores (4 beat 8 by ~30%, 32 was ~2.5x slower), so
    the instance count now tracks cluster size instead of freezing the
    local optimum: local[32] and local[8] both resolve to 4 (bench
    numbers stay comparable across the driver's core counts), while a
    1024-core cluster gets 128 state-store instances. A deployment
    whose per-batch key volume needs a different sizing sets
    ``$SPARK_GRAFT_STREAM_PARTITIONS`` (or passes *partitions*);
    output is identical at any value.
    """
    spark = stream_df.sparkSession
    if partitions is None:
        env = os.environ.get("SPARK_GRAFT_STREAM_PARTITIONS")
        if env is not None:
            try:
                partitions = int(env)
                if partitions <= 0:
                    raise ValueError
            except ValueError:
                raise ValueError(
                    "SPARK_GRAFT_STREAM_PARTITIONS must be a positive "
                    f"integer, got {env!r}"
                ) from None
        else:
            partitions = max(
                4, spark.sparkContext.defaultParallelism // 8
            )
    name = f"sink_{uuid.uuid4().hex[:12]}"
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(partitions))
    try:
        q = (
            stream_df.writeStream.outputMode(mode)
            .format("memory")
            .queryName(name)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    return spark.table(name)


_DOCS_DDL = (
    "doc_id LONG, text STRING, lang STRING, source STRING, n_chars LONG"
)


def documents_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream over the documents table — the ingest shape
    of a training-data pipeline (new crawl shards land in a folder;
    screens run as the data arrives instead of in a nightly batch).
    Same dir-vs-flat-file handling as ``events_stream``; no timestamp
    column, so none of its unit-drift guards apply. The single-batch
    assumption is likewise inherited by any stateful consumer."""
    tune(spark)
    doc_path = os.path.join(sf_dir, "documents.parquet")
    if os.path.isdir(doc_path):
        return spark.readStream.schema(_DOCS_DDL).parquet(doc_path)
    return (
        spark.readStream.schema(_DOCS_DDL)
        .option("pathGlobFilter", "documents.parquet")
        .parquet(sf_dir)
    )
