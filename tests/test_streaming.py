"""Streaming-tier semantics beyond the oracle queries: the S10
append-only parquet sink, and watermark late-data drops (SURVEY §2.8 —
the reference has no late data, so the watermark is the engine's
correctness guard; this pins the behavior it guards)."""

from __future__ import annotations

import os
import time

from pyspark.sql import functions as F

from columnarmodeling_spark.streaming.sources import events_stream


def test_stream_parquet_append_sink(spark, sf_dir, tmp_path):
    """S10: readStream -> filter -> writeStream parquet append; the
    sink's contents must equal the batch run of the same plan."""
    from columnarmodeling_spark.catalog import table

    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    ev = events_stream(spark, sf_dir).filter(F.col("value") > 250.0)
    q = (
        ev.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.read.parquet(out).count()
    want = table(spark, sf_dir, "events").filter(F.col("value") > 250.0).count()
    assert got == want > 0


def test_watermark_drops_late_rows(spark, tmp_path):
    """A row older than (max event time - watermark delay) arriving in a
    later micro-batch must not reopen its closed window."""
    src = tmp_path / "stream_in"
    src.mkdir()
    base = 1_699_999_200  # epoch seconds, aligned to the 900s window grid

    def write_file(name, rows, mtime):
        # stage then move: the file stream wants flat files in src/
        df = spark.createDataFrame(rows, "ts_s long, v double").select(
            F.timestamp_seconds("ts_s").alias("ts"), "v"
        )
        stage = str(tmp_path / f"stage_{name}")
        df.coalesce(1).write.mode("overwrite").parquet(stage)
        part = next(
            f for f in os.listdir(stage) if f.endswith(".parquet")
        )
        dest = str(src / f"{name}.parquet")
        os.rename(os.path.join(stage, part), dest)
        os.utime(dest, (mtime, mtime))

    # batch 1: two rows in window [base, base+900), head row advances
    # the watermark past that window's end
    now = time.time()
    write_file("f1", [(base + 10, 1.0), (base + 100, 1.0), (base + 5000, 1.0)], now - 100)
    # batch 2: on-time row; processing it EVICTS+EMITS the first window
    # (Spark guarantees late drops only after eviction — a late row that
    # races the eviction batch may still be merged)
    write_file("f2", [(base + 6000, 1.0)], now - 50)
    # batch 3: a LATE row for the first (now closed) window -> dropped;
    # plus an on-time row pushing the watermark onward
    write_file("f3", [(base + 20, 99.0), (base + 9000, 1.0)], now - 20)

    stream = (
        spark.readStream.schema("ts timestamp, v double")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    agg = (
        stream.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "15 minutes").alias("w"))
        .agg(F.count("*").alias("n"), F.sum("v").alias("total"))
    )
    name = "wm_sink"
    q = (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = {
        int(r["w"]["start"].timestamp()): (r["n"], r["total"])
        for r in spark.table(name).collect()
    }
    # the first window closed with batch-1 rows only: the late 99.0 row
    # was dropped by the watermark
    assert rows[base] == (2, 2.0)
