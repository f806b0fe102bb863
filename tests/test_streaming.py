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


def test_late_robust_folds_count_out_of_order_split(spark, tmp_path):
    """q206/q207: a maxFilesPerTrigger=1 stream whose SECOND micro-batch
    delivers rows below the first batch's per-user high-water mark must
    drop-and-count them (the path the registered queries' in-order
    single-batch drain can never reach), while in-order users fold
    across the same boundary untouched."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    from columnarmodeling_spark.queries.streaming import (
        _ewma_late_fold,
        _transitions_late_fold,
    )
    from columnarmodeling_spark.streaming.sources import drain_to_memory

    src = tmp_path / "late_src"
    src.mkdir()
    ddl = (
        "user_id long, event_type string, us long, event_id long, "
        "value double"
    )

    def write_file(name, rows, mtime):
        df = spark.createDataFrame(rows, ddl)
        stage = str(tmp_path / f"stage_{name}")
        df.coalesce(1).write.mode("overwrite").parquet(stage)
        part = next(f for f in os.listdir(stage) if f.endswith(".parquet"))
        dest = str(src / f"{name}.parquet")
        os.rename(os.path.join(stage, part), dest)
        os.utime(dest, (mtime, mtime))

    now = time.time()
    # batch 1: user 1 at us 300/400; user 2 at us 100
    write_file(
        "a",
        [(1, "x", 300, 3, 30.0), (1, "y", 400, 4, 40.0),
         (2, "a", 100, 1, 5.0)],
        now - 100,
    )
    # batch 2: user 1 rows BELOW the (400, 4) mark -> both late;
    # user 2 row above its (100, 1) mark -> folds normally
    write_file(
        "b",
        [(1, "p", 100, 1, 10.0), (1, "q", 200, 2, 20.0),
         (2, "b", 200, 2, 7.0)],
        now - 50,
    )

    def stream():
        return (
            spark.readStream.schema(ddl)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src))
        )

    # q206 fold: user 1 contributes only the in-batch (x->y) pair plus
    # 2 late rows; user 2's carried tail bridges the batch boundary
    out = stream().groupBy("user_id").applyInPandasWithState(
        _transitions_late_fold,
        outputStructType="from_type string, to_type string, c long",
        stateStructType="us long, eid long, tp string, late long",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    counts: dict[tuple[str, str], int] = {}
    for r in drain_to_memory(out, mode="update").collect():
        k = (r["from_type"], r["to_type"])
        counts[k] = counts.get(k, 0) + int(r["c"])
    assert counts == {
        ("x", "y"): 1,
        ("a", "b"): 1,
        ("__late__", "__late__"): 2,
    }

    # q207 fold: user 1's smooth is untouched by the late rows
    out2 = stream().groupBy("user_id").applyInPandasWithState(
        _ewma_late_fold,
        outputStructType=(
            "user_id long, n_events long, ewma double, n_late long"
        ),
        stateStructType="s double, n long, us long, eid long, late long",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    drained = drain_to_memory(out2, mode="update").localCheckpoint()
    final = {
        r["user_id"]: (r["m"]["n_events"], r["m"]["ewma"], r["m"]["n_late"])
        for r in drained.groupBy("user_id")
        .agg(F.max(F.struct("n_events", "n_late", "ewma")).alias("m"))
        .collect()
    }
    assert final[1] == (2, 0.25 * 40.0 + 0.75 * 30.0, 2)
    assert final[2] == (2, 0.25 * 7.0 + 0.75 * 5.0, 0)


def test_q222_stream_matches_q209_flags(spark):
    """The streaming screen must flag exactly the batch screen's
    contaminated set, with identical hit counts."""
    from columnarmodeling_spark.queries import REGISTRY

    sf = "/root/testdata/sf0.001"
    stream = {
        r.doc_id: r.n_hit_grams
        for r in REGISTRY["q222_stream_decontamination"].fn(
            spark, sf
        ).collect()
    }
    batch = {
        r.doc_id: r.n_hit_grams
        for r in REGISTRY["q209_decontamination"].fn(spark, sf).collect()
        if r.contaminated == 1
    }
    assert stream == batch and stream


def test_q290_stream_heavy_hitters_exact(spark):
    """The streamed MG candidates + exact verify must equal the exact
    batch heavy-hitter set — under ANY arrival order (superset
    property), so the replay is order-independent."""
    import re
    from collections import Counter

    import pandas as pd

    from columnarmodeling_spark.queries import REGISTRY

    rows = REGISTRY["q290_stream_heavy_hitters"].fn(
        spark, "/root/testdata/sf0.001"
    ).collect()
    docs = pd.read_parquet("/root/testdata/sf0.001/documents.parquet")
    cnt = Counter()
    for text in docs.text:
        cnt.update(t for t in re.split(r"[^a-z0-9]+", text.lower()) if t)
    n = sum(cnt.values())
    want = sorted(
        ((tok, c) for tok, c in cnt.items() if c * 60 > n),
        key=lambda kv: (-kv[1], kv[0]),
    )
    assert [(r.tok, r.cnt, r.n_total) for r in rows] == [
        (tok, c, n) for tok, c in want
    ]
    assert len(rows) > 0  # non-trivial: the corpus has heavy tokens
