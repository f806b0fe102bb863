"""Testdata-schema drift canaries (round-4 verdict, next-round #6).

The round driver regenerates the testdata between rounds, and physical
types can drift silently — round 4's regression was exactly this:
``events.parquet`` moved from TIMESTAMP(NANOS) to TIMESTAMP(MICROS) and
the streaming source kept dividing by 1000, compressing 30 days of
events into ~43 minutes. These tests catch that class of bug in
seconds: every engine ingest path (batch catalog, file-source stream)
must decode the same ``min(ts)/max(ts)`` instants DuckDB reads from the
same parquet, regardless of the file's physical unit.
"""

from __future__ import annotations

import datetime as dt

import duckdb
import pytest
from pyspark.sql import functions as F

from columnarmodeling_spark.catalog import TABLES, table
from columnarmodeling_spark.streaming.sources import drain_to_memory, events_stream


def _oracle_bounds(sf_dir: str) -> tuple[dt.datetime, dt.datetime]:
    lo, hi = duckdb.sql(
        f"SELECT min(ts), max(ts) FROM read_parquet('{sf_dir}/events.parquet')"
    ).fetchone()
    return lo, hi


def _utc_naive(ts: dt.datetime) -> dt.datetime:
    if ts.tzinfo is not None:
        ts = ts.astimezone(dt.timezone.utc).replace(tzinfo=None)
    return ts


def test_batch_events_ts_matches_duckdb(spark, sf_dir):
    lo, hi = _oracle_bounds(sf_dir)
    row = (
        table(spark, sf_dir, "events")
        .agg(F.min("ts").alias("lo"), F.max("ts").alias("hi"))
        .collect()[0]
    )
    assert _utc_naive(row["lo"]) == lo, "batch min(ts) drifted from DuckDB"
    assert _utc_naive(row["hi"]) == hi, "batch max(ts) drifted from DuckDB"


def test_stream_events_ts_matches_duckdb(spark, sf_dir):
    lo, hi = _oracle_bounds(sf_dir)
    agg = events_stream(spark, sf_dir).agg(
        F.min("ts").alias("lo"), F.max("ts").alias("hi")
    )
    row = drain_to_memory(agg, mode="complete", partitions=1).collect()[0]
    assert _utc_naive(row["lo"]) == lo, "stream min(ts) drifted from DuckDB"
    assert _utc_naive(row["hi"]) == hi, "stream max(ts) drifted from DuckDB"


@pytest.mark.parametrize("name", TABLES)
def test_row_counts_match_duckdb(spark, sf_dir, name):
    """Cheap whole-catalog canary: every table's row count agrees."""
    want = duckdb.sql(
        f"SELECT count(*) FROM read_parquet('{sf_dir}/{name}.parquet')"
    ).fetchone()[0]
    assert table(spark, sf_dir, name).count() == want


# DuckDB type → the Spark simpleString the engine's catalog must yield
# for semantically-equivalent decoding (the round-4 regression was a
# *physical* parquet type change surfacing as a value change; this
# fingerprint catches logical drift — new columns, widened ints,
# date↔timestamp swaps — the moment the driver regenerates testdata).
_DUCK_TO_SPARK = {
    "BIGINT": {"bigint"},
    "INTEGER": {"int"},
    "DOUBLE": {"double"},
    "FLOAT": {"float"},
    "VARCHAR": {"string"},
    # naive parquet timestamps surface as TIMESTAMP_NTZ on the raw read
    # (isAdjustedToUTC=false) and as TIMESTAMP on paths that normalize
    # to an instant (events); both decode to DuckDB's naive values —
    # the min/max value canaries above pin that equivalence per path
    "TIMESTAMP": {"timestamp", "timestamp_ntz"},
    "TIMESTAMP_NS": {"timestamp", "timestamp_ntz"},
    "DATE": {"date"},
    "BOOLEAN": {"boolean"},
    "FLOAT[]": {"array<float>"},
    "DOUBLE[]": {"array<double>"},
    "BLOB": {"binary"},
}


@pytest.mark.parametrize("name", TABLES)
def test_column_types_match_duckdb(spark, sf_dir, name):
    duck = duckdb.sql(
        f"DESCRIBE SELECT * FROM read_parquet('{sf_dir}/{name}.parquet')"
    ).fetchall()
    got = {f.name: f.dataType.simpleString() for f in table(spark, sf_dir, name).schema}
    want = {}
    for col, dtype, *_ in duck:
        mapped = _DUCK_TO_SPARK.get(dtype)
        assert mapped is not None, (
            f"{name}.{col}: DuckDB type {dtype!r} has no mapping - testdata "
            f"gained a new physical type; extend _DUCK_TO_SPARK and check "
            f"every engine ingest path decodes it"
        )
        want[col] = mapped
    assert set(got) == set(want), f"{name}: column set drifted from testdata"
    for col, allowed in want.items():
        assert got[col] in allowed, (
            f"{name}.{col}: engine decodes as {got[col]!r}, testdata is "
            f"{allowed} - type drifted"
        )
