"""Table registry for the driver's synthetic testdata.

Mirrors the reference's manifest-driven source resolution (S6,
``/root/reference/UniaxialCompressionTest/mls.c:1-6`` — a control file
naming every input table): a single place that resolves logical table
names to columnar (Parquet) sources and registers them as SQL views.

Scans are plain ``spark.read.parquet`` so Catalyst predicate pushdown /
column pruning reach the file scan untouched.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from columnarmodeling_spark.session import tune

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        # events.ts is TIMESTAMP(NANOS) parquet, which Spark's vectorized
        # reader rejects. Read nanos as long and truncate to micros —
        # exactly DuckDB's ns→µs conversion, so the oracle sees identical
        # instants.
        from pyspark.sql import functions as F
        from pyspark.sql import types as T

        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        if isinstance(df.schema["ts"].dataType, T.LongType):
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        return df
    return spark.read.parquet(path)


def load_tables(
    spark: SparkSession, sf_dir: str, register: bool = True
) -> dict[str, DataFrame]:
    """Load every testdata table; optionally register temp views.

    Also pins oracle-compatible session conf (UTC timestamps, Arrow) on
    whatever session the caller hands us.
    """
    tune(spark)
    out: dict[str, DataFrame] = {}
    for name in TABLES:
        df = table(spark, sf_dir, name)
        if register:
            df.createOrReplaceTempView(name)
        out[name] = df
    return out
