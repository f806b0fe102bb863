"""Shared helpers for query implementations."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from columnarmodeling_spark.catalog import table
from columnarmodeling_spark.session import tune


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one testdata table with oracle-compatible session conf pinned."""
    tune(spark)
    return table(spark, sf_dir, name)
