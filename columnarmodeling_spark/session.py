"""SparkSession factory tuned for this engine.

Scale design notes (the same session config is meant to hold from
``local[32]`` up to a 1000-executor cluster):

- **AQE on** — runtime partition coalescing, skew-join splitting and
  dynamic join-strategy switching replace hand-tuned partition counts;
  this is how the hot central cells of the proximity-join grid (see
  ``operators/proximity.py``) get split at scale.
- **Arrow on** — every pandas-UDF boundary (geometry kernels, binary
  snapshot codec) pays one columnar batch exchange, not per-row pickling.
- **shuffle partitions** default to the local core count; on a real
  cluster override via ``SPARK_GRAFT_SHUFFLE_PARTITIONS`` to ~2-3x total
  executor cores. AQE coalesces the excess.
- **UTC session timezone** — keeps timestamp semantics identical to the
  DuckDB oracle (naive-UTC) and independent of the host.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _cpus() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))


def tune(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable engine conf to an existing session.

    Used both by :func:`get_spark` and on driver-provided sessions (the
    verify harness hands us its own session; these confs are all
    runtime-mutable).
    """
    conf = {
        "spark.sql.session.timeZone": "UTC",
        "spark.sql.execution.arrow.pyspark.enabled": "true",
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.coalescePartitions.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
    }
    for k, v in conf.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            pass  # non-mutable in this build; keep going
    return spark


def get_spark(
    app_name: str = "columnarmodeling-spark",
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    cpus = _cpus()
    shuffle = shuffle_partitions or int(
        os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", cpus)
    )
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.files.maxPartitionBytes", "134217728")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return tune(spark)
