"""Differential-test harness: Spark result vs DuckDB oracle.

Replicates the driver's correctness gate locally: row count, column-name
set, and an order-insensitive value comparison (columns sorted by name,
cells canonicalized, rows sorted). Floats are canonicalized at 6 decimal
digits — queries are expected to round their own float outputs harder
than that, so this only absorbs representation noise (Decimal vs float,
-0.0, trailing zeros), not real mismatches.
"""

from __future__ import annotations

import math
from datetime import date, datetime
from decimal import Decimal

import duckdb

from columnarmodeling_spark.catalog import TABLES


def run_oracle(sql: str, sf_dir: str):
    con = duckdb.connect()
    for name in TABLES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM '{sf_dir}/{name}.parquet'"
        )
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    return cols, cur.fetchall()


def _canon(v):
    if v is None:
        return "∅"
    if isinstance(v, bool):
        return "T" if v else "F"
    if isinstance(v, Decimal):
        v = float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        r = round(v, 6)
        if r == 0:
            r = 0.0  # normalize -0.0
        return f"{r:.6f}"
    if isinstance(v, (datetime, date)):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon(x) for x in v) + "]"
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    return str(v)


def canonical_rows(cols: list[str], rows) -> list[tuple]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_canon(r[i]) for i in order) for r in rows]
    out.sort()
    return out


def assert_matches_oracle(spark_df, sql: str, sf_dir: str) -> None:
    mine_cols = spark_df.columns
    mine_rows = [tuple(r) for r in spark_df.collect()]
    ocols, orows = run_oracle(sql, sf_dir)

    assert sorted(mine_cols) == sorted(ocols), (
        f"column mismatch: spark={sorted(mine_cols)} oracle={sorted(ocols)}"
    )
    assert len(mine_rows) == len(orows), (
        f"row count mismatch: spark={len(mine_rows)} oracle={len(orows)}"
    )
    a = canonical_rows(mine_cols, mine_rows)
    b = canonical_rows(ocols, orows)
    if a != b:
        diff_a = [r for r in a if r not in set(b)][:5]
        diff_b = [r for r in b if r not in set(a)][:5]
        raise AssertionError(
            f"value mismatch ({sum(1 for x, y in zip(a, b) if x != y)} rows "
            f"differ)\n spark-only: {diff_a}\n oracle-only: {diff_b}"
        )
