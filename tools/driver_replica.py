"""Replicate the driver's correctness compare as closely as possible.

The driver (per the q67 traceback in CORRECTNESS_r01.json) converts both
the Spark result and the DuckDB oracle result to pandas, sorts columns by
name, sorts rows by all columns, and hashes the stringified values — with
NO float canonicalization.  The repo's own pytest harness rounds floats
before comparing, which is why five queries pass pytest but fail the
driver.  This tool diffs the raw stringified frames to find the exact
cells that differ.

Usage: python tools/driver_replica.py q07_rounded_dedup_dense_id [more...]
"""

from __future__ import annotations

import sys

import duckdb
import pandas as pd

sys.path.insert(0, "/root/repo")

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df


def stringify(df: pd.DataFrame) -> pd.DataFrame:
    return df.apply(lambda col: col.map(lambda v: str(v)))


def main() -> None:
    from columnarmodeling_spark.queries import REGISTRY
    from columnarmodeling_spark.session import get_spark

    sf_dir = "/root/testdata/sf0.01"
    spark = get_spark()
    con = duckdb.connect()
    for tbl in TABLES:
        con.execute(
            f"CREATE VIEW {tbl} AS "
            f"SELECT * FROM read_parquet('{sf_dir}/{tbl}.parquet')"
        )

    names = sys.argv[1:]
    if names == ["--all"]:
        names = [n for n, s in REGISTRY.items() if s.oracle is not None]
    n_ok = n_bad = 0
    for name in names:
        spec = REGISTRY[name]
        if spec.oracle is None:
            print(f"== {name}: rows-only (no oracle), skipped")
            continue
        try:
            sdf = spec.fn(spark, sf_dir).toPandas()
            odf = con.execute(spec.oracle).df()
            s, o = canon(sdf), canon(odf)
        except Exception as exc:  # mirror the driver: an err row, not a crash
            print(f"== {name}: ERR {type(exc).__name__}: {exc}")
            n_bad += 1
            continue
        if s.shape != o.shape or list(s.columns) != list(o.columns):
            print(
                f"== {name}: SHAPE/SCHEMA MISMATCH spark {s.shape} "
                f"{list(s.columns)} vs oracle {o.shape} {list(o.columns)}"
            )
            n_bad += 1
            continue
        ss, os_ = stringify(s), stringify(o)
        neq = ss != os_
        total = int(neq.to_numpy().sum())
        if total == 0:
            print(f"== {name}: MATCH ({s.shape[0]} rows)")
            n_ok += 1
            continue
        n_bad += 1
        print(f"== {name}: {total} differing cells of {s.shape}")
        print("  spark dtypes:", dict(s.dtypes.astype(str)))
        print("  oracle dtypes:", dict(o.dtypes.astype(str)))
        for col in ss.columns:
            bad = neq[col]
            if bad.any():
                i = bad.idxmax()
                print(
                    f"  col={col}: {int(bad.sum())} diffs; first at row {i}: "
                    f"spark={ss[col][i]!r} oracle={os_[col][i]!r}"
                )
    print(f"\n{n_ok} strict-match, {n_bad} mismatch/err")


if __name__ == "__main__":
    main()
