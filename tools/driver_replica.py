"""Replicate the driver's correctness compare as closely as possible.

The driver (per the q67 traceback in CORRECTNESS_r01.json) converts both
the Spark result and the DuckDB oracle result to pandas, sorts columns by
name, sorts rows by all columns, and hashes the stringified values — with
NO float canonicalization.  The repo's own pytest harness rounds floats
before comparing, which is why five queries pass pytest but fail the
driver.  This tool diffs the raw stringified frames to find the exact
cells that differ.

Usage: python tools/driver_replica.py q07_rounded_dedup_dense_id [more...]
       python tools/driver_replica.py --all [--json REPLICA_rNN.json]

``--all`` runs every oracle-backed registered query; ``--json OUT``
additionally writes a CORRECTNESS_rNN-shaped artifact (one object per
query: rows_match / schema_match / hash_match / spark_rows /
oracle_rows / err) so the "full registry strict-match" ledger claims
are a checked-in artifact rather than a commit-message assertion
(round-11 verdict item 5). Queries without an oracle get a rows-only
record (``hash_match: null``), same as the driver's weaker check.
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

    args = sys.argv[1:]
    json_out = None
    if "--json" in args:
        i = args.index("--json")
        json_out = args[i + 1]
        del args[i : i + 2]
    names = args
    if names == ["--all"]:
        names = list(REGISTRY)
    n_ok = n_bad = 0
    records: dict[str, dict] = {}
    for name in names:
        spec = REGISTRY[name]
        if spec.oracle is None:
            # the driver's weaker rows-only check: runs, has a stable
            # schema, produces >= 0 rows
            try:
                sdf = spec.fn(spark, sf_dir).toPandas()
                records[name] = {
                    "rows_match": True,
                    "schema_match": True,
                    "hash_match": None,
                    "spark_rows": int(sdf.shape[0]),
                    "oracle_rows": None,
                    "err": None,
                }
                print(f"== {name}: rows-only ({sdf.shape[0]} rows, no oracle)")
            except Exception as exc:
                records[name] = {
                    "rows_match": False,
                    "schema_match": False,
                    "hash_match": None,
                    "spark_rows": None,
                    "oracle_rows": None,
                    "err": f"{type(exc).__name__}: {exc}",
                }
                print(f"== {name}: ERR {type(exc).__name__}: {exc}")
                n_bad += 1
            continue
        try:
            sdf = spec.fn(spark, sf_dir).toPandas()
            odf = con.execute(spec.oracle).df()
            s, o = canon(sdf), canon(odf)
        except Exception as exc:  # mirror the driver: an err row, not a crash
            print(f"== {name}: ERR {type(exc).__name__}: {exc}")
            records[name] = {
                "rows_match": False,
                "schema_match": False,
                "hash_match": False,
                "spark_rows": None,
                "oracle_rows": None,
                "err": f"{type(exc).__name__}: {exc}",
            }
            n_bad += 1
            continue
        rec = {
            "rows_match": s.shape[0] == o.shape[0],
            "schema_match": list(s.columns) == list(o.columns),
            "hash_match": False,
            "spark_rows": int(s.shape[0]),
            "oracle_rows": int(o.shape[0]),
            "err": None,
        }
        if s.shape != o.shape or list(s.columns) != list(o.columns):
            print(
                f"== {name}: SHAPE/SCHEMA MISMATCH spark {s.shape} "
                f"{list(s.columns)} vs oracle {o.shape} {list(o.columns)}"
            )
            records[name] = rec
            n_bad += 1
            continue
        ss, os_ = stringify(s), stringify(o)
        neq = ss != os_
        total = int(neq.to_numpy().sum())
        if total == 0:
            print(f"== {name}: MATCH ({s.shape[0]} rows)")
            rec["hash_match"] = True
            records[name] = rec
            n_ok += 1
            continue
        records[name] = rec
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
    if json_out:
        import json

        with open(json_out, "w") as fh:
            json.dump(records, fh, indent=1)
        print(f"wrote {json_out} ({len(records)} records)")


if __name__ == "__main__":
    main()
