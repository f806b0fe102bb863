"""Differential tests: every oracle-bearing query in the catalog vs DuckDB.

This mirrors the driver's correctness gate (CORRECTNESS_r{N}.json) at
sf0.001 so regressions surface before the round boundary. Queries without
an oracle get a rows-run smoke check.
"""

from __future__ import annotations

import pytest

from columnarmodeling_spark.queries import REGISTRY
from tests.oracle_utils import assert_matches_oracle

ORACLED = sorted(n for n, s in REGISTRY.items() if s.oracle is not None)
ROWS_ONLY = sorted(n for n, s in REGISTRY.items() if s.oracle is None)


@pytest.mark.parametrize("name", ORACLED)
def test_matches_oracle(spark, sf_dir, name):
    spec = REGISTRY[name]
    df = spec.fn(spark, sf_dir)
    assert_matches_oracle(df, spec.oracle, sf_dir)


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_runs(spark, sf_dir, name):
    spec = REGISTRY[name]
    df = spec.fn(spark, sf_dir)
    n = df.count()
    assert n >= 0
    assert len(df.schema.fields) > 0
