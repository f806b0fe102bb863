"""q311 adaptive join strategy: the profile-driven branch choice must
pick broadcast / plain shuffle / salted shuffle on the corpora crafted to
sit on each side of the thresholds, and every branch must produce the
identical observable join aggregate (bit-for-bit vs the DuckDB oracle,
which replays the profile + decision in SQL)."""

from __future__ import annotations

import math

import pandas as pd

from columnarmodeling_spark.queries import REGISTRY
from columnarmodeling_spark.queries.relational import (
    _JADAPT_BC_ROWS,
    _JADAPT_MOD,
    _JADAPT_SKEW_MILLI,
)

# large enough that the modulo-37 estimate clears the 50k broadcast bar:
# ceil(52_000 / 37) * 37 = 52_022 > 50_000
_BIG_ORDERS = 52_000
_SMALL_ORDERS = 400


def _write_tables(tmp_path, ev_rows, n_orders):
    ev = pd.DataFrame(
        ev_rows,
        columns=["event_id", "ts", "user_id", "event_type", "value", "props"],
    )
    ev["ts"] = pd.to_datetime(ev["ts"], unit="s")
    ev.to_parquet(str(tmp_path / "events.parquet"), index=False)
    od = pd.DataFrame(
        {
            "o_orderkey": range(n_orders),
            # custkeys cycle over the probe's user_id domain so the join
            # has matches; int64 like the testdata
            "o_custkey": [i % 8 for i in range(n_orders)],
            "o_totalprice": [100.0 + (i % 50) / 4.0 for i in range(n_orders)],
        }
    )
    od.to_parquet(str(tmp_path / "orders.parquet"), index=False)
    return str(tmp_path)


def _uniform_events(n_users=8, per_user=74):
    # dense event_id so the %37 sample is uniform across users
    return [
        (i, 1_700_000_000 + i, i % n_users, "click", (i % 10) / 4.0, "{}")
        for i in range(n_users * per_user)
    ]


def _hot_events(n=1000):
    # user 0 owns 90% of events -> sampled skew ~ 0.9 * K >> 2x
    return [
        (
            i,
            1_700_000_000 + i,
            0 if i % 10 != 9 else 1 + (i // 10) % 7,
            "click",
            (i % 7) / 8.0,
            "{}",
        )
        for i in range(n)
    ]


def _run(spark, d):
    return REGISTRY["q311_join_adaptive_strategy"].fn(spark, d).collect()


def test_small_build_takes_broadcast_branch(spark, tmp_path):
    d = _write_tables(tmp_path, _hot_events(), _SMALL_ORDERS)
    rows = _run(spark, d)
    assert rows, "join produced no groups"
    r = rows[0]
    # broadcast wins even though the probe is heavily skewed: with no
    # probe shuffle, skew is irrelevant (decision-order invariant)
    assert r.strategy == "broadcast"
    assert r.est_build_rows <= _JADAPT_BC_ROWS
    assert r.skew_milli >= _JADAPT_SKEW_MILLI


def test_big_build_uniform_probe_takes_shuffle_branch(spark, tmp_path):
    d = _write_tables(tmp_path, _uniform_events(), _BIG_ORDERS)
    rows = _run(spark, d)
    r = rows[0]
    assert r.strategy == "shuffle"
    assert r.est_build_rows > _JADAPT_BC_ROWS
    assert r.skew_milli < _JADAPT_SKEW_MILLI


def test_big_build_hot_probe_takes_salted_branch(spark, tmp_path):
    d = _write_tables(tmp_path, _hot_events(), _BIG_ORDERS)
    rows = _run(spark, d)
    r = rows[0]
    assert r.strategy == "salted_shuffle"
    assert r.est_build_rows > _JADAPT_BC_ROWS
    assert r.skew_milli >= _JADAPT_SKEW_MILLI
    # salting must not perturb the aggregate: every (probe row, build
    # row) pair matches exactly one salt replica. Replay the join
    # aggregate in pure python (half-up rounding — Spark/DuckDB round(),
    # not Python's banker's).
    ev = _hot_events()
    per_cust = {}
    for k in range(_BIG_ORDERS):
        per_cust.setdefault(k % 8, []).append(100.0 + (k % 50) / 4.0)
    n_pairs = val = ordc = 0
    for (eid, _ts, uid, _et, v, _p) in ev:
        prices = per_cust.get(uid, [])
        n_pairs += len(prices)
        val += len(prices) * math.floor(100.0 * v + 0.5)
        ordc += sum(math.floor(100.0 * p + 0.5) for p in prices)
    assert r.n_pairs == n_pairs
    assert r.val_cents == val
    assert r.ord_cents == ordc


def test_matches_oracle_on_all_three_branches(spark, tmp_path):
    """The DuckDB oracle replays profile + decision + join on the same
    crafted corpora: decision columns and aggregates must match
    bit-for-bit on every branch."""
    import duckdb

    from tests.oracle_utils import canonical_rows

    spec = REGISTRY["q311_join_adaptive_strategy"]
    cases = {
        "broadcast": (_uniform_events(), _SMALL_ORDERS),
        "shuffle": (_uniform_events(), _BIG_ORDERS),
        "salted": (_hot_events(), _BIG_ORDERS),
    }
    for case, (ev_rows, n_orders) in cases.items():
        sub = tmp_path / case
        sub.mkdir()
        d = _write_tables(sub, ev_rows, n_orders)
        got = spec.fn(spark, d)
        mine_cols = got.columns
        mine_rows = [tuple(r) for r in got.collect()]
        con = duckdb.connect()
        for tbl in ("events", "orders"):
            con.execute(
                f"CREATE VIEW {tbl} AS SELECT * FROM '{d}/{tbl}.parquet'"
            )
        cur = con.execute(spec.oracle)
        ocols = [c[0] for c in cur.description]
        orows = cur.fetchall()
        assert sorted(mine_cols) == sorted(ocols), case
        assert canonical_rows(mine_cols, mine_rows) == canonical_rows(
            ocols, orows
        ), case


def test_spec_is_flagged_eager(spark):
    """Generic tooling relies on the eager flag to expect the hidden
    profile job when building-without-running (r11 ADVICE)."""
    assert REGISTRY["q311_join_adaptive_strategy"].eager is True
    assert REGISTRY["q310_skew_adaptive_agg"].eager is True
    assert REGISTRY["q329_join_order_adaptive"].eager is True
    # and the rest of the registry stays lazy
    eager = [n for n, s in REGISTRY.items() if s.eager]
    assert sorted(eager) == [
        "q310_skew_adaptive_agg",
        "q311_join_adaptive_strategy",
        "q329_join_order_adaptive",
    ]
