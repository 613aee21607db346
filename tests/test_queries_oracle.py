"""Golden-oracle gate: every registered query with an oracle must match
DuckDB at sf0.01 — the same comparison the driver runs (row count, column
names, order-insensitive normalized values)."""

import pytest

from sql_cdc_spark.queries import _registry
from tests.conftest import SF_DIR, assert_matches_oracle

REG = _registry()
ORACLE_CASES = sorted(name for name, e in REG.items() if e.oracle)
ROWS_ONLY_CASES = sorted(name for name, e in REG.items() if e.oracle is None)


@pytest.mark.parametrize("name", ORACLE_CASES)
def test_query_matches_oracle(spark, oracle, name):
    entry = REG[name]
    df = entry.fn(spark, SF_DIR)
    assert_matches_oracle(df, oracle, entry.oracle)


@pytest.mark.parametrize("name", ROWS_ONLY_CASES)
def test_rows_only_query_runs(spark, name):
    df = REG[name].fn(spark, SF_DIR)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


def test_topn_other_rollup_matches_oracle(spark, oracle):
    """Oracle-parity gate for rel_topn_other_rollup ahead of its round-5
    driver-window entry — the driver comparison at sf0.01, plus the
    report's defining invariant: per nation, the top rows and the OTHER
    row reconcile exactly to the nation's total revenue (integer cents)."""
    from sql_cdc_spark.queries.relational_q import (
        _TOPN_OTHER_SQL,
        TOPN_N,
        rel_topn_other_rollup,
    )

    df = rel_topn_other_rollup(spark, SF_DIR)
    assert_matches_oracle(df, oracle, _TOPN_OTHER_SQL)

    rows = df.collect()
    by_nation = {}
    for r in rows:
        by_nation.setdefault(r.n_name, []).append(r)
    totals = {
        r.n_name: r.t
        for r in oracle.execute(
            """SELECT n.n_name,
                      SUM(CAST(ROUND(o.o_totalprice * 100, 0) AS BIGINT)) AS t
               FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
               JOIN nation n ON c.c_nationkey = n.n_nationkey
               GROUP BY 1"""
        ).fetchdf().itertuples(index=False, name="R")
    }
    assert set(by_nation) == set(totals)
    for nation, members in by_nation.items():
        assert sum(m.revenue_cents for m in members) == totals[nation]
        tops = [m for m in members if m.member != "OTHER"]
        assert 1 <= len(tops) <= TOPN_N
        assert sorted(m.rnk for m in tops) == list(range(1, len(tops) + 1))


def test_collapse_runs_matches_oracle(spark, oracle):
    """Oracle-parity gate for evt_collapse_runs ahead of its round-5
    driver-window entry, plus the islands invariants: runs tile each
    user's stream exactly (n_events sums to the user's event count) and
    adjacent runs never share an event_type."""
    from sql_cdc_spark.queries.events_q import (
        _COLLAPSE_RUNS_SQL,
        evt_collapse_runs,
    )

    df = evt_collapse_runs(spark, SF_DIR)
    assert_matches_oracle(df, oracle, _COLLAPSE_RUNS_SQL)

    rows = df.collect()
    per_user = {}
    for r in rows:
        per_user.setdefault(r.user_id, []).append(r)
    totals = dict(
        oracle.execute(
            "SELECT user_id, COUNT(*) FROM events GROUP BY 1"
        ).fetchall()
    )
    assert set(per_user) == set(totals)
    for uid, runs in per_user.items():
        runs.sort(key=lambda r: r.run_seq)
        assert [r.run_seq for r in runs] == list(range(1, len(runs) + 1))
        assert sum(r.n_events for r in runs) == totals[uid]
        for a, b in zip(runs, runs[1:]):
            assert a.event_type != b.event_type
            assert a.end_us <= b.start_us
