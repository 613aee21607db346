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


# (spark simpleString, duckdb type) pairs the driver's type-sensitive
# value-hash is KNOWN to tolerate: int32-vs-BIGINT is proven tolerated
# (win_order_ranks was hash-green in round 1 with exactly that split).
# HUGEINT is proven NOT tolerated (the tpch_q12 round-3 red row), so a
# DuckDB aggregate must be CAST to BIGINT rather than whitelisted here.
_TYPE_COMPAT = {
    ("bigint", "BIGINT"), ("int", "INTEGER"), ("int", "BIGINT"),
    ("bigint", "INTEGER"), ("double", "DOUBLE"), ("float", "FLOAT"),
    ("string", "VARCHAR"), ("date", "DATE"), ("boolean", "BOOLEAN"),
    ("timestamp", "TIMESTAMP"), ("timestamp_ntz", "TIMESTAMP"),
    ("smallint", "SMALLINT"), ("tinyint", "TINYINT"), ("binary", "BLOB"),
    # JSON fetches as str — proven tolerated (cdc_flagship_documents'
    # lines_json column was hash-green in the round-3 driver run)
    ("string", "JSON"),
}


def _types_ok(spark_t: str, duck_t: str) -> bool:
    if (spark_t, duck_t) in _TYPE_COMPAT:
        return True
    if spark_t.startswith("array<") and duck_t.endswith("[]"):
        return (spark_t[6:-1], duck_t[:-2]) in _TYPE_COMPAT
    return False


@pytest.mark.parametrize("name", ORACLE_CASES)
def test_oracle_column_types_compatible(spark, oracle, name):
    """Authoring-time guard for the driver's TYPE-SENSITIVE value hash:
    every oracle column's DuckDB type must be hash-compatible with the
    Spark column's type. This is the check that would have caught the
    tpch_q12 HUGEINT red row (DuckDB's bare SUM over integers) before it
    reached a driver round — analysis only, nothing executes."""
    entry = REG[name]
    stypes = {
        f.name: f.dataType.simpleString()
        for f in entry.fn(spark, SF_DIR).schema.fields
    }
    rel = oracle.sql(entry.oracle)
    dtypes = dict(zip(rel.columns, (str(t) for t in rel.types)))
    bad = {
        c: (st, dtypes.get(c, "MISSING"))
        for c, st in stypes.items()
        if not _types_ok(st, dtypes.get(c, "MISSING"))
    }
    assert not bad, f"{name}: hash-incompatible column types {bad}"
