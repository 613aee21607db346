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
