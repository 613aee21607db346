"""Nested-document oracle (SURVEY.md §7 hard-part 2): the flagship
document query's array<struct> column must match DuckDB's
list(struct ORDER BY line) aggregation element-for-element — including
array ORDER, which collect_list alone would not guarantee."""

from sql_cdc_spark.queries.cdc_q import (
    _CHANGELOG_CTES,
    BATCH_LIMIT,
    SINCE_VERSION,
    flagship_documents,
)
from tests.conftest import SF_DIR

_NESTED_SQL = f"""
WITH {_CHANGELOG_CTES},
latest AS (
  SELECT invoice_id, MAX(change_version) AS change_version
  FROM all_changes WHERE change_version > {SINCE_VERSION}
  GROUP BY invoice_id
),
nested AS (
  SELECT l_orderkey AS invoice_id,
         list(struct_pack(
             l_linenumber := l_linenumber,
             l_partkey := l_partkey,
             l_quantity := l_quantity,
             l_extendedprice := l_extendedprice,
             l_discount := l_discount
           ) ORDER BY l_linenumber, l_partkey, l_quantity, l_extendedprice, l_discount) AS lines
  FROM lineitem GROUP BY l_orderkey
)
SELECT a.invoice_id, a.change_version, o.o_custkey, o.o_totalprice,
       COALESCE(n.lines, []) AS lines
FROM latest a
JOIN orders o ON o.o_orderkey = a.invoice_id
LEFT JOIN nested n ON n.invoice_id = a.invoice_id
ORDER BY a.change_version, a.invoice_id
LIMIT {BATCH_LIMIT}
"""

_LINE_FIELDS = [
    "l_linenumber",
    "l_partkey",
    "l_quantity",
    "l_extendedprice",
    "l_discount",
]


def test_flagship_nested_documents_match_duckdb(spark, oracle):
    got = flagship_documents(spark, SF_DIR).collect()
    want = oracle.execute(_NESTED_SQL).fetchall()
    assert len(got) == len(want) > 0
    for g, w in zip(got, want):
        w_id, w_ver, w_cust, w_total, w_lines = w
        assert (g.invoice_id, g.change_version, g.o_custkey) == (w_id, w_ver, w_cust)
        assert abs(g.o_totalprice - w_total) < 1e-6
        g_lines = [tuple(x[f] for f in _LINE_FIELDS) for x in g.lines]
        w_lines = [tuple(d[f] for f in _LINE_FIELDS) for d in w_lines]
        assert g_lines == w_lines, f"line arrays differ for invoice {w_id}"
