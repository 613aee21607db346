"""Randomized differential testing: generate simple relational queries
from a tiny AST (project / filter / group-agg over lineitem), render the
SAME AST as both a DataFrame plan and DuckDB SQL, and compare results.
Seeded, so failures are reproducible; widens oracle coverage beyond the
hand-written queries to arbitrary operator combinations."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from sql_cdc_spark import tables
from tests.conftest import SF_DIR, assert_matches_oracle

# columns safe for exact cross-engine comparison (integral doubles, ints,
# strings, no free-floating float arithmetic)
NUM_COLS = ["l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_quantity"]
STR_COLS = ["l_returnflag", "l_linestatus"]
AGGS = ["sum", "min", "max", "count"]
OPS = [("<", "__lt__"), (">", "__gt__"), ("<=", "__le__"), (">=", "__ge__")]


def _gen(rng: random.Random) -> dict:
    n_filters = rng.randint(0, 2)
    filters = []
    for _ in range(n_filters):
        col = rng.choice(NUM_COLS)
        op = rng.choice(OPS)
        val = rng.randint(0, 5000)
        filters.append((col, op, val))
    if rng.random() < 0.5:
        keys = rng.sample(STR_COLS + ["l_linenumber"], rng.randint(1, 2))
        aggs = []
        for _ in range(rng.randint(1, 3)):
            fn = rng.choice(AGGS)
            col = rng.choice(NUM_COLS)
            aggs.append((fn, col, f"{fn}_{col}_{len(aggs)}"))
        return {"filters": filters, "group": keys, "aggs": aggs}
    cols = rng.sample(NUM_COLS + STR_COLS, rng.randint(2, 4))
    return {"filters": filters, "project": cols}


def _to_spark(spark, q: dict):
    df = tables.load(spark, SF_DIR, "lineitem")
    for col, (_, pyop), val in q["filters"]:
        df = df.filter(getattr(F.col(col), pyop)(F.lit(val)))
    if "group" in q:
        aggs = [
            (F.count(F.lit(1)) if fn == "count" else getattr(F, fn)(col)).alias(out)
            for fn, col, out in q["aggs"]
        ]
        return df.groupBy(*q["group"]).agg(*aggs)
    return df.select(*q["project"])


def _to_sql(q: dict) -> str:
    where = " AND ".join(
        f"{col} {sqlop} {val}" for col, (sqlop, _), val in q["filters"]
    )
    where = f"WHERE {where}" if where else ""
    if "group" in q:
        sel = ", ".join(q["group"])
        aggs = ", ".join(
            ("COUNT(*)" if fn == "count" else f"{fn.upper()}({col})") + f" AS {out}"
            for fn, col, out in q["aggs"]
        )
        return (
            f"SELECT {sel}, {aggs} FROM lineitem {where} "
            f"GROUP BY {', '.join(q['group'])}"
        )
    return f"SELECT {', '.join(q['project'])} FROM lineitem {where}"


@pytest.mark.parametrize("seed", range(25))
def test_random_query_matches_duckdb(spark, oracle, seed):
    rng = random.Random(1000 + seed)
    q = _gen(rng)
    assert_matches_oracle(_to_spark(spark, q), oracle, _to_sql(q))
