"""TPC-H-shaped analytics over the driver's star schema — the recognizable
OLAP workloads (Q3/Q5/Q10/Q18 adapted to the available columns) that the
denormalized-view analytics layer of the reference (Superset over
vw_invoice_header_line) would run, expressed as multi-join DataFrame plans.

Plan shapes these exercise: multi-way joins with dim broadcast, date-range
scan pruning, group-by over join results, having-filters on aggregates,
total-order top-k. Every sort key is made total (ids appended) so top-k is
deterministic cross-engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sql_cdc_spark import tables
from sql_cdc_spark.queries import QueryEntry

_CUTOFF = "1996-03-15"
_YEAR_LO = "1996-01-01"
_YEAR_HI = "1997-01-01"
_Q10_LO = "1996-01-01"
_Q10_HI = "1996-04-01"
_Q18_MIN_QTY = 150


def _revenue_sum() -> F.Column:
    """Order-insensitive revenue aggregate: per-row revenue rounded to
    integer cents, summed exactly as bigint, divided back — the double
    result is identical regardless of summation order, so Spark and DuckDB
    agree bit-for-bit (plain SUM of doubles differs in the last cent)."""
    cents = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
    ).cast("long")
    return F.round(F.sum(cents) / 100.0, 2)


# the DuckDB twin of _revenue_sum
_REV_SQL = (
    "ROUND(SUM(CAST(ROUND(l.l_extendedprice * (1 - l.l_discount) * 100, 0) AS BIGINT)) / 100.0, 2)"
)


def tpch_q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q3: top-10 unshipped orders by revenue for one market segment.
    Catalyst pushes both date predicates into the scans; customer is the
    broadcast dim."""
    cust = tables.load(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = tables.load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit(_CUTOFF).cast("timestamp")
    )
    li = tables.load(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit(_CUTOFF).cast("timestamp")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(_revenue_sum().alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("o_orderdate"), F.asc("l_orderkey"))
        .limit(10)
    )


_Q3_SQL = f"""
SELECT l.l_orderkey, o.o_orderdate, {_REV_SQL} AS revenue
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < TIMESTAMP '{_CUTOFF}'
  AND l.l_shipdate > TIMESTAMP '{_CUTOFF}'
GROUP BY l.l_orderkey, o.o_orderdate
ORDER BY revenue DESC, o.o_orderdate ASC, l.l_orderkey ASC
LIMIT 10
"""


def tpch_q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q5: revenue per nation where customer and supplier share the
    nation, one region, one year — the 6-way star join. nation/region
    broadcast; the c_nationkey = s_nationkey clause rides the join."""
    cust = tables.load(spark, sf_dir, "customer")
    orders = tables.load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit(_YEAR_LO).cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(_YEAR_HI).cast("timestamp"))
    )
    li = tables.load(spark, sf_dir, "lineitem")
    supp = tables.load(spark, sf_dir, "supplier")
    nation = tables.load(spark, sf_dir, "nation")
    region = tables.load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, orders.o_orderkey == li.l_orderkey)
        .join(
            supp,
            (li.l_suppkey == supp.s_suppkey)
            & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(_revenue_sum().alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("n_name"))
    )


_Q5_SQL = f"""
SELECT n.n_name, {_REV_SQL} AS revenue
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON o.o_orderkey = l.l_orderkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
WHERE r.r_name = 'ASIA'
  AND o.o_orderdate >= TIMESTAMP '{_YEAR_LO}'
  AND o.o_orderdate < TIMESTAMP '{_YEAR_HI}'
GROUP BY n.n_name
ORDER BY revenue DESC, n.n_name ASC
"""


def tpch_q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q10: top-20 customers by lost revenue from returned items in one
    quarter."""
    cust = tables.load(spark, sf_dir, "customer")
    orders = tables.load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit(_Q10_LO).cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(_Q10_HI).cast("timestamp"))
    )
    li = tables.load(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    nation = tables.load(spark, sf_dir, "nation")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, orders.o_orderkey == li.l_orderkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(_revenue_sum().alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


_Q10_SQL = f"""
SELECT c.c_custkey, c.c_name, c.c_acctbal, n.n_name,
       {_REV_SQL} AS revenue
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON o.o_orderkey = l.l_orderkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
WHERE o.o_orderdate >= TIMESTAMP '{_Q10_LO}'
  AND o.o_orderdate < TIMESTAMP '{_Q10_HI}'
  AND l.l_returnflag = 'R'
GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
ORDER BY revenue DESC, c.c_custkey ASC
LIMIT 20
"""


def tpch_q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q18: orders whose total quantity exceeds the threshold — aggregate,
    HAVING-filter, then join back to header and customer. The having-set
    is tiny, so it broadcasts into the enrichment joins."""
    li = tables.load(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.round(F.sum("l_quantity"), 2).alias("total_qty"))
        .filter(F.col("total_qty") > _Q18_MIN_QTY)
    )
    orders = tables.load(spark, sf_dir, "orders")
    cust = tables.load(spark, sf_dir, "customer")
    return (
        orders.join(F.broadcast(big), orders.o_orderkey == big.l_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            "o_orderdate",
            "o_totalprice",
            "total_qty",
        )
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(100)
    )


_Q18_SQL = f"""
SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice, b.total_qty
FROM orders o
JOIN (
  SELECT l_orderkey, ROUND(SUM(l_quantity), 2) AS total_qty
  FROM lineitem GROUP BY l_orderkey HAVING ROUND(SUM(l_quantity), 2) > {_Q18_MIN_QTY}
) b ON o.o_orderkey = b.l_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
ORDER BY o.o_totalprice DESC, o.o_orderkey ASC
LIMIT 100
"""

QUERIES: dict[str, QueryEntry] = {
    "tpch_q3_shipping_priority": QueryEntry(tpch_q3_shipping_priority, _Q3_SQL),
    "tpch_q5_local_supplier_volume": QueryEntry(tpch_q5_local_supplier_volume, _Q5_SQL),
    "tpch_q10_returned_items": QueryEntry(tpch_q10_returned_items, _Q10_SQL),
    "tpch_q18_large_orders": QueryEntry(tpch_q18_large_orders, _Q18_SQL),
}
