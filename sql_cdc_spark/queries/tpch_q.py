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

def tpch_q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q6: forecast-revenue delta — one filtered scan, no join, single
    aggregate. All three predicates push into the parquet scan; the sum is
    integer-cents-exact so both engines produce the identical double.
    revenue = SUM(extendedprice * discount) over one shipdate year,
    discount within ±0.01 of 0.06, small quantities."""
    li = tables.load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit(_YEAR_LO).cast("timestamp"))
        & (F.col("l_shipdate") < F.lit(_YEAR_HI).cast("timestamp"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    )
    cents = F.round(F.col("l_extendedprice") * F.col("l_discount") * 100).cast(
        "long"
    )
    return li.agg(
        (F.sum(cents) / 100.0).alias("revenue"),
        F.count(F.lit(1)).alias("n_lines"),
    )


_Q6_SQL = f"""
SELECT SUM(CAST(ROUND(l_extendedprice * l_discount * 100, 0) AS BIGINT)) / 100.0 AS revenue,
       COUNT(*) AS n_lines
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '{_YEAR_LO}'
  AND l_shipdate < TIMESTAMP '{_YEAR_HI}'
  AND l_discount >= CAST(0.05 AS DOUBLE) AND l_discount <= CAST(0.07 AS DOUBLE)
  AND l_quantity < 24
"""


def tpch_q4_late_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q4 shape adapted to the available columns (the test schema carries
    no l_commitdate/l_receiptdate): orders in one quarter that have at
    least one line shipped after the order date, counted per priority.
    The EXISTS becomes a left-semi join with a non-equi clause riding the
    key condition — Catalyst keeps it a single shuffled semi join, exact
    integer counts."""
    orders = tables.load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit(_Q10_LO).cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(_Q10_HI).cast("timestamp"))
    )
    li = tables.load(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = orders.join(
        li,
        (orders.o_orderkey == li.l_orderkey)
        & (li.l_shipdate > orders.o_orderdate),
        "left_semi",
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .orderBy("o_orderpriority")
    )


_Q4_SQL = f"""
SELECT o.o_orderpriority, COUNT(*) AS n_orders
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '{_Q10_LO}'
  AND o.o_orderdate < TIMESTAMP '{_Q10_HI}'
  AND EXISTS (
    SELECT 1 FROM lineitem l
    WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate
  )
GROUP BY o.o_orderpriority
ORDER BY o.o_orderpriority
"""


def tpch_q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q14: monthly promo-revenue share — lineitem ⨝ broadcast(part) with
    a conditional aggregate. Revenue is cents-exact on both branches; the
    share is one double division of two exact bigints, identical
    cross-engine. Grouped by calendar month (integer year/month columns —
    no timestamp output, per the oracle determinism rules)."""
    li = tables.load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit(_YEAR_LO).cast("timestamp"))
        & (F.col("l_shipdate") < F.lit(_YEAR_HI).cast("timestamp"))
    )
    part = tables.load(spark, sf_dir, "part").select("p_partkey", "p_type")
    cents = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
    ).cast("long")
    promo_cents = F.when(F.col("p_type") == "PROMO", cents).otherwise(F.lit(0))
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy(
            F.year("l_shipdate").alias("ship_year"),
            F.month("l_shipdate").alias("ship_month"),
        )
        .agg(
            (F.sum(promo_cents) / 100.0).alias("promo_revenue"),
            (F.sum(cents) / 100.0).alias("total_revenue"),
            F.round(F.sum(promo_cents) / F.sum(cents), 6).alias("promo_share"),
        )
        .orderBy("ship_year", "ship_month")
    )


_Q14_SQL = f"""
SELECT CAST(EXTRACT(YEAR FROM l.l_shipdate) AS INTEGER) AS ship_year,
       CAST(EXTRACT(MONTH FROM l.l_shipdate) AS INTEGER) AS ship_month,
       SUM(CASE WHEN p.p_type = 'PROMO'
                THEN CAST(ROUND(l.l_extendedprice * (1 - l.l_discount) * 100, 0) AS BIGINT)
                ELSE 0 END) / 100.0 AS promo_revenue,
       SUM(CAST(ROUND(l.l_extendedprice * (1 - l.l_discount) * 100, 0) AS BIGINT)) / 100.0 AS total_revenue,
       ROUND(SUM(CASE WHEN p.p_type = 'PROMO'
                      THEN CAST(ROUND(l.l_extendedprice * (1 - l.l_discount) * 100, 0) AS BIGINT)
                      ELSE 0 END)
             / CAST(SUM(CAST(ROUND(l.l_extendedprice * (1 - l.l_discount) * 100, 0) AS BIGINT)) AS DOUBLE),
             6) AS promo_share
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
WHERE l.l_shipdate >= TIMESTAMP '{_YEAR_LO}'
  AND l.l_shipdate < TIMESTAMP '{_YEAR_HI}'
GROUP BY 1, 2
ORDER BY 1, 2
"""


def tpch_q12_priority_by_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q12 shape adapted to the available columns (the test schema carries
    no l_shipmode): per line-status counts of high- vs low-priority order
    lines shipped in one year. The classic conditional aggregate — two
    CASE branches folded into one grouped pass, orders joined once.
    Exact integer counts; the year predicate pushes into the lineitem
    scan and orders is the smaller probe side."""
    li = tables.load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit(_YEAR_LO).cast("timestamp"))
        & (F.col("l_shipdate") < F.lit(_YEAR_HI).cast("timestamp"))
    )
    orders = tables.load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority"
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_priority_lines"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_priority_lines"),
        )
        .orderBy("l_linestatus")
    )


_Q12_SQL = f"""
SELECT l.l_linestatus,
       CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_priority_lines,
       CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 0 ELSE 1 END) AS BIGINT) AS low_priority_lines
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
WHERE l.l_shipdate >= TIMESTAMP '{_YEAR_LO}'
  AND l.l_shipdate < TIMESTAMP '{_YEAR_HI}'
GROUP BY l.l_linestatus
ORDER BY l.l_linestatus
"""


_Q7_NATION_A = "NATION_1"
_Q7_NATION_B = "NATION_2"
_Q7_LO = "1996-01-01"
_Q7_HI = "1998-01-01"


def tpch_q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q7: shipping volume between a nation pair (both directions) per
    ship year — the dual-role dimension query: nation joins TWICE, once
    through supplier and once through customer. Both nation sides are
    pre-filtered to the two pair members BEFORE the join, so the
    broadcast dims prune suppliers/customers to ~2/25 of the corpus at
    the scan edge; the cross-pair condition (A→B or B→A) is one boolean
    on the already-joined names. Revenue is cents-exact."""
    pair = [_Q7_NATION_A, _Q7_NATION_B]
    nation = tables.load(spark, sf_dir, "nation").filter(
        F.col("n_name").isin(pair)
    )
    supp = (
        tables.load(spark, sf_dir, "supplier")
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    cust = (
        tables.load(spark, sf_dir, "customer")
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .select("c_custkey", F.col("n_name").alias("cust_nation"))
    )
    li = tables.load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit(_Q7_LO).cast("timestamp"))
        & (F.col("l_shipdate") < F.lit(_Q7_HI).cast("timestamp"))
    )
    orders = tables.load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    return (
        li.join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .filter(
            (
                (F.col("supp_nation") == _Q7_NATION_A)
                & (F.col("cust_nation") == _Q7_NATION_B)
            )
            | (
                (F.col("supp_nation") == _Q7_NATION_B)
                & (F.col("cust_nation") == _Q7_NATION_A)
            )
        )
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").alias("ship_year"),
        )
        .agg(_revenue_sum().alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "ship_year")
    )


_Q7_SQL = f"""
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(EXTRACT(YEAR FROM l.l_shipdate) AS INTEGER) AS ship_year,
       {_REV_SQL} AS revenue
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
WHERE ((n1.n_name = '{_Q7_NATION_A}' AND n2.n_name = '{_Q7_NATION_B}')
    OR (n1.n_name = '{_Q7_NATION_B}' AND n2.n_name = '{_Q7_NATION_A}'))
  AND l.l_shipdate >= TIMESTAMP '{_Q7_LO}'
  AND l.l_shipdate < TIMESTAMP '{_Q7_HI}'
GROUP BY 1, 2, 3
ORDER BY 1, 2, 3
"""


_Q8_NATION = "NATION_7"  # in ASIA (regionkey 2)
_Q8_REGION = "ASIA"
_Q8_TYPE = "STANDARD"


def tpch_q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q8: one nation's market share of a part type sold into a region,
    per order year — the two-level conditional aggregate over an 8-table
    star. All four dims (part, supplier-nation, customer-nation-region)
    broadcast; lineitem is the only big side and is touched once. The
    share is a single double division of two cents-exact bigints, so it
    is bit-identical cross-engine."""
    part = tables.load(spark, sf_dir, "part").filter(
        F.col("p_type") == _Q8_TYPE
    ).select("p_partkey")
    nation = tables.load(spark, sf_dir, "nation")
    region = tables.load(spark, sf_dir, "region").filter(
        F.col("r_name") == _Q8_REGION
    )
    supp = (
        tables.load(spark, sf_dir, "supplier")
        .join(
            F.broadcast(nation.select("n_nationkey", "n_name")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    # customers restricted to the target region (nation ⨝ region first —
    # both tiny, the filtered nation set broadcasts into customer)
    region_nations = nation.join(
        F.broadcast(region), nation.n_regionkey == region.r_regionkey
    ).select("n_nationkey")
    cust = (
        tables.load(spark, sf_dir, "customer")
        .join(
            F.broadcast(region_nations),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .select("c_custkey")
    )
    orders = tables.load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit(_Q7_LO).cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(_Q7_HI).cast("timestamp"))
    )
    li = tables.load(spark, sf_dir, "lineitem")
    cents = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
    ).cast("long")
    nation_cents = F.when(
        F.col("supp_nation") == _Q8_NATION, cents
    ).otherwise(F.lit(0))
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            (F.sum(nation_cents) / 100.0).alias("nation_revenue"),
            (F.sum(cents) / 100.0).alias("total_revenue"),
            F.round(F.sum(nation_cents) / F.sum(cents), 6).alias("mkt_share"),
        )
        .orderBy("o_year")
    )


_Q8_CENTS = "CAST(ROUND(l.l_extendedprice * (1 - l.l_discount) * 100, 0) AS BIGINT)"
_Q8_NAT_CENTS = f"CASE WHEN n2.n_name = '{_Q8_NATION}' THEN {_Q8_CENTS} ELSE 0 END"
_Q8_SQL = f"""
SELECT CAST(EXTRACT(YEAR FROM o.o_orderdate) AS INTEGER) AS o_year,
       SUM({_Q8_NAT_CENTS}) / 100.0 AS nation_revenue,
       SUM({_Q8_CENTS}) / 100.0 AS total_revenue,
       ROUND(SUM({_Q8_NAT_CENTS}) / CAST(SUM({_Q8_CENTS}) AS DOUBLE), 6) AS mkt_share
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation n2 ON s.s_nationkey = n2.n_nationkey
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n1 ON c.c_nationkey = n1.n_nationkey
JOIN region r ON n1.n_regionkey = r.r_regionkey
WHERE r.r_name = '{_Q8_REGION}' AND p.p_type = '{_Q8_TYPE}'
  AND o.o_orderdate >= TIMESTAMP '{_Q7_LO}'
  AND o.o_orderdate < TIMESTAMP '{_Q7_HI}'
GROUP BY 1
ORDER BY 1
"""


_Q21_LATE_DAYS = 90


def tpch_q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q21 shape adapted to the available columns (no l_receiptdate /
    l_commitdate — "late" is a line shipped more than _Q21_LATE_DAYS
    after its order date, the same adaptation Q4 uses): suppliers who
    were the SOLE late supplier on a multi-supplier finished order,
    counted by waiting order. The classic EXISTS / NOT-EXISTS chain is
    decorrelated into two grouped passes — per-(order, supplier) late
    flags, then per-order supplier/late counts via a window over the
    order key — instead of two correlated self-joins of lineitem; the
    count per supplier is of distinct waiting ORDERS, matching the
    grouped form. Scale shape: one shuffle on l_orderkey (the groupBy;
    the window reuses that partitioning with per-order partitions of
    ≤|suppliers-per-order| rows), one on l_suppkey; supplier is a
    broadcast dim. No self-join of the fact table at all.

    Reference parity: the sole-blocker diagnostic the reference's
    invoice pipeline answers with correlated T-SQL subqueries over the
    header/line views (sqls/vw_Invoicedetails.sql builds the same
    header⨝line shape)."""
    from pyspark.sql.window import Window

    orders = tables.load(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    ).select("o_orderkey", "o_orderdate")
    li = tables.load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    late = F.when(
        F.col("l_shipdate")
        > F.col("o_orderdate") + F.expr(f"INTERVAL {_Q21_LATE_DAYS} DAYS"),
        1,
    ).otherwise(0)
    per_supp = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_orderkey", "l_suppkey")
        .agg(F.max(late).alias("late"))
    )
    w = Window.partitionBy("l_orderkey")
    waiting = (
        per_supp.withColumn("n_supps", F.count(F.lit(1)).over(w))
        .withColumn("n_late", F.sum("late").over(w))
        .filter(
            (F.col("late") == 1) & (F.col("n_supps") >= 2) & (F.col("n_late") == 1)
        )
    )
    supp = tables.load(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        waiting.groupBy("l_suppkey")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .join(F.broadcast(supp), F.col("l_suppkey") == supp.s_suppkey)
        .select("s_name", "numwait")
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(100)
    )


_Q21_SQL = f"""
SELECT s.s_name, CAST(COUNT(DISTINCT l1.l_orderkey) AS BIGINT) AS numwait
FROM supplier s
JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
JOIN orders o ON o.o_orderkey = l1.l_orderkey
WHERE o.o_orderstatus = 'F'
  AND l1.l_shipdate > o.o_orderdate + INTERVAL {_Q21_LATE_DAYS} DAY
  AND EXISTS (
    SELECT 1 FROM lineitem l2
    WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
  )
  AND NOT EXISTS (
    SELECT 1 FROM lineitem l3
    WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
      AND l3.l_shipdate > o.o_orderdate + INTERVAL {_Q21_LATE_DAYS} DAY
  )
GROUP BY s.s_name
ORDER BY numwait DESC, s.s_name ASC
LIMIT 100
"""


def tpch_q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q13: distribution of customers by order count, with a predicate
    riding the OUTER join's ON clause (orders of one priority excluded
    WITHOUT dropping order-less customers — the classic outer-join
    pushdown trap; the test schema has no o_comment, so the priority
    filter stands in for the NOT LIKE). Plan shape: the order count is
    aggregated BELOW the outer join, so the join input is |customer| +
    |customers-with-orders| rows, never |orders| — the plan you want at
    100 TB where the classic join-then-count form shuffles the fact
    table."""
    cust = tables.load(spark, sf_dir, "customer").select("c_custkey")
    cnt = (
        tables.load(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") != "1-URGENT")
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("__n"))
    )
    per_cust = cust.join(cnt, cust.c_custkey == cnt.o_custkey, "left").select(
        "c_custkey", F.coalesce(F.col("__n"), F.lit(0)).alias("c_count")
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


_Q13_SQL = """
SELECT c_count, COUNT(*) AS custdist FROM (
  SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
  FROM customer c LEFT JOIN orders o
    ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
  GROUP BY c.c_custkey) cc
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


_Q17_BRAND = "Brand#3"


def tpch_q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q17: average yearly revenue lost if small-quantity orders (below
    20% of the part's average order quantity) were not filled — the
    correlated-average-subquery query. Decorrelated as one per-part
    (sum, count) aggregate broadcast back onto the brand-filtered lines;
    the 20%-of-average comparison is the EXACT integer form
    5·qty·n < Σqty (quantities are integral), so no float threshold
    knife-edge exists cross-engine. The brand filter makes the per-part
    aggregate a small broadcast side."""
    part = (
        tables.load(spark, sf_dir, "part")
        .filter(F.col("p_brand") == _Q17_BRAND)
        .select("p_partkey")
    )
    li = tables.load(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    sel = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    qty = F.round(F.col("l_quantity")).cast("long")
    per_part = sel.groupBy("p_partkey").agg(
        F.sum(qty).alias("__s"), F.count(F.lit(1)).alias("__n")
    ).withColumnRenamed("p_partkey", "__pk")
    cents = F.round(F.col("l_extendedprice") * 100).cast("long")
    return (
        sel.join(F.broadcast(per_part), sel.l_partkey == F.col("__pk"))
        .filter(F.lit(5) * qty * F.col("__n") < F.col("__s"))
        .agg(
            (F.sum(cents) / 100.0 / 7.0).alias("avg_yearly"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


_Q17_SQL = f"""
WITH pp AS (
  SELECT l_partkey, SUM(CAST(ROUND(l_quantity, 0) AS BIGINT)) AS s, COUNT(*) AS n
  FROM lineitem GROUP BY 1
)
SELECT SUM(CAST(ROUND(l.l_extendedprice * 100, 0) AS BIGINT)) / 100.0 / 7.0 AS avg_yearly,
       COUNT(*) AS n_lines
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
JOIN pp ON pp.l_partkey = l.l_partkey
WHERE p.p_brand = '{_Q17_BRAND}'
  AND 5 * CAST(l.l_quantity AS BIGINT) * pp.n < pp.s
"""


_Q22_CUTOFF = "2000-07-01"  # dormancy window: no orders on/after this date
_Q22_CODES = [f"{i:02d}" for i in range(25)]


def tpch_q22_global_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q22: dormant high-balance customers per country code — scalar
    subquery (average positive balance) + anti join (no RECENT orders;
    every customer in this dataset has some order, so the classic
    no-orders-ever predicate is adapted to a dormancy window) + group by
    a substring code (last two digits of the zero-padded customer name —
    the schema has no phone column). The above-average comparison is the
    exact integer form bal·n > Σbal over cents, so the threshold has no
    float knife-edge; the scalar aggregate broadcasts."""
    code = F.expr("right(c_name, 2)")
    bal_c = F.round(F.col("c_acctbal") * 100).cast("long")
    pool = (
        tables.load(spark, sf_dir, "customer")
        .select(code.alias("cntrycode"), "c_custkey", bal_c.alias("bal_c"))
        .filter(F.col("cntrycode").isin(_Q22_CODES))
    )
    stats = pool.filter(F.col("bal_c") > 0).agg(
        F.sum("bal_c").alias("__s"), F.count(F.lit(1)).alias("__n")
    )
    recent = tables.load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit(_Q22_CUTOFF).cast("timestamp")
    ).select("o_custkey")
    return (
        pool.crossJoin(F.broadcast(stats))
        .filter(F.col("bal_c") * F.col("__n") > F.col("__s"))
        .join(recent, pool.c_custkey == recent.o_custkey, "left_anti")
        .groupBy("cntrycode")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            (F.sum("bal_c") / 100.0).alias("totacctbal"),
        )
        .orderBy("cntrycode")
    )


_Q22_IN = ", ".join(f"'{c}'" for c in _Q22_CODES)
_Q22_SQL = f"""
WITH pool AS (
  SELECT right(c_name, 2) AS cntrycode, c_custkey,
         CAST(ROUND(c_acctbal * 100, 0) AS BIGINT) AS bal_c
  FROM customer WHERE right(c_name, 2) IN ({_Q22_IN})
),
stats AS (SELECT SUM(bal_c) AS s, COUNT(*) AS n FROM pool WHERE bal_c > 0)
SELECT cntrycode, CAST(COUNT(*) AS BIGINT) AS numcust,
       SUM(bal_c) / 100.0 AS totacctbal
FROM pool, stats
WHERE bal_c * n > s
  AND NOT EXISTS (
    SELECT 1 FROM orders o
    WHERE o.o_custkey = pool.c_custkey
      AND o.o_orderdate >= TIMESTAMP '{_Q22_CUTOFF}'
  )
GROUP BY cntrycode
ORDER BY cntrycode
"""


# Q19's three disjunctive (brand, size-range, quantity-range) branches
_Q19_BRANCHES = [
    ("Brand#3", 1, 10, 1, 11),
    ("Brand#12", 5, 20, 10, 20),
    ("Brand#21", 15, 35, 20, 30),
]


def tpch_q19_discounted_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q19: revenue from an OR of three (brand, size-range, qty-range)
    branches — the disjunctive-predicate query optimizers love to get
    wrong. Expressed as one boolean OR so Catalyst keeps a single
    broadcast-hash join over part with the common qty/size bounds pushed
    into both scans; no UNION of three passes, no re-scan. Revenue is
    cents-exact (order-insensitive bigint sum)."""
    li = tables.load(spark, sf_dir, "lineitem")
    part = tables.load(spark, sf_dir, "part").select(
        "p_partkey", "p_brand", "p_size"
    )
    branch = None
    for brand, size_lo, size_hi, qty_lo, qty_hi in _Q19_BRANCHES:
        cond = (
            (F.col("p_brand") == brand)
            & (F.col("p_size") >= size_lo)
            & (F.col("p_size") <= size_hi)
            & (F.col("l_quantity") >= qty_lo)
            & (F.col("l_quantity") <= qty_hi)
        )
        branch = cond if branch is None else branch | cond
    cents = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
    ).cast("long")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .filter(branch)
        .agg(
            (F.sum(cents) / 100.0).alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


_Q19_WHERE = " OR ".join(
    f"(p.p_brand = '{b}' AND p.p_size BETWEEN {slo} AND {shi}"
    f" AND l.l_quantity BETWEEN {qlo} AND {qhi})"
    for b, slo, shi, qlo, qhi in _Q19_BRANCHES
)
_Q19_SQL = f"""
SELECT SUM(CAST(ROUND(l.l_extendedprice * (1 - l.l_discount) * 100, 0) AS BIGINT)) / 100.0 AS revenue,
       COUNT(*) AS n_lines
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
WHERE {_Q19_WHERE}
"""


_Q1_CUTOFF = "2000-09-02"


def tpch_q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q1: the full pricing-summary report — one pass over lineitem with
    eight aggregates per (returnflag, linestatus). Complements
    rel_pricing_summary (the reduced Q1 shape) with the canonical column
    set incl. tax charge. All money sums are cents-exact bigint sums
    (order-insensitive); averages divide exact integer sums so the double
    result is identical cross-engine. Single scan, map-side partial agg,
    4-row output — scan-bound at any scale."""
    li = tables.load(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit(_Q1_CUTOFF).cast("timestamp")
    )
    qty = F.round(F.col("l_quantity")).cast("long")
    base_c = F.round(F.col("l_extendedprice") * 100).cast("long")
    disc_c = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
    ).cast("long")
    charge_c = F.round(
        F.col("l_extendedprice")
        * (1 - F.col("l_discount"))
        * (1 + F.col("l_tax"))
        * 100
    ).cast("long")
    disc_bp = F.round(F.col("l_discount") * 100).cast("long")
    n = F.count(F.lit(1))
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(qty).alias("sum_qty"),
            (F.sum(base_c) / 100.0).alias("sum_base_price"),
            (F.sum(disc_c) / 100.0).alias("sum_disc_price"),
            (F.sum(charge_c) / 100.0).alias("sum_charge"),
            F.round(F.sum(qty) / n, 4).alias("avg_qty"),
            F.round(F.sum(base_c) / 100.0 / n, 4).alias("avg_price"),
            F.round(F.sum(disc_bp) / 100.0 / n, 4).alias("avg_disc"),
            n.alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


_Q1_SQL = f"""
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(ROUND(l_quantity, 0) AS BIGINT)) AS BIGINT) AS sum_qty,
       SUM(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)) / 100.0 AS sum_base_price,
       SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100, 0) AS BIGINT)) / 100.0 AS sum_disc_price,
       SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * (1 + l_tax) * 100, 0) AS BIGINT)) / 100.0 AS sum_charge,
       ROUND(SUM(CAST(ROUND(l_quantity, 0) AS BIGINT)) / COUNT(*), 4) AS avg_qty,
       ROUND(SUM(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)) / 100.0 / COUNT(*), 4) AS avg_price,
       ROUND(SUM(CAST(ROUND(l_discount * 100, 0) AS BIGINT)) / 100.0 / COUNT(*), 4) AS avg_disc,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '{_Q1_CUTOFF}'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


_Q2_TYPE = "STANDARD"
_Q2_MAX_SIZE = 10
_Q2_REGION = "EUROPE"


def tpch_q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2: minimum-cost supplier — the correlated-MIN-subquery query.
    The schema has no partsupp, so the supply relation is derived from
    sales history: cost(part, supplier) = MIN observed sale price in
    cents. The correlated `cost = (SELECT MIN ... WHERE same part, same
    region)` is decorrelated into one per-part MIN over the
    region-filtered supply, joined back by equality on exact integer
    cents — no float knife-edge. supplier(100)/nation/region broadcast;
    the only fact-sized shuffle is the (part, supplier) aggregate."""
    li = tables.load(spark, sf_dir, "lineitem")
    cents = F.round(F.col("l_extendedprice") * 100).cast("long")
    supply = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min(cents).alias("cost_c")
    )
    nation = tables.load(spark, sf_dir, "nation")
    region = tables.load(spark, sf_dir, "region").filter(
        F.col("r_name") == _Q2_REGION
    )
    supp = (
        tables.load(spark, sf_dir, "supplier")
        .join(F.broadcast(nation), F.col("s_nationkey") == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    sup_reg = supply.join(
        F.broadcast(supp), supply.l_suppkey == supp.s_suppkey
    )
    min_c = sup_reg.groupBy("l_partkey").agg(F.min("cost_c").alias("__min_c"))
    part = tables.load(spark, sf_dir, "part").filter(
        (F.col("p_type") == _Q2_TYPE) & (F.col("p_size") <= _Q2_MAX_SIZE)
    )
    return (
        sup_reg.join(F.broadcast(min_c), "l_partkey")
        .filter(F.col("cost_c") == F.col("__min_c"))
        .join(F.broadcast(part), sup_reg.l_partkey == part.p_partkey)
        .select(
            "s_acctbal",
            "s_name",
            "n_name",
            "p_partkey",
            "p_name",
            (F.col("cost_c") / 100.0).alias("supplycost"),
        )
        .orderBy(
            F.desc("s_acctbal"), F.asc("n_name"), F.asc("s_name"),
            F.asc("p_partkey"),
        )
        .limit(100)
    )


_Q2_SQL = f"""
WITH supply AS (
  SELECT l_partkey, l_suppkey,
         MIN(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)) AS cost_c
  FROM lineitem GROUP BY 1, 2
),
sup_reg AS (
  SELECT sp.l_partkey, sp.cost_c, s.s_suppkey, s.s_name, s.s_acctbal, n.n_name
  FROM supply sp
  JOIN supplier s ON sp.l_suppkey = s.s_suppkey
  JOIN nation n ON s.s_nationkey = n.n_nationkey
  JOIN region r ON n.n_regionkey = r.r_regionkey
  WHERE r.r_name = '{_Q2_REGION}'
)
SELECT sr.s_acctbal, sr.s_name, sr.n_name, p.p_partkey, p.p_name,
       sr.cost_c / 100.0 AS supplycost
FROM sup_reg sr
JOIN part p ON sr.l_partkey = p.p_partkey
WHERE p.p_type = '{_Q2_TYPE}' AND p.p_size <= {_Q2_MAX_SIZE}
  AND sr.cost_c = (SELECT MIN(sr2.cost_c) FROM sup_reg sr2
                   WHERE sr2.l_partkey = sr.l_partkey)
ORDER BY sr.s_acctbal DESC, sr.n_name ASC, sr.s_name ASC, p.p_partkey ASC
LIMIT 100
"""


_Q9_NAME_FRAG = "bolt"


def tpch_q9_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q9: profit by supplier nation and order year for parts matching a
    name fragment. The schema has no ps_supplycost, so cost is the
    part's list price × quantity (p_retailprice carries exact cents);
    profit = sale cents − cost cents, both exact bigints, so the per-row
    amount and every group sum are bit-identical cross-engine. part is
    the filtered broadcast dim; supplier/nation broadcast; the single
    big shuffle is lineitem⨝orders on orderkey then the group-by."""
    part = (
        tables.load(spark, sf_dir, "part")
        .filter(F.col("p_name").contains(_Q9_NAME_FRAG))
        .select("p_partkey", "p_retailprice")
    )
    li = tables.load(spark, sf_dir, "lineitem")
    orders = tables.load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate"
    )
    supp = tables.load(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey"
    )
    nation = tables.load(spark, sf_dir, "nation")
    sale_c = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
    ).cast("long")
    cost_c = (
        F.round(F.col("p_retailprice") * 100).cast("long")
        * F.round(F.col("l_quantity")).cast("long")
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
        )
        .agg((F.sum(sale_c - cost_c) / 100.0).alias("sum_profit"))
        .orderBy(F.asc("nation"), F.desc("o_year"))
    )


_Q9_SQL = f"""
SELECT n.n_name AS nation,
       CAST(EXTRACT(year FROM o.o_orderdate) AS BIGINT) AS o_year,
       SUM(CAST(ROUND(l.l_extendedprice * (1 - l.l_discount) * 100, 0) AS BIGINT)
           - CAST(ROUND(p.p_retailprice * 100, 0) AS BIGINT)
             * CAST(l.l_quantity AS BIGINT)) / 100.0 AS sum_profit
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
WHERE p.p_name LIKE '%{_Q9_NAME_FRAG}%'
GROUP BY 1, 2
ORDER BY nation ASC, o_year DESC
"""


_Q11_NATION = "NATION_3"
_Q11_FRAC_BP = 20  # keep parts holding > 20 basis points of total value


def tpch_q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q11: parts representing a significant share of one nation's stock
    value — the two-level aggregate with a scalar-subquery threshold.
    Stock value is derived from sales (no partsupp in the schema):
    value(part) = Σ sale cents over the nation's suppliers. The HAVING
    `value > frac · Σ value` comparison is the exact integer cross-
    multiplication value_c·10000 > total_c·frac_bp, so no float
    threshold knife-edge. The scalar total broadcasts; one fact shuffle
    (group by part)."""
    nation = tables.load(spark, sf_dir, "nation").filter(
        F.col("n_name") == _Q11_NATION
    )
    supp = (
        tables.load(spark, sf_dir, "supplier")
        .join(F.broadcast(nation), F.col("s_nationkey") == nation.n_nationkey)
        .select("s_suppkey")
    )
    li = tables.load(spark, sf_dir, "lineitem")
    cents = F.round(F.col("l_extendedprice") * 100).cast("long")
    value = (
        li.join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .groupBy(F.col("l_partkey").alias("p_partkey"))
        .agg(F.sum(cents).alias("value_c"))
        # materialize the per-part aggregate (|parts| rows) so the scalar
        # total and the HAVING filter both read it — without this the
        # scalar branch re-scans and re-aggregates the fact table
        # (verified: no ReusedExchange in the AQE final plan)
        .localCheckpoint()
    )
    total = value.agg(F.sum("value_c").alias("__total_c"))
    return (
        value.crossJoin(F.broadcast(total))
        .filter(
            F.col("value_c") * F.lit(10000)
            > F.col("__total_c") * F.lit(_Q11_FRAC_BP)
        )
        .select("p_partkey", (F.col("value_c") / 100.0).alias("value"))
        .orderBy(F.desc("value"), F.asc("p_partkey"))
    )


_Q11_SQL = f"""
WITH value AS (
  SELECT l.l_partkey AS p_partkey,
         SUM(CAST(ROUND(l.l_extendedprice * 100, 0) AS BIGINT)) AS value_c
  FROM lineitem l
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN nation n ON s.s_nationkey = n.n_nationkey
  WHERE n.n_name = '{_Q11_NATION}'
  GROUP BY 1
),
total AS (SELECT SUM(value_c) AS total_c FROM value)
SELECT v.p_partkey, v.value_c / 100.0 AS value
FROM value v, total t
WHERE v.value_c * 10000 > t.total_c * {_Q11_FRAC_BP}
ORDER BY value DESC, v.p_partkey ASC
"""


_Q15_LO = "1996-01-01"
_Q15_HI = "1996-04-01"


def tpch_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q15: the supplier(s) with maximum revenue in one quarter — the
    view + scalar-MAX-subquery query. Revenue is an exact cents bigint
    per supplier, the max broadcasts back, and equality on exact
    integers keeps ties (the spec's intent) deterministic cross-engine.
    One fact shuffle (group by supplier, 100 groups)."""
    li = tables.load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit(_Q15_LO).cast("timestamp"))
        & (F.col("l_shipdate") < F.lit(_Q15_HI).cast("timestamp"))
    )
    cents = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
    ).cast("long")
    # materialize the per-supplier aggregate (|suppliers| rows) so the
    # scalar MAX and the tie-keeping equality filter both read it — the
    # AQE final plan otherwise recomputes the whole scan+agg subtree on
    # the broadcast side (no ReusedExchange)
    rev = (
        li.groupBy("l_suppkey")
        .agg(F.sum(cents).alias("rev_c"))
        .localCheckpoint()
    )
    mx = rev.agg(F.max("rev_c").alias("__max_c"))
    supp = tables.load(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name"
    )
    return (
        rev.crossJoin(F.broadcast(mx))
        .filter(F.col("rev_c") == F.col("__max_c"))
        .join(F.broadcast(supp), rev.l_suppkey == supp.s_suppkey)
        .select(
            "s_suppkey", "s_name", (F.col("rev_c") / 100.0).alias("total_revenue")
        )
        .orderBy("s_suppkey")
    )


_Q15_SQL = f"""
WITH rev AS (
  SELECT l_suppkey,
         SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100, 0) AS BIGINT)) AS rev_c
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '{_Q15_LO}'
    AND l_shipdate < TIMESTAMP '{_Q15_HI}'
  GROUP BY 1
)
SELECT s.s_suppkey, s.s_name, r.rev_c / 100.0 AS total_revenue
FROM rev r
JOIN supplier s ON r.l_suppkey = s.s_suppkey
WHERE r.rev_c = (SELECT MAX(rev_c) FROM rev)
ORDER BY s.s_suppkey
"""


_Q16_BAD_BRAND = "Brand#5"
_Q16_BAD_TYPE = "PROMO"
_Q16_SIZES = [3, 9, 14, 19, 23, 36, 45, 49]


def tpch_q16_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q16: how many suppliers can supply each (brand, type, size) —
    COUNT(DISTINCT) over a derived supply relation with a NOT-IN
    supplier exclusion. The supply relation comes from sales history;
    the 'customer complaints' exclusion (no comment column) is adapted
    to negative-balance suppliers via a broadcast anti-join. The
    distinct is pre-shrunk to (brand, type, size, supplier) before the
    count so the shuffle carries deduped rows only."""
    part = tables.load(spark, sf_dir, "part").filter(
        (F.col("p_brand") != _Q16_BAD_BRAND)
        & (F.col("p_type") != _Q16_BAD_TYPE)
        & F.col("p_size").isin(_Q16_SIZES)
    )
    bad = (
        tables.load(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    li = tables.load(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey"
    )
    return (
        li.join(F.broadcast(bad), li.l_suppkey == bad.s_suppkey, "left_anti")
        .join(F.broadcast(part), F.col("l_partkey") == part.p_partkey)
        .select("p_brand", "p_type", "p_size", "l_suppkey")
        .distinct()
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(
            F.desc("supplier_cnt"), F.asc("p_brand"), F.asc("p_type"),
            F.asc("p_size"),
        )
    )


_Q16_SIZES_IN = ", ".join(str(s) for s in _Q16_SIZES)
_Q16_SQL = f"""
SELECT p.p_brand, p.p_type, p.p_size,
       COUNT(DISTINCT l.l_suppkey) AS supplier_cnt
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
WHERE p.p_brand <> '{_Q16_BAD_BRAND}'
  AND p.p_type <> '{_Q16_BAD_TYPE}'
  AND p.p_size IN ({_Q16_SIZES_IN})
  AND l.l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY 1, 2, 3
ORDER BY supplier_cnt DESC, p.p_brand ASC, p.p_type ASC, p.p_size ASC
"""


_Q20_NAME_PREFIX = "red"
_Q20_YEAR_LO = "1996-01-01"
_Q20_YEAR_HI = "1997-01-01"
_Q20_REGION = "EUROPE"


def tpch_q20_excess_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q20: suppliers holding excess stock of a part family — the
    nested-IN-subquery query. Without ps_availqty the 'availability >
    half of the year's shipments' predicate is adapted to shipment
    concentration: a (supplier, part) pair qualifies when its 1996
    shipped quantity exceeds 30% of its all-time quantity, the exact
    integer cross-multiplication 10·q96 > 3·qtotal (quantities are
    integral). Both sums come from ONE conditional aggregate pass;
    the qualifying supplier set broadcasts into a semi-join against
    the region's suppliers."""
    red = (
        tables.load(spark, sf_dir, "part")
        .filter(F.col("p_name").startswith(_Q20_NAME_PREFIX))
        .select("p_partkey")
    )
    li = tables.load(spark, sf_dir, "lineitem")
    qty = F.round(F.col("l_quantity")).cast("long")
    in_year = (
        (F.col("l_shipdate") >= F.lit(_Q20_YEAR_LO).cast("timestamp"))
        & (F.col("l_shipdate") < F.lit(_Q20_YEAR_HI).cast("timestamp"))
    )
    ag = (
        li.join(F.broadcast(red), li.l_partkey == red.p_partkey)
        .groupBy("l_suppkey", "l_partkey")
        .agg(
            F.sum(F.when(in_year, qty).otherwise(F.lit(0))).alias("q96"),
            F.sum(qty).alias("qall"),
        )
    )
    sel = (
        ag.filter(F.col("q96") * 10 > F.col("qall") * 3)
        .select("l_suppkey")
        .distinct()
    )
    nation = tables.load(spark, sf_dir, "nation")
    region = tables.load(spark, sf_dir, "region").filter(
        F.col("r_name") == _Q20_REGION
    )
    supp = (
        tables.load(spark, sf_dir, "supplier")
        .join(F.broadcast(nation), F.col("s_nationkey") == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    )
    return (
        supp.join(
            F.broadcast(sel), supp.s_suppkey == sel.l_suppkey, "left_semi"
        )
        .select("s_name", "s_acctbal")
        .orderBy("s_name")
    )


_Q20_SQL = f"""
WITH ag AS (
  SELECT l.l_suppkey, l.l_partkey,
         SUM(CASE WHEN l.l_shipdate >= TIMESTAMP '{_Q20_YEAR_LO}'
                   AND l.l_shipdate < TIMESTAMP '{_Q20_YEAR_HI}'
                  THEN CAST(l.l_quantity AS BIGINT) ELSE 0 END) AS q96,
         SUM(CAST(l.l_quantity AS BIGINT)) AS qall
  FROM lineitem l
  JOIN part p ON l.l_partkey = p.p_partkey
  WHERE p.p_name LIKE '{_Q20_NAME_PREFIX}%'
  GROUP BY 1, 2
)
SELECT s.s_name, s.s_acctbal
FROM supplier s
JOIN nation n ON s.s_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
WHERE r.r_name = '{_Q20_REGION}'
  AND s.s_suppkey IN (SELECT l_suppkey FROM ag WHERE q96 * 10 > qall * 3)
ORDER BY s.s_name
"""


QUERIES: dict[str, QueryEntry] = {
    "tpch_q3_shipping_priority": QueryEntry(tpch_q3_shipping_priority, _Q3_SQL),
    "tpch_q5_local_supplier_volume": QueryEntry(tpch_q5_local_supplier_volume, _Q5_SQL),
    "tpch_q10_returned_items": QueryEntry(tpch_q10_returned_items, _Q10_SQL),
    "tpch_q18_large_orders": QueryEntry(tpch_q18_large_orders, _Q18_SQL),
    "tpch_q6_forecast_revenue": QueryEntry(tpch_q6_forecast_revenue, _Q6_SQL),
    "tpch_q4_late_order_priority": QueryEntry(
        tpch_q4_late_order_priority, _Q4_SQL
    ),
    "tpch_q14_promo_revenue": QueryEntry(tpch_q14_promo_revenue, _Q14_SQL),
    "tpch_q12_priority_by_status": QueryEntry(
        tpch_q12_priority_by_status, _Q12_SQL
    ),
    "tpch_q19_discounted_revenue": QueryEntry(
        tpch_q19_discounted_revenue, _Q19_SQL
    ),
    "tpch_q7_nation_volume": QueryEntry(tpch_q7_nation_volume, _Q7_SQL),
    "tpch_q8_market_share": QueryEntry(tpch_q8_market_share, _Q8_SQL),
    "tpch_q21_waiting_suppliers": QueryEntry(
        tpch_q21_waiting_suppliers, _Q21_SQL
    ),
    "tpch_q13_customer_distribution": QueryEntry(
        tpch_q13_customer_distribution, _Q13_SQL
    ),
    "tpch_q17_small_quantity_revenue": QueryEntry(
        tpch_q17_small_quantity_revenue, _Q17_SQL
    ),
    "tpch_q22_global_sales_opportunity": QueryEntry(
        tpch_q22_global_sales_opportunity, _Q22_SQL
    ),
    "tpch_q1_pricing_summary": QueryEntry(tpch_q1_pricing_summary, _Q1_SQL),
    "tpch_q2_min_cost_supplier": QueryEntry(
        tpch_q2_min_cost_supplier, _Q2_SQL
    ),
    "tpch_q9_product_type_profit": QueryEntry(
        tpch_q9_product_type_profit, _Q9_SQL
    ),
    "tpch_q11_important_stock": QueryEntry(
        tpch_q11_important_stock, _Q11_SQL
    ),
    "tpch_q15_top_supplier": QueryEntry(tpch_q15_top_supplier, _Q15_SQL),
    "tpch_q16_supplier_part_counts": QueryEntry(
        tpch_q16_supplier_part_counts, _Q16_SQL
    ),
    "tpch_q20_excess_suppliers": QueryEntry(
        tpch_q20_excess_suppliers, _Q20_SQL
    ),
}
