"""Relational operator coverage (SURVEY.md §2.2-2.8) on the TPC-H-ish
test tables, each paired with a DuckDB oracle.

Operator IDs in docstrings refer to SURVEY.md §2's inventory; reference
citations point at shalinda/SQL-CDC files that motivated the operator.

Float discipline: aggregates over doubles are rounded (2dp money, 4dp
ratios) in BOTH engines so engine-order summation noise can't break the
value hash; raw column pass-throughs are never rounded (same bits on both
sides).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sql_cdc_spark import tables
from sql_cdc_spark.queries import QueryEntry


def rel_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4/A6 + P1/P2: multi-aggregate GROUP BY with a pushed-down range
    filter — the analytics-over-the-joined-view role of the reference's
    Superset dashboards (sqls/vw_Invoicedetails.sql). TPC-H Q1 shape."""
    li = tables.load(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.to_timestamp(F.lit("1998-09-02")))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            # cents-exact sums: these groups hold ~150k fractional values,
            # where plain double summation drifts past cent precision and
            # varies with partial-aggregation order (run-to-run!)
            F.round(
                F.sum(F.round(F.col("l_extendedprice") * 100).cast("long")) / 100.0, 2
            ).alias("sum_base_price"),
            F.round(
                F.sum(
                    F.round(
                        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
                    ).cast("long")
                )
                / 100.0,
                2,
            ).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


_PRICING_SQL = """
SELECT l_returnflag, l_linestatus,
       ROUND(SUM(l_quantity), 2) AS sum_qty,
       ROUND(SUM(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)) / 100.0, 2) AS sum_base_price,
       ROUND(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100, 0) AS BIGINT)) / 100.0, 2) AS sum_disc_price,
       ROUND(AVG(l_quantity), 4) AS avg_qty,
       ROUND(AVG(l_discount), 4) AS avg_disc,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""


def rel_header_line_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3+P1: the denormalized header ⨝ lines analytics view
    (sqls/vw_Invoicedetails.sql:5-19) on orders/lineitem, with the
    reference's renamed projection style."""
    orders = tables.load(spark, sf_dir, "orders")
    li = tables.load(spark, sf_dir, "lineitem")
    return orders.join(li, orders.o_orderkey == li.l_orderkey, "inner").select(
        F.col("o_orderkey").alias("invoice_id"),
        F.col("o_custkey").alias("customer_id"),
        F.col("o_orderstatus").alias("status"),
        F.col("o_totalprice").alias("total_amount"),
        F.col("l_linenumber").alias("line_number"),
        F.col("l_quantity").alias("qty"),
        F.col("l_extendedprice").alias("unit_ext_price"),
        F.round(F.col("l_quantity") * F.col("l_extendedprice"), 2).alias("line_total"),
    )


_HEADER_LINE_VIEW_SQL = """
SELECT o.o_orderkey AS invoice_id, o.o_custkey AS customer_id,
       o.o_orderstatus AS status, o.o_totalprice AS total_amount,
       l.l_linenumber AS line_number, l.l_quantity AS qty,
       l.l_extendedprice AS unit_ext_price,
       ROUND(l.l_quantity * l.l_extendedprice, 2) AS line_total
FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
"""


def rel_top_revenue_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O1+J3+A6: top-k by aggregated revenue with a total sort key
    (revenue desc, key asc) so ties can't break determinism. Plans as
    TakeOrderedAndProject — per-partition heaps, no global sort."""
    orders = tables.load(spark, sf_dir, "orders")
    li = tables.load(spark, sf_dir, "lineitem")
    rev = li.groupBy("l_orderkey").agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
            "revenue"
        )
    )
    return (
        orders.join(rev, orders.o_orderkey == rev.l_orderkey, "inner")
        .select(
            F.col("o_orderkey").alias("invoice_id"),
            "o_custkey",
            "o_orderdate",
            "revenue",
        )
        .orderBy(F.col("revenue").desc(), F.col("invoice_id").asc())
        .limit(10)
    )


_TOP_REVENUE_SQL = """
SELECT o.o_orderkey AS invoice_id, o.o_custkey, o.o_orderdate, r.revenue
FROM orders o
JOIN (
  SELECT l_orderkey, ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
  FROM lineitem GROUP BY l_orderkey
) r ON o.o_orderkey = r.l_orderkey
ORDER BY r.revenue DESC, invoice_id ASC
LIMIT 10
"""


def rel_customer_order_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2+A4/A6: per-customer order stats joined to the (broadcast)
    customer dim — the enrichment-join shape of sqls/storedprocedure.sql:55."""
    orders = tables.load(spark, sf_dir, "orders")
    cust = tables.load(spark, sf_dir, "customer")
    stats = orders.groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("total_spend"),
        F.round(F.max("o_totalprice"), 2).alias("max_order"),
    )
    return stats.join(
        F.broadcast(cust), stats.o_custkey == cust.c_custkey, "inner"
    ).select("c_custkey", "c_name", "c_mktsegment", "n_orders", "total_spend", "max_order")


_CUSTOMER_STATS_SQL = """
SELECT c.c_custkey, c.c_name, c.c_mktsegment, s.n_orders, s.total_spend, s.max_order
FROM (
  SELECT o_custkey, COUNT(*) AS n_orders,
         ROUND(SUM(o_totalprice), 2) AS total_spend,
         ROUND(MAX(o_totalprice), 2) AS max_order
  FROM orders GROUP BY o_custkey
) s JOIN customer c ON s.o_custkey = c.c_custkey
"""


def rel_semi_join_big_spenders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J5: left-semi join — customers with at least one order over 400k
    (the `WHERE ... IN (SELECT ...)` shape of reference Readme.md:190)."""
    cust = tables.load(spark, sf_dir, "customer")
    orders = tables.load(spark, sf_dir, "orders")
    big = orders.filter(F.col("o_totalprice") > 400000).select("o_custkey")
    return cust.join(big, cust.c_custkey == big.o_custkey, "left_semi").select(
        "c_custkey", "c_name", "c_acctbal"
    )


_SEMI_JOIN_SQL = """
SELECT c_custkey, c_name, c_acctbal FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)
"""


def rel_anti_join_no_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J5 complement: left-anti join — customers with no large (>400k)
    order. The synthetic data gives every customer at least one order, so
    an unpredicated anti-join would green on empty-vs-empty and verify
    nothing; the price predicate leaves ~13% of customers unmatched."""
    cust = tables.load(spark, sf_dir, "customer")
    big = (
        tables.load(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 400000)
        .select("o_custkey")
    )
    return cust.join(big, cust.c_custkey == big.o_custkey, "left_anti").select(
        "c_custkey", "c_name", "c_mktsegment"
    )


_ANTI_JOIN_SQL = """
SELECT c_custkey, c_name, c_mktsegment FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)
"""


def rel_multi_hop_dims(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2 chained: customer → nation → region star-join rollup; both dims
    broadcast (classic small-dim pattern for the 100 TB fact side)."""
    cust = tables.load(spark, sf_dir, "customer")
    nation = tables.load(spark, sf_dir, "nation")
    region = tables.load(spark, sf_dir, "region")
    return (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.round(F.avg("c_acctbal"), 2).alias("avg_balance"),
        )
    )


_MULTI_HOP_SQL = """
SELECT r.r_name, n.n_name, COUNT(*) AS n_customers,
       ROUND(AVG(c.c_acctbal), 2) AS avg_balance
FROM customer c
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY r.r_name, n.n_name
"""


def rel_cross_join_small(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J6: explicit cross join of two small dims (the reference's
    numbers-table generator pattern, sqls/insert-invoices.sql:23-25)."""
    region = tables.load(spark, sf_dir, "region")
    nation = tables.load(spark, sf_dir, "nation")
    return region.crossJoin(nation).select("r_name", "n_name")


_CROSS_JOIN_SQL = "SELECT r_name, n_name FROM region CROSS JOIN nation"


def rel_distinct_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2: DISTINCT over a composite key (reference Readme.md:144)."""
    li = tables.load(spark, sf_dir, "lineitem")
    return li.select("l_returnflag", "l_linestatus").distinct()


_DISTINCT_SQL = "SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem"


def rel_sample_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5: aggregate over a deterministic bounded sample — the reference's
    avg-file-size-over-first-10 (invoice-api/server.js:211-219), with a
    total sort key replacing 'first 10 listed'."""
    li = tables.load(spark, sf_dir, "lineitem")
    sample = li.orderBy("l_orderkey", "l_linenumber").limit(10)
    return sample.agg(
        F.round(F.avg("l_extendedprice"), 2).alias("avg_price"),
        F.count(F.lit(1)).alias("n_sampled"),
    )


_SAMPLE_AVG_SQL = """
SELECT ROUND(AVG(l_extendedprice), 2) AS avg_price, COUNT(*) AS n_sampled
FROM (SELECT l_extendedprice FROM lineitem ORDER BY l_orderkey, l_linenumber LIMIT 10)
"""


def rel_derived_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P4+P6: projection + rename + type-coerce + computed column — the
    camelCase/coercion map of invoice-api/server.js:154-162 and the
    persisted LineTotal column (setup-invoice-db.sql:51)."""
    li = tables.load(spark, sf_dir, "lineitem")
    return li.select(
        F.col("l_orderkey").alias("invoiceId"),
        F.col("l_linenumber").cast("long").alias("lineId"),
        F.col("l_quantity").cast("int").alias("qty"),
        F.col("l_extendedprice").alias("unitPrice"),
        F.round(F.col("l_quantity") * F.col("l_extendedprice"), 2).alias("lineTotal"),
    )


_DERIVED_SQL = """
SELECT l_orderkey AS invoiceId, CAST(l_linenumber AS BIGINT) AS lineId,
       CAST(l_quantity AS INTEGER) AS qty, l_extendedprice AS unitPrice,
       ROUND(l_quantity * l_extendedprice, 2) AS lineTotal
FROM lineitem
"""


def rel_filter_composite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P2+P7: composite predicate — equality, range, IN-list; all pushed
    to the parquet scan (verify: PushedFilters in .explain)."""
    orders = tables.load(spark, sf_dir, "orders")
    return orders.filter(
        (F.col("o_orderstatus") == "F")
        & (F.col("o_totalprice") > 100000)
        & (F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
    ).select("o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority")


_FILTER_COMPOSITE_SQL = """
SELECT o_orderkey, o_custkey, o_totalprice, o_orderpriority
FROM orders
WHERE o_orderstatus = 'F' AND o_totalprice > 100000
  AND o_orderpriority IN ('1-URGENT', '2-HIGH')
"""


def rel_union_all_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U1: bag union of two filtered projections (the two-change-feed
    merge, sqls/storedprocedure.sql:20)."""
    cust = tables.load(spark, sf_dir, "customer")
    a = cust.filter(F.col("c_mktsegment") == "BUILDING").select(
        "c_custkey", "c_mktsegment"
    )
    b = cust.filter(F.col("c_acctbal") > 9000).select("c_custkey", "c_mktsegment")
    return a.unionByName(b)


_UNION_ALL_SQL = """
SELECT c_custkey, c_mktsegment FROM customer WHERE c_mktsegment = 'BUILDING'
UNION ALL
SELECT c_custkey, c_mktsegment FROM customer WHERE c_acctbal > 9000
"""


def rel_rollup_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregation extension: ROLLUP over (returnflag, linestatus) —
    subtotals + grand total in one pass (absent from the reference, core
    for the analytics surface)."""
    li = tables.load(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.count(F.lit(1)).alias("n_rows"),
    )


_ROLLUP_SQL = """
SELECT l_returnflag, l_linestatus, ROUND(SUM(l_quantity), 2) AS sum_qty,
       COUNT(*) AS n_rows
FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
"""


def rel_invoice_view_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BI-exposure parity (reference Superset over
    sqls/vw_Invoicedetails.sql:5-19): register the denormalized invoice
    view in the session catalog and aggregate THROUGH the named view with
    spark.sql — the path a dashboard or Thrift client takes. The view is
    lazy: the status grouping and column pruning push through the join
    into both parquet scans."""
    from sql_cdc_spark.sources.views import INVOICE_VIEW, register_invoice_views

    register_invoice_views(spark, sf_dir)
    return spark.sql(
        f"""
        SELECT status,
               COUNT(*) AS n_lines,
               COUNT(DISTINCT invoice_id) AS n_invoices,
               SUM(CAST(ROUND(line_total * 100) AS BIGINT))
                 / CAST(100 AS DOUBLE) AS revenue
        FROM {INVOICE_VIEW}
        GROUP BY status
        """
    )


_INVOICE_VIEW_ROLLUP_SQL = """
WITH vw_invoice_header_line AS (
  SELECT o.o_orderkey AS invoice_id, o.o_orderstatus AS status,
         ROUND(l.l_quantity * l.l_extendedprice, 2) AS line_total
  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
)
SELECT status,
       COUNT(*) AS n_lines,
       COUNT(DISTINCT invoice_id) AS n_invoices,
       SUM(CAST(ROUND(line_total * 100, 0) AS BIGINT)) / 100.0 AS revenue
FROM vw_invoice_header_line
GROUP BY status
"""


def rel_pivot_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregation extension: pivot linestatus values to columns."""
    li = tables.load(spark, sf_dir, "lineitem")
    out = (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(F.round(F.sum("l_quantity"), 2))
    )
    return out.select(
        "l_returnflag", F.col("O").alias("qty_open"), F.col("F").alias("qty_filled")
    )


_PIVOT_SQL = """
SELECT l_returnflag,
       ROUND(SUM(CASE WHEN l_linestatus = 'O' THEN l_quantity END), 2) AS qty_open,
       ROUND(SUM(CASE WHEN l_linestatus = 'F' THEN l_quantity END), 2) AS qty_filled
FROM lineitem GROUP BY l_returnflag
"""


def rel_unpivot_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT (melt) — the inverse of rel_pivot_status: the per-flag
    wide aggregate (qty, cents, row count as exact bigints) is stacked
    into long (l_returnflag, measure, value) form via the native
    ``stack`` table generator — the shape BI tools and chart layers
    consume. Scan + one grouped agg + a scan-local generator: the
    unpivot itself never shuffles."""
    li = tables.load(spark, sf_dir, "lineitem")
    wide = li.groupBy("l_returnflag").agg(
        # round-then-cast (repo rule): Spark cast('long') truncates while
        # DuckDB CAST rounds to nearest — identical only while quantities
        # stay integral; rounding first pins one rule on both engines
        F.sum(F.round(F.col("l_quantity")).cast("long")).alias("qty"),
        F.sum(F.round(F.col("l_extendedprice") * 100).cast("long")).alias(
            "cents"
        ),
        F.count(F.lit(1)).alias("n_rows"),
    )
    return wide.select(
        "l_returnflag",
        F.expr(
            "stack(3, 'qty', qty, 'cents', cents, 'n_rows', n_rows) "
            "AS (measure, value)"
        ),
    ).orderBy("l_returnflag", "measure")


_UNPIVOT_SQL = """
WITH wide AS (
  SELECT l_returnflag,
         CAST(SUM(CAST(ROUND(l_quantity, 0) AS BIGINT)) AS BIGINT) AS qty,
         CAST(SUM(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)) AS BIGINT) AS cents,
         COUNT(*) AS n_rows
  FROM lineitem GROUP BY l_returnflag
)
SELECT l_returnflag, measure, value FROM (
  SELECT l_returnflag, 'qty' AS measure, qty AS value FROM wide
  UNION ALL SELECT l_returnflag, 'cents', cents FROM wide
  UNION ALL SELECT l_returnflag, 'n_rows', n_rows FROM wide
)
ORDER BY l_returnflag, measure
"""


def rel_above_avg_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar-subquery extension: orders at least 1.5× the global average
    price — the scalar aggregate is broadcast as a 1-row join (no driver
    collect). 1.5× matches ~25% of the synthetic orders (prices are
    ~uniform below 500k, so 2× the ~250k average matched nothing and the
    gate compared empty to empty)."""
    orders = tables.load(spark, sf_dir, "orders")
    avg_price = orders.agg(F.avg("o_totalprice").alias("__avg"))
    return (
        orders.crossJoin(F.broadcast(avg_price))
        .filter(F.col("o_totalprice") > F.col("__avg") * 1.5)
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


_ABOVE_AVG_SQL = """
SELECT o_orderkey, o_custkey, o_totalprice FROM orders
WHERE o_totalprice > (SELECT AVG(o_totalprice) FROM orders) * 1.5
"""

def rel_cube_status_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (status, returnflag): all 4 grouping combinations in one
    pass — the grouping-sets family beyond the reference's single-level
    GROUP BY (rollup variant in rel_rollup_lineitem)."""
    li = tables.load(spark, sf_dir, "lineitem")
    orders = tables.load(spark, sf_dir, "orders")
    j = li.join(orders, li.l_orderkey == orders.o_orderkey)
    return (
        j.cube("o_orderstatus", "l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        )
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            F.coalesce("l_returnflag", F.lit("ALL")).alias("flag"),
            "n_rows",
            "sum_qty",
        )
    )


_CUBE_SQL = """
SELECT COALESCE(o_orderstatus, 'ALL') AS status,
       COALESCE(l_returnflag, 'ALL') AS flag,
       COUNT(*) AS n_rows,
       ROUND(SUM(l_quantity), 2) AS sum_qty
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
GROUP BY CUBE (o_orderstatus, l_returnflag)
"""


def rel_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING SETS with an explicit, non-hierarchical set list — the
    member of the grouping family ROLLUP and CUBE cannot express (an
    arbitrary subset of combinations in ONE pass instead of a UNION of
    grouped scans). grouping_id() disambiguates genuine NULL group
    values from subtotal rows — the reason the raw columns stay
    un-coalesced here, unlike the cube report. Revenue in integer cents
    (the summation-order rule), total order (gid, flag, status) with
    explicit NULLS FIRST so both engines sort subtotals identically."""
    li = tables.load(spark, sf_dir, "lineitem")
    cents = F.round(F.col("l_extendedprice") * 100).cast("long")
    return (
        li.groupingSets(
            [["l_returnflag", "l_linestatus"], ["l_returnflag"],
             ["l_linestatus"], []],
            "l_returnflag",
            "l_linestatus",
        )
        .agg(
            F.grouping_id().cast("long").alias("gid"),
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(cents).cast("long").alias("revenue_cents"),
        )
        .select("gid", "l_returnflag", "l_linestatus", "n_rows", "revenue_cents")
        .orderBy(
            "gid",
            F.col("l_returnflag").asc_nulls_first(),
            F.col("l_linestatus").asc_nulls_first(),
        )
    )


_GROUPING_SETS_SQL = """
SELECT CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid,
       l_returnflag, l_linestatus,
       COUNT(*) AS n_rows,
       CAST(SUM(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)) AS BIGINT)
         AS revenue_cents
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag),
                        (l_linestatus), ())
ORDER BY gid, l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST
"""


def rel_intersect_buyers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT: customers active in both halves of the key space's
    order stream (set semantics — dedup built in)."""
    orders = tables.load(spark, sf_dir, "orders")
    a = orders.filter(F.col("o_orderkey") % 2 == 0).select("o_custkey")
    b = orders.filter(F.col("o_orderkey") % 2 == 1).select("o_custkey")
    return a.intersect(b)


_INTERSECT_SQL = """
SELECT o_custkey FROM orders WHERE o_orderkey % 2 = 0
INTERSECT
SELECT o_custkey FROM orders WHERE o_orderkey % 2 = 1
"""


def rel_except_lost_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT: customers with early orders but none recent — the churn
    set (set difference with dedup)."""
    orders = tables.load(spark, sf_dir, "orders")
    early = orders.filter(
        F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp")
    ).select("o_custkey")
    late = orders.filter(
        F.col("o_orderdate") >= F.lit("1998-01-01").cast("timestamp")
    ).select("o_custkey")
    # subtract = SQL EXCEPT (set semantics); exceptAll would be bag
    # difference and keep customers whose early orders outnumber late ones
    return early.subtract(late)


_EXCEPT_SQL = """
SELECT o_custkey FROM orders WHERE o_orderdate < TIMESTAMP '1998-01-01'
EXCEPT
SELECT o_custkey FROM orders WHERE o_orderdate >= TIMESTAMP '1998-01-01'
"""

def rel_dq_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality audit over the star schema — the expectation suite a
    warehouse runs before publishing a snapshot (the engine-side analog
    of the reference's NOT NULL/FK DDL constraints,
    sqls/setup-invoice-db.sql: the reference delegates integrity to SQL
    Server; a lake table must CHECK it). One row per rule with its
    violation count: referential orphans both directions (anti-joins),
    domain rules (non-positive quantity, discount outside [0,1]),
    primary-key duplicates, and two cross-table consistency rules that
    genuinely fire on this corpus — lines shipped before their order
    date, and header totals that disagree with the cents-exact line
    rollup. Scale shape: exactly TWO fact passes — one lineitem⟕orders
    join whose per-key groupBy reuses the join partitioning and feeds
    all five line-side rules (a null orders side IS the orphan marker),
    and one orders⟕distinct-customer-keys join feeding both order-side
    rules (distinct so a dim duplicate can never multiply order rows);
    the 7-rule report is a stack() over the two 1-row aggregates."""
    orders = tables.load(spark, sf_dir, "orders")
    lineitem = tables.load(spark, sf_dir, "lineitem")
    customer = tables.load(spark, sf_dir, "customer")

    line_cents = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        * (1 + F.col("l_tax")) * 100
    ).cast("long")
    # lineitem pass: ONE left join to orders feeds every line-side rule —
    # a null orders side marks an orphan line; the join output is already
    # partitioned on the key, so the per-order groupBy adds no exchange
    per_order = (
        lineitem.join(
            orders.select(
                F.col("o_orderkey").alias("__ok"), "o_orderdate", "o_totalprice"
            ),
            lineitem.l_orderkey == F.col("__ok"),
            "left",
        )
        .groupBy("l_orderkey")
        .agg(
            F.sum(
                F.when(F.col("__ok").isNull(), 1).otherwise(0)
            ).alias("orphans"),
            F.sum(
                F.when(F.col("l_shipdate") < F.col("o_orderdate"), 1).otherwise(0)
            ).alias("early_ships"),
            F.sum(line_cents).alias("lines_cents"),
            F.min(
                F.round(F.col("o_totalprice") * 100).cast("long")
            ).alias("hdr_cents"),
            F.sum(
                F.when(
                    F.col("l_quantity").isNull() | (F.col("l_quantity") <= 0), 1
                ).otherwise(0)
            ).alias("bad_qty"),
            F.sum(
                F.when(
                    (F.col("l_discount") < 0) | (F.col("l_discount") > 1), 1
                ).otherwise(0)
            ).alias("bad_disc"),
        )
    )
    lin = per_order.agg(
        F.sum("orphans").alias("orphan_lineitems"),
        F.sum("early_ships").alias("ship_before_order"),
        F.sum(
            F.when(
                F.col("hdr_cents").isNotNull()
                & (F.col("hdr_cents") != F.col("lines_cents")),
                1,
            ).otherwise(0)
        ).alias("header_total_mismatch"),
        F.sum("bad_qty").alias("nonpositive_quantity"),
        F.sum("bad_disc").alias("discount_out_of_range"),
    )
    # orders pass: ONE left join to the DISTINCT customer keys (distinct
    # so a dim dup can never multiply order rows) feeds both order-side
    # rules from the same per-key groupBy
    per_ok = (
        orders.select("o_orderkey", "o_custkey")
        .join(
            customer.select(F.col("c_custkey").alias("__ck")).distinct(),
            orders.o_custkey == F.col("__ck"),
            "left",
        )
        .groupBy("o_orderkey")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.max(F.col("__ck").isNotNull().cast("int")).alias("matched"),
        )
    )
    ords = per_ok.agg(
        F.sum(F.when(F.col("n") > 1, 1).otherwise(0)).alias("duplicate_order_pk"),
        F.sum(
            F.when(F.col("matched") == 0, F.col("n")).otherwise(0)
        ).alias("orphan_orders"),
    )
    stacked = lin.crossJoin(ords).selectExpr(
        "stack(7, "
        "'orphan_lineitems', orphan_lineitems, "
        "'orphan_orders', orphan_orders, "
        "'nonpositive_quantity', nonpositive_quantity, "
        "'discount_out_of_range', discount_out_of_range, "
        "'duplicate_order_pk', duplicate_order_pk, "
        "'ship_before_order', ship_before_order, "
        "'header_total_mismatch', header_total_mismatch"
        ") AS (rule, n_violations)"
    )
    return stacked.select(
        "rule",
        F.coalesce(F.col("n_violations"), F.lit(0)).cast("long").alias("n_violations"),
    ).orderBy("rule")


_DQ_AUDIT_SQL = """
WITH per_order AS (
  SELECT l.l_orderkey,
         SUM(CASE WHEN l.l_shipdate < o.o_orderdate THEN 1 ELSE 0 END) AS early_ships,
         SUM(CAST(ROUND(l.l_extendedprice * (1 - l.l_discount) * (1 + l.l_tax) * 100, 0) AS BIGINT)) AS lines_cents,
         CAST(ROUND(MIN(o.o_totalprice) * 100, 0) AS BIGINT) AS hdr_cents
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
  GROUP BY l.l_orderkey
)
SELECT rule, CAST(n_violations AS BIGINT) AS n_violations FROM (
  SELECT 'orphan_lineitems' AS rule,
         (SELECT COUNT(*) FROM lineitem l ANTI JOIN orders o
           ON l.l_orderkey = o.o_orderkey) AS n_violations
  UNION ALL
  SELECT 'orphan_orders',
         (SELECT COUNT(*) FROM orders o ANTI JOIN customer c
           ON o.o_custkey = c.c_custkey)
  UNION ALL
  SELECT 'nonpositive_quantity',
         (SELECT COUNT(*) FROM lineitem
           WHERE l_quantity IS NULL OR l_quantity <= 0)
  UNION ALL
  SELECT 'discount_out_of_range',
         (SELECT COUNT(*) FROM lineitem
           WHERE l_discount < 0 OR l_discount > 1)
  UNION ALL
  SELECT 'duplicate_order_pk',
         (SELECT COUNT(*) FROM (SELECT o_orderkey FROM orders
           GROUP BY o_orderkey HAVING COUNT(*) > 1) d)
  UNION ALL
  SELECT 'ship_before_order',
         (SELECT SUM(early_ships) FROM per_order)
  UNION ALL
  SELECT 'header_total_mismatch',
         (SELECT COUNT(*) FROM per_order WHERE hdr_cents <> lines_cents)
) t ORDER BY rule
"""


TOPN_N = 3


def rel_topn_other_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-N + OTHER rollup — the classic BI report shape: per nation,
    the top 3 customers by revenue as individual rows plus ONE aggregated
    'OTHER' row carrying everyone else's total, so the report is complete
    (rows sum to the nation total) without listing the long tail.

    Single-pass form: rank with a nation-partitioned window, then ONE
    aggregation whose group key folds the tail into the OTHER label
    (member = CASE rank ≤ N; rnk = 0 for OTHER) — never the naive
    union(top-rows, tail-aggregate) that evaluates the ranked subtree
    twice. Revenue in exact integer cents (round-per-row → bigint sum).

    Registry status: oracle-parity-gated in pytest
    (tests/test_queries_oracle.py); registered in the round-5 driver
    window."""
    from pyspark.sql.window import Window

    orders = tables.load(spark, sf_dir, "orders")
    cust = tables.load(spark, sf_dir, "customer")
    nation = tables.load(spark, sf_dir, "nation")
    cents = F.round(F.col("o_totalprice") * 100, 0).cast("long")
    rev = (
        orders.select("o_custkey", cents.alias("c"))
        .groupBy("o_custkey")
        .agg(F.sum("c").alias("rev_cents"))
        .join(F.broadcast(cust.select("c_custkey", "c_nationkey")),
              F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation.select("n_nationkey", "n_name")),
              F.col("c_nationkey") == F.col("n_nationkey"))
        .select("n_name", "c_custkey", "rev_cents")
    )
    w = Window.partitionBy("n_name").orderBy(
        F.desc("rev_cents"), F.col("c_custkey")
    )
    ranked = rev.withColumn("rn", F.row_number().over(w))
    in_top = F.col("rn") <= TOPN_N
    return (
        ranked.groupBy(
            "n_name",
            F.when(in_top, F.col("c_custkey").cast("string"))
            .otherwise("OTHER")
            .alias("member"),
            F.when(in_top, F.col("rn")).otherwise(0).cast("long").alias("rnk"),
        )
        .agg(F.sum("rev_cents").alias("revenue_cents"))
        .orderBy("n_name", "rnk")
    )


_TOPN_OTHER_SQL = f"""
WITH rev AS (
  SELECT n.n_name, c.c_custkey,
         CAST(SUM(CAST(ROUND(o.o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)
           AS rev_cents
  FROM orders o
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  GROUP BY n.n_name, c.c_custkey
),
ranked AS (
  SELECT n_name, c_custkey, rev_cents,
         ROW_NUMBER() OVER (PARTITION BY n_name
                            ORDER BY rev_cents DESC, c_custkey) AS rn
  FROM rev
)
SELECT n_name,
       CASE WHEN rn <= {TOPN_N} THEN CAST(c_custkey AS VARCHAR)
            ELSE 'OTHER' END AS member,
       CAST(CASE WHEN rn <= {TOPN_N} THEN rn ELSE 0 END AS BIGINT) AS rnk,
       CAST(SUM(rev_cents) AS BIGINT) AS revenue_cents
FROM ranked
GROUP BY 1, 2, 3
ORDER BY n_name, rnk
"""


# ---- blocked fuzzy entity match (round 6) ----------------------------------
FUZZY_MAX_EDIT = 2  # Levenshtein acceptance threshold


def rel_fuzzy_match_block(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked fuzzy entity resolution — near-duplicate part names by
    Levenshtein distance inside (p_brand, p_type) blocks, the classic
    record-linkage shape (block on cheap equality keys so the quadratic
    string metric only ever runs inside a block, never corpus×corpus).
    A length band |len(a)−len(b)| ≤ d prunes before the distance, and
    the Spark side passes the threshold INTO levenshtein (the 3-arg
    early-exit form short-circuits the DP once a row of the edit matrix
    exceeds d — the dominant saving when most in-block pairs are far
    apart); kept pairs carry the true distance, so the plain-levenshtein
    oracle agrees exactly.

    Scale shape: ONE self-join shuffled on the block key (pinned
    shuffle-hash: both sides are the same corpus-scale table). Block
    population is the quadratic hazard — the scl_skew_census operator is
    the diagnostic for a hot block, and the fix (salting the block key
    with a name prefix) preserves completeness only for d < prefix
    agreement, so it is a policy knob, not a default. key_a < key_b
    halves the pair space and makes the report a canonical edge set."""
    return fuzzy_match(
        tables.load(spark, sf_dir, "part").select(
            "p_partkey", "p_name", "p_brand", "p_type"
        )
    )


def fuzzy_match(
    part: DataFrame,
    key_col: str = "p_partkey",
    name_col: str = "p_name",
    block_cols: tuple[str, ...] = ("p_brand", "p_type"),
    max_edit: int = FUZZY_MAX_EDIT,
) -> DataFrame:
    """The blocked-match core over any (key, name, *blocks) frame —
    shared by the registered query, the bench 10× stress block, AND the
    family-12 fuzz (random corpora/blocks/thresholds run this exact
    plan), so the measured, fuzzed, and oracle-gated scenarios can
    never drift apart."""
    blocks = list(block_cols)
    a = part.select(
        F.col(key_col).alias("key_a"),
        F.col(name_col).alias("name_a"),
        *blocks,
    )
    b = part.select(
        F.col(key_col).alias("key_b"),
        F.col(name_col).alias("name_b"),
        *blocks,
    )
    return (
        a.join(b.hint("shuffle_hash"), blocks)
        .filter(
            (F.col("key_a") < F.col("key_b"))
            & (F.abs(F.length("name_a") - F.length("name_b")) <= max_edit)
        )
        .withColumn(
            "edit_dist",
            F.levenshtein("name_a", "name_b", max_edit),
        )
        .filter(F.col("edit_dist") >= 0)
        .select("key_a", "key_b", "name_a", "name_b", "edit_dist")
        .orderBy("key_a", "key_b")
    )


_FUZZY_MATCH_SQL = f"""
SELECT a.p_partkey AS key_a, b.p_partkey AS key_b,
       a.p_name AS name_a, b.p_name AS name_b,
       CAST(levenshtein(a.p_name, b.p_name) AS INTEGER) AS edit_dist
FROM part a
JOIN part b
  ON a.p_brand = b.p_brand AND a.p_type = b.p_type
 AND a.p_partkey < b.p_partkey
 AND abs(length(a.p_name) - length(b.p_name)) <= {FUZZY_MAX_EDIT}
WHERE levenshtein(a.p_name, b.p_name) <= {FUZZY_MAX_EDIT}
ORDER BY key_a, key_b
"""


QUERIES: dict[str, QueryEntry] = {
    "rel_dq_audit": QueryEntry(rel_dq_audit, _DQ_AUDIT_SQL),
    "rel_topn_other_rollup": QueryEntry(rel_topn_other_rollup, _TOPN_OTHER_SQL),
    "rel_pricing_summary": QueryEntry(rel_pricing_summary, _PRICING_SQL),
    "rel_cube_status_flag": QueryEntry(rel_cube_status_flag, _CUBE_SQL),
    "rel_grouping_sets": QueryEntry(rel_grouping_sets, _GROUPING_SETS_SQL),
    "rel_intersect_buyers": QueryEntry(rel_intersect_buyers, _INTERSECT_SQL),
    "rel_except_lost_customers": QueryEntry(rel_except_lost_customers, _EXCEPT_SQL),
    "rel_header_line_view": QueryEntry(rel_header_line_view, _HEADER_LINE_VIEW_SQL),
    "rel_invoice_view_rollup": QueryEntry(
        rel_invoice_view_rollup, _INVOICE_VIEW_ROLLUP_SQL
    ),
    "rel_top_revenue_orders": QueryEntry(rel_top_revenue_orders, _TOP_REVENUE_SQL),
    "rel_customer_order_stats": QueryEntry(rel_customer_order_stats, _CUSTOMER_STATS_SQL),
    "rel_semi_join_big_spenders": QueryEntry(rel_semi_join_big_spenders, _SEMI_JOIN_SQL),
    "rel_anti_join_no_orders": QueryEntry(rel_anti_join_no_orders, _ANTI_JOIN_SQL),
    "rel_multi_hop_dims": QueryEntry(rel_multi_hop_dims, _MULTI_HOP_SQL),
    "rel_cross_join_small": QueryEntry(rel_cross_join_small, _CROSS_JOIN_SQL),
    "rel_distinct_flags": QueryEntry(rel_distinct_flags, _DISTINCT_SQL),
    "rel_sample_avg": QueryEntry(rel_sample_avg, _SAMPLE_AVG_SQL),
    "rel_derived_columns": QueryEntry(rel_derived_columns, _DERIVED_SQL),
    "rel_filter_composite": QueryEntry(rel_filter_composite, _FILTER_COMPOSITE_SQL),
    "rel_union_all_segments": QueryEntry(rel_union_all_segments, _UNION_ALL_SQL),
    "rel_rollup_lineitem": QueryEntry(rel_rollup_lineitem, _ROLLUP_SQL),
    "rel_pivot_status": QueryEntry(rel_pivot_status, _PIVOT_SQL),
    "rel_unpivot_measures": QueryEntry(rel_unpivot_measures, _UNPIVOT_SQL),
    "rel_above_avg_orders": QueryEntry(rel_above_avg_orders, _ABOVE_AVG_SQL),
    "rel_fuzzy_match_block": QueryEntry(rel_fuzzy_match_block, _FUZZY_MATCH_SQL),
}
