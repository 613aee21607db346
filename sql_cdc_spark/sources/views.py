"""Catalog-view registration — the BI-exposure story. The reference ships
Superset dashboards over ``dbo.vw_invoice_header_line``
(sqls/vw_Invoicedetails.sql:5-19, superset/); the Spark analog registers
the same denormalized header ⨝ line join as a named temp view so any
SQL-speaking client (spark.sql, Thrift/Connect server, notebook) queries
it by name. The view is a lazy logical plan: predicates and projections
push through the join into the parquet scans."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sql_cdc_spark import tables

INVOICE_VIEW = "vw_invoice_header_line"


def register_invoice_views(spark: SparkSession, sf_dir: str) -> list[str]:
    """Register the denormalized invoice view (and its base tables) in the
    session catalog; returns the registered view names. Re-registration
    replaces — same semantics as CREATE OR REPLACE VIEW."""
    orders = tables.load(spark, sf_dir, "orders")
    li = tables.load(spark, sf_dir, "lineitem")
    view: DataFrame = orders.join(
        li, orders.o_orderkey == li.l_orderkey, "inner"
    ).select(
        F.col("o_orderkey").alias("invoice_id"),
        F.col("o_custkey").alias("customer_id"),
        F.col("o_orderstatus").alias("status"),
        F.col("o_orderdate").alias("invoice_date"),
        F.col("o_totalprice").alias("total_amount"),
        F.col("l_linenumber").alias("line_id"),
        F.col("l_partkey").alias("item_code"),
        F.col("l_quantity").alias("qty"),
        F.col("l_extendedprice").alias("unit_price"),
        F.round(F.col("l_quantity") * F.col("l_extendedprice"), 2).alias(
            "line_total"
        ),
    )
    view.createOrReplaceTempView(INVOICE_VIEW)
    return [INVOICE_VIEW]


TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def register_star_schema(spark: SparkSession, sf_dir: str) -> list[str]:
    """Register every base table under its own name plus the invoice view
    — after this, the full engine surface is reachable from plain
    ``spark.sql`` (or a Thrift/Connect client): the same catalog layout
    the DuckDB oracle gate uses, so any oracle SQL string in
    queries/*.py also runs verbatim-ish against Spark SQL. Views are lazy
    plans over the parquet scans — registration costs nothing and
    predicates still push down."""
    for t in TABLES:
        tables.load(spark, sf_dir, t).createOrReplaceTempView(t)
    return list(TABLES) + register_invoice_views(spark, sf_dir)
