"""Bucketed-table co-location: pay a table's join-key shuffle ONCE at
write time so every later join and aggregation on that key is
exchange-free.

At 100 TB the dominant cost of the header⨝lines join family is the
repeated hash shuffle of the fact tables on the order key. Spark's
native bucketing (``DataFrameWriter.bucketBy`` + ``saveAsTable``) stores
each table pre-hash-partitioned into N buckets on the key; when two
tables share the SAME bucket count and key, Catalyst plans their join
with NO Exchange on either side, and a following aggregation on the
bucket key reuses the layout too. ``sortBy`` additionally pre-sorts each
bucket file so the sort-merge join needs no per-task sort. This is the
engine-side analog of the reference schema's clustered primary keys on
Invoice/InvoiceLine (reference: sqls/setup-invoice-db.sql:27,46 — INT
IDENTITY PRIMARY KEY on both tables, clustered by SQL Server default),
which give its engine the same merge-join-without-resort property.

Works on Spark's default in-memory session catalog (no Hive metastore
needed): the bucketed layout is recorded in the table metadata under
``spark.sql.warehouse.dir``. The proof is structural, in
tests/test_sources.py: plan_flags(...).exchanges == 0 for the
bucketed join AND the post-join aggregate, with byte-identical results
to the unbucketed plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    keys: list[str],
    n_buckets: int = 32,
    sort_keys: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed (and optionally per-bucket sorted)
    parquet table in the session catalog. ``n_buckets`` must MATCH
    across tables that will be co-joined — differing counts fall back to
    a shuffle on one side."""
    writer = df.write.format("parquet").mode(mode).bucketBy(n_buckets, *keys)
    if sort_keys:
        writer = writer.sortBy(*sort_keys)
    writer.saveAsTable(table)


def cobucketed_join(
    spark: SparkSession, left: str, right: str, on: list[str] | str
) -> DataFrame:
    """Join two co-bucketed catalog tables on their bucket key. With
    matching bucket specs the physical plan carries ZERO Exchange
    operators — verified structurally in tests."""
    return spark.table(left).join(spark.table(right), on)


def drop_bucketed(spark: SparkSession, *tables: str) -> None:
    """Drop catalog tables written by write_bucketed (cleanup helper)."""
    for t in tables:
        spark.sql(f"DROP TABLE IF EXISTS {t}")
