"""Placeholder — populated in a later milestone."""

from sql_cdc_spark.queries import QueryEntry

QUERIES: dict[str, QueryEntry] = {}
