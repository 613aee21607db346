"""sql_cdc_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of the shalinda/SQL-CDC reference.

The engine is a library of DataFrame operators (batch relational core),
a Structured Streaming CDC pipeline composed from the same operators, and
LLM-data-pipeline extensions (dedup, similarity search, text analysis,
multimodal columns) designed for 100 TB scale.

Layout:
  session      SparkSession factory tuned for the target workload
  tables       test-table loaders / view registration
  operators/   CDC + relational + document-assembly operators
  functions/   scalar/text/dedup/similarity/multimodal function library
  sources/     JDBC / Delta CDF / Kafka ingress, catalog-view exposure
  pipelines/   composed end-to-end flows (corpus preparation)
  streaming/   change-log source, checkpointed pipeline, consumer registry
  queries/     named query registry (queries() + oracle_sql() for the driver)

Convenience re-exports — the two calls every user starts with:

    from sql_cdc_spark import get_spark, load
    spark = get_spark()
    orders = load(spark, "/root/testdata/sf0.01", "orders")
"""

from sql_cdc_spark.session import get_spark
from sql_cdc_spark.tables import load

__all__ = ["get_spark", "load"]
__version__ = "0.1.0"
