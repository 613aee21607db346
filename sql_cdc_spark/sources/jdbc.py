"""JDBC source (S5) — the Spark-native replacement for the reference's
pooled SQL Server connection (invoice-api/server.js:11-26: server, user,
password, database, port, encrypt, pool max 110 / min 10).

Spark has no client-side pool; its analog is the PARTITIONED read — every
executor opens its own connection and reads one key-range slice, so
``num_partitions`` caps concurrent connections exactly like the
reference's ``pool.max``, and (partition_column, lower/upper bound) give
range parallelism the single-connection reference cannot express.

This container ships no RDBMS or JDBC driver, so `.load()` is untestable
here; everything up to it — option assembly, URL shape, partitioning
math — is pure and unit-tested (tests/test_sources.py). On a real
cluster the returned reader ships filters/projections into the database
via Catalyst's JDBC pushdown.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, SparkSession

DEFAULT_PORT = 1433  # reference default, server.js:16
DEFAULT_FETCHSIZE = 10_000


def jdbc_options(
    server: str,
    database: str,
    table: str,
    user: str,
    password: str,
    port: int = DEFAULT_PORT,
    encrypt: bool = False,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int | None = None,
    fetchsize: int = DEFAULT_FETCHSIZE,
    **extra: Any,
) -> dict[str, str]:
    """Assemble the spark.read.format('jdbc') option map for an MSSQL
    source shaped like the reference's dbConfig (server.js:11-26). Pure —
    no driver or connection required — so the plumbing is testable in any
    environment."""
    url = (
        f"jdbc:sqlserver://{server}:{port};databaseName={database};"
        f"encrypt={'true' if encrypt else 'false'};trustServerCertificate=true"
    )
    opts: dict[str, str] = {
        "url": url,
        "dbtable": table,
        "user": user,
        "password": password,
        "fetchsize": str(fetchsize),
        "driver": "com.microsoft.sqlserver.jdbc.SQLServerDriver",
    }
    partition_opts = (partition_column, lower_bound, upper_bound, num_partitions)
    if any(o is not None for o in partition_opts):
        if any(o is None for o in partition_opts):
            raise ValueError(
                "partitioned JDBC reads need ALL of partition_column, "
                "lower_bound, upper_bound, num_partitions"
            )
        opts.update(
            partitionColumn=str(partition_column),
            lowerBound=str(lower_bound),
            upperBound=str(upper_bound),
            numPartitions=str(num_partitions),
        )
    for k, v in extra.items():
        opts[k] = str(v)
    return opts


def read_jdbc(spark: SparkSession, **kwargs: Any) -> DataFrame:
    """S5: partitioned JDBC read. Keyword args as in ``jdbc_options``.
    Raises a clear error when no JDBC driver jar is on the classpath
    (the import-guard analog for a JVM-side dependency)."""
    opts = jdbc_options(**kwargs)
    try:
        return spark.read.format("jdbc").options(**opts).load()
    except Exception as exc:  # driver jar missing, connection refused, ...
        raise RuntimeError(
            "JDBC read failed — is the SQL Server JDBC driver jar on the "
            "Spark classpath and the database reachable? "
            f"(url={opts['url']})"
        ) from exc
