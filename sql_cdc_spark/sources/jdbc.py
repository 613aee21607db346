"""JDBC source (S5) — the Spark-native replacement for the reference's
pooled SQL Server connection (invoice-api/server.js:11-26: server, user,
password, database, port, encrypt, pool max 110 / min 10).

Spark has no client-side pool; its analog is the PARTITIONED read — every
executor opens its own connection and reads one key-range slice, so
``num_partitions`` caps concurrent connections exactly like the
reference's ``pool.max``, and (partition_column, lower/upper bound) give
range parallelism the single-connection reference cannot express.

The MSSQL driver jar is absent here, so the reference-parity `.load()`
path is config-tested only — but the JDBC surface itself IS live-tested
end-to-end: Spark ships embedded Apache Derby (the Hive-metastore
dependency), and tests/test_sources.py runs a REAL write → partitioned
read → filter roundtrip against it, asserting in-plan that the
predicate was pushed INTO the database (`PushedFilters: [*...]`) and
that numPartitions produced genuinely parallel range slices. The
generic url/driver entry points below are what that e2e exercises; the
MSSQL-shaped helpers delegate to the same assembly.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, SparkSession

DEFAULT_PORT = 1433  # reference default, server.js:16
DEFAULT_FETCHSIZE = 10_000


def jdbc_url_options(
    url: str,
    table: str,
    driver: str,
    user: str | None = None,
    password: str | None = None,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int | None = None,
    fetchsize: int = DEFAULT_FETCHSIZE,
    **extra: Any,
) -> dict[str, str]:
    """Assemble the spark.read/write.format('jdbc') option map for ANY
    JDBC url/driver (embedded databases need no credentials). Pure — no
    driver or connection required to build."""
    opts: dict[str, str] = {
        "url": url,
        "dbtable": table,
        "driver": driver,
        "fetchsize": str(fetchsize),
    }
    if user is not None:
        opts["user"] = user
    if password is not None:
        opts["password"] = password
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
    source shaped like the reference's dbConfig (server.js:11-26) —
    the url/driver specialization of ``jdbc_url_options``."""
    url = (
        f"jdbc:sqlserver://{server}:{port};databaseName={database};"
        f"encrypt={'true' if encrypt else 'false'};trustServerCertificate=true"
    )
    return jdbc_url_options(
        url=url,
        table=table,
        driver="com.microsoft.sqlserver.jdbc.SQLServerDriver",
        user=user,
        password=password,
        partition_column=partition_column,
        lower_bound=lower_bound,
        upper_bound=upper_bound,
        num_partitions=num_partitions,
        fetchsize=fetchsize,
        **extra,
    )


def read_jdbc(spark: SparkSession, **kwargs: Any) -> DataFrame:
    """S5: partitioned JDBC read. Keyword args as in ``jdbc_options``.
    Raises a clear error when no JDBC driver jar is on the classpath
    (the import-guard analog for a JVM-side dependency)."""
    return _load(spark, jdbc_options(**kwargs))


def read_jdbc_url(spark: SparkSession, **kwargs: Any) -> DataFrame:
    """Partitioned JDBC read for any url/driver (keyword args as in
    ``jdbc_url_options``) — the entry point the embedded-Derby e2e
    drives for real in this container."""
    return _load(spark, jdbc_url_options(**kwargs))


def write_jdbc(df: DataFrame, mode: str = "errorifexists", **kwargs: Any) -> None:
    """JDBC sink twin of ``read_jdbc_url`` — ships the DataFrame into the
    database table (each partition opens one connection, so the writing
    parallelism is the frame's partitioning)."""
    opts = jdbc_url_options(**kwargs)
    opts.pop("fetchsize", None)  # reader-only option
    df.write.format("jdbc").options(**opts).mode(mode).save()


def _load(spark: SparkSession, opts: dict[str, str]) -> DataFrame:
    try:
        return spark.read.format("jdbc").options(**opts).load()
    except Exception as exc:  # driver jar missing, connection refused, ...
        raise RuntimeError(
            "JDBC read failed — is the driver jar on the Spark classpath "
            f"and the database reachable? (url={opts['url']})"
        ) from exc
