"""BI serving endpoint — a HiveServer2-protocol SQL endpoint over the
engine's catalog.

The reference ships Superset dashboards over the denormalized invoice
view (superset/Dockerfile:33,47; sqls/vw_Invoicedetails.sql:5-19),
served by SQL Server. The Spark analog is the bundled Thrift server:
``start_bi_endpoint`` exposes THIS session's catalog (temp views
included) on a TCP port speaking the HiveServer2 protocol, which every
JDBC/ODBC BI tool (Superset, Tableau, DBeaver, beeline) already speaks.
``jdbc_query`` is the in-JVM Hive-JDBC client — a genuine network round
trip through the endpoint (driver → Thrift socket → Spark SQL →
resultset wire format), the same path a BI tool takes, so the
integration is testable inside this container with no external service.

Temp-view visibility requires ``spark.sql.hive.thriftServer.
singleSession=true`` at session build (sql_cdc_spark.session.get_spark
sets it): without it every JDBC connection opens a fresh Spark session
that only sees persistent catalog objects.

Scale stance: the endpoint serves the SAME lazy view plans the engine
runs — predicates and projections push through
``register_star_schema``'s views into the parquet scans, so a BI
dashboard filter becomes a partition-pruned scan, not a full-table pull.
"""

from __future__ import annotations

import time

from pyspark.sql import SparkSession

DEFAULT_PORT = 10000


def start_bi_endpoint(
    spark: SparkSession, port: int = DEFAULT_PORT, host: str = "127.0.0.1"
):
    """Start the HiveServer2-protocol endpoint bound to this session's
    catalog; returns the server handle (``handle.stop()`` shuts it
    down). Raises RuntimeError when the thriftserver jar is absent
    (e.g. a spark distribution built without -Phive-thriftserver)."""
    spark.conf.set("hive.server2.thrift.port", str(port))
    spark.conf.set("hive.server2.thrift.bind.host", host)
    try:
        cls = (
            spark._jvm.org.apache.spark.sql.hive.thriftserver.HiveThriftServer2
        )
        return cls.startWithContext(spark._jsparkSession.sqlContext())
    except (TypeError, AttributeError) as exc:  # JavaPackage not callable
        raise RuntimeError(
            "spark-hive-thriftserver jar not on the classpath — the BI "
            "endpoint needs a Spark build with -Phive-thriftserver"
        ) from exc


def jdbc_query(
    spark: SparkSession,
    sql: str,
    port: int = DEFAULT_PORT,
    host: str = "127.0.0.1",
    connect_retries: int = 10,
) -> tuple[list[str], list[tuple]]:
    """Run one query through the endpoint via the Hive JDBC driver —
    over the real TCP socket, NOT a spark.sql shortcut — and return
    (column_names, rows). py4j maps SQL primitives to Python ints /
    floats / strs / bools; exotic types (timestamps, decimals) come back
    as Java objects — cast to STRING in the query for those. Retries the
    connect briefly because the Thrift server binds asynchronously after
    start_bi_endpoint returns."""
    jvm = spark._jvm
    jvm.java.lang.Class.forName("org.apache.hive.jdbc.HiveDriver")
    url = f"jdbc:hive2://{host}:{port}/default"
    conn = None
    for attempt in range(connect_retries):
        try:
            conn = jvm.java.sql.DriverManager.getConnection(url, "", "")
            break
        except Exception:
            if attempt == connect_retries - 1:
                raise
            time.sleep(1.0)
    try:
        rs = conn.createStatement().executeQuery(sql)
        md = rs.getMetaData()
        ncols = md.getColumnCount()
        cols = [md.getColumnName(i + 1) for i in range(ncols)]
        rows = []
        while rs.next():
            rows.append(tuple(rs.getObject(i + 1) for i in range(ncols)))
        return cols, rows
    finally:
        conn.close()
