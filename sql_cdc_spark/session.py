"""SparkSession factory.

Local test runs use local[$SPARK_GRAFT_CPUS]; on a real cluster the same
configs apply per-executor. Everything here is sized so the same code
scales from the sf0.01 correctness runs to a 1000-executor / 100 TB
deployment: AQE handles runtime re-planning (partition coalescing, skew
joins), shuffle partitions default to the parallelism of the local run but
should be overridden (or left to AQE) on a cluster, and Arrow is enabled
for the Pandas-UDF slow path.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "sql-cdc-spark",
    *,
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) the tuned SparkSession.

    Scale stance (100 TB): AQE on (runtime partition coalescing + skew-join
    splitting), auto broadcast for dimension tables, partition sizes capped
    so a task's input fits executor memory, UTC timestamps so results are
    reproducible across sites.
    """
    cpus = default_parallelism()
    driver_mem = os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g")
    # maxResultSize must stay well under the driver heap, or a large
    # legitimate broadcast build OOM-kills the JVM instead of aborting
    # with the clean maxResultSize error: heap/4, floored at
    # min(256 MB, heap/2) and capped at 4 GB — the floor itself is
    # heap-relative so even a tiny configured heap (e.g.
    # SPARK_GRAFT_DRIVER_MEM=200m) can never be assigned a limit at or
    # above the heap, which would reintroduce the
    # OOM-instead-of-clean-abort failure this exists to prevent
    # (ADVICE r5: a flat 256 MB floor broke the guarantee below ~1 GB)
    try:
        m = driver_mem.lower()
        if m.endswith(("m", "mb")):
            heap_mb = int(m.rstrip("mb"))
        else:
            heap_mb = int(m.rstrip("gb") or "48") * 1024
    except ValueError:
        heap_mb = 48 * 1024
    max_result_mb = min(4096, max(min(256, heap_mb // 2), heap_mb // 4))
    # Python workers re-import this package when a UDF closure references
    # it (cloudpickle pickles module-level functions by reference), so the
    # package root must be on the workers' PYTHONPATH — the driver's
    # sys.path is NOT inherited. Local mode: export it before the JVM
    # forks the worker daemon. Cluster mode: ship a wheel via --py-files;
    # this env line is still correct for the driver-side process.
    pkg_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    existing = os.environ.get("PYTHONPATH", "")
    if pkg_root not in existing.split(os.pathsep):
        os.environ["PYTHONPATH"] = (
            f"{pkg_root}{os.pathsep}{existing}" if existing else pkg_root
        )
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master or f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", driver_mem)
        # Headroom for legitimate broadcast builds in the mid-scale band
        # where a table's COMPRESSED shuffle output sits under the 64 MB
        # broadcast threshold but deserializes to ~1 GiB (integer-dense
        # pair/posting tables compress ~10-30×; the 100× stress hit the
        # default 1g here). Structurally-wrong broadcasts are fixed with
        # per-join hints (dedup._attach_sizes); this raises the ceiling
        # for the ones that are genuinely the right plan, capped by the
        # configured driver heap (see max_result_gb above).
        .config("spark.driver.maxResultSize", f"{max_result_mb}m")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.streaming.schemaInference", "false")
        # test parquet uses TIMESTAMP(NANOS), which Spark's vectorized reader
        # rejects; read as long and convert in tables.load (lossless — the
        # data is microsecond-precision)
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # Pin the JVM default locale (ADVICE r9): the Arrow shingling
        # kernel's bit-identity to the JVM reference relies on Python
        # str.lower() matching UTF8String.toLowerCase, whose non-ASCII
        # path delegates to java String.toLowerCase under the DEFAULT
        # locale — on a tr/az-locale JVM 'I' lowercases to dotless 'ı'
        # on the JVM side but 'i' in Python, a silent kernel-vs-
        # reference divergence. en_US makes the parity contract hold on
        # any host. (Applies at JVM launch; a pre-existing JVM in this
        # process keeps its locale, which on this box is already en.)
        .config(
            "spark.driver.extraJavaOptions",
            "-Duser.language=en -Duser.country=US",
        )
        .config(
            "spark.executor.extraJavaOptions",
            "-Duser.language=en -Duser.country=US",
        )
        # BI endpoint (sources/biserver.py): Thrift-server connections
        # share THIS session so JDBC clients see the registered temp
        # views; inert unless start_bi_endpoint is called
        .config("spark.sql.hive.thriftServer.singleSession", "true")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
