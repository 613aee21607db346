"""Change-log convention + test-harness writer.

The engine's CDC source is any append-only parquet/Delta directory with
the schema below — the contract SQL Server Change Tracking exposes via
CHANGETABLE (reference sqls/setup-invoice-db.sql:70-109, FIXTURES.md §A3):

    table_name      string   which base table changed
    key_id          long     PK of the changed row (invoice or line id)
    change_version  long     monotone global counter
    op              string   'I' | 'U' | 'D'
    ts              timestamp change time

Line-table rows carry the LINE pk; the invoice key must be recovered by
joining the base line table (sqls/storedprocedure.sql:23-26) — the writer
deliberately does NOT denormalize it, to preserve that semantic.

At 100 TB the directory would be partitioned by change_version range (or
date); readers then get partition pruning on the version predicate. The
harness writer keeps one file per append batch, which is exactly the shape
a streaming file source tails.
"""

from __future__ import annotations

import os
import random

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

CHANGELOG_SCHEMA = T.StructType(
    [
        T.StructField("table_name", T.StringType(), False),
        T.StructField("key_id", T.LongType(), False),
        T.StructField("change_version", T.LongType(), False),
        T.StructField("op", T.StringType(), False),
        T.StructField("ts", T.TimestampType(), True),
    ]
)

HEADER_TABLE = "invoice_header"
LINE_TABLE = "invoice_line"


class ChangeLogWriter:
    """Test harness: appends change batches with a monotone version
    counter — replicates Change Tracking's contract so pipeline tests can
    produce multiple versions per key, line-only changes, header-only
    changes, and version ties (FIXTURES.md §A3 generator rules)."""

    def __init__(self, spark: SparkSession, log_dir: str, seed: int = 42):
        self.spark = spark
        self.log_dir = log_dir
        self.rng = random.Random(seed)
        self.version = 0
        os.makedirs(log_dir, exist_ok=True)

    def append(self, rows: list[tuple[str, int, str]]) -> int:
        """Append change rows [(table_name, key_id, op)], each assigned the
        next version. Returns the new high watermark."""
        data = []
        for table_name, key_id, op in rows:
            self.version += 1
            data.append((table_name, int(key_id), self.version, op))
        df = self.spark.createDataFrame(
            [(t, k, v, o, None) for t, k, v, o in data], CHANGELOG_SCHEMA
        ).withColumn("ts", F.current_timestamp())
        df.coalesce(1).write.mode("append").parquet(self.log_dir)
        return self.version

    def append_with_ties(self, rows: list[tuple[str, int, str]]) -> int:
        """Append change rows that all share ONE version — the tie regime
        where the composite (version, key) cursor is load-bearing
        (invoice-api/server.js:165-168)."""
        self.version += 1
        df = self.spark.createDataFrame(
            [(t, int(k), self.version, o, None) for t, k, o in rows],
            CHANGELOG_SCHEMA,
        ).withColumn("ts", F.current_timestamp())
        df.coalesce(1).write.mode("append").parquet(self.log_dir)
        return self.version


VERSION_BUCKET_SIZE = 10_000


def write_changelog_partitioned(
    changes: DataFrame, log_dir: str, bucket_size: int = VERSION_BUCKET_SIZE
) -> None:
    """Append change rows under `version_bucket=N/` directories
    (N = change_version // bucket_size) — the at-scale layout SURVEY.md §
    prescribes: version predicates become partition pruning, so an
    incremental pull from version v touches only ⌈(hw−v)/bucket⌉
    directories of a log holding years of history."""
    (
        changes.withColumn(
            "version_bucket", (F.col("change_version") / bucket_size).cast("long")
        )
        .write.mode("append")
        .partitionBy("version_bucket")
        .parquet(log_dir)
    )


def read_changelog(spark: SparkSession, log_dir: str) -> DataFrame:
    """Batch view of the change log. Handles both the flat test-harness
    layout and the partitioned `version_bucket=` layout (the partition
    column is dropped after read — pruning has already happened).

    Cold start: a consumer can come up before the producer has written a
    single change — a missing log dir is created empty (schema'd read of
    zero rows) rather than failing PATH_NOT_FOUND; via Hadoop FileSystem
    so remote log dirs keep the contract (fsutil, ADVICE r4)."""
    from sql_cdc_spark.streaming.fsutil import ensure_dir

    ensure_dir(spark, log_dir)
    df = spark.read.schema(CHANGELOG_SCHEMA).parquet(log_dir)
    if "version_bucket" in df.columns:
        df = df.drop("version_bucket")
    return df


def read_changelog_range(
    spark: SparkSession,
    log_dir: str,
    since_exclusive: int,
    until_inclusive: int,
    bucket_size: int = VERSION_BUCKET_SIZE,
) -> DataFrame:
    """Bounded change scan over a partitioned log: the version range is
    translated to a version_bucket range so the scan prunes to the
    matching directories (visible as PartitionFilters in the plan), then
    exact row-level predicates apply within them. Falls back to plain
    row-level filtering on a flat log."""
    df = spark.read.parquet(log_dir)
    if "version_bucket" in df.columns:
        df = df.filter(
            (F.col("version_bucket") >= since_exclusive // bucket_size)
            & (F.col("version_bucket") <= until_inclusive // bucket_size)
        ).drop("version_bucket")
    return df.filter(
        (F.col("change_version") > since_exclusive)
        & (F.col("change_version") <= until_inclusive)
    )


def read_changelog_stream(spark: SparkSession, log_dir: str, max_files_per_trigger: int | None = None) -> DataFrame:
    """Streaming view (file source). maxFilesPerTrigger is the
    backpressure bound — the reference's `limit` param analog (T8).
    Missing dir = empty cold-start log, same as the batch view."""
    from sql_cdc_spark.streaming.fsutil import ensure_dir

    ensure_dir(spark, log_dir)
    reader = spark.readStream.schema(CHANGELOG_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(log_dir)


def current_version(spark: SparkSession, log_dir: str) -> int:
    """CHANGE_TRACKING_CURRENT_VERSION() analog (sqls/storedprocedure.sql:11-12):
    the high watermark used to snapshot-bound a pull."""
    row = read_changelog(spark, log_dir).agg(F.max("change_version")).first()
    return row[0] or 0


RETENTION_MARKER = "_retention.json"  # '_' prefix: parquet readers skip it


def retention_floor(log_dir: str) -> int:
    """The oldest change_version retention has ever guaranteed present —
    the CHANGE_TRACKING_MIN_VALID_VERSION analog. 0 (everything valid)
    until the first expire_changelog run records a floor. Stored as a
    marker file inside the log dir so it travels with the log."""
    import json as _json
    import os as _os

    path = _os.path.join(log_dir, RETENTION_MARKER)
    if not _os.path.exists(path):
        return 0
    with open(path) as f:
        return int(_json.load(f)["min_version"])


def write_retention_floor(log_dir: str, min_version: int) -> int:
    """Record the retention floor (monotone: never lowers an existing
    one). Returns the recorded floor."""
    import json as _json
    import os as _os

    floor = max(int(min_version), retention_floor(log_dir))
    path = _os.path.join(log_dir, RETENTION_MARKER)
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        _json.dump({"min_version": floor}, f)
    _os.replace(tmp, path)
    return floor
