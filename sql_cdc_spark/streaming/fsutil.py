"""Hadoop-FileSystem directory probes for the streaming cold-start
paths. The feed/changelog readers tolerate a not-yet-existing source
directory (consumer up before producer); doing that with ``os.*`` would
silently create a bogus LOCAL directory when the feed actually lives on
a remote filesystem (hdfs://, s3a://) and then misread the real remote
feed as absent. Routing the probe/create through Hadoop's FileSystem —
the same way expectations.read_violations already does — keeps the
cold-start contract identical for every scheme Spark can read.
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def _fs_and_path(spark: SparkSession, path: str):
    jpath = spark._jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs, jpath


def ensure_dir(spark: SparkSession, path: str) -> None:
    """Create ``path`` (any Hadoop-supported scheme) if it is missing,
    so a schema'd read over it yields zero rows instead of
    PATH_NOT_FOUND."""
    fs, jpath = _fs_and_path(spark, path)
    if not fs.exists(jpath):
        fs.mkdirs(jpath)


def has_parquet_files(spark: SparkSession, path: str) -> bool:
    """True when ``path`` exists and holds at least one ``*.parquet``
    file (recursively) — the emptiness probe for cold-start readers."""
    fs, jpath = _fs_and_path(spark, path)
    if not fs.exists(jpath):
        return False
    it = fs.listFiles(jpath, True)
    while it.hasNext():
        if it.next().getPath().getName().endswith(".parquet"):
            return True
    return False
