"""Kafka change-feed source — the at-scale CDC transport.

The reference polls SQL Server Change Tracking over JDBC
(invoice-api/server.js:46-52); production CDC at 100 TB almost always
lands the same change events on a log bus instead (Debezium → Kafka),
and Spark's Kafka connector is the idiomatic ingress:
``spark.readStream.format("kafka")`` gives per-record (key, value,
topic, partition, offset, timestamp) with checkpointed offset tracking —
Kafka offsets play the role our SyncStateRegistry cursor plays for the
file changelog.

The spark-sql-kafka jar is not in this container, so the ``.load()``
calls are guarded exactly like sources/jdbc.py and sources/delta_cdf.py.
Option assembly and the payload→changelog normalization are pure
DataFrame logic, unit-tested on in-memory frames shaped like the
connector's output (tests/test_sources.py).

At scale: one Spark input partition per Kafka partition (parallelism =
topic partitioning, no shuffle on ingest); ``maxOffsetsPerTrigger`` is
the backpressure bound (T8's ``limit`` analog); the JSON value parse is
scan-side column algebra.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# the change-event payload contract: Debezium-ish flattened JSON carrying
# the same fields as the changelog convention (streaming/changelog.py).
# change_version MUST come from the payload (the tracked store's monotone
# counter) — Kafka offsets are per-partition and cannot order a topic.
PAYLOAD_SCHEMA = T.StructType(
    [
        T.StructField("table_name", T.StringType()),
        T.StructField("key_id", T.LongType()),
        T.StructField("change_version", T.LongType()),
        T.StructField("op", T.StringType()),
    ]
)


def kafka_options(
    bootstrap_servers: str,
    topic: str,
    starting_offsets: str = "earliest",
    ending_offsets: str | None = None,
    max_offsets_per_trigger: int | None = None,
    fail_on_data_loss: bool = True,
    extra: dict[str, str] | None = None,
) -> dict[str, str]:
    """Assemble the Kafka reader option map. ``max_offsets_per_trigger``
    is the streaming backpressure bound (T8); ``ending_offsets`` only
    applies to batch reads."""
    if not bootstrap_servers or not topic:
        raise ValueError("bootstrap_servers and topic are required")
    opts = {
        "kafka.bootstrap.servers": bootstrap_servers,
        "subscribe": topic,
        "startingOffsets": starting_offsets,
        "failOnDataLoss": str(fail_on_data_loss).lower(),
    }
    if ending_offsets is not None:
        opts["endingOffsets"] = ending_offsets
    if max_offsets_per_trigger is not None:
        if max_offsets_per_trigger <= 0:
            raise ValueError("max_offsets_per_trigger must be positive")
        opts["maxOffsetsPerTrigger"] = str(max_offsets_per_trigger)
    opts.update(extra or {})
    return opts


def read_kafka(spark: SparkSession, **kwargs) -> DataFrame:
    """Bounded batch read of a topic (offsets-range snapshot). Keyword
    args as in ``kafka_options``. Raises a clear error where the
    spark-sql-kafka jar is absent (this container)."""
    opts = kafka_options(**kwargs)
    try:
        return spark.read.format("kafka").options(**opts).load()
    except Exception as exc:
        raise RuntimeError(
            "Kafka read failed — is spark-sql-kafka on the classpath and "
            f"are brokers '{opts['kafka.bootstrap.servers']}' reachable?"
        ) from exc


def read_kafka_stream(spark: SparkSession, **kwargs) -> DataFrame:
    """Streaming read — each micro-batch advances the checkpointed
    offsets (the connector's analog of cursor advance-on-success, T2/T3).
    Jar-guarded like ``read_kafka``."""
    opts = kafka_options(**kwargs)
    opts.pop("endingOffsets", None)  # batch-only option
    try:
        return spark.readStream.format("kafka").options(**opts).load()
    except Exception as exc:
        raise RuntimeError(
            "Kafka stream failed — is spark-sql-kafka on the classpath and "
            f"are brokers '{opts['kafka.bootstrap.servers']}' reachable?"
        ) from exc


def kafka_to_changelog(records: DataFrame) -> DataFrame:
    """Normalize connector output rows to the engine's changelog
    convention (table_name, key_id, change_version, op, ts): parse the
    JSON value payload, take the broker timestamp as ts. Rows whose
    payload does not parse (or misses mandatory fields) are dropped —
    poison messages must not kill the feed; count them upstream via
    ``observe`` if a dead-letter metric is needed. Pure column algebra
    over any frame with (value binary/string, timestamp) — testable
    without a broker, reusable on the real connector frame."""
    payload = F.from_json(F.col("value").cast("string"), PAYLOAD_SCHEMA)
    return (
        records.select(
            payload.alias("p"), F.col("timestamp").cast("timestamp").alias("ts")
        )
        .filter(
            F.col("p").isNotNull()
            & F.col("p.key_id").isNotNull()
            & F.col("p.change_version").isNotNull()
            # op/table_name are mandatory too: a null op would later make
            # apply_changes_to_replica's `op != 'D'` evaluate NULL and the
            # row be treated as a delete; a null table_name can never route
            & F.col("p.op").isNotNull()
            & F.col("p.table_name").isNotNull()
        )
        .select(
            F.col("p.table_name").alias("table_name"),
            F.col("p.key_id").alias("key_id"),
            F.col("p.change_version").alias("change_version"),
            F.col("p.op").alias("op"),
            "ts",
        )
    )


def encode_change_event(
    table_name: str, key_id: int, change_version: int, op: str
) -> bytes:
    """The producer-side twin of ``kafka_to_changelog``'s parse — used by
    tests and by any harness publishing the changelog convention."""
    return json.dumps(
        {
            "table_name": table_name,
            "key_id": key_id,
            "change_version": change_version,
            "op": op,
        }
    ).encode()
