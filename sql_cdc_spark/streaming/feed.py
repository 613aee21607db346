"""Shared scaffolding for the streaming state-maintenance family
(near-dup, ANN postings, HLL sketches, DF/IDF vocabulary, SCD2 history).

Every maintenance module has the same skeleton: a schema'd parquet
readStream over an append-only change-feed directory, a latest-op-per-key
collapse of each micro-batch, and a foreachBatch availableNow drain that
threads a state object through the batches, releasing each superseded
snapshot. One implementation here means a drain-loop fix (timeout
handling, release ordering) lands everywhere at once.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def ckpt(df: DataFrame, enabled: bool) -> DataFrame:
    """Eager localCheckpoint when enabled — the lineage cut every
    incremental state rewrite needs so chained batches don't replan the
    whole history."""
    return df.localCheckpoint(eager=True) if enabled else df


def read_feed(
    spark: SparkSession,
    feed_dir: str,
    schema: str,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Streaming source over a parquet change-feed directory."""
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", int(max_files_per_trigger))
    return reader.parquet(feed_dir)


def collapse_latest(
    batch_df: DataFrame,
    id_col: str,
    payload_col: str,
    version_col: str = "change_version",
    op_col: str = "op",
) -> tuple[DataFrame, DataFrame]:
    """Latest-op-per-key collapse of one change batch → (upserts,
    deletes). Plain batch column algebra, unit-testable without a
    stream; a key whose last op in the batch is a delete lands in
    ``deletes``, every other key in ``upserts`` with its winning
    payload."""
    latest = batch_df.groupBy(id_col).agg(
        F.max_by(F.struct(op_col, payload_col), F.col(version_col)).alias("w")
    )
    upserts = latest.filter(
        (F.col(f"w.{op_col}") != "D") & F.col(f"w.{payload_col}").isNotNull()
    ).select(id_col, F.col(f"w.{payload_col}").alias(payload_col))
    deletes = latest.filter(F.col(f"w.{op_col}") == "D").select(id_col)
    return upserts, deletes


def drain_feed(
    spark: SparkSession,
    feed_dir: str,
    schema: str,
    checkpoint_dir: str,
    initial,
    apply_fn: Callable,
    release_fn: Callable,
    *,
    max_files_per_trigger: int | None = 1,
    timeout_s: int = 300,
):
    """Drain the change feed with trigger(availableNow), threading the
    state through ``apply_fn(prev_state, batch_df) -> next_state`` per
    micro-batch; returns (final_state, n_batches).

    Ownership: each superseded state is released via ``release_fn`` the
    moment its successor exists — callers must not reuse the passed-in
    state after this returns; the returned state is live and
    caller-owned. An apply that returns the SAME object (a no-op batch,
    e.g. fully replayed under a watermark cursor) releases nothing."""
    holder: dict = {"state": initial, "batches": 0}

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        prev = holder["state"]
        nxt = apply_fn(prev, batch_df)
        if nxt is not prev:
            release_fn(prev)
        holder["state"] = nxt
        holder["batches"] += 1

    query = (
        read_feed(spark, feed_dir, schema, max_files_per_trigger)
        .writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination(timeout_s)
    return holder["state"], holder["batches"]
