"""Polling consumer (reference invoice-api/consumer.js:6-49): a timer
loop that drains all available batches each tick, never advancing on
error. The Spark-native replacement for the timer is a Structured
Streaming trigger; this utility exists for operational parity (cron-style
deployments driving the batch pull loop).
"""

from __future__ import annotations

import time
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from sql_cdc_spark.streaming import pipeline as pl
from sql_cdc_spark.streaming.registry import SyncStateRegistry


def poll_loop(
    spark: SparkSession,
    log_dir: str | DataFrame,
    consumer: str,
    registry: SyncStateRegistry,
    header: DataFrame,
    lines: DataFrame,
    model: pl.InvoiceModel,
    out_dir: str,
    limit: int = 1000,
    interval_s: float = 300.0,
    max_polls: int | None = None,
    on_batch: Callable[[pl.BatchResult], None] | None = None,
    on_error: Callable[[Exception], None] | None = None,
    max_consecutive_failures: int = 10,
    sleep: Callable[[float], None] = time.sleep,
) -> list[pl.BatchResult]:
    """Poll every interval_s: drain until `hasMore` is false (immediate
    re-poll, consumer.js:34-37), report each batch, sleep, repeat. On a
    batch error the cursor is simply not advanced (pull_batch's
    advance-only-on-success), so the next tick retries from the same
    point (consumer.js:39-42). Every error is reported through
    ``on_error`` (default: logged), and ``max_consecutive_failures``
    back-to-back failed ticks abort the loop — a permanently broken batch
    must surface, not spin silently. `max_polls` bounds the loop for
    tests/cron."""
    import logging

    log = logging.getLogger(__name__)
    results: list[pl.BatchResult] = []
    polls = 0
    consecutive_failures = 0
    while max_polls is None or polls < max_polls:
        polls += 1
        try:
            batch_results = pl.drain(
                spark, log_dir, consumer, registry, header, lines, model,
                out_dir, limit=limit,
            )
            results.extend(batch_results)
            consecutive_failures = 0
            if on_batch:
                for r in batch_results:
                    on_batch(r)
        except Exception as exc:
            # don't advance the cursor — but never fail silently
            consecutive_failures += 1
            if on_error is not None:
                on_error(exc)
            else:
                log.warning("poll_loop batch failed (attempt %d/%d): %s",
                            consecutive_failures, max_consecutive_failures, exc)
            if consecutive_failures >= max_consecutive_failures:
                raise RuntimeError(
                    f"poll_loop aborted after {consecutive_failures} "
                    "consecutive failed ticks"
                ) from exc
        if max_polls is not None and polls >= max_polls:
            break
        sleep(interval_s)
    return results
