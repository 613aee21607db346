"""Pipeline observability (T10): the reference's per-request performance
summary (invoice-api/server.js:258-298 — stage timings, rows/sec,
files/sec, progress logging) re-expressed as a StreamingQueryListener plus
a small metrics accumulator shared with the batch pull loop.

On a cluster the same listener feeds whatever metrics backend is attached;
locally it keeps an in-memory history that tests and bench can read.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from pyspark.sql.streaming import StreamingQueryListener


@dataclass
class BatchMetrics:
    batch_id: int
    num_input_rows: int
    input_rows_per_second: float
    process_rows_per_second: float
    duration_ms: dict[str, int]
    timestamp: float = field(default_factory=time.time)


class PipelineMetricsListener(StreamingQueryListener):
    """Collects per-micro-batch progress for every query on the session —
    the engine-native form of the reference's performance block
    (queryDatabase/parseData/saveBSON stage ms + invoicesPerSecond)."""

    def __init__(self) -> None:
        self.history: list[BatchMetrics] = []
        self.started: list[str] = []
        self.terminated: list[str] = []

    # -- listener callbacks -------------------------------------------------
    def onQueryStarted(self, event) -> None:
        self.started.append(str(event.id))

    def onQueryProgress(self, event) -> None:
        p = event.progress
        self.history.append(
            BatchMetrics(
                batch_id=p.batchId,
                num_input_rows=p.numInputRows,
                input_rows_per_second=p.inputRowsPerSecond or 0.0,
                process_rows_per_second=p.processedRowsPerSecond or 0.0,
                duration_ms=dict(p.durationMs or {}),
            )
        )

    def onQueryIdle(self, event) -> None:  # pragma: no cover - timing dependent
        pass

    def onQueryTerminated(self, event) -> None:
        self.terminated.append(str(event.id))

    # -- aggregate views ----------------------------------------------------
    def total_rows(self) -> int:
        return sum(m.num_input_rows for m in self.history)

    def summary(self) -> dict:
        """The reference's response `performance` block, aggregated."""
        rows = self.total_rows()
        add_batch = sum(m.duration_ms.get("addBatch", 0) for m in self.history)
        total_ms = sum(
            m.duration_ms.get("triggerExecution", 0) for m in self.history
        )
        return {
            "batches": len(self.history),
            "rows": rows,
            "addBatch_ms": add_batch,
            "total_ms": total_ms,
            "rows_per_second": round(rows * 1000.0 / total_ms, 1) if total_ms else 0.0,
        }
