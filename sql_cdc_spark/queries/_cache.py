"""Session-scoped persisted-frame cache — the documented contract for
queries that share one expensive intermediate across multiple registry
entries or repeated invocations (the containment rare-domain base, the
skew census count-of-counts).

Contract:

- One persisted frame per (applicationId, *key): repeated calls in the
  same session return the SAME frame, so pinned executor storage is
  bounded by the number of distinct keys, not the number of calls.
- Survives an external ``spark.catalog.clearCache()`` (bench.py issues
  one before its stress blocks, and several plan tests do too): on a
  cache hit whose storage level was dropped, the frame is re-marked for
  persistence so the NEXT action re-materializes it — without this the
  shared-base optimization silently degrades to a full recomputation
  per query after any clearCache (ADVICE r5).
- Entries keyed to a dead session (applicationId no longer the live
  one) are evicted on every access, so stopped sessions do not leak
  python-side references.
"""

from __future__ import annotations

from collections.abc import Callable, Hashable

from pyspark.sql import DataFrame, SparkSession

_FRAMES: dict[tuple, DataFrame] = {}


def session_cached(
    spark: SparkSession,
    key: tuple[Hashable, ...],
    build: Callable[[], DataFrame],
) -> DataFrame:
    """Return the session's persisted frame for ``key``, building and
    persisting it on first use. See the module docstring for the
    lifecycle contract."""
    app = spark.sparkContext.applicationId
    for stale in [k for k in _FRAMES if k[0] != app]:
        del _FRAMES[stale]
    full = (app, *key)
    df = _FRAMES.get(full)
    if df is None:
        df = build().persist()
        _FRAMES[full] = df
    else:
        lvl = df.storageLevel
        if not (lvl.useMemory or lvl.useDisk or lvl.useOffHeap):
            # an external clearCache dropped it — re-mark so the next
            # action rebuilds the cached data instead of silently
            # recomputing the subtree once per downstream branch
            df.persist()
    return df
