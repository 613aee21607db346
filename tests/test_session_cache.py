"""Lifecycle tests for the session-scoped persisted-frame cache
(sql_cdc_spark/queries/_cache.py) — the contract dd_containment_pairs/
dd_containment_sweep and scl_skew_census share their expensive
intermediates under (ADVICE r5 / VERDICT r5 #5)."""

from tests.conftest import SF_DIR

from sql_cdc_spark.queries import _cache


def _cache_manager(spark):
    return spark._jsparkSession.sharedState().cacheManager()


def _is_persisted(df) -> bool:
    lvl = df.storageLevel
    return bool(lvl.useMemory or lvl.useDisk or lvl.useOffHeap)


def test_skew_census_pinned_storage_is_bounded(spark):
    """Repeated census invocations must NOT accumulate InMemoryRelations:
    r5's per-call persist() leaked one tiny pinned frame per tracked key
    per call (VERDICT r5 #5). With the session cache the JVM-side count
    is exactly one per tracked key however many times the census runs."""
    import __spark_entry__ as entry

    from sql_cdc_spark.queries.scale_q import SKEW_KEYS

    spark.catalog.clearCache()
    census = entry.queries()["scl_skew_census"]
    for _ in range(4):
        assert census(spark, SF_DIR).count() == len(SKEW_KEYS)
    assert _cache_manager(spark).cachedData().size() == len(SKEW_KEYS)


def test_containment_base_repersists_after_external_clearcache(spark):
    """bench.py (and several plan tests) call spark.catalog.clearCache()
    mid-session; the shared containment base must come back persisted on
    the next access, or the r4 #5 sharing optimization silently degrades
    to a full rare-domain recomputation per query (ADVICE r5)."""
    from sql_cdc_spark.queries.dedup_q import _shared_containment_base

    base = _shared_containment_base(spark, SF_DIR)
    base.count()
    assert _is_persisted(base)
    spark.catalog.clearCache()
    assert not _is_persisted(base)
    again = _shared_containment_base(spark, SF_DIR)
    assert again is base, "cache hit must return the same frame"
    assert _is_persisted(again), "frame must be re-marked for persistence"


def test_dead_session_entries_are_evicted(spark):
    """Entries keyed to an applicationId other than the live session's
    are dropped on the next access, so stopped sessions do not leak
    python-side frame references."""
    app = spark.sparkContext.applicationId
    dead_key = ("no-such-app", "leftover")
    _cache._FRAMES[dead_key] = spark.range(1)
    try:
        got = _cache.session_cached(
            spark, ("_test_evict",), lambda: spark.range(2)
        )
        assert dead_key not in _cache._FRAMES
        assert got.count() == 2
    finally:
        _cache._FRAMES.pop(dead_key, None)
        live = _cache._FRAMES.pop((app, "_test_evict"), None)
        if live is not None:
            live.unpersist()
