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


def test_containment_base_shares_family_shingle_frame(spark):
    """r9 optimization: _shared_containment_base must consume the
    family-wide session-cached shingle frame — one
    normalize/tokenize/shingle/hash explode per session across the
    MinHash AND containment families (the r9 10x decomposition put that
    scan at ~74% of the containment pipeline) — not a private
    doc_shingles scan that only CacheManager plan-matching could
    deduplicate."""
    from sql_cdc_spark.queries import _cache
    from sql_cdc_spark.queries.dedup_q import _shared_containment_base

    app = spark.sparkContext.applicationId
    # drop any prior entries so the assertion sees THIS build's effect
    for k in [k for k in _cache._FRAMES if k[0] == app]:
        _cache._FRAMES.pop(k).unpersist()
    _shared_containment_base(spark, SF_DIR)
    keys = {k[1] for k in _cache._FRAMES if k[0] == app}
    assert "containment_base" in keys, keys
    assert "shingle_base" in keys, (
        "containment base no longer builds on the shared shingle frame",
        keys,
    )


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


def test_shingle_base_is_shared_and_repersists(spark):
    """The MinHash family's (shingled, sigs) pair lives on the
    session_cached contract (VERDICT r6 #6): four registry queries share
    TWO pinned frames per sf_dir however many times they run, and an
    external clearCache re-marks both for persistence on next access."""
    from sql_cdc_spark.queries.dedup_q import _shingle_base

    shingled, sigs = _shingle_base(spark, SF_DIR)
    sh2, sg2 = _shingle_base(spark, SF_DIR)
    assert sh2 is shingled and sg2 is sigs, "cache hit must reuse frames"
    sigs.count()
    assert _is_persisted(shingled) and _is_persisted(sigs)
    spark.catalog.clearCache()
    assert not _is_persisted(shingled)
    sh3, sg3 = _shingle_base(spark, SF_DIR)
    assert sh3 is shingled and sg3 is sigs
    assert _is_persisted(sh3), "frame must be re-marked for persistence"
    assert _is_persisted(sg3), "frame must be re-marked for persistence"


def test_family_shingle_share_covers_r10_consumers(spark):
    """r10 optimization: dd_jaccard_pairs, dd_source_overlap and
    crp_fuzzy_contamination must build on the session-cached family
    shingle frame (one shingle explode + signature aggregate per
    session across the whole dedup family) — not private doc_shingles
    scans. Structural: building each query's frame must register the
    shared cache keys."""
    import __spark_entry__ as entry

    app = spark.sparkContext.applicationId
    qs = entry.queries()
    for name in (
        "dd_jaccard_pairs",
        "dd_source_overlap",
        "crp_fuzzy_contamination",
    ):
        for k in [k for k in _cache._FRAMES if k[0] == app]:
            _cache._FRAMES.pop(k).unpersist()
        qs[name](spark, SF_DIR)
        keys = {k[1] for k in _cache._FRAMES if k[0] == app}
        assert {"shingle_base", "shingle_sigs"} <= keys, (name, keys)


def test_winnow_base_is_shared(spark):
    """r10 optimization: both winnow registry queries must read the
    per-doc fingerprint table from ONE session-cached frame (the scan
    feeds four subtrees per session: the census query plus the pair
    report's df/postings/size branches)."""
    import __spark_entry__ as entry

    app = spark.sparkContext.applicationId
    for k in [k for k in _cache._FRAMES if k[0] == app]:
        _cache._FRAMES.pop(k).unpersist()
    qs = entry.queries()
    qs["txt_winnow_fingerprints"](spark, SF_DIR)
    keys = {k[1] for k in _cache._FRAMES if k[0] == app}
    assert "winnow_base" in keys, keys
    frame = _cache._FRAMES[(app, "winnow_base", SF_DIR)]
    qs["txt_winnow_pairs"](spark, SF_DIR)
    assert _cache._FRAMES[(app, "winnow_base", SF_DIR)] is frame, (
        "pair report must reuse the census's cached fingerprint frame"
    )


def test_no_bare_persist_in_query_modules():
    """Every persisted intermediate in the query layer must go through
    the _cache.session_cached lifecycle — a bare .persist() is invisible
    to the re-persist-after-clearCache and dead-session-eviction
    guarantees the contract documents (VERDICT r6 #6). Enforced on
    source text so a new query module cannot regress silently."""
    import pathlib

    import sql_cdc_spark.queries as q

    qdir = pathlib.Path(q.__file__).parent
    offenders = [
        f"{p.name}:{i + 1}"
        for p in sorted(qdir.glob("*.py"))
        if p.name != "_cache.py"
        for i, ln in enumerate(p.read_text().splitlines())
        if ".persist()" in ln and not ln.lstrip().startswith("#")
    ]
    assert not offenders, f"bare persist outside _cache.py: {offenders}"
