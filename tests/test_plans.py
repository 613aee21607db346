"""Plan-quality guards: the scale properties that make these queries
viable at 100 TB must be visible in the physical plan — filters reaching
the parquet scan, broadcast joins for small sides, and no row-at-a-time
Python evaluation anywhere in the relational core. A regression that
silently de-optimizes a plan fails here even though results stay correct."""

import pytest

import __spark_entry__ as entry
from tests.conftest import SF_DIR


def _plan(spark, name: str) -> str:
    df = entry.queries()[name](spark, SF_DIR)
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "extended"
    )


@pytest.fixture(scope="module")
def registry_plans(spark) -> dict[str, str]:
    """Extended explain for EVERY registry query, built ONCE per module
    (r10, VERDICT r9 #1): the two whole-registry sweeps below each paid
    their own 192-query plan-build pass (~73 s each in the r9 gate);
    sharing one pass keeps both guards in the driver core gate at a
    third of the cost."""
    spark.catalog.clearCache()
    return {name: _plan(spark, name) for name in entry.queries()}


# queries whose plans may legitimately contain Python evaluation nodes:
# the Arrow-batched multimodal stages, the grouped-map normalization,
# and the BSON codec (a binary format no JVM built-in speaks)
_PANDAS_OK = {
    "mm_decode_features",
    "mm_resize_digest",
    "mm_frame_sample",
    "mm_audio_features",
    "scl_group_zscore",
    "fn_bson_roundtrip",
    # the bit-identical Arrow/BLAS knn election (grouped-map kernel —
    # the documented HOF-per-pair escape hatch, r7)
    "sim_knn_join_arrow",
    # r8 (VERDICT r7 #1): every knn/SemDeDup consumer elects the Arrow
    # kernel strategy — bit-equal to the exact JVM paths by test, 13.7×
    # at the 100× point; presence of the kernel in these plans is
    # itself asserted by test_knn_consumers_elect_arrow_kernel
    "sim_pagerank_fixed3",
    "sim_pagerank_step",
    "sim_mutual_knn",
    "sim_semantic_dedup",
    "sim_semdedup_sweep",
    # r9 (optimization round): doc_shingles is an elected mapInArrow
    # kernel — bit-identical to doc_shingles_exact by test, 3.8× on the
    # 10× scan, and the in-kernel per-doc dedup deletes the distinct
    # exchange. These are the registry consumers whose final plans carry
    # the MapInArrow node (the checkpoint-cut consumers — dup_clusters
    # family, crp_manifest, incremental twins — consume it during
    # construction, so their lineage-cut plans don't show it); presence
    # is asserted by test_shingle_consumers_elect_arrow_kernel
    "crp_fuzzy_contamination",
    "dd_containment_pairs",
    "dd_containment_sweep",
    "dd_jaccard_pairs",
    "dd_lsh_candidate_pairs",
    "dd_lsh_recall_eval",
    "dd_minhash_signatures",
    "dd_near_dup_pairs",
    "dd_source_overlap",
    # r10 (VERDICT r9 ruling): the recall-eval exact reference runs
    # through the Arrow probe-top-k kernel (one scan for the whole
    # panel instead of 4 branches per probe); bit-equal membership via
    # round_micro_half_up's standing F.round parity test
    "sim_ann_recall_eval",
}


def test_ann_recall_exact_side_elects_probe_kernel(spark):
    """r10 done-criterion (VERDICT r9 #2): sim_ann_recall_eval's exact
    reference must PLAN the mapInArrow probe-top-k kernel — one corpus
    scan for the whole probe panel."""
    spark.catalog.clearCache()
    plan = _plan(spark, "sim_ann_recall_eval")
    assert "MapInArrow" in plan, "exact side lost the probe-top-k kernel"


def test_shingle_consumers_elect_arrow_kernel(spark):
    """r9 optimization done-criterion: the shingle consumers must PLAN
    the mapInArrow shingling kernel (the JVM expression path stays
    available as doc_shingles_exact, the cross-implementation
    reference)."""
    for name in (
        "dd_near_dup_pairs",
        "dd_jaccard_pairs",
        "dd_containment_pairs",
    ):
        spark.catalog.clearCache()
        assert "MapInArrow" in _plan(spark, name), (
            f"{name} lost the Arrow shingling kernel"
        )


def test_knn_consumers_elect_arrow_kernel(spark):
    """VERDICT r7 #1 done-criterion: the knn/SemDeDup consumers must
    PLAN the grouped-map Arrow kernel in their knn subtree (the exact
    HOF-fold path measured 13.7× slower at 100× stays available as
    knn_join/elect_nearest, the cross-engine reference)."""
    for name in (
        "sim_knn_join_arrow",
        "sim_pagerank_fixed3",
        "sim_pagerank_step",
        "sim_mutual_knn",
        "sim_semantic_dedup",
        "sim_semdedup_sweep",
    ):
        spark.catalog.clearCache()
        assert "FlatMapGroupsInPandas" in _plan(spark, name), (
            f"{name} lost the Arrow kernel strategy"
        )


def test_no_row_python_udfs_anywhere(registry_plans):
    """BatchEvalPython (row-at-a-time UDF) must never appear; Arrow nodes
    (MapInPandas/ArrowEvalPython) only in the multimodal queries."""
    for name, plan in registry_plans.items():
        assert "BatchEvalPython" not in plan, f"{name} uses a row Python UDF"
        if name not in _PANDAS_OK:
            assert all(
                tok not in plan
                for tok in (
                    "MapInPandas",
                    "ArrowEvalPython",
                    "FlatMapGroupsInPandas",
                    "MapInArrow",
                )
            ), f"{name} unexpectedly routes through Python"


def test_filter_pushdown_reaches_scan(spark):
    plan = _plan(spark, "rel_filter_composite")
    assert "PushedFilters: [" in plan
    # at least one real pushed predicate, not just IsNotNull
    pushed = plan.split("PushedFilters: [", 1)[1].split("]", 1)[0]
    assert any(
        tok in pushed for tok in ("GreaterThan", "LessThan", "In(", "EqualTo")
    ), pushed


def test_column_pruning_reaches_scan(spark):
    plan = _plan(spark, "rel_pricing_summary")
    # the lineitem scan must not read the full 16-column schema
    read = plan.split("ReadSchema: ", 1)[1].splitlines()[0]
    assert read.count(":") <= 8, read


def test_dim_join_is_broadcast(spark):
    plan = _plan(spark, "cdc_net_changes_enriched")
    assert "BroadcastHashJoin" in plan


def test_no_partitionless_window_anywhere(registry_plans):
    """A WindowExec with no PARTITION BY funnels the whole input into one
    task (Spark warns 'No Partition Defined for Window operation') — a
    100 TB scale-killer. Physical-plan signature: a Window node whose
    child exchange is `Exchange SinglePartition`. Global scalar aggregates
    also use SinglePartition exchanges, so only flag ones feeding Window."""
    for name, plan in registry_plans.items():
        lines = plan.splitlines()
        for i, line in enumerate(lines):
            if "Window " not in line:
                continue
            for follow in lines[i + 1 : i + 4]:
                assert "Exchange SinglePartition" not in follow, (
                    f"{name} plans a partition-less window:\n{line}\n{follow}"
                )


def test_bounded_batch_is_take_ordered(spark):
    """O1 must plan as TakeOrderedAndProject (per-partition heaps), not a
    global sort followed by a limit."""
    plan = _plan(spark, "cdc_bounded_batch")
    assert "TakeOrderedAndProject" in plan


@pytest.mark.parametrize("name", ["dd_exact", "evt_tumbling_hourly"])
def test_aggregates_are_partial(spark, name):
    """Shuffled aggregations must map-side combine (partial_ functions
    before the exchange)."""
    plan = _plan(spark, name)
    assert "partial_" in plan


def test_bigram_topk_is_take_ordered_with_partial_agg(spark):
    """Vocabulary top-k must plan as partial-agg → exchange → heap top-k,
    never a global sort of the whole vocabulary."""
    plan = _plan(spark, "txt_bigram_topk")
    assert "TakeOrderedAndProject" in plan
    assert "partial_" in plan
    assert plan.count("Exchange") <= 1, "one count shuffle only"


def test_bm25_plan_single_normalization(spark):
    """The normalization regex is the BM25 scan's dominant cost at
    corpus scale, so each document branch must evaluate it ONCE: the
    Project that materializes `w` must not also compute dl from a
    second split (VERDICT r5 #6 — the two-step Project survives
    CollapseProject because `w` is non-cheap and referenced twice).
    The census branch, where `w` itself is pruned away, legitimately
    computes size(split(...)) directly — that is still one evaluation."""
    import re

    plan = _plan(spark, "txt_bm25_search")
    for line in plan.splitlines():
        if " AS w#" in line:
            assert "size(split" not in line, f"double normalization: {line}"
    assert re.search(r"size\(w#\d+", plan), "dl must derive from the w column"


def test_quantize_is_scan_side_only(spark):
    """int8 quantization is pure per-row column algebra: the only
    exchange allowed is the final output ordering's range partition."""
    plan = _plan(spark, "sim_embedding_quantize")
    assert "rangepartitioning" in plan.lower()
    assert plan.count("Exchange") == 1
    assert "Join" not in plan and "Generate" not in plan


def test_centroid_assign_never_explodes_the_corpus(spark):
    """Nearest-centroid assignment must derive centroids from per-dim
    aggregate columns, not a posexplode: a Generate node here would mean
    the shuffle carries |corpus|×dim rows instead of |labels|."""
    plan = _plan(spark, "sim_centroid_assign")
    assert "Generate" not in plan
    assert "BroadcastExchange" in plan, "centroid side must broadcast"


def test_partition_pruning_on_partitioned_changelog(spark, tmp_path):
    """A change log laid out as version-range partitions gets partition
    pruning for version predicates — the layout SURVEY.md prescribes for
    the log at scale (scan touches only matching directories)."""
    from pyspark.sql import functions as F

    from sql_cdc_spark import tables as T

    ev = T.load(spark, SF_DIR, "events").select(
        F.col("event_id").alias("change_version"),
        F.col("user_id").alias("key_id"),
        (F.col("event_id") % 4).cast("int").alias("version_bucket"),
    )
    log = str(tmp_path / "partitioned_log")
    ev.write.partitionBy("version_bucket").parquet(log)
    df = spark.read.parquet(log).filter(F.col("version_bucket") == 2)
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    assert "PartitionFilters: [" in plan
    pf = plan.split("PartitionFilters: [", 1)[1].split("]", 1)[0]
    assert "version_bucket" in pf
    # pruned scan reads one bucket only
    assert df.select("version_bucket").distinct().count() == 1


def test_bucketed_join_has_no_shuffle(spark, tmp_path):
    """Bucketing both sides on the join key removes the exchange: the
    sort-merge join reads co-located buckets directly — the 100 TB answer
    for repeated large-fact joins (SURVEY.md §7 Phase 4)."""
    from pyspark.sql import functions as F

    from sql_cdc_spark import tables as T

    spark.sql(
        f"CREATE DATABASE IF NOT EXISTS bktdb LOCATION '{tmp_path / 'bktdb'}'"
    )
    try:
        orders = T.load(spark, SF_DIR, "orders").select("o_orderkey", "o_totalprice")
        li = T.load(spark, SF_DIR, "lineitem").select("l_orderkey", "l_quantity")
        (
            orders.write.bucketBy(8, "o_orderkey")
            .sortBy("o_orderkey")
            .mode("overwrite")
            .saveAsTable("bktdb.orders_b")
        )
        (
            li.withColumnRenamed("l_orderkey", "o_orderkey")
            .write.bucketBy(8, "o_orderkey")
            .sortBy("o_orderkey")
            .mode("overwrite")
            .saveAsTable("bktdb.lineitem_b")
        )
        joined = (
            spark.table("bktdb.orders_b")
            .hint("merge")  # force SMJ so the missing exchange is observable
            .join(spark.table("bktdb.lineitem_b"), "o_orderkey")
        )
        plan = joined._sc._jvm.PythonSQLUtils.explainString(
            joined._jdf.queryExecution(), "formatted"
        )
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, "bucketed join still shuffles"
        assert joined.count() > 0
    finally:
        spark.sql("DROP DATABASE IF EXISTS bktdb CASCADE")


def test_new_tpch_star_joins_are_broadcast(spark):
    """Q7/Q8 are dim-star shapes: every dimension side must broadcast —
    a SortMergeJoin appearing here means a dim stopped broadcasting and
    the plan would shuffle the fact table per dimension at scale."""
    for name, min_bhj in (
        ("tpch_q7_nation_volume", 4),
        ("tpch_q8_market_share", 6),
    ):
        plan = _plan(spark, name)
        phys = plan.split("== Physical Plan ==")[1]
        assert phys.count("BroadcastHashJoin") >= min_bhj, name
        assert "SortMergeJoin" not in phys, name


def test_q21_decorrelation_scans_fact_once(spark):
    """The classic Q21 EXISTS / NOT-EXISTS chain would self-join lineitem
    twice; the decorrelated grouped form must scan the fact table exactly
    once and keep the per-order window partitioned."""
    plan = _plan(spark, "tpch_q21_waiting_suppliers")
    phys = plan.split("== Physical Plan ==")[1]
    assert phys.count("lineitem.parquet") == 1, "fact table scanned more than once"
    assert "SortMergeJoin" not in phys


def test_completed_tpch_suite_plans(spark):
    """The seven round-4 TPC-H completions: dims broadcast (no
    SortMergeJoin anywhere — every non-fact side is dim- or
    aggregate-sized), and the scalar-subquery shapes (Q11 total, Q15
    max) scan the fact table exactly once because the shared aggregate
    is checkpoint-materialized rather than recomputed per branch."""
    for name, max_li_scans in (
        ("tpch_q1_pricing_summary", 1),
        ("tpch_q2_min_cost_supplier", 2),  # supply agg reused via exchange
        ("tpch_q9_product_type_profit", 1),
        ("tpch_q11_important_stock", 1),
        ("tpch_q15_top_supplier", 1),
        ("tpch_q16_supplier_part_counts", 1),
        ("tpch_q20_excess_suppliers", 1),
    ):
        plan = _plan(spark, name)
        phys = plan.split("== Physical Plan ==")[1]
        assert "SortMergeJoin" not in phys, name
        assert phys.count("lineitem.parquet") <= max_li_scans, (
            f"{name}: fact scanned more than {max_li_scans}×"
        )


def test_q1_is_single_pass_partial_agg(spark):
    """Q1 must be one scan → map-side partial agg → one exchange —
    the canonical scan-bound report plan."""
    plan = _plan(spark, "tpch_q1_pricing_summary")
    phys = plan.split("== Physical Plan ==")[1]
    assert "partial_" in phys
    assert phys.count("lineitem.parquet") == 1
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in phys


@pytest.mark.slow
def test_audit_registry_matches_guard_invariants(spark):
    """The public plan-audit API (sql_cdc_spark.plans) reports the same
    whole-registry invariants the guards above enforce: no row UDFs, no
    partition-less windows, Arrow only in the whitelisted queries."""
    from sql_cdc_spark.plans import audit_registry

    flags = audit_registry(spark, SF_DIR)
    assert len(flags) == len(entry.queries())
    assert not [n for n, f in flags.items() if f.row_python_udf]
    assert not [n for n, f in flags.items() if f.partitionless_window]
    assert not [
        n for n, f in flags.items() if f.arrow_python and n not in _PANDAS_OK
    ]
    # extraction sanity: the audit sees the same facts the raw-string
    # guards assert elsewhere
    assert flags["cdc_net_changes_enriched"].broadcast_joins >= 1
    assert flags["cdc_bounded_batch"].take_ordered
    assert flags["tpch_q21_waiting_suppliers"].scans_of("lineitem") == 1


def test_assert_scale_safe_catches_scale_killers(spark):
    """assert_scale_safe raises (with the reason named) on each known
    scale-killer and passes a healthy broadcast-join plan."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from sql_cdc_spark.plans import assert_scale_safe

    base = spark.range(100).select(F.col("id"), (F.col("id") % 5).alias("k"))

    global_win = base.select(
        F.row_number().over(Window.orderBy("id")).alias("rn")
    )
    with pytest.raises(AssertionError, match="PARTITION BY"):
        assert_scale_safe(global_win)

    from pyspark.sql.functions import udf

    with pytest.raises(AssertionError, match="row-at-a-time"):
        assert_scale_safe(base.select(udf(lambda x: x)("k").alias("v")))

    dim = spark.range(5).select(F.col("id").alias("k"), F.lit("d").alias("d"))
    good = base.join(F.broadcast(dim), "k")
    flags = assert_scale_safe(good)
    assert flags.broadcast_joins == 1 and flags.sort_merge_joins == 0


# measured at sf0.01 (this round) — a ceiling, not a target: any edit
# that adds an exchange to a headline plan must either beat the old
# shape or consciously raise its budget here with a why-comment
HEADLINE_EXCHANGE_BUDGETS = {
    "cdc_flagship_documents": 9,
    "cdc_net_changes_enriched": 2,
    "rel_pricing_summary": 1,
    "rel_header_line_view": 1,
    "rel_customer_order_stats": 2,
    "win_order_ranks": 1,
    "dd_exact": 1,
    "dd_near_dup_pairs": 24,  # grouped LSH pair generation (late-r4);
    # candidate path: cap-bounded inter, AQE keeps the broadcast size
    # joins (the shuffle-hash pin applies only to the unbounded blocking
    # paths — see dedup._attach_sizes)

    "sim_topk_cosine": 1,
    "txt_quality_score": 0,
    "evt_tumbling_hourly": 1,
    "mm_decode_features": 0,
    "tpch_q5_local_supplier_volume": 7,
    # round-4 additions (non-headline but budget-pinned):
    "cdc_scd2_history": 4,
    "cdc_snapshot_diff": 2,
    "crp_pps_sample": 1,
    "scl_bloom_pruned_join": 1,
    "dd_containment_pairs": 17,  # grouped pair generation + in-row sizes
    # (r9 rewrite: sizes attach to POSTINGS before pair generation, so
    # the pair table joins nothing — was 25 when the pair table ran two
    # pinned shuffle-hash size joins; measured 28.0→17.2 s at 10×)
    "crp_chunk_documents": 1,   # the presentation orderBy; scan is shuffle-free
    "crp_length_buckets": 2,
    "evt_sketch_setops": 29,    # fully-lazy register pipeline (A/B: faster
                                # than persist; shuffle map stages reused)
    "cdc_scd2_temporal_join": 9,
    "evt_gap_fill_locf": 4,
    "evt_join_size_estimate": 14,  # two sketch builds + exact verdict side
    "rel_unpivot_measures": 2,     # grouped agg + presentation sort; stack is scan-local
    "rel_dq_audit": 8,             # two fact passes (lineitem⟕orders,
                                   # orders⟕customer-keys) + final aggs
    "sim_random_projection": 1,    # presentation orderBy; projection is scan-local
    "evt_rate_anomaly": 3,         # hourly groupBy + per-type window + orderBy;
                                   # the window input is the aggregate, not events
    # round-6 registrations (budgets measured at sf0.01 in round 5 as
    # R6_QUEUED_EXCHANGE_BUDGETS; moved here when the four entered the
    # registry):
    # tf agg + df (distinct+count, re-derived: Spark shares no subtree
    # across join sides) + 2 tiny broadcasts + 1-row census + doc agg;
    # every exchange is post-IN-filter (≪ corpus) or a broadcast
    "txt_bm25_search": 7,
    "txt_bpe_pair_census": 1,  # ONE pair groupBy; top-k is TakeOrdered
    # both branches' exchanges + 2 broadcast self-join rank stages over
    # ≤L rows + rank aggs + the union-fusion aggregate + final top-k;
    # everything past the branches operates on 2·L rows (constants)
    "sim_hybrid_search": 18,
    # per tracked key the EXECUTED shape is: ONE corpus per-key shuffle
    # + cc agg (both inside the session-cached count-of-counts, computed
    # once) + cum self-join + broadcasts + 1-row census; the PRINTED
    # count is higher because explain renders the cached cc subtree's
    # exchanges once per InMemoryRelation scan (3 scans/key × 2
    # exchanges) — same counting artifact as the other persist users
    "scl_skew_census": 34,
    # round-6 landings (measured at sf0.01 on landing day):
    "scl_compaction_plan": 2,   # per-source window + (source,bin) agg
    "dd_dedup_impact": 3,       # digest window + source agg + orderBy
    # postings agg + df agg (tf subtree re-derived) + pinned
    # shuffle-hash join + per-doc rank window + presentation sort
    "txt_tfidf_topterms": 8,
    # probe/ref distincts + pinned shuffle-hash anti join + two
    # per-doc aggs + final join/sort
    "txt_ngram_novelty": 6,
    "sim_mutual_knn": 4,        # knn_join shape + ONE reciprocity agg
    "sim_kmeans_step": 2,       # scan-local assignment; K-group agg + sort
    # EXECUTED shape: the corpus-scale LM pipeline runs ONCE into the
    # session-cached |domains|-row aggregate; ref/weight branches read
    # the cache. PRINTED count renders the cached subtree per scan
    # (3 scans × ~11 exchanges) — same artifact as scl_skew_census
    "crp_domain_reweight": 35,
    # |panel| exact heaps + |panel| bucket filters + two tiny aggs;
    # every branch is a TakeOrdered scan, nothing corpus×corpus
    # r10 rewrite: ONE kernel scan for the whole probe panel + ONE
    # broadcast-joined ann scan + two tiny windows (was 12: 4 scan
    # branches per probe); measured 4 at sf0.01, 1.7 -> 0.8 s at sf0.1
    "sim_ann_recall_eval": 6,
    # truth (shingle-blocked exact pairs) + candidates (capped band
    # join) + pinned shuffle-hash pair meet + band agg; the persisted
    # shingle subtree renders per scan like the other persist users
    "dd_lsh_recall_eval": 22,  # re-pinned r10 (measured 21)
    "rel_grouping_sets": 2,     # ONE expand+agg pass + presentation sort
    # EXECUTED shape: ONE knn_join pass into the undirected-edge agg,
    # then degree agg + pinned shuffle-hash contribution join + inflow
    # agg + rank join + top-k; the PRINTED count re-renders the shared
    # knn/edge subtree per consumer (ReuseExchange dedupes at runtime)
    "sim_pagerank_step": 22,
    # EXECUTED: ONE corpus explode into the pair groupBy; marginals +
    # total derive from the vocab²-bounded pair table (printed count
    # re-renders that subtree per marginal consumer) + 2 pinned
    # shuffle-hash joins + broadcast total + TakeOrdered
    "txt_pmi_collocations": 10,
    # passage groupBy + pinned shuffle-hash instance⨝counts join +
    # |sources|-row rollup + presentation sort
    "txt_dup_passage_census": 4,
    # ONE block-key self-join (pinned shuffle-hash) + presentation sort
    "rel_fuzzy_match_block": 3,
    # scan-local dot (literal seed) + ONE |dims|-row per-dim aggregate
    "sim_power_iteration": 2,
    # round-7 registrations (measured at sf0.01 on landing day;
    # re-measured r8 when the knn subtree moved to the Arrow kernel):
    # EXECUTED shape: the knn pass materializes ONCE into the
    # session-cached ("knn_best", sf_dir) frame; the three unrolled
    # rounds are each one pinned shuffle-hash contribution join + one
    # inflow agg over the edge list. PRINTED count re-renders the
    # cached knn subtree once per reference (edge fold + 3 rounds × 2
    # sides) — the same counting artifact as scl_skew_census. r8: the
    # kernel knn subtree prints fewer exchanges than the salted pair
    # join did (66 → 52)
    "sim_pagerank_fixed3": 52,
    # the returned round-3 report: scan-local assignment under literal
    # round-2 centroids + ONE K-group agg + sort (the two update rounds
    # execute eagerly as bounded K-row collects at plan-build time)
    "sim_kmeans_fixed": 2,
    # ONE per-bucket Arrow-kernel pass (the max-mate fold happens
    # IN-KERNEL since r8) → 1-row census (+ broadcast corpus count +
    # stack + presentation sort); 5 → 4 when the pair-side agg left
    # the plan
    "sim_semdedup_sweep": 4,
    # staged scan-local fingerprint selection (bound-attribute
    # projections — the inline form was the measured 350s quadratic);
    # ONE census groupBy + TakeOrdered
    "txt_winnow_fingerprints": 1,
    # scan-local md5 shard assignment; ONE 16-row census groupBy + sort
    "crp_global_shuffle": 4,
    # boundaries baked as literals at plan-build (bounded sample sort);
    # the returned census is scan-local assignment + ONE B-group agg +
    # broadcast 1-row total + sort
    "scl_range_partition_plan": 4,
    # ONE per-user window shuffle + 5-group census + broadcast total
    "evt_out_of_order_census": 9,
    # ONE bucket shuffle into the grouped-map kernel + presentation sort
    "sim_knn_join_arrow": 2,
    # round-8 landing: winnow postings df agg + cap semi-join + the
    # pinned shuffle-hash pair self-join + pair agg + two per-doc-count
    # joins (also pinned — every side scales with the corpus) +
    # TakeOrdered
    "txt_winnow_pairs": 9,
}


def test_headline_exchange_budgets(spark):
    """Shuffle-count regression gate: every exchange in a 100 TB plan is
    a full-data network pass, so the bench headline queries carry an
    explicit exchange budget. A creeping extra shuffle (lost broadcast,
    un-fused aggregation, accidental repartition) fails here long before
    it shows up as a bench regression."""
    import __spark_entry__ as entry

    from sql_cdc_spark.plans import plan_flags

    qs = entry.queries()
    over = {}
    for name, budget in HEADLINE_EXCHANGE_BUDGETS.items():
        # budgets are measured on a COLD cache (the bench condition): a
        # query persisted by an earlier test substitutes InMemoryRelation
        # into this plan, and explain prints the cached child plan — with
        # all its exchanges — once per reuse point, inflating the count
        # (dd_near_dup_pairs: 32 cold → 77 with its shingle pass cached)
        spark.catalog.clearCache()
        got = plan_flags(qs[name](spark, SF_DIR)).exchanges
        if got > budget:
            over[name] = (got, budget)
    assert not over, f"exchange budget exceeded (got, budget): {over}"


def test_containment_pair_table_never_joins(spark):
    """r9 in-row-sizes done-criterion: the containment family's pair
    table (id_a, id_b, …) must JOIN NOTHING — sizes ride the postings
    through pair generation as (id, n) structs. The pre-r9 shape ran two
    pinned shuffle-hash joins of the corpus-scale pair table against the
    sizes table (the family's measured cost center, ~21 s of a 32.2 s
    10× pipeline; rewrite A/B: 28.0 → 17.2 s, bit-identical pairs). Any
    regression re-introducing a join keyed on id_a/id_b fails here."""
    import re

    for name in ("dd_containment_pairs", "dd_containment_sweep"):
        spark.catalog.clearCache()
        phys = _plan(spark, name).split("== Physical Plan ==")[-1]
        pair_joins = [
            line.strip()
            for line in phys.splitlines()
            if "Join" in line and re.search(r"\[id_[ab]#", line)
        ]
        assert not pair_joins, (
            f"{name}: pair table participates in a join — the in-row "
            f"sizes plan joins only postings⨝sizes on doc_id: {pair_joins}"
        )
        # the one shuffled join left is postings⨝sizes on the doc id
        shj = [
            line.strip()
            for line in phys.splitlines()
            if "ShuffledHashJoin" in line
        ]
        assert all("doc_id" in line for line in shj), shj


def test_aqe_splits_skewed_join(spark):
    """The session claims AQE skew-join handling (session.py) — prove it
    engages: a join with one massively hot key, forced to sort-merge and
    with the skew thresholds lowered to test scale, must show skew
    handling in the ADAPTIVE executed plan. Conf is restored in finally
    (a leaked threshold would silently re-plan every later test)."""
    from pyspark.sql import functions as F

    keys = ("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
            "spark.sql.autoBroadcastJoinThreshold")
    saved = {k: spark.conf.get(k, None) for k in keys}
    try:
        spark.conf.set(keys[0], "16KB")
        spark.conf.set(keys[1], "8KB")
        spark.conf.set(keys[2], "2")
        spark.conf.set(keys[3], "-1")  # no broadcast: force the SMJ path
        n = 200_000
        fact = spark.range(n).select(
            F.when(F.col("id") % 10 < 9, F.lit(7)).otherwise(F.col("id") % 1000)
            .alias("k"),
            F.concat(F.lit("payload_"), F.col("id").cast("string")).alias("pad"),
        )
        dim = spark.range(1000).select(
            F.col("id").alias("k"), F.col("id").alias("v")
        )
        j = fact.join(dim, "k")
        # AQE finalizes per QueryExecution: the assertion must read the
        # SAME execution that ran, so collect() on j itself (count()
        # would wrap it in a different plan and leave this one unrun)
        assert len(j.collect()) == n
        plan = j._sc._jvm.PythonSQLUtils.explainString(
            j._jdf.queryExecution(), "formatted"
        )
        assert "skew=true" in plan, (
            "AQE did not mark the hot-key join as skewed:\n"
            + plan[:2000]
        )
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


# late-r4 queries queued for the round-5 driver window — budgeted now so
# a plan regression is caught in the round they were BUILT, not the
# round they enter the window
R5_QUEUED_EXCHANGE_BUDGETS = {
    "dd_containment_sweep": 19,     # shared grouped base (in-row sizes,
                                    # r9: was 27) + sweep agg
    # r10: feeds the session-cached family shingle frame (was 28 with a
    # private scan per subtree); measured 19 at sf0.01
    "crp_fuzzy_contamination": 20,
    "rel_topn_other_rollup": 5,     # custkey agg + window + reused-part agg
    "evt_collapse_runs": 2,         # ONE user_id shuffle + final orderBy
    # r10: near side reads the cached family shingle frame (was 35);
    # measured 26 at sf0.01
    "dd_source_overlap": 27,
    "sim_knn_join": 3,              # bucket self-join + argmax agg + orderBy
    "evt_rolling_actives": 7,       # two distincts + two aggs + join + sort
    "evt_props_topk": 3,            # (type,k) agg + rank window + orderBy
    "txt_quality_gate": 3,          # histogram agg + lang window + final agg
    "crp_ngram_lm_score": 6,        # LM agg + fact join + doc agg + orderBy
    "crp_filter_funnel": 6,         # shingle census + doc join + 1-row agg
    # r10: ONE fused census groupBy (count + count_if) + ONE census
    # join (was 8: two census shuffles + raw-join + left tgt-join);
    # measured 5 at sf0.01
    "crp_dsir_select": 6,
    "sim_semantic_dedup": 2,        # r8: per-bucket Arrow kernel + sort
                                    # (was 3: bucket self-join + agg + sort)
}


def test_r5_queued_exchange_budgets(spark):
    """Same gate as test_headline_exchange_budgets for the queries
    implemented late in r4 whose registry entries land in round 5."""
    from sql_cdc_spark.plans import plan_flags
    from sql_cdc_spark.queries.corpus_q import (
        crp_dsir_select,
        crp_filter_funnel,
        crp_fuzzy_contamination,
        crp_ngram_lm_score,
    )
    from sql_cdc_spark.queries.dedup_q import (
        dd_containment_sweep,
        dd_source_overlap,
    )
    from sql_cdc_spark.queries.events_q import (
        evt_collapse_runs,
        evt_props_topk,
        evt_rolling_actives,
    )
    from sql_cdc_spark.queries.relational_q import rel_topn_other_rollup
    from sql_cdc_spark.queries.similarity_q import (
        sim_knn_join,
        sim_semantic_dedup,
    )
    from sql_cdc_spark.queries.text_q import txt_quality_gate

    fns = {
        "dd_containment_sweep": dd_containment_sweep,
        "crp_fuzzy_contamination": crp_fuzzy_contamination,
        "rel_topn_other_rollup": rel_topn_other_rollup,
        "evt_collapse_runs": evt_collapse_runs,
        "dd_source_overlap": dd_source_overlap,
        "sim_knn_join": sim_knn_join,
        "evt_rolling_actives": evt_rolling_actives,
        "evt_props_topk": evt_props_topk,
        "txt_quality_gate": txt_quality_gate,
        "crp_ngram_lm_score": crp_ngram_lm_score,
        "crp_filter_funnel": crp_filter_funnel,
        "crp_dsir_select": crp_dsir_select,
        "sim_semantic_dedup": sim_semantic_dedup,
    }
    from sql_cdc_spark.plans import assert_scale_safe

    over = {}
    for name, budget in R5_QUEUED_EXCHANGE_BUDGETS.items():
        spark.catalog.clearCache()
        df = fns[name](spark, SF_DIR)
        # the registry-wide structural guards (row UDFs, partition-less
        # windows) don't see unregistered queries — apply them here.
        # sort-merge joins allowed: the dedup shingle/pair self-joins are
        # genuinely fact-by-fact (same stance as the registered dd_ rows).
        # allow_arrow mirrors _PANDAS_OK: sim_semantic_dedup plans the
        # grouped-map kernel since r8
        flags = assert_scale_safe(
            df, max_sort_merge_joins=12, allow_arrow=name in _PANDAS_OK
        )
        if flags.exchanges > budget:
            over[name] = (flags.exchanges, budget)
    assert not over, f"exchange budget exceeded (got, budget): {over}"


def test_dynamic_partition_pruning_on_partitioned_fact(spark, tmp_path):
    """Dynamic partition pruning evidence: a date-partitioned fact joined
    to a SELECTIVE dim (filter on the dim, not the fact) must plan a
    dynamicpruning subquery on the fact scan — at 100 TB this is the
    difference between scanning 2 partitions and scanning 3 years. The
    result is checked against the statically-pruned equivalent."""
    from pyspark.sql import functions as F

    from sql_cdc_spark import tables

    ev = tables.load(spark, SF_DIR, "events").select(
        "event_id",
        "user_id",
        F.expr("unix_micros(ts) div 86400000000").alias("day"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    fact_dir = str(tmp_path / "events_by_day")
    ev.write.partitionBy("day").parquet(fact_dir)
    fact = spark.read.parquet(fact_dir)

    days = sorted(r.day for r in ev.select("day").distinct().collect())
    dim = spark.range(0, len(days)).select(
        (F.col("id") + F.lit(int(days[0]))).alias("day"),
        (F.col("id") % 2 == 0).alias("keep"),
    )
    joined = (
        fact.join(dim.filter("keep"), "day")
        .groupBy("day")
        .agg(F.sum("cents").alias("cents"), F.count(F.lit(1)).alias("n"))
    )
    plan = joined._sc._jvm.PythonSQLUtils.explainString(
        joined._jdf.queryExecution(), "formatted"
    )
    assert "dynamicpruning" in plan.lower(), (
        "no dynamic pruning subquery on the partitioned fact scan:\n"
        + plan[:2000]
    )

    kept_days = {d for i, d in enumerate(range(int(days[0]), int(days[0]) + len(days))) if i % 2 == 0}
    static = (
        fact.filter(F.col("day").isin([int(d) for d in kept_days]))
        .groupBy("day")
        .agg(F.sum("cents").alias("cents"), F.count(F.lit(1)).alias("n"))
    )
    got = sorted(tuple(r) for r in joined.collect())
    want = sorted(tuple(r) for r in static.collect())
    assert got == want and got


def test_manifest_survivor_anti_join_pins_shuffle_hash(spark):
    """r9 optimization: dup_clusters' star-contraction labels are
    lineage-cut (stats-less Scan ExistingRDD), so the planner's fallback
    for crp_manifest's corpus-scale survivor anti-join became a
    SortMergeJoin that sorts the FULL survivor table by doc_id for
    nothing (measured 0.741 s SMJ vs 0.665 s SHJ best-of-3 same-window
    at sf0.1). Broadcast is banned on this path (the dropped set scales
    with the corpus), so the pin must be shuffle-hash.
    dd_cluster_canonical's sized⨝best join deliberately keeps the SMJ
    fallback: its relations are cluster-population-sized and the same
    A/B measured the pin SLOWER there (see the code comment)."""
    plan = _plan(spark, "crp_manifest")
    anti_lines = [
        ln for ln in plan.splitlines() if "LeftAnti" in ln and "Join" in ln
    ]
    assert anti_lines, plan[:2000]
    assert any("ShuffledHashJoin" in ln for ln in anti_lines), anti_lines
    # scoped to the anti-join operators (ADVICE r9): an unrelated join
    # elsewhere in the manifest pipeline legitimately planning SMJ later
    # must not fail this guard for the wrong reason
    assert not any("SortMergeJoin" in ln for ln in anti_lines), anti_lines


def test_pair_table_never_broadcasts_in_size_attach(spark):
    """The 100x stress run caught AQE broadcasting the PAIR table in
    _attach_sizes once its compressed shuffle output dipped under the
    64 MB threshold — a ~1 GiB deserialized driver collect that aborts
    on maxResultSize. Every size attachment must plan as
    ShuffledHashJoin and the pair table (id_a/id_b) must never be a
    broadcast side. Shapes per family: jaccard still attaches sizes to
    the PAIR table (two pinned joins — the r10 in-row-sizes port was
    measured SLOWER and reverted, see jaccard_pairs' docstring);
    containment attaches sizes to the POSTINGS before pair generation
    (r9 in-row rewrite — one pinned doc_id join, the pair table joins
    nothing, see test_containment_pair_table_never_joins)."""
    import re

    from sql_cdc_spark import tables
    from sql_cdc_spark.functions import dedup as DD

    docs = tables.load(spark, SF_DIR, "documents").select("doc_id", "text")
    sh = DD.doc_shingles(docs)
    for df, min_shj in (
        (DD.containment_pairs(sh), 1),
        (DD.jaccard_pairs(sh, threshold=0.1), 2),
    ):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert plan.count("ShuffledHashJoin") >= min_shj, plan[:2000]
        pair_broadcasts = [
            line.strip()
            for line in plan.splitlines()
            if "Broadcast" in line and re.search(r"\[id_[ab]#", line)
        ]
        assert not pair_broadcasts, pair_broadcasts
