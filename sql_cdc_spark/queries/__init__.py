"""Named query registry — the driver contract surface.

Each domain module exports ``QUERIES: dict[str, QueryEntry]`` where a
QueryEntry pairs the Spark callable ``(spark, sf_dir) -> DataFrame`` with
its DuckDB oracle SQL (or None for non-SQL-expressible ops, which the
driver checks rows-only).

Column-name discipline: the driver's comparator sorts columns by name
before hashing, so every computed column is aliased identically in the
Spark plan and the oracle SQL.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import NamedTuple

from pyspark.sql import DataFrame, SparkSession


class QueryEntry(NamedTuple):
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None


def _registry() -> dict[str, QueryEntry]:
    # imports deferred so `import sql_cdc_spark.queries` stays cheap and a
    # syntax error in one domain module is easy to localize
    from . import (
        cdc_q,
        corpus_q,
        dedup_q,
        events_q,
        functions_q,
        multimodal_q,
        relational_q,
        scale_q,
        similarity_q,
        text_q,
        tpch_q,
        windows_q,
    )

    reg: dict[str, QueryEntry] = {}
    # Registry ORDER is part of the driver contract: the driver's
    # correctness harness checks the FIRST 50 entries only. Rotation
    # schedule (every round): (1) any query ADDED or CHANGED this round
    # MUST be in the window (tests/test_operator_guards.py enforces the
    # current round's list); (2) remaining slots go to the stalest greens
    # — the families whose last driver check is oldest; (3) demoted
    # long-greens stay covered every round by the local pytest oracle
    # suite, which runs ALL queries vs DuckDB at sf0.01.
    # Round-5 rotation (executes the plan published in r4; see git
    # history for the r1-r4 narratives): the window below is explicit.
    # (1) The thirteen late-r4 operators that deliberately deferred
    # their registry entries enter FIRST — they are ADDED this round and
    # the invariant "every query added or changed in round N is
    # driver-checked in round N" pins them in-window. (2)
    # dd_containment_pairs is CHANGED this round (the containment family
    # now shares one cached rare-domain intersection base per session —
    # VERDICT r4 #5), so it re-enters alongside its sweep twin. (3) The
    # twenty-two r1/r2-green singles that ceded r4 slots re-enter in the
    # published order, then txt_token_stats / mm_media_catalog /
    # scl_salted_pricing (bumped from r4 by the late tpch additions).
    # (4) The remaining slots take the head of the published r2-green
    # stale list; sim_multiprobe_topk (its tail) cedes its slot to the
    # dd_containment_pairs re-entry and HEADS the round-6 stale list.
    # Round-6 plan (published now, same discipline as r4's): FIRST the
    # four operators implemented in round 5 with registration deferred
    # — txt_bm25_search, txt_bpe_pair_census (oracles `_bm25_sql()` /
    # `_BPE_PAIR_SQL` in text_q), sim_hybrid_search (BM25+cosine RRF
    # fusion, `_hybrid_sql()` in similarity_q) and scl_skew_census
    # (join-key hotness report, `_skew_census_sql()` in scale_q);
    # budgets in
    # tests/test_plans.py::R6_QUEUED_EXCHANGE_BUDGETS; bench times them
    # in the round6_queued_queries detail block — then the stale list:
    # sim_multiprobe_topk, txt_bpe_tokens, txt_rolling_fingerprint,
    # txt_quality_score, txt_language_id, mm_decode_features,
    # mm_resize_digest, mm_frame_sample, scl_salted_join_segments,
    # scl_group_zscore, then the then-stale r3/r4 greens (the r4 tpch
    # completions and the SCD2/sketch/scale families).
    for mod in (
        relational_q,
        functions_q,
        windows_q,
        tpch_q,
        events_q,
        cdc_q,
        dedup_q,
        similarity_q,
        text_q,
        multimodal_q,
        scale_q,
        corpus_q,
    ):
        overlap = reg.keys() & mod.QUERIES.keys()
        if overlap:
            raise ValueError(f"duplicate query names: {overlap}")
        reg.update(mod.QUERIES)
    # The round-5 driver window, explicit and order-significant: the
    # driver hash-checks exactly these 50, top to bottom. Guarded by
    # tests/test_operator_guards.py::test_registry_window_holds_all_round5_queries.
    window = [
        # -- added this round (the 13 late-r4 operators) --------------
        "dd_containment_sweep",      # multi-threshold containment census
        "crp_fuzzy_contamination",   # eval-overlap via near-dup pairs
        "rel_topn_other_rollup",     # top-N + OTHER rollup report
        "evt_collapse_runs",         # gaps-and-islands run collapse
        "dd_source_overlap",         # source-pair duplication matrix
        "sim_knn_join",              # bucketed nearest-neighbor self-join
        "evt_rolling_actives",       # rolling distinct-active census
        "evt_props_topk",            # JSON property top-k (typed)
        "txt_quality_gate",          # multi-rule quality gate + reasons
        "crp_ngram_lm_score",        # trigram-LM perplexity proxy
        "crp_filter_funnel",         # pipeline-stage attrition census
        "crp_dsir_select",           # DSIR importance resampling
        "sim_semantic_dedup",        # SemDeDup bucket election
        # -- changed this round (shared containment base, VERDICT r4 #5)
        "dd_containment_pairs",
        # -- rotation debt: the 22 published r1/r2-green singles ------
        "rel_sample_avg",
        "rel_distinct_flags",
        "fn_date_arithmetic",
        "fn_timestamp_format",
        "fn_hash_bucket",
        "rel_cross_join_small",
        "rel_derived_columns",
        "rel_filter_composite",
        "rel_union_all_segments",
        "rel_multi_hop_dims",
        "win_lag_delta",
        "win_moving_avg",
        "win_running_total",
        "rel_rollup_lineitem",
        "rel_pivot_status",
        "rel_intersect_buyers",
        "rel_except_lost_customers",
        "rel_semi_join_big_spenders",
        "rel_top_revenue_orders",
        "rel_cube_status_flag",
        "win_latest_n_per_user",
        "cdc_flagship_changed_invoices",
        # -- bumped from the r4 window by the late tpch additions -----
        "txt_token_stats",
        "mm_media_catalog",
        "scl_salted_pricing",
        # -- head of the published r2-green stale list ----------------
        "cdc_keyset_resume",
        "cdc_latest_event_per_user",
        "cdc_union_distinct_keys",
        "cdc_bounded_batch",
        "cdc_version_watermark",
        "dd_jaccard_pairs",
        "dd_simhash",
        "dd_simhash_pairs",
        "dd_embedding_dup_pairs",
        "sim_lsh_buckets",
        "sim_bucketed_topk",
    ]
    assert len(window) == 50, f"window must fill all 50 slots: {len(window)}"
    missing = [n for n in window if n not in reg]
    assert not missing, f"window names absent from registry: {missing}"
    ordered = {n: reg[n] for n in window}
    for n, e in reg.items():
        if n not in ordered:
            ordered[n] = e
    return ordered


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: entry.fn for name, entry in _registry().items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: entry.oracle
        for name, entry in _registry().items()
        if entry.oracle is not None
    }
