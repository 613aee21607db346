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
    # Round-3 rotation: the rel_/fn_/win_/tpch_ modules (green in r1,
    # rotated OUT of the r2 window, stalest signal) come back first —
    # they also hold most of this round's edits (de-trivialized
    # predicates, two-phase ntile, the new view-rollup query, three new
    # TPC-H shapes, the time-RANGE frame). The r2-green dd_/sim_/txt_/
    # mm_/scl_ families rotate to the back.
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
    # Pull the queries CHANGED this round that live in back modules into
    # the window right after the four front modules (position 37+): every
    # touched query must be driver-checked the round it changes.
    priority = [
        "evt_tumbling_hourly",           # cents-exact sum
        "evt_session_windows",           # cents-exact sum
        "evt_daily_user_activity",       # cents-exact sum
        "evt_user_cardinality_sketch",   # new within_bound oracle
        "cdc_net_changes_enriched",      # cents-exact sum
        "cdc_flagship_documents",        # qty round-then-cast
        "sim_ivf_topk",                  # new recall_ok oracle
        "dd_lsh_candidate_pairs",        # hot-band cap
        "dd_near_dup_pairs",             # hot-band cap
        "crp_train_test_split",          # NEW: deterministic hash split
        "crp_stratified_sample",         # NEW: per-stratum hash sampling
        "crp_corpus_clean",              # NEW: composite clean step
        "crp_repetition_filter",         # NEW: Gopher-style repetition gate
        "crp_contamination",             # NEW: train/test n-gram overlap
        "dd_dup_clusters",               # NEW: connected-components dedup
        "cdc_replica_sync",              # NEW: delete-aware replica merge
        "evt_asof_last_purchase",        # NEW: as-of temporal join
        "evt_percentile_sketch",         # NEW: GK quantile sketch gate
        "crp_pack_sequences",            # NEW: token-budget packing
        "sim_label_centroids",           # NEW: per-label centroid vectors
        "evt_funnel_conversion",         # NEW: ordered funnel analysis
        "txt_bigram_topk",               # NEW: n-gram vocabulary top-k
        "sim_embedding_quantize",        # NEW: int8 quantization checksums
        "sim_quantized_topk",            # NEW: int8-domain ANN ranking
        "mm_audio_features",             # NEW: windowed audio features
        "evt_retention_cohorts",         # NEW: retention-cohort matrix
        "evt_type_transitions",          # NEW: Markov transition census
        "txt_pii_redact",                # NEW: PII scrub with salted matches
        "crp_source_mixture",            # NEW: tempered source mixture plan
        "evt_interval_join_buckets",     # NEW: bucket-equi interval join
        "dd_cluster_canonical",          # NEW: per-cluster canonical election
        "crp_mixture_sample",            # NEW: exact per-source quota draw
        "txt_doc_frequency",             # NEW: DF/IDF vocabulary top-k
        "sim_centroid_assign",           # NEW: int-exact nearest-centroid
        "crp_manifest",                  # NEW: composed corpus pipeline
        "evt_histogram",                 # NEW: integer-bin value histogram
        "sim_norm_stats",                # NEW: embedding-norm QA census
    ]
    # demoted to the back to keep the window ≤50: single-op long-greens
    # (r1-verified, untouched since) — they rotate back in next round
    demote = [
        "rel_sample_avg",
        "rel_cross_join_small",
        "rel_distinct_flags",
        "rel_derived_columns",
        "fn_date_arithmetic",
        "fn_timestamp_format",
        "fn_hash_bucket",
        # r1-green singles, untouched since — make room for the three
        # queries added late in round 3 (every touched query must be
        # inside the 50-entry driver window the round it changes)
        "rel_filter_composite",
        "rel_union_all_segments",
        "win_lag_delta",
        "win_moving_avg",
        "win_running_total",
        "rel_multi_hop_dims",
        # make room for the late-round-3 additions (3 tpch + 1 win enter
        # via their front modules; evt/txt enter via priority): each
        # demoted row is an r1-green single whose plan shape stays
        # represented in the window by a sibling (semi join → tpch_q4,
        # row_number → fn_invoice_numbering, set op → rel_except, star
        # join+top-k → tpch_q3, cube → rel_rollup_lineitem)
        "rel_top_revenue_orders",
        "rel_semi_join_big_spenders",
        "rel_intersect_buyers",
        "rel_cube_status_flag",
        "win_latest_n_per_user",
        "tpch_q10_returned_items",
        "rel_customer_order_stats",
        "tpch_q18_large_orders",
        "rel_pivot_status",
        # make room for the 5 late-round-3 additions (q12/q19 enter via
        # the tpch front module; dd_cluster_canonical / crp_mixture_sample
        # / txt_doc_frequency via priority). Each demoted row is an
        # r1/r2-green single with its plan shape still in-window:
        # set-difference → cdc_union_distinct via pytest + rel family next
        # round; rollup → rel_invoice_view_rollup; row_number generator →
        # win_percent_rank; JSON extract → fn_bson_roundtrip + flagship
        # JSON form; ranking window → win_ntile/percent_rank.
        "rel_except_lost_customers",
        "rel_rollup_lineitem",
        "fn_invoice_numbering",
        "fn_json_extract",
        "win_order_ranks",
        # r2-green single; its Q1-shape grouped agg stays bench-timed every
        # round (HEADLINE) and pytest-gated — demoted for sim_centroid_assign
        "rel_pricing_summary",
        # r1-green headline single; its join shape stays in-window via
        # rel_invoice_view_rollup — demoted for crp_manifest
        "rel_header_line_view",
        # r1-green headline singles (bench-timed every round); star-join
        # shapes stay in-window via tpch_q14/q19 — demoted for
        # evt_histogram + sim_norm_stats
        "tpch_q3_shipping_priority",
        "tpch_q5_local_supplier_volume",
    ]
    front = {n: reg[n] for m in (relational_q, functions_q, windows_q, tpch_q)
             for n in m.QUERIES if n not in demote}
    ordered = dict(front)
    for n in priority:
        # a priority name already emitted by a front module would keep its
        # old dict position and silently no-op the intended placement
        assert n not in ordered, f"priority query {n} already placed"
        ordered[n] = reg[n]
    assert len(ordered) <= 50, (
        f"rotation overflows the driver's 50-entry window: {len(ordered)}"
    )
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
