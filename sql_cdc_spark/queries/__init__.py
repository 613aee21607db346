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
    # Round-8 rotation (executes the plan published in r7; the r1-r7
    # narratives live in git history): the window below is explicit.
    # (1) SEVEN landing slots — txt_winnow_pairs is NEW (the winnowing
    # cross-doc overlap pair report, VERDICT r7 #7); six re-enter as
    # CHANGED: the knn/SemDeDup consumers moved onto the Arrow kernel
    # strategy (VERDICT r7 #1 — sim_pagerank_fixed3, sim_pagerank_step,
    # sim_mutual_knn now read the session-cached Arrow-built knn_best;
    # sim_semantic_dedup and sim_semdedup_sweep elect in-kernel), and
    # sim_knn_join_arrow re-enters because the kernel itself was
    # REWRITTEN (mate-axis tiling, BigDecimal.valueOf-parity rounding,
    # zero-norm sentinel — plan shape unchanged but the computation is
    # new code, so it gets re-checked; VERDICT r7 #2 / ADVICE r7).
    # That is one over the published ~4-6 cap: the extra slot buys the
    # driver's independent re-check of the rewritten kernel, judged
    # worth more than the 44th rotation row. (2) The five r3 strays —
    # the oldest evidence in the project (staleness 4) — head the
    # rotation exactly as published. (3) The remaining 38 slots pay the
    # 49-name r4 debt in the published order (31 non-tpch + tpch q1,
    # q2, q3, q5, q7, q8, q9).
    # Round-9 plan (published now, same discipline): the window opens
    # with anything added or changed in round 9, then the 11 r4 tpch
    # greens left unpaid here (q10-q13, q15-q18, q20-q22), then the
    # r5-checked greens oldest-first. 11 + landings leave ~35 slots for
    # the r5 cohort, so round 9 should land at most ~4-6 new/changed
    # queries again. One changed-family landing is already measured and
    # queued: the containment in-row-sizes rewrite (r8 pilot: postings
    # carry each doc's rare count BEFORE pair generation, so the pair
    # table never joins — 28.0 -> 17.2 s at 10x, bit-identical output;
    # SURVEY round-8 findings). It touches containment_base and its
    # consumers (dd_containment_pairs, dd_containment_sweep,
    # dd_incremental_containment + the maintenance twin), which then
    # claim the r9 changed-query slots.
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
    # The round-8 driver window, explicit and order-significant: the
    # driver hash-checks exactly these 50, top to bottom. Guarded by
    # tests/test_operator_guards.py::test_registry_window_holds_all_round8_queries.
    window = [
        # -- landed (new) this round ----------------------------------
        "txt_winnow_pairs",          # winnowing cross-doc overlap pairs
        # -- changed this round (Arrow kernel strategy, VERDICT r7 #1;
        #    kernel rewrite re-check, VERDICT r7 #2 / ADVICE r7) -------
        "sim_knn_join_arrow",
        "sim_pagerank_fixed3",
        "sim_pagerank_step",
        "sim_mutual_knn",
        "sim_semantic_dedup",
        "sim_semdedup_sweep",
        # -- rotation debt: the five r3 strays (staleness 4 — oldest) --
        "crp_pack_sequences",
        "crp_repetition_filter",
        "crp_source_mixture",
        "txt_pii_redact",
        "win_time_range_sum",
        # -- rotation debt: the r4 greens, published order -------------
        "cdc_scd2_history",
        "cdc_scd2_incremental",
        "cdc_scd2_temporal_join",
        "cdc_snapshot_diff",
        "cdc_replica_as_of",
        "cdc_incremental_join_view",
        "dd_incremental_near_dup",
        "dd_incremental_containment",
        "dd_duplicate_spans",
        "dd_lsh_candidate_pairs",
        "evt_gap_fill_locf",
        "evt_heavy_hitters_cms",
        "evt_histogram",
        "evt_join_size_estimate",
        "evt_rate_anomaly",
        "evt_sketch_setops",
        "scl_bloom_pruned_join",
        "scl_zorder_key",
        "sim_pq_topk",
        "sim_random_projection",
        "crp_chunk_documents",
        "crp_length_buckets",
        "crp_pps_sample",
        "fn_invoice_numbering",
        "fn_json_extract",
        "rel_customer_order_stats",
        "rel_dq_audit",
        "rel_header_line_view",
        "rel_pricing_summary",
        "rel_unpivot_measures",
        "win_order_ranks",
        "tpch_q1_pricing_summary",
        "tpch_q2_min_cost_supplier",
        "tpch_q3_shipping_priority",
        "tpch_q5_local_supplier_volume",
        "tpch_q7_nation_volume",
        "tpch_q8_market_share",
        "tpch_q9_product_type_profit",
        # (tpch q10-q13, q15-q18, q20-q22 — 11 r4 greens — head the
        #  published round-9 list above)
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
