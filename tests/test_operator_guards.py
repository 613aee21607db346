"""Contract guards on operators whose misuse silently corrupts results."""

import pytest
from pyspark.sql import functions as F

from sql_cdc_spark.operators.skew import salted_agg, salted_join


def test_salted_join_rejects_replication_breaking_how(spark):
    df = spark.range(10).select(F.col("id").alias("k"), F.lit(1).alias("v"))
    dim = spark.range(5).select(F.col("id").alias("k"), F.lit("d").alias("d"))
    for how in ("right", "full", "outer", "left_semi", "left_anti", "cross"):
        with pytest.raises(ValueError, match="salted_join supports"):
            salted_join(df, dim, "k", how=how)


def test_salted_join_matches_unsalted_inner_and_left(spark):
    fact = spark.range(100).select(
        (F.col("id") % 7).alias("k"), F.col("id").alias("v")
    )
    dim = spark.range(5).select(F.col("id").alias("k"), (F.col("id") * 10).alias("d"))
    for how in ("inner", "left"):
        got = salted_join(fact, dim, "k", n_salt=4, how=how)
        want = fact.join(dim, "k", how)
        assert got.count() == want.count()
        assert got.exceptAll(want).count() == 0 and want.exceptAll(got).count() == 0


def test_registry_window_holds_all_round4_queries():
    """Driver contract: only the first 50 registry entries are
    hash-checked per round, so every query added or changed this round
    must sit inside that window — silently rotating one out would skip
    its verification the very round it changed."""
    from sql_cdc_spark.queries import _registry

    window = list(_registry())[:50]
    round4_new = [
        "tpch_q12_priority_by_status",   # oracle HUGEINT→BIGINT cast fix
        "evt_histogram",                 # floor-division binning fix
        "dd_lsh_candidate_pairs",        # band-key fold overflow guard
        "tpch_q7_nation_volume",         # NEW: nation-pair volume
        "tpch_q8_market_share",          # NEW: two-level market share
        "tpch_q21_waiting_suppliers",    # NEW: decorrelated EXISTS chain
        "dd_incremental_near_dup",       # NEW: CDC-driven dedup maintenance
        "tpch_q13_customer_distribution",  # NEW: outer-join count dist
        "tpch_q17_small_quantity_revenue", # NEW: decorrelated avg subquery
        "tpch_q22_global_sales_opportunity",  # NEW: scalar subq + anti join
        "tpch_q1_pricing_summary",       # NEW: full 8-agg pricing report
        "tpch_q2_min_cost_supplier",     # NEW: correlated-MIN subquery
        "tpch_q9_product_type_profit",   # NEW: profit by nation/year
        "tpch_q11_important_stock",      # NEW: scalar-threshold HAVING
        "tpch_q15_top_supplier",         # NEW: scalar-MAX view query
        "tpch_q16_supplier_part_counts", # NEW: count-distinct + NOT IN
        "tpch_q20_excess_suppliers",     # NEW: nested-IN semi join
        "cdc_replica_as_of",             # NEW: point-in-time reconstruction
        "cdc_incremental_join_view",     # NEW: delta join-view maintenance
        "dd_duplicate_spans",            # NEW: cross-doc substring census
        "sim_pq_topk",                   # NEW: product-quantization ANN
        "evt_heavy_hitters_cms",         # NEW: count-min heavy hitters
        "scl_zorder_key",                # NEW: Z-order layout key
    ]
    missing = [n for n in round4_new if n not in window]
    assert not missing, f"changed queries outside the driver window: {missing}"
    # rotation-debt payoff (VERDICT r3 #2): the r1-green singles demoted
    # for two rounds must be back inside the window this round. Four of
    # them (rel_sample_avg, rel_distinct_flags, fn_date_arithmetic,
    # fn_timestamp_format, fn_hash_bucket) ceded their slots to the five
    # late-r4 operators under the verdict's published two-round overflow
    # option —
    # they re-enter FIRST in round 5 (see queries/__init__.py demote
    # comment) and stay pytest-oracle-covered meanwhile.
    stale_r1 = [
        "rel_cross_join_small",
        "rel_derived_columns",
        "rel_filter_composite", "rel_union_all_segments",
        "win_lag_delta", "win_moving_avg", "win_running_total",
        "rel_multi_hop_dims", "rel_top_revenue_orders",
        "rel_semi_join_big_spenders", "rel_intersect_buyers",
        "rel_cube_status_flag", "win_latest_n_per_user",
        "tpch_q10_returned_items", "rel_customer_order_stats",
        "tpch_q18_large_orders", "rel_pivot_status",
        "rel_except_lost_customers", "rel_rollup_lineitem",
        "fn_invoice_numbering", "fn_json_extract", "win_order_ranks",
        "rel_pricing_summary", "rel_header_line_view",
        "tpch_q3_shipping_priority", "tpch_q5_local_supplier_volume",
    ]
    stale_missing = [n for n in stale_r1 if n not in window]
    assert not stale_missing, f"rotation debt unpaid: {stale_missing}"


def test_refresh_aggregate_groups_matches_full_recompute(spark):
    """Incremental rollup maintenance == full re-aggregation through a
    CDC round containing an update, a delete (incl. a fully-emptied
    group), an insert into an existing group, and a brand-new group."""
    from sql_cdc_spark.operators.cdc import refresh_aggregate_groups

    rows = [  # (invoice, customer, total)
        (1, 10, 100.0), (2, 10, 50.0), (3, 20, 70.0), (4, 30, 10.0),
    ]
    base = spark.createDataFrame(rows, "inv long, cust long, total double")
    exprs = [
        F.count(F.lit(1)).alias("n_inv"),
        F.sum(F.round(F.col("total") * 100).cast("long")).alias("cents"),
    ]
    view = base.groupBy("cust").agg(*exprs)

    # CDC round: inv2 price update, inv4 deleted (empties cust 30),
    # inv5 inserted for existing cust 20, inv6 opens new cust 40
    new_rows = [
        (1, 10, 100.0), (2, 10, 75.0), (3, 20, 70.0),
        (5, 20, 5.0), (6, 40, 9.0),
    ]
    new_base = spark.createDataFrame(new_rows, "inv long, cust long, total double")
    changed_invoices = {2, 4, 5, 6}
    # affected groups: the changed invoices' customers in old ∪ new state
    affected = (
        base.filter(F.col("inv").isin(changed_invoices))
        .select("cust")
        .union(
            new_base.filter(F.col("inv").isin(changed_invoices)).select("cust")
        )
    )
    got = refresh_aggregate_groups(view, new_base, affected, ["cust"], exprs)
    want = new_base.groupBy("cust").agg(*exprs)
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))
    # cust 30's group is gone, cust 40's appeared
    custs = {r.cust for r in got.collect()}
    assert 30 not in custs and 40 in custs


def test_refresh_join_view_matches_full_recompute(spark):
    """Incremental join-view maintenance == full re-join through a CDC
    round containing a left-side update, a right-side update, a delete
    that removes the key from one side (row must vanish from the view),
    and an insert that creates a brand-new join row."""
    from sql_cdc_spark.operators.cdc import refresh_join_view

    hdr = spark.createDataFrame(
        [(1, 10), (2, 20), (3, 30), (4, 40)], "k long, cust long"
    )
    agg = spark.createDataFrame(
        [(1, 2, 100), (2, 1, 50), (3, 3, 70), (4, 1, 10)],
        "k long, n long, cents long",
    )
    view = hdr.join(agg, "k")

    # CDC round: k=2 header update (cust 20→21), k=3 line-agg update,
    # k=4 lines all deleted (no agg row → view row vanishes), k=5 insert
    new_hdr = spark.createDataFrame(
        [(1, 10), (2, 21), (3, 30), (4, 40), (5, 50)], "k long, cust long"
    )
    new_agg = spark.createDataFrame(
        [(1, 2, 100), (2, 1, 50), (3, 4, 99), (5, 2, 7)],
        "k long, n long, cents long",
    )
    affected = spark.createDataFrame([(2,), (3,), (4,), (5,)], "k long")
    got = refresh_join_view(view, new_hdr, new_agg, affected, "k")
    want = new_hdr.join(new_agg, "k")
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))
    ks = {r.k for r in got.collect()}
    assert 4 not in ks and 5 in ks


def test_histogram_bins_are_true_lower_edges_for_negatives(spark):
    """ADVICE r3: c - (c % B) made bin_lo the UPPER edge for negative
    cents. The floor-division form (c - pmod(c, B)) must yield the true
    lower edge on both engines for the same inputs."""
    import duckdb

    from sql_cdc_spark.queries.events_q import HIST_BIN_CENTS as B

    cents = [-5000, -2501, -2500, -1, 0, 1, 2499, 2500, 5001]
    want = [(c // B) * B for c in cents]  # python // is floor division
    df = spark.createDataFrame([(c,) for c in cents], "c long")
    got = [
        r.b
        for r in df.select(
            (F.col("c") - F.pmod(F.col("c"), F.lit(B))).alias("b")
        ).collect()
    ]
    assert got == want
    # the DuckDB oracle twin expression agrees bit-for-bit
    con = duckdb.connect()
    oracle = [
        con.execute(
            f"SELECT CAST({c} AS BIGINT) - ((CAST({c} AS BIGINT) % {B} + {B}) % {B})"
        ).fetchone()[0]
        for c in cents
    ]
    assert oracle == want
