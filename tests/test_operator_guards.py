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


def test_registry_window_holds_all_round3_queries():
    """Driver contract: only the first 50 registry entries are
    hash-checked per round, so every query added or changed this round
    must sit inside that window — silently rotating one out would skip
    its verification the very round it changed."""
    from sql_cdc_spark.queries import _registry

    window = list(_registry())[:50]
    round3_new = [
        "fn_bson_roundtrip",
        "crp_train_test_split",
        "crp_stratified_sample",
        "crp_corpus_clean",
        "crp_repetition_filter",
        "crp_contamination",
        "crp_pack_sequences",
        "dd_dup_clusters",
        "cdc_replica_sync",
        "evt_asof_last_purchase",
        "evt_percentile_sketch",
        "sim_label_centroids",
        "dd_near_dup_pairs",   # hashed-shingle + band-cap changes
        "dd_lsh_candidate_pairs",
        "cdc_flagship_documents",
        "evt_funnel_conversion",
        "txt_bigram_topk",
        "sim_embedding_quantize",
        "sim_quantized_topk",
        "win_percent_rank",
        "mm_audio_features",
        "tpch_q6_forecast_revenue",
        "tpch_q4_late_order_priority",
        "tpch_q14_promo_revenue",
        "win_time_range_sum",
        "evt_retention_cohorts",
        "evt_type_transitions",
        "txt_pii_redact",
        "crp_source_mixture",
        "evt_interval_join_buckets",
        "tpch_q12_priority_by_status",
        "tpch_q19_discounted_revenue",
        "dd_cluster_canonical",
        "crp_mixture_sample",
        "txt_doc_frequency",
        "sim_centroid_assign",
        "crp_manifest",
        "evt_histogram",
        "sim_norm_stats",
    ]
    missing = [n for n in round3_new if n not in window]
    assert not missing, f"changed queries outside the driver window: {missing}"


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
