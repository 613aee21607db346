"""Semantic properties of the LLM-data operators, beyond oracle equality:
planted duplicates are found, sketch invariants hold, ANN self-retrieves.
"""

import pytest
from pyspark.sql import functions as F

from sql_cdc_spark import tables
from sql_cdc_spark.functions import dedup as DD
from sql_cdc_spark.functions import similarity as SIM
from tests.conftest import SF_DIR_SMALL


@pytest.fixture(scope="module")
def docs(spark):
    return tables.load(spark, SF_DIR_SMALL, "documents")


def _with_planted_dups(docs, n=5, id_offset=1_000_000):
    """Append exact copies of the first n docs under new ids."""
    clones = (
        docs.orderBy("doc_id")
        .limit(n)
        .withColumn("doc_id", F.col("doc_id") + id_offset)
    )
    return docs.unionByName(clones), id_offset


def test_exact_dedup_finds_planted_copies(spark, docs):
    planted, off = _with_planted_dups(docs, n=5)
    dups = DD.exact_duplicates(planted).filter(F.col("n_copies") >= 2).collect()
    # each planted pair collapses to one digest with canonical = original id
    assert len([d for d in dups if d.canonical_id < off]) >= 5
    for d in dups:
        assert d.canonical_id < off


def test_identical_docs_have_identical_signatures(spark, docs):
    planted, off = _with_planted_dups(docs, n=3)
    sigs = DD.minhash_signatures(DD.doc_shingles(planted))
    rows = {r.doc_id: tuple(r[f"mh{i}"] for i in range(DD.MINHASH_K)) for r in sigs.collect()}
    for orig in list(rows):
        if orig + off in rows:
            assert rows[orig] == rows[orig + off]


def test_planted_dups_survive_full_near_dup_pipeline(spark, docs):
    planted, off = _with_planted_dups(docs, n=3)
    shingled = DD.doc_shingles(planted).persist()
    cands = DD.lsh_candidate_pairs(DD.minhash_signatures(shingled))
    pairs = DD.jaccard_pairs(shingled, cands, threshold=0.99).collect()
    found = {(p.id_a, p.id_b) for p in pairs}
    for orig in range(3):
        matches = [p for p in found if p[1] == p[0] + off]
        assert matches, f"planted duplicate of doc {orig} not recovered"
    # jaccard of identical docs is exactly 1
    assert all(p.jaccard == 1.0 for p in pairs if p.id_b == p.id_a + off)


def test_simhash_identical_docs_zero_hamming(spark, docs):
    planted, off = _with_planted_dups(docs, n=3)
    pairs = DD.simhash_pairs(DD.simhash(planted), max_hamming=0).collect()
    planted_pairs = {(p.id_a, p.id_b) for p in pairs if p.id_b == p.id_a + off}
    assert len(planted_pairs) >= 3
    assert all(p.hamming == 0 for p in pairs if p.id_b == p.id_a + off)


def test_ann_self_retrieval_and_bucket_consistency(spark):
    emb = tables.load(spark, SF_DIR_SMALL, "embeddings")
    bucketed = emb.select(
        "vec_id", "embedding", SIM.lsh_bucket(F.col("embedding")).alias("bucket")
    )
    qb = bucketed.filter(F.col("vec_id") == 0).select("bucket").first().bucket
    in_bucket = {r.vec_id for r in bucketed.filter(F.col("bucket") == qb).collect()}

    from sql_cdc_spark.queries.similarity_q import sim_bucketed_topk

    got = sim_bucketed_topk(spark, SF_DIR_SMALL).collect()
    # the query vector retrieves itself first with cosine exactly 1
    assert got[0].vec_id == 0 and got[0].cos_sim == 1.0
    # every ANN result really lives in the query's bucket
    assert {r.vec_id for r in got} <= in_bucket
    # scores are sorted descending with the id tiebreak
    scores = [(r.cos_sim, -r.vec_id) for r in got]
    assert scores == sorted(scores, reverse=True)


def test_topk_cosine_bounds(spark):
    emb = tables.load(spark, SF_DIR_SMALL, "embeddings")
    query = emb.filter(F.col("vec_id") == 0).select("embedding")
    top = SIM.topk_cosine(emb, query, k=5).collect()
    assert len(top) == 5
    assert all(-1.0 <= r.cos_sim <= 1.0 for r in top)
    assert top[0].vec_id == 0 and top[0].cos_sim == 1.0


def test_ivf_topk_membership_and_self_retrieval(spark):
    emb = tables.load(spark, SF_DIR_SMALL, "embeddings")
    got = SIM.ivf_topk(emb, query_id=0, k=10, n_clusters=8).collect()
    assert got and got[0].vec_id == 0 and got[0].cos_sim == 1.0
    # single-probe: all results share the query's cluster
    assert len({r.cluster for r in got}) == 1
    # probing more clusters can only improve (or keep) the k-th score
    wide = SIM.ivf_topk(emb, query_id=0, k=10, n_clusters=8, n_probe=4).collect()
    assert wide[-1].cos_sim >= got[-1].cos_sim


def test_hll_sketch_accuracy_bound(spark):
    """approx_count_distinct at rsd=0.02 stays within 5% of the exact
    distinct count for every event type."""
    from sql_cdc_spark.queries.events_q import evt_user_cardinality_sketch

    approx = {
        r.event_type: r.approx_users
        for r in evt_user_cardinality_sketch(spark, SF_DIR_SMALL).collect()
    }
    ev = tables.load(spark, SF_DIR_SMALL, "events")
    exact = {
        r.event_type: r.n
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert approx.keys() == exact.keys()
    for t in exact:
        assert abs(approx[t] - exact[t]) <= max(1, 0.05 * exact[t]), (t, approx[t], exact[t])


def test_ann_recall_vs_brute_force(spark):
    """Recall@10 vs the exact baseline at sf0.01 (deterministic data, so
    exact values are stable). The synthetic embeddings are uniform random
    — near-zero cosine structure — so absolute recall is modest by
    construction; the load-bearing assertions are the orderings: wider
    probing never loses recall, and every variant beats the 1/N floor."""
    from tests.conftest import SF_DIR

    import __spark_entry__ as e

    qs = e.queries()
    truth = {r.vec_id for r in qs["sim_topk_cosine"](spark, SF_DIR).collect()}

    def recall(name):
        got = {r.vec_id for r in qs[name](spark, SF_DIR).collect()}
        return len(got & truth) / len(truth)

    r_single = recall("sim_bucketed_topk")
    r_multi = recall("sim_multiprobe_topk")
    assert r_multi >= r_single >= 0.1
    assert r_multi >= 0.3
