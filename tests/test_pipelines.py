"""Composition test for the end-to-end corpus-preparation pipeline: the
stages are individually oracle-gated as queries; here we pin the
COMPOSED behavior — survivors are a subset with the right invariants,
dedup actually removed the near-dup clusters the dedup queries find, and
the manifest is deterministic run-to-run."""

import pytest
from pyspark.sql import functions as F

from sql_cdc_spark import tables
from sql_cdc_spark.functions import dedup as DD
from sql_cdc_spark.pipelines.corpus import prepare_training_corpus
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def manifest(spark):
    docs = tables.load(spark, SF_DIR, "documents")
    return prepare_training_corpus(docs).collect()


def test_manifest_invariants(spark, manifest):
    docs = tables.load(spark, SF_DIR, "documents")
    all_ids = {r.doc_id for r in docs.select("doc_id").collect()}
    ids = [r.doc_id for r in manifest]
    assert len(ids) == len(set(ids)), "duplicate manifest rows"
    assert set(ids) <= all_ids
    assert 0 < len(ids) < len(all_ids), "gates and dedup must drop something"
    digests = [r.digest for r in manifest]
    assert len(digests) == len(set(digests)), "exact dup survived"
    assert {r.split for r in manifest} <= {"train", "val", "test"}
    assert all(r.n_tokens >= 5 and r.quality >= 0.5 for r in manifest)


def test_near_dup_clusters_collapsed(spark, manifest):
    """Every near-dup cluster the dedup operators find (at the same
    thresholds) keeps exactly its smallest surviving member."""
    docs = tables.load(spark, SF_DIR, "documents")
    kept = {r.doc_id for r in manifest}
    kept_docs = docs.filter(F.col("doc_id").isin(list(kept)))
    shingled = DD.doc_shingles(kept_docs)
    pairs = DD.jaccard_pairs(
        shingled,
        DD.lsh_candidate_pairs(
            DD.minhash_signatures(shingled), max_bucket_size=50
        ),
        threshold=0.5,
    )
    assert pairs.count() == 0, "near-dup pair survived the pipeline"


def test_manifest_is_deterministic(spark, manifest):
    docs = tables.load(spark, SF_DIR, "documents")
    again = prepare_training_corpus(docs).collect()
    assert sorted(map(tuple, again)) == sorted(map(tuple, manifest))


def test_prepare_corpus_releases_caches(spark):
    """VERDICT r3 #6: repeated manifest runs in a long-lived session must
    not accumulate cached partitions. The shingle/signature persists are
    unpersisted inside prepare_training_corpus, and dup_clusters frees
    every superseded label snapshot — per run, at most the final label
    snapshot (owned by the returned frame) may remain."""

    def persistent_ids():
        jmap = spark.sparkContext._jsc.getPersistentRDDs()
        return {int(k) for k in jmap.keySet().toArray()}

    docs = tables.load(spark, SF_DIR, "documents")
    before = persistent_ids()
    m1 = prepare_training_corpus(docs)
    n1 = m1.count()
    after1 = persistent_ids()
    assert len(after1 - before) <= 1, (
        f"first run leaked {len(after1 - before)} persisted RDDs"
    )
    m2 = prepare_training_corpus(docs)
    assert m2.count() == n1
    after2 = persistent_ids()
    assert len(after2 - before) <= 2, (
        f"two runs leaked {len(after2 - before)} persisted RDDs"
    )
