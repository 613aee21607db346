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
