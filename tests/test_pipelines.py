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
from tests.conftest import SF_DIR, SF_DIR_SMALL


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


@pytest.mark.slow
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


def test_assign_shards_budget_and_determinism(spark):
    """Shard token totals honor the budget (every non-final shard ends
    within one max-doc of the budget boundary), assignment is identical
    across partitioning layouts, and shards are contiguous 0..K."""
    from sql_cdc_spark.functions import text as TX
    from sql_cdc_spark.pipelines.corpus import assign_shards

    docs = (
        tables.load(spark, SF_DIR_SMALL, "documents")
        .select("doc_id", "text")
        .withColumn("n_tokens", TX.token_count(F.col("text")))
    )
    budget = 500
    got = assign_shards(docs, budget)
    rows = got.select("doc_id", "n_tokens", "shard").collect()
    by_shard = {}
    for r in rows:
        by_shard.setdefault(r.shard, []).append(r)
    k = max(by_shard)
    # every doc here is far below the budget, so ids must be contiguous
    # (sparseness only arises from docs heavier than the budget — the
    # separate heavy-doc test below)
    assert set(by_shard) == set(range(k + 1))
    max_doc = max(r.n_tokens for r in rows)
    for s, members in by_shard.items():
        tot = sum(r.n_tokens for r in members)
        if s < k:
            # a shard closes when its running sum crosses the budget, so
            # it holds at least budget - (max_doc - 1) tokens and at most
            # budget + max_doc - 1 (the straddling doc stays in it)
            assert budget - max_doc < tot <= budget + max_doc, (s, tot)
    # layout independence: a different partitioning yields the same map
    again = assign_shards(docs.repartition(13), budget)
    assert sorted((r.doc_id, r.shard) for r in again.collect()) == sorted(
        (r.doc_id, r.shard) for r in rows
    )


def test_write_sharded_corpus_layout(spark, tmp_path):
    """The sharded writer produces one shard=N/ directory per shard and
    round-trips every document exactly once."""
    from sql_cdc_spark.functions import text as TX
    from sql_cdc_spark.pipelines.corpus import write_sharded_corpus

    docs = (
        tables.load(spark, SF_DIR_SMALL, "documents")
        .select("doc_id", "text")
        .withColumn("n_tokens", TX.token_count(F.col("text")))
    )
    out = str(tmp_path / "shards")
    n_shards = write_sharded_corpus(docs, out, tokens_per_shard=500)
    back = spark.read.parquet(out)
    assert back.count() == docs.count()
    assert back.select("doc_id").distinct().count() == docs.count()
    assert back.select("shard").distinct().count() == n_shards
    import os

    dirs = [d for d in os.listdir(out) if d.startswith("shard=")]
    assert len(dirs) == n_shards


def test_assign_shards_heavy_doc_null_weight_and_empty(spark, tmp_path):
    """Edge contract (self-review r4): a doc heavier than the budget
    yields SPARSE monotone shard ids (the skipped ids are its overflow);
    null weights count as 0 and still get a shard; an empty corpus
    writes cleanly and reports 0 shards."""
    from sql_cdc_spark.pipelines.corpus import assign_shards, write_sharded_corpus

    rows = [(1, 1200), (2, 100), (3, None), (4, 100)]
    docs = spark.createDataFrame(rows, "doc_id long, n_tokens int")
    got = {r.doc_id: r.shard for r in assign_shards(docs, 500).collect()}
    assert None not in got.values(), "null weight must not produce shard NULL"
    assert len(got) == 4
    # the 1200-token doc spans >2 budgets: the id right after it is skipped
    shards = sorted(set(got.values()))
    assert shards[0] == 0 and shards == sorted(shards)
    totals = {}
    weights = dict(rows)
    for d, s in got.items():
        totals[s] = totals.get(s, 0) + (weights[d] or 0)
    assert any(t > 500 for t in totals.values())  # the heavy doc's shard

    empty = docs.filter("doc_id < 0")
    out = str(tmp_path / "empty_shards")
    assert write_sharded_corpus(empty, out, tokens_per_shard=500) == 0


def test_fuzzy_contamination_matches_oracle(spark, oracle):
    """Oracle-parity gate for crp_fuzzy_contamination ahead of its
    round-5 driver-window entry — the driver comparison at sf0.01."""
    from sql_cdc_spark.queries.corpus_q import (
        _fuzzy_contamination_sql,
        crp_fuzzy_contamination,
    )
    from tests.conftest import assert_matches_oracle

    df = crp_fuzzy_contamination(spark, SF_DIR)
    assert_matches_oracle(df, oracle, _fuzzy_contamination_sql())
    # de-trivialized: the sf0.01 corpus genuinely leaks (verified rows
    # exist), so the gate is not vacuously green on an empty result
    assert df.count() >= 1


def test_fuzzy_contamination_catches_planted_leaks(spark):
    """Plant exact copies of train docs under ids that hash into the
    test split; every planted (test, train) pair must surface with
    jaccard 1.0. Also: pairs never orient test->test or train->train."""
    import hashlib

    from sql_cdc_spark.functions.sampling import _HASH_SPAN
    from sql_cdc_spark.queries.corpus_q import (
        TEST_FRAC,
        VAL_FRAC,
        fuzzy_contamination_pairs,
    )

    def unit(i):
        h = hashlib.md5(("split" + str(i)).encode()).hexdigest()[:15]
        return int(h, 16) / _HASH_SPAN

    docs = tables.load(spark, SF_DIR_SMALL, "documents").select(
        "doc_id", "text"
    )
    train_ids = [
        i for (i,) in docs.select("doc_id").orderBy("doc_id").limit(200).collect()
        if unit(i) >= TEST_FRAC + VAL_FRAC
    ][:5]
    # synthetic ids that land in the test split under the same hash
    test_ids, probe = [], 9_000_000
    while len(test_ids) < len(train_ids):
        if unit(probe) < TEST_FRAC:
            test_ids.append(probe)
        probe += 1
    src = docs.filter(F.col("doc_id").isin(train_ids))
    id_map = dict(zip(train_ids, test_ids))
    mapping = F.create_map(
        *[F.lit(x) for pair in id_map.items() for x in pair]
    )
    clones = src.select(
        mapping[F.col("doc_id")].alias("doc_id"), "text"
    )
    got = {
        (r.test_doc_id, r.train_doc_id): r.jaccard
        for r in fuzzy_contamination_pairs(docs.unionByName(clones)).collect()
    }
    for t_id, s_id in id_map.items():
        assert got.get((s_id, t_id)) == 1.0, (s_id, t_id, got)
    for test_id, train_id in got:
        assert unit(test_id) < TEST_FRAC
        assert unit(train_id) >= TEST_FRAC + VAL_FRAC


def _manifest_rows(df):
    return {tuple(r) for r in df.collect()}


@pytest.mark.slow
def test_manifest_maintenance_equals_full_rebuild(spark):
    """apply_manifest_changes == build_manifest_state over the post-change
    corpus, manifest AND near-dup pair set, through the non-local
    exact-dedup effects: canonical deletion resurfaces the next copy,
    a smaller-id copy displaces the current canonical, a gate-failing
    update acts as a delete, and a text update re-enters near-dup."""
    from sql_cdc_spark.pipelines.corpus import prepare_training_corpus
    from sql_cdc_spark.streaming import manifest_maintenance as MM

    base_docs = (
        tables.load(spark, SF_DIR_SMALL, "documents")
        .select("doc_id", "lang", "source", "text")
        .orderBy("doc_id")
        .limit(150)
    )
    # engineered targets must sit in the initial manifest (pass gates and
    # survive dedup) or the planted effects are vacuous
    ids = sorted(
        r.doc_id
        for r in MM.manifest_from_state(MM.build_manifest_state(base_docs))
        .select("doc_id")
        .collect()
    )
    c_id = ids[10]
    # plant an exact duplicate of doc C so deleting C can resurface it
    planted = base_docs.filter(F.col("doc_id") == c_id).select(
        (F.col("doc_id") + 500_000).alias("doc_id"), "lang", "source", "text"
    )
    base = base_docs.unionByName(planted)
    st = MM.build_manifest_state(base)

    # the batch:
    # 1. delete C -> its planted copy must resurface into near-dup corpus
    deletes = spark.createDataFrame([(c_id,)], "doc_id long")
    # 2. exact copy of doc D under a SMALLER id -> displaces D
    d_id = ids[20]
    displacer = base_docs.filter(F.col("doc_id") == d_id).select(
        F.lit(-1).cast("long").alias("doc_id"), "lang", "source", "text"
    )
    # 3. gate-failing update: doc E drops below min_tokens -> leaves
    e_id = ids[30]
    junk = base_docs.filter(F.col("doc_id") == e_id).select(
        "doc_id", "lang", "source", F.lit("too short").alias("text")
    )
    # 4. content update: doc F's digest changes, id survives
    f_id = ids[40]
    rev = base_docs.filter(F.col("doc_id") == f_id).select(
        "doc_id", "lang", "source",
        F.concat(F.col("text"), F.lit(" revised edition")).alias("text"),
    )
    # 5. near-dup clone of doc G under a new id — text lightly edited so
    # it has a NEW digest (slips past exact dedup) but jaccard ~1
    g_id = ids[50]
    clone = base_docs.filter(F.col("doc_id") == g_id).select(
        (F.col("doc_id") + 600_000).alias("doc_id"), "lang", "source",
        F.concat(F.col("text"), F.lit(" tail")).alias("text"),
    )
    upserts = displacer.unionByName(junk).unionByName(rev).unionByName(clone)

    got = MM.apply_manifest_changes(st, upserts, deletes)

    final_corpus = (
        base.filter(~F.col("doc_id").isin([c_id, e_id, f_id]))
        .unionByName(junk)
        .unionByName(rev)
        .unionByName(displacer)
        .unionByName(clone)
    )
    want = MM.build_manifest_state(final_corpus)

    got_pairs = {(r.id_a, r.id_b, r.jaccard) for r in got.nd.pairs.collect()}
    want_pairs = {(r.id_a, r.id_b, r.jaccard) for r in want.nd.pairs.collect()}
    assert got_pairs == want_pairs

    got_manifest = _manifest_rows(MM.manifest_from_state(got))
    assert got_manifest == _manifest_rows(MM.manifest_from_state(want))
    # and the derived manifest equals the BATCH pipeline's output exactly
    assert got_manifest == _manifest_rows(prepare_training_corpus(final_corpus))

    # spot-check the engineered effects in the final manifest
    by_id = {r[0] for r in got_manifest}
    assert c_id not in by_id and c_id + 500_000 in by_id  # resurfaced
    assert -1 in by_id and d_id not in by_id              # displaced
    assert e_id not in by_id                              # gate-failed
    assert f_id in by_id                                  # updated survivor
    # clone of G: a verified near-dup pair formed, and cluster removal
    # kept the smaller id
    assert (g_id, g_id + 600_000) in {(p[0], p[1]) for p in got_pairs}
    assert g_id in by_id and g_id + 600_000 not in by_id

    # idempotent replay: re-applying the same batch is a state no-op
    again = MM.apply_manifest_changes(got, upserts, deletes)
    assert _manifest_rows(MM.manifest_from_state(again)) == got_manifest


@pytest.mark.slow
def test_tokenizer_in_pipeline_end_to_end(spark):
    """Capstone composition for the tokenizer path: prepare the corpus
    (gates → dedup → split), train BPE on the TRAIN split only (the
    decontaminated-tokenizer discipline — test text never influences the
    merge table), encode EVERY surviving document with the learned table
    (shuffle-free), and pack the encoded sequences into fixed-token
    bins. Invariants: merges are non-trivial and train-derived; encoding
    never lengthens a sequence and strictly shortens at least one train
    doc; bins conserve the encoded token mass exactly."""
    from pyspark.sql.window import Window

    from sql_cdc_spark.functions.text import bpe_encode, bpe_train

    docs = tables.load(spark, SF_DIR_SMALL, "documents")
    manifest = prepare_training_corpus(docs).select("doc_id", "split")
    kept = docs.join(manifest, "doc_id")

    train_docs = kept.filter(F.col("split") == "train").select(
        "doc_id", "text"
    )
    merges, trained = bpe_train(train_docs, n_merges=4)
    assert merges, "train split learned no merges"

    enc = bpe_encode(kept.select("doc_id", "text"), merges).withColumn(
        "n_enc", F.size("t")
    )
    pre = kept.select(
        "doc_id",
        F.size(F.expr("regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\\\\s]+', 0)")).alias("n_pre"),
    )
    both = enc.join(pre, "doc_id").select("doc_id", "n_enc", "n_pre")
    rows = both.collect()
    assert rows and all(r.n_enc <= r.n_pre for r in rows)
    train_ids = {r.doc_id for r in train_docs.select("doc_id").collect()}
    assert any(r.n_enc < r.n_pre for r in rows if r.doc_id in train_ids)

    # the train-split encode equals the training loop's final sequences
    got_train = {
        r.doc_id: list(r.t)
        for r in enc.filter(F.col("doc_id").isin(train_ids)).collect()
    }
    want_train = {r.doc_id: list(r.t) for r in trained.collect()}
    assert got_train == want_train

    # pack the ENCODED token counts (the crp_pack_sequences shape)
    budget = 512
    w = (
        Window.partitionBy(F.lit(1))
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    binned = enc.select(
        "doc_id",
        "n_enc",
        ((F.sum("n_enc").over(w) - F.col("n_enc")) / budget)
        .cast("long")
        .alias("bin"),
    )
    bins = binned.groupBy("bin").agg(F.sum("n_enc").alias("bin_tokens"))
    assert bins.agg(F.sum("bin_tokens")).first()[0] == sum(
        r.n_enc for r in rows
    )
