"""The full training-corpus preparation flow, composed from the operator
library: quality/length gates → exact dedup → MinHash-LSH near-dup
cluster removal → deterministic train/val/test split.

Every stage is individually driver-gated as a query (queries/corpus_q.py,
queries/dedup_q.py); this module packages them in execution order with
one shared shingle/signature pass, the way a real corpus run composes
them. No reference analog (the reference has no corpus surface) — this is
the north-star extension suite acting as one product.

Scale shape (100 TB): gates are scan-local; exact dedup is one digest
groupBy; near-dup work is LSH-bucketed with the hot-band cap (never
all-pairs); the split is a pure key-hash expression. The only iterative
piece is connected components over the (tiny) verified near-dup pair
graph.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sql_cdc_spark.functions import dedup as DD
from sql_cdc_spark.functions import sampling as SP
from sql_cdc_spark.functions import text as TX


def prepare_training_corpus(
    docs: DataFrame,
    *,
    min_tokens: int = 5,
    min_quality: float = 0.5,
    near_dup_threshold: float = 0.5,
    lsh_max_bucket: int = 50,
    test_frac: float = 0.1,
    val_frac: float = 0.05,
) -> DataFrame:
    """Return the training manifest: one row per surviving document with
    its scores, content digest, dedup cluster, and split assignment.

    Stages, in order:
      1. length gate   — ≥ ``min_tokens`` whitespace tokens
      2. quality gate  — heuristic score ≥ ``min_quality``
      3. exact dedup   — one survivor (smallest doc_id) per content digest
      4. near-dup      — MinHash→LSH(cap)→Jaccard ≥ threshold pairs,
                         connected components, keep each cluster's
                         smallest doc_id
      5. split         — deterministic key-hash train/val/test

    Survival is a pure function of (text, doc_id), so the same manifest
    comes out on any engine, cluster size, or run."""
    scored = docs.select(
        "doc_id",
        "lang",
        "source",
        "text",
        TX.token_count(F.col("text")).alias("n_tokens"),
        TX.quality_score(F.col("text")).alias("quality"),
        TX.fingerprint(F.col("text")).alias("digest"),
    ).filter(
        (F.col("n_tokens") >= min_tokens) & (F.col("quality") >= min_quality)
    )
    # one map-side-combined shuffle, no join-back (which would recompute
    # the scan-side text metrics on the probe side)
    exact_kept = (
        scored.groupBy("digest")
        .agg(
            F.min_by(
                F.struct("doc_id", "lang", "source", "text", "n_tokens", "quality"),
                F.col("doc_id"),
            ).alias("r")
        )
        .select("r.*", "digest")
    )

    # near-dup clusters over the exact-dedup survivors; one shared
    # shingle explode + one signature aggregate feed every stage
    shingled = DD.doc_shingles(exact_kept).persist()
    sigs = DD.minhash_signatures(shingled, with_sizes=True).persist()
    cands = DD.lsh_candidate_pairs(
        sigs.drop("n_sh"), max_bucket_size=lsh_max_bucket
    )
    pairs = DD.jaccard_pairs(
        shingled,
        cands,
        threshold=near_dup_threshold,
        sizes=sigs.select("doc_id", "n_sh"),
    )
    clusters = DD.dup_clusters(pairs)
    # dup_clusters returns lineage-cut labels (localCheckpoint inside),
    # so nothing downstream references the shingle/signature caches —
    # release them HERE, not at session end: a long-lived session running
    # repeated manifests must not accumulate cached partitions
    shingled.unpersist()
    sigs.unpersist()
    dropped = clusters.filter(F.col("doc_id") != F.col("cluster_id")).select(
        "doc_id"
    )
    # pinned shuffle-hash: both sides scale with the corpus (dropped is
    # the duplicate population), so broadcast is banned by the unbounded
    # pair-path discipline, and the checkpoint-cut cluster labels carry
    # no stats — the planner's fallback is a sort-merge that sorts the
    # FULL survivor table by doc_id for nothing (r9 same-window A/B at
    # sf0.1, clean probes, values hash-identical: SMJ 0.741 s → SHJ
    # 0.665 s best-of-3)
    kept = exact_kept.join(
        dropped.hint("shuffle_hash"), "doc_id", "left_anti"
    ).drop("text")

    return SP.with_split(kept, "doc_id", test_frac, val_frac).select(
        "doc_id", "lang", "source", "n_tokens", "quality", "digest", "split"
    )


def assign_shards(
    docs: DataFrame,
    tokens_per_shard: int,
    id_col: str = "doc_id",
    weight_col: str = "n_tokens",
    n_buckets: int = 64,
    salt: str = "shard",
) -> DataFrame:
    """Token-budgeted shard assignment — the output-planning step of a
    corpus run: documents are laid end-to-end along a hash-defined total
    order and cut into ``tokens_per_shard``-token shards (shard = the
    bin the document STARTS in, the crp_pack_sequences rule at corpus
    granularity). Deterministic and layout-independent: the order is a
    pure function of ids, so the same shard map comes out on any
    cluster, any partitioning, any run.

    Scale: the global cumulative sum is two-phase — a per-bucket window
    (PARTITIONED by the hash bucket, never partition-less) plus bucket
    offsets from an ``n_buckets``-row grouped aggregate collected to the
    driver (the pps_systematic_sample pattern; the collect is bounded by
    the constant bucket count). Returns the input plus ``shard``.

    Contract notes: shard ids are monotone along the hash order but may
    be SPARSE — a document heavier than the budget fills more than one
    budget's worth, and the skipped ids are exactly that overflow (each
    emitted shard still lands within one max-doc of the boundary).
    Consumers list the shard partitions that exist rather than iterating
    0..K. Null weights count as 0 (the doc still gets a shard). All grid
    arithmetic is bigint (``div``), never double — exact at any corpus
    size."""
    from pyspark.sql.window import Window

    bucket = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string"))), 1, 15
            ),
            16,
            10,
        ).cast("long")
        % n_buckets
    )
    wgt = F.coalesce(F.col(weight_col).cast("long"), F.lit(0))
    bucketed = docs.withColumn("__b", bucket).withColumn("__w", wgt)
    bsums = {
        r["__b"]: r["w"]
        for r in bucketed.groupBy("__b").agg(F.sum("__w").alias("w")).collect()
    }
    offsets, acc = {}, 0
    for b in range(n_buckets):
        offsets[b] = acc
        acc += bsums.get(b, 0) or 0
    off_map = F.create_map(
        *[lit for b in range(n_buckets) for lit in (F.lit(b), F.lit(offsets[b]))]
    )
    w = (
        Window.partitionBy("__b")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum("__w").over(w) + off_map[F.col("__b")]
    return (
        bucketed.withColumn("__start", cum - F.col("__w"))
        .withColumn("shard", F.expr(f"__start div {int(tokens_per_shard)}"))
        .drop("__b", "__w", "__start")
    )


def write_sharded_corpus(
    docs: DataFrame,
    out_dir: str,
    tokens_per_shard: int,
    id_col: str = "doc_id",
    weight_col: str = "n_tokens",
) -> int:
    """Write the corpus as one directory partition per token-budgeted
    shard (``shard=N/``) — the layout a training job consumes shard-by-
    shard. Returns the shard count (0 for an empty corpus — the write
    still produces the empty output directory). The shuffle is one
    repartition on the shard id so each shard's files are written
    together; everything upstream is the deterministic assign_shards
    map. The count comes from the computed map, never a re-read of the
    output (the compact_documents double-scan lesson); the assigned
    frame is persisted across write+count so the input is scanned once
    for both, not re-planned from source for a count-only pass."""
    sharded = assign_shards(docs, tokens_per_shard, id_col, weight_col)
    sharded.persist()
    try:
        (
            sharded.repartition("shard")
            .write.mode("overwrite")
            .partitionBy("shard")
            .parquet(out_dir)
        )
        return sharded.select("shard").distinct().count()
    finally:
        sharded.unpersist()
