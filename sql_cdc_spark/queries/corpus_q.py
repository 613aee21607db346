"""Corpus-preparation queries: the end-to-end operations a training-data
pipeline runs over a raw document corpus — deterministic train/test
splitting, stratified subsampling, and the composite clean step
(quality gate + language agreement + exact dedup). North-star extensions
(SURVEY.md §7 Phase 3); no reference analog.

Everything is scan-local column algebra plus at most one groupBy (the
dedup), so the plans hold at 100 TB: the split and sample never shuffle,
and the clean step's only exchange is the digest groupBy with map-side
partial aggregation. Oracle SQL is generated from the SAME constants as
the Spark expressions so the two sides cannot drift.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sql_cdc_spark import tables
from sql_cdc_spark.functions import sampling as SP
from sql_cdc_spark.functions import text as TX
from sql_cdc_spark.queries import QueryEntry
from sql_cdc_spark.queries.text_q import _NORM_SQL, _QUALITY_EXPR_SQL

TEST_FRAC = 0.1
VAL_FRAC = 0.05
SAMPLE_FRACS = {"en": 0.5, "de": 0.25, "fr": 0.25, "es": 0.25, "zh": 0.1}
MIN_QUALITY = 0.5
MIN_TOKENS = 5


def crp_train_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic hash split: every doc keyed into train/val/test by
    md5(doc_id) — reproducible across runs, engines, and cluster sizes
    (functions/sampling.py). Emits the per-split census plus the exact
    boundary check the assignment must satisfy."""
    docs = tables.load(spark, sf_dir, "documents")
    split = SP.with_split(docs, "doc_id", TEST_FRAC, VAL_FRAC)
    return (
        split.groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("doc_id").alias("min_doc_id"),
            F.max("doc_id").alias("max_doc_id"),
        )
        .orderBy("split")
    )


def _split_census_sql() -> str:
    case = SP.split_sql("doc_id", TEST_FRAC, VAL_FRAC)
    return f"""
SELECT split, COUNT(*) AS n_docs,
       MIN(doc_id) AS min_doc_id, MAX(doc_id) AS max_doc_id
FROM (SELECT doc_id, {case} AS split FROM documents)
GROUP BY split ORDER BY split
"""


N_SHUFFLE_SHARDS = 16
SHUFFLE_SALT = "shuffle"


def crp_global_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic seeded global shuffle → training-shard census — the
    serving-order pass every epoch of LLM training needs: each document
    lands in shard hash60(doc_id) mod N, and its serving position
    within the shard is the (hash, doc_id) order, so the 'random' epoch
    order is a pure function of (salt, doc_id) — reproducible across
    runs, engines, and cluster sizes, and a different salt draws an
    independent permutation (the rand()-free property
    functions/sampling.py documents). Emits per shard the document
    count, character mass, and the hash range actually observed —
    the balance/determinism evidence a shard writer validates before
    the expensive write.

    Scale shape: shard assignment is SCAN-LOCAL (one md5 per row); the
    census is ONE map-side-combined groupBy into N_SHUFFLE_SHARDS rows.
    The production write this census plans is repartition(N) on
    shard_id + sortWithinPartitions(h, doc_id) — exactly one exchange
    for the whole epoch order; nothing here ever global-sorts the
    corpus."""
    docs = tables.load(spark, sf_dir, "documents")
    h = SP.hash60(F.col("doc_id"), SHUFFLE_SALT)
    sharded = docs.select(
        (h % N_SHUFFLE_SHARDS).alias("shard_id"), h.alias("h"), "n_chars"
    )
    return (
        sharded.groupBy("shard_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").cast("long").alias("sum_chars"),
            F.min("h").alias("min_h"),
            F.max("h").alias("max_h"),
        )
        .orderBy("shard_id")
    )


def _global_shuffle_sql() -> str:
    return f"""
WITH h AS (
  SELECT doc_id, n_chars,
         CAST(('0x' || substring(md5('{SHUFFLE_SALT}'
              || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) AS h
  FROM documents
)
SELECT h % {N_SHUFFLE_SHARDS} AS shard_id, COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
       MIN(h) AS min_h, MAX(h) AS max_h
FROM h GROUP BY 1 ORDER BY shard_id
"""


def crp_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language deterministic subsample (down-weight the dominant
    language, keep the tail): the exact same rows survive in Spark and
    the oracle because survival is a pure function of (lang, doc_id)."""
    docs = tables.load(spark, sf_dir, "documents")
    kept = SP.stratified_sample(docs, "lang", "doc_id", SAMPLE_FRACS)
    return kept.select("doc_id", "lang", "source")


def _stratified_sql() -> str:
    u = SP.unit_sql("doc_id", "sample")
    frac = "CASE " + " ".join(
        f"WHEN lang = '{v}' THEN {f}" for v, f in SAMPLE_FRACS.items()
    ) + " ELSE 0.0 END"
    return f"SELECT doc_id, lang, source FROM documents WHERE {u} < {frac}"


def crp_corpus_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composite clean step every pretraining corpus goes through:
    (1) length gate (≥ MIN_TOKENS tokens), (2) quality gate
    (heuristic score ≥ MIN_QUALITY, functions/text.py), (3) exact dedup
    on the normalized-text digest keeping the smallest doc_id. Emits the
    surviving docs with their scores — the input manifest of a training
    run. One shuffle total (the dedup groupBy, map-side combined via
    min_by); gates are scan-local, and the text metrics are computed
    exactly once — a canonical-set join-back would re-derive them on the
    probe side."""
    docs = tables.load(spark, sf_dir, "documents")
    scored = docs.select(
        "doc_id",
        "lang",
        TX.token_count(F.col("text")).alias("n_tokens"),
        TX.quality_score(F.col("text")).alias("quality"),
        TX.fingerprint(F.col("text")).alias("digest"),
    ).filter(
        (F.col("n_tokens") >= MIN_TOKENS) & (F.col("quality") >= MIN_QUALITY)
    )
    return (
        scored.groupBy("digest")
        .agg(
            F.min_by(
                F.struct("doc_id", "lang", "n_tokens", "quality"), F.col("doc_id")
            ).alias("r")
        )
        .select("r.doc_id", "r.lang", "r.n_tokens", "r.quality")
    )


def _corpus_clean_sql() -> str:
    return f"""
WITH scored AS (
  SELECT doc_id, lang,
         CAST(len(string_split_regex(trim(text), '\\s+')) AS INTEGER) AS n_tokens,
         {_QUALITY_EXPR_SQL} AS quality,
         md5({_NORM_SQL}) AS digest
  FROM documents
),
gated AS (
  SELECT * FROM scored WHERE n_tokens >= {MIN_TOKENS} AND quality >= {MIN_QUALITY}
),
canonical AS (
  SELECT digest, MIN(doc_id) AS doc_id FROM gated GROUP BY digest
)
SELECT g.doc_id, g.lang, g.n_tokens, g.quality
FROM gated g JOIN canonical c ON g.digest = c.digest AND g.doc_id = c.doc_id
"""


REPETITION_MAX_RATIO = 0.2


def crp_repetition_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition gate (the Gopher/MassiveText family of rules): the
    fraction of a document's 3-token shingles occupied by its single most
    frequent shingle. Boilerplate / template / degenerate-loop text spikes
    this ratio; natural prose stays low. Emits the ratio and the keep
    verdict. Shingle explode + one groupBy — same scale shape as dedup."""
    from sql_cdc_spark.functions import dedup as DD

    docs = tables.load(spark, sf_dir, "documents")
    sh = DD.balance_partitions(docs).select(
        "doc_id", F.explode(DD.shingles(F.col("text"))).alias("shingle")
    )
    per = sh.groupBy("doc_id", "shingle").agg(F.count(F.lit(1)).alias("cnt"))
    stats = per.groupBy("doc_id").agg(
        F.max("cnt").alias("max_cnt"), F.sum("cnt").alias("n_sh")
    )
    return stats.select(
        "doc_id",
        F.round(F.col("max_cnt") / F.col("n_sh"), 6).alias("top_shingle_ratio"),
        (F.col("max_cnt") / F.col("n_sh") <= REPETITION_MAX_RATIO).alias("keep"),
    )


def _repetition_sql() -> str:
    # non-distinct shingles: mirror functions/dedup.shingles (list incl.
    # duplicates), unlike the dedup _SHINGLES_CTE which dedups
    return f"""
WITH toks AS (
  SELECT doc_id, string_split_regex({_NORM_SQL}, '\\s+') AS t FROM documents
),
sh AS (
  SELECT doc_id,
    unnest(CASE WHEN len(t) >= 3
           THEN list_transform(range(1, len(t) - 1), i -> array_to_string(t[i:i+2], ' '))
           ELSE [array_to_string(t, ' ')] END) AS shingle
  FROM toks
),
per AS (SELECT doc_id, shingle, COUNT(*) AS cnt FROM sh GROUP BY 1, 2),
stats AS (SELECT doc_id, MAX(cnt) AS max_cnt, SUM(cnt) AS n_sh FROM per GROUP BY doc_id)
SELECT doc_id,
       ROUND(max_cnt * 1.0 / n_sh, 6) AS top_shingle_ratio,
       max_cnt * 1.0 / n_sh <= {REPETITION_MAX_RATIO} AS keep
FROM stats
"""


CONTAM_NGRAM = 8  # 8-gram overlap: the standard decontamination window —
                  # short shingles (3) mark every doc contaminated on any
                  # shared phrase; 8-token spans are quotation-level evidence


def crp_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/test contamination scan: for every test-split document,
    count distinct 8-token shingles it shares with ANY train document —
    the n-gram-overlap decontamination check every eval set needs before
    training. Shingles join on the 60-bit portable hash (ints, not
    strings); the train side aggregates to distinct shingle hashes first,
    so the join is |test shingles| ⨝ |distinct train shingles| — never
    doc×doc. Emits every test doc (LEFT join: zero-overlap docs too)."""
    from sql_cdc_spark.functions import dedup as DD

    docs = tables.load(spark, sf_dir, "documents")
    split = SP.with_split(docs, "doc_id", TEST_FRAC, VAL_FRAC)
    sh64 = F.conv(F.substring(F.md5("shingle"), 1, 15), 16, 10).cast("long")
    shingled = (
        DD.balance_partitions(split)
        .select(
            "doc_id",
            "split",
            F.explode(DD.shingles(F.col("text"), CONTAM_NGRAM)).alias("shingle"),
        )
        .select("doc_id", "split", sh64.alias("sh64"))
        .distinct()
    )
    train_sh = (
        shingled.filter(F.col("split") == "train").select("sh64").distinct()
    )
    test_sh = shingled.filter(F.col("split") == "test").select("doc_id", "sh64")
    hits = (
        test_sh.join(train_sh, "sh64", "inner")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    return (
        shingled.filter(F.col("split") == "test")
        .select("doc_id")
        .distinct()
        .join(hits, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("n_shared"), F.lit(0)).alias("n_shared"),
            (F.coalesce(F.col("n_shared"), F.lit(0)) > 0).alias("contaminated"),
        )
    )


def _contamination_sql() -> str:
    case = SP.split_sql("doc_id", TEST_FRAC, VAL_FRAC)
    k = CONTAM_NGRAM
    return f"""
WITH splat AS (
  SELECT doc_id, text, {case} AS split FROM documents
),
toks AS (
  SELECT doc_id, split, string_split_regex({_NORM_SQL}, '\\s+') AS t FROM splat
),
sh AS (
  SELECT DISTINCT doc_id, split,
    CAST(('0x' || substring(md5(
      unnest(CASE WHEN len(t) >= {k}
             THEN list_transform(range(1, len(t) - {k - 2}), i -> array_to_string(t[i:i+{k - 1}], ' '))
             ELSE [array_to_string(t, ' ')] END)
    ), 1, 15)) AS BIGINT) AS sh64
  FROM toks
),
train_sh AS (SELECT DISTINCT sh64 FROM sh WHERE split = 'train'),
test_sh AS (SELECT doc_id, sh64 FROM sh WHERE split = 'test'),
hits AS (
  SELECT t.doc_id, COUNT(*) AS n_shared
  FROM test_sh t JOIN train_sh tr ON t.sh64 = tr.sh64
  GROUP BY t.doc_id
)
SELECT d.doc_id,
       COALESCE(h.n_shared, 0) AS n_shared,
       COALESCE(h.n_shared, 0) > 0 AS contaminated
FROM (SELECT DISTINCT doc_id FROM test_sh) d
LEFT JOIN hits h ON d.doc_id = h.doc_id
"""


PACK_BUDGET = 2048  # tokens per packed training sequence


def crp_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy sequence packing: within each language shard, documents are
    laid end-to-end in doc_id order and cut into PACK_BUDGET-token bins —
    the packing pass that turns a cleaned corpus into fixed-length
    training sequences. bin = floor((cumulative_tokens - n_tokens) /
    budget), i.e. the bin the document STARTS in. The running sum is a
    window partitioned by lang (a shard never crosses executors at
    scale — no global ordering anywhere); emits per-bin occupancy."""
    from pyspark.sql.window import Window

    docs = tables.load(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", "lang", TX.token_count(F.col("text")).alias("n_tokens")
    )
    w = (
        Window.partitionBy("lang")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    binned = toks.select(
        "doc_id",
        "lang",
        "n_tokens",
        ((F.sum("n_tokens").over(w) - F.col("n_tokens")) / PACK_BUDGET)
        .cast("long")
        .alias("bin"),
    )
    return (
        binned.groupBy("lang", "bin")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("bin_tokens"),
            F.min("doc_id").alias("first_doc"),
        )
        .orderBy("lang", "bin")
    )


_PACK_SQL = f"""
WITH toks AS (
  SELECT doc_id, lang,
         CAST(len(string_split_regex(trim(text), '\\s+')) AS INTEGER) AS n_tokens
  FROM documents
),
binned AS (
  SELECT doc_id, lang, n_tokens,
         CAST(FLOOR((SUM(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
                     ROWS UNBOUNDED PRECEDING) - n_tokens) * 1.0 / {PACK_BUDGET}) AS BIGINT) AS bin
  FROM toks
)
SELECT lang, bin, COUNT(*) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS bin_tokens,
       MIN(doc_id) AS first_doc
FROM binned GROUP BY lang, bin ORDER BY lang, bin
"""


MIX_ALPHA = 0.7            # temperature exponent (UnifiedQA/Pile-style)
MIX_BUDGET = 100_000       # documents in the planned training mixture


def crp_source_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-reweighted source mixture plan: per-source document
    counts raised to MIX_ALPHA and renormalized — the standard move that
    up-samples small high-quality sources and damps the web crawl when
    composing a training mix. Emits each source's raw share, tempered
    weight, and document quota out of MIX_BUDGET. Plan: one count
    groupBy (map-side combined), then a broadcast cross join of the
    one-row normalizer — no window, no second scan. The per-source table
    is |sources| rows (handfuls even at 100 TB), so everything after the
    count is broadcast-sized."""
    docs = tables.load(spark, sf_dir, "documents")
    counts = docs.groupBy("source").agg(F.count(F.lit(1)).alias("n_docs"))
    totals = counts.agg(
        F.sum("n_docs").alias("__tot"),
        F.sum(F.pow(F.col("n_docs").cast("double"), F.lit(MIX_ALPHA))).alias(
            "__pow_tot"
        ),
    )
    tempered = F.pow(F.col("n_docs").cast("double"), F.lit(MIX_ALPHA))
    return (
        counts.crossJoin(F.broadcast(totals))
        .select(
            "source",
            "n_docs",
            F.round(F.col("n_docs") / F.col("__tot"), 6).alias("raw_share"),
            F.round(tempered / F.col("__pow_tot"), 6).alias("tempered_weight"),
            F.round(tempered / F.col("__pow_tot") * MIX_BUDGET)
            .cast("long")
            .alias("doc_quota"),
        )
        .orderBy("source")
    )


_MIXTURE_SQL = f"""
WITH counts AS (
  SELECT source, COUNT(*) AS n_docs FROM documents GROUP BY source
),
totals AS (
  SELECT SUM(n_docs) AS tot,
         SUM(POW(CAST(n_docs AS DOUBLE), {MIX_ALPHA})) AS pow_tot
  FROM counts
)
SELECT c.source, c.n_docs,
       ROUND(c.n_docs / t.tot, 6) AS raw_share,
       ROUND(POW(CAST(c.n_docs AS DOUBLE), {MIX_ALPHA}) / t.pow_tot, 6) AS tempered_weight,
       CAST(ROUND(POW(CAST(c.n_docs AS DOUBLE), {MIX_ALPHA}) / t.pow_tot * {MIX_BUDGET}, 0) AS BIGINT) AS doc_quota
FROM counts c CROSS JOIN totals t
ORDER BY c.source
"""


MIX_SAMPLE_BUDGET = 200    # documents actually drawn by the sampler
MIX_PREFILTER = 8.0        # oversample factor ahead of the exact rank


def crp_mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Execute the tempered mixture plan: draw each source's exact quota
    of documents, deterministically (the selection is a pure function of
    doc_id, reproducible on any engine or cluster size). Docs are ranked
    within their source by key-hash; the first ``quota`` win. Scale shape:
    the per-source window never sees the corpus — candidates are
    prefiltered to hash < PREFILTER·quota/n_docs first (both engines
    apply the same bound, so they stay exact twins), leaving ~PREFILTER×
    budget rows for the ranking, and quotas themselves are a broadcast
    |sources|-row table."""
    from pyspark.sql.window import Window

    docs = tables.load(spark, sf_dir, "documents")
    counts = docs.groupBy("source").agg(F.count(F.lit(1)).alias("n_docs"))
    totals = counts.agg(
        F.sum(F.pow(F.col("n_docs").cast("double"), F.lit(MIX_ALPHA))).alias(
            "__pow_tot"
        )
    )
    tempered = F.pow(F.col("n_docs").cast("double"), F.lit(MIX_ALPHA))
    quotas = counts.crossJoin(F.broadcast(totals)).select(
        "source",
        "n_docs",
        F.round(tempered / F.col("__pow_tot") * MIX_SAMPLE_BUDGET)
        .cast("long")
        .alias("quota"),
    )
    u = SP.hash_unit(F.col("doc_id"), "mix")
    cand = (
        docs.select("doc_id", "source", u.alias("u"))
        .join(F.broadcast(quotas), "source", "inner")
        .filter(F.col("u") < MIX_PREFILTER * F.col("quota") / F.col("n_docs"))
    )
    w = Window.partitionBy("source").orderBy("u", "doc_id")
    return (
        cand.select(
            "doc_id", "source", "quota", F.row_number().over(w).alias("rk")
        )
        .filter(F.col("rk") <= F.col("quota"))
        .select("doc_id", "source", "rk")
        .orderBy("source", "rk")
    )


def _mixture_sample_sql() -> str:
    u = SP.unit_sql("d.doc_id", "mix")
    return f"""
WITH counts AS (
  SELECT source, COUNT(*) AS n_docs FROM documents GROUP BY source
),
tot AS (
  SELECT SUM(POW(CAST(n_docs AS DOUBLE), {MIX_ALPHA})) AS pow_tot FROM counts
),
quotas AS (
  SELECT c.source, c.n_docs,
         CAST(ROUND(POW(CAST(c.n_docs AS DOUBLE), {MIX_ALPHA}) / t.pow_tot
                    * {MIX_SAMPLE_BUDGET}, 0) AS BIGINT) AS quota
  FROM counts c CROSS JOIN tot t
),
cand AS (
  SELECT d.doc_id, d.source, {u} AS u, q.quota
  FROM documents d JOIN quotas q ON d.source = q.source
  WHERE {u} < {MIX_PREFILTER} * q.quota / q.n_docs
),
ranked AS (
  SELECT doc_id, source, quota,
         ROW_NUMBER() OVER (PARTITION BY source ORDER BY u, doc_id) AS rk
  FROM cand
)
SELECT doc_id, source, CAST(rk AS INTEGER) AS rk
FROM ranked WHERE rk <= quota
ORDER BY source, rk
"""


def crp_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The COMPOSED corpus-preparation pipeline as one driver-gated query:
    quality/length gates → exact dedup → MinHash-LSH near-dup cluster
    removal → deterministic split (pipelines/corpus.py). The oracle
    re-derives the entire flow — including the recursive-CTE connected
    components over the gated subset — from the same constants, so the
    driver hash pins the end-to-end manifest, not just each stage."""
    from sql_cdc_spark.pipelines.corpus import prepare_training_corpus

    docs = tables.load(spark, sf_dir, "documents")
    return prepare_training_corpus(
        docs,
        min_tokens=MIN_TOKENS,
        min_quality=MIN_QUALITY,
        test_frac=TEST_FRAC,
        val_frac=VAL_FRAC,
    ).orderBy("doc_id")


def _manifest_sql() -> str:
    from sql_cdc_spark.queries.dedup_q import (
        _BANDED_CTE,
        _CANDIDATES_CTE,
        _JACCARD_CTE,
        _SIGS_CTE,
        CLUSTER_TAIL_CTE,
        shingles_cte,
    )

    split_case = SP.split_sql("k.doc_id", TEST_FRAC, VAL_FRAC)
    return f"""
WITH RECURSIVE
scored AS (
  SELECT doc_id, lang, source, text,
         CAST(len(string_split_regex(trim(text), '\\s+')) AS INTEGER) AS n_tokens,
         {_QUALITY_EXPR_SQL} AS quality,
         md5({_NORM_SQL}) AS digest
  FROM documents
),
gated AS (
  SELECT * FROM scored WHERE n_tokens >= {MIN_TOKENS} AND quality >= {MIN_QUALITY}
),
canonical AS (
  SELECT digest, MIN(doc_id) AS doc_id FROM gated GROUP BY digest
),
kept0 AS (
  SELECT g.doc_id, g.lang, g.source, g.text, g.n_tokens, g.quality, g.digest
  FROM gated g JOIN canonical c ON g.digest = c.digest AND g.doc_id = c.doc_id
),
{shingles_cte("kept0")}, {_SIGS_CTE}, {_BANDED_CTE}, {_CANDIDATES_CTE}, {_JACCARD_CTE},
{CLUSTER_TAIL_CTE},
dropped AS (SELECT doc_id FROM members WHERE doc_id <> cluster_id)
SELECT k.doc_id, k.lang, k.source, k.n_tokens, k.quality, k.digest,
       {split_case} AS split
FROM kept0 k
WHERE k.doc_id NOT IN (SELECT doc_id FROM dropped)
ORDER BY k.doc_id
"""


PPS_DRAWS = 40
PPS_BUCKETS = 64


def crp_pps_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted (probability-proportional-to-size) systematic sample of
    the corpus by character mass — draw ~PPS_DRAWS docs such that
    inclusion probability ∝ n_chars, so the SAMPLE's token mass mirrors
    the corpus (functions/sampling.py::pps_systematic_sample). Pure
    integer grid arithmetic over a hash-defined order: the exact same
    docs are drawn in any engine, at any cluster size. Two-phase cumsum
    (bucket-partitioned window + constant-size offset map) — no global
    window, no corpus sort."""
    docs = tables.load(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars"
    )
    return SP.pps_systematic_sample(
        docs, "doc_id", "n_chars", PPS_DRAWS, PPS_BUCKETS
    ).select("doc_id", "source", "n_chars", "cum")


def _pps_sql() -> str:
    return SP.pps_sample_sql(
        "(SELECT doc_id, source, n_chars FROM documents)",
        "doc_id",
        "n_chars",
        "doc_id, source, n_chars",
        PPS_DRAWS,
        PPS_BUCKETS,
    )


# chunk grid constants live beside chunk_spans (functions/text.py) so
# the batch query and the streaming maintenance can never drift
CHUNK_CHARS = TX.CHUNK_CHARS
CHUNK_STRIDE = TX.CHUNK_STRIDE


def crp_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping fixed-window chunking — the context-window split a
    RAG/embedding/training pipeline runs over every document: windows of
    CHUNK_CHARS chars every CHUNK_STRIDE chars (50-char overlap so no
    boundary sentence is lost), emitted as (doc_id, chunk_index, offset,
    length, content digest). Pure per-row explode of an arithmetic
    sequence — no shuffle at all (the orderBy is presentation-only; at
    corpus scale the chunks stream straight to the sink partitioned like
    their source docs). The digest stands in for the chunk payload so the
    oracle hashes content without moving it
    (functions/text.py::chunk_spans)."""
    docs = tables.load(spark, sf_dir, "documents")
    return TX.chunk_spans(docs, CHUNK_CHARS, CHUNK_STRIDE).orderBy(
        "doc_id", "chunk_index"
    )


_CHUNK_SQL = f"""
SELECT d.doc_id,
       CAST(s.cs // {CHUNK_STRIDE} AS BIGINT) AS chunk_index,
       CAST(s.cs AS BIGINT) AS chunk_start,
       CAST(LEAST({CHUNK_CHARS}, LENGTH(d.text) - s.cs) AS BIGINT) AS chunk_len,
       md5(substring(d.text, CAST(s.cs + 1 AS INT), {CHUNK_CHARS})) AS chunk_digest
FROM documents d,
     LATERAL (SELECT unnest(generate_series(0, GREATEST(LENGTH(d.text) - 1, 0),
                                            {CHUNK_STRIDE})) AS cs) s
ORDER BY doc_id, chunk_index
"""


# power-of-two sequence-length ladder; docs longer than the top rung are
# truncated to it (the max-context-length behavior of a real batcher)
LEN_BUCKETS = [16, 32, 64, 128]


def _bucket_expr_spark(n: Column) -> Column:
    e = None
    for b in LEN_BUCKETS[:-1]:
        e = F.when(n <= b, b) if e is None else e.when(n <= b, b)
    return e.otherwise(LEN_BUCKETS[-1])


def _bucket_expr_sql(n: str) -> str:
    whens = " ".join(f"WHEN {n} <= {b} THEN {b}" for b in LEN_BUCKETS[:-1])
    return f"CASE {whens} ELSE {LEN_BUCKETS[-1]} END"


def crp_length_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-bucketed batching census — padding efficiency, the metric
    that decides a training batcher's bucket ladder: every doc is
    assigned the smallest power-of-two sequence length ≥ its token count
    (truncated at the top rung), and the census reports per-bucket doc
    count, real tokens, padding tokens burned, truncated tokens lost,
    and the padding percentage. One scan + one tiny groupBy (≤ |ladder|
    groups) — holds at any corpus size."""
    docs = tables.load(spark, sf_dir, "documents")
    n = TX.token_count(F.col("text"))
    sized = docs.select(
        n.alias("n_tok"), _bucket_expr_spark(n).alias("bucket")
    )
    return (
        sized.groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").alias("sum_tokens"),
            F.sum(
                F.col("bucket") - F.least(F.col("n_tok"), F.col("bucket"))
            ).alias("pad_tokens"),
            F.sum(
                F.greatest(F.col("n_tok") - F.col("bucket"), F.lit(0))
            ).alias("trunc_tokens"),
        )
        .select(
            "bucket",
            "n_docs",
            "sum_tokens",
            "pad_tokens",
            "trunc_tokens",
            F.round(
                F.col("pad_tokens") / (F.col("n_docs") * F.col("bucket")), 6
            ).alias("pad_pct"),
        )
        .orderBy("bucket")
    )


def _length_buckets_sql() -> str:
    bucket = _bucket_expr_sql("n_tok")
    return rf"""
WITH sized AS (
  SELECT CAST(len(string_split_regex(trim(text), '\s+')) AS INTEGER) AS n_tok,
         {bucket} AS bucket
  FROM documents
),
census AS (
  SELECT bucket, COUNT(*) AS n_docs,
         CAST(SUM(n_tok) AS BIGINT) AS sum_tokens,
         CAST(SUM(bucket - LEAST(n_tok, bucket)) AS BIGINT) AS pad_tokens,
         CAST(SUM(GREATEST(n_tok - bucket, 0)) AS BIGINT) AS trunc_tokens
  FROM sized GROUP BY bucket
)
SELECT bucket, n_docs, sum_tokens, pad_tokens, trunc_tokens,
       ROUND(pad_tokens * 1.0 / (n_docs * bucket), 6) AS pad_pct
FROM census ORDER BY bucket
"""


def crp_fuzzy_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy train/test contamination: test-split documents that are
    MinHash-LSH NEAR-duplicates of some train document — the
    paraphrase/near-copy leakage the exact 8-gram scan
    (crp_contamination) structurally misses (one edited token breaks
    every 8-gram through it, but barely moves Jaccard). The standard
    second pass of an eval-set decontamination.

    Composition, all existing primitives: shingle → MinHash signatures →
    capped LSH bands → candidate pairs RESTRICTED to cross-split
    (train, test) orientation BEFORE the expensive exact-Jaccard verify
    (split is a pure hash function of doc_id, so orientation is a
    scan-local expression — no label join). Verify is candidate-first:
    O(|cross candidates| × shingles/doc), never doc×doc. Emits
    (test_doc_id, train_doc_id, jaccard ≥ 0.5) — the evidence rows an
    eval owner reviews before dropping test docs.

    Registry status: oracle-parity-gated in pytest
    (tests/test_pipelines.py); registered in the round-5 driver
    window. r10: feeds from the session-cached family shingle frame
    (VERDICT r9 #6 — one shingle explode + signature aggregate per
    session shared with the whole dedup family, the r9
    _shared_containment_base precedent); values unchanged."""
    from sql_cdc_spark.queries.dedup_q import _shingle_base

    return fuzzy_contamination_pairs(
        tables.load(spark, sf_dir, "documents"),
        base=_shingle_base(spark, sf_dir),
    )


def fuzzy_contamination_pairs(
    docs: DataFrame, base: tuple[DataFrame, DataFrame] | None = None
) -> DataFrame:
    """The (test_doc_id, train_doc_id, jaccard) cross-split near-dup scan
    over any (doc_id, text) corpus — see crp_fuzzy_contamination.
    ``base`` optionally supplies a pre-built (shingled, sigs-with-n_sh)
    pair (the registry path passes the session-cached family frames)."""
    from sql_cdc_spark.functions import dedup as DD
    from sql_cdc_spark.queries.dedup_q import LSH_MAX_BUCKET, NEAR_DUP_THRESHOLD

    if base is None:
        sh = DD.doc_shingles(docs)
        sigs = DD.minhash_signatures(sh, with_sizes=True)
    else:
        sh, sigs = base
    cands = DD.lsh_candidate_pairs(
        sigs.drop("n_sh"), max_bucket_size=LSH_MAX_BUCKET
    )

    def is_test(c):
        return SP.hash_unit(c, "split") < TEST_FRAC

    def is_train(c):
        return SP.hash_unit(c, "split") >= TEST_FRAC + VAL_FRAC

    a, b = F.col("id_a"), F.col("id_b")
    cross = cands.filter(
        (is_test(a) & is_train(b)) | (is_test(b) & is_train(a))
    )
    verified = DD.jaccard_pairs(
        sh,
        candidates=cross,
        threshold=NEAR_DUP_THRESHOLD,
        sizes=sigs.select("doc_id", "n_sh"),
    )
    return verified.select(
        F.when(is_test(a), a).otherwise(b).alias("test_doc_id"),
        F.when(is_test(a), b).otherwise(a).alias("train_doc_id"),
        "jaccard",
    ).orderBy("test_doc_id", "train_doc_id")


def _fuzzy_contamination_sql() -> str:
    from sql_cdc_spark.queries.dedup_q import (
        _BANDED_CTE,
        _CANDIDATES_CTE,
        _JACCARD_CTE,
        _SHINGLES_CTE,
        _SIGS_CTE,
        NEAR_DUP_THRESHOLD,
    )

    def is_test(e: str) -> str:
        return f"{SP.unit_sql(e, 'split')} < {TEST_FRAC}"

    def is_train(e: str) -> str:
        return f"{SP.unit_sql(e, 'split')} >= {TEST_FRAC + VAL_FRAC}"

    return f"""
WITH {_SHINGLES_CTE}, {_SIGS_CTE}, {_BANDED_CTE}, {_CANDIDATES_CTE}, {_JACCARD_CTE},
xc AS (
  SELECT id_a, id_b,
         CASE WHEN {is_test('id_a')} THEN id_a ELSE id_b END AS test_doc_id,
         CASE WHEN {is_test('id_a')} THEN id_b ELSE id_a END AS train_doc_id
  FROM cands
  WHERE ({is_test('id_a')} AND {is_train('id_b')})
     OR ({is_test('id_b')} AND {is_train('id_a')})
)
SELECT xc.test_doc_id, xc.train_doc_id, j.jaccard
FROM jac j JOIN xc ON j.id_a = xc.id_a AND j.id_b = xc.id_b
WHERE j.jaccard >= {NEAR_DUP_THRESHOLD}
ORDER BY test_doc_id, train_doc_id
"""


LM_NGRAM = 3  # trigram LM — the CCNet-style fluency/novelty signal
# (bigrams are fully saturated on this corpus's tiny vocabulary — every
# test bigram appears in train — so trigrams keep the novelty side of
# the score non-vacuous at sf0.01 while the plan shape is k-independent)


def crp_ngram_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train-split n-gram LM scoring of the test split — the integer-exact
    core of the CCNet/KenLM quality filter: build a trigram occurrence
    census over the TRAIN split, then score every TEST document by (a)
    novelty: the share of its trigram occurrences never seen in train, and
    (b) lm_bits: the summed floor(log2(train count)) of its seen trigrams
    (a monotone surrogate for summed log-probability that is pure integer
    arithmetic, so it hashes identically on any engine — no float log in
    the plan). High novelty + low lm_bits = out-of-domain or garbled text.

    Scale shape: both sides explode to n-gram occurrences hashed to
    60-bit ints at the scan; the LM is ONE map-side-combined groupBy of
    the train side; scoring is a fact-by-fact hash join on the bigint
    n-gram key (never broadcast at corpus scale, never doc×doc) plus one
    per-doc aggregate. floor(log2(n)) = length(bin(n)) − 1 on both
    engines — no floating point anywhere past the scan. Honest cost
    note: the one-shot plan tokenizes the corpus twice (the gram subtree
    feeds both the census and the scoring branch and Spark does not
    share subtrees across join sides); the repeated-use path that
    amortizes the census is streaming/lm_maintenance.py, which maintains
    it incrementally and scores fresh docs against the materialized
    state.

    Registry status: oracle-parity-gated in pytest this round; registered
    in the round-5 driver window."""
    return (
        _lm_doc_scores(spark, sf_dir)
        .select(
            "doc_id",
            "n_ngrams",
            "n_unseen",
            F.expr("100 * n_unseen div n_ngrams").alias("novelty_pct"),
            "lm_bits",
        )
        .orderBy("doc_id")
    )


def _lm_doc_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-test-document trigram-LM scores (doc_id, n_ngrams, n_unseen,
    lm_bits) — the ONE derivation crp_ngram_lm_score reports per doc
    and crp_domain_reweight aggregates per source; sharing it means the
    quality filter and the mixture optimizer literally cannot disagree
    about a document's score."""
    from sql_cdc_spark.functions import dedup as DD

    docs = tables.load(spark, sf_dir, "documents")
    split = SP.with_split(docs, "doc_id", TEST_FRAC, VAL_FRAC)
    sh64 = F.conv(F.substring(F.md5("bg"), 1, 15), 16, 10).cast("long")
    grams = (
        DD.balance_partitions(split)
        .select(
            "doc_id",
            "split",
            F.explode(DD.shingles(F.col("text"), LM_NGRAM)).alias("bg"),
        )
        .select("doc_id", "split", sh64.alias("sh64"))
    )
    lm = (
        grams.filter(F.col("split") == "train")
        .groupBy("sh64")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    scored = grams.filter(F.col("split") == "test").join(lm, "sh64", "left")
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_ngrams"),
        F.sum(
            F.when(F.col("cnt").isNull(), F.lit(1)).otherwise(F.lit(0))
        ).alias("n_unseen"),
        F.sum(
            F.when(
                F.col("cnt").isNotNull(),
                F.length(F.bin(F.col("cnt"))) - F.lit(1),
            ).otherwise(F.lit(0)).cast("long")
        ).alias("lm_bits"),
    )


def _lm_doc_sql() -> str:
    """Per-test-document (doc_id, n_ngrams, n_unseen, lm_bits) — the
    DuckDB twin of _lm_doc_scores, shared by the per-doc report and the
    domain-reweight aggregate exactly as the Spark side shares its
    derivation."""
    case = SP.split_sql("doc_id", TEST_FRAC, VAL_FRAC)
    k = LM_NGRAM
    return f"""
WITH splat AS (
  SELECT doc_id, text, {case} AS split FROM documents
),
toks AS (
  SELECT doc_id, split, string_split_regex({_NORM_SQL}, '\\s+') AS t FROM splat
),
grams AS (
  SELECT doc_id, split,
    CAST(('0x' || substring(md5(
      unnest(CASE WHEN len(t) >= {k}
             THEN list_transform(range(1, len(t) - {k - 2}), i -> array_to_string(t[i:i+{k - 1}], ' '))
             ELSE [array_to_string(t, ' ')] END)
    ), 1, 15)) AS BIGINT) AS sh64
  FROM toks
),
lm AS (
  SELECT sh64, COUNT(*) AS cnt FROM grams WHERE split = 'train' GROUP BY 1
)
SELECT g.doc_id,
       COUNT(*) AS n_ngrams,
       CAST(SUM(CASE WHEN lm.cnt IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_unseen,
       CAST(SUM(CASE WHEN lm.cnt IS NOT NULL THEN length(bin(lm.cnt)) - 1 ELSE 0 END) AS BIGINT) AS lm_bits
FROM grams g LEFT JOIN lm ON g.sh64 = lm.sh64
WHERE g.split = 'test'
GROUP BY g.doc_id
"""


def _ngram_lm_sql() -> str:
    return f"""
SELECT doc_id, n_ngrams, n_unseen,
       100 * n_unseen // n_ngrams AS novelty_pct, lm_bits
FROM ({_lm_doc_sql()})
ORDER BY doc_id
"""


# ---- DoReMi-style domain reweighting (round 6) ----------------------------
# multiplicative-update surrogate: one weight doubling per this many
# milli-bits of per-gram deficit vs the corpus reference, capped
DOREMI_MILLI_PER_BIT = 100
DOREMI_MAX_BITS = 10


def crp_domain_reweight(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One DoReMi-style domain-mixture reweighting step (Xie et al.,
    arXiv:2305.10429): domains whose held-out text the reference LM
    finds HARD (low trigram-LM bits per gram vs the corpus average) get
    their sampling weight multiplied up, exactly the exponentiated-
    gradient update DoReMi runs with a proxy model — here with the
    engine's own integer surrogates so the step is bit-reproducible:

    - per-domain loss: bits_milli = 1000·Σlm_bits div Σn_ngrams over
      the domain's held-out docs (the SAME _lm_doc_scores derivation
      the quality filter reports, so filter and optimizer cannot
      disagree); reference = the corpus-wide ratio.
    - excess loss: max(0, ref_milli − bits_milli) — only harder-than-
      average domains move, matching DoReMi's clipped excess.
    - multiplicative update in powers of two: one doubling per
      DOREMI_MILLI_PER_BIT milli-bits of excess, capped at
      DOREMI_MAX_BITS (the trust region); weight_ppm renormalizes the
      2^boost factors to parts-per-million by integer division.

    Scale shape: the LM side is the posting-shaped trigram census; the
    doc join is fact-by-fact on doc_id; everything after the per-source
    aggregate operates on |domains| rows with two broadcast one-row
    censuses. No floats anywhere."""
    from sql_cdc_spark.queries._cache import session_cached

    def build_dom() -> DataFrame:
        per_doc = _lm_doc_scores(spark, sf_dir)
        docs = tables.load(spark, sf_dir, "documents").select(
            "doc_id", "source"
        )
        return (
            per_doc.join(docs, "doc_id")
            .groupBy("source")
            .agg(
                F.count(F.lit(1)).alias("n_docs"),
                F.sum("n_ngrams").cast("long").alias("n_grams"),
                F.sum("lm_bits").cast("long").alias("bits"),
            )
        )

    # session-cache the |domains|-row aggregate: THREE branches read it
    # (the reference census, the per-domain projection, the weight
    # normalizer) and Spark shares no subtrees across join sides —
    # uncached, the whole corpus-scale LM pipeline would execute once
    # per branch (same contract as scl_skew_census's count-of-counts)
    dom = session_cached(spark, ("doremi_dom", sf_dir), build_dom)
    ref = (
        dom.agg(
            F.sum("n_grams").cast("long").alias("tg"),
            F.sum("bits").cast("long").alias("tb"),
        )
        .select(F.expr("1000 * tb div tg").alias("ref_milli"))
    )
    w = (
        dom.crossJoin(F.broadcast(ref))
        .select(
            "source",
            "n_docs",
            "n_grams",
            F.expr("1000 * bits div n_grams").alias("bits_milli"),
            "ref_milli",
        )
        .withColumn(
            "excess_milli",
            F.greatest(F.lit(0).cast("long"), F.col("ref_milli") - F.col("bits_milli")),
        )
        .withColumn(
            "boost_bits",
            F.least(
                F.expr(f"excess_milli div {DOREMI_MILLI_PER_BIT}"),
                F.lit(DOREMI_MAX_BITS).cast("long"),
            ),
        )
        .withColumn(
            "unnorm",
            F.expr("shiftleft(cast(1 as bigint), cast(boost_bits as int))"),
        )
    )
    tot = w.agg(F.sum("unnorm").cast("long").alias("tu"))
    return (
        w.crossJoin(F.broadcast(tot))
        .select(
            "source",
            "n_docs",
            "n_grams",
            "bits_milli",
            "excess_milli",
            "boost_bits",
            F.expr("1000000 * unnorm div tu").alias("weight_ppm"),
        )
        .orderBy("source")
    )


def _domain_reweight_sql() -> str:
    return f"""
WITH perdoc AS ({_lm_doc_sql()}),
dom AS (
  SELECT d.source, COUNT(*) AS n_docs,
         CAST(SUM(p.n_ngrams) AS BIGINT) AS n_grams,
         CAST(SUM(p.lm_bits) AS BIGINT) AS bits
  FROM perdoc p JOIN documents d ON d.doc_id = p.doc_id
  GROUP BY d.source
),
ref AS (
  SELECT 1000 * CAST(SUM(bits) AS BIGINT) // CAST(SUM(n_grams) AS BIGINT)
           AS ref_milli
  FROM dom
),
sc AS (
  SELECT source, n_docs, n_grams,
         1000 * bits // n_grams AS bits_milli, r.ref_milli,
         GREATEST(0, r.ref_milli - 1000 * bits // n_grams) AS excess_milli
  FROM dom, ref r
),
w AS (
  SELECT *, LEAST(excess_milli // {DOREMI_MILLI_PER_BIT}, {DOREMI_MAX_BITS})
              AS boost_bits
  FROM sc
),
u AS (SELECT *, CAST(1 << boost_bits AS BIGINT) AS unnorm FROM w),
t AS (SELECT CAST(SUM(unnorm) AS BIGINT) AS tu FROM u)
SELECT source, n_docs, n_grams, bits_milli, excess_milli, boost_bits,
       1000000 * unnorm // t.tu AS weight_ppm
FROM u, t ORDER BY source
"""


def crp_filter_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filter-funnel attribution — the governance report read before any
    gate threshold is changed: how many documents survive each stage of
    the clean pipeline IN ORDER (length → quality → repetition → exact
    dedup), and how many fail more than one gate independently (docs a
    single-gate relaxation cannot save). Gate predicates are the SAME
    expressions the production gates use (crp_corpus_clean,
    crp_repetition_filter), so this report cannot drift from the
    pipeline it audits.

    Scale shape: the scalar gates are scan-local; the repetition ratio
    reuses the shingle-census shape (explode + two map-side-combined
    groupBys); one doc-keyed join unites them; the funnel itself is ONE
    global aggregate emitting a single row — conditional counts, and the
    dedup stage as a conditional COUNT(DISTINCT digest) over survivors.

    Registry status: oracle-parity-gated in pytest this round; registered
    in the round-5 driver window."""
    return filter_funnel(tables.load(spark, sf_dir, "documents"))


def filter_funnel(docs: DataFrame) -> DataFrame:
    """Funnel body over any documents DataFrame (doc_id, text) — split
    out so the planted-fixture test can drive the dedup and multi-fail
    counters the sf0.01 corpus leaves at zero."""
    from sql_cdc_spark.functions import dedup as DD

    scal = docs.select(
        "doc_id",
        TX.token_count(F.col("text")).alias("n_tokens"),
        TX.quality_score(F.col("text")).alias("quality"),
        TX.fingerprint(F.col("text")).alias("digest"),
    )
    sh = DD.balance_partitions(docs).select(
        "doc_id", F.explode(DD.shingles(F.col("text"))).alias("shingle")
    )
    per = sh.groupBy("doc_id", "shingle").agg(F.count(F.lit(1)).alias("cnt"))
    rep = per.groupBy("doc_id").agg(
        (F.max("cnt") / F.sum("cnt") <= REPETITION_MAX_RATIO).alias("rep_ok")
    )
    flags = scal.join(rep, "doc_id").select(
        "digest",
        (F.col("n_tokens") >= MIN_TOKENS).alias("len_ok"),
        (F.col("quality") >= MIN_QUALITY).alias("qual_ok"),
        "rep_ok",
    )
    fails = (
        F.when(~F.col("len_ok"), 1).otherwise(0)
        + F.when(~F.col("qual_ok"), 1).otherwise(0)
        + F.when(~F.col("rep_ok"), 1).otherwise(0)
    )
    survive = F.col("len_ok") & F.col("qual_ok") & F.col("rep_ok")
    return flags.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.when(F.col("len_ok"), 1).otherwise(0)).alias("n_after_length"),
        F.sum(
            F.when(F.col("len_ok") & F.col("qual_ok"), 1).otherwise(0)
        ).alias("n_after_quality"),
        F.sum(F.when(survive, 1).otherwise(0)).alias("n_after_repetition"),
        F.count_distinct(F.when(survive, F.col("digest"))).alias(
            "n_after_dedup"
        ),
        F.sum(F.when(fails >= 2, 1).otherwise(0)).alias("n_fail_multi"),
    )


_FILTER_FUNNEL_SQL = f"""
WITH scal AS (
  SELECT doc_id,
         CAST(len(string_split_regex(trim(text), '\\s+')) AS INTEGER) AS n_tokens,
         {_QUALITY_EXPR_SQL} AS quality,
         md5({_NORM_SQL}) AS digest
  FROM documents
),
toks AS (
  SELECT doc_id, string_split_regex({_NORM_SQL}, '\\s+') AS t FROM documents
),
sh AS (
  SELECT doc_id,
    unnest(CASE WHEN len(t) >= 3
           THEN list_transform(range(1, len(t) - 1), i -> array_to_string(t[i:i+2], ' '))
           ELSE [array_to_string(t, ' ')] END) AS shingle
  FROM toks
),
per AS (SELECT doc_id, shingle, COUNT(*) AS cnt FROM sh GROUP BY 1, 2),
rep AS (
  SELECT doc_id, MAX(cnt) / SUM(cnt) <= {REPETITION_MAX_RATIO} AS rep_ok
  FROM per GROUP BY 1
),
flags AS (
  SELECT s.digest,
         s.n_tokens >= {MIN_TOKENS} AS len_ok,
         s.quality >= {MIN_QUALITY} AS qual_ok,
         r.rep_ok AS rep_ok
  FROM scal s JOIN rep r ON s.doc_id = r.doc_id
)
SELECT COUNT(*) AS n_docs,
       CAST(SUM(CASE WHEN len_ok THEN 1 ELSE 0 END) AS BIGINT) AS n_after_length,
       CAST(SUM(CASE WHEN len_ok AND qual_ok THEN 1 ELSE 0 END) AS BIGINT) AS n_after_quality,
       CAST(SUM(CASE WHEN len_ok AND qual_ok AND rep_ok THEN 1 ELSE 0 END) AS BIGINT) AS n_after_repetition,
       COUNT(DISTINCT CASE WHEN len_ok AND qual_ok AND rep_ok THEN digest END) AS n_after_dedup,
       CAST(SUM(CASE WHEN (CASE WHEN len_ok THEN 0 ELSE 1 END)
                        + (CASE WHEN qual_ok THEN 0 ELSE 1 END)
                        + (CASE WHEN rep_ok THEN 0 ELSE 1 END) >= 2
                THEN 1 ELSE 0 END) AS BIGINT) AS n_fail_multi
FROM flags
"""


DSIR_NGRAM = 2  # hashed-bigram features, per the DSIR recipe
DSIR_K = 200    # selection budget (rows kept from the raw pool)


def crp_dsir_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data selection via importance resampling (DSIR, Xie et al. 2023,
    arXiv:2302.03169) — the target-aware counterpart of the one-sided LM
    score (crp_ngram_lm_score): rank the RAW pool by how much more
    target-like than pool-like each document's hashed-bigram profile is,
    then keep the best ``DSIR_K``. Target here = documents passing the
    production quality gate (quality ≥ MIN_QUALITY — the same shared
    predicate crp_corpus_clean enforces); raw pool = everything else.

    Integer-exact surrogate for the DSIR log-ratio: each bigram
    occurrence of a scored doc contributes floor(log2(c+1)) bits under
    BOTH censuses (target count and whole-corpus count, +1-smoothed so
    unseen-in-target grams contribute 0), summed per doc; the selection
    metric is the per-gram rate ROUND((tgt_bits − raw_bits)/n_grams, 6)
    — one double division of two exact ints, rounded like every
    similarity score in the repo, so both engines order identically.
    floor(log2(n)) = length(bin(n)) − 1 on both engines; no float log.

    Scale shape: bigrams hash to 60-bit ints at the scan; the two
    censuses are map-side-combined groupBys over the SAME exploded
    frame; scoring is a fact-by-fact join on the bigint gram key plus
    one per-doc aggregate; the selection is TakeOrdered over a TOTAL
    order (rate, doc_id). Never doc×doc, never a broadcast of corpus-
    sized state. Honest cost note: like crp_ngram_lm_score, the one-shot
    plan tokenizes the corpus once per census branch; the repeated-use
    path materializes the censuses (streaming/lm_maintenance.py shape).

    Registry status: oracle-parity-gated in pytest this round; registered
    in the round-5 driver window."""
    from sql_cdc_spark.functions import dedup as DD

    docs = tables.load(spark, sf_dir, "documents")
    flagged = docs.select(
        "doc_id",
        "text",
        (TX.quality_score(F.col("text")) >= MIN_QUALITY).alias("is_tgt"),
    )
    sh64 = F.conv(F.substring(F.md5("bg"), 1, 15), 16, 10).cast("long")
    grams = (
        DD.balance_partitions(flagged)
        .select(
            "doc_id",
            "is_tgt",
            F.explode(DD.shingles(F.col("text"), DSIR_NGRAM)).alias("bg"),
        )
        .select("doc_id", "is_tgt", sh64.alias("sh64"))
    )
    # r10 (guide §2.4): ONE map-side-combined groupBy produces BOTH
    # censuses — count(*) is raw_cnt, count_if(is_tgt) is tgt_cnt — so
    # the corpus is tokenized/exploded twice (census + pool) instead of
    # three times, the census shuffle runs once instead of twice, and
    # scoring joins ONE census table instead of raw + left-join tgt.
    # Value-identical: _bits(0 + 1) = 0, exactly what the old left join
    # + COALESCE(tgt_cnt, 0) contributed for grams unseen in target.
    census = grams.groupBy("sh64").agg(
        F.count(F.lit(1)).alias("raw_cnt"),
        F.count_if(F.col("is_tgt")).alias("tgt_cnt"),
    )
    pool = grams.filter(~F.col("is_tgt")).select(
        "doc_id", F.lit(1).alias("n"), "sh64"
    )
    return dsir_rank_pool(pool, census, None, DSIR_K)


def dsir_rank_pool(
    pool: DataFrame, raw: DataFrame, tgt: DataFrame | None, k: int = DSIR_K
) -> DataFrame:
    """The DSIR scoring/ranking body shared by the one-shot query and
    the streaming census maintenance (streaming/dsir_maintenance.py),
    so the two paths cannot drift. ``pool``: (doc_id, n, sh64) gram
    occurrence counts of the docs to rank (the one-shot path passes
    n=1 occurrence rows); ``raw``/``tgt``: the (sh64, raw_cnt/tgt_cnt)
    censuses. ``tgt=None`` means ``raw`` is a FUSED census already
    carrying tgt_cnt (0 for grams unseen in target — the one-shot
    path's r10 single-pass form); the maintenance path keeps its two
    materialized census tables and the left-join shape."""
    def _bits(c):
        # floor(log2(c + 1)): exact int bit-length, engine-portable
        return (F.length(F.bin(c + F.lit(1))) - F.lit(1)).cast("long")

    joined = (
        pool.join(raw, "sh64")
        if tgt is None
        else pool.join(raw, "sh64").join(tgt, "sh64", "left")
    )
    scored = (
        joined
        .select(
            "doc_id",
            "n",
            (F.col("n") * _bits(F.coalesce(F.col("tgt_cnt"), F.lit(0)))).alias(
                "__tb"
            ),
            (F.col("n") * _bits(F.col("raw_cnt"))).alias("__rb"),
        )
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.sum("n").alias("n_grams"),
            F.sum("__tb").alias("tgt_bits"),
            F.sum("__rb").alias("raw_bits"),
        )
        .select(
            "doc_id",
            "n_grams",
            "tgt_bits",
            "raw_bits",
            F.round(
                (F.col("tgt_bits") - F.col("raw_bits")) / F.col("n_grams"), 6
            ).alias("imp_rate"),
        )
        .orderBy(F.col("imp_rate").desc(), F.col("doc_id").asc())
        .limit(k)
    )


def _dsir_sql() -> str:
    k = DSIR_NGRAM
    return f"""
WITH flagged AS (
  SELECT doc_id, text, ({_QUALITY_EXPR_SQL}) >= {MIN_QUALITY} AS is_tgt
  FROM documents
),
toks AS (
  SELECT doc_id, is_tgt, string_split_regex({_NORM_SQL}, '\\s+') AS t
  FROM flagged
),
grams AS (
  SELECT doc_id, is_tgt,
    CAST(('0x' || substring(md5(
      unnest(CASE WHEN len(t) >= {k}
             THEN list_transform(range(1, len(t) - {k - 2}), i -> array_to_string(t[i:i+{k - 1}], ' '))
             ELSE [array_to_string(t, ' ')] END)
    ), 1, 15)) AS BIGINT) AS sh64
  FROM toks
),
raw AS (SELECT sh64, COUNT(*) AS raw_cnt FROM grams GROUP BY 1),
tgt AS (SELECT sh64, COUNT(*) AS tgt_cnt FROM grams WHERE is_tgt GROUP BY 1),
agg AS (
  SELECT g.doc_id,
         COUNT(*) AS n_grams,
         CAST(SUM(length(bin(COALESCE(t.tgt_cnt, 0) + 1)) - 1) AS BIGINT) AS tgt_bits,
         CAST(SUM(length(bin(r.raw_cnt + 1)) - 1) AS BIGINT) AS raw_bits
  FROM grams g JOIN raw r USING (sh64) LEFT JOIN tgt t USING (sh64)
  WHERE NOT g.is_tgt
  GROUP BY 1
)
SELECT doc_id, n_grams, tgt_bits, raw_bits,
       ROUND((tgt_bits - raw_bits) / n_grams, 6) AS imp_rate
FROM agg
ORDER BY imp_rate DESC, doc_id ASC
LIMIT {DSIR_K}
"""


QUERIES: dict[str, QueryEntry] = {
    "crp_train_test_split": QueryEntry(crp_train_test_split, _split_census_sql()),
    "crp_global_shuffle": QueryEntry(crp_global_shuffle, _global_shuffle_sql()),
    "crp_stratified_sample": QueryEntry(crp_stratified_sample, _stratified_sql()),
    "crp_corpus_clean": QueryEntry(crp_corpus_clean, _corpus_clean_sql()),
    "crp_repetition_filter": QueryEntry(crp_repetition_filter, _repetition_sql()),
    "crp_contamination": QueryEntry(crp_contamination, _contamination_sql()),
    "crp_pack_sequences": QueryEntry(crp_pack_sequences, _PACK_SQL),
    "crp_source_mixture": QueryEntry(crp_source_mixture, _MIXTURE_SQL),
    "crp_mixture_sample": QueryEntry(crp_mixture_sample, _mixture_sample_sql()),
    "crp_manifest": QueryEntry(crp_manifest, _manifest_sql()),
    "crp_pps_sample": QueryEntry(crp_pps_sample, _pps_sql()),
    "crp_chunk_documents": QueryEntry(crp_chunk_documents, _CHUNK_SQL),
    "crp_length_buckets": QueryEntry(crp_length_buckets, _length_buckets_sql()),
    "crp_fuzzy_contamination": QueryEntry(
        crp_fuzzy_contamination, _fuzzy_contamination_sql()
    ),
    "crp_ngram_lm_score": QueryEntry(crp_ngram_lm_score, _ngram_lm_sql()),
    "crp_domain_reweight": QueryEntry(
        crp_domain_reweight, _domain_reweight_sql()
    ),
    "crp_filter_funnel": QueryEntry(crp_filter_funnel, _FILTER_FUNNEL_SQL),
    "crp_dsir_select": QueryEntry(crp_dsir_select, _dsir_sql()),
}
