"""Text-analysis queries over the documents table (north-star extension:
token counting, fingerprinting, quality scoring, language ID). Oracle SQL
is GENERATED from the same constants as the Spark expressions so the two
sides cannot drift.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from sql_cdc_spark import tables
from sql_cdc_spark.functions import text as TX
from sql_cdc_spark.queries import QueryEntry

# DuckDB fragments mirroring functions/text.py
_NORM_SQL = r"trim(regexp_replace(lower(text), '\s+', ' ', 'g'))"
_TOKS_SQL = rf"string_split_regex(trim(text), '\s+')"


def _occ_sql(padded: str, needle: str) -> str:
    n = needle.replace("'", "''")
    return (
        f"CAST((length({padded}) - length(replace({padded}, '{n}', ''))) / {len(needle)} AS INTEGER)"
    )


def txt_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token count + char count + md5 fingerprint per document — all
    scan-speed column algebra (no UDFs)."""
    docs = tables.load(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        TX.token_count(F.col("text")).alias("n_tokens"),
        F.length("text").cast("int").alias("n_chars_actual"),
        TX.fingerprint(F.col("text")).alias("fingerprint"),
    )


_TOKEN_STATS_SQL = rf"""
SELECT doc_id,
       CAST(len({_TOKS_SQL}) AS INTEGER) AS n_tokens,
       CAST(length(text) AS INTEGER) AS n_chars_actual,
       md5({_NORM_SQL}) AS fingerprint
FROM documents
"""


def txt_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic quality score (length prior + mean token length +
    stopword ratio) — the filter stage of a training-data pipeline."""
    docs = tables.load(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        TX.quality_score(F.col("text")).alias("quality"),
    )


_PADDED = "(' ' || lower(text) || ' ')"
# the bare quality expression, shared with corpus_q's composite clean step
_QUALITY_EXPR_SQL = rf"""ROUND(
    0.4 * LEAST(CAST(len({_TOKS_SQL}) AS DOUBLE) / 100.0, 1.0)
  + 0.3 * LEAST(((CAST(length(text) AS DOUBLE) - len({_TOKS_SQL}) + 1) / len({_TOKS_SQL})) / 8.0, 1.0)
  + 0.3 * LEAST(CAST({_occ_sql(_PADDED, ' the ')} + {_occ_sql(_PADDED, ' a ')} AS DOUBLE)
                / len({_TOKS_SQL}) * 5.0, 1.0), 6)"""
_QUALITY_SQL = rf"""
SELECT doc_id,
  {_QUALITY_EXPR_SQL} AS quality
FROM documents
"""


def txt_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marker-word language ID with per-language scores — deterministic
    argmax (first language in marker order wins ties)."""
    docs = tables.load(spark, sf_dir, "documents")
    scores = TX.language_scores(F.col("text"))
    return docs.select(
        "doc_id",
        "lang",
        *[c.cast("int").alias(f"score_{lang}") for lang, c in scores.items()],
        TX.language_id(F.col("text")).alias("lang_pred"),
    )


def _language_sql() -> str:
    langs = list(TX.LANG_MARKERS)
    score_exprs = {
        lang: " + ".join(_occ_sql(_PADDED, m) for m in TX.LANG_MARKERS[lang])
        for lang in langs
    }
    score_cols = ",\n       ".join(
        f"CAST({e} AS INTEGER) AS score_{lang}" for lang, e in score_exprs.items()
    )
    whens = []
    for lang in langs[:-1]:
        conds = " AND ".join(
            f"score_{lang} >= score_{other}" for other in langs if other != lang
        )
        whens.append(f"WHEN {conds} THEN '{lang}'")
    case = "CASE " + " ".join(whens) + f" ELSE '{langs[-1]}' END"
    return f"""
SELECT doc_id, lang, score_en, score_de, score_fr, score_es, score_zh,
       {case} AS lang_pred
FROM (
  SELECT doc_id, lang,
       {score_cols}
  FROM documents
)
"""


def txt_bpe_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE-ish sub-word token count vs whitespace word count — the
    tokens-per-word ratio is the cheap proxy for tokenizer blow-up on a
    corpus (all JVM-side regex, no UDF)."""
    docs = tables.load(spark, sf_dir, "documents")
    n_bpe = F.size(TX.bpe_tokens(F.col("text")))
    n_words = TX.token_count(F.col("text"))
    return docs.select(
        "doc_id",
        n_bpe.alias("n_bpe_tokens"),
        n_words.alias("n_words"),
        F.round(n_bpe / n_words, 6).alias("tokens_per_word"),
    )


_BPE_SQL = rf"""
SELECT doc_id,
       CAST(len(regexp_extract_all(lower(text), '{TX.BPE_RE}')) AS INTEGER) AS n_bpe_tokens,
       CAST(len({_TOKS_SQL}) AS INTEGER) AS n_words,
       ROUND(len(regexp_extract_all(lower(text), '{TX.BPE_RE}'))
             / len({_TOKS_SQL}), 6) AS tokens_per_word
FROM documents
"""


def txt_rolling_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rabin–Karp polynomial fingerprint per document — the rolling-hash
    dedup/chunking primitive, folded with built-in HOFs (no UDF)."""
    docs = tables.load(spark, sf_dir, "documents")
    return docs.select("doc_id", TX.rolling_hash(F.col("text")).alias("rhash"))


_ROLLING_SQL = f"""
SELECT doc_id,
       list_reduce(
         list_prepend(CAST(0 AS BIGINT),
                      list_transform(string_split(text, ''), c -> CAST(ascii(c) AS BIGINT))),
         (a, b) -> (a * {TX.ROLLING_BASE} + b) % {TX.ROLLING_MOD}
       ) AS rhash
FROM documents
"""

WINNOW_TOPK = 25


def txt_winnow_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus census of shared winnowing fingerprints — the
    partial-overlap dedup signal the whole-doc fingerprint
    (txt_rolling_fingerprint) and the disjoint-tile census
    (txt_dup_passage_census) both miss: winnowing (Schleimer et al.,
    SIGMOD 2003) guarantees any shared run of ≥ WINNOW_K+WINNOW_W−1
    words surfaces a shared fingerprint while keeping only ~1/W of the
    gram hashes, so overlapping (not merely identical or tile-aligned)
    passages between documents are visible at a fraction of the posting
    volume. Emits the top shared fingerprints (appearing in ≥ 2 docs)
    by document frequency.

    Scale shape: fingerprint selection is entirely SCAN-LOCAL (array
    HOFs over the per-doc token array, STAGED as bound-attribute
    projections — the single-expression form re-evaluated the gram-hash
    subtree per window slice, measured 350 s vs 3.4 s at sf0.1; zero
    joins, zero UDFs); the only corpus-wide exchange is the fingerprint
    groupBy (map-side combined, post-distinct so a doc contributes each
    fingerprint once), and the top-k compiles to TakeOrderedAndProject
    over the (n_docs desc, fp asc) total order. The ~1/W sub-sampling
    is the 100 TB lever: posting volume tracks selected fingerprints,
    not grams.

    r10: reads the session-cached per-doc fingerprint frame shared with
    txt_winnow_pairs (guide §2.4/§5, the r9 shingle-share precedent) —
    the normalize/gram-hash/window-min scan is the family's dominant
    cost and was previously paid once here plus THREE times inside the
    pair report's census/postings/size subtrees."""
    per_doc = _winnow_base(spark, sf_dir)
    return (
        per_doc.groupBy("fp")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .filter(F.col("n_docs") >= 2)
        .orderBy(F.desc("n_docs"), F.asc("fp"))
        .limit(WINNOW_TOPK)
    )


# fixed K=4 grams / W=3 windows rendered ELEMENTWISE (ws[i] || ' ' || …,
# LEAST(hl[j], hl[j+1], hl[j+2])) so the oracle never leans on DuckDB
# list-slicing semantics; generate_series(1, n<1) is empty on DuckDB,
# matching the Spark when()-guards (the documented sequence hazard)
# the shared w/g/hs/f CTE prefix (normalize → gram-hash → ordered hash
# list → window-min fingerprints) that BOTH winnow queries compose —
# a named constant, not a string-split of one query out of the other,
# so a cosmetic edit to either query's tail cannot silently corrupt the
# other's oracle (ADVICE r8)
_WINNOW_PREFIX_SQL = f"""
WITH w AS (SELECT doc_id, string_split({_NORM_SQL}, ' ') AS ws FROM documents),
g AS (
  SELECT doc_id, t.i,
         list_reduce(list_prepend(CAST(0 AS BIGINT),
           list_transform(string_split(
             ws[t.i] || ' ' || ws[t.i + 1] || ' ' || ws[t.i + 2]
                      || ' ' || ws[t.i + 3], ''),
             c -> CAST(ascii(c) AS BIGINT))),
           (a, b) -> (a * {TX.ROLLING_BASE} + b) % {TX.ROLLING_MOD}) AS h
  FROM w, UNNEST(generate_series(1, len(ws) - {TX.WINNOW_K - 1})) AS t(i)
  WHERE NOT (len(ws) = 1 AND ws[1] = '')
),
hs AS (SELECT doc_id, list(h ORDER BY i) AS hl FROM g GROUP BY doc_id),
f AS (
  SELECT DISTINCT doc_id, LEAST(hl[t.j], hl[t.j + 1], hl[t.j + 2]) AS fp
  FROM hs, UNNEST(generate_series(1, len(hl) - {TX.WINNOW_W - 1})) AS t(j)
)
"""

_WINNOW_SQL = f"""
{_WINNOW_PREFIX_SQL}
SELECT fp, COUNT(*) AS n_docs
FROM f GROUP BY fp HAVING COUNT(*) >= 2
ORDER BY n_docs DESC, fp ASC
LIMIT {WINNOW_TOPK}
"""


WINNOW_DF_CAP = 64    # boilerplate cap: fps in more docs join no pairs
WINNOW_PAIR_TOPK = 25


def txt_winnow_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document overlap PAIR report from winnowing fingerprints —
    the Lee-et-al./MOSS use case the census (txt_winnow_fingerprints)
    stops short of (VERDICT r7 #7): WHICH document pairs share
    fingerprinted runs, with the overlap mass. Any shared run of
    ≥ WINNOW_K+WINNOW_W−1 words guarantees ≥ 1 shared fingerprint, so
    a pair's n_shared grows with the length of its shared passages —
    the partial-overlap dedup signal whole-doc digests and disjoint
    tiles both miss. Emits (doc_a, doc_b, n_shared, n_a, n_b,
    overlap_permille) where overlap_permille = 1000·n_shared over the
    SMALLER doc's fingerprint count (a containment-style score: a doc
    fully embedded in a larger one scores ~1000).

    Scale shape — the dedup-family pair discipline: fingerprint
    selection is scan-local (~1/W of the gram hashes survive, the
    posting-volume lever); postings are DF-CAPPED before any join
    (fps in > WINNOW_DF_CAP docs are boilerplate and would contribute
    O(df²) pairs — the hot-shingle-cap rule), so per-fp pair fan-out
    is bounded at CAP²/2; the pair self-join and both per-doc-count
    joins pin shuffle-hash (postings and doc counts all scale with the
    corpus — the unbounded-pair-path broadcast ban, see
    dedup._attach_sizes); the report is TakeOrderedAndProject over the
    (n_shared desc, doc_a, doc_b) total order.

    r10: the fingerprint scan feeds THREE subtrees of this plan (df
    census, the capped postings self-join, per-doc counts) and is also
    txt_winnow_fingerprints' whole input — the registry path now reads
    it from ONE session-cached frame instead of re-running the
    normalize/gram-hash/window-min scan four times per session (guide
    §2.4/§5; values unchanged, same lineage)."""
    return winnow_pairs_report(
        tables.load(spark, sf_dir, "documents"),
        per_doc=_winnow_base(spark, sf_dir),
    )


def _winnow_base(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session-cached per-document winnowing fingerprints — the shared
    materialization behind txt_winnow_fingerprints and txt_winnow_pairs
    (one scan-local fingerprint pass per session per sf_dir; the
    _cache.session_cached lifecycle: re-persist after an external
    clearCache, dead-session eviction)."""
    from sql_cdc_spark.queries._cache import session_cached

    return session_cached(
        spark,
        ("winnow_base", sf_dir),
        lambda: TX.winnow_fingerprints(
            tables.load(spark, sf_dir, "documents")
        ),
    )


def winnow_pairs_report(
    docs: DataFrame,
    df_cap: int = WINNOW_DF_CAP,
    topk: int | None = WINNOW_PAIR_TOPK,
    per_doc: DataFrame | None = None,
) -> DataFrame:
    """The pair report over any (doc_id, text) frame — see
    txt_winnow_pairs (fixture-testable form). ``topk=None`` returns the
    FULL unordered pair table (census use — a global sort + huge-k
    TakeOrdered would be pure waste when the caller filters anyway).
    ``per_doc`` optionally supplies a pre-built (doc_id, fp) fingerprint
    frame (the registry path passes the session-cached one)."""
    if per_doc is None:
        per_doc = TX.winnow_fingerprints(docs)
    df = per_doc.groupBy("fp").agg(F.count(F.lit(1)).alias("__nd"))
    keep = df.filter(
        (F.col("__nd") >= 2) & (F.col("__nd") <= df_cap)
    ).select("fp")
    postings = per_doc.join(keep.hint("shuffle_hash"), "fp")
    pairs = (
        postings.select("fp", F.col("doc_id").alias("doc_a"))
        .join(
            postings.select("fp", F.col("doc_id").alias("doc_b")).hint(
                "shuffle_hash"
            ),
            "fp",
        )
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    pc = per_doc.groupBy("doc_id").agg(F.count(F.lit(1)).alias("__nfp"))
    report = (
        pairs.join(
            pc.select(F.col("doc_id").alias("doc_a"), F.col("__nfp").alias("n_a"))
            .hint("shuffle_hash"),
            "doc_a",
        )
        .join(
            pc.select(F.col("doc_id").alias("doc_b"), F.col("__nfp").alias("n_b"))
            .hint("shuffle_hash"),
            "doc_b",
        )
        .select(
            "doc_a",
            "doc_b",
            "n_shared",
            "n_a",
            "n_b",
            F.expr("1000 * n_shared div least(n_a, n_b)").alias(
                "overlap_permille"
            ),
        )
    )
    if topk is None:
        return report
    return report.orderBy(
        F.desc("n_shared"), F.asc("doc_a"), F.asc("doc_b")
    ).limit(topk)


# shares the winnow CTE chain (w/g/hs/f) with _WINNOW_SQL via the named
# prefix constant — both built from the same constants, cannot drift
_WINNOW_PAIRS_SQL = f"""
{_WINNOW_PREFIX_SQL}
, keep AS (
  SELECT fp FROM f GROUP BY fp
  HAVING COUNT(*) BETWEEN 2 AND {WINNOW_DF_CAP}
),
p AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_shared
  FROM f a JOIN keep USING (fp) JOIN f b USING (fp)
  WHERE a.doc_id < b.doc_id
  GROUP BY 1, 2
),
pc AS (SELECT doc_id, COUNT(*) AS nfp FROM f GROUP BY doc_id)
SELECT p.doc_a, p.doc_b, p.n_shared, ca.nfp AS n_a, cb.nfp AS n_b,
       1000 * p.n_shared // LEAST(ca.nfp, cb.nfp) AS overlap_permille
FROM p
JOIN pc ca ON ca.doc_id = p.doc_a
JOIN pc cb ON cb.doc_id = p.doc_b
ORDER BY n_shared DESC, doc_a ASC, doc_b ASC
LIMIT {WINNOW_PAIR_TOPK}
"""


TOP_BIGRAMS = 20


def txt_bigram_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide bigram vocabulary top-k — the distributed n-gram
    counting pass tokenizer training starts from. zip_with over two
    shifted slices builds per-doc bigram arrays scan-side (no join, no
    UDF), explode + groupBy counts with map-side partial aggregation,
    and the bounded top-k compiles to TakeOrderedAndProject — no global
    sort of the vocabulary. ORDER is total (count desc, bigram asc) so
    limit() is deterministic. At 100 TB the only exchange is the
    count groupBy, hash-partitioned on bigram."""
    docs = tables.load(spark, sf_dir, "documents")
    w = TX.normalize_words(F.col("text"))
    bigrams = F.zip_with(
        F.slice(w, 1, F.size(w) - 1),
        F.slice(w, 2, F.size(w) - 1),
        lambda a, b: F.concat_ws(" ", a, b),
    )
    return (
        docs.select(F.explode(bigrams).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
        .orderBy(F.col("n_occurrences").desc(), "bigram")
        .limit(TOP_BIGRAMS)
    )


_BIGRAM_SQL = rf"""
WITH d AS (SELECT string_split({_NORM_SQL}, ' ') AS ws FROM documents),
b AS (
  SELECT ws[i] || ' ' || ws[i + 1] AS bigram
  FROM d, UNNEST(generate_series(1, len(ws) - 1)) AS t(i)
)
SELECT bigram, COUNT(*) AS n_occurrences
FROM b GROUP BY bigram
ORDER BY n_occurrences DESC, bigram
LIMIT {TOP_BIGRAMS}
"""


TOP_VOCAB = 50


def txt_doc_frequency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary document-frequency table with IDF — the corpus statistic
    behind TF-IDF weighting and stopword discovery. Distinct (doc, word)
    pairs → per-word document counts → idf = ln(n_docs / df), where both
    inputs are exact integers so the one double op is identical
    cross-engine. Top-k by (df desc, word asc) is total-ordered and
    compiles to TakeOrderedAndProject; the only full exchange is the
    word groupBy, map-side combined."""
    docs = tables.load(spark, sf_dir, "documents")
    totals = docs.agg(F.count(F.lit(1)).alias("__n_docs"))
    pairs = docs.select(
        "doc_id", F.explode(TX.normalize_words(F.col("text"))).alias("word")
    ).distinct()
    return (
        pairs.groupBy("word")
        .agg(F.count(F.lit(1)).alias("df"))
        .crossJoin(F.broadcast(totals))
        .select(
            "word",
            "df",
            F.round(
                -F.log(F.col("df").cast("double"))
                + F.log(F.col("__n_docs").cast("double")),
                6,
            ).alias("idf"),
        )
        .orderBy(F.col("df").desc(), "word")
        .limit(TOP_VOCAB)
    )


_DOC_FREQ_SQL = rf"""
WITH pairs AS (
  SELECT DISTINCT doc_id, unnest(string_split({_NORM_SQL}, ' ')) AS word
  FROM documents
),
dfreq AS (SELECT word, COUNT(*) AS df FROM pairs GROUP BY word),
tot AS (SELECT COUNT(*) AS n_docs FROM documents)
SELECT d.word, d.df,
       ROUND(-ln(CAST(d.df AS DOUBLE)) + ln(CAST(t.n_docs AS DOUBLE)), 6) AS idf
FROM dfreq d CROSS JOIN tot t
ORDER BY d.df DESC, d.word
LIMIT {TOP_VOCAB}
"""


# PII regexes — deliberately restricted to syntax Java regex and RE2
# interpret identically (char classes, +/{m,}, escaped literals)
_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PHONE_RE = r"\+1-555-[0-9]{4}"


def txt_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrub — the redaction pass every training-data pipeline runs
    before anything else. The synthetic corpus carries no PII, so each
    document is first salted with a deterministic email + phone derived
    from doc_id (making the gate exercise real matches, not
    empty-vs-empty), then both patterns are counted and replaced
    scan-side with built-in regexp functions. Emits the redacted text's
    md5 so the oracle verifies the exact output bytes, not just counts."""
    docs = tables.load(spark, sf_dir, "documents")
    salted = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com or +1-555-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
    )
    redacted = F.regexp_replace(
        F.regexp_replace(salted, _EMAIL_RE, "[EMAIL]"), _PHONE_RE, "[PHONE]"
    )
    return docs.select(
        "doc_id",
        F.regexp_count(salted, F.lit(_EMAIL_RE)).alias("n_emails"),
        F.regexp_count(salted, F.lit(_PHONE_RE)).alias("n_phones"),
        F.md5(redacted).alias("redacted_fp"),
        F.length(redacted).alias("redacted_len"),
    ).orderBy("doc_id")


_PII_SQL = rf"""
WITH s AS (
  SELECT doc_id,
         text || ' contact user' || CAST(doc_id AS VARCHAR)
              || '@example.com or +1-555-'
              || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS salted
  FROM documents
),
r AS (
  SELECT doc_id, salted,
         regexp_replace(regexp_replace(salted, '{_EMAIL_RE}', '[EMAIL]', 'g'),
                        '{_PHONE_RE}', '[PHONE]', 'g') AS redacted
  FROM s
)
SELECT doc_id,
       CAST(len(regexp_extract_all(salted, '{_EMAIL_RE}')) AS INTEGER) AS n_emails,
       CAST(len(regexp_extract_all(salted, '{_PHONE_RE}')) AS INTEGER) AS n_phones,
       md5(redacted) AS redacted_fp,
       CAST(length(redacted) AS INTEGER) AS redacted_len,
FROM r
ORDER BY doc_id
"""


def txt_quality_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language EXACT-median quality gate — the "keep docs at or
    above their language's median quality" filter stage, computed the
    way it must be at 100 TB: never a per-language sort of the corpus.
    The score is quantized to integer micro-units scan-side, the corpus
    collapses to a (lang, score) value-histogram in ONE map-side-combined
    shuffle, and the median comes from a running sum over that compact
    histogram (a window over |langs|x|distinct scores| rows, not docs).
    Because the cumulative count is monotone in score, "cum has reached
    half" is exactly "score >= median", so the kept-count falls out of
    the same pass with no join-back.

    All comparisons are bigint (quantized micro-units), so the lower
    median and tie handling are bit-identical on any engine.

    Registry status: oracle-parity-gated in pytest this round; registered
    in the round-5 driver window."""
    docs = tables.load(spark, sf_dir, "documents")
    q_u = F.round(TX.quality_score(F.col("text")) * 1e6).cast("long")
    hist = (
        docs.select("lang", q_u.alias("q_u"))
        .groupBy("lang", "q_u")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    # median derivation shared with the streaming maintained state —
    # one rule, two histograms (functions/text.py::quality_gate_from_hist)
    return TX.quality_gate_from_hist(hist)


# windowed SUM over integers is HUGEINT in DuckDB — cast (tpch_q12 lesson);
# 2*cum >= tot is the ceil(n/2) rank = discrete lower median on both sides
_QUALITY_GATE_SQL = rf"""
WITH hist AS (
  SELECT lang, CAST(ROUND({_QUALITY_EXPR_SQL} * 1e6, 0) AS BIGINT) AS q_u,
         COUNT(*) AS cnt
  FROM documents GROUP BY 1, 2
),
cum AS (
  SELECT lang, q_u, cnt,
         CAST(SUM(cnt) OVER (PARTITION BY lang ORDER BY q_u
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum,
         CAST(SUM(cnt) OVER (PARTITION BY lang) AS BIGINT) AS tot
  FROM hist
)
SELECT lang, CAST(SUM(cnt) AS BIGINT) AS n_docs,
       MIN(CASE WHEN 2 * cum >= tot THEN q_u END) AS median_micro,
       CAST(SUM(CASE WHEN 2 * cum >= tot THEN cnt ELSE 0 END) AS BIGINT) AS n_kept
FROM cum GROUP BY lang ORDER BY lang
"""


# BM25 constants, shared by the Spark plan and the oracle. k1 = 6/5 and
# b = 3/4 as exact rationals; the query is a fixed term set so the whole
# operator is SQL-expressible (per-term df + one tf census).
BM25_QUERY = ("dup", "slow", "spark")
BM25_TOPK = 10


def txt_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Integer-exact BM25 lexical search over the documents table — the
    retrieval primitive a RAG/corpus engine pairs with the ANN family
    (sparse + dense hybrid search). Scores the fixed query term set
    BM25_QUERY with k1=6/5, b=3/4 cleared of all floating point:

    - saturation term: tf·(k1+1) / (tf + k1·(1−b + b·dl/avgdl))
      multiplied out over 20·A (A = 1000·total_tokens div N, the
      milli-scaled average doc length) to the all-integer
      (44000·tf·A) div (20·tf·A + 6·A + 18000·dl) — per-mille units.
      Clearing over A instead of total keeps every product under
      44000·tf_max·A_max ≈ 4.4e18 < 2^63 even at corpus scale, where
      clearing over total_tokens (~1e13 at 100 TB) would overflow.
    - idf surrogate: floor(log2(2(N−df)+1)) − floor(log2(2df+1)),
      FLOORED AT 1 — the bin-length trick crp_ngram_lm_score proved
      out (length(bin(x))−1 on both engines), monotone in the classic
      (N−df+0.5)/(df+0.5) odds ratio. The floor (where classic BM25
      lets idf go to ~0) keeps a matched common term worth at least
      its saturation weight: on corpora whose query terms are frequent
      the classic weight degenerates to an all-zero report, and a
      search operator that returns ties-by-id is vacuous. Rare terms
      still dominate (their bits dwarf the floor).

    score_milli = Σ_terms idf_bits · sat_milli: pure bigint algebra, so
    the ranking hashes identically on any engine. Top-k with doc_id
    tiebreak plans as TakeOrderedAndProject.

    Scale shape: one token explode filtered to the query terms AT THE
    SCAN (|hits| ≪ corpus), one (doc, term) count, a |terms|-row df
    aggregate and a one-row corpus census both broadcast back, one
    per-doc sum, per-partition top-k heaps. The corpus is scanned twice
    (census + hits) and never shuffled whole."""
    return bm25_search(
        tables.load(spark, sf_dir, "documents"), BM25_QUERY, k=BM25_TOPK
    )


def bm25_search(docs: DataFrame, terms, k: int = 10) -> DataFrame:
    """Parameterized BM25 search over any (doc_id, text) frame — see
    txt_bm25_search. ``terms``/``k`` are the fuzz dimensions (family 10
    re-derives this with arbitrary term sets against a parameterized
    DuckDB twin); scoring is functions/text.py::bm25_rank, the ONE
    derivation shared with the maintained search index."""
    # materialize the normalization ONCE and derive dl from the result:
    # projecting F.size(words) and words side-by-side evaluates the
    # regex split twice per row, and at corpus scale the normalization
    # regex is the scan's dominant cost (VERDICT r5 #6). The two-step
    # Project survives CollapseProject because `w` is non-cheap and
    # referenced twice — pinned by test_bm25_plan_single_normalization.
    words = TX.normalize_words(F.col("text"))
    base = docs.select("doc_id", words.alias("w")).select(
        "doc_id", F.size(F.col("w")).alias("dl"), "w"
    )
    census = base.agg(
        F.count(F.lit(1)).alias("N"),
        F.sum("dl").cast("long").alias("total"),
    ).select("N", "total", F.expr("1000 * total div N").alias("A"))
    hits = (
        base.select("doc_id", "dl", F.explode("w").alias("term"))
        .filter(F.col("term").isin(*terms))
    )
    tf = hits.groupBy("doc_id", "dl", "term").agg(
        F.count(F.lit(1)).alias("tf")
    )
    return TX.bm25_rank(tf, census, k=k)


def _bm25_sql(terms=BM25_QUERY, k: int = BM25_TOPK) -> str:
    terms = ", ".join(f"'{t}'" for t in terms)
    return rf"""
WITH base AS (
  SELECT doc_id,
         len(string_split_regex({_NORM_SQL}, '\s+')) AS dl,
         string_split_regex({_NORM_SQL}, '\s+') AS w
  FROM documents
),
census AS (
  SELECT COUNT(*) AS N, CAST(SUM(dl) AS BIGINT) AS total,
         1000 * CAST(SUM(dl) AS BIGINT) // COUNT(*) AS A
  FROM base
),
tf AS (
  SELECT doc_id, dl, term, COUNT(*) AS tf
  FROM (SELECT doc_id, dl, unnest(w) AS term FROM base)
  WHERE term IN ({terms})
  GROUP BY 1, 2, 3
),
dfc AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
scored AS (
  SELECT tf.doc_id,
         GREATEST(1, (length(bin(2 * (c.N - dfc.df) + 1)) - 1)
                    - (length(bin(2 * dfc.df + 1)) - 1)) AS idf_bits,
         (44000 * tf.tf * c.A) // (20 * tf.tf * c.A + 6 * c.A + 18000 * tf.dl)
           AS sat_milli
  FROM tf JOIN dfc USING (term) CROSS JOIN census c
)
SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_terms,
       CAST(SUM(idf_bits * sat_milli) AS BIGINT) AS score_milli
FROM scored GROUP BY doc_id
ORDER BY score_milli DESC, doc_id ASC
LIMIT {k}
"""


# BPE merge-candidate census: adjacent sub-token pair frequencies — the
# counting step of one byte-pair-encoding merge round, at corpus scale.
BPE_PAIR_TOPK = 20


def txt_bpe_pair_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top merge candidates for one BPE round: frequencies of ADJACENT
    sub-token pairs over the corpus (the argmax of this census IS the
    next BPE merge). Sub-tokens come from the same pre-tokenization
    regex as txt_bpe_tokens; pairs are formed in-row with a positional
    transform (no self-join), so the only shuffle is the pair groupBy —
    map-side combined, the vocabulary-induction shape that holds at
    100 TB. Top-k with (left, right) tiebreak so the report is total-
    ordered on any engine."""
    docs = tables.load(spark, sf_dir, "documents")
    toks = TX.bpe_tokens(F.col("text"))
    pairs = F.expr(
        "transform(slice(__t, 1, greatest(size(__t) - 1, 0)), "
        "(x, i) -> struct(x AS left, element_at(__t, i + 2) AS right))"
    )
    return (
        docs.select(toks.alias("__t"))
        .select(F.explode(pairs).alias("p"))
        .select("p.left", "p.right")
        .groupBy("left", "right")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("left").asc(), F.col("right").asc())
        .limit(BPE_PAIR_TOPK)
    )


_BPE_PAIR_SQL = rf"""
WITH toks AS (
  SELECT regexp_extract_all(lower(text), '{TX.BPE_RE}') AS t FROM documents
),
pairs AS (
  SELECT t[i] AS "left", t[i + 1] AS "right"
  FROM toks, unnest(range(1, len(t))) AS u(i)
  WHERE len(t) >= 2
)
SELECT "left", "right", COUNT(*) AS n
FROM pairs GROUP BY 1, 2
ORDER BY n DESC, "left" ASC, "right" ASC
LIMIT {BPE_PAIR_TOPK}
"""


# ---- TF-IDF keyword extraction (round 6) ---------------------------------
TFIDF_TOPK = 3  # terms kept per document


def txt_tfidf_topterms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF keyword extraction: each document's top terms by an
    integer tf·idf surrogate — the per-document companion to the
    corpus-level txt_doc_frequency report (tagging, routing, index
    enrichment). idf uses the same bin-length log2 surrogate as BM25
    (length(bin(2(N−df)+1)) − length(bin(2df+1))) but UNFLOORED: a term
    in more than half the corpus scores negative, which is exactly the
    suppression keyword extraction wants (BM25's floor exists so a
    *matched query term* never counts for nothing — a different
    contract). score = tf · idf_bits, all bigint, so the per-doc
    (score desc, term asc) ranking hashes identically on any engine.

    Scale shape: token explode → (doc, term) count (the posting
    shuffle), a term-keyed df aggregate re-joined to the postings with
    a pinned shuffle-hash (the vocabulary is corpus-scale and
    integer-dense — the documented broadcast-abort band), a one-row
    census broadcast, and a per-doc ranking window (partitioned by
    doc_id — bounded by per-doc vocabulary). Honest cost note: the tf
    subtree feeds BOTH join sides and Spark shares no subtrees across
    them, so the one-shot plan tokenizes the corpus twice (same
    documented trade as bm25_search / crp_ngram_lm_score); the
    repeated-use path is the materialized postings table
    search_maintenance keeps current (topterms_from_index serves this
    exact report from the maintained index with zero corpus re-scan).
    Scoring is functions/text.py::tfidf_rank — the ONE derivation both
    surfaces share."""
    return tfidf_topterms(
        tables.load(spark, sf_dir, "documents"), k=TFIDF_TOPK
    )


def tfidf_topterms(docs: DataFrame, k: int = 3) -> DataFrame:
    """Parameterized TF-IDF keyword extraction over any (doc_id, text)
    frame — see txt_tfidf_topterms. Builds the postings and the one-row
    census, then ranks through the shared
    functions/text.py::tfidf_rank (which also drops empty-string tokens
    so the batch and index-served surfaces agree on empty documents)."""
    words = TX.normalize_words(F.col("text"))
    postings = (
        docs.select("doc_id", F.explode(words).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    census = docs.agg(F.count(F.lit(1)).alias("N"))
    return TX.tfidf_rank(postings, census, k=k)


_TFIDF_SQL = rf"""
WITH base AS (
  SELECT doc_id, string_split_regex({_NORM_SQL}, '\s+') AS w FROM documents
),
tf AS (
  SELECT doc_id, term, COUNT(*) AS tf
  FROM (SELECT doc_id, unnest(w) AS term FROM base)
  WHERE term <> '' GROUP BY 1, 2
),
dfreq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
census AS (SELECT COUNT(*) AS N FROM documents),
scored AS (
  SELECT tf.doc_id, tf.term, tf.tf, dfreq.df,
         tf.tf * CAST((length(bin(2 * (c.N - dfreq.df) + 1)) - 1)
                    - (length(bin(2 * dfreq.df + 1)) - 1) AS BIGINT)
           AS score_bits
  FROM tf JOIN dfreq USING (term) CROSS JOIN census c
),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
             ORDER BY score_bits DESC, term ASC) AS rk
  FROM scored
)
SELECT doc_id, CAST(rk AS INTEGER) AS rk, term, tf, df, score_bits
FROM ranked WHERE rk <= {TFIDF_TOPK}
ORDER BY doc_id, rk
"""


# ---- n-gram novelty / decontamination census (round 6) -------------------
# probe split: every doc_id ≡ 0 (mod NOVELTY_MOD) is scored against the
# reference trigram set built from all OTHER docs
NOVELTY_MOD = 10


def txt_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document n-gram novelty — the decontamination/memorization
    census: for each probe document (doc_id ≡ 0 mod NOVELTY_MOD), the
    share of its distinct word trigrams that appear NOWHERE in the
    reference corpus (all other docs). Low novelty = the doc is largely
    stitched from corpus text (leakage / near-copy); high = genuinely
    new. novelty is integer ppm so the report hashes identically on
    any engine.

    Scale shape: trigrams are formed IN-ROW (positional transform, no
    self-join), one distinct over (doc, trigram), and the probe side —
    a fixed 1/NOVELTY_MOD sample — anti-joins the reference trigram
    set on the trigram key with a pinned shuffle-hash (the reference
    set is corpus-scale and must never be broadcast). Cost is posting-
    shaped end to end; documents are never paired."""
    docs = tables.load(spark, sf_dir, "documents")
    toks = TX.normalize_words(F.col("text"))
    tri = F.expr(
        "transform(slice(__t, 1, greatest(size(__t) - 2, 0)), "
        "(x, i) -> concat_ws(' ', x, element_at(__t, i + 2), "
        "element_at(__t, i + 3)))"
    )
    dtri = (
        docs.select("doc_id", toks.alias("__t"))
        .select("doc_id", F.explode(F.array_distinct(tri)).alias("tri"))
    )
    probe = dtri.filter(F.col("doc_id") % NOVELTY_MOD == 0)
    ref = (
        dtri.filter(F.col("doc_id") % NOVELTY_MOD != 0)
        .select("tri")
        .distinct()
    )
    novel = (
        probe.join(ref.hint("shuffle_hash"), "tri", "left_anti")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_novel"))
    )
    base = probe.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_tri"))
    return (
        base.join(novel, "doc_id", "left")
        .select(
            "doc_id",
            "n_tri",
            F.coalesce("n_novel", F.lit(0).cast("long")).alias("n_novel"),
        )
        .select(
            "doc_id",
            "n_tri",
            "n_novel",
            F.expr("1000000 * n_novel div n_tri").alias("novelty_ppm"),
        )
        .orderBy("doc_id")
    )


_NOVELTY_SQL = rf"""
WITH toks AS (
  SELECT doc_id, string_split_regex({_NORM_SQL}, '\s+') AS t FROM documents
),
dtri AS (
  SELECT DISTINCT doc_id, t[i] || ' ' || t[i + 1] || ' ' || t[i + 2] AS tri
  FROM toks, unnest(range(1, len(t) - 1)) AS u(i)
  WHERE len(t) >= 3
),
probe AS (SELECT * FROM dtri WHERE doc_id % {NOVELTY_MOD} = 0),
ref AS (SELECT DISTINCT tri FROM dtri WHERE doc_id % {NOVELTY_MOD} <> 0),
novel AS (
  SELECT p.doc_id, COUNT(*) AS n_novel
  FROM probe p ANTI JOIN ref r ON p.tri = r.tri
  GROUP BY 1
),
base AS (SELECT doc_id, COUNT(*) AS n_tri FROM probe GROUP BY 1)
SELECT b.doc_id, b.n_tri,
       CAST(COALESCE(n.n_novel, 0) AS BIGINT) AS n_novel,
       1000000 * CAST(COALESCE(n.n_novel, 0) AS BIGINT) // b.n_tri
         AS novelty_ppm
FROM base b LEFT JOIN novel n ON b.doc_id = n.doc_id
ORDER BY b.doc_id
"""


# ---- PMI collocation mining (round 6) --------------------------------------
PMI_MIN_SUPPORT = 20  # min bigram occurrences before a lift is trusted
PMI_TOPK = 30


def txt_pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collocation mining by pointwise mutual information — the corpus
    statistic behind multi-word-expression discovery and tokenizer
    merge pre-scoring (Church & Hanks 1990). Lift = P(x,y) /
    (P(x·)·P(·y)) over bigram-slot marginals, kept integer-exact as a
    staged floor ratio with ADAPTIVE resolution (ADVICE r6): the common
    case stages at ppm — ((n_xy·1e6) div n_x)·N div n_y — but when
    n_x > n_xy·1e3 (a very frequent left word over a rare pair, where
    the ppm stage would keep < 3 significant digits and floor to 0 past
    n_x > n_xy·1e6) the first stage runs at ppb and the trailing
    div 1000 restores the ppm unit. Overflow budget, both branches: the
    first stage is ≤ 1e6 (low branch: n_xy ≤ n_x; high branch:
    n_x > n_xy·1e3 caps n_xy·1e9 div n_x below 1e6), so stage·N is safe
    while Σ bigrams < 2^63/1e6 ≈ 9.2e12 (≈ a 10 PB text corpus at this
    doc shape); n_xy·1e9 itself is safe because the high branch implies
    n_xy < n_x/1e3 ≤ N/1e3 < 9.2e9. Residual resolution floor: a pair
    collapses to lift 0 only when n_x > n_xy·1e9 — 1000× beyond the old
    ppm-stage floor, and at that frequency ratio the true lift is below
    N/(n_y·1e3) ppm, sub-top-k whenever the right word carries ≥ 1e-3
    of bigram mass. Both engines evaluate the SAME staged CASE, so
    floor compounding cannot diverge.

    Scale shape: ONE corpus explode → (left, right) pair groupBy
    (map-side combined — the only corpus-wide exchange); both marginals
    and the 1-row total derive from the PAIR table (vocab²-bounded, ≪
    corpus), so the corpus is tokenized and shuffled exactly once. The
    marginal joins pin shuffle-hash (vocab tables are the documented
    integer-dense broadcast-abort band at 100 TB); the support filter
    cuts the pair table before any join; top-k is TakeOrdered over the
    (lift desc, left, right) total order."""
    return pmi_collocations(tables.load(spark, sf_dir, "documents"))


def pmi_collocations(
    docs: DataFrame,
    min_support: int = PMI_MIN_SUPPORT,
    topk: int = PMI_TOPK,
) -> DataFrame:
    """The PMI core over any (text) frame — parameterized for the
    family-14 fuzz so the registered constants and the fuzzed space run
    the SAME expressions."""
    w = TX.normalize_words(F.col("text"))
    pairs = (
        docs.select(
            F.explode(
                F.zip_with(
                    F.slice(w, 1, F.size(w) - 1),
                    F.slice(w, 2, F.size(w) - 1),
                    lambda a, b: F.struct(a.alias("left_w"), b.alias("right_w")),
                )
            ).alias("bg")
        )
        .select("bg.left_w", "bg.right_w")
        .groupBy("left_w", "right_w")
        .agg(F.count(F.lit(1)).alias("n_xy"))
    )
    lm = pairs.groupBy("left_w").agg(F.sum("n_xy").alias("n_x"))
    rm = pairs.groupBy("right_w").agg(F.sum("n_xy").alias("n_y"))
    tot = pairs.agg(F.sum("n_xy").alias("n_bi"))
    return (
        pairs.filter(F.col("n_xy") >= min_support)
        .join(lm.hint("shuffle_hash"), "left_w")
        .join(rm.hint("shuffle_hash"), "right_w")
        .crossJoin(F.broadcast(tot))
        .select(
            "left_w",
            "right_w",
            "n_xy",
            "n_x",
            "n_y",
            F.expr(
                "CASE WHEN n_x > n_xy * 1000"
                " THEN ((n_xy * 1000000000) div n_x) * n_bi div n_y div 1000"
                " ELSE ((n_xy * 1000000) div n_x) * n_bi div n_y END"
            ).alias("lift_ppm"),
        )
        .orderBy(F.desc("lift_ppm"), "left_w", "right_w")
        .limit(topk)
    )


def _pmi_sql(
    min_support: int = PMI_MIN_SUPPORT,
    topk: int = PMI_TOPK,
    docs_rel: str = "documents",
) -> str:
    return rf"""
WITH d AS (SELECT string_split({_NORM_SQL}, ' ') AS ws FROM {docs_rel}),
bg AS (
  SELECT ws[i] AS left_w, ws[i + 1] AS right_w
  FROM d, UNNEST(generate_series(1, len(ws) - 1)) AS t(i)
),
pc AS (SELECT left_w, right_w, COUNT(*) AS n_xy FROM bg GROUP BY 1, 2),
lm AS (SELECT left_w, CAST(SUM(n_xy) AS BIGINT) AS n_x FROM pc GROUP BY 1),
rm AS (SELECT right_w, CAST(SUM(n_xy) AS BIGINT) AS n_y FROM pc GROUP BY 1),
tot AS (SELECT CAST(SUM(n_xy) AS BIGINT) AS n_bi FROM pc)
SELECT p.left_w, p.right_w, p.n_xy, l.n_x, r.n_y,
       CAST(CASE WHEN l.n_x > p.n_xy * 1000
            THEN ((p.n_xy * 1000000000) // l.n_x) * t.n_bi // r.n_y // 1000
            ELSE ((p.n_xy * 1000000) // l.n_x) * t.n_bi // r.n_y
            END AS BIGINT) AS lift_ppm
FROM pc p
JOIN lm l USING (left_w)
JOIN rm r USING (right_w)
CROSS JOIN tot t
WHERE p.n_xy >= {min_support}
ORDER BY lift_ppm DESC, left_w, right_w
LIMIT {topk}
"""


_PMI_SQL = _pmi_sql()


# ---- duplicated-passage census (round 6) ------------------------------------
PASSAGE_WORDS = 8  # disjoint chunk width, words


def txt_dup_passage_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source duplicated-passage census — the chunked approximation
    of exact-substring dedup (Lee et al. 2021, arXiv:2107.06499):
    tile every document into disjoint PASSAGE_WORDS-word passages, count
    each passage string across the corpus, and report per source how
    much of its text is corpus-duplicated passage mass (integer ppm).
    The suffix-array substring dedup this approximates needs a global
    sort; the chunked form is ONE explode + ONE passage groupBy + one
    counts join — every stage embarrassingly parallel.

    Scale shape: passages shuffle once (the count groupBy, map-side
    combined); the instance⨝counts join pins shuffle-hash — BOTH sides
    are corpus-scale (the documented pair-table broadcast-abort band).
    The per-source rollup is a |sources|-row aggregate. Dup mass is
    instance-counted (a passage occurring k times contributes k), so
    the ppm reads as 'share of passages a dedup pass would touch'."""
    return passage_census(tables.load(spark, sf_dir, "documents"))


def passage_census(docs: DataFrame, width: int = PASSAGE_WORDS) -> DataFrame:
    """The census core over any (source, text) frame — shared by the
    registered query, the bench 10× stress block, and the width-fuzzed
    family-13 tests so the measured scenarios can never drift apart.
    Tiling comes from the ONE shared TX.passage_chunks expression
    (sub-width docs tile to zero passages — the unguarded form emitted
    two phantom tiles via Spark's descending sequence(0, -1), diverging
    from the oracle)."""
    w = TX.normalize_words(F.col("text"))
    inst = docs.select(
        "source",
        F.explode(TX.passage_chunks(w, width)).alias("passage"),
    )
    counts = inst.groupBy("passage").agg(F.count(F.lit(1)).alias("n_occ"))
    return (
        inst.join(counts.hint("shuffle_hash"), "passage")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_passages"),
            F.sum((F.col("n_occ") > 1).cast("long")).alias("n_dup_passages"),
        )
        .select(
            "source",
            "n_passages",
            "n_dup_passages",
            F.expr("(n_dup_passages * 1000000) div n_passages").alias(
                "dup_ppm"
            ),
        )
        .orderBy("source")
    )


def _dup_passage_sql(width: int, docs_rel: str = "documents") -> str:
    """Oracle twin generated from the SAME width constant as the Spark
    core (also parameterized for the family-13 width fuzz)."""
    return rf"""
WITH d AS (
  SELECT source, string_split({_NORM_SQL}, ' ') AS ws FROM {docs_rel}
),
inst AS (
  SELECT source,
         array_to_string(
           list_slice(ws, i * {width} + 1, (i + 1) * {width}),
           ' ') AS passage
  FROM d, UNNEST(generate_series(0, len(ws) // {width} - 1)) AS t(i)
),
counts AS (SELECT passage, COUNT(*) AS n_occ FROM inst GROUP BY 1)
SELECT i.source,
       COUNT(*) AS n_passages,
       CAST(SUM(CASE WHEN c.n_occ > 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_dup_passages,
       CAST((SUM(CASE WHEN c.n_occ > 1 THEN 1 ELSE 0 END) * 1000000)
            // COUNT(*) AS BIGINT) AS dup_ppm
FROM inst i JOIN counts c USING (passage)
GROUP BY 1
ORDER BY source
"""


_DUP_PASSAGE_SQL = _dup_passage_sql(PASSAGE_WORDS)


QUERIES: dict[str, QueryEntry] = {
    "txt_token_stats": QueryEntry(txt_token_stats, _TOKEN_STATS_SQL),
    "txt_tfidf_topterms": QueryEntry(txt_tfidf_topterms, _TFIDF_SQL),
    "txt_ngram_novelty": QueryEntry(txt_ngram_novelty, _NOVELTY_SQL),
    "txt_bpe_tokens": QueryEntry(txt_bpe_tokens, _BPE_SQL),
    "txt_rolling_fingerprint": QueryEntry(txt_rolling_fingerprint, _ROLLING_SQL),
    "txt_winnow_pairs": QueryEntry(txt_winnow_pairs, _WINNOW_PAIRS_SQL),
    "txt_winnow_fingerprints": QueryEntry(
        txt_winnow_fingerprints, _WINNOW_SQL
    ),
    "txt_quality_score": QueryEntry(txt_quality_score, _QUALITY_SQL),
    "txt_language_id": QueryEntry(txt_language_id, _language_sql()),
    "txt_bigram_topk": QueryEntry(txt_bigram_topk, _BIGRAM_SQL),
    "txt_doc_frequency": QueryEntry(txt_doc_frequency, _DOC_FREQ_SQL),
    "txt_pii_redact": QueryEntry(txt_pii_redact, _PII_SQL),
    "txt_quality_gate": QueryEntry(txt_quality_gate, _QUALITY_GATE_SQL),
    "txt_bm25_search": QueryEntry(txt_bm25_search, _bm25_sql()),
    "txt_bpe_pair_census": QueryEntry(txt_bpe_pair_census, _BPE_PAIR_SQL),
    "txt_pmi_collocations": QueryEntry(txt_pmi_collocations, _PMI_SQL),
    "txt_dup_passage_census": QueryEntry(
        txt_dup_passage_census, _DUP_PASSAGE_SQL
    ),
}
