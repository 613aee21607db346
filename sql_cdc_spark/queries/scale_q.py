"""Scale-hardening queries: skew-salted aggregation and join, gated on
the SAME oracle as their unsalted forms — salting must be invisible in
the result. Aggregates here are chosen order-insensitive (counts, min/max,
sums of integral doubles) so two-phase re-aggregation cannot drift.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sql_cdc_spark import tables
from sql_cdc_spark.operators import skew
from sql_cdc_spark.queries import QueryEntry


def scl_salted_pricing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase salted aggregation over the maximally-skewed grouping
    (3 return flags × 600k rows → every key is hot). Result must equal the
    plain GROUP BY bit-for-bit."""
    li = tables.load(spark, sf_dir, "lineitem")
    out = skew.salted_agg(
        li,
        keys=["l_returnflag"],
        aggs={
            "sum_qty": ("l_quantity", "sum"),
            "n_rows": ("l_quantity", "count"),
            "max_price": ("l_extendedprice", "max"),
        },
    )
    return out.select(
        "l_returnflag",
        F.round("sum_qty", 2).alias("sum_qty"),
        "n_rows",
        F.round("max_price", 2).alias("max_price"),
    )


_SALTED_PRICING_SQL = """
SELECT l_returnflag,
       ROUND(SUM(l_quantity), 2) AS sum_qty,
       COUNT(*) AS n_rows,
       ROUND(MAX(l_extendedprice), 2) AS max_price
FROM lineitem GROUP BY l_returnflag
"""


def scl_salted_join_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-safe salted join (orders fact ⨝ customer dim on custkey, dim
    replicated across 16 salts) rolled up per market segment — identical
    to the straight join."""
    orders = tables.load(spark, sf_dir, "orders")
    cust = tables.load(spark, sf_dir, "customer").withColumnRenamed(
        "c_custkey", "o_custkey"
    )
    joined = skew.salted_join(orders, cust.select("o_custkey", "c_mktsegment"), "o_custkey")
    return joined.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.max("o_totalprice"), 2).alias("max_order"),
        F.round(F.min("o_totalprice"), 2).alias("min_order"),
    )


_SALTED_JOIN_SQL = """
SELECT c.c_mktsegment,
       COUNT(*) AS n_orders,
       ROUND(MAX(o.o_totalprice), 2) AS max_order,
       ROUND(MIN(o.o_totalprice), 2) AS min_order
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
GROUP BY c.c_mktsegment
"""

def scl_group_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map normalization via applyInPandas: z-score of order
    totals within each order status. The third Pandas API shape (whole
    group per Arrow batch) — appropriate when the per-group computation
    is genuinely vectorized-Python (sklearn scalers, per-group model
    scoring); this z-score has a pure-SQL window twin, which is exactly
    what the oracle uses. Rounded to 4dp: pandas' and the window's
    mean/stddev differ only by float summation order (~1e-11)."""
    import pandas as pd  # noqa: F401

    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    orders = tables.load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    schema = StructType(
        [
            StructField("o_orderkey", LongType()),
            StructField("o_orderstatus", StringType()),
            StructField("zscore", DoubleType()),
        ]
    )

    def norm(pdf):
        m = pdf["o_totalprice"].mean()
        s = pdf["o_totalprice"].std(ddof=1)
        out = pdf[["o_orderkey", "o_orderstatus"]].copy()
        out["zscore"] = ((pdf["o_totalprice"] - m) / s).round(4)
        return out

    return orders.groupBy("o_orderstatus").applyInPandas(norm, schema)


_ZSCORE_SQL = """
SELECT o_orderkey, o_orderstatus,
       ROUND((o_totalprice - AVG(o_totalprice) OVER w)
             / STDDEV_SAMP(o_totalprice) OVER w, 4) AS zscore
FROM orders
WINDOW w AS (PARTITION BY o_orderstatus)
"""

def scl_zorder_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Morton (Z-order) interleave key over (user_id, value-cents) for
    every event (operators/layout.py::zorder_key) — the sort key under
    which write_zordered lays files out so that selective filters on
    EITHER dimension prune parquet footers (pruning itself is measured
    in tests/test_layout.py; this row gate pins the key arithmetic).
    Both engines evaluate the SAME generated shift/mask SQL text, so the
    hash gate is bit-exact, negative cents included (masking first makes
    every shifted operand non-negative)."""
    from sql_cdc_spark.operators.layout import zorder_key_sql

    ev = tables.load(spark, sf_dir, "events")
    cents = "CAST(ROUND(value * 100, 0) AS BIGINT)"
    zsql = zorder_key_sql(["user_id", cents])
    return (
        ev.select("event_id", F.expr(zsql).alias("zkey"))
        .orderBy("event_id")
    )


def _zorder_sql() -> str:
    from sql_cdc_spark.operators.layout import zorder_key_sql

    cents = "CAST(ROUND(value * 100, 0) AS BIGINT)"
    return f"""
SELECT event_id, {zorder_key_sql(["user_id", cents])} AS zkey
FROM events ORDER BY event_id
"""


BLOOM_SEGMENT = "BUILDING"
BLOOM_BALANCE_MIN = 9000.0


def scl_bloom_pruned_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Runtime Bloom semi-join reduction (functions/sketches.py::
    bloom_bitmap/bloom_probe): the selective customer dim (one segment,
    high balance) builds an 8 KiB bitmap; the orders fact is filtered by
    the scan-local probe BEFORE the join, so at 100 TB most fact rows
    die at the scan instead of crossing the exchange — Spark's own
    runtime-filter rewrite, expressed as a first-class operator for
    engines/plans where the optimizer doesn't inject it. False positives
    are removed by the join itself, so the result — and the oracle — is
    EXACTLY the plain join."""
    from sql_cdc_spark.functions import sketches as SK

    cust = tables.load(spark, sf_dir, "customer")
    dim = cust.filter(
        (F.col("c_mktsegment") == BLOOM_SEGMENT)
        & (F.col("c_acctbal") > BLOOM_BALANCE_MIN)
    ).select("c_custkey", "c_name")
    bitmap = SK.bloom_bitmap(dim, "c_custkey")
    orders = tables.load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    pruned = orders.filter(SK.bloom_probe(F.col("o_custkey"), bitmap))
    return pruned.join(
        F.broadcast(dim), pruned.o_custkey == dim.c_custkey, "inner"
    ).select("o_orderkey", "o_custkey", "o_totalprice", "c_name")


_BLOOM_JOIN_SQL = f"""
SELECT o.o_orderkey, o.o_custkey, o.o_totalprice, c.c_name
FROM orders o
JOIN customer c ON c.c_custkey = o.o_custkey
WHERE c.c_mktsegment = '{BLOOM_SEGMENT}' AND c.c_acctbal > {BLOOM_BALANCE_MIN}
"""



# ---- join-key skew census (round-6 queue) -------------------------------
# the keys a CDC/analytics deployment actually joins and groups on
SKEW_KEYS = (
    ("lineitem", "l_orderkey"),
    ("orders", "o_custkey"),
    ("events", "user_id"),
)


def scl_skew_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key skew census — the diagnostic read BEFORE choosing a
    salting factor or trusting AQE's skew split: for each tracked join/
    group key, the per-key row-count distribution (exact p50/p90/p99 and
    max) plus the hottest key's corpus share in ppm. Skew is a property
    of the KEY DISTRIBUTION, not the data size, so the report is exact
    at any scale for one shuffle per key:

    corpus → per-key counts (ONE map-side-combined groupBy — the same
    exchange the real join would pay) → count-of-counts (tiny: one row
    per distinct multiplicity) → exact percentiles via a broadcast
    self-join running sum over that tiny table (window-free: a Window
    here would plan the partition-less single-task shape this engine
    bans; the |cc|² pair space is bounded by distinct-multiplicity
    counts, not keys). Percentile rule: smallest multiplicity whose
    cumulative key count reaches ceil(p·K/100), all-bigint
    (100·cum ≥ p·K), engine-identical."""
    out = None
    for table, key in SKEW_KEYS:
        one = _skew_one(spark, sf_dir, table, key)
        out = one if out is None else out.unionByName(one)
    return out.orderBy("rel")


def _skew_one(spark: SparkSession, sf_dir: str, table: str, key: str) -> DataFrame:
    from sql_cdc_spark.queries._cache import session_cached

    rel = f"{table}.{key}"

    def build() -> DataFrame:
        df = tables.load(spark, sf_dir, table)
        per = df.groupBy(F.col(key).alias("k")).agg(F.count(F.lit(1)).alias("c"))
        return per.groupBy("c").agg(F.count(F.lit(1)).alias("nk"))

    # session-cache the count-of-counts: THREE branches read it (census,
    # cum self-join both sides) and Spark shares no subtrees across join
    # sides — without the cache the corpus per-key shuffle would run
    # once per branch. cc is one row per distinct multiplicity
    # (O(sqrt(2N)) worst case, a handful in practice), never corpus-sized.
    # The _cache.session_cached contract bounds pinned storage at one
    # tiny frame per tracked key PER SESSION however often the census is
    # invoked (VERDICT r5 #5: the old per-call persist() accumulated an
    # InMemoryRelation per key per call and never released it).
    cc = session_cached(spark, ("skew_cc", sf_dir, rel), build)
    return _skew_report(cc, rel)


def _skew_report(cc: DataFrame, rel: str) -> DataFrame:
    """The window-free exact-percentile report over a count-of-counts
    frame (c = per-key multiplicity, nk = keys with that multiplicity)
    — the arithmetic core of scl_skew_census, parameterized so the fuzz
    harness (family 11) can drive arbitrary key distributions through
    the SAME derivation the registered census uses."""
    tot = cc.agg(
        F.sum("nk").cast("long").alias("K"),
        F.sum(F.col("c") * F.col("nk")).cast("long").alias("N"),
        F.max("c").cast("long").alias("max_c"),
    )
    a, b = cc.alias("a"), cc.alias("b")
    cum = (
        a.join(F.broadcast(b), F.col("b.c") <= F.col("a.c"))
        .groupBy(F.col("a.c").alias("c"))
        .agg(F.sum("b.nk").cast("long").alias("cum"))
    )
    j = cum.crossJoin(F.broadcast(tot))

    def pct(x: int):
        return F.min(
            F.when(F.lit(100) * F.col("cum") >= F.lit(x) * F.col("K"), F.col("c"))
        ).cast("long")

    return (
        j.groupBy("K", "N", "max_c")
        .agg(pct(50).alias("p50"), pct(90).alias("p90"), pct(99).alias("p99"))
        .select(
            F.lit(rel).alias("rel"),
            F.col("N").alias("n_rows"),
            F.col("K").alias("n_keys"),
            F.col("max_c").alias("max_per_key"),
            "p50",
            "p90",
            "p99",
            F.expr("max_c * 1000000 div N").alias("top_share_ppm"),
        )
    )


def _skew_one_sql(table: str, key: str, rel: str | None = None) -> str:
    rel_label = rel if rel is not None else f"{table}.{key}"
    return f"""
SELECT '{rel_label}' AS rel, t.N AS n_rows, t.K AS n_keys,
       t.max_c AS max_per_key,
       CAST(MIN(CASE WHEN 100 * cum >= 50 * t.K THEN c END) AS BIGINT) AS p50,
       CAST(MIN(CASE WHEN 100 * cum >= 90 * t.K THEN c END) AS BIGINT) AS p90,
       CAST(MIN(CASE WHEN 100 * cum >= 99 * t.K THEN c END) AS BIGINT) AS p99,
       t.max_c * 1000000 // t.N AS top_share_ppm
FROM (
  SELECT a.c, CAST(SUM(b.nk) AS BIGINT) AS cum
  FROM (SELECT c, COUNT(*) AS nk
        FROM (SELECT {key} AS k, COUNT(*) AS c FROM {table} GROUP BY 1)
        GROUP BY c) a
  JOIN (SELECT c, COUNT(*) AS nk
        FROM (SELECT {key} AS k, COUNT(*) AS c FROM {table} GROUP BY 1)
        GROUP BY c) b ON b.c <= a.c
  GROUP BY a.c
) cum, (
  SELECT CAST(SUM(nk) AS BIGINT) AS K,
         CAST(SUM(c * nk) AS BIGINT) AS N,
         CAST(MAX(c) AS BIGINT) AS max_c
  FROM (SELECT c, COUNT(*) AS nk
        FROM (SELECT {key} AS k, COUNT(*) AS c FROM {table} GROUP BY 1)
        GROUP BY c)
) t
GROUP BY t.N, t.K, t.max_c
"""


def _skew_census_sql() -> str:
    parts = " UNION ALL ".join(
        f"({_skew_one_sql(t, k)})" for t, k in SKEW_KEYS
    )
    return f"SELECT * FROM ({parts}) ORDER BY rel"


# ---- small-file compaction planner (round 6) ----------------------------
# target output-object size in chars (the doc corpus's byte surrogate);
# real deployments feed file-listing stats through the same plan
COMPACTION_TARGET_CHARS = 50_000


def scl_compaction_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction plan — the lakehouse maintenance read that
    decides which input objects coalesce into which output file. Inputs
    (here: documents standing in for file-listing rows, n_chars for
    bytes) are binned per source in deterministic doc_id order by an
    offset-begin rule: a file starts the bin its cumulative START
    offset falls in (bin = (cum − n_chars) div target), so bins are
    contiguous, every input lands in exactly one bin, and membership is
    pure integer arithmetic — identical on any engine.

    Scale shape: ONE per-source partitioned window for the running sum
    (a source's listing fits a partition by construction — at 100 TB
    the partition key would be (source, date-prefix) exactly like the
    real listing), then one (source, bin) aggregate. No corpus
    self-join, no global sort; the final orderBy is presentation on
    |bins| rows."""
    from pyspark.sql import Window

    docs = tables.load(spark, sf_dir, "documents")
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    binned = docs.select(
        "source",
        "doc_id",
        "n_chars",
        (F.sum("n_chars").over(w) - F.col("n_chars")).alias("start_off"),
    ).select(
        "source",
        "doc_id",
        "n_chars",
        F.expr(f"start_off div {COMPACTION_TARGET_CHARS}").alias("bin"),
    )
    return (
        binned.groupBy("source", "bin")
        .agg(
            F.count(F.lit(1)).alias("n_files"),
            F.sum("n_chars").cast("long").alias("bin_chars"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        )
        .orderBy("source", "bin")
    )


_COMPACTION_SQL = f"""
WITH binned AS (
  SELECT source, doc_id, n_chars,
         CAST((SUM(n_chars) OVER (PARTITION BY source ORDER BY doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_chars)
           // {COMPACTION_TARGET_CHARS} AS BIGINT) AS bin
  FROM documents
)
SELECT source, bin, COUNT(*) AS n_files,
       CAST(SUM(n_chars) AS BIGINT) AS bin_chars,
       MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
FROM binned GROUP BY 1, 2
ORDER BY source, bin
"""


# ---- range-partition planner (round 7) -------------------------------------
RANGE_BUCKETS = 8       # planned output partitions
RANGE_SAMPLE_PCT = 5    # deterministic sample rate, percent
RANGE_SALT = "rpp"      # hash salt for the sample draw


def scl_range_partition_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range-partition boundary planner + balance audit — the algorithm
    behind repartitionByRange / sorted-table writes, made a first-class
    query: draw a DETERMINISTIC hash sample of the key column, place
    RANGE_BUCKETS−1 split points at the sample's equal-rank quantiles,
    then census the FULL table against those boundaries and report how
    balanced the planned partitions actually come out (fill_permille =
    1000·n_rows·B / total — 1000 is a perfectly balanced bucket).
    Spark's own RangePartitioner does exactly this with a random
    reservoir sample; the hash draw makes the plan reproducible across
    runs and engines, so the oracle re-derives identical boundaries.

    Scale shape: the sample is a scan-local hash filter (rate is the
    knob — production planners cap it near 1e5 rows); ranking the
    sample is the ONLY sort, bounded by the sample size. Boundaries
    come back as a ≤ B−1-row bounded collect baked into the census plan
    as LITERALS, so bucket assignment over the full table is scan-local
    (a sum of key>bound comparisons) and the census is one B-group
    map-side-combined aggregate. Nothing global-sorts the table —
    that's the point of planning the ranges first."""
    from pyspark.sql import Window

    orders = tables.load(spark, sf_dir, "orders")
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(RANGE_SALT), F.col("o_orderkey").cast("string"))),
            1,
            15,
        ),
        16,
        10,
    ).cast("long")
    sample = orders.filter(h % 100 < RANGE_SAMPLE_PCT).select(
        F.col("o_totalprice").alias("key"), F.col("o_orderkey").alias("id")
    )
    n_s = sample.count()
    ranks = sorted(
        (n_s * b + RANGE_BUCKETS - 1) // RANGE_BUCKETS
        for b in range(1, RANGE_BUCKETS)
    )
    ranked = sample.withColumn(
        "rn", F.row_number().over(Window.orderBy("key", "id"))
    )
    rank_to_key = {
        int(r["rn"]): float(r["key"])
        for r in ranked.filter(F.col("rn").isin(ranks)).collect()
    }
    # duplicate target ranks (tiny samples) keep their multiplicity —
    # the oracle's rank-join derives the same multiset. An EMPTY sample
    # (degenerate/tiny input: every target rank becomes 0, which
    # row_number never emits) degrades to a single bucket with no
    # bounds — exactly what the oracle's empty-bnd CTE produces, so
    # both engines agree instead of Spark raising KeyError (ADVICE r7)
    bounds = [rank_to_key[rk] for rk in ranks] if n_s > 0 else []
    bucket = sum(
        ((F.col("o_totalprice") > F.lit(bd)).cast("int") for bd in bounds),
        start=F.lit(0),
    )
    total = orders.agg(F.count(F.lit(1)).alias("total_rows"))
    return (
        orders.select(bucket.cast("long").alias("bucket_id"), "o_totalprice")
        .groupBy("bucket_id")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.round(F.min("o_totalprice"), 2).alias("min_key"),
            F.round(F.max("o_totalprice"), 2).alias("max_key"),
        )
        .crossJoin(F.broadcast(total))
        .select(
            "bucket_id",
            "n_rows",
            "min_key",
            "max_key",
            F.expr(
                f"1000 * n_rows * {RANGE_BUCKETS} div total_rows"
            ).alias("fill_permille"),
        )
        .orderBy("bucket_id")
    )


_RANGE_PLAN_SQL = f"""
WITH s AS (
  SELECT o_totalprice AS key, o_orderkey AS id
  FROM orders
  WHERE CAST(('0x' || substring(md5('{RANGE_SALT}'
        || CAST(o_orderkey AS VARCHAR)), 1, 15)) AS BIGINT)
        % 100 < {RANGE_SAMPLE_PCT}
),
r AS (
  SELECT key, ROW_NUMBER() OVER (ORDER BY key, id) AS rn,
         COUNT(*) OVER () AS n
  FROM s
),
bs AS (SELECT UNNEST(generate_series(1, {RANGE_BUCKETS - 1})) AS b),
bnd AS (
  SELECT r.key AS bound
  FROM r JOIN bs ON r.rn = (r.n * bs.b + {RANGE_BUCKETS} - 1) // {RANGE_BUCKETS}
),
tot AS (SELECT COUNT(*) AS total_rows FROM orders),
asg AS (
  SELECT o.o_totalprice AS key,
         (SELECT COUNT(*) FROM bnd WHERE bnd.bound < o.o_totalprice)
           AS bucket_id
  FROM orders o
)
SELECT a.bucket_id, COUNT(*) AS n_rows,
       ROUND(MIN(a.key), 2) AS min_key, ROUND(MAX(a.key), 2) AS max_key,
       1000 * COUNT(*) * {RANGE_BUCKETS} // ANY_VALUE(t.total_rows)
         AS fill_permille
FROM asg a CROSS JOIN tot t
GROUP BY a.bucket_id
ORDER BY bucket_id
"""


QUERIES: dict[str, QueryEntry] = {
    "scl_salted_pricing": QueryEntry(scl_salted_pricing, _SALTED_PRICING_SQL),
    "scl_range_partition_plan": QueryEntry(
        scl_range_partition_plan, _RANGE_PLAN_SQL
    ),
    "scl_salted_join_segments": QueryEntry(scl_salted_join_segments, _SALTED_JOIN_SQL),
    "scl_group_zscore": QueryEntry(scl_group_zscore, _ZSCORE_SQL),
    "scl_zorder_key": QueryEntry(scl_zorder_key, _zorder_sql()),
    "scl_bloom_pruned_join": QueryEntry(scl_bloom_pruned_join, _BLOOM_JOIN_SQL),
    "scl_skew_census": QueryEntry(scl_skew_census, _skew_census_sql()),
    "scl_compaction_plan": QueryEntry(scl_compaction_plan, _COMPACTION_SQL),
}
