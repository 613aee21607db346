"""Window-function coverage (SURVEY.md §2.5) — W1 plus the analytic
frames the reference lacks but any engine of this class needs. Every
window has a total ordering (unique tiebreaker) so results are
deterministic and hash-comparable across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from sql_cdc_spark import tables
from sql_cdc_spark.queries import QueryEntry


def win_latest_n_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1 + A1 twin: row_number over (key, version desc) keeping the
    latest 3 — the payload-carrying latest-per-key formulation
    (SURVEY.md §2.5 note on sqls/storedprocedure.sql:28-34)."""
    ev = tables.load(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy(F.col("event_id").desc())
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("user_id", "event_id", "event_type", "rn")
    )


_LATEST_N_SQL = """
SELECT user_id, event_id, event_type, rn FROM (
  SELECT user_id, event_id, event_type,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
  FROM events
) WHERE rn <= 3
"""


def win_order_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank + dense_rank per customer by order value (ties share ranks,
    so no tiebreaker needed for determinism)."""
    orders = tables.load(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc())
    return orders.select(
        "o_custkey",
        "o_orderkey",
        "o_totalprice",
        F.rank().over(w).alias("price_rank"),
        F.dense_rank().over(w).alias("price_dense_rank"),
    )


_ORDER_RANKS_SQL = """
SELECT o_custkey, o_orderkey, o_totalprice,
       RANK() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC) AS price_rank,
       DENSE_RANK() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC) AS price_dense_rank
FROM orders
"""


def win_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative sum per key over a unique ordering — frame-prescribed
    summation order makes the float result identical in both engines."""
    ev = tables.load(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy("event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return ev.select(
        "user_id",
        "event_id",
        F.round(F.sum("value").over(w), 2).alias("running_value"),
    )


_RUNNING_TOTAL_SQL = """
SELECT user_id, event_id,
       ROUND(SUM(value) OVER (PARTITION BY user_id ORDER BY event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_value
FROM events
"""


def win_lag_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead: per-user deltas between consecutive event values —
    the change-over-previous-version shape of a CDC diff."""
    ev = tables.load(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("event_id")
    prev = F.lag("value", 1).over(w)
    return ev.select(
        "user_id",
        "event_id",
        F.round(F.col("value") - F.coalesce(prev, F.lit(0.0)), 2).alias("value_delta"),
        F.lead("event_id", 1).over(w).alias("next_event_id"),
    )


_LAG_DELTA_SQL = """
SELECT user_id, event_id,
       ROUND(value - COALESCE(LAG(value, 1) OVER w, 0.0), 2) AS value_delta,
       LEAD(event_id, 1) OVER w AS next_event_id
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY event_id)
"""


def win_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding row frame: 3-event moving average per user."""
    ev = tables.load(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("event_id").rowsBetween(-2, W.currentRow)
    return ev.select(
        "user_id",
        "event_id",
        F.round(F.avg("value").over(w), 4).alias("moving_avg3"),
    )


_MOVING_AVG_SQL = """
SELECT user_id, event_id,
       ROUND(AVG(value) OVER (PARTITION BY user_id ORDER BY event_id
             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4) AS moving_avg3
FROM events
"""


N_RANGE_BUCKETS = 32


def win_ntile_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ntile(4) over a total ordering (value + unique key tiebreaker) —
    computed WITHOUT a partition-less window. ``F.ntile().over(W.orderBy)``
    plans as a single-partition WindowExec: the whole table sorts in one
    task, a scale-killer at 100 TB. Instead:

    1. approximate percentile boundaries split the value domain into
       N_RANGE_BUCKETS balanced ranges (one pass, tiny driver result);
    2. per-bucket row counts give each bucket's global rank offset
       (second pass, ≤ N_RANGE_BUCKETS rows to the driver);
    3. global rank = offset + row_number over a window PARTITIONED by
       bucket — every partition sorts independently;
    4. the exact NTILE bucket follows from (rank, total) arithmetic:
       the first n%4 quartiles hold floor(n/4)+1 rows, the rest floor(n/4).

    Rows equal to a boundary value land in one bucket (strict >), so
    bucket ranges never interleave and offset+local-rank is the exact
    global rank. Matches SQL NTILE bit-for-bit, shuffles once on the
    bucket key, and no task ever sees more than ~1/N_RANGE_BUCKETS of
    the table."""
    orders = tables.load(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    probs = [i / N_RANGE_BUCKETS for i in range(1, N_RANGE_BUCKETS)]
    bounds = sorted(
        set(
            orders.agg(
                F.percentile_approx("o_totalprice", probs, 10_000).alias("b")
            ).first()["b"]
        )
    )
    bucket = F.lit(0)
    for b in bounds:
        bucket = bucket + (F.col("o_totalprice") > F.lit(float(b))).cast("int")
    ranged = orders.withColumn("__bucket", bucket)
    counts = {
        r["__bucket"]: r["n"]
        for r in ranged.groupBy("__bucket").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    n_total = sum(counts.values())
    offsets, acc = {}, 0
    for bkt in range(len(bounds) + 1):
        offsets[bkt] = acc
        acc += counts.get(bkt, 0)
    off_map = F.create_map(
        *[
            lit
            for bkt in range(len(bounds) + 1)
            for lit in (F.lit(bkt), F.lit(offsets[bkt]))
        ]
    )
    w = W.partitionBy("__bucket").orderBy(
        F.col("o_totalprice").asc(), F.col("o_orderkey").asc()
    )
    rank0 = F.element_at(off_map, F.col("__bucket")) + F.row_number().over(w) - 1
    s, r = divmod(n_total, 4)
    big = r * (s + 1)  # rows covered by the r larger quartiles
    quartile = (
        F.when(rank0 < big, F.floor(rank0 / (s + 1)))
        .otherwise(r + F.floor((rank0 - big) / max(s, 1)))
        + 1
    )
    return ranged.select(
        "o_orderkey", "o_totalprice", quartile.cast("int").alias("price_quartile")
    )


_NTILE_SQL = """
SELECT o_orderkey, o_totalprice,
       NTILE(4) OVER (ORDER BY o_totalprice ASC, o_orderkey ASC) AS price_quartile
FROM orders
"""

def win_percent_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percent_rank + cume_dist per order-priority partition — the
    relative-standing analytics the ntile query approximates in buckets.
    Both are pure rank arithmetic ((rank-1)/(n-1), rows≤current/n): the
    inputs are identical integers in any engine, so the double division
    is bit-identical and hash-stable without rounding tricks (rounded to
    6dp anyway to match house style). Partitioned window — no global
    sort; note for 100 TB: o_orderpriority has only 5 values, so this
    shape assumes the per-partition slice fits one task; for
    low-cardinality keys at extreme scale use the two-phase broadcast
    boundary pattern (win_ntile_quartiles)."""
    orders = tables.load(spark, sf_dir, "orders")
    w = W.partitionBy("o_orderpriority").orderBy("o_totalprice")
    return orders.select(
        "o_orderpriority",
        "o_orderkey",
        "o_totalprice",
        F.round(F.percent_rank().over(w), 6).alias("price_pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("price_cume_dist"),
    )


_PERCENT_RANK_SQL = """
SELECT o_orderpriority, o_orderkey, o_totalprice,
       ROUND(PERCENT_RANK() OVER w, 6) AS price_pct_rank,
       ROUND(CUME_DIST() OVER w, 6) AS price_cume_dist
FROM orders
WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice)
"""


_HOUR_US = 3_600_000_000


def win_time_range_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame keyed on event time: per user, the rolling one-hour
    trailing count and value sum for every event — the time-based frame
    (RANGE BETWEEN interval PRECEDING) that ROWS frames can't express
    when events are irregularly spaced. Ordering is integer epoch-µs so
    both engines frame identically; the sum is cents-exact bigint. The
    window is partitioned by user_id (never global), and emitting ts_us
    + event_id keeps every output row uniquely keyed."""
    ev = tables.load(spark, sf_dir, "events")
    us = F.unix_micros("ts")
    cents = F.round(F.col("value") * 100).cast("long")
    w = (
        W.partitionBy("user_id")
        .orderBy(us)
        .rangeBetween(-_HOUR_US, 0)
    )
    return ev.select(
        "event_id",
        "user_id",
        us.alias("ts_us"),
        F.count(F.lit(1)).over(w).alias("n_events_1h"),
        (F.sum(cents).over(w) / 100.0).alias("value_1h"),
    )


_TIME_RANGE_SQL = f"""
SELECT event_id, user_id, epoch_us(ts) AS ts_us,
       COUNT(*) OVER w AS n_events_1h,
       SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) OVER w / 100.0 AS value_1h
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
             RANGE BETWEEN {_HOUR_US} PRECEDING AND CURRENT ROW)
"""


QUERIES: dict[str, QueryEntry] = {
    "win_latest_n_per_user": QueryEntry(win_latest_n_per_user, _LATEST_N_SQL),
    "win_order_ranks": QueryEntry(win_order_ranks, _ORDER_RANKS_SQL),
    "win_running_total": QueryEntry(win_running_total, _RUNNING_TOTAL_SQL),
    "win_lag_delta": QueryEntry(win_lag_delta, _LAG_DELTA_SQL),
    "win_moving_avg": QueryEntry(win_moving_avg, _MOVING_AVG_SQL),
    "win_ntile_quartiles": QueryEntry(win_ntile_quartiles, _NTILE_SQL),
    "win_percent_rank": QueryEntry(win_percent_rank, _PERCENT_RANK_SQL),
    "win_time_range_sum": QueryEntry(win_time_range_sum, _TIME_RANGE_SQL),
}
