"""Event-time window queries over the events stream table — the streaming
semantics the reference lacks (SURVEY.md §2.9 note: its only time notion is
the version counter). Batch forms here are oracle-gated; the same windows
run in Structured Streaming with watermarks in sql_cdc_spark/streaming/.

Window math notes:
- tumbling/sliding starts are epoch-aligned exactly like F.window's
  (start ≡ 0 mod slide), so the DuckDB oracle reproduces them with integer
  microsecond arithmetic — no float epoch.
- session windows follow F.session_window semantics: events within GAP of
  the previous event merge; window end = last event + GAP.
- value sums are rounded to 2dp so cross-engine double summation order
  cannot flip the comparator's 6dp value hash.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from sql_cdc_spark import tables
from sql_cdc_spark.queries import QueryEntry

TUMBLE = "1 hour"
SLIDE_SIZE = "1 hour"
SLIDE_STEP = "30 minutes"
SESSION_GAP = "30 minutes"

_HOUR_US = 3_600_000_000
_HALF_HOUR_US = 1_800_000_000
_DAY_US = 86_400_000_000
# integer-microsecond day floor — DuckDB's date_trunc('day', …) stringifies
# differently from Spark's window start, so oracles use the same arithmetic
_DAY_FLOOR_SQL = f"make_timestamp(epoch_us(ts) // {_DAY_US} * {_DAY_US})"


def evt_tumbling_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour event-time windows × event_type: count + rounded
    value sum. One shuffle on (window, event_type); partial aggregation
    map-side. The batch twin of the streaming watermarked rollup."""
    ev = tables.load(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", TUMBLE).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            # cents-exact: round per-row to integer cents, SUM as bigint,
            # divide — double-summation order can drift past 2dp on large
            # groups and varies run-to-run (CLAUDE.md hard rule)
            (F.sum(F.round(F.col("value") * 100).cast("long")) / 100.0).alias(
                "total_value"
            ),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


_TUMBLING_SQL = f"""
SELECT make_timestamp(epoch_us(ts) // {_HOUR_US} * {_HOUR_US}) AS window_start,
       make_timestamp(epoch_us(ts) // {_HOUR_US} * {_HOUR_US} + {_HOUR_US}) AS window_end,
       event_type,
       COUNT(*) AS n_events,
       SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) / 100.0 AS total_value
FROM events
GROUP BY 1, 2, 3
"""


def evt_sliding_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding windows (1 h size, 30 min step): every event lands in exactly
    size/step = 2 windows. Spark expands rows internally; the oracle
    reproduces the expansion with an explicit 2-way union."""
    ev = tables.load(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", SLIDE_SIZE, SLIDE_STEP).alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.avg("value"), 6).alias("avg_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "n_events",
            "avg_value",
        )
    )


_SLIDING_SQL = f"""
WITH starts AS (
  SELECT value,
         epoch_us(ts) // {_HALF_HOUR_US} * {_HALF_HOUR_US} AS s_us
  FROM events
  UNION ALL
  SELECT value,
         epoch_us(ts) // {_HALF_HOUR_US} * {_HALF_HOUR_US} - {_HALF_HOUR_US}
  FROM events
)
SELECT make_timestamp(s_us) AS window_start,
       make_timestamp(s_us + {_HOUR_US}) AS window_end,
       COUNT(*) AS n_events,
       ROUND(AVG(value), 6) AS avg_value
FROM starts
GROUP BY 1, 2
"""


def evt_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user session windows with a 30-min inactivity gap via the native
    F.session_window (state-merging agg, also valid under readStream).
    End = last event + gap, matching streaming semantics."""
    ev = tables.load(spark, sf_dir, "events")
    return (
        ev.groupBy(F.session_window("ts", SESSION_GAP).alias("w"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            # cents-exact sum (see evt_tumbling_hourly)
            (F.sum(F.round(F.col("value") * 100).cast("long")) / 100.0).alias(
                "session_value"
            ),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "session_value",
        )
    )


_SESSION_SQL = """
WITH marked AS (
  SELECT user_id, ts, value,
         CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
                   <= INTERVAL 30 MINUTE THEN 0 ELSE 1 END AS new_session
  FROM events
),
numbered AS (
  SELECT user_id, ts, value,
         SUM(new_session) OVER (
           PARTITION BY user_id ORDER BY ts
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) AS session_id
  FROM marked
)
SELECT user_id,
       MIN(ts) AS session_start,
       MAX(ts) + INTERVAL 30 MINUTE AS session_end,
       COUNT(*) AS n_events,
       SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) / 100.0 AS session_value
FROM numbered
GROUP BY user_id, session_id
"""


def evt_daily_user_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily tumbling rollup per user with distinct-type count — the
    dashboard-feeding aggregate (coarser windows → fewer groups; the shape
    that rolls up a 100 TB raw stream into a queryable cube)."""
    ev = tables.load(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 day").alias("w"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("event_type").alias("n_types"),
            # cents-exact sum (see evt_tumbling_hourly)
            (F.sum(F.round(F.col("value") * 100).cast("long")) / 100.0).alias(
                "day_value"
            ),
        )
        .select(
            F.col("w.start").alias("day_start"),
            "user_id",
            "n_events",
            "n_types",
            "day_value",
        )
    )


_DAILY_SQL = f"""
SELECT {_DAY_FLOOR_SQL} AS day_start,
       user_id,
       COUNT(*) AS n_events,
       COUNT(DISTINCT event_type) AS n_types,
       SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) / 100.0 AS day_value
FROM events
GROUP BY 1, 2
"""


def evt_late_data_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermark semantics in batch form: drop events older than
    (max event time − 7 days), then window — exactly what
    withWatermark('ts','7 days') admits at end-of-stream. The oracle
    reproduces the high-watermark with a scalar subquery."""
    ev = tables.load(spark, sf_dir, "events")
    hw = ev.agg(F.max("ts").alias("hw"))
    kept = ev.join(F.broadcast(hw)).filter(
        F.col("ts") >= F.col("hw") - F.expr("INTERVAL 7 DAYS")
    )
    return (
        kept.groupBy(F.window("ts", TUMBLE).alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("w.start").alias("window_start"), "n_events")
    )


_LATE_FILTER_SQL = f"""
SELECT make_timestamp(epoch_us(ts) // {_HOUR_US} * {_HOUR_US}) AS window_start,
       COUNT(*) AS n_events
FROM events
WHERE ts >= (SELECT MAX(ts) FROM events) - INTERVAL 7 DAY
GROUP BY 1
"""


def evt_top_users_per_day(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composition: daily tumbling window → per-day activity ranking →
    top-3 users (rank over the window aggregate, dense ties broken on
    user_id)."""
    ev = tables.load(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.window("ts", "1 day")["start"].alias("day_start"), "user_id"
    ).agg(F.count(F.lit(1)).alias("n_events"))
    w = Window.partitionBy("day_start").orderBy(
        F.col("n_events").desc(), F.col("user_id").asc()
    )
    return (
        daily.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select("day_start", "user_id", "n_events", "rnk")
    )


_TOP_USERS_SQL = f"""
WITH daily AS (
  SELECT {_DAY_FLOOR_SQL} AS day_start, user_id, COUNT(*) AS n_events
  FROM events GROUP BY 1, 2
)
SELECT day_start, user_id, n_events, rnk FROM (
  SELECT day_start, user_id, n_events,
         ROW_NUMBER() OVER (
           PARTITION BY day_start ORDER BY n_events DESC, user_id ASC
         ) AS rnk
  FROM daily
) WHERE rnk <= 3
"""

def evt_value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles of event value per type — the
    latency-dashboard aggregate. Exact (sort-based) here as the golden
    reference; the sketch twin below is the at-scale variant."""
    ev = tables.load(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.round(F.percentile("value", 0.5), 6).alias("p50"),
        F.round(F.percentile("value", 0.95), 6).alias("p95"),
        F.round(F.percentile("value", 0.99), 6).alias("p99"),
    )


_PERCENTILES_SQL = """
SELECT event_type,
       ROUND(quantile_cont(value, 0.5), 6) AS p50,
       ROUND(quantile_cont(value, 0.95), 6) AS p95,
       ROUND(quantile_cont(value, 0.99), 6) AS p99
FROM events GROUP BY event_type
"""


HLL_RSD = 0.02


def evt_user_cardinality_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog distinct-user sketch per event type — the mergeable,
    bounded-memory cardinality path for 100 TB streams. The raw sketch
    estimate is engine-specific, so the emitted row carries the EXACT
    count plus an in-plan accuracy verdict: ``within_bound`` is true iff
    |approx − exact| ≤ max(1, 3·rsd·exact). The DuckDB oracle computes the
    exact side and a TRUE literal, making the sketch's accuracy contract
    itself hash-gated by the driver (round-2 verdict #3) — a sketch
    regression flips within_bound and the row hash."""
    ev = tables.load(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.approx_count_distinct("user_id", rsd=HLL_RSD).alias("__approx"),
            F.countDistinct("user_id").alias("n_users"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .select(
            "event_type",
            "n_users",
            "n_events",
            (
                F.abs(F.col("__approx") - F.col("n_users"))
                <= F.greatest(F.lit(1.0), F.lit(3 * HLL_RSD) * F.col("n_users"))
            ).alias("within_bound"),
        )
    )


_CARDINALITY_SQL = """
SELECT event_type,
       COUNT(DISTINCT user_id) AS n_users,
       COUNT(*) AS n_events,
       TRUE AS within_bound
FROM events GROUP BY event_type
"""


PCT_REL_ERR = 0.02  # approx_percentile accuracy contract (relative rank error)


def evt_percentile_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate percentiles per event type — the mergeable
    bounded-memory quantile path for 100 TB streams (Greenwald-Khanna
    sketch under Spark's approx_percentile; the exact sort-based twin is
    evt_value_percentiles). Same hash-gate pattern as the HLL sketch:
    the row carries the EXACT percentiles plus an in-plan verdict that
    the sketch landed within the rank-error contract — a GK regression
    flips the boolean and the row hash. Rank error ε means the returned
    value's rank is within ε·n of the target, so the value bound is
    checked against the exact quantiles at (q ± 3ε)."""
    ev = tables.load(spark, sf_dir, "events")
    acc = int(1.0 / PCT_REL_ERR)
    eps = 3 * PCT_REL_ERR
    aggs = [F.count(F.lit(1)).alias("n_events")]
    for q in (0.5, 0.95):
        tag = str(q).replace(".", "")
        aggs += [
            F.round(F.percentile("value", q), 6).alias(f"p{tag}"),
            F.percentile_approx("value", q, acc).alias(f"__a{tag}"),
            F.percentile("value", max(0.0, q - eps)).alias(f"__lo{tag}"),
            F.percentile("value", min(1.0, q + eps)).alias(f"__hi{tag}"),
        ]
    g = ev.groupBy("event_type").agg(*aggs)
    ok = None
    for q in (0.5, 0.95):
        tag = str(q).replace(".", "")
        cond = (F.col(f"__a{tag}") >= F.col(f"__lo{tag}")) & (
            F.col(f"__a{tag}") <= F.col(f"__hi{tag}")
        )
        ok = cond if ok is None else (ok & cond)
    return g.select(
        "event_type", "n_events", "p05", "p095", ok.alias("within_bound")
    )


_PCT_SKETCH_SQL = """
SELECT event_type, COUNT(*) AS n_events,
       ROUND(quantile_cont(value, 0.5), 6) AS p05,
       ROUND(quantile_cont(value, 0.95), 6) AS p095,
       TRUE AS within_bound
FROM events GROUP BY event_type
"""


def evt_asof_last_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of (point-in-time) enrichment: every click event carries the
    value of the same user's most recent purchase at-or-before the click
    (operators/asof.py — union + windowed last_value, one shuffle on
    user_id, linear at any scale). Clicks before the user's first
    purchase stay null (LEFT semantics). The oracle is DuckDB's native
    ASOF LEFT JOIN — two independent implementations of the temporal
    merge must agree row-for-row."""
    from sql_cdc_spark.operators.asof import asof_join

    ev = tables.load(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.col("value").alias("last_purchase_value")
    )
    joined = asof_join(clicks, purchases, "user_id", "ts", ["last_purchase_value"])
    return joined.select(
        "event_id",
        "user_id",
        F.unix_micros("ts").alias("ts_us"),
        "last_purchase_value",
    )


_ASOF_SQL = """
WITH clicks AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
),
purchases AS (
  SELECT user_id, ts, value AS last_purchase_value
  FROM events WHERE event_type = 'purchase'
)
SELECT c.event_id, c.user_id, epoch_us(c.ts) AS ts_us, p.last_purchase_value
FROM clicks c
ASOF LEFT JOIN purchases p ON c.user_id = p.user_id AND c.ts >= p.ts
"""


def evt_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel analysis view → click → purchase: a user reaches a
    stage only via an event at-or-after their entry into the previous
    stage (first qualifying timestamp). Emits the per-stage census plus
    the exact total inter-stage delay in integer microseconds (bigint —
    no float summation drift). Plan: one min-agg per stage, each join
    keyed on user_id so the groupBy exchange is reused by the subsequent
    join (co-partitioned, no extra shuffle); final per-stage rollups are
    single-row aggregates. Linear at any scale — no window over the full
    event stream, no broadcast of an unbounded side."""
    ev = tables.load(spark, sf_dir, "events")
    views = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("view_ts"))
    )
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .join(views, "user_id")
        .filter(F.col("ts") >= F.col("view_ts"))
        .groupBy("user_id", "view_ts")
        .agg(F.min("ts").alias("click_ts"))
    )
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .join(clicks.select("user_id", "click_ts"), "user_id")
        .filter(F.col("ts") >= F.col("click_ts"))
        .groupBy("user_id", "click_ts")
        .agg(F.min("ts").alias("purchase_ts"))
    )

    def census(df, stage, delay):
        d = (
            F.coalesce(F.sum(delay), F.lit(0)).cast("long")
            if delay is not None
            else F.lit(0).cast("long")
        )
        return df.agg(
            F.lit(stage).alias("stage"),
            F.count(F.lit(1)).alias("n_users"),
            d.alias("total_delay_us"),
        )

    out = (
        census(views, "view", None)
        .unionAll(
            census(
                clicks,
                "click",
                F.unix_micros("click_ts") - F.unix_micros("view_ts"),
            )
        )
        .unionAll(
            census(
                purchases,
                "purchase",
                F.unix_micros("purchase_ts") - F.unix_micros("click_ts"),
            )
        )
    )
    return out.orderBy("stage")


_FUNNEL_SQL = """
WITH v AS (
  SELECT user_id, MIN(ts) AS view_ts
  FROM events WHERE event_type = 'view' GROUP BY user_id
),
c AS (
  SELECT e.user_id, v.view_ts, MIN(e.ts) AS click_ts
  FROM events e JOIN v USING (user_id)
  WHERE e.event_type = 'click' AND e.ts >= v.view_ts
  GROUP BY e.user_id, v.view_ts
),
p AS (
  SELECT e.user_id, c.click_ts, MIN(e.ts) AS purchase_ts
  FROM events e JOIN c USING (user_id)
  WHERE e.event_type = 'purchase' AND e.ts >= c.click_ts
  GROUP BY e.user_id, c.click_ts
)
SELECT * FROM (
  SELECT 'view' AS stage, COUNT(*) AS n_users, CAST(0 AS BIGINT) AS total_delay_us
  FROM v
  UNION ALL
  SELECT 'click', COUNT(*),
         CAST(COALESCE(SUM(epoch_us(click_ts) - epoch_us(view_ts)), 0) AS BIGINT)
  FROM c
  UNION ALL
  SELECT 'purchase', COUNT(*),
         CAST(COALESCE(SUM(epoch_us(purchase_ts) - epoch_us(click_ts)), 0) AS BIGINT)
  FROM p
) ORDER BY stage
"""


def evt_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retention-cohort matrix: users grouped by first-seen day, counted
    on each subsequent active day as a day offset. Day floors are integer
    microsecond arithmetic (no date_trunc — CLAUDE.md determinism rule);
    every output is an exact integer. Plan: distinct (user, day) pairs
    (one shuffle), min-day per user reuses the same user_id partitioning,
    then one count shuffle on (cohort_day, offset) — three map-side-
    combining exchanges, linear at any scale."""
    ev = tables.load(spark, sf_dir, "events")
    # `div` is exact integer division — a double `/` then cast could flip
    # a value sitting on a day boundary by one ulp
    day = F.expr(f"unix_micros(ts) div {_DAY_US}")
    user_days = ev.select("user_id", day.alias("day")).distinct()
    cohorts = user_days.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    return (
        user_days.join(cohorts, "user_id")
        .groupBy(
            "cohort_day", (F.col("day") - F.col("cohort_day")).alias("day_offset")
        )
        .agg(F.count(F.lit(1)).alias("n_users"))
        .orderBy("cohort_day", "day_offset")
    )


_RETENTION_SQL = f"""
WITH user_days AS (
  SELECT DISTINCT user_id, epoch_us(ts) // {_DAY_US} AS day FROM events
),
cohorts AS (
  SELECT user_id, MIN(day) AS cohort_day FROM user_days GROUP BY user_id
)
SELECT c.cohort_day, u.day - c.cohort_day AS day_offset, COUNT(*) AS n_users
FROM user_days u JOIN cohorts c USING (user_id)
GROUP BY 1, 2
ORDER BY 1, 2
"""


def evt_type_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-type transition counts (first-order Markov census): for each
    user's event stream in (ts, event_id) total order, count consecutive
    (previous type → current type) pairs. The lag window is partitioned by
    user_id — never a global window — so state per task is one user's
    slice. Exact integer counts; the stream's first event per user (no
    predecessor) is excluded."""
    ev = tables.load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = ev.select(
        "user_id",
        F.lag("event_type").over(w).alias("prev_type"),
        F.col("event_type").alias("curr_type"),
    ).filter(F.col("prev_type").isNotNull())
    return (
        pairs.groupBy("prev_type", "curr_type")
        .agg(F.count(F.lit(1)).alias("n_transitions"))
        .orderBy("prev_type", "curr_type")
    )


_TRANSITIONS_SQL = """
WITH seq AS (
  SELECT user_id,
         LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS prev_type,
         event_type AS curr_type
  FROM events
)
SELECT prev_type, curr_type, COUNT(*) AS n_transitions
FROM seq
WHERE prev_type IS NOT NULL
GROUP BY 1, 2
ORDER BY 1, 2
"""


_IVJ_W_US = 7_200_000_000  # interval width: errors within 2 h after a purchase


def evt_interval_join_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch interval join, bucket-equi form: every (purchase, error)
    pair for the same user with the error inside the 2 h window after the
    purchase. A naive non-equi join is a nested-loop at scale; instead
    both sides are binned by the window width, the purchase side probes
    its own bin and the next (an interval of length W starting in bin b
    ends in b or b+1), and the range predicate is a residual filter on an
    EQUI hash join keyed (user_id, bin) — shuffle-partitioned, linear,
    no nested loop anywhere. The DuckDB oracle is the plain non-equi join
    (its IEJoin), so two structurally different algorithms must agree
    row-for-row."""
    ev = tables.load(spark, sf_dir, "events")
    us = F.unix_micros("ts")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        us.alias("p_us"),
        F.expr(f"unix_micros(ts) div {_IVJ_W_US}").alias("bin"),
    )
    probes = purchases.select(
        "purchase_id",
        "user_id",
        "p_us",
        F.explode(F.array(F.col("bin"), F.col("bin") + 1)).alias("probe_bin"),
    )
    errors = ev.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("error_id"),
        F.col("user_id").alias("e_user"),
        us.alias("e_us"),
        F.expr(f"unix_micros(ts) div {_IVJ_W_US}").alias("e_bin"),
    )
    return (
        probes.join(
            errors,
            (F.col("user_id") == F.col("e_user"))
            & (F.col("probe_bin") == F.col("e_bin")),
        )
        .filter(
            (F.col("e_us") > F.col("p_us"))
            & (F.col("e_us") <= F.col("p_us") + _IVJ_W_US)
        )
        .select(
            "purchase_id",
            "error_id",
            "user_id",
            (F.col("e_us") - F.col("p_us")).alias("delay_us"),
        )
        .orderBy("purchase_id", "error_id")
    )


_IVJ_SQL = f"""
SELECT p.event_id AS purchase_id, e.event_id AS error_id,
       p.user_id, epoch_us(e.ts) - epoch_us(p.ts) AS delay_us
FROM events p JOIN events e
  ON p.user_id = e.user_id
 AND p.event_type = 'purchase' AND e.event_type = 'error'
 AND epoch_us(e.ts) > epoch_us(p.ts)
 AND epoch_us(e.ts) <= epoch_us(p.ts) + {_IVJ_W_US}
ORDER BY purchase_id, error_id
"""


HIST_BIN_CENTS = 2500  # 25.00-wide value bins


def evt_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type value histogram — the distribution-profiling pass a
    feature pipeline runs before normalization decisions. Values are
    binned in exact integer cents (floor division, so bin_lo_cents is the
    true LOWER edge even for negative values), so bin membership is
    bit-identical cross-engine — no float bin-edge knife
    edges; the in-bin sum is cents-exact per the CLAUDE.md rule. One
    map-side-combined groupBy; linear at any scale."""
    ev = tables.load(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100).cast("long")
    return (
        ev.select("event_type", cents.alias("__c"))
        .groupBy(
            "event_type",
            # floor-division binning via positive modulo: c - pmod(c, B)
            # equals floor(c/B)*B for negative cents too, all in int64
            (F.col("__c") - F.pmod(F.col("__c"), F.lit(HIST_BIN_CENTS))).alias(
                "bin_lo_cents"
            ),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            (F.sum("__c") / 100.0).alias("value_sum"),
        )
        .orderBy("event_type", "bin_lo_cents")
    )


_HISTOGRAM_SQL = f"""
WITH c AS (
  SELECT event_type, CAST(ROUND(value * 100, 0) AS BIGINT) AS cents FROM events
)
SELECT event_type,
       cents - ((cents % {HIST_BIN_CENTS} + {HIST_BIN_CENTS}) % {HIST_BIN_CENTS}) AS bin_lo_cents,
       COUNT(*) AS n_events,
       SUM(cents) / 100.0 AS value_sum
FROM c GROUP BY event_type, bin_lo_cents
ORDER BY event_type, bin_lo_cents
"""


CMS_TOP_H = 20


def evt_heavy_hitters_cms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy hitters via count-min sketch
    (functions/sketches.py::cms_cells/cms_point_estimates) under the
    same in-plan accuracy contract as the HLL sketch row: for the true
    top-H users by event count, the emitted row carries the EXACT count
    plus two verdict booleans — ``est_ok`` (CMS estimate ≥ exact: the
    sketch's HARD one-sided guarantee, deterministically true) and
    ``bound_ok`` (estimate ≤ exact + ⌈(e/w)·N⌉: the probabilistic
    overestimate bound, deterministic on fixed data). The DuckDB oracle
    computes the exact side and TRUE literals, so any cell-hash, merge,
    or min-probe regression flips a boolean and the driver hash. The
    cell table is the mergeable state (cms_merge) a streaming pipeline
    maintains per batch — merge-equals-batch is pytest-gated."""
    from sql_cdc_spark.functions import sketches as SK

    ev = tables.load(spark, sf_dir, "events")
    cells = SK.cms_cells(ev, [], "user_id")
    exact_top = (
        ev.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("exact_cnt"))
        .orderBy(F.col("exact_cnt").desc(), F.col("user_id").asc())
        .limit(CMS_TOP_H)
    )
    est = SK.cms_point_estimates(cells, exact_top.select("user_id"), "user_id")
    # slack = ⌈(e/w)·N⌉ computed IN-PLAN (one-row crossJoin, the
    # evt_join_size_estimate form) — an eager ev.count() here would run
    # a full events scan every time the PLAN is built (plan audits,
    # driver rounds), not just when the query executes
    n_total = ev.agg(F.count(F.lit(1)).alias("__n"))
    slack = F.ceil(F.lit(math.e / SK.CMS_W) * F.col("__n")).cast("long")
    return (
        exact_top.join(est, "user_id")
        .crossJoin(F.broadcast(n_total))
        .select(
            "user_id",
            "exact_cnt",
            (F.col("cms_estimate") >= F.col("exact_cnt")).alias("est_ok"),
            (F.col("cms_estimate") <= F.col("exact_cnt") + slack).alias(
                "bound_ok"
            ),
        )
        .orderBy(F.col("exact_cnt").desc(), F.col("user_id").asc())
    )


_CMS_SQL = f"""
SELECT user_id, exact_cnt, TRUE AS est_ok, TRUE AS bound_ok
FROM (
  SELECT user_id, COUNT(*) AS exact_cnt FROM events GROUP BY user_id
  ORDER BY exact_cnt DESC, user_id ASC LIMIT {CMS_TOP_H}
)
ORDER BY exact_cnt DESC, user_id ASC
"""


def evt_gap_fill_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series resampling with gap fill — the
    last-observation-carried-forward primitive every metrics/feature
    pipeline needs and Spark has no built-in for: each user's sparse
    daily value series is expanded to a dense per-day grid over that
    user's own active span, missing days inherit the last observed
    value, and ``observed`` marks real vs filled rows. Integer-exact
    throughout (day floors in epoch micros, sums in cents).

    Plan shape: one grouped agg to the sparse series, a per-user bounds
    agg, a bounded sequence+explode for the grid (rows = users × their
    span days — linear), and a user-partitioned running last_value
    (ignorenulls) — no global sort, no corpus-wide window."""
    ev = tables.load(spark, sf_dir, "events")
    # integer floor division (div), NOT double-divide + cast: truncation
    # toward zero diverges from the oracle's // on pre-1970 timestamps
    day = (F.expr(f"unix_micros(ts) div {_DAY_US}") * _DAY_US).alias("day_us")
    cents = F.round(F.col("value") * 100).cast("long")
    sparse = ev.groupBy("user_id", day).agg(F.sum(cents).alias("cents"))
    bounds = sparse.groupBy("user_id").agg(
        F.min("day_us").alias("lo"), F.max("day_us").alias("hi")
    )
    grid = bounds.select(
        "user_id",
        F.explode(
            F.sequence(F.col("lo"), F.col("hi"), F.lit(_DAY_US).cast("long"))
        ).alias("day_us"),
    )
    filled = grid.join(sparse, ["user_id", "day_us"], "left")
    w = (
        Window.partitionBy("user_id")
        .orderBy("day_us")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return filled.select(
        "user_id",
        "day_us",
        F.last("cents", ignorenulls=True).over(w).alias("cents_locf"),
        F.col("cents").isNotNull().cast("int").alias("observed"),
    ).orderBy("user_id", "day_us")


_GAP_FILL_SQL = f"""
WITH sparse AS (
  SELECT user_id, epoch_us(ts) // {_DAY_US} * {_DAY_US} AS day_us,
         CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT) AS cents
  FROM events GROUP BY 1, 2
),
bounds AS (SELECT user_id, MIN(day_us) AS lo, MAX(day_us) AS hi FROM sparse GROUP BY 1),
grid AS (
  SELECT user_id, unnest(generate_series(lo, hi, {_DAY_US})) AS day_us FROM bounds
),
filled AS (
  SELECT g.user_id, g.day_us, s.cents,
         CASE WHEN s.cents IS NOT NULL THEN 1 ELSE 0 END AS observed
  FROM grid g LEFT JOIN sparse s ON s.user_id = g.user_id AND s.day_us = g.day_us
)
SELECT user_id, day_us,
       CAST(LAST_VALUE(cents IGNORE NULLS) OVER (
            PARTITION BY user_id ORDER BY day_us ROWS UNBOUNDED PRECEDING
       ) AS BIGINT) AS cents_locf,
       observed
FROM filled ORDER BY user_id, day_us
"""


def evt_sketch_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL set algebra over event-type audiences — the sketch-side
    union/intersection an analytics engine answers audience-overlap
    questions with at 100 TB: per type-pair, |A∪B| from a register-level
    merge (max per register — functions/sketches.py::merge_registers
    algebra) and |A∩B| by inclusion-exclusion. Same hash-gated accuracy
    contract as the HLL/CMS rows: the emitted row carries the EXACT
    sizes plus verdict booleans that the estimates landed inside the
    3σ propagation bounds (union: 3σ·|A∪B|; intersection: the I-E error
    compounds, so 3σ·(|A|+|B|+|A∪B|)) — a register, merge, or estimator
    regression flips a boolean and the driver hash. Scale shape: the
    only corpus-sized work is one distinct + one register groupBy; every
    pairwise step runs on ≤ |types|·2^p register rows."""
    from sql_cdc_spark.functions import sketches as SK

    ev = tables.load(spark, sf_dir, "events")
    # fully lazy, deliberately: the distinct audience table is re-read by
    # several subtrees, but its expensive side is one SHUFFLE whose map
    # stage Spark computes once per action (shuffle-stage reuse) — an A/B
    # at sf0.1 measured lazy 0.96 s vs persist 1.37 s best-of-3, so
    # caching here costs time AND would leak session cache entries; the
    # plan also stays build-cheap for the plan-audit API
    users = ev.select("event_type", "user_id").distinct()
    regs = SK.hll_registers(ev, ["event_type"], "user_id")
    sizes = users.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    ua = users.select(F.col("event_type").alias("type_a"), "user_id")
    ub = users.select(F.col("event_type").alias("type_b"), "user_id")
    inter = (
        ua.join(ub, "user_id")
        .filter(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    est = SK.hll_estimate(regs, ["event_type"])
    ra = regs.select(F.col("event_type").alias("type_a"), "reg", "rho")
    rb = regs.select(F.col("event_type").alias("type_b"), "reg", "rho")
    pair_regs = (
        inter.select("type_a", "type_b")
        .join(ra, "type_a")
        .unionByName(inter.select("type_a", "type_b").join(rb, "type_b"))
        .groupBy("type_a", "type_b", "reg")
        .agg(F.max("rho").alias("rho"))
    )
    est_union = SK.hll_estimate(pair_regs, ["type_a", "type_b"]).select(
        "type_a", "type_b", F.col("estimate").alias("__eu")
    )
    ea = est.select(
        F.col("event_type").alias("type_a"), F.col("estimate").alias("__ea")
    )
    eb = est.select(
        F.col("event_type").alias("type_b"), F.col("estimate").alias("__eb")
    )
    sa = sizes.select(F.col("event_type").alias("type_a"), F.col("n").alias("n_a"))
    sb = sizes.select(F.col("event_type").alias("type_b"), F.col("n").alias("n_b"))
    bound = SK.hll_error_bound()  # 3σ relative
    n_union = F.col("n_a") + F.col("n_b") - F.col("n_inter")
    est_inter = F.col("__ea") + F.col("__eb") - F.col("__eu")
    return (
        inter.join(sa, "type_a")
        .join(sb, "type_b")
        .join(est_union, ["type_a", "type_b"])
        .join(ea, "type_a")
        .join(eb, "type_b")
        .select(
            "type_a",
            "type_b",
            "n_a",
            "n_b",
            n_union.alias("n_union"),
            "n_inter",
            (
                F.abs(F.col("__eu") - n_union)
                <= F.greatest(F.lit(2.0), F.lit(bound) * n_union)
            ).alias("union_ok"),
            (
                F.abs(est_inter - F.col("n_inter"))
                <= F.greatest(
                    F.lit(3.0),
                    F.lit(bound)
                    * (F.col("n_a") + F.col("n_b") + n_union),
                )
            ).alias("inter_ok"),
        )
        .orderBy("type_a", "type_b")
    )


_SETOPS_SQL = """
WITH u AS (SELECT DISTINCT event_type, user_id FROM events),
sizes AS (SELECT event_type, COUNT(*) AS n FROM u GROUP BY 1),
inter AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b, COUNT(*) AS n_inter
  FROM u a JOIN u b ON a.user_id = b.user_id AND a.event_type < b.event_type
  GROUP BY 1, 2
)
SELECT i.type_a, i.type_b, sa.n AS n_a, sb.n AS n_b,
       sa.n + sb.n - i.n_inter AS n_union, i.n_inter,
       TRUE AS union_ok, TRUE AS inter_ok
FROM inter i
JOIN sizes sa ON sa.event_type = i.type_a
JOIN sizes sb ON sb.event_type = i.type_b
ORDER BY type_a, type_b
"""


JOIN_EST_TYPE_A = "purchase"
JOIN_EST_TYPE_B = "click"


def evt_join_size_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-cardinality estimation from sketches — the optimizer-style
    use of CMS state (functions/sketches.py::cms_inner_product): the
    size of purchases ⋈_{user_id} clicks is estimated purely from the
    two maintained cell tables (Σ_col cntA·cntB per row, min over rows)
    without re-scanning either side. Same hash-gated accuracy contract
    as the other sketch rows: the emitted row carries the EXACT side
    sizes and true join size plus two verdicts — ``est_ok`` (estimate ≥
    truth: the inner product's one-sided guarantee, deterministically
    true) and ``bound_ok`` (estimate ≤ truth + ⌈(e/w)·N_A·N_B⌉). The
    DuckDB oracle computes the exact side and TRUE literals, so a cell,
    merge, or estimator regression flips a verdict and the driver
    hash."""
    from sql_cdc_spark.functions import sketches as SK

    ev = tables.load(spark, sf_dir, "events")
    a = ev.filter(F.col("event_type") == JOIN_EST_TYPE_A)
    b = ev.filter(F.col("event_type") == JOIN_EST_TYPE_B)
    est = SK.cms_inner_product(
        SK.cms_cells(a, [], "user_id"), SK.cms_cells(b, [], "user_id")
    )
    ca = a.groupBy("user_id").agg(F.count(F.lit(1)).alias("cnt_a"))
    cb = b.groupBy("user_id").agg(F.count(F.lit(1)).alias("cnt_b"))
    exact = (
        ca.join(cb, "user_id")
        .agg(
            F.coalesce(F.sum(F.col("cnt_a") * F.col("cnt_b")), F.lit(0))
            .cast("long")
            .alias("true_join_size")
        )
        .crossJoin(a.agg(F.count(F.lit(1)).alias("n_a")))
        .crossJoin(b.agg(F.count(F.lit(1)).alias("n_b")))
    )
    slack = F.ceil(
        F.lit(math.e / SK.CMS_W) * F.col("n_a") * F.col("n_b")
    ).cast("long")
    return exact.crossJoin(est).select(
        "n_a",
        "n_b",
        "true_join_size",
        (F.col("join_size_est") >= F.col("true_join_size")).alias("est_ok"),
        (F.col("join_size_est") <= F.col("true_join_size") + slack).alias(
            "bound_ok"
        ),
    )


_JOIN_EST_SQL = f"""
WITH a AS (
  SELECT user_id, COUNT(*) AS c FROM events
  WHERE event_type = '{JOIN_EST_TYPE_A}' GROUP BY 1
),
b AS (
  SELECT user_id, COUNT(*) AS c FROM events
  WHERE event_type = '{JOIN_EST_TYPE_B}' GROUP BY 1
)
SELECT
  (SELECT CAST(COALESCE(SUM(c), 0) AS BIGINT) FROM a) AS n_a,
  (SELECT CAST(COALESCE(SUM(c), 0) AS BIGINT) FROM b) AS n_b,
  (SELECT CAST(COALESCE(SUM(a.c * b.c), 0) AS BIGINT)
   FROM a JOIN b ON a.user_id = b.user_id) AS true_join_size,
  TRUE AS est_ok,
  TRUE AS bound_ok
"""


ANOM_W = 24   # trailing window: the 24 observed hours before this one
ANOM_K = 3    # flag at |n − μ| > 3σ


def evt_rate_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-rate anomaly flags — the monitoring query every ingestion
    pipeline runs on its own feed: per event_type, each hour's count is
    compared against the trailing {W}-observed-hour window, flagged when
    (n − μ)² > k²·σ². All arithmetic is EXACT integer cross-
    multiplication — (W·n − Σn)² > k²·(W·Σn² − (Σn)²) is the z² test
    with every division cleared — so the flag is bit-identical across
    engines (no float mean/stddev anywhere). Early hours with an
    incomplete trailing window are never flagged; the trailing sum rides
    along (−1 when incomplete) so the hash pins the window arithmetic,
    not just the verdicts. Scale shape: one groupBy to hourly counts
    (map-side combined), one key-partitioned ROWS window over |types|×
    |hours| rows — the window input is the AGGREGATE, corpus-size
    independent."""
    ev = tables.load(spark, sf_dir, "events")
    hour_us = F.expr(f"unix_micros(ts) div {_HOUR_US}") * _HOUR_US
    hourly = ev.groupBy("event_type", hour_us.alias("hour_us")).agg(
        F.count(F.lit(1)).alias("n")
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("hour_us")
        .rowsBetween(-ANOM_W, -1)
    )
    t = hourly.select(
        "event_type",
        "hour_us",
        "n",
        F.sum("n").over(w).alias("s"),
        F.sum(F.col("n") * F.col("n")).over(w).alias("s2"),
        F.count("n").over(w).alias("c"),
    )
    dev = F.lit(ANOM_W) * F.col("n") - F.col("s")
    var_num = F.lit(ANOM_W) * F.col("s2") - F.col("s") * F.col("s")
    return t.select(
        "event_type",
        F.timestamp_micros(F.col("hour_us")).alias("window_start"),
        "n",
        F.coalesce(F.col("s"), F.lit(-1)).cast("long").alias("trail_sum"),
        F.when(
            (F.col("c") == ANOM_W)
            & (dev * dev > F.lit(ANOM_K * ANOM_K) * var_num),
            1,
        )
        .otherwise(0)
        .cast("long")
        .alias("is_anomaly"),
    ).orderBy("event_type", "window_start")


_ANOMALY_SQL = f"""
WITH h AS (
  SELECT event_type, epoch_us(ts) // {_HOUR_US} * {_HOUR_US} AS hour_us,
         COUNT(*) AS n
  FROM events GROUP BY 1, 2
),
t AS (
  SELECT event_type, hour_us, n,
         SUM(n) OVER w AS s,
         SUM(n * n) OVER w AS s2,
         COUNT(n) OVER w AS c
  FROM h
  WINDOW w AS (PARTITION BY event_type ORDER BY hour_us
               ROWS BETWEEN {ANOM_W} PRECEDING AND 1 PRECEDING)
)
SELECT event_type, make_timestamp(hour_us) AS window_start, n,
       CAST(COALESCE(s, -1) AS BIGINT) AS trail_sum,
       CAST(CASE WHEN c = {ANOM_W}
                  AND ({ANOM_W} * n - s) * ({ANOM_W} * n - s)
                      > {ANOM_K * ANOM_K} * ({ANOM_W} * s2 - s * s)
                 THEN 1 ELSE 0 END AS BIGINT) AS is_anomaly
FROM t
ORDER BY event_type, window_start
"""


def evt_collapse_runs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands run collapse: per user, maximal streaks of the
    SAME consecutive event_type collapse to one row — the event-stream
    compaction that turns 40 repeated 'click's into (click, 40, span).
    The classic islands construction: a change flag from lag(), then a
    running sum of flags as the island id, then one grouped aggregate.

    Exactness: total order inside each user is (ts_us, event_id) — the
    event_id tiebreak makes island ids deterministic under equal
    timestamps on any engine. Span bounds in integer epoch-microseconds
    (the repo's timestamp rule).

    Scale: ONE shuffle on user_id serves the lag window, the running-sum
    window AND the grouped aggregate (group keys contain the partition
    key, so the partitioning is reused); no partition-less window
    anywhere.

    Registry status: oracle-parity-gated in pytest this round; registered
    in the round-5 driver window."""
    ev = tables.load(spark, sf_dir, "events").select(
        "user_id", "event_id", "event_type", F.unix_micros("ts").alias("ts_us")
    )
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    flag = F.when(
        F.lag("event_type").over(w) == F.col("event_type"), F.lit(0)
    ).otherwise(F.lit(1))
    runs = ev.withColumn(
        "run_seq",
        F.sum(flag).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return (
        runs.groupBy("user_id", "run_seq")
        .agg(
            F.min("event_type").alias("event_type"),
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts_us").alias("start_us"),
            F.max("ts_us").alias("end_us"),
            F.min("event_id").alias("min_event_id"),
            F.max("event_id").alias("max_event_id"),
        )
        .orderBy("user_id", "run_seq")
    )


# DuckDB's windowed SUM over integers yields HUGEINT — cast to BIGINT so
# the run id's type matches Spark's (the tpch_q12 hash lesson)
_COLLAPSE_RUNS_SQL = """
WITH seq AS (
  SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us,
         CASE WHEN LAG(event_type) OVER w = event_type THEN 0 ELSE 1 END AS flag
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
),
runs AS (
  SELECT user_id, event_id, event_type, ts_us,
         CAST(SUM(flag) OVER (PARTITION BY user_id ORDER BY ts_us, event_id) AS BIGINT) AS run_seq
  FROM seq
)
SELECT user_id, run_seq, MIN(event_type) AS event_type, COUNT(*) AS n_events,
       MIN(ts_us) AS start_us, MAX(ts_us) AS end_us,
       MIN(event_id) AS min_event_id, MAX(event_id) AS max_event_id
FROM runs GROUP BY 1, 2 ORDER BY user_id, run_seq
"""


ROLLING_DAYS = 7


def evt_rolling_actives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 7-day distinct active users per day (DAU + WAU7) — the
    sliding-window COUNT DISTINCT that naive plans turn into a range
    join or a per-day re-scan. Scale shape: dedupe to (user_id, day)
    once, then a BOUNDED 7x fan-out (each active day contributes to the
    7 window-ends it falls in), a second distinct, and two day-level
    aggregates joined at the end — every stage is a hash shuffle on
    compact integer keys, no range join, no window over the corpus.
    Window-end days reported are exactly the observed activity days.

    Day floor and the output timestamp use integer-microsecond
    arithmetic (the repo's timestamp rule).

    Registry status: oracle-parity-gated in pytest this round; registered
    in the round-5 driver window."""
    ev = tables.load(spark, sf_dir, "events")
    ud = (
        ev.select(
            "user_id",
            F.expr(f"unix_micros(ts) div {_DAY_US}").alias("day"),
        )
        .distinct()
    )
    dau = ud.groupBy("day").agg(F.count(F.lit(1)).alias("dau"))
    contrib = (
        ud.select(
            "user_id",
            F.explode(
                F.sequence(F.lit(0), F.lit(ROLLING_DAYS - 1))
            ).alias("o"),
            "day",
        )
        .select("user_id", (F.col("day") + F.col("o")).alias("wday"))
        .distinct()
    )
    wau = contrib.groupBy("wday").agg(F.count(F.lit(1)).alias("wau7"))
    return (
        dau.join(wau, dau.day == wau.wday)
        .select(
            F.timestamp_micros(F.col("day") * F.lit(_DAY_US)).alias(
                "day_start"
            ),
            "dau",
            "wau7",
        )
        .orderBy("day_start")
    )


# Spark's integer `div` truncates toward zero while DuckDB `//` floors —
# identical on the positive epochs here (same stance as _DAY_FLOOR_SQL's
# other users)
_ROLLING_ACTIVES_SQL = f"""
WITH ud AS (
  SELECT DISTINCT user_id, epoch_us(ts) // {_DAY_US} AS day FROM events
),
dau AS (SELECT day, COUNT(*) AS dau FROM ud GROUP BY 1),
contrib AS (
  SELECT DISTINCT user_id, day + o AS wday
  FROM ud CROSS JOIN (SELECT unnest([0,1,2,3,4,5,6]) AS o)
),
wau AS (SELECT wday, COUNT(*) AS wau7 FROM contrib GROUP BY 1)
SELECT make_timestamp(d.day * {_DAY_US}) AS day_start, d.dau AS dau, w.wau7 AS wau7
FROM dau d JOIN wau w ON w.wday = d.day
ORDER BY day_start
"""


PROPS_TOPK = 3


def evt_props_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured JSON analytics: extract `$.k` from the props JSON
    column (JVM-side get_json_object — no Python in the scan), then per
    event_type the top-3 k values by frequency with exact-cents value
    sums. Aggregate-then-rank: the (event_type, k) groupBy collapses the
    corpus BEFORE the ranking window, so the window sorts a tiny
    key-census, never the fact table. Ties break on k ascending; rank
    emitted as bigint (driver hash is type-sensitive).

    Registry status: oracle-parity-gated in pytest this round; registered
    in the round-5 driver window."""
    ev = tables.load(spark, sf_dir, "events")
    # gate on an integer-literal regex BEFORE the cast: Spark's non-ANSI
    # cast returns NULL for non-integral strings while DuckDB's CAST
    # raises, so a shared pre-cast predicate is the only form both
    # engines agree on for malformed $.k payloads. The {1,18} bound is
    # part of the same contract: a 19+-digit string can overflow BIGINT,
    # where Spark's cast yields NULL (row kept, null k) but DuckDB
    # raises — bounding the magnitude in the shared predicate makes both
    # engines drop out-of-range values identically (18 digits is always
    # < 2^63; the max-int64 19-digit corner never reaches the cast).
    raw_k = F.get_json_object("props", "$.k")
    kv = ev.select(
        "event_type",
        raw_k.alias("raw_k"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    ).filter(
        F.col("raw_k").rlike(r"^-?[0-9]{1,18}$")
    ).select(
        "event_type",
        F.col("raw_k").cast("long").alias("k"),
        "cents",
    )
    agg = kv.groupBy("event_type", "k").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("cents").alias("cents_sum"),
    )
    w = Window.partitionBy("event_type").orderBy(
        F.col("n").desc(), F.col("k").asc()
    )
    return (
        agg.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= PROPS_TOPK)
        .orderBy("event_type", "rnk")
    )


_PROPS_TOPK_SQL = f"""
WITH kv AS (
  SELECT event_type,
         CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
         CAST(ROUND(value * 100, 0) AS BIGINT) AS cents
  FROM events
  WHERE regexp_matches(json_extract_string(props, '$.k'), '^-?[0-9]{{1,18}}$')
),
agg AS (
  SELECT event_type, k, COUNT(*) AS n,
         CAST(SUM(cents) AS BIGINT) AS cents_sum
  FROM kv GROUP BY 1, 2
),
rk AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY n DESC, k) AS rnk
  FROM agg
)
SELECT event_type, k, n, cents_sum, rnk
FROM rk WHERE rnk <= {PROPS_TOPK}
ORDER BY event_type, rnk
"""


# ---- out-of-orderness census (round 7) --------------------------------------
# (band_ord, label, upper-bound in MICROSECONDS inclusive; None = +inf);
# the ONE constant table both the Spark CASE and the oracle CASE render
# from, so the band edges cannot drift cross-engine
OOO_BANDS = (
    (0, "in_order", 0),
    (1, "lt_1m", 60_000_000),
    (2, "lt_1h", 3_600_000_000),
    (3, "lt_1d", 86_400_000_000),
    (4, "ge_1d", None),
)


def evt_out_of_order_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-time out-of-orderness census — the measurement that PICKS a
    watermark: evt_late_data_filter applies a 7-day watermark, this
    query says what delay the stream actually needs. Arrival order is
    the generator's insertion sequence (event_id); per user, an event's
    lateness is how far its event time sits behind the running maximum
    of everything that arrived before it (0 = in order). The census
    bands lateness on the OOO_BANDS edges and reports counts + integer
    ppm share — read it as 'a watermark of 1h admits all but
    (lt_1d + ge_1d) ppm of events'.

    Integer-exact: lateness is unix_micros arithmetic (the documented
    timestamp discipline), bands are microsecond literals from the ONE
    shared constant table, shares are bigint floor ppm.

    Scale shape: ONE shuffle (the per-user window partition — arrival
    order never needs a global sort), then a 5-group map-side-combined
    census against the broadcast 1-row total. The first event per user
    has no predecessor: coalesce(…, 0) reads it as in-order on both
    engines (no reliance on either engine's greatest() null rule).

    The driver corpus arrives fully in-order (the generator emits
    event_id in timestamp order), so the registered census is a single
    in_order row; the banding logic is exercised across ALL bands by
    the planted-lateness invariant test over the same core."""
    return out_of_order_census(tables.load(spark, sf_dir, "events"))


def out_of_order_census(ev: DataFrame) -> DataFrame:
    """The census core over any (user_id, event_id, ts) frame — see
    evt_out_of_order_census."""
    w = (
        Window.partitionBy("user_id")
        .orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    ts_us = F.unix_micros("ts")
    late = F.greatest(
        F.lit(0).cast("long"),
        F.coalesce(F.max(ts_us).over(w) - ts_us, F.lit(0).cast("long")),
    )
    band_ord = F.lit(OOO_BANDS[-1][0])
    band = F.lit(OOO_BANDS[-1][1])
    for ordv, label, hi in reversed(OOO_BANDS[:-1]):
        band_ord = F.when(F.col("late_us") <= hi, ordv).otherwise(band_ord)
        band = F.when(F.col("late_us") <= hi, label).otherwise(band)
    total = ev.agg(F.count(F.lit(1)).alias("total_events"))
    return (
        ev.select(late.alias("late_us"))
        .select(band_ord.alias("band_ord"), band.alias("band"))
        .groupBy("band_ord", "band")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .crossJoin(F.broadcast(total))
        .select(
            "band_ord",
            "band",
            "n_events",
            F.expr("1000000 * n_events div total_events").alias("share_ppm"),
        )
        .orderBy("band_ord")
    )


def _ooo_census_sql() -> str:
    whens = " ".join(
        f"WHEN late_us <= {hi} THEN {ordv}"
        for ordv, _, hi in OOO_BANDS[:-1]
    )
    labels = " ".join(
        f"WHEN late_us <= {hi} THEN '{label}'"
        for _, label, hi in OOO_BANDS[:-1]
    )
    return f"""
WITH l AS (
  SELECT greatest(0, coalesce(
           MAX(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           - epoch_us(ts), 0)) AS late_us
  FROM events
),
b AS (
  SELECT CASE {whens} ELSE {OOO_BANDS[-1][0]} END AS band_ord,
         CASE {labels} ELSE '{OOO_BANDS[-1][1]}' END AS band
  FROM l
),
tot AS (SELECT COUNT(*) AS total_events FROM events)
SELECT b.band_ord, b.band, COUNT(*) AS n_events,
       1000000 * COUNT(*) // ANY_VALUE(t.total_events) AS share_ppm
FROM b CROSS JOIN tot t
GROUP BY 1, 2 ORDER BY band_ord
"""


QUERIES: dict[str, QueryEntry] = {
    "evt_rate_anomaly": QueryEntry(evt_rate_anomaly, _ANOMALY_SQL),
    "evt_histogram": QueryEntry(evt_histogram, _HISTOGRAM_SQL),
    "evt_heavy_hitters_cms": QueryEntry(evt_heavy_hitters_cms, _CMS_SQL),
    "evt_sketch_setops": QueryEntry(evt_sketch_setops, _SETOPS_SQL),
    "evt_gap_fill_locf": QueryEntry(evt_gap_fill_locf, _GAP_FILL_SQL),
    "evt_join_size_estimate": QueryEntry(evt_join_size_estimate, _JOIN_EST_SQL),
    "evt_tumbling_hourly": QueryEntry(evt_tumbling_hourly, _TUMBLING_SQL),
    "evt_value_percentiles": QueryEntry(evt_value_percentiles, _PERCENTILES_SQL),
    "evt_user_cardinality_sketch": QueryEntry(
        evt_user_cardinality_sketch, _CARDINALITY_SQL
    ),
    "evt_sliding_windows": QueryEntry(evt_sliding_windows, _SLIDING_SQL),
    "evt_session_windows": QueryEntry(evt_session_windows, _SESSION_SQL),
    "evt_daily_user_activity": QueryEntry(evt_daily_user_activity, _DAILY_SQL),
    "evt_late_data_filter": QueryEntry(evt_late_data_filter, _LATE_FILTER_SQL),
    "evt_out_of_order_census": QueryEntry(
        evt_out_of_order_census, _ooo_census_sql()
    ),
    "evt_top_users_per_day": QueryEntry(evt_top_users_per_day, _TOP_USERS_SQL),
    "evt_asof_last_purchase": QueryEntry(evt_asof_last_purchase, _ASOF_SQL),
    "evt_percentile_sketch": QueryEntry(evt_percentile_sketch, _PCT_SKETCH_SQL),
    "evt_funnel_conversion": QueryEntry(evt_funnel_conversion, _FUNNEL_SQL),
    "evt_retention_cohorts": QueryEntry(evt_retention_cohorts, _RETENTION_SQL),
    "evt_type_transitions": QueryEntry(evt_type_transitions, _TRANSITIONS_SQL),
    "evt_interval_join_buckets": QueryEntry(
        evt_interval_join_buckets, _IVJ_SQL
    ),
    "evt_collapse_runs": QueryEntry(evt_collapse_runs, _COLLAPSE_RUNS_SQL),
    "evt_rolling_actives": QueryEntry(evt_rolling_actives, _ROLLING_ACTIVES_SQL),
    "evt_props_topk": QueryEntry(evt_props_topk, _PROPS_TOPK_SQL),
}
