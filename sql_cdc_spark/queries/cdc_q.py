"""CDC pipeline queries — the reference's flagship semantics re-expressed
Spark-first (sqls/storedprocedure.sql:4-57 in shalinda/SQL-CDC).

Because the driver test data has no change log, one is SYNTHESIZED
DETERMINISTICALLY from orders/lineitem (FIXTURES.md §A3 rules: multiple
versions per key, line-only changes, header-only changes, version ties):

  header change:  key = o_orderkey,            version = (o_orderkey*13+7) % 1000
                  for orders with o_orderkey % 11 == 0
  line change:    key = l_orderkey*8+l_linenumber (line PK; l_linenumber <= 7),
                  version = (l_orderkey*17+l_linenumber*5) % 1000
                  for lineitems with (l_orderkey+l_linenumber) % 13 == 0

The `% 1000` versions create heavy ties across keys — exactly the regime
where the reference's composite (version, key) cursor matters.

Every query here also has a DuckDB oracle twin (same synthesis SQL), so the
full pipeline is correctness-gated end-to-end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sql_cdc_spark import tables
from sql_cdc_spark.operators import cdc
from sql_cdc_spark.operators.documents import assemble_documents
from sql_cdc_spark.queries import QueryEntry

SINCE_VERSION = 250
BATCH_LIMIT = 1000

# Shared oracle CTEs for the synthesized change log (DuckDB dialect; the
# Spark side builds the same relations with DataFrame ops).
_CHANGELOG_CTES = """
header_changes AS (
  SELECT o_orderkey AS invoice_id, (o_orderkey * 13 + 7) % 1000 AS change_version
  FROM orders WHERE o_orderkey % 11 = 0
),
line_changes AS (
  SELECT l_orderkey * 8 + l_linenumber AS line_id,
         (l_orderkey * 17 + l_linenumber * 5) % 1000 AS change_version
  FROM lineitem WHERE (l_orderkey + l_linenumber) % 13 = 0
),
recovered_line_changes AS (
  SELECT l.l_orderkey AS invoice_id, c.change_version
  FROM line_changes c
  JOIN lineitem l ON l.l_orderkey * 8 + l.l_linenumber = c.line_id
),
all_changes AS (
  SELECT * FROM header_changes UNION ALL SELECT * FROM recovered_line_changes
)
"""


def synth_header_changes(orders: DataFrame) -> DataFrame:
    """Deterministic header-change feed (S1 analog for the header table)."""
    return orders.filter(F.col("o_orderkey") % 11 == 0).select(
        F.col("o_orderkey").alias("invoice_id"),
        ((F.col("o_orderkey") * 13 + 7) % 1000).alias("change_version"),
    )


def synth_line_changes(lineitem: DataFrame) -> DataFrame:
    """Deterministic line-change feed keyed by the line PK only — the
    invoice key must be recovered via join, as in the reference
    (sqls/storedprocedure.sql:23-26)."""
    return lineitem.filter((F.col("l_orderkey") + F.col("l_linenumber")) % 13 == 0).select(
        (F.col("l_orderkey") * 8 + F.col("l_linenumber")).alias("line_id"),
        ((F.col("l_orderkey") * 17 + F.col("l_linenumber") * 5) % 1000).alias(
            "change_version"
        ),
    )


def _all_changes(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = tables.load(spark, sf_dir, "orders")
    lineitem = tables.load(spark, sf_dir, "lineitem")
    header_changes = synth_header_changes(orders)
    line_changes = synth_line_changes(lineitem)
    # J1: recover invoice key from the line PK. The join key is the derived
    # line_id expression on the lineitem side.
    lines_keyed = lineitem.select(
        (F.col("l_orderkey") * 8 + F.col("l_linenumber")).alias("line_id"),
        F.col("l_orderkey").alias("invoice_id"),
    )
    recovered = (
        line_changes.join(lines_keyed, "line_id", "inner")
        .select("invoice_id", "change_version")
    )
    # U1: bag union of the two change feeds
    return cdc.union_change_streams(header_changes.select("invoice_id", "change_version"), recovered)


def flagship_changed_invoices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The sproc pipeline end-to-end, scalar form: changes-union (U1) →
    latest-per-key (A1) → header enrichment join (J2) → per-invoice line
    stats (decorrelated J4) → bounded ordered batch (O1, composite sort
    key). Mirrors sqls/storedprocedure.sql:14-56."""
    changes = _all_changes(spark, sf_dir).filter(F.col("change_version") > SINCE_VERSION)
    latest = cdc.latest_per_key(changes, ["invoice_id"])
    orders = tables.load(spark, sf_dir, "orders")
    lineitem = tables.load(spark, sf_dir, "lineitem")
    # limit-first, like the sproc (TOP after the header join, stats per
    # selected invoice): the batch is taken on the slim header side, then
    # line stats aggregate only the ≤limit selected invoices' lines —
    # never a full-table pre-aggregation that the limit then discards
    header = cdc.bounded_ordered_batch(
        orders.withColumnRenamed("o_orderkey", "invoice_id").join(
            F.broadcast(latest), "invoice_id", "inner"
        ),
        BATCH_LIMIT,
        "change_version",
        "invoice_id",
    )
    line_stats = (
        lineitem.select(
            F.col("l_orderkey").alias("invoice_id"),
            "l_extendedprice",
            "l_discount",
        )
        .join(F.broadcast(header.select("invoice_id")), "invoice_id", "left_semi")
        .groupBy("invoice_id")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("invoice_total"),
        )
    )
    return (
        header.join(line_stats, "invoice_id", "left")
        .select(
            "invoice_id",
            "change_version",
            "o_custkey",
            "o_orderstatus",
            "o_totalprice",
            F.coalesce("n_lines", F.lit(0)).alias("n_lines"),
            F.coalesce("invoice_total", F.lit(0.0)).alias("invoice_total"),
        )
        .orderBy(F.col("change_version").asc(), F.col("invoice_id").asc())
    )


_FLAGSHIP_SQL = f"""
WITH {_CHANGELOG_CTES},
latest AS (
  SELECT invoice_id, MAX(change_version) AS change_version
  FROM all_changes WHERE change_version > {SINCE_VERSION}
  GROUP BY invoice_id
),
line_stats AS (
  SELECT l_orderkey AS invoice_id, COUNT(*) AS n_lines,
         ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS invoice_total
  FROM lineitem GROUP BY l_orderkey
)
SELECT a.invoice_id, a.change_version, o.o_custkey, o.o_orderstatus,
       o.o_totalprice,
       COALESCE(s.n_lines, 0) AS n_lines,
       COALESCE(s.invoice_total, 0.0) AS invoice_total
FROM latest a
JOIN orders o ON o.o_orderkey = a.invoice_id
LEFT JOIN line_stats s ON s.invoice_id = a.invoice_id
ORDER BY a.change_version, a.invoice_id
LIMIT {BATCH_LIMIT}
"""


def flagship_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nested-document form of the flagship: each changed invoice as
    header + sorted array of line structs (sqls/storedprocedure.sql:36-52,
    FIXTURES.md §A5). Not SQL-oracle-gated (nested schema); covered by
    pytest against a DuckDB list(struct ORDER BY) twin instead."""
    changes = _all_changes(spark, sf_dir).filter(F.col("change_version") > SINCE_VERSION)
    latest = cdc.latest_per_key(changes, ["invoice_id"])
    orders = tables.load(spark, sf_dir, "orders").withColumnRenamed(
        "o_orderkey", "invoice_id"
    )
    lineitem = tables.load(spark, sf_dir, "lineitem")
    header = orders.join(F.broadcast(latest), "invoice_id", "inner")
    # the bounded batch applies BEFORE assembly — the sproc takes
    # TOP(@Limit) after the header join and only then builds documents
    # (sqls/storedprocedure.sql:35-52), so nesting work is limit-bounded:
    # the line semi-join prunes against ≤limit invoices and the nested
    # side stays broadcast-sized at ANY corpus scale
    header = cdc.bounded_ordered_batch(
        header, BATCH_LIMIT, "change_version", "invoice_id"
    )
    docs = assemble_documents(
        header,
        lineitem,
        key_col="invoice_id",
        header_cols=["invoice_id", "change_version", "o_custkey", "o_totalprice"],
        line_cols=["l_linenumber", "l_partkey", "l_quantity", "l_extendedprice", "l_discount"],
        line_order_col="l_linenumber",
        line_key_col="l_orderkey",
    )
    return docs.select(
        "invoice_id", "change_version", "o_custkey", "o_totalprice", "lines"
    ).orderBy(F.col("change_version").asc(), F.col("invoice_id").asc())


def flagship_documents_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-checkable form of the flagship document query: the nested
    `lines` array serialized to a JSON string column (`lines_json`), so the
    result is flat and value-hashable. Line numeric fields are integer-typed
    (cents) so Spark's Jackson and DuckDB's to_json render byte-identical
    text — both emit compact ``{"k":v}`` with no float formatting involved.

    Mirrors the reference's FOR JSON PATH serialization step
    (sqls/storedprocedure.sql:42-52) more literally than the nested variant:
    the sproc also ships lines as a JSON string, not a typed array.

    Parity constraint: Spark's to_json OMITS null struct fields while
    DuckDB's to_json emits "key":null, so byte-identical lines_json holds
    only while every line column is non-null — true for the TPC-H lineitem
    columns used here. Adding a nullable line column requires coalescing
    it to a sentinel on BOTH sides first.
    """
    changes = _all_changes(spark, sf_dir).filter(F.col("change_version") > SINCE_VERSION)
    latest = cdc.latest_per_key(changes, ["invoice_id"])
    orders = tables.load(spark, sf_dir, "orders").withColumnRenamed(
        "o_orderkey", "invoice_id"
    )
    lineitem = tables.load(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        "l_partkey",
        # round-then-cast so Spark and the oracle's CAST(l_quantity AS
        # BIGINT) share one rounding rule even for non-integral quantities
        # (bare cast("long") truncates; DuckDB CAST rounds to nearest)
        F.round(F.col("l_quantity")).cast("long").alias("qty"),
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("extprice_cents"),
        F.round(F.col("l_discount") * 100).cast("long").alias("discount_pct"),
    )
    header = orders.join(F.broadcast(latest), "invoice_id", "inner")
    # limit before assembly (sproc order: TOP after the header join, then
    # FOR JSON per selected invoice) — see flagship_documents
    header = cdc.bounded_ordered_batch(
        header, BATCH_LIMIT, "change_version", "invoice_id"
    )
    docs = assemble_documents(
        header,
        lineitem,
        key_col="invoice_id",
        header_cols=["invoice_id", "change_version", "o_custkey", "o_totalprice"],
        line_cols=["l_linenumber", "l_partkey", "qty", "extprice_cents", "discount_pct"],
        line_order_col="l_linenumber",
        line_key_col="l_orderkey",
    )
    docs = docs.withColumn("lines_json", F.to_json(F.col("lines"))).drop("lines")
    return docs.orderBy(F.col("change_version").asc(), F.col("invoice_id").asc())


_FLAGSHIP_DOCS_SQL = f"""
WITH {_CHANGELOG_CTES},
latest AS (
  SELECT invoice_id, MAX(change_version) AS change_version
  FROM all_changes WHERE change_version > {SINCE_VERSION}
  GROUP BY invoice_id
),
nested AS (
  SELECT l_orderkey AS invoice_id,
         to_json(list(struct_pack(
           l_linenumber := l_linenumber,
           l_partkey := l_partkey,
           qty := CAST(ROUND(l_quantity, 0) AS BIGINT),
           extprice_cents := CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT),
           discount_pct := CAST(ROUND(l_discount * 100, 0) AS BIGINT)
         ) ORDER BY l_linenumber, l_partkey, CAST(ROUND(l_quantity, 0) AS BIGINT),
                    CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT),
                    CAST(ROUND(l_discount * 100, 0) AS BIGINT)
         )) AS lines_json
  FROM lineitem GROUP BY l_orderkey
)
SELECT a.invoice_id, a.change_version, o.o_custkey, o.o_totalprice,
       COALESCE(n.lines_json, '[]') AS lines_json
FROM latest a
JOIN orders o ON o.o_orderkey = a.invoice_id
LEFT JOIN nested n ON n.invoice_id = a.invoice_id
ORDER BY a.change_version, a.invoice_id
LIMIT {BATCH_LIMIT}
"""


def cdc_changes_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S1+P2: bounded change-log scan on the events stream table —
    rows with since < version <= watermark. Both predicates push to the
    parquet scan."""
    ev = tables.load(spark, sf_dir, "events").select(
        F.col("event_id").alias("change_version"),
        F.col("user_id").alias("key_id"),
        F.col("event_type").alias("op"),
        "value",
    )
    return cdc.changes_in_range(ev, 1000, 5000)


_CHANGES_SCAN_SQL = """
SELECT event_id AS change_version, user_id AS key_id, event_type AS op, value
FROM events WHERE event_id > 1000 AND event_id <= 5000
"""


def cdc_keyset_resume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P3: composite keyset-cursor filter (invoice-api/server.js:165-168) —
    resume after cursor (version=500, key=75) with version ties broken on
    the key. Uses (value-bucket, user) as a tie-heavy (version, key) space."""
    ev = tables.load(spark, sf_dir, "events").select(
        (F.col("event_id") % 1000).alias("change_version"),
        F.col("user_id").alias("key_id"),
        F.col("event_id"),
    )
    return cdc.keyset_filter(ev, 500, 75)


_KEYSET_SQL = """
SELECT event_id % 1000 AS change_version, user_id AS key_id, event_id
FROM events
WHERE (event_id % 1000) > 500 OR ((event_id % 1000) = 500 AND user_id > 75)
"""


def cdc_latest_event_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1 (payload-carrying variant): latest event per user via row_number
    over (user, version desc) — the Spark twin of GROUP BY/MAX + join-back
    (sqls/storedprocedure.sql:28-34), one shuffle instead of two."""
    ev = tables.load(spark, sf_dir, "events")
    latest = cdc.latest_row_per_key(ev, ["user_id"], ["event_id"])
    return latest.select("user_id", "event_id", "event_type", "value")


_LATEST_EVENT_SQL = """
SELECT user_id, event_id, event_type, value
FROM (
  SELECT user_id, event_id, event_type, value,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
  FROM events
) WHERE rn = 1
"""


def cdc_net_changes_enriched(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1+J2: net change per user joined to the customer dim (broadcast) —
    the 'enrich changed keys against the base table' step of the sproc
    (sqls/storedprocedure.sql:55)."""
    ev = tables.load(spark, sf_dir, "events")
    cust = tables.load(spark, sf_dir, "customer")
    latest = ev.groupBy("user_id").agg(
        F.max("event_id").alias("last_version"),
        F.count(F.lit(1)).alias("n_changes"),
        # cents-exact sum: per-row integer cents → bigint SUM → divide
        # (CLAUDE.md hard rule for fractional-double sums over large groups)
        (F.sum(F.round(F.col("value") * 100).cast("long")) / 100.0).alias(
            "total_value"
        ),
    )
    return (
        latest.join(
            F.broadcast(cust), latest.user_id == cust.c_custkey, "inner"
        )
        .select(
            "user_id",
            "last_version",
            "n_changes",
            "total_value",
            "c_name",
            "c_mktsegment",
        )
    )


_NET_CHANGES_SQL = """
SELECT e.user_id, e.last_version, e.n_changes, e.total_value, c.c_name, c.c_mktsegment
FROM (
  SELECT user_id, MAX(event_id) AS last_version, COUNT(*) AS n_changes,
         SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) / 100.0 AS total_value
  FROM events GROUP BY user_id
) e JOIN customer c ON e.user_id = c.c_custkey
"""


def cdc_union_distinct_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U2+A2: distinct changed keys across two change feeds (Readme.md:148
    variant of the union with dedup)."""
    ev = tables.load(spark, sf_dir, "events")
    a = ev.filter(F.col("event_type").isin("click", "view")).select("user_id")
    b = ev.filter(F.col("event_type").isin("purchase", "signup")).select("user_id")
    return a.union(b).distinct()


_UNION_DISTINCT_SQL = """
SELECT user_id FROM events WHERE event_type IN ('click','view')
UNION
SELECT user_id FROM events WHERE event_type IN ('purchase','signup')
"""


def cdc_bounded_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O1: deterministic bounded ordered batch over a tie-heavy version
    space — TOP(k) ORDER BY (version, key), the resume-safe batch shape
    (sqls/storedprocedure.sql:35,56 + SURVEY §7 hard-part 4)."""
    ev = tables.load(spark, sf_dir, "events").select(
        (F.col("event_id") % 500).alias("change_version"),
        F.col("event_id").alias("key_id"),
        "event_type",
    )
    return cdc.bounded_ordered_batch(ev, 200, "change_version", "key_id")


_BOUNDED_BATCH_SQL = """
SELECT event_id % 500 AS change_version, event_id AS key_id, event_type
FROM events ORDER BY change_version, key_id LIMIT 200
"""


def cdc_version_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S3+A7: current high-watermark version + stream extent — the
    CHANGE_TRACKING_CURRENT_VERSION() analog (sqls/storedprocedure.sql:11-12)."""
    ev = tables.load(spark, sf_dir, "events")
    return ev.agg(
        F.max("event_id").alias("current_version"),
        F.min("event_id").alias("min_version"),
        F.count(F.lit(1)).alias("n_changes"),
    )


_WATERMARK_SQL = """
SELECT MAX(event_id) AS current_version, MIN(event_id) AS min_version,
       COUNT(*) AS n_changes
FROM events
"""

def cdc_replica_sync(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Replica merge (operators/cdc.py::apply_changes_to_replica): a
    downstream copy of orders — missing some rows (pending inserts,
    o_orderkey % 17 == 3) and stale on others (o_totalprice = -1 for
    o_orderkey % 5 == 0) — is synced with the latest synthesized change
    feed. Keys with op 'D' (invoice_id % 19 == 0) disappear; every other
    changed key is upserted with the TRUE base values; untouched rows
    keep their (possibly stale) replica values. The oracle materializes
    the same snapshot set-theoretically, so the hash gate proves the
    delete/upsert/survivor partition exact."""
    orders = tables.load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    latest = cdc.latest_per_key(_all_changes(spark, sf_dir), ["invoice_id"]).select(
        F.col("invoice_id").alias("o_orderkey"),
        F.when(F.col("invoice_id") % 19 == 0, "D").otherwise("U").alias("op"),
    )
    replica = orders.filter(F.col("o_orderkey") % 17 != 3).select(
        "o_orderkey",
        "o_custkey",
        F.when(F.col("o_orderkey") % 5 == 0, F.lit(-1.0))
        .otherwise(F.col("o_totalprice"))
        .alias("o_totalprice"),
    )
    return cdc.apply_changes_to_replica(replica, orders, latest, "o_orderkey")


_REPLICA_SYNC_SQL = f"""
WITH {_CHANGELOG_CTES},
latest AS (
  SELECT invoice_id, CASE WHEN invoice_id % 19 = 0 THEN 'D' ELSE 'U' END AS op
  FROM (SELECT DISTINCT invoice_id FROM all_changes)
),
replica AS (
  SELECT o_orderkey, o_custkey,
         CASE WHEN o_orderkey % 5 = 0 THEN -1.0 ELSE o_totalprice END AS o_totalprice
  FROM orders WHERE o_orderkey % 17 <> 3
)
SELECT r.o_orderkey, r.o_custkey, r.o_totalprice
FROM replica r WHERE NOT EXISTS (SELECT 1 FROM latest c WHERE c.invoice_id = r.o_orderkey)
UNION ALL
SELECT o.o_orderkey, o.o_custkey, o.o_totalprice
FROM orders o WHERE EXISTS (
  SELECT 1 FROM latest c WHERE c.invoice_id = o.o_orderkey AND c.op <> 'D'
)
"""


AS_OF_VERSION = 500


def cdc_replica_as_of(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time replica reconstruction — CDC time travel: the state
    the replica had when the version counter read AS_OF_VERSION, rebuilt
    from the base snapshot plus the change-log PREFIX (change_version ≤
    V). The per-key winner is the latest version within the prefix, and
    the delete decision depends on that WINNING VERSION ((key + version)
    % 19), so as-of-V genuinely differs from the latest state — a key
    can be deleted as of V and re-upserted later, or vice versa. Same
    merge operator as cdc_replica_sync (anti ∪ semi, broadcast change
    set, no fact shuffle); the only new cost is the version-prefix
    filter, which rides the changelog scan."""
    orders = tables.load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    prefix = _all_changes(spark, sf_dir).filter(
        F.col("change_version") <= AS_OF_VERSION
    )
    latest = cdc.latest_per_key(prefix, ["invoice_id"]).select(
        F.col("invoice_id").alias("o_orderkey"),
        F.when(
            (F.col("invoice_id") + F.col("change_version")) % 19 == 0, "D"
        ).otherwise("U").alias("op"),
    )
    replica = orders.filter(F.col("o_orderkey") % 17 != 3).select(
        "o_orderkey",
        "o_custkey",
        F.when(F.col("o_orderkey") % 5 == 0, F.lit(-1.0))
        .otherwise(F.col("o_totalprice"))
        .alias("o_totalprice"),
    )
    return cdc.apply_changes_to_replica(replica, orders, latest, "o_orderkey")


_REPLICA_AS_OF_SQL = f"""
WITH {_CHANGELOG_CTES},
latest AS (
  SELECT invoice_id,
         CASE WHEN (invoice_id + v) % 19 = 0 THEN 'D' ELSE 'U' END AS op
  FROM (SELECT invoice_id, MAX(change_version) AS v FROM all_changes
        WHERE change_version <= {AS_OF_VERSION} GROUP BY 1)
),
replica AS (
  SELECT o_orderkey, o_custkey,
         CASE WHEN o_orderkey % 5 = 0 THEN -1.0 ELSE o_totalprice END AS o_totalprice
  FROM orders WHERE o_orderkey % 17 <> 3
)
SELECT r.o_orderkey, r.o_custkey, r.o_totalprice
FROM replica r WHERE NOT EXISTS (SELECT 1 FROM latest c WHERE c.invoice_id = r.o_orderkey)
UNION ALL
SELECT o.o_orderkey, o.o_custkey, o.o_totalprice
FROM orders o WHERE EXISTS (
  SELECT 1 FROM latest c WHERE c.invoice_id = o.o_orderkey AND c.op <> 'D'
)
"""


def cdc_incremental_join_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental join-view maintenance
    (operators/cdc.py::refresh_join_view): a STALE copy of the
    denormalized header⋈line-stats view — wrong line_count/qty_c on
    o_orderkey % 7 == 0 rows, the staleness a missed refresh leaves —
    is repaired using ONLY the invoice keys the synthesized change feed
    touched. Touched rows are rebuilt from the true bases, untouched rows
    keep their (possibly still-wrong) stale values — exactly the
    semantics of an incremental refresh, which the set-theoretic oracle
    pins exactly: rows that are both stale AND untouched must stay
    stale. All sums are integer (qty ×100 → bigint) for cross-engine
    hash parity; the affected-key set broadcasts, so neither base
    re-joins in full."""
    orders = tables.load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = tables.load(spark, sf_dir, "lineitem")
    qty_c = F.round(F.col("l_quantity") * 100, 0).cast("long")
    line_agg = li.groupBy(F.col("l_orderkey").alias("o_orderkey")).agg(
        F.count(F.lit(1)).alias("line_count"),
        F.sum(qty_c).alias("qty_c"),
    )
    true_view = orders.join(line_agg, "o_orderkey")
    stale = F.col("o_orderkey") % 7 == 0
    neg = F.lit(-1).cast("long")
    stale_view = true_view.select(
        "o_orderkey",
        "o_custkey",
        F.when(stale, neg).otherwise(F.col("line_count")).alias("line_count"),
        F.when(stale, neg).otherwise(F.col("qty_c")).alias("qty_c"),
    )
    affected = _all_changes(spark, sf_dir).select(
        F.col("invoice_id").alias("o_orderkey")
    )
    return cdc.refresh_join_view(stale_view, orders, line_agg, affected, "o_orderkey")


_JOIN_VIEW_SQL = f"""
WITH {_CHANGELOG_CTES},
affected AS (SELECT DISTINCT invoice_id FROM all_changes),
line_agg AS (
  SELECT l_orderkey AS o_orderkey,
         COUNT(*) AS line_count,
         CAST(SUM(CAST(ROUND(l_quantity * 100, 0) AS BIGINT)) AS BIGINT) AS qty_c
  FROM lineitem GROUP BY 1
),
true_view AS (
  SELECT o.o_orderkey, o.o_custkey, a.line_count, a.qty_c
  FROM orders o JOIN line_agg a ON a.o_orderkey = o.o_orderkey
),
stale_view AS (
  SELECT o_orderkey, o_custkey,
         CASE WHEN o_orderkey % 7 = 0 THEN CAST(-1 AS BIGINT) ELSE line_count END AS line_count,
         CASE WHEN o_orderkey % 7 = 0 THEN CAST(-1 AS BIGINT) ELSE qty_c END AS qty_c
  FROM true_view
)
SELECT s.o_orderkey, s.o_custkey, s.line_count, s.qty_c
FROM stale_view s
WHERE NOT EXISTS (SELECT 1 FROM affected c WHERE c.invoice_id = s.o_orderkey)
UNION ALL
SELECT t.o_orderkey, t.o_custkey, t.line_count, t.qty_c
FROM true_view t
WHERE EXISTS (SELECT 1 FROM affected c WHERE c.invoice_id = t.o_orderkey)
"""


SCD2_SPLIT = 500


def _scd2_changes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Payload-carrying, tie-free change feed for the SCD2 queries:
    distinct (invoice_id, change_version), op by the (key + version) % 19
    delete rule (shared with cdc_replica_as_of so deletes genuinely
    interleave with upserts along each key's timeline), and a
    version-dependent payload (base cents + version) joined from orders —
    the payload a CHANGETABLE-style feed would carry per change."""
    ch = _all_changes(spark, sf_dir).distinct()
    orders = tables.load(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("invoice_id"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("base_c"),
    )
    return ch.join(orders, "invoice_id").select(
        "invoice_id",
        "change_version",
        F.when(
            (F.col("invoice_id") + F.col("change_version")) % 19 == 0, "D"
        )
        .otherwise("U")
        .alias("op"),
        (F.col("base_c") + F.col("change_version")).alias("total_c"),
    )


def _scd2_out(hist: DataFrame) -> DataFrame:
    return hist.select(
        "invoice_id",
        "valid_from",
        F.coalesce("valid_to", F.lit(-1)).alias("valid_to"),
        "is_current",
        "total_c",
    )


def cdc_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD Type 2 dimension history built from the synthesized change feed
    (operators/cdc.py::scd2_history): one validity interval per non-delete
    change, closed by the key's next change of ANY op — deletes close
    without reopening, so keys with a delete mid-timeline have gaps and
    keys ending in a delete have no current row. One key-partitioned
    window over the feed; the oracle pins interval edges, gap placement,
    and is_current exactly."""
    return _scd2_out(
        cdc.scd2_history(_scd2_changes(spark, sf_dir), ["invoice_id"])
    )


_SCD2_SQL = f"""
WITH {_CHANGELOG_CTES},
cv AS (SELECT DISTINCT invoice_id, change_version FROM all_changes),
feed AS (
  SELECT c.invoice_id, c.change_version,
         CASE WHEN (c.invoice_id + c.change_version) % 19 = 0 THEN 'D' ELSE 'U' END AS op,
         CAST(ROUND(o.o_totalprice * 100, 0) AS BIGINT) + c.change_version AS total_c
  FROM cv c JOIN orders o ON o.o_orderkey = c.invoice_id
),
hist AS (
  SELECT invoice_id, total_c, op, change_version AS valid_from,
         LEAD(change_version) OVER (PARTITION BY invoice_id ORDER BY change_version) AS valid_to
  FROM feed
)
SELECT invoice_id, valid_from, COALESCE(valid_to, -1) AS valid_to,
       CASE WHEN valid_to IS NULL THEN 1 ELSE 0 END AS is_current,
       total_c
FROM hist WHERE op <> 'D'
"""


SCD2_PROBES = [125, 375, 625, 875]


def cdc_scd2_temporal_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal dimension enrichment — the query every SCD2 history
    exists FOR: each (key, as-of version) probe joins to the dimension
    row valid at that version (valid_from ≤ v < valid_to, open rows
    cover everything ≥ valid_from). Probes landing before a key's first
    change or inside a delete gap correctly yield nothing — the
    interval-gap semantics the history build pins. Plan: equi-join on
    the dimension key with a residual range predicate — the standard
    temporal-join shape; per-key interval counts are small by nature, so
    the residual filter is cheap and there is no corpus-wide sort or
    nested loop."""
    feed = _scd2_changes(spark, sf_dir)
    hist = cdc.scd2_history(feed, ["invoice_id"])
    probes = (
        feed.select("invoice_id")
        .distinct()
        .select(
            "invoice_id",
            F.explode(
                F.array(*[F.lit(v).cast("long") for v in SCD2_PROBES])
            ).alias("probe_v"),
        )
    )
    return (
        probes.join(hist, "invoice_id")
        .filter(
            (F.col("valid_from") <= F.col("probe_v"))
            & (F.col("valid_to").isNull() | (F.col("probe_v") < F.col("valid_to")))
        )
        .select("invoice_id", "probe_v", "total_c", "valid_from")
        .orderBy("invoice_id", "probe_v")
    )


_SCD2_TEMPORAL_SQL = f"""
WITH {_CHANGELOG_CTES},
cv AS (SELECT DISTINCT invoice_id, change_version FROM all_changes),
feed AS (
  SELECT c.invoice_id, c.change_version,
         CASE WHEN (c.invoice_id + c.change_version) % 19 = 0 THEN 'D' ELSE 'U' END AS op,
         CAST(ROUND(o.o_totalprice * 100, 0) AS BIGINT) + c.change_version AS total_c
  FROM cv c JOIN orders o ON o.o_orderkey = c.invoice_id
),
hist AS (
  SELECT invoice_id, total_c, op, change_version AS valid_from,
         LEAD(change_version) OVER (PARTITION BY invoice_id ORDER BY change_version) AS valid_to
  FROM feed
),
dim AS (SELECT invoice_id, total_c, valid_from, valid_to FROM hist WHERE op <> 'D'),
probes AS (
  SELECT DISTINCT f.invoice_id, CAST(p.v AS BIGINT) AS probe_v
  FROM feed f, (VALUES {", ".join(f"({v})" for v in SCD2_PROBES)}) p(v)
)
SELECT p.invoice_id, p.probe_v, d.total_c, d.valid_from
FROM probes p
JOIN dim d ON d.invoice_id = p.invoice_id
 AND d.valid_from <= p.probe_v
 AND (d.valid_to IS NULL OR p.probe_v < d.valid_to)
ORDER BY p.invoice_id, p.probe_v
"""


def cdc_scd2_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental SCD2 maintenance (operators/cdc.py::scd2_apply): the
    history is built from the version prefix ≤ {split}, then the suffix is
    merged as a new CDC batch — touched keys' open rows close at the
    batch's first version, batch changes chain into new intervals,
    untouched keys are never recomputed. The oracle is the FULL-recompute
    history, so the hash gate proves incremental == full through closes,
    deletes-first, re-inserts, and untouched keys."""
    feed = _scd2_changes(spark, sf_dir)
    hist = cdc.scd2_history(
        feed.filter(F.col("change_version") <= SCD2_SPLIT), ["invoice_id"]
    )
    batch = feed.filter(F.col("change_version") > SCD2_SPLIT)
    return _scd2_out(cdc.scd2_apply(hist, batch, ["invoice_id"]))


DIFF_V_LOW = 250
DIFF_V_HIGH = 500


def cdc_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot-range diff (operators/cdc.py::snapshot_diff): how the
    replica state as of version {high} differs from as of {low} — per key
    I/U/D, using the same winner-version delete rule as cdc_replica_as_of
    so a key can flip presence across the range. One version-bounded
    groupBy, no join, no snapshot materialization; keys whose winner
    didn't move between the two versions drop out."""
    return cdc.snapshot_diff(
        _all_changes(spark, sf_dir),
        "invoice_id",
        DIFF_V_LOW,
        DIFF_V_HIGH,
        lambda k, v: (k + v) % 19 != 0,
    )


_SNAPSHOT_DIFF_SQL = f"""
WITH {_CHANGELOG_CTES},
g AS (
  SELECT invoice_id,
         MAX(CASE WHEN change_version <= {DIFF_V_LOW} THEN change_version END) AS w_low,
         MAX(change_version) AS w_high
  FROM all_changes WHERE change_version <= {DIFF_V_HIGH} GROUP BY invoice_id
),
c AS (
  SELECT invoice_id, w_low, w_high,
         (w_low IS NOT NULL AND (invoice_id + w_low) % 19 <> 0) AS p_low,
         ((invoice_id + w_high) % 19 <> 0) AS p_high
  FROM g
)
SELECT invoice_id,
       CASE WHEN NOT p_low AND p_high THEN 'I'
            WHEN p_low AND NOT p_high THEN 'D'
            ELSE 'U' END AS diff_op,
       COALESCE(w_low, -1) AS v_low_winner,
       w_high AS v_high_winner
FROM c
WHERE (NOT p_low AND p_high) OR (p_low AND NOT p_high)
   OR (p_low AND p_high AND w_high > w_low)
"""


QUERIES: dict[str, QueryEntry] = {
    "cdc_flagship_changed_invoices": QueryEntry(flagship_changed_invoices, _FLAGSHIP_SQL),
    # driver-checkable JSON-serialized form (the nested array<struct> form,
    # flagship_documents, stays for the streaming pipeline + pytest oracle —
    # the driver's canonicalizer can't hash nested arrays)
    "cdc_flagship_documents": QueryEntry(flagship_documents_json, _FLAGSHIP_DOCS_SQL),
    "cdc_changes_scan": QueryEntry(cdc_changes_scan, _CHANGES_SCAN_SQL),
    "cdc_keyset_resume": QueryEntry(cdc_keyset_resume, _KEYSET_SQL),
    "cdc_latest_event_per_user": QueryEntry(cdc_latest_event_per_user, _LATEST_EVENT_SQL),
    "cdc_net_changes_enriched": QueryEntry(cdc_net_changes_enriched, _NET_CHANGES_SQL),
    "cdc_union_distinct_keys": QueryEntry(cdc_union_distinct_keys, _UNION_DISTINCT_SQL),
    "cdc_bounded_batch": QueryEntry(cdc_bounded_batch, _BOUNDED_BATCH_SQL),
    "cdc_version_watermark": QueryEntry(cdc_version_watermark, _WATERMARK_SQL),
    "cdc_replica_sync": QueryEntry(cdc_replica_sync, _REPLICA_SYNC_SQL),
    "cdc_replica_as_of": QueryEntry(cdc_replica_as_of, _REPLICA_AS_OF_SQL),
    "cdc_incremental_join_view": QueryEntry(cdc_incremental_join_view, _JOIN_VIEW_SQL),
    "cdc_scd2_history": QueryEntry(cdc_scd2_history, _SCD2_SQL),
    # incremental == full recompute: the oracle is deliberately the same
    # full-history SQL, so the driver hash proves the merge identity
    "cdc_scd2_incremental": QueryEntry(cdc_scd2_incremental, _SCD2_SQL),
    "cdc_scd2_temporal_join": QueryEntry(
        cdc_scd2_temporal_join, _SCD2_TEMPORAL_SQL
    ),
    "cdc_snapshot_diff": QueryEntry(cdc_snapshot_diff, _SNAPSHOT_DIFF_SQL),
}
