"""Scalar-function coverage (SURVEY.md §2.8, F1-F14) — each reference
function re-expressed with built-in pyspark.sql.functions (JVM-side,
codegen'd; no Python UDFs) and oracle-matched against DuckDB.

Portable 60-bit hash: both engines md5() the same string and read the
first 15 hex digits as a bigint — the deterministic stand-in for the
reference's ABS(CHECKSUM(NEWID())) randomness (sqls/insert-invoices.sql:63-64)
that still hash-matches across engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from sql_cdc_spark import tables
from sql_cdc_spark.queries import QueryEntry


def portable_hash60(col: Column) -> Column:
    """Deterministic 60-bit hash usable identically in Spark and DuckDB:
    bigint of the first 15 hex chars of md5(string)."""
    return F.conv(F.substring(F.md5(col.cast("string")), 1, 15), 16, 10).cast("long")


def fn_invoice_numbering(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1+F2+F3: CONCAT / zero-pad / CAST — the reference's key-synthesis
    idioms 'INV-'+n, 'CUST-'+pad(n,6), RIGHT('000000'+n,6)
    (sqls/insert-invoices.sql:34-35,62)."""
    orders = tables.load(spark, sf_dir, "orders")
    return orders.select(
        F.col("o_orderkey").alias("invoice_id"),
        F.concat(F.lit("INV-"), (F.col("o_orderkey") + 300000).cast("string")).alias(
            "invoice_number"
        ),
        F.concat(
            F.lit("CUST-"), F.lpad(F.col("o_custkey").cast("string"), 6, "0")
        ).alias("customer_code"),
        F.expr("right(concat('000000', cast(o_custkey as string)), 6)").alias(
            "padded_right"
        ),
    )


_INVOICE_NUMBERING_SQL = """
SELECT o_orderkey AS invoice_id,
       'INV-' || CAST(o_orderkey + 300000 AS VARCHAR) AS invoice_number,
       'CUST-' || LPAD(CAST(o_custkey AS VARCHAR), 6, '0') AS customer_code,
       RIGHT('000000' || CAST(o_custkey AS VARCHAR), 6) AS padded_right
FROM orders
"""


def fn_date_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F4+F6+F7: DATEADD-with-modulo, date parts, DATEDIFF in days and
    epoch millis (sqls/insert-invoices.sql:36,43-44)."""
    orders = tables.load(spark, sf_dir, "orders")
    d = F.col("o_orderdate").cast("date")
    return orders.select(
        F.col("o_orderkey").alias("invoice_id"),
        d.alias("order_date"),
        F.date_add(d, F.pmod(F.col("o_orderkey"), F.lit(365)).cast("int")).alias(
            "due_date"
        ),
        F.year(d).alias("order_year"),
        F.month(d).alias("order_month"),
        F.datediff(F.lit("1999-01-01").cast("date"), d).alias("days_to_cutoff"),
        # cast: the loader emits TIMESTAMP_NTZ; session TZ is UTC so the
        # LTZ reinterpretation matches DuckDB's naive epoch_ms
        F.unix_millis(F.col("o_orderdate").cast("timestamp")).alias("epoch_ms"),
    )


_DATE_ARITH_SQL = """
SELECT o_orderkey AS invoice_id,
       CAST(o_orderdate AS DATE) AS order_date,
       CAST(o_orderdate AS DATE) + CAST(o_orderkey % 365 AS INTEGER) AS due_date,
       CAST(year(o_orderdate) AS INTEGER) AS order_year,
       CAST(month(o_orderdate) AS INTEGER) AS order_month,
       date_diff('day', CAST(o_orderdate AS DATE), DATE '1999-01-01') AS days_to_cutoff,
       epoch_ms(o_orderdate) AS epoch_ms
FROM orders
"""


def fn_hash_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F5 analog: deterministic uniform bucketing via the portable 60-bit
    md5 hash (reference uses ABS(CHECKSUM(NEWID())) % k,
    sqls/insert-invoices.sql:63-64 — replaced by a reproducible hash so
    both engines agree)."""
    cust = tables.load(spark, sf_dir, "customer")
    h = portable_hash60(F.col("c_custkey"))
    return cust.select(
        "c_custkey",
        h.alias("hash60"),
        F.pmod(h, F.lit(10)).cast("long").alias("bucket"),
    )


_HASH_BUCKET_SQL = """
SELECT c_custkey,
       CAST(('0x' || substring(md5(CAST(c_custkey AS VARCHAR)), 1, 15)) AS BIGINT) AS hash60,
       CAST(('0x' || substring(md5(CAST(c_custkey AS VARCHAR)), 1, 15)) AS BIGINT) % 10 AS bucket
FROM customer
"""


def fn_timestamp_format(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F10: the sink filename timestamp format yyyyMMdd_HHmmss
    (invoice-api/server.js:64-65) plus the full document filename
    {InvoiceNumber}_v{version}_{ts}."""
    ev = tables.load(spark, sf_dir, "events")
    return ev.select(
        F.col("event_id"),
        F.date_format("ts", "yyyyMMdd_HHmmss").alias("ts_compact"),
        F.concat(
            F.lit("INV-"),
            F.col("user_id").cast("string"),
            F.lit("_v"),
            F.col("event_id").cast("string"),
            F.lit("_"),
            F.date_format("ts", "yyyyMMdd_HHmmss"),
            F.lit(".bson"),
        ).alias("doc_filename"),
    )


_TS_FORMAT_SQL = """
SELECT event_id,
       strftime(ts, '%Y%m%d_%H%M%S') AS ts_compact,
       'INV-' || CAST(user_id AS VARCHAR) || '_v' || CAST(event_id AS VARCHAR)
         || '_' || strftime(ts, '%Y%m%d_%H%M%S') || '.bson' AS doc_filename
FROM events
"""


def fn_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F9+F8+F14: JSON parse of the props payload column (the Lines
    JSON.parse of invoice-api/server.js:161), null-coalescing default, and
    a rebuilt JSON string (FOR JSON PATH analog, built with concat so both
    engines emit identical bytes)."""
    ev = tables.load(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return ev.select(
        "event_id",
        F.coalesce(k, F.lit(0)).alias("k_value"),
        F.concat(
            F.lit('{"event":'),
            F.col("event_id").cast("string"),
            F.lit(',"k":'),
            F.coalesce(k, F.lit(0)).cast("string"),
            F.lit("}"),
        ).alias("doc_json"),
    )


_JSON_EXTRACT_SQL = """
SELECT event_id,
       COALESCE(CAST(json_extract_string(props, '$.k') AS INTEGER), 0) AS k_value,
       '{"event":' || CAST(event_id AS VARCHAR) || ',"k":'
         || CAST(COALESCE(CAST(json_extract_string(props, '$.k') AS INTEGER), 0) AS VARCHAR)
         || '}' AS doc_json
FROM events
"""


def fn_string_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F12+F13+F14: endsWith filter, regexp_replace, split, CASE-WHEN
    banding (the duration pretty-printer shape, invoice-api/server.js:55-59),
    and coalesce/nullif. The filter suffix 'E' matches the synthetic part
    table's LARGE type (~1/6 of rows) so the gate compares real rows —
    an empty-vs-empty green verifies nothing."""
    part = tables.load(spark, sf_dir, "part")
    return part.filter(F.col("p_type").endswith("E")).select(
        "p_partkey",
        F.regexp_replace("p_name", "[aeiou]", "").alias("name_novowels"),
        F.size(F.split("p_type", " ")).alias("type_words"),
        F.when(F.col("p_retailprice") < 1000, "cheap")
        .when(F.col("p_retailprice") < 1500, "mid")
        .otherwise("premium")
        .alias("price_band"),
        F.coalesce(F.nullif("p_brand", F.lit("Brand#00")), F.lit("UNKNOWN")).alias(
            "brand_or_unknown"
        ),
    )


_STRING_OPS_SQL = """
SELECT p_partkey,
       regexp_replace(p_name, '[aeiou]', '', 'g') AS name_novowels,
       CAST(len(string_split(p_type, ' ')) AS INTEGER) AS type_words,
       CASE WHEN p_retailprice < 1000 THEN 'cheap'
            WHEN p_retailprice < 1500 THEN 'mid'
            ELSE 'premium' END AS price_band,
       COALESCE(NULLIF(p_brand, 'Brand#00'), 'UNKNOWN') AS brand_or_unknown
FROM part
WHERE p_type LIKE '%E'
"""

def fn_bson_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F11: BSON encode/decode byte parity (BSON.serialize/deserialize,
    invoice-api/server.js:69,412) through the pure-Python spec codec
    (functions/bsoncodec.py), Arrow-batched. Per event row: build a
    deterministic two-field JSON doc, encode to BSON, decode back, and
    emit (a) the decoded field — must equal the directly-computed value,
    (b) the encoded byte count — closed-form from the spec (4-byte len +
    [1 type + 6 name + 4 int32] + [1 + 2 + 4] + 1 terminator = 23; an
    event_id past int32 becomes a js-bson double, +4), and (c) the
    roundtrip-equality boolean. The oracle computes (a) directly, (b)
    from the same arithmetic, and TRUE for (c) — so the hash gate fails
    if the codec mangles bytes, values, or key order."""
    from sql_cdc_spark.functions import bsoncodec

    ev = tables.load(spark, sf_dir, "events")
    k = F.coalesce(F.get_json_object("props", "$.k").cast("int"), F.lit(0))
    doc = ev.select(
        "event_id",
        F.concat(
            F.lit('{"event":'),
            F.col("event_id").cast("string"),
            F.lit(',"k":'),
            k.cast("string"),
            F.lit("}"),
        ).alias("doc_json"),
    )
    enc = doc.withColumn("bson", bsoncodec.json_to_bson(F.col("doc_json")))
    dec = enc.withColumn("decoded_json", bsoncodec.bson_to_json(F.col("bson")))
    return dec.select(
        "event_id",
        F.octet_length("bson").alias("bson_bytes"),
        F.get_json_object("decoded_json", "$.k").cast("int").alias("k_decoded"),
        (F.col("decoded_json") == F.col("doc_json")).alias("bson_ok"),
    )


_BSON_ROUNDTRIP_SQL = """
SELECT event_id,
       CASE WHEN event_id > 2147483647 THEN 27 ELSE 23 END AS bson_bytes,
       COALESCE(CAST(json_extract_string(props, '$.k') AS INTEGER), 0) AS k_decoded,
       TRUE AS bson_ok
FROM events
"""


QUERIES: dict[str, QueryEntry] = {
    "fn_invoice_numbering": QueryEntry(fn_invoice_numbering, _INVOICE_NUMBERING_SQL),
    "fn_date_arithmetic": QueryEntry(fn_date_arithmetic, _DATE_ARITH_SQL),
    "fn_hash_bucket": QueryEntry(fn_hash_bucket, _HASH_BUCKET_SQL),
    "fn_timestamp_format": QueryEntry(fn_timestamp_format, _TS_FORMAT_SQL),
    "fn_json_extract": QueryEntry(fn_json_extract, _JSON_EXTRACT_SQL),
    "fn_string_ops": QueryEntry(fn_string_ops, _STRING_OPS_SQL),
    "fn_bson_roundtrip": QueryEntry(fn_bson_roundtrip, _BSON_ROUNDTRIP_SQL),
}
