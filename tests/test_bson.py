"""BSON codec (F11): spec golden vectors, roundtrip properties, js-bson
number-typing parity, and the .bson per-record sink/reader
(invoice-api/server.js:62-80,401-421)."""

import json
import os

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from sql_cdc_spark.functions import bsoncodec as bc


# --- golden vectors straight from bsonspec.org ("BSON by example") ------

def test_spec_vector_hello_world():
    expected = (
        b"\x16\x00\x00\x00\x02hello\x00\x06\x00\x00\x00world\x00\x00"
    )
    assert bc.encode_document({"hello": "world"}) == expected
    assert bc.decode_document(expected) == {"hello": "world"}


def test_spec_vector_mixed_array():
    expected = (
        b"1\x00\x00\x00\x04BSON\x00&\x00\x00\x00\x020\x00\x08\x00\x00\x00"
        b"awesome\x00\x011\x00333333\x14@\x102\x00\xc2\x07\x00\x00\x00\x00"
    )
    doc = {"BSON": ["awesome", 5.05, 1986]}
    assert bc.encode_document(doc) == expected
    assert bc.decode_document(expected) == doc


# --- js-bson number-typing parity ---------------------------------------

def test_int32_fits_is_int32():
    data = bc.encode_document({"v": 1986})
    assert data[4] == 0x10 and len(data) == 4 + (1 + 2 + 4) + 1


def test_big_int_is_double_in_js_mode_int64_otherwise():
    js = bc.encode_document({"v": 2**40})
    assert js[4] == 0x01  # double, like js-bson for a non-int32 Number
    assert bc.decode_document(js)["v"] == float(2**40)
    precise = bc.encode_document({"v": 2**40}, js_numbers=False)
    assert precise[4] == 0x12  # int64
    assert bc.decode_document(precise)["v"] == 2**40


def test_bool_is_not_int():
    data = bc.encode_document({"t": True, "f": False})
    assert data[4] == 0x08
    assert bc.decode_document(data) == {"t": True, "f": False}


# --- roundtrip properties ------------------------------------------------

_scalar = st.one_of(
    st.none(),
    st.booleans(),
    st.integers(min_value=-(2**31), max_value=2**31 - 1),
    st.floats(allow_nan=False, allow_infinity=False),
    st.text(max_size=40).filter(lambda s: "\x00" not in s),
)
_value = st.recursive(
    _scalar,
    lambda inner: st.one_of(
        st.lists(inner, max_size=5),
        st.dictionaries(
            st.text(min_size=1, max_size=10).filter(lambda s: "\x00" not in s),
            inner,
            max_size=5,
        ),
    ),
    max_leaves=20,
)


@settings(max_examples=200, deadline=None)
@given(st.dictionaries(st.text(min_size=1, max_size=10).filter(lambda s: "\x00" not in s), _value, max_size=6))
def test_roundtrip_any_json_shaped_doc(doc):
    assert bc.decode_document(bc.encode_document(doc)) == doc


def test_roundtrip_preserves_key_order():
    doc = {"z": 1, "a": 2, "m": {"q": 1, "b": 2}}
    out = bc.decode_document(bc.encode_document(doc))
    assert list(out) == ["z", "a", "m"] and list(out["m"]) == ["q", "b"]


def test_binary_and_nested_roundtrip():
    doc = {"blob": b"\x00\x01\xff", "nested": {"lines": [{"n": 1}, {"n": 2}]}}
    assert bc.decode_document(bc.encode_document(doc)) == doc


def test_length_prefix_validation():
    good = bc.encode_document({"a": 1})
    with pytest.raises(ValueError):
        bc.decode_document(good[:-2] + b"\x00")  # truncated


# --- Spark column wrappers + .bson sink ---------------------------------

def test_spark_json_bson_roundtrip_columns(spark):
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(1, '{"event":1,"k":7}'), (2, '{"event":2,"k":0}')], "id long, j string"
    )
    out = (
        df.withColumn("b", bc.json_to_bson(F.col("j")))
        .withColumn("back", bc.bson_to_json(F.col("b")))
        .select("id", "j", "back", F.octet_length("b").alias("n"))
        .collect()
    )
    for r in out:
        assert r.back == r.j
        assert r.n == 23  # 4 + (1+6+4) + (1+2+4) + 1


def test_bson_sink_and_reader(spark, tmp_path):
    from pyspark.sql import functions as F

    from sql_cdc_spark.streaming import pipeline as pl

    docs = spark.createDataFrame(
        [(1, 5), (2, 9)], "invoice_id long, v long"
    ).select(
        F.concat(F.col("invoice_id").cast("string"), F.lit("_v"), F.col("v").cast("string"), F.lit(".json")).alias("doc_filename"),
        F.to_json(F.struct("invoice_id", "v")).alias("doc_json"),
    )
    out = str(tmp_path / "bson_docs")
    n = pl.write_documents_bson(docs, out)
    assert n == 2
    files = sorted(os.listdir(out))
    assert files == ["1_v5.bson", "2_v9.bson"]
    # bytes on disk are exactly the codec's output for the same JSON
    with open(os.path.join(out, "1_v5.bson"), "rb") as f:
        raw = f.read()
    assert raw == bc.encode_document({"invoice_id": 1, "v": 5})
    # S8 reader dispatches on extension
    assert pl.read_document(out, "1_v5.bson") == {"invoice_id": 1, "v": 5}
    # S7 listing with the reference's suffix filter (server.js:373)
    listed = pl.list_documents(spark, out, suffix=".bson")
    assert listed.count() == 2
    # idempotent re-write: same count, same bytes
    assert pl.write_documents_bson(docs, out) == 2
    with open(os.path.join(out, "1_v5.bson"), "rb") as f:
        assert f.read() == raw


def test_reference_produced_file_decodes(tmp_path):
    """A file with js-bson's exact byte layout for a reference invoice doc
    (int32 ids, string number, double amount, array of line subdocs)
    decodes losslessly — the 'switch engines and read your old files'
    guarantee."""
    invoice = {
        "invoiceId": 42,
        "invoiceNumber": "INV-000042",
        "changeVersion": 7,
        "totalAmount": 123.45,
        "lines": [
            {"lineNumber": 1, "qty": 3, "unitPrice": 10.5},
            {"lineNumber": 2, "qty": 1, "unitPrice": 91.95},
        ],
    }
    p = tmp_path / "INV-000042_v7_20260101_000000.bson"
    p.write_bytes(bc.encode_document(invoice))
    assert bc.decode_document(p.read_bytes()) == invoice
