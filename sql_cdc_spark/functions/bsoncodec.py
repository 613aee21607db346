"""BSON document codec — byte-parity with the reference's document files.

The reference serializes every invoice document to a ``.bson`` file with
js-bson (``BSON.serialize`` invoice-api/server.js:69) and reads them back
with ``BSON.deserialize`` (invoice-api/server.js:412). This module is a
pure-Python implementation of the public BSON spec (bsonspec.org, version
1.1) covering every type js-bson emits for plain JSON-shaped documents,
so reference-produced files decode here and documents encoded here are
byte-identical to what the reference would write.

Number encoding follows js-bson's convention for JS ``Number`` values:
an integral value inside int32 range becomes type 0x10 (int32); any
other Number becomes 0x01 (double) — JS has no int64 Number. Python
callers that need lossless big integers can pass ``js_numbers=False`` to
get type 0x12 (int64) instead; decode accepts all three regardless.

Spark-side, documents cross the codec as Arrow batches
(``pandas_udf``) — never row-at-a-time Python. At 100 TB the codec is a
map-only stage: no shuffle, no driver involvement, parallel per file
split; the binary column stays opaque to the JVM exactly like the
multimodal payload columns (functions/multimodal.py).
"""

from __future__ import annotations

import datetime as _dt
import json
import struct
from typing import Any

from pyspark.sql import functions as F
from pyspark.sql.types import BinaryType, StringType

_INT32_MIN, _INT32_MAX = -(2**31), 2**31 - 1
_INT64_MIN, _INT64_MAX = -(2**63), 2**63 - 1

# element type bytes (bsonspec.org §Elements)
_T_DOUBLE = 0x01
_T_STRING = 0x02
_T_DOC = 0x03
_T_ARRAY = 0x04
_T_BINARY = 0x05
_T_BOOL = 0x08
_T_DATETIME = 0x09
_T_NULL = 0x0A
_T_INT32 = 0x10
_T_TIMESTAMP = 0x11
_T_INT64 = 0x12


def _encode_element(name: str, value: Any, js_numbers: bool) -> bytes:
    """One element: type byte + cstring name + payload."""
    key = name.encode("utf-8") + b"\x00"
    if value is None:
        return bytes([_T_NULL]) + key
    if isinstance(value, bool):  # before int: bool is an int subclass
        return bytes([_T_BOOL]) + key + (b"\x01" if value else b"\x00")
    if isinstance(value, int):
        if _INT32_MIN <= value <= _INT32_MAX:
            return bytes([_T_INT32]) + key + struct.pack("<i", value)
        if js_numbers:
            # js-bson writes non-int32 Numbers as double (JS has no int64)
            return bytes([_T_DOUBLE]) + key + struct.pack("<d", float(value))
        if _INT64_MIN <= value <= _INT64_MAX:
            return bytes([_T_INT64]) + key + struct.pack("<q", value)
        raise ValueError(f"integer out of int64 range for BSON: {name}={value}")
    if isinstance(value, float):
        return bytes([_T_DOUBLE]) + key + struct.pack("<d", value)
    if isinstance(value, str):
        raw = value.encode("utf-8") + b"\x00"
        return bytes([_T_STRING]) + key + struct.pack("<i", len(raw)) + raw
    if isinstance(value, _dt.datetime):
        ms = int(value.timestamp() * 1000)
        return bytes([_T_DATETIME]) + key + struct.pack("<q", ms)
    if isinstance(value, (bytes, bytearray)):
        b = bytes(value)
        # subtype 0x00 = generic binary
        return bytes([_T_BINARY]) + key + struct.pack("<i", len(b)) + b"\x00" + b
    if isinstance(value, dict):
        return bytes([_T_DOC]) + key + encode_document(value, js_numbers=js_numbers)
    if isinstance(value, (list, tuple)):
        as_doc = {str(i): v for i, v in enumerate(value)}
        return bytes([_T_ARRAY]) + key + encode_document(as_doc, js_numbers=js_numbers)
    raise TypeError(f"unsupported BSON value type for key {name!r}: {type(value)}")


def encode_document(doc: dict[str, Any], js_numbers: bool = True) -> bytes:
    """dict → BSON bytes (bsonspec.org: int32 total_len, elements, 0x00).

    Key order is preserved — BSON documents are ordered, and js-bson
    serializes JS object-property order, so parity requires the caller
    to supply keys in the reference's order (JSON parse order does this
    naturally)."""
    body = b"".join(_encode_element(k, v, js_numbers) for k, v in doc.items())
    return struct.pack("<i", len(body) + 5) + body + b"\x00"


def _read_cstring(data: bytes, pos: int) -> tuple[str, int]:
    end = data.index(b"\x00", pos)
    return data[pos:end].decode("utf-8"), end + 1


def _decode_element(data: bytes, pos: int) -> tuple[str, Any, int]:
    etype = data[pos]
    name, pos = _read_cstring(data, pos + 1)
    if etype == _T_DOUBLE:
        return name, struct.unpack_from("<d", data, pos)[0], pos + 8
    if etype == _T_STRING:
        (slen,) = struct.unpack_from("<i", data, pos)
        s = data[pos + 4 : pos + 4 + slen - 1].decode("utf-8")
        return name, s, pos + 4 + slen
    if etype in (_T_DOC, _T_ARRAY):
        (dlen,) = struct.unpack_from("<i", data, pos)
        sub = decode_document(data[pos : pos + dlen])
        if etype == _T_ARRAY:
            return name, [sub[str(i)] for i in range(len(sub))], pos + dlen
        return name, sub, pos + dlen
    if etype == _T_BINARY:
        (blen,) = struct.unpack_from("<i", data, pos)
        # skip the subtype byte; all subtypes decode to raw bytes here
        return name, data[pos + 5 : pos + 5 + blen], pos + 5 + blen
    if etype == _T_BOOL:
        return name, data[pos] != 0, pos + 1
    if etype == _T_DATETIME:
        (ms,) = struct.unpack_from("<q", data, pos)
        dt = _dt.datetime.fromtimestamp(ms / 1000.0, tz=_dt.timezone.utc)
        return name, dt, pos + 8
    if etype == _T_NULL:
        return name, None, pos
    if etype == _T_INT32:
        return name, struct.unpack_from("<i", data, pos)[0], pos + 4
    if etype == _T_TIMESTAMP:  # Mongo replication-oplog type; expose as raw int64
        return name, struct.unpack_from("<q", data, pos)[0], pos + 8
    if etype == _T_INT64:
        return name, struct.unpack_from("<q", data, pos)[0], pos + 8
    raise ValueError(f"unsupported BSON element type 0x{etype:02x} at byte {pos}")


def decode_document(data: bytes) -> dict[str, Any]:
    """BSON bytes → dict. Validates the length prefix and terminator."""
    (total,) = struct.unpack_from("<i", data, 0)
    if total != len(data):
        raise ValueError(f"BSON length prefix {total} != buffer size {len(data)}")
    if data[-1] != 0:
        raise ValueError("BSON document missing trailing 0x00")
    out: dict[str, Any] = {}
    pos = 4
    while data[pos] != 0:
        name, value, pos = _decode_element(data, pos)
        out[name] = value
    return out


# ---------------------------------------------------------------------------
# Spark column wrappers (Arrow-batched)

def json_to_bson(col):
    """JSON-string column → BSON binary column. Key order and js-bson
    number typing are preserved, so output bytes match what the reference
    writes for the same JSON (invoice-api/server.js:69)."""

    @F.pandas_udf(BinaryType())
    def _enc(s):
        return s.map(lambda j: encode_document(json.loads(j)) if j is not None else None)

    return _enc(col)


def bson_to_json(col):
    """BSON binary column → compact JSON-string column (the reference's
    read path, invoice-api/server.js:412 → res.json)."""

    @F.pandas_udf(StringType())
    def _dec(s):
        return s.map(
            lambda b: json.dumps(decode_document(bytes(b)), separators=(",", ":"))
            if b is not None
            else None
        )

    return _dec(col)
