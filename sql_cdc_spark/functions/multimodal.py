"""Multimodal (image/audio/video) columns as opaque binary + typed metadata.

Layout: one row per media object —
    media_id  long
    kind      string            ('image' | 'audio' | 'video')
    payload   binary            (opaque encoded bytes)
    meta      struct<width int, height int, sample_rate int,
                     n_frames int, mime string>

The decode/feature/resize/frame-sample stages run as Arrow-batched Pandas
functions over ``mapInPandas`` — the real 100 TB shape: payload bytes never
pass through the driver, each task streams column batches through Python,
and batch memory is bounded by spark.sql.execution.arrow.maxRecordsPerBatch.

Real codecs (PIL/libav) are not in this container, so decode is STUBBED:
`_decode_image` raises NotImplementedError when a real decode is demanded
and otherwise computes deterministic byte-level features (length, mean
byte, md5) that a DuckDB oracle can verify — which gates the PLUMBING
(schema, Arrow binary round-trip, batch iteration) end-to-end.

The media table itself is synthesized deterministically from `documents`
with expressions that exist in both engines (encode/UTF-8, repeat,
substring), so every stage stays oracle-checkable.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

if TYPE_CHECKING:
    import pandas as pd

FRAME_BYTES = 64  # synthetic video "frame" size in bytes

META_FIELDS = StructType(
    [
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("sample_rate", IntegerType()),
        StructField("n_frames", IntegerType()),
        StructField("mime", StringType()),
    ]
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),
        StructField("payload", BinaryType()),
        StructField("meta", META_FIELDS),
    ]
)


def media_table(docs: DataFrame) -> DataFrame:
    """Deterministic synthetic media over `documents`: kind cycles by
    doc_id, payload = UTF-8 bytes of the doc text (repeated ×2 for video
    so frame sampling has material), meta derived arithmetically. Every
    expression has an exact DuckDB twin, keeping downstream stages
    oracle-gated."""
    kind = (
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("video")
    )
    payload_text = F.when(
        F.col("doc_id") % 3 == 2, F.concat(F.col("text"), F.col("text"))
    ).otherwise(F.col("text"))
    return docs.select(
        F.col("doc_id").alias("media_id"),
        kind.alias("kind"),
        F.encode(payload_text, "UTF-8").alias("payload"),
        F.struct(
            (F.col("doc_id") % 7 * 64 + 64).cast("int").alias("width"),
            (F.col("doc_id") % 5 * 64 + 64).cast("int").alias("height"),
            (F.lit(16000)).alias("sample_rate"),
            F.floor(F.length("text") * 2 / FRAME_BYTES).cast("int").alias("n_frames"),
            F.concat(
                F.lit("application/x-"),
                kind,
            ).alias("mime"),
        ).alias("meta"),
    )


def _decode_image(payload: bytes, *, real: bool = False) -> bytes:
    """STUB decode. A production build imports the codec here; this
    container has none, so `real=True` raises and the deterministic
    byte-identity fake stands in for tests."""
    if real:
        raise NotImplementedError(
            "image codec not available in this environment; "
            "install PIL/torchvision and route real=True"
        )
    return payload


FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),
        StructField("n_bytes", LongType()),
        StructField("mean_byte", DoubleType()),
        StructField("digest", StringType()),
    ]
)


def decode_features(media: DataFrame) -> DataFrame:
    """Per-object byte-level features via mapInPandas: payload length,
    mean byte value, md5 digest. Runs decode (stubbed) + numpy per Arrow
    batch — the exact plumbing a real feature extractor uses; the md5
    column lets DuckDB verify the binary round-trip bit-for-bit."""
    import hashlib

    import numpy as np

    def extract(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            payloads = [_decode_image(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": [len(p) for p in payloads],
                    "mean_byte": [
                        round(float(np.frombuffer(p, dtype=np.uint8).mean()), 6)
                        if len(p)
                        else 0.0
                        for p in payloads
                    ],
                    "digest": [hashlib.md5(p).hexdigest() for p in payloads],
                }
            )

    return media.select("media_id", "kind", "payload").mapInPandas(
        extract, FEATURE_SCHEMA
    )


RESIZE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("out_width", IntegerType()),
        StructField("out_height", IntegerType()),
        StructField("payload", BinaryType()),
    ]
)


def resize_images(media: DataFrame, out_w: int = 64, out_h: int = 64) -> DataFrame:
    """Resize stage (images only) via mapInPandas. The stub 'resampler'
    maps the payload to exactly out_w*out_h bytes by deterministic
    stride-sampling — byte-shape-faithful to a real resizer (fixed-size
    output per row), codec-free."""

    def resize(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        n_out = out_w * out_h
        for pdf in batches:
            out = []
            for p in pdf["payload"]:
                b = _decode_image(p)
                if len(b) == 0:
                    out.append(bytes(n_out))
                    continue
                # nearest-neighbor stride sample into the target byte grid
                out.append(bytes(b[(i * len(b)) // n_out] for i in range(n_out)))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "out_width": out_w,
                    "out_height": out_h,
                    "payload": out,
                }
            )

    return (
        media.filter(F.col("kind") == "image")
        .select("media_id", "payload")
        .mapInPandas(resize, RESIZE_SCHEMA)
    )


AUDIO_WIN = 128  # synthetic audio analysis window in bytes

AUDIO_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("win_idx", IntegerType()),
        StructField("energy", LongType()),
        StructField("amp_sum", LongType()),
        StructField("peak", IntegerType()),
    ]
)


def audio_features(media: DataFrame, win: int = AUDIO_WIN) -> DataFrame:
    """Windowed audio feature extraction (audio only) via mapInPandas:
    frame each payload into non-overlapping `win`-byte windows (full
    windows only) and emit integer-exact per-window features — energy
    (sum of squared samples), amplitude sum, peak sample. Bytes stand in
    for PCM samples (no audio codec in this container — same stub stance
    as `_decode_image`); the framing/fan-out/Arrow-batch plumbing and the
    vectorized numpy reduction are the real 100 TB shape. All features
    are integers, so the DuckDB oracle reproduces them bit-for-bit."""
    import numpy as np

    def feats(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            ids, idxs, energies, amps, peaks = [], [], [], [], []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                b = _decode_image(p)
                n_win = len(b) // win
                if n_win == 0:
                    continue
                arr = (
                    np.frombuffer(b, dtype=np.uint8, count=n_win * win)
                    .astype(np.int64)
                    .reshape(n_win, win)
                )
                ids.extend([mid] * n_win)
                idxs.extend(range(n_win))
                energies.extend((arr * arr).sum(axis=1).tolist())
                amps.extend(arr.sum(axis=1).tolist())
                peaks.extend(arr.max(axis=1).tolist())
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "win_idx": idxs,
                    "energy": energies,
                    "amp_sum": amps,
                    "peak": peaks,
                }
            )

    return (
        media.filter(F.col("kind") == "audio")
        .select("media_id", "payload")
        .mapInPandas(feats, AUDIO_SCHEMA)
    )


FRAME_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("frame_digest", StringType()),
    ]
)


def sample_frames(media: DataFrame, every_n: int = 4) -> DataFrame:
    """Frame sampling (video only) via mapInPandas: split the payload into
    FRAME_BYTES chunks, keep every_n-th full frame, emit its md5. One
    input row fans out to many output rows — the mapInPandas (not UDF)
    contract — while frame bytes stay executor-side."""
    import hashlib

    def frames(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            ids, idxs, digs = [], [], []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                n_frames = len(p) // FRAME_BYTES
                for fi in range(0, n_frames, every_n):
                    ids.append(mid)
                    idxs.append(fi)
                    digs.append(
                        hashlib.md5(
                            p[fi * FRAME_BYTES : (fi + 1) * FRAME_BYTES]
                        ).hexdigest()
                    )
            yield pd.DataFrame(
                {"media_id": ids, "frame_idx": idxs, "frame_digest": digs}
            )

    return (
        media.filter(F.col("kind") == "video")
        .select("media_id", "payload")
        .mapInPandas(frames, FRAME_SCHEMA)
    )
