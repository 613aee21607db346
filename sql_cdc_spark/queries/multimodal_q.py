"""Multimodal-column queries: catalog projection, mapInPandas decode /
feature extraction, stride resize, video frame sampling.

The media table is synthesized deterministically from `documents`
(functions/multimodal.py) with payload = UTF-8 bytes of the text. The
corpus is pure ASCII (bytes == chars), so DuckDB oracles reproduce every
byte-level computation on the VARCHAR side — including md5 digests of the
exact bytes the Pandas stages emitted, which gates the Arrow binary
round-trip, batch iteration, and fan-out plumbing bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sql_cdc_spark import tables
from sql_cdc_spark.functions import multimodal as MM
from sql_cdc_spark.queries import QueryEntry

RESIZE_W = 32
RESIZE_H = 32
FRAME_STEP = 4

# the synthesized media table on the DuckDB side (ptext = payload as text)
_MEDIA_CTE = """
media AS (
  SELECT doc_id AS media_id,
         CASE WHEN doc_id % 3 = 0 THEN 'image'
              WHEN doc_id % 3 = 1 THEN 'audio'
              ELSE 'video' END AS kind,
         CASE WHEN doc_id % 3 = 2 THEN text || text ELSE text END AS ptext,
         CAST(doc_id % 7 * 64 + 64 AS INTEGER) AS width,
         CAST(doc_id % 5 * 64 + 64 AS INTEGER) AS height
  FROM documents
)
"""


def _media(spark: SparkSession, sf_dir: str) -> DataFrame:
    return MM.media_table(tables.load(spark, sf_dir, "documents"))


def mm_media_catalog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Catalog projection over the typed-metadata struct: id, kind, byte
    size, dimensions, mime — metadata-only planning (payload column pruned
    from the scan)."""
    m = _media(spark, sf_dir)
    return m.select(
        "media_id",
        "kind",
        F.length("payload").cast("long").alias("n_bytes"),
        F.col("meta.width").alias("width"),
        F.col("meta.height").alias("height"),
        F.col("meta.mime").alias("mime"),
    )


_CATALOG_SQL = f"""
WITH {_MEDIA_CTE}
SELECT media_id, kind, CAST(length(ptext) AS BIGINT) AS n_bytes,
       width, height, 'application/x-' || kind AS mime
FROM media
"""


def mm_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInPandas decode + feature extraction; the md5 digest column
    proves the payload bytes survived Spark→Arrow→pandas unchanged."""
    feats = MM.decode_features(_media(spark, sf_dir))
    return feats.select("media_id", "kind", "n_bytes", "digest")


_FEATURES_SQL = f"""
WITH {_MEDIA_CTE}
SELECT media_id, kind, CAST(length(ptext) AS BIGINT) AS n_bytes,
       md5(ptext) AS digest
FROM media
"""


def mm_resize_digest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stride-resize of every image payload to 32x32 bytes in mapInPandas,
    digested for comparison. The oracle rebuilds the identical byte
    selection with character indexing."""
    resized = MM.resize_images(_media(spark, sf_dir), RESIZE_W, RESIZE_H)
    return resized.select(
        "media_id", "out_width", "out_height", F.md5("payload").alias("digest")
    )


_RESIZE_SQL = f"""
WITH {_MEDIA_CTE}
SELECT media_id,
       {RESIZE_W} AS out_width, {RESIZE_H} AS out_height,
       md5(array_to_string(
         list_transform(range(0, {RESIZE_W * RESIZE_H}),
                        i -> substring(ptext, CAST(i * length(ptext) // {RESIZE_W * RESIZE_H} AS BIGINT) + 1, 1)),
         '')) AS digest
FROM media WHERE kind = 'image'
"""


def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample every 4th full 64-byte frame of each video payload — one
    input row fans out to many frame rows inside mapInPandas."""
    return MM.sample_frames(_media(spark, sf_dir), FRAME_STEP)


_FRAMES_SQL = f"""
WITH {_MEDIA_CTE}
SELECT media_id, CAST(fi AS INTEGER) AS frame_idx,
       md5(substring(ptext, CAST(fi * {MM.FRAME_BYTES} AS BIGINT) + 1, {MM.FRAME_BYTES})) AS frame_digest
FROM media
CROSS JOIN UNNEST(range(0, length(ptext) // {MM.FRAME_BYTES}, {FRAME_STEP})) AS t(fi)
WHERE kind = 'video'
"""

def mm_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Windowed audio features (energy / amplitude / peak per 128-byte
    window) for every audio object — integer-exact, so the oracle rebuilds
    the same reductions with a per-character lateral unnest."""
    return MM.audio_features(_media(spark, sf_dir), MM.AUDIO_WIN)


_AUDIO_SQL = f"""
WITH {_MEDIA_CTE},
wins AS (
  SELECT media_id, ptext, CAST(wi AS INTEGER) AS win_idx
  FROM media
  CROSS JOIN UNNEST(range(0, length(ptext) // {MM.AUDIO_WIN})) AS t(wi)
  WHERE kind = 'audio'
),
samples AS (
  SELECT media_id, win_idx,
         CAST(ascii(substring(ptext, win_idx * {MM.AUDIO_WIN} + CAST(ci AS BIGINT) + 1, 1)) AS BIGINT) AS v
  FROM wins CROSS JOIN UNNEST(range(0, {MM.AUDIO_WIN})) AS c(ci)
)
SELECT media_id, win_idx,
       CAST(SUM(v * v) AS BIGINT) AS energy,
       CAST(SUM(v) AS BIGINT) AS amp_sum,
       CAST(MAX(v) AS INTEGER) AS peak
FROM samples
GROUP BY media_id, win_idx
"""

QUERIES: dict[str, QueryEntry] = {
    "mm_media_catalog": QueryEntry(mm_media_catalog, _CATALOG_SQL),
    "mm_decode_features": QueryEntry(mm_decode_features, _FEATURES_SQL),
    "mm_resize_digest": QueryEntry(mm_resize_digest, _RESIZE_SQL),
    "mm_frame_sample": QueryEntry(mm_frame_sample, _FRAMES_SQL),
    "mm_audio_features": QueryEntry(mm_audio_features, _AUDIO_SQL),
}
