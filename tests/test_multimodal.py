"""Multimodal plumbing: schema, stub gating, batch fan-out shapes."""

import pytest

from sql_cdc_spark import tables
from sql_cdc_spark.functions import multimodal as MM
from tests.conftest import SF_DIR_SMALL


def test_media_schema(spark):
    m = MM.media_table(tables.load(spark, SF_DIR_SMALL, "documents"))
    # compare names + types; nullability flags differ by construction path
    assert [(f.name, f.dataType.simpleString()) for f in m.schema.fields] == [
        (f.name, f.dataType.simpleString()) for f in MM.MEDIA_SCHEMA.fields
    ]
    kinds = {r.kind for r in m.select("kind").distinct().collect()}
    assert kinds == {"image", "audio", "video"}


def test_real_decode_is_gated():
    with pytest.raises(NotImplementedError):
        MM._decode_image(b"\x89PNG", real=True)


def test_decode_features_values(spark):
    m = MM.media_table(tables.load(spark, SF_DIR_SMALL, "documents"))
    row = MM.decode_features(m).filter("media_id = 0").collect()[0]
    src = m.filter("media_id = 0").collect()[0]
    import hashlib

    payload = bytes(src.payload)
    assert row.n_bytes == len(payload)
    assert row.digest == hashlib.md5(payload).hexdigest()
    assert row.mean_byte == pytest.approx(sum(payload) / len(payload), abs=1e-6)


def test_resize_fixed_output_size(spark):
    m = MM.media_table(tables.load(spark, SF_DIR_SMALL, "documents"))
    out = MM.resize_images(m, 16, 16).collect()
    assert out and all(len(bytes(r.payload)) == 256 for r in out)


def test_frame_sample_fanout(spark):
    m = MM.media_table(tables.load(spark, SF_DIR_SMALL, "documents"))
    frames = MM.sample_frames(m, every_n=4)
    rows = frames.collect()
    assert rows and all(r.frame_idx % 4 == 0 for r in rows)
    # fan-out: more frame rows than video rows
    n_videos = m.filter("kind = 'video'").count()
    assert len(rows) > n_videos
