"""Multimodal binary-column plumbing: schemas, Arrow batch shapes, and
fan-out behavior are real; decode itself is stubbed (no codec libs in
this container)."""

import hashlib

import pytest
from pyspark.sql import functions as F


def media_df(spark):
    from geist_spark.operators.multimodal import documents_as_media

    docs = spark.createDataFrame(
        [(1, "hello world"), (2, "a longer document body for histogram bins"), (3, None)],
        "doc_id long, text string",
    )
    return documents_as_media(docs)


def test_media_schema(spark):
    m = media_df(spark)
    assert [f.name for f in m.schema.fields] == ["media_id", "payload", "mime", "meta"]
    assert dict(m.dtypes)["payload"] == "binary"
    row = m.filter("media_id = 1").collect()[0]
    assert bytes(row["payload"]) == b"hello world"
    assert row["mime"] == "text/plain"


def test_extract_media_features(spark):
    from geist_spark.operators.multimodal import extract_media_features

    feats = {r["media_id"]: r for r in extract_media_features(media_df(spark)).collect()}
    assert feats[1]["byte_len"] == 11
    assert feats[1]["content_md5"] == hashlib.md5(b"hello world").hexdigest()
    assert sum(feats[1]["hist"]) == 11  # histogram partitions all bytes
    assert feats[3]["byte_len"] == 0 and feats[3]["content_md5"] is None


def test_frame_sample_fanout(spark):
    from geist_spark.operators.multimodal import frame_sample_stub

    frames = frame_sample_stub(media_df(spark), every_ms=4).collect()
    by_id = {}
    for r in frames:
        by_id.setdefault(r["media_id"], []).append(r["frame_idx"])
    # 11 bytes / 4ms -> 2 frames; frame indices are dense from 0
    assert by_id[1] == [0, 1]
    assert by_id[2] == list(range(len(by_id[2])))


def test_resize_stub(spark):
    from geist_spark.operators.multimodal import resize_stub

    out = {r["media_id"]: r for r in resize_stub(media_df(spark), 16, 9).collect()}
    assert out[1]["width"] == 16 and out[1]["height"] == 9
    assert len(bytes(out[1]["payload"])) == 16 * 9
    # deterministic: same source bytes -> same resized payload
    again = {r["media_id"]: r for r in resize_stub(media_df(spark), 16, 9).collect()}
    assert bytes(again[1]["payload"]) == bytes(out[1]["payload"])
    assert out[3]["payload"] is None


def test_decode_real_raises(spark):
    from geist_spark.operators.multimodal import decode_real

    with pytest.raises(NotImplementedError):
        decode_real(media_df(spark))
