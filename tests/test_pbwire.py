"""Schema-less protobuf wire decode (operators/pbwire.py)."""

import json

import pytest

from geist_spark.operators.pbwire import pb_build, pb_decode


def test_full_surface():
    blob = pb_build([
        (1, "varint", 150),
        (2, "str", "~héllo"),
        (3, "msg", [(1, "varint", 1), (2, "str", "~inner")]),
        (4, "varint", 7), (4, "varint", 8), (4, "varint", 9),
        (5, "i64", 1 << 40), (6, "i32", 0xDEAD),
        (7, "bytes", b"\xff\xfe\x00"),
    ])
    assert pb_decode(blob) == {
        "1": 150, "2": "~héllo",
        "3": {"1": 1, "2": "~inner"},
        "4": [7, 8, 9], "5": 1 << 40, "6": 0xDEAD, "7": "//4A",
    }


def test_decode_raw_ambiguity_documented():
    # hex-ish ASCII CAN parse as a message — the documented dialect:
    # 'x3' is bytes 78 33 = field 15 varint 51
    blob = pb_build([(1, "str", "x3")])
    assert pb_decode(blob) == {"1": {"15": 51}}
    # a '~' prefix (wire type 6) makes the string unambiguous
    blob = pb_build([(1, "str", "~x3")])
    assert pb_decode(blob) == {"1": "~x3"}


def test_malformed_typed():
    with pytest.raises(ValueError, match="wire type 3"):
        pb_decode(bytes([0x0B]))  # group start
    with pytest.raises(ValueError, match="truncated"):
        pb_decode(bytes([0x08]))  # varint key, no value
    with pytest.raises(ValueError, match="field number 0"):
        pb_decode(bytes([0x00, 0x00]))
    with pytest.raises(ValueError, match="truncated"):
        pb_decode(bytes([0x12, 0x05, 0x61]))  # len 5, 1 byte


def test_spark_surface(spark):
    from geist_spark.operators.pbwire import pb_decode_records

    blob = pb_build([(1, "varint", 5), (2, "str", "~ok")])
    rows = pb_decode_records(
        spark.createDataFrame(
            [(1, blob), (2, None)], "file_id long, payload binary"
        )
    ).collect()
    assert len(rows) == 1
    assert json.loads(rows[0]["record_json"]) == {"1": 5, "2": "~ok"}
