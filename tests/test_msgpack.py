"""MessagePack codec (operators/msgpack.py)."""

import json

import pytest

from geist_spark.operators.msgpack import (
    mp_decode,
    mp_decode_records,
    mp_encode,
)


@pytest.mark.parametrize(
    "value",
    [None, True, False, 0, 127, 128, -1, -32, -33, 2**40, -(2**40),
     "", "héllo", "x" * 100, [1, [2, "a"], None],
     {"k": 1, "n": {"m": []}}, 1.5, -0.25],
)
def test_roundtrip(value):
    assert mp_decode(mp_encode(value)) == value


def test_dialect():
    assert mp_decode(mp_encode(b"\x00\xff")) == "AP8="  # bin -> base64
    blob = b"\x81" + mp_encode(7) + mp_encode("v")
    assert mp_decode(blob) == {"7": "v"}  # non-string key stringified
    blob = b"\xd6\xff\x00\x01\x02\x03"  # fixext4, type -1 (timestamp)
    assert mp_decode(blob) == {"_ext": -1, "data": "AAECAw=="}


def test_malformed_and_bombs():
    for bad in (b"", b"\xc1", b"\xa5ab", b"\x91", b"\x00\x00"):
        with pytest.raises(ValueError):
            mp_decode(bad)
    deep = b"\x91" * 64 + b"\x00"
    with pytest.raises(ValueError, match="nesting"):
        mp_decode(deep)
    many = b"\xdc\xff\xff" + b"\x00" * 65535
    with pytest.raises(ValueError, match="bomb"):
        mp_decode(many, max_elements=100)


def test_spark_surface(spark):
    blob = mp_encode({"id": 9, "tags": ["a", "b"]})
    rows = mp_decode_records(
        spark.createDataFrame(
            [(1, blob), (2, None)], "file_id long, payload binary"
        )
    ).collect()
    assert len(rows) == 1
    assert json.loads(rows[0]["record_json"]) == {
        "id": 9, "tags": ["a", "b"]
    }
