"""LZ4 + Snappy codecs (operators/lzcodecs.py): published check
values, paired round-trips, checksum detection, bombs, fuzz typing."""

import random
import struct

import pytest

from geist_spark.operators.lzcodecs import (
    crc32c,
    lz4_compress,
    lz4_decompress,
    snappy_compress,
    snappy_decompress,
    snappy_stream_compress,
    snappy_stream_decompress,
    xxh32,
)


def _doc(seed, n):
    rng = random.Random(seed)
    words = [
        bytes(rng.choices(b"abcdefgh ", k=rng.randrange(2, 12)))
        for _ in range(50)
    ]
    return b"".join(rng.choice(words) for _ in range(n))


def test_check_values():
    assert xxh32(b"") == 0x02CC5D05
    assert xxh32(b"Nobody inspects the spammish repetition") == 0xE2293B2F
    assert crc32c(b"123456789") == 0xE3069283


@pytest.mark.parametrize(
    "data",
    [b"", b"x", b"ab" * 40000, _doc(3, 20000)],
    ids=["empty", "one", "rle", "doc"],
)
def test_roundtrips(data):
    assert lz4_decompress(lz4_compress(data), max_bytes=10**7) == data
    assert snappy_decompress(snappy_compress(data), max_bytes=10**7) == data
    assert (
        snappy_stream_decompress(
            snappy_stream_compress(data), max_bytes=10**7
        )
        == data
    )


def test_lz4_options_and_checksums():
    data = _doc(4, 15000)
    blob = lz4_compress(
        data, block_checksum=True, block_bytes=4096, store=False
    )
    assert lz4_decompress(blob, max_bytes=10**6) == data
    # flip a payload byte: content (or block) checksum must catch it
    b = bytearray(blob)
    b[len(b) // 2] ^= 0xFF
    with pytest.raises(ValueError):
        lz4_decompress(bytes(b), max_bytes=10**6)


def test_lz4_dictionary_is_capability_limit():
    # FLG with version 01 + DictID bit set
    flg = (0b01 << 6) | 0x01
    desc = bytes([flg, 0x70]) + struct.pack("<I", 7)
    hc = (xxh32(desc) >> 8) & 0xFF
    blob = struct.pack("<I", 0x184D2204) + desc + bytes([hc])
    with pytest.raises(NotImplementedError, match="dictionary"):
        lz4_decompress(blob + struct.pack("<I", 0), max_bytes=100)


def test_bombs_bounded():
    data = b"\x00" * 500000
    with pytest.raises(ValueError, match="max_bytes"):
        lz4_decompress(lz4_compress(data), max_bytes=1000)
    with pytest.raises(ValueError, match="max_bytes"):
        snappy_decompress(snappy_compress(data), max_bytes=1000)


def test_snappy_stream_crc_detects_corruption():
    blob = bytearray(snappy_stream_compress(_doc(5, 8000)))
    blob[-3] ^= 0x01
    with pytest.raises(ValueError):
        snappy_stream_decompress(bytes(blob), max_bytes=10**6)


def test_fuzz_typed():
    base = lz4_compress(_doc(6, 5000))
    rng = random.Random(0)
    for _ in range(120):
        b = bytearray(base)
        if rng.random() < 0.5:
            b = b[: rng.randrange(1, len(b))]
        else:
            b[rng.randrange(len(b))] ^= 1 << rng.randrange(8)
        try:
            lz4_decompress(bytes(b), max_bytes=10**6)
        except (ValueError, NotImplementedError):
            pass
