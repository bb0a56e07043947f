"""RFC 8878 zstd codec: paired encoder/decoder round-trips, CLI
cross-validation where the zstd binary exists, bomb/malformed guards,
and xxh64 vectors."""

import random
import shutil
import struct
import subprocess

import pytest

from geist_spark.operators.zstd import (
    compress,
    decompress,
    skippable_frame,
    xxh64,
)

HAVE_CLI = shutil.which("zstd") is not None


def _doc(seed: int, n: int) -> bytes:
    rng = random.Random(seed)
    words = [
        bytes(rng.choices(b"abcdefghij ", k=rng.randrange(2, 12)))
        for _ in range(80)
    ]
    return b"".join(rng.choice(words) for _ in range(n))


def _cli_roundtrip(blob: bytes) -> bytes:
    p = subprocess.run(
        ["zstd", "-d", "-q", "-c"], input=blob, capture_output=True
    )
    assert p.returncode == 0, p.stderr.decode()
    return p.stdout


def test_xxh64_vectors():
    # official XXH64 test vectors (seed 0)
    assert xxh64(b"") == 0xEF46DB3751D8E999
    assert xxh64(b"abc") == 0x44BC2CF5AD770999


OPTS = [
    {},
    {"store": True},
    {"four_stream": True},
    {"four_stream": False},
    {"fse_weights": False},
    {"seq_mode": "fse"},
    {"seq_mode": "predefined"},
    {"use_repcodes": False},
    {"reuse_tables": True},
    {"checksum": False},
    {"block_bytes": 3000},
]


@pytest.mark.parametrize("opts", OPTS)
def test_roundtrip_paths(opts):
    data = _doc(7, 20000)
    blob = compress(data, **opts)
    assert decompress(blob, max_bytes=10**7) == data
    if HAVE_CLI:
        assert _cli_roundtrip(blob) == data


@pytest.mark.parametrize(
    "data",
    [b"", b"x", b"ab", b"z" * 100000, bytes(range(256)) * 40],
    ids=["empty", "one", "two", "rle", "cycle"],
)
def test_roundtrip_edges(data):
    blob = compress(data)
    assert decompress(blob, max_bytes=10**7) == data
    if HAVE_CLI:
        assert _cli_roundtrip(blob) == data


def test_multiframe_and_skippable():
    blob = (
        compress(b"first. ")
        + skippable_frame(b"ignored-index", 14)
        + compress(b"second.")
    )
    assert decompress(blob, max_bytes=100) == b"first. second."
    if HAVE_CLI:
        assert _cli_roundtrip(blob) == b"first. second."


@pytest.mark.skipif(not HAVE_CLI, reason="zstd binary not available")
@pytest.mark.parametrize("level", [1, 3, 9, 19])
def test_decode_cli_frames(level):
    """Frames produced by the reference encoder at several levels
    (exercises treeless/repeat/repcode shapes my encoder may skip)."""
    data = _doc(11, 40000) * 3
    p = subprocess.run(
        ["zstd", "-q", f"-{level}", "-c"], input=data, capture_output=True
    )
    assert p.returncode == 0
    assert decompress(p.stdout, max_bytes=10**7) == data


def test_bomb_bounded():
    blob = compress(b"\x00" * 200000)
    with pytest.raises(ValueError, match="max_bytes"):
        decompress(blob, max_bytes=1000)


def test_dictionary_is_capability_limit():
    # frame header with Dictionary_ID_flag=1, single-segment, FCS 1B
    blob = struct.pack("<I", 0xFD2FB528) + bytes([0x21, 0x07, 0x00])
    with pytest.raises(NotImplementedError, match="[Dd]ictionary"):
        decompress(blob, max_bytes=100)


def test_malformed_is_typed():
    base = compress(_doc(3, 5000))
    rng = random.Random(0)
    for _ in range(150):
        b = bytearray(base)
        mode = rng.randrange(3)
        if mode == 0:
            b = b[: rng.randrange(1, len(b))]
        elif mode == 1:
            b[rng.randrange(len(b))] ^= 1 << rng.randrange(8)
        else:
            for _ in range(6):
                b[rng.randrange(len(b))] = rng.randrange(256)
        try:
            decompress(bytes(b), max_bytes=10**6)
        except (ValueError, NotImplementedError):
            pass  # the only permitted failure modes


def test_repcode_paths():
    """Period-8 text forces repeated offsets; with repcodes on, the
    frame must still round-trip (and shrink vs. repcodes off)."""
    data = (b"abcdefgh" * 4000) + b"tail"
    on = compress(data, use_repcodes=True)
    off = compress(data, use_repcodes=False)
    assert decompress(on, max_bytes=10**6) == data
    assert decompress(off, max_bytes=10**6) == data
    if HAVE_CLI:
        assert _cli_roundtrip(on) == data


def test_checksum_detects_corruption():
    blob = bytearray(compress(b"payload with checksum", checksum=True))
    # flip a literal byte inside the (raw-block) frame body, not header
    blob[-6] ^= 0xFF
    with pytest.raises(ValueError):
        decompress(bytes(blob), max_bytes=10**6)
