"""FLAC codec (operators/flac.py): paired encoder/decoder round-trips
across subframe types, stereo assignments, Rice methods and escapes;
CRC check-value pins; typed malformed/bomb guards; the
decode_audio_real integration."""

import random

import pytest

from geist_spark.operators.flac import (
    crc8,
    crc16,
    decode_features,
    decode_samples,
    encode,
)


def _pcm(seed, n, lo=-3000, hi=3000):
    rng = random.Random(seed)
    return [rng.randrange(lo, hi) for _ in range(n)]


def test_crc_check_values():
    assert crc8(b"123456789") == 0xF4
    assert crc16(b"123456789") == 0xFEE8


@pytest.mark.parametrize(
    "stereo", ["independent", "left_side", "right_side", "mid_side"]
)
def test_stereo_assignments(stereo):
    left = _pcm(1, 700)
    right = [v + (i % 37) - 18 for i, v in enumerate(left)]
    blob = encode([left, right], stereo=stereo)
    ch, rate, bps, frames = decode_samples(blob)
    assert (ch, rate, bps) == (2, 44100, 16)
    flat = [[], []]
    for chans in frames:
        flat[0].extend(chans[0])
        flat[1].extend(chans[1])
    assert flat == [left, right]


@pytest.mark.parametrize(
    "sub", ["constant", "verbatim", "fixed0", "fixed1", "fixed2",
            "fixed3", "fixed4", "lpc2"]
)
def test_subframe_types(sub):
    src = [7] * 500 if sub == "constant" else _pcm(2, 500)
    blob = encode([src], subframe=sub)
    _, _, _, frames = decode_samples(blob)
    got = [s for chans in frames for s in chans[0]]
    assert got == src


def test_rice_method1_escape_wasted_multiframe():
    pcm = _pcm(3, 9000)  # > 2 blocks at blocksize 4096
    assert decode_features(encode([pcm], method=1))[4] == 9000
    assert decode_features(encode([pcm], escape_raw=True))[4] == 9000
    shifted = [v << 4 for v in _pcm(4, 300)]
    blob = encode([shifted], wasted=4)
    _, _, _, frames = decode_samples(blob)
    assert [s for c in frames for s in c[0]] == shifted


def test_bit_depths():
    for bps, lim in ((8, 127), (16, 32000), (24, 8_000_000),
                     (32, 2_000_000_000)):
        pcm = _pcm(bps, 64, -lim, lim)
        blob = encode([pcm], bps=bps)
        ch, _, got_bps, frames = decode_samples(blob)
        assert got_bps == bps
        assert [s for c in frames for s in c[0]] == pcm


def test_features_exact():
    pcm = [3, -4, 0, 5]
    fmt, ch, rate, bps, n_frames, peak, msq = decode_features(
        encode([pcm])
    )
    assert (fmt, ch, n_frames, peak) == ("FLAC", 1, 4, 5)
    assert msq == (9 + 16 + 0 + 25) // 4


def test_malformed_typed_and_crc():
    blob = bytearray(encode([_pcm(5, 400)]))
    # bitflip inside frame data -> CRC-16 (or structural) ValueError
    hits = 0
    rng = random.Random(0)
    for _ in range(60):
        b = bytearray(blob)
        b[rng.randrange(60, len(b))] ^= 0x10
        try:
            decode_samples(bytes(b))
        except ValueError:
            hits += 1
        except NotImplementedError:
            pass
    assert hits > 40  # CRCs catch essentially all frame corruption
    with pytest.raises(ValueError, match="fLaC"):
        decode_samples(b"RIFFnope")
    with pytest.raises(ValueError, match="STREAMINFO"):
        decode_samples(
            b"fLaC" + bytes([0x81]) + (3).to_bytes(3, "big") + b"xyz"
        )


def test_bomb_bounded():
    blob = encode([[0] * 50000], subframe="constant")
    with pytest.raises(ValueError, match="max_samples"):
        decode_samples(blob, max_samples=1000)


def test_decode_audio_real_integration(spark):
    from geist_spark.operators.multimodal import decode_audio_real

    left = _pcm(7, 128)
    blob = encode([left, left[::-1]], stereo="mid_side")
    rows = decode_audio_real(
        spark.createDataFrame(
            [(1, blob), (2, b"\xffnot-audio")],
            "media_id long, payload binary",
        ),
        on_unsupported="null",
    ).collect()
    got = {r["media_id"]: r for r in rows}
    assert got[1]["format"] == "FLAC" and got[1]["n_channels"] == 2
    assert got[1]["peak_abs"] == max(abs(v) for v in left)
    assert got[2]["format"] is None
