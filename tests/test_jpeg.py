"""Baseline JPEG codec tests: DC-exact construction, near-lossless
AC round-trips, 4:2:0, restart markers, odd dims, error taxonomy, and
the decode_real dispatch integration."""

import numpy as np
import pytest

from geist_spark.operators.jpeg import (
    _DCT_M,
    ZIGZAG,
    jpeg_decode,
    jpeg_encode_baseline,
)


def test_zigzag_and_dct_basis():
    """The derived zigzag table matches the T.81 scan's known entries
    and is a permutation; the DCT basis is orthonormal (so the IDCT
    in the decoder exactly inverts the FDCT in the encoder)."""
    assert ZIGZAG[:10] == [0, 1, 8, 16, 9, 2, 3, 10, 17, 24]
    assert ZIGZAG[-4:] == [47, 55, 62, 63]
    assert sorted(ZIGZAG) == list(range(64))
    assert np.allclose(_DCT_M @ _DCT_M.T, np.eye(8), atol=1e-12)


def test_dc_exact_grayscale_roundtrip():
    """The oracle construction: constant 8x8 blocks + flat quant=8
    round-trip BIT-EXACTLY through Huffman + dequant + IDCT."""
    rng = np.random.default_rng(3)
    levels = rng.integers(0, 256, size=(4, 6), dtype=np.uint8)
    gray = np.repeat(np.repeat(levels, 8, axis=0), 8, axis=1)  # 32x48
    enc = jpeg_encode_baseline(48, 32, gray=gray.tobytes(), quant=8)
    fmt, w, h, ch, rgb = jpeg_decode(enc)
    assert (fmt, w, h, ch) == ("JPEG", 48, 32, 1)
    got = np.frombuffer(rgb, dtype=np.uint8).reshape(32, 48, 3)
    assert (got[:, :, 0] == gray).all()
    assert (got[:, :, 0] == got[:, :, 1]).all()  # gray -> RGB triples


def test_ac_roundtrip_near_lossless():
    """Random noise (every AC path: run lengths, ZRL, EOB, all size
    categories) at quant=1 reconstructs within DCT rounding error."""
    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, size=(24, 40), dtype=np.uint8)
    out = jpeg_decode(
        jpeg_encode_baseline(40, 24, gray=img.tobytes(), quant=1)
    )[4]
    got = np.frombuffer(out, dtype=np.uint8).reshape(24, 40, 3)[:, :, 0]
    assert np.abs(got.astype(int) - img.astype(int)).max() <= 3


def test_color_444_and_420():
    """YCbCr color: 4:4:4 noise within rounding error; 4:2:0 (chroma
    2x2-mean subsampled, nearest upsampled) on a smooth gradient."""
    rng = np.random.default_rng(5)
    imgc = rng.integers(0, 256, size=(16, 16, 3), dtype=np.uint8)
    fmt, w, h, ch, rgb = jpeg_decode(
        jpeg_encode_baseline(16, 16, rgb=imgc.tobytes(), quant=1)
    )
    assert (fmt, w, h, ch) == ("JPEG", 16, 16, 3)
    got = np.frombuffer(rgb, dtype=np.uint8).reshape(16, 16, 3)
    assert np.abs(got.astype(int) - imgc.astype(int)).max() <= 6

    base = np.linspace(0, 255, 32 * 32 * 3).reshape(32, 32, 3)
    base = base.astype(np.uint8)
    fmt, w, h, ch, rgb = jpeg_decode(
        jpeg_encode_baseline(
            32, 32, rgb=base.tobytes(), quant=2, subsample=True
        )
    )
    assert (w, h, ch) == (32, 32, 3)
    got = np.frombuffer(rgb, dtype=np.uint8).reshape(32, 32, 3)
    assert np.abs(got.astype(int) - base.astype(int)).max() <= 16


def test_restart_markers_and_odd_dims():
    """DRI/RSTn resets DC predictors and byte-aligns; non-multiple-
    of-8 dimensions pad at encode and crop at decode."""
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, size=(24, 24), dtype=np.uint8)
    enc = jpeg_encode_baseline(
        24, 24, gray=img.tobytes(), quant=1, restart_interval=2
    )
    assert b"\xff\xd0" in enc or b"\xff\xd1" in enc  # real RST markers
    got = np.frombuffer(jpeg_decode(enc)[4], dtype=np.uint8)
    got = got.reshape(24, 24, 3)[:, :, 0]
    assert np.abs(got.astype(int) - img.astype(int)).max() <= 3

    odd = rng.integers(0, 256, size=(13, 21), dtype=np.uint8)
    fmt, w, h, ch, rgb = jpeg_decode(
        jpeg_encode_baseline(21, 13, gray=odd.tobytes(), quant=1)
    )
    assert (w, h) == (21, 13)
    got = np.frombuffer(rgb, dtype=np.uint8).reshape(13, 21, 3)[:, :, 0]
    assert np.abs(got.astype(int) - odd.astype(int)).max() <= 3


def test_jpeg_roundtrip_property():
    """Randomized sizes/contents at quant=1 stay within rounding
    error, gray and color, with and without restarts."""
    rng = np.random.default_rng(13)
    for trial in range(6):
        w = int(rng.integers(1, 50))
        h = int(rng.integers(1, 50))
        ri = int(rng.integers(0, 4))
        img = rng.integers(0, 256, size=(h, w), dtype=np.uint8)
        fmt, w2, h2, ch, rgb = jpeg_decode(
            jpeg_encode_baseline(
                w, h, gray=img.tobytes(), quant=1, restart_interval=ri
            )
        )
        assert (w2, h2) == (w, h)
        got = np.frombuffer(rgb, dtype=np.uint8).reshape(h, w, 3)[:, :, 0]
        assert np.abs(got.astype(int) - img.astype(int)).max() <= 3, trial


def test_jpeg_error_taxonomy():
    """CAPABILITY limits: lossless/arithmetic/12-bit/CMYK raise
    NotImplementedError; MALFORMED: truncation, bad Huffman streams,
    EOI-before-scan, and a baseline scan header under an SOF2 frame
    raise ValueError."""
    import struct

    good = jpeg_encode_baseline(16, 16, gray=bytes(256), quant=8)

    def sof_variant(marker):
        # swap the SOF0 marker byte for another SOFn
        i = good.index(b"\xff\xc0")
        return good[:i] + bytes([0xFF, marker]) + good[i + 2 :]

    # SOF2 is SUPPORTED since round 8 — relabeling a baseline stream
    # as progressive now fails as MALFORMED (Ss=0 with Se=63), not as
    # a capability limit
    with pytest.raises(ValueError, match="DC scan with Se"):
        jpeg_decode(sof_variant(0xC2))
    with pytest.raises(NotImplementedError, match="extended/lossless"):
        jpeg_decode(sof_variant(0xC3))
    with pytest.raises(NotImplementedError, match="arithmetic"):
        jpeg_decode(sof_variant(0xC9))
    with pytest.raises(ValueError, match="not a JPEG"):
        jpeg_decode(b"\x89PNG\r\n\x1a\n")
    with pytest.raises(ValueError, match="truncated JPEG"):
        jpeg_decode(good[: len(good) // 2])
    with pytest.raises(ValueError, match="EOI before any scan"):
        jpeg_decode(b"\xff\xd8\xff\xd9")
    # corrupt entropy data -> invalid Huffman code or truncation
    bad = bytearray(good)
    bad[-10] ^= 0xFF
    with pytest.raises(ValueError):
        jpeg_decode(bytes(bad))
    # truncated segment BODIES are typed ValueError, not struct.error
    i = good.index(b"\xff\xc0")
    short_sof = good[: i + 2] + struct.pack(">H", 4) + good[i + 4 : i + 6]
    with pytest.raises(ValueError, match="truncated JPEG SOF"):
        jpeg_decode(short_sof)
    # T.81 B.1.1.2 fill bytes before a marker are spec-legal
    filled = good[:2] + b"\xff" + good[2:]
    assert jpeg_decode(filled)[1:4] == jpeg_decode(good)[1:4]


def test_decode_real_jpeg_dispatch(spark):
    """decode_real routes JPEG payloads through the shared dispatch:
    the DC-exact image lands with exact luma next to its PPM twin,
    and resize_real accepts JPEG too."""
    from geist_spark.operators.multimodal import decode_real, resize_real

    levels = np.arange(24, dtype=np.uint8).reshape(4, 6) * 10
    gray = np.repeat(np.repeat(levels, 8, axis=0), 8, axis=1)
    jpg = jpeg_encode_baseline(48, 32, gray=gray.tobytes(), quant=8)
    ppm = b"P5\n48 32\n255\n" + gray.tobytes()
    media = spark.createDataFrame(
        [(1, jpg), (2, ppm)], "media_id long, payload binary"
    )
    out = {r["media_id"]: r for r in decode_real(media).collect()}
    assert out[1]["format"] == "JPEG" and out[1]["channels"] == 1
    assert out[1]["pixel_md5"] == out[2]["pixel_md5"]
    assert out[1]["mean_luma_fx"] == out[2]["mean_luma_fx"]
    rz = resize_real(media, 6, 4).collect()
    assert {r["format"] for r in rz} == {"JPEG", "P5"}
    lumas = {r["media_id"]: r["mean_luma_fx"] for r in rz}
    assert lumas[1] == lumas[2]


def test_progressive_bit_exact_vs_baseline():
    """Cross-validation core: the progressive encoder shares the
    baseline's quantized coefficients, so progressive decode must be
    BIT-IDENTICAL to baseline decode on every image — gray and RGB,
    4:4:4 and 4:2:0, Al ladders 1..3, band splits, restart
    intervals."""
    from geist_spark.operators.jpeg import jpeg_encode_progressive

    rng = np.random.RandomState(7)
    for trial in range(6):
        W, H = rng.randint(8, 56), rng.randint(8, 56)
        gray = rng.randint(0, 256, W * H, dtype=np.uint8).tobytes()
        bb = jpeg_encode_baseline(W, H, gray=gray, quant=8)
        pp = jpeg_encode_progressive(W, H, gray=gray, quant=8)
        assert jpeg_decode(bb) == jpeg_decode(pp), (trial, W, H)
    for trial in range(4):
        W, H = rng.randint(9, 48), rng.randint(9, 48)
        rgb = rng.randint(0, 256, W * H * 3, dtype=np.uint8).tobytes()
        for kw in (
            dict(),
            dict(subsample=True),
            dict(al=3, band_split=10),
            dict(subsample=True, restart_interval=2, al=2),
        ):
            bb = jpeg_encode_baseline(
                W, H, rgb=rgb, quant=8,
                subsample=kw.get("subsample", False),
            )
            pp = jpeg_encode_progressive(W, H, rgb=rgb, quant=8, **kw)
            assert jpeg_decode(bb) == jpeg_decode(pp), (trial, W, H, kw)


def test_progressive_dc_exact_and_smooth_content():
    """The DC-exact oracle construction holds under SOF2 (constant
    blocks, quant 8 -> bit-exact pixels), and smooth gradients (the
    EOB-run-heavy regime real photos live in) stay bit-identical to
    baseline."""
    from geist_spark.operators.jpeg import jpeg_encode_progressive

    g = bytes([201]) * 64
    fmt, w, h, c, px = jpeg_decode(
        jpeg_encode_progressive(8, 8, gray=g, quant=8)
    )
    assert (fmt, w, h, c) == ("JPEG", 8, 8, 1)
    assert px == bytes([201]) * 192

    xx, yy = np.meshgrid(np.arange(40), np.arange(24))
    gray = ((xx * 3 + yy * 2) % 256).astype(np.uint8).tobytes()
    bb = jpeg_encode_baseline(40, 24, gray=gray, quant=16)
    pp = jpeg_encode_progressive(40, 24, gray=gray, quant=16, al=2)
    assert jpeg_decode(bb) == jpeg_decode(pp)


def test_progressive_error_taxonomy():
    """Progressive-specific malformed tier: bad spectral bands,
    interleaved AC scans, Ah/Al ladder violations, truncation
    mid-scan — all ValueError; SOF2 + zero scans before EOI is
    malformed too."""
    from geist_spark.operators.jpeg import jpeg_encode_progressive

    good = jpeg_encode_progressive(16, 16, gray=bytes(256), quant=8)

    # truncate inside the LAST scan's entropy data
    with pytest.raises(ValueError, match="truncated JPEG"):
        jpeg_decode(good[:-4])

    # patch an SOS: find the FIRST AC scan header (ns=1) and break Se
    i = good.index(b"\xff\xda")           # DC scan (ns=3? gray: ns=1)
    j = good.index(b"\xff\xda", i + 2)    # first AC scan
    (seglen,) = __import__("struct").unpack_from(">H", good, j + 2)
    hdr = bytearray(good)
    # SOS body: ns, (cs,tt)*ns, ss, se, ahal — se byte is at
    # j+4+1+2*ns+1
    ns = good[j + 4]
    se_off = j + 4 + 1 + 2 * ns + 1
    hdr[se_off] = 0  # AC scan with Se < Ss
    with pytest.raises(ValueError, match="spectral band"):
        jpeg_decode(bytes(hdr))

    # Ah/Al ladder violation (Ah must be Al+1 on refinement scans)
    ah_off = se_off + 1
    # find a refinement scan (ahal high nibble nonzero)
    k = j
    while True:
        k = good.index(b"\xff\xda", k + 2)
        ns_k = good[k + 4]
        ahal_off = k + 4 + 1 + 2 * ns_k + 2
        if good[ahal_off] >> 4:
            break
    bad = bytearray(good)
    bad[ahal_off] = (3 << 4) | (bad[ahal_off] & 0x0F)
    with pytest.raises(ValueError, match="successive approximation"):
        jpeg_decode(bytes(bad))

    # SOF2 then EOI with no scans: malformed
    sof2_end = good.index(b"\xff\xda")
    with pytest.raises(ValueError, match="EOI before any scan"):
        jpeg_decode(good[:sof2_end] + b"\xff\xd9")


def test_progressive_through_decode_real(spark):
    """A progressive JPEG flows through the multimodal decode_real
    dispatch and hashes identically to its baseline and PPM twins —
    the cross-format contract now includes SOF2."""
    from geist_spark.operators.jpeg import jpeg_encode_progressive
    from geist_spark.operators.multimodal import decode_real

    levels = np.arange(12, dtype=np.uint8).reshape(3, 4) * 20
    gray = np.repeat(np.repeat(levels, 8, axis=0), 8, axis=1)
    base = jpeg_encode_baseline(32, 24, gray=gray.tobytes(), quant=8)
    prog = jpeg_encode_progressive(32, 24, gray=gray.tobytes(), quant=8)
    ppm = b"P5\n32 24\n255\n" + gray.tobytes()
    media = spark.createDataFrame(
        [(1, base), (2, prog), (3, ppm)], "media_id long, payload binary"
    )
    out = {r["media_id"]: r for r in decode_real(media).collect()}
    assert out[1]["pixel_md5"] == out[2]["pixel_md5"] == out[3]["pixel_md5"]
    assert out[2]["format"] == "JPEG"
