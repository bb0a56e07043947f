"""WebP VP8L codec (operators/vp8l.py): paired encoder/decoder
round-trips across the full feature matrix (transforms, palette
bundling, LZ77, color cache, all 14 predictors), the generated
distance-map's spec-prefix pin, two-tier error contract, and the
decode_real Spark surface."""

import random

import pytest

from geist_spark.operators.vp8l import (
    _DIST_MAP,
    vp8l_decode,
    vp8l_encode,
    webp_decode_rgb,
)


def _rand_img(rng, w, h, alpha=False, ncolors=None):
    if ncolors:
        pal = [
            (rng.randrange(256), rng.randrange(256), rng.randrange(256),
             255 if not alpha else rng.randrange(256))
            for _ in range(ncolors)
        ]
        px = [pal[rng.randrange(ncolors)] for _ in range(w * h)]
    else:
        px = [
            (rng.randrange(256), rng.randrange(256), rng.randrange(256),
             255 if not alpha else rng.randrange(256))
            for _ in range(w * h)
        ]
    return b"".join(bytes(p) for p in px)


def _composited(rgba):
    out = bytearray()
    for i in range(0, len(rgba), 4):
        r, g, b, a = rgba[i: i + 4]
        if a != 255:
            r = (r * a + 255 * (255 - a) + 127) // 255
            g = (g * a + 255 * (255 - a) + 127) // 255
            b = (b * a + 255 * (255 - a) + 127) // 255
        out += bytes((r, g, b))
    return bytes(out)


CASES = [
    ("plain", dict(), 7, 5, False, None),
    ("subtract_green", dict(subtract_green=True), 6, 4, False, None),
    ("alpha", dict(), 5, 5, True, None),
    ("palette2_bundle8", dict(palette=True), 9, 3, False, 2),
    ("palette4_bundle4", dict(palette=True), 9, 3, False, 4),
    ("palette13_bundle2", dict(palette=True), 10, 4, False, 13),
    ("palette40_flat", dict(palette=True), 10, 4, False, 40),
    ("palette_alpha", dict(palette=True), 7, 6, True, 5),
    ("lz77", dict(use_lz77=True), 8, 6, False, 3),
    ("cache", dict(cache_bits=4), 8, 6, False, 5),
    ("lz77_cache", dict(use_lz77=True, cache_bits=6), 12, 9, False, 4),
    ("color", dict(color_transform=(13, -25, 7)), 20, 7, False, None),
    ("pred_color_sg",
     dict(predictor=12, color_transform=(-9, 30, -3),
          subtract_green=True), 21, 6, False, None),
    ("big_mixed",
     dict(use_lz77=True, cache_bits=5, subtract_green=True),
     40, 30, True, 9),
    ("w1", dict(), 1, 13, False, None),
    ("h1", dict(use_lz77=True), 17, 1, False, 2),
] + [
    (f"predictor{m}", dict(predictor=m), 20, 7, False, None)
    for m in range(14)
]


@pytest.mark.parametrize("name,kw,w,h,alpha,nc", CASES)
def test_vp8l_round_trip(name, kw, w, h, alpha, nc):
    rng = random.Random(hash(name) & 0xFFFF)
    rgba = _rand_img(rng, w, h, alpha, nc)
    f = vp8l_encode(w, h, rgba, **kw)
    fmt, dw, dh, ch, rgb = webp_decode_rgb(f)
    assert (fmt, dw, dh) == ("WEBP", w, h)
    assert ch == (4 if alpha else 3)
    assert rgb == _composited(rgba), name


def test_distance_map_matches_spec_prefix():
    """The generated neighbor table must reproduce the spec's
    published opening rows and stay 120 entries with the documented
    domain."""
    assert len(_DIST_MAP) == 120
    assert _DIST_MAP[:22] == [
        (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0),
        (1, 2), (-1, 2), (2, 1), (-2, 1), (2, 2), (-2, 2),
        (0, 3), (3, 0), (1, 3), (-1, 3), (3, 1), (-3, 1),
        (2, 3), (-2, 3), (3, 2), (-3, 2),
    ]
    # domain: (x 1..8, y 0) + (x -7..8, y 1..7); every entry unique
    assert len(set(_DIST_MAP)) == 120
    for x, y in _DIST_MAP:
        assert (1 <= x <= 8 and y == 0) or (-7 <= x <= 8 and 1 <= y <= 7)


def test_capability_and_malformed_tiers():
    rgba = bytes(range(0, 64)) * 4  # 8x2 RGBA
    f = vp8l_encode(8, 2, rgba[:64])
    # lossy VP8 chunk -> capability
    lossy = f.replace(b"VP8L", b"VP8 ")
    with pytest.raises(NotImplementedError, match="lossy"):
        webp_decode_rgb(lossy)
    # bad VP8L signature byte -> malformed
    k = f.index(b"VP8L") + 8
    bad = f[:k] + b"\x00" + f[k + 1:]
    with pytest.raises(ValueError, match="signature"):
        webp_decode_rgb(bad)
    # truncated bitstream -> malformed
    with pytest.raises(ValueError, match="truncated|exhausted|chunk"):
        webp_decode_rgb(f[: len(f) - 6])
    # not a WEBP at all
    with pytest.raises(ValueError, match="WEBP"):
        webp_decode_rgb(b"RIFF\x04\x00\x00\x00WAVE")
    # version != 0 -> capability
    hdr = bytearray(f)
    pos = f.index(b"VP8L") + 8
    # version is bits 37..39 of the stream (byte 4, bits 5..7)
    hdr[pos + 4] |= 0x80
    with pytest.raises(NotImplementedError, match="version"):
        webp_decode_rgb(bytes(hdr))


def test_vp8l_max_pixels_bound():
    f = vp8l_encode(4, 4, bytes(64))
    body = f[f.index(b"VP8L") + 8:]
    with pytest.raises(ValueError, match="max pixels"):
        vp8l_decode(body, max_pixels=8)


def test_decode_real_spark_surface(spark):
    """decode_real accepts lossless WebP alongside the other formats
    in one batch; lossy VP8 NULLs out under on_unsupported='null'."""
    from geist_spark.operators.multimodal import decode_real
    from geist_spark.operators.vp8l import vp8l_encode as enc

    rng = random.Random(7)
    rgba = _rand_img(rng, 4, 2)
    lossless = enc(4, 2, rgba, subtract_green=True)
    lossy = lossless.replace(b"VP8L", b"VP8 ")
    rows = [(1, lossless), (2, lossy)]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    out = {r["media_id"]: r for r in
           decode_real(df, on_unsupported="null").collect()}
    assert (out[1]["format"], out[1]["width"], out[1]["height"],
            out[1]["channels"]) == ("WEBP", 4, 2, 3)
    import hashlib
    assert out[1]["pixel_md5"] == hashlib.md5(
        _composited(rgba)
    ).hexdigest()
    assert out[2]["format"] is None
