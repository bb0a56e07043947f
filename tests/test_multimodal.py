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


def _ppm_bytes(w, h, pixels):
    """P6 bytes for row-major RGB pixel tuples (with a header comment
    to exercise the tokenizer)."""
    body = bytes(v for px in pixels for v in px)
    return f"P6\n# test image\n{w} {h}\n255\n".encode() + body


def _pgm_bytes(w, h, grays):
    return f"P5 {w} {h} 255\n".encode() + bytes(grays)


def _bmp_bytes(w, h, pixels, top_down=False):
    """Uncompressed 24-bit BMP for the same row-major RGB pixels:
    BGR channel order, 4-byte row padding, bottom-up unless top_down."""
    import struct

    stride = (w * 3 + 3) & ~3
    rows = []
    for r in range(h):
        src = r if top_down else h - 1 - r
        row = b"".join(
            bytes((pixels[src * w + c][2], pixels[src * w + c][1],
                   pixels[src * w + c][0]))
            for c in range(w)
        )
        rows.append(row + b"\x00" * (stride - len(row)))
    px = b"".join(rows)
    header = struct.pack(
        "<2sIHHI", b"BM", 54 + len(px), 0, 0, 54
    ) + struct.pack(
        "<IiiHHIIiiII", 40, w, (-h if top_down else h), 1, 24, 0,
        len(px), 2835, 2835, 0, 0,
    )
    return header + px


def test_decode_real_ppm_bmp_cross_format(spark):
    """decode_real REALLY decodes PPM and BMP: same 3x2 image encoded
    both ways yields identical dims, exact luma, and the SAME
    pixel_md5 (BMP bottom-up/BGR/padding normalized away); top-down
    BMP too; P5 grayscale normalizes to RGB triples."""
    from geist_spark.operators.multimodal import decode_real

    pixels = [(255, 0, 0), (0, 255, 0), (0, 0, 255),
              (10, 20, 30), (40, 50, 60), (70, 80, 90)]
    rows = [
        (1, _ppm_bytes(3, 2, pixels)),
        (2, _bmp_bytes(3, 2, pixels)),
        (3, _bmp_bytes(3, 2, pixels, top_down=True)),
        (4, _pgm_bytes(2, 1, [100, 200])),
        (5, None),
    ]
    media = spark.createDataFrame(rows, "media_id long, payload binary")
    out = {r["media_id"]: r for r in decode_real(media).collect()}
    assert (out[1]["format"], out[1]["width"], out[1]["height"],
            out[1]["channels"]) == ("P6", 3, 2, 3)
    assert out[2]["format"] == "BMP" and out[3]["format"] == "BMP"
    # the cross-format contract: one image, three encodings, one hash
    assert out[1]["pixel_md5"] == out[2]["pixel_md5"] == out[3]["pixel_md5"]
    assert out[1]["mean_luma_fx"] == out[2]["mean_luma_fx"]
    # exact integer luma replay
    sr = sum(p[0] for p in pixels)
    sg = sum(p[1] for p in pixels)
    sb = sum(p[2] for p in pixels)
    assert out[1]["mean_luma_fx"] == (299 * sr + 587 * sg + 114 * sb) // 6
    # grayscale: luma of (g,g,g) is exactly g * 1000
    assert out[4]["channels"] == 1
    assert out[4]["mean_luma_fx"] == (100 + 200) * 1000 // 2
    assert out[5]["format"] is None and out[5]["pixel_md5"] is None


def test_decode_real_unsupported_and_malformed(spark):
    """Compressed/unknown formats raise by default (naming the id) or
    NULL out with on_unsupported='null'; truncated payloads of a
    SUPPORTED format always raise."""
    from geist_spark.operators.multimodal import decode_real

    mixed = spark.createDataFrame(
        [(1, _ppm_bytes(1, 1, [(9, 9, 9)])), (2, b"\x89PNG\r\n fake")],
        "media_id long, payload binary",
    )
    with pytest.raises(Exception, match="PPM/PGM/BMP"):
        decode_real(mixed).collect()
    out = {r["media_id"]: r for r in
           decode_real(mixed, on_unsupported="null").collect()}
    assert out[1]["format"] == "P6" and out[2]["format"] is None
    trunc = spark.createDataFrame(
        [(1, _ppm_bytes(4, 4, [(1, 2, 3)]))],  # header says 16 px, has 1
        "media_id long, payload binary",
    )
    with pytest.raises(Exception, match="truncated"):
        decode_real(trunc).collect()
    with pytest.raises(ValueError, match="on_unsupported"):
        decode_real(mixed, on_unsupported="skip")


def _png_gray_bytes(w, h, grays):
    """8-bit grayscale PNG (color type 0), filter None per row."""
    import struct
    import zlib

    raw = bytearray()
    for r in range(h):
        raw.append(0)
        raw += bytes(grays[r * w : (r + 1) * w])

    def chunk(ct, body):
        return (
            struct.pack(">I", len(body)) + ct + body
            + struct.pack(">I", zlib.crc32(ct + body) & 0xFFFFFFFF)
        )

    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


def _png_palette_bytes(w, h, indices, palette):
    """8-bit palette PNG (color type 3)."""
    import struct
    import zlib

    raw = bytearray()
    for r in range(h):
        raw.append(0)
        raw += bytes(indices[r * w : (r + 1) * w])

    def chunk(ct, body):
        return (
            struct.pack(">I", len(body)) + ct + body
            + struct.pack(">I", zlib.crc32(ct + body) & 0xFFFFFFFF)
        )

    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 3, 0, 0, 0))
        + chunk(b"PLTE", bytes(v for p in palette for v in p))
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


def test_decode_real_png_cross_format(spark):
    """decode_real REALLY decodes 8-bit PNG via stdlib zlib + scanline
    unfiltering: the same image as PPM, BMP and PNG (every filter type
    exercised) yields ONE pixel_md5; grayscale PNG normalizes like PGM;
    palette PNG expands through PLTE."""
    from geist_spark.operators.multimodal import decode_real, png_encode_rgb

    pixels = [(255, 0, 0), (0, 255, 0), (0, 0, 255),
              (10, 20, 30), (40, 50, 60), (70, 80, 90)]
    rgb = bytes(v for p in pixels for v in p)
    rows = [
        (1, _ppm_bytes(3, 2, pixels)),
        (2, png_encode_rgb(3, 2, rgb, [0, 2])),       # None + Up
        (3, png_encode_rgb(3, 2, rgb, [1, 3])),       # Sub + Average
        (4, png_encode_rgb(3, 2, rgb, [4, 4])),       # Paeth
        (8, png_encode_rgb(3, 2, rgb, interlace=True)),  # Adam7
        (5, _png_gray_bytes(2, 1, [100, 200])),
        (6, _pgm_bytes(2, 1, [100, 200])),
        (7, _png_palette_bytes(2, 1, [1, 0], [(9, 8, 7), (1, 2, 3)])),
    ]
    media = spark.createDataFrame(rows, "media_id long, payload binary")
    out = {r["media_id"]: r for r in decode_real(media).collect()}
    assert out[2]["format"] == "PNG"
    assert (out[2]["width"], out[2]["height"], out[2]["channels"]) == (3, 2, 3)
    assert (out[1]["pixel_md5"] == out[2]["pixel_md5"]
            == out[3]["pixel_md5"] == out[4]["pixel_md5"]
            == out[8]["pixel_md5"])
    assert out[1]["mean_luma_fx"] == out[2]["mean_luma_fx"]
    # grayscale: channels=1, same normalization as PGM
    assert out[5]["channels"] == 1
    assert out[5]["pixel_md5"] == out[6]["pixel_md5"]
    assert out[5]["mean_luma_fx"] == (100 + 200) * 1000 // 2
    # palette expands to the RGB colors
    assert out[7]["channels"] == 3
    assert out[7]["mean_luma_fx"] == (
        (299 * (1 + 9) + 587 * (2 + 8) + 114 * (3 + 7)) // 2
    )


def test_decode_real_png_errors(spark):
    """PNG error taxonomy: since round 8 EVERY spec-legal depth x
    color-type combination decodes, so there is no capability tier
    left — spec-ILLEGAL combinations (sub-byte RGB, 16-bit palette)
    and bad CRC / truncation / corrupt deflate / depth-vs-data
    mismatches are MALFORMED and always raise. Flipping the interlace
    flag on a plain-coded file is MALFORMED (the Adam7 decoder really
    runs and the pass sizes disagree)."""
    import struct
    import zlib

    from geist_spark.operators.multimodal import decode_real, png_encode_rgb

    good = png_encode_rgb(2, 2, bytes(range(12)), [1, 4])

    def with_ihdr(mutate):
        buf = bytearray(good)
        mutate(buf)  # IHDR body spans bytes 16..29
        body = bytes(buf[16:29])
        buf[29:33] = struct.pack(
            ">I", zlib.crc32(b"IHDR" + body) & 0xFFFFFFFF
        )
        return bytes(buf)

    # malformed always raises, even under 'null'. Relabeling an 8-bit
    # stream as 16-bit or RGB-as-RGBA is a SIZE mismatch now that
    # those shapes decode for real; depth 4 on color type 2 is a
    # spec-illegal combination.
    bad_crc = bytearray(good)
    bad_crc[20] ^= 1  # IHDR body byte, CRC left stale
    for payload, msg in [
        (bytes(bad_crc), "CRC mismatch"),
        (good[:-13], "truncated PNG"),
        (_png_palette_bytes(1, 1, [3], [(1, 2, 3)]), "out of range"),
        (with_ihdr(lambda b: b.__setitem__(28, 1)), "expected 15"),
        (with_ihdr(lambda b: b.__setitem__(24, 16)), "expected 26"),
        (with_ihdr(lambda b: b.__setitem__(25, 6)), "expected 18"),
        (with_ihdr(lambda b: b.__setitem__(24, 4)),
         "bit depth 4 with color type 2"),
        (with_ihdr(lambda b: b.__setitem__(24, 3)),
         "bit depth 3"),
    ]:
        df = spark.createDataFrame(
            [(1, payload)], "media_id long, payload binary"
        )
        with pytest.raises(Exception, match=msg):
            decode_real(df, on_unsupported="null").collect()


def test_decode_real_png_bomb_and_trns(spark):
    """A decompression-bomb IDAT raises the typed malformed error at
    the expected-size bound instead of materializing the payload
    (OOM would escape the two-tier contract); a palette tRNS chunk
    DECODES for real since round 8 — alpha composites onto white
    with exact integer rounding; tRNS alongside a full alpha channel
    (color type 6) stays malformed per the spec."""
    import struct
    import zlib

    from geist_spark.operators.multimodal import decode_real

    def chunk(ct, body):
        return (
            struct.pack(">I", len(body)) + ct + body
            + struct.pack(">I", zlib.crc32(ct + body) & 0xFFFFFFFF)
        )

    # IHDR says 1x1 gray (expected inflate = 2 bytes) but the IDAT
    # stream inflates to 10 MB — the decoder must stop at 3 bytes
    bomb = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 1, 1, 8, 0, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(b"\x00" * 10_000_000))
        + chunk(b"IEND", b"")
    )
    df = spark.createDataFrame([(1, bomb)], "media_id long, payload binary")
    with pytest.raises(Exception, match="expected 2"):
        decode_real(df, on_unsupported="null").collect()
    # palette image with tRNS: composites (1,2,3) at alpha 128 over
    # white — out_c = (c*128 + 255*127 + 127) // 255
    raw = b"\x00\x00"  # one filter byte + one palette index
    trns = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 1, 1, 8, 3, 0, 0, 0))
        + chunk(b"PLTE", bytes([1, 2, 3]))
        + chunk(b"tRNS", bytes([128]))
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )
    mixed = spark.createDataFrame(
        [(1, trns), (2, _png_gray_bytes(1, 1, [7]))],
        "media_id long, payload binary",
    )
    out = {r["media_id"]: r for r in decode_real(mixed).collect()}
    def comp(c):
        return (c * 128 + 255 * 127 + 127) // 255
    want = (299 * comp(1) + 587 * comp(2) + 114 * comp(3)) // 1
    assert out[1]["format"] == "PNG" and out[1]["mean_luma_fx"] == want
    assert out[2]["format"] == "PNG"
    # tRNS with a full alpha channel is malformed (spec), not data
    rgba = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 1, 1, 8, 6, 0, 0, 0))
        + chunk(b"tRNS", bytes([0, 1]))
        + chunk(b"IDAT", zlib.compress(b"\x00\x01\x02\x03\x80"))
        + chunk(b"IEND", b"")
    )
    df = spark.createDataFrame([(1, rgba)], "media_id long, payload binary")
    with pytest.raises(Exception, match="tRNS chunk with color type 6"):
        decode_real(df, on_unsupported="null").collect()


def test_decode_real_gif_cross_format(spark):
    """decode_real REALLY decodes GIF via pure-python LZW + palette
    mapping: the same image as PPM, PNG and GIF (plain AND interlaced,
    so the 4-pass row gather runs) yields ONE pixel_md5; extensions
    (GCE without transparency, comment) are walked over. Local color
    table precedence: test_gif_local_color_table_and_subrect."""
    from geist_spark.operators.multimodal import (
        decode_real,
        gif_encode_rgb,
        png_encode_rgb,
    )

    # 4 rows so interlace pass order [0, 2, 1, 3] actually reorders
    pixels = [(255, 0, 0), (0, 255, 0), (0, 0, 255), (10, 20, 30),
              (40, 50, 60), (70, 80, 90), (5, 5, 5), (200, 100, 0)]
    rgb = bytes(v for p in pixels for v in p)
    plain = gif_encode_rgb(2, 4, rgb)
    inter = gif_encode_rgb(2, 4, rgb, interlace=True)
    assert plain[47:] != inter[47:] or plain != inter  # streams differ
    # splice a non-transparent GCE + comment extension before the
    # image descriptor: the block walk must skip both
    packed = plain[10]
    p0 = 13 + 3 * (2 << (packed & 7))
    with_ext = (
        plain[:p0]
        + b"\x21\xf9\x04\x00\x00\x00\x00\x00"      # GCE, no transparency
        + b"\x21\xfe\x03hi!\x00"                   # comment extension
        + plain[p0:]
    )
    rows = [
        (1, _ppm_bytes(2, 4, pixels)),
        (2, png_encode_rgb(2, 4, rgb, [1, 4, 2, 0])),
        (3, plain),
        (4, inter),
        (5, with_ext),
    ]
    media = spark.createDataFrame(rows, "media_id long, payload binary")
    out = {r["media_id"]: r for r in decode_real(media).collect()}
    assert out[3]["format"] == "GIF"
    assert (out[3]["width"], out[3]["height"], out[3]["channels"]) == (2, 4, 3)
    # one image, four encodings (+ extension variant), ONE hash
    assert (out[1]["pixel_md5"] == out[2]["pixel_md5"] == out[3]["pixel_md5"]
            == out[4]["pixel_md5"] == out[5]["pixel_md5"])
    assert out[1]["mean_luma_fx"] == out[4]["mean_luma_fx"]


def test_decode_real_gif_errors(spark):
    """GIF error taxonomy: a transparency flag whose index never
    appears in the frame decodes to the SAME pixels (round 8 —
    transparency composites instead of raising); truncation,
    out-of-range LZW codes, palette overflow and pixel-count
    mismatch are MALFORMED and always raise."""
    import pytest

    from geist_spark.operators.multimodal import decode_real, gif_encode_rgb

    good = gif_encode_rgb(3, 2, bytes(range(18)))
    packed = good[10]
    p0 = 13 + 3 * (2 << (packed & 7))
    transparent = (
        good[:p0] + b"\x21\xf9\x04\x01\x00\x00\x07\x00" + good[p0:]
    )
    caps = spark.createDataFrame(
        [(1, good), (2, transparent)], "media_id long, payload binary"
    )
    out = {r["media_id"]: r for r in
           decode_real(caps, on_unsupported="null").collect()}
    assert out[1]["format"] == "GIF" and out[2]["format"] == "GIF"
    # index 7 is unused by the 6-color frame: identical pixels
    assert out[1]["pixel_md5"] == out[2]["pixel_md5"]

    # image claims 3x3 (descriptor AND logical screen, so the
    # sub-rect guard passes) but the LZW stream carries 6 pixels
    short = bytearray(good)
    short[8] = 3       # logical screen height low byte
    short[p0 + 7] = 3  # height low byte (descriptor at p0, h at +7)
    bad_mcs = bytearray(good)
    bad_mcs[p0 + 10] = 12  # LZW minimum code size past the 8-bit roots
    for payload, msg in [
        (good[:20], "truncated GIF"),
        (bytes(short), "yields 6 of 9|LZW"),
        (bytes(bad_mcs), "minimum code size 12"),
    ]:
        df = spark.createDataFrame(
            [(1, payload)], "media_id long, payload binary"
        )
        with pytest.raises(Exception, match=msg):
            decode_real(df, on_unsupported="null").collect()


def test_gif_local_color_table_and_subrect():
    """A local color table WINS over a corrupted global one (pure
    codec splice — gif_encode_rgb only emits GCTs); a first frame
    that is a sub-rectangle of the logical screen COMPOSITES onto a
    white screen (round 8); a frame rectangle OUTSIDE the screen is
    malformed."""
    import numpy as np
    import pytest

    from geist_spark.operators.multimodal import _gif_decode, gif_encode_rgb

    rgb = bytes(range(24))
    good = _gif_decode(gif_encode_rgb(2, 4, rgb))[4]
    enc = bytearray(gif_encode_rgb(2, 4, rgb))
    k = enc[10] & 7
    n = 2 << k
    p0 = 13 + 3 * n
    lct = bytes(enc[13:p0])          # the true palette, moved to LCT
    for i in range(13, p0):          # corrupt the GCT
        enc[i] ^= 0xFF
    enc[p0 + 9] |= 0x80 | k          # descriptor: LCT flag + size
    spliced = bytes(enc[: p0 + 10]) + lct + bytes(enc[p0 + 10 :])
    assert _gif_decode(spliced)[4] == good

    sub = bytearray(gif_encode_rgb(2, 4, rgb))
    sub[p0 + 1] = 1                  # left offset 1: 1+2 > screen w 2
    with pytest.raises(ValueError, match="outside"):
        _gif_decode(bytes(sub))
    shrunk = bytearray(gif_encode_rgb(2, 4, rgb))
    shrunk[8] = 9                    # logical screen taller than frame
    fmt, w, h, ch, px = _gif_decode(bytes(shrunk))
    assert (w, h) == (2, 9)
    cv = np.full((9, 2, 3), 255, dtype=np.uint8)
    cv[:4] = np.frombuffer(rgb, dtype=np.uint8).reshape(4, 2, 3)
    assert px == cv.tobytes()
    # writer-built sub-rect + transparency composite
    tc = (0, 1, 2)
    fmt, w, h, ch, px = _gif_decode(gif_encode_rgb(
        2, 4, rgb, screen=(5, 6), left=2, top=1, transparent_color=tc
    ))
    assert (w, h) == (5, 6)
    cv = np.full((6, 5, 3), 255, dtype=np.uint8)
    fr = np.frombuffer(rgb, dtype=np.uint8).reshape(4, 2, 3)
    m = ~(fr == np.array(tc, dtype=np.uint8)).all(axis=2)
    reg = cv[1:5, 2:4]
    reg[m] = fr[m]
    assert px == cv.tobytes()


def test_gif_lzw_dictionary_growth():
    """Pure-codec property: a 2-color noise image large enough to push
    the LZW dictionary past 4096 entries round-trips exactly (code
    width promotion 3->12 bits plus the clear/reset path), and a
    256-color image exercises the 8-bit root alphabet."""
    import numpy as np

    from geist_spark.operators.multimodal import _gif_decode, gif_encode_rgb

    rng = np.random.default_rng(42)
    pal = np.array([[0, 0, 0], [255, 255, 255]], dtype=np.uint8)
    rgb = pal[rng.integers(0, 2, size=200 * 200)].tobytes()
    fmt, w, h, ch, out = _gif_decode(gif_encode_rgb(200, 200, rgb))
    assert (fmt, w, h, ch) == ("GIF", 200, 200, 3) and out == rgb

    pal256 = rng.integers(0, 256, size=(256, 3), dtype=np.uint8)
    rgb256 = pal256[rng.integers(0, 256, size=64 * 64)].tobytes()
    assert _gif_decode(gif_encode_rgb(64, 64, rgb256))[4] == rgb256


def _wav_bytes(samples, rate=8000, bits=16, channels=1):
    import struct

    if bits == 16:
        data = b"".join(struct.pack("<h", s) for s in samples)
    else:
        data = bytes(s + 128 for s in samples)
    return (
        b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
        + b"fmt " + struct.pack("<IHHIIHH", 16, 1, channels, rate,
                                rate * channels * bits // 8,
                                channels * bits // 8, bits)
        + b"data" + struct.pack("<I", len(data)) + data
    )


def test_decode_audio_real_wav(spark):
    """decode_audio_real REALLY parses RIFF/WAVE PCM: chunk walk,
    16-bit signed and 8-bit centered samples, exact integer peak and
    floor-mean-square, duration from the fmt sample rate."""
    from geist_spark.operators.multimodal import decode_audio_real

    s16 = [1000, -1000, 32767, -32768]
    rows = [
        (1, _wav_bytes(s16)),
        (2, _wav_bytes([0, 100, -100, 50], bits=8)),
        (3, None),
    ]
    media = spark.createDataFrame(rows, "media_id long, payload binary")
    out = {r["media_id"]: r for r in decode_audio_real(media).collect()}
    r1 = out[1]
    assert (r1["format"], r1["n_channels"], r1["sample_rate"],
            r1["bit_depth"], r1["n_frames"]) == ("WAV", 1, 8000, 16, 4)
    assert r1["peak_abs"] == 32768
    assert r1["mean_square_fx"] == sum(s * s for s in s16) // 4
    assert r1["duration_ms"] == 4 * 1000 // 8000
    r2 = out[2]
    assert (r2["bit_depth"], r2["peak_abs"]) == (8, 100)
    assert r2["mean_square_fx"] == (0 + 100 * 100 + 100 * 100 + 50 * 50) // 4
    assert out[3]["format"] is None


def test_decode_audio_g711(spark):
    """REAL G.711 µ-law/A-law expansion: the LUTs reproduce the
    canonical ITU-T reference points (0xFF->0, ±32124 µ-law extremes;
    ±8 / ±32256 A-law extremes), a companded WAV decodes through the
    same surface as linear PCM, and ADPCM stays a typed capability
    limit."""
    import struct

    import numpy as np

    from geist_spark.operators.multimodal import (
        _g711_tables,
        decode_audio_real,
    )

    ulaw, alaw = _g711_tables()
    # canonical reference points (CCITT ulaw2linear / alaw2linear)
    assert ulaw[0xFF] == 0 and ulaw[0x7F] == 0
    assert ulaw[0x80] == 32124 and ulaw[0x00] == -32124
    assert alaw[0xD5] == 8 and alaw[0x55] == -8
    assert alaw[0xAA] == 32256 and alaw[0x2A] == -32256
    # µ-law is symmetric: code and code^0x80 negate each other
    assert (ulaw[np.arange(128)] == -ulaw[np.arange(128) + 128]).all()
    assert (alaw[np.arange(128)] == -alaw[np.arange(128) + 128]).all()

    def g711_wav(code: int, payload: bytes) -> bytes:
        return (
            b"RIFF" + struct.pack("<I", 36 + len(payload)) + b"WAVE"
            + b"fmt "
            + struct.pack("<IHHIIHH", 16, code, 1, 8000, 8000, 1, 8)
            + b"data" + struct.pack("<I", len(payload)) + payload
        )

    codes = bytes([0x00, 0x80, 0xFF, 0xD5, 0x55, 0x2A])
    adpcm = g711_wav(0x11, codes)  # IMA ADPCM: capability limit
    media = spark.createDataFrame(
        [(1, g711_wav(7, codes)), (2, g711_wav(6, codes)), (3, adpcm)],
        "media_id long, payload binary",
    )
    out = {r["media_id"]: r for r in
           decode_audio_real(media, on_unsupported="null").collect()}
    exp_u = ulaw[np.frombuffer(codes, np.uint8)]
    exp_a = alaw[np.frombuffer(codes, np.uint8)]
    assert out[1]["bit_depth"] == 8 and out[1]["format"] == "WAV"
    assert out[1]["peak_abs"] == int(np.abs(exp_u).max())
    assert out[1]["mean_square_fx"] == int((exp_u * exp_u).sum()) // 6
    assert out[2]["peak_abs"] == int(np.abs(exp_a).max())
    assert out[2]["mean_square_fx"] == int((exp_a * exp_a).sum()) // 6
    assert out[3]["format"] is None


def test_decode_audio_ima_adpcm(spark):
    """IMA ADPCM mono decode matches CPython's audioop reference
    bit-for-bit (audioop packs high-nibble-first, WAV low-first — the
    test converts); multi-block streams decode; stereo is a typed
    capability limit; malformed headers raise."""
    import struct
    import warnings

    import numpy as np

    from geist_spark.operators.multimodal import (
        _ima_adpcm_decode_mono,
        decode_audio_real,
    )

    rng = np.random.default_rng(19)
    nib = rng.integers(0, 16, 120, dtype=np.uint8)
    pred0, idx0 = -1234, 30
    wav_nib = bytes(
        int(nib[i]) | (int(nib[i + 1]) << 4) for i in range(0, 120, 2)
    )
    block = struct.pack("<hBB", pred0, idx0, 0) + wav_nib
    mine = _ima_adpcm_decode_mono(block, len(block))
    assert mine[0] == pred0 and len(mine) == 1 + 120
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        import audioop
    aud = bytes(
        (int(nib[i]) << 4) | int(nib[i + 1]) for i in range(0, 120, 2)
    )
    lin, _ = audioop.adpcm2lin(aud, 2, (pred0, idx0))
    ref = np.frombuffer(lin, dtype="<i2").astype(np.int64)
    assert (mine[1:] == ref).all()
    # two blocks: state resets from each header
    two = _ima_adpcm_decode_mono(block + block, len(block))
    assert (two == np.concatenate([mine, mine])).all()

    def adpcm_wav(ch: int, payload: bytes, align: int) -> bytes:
        return (
            b"RIFF" + struct.pack("<I", 36 + len(payload)) + b"WAVE"
            + b"fmt "
            + struct.pack("<IHHIIHH", 16, 0x11, ch, 8000, 4000, align, 4)
            + b"data" + struct.pack("<I", len(payload)) + payload
        )

    # stereo: per-channel headers + 4-byte channel group rows must
    # deinterleave to exactly the two mono decodes
    from geist_spark.operators.multimodal import _ima_adpcm_decode

    nib2 = rng.integers(0, 16, 64, dtype=np.uint8)
    wav_nib2 = bytes(
        int(nib2[i]) | (int(nib2[i + 1]) << 4) for i in range(0, 64, 2)
    )
    left = struct.pack("<hBB", 500, 10, 0) + wav_nib[:32]
    right = struct.pack("<hBB", -500, 40, 0) + wav_nib2[:32]
    groups = b"".join(
        left[4:][g:g + 4] + right[4:][g:g + 4] for g in range(0, 32, 4)
    )
    st_block = left[:4] + right[:4] + groups
    st = _ima_adpcm_decode(st_block, 2, len(st_block))
    ml = _ima_adpcm_decode(left, 1, len(left))
    mr = _ima_adpcm_decode(right, 1, len(right))
    assert (st[0::2] == ml).all() and (st[1::2] == mr).all()

    media = spark.createDataFrame(
        [(1, adpcm_wav(1, block, len(block))),
         (2, adpcm_wav(2, st_block, len(st_block)))],
        "media_id long, payload binary",
    )
    out = {r["media_id"]: r for r in
           decode_audio_real(media, on_unsupported="null").collect()}
    assert out[1]["format"] == "WAV" and out[1]["bit_depth"] == 4
    assert out[1]["n_frames"] == 121
    assert out[1]["peak_abs"] == int(np.abs(mine).max())
    assert out[1]["mean_square_fx"] == int((mine * mine).sum()) // 121
    assert out[2]["format"] == "WAV" and out[2]["n_channels"] == 2
    assert out[2]["n_frames"] == 65  # header frame + 64 coded
    assert out[2]["peak_abs"] == int(
        max(np.abs(ml).max(), np.abs(mr).max())
    )
    # malformed: bad step index / short block / bad align
    import pytest

    bad_idx = struct.pack("<hBB", 0, 99, 0) + b"\x00"
    with pytest.raises(ValueError, match="step index"):
        _ima_adpcm_decode_mono(bad_idx, len(bad_idx))
    with pytest.raises(ValueError, match="shorter than"):
        _ima_adpcm_decode_mono(b"\x00\x00\x00\x00ab" + b"\x01", 6)
    df = spark.createDataFrame(
        [(1, adpcm_wav(1, block, 3))], "media_id long, payload binary"
    )
    with pytest.raises(Exception, match="block align"):
        decode_audio_real(df, on_unsupported="null").collect()


def test_decode_audio_real_unsupported_and_malformed(spark):
    from geist_spark.operators.multimodal import decode_audio_real

    mixed = spark.createDataFrame(
        [(1, _wav_bytes([1, 2])), (2, b"ID3\x03mp3ish")],
        "media_id long, payload binary",
    )
    with pytest.raises(Exception, match="RIFF/WAVE"):
        decode_audio_real(mixed).collect()
    out = {r["media_id"]: r for r in
           decode_audio_real(mixed, on_unsupported="null").collect()}
    assert out[1]["format"] == "WAV" and out[2]["format"] is None
    # data chunk header claims more bytes than present -> typed error
    trunc = _wav_bytes([1, 2, 3, 4])[:-4]
    bad = spark.createDataFrame([(1, trunc)], "media_id long, payload binary")
    with pytest.raises(Exception, match="truncated WAV data"):
        decode_audio_real(bad).collect()


def test_audio_dsp_features_analytic(spark):
    """FFT features against signals with closed-form answers: a pure
    sine at bin 8 of a 64-sample 8 kHz clip has centroid == rolloff ==
    1000 Hz and ~zero bandwidth; an alternating ±A signal is the
    Nyquist tone (4000 Hz) with n-1 zero crossings; a constant (DC)
    clip reports silent spectra, not FFT rounding noise; stereo mixes
    down by exact per-frame sum."""
    import math

    from geist_spark.operators.multimodal import audio_dsp_features

    n, rate, amp = 64, 8000, 10000
    sine = [round(amp * math.sin(2 * math.pi * 8 * i / n))
            for i in range(n)]
    alt = [amp if i % 2 == 0 else -amp for i in range(n)]
    dc = [500] * n
    # stereo: L == R == sine, interleaved -> mixdown doubles amplitudes
    stereo = [v for v in sine for _ in (0, 1)]
    rows = [
        (1, _wav_bytes(sine, rate=rate)),
        (2, _wav_bytes(alt, rate=rate)),
        (3, _wav_bytes(dc, rate=rate)),
        (4, _wav_bytes(stereo, rate=rate, channels=2)),
    ]
    media = spark.createDataFrame(rows, "media_id long, payload binary")
    out = {r["media_id"]: r for r in audio_dsp_features(media).collect()}
    s = out[1]
    assert s["format"] == "WAV" and s["n_frames"] == n
    assert abs(s["spectral_centroid_hz"] - 1000.0) < 1.0
    assert s["spectral_rolloff_hz"] == 1000.0
    assert s["spectral_bandwidth_hz"] < 5.0
    assert s["spectral_flatness"] < 0.01
    # exact zeros bucket as non-negative: 8 falling (+→−) transitions
    # at i=8k+5, but only 7 rising ones (i=8k, k≥1) fit in 64 samples
    assert s["zero_crossings"] == 15
    a = out[2]
    assert a["zero_crossings"] == n - 1
    assert abs(a["spectral_centroid_hz"] - 4000.0) < 1e-6
    assert a["spectral_rolloff_hz"] == 4000.0
    assert a["peak_abs"] == amp and a["sum_abs"] == n * amp
    d = out[3]
    assert d["zero_crossings"] == 0 and d["peak_abs"] == 500
    assert d["spectral_centroid_hz"] == 0.0
    assert d["spectral_rolloff_hz"] == 0.0
    st = out[4]
    assert st["n_frames"] == n
    assert st["sum_abs"] == 2 * out[1]["sum_abs"]
    assert abs(st["spectral_centroid_hz"] - 1000.0) < 1.0


def test_audio_dsp_error_contract(spark):
    """audio_dsp_features mirrors decode_audio_real's two-tier error
    contract: non-WAV payloads NULL under 'null', malformed WAV always
    raises."""
    import struct

    import pytest

    from geist_spark.operators.multimodal import audio_dsp_features

    rows = spark.createDataFrame(
        [(1, _wav_bytes([3, -3, 3])), (2, b"ID3\x04mp3-ish"), (3, None)],
        "media_id long, payload binary",
    )
    out = {r["media_id"]: r for r in
           audio_dsp_features(rows, on_unsupported="null").collect()}
    assert out[1]["zero_crossings"] == 2
    assert out[2]["format"] is None and out[3]["format"] is None
    with pytest.raises(Exception, match="media_id=2"):
        audio_dsp_features(rows).collect()
    odd = (
        b"RIFF" + struct.pack("<I", 36 + 5) + b"WAVE"
        + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, 8000, 16000, 2, 16)
        + b"data" + struct.pack("<I", 5) + b"\x01\x02\x03\x04\x05"
    )
    with pytest.raises(Exception, match="not a multiple"):
        audio_dsp_features(
            spark.createDataFrame(
                [(1, odd)], "media_id long, payload binary"
            ),
            on_unsupported="null",
        ).collect()


def test_decode_error_taxonomy(spark):
    """CAPABILITY limits (unknown format, unsupported variant) NULL
    out under on_unsupported='null'; MALFORMED payloads of a supported
    format always raise, regardless of the option."""
    import struct
    from geist_spark.operators.multimodal import (
        decode_audio_real,
        decode_real,
    )

    # RIFF-but-WebP must hit the audio NULL path, not crash the stage
    webp = b"RIFF" + struct.pack("<I", 12) + b"WEBPVP8 fake"
    rows = spark.createDataFrame(
        [(1, _wav_bytes([5, -5])), (2, webp)],
        "media_id long, payload binary",
    )
    out = {r["media_id"]: r for r in
           decode_audio_real(rows, on_unsupported="null").collect()}
    assert out[1]["format"] == "WAV" and out[2]["format"] is None
    # compressed BMP is a capability limit -> NULL under 'null'
    rle_bmp = bytearray(_bmp_bytes(1, 1, [(1, 2, 3)]))
    rle_bmp[30] = 1  # biCompression = BI_RLE8
    img = spark.createDataFrame(
        [(1, _ppm_bytes(1, 1, [(4, 5, 6)])), (2, bytes(rle_bmp))],
        "media_id long, payload binary",
    )
    got = {r["media_id"]: r for r in
           decode_real(img, on_unsupported="null").collect()}
    assert got[1]["format"] == "P6" and got[2]["format"] is None
    # malformed stays fatal even under 'null': negative PPM dims,
    # BMP pixel offset inside the header, non-frame-multiple WAV data
    neg = spark.createDataFrame(
        [(1, b"P6\n-4 2\n255\nXXXXXXXX")], "media_id long, payload binary"
    )
    with pytest.raises(Exception, match="malformed PPM"):
        decode_real(neg, on_unsupported="null").collect()
    bad_off = bytearray(_bmp_bytes(1, 1, [(1, 2, 3)]))
    bad_off[10] = 0  # pixel offset -> 0 (inside the header)
    with pytest.raises(Exception, match="malformed BMP"):
        decode_real(
            spark.createDataFrame(
                [(1, bytes(bad_off))], "media_id long, payload binary"
            ),
            on_unsupported="null",
        ).collect()
    odd = (
        b"RIFF" + struct.pack("<I", 36 + 5) + b"WAVE"
        + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, 8000, 16000, 2, 16)
        + b"data" + struct.pack("<I", 5) + b"\x01\x02\x03\x04\x05"
    )
    with pytest.raises(Exception, match="not a multiple"):
        decode_audio_real(
            spark.createDataFrame(
                [(1, odd)], "media_id long, payload binary"
            ),
            on_unsupported="null",
        ).collect()


def _avi_bytes(frames_px, w, h, usec_per_frame=40000, compressed=False,
               top_down=False, bpp=24, trailing=b""):
    """Minimal uncompressed AVI: RIFF('AVI ') + LIST(hdrl){avih,
    LIST(strl){strh, strf}} + LIST(movi){00db raw DIB frames}.
    frames_px = list of row-major RGB pixel lists; frames stored BGR
    with 4-byte padding, bottom-up unless top_down (strf biHeight
    sign carries the row order, like BMP). compressed sets strf
    biCompression=1 while KEEPING the '00db' tag — the tag is
    advisory; biCompression is the real discriminator."""
    import struct

    def chunk(cid, body):
        return cid + struct.pack("<I", len(body)) + body + (
            b"\x00" if len(body) & 1 else b""
        )

    avih = struct.pack(
        "<IIIIIIIIIIIIII",
        usec_per_frame, 0, 0, 0, len(frames_px), 0, 1, 0, w, h, 0, 0, 0, 0,
    )
    strh = chunk(b"strh", b"vids" + b"DIB " + b"\x00" * 48)
    strf = chunk(b"strf", struct.pack(
        "<IiiHHIIiiII", 40, w, (-h if top_down else h), 1, bpp,
        1 if compressed else 0, 0, 0, 0, 0, 0,
    ))
    strl = chunk(b"LIST", b"strl" + strh + strf)
    hdrl = chunk(b"LIST", b"hdrl" + chunk(b"avih", avih) + strl)
    stride = (w * 3 + 3) & ~3
    movi_body = b"movi"
    for px in frames_px:
        rows = []
        for r in range(h):
            src = r if top_down else h - 1 - r
            row = b"".join(
                bytes((px[src * w + c][2], px[src * w + c][1],
                       px[src * w + c][0]))
                for c in range(w)
            )
            rows.append(row + b"\x00" * (stride - len(row)))
        movi_body += chunk(b"00db", b"".join(rows))
    riff_body = b"AVI " + hdrl + chunk(b"LIST", movi_body)
    return (
        b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body + trailing
    )


def _mjpeg_avi_bytes(jpeg_frames, w, h, usec_per_frame=40000):
    """Minimal MJPEG AVI: same container as _avi_bytes but strf
    biCompression = fourcc 'MJPG' and each movi chunk is a standalone
    JPEG payload ('00dc' tag — advisory, like '00db')."""
    import struct

    def chunk(cid, body):
        return cid + struct.pack("<I", len(body)) + body + (
            b"\x00" if len(body) & 1 else b""
        )

    avih = struct.pack(
        "<IIIIIIIIIIIIII",
        usec_per_frame, 0, 0, 0, len(jpeg_frames), 0, 1, 0, w, h,
        0, 0, 0, 0,
    )
    strh = chunk(b"strh", b"vids" + b"MJPG" + b"\x00" * 48)
    (mjpg,) = struct.unpack("<I", b"MJPG")
    strf = chunk(b"strf", struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, mjpg, 0, 0, 0, 0, 0,
    ))
    strl = chunk(b"LIST", b"strl" + strh + strf)
    hdrl = chunk(b"LIST", b"hdrl" + chunk(b"avih", avih) + strl)
    movi_body = b"movi"
    for jf in jpeg_frames:
        movi_body += chunk(b"00dc", jf)
    riff_body = b"AVI " + hdrl + chunk(b"LIST", movi_body)
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body


def test_frame_sample_real_mjpeg(spark):
    """frame_sample_real decodes MJPEG AVI through the baseline JPEG
    decoder: DC-exact frames reproduce their levels bit-exactly (luma
    matches the same image as raw-DIB — the cross-codec contract),
    dims come from the decoded frame, skipped frames are never
    decoded, and a non-JPEG frame under the MJPG fourcc is malformed."""
    import numpy as np
    import pytest

    from geist_spark.operators.jpeg import jpeg_encode_baseline
    from geist_spark.operators.multimodal import frame_sample_real

    lev0 = np.arange(6, dtype=np.uint8).reshape(2, 3) * 40
    lev1 = lev0 + 7
    frames = []
    pixel_frames = []
    for lev in (lev0, lev1):
        gray = np.repeat(np.repeat(lev, 8, axis=0), 8, axis=1)  # 16x24
        frames.append(
            jpeg_encode_baseline(24, 16, gray=gray.tobytes(), quant=8)
        )
        pixel_frames.append(
            [(int(v), int(v), int(v)) for v in gray.reshape(-1)]
        )
    mj = _mjpeg_avi_bytes(frames, 24, 16)
    raw = _avi_bytes(pixel_frames, 24, 16)
    media = spark.createDataFrame(
        [(1, mj), (2, raw)], "media_id long, payload binary"
    )
    out = frame_sample_real(media, every_ms=40).collect()
    rows = {(r["media_id"], r["frame_idx"]): r for r in out}
    assert len(rows) == 4
    for idx in (0, 1):
        m, r = rows[(1, idx)], rows[(2, idx)]
        assert (m["width"], m["height"]) == (24, 16)
        # cross-codec: MJPEG frame == raw-DIB frame, one hash/luma
        assert m["pixel_md5"] == r["pixel_md5"]
        assert m["mean_luma_fx"] == r["mean_luma_fx"]
    # exact luma replay from the levels
    exp0 = 1000 * int(lev0.astype(int).sum()) * 64 // (24 * 16)
    assert rows[(1, 0)]["mean_luma_fx"] == exp0
    # stride sampling: every_ms=80 at 25fps keeps frame 0 only
    sampled = frame_sample_real(media, every_ms=80).collect()
    assert {(r["media_id"], r["frame_idx"]) for r in sampled} == {
        (1, 0), (2, 0)
    }
    # a non-JPEG frame under MJPG fourcc: malformed, always raises
    bad = _mjpeg_avi_bytes([b"notjpeg!"], 24, 16)
    df = spark.createDataFrame([(1, bad)], "media_id long, payload binary")
    with pytest.raises(Exception, match="not a JPEG"):
        frame_sample_real(df, on_unsupported="null").collect()
    # a CAPABILITY-limited frame (lossless SOF3 under MJPG — SOF2
    # progressive decodes for real since round 8) names the media_id
    # in 'error' mode and collapses the media to ONE NULL row under
    # 'null' — no partial frame fan-out left behind
    prog = bytearray(frames[0])
    i = prog.index(b"\xff\xc0")
    prog[i + 1] = 0xC3
    capav = _mjpeg_avi_bytes([bytes(prog), frames[1]], 24, 16)
    df = spark.createDataFrame(
        [(9, capav)], "media_id long, payload binary"
    )
    with pytest.raises(Exception, match="media_id=9"):
        frame_sample_real(df, every_ms=40).collect()
    nulled = frame_sample_real(df, every_ms=40,
                               on_unsupported="null").collect()
    assert len(nulled) == 1
    assert nulled[0]["media_id"] == 9 and nulled[0]["frame_idx"] is None


def test_frame_sample_real_avi(spark):
    """frame_sample_real REALLY extracts frames from uncompressed AVI:
    dims/timestamps from avih, frames normalized to RGB (a frame equal
    to a BMP/PPM image hashes identically — the cross-container
    contract), stride sampling from every_ms."""
    from geist_spark.operators.multimodal import (
        decode_real,
        frame_sample_real,
    )

    pixels = [(255, 0, 0), (0, 255, 0), (0, 0, 255),
              (10, 20, 30), (40, 50, 60), (70, 80, 90)]
    f2 = [(1, 2, 3), (4, 5, 6), (7, 8, 9), (9, 8, 7), (6, 5, 4), (3, 2, 1)]
    avi = _avi_bytes([pixels, f2, pixels], 3, 2, usec_per_frame=40000)
    media = spark.createDataFrame(
        [(1, avi)], "media_id long, payload binary"
    )
    # every_ms=40 -> stride 1: all three frames
    rows = {r["frame_idx"]: r for r in
            frame_sample_real(media, every_ms=40).collect()}
    assert sorted(rows) == [0, 1, 2]
    assert (rows[0]["width"], rows[0]["height"]) == (3, 2)
    assert [rows[i]["ts_ms"] for i in (0, 1, 2)] == [0, 40, 80]
    # cross-container: frame 0 == the same image as a PPM
    ppm_hash = decode_real(spark.createDataFrame(
        [(9, _ppm_bytes(3, 2, pixels))], "media_id long, payload binary"
    )).collect()[0]["pixel_md5"]
    assert rows[0]["pixel_md5"] == ppm_hash == rows[2]["pixel_md5"]
    assert rows[1]["pixel_md5"] != ppm_hash
    # every_ms=80 -> stride 2: frames 0 and 2 only
    sampled = sorted(
        r["frame_idx"]
        for r in frame_sample_real(media, every_ms=80).collect()
    )
    assert sampled == [0, 2]
    # top-down AVI (negative strf biHeight) normalizes to the SAME
    # pixel hash; trailing padding after the RIFF size is ignored
    td = _avi_bytes([pixels], 3, 2, top_down=True, trailing=b"JUNKJUNK")
    tr = frame_sample_real(
        spark.createDataFrame([(2, td)], "media_id long, payload binary"),
        every_ms=40,
    ).collect()
    assert len(tr) == 1 and tr[0]["pixel_md5"] == ppm_hash
    # decodable but frameless: one NULL-frame row, id never vanishes
    empty = _avi_bytes([], 3, 2)
    er = frame_sample_real(
        spark.createDataFrame([(3, empty)], "media_id long, payload binary")
    ).collect()
    assert len(er) == 1 and er[0]["frame_idx"] is None
    assert (er[0]["width"], er[0]["height"]) == (3, 2)


def test_frame_sample_real_errors(spark):
    from geist_spark.operators.multimodal import frame_sample_real

    pixels = [(1, 2, 3)]
    # biCompression=1 with an advisory '00db' tag: the strf field is
    # the discriminator -> capability limit, raise / NULL by option
    comp = _avi_bytes([pixels], 1, 1, compressed=True)
    media = spark.createDataFrame(
        [(1, comp)], "media_id long, payload binary"
    )
    with pytest.raises(Exception, match="codec"):
        frame_sample_real(media).collect()
    out = frame_sample_real(media, on_unsupported="null").collect()
    assert len(out) == 1 and out[0]["frame_idx"] is None
    # 32-bpp raw DIB: capability limit too (would misread as BGR24)
    deep = _avi_bytes([pixels], 1, 1, bpp=32)
    with pytest.raises(Exception, match="bpp=32"):
        frame_sample_real(
            spark.createDataFrame([(1, deep)], "media_id long, payload binary")
        ).collect()
    # truncated frame chunk: malformed -> always raises
    good = _avi_bytes([pixels], 1, 1)
    trunc = good[: len(good) - 2]
    with pytest.raises(Exception, match="truncated AVI"):
        frame_sample_real(
            spark.createDataFrame(
                [(1, trunc)], "media_id long, payload binary"
            ),
            on_unsupported="null",
        ).collect()
    with pytest.raises(ValueError, match="every_ms"):
        frame_sample_real(media, every_ms=0)


def test_resize_real_nearest_neighbor(spark):
    """resize_real resamples ACTUAL pixels: known 4x2 -> 2x1 picks
    source columns 0 and 2 of row 0 (src = dst*src_dim // dst_dim);
    upscale 1x1 -> 3x2 replicates the single pixel; identity resize
    preserves the decode_real hash."""
    from geist_spark.operators.multimodal import decode_real, resize_real

    px = [(10, 20, 30), (40, 50, 60), (70, 80, 90), (100, 110, 120),
          (1, 2, 3), (4, 5, 6), (7, 8, 9), (11, 12, 13)]
    media = spark.createDataFrame(
        [(1, _ppm_bytes(4, 2, px))], "media_id long, payload binary"
    )
    r = resize_real(media, 2, 1).collect()[0]
    assert (r["width"], r["height"]) == (2, 1)
    # dst row 0 -> src row 0*2//1 = 0; dst cols 0,1 -> src cols 0,2
    keep = [px[0], px[2]]
    sr, sg, sb = (sum(p[c] for p in keep) for c in (0, 1, 2))
    assert r["mean_luma_fx"] == (299 * sr + 587 * sg + 114 * sb) // 2
    # upscale replicates: all 6 output pixels = the one source pixel
    one = spark.createDataFrame(
        [(2, _ppm_bytes(1, 1, [(200, 100, 50)]))],
        "media_id long, payload binary",
    )
    u = resize_real(one, 3, 2).collect()[0]
    assert u["mean_luma_fx"] == 299 * 200 + 587 * 100 + 114 * 50
    # identity resize == decode_real's pixel hash
    ident = resize_real(media, 4, 2).collect()[0]
    dec = decode_real(media).collect()[0]
    assert ident["pixel_md5"] == dec["pixel_md5"]
    with pytest.raises(ValueError, match="positive"):
        resize_real(media, 0, 4)


def test_resize_real_grayscale_channels(spark):
    """channels reports the SOURCE channel count (decode_real's
    meaning of the column): grayscale stays 1 through a resize."""
    from geist_spark.operators.multimodal import resize_real

    m = spark.createDataFrame(
        [(1, _pgm_bytes(2, 1, [100, 200]))], "media_id long, payload binary"
    )
    r = resize_real(m, 4, 2).collect()[0]
    assert (r["channels"], r["width"], r["height"]) == (1, 4, 2)
    # NN upscale of [100, 200] to 4x2 doubles each column in each row
    assert r["mean_luma_fx"] == (100 + 200) * 1000 // 2


def test_decode_real_tiff_cross_format(spark):
    """decode_real REALLY decodes uncompressed TIFF: the same image as
    PPM, little- AND big-endian, single- and multi-strip, yields ONE
    pixel_md5; hand-built grayscale (BlackIsZero AND WhiteIsZero) and
    palette variants decode through their photometric paths."""
    import struct

    from geist_spark.operators.multimodal import decode_real, tiff_encode_rgb

    pixels = [(255, 0, 0), (0, 255, 0), (0, 0, 255),
              (10, 20, 30), (40, 50, 60), (70, 80, 90)]
    rgb = bytes(v for p in pixels for v in p)

    def gray_tiff(vals, photo, colormap=None):
        # minimal hand-built II single-strip 1-sample TIFF
        e = "<"
        tags = [
            (256, 3, 1, len(vals)), (257, 3, 1, 1), (258, 3, 1, 8),
            (259, 3, 1, 1), (262, 3, 1, photo), (277, 3, 1, 1),
            (279, 4, 1, len(vals)),
        ]
        extra = b""
        n_tags = len(tags) + 1 + (1 if colormap is not None else 0)
        ifd_off = 8
        data_off = ifd_off + 2 + 12 * n_tags + 4
        cm_off = data_off + len(vals)
        tags.append((273, 4, 1, data_off))
        if colormap is not None:
            tags.append((320, 3, len(colormap), cm_off))
            extra = b"".join(struct.pack(e + "H", v) for v in colormap)
        tags.sort()
        ifd = struct.pack(e + "H", n_tags)
        for t, ty, c, v in tags:
            ifd += struct.pack(e + "HHI", t, ty, c)
            if ty == 3 and c == 1:
                ifd += struct.pack(e + "H", v) + b"\x00\x00"
            else:
                ifd += struct.pack(e + "I", v)
        ifd += struct.pack(e + "I", 0)
        return (b"II*\x00" + struct.pack(e + "I", 8) + ifd
                + bytes(vals) + extra)

    rows = [
        (1, _ppm_bytes(3, 2, pixels)),
        (2, tiff_encode_rgb(3, 2, rgb)),
        (3, tiff_encode_rgb(3, 2, rgb, big_endian=True, strips=2)),
        (4, gray_tiff([100, 200], 1)),
        (5, gray_tiff([155, 55], 0)),          # WhiteIsZero inverts
        (6, _pgm_bytes(2, 1, [100, 200])),
        (7, gray_tiff([1, 0], 3,
                      colormap=[9 << 8, 1 << 8,    # reds
                                8 << 8, 2 << 8,    # greens
                                7 << 8, 3 << 8])),  # blues
    ]
    media = spark.createDataFrame(rows, "media_id long, payload binary")
    out = {r["media_id"]: r for r in decode_real(media).collect()}
    assert out[2]["format"] == "TIFF"
    assert (out[2]["width"], out[2]["height"], out[2]["channels"]) == (3, 2, 3)
    assert out[1]["pixel_md5"] == out[2]["pixel_md5"] == out[3]["pixel_md5"]
    # gray: photometric 1 matches PGM; photometric 0 is the inverse
    assert out[4]["channels"] == 1
    assert out[4]["pixel_md5"] == out[6]["pixel_md5"] == out[5]["pixel_md5"]
    # palette: index 1 -> (1,2,3), index 0 -> (9,8,7)
    assert out[7]["mean_luma_fx"] == (
        (299 * (1 + 9) + 587 * (2 + 8) + 114 * (3 + 7)) // 2
    )


def test_decode_real_tiff_errors(spark):
    """TIFF taxonomy: JPEG-in-TIFF/tiled/16-bit are CAPABILITY
    limits (LZW/PackBits/Deflate decode for real); truncated strips,
    missing tags, and codec-vs-bytes mismatches are MALFORMED."""
    import pytest

    from geist_spark.operators.multimodal import decode_real, tiff_encode_rgb

    good = tiff_encode_rgb(2, 2, bytes(range(12)))

    def mutate(tag, new_short):
        buf = bytearray(good)
        # IFD entries start at 10 (after header + count); find tag
        import struct
        n = struct.unpack_from("<H", buf, 8)[0]
        for i in range(n):
            off = 10 + 12 * i
            if struct.unpack_from("<H", buf, off)[0] == tag:
                struct.pack_into("<H", buf, off + 8, new_short)
                return bytes(buf)
        raise AssertionError(tag)

    jpeg_in_tiff = mutate(259, 7)  # JPEG-in-TIFF: capability limit
    caps = spark.createDataFrame(
        [(1, good), (2, jpeg_in_tiff)],
        "media_id long, payload binary",
    )
    out = {r["media_id"]: r for r in
           decode_real(caps, on_unsupported="null").collect()}
    assert out[1]["format"] == "TIFF"
    assert out[2]["format"] is None
    # Compression=5/8 over the wrong strip bytes is MALFORMED (the
    # decoders really run), so it raises even under on_unsupported=null
    for payload, msg in [
        (good[:30], "truncated TIFF"),
        (good[:-5], "truncated TIFF strip|strips carry"),
        (mutate(259, 5), "LZW"),
        (mutate(259, 8), "Deflate strip"),
    ]:
        df = spark.createDataFrame(
            [(1, payload)], "media_id long, payload binary"
        )
        with pytest.raises(Exception, match=msg):
            decode_real(df, on_unsupported="null").collect()


def test_decode_real_tiff_compressed(spark):
    """REAL LZW + PackBits TIFF decode: every (codec, predictor,
    byte-order, strips) combination decodes to the same pixels as the
    uncompressed file (cross-variant pixel_md5 golden), and malformed
    compressed streams are typed errors."""
    import numpy as np
    import pytest

    from geist_spark.operators.multimodal import (
        _packbits_decode,
        _tiff_lzw_decode,
        decode_real,
        tiff_encode_rgb,
    )

    rng = np.random.default_rng(42)
    w, h = 11, 7
    # half noise, half flat runs: exercises LZW dict growth AND
    # PackBits repeat packets
    noise = rng.integers(0, 256, w * 4 * 3, dtype=np.uint8).tobytes()
    flat = bytes([77]) * (w * 3 * 3)
    rgb = noise + flat
    rows = [
        (1, tiff_encode_rgb(w, h, rgb)),
        (2, tiff_encode_rgb(w, h, rgb, compression="lzw")),
        (3, tiff_encode_rgb(w, h, rgb, compression="lzw", predictor=2,
                            big_endian=True, strips=3)),
        (4, tiff_encode_rgb(w, h, rgb, compression="packbits",
                            strips=2)),
        (5, tiff_encode_rgb(w, h, rgb, compression="packbits",
                            predictor=2)),
        (6, tiff_encode_rgb(w, h, rgb, compression="deflate")),
        (7, tiff_encode_rgb(w, h, rgb, compression="deflate",
                            predictor=2, big_endian=True, strips=3)),
    ]
    media = spark.createDataFrame(rows, "media_id long, payload binary")
    out = decode_real(media).collect()
    md5s = {r["pixel_md5"] for r in out}
    assert len(md5s) == 1 and len(out) == 7
    assert all(r["width"] == w and r["height"] == h for r in out)
    # malformed Deflate strip: typed error
    import zlib as _zlib

    bad = bytearray(tiff_encode_rgb(w, h, rgb, compression="deflate"))
    k = bytes(bad).rfind(_zlib.compress(rgb)[:4])
    bad[k + 2] ^= 0xFF
    df = spark.createDataFrame(
        [(1, bytes(bad))], "media_id long, payload binary"
    )
    with pytest.raises(Exception, match="Deflate strip|decodes to"):
        decode_real(df).collect()

    # malformed compressed streams: typed ValueError, never silence
    with pytest.raises(ValueError, match="LZW code .* out of range"):
        # 9-bit code 258 right after the implicit fresh table
        _tiff_lzw_decode(bytes([0b10000001, 0]), 100)
    with pytest.raises(ValueError, match="ends without EOI"):
        _tiff_lzw_decode(b"\x00", 100)
    with pytest.raises(ValueError, match="truncated PackBits"):
        _packbits_decode(b"\x05ab", 100)
    with pytest.raises(ValueError, match="truncated PackBits run"):
        _packbits_decode(b"\xfe", 100)
    # bomb bound: a run longer than the strip's declared bytes
    with pytest.raises(ValueError, match="overflows strip"):
        _packbits_decode(b"\x81x", 1)
    with pytest.raises(ValueError, match="more than"):
        # 9-bit code 0 forty times: literal roots overflow the bound
        _tiff_lzw_decode(bytes(45), 10)
    # unknown predictor value: capability limit, not malformed
    t = tiff_encode_rgb(2, 2, bytes(range(12)), compression="lzw",
                        predictor=2)
    buf = bytearray(t)
    import struct
    n = struct.unpack_from("<H", buf, 8)[0]
    for i in range(n):
        off = 10 + 12 * i
        if struct.unpack_from("<H", buf, off)[0] == 317:
            struct.pack_into("<H", buf, off + 8, 3)
    df = spark.createDataFrame(
        [(1, bytes(buf))], "media_id long, payload binary"
    )
    row = decode_real(df, on_unsupported="null").collect()[0]
    assert row["format"] is None


def test_image_dhash_and_near_dup(spark):
    """dhash comparison/packing semantics on a hand-computed image;
    identical images across FORMATS share a hash (decode-normalized);
    banded near-dup finds the planted hamming-1 twin and nothing
    else; parameter guards hold."""
    import pytest

    from geist_spark.operators.multimodal import (
        dhash_near_dup,
        gif_encode_rgb,
        image_dhash,
    )

    # 3x2 gray P5: rows [5,3,3] and [1,1,9] -> bits (g[c] > g[c+1]):
    # row0: 5>3=1, 3>3=0; row1: 1>1=0, 1>9=0 -> MSB-first 1000b = 8
    p5 = b"P5 3 2 255\n" + bytes([5, 3, 3, 1, 1, 9])
    rgb = bytes(v for g in [5, 3, 3, 1, 1, 9] for v in (g, g, g))
    gif = gif_encode_rgb(3, 2, rgb)
    media = spark.createDataFrame(
        [(1, p5), (2, gif)], "media_id long, payload binary"
    )
    out = {r["media_id"]: r for r in image_dhash(media, 2, 2).collect()}
    assert out[1]["dhash"] == 8
    assert out[2]["dhash"] == 8  # same image, different container

    # planted near-dups: base hash vs 1-bit and 5-bit perturbations
    def img64(h64):
        px = bytearray()
        for r in range(8):
            g = [128] * 9
            for c in reversed(range(8)):
                g[c] = g[c + 1] + ((h64 >> (63 - (r * 8 + c))) & 1)
            px += bytes(g)
        return b"P5 9 8 255\n" + bytes(px)

    base = 0x0123456789ABCDEF
    near = base ^ (1 << 40)
    far = base ^ 0x1F                      # 5 bits away
    hashes = image_dhash(
        spark.createDataFrame(
            [(1, img64(base)), (2, img64(near)), (3, img64(far))],
            "media_id long, payload binary",
        ),
        8, 8,
    )
    got = {r["media_id"]: r["dhash"] for r in hashes.collect()}
    assert got[1] == base and got[2] == near and got[3] == far
    pairs = dhash_near_dup(hashes, max_hamming=2, bands=4).collect()
    assert [(p["media_id_a"], p["media_id_b"], p["hamming"])
            for p in pairs] == [(1, 2, 1)]
    with pytest.raises(ValueError, match="pigeonhole"):
        dhash_near_dup(hashes, max_hamming=4, bands=4)
    with pytest.raises(ValueError, match="divisible"):
        dhash_near_dup(hashes, max_hamming=2, bands=5)
    with pytest.raises(ValueError, match="1..64"):
        image_dhash(media, 9, 8)


def test_exif_extract_and_strip_metadata(spark):
    """EXIF APP1 parse (both TIFF byte orders, inline + offset tag
    values, GPS-IFD presence flag); lossless metadata strip returns
    the exact pre-tag bytes and drops COM too; JPEG without Exif is
    a normal row; non-JPEG honors on_unsupported modes; malformed
    structure always raises."""
    import pytest

    from geist_spark.operators.jpeg import jpeg_encode_baseline
    from geist_spark.operators.multimodal import (
        exif_app1,
        exif_extract,
        strip_metadata,
    )

    base = jpeg_encode_baseline(8, 8, gray=bytes([128]) * 64)
    app1 = exif_app1("CamCo", "X100", 6, "2024:01:02 03:04:05", gps=True)
    app1_mm = exif_app1("B", "Y", 1, "2020:01:01 00:00:00",
                        big_endian=True)
    com = b"\xff\xfe\x00\x07hello"
    tagged = base[:2] + app1 + com + base[2:]
    tagged_mm = base[:2] + app1_mm + base[2:]
    ppm = b"P6 1 1 255\n\x00\x00\x00"
    media = spark.createDataFrame(
        [(1, tagged), (2, tagged_mm), (3, base), (4, ppm), (5, None)],
        "media_id long, payload binary",
    )
    out = {r["media_id"]: r for r in
           exif_extract(media, on_unsupported="null").collect()}
    assert (out[1]["make"], out[1]["model"], out[1]["orientation"],
            out[1]["datetime"], out[1]["has_gps"]) == (
        "CamCo", "X100", 6, "2024:01:02 03:04:05", True)
    assert (out[2]["make"], out[2]["orientation"],
            out[2]["has_gps"]) == ("B", 1, False)
    assert out[3]["format"] == "JPEG" and out[3]["make"] is None
    assert out[3]["has_gps"] is False
    assert out[4]["format"] is None and out[5]["format"] is None

    st = {r["media_id"]: r for r in
          strip_metadata(media, on_unsupported="keep").collect()}
    assert bytes(st[1]["payload"]) == base  # APP1 AND COM dropped
    assert bytes(st[2]["payload"]) == base
    assert st[1]["orig_len"] == len(tagged)
    assert st[1]["stripped_len"] == len(base)
    assert bytes(st[4]["payload"]) == ppm  # keep: passthrough
    nulled = {r["media_id"]: r for r in
              strip_metadata(media, on_unsupported="null").collect()}
    assert nulled[4]["payload"] is None
    with pytest.raises(Exception, match="not a JPEG"):
        strip_metadata(media).collect()
    bad = spark.createDataFrame(
        [(1, tagged[:20])], "media_id long, payload binary"
    )
    with pytest.raises(Exception, match="truncated JPEG"):
        exif_extract(bad, on_unsupported="null").collect()
    with pytest.raises(ValueError, match="on_unsupported"):
        strip_metadata(media, on_unsupported="bogus")

    # valid II*\0 magic but TIFF body < 8 bytes (IFD-offset field
    # truncated): must raise the documented MALFORMED ValueError,
    # not a bare struct.error
    import struct as _struct

    tiff_trunc = b"Exif\x00\x00" + b"II*\x00\x99\x99"
    seg = b"\xff\xe1" + _struct.pack(">H", len(tiff_trunc) + 2) + tiff_trunc
    trunc = base[:2] + seg + base[2:]
    tm = spark.createDataFrame(
        [(1, trunc)], "media_id long, payload binary"
    )
    with pytest.raises(Exception, match="malformed Exif: truncated TIFF"):
        exif_extract(tm, on_unsupported="null").collect()


def test_riff_info_extract_and_strip(spark):
    """RIFF LIST/INFO parse (NUL-terminated values, word padding,
    id3 flag); strip_metadata's WAV dispatch keeps only
    fmt /data/fact and recomputes the RIFF size; WAV without INFO is
    a normal row; truncated chunks raise."""
    import struct

    import pytest

    from geist_spark.operators.multimodal import (
        decode_audio_real,
        riff_info_extract,
        strip_metadata,
    )

    def wav_base():
        payload = b"\x00\x01" * 12
        return (
            b"RIFF" + struct.pack("<I", 36 + len(payload)) + b"WAVE"
            + b"fmt "
            + struct.pack("<IHHIIHH", 16, 1, 1, 8000, 16000, 2, 16)
            + b"data" + struct.pack("<I", len(payload)) + payload
        )

    def info_chunk(**kw):
        body = b"INFO"
        for sid, val in kw.items():
            v = val.encode() + b"\x00"
            body += sid.upper().encode() + struct.pack("<I", len(v)) + v
            if len(v) & 1:
                body += b"\x00"
        return b"LIST" + struct.pack("<I", len(body)) + body

    base = wav_base()
    tagged = (
        base
        + info_chunk(iart="Artist A", inam="Song", icrd="2024",
                     isft="enc v1")
        + b"id3 " + struct.pack("<I", 4) + b"tag!"
    )
    media = spark.createDataFrame(
        [(1, tagged), (2, base), (3, b"OggS....")],
        "media_id long, payload binary",
    )
    out = {r["media_id"]: r for r in
           riff_info_extract(media, on_unsupported="null").collect()}
    assert (out[1]["artist"], out[1]["title"], out[1]["date"],
            out[1]["software"], out[1]["has_id3"]) == (
        "Artist A", "Song", "2024", "enc v1", True)
    assert out[2]["format"] == "WAV" and out[2]["artist"] is None
    assert out[2]["has_id3"] is False
    assert out[3]["format"] is None

    st = {r["media_id"]: r for r in
          strip_metadata(media, on_unsupported="keep").collect()}
    assert bytes(st[1]["payload"]) == base
    assert st[1]["orig_len"] == len(tagged)
    assert st[1]["stripped_len"] == len(base)
    assert bytes(st[2]["payload"]) == base
    # the stripped WAV still decodes identically
    dec = decode_audio_real(
        spark.createDataFrame(
            [(1, st[1]["payload"])], "media_id long, payload binary"
        )
    ).collect()[0]
    assert dec["n_frames"] == 12
    bad = spark.createDataFrame(
        [(1, tagged[:-3])], "media_id long, payload binary"
    )
    with pytest.raises(Exception, match="truncated"):
        riff_info_extract(bad, on_unsupported="null").collect()


def test_strip_metadata_png(spark):
    """PNG dispatch in strip_metadata: tEXt/zTXt/iTXt/eXIf/tIME drop,
    critical + rendering chunks (incl. their CRCs) pass through
    byte-identically; the stripped PNG still decodes to the same
    pixels; truncated chunk framing raises."""
    import struct
    import zlib

    import pytest

    from geist_spark.operators.multimodal import (
        decode_real,
        png_encode_rgb,
        strip_metadata,
    )

    def chunk(ctype, body):
        return (
            struct.pack(">I", len(body)) + ctype + body
            + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
        )

    base = png_encode_rgb(3, 2, bytes(range(18)), [1, 4])
    cut = 8 + 8 + 13 + 4  # after IHDR
    meta = (
        chunk(b"tEXt", b"Comment\x00secret location")
        + chunk(b"tIME", struct.pack(">HBBBBB", 2024, 5, 1, 2, 3, 4))
        + chunk(b"iTXt", b"XML:com.adobe.xmp\x00\x00\x00\x00\x00gps")
        + chunk(b"eXIf", b"II*\x00\x08\x00\x00\x00\x00\x00")
    )
    phys = chunk(b"pHYs", struct.pack(">IIB", 2835, 2835, 1))
    tagged = base[:cut] + meta + phys + base[cut:]
    media = spark.createDataFrame(
        [(1, tagged)], "media_id long, payload binary"
    )
    st = strip_metadata(media).collect()[0]
    assert bytes(st["payload"]) == base[:cut] + phys + base[cut:]
    assert st["orig_len"] == len(tagged)
    dec = decode_real(
        spark.createDataFrame(
            [(1, st["payload"])], "media_id long, payload binary"
        )
    ).collect()[0]
    base_dec = decode_real(
        spark.createDataFrame([(1, base)], "media_id long, payload binary")
    ).collect()[0]
    assert dec["pixel_md5"] == base_dec["pixel_md5"]
    bad = spark.createDataFrame(
        [(1, tagged[:-7])], "media_id long, payload binary"
    )
    with pytest.raises(Exception, match="truncated PNG"):
        strip_metadata(bad, on_unsupported="null").collect()


def test_mp4_probe(spark):
    """ISO-BMFF probe: brand/duration/tracks/dims from the box walk
    (v0 and v1 mvhd, 64-bit largesize, deep nesting is iterative);
    non-BMFF is a capability limit; malformed boxes raise."""
    import struct

    import pytest

    from geist_spark.operators.multimodal import (
        _mp4_parse,
        mp4_build,
        mp4_probe,
    )

    m = mp4_build(b"isom", 1000, 2500,
                  [(b"vide", 640, 360), (b"soun", 0, 0)],
                  largesize_mdat=True)
    media = spark.createDataFrame(
        [(1, m), (2, b"RIFFxxxxAVI LIST")],
        "media_id long, payload binary",
    )
    out = {r["media_id"]: r for r in
           mp4_probe(media, on_unsupported="null").collect()}
    assert (out[1]["major_brand"], out[1]["duration_ms"],
            out[1]["n_tracks"], out[1]["width"], out[1]["height"],
            out[1]["has_video"], out[1]["has_audio"]) == (
        "isom", 2500, 2, 640, 360, True, True)
    assert out[2]["format"] is None

    # mvhd v1 (64-bit duration) parses too
    def box(t, body):
        return struct.pack(">I", len(body) + 8) + t + body

    ftyp = box(b"ftyp", b"mp42" + bytes(4) + b"isom")
    mvhd1 = box(
        b"mvhd",
        b"\x01" + bytes(3) + bytes(16)
        + struct.pack(">IQ", 90000, 90000 * 7) + bytes(80),
    )
    v1 = ftyp + box(b"moov", mvhd1)
    assert _mp4_parse(v1)["duration_ms"] == 7000

    # a crafted deeply-nested trak chain must not RecursionError
    deep = box(b"hdlr", bytes(8) + b"vide" + bytes(13))
    for _ in range(3000):
        deep = box(b"trak", deep)
    _mp4_parse(ftyp + box(b"moov", mvhd1 + deep))

    bad = spark.createDataFrame(
        [(1, m[:-5])], "media_id long, payload binary"
    )
    with pytest.raises(Exception, match="MP4"):
        mp4_probe(bad, on_unsupported="null").collect()


def test_id3_extract_and_strip(spark):
    """ID3v2.3/2.4 frame walk (all four text encodings decode to the
    same strings, syncsafe vs plain frame sizes, APIC flag); MP3
    strip cuts the leading tag and the trailing ID3v1 block; v2.2 is
    a typed capability limit; truncation raises."""
    import pytest

    from geist_spark.operators.multimodal import (
        id3_extract,
        id3v2_build,
        strip_metadata,
    )

    audio = b"\xff\xfb\x90\x00" + b"frames" * 10
    rows = []
    for i, (ver, enc) in enumerate(
        [(4, 3), (3, 0), (4, 1), (3, 2)], start=1
    ):
        tag = id3v2_build(
            "Tïtle", "Ärtist", "Albùm", "2024", version=ver,
            apic=(i == 1), encodings=(enc, enc, enc, enc),
        )
        rows.append((i, tag + audio + (b"TAG" + bytes(125) if i == 2 else b"")))
    rows.append((5, b"\xff\xfb no tag"))
    media = spark.createDataFrame(rows, "media_id long, payload binary")
    out = {r["media_id"]: r for r in
           id3_extract(media, on_unsupported="null").collect()}
    for i in range(1, 5):
        assert (out[i]["title"], out[i]["artist"], out[i]["album"],
                out[i]["date"]) == ("Tïtle", "Ärtist", "Albùm", "2024"), i
    assert out[1]["has_image"] is True and out[2]["has_image"] is False
    assert out[1]["version"] == 4 and out[2]["version"] == 3
    assert out[5]["format"] is None

    st = {r["media_id"]: r for r in
          strip_metadata(media, on_unsupported="keep").collect()}
    assert bytes(st[1]["payload"]) == audio
    assert bytes(st[2]["payload"]) == audio  # ID3v1 trailer cut too
    assert bytes(st[5]["payload"]) == b"\xff\xfb no tag"

    # ID3v2.2 parses for real since round 8 (3-byte ids, TT2/TP1/...)
    def v22frame(fid, text):
        body = b"\x00" + text.encode("latin-1")
        return fid + len(body).to_bytes(3, "big") + body

    frames22 = (v22frame(b"TT2", "Old") + v22frame(b"TYE", "1999")
                + b"PIC" + (4).to_bytes(3, "big") + b"\x00PNGx")
    ss = bytes([(len(frames22) >> s) & 0x7F for s in (21, 14, 7, 0)])
    v22 = spark.createDataFrame(
        [(1, b"ID3\x02\x00\x00" + ss + frames22)],
        "media_id long, payload binary",
    )
    r22 = id3_extract(v22, on_unsupported="null").collect()[0]
    assert (r22["version"], r22["title"], r22["date"],
            r22["has_image"]) == (2, "Old", "1999", True)
    # unsynchronized tags stay a typed capability limit
    unsync = spark.createDataFrame(
        [(1, b"ID3\x03\x00\x80" + ss + frames22)],
        "media_id long, payload binary",
    )
    assert id3_extract(unsync, on_unsupported="null").collect()[0][
        "format"] is None
    tag = id3v2_build("A", "B", "C", "2020")
    bad = spark.createDataFrame(
        [(1, tag[:-3])], "media_id long, payload binary"
    )
    with pytest.raises(Exception, match="truncated ID3"):
        id3_extract(bad, on_unsupported="null").collect()

    # v2.4 footer flag (0x10): tag occupies 10 + size + 10 bytes, so
    # strip must cut the trailing "3DI" footer too
    ftag = id3v2_build("F", "G", "H", "2021", version=4, footer=True)
    assert ftag[5] & 0x10 and ftag.endswith(b"3DI" + ftag[3:10])
    fmedia = spark.createDataFrame(
        [(1, ftag + audio)], "media_id long, payload binary"
    )
    frow = id3_extract(fmedia, on_unsupported="null").collect()[0]
    assert (frow["title"], frow["date"]) == ("F", "2021")
    fst = strip_metadata(fmedia, on_unsupported="keep").collect()[0]
    assert bytes(fst["payload"]) == audio  # no '3DI...' block left


def test_webp_and_flac_probes(spark):
    """WebP header probe (all three variants' bit layouts) and FLAC
    probe (STREAMINFO bit fields, Vorbis comments, picture flag)
    through the Spark surface; FLAC strip drops comment/picture/
    padding blocks, re-pins the last-block flag, and the result
    still probes identically; capability and malformed tiers hold."""
    import pytest

    from geist_spark.operators.multimodal import (
        flac_build,
        flac_probe,
        strip_metadata,
        webp_build,
        webp_probe,
    )

    wmedia = spark.createDataFrame(
        [(1, webp_build("lossy", 320, 240)),
         (2, webp_build("lossless", 100, 50, alpha=True)),
         (3, webp_build("extended", 1920, 1080, anim=True, exif=True)),
         (4, b"RIFFxxxxWAVEdata")],
        "media_id long, payload binary",
    )
    out = {r["media_id"]: r for r in
           webp_probe(wmedia, on_unsupported="null").collect()}
    assert (out[1]["variant"], out[1]["width"], out[1]["height"]) == (
        "lossy", 320, 240)
    assert out[2]["has_alpha"] is True and out[2]["width"] == 100
    assert (out[3]["variant"], out[3]["has_animation"],
            out[3]["has_exif"]) == ("extended", True, True)
    assert out[4]["format"] is None

    tagged = flac_build(
        44100, 2, 16, 44100 * 3,
        {"ARTIST": "Bänd", "TITLE": "Søng"}, picture=True, padding=64,
    )
    base = flac_build(44100, 2, 16, 44100 * 3)
    fmedia = spark.createDataFrame(
        [(1, tagged)], "media_id long, payload binary"
    )
    fo = flac_probe(fmedia).collect()[0]
    assert (fo["sample_rate"], fo["n_channels"], fo["bits_per_sample"],
            fo["duration_ms"], fo["artist"], fo["title"],
            fo["has_picture"]) == (44100, 2, 16, 3000, "Bänd", "Søng",
                                   True)
    st = strip_metadata(fmedia).collect()[0]
    assert bytes(st["payload"]) == base
    fo2 = flac_probe(
        spark.createDataFrame(
            [(1, st["payload"])], "media_id long, payload binary"
        )
    ).collect()[0]
    assert fo2["artist"] is None and fo2["duration_ms"] == 3000
    bad = spark.createDataFrame(
        [(1, tagged[:10])], "media_id long, payload binary"
    )
    with pytest.raises(Exception, match="truncated FLAC"):
        flac_probe(bad, on_unsupported="null").collect()


def test_audio_envelope_near_dup(spark):
    """Envelope fingerprints are invariant to envelope-preserving
    edits (per-frame sample reversal) but distinguish different
    envelopes; near-dup pairing finds exactly the planted twin;
    positional banding means hashes only collide at the same offset;
    short clips emit nothing; parameter guards raise."""
    import struct

    import numpy as np
    import pytest

    from geist_spark.operators.multimodal import (
        audio_envelope_fingerprint,
        audio_near_dup_pairs,
    )

    def wav(samples16):
        data = np.asarray(samples16, dtype="<i2").tobytes()
        return (
            b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
            + b"fmt "
            + struct.pack("<IHHIIHH", 16, 1, 1, 8000, 16000, 2, 16)
            + b"data" + struct.pack("<I", len(data)) + data
        )

    rng = np.random.default_rng(4)
    mod = rng.integers(1, 9, 16)
    base = (
        rng.integers(-300, 300, 4000).reshape(16, 250) * mod[:, None]
    ).reshape(-1)
    twin = base.reshape(16, 250)[:, ::-1].reshape(-1)
    other = (
        rng.integers(-300, 300, 4000).reshape(16, 250)
        * rng.integers(1, 9, 16)[:, None]
    ).reshape(-1)
    media = spark.createDataFrame(
        [(1, wav(base)), (2, wav(twin)), (3, wav(other)),
         (4, wav(base[:100])), (5, None)],
        "media_id long, payload binary",
    )
    fps = audio_envelope_fingerprint(media).collect()
    byid = {}
    for r in fps:
        byid.setdefault(r["media_id"], set()).add(
            (r["pos"], r["sh_hash"])
        )
    assert byid[1] == byid[2] and byid[1] != byid[3]
    assert 4 not in byid and 5 not in byid  # short clip / NULL
    pairs = [(r["clip_a"], r["clip_b"], r["shared_shingles"])
             for r in audio_near_dup_pairs(media).collect()]
    assert pairs == [(1, 2, 13)]
    with pytest.raises(ValueError, match="n_levels"):
        audio_envelope_fingerprint(media, n_levels=1)


def test_media_probe(spark):
    """Unified sniffing: every supported magic routes to the right
    (format, kind, dims/duration) from header bytes only; unknown
    magic is a capability limit; damaged headers of recognized
    formats raise."""
    import struct

    import pytest

    from geist_spark.operators.jpeg import jpeg_encode_baseline
    from geist_spark.operators.multimodal import (
        flac_build,
        gif_encode_rgb,
        media_probe,
        mp4_build,
        png_encode_rgb,
        tiff_encode_rgb,
        webp_build,
    )

    wav = (
        b"RIFF" + struct.pack("<I", 36 + 16) + b"WAVE"
        + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 2, 8000, 32000, 4, 16)
        + b"data" + struct.pack("<I", 16) + bytes(16)
    )
    rows = [
        (1, png_encode_rgb(5, 3, bytes(45))),
        (2, jpeg_encode_baseline(16, 8, gray=bytes(128))),
        (3, wav),
        (4, mp4_build(b"isom", 1000, 1500, [(b"vide", 320, 240)])),
        (5, webp_build("extended", 12, 34)),
        (6, flac_build(22050, 1, 16, 22050 * 2)),
        (7, gif_encode_rgb(2, 2, bytes(12))),
        (8, tiff_encode_rgb(3, 4, bytes(36))),
        (9, b"P5 7 9 255\n" + bytes(63)),
        (10, b"MThd\x00\x00\x00\x06 midi-ish"),  # unknown magic
        (11, None),
        (12, __import__(
            "geist_spark.operators.multimodal", fromlist=["ogg_build"]
        ).ogg_build("vorbis", 2, 44100, 44100 * 7)),
    ]
    media = spark.createDataFrame(rows, "media_id long, payload binary")
    out = {r["media_id"]: r for r in
           media_probe(media, on_unsupported="null").collect()}
    assert (out[1]["format"], out[1]["kind"], out[1]["width"],
            out[1]["height"]) == ("PNG", "image", 5, 3)
    assert (out[2]["format"], out[2]["width"], out[2]["height"]) == (
        "JPEG", 16, 8)
    assert (out[3]["format"], out[3]["kind"], out[3]["sample_rate"],
            out[3]["n_channels"], out[3]["duration_ms"]) == (
        "WAV", "audio", 8000, 2, 0)
    assert (out[4]["format"], out[4]["kind"], out[4]["width"],
            out[4]["duration_ms"]) == ("MP4", "video", 320, 1500)
    assert (out[5]["format"], out[5]["width"], out[5]["height"]) == (
        "WEBP", 12, 34)
    assert (out[6]["format"], out[6]["duration_ms"]) == ("FLAC", 2000)
    assert (out[7]["format"], out[7]["width"]) == ("GIF", 2)
    assert (out[8]["format"], out[8]["width"], out[8]["height"]) == (
        "TIFF", 3, 4)
    assert (out[9]["format"], out[9]["width"], out[9]["height"]) == (
        "P5", 7, 9)
    assert out[10]["format"] is None and out[11]["format"] is None
    assert (out[12]["format"], out[12]["kind"], out[12]["duration_ms"],
            out[12]["n_channels"]) == ("OGG", "audio", 7000, 2)
    bad = spark.createDataFrame(
        [(1, png_encode_rgb(5, 3, bytes(45))[:20])],
        "media_id long, payload binary",
    )
    with pytest.raises(Exception, match="PNG"):
        media_probe(bad, on_unsupported="null").collect()


def test_media_probe_mp3_duration(spark):
    """MP3 duration via the frame-header walk (round 8): CBR sums
    per-frame samples (ID3v2/ID3v1 wrapping skipped, bare-sync
    payloads accepted), Xing/Info and VBRI frame counts short-circuit
    the walk, free-format bitrate is a capability limit, and bad
    sync / truncated first frames are malformed."""
    import pytest

    from geist_spark.operators.multimodal import (
        id3v2_build,
        media_probe,
        mp3_build,
    )

    tag = id3v2_build("T", "A", "B", "2020")
    rows = [
        (1, mp3_build(10)),                              # bare CBR
        (2, mp3_build(7, id3_tag=tag, id3v1=True,        # wrapped CBR
                      stereo=False, bitrate_kbps=64,
                      sample_rate=32000)),
        (3, mp3_build(3, xing_frames=999)),              # Xing VBR
        (4, mp3_build(3, vbri_frames=500, stereo=False)),  # VBRI
    ]
    out = {r["media_id"]: r for r in
           media_probe(spark.createDataFrame(
               rows, "media_id long, payload binary")).collect()}
    assert (out[1]["format"], out[1]["kind"], out[1]["sample_rate"],
            out[1]["n_channels"], out[1]["duration_ms"]) == (
        "MP3", "audio", 44100, 2, 10 * 1152 * 1000 // 44100)
    assert (out[2]["sample_rate"], out[2]["n_channels"],
            out[2]["duration_ms"]) == (
        32000, 1, 7 * 1152 * 1000 // 32000)
    assert out[3]["duration_ms"] == 999 * 1152 * 1000 // 44100
    assert out[4]["duration_ms"] == 500 * 1152 * 1000 // 44100
    # free-format bitrate: capability tier
    free = bytearray(mp3_build(2))
    free[2] &= 0x0F
    caps = spark.createDataFrame(
        [(1, bytes(free))], "media_id long, payload binary"
    )
    with pytest.raises(Exception, match="free-format"):
        media_probe(caps).collect()
    row = media_probe(caps, on_unsupported="null").collect()[0]
    assert row["format"] is None
    # malformed: ID3 tag followed by no audio frame
    junk = spark.createDataFrame(
        [(1, tag + b"not audio at all")], "media_id long, payload binary"
    )
    with pytest.raises(Exception, match="no frame sync"):
        media_probe(junk, on_unsupported="null").collect()
    # truncated first frame
    trunc = spark.createDataFrame(
        [(1, mp3_build(1)[:50])], "media_id long, payload binary"
    )
    with pytest.raises(Exception, match="truncated MP3"):
        media_probe(trunc, on_unsupported="null").collect()


def test_ogg_probe(spark):
    """Vorbis and Opus ident parsing, duration from the final page's
    granule (Opus at the 48 kHz clock minus pre-skip), payload-
    embedded 'OggS' decoys skipped when locating the last page;
    foreign codecs-in-Ogg are capability limits; truncation
    raises."""
    import pytest

    from geist_spark.operators.multimodal import ogg_build, ogg_probe

    v = ogg_build("vorbis", 2, 44100, 44100 * 7)
    o = ogg_build("opus", 1, 16000, 48000 * 3 + 312, preskip=312)
    media = spark.createDataFrame(
        [(1, v), (2, o), (3, b"RIFFxxxxWAVE....")],
        "media_id long, payload binary",
    )
    out = {r["media_id"]: r for r in
           ogg_probe(media, on_unsupported="null").collect()}
    assert (out[1]["codec"], out[1]["n_channels"],
            out[1]["sample_rate"], out[1]["duration_ms"]) == (
        "vorbis", 2, 44100, 7000)
    assert (out[2]["codec"], out[2]["sample_rate"],
            out[2]["duration_ms"]) == ("opus", 16000, 3000)
    assert out[3]["format"] is None
    bad = spark.createDataFrame(
        [(1, v[:20])], "media_id long, payload binary"
    )
    with pytest.raises(Exception, match="Ogg"):
        ogg_probe(bad, on_unsupported="null").collect()


def test_decode_real_png_alpha_and_16bit(spark):
    """Round 8 PNG surface: RGBA / gray+alpha composite onto white
    with exact integer rounding, 16-bit reduces by high byte (tRNS
    color matching at full 16-bit precision FIRST), tRNS works in all
    three legal homes, and filters run at every bytes-per-pixel
    width. Expected pixels computed independently in the test."""
    import struct

    import numpy as np

    from geist_spark.operators.multimodal import decode_real, png_encode

    rng = np.random.RandomState(3)
    rgb = rng.randint(0, 256, 24, dtype=np.uint8).tobytes()
    grays = bytes(rgb[3 * i] for i in range(8))
    A = [255, 0, 128, 255, 0, 128, 255, 64]

    def comp(c, a):
        return (c * a + 255 * (255 - a) + 127) // 255

    rgba_raw = b"".join(
        bytes([rgb[3 * i], rgb[3 * i + 1], rgb[3 * i + 2], A[i]])
        for i in range(8)
    )
    ga_raw = b"".join(bytes([grays[i], A[i]]) for i in range(8))
    rgb16 = b"".join(bytes([v, v ^ 0xFF]) for v in rgb)
    rows = [
        (1, png_encode(4, 2, rgba_raw, ctype=6, filters=[2, 1])),
        (2, png_encode(4, 2, ga_raw, ctype=4, filters=[4, 2])),
        (3, png_encode(4, 2, rgb16, ctype=2, depth=16, filters=[1, 3])),
        (4, png_encode(4, 2, grays, ctype=0,
                       trns=struct.pack(">H", grays[0]))),
        (5, png_encode(4, 2, bytes(range(8)), ctype=3, palette=rgb,
                       trns=bytes(A))),
        # interlaced RGBA: Adam7 passes at bpp=4
        (6, png_encode(4, 2, rgba_raw, ctype=6, interlace=True)),
    ]
    out = {r["media_id"]: r for r in
           decode_real(spark.createDataFrame(
               rows, "media_id long, payload binary")).collect()}

    def luma(trips):
        s = sum(299 * trips[i] + 587 * trips[i + 1] + 114 * trips[i + 2]
                for i in range(0, 24, 3))
        return s // 8

    comp_trips = [comp(rgb[3 * i + c], A[i])
                  for i in range(8) for c in range(3)]
    assert out[1]["channels"] == 4
    assert out[1]["mean_luma_fx"] == luma(comp_trips)
    assert out[6]["mean_luma_fx"] == out[1]["mean_luma_fx"]
    assert out[5]["channels"] == 3
    assert out[5]["mean_luma_fx"] == luma(comp_trips)  # same alpha math
    ga_trips = [comp(grays[i], A[i]) for i in range(8) for _ in range(3)]
    assert out[2]["channels"] == 2
    assert out[2]["mean_luma_fx"] == luma(ga_trips)
    assert out[3]["channels"] == 3
    assert out[3]["mean_luma_fx"] == luma(list(rgb))  # high-byte exact
    g4 = [255 if g == grays[0] else g for g in grays]
    assert out[4]["channels"] == 1
    assert out[4]["mean_luma_fx"] == luma(
        [v for g in g4 for v in (g, g, g)]
    )


def test_decode_real_png_sub_byte_depths(spark):
    """Round 8: depths 1/2/4 decode for real — gray upscales exactly
    (255 divides by every sub-byte maxval), palette indexes pass
    through, rows unpack MSB-first with byte padding, filters and
    Adam7 interlace run on the PACKED bytes, and tRNS matches at the
    depth-significant bits."""
    import struct

    import numpy as np

    from geist_spark.operators.multimodal import decode_real, png_encode

    rng = np.random.RandomState(11)
    rows = []
    want = {}
    mid = 0
    for depth in (1, 2, 4):
        maxv = (1 << depth) - 1
        scale = 255 // maxv
        samp = rng.randint(0, maxv + 1, (3, 7), dtype=np.uint8)
        for kw in (dict(), dict(filters=[2, 1, 4]), dict(interlace=True)):
            mid += 1
            rows.append((mid, png_encode(7, 3, samp.tobytes(), ctype=0,
                                         depth=depth, **kw)))
            lum = [int(v) * scale for v in samp.reshape(-1)]
            want[mid] = 1000 * sum(lum) // len(lum)
    # palette 4-bit + tRNS alpha
    pal = bytes(rng.randint(0, 256, 16 * 3, dtype=np.uint8))
    idx = rng.randint(0, 16, (2, 5), dtype=np.uint8)
    A = [255] * 8 + [0, 128] + [255] * 6
    mid += 1
    rows.append((mid, png_encode(5, 2, idx.tobytes(), ctype=3, depth=4,
                                 palette=pal, trns=bytes(A))))

    def comp(c, a):
        return (c * a + 255 * (255 - a) + 127) // 255

    tr = [comp(pal[3 * int(v) + ch], A[int(v)])
          for v in idx.reshape(-1) for ch in range(3)]
    want[mid] = (sum(299 * tr[i] + 587 * tr[i + 1] + 114 * tr[i + 2]
                     for i in range(0, len(tr), 3)) // 10)
    # 1-bit gray + tRNS: sample value 1 transparent -> white
    mid += 1
    samp1 = np.array([[0, 1, 1, 0]], dtype=np.uint8)
    rows.append((mid, png_encode(4, 1, samp1.tobytes(), ctype=0, depth=1,
                                 trns=struct.pack(">H", 1))))
    g = [255 if v else 0 for v in samp1[0]]
    want[mid] = 1000 * sum(g) // 4

    out = {r["media_id"]: r for r in
           decode_real(spark.createDataFrame(
               rows, "media_id long, payload binary")).collect()}
    for k, v in want.items():
        assert out[k]["mean_luma_fx"] == v, k
    assert out[1]["channels"] == 1


def test_wav_wide_samples_and_float(spark):
    """Round 8 WAV surface: 24/32-bit PCM (exact hi/lo-decomposed
    mean-square past int64 territory), IEEE float32/float64 (samples
    = trunc(x * 2^15), exact for dyadic values), and
    WAVE_FORMAT_EXTENSIBLE unwrapping; non-finite float samples are
    malformed. Expected values computed independently with Python
    bigints."""
    import struct

    import numpy as np
    import pytest

    from geist_spark.operators.multimodal import decode_audio_real

    def wav(fmt, ch, rate, bits, data, ext=False):
        if ext:
            body = struct.pack("<HHIIHH", 0xFFFE, ch, rate,
                               rate * ch * bits // 8, ch * bits // 8, bits)
            body += struct.pack("<HHI", 22, bits, 1)
            body += struct.pack("<H", fmt) + b"\x00\x00" + bytes(12)
        else:
            body = struct.pack("<HHIIHH", fmt, ch, rate,
                               rate * ch * bits // 8, ch * bits // 8, bits)
        return (b"RIFF" + struct.pack("<I", 20 + len(body) + len(data))
                + b"WAVE" + b"fmt " + struct.pack("<I", len(body)) + body
                + b"data" + struct.pack("<I", len(data)) + data)

    rng = np.random.RandomState(6)
    v24 = rng.randint(-(1 << 23), 1 << 23, 10).astype(np.int64)
    d24 = b"".join(int(v & 0xFFFFFF).to_bytes(3, "little") for v in v24)
    v32 = rng.randint(-(1 << 31), 1 << 31, 9).astype(np.int64)
    d32 = b"".join(struct.pack("<i", int(v)) for v in v32)
    ks = rng.randint(-128, 128, 12)
    df32 = b"".join(struct.pack("<f", k / 256.0) for k in ks)
    fexp = [int(k) * 128 for k in ks]
    rows = [
        (1, wav(1, 1, 8000, 24, d24)),
        (2, wav(1, 3, 8000, 32, d32, ext=True)),  # extensible, 3 ch
        (3, wav(3, 1, 8000, 32, df32)),
        (4, wav(3, 1, 8000, 64,
                b"".join(struct.pack("<d", k / 256.0) for k in ks))),
    ]
    out = {r["media_id"]: r for r in
           decode_audio_real(spark.createDataFrame(
               rows, "media_id long, payload binary")).collect()}
    assert out[1]["bit_depth"] == 24
    assert out[1]["peak_abs"] == int(np.abs(v24).max())
    assert out[1]["mean_square_fx"] == sum(int(v) ** 2 for v in v24) // 10
    assert (out[2]["bit_depth"], out[2]["n_channels"],
            out[2]["n_frames"]) == (32, 3, 3)
    assert out[2]["mean_square_fx"] == sum(int(v) ** 2 for v in v32) // 9
    for mid, bits in ((3, 32), (4, 64)):
        assert out[mid]["bit_depth"] == bits
        assert out[mid]["peak_abs"] == max(abs(v) for v in fexp)
        assert out[mid]["mean_square_fx"] == (
            sum(v * v for v in fexp) // 12
        )
    nanwav = wav(3, 1, 8000, 32, struct.pack("<f", float("nan")) * 4)
    df = spark.createDataFrame([(1, nanwav)], "media_id long, payload binary")
    with pytest.raises(Exception, match="non-finite"):
        decode_audio_real(df, on_unsupported="null").collect()


def test_float_wav_out_of_range_is_typed(spark):
    """Finite-but-absurd float samples (e.g. 1e30) must raise a typed
    ValueError, not wrap in the int64 cast and silently overflow the
    hi/lo sum-of-squares decomposition."""
    import struct

    import pytest

    from geist_spark.operators.multimodal import decode_audio_real

    body = struct.pack("<HHIIHH", 3, 1, 8000, 8000 * 4, 4, 32)
    data = struct.pack("<f", 1e30) * 4
    wav = (b"RIFF" + struct.pack("<I", 20 + len(body) + len(data))
           + b"WAVE" + b"fmt " + struct.pack("<I", len(body)) + body
           + b"data" + struct.pack("<I", len(data)) + data)
    df = spark.createDataFrame([(1, wav)], "media_id long, payload binary")
    with pytest.raises(Exception, match="magnitude"):
        decode_audio_real(df, on_unsupported="null").collect()


def test_mkv_probe_and_media_dispatch(spark):
    from geist_spark.operators.multimodal import (
        media_probe,
        mkv_build,
        mkv_probe,
    )

    webm = mkv_build(
        "webm", duration_units=2500.0, timecode_scale=2_000_000,
        tracks=(("video", 1920, 1080), ("audio", 48000, 2)),
    )
    mka = mkv_build(
        "matroska", duration_units=7.0, timecode_scale=1_000_000_000,
        tracks=(("audio", 44100, 1),),
    )
    df = spark.createDataFrame(
        [(1, webm), (2, mka)], "media_id long, payload binary"
    )
    got = {r["media_id"]: r for r in mkv_probe(df).collect()}
    r = got[1]
    assert (r["doc_type"], r["duration_ms"], r["n_tracks"], r["width"],
            r["height"], r["has_video"]) == ("webm", 5000, 2, 1920,
                                             1080, True)
    assert got[2]["doc_type"] == "matroska"
    assert got[2]["duration_ms"] == 7000 and not got[2]["has_video"]

    # the media_probe front door routes EBML and names webm/mkv
    probed = {r["media_id"]: r for r in media_probe(df).collect()}
    assert probed[1]["format"] == "WEBM" and probed[1]["kind"] == "video"
    assert probed[2]["format"] == "MKV" and probed[2]["kind"] == "audio"

    # malformed EBML is typed; non-EBML stays a capability limit
    import pytest

    bad = spark.createDataFrame(
        [(9, webm[:15])], "media_id long, payload binary"
    )
    with pytest.raises(Exception, match="EBML"):
        mkv_probe(bad).collect()


def test_aiff_decode(spark):
    from geist_spark.operators.multimodal import (
        aiff_build,
        decode_audio_real,
    )

    pcm = [100, -200, 32767, -32768, 0, 7]
    rows = decode_audio_real(
        spark.createDataFrame(
            [
                (1, aiff_build(pcm, 2, 44100, 16)),
                (2, aiff_build(pcm, 2, 48000, 16, sowt=True)),
                (3, aiff_build([1 << 20, -(1 << 20)], 1, 11025, 24)),
            ],
            "media_id long, payload binary",
        )
    ).collect()
    got = {r["media_id"]: r for r in rows}
    for mid in (1, 2):
        r = got[mid]
        assert (r["format"], r["n_channels"], r["bit_depth"],
                r["n_frames"], r["peak_abs"]) == ("AIFF", 2, 16, 3,
                                                  32768)
    assert got[3]["peak_abs"] == 1 << 20 and got[3]["bit_depth"] == 24

    # malformed: COMM frame count beyond SSND; odd ext80 rates exact
    import pytest

    from geist_spark.operators.multimodal import _aiff_decode_samples

    blob = bytearray(aiff_build(pcm, 2, 44100, 16))
    at = bytes(blob).index(b"COMM") + 10
    blob[at:at + 2] = (999).to_bytes(2, "big")  # frames field hi bytes
    with pytest.raises(Exception):
        _aiff_decode_samples(bytes(blob))
    for rate in (8000, 11025, 22050, 96000):
        assert _aiff_decode_samples(
            aiff_build([0, 1], 1, rate, 16)
        )[2] == rate
