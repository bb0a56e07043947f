"""Micro-probe: per-byte-Python vs numpy-vectorized decoder inner
loops (round-7 rewrite of multimodal._dib_to_rgb / _luma_fx /
_nn_resize_rgb / the WAV sample parse). Prints us-per-megapixel (or
per megasample) for both implementations plus the speedup, and
asserts bit-identical output — the numbers land in SCALE.md
("Decoder vectorization").

Usage: python tools/decode_probe.py [width] [height]
"""

from __future__ import annotations

import hashlib
import os
import struct
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from geist_spark.operators.multimodal import (  # noqa: E402
    _dib_to_rgb,
    _luma_fx,
    _nn_resize_rgb,
    _wav_decode,
)


# -- the ROUND-6 per-byte implementations, kept verbatim as the probe
# baseline (deleted from the operator module) --------------------------

def _dib_to_rgb_py(data, off, w, h, top_down):
    stride = (w * 3 + 3) & ~3
    rows = []
    for r in range(h):
        src = r if top_down else h - 1 - r
        row = data[off + src * stride : off + src * stride + w * 3]
        rows.append(
            bytes(row[i + 2 - c] for i in range(0, w * 3, 3) for c in (0, 1, 2))
        )
    return b"".join(rows)


def _luma_fx_py(rgb):
    sr = sum(rgb[0::3])
    sg = sum(rgb[1::3])
    sb = sum(rgb[2::3])
    n = len(rgb) // 3
    return (299 * sr + 587 * sg + 114 * sb) // n if n else 0


def _nn_resize_rgb_py(rgb, w, h, out_w, out_h):
    cols = [(i * w // out_w) * 3 for i in range(out_w)]
    row_cache, rows = {}, []
    for j in range(out_h):
        sj = j * h // out_h
        row = row_cache.get(sj)
        if row is None:
            base = sj * w * 3
            row = b"".join(rgb[base + c : base + c + 3] for c in cols)
            row_cache[sj] = row
        rows.append(row)
    return b"".join(rows)


def _wav_samples_py(data, bits):
    bps = bits // 8
    n = len(data) // bps
    if bits == 8:
        samples = [v - 128 for v in data[: n * bps]]
    else:
        samples = [
            int.from_bytes(data[i : i + 2], "little", signed=True)
            for i in range(0, n * 2, 2)
        ]
    peak = max((abs(s) for s in samples), default=0)
    msq = sum(s * s for s in samples) // n if n else 0
    return peak, msq


def timeit(fn, reps=3):
    best = float("inf")
    out = None
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn()
        best = min(best, time.perf_counter() - t0)
    return best, out


def main() -> int:
    w = int(sys.argv[1]) if len(sys.argv) > 1 else 1600
    h = int(sys.argv[2]) if len(sys.argv) > 2 else 1200
    mp = w * h / 1e6
    seed = hashlib.md5(b"decode-probe").digest()
    stride = (w * 3 + 3) & ~3
    dib = (seed * (stride * h // len(seed) + 1))[: stride * h]
    print(f"image {w}x{h} ({mp:.1f} MP)")

    rows = []
    for name, new_fn, old_fn in [
        (
            "dib_to_rgb",
            lambda: _dib_to_rgb(dib, 0, w, h, False),
            lambda: _dib_to_rgb_py(dib, 0, w, h, False),
        ),
    ]:
        t_new, out_new = timeit(new_fn)
        t_old, out_old = timeit(old_fn)
        assert out_new == out_old, name
        rows.append((name, t_old, t_new, mp))
    rgb = _dib_to_rgb(dib, 0, w, h, False)
    for name, new_fn, old_fn, denom in [
        ("luma_fx", lambda: _luma_fx(rgb), lambda: _luma_fx_py(rgb), mp),
        (
            "nn_resize(/2)",
            lambda: _nn_resize_rgb(rgb, w, h, w // 2, h // 2),
            lambda: _nn_resize_rgb_py(rgb, w, h, w // 2, h // 2),
            mp,
        ),
    ]:
        t_new, out_new = timeit(new_fn)
        t_old, out_old = timeit(old_fn)
        assert out_new == out_old, name
        rows.append((name, t_old, t_new, denom))

    # WAV: 10M 16-bit samples
    n_samp = 10_000_000
    data = (seed * (2 * n_samp // len(seed) + 1))[: 2 * n_samp]
    wav = (
        b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
        + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, 8000, 16000, 2, 16)
        + b"data" + struct.pack("<I", len(data)) + data
    )
    t_new, out_new = timeit(lambda: _wav_decode(wav))
    t_old, out_old = timeit(lambda: _wav_samples_py(data, 16))
    assert (out_new[5], out_new[6]) == out_old
    rows.append(("wav_parse(10MS)", t_old, t_new, n_samp / 1e6))

    print(f"{'kernel':18s} {'old us/MP':>12s} {'new us/MP':>12s} {'speedup':>8s}")
    for name, t_old, t_new, denom in rows:
        print(
            f"{name:18s} {t_old / denom * 1e6:12.0f} "
            f"{t_new / denom * 1e6:12.0f} {t_old / t_new:7.1f}x"
        )

    # -- entropy-coded decoders (no fast twin to diff against: the
    # entropy stage is serial Python by nature; these numbers are the
    # SCALE.md "Measured decode throughput" table) ---------------------
    import numpy as np

    from geist_spark.operators.jpeg import jpeg_decode, jpeg_encode_baseline
    from geist_spark.operators.multimodal import _gif_decode, gif_encode_rgb

    rng = np.random.default_rng(1)
    side = 512
    emp = side * side / 1e6
    pal = rng.integers(0, 256, size=(256, 3), dtype=np.uint8)
    noise_rgb = pal[rng.integers(0, 256, size=side * side)].tobytes()
    smooth = np.repeat(
        np.repeat(
            rng.integers(0, 256, size=(side // 16, side // 16),
                         dtype=np.uint8), 16, 0), 16, 1)
    smooth_rgb = np.repeat(smooth.reshape(-1), 3).tobytes()
    gray_noise = rng.integers(0, 256, size=side * side, dtype=np.uint8)
    grad = (np.add.outer(np.arange(side), np.arange(side)) % 256
            ).astype(np.uint8)
    print(f"\nentropy decoders ({side}x{side}, {emp:.2f} MP, best-of-3):")
    for name, payload in [
        ("gif noise (worst)", gif_encode_rgb(side, side, noise_rgb)),
        ("gif smooth", gif_encode_rgb(side, side, smooth_rgb)),
        ("jpeg gray noise q=8",
         jpeg_encode_baseline(side, side, gray=gray_noise.tobytes(),
                              quant=8)),
        ("jpeg gray smooth q=16",
         jpeg_encode_baseline(side, side, gray=grad.tobytes(), quant=16)),
    ]:
        fn = _gif_decode if payload[:3] == b"GIF" else jpeg_decode
        t, _ = timeit(lambda: fn(payload))
        print(f"{name:22s} {t / emp * 1e6:12,.0f} us/MP "
              f"(payload {len(payload) / (side * side * 3):.3f}x raw)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
