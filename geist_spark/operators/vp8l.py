"""WebP VP8L (lossless) codec — decoder + paired fixture encoder.

WebP is a top-3 crawl image format and its lossless variant (VP8L) is
a self-contained entropy-coded bitstream implementable from the spec
with stdlib only — unlike lossy VP8, which needs a full DCT codec and
stays a typed capability limit. Spec followed: RFC 9649 (WebP) §3
"Specification for WebP Lossless Bitstream" (canonical prefix codes,
LZ77 backward references, color cache, and the four transforms:
predictor, color, subtract-green, color-indexing). No reference-engine
parity to cite: zpiroux/geist is a JSON-event engine with no media
surface; this extends the training-data multimodal family
(multimodal.decode_real dispatch).

Same paired-writer doctrine as jpeg.py / pdf.py: fixtures come from
`vp8l_encode` in this module (an INDEPENDENT implementation of the
bit-level format — real canonical Huffman construction, code-length
RLE, transforms, LZ77 emission), so a reader bug cannot cancel
against a writer bug, and the oracle gate never parses WebP at all.

Dialect notes (documented decisions an oracle can replay):
- the 120-entry LZ77 distance-to-neighbor table is GENERATED from its
  underlying rule — candidates (x in 1..8, y=0) + (x in -7..8,
  y in 1..7), sorted by (x^2+y^2, |x|, positive-x-first) — which
  reproduces the spec table's published prefix exactly and yields
  exactly 120 entries; a transcription typo class is thereby
  impossible,
- alpha composites over opaque white with the exact PNG-dialect
  rounding ((c*a + 255*(255-a) + 127) // 255) in webp_decode_rgb;
  channels reports 4 iff the header's alpha hint bit is set,
- Select (predictor 11) ties resolve to TOP (pL < pT picks left),
  matching both the RFC pseudo-code and libwebp's Sub3 form,
- ClampAddSubtractHalf uses C-style truncating division for
  (a - b) / 2, per the reference pseudo-code.

Two-tier errors: lossy VP8 and animation are NotImplementedError
(capability limits); structural damage (bad signature, oversubscribed
prefix code, reference before image start, truncated stream) raises
ValueError.
"""

from __future__ import annotations

VP8L_MAGIC = 0x2F
_CODE_LENGTH_ORDER = (
    17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15
)
_CACHE_MUL = 0x1E35A7BD
_ALPHABET_GREEN = 256 + 24  # + color-cache size at runtime


def _distance_map() -> list:
    """The spec's 120 close-neighbor offsets, generated from the rule
    (see module docstring). Entry i (0-based) serves dist_code i+1;
    pixel distance = x + y * xsize, clamped to >= 1."""
    cands = [(x, 0) for x in range(1, 9)]
    cands += [(x, y) for y in range(1, 8) for x in range(-7, 9)]
    cands.sort(key=lambda p: (p[0] * p[0] + p[1] * p[1],
                              abs(p[0]), 0 if p[0] >= 0 else 1))
    return cands


_DIST_MAP = _distance_map()
assert len(_DIST_MAP) == 120
# the spec table's opening entries — a generation-rule regression pin
assert _DIST_MAP[:12] == [
    (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0),
    (1, 2), (-1, 2), (2, 1), (-2, 1), (2, 2), (-2, 2),
]


class _BitReader:
    """LSB-first bit reader over little-endian bytes (the VP8L
    convention: the first bit of a byte is its least significant)."""

    __slots__ = ("b", "pos", "n")

    def __init__(self, b: bytes) -> None:
        self.b = b
        self.pos = 0
        self.n = len(b) * 8

    def read(self, nbits: int) -> int:
        if self.pos + nbits > self.n:
            raise ValueError("truncated VP8L: bitstream exhausted")
        v = 0
        p = self.pos
        for i in range(nbits):
            v |= ((self.b[(p + i) >> 3] >> ((p + i) & 7)) & 1) << i
        self.pos = p + nbits
        return v


class _BitWriter:
    __slots__ = ("out", "cur", "nbits")

    def __init__(self) -> None:
        self.out = bytearray()
        self.cur = 0
        self.nbits = 0

    def write(self, value: int, nbits: int) -> None:
        self.cur |= (value & ((1 << nbits) - 1)) << self.nbits
        self.nbits += nbits
        while self.nbits >= 8:
            self.out.append(self.cur & 0xFF)
            self.cur >>= 8
            self.nbits -= 8

    def bytes(self) -> bytes:
        if self.nbits:
            self.out.append(self.cur & 0xFF)
            self.cur, self.nbits = 0, 0
        return bytes(self.out)


# ---------------------------------------------------------------------------
# canonical prefix codes
# ---------------------------------------------------------------------------


class _Huffman:
    """Canonical prefix-code decoder: codes assigned per the DEFLATE
    convention (shorter lengths first, then symbol order), read
    MSB-first bit by bit. A single-symbol tree consumes 0 bits
    (the spec's simple-code degenerate case, also accepted for a
    normal code with one used symbol, as libwebp does)."""

    __slots__ = ("single", "table")

    @classmethod
    def from_table(cls, table: dict, single: int | None = None):
        self = cls.__new__(cls)
        self.single = single
        self.table = table if single is None else None
        return self

    def __init__(self, lengths: list) -> None:
        used = [(ln, sym) for sym, ln in enumerate(lengths) if ln > 0]
        if not used:
            raise ValueError("malformed VP8L: empty prefix code")
        if len(used) == 1:
            self.single = used[0][1]
            self.table = None
            return
        self.single = None
        max_len = max(ln for ln, _ in used)
        bl_count = [0] * (max_len + 1)
        for ln, _ in used:
            bl_count[ln] += 1
        # completeness (Kraft equality) — over/undersubscribed codes
        # are structural damage
        kraft = sum(bl_count[ln] << (max_len - ln)
                    for ln in range(1, max_len + 1))
        if kraft != (1 << max_len):
            raise ValueError(
                "malformed VP8L: prefix code is not complete"
            )
        next_code = [0] * (max_len + 1)
        code = 0
        for ln in range(1, max_len + 1):
            code = (code + bl_count[ln - 1]) << 1
            next_code[ln] = code
        table = {}
        for sym, ln in enumerate(lengths):
            if ln > 0:
                table[(ln, next_code[ln])] = sym
                next_code[ln] += 1
        self.table = table

    def decode(self, br: _BitReader) -> int:
        if self.single is not None:
            return self.single
        code = 0
        for ln in range(1, 16):
            code = (code << 1) | br.read(1)
            sym = self.table.get((ln, code))
            if sym is not None:
                return sym
        raise ValueError("malformed VP8L: prefix code overrun")


def _canonical_codes(lengths: list) -> dict:
    """symbol -> (code, length) for the encoder, same convention."""
    max_len = max(lengths) if lengths else 0
    bl_count = [0] * (max_len + 1)
    for ln in lengths:
        if ln:
            bl_count[ln] += 1
    next_code = [0] * (max_len + 1)
    code = 0
    for ln in range(1, max_len + 1):
        code = (code + bl_count[ln - 1]) << 1
        next_code[ln] = code
    out = {}
    for sym, ln in enumerate(lengths):
        if ln:
            out[sym] = (next_code[ln], ln)
            next_code[ln] += 1
    return out


def _huffman_lengths(freqs: dict, max_len: int = 15) -> list:
    """Code lengths from symbol frequencies (heap Huffman), flattened
    to max_len by the simple rebalance (iteratively shorten the
    deepest by promoting); alphabet size = max symbol + 1."""
    import heapq
    import itertools

    if not freqs:
        raise ValueError("empty alphabet")
    n = max(freqs) + 1
    used = sorted(freqs)
    if len(used) == 1:
        out = [0] * n
        out[used[0]] = 1
        return out
    counter = itertools.count()
    heap = [(f, next(counter), sym) for sym, f in freqs.items()]
    heapq.heapify(heap)
    parent: dict = {}
    while len(heap) > 1:
        f1, _, a = heapq.heappop(heap)
        f2, _, b = heapq.heappop(heap)
        node = ("n", next(counter))
        parent[a] = node
        parent[b] = node
        heapq.heappush(heap, (f1 + f2, next(counter), node))
    lengths = [0] * n
    for sym in used:
        d = 0
        x = sym
        while x in parent:
            x = parent[x]
            d += 1
        lengths[sym] = d
    if max(lengths) > max_len:
        # degenerate-depth fallback: uniform-ish lengths still form a
        # canonical complete code (fixture images are tiny; this path
        # is for safety, not optimality)
        import math

        k = math.ceil(math.log2(len(used)))
        lengths = [0] * n
        # complete code over len(used) symbols: give 2^k - len(used)
        # symbols length k-1, the rest length k
        short = (1 << k) - len(used)
        for i, sym in enumerate(used):
            lengths[sym] = (k - 1) if i < short and k > 1 else k
    return lengths


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------


def _read_code_lengths(br: _BitReader, alphabet: int) -> list:
    """The normal prefix-code path: a 3-bit-coded code-length code in
    _CODE_LENGTH_ORDER, optional max_symbol trimming, then RLE-coded
    symbol lengths (16 = repeat previous nonzero, 17/18 = zero
    runs)."""
    n_codes = br.read(4) + 4
    if n_codes > 19:
        raise ValueError("malformed VP8L: >19 code-length codes")
    cl_lengths = [0] * 19
    for i in range(n_codes):
        cl_lengths[_CODE_LENGTH_ORDER[i]] = br.read(3)
    cl = _Huffman(cl_lengths)
    if br.read(1):  # use max_symbol trimming
        length_nbits = 2 + 2 * br.read(3)
        max_symbol = 2 + br.read(length_nbits)
        if max_symbol > alphabet:
            raise ValueError("malformed VP8L: max_symbol > alphabet")
    else:
        max_symbol = alphabet
    lengths = [0] * alphabet
    prev = 8
    i = 0
    while i < alphabet:
        if max_symbol == 0:
            break
        max_symbol -= 1
        s = cl.decode(br)
        if s < 16:
            lengths[i] = s
            i += 1
            if s:
                prev = s
        elif s == 16:
            rep = 3 + br.read(2)
            if i + rep > alphabet:
                raise ValueError("malformed VP8L: RLE past alphabet")
            for _ in range(rep):
                lengths[i] = prev
                i += 1
        else:
            rep = (3 + br.read(3)) if s == 17 else (11 + br.read(7))
            if i + rep > alphabet:
                raise ValueError("malformed VP8L: RLE past alphabet")
            i += rep
    return lengths


def _read_prefix_code(br: _BitReader, alphabet: int) -> _Huffman:
    if br.read(1):  # simple
        n_syms = br.read(1) + 1
        if br.read(1):
            sym0 = br.read(8)
        else:
            sym0 = br.read(1)
        if sym0 >= alphabet:
            raise ValueError("malformed VP8L: simple symbol range")
        if n_syms == 2:
            sym1 = br.read(8)
            if sym1 >= alphabet:
                raise ValueError("malformed VP8L: simple symbol range")
            # code 0 -> the FIRST symbol as read (not canonical-order):
            # the spec's simple code is positional
            return _Huffman.from_table(
                {(1, 0): sym0, (1, 1): sym1}
            )
        return _Huffman.from_table({}, single=sym0)
    return _Huffman(_read_code_lengths(br, alphabet))


def _lz77_value(br: _BitReader, code: int) -> int:
    """Length/distance prefix decoding (spec 'LZ77 prefix coding')."""
    if code < 4:
        return code + 1
    extra = (code - 2) >> 1
    offset = (2 + (code & 1)) << extra
    return offset + br.read(extra) + 1


def _div_round_up(a: int, b: int) -> int:
    return (a + b - 1) // b


def _decode_image_stream(
    br: _BitReader, w: int, h: int, level0: bool, limit_px: int
):
    """One VP8L image stream: (optional transforms if level0) ->
    optional color cache -> (optional meta prefix image if level0) ->
    prefix-coded LZ77 pixel data. Returns (pixels, transforms) where
    pixels is a list of (a, r, g, b) in raster order of the CODED
    (possibly palette-packed) image and transforms the reverse-order
    application list."""
    transforms = []
    seen = set()
    xsize = w
    if level0:
        while br.read(1):
            ttype = br.read(2)
            if ttype in seen:
                raise ValueError(
                    "malformed VP8L: duplicate transform"
                )
            seen.add(ttype)
            if ttype == 0 or ttype == 1:  # predictor / color
                size_bits = br.read(3) + 2
                tw = _div_round_up(xsize, 1 << size_bits)
                th = _div_round_up(h, 1 << size_bits)
                tiles, _ = _decode_image_stream(
                    br, tw, th, False, limit_px
                )
                transforms.append((ttype, size_bits, tiles, xsize))
            elif ttype == 2:  # subtract green
                transforms.append((2, None, None, xsize))
            else:  # 3: color indexing
                pal_size = br.read(8) + 1
                pal_px, _ = _decode_image_stream(
                    br, pal_size, 1, False, limit_px
                )
                palette = []
                prev = (0, 0, 0, 0)
                for p in pal_px:
                    cur = tuple((p[i] + prev[i]) & 0xFF
                                for i in range(4))
                    palette.append(cur)
                    prev = cur
                if pal_size <= 2:
                    width_bits = 3
                elif pal_size <= 4:
                    width_bits = 2
                elif pal_size <= 16:
                    width_bits = 1
                else:
                    width_bits = 0
                transforms.append(
                    (3, width_bits, palette, xsize)
                )
                xsize = _div_round_up(xsize, 1 << width_bits)
    cache_bits = 0
    if br.read(1):
        cache_bits = br.read(4)
        if not 1 <= cache_bits <= 11:
            raise ValueError("malformed VP8L: color-cache bits")
    cache_size = (1 << cache_bits) if cache_bits else 0
    meta = None
    meta_bits = 0
    n_groups = 1
    if level0 and br.read(1):
        meta_bits = br.read(3) + 2
        mw = _div_round_up(xsize, 1 << meta_bits)
        mh = _div_round_up(h, 1 << meta_bits)
        meta_px, _ = _decode_image_stream(br, mw, mh, False, limit_px)
        meta = [((p[1] << 8) | p[2]) for p in meta_px]
        n_groups = max(meta) + 1
        if n_groups > 65536:
            raise ValueError("malformed VP8L: meta code range")
        meta_w = mw
    alpha_green = 256 + 24 + cache_size
    groups = []
    for _ in range(n_groups):
        groups.append((
            _read_prefix_code(br, alpha_green),
            _read_prefix_code(br, 256),   # red
            _read_prefix_code(br, 256),   # blue
            _read_prefix_code(br, 256),   # alpha
            _read_prefix_code(br, 40),    # distance
        ))
    n_px = xsize * h
    if n_px > limit_px:
        raise ValueError("VP8L image exceeds max pixels")
    cache = [(0, 0, 0, 0)] * cache_size
    shift = 32 - cache_bits if cache_bits else 0

    def cache_insert(px):
        if cache_bits:
            argb = (px[0] << 24) | (px[1] << 16) | (px[2] << 8) | px[3]
            cache[(_CACHE_MUL * argb & 0xFFFFFFFF) >> shift] = px

    pixels = []
    g_tree = r_tree = b_tree = a_tree = d_tree = None
    cur_group = -1
    while len(pixels) < n_px:
        if meta is not None:
            x = len(pixels) % xsize
            y = len(pixels) // xsize
            gi = meta[(y >> meta_bits) * meta_w + (x >> meta_bits)]
        else:
            gi = 0
        if gi != cur_group:
            g_tree, r_tree, b_tree, a_tree, d_tree = groups[gi]
            cur_group = gi
        s = g_tree.decode(br)
        if s < 256:
            g = s
            r = r_tree.decode(br)
            b = b_tree.decode(br)
            a = a_tree.decode(br)
            px = (a, r, g, b)
            pixels.append(px)
            cache_insert(px)
        elif s < 256 + 24:
            length = _lz77_value(br, s - 256)
            dcode = _lz77_value(br, d_tree.decode(br))
            if dcode <= 120:
                dx, dy = _DIST_MAP[dcode - 1]
                dist = dx + dy * xsize
                if dist < 1:
                    dist = 1
            else:
                dist = dcode - 120
            if dist > len(pixels):
                raise ValueError(
                    "malformed VP8L: reference before image start"
                )
            if len(pixels) + length > n_px:
                raise ValueError(
                    "malformed VP8L: copy past image end"
                )
            base = len(pixels) - dist
            for k in range(length):
                px = pixels[base + k]
                pixels.append(px)
                cache_insert(px)
        else:
            idx = s - 256 - 24
            if idx >= cache_size:
                raise ValueError(
                    "malformed VP8L: color-cache index range"
                )
            pixels.append(cache[idx])
    return pixels, transforms


def _avg2(a: int, b: int) -> int:
    return (a + b) >> 1


def _clamp255(v: int) -> int:
    return 0 if v < 0 else (255 if v > 255 else v)


def _apply_inverse_transforms(
    pixels: list, w: int, h: int, transforms: list
) -> list:
    """Apply inverse transforms in reverse order of their appearance
    in the stream (the spec rule). `pixels` is the CODED image
    (palette-packed width when color-indexing was present)."""
    for ttype, p1, p2, orig_w in reversed(transforms):
        if ttype == 3:  # color indexing
            width_bits, palette = p1, p2
            if width_bits:
                per = 1 << width_bits   # indexes per packed pixel
                ibits = 8 >> width_bits  # bits per index
                packed_w = _div_round_up(orig_w, per)
                out = []
                for y in range(h):
                    row = pixels[y * packed_w:(y + 1) * packed_w]
                    cnt = 0
                    for px in row:
                        g = px[2]
                        for k in range(per):
                            if cnt >= orig_w:
                                break
                            idx = (g >> (k * ibits)) & ((1 << ibits) - 1)
                            if idx >= len(palette):
                                raise ValueError(
                                    "malformed VP8L: palette index"
                                )
                            out.append(palette[idx])
                            cnt += 1
                pixels = out
            else:
                out = []
                for px in pixels:
                    idx = px[2]
                    if idx >= len(palette):
                        raise ValueError(
                            "malformed VP8L: palette index"
                        )
                    out.append(palette[idx])
                pixels = out
        elif ttype == 2:  # subtract green
            pixels = [
                (a, (r + g) & 0xFF, g, (b + g) & 0xFF)
                for a, r, g, b in pixels
            ]
        elif ttype == 1:  # color transform (inverse)
            size_bits, tiles = p1, p2
            tw = _div_round_up(orig_w, 1 << size_bits)
            out = []
            for i, (a, r, g, b) in enumerate(pixels):
                x, y = i % orig_w, i // orig_w
                t = tiles[(y >> size_bits) * tw + (x >> size_bits)]
                g2r = t[3] - 256 if t[3] >= 128 else t[3]  # blue ch
                g2b = t[2] - 256 if t[2] >= 128 else t[2]  # green ch
                r2b = t[1] - 256 if t[1] >= 128 else t[1]  # red ch
                gs = g - 256 if g >= 128 else g
                r = (r + ((g2r * gs) >> 5)) & 0xFF
                rs = r - 256 if r >= 128 else r
                b = (b + ((g2b * gs) >> 5) + ((r2b * rs) >> 5)) & 0xFF
                out.append((a, r, g, b))
            pixels = out
        else:  # 0: predictor (inverse, sequential)
            size_bits, tiles = p1, p2
            tw = _div_round_up(orig_w, 1 << size_bits)
            out = []
            for i, res in enumerate(pixels):
                x, y = i % orig_w, i // orig_w
                if x == 0 and y == 0:
                    pred = (255, 0, 0, 0)
                elif y == 0:
                    pred = out[i - 1]  # left
                elif x == 0:
                    pred = out[i - orig_w]  # top
                else:
                    mode = tiles[
                        (y >> size_bits) * tw + (x >> size_bits)
                    ][2]
                    left = out[i - 1]
                    top = out[i - orig_w]
                    tl = out[i - orig_w - 1]
                    # TR is scan-order position i - w + 1: for the
                    # last column that wraps to the CURRENT row's
                    # first pixel (already decoded) — the in-place
                    # contiguous-buffer rule real decoders follow
                    tr = out[i - orig_w + 1]
                    if mode == 0:
                        pred = (255, 0, 0, 0)
                    elif mode == 1:
                        pred = left
                    elif mode == 2:
                        pred = top
                    elif mode == 3:
                        pred = tr
                    elif mode == 4:
                        pred = tl
                    elif mode == 5:
                        pred = tuple(
                            _avg2(_avg2(left[c], tr[c]), top[c])
                            for c in range(4)
                        )
                    elif mode == 6:
                        pred = tuple(
                            _avg2(left[c], tl[c]) for c in range(4)
                        )
                    elif mode == 7:
                        pred = tuple(
                            _avg2(left[c], top[c]) for c in range(4)
                        )
                    elif mode == 8:
                        pred = tuple(
                            _avg2(tl[c], top[c]) for c in range(4)
                        )
                    elif mode == 9:
                        pred = tuple(
                            _avg2(top[c], tr[c]) for c in range(4)
                        )
                    elif mode == 10:
                        pred = tuple(
                            _avg2(_avg2(left[c], tl[c]),
                                  _avg2(top[c], tr[c]))
                            for c in range(4)
                        )
                    elif mode == 11:
                        pL = sum(abs(top[c] - tl[c]) for c in range(4))
                        pT = sum(abs(left[c] - tl[c]) for c in range(4))
                        pred = left if pL < pT else top
                    elif mode == 12:
                        pred = tuple(
                            _clamp255(left[c] + top[c] - tl[c])
                            for c in range(4)
                        )
                    elif mode == 13:
                        def _half(c):
                            av = _avg2(left[c], top[c])
                            d = av - tl[c]
                            # C truncating division
                            half = d // 2 if d >= 0 else -((-d) // 2)
                            return _clamp255(av + half)
                        pred = tuple(_half(c) for c in range(4))
                    else:
                        raise ValueError(
                            "malformed VP8L: predictor mode "
                            f"{mode} out of range"
                        )
                out.append(tuple(
                    (res[c] + pred[c]) & 0xFF for c in range(4)
                ))
            pixels = out
    return pixels


def vp8l_decode(data: bytes, max_pixels: int = 1 << 24):
    """Decode a VP8L chunk payload -> (w, h, alpha_hint,
    pixels as list of (a, r, g, b) in raster order)."""
    if not data or data[0] != VP8L_MAGIC:
        raise ValueError("malformed VP8L: bad signature byte")
    br = _BitReader(data)
    br.read(8)
    w = br.read(14) + 1
    h = br.read(14) + 1
    alpha_hint = br.read(1)
    version = br.read(3)
    if version != 0:
        raise NotImplementedError(
            f"VP8L version {version} unsupported"
        )
    if w * h > max_pixels:
        raise ValueError("VP8L image exceeds max pixels")
    pixels, transforms = _decode_image_stream(br, w, h, True, max_pixels)
    pixels = _apply_inverse_transforms(pixels, w, h, transforms)
    if len(pixels) != w * h:
        raise ValueError("malformed VP8L: pixel count mismatch")
    return w, h, bool(alpha_hint), pixels


def webp_decode_rgb(b: bytes):
    """WebP container -> ('WEBP', w, h, channels, rgb bytes): walks
    RIFF chunks, decodes the VP8L payload (plain or inside VP8X),
    composites alpha over white with the PNG-dialect rounding.
    Lossy VP8 and animation are capability limits."""
    import struct

    if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"WEBP":
        raise ValueError("not a WEBP payload")
    pos = 12
    while pos + 8 <= len(b):
        cid = b[pos:pos + 4]
        (clen,) = struct.unpack_from("<I", b, pos + 4)
        body = b[pos + 8: pos + 8 + clen]
        if len(body) < clen:
            raise ValueError("truncated WEBP chunk")
        if cid == b"VP8L":
            w, h, alpha_hint, px = vp8l_decode(bytes(body))
            out = bytearray(w * h * 3)
            for i, (a, r, g, bl) in enumerate(px):
                if a != 255:
                    r = (r * a + 255 * (255 - a) + 127) // 255
                    g = (g * a + 255 * (255 - a) + 127) // 255
                    bl = (bl * a + 255 * (255 - a) + 127) // 255
                out[3 * i] = r
                out[3 * i + 1] = g
                out[3 * i + 2] = bl
            return ("WEBP", w, h, 4 if alpha_hint else 3, bytes(out))
        if cid == b"VP8 ":
            raise NotImplementedError(
                "lossy VP8 WebP unsupported (needs a full DCT "
                "codec) — VP8L lossless only"
            )
        if cid == b"ANIM" or cid == b"ANMF":
            raise NotImplementedError("animated WebP unsupported")
        pos += 8 + clen + (clen & 1)
    raise ValueError("malformed WEBP: no VP8L chunk")


# ---------------------------------------------------------------------------
# encoder (paired fixture writer — independent bit-level implementation)
# ---------------------------------------------------------------------------


def _write_code_lengths(bw: _BitWriter, lengths: list) -> None:
    """Emit a normal prefix code: all 19 code-length-code slots, no
    max_symbol trimming, symbol lengths RLE-compressed with 16
    (repeat previous nonzero) and 17/18 (zero runs) — deliberately
    exercising every decoder branch."""
    tokens = []  # (cl_symbol, extra_bits_value, extra_bits_n)
    i = 0
    n = len(lengths)
    prev = None
    while i < n:
        ln = lengths[i]
        run = 1
        while i + run < n and lengths[i + run] == ln:
            run += 1
        if ln == 0:
            left = run
            while left >= 11:
                rep = min(left, 138)
                tokens.append((18, rep - 11, 7))
                left -= rep
            while left >= 3:
                rep = min(left, 10)
                tokens.append((17, rep - 3, 3))
                left -= rep
            for _ in range(left):
                tokens.append((0, 0, 0))
        else:
            start = 0
            if ln != prev:
                tokens.append((ln, 0, 0))
                start = 1
                prev = ln
            left = run - start
            while left >= 3:
                rep = min(left, 6)
                tokens.append((16, rep - 3, 2))
                left -= rep
            for _ in range(left):
                tokens.append((ln, 0, 0))
        if ln:
            prev = ln
        i += run
    freqs: dict = {}
    for s, _, _ in tokens:
        freqs[s] = freqs.get(s, 0) + 1
    cl_lengths_sparse = _huffman_lengths(freqs, max_len=7)
    cl_lengths = [0] * 19
    for s, ln in enumerate(cl_lengths_sparse):
        cl_lengths[s] = ln
    codes = _canonical_codes(cl_lengths)
    bw.write(0, 1)          # not simple
    bw.write(19 - 4, 4)     # all 19 slots
    for s in _CODE_LENGTH_ORDER:
        bw.write(cl_lengths[s], 3)
    bw.write(0, 1)          # no max_symbol trimming
    for s, extra, nbits in tokens:
        code, ln = codes[s]
        # MSB-first emission of the canonical code
        for k in range(ln - 1, -1, -1):
            bw.write((code >> k) & 1, 1)
        if nbits:
            bw.write(extra, nbits)


def _write_prefix_code(
    bw: _BitWriter, freqs: dict, alphabet: int
) -> dict:
    """Write a prefix code for `freqs`, returning symbol ->
    (code, length) for payload emission. <=2 used symbols take the
    simple path; otherwise the normal (code-length-coded) path."""
    used = sorted(freqs)
    if not used:
        used = [0]
        freqs = {0: 1}
    # the simple path carries at most two symbols of <= 8 bits —
    # length/cache symbols (>= 256) must take the normal path
    if len(used) <= 2 and used[-1] <= 255:
        bw.write(1, 1)  # simple
        bw.write(len(used) - 1, 1)
        if used[0] > 1:
            bw.write(1, 1)
            bw.write(used[0], 8)
        else:
            bw.write(0, 1)
            bw.write(used[0], 1)
        if len(used) == 2:
            bw.write(used[1], 8)
            return {used[0]: (0, 1), used[1]: (1, 1)}
        return {used[0]: (0, 0)}
    lengths_sparse = _huffman_lengths(freqs)
    lengths = [0] * alphabet
    for s, ln in enumerate(lengths_sparse):
        lengths[s] = ln
    _write_code_lengths(bw, lengths)
    if len(used) == 1:
        # a single-symbol tree consumes ZERO bits at decode time —
        # emit none (the lengths table still declares it)
        return {used[0]: (0, 0)}
    return _canonical_codes(lengths)


def _emit_sym(bw: _BitWriter, codes: dict, sym: int) -> None:
    code, ln = codes[sym]
    for k in range(ln - 1, -1, -1):
        bw.write((code >> k) & 1, 1)


def _lz77_tokenize(value: int):
    """value -> (prefix_code, extra_value, extra_bits), inverse of
    _lz77_value."""
    if value <= 4:
        return value - 1, 0, 0
    v = value - 1
    nbits = v.bit_length() - 2
    rest = v - (1 << (nbits + 1))
    if rest >= (1 << nbits):
        code = 2 * nbits + 3
        extra = rest - (1 << nbits)
    else:
        code = 2 * nbits + 2
        extra = rest
    return code, extra, nbits


def _emit_image_stream(
    bw: _BitWriter,
    pixels: list,
    xsize: int,
    use_lz77: bool,
    cache_bits: int,
) -> None:
    """Tokenize + entropy-code one image stream's pixel data (after
    any transforms were applied encoder-side): optional color cache,
    single prefix-code group, greedy vertical/horizontal LZ77 when
    enabled (dist_code 1 = pixel above, 2 = pixel left — the
    distance-map head — plus raw distances for longer runs)."""
    bw.write(1 if cache_bits else 0, 1)
    if cache_bits:
        bw.write(cache_bits, 4)
    cache_size = (1 << cache_bits) if cache_bits else 0
    cache = [None] * cache_size
    shift = 32 - cache_bits if cache_bits else 0
    tokens = []
    n = len(pixels)
    i = 0
    while i < n:
        px = pixels[i]
        if use_lz77 and i >= xsize:
            # vertical run (distance = xsize -> dist_code 1)
            run = 0
            while (i + run < n and run < 4096
                   and pixels[i + run] == pixels[i + run - xsize]):
                run += 1
            if run >= 3:
                tokens.append(("copy", run, 1))
                for k in range(i, i + run):
                    if cache_bits:
                        argb = (pixels[k][0] << 24) | (
                            pixels[k][1] << 16
                        ) | (pixels[k][2] << 8) | pixels[k][3]
                        cache[
                            (_CACHE_MUL * argb & 0xFFFFFFFF) >> shift
                        ] = pixels[k]
                i += run
                continue
        if use_lz77 and i >= 1:
            run = 0
            while (i + run < n and run < 4096
                   and pixels[i + run] == pixels[i + run - 1]):
                run += 1
            if run >= 3:
                tokens.append(("copy", run, 2))
                for k in range(i, i + run):
                    if cache_bits:
                        argb = (pixels[k][0] << 24) | (
                            pixels[k][1] << 16
                        ) | (pixels[k][2] << 8) | pixels[k][3]
                        cache[
                            (_CACHE_MUL * argb & 0xFFFFFFFF) >> shift
                        ] = pixels[k]
                i += run
                continue
        if cache_bits:
            argb = (px[0] << 24) | (px[1] << 16) | (px[2] << 8) | px[3]
            slot = (_CACHE_MUL * argb & 0xFFFFFFFF) >> shift
            if cache[slot] == px:
                tokens.append(("cache", slot, None))
                i += 1
                continue
            cache[slot] = px
        tokens.append(("lit", px, None))
        i += 1
    g_freq: dict = {}
    r_freq: dict = {}
    b_freq: dict = {}
    a_freq: dict = {}
    d_freq: dict = {}
    for kind, v, d in tokens:
        if kind == "lit":
            g_freq[v[2]] = g_freq.get(v[2], 0) + 1
            r_freq[v[1]] = r_freq.get(v[1], 0) + 1
            b_freq[v[3]] = b_freq.get(v[3], 0) + 1
            a_freq[v[0]] = a_freq.get(v[0], 0) + 1
        elif kind == "copy":
            lcode, _, _ = _lz77_tokenize(v)
            g_freq[256 + lcode] = g_freq.get(256 + lcode, 0) + 1
            dcode, _, _ = _lz77_tokenize(d)
            d_freq[dcode] = d_freq.get(dcode, 0) + 1
        else:
            sym = 256 + 24 + v
            g_freq[sym] = g_freq.get(sym, 0) + 1
    if not r_freq:
        r_freq = {0: 1}
    if not b_freq:
        b_freq = {0: 1}
    if not a_freq:
        a_freq = {255: 1}
    if not d_freq:
        d_freq = {0: 1}
    bw.write(0, 1)  # no meta prefix image (a level-0-only field;
    # subsidiary streams go through _emit_substream, which skips it)
    g_codes = _write_prefix_code(bw, g_freq, 256 + 24 + cache_size)
    r_codes = _write_prefix_code(bw, r_freq, 256)
    b_codes = _write_prefix_code(bw, b_freq, 256)
    a_codes = _write_prefix_code(bw, a_freq, 256)
    d_codes = _write_prefix_code(bw, d_freq, 40)
    for kind, v, d in tokens:
        if kind == "lit":
            _emit_sym(bw, g_codes, v[2])
            _emit_sym(bw, r_codes, v[1])
            _emit_sym(bw, b_codes, v[3])
            _emit_sym(bw, a_codes, v[0])
        elif kind == "copy":
            lcode, lextra, lbits = _lz77_tokenize(v)
            _emit_sym(bw, g_codes, 256 + lcode)
            if lbits:
                bw.write(lextra, lbits)
            dcode, dextra, dbits = _lz77_tokenize(d)
            _emit_sym(bw, d_codes, dcode)
            if dbits:
                bw.write(dextra, dbits)
        else:
            _emit_sym(bw, g_codes, 256 + 24 + v)


def _emit_substream(bw: _BitWriter, pixels: list, xsize: int) -> None:
    """A subsidiary image stream (palette / predictor tiles): no
    transforms field, optional cache (off), no meta bit — the
    level0-only fields are absent per spec."""
    bw.write(0, 1)  # no color cache
    # NOTE: subsidiary streams have no meta-prefix bit… but
    # _emit_image_stream writes one; emit pixel data inline instead
    g_freq: dict = {}
    r_freq: dict = {}
    b_freq: dict = {}
    a_freq: dict = {}
    for px in pixels:
        g_freq[px[2]] = g_freq.get(px[2], 0) + 1
        r_freq[px[1]] = r_freq.get(px[1], 0) + 1
        b_freq[px[3]] = b_freq.get(px[3], 0) + 1
        a_freq[px[0]] = a_freq.get(px[0], 0) + 1
    g_codes = _write_prefix_code(bw, g_freq, 256 + 24)
    r_codes = _write_prefix_code(bw, r_freq, 256)
    b_codes = _write_prefix_code(bw, b_freq, 256)
    a_codes = _write_prefix_code(bw, a_freq, 256)
    _write_prefix_code(bw, {0: 1}, 40)
    for px in pixels:
        _emit_sym(bw, g_codes, px[2])
        _emit_sym(bw, r_codes, px[1])
        _emit_sym(bw, b_codes, px[3])
        _emit_sym(bw, a_codes, px[0])


def vp8l_encode(
    w: int,
    h: int,
    rgba: bytes,
    subtract_green: bool = False,
    palette: bool = False,
    use_lz77: bool = False,
    cache_bits: int = 0,
    predictor: int | None = None,
    color_transform: tuple | None = None,
) -> bytes:
    """Encode row-major RGBA bytes as a WebP file (RIFF + VP8L).

    Feature flags pick the bitstream shape so fixtures can exercise
    each decoder branch: subtract_green / palette (with pixel
    bundling for <=16 colors) / LZ77 backward references (vertical +
    horizontal runs, distance-map head) / color cache / a uniform
    predictor transform (mode `predictor` in every tile) / a uniform
    color transform (signed (green_to_red, green_to_blue,
    red_to_blue)). palette is exclusive with the pixel-transforms
    (matching how real encoders use it).

    Transform stream order when combined: predictor, then color,
    then subtract-green — the decoder applies inverses in reverse,
    so subtract-green undoes first, predictor last (matching the
    residual math below, which applies subtract-green last)."""
    import struct

    if len(rgba) != w * h * 4:
        raise ValueError("rgba length disagrees with dimensions")
    px = [
        (rgba[4 * i + 3], rgba[4 * i], rgba[4 * i + 1], rgba[4 * i + 2])
        for i in range(w * h)
    ]  # (a, r, g, b)
    alpha_used = any(p[0] != 255 for p in px)
    bw = _BitWriter()
    bw.write(VP8L_MAGIC, 8)
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(1 if alpha_used else 0, 1)
    bw.write(0, 3)  # version
    xsize = w
    if palette:
        if subtract_green or predictor is not None:
            raise ValueError("palette is exclusive with pixel "
                             "transforms in this encoder")
        colors = []
        index: dict = {}
        for p in px:
            if p not in index:
                index[p] = len(colors)
                colors.append(p)
        if len(colors) > 256:
            raise ValueError("too many colors for palette mode")
        bw.write(1, 1)
        bw.write(3, 2)  # color indexing
        bw.write(len(colors) - 1, 8)
        deltas = []
        prev = (0, 0, 0, 0)
        for c in colors:
            deltas.append(tuple((c[i] - prev[i]) & 0xFF
                                for i in range(4)))
            prev = c
        _emit_substream(bw, deltas, len(colors))
        size = len(colors)
        if size <= 2:
            width_bits = 3
        elif size <= 4:
            width_bits = 2
        elif size <= 16:
            width_bits = 1
        else:
            width_bits = 0
        if width_bits:
            per = 1 << width_bits   # indexes per packed pixel
            ibits = 8 >> width_bits  # bits per index
            packed_w = _div_round_up(w, per)
            packed = []
            for y in range(h):
                for bx in range(packed_w):
                    g = 0
                    for k in range(per):
                        x = bx * per + k
                        if x < w:
                            g |= index[px[y * w + x]] << (k * ibits)
                    packed.append((255, 0, g, 0))
            px = packed
            xsize = packed_w
        else:
            px = [(255, 0, index[p], 0) for p in px]
    if predictor is not None:
        if not 0 <= predictor <= 13:
            raise ValueError("predictor mode out of range")
        size_bits = 4
        bw.write(1, 1)
        bw.write(0, 2)  # predictor transform
        bw.write(size_bits - 2, 3)
        tw = _div_round_up(xsize, 1 << size_bits)
        th = _div_round_up(h, 1 << size_bits)
        _emit_substream(
            bw, [(255, 0, predictor, 0)] * (tw * th), tw
        )
        # residuals: forward predictor application
        res = []
        for i, cur in enumerate(px):
            x, y = i % xsize, i // xsize
            if x == 0 and y == 0:
                pred = (255, 0, 0, 0)
            elif y == 0:
                pred = px[i - 1]
            elif x == 0:
                pred = px[i - xsize]
            else:
                left = px[i - 1]
                top = px[i - xsize]
                tl = px[i - xsize - 1]
                tr = px[i - xsize + 1]  # scan-order TR (wraps rows)
                if predictor == 0:
                    pred = (255, 0, 0, 0)
                elif predictor == 1:
                    pred = left
                elif predictor == 2:
                    pred = top
                elif predictor == 3:
                    pred = tr
                elif predictor == 4:
                    pred = tl
                elif predictor == 5:
                    pred = tuple(_avg2(_avg2(left[c], tr[c]), top[c])
                                 for c in range(4))
                elif predictor == 6:
                    pred = tuple(_avg2(left[c], tl[c])
                                 for c in range(4))
                elif predictor == 7:
                    pred = tuple(_avg2(left[c], top[c])
                                 for c in range(4))
                elif predictor == 8:
                    pred = tuple(_avg2(tl[c], top[c])
                                 for c in range(4))
                elif predictor == 9:
                    pred = tuple(_avg2(top[c], tr[c])
                                 for c in range(4))
                elif predictor == 10:
                    pred = tuple(_avg2(_avg2(left[c], tl[c]),
                                       _avg2(top[c], tr[c]))
                                 for c in range(4))
                elif predictor == 11:
                    pL = sum(abs(top[c] - tl[c]) for c in range(4))
                    pT = sum(abs(left[c] - tl[c]) for c in range(4))
                    pred = left if pL < pT else top
                elif predictor == 12:
                    pred = tuple(
                        _clamp255(left[c] + top[c] - tl[c])
                        for c in range(4)
                    )
                else:
                    def _half(c):
                        av = _avg2(left[c], top[c])
                        d = av - tl[c]
                        half = d // 2 if d >= 0 else -((-d) // 2)
                        return _clamp255(av + half)
                    pred = tuple(_half(c) for c in range(4))
            res.append(tuple((cur[c] - pred[c]) & 0xFF
                             for c in range(4)))
        px = res
    if color_transform is not None:
        g2r, g2b, r2b = color_transform
        for t in (g2r, g2b, r2b):
            if not -128 <= t <= 127:
                raise ValueError("color transform element range")
        size_bits = 4
        bw.write(1, 1)
        bw.write(1, 2)  # color transform
        bw.write(size_bits - 2, 3)
        tw = _div_round_up(xsize, 1 << size_bits)
        th = _div_round_up(h, 1 << size_bits)
        # element packing: g2r in blue, g2b in green, r2b in red
        tile_px = (255, r2b & 0xFF, g2b & 0xFF, g2r & 0xFF)
        _emit_substream(bw, [tile_px] * (tw * th), tw)

        def _delta(t: int, c: int) -> int:
            cs = c - 256 if c >= 128 else c
            return (t * cs) >> 5

        out_px = []
        for a, r, g, b in px:
            nr = (r - _delta(g2r, g)) & 0xFF
            nb = (b - _delta(g2b, g) - _delta(r2b, r)) & 0xFF
            out_px.append((a, nr, g, nb))
        px = out_px
    if subtract_green:
        bw.write(1, 1)
        bw.write(2, 2)
        px = [
            (a, (r - g) & 0xFF, g, (b - g) & 0xFF)
            for a, r, g, b in px
        ]
    bw.write(0, 1)  # end of transforms
    _emit_image_stream(bw, px, xsize, use_lz77, cache_bits)
    payload = bw.bytes()
    chunk = b"VP8L" + struct.pack("<I", len(payload)) + payload
    if len(payload) & 1:
        chunk += b"\x00"
    riff = b"WEBP" + chunk
    return b"RIFF" + struct.pack("<I", len(riff)) + riff
