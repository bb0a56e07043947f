"""Baseline (SOF0) + progressive (SOF2) JPEG codec with no codec
libraries.

Pure-python entropy decode (canonical Huffman, byte unstuffing,
restart markers) + numpy everything else (batched 8x8 IDCT as one
einsum over all blocks, vectorized dequant, nearest-neighbor chroma
upsampling, JFIF YCbCr->RGB). Built from the public ITU T.81 spec:
marker segment grammar (B.2), canonical Huffman code construction
(C.2), DC prediction + EXTEND (F.2.2.1), AC run/size with EOB/ZRL
(F.2.2.2), zigzag scan (A.3.6, derived algorithmically — diagonals
r+c, alternating direction), the orthonormal 2-D DCT (A.3.3), and
the progressive procedures of G.1/G.2 (spectral selection,
successive approximation, EOB-run coding, AC refinement correction
bits).

Scale shape: the entropy decode is a per-coefficient Python loop —
inherent to Huffman's serial bit dependency, same caveat as the GIF
LZW — but the IDCT/dequant/color stages, the dominant FLOP cost, are
whole-image numpy. Runs inside the same Arrow-batched mapInPandas
stage as the other decoders (multimodal._decode_rgb_bytes dispatch):
zero shuffle, partition-parallel.

Supported: baseline sequential DCT (SOF0) and extended sequential
(SOF1 — identical Huffman decode at 8-bit) with one interleaved
scan, progressive DCT (SOF2) with any standard scan script
(interleaved DC first/refine, per-component AC bands,
successive-approximation ladders, EOB runs), 8-bit, 1 or 3
components, any sampling factors (chroma upsampled nearest), restart
intervals in both modes. CAPABILITY limits (NotImplementedError):
lossless/differential SOFn variants, arithmetic coding, multi-scan
baseline, 4-component (CMYK). MALFORMED data (truncation, bad Huffman codes,
missing tables, coefficient overrun, bad spectral bands or
successive-approximation parameters) raises ValueError — the
repo-wide two-tier error contract. Progressive correctness is pinned
by cross-validation: jpeg_encode_progressive (built independently
from G.1) produces the same quantized coefficients as
jpeg_encode_baseline, so both decodes must agree BIT-EXACTLY on
every image (tests/test_jpeg.py sweeps gray/RGB/subsampled/Al
ladders/restart intervals).

The exactness hook for the DuckDB oracle gate: a grayscale JPEG whose
blocks are constant with quantizer q[0]=8 round-trips BIT-EXACTLY
(FDCT of a constant-L block is DC-only with S00 = 8*(L-128); quantized
by 8 -> L-128 exactly; IDCT gives S00*q/8 + 128 = L), so
m_decode_jpeg replays pixel values arithmetically with no JPEG
parsing oracle-side.
"""

from __future__ import annotations

import struct

import numpy as np

# zigzag scan order: entry k = the row-major position of the k-th
# zigzag coefficient. Derived, not transcribed: walk diagonals
# s = row+col; odd diagonals run row-ascending, even ones descending.
ZIGZAG = [
    r * 8 + (s - r)
    for s in range(15)
    for r in sorted(
        range(max(0, s - 7), min(8, s + 1)), reverse=(s % 2 == 0)
    )
]

_EINSUM_PATHS: dict = {}


def _einsum(subscripts: str, *ops):
    """np.einsum with the greedy contraction path cached per
    (subscripts, shapes): optimize=True recomputes the greedy path on
    EVERY call (~0.2 ms — ~10% of a whole fixture encode+decode), and
    the path is a pure function of the shapes. Same path, same
    floating-point contraction order, bit-identical output."""
    key = (subscripts, tuple(op.shape for op in ops))
    path = _EINSUM_PATHS.get(key)
    if path is None:
        path = np.einsum_path(subscripts, *ops, optimize="greedy")[0]
        _EINSUM_PATHS[key] = path
    return np.einsum(subscripts, *ops, optimize=path)


# orthonormal DCT-II basis M[u, x] = C(u)/2 * cos((2x+1) u pi / 16);
# IDCT: s = M.T @ S @ M, FDCT: S = M @ s @ M.T  (T.81 A.3.3)
_DCT_M = np.array(
    [
        [
            (np.sqrt(0.5) if u == 0 else 1.0)
            / 2.0
            * np.cos((2 * x + 1) * u * np.pi / 16.0)
            for x in range(8)
        ]
        for u in range(8)
    ]
)


def _build_huff(counts: list[int], symbols: bytes) -> tuple:
    """Canonical Huffman table (T.81 C.2) as a flat max-length-prefix
    lookup list: entry[peeked_bits] = (length << 8) | symbol, 0 for
    invalid prefixes. One list index decodes a symbol (vs up to 16
    dict probes bit-by-bit) — the classic LUT decode. The LUT is
    sized 2^(longest code), not a fixed 2^16, so the build cost
    stays proportional to the table (a fixed 64 Ki-entry fill
    dominated the decode of small per-document images). Returns
    (lut, max_code_length)."""
    max_len = max(
        (ln for ln in range(1, 17) if counts[ln - 1]), default=1
    )
    lut = [0] * (1 << max_len)
    code = k = 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            if k >= len(symbols):
                raise ValueError("malformed JPEG DHT: counts exceed symbols")
            if code >= (1 << length):
                raise ValueError("malformed JPEG DHT: code overflow")
            lo = code << (max_len - length)
            span = 1 << (max_len - length)
            lut[lo : lo + span] = [(length << 8) | symbols[k]] * span
            k += 1
            code += 1
        code <<= 1
    return lut, max_len


class _BitReader:
    """MSB-first bit reader over an unstuffed entropy segment."""

    __slots__ = ("data", "pos", "acc", "nbits")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def read(self, n: int) -> int:
        while self.nbits < n:
            if self.pos >= len(self.data):
                raise ValueError(
                    "truncated JPEG: entropy data ends mid-block"
                )
            self.acc = (self.acc << 8) | self.data[self.pos]
            self.pos += 1
            self.nbits += 8
        self.nbits -= n
        v = (self.acc >> self.nbits) & ((1 << n) - 1)
        self.acc &= (1 << self.nbits) - 1
        return v

    def decode_huff(self, table: tuple) -> int:
        # peek max_len bits (1-padded past the end, per T.81 F.1.2.3
        # — consuming phantom bits raises truncated below)
        lut, peek = table
        acc, nbits, data, pos = self.acc, self.nbits, self.data, self.pos
        while nbits < peek and pos < len(data):
            acc = (acc << 8) | data[pos]
            pos += 1
            nbits += 8
        self.acc, self.nbits, self.pos = acc, nbits, pos
        if nbits >= peek:
            key = (acc >> (nbits - peek)) & ((1 << peek) - 1)
        else:
            pad = peek - nbits
            key = ((acc << pad) | ((1 << pad) - 1)) & ((1 << peek) - 1)
        packed = lut[key]
        if packed == 0:
            raise ValueError("malformed JPEG: invalid Huffman code")
        length = packed >> 8
        if length > nbits:
            raise ValueError("truncated JPEG: entropy data ends mid-block")
        self.nbits = nbits - length
        self.acc = acc & ((1 << self.nbits) - 1)
        return packed & 0xFF


def _extend(v: int, n: int) -> int:
    """T.81 F.2.2.1 EXTEND: map n read bits to the signed value."""
    if n == 0:
        return 0
    return v if v >= (1 << (n - 1)) else v - (1 << n) + 1


def _split_entropy(b: bytes, pos: int) -> tuple[list[bytes], int]:
    """Unstuff the entropy-coded data starting at `pos` and split it
    at restart markers. Returns (segments, position of the
    terminating marker's 0xFF)."""
    segments, cur = [], bytearray()
    n = len(b)
    while pos < n:
        nxt = b.find(b"\xff", pos)
        if nxt < 0:
            raise ValueError("truncated JPEG: no terminating marker")
        cur += b[pos:nxt]
        if nxt + 1 >= n:
            raise ValueError("truncated JPEG: dangling 0xFF")
        m = b[nxt + 1]
        if m == 0x00:  # stuffed FF
            cur.append(0xFF)
            pos = nxt + 2
        elif 0xD0 <= m <= 0xD7:  # restart marker
            segments.append(bytes(cur))
            cur = bytearray()
            pos = nxt + 2
        else:
            segments.append(bytes(cur))
            return segments, nxt
    raise ValueError("truncated JPEG: no terminating marker")


_PROG_ZERO64 = [0] * 64  # shared all-zero block, NEVER mutated


def _frame_layout(frame: dict) -> tuple:
    """Full-frame block geometry shared by every progressive scan:
    (hmax, vmax, mcu_cols, mcu_rows, bdims) with bdims the MCU-padded
    per-component block-grid shapes (T.81 A.2.3 — interleaved scans
    may index dummy blocks past the component extent)."""
    comps = frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    w, h = frame["w"], frame["h"]
    if len(comps) == 1:
        mcu_cols, mcu_rows = -(-w // 8), -(-h // 8)
        bdims = [(mcu_rows, mcu_cols)]
    else:
        mcu_cols = -(-w // (8 * hmax))
        mcu_rows = -(-h // (8 * vmax))
        bdims = [(mcu_rows * c["v"], mcu_cols * c["h"]) for c in comps]
    return hmax, vmax, mcu_cols, mcu_rows, bdims


def _prog_decode_scan(
    b: bytes,
    pos: int,
    frame: dict,
    scan: list,
    ss: int,
    se: int,
    ah: int,
    al: int,
    huff_dc: dict,
    huff_ac: dict,
    restart_interval: int,
    blocks: list,
    layout: tuple,
) -> int:
    """Decode one progressive scan (T.81 G.2) into the persistent
    per-component coefficient buffers. Four scan kinds: DC first
    (Ss=0, Ah=0 — interleaved MCU walk, diffs shifted left Al), DC
    refinement (one bit per block ORed at Al), AC first (single
    component, band Ss..Se, EOB-run coding), AC refinement (the
    correction-bit algorithm of G.1.2.3). Returns the offset of the
    terminating marker's 0xFF. Blocks realize copy-on-write from the
    shared zero placeholder so untouched regions stay O(1)."""
    hmax, vmax, mcu_cols, mcu_rows, bdims = layout
    comps = frame["comps"]
    idx = {c["id"]: i for i, c in enumerate(comps)}
    zz = ZIGZAG

    if not (0 <= ss <= 63 and ss <= se <= 63):
        raise ValueError(f"malformed JPEG: spectral band {ss}..{se}")
    if ss == 0 and se != 0:
        raise ValueError(
            "malformed JPEG: progressive DC scan with Se > 0"
        )
    if ss > 0 and len(scan) != 1:
        raise ValueError(
            "malformed JPEG: interleaved progressive AC scan"
        )
    if al > 13 or (ah and ah != al + 1):
        raise ValueError(
            f"malformed JPEG: successive approximation Ah={ah} Al={al}"
        )

    # scan walk geometry: MCUs when interleaved, the component's TRUE
    # block extent when single-component (T.81 A.2.2)
    if len(scan) > 1:
        cols, rows = mcu_cols, mcu_rows
        per_mcu = [(idx[c["id"]], c["h"], c["v"]) for c in scan]
    else:
        c = scan[0]
        ci = idx[c["id"]]
        if len(comps) == 1:
            cols, rows = mcu_cols, mcu_rows
        else:
            cw = -(-frame["w"] * c["h"] // hmax)
            chh = -(-frame["h"] * c["v"] // vmax)
            cols, rows = -(-cw // 8), -(-chh // 8)
        per_mcu = [(ci, 1, 1)]
    n_units = cols * rows

    dc_tabs = {}
    ac_tab = None
    if ss == 0 and ah == 0:
        for c in scan:
            if c["td"] not in huff_dc:
                raise ValueError("malformed JPEG: missing DC DHT for scan")
            dc_tabs[idx[c["id"]]] = huff_dc[c["td"]]
    if ss > 0:
        if scan[0]["ta"] not in huff_ac:
            raise ValueError("malformed JPEG: missing AC DHT for scan")
        ac_tab = huff_ac[scan[0]["ta"]]

    def realize(blist: list, bi: int) -> list:
        blk = blist[bi]
        if blk is _PROG_ZERO64:
            blk = [0] * 64
            blist[bi] = blk
        return blk

    segments, end = _split_entropy(b, pos)
    p1, m1 = 1 << al, -1 << al
    unit = 0
    for seg_i, seg_data in enumerate(segments):
        reader = _BitReader(seg_data)
        preds = [0] * len(comps)
        eobrun = 0
        stop = (
            min(unit + restart_interval, n_units)
            if restart_interval
            else n_units
        )
        while unit < stop:
            uy, ux = divmod(unit, cols)
            if ss == 0:
                for ci, ch, cv in per_mcu:
                    stride = bdims[ci][1]
                    blist = blocks[ci]
                    for by in range(cv):
                        for bx in range(ch):
                            bi = (uy * cv + by) * stride + ux * ch + bx
                            if ah == 0:
                                t = reader.decode_huff(dc_tabs[ci])
                                if t > 11:
                                    raise ValueError(
                                        f"malformed JPEG: DC category {t}"
                                    )
                                preds[ci] += _extend(reader.read(t), t)
                                if preds[ci]:
                                    realize(blist, bi)[0] = preds[ci] << al
                                elif blist[bi] is not _PROG_ZERO64:
                                    blist[bi][0] = 0
                            else:  # DC refinement: one appended bit
                                if reader.read(1):
                                    realize(blist, bi)[0] |= p1
            else:
                ci = per_mcu[0][0]
                blist = blocks[ci]
                bi = uy * bdims[ci][1] + ux
                if ah == 0:  # AC first pass (G.1.2.2)
                    if eobrun > 0:
                        eobrun -= 1
                    else:
                        blk = None
                        k = ss
                        while k <= se:
                            rs = reader.decode_huff(ac_tab)
                            r, s = rs >> 4, rs & 0x0F
                            if s == 0:
                                if r != 15:  # EOBn
                                    eobrun = (1 << r) - 1
                                    if r:
                                        eobrun += reader.read(r)
                                    break
                                k += 16  # ZRL
                                continue
                            k += r
                            if k > se:
                                raise ValueError(
                                    "malformed JPEG: AC band overrun"
                                )
                            if blk is None:
                                blk = realize(blist, bi)
                            blk[zz[k]] = _extend(reader.read(s), s) << al
                            k += 1
                else:  # AC refinement (G.1.2.3)
                    blk = blist[bi]

                    def correct(blk_: list, k_: int) -> None:
                        c_ = blk_[zz[k_]]
                        if c_ and reader.read(1) and not (c_ & p1):
                            blk_[zz[k_]] = c_ + (p1 if c_ >= 0 else m1)

                    if eobrun > 0:
                        if blk is not _PROG_ZERO64:
                            for k in range(ss, se + 1):
                                correct(blk, k)
                        eobrun -= 1
                    else:
                        k = ss
                        while k <= se:
                            rs = reader.decode_huff(ac_tab)
                            r, s = rs >> 4, rs & 0x0F
                            if s == 0 and r != 15:  # EOBn
                                eobrun = 1 << r
                                if r:
                                    eobrun += reader.read(r)
                                if blk is not _PROG_ZERO64:
                                    while k <= se:
                                        correct(blk, k)
                                        k += 1
                                eobrun -= 1
                                break
                            if s == 0:  # ZRL: skip 16 zero-history
                                val = 0
                            else:
                                if s != 1:
                                    raise ValueError(
                                        "malformed JPEG: AC refinement "
                                        f"size {s}"
                                    )
                                val = p1 if reader.read(1) else m1
                            while k <= se:
                                if blk is not _PROG_ZERO64 and blk[zz[k]]:
                                    correct(blk, k)
                                else:
                                    if r == 0:
                                        break
                                    r -= 1
                                k += 1
                            if val and k <= se:
                                if blk is _PROG_ZERO64:
                                    blk = realize(blist, bi)
                                blk[zz[k]] = val
                            k += 1
            unit += 1
        if restart_interval and seg_i < len(segments) - 1 and (
            unit >= n_units
        ):
            raise ValueError("malformed JPEG: extra restart segments")
    if unit < n_units:
        raise ValueError(
            f"truncated JPEG: {unit} of {n_units} scan units decoded"
        )
    return end


def jpeg_decode(b: bytes) -> tuple:
    """Decode a baseline (SOF0) or progressive (SOF2) JPEG. Returns
    ("JPEG", w, h, channels, rgb) with rgb row-major RGB triples
    (grayscale normalized to triples, channels reported 1 — the
    decode_real convention)."""
    if b[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    frame = None
    restart_interval = 0
    pos = 2
    scan = None
    prog_blocks = None  # progressive: per-comp coefficient buffers
    prog_scans = 0
    layout = None
    while True:
        if pos + 2 > len(b):
            raise ValueError("truncated JPEG: marker segment cut short")
        if b[pos] != 0xFF:
            raise ValueError(
                f"malformed JPEG: expected marker, got 0x{b[pos]:02x}"
            )
        # T.81 B.1.1.2: any number of 0xFF fill bytes may pad a marker
        while pos + 1 < len(b) and b[pos + 1] == 0xFF:
            pos += 1
        if pos + 2 > len(b):
            raise ValueError("truncated JPEG: marker segment cut short")
        marker = b[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI is a bare marker (no length word)
            if prog_blocks is not None and prog_scans:
                break  # progressive: all scans consumed
            raise ValueError("malformed JPEG: EOI before any scan")
        if pos + 2 > len(b):
            raise ValueError("truncated JPEG: marker segment cut short")
        (seglen,) = struct.unpack_from(">H", b, pos)
        seg = b[pos + 2 : pos + seglen]
        if len(seg) != seglen - 2:
            raise ValueError("truncated JPEG: segment body cut short")
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 0x0F
                p += 1
                if pq not in (0, 1):
                    raise ValueError(f"malformed JPEG DQT precision {pq}")
                width = 2 if pq else 1
                if p + 64 * width > len(seg):
                    raise ValueError("truncated JPEG DQT")
                if pq:
                    vals = np.frombuffer(
                        seg[p : p + 128], dtype=">u2"
                    ).astype(np.int64)
                else:
                    vals = np.frombuffer(
                        seg[p : p + 64], dtype=np.uint8
                    ).astype(np.int64)
                # store in NATURAL order: q_nat[ZIGZAG[k]] = vals[k]
                nat = np.zeros(64, dtype=np.int64)
                nat[ZIGZAG] = vals
                qt[tq] = nat
                p += 64 * width
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                if p + 17 > len(seg):
                    raise ValueError("truncated JPEG DHT header")
                tc, th = seg[p] >> 4, seg[p] & 0x0F
                counts = list(seg[p + 1 : p + 17])
                total = sum(counts)
                symbols = seg[p + 17 : p + 17 + total]
                if len(symbols) < total:
                    raise ValueError("truncated JPEG DHT")
                table = _build_huff(counts, symbols)
                (huff_dc if tc == 0 else huff_ac)[th] = table
                p += 17 + total
        elif marker in (0xC0, 0xC1, 0xC2):
            # SOF0 baseline / SOF1 extended sequential (identical
            # Huffman decode at 8-bit) / SOF2 progressive
            if len(seg) < 6:
                raise ValueError("truncated JPEG SOF header")
            prec, h, w, nc = struct.unpack_from(">BHHB", seg, 0)
            if len(seg) < 6 + 3 * nc:
                raise ValueError("truncated JPEG SOF component specs")
            if prec != 8:
                raise NotImplementedError(
                    f"only 8-bit JPEG supported (precision={prec})"
                )
            if nc not in (1, 3):
                raise NotImplementedError(
                    f"{nc}-component JPEG unsupported (CMYK needs an "
                    "Adobe transform; decode with PIL)"
                )
            if w <= 0 or h <= 0:
                raise ValueError(f"malformed JPEG SOF: {w}x{h}")
            comps = []
            for i in range(nc):
                cid, sf, tq = struct.unpack_from(">BBB", seg, 6 + 3 * i)
                comps.append(
                    {"id": cid, "h": sf >> 4, "v": sf & 0x0F, "tq": tq}
                )
                if comps[-1]["h"] < 1 or comps[-1]["v"] < 1:
                    raise ValueError("malformed JPEG: zero sampling factor")
            frame = {"w": w, "h": h, "comps": comps,
                     "prog": marker == 0xC2}
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            kind = "extended/lossless"
            if marker in (0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
                kind = "arithmetic-coded"
            raise NotImplementedError(
                f"{kind} JPEG (SOF{marker - 0xC0}) unsupported — baseline "
                "sequential and progressive only; decode with PIL"
            )
        elif marker == 0xDD:  # DRI
            if len(seg) < 2:
                raise ValueError("truncated JPEG DRI segment")
            (restart_interval,) = struct.unpack_from(">H", seg, 0)
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("malformed JPEG: SOS before SOF")
            if not seg or len(seg) < 1 + 2 * seg[0] + 3:
                raise ValueError("truncated JPEG SOS header")
            ns = seg[0]
            scan_comps = []
            by_id = {c["id"]: c for c in frame["comps"]}
            for i in range(ns):
                cs, tt = seg[1 + 2 * i], seg[2 + 2 * i]
                if cs not in by_id:
                    raise ValueError(
                        f"malformed JPEG SOS: unknown component id {cs}"
                    )
                c = dict(by_id[cs])
                c["td"], c["ta"] = tt >> 4, tt & 0x0F
                scan_comps.append(c)
            if not frame["prog"]:
                if ns != len(frame["comps"]):
                    raise NotImplementedError(
                        "multi-scan baseline JPEG unsupported (one "
                        "interleaved scan covering all components only)"
                    )
                scan = scan_comps
                pos += seglen
                break
            # progressive: Ss/Se/AhAl drive this scan; decode it now
            # and keep walking markers (T.81 G.1)
            ss = seg[1 + 2 * ns]
            se = seg[2 + 2 * ns]
            ahal = seg[3 + 2 * ns]
            ah, al_ = ahal >> 4, ahal & 0x0F
            if prog_blocks is None:
                layout = _frame_layout(frame)
                prog_blocks = [
                    [_PROG_ZERO64] * (br * bc) for br, bc in layout[4]
                ]
            pos += seglen
            pos = _prog_decode_scan(
                b, pos, frame, scan_comps, ss, se, ah, al_,
                huff_dc, huff_ac, restart_interval,
                prog_blocks, layout,
            )
            prog_scans += 1
            continue
        # APPn / COM / anything else: skip
        pos += seglen

    if frame["prog"]:
        # multi-scan reconstruction: coefficients were accumulated
        # across the SOS loop; validate quant tables and fall
        # through to the shared dequant/IDCT tail
        hmax, vmax, mcu_cols, mcu_rows, bdims = layout
        scan = frame["comps"]
        blocks = prog_blocks
        w, h = frame["w"], frame["h"]
        for c in scan:
            if c["tq"] not in qt:
                raise ValueError(
                    f"malformed JPEG: missing DQT {c['tq']}"
                )
    else:
        segments, _end = _split_entropy(b, pos)
        w, h = frame["w"], frame["h"]
        hmax = max(c["h"] for c in scan)
        vmax = max(c["v"] for c in scan)
        if len(scan) == 1:
            # single-component scan: MCU is one block (T.81 A.2.2)
            c = scan[0]
            cw = -(-w * c["h"] // hmax)
            chh = -(-h * c["v"] // vmax)
            mcu_cols, mcu_rows = -(-cw // 8), -(-chh // 8)
            per_mcu = [(0, 1, 1)]
        else:
            mcu_cols, mcu_rows = -(-w // (8 * hmax)), -(-h // (8 * vmax))
            per_mcu = [(i, c["h"], c["v"]) for i, c in enumerate(scan)]
        n_mcus = mcu_cols * mcu_rows

        # per-component coefficient buffers as flat Python lists of
        # 64-entry lists — ONE np.array conversion + dequant multiply per
        # component afterwards (per-block numpy stores were ~10x slower)
        bdims = [
            (mcu_rows * (c["v"] if len(scan) > 1 else 1),
             mcu_cols * (c["h"] if len(scan) > 1 else 1))
            for c in scan
        ]
        _zero64 = [0] * 64  # shared placeholder, never mutated
        blocks = [[_zero64] * (br * bc) for br, bc in bdims]
        for c in scan:
            if c["tq"] not in qt:
                raise ValueError(f"malformed JPEG: missing DQT {c['tq']}")
            if c["td"] not in huff_dc or c["ta"] not in huff_ac:
                raise ValueError("malformed JPEG: missing DHT for scan")

        mcu = 0
        for seg_i, seg_data in enumerate(segments):
            reader = _BitReader(seg_data)
            preds = [0] * len(scan)
            end = (
                min(mcu + restart_interval, n_mcus)
                if restart_interval
                else n_mcus
            )
            while mcu < end:
                my, mx = divmod(mcu, mcu_cols)
                for ci, ch, cv in per_mcu:
                    c = scan[ci]
                    dc_t, ac_t = huff_dc[c["td"]], huff_ac[c["ta"]]
                    for by in range(cv):
                        for bx in range(ch):
                            # plain-list coefficient buffer: per-element
                            # numpy scalar stores are ~10x a list store
                            coef = [0] * 64
                            t = reader.decode_huff(dc_t)
                            if t > 11:
                                raise ValueError(
                                    f"malformed JPEG: DC category {t}"
                                )
                            preds[ci] += _extend(reader.read(t), t)
                            coef[0] = preds[ci]
                            k = 1
                            while k < 64:
                                rs = reader.decode_huff(ac_t)
                                r, s = rs >> 4, rs & 0x0F
                                if s == 0:
                                    if r == 15:  # ZRL
                                        k += 16
                                        continue
                                    break  # EOB
                                k += r
                                if k > 63:
                                    raise ValueError(
                                        "malformed JPEG: AC index overrun"
                                    )
                                coef[ZIGZAG[k]] = _extend(reader.read(s), s)
                                k += 1
                            blocks[ci][
                                (my * cv + by) * bdims[ci][1] + mx * ch + bx
                            ] = coef
                mcu += 1
            if restart_interval and seg_i < len(segments) - 1 and mcu >= n_mcus:
                raise ValueError("malformed JPEG: extra restart segments")
        if mcu < n_mcus:
            raise ValueError(
                f"truncated JPEG: {mcu} of {n_mcus} MCUs decoded"
            )

    planes = []
    for ci, c in enumerate(scan):
        br, bc = bdims[ci]
        # one conversion + vectorized dequant for the whole component;
        # coefficients are (br, bc, 64) in natural order; IDCT all
        # blocks in one einsum: s = M.T @ S @ M
        arr = np.array(blocks[ci], dtype=np.int64) * qt[c["tq"]]
        S = arr.reshape(br, bc, 8, 8)
        spatial = _einsum("xu,rcuv,vy->rcxy", _DCT_M.T, S, _DCT_M)
        plane = spatial.transpose(0, 2, 1, 3).reshape(br * 8, bc * 8)
        plane = np.clip(np.round(plane) + 128, 0, 255)
        cw = -(-w * c["h"] // hmax)
        chh = -(-h * c["v"] // vmax)
        plane = plane[:chh, :cw]
        if cw != w or chh != h:  # nearest-neighbor chroma upsample
            ys = (np.arange(h, dtype=np.int64) * c["v"]) // vmax
            xs = (np.arange(w, dtype=np.int64) * c["h"]) // hmax
            plane = plane[ys][:, xs]
        planes.append(plane)

    if len(planes) == 1:
        gray = planes[0].astype(np.uint8)
        return "JPEG", w, h, 1, np.repeat(gray.reshape(-1), 3).tobytes()
    y, cb, cr = (p.astype(np.float64) for p in planes)
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    bl = y + 1.772 * (cb - 128.0)
    rgb = np.stack(
        [np.clip(np.round(ch), 0, 255).astype(np.uint8) for ch in (r, g, bl)],
        axis=-1,
    )
    return "JPEG", w, h, 3, rgb.tobytes()


def _category(v: int) -> tuple[int, int]:
    """Signed value -> (size category, appended bits) per F.1.2.1."""
    if v == 0:
        return 0, 0
    s = abs(v).bit_length()
    return s, (v if v >= 0 else v + (1 << s) - 1)


class _BitWriter:
    __slots__ = ("out", "acc", "nbits")

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, v: int, n: int) -> None:
        self.acc = (self.acc << n) | (v & ((1 << n) - 1))
        self.nbits += n
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)  # stuff
            self.nbits -= 8
            self.acc &= (1 << self.nbits) - 1

    def pad(self) -> None:
        if self.nbits:
            self.write((1 << (8 - self.nbits)) - 1, 8 - self.nbits)


def _canonical_from_used(used: set[int]) -> tuple[list[int], bytes, dict]:
    """Fixture-grade Huffman spec: every used symbol gets the same
    code length L = ceil(log2(n+1)) (the +1 keeps the all-ones code
    free, as T.81 C.2 requires). Returns (counts, symbols, enc_map)."""
    syms = sorted(used)
    n = max(1, len(syms))
    length = max(1, (n + 1 - 1).bit_length())
    while (1 << length) < n + 1:
        length += 1
    counts = [0] * 16
    counts[length - 1] = len(syms)
    enc = {s: (length, i) for i, s in enumerate(syms)}
    return counts, bytes(syms), enc


def _encode_prepare(
    w: int,
    h: int,
    rgb: bytes | None,
    gray: bytes | None,
    quant: int | list[int],
    subsample: bool,
) -> tuple:
    """Shared encoder front end (baseline + progressive fixtures):
    color transform, optional 4:2:0 subsampling, FDCT, quantization,
    MCU-grid padding. Returns (q_nat, samp, qblocks, mcu_rows,
    mcu_cols, order)."""
    if (rgb is None) == (gray is None):
        raise ValueError("pass exactly one of rgb / gray")
    q_nat = (
        np.full(64, quant, dtype=np.int64)
        if isinstance(quant, int)
        else np.asarray(quant, dtype=np.int64)
    )
    if q_nat.shape != (64,) or (q_nat <= 0).any() or (q_nat > 255).any():
        raise ValueError("quant must be 64 values in 1..255")

    if gray is not None:
        if len(gray) != w * h:
            raise ValueError("gray length must be w*h")
        planes = [np.frombuffer(gray, dtype=np.uint8)
                  .reshape(h, w).astype(np.float64)]
        samp = [(1, 1)]
    else:
        if len(rgb) != w * h * 3:
            raise ValueError("rgb length must be w*h*3")
        px = np.frombuffer(rgb, dtype=np.uint8).reshape(h, w, 3)
        r = px[:, :, 0].astype(np.float64)
        g = px[:, :, 1].astype(np.float64)
        bl = px[:, :, 2].astype(np.float64)
        y = 0.299 * r + 0.587 * g + 0.114 * bl
        cb = -0.168736 * r - 0.331264 * g + 0.5 * bl + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * bl + 128.0
        planes = [y, cb, cr]
        samp = [(2, 2), (1, 1), (1, 1)] if subsample else [(1, 1)] * 3

    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)

    def to_blocks(plane: np.ndarray, ch: int, cv: int) -> np.ndarray:
        if (ch, cv) != (hmax, vmax):  # subsample by 2x2 mean
            ph = -(-plane.shape[0] // 2) * 2
            pw = -(-plane.shape[1] // 2) * 2
            p = np.pad(plane, ((0, ph - plane.shape[0]),
                               (0, pw - plane.shape[1])), mode="edge")
            plane = p.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
        bh = -(-plane.shape[0] // 8) * 8
        bw = -(-plane.shape[1] // 8) * 8
        p = np.pad(plane, ((0, bh - plane.shape[0]),
                           (0, bw - plane.shape[1])), mode="edge")
        S = p.reshape(bh // 8, 8, bw // 8, 8).transpose(0, 2, 1, 3)
        coefs = _einsum("ux,rcxy,yv->rcuv", _DCT_M, S - 128.0, _DCT_M.T)
        qd = np.round(coefs / q_nat.reshape(8, 8)).astype(np.int64)
        return qd  # (brows, bcols, 8, 8)

    qblocks = [to_blocks(p, *s) for p, s in zip(planes, samp)]

    # MCU walk (interleaved when 3 components, single-block when gray)
    if len(planes) == 1:
        mcu_rows, mcu_cols = qblocks[0].shape[0], qblocks[0].shape[1]
        order = [(0, 1, 1)]
    else:
        mcu_cols = -(-w // (8 * hmax))
        mcu_rows = -(-h // (8 * vmax))
        order = [(i, s[0], s[1]) for i, s in enumerate(samp)]
        # pad block grids so every MCU indexes in range
        padded = []
        for qb, (ch, cv) in zip(qblocks, samp):
            need_r, need_c = mcu_rows * cv, mcu_cols * ch
            pr, pc = need_r - qb.shape[0], need_c - qb.shape[1]
            padded.append(np.pad(qb, ((0, pr), (0, pc), (0, 0), (0, 0)),
                                 mode="edge"))
        qblocks = padded
    return q_nat, samp, qblocks, mcu_rows, mcu_cols, order


def jpeg_encode_baseline(
    w: int,
    h: int,
    rgb: bytes | None = None,
    gray: bytes | None = None,
    quant: int | list[int] = 8,
    subsample: bool = False,
    restart_interval: int = 0,
) -> bytes:
    """Synthetic-fixture baseline JPEG encoder (tests + the
    m_decode_jpeg gate query — NOT a public pipeline operator): real
    FDCT (numpy einsum), real quantization, real canonical-Huffman
    entropy coding with byte stuffing and optional restart markers,
    optional 4:2:0 subsampling (2x2 mean). `quant` is either a scalar
    (flat table) or a 64-entry natural-order table used for all
    components. With gray input, constant 8x8 blocks and quant=8 the
    decode is BIT-EXACT (see module docstring) — the oracle hook."""
    q_nat, samp, qblocks, mcu_rows, mcu_cols, order = _encode_prepare(
        w, h, rgb, gray, quant, subsample
    )
    planes = qblocks  # len == component count below

    def block_symbols(qb: np.ndarray) -> tuple[int, list]:
        zz = qb.reshape(64)[ZIGZAG]
        run, acs = 0, []
        last = int(np.nonzero(zz[1:])[0][-1]) + 1 if np.any(zz[1:]) else 0
        for k in range(1, last + 1):
            v = int(zz[k])
            if v == 0:
                run += 1
                continue
            while run > 15:
                acs.append((0xF0, 0, 0))  # ZRL
                run -= 16
            s, bits = _category(v)
            acs.append(((run << 4) | s, s, bits))
            run = 0
        if last < 63:
            acs.append((0x00, 0, 0))  # EOB
        return int(zz[0]), acs

    # pass 1: gather symbols for the two shared tables
    mcu_units = []
    preds = [0] * len(planes)
    dc_used, ac_used = set(), set()
    n_mcus = mcu_rows * mcu_cols
    for m in range(n_mcus):
        if restart_interval and m % restart_interval == 0:
            preds = [0] * len(planes)
        my, mx = divmod(m, mcu_cols)
        unit = []
        for ci, ch, cv in order:
            for by in range(cv):
                for bx in range(ch):
                    dc, acs = block_symbols(
                        qblocks[ci][my * cv + by, mx * ch + bx]
                    )
                    diff = dc - preds[ci]
                    preds[ci] = dc
                    s, bits = _category(diff)
                    dc_used.add(s)
                    ac_used.update(sym for sym, _, _ in acs)
                    unit.append(((s, bits), acs))
        mcu_units.append(unit)

    dc_counts, dc_syms, dc_enc = _canonical_from_used(dc_used or {0})
    ac_counts, ac_syms, ac_enc = _canonical_from_used(ac_used or {0})

    wtr = _BitWriter()
    body = bytearray()
    for m, unit in enumerate(mcu_units):
        if restart_interval and m and m % restart_interval == 0:
            wtr.pad()
            body += wtr.out
            body += bytes([0xFF, 0xD0 + ((m // restart_interval - 1) % 8)])
            wtr = _BitWriter()
        for (s, bits), acs in unit:
            ln, code = dc_enc[s]
            wtr.write(code, ln)
            if s:
                wtr.write(bits, s)
            for sym, sz, ab in acs:
                ln, code = ac_enc[sym]
                wtr.write(code, ln)
                if sz:
                    wtr.write(ab, sz)
    wtr.pad()
    body += wtr.out

    def seg(marker: int, payload: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(
            ">H", len(payload) + 2
        ) + payload

    zz_q = q_nat[ZIGZAG].astype(np.uint8).tobytes()
    nc = len(planes)
    sof = struct.pack(">BHHB", 8, h, w, nc) + b"".join(
        struct.pack(">BBB", i + 1, (s[0] << 4) | s[1], 0)
        for i, s in enumerate(samp)
    )
    dht = (
        bytes([0x00]) + bytes(dc_counts) + dc_syms
        + bytes([0x10]) + bytes(ac_counts) + ac_syms
    )
    sos = bytes([nc]) + b"".join(
        bytes([i + 1, 0x00]) for i in range(nc)
    ) + bytes([0, 63, 0])
    out = bytearray(b"\xff\xd8")
    out += seg(0xDB, bytes([0x00]) + zz_q)
    out += seg(0xC0, sof)
    out += seg(0xC4, dht)
    if restart_interval:
        out += seg(0xDD, struct.pack(">H", restart_interval))
    out += seg(0xDA, sos)
    out += body
    out += b"\xff\xd9"
    return bytes(out)


def jpeg_encode_progressive(
    w: int,
    h: int,
    rgb: bytes | None = None,
    gray: bytes | None = None,
    quant: int | list[int] = 8,
    subsample: bool = False,
    al: int = 1,
    band_split: int = 5,
    restart_interval: int = 0,
) -> bytes:
    """Synthetic-fixture progressive JPEG encoder (tests + the
    m_decode_jpeg gate — NOT a public operator), the paired-writer
    counterpart of _prog_decode_scan built independently from T.81
    G.1: spectral selection (DC scan, then AC bands 1..band_split and
    band_split+1..63 per component) times successive approximation
    (first passes at Al=`al`, then one refinement pass per level down
    to 0). Covers every decoder branch: interleaved DC first+refine,
    AC first with EOB-runs and ZRL, AC refinement with correction
    bits, per-scan Huffman tables, optional restart markers. The
    coefficients are identical to jpeg_encode_baseline's (shared
    _encode_prepare), so progressive decode must reproduce the
    baseline decode BIT-EXACTLY — the cross-validation hook."""
    q_nat, samp, qblocks, mcu_rows, mcu_cols, order = _encode_prepare(
        w, h, rgb, gray, quant, subsample
    )
    nc = len(qblocks)
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)

    def comp_grid(ci: int) -> tuple[int, int]:
        """True (rows, cols) block extent of component ci (AC scans
        never cover the interleave padding)."""
        if nc == 1:
            return qblocks[0].shape[0], qblocks[0].shape[1]
        cw = -(-w * samp[ci][0] // hmax)
        chh = -(-h * samp[ci][1] // vmax)
        return -(-chh // 8), -(-cw // 8)

    def seg(marker: int, payload: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(
            ">H", len(payload) + 2
        ) + payload

    def dht(tc: int, counts: list[int], syms: bytes) -> bytes:
        return seg(0xC4, bytes([(tc << 4)]) + bytes(counts) + syms)

    def sos(comp_ids: list[int], ss: int, se: int, ah: int, a: int,
            use_dc: bool) -> bytes:
        body = bytes([len(comp_ids)])
        for cid in comp_ids:
            td = 0 if use_dc else 0
            ta = 0 if not use_dc else 0
            body += bytes([cid, (td << 4) | ta])
        return seg(0xDA, body + bytes([ss, se, (ah << 4) | a]))

    class _Emit:
        """Per-scan symbol collector: two passes — gather symbols for
        the canonical table, then write bits — mirroring the baseline
        encoder's shape."""

        def __init__(self):
            self.items: list = []  # (sym, nbits, bits) or ("raw", n, v)
            self.used: set[int] = set()

        def sym(self, s: int, nbits: int = 0, bits: int = 0) -> None:
            self.used.add(s)
            self.items.append(("sym", s, nbits, bits))

        def raw(self, nbits: int, bits: int) -> None:
            if nbits:
                self.items.append(("raw", 0, nbits, bits))

        def rst(self, n: int) -> None:
            self.items.append(("rst", n, 0, 0))

        def encode(self, need_table: bool) -> bytes:
            if need_table and self.used:
                counts, syms, enc = _canonical_from_used(self.used)
                table = dht(
                    0 if self.kind == "dc" else 1, counts, syms
                )
            else:
                counts, syms, enc = _canonical_from_used({0})
                table = b""
            wtr = _BitWriter()
            body = bytearray()
            for kind, s, nbits, bits in self.items:
                if kind == "rst":
                    wtr.pad()
                    body += wtr.out
                    body += bytes([0xFF, 0xD0 + (s % 8)])
                    wtr = _BitWriter()
                elif kind == "sym":
                    ln, code = enc[s]
                    wtr.write(code, ln)
                    if nbits:
                        wtr.write(bits, nbits)
                else:
                    wtr.write(bits, nbits)
            wtr.pad()
            body += wtr.out
            return table, bytes(body)

    # ---- DC scans (interleaved over all components) -----------------
    n_mcus = mcu_rows * mcu_cols

    def dc_first_scan(a: int) -> tuple:
        em = _Emit()
        em.kind = "dc"
        preds = [0] * nc
        rst_i = 0
        for m in range(n_mcus):
            if restart_interval and m and m % restart_interval == 0:
                em.rst(rst_i)
                rst_i += 1
                preds = [0] * nc
            my, mx = divmod(m, mcu_cols)
            for ci, ch, cv in order:
                for by in range(cv):
                    for bx in range(ch):
                        dc = int(
                            qblocks[ci][my * cv + by, mx * ch + bx, 0, 0]
                        ) >> a  # DC point transform IS an arithmetic shift
                        diff = dc - preds[ci]
                        preds[ci] = dc
                        s, bits = _category(diff)
                        em.sym(s, s, bits)
        return em.encode(need_table=True)

    def dc_refine_scan(a: int) -> tuple:
        em = _Emit()
        em.kind = "dc"
        rst_i = 0
        for m in range(n_mcus):
            if restart_interval and m and m % restart_interval == 0:
                em.rst(rst_i)
                rst_i += 1
            my, mx = divmod(m, mcu_cols)
            for ci, ch, cv in order:
                for by in range(cv):
                    for bx in range(ch):
                        dc = int(
                            qblocks[ci][my * cv + by, mx * ch + bx, 0, 0]
                        )
                        em.raw(1, (dc >> a) & 1)
        return em.encode(need_table=False)

    # ---- AC scans (single component, band ss..se) -------------------
    def band_tz(ci: int, rows: int, cols: int, ss: int, se: int,
                a: int) -> list[list[int]]:
        """Zigzag gather + AC point transform for the whole component
        in one numpy pass (per-block indexing and a per-coefficient
        tz() lambda dominated the scan's profile), returned as plain
        int lists for the serial run-length walk. tz(v, a) =
        (|v| >> a) * sign(v) exactly as the scalar form."""
        zz = (
            qblocks[ci][:rows, :cols]
            .reshape(rows * cols, 64)[:, ZIGZAG][:, ss : se + 1]
        )
        mag = np.abs(zz) >> a
        return np.where(zz >= 0, mag, -mag).tolist()

    def ac_first_scan(ci: int, ss: int, se: int, a: int) -> tuple:
        em = _Emit()
        em.kind = "ac"
        rows, cols = comp_grid(ci)
        tvals_all = band_tz(ci, rows, cols, ss, se, a)
        eobrun = 0

        def flush_eob():
            nonlocal eobrun
            if eobrun:
                r = eobrun.bit_length() - 1
                em.sym(r << 4, r, eobrun - (1 << r))
                eobrun = 0

        rst_i = 0
        for u in range(rows * cols):
            if restart_interval and u and u % restart_interval == 0:
                flush_eob()
                em.rst(rst_i)
                rst_i += 1
            trow = tvals_all[u]
            run = 0
            emitted = False
            for t in trow:
                if t == 0:
                    run += 1
                    continue
                flush_eob()
                while run > 15:
                    em.sym(0xF0)  # ZRL
                    run -= 16
                s, bits = _category(t)
                em.sym((run << 4) | s, s, bits)
                run = 0
                emitted = True
            if run or not emitted:
                eobrun += 1
                if eobrun == 0x7FFF:
                    flush_eob()
        flush_eob()
        return em.encode(need_table=True)

    def ac_refine_scan(ci: int, ss: int, se: int, a: int) -> tuple:
        em = _Emit()
        em.kind = "ac"
        rows, cols = comp_grid(ci)
        tvals_all = band_tz(ci, rows, cols, ss, se, a)
        eobrun = 0
        eob_bits: list[int] = []  # corrections held across EOB'd blocks

        def flush_eob():
            nonlocal eobrun
            if eobrun:
                r = eobrun.bit_length() - 1
                em.sym(r << 4, r, eobrun - (1 << r))
                for bit in eob_bits:
                    em.raw(1, bit)
                eob_bits.clear()
                eobrun = 0

        rst_i = 0
        for u in range(rows * cols):
            if restart_interval and u and u % restart_interval == 0:
                flush_eob()
                em.rst(rst_i)
                rst_i += 1
            trow = tvals_all[u]
            # ZRLs are emitted only while a NEWLY-significant coef
            # still lies ahead; trailing runs fold into the EOB
            # (T.81 G.1.2.3 / the k <= EOB rule)
            last_new = max(
                (ss + i for i, t in enumerate(trow) if t in (1, -1)),
                default=ss - 1,
            )
            run = 0
            pending: list[int] = []  # correction bits since last emit
            for k in range(ss, se + 1):
                t = trow[k - ss]
                if t == 0:
                    run += 1  # zero history, stays zero
                    continue
                while run > 15 and k <= last_new:
                    flush_eob()
                    em.sym(0xF0)
                    for bit in pending:
                        em.raw(1, bit)
                    pending.clear()
                    run -= 16
                if abs(t) > 1:  # previously significant -> correction
                    pending.append(abs(t) & 1)
                    continue
                # newly significant (|t| == 1)
                flush_eob()
                em.sym((run << 4) | 1, 1, 1 if t > 0 else 0)
                for bit in pending:
                    em.raw(1, bit)
                pending.clear()
                run = 0
            if run or pending:
                eobrun += 1
                eob_bits.extend(pending)
                if eobrun == 0x7FFF:
                    flush_eob()
        flush_eob()
        return em.encode(need_table=True)

    # ---- assemble ----------------------------------------------------
    zz_q = q_nat[ZIGZAG].astype(np.uint8).tobytes()
    sof = struct.pack(">BHHB", 8, h, w, nc) + b"".join(
        struct.pack(">BBB", i + 1, (s[0] << 4) | s[1], 0)
        for i, s in enumerate(samp)
    )
    out = bytearray(b"\xff\xd8")
    out += seg(0xDB, bytes([0x00]) + zz_q)
    out += seg(0xC2, sof)
    if restart_interval:
        out += seg(0xDD, struct.pack(">H", restart_interval))

    all_ids = [i + 1 for i in range(nc)]

    def emit_scan(table: bytes, body: bytes, comp_ids, ss, se, ah, a):
        nonlocal out
        out += table
        out += sos(comp_ids, ss, se, ah, a, use_dc=(ss == 0))
        out += body

    # first passes at Al=al
    table, body = dc_first_scan(al)
    emit_scan(table, body, all_ids, 0, 0, 0, al)
    for ci in range(nc):
        table, body = ac_first_scan(ci, 1, band_split, al)
        emit_scan(table, body, [ci + 1], 1, band_split, 0, al)
        table, body = ac_first_scan(ci, band_split + 1, 63, al)
        emit_scan(table, body, [ci + 1], band_split + 1, 63, 0, al)
    # refinement ladders down to Al=0
    for a in range(al - 1, -1, -1):
        table, body = dc_refine_scan(a)
        emit_scan(table, body, all_ids, 0, 0, a + 1, a)
        for ci in range(nc):
            table, body = ac_refine_scan(ci, 1, band_split, a)
            emit_scan(table, body, [ci + 1], 1, band_split, a + 1, a)
            table, body = ac_refine_scan(ci, band_split + 1, 63, a)
            emit_scan(table, body, [ci + 1], band_split + 1, 63, a + 1, a)
    out += b"\xff\xd9"
    return bytes(out)
