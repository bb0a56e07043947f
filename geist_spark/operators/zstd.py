"""Pure-Python Zstandard (RFC 8878) frame codec for crawl payloads.

CommonCrawl is migrating its WARC distribution from gzip to zstd, and
this container ships no zstd library — so the repo's compressed-payload
boundary (`prep.decompress_text`, previously a typed capability limit
for magic ``28 b5 2f fd``) gets a from-scratch decoder here, plus a
paired bit-level encoder used by fixtures and round-trip tests (the
same paired-codec pattern as jpeg.py / the VP8L codec in
multimodal.py).

Decoder scope (``decompress``): the full RFC 8878 single-threaded
frame format — raw / RLE / compressed blocks; literals in Raw, RLE,
Huffman-compressed (1-stream and 4-stream) and Treeless forms; Huffman
tree descriptions in both direct-weight and FSE-compressed form;
sequence tables in Predefined / RLE / FSE_Compressed / Repeat modes;
the three repeat-offset registers with their literal-length-0 rotation;
multi-frame concatenation; skippable frames; xxhash64 content-checksum
verification. Dictionaries (nonzero Dictionary_ID) are a typed
capability limit (NotImplementedError) — raw-content dictionaries do
not appear in crawl archives, which are self-contained frames.

Every output is BOUNDED by ``max_bytes`` (decompression bombs raise
the malformed-payload ValueError, never OOM an executor — the repo's
PNG-IDAT rule). Two-tier errors: ValueError = malformed payload,
NotImplementedError = declared capability limit.

Reference parity: zpiroux/geist has no decompression surface (JSON-only
engine, /root/reference/README.md:566); this module is part of the
LLM-pipeline extension surface (SURVEY.md §2 extensions).
"""

from __future__ import annotations

import functools as _functools
import struct

ZSTD_MAGIC = 0xFD2FB528
SKIPPABLE_MAGIC_MIN = 0x184D2A50
SKIPPABLE_MAGIC_MAX = 0x184D2A5F

_MAX_BLOCK = 128 * 1024
_MAX_WEIGHT_FSE_LOG = 6
_MAX_LL_LOG, _MAX_ML_LOG, _MAX_OF_LOG = 9, 9, 8


class _Malformed(ValueError):
    """Internal marker; surfaced as ValueError with payload context."""


def _err(msg: str) -> "_Malformed":
    return _Malformed(f"malformed zstd payload: {msg}")


# ---------------------------------------------------------------------------
# xxhash64 (checksum field is the low 32 bits of XXH64(content, seed=0))

_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5
_M64 = (1 << 64) - 1


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M64


def xxh64(data: bytes, seed: int = 0) -> int:
    """XXH64 as specified (and as zstd uses for Content_Checksum)."""
    n = len(data)
    pos = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M64
        v2 = (seed + _P2) & _M64
        v3 = seed & _M64
        v4 = (seed - _P1) & _M64
        n_stripes = n >> 5
        # batch-unpack whole stripes; inline the round (this is the
        # checksum over the full decompressed output — keep it cheap)
        P1, P2, M = _P1, _P2, _M64
        for l1, l2, l3, l4 in struct.iter_unpack(
            "<QQQQ", memoryview(data)[: n_stripes << 5]
        ):
            a = (v1 + l1 * P2) & M
            v1 = (((a << 31) | (a >> 33)) & M) * P1 & M
            a = (v2 + l2 * P2) & M
            v2 = (((a << 31) | (a >> 33)) & M) * P1 & M
            a = (v3 + l3 * P2) & M
            v3 = (((a << 31) | (a >> 33)) & M) * P1 & M
            a = (v4 + l4 * P2) & M
            v4 = (((a << 31) | (a >> 33)) & M) * P1 & M
        pos = n_stripes << 5
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _M64
        for v in (v1, v2, v3, v4):
            h = ((h ^ (_rotl((v * _P2) & _M64, 31) * _P1 & _M64)) * _P1 + _P4) & _M64
    else:
        h = (seed + _P5) & _M64
    h = (h + n) & _M64
    while pos + 8 <= n:
        lane = struct.unpack_from("<Q", data, pos)[0]
        h = ((_rotl(h ^ (_rotl((lane * _P2) & _M64, 31) * _P1 & _M64), 27) * _P1) + _P4) & _M64
        pos += 8
    if pos + 4 <= n:
        lane = struct.unpack_from("<I", data, pos)[0]
        h = ((_rotl(h ^ (lane * _P1 & _M64), 23) * _P2) + _P3) & _M64
        pos += 4
    while pos < n:
        h = ((_rotl(h ^ (data[pos] * _P5 & _M64), 11)) * _P1) & _M64
        pos += 1
    h ^= h >> 33
    h = (h * _P2) & _M64
    h ^= h >> 29
    h = (h * _P3) & _M64
    h ^= h >> 32
    return h


# ---------------------------------------------------------------------------
# Backward bitstream (zstd entropy streams are written forward LSB-first
# and read from the end, below a mandatory 1-bit sentinel in the last byte)


class _BackBits:
    __slots__ = ("data", "pos", "over")

    def __init__(self, data: bytes):
        if not data or data[-1] == 0:
            raise _err("entropy stream missing initial-bit sentinel")
        self.data = data
        # drop the sentinel: highest set bit of the last byte
        self.pos = (len(data) - 1) * 8 + data[-1].bit_length() - 1
        self.over = False

    def peek(self, n: int) -> int:
        """Bits [pos-n, pos), zero-filled below the stream start.
        Constant-time: gathers only the covering bytes."""
        if n == 0:
            return 0
        p = self.pos - n
        hi = (self.pos + 7) >> 3
        if p < 0:
            chunk = int.from_bytes(self.data[0:hi], "little")
            return (chunk << -p) & ((1 << n) - 1)
        lo = p >> 3
        chunk = int.from_bytes(self.data[lo:hi], "little")
        return (chunk >> (p & 7)) & ((1 << n) - 1)

    def read(self, n: int) -> int:
        """Read n bits from the top. Past-the-start reads zero-fill and
        set .over (the FSE interleaved-termination contract)."""
        v = self.peek(n)
        self.pos -= n
        if self.pos < 0:
            self.over = True
            self.pos = max(self.pos, -64)
        return v


# ---------------------------------------------------------------------------
# FSE


def read_fse_distribution(data: bytes, pos: int, max_log: int):
    """Parse an FSE distribution header (RFC 8878 §4.1.1): returns
    (accuracy_log, probs list with -1 for less-than-one, next pos).
    This header is read FORWARD, LSB-first."""
    bitpos = 0
    total_bits = (len(data) - pos) * 8

    def read_bits(n: int) -> int:
        nonlocal bitpos
        if bitpos + n > total_bits:
            raise _err("FSE distribution header overruns its section")
        out = 0
        for i in range(n):
            bp = bitpos + i
            out |= ((data[pos + (bp >> 3)] >> (bp & 7)) & 1) << i
        bitpos += n
        return out

    def peek_bits(n: int) -> int:
        out = 0
        for i in range(n):
            bp = bitpos + i
            if bp >= total_bits:
                break
            out |= ((data[pos + (bp >> 3)] >> (bp & 7)) & 1) << i
        return out

    al = read_bits(4) + 5
    if al > max_log:
        raise _err(f"FSE accuracy log {al} exceeds maximum {max_log}")
    remaining = (1 << al) + 1
    probs = []
    while remaining > 1:
        if len(probs) > 255:
            raise _err("FSE distribution has more than 256 symbols")
        nb = remaining.bit_length()  # max bits for this value
        low_cutoff = (1 << nb) - 1 - remaining  # values with nb-1 bits
        v = peek_bits(nb)
        if (v & ((1 << (nb - 1)) - 1)) < low_cutoff:
            v &= (1 << (nb - 1)) - 1
            read_bits(nb - 1)
        else:
            read_bits(nb)
            if v >= (1 << (nb - 1)):
                v -= low_cutoff
        count = v - 1  # -1 encodes the less-than-one probability
        remaining -= -count if count < 0 else count
        probs.append(count)
        if count == 0:
            # zero-probability run: 2-bit repeat flags
            while True:
                rep = read_bits(2)
                probs.extend([0] * rep)
                if rep != 3:
                    break
    if remaining != 1:
        raise _err("FSE distribution does not sum to table size")
    return al, probs, pos + (bitpos + 7) // 8


def build_fse_table(al: int, probs) -> list:
    """Build the FSE decode table: list of (symbol, nb_bits, base) per
    cell, size 2**al (RFC 8878 §4.1.1 spread + state assignment).

    Memoized on (al, probs): the PREDEFINED distributions rebuild on
    every sequence section in predefined mode, and fixture corpora
    repeat identical normalized distributions across blocks. The
    table is a read-only list of (symbol, nb_bits, base) tuples —
    every consumer only indexes it — so sharing one instance is safe.
    """
    return _build_fse_table_cached(al, tuple(probs))


@_functools.lru_cache(maxsize=512)
def _build_fse_table_cached(al: int, probs: tuple) -> list:
    size = 1 << al
    table_sym = [0] * size
    high = size - 1
    # less-than-one symbols get one cell each at the table's end
    for s, p in enumerate(probs):
        if p == -1:
            table_sym[high] = s
            high -= 1
    step = (size >> 1) + (size >> 3) + 3
    mask = size - 1
    posn = 0
    for s, p in enumerate(probs):
        for _ in range(max(p, 0)):
            table_sym[posn] = s
            posn = (posn + step) & mask
            while posn > high:
                posn = (posn + step) & mask
    if posn != 0:
        raise _err("corrupted FSE distribution (spread did not close)")
    nxt = [1 if p == -1 else p for p in probs]
    table = []
    for u in range(size):
        s = table_sym[u]
        ns = nxt[s]
        nxt[s] = ns + 1
        nb = al - (ns.bit_length() - 1)
        table.append((s, nb, (ns << nb) - size))
    return table


_PRED_LL_PROBS = [
    4, 3, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 1, 1, 1, 2, 2, 2, 2, 2, 2,
    2, 2, 2, 3, 2, 1, 1, 1, 1, 1, -1, -1, -1, -1,
]
_PRED_ML_PROBS = [
    1, 4, 3, 2, 2, 2, 2, 2, 2, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1,
    1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1,
    1, 1, -1, -1, -1, -1, -1, -1, -1,
]
_PRED_OF_PROBS = [
    1, 1, 1, 1, 1, 1, 2, 2, 2, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1,
    1, 1, -1, -1, -1, -1, -1,
]

# literal-length code -> (baseline, extra_bits)
_LL_BASE = [(i, 0) for i in range(16)] + [
    (16, 1), (18, 1), (20, 1), (22, 1), (24, 2), (28, 2), (32, 3),
    (40, 3), (48, 4), (64, 6), (128, 7), (256, 8), (512, 9), (1024, 10),
    (2048, 11), (4096, 12), (8192, 13), (16384, 14), (32768, 15),
    (65536, 16),
]
# match-length code -> (baseline, extra_bits)
_ML_BASE = [(i + 3, 0) for i in range(32)] + [
    (35, 1), (37, 1), (39, 1), (41, 1), (43, 2), (47, 2), (51, 3),
    (59, 3), (67, 4), (83, 4), (99, 5), (131, 7), (259, 8), (515, 9),
    (1027, 10), (2051, 11), (4099, 12), (8195, 13), (16387, 14),
    (32771, 15), (65539, 16),
]

_PRED_LL_TABLE = build_fse_table(6, _PRED_LL_PROBS)
_PRED_ML_TABLE = build_fse_table(6, _PRED_ML_PROBS)
_PRED_OF_TABLE = build_fse_table(5, _PRED_OF_PROBS)


def _fse_decode_interleaved(data: bytes, al: int, table, max_out: int):
    """Two-state interleaved FSE stream (Huffman weights): alternate
    states, stop when a state update overruns the stream — the other
    state then flushes its current symbol (RFC 8878 §4.1.1)."""
    bits = _BackBits(data)
    s1 = bits.read(al)
    s2 = bits.read(al)
    if bits.over:
        raise _err("FSE weight stream too short for initial states")
    out = []
    while True:
        if len(out) > max_out:
            raise _err("FSE weight stream decodes past symbol limit")
        sym, nb, base = table[s1]
        out.append(sym)
        s1 = base + bits.read(nb)
        if bits.over:
            out.append(table[s2][0])
            break
        sym, nb, base = table[s2]
        out.append(sym)
        s2 = base + bits.read(nb)
        if bits.over:
            out.append(table[s1][0])
            break
    return out


# ---------------------------------------------------------------------------
# Huffman


def _huffman_table(weights) -> tuple:
    """Canonical zstd Huffman decode table from the full weight list
    (including the implied last weight): returns (cells, max_bits)
    where cells[i] = (symbol, nb_bits) for each 2**max_bits prefix."""
    total = sum(1 << (w - 1) for w in weights if w > 0)
    if total == 0 or total & (total - 1):
        raise _err("Huffman weights do not sum to a power of two")
    max_bits = total.bit_length() - 1
    if max_bits > 11:
        raise _err("Huffman code length exceeds the 11-bit limit")
    size = 1 << max_bits
    cells = [None] * size
    posn = 0
    for w in range(1, max_bits + 1):
        span = 1 << (w - 1)
        for s, ws in enumerate(weights):
            if ws == w:
                nb = max_bits + 1 - w
                for _ in range(span):
                    if posn >= size:
                        raise _err("Huffman weights overfill the table")
                    cells[posn] = (s, nb)
                    posn += 1
    if posn != size:
        raise _err("Huffman weights do not complete the table")
    return cells, max_bits


def _read_huffman(data: bytes, pos: int):
    """Huffman_Tree_Description: direct 4-bit weights (header >= 128)
    or an FSE-compressed weight stream. Returns (cells, max_bits, pos
    after description)."""
    if pos >= len(data):
        raise _err("missing Huffman tree description")
    header = data[pos]
    pos += 1
    if header >= 128:
        n = header - 127
        nbytes = (n + 1) // 2
        if pos + nbytes > len(data):
            raise _err("direct Huffman weights truncated")
        weights = []
        for i in range(n):
            b = data[pos + (i >> 1)]
            weights.append((b >> 4) if i % 2 == 0 else (b & 0x0F))
        pos += nbytes
    else:
        if pos + header > len(data):
            raise _err("FSE Huffman weight stream truncated")
        sub = data[pos : pos + header]
        al, probs, dpos = read_fse_distribution(sub, 0, _MAX_WEIGHT_FSE_LOG)
        table = build_fse_table(al, probs)
        weights = _fse_decode_interleaved(sub[dpos:], al, table, 255)
        pos += header
    # implied last weight completes the sum to a power of two
    total = sum(1 << (w - 1) for w in weights if w > 0)
    if total == 0:
        raise _err("Huffman weights are all zero")
    max_bits = total.bit_length()
    rest = (1 << max_bits) - total
    if rest & (rest - 1):
        raise _err("Huffman weights do not leave a power-of-two remainder")
    weights = weights + [rest.bit_length()]
    if len(weights) > 256:
        raise _err("Huffman tree describes more than 256 symbols")
    cells, max_bits = _huffman_table(weights)
    return cells, max_bits, pos


def _huffman_decode_stream(data: bytes, cells, max_bits: int, n_out: int) -> bytes:
    """Hot loop: sliding 64-bit window over the backward stream, one
    table lookup per literal, refilled 6 bytes at a time."""
    if not data or data[-1] == 0:
        raise _err("entropy stream missing initial-bit sentinel")
    pos = (len(data) - 1) * 8 + data[-1].bit_length() - 1  # payload bits
    out = bytearray(n_out)
    # window holds bits [base, pos_w) of the stream, LSB = bit `base`
    hi = (pos + 7) >> 3
    lo = max(hi - 8, 0)
    window = int.from_bytes(data[lo:hi], "little")
    base = lo * 8
    avail = pos - base  # unread bits currently in the window
    window &= (1 << avail) - 1 if avail >= 0 else 0
    mask = (1 << max_bits) - 1
    d = data
    for i in range(n_out):
        if avail < max_bits and base > 0:
            take = min(6, base >> 3)
            nlo = (base >> 3) - take
            window = ((window & ((1 << avail) - 1)) << (take * 8)) | int.from_bytes(
                d[nlo : nlo + take], "little"
            )
            base -= take * 8
            avail += take * 8
        if avail <= 0:
            raise _err("Huffman literal stream exhausted early")
        code = (
            (window >> (avail - max_bits)) & mask
            if avail >= max_bits
            else (window << (max_bits - avail)) & mask
        )
        sym, nb = cells[code]
        avail -= nb
        out[i] = sym
    if avail != 0 or base != 0:
        raise _err("Huffman literal stream has leftover bits")
    return bytes(out)


# ---------------------------------------------------------------------------
# Literals section


def _decode_literals(block: bytes, pos: int, huff_state: dict):
    """Returns (literals bytes, pos after section)."""
    if pos >= len(block):
        raise _err("missing literals section")
    b0 = block[pos]
    ltype = b0 & 3
    sformat = (b0 >> 2) & 3
    if ltype in (0, 1):  # Raw / RLE
        if sformat in (0, 2):
            regen = b0 >> 3
            pos += 1
        elif sformat == 1:
            if pos + 2 > len(block):
                raise _err("literals header truncated")
            regen = (b0 >> 4) | (block[pos + 1] << 4)
            pos += 2
        else:
            if pos + 3 > len(block):
                raise _err("literals header truncated")
            regen = (b0 >> 4) | (block[pos + 1] << 4) | (block[pos + 2] << 12)
            pos += 3
        if ltype == 0:
            if pos + regen > len(block):
                raise _err("raw literals truncated")
            return block[pos : pos + regen], pos + regen
        if pos >= len(block):
            raise _err("RLE literal byte missing")
        return block[pos : pos + 1] * regen, pos + 1
    # Compressed / Treeless
    if sformat == 0:
        n_streams, hbytes = 1, 3
    elif sformat == 1:
        n_streams, hbytes = 4, 3
    elif sformat == 2:
        n_streams, hbytes = 4, 4
    else:
        n_streams, hbytes = 4, 5
    if pos + hbytes > len(block):
        raise _err("literals header truncated")
    raw = int.from_bytes(block[pos : pos + hbytes], "little") >> 4
    nbits = {3: 10, 4: 14, 5: 18}[hbytes]
    regen = raw & ((1 << nbits) - 1)
    comp = raw >> nbits
    pos += hbytes
    if pos + comp > len(block):
        raise _err("compressed literals truncated")
    section = block[pos : pos + comp]
    spos = 0
    if ltype == 2:
        cells, max_bits, spos = _read_huffman(section, 0)
        huff_state["table"] = (cells, max_bits)
    else:  # Treeless: reuse previous table
        if "table" not in huff_state:
            raise _err("treeless literals with no previous Huffman table")
        cells, max_bits = huff_state["table"]
    if n_streams == 1:
        lit = _huffman_decode_stream(section[spos:], cells, max_bits, regen)
    else:
        if comp - spos < 6:
            raise _err("4-stream literals missing jump table")
        s1, s2, s3 = struct.unpack_from("<HHH", section, spos)
        spos += 6
        s4 = comp - spos - s1 - s2 - s3
        if s4 <= 0:
            raise _err("4-stream literal sizes overrun the section")
        per = (regen + 3) >> 2
        last = regen - 3 * per
        if last < 0:
            raise _err("4-stream literal split underflows")
        lit = bytearray()
        for sz, n_out in ((s1, per), (s2, per), (s3, per), (s4, last)):
            lit += _huffman_decode_stream(
                section[spos : spos + sz], cells, max_bits, n_out
            )
            spos += sz
    if len(lit) != regen:
        raise _err("literal stream regenerated wrong size")
    return bytes(lit), pos + comp


# ---------------------------------------------------------------------------
# Sequences section


def _read_seq_table(block, pos, mode, pred_table, pred_log, max_log, prev, name):
    """Sequence table per Symbol_Compression_Modes: returns
    ((table, al) | ('rle', symbol), new pos, new prev)."""
    if mode == 0:
        # a predefined table is also what a later Repeat mode reuses
        ent = (pred_table, pred_log)
        return ent, pos, ent
    if mode == 1:
        if pos >= len(block):
            raise _err(f"{name} RLE symbol missing")
        ent = ("rle", block[pos])
        return ent, pos + 1, ent
    if mode == 2:
        al, probs, pos = read_fse_distribution(block, pos, max_log)
        table = build_fse_table(al, probs)
        ent = (table, al)
        return ent, pos, ent
    if prev is None:
        raise _err(f"{name} repeat mode with no previous table")
    return prev, pos, prev


class _SeqState:
    """One of the three interleaved sequence-decoding states."""

    __slots__ = ("kind", "table", "al", "state", "sym")

    def __init__(self, ent):
        if ent[0] == "rle":
            self.kind = "rle"
            self.sym = ent[1]
        else:
            self.kind = "fse"
            self.table, self.al = ent

    def init(self, bits: _BackBits):
        if self.kind == "fse":
            self.state = bits.read(self.al)
            self.sym = self.table[self.state][0]

    def update(self, bits: _BackBits):
        if self.kind == "fse":
            _, nb, base = self.table[self.state]
            self.state = base + bits.read(nb)
            if self.state >= len(self.table):
                raise _err("FSE state update out of range")
            self.sym = self.table[self.state][0]


def _decode_sequences(block: bytes, pos: int, seq_state: dict):
    """Returns list of (literal_len, match_len, offset_value)."""
    if pos >= len(block):
        raise _err("missing sequences section")
    b0 = block[pos]
    pos += 1
    if b0 == 0:
        return [], pos
    if b0 < 128:
        n_seq = b0
    elif b0 < 255:
        if pos >= len(block):
            raise _err("sequence count truncated")
        n_seq = ((b0 - 128) << 8) + block[pos]
        pos += 1
    else:
        if pos + 2 > len(block):
            raise _err("sequence count truncated")
        n_seq = block[pos] + (block[pos + 1] << 8) + 0x7F00
        pos += 2
    if pos >= len(block):
        raise _err("sequence modes byte missing")
    modes = block[pos]
    pos += 1
    if modes & 3:
        raise _err("reserved sequence-mode bits set")
    ll_ent, pos, seq_state["ll"] = _read_seq_table(
        block, pos, (modes >> 6) & 3, _PRED_LL_TABLE, 6, _MAX_LL_LOG,
        seq_state.get("ll"), "literal-length")
    of_ent, pos, seq_state["of"] = _read_seq_table(
        block, pos, (modes >> 4) & 3, _PRED_OF_TABLE, 5, _MAX_OF_LOG,
        seq_state.get("of"), "offset")
    ml_ent, pos, seq_state["ml"] = _read_seq_table(
        block, pos, (modes >> 2) & 3, _PRED_ML_TABLE, 6, _MAX_ML_LOG,
        seq_state.get("ml"), "match-length")
    bits = _BackBits(block[pos:])
    ll_s, of_s, ml_s = _SeqState(ll_ent), _SeqState(of_ent), _SeqState(ml_ent)
    ll_s.init(bits)
    of_s.init(bits)
    ml_s.init(bits)
    if bits.over:
        raise _err("sequence bitstream too short for initial states")
    seqs = []
    for i in range(n_seq):
        of_code = of_s.sym
        if of_code > 31:
            raise _err("offset code out of range")
        offset_value = (1 << of_code) + bits.read(of_code)
        ml_code = ml_s.sym
        if ml_code > 52:
            raise _err("match-length code out of range")
        ml_base, ml_extra = _ML_BASE[ml_code]
        match_len = ml_base + bits.read(ml_extra)
        ll_code = ll_s.sym
        if ll_code > 35:
            raise _err("literal-length code out of range")
        ll_base, ll_extra = _LL_BASE[ll_code]
        lit_len = ll_base + bits.read(ll_extra)
        if bits.over:
            raise _err("sequence bitstream exhausted mid-sequence")
        seqs.append((lit_len, match_len, offset_value))
        if i + 1 < n_seq:
            ll_s.update(bits)
            ml_s.update(bits)
            of_s.update(bits)
            if bits.over:
                raise _err("sequence bitstream exhausted on state update")
    if bits.pos != 0:
        raise _err("sequence bitstream has leftover bits")
    return seqs, pos


def _execute(out: bytearray, literals: bytes, seqs, reps, budget: int):
    """Sequence execution with the repeat-offset registers; appends to
    the frame output. Returns the updated budget."""
    lpos = 0
    for lit_len, match_len, offset_value in seqs:
        if lit_len > len(literals) - lpos:
            raise _err("sequence consumes more literals than provided")
        budget -= lit_len + match_len
        if budget < 0:
            raise _err("decompressed size exceeds max_bytes budget")
        out += literals[lpos : lpos + lit_len]
        lpos += lit_len
        if offset_value > 3:
            offset = offset_value - 3
            reps[2] = reps[1]
            reps[1] = reps[0]
            reps[0] = offset
        else:
            idx = offset_value + (1 if lit_len == 0 else 0)
            if idx == 1:
                offset = reps[0]
            elif idx == 2:
                offset = reps[1]
                reps[1] = reps[0]
                reps[0] = offset
            elif idx == 3:
                offset = reps[2]
                reps[2] = reps[1]
                reps[1] = reps[0]
                reps[0] = offset
            else:  # offset_value 3 with literal_length 0
                offset = reps[0] - 1
                if offset == 0:
                    raise _err("repeat offset underflows to zero")
                reps[2] = reps[1]
                reps[1] = reps[0]
                reps[0] = offset
        if offset > len(out):
            raise _err("match offset reaches before frame start")
        if offset >= match_len:
            start = len(out) - offset
            out += out[start : start + match_len]
        else:  # overlapping copy, byte-at-a-time semantics
            start = len(out) - offset
            for k in range(match_len):
                out.append(out[start + k])
    rest = literals[lpos:]
    budget -= len(rest)
    if budget < 0:
        raise _err("decompressed size exceeds max_bytes budget")
    out += rest
    return budget


# ---------------------------------------------------------------------------
# Frame walk


def decompress(data: bytes, max_bytes: int = 64 * 1024 * 1024) -> bytes:
    """Decode a zstd payload: one or more concatenated frames (skippable
    frames ignored). Output bounded at max_bytes; raises ValueError on
    malformed input, NotImplementedError on dictionary frames."""
    if max_bytes <= 0:
        raise ValueError("max_bytes must be positive")
    out = bytearray()
    pos = 0
    budget = max_bytes
    saw_frame = False
    try:
        while pos < len(data):
            if len(data) - pos < 4:
                raise _err("truncated frame magic")
            magic = struct.unpack_from("<I", data, pos)[0]
            if SKIPPABLE_MAGIC_MIN <= magic <= SKIPPABLE_MAGIC_MAX:
                if len(data) - pos < 8:
                    raise _err("truncated skippable frame header")
                size = struct.unpack_from("<I", data, pos + 4)[0]
                if pos + 8 + size > len(data):
                    raise _err("skippable frame overruns the payload")
                pos += 8 + size
                continue
            if magic != ZSTD_MAGIC:
                raise _err(f"bad frame magic 0x{magic:08x}")
            pos, budget = _frame(data, pos + 4, out, budget)
            saw_frame = True
        if not saw_frame:
            raise _err("payload contains no zstd frame")
    except _Malformed:
        raise
    except (IndexError, struct.error):
        raise _err("payload truncated") from None
    return bytes(out)


def _frame(data: bytes, pos: int, out: bytearray, budget: int):
    fhd = data[pos]
    pos += 1
    if fhd & 0x08:
        raise _err("reserved frame-header bit set")
    single = bool(fhd & 0x20)
    checksum = bool(fhd & 0x04)
    did_flag = fhd & 3
    fcs_flag = fhd >> 6
    if not single:
        wd = data[pos]
        pos += 1
        window = (1 << (10 + (wd >> 3))) + ((1 << (10 + (wd >> 3))) >> 3) * (wd & 7)
    else:
        window = None
    did_bytes = (0, 1, 2, 4)[did_flag]
    if did_bytes:
        did = int.from_bytes(data[pos : pos + did_bytes], "little")
        pos += did_bytes
        if did:
            raise NotImplementedError(
                "zstd frame requires external dictionary "
                f"(Dictionary_ID={did}) — dictionary frames are a "
                "capability limit; crawl archives use self-contained frames"
            )
    fcs = None
    if fcs_flag == 0:
        if single:
            fcs = data[pos]
            pos += 1
    elif fcs_flag == 1:
        fcs = struct.unpack_from("<H", data, pos)[0] + 256
        pos += 2
    elif fcs_flag == 2:
        fcs = struct.unpack_from("<I", data, pos)[0]
        pos += 4
    else:
        fcs = struct.unpack_from("<Q", data, pos)[0]
        pos += 8
    if single:
        window = fcs
    frame_start = len(out)
    huff_state: dict = {}
    seq_state: dict = {}
    reps = [1, 4, 8]
    max_block = min(window if window is not None else _MAX_BLOCK, _MAX_BLOCK)
    max_block = max(max_block, 1)
    while True:
        if pos + 3 > len(data):
            raise _err("truncated block header")
        bh = int.from_bytes(data[pos : pos + 3], "little")
        pos += 3
        last = bh & 1
        btype = (bh >> 1) & 3
        bsize = bh >> 3
        if btype == 0:  # raw
            if pos + bsize > len(data):
                raise _err("raw block truncated")
            budget -= bsize
            if budget < 0:
                raise _err("decompressed size exceeds max_bytes budget")
            out += data[pos : pos + bsize]
            pos += bsize
        elif btype == 1:  # RLE: bsize is the REGENERATED size
            if pos >= len(data):
                raise _err("RLE block byte missing")
            if bsize > max_block:
                raise _err("RLE block exceeds the block-size limit")
            budget -= bsize
            if budget < 0:
                raise _err("decompressed size exceeds max_bytes budget")
            out += data[pos : pos + 1] * bsize
            pos += 1
        elif btype == 2:
            if bsize > max_block or pos + bsize > len(data):
                raise _err("compressed block truncated or oversized")
            block = data[pos : pos + bsize]
            pos += bsize
            lit, bpos = _decode_literals(block, 0, huff_state)
            seqs, bpos = _decode_sequences(block, bpos, seq_state)
            pre = len(out)
            budget = _execute(out, lit, seqs, reps, budget)
            if len(out) - pre > max_block:
                raise _err("block regenerates past the block-size limit")
        else:
            raise _err("reserved block type")
        if last:
            break
    if fcs is not None and len(out) - frame_start != fcs:
        raise _err("frame content size mismatch")
    if checksum:
        if pos + 4 > len(data):
            raise _err("content checksum truncated")
        want = struct.unpack_from("<I", data, pos)[0]
        pos += 4
        got = xxh64(bytes(out[frame_start:])) & 0xFFFFFFFF
        if want != got:
            raise _err("content checksum mismatch")
    return pos, budget


# ---------------------------------------------------------------------------
# Paired encoder (fixture/test side — the repo's paired bit-level codec
# pattern, cf. the VP8L and progressive-JPEG encoders). Produces real
# RFC 8878 frames: raw / RLE / compressed blocks, Huffman literals
# (1- and 4-stream, direct or FSE-compressed tree), sequences in
# Predefined / RLE / FSE_Compressed modes, repeat-offset emission, and
# an xxh64 content checksum. Every frame is self-checked through the
# decoder before being returned.


class _FieldWriter:
    """Collects (value, nbits) fields in DECODE order and serializes
    them so a backward reader consumes them in that order: fields are
    emitted last-to-first, then the sentinel bit and byte padding."""

    def __init__(self):
        self.fields = []

    def add(self, value: int, nbits: int):
        if value >> nbits:
            raise AssertionError("field value wider than its bit count")
        self.fields.append((value, nbits))

    def to_bytes(self) -> bytes:
        acc, n = 0, 0
        for value, nbits in reversed(self.fields):
            acc |= value << n
            n += nbits
        acc |= 1 << n  # sentinel
        n += 1
        return acc.to_bytes((n + 7) // 8, "little")


def _fse_cells_by_symbol(table):
    """cell indices grouped per symbol, with each cell's coverage of
    next-state space: symbol -> list of (cell, base, nb)."""
    out = {}
    for u, (sym, nb, base) in enumerate(table):
        out.setdefault(sym, []).append((u, base, nb))
    return out


def _fse_pick_cell(cells_of_sym, next_cell: int):
    """The unique cell of this symbol whose transition range covers
    next_cell (the per-symbol ranges partition the state space)."""
    for u, base, nb in cells_of_sym:
        if base <= next_cell < base + (1 << nb):
            return u, next_cell - base, nb
    raise AssertionError("FSE coverage gap — table construction bug")


def _normalize_counts(counts: dict, al: int, n_symbols: int):
    """Deterministic normalization of a histogram to 2**al cells, every
    present symbol >= 1 cell (the encoder never uses -1 probabilities).
    Returns the prob list (trailing zeros trimmed)."""
    size = 1 << al
    present = sorted(s for s, c in counts.items() if c > 0)
    if not present:
        raise AssertionError("cannot normalize an empty histogram")
    if len(present) > size:
        raise AssertionError("alphabet larger than FSE table")
    total = sum(counts[s] for s in present)
    probs = [0] * (max(present) + 1)
    acc = 0
    for s in present:
        p = max(1, (counts[s] * size) // total)
        probs[s] = p
        acc += p
    # fix drift on the most probable symbols, never dropping below 1
    order = sorted(present, key=lambda s: -counts[s])
    i = 0
    while acc != size:
        s = order[i % len(order)]
        if acc < size:
            probs[s] += 1
            acc += 1
        elif probs[s] > 1:
            probs[s] -= 1
            acc -= 1
        i += 1
        if i > 10 * size + 16:
            raise AssertionError("normalization did not converge")
    return probs


def _write_fse_distribution(probs, al: int) -> bytes:
    """Forward-bitstream FSE distribution header (§4.1.1) for prob
    lists without -1 entries."""
    bits = []  # (value, nbits) in stream order

    def put(v, n):
        bits.append((v, n))

    put(al - 5, 4)
    remaining = (1 << al) + 1
    i = 0
    while remaining > 1:
        p = probs[i] if i < len(probs) else 0
        v = p + 1
        nb = remaining.bit_length()
        low_cutoff = (1 << nb) - 1 - remaining
        if v < low_cutoff:
            put(v, nb - 1)
        elif v < (1 << (nb - 1)):
            put(v, nb)
        else:
            put(v + low_cutoff, nb)
        remaining -= abs(p)
        i += 1
        if p == 0:
            # zero-run repeat flags, 2 bits each; flag==3 chains.
            # (_normalize_counts guarantees the final entry is nonzero,
            # so runs are interior and bounded.)
            run = 0
            while i + run < len(probs) and probs[i + run] == 0:
                run += 1
            while True:
                chunk = min(run, 3)
                put(chunk, 2)
                i += chunk
                run -= chunk
                if chunk < 3:
                    break
    acc = n = 0
    for v, nbits in bits:
        acc |= v << n
        n += nbits
    return acc.to_bytes((n + 7) // 8, "little")


def _huffman_code_lengths(freqs: dict, max_len: int = 11) -> dict:
    """Package-merge-free Huffman with a depth clamp: standard heapq
    tree, then Kraft-equality repair within max_len."""
    import heapq

    syms = sorted(freqs)
    if len(syms) < 2:
        raise AssertionError("Huffman needs at least two symbols")
    heap = [(freqs[s], i, (s,)) for i, s in enumerate(syms)]
    heapq.heapify(heap)
    depth = dict.fromkeys(syms, 0)
    uid = len(syms)
    while len(heap) > 1:
        f1, _, g1 = heapq.heappop(heap)
        f2, _, g2 = heapq.heappop(heap)
        for s in g1 + g2:
            depth[s] += 1
        heapq.heappush(heap, (f1 + f2, uid, g1 + g2))
        uid += 1
    for s in syms:
        depth[s] = min(max(depth[s], 1), max_len)
    # repair Kraft sum to EXACT equality at some tree height
    for _ in range(4096):
        ksum = sum(1 << (max_len - d) for d in depth.values())
        target = 1 << max_len
        if ksum == target:
            break
        if ksum > target:
            # deepen the least-frequent repairable symbol
            cand = min(
                (s for s in syms if depth[s] < max_len),
                default=None,
                key=lambda s: (freqs[s], s),
            )
            if cand is None:
                raise AssertionError("Kraft repair failed")
            depth[cand] += 1
        else:
            # raise the deepest symbol one level if it keeps sum >= target
            cand = max(syms, key=lambda s: (depth[s], -freqs[s]))
            if depth[cand] <= 1:
                raise AssertionError("Kraft repair failed")
            depth[cand] -= 1
    if sum(1 << (max_len - d) for d in depth.values()) != 1 << max_len:
        raise AssertionError("Kraft repair did not converge")
    return depth


def _huffman_encoder(weights):
    """(codes dict symbol -> (value, nbits), max_bits) from a full
    weight list — canonical assignment mirroring _huffman_table."""
    cells, max_bits = _huffman_table(weights)
    codes = {}
    posn = 0
    while posn < len(cells):
        sym, nb = cells[posn]
        span = 1 << (max_bits - nb)
        codes[sym] = (posn >> (max_bits - nb), nb)
        posn += span
    return codes, max_bits


def _encode_weights_fse(weights_explicit) -> "bytes | None":
    """FSE-compressed Huffman weight stream (header byte < 128), or
    None when this representation cannot express the list (single
    distinct weight, or a termination corner)."""
    m = len(weights_explicit)
    if m < 2 or len(set(weights_explicit)) < 2:
        return None
    counts = {}
    for w in weights_explicit:
        counts[w] = counts.get(w, 0) + 1
    for al in (5, 6):
        if len([c for c in counts.values() if c > 0]) <= (1 << al):
            try:
                probs = _normalize_counts(counts, al, 256)
            except AssertionError:
                continue
            table = build_fse_table(al, probs)
            cells_of = _fse_cells_by_symbol(table)
            # backward induction over the two interleaved chains
            cell = [None] * m
            try:
                # c[m-1], c[m-2] free; c[m-2] must have nb >= 1
                cell[m - 1] = cells_of[weights_explicit[m - 1]][0][0]
                last2 = [
                    (u, b, nb)
                    for u, b, nb in cells_of[weights_explicit[m - 2]]
                    if nb >= 1
                ]
                if not last2:
                    continue
                cell[m - 2] = last2[0][0]
                fields_rev = []
                for i in range(m - 3, -1, -1):
                    u, v, nb = _fse_pick_cell(
                        cells_of[weights_explicit[i]], cell[i + 2]
                    )
                    cell[i] = u
                    fields_rev.append((v, nb))
            except KeyError:
                continue
            w = _FieldWriter()
            w.add(cell[0], al)
            w.add(cell[1], al)
            for v, nb in reversed(fields_rev):
                w.add(v, nb)
            stream = w.to_bytes()
            hdr = _write_fse_distribution(probs, al)
            blob = hdr + stream
            if len(blob) < 128:
                # self-check through the decoder side
                try:
                    al2, probs2, dpos = read_fse_distribution(blob, 0, 6)
                    t2 = build_fse_table(al2, probs2)
                    got = _fse_decode_interleaved(blob[dpos:], al2, t2, 255)
                except _Malformed:
                    continue
                if got == list(weights_explicit):
                    return bytes([len(blob)]) + blob
    return None


def _encode_huffman_description(weights_explicit, prefer_fse: bool) -> bytes:
    if prefer_fse:
        blob = _encode_weights_fse(weights_explicit)
        if blob is not None:
            return blob
    n = len(weights_explicit)
    if n > 128:
        blob = _encode_weights_fse(weights_explicit)
        if blob is not None:
            return blob
        raise AssertionError("cannot serialize >128 weights directly")
    out = bytearray([127 + n])
    for i in range(0, n, 2):
        hi = weights_explicit[i] << 4
        lo = weights_explicit[i + 1] if i + 1 < n else 0
        out.append(hi | lo)
    return bytes(out)


def _ll_code(ll: int) -> int:
    if ll < 16:
        return ll
    for code in range(35, 15, -1):
        base, extra = _LL_BASE[code]
        if ll >= base:
            if ll - base >= (1 << extra):
                raise AssertionError("literal length out of range")
            return code
    raise AssertionError("unreachable")


def _ml_code(ml: int) -> int:
    if ml < 3:
        raise AssertionError("match length below minimum")
    if ml <= 34:
        return ml - 3
    for code in range(52, 31, -1):
        base, extra = _ML_BASE[code]
        if ml >= base:
            if ml - base >= (1 << extra):
                raise AssertionError("match length out of range")
            return code
    raise AssertionError("unreachable")


def _seq_channel(codes, pred_probs, pred_log, max_log, mode):
    """Choose and build one sequence channel: returns
    (mode_bits, table, al, header_blob)."""
    if mode == "rle" or (mode is None and len(set(codes)) == 1):
        if len(set(codes)) != 1:
            raise AssertionError("RLE sequence mode forced on varying codes")
        sym = codes[0]
        return 1, ("rle", sym), None, bytes([sym])
    if mode == "fse":
        counts = {}
        for c in codes:
            counts[c] = counts.get(c, 0) + 1
        al = min(max_log, max(5, (len(counts) - 1).bit_length() + 1))
        probs = _normalize_counts(counts, al, 64)
        return 2, (build_fse_table(al, probs), al), al, _write_fse_distribution(probs, al)
    # predefined
    return 0, (build_fse_table(pred_log, pred_probs), pred_log), pred_log, b""


def _fse_chain(symbols, table):
    """Backward-induction cells for one sequence channel: returns
    (cells, update_fields) where update_fields[i] transitions
    cell[i] -> cell[i+1] (len = n-1)."""
    cells_of = _fse_cells_by_symbol(table)
    n = len(symbols)
    cells = [None] * n
    cells[n - 1] = cells_of[symbols[n - 1]][0][0]
    fields = [None] * (n - 1)
    for i in range(n - 2, -1, -1):
        u, v, nb = _fse_pick_cell(cells_of[symbols[i]], cells[i + 1])
        cells[i] = u
        fields[i] = (v, nb)
    return cells, fields


def _encode_sequences_section(seqs, seq_mode=None, prev=None):
    """Sequences section bytes for [(ll, ml, offset_value), ...].
    seq_mode: None (auto), 'predefined', 'fse', 'rle', or 'repeat'
    (reuse prev tables). Returns (bytes, state_for_next_block)."""
    out = bytearray()
    n = len(seqs)
    if n == 0:
        return b"\x00", prev
    if n < 128:
        out.append(n)
    elif n < 0x7F00:
        out += bytes([128 + (n >> 8), n & 0xFF])
    else:
        r = n - 0x7F00
        out += bytes([255, r & 0xFF, r >> 8])
    ll_codes = [_ll_code(s[0]) for s in seqs]
    ml_codes = [_ml_code(s[1]) for s in seqs]
    of_codes = [s[2].bit_length() - 1 for s in seqs]
    if max(of_codes) > 31:
        raise AssertionError("offset beyond 31-bit code space")
    if seq_mode == "repeat":
        if prev is None:
            raise AssertionError("repeat sequence mode with no previous tables")
        (ll_ent, of_ent, ml_ent) = prev
        modes = (3, 3, 3)
        blobs = (b"", b"", b"")
    else:
        m = None if seq_mode is None else seq_mode
        ll_m, ll_ent, _, ll_blob = _seq_channel(
            ll_codes, _PRED_LL_PROBS, 6, _MAX_LL_LOG, m)
        of_m, of_ent, _, of_blob = _seq_channel(
            of_codes, _PRED_OF_PROBS, 5, _MAX_OF_LOG, m)
        ml_m, ml_ent, _, ml_blob = _seq_channel(
            ml_codes, _PRED_ML_PROBS, 6, _MAX_ML_LOG, m)
        modes = (ll_m, of_m, ml_m)
        blobs = (ll_blob, of_blob, ml_blob)
    out.append((modes[0] << 6) | (modes[1] << 4) | (modes[2] << 2))
    out += blobs[0] + blobs[1] + blobs[2]

    w = _FieldWriter()
    chains = {}
    for name, ent, codes in (
        ("ll", ll_ent, ll_codes), ("of", of_ent, of_codes), ("ml", ml_ent, ml_codes)
    ):
        if ent[0] == "rle":
            chains[name] = None
        else:
            table, al = ent
            cells, fields = _fse_chain(codes, table)
            chains[name] = (cells, fields, al)
    # init states, decode order LL, OF, ML
    for name in ("ll", "of", "ml"):
        if chains[name] is not None:
            cells, _, al = chains[name]
            w.add(cells[0], al)
    for i, (ll, ml, ov) in enumerate(seqs):
        ofc, mlc, llc = of_codes[i], ml_codes[i], ll_codes[i]
        w.add(ov - (1 << ofc), ofc)
        w.add(ml - _ML_BASE[mlc][0], _ML_BASE[mlc][1])
        w.add(ll - _LL_BASE[llc][0], _LL_BASE[llc][1])
        if i + 1 < n:
            for name in ("ll", "ml", "of"):
                if chains[name] is not None:
                    _, fields, _ = chains[name]
                    w.add(*fields[i])
    out += w.to_bytes()
    return bytes(out), (ll_ent, of_ent, ml_ent)


def _encode_huffman_literals(lit, codes, max_bits, desc, four_stream):
    """Assemble the Compressed/Treeless literals body (tree description
    + jump table + streams). Returns body bytes or None if a stream
    cannot terminate on a sentinel boundary issue (never in practice)."""
    def one_stream(chunk):
        w = _FieldWriter()
        for b in chunk:
            w.add(*codes[b])
        return w.to_bytes()

    if not four_stream:
        return desc + one_stream(lit)
    per = (len(lit) + 3) >> 2
    parts = [lit[0:per], lit[per : 2 * per], lit[2 * per : 3 * per], lit[3 * per :]]
    if any(len(p) == 0 for p in parts):
        return None  # 4-stream needs 4 nonempty slices
    streams = [one_stream(p) for p in parts]
    if any(len(s) > 0xFFFF for s in streams[:3]):
        return None
    jump = struct.pack("<HHH", len(streams[0]), len(streams[1]), len(streams[2]))
    return desc + jump + b"".join(streams)


def _literals_header(ltype, sformat, regen, comp=None):
    if ltype in (0, 1):
        if sformat == 0:
            return bytes([ltype | (regen << 3)])
        if sformat == 1:
            return bytes([ltype | 4 | ((regen & 0xF) << 4), regen >> 4])
        return bytes([
            ltype | 12 | ((regen & 0xF) << 4),
            (regen >> 4) & 0xFF,
            regen >> 12,
        ])
    hdr = ltype | (sformat << 2)
    if sformat in (0, 1):  # 10+10 bits, 3 bytes
        v = hdr | (regen << 4) | (comp << 14)
        return v.to_bytes(3, "little")
    if sformat == 2:  # 14+14 bits, 4 bytes
        v = hdr | (regen << 4) | (comp << 18)
        return v.to_bytes(4, "little")
    v = hdr | (regen << 4) | (comp << 22)  # 18+18, 5 bytes
    return v.to_bytes(5, "little")


def _encode_literals_section(lit, opts, huff_prev):
    """Literals section bytes. Returns (bytes, huff_state_for_next).
    opts: literals_mode None|'raw'|'rle'|'huffman'|'treeless',
    four_stream None|bool, fse_weights bool."""
    mode = opts.get("literals_mode")
    regen = len(lit)
    distinct = set(lit)
    if mode is None:
        if regen == 0 or len(distinct) == 1 and regen >= 2:
            mode = "rle" if regen >= 2 else "raw"
        elif regen < 64 or len(distinct) < 2:
            mode = "raw"
        else:
            mode = "huffman"
    if mode == "rle":
        if len(distinct) != 1:
            raise AssertionError("RLE literals forced on non-uniform bytes")
        sf = 0 if regen < 32 else (1 if regen < 4096 else 3)
        return _literals_header(1, sf, regen) + lit[:1], huff_prev
    if mode == "raw":
        sf = 0 if regen < 32 else (1 if regen < 4096 else 3)
        return _literals_header(0, sf, regen) + lit, huff_prev
    four = opts.get("four_stream")
    if four is None:
        four = regen >= 1024
    if mode == "treeless":
        if huff_prev is None:
            raise AssertionError("treeless literals with no previous table")
        codes, max_bits = huff_prev
        if any(b not in codes for b in distinct):
            raise AssertionError("treeless literals outside previous alphabet")
        body = _encode_huffman_literals(lit, codes, max_bits, b"", four)
        ltype = 3
    else:
        freqs = {}
        for b in lit:
            freqs[b] = freqs.get(b, 0) + 1
        depths = _huffman_code_lengths(freqs)
        max_depth = max(depths.values())
        weights_full = [0] * (max(freqs) + 1)
        for s, d in depths.items():
            weights_full[s] = max_depth + 1 - d
        desc = _encode_huffman_description(
            weights_full[:-1], opts.get("fse_weights", True)
        )
        codes, max_bits = _huffman_encoder(weights_full)
        body = _encode_huffman_literals(lit, codes, max_bits, desc, four)
        ltype = 2
    if body is None:  # degenerate split; store raw instead
        sf = 0 if regen < 32 else (1 if regen < 4096 else 3)
        return _literals_header(0, sf, regen) + lit, huff_prev
    comp = len(body)
    if not four and regen < 1024 and comp < 1024:
        hdr = _literals_header(ltype, 0, regen, comp)
    elif four and regen < 1024 and comp < 1024:
        hdr = _literals_header(ltype, 1, regen, comp)
    elif regen < (1 << 14) and comp < (1 << 14):
        if not four:
            return _literals_header(0, 3, regen) + lit, huff_prev
        hdr = _literals_header(ltype, 2, regen, comp)
    else:
        if not four:
            return _literals_header(0, 3, regen) + lit, huff_prev
        hdr = _literals_header(ltype, 3, regen, comp)
    return hdr + body, (codes, max_bits)


def _apply_rep(reps, offset_value, lit_len):
    """Mirror the decoder's repeat-offset update; returns real offset."""
    if offset_value > 3:
        off = offset_value - 3
        reps[2], reps[1], reps[0] = reps[1], reps[0], off
        return off
    idx = offset_value + (1 if lit_len == 0 else 0)
    if idx == 1:
        return reps[0]
    if idx == 2:
        off = reps[1]
        reps[1], reps[0] = reps[0], off
        return off
    if idx == 3:
        off = reps[2]
        reps[2], reps[1], reps[0] = reps[1], reps[0], off
        return off
    off = reps[0] - 1
    reps[2], reps[1], reps[0] = reps[1], reps[0], off
    return off


def _find_matches(chunk: bytes, use_repcodes: bool, reps):
    """Greedy hash-chain LZ over one block: returns (literals, seqs)
    with seqs = [(lit_len, match_len, offset_value)], repcode-aware."""
    n = len(chunk)
    table: dict = {}
    lits = bytearray()
    seqs = []
    i = 0
    anchor = 0
    while i + 4 <= n:
        key = chunk[i : i + 4]
        cand = table.get(key)
        table[key] = i
        if cand is None or i - cand > (1 << 22):
            i += 1
            continue
        # extend
        mlen = 4
        while i + mlen < n and chunk[cand + mlen] == chunk[i + mlen]:
            mlen += 1
        if mlen > 131069:
            mlen = 131069
        ll = i - anchor
        offset = i - cand
        ov = offset + 3
        if use_repcodes:
            shifted = (
                [reps[0], reps[1], reps[2]]
                if ll > 0
                else [reps[1], reps[2], reps[0] - 1]
            )
            if offset in shifted:
                ov = shifted.index(offset) + 1
        lits += chunk[anchor:i]
        _apply_rep(reps, ov, ll)
        seqs.append((ll, mlen, ov))
        i += mlen
        anchor = i
    lits += chunk[anchor:]
    return bytes(lits), seqs


def compress(data: bytes, **opts) -> bytes:
    """Paired RFC 8878 encoder. Options (all keyword-only, for fixture
    path-steering): store=True (raw blocks only), block_bytes (default
    65536), checksum (default True), literals_mode, four_stream,
    fse_weights (default True), seq_mode ('predefined'|'fse'|'rle'|
    'repeat'|None auto), use_repcodes (default True), reuse_tables
    (Treeless/Repeat on later blocks). Output is self-checked through
    the decoder; any internal corner falls back to a raw block."""
    block_bytes = min(int(opts.get("block_bytes", 65536)), _MAX_BLOCK - 2048)
    checksum = opts.get("checksum", True)
    store = opts.get("store", False)
    out = bytearray(struct.pack("<I", ZSTD_MAGIC))
    fcs = len(data)
    fhd = 0x20 | (0x04 if checksum else 0)
    if fcs <= 255:
        out.append(fhd)
        out.append(fcs)
    elif fcs <= 65535 + 256:
        out.append(fhd | 0x40)
        out += struct.pack("<H", fcs - 256)
    else:
        out.append(fhd | 0x80)
        out += struct.pack("<I", fcs)
    chunks = [data[i : i + block_bytes] for i in range(0, len(data), block_bytes)]
    if not chunks:
        chunks = [b""]
    reps = [1, 4, 8]
    huff_state = None
    seq_state = None
    for ci, chunk in enumerate(chunks):
        last = 1 if ci == len(chunks) - 1 else 0
        if (
            not store
            and len(chunk) >= 2
            and len(set(chunk)) == 1
        ):
            out += struct.pack("<I", (len(chunk) << 3) | 2 | last)[:3]
            out += chunk[:1]
            # zstd RLE blocks leave repcodes/tables untouched
            continue
        block = None
        if not store and len(chunk) >= 16:
            saved_reps = list(reps)
            try:
                lits, seqs = _find_matches(
                    chunk, opts.get("use_repcodes", True), reps
                )
                sm = opts.get("seq_mode")
                lm_opts = dict(opts)
                if ci > 0 and opts.get("reuse_tables"):
                    if huff_state is not None and lm_opts.get("literals_mode") is None:
                        lm_opts["literals_mode"] = "treeless"
                    if sm is None and seq_state is not None and seqs:
                        sm = "repeat"
                lit_sec, new_huff = _encode_literals_section(
                    lits, lm_opts, huff_state
                )
                seq_sec, new_seq = _encode_sequences_section(
                    seqs, sm, seq_state
                )
                cand = lit_sec + seq_sec
                if len(cand) < len(chunk):
                    block = cand
                    huff_state, seq_state = new_huff, new_seq
                else:
                    reps[:] = saved_reps
            except AssertionError:
                reps[:] = saved_reps
                block = None
        if block is None:
            out += struct.pack("<I", (len(chunk) << 3) | 0 | last)[:3]
            out += chunk
        else:
            out += struct.pack("<I", (len(block) << 3) | 4 | last)[:3]
            out += block
    if checksum:
        out += struct.pack("<I", xxh64(data) & 0xFFFFFFFF)
    blob = bytes(out)
    # deterministic safety net: every frame must decode to its input
    got = decompress(blob, max_bytes=max(len(data) * 2 + 1024, 1 << 16))
    if got != data:
        raise AssertionError("paired-encoder self-check failed")
    return blob


def skippable_frame(payload: bytes, nibble: int = 0) -> bytes:
    """A skippable frame wrapping arbitrary payload (fixture helper)."""
    if not 0 <= nibble <= 15:
        raise ValueError("skippable-frame nibble must be 0..15")
    return struct.pack("<II", SKIPPABLE_MAGIC_MIN + nibble, len(payload)) + payload
