"""PDF text extraction for training-data pipelines.

PDF is the single biggest document format in real crawl dumps that
the archive/Office extractors don't cover. This is a from-scratch
minimal reader built the same way as prep.archive_extract_text and
the multimodal decoders: stdlib only (zlib), every inflate bounded,
two-tier errors — foreign/unsupported constructs are TYPED capability
limits (passworded PDFs, non-Identity CMap fonts, non-Flate
filters), structural damage always raises ValueError. No reference-engine
parity to cite: zpiroux/geist is a JSON-event engine (README.md:566)
with no document surface; the spec followed here is ISO 32000-1
(cross-reference tables AND 1.5 cross-reference/object streams,
object grammar, content-stream text operators).

Scope:
- classic xref tables (multi-section /Prev chains) AND PDF 1.5
  cross-reference STREAMS (W-field rows, /Index subsections, PNG
  row predictors) with object streams (/ObjStm) — the modern-PDF
  majority layout,
- FlateDecode and unfiltered content streams, bounded at max_bytes
  (the PNG-IDAT / gzip-bomb rule); predictors on CONTENT streams and
  other filters are capability limits,
- simple fonts (Type1/TrueType) with standard single-byte encodings,
  decoded as WinAnsi (cp1252), AND composite Type0 fonts with
  /Encoding Identity-H|V plus an embedded /ToUnicode CMap (2-byte
  CIDs mapped through beginbfchar/beginbfrange — the layout every
  modern word processor / browser emits for subset-embedded fonts);
  Type0 with a named non-Identity CMap or without ToUnicode stays a
  capability limit (those bytes are glyph indexes with no
  recoverable text),
- encrypted files (Standard security handler) with an EMPTY user
  password — the owner-locked-but-world-readable PDFs that dominate
  real crawls — decrypt transparently across ALL mainstream
  schemes: RC4 V 1/2 R 2/3 (Algorithms 1-5, stdlib MD5 +
  from-scratch RC4), AES-128 via the V4 /StdCF AESV2 crypt filter,
  and AES-256 AESV3 (V5 R5/6, the ISO 32000-2 Algorithm 2.B SHA-2
  KDF + /UE key unwrap; from-scratch T-table AES pinned by FIPS-197
  vectors); non-Standard handlers, split string/stream crypt
  filters, and non-empty user passwords stay capability limits,
- text assembly from BT/ET blocks: Tj / TJ / ' / " shows; Td / TD /
  T* / BT open a new output line (only when the current line is
  non-empty — so a leading position op never emits a blank line);
  TJ kerning numbers are ignored (no synthetic spaces). The dialect
  is pinned by the w_pdf_extract oracle and the writer round-trip.

Scale: one Arrow-batched mapInPandas stage over (file_id, payload),
page fan-out inside the batch, zero shuffle — the WARC record-fan-out
shape; at 100 TB the PDF paths list is the input table and this is
the first pass after the object-store read.
"""

from __future__ import annotations

import re
import struct

from pyspark.sql import DataFrame

PDF_TEXT_SCHEMA = "file_id long, page int, text string, n_chars int"

_WS = b"\x00\t\n\x0c\r "
_DELIM = b"()<>[]{}/%"

# C-level token runs for the hot lexer paths. cProfile over the
# w_pdf_extract corpus showed skip_ws + name + keyword + hex_string +
# _is_regular at ~45% of parse CPU as per-byte Python loops; each is a
# single character-class run the regex engine consumes in one call
# (guide §4.2 — do the bulk work in native code). The classes mirror
# _WS/_DELIM exactly; token boundaries are unchanged.
_RE_WS_RUN = re.compile(rb"[\x00\t\n\x0c\r ]*")
_RE_REGULAR_RUN = re.compile(rb"[^\x00\t\n\x0c\r ()<>\[\]{}/%]*")
_RE_NUM_RUN = re.compile(rb"[+\-.0-9]*")


class _Name(str):
    """A PDF name token (/Foo) — distinct from text strings."""


def _is_regular(c: int) -> bool:
    return c not in _WS and c not in _DELIM


class _Lexer:
    """Cursor over raw PDF bytes with the shared token grammar
    (ISO 32000-1 §7.2-7.3) used by both the object parser and the
    content-stream walker."""

    def __init__(self, b: bytes, i: int = 0):
        self.b = b
        self.i = i

    def skip_ws(self) -> None:
        b, n = self.b, len(self.b)
        i = _RE_WS_RUN.match(b, self.i).end()
        while i < n and b[i] == 0x25:  # '%' comment to EOL
            j = b.find(b"\n", i)
            i = n if j < 0 else j + 1
            i = _RE_WS_RUN.match(b, i).end()
        self.i = i

    def lit_string(self) -> bytes:
        """Literal (…) string with nesting, escapes, octal, and EOL
        normalization (§7.3.4.2). Cursor sits on '('."""
        b, n = self.b, len(self.b)
        i = self.i + 1
        depth, out = 1, bytearray()
        esc = {0x6E: 0x0A, 0x72: 0x0D, 0x74: 0x09, 0x62: 0x08,
               0x66: 0x0C, 0x28: 0x28, 0x29: 0x29, 0x5C: 0x5C}
        while i < n:
            c = b[i]
            if c == 0x5C:  # backslash
                if i + 1 >= n:
                    break
                nxt = b[i + 1]
                if nxt in esc:
                    out.append(esc[nxt])
                    i += 2
                elif 0x30 <= nxt <= 0x37:  # up to 3 octal digits
                    j, v = i + 1, 0
                    while j < min(i + 4, n) and 0x30 <= b[j] <= 0x37:
                        v = v * 8 + (b[j] - 0x30)
                        j += 1
                    out.append(v & 0xFF)
                    i = j
                elif nxt in (0x0A, 0x0D):  # line continuation
                    i += 2
                    if nxt == 0x0D and i < n and b[i] == 0x0A:
                        i += 1
                else:  # unknown escape: the char itself
                    out.append(nxt)
                    i += 2
            elif c == 0x28:
                depth += 1
                out.append(c)
                i += 1
            elif c == 0x29:
                depth -= 1
                if depth == 0:
                    self.i = i + 1
                    return bytes(out)
                out.append(c)
                i += 1
            elif c == 0x0D:  # raw EOL in a string reads as \n
                out.append(0x0A)
                i += 1
                if i < n and b[i] == 0x0A:
                    i += 1
            else:
                out.append(c)
                i += 1
        raise ValueError("malformed PDF: unterminated literal string")

    def hex_string(self) -> bytes:
        """<48 65…> hex string; odd final digit pads with 0
        (§7.3.4.3). Cursor sits on '<' (not '<<')."""
        b = self.b
        j = b.find(b">", self.i)
        if j < 0:
            raise ValueError("malformed PDF: unterminated hex string")
        digits = b[self.i + 1: j].translate(None, _WS)
        self.i = j + 1
        if len(digits) % 2:
            digits += b"0"  # odd final digit pads with 0 (§7.3.4.3)
        try:  # C fast path — identical bytes for well-formed hex
            return bytes.fromhex(digits.decode("ascii"))
        except (ValueError, UnicodeDecodeError):
            pass
        # exact-compat slow path: reproduces the historical per-pair
        # int(chr+chr, 16) acceptance (e.g. a stray sign character
        # inside a pair parses where fromhex refuses)
        out = bytearray()
        for k in range(0, len(digits), 2):
            try:
                out.append(int(chr(digits[k]) + chr(digits[k + 1]), 16))
            except ValueError:
                raise ValueError(
                    "malformed PDF: non-hex digit in hex string"
                ) from None
        return bytes(out)

    def name(self) -> _Name:
        """/Name token with #xx hex escapes (§7.3.5). Cursor on '/'."""
        b, n = self.b, len(self.b)
        m = _RE_REGULAR_RUN.match(b, self.i + 1)
        run = m.group()
        if b"#" not in run:  # fast path: identical run boundary
            self.i = m.end()
            return _Name(run.decode("latin-1"))
        i = self.i + 1
        out = bytearray()
        while i < n and _is_regular(b[i]):
            if b[i] == 0x23 and i + 2 < n:  # '#'
                try:
                    out.append(int(b[i + 1: i + 3].decode("ascii"), 16))
                    i += 3
                    continue
                except (ValueError, UnicodeDecodeError):
                    pass
            out.append(b[i])
            i += 1
        self.i = i
        return _Name(out.decode("latin-1"))

    def keyword(self) -> str:
        m = _RE_REGULAR_RUN.match(self.b, self.i)
        self.i = m.end()
        return m.group().decode("latin-1")


def _parse_value(lx: _Lexer, objects: dict | None, depth: int = 0):
    """One PDF object value at the cursor: dict, array, name, number,
    string, bool, null, or an indirect reference ('N G R' lookahead).
    References stay symbolic as ('ref', num) — resolution is lazy via
    _resolve so reference cycles can be depth-guarded."""
    if depth > 64:
        raise ValueError("malformed PDF: object nesting too deep")
    lx.skip_ws()
    b, n = lx.b, len(lx.b)
    if lx.i >= n:
        raise ValueError("malformed PDF: unexpected end of objects")
    c = b[lx.i]
    if c == 0x28:  # (
        return lx.lit_string()
    if c == 0x3C:  # < or <<
        if b[lx.i: lx.i + 2] == b"<<":
            lx.i += 2
            d = {}
            while True:
                lx.skip_ws()
                if b[lx.i: lx.i + 2] == b">>":
                    lx.i += 2
                    return d
                if lx.i >= n or b[lx.i] != 0x2F:
                    raise ValueError(
                        "malformed PDF: dictionary key is not a name"
                    )
                key = lx.name()
                d[str(key)] = _parse_value(lx, objects, depth + 1)
        return lx.hex_string()
    if c == 0x5B:  # [
        lx.i += 1
        arr = []
        while True:
            lx.skip_ws()
            if lx.i < n and b[lx.i] == 0x5D:
                lx.i += 1
                return arr
            arr.append(_parse_value(lx, objects, depth + 1))
    if c == 0x2F:  # /
        return lx.name()
    if c in b"+-.0123456789":
        m = _RE_NUM_RUN.match(b, lx.i)
        tok = m.group()
        lx.i = m.end()
        # 'N G R' indirect-reference lookahead
        if tok.isdigit():
            save = lx.i
            lx.skip_ws()
            s2 = lx.i
            while lx.i < n and b[lx.i] in b"0123456789":
                lx.i += 1
            tok2 = b[s2: lx.i]
            if tok2.isdigit():
                lx.skip_ws()
                if lx.i < n and b[lx.i: lx.i + 1] == b"R" and (
                    lx.i + 1 >= n or not _is_regular(b[lx.i + 1])
                ):
                    lx.i += 1
                    return ("ref", int(tok))
            lx.i = save
        try:
            return float(tok) if b"." in tok else int(tok)
        except ValueError:
            raise ValueError(
                f"malformed PDF: bad number token {tok!r}"
            ) from None
    word = lx.keyword()
    if word == "true":
        return True
    if word == "false":
        return False
    if word == "null":
        return None
    raise ValueError(f"malformed PDF: unexpected token {word!r}")


def _resolve(v, objects: dict, max_bytes: int, depth: int = 0):
    """Chase ('ref', n) through the object table (cycle-guarded)."""
    while isinstance(v, tuple) and v and v[0] == "ref":
        if depth > 32:
            raise ValueError("malformed PDF: reference chain too deep")
        num = v[1]
        if num not in objects:
            raise ValueError(f"malformed PDF: dangling reference {num}")
        v = _load_object(objects, num, max_bytes)[0]
        depth += 1
    return v


# ---------------------------------------------------------------------------
# standard security handler (RC4, empty user password)
# ---------------------------------------------------------------------------

_PW_PAD = bytes([
    0x28, 0xBF, 0x4E, 0x5E, 0x4E, 0x75, 0x8A, 0x41,
    0x64, 0x00, 0x4E, 0x56, 0xFF, 0xFA, 0x01, 0x08,
    0x2E, 0x2E, 0x00, 0xB6, 0xD0, 0x68, 0x3E, 0x80,
    0x2F, 0x0C, 0xA9, 0xFE, 0x64, 0x53, 0x69, 0x7A,
])


try:  # native fast path (same bytes; RC4 output is standardized)
    from cryptography.hazmat.decrepit.ciphers.algorithms import (
        ARC4 as _ARC4,
    )
    from cryptography.hazmat.primitives.ciphers import Cipher as _Cipher
except ImportError:  # pragma: no cover - environment without the lib
    _ARC4 = None


def _rc4(key: bytes, data: bytes) -> bytes:
    """RC4 (ISO 32000-1 §7.6.2): OpenSSL-backed when `cryptography`
    is importable and the key size is one it accepts (PDF keys are
    5/10/16 bytes — all accepted), else pure-stdlib KSA + PRGA —
    both validated against the RFC 6229-style "Key"/"Plaintext"
    vector in tests."""
    if _ARC4 is not None:
        try:
            enc = _Cipher(_ARC4(key), mode=None).encryptor()
            return enc.update(data) + enc.finalize()
        except ValueError:  # key size outside OpenSSL's RC4 set
            pass
    S = list(range(256))
    j = 0
    klen = len(key)
    for i in range(256):
        j = (j + S[i] + key[i % klen]) & 0xFF
        S[i], S[j] = S[j], S[i]
    out = bytearray(len(data))
    i = j = 0
    for k, c in enumerate(data):
        i = (i + 1) & 0xFF
        j = (j + S[i]) & 0xFF
        S[i], S[j] = S[j], S[i]
        out[k] = c ^ S[(S[i] + S[j]) & 0xFF]
    return bytes(out)


def _pw_pad(pw: bytes) -> bytes:
    return (pw + _PW_PAD)[:32]


def _std_file_key(
    user_pw: bytes, o: bytes, p: int, id0: bytes, r: int,
    keylen: int, encrypt_metadata: bool = True,
) -> bytes:
    """Algorithm 2 (§7.6.3.3): the file encryption key from the
    (padded) user password, /O, /P and the first file identifier
    (R4: /EncryptMetadata false appends 0xFFFFFFFF)."""
    import hashlib

    h = hashlib.md5()
    h.update(_pw_pad(user_pw))
    h.update(o[:32])
    h.update((p & 0xFFFFFFFF).to_bytes(4, "little"))
    h.update(id0)
    if r >= 4 and not encrypt_metadata:
        h.update(b"\xff\xff\xff\xff")
    d = h.digest()
    if r >= 3:
        for _ in range(50):
            d = hashlib.md5(d[:keylen]).digest()
    return d[:keylen]


def _std_compute_o(
    owner_pw: bytes, user_pw: bytes, r: int, keylen: int
) -> bytes:
    """Algorithm 3: the /O value (writer side)."""
    import hashlib

    d = hashlib.md5(_pw_pad(owner_pw)).digest()
    if r >= 3:
        for _ in range(50):
            d = hashlib.md5(d).digest()
    key = d[:keylen]
    o = _rc4(key, _pw_pad(user_pw))
    if r >= 3:
        for i in range(1, 20):
            o = _rc4(bytes(k ^ i for k in key), o)
    return o


def _std_compute_u(key: bytes, id0: bytes, r: int) -> bytes:
    """Algorithms 4/5: the /U value for the given file key."""
    import hashlib

    if r == 2:
        return _rc4(key, _PW_PAD)
    x = _rc4(key, hashlib.md5(_PW_PAD + id0).digest())
    for i in range(1, 20):
        x = _rc4(bytes(k ^ i for k in key), x)
    return x + b"\x00" * 16


def _obj_rc4_key(key: bytes, num: int, gen: int) -> bytes:
    """Algorithm 1: the per-object RC4 key."""
    import hashlib

    d = hashlib.md5(
        key + num.to_bytes(3, "little") + gen.to_bytes(2, "little")
    ).digest()
    return d[: min(len(key) + 5, 16)]


import functools


@functools.lru_cache(maxsize=256)
def _hash_r6(pw: bytes, salt: bytes, udata: bytes, r: int) -> bytes:
    """ISO 32000-2 Algorithm 2.B (the R6 iterated KDF; R5 is the
    plain SHA-256). Deliberately memoized: the KDF runs 64+ AES-CBC
    rounds over a multi-KB buffer (~50 ms in pure Python), and a
    batch of same-source files re-derives identical (salt, pw)
    inputs — notably the fixture gate, where every worker pays the
    KDF once instead of per document."""
    import hashlib

    from geist_spark.operators._aes import aes_cbc_encrypt

    k = hashlib.sha256(pw + salt + udata).digest()
    if r == 5:
        return k
    i = 0
    while True:
        k1 = (pw + k + udata) * 64
        e = aes_cbc_encrypt(k[:16], k[16:32], k1)
        mod = sum(e[:16]) % 3
        k = (
            hashlib.sha256(e) if mod == 0
            else hashlib.sha384(e) if mod == 1
            else hashlib.sha512(e)
        ).digest()
        i += 1
        if i >= 64 and e[-1] <= i - 32:
            break
    return k[:32]


def _aes_obj_key(key: bytes, num: int, gen: int) -> bytes:
    """AESV2 per-object key: the RC4 derivation plus the 'sAlT'
    suffix (§7.6.2 Algorithm 1 step b)."""
    import hashlib

    d = hashlib.md5(
        key + num.to_bytes(3, "little") + gen.to_bytes(2, "little")
        + b"sAlT"
    ).digest()
    return d[: min(len(key) + 5, 16)]


def _decrypt_bytes(
    data: bytes, mode: str, key: bytes, num: int, gen: int
) -> bytes:
    if mode == "rc4":
        return _rc4(_obj_rc4_key(key, num, gen), data)
    from geist_spark.operators._aes import aes_cbc_decrypt

    k = _aes_obj_key(key, num, gen) if mode == "aesv2" else key
    if len(data) < 32 or len(data) % 16:
        raise ValueError(
            "malformed PDF: AES payload is not IV + padded blocks"
        )
    plain = aes_cbc_decrypt(k, data[:16], data[16:])
    pad = plain[-1]
    if not 1 <= pad <= 16 or plain[-pad:] != bytes([pad]) * pad:
        raise ValueError("malformed PDF: bad AES (PKCS#7) padding")
    return plain[:-pad]


def _decrypt_value(v, mode: str, key: bytes, num: int, gen: int):
    """Recursively decrypt every STRING in a parsed object value
    (names/numbers/refs untouched — only string objects are encrypted
    per §7.6.2)."""
    if isinstance(v, bytes):
        return _decrypt_bytes(v, mode, key, num, gen)
    if isinstance(v, list):
        return [_decrypt_value(x, mode, key, num, gen) for x in v]
    if isinstance(v, dict):
        return {
            k: _decrypt_value(x, mode, key, num, gen)
            for k, x in v.items()
        }
    return v


def _setup_decryption(trailer: dict, objects: dict, max_bytes: int):
    """Parse /Encrypt and install the decryption context in
    objects["__crypt__"] when the file uses the Standard handler
    with an EMPTY user password — the world-readable owner-locked
    PDFs that dominate real crawls. Supported: RC4 (V 1/2, R 2/3),
    AES-128 via the V4 /StdCF AESV2 crypt filter (R 4; a V2 CFM maps
    to the RC4 path), and AES-256 AESV3 (V 5, R 5/6 — the SHA-2
    KDF of ISO 32000-2 Algorithm 2.B, file key unwrapped from /UE).
    Non-empty user passwords, V4 files whose string/stream filters
    diverge or name an embedded-file-only crypt, and non-Standard
    handlers stay typed capability limits; a structurally bad
    /Encrypt dict is malformed."""
    enc_ref = trailer["Encrypt"]
    skip = None
    if isinstance(enc_ref, tuple) and enc_ref and enc_ref[0] == "ref":
        skip = enc_ref[1]
    enc = _resolve(enc_ref, objects, max_bytes)
    if not isinstance(enc, dict):
        raise ValueError("malformed PDF: /Encrypt is not a dict")
    if str(enc.get("Filter")) != "Standard":
        handler = enc.get("Filter")
        raise NotImplementedError(
            "encrypted PDF: non-Standard security handler "
            f"{handler!r} unsupported"
        )
    v = _resolve(enc.get("V", 0), objects, max_bytes)
    r = _resolve(enc.get("R", 0), objects, max_bytes)
    mode = "rc4"
    if v == 4 or v == 5:
        cf = _resolve(enc.get("CF"), objects, max_bytes)
        stmf = str(enc.get("StmF", _Name("Identity")))
        strf = str(enc.get("StrF", _Name("Identity")))
        if stmf != strf:
            raise NotImplementedError(
                "encrypted PDF: split string/stream crypt filters "
                f"(StmF={stmf}, StrF={strf}) unsupported"
            )
        if stmf == "Identity":
            cfm = "Identity"
        else:
            cfd = cf.get(stmf) if isinstance(cf, dict) else None
            cfd = _resolve(cfd, objects, max_bytes)
            if not isinstance(cfd, dict):
                raise ValueError(
                    f"malformed PDF: crypt filter {stmf} missing"
                )
            cfm = str(cfd.get("CFM"))
        if v == 4 and r == 4 and cfm in ("AESV2", "V2"):
            mode = "aesv2" if cfm == "AESV2" else "rc4"
        elif v == 5 and r in (5, 6) and cfm == "AESV3":
            mode = "aesv3"
        else:
            raise NotImplementedError(
                f"encrypted PDF: V={v} R={r} CFM={cfm} unsupported"
            )
    elif v not in (1, 2) or r not in (2, 3):
        raise NotImplementedError(
            f"encrypted PDF: only RC4 (V 1/2, R 2/3), AESV2 (V4 R4) "
            f"and AESV3 (V5 R5/6) supported, got V={v} R={r}"
        )
    if mode == "aesv3":
        o = enc.get("O")
        u = enc.get("U")
        ue = enc.get("UE")
        if not (
            isinstance(o, bytes) and isinstance(u, bytes)
            and isinstance(ue, bytes) and len(u) >= 48
            and len(ue) >= 32
        ):
            raise ValueError(
                "malformed PDF: AESV3 /Encrypt O/U/UE missing"
            )
        vsalt, ksalt = u[32:40], u[40:48]
        if _hash_r6(b"", vsalt, b"", r) != u[:32]:
            raise NotImplementedError(
                "encrypted PDF: non-empty user password required"
            )
        from geist_spark.operators._aes import aes_cbc_decrypt

        ikey = _hash_r6(b"", ksalt, b"", r)
        file_key = aes_cbc_decrypt(ikey, bytes(16), ue[:32])
        objects["__crypt__"] = ("aesv3", file_key, skip)
        return
    length = _resolve(enc.get("Length", 40), objects, max_bytes)
    if not isinstance(length, int) or length % 8 or not (
        40 <= length <= 128
    ):
        raise ValueError("malformed PDF: bad /Encrypt /Length")
    keylen = 5 if v == 1 else length // 8
    if mode == "aesv2":
        keylen = 16
    o = enc.get("O")
    u = enc.get("U")
    p = _resolve(enc.get("P"), objects, max_bytes)
    if not (
        isinstance(o, bytes) and isinstance(u, bytes)
        and isinstance(p, int)
    ):
        raise ValueError("malformed PDF: /Encrypt O/U/P missing")
    ids = trailer.get("ID")
    id0 = ids[0] if (
        isinstance(ids, list) and ids and isinstance(ids[0], bytes)
    ) else b""
    encrypt_metadata = _resolve(
        enc.get("EncryptMetadata", True), objects, max_bytes
    )
    key = _std_file_key(
        b"", o, p, id0, r, keylen,
        encrypt_metadata=bool(encrypt_metadata),
    )
    if r == 2:
        ok = _rc4(key, _PW_PAD) == u[:32]
    else:
        import hashlib

        x = _rc4(key, hashlib.md5(_PW_PAD + id0).digest())
        for i in range(1, 20):
            x = _rc4(bytes(k ^ i for k in key), x)
        ok = x == u[:16]
    if not ok:
        raise NotImplementedError(
            "encrypted PDF: non-empty user password required"
        )
    objects["__crypt__"] = (mode, key, skip)


def _load_object(objects: dict, num: int, max_bytes: int):
    """Parse 'N G obj … endobj' at the xref offset — or, for a
    compressed entry, extract the object from its object stream
    (PDF 1.5 /ObjStm) — returning (value, stream_bytes_or_None).
    Results memoized in objects[num]."""
    ent = objects[num]
    if isinstance(ent, tuple) and ent[0] == "parsed":
        return ent[1], ent[2]
    if isinstance(ent, tuple) and ent[0] == "loading":
        # a crafted xref can mark an object stream as itself stored
        # compressed (ObjStm N inside ObjStm N, or two ObjStms inside
        # each other); without this sentinel the mutual recursion
        # _load_object <-> _objstm_object escapes as an untyped
        # RecursionError instead of the module's ValueError contract
        raise ValueError(
            f"malformed PDF: object-stream cycle at object {num}"
        )
    if isinstance(ent, tuple) and ent[0] == "instream":
        objects[num] = ("loading",)
        try:
            val = _objstm_object(objects, ent[1], ent[2], num, max_bytes)
        except BaseException:
            objects[num] = ent
            raise
        objects[num] = ("parsed", val, None)
        return val, None
    b, off = ent
    lx = _Lexer(b, off)
    lx.skip_ws()
    w1 = lx.keyword()
    lx.skip_ws()
    w2 = lx.keyword()
    lx.skip_ws()
    w3 = lx.keyword()
    if not (w1.isdigit() and w2.isdigit() and w3 == "obj"):
        raise ValueError(
            f"malformed PDF: object {num} header at offset {off} is "
            f"{w1!r} {w2!r} {w3!r}"
        )
    if int(w1) != num:
        raise ValueError(
            f"malformed PDF: xref says object {num} at offset {off}, "
            f"found object {w1}"
        )
    val = _parse_value(lx, objects)
    stream = None
    lx.skip_ws()
    if lx.b[lx.i: lx.i + 6] == b"stream":
        lx.i += 6
        if lx.b[lx.i: lx.i + 2] == b"\r\n":
            lx.i += 2
        elif lx.b[lx.i: lx.i + 1] == b"\n":
            lx.i += 1
        if not isinstance(val, dict):
            raise ValueError("malformed PDF: stream without a dict")
        length = _resolve(val.get("Length"), objects, max_bytes)
        if not isinstance(length, int) or length < 0:
            raise ValueError("malformed PDF: stream /Length missing")
        if lx.i + length > len(lx.b):
            raise ValueError(
                f"truncated PDF: stream wants {length} bytes, "
                f"{len(lx.b) - lx.i} remain"
            )
        stream = lx.b[lx.i: lx.i + length]
    crypt = objects.get("__crypt__")
    if crypt is not None and num != crypt[2]:
        # strings and streams of TOP-LEVEL objects are encrypted;
        # object-stream members are covered by their container's
        # decryption and xref streams are never encrypted (both
        # bypass this path)
        mode, key = crypt[0], crypt[1]
        gen = int(w2)
        val = _decrypt_value(val, mode, key, num, gen)
        if stream is not None:
            stream = _decrypt_bytes(stream, mode, key, num, gen)
    objects[num] = ("parsed", val, stream)
    return val, stream


def _objstm_object(
    objects: dict, stm_num: int, idx: int, want: int, max_bytes: int
):
    """Extract object #idx from object stream `stm_num` (PDF 1.5
    §7.5.7): the decoded stream opens with /N pairs of
    'objnum offset' integers, then the bare object bodies at
    /First + offset. The header pair must name the object the xref
    claims lives there."""
    if stm_num not in objects:
        raise ValueError(
            f"malformed PDF: xref points into missing object stream "
            f"{stm_num}"
        )
    sdict, raw = _load_object(objects, stm_num, max_bytes)
    if not isinstance(sdict, dict) or raw is None:
        raise ValueError(
            f"malformed PDF: object stream {stm_num} has no stream"
        )
    if str(sdict.get("Type")) != "ObjStm":
        raise ValueError(
            f"malformed PDF: object {stm_num} is not /Type /ObjStm"
        )
    data = _decode_stream(sdict, raw, objects, max_bytes)
    n = _resolve(sdict.get("N"), objects, max_bytes)
    first = _resolve(sdict.get("First"), objects, max_bytes)
    if not isinstance(n, int) or not isinstance(first, int):
        raise ValueError(
            f"malformed PDF: object stream {stm_num} /N or /First"
        )
    if not 0 <= idx < n:
        raise ValueError(
            f"malformed PDF: object-stream index {idx} out of range"
        )
    lx = _Lexer(data)
    header = []
    for _ in range(2 * n):
        lx.skip_ws()
        tok = lx.keyword()
        if not tok.isdigit():
            raise ValueError(
                f"malformed PDF: object stream {stm_num} header"
            )
        header.append(int(tok))
    onum, ooff = header[2 * idx], header[2 * idx + 1]
    if onum != want:
        raise ValueError(
            f"malformed PDF: xref says object {want} at index {idx} of "
            f"stream {stm_num}, header says {onum}"
        )
    return _parse_value(_Lexer(data, first + ooff), objects)


def _png_predictor_undo(data: bytes, columns: int) -> bytes:
    """Undo PNG row predictors on an xref-stream payload (/Predictor
    >= 10, colors=1, bpc=8 — the shape xref streams use): each row is
    one filter-tag byte + `columns` bytes; Sub/Up/Average/Paeth per
    RFC 2083 with bpp=1."""
    rowlen = columns + 1
    if columns <= 0 or len(data) % rowlen:
        raise ValueError(
            "malformed PDF: predicted xref stream is not whole rows"
        )
    out = bytearray()
    prev = bytes(columns)
    for r in range(0, len(data), rowlen):
        tag = data[r]
        row = bytearray(data[r + 1 : r + rowlen])
        if tag == 0:
            pass
        elif tag == 1:  # Sub
            for x in range(1, columns):
                row[x] = (row[x] + row[x - 1]) & 0xFF
        elif tag == 2:  # Up
            for x in range(columns):
                row[x] = (row[x] + prev[x]) & 0xFF
        elif tag == 3:  # Average
            for x in range(columns):
                left = row[x - 1] if x else 0
                row[x] = (row[x] + (left + prev[x]) // 2) & 0xFF
        elif tag == 4:  # Paeth
            for x in range(columns):
                a = row[x - 1] if x else 0
                bb = prev[x]
                c = prev[x - 1] if x else 0
                pp = a + bb - c
                pa, pb, pc = abs(pp - a), abs(pp - bb), abs(pp - c)
                pred = a if (pa <= pb and pa <= pc) else (
                    bb if pb <= pc else c
                )
                row[x] = (row[x] + pred) & 0xFF
        else:
            raise ValueError(
                f"malformed PDF: unknown xref predictor tag {tag}"
            )
        out += row
        prev = bytes(row)
    return bytes(out)


def _xref_stream_section(
    b: bytes, off: int, offsets: dict, max_bytes: int
) -> dict:
    """Parse one PDF 1.5 cross-reference STREAM (§7.5.8) at `off`,
    adding first-seen-wins entries to `offsets` (type 1 -> (b, off),
    type 2 -> ('instream', stm, idx)). Returns the stream dict (it
    doubles as the trailer)."""
    import struct

    lx = _Lexer(b, off)
    lx.skip_ws()
    w1 = lx.keyword()
    lx.skip_ws()
    w2 = lx.keyword()
    lx.skip_ws()
    w3 = lx.keyword()
    if not (w1.isdigit() and w2.isdigit() and w3 == "obj"):
        raise ValueError(
            f"malformed PDF: no xref table or stream at offset {off}"
        )
    sdict = _parse_value(lx, offsets)
    lx.skip_ws()
    if not isinstance(sdict, dict) or str(sdict.get("Type")) != "XRef":
        raise ValueError(
            f"malformed PDF: object at startxref {off} is not "
            "/Type /XRef"
        )
    if lx.b[lx.i : lx.i + 6] != b"stream":
        raise ValueError("malformed PDF: xref stream has no stream")
    lx.i += 6
    if lx.b[lx.i : lx.i + 2] == b"\r\n":
        lx.i += 2
    elif lx.b[lx.i : lx.i + 1] == b"\n":
        lx.i += 1
    length = sdict.get("Length")
    if not isinstance(length, int) or length < 0:
        raise ValueError(
            "malformed PDF: xref stream /Length must be a direct "
            "integer"
        )
    if lx.i + length > len(b):
        raise ValueError("truncated PDF: xref stream body")
    raw = b[lx.i : lx.i + length]

    # inline filter handling: FlateDecode (+ optional PNG predictor)
    import zlib

    filt = sdict.get("Filter")
    parms = sdict.get("DecodeParms")
    data = raw
    if filt is not None:
        if str(filt) != "FlateDecode":
            raise NotImplementedError(
                f"xref stream filter /{filt} unsupported"
            )
        d = zlib.decompressobj()
        try:
            data = d.decompress(raw, max_bytes + 1)
        except zlib.error as exc:
            raise ValueError(
                f"malformed PDF: bad xref Flate stream: {exc}"
            ) from None
        if len(data) > max_bytes:
            raise ValueError(
                f"xref stream inflates past max_bytes={max_bytes}"
            )
    ws = sdict.get("W")
    if not (isinstance(ws, list) and len(ws) == 3
            and all(isinstance(x, int) and x >= 0 for x in ws)):
        raise ValueError("malformed PDF: xref stream /W")
    if isinstance(parms, dict):
        pred = parms.get("Predictor", 1)
        if pred >= 10:
            data = _png_predictor_undo(data, sum(ws))
        elif pred != 1:
            raise NotImplementedError(
                f"xref stream predictor {pred} unsupported"
            )
    size = sdict.get("Size")
    index = sdict.get("Index", [0, size if isinstance(size, int) else 0])
    if not (isinstance(index, list) and len(index) % 2 == 0
            and all(isinstance(x, int) for x in index)):
        raise ValueError("malformed PDF: xref stream /Index")
    rowlen = sum(ws)
    pos = 0

    def field(width: int, default: int) -> int:
        nonlocal pos
        if width == 0:
            return default
        v = int.from_bytes(data[pos : pos + width], "big")
        pos += width
        return v

    for k in range(0, len(index), 2):
        start, count = index[k], index[k + 1]
        for j in range(count):
            if pos + rowlen > len(data):
                raise ValueError("truncated PDF: xref stream entries")
            typ = field(ws[0], 1)
            f2 = field(ws[1], 0)
            f3 = field(ws[2], 0)
            num = start + j
            if num in offsets:
                continue  # first-seen wins across /Prev chain
            if typ == 1:
                offsets[num] = (b, f2)
            elif typ == 2:
                offsets[num] = ("instream", f2, f3)
            # typ 0 (free) and unknown types: skip (per spec, readers
            # ignore entry types they don't understand)
    return sdict


def _decode_stream(
    sdict: dict, raw: bytes, objects: dict, max_bytes: int
) -> bytes:
    """Apply the stream filter chain. FlateDecode (bounded stdlib
    zlib) and unfiltered only; predictors and every other filter are
    capability limits."""
    import zlib

    filt = _resolve(sdict.get("Filter"), objects, max_bytes)
    if filt is None:
        return raw
    filters = filt if isinstance(filt, list) else [filt]
    parms = _resolve(sdict.get("DecodeParms"), objects, max_bytes)
    if parms is not None:
        plist = parms if isinstance(parms, list) else [parms]
        for p in plist:
            p = _resolve(p, objects, max_bytes)
            if isinstance(p, dict) and p.get("Predictor", 1) != 1:
                raise NotImplementedError(
                    "PDF stream predictor unsupported"
                )
    data = raw
    for f in filters:
        f = _resolve(f, objects, max_bytes)
        if str(f) != "FlateDecode":
            raise NotImplementedError(
                f"PDF stream filter /{f} unsupported (FlateDecode only)"
            )
        d = zlib.decompressobj()
        try:
            data = d.decompress(data, max_bytes + 1)
        except zlib.error as exc:
            raise ValueError(
                f"malformed PDF: bad Flate stream: {exc}"
            ) from None
        if len(data) > max_bytes:
            raise ValueError(
                f"PDF stream inflates past max_bytes={max_bytes}"
            )
    return data


def _xref_offsets(b: bytes, max_bytes: int) -> tuple[dict, dict]:
    """Walk startxref -> cross-reference section(s) following /Prev,
    parsing BOTH kinds for real: classic 'xref' tables and PDF 1.5
    compressed xref STREAMs ('N 0 obj' at the startxref target,
    via _xref_stream_section), including hybrid-reference files whose
    classic trailer carries an /XRefStm companion. Returns
    ({obj_num: (b, offset) | ('instream', stm, idx)}, trailer_dict);
    everything structurally wrong raises ValueError."""
    tail = b[-256:]
    k = tail.rfind(b"startxref")
    if k < 0:
        raise ValueError("malformed PDF: no startxref")
    lx = _Lexer(tail, k + len(b"startxref"))
    lx.skip_ws()
    off_tok = lx.keyword()
    if not off_tok.isdigit():
        raise ValueError("malformed PDF: bad startxref offset")
    offsets: dict = {}
    trailer: dict = {}
    next_off = int(off_tok)
    seen = set()
    while True:
        if next_off in seen:
            raise ValueError("malformed PDF: xref /Prev loop")
        seen.add(next_off)
        if next_off < 0 or next_off >= len(b):
            raise ValueError("malformed PDF: xref offset past EOF")
        lx = _Lexer(b, next_off)
        lx.skip_ws()
        if b[lx.i: lx.i + 4] != b"xref":
            # PDF 1.5+: the startxref target is an 'N 0 obj'
            # cross-reference STREAM — parse it for real
            t = _xref_stream_section(b, lx.i, offsets, max_bytes)
            if not trailer:
                trailer = t
            prev = t.get("Prev")
            if prev is None:
                return offsets, trailer
            if not isinstance(prev, int):
                raise ValueError("malformed PDF: non-integer /Prev")
            next_off = prev
            continue
        lx.i += 4
        while True:
            lx.skip_ws()
            if b[lx.i: lx.i + 7] == b"trailer":
                lx.i += 7
                break
            start_tok = lx.keyword()
            lx.skip_ws()
            count_tok = lx.keyword()
            if not (start_tok.isdigit() and count_tok.isdigit()):
                raise ValueError(
                    "malformed PDF: bad xref subsection header"
                )
            start, count = int(start_tok), int(count_tok)
            lx.skip_ws()
            for j in range(count):
                ent = b[lx.i: lx.i + 20]
                if len(ent) < 18:
                    raise ValueError(
                        "truncated PDF: xref entry past EOF"
                    )
                try:
                    off = int(ent[0:10])
                    kind = chr(ent[17])
                except ValueError:
                    raise ValueError(
                        f"malformed PDF: bad xref entry {ent!r}"
                    ) from None
                num = start + j
                # first-seen wins: later /Prev sections are OLDER
                if kind == "n" and num not in offsets:
                    offsets[num] = (b, off)
                lx.i += 20 if len(ent) == 20 else len(ent)
        t = _parse_value(lx, offsets)
        if not isinstance(t, dict):
            raise ValueError("malformed PDF: trailer is not a dict")
        if not trailer:
            trailer = t
        xstm = t.get("XRefStm")
        if isinstance(xstm, int):
            # hybrid-reference file (§7.5.8.4): a classic section's
            # companion xref STREAM carries the compressed-object
            # entries; classic entries win on conflict (first-seen —
            # well-formed hybrids never conflict, the stream only
            # lists objects the table omits)
            _xref_stream_section(b, xstm, offsets, max_bytes)
        prev = t.get("Prev")
        if prev is None:
            return offsets, trailer
        if not isinstance(prev, int):
            raise ValueError("malformed PDF: non-integer /Prev")
        next_off = prev


def _content_text(data: bytes, fonts: dict | None = None) -> str:
    """Assemble page text from a decoded content stream: Tj/TJ/'/"
    shows, Td/TD/T*/BT line breaks (only when the current line is
    non-empty), shown bytes decoded through the CURRENT font's show
    decoder (tracked via Tf): WinAnsi (cp1252, replace) for simple
    fonts, 2-byte-CID ToUnicode lookup for Identity-H Type0 fonts
    (_page_fonts). Before any Tf — or for a font name the resources
    don't declare — the simple-font decode applies. Inline images
    (BI…EI) are skipped; every other operator just clears the
    operand stack."""
    lines = [""]
    operands: list = []
    lx = _Lexer(data)
    n = len(data)
    cur_show = _simple_show

    def newline() -> None:
        if lines[-1] != "":
            lines.append("")

    def show(raw: bytes) -> None:
        lines[-1] += cur_show(raw)

    while True:
        lx.skip_ws()
        if lx.i >= n:
            break
        c = data[lx.i]
        if c == 0x28:
            operands.append(lx.lit_string())
        elif c == 0x3C:
            if data[lx.i: lx.i + 2] == b"<<":
                operands.append(_parse_value(lx, None))
            else:
                operands.append(lx.hex_string())
        elif c == 0x5B:
            operands.append(_parse_value(lx, None))
        elif c == 0x2F:
            operands.append(lx.name())
        elif c in b"+-.0123456789":
            m = _RE_NUM_RUN.match(data, lx.i)
            operands.append(m.group())
            lx.i = m.end()
        elif c == 0x5D or c == 0x3E:  # stray ] or > — damage
            raise ValueError("malformed PDF: unbalanced content token")
        else:
            op = lx.keyword()
            if not op:
                raise ValueError(
                    f"malformed PDF: bad content byte {c:#x}"
                )
            if op == "Tj":
                if operands and isinstance(operands[-1], bytes):
                    show(operands[-1])
            elif op == "TJ":
                if operands and isinstance(operands[-1], list):
                    for item in operands[-1]:
                        if isinstance(item, bytes):
                            show(item)
            elif op == "'":
                newline()
                if operands and isinstance(operands[-1], bytes):
                    show(operands[-1])
            elif op == '"':
                newline()
                if operands and isinstance(operands[-1], bytes):
                    show(operands[-1])
            elif op == "Tf":
                if (
                    fonts is not None
                    and len(operands) >= 2
                    and isinstance(operands[-2], _Name)
                ):
                    cur_show = fonts.get(
                        str(operands[-2]), _simple_show
                    )
            elif op in ("Td", "TD", "T*", "BT"):
                newline()
            elif op == "BI":
                j = data.find(b"EI", lx.i)
                if j < 0:
                    raise ValueError(
                        "malformed PDF: unterminated inline image"
                    )
                lx.i = j + 2
            operands = []
    while lines and lines[-1] == "":
        lines.pop()
    return "\n".join(lines)


def _simple_show(raw: bytes) -> str:
    """Simple-font show decode: WinAnsi (cp1252, replace) — the
    module's single-byte dialect."""
    return raw.decode("cp1252", errors="replace")


def _tounicode_map(data: bytes) -> dict[int, str]:
    """Parse a /ToUnicode CMap stream (ISO 32000-1 §9.10.3, Adobe
    CMap grammar) into {CID: unicode_string}. Handles beginbfchar
    pairs, beginbfrange with an incrementing destination (last
    UTF-16 code unit steps, per the spec's 'last byte' rule) or an
    explicit destination array, multi-code-unit destinations
    (ligatures, non-BMP via surrogate pairs), and skips the
    PostScript framing (findresource/dict/def) plus CIDSystemInfo
    dicts. Oversized or self-inconsistent maps raise ValueError."""
    lx = _Lexer(data)
    n = len(data)
    mapping: dict[int, str] = {}

    def next_token():
        lx.skip_ws()
        if lx.i >= n:
            return None
        c = data[lx.i]
        if c == 0x25:  # % comment — skip to EOL
            j = lx.i
            while j < n and data[j] not in b"\r\n":
                j += 1
            lx.i = j
            return next_token()
        if c == 0x28:
            return ("str", lx.lit_string())
        if c == 0x3C:
            if data[lx.i: lx.i + 2] == b"<<":
                _parse_value(lx, None)  # CIDSystemInfo etc — skipped
                return ("dict", None)
            return ("hex", lx.hex_string())
        if c == 0x5B:
            lx.i += 1
            items = []
            while True:
                lx.skip_ws()
                if lx.i >= n:
                    raise ValueError(
                        "malformed CMap: unterminated array"
                    )
                if data[lx.i] == 0x5D:
                    lx.i += 1
                    return ("arr", items)
                t = next_token()
                if t is None or t[0] != "hex":
                    raise ValueError(
                        "malformed CMap: bfrange array holds a "
                        "non-hex-string element"
                    )
                items.append(t[1])
        if c == 0x2F:
            return ("name", str(lx.name()))
        if c in b"+-.0123456789":
            m = _RE_NUM_RUN.match(data, lx.i)
            lx.i = m.end()
            return ("num", m.group())
        kw = lx.keyword()
        if not kw:
            raise ValueError(
                f"malformed CMap: bad byte {c:#x} at {lx.i}"
            )
        return ("kw", kw)

    def dst_text(dst: bytes) -> str:
        if len(dst) % 2:
            raise ValueError(
                "malformed CMap: odd-length UTF-16BE destination"
            )
        return dst.decode("utf-16-be", errors="replace")

    def add(cid: int, text: str) -> None:
        if len(mapping) >= (1 << 20):
            raise ValueError("malformed CMap: mapping too large")
        mapping.setdefault(cid, text)  # first definition wins

    while True:
        t = next_token()
        if t is None:
            break
        if t[0] != "kw":
            continue
        kw = t[1]
        if kw == "beginbfchar":
            while True:
                a = next_token()
                if a is None:
                    raise ValueError(
                        "malformed CMap: unterminated bfchar block"
                    )
                if a == ("kw", "endbfchar"):
                    break
                b2 = next_token()
                if a[0] != "hex" or b2 is None or b2[0] != "hex":
                    raise ValueError(
                        "malformed CMap: bfchar entry is not a "
                        "hex-string pair"
                    )
                add(int.from_bytes(a[1], "big"), dst_text(b2[1]))
        elif kw == "beginbfrange":
            while True:
                a = next_token()
                if a is None:
                    raise ValueError(
                        "malformed CMap: unterminated bfrange block"
                    )
                if a == ("kw", "endbfrange"):
                    break
                b2 = next_token()
                c3 = next_token()
                if (
                    a[0] != "hex"
                    or b2 is None or b2[0] != "hex"
                    or c3 is None or c3[0] not in ("hex", "arr")
                ):
                    raise ValueError(
                        "malformed CMap: bfrange entry is not "
                        "(hex, hex, hex|array)"
                    )
                lo = int.from_bytes(a[1], "big")
                hi = int.from_bytes(b2[1], "big")
                if hi < lo or hi - lo > 0xFFFF:
                    raise ValueError(
                        f"malformed CMap: bad bfrange {lo:#x}..{hi:#x}"
                    )
                if c3[0] == "arr":
                    if len(c3[1]) != hi - lo + 1:
                        raise ValueError(
                            "malformed CMap: bfrange array length "
                            "disagrees with the code range"
                        )
                    for k, dst in enumerate(c3[1]):
                        add(lo + k, dst_text(dst))
                else:
                    dst = c3[1]
                    if len(dst) < 2 or len(dst) % 2:
                        raise ValueError(
                            "malformed CMap: bfrange destination "
                            "shorter than one UTF-16 code unit"
                        )
                    prefix, last = dst[:-2], int.from_bytes(
                        dst[-2:], "big"
                    )
                    if last + (hi - lo) > 0xFFFF:
                        raise ValueError(
                            "malformed CMap: bfrange destination "
                            "overflows its last code unit"
                        )
                    for k in range(hi - lo + 1):
                        add(
                            lo + k,
                            dst_text(
                                prefix
                                + (last + k).to_bytes(2, "big")
                            ),
                        )
    return mapping


def _cid_shower(mapping: dict[int, str]):
    """Decoder for Identity-H shows: 2-byte big-endian CIDs through
    the ToUnicode map; unmapped CIDs become U+FFFD (same 'replace'
    dialect as the cp1252 simple-font path); an odd trailing byte is
    structural damage."""

    def show(raw: bytes) -> str:
        if len(raw) % 2:
            raise ValueError(
                "malformed PDF: CID show string has an odd length"
            )
        get = mapping.get
        return "".join(
            [get(c, "�")
             for c in struct.unpack(f">{len(raw) >> 1}H", raw)]
        )

    return show


def _page_fonts(res, objects: dict, max_bytes: int) -> dict:
    """Map each page-resource font name to its show decoder. Simple
    fonts (Type1/TrueType/Type3) decode as WinAnsi. Composite (Type0)
    fonts are supported when /Encoding is Identity-H or Identity-V
    (fixed 2-byte CIDs) AND a /ToUnicode CMap stream is present —
    that covers the modern majority (every PDF produced by word
    processors / browsers with embedded subset fonts); a Type0 font
    with a named non-Identity CMap or without ToUnicode stays a typed
    capability limit (its bytes are glyph indexes with no recoverable
    text)."""
    res = _resolve(res, objects, max_bytes)
    if not isinstance(res, dict):
        return {}
    fonts = _resolve(res.get("Font"), objects, max_bytes)
    if not isinstance(fonts, dict):
        return {}
    out: dict = {}
    for fname, fval in fonts.items():
        fd = _resolve(fval, objects, max_bytes)
        if not (
            isinstance(fd, dict) and str(fd.get("Subtype")) == "Type0"
        ):
            out[str(fname)] = _simple_show
            continue
        enc = fd.get("Encoding")
        if not (
            isinstance(enc, _Name)
            and str(enc) in ("Identity-H", "Identity-V")
        ):
            raise NotImplementedError(
                "composite (Type0/CMap) font with non-Identity "
                f"encoding {enc!r} unsupported — code widths are "
                "defined by an embedded CMap program"
            )
        tu = fd.get("ToUnicode")
        if not (isinstance(tu, tuple) and tu and tu[0] == "ref"):
            raise NotImplementedError(
                "composite (Type0/CMap) font without a /ToUnicode "
                "CMap unsupported — shown bytes are CID indexes "
                "with no Unicode mapping"
            )
        num = tu[1]
        if num not in objects:
            raise ValueError(
                f"malformed PDF: dangling /ToUnicode reference {num}"
            )
        sdict, raw = _load_object(objects, num, max_bytes)
        if raw is None or not isinstance(sdict, dict):
            raise ValueError(
                "malformed PDF: /ToUnicode is not a stream"
            )
        data = _decode_stream(sdict, raw, objects, max_bytes)
        out[str(fname)] = _cid_shower(_tounicode_map(data))
    return out


def _pdf_pages(b: bytes, max_bytes: int):
    """Yield (page_index, page_text) for a classic-xref PDF."""
    if b[:5] != b"%PDF-":
        raise NotImplementedError("payload is not a PDF (no %PDF- magic)")
    objects, trailer = _xref_offsets(b, max_bytes)
    if "Encrypt" in trailer:
        _setup_decryption(trailer, objects, max_bytes)
    root = _resolve(trailer.get("Root"), objects, max_bytes)
    if not isinstance(root, dict):
        raise ValueError("malformed PDF: trailer /Root missing")
    pages_root = _resolve(root.get("Pages"), objects, max_bytes)
    if not isinstance(pages_root, dict):
        raise ValueError("malformed PDF: catalog /Pages missing")

    idx = 0
    stack = [(pages_root, pages_root.get("Resources"), 0)]
    while stack:
        node, inherited_res, depth = stack.pop()
        if depth > 64:
            raise ValueError("malformed PDF: page tree too deep")
        ntype = str(node.get("Type", ""))
        res = node.get("Resources", inherited_res)
        if ntype == "Pages" or "Kids" in node:
            kids = _resolve(node.get("Kids"), objects, max_bytes)
            if not isinstance(kids, list):
                raise ValueError("malformed PDF: /Kids is not an array")
            for kid in reversed(kids):
                kd = _resolve(kid, objects, max_bytes)
                if not isinstance(kd, dict):
                    raise ValueError(
                        "malformed PDF: page-tree kid is not a dict"
                    )
                stack.append((kd, res, depth + 1))
            continue
        # a leaf page
        fonts = _page_fonts(res, objects, max_bytes)
        contents = node.get("Contents")
        parts: list[bytes] = []
        if contents is not None:
            clist = _resolve(contents, objects, max_bytes)
            refs = clist if isinstance(clist, list) else [contents]
            for ref in refs:
                if isinstance(ref, tuple) and ref and ref[0] == "ref":
                    num = ref[1]
                    if num not in objects:
                        raise ValueError(
                            f"malformed PDF: dangling /Contents {num}"
                        )
                    sdict, raw = _load_object(objects, num, max_bytes)
                else:
                    raise ValueError(
                        "malformed PDF: /Contents entry is not a "
                        "stream reference"
                    )
                if raw is None:
                    raise ValueError(
                        "malformed PDF: /Contents object has no stream"
                    )
                parts.append(
                    _decode_stream(sdict, raw, objects, max_bytes)
                )
        yield idx, _content_text(b"\n".join(parts), fonts)
        idx += 1


def pdf_extract_text(
    files: DataFrame,
    payload_col: str = "payload",
    id_col: str = "file_id",
    max_bytes: int = 64 * 1024 * 1024,
    on_unsupported: str = "error",
) -> DataFrame:
    """PDF -> one row per page: (file_id, page, text, n_chars).

    Classic-xref object walk + FlateDecode (bounded stdlib zlib) +
    BT/ET text-operator assembly, simple fonts as WinAnsi and
    Identity-H Type0 fonts through their /ToUnicode CMap — see the
    module docstring for the exact scope and dialect. Two-tier
    errors: non-PDF payloads, PASSWORDED PDFs (RC4/AESV2/AESV3
    with an empty user password decrypt for real), non-Flate
    filters, content predictors, and Type0 fonts without Identity
    encoding + ToUnicode are CAPABILITY limits (raise naming the id,
    or skip the file under on_unsupported='null'); structural damage
    (bad xref, dangling refs, truncated streams, unbalanced tokens)
    always raises ValueError.

    One Arrow mapInPandas stage, page fan-out inside the batch, zero
    shuffle (the archive_extract_text shape).
    """
    import pandas as pd

    if on_unsupported not in ("error", "null"):
        raise ValueError("on_unsupported must be 'error' or 'null'")
    if max_bytes <= 0:
        raise ValueError("max_bytes must be positive")

    def run(batches):
        for pdf in batches:
            rows = {k: [] for k in ("file_id", "page", "text", "n_chars")}
            for fid, payload in zip(pdf[id_col], pdf[payload_col]):
                if payload is None:
                    continue
                try:
                    pages = list(_pdf_pages(bytes(payload), max_bytes))
                except NotImplementedError as exc:
                    if on_unsupported == "error":
                        raise NotImplementedError(
                            f"{id_col}={fid}: {exc}"
                        ) from exc
                    continue
                for idx, text in pages:
                    rows["file_id"].append(fid)
                    rows["page"].append(idx)
                    rows["text"].append(text)
                    rows["n_chars"].append(len(text))
            yield pd.DataFrame(rows)

    return files.mapInPandas(run, PDF_TEXT_SCHEMA)


# ---------------------------------------------------------------------------
# fixture writer (tests + the w_pdf_extract gate — NOT a public operator)
# ---------------------------------------------------------------------------


def _pdf_escape(s: str) -> bytes:
    """Encode text for a literal string: WinAnsi bytes with ( ) \\
    escaped; a '\\n' in the input becomes an explicit \\n escape.
    One whole-string encode + chained replaces (backslash first so
    inserted escapes are never re-escaped) — byte-identical to the
    historical per-character loop, without 200+ str.encode calls per
    line (the build profile's top entry)."""
    b = s.encode("cp1252", errors="replace")
    return (
        b.replace(b"\\", b"\\\\")
        .replace(b"(", b"\\(")
        .replace(b")", b"\\)")
        .replace(b"\n", b"\\n")
    )


def content_ops(lines: list[str], use_tj_array: bool = False) -> bytes:
    """Content stream showing `lines`, one per output line: first line
    via Td + Tj (or a kerned TJ array split mid-line when
    use_tj_array), the rest via T* + Tj."""
    parts = [b"BT /F1 12 Tf 72 720 Td "]
    for k, ln in enumerate(lines):
        if k > 0:
            parts.append(b"T* ")
        if use_tj_array and len(ln) > 1:
            mid = len(ln) // 2
            parts.append(
                b"[(" + _pdf_escape(ln[:mid]) + b") -250 ("
                + _pdf_escape(ln[mid:]) + b")] TJ "
            )
        else:
            parts.append(b"(" + _pdf_escape(ln) + b") Tj ")
    parts.append(b"ET")
    return b"".join(parts)


def _type0_cidmap(pages: list[list[str]]) -> dict[str, int]:
    """Assign CIDs 1..N to the document's characters in codepoint
    order — deliberately NOT ord(ch), so a reader that assumes
    Identity CID==Unicode silently fails the round-trip."""
    chars = sorted({ch for lines in pages for ln in lines for ch in ln})
    if len(chars) > 0xFFFE:
        raise ValueError("type0 fixture: too many distinct characters")
    return {ch: 1 + i for i, ch in enumerate(chars)}


def type0_content_ops(lines: list[str], cidmap: dict[str, int]) -> bytes:
    """Content stream for a Type0/Identity-H page: shows are HEX
    strings of 2-byte CIDs (the composite-font dialect); first line
    split across a kerned TJ array to exercise hex-in-array shows."""

    def hexshow(s: str) -> bytes:
        return (
            b"<"
            + "".join("%04X" % cidmap[ch] for ch in s).encode()
            + b">"
        )

    parts = [b"BT /F1 12 Tf 72 720 Td "]
    for k, ln in enumerate(lines):
        if k > 0:
            parts.append(b"T* ")
        if k == 0 and len(ln) > 1:
            mid = len(ln) // 2
            parts.append(
                b"[" + hexshow(ln[:mid]) + b" -250 "
                + hexshow(ln[mid:]) + b"] TJ "
            )
        else:
            parts.append(hexshow(ln) + b" Tj ")
    parts.append(b"ET")
    return b"".join(parts)


def _tounicode_cmap(cidmap: dict[str, int]) -> bytes:
    """Emit the /ToUnicode CMap for a fixture cidmap: maximal
    contiguous (CID, codepoint) runs of >=3 as beginbfrange entries
    (incrementing destination), the rest as beginbfchar pairs —
    blocks capped at 100 entries per the CMap spec. Non-BMP
    characters always go through bfchar (their UTF-16BE destination
    is a surrogate pair, which the range increment rule can't
    express)."""
    items = sorted(cidmap.items(), key=lambda kv: kv[1])
    runs: list[tuple[int, int, int]] = []
    singles: list[tuple[str, int]] = []
    i = 0
    while i < len(items):
        j = i
        if ord(items[i][0]) <= 0xFFFF:
            while (
                j + 1 < len(items)
                and ord(items[j + 1][0]) <= 0xFFFF
                and ord(items[j + 1][0]) == ord(items[j][0]) + 1
                and items[j + 1][1] == items[j][1] + 1
            ):
                j += 1
        if j - i + 1 >= 3:
            runs.append((items[i][1], items[j][1], ord(items[i][0])))
        else:
            singles.extend(items[i: j + 1])
        i = j + 1

    out = bytearray()
    out += b"/CIDInit /ProcSet findresource begin\n12 dict begin\n"
    out += b"begincmap\n"
    out += (
        b"/CIDSystemInfo << /Registry (Adobe) /Ordering (UCS) "
        b"/Supplement 0 >> def\n"
    )
    out += b"/CMapName /Adobe-Identity-UCS def\n/CMapType 2 def\n"
    out += b"1 begincodespacerange\n<0000> <FFFF>\nendcodespacerange\n"
    for k in range(0, len(singles), 100):
        blk = singles[k: k + 100]
        out += b"%d beginbfchar\n" % len(blk)
        for ch, cid in blk:
            dst = ch.encode("utf-16-be").hex().upper().encode()
            out += b"<%04X> <" % cid + dst + b">\n"
        out += b"endbfchar\n"
    for k in range(0, len(runs), 100):
        blk = runs[k: k + 100]
        out += b"%d beginbfrange\n" % len(blk)
        for lo, hi, o in blk:
            out += b"<%04X> <%04X> <%04X>\n" % (lo, hi, o)
        out += b"endbfrange\n"
    out += b"endcmap\n"
    out += b"CMapName currentdict /CMap defineresource pop\nend\nend"
    return bytes(out)


def pdf_build(
    page_streams: list[bytes],
    flate: bool = False,
    indirect_length: bool = False,
    font_subtype: str = "Type1",
    encrypt: bool = False,
    two_xref_sections: bool = False,
    contents_array: bool = False,
    xref_stream: bool = False,
    objstm: bool = False,
    predictor: bool = False,
    type0_pages: list[list[str]] | None = None,
    encrypt_rc4: int | None = None,
    encrypt_aes: int | None = None,
) -> bytes:
    """Minimal classic-xref PDF writer — the zipfile/tarfile
    cross-validation pattern from the archive gates: fixtures are
    built by independent code, byte offsets computed for real, so a
    reader bug can't cancel against a writer bug. Options cover the
    reader's branch points: Flate vs plain streams, indirect /Length,
    bare Type0 font (capability fixture via font_subtype), /Encrypt
    stub, a two-section xref chained with /Prev, and — via
    type0_pages (a list of line-lists, superseding page_streams) — a
    REAL composite font: Type0/Identity-H with a CIDFontType2
    descendant and a generated /ToUnicode CMap, content shown as
    2-byte-CID hex strings (type0_content_ops)."""
    import hashlib
    import zlib

    crypt_mode = None
    crypt_key = None
    enc_extra = b""
    if encrypt_rc4 is not None and encrypt_aes is not None:
        raise ValueError("encrypt_rc4 and encrypt_aes are exclusive")
    if encrypt_rc4 is not None:
        if encrypt_rc4 not in (2, 3):
            raise ValueError("encrypt_rc4 must be revision 2 or 3")
        if xref_stream or encrypt:
            raise ValueError(
                "encrypt_rc4 is exclusive with xref_stream/encrypt "
                "in this fixture writer"
            )
    if encrypt_aes is not None:
        if encrypt_aes not in (4, 5):
            raise ValueError("encrypt_aes must be V 4 (AESV2 R4) "
                             "or 5 (AESV3 R6)")
        if xref_stream or encrypt:
            raise ValueError(
                "encrypt_aes is exclusive with xref_stream/encrypt "
                "in this fixture writer"
            )

    cidmap: dict[str, int] = {}
    if type0_pages is not None:
        cidmap = _type0_cidmap(type0_pages)
        page_streams = [
            type0_content_ops(lines, cidmap) for lines in type0_pages
        ]
    n_pages = len(page_streams)
    if encrypt_rc4 is not None:
        r = encrypt_rc4
        keylen = 5 if r == 2 else 16
        id0 = hashlib.md5(
            b"".join(page_streams) + bytes([r])
        ).digest()
        o_val = _std_compute_o(b"owner", b"", r, keylen)
        crypt_key = _std_file_key(b"", o_val, -1, id0, r, keylen)
        u_val = _std_compute_u(crypt_key, id0, r)
        crypt_mode = "rc4"
    elif encrypt_aes == 4:
        keylen = 16
        id0 = hashlib.md5(
            b"".join(page_streams) + b"aes4"
        ).digest()
        o_val = _std_compute_o(b"owner", b"", 4, keylen)
        crypt_key = _std_file_key(b"", o_val, -1, id0, 4, keylen)
        u_val = _std_compute_u(crypt_key, id0, 4)
        crypt_mode = "aesv2"
    elif encrypt_aes == 5:
        from geist_spark.operators._aes import aes_cbc_encrypt

        # a CONSTANT seed across fixtures: the R6 KDF costs ~250 ms
        # per distinct salt even table-driven, and _hash_r6's memo
        # only pays off when the gate's documents share the
        # credential block (content still varies per document)
        seed = hashlib.md5(b"geist-aes5-fixture").digest()
        crypt_key = hashlib.sha256(seed).digest()  # the FILE key
        vsalt = seed[:8]
        ksalt = seed[8:16]
        u_val = _hash_r6(b"", vsalt, b"", 6) + vsalt + ksalt
        ue_val = aes_cbc_encrypt(
            _hash_r6(b"", ksalt, b"", 6), bytes(16), crypt_key
        )
        ovsalt = hashlib.md5(seed + b"ov").digest()[:8]
        oksalt = hashlib.md5(seed + b"ok").digest()[:8]
        o_val = (
            _hash_r6(b"owner", ovsalt, u_val, 6) + ovsalt + oksalt
        )
        oe_val = aes_cbc_encrypt(
            _hash_r6(b"owner", oksalt, u_val, 6), bytes(16), crypt_key
        )
        from geist_spark.operators._aes import aes_encrypt_block

        perms = aes_encrypt_block(
            crypt_key,
            (0xFFFFFFFF).to_bytes(4, "little") + b"\xff\xff\xff\xff"
            + b"T" + b"adb" + b"geis",
        )
        crypt_mode = "aesv3"
    objs: dict[int, bytes] = {}
    font_num = 3 + 2 * n_pages
    kid_nums = [3 + 2 * i for i in range(n_pages)]
    objs[1] = b"<< /Type /Catalog /Pages 2 0 R >>"
    kids = b" ".join(b"%d 0 R" % k for k in kid_nums)
    objs[2] = (
        b"<< /Type /Pages /Kids [" + kids + b"] /Count %d >>" % n_pages
    )
    sec_nums = (
        {i: font_num + 1 + i for i in range(n_pages)}
        if contents_array else {}
    )
    next_extra = font_num + 1 + (n_pages if contents_array else 0)

    stream_nums: set[int] = set()

    def stream_obj(num: int, stream: bytes) -> None:
        nonlocal next_extra
        stream_nums.add(num)
        data = zlib.compress(stream) if flate else stream
        if crypt_key is not None:
            # encryption is the OUTERMOST layer: applied after all
            # stream filters (readers decrypt, then inflate)
            if crypt_mode == "rc4":
                data = _rc4(_obj_rc4_key(crypt_key, num, 0), data)
            else:
                from geist_spark.operators._aes import aes_cbc_encrypt

                k = (
                    _aes_obj_key(crypt_key, num, 0)
                    if crypt_mode == "aesv2" else crypt_key
                )
                iv = hashlib.md5(b"iv%d" % num).digest()[:16]
                pad = 16 - len(data) % 16
                data = iv + aes_cbc_encrypt(
                    k, iv, data + bytes([pad]) * pad
                )
        filt = b"/Filter /FlateDecode " if flate else b""
        if indirect_length:
            objs[next_extra] = b"%d" % len(data)
            ldict = b"/Length %d 0 R" % next_extra
            next_extra += 1
        else:
            ldict = b"/Length %d" % len(data)
        objs[num] = (
            b"<< " + filt + ldict + b" >>\nstream\n" + data
            + b"\nendstream"
        )

    for i, stream in enumerate(page_streams):
        pnum, cnum = kid_nums[i], kid_nums[i] + 1
        # spaces OUTSIDE string literals are the only legal split
        # points for a /Contents array (§7.7.3.3: the concatenation
        # must form a valid token stream)
        cut = -1
        if contents_array:
            depth, best = 0, -1
            for j, ch in enumerate(stream):
                if ch == 0x5C and depth > 0:
                    continue  # next char is escaped; depth unchanged
                if ch == 0x28 and (j == 0 or stream[j - 1] != 0x5C):
                    depth += 1
                elif ch == 0x29 and stream[j - 1] != 0x5C:
                    depth -= 1
                elif ch == 0x20 and depth == 0:
                    if best < 0 or abs(j - len(stream) // 2) < abs(
                        best - len(stream) // 2
                    ):
                        best = j
            cut = best
        if contents_array and cut > 0:
            objs[pnum] = (
                b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
                b"/Resources << /Font << /F1 %d 0 R >> >> "
                b"/Contents [%d 0 R %d 0 R] >>"
                % (font_num, cnum, sec_nums[i])
            )
            stream_obj(cnum, stream[:cut])
            stream_obj(sec_nums[i], stream[cut + 1:])
        else:
            objs[pnum] = (
                b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
                b"/Resources << /Font << /F1 %d 0 R >> >> "
                b"/Contents %d 0 R >>" % (font_num, cnum)
            )
            stream_obj(cnum, stream)
    if type0_pages is not None:
        desc_num = next_extra
        tu_num = next_extra + 1
        next_extra += 2
        objs[font_num] = (
            b"<< /Type /Font /Subtype /Type0 /BaseFont /Synth "
            b"/Encoding /Identity-H /DescendantFonts [%d 0 R] "
            b"/ToUnicode %d 0 R >>" % (desc_num, tu_num)
        )
        objs[desc_num] = (
            b"<< /Type /Font /Subtype /CIDFontType2 /BaseFont /Synth "
            b"/CIDSystemInfo << /Registry (Adobe) /Ordering (Identity) "
            b"/Supplement 0 >> /CIDToGIDMap /Identity >>"
        )
        stream_obj(tu_num, _tounicode_cmap(cidmap))
    else:
        objs[font_num] = (
            b"<< /Type /Font /Subtype /" + font_subtype.encode()
            + b" /BaseFont /Helvetica /Encoding /WinAnsiEncoding >>"
        )

    if xref_stream:
        if two_xref_sections or encrypt:
            raise ValueError(
                "xref_stream is exclusive with two_xref_sections/"
                "encrypt in this fixture writer"
            )
        return _emit_xref_stream_pdf(
            objs, stream_nums, objstm=objstm, predictor=predictor
        )
    if encrypt_rc4 is not None:
        enc_num = max(objs) + 1
        v = 1 if encrypt_rc4 == 2 else 2
        objs[enc_num] = (
            b"<< /Filter /Standard /V %d /R %d /Length %d "
            b"/P -1 /O <%s> /U <%s> >>"
            % (v, encrypt_rc4, keylen * 8,
               o_val.hex().encode(), u_val.hex().encode())
        )
        enc_extra = (
            b" /Encrypt %d 0 R /ID [<%s> <%s>]"
            % (enc_num, id0.hex().encode(), id0.hex().encode())
        )
    elif encrypt_aes == 4:
        enc_num = max(objs) + 1
        objs[enc_num] = (
            b"<< /Filter /Standard /V 4 /R 4 /Length 128 /P -1 "
            b"/CF << /StdCF << /CFM /AESV2 /Length 16 >> >> "
            b"/StmF /StdCF /StrF /StdCF "
            b"/O <%s> /U <%s> >>"
            % (o_val.hex().encode(), u_val.hex().encode())
        )
        enc_extra = (
            b" /Encrypt %d 0 R /ID [<%s> <%s>]"
            % (enc_num, id0.hex().encode(), id0.hex().encode())
        )
    elif encrypt_aes == 5:
        enc_num = max(objs) + 1
        objs[enc_num] = (
            b"<< /Filter /Standard /V 5 /R 6 /Length 256 /P -1 "
            b"/CF << /StdCF << /CFM /AESV3 /Length 32 >> >> "
            b"/StmF /StdCF /StrF /StdCF "
            b"/O <%s> /U <%s> /OE <%s> /UE <%s> /Perms <%s> >>"
            % (o_val.hex().encode(), u_val.hex().encode(),
               oe_val.hex().encode(), ue_val.hex().encode(),
               perms.hex().encode())
        )
        enc_extra = b" /Encrypt %d 0 R" % enc_num
    out = bytearray(b"%PDF-1.4\n%\xc3\xa4\xc3\xbc\n")
    offsets = {}
    for num in sorted(objs):
        offsets[num] = len(out)
        out += b"%d 0 obj\n" % num + objs[num] + b"\nendobj\n"
    max_num = max(objs)

    def subsection(nums: list[int]) -> bytes:
        """One contiguous xref subsection over `nums` (gaps emitted
        as free entries); the caller writes the 'xref' keyword."""
        lo, hi = min(nums), max(nums)
        ent = [b"%d %d\n" % (lo, hi - lo + 1)]
        for num in range(lo, hi + 1):
            if num in nums and num in offsets:
                ent.append(b"%010d %05d n \n" % (offsets[num], 0))
            else:
                ent.append(b"0000000000 65535 f \n")
        return b"".join(ent)

    trailer_extra = (
        b" /Encrypt << /Filter /Standard >>" if encrypt else b""
    ) + enc_extra
    if two_xref_sections:
        # older section: objects 0..2; newer: the rest + /Prev
        prev_off = len(out)
        out += b"xref\n0 3\n0000000000 65535 f \n"
        out += b"%010d 00000 n \n" % offsets[1]
        out += b"%010d 00000 n \n" % offsets[2]
        out += (b"trailer\n<< /Size %d /Root 1 0 R%s >>\n"
                % (max_num + 1, trailer_extra))
        xref_off = len(out)
        nums = [n for n in sorted(objs) if n > 2]
        out += b"xref\n" + subsection(nums)
        out += (b"trailer\n<< /Size %d /Root 1 0 R /Prev %d%s >>\n"
                % (max_num + 1, prev_off, trailer_extra))
    else:
        xref_off = len(out)
        out += b"xref\n0 1\n0000000000 65535 f \n"
        out += subsection(sorted(objs))
        out += (b"trailer\n<< /Size %d /Root 1 0 R%s >>\n"
                % (max_num + 1, trailer_extra))
    out += b"startxref\n%d\n%%%%EOF\n" % xref_off
    return bytes(out)


def _emit_xref_stream_pdf(
    objs: dict[int, bytes],
    stream_nums: set[int],
    objstm: bool,
    predictor: bool,
) -> bytes:
    """Emit a PDF 1.5 body: optionally pack every non-stream object
    into ONE object stream (/ObjStm), then a cross-reference STREAM
    (W=[1,4,2], optionally PNG-Up predicted) instead of the classic
    table (fixture writer's paired half of _xref_stream_section /
    _objstm_object)."""
    import struct
    import zlib

    out = bytearray(b"%PDF-1.5\n%\xc3\xa4\xc3\xbc\n")
    entries: dict[int, tuple[int, int, int]] = {0: (0, 0, 65535)}
    top_nums = sorted(objs)
    stm_num = max(objs) + 1
    if objstm:
        packed = [n for n in sorted(objs) if n not in stream_nums]
        top_nums = [n for n in sorted(objs) if n in stream_nums]
        bodies = [objs[n] for n in packed]
        offs, cur = [], 0
        for body in bodies:
            offs.append(cur)
            cur += len(body) + 1
        header = " ".join(
            f"{n} {o}" for n, o in zip(packed, offs)
        ).encode() + b"\n"
        payload = header + b"\n".join(bodies) + b"\n"
        first = len(header)
        for i, n in enumerate(packed):
            entries[n] = (2, stm_num, i)
        objstm_body = (
            b"<< /Type /ObjStm /N %d /First %d /Length %d >>\n"
            b"stream\n" % (len(packed), first, len(payload))
            + payload + b"\nendstream"
        )
        top = list(top_nums) + [stm_num]
        bodies_by_num = {**{n: objs[n] for n in top_nums},
                         stm_num: objstm_body}
        xref_num = stm_num + 1
    else:
        top = top_nums
        bodies_by_num = objs
        xref_num = stm_num
    for num in top:
        entries[num] = (1, len(out), 0)
        out += b"%d 0 obj\n" % num + bodies_by_num[num] + b"\nendobj\n"
    xref_off = len(out)
    entries[xref_num] = (1, xref_off, 0)
    size = xref_num + 1
    rows = b"".join(
        bytes([entries.get(n, (0, 0, 0))[0]])
        + struct.pack(">I", entries.get(n, (0, 0, 0))[1])
        + struct.pack(">H", entries.get(n, (0, 0, 0))[2])
        for n in range(size)
    )
    cols = 7
    if predictor:
        filtered, prev = bytearray(), bytes(cols)
        for r in range(0, len(rows), cols):
            row = rows[r : r + cols]
            filtered.append(2)  # Up
            filtered += bytes(
                (row[x] - prev[x]) & 0xFF for x in range(cols)
            )
            prev = row
        data = zlib.compress(bytes(filtered))
        parms = b" /DecodeParms << /Predictor 12 /Columns 7 >>"
        filt = b" /Filter /FlateDecode"
    else:
        data = zlib.compress(rows)
        parms = b""
        filt = b" /Filter /FlateDecode"
    out += (
        b"%d 0 obj\n<< /Type /XRef /Size %d /W [1 4 2] /Root 1 0 R"
        b"%s%s /Length %d >>\nstream\n" % (
            xref_num, size, filt, parms, len(data))
        + data + b"\nendstream\nendobj\n"
    )
    out += b"startxref\n%d\n%%%%EOF\n" % xref_off
    return bytes(out)
