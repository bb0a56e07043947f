"""PDF text extraction for training-data pipelines.

PDF is the single biggest document format in real crawl dumps that
the archive/Office extractors don't cover. This is a from-scratch
minimal reader built the same way as prep.archive_extract_text and
the multimodal decoders: stdlib only (zlib), every inflate bounded,
two-tier errors — foreign/unsupported constructs are TYPED capability
limits (encrypted PDFs, compressed xref streams, composite/CMap
fonts, non-Flate filters), structural damage always raises
ValueError. No reference-engine parity to cite: zpiroux/geist is a
JSON-event engine (README.md:566) with no document surface; the spec
followed here is ISO 32000-1 (classic cross-reference tables, object
grammar, content-stream text operators).

Scope (the 90%-of-corpus tier, like html_extract):
- classic xref tables (multi-section /Prev chains); xref STREAMS
  (PDF 1.5 compressed xref + object streams) are a capability limit,
- FlateDecode and unfiltered content streams, bounded at max_bytes
  (the PNG-IDAT / gzip-bomb rule); predictors and other filters are
  capability limits,
- simple fonts (Type1/TrueType) with standard single-byte encodings,
  decoded as WinAnsi (cp1252) — Type0/CMap composite fonts are a
  capability limit (their bytes are CID indexes, not characters;
  decoding them as text would be silent garbage),
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

from pyspark.sql import DataFrame

PDF_TEXT_SCHEMA = "file_id long, page int, text string, n_chars int"

_WS = b"\x00\t\n\x0c\r "
_DELIM = b"()<>[]{}/%"


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
        while self.i < n:
            c = b[self.i]
            if c in _WS:
                self.i += 1
            elif c == 0x25:  # '%' comment to EOL
                j = b.find(b"\n", self.i)
                self.i = n if j < 0 else j + 1
            else:
                return

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
        digits = [c for c in b[self.i + 1: j]
                  if c not in _WS]
        self.i = j + 1
        out = bytearray()
        for k in range(0, len(digits), 2):
            hi = digits[k]
            lo = digits[k + 1] if k + 1 < len(digits) else 0x30
            try:
                out.append(int(chr(hi) + chr(lo), 16))
            except ValueError:
                raise ValueError(
                    "malformed PDF: non-hex digit in hex string"
                ) from None
        return bytes(out)

    def name(self) -> _Name:
        """/Name token with #xx hex escapes (§7.3.5). Cursor on '/'."""
        b, n = self.b, len(self.b)
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
        b, n = self.b, len(self.b)
        i = self.i
        while i < n and _is_regular(b[i]):
            i += 1
        word = b[self.i: i].decode("latin-1")
        self.i = i
        return word


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
        start = lx.i
        lx.i += 1
        while lx.i < n and b[lx.i] in b"+-.0123456789":
            lx.i += 1
        tok = b[start: lx.i]
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


def _load_object(objects: dict, num: int, max_bytes: int):
    """Parse 'N G obj … endobj' at the xref offset: (value,
    stream_bytes_or_None). Results memoized in objects[num]."""
    ent = objects[num]
    if isinstance(ent, tuple) and ent[0] == "parsed":
        return ent[1], ent[2]
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
    objects[num] = ("parsed", val, stream)
    return val, stream


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
    """Walk startxref -> classic xref table(s) (following /Prev):
    returns ({obj_num: (b, offset)}, trailer_dict). A compressed
    xref STREAM at the startxref offset ('N G obj') is a typed
    capability limit; everything structurally wrong raises."""
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
            # PDF 1.5+: the startxref target is an 'N G obj' xref
            # stream — a capability limit, not damage
            probe = _Lexer(b, lx.i)
            w1 = probe.keyword()
            probe.skip_ws()
            w2 = probe.keyword()
            probe.skip_ws()
            w3 = probe.keyword()
            if w1.isdigit() and w2.isdigit() and w3 == "obj":
                raise NotImplementedError(
                    "PDF 1.5 compressed cross-reference stream "
                    "unsupported (classic xref tables only)"
                )
            raise ValueError(
                f"malformed PDF: no xref table at offset {next_off}"
            )
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
        prev = t.get("Prev")
        if prev is None:
            return offsets, trailer
        if not isinstance(prev, int):
            raise ValueError("malformed PDF: non-integer /Prev")
        next_off = prev


def _content_text(data: bytes) -> str:
    """Assemble page text from a decoded content stream: Tj/TJ/'/"
    shows, Td/TD/T*/BT line breaks (only when the current line is
    non-empty), shown bytes decoded as WinAnsi (cp1252, replace).
    Inline images (BI…EI) are skipped; every other operator just
    clears the operand stack."""
    lines = [""]
    operands: list = []
    lx = _Lexer(data)
    n = len(data)

    def newline() -> None:
        if lines[-1] != "":
            lines.append("")

    def show(raw: bytes) -> None:
        lines[-1] += raw.decode("cp1252", errors="replace")

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
            start = lx.i
            lx.i += 1
            while lx.i < n and data[lx.i] in b"+-.0123456789":
                lx.i += 1
            operands.append(data[start: lx.i])
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


def _check_fonts(res, objects: dict, max_bytes: int) -> None:
    """Composite (Type0/CMap) fonts make shown bytes CID indexes, not
    characters — extracting them as text would be silent garbage, so
    they are a typed capability limit."""
    res = _resolve(res, objects, max_bytes)
    if not isinstance(res, dict):
        return
    fonts = _resolve(res.get("Font"), objects, max_bytes)
    if not isinstance(fonts, dict):
        return
    for fval in fonts.values():
        fd = _resolve(fval, objects, max_bytes)
        if isinstance(fd, dict) and str(fd.get("Subtype")) == "Type0":
            raise NotImplementedError(
                "composite (Type0/CMap) font unsupported — shown "
                "bytes are CID indexes, not characters"
            )


def _pdf_pages(b: bytes, max_bytes: int):
    """Yield (page_index, page_text) for a classic-xref PDF."""
    if b[:5] != b"%PDF-":
        raise NotImplementedError("payload is not a PDF (no %PDF- magic)")
    objects, trailer = _xref_offsets(b, max_bytes)
    if "Encrypt" in trailer:
        raise NotImplementedError("encrypted PDF unsupported")
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
        _check_fonts(res, objects, max_bytes)
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
        yield idx, _content_text(b"\n".join(parts))
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
    BT/ET text-operator assembly — see the module docstring for the
    exact scope and dialect. Two-tier errors: non-PDF payloads,
    encrypted PDFs, xref streams, non-Flate filters, predictors, and
    Type0/CMap fonts are CAPABILITY limits (raise naming the id, or
    skip the file under on_unsupported='null'); structural damage
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
    escaped; a '\\n' in the input becomes an explicit \\n escape."""
    out = bytearray()
    for ch in s:
        b = ch.encode("cp1252", errors="replace")
        if b in (b"(", b")", b"\\"):
            out += b"\\" + b
        elif b == b"\n":
            out += b"\\n"
        else:
            out += b
    return bytes(out)


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


def pdf_build(
    page_streams: list[bytes],
    flate: bool = False,
    indirect_length: bool = False,
    font_subtype: str = "Type1",
    encrypt: bool = False,
    two_xref_sections: bool = False,
    contents_array: bool = False,
) -> bytes:
    """Minimal classic-xref PDF writer — the zipfile/tarfile
    cross-validation pattern from the archive gates: fixtures are
    built by independent code, byte offsets computed for real, so a
    reader bug can't cancel against a writer bug. Options cover the
    reader's branch points: Flate vs plain streams, indirect /Length,
    Type0 font (capability fixture), /Encrypt stub, and a two-section
    xref chained with /Prev."""
    import zlib

    n_pages = len(page_streams)
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

    def stream_obj(num: int, stream: bytes) -> None:
        nonlocal next_extra
        data = zlib.compress(stream) if flate else stream
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
    objs[font_num] = (
        b"<< /Type /Font /Subtype /" + font_subtype.encode()
        + b" /BaseFont /Helvetica /Encoding /WinAnsiEncoding >>"
    )

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

    trailer_extra = b" /Encrypt << /Filter /Standard >>" if encrypt else b""
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
