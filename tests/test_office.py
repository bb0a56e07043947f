"""Office text extraction (operators/office.py): paired stdlib-zipfile
writers vs the from-scratch ZIP walk + ElementTree readers, per-format
dialect, two-tier error contract, Spark surface."""

import io
import zipfile

import pytest

from geist_spark.operators.office import (
    _office_parts,
    docx_build,
    odt_build,
    office_extract_text,
    pptx_build,
    xlsx_build,
)


def test_docx_runs_tabs_breaks():
    p = ["Hello <world> & café", "col1\tcol2", "line1\nline2", ""]
    got = list(_office_parts(docx_build(p), 1 << 20))
    assert got == [(
        "DOCX", "document",
        "Hello <world> & café\ncol1\tcol2\nline1\nline2\n",
    )]
    # stored (uncompressed) members parse identically
    assert got == list(_office_parts(docx_build(p, stored=True), 1 << 20))


def test_pptx_slide_numeric_order():
    slides = [[f"slide {i} para A", "B&C"] for i in range(1, 13)]
    got = list(_office_parts(pptx_build(slides), 1 << 20))
    # slide10 sorts after slide9 (numeric, not lexicographic)
    assert [g[1] for g in got] == [f"slide{i}" for i in range(1, 13)]
    assert got[9] == ("PPTX", "slide10", "slide 10 para A\nB&C")


@pytest.mark.parametrize("shared", [True, False])
def test_xlsx_shared_inline_numbers(shared):
    sheets = [
        [["name", "qty"], ["widget <x>", 3], ["naïve", 2.5]],
        [["second sheet", "name"]],
    ]
    got = list(_office_parts(xlsx_build(sheets, shared=shared), 1 << 20))
    assert got[0] == (
        "XLSX", "sheet1", "name\tqty\nwidget <x>\t3\nnaïve\t2.5",
    )
    assert got[1] == ("XLSX", "sheet2", "second sheet\tname")


def test_odf_text_and_spreadsheet():
    p = ["alpha\tbeta", "x\ny", "a  b   c", "plain & <esc>"]
    got = list(_office_parts(odt_build(p), 1 << 20))
    assert got == [(
        "ODT", "content", "alpha\tbeta\nx\ny\na  b   c\nplain & <esc>",
    )]
    got = list(_office_parts(odt_build(["1\t2"], spreadsheet=True),
                             1 << 20))
    assert got[0][0] == "ODS"


def test_capability_and_malformed_tiers():
    with pytest.raises(NotImplementedError, match="legacy binary"):
        list(_office_parts(
            b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1rest", 1 << 20
        ))
    with pytest.raises(NotImplementedError, match="not a ZIP"):
        list(_office_parts(b"%PDF-1.4", 1 << 20))

    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        z.writestr("random.txt", "x")
    with pytest.raises(NotImplementedError, match="not a recognized"):
        list(_office_parts(buf.getvalue(), 1 << 20))

    # a DTD in a part is refused (entity-expansion bombs)
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        z.writestr(
            "word/document.xml",
            '<!DOCTYPE x [<!ENTITY a "b">]><w:document xmlns:w='
            '"http://schemas.openxmlformats.org/wordprocessingml/'
            '2006/main"/>',
        )
    with pytest.raises(ValueError, match="DTD"):
        list(_office_parts(buf.getvalue(), 1 << 20))

    # recognized container with no required parts
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        z.writestr("ppt/presentation.xml", "<p/>")
    with pytest.raises(ValueError, match="no slide parts"):
        list(_office_parts(buf.getvalue(), 1 << 20))

    # shared-string index out of range (stored container so the
    # byte-level patch reaches the uncompressed XML)
    bad = xlsx_build([[["only"]]], shared=True, stored=True)
    assert b'<c t="s"><v>0</v></c>' in bad
    bad = bad.replace(b'<c t="s"><v>0</v></c>',
                      b'<c t="s"><v>9</v></c>')
    with pytest.raises(ValueError, match="out of range"):
        list(_office_parts(bad, 1 << 20))

    # truncated XML is malformed
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        z.writestr("word/document.xml", "<w:document")
    with pytest.raises(ValueError, match="malformed DOCX"):
        list(_office_parts(buf.getvalue(), 1 << 20))


def test_office_extract_text_spark_surface(spark):
    rows = [
        (1, docx_build(["Doc one", "two"])),
        (2, pptx_build([["s1"], ["s2"]])),
        (3, xlsx_build([[["a", 1]]])),
        (4, odt_build(["odf text"])),
        (5, b"not anything"),
        (6, None),
    ]
    df = spark.createDataFrame(rows, "file_id long, payload binary")
    with pytest.raises(Exception, match="file_id=5"):
        office_extract_text(df).collect()
    out = {(r["file_id"], r["part"]): r for r in
           office_extract_text(df, on_unsupported="null").collect()}
    assert out[(1, "document")]["text"] == "Doc one\ntwo"
    assert out[(1, "document")]["format"] == "DOCX"
    assert out[(2, "slide2")]["text"] == "s2"
    assert out[(3, "sheet1")]["text"] == "a\t1"
    assert out[(4, "content")]["text"] == "odf text"
    assert out[(3, "sheet1")]["n_chars"] == 3
    assert len(out) == 5  # 5 skipped, 6 null-skipped
    with pytest.raises(ValueError, match="on_unsupported"):
        office_extract_text(df, on_unsupported="bogus")


def test_epub_spine_order_and_dialect():
    from geist_spark.operators.office import epub_build

    ep = epub_build([
        ["Chapter one intro", "two\nlines here"],
        ["Final — chapter ✓"],
    ])
    got = list(_office_parts(ep, 1 << 20))
    assert got == [
        ("EPUB", "spine1", "Chapter one intro\ntwo\nlines here"),
        ("EPUB", "spine2", "Final — chapter ✓"),
    ]
    # stored container parses identically
    assert got == list(_office_parts(
        epub_build([["Chapter one intro", "two\nlines here"],
                    ["Final — chapter ✓"]], stored=True), 1 << 20))


def test_epub_malformed_tiers():
    from geist_spark.operators.office import epub_build

    # missing container.xml
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        z.writestr("mimetype", "application/epub+zip")
    with pytest.raises(ValueError, match="container.xml"):
        list(_office_parts(buf.getvalue(), 1 << 20))

    # spine idref without a manifest item
    ep = epub_build([["x"]])
    bad = io.BytesIO()
    with zipfile.ZipFile(io.BytesIO(ep)) as zin, \
            zipfile.ZipFile(bad, "w") as zout:
        for n in zin.namelist():
            data = zin.read(n)
            if n.endswith("content.opf"):
                data = data.replace(b'idref="ch1"', b'idref="ghost"')
            zout.writestr(n, data)
    with pytest.raises(ValueError, match="ghost"):
        list(_office_parts(bad.getvalue(), 1 << 20))


def test_rtf_dialect_and_escapes():
    from geist_spark.operators.office import rtf_build

    paras = ["Héllo — wörld ✓", "tab\there", "brace {x} back\\slash"]
    got = list(_office_parts(rtf_build(paras), 1 << 20))
    assert got == [("RTF", "document", "\n".join(paras))]
    # the \pict and \*\generator data groups must leave no trace
    raw = rtf_build(["clean"], include_pict=True)
    assert b"wmetafile8" in raw
    ((_, _, text),) = _office_parts(raw, 1 << 20)
    assert text == "clean"


def test_rtf_group_skipping_and_unicode():
    # hand-written RTF: \uc2 with two fallback bytes, nested skipped
    # group inside fonttbl, \~ nbsp, raw cp1252 high byte
    src = (b"{\\rtf1\\ansi{\\fonttbl{\\f0 Arial{\\*\\panose 0}}}"
           b"\\uc2\\u1055??\\u1088??\\uc1\\u1080?a\\~b \\'e9\xe8}")
    ((_, _, text),) = _office_parts(src, 1 << 20)
    assert text == "\u041f\u0440\u0438a\u00a0b \u00e9\u00e8"


def test_rtf_malformed_tiers():
    with pytest.raises(ValueError, match="unbalanced"):
        list(_office_parts(b"{\\rtf1 {open", 1 << 20))
    with pytest.raises(ValueError, match="truncated \\\\bin"):
        list(_office_parts(b"{\\rtf1 \\bin999 xx}", 1 << 20))
    with pytest.raises(ValueError, match="non-hex"):
        list(_office_parts(b"{\\rtf1 \\'zz}", 1 << 20))
