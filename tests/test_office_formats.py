"""Stdlib OOXML/PDF fallback parsers (sources/office_formats.py).

Synthetic files are built in-test with zipfile/zlib only, then parsed
both directly and end-to-end through loaders.load_documents — in this
container the optional libs are absent, so these tests exercise the
exact fallback path a lib-less cluster would run."""

from __future__ import annotations

import io
import os
import shutil
import tempfile
import zipfile
import zlib

import pytest

from generative_ai_vector_db_spark.sources import loaders, office_formats


# ---------------------------------------------------------------------------
# builders
# ---------------------------------------------------------------------------
def make_docx(paragraphs: list[str]) -> bytes:
    body = "".join(
        f'<w:p><w:r><w:t xml:space="preserve">{p}</w:t></w:r></w:p>'
        for p in paragraphs
    )
    doc = (
        '<?xml version="1.0" encoding="UTF-8"?>'
        '<w:document xmlns:w="http://schemas.openxmlformats.org/wordprocessingml/2006/main">'
        f"<w:body>{body}</w:body></w:document>"
    )
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        z.writestr("[Content_Types].xml", "<Types/>")
        z.writestr("word/document.xml", doc)
    return buf.getvalue()


def make_xlsx(rows: list[list[object]], shared: list[str]) -> bytes:
    """rows reference shared strings by 's:<idx>', numbers directly,
    and 'i:<text>' for inline strings."""
    ns = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"
    sst = (
        f'<sst xmlns="{ns}">'
        + "".join(f"<si><t>{s}</t></si>" for s in shared)
        + "</sst>"
    )
    cells = []
    for r, row in enumerate(rows, start=1):
        cs = []
        for v in row:
            if isinstance(v, str) and v.startswith("s:"):
                cs.append(f'<c t="s"><v>{v[2:]}</v></c>')
            elif isinstance(v, str) and v.startswith("i:"):
                cs.append(f'<c t="inlineStr"><is><t>{v[2:]}</t></is></c>')
            else:
                cs.append(f"<c><v>{v}</v></c>")
        cells.append(f'<row r="{r}">{"".join(cs)}</row>')
    sheet = (
        f'<worksheet xmlns="{ns}"><sheetData>{"".join(cells)}</sheetData></worksheet>'
    )
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        z.writestr("[Content_Types].xml", "<Types/>")
        z.writestr("xl/sharedStrings.xml", sst)
        z.writestr("xl/worksheets/sheet1.xml", sheet)
    return buf.getvalue()


def make_pptx(slides: list[list[str]]) -> bytes:
    pns = "http://schemas.openxmlformats.org/presentationml/2006/main"
    ans = "http://schemas.openxmlformats.org/drawingml/2006/main"
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        z.writestr("[Content_Types].xml", "<Types/>")
        for i, paras in enumerate(slides, start=1):
            body = "".join(
                f"<a:p><a:r><a:t>{p}</a:t></a:r></a:p>" for p in paras
            )
            slide = (
                f'<p:sld xmlns:p="{pns}" xmlns:a="{ans}">'
                f"<p:txBody>{body}</p:txBody></p:sld>"
            )
            z.writestr(f"ppt/slides/slide{i}.xml", slide)
    return buf.getvalue()


def _pdf_escape(s: str) -> str:
    return s.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")


def make_pdf(pages: list[list[str]], compress: bool = True) -> bytes:
    parts = [b"%PDF-1.4\n"]
    for i, lines in enumerate(pages, start=1):
        ops = [b"BT /F1 12 Tf 72 720 Td"]
        for ln in lines:
            ops.append(f"({_pdf_escape(ln)}) Tj 0 -14 Td".encode("latin-1"))
        ops.append(b"ET")
        content = b" ".join(ops)
        if compress:
            content = zlib.compress(content)
        parts.append(
            b"%d 0 obj << /Length %d >>\nstream\n" % (i, len(content))
            + content
            + b"\nendstream\nendobj\n"
        )
    parts.append(b"%%EOF\n")
    return b"".join(parts)


# ---------------------------------------------------------------------------
# direct parser tests
# ---------------------------------------------------------------------------
def test_docx_paragraphs():
    data = make_docx(["first paragraph", "second paragraph", ""])
    assert office_formats.parse_docx_stdlib(data) == (
        "first paragraph\nsecond paragraph\n"
    )


def test_xlsx_shared_inline_numeric():
    data = make_xlsx(
        rows=[["s:0", 42, "i:inline cell"], ["s:1", 3.5]],
        shared=["alpha", "beta"],
    )
    assert office_formats.parse_xlsx_stdlib(data) == (
        "alpha 42 inline cell\nbeta 3.5"
    )


def test_pptx_slides_in_order():
    data = make_pptx([["slide one title", "bullet a"], ["slide two"]])
    assert office_formats.parse_pptx_stdlib(data) == (
        "slide one title\nbullet a\nslide two"
    )


def test_pdf_flate_and_plain():
    for compress in (True, False):
        data = make_pdf([["hello pdf", "line two"], ["page 2"]], compress)
        assert office_formats.parse_pdf_stdlib(data) == (
            "hello pdf\nline two\n\npage 2"
        )


def test_pdf_tj_array_escapes_and_hex():
    content = (
        b"BT [(Hel) -20 (lo)] TJ 0 -14 Td"
        b" (paren \\( escaped \\) and \\134 octal) Tj 0 -14 Td"
        b" <486579> Tj ET"
    )
    data = (
        b"%PDF-1.4\n1 0 obj << /Length "
        + str(len(content)).encode()
        + b" >>\nstream\n"
        + content
        + b"\nendstream\nendobj\n%%EOF\n"
    )
    assert office_formats.parse_pdf_stdlib(data) == (
        "Hello\nparen ( escaped ) and \\ octal\nHey"
    )


def test_pdf_garbage_raises():
    with pytest.raises(ValueError):
        office_formats.parse_pdf_stdlib(b"%PDF-1.4 fake binary content")
    with pytest.raises(ValueError):
        office_formats.parse_pdf_stdlib(b"not a pdf at all %%EOF")


def test_legacy_ole2_rejects():
    # .doc/.xls/.ppt are OLE2 compound files, not ZIP — the fallback
    # raises and the loader turns that into a "Loader error" reject.
    ole2 = b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1" + b"\x00" * 64
    with pytest.raises(zipfile.BadZipFile):
        office_formats.parse_docx_stdlib(ole2)


# ---------------------------------------------------------------------------
# end-to-end through the Spark loader stage
# ---------------------------------------------------------------------------
def test_load_documents_office_formats(spark):
    uploads = tempfile.mkdtemp(prefix="office_uploads_")
    try:
        files = {
            "memo.docx": make_docx(["quarterly memo", "budget line"]),
            "numbers.xlsx": make_xlsx([["s:0", 7]], ["revenue"]),
            "deck.pptx": make_pptx([["kickoff deck"]]),
            "report.pdf": make_pdf([["annual report", "summary page"]]),
            "legacy.doc": b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1" + b"\x00" * 64,
        }
        for name, data in files.items():
            with open(os.path.join(uploads, name), "wb") as f:
                f.write(data)
        docs, rejected = loaders.load_documents(spark, uploads)
        got = docs.toPandas().set_index("source")["text"].to_dict()
        assert got["memo.docx"] == "quarterly memo\nbudget line"
        assert got["numbers.xlsx"] == "revenue 7"
        assert got["deck.pptx"] == "kickoff deck"
        assert got["report.pdf"] == "annual report\nsummary page"
        rej = rejected.toPandas().set_index("filename")["reason"].to_dict()
        assert set(rej) == {"legacy.doc"}
        assert rej["legacy.doc"].startswith("Loader error: ")
    finally:
        shutil.rmtree(uploads, ignore_errors=True)


# ---------------------------------------------------------------------------
# property tests: round-trip arbitrary text through the builders
# ---------------------------------------------------------------------------
from hypothesis import given, settings
from hypothesis import strategies as st
from xml.sax.saxutils import escape as xml_escape

# printable text without XML-structural or control chars; the builders
# escape XML entities so <>& are exercised deliberately
_text = st.text(
    alphabet=st.characters(
        whitelist_categories=("L", "N", "P", "S", "Zs"), max_codepoint=0x2FF
    ),
    min_size=1,
    max_size=80,
).map(lambda s: s.strip()).filter(bool)


@settings(max_examples=25, deadline=None)
@given(st.lists(_text, min_size=1, max_size=5))
def test_docx_roundtrip_property(paragraphs):
    data = make_docx([xml_escape(p) for p in paragraphs])
    assert office_formats.parse_docx_stdlib(data) == "\n".join(paragraphs)


# PDF literal strings are one-byte latin-1 in this minimal profile
_pdf_text = st.text(
    alphabet=st.characters(
        whitelist_categories=("L", "N", "P", "S", "Zs"), max_codepoint=0xFF
    ),
    min_size=1,
    max_size=80,
).map(lambda s: s.strip()).filter(bool)


@settings(max_examples=25, deadline=None)
@given(st.lists(st.lists(_pdf_text, min_size=1, max_size=4), min_size=1, max_size=3))
def test_pdf_roundtrip_property(pages):
    data = make_pdf(pages, compress=True)
    want = "\n\n".join("\n".join(lines) for lines in pages)
    assert office_formats.parse_pdf_stdlib(data) == want
