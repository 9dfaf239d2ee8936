"""Pure-stdlib parsers for Office Open XML (docx/xlsx/pptx) and simple
PDFs — the fallback path behind ``sources/loaders.py`` when the
full-fidelity libraries (pypdf, python-docx, openpyxl, python-pptx) are
not installed on the cluster.

Reference parity: ``helper/multiple_document_upload.py:36-62`` routes
these formats to LangChain loaders (PyPDFLoader, Docx2txtLoader,
UnstructuredExcelLoader, UnstructuredPowerPointLoader). The fallbacks
emit text at the same granularity the loaders do — paragraph lines for
docx, space-joined cell rows for xlsx, slide text runs for pptx, and
page text for PDF — so downstream chunking/hashing behaves identically
whichever parser ran.

OOXML is ZIP + XML, fully coverable with ``zipfile`` +
``xml.etree``. PDF is covered for the common case: classic (non-object-
stream) cross-reference PDFs whose page content streams are plain or
FlateDecode-compressed and whose fonts use standard one-byte encodings
— i.e. the output of most programmatic generators. Exotic PDFs
(CID/Type0 subset fonts, object streams, encryption) raise, which the
loader surfaces as the reference's "Loader error: ..." reject
(``helper/multiple_document_upload.py:102-109``) rather than failing
the job.

Legacy binary formats (.doc/.xls/.ppt — OLE2, not ZIP) are not
parseable here; ``zipfile.BadZipFile`` propagates to the same reject
path. All parsing runs worker-side inside the loaders' ``mapInPandas``
stage — pure per-file CPU, no driver involvement.
"""

from __future__ import annotations

import io
import re
import zipfile
import zlib
from xml.etree import ElementTree as ET

_W = "{http://schemas.openxmlformats.org/wordprocessingml/2006/main}"
_S = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"
_P = "{http://schemas.openxmlformats.org/presentationml/2006/main}"
_A = "{http://schemas.openxmlformats.org/drawingml/2006/main}"


# ---------------------------------------------------------------------------
# Office Open XML
# ---------------------------------------------------------------------------
def parse_docx_stdlib(data: bytes) -> str:
    """word/document.xml → one line per ``w:p`` paragraph (the same
    shape python-docx's ``d.paragraphs`` yields); tabs and explicit
    breaks are preserved inside a paragraph."""
    with zipfile.ZipFile(io.BytesIO(data)) as z:
        root = ET.fromstring(z.read("word/document.xml"))
    paras = []
    for p in root.iter(f"{_W}p"):
        runs: list[str] = []
        for node in p.iter():
            if node.tag == f"{_W}t":
                runs.append(node.text or "")
            elif node.tag == f"{_W}tab":
                runs.append("\t")
            elif node.tag == f"{_W}br":
                runs.append("\n")
        paras.append("".join(runs))
    return "\n".join(paras)


def _numeric_suffix(name: str) -> int:
    m = re.search(r"(\d+)\.xml$", name)
    return int(m.group(1)) if m else 0


def parse_xlsx_stdlib(data: bytes) -> str:
    """xl/worksheets/sheet*.xml → one space-joined line per row across
    all sheets (matching the openpyxl loop in loaders._parse_xlsx).
    Resolves shared strings, inline strings, and plain values."""
    with zipfile.ZipFile(io.BytesIO(data)) as z:
        names = z.namelist()
        shared: list[str] = []
        if "xl/sharedStrings.xml" in names:
            sroot = ET.fromstring(z.read("xl/sharedStrings.xml"))
            for si in sroot.iter(f"{_S}si"):
                shared.append("".join(t.text or "" for t in si.iter(f"{_S}t")))
        sheets = sorted(
            (n for n in names if re.fullmatch(r"xl/worksheets/sheet\d+\.xml", n)),
            key=_numeric_suffix,
        )
        lines = []
        for name in sheets:
            root = ET.fromstring(z.read(name))
            for row in root.iter(f"{_S}row"):
                vals = []
                for c in row.iter(f"{_S}c"):
                    kind = c.get("t")
                    if kind == "inlineStr":
                        vals.append(
                            "".join(t.text or "" for t in c.iter(f"{_S}t"))
                        )
                        continue
                    v = c.find(f"{_S}v")
                    if v is None or v.text is None:
                        vals.append("")
                    elif kind == "s":
                        vals.append(shared[int(v.text)])
                    else:
                        vals.append(v.text)
                lines.append(" ".join(vals))
    return "\n".join(lines)


def parse_pptx_stdlib(data: bytes) -> str:
    """ppt/slides/slide*.xml in slide order → text frames, paragraphs
    newline-joined within a frame (python-pptx ``shape.text`` shape)."""
    with zipfile.ZipFile(io.BytesIO(data)) as z:
        slides = sorted(
            (
                n
                for n in z.namelist()
                if re.fullmatch(r"ppt/slides/slide\d+\.xml", n)
            ),
            key=_numeric_suffix,
        )
        parts = []
        for name in slides:
            root = ET.fromstring(z.read(name))
            for tx in root.iter(f"{_P}txBody"):
                paras = [
                    "".join(t.text or "" for t in p.iter(f"{_A}t"))
                    for p in tx.iter(f"{_A}p")
                ]
                parts.append("\n".join(paras))
    return "\n".join(parts)


# ---------------------------------------------------------------------------
# PDF — minimal content-stream text extraction
# ---------------------------------------------------------------------------
_ESCAPES = {
    ord("n"): "\n",
    ord("r"): "\r",
    ord("t"): "\t",
    ord("b"): "\b",
    ord("f"): "\f",
    ord("("): "(",
    ord(")"): ")",
    ord("\\"): "\\",
}


def _read_literal(buf: bytes, i: int) -> tuple[str, int]:
    """Read a PDF literal string starting at ``buf[i] == '('``; returns
    (decoded text, index past the closing paren). Handles nesting,
    backslash escapes, and octal codes per PDF 32000-1 §7.3.4.2."""
    out: list[str] = []
    depth = 1
    i += 1
    n = len(buf)
    while i < n and depth:
        c = buf[i]
        if c == 0x5C:  # backslash
            i += 1
            if i >= n:
                break
            e = buf[i]
            if e in _ESCAPES:
                out.append(_ESCAPES[e])
                i += 1
            elif 0x30 <= e <= 0x37:  # octal \ddd, up to 3 digits
                j = i
                while j < n and j - i < 3 and 0x30 <= buf[j] <= 0x37:
                    j += 1
                out.append(chr(int(buf[i:j], 8) & 0xFF))
                i = j
            elif e in (0x0A, 0x0D):  # line continuation
                i += 1
                if e == 0x0D and i < n and buf[i] == 0x0A:
                    i += 1
            else:
                out.append(chr(e))
                i += 1
        elif c == 0x28:
            depth += 1
            out.append("(")
            i += 1
        elif c == 0x29:
            depth -= 1
            if depth:
                out.append(")")
            i += 1
        else:
            out.append(chr(c))
            i += 1
    return "".join(out), i


def _read_hex(buf: bytes, i: int) -> tuple[str, int]:
    """Read <hex string> starting at ``buf[i] == '<'``. One-byte codes
    assumed (standard encodings); an odd final digit is padded with 0."""
    j = buf.find(b">", i)
    if j < 0:
        j = len(buf)
    digits = re.sub(rb"[^0-9A-Fa-f]", b"", buf[i + 1 : j])
    if len(digits) % 2:
        digits += b"0"
    return bytes.fromhex(digits.decode("ascii")).decode("latin-1"), j + 1


_TOKEN = re.compile(rb"/[^\s/<>\[\]()]*|[A-Za-z'\"*]+|[-+.0-9]+|\[|\]")


def _extract_text_ops(content: bytes) -> str:
    """Walk a decoded content stream and collect text-showing operators:
    ``Tj`` / ``'`` / ``\"`` (single string), ``TJ`` (array with kerning),
    with line breaks on ``Td``/``TD``/``T*`` and block ends (``ET``)."""
    lines: list[str] = []
    cur: list[str] = []
    strings: list[str] = []  # operand stack of string tokens
    i, n = 0, len(content)

    def newline() -> None:
        if cur:
            lines.append("".join(cur))
            cur.clear()

    while i < n:
        c = content[i : i + 1]
        if c == b"(":
            s, i = _read_literal(content, i)
            strings.append(s)
        elif c == b"<" and content[i : i + 2] != b"<<":
            s, i = _read_hex(content, i)
            strings.append(s)
        elif c == b"<":  # dictionary start
            i += 2
        elif c == b"%":  # comment to end of line
            j = content.find(b"\n", i)
            i = n if j < 0 else j + 1
        else:
            m = _TOKEN.match(content, i)
            if not m:
                i += 1
                continue
            tok = m.group(0)
            i = m.end()
            if tok in (b"Tj", b"'", b'"', b"TJ"):
                cur.extend(strings)
                if tok in (b"'", b'"'):
                    newline()
                strings.clear()
            elif tok in (b"Td", b"TD", b"T*", b"ET"):
                newline()
                strings.clear()
            elif tok == b"[" or tok == b"]":
                continue
            elif tok[:1].isalpha() or tok in (b"]", b"["):
                # any other operator consumes pending operands
                strings.clear()
    newline()
    return "\n".join(lines)


def parse_pdf_stdlib(data: bytes) -> str:
    """Extract text from a simple PDF: find every ``stream…endstream``
    body, inflate FlateDecode payloads, and run the text-operator scan
    over streams that contain a ``BT`` text block. Pages are joined with
    blank lines (the PyPDFLoader page-join shape in loaders._parse_pdf).

    Raises on non-PDF input or a truncated file so the ingest pipeline
    routes it to the "Loader error: ..." reject (reference
    ``helper/multiple_document_upload.py:102-109``)."""
    if b"%PDF" not in data[:1024]:
        raise ValueError("not a PDF: missing %PDF header")
    if b"%%EOF" not in data:
        raise ValueError("EOF marker not found")
    pages: list[str] = []
    for m in re.finditer(rb"stream\r?\n(.*?)endstream", data, re.DOTALL):
        raw = m.group(1)
        try:
            # decompressobj tolerates the EOL padding writers leave
            # between the deflate payload and the endstream keyword
            content = zlib.decompressobj().decompress(raw)
        except zlib.error:
            content = raw  # uncompressed content stream
        if b"BT" not in content:
            continue
        text = _extract_text_ops(content)
        if text:
            pages.append(text)
    return "\n\n".join(pages)
