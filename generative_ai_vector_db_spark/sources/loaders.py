"""File-format source framework — reference R1-R8 (SURVEY §2.A):
the loader factory + extension dispatch of
``helper/multiple_document_upload.py:24-30,36-62,80-87``, re-expressed
as ``binaryFile`` scan → extension routing → per-format parse inside
``mapInPandas``.

Format support in THIS container (only stdlib is available):
* txt/md   — UTF-8 decode (reference: ``TextLoader``, :40-41)
* csv      — stdlib csv, one document per row (``CSVLoader`` with
             comma delimiter produces row-per-Document, :43-48)
* html/htm — stdlib HTMLParser tag-strip (``UnstructuredHTMLLoader``,
             :59-60)
* docx/xlsx/pptx — prefer the full-fidelity lib (python-docx /
  openpyxl / python-pptx) when installed; otherwise the stdlib
  OOXML fallback in ``office_formats.py`` (ZIP + XML — real parsing,
  not a stub)
* pdf — prefer pypdf when installed; otherwise the stdlib minimal
  extractor in ``office_formats.py`` (FlateDecode + text-operator
  scan — covers programmatically-generated PDFs; exotic ones raise
  and land in the reference's "Loader error: <msg>" reject row,
  :102-109)
* doc/xls/ppt — legacy OLE2 binaries: allow-listed, parseable only
  with the optional libs; without them they route to the same
  "Loader error" reject instead of failing the job.

Scale: ``binaryFile`` gives a splittable listing of (path, content)
with files distributed across tasks; parsing streams Arrow batches
through mapInPandas. 100 TB of small files should be compacted
upstream, but nothing here assumes file count fits on the driver.
"""

from __future__ import annotations

import os
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.ingest import REASON_UNSUPPORTED, SUPPORTED_EXTENSIONS

PARSED_SCHEMA = (
    "path string, filename string, ext string, text string, error string"
)


def _parse_txt(data: bytes) -> str:
    return data.decode("utf-8", errors="replace")


def _parse_csv(data: bytes) -> str:
    import csv
    import io

    rows = list(csv.reader(io.StringIO(data.decode("utf-8", errors="replace"))))
    if not rows:
        return ""
    header = rows[0]
    # row-per-Document like CSVLoader: "col: value" lines per row
    docs = []
    for row in rows[1:]:
        docs.append(
            "\n".join(f"{h}: {v}" for h, v in zip(header, row))
        )
    return "\n\n".join(docs)


def _parse_html(data: bytes) -> str:
    from html.parser import HTMLParser

    class TextExtract(HTMLParser):
        def __init__(self) -> None:
            super().__init__()
            self.parts: list[str] = []
            self._skip = 0

        def handle_starttag(self, tag, attrs):
            if tag in ("script", "style"):
                self._skip += 1

        def handle_endtag(self, tag):
            if tag in ("script", "style") and self._skip:
                self._skip -= 1

        def handle_data(self, d):
            if not self._skip and d.strip():
                self.parts.append(d.strip())

    p = TextExtract()
    p.feed(data.decode("utf-8", errors="replace"))
    return "\n".join(p.parts)


def _parse_pdf(data: bytes) -> str:
    try:
        import pypdf  # full-fidelity path when installed on the cluster
    except ImportError:
        from .office_formats import parse_pdf_stdlib

        return parse_pdf_stdlib(data)
    import io

    reader = pypdf.PdfReader(io.BytesIO(data))
    return "\n\n".join(page.extract_text() or "" for page in reader.pages)


def _parse_docx(data: bytes) -> str:
    try:
        import docx
    except ImportError:
        from .office_formats import parse_docx_stdlib

        return parse_docx_stdlib(data)
    import io

    d = docx.Document(io.BytesIO(data))
    return "\n".join(p.text for p in d.paragraphs)


def _parse_xlsx(data: bytes) -> str:
    import io

    try:
        import openpyxl
    except ImportError:
        from .office_formats import parse_xlsx_stdlib

        return parse_xlsx_stdlib(data)

    wb = openpyxl.load_workbook(io.BytesIO(data), read_only=True)
    parts = []
    for ws in wb.worksheets:
        for row in ws.iter_rows(values_only=True):
            parts.append(" ".join("" if c is None else str(c) for c in row))
    return "\n".join(parts)


def _parse_pptx(data: bytes) -> str:
    import io

    try:
        import pptx
    except ImportError:
        from .office_formats import parse_pptx_stdlib

        return parse_pptx_stdlib(data)

    pres = pptx.Presentation(io.BytesIO(data))
    parts = []
    for slide in pres.slides:
        for shape in slide.shapes:
            if hasattr(shape, "text"):
                parts.append(shape.text)
    return "\n".join(parts)


PARSERS = {
    "txt": _parse_txt,
    "md": _parse_txt,
    "csv": _parse_csv,
    "html": _parse_html,
    "htm": _parse_html,
    "pdf": _parse_pdf,
    "doc": _parse_docx,
    "docx": _parse_docx,
    "xls": _parse_xlsx,
    "xlsx": _parse_xlsx,
    "ppt": _parse_pptx,
    "pptx": _parse_pptx,
}


def _parse_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        out = {"path": [], "filename": [], "ext": [], "text": [], "error": []}
        for path, content in zip(pdf["path"], pdf["content"]):
            fname = os.path.basename(path)
            ext = fname.lower().split(".")[-1]  # ref :77 ext parse
            text, error = None, None
            parser = PARSERS.get(ext)
            if parser is None:
                error = REASON_UNSUPPORTED
            else:
                try:
                    text = parser(bytes(content))
                except Exception as e:  # ref :102-109 loader error capture
                    error = f"Loader error: {e}"
            out["path"].append(path)
            out["filename"].append(fname)
            out["ext"].append(ext)
            out["text"].append(text)
            out["error"].append(error)
        yield pd.DataFrame(out)


def scan_directory(spark: SparkSession, input_dir: str) -> DataFrame:
    """binaryFile listing of an uploads dir (reference app.py:36,362-363)."""
    return spark.read.format("binaryFile").load(input_dir)


def parse_files(files: DataFrame) -> DataFrame:
    """(path, content) -> (path, filename, ext, text, error)."""
    from .._bootstrap import ensure_worker_imports

    ensure_worker_imports(files.sparkSession)
    return files.select("path", "content").mapInPandas(
        _parse_batches, PARSED_SCHEMA
    )


def load_documents(spark: SparkSession, input_dir: str) -> tuple[DataFrame, DataFrame]:
    """Returns (documents, rejected) — the two-sided output of R26.

    documents: doc_id (sha2 of path), text, source (lower filename,
    ref :153), type (ext), n_chars. rejected: filename, reason.
    """
    parsed = parse_files(scan_directory(spark, input_dir))
    ok = parsed.where(F.col("error").isNull() & (F.trim("text") != ""))
    empty = parsed.where(F.col("error").isNull() & (F.trim("text") == "")).select(
        "filename", F.lit("No readable content found").alias("reason")
    )
    rejected = parsed.where(F.col("error").isNotNull()).select(
        "filename", F.col("error").alias("reason")
    ).union(empty)
    documents = ok.select(
        F.conv(F.substring(F.sha2("path", 256), 1, 15), 16, 10)
        .cast("bigint")
        .alias("doc_id"),
        "text",
        F.lower("filename").alias("source"),
        F.col("ext").alias("type"),
        F.length("text").cast("bigint").alias("n_chars"),
    )
    return documents, rejected
