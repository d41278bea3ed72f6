"""Folder-of-documents source (parity with pdf_extraction.py's PDF loop).

The reference iterates PDFs sequentially on one machine
(pdf_extraction.py:473-504); here the folder loads as a distributed
binaryFile scan and text extraction runs as an Arrow-batched
``mapInPandas`` — one task per file split, horizontally scalable.

pdfplumber/pytesseract are not installed in this environment, so
``_extract_text`` STUBS the decode for non-text payloads (mirroring the
reference's own optional-dependency fallbacks at pdf_extraction.py:21-32)
and decodes UTF-8 payloads directly — which makes the full pipeline
testable with plain-text fixtures.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

try:  # real text-layer extraction, when available
    import pdfplumber  # noqa: F401

    _HAS_PDFPLUMBER = True
except Exception:
    _HAS_PDFPLUMBER = False


def _extract_text(payload: bytes) -> str:
    """Per-file text extraction. PDF decode requires pdfplumber/OCR; the
    stub decodes UTF-8 payloads (test fixtures) and returns '' otherwise,
    like the reference's empty-page fallback."""
    if _HAS_PDFPLUMBER and payload[:5] == b"%PDF-":
        import io

        import pdfplumber

        with pdfplumber.open(io.BytesIO(payload)) as pdf:
            return "\n".join((p.extract_text() or "") for p in pdf.pages)
    try:
        return payload.decode("utf-8")
    except UnicodeDecodeError:
        return ""


def read_document_folder(spark: SparkSession, folder: str, glob: str = "*") -> DataFrame:
    """(doc_name, raw_text) for every file under ``folder``."""
    raw = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .load(folder)
        .select("path", "content")
    )

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    "doc_name": pdf["path"].map(lambda p: p.rsplit("/", 1)[-1]),
                    "raw_text": pdf["content"].map(_extract_text),
                }
            )

    return raw.mapInPandas(_batches, schema="doc_name string, raw_text string")
