"""Folder-of-documents source (parity with pdf_extraction.py's PDF loop).

The reference iterates PDFs sequentially on one machine
(pdf_extraction.py:473-504); here the folder loads as a distributed
binaryFile scan and text extraction runs as an Arrow-batched
``mapInPandas`` — one task per file split, horizontally scalable.

Fallback routing mirrors extract_pages_text (pdf_extraction.py:48-81):
text-layer first, OCR when the text layer comes back empty, and
``prefer_ocr`` swaps the order. pdfplumber/pdf2image/pytesseract are
not installed in this environment, so both decode paths are
import-gated (mirroring the reference's own safe imports at
pdf_extraction.py:21-32): the text-layer stub decodes UTF-8 payloads
(test fixtures) and the OCR path accepts an injectable callable so the
routing is testable with a deterministic fake.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

try:  # real text-layer extraction, when available
    import pdfplumber  # noqa: F401

    _HAS_PDFPLUMBER = True
except Exception:
    _HAS_PDFPLUMBER = False

try:  # real OCR, when available (pdf_extraction.py:27-32)
    import pytesseract  # noqa: F401
    from pdf2image import convert_from_bytes  # noqa: F401

    _HAS_OCR = True
except Exception:
    _HAS_OCR = False


def _text_layer(payload: bytes) -> str:
    """Text-layer extraction. PDF decode requires pdfplumber; the stub
    decodes UTF-8 payloads (test fixtures) and returns '' otherwise,
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


def _ocr_pages(payload: bytes) -> str:
    """Rasterize + OCR (pdf_extraction.py:61-69). Only reachable when
    pdf2image/pytesseract are importable."""
    import pytesseract
    from pdf2image import convert_from_bytes

    imgs = convert_from_bytes(payload, dpi=300)
    return "\n".join(
        (pytesseract.image_to_string(img, lang="eng") or "") for img in imgs
    )


def _extract_text(
    payload: bytes,
    prefer_ocr: bool = False,
    ocr: Callable[[bytes], str] | None = None,
) -> str:
    """Per-file text extraction with the reference's fallback order
    (pdf_extraction.py:71-79): primary path first, the other when the
    primary yields only whitespace. ``ocr`` overrides the real OCR
    implementation (used by tests; None → pytesseract when installed,
    else the OCR branch yields '')."""
    if ocr is None:
        ocr = _ocr_pages if _HAS_OCR else (lambda _: "")
    first, second = (ocr, _text_layer) if prefer_ocr else (_text_layer, ocr)
    text = first(payload)
    if not text.strip():
        text = second(payload)
    return text


def read_document_folder(
    spark: SparkSession,
    folder: str,
    glob: str = "*",
    prefer_ocr: bool = False,
    ocr: Callable[[bytes], str] | None = None,
) -> DataFrame:
    """(doc_name, raw_text) for every file under ``folder``. The ``ocr``
    callable (if given) is serialized into the task closure, so it runs
    on executors — inject a deterministic fake in tests."""
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
                    "raw_text": pdf["content"].map(
                        lambda b: _extract_text(b, prefer_ocr=prefer_ocr, ocr=ocr)
                    ),
                }
            )

    return raw.mapInPandas(_batches, schema="doc_name string, raw_text string")
