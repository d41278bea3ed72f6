"""Folder-of-documents source (parity with pdf_extraction.py's PDF loop).

The reference iterates PDFs sequentially on one machine
(pdf_extraction.py:473-504); here the folder loads as a distributed
binaryFile scan and text extraction runs as an Arrow-batched
``mapInPandas`` — one task per file split, horizontally scalable.

Fallback routing mirrors extract_pages_text (pdf_extraction.py:48-81):
text-layer first, OCR when the text layer comes back empty, and
``prefer_ocr`` swaps the order. pdfplumber/pdf2image/pytesseract are
import-gated (mirroring the reference's own safe imports at
pdf_extraction.py:21-32); when pdfplumber is absent the text layer
runs ``decode_pdf_text`` — a pure-stdlib content-stream parser
(FlateDecode via zlib + BT/ET text-operator walk) that extracts
genuine PDF bytes, with UTF-8 plain-text fixtures and the injectable
OCR callable as the remaining fallbacks.
"""

from __future__ import annotations

import re
import zlib
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


# PDF string escapes (PDF 32000-1 §7.3.4.2)
_PDF_ESC = {
    b"n": b"\n", b"r": b"\r", b"t": b"\t", b"b": b"\b", b"f": b"\f",
    b"(": b"(", b")": b")", b"\\": b"\\",
}

_STREAM_RE = re.compile(rb"<<(.*?)>>\s*stream\r?\n(.*?)endstream", re.S)


def _pdf_string(data: bytes, i: int) -> tuple[bytes, int]:
    """Decode a PDF literal string starting at ``data[i] == '('``.
    Returns (decoded bytes, index past the closing paren)."""
    out = bytearray()
    depth = 1
    i += 1
    n = len(data)
    while i < n and depth:
        c = data[i : i + 1]
        if c == b"\\":
            nxt = data[i + 1 : i + 2]
            if nxt in _PDF_ESC:
                out += _PDF_ESC[nxt]
                i += 2
            elif nxt.isdigit():  # \ddd octal, 1-3 digits
                j = i + 1
                while j < min(i + 4, n) and data[j : j + 1].isdigit():
                    j += 1
                out.append(int(data[i + 1 : j], 8) & 0xFF)
                i = j
            elif nxt in (b"\n", b"\r"):  # line continuation
                i += 2
                if nxt == b"\r" and data[i : i + 1] == b"\n":
                    i += 1
            else:
                i += 1  # lone backslash: drop
        elif c == b"(":
            depth += 1
            out += c
            i += 1
        elif c == b")":
            depth -= 1
            if depth:
                out += c
            i += 1
        else:
            out += c
            i += 1
    return bytes(out), i


def _content_stream_text(data: bytes) -> list[str]:
    """Walk a decoded content stream's text operators: strings shown by
    Tj / ' / \" / TJ accumulate into lines; Td / TD / T* (and ') start a
    new line. Covers the simple single-byte-font PDFs the reference's
    well files are; CID/Type0 multi-byte encodings are out of scope
    (pdfplumber handles those when installed)."""
    lines: list[list[str]] = [[]]
    pending: list[str] = []
    i, n = 0, len(data)
    while i < n:
        c = data[i : i + 1]
        if c == b"(":
            s, i = _pdf_string(data, i)
            pending.append(s.decode("latin-1"))
        elif c == b"<" and data[i + 1 : i + 2] != b"<":
            j = data.find(b">", i)
            if j == -1:
                break
            hx = re.sub(rb"\s", b"", data[i + 1 : j])
            if len(hx) % 2:
                hx += b"0"
            try:
                pending.append(bytes.fromhex(hx.decode("ascii")).decode("latin-1"))
            except ValueError:
                pass
            i = j + 1
        elif c.isalpha() or c in (b"'", b'"', b"*"):
            j = i
            while j < n and not data[j : j + 1].isspace() and data[j : j + 1] not in (
                b"(", b"<", b"[", b"]", b"/",
            ):
                j += 1
            op = data[i:j]
            if op in (b"'", b'"'):
                lines.append([])
                lines[-1].extend(pending)
                pending.clear()
            elif op in (b"Tj", b"TJ"):
                lines[-1].extend(pending)
                pending.clear()
            elif op in (b"Td", b"TD", b"T*"):
                lines.append([])
                pending.clear()
            elif op in (b"BT", b"ET"):
                pending.clear()
            i = j
        else:
            i += 1
    return ["".join(parts) for parts in lines if parts]


def _inflate_stream(head: bytes, raw: bytes) -> bytes | None:
    """Inflate a FlateDecode stream body. /Length is authoritative when
    it is a direct integer — EOL-stripping heuristics CANNOT be: zlib
    data may legitimately end in 0x0D or 0x0A, and stripping a real
    final byte truncates the stream (a fuzz-found failure). Indirect
    /Length (``7 0 R``) falls back to trying the plausible EOL slices
    in order until one inflates."""
    candidates = []
    # (?![0-9]) stops the capture backtracking into a digit prefix of an
    # indirect ref: without it, "/Length 17 0 R" matches "1" (the
    # lookahead rejects "7 0 R", so the engine retries one digit
    # shorter) and a bogus raw[:1] candidate is tried first.
    lm = re.search(rb"/Length\s+(\d+)(?![0-9])(?!\s+\d+\s+R)", head)
    if lm:
        candidates.append(raw[: int(lm.group(1))])
    for cut in (-2, -1, 0):
        c = raw[:cut] if cut else raw
        if c not in candidates:
            candidates.append(c)
    for c in candidates:
        try:
            return zlib.decompress(c)
        except zlib.error:
            continue
    return None


def decode_pdf_text(payload: bytes) -> str | None:
    """Pure-stdlib PDF text extraction (parity target:
    pdf_extraction.py:48-59's pdfplumber text layer): find every
    ``<<dict>> stream … endstream`` object, inflate /FlateDecode bodies
    with zlib, and collect the text-showing operators. Returns the
    page text joined by newlines, or None when the payload isn't a PDF
    or nothing survives decoding (caller falls back — same contract as
    the multimodal decoders)."""
    if payload[:5] != b"%PDF-":
        return None
    try:
        lines: list[str] = []
        for m in _STREAM_RE.finditer(payload):
            head, raw = m.group(1), m.group(2)
            if b"/FlateDecode" in head:
                body = _inflate_stream(head, raw)
                if body is None:
                    continue
            elif re.search(rb"/Filter\b", head):
                continue  # other filters (DCT, LZW, …) out of scope
            else:
                body = raw
                if body.endswith(b"\r\n"):
                    body = body[:-2]
                elif body.endswith(b"\n"):
                    body = body[:-1]
            if b"BT" in body:
                lines.extend(_content_stream_text(body))
        return "\n".join(lines) if lines else None
    except Exception:
        return None


def _text_layer(payload: bytes) -> str:
    """Text-layer extraction: pdfplumber when installed, else the
    stdlib ``decode_pdf_text`` path for real PDF bytes; non-PDF UTF-8
    payloads decode directly (plain-text folder fixtures) and anything
    else returns '' — the reference's empty-page fallback."""
    if payload[:5] == b"%PDF-":
        if _HAS_PDFPLUMBER:
            import io

            import pdfplumber

            with pdfplumber.open(io.BytesIO(payload)) as pdf:
                return "\n".join((p.extract_text() or "") for p in pdf.pages)
        return decode_pdf_text(payload) or ""
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
