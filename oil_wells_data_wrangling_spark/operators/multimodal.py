"""Multimodal-column operator family (SURVEY.md §2.C).

Treats media as opaque ``binary`` columns with typed metadata, processed
by Arrow-batched ``mapInPandas``. The Spark-side plumbing (schema,
batching, partition-preserving pass) is real, and two REAL decode paths
exist using only the standard library: ``decode_png`` (8-bit
non-interlaced PNG — zlib IDAT inflate + scanline unfiltering) and
``decode_wav`` (PCM WAV via the ``wave`` module). Payloads whose magic
bytes match route through the real decoder; anything else falls back to
``_decode_stub`` (deterministic pseudo-features), mirroring the
reference's optional-dependency gating (pdf_extraction.py:21-32). A
PIL/opencv decoder would slot in where ``decode_png`` sits, covering
compressed formats; the import gate below is kept for that.

The ORACLE queries synthesize 16-byte md5 payloads (not valid PNG/WAV),
so they exercise the stub path and stay exactly SQL-checkable; the real
decoders are exercised distributed over genuine bytes in
tests/test_multimodal_real.py.
"""

from __future__ import annotations

import struct
import zlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from oil_wells_data_wrangling_spark.plans.registry import register
from oil_wells_data_wrangling_spark.sources.readers import load_tables

try:  # compressed-format decoders would live here if the lib is present
    import PIL.Image  # noqa: F401

    _HAS_PIL = True
except Exception:
    _HAS_PIL = False

_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


def _decode_stub(payload: bytes) -> dict:
    """Deterministic fake 'decode': length + big-endian 4-byte magic.

    Fallback for payloads no real decoder claims; the surrounding
    batching/schema contract is identical to the real paths.
    """
    return {
        "n_bytes": len(payload),
        "magic": int.from_bytes(payload[:4], "big"),
    }


def decode_png(payload: bytes) -> dict | None:
    """Pure-stdlib PNG decode: 8-bit grayscale/RGB/RGBA, non-interlaced.

    Parses IHDR for dimensions, inflates the IDAT stream (zlib), and
    reverses the per-scanline filters (None/Sub/Up/Average/Paeth) to
    recover raw pixel bytes. Returns ``{width, height, channels,
    pixels}`` or None when the payload is not a PNG this decoder
    handles (caller falls back to the stub / a library decoder)."""
    if not payload.startswith(_PNG_MAGIC):
        return None
    try:
        return _decode_png_body(payload)
    except Exception:
        # Corrupt/truncated payload past the magic check (zlib.error,
        # short-read IndexError, bad chunk structs): degrade to the
        # documented None contract so one malformed record can't kill
        # a whole mapInPandas batch.
        return None


def _iter_png_chunks(payload: bytes):
    pos = 8
    while pos + 8 <= len(payload):
        (ln,) = struct.unpack(">I", payload[pos : pos + 4])
        typ = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + ln]
        pos += 12 + ln  # length + type + data + crc
        yield typ, data


def _parse_ihdr(data: bytes) -> tuple[int, int, int] | None:
    """(width, height, channels) for the profiles this decoder handles
    (8-bit gray/RGB/RGBA, non-interlaced), else None."""
    width, height, bitdepth, colortype, _comp, _filt, interlace = (
        struct.unpack(">IIBBBBB", data)
    )
    if bitdepth != 8 or interlace != 0 or colortype not in (0, 2, 6):
        return None
    return width, height, {0: 1, 2: 3, 6: 4}[colortype]


def _unfilter_scanlines(
    raw: bytes, width: int, height: int, channels: int
) -> bytes:
    """Reverse the five PNG scanline filters over an inflated
    image-data stream (shared by still-PNG and APNG frame decode)."""
    stride = width * channels
    out = bytearray()
    prev = bytearray(stride)
    p = 0
    for _y in range(height):
        f = raw[p]
        line = bytearray(raw[p + 1 : p + 1 + stride])
        if len(line) < stride:
            raise ValueError("short scanline")
        p += 1 + stride
        if f == 1:  # Sub
            for i in range(channels, stride):
                line[i] = (line[i] + line[i - channels]) & 0xFF
        elif f == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif f == 3:  # Average
            for i in range(stride):
                a = line[i - channels] if i >= channels else 0
                line[i] = (line[i] + (a + prev[i]) // 2) & 0xFF
        elif f == 4:  # Paeth
            for i in range(stride):
                a = line[i - channels] if i >= channels else 0
                b = prev[i]
                c = prev[i - channels] if i >= channels else 0
                pp = a + b - c
                pa, pb, pc = abs(pp - a), abs(pp - b), abs(pp - c)
                pr = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                line[i] = (line[i] + pr) & 0xFF
        out += line
        prev = line
    return bytes(out)


def _decode_png_body(payload: bytes) -> dict | None:
    width = height = channels = None
    idat = b""
    for typ, data in _iter_png_chunks(payload):
        if typ == b"IHDR":
            hdr = _parse_ihdr(data)
            if hdr is None:
                return None
            width, height, channels = hdr
        elif typ == b"IDAT":
            idat += data
        elif typ == b"IEND":
            break
    if width is None or not idat:
        return None
    return {
        "width": width,
        "height": height,
        "channels": channels,
        "pixels": _unfilter_scanlines(
            zlib.decompress(idat), width, height, channels
        ),
    }


def decode_apng(payload: bytes) -> dict | None:
    """Pure-stdlib animated-PNG (APNG) decode — the real-bytes path for
    video-style frame sampling. Parses acTL/fcTL/fdAT chunks; each
    frame must be full-frame (x/y offset 0, frame dims = image dims,
    no inter-frame blending) so every frame is an independent image —
    the profile a frame-sampling pipeline stores. Returns ``{width,
    height, channels, frames: [pixel-bytes, ...]}`` or None for
    payloads that aren't APNG / use features outside this profile
    (caller falls back to the stub or a library decoder)."""
    if not payload.startswith(_PNG_MAGIC):
        return None
    try:
        width = height = channels = None
        n_frames = None
        # ordered per-frame compressed streams; fcTL starts a new frame
        frames_z: list[bytes] = []
        first_frame_has_fctl = False
        for typ, data in _iter_png_chunks(payload):
            if typ == b"IHDR":
                hdr = _parse_ihdr(data)
                if hdr is None:
                    return None
                width, height, channels = hdr
            elif typ == b"acTL":
                n_frames = struct.unpack(">I", data[:4])[0]
            elif typ == b"fcTL":
                fw, fh, fx, fy = struct.unpack(">IIII", data[4:20])
                dispose, blend = data[24], data[25]
                if (fw, fh, fx, fy) != (width, height, 0, 0) or blend != 0:
                    return None  # sub-frame updates: out of profile
                frames_z.append(b"")
                first_frame_has_fctl = True
            elif typ == b"IDAT":
                if not first_frame_has_fctl:
                    return None  # IDAT outside the animation: still PNG
                frames_z[0] += data
            elif typ == b"fdAT":
                if not frames_z:
                    return None
                frames_z[-1] += data[4:]  # strip sequence number
            elif typ == b"IEND":
                break
        if n_frames is None or not frames_z or len(frames_z) != n_frames:
            return None
        frames = [
            _unfilter_scanlines(zlib.decompress(z), width, height, channels)
            for z in frames_z
        ]
        return {
            "width": width,
            "height": height,
            "channels": channels,
            "frames": frames,
        }
    except Exception:
        return None


_PIL_CHANNELS = {"L": 1, "RGB": 3, "RGBA": 4}


def decode_image_pil(payload: bytes) -> dict | None:
    """Import-gated compressed-format decode (JPEG/GIF/WebP/…) via PIL,
    normalized to ``decode_png``'s contract: {width, height, channels,
    pixels}. Returns None when PIL is absent or refuses the payload —
    the same degrade-don't-fail contract as the stdlib decoders.

    Unlike the stdlib PNG path this is NOT bit-deterministic across
    library versions (JPEG decode is implementation-dependent), so
    oracle-checked queries never depend on its output; it exists for
    real corpora where compressed formats dominate, gated exactly like
    onnxruntime in inference and playwright in the fetch source."""
    if not _HAS_PIL:
        return None
    import io

    import PIL.Image

    try:
        with PIL.Image.open(io.BytesIO(payload)) as im:
            mode = im.mode if im.mode in _PIL_CHANNELS else "RGB"
            conv = im.convert(mode)
            return {
                "width": conv.width,
                "height": conv.height,
                "channels": _PIL_CHANNELS[mode],
                "pixels": conv.tobytes(),
            }
    except Exception:
        return None


def decode_image(payload: bytes) -> dict | None:
    """Decoder chain: stdlib PNG first (deterministic, oracle-grade),
    then PIL for compressed formats when importable, else None (the
    caller stubs). Order matters — a PNG must decode identically with
    or without PIL installed, so the deterministic path always wins."""
    return decode_png(payload) or decode_image_pil(payload)


_JPEG_SOI = b"\xff\xd8"


def jpeg_dims(payload: bytes) -> dict | None:
    """Stdlib JPEG header parse: walk the marker stream to the first
    SOF0-3 segment and read the frame dimensions — so genuine JPEG
    bytes yield REAL width/height/channels even on hosts without PIL.
    ``pixels`` is None (entropy-coded scan decode is exactly what the
    import-gated PIL path exists for); callers treat a dims-only hit
    as metadata override + byte passthrough.

    The ``len >= 32`` gate is deliberate: a real JPEG's mandatory
    segments can't fit under that, and it makes the synthesized
    16-byte md5 payloads the oracle queries use structurally unable to
    collide with this parser."""
    if len(payload) < 32 or not payload.startswith(_JPEG_SOI):
        return None
    i, n = 2, len(payload)
    while i + 4 <= n:
        if payload[i] != 0xFF:
            return None
        marker = payload[i + 1]
        if marker == 0xFF:  # fill byte before a marker
            i += 1
            continue
        if marker in (0x01, 0xD8) or 0xD0 <= marker <= 0xD7:
            i += 2  # standalone markers carry no length
            continue
        if marker in (0xD9, 0xDA):  # EOI / SOS before any SOF: malformed
            return None
        seg_len = int.from_bytes(payload[i + 2 : i + 4], "big")
        if seg_len < 2 or i + 2 + seg_len > n:
            return None
        if 0xC0 <= marker <= 0xC3:  # SOF0-3: baseline/extended/prog/lossless
            if seg_len < 8:
                return None
            h = int.from_bytes(payload[i + 5 : i + 7], "big")
            w = int.from_bytes(payload[i + 7 : i + 9], "big")
            nch = payload[i + 9]
            if w == 0 or h == 0 or nch not in (1, 3, 4):
                return None
            return {"width": w, "height": h, "channels": nch, "pixels": None}
        i += 2 + seg_len
    return None


def decode_image_meta(payload: bytes) -> dict | None:
    """Full metadata chain: pixel decoders first (PNG stdlib, then
    gated PIL), then the dims-only JPEG header parse — a genuine JPEG
    on a PIL-less host still reports its true frame size."""
    return decode_image(payload) or jpeg_dims(payload)


def nn_resize(
    pixels: bytes, w: int, h: int, channels: int, new_w: int, new_h: int
) -> bytes:
    """Nearest-neighbor resample — integer source indexing (floor of
    i*src/dst), bit-deterministic across machines."""
    out = bytearray(new_w * new_h * channels)
    for y in range(new_h):
        sy = y * h // new_h
        src_row = sy * w * channels
        dst_row = y * new_w * channels
        for x in range(new_w):
            sx = x * w // new_w
            s = src_row + sx * channels
            d = dst_row + x * channels
            out[d : d + channels] = pixels[s : s + channels]
    return bytes(out)


def decode_wav(payload: bytes) -> dict | None:
    """Pure-stdlib PCM WAV decode via the ``wave`` module: sample rate,
    16-bit mono/stereo samples (stereo averaged to mono with integer
    arithmetic). Returns ``{sample_rate, n_frames, dur_ms, samples}``
    or None for payloads that aren't PCM WAV."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        return None
    import array
    import io
    import wave

    try:
        with wave.open(io.BytesIO(payload)) as wv:
            sr = wv.getframerate()
            nch = wv.getnchannels()
            sw = wv.getsampwidth()
            n = wv.getnframes()
            frames = wv.readframes(n)
    except Exception:
        # wave raises EOFError (not wave.Error) on truncated headers;
        # catch everything so malformed audio degrades to None rather
        # than failing the Spark task.
        return None
    if sr <= 0 or sw != 2 or nch not in (1, 2):
        return None
    # a truncated data chunk can return a partial frame; drop the tail
    # so the int16 view below can't raise on an odd byte count
    frames = frames[: len(frames) - len(frames) % (2 * nch)]
    samples = array.array("h")
    samples.frombytes(frames)
    if nch == 2:
        mono = array.array(
            "h",
            (
                (samples[2 * i] + samples[2 * i + 1]) // 2
                for i in range(len(samples) // 2)
            ),
        )
        samples = mono
    return {
        "sample_rate": sr,
        "n_frames": n,
        "dur_ms": n * 1000 // sr,
        "samples": samples,
    }


def decode_features(df: DataFrame) -> DataFrame:
    """mapInPandas over (doc_id, payload binary, width int, height int) →
    per-item features. Arrow moves the binary column zero-copy per batch;
    partitioning is preserved (narrow op, no shuffle)."""

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = pdf["payload"].map(_decode_stub)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": feats.map(lambda f: f["n_bytes"]).astype("int32"),
                    "magic": feats.map(lambda f: f["magic"]).astype("int64"),
                    "width": pdf["width"],
                    "thumb_w": (pdf["width"] // 2).astype("int32"),
                }
            )

    return df.mapInPandas(
        _batches,
        schema="doc_id long, n_bytes int, magic long, width int, thumb_w int",
    )


_RESIZE_ORACLE = """
WITH img AS (
  SELECT doc_id,
         CAST(16 + n_chars % 640 AS INTEGER) AS w,
         CAST(16 + (n_chars * 3) % 480 AS INTEGER) AS h
  FROM documents
)
SELECT doc_id, w, h,
       CAST(CASE WHEN w >= h THEN 224 ELSE (w * 224) // h END AS INTEGER) AS new_w,
       CAST(CASE WHEN h >= w THEN 224 ELSE (h * 224) // w END AS INTEGER) AS new_h,
       CAST(NULL AS VARCHAR) AS thumb_fp
FROM img
"""


def resize_features(media: DataFrame) -> DataFrame:
    """Fit each image into a 224×224 box preserving aspect ratio with
    integer arithmetic (deterministic — no float scale factor), over
    (doc_id, payload binary, w int, h int).

    Payloads carrying a real PNG take the REAL path: header dimensions
    override the metadata (w, h) and the pixels are nearest-neighbor
    resampled to the target box (``decode_png`` + ``nn_resize``).
    Genuine JPEGs decode pixels through the import-gated PIL path when
    the library is present; without it, the stdlib SOF header parse
    still overrides (w, h) with the true frame size and the bytes pass
    through unthumbnailed. Anything else keeps the metadata dims and
    passes bytes through untouched (stub path — the oracle queries use
    it)."""

    import hashlib

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            w = pdf["w"].astype("int64").copy()
            h = pdf["h"].astype("int64").copy()
            decoded = {}
            for idx in pdf.index:
                payload = bytes(pdf.at[idx, "payload"])
                # full chain: stdlib PNG, then gated PIL for compressed
                # formats, then dims-only JPEG header parse (real frame
                # size, no pixels); synthesized non-image payloads fall
                # through to the metadata path either way
                img = decode_image_meta(payload)
                if img is not None:
                    if img["pixels"] is not None:
                        decoded[idx] = img
                    w.at[idx] = img["width"]
                    h.at[idx] = img["height"]
            new_w = pd.Series(
                [224 if wi >= hi else (wi * 224) // hi for wi, hi in zip(w, h)],
                index=pdf.index,
            )
            new_h = pd.Series(
                [224 if hi >= wi else (hi * 224) // wi for wi, hi in zip(w, h)],
                index=pdf.index,
            )
            thumb_fp = pd.Series([None] * len(pdf), index=pdf.index, dtype=object)
            for idx, img in decoded.items():
                thumb = nn_resize(
                    img["pixels"],
                    img["width"],
                    img["height"],
                    img["channels"],
                    int(new_w.at[idx]),
                    int(new_h.at[idx]),
                )
                thumb_fp.at[idx] = hashlib.md5(thumb).hexdigest()
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "w": w.astype("int32"),
                    "h": h.astype("int32"),
                    "new_w": new_w.astype("int32"),
                    "new_h": new_h.astype("int32"),
                    "thumb_fp": thumb_fp,
                }
            )

    return media.mapInPandas(
        _batches,
        schema="doc_id long, w int, h int, new_w int, new_h int, thumb_fp string",
    )


@register("mm_resize", oracle=_RESIZE_ORACLE)
def mm_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image resize plumbing over synthesized (non-PNG) payloads — the
    stub branch of ``resize_features``; the PNG branch is exercised on
    real bytes in tests/test_multimodal_real.py."""
    t = load_tables(spark, sf_dir)
    media = t.documents.select(
        "doc_id",
        F.unhex(F.md5("text")).alias("payload"),
        (F.lit(16) + F.col("n_chars") % 640).cast("int").alias("w"),
        (F.lit(16) + (F.col("n_chars") * 3) % 480).cast("int").alias("h"),
    )
    return resize_features(media)


_FRAME_ORACLE = """
WITH v AS (
  SELECT doc_id, n_chars % 7 + 2 AS n_frames, text FROM documents
),
frames AS (
  SELECT doc_id, n_frames,
         list_transform(range(0, n_frames), i -> md5(text || '_' || CAST(i AS VARCHAR)))
           AS frame_hashes
  FROM v
),
sampled AS (
  SELECT doc_id, n_frames,
         list_filter(list_transform(range(0, n_frames),
                     i -> CASE WHEN i % 2 = 0 THEN frame_hashes[i + 1] END),
                     x -> x IS NOT NULL) AS kept
  FROM frames
)
SELECT doc_id,
       CAST(n_frames AS INTEGER) AS n_frames,
       CAST(len(kept) AS INTEGER) AS n_sampled,
       md5(array_to_string(kept, '')) AS sample_fp
FROM sampled
"""


def frame_sample_features(media: DataFrame) -> DataFrame:
    """Stride-2 frame sampling over (doc_id, payload binary nullable,
    text, n_frames).

    Rows whose payload is a real APNG take the REAL path: the container
    is decoded (``decode_apng``), the frame count comes from the file's
    own acTL — overriding the metadata ``n_frames`` — every 2nd frame's
    raw pixels are kept, and ``sample_fp`` is the md5 of the
    concatenated sampled pixel bytes. Anything else (NULL payload,
    non-APNG bytes, out-of-profile animations) runs the md5-chain stub
    over (text, n_frames) — the oracle queries use that branch, the
    real branch is pinned by tests/test_multimodal_real.py."""
    import hashlib

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            n_frames = pdf["n_frames"].astype("int32").copy()
            n_sampled = []
            fps = []
            for idx in pdf.index:
                payload = pdf.at[idx, "payload"]
                vid = (
                    decode_apng(bytes(payload)) if payload is not None else None
                )
                if vid is not None:
                    kept_px = vid["frames"][::2]
                    n_frames.at[idx] = len(vid["frames"])
                    n_sampled.append(len(kept_px))
                    fps.append(hashlib.md5(b"".join(kept_px)).hexdigest())
                else:
                    n = int(n_frames.at[idx])
                    text = pdf.at[idx, "text"]
                    kept = [
                        hashlib.md5(f"{text}_{i}".encode()).hexdigest()
                        for i in range(n)
                    ][::2]
                    n_sampled.append(len(kept))
                    fps.append(hashlib.md5("".join(kept).encode()).hexdigest())
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_frames": n_frames,
                    "n_sampled": pd.Series(
                        n_sampled, dtype="int32", index=pdf.index
                    ),
                    "sample_fp": pd.Series(fps, index=pdf.index),
                }
            )

    return media.mapInPandas(
        _batches,
        schema="doc_id long, n_frames int, n_sampled int, sample_fp string",
    )


@register("mm_frame_sample", oracle=_FRAME_ORACLE)
def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video-style frame sampling: each document synthesizes an n-frame
    chain, the Arrow-batched sampler keeps every 2nd frame and emits a
    fingerprint of the sample. This registered form feeds the stub
    branch (md5-chain synthesis — exactly checkable against SQL); real
    APNG bytes exercise the same ``frame_sample_features`` plumbing via
    the decode branch in tests/test_multimodal_real.py."""
    t = load_tables(spark, sf_dir)
    media = t.documents.select(
        "doc_id",
        F.lit(None).cast("binary").alias("payload"),
        F.col("text"),
        (F.col("n_chars") % 7 + 2).cast("int").alias("n_frames"),
    )
    return frame_sample_features(media)


_MM_ORACLE = """
SELECT doc_id,
       CAST(16 AS INTEGER) AS n_bytes,
       CAST('0x' || substr(md5(text), 1, 8) AS BIGINT) AS magic,
       CAST(16 + n_chars % 640 AS INTEGER) AS width,
       CAST((16 + n_chars % 640) // 2 AS INTEGER) AS thumb_w
FROM documents
"""


@register("mm_meta", oracle=_MM_ORACLE)
def mm_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column pipeline: synthesize payload (md5 digest bytes) +
    metadata, run the Arrow-batched decode stub, return typed features."""
    t = load_tables(spark, sf_dir)
    media = t.documents.select(
        "doc_id",
        F.unhex(F.md5("text")).alias("payload"),
        (F.lit(16) + F.col("n_chars") % 640).cast("int").alias("width"),
        F.lit(9).cast("int").alias("height"),
    )
    return decode_features(media)


_AUDIO_ORACLE = """
WITH a AS (
  SELECT doc_id, text,
         CAST(8000 + (n_chars % 3) * 4000 AS INTEGER) AS sample_rate,
         CAST(500 + (n_chars * 7) % 30000 AS BIGINT) AS dur_ms
  FROM documents
),
c AS (
  SELECT doc_id, sample_rate, dur_ms,
         CAST((dur_ms + 4999) // 5000 AS INTEGER) AS n_chunks,
         list_transform(range(0, CAST((dur_ms + 4999) // 5000 AS INTEGER)),
                        i -> md5(text || '@' || CAST(i AS VARCHAR))) AS chunks
  FROM a
)
SELECT doc_id, sample_rate, dur_ms, n_chunks,
       md5(array_to_string(chunks, '')) AS chunk_fp,
       CAST(list_sum(list_transform(chunks,
            h -> CAST('0x' || substr(h, 1, 2) AS BIGINT))) AS BIGINT)
         AS level_sum
FROM c
"""


@register("mm_audio_chunks", oracle=_AUDIO_ORACLE)
def mm_audio_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio chunking plumbing: each document synthesizes a clip
    (sample rate + duration from n_chars), the Arrow-batched stub
    'decodes' it into fixed 5-second chunks — the windowing a real
    soundfile/librosa loader would feed an audio encoder — and emits
    chunk count, a chunk-sequence fingerprint, and a pseudo level sum
    (first hash byte per chunk standing in for RMS). md5-chain synthesis
    keeps this UDF path exactly oracle-checkable, like mm_frame_sample."""
    import hashlib

    t = load_tables(spark, sf_dir)
    media = t.documents.select(
        "doc_id",
        "text",
        (8000 + (F.col("n_chars") % 3) * 4000).cast("int").alias("sample_rate"),
        (500 + (F.col("n_chars") * 7) % 30000).cast("bigint").alias("dur_ms"),
    )

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            n_chunks = ((pdf["dur_ms"] + 4999) // 5000).astype("int32")
            hashes = [
                [
                    hashlib.md5(f"{text}@{i}".encode()).hexdigest()
                    for i in range(n)
                ]
                for text, n in zip(pdf["text"], n_chunks)
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "sample_rate": pdf["sample_rate"].astype("int32"),
                    "dur_ms": pdf["dur_ms"],
                    "n_chunks": n_chunks,
                    "chunk_fp": [
                        hashlib.md5("".join(hs).encode()).hexdigest()
                        for hs in hashes
                    ],
                    "level_sum": pd.Series(
                        [sum(int(h[:2], 16) for h in hs) for hs in hashes],
                        dtype="int64",
                    ),
                }
            )

    return media.mapInPandas(
        _batches,
        schema=(
            "doc_id long, sample_rate int, dur_ms long, n_chunks int,"
            " chunk_fp string, level_sum long"
        ),
    )


def wav_chunk_features(df: DataFrame) -> DataFrame:
    """REAL-decode twin of mm_audio_chunks over (doc_id, payload) with
    PCM WAV bytes: ``decode_wav`` (stdlib ``wave``) recovers sample rate
    and 16-bit samples, which are windowed into 5-second chunks; the
    per-chunk level is the integer mean absolute amplitude, summed —
    the exact windowing a soundfile/librosa loader would feed an audio
    encoder, with integer arithmetic end to end so results are
    bit-deterministic. Non-WAV payloads yield NULL features (the
    optional-dependency contract the stub operators document)."""

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {
                "doc_id": list(pdf["doc_id"]),
                "sample_rate": [],
                "dur_ms": [],
                "n_chunks": [],
                "level_sum": [],
            }
            for payload in pdf["payload"]:
                a = decode_wav(bytes(payload))
                if a is None:
                    for k in ("sample_rate", "dur_ms", "n_chunks", "level_sum"):
                        out[k].append(None)
                    continue
                sr, samples = a["sample_rate"], a["samples"]
                chunk = 5 * sr
                n_chunks = max(1, (len(samples) + chunk - 1) // chunk)
                level_sum = 0
                for ci in range(n_chunks):
                    part = samples[ci * chunk : (ci + 1) * chunk]
                    if len(part):
                        level_sum += sum(abs(x) for x in part) // len(part)
                out["sample_rate"].append(sr)
                out["dur_ms"].append(a["dur_ms"])
                out["n_chunks"].append(n_chunks)
                out["level_sum"].append(level_sum)
            yield pd.DataFrame(
                {
                    "doc_id": out["doc_id"],
                    "sample_rate": pd.Series(out["sample_rate"], dtype="Int32"),
                    "dur_ms": pd.Series(out["dur_ms"], dtype="Int64"),
                    "n_chunks": pd.Series(out["n_chunks"], dtype="Int32"),
                    "level_sum": pd.Series(out["level_sum"], dtype="Int64"),
                }
            )

    return df.mapInPandas(
        _batches,
        schema=(
            "doc_id long, sample_rate int, dur_ms long, n_chunks int,"
            " level_sum long"
        ),
    )


# ---------------------------------------------------------------- mm_scene_cut

_CUT_THRESHOLD = 230  # frame-difference level that marks a hard cut

_SCENE_CUT_ORACLE = f"""
WITH v AS (
  SELECT doc_id, text,
         CAST(24 + (n_chars * 5) % 240 AS INTEGER) AS n_frames
  FROM documents
),
f AS (
  SELECT doc_id, n_frames,
         unnest(range(n_frames)) AS frame
  FROM v
),
d AS (
  SELECT f.doc_id, f.n_frames, f.frame,
         CAST('0x' || substr(md5(md5(v.text) || '#' || f.frame), 1, 2)
              AS INTEGER) AS diff
  FROM f JOIN v ON f.doc_id = v.doc_id
),
s AS (
  SELECT *, SUM(CASE WHEN frame = 0 OR diff >= {_CUT_THRESHOLD}
                     THEN 1 ELSE 0 END)
            OVER (PARTITION BY doc_id ORDER BY frame) AS scene_id
  FROM d
),
scenes AS (
  SELECT doc_id, n_frames, scene_id, COUNT(*) AS scene_len
  FROM s GROUP BY doc_id, n_frames, scene_id
)
SELECT doc_id,
       CAST(n_frames AS INTEGER) AS n_frames,
       CAST(COUNT(*) AS BIGINT) AS n_scenes,
       CAST(MAX(scene_len) AS BIGINT) AS max_scene_len,
       CAST(MIN(scene_len) AS BIGINT) AS min_scene_len
FROM scenes GROUP BY doc_id, n_frames
"""


@register("mm_scene_cut", oracle=_SCENE_CUT_ORACLE)
def mm_scene_cut(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video scene segmentation plumbing: each document synthesizes a
    clip (frame count from n_chars), a deterministic per-frame
    difference metric stands in for the histogram/SSIM delta a real
    decoder would emit (md5 over the doc's digest + frame index —
    exactly oracle-checkable, like mm_frame_sample's synthesis, and
    the text is hashed once per doc, not once per frame), frames at or
    above the cut threshold open a new scene, and scene lengths fall
    out as differences between consecutive cut positions. Output:
    per-video scene count and extremal scene lengths — the shot table
    a frame-sampler or clip-encoder consumes downstream.

    Scale shape: MAP-ONLY. Because a clip's frames are bounded (≤264)
    and derived per document, the whole segmentation is per-row array
    arithmetic — cut positions via one filter over the frame range,
    lengths via one zip_with over the shifted bounds — so there is NO
    explode, NO shuffle, and NO sort (the first cut measured 31× at
    the 100× spot-check from hashing full text per frame; an
    explode+window rewrite still paid a 72M-row exchange+sort).
    The oracle keeps the explode+window SQL formulation — same
    result, independently derived, which is exactly what an oracle is
    for. When frames arrive as ROWS (a real video table), the
    sessionize flag-and-prefix-sum pattern over a doc-partitioned
    window is the shape to use — events_sessionize is that operator."""
    t = load_tables(spark, sf_dir)
    v = t.documents.select(
        "doc_id",
        F.md5("text").alias("td"),
        (24 + (F.col("n_chars") * 5) % 240).cast("int").alias("n_frames"),
    )
    cuts = (
        "filter(sequence(1, n_frames - 1), i -> "
        "cast(conv(substr(md5(concat(td, '#', cast(i as string))), 1, 2),"
        " 16, 10) as int) >= "
        f"{_CUT_THRESHOLD})"
    )
    bounds = v.select(
        "doc_id",
        "n_frames",
        F.expr(f"concat(array(0), {cuts}, array(n_frames))").alias("bounds"),
    )
    lens = (
        "zip_with(slice(bounds, 1, size(bounds) - 1), "
        "slice(bounds, 2, size(bounds) - 1), (a, b) -> b - a)"
    )
    return bounds.select(
        "doc_id",
        "n_frames",
        F.expr(f"cast(size({lens}) as bigint)").alias("n_scenes"),
        F.expr(f"cast(array_max({lens}) as bigint)").alias("max_scene_len"),
        F.expr(f"cast(array_min({lens}) as bigint)").alias("min_scene_len"),
    )


# ------------------------------------------------------------ mm_phash_dedup

def phash64(img: dict) -> int:
    """64-bit difference hash (dHash) of a decoded image: downsample to
    a 9×8 grayscale grid with the deterministic nearest-neighbor
    resampler, then emit one bit per horizontal neighbor pair
    (left < right). Integer luma (299/587/114 // 1000) — every step is
    integer arithmetic over ``decode_png``'s deterministic pixels, so
    the hash is bit-stable across machines. Returned as SIGNED int64
    (wrapped) so it stores in a Spark ``long`` column.

    dHash survives uniform rescaling (the 9×8 grid samples the same
    relative positions) and small recompressions — the standard cheap
    perceptual bucketing for image dedup; exact-match grouping on it is
    the image-side analogue of ``dedup_exact``'s md5 grouping."""
    ch = img["channels"]
    g = nn_resize(img["pixels"], img["width"], img["height"], ch, 9, 8)
    bits = 0
    for row in range(8):
        base = row * 9 * ch
        prev = None
        for col in range(9):
            p = base + col * ch
            if ch >= 3:
                luma = (
                    g[p] * 299 + g[p + 1] * 587 + g[p + 2] * 114
                ) // 1000
            else:
                luma = g[p]
            if prev is not None:
                bits = (bits << 1) | (1 if prev < luma else 0)
            prev = luma
    return bits - (1 << 64) if bits >= (1 << 63) else bits


def phash_features(media: DataFrame) -> DataFrame:
    """(doc_id, phash) over (doc_id, payload binary): real images (PNG
    stdlib, then gated PIL) hash via :func:`phash64`; payloads no
    decoder claims fall back to the first 7 payload bytes big-endian —
    deterministic, positive, and exactly SQL-checkable, the same
    stub-path contract as every mm_* oracle. Map-only Arrow pass; the
    binary column never shuffles."""

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = []
            for idx in pdf.index:
                payload = bytes(pdf.at[idx, "payload"])
                img = decode_image(payload)
                if img is not None and img["pixels"] is not None:
                    out.append(phash64(img))
                else:
                    out.append(int.from_bytes(payload[:7], "big"))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "phash": pd.Series(out, index=pdf.index, dtype="int64"),
                }
            )

    return media.mapInPandas(_batches, "doc_id long, phash long")


_PHASH_ORACLE = """
WITH m AS (
  SELECT doc_id, md5(text) AS hx FROM documents
  UNION ALL
  SELECT doc_id + 1000000 AS doc_id, md5(text) AS hx
  FROM documents WHERE doc_id % 10 = 0
)
SELECT CAST(MIN(doc_id) AS BIGINT) AS keep_id,
       CAST(COUNT(*) AS BIGINT) AS n_copies
FROM m GROUP BY CAST('0x' || substr(hx, 1, 14) AS BIGINT)
"""


@register("mm_phash_dedup", oracle=_PHASH_ORACLE)
def mm_phash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual-hash image dedup — the image-side ``dedup_exact``:
    group media by dHash, keep the lowest doc_id per group. The
    registered query runs the stub branch over synthesized payloads
    (every 10th doc's payload re-issued under a new id, so every group
    either is a singleton or has its planted copy); genuine PNG bytes
    — including a 2× rescaled copy hashing IDENTICALLY — are exercised
    distributed in tests/test_multimodal_real.py.

    Scale shape: hashing is map-only Arrow (bytes never shuffle); the
    exchange carries (8-byte phash, doc_id) pairs only, exactly like
    text dedup_exact's md5 grouping. A Hamming-tolerant variant would
    band the 64 bits like dedup_minhash's LSH bands — same exchange
    shape."""
    t = load_tables(spark, sf_dir)
    base = t.documents.select("doc_id", F.unhex(F.md5("text")).alias("payload"))
    # single-scan 2-layer synthesis (r16, guide §6): the dups branch
    # re-scanned documents AND re-derived the payload; the explode
    # reuses the one projected payload — at scale this halves the
    # heavy-bytes reads
    imgs = base.select(
        F.explode(
            F.expr(
                "filter(array(struct(doc_id, payload), "
                "struct(doc_id + 1000000L as doc_id, payload)), "
                "(x, i) -> i = 0 or doc_id % 10 = 0)"
            )
        ).alias("r")
    ).select("r.doc_id", "r.payload")
    return (
        phash_features(imgs)
        .groupBy("phash")
        .agg(
            F.min("doc_id").alias("keep_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
        .select("keep_id", "n_copies")
    )


# ---------------------------------------------------------- mm_phash_neardup

# Hamming-banded phash near-dup: split the (stub-path) 56-bit hash
# into 4 bands of 14 bits; two hashes within Hamming distance 3 are
# GUARANTEED to agree on some band (pigeonhole), distances 4-6 are
# caught when no band straddles — the LSH-band recall contract, on
# bits instead of minhashes. Band collisions propose pairs; the exact
# popcount-of-xor filter keeps those within the threshold.
_PH_BANDS = 4
_PH_BAND_BITS = 14
_PH_HAMMING_MAX = 6


_PHASH_ND_ORACLE = f"""
WITH m AS (
  SELECT doc_id, CAST('0x' || substr(md5(text), 1, 14) AS BIGINT) AS ph
  FROM documents
  UNION ALL
  SELECT doc_id + 1000000 AS doc_id,
         CAST('0x' || substr(md5(text), 1, 14) AS BIGINT) AS ph
  FROM documents WHERE doc_id % 10 = 0
),
bands AS (
  SELECT doc_id, ph, r.range AS band_id,
         (ph >> (r.range * {_PH_BAND_BITS})) & {(1 << _PH_BAND_BITS) - 1} AS bb
  FROM m, range(0, {_PH_BANDS}) r
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
         a.ph AS pa, b.ph AS pb
  FROM bands a JOIN bands b
    ON a.band_id = b.band_id AND a.bb = b.bb AND a.doc_id < b.doc_id
)
SELECT doc_a, doc_b,
       CAST(bit_count(xor(pa, pb)) AS BIGINT) AS hamming
FROM cand WHERE bit_count(xor(pa, pb)) <= {_PH_HAMMING_MAX}
"""


@register("mm_phash_neardup", oracle=_PHASH_ND_ORACLE)
def mm_phash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NEAR-duplicate images by banded perceptual hash — the Hamming
    half of the image dedup story (``mm_phash_dedup`` is exact-match):
    band collisions propose candidate pairs, an exact popcount-of-xor
    filter keeps pairs within Hamming distance 6. Distance ≤ 3 is
    recall-GUARANTEED by pigeonhole over the 4 bands; the registered
    stub-path demo plants distance-0 copies and lets random band
    collisions exercise the filter's reject side, while genuinely
    perturbed PNGs (a few pixels brightened → small true distance) are
    driven through the real decoder in tests/test_multimodal_real.py.

    Scale shape: identical to dedup_minhash's — hashing is map-only
    Arrow, the exchange carries (band bits, doc_id, 8-byte hash)
    scalars, candidate pairs are band-collision-bounded, and the
    Hamming filter runs on the pair row with two bigint intrinsics
    (xor + bit_count), no re-decode, no bytes."""
    t = load_tables(spark, sf_dir)
    base = t.documents.select("doc_id", F.unhex(F.md5("text")).alias("payload"))
    # single-scan 2-layer synthesis (r16, guide §6 — see mm_phash_dedup)
    imgs = base.select(
        F.explode(
            F.expr(
                "filter(array(struct(doc_id, payload), "
                "struct(doc_id + 1000000L as doc_id, payload)), "
                "(x, i) -> i = 0 or doc_id % 10 = 0)"
            )
        ).alias("r")
    ).select("r.doc_id", "r.payload")
    ph = phash_features(imgs)
    bands = (
        ph.select(
            "doc_id",
            F.col("phash").alias("ph"),
            F.explode(
                F.array(*[F.lit(b) for b in range(_PH_BANDS)])
            ).alias("band_id"),
        )
        .withColumn(
            "bb",
            F.expr(
                f"(ph >> (band_id * {_PH_BAND_BITS}))"
                f" & {(1 << _PH_BAND_BITS) - 1}"
            ),
        )
    )
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.bb") == F.col("b.bb"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.ph").alias("pa"),
            F.col("b.ph").alias("pb"),
        )
        .distinct()
    )
    return cand.select(
        "doc_a",
        "doc_b",
        F.expr("cast(bit_count(pa ^ pb) as bigint)").alias("hamming"),
    ).filter(F.col("hamming") <= _PH_HAMMING_MAX)


# ---------------------------------------------------------- mm_audio_neardup

# Audio near-dup by loudness ENVELOPE fingerprint: 64 per-chunk levels
# reduce to 63 sign-of-delta bits (bit i = level[i+1] > level[i]) — the
# shape-of-the-waveform signature that is invariant under uniform gain
# (scaling every level preserves every comparison), the property real
# audio dedup needs (same clip, different mastering volume). Banded
# exactly like mm_phash_neardup: 4 bands × 16 bits, pigeonhole
# guarantees recall at Hamming ≤ 3, exact popcount filter keeps ≤ 6.
_AE_LEVELS = 64
_AE_BITS = _AE_LEVELS - 1
_AE_BANDS = 4
_AE_BAND_BITS = 16
_AE_HAMMING_MAX = 6
# planted near-copies: every level bumped +3 mod 256 — a gain offset
# whose mod-256 wrap flips a delta bit only where a level sits in
# {253,254,255}, so true distances land small but nonzero.
_AE_GAIN = 3

_AUDIO_ND_ORACLE = f"""
WITH m AS (
  SELECT doc_id, 0 AS gain,
         md5(text) || md5(text || 'a') || md5(text || 'b') || md5(text || 'c')
           AS hx
  FROM documents
  UNION ALL
  SELECT doc_id + 1000000 AS doc_id, 0 AS gain,
         md5(text) || md5(text || 'a') || md5(text || 'b') || md5(text || 'c')
           AS hx
  FROM documents WHERE doc_id % 10 = 0
  UNION ALL
  SELECT doc_id + 2000000 AS doc_id, {_AE_GAIN} AS gain,
         md5(text) || md5(text || 'a') || md5(text || 'b') || md5(text || 'c')
           AS hx
  FROM documents WHERE doc_id % 7 = 0
),
lv AS (
  SELECT doc_id,
         list_transform(range(0, {_AE_LEVELS}),
           i -> (CAST('0x' || substr(hx, 2 * i + 1, 2) AS INTEGER) + gain)
                % 256) AS l
  FROM m
),
fp AS (
  SELECT doc_id,
         CAST(list_sum(list_transform(range(0, {_AE_BITS}),
           i -> CASE WHEN l[i + 2] > l[i + 1]
                     THEN CAST(1 AS BIGINT) << i ELSE CAST(0 AS BIGINT) END))
           AS BIGINT) AS fp
  FROM lv
),
bands AS (
  SELECT doc_id, fp, r.range AS band_id,
         (fp >> (r.range * {_AE_BAND_BITS})) & {(1 << _AE_BAND_BITS) - 1}
           AS bb
  FROM fp, range(0, {_AE_BANDS}) r
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
         a.fp AS fa, b.fp AS fb
  FROM bands a JOIN bands b
    ON a.band_id = b.band_id AND a.bb = b.bb AND a.doc_id < b.doc_id
)
SELECT doc_a, doc_b,
       CAST(bit_count(xor(fa, fb)) AS BIGINT) AS hamming
FROM cand WHERE bit_count(xor(fa, fb)) <= {_AE_HAMMING_MAX}
"""


def envelope_bits(levels: "list[int]") -> int:
    """63-bit sign-of-delta envelope from 64 integer levels — shared by
    the registered stub path and the real-WAV twin so both speak the
    same fingerprint language. Gain-invariant: any strictly increasing
    transform of the level scale leaves every bit unchanged."""
    fp = 0
    for i in range(len(levels) - 1):
        if levels[i + 1] > levels[i]:
            fp |= 1 << i
    return fp


def audio_envelope_fp(df: DataFrame, gain_col: str = "gain") -> DataFrame:
    """(doc_id, fp) envelope fingerprints from (doc_id, payload, gain)
    rows whose payload is a {_AE_LEVELS}-byte level sequence — the
    Arrow-batched 'decoder' stage. numpy does the per-batch work: one
    frombuffer view per payload, vectorized delta-compare, one
    packbits-style fold; no per-sample Python."""
    import numpy as np

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        weights = (1 << np.arange(_AE_BITS, dtype=np.int64))
        for pdf in it:
            fps = []
            for payload, gain in zip(pdf["payload"], pdf[gain_col]):
                arr = (
                    np.frombuffer(bytes(payload), dtype=np.uint8).astype(
                        np.int64
                    )
                    + int(gain)
                ) % 256
                bits = (arr[1:] > arr[:-1]).astype(np.int64)
                fps.append(int((bits * weights).sum()))
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "fp": pd.Series(fps, dtype="int64")}
            )

    return df.mapInPandas(_batches, schema="doc_id long, fp long")


@register("mm_audio_neardup", oracle=_AUDIO_ND_ORACLE)
def mm_audio_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NEAR-duplicate audio by banded envelope fingerprint — the audio
    member of the near-dup family (text: dedup_minhash; image:
    mm_phash_neardup): clips whose loudness envelope has the same
    shape are the same recording. The registered demo synthesizes
    64-byte level payloads, plants exact copies (every 10th doc,
    distance 0) and gain-bumped near-copies (every 7th doc, +3 mod 256
    — wrap flips a bit only where a level sits at the top of the
    range, so true distances are small but honest); genuine PCM WAV
    bytes — including a 2× amplitude remaster fingerprinting
    IDENTICALLY — run through the real ``decode_wav`` path in
    tests/test_multimodal_real.py.

    Scale shape: identical to mm_phash_neardup's — fingerprinting is
    map-only Arrow (bytes never shuffle), the exchange carries
    (16-bit band value, doc_id, 8-byte fp) scalars, candidates are
    band-collision-bounded (2^16 buckets per band keeps random
    collisions ~n²/65536 per band — negligible until n approaches the
    band space, when production widens the bands), and the Hamming
    filter is xor + bit_count on the pair row."""
    t = load_tables(spark, sf_dir)
    payload = F.unhex(
        F.concat(
            F.md5("text"),
            F.md5(F.concat(F.col("text"), F.lit("a"))),
            F.md5(F.concat(F.col("text"), F.lit("b"))),
            F.md5(F.concat(F.col("text"), F.lit("c"))),
        )
    )
    base = t.documents.select(
        "doc_id", F.lit(0).alias("gain"), payload.alias("payload")
    )
    # single-scan 3-layer synthesis (r16, guide §6 — see mm_phash_dedup):
    # base + exact copy (%10, gain 0) + gain-shifted near-dup (%7)
    # from one documents scan; the payload is projected once
    clips = base.select(
        F.explode(
            F.expr(
                f"filter(array(struct(doc_id, gain, payload), "
                f"struct(doc_id + 1000000L as doc_id, gain, payload), "
                f"struct(doc_id + 2000000L as doc_id,"
                f" {_AE_GAIN} as gain, payload)), "
                f"(x, i) -> i = 0 or (i = 1 and doc_id % 10 = 0)"
                f" or (i = 2 and doc_id % 7 = 0))"
            )
        ).alias("r")
    ).select("r.doc_id", "r.gain", "r.payload")
    fps = audio_envelope_fp(clips)
    bands = fps.select(
        "doc_id",
        "fp",
        F.explode(
            F.array(*[F.lit(b) for b in range(_AE_BANDS)])
        ).alias("band_id"),
    ).withColumn(
        "bb",
        F.expr(
            f"(fp >> (band_id * {_AE_BAND_BITS}))"
            f" & {(1 << _AE_BAND_BITS) - 1}"
        ),
    )
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.bb") == F.col("b.bb"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.fp").alias("fa"),
            F.col("b.fp").alias("fb"),
        )
        .distinct()
    )
    return cand.select(
        "doc_a",
        "doc_b",
        F.expr("cast(bit_count(fa ^ fb) as bigint)").alias("hamming"),
    ).filter(F.col("hamming") <= _AE_HAMMING_MAX)


# ------------------------------------------------------------ mm_caption_align

# Cross-modal pair audit (CLIP-score-shaped): every (image, caption)
# pair gets an alignment score from deterministic integer stub
# embeddings — 8×12-bit image features from the decoded bytes, 8×12-bit
# caption features from salted md5 — and is audited against a
# MISMATCHED caption (the next doc's, within source): a pair whose
# mismatched score is no worse than its own caption's is SUSPECT, the
# signal caption-pair curation drops or re-captions. The comparison is
# cosine-order-exact WITHOUT sqrt or FP: with one shared image vector,
# cos_m >= cos_x  <=>  dot_m² · ‖t_x‖² >= dot_x² · ‖t_m‖²  (all dots
# non-negative here), evaluated in arbitrary-precision ints (Python) /
# HUGEINT (DuckDB) — the model_score contract: a deterministic stub
# stands in for the model so the WHOLE path has an exact oracle, and
# the image-feature function is the single swap point for a real
# encoder. Real PNG payloads route through decode_png and take their
# features from DECODED PIXELS (tests/test_round11_ops.py drives
# genuine PNGs distributed); anything else uses the raw bytes, which
# is what the md5-payload oracle replays.
_CA_DIMS = 8
_CA_MOD = 4096


def _ca_img_vec(payload: bytes) -> list[int]:
    """8×12-bit image features: from decoded pixels when a real
    decoder claims the payload, else from the raw bytes (the stub/
    oracle path). Big-endian 16-bit words mod 4096."""
    img = decode_image(payload)
    src = img["pixels"] if img and "pixels" in img else payload
    src = (src + b"\x00" * (2 * _CA_DIMS))[: 2 * _CA_DIMS]
    return [
        ((src[2 * d] << 8) | src[2 * d + 1]) % _CA_MOD
        for d in range(_CA_DIMS)
    ]


def _ca_txt_vec(caption: str) -> list[int]:
    import hashlib

    return [
        int(
            hashlib.md5(f"cap{d}_{caption}".encode()).hexdigest()[:8], 16
        ) % _CA_MOD
        for d in range(_CA_DIMS)
    ]


def caption_align_features(pairs: DataFrame) -> DataFrame:
    """Arrow kernel over (source, payload, caption, caption_x) rows:
    integer dot products of the image vector against both captions and
    the exact suspect decision. Pure-int arithmetic — no FP, no
    rounding mode to drift."""

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {"source": [], "suspect": [], "dot_m": [], "dot_x": []}
            for src_name, payload, cap, cap_x in zip(
                pdf["source"], pdf["payload"], pdf["caption"], pdf["caption_x"]
            ):
                v = _ca_img_vec(bytes(payload))
                tm = _ca_txt_vec(cap)
                tx = _ca_txt_vec(cap_x)
                dot_m = sum(a * b for a, b in zip(v, tm))
                dot_x = sum(a * b for a, b in zip(v, tx))
                nt_m = sum(a * a for a in tm)
                nt_x = sum(a * a for a in tx)
                out["source"].append(src_name)
                out["suspect"].append(
                    int(dot_x * dot_x * nt_m >= dot_m * dot_m * nt_x)
                )
                out["dot_m"].append(dot_m)
                out["dot_x"].append(dot_x)
            yield pd.DataFrame(out)

    return pairs.mapInPandas(
        _batches,
        schema="source string, suspect int, dot_m long, dot_x long",
    )


def _ca_vec_sql(d: int, cap_expr: str) -> str:
    return (
        f"(CAST('0x' || substr(md5('cap{d}_' || {cap_expr}), 1, 8)"
        f" AS BIGINT) % {_CA_MOD})"
    )


def _ca_img_sql(d: int) -> str:
    # byte pair (2d, 2d+1) of the md5 digest = hex chars 4d+1 .. 4d+4
    return (
        f"(CAST('0x' || substr(md5(text), {4 * d + 1}, 4) AS BIGINT)"
        f" % {_CA_MOD})"
    )


def _ca_oracle() -> str:
    dot = lambda vf, tf: " + ".join(
        f"{vf(d)} * {tf(d)}" for d in range(_CA_DIMS)
    )
    nrm = lambda tf: " + ".join(f"{tf(d)} * {tf(d)}" for d in range(_CA_DIMS))
    tm = lambda d: _ca_vec_sql(d, "text")
    tx = lambda d: _ca_vec_sql(d, "cap2")
    return f"""
WITH p AS (
  SELECT source, text,
         LEAD(text) OVER (PARTITION BY source ORDER BY doc_id) AS cap2
  FROM documents
),
v AS (
  SELECT source,
         CAST({dot(_ca_img_sql, tm)} AS BIGINT) AS dot_m,
         CAST({dot(_ca_img_sql, tx)} AS BIGINT) AS dot_x,
         CAST({nrm(tm)} AS BIGINT) AS nt_m,
         CAST({nrm(tx)} AS BIGINT) AS nt_x
  FROM p WHERE cap2 IS NOT NULL
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_pairs,
       CAST(SUM(CASE WHEN CAST(dot_x AS HUGEINT) * dot_x * nt_m
                       >= CAST(dot_m AS HUGEINT) * dot_m * nt_x
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_suspect,
       CAST(SUM(dot_m) AS BIGINT) AS sum_dot_m,
       CAST(SUM(dot_x) AS BIGINT) AS sum_dot_x
FROM v GROUP BY source
"""


@register("mm_caption_align", oracle=_ca_oracle())
def mm_caption_align(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-modal (image, caption) alignment audit — the CLIP-score
    gate caption-pair corpora run before training: each image scores
    against its own caption AND a mismatched one (next doc in-source);
    pairs where the mismatch wins are SUSPECT. Deterministic integer
    stub embeddings on both sides (model_score's contract — exact
    oracle over the whole path, single swap point for real encoders);
    real PNG payloads take image features from decoded pixels.
    Per source: pairs, suspects, and both dot-product masses.

    Scale shape: the caption pairing is one source-keyed window over
    (source, text) rows; the Arrow exchange carries payload bytes +
    two captions per row (map-only, partition-inherited — no shuffle
    until the |sources|-group rollup); scoring is integer arithmetic
    per pair, embarrassingly parallel, and a real encoder slots in at
    `_ca_img_vec`/`_ca_txt_vec` with batch-amortized dispatch."""
    t = load_tables(spark, sf_dir)
    from pyspark.sql.window import Window

    w = Window.partitionBy("source").orderBy("doc_id")
    pairs = (
        t.documents.select(
            "doc_id",
            "source",
            F.unhex(F.md5("text")).alias("payload"),
            F.col("text").alias("caption"),
        )
        .withColumn("caption_x", F.lead("caption").over(w))
        .filter(F.col("caption_x").isNotNull())
        .select("source", "payload", "caption", "caption_x")
    )
    return caption_align_features(pairs).groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
        F.sum("suspect").cast("bigint").alias("n_suspect"),
        F.sum("dot_m").cast("bigint").alias("sum_dot_m"),
        F.sum("dot_x").cast("bigint").alias("sum_dot_x"),
    )
