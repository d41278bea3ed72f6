"""Multimodal-column operator family (SURVEY.md §2.C).

Treats media as opaque ``binary`` columns with typed metadata, processed
by Arrow-batched ``mapInPandas`` — the Spark-side plumbing (schema,
batching, partition-preserving pass) is real; the actual image decode is
STUBBED (no imaging libs in this environment) behind ``_decode_stub``,
which extracts deterministic pseudo-features so the pipeline is testable
end-to-end.

The test query synthesizes a 16-byte payload per document (md5 digest
bytes) plus width/height metadata; the DuckDB oracle recomputes the
expected features (payload length, 4-byte magic, thumbnail size)
directly from md5/text — so even the UDF path has an exact oracle.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from oil_wells_data_wrangling_spark.plans.registry import register
from oil_wells_data_wrangling_spark.sources.readers import load_tables

try:  # real decoder would live here; not available in this container
    import PIL.Image  # noqa: F401

    _HAS_PIL = True
except Exception:
    _HAS_PIL = False


def _decode_stub(payload: bytes) -> dict:
    """Deterministic fake 'decode': length + big-endian 4-byte magic.

    With an imaging lib present this is where Image.open(BytesIO(payload))
    would go; the surrounding batching/schema contract is unchanged.
    """
    return {
        "n_bytes": len(payload),
        "magic": int.from_bytes(payload[:4], "big"),
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
       CAST(CASE WHEN h >= w THEN 224 ELSE (h * 224) // w END AS INTEGER) AS new_h
FROM img
"""


@register("mm_resize", oracle=_RESIZE_ORACLE)
def mm_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image resize plumbing: fit each (w, h) into a 224×224 box
    preserving aspect ratio with integer arithmetic (deterministic —
    no float scale factor). The Arrow-batched stub computes target dims
    exactly where a PIL/opencv resample would run; payload bytes pass
    through untouched."""
    t = load_tables(spark, sf_dir)
    media = t.documents.select(
        "doc_id",
        F.unhex(F.md5("text")).alias("payload"),
        (F.lit(16) + F.col("n_chars") % 640).cast("int").alias("w"),
        (F.lit(16) + (F.col("n_chars") * 3) % 480).cast("int").alias("h"),
    )

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            w, h = pdf["w"], pdf["h"]
            new_w = [
                224 if wi >= hi else (wi * 224) // hi for wi, hi in zip(w, h)
            ]
            new_h = [
                224 if hi >= wi else (hi * 224) // wi for wi, hi in zip(w, h)
            ]
            # a real implementation resamples pdf["payload"] here
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "w": w,
                    "h": h,
                    "new_w": pd.Series(new_w, dtype="int32"),
                    "new_h": pd.Series(new_h, dtype="int32"),
                }
            )

    return media.mapInPandas(
        _batches, schema="doc_id long, w int, h int, new_w int, new_h int"
    )


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


@register("mm_frame_sample", oracle=_FRAME_ORACLE)
def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video-style frame sampling: each document synthesizes an n-frame
    binary payload (16 bytes per frame, md5 chain), the Arrow-batched
    stub 'decodes' it frame-by-frame, keeps every 2nd frame, and emits a
    fingerprint of the sample. The batching/stride plumbing is exactly
    what a real ffmpeg-backed sampler needs; only the decode is fake —
    and the md5-chain synthesis makes even this UDF path exactly
    checkable against SQL."""
    import hashlib

    t = load_tables(spark, sf_dir)
    media = t.documents.select(
        "doc_id",
        F.col("text"),
        (F.col("n_chars") % 7 + 2).cast("int").alias("n_frames"),
    )

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            frames = [
                [
                    hashlib.md5(f"{text}_{i}".encode()).hexdigest()
                    for i in range(n)
                ]
                for text, n in zip(pdf["text"], pdf["n_frames"])
            ]
            kept = [fs[::2] for fs in frames]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_frames": pdf["n_frames"].astype("int32"),
                    "n_sampled": pd.Series([len(k) for k in kept], dtype="int32"),
                    "sample_fp": [
                        hashlib.md5("".join(k).encode()).hexdigest() for k in kept
                    ],
                }
            )

    return media.mapInPandas(
        _batches,
        schema="doc_id long, n_frames int, n_sampled int, sample_fp string",
    )


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
