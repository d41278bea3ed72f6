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
