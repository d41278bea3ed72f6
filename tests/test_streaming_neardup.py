"""Streaming MinHash near-dup: duplicates arriving in a LATER micro-batch
must match against the bucket store built by earlier batches."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

from oil_wells_data_wrangling_spark.sources.readers import load_tables
from oil_wells_data_wrangling_spark.streaming.neardup import neardup_foreach_batch

_SCHEMA = StructType(
    [StructField("doc_id", LongType()), StructField("text", StringType())]
)


def test_cross_batch_neardup_detection(spark, sf_dir, tmp_path):
    docs = load_tables(spark, sf_dir).documents.select("doc_id", "text")
    src = tmp_path / "src"
    # batch 1: the original corpus; batch 2: near-dup copies of every 10th doc
    docs.coalesce(1).write.parquet(str(src / "batch0"))
    dups = docs.filter(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"),
        F.concat("text", F.lit(" near dup tail marker")).alias("text"),
    )
    n_planted = dups.count()
    dups.coalesce(1).write.parquet(str(src / "batch1"))

    store = str(tmp_path / "store")
    stream = (
        spark.readStream.schema(_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "batch*"))
    )
    q = (
        stream.writeStream.foreachBatch(neardup_foreach_batch(store))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    matches = spark.read.parquet(f"{store}/matches")
    planted_found = matches.filter(
        F.col("doc_b") == F.col("doc_a") + 1_000_000
    ).count()
    # LSH with 8x4 banding at ~0.9 shingle similarity: expect near-total recall
    assert planted_found >= 0.9 * n_planted, (planted_found, n_planted)
    # bucket store holds 8 bands per ingested doc
    n_docs = docs.count() + n_planted
    assert spark.read.parquet(f"{store}/buckets").count() == 8 * n_docs


def _parquet_file_count(root: str) -> int:
    import os

    return sum(
        1
        for dirpath, _d, files in os.walk(root)
        for f in files
        if f.endswith(".parquet")
    )


def test_store_file_count_bounded_across_many_batches(spark, sf_dir, tmp_path):
    """r5 verdict item 3: the state store must not grow one file-set per
    micro-batch. Across 12 batches with compaction every 4, the bucket
    store's parquet file count stays bounded (≤ compact_every × bands
    worth of appends since the last compaction), and the store stays
    readable + correct throughout."""
    docs = (
        load_tables(spark, sf_dir)
        .documents.select("doc_id", "text")
        .limit(60)
        .collect()
    )
    src = tmp_path / "src"
    n_batches = 12
    for i in range(n_batches):
        chunk = docs[i * 5 : (i + 1) * 5]
        spark.createDataFrame(
            [(r["doc_id"], r["text"]) for r in chunk], _SCHEMA
        ).coalesce(1).write.parquet(str(src / f"batch{i:02d}"))

    store = str(tmp_path / "store")
    stream = (
        spark.readStream.schema(_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "batch*"))
    )
    q = (
        stream.writeStream.foreachBatch(
            neardup_foreach_batch(store, compact_every=4)
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    buckets = spark.read.parquet(f"{store}/buckets")
    assert buckets.count() == 8 * n_batches * 5  # nothing lost to compaction
    # band-partitioned layout: band_id is a directory key
    import os

    assert any(
        seg.startswith("band_id=") for seg in os.listdir(f"{store}/buckets")
    )
    # 12 batches → last compaction at batch 12; the store is fully
    # compacted: one file per band partition (8), far below the 96+ an
    # append-only layout would hold. Allow headroom for commit markers.
    n_files = _parquet_file_count(f"{store}/buckets")
    assert n_files <= 16, f"bucket store has {n_files} parquet files"
    # matches store compacts too
    if os.path.exists(f"{store}/matches"):
        assert _parquet_file_count(f"{store}/matches") <= 16
