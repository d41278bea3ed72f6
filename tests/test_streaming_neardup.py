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
