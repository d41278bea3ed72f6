"""Streaming near-duplicate detection (windowed MinHash+LSH).

Documents arrive as a stream; each micro-batch computes band buckets
with the SAME array-expression signature pipeline as the batch operator
(operators/dedup.py) and joins them against the accumulated bucket
store: matches against any previously-seen document emit immediately,
then the batch's buckets append to the store.

This is the incremental form of dedup_minhash — state is the bucket
table (16 bytes + ids per band), not the documents, so the store grows
with corpus size × 8 bands regardless of document length. At 100 TB
the store would live partitioned by band_hash prefix; here it is a
parquet directory maintained via foreachBatch.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, functions as F

from oil_wells_data_wrangling_spark.operators.dedup import (
    lsh_band_buckets,
    minhash_signature,
)


def neardup_foreach_batch(store_dir: str):
    """Build the foreachBatch callback maintaining bucket store + match log.

    Layout under ``store_dir``: ``buckets/`` (doc_id, band_id, bh) and
    ``matches/`` (doc_a, doc_b) with doc_a < doc_b.
    """
    buckets_path = os.path.join(store_dir, "buckets")
    matches_path = os.path.join(store_dir, "matches")

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        new = lsh_band_buckets(minhash_signature(batch_df.select("doc_id", "text")))
        new.cache()
        a, b = new.alias("a"), new.alias("b")
        pairs = (
            a.join(
                b,
                (F.col("a.band_id") == F.col("b.band_id"))
                & (F.col("a.bh") == F.col("b.bh"))
                & (F.col("a.doc_id") < F.col("b.doc_id")),
            )
            .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        )
        if os.path.exists(buckets_path):
            prev = spark.read.parquet(buckets_path).alias("p")
            cross = (
                new.alias("n")
                .join(
                    prev,
                    (F.col("n.band_id") == F.col("p.band_id"))
                    & (F.col("n.bh") == F.col("p.bh"))
                    & (F.col("n.doc_id") != F.col("p.doc_id")),
                )
                .select(
                    F.least("n.doc_id", "p.doc_id").alias("doc_a"),
                    F.greatest("n.doc_id", "p.doc_id").alias("doc_b"),
                )
            )
            pairs = pairs.unionAll(cross)
        pairs.distinct().write.mode("append").parquet(matches_path)
        new.write.mode("append").parquet(buckets_path)
        new.unpersist()

    return _process
