"""Blocking-shape tests for embed_neardup (VERDICT r2 'What's wrong' #2).

The near-dup self-join must not be label-only blocked: with 10 distinct
labels the per-block comparison is O(n²/10) — all-pairs at scale. The
(label, LSH sign-bucket) block must shrink the largest block by orders
of magnitude while the in-bucket cosine re-check keeps pairs exact.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from oil_wells_data_wrangling_spark.operators.similarity import (
    _bucket_expr_spark,
    embed_neardup,
)
from oil_wells_data_wrangling_spark.sources.readers import load_tables


def test_label_bucket_block_much_smaller_than_label_block(spark, sf_dir):
    emb = load_tables(spark, sf_dir).embeddings
    label_max = (
        emb.groupBy("label").count().agg(F.max("count").alias("m")).collect()[0]["m"]
    )
    both_max = (
        emb.select("label", F.expr(_bucket_expr_spark()).alias("bucket"))
        .groupBy("label", "bucket")
        .count()
        .agg(F.max("count").alias("m"))
        .collect()[0]["m"]
    )
    # 8 hyperplanes → 256 sign buckets; even with skew the largest
    # (label, bucket) block must be far below the label-only block.
    assert both_max * 16 <= label_max, (both_max, label_max)


def test_neardup_pairs_share_label_and_bucket(spark, sf_dir):
    emb = load_tables(spark, sf_dir).embeddings
    keyed = emb.select(
        "vec_id", "label", F.expr(_bucket_expr_spark()).alias("bucket")
    )
    pairs = embed_neardup(spark, sf_dir)
    a = keyed.select(
        F.col("vec_id").alias("vec_a"),
        F.col("label").alias("la"),
        F.col("bucket").alias("ba"),
    )
    b = keyed.select(
        F.col("vec_id").alias("vec_b"),
        F.col("label").alias("lb"),
        F.col("bucket").alias("bb"),
    )
    joined = pairs.join(a, "vec_a").join(b, "vec_b")
    n = joined.count()
    assert n == pairs.count()
    assert (
        joined.filter(
            (F.col("la") != F.col("lb")) | (F.col("ba") != F.col("bb"))
        ).count()
        == 0
    )
    # ordering + threshold invariants survive the re-blocking
    assert pairs.filter(F.col("vec_a") >= F.col("vec_b")).count() == 0
    assert pairs.filter(F.col("cos_r") < 0.3).count() == 0
