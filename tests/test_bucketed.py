"""Bucketed co-located joins must eliminate the shuffle entirely."""

from __future__ import annotations

from pyspark.sql import functions as F

from oil_wells_data_wrangling_spark.sources.bucketed import (
    read_bucketed,
    write_bucketed,
)
from oil_wells_data_wrangling_spark.sources.readers import load_tables


def test_bucketed_join_has_no_exchange(spark, sf_dir):
    t = load_tables(spark, sf_dir)
    write_bucketed(t.lineitem, "li_bucketed", "l_orderkey", 8)
    write_bucketed(t.orders, "ord_bucketed", "o_orderkey", 8)

    li = read_bucketed(spark, "li_bucketed")
    od = read_bucketed(spark, "ord_bucketed")
    # force sort-merge so the test checks bucket co-location, not broadcast
    joined = li.hint("merge").join(od, F.col("l_orderkey") == F.col("o_orderkey"))
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan
    assert "Exchange" not in plan, plan
    # and it still computes the right thing
    n = joined.count()
    want = t.lineitem.join(
        t.orders, F.col("l_orderkey") == F.col("o_orderkey")
    ).count()
    assert n == want


def test_aqe_splits_skewed_join_partition(spark):
    """AQE skew-join: a sort-merge join whose build of one key dwarfs
    the median partition must be split at runtime (skew=true in the
    final adaptive plan) — the mechanism that keeps one hot join key
    from stalling a 1000-executor stage. Thresholds are lowered so the
    behavior is provable at test scale; the session restores them."""
    from pyspark.sql import functions as F

    tuned = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "16KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8KB",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.coalescePartitions.minPartitionSize": "1KB",
    }
    prev = {k: spark.conf.get(k, None) for k in tuned}
    for k, v in tuned.items():
        spark.conf.set(k, v)
    try:
        left = spark.range(200_000).select(
            F.when(F.col("id") % 2 == 0, 1)
            .otherwise(F.col("id") % 1000)
            .alias("k"),
            F.md5(F.col("id").cast("string")).alias("pad"),
        )
        right = spark.range(1000).select(
            F.col("id").alias("k"), F.lit("dim").alias("v")
        )
        j = left.join(right, "k")
        assert len(j.collect()) == 200_000
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "skew=true" in plan, "AQE did not split the skewed partition"
    finally:
        for k, v in prev.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
