"""Partitioned layout: date-partitioned writes must give partition
pruning on read — the scan touches only matching directories."""

from __future__ import annotations

from pyspark.sql import functions as F

from oil_wells_data_wrangling_spark.sources.readers import load_tables


def test_date_partitioned_events_prune(spark, sf_dir, tmp_path):
    t = load_tables(spark, sf_dir)
    path = str(tmp_path / "events_by_day")
    (
        t.events.withColumn("day", F.to_date("ts"))
        .write.partitionBy("day")
        .mode("overwrite")
        .parquet(path)
    )
    df = spark.read.parquet(path).filter(F.col("day") == "2024-01-05")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "2024-01-05" in plan.replace("19727", "2024-01-05")
    # pruned read returns exactly the batch-filtered rows
    want = t.events.filter(F.to_date("ts") == "2024-01-05").count()
    assert df.count() == want and want > 0


def test_dynamic_partition_pruning_from_join(spark, sf_dir, tmp_path):
    """DYNAMIC partition pruning: when the partitioned fact joins a
    filtered dimension on the partition column, the runtime must inject
    a dynamicpruning filter into the scan — only the dimension's
    surviving days are read, without any literal day predicate in the
    query. This is the mechanism that makes star-joins over a
    date-partitioned 100 TB fact read days, not the table."""
    t = load_tables(spark, sf_dir)
    path = str(tmp_path / "events_by_day_dpp")
    (
        t.events.withColumn("day", F.to_date("ts"))
        .write.partitionBy("day")
        .mode("overwrite")
        .parquet(path)
    )
    fact = spark.read.parquet(path)
    # dimension: days below a cutoff — a FILTER on the dim side only
    # (DPP's benefit heuristic requires a selective dim filter; a limit
    # does not qualify). No literal predicate ever touches the fact.
    days = sorted(
        r["day"]
        for r in t.events.select(F.to_date("ts").alias("day")).distinct().collect()
    )
    cutoff = days[min(2, len(days) - 1)]
    dim = (
        t.events.select(F.to_date("ts").alias("day"))
        .distinct()
        .filter(F.col("day") <= F.lit(cutoff))
    )
    joined = fact.join(dim, "day")
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower(), "no DPP filter injected"
    want = (
        t.events.withColumn("day", F.to_date("ts"))
        .join(dim, "day")
        .count()
    )
    got = joined.count()
    assert got == want and got > 0


def test_runtime_bloom_filter_prunes_shuffle_join(spark, sf_dir, tmp_path):
    """Runtime bloom-filter join pruning: a selective dimension filter
    on a shuffle (non-broadcast, non-DPP) join should inject a bloom
    filter on the fact side, so most fact rows die at the scan instead
    of riding the exchange — the row-level sibling of DPP that matters
    when the fact is not partitioned by the join key."""
    t = load_tables(spark, sf_dir)
    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
        # test-scale overrides: at sf0.001 the fact scan is KBs, far
        # below the 10GB default that gates injection on a real cluster
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.optimizer.runtimeFilter.number.threshold": "10",
        # force the join to shuffle: bloom filters only apply when the
        # join is not broadcast (a broadcast build IS already a filter)
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        dim = t.orders.filter(F.col("o_orderpriority") == "1-URGENT")
        joined = t.lineitem.join(
            dim, F.col("l_orderkey") == F.col("o_orderkey")
        ).groupBy("o_orderpriority").count()
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "bloom" in plan.lower() or "might_contain" in plan.lower(), (
            "no runtime bloom filter injected on the fact side"
        )
        rows = joined.collect()
        # correctness under the filter: equal to the unfiltered join
        want = (
            t.lineitem.join(
                t.orders.filter(F.col("o_orderpriority") == "1-URGENT"),
                F.col("l_orderkey") == F.col("o_orderkey"),
            ).count()
        )
        assert rows[0]["count"] == want
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
