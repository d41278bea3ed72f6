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
