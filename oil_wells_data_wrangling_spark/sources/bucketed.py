"""Bucketed table layout — shuffle-free co-located joins at scale.

At 100 TB the dominant cost of a fact-fact join is shuffling both sides
on the key. Bucketing both tables by the join key at write time makes
the join a zero-exchange local merge forever after: each bucket pairs
with exactly one bucket on the other side. This module wraps Spark's
bucketBy writer (which requires the table catalog) and is proven by
tests/test_bucketed.py asserting the join plan has NO Exchange on
either side.
"""

from __future__ import annotations

import shutil

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame, table: str, bucket_col: str, n_buckets: int = 8
) -> None:
    """Persist df as a bucketed+sorted managed table keyed for joins."""
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    # The in-memory catalog forgets tables across sessions but their
    # warehouse directories survive; clear any orphaned location.
    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    shutil.rmtree(f"{warehouse}/{table}", ignore_errors=True)
    (
        df.write.mode("overwrite")
        .bucketBy(n_buckets, bucket_col)
        .sortBy(bucket_col)
        .format("parquet")
        .saveAsTable(table)
    )


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)
