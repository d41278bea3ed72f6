"""Sinks: keyed upsert into a parquet table (the reference's MySQL
ON DUPLICATE KEY UPDATE, pdf_to_db.py:202-244, re-expressed for a lake).

No transactional table format is available in this environment, so the
merge is read-union-dedup-rewrite with a staging directory swap — the
same logical MERGE a Delta/Iceberg writer performs, minus the manifest.
At 100 TB you'd partition the table and rewrite only touched partitions;
the keep-latest window is identical.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def upsert_parquet(
    df: DataFrame,
    path: str,
    keys: list[str],
    version_col: str,
) -> None:
    """MERGE df into the parquet table at ``path``: per key keep the row
    with the highest ``version_col`` (new rows win ties)."""
    spark = df.sparkSession
    incoming = df.withColumn("__gen", F.lit(1))
    if os.path.exists(path):
        existing = spark.read.parquet(path).withColumn("__gen", F.lit(0))
        merged = existing.unionByName(incoming)
    else:
        merged = incoming
    w = Window.partitionBy(*keys).orderBy(
        F.col(version_col).desc(), F.col("__gen").desc()
    )
    latest = (
        merged.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn", "__gen")
    )
    staging = f"{path}.staging-{uuid.uuid4().hex[:8]}"
    latest.write.mode("overwrite").parquet(staging)
    if os.path.exists(path):
        # Rename the live table aside before installing staging so a
        # crash can lose at most the single rename window, never the
        # table; deleting the old copy last keeps readers safe.
        old = f"{path}.old-{uuid.uuid4().hex[:8]}"
        os.replace(path, old)
        os.replace(staging, path)
        shutil.rmtree(old)
    else:
        os.replace(staging, path)


def read_table(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)
