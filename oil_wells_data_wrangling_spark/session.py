"""SparkSession factory with scale-oriented defaults.

Local testing runs ``local[N]``; the same config block is what we would
ship to a 1000-executor cluster — AQE handles runtime re-planning
(partition coalescing, skew joins), Arrow accelerates the few pandas
exchanges, and shuffle partitions default to a value AQE can coalesce
down from.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "oil_wells_data_wrangling_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with the engine's defaults.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (or ``local[*]``)
    when no cluster master is configured — on a real cluster the submit
    environment provides the master and these builder calls are no-ops.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    master = master or f"local[{cpus}]"
    if shuffle_partitions is None:
        # Local default: half the cores (floor 8). At bench scale the
        # shuffles are small and AQE coalesces the read side anyway, so
        # reduce-task scheduling overhead dominates — a 16-vs-32
        # partition sweep at sf0.1/local[32] measured ~0.9s off the
        # headline total, with 8 and 24 both worse than 16 (see
        # BASELINE.md for the standing per-query numbers). Scan
        # parallelism comes from file splits, not this knob; a cluster
        # submit config overrides it (~2-3x total cores there).
        shuffle_partitions = 16 if cpus == "*" else max(int(cpus) // 2, 8)

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        # AQE: runtime partition coalescing + skew-join splitting. At 100 TB
        # these matter more than any static tuning we could do here.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # Arrow for the few pandas-exchange paths (mapInPandas operators).
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Dimension tables in this schema are small; let Spark broadcast
        # aggressively but we also mark broadcasts explicitly in operators.
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.session.timeZone", "UTC")
        # The driver's events table stores TIMESTAMP(NANOS); read as raw
        # int64 nanos and normalize in sources/readers.py.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        # Synthesized-text expressions are wide; avoid megabyte WARN dumps.
        .config("spark.sql.debug.maxToStringFields", "10000")
        .config("spark.sql.maxPlanStringLength", "10000")
    )
    return builder.getOrCreate()
