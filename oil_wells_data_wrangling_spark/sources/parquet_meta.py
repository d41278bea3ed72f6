"""Parquet footer inspector — the PRUNING-EVIDENCE reader for table
maintenance.

Every layout decision this engine makes for scan pruning (key-range
compaction in ``operators/spatial.py::compact_table``, z-order
clustering audited by ``zorder_stats``, the sorted CDX parquet mirror)
ultimately cashes out as ROW-GROUP min/max statistics in parquet
footers: that is what a reader's predicate actually checks before
skipping IO. This module reads those footers back as a DataFrame so a
maintenance job can PROVE a layout prunes instead of asserting it —
per (file, row group, column): row count, min/max, byte sizes.

Scale shape: the binaryFile listing is pruned to ``path`` (file bytes
never enter the JVM — the SCALE.md §11 posture) and each task reads
ONLY the footer of its files via pyarrow (a few KB of IO per file
regardless of file size), one task per file inventory split. Footer
reads require a SEEKABLE file, so like ``warc.fetch_record`` this is a
documented exception to the streaming opener contract — it takes local
task-visible paths (object stores: use their parquet-footer range-read
API or a FUSE mount).

Reference parity: none — the reference has no columnar layout to
audit; this is part of the table-maintenance story (SURVEY §2.E).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from oil_wells_data_wrangling_spark.sources.pathutil import local_path

ROW_GROUP_SCHEMA = (
    "file string, row_group int, column string, n_rows long, "
    "min_value string, max_value string, null_count long, "
    "compressed_bytes long, uncompressed_bytes long"
)


def _stat_str(v) -> str | None:
    """Footer statistics as portable strings (min/max types vary by
    column; bytes decode best-effort — binary stats are truncated
    prefixes by spec, so they are evidence, not exact values)."""
    if v is None:
        return None
    if isinstance(v, bytes):
        return v.decode("utf-8", "replace")
    return str(v)


def row_group_stats(
    spark: SparkSession,
    folder: str,
    columns: list[str] | None = None,
    glob: str = "*.parquet",
) -> DataFrame:
    """One row per (file, row group, column) under ``folder``: row
    count, min/max statistics, null count, and chunk byte sizes —
    read executor-side from footers only. ``columns`` prunes to the
    named columns (default: all)."""
    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .option("recursiveFileLookup", "true")
        .load(folder)
        .select("path")
    )
    wanted = list(columns) if columns else None

    def _read_footers(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pyarrow.parquet as pq

        for pdf in it:
            rows = {k: [] for k in (
                "file", "row_group", "column", "n_rows", "min_value",
                "max_value", "null_count", "compressed_bytes",
                "uncompressed_bytes",
            )}
            for path in pdf["path"]:
                p = local_path(path)
                meta = pq.ParquetFile(p).metadata  # footer-only IO
                for rg in range(meta.num_row_groups):
                    g = meta.row_group(rg)
                    for ci in range(g.num_columns):
                        c = g.column(ci)
                        name = c.path_in_schema
                        if wanted is not None and name not in wanted:
                            continue
                        st = c.statistics
                        # FULL path, not basename: one writer task
                        # reuses its part-file name across partition
                        # directories, so basenames collide
                        rows["file"].append(p)
                        rows["row_group"].append(rg)
                        rows["column"].append(name)
                        rows["n_rows"].append(g.num_rows)
                        rows["min_value"].append(
                            _stat_str(st.min) if st and st.has_min_max
                            else None
                        )
                        rows["max_value"].append(
                            _stat_str(st.max) if st and st.has_min_max
                            else None
                        )
                        rows["null_count"].append(
                            st.null_count
                            if st and st.null_count is not None
                            else None
                        )
                        rows["compressed_bytes"].append(
                            c.total_compressed_size
                        )
                        rows["uncompressed_bytes"].append(
                            c.total_uncompressed_size
                        )
            if rows["file"]:
                yield pd.DataFrame(rows)

    return files.mapInPandas(_read_footers, schema=ROW_GROUP_SCHEMA)


def pruning_report(
    spark: SparkSession,
    folder: str,
    column: str,
    glob: str = "*.parquet",
    cast: str | None = None,
) -> DataFrame:
    """Layout quality for one key column, per FILE: (file, n_rows,
    min_value, max_value, n_row_groups) plus ``overlaps_any`` — True
    when this file's [min,max] key range intersects another file's.
    A well-compacted / range-clustered layout reads all-False: every
    point or range predicate prunes to the minimal file set. String
    comparison of the stat strings is range-faithful for string keys
    and for zero-padded numerics; for raw numeric keys pass ``cast``
    (e.g. ``"bigint"``) — the stat strings are cast BEFORE the
    per-file min/max aggregation and the overlap ordering, since
    string order misranks unpadded numbers ('100' < '99') both within
    a multi-row-group file and across files."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    stats = row_group_stats(spark, folder, [column], glob)
    if cast is not None:
        stats = stats.withColumn(
            "min_value", F.col("min_value").cast(cast)
        ).withColumn("max_value", F.col("max_value").cast(cast))
    per_file = (
        stats
        .groupBy("file")
        .agg(
            F.sum("n_rows").alias("n_rows"),
            F.min("min_value").alias("min_value"),
            F.max("max_value").alias("max_value"),
            F.count(F.lit(1)).alias("n_row_groups"),
        )
    )
    # overlap check with ranges sorted by start (min_value): file i
    # intersects SOME other file iff (a) the next start is at-or-below
    # i's end — lead(min) <= max — or (b) i's start is at-or-below the
    # running max of ALL preceding files' ends (not just the immediate
    # neighbor's: a wide early file can swallow a later narrow one
    # whose adjacent neighbors are disjoint — the nested-range case).
    # The unpartitioned window is deliberate and safe: its input is
    # the per-FILE aggregate (|files| rows of scalars — the file
    # inventory, thousands at 100 TB), never data.
    w = Window.orderBy("min_value", "file")
    run_max_prev = F.max("max_value").over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    marked = per_file.withColumn(
        "overlaps_next",
        F.coalesce(
            F.col("max_value") >= F.lead("min_value").over(w), F.lit(False)
        ),
    ).withColumn(
        "overlaps_prev",
        F.coalesce(F.col("min_value") <= run_max_prev, F.lit(False)),
    )
    return marked.select(
        "file",
        "n_rows",
        "min_value",
        "max_value",
        "n_row_groups",
        (F.col("overlaps_next") | F.col("overlaps_prev")).alias(
            "overlaps_any"
        ),
    )


def advise_partitioning(
    spark: SparkSession,
    folder: str,
    glob: str = "*.parquet",
    target_partition_mb: int = 128,
    executor_mem_mb: int = 4096,
) -> DataFrame:
    """Partition-sizing advisor — turns the footer inventory into the
    two knobs a 100 TB job actually tunes, computed from MEASURED
    layout instead of rules of thumb:

    - ``rec_max_partition_bytes`` for ``spark.sql.files.
      maxPartitionBytes``: the scan-split size that yields
      ~``target_partition_mb`` of UNCOMPRESSED data per task. Spark
      splits on on-disk (compressed) bytes, so the recommendation
      divides the target by the table's measured compression ratio —
      a 4x-compressed table read with the default 128 MB split hands
      each task ~512 MB of decoded data, the classic scan-OOM.
    - ``rec_shuffle_partitions`` for ``spark.sql.shuffle.partitions``
      on a full-table shuffle: uncompressed total / (1/4 of executor
      task memory) — oversized shuffle partitions spill; this is the
      sizing rule SCALE.md applies.

    Also reports the evidence: file/row-group/row counts, compressed
    and uncompressed totals, the measured compression ratio (permille),
    the largest row group's decoded size (the per-task floor no split
    setting can go below), and ``small_files`` (files under a tenth of
    the target — the ``compact_table`` trigger).

    One footer pass: column-chunk byte sizes sum to row-group sizes,
    row groups roll up per file, and the output is a single row of
    scalars — nothing here reads data pages."""
    from pyspark.sql import functions as F

    stats = row_group_stats(spark, folder, None, glob)
    per_rg = stats.groupBy("file", "row_group").agg(
        F.sum("compressed_bytes").alias("cb"),
        F.sum("uncompressed_bytes").alias("ub"),
        F.max("n_rows").alias("rows"),
    )
    per_file = per_rg.groupBy("file").agg(
        F.sum("cb").alias("fcb"),
        F.sum("ub").alias("fub"),
        F.sum("rows").alias("frows"),
        F.count(F.lit(1)).alias("n_rgs"),
        F.max("ub").alias("max_rg_ub"),
    )
    target_b = target_partition_mb * 1024 * 1024
    task_budget_b = executor_mem_mb * 1024 * 1024 // 4
    return per_file.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_files"),
        F.sum("n_rgs").cast("bigint").alias("n_row_groups"),
        F.sum("frows").cast("bigint").alias("n_rows"),
        F.sum("fcb").cast("bigint").alias("compressed_bytes"),
        F.sum("fub").cast("bigint").alias("uncompressed_bytes"),
        F.expr("sum(fub) * 1000 div greatest(sum(fcb), 1)")
        .cast("bigint")
        .alias("compression_permille"),
        F.max("max_rg_ub").cast("bigint").alias("largest_row_group_bytes"),
        F.sum((F.col("fcb") < target_b // 10).cast("int"))
        .cast("bigint")
        .alias("small_files"),
    ).select(
        "*",
        # degenerate guard: a table with zero decoded bytes (or zero
        # row groups) has compression_permille 0/NULL and `div 0`
        # would NULL the recommendation — treat it as 1:1 (permille
        # 1000) so the advice degrades to the plain target
        F.expr(
            f"cast({target_b}L * 1000"
            " div greatest(coalesce(nullif(compression_permille, 0),"
            " 1000), 1) as bigint)"
        ).alias("rec_max_partition_bytes"),
        # true ceiling — `x div b + 1` overcounts by one whole
        # partition whenever x is an exact multiple of the budget
        F.expr(
            f"cast(greatest((uncompressed_bytes + {task_budget_b - 1}L)"
            f" div {task_budget_b}L, 1) as bigint)"
        ).alias("rec_shuffle_partitions"),
    )
