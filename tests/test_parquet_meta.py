"""Parquet footer inspector (sources/parquet_meta.py): the pruning-
evidence reader. Stats must match the data exactly, the per-file
overlap report must read all-False on a range-clustered layout and
flag a shuffled one, and compact_table's CLAIMED key bounding boxes
must equal what the footers actually advertise to a pruning reader."""

from __future__ import annotations

from pyspark.sql import functions as F

from oil_wells_data_wrangling_spark.sources.parquet_meta import (
    pruning_report,
    row_group_stats,
)


def test_row_group_stats_match_data(spark, tmp_path):
    df = spark.createDataFrame(
        [(i, f"k{i:04d}", float(i) / 4) for i in range(1000)],
        "id long, key string, val double",
    )
    path = str(tmp_path / "t")
    df.repartitionByRange(4, "id").write.parquet(path)
    stats = row_group_stats(spark, path).toPandas()
    # every file reports all three columns; per-file row counts sum to
    # the table
    per_file_rows = (
        stats[stats["column"] == "id"].groupby("file")["n_rows"].sum()
    )
    assert int(per_file_rows.sum()) == 1000
    # string-key min/max per file must equal the true data bounds
    truth = {}
    got_rows = spark.read.parquet(path).select(
        "key", F.input_file_name().alias("f")
    )
    from oil_wells_data_wrangling_spark.sources.pathutil import local_path

    for r in got_rows.collect():
        base = local_path(r.f)
        lo, hi = truth.get(base, ("￿", ""))
        truth[base] = (min(lo, r.key), max(hi, r.key))
    key_stats = stats[stats["column"] == "key"]
    for f, grp in key_stats.groupby("file"):
        assert grp["min_value"].min() == truth[f][0]
        assert grp["max_value"].max() == truth[f][1]
    # byte sizes are positive and nulls are counted
    assert (stats["compressed_bytes"] > 0).all()
    assert (stats["null_count"] == 0).all()


def test_pruning_report_flags_unclustered_layout(spark, tmp_path):
    rows = [(f"k{i:04d}",) for i in range(400)]
    df = spark.createDataFrame(rows, "key string")
    clustered = str(tmp_path / "clustered")
    df.repartitionByRange(4, "key").write.parquet(clustered)
    shuffled = str(tmp_path / "shuffled")
    df.repartition(4).write.parquet(shuffled)  # round-robin: full overlap

    good = pruning_report(spark, clustered, "key").toPandas()
    assert len(good) == 4 and not good["overlaps_any"].any(), good
    bad = pruning_report(spark, shuffled, "key").toPandas()
    assert bad["overlaps_any"].all(), bad


def test_pruning_report_flags_nested_range(spark, tmp_path):
    """r12 advice (medium): a file whose key range NESTS inside an
    earlier wider file must flag even when its adjacent neighbors in
    min_value order are disjoint — adjacent-only lead/lag comparison
    gave it a false negative. Layout: [k000,k999] swallows [k300,k350],
    whose neighbor [k100,k150] is disjoint from it."""
    path = str(tmp_path / "nested")
    ranges = [
        ("wide", ["k000", "k999"]),
        ("a", ["k100", "k150"]),
        ("b", ["k300", "k350"]),
    ]
    for name, keys in ranges:
        spark.createDataFrame(
            [(k,) for k in keys], "key string"
        ).coalesce(1).write.parquet(f"{path}/part_{name}.parquet")
    rep = pruning_report(spark, path, "key").toPandas()
    assert len(rep) == 3
    # every file intersects the wide one, so ALL must flag
    assert rep["overlaps_any"].all(), rep


def test_compact_table_bboxes_match_footers(spark, sf_dir, tmp_path):
    """The tie-in: the key ranges compact_table REPORTS must be exactly
    the ranges the parquet footers advertise — i.e. the evidence row a
    maintenance job logs is the same thing a pruning reader will
    actually see. Re-runs the compaction layout (bucketed clustered
    write) and compares both views."""
    from oil_wells_data_wrangling_spark.operators.spatial import (
        compact_table,
    )

    claimed = {
        int(r.bucket): (int(r.min_key), int(r.max_key))
        for r in compact_table(spark, sf_dir).collect()
    }
    # rebuild the identical layout (compact_table cleans up its
    # tempdir, so reproduce the write here) and read the FOOTERS
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    row = orders.agg(
        F.min("o_orderkey").alias("mn"), F.max("o_orderkey").alias("mx")
    ).collect()[0]
    mn, mx = int(row["mn"]), int(row["mx"])
    comp = str(tmp_path / "compacted")
    orders.withColumn(
        "bucket",
        F.expr(f"CAST(((o_orderkey - {mn}) * 8) DIV {mx - mn + 1} AS BIGINT)"),
    ).repartition(F.col("bucket")).write.partitionBy("bucket").parquet(comp)
    stats = row_group_stats(spark, comp, ["o_orderkey"]).toPandas()
    import os

    # map each file back to its bucket directory via a listing
    by_bucket = {}
    for d in os.listdir(comp):
        if d.startswith("bucket="):
            b = int(d.split("=")[1])
            for f in os.listdir(os.path.join(comp, d)):
                if f.endswith(".parquet"):
                    by_bucket[os.path.join(comp, d, f)] = b
    footer = {}
    for f, grp in stats.groupby("file"):
        b = by_bucket[f]
        lo = min(int(v) for v in grp["min_value"])
        hi = max(int(v) for v in grp["max_value"])
        cur = footer.get(b)
        footer[b] = (
            (min(cur[0], lo), max(cur[1], hi)) if cur else (lo, hi)
        )
    assert footer == claimed


def test_pruning_report_numeric_cast(spark, tmp_path):
    """For unpadded numeric keys, string stat order lies ('100' < '99'
    — both within a multi-row-group file and across files); the
    ``cast`` parameter must yield typed, numerically-correct ranges
    and verdicts."""
    path = str(tmp_path / "num")
    for name, keys in [("a", [9, 11]), ("b", [100, 102])]:
        spark.createDataFrame(
            [(k,) for k in keys], "key long"
        ).coalesce(1).write.parquet(f"{path}/{name}.parquet")
    rep = (
        pruning_report(spark, path, "key", cast="bigint")
        .toPandas()
        .sort_values("min_value")
        .reset_index(drop=True)
    )
    assert list(rep["min_value"]) == [9, 100]
    assert list(rep["max_value"]) == [11, 102]
    assert not rep["overlaps_any"].any(), rep


def test_advise_partitioning_math(spark, tmp_path):
    """The advisor's recommendations must follow from the measured
    layout: rec_max_partition_bytes = target / compression ratio, and
    rec_shuffle_partitions covers the uncompressed total at a quarter
    of task memory. Uses a compressible table (repeated strings) so
    the ratio is materially > 1, plus deliberate small files."""
    from oil_wells_data_wrangling_spark.sources.parquet_meta import (
        advise_partitioning,
    )

    df = spark.createDataFrame(
        [(i, "the same compressible sentence " * 20) for i in range(4000)],
        "id long, text string",
    )
    path = str(tmp_path / "t")
    df.repartition(8).write.parquet(path)  # 8 small files
    row = advise_partitioning(
        spark, path, target_partition_mb=128, executor_mem_mb=4096
    ).collect()[0]
    assert row.n_files == 8
    assert row.n_rows == 4000
    assert row.compressed_bytes > 0
    assert row.uncompressed_bytes > row.compressed_bytes  # compressible
    ratio = row.compression_permille
    assert ratio == row.uncompressed_bytes * 1000 // row.compressed_bytes
    assert row.rec_max_partition_bytes == (128 * 1024 * 1024) * 1000 // ratio
    # a 4x-compressed table must be told to use a SMALLER split
    assert row.rec_max_partition_bytes < 128 * 1024 * 1024
    budget = 4096 * 1024 * 1024 // 4
    # true ceiling (r13 advice): exact multiples of the budget must
    # NOT gain a phantom extra partition
    assert row.rec_shuffle_partitions == max(
        -(-row.uncompressed_bytes // budget), 1
    )
    assert row.small_files == 8  # all files far below 12.8 MB
    assert row.largest_row_group_bytes > 0


def test_advise_partitioning_degenerate_empty(spark, tmp_path):
    """r13 advice regression: a degenerate table (zero rows → zero
    decoded bytes / zero row groups) has compression_permille 0 or
    NULL; the recommendations must degrade to the plain target and
    one shuffle partition instead of going NULL via `div 0`."""
    from oil_wells_data_wrangling_spark.sources.parquet_meta import (
        advise_partitioning,
    )

    path = str(tmp_path / "empty")
    spark.createDataFrame([], "id long, text string").coalesce(1).write.parquet(
        path
    )
    row = advise_partitioning(
        spark, path, target_partition_mb=128, executor_mem_mb=4096
    ).collect()[0]
    assert row.rec_max_partition_bytes == 128 * 1024 * 1024  # 1:1 fallback
    assert row.rec_shuffle_partitions == 1
    assert (row.n_rows or 0) == 0
