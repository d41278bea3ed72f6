"""Streaming → keyed upsert sink integration: a watermarked dedup stream
foreachBatch-merged into the parquet table keeps exactly the latest row
per key — the streaming materialized view the reference's MySQL upsert
loop approximates."""

from __future__ import annotations

import shutil

from pyspark.sql import functions as F

from oil_wells_data_wrangling_spark.sources.readers import load_tables
from oil_wells_data_wrangling_spark.sources.sinks import read_table, upsert_parquet
from oil_wells_data_wrangling_spark.streaming.events import read_event_stream


def test_stream_foreachbatch_upsert(spark, sf_dir, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    shutil.copy(f"{sf_dir}/events.parquet", src / "events.parquet")
    table = str(tmp_path / "user_latest")

    stream = read_event_stream(spark, str(src)).select(
        "user_id", "event_type", "ts", "value"
    )

    def _merge(batch_df, batch_id):
        latest = (
            batch_df.groupBy("user_id")
            .agg(F.max_by("event_type", "ts").alias("event_type"), F.max("ts").alias("ts"))
        )
        upsert_parquet(latest, table, keys=["user_id"], version_col="ts")

    q = stream.writeStream.foreachBatch(_merge).trigger(availableNow=True).start()
    q.awaitTermination(120)

    got = read_table(spark, table)
    batch = (
        load_tables(spark, sf_dir)
        .events.groupBy("user_id")
        .agg(F.max("ts").alias("ts"))
    )
    got_map = {r["user_id"]: r["ts"] for r in got.collect()}
    want_map = {r["user_id"]: r["ts"] for r in batch.collect()}
    assert got_map == want_map


def test_append_merge_parquet_lsm_contract(spark, tmp_path):
    """The merge-on-read state table streaming foreachBatch relies on:
    appends cost O(batch), every Nth append compacts the delta log
    behind the staging-swap, and read_merged equals a batch recompute
    at every point — including right after a compaction (idempotent
    re-merge) and for both merge shapes (keep-latest window, agg
    rollup)."""
    import os

    from pyspark.sql import Window
    from oil_wells_data_wrangling_spark.sources.sinks import (
        append_merge_parquet,
        read_merged,
    )

    # -- agg rollup shape (sum of partial counts, min tag)
    table = str(tmp_path / "rollup")

    def agg_merge(df):
        return df.groupBy("k").agg(
            F.min("tag").alias("tag"),
            F.sum("n").cast("bigint").alias("n"),
        )

    seen = []
    compactions = 0
    for b in range(6):
        rows = [(f"k{(b + i) % 4}", f"t{b}", 1) for i in range(3)]
        seen += rows
        batch = spark.createDataFrame(rows, "k string, tag string, n long")
        compacted = append_merge_parquet(
            batch, table, agg_merge, compact_every=3
        )
        compactions += compacted
        got = {
            r.k: (r.tag, r.n) for r in read_merged(spark, table, agg_merge).collect()
        }
        want = {}
        for k, tag, n in seen:
            t0, n0 = want.get(k, ("zzz", 0))
            want[k] = (min(t0, tag), n0 + n)
        assert got == want, f"batch {b}"
        if compacted:
            # post-compaction the delta dir holds ONE merged base:
            # every key exactly once
            base = spark.read.option("recursiveFileLookup", "true").parquet(
                os.path.join(table, "_deltas")
            )
            assert base.count() == len(want)
    assert compactions == 2  # batches 3 and 6

    # -- keep-latest shape over versions, split across appends
    table2 = str(tmp_path / "latest")

    def keep_latest(df):
        w = Window.partitionBy("k").orderBy(F.col("v").desc())
        return (
            df.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .drop("rn")
        )

    for v in (1, 2, 3):
        batch = spark.createDataFrame(
            [(f"k{i}", v, f"val{i}-{v}") for i in range(4) if i % v == 0],
            "k string, v int, val string",
        )
        append_merge_parquet(batch, table2, keep_latest, compact_every=2)
    got = {r.k: (r.v, r.val) for r in read_merged(spark, table2, keep_latest).collect()}
    assert got == {
        "k0": (3, "val0-3"),
        "k1": (1, "val1-1"),
        "k2": (2, "val2-2"),
        "k3": (3, "val3-3"),
    }


def test_merge_parquet_partitioned_scoped_rewrite(spark, tmp_path):
    """Partition-scoped COW merge: only partitions present in the
    batch are read and rewritten — untouched partitions' FILES survive
    byte-identically (inode check), which is the 'cost tracks the
    batch, not the store' property for key-local workloads."""
    import os

    from oil_wells_data_wrangling_spark.sources.sinks import (
        merge_parquet_partitioned,
    )

    table = str(tmp_path / "scoped")

    def agg_merge(df):
        return df.groupBy("k", "pk").agg(F.sum("n").cast("bigint").alias("n"))

    b1 = spark.createDataFrame(
        [("a", 0, 1), ("b", 1, 1), ("c", 2, 1)], "k string, pk int, n long"
    )
    touched = merge_parquet_partitioned(b1, table, agg_merge, "pk")
    assert sorted(touched) == [0, 1, 2]

    def files_in(pk):
        d = os.path.join(table, f"pk={pk}")
        return {
            f: os.stat(os.path.join(d, f)).st_mtime_ns
            for f in os.listdir(d)
            if f.endswith(".parquet")
        }

    before = {pk: files_in(pk) for pk in (0, 1, 2)}
    b2 = spark.createDataFrame([("a", 0, 5)], "k string, pk int, n long")
    touched = merge_parquet_partitioned(b2, table, agg_merge, "pk")
    assert touched == [0]
    # pk=1 and pk=2 files untouched byte-for-byte; pk=0 rewritten
    assert files_in(1) == before[1] and files_in(2) == before[2]
    assert files_in(0) != before[0]
    got = {r.k: r.n for r in spark.read.parquet(table).collect()}
    assert got == {"a": 6, "b": 1, "c": 1}


def test_append_merge_parquet_retry_and_crash_recovery(spark, tmp_path):
    """The exactly-once and durability contracts (r12 review findings):
    a re-delivered batch_id is a no-op (at-least-once foreachBatch
    retries must not double-count sum merges), and a crash at ANY point
    of the compaction swap leaves a store the next append/read repairs
    — never silently-lost state."""
    import os
    import shutil

    from oil_wells_data_wrangling_spark.sources.sinks import (
        append_merge_parquet,
        read_merged,
    )

    table = str(tmp_path / "amp")

    def agg(df):
        return df.groupBy("k").agg(F.sum("n").cast("bigint").alias("n"))

    b = spark.createDataFrame([("a", 1), ("b", 2)], "k string, n long")
    append_merge_parquet(b, table, agg, compact_every=10, batch_id=7)
    # retry of the SAME batch id: delta already durable, must be a no-op
    append_merge_parquet(b, table, agg, compact_every=10, batch_id=7)
    got = {r.k: r.n for r in read_merged(spark, table, agg).collect()}
    assert got == {"a": 1, "b": 2}  # not doubled

    # crash window 1: after replace(_deltas -> .old), before the swap
    # completes — roll back, nothing lost
    os.replace(
        os.path.join(table, "_deltas"), os.path.join(table, ".old-deadbeef")
    )
    os.makedirs(os.path.join(table, ".compact-feedface", "base"))
    got = {r.k: r.n for r in read_merged(spark, table, agg).collect()}
    assert got == {"a": 1, "b": 2}
    assert not os.path.exists(os.path.join(table, ".old-deadbeef"))
    assert not os.path.exists(os.path.join(table, ".compact-feedface"))

    # crash window 2: swap done, old-dir cleanup missed — swept up,
    # and the re-delivered-batch guard survives compaction
    b2 = spark.createDataFrame([("a", 10)], "k string, n long")
    compacted = append_merge_parquet(
        b2, table, agg, compact_every=2, batch_id=8
    )
    assert compacted  # 2 applied markers -> compaction fired
    shutil.copytree(
        os.path.join(table, "_deltas"), os.path.join(table, ".old-cafe")
    )
    append_merge_parquet(b2, table, agg, compact_every=100, batch_id=8)
    got = {r.k: r.n for r in read_merged(spark, table, agg).collect()}
    assert got == {"a": 11, "b": 2}  # batch 8 counted exactly once
    assert not os.path.exists(os.path.join(table, ".old-cafe"))


def test_merge_parquet_partitioned_string_buckets_and_emptied_partition(
    spark, tmp_path
):
    """Two r12 review findings: (1) numeric-looking STRING partition
    values must round-trip ('00' read back as int 0 would fork the
    store); (2) a merge that legitimately empties a touched partition
    must delete it — dynamic overwrite alone would resurrect the old
    rows on the next read."""
    import os

    from oil_wells_data_wrangling_spark.sources.sinks import (
        merge_parquet_partitioned,
    )

    table = str(tmp_path / "mp")

    def keep_live(df):
        agg = df.groupBy("k", "pk").agg(
            F.sum("n").cast("bigint").alias("n")
        )
        return agg.filter(F.col("n") > 0)  # tombstones drop out

    b1 = spark.createDataFrame(
        [("x", "00", 5), ("y", "07", 3)], "k string, pk string, n long"
    )
    def read_store():
        # disable dir-name type inference for the assertion read too —
        # the store's contract is raw string partition values
        key = "spark.sql.sources.partitionColumnTypeInference.enabled"
        prev = spark.conf.get(key, "true")
        spark.conf.set(key, "false")
        try:
            return {
                (r.k, r.pk): r.n for r in spark.read.parquet(table).collect()
            }
        finally:
            spark.conf.set(key, prev)

    merge_parquet_partitioned(b1, table, keep_live, "pk")
    assert os.path.isdir(os.path.join(table, "pk=00"))  # raw string dir
    # merge with prior state in '00': must hit the SAME key, not fork
    b2 = spark.createDataFrame([("x", "00", 2)], "k string, pk string, n long")
    merge_parquet_partitioned(b2, table, keep_live, "pk")
    assert read_store() == {("x", "00"): 7, ("y", "07"): 3}
    assert not os.path.isdir(os.path.join(table, "pk=0"))  # no fork
    # tombstone everything in '07': the partition dir must be GONE
    b3 = spark.createDataFrame([("y", "07", -3)], "k string, pk string, n long")
    merge_parquet_partitioned(b3, table, keep_live, "pk")
    assert not os.path.exists(os.path.join(table, "pk=07"))
    assert read_store() == {("x", "00"): 7}


def test_merge_parquet_partitioned_escaped_partition_cleanup(
    spark, tmp_path
):
    """r12 advice: emptied-partition cleanup must delete dirs whose
    VALUES Spark percent-escapes in partition paths (space, ':') — a
    reconstructed f'{col}={v}' name misses them and the deleted rows
    resurrect on the next read."""
    import os

    from oil_wells_data_wrangling_spark.sources.sinks import (
        merge_parquet_partitioned,
    )

    table = str(tmp_path / "mpe")

    def keep_live(df):
        agg = df.groupBy("k", "pk").agg(
            F.sum("n").cast("bigint").alias("n")
        )
        return agg.filter(F.col("n") > 0)

    b1 = spark.createDataFrame(
        [("x", "a b", 5), ("y", "c:d", 3)], "k string, pk string, n long"
    )
    merge_parquet_partitioned(b1, table, keep_live, "pk")
    dirs = {d for d in os.listdir(table) if d.startswith("pk=")}
    # ':' is in Spark's partition-path escape set (space is not)
    assert dirs == {"pk=a b", "pk=c%3Ad"}, dirs
    # tombstone everything in 'c:d': its ESCAPED dir must be gone
    b2 = spark.createDataFrame(
        [("y", "c:d", -3)], "k string, pk string, n long"
    )
    merge_parquet_partitioned(b2, table, keep_live, "pk")
    assert not os.path.exists(os.path.join(table, "pk=c%3Ad"))
    got = {(r.k, r.pk): r.n for r in spark.read.parquet(table).collect()}
    assert got == {("x", "a b"): 5}


def test_merge_parquet_partitioned_nonstring_partition_cleanup(
    spark, tmp_path
):
    """r13 advice: the emptied-partition comparison must use Spark's
    OWN rendering of partition values, not Python str(v) — for a
    BOOLEAN partition column Python renders 'True' while the dir is
    'pk=true', so the emptied partition was missed and its deleted
    rows resurrected on the next read. Same class: float/date
    formatting."""
    import os

    from oil_wells_data_wrangling_spark.sources.sinks import (
        merge_parquet_partitioned,
    )

    table = str(tmp_path / "mpb")

    def keep_live(df):
        agg = df.groupBy("k", "pk").agg(
            F.sum("n").cast("bigint").alias("n")
        )
        return agg.filter(F.col("n") > 0)

    b1 = spark.createDataFrame(
        [("x", True, 5), ("y", False, 3)], "k string, pk boolean, n long"
    )
    merge_parquet_partitioned(b1, table, keep_live, "pk")
    assert os.path.isdir(os.path.join(table, "pk=true"))
    # tombstone everything in pk=true: the dir must be GONE (str(True)
    # = 'True' never matched 'true', leaving the stale files behind)
    b2 = spark.createDataFrame(
        [("x", True, -5)], "k string, pk boolean, n long"
    )
    merge_parquet_partitioned(b2, table, keep_live, "pk")
    assert not os.path.exists(os.path.join(table, "pk=true"))
    got = {
        (r.k, r.pk): r.n
        for r in spark.read.schema("k string, pk boolean, n long")
        .parquet(table)
        .collect()
    }
    assert got == {("y", False): 3}


def test_append_merge_parquet_torn_delta_replaced(spark, tmp_path):
    """r12 advice: delta publication must be atomic — a torn delta
    (crash during the delta write, marker absent) must not be read as
    committed state; the retry replaces it wholesale. Also: leftover
    .stage-* staging dirs are swept by recovery."""
    import os

    from oil_wells_data_wrangling_spark.sources.sinks import (
        append_merge_parquet,
        read_merged,
    )

    table = str(tmp_path / "amp2")

    def agg(df):
        return df.groupBy("k").agg(F.sum("n").cast("bigint").alias("n"))

    b = spark.createDataFrame([("a", 1)], "k string, n long")
    append_merge_parquet(b, table, agg, compact_every=10, batch_id=1)

    # simulate a torn publish of batch 2 under the OLD direct-write
    # scheme: a partial delta dir exists in _deltas, no marker
    torn = os.path.join(table, "_deltas", "b2")
    os.makedirs(torn)
    with open(os.path.join(torn, "part-junk.parquet"), "wb") as f:
        f.write(b"\x00not parquet")
    # plus an orphaned staging dir from the same crash
    os.makedirs(os.path.join(table, ".stage-deadbeef"))

    # the retry of batch 2 must replace the torn dir atomically
    b2 = spark.createDataFrame([("a", 10)], "k string, n long")
    append_merge_parquet(b2, table, agg, compact_every=10, batch_id=2)
    got = {r.k: r.n for r in read_merged(spark, table, agg).collect()}
    assert got == {"a": 11}
    assert not os.path.exists(os.path.join(table, ".stage-deadbeef"))
    junk = [
        f
        for f in os.listdir(os.path.join(table, "_deltas", "b2"))
        if f == "part-junk.parquet"
    ]
    assert not junk  # wholesale replacement, not overlay


def test_merge_parquet_partitioned_single_batch_scan_for_touched(
    spark, tmp_path
):
    """r14 advice (low): the touched-partition values and their
    directory-name renderings must come from ONE collect over
    batch_df, not two — the batch lineage is un-checkpointed, so every
    extra collect re-runs it. An accumulator-counting UDF in the batch
    lineage observes exactly two materializations: the combined
    touched collect and the merge's eager localCheckpoint (the write
    and the kept-partition sweep reuse the checkpoint)."""
    from pyspark.sql.types import IntegerType

    from oil_wells_data_wrangling_spark.sources.sinks import (
        merge_parquet_partitioned,
    )

    acc = spark.sparkContext.accumulator(0)

    def counted(n):
        acc.add(1)
        return n

    count_udf = F.udf(counted, IntegerType())
    rows = [("a", 0, 1), ("b", 1, 1), ("c", None, 1)]
    # the UDF computes the PARTITION column, so no projection of the
    # batch can prune it — every batch materialization counts
    batch = spark.createDataFrame(
        rows, "k string, pk int, n long"
    ).withColumn("pk", count_udf(F.col("pk")))

    def agg_merge(df):
        return df.groupBy("k", "pk").agg(F.sum("n").cast("bigint").alias("n"))

    touched = merge_parquet_partitioned(
        batch, str(tmp_path / "t"), agg_merge, "pk"
    )
    assert sorted(touched, key=lambda v: (v is None, v)) == [0, 1, None]
    assert acc.value == 2 * len(rows)
