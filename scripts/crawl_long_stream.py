"""Long-stream soak for the CONTENT-HASH dedup state table (r13
verdict item 8) — stream_crawl_corpus's state posture, measured the
way scripts/mor_long_stream.py measured the CDC-key store.

The r13 evidence covered CDC keys (every wave touches 2/3 of a FIXED
key set: state size constant). A crawl's md5 content-hash state is the
opposite regime: every wave delivers NEW content plus re-crawls of old
content, so state rows grow monotonically with distinct hashes while
per-batch append cost must stay ∝ batch. 20 waves over the sf0.1
documents: wave v contributes the docs with doc_id % 20 == v-1 (fresh
hashes) plus a re-crawl of every 3rd doc from each earlier wave (dup
hashes that must merge into persisted state, the cross-wave half of
stream_crawl_corpus's demo). Per wave this prints append wall (the
streaming-batch cost), whether it compacted, live-state rows (must be
monotone and equal the distinct hashes delivered so far), and the
read-back wall (∝ state, bounded by compaction cadence).

Run: PYTHONPATH=. python3 scripts/crawl_long_stream.py [sf_dir]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from oil_wells_data_wrangling_spark.sources.sinks import (  # noqa: E402
    append_merge_parquet,
    read_merged,
)

N_WAVES = 20


def _agg(merged: DataFrame) -> DataFrame:
    # stream_crawl_corpus's exact state merge (webtable.py)
    return merged.groupBy("h").agg(
        F.min("lang").alias("lang"),
        F.min("n_tokens").alias("n_tokens"),
        F.sum("n_copies").cast("bigint").alias("n_copies"),
    )


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "lang", "text")
        .localCheckpoint(eager=True)  # batches must not re-read parquet
    )
    store = os.path.join(tempfile.mkdtemp(prefix="crawl_soak_"), "state")

    total = 0.0
    print("wave  append_s  compacted  state_rows  expect_rows  read_s")
    for v in range(1, N_WAVES + 1):
        fresh = docs.filter(F.col("doc_id") % N_WAVES == v - 1)
        recrawl = docs.filter(
            (F.col("doc_id") % N_WAVES < v - 1) & (F.col("doc_id") % 3 == 0)
        )
        batch = fresh.unionAll(recrawl)
        batch_h = (
            batch.select(
                F.md5("text").alias("h"),
                "lang",
                F.size(F.split("text", " ")).alias("n_tokens"),
            )
            .groupBy("h")
            .agg(
                F.min("lang").alias("lang"),
                F.min("n_tokens").alias("n_tokens"),
                F.count(F.lit(1)).cast("bigint").alias("n_copies"),
            )
        )
        t0 = time.perf_counter()
        compacted = append_merge_parquet(
            batch_h, store, _agg, compact_every=8, batch_id=v
        )
        append_s = time.perf_counter() - t0
        total += append_s
        t0 = time.perf_counter()
        state_rows = read_merged(spark, store, _agg).count()
        read_s = time.perf_counter() - t0
        expect = docs.filter(
            F.col("doc_id") % N_WAVES <= v - 1
        ).select(F.md5("text")).distinct().count()
        print(
            f"{v:4d}  {append_s:8.3f}  {str(compacted):9s}"
            f"  {state_rows:10d}  {expect:11d}  {read_s:6.3f}"
        )
        assert state_rows == expect, (state_rows, expect)
    # fixed point: total copies = all rows ever delivered
    delivered = sum(
        docs.filter(
            (F.col("doc_id") % N_WAVES == v - 1)
            | ((F.col("doc_id") % N_WAVES < v - 1) & (F.col("doc_id") % 3 == 0))
        ).count()
        for v in range(1, N_WAVES + 1)
    )
    got = read_merged(spark, store, _agg).agg(F.sum("n_copies")).collect()[0][0]
    print(f"total append wall {total:.2f}s; copies {got} == delivered {delivered}")
    assert got == delivered, (got, delivered)
    shutil.rmtree(os.path.dirname(store), ignore_errors=True)
    print("SOAK OK")


if __name__ == "__main__":
    main()
