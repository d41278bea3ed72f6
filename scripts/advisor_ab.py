"""Measured A/B for advise_partitioning's recommendations (r13 verdict
item 5): build the compact_table-style fragmented store from the x10 /
x100 documents replicas, read the advisor's two knobs off the footers,
and measure the same workloads with default vs advised confs.

Regime note (why spark.sql.files.minPartitionNum=1): locally Spark's
split size is min(maxPartitionBytes, max(openCost, totalBytes/
defaultParallelism)) — with KBs-per-core the parallelism term wins and
ANY maxPartitionBytes looks fine. On a 100 TB / 1000-executor job the
parallelism term is tens of GB, so the split size IS maxPartitionBytes;
minPartitionNum=1 reproduces exactly that regime without faking data.

Run: PYTHONPATH=. python3 scripts/advisor_ab.py
"""

import os
import shutil
import time

from pyspark.sql import functions as F

from oil_wells_data_wrangling_spark.session import get_spark
from oil_wells_data_wrangling_spark.sources.parquet_meta import (
    advise_partitioning,
)

WORK = "/tmp/advisor_ab"
FRAG_FILES = 256  # file-per-micro-batch fragmentation


def scan_work(spark, path):
    # decode-heavy scan: tokenize + distinct ratio, tiny rollup
    df = spark.read.parquet(path)
    w = F.split("text", " ")
    return (
        df.select(
            "lang",
            F.size(w).alias("n"),
            (F.size(F.array_distinct(w)) * 1000 / F.size(w)).alias("r"),
        )
        .groupBy("lang")
        .agg(F.sum("n").alias("tokens"), F.avg("r").alias("distinct_permille"))
    )


def shuffle_work(spark, path):
    # md5-keyed dedup exchange (corpus_pipeline's shape)
    df = spark.read.parquet(path)
    return (
        df.select(F.md5("text").alias("h"), F.length("text").alias("c"))
        .groupBy("h")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("c").alias("chars"))
        .groupBy()
        .agg(F.count(F.lit(1)).alias("groups"), F.sum("chars").alias("chars"))
    )


def run(fn, spark, path, confs):
    prev = {}
    for k, v in confs.items():
        prev[k] = spark.conf.get(k, None)
        spark.conf.set(k, v)
    try:
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            fn(spark, path).write.format("noop").mode("overwrite").save()
            ts.append(round(time.perf_counter() - t0, 3))
        return min(ts), ts
    finally:
        for k, v in prev.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def main():
    spark = get_spark(app_name="advisor_ab")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    for scale, src in [("10x", "/tmp/scale_x10"), ("100x", "/tmp/scale_x100")]:
        frag = os.path.join(WORK, f"frag_{scale}")
        if not os.path.isdir(frag):
            spark.read.parquet(os.path.join(src, "documents.parquet")).select(
                "doc_id", "lang", "text"
            ).repartition(FRAG_FILES).write.mode("overwrite").parquet(frag)
        adv = advise_partitioning(spark, frag).collect()[0]
        print(
            f"[{scale}] files={adv.n_files} small_files={adv.small_files}"
            f" compressed={adv.compressed_bytes:,}"
            f" uncompressed={adv.uncompressed_bytes:,}"
            f" ratio_permille={adv.compression_permille}"
            f" rec_max_partition_bytes={adv.rec_max_partition_bytes:,}"
            f" rec_shuffle_partitions={adv.rec_shuffle_partitions}"
        )
        base = {"spark.sql.files.minPartitionNum": "1"}
        default = dict(base, **{
            "spark.sql.files.maxPartitionBytes": str(128 * 1024 * 1024),
            "spark.sql.shuffle.partitions": "200",
        })
        advised = dict(base, **{
            "spark.sql.files.maxPartitionBytes": str(
                adv.rec_max_partition_bytes
            ),
            "spark.sql.shuffle.partitions": str(
                max(int(adv.rec_shuffle_partitions), 1)
            ),
        })
        for wname, fn in [("scan", scan_work), ("shuffle", shuffle_work)]:
            for cname, confs in [("default", default), ("advised", advised)]:
                m, ts = run(fn, spark, frag, confs)
                print(f"[{scale}] {wname:7s} {cname:7s} min {m:7.3f}  {ts}")


if __name__ == "__main__":
    main()
