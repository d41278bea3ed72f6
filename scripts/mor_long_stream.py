"""Long-stream evidence for the MOR state store (r12 verdict item 4).

The r12 A/B proved append_merge_parquet's O(batch) posture on a
3-batch demo; its CLAIM is about long streams. This script runs a
20-batch CDC ingest (sf0.1 orders — the 10x scale of the correctness
SF) for compact_every in {2, 8} and prints the per-batch wall-time
curve, total, and a final-state correctness check against the
driver-side keep-latest. Flat append cost with bounded compaction
spikes = claim proven; a growing baseline would mean the cadence knob
needs surfacing on the registered demos.

Run: PYTHONPATH=. python3 scripts/mor_long_stream.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from oil_wells_data_wrangling_spark.sources.sinks import (  # noqa: E402
    append_merge_parquet,
    dedupe_latest,
    read_merged,
)

N_BATCHES = 20


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

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    # 20 CDC waves: wave v updates every key with key % 3 != v % 3
    # (two thirds of keys per wave, version=v; every 11th (key+version)
    # is a delete) — no key locality, the canonical MOR workload.
    log = (
        orders.select(F.col("o_orderkey").alias("key"),
                      F.col("o_orderstatus").alias("status"))
        .crossJoin(
            spark.range(1, N_BATCHES + 1).select(
                F.col("id").cast("int").alias("version")
            )
        )
        .filter((F.col("key") % 3) != (F.col("version") % 3))
        .withColumn(
            "op",
            F.when((F.col("key") + F.col("version")) % 11 == 0, "D")
            .otherwise("U"),
        )
    )
    work = tempfile.mkdtemp(prefix="mor_long_")
    src = os.path.join(work, "src")
    log.write.partitionBy("version").parquet(src)
    batch_paths = {
        int(d.split("=")[1]): os.path.join(src, d)
        for d in os.listdir(src)
        if d.startswith("version=")
    }

    def keep_latest(df):
        return dedupe_latest(df, ["key"], "version")

    results = {}
    for ce in (2, 8):
        store = os.path.join(work, f"store_ce{ce}")
        times = []
        for v in range(1, N_BATCHES + 1):
            batch = (
                spark.read.parquet(batch_paths[v])
                .withColumn("version", F.lit(v))
                .select("key", "status", "version", "op")
            )
            t0 = time.monotonic()
            compacted = append_merge_parquet(
                batch, store, keep_latest, compact_every=ce, batch_id=v
            )
            dt = time.monotonic() - t0
            times.append(round(dt, 3))
            print(f"ce={ce} batch={v:2d} {dt:6.2f}s"
                  f"{'  [compacted]' if compacted else ''}", flush=True)
        live = read_merged(spark, store, keep_latest)
        got = {r.key: (r.version, r.op) for r in live.collect()}
        truth = {
            r.key: (r.version, r.op)
            for r in keep_latest(
                log.select("key", "status", "version", "op")
            ).collect()
        }
        ok = got == truth
        results[ce] = {
            "per_batch_sec": times,
            "total_sec": round(sum(times), 2),
            "first_half_sec": round(sum(times[:10]), 2),
            "second_half_sec": round(sum(times[10:]), 2),
            "state_matches_batch": ok,
        }
        print(f"ce={ce}: total={results[ce]['total_sec']}s "
              f"halves={results[ce]['first_half_sec']}/"
              f"{results[ce]['second_half_sec']} correct={ok}", flush=True)
    shutil.rmtree(work, ignore_errors=True)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
