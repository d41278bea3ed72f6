#!/usr/bin/env python3
"""Multi-hundred-batch streaming soak (r14 verdict item 8): make the
CURVES the artifact, not a 20-batch note.

Part A — MOR content-hash state, 200 delivery waves (10× the r14
soak): fixed-size waves (fresh 1/200th of sf0.1 documents + re-crawls
of two earlier cohorts) into ``append_merge_parquet`` with the
production ``compact_every=8`` AND the r15 ``min_retained_batches=2``
retention guard, exactly the stream_crawl_corpus state merge. Curve:
per-wave append wall (must stay flat over 200 waves while state grows
200×), delta-dir count (read amplification must stay ≤ compact_every
+ retention), state rows vs expected distinct hashes (asserted every
10 waves), read-back wall (sampled, must stay flat).

Part B — Structured Streaming watermark eviction, ~250 micro-batches:
the registered ``stream_window_agg`` (2h watermark, 1h tumbling
windows) driven one-file-per-trigger over 250 hour-files whose event
time advances monotonically. Curve: per-batch state rows total /
rows removed by eviction / watermark, from the engine's own
StreamingQueryProgress (numRecentProgressUpdates raised so the whole
run is retained). The claim measured: state PLATEAUS at the
watermark-horizon window count (bounded — eviction keeps up) while
the watermark advances ~1h per batch; cumulative evictions ≈ closed
windows.

Run: PYTHONPATH=. python3 scripts/soak_long_stream.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from oil_wells_data_wrangling_spark.sources.sinks import (  # noqa: E402
    append_merge_parquet,
    read_merged,
)
from oil_wells_data_wrangling_spark.streaming.events import (  # noqa: E402
    read_event_stream,
    stream_window_agg,
)

N_WAVES = 200
N_HOURS = 250


def _agg(merged: DataFrame) -> DataFrame:
    # stream_crawl_corpus's exact state merge (webtable.py)
    return merged.groupBy("h").agg(
        F.min("lang").alias("lang"),
        F.min("n_tokens").alias("n_tokens"),
        F.sum("n_copies").cast("bigint").alias("n_copies"),
    )


def soak_mor(spark: SparkSession, sf_dir: str) -> dict:
    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "lang", "text")
        .localCheckpoint(eager=True)
    )
    store = os.path.join(tempfile.mkdtemp(prefix="soak_mor_"), "state")
    appends: list[float] = []
    delta_dirs: list[int] = []
    checks: list[tuple[int, int, int, float]] = []
    delivered = 0
    t_all = time.perf_counter()
    for v in range(1, N_WAVES + 1):
        # fixed-size delivery: one fresh cohort + two re-crawled ones
        cohort = F.col("doc_id") % N_WAVES
        sel = cohort == v - 1
        if v >= 3:
            sel = sel | (cohort == v - 3)  # recent re-crawl
        if v >= 10:
            sel = sel | (cohort == (v // 2) - 1)  # old re-crawl
        batch = docs.filter(sel)
        delivered += batch.count()
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
        append_merge_parquet(
            batch_h,
            store,
            _agg,
            compact_every=8,
            batch_id=v,
            min_retained_batches=2,
        )
        appends.append(round(time.perf_counter() - t0, 3))
        n_dirs = sum(
            1
            for d in os.listdir(os.path.join(store, "_deltas"))
            if not d.startswith((".", "_"))
        )
        delta_dirs.append(n_dirs)
        if v % 10 == 0 or v == N_WAVES:
            t0 = time.perf_counter()
            state_rows = read_merged(spark, store, _agg).count()
            read_s = round(time.perf_counter() - t0, 3)
            expect = (
                docs.filter(cohort <= v - 1)
                .select(F.md5("text"))
                .distinct()
                .count()
            )
            assert state_rows == expect, (v, state_rows, expect)
            checks.append((v, state_rows, expect, read_s))
            spark.catalog.clearCache()
    total_wall = time.perf_counter() - t_all
    got = read_merged(spark, store, _agg).agg(F.sum("n_copies")).collect()[
        0
    ][0]
    assert got == delivered, (got, delivered)
    shutil.rmtree(os.path.dirname(store), ignore_errors=True)

    def _q(xs, p):
        return sorted(xs)[int(p * (len(xs) - 1))]

    return {
        "waves": N_WAVES,
        "append_s": {
            "first": appends[0],
            "p50": _q(appends[1:], 0.5),
            "p90": _q(appends[1:], 0.9),
            "max_noncompact": max(
                a
                for a, d in zip(appends[1:], delta_dirs[1:])
                if d > 3  # compaction resets dirs to base+retained(2)
            ),
            "max": max(appends[1:]),
            "p50_first_50": _q(appends[1:50], 0.5),
            "p50_last_50": _q(appends[-50:], 0.5),
        },
        "delta_dirs_max": max(delta_dirs),
        "state_curve": [
            {"wave": w, "rows": r, "read_s": s} for w, r, _, s in checks
        ],
        "copies": got,
        "delivered": delivered,
        "total_wall_s": round(total_wall, 1),
    }


def soak_watermark(spark: SparkSession) -> dict:
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    work = tempfile.mkdtemp(prefix="soak_wm_")
    src = os.path.join(work, "events")
    ckpt = os.path.join(work, "ckpt")
    os.makedirs(src)
    base_us = 1_767_225_600_000_000  # 2026-01-01 00:00:00 UTC in µs
    types = ["click", "view", "purchase", "refund"]
    rows_per_hour = 40
    for h in range(N_HOURS):
        ts = base_us + h * 3_600_000_000 + np.arange(rows_per_hour) * (
            3_600_000_000 // rows_per_hour
        )
        tbl = pa.table(
            {
                "event_id": pa.array(
                    [f"e{h}_{i}" for i in range(rows_per_hour)]
                ),
                "user_id": pa.array(
                    (np.arange(rows_per_hour) % 7).astype("int64")
                ),
                "event_type": pa.array(
                    [types[i % len(types)] for i in range(rows_per_hour)]
                ),
                "value": pa.array(
                    (np.arange(rows_per_hour) % 13) * 1.25
                ),
                "ts": pa.array(ts, type=pa.timestamp("us")),
            }
        )
        pq.write_table(tbl, os.path.join(src, f"hour-{h:05d}.parquet"))
    # retain the WHOLE run's progress objects, not the default 100
    spark.conf.set("spark.sql.streaming.numRecentProgressUpdates", "600")
    q = (
        stream_window_agg(read_event_stream(spark, src))
        .writeStream.format("noop")
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .start()
    )
    idle = 0
    deadline = time.time() + 600
    seen_batches = -1
    while time.time() < deadline and idle < 8:
        time.sleep(1.0)
        p = q.lastProgress
        if not p:
            continue
        if p["batchId"] == seen_batches and p["numInputRows"] == 0:
            idle += 1
        else:
            idle = 0
        seen_batches = p["batchId"]
    prog = [
        p if isinstance(p, dict) else json.loads(p.json)
        for p in q.recentProgress
    ]
    q.stop()
    shutil.rmtree(work, ignore_errors=True)
    curve = []
    for p in prog:
        if not p.get("stateOperators"):
            continue
        so = p["stateOperators"][0]
        curve.append(
            {
                "batch": p["batchId"],
                "in_rows": p["numInputRows"],
                "state_rows": so["numRowsTotal"],
                "removed": so["numRowsRemoved"],
                "watermark": p.get("eventTime", {}).get("watermark", ""),
            }
        )
    data_batches = [c for c in curve if c["in_rows"] > 0]
    steady = [c["state_rows"] for c in data_batches if c["batch"] >= 20]
    return {
        "micro_batches": len(data_batches),
        "state_rows_max_steady": max(steady),
        "state_rows_min_steady": min(steady),
        "first_half_max": max(
            c["state_rows"]
            for c in data_batches
            if 20 <= c["batch"] < len(data_batches) // 2
        ),
        "second_half_max": max(
            c["state_rows"]
            for c in data_batches
            if c["batch"] >= len(data_batches) // 2
        ),
        "total_removed": sum(c["removed"] for c in curve),
        "batches_with_eviction": sum(
            1 for c in data_batches if c["removed"] > 0
        ),
        "final_watermark": data_batches[-1]["watermark"],
        "sampled_curve": [
            c for c in data_batches if c["batch"] % 25 == 0
        ],
    }


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
    mor = soak_mor(spark, sf_dir)
    print("MOR_SOAK " + json.dumps(mor))
    wm = soak_watermark(spark)
    print("WM_SOAK " + json.dumps(wm))
    # bounded-state claims, asserted not eyeballed
    assert mor["append_s"]["p50_last_50"] <= 3 * mor["append_s"]["p50_first_50"]
    assert mor["delta_dirs_max"] <= 8 + 2 + 1  # cadence + retention + base
    assert wm["second_half_max"] <= wm["first_half_max"] * 1.5
    assert wm["total_removed"] > 0 and wm["batches_with_eviction"] > 50
    print("SOAK OK")


if __name__ == "__main__":
    main()
