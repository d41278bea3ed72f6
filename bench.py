#!/usr/bin/env python3
"""Benchmark the headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1).

Prints ONE JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {"well_pipeline": sec, ...}, "sf": 0.1}

Each query is forced end-to-end with the noop sink (full computation,
no driver collect). Timings are wall-clock per query after a shared
session warmup.
"""

from __future__ import annotations

import json
import os
import re
import time

from oil_wells_data_wrangling_spark.plans.registry import headline_queries
from oil_wells_data_wrangling_spark.session import get_spark


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    spark = get_spark(app_name="bench")
    spark.sparkContext.setLogLevel("ERROR")
    # JVM/codegen warmup outside the timed region
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    # Three passes: pass 1 pays codegen/JIT and fills the
    # pipeline-stage caches; later passes are the steady-state a
    # long-running cluster job actually sees. Report the min per query
    # (the round-over-round comparable, per the round-2 verdict) AND
    # the median (noise indicator: a machine-state drift inflates the
    # median while the min stays put — the r4 +15% diagnosis).
    samples: dict[str, list[float]] = {}
    for _ in range(3):
        for name, fn in headline_queries().items():
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            samples.setdefault(name, []).append(
                round(time.perf_counter() - t0, 3)
            )

    timings = {name: min(ts) for name, ts in samples.items()}
    medians = {name: sorted(ts)[len(ts) // 2] for name, ts in samples.items()}
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_runtime",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "median_total": round(sum(medians.values()), 3),
                "medians": medians,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
