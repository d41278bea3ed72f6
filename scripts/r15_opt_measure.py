#!/usr/bin/env python3
"""Round-15 optimization measurements.

    python scripts/r15_opt_measure.py OUT_JSON [--sweep | --headline] \
        [--passes N] [--plans DIR] [--only name1,name2]

Times registered queries end-to-end through the noop sink (guide §1.4)
at $SPARK_GRAFT_SF_DIR (default sf0.1), min over N passes, and
optionally dumps .explain("formatted") per query to a plans dir.
Jobs are labelled with setJobDescription (guide §1.5).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from oil_wells_data_wrangling_spark.plans.registry import (
    all_queries,
    headline_queries,
)
from oil_wells_data_wrangling_spark.session import get_spark


def main() -> None:
    out_path = sys.argv[1]
    args = sys.argv[2:]
    passes = 3
    plans_dir = None
    only = None
    mode = "headline"
    i = 0
    while i < len(args):
        a = args[i]
        if a == "--sweep":
            mode = "sweep"
        elif a == "--headline":
            mode = "headline"
        elif a == "--passes":
            i += 1
            passes = int(args[i])
        elif a == "--plans":
            i += 1
            plans_dir = args[i]
        elif a == "--only":
            i += 1
            only = set(args[i].split(","))
        i += 1

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    qs = all_queries() if mode == "sweep" else headline_queries()
    if only:
        qs = {k: v for k, v in qs.items() if k in only}

    spark = get_spark(app_name="r15-opt-measure")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    if plans_dir:
        os.makedirs(plans_dir, exist_ok=True)

    results: dict[str, dict] = {}
    samples: dict[str, list[float]] = {}
    for p in range(passes):
        for name, fn in qs.items():
            spark.sparkContext.setJobDescription(f"r15opt:{name}:pass{p}")
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            dt = round(time.perf_counter() - t0, 3)
            samples.setdefault(name, []).append(dt)
            spark.sparkContext.setJobDescription(None)
        print(
            f"pass {p}: total "
            f"{sum(v[-1] for v in samples.values()):.3f}s",
            flush=True,
        )
    for name, ts in samples.items():
        results[name] = {
            "min": min(ts),
            "median": sorted(ts)[len(ts) // 2],
            "all": ts,
        }
        if plans_dir:
            df = qs[name](spark, sf_dir)
            plan = spark._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            with open(os.path.join(plans_dir, f"{name}.txt"), "w") as f:
                f.write(plan)
    results["_total_min"] = round(
        sum(r["min"] for r in results.values() if isinstance(r, dict)), 3
    )
    with open(out_path, "w") as f:
        json.dump(results, f, indent=1, sort_keys=True)
    print(json.dumps({k: v["min"] for k, v in results.items()
                      if isinstance(v, dict)}, sort_keys=True))
    print(f"total(min): {results['_total_min']}s", flush=True)


if __name__ == "__main__":
    main()
