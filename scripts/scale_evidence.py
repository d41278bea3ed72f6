#!/usr/bin/env python3
"""Measure headline-query runtime across scale factors (slope evidence).

    python scripts/scale_evidence.py OUT_JSON DIR [DIR ...] \
        [--skip query:dir_substring ...] [--passes 2]

Runs every headline query at each directory (built by
``make_scaled_testdata.py``), forcing full execution through the noop
sink, and records min-over-passes seconds per (query, dir) to OUT_JSON
incrementally — a crash keeps completed measurements. Slopes
(t_dirN / t_dir0 vs the data factor) are the published artifact: at a
fixed core count a clean operator's slope tracks the data factor once
compute dominates job overhead; a super-linear slope names a scale
bug.

``--skip`` exists for the one deliberate quadratic: ``ann_topk`` is
the brute-force ground truth for ann_recall_eval (documented
small-side-only; ann_lsh/ann_pipeline are the scale path), so it is
excluded at the largest factor rather than pretending it should
survive one.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from oil_wells_data_wrangling_spark.plans.registry import headline_queries
from oil_wells_data_wrangling_spark.session import get_spark


def main() -> None:
    args = sys.argv[1:]
    passes = 2
    if "--passes" in args:
        i = args.index("--passes")
        passes = int(args[i + 1])
        del args[i : i + 2]
    skips: list[tuple[str, str]] = []
    while "--skip" in args:
        i = args.index("--skip")
        q, _, sub = args[i + 1].partition(":")
        skips.append((q, sub))
        del args[i : i + 2]
    out_path, dirs = args[0], args[1:]

    spark = get_spark(app_name="scale_evidence")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    results: dict[str, dict[str, float]] = {}
    for sf_dir in dirs:
        for name, fn in headline_queries().items():
            if any(q == name and sub in sf_dir for q, sub in skips):
                continue
            ts = []
            for _ in range(passes):
                t0 = time.perf_counter()
                fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
                ts.append(time.perf_counter() - t0)
            results.setdefault(name, {})[sf_dir] = round(min(ts), 3)
            print(f"{name} @ {sf_dir}: {min(ts):.3f}s", flush=True)
            with open(out_path, "w") as f:
                json.dump(results, f, indent=1)
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
