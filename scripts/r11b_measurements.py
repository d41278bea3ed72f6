#!/usr/bin/env python3
"""Round-11b scale measurements (BASELINE.md evidence).

    python scripts/r11b_measurements.py OUT_JSON DIR1X DIR10X DIR100X

Times the second round-11 operator batch at 1x/10x/100x word-salted
replicas (scripts/make_scaled_testdata.py) — min over 2 passes through
the noop sink, same protocol as scale_evidence.py.

hard_negative_mining is measured at all factors deliberately: its
corpus side grows linearly (panel is fixed at 8 anchors), so unlike
ann_topk's all-pairs shape it has no quadratic term to exclude.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from oil_wells_data_wrangling_spark.plans.registry import REGISTRY, _load_all
from oil_wells_data_wrangling_spark.session import get_spark

_NEW = [
    "rrf_fusion",
    "grpo_advantage",
    "secrets_scan",
    "license_classify",
    "hard_negative_mining",
    "moe_router_stats",
    "curriculum_schedule",
    "warc_dedup_digest",
]


def main() -> None:
    out_path, dirs = sys.argv[1], sys.argv[2:]
    _load_all()
    spark = get_spark(app_name="r11b_measurements")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    results: dict[str, dict[str, float]] = {}
    for sf_dir in dirs:
        for name in _NEW:
            fn = REGISTRY[name].fn
            ts = []
            for _ in range(2):
                t0 = time.monotonic()
                fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
                ts.append(time.monotonic() - t0)
            results.setdefault(name, {})[sf_dir] = round(min(ts), 3)
            with open(out_path, "w") as f:
                json.dump(results, f, indent=2)
            print(name, sf_dir, results[name][sf_dir], flush=True)


if __name__ == "__main__":
    main()
