#!/usr/bin/env python3
"""Round-10 scale measurements (BASELINE.md evidence).

    python scripts/r10_measurements.py OUT_JSON DIR1X DIR10X DIR100X

1. chunk_dedup_rewrite at 1x/10x/100x — fresh slope after the r9
   positional-join fix (the committed 12.6x row predates it).
2. warc_pipeline + crawl_to_corpus at 1x/10x/100x — the first
   operators whose cost includes executor-side file I/O both ways.
3. embedding_outliers argmin profile at 100x: full op vs a skeleton
   with the 16x64 cosine replaced by a 1-dim key (isolates the argmin
   arithmetic) vs an Arrow twin (numpy matmul argmin inside
   mapInPandas). Decides r8 verdict item 7.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F

from oil_wells_data_wrangling_spark.plans.registry import REGISTRY, _load_all
from oil_wells_data_wrangling_spark.session import get_spark
from oil_wells_data_wrangling_spark.sources.readers import load_tables

_load_all()

OUT = sys.argv[1]
DIRS = sys.argv[2:]
results: dict[str, dict[str, float]] = {}


def bench(key: str, sf_dir: str, thunk, passes: int = 2) -> None:
    ts = []
    for _ in range(passes):
        t0 = time.perf_counter()
        thunk().write.format("noop").mode("overwrite").save()
        ts.append(time.perf_counter() - t0)
    results.setdefault(key, {})[sf_dir] = round(min(ts), 3)
    print(f"{key} @ {sf_dir}: {min(ts):.3f}s", flush=True)
    with open(OUT, "w") as f:
        json.dump(results, f, indent=1)


def eo_skeleton(spark, sf_dir):
    """embedding_outliers with the 64-dim cosine replaced by a 1-dim
    key: same 16x row explosion, same exchanges — the runtime delta vs
    the full op is the argmin arithmetic itself."""
    from oil_wells_data_wrangling_spark.operators.similarity import (
        _EO_CENTROIDS,
        _EO_RATIO_DEN,
        _EO_RATIO_NUM,
    )

    t = load_tables(spark, sf_dir)
    cent = t.embeddings.filter(F.col("vec_id") < _EO_CENTROIDS).select(
        F.col("vec_id").alias("centroid_id"), F.col("embedding").alias("ce")
    )
    dkey = (
        F.lit(1_000_000)
        - F.round(
            F.element_at("embedding", 1).cast("double") * 1_000_000, 0
        ).cast("bigint")
    ) * 100 + F.col("centroid_id")
    assign = (
        t.embeddings.select("vec_id", "embedding")
        .crossJoin(F.broadcast(cent))
        .select("vec_id", dkey.alias("dkey"))
        .groupBy("vec_id")
        .agg(F.min("dkey").alias("k"))
        .select(
            (F.col("k") % 100).alias("centroid_id"),
            F.expr("k div 100").alias("d"),
        )
    )
    stats = assign.groupBy("centroid_id").agg(
        F.count(F.lit(1)).alias("n_members"), F.sum("d").alias("sd")
    )
    flagged = assign.join(F.broadcast(stats), "centroid_id").select(
        "centroid_id",
        "n_members",
        "sd",
        (
            F.col("d") * _EO_RATIO_DEN * F.col("n_members")
            > F.col("sd") * _EO_RATIO_NUM
        ).cast("int").alias("is_out"),
    )
    return (
        flagged.groupBy("centroid_id", "n_members", "sd")
        .agg(F.sum("is_out").cast("bigint").alias("n_outliers"))
        .select(
            "centroid_id",
            "n_members",
            F.expr("sd div n_members").alias("avg_d"),
            "n_outliers",
        )
    )


def eo_arrow(spark, sf_dir):
    """The SHIPPED Arrow twin (operators/similarity.py) — one numpy
    matmul per batch + the exact-fraction HALF_UP kernel."""
    from oil_wells_data_wrangling_spark.operators.similarity import (
        _eo_assign_arrow,
        _eo_report,
    )

    t = load_tables(spark, sf_dir)
    return _eo_report(_eo_assign_arrow(spark, t))


def main() -> None:
    spark = get_spark(app_name="r10_measurements")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    for sf_dir in DIRS:
        for name in ("chunk_dedup_rewrite", "warc_pipeline", "crawl_to_corpus"):
            bench(name, sf_dir, lambda n=name, d=sf_dir: REGISTRY[n].fn(spark, d))

    big = DIRS[-1]
    # the SQL spec form explicitly (the round-10 profile landed the
    # Arrow twin as the registered implementation, so REGISTRY's
    # embedding_outliers is no longer the "full SQL" variant)
    from oil_wells_data_wrangling_spark.operators.similarity import (
        _eo_assign_sql,
        _eo_report,
    )

    def eo_sql_full():
        t = load_tables(spark, big)
        return _eo_report(_eo_assign_sql(t))

    bench("embedding_outliers_full", big, eo_sql_full)
    bench("embedding_outliers_skeleton", big, lambda: eo_skeleton(spark, big))
    bench("embedding_outliers_arrow", big, lambda: eo_arrow(spark, big))
    # sanity: the Arrow twin must agree with the SQL spec
    a = sorted(map(tuple, eo_sql_full().collect()))
    b = sorted(map(tuple, eo_arrow(spark, big).collect()))
    print("arrow twin agrees:", a == b, flush=True)
    results["arrow_twin_agrees"] = {big: float(a == b)}
    with open(OUT, "w") as f:
        json.dump(results, f, indent=1)
    print(f"wrote {OUT}")


if __name__ == "__main__":
    main()
