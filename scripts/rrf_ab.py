"""A/B: rrf_fusion current (3 tokenize passes) vs shared per-doc-word
tf_all frame (1 tokenize via exchange reuse). Run:
PYTHONPATH=. python3 scripts/rrf_ab.py [sf_dir]"""

import sys
import time

from pyspark.sql import Window
from pyspark.sql import functions as F

from oil_wells_data_wrangling_spark.operators.textstats import (
    _BM25_IDF_SCALE,
    _BM25_QUERY,
    _RARITY_SCALE,
    _RRF_K,
    _RRF_OUT,
    _RRF_POOL,
    _RRF_SCALE,
    rrf_fusion,
)
from oil_wells_data_wrangling_spark.session import get_spark
from oil_wells_data_wrangling_spark.sources.readers import load_tables


def rrf_fusion_shared(spark, sf_dir):
    t = load_tables(spark, sf_dir)
    tok = t.documents.select(
        "doc_id",
        F.size(F.split("text", " ")).alias("dl"),
        F.explode(F.split("text", " ")).alias("word"),
    )
    # ONE tokenize: per-doc-per-word counts feed both legs; the
    # (doc_id, dl, word) exchange is shared by leg A's filter, leg B's
    # word totals, and leg B's rarity sum via ReusedExchange.
    tf_all = tok.groupBy("doc_id", "dl", "word").agg(
        F.count(F.lit(1)).alias("tf")
    )
    srow = t.documents.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.size(F.split("text", " "))).alias("t_words"),
    ).collect()[0]
    n_docs, t_words = int(srow["n"]), int(srow["t_words"])
    tf = tf_all.filter(F.col("word").isin(*_BM25_QUERY))
    dfreq = tf.groupBy("word").agg(F.count(F.lit(1)).alias("df"))
    bm = (
        tf.join(F.broadcast(dfreq), "word")
        .groupBy("doc_id")
        .agg(
            F.sum(
                F.expr(
                    f"(({n_docs}L - df + 1) * {_BM25_IDF_SCALE} div (df + 1))"
                    f" * tf * 22 div (10 * tf"
                    f" + (3 * ({t_words}L + 3 * dl * {n_docs}L)) div {t_words}L)"
                )
            )
            .cast("bigint")
            .alias("score_a")
        )
    )
    wa = Window.orderBy(F.col("score_a").desc(), "doc_id")
    ra = (
        bm.withColumn("rank_a", F.row_number().over(wa))
        .filter(F.col("rank_a") <= _RRF_POOL)
        .select("doc_id", "rank_a")
    )
    cnt = tf_all.groupBy("word").agg(F.sum("tf").alias("cnt"))
    rar = (
        tf_all.join(F.broadcast(cnt), "word")
        .groupBy("doc_id")
        .agg(
            F.expr(
                f"sum(tf * (({t_words}L * {_RARITY_SCALE}) div cnt))"
                " div sum(tf)"
            )
            .cast("bigint")
            .alias("score_b")
        )
    )
    wb = Window.orderBy(F.col("score_b").desc(), "doc_id")
    rb = (
        rar.withColumn("rank_b", F.row_number().over(wb))
        .filter(F.col("rank_b") <= _RRF_POOL)
        .select("doc_id", "rank_b")
    )
    fused = ra.join(rb, "doc_id", "full_outer").select(
        "doc_id",
        "rank_a",
        "rank_b",
        (
            F.coalesce(
                F.expr(f"{_RRF_SCALE} div ({_RRF_K} + rank_a)"), F.lit(0)
            )
            + F.coalesce(
                F.expr(f"{_RRF_SCALE} div ({_RRF_K} + rank_b)"), F.lit(0)
            )
        )
        .cast("bigint")
        .alias("rrf_fp"),
    )
    wf = Window.orderBy(F.col("rrf_fp").desc(), "doc_id")
    return (
        fused.withColumn("fused_rank", F.row_number().over(wf).cast("int"))
        .filter(F.col("fused_rank") <= _RRF_OUT)
        .select(
            "doc_id",
            "fused_rank",
            "rrf_fp",
            F.col("rank_a").cast("int").alias("rank_a"),
            F.col("rank_b").cast("int").alias("rank_b"),
        )
    )


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark(app_name="rrf_ab")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    old = sorted(map(tuple, rrf_fusion(spark, sf_dir).collect()))
    new = sorted(map(tuple, rrf_fusion_shared(spark, sf_dir).collect()))
    print("outputs identical:", old == new, f"({len(old)} rows)")

    plan = rrf_fusion_shared(spark, sf_dir)._jdf.queryExecution().toString()
    print("ReusedExchange in plan:", "ReusedExchange" in plan)

    for label, fn in [("old", rrf_fusion), ("new", rrf_fusion_shared)]:
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            ts.append(round(time.perf_counter() - t0, 3))
        print(label, "min", min(ts), ts)
    # interleaved second legs to control drift
    for label, fn in [("old2", rrf_fusion), ("new2", rrf_fusion_shared)]:
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            ts.append(round(time.perf_counter() - t0, 3))
        print(label, "min", min(ts), ts)


if __name__ == "__main__":
    main()
