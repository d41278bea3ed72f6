"""Streaming → keyed upsert sink integration: a watermarked dedup stream
foreachBatch-merged into the parquet table keeps exactly the latest row
per key — the streaming materialized view the reference's MySQL upsert
loop approximates."""

from __future__ import annotations

import shutil

from pyspark.sql import functions as F

from oil_wells_data_wrangling_spark.sources.readers import load_tables
from oil_wells_data_wrangling_spark.sources.sinks import read_table, upsert_parquet
from oil_wells_data_wrangling_spark.streaming.events import read_event_stream


def test_stream_foreachbatch_upsert(spark, sf_dir, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    shutil.copy(f"{sf_dir}/events.parquet", src / "events.parquet")
    table = str(tmp_path / "user_latest")

    stream = read_event_stream(spark, str(src)).select(
        "user_id", "event_type", "ts", "value"
    )

    def _merge(batch_df, batch_id):
        latest = (
            batch_df.groupBy("user_id")
            .agg(F.max_by("event_type", "ts").alias("event_type"), F.max("ts").alias("ts"))
        )
        upsert_parquet(latest, table, keys=["user_id"], version_col="ts")

    q = stream.writeStream.foreachBatch(_merge).trigger(availableNow=True).start()
    q.awaitTermination(120)

    got = read_table(spark, table)
    batch = (
        load_tables(spark, sf_dir)
        .events.groupBy("user_id")
        .agg(F.max("ts").alias("ts"))
    )
    got_map = {r["user_id"]: r["ts"] for r in got.collect()}
    want_map = {r["user_id"]: r["ts"] for r in batch.collect()}
    assert got_map == want_map
