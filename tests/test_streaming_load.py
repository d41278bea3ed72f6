"""Streaming load test: sustained multi-batch throughput with BOUNDED
state (SURVEY §7 round-2 candidate; VERDICT r1 item 10).

A rate source drives the watermarked window aggregation with event time
advancing ~1 minute per row — hours of event time per wall-clock second
— so the 2h watermark must continuously evict closed windows. If
eviction broke, numRowsTotal would grow with every batch; the assertion
pins it to the analytic steady-state bound instead.
"""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from oil_wells_data_wrangling_spark.streaming.events import stream_window_agg

_ROWS_PER_SEC = 5000
_EPOCH = 1_600_000_000  # fixed event-time origin


def _rate_events(spark):
    """Map the rate source onto the events schema: event time advances
    60s per row, so watermark/eviction cycles play out in seconds."""
    rate = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", _ROWS_PER_SEC)
        .load()
    )
    return rate.select(
        F.col("value").alias("event_id"),
        F.timestamp_seconds(F.lit(_EPOCH) + F.col("value") * 60).alias("ts"),
        (F.col("value") % 50).alias("user_id"),
        F.concat(F.lit("type_"), (F.col("value") % 3).cast("string")).alias(
            "event_type"
        ),
        (F.col("value") % 100).cast("double").alias("value"),
        F.lit("{}").alias("props"),
    )


def test_windowed_agg_state_stays_bounded_under_load(spark):
    agg = stream_window_agg(_rate_events(spark))
    q = (
        agg.writeStream.format("memory")
        .queryName("load_win_agg")
        .outputMode("append")
        .trigger(processingTime="500 milliseconds")
        .start()
    )
    try:
        deadline = time.time() + 90
        progresses = []
        while time.time() < deadline:
            seen = {p["batchId"]: p for p in q.recentProgress if p["numInputRows"] > 0}
            progresses = sorted(seen.values(), key=lambda p: p["batchId"])
            if (
                len(progresses) >= 6
                and sum(p["numInputRows"] for p in progresses) >= 10 * _ROWS_PER_SEC
            ):
                break
            time.sleep(0.5)
        assert len(progresses) >= 6, "stream did not sustain multiple batches"
        total_rows = sum(p["numInputRows"] for p in progresses)
        assert total_rows >= 10 * _ROWS_PER_SEC, f"too little load: {total_rows}"

        # State bound: the store holds only windows inside the watermark
        # horizon (~a couple batches' worth of open windows), NOT every
        # window ever produced. Two checks: no growth trend after the
        # initial backlog clears, and an absolute cap far below the
        # total window count of the run (total_rows minutes of event
        # time → thousands of windows produced overall).
        with_state = [p for p in progresses if p.get("stateOperators")]
        observed = [
            (
                p["stateOperators"][0]["numRowsTotal"],
                p["numInputRows"] + (prev["numInputRows"] if prev else 0),
            )
            for prev, p in zip([None] + with_state[:-1], with_state)
        ]
        assert observed, "no state operator metrics reported"
        state_rows = [s for s, _ in observed]
        windows_produced = total_rows // 60 * 3  # 1h windows × 3 event types
        assert max(state_rows) < windows_produced / 2, (
            f"state retains most windows ever produced: {state_rows}"
        )
        # Analytic steady-state bound (not a comparison against the
        # first observed batches, which is timing-sensitive on loaded
        # machines): the store holds windows newer than the watermark —
        # the 2h horizon + the watermark's one-batch update lag (so the
        # previous batch's span is included, covering pre-eviction
        # metric reporting) + two partial 1h windows, × 3 event types.
        # Event time advances 60s/row, so R rows span R/60 hours.
        for state, span_rows in observed:
            bound = 3 * (2 + span_rows / 60 + 2)
            assert state <= bound, (
                f"state {state} exceeds analytic bound {bound:.0f} "
                f"for a {span_rows}-row span: {observed}"
            )
        # and eviction is actually happening: closed windows were emitted
        emitted = spark.table("load_win_agg").count()
        assert emitted > 0, "watermark never closed a window"
    finally:
        q.stop()
