"""Streaming twins must reproduce their batch operators.

Each test runs the streaming query with Trigger.AvailableNow over the
static events directory into a memory sink, then compares against the
batch operator (the oracle-checked one)."""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

from oil_wells_data_wrangling_spark.operators.eventops import (
    events_sessionize,
    events_window_agg,
)
from oil_wells_data_wrangling_spark.streaming.events import (
    read_event_stream,
    stream_attribution,
    stream_dedup,
    stream_sessionize,
    stream_window_agg,
)


@pytest.fixture(scope="module")
def events_dir(sf_dir, tmp_path_factory):
    d = tmp_path_factory.mktemp("events_stream")
    shutil.copy(f"{sf_dir}/events.parquet", d / "events.parquet")
    return str(d)


def _run_available_now(sdf, name: str, spark, mode: str = "append"):
    q = (
        sdf.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.table(name)


def _canon(df):
    return sorted(tuple(r) for r in df.collect())


def test_stream_window_agg_matches_batch(spark, sf_dir, events_dir):
    stream = stream_window_agg(read_event_stream(spark, events_dir))
    got = _run_available_now(stream, "win_agg", spark, mode="complete")
    want = events_window_agg(spark, sf_dir)
    assert _canon(got) == _canon(want)


def test_stream_dedup_unique_ids(spark, events_dir):
    got = _run_available_now(
        stream_dedup(read_event_stream(spark, events_dir)), "dedup", spark
    )
    n = got.count()
    assert n == got.select("event_id").distinct().count()
    assert n > 0


def test_stream_enrich_matches_batch(spark, sf_dir, events_dir):
    from oil_wells_data_wrangling_spark.operators.eventops import events_enrich
    from oil_wells_data_wrangling_spark.sources.readers import load_tables
    from oil_wells_data_wrangling_spark.streaming.events import stream_enrich

    cust = load_tables(spark, sf_dir).customer
    got = _run_available_now(
        stream_enrich(read_event_stream(spark, events_dir), cust), "enrich", spark
    )
    want = events_enrich(spark, sf_dir)
    assert _canon(got) == _canon(want)


@pytest.mark.parametrize("impl", ["tws", "legacy"])
def test_stream_sessionize_timeout_path(spark, sf_dir, tmp_path, impl):
    """Two time-ordered micro-batches: batch 2 advances the watermark far
    past batch-1 activity, so idle sessions close via EVENT-TIME TIMEOUT
    (not by a successor event). Every emitted session must still agree
    with batch sessionization — on BOTH stateful APIs."""
    from oil_wells_data_wrangling_spark.sources.readers import (
        load_tables,
        normalize_event_ts,
    )

    e = load_tables(spark, sf_dir).events.withColumn("ts_us", F.unix_micros("ts"))
    mid = e.selectExpr("percentile(ts_us, 0.5) p").first()["p"]
    src = tmp_path / "src"
    e.filter(F.col("ts_us") <= mid).drop("ts_us").coalesce(1).write.parquet(
        str(src / "part0")
    )
    e.filter(F.col("ts_us") > mid).drop("ts_us").coalesce(1).write.parquet(
        str(src / "part1")
    )
    stream = normalize_event_ts(
        spark.readStream.schema(spark.read.parquet(str(src / "part0")).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "part*"))
    )
    got = _run_available_now(
        stream_sessionize(stream, impl=impl), f"sess_timeout_{impl}", spark
    )
    batch = events_sessionize(spark, sf_dir).select(
        "user_id", "session_start", "session_end", "n_events"
    )
    got_set, batch_set = set(_canon(got)), set(_canon(batch))
    assert got_set, "no sessions emitted"
    assert got_set <= batch_set, sorted(got_set - batch_set)[:5]
    # the watermark jump must have closed strictly more sessions than the
    # single-batch run (which can only close sessions via successor events)
    single = _run_available_now(
        stream_sessionize(
            normalize_event_ts(
                spark.readStream.schema(
                    spark.read.parquet(str(src / "part0")).schema
                ).parquet(str(src / "part*"))
            ),
            impl=impl,
        ),
        f"sess_single_{impl}",
        spark,
    )
    assert got.count() >= single.count()


@pytest.mark.parametrize("impl", ["tws", "legacy"])
def test_stream_sessionize_closed_sessions_match_batch(
    spark, sf_dir, events_dir, impl
):
    """AvailableNow never fires the final event-time timeout, so the stream
    emits only sessions *closed by a later event*; every one of those must
    exist in the batch sessionization with identical bounds and counts —
    on BOTH stateful APIs."""
    got = _run_available_now(
        stream_sessionize(read_event_stream(spark, events_dir), impl=impl),
        f"sess_{impl}",
        spark,
    )
    batch = events_sessionize(spark, sf_dir).select(
        "user_id", "session_start", "session_end", "n_events"
    )
    got_set = set(_canon(got))
    batch_set = set(_canon(batch))
    assert got_set, "no closed sessions emitted"
    assert got_set <= batch_set, sorted(got_set - batch_set)[:5]


def test_stream_attribution_matches_batch(spark, sf_dir, events_dir):
    """The stream-stream interval join (click -> purchase within 30 min)
    must reproduce the equivalent batch self-join."""
    from pyspark.sql import functions as F

    from oil_wells_data_wrangling_spark.sources.readers import load_tables

    got = _run_available_now(
        stream_attribution(read_event_stream(spark, events_dir)), "attrib", spark
    )

    ev = load_tables(spark, sf_dir).events
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
        F.col("value"),
    )
    want = clicks.join(
        purchases,
        F.expr(
            "c_user = p_user AND purchase_ts > click_ts "
            "AND purchase_ts <= click_ts + interval 30 minutes"
        ),
    ).select(
        F.col("c_user").alias("user_id"),
        "click_id",
        "purchase_id",
        "click_ts",
        "purchase_ts",
        "value",
    )
    assert _canon(got) == _canon(want)
    assert want.count() > 0  # the join actually attributes something


def test_stream_window_agg_rocksdb_state_store(spark, sf_dir, events_dir):
    """The streaming twins must run unchanged on the RocksDB state
    store — the provider a large-key-space production job uses (the
    HDFS-backed in-memory default holds every key on-heap). Same
    AvailableNow run, same batch equality, different state backend."""
    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        stream = stream_window_agg(read_event_stream(spark, events_dir))
        got = _run_available_now(stream, "win_agg_rocks", spark, mode="complete")
        want = events_window_agg(spark, sf_dir)
        assert _canon(got) == _canon(want)
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)


def test_stream_running_totals_transform_with_state(spark, sf_dir, events_dir):
    """transformWithStateInPandas twin: after AvailableNow over the
    static events, each user's LATEST emitted running total must equal
    the batch aggregate — scaled-int sums make the comparison exact
    across micro-batch boundaries. The operator's worker protocol
    needs protobuf; ``ensure_protobuf`` bridges the relocated on-disk
    runtime when no installed distribution exists (compat/__init__.py),
    so this skips only on hosts with NO usable runtime at all."""
    from oil_wells_data_wrangling_spark.compat import ensure_protobuf

    if not ensure_protobuf():
        pytest.skip("no protobuf runtime available (installed or bridgeable)")
    from oil_wells_data_wrangling_spark.sources.readers import load_tables
    from oil_wells_data_wrangling_spark.streaming.events import (
        stream_running_totals,
    )

    # transformWithState keeps each state variable in its own column
    # family — only the RocksDB provider supports that (the HDFS-backed
    # default raises STATE_STORE_MULTIPLE_COLUMN_FAMILIES).
    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        got_df = _run_available_now(
            stream_running_totals(read_event_stream(spark, events_dir)),
            "running_totals",
            spark,
            mode="update",
        )
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)
    latest = {}
    for r in got_df.collect():
        cur = latest.get(r["user_id"])
        if cur is None or r["n_events"] > cur[0]:
            latest[r["user_id"]] = (r["n_events"], r["sv"])

    batch = (
        load_tables(spark, sf_dir)
        .events.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.expr("cast(round(value * 100) as bigint)")).alias("sv"),
        )
    )
    want = {r["user_id"]: (r["n_events"], r["sv"]) for r in batch.collect()}
    assert latest == want and len(want) > 0


def test_stream_events_topk_matches_batch(spark, sf_dir, events_dir):
    """Streaming counts + per-emission rank finish == batch events_topk."""
    from oil_wells_data_wrangling_spark.operators.eventops import events_topk
    from oil_wells_data_wrangling_spark.streaming.events import (
        rank_topk,
        stream_events_window_counts,
    )

    counts = stream_events_window_counts(read_event_stream(spark, events_dir))
    emitted = _run_available_now(counts, "topk_counts", spark, mode="complete")
    got = rank_topk(emitted)
    want = events_topk(spark, sf_dir)
    assert _canon(got) == _canon(want)


@pytest.mark.parametrize("impl", ["tws", "legacy"])
def test_stream_rate_limit_matches_batch(spark, sf_dir, events_dir, impl):
    from oil_wells_data_wrangling_spark.operators.eventops import (
        events_rate_limit,
    )
    from oil_wells_data_wrangling_spark.streaming.events import (
        stream_rate_limit,
    )

    got = _run_available_now(
        stream_rate_limit(read_event_stream(spark, events_dir), impl=impl),
        f"stream_rate_limit_t_{impl}",
        spark,
    )
    # per-event keeps are arrival-order dependent inside a minute, but
    # the per-user totals are not: roll up and compare to the batch twin
    agg = got.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.when(F.col("kept"), 1).otherwise(0)).alias("n_kept"),
        F.sum(F.when(F.col("kept"), 0).otherwise(1)).alias("n_dropped"),
    )
    want = events_rate_limit(spark, sf_dir)
    assert _canon(agg) == _canon(want)


@pytest.mark.parametrize("impl", ["tws", "legacy"])
def test_stream_scd2_attribution_matches_batch(spark, sf_dir, tmp_path, impl):
    """Per-status attribution rollup of the stream must equal the batch
    scd2_attribution — including purchases whose governing status event
    arrived in an EARLIER micro-batch (the state-carry path), which the
    two-file time-split feed forces. Runs on BOTH stateful APIs (the
    TWS form is the default path)."""
    from oil_wells_data_wrangling_spark.operators.eventops import (
        scd2_attribution,
    )
    from oil_wells_data_wrangling_spark.sources.readers import load_tables
    from oil_wells_data_wrangling_spark.streaming.events import (
        stream_scd2_attribution,
    )

    ev = load_tables(spark, sf_dir).events
    mid = ev.selectExpr(
        "timestamp_micros(cast(percentile_approx(unix_micros(ts), 0.5) as bigint)) m"
    ).first()["m"]
    feed = tmp_path / "feed"
    # two time-ordered files -> two micro-batches under maxFilesPerTrigger=1
    ev.filter(F.col("ts") < F.lit(mid)).coalesce(1).write.parquet(
        str(feed / "a=0")
    )
    ev.filter(F.col("ts") >= F.lit(mid)).coalesce(1).write.parquet(
        str(feed / "a=1")
    )
    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(feed / "a=*"))
    )
    got = _run_available_now(
        stream_scd2_attribution(stream, impl=impl),
        f"scd2_attr_stream_{impl}",
        spark,
    )
    got_roll = got.groupBy("status").agg(
        F.count(F.lit(1)).alias("n_purchases"),
        F.count_distinct("user_id").alias("n_users"),
    )
    want = scd2_attribution(spark, sf_dir).select(
        "status", "n_purchases", "n_users"
    )
    assert _canon(got_roll) == _canon(want)
    assert got.count() > 0
    # state-carry actually exercised: some purchase in batch 2 must be
    # attributed to a status set in batch 1
    n_cross = (
        got.join(
            ev.filter(F.col("ts") >= F.lit(mid)).select("event_id"),
            "event_id",
        )
        .filter(F.col("status") != "none")
        .count()
    )
    assert n_cross > 0


def test_stream_attribution_state_is_bounded(spark, sf_dir, tmp_path):
    """PROVE the attribution join's watermarks bound its state: over a
    4-batch time-ordered feed, the state store must evict rows
    (rows_removed > 0 once the watermark advances) and the final
    batch's state must hold strictly fewer rows than the total
    click+purchase input — i.e. the store is a sliding horizon, not an
    append-only buffer."""
    from oil_wells_data_wrangling_spark.sources.readers import load_tables
    from oil_wells_data_wrangling_spark.streaming.events import (
        stream_attribution,
    )
    from oil_wells_data_wrangling_spark.streaming.metrics import (
        assert_state_bounded,
        progress_state_metrics,
    )

    ev = load_tables(spark, sf_dir).events
    qs = ev.selectExpr(
        *[
            f"timestamp_micros(cast(percentile_approx(unix_micros(ts), {q}) as bigint)) q{i}"
            for i, q in enumerate((0.25, 0.5, 0.75))
        ]
    ).first()
    feed = tmp_path / "feed"
    bounds = [None, qs["q0"], qs["q1"], qs["q2"], None]
    for i in range(4):
        part = ev
        if bounds[i] is not None:
            part = part.filter(F.col("ts") >= F.lit(bounds[i]))
        if bounds[i + 1] is not None:
            part = part.filter(F.col("ts") < F.lit(bounds[i + 1]))
        part.coalesce(1).write.parquet(str(feed / f"b={i}"))
    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(feed / "b=*"))
    )
    q = (
        stream_attribution(stream)
        .writeStream.format("memory")
        .queryName("attrib_metrics")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    metrics = progress_state_metrics(q)
    assert metrics, "no stateful-operator progress captured"
    n_input = ev.filter(
        F.col("event_type").isin("click", "purchase")
    ).count()
    assert sum(m["rows_removed"] for m in metrics) > 0, (
        "watermark never evicted join state across 4 batches"
    )
    final_batch = max(m["batch_id"] for m in metrics)
    final_rows = max(
        m["state_rows"] for m in metrics if m["batch_id"] == final_batch
    )
    assert final_rows < n_input, (
        f"state ({final_rows}) holds the whole input ({n_input}) — unbounded"
    )
    assert_state_bounded(metrics, max_rows=n_input)


def test_stream_sessionize_tws_timers_match_batch(spark, sf_dir, tmp_path):
    """transformWithStateInPandas sessionizer with EVENT-TIME TIMERS:
    two time-ordered micro-batches advance the watermark past batch-1
    activity, so idle sessions must close via handleExpiredTimer (not a
    successor event). Every emitted session must appear in the batch
    sessionization, and the timer path must close strictly more
    sessions than successor events alone would."""
    from oil_wells_data_wrangling_spark.compat import ensure_protobuf

    if not ensure_protobuf():
        pytest.skip("no protobuf runtime available (installed or bridgeable)")
    from oil_wells_data_wrangling_spark.sources.readers import (
        load_tables,
        normalize_event_ts,
    )
    from oil_wells_data_wrangling_spark.streaming.events import (
        stream_sessionize_tws,
    )

    e = load_tables(spark, sf_dir).events.withColumn("ts_us", F.unix_micros("ts"))
    mid = e.selectExpr("percentile(ts_us, 0.5) p").first()["p"]
    src = tmp_path / "src"
    e.filter(F.col("ts_us") <= mid).drop("ts_us").coalesce(1).write.parquet(
        str(src / "part0")
    )
    e.filter(F.col("ts_us") > mid).drop("ts_us").coalesce(1).write.parquet(
        str(src / "part1")
    )
    stream = normalize_event_ts(
        spark.readStream.schema(spark.read.parquet(str(src / "part0")).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "part*"))
    )

    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        # 1s late allowance: after batch 1, the watermark sits just
        # behind batch-0's max ts, so every batch-0 session idle >30min
        # at that point MUST close via its timer during batch 2 — the
        # timer path becomes observable instead of being swallowed by a
        # 2h allowance on a corpus with no 2.5h-idle users.
        got = _run_available_now(
            stream_sessionize_tws(stream, watermark="1 second"),
            "sess_tws",
            spark,
        )
        # gap-closed only (no timers): the legacy twin, single batch,
        # never times out — a cross-API comparison on top of the
        # timer-path assertion
        single = _run_available_now(
            stream_sessionize(
                normalize_event_ts(
                    spark.readStream.schema(
                        spark.read.parquet(str(src / "part0")).schema
                    ).parquet(str(src / "part*"))
                ),
                impl="legacy",
            ),
            "sess_tws_single",
            spark,
        )
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)

    batch = events_sessionize(spark, sf_dir).select(
        "user_id", "session_start", "session_end", "n_events"
    )
    got_set, batch_set = set(_canon(got)), set(_canon(batch))
    assert got_set, "no sessions emitted"
    assert got_set <= batch_set, sorted(got_set - batch_set)[:5]
    assert got.count() > single.count(), (
        "event-time timers closed no extra sessions"
    )


def test_stream_rate_limit_tws_matches_batch(spark, sf_dir, events_dir):
    """transformWithState rate limiter (timer-evicted counters): the
    per-user keep/drop totals must equal the batch events_rate_limit —
    the same arrival-order-invariant rollup the applyInPandasWithState
    twin is held to."""
    from oil_wells_data_wrangling_spark.compat import ensure_protobuf

    if not ensure_protobuf():
        pytest.skip("no protobuf runtime available (installed or bridgeable)")
    from oil_wells_data_wrangling_spark.operators.eventops import (
        events_rate_limit,
    )
    from oil_wells_data_wrangling_spark.streaming.events import (
        stream_rate_limit_tws,
    )

    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        got = _run_available_now(
            stream_rate_limit_tws(read_event_stream(spark, events_dir)),
            "rate_tws",
            spark,
        )
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)

    agg = got.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.when(F.col("kept"), 1).otherwise(0)).alias("n_kept"),
        F.sum(F.when(F.col("kept"), 0).otherwise(1)).alias("n_dropped"),
    )
    want = events_rate_limit(spark, sf_dir)
    assert _canon(agg) == _canon(
        want.select("user_id", "n_events", "n_kept", "n_dropped")
    )


def _write_out_of_order_fixture(spark, tmp_path):
    """Three single-file micro-batches with a late-but-in-allowance event:

    - batch 0: user 1 at 10:00 and 10:10 (open session), user 2 at 12:00
      (watermark driver — wm becomes 10:00 after this batch).
    - batch 1: user 1 at 10:05 — OUT OF ORDER but above the watermark, so
      it must EXTEND the open session (n_events 3) without moving
      session_end (10:10) or the idle timer backwards; user 2 at 12:45
      pushes the watermark to 10:45, past session-end + 30min gap.
    - batch 2: user 2 at 13:00 — a trigger whose watermark (10:45)
      fires user 1's idle timeout, emitting the session.
    """
    import datetime as dt

    def t(hh, mm):
        return dt.datetime(2024, 1, 1, hh, mm)

    batches = [
        [(1, t(10, 0)), (1, t(10, 10)), (2, t(12, 0))],
        [(1, t(10, 5)), (2, t(12, 45))],
        [(2, t(13, 0))],
    ]
    src = tmp_path / "ooo_src"
    for i, rows in enumerate(batches):
        spark.createDataFrame(rows, "user_id bigint, ts timestamp").coalesce(
            1
        ).write.parquet(str(src / f"part{i}"))
    schema = spark.read.parquet(str(src / "part0")).schema
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "part*"))
    )


def _assert_out_of_order_sessions(got):
    sess = {
        (r["user_id"], str(r["session_start"]), str(r["session_end"])): r[
            "n_events"
        ]
        for r in got.collect()
    }
    key = (1, "2024-01-01 10:00:00", "2024-01-01 10:10:00")
    assert key in sess, (
        f"user 1's timer-closed session missing or its end regressed: {sess}"
    )
    assert sess[key] == 3, (
        f"late in-allowance event not counted into the open session: {sess}"
    )
    # no session for user 1 may end at the late event's timestamp
    assert not any(
        u == 1 and e == "2024-01-01 10:05:00" for (u, _s, e) in sess
    ), f"session_end moved backwards to the late event: {sess}"


def test_stream_sessionize_out_of_order_extends_not_shrinks(spark, tmp_path):
    """A cross-microbatch event that is late but inside the watermark
    allowance must extend the open session's count without shrinking
    session_end or regressing the idle timeout (applyInPandasWithState
    path)."""
    got = _run_available_now(
        stream_sessionize(
            _write_out_of_order_fixture(spark, tmp_path), impl="legacy"
        ),
        "sess_ooo",
        spark,
    )
    _assert_out_of_order_sessions(got)


def test_stream_sessionize_tws_out_of_order_extends_not_shrinks(
    spark, tmp_path
):
    """Same out-of-order contract on the transformWithStateInPandas twin:
    the late event must not re-register an EARLIER idle timer (which
    would close the session prematurely and under-count it)."""
    from oil_wells_data_wrangling_spark.compat import ensure_protobuf

    if not ensure_protobuf():
        pytest.skip("no protobuf runtime available (installed or bridgeable)")
    from oil_wells_data_wrangling_spark.streaming.events import (
        stream_sessionize_tws,
    )

    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        got = _run_available_now(
            stream_sessionize_tws(_write_out_of_order_fixture(spark, tmp_path)),
            "sess_tws_ooo",
            spark,
        )
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)
    _assert_out_of_order_sessions(got)


def test_stream_topk_tws_final_emission_matches_batch(spark, sf_dir, tmp_path):
    """transformWithState windowed top-k: MAP state per open window, one
    event-time timer per window, FINAL once-per-window emission. Two
    time-ordered micro-batches + a 1s allowance mean every batch-0
    window whose close+1min precedes the batch-1 watermark must fire —
    and a fired window's rows must EXACTLY equal the batch operator's
    rows for that window (the window was complete when sealed)."""
    from oil_wells_data_wrangling_spark.compat import ensure_protobuf

    if not ensure_protobuf():
        pytest.skip("no protobuf runtime available (installed or bridgeable)")
    from oil_wells_data_wrangling_spark.operators.eventops import events_topk
    from oil_wells_data_wrangling_spark.sources.readers import (
        load_tables,
        normalize_event_ts,
    )
    from oil_wells_data_wrangling_spark.streaming.events import stream_topk_tws

    e = load_tables(spark, sf_dir).events.withColumn("ts_us", F.unix_micros("ts"))
    mid = e.selectExpr("percentile(ts_us, 0.5) p").first()["p"]
    src = tmp_path / "src"
    e.filter(F.col("ts_us") <= mid).drop("ts_us").coalesce(1).write.parquet(
        str(src / "part0")
    )
    e.filter(F.col("ts_us") > mid).drop("ts_us").coalesce(1).write.parquet(
        str(src / "part1")
    )
    stream = normalize_event_ts(
        spark.readStream.schema(spark.read.parquet(str(src / "part0")).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "part*"))
    )

    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        got = _run_available_now(
            stream_topk_tws(
                stream, watermark="1 second", fire_after_close_ms=60_000
            ),
            "topk_tws",
            spark,
        )
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)

    emitted = got.collect()
    assert emitted, "no window fired its timer"
    batch = {
        (r.window_start, r.rank): (r.event_type, r.n_events)
        for r in events_topk(spark, sf_dir).collect()
    }
    for r in emitted:
        assert batch[(r.window_start, r.rank)] == (r.event_type, r.n_events), (
            f"sealed window {r.window_start} diverged from batch at rank {r.rank}"
        )
    # every fired window carries exactly the batch row count for that
    # window (its full top-k; fewer only when the hour has fewer types)
    import collections

    per_win = collections.Counter(r.window_start for r in emitted)
    batch_per_win = collections.Counter(w for (w, _rk) in batch)
    for w, n in per_win.items():
        assert n == batch_per_win[w], (w, n, batch_per_win[w])


def test_stream_cms_tws_sealed_cells_match_batch_sketch(spark, sf_dir, tmp_path):
    """Streaming CMS: every window that fires its timer publishes cells
    BIT-EQUAL to a batch sketch built over that hour's events (same
    md5-derived hash rows), and per-window cell counts never exceed the
    sketch dimensions — the fixed-size-state contract."""
    from oil_wells_data_wrangling_spark.compat import ensure_protobuf

    if not ensure_protobuf():
        pytest.skip("no protobuf runtime available (installed or bridgeable)")
    from oil_wells_data_wrangling_spark.operators.eventops import (
        _CMS_BUCKET_SPARK,
        _CMS_D,
        _CMS_W,
    )
    from oil_wells_data_wrangling_spark.sources.readers import (
        load_tables,
        normalize_event_ts,
    )
    from oil_wells_data_wrangling_spark.streaming.events import stream_cms_tws

    e = load_tables(spark, sf_dir).events.withColumn("ts_us", F.unix_micros("ts"))
    mid = e.selectExpr("percentile(ts_us, 0.5) p").first()["p"]
    src = tmp_path / "src"
    e.filter(F.col("ts_us") <= mid).drop("ts_us").coalesce(1).write.parquet(
        str(src / "part0")
    )
    e.filter(F.col("ts_us") > mid).drop("ts_us").coalesce(1).write.parquet(
        str(src / "part1")
    )
    stream = normalize_event_ts(
        spark.readStream.schema(spark.read.parquet(str(src / "part0")).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "part*"))
    )

    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        got = _run_available_now(
            stream_cms_tws(
                stream, watermark="1 second", fire_after_close_ms=60_000
            ),
            "cms_tws",
            spark,
        )
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)

    emitted = got.collect()
    assert emitted, "no window fired its timer"

    batch_cells = {
        (r.window_start, r.d, r.bucket): r.n
        for r in (
            load_tables(spark, sf_dir)
            .events.select(
                F.date_trunc("hour", "ts").alias("window_start"), "user_id"
            )
            .select(
                "window_start",
                F.explode(
                    F.array(*[F.lit(d) for d in range(_CMS_D)])
                ).alias("d"),
                "user_id",
            )
            .select(
                "window_start",
                "d",
                F.expr(_CMS_BUCKET_SPARK.format(d="d")).alias("bucket"),
            )
            .groupBy("window_start", "d", "bucket")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        )
    }
    fired = set()
    for r in emitted:
        fired.add(r.window_start)
        assert batch_cells[(r.window_start, r.d, r.bucket)] == r.n, (
            f"cell {(r.window_start, r.d, r.bucket)} diverged from batch"
        )
    # fired windows publish their COMPLETE sketch: every batch cell of a
    # fired window appears, and cell count respects sketch dimensions
    import collections

    per_win = collections.Counter(r.window_start for r in emitted)
    for w in fired:
        want = sum(1 for (bw, _d, _b) in batch_cells if bw == w)
        assert per_win[w] == want
        assert per_win[w] <= _CMS_D * _CMS_W


def test_stream_hll_tws_sealed_registers_match_batch(spark, sf_dir, tmp_path):
    """Streaming HLL: every fired window's sealed registers must be
    BIT-EQUAL to the batch hll_register_sketch rows for that hour, and
    bounded by the 256-bucket sketch size — state never tracks event
    volume."""
    from oil_wells_data_wrangling_spark.compat import ensure_protobuf

    if not ensure_protobuf():
        pytest.skip("no protobuf runtime available (installed or bridgeable)")
    from oil_wells_data_wrangling_spark.operators.eventops import (
        hll_register_sketch,
    )
    from oil_wells_data_wrangling_spark.sources.readers import (
        load_tables,
        normalize_event_ts,
    )
    from oil_wells_data_wrangling_spark.streaming.events import stream_hll_tws

    e = load_tables(spark, sf_dir).events.withColumn("ts_us", F.unix_micros("ts"))
    mid = e.selectExpr("percentile(ts_us, 0.5) p").first()["p"]
    src = tmp_path / "src"
    e.filter(F.col("ts_us") <= mid).drop("ts_us").coalesce(1).write.parquet(
        str(src / "part0")
    )
    e.filter(F.col("ts_us") > mid).drop("ts_us").coalesce(1).write.parquet(
        str(src / "part1")
    )
    stream = normalize_event_ts(
        spark.readStream.schema(spark.read.parquet(str(src / "part0")).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "part*"))
    )

    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        got = _run_available_now(
            stream_hll_tws(
                stream, watermark="1 second", fire_after_close_ms=60_000
            ),
            "hll_tws",
            spark,
        )
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)

    emitted = got.collect()
    assert emitted, "no window fired its timer"

    batch = {
        (r.window_start, r.bucket): r.r
        for r in hll_register_sketch(spark, sf_dir).collect()
    }
    fired = set()
    for r in emitted:
        fired.add(r.window_start)
        assert batch[(r.window_start, r.bucket)] == r.r, (
            f"register {(r.window_start, r.bucket)} diverged from batch"
        )
    import collections

    per_win = collections.Counter(r.window_start for r in emitted)
    for w in fired:
        want = sum(1 for (bw, _b) in batch if bw == w)
        assert per_win[w] == want
        assert per_win[w] <= 256


def test_stream_log_histogram_tws_sealed_cells_match_batch(
    spark, sf_dir, tmp_path
):
    """Streaming log histogram: every fired window's sealed cells must
    be BIT-EQUAL to the batch log_histogram_sketch rows for that hour
    (same integer cents incl. HALF_UP rounding, same signed floor-log2
    buckets), completing the sealed-sketch family's streaming side."""
    from oil_wells_data_wrangling_spark.compat import ensure_protobuf

    if not ensure_protobuf():
        pytest.skip("no protobuf runtime available (installed or bridgeable)")
    from oil_wells_data_wrangling_spark.operators.eventops import (
        log_histogram_sketch,
    )
    from oil_wells_data_wrangling_spark.sources.readers import (
        load_tables,
        normalize_event_ts,
    )
    from oil_wells_data_wrangling_spark.streaming.events import (
        stream_log_histogram_tws,
    )

    e = load_tables(spark, sf_dir).events.withColumn("ts_us", F.unix_micros("ts"))
    mid = e.selectExpr("percentile(ts_us, 0.5) p").first()["p"]
    src = tmp_path / "src"
    e.filter(F.col("ts_us") <= mid).drop("ts_us").coalesce(1).write.parquet(
        str(src / "part0")
    )
    e.filter(F.col("ts_us") > mid).drop("ts_us").coalesce(1).write.parquet(
        str(src / "part1")
    )
    stream = normalize_event_ts(
        spark.readStream.schema(spark.read.parquet(str(src / "part0")).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "part*"))
    )

    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        got = _run_available_now(
            stream_log_histogram_tws(
                stream, watermark="1 second", fire_after_close_ms=60_000
            ),
            "logh_tws",
            spark,
        )
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)

    emitted = got.collect()
    assert emitted, "no window fired its timer"
    batch = {
        (r.window_start, r.bucket): (r.n, r.min_cents, r.max_cents)
        for r in log_histogram_sketch(spark, sf_dir).collect()
    }
    fired = set()
    for r in emitted:
        fired.add(r.window_start)
        assert batch[(r.window_start, r.bucket)] == (
            r.n, r.min_cents, r.max_cents,
        ), f"cell {(r.window_start, r.bucket)} diverged from batch"
    import collections

    per_win = collections.Counter(r.window_start for r in emitted)
    for w in fired:
        want = sum(1 for (bw, _b) in batch if bw == w)
        assert per_win[w] == want


def test_half_up_cents_matches_spark_round_on_adversarial_doubles(spark):
    """half_up_cents must equal Spark's round(v*100) on every double,
    including values one ulp below a .5 boundary where the naive
    floor(|x|+0.5) kernel carries over (0.0049999999999999994*100 + 0.5
    == 1.0 in fp while BigDecimal HALF_UP yields 0)."""
    import math

    from oil_wells_data_wrangling_spark.streaming.events import half_up_cents

    vals = [
        0.0049999999999999994,  # *100 -> 0.49999999999999994: carry trap
        -0.0049999999999999994,
        0.005,  # exact .5 boundary after *100
        -0.005,
        math.nextafter(0.005, 0.0),
        math.nextafter(0.005, 1.0),
        1.005,  # *100 = 100.49999999999999 in fp -> 100
        -1.005,
        2.675,
        0.0,
        123.456,
        -123.455,
        1e12 + 0.0049999999999999994,
    ]
    got = half_up_cents(vals)
    want = [
        r.c
        for r in spark.createDataFrame([(v,) for v in vals], "v double")
        .selectExpr("cast(round(v * 100.0, 0) as bigint) as c")
        .collect()
    ]
    assert list(got) == want, list(zip(vals, got, want))
