"""refresh_incremental — the materialized-rollup consumer over the MOR
changelog (r15 §2.E): exactly-once via the destination's own commit
markers (no cursor file), lag tolerance under the source's retention
guard, loud full-refresh fallback on expiry. The view under test is a
per-lang rollup over the crawl-state store's (h, lang, n_tokens,
n_copies) grain — associative over the source's partial rollups, as
the read_changes contract requires."""

from __future__ import annotations

from pyspark.sql import functions as F

from oil_wells_data_wrangling_spark.sources.incremental import (
    consumed_cursor,
    read_view,
    refresh_incremental,
)
from oil_wells_data_wrangling_spark.sources.sinks import (
    append_merge_parquet,
)


def _source_merge(df):
    return df.groupBy("h").agg(
        F.min("lang").alias("lang"),
        F.sum("n_copies").cast("bigint").alias("n_copies"),
    )


def _view_merge(df):
    return df.groupBy("lang").agg(
        F.sum("n_copies").cast("bigint").alias("n_copies"),
    )


def _batch(spark, i):
    # batch i: one fresh hash in lang a<i%2>, plus a re-crawl of h0
    return spark.createDataFrame(
        [(f"h{i}", f"lang{i % 2}", 1), ("h0", "lang0", 1)],
        "h string, lang string, n_copies long",
    )


def _expected_view(upto):
    # h0 re-crawled every batch + fresh h1..h_upto alternating langs
    lang0 = upto + sum(1 for i in range(1, upto + 1) if i % 2 == 0)
    lang1 = sum(1 for i in range(1, upto + 1) if i % 2 == 1)
    exp = {("lang0", lang0)}
    if lang1:
        exp.add(("lang1", lang1))
    return exp


def _view_rows(spark, dest):
    return {
        (r.lang, r.n_copies)
        for r in read_view(spark, dest, _view_merge).collect()
    }


def _ingest(spark, src, i, **kw):
    append_merge_parquet(
        _batch(spark, i), src, _source_merge, batch_id=i, **kw
    )


def test_bootstrap_then_incremental_matches_full(spark, tmp_path):
    src, dest = str(tmp_path / "src"), str(tmp_path / "dest")
    for i in (1, 2):
        _ingest(spark, src, i, compact_every=100)
    r = refresh_incremental(
        spark, src, dest, _view_merge, _source_merge
    )
    assert r["mode"] == "bootstrap" and r["cursor"] == "b2"
    assert _view_rows(spark, dest) == _expected_view(2)
    # two more source batches → strictly incremental consumption
    for i in (3, 4):
        _ingest(spark, src, i, compact_every=100)
    r = refresh_incremental(
        spark, src, dest, _view_merge, _source_merge
    )
    assert r["mode"] == "incremental" and r["consumed"] == ["b3", "b4"]
    assert _view_rows(spark, dest) == _expected_view(4)
    # nothing new → noop, cursor stable
    r = refresh_incremental(
        spark, src, dest, _view_merge, _source_merge
    )
    assert r["mode"] == "noop" and r["cursor"] == "b4"


def test_rerun_is_exactly_once(spark, tmp_path):
    """A retry (crash-and-rerun, double-scheduled job) must not
    double-count: the destination's markers make each source snapshot
    a no-op on re-application."""
    src, dest = str(tmp_path / "src"), str(tmp_path / "dest")
    for i in (1, 2, 3):
        _ingest(spark, src, i, compact_every=100)
    refresh_incremental(spark, src, dest, _view_merge, _source_merge)
    before = _view_rows(spark, dest)
    # simulate the retry at the APPLY level: re-consume b3's window
    # directly — the marker short-circuits it
    from oil_wells_data_wrangling_spark.sources.sinks import read_changes

    batch = _view_merge(read_changes(spark, src, "b2", "b3"))
    append_merge_parquet(
        batch, dest, _view_merge, compact_every=8, batch_id="b3"
    )
    assert _view_rows(spark, dest) == before
    # and a whole-refresh rerun is a noop
    r = refresh_incremental(
        spark, src, dest, _view_merge, _source_merge
    )
    assert r["mode"] == "noop"
    assert _view_rows(spark, dest) == before == _expected_view(3)


def test_lagging_consumer_stays_incremental_under_retention(
    spark, tmp_path
):
    """Source compacts (cadence 4) while the consumer lags 2 batches —
    with min_retained_batches=2 the un-consumed window survives the
    fold and the refresh stays incremental, never full."""
    src, dest = str(tmp_path / "src"), str(tmp_path / "dest")
    for i in (1, 2):
        _ingest(spark, src, i, compact_every=4, min_retained_batches=2)
    refresh_incremental(spark, src, dest, _view_merge, _source_merge)
    assert consumed_cursor(src, dest) == "b2"
    # batches 3 and 4 land; batch 4 triggers compaction which folds
    # b1/b2 but RETAINS b3/b4 — exactly the consumer's pending window
    for i in (3, 4):
        _ingest(spark, src, i, compact_every=4, min_retained_batches=2)
    r = refresh_incremental(
        spark, src, dest, _view_merge, _source_merge
    )
    assert r["mode"] == "incremental" and r["consumed"] == ["b3", "b4"]
    assert _view_rows(spark, dest) == _expected_view(4)


def test_expired_window_falls_back_to_full_refresh(spark, tmp_path):
    """Without retention, a consumer lagging across a compaction loses
    its window — the refresh must say so (mode=full_refresh, never a
    silent wrong merge) and still land on the exact view."""
    src, dest = str(tmp_path / "src"), str(tmp_path / "dest")
    for i in (1, 2):
        _ingest(spark, src, i, compact_every=4)
    refresh_incremental(spark, src, dest, _view_merge, _source_merge)
    for i in (3, 4):  # batch 4 compacts EVERYTHING (no retention)
        _ingest(spark, src, i, compact_every=4)
    r = refresh_incremental(
        spark, src, dest, _view_merge, _source_merge
    )
    assert r["mode"] == "full_refresh" and r["cursor"] == "b4"
    assert _view_rows(spark, dest) == _expected_view(4)
    # and the consumer is re-anchored: next round is incremental again
    _ingest(spark, src, 5, compact_every=100)
    r = refresh_incremental(
        spark, src, dest, _view_merge, _source_merge
    )
    assert r["mode"] == "incremental" and r["consumed"] == ["b5"]
    assert _view_rows(spark, dest) == _expected_view(5)
