"""Incremental materialized-view maintenance over the MOR changelog —
the CONSUMER the snapshot/changelog faces exist for.

``append_merge_parquet`` (sources/sinks.py) gives a state table an
Iceberg-shaped reader surface: snapshots, time travel, and
``read_changes`` — the incremental scan. This module closes the loop
with ``refresh_incremental``: a downstream rollup that consumes ONLY
the source deltas committed since it last ran, folds them into its own
merge-on-read state, and survives every failure mode the store can
throw at it:

- **Exactly-once without a cursor file.** Each source snapshot is
  consumed as its own batch with ``batch_id = <source snapshot id>``
  into the destination's ``append_merge_parquet`` store, so the
  destination's OWN commit markers are the consumption record — the
  cursor is *derived* (max consumed id in source commit order), never
  separately persisted, and can therefore never disagree with what was
  actually applied. A crash between apply and any bookkeeping is
  impossible by construction; re-running just no-ops the marker.
- **Lag tolerance.** A source written with ``min_retained_batches >=``
  the consumer's worst-case lag keeps every un-consumed delta readable
  (the r15 retention guard); the refresh stays incremental across
  source compactions.
- **Loud expiry, automatic recovery.** If the un-consumed window was
  compacted away (``SnapshotExpiredError``), the refresh falls back to
  a FULL rebuild from ``read_merged`` — cost ∝ source state, the same
  fallback Iceberg incremental consumers document — and re-anchors the
  cursor at the source's latest snapshot.

Scale shape: the incremental path reads only the consumed deltas
(cost ∝ new data, never the source store), applies the same
partial-agg plans as any MOR read, and appends O(batch) to the
destination. Correctness contract, same as ``read_changes``: the
changelog rows are the source's per-batch PARTIAL rollups, so
``view_merge`` must be associative over them (sums/counts/min/max
rollups — anything that absorbs partials). One subtlety, caught by
measurement (r15): any view GROUPING column must be stable per source
key — a pure function of the key, or an attribute constant across
deliveries of that key. Grouping by a batch-local attribute (e.g. a
``min(lang)`` the source collapses per key ACROSS batches) attributes
each delivery to its batch's value while a from-state rebuild
attributes all of the key's history to the final collapsed value —
the two grains legitimately disagree, so the bootstrap/full-refresh
path (from state) and the incremental path (from deliveries) would
drift. Additive measures (counts, sums) keyed by stable columns are
always safe.

Reference parity: the reference recomputes its well_info join from
scratch on every load (pdf_to_db.py:202-244 re-upserts the full
frame); this is the load that stays O(new wells) at 100 TB.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from oil_wells_data_wrangling_spark.sources.sinks import (
    SnapshotExpiredError,
    _snapshot_order,
    append_merge_parquet,
    read_changes,
    read_merged,
)


def consumed_cursor(source_path: str, dest_path: str) -> str | None:
    """The destination's consumption cursor, DERIVED from its own
    commit markers: the latest source snapshot id (in SOURCE commit
    order) that the destination has applied. None = never consumed.

    Because ``refresh_incremental`` applies each source snapshot under
    ``batch_id = <source snapshot id>``, the destination's
    ``_applied`` markers are the exactly-once consumption log — there
    is no separate cursor file to drift from reality."""
    src_order = [name for name, _ in _snapshot_order(source_path)]
    dest_applied = {name for name, _ in _snapshot_order(dest_path)}
    cursor = None
    for name in src_order:  # oldest → newest; keep the last consumed
        # the destination applies source snapshot <name> under
        # batch_id=<name>, which append_merge_parquet records as
        # marker "b<name>" — e.g. source "b3" → dest marker "bb3"
        if f"b{name}" in dest_applied:
            cursor = name
    return cursor


def refresh_incremental(
    spark: SparkSession,
    source_path: str,
    dest_path: str,
    view_merge: Callable[[DataFrame], DataFrame],
    source_merge: Callable[[DataFrame], DataFrame],
    compact_every: int | None = 8,
) -> dict:
    """Bring the materialized rollup at ``dest_path`` up to date with
    the ``append_merge_parquet`` store at ``source_path``, reading as
    little as possible. Returns ``{"mode", "consumed", "cursor"}``.

    ``view_merge`` is the rollup's own associative merge (applied to
    changelog rows on the incremental path and used as the
    destination store's reader/compaction merge). ``source_merge`` is
    the SOURCE store's merge, needed only by the full-refresh fallback
    to reconstruct exact source state before re-deriving the view.

    Modes: ``noop`` (nothing new), ``incremental`` (consumed the new
    snapshots one batch each, exactly-once), ``bootstrap`` (first run:
    full source state as the opening batch, anchored at the source's
    latest snapshot id), ``full_refresh`` (window expired under a
    lagging consumer — rebuild from current state and re-anchor; loud
    in the return value, never silent)."""
    src_order = [name for name, _ in _snapshot_order(source_path)]
    if not src_order:
        return {"mode": "noop", "consumed": [], "cursor": None}
    cursor = consumed_cursor(source_path, dest_path)
    latest = src_order[-1]
    if cursor == latest:
        return {"mode": "noop", "consumed": [], "cursor": cursor}

    def _apply(batch: DataFrame, batch_id: str) -> None:
        append_merge_parquet(
            batch,
            dest_path,
            view_merge,
            compact_every=compact_every,
            batch_id=batch_id,
        )

    if cursor is None:
        # first run: current source state, one opening batch anchored
        # at the latest snapshot — subsequent runs consume after it
        _apply(
            view_merge(read_merged(spark, source_path, source_merge)),
            latest,
        )
        return {"mode": "bootstrap", "consumed": [latest], "cursor": latest}

    pending = src_order[src_order.index(cursor) + 1 :]
    try:
        for name in pending:
            # one batch per source snapshot, batch_id = snapshot id:
            # a re-run (or a crash-and-retry) re-reads the same window
            # and the destination marker makes re-application a no-op
            _apply(
                view_merge(
                    read_changes(spark, source_path, cursor, name)
                ),
                name,
            )
            cursor = name
        return {"mode": "incremental", "consumed": pending, "cursor": cursor}
    except SnapshotExpiredError:
        # the un-consumed window was compacted away (consumer lagged
        # past the source's retention) — rebuild from current source
        # state into a FRESH destination store (the old view rows
        # would double-count if the rebuild merged into them),
        # re-anchored at the latest snapshot
        import shutil

        shutil.rmtree(dest_path, ignore_errors=True)
        _apply(
            view_merge(read_merged(spark, source_path, source_merge)),
            latest,
        )
        return {
            "mode": "full_refresh",
            "consumed": [latest],
            "cursor": latest,
        }


def read_view(
    spark: SparkSession,
    dest_path: str,
    view_merge: Callable[[DataFrame], DataFrame],
) -> DataFrame:
    """Current contents of the materialized rollup — a plain
    ``read_merged`` with the view's merge; named for symmetry."""
    return read_merged(spark, dest_path, view_merge)
