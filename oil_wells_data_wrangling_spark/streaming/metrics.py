"""Streaming state-store observability.

Stateful streaming operators (stream-stream joins, windowed aggs,
applyInPandasWithState) live or die at 100 TB by their STATE SIZE —
an unbounded join buffer is the failure mode that takes a week to
surface. This module turns Spark's per-microbatch progress events
into a compact audit: per-batch state rows, memory, evictions, and
watermark-dropped input — the numbers an on-call dashboard alerts on,
and the numbers our tests assert to PROVE the watermarks actually
bound join state (docstring claims are not evidence; eviction
counters are).
"""

from __future__ import annotations

from typing import Any

from pyspark.sql.streaming import StreamingQuery


def progress_state_metrics(query: StreamingQuery) -> list[dict[str, Any]]:
    """One row per (micro-batch, stateful operator) from the query's
    retained progress history: batch id, operator name, state rows,
    rows updated/removed this batch, state memory, and the batch's
    input-rows-dropped-by-watermark count (carried on the batch, same
    value repeated per operator)."""
    out: list[dict[str, Any]] = []
    for p in query.recentProgress:
        if p is None:
            continue
        dropped = 0
        for op in p.get("stateOperators", []):
            dropped = max(
                dropped, int(op.get("numRowsDroppedByWatermark", 0))
            )
        for op in p.get("stateOperators", []):
            out.append(
                {
                    "batch_id": int(p["batchId"]),
                    "operator": op.get("operatorName", "unknown"),
                    "state_rows": int(op.get("numRowsTotal", 0)),
                    "rows_updated": int(op.get("numRowsUpdated", 0)),
                    "rows_removed": int(op.get("numRowsRemoved", 0)),
                    "state_bytes": int(op.get("memoryUsedBytes", 0)),
                    "input_dropped_by_watermark": dropped,
                }
            )
    return out


def assert_state_bounded(
    metrics: list[dict[str, Any]], max_rows: int
) -> None:
    """Raise if any batch's state-row count exceeds ``max_rows`` — the
    test-side guard that a watermark/timeout configuration actually
    bounds an operator's store."""
    worst = max((m["state_rows"] for m in metrics), default=0)
    if worst > max_rows:
        offender = max(metrics, key=lambda m: m["state_rows"])
        raise AssertionError(
            f"state store exceeded bound: {offender} > {max_rows} rows"
        )
