"""Plan-shape assertions (SURVEY.md §5): the optimizations the engine
promises must actually appear in the physical plans."""

from __future__ import annotations

from oil_wells_data_wrangling_spark.plans.registry import REGISTRY, _load_all

_load_all()


def _plan(spark, sf_dir, name: str) -> str:
    return REGISTRY[name].fn(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()


def test_pricing_summary_pushdown(spark, sf_dir):
    plan = _plan(spark, sf_dir, "agg_pricing_summary")
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan
    # column pruning: the scan must not read l_orderkey/l_partkey etc.
    scan = plan[plan.index("ReadSchema") :].splitlines()[0]
    assert "l_orderkey" not in scan and "l_comment" not in scan


def test_dimension_joins_broadcast(spark, sf_dir):
    for name in ("join_region_rollup", "events_enrich", "well_pipeline"):
        plan = _plan(spark, sf_dir, name)
        assert "BroadcastHashJoin" in plan, name


def test_topn_uses_take_ordered(spark, sf_dir):
    assert "TakeOrderedAndProject" in _plan(spark, sf_dir, "join_revenue_topn")


def test_pricing_partial_aggregation(spark, sf_dir):
    plan = _plan(spark, sf_dir, "agg_pricing_summary")
    assert plan.count("HashAggregate") >= 2  # partial + final around one shuffle
    assert plan.count("Exchange") == 1


def test_minhash_no_python_udf(spark, sf_dir):
    plan = _plan(spark, sf_dir, "dedup_minhash")
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_decontaminate_broadcasts_eval_side(spark, sf_dir):
    """The eval-shingle set and the scalar count must broadcast; the
    training side must never be the build side of a broadcast."""
    plan = _plan(spark, sf_dir, "decontaminate")
    assert "BroadcastHashJoin" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_shard_stats_single_shuffle(spark, sf_dir):
    plan = _plan(spark, sf_dir, "shard_stats")
    assert plan.count("HashAggregate") >= 2  # map-side partials
    assert plan.count("Exchange") == 1


def test_bucket_quantiles_partial_agg(spark, sf_dir):
    """The histogram build must combine map-side: partial + final
    HashAggregate around the one shuffle feeding the window."""
    plan = _plan(spark, sf_dir, "bucket_quantiles")
    assert plan.count("HashAggregate") >= 2


def test_range_join_is_hash_not_nested_loop(spark, sf_dir):
    """Bucketization must turn the interval join into a hash join; a
    BroadcastNestedLoopJoin would scan every interval per row."""
    plan = _plan(spark, sf_dir, "range_join")
    assert "BroadcastHashJoin" in plan
    assert "NestedLoop" not in plan


def test_pii_redact_single_scan_no_shuffle(spark, sf_dir):
    plan = _plan(spark, sf_dir, "pii_redact")
    assert "Exchange" not in plan  # pure per-row projection
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def _driver_row_history() -> tuple[int, dict[str, int]]:
    """(latest committed round R, latest GREEN driver row per operator),
    computed from the committed CORRECTNESS_r*.json files — the same
    evidence the judge reads, so these invariants survive rotation."""
    import glob
    import json
    import re

    latest: dict[str, int] = {}
    max_round = 0
    for path in sorted(glob.glob("CORRECTNESS_r*.json")):
        rnd = int(re.search(r"r(\d+)", path).group(1))
        max_round = max(max_round, rnd)
        for name, row in json.load(open(path)).items():
            if (
                row.get("rows_match")
                and row.get("schema_match")
                and row.get("err") is None
            ):
                latest[name] = max(latest.get(name, 0), rnd)
    return max_round, latest


def test_driver_window_covers_required_queries():
    """The driver's CORRECTNESS gate reads the first 50 queries()
    yield. Rotation-proof invariants (the r9 verdict's top item —
    the hand-pinned name set stranded twice):

    1. the window IS the priority list — no silent reorder;
    2. every registered operator with NO green driver row in any
       committed CORRECTNESS file must be in-window (new operators
       get their first row the round they land);
    3. no operator's latest green row may age past R-5 without being
       in-window (R = the upcoming round). The bound was R-4 through
       r10; it is R-5 now (the r10 advice item) so that committing
       round N's own CORRECTNESS file — which bumps R before the N+1
       rotation exists — cannot red the suite. With 218 operators and
       a 50-name window, a full rotation takes ~4.4 rounds, so R-5 is
       the tightest bound a round-robin rotation can always satisfy.
    """
    from oil_wells_data_wrangling_spark.plans.registry import (
        _WINDOW_PRIORITY,
        all_queries,
    )

    qs = all_queries()
    window = list(qs)[:50]
    assert window == _WINDOW_PRIORITY, "window must be the priority list"

    max_round, latest = _driver_row_history()
    upcoming = max_round + 1
    never_checked = [n for n in qs if n not in latest]
    stranded_new = sorted(set(never_checked) - set(window))
    assert not stranded_new, (
        f"operators with no driver row ever must be in-window: {stranded_new}"
    )
    stale = sorted(
        n
        for n in qs
        if n not in window and latest.get(n, 0) < upcoming - 5
    )
    assert not stale, (
        f"operators whose latest green row predates r{upcoming - 5} "
        f"must rotate in-window: {stale}"
    )


def test_window_priority_names_all_registered():
    from oil_wells_data_wrangling_spark.plans.registry import (
        _WINDOW_PRIORITY,
        all_queries,
    )

    qs = all_queries()
    assert len(_WINDOW_PRIORITY) == 50
    assert len(set(_WINDOW_PRIORITY)) == 50
    unknown = [n for n in _WINDOW_PRIORITY if n not in qs]
    assert not unknown, f"priority list names unregistered queries: {unknown}"


def test_headline_set_is_pinned():
    """bench.py times exactly the headline-flagged queries; BASELINE.md
    carries a standing row for each. Losing a flag would silently drop
    a query from the regression fence — pin the set."""
    from oil_wells_data_wrangling_spark.plans.registry import (
        REGISTRY,
        _load_all,
    )

    _load_all()
    headliners = {n for n, q in REGISTRY.items() if q.headline}
    assert headliners == {
        "events_window_agg", "dedup_minhash", "corpus_pipeline_full",
        "corpus_pipeline", "agg_pricing_summary", "join_revenue_topn",
        "join_region_rollup", "well_pipeline", "ann_topk", "decontaminate",
        "semdedup_pipeline", "domain_pagerank", "crawl_to_corpus",
        "rrf_fusion",
    }
    # every headliner must also carry an exact oracle
    assert all(REGISTRY[n].oracle for n in headliners)
