"""Physical-plan shape regressions: pin the scale claims the operators
make in their docstrings, so a refactor that silently reintroduces a
scale-killer (text riding a dedup exchange, an unbounded funnel buffer,
a full-sort top-k) fails a test — not a 100 TB run.
"""

from __future__ import annotations

import re

from oil_wells_data_wrangling_spark.plans.registry import REGISTRY, _load_all

_load_all()


def _plan(spark, sf_dir, name: str) -> str:
    df = REGISTRY[name].fn(spark, sf_dir)
    return df._jdf.queryExecution().executedPlan().toString()


def _md5_exchange_children(plan: str) -> list[str]:
    """The direct-child line of every exchange keyed on the md5 hash
    alias (h#N) — that child's bracketed output is what shuffles."""
    lines = plan.splitlines()
    out = []
    for i, line in enumerate(lines):
        if re.search(r"Exchange hashpartitioning\(h#", line):
            if i + 1 < len(lines):
                out.append(lines[i + 1])
    return out


def test_corpus_dedup_exchanges_carry_no_text(spark, sf_dir):
    for name in ("corpus_pipeline", "corpus_pipeline_full"):
        children = _md5_exchange_children(_plan(spark, sf_dir, name))
        assert children, f"{name}: expected an md5-keyed dedup exchange"
        for child in children:
            assert "text#" not in child, (
                f"{name}: document text rides the dedup exchange: {child}"
            )


def test_spatial_bbox_plan_has_zero_exchanges(spark, sf_dir):
    plan = _plan(spark, sf_dir, "spatial_bbox")
    assert "Exchange" not in plan, "bbox query must be a pure scan+filter"


def test_events_funnel_plan_has_no_collect_list(spark, sf_dir):
    plan = _plan(spark, sf_dir, "events_funnel").lower()
    assert "collect_list" not in plan, "funnel state must stay bounded"


def test_rank_limit_pushdown_in_topk_plans(spark, sf_dir):
    # grouped top-k → WindowGroupLimit (partial per-partition top-k);
    # global top-k → TakeOrderedAndProject (distributed partial limit).
    # Either way the full input must NOT funnel through one sorted task.
    plan = _plan(spark, sf_dir, "quality_topk")
    assert "WindowGroupLimit" in plan, "quality_topk: rank<=k not pushed down"
    plan = _plan(spark, sf_dir, "skew_report")
    assert "TakeOrderedAndProject" in plan or "WindowGroupLimit" in plan, (
        "skew_report: global top-10 not a partial limit"
    )


def test_broadcast_not_shuffle_for_dimension_joins(spark, sf_dir):
    # the star-join rollup must broadcast every dimension: no
    # SortMergeJoin against nation/region/customer at any SF
    plan = _plan(spark, sf_dir, "join_region_rollup")
    assert "BroadcastHashJoin" in plan


def test_vocab_topk_global_topk_is_partial_limit(spark, sf_dir):
    # global top-k by count must distribute: TakeOrderedAndProject keeps
    # k rows per partition before the final ordering, never a full sort.
    plan = _plan(spark, sf_dir, "vocab_topk")
    assert "TakeOrderedAndProject" in plan


def test_round5_rank_windows_push_partial_limits(spark, sf_dir):
    # the new grouped rank<=k operators must pre-limit per partition
    # (WindowGroupLimit); the global bigram top-k must use the
    # distributed partial limit.
    for name in ("stratified_sample", "tfidf_topk", "cdc_apply"):
        plan = _plan(spark, sf_dir, name)
        assert "WindowGroupLimit" in plan, f"{name}: rank<=k not pushed down"
    plan = _plan(spark, sf_dir, "ngram_counts")
    assert "TakeOrderedAndProject" in plan or "WindowGroupLimit" in plan


def test_round6_new_operator_plan_shapes(spark, sf_dir):
    # events_topk: the per-window rank<=k must pre-limit per partition
    plan = _plan(spark, sf_dir, "events_topk")
    assert "WindowGroupLimit" in plan, "events_topk: rank<=k not pushed down"
    # rarity_score / mix_balance: tiny aggregates broadcast back onto
    # the token/document stream — never a shuffled join — and the row
    # path stays JVM-side
    for name in ("rarity_score", "mix_balance"):
        plan = _plan(spark, sf_dir, name)
        assert "BroadcastHashJoin" in plan, f"{name}: stats join not broadcast"
        assert "SortMergeJoin" not in plan, f"{name}: shuffled join"
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # scd2_apply: one user-keyed window, no joins at all
    plan = _plan(spark, sf_dir, "scd2_apply")
    assert "Join" not in plan, "scd2_apply grew a join"
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_bm25_topk_rank_limit_and_broadcast(spark, sf_dir):
    # round-6 BM25: global top-k must be a partial rank limit, the df
    # table and corpus scalars broadcast, and no python eval anywhere.
    plan = _plan(spark, sf_dir, "bm25_topk")
    assert "TakeOrderedAndProject" in plan or "WindowGroupLimit" in plan, (
        "bm25_topk: rank<=k not pushed down"
    )
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def _iter_jvm_nodes(node):
    stack = [node]
    while stack:
        n = stack.pop()
        yield n
        cs = n.children()
        for i in range(cs.size()):
            stack.append(cs.apply(i))


def test_no_unbounded_single_partition_window_in_any_query(spark, sf_dir):
    """Sweep EVERY registered query: a Window with an empty partition
    spec moves the whole input through one task — the classic 100 TB
    choke. It is tolerated only when the physical plan proves the
    window's input is already bounded to ~k rows (rank-limit pushdown:
    WindowGroupLimit, or LimitPushDownThroughWindow's
    TakeOrderedAndProject)."""
    offenders = []
    for name, q in REGISTRY.items():
        df = q.fn(spark, sf_dir)
        qe = df._jdf.queryExecution()
        unpartitioned = any(
            n.getClass().getSimpleName() == "Window" and n.partitionSpec().isEmpty()
            for n in _iter_jvm_nodes(qe.optimizedPlan())
        )
        if not unpartitioned:
            continue
        phys = qe.executedPlan().toString()
        if "WindowGroupLimit" not in phys and "TakeOrderedAndProject" not in phys:
            offenders.append(name)
    assert not offenders, f"unbounded single-partition windows in: {offenders}"


def test_disjunctive_filters_are_derived_and_pushed(spark, sf_dir):
    # Q19 shape: no single branch predicate is one-sided, but Catalyst's
    # constraint propagation must still derive per-side filters and push
    # them into the scans, so the join sees pre-filtered inputs.
    plan = _plan(spark, sf_dir, "disjunctive_filter_revenue")
    assert "PushedFilters: [" in plan
    # the part scan must carry a derived brand IN-list (or Or of brands)
    assert re.search(r"PushedFilters: \[[^\]]*p_brand", plan), (
        "derived part-side predicate not pushed into the part scan"
    )
    assert re.search(r"PushedFilters: \[[^\]]*l_quantity", plan), (
        "derived lineitem-side predicate not pushed into the lineitem scan"
    )


def test_vocab_coverage_vocab_is_broadcast(spark, sf_dir):
    # the k-row vocabulary must broadcast onto the token stream; a
    # shuffle join here would re-exchange the whole token table.
    plan = _plan(spark, sf_dir, "vocab_coverage")
    assert "BroadcastHashJoin" in plan, "vocab join must broadcast"


def test_incremental_rollup_merge_has_no_rescan_join(spark, sf_dir):
    # merge = union of partials + re-aggregation; a join (or more than
    # the three aggregation exchanges) would mean history re-scans.
    plan = _plan(spark, sf_dir, "incremental_rollup")
    assert "Join" not in plan, "partial merge must be union+agg, not a join"


def test_model_score_is_map_only(spark, sf_dir):
    """The inference scaffold must stay embarrassingly parallel: no
    Exchange anywhere (partitioning inherited from the scan) and the
    model running as an Arrow MapInPandas node, with the three int64
    features projected BEFORE the Python exchange so text bytes never
    cross into Python."""
    from oil_wells_data_wrangling_spark.operators.inference import model_score

    plan = (
        model_score(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan
    assert "MapInPandas" in plan
    assert "text" not in _python_input_columns(plan)


def _python_input_columns(plan: str) -> str:
    # the MapInPandas node line lists its child output columns
    for line in plan.splitlines():
        if "MapInPandas" in line:
            return line
    return ""


def test_tpch_fact_scans_broadcast_prune_before_shuffle(spark, sf_dir):
    """The late-r7 TPC-H shapes claim 'dim broadcast prunes lineitem
    BEFORE its shuffle' in their docstrings — pin it: in each plan, the
    lineitem scan's consuming join must be a BroadcastHashJoin sitting
    DEEPER than every lineitem-side Exchange (fact rows meet the
    filtered dimension while still on their input partitions; only the
    pruned/aggregated stream ever shuffles)."""
    for name in (
        "min_cost_supplier",
        "important_parts",
        "excess_inventory_suppliers",
    ):
        lines = _plan(spark, sf_dir, name).splitlines()
        scan_idx = [
            i for i, ln in enumerate(lines)
            if "FileScan parquet" in ln and "lineitem.parquet" in ln
        ]
        assert scan_idx, f"{name}: no lineitem scan in plan"
        scan = scan_idx[0]
        bhj_above = [
            i for i, ln in enumerate(lines[:scan]) if "BroadcastHashJoin" in ln
        ]
        ex_above = [
            i for i, ln in enumerate(lines[:scan])
            if "Exchange hashpartitioning" in ln
        ]
        assert bhj_above, f"{name}: lineitem not consumed by a broadcast join"
        assert ex_above, f"{name}: expected an aggregation shuffle above"
        assert max(bhj_above) > max(ex_above), (
            f"{name}: lineitem shuffles before the dim broadcast prunes it"
        )


def test_robots_filter_frontier_never_shuffles_at_url_grain(spark, sf_dir):
    """robots_filter's docstring claims the frontier is flagged
    map-side with only the host rollup exchanging: the plan must hold
    one broadcast join (the rules), no sort-merge join, and at most
    the rollup's partial+final exchange pair."""
    plan = _plan(spark, sf_dir, "robots_filter")
    assert plan.count("BroadcastHashJoin") == 1
    assert "SortMergeJoin" not in plan
    assert plan.count("Exchange") <= 2


def test_ivf_pq_search_joins_all_broadcast(spark, sf_dir):
    """ivf_pq_search's candidate join sides (128-row qcell, 32-row
    distance table) are fixed-size by construction — every join must
    broadcast; a sort-merge join would mean the corpus-sized index is
    being co-shuffled against a constant."""
    plan = _plan(spark, sf_dir, "ivf_pq_search")
    assert "SortMergeJoin" not in plan
    assert plan.count("BroadcastHashJoin") >= 2


def test_late_round8_operator_plan_shapes(spark, sf_dir):
    # chunk_dedup_rewrite: the keeper agg must stay HashAggregate — the
    # min(struct) form regressed to SortAggregate (two full sorts of
    # the segment table, measured 14.6x on the 10x->100x step)
    plan = _plan(spark, sf_dir, "chunk_dedup_rewrite")
    assert "SortAggregate" not in plan, (
        "chunk_dedup_rewrite: keeper must hash-aggregate"
    )
    # ...and the doc-keyed join exchanges must carry raw text, never
    # pre-split word arrays (fat serialized rows through the shuffle)
    for m in re.finditer(
        r"Exchange hashpartitioning\(doc_id#\d+L.*\n(.*)", plan
    ):
        assert "split(" not in m.group(1), (
            "chunk_dedup_rewrite: word arrays riding the doc exchange"
        )
    # ...and the segment-hash exchange carries no text column
    for child in _md5_exchange_children(plan):
        assert "seg_text" not in child and "text#" not in child, (
            "chunk_dedup_rewrite: segment text riding the hash exchange"
        )

    # events_cms_topk: the probe side joins the 4096-row cell table by
    # broadcast, and the exact top-k pushes a partial limit
    plan = _plan(spark, sf_dir, "events_cms_topk")
    assert "BroadcastHashJoin" in plan, "cms: cell probe must broadcast"
    assert "WindowGroupLimit" in plan or "TakeOrderedAndProject" in plan, (
        "cms: exact top-k not pushed down"
    )

    # bpe_pair_counts: global top-k over the pair domain is a partial
    # limit, not a full sort of the pair table
    plan = _plan(spark, sf_dir, "bpe_pair_counts")
    assert "WindowGroupLimit" in plan or "TakeOrderedAndProject" in plan, (
        "bpe: rank<=k not pushed down"
    )

    # eval_leakage_report: the h-keyed contamination join must never be
    # FORCED to broadcast (the scale contract is that the planner stays
    # free — at sf0.001 AQE correctly broadcasts the tiny eval side; at
    # production stats it exceeds the threshold and goes sort-merge).
    # Pin: the only broadcast HINTS in the analyzed plan are the
    # injection scaffold's one-row count and snippet frames.
    df = REGISTRY["eval_leakage_report"].fn(spark, sf_dir)
    analyzed = df._jdf.queryExecution().analyzed().toString()
    hints = re.findall(
        r"ResolvedHint[^\n]*\n((?:.|\n){0,400}?)(?=ResolvedHint|\Z)", analyzed
    )
    for body in hints:
        assert "snippet" in body or "count(1)" in body, (
            "eval_leakage_report: a shingle side carries a broadcast hint"
        )

    # anchor_text_stats / mm_audio_neardup: no text/payload bytes on
    # any exchange (tag pairs and band scalars only)
    plan = _plan(spark, sf_dir, "anchor_text_stats")
    for m in re.finditer(r"Exchange hashpartitioning[^\n]*\n(.*)", plan):
        assert "html#" not in m.group(1), (
            "anchor_text_stats: page html riding an exchange"
        )
    plan = _plan(spark, sf_dir, "mm_audio_neardup")
    for m in re.finditer(r"Exchange hashpartitioning[^\n]*\n(.*)", plan):
        assert "payload#" not in m.group(1), (
            "mm_audio_neardup: payload bytes riding an exchange"
        )


def test_sketch_family_partial_aggregation(spark, sf_dir):
    """The row-shaped sketches' scale contract is map-side collapse:
    partial + final HashAggregate around ONE exchange, so the shuffle
    carries the fixed-size summary, never event volume."""
    for name in ("hll_register_sketch", "log_histogram_sketch"):
        plan = _plan(spark, sf_dir, name)
        assert plan.count("Exchange") == 1, f"{name}: expected one exchange"
        assert plan.count("HashAggregate") >= 2, (
            f"{name}: partial aggregation missing"
        )
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_bpe_tokenize_apply_is_map_only(spark, sf_dir):
    """Learned-merge application must stay in the scan: after training
    (driver-collected merges), the corpus-side plan is a single
    projection — no exchange, no Python."""
    plan = _plan(spark, sf_dir, "bpe_tokenize")
    assert "Exchange" not in plan, "bpe_tokenize apply must not shuffle"
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_hll_sketch_aggregates_stay_buffer_shaped(spark, sf_dir):
    """r15: approx_count_distinct(x, 0.01) planned one Long attribute
    per HLL register word (3,278 aggregate attributes for two
    sketches — megabyte plans, codegen past the 64KB limit, 90s at
    sf0.1). Pin the Datasketches form: the distinct-estimate queries
    must plan NO legacy HLL++ aggregate and keep their plan strings
    sane."""
    for name in ("approx_distinct", "events_distinct_windowed"):
        plan = _plan(spark, sf_dir, name)
        assert "approx_count_distinct" not in plan, (
            f"{name}: legacy HLL++ aggregate is back"
        )
        assert "hll_sketch_agg" in plan, f"{name}: sketch aggregate missing"
        assert len(plan) < 200_000, (
            f"{name}: plan string blew up ({len(plan)} chars) — "
            "register-word attributes have probably returned"
        )


def test_fuzzy_match_best_pick_is_partial_aggregation(spark, sf_dir):
    """r15: the blocked-pair best match must stay a min(struct(...))
    aggregation with a map-side partial (the window form shuffled
    every scored pair to sort it), and the pair stage's reduce
    partition count must be the pinned core-count repartition, not an
    AQE byte-coalesced handful of tasks."""
    plan = _plan(spark, sf_dir, "fuzzy_match_names")
    assert "Window" not in plan, "fuzzy_match_names: rank window is back"
    assert "partial_min" in plan, "map-side partial min missing"
    assert re.search(r"Exchange hashpartitioning\(blk#\d+L?, \d+\), REPARTITION", plan), (
        "pair-stage parallelism pin (user repartition on blk) missing"
    )
