"""Query registry — the single source of truth for the engine's surface.

Every operator from SURVEY.md §2 registers here as a named query:
a callable ``(spark, sf_dir) -> DataFrame`` plus (when SQL-expressible)
an equivalent ANSI-SQL oracle string that DuckDB can execute on the same
parquet tables. ``__spark_entry__.py`` re-exports this registry for the
driver's correctness gate.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class Query:
    name: str
    fn: QueryFn
    oracle: str | None = None
    headline: bool = False  # included in bench.py's headline set


REGISTRY: dict[str, Query] = {}


def register(
    name: str, oracle: str | None = None, headline: bool = False
) -> Callable[[QueryFn], QueryFn]:
    """Decorator: register ``fn`` as query ``name`` with optional oracle."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = Query(name=name, fn=fn, oracle=oracle, headline=headline)
        return fn

    return deco


def _load_all() -> None:
    """Import every operator module so registrations run."""
    import oil_wells_data_wrangling_spark.operators.eventops  # noqa: F401
    import oil_wells_data_wrangling_spark.operators.corpus  # noqa: F401
    import oil_wells_data_wrangling_spark.operators.multimodal  # noqa: F401
    import oil_wells_data_wrangling_spark.operators.textstats  # noqa: F401
    import oil_wells_data_wrangling_spark.operators.webtable  # noqa: F401
    import oil_wells_data_wrangling_spark.operators.analytics  # noqa: F401
    import oil_wells_data_wrangling_spark.operators.privacy  # noqa: F401
    import oil_wells_data_wrangling_spark.operators.wrangle  # noqa: F401
    import oil_wells_data_wrangling_spark.operators.dedup  # noqa: F401
    import oil_wells_data_wrangling_spark.operators.similarity  # noqa: F401
    import oil_wells_data_wrangling_spark.operators.spatial  # noqa: F401
    import oil_wells_data_wrangling_spark.operators.graph  # noqa: F401
    import oil_wells_data_wrangling_spark.operators.inference  # noqa: F401
    import oil_wells_data_wrangling_spark.streaming.neardup  # noqa: F401


# The driver's CORRECTNESS gate checks the FIRST 50 queries in the
# order ``queries()`` yields them, so this list — not module import
# order — decides who gets a fresh driver-verified row this round.
# Round-12 window: (1) the three operators pre-staged in r11
# (never driver-checked names MUST be in-window the round they
# register); (2) the FORTY-SEVEN operators whose newest driver row is
# round 7 — the full r7 cohort, which goes stale the moment
# CORRECTNESS_r12.json is committed (upcoming R = 13, bound R-5).
# 3 new + 47 stale fills all 50 slots; there is NO free slot for
# additional new registrations this round — r13 drains the 45-name
# r8 cohort and has ≤5 free slots. Everything past 50 keeps its old
# green row and stays covered by the identical local comparison in
# tests/test_oracle_parity.py. A name listed here but not registered
# fails loudly (KeyError) rather than silently shrinking the window;
# tests/test_plans.py asserts the rotation INVARIANTS (never-checked
# names in-window, no registrant's latest green row older than R-5)
# from the committed CORRECTNESS_r*.json history. The bound is R-5,
# not R-4, so that committing round N's own CORRECTNESS file (which
# bumps R before the N+1 rotation lands) cannot red the suite — the
# r10 round ended with exactly that one red, by design but noisily.
_WINDOW_PRIORITY = [
    # -- new in round 12 (never driver-checked; pre-staged in r11)
    "quality_ensemble",
    "elo_ratings",
    "cdx_domain_captures",
    # -- last driver row is round 7 (the full cohort, alphabetical)
    "ann_pq", "api_canonical", "bad_rows", "basket_lift",
    "corpus_pipeline", "corpus_pipeline_full", "csv_repair",
    "dp_histogram", "dsir_weights", "embed_neardup", "enrich_join",
    "events_ab_lift", "events_burst", "excess_inventory_suppliers",
    "extract_fields", "extract_repeated", "extract_stim",
    "forecast_revenue", "fuzzy_match_names", "important_parts",
    "late_arrival_audit", "local_supplier_volume", "market_share",
    "minhash_containment", "mix_temperature", "mm_scene_cut",
    "model_score", "nation_volume_shipping", "normalize_keys",
    "numeric_sanitize", "pack_sequences_grouped", "parse_coordinates",
    "product_type_profit", "quality_threshold_sweep", "quality_topk",
    "returned_item_report", "rfm_segments", "sentinel_to_null",
    "serve_wells", "serve_wells_full", "snapshot_diff",
    "text_normalize", "triangle_count", "upsert_latest", "url_dedup",
    "validate_report", "well_pipeline",
]


def _ordered() -> dict[str, Query]:
    _load_all()
    out = {name: REGISTRY[name] for name in _WINDOW_PRIORITY}
    for name, q in REGISTRY.items():
        if name not in out:
            out[name] = q
    return out


def all_queries() -> dict[str, QueryFn]:
    return {name: q.fn for name, q in _ordered().items()}


def all_oracle_sql() -> dict[str, str]:
    return {
        name: q.oracle for name, q in _ordered().items() if q.oracle is not None
    }


def headline_queries() -> dict[str, QueryFn]:
    return {name: q.fn for name, q in _ordered().items() if q.headline}


# ---------------------------------------------------------------------------
# ROUND-13 ROTATION, PREPARED (r12). The r8 cohort is 45 names, so
# r13 has ≤5 free slots; ALL FIVE are pre-staged at the full bar
# (implementation + DuckDB-parity tests in tests/test_prestaged_r13.py
# + BASELINE scale rows, all landed in r12):
#   - compact_table       (operators/spatial.py — small-file compaction
#                          with file-count + key-bbox evidence)
#   - trace_tool_calls    (operators/inference.py — agentic tool-call
#                          trace validation/stats, from_json corrupt-
#                          record parity)
#   - stream_asof_join    (operators/eventops.py — asof_join's custom-
#                          stateful streaming twin; dual TWS/legacy
#                          impls in streaming/events.py:stream_asof)
#   - chat_turns_audit    (operators/corpus.py — multi-turn SFT
#                          transcript hygiene: role alternation +
#                          opening-turn violations per source)
#   - specdecode_accept   (operators/inference.py — speculative-
#                          decoding acceptance analytics over logged
#                          draft/target streams: per-block prefix
#                          acceptance, per-source permille)
# (An earlier fifth candidate, a per-source exact-k hash-rank
# sampler, was built and DROPPED in-round: `stratified_sample`
# already exists in the registry with the same semantics per lang —
# near-duplicate, not worth a window slot. specdecode_accept was
# checked against the registry for novelty before building.)
# The r13 builder's first commit: @register the five (oracles are
# COMPACT_TABLE_ORACLE / TRACE_TOOL_CALLS_ORACLE / STREAM_ASOF_ORACLE
# / CHAT_TURNS_ORACLE / SPECDECODE_ORACLE next to each
# implementation), add their SURVEY §2 rows (243 → 248), and lead
# _WINDOW_PRIORITY with them + the 45-name r8 cohort (5 + 45 = all
# 50 slots — the window is exactly full, NO other new registration
# fits r13). Steady-state capacity is 50×5 = 250 registered
# operators — grow §2.E (connectors/serving, unit-tested rather than
# oracle-checked) past that, not §2.
