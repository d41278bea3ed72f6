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
# Round-7 window, per the r6 verdict's top item: (1) the 6 late-r6
# operators that have NEVER had a driver row (snapshot_diff,
# quality_threshold_sweep, mix_temperature, model_score,
# dp_histogram, late_arrival_audit) lead, (2) queries new or changed
# in round 7, (3) the 48 operators whose newest driver row is
# round 4 — wrangle family and corpus/similarity headliners first
# because their r4 rows predate two rounds of shared-helper churn.
# The r4-stale names that do not fit in this window
# (events_anomaly, events_funnel, bucket_quantiles,
# length_histogram, domain_cap — plus integrity_report, geo_bucket,
# spatial_bbox, skew_report, salted_agg_join, range_join,
# agg_pricing_summary, pivot_status, rollup_cube, grouping_sets,
# window_lag_delta, semi_anti_join, winsorize, displaced
# when the late-r7 operators took never-checked priority) rotate
# into the r8 window, led by the late-r7 TPC-H-style ops that
# did not fit (supplier_part_scope, large_volume_customers,
# waiting_supplier_report, min_cost_supplier), so the
# oldest driver row is ≤ r5 by end of r8, exactly the verdict's
# done-criterion. Everything past 50
# keeps its old green row and stays covered by the identical local
# comparison in tests/test_oracle_parity.py. A name listed here but
# not registered fails loudly (KeyError) rather than silently
# shrinking the window.
_WINDOW_PRIORITY = [
    # -- never driver-checked (landed after the r6 window was fixed)
    "snapshot_diff",
    "quality_threshold_sweep",
    "mix_temperature",
    "model_score",
    "dp_histogram",
    "late_arrival_audit",
    # -- new in round 7 (never driver-checked; must get first rows)
    "semdedup_pipeline",
    "basket_lift",
    "events_burst",
    "url_dedup",
    "rfm_segments",
    "events_ab_lift",
    "mm_scene_cut",
    # -- last driver row is round 4: reference wrangle family
    "api_canonical",
    "extract_fields",
    "extract_repeated",
    "extract_stim",
    "parse_coordinates",
    "normalize_keys",
    "numeric_sanitize",
    "text_normalize",
    "csv_repair",
    "bad_rows",
    "validate_report",
    "upsert_latest",
    "fuzzy_match_names",
    "enrich_join",
    "sentinel_to_null",
    "serve_wells",
    "serve_wells_full",
    "well_pipeline",
    # -- last driver row is round 4: corpus / similarity headliners
    "corpus_pipeline",
    "corpus_pipeline_full",
    "pack_sequences_grouped",
    "quality_topk",
    "embed_neardup",
    "minhash_containment",
    "ann_pq",
    # -- new in late round 7 (TPC-H-style coverage completion; never
    # driver-checked, so they take the slots the r4-stale analytics
    # names held — those rotate into r8 alongside the three late-r7
    # ops that did not fit: supplier_part_scope,
    # large_volume_customers, waiting_supplier_report)
    "local_supplier_volume",
    "forecast_revenue",
    "nation_volume_shipping",
    "market_share",
    "product_type_profit",
    "returned_item_report",
    "important_parts",
    # -- new in the second half of round 7 (never driver-checked; they
    # take the last five r4-stale corpus/similarity slots —
    # ann_recall_eval, vector_quantize, kmeans_step, pii_redact,
    # pseudonymize — which rotate into the r8 window instead)
    "excess_inventory_suppliers",
    "triangle_count",
    "dsir_weights",
    "boilerplate_lines",
    "k_anonymity_report",
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
