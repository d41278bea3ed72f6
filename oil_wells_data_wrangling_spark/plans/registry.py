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
# Round-6 window: (1) queries new this round, (2) queries whose
# implementation changed this round (the multimodal decoders grew
# malformed-payload fallbacks; neardup_incremental gained store
# compaction; decontaminate gained the donor-contiguity guard), (3)
# the 13 operators whose newest driver row is round 2 — the r5
# verdict's top item; events_enrich/json_props matter most because
# their r2 rows predate the events ts-encoding change, (4) round-4
# rows, reference-derived wrangle family and corpus/similarity
# headliners first. The round-4 rows left out (extract_fields,
# extract_repeated, well_pipeline, pseudonymize,
# minhash_containment, embed_neardup, corpus_pipeline,
# corpus_pipeline_full, pii_redact, agg_pricing_summary,
# serve_wells_full, sentinel_to_null, extract_stim, serve_wells,
# fuzzy_match_names, enrich_join, upsert_latest, validate_report,
# bad_rows, csv_repair, text_normalize, normalize_keys,
# parse_coordinates, api_canonical, numeric_sanitize, pivot_status,
# rollup_cube, grouping_sets, window_lag_delta, semi_anti_join,
# winsorize, range_join, salted_agg_join, skew_report,
# integrity_report, geo_bucket, spatial_bbox, events_anomaly,
# events_funnel, kmeans_step, bucket_quantiles, domain_cap,
# quality_topk, length_histogram, pack_sequences_grouped, ann_pq,
# ann_recall_eval, vector_quantize) are 2 rounds old at r6 and
# rotate into the r7 window. The late-r6 operators that missed this
# window entirely (snapshot_diff, quality_threshold_sweep,
# model_score, mix_temperature) should LEAD the r7 window — they have
# no driver row at all yet, only local parity coverage. Everything past 50 keeps its old green row and stays
# covered by the identical local comparison in
# tests/test_oracle_parity.py. A name listed here but not registered
# fails loudly (KeyError) rather than silently shrinking the window.
_WINDOW_PRIORITY = [
    # -- new in round 6
    "dedup_cross",
    "dup_ngram_fraction",
    "group_split",
    "correlated_avg_filter",
    "top_supplier_revenue",
    "late_shipment_priority",
    "domain_pagerank",
    "events_attribution",
    "custdist",
    "idle_rich_customers",
    "events_rate_limit",
    "pca_top_component",
    "events_transitions",
    "vocab_coverage",
    "disjunctive_filter_revenue",
    "incremental_rollup",
    "semdedup_clusters",
    "dataset_card_stats",
    "minhash_band_sensitivity",
    "blocklist_filter",
    "lang_mismatch_matrix",
    "bm25_topk",
    "events_topk",
    "scd2_apply",
    "rarity_score",
    "mix_balance",
    "events_distinct_windowed",
    "contamination_report",
    "hll_union_daily",
    "scd2_attribution",
    "hll_persist_incremental",
    "bigram_lift",
    # -- implementation changed in round 6
    "events_window_agg",
    "neardup_incremental",
    "decontaminate",
    "mm_resize",
    "mm_audio_chunks",
    "mm_frame_sample",
    # -- last driver row is round 2 (the r5 verdict's rotation list)
    "mm_meta",
    "html_table",
    "fingerprint_diff",
    "events_enrich",
    "json_props",
    "window_rank",
    "window_running",
    "distinct_count",
    "approx_distinct",
    "approx_percentiles",
    "join_region_rollup",
    "join_revenue_topn",
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
