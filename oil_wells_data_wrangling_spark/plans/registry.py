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
# Round-11 window: (1) new-this-round operators lead (never
# driver-checked names MUST be in-window the round they land), plus
# operators whose implementation changed this round (embedding_outliers
# gained the magnitude-scaled boundary-recompute window; link_hits'
# normalizer moved to decimal/HUGEINT products — both r10 advice
# items); (2) the TWENTY-EIGHT operators whose newest driver row is round 6 —
# the exact stale set the r10 verdict enumerated (latest < R-4 with
# R = 11) — rotate in and retire the last r6 rows. 18 new + 4 touched
# + 28 stale fills all 50 slots; the 47-name r7 cohort starts
# draining in r12 (alphabetical, alongside that round's new
# operators). Everything past 50 keeps its old
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
    # -- new in round 11 (never driver-checked)
    "soft_dedup_weights",
    "importance_resample",
    "fim_plan",
    "bloom_blocklist",
    "kcenter_select",
    "preference_bt",
    "stream_cdc_apply",
    "ulm_train_steps",
    "mm_caption_align",
    "stream_crawl_corpus",
    "ulm_tokenize",
    "dp_mean_clipped",
    "mrl_recall_eval",
    "text_augment_plan",
    "rrf_fusion",
    "grpo_advantage",
    "secrets_scan",
    "license_classify",
    "hard_negative_mining",
    "moe_router_stats",
    "curriculum_schedule",
    "warc_dedup_digest",
    # (the four r10-advice-touched operators — embedding_outliers,
    # link_hits, pq_train, ann_pq_trained — hold r10 green rows and
    # stay covered by tests/test_oracle_parity.py; their window slots
    # went to the 4 extra never-checked operators above, which the
    # rotation invariant REQUIRES in-window. They re-rotate in r12.)
    # -- last driver row is round 6 (the full r10-verdict stale set)
    "events_window_agg",
    "fingerprint_diff",
    "group_split",
    "hll_persist_incremental",
    "hll_union_daily",
    "html_table",
    "idle_rich_customers",
    "incremental_rollup",
    "join_region_rollup",
    "join_revenue_topn",
    "json_props",
    "lang_mismatch_matrix",
    "late_shipment_priority",
    "mix_balance",
    "mm_audio_chunks",
    "mm_frame_sample",
    "mm_meta",
    "mm_resize",
    "neardup_incremental",
    "pca_top_component",
    "rarity_score",
    "scd2_apply",
    "scd2_attribution",
    "semdedup_clusters",
    "top_supplier_revenue",
    "vocab_coverage",
    "window_rank",
    "window_running",
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
# ROUND-12 ROTATION, PREPARED (late r11). The r12 builder's first
# commit should: (1) @register the three pre-staged operators
# (quality_ensemble in operators/textstats.py, elo_ratings in
# operators/corpus.py, cdx_domain_captures in operators/webtable.py —
# implementations, oracles, parity tests, and BASELINE scale rows all
# landed in r11); (2) add their ids to SURVEY §2 (count 240 → 243);
# (3) replace _WINDOW_PRIORITY with the list below — 3 never-checked
# names + the 47-name r7 cohort, which goes stale the moment
# CORRECTNESS_r12.json is committed (upcoming=13, bound R-5). The
# cohort was computed from the committed CORRECTNESS history plus the
# r11 window (tests/test_plans.py re-derives the same invariants).
# There is NO room for additional new operators in r12's window;
# r13 has ≤5 free slots (r8 cohort is 45). Steady-state capacity is
# 50×5 = 250 registered operators — grow §2.E past that, not §2.
#
# _WINDOW_PRIORITY = [
#     # -- new in round 12 (never driver-checked; pre-staged in r11)
#     "quality_ensemble",
#     "elo_ratings",
#     "cdx_domain_captures",
#     # -- last driver row is round 7 (the full cohort, alphabetical)
#     "ann_pq", "api_canonical", "bad_rows", "basket_lift",
#     "corpus_pipeline", "corpus_pipeline_full", "csv_repair",
#     "dp_histogram", "dsir_weights", "embed_neardup", "enrich_join",
#     "events_ab_lift", "events_burst", "excess_inventory_suppliers",
#     "extract_fields", "extract_repeated", "extract_stim",
#     "forecast_revenue", "fuzzy_match_names", "important_parts",
#     "late_arrival_audit", "local_supplier_volume", "market_share",
#     "minhash_containment", "mix_temperature", "mm_scene_cut",
#     "model_score", "nation_volume_shipping", "normalize_keys",
#     "numeric_sanitize", "pack_sequences_grouped", "parse_coordinates",
#     "product_type_profit", "quality_threshold_sweep", "quality_topk",
#     "returned_item_report", "rfm_segments", "sentinel_to_null",
#     "serve_wells", "serve_wells_full", "snapshot_diff",
#     "text_normalize", "triangle_count", "upsert_latest", "url_dedup",
#     "validate_report", "well_pipeline",
# ]
