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


# The driver's CORRECTNESS gate checks the FIRST 50 queries in the
# order ``queries()`` yields them, so this list — not module import
# order — decides who gets a fresh driver-verified row this round.
# Round-3 window: (1) the 9 operators that have never had a driver row,
# (2) operators added this round, (3) operators whose implementation
# changed this round, then (4) the operators whose last green row is
# round 1 (stalest first). Everything past 50 keeps its round-1/2 green
# row and stays covered by the identical local comparison in
# tests/test_oracle_parity.py. A name listed here but not registered
# fails loudly (KeyError) rather than silently shrinking the window.
_WINDOW_PRIORITY = [
    # -- never driver-checked (VERDICT r2 top item)
    "range_join",
    "winsorize",
    "bucket_quantiles",
    "pii_redact",
    "decontaminate",
    "pseudonymize",
    "vector_quantize",
    "ann_pq",
    "ann_recall_eval",
    # -- new in round 3
    "geo_bucket",
    "spatial_bbox",
    "quality_topk",
    "length_histogram",
    "pack_sequences_grouped",
    "kmeans_step",
    "skew_report",
    "integrity_report",
    "minhash_containment",
    "domain_cap",
    # -- implementation changed in round 3
    "corpus_pipeline",
    "corpus_pipeline_full",
    "embed_neardup",
    "events_funnel",
    "agg_pricing_summary",
    "events_rolling",
    "events_anomaly",
    # -- last green row is round 1: analytics
    "semi_anti_join",
    "pivot_status",
    "rollup_cube",
    "grouping_sets",
    "window_lag_delta",
    "salted_agg_join",
    # -- last green row is round 1: wrangle
    "extract_fields",
    "parse_coordinates",
    "api_canonical",
    "numeric_sanitize",
    "text_normalize",
    "normalize_keys",
    "csv_repair",
    "validate_report",
    "bad_rows",
    "upsert_latest",
    "extract_repeated",
    "fuzzy_match_names",
    "enrich_join",
    "sentinel_to_null",
    "serve_wells",
    "extract_stim",
    "serve_wells_full",
    "well_pipeline",
    # (the similarity family keeps its r1-green rows — displaced from
    # the window by this round's additions)
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
