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
    import oil_wells_data_wrangling_spark.streaming.neardup  # noqa: F401


# The driver's CORRECTNESS gate checks the FIRST 50 queries in the
# order ``queries()`` yields them, so this list — not module import
# order — decides who gets a fresh driver-verified row this round.
# Round-5 window: (1) the three event queries broken by the r4
# TIMESTAMP_NTZ data drift and fixed this round, (2) queries whose
# implementation changed this round, (3) queries new this round, (4)
# the 8 operators whose only driver row is round 1, then (5) the
# stalest round-2 rows (event/streaming + dedup families first; six
# plumbing-stable r2 rows — mm_meta, mm_frame_sample, html_table,
# fingerprint_diff, events_enrich, json_props — rotate into the r6
# window instead). Everything past 50 keeps its old green row and
# stays covered by the identical local comparison in
# tests/test_oracle_parity.py. A name listed here but not registered
# fails loudly (KeyError) rather than silently shrinking the window.
_WINDOW_PRIORITY = [
    # -- broken in r4 by the ts encoding drift; fixed this round
    "events_rolling",
    "events_sessionize",
    "events_retention",
    # -- implementation changed in round 5
    "pack_sequences",
    "decontaminate",
    # -- new in round 5
    "neardup_incremental",
    "kmeans_iterate",
    "ngram_counts",
    "stratified_sample",
    "events_gap_fill",
    "cdc_apply",
    "tfidf_topk",
    "ivf_recluster",
    "zorder_stats",
    # -- only driver row is round 1 (three rounds stale)
    "ann_lsh",
    "ann_pipeline",
    "ann_topk",
    "ivf_assign",
    "percentiles",
    "promo_revenue",
    "sql_serving",
    "vector_normalize",
    # -- last driver row is round 2: events / streaming twins
    "events_window_agg",
    "events_sliding_agg",
    "events_sessionize_native",
    "events_dedup",
    "asof_join",
    "anomaly_mad",
    # -- last driver row is round 2: dedup family
    "dedup_exact",
    "dedup_minhash",
    "dedup_clusters",
    "dedup_simhash",
    "simhash_pairs",
    "ngram_jaccard",
    "minhash_jaccard_est",
    # -- last driver row is round 2: text / corpus
    "lang_id",
    "quality_score",
    "token_count",
    "fingerprint",
    "repetition_filter",
    "vocab_topk",
    "url_stats",
    "url_canonical",
    "text_chunks",
    "sample_corpus",
    "shard_stats",
    "train_val_split",
    "chunk_dedup",
    # -- last driver row is round 2: analytics (window_rank,
    # window_running, distinct_count, approx_distinct,
    # approx_percentiles, join_region_rollup, join_revenue_topn
    # displaced to the r6 window by this round's new operators —
    # stable since r2, still locally parity-checked)
    # -- last driver row is round 2: multimodal (touched this round)
    "mm_resize",
    "mm_audio_chunks",
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
