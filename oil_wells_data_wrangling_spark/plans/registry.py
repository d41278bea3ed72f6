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
# Round-9 window, per the r8 verdict's top item: (1) operators new or
# touched this round lead (warc_pipeline is new; bitext_mining's LSH
# space became n-scaled, chunk_dedup_rewrite's segment rebuild became
# positional, semdedup_pipeline's featurizer rounding kernel changed
# to the exact-fraction HALF_UP compare); (2) the FIFTEEN operators
# whose newest driver row is still round 4 — they yielded their r8
# slots to the fifteen late-r8 additions and must retire now, closing
# the r6/r7 "min(latest driver round) >= 5" criterion; (3) the
# remaining slots drain the r5 backlog, the r8 verdict's named
# eventops/ann/dedup families first, then alphabetical. The r5 names
# left over (shard_stats, simhash_pairs, sql_serving,
# stratified_sample, text_chunks, tfidf_topk, token_count,
# train_val_split, url_canonical, url_stats, vector_normalize,
# vocab_topk, zorder_stats — plus sample_corpus, which yielded its
# slot to the late-r9 bpe_train_batched) rotate in r10. Everything past 50 keeps
# its old green row and stays covered by the identical local
# comparison in tests/test_oracle_parity.py. A name listed here but
# not registered fails loudly (KeyError) rather than silently
# shrinking the window.
_WINDOW_PRIORITY = [
    # -- new in round 9 (never driver-checked)
    "warc_pipeline",
    "bpe_train_batched",
    # -- implementation touched in round 9
    "bitext_mining",
    "chunk_dedup_rewrite",
    "semdedup_pipeline",
    # -- last driver row is round 4 (oldest backlog, retired here)
    "integrity_report",
    "kmeans_step",
    "length_histogram",
    "pii_redact",
    "pivot_status",
    "pseudonymize",
    "range_join",
    "rollup_cube",
    "salted_agg_join",
    "semi_anti_join",
    "skew_report",
    "spatial_bbox",
    "vector_quantize",
    "window_lag_delta",
    "winsorize",
    # -- r5 backlog: the r8 verdict's named families first
    "events_retention",
    "events_rolling",
    "events_sliding_agg",
    "events_dedup",
    "events_gap_fill",
    "events_sessionize",
    "events_sessionize_native",
    "fingerprint",
    "dedup_simhash",
    "dedup_clusters",
    "ann_topk",
    "ann_lsh",
    "ann_pipeline",
    "anomaly_mad",
    # -- r5 backlog, alphabetical fill to 50
    "asof_join",
    "cdc_apply",
    "chunk_dedup",
    "dedup_exact",
    "dedup_minhash",
    "ivf_assign",
    "ivf_recluster",
    "kmeans_iterate",
    "lang_id",
    "ngram_counts",
    "ngram_jaccard",
    "pack_sequences",
    "percentiles",
    "promo_revenue",
    "quality_score",
    "repetition_filter",
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
