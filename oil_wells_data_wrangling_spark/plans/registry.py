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
# Round-10 window: (1) operators new this round lead (crawl_to_corpus,
# pq_train, ann_pq_trained, mix_schedule, stream_warc_ingest,
# sft_pack, span_corruption, dpo_pairs, l_diversity_report,
# tokenizer_vocab_prune, link_hits — never driver-checked); (2) operators whose implementation
# changed this round (both BPE trainers gained the single-symbol
# collapse guard + empty-vocabulary early-stop; warc_pipeline's write
# path gained the temp-plus-rename commit protocol; embedding_outliers
# landed the Arrow BLAS argmin; html_to_text moved to the shared
# _synth_pages/_strip_html helpers); (3) the FOURTEEN
# operators whose newest driver row is still round 5 — the set the r9
# comment scheduled for r10 — retiring the last pre-r6 rows and
# closing the r8 verdict's "min(latest driver round) >= 6" criterion;
# (4) the remaining slots start draining the 48-name r6 backlog
# alphabetically (the leftover 27 — events_window_agg,
# fingerprint_diff, group_split,
# hll_persist_incremental, hll_union_daily, html_table,
# idle_rich_customers, incremental_rollup, join_region_rollup,
# join_revenue_topn, then lang_mismatch_matrix onward — rotate in
# r11). Everything past 50 keeps its old green row and stays
# covered by the identical local comparison in
# tests/test_oracle_parity.py. A name listed here but not registered
# fails loudly (KeyError) rather than silently shrinking the window;
# tests/test_plans.py asserts the rotation INVARIANTS (never-checked
# names in-window, no registrant's latest row older than 4 rounds)
# from the committed CORRECTNESS_r*.json history, so a future rotation
# cannot silently strand either rule.
_WINDOW_PRIORITY = [
    # -- new in round 10 (never driver-checked)
    "crawl_to_corpus",
    "pq_train",
    "ann_pq_trained",
    "mix_schedule",
    "stream_warc_ingest",
    "sft_pack",
    "span_corruption",
    "dpo_pairs",
    "l_diversity_report",
    "tokenizer_vocab_prune",
    "link_hits",
    # -- implementation touched in round 10
    "bpe_train_batched",
    "bpe_train_steps",
    "warc_pipeline",
    "embedding_outliers",
    "html_to_text",
    # -- last driver row is round 5 (the final pre-r6 backlog)
    "sample_corpus",
    "shard_stats",
    "simhash_pairs",
    "sql_serving",
    "stratified_sample",
    "text_chunks",
    "tfidf_topk",
    "token_count",
    "train_val_split",
    "url_canonical",
    "url_stats",
    "vector_normalize",
    "vocab_topk",
    "zorder_stats",
    # -- r6 backlog, alphabetical fill to 50
    "approx_distinct",
    "approx_percentiles",
    "bigram_lift",
    "blocklist_filter",
    "bm25_topk",
    "contamination_report",
    "correlated_avg_filter",
    "custdist",
    "dataset_card_stats",
    "dedup_cross",
    "disjunctive_filter_revenue",
    "distinct_count",
    "domain_pagerank",
    "dup_ngram_fraction",
    "events_attribution",
    "events_distinct_windowed",
    "events_enrich",
    "events_rate_limit",
    "events_topk",
    "events_transitions",
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
