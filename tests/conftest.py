from __future__ import annotations

import os

import duckdb
import pytest

from oil_wells_data_wrangling_spark.compat import ensure_protobuf
from oil_wells_data_wrangling_spark.session import get_spark
from oil_wells_data_wrangling_spark.sources.readers import TABLE_NAMES

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")

# ------------------------------------------------------------------ slow tier
# The tests below each ran >= ~6s in the full-suite duration census
# (pytest --durations=0, 2026-08-18; 714 tests, 32:53 wall). Together
# they are ~21 of those 33 minutes. pytest.ini deselects the `slow`
# marker by default so the routine gate finishes in ~12 minutes; the
# full suite (`-m ""`) stays the pre-commit bar and MUST stay green —
# the tier split changes scheduling, not coverage. Entries that stop
# matching (renamed/removed tests) are ignored harmlessly; a new test
# that grows past the threshold should be added here at the next census.
_SLOW_TESTS = {
    "test_oracle_parity.py::test_oracle_parity[elo_ratings]",
    "test_oracle_parity.py::test_all_queries_return_rows",
    "test_plan_shapes.py::test_no_unbounded_single_partition_window_in_any_query",
    "test_prestaged_r12.py::test_elo_ratings_matches_oracle",
    "test_multimodal_real.py::test_resize_features_jpeg_pixels_via_gated_pil_distributed",
    "test_streaming_neardup.py::test_store_file_count_bounded_across_many_batches",
    "test_property.py::test_bpe_merge_replace_agrees_across_engines",
    "test_prestaged_r12.py::test_wide_docs_do_not_overflow_q",
    "test_oracle_parity.py::test_oracle_parity[semdedup_pipeline]",
    "test_round10_ops.py::test_pq_recall_grows_with_k",
    "test_property.py::test_dms_corner_cases",
    "test_oracle_parity.py::test_oracle_parity[embed_neardup]",
    "test_similarity_blocking.py::test_gram_blocked_mask_matches_unblocked_on_large_cluster",
    "test_cc.py::test_large_random_graph_matches_union_find_oracle",
    "test_property.py::test_payload_text_total_on_arbitrary_bytes",
    "test_streaming.py::test_stream_topk_tws_final_emission_matches_batch",
    "test_cc.py::test_deep_chain_converges_in_log_rounds",
    "test_streaming.py::test_stream_cms_tws_sealed_cells_match_batch_sketch",
    "test_streaming.py::test_stream_sessionize_tws_out_of_order_extends_not_shrinks",
    "test_property.py::test_dms_roundtrip",
    "test_property.py::test_api_roundtrip",
    "test_streaming.py::test_stream_sessionize_timeout_path[tws]",
    "test_opq.py::test_opq_objective_and_orthogonality",
    "test_streaming_load.py::test_windowed_agg_state_stays_bounded_under_load",
    "test_webdataset.py::test_webdataset_round_trips_any_unicode",
    "test_csv_repair_fuzz.py::test_repair_recovers_any_quoted_name",
    "test_oracle_parity.py::test_oracle_parity[stream_asof_join]",
    "test_oracle_parity.py::test_oracle_parity[bitext_mining]",
    "test_streaming.py::test_stream_log_histogram_tws_sealed_cells_match_batch",
    "test_bucketed.py::test_bucketed_join_has_no_exchange",
    "test_streaming.py::test_stream_attribution_state_is_bounded",
    "test_oracle_parity.py::test_oracle_parity[embedding_outliers]",
    "test_property.py::test_winnow_guarantee_property",
    "test_pipeline.py::test_reference_workflow_end_to_end",
    "test_oracle_parity.py::test_oracle_parity[dedup_clusters]",
    "test_oracle_parity.py::test_oracle_parity[stream_crawl_corpus]",
    "test_streaming.py::test_stream_hll_tws_sealed_registers_match_batch",
    "test_oracle_parity.py::test_oracle_parity[dedup_keep_best]",
    "test_streaming.py::test_stream_sessionize_out_of_order_extends_not_shrinks",
    "test_opq.py::test_opq_walk_is_reproducible",
    "test_csv_repair_fuzz.py::test_repair_recovers_escaped_quotes",
    "test_streaming.py::test_stream_sessionize_tws_timers_match_batch",
    "test_warc.py::test_prefix_range_equals_startswith_property",
    "test_round10_ops.py::test_bpe_batched_production_depth_collect_accounting",
    "test_opq.py::test_opq_beats_unrotated_on_anisotropic_fixture",
    "test_csv_repair_fuzz.py::test_repair_with_junk_and_escaped_quotes",
    "test_streaming.py::test_stream_rate_limit_matches_batch[tws]",
    "test_oracle_parity.py::test_oracle_parity[ann_pipeline]",
    "test_oracle_parity.py::test_oracle_parity[eval_leakage_report]",
    "test_oracle_parity.py::test_oracle_parity[dedup_pipeline]",
    "test_streaming.py::test_stream_sessionize_timeout_path[legacy]",
    "test_oracle_parity.py::test_oracle_parity[stream_cdc_apply]",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        # nodeid is like "tests/test_foo.py::test_bar[param]"; match on
        # the file::test tail so the hook works from any rootdir.
        tail = item.nodeid.split("/")[-1]
        if tail in _SLOW_TESTS:
            item.add_marker(pytest.mark.slow)

# Bridge google.protobuf (transformWithStateInPandas worker protocol)
# BEFORE any SparkSession exists: workers inherit the JVM's env, so the
# shim's PYTHONPATH entry must be in place when the JVM launches.
HAVE_PROTOBUF = ensure_protobuf()


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="tests", master="local[4]", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def duck():
    """DuckDB connection with the same parquet tables as views — mirrors
    the driver's oracle environment."""
    con = duckdb.connect()
    for name in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{SF_DIR}/{name}.parquet')"
        )
    yield con
    con.close()


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR
