"""Bounded-concurrency fetch source (reference web_scraping.py:139-286
parity): injectable fetcher, sequential-per-partition pacing, retry
with backoff, blank-row fallback — driving the stored-page parser and
pipeline.build_well_info end-to-end with a mock fetcher."""

from __future__ import annotations

import time

from oil_wells_data_wrangling_spark.pipeline import build_well_info
from oil_wells_data_wrangling_spark.sources.fetch import fetch_pages
from oil_wells_data_wrangling_spark.sources.html_table import parse_well_pages

_PAGE = """
<html><body>
<table><tr><th>Well Status</th><td>{status}</td></tr>
<tr><th>Well Type</th><td>OIL</td></tr>
<tr><th>Closest City</th><td>Williston</td></tr></table>
<p class="block_stat"><span class="dropcap">{oil}</span>
 Barrels of Oil Produced</p>
</body></html>
"""


def _urls_df(spark, rows):
    return spark.createDataFrame(rows, "well_name string, api string, url string")


def test_fetch_retry_backoff_and_blank_row_fallback(spark):
    urls = _urls_df(
        spark,
        [
            ("W1", "33-053-00001", "http://x/1"),
            ("W2", "33-053-00002", "http://x/flaky"),
            ("W3", "33-053-00003", "http://x/dead"),
        ],
    )

    # inline fake (executors get it by value): /1 succeeds immediately,
    # /flaky fails twice then succeeds, /dead always fails
    def fetcher(url, _seen={}):
        n = _seen[url] = _seen.get(url, 0) + 1
        if url.endswith("dead") or (url.endswith("flaky") and n <= 2):
            raise ConnectionError(f"boom {n}")
        return _PAGE.format(status="ACTIVE", oil="482")

    fetched = fetch_pages(
        urls, fetcher, max_attempts=3, backoff_s=0.0, min_interval_s=0.0
    )
    got = {r["url"]: r for r in fetched.collect()}
    assert got["http://x/1"]["attempts"] == 1
    assert got["http://x/flaky"]["attempts"] == 3
    assert got["http://x/flaky"]["html"] is not None
    assert got["http://x/dead"]["html"] is None  # blank-row fallback
    assert got["http://x/dead"]["attempts"] == 3
    assert "ConnectionError" in got["http://x/dead"]["error"]

    # parsed pages feed build_well_info exactly like stored pages
    web = parse_well_pages(fetched.drop("url", "attempts", "error"))
    header = spark.createDataFrame(
        [("W1", "33-053-00001", "f1.pdf"), ("W9", "33-053-00009", "f9.pdf")],
        "well_name string, api string, pdf_name string",
    )
    info = {r["pdf_name"]: r for r in build_well_info(header, web).collect()}
    assert info["f1.pdf"]["well_status"] == "ACTIVE"
    assert info["f1.pdf"]["oil_badge"] == "482"
    assert info["f9.pdf"]["well_status"] is None  # unscraped well: left join
    # the dead fetch has NULL html → fields stay NULL (the reference's
    # blank_row 'N/A' sentinels are likewise normalized to NULL before
    # the join, web_scraping.py:287-294)
    w3 = [r for r in web.collect() if r["well_name"] == "W3"][0]
    assert w3["well_status"] is None


def test_fetch_concurrency_bound_and_pacing(spark):
    rows = [(f"W{i}", f"33-053-{i:05d}", f"http://x/{i}") for i in range(8)]
    urls = _urls_df(spark, rows)

    def fetcher(url):
        return "<html></html>"

    # exactly max_concurrency lanes, even from a 1-partition input
    # (coalesce would silently serialize it — regression guard)
    fetched = fetch_pages(
        urls.coalesce(1), fetcher, max_concurrency=2, min_interval_s=0.0
    )
    assert fetched.rdd.getNumPartitions() == 2
    assert fetched.count() == 8

    # politeness: 4 sequential fetches in ONE partition with a 0.15s
    # min interval cannot finish faster than 3 gaps (sleeps only ever
    # slow the lower bound down, so this is not flaky)
    urls4 = _urls_df(spark, rows[:4])
    t0 = time.monotonic()
    fetch_pages(urls4, fetcher, max_concurrency=1, min_interval_s=0.15).count()
    assert time.monotonic() - t0 >= 3 * 0.15
