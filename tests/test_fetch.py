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


def test_playwright_gate_refuses_cleanly_without_playwright():
    """make_playwright_fetcher must fail on the driver at BUILD time
    with an actionable message when playwright is absent (mirroring the
    pdfplumber/OCR gates); with playwright present it must return the
    transport without launching anything."""
    import pytest

    from oil_wells_data_wrangling_spark.sources.fetch import (
        PlaywrightFetcher,
        make_playwright_fetcher,
    )

    try:
        import playwright.sync_api  # noqa: F401

        has_pw = True
    except ImportError:
        has_pw = False

    if has_pw:
        f = make_playwright_fetcher()
        assert isinstance(f, PlaywrightFetcher)
        assert f._page is None  # lazy: nothing launched at build time
    else:
        with pytest.raises(ImportError, match="playwright"):
            make_playwright_fetcher()


def test_playwright_fetcher_lazy_launch_pickle_and_reuse(monkeypatch):
    """Drive PlaywrightFetcher against a FAKE playwright module: the
    browser must launch lazily on first call, be reused across calls,
    survive pickling with live handles dropped, and tear down on
    close() — the exact contract the distributed fetch path relies on."""
    import pickle
    import sys
    import types

    from oil_wells_data_wrangling_spark.sources.fetch import PlaywrightFetcher

    launches = []

    class FakePage:
        def __init__(self):
            self.visited = []

        def goto(self, url, timeout=None, wait_until=None):
            self.visited.append((url, timeout, wait_until))

        def content(self):
            return f"<html>{self.visited[-1][0]}</html>"

    class FakeBrowser:
        def __init__(self):
            self.page = FakePage()
            self.closed = False

        def new_page(self):
            return self.page

        def close(self):
            self.closed = True

    class FakeBrowserType:
        def launch(self, headless=None):
            launches.append(headless)
            return FakeBrowser()

    class FakePW:
        def __init__(self):
            self.chromium = FakeBrowserType()
            self.stopped = False

        def stop(self):
            self.stopped = True

    class FakeStarter:
        def start(self):
            return FakePW()

    fake_pkg = types.ModuleType("playwright")
    fake_api = types.ModuleType("playwright.sync_api")
    fake_api.sync_playwright = lambda: FakeStarter()
    fake_pkg.sync_api = fake_api
    monkeypatch.setitem(sys.modules, "playwright", fake_pkg)
    monkeypatch.setitem(sys.modules, "playwright.sync_api", fake_api)

    f = PlaywrightFetcher(timeout_s=7.0, wait_until="networkidle")
    assert f._page is None and launches == []  # nothing until first call

    html = f("http://x/a")
    assert html == "<html>http://x/a</html>"
    assert launches == [True]  # headless, launched exactly once
    f("http://x/b")
    assert launches == [True]  # second call reuses the browser
    assert f._page.visited[-1] == ("http://x/b", 7000.0, "networkidle")

    clone = pickle.loads(pickle.dumps(f))  # what mapInPandas ships
    assert clone._page is None and clone._pw is None  # handles dropped
    assert clone.timeout_s == 7.0 and clone.wait_until == "networkidle"

    browser, pw = f._browser, f._pw
    f.close()
    assert browser.closed and pw.stopped and f._page is None


def test_urllib_fetcher_against_local_server(tmp_path):
    """The stdlib transport end-to-end against a real local HTTP server:
    decoded body on success, exception (retryable by fetch_pages) on 404."""
    import http.server
    import threading

    import pytest

    from oil_wells_data_wrangling_spark.sources.fetch import make_urllib_fetcher

    (tmp_path / "page.html").write_text(
        "<html>wéll</html>", encoding="utf-8"
    )
    handler = lambda *a, **k: http.server.SimpleHTTPRequestHandler(  # noqa: E731
        *a, directory=str(tmp_path), **k
    )
    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        port = srv.server_address[1]
        fetch = make_urllib_fetcher(timeout_s=5.0)
        assert fetch(f"http://127.0.0.1:{port}/page.html") == "<html>wéll</html>"
        with pytest.raises(Exception):
            fetch(f"http://127.0.0.1:{port}/missing.html")
    finally:
        srv.shutdown()


def test_fetchers_reject_non_http_schemes(tmp_path):
    """A poisoned crawl frontier must not read executor-local files:
    both transports refuse file:// (and anything non-http(s)) before
    opening anything."""
    import pytest

    from oil_wells_data_wrangling_spark.sources.fetch import (
        PlaywrightFetcher,
        make_urllib_fetcher,
    )

    secret = tmp_path / "secret.txt"
    secret.write_text("do-not-exfiltrate")
    fetch = make_urllib_fetcher(timeout_s=2.0)
    for url in (f"file://{secret}", "ftp://x/y", "data:text/html,hi"):
        with pytest.raises(ValueError, match="non-http"):
            fetch(url)
    # the browser transport gates BEFORE launching anything, so this
    # passes even with no playwright installed
    pf = PlaywrightFetcher()
    with pytest.raises(ValueError, match="non-http"):
        pf(f"file://{secret}")


# ------------------------------------------------------------- robots parsing


def test_parse_robots_rules_groups_and_fallback():
    from oil_wells_data_wrangling_spark.sources.fetch import parse_robots_rules

    txt = (
        "# crawler policy\n"
        "User-agent: googlebot\n"
        "Disallow: /google-only/\n"
        "\n"
        "User-agent: mybot\n"
        "User-agent: otherbot\n"
        "Disallow: /private/\n"
        "Disallow:   /tmp/   # trailing comment\n"
        "Disallow:\n"          # empty = allow all, no prefix
        "Allow: /tmp/public\n"  # subset ignores Allow
        "Disallow: /a*b\n"      # wildcard prefix skipped, not literal
        "\n"
        "User-agent: *\n"
        "Crawl-delay: 2\n"
        "Disallow: /default/\n"
    )
    assert parse_robots_rules(txt, "mybot") == ["/private/", "/tmp/"]
    assert parse_robots_rules(txt, "OtherBot") == ["/private/", "/tmp/"]
    assert parse_robots_rules(txt, "unknown") == ["/default/"]
    assert parse_robots_rules(txt) == ["/default/"]
    assert parse_robots_rules(txt, "googlebot") == ["/google-only/"]
    assert parse_robots_rules("", "mybot") == []
    # a new User-agent line AFTER rules starts a new record
    txt2 = "User-agent: a\nDisallow: /x/\nUser-agent: b\nDisallow: /y/\n"
    assert parse_robots_rules(txt2, "b") == ["/y/"]


def test_robots_rules_table_feeds_frontier_filter(spark):
    """The parsed (host, dis) table slots into robots_filter's
    broadcast-exists frontier flagging unchanged."""
    from pyspark.sql import functions as F

    from oil_wells_data_wrangling_spark.sources.fetch import robots_rules_table

    robots = spark.createDataFrame(
        [
            ("a.com", "User-agent: *\nDisallow: /private/\nDisallow: /tmp/\n"),
            ("b.com", "User-agent: *\nDisallow:\n"),
            ("c.com", None),
        ],
        "host string, body string",
    )
    rules = robots_rules_table(robots)
    got = {r.host: list(r.dis) for r in rules.collect()}
    assert got == {"a.com": ["/private/", "/tmp/"], "b.com": [], "c.com": []}

    frontier = spark.createDataFrame(
        [
            ("a.com", "/private/x"),
            ("a.com", "/page1"),
            ("b.com", "/private/x"),
            ("c.com", "/tmp/y"),
        ],
        "host string, path string",
    )
    flagged = frontier.join(F.broadcast(rules), "host", "left").select(
        "host",
        "path",
        F.coalesce(
            F.expr("exists(dis, p -> startswith(path, p))"), F.lit(False)
        ).alias("blocked"),
    )
    out = {(r.host, r.path): r.blocked for r in flagged.collect()}
    assert out == {
        ("a.com", "/private/x"): True,
        ("a.com", "/page1"): False,
        ("b.com", "/private/x"): False,
        ("c.com", "/tmp/y"): False,
    }
