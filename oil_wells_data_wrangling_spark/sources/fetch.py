"""Bounded-concurrency enrichment-fetch source.

The reference enriches each well by driving a browser through a search
→ detail-page flow, one well at a time, with per-well timeouts and
blank-row fallbacks (web_scraping.py:139-286 fetch_one /
run_to_dataframe). That loop is inherently sequential; re-expressed for
Spark, fetching becomes a distributed source with explicit politeness
controls:

- **Bounded concurrency**: the URL frame is coalesced to
  ``max_concurrency`` partitions and each partition fetches strictly
  sequentially, so at most ``max_concurrency`` requests are in flight
  cluster-wide no matter how many executors exist.
- **Politeness delay**: a minimum interval between request *starts*
  within a partition (the reference's implicit per-well pacing).
- **Retry with exponential backoff**: ``max_attempts`` tries per URL,
  sleeping ``backoff_s * 2^(attempt-1)`` between tries; a URL that
  exhausts its attempts yields a NULL page and the error message — the
  blank-row fallback (web_scraping.py:215-246) — instead of failing
  the job.

The fetcher itself is injectable (any ``url -> html`` callable:
Playwright in production, a stub in tests — the live network is out of
scope for the sandbox), which keeps the politeness/retry machinery
testable. Output feeds ``sources/html_table.parse_well_pages`` and
then ``pipeline.build_well_info`` exactly like stored pages do.
"""

from __future__ import annotations

import time
from collections.abc import Callable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.types import (
    IntegerType,
    StringType,
    StructField,
    StructType,
)

FETCH_FIELDS = [
    StructField("html", StringType()),
    StructField("attempts", IntegerType()),
    StructField("error", StringType()),
]


def fetch_pages(
    urls: DataFrame,
    fetcher: Callable[[str], str],
    url_col: str = "url",
    max_concurrency: int = 4,
    max_attempts: int = 3,
    backoff_s: float = 0.5,
    min_interval_s: float = 0.25,
    sleeper: Callable[[float], None] = time.sleep,
) -> DataFrame:
    """Fetch ``urls[url_col]`` with bounded concurrency; keeps every
    other column as identity and appends (html, attempts, error).

    ``sleeper`` is injectable so tests can observe pacing without
    wall-clock waits. The fetcher/sleeper callables are serialized to
    executors by value (define test fakes inline, not at module level).
    """
    schema = StructType(
        [f for f in urls.schema.fields] + FETCH_FIELDS
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        last_start = [None]

        def fetch_one(url: str) -> tuple[str | None, int, str | None]:
            err: str | None = None
            for attempt in range(1, max_attempts + 1):
                if last_start[0] is not None:
                    wait = min_interval_s - (time.monotonic() - last_start[0])
                    if wait > 0:
                        sleeper(wait)
                last_start[0] = time.monotonic()
                try:
                    return fetcher(url), attempt, None
                except Exception as e:  # noqa: BLE001 — any fetch failure retries
                    err = f"{type(e).__name__}: {e}"
                    if attempt < max_attempts:
                        sleeper(backoff_s * 2 ** (attempt - 1))
            return None, max_attempts, err

        for pdf in batches:
            results = [fetch_one(u) for u in pdf[url_col]]
            out = pdf.copy()
            out["html"] = [r[0] for r in results]
            out["attempts"] = pd.array(
                [r[1] for r in results], dtype="int32"
            )
            out["error"] = [r[2] for r in results]
            yield out

    # repartition, not coalesce: coalesce only ever REDUCES partition
    # count, so a single-partition input would silently fetch with no
    # parallelism at all. The shuffle is trivial next to network time
    # and guarantees exactly max_concurrency sequential fetch lanes.
    return urls.repartition(max_concurrency).mapInPandas(run, schema)


# ------------------------------------------------------- real transports
#
# fetch_pages takes any ``url -> html`` callable; these are the two
# production transports. Both are plain picklable objects so they ride
# the mapInPandas closure to executors.


def make_urllib_fetcher(
    timeout_s: float = 30.0,
    user_agent: str = "oil-wells-data-wrangling-spark/1.0",
) -> Callable[[str], str]:
    """Stdlib transport for server-rendered pages — no dependency, no
    JS. Raises on HTTP errors so fetch_pages' retry/backoff machinery
    sees them; the decoded body is returned on success."""

    def fetch(url: str) -> str:
        from urllib.parse import urlsplit
        from urllib.request import Request, urlopen

        scheme = urlsplit(url).scheme.lower()
        if scheme not in ("http", "https"):
            # a crawl frontier is untrusted input: without this gate a
            # file:// (or ftp://, data:) entry would read executor-local
            # files into the fetched dataset
            raise ValueError(f"refusing non-http(s) URL scheme: {url!r}")
        req = Request(url, headers={"User-Agent": user_agent})
        with urlopen(req, timeout=timeout_s) as resp:
            charset = resp.headers.get_content_charset() or "utf-8"
            return resp.read().decode(charset, errors="replace")

    return fetch


class PlaywrightFetcher:
    """Headless-browser transport for JS-rendered sites — the
    reference's scraping target renders its well tables client-side,
    which is why it drives Chromium via ``sync_playwright`` rather
    than requesting raw HTML (web_scraping.py:139-286). This is that
    transport re-expressed for the distributed fetch source:

    - **Lazy per-process launch**: browser objects neither pickle nor
      survive forks, so ``__init__`` stores only configuration; the
      browser starts on the first call INSIDE the executor process and
      is reused for every subsequent URL in the partition (the
      reference reuses one page across wells the same way).
    - **Pickle-safe**: live handles are dropped from ``__getstate__``;
      what crosses the closure boundary is config only.
    - **Import-gated at construction**: build via
      :func:`make_playwright_fetcher`, which verifies the playwright
      package on the driver so a missing dependency is a clear
      ImportError before any job is submitted. Executors must also
      have playwright installed (a cluster ships it via the usual
      pyspark dependency channels); absent there, the error surfaces
      as this class's message rather than a bare ModuleNotFoundError.
    """

    def __init__(
        self,
        timeout_s: float = 30.0,
        wait_until: str = "load",
        browser: str = "chromium",
    ) -> None:
        self.timeout_s = timeout_s
        self.wait_until = wait_until
        self.browser_name = browser
        self._pw = None
        self._browser = None
        self._page = None

    def __getstate__(self):
        d = dict(self.__dict__)
        d["_pw"] = d["_browser"] = d["_page"] = None
        return d

    def _ensure_page(self):
        if self._page is None:
            try:
                from playwright.sync_api import sync_playwright
            except ImportError as e:
                raise ImportError(
                    "playwright is required for the headless-browser "
                    "transport; install it on driver AND executors, or "
                    "use make_urllib_fetcher for server-rendered pages"
                ) from e
            self._pw = sync_playwright().start()
            self._browser = getattr(self._pw, self.browser_name).launch(
                headless=True
            )
            self._page = self._browser.new_page()
        return self._page

    def __call__(self, url: str) -> str:
        from urllib.parse import urlsplit

        if urlsplit(url).scheme.lower() not in ("http", "https"):
            # same frontier-input gate as make_urllib_fetcher: a browser
            # will happily render file:// into the dataset
            raise ValueError(f"refusing non-http(s) URL scheme: {url!r}")
        page = self._ensure_page()
        page.goto(
            url,
            timeout=self.timeout_s * 1000.0,
            wait_until=self.wait_until,
        )
        return page.content()

    def close(self) -> None:
        for obj, stop in (
            (self._browser, "close"),
            (self._pw, "stop"),
        ):
            if obj is not None:
                try:
                    getattr(obj, stop)()
                except Exception:  # noqa: BLE001 — best-effort teardown
                    pass
        self._pw = self._browser = self._page = None


def make_playwright_fetcher(
    timeout_s: float = 30.0,
    wait_until: str = "load",
    browser: str = "chromium",
) -> PlaywrightFetcher:
    """Import-gated constructor for the browser transport: fail on the
    driver, at build time, with an actionable message — mirroring the
    pdfplumber/OCR gates in sources/pdf_source.py."""
    try:
        import playwright.sync_api  # noqa: F401
    except ImportError as e:
        raise ImportError(
            "playwright is not installed; the headless-browser transport "
            "needs it (pip install playwright && playwright install "
            "chromium). For server-rendered pages use "
            "make_urllib_fetcher instead."
        ) from e
    return PlaywrightFetcher(
        timeout_s=timeout_s, wait_until=wait_until, browser=browser
    )


# ------------------------------------------------------------- robots parsing


def parse_robots_rules(txt: str, agent: str = "*") -> list[str]:
    """Disallow prefixes for ``agent`` from one robots.txt body — the
    simple-prefix subset ``operators/textstats.py::robots_filter``
    consumes (no wildcards, no Allow longest-match override; a prefix
    containing ``*`` or ``$`` is skipped rather than misread as a
    literal). Group semantics per the robots exclusion standard: a
    record is one or more ``User-agent`` lines followed by rules; the
    most specific matching record wins, falling back to ``*``;
    comments strip at ``#``; an empty Disallow value means
    "allow everything" and contributes no prefix."""
    groups: list[tuple[list[str], list[str]]] = []
    cur_agents: list[str] = []
    cur_dis: list[str] = []
    in_rules = False
    for raw in txt.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line:
            continue
        key, _, val = line.partition(":")
        key = key.strip().lower()
        val = val.strip()
        if key == "user-agent":
            if in_rules and cur_agents:
                groups.append((cur_agents, cur_dis))
                cur_agents, cur_dis = [], []
                in_rules = False
            cur_agents.append(val.lower())
        elif key == "disallow":
            in_rules = True
            if val and "*" not in val and "$" not in val:
                cur_dis.append(val)
        elif key in ("allow", "crawl-delay", "sitemap"):
            in_rules = True  # rules section continues; subset ignores these
    if cur_agents:
        groups.append((cur_agents, cur_dis))
    agent = agent.lower()
    exact = [d for a, d in groups if agent != "*" and agent in a]
    if exact:
        return exact[0]
    wild = [d for a, d in groups if "*" in a]
    return wild[0] if wild else []


def robots_rules_table(robots: DataFrame, agent: str = "*") -> DataFrame:
    """(host, dis array<string>) rules from fetched robots.txt bodies —
    the real-input twin of robots_filter's synthesized rule table,
    broadcast-ready (host cardinality, KBs for millions of hosts).
    Input frame: (host string, body string)."""

    def _parse(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    "host": pdf["host"],
                    "dis": [
                        parse_robots_rules("" if b is None else b, agent)
                        for b in pdf["body"]
                    ],
                }
            )

    return robots.select("host", "body").mapInPandas(
        _parse, schema="host string, dis array<string>"
    )
