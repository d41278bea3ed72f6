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
