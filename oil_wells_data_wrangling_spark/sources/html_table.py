"""HTML detail-page parser — the pure half of the scrape connector.

The reference fetches well detail pages with Playwright and reads
fields off the live DOM (web_scraping.py:80-128): the first ``<td>``
following a ``<th>`` whose text is the label, and the ``span.dropcap``
inside the ``p.block_stat`` naming each production badge; missing
fields become ``"N/A"`` (web_scraping.py:87, later normalized to NULL).
The fetch is network-bound and out of scope; this module re-expresses
the DOM reads as JVM-side regex extraction over a stored-HTML column,
so scraped pages parse as a distributed scan instead of per-page
browser automation.

Patterns deliberately avoid lookaheads and use only ``(?s)``/non-greedy
constructs so the identical regex runs under both Java regex (Spark)
and RE2 (DuckDB) — which is what makes the ``html_table`` query
oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _strip_tags(raw: Column) -> Column:
    """inner_text() equivalent: drop tags, collapse whitespace, trim."""
    return F.trim(
        F.regexp_replace(F.regexp_replace(raw, "<[^>]+>", " "), r"\s+", " ")
    )


def th_td_value(html: Column | str, label: str) -> Column:
    """Text of the first ``<td>`` following ``<th>label</th>``
    (web_scraping.py:80-87 get_table_value_any). Missing → 'N/A'."""
    col = F.col(html) if isinstance(html, str) else html
    pat = r"(?s)<th[^>]*>\s*" + label + r"\s*</th>\s*<td[^>]*>(.*?)</td>"
    text = _strip_tags(F.regexp_extract(col, pat, 1))
    return F.when(text == "", "N/A").otherwise(text)


def badge_value(html: Column | str, label: str) -> Column:
    """Text of ``span.dropcap`` inside the ``p.block_stat`` naming
    ``label`` (web_scraping.py:90-111 get_oil_badge/get_gas_badge).
    Handles span-before-label (the live markup) and label-before-span.
    Missing/empty → 'N/A'."""
    col = F.col(html) if isinstance(html, str) else html
    span_first = (
        r"<p[^>]*block_stat[^>]*>\s*<span[^>]*dropcap[^>]*>([^<]*)</span>[^<]*"
        + label
    )
    label_first = (
        r"<p[^>]*block_stat[^>]*>[^<]*"
        + label
        + r"[^<]*<span[^>]*dropcap[^>]*>([^<]*)</span>"
    )
    text = F.trim(
        F.when(
            F.regexp_extract(col, span_first, 1) != "",
            F.regexp_extract(col, span_first, 1),
        ).otherwise(F.regexp_extract(col, label_first, 1))
    )
    return F.when(text == "", "N/A").otherwise(text)


def parse_well_pages(pages: DataFrame, html_col: str = "html") -> DataFrame:
    """Parse a DataFrame of stored detail pages into the reference's
    web_table columns (web_scraping.py:113-128 extract_required_fields).
    Keeps every non-HTML column as identity (well_name, api, ...)."""
    keep = [c for c in pages.columns if c != html_col]
    return pages.select(
        *keep,
        th_td_value(html_col, "Well Status").alias("well_status"),
        th_td_value(html_col, "Well Type").alias("well_type"),
        th_td_value(html_col, "Closest City").alias("closest_city"),
        badge_value(html_col, "Barrels of Oil Produced").alias("oil_badge"),
        badge_value(html_col, "MCF of Gas Produced").alias("gas_badge"),
    )
