"""Scrape-connector parse operator (SURVEY.md §2.A connector edge).

Exercises sources/html_table.py — the pure DOM-read half of the
reference's scraper (web_scraping.py:80-128) — as an oracle-checked
query: deterministic detail-page HTML is generated per supplier row
(nested tags, doubled whitespace, a missing field, and both badge
orderings), parsed back with the Spark-side regex chain, and the
DuckDB oracle replays the identical generation + RE2-compatible parse.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from oil_wells_data_wrangling_spark.plans.registry import register
from oil_wells_data_wrangling_spark.sources.html_table import parse_well_pages
from oil_wells_data_wrangling_spark.sources.readers import load_tables

_HTML_TABLE_ORACLE = r"""
WITH pages AS (
  SELECT s_suppkey,
    '<table><tr><th>Well Status</th><td><b>'
    || CASE CAST(s_suppkey % 3 AS INT) WHEN 0 THEN 'Active'
            WHEN 1 THEN 'Plugged' ELSE 'Drilling' END
    || '</b></td></tr><tr><th>Well Type</th><td>Oil  Well</td></tr>'
    || CASE WHEN s_suppkey % 5 <> 0
            THEN '<tr><th>Closest City</th><td>City '
                 || CAST(s_suppkey AS VARCHAR) || '</td></tr>'
            ELSE '' END
    || '</table><p class="block_stat"><span class="dropcap">'
    || CAST(s_suppkey * 37 % 1000 AS VARCHAR)
    || '</span> Barrels of Oil Produced</p>'
    || '<p class="block_stat">MCF of Gas Produced <span class="dropcap">'
    || CAST(s_suppkey * 53 % 1000 AS VARCHAR) || '</span></p>' AS html
  FROM supplier
),
raw AS (
  SELECT s_suppkey,
    trim(regexp_replace(regexp_replace(
      regexp_extract(html,
        '(?s)<th[^>]*>\s*Well Status\s*</th>\s*<td[^>]*>(.*?)</td>', 1),
      '<[^>]+>', ' ', 'g'), '\s+', ' ', 'g')) AS ws,
    trim(regexp_replace(regexp_replace(
      regexp_extract(html,
        '(?s)<th[^>]*>\s*Well Type\s*</th>\s*<td[^>]*>(.*?)</td>', 1),
      '<[^>]+>', ' ', 'g'), '\s+', ' ', 'g')) AS wt,
    trim(regexp_replace(regexp_replace(
      regexp_extract(html,
        '(?s)<th[^>]*>\s*Closest City\s*</th>\s*<td[^>]*>(.*?)</td>', 1),
      '<[^>]+>', ' ', 'g'), '\s+', ' ', 'g')) AS cc,
    trim(regexp_extract(html,
      '<p[^>]*block_stat[^>]*>\s*<span[^>]*dropcap[^>]*>([^<]*)</span>[^<]*Barrels of Oil Produced',
      1)) AS oil,
    trim(regexp_extract(html,
      '<p[^>]*block_stat[^>]*>[^<]*MCF of Gas Produced[^<]*<span[^>]*dropcap[^>]*>([^<]*)</span>',
      1)) AS gas
  FROM pages
)
SELECT s_suppkey,
  CASE WHEN ws = '' THEN 'N/A' ELSE ws END AS well_status,
  CASE WHEN wt = '' THEN 'N/A' ELSE wt END AS well_type,
  CASE WHEN cc = '' THEN 'N/A' ELSE cc END AS closest_city,
  CASE WHEN oil = '' THEN 'N/A' ELSE oil END AS oil_badge,
  CASE WHEN gas = '' THEN 'N/A' ELSE gas END AS gas_badge
FROM raw
"""


@register("html_table", oracle=_HTML_TABLE_ORACLE)
def html_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Generate detail-page HTML per supplier row and parse it back with
    the scrape connector's th/td + badge extraction. Single scan, all
    JVM-side regex — the shape a stored-crawl parse has at scale."""
    t = load_tables(spark, sf_dir)
    k = F.col("s_suppkey")
    status = (
        F.when(k % 3 == 0, "Active")
        .when(k % 3 == 1, "Plugged")
        .otherwise("Drilling")
    )
    html = F.concat(
        F.lit('<table><tr><th>Well Status</th><td><b>'),
        status,
        F.lit("</b></td></tr><tr><th>Well Type</th><td>Oil  Well</td></tr>"),
        F.when(
            k % 5 != 0,
            F.concat(
                F.lit("<tr><th>Closest City</th><td>City "),
                k.cast("string"),
                F.lit("</td></tr>"),
            ),
        ).otherwise(F.lit("")),
        F.lit('</table><p class="block_stat"><span class="dropcap">'),
        (k * 37 % 1000).cast("string"),
        F.lit("</span> Barrels of Oil Produced</p>"),
        F.lit('<p class="block_stat">MCF of Gas Produced <span class="dropcap">'),
        (k * 53 % 1000).cast("string"),
        F.lit("</span></p>"),
    )
    pages = t.supplier.select("s_suppkey", html.alias("html"))
    return parse_well_pages(pages)


# --------------------------------------------------------------- html_to_text

# The WET-extraction stage every web corpus runs before any text
# operator (the reference's scraper reads structured cells out of known
# markup — web_scraping.py:80-128; a TRAINING pipeline instead needs
# whole-page text): drop <script>/<style> blocks wholesale, strip the
# remaining tags, collapse whitespace, and keep the link inventory as
# scalars. Spark's Java regex and DuckDB's RE2 agree on every pattern
# used here ((?s) dotall, non-greedy .*?, [^>]+ classes), which is what
# makes the oracle exact — the same property html_table relies on.

_H2T_PAGE_SPARK = (
    "concat('<html><head><title>Doc ', cast(doc_id as string), '</title>',"
    " '<script type=\"text/javascript\">var id = ', cast(doc_id as string),"
    " ';</script><style>p { margin: 0 }</style></head>',"
    " '<body><h1>Doc ', cast(doc_id as string), '</h1>',"
    " '<div class=\"nav\">Home | About | <a href=\"/home\">x</a></div>',"
    " '<p>', text, '</p>',"
    " '<a href=\"https://example.com/d/', cast(doc_id as string), '\">next</a>',"
    " case when doc_id % 3 = 0 then concat('<a href=\"https://example.com/d/',"
    " cast(doc_id + 1 as string), '\">more</a>') else '' end,"
    " '<footer>(c) corpus</footer></body></html>')"
)

_H2T_PAGE_DUCK = """
    '<html><head><title>Doc ' || CAST(doc_id AS VARCHAR) || '</title>'
    || '<script type="text/javascript">var id = ' || CAST(doc_id AS VARCHAR)
    || ';</script><style>p { margin: 0 }</style></head>'
    || '<body><h1>Doc ' || CAST(doc_id AS VARCHAR) || '</h1>'
    || '<div class="nav">Home | About | <a href="/home">x</a></div>'
    || '<p>' || text || '</p>'
    || '<a href="https://example.com/d/' || CAST(doc_id AS VARCHAR) || '">next</a>'
    || CASE WHEN doc_id % 3 = 0 THEN '<a href="https://example.com/d/'
         || CAST(doc_id + 1 AS VARCHAR) || '">more</a>' ELSE '' END
    || '<footer>(c) corpus</footer></body></html>'
"""

_H2T_ORACLE = rf"""
WITH pages AS (
  SELECT doc_id, {_H2T_PAGE_DUCK} AS html FROM documents
),
stripped AS (
  SELECT doc_id, html,
    trim(regexp_replace(regexp_replace(regexp_replace(regexp_replace(html,
      '(?s)<script[^>]*>.*?</script>', ' ', 'g'),
      '(?s)<style[^>]*>.*?</style>', ' ', 'g'),
      '<[^>]+>', ' ', 'g'),
      '\s+', ' ', 'g')) AS clean
  FROM pages
)
SELECT doc_id,
       regexp_extract(html, '<title>([^<]*)</title>', 1) AS title,
       CAST(len(regexp_extract_all(html, 'href="[^"]*"')) AS BIGINT) AS n_links,
       CAST(length(clean) AS BIGINT) AS n_chars,
       md5(clean) AS clean_fp
FROM stripped
"""


@register("html_to_text", oracle=_H2T_ORACLE)
def html_to_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HTML → text extraction over a synthesized page per document
    (title + script + style + nav + body + per-page links — every
    boilerplate class a crawler sees): script/style blocks drop
    WHOLESALE (their content must never leak into training text),
    remaining tags strip to spaces, whitespace collapses, and the link
    inventory survives as a count. Output carries scalars and the
    md5 of the clean text, not the page.

    Downstream chain: this feeds `boilerplate_lines` (template-line
    removal), `lang_id`/`quality_score` (filtering), then the dedup
    family — the standard web-corpus front door.

    Scale shape: pure in-scan regex (whole-stage codegen, no UDF, no
    Python); the only exchange is whatever the consumer adds. Pages
    stay in the scan — the output is 5 scalars/doc."""
    t = load_tables(spark, sf_dir)
    pages = t.documents.select(
        "doc_id", F.expr(_H2T_PAGE_SPARK).alias("html")
    )
    clean = F.trim(
        F.regexp_replace(
            F.regexp_replace(
                F.regexp_replace(
                    F.regexp_replace(
                        F.col("html"), r"(?s)<script[^>]*>.*?</script>", " "
                    ),
                    r"(?s)<style[^>]*>.*?</style>",
                    " ",
                ),
                r"<[^>]+>",
                " ",
            ),
            r"\s+",
            " ",
        )
    )
    stripped = pages.select("doc_id", "html", clean.alias("clean"))
    return stripped.select(
        "doc_id",
        F.regexp_extract("html", r"<title>([^<]*)</title>", 1).alias("title"),
        F.expr("regexp_count(html, 'href=\"[^\"]*\"')")
        .cast("bigint")
        .alias("n_links"),
        F.length("clean").cast("bigint").alias("n_chars"),
        F.md5("clean").alias("clean_fp"),
    )


# --------------------------------------------------------------- warc_pipeline

_WARC_PIPE_ORACLE = rf"""
WITH pages AS (
  SELECT doc_id, {_H2T_PAGE_DUCK} AS html FROM documents
),
stripped AS (
  SELECT doc_id, html,
    trim(regexp_replace(regexp_replace(regexp_replace(regexp_replace(html,
      '(?s)<script[^>]*>.*?</script>', ' ', 'g'),
      '(?s)<style[^>]*>.*?</style>', ' ', 'g'),
      '<[^>]+>', ' ', 'g'),
      '\s+', ' ', 'g')) AS clean
  FROM pages
)
SELECT doc_id,
       CAST(200 AS INTEGER) AS http_status,
       'text/html' AS content_type,
       regexp_extract(html, '<title>([^<]*)</title>', 1) AS title,
       CAST(len(regexp_extract_all(html, 'href="[^"]*"')) AS BIGINT) AS n_links,
       CAST(length(clean) AS BIGINT) AS n_chars,
       md5(clean) AS clean_fp
FROM stripped
"""


@register("warc_pipeline", oracle=_WARC_PIPE_ORACLE)
def warc_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The crawl front door END-TO-END through a real archive: pages
    are written as genuine WARC/1.0 response records (full HTTP
    envelope) with ``write_warc``, read back with ``read_warc``'s
    binaryFile + Arrow parse, the HTTP envelope split promotes
    status/Content-Type to columns, and the payload bytes flow through
    the SAME strip chain as ``html_to_text`` — so the bytes the
    operators see really did round-trip ISO 28500, not a synthesized
    HTML column. The oracle replays the page synthesis + extraction
    arithmetic directly over ``documents`` (envelope columns are the
    literals ``write_warc`` stamps), which stays exact because the
    archive hop is content-preserving by construction.

    Scale shape: ``write_warc`` emits one archive file per partition
    on the executor that owns it and ``read_warc`` re-parallelizes on
    the file inventory (CommonCrawl's own sharding unit) — no shuffle
    anywhere in the round trip; the strip chain runs in-scan on the
    decoded payload and only 7 scalars/doc leave it.

    Demo-harness caveat (the ``neardup_index_probe`` pattern): the
    registered query wires the archive to a driver-local tempdir and
    writes it eagerly at plan construction; production passes a shared
    URI and reads crawls it didn't write."""
    import os
    import shutil
    import tempfile

    from oil_wells_data_wrangling_spark.sources.warc import (
        read_warc,
        write_warc,
    )

    t = load_tables(spark, sf_dir)
    pages = t.documents.select(
        "doc_id",
        F.concat(
            F.lit("https://example.com/d/"), F.col("doc_id").cast("string")
        ).alias("target_uri"),
        F.expr(_H2T_PAGE_SPARK).alias("html"),
    )
    work = tempfile.mkdtemp(prefix="warc_pipe_")
    arch = os.path.join(work, "crawl")
    write_warc(pages, arch).collect()
    resp = read_warc(spark, arch).filter(
        (F.col("warc_type") == "response") & (F.col("http_status") == 200)
    )
    page2 = resp.select(
        F.regexp_extract("target_uri", r"/d/(\d+)$", 1)
        .cast("bigint")
        .alias("doc_id"),
        "http_status",
        "content_type",
        F.col("payload").cast("string").alias("html"),
    )
    clean = F.trim(
        F.regexp_replace(
            F.regexp_replace(
                F.regexp_replace(
                    F.regexp_replace(
                        F.col("html"), r"(?s)<script[^>]*>.*?</script>", " "
                    ),
                    r"(?s)<style[^>]*>.*?</style>",
                    " ",
                ),
                r"<[^>]+>",
                " ",
            ),
            r"\s+",
            " ",
        )
    )
    out = (
        page2.select(
            "doc_id", "http_status", "content_type", "html", clean.alias("clean")
        )
        .select(
            "doc_id",
            "http_status",
            "content_type",
            F.regexp_extract("html", r"<title>([^<]*)</title>", 1).alias(
                "title"
            ),
            F.expr("regexp_count(html, 'href=\"[^\"]*\"')")
            .cast("bigint")
            .alias("n_links"),
            F.length("clean").cast("bigint").alias("n_chars"),
            F.md5("clean").alias("clean_fp"),
        )
        .localCheckpoint(eager=True)
    )
    shutil.rmtree(work, ignore_errors=True)
    return out
