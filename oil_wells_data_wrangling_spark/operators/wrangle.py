"""Wrangling operator family (SURVEY.md §2.A) — the reference's core.

The reference wrangles messy PDF-extracted text: labeled-regex field
extraction, DMS coordinate parsing, API-number canonicalization, numeric
sanitization, malformed-CSV repair, validation reports, upserts, and
enrichment joins (pdf_extraction.py, pdf_to_db.py, web_scraping.py,
app.py). Here each capability is an engine operator.

Test harness: the driver's tables contain no messy strings, so each
query *synthesizes* them deterministically from integer columns (never
from doubles — double→string formatting is engine-specific), parses
them back with the operator under test, and the DuckDB oracle recomputes
the expected values straight from the integers. The parser must recover
ground truth exactly — a stronger check than mirroring the parse SQL.

Scale: synthesis + parsing are pure column expressions inside one scan
stage (no shuffle, no UDF). The only exceptions: csv_repair (per-file
sequential semantics → applyInPandas per file, files parallel) and the
upsert/enrich ops (one shuffle each, broadcast where a side is small).
"""

from __future__ import annotations

import csv as _csv
import io
import re

import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from oil_wells_data_wrangling_spark.functions.exact import dsum, sql_dsum
from oil_wells_data_wrangling_spark.functions.wrangling import (
    clean_num,
    dms_to_decimal,
    extract_field,
    extract_inline,
    na_to_null,
    norm_text,
    normalize_api,
)
from oil_wells_data_wrangling_spark.plans.registry import register
from oil_wells_data_wrangling_spark.sources.readers import load_tables

def _K() -> Column:
    return F.col("c_custkey")


def _NL() -> Column:
    return F.lit("\n")


def _istr(c: Column) -> Column:
    return c.cast("string")


# ------------------------------------------------------------------ synthesis
# Messy raw strings derived from c_custkey (k). Mirrored in oracle CTEs as
# ground-truth *formulas* (the oracle never re-runs the parse).

def _lat_parts():
    return (40 + _K() % 15), (_K() % 60), ((7 * _K()) % 60), (13 * _K()) % 10000


def _lon_parts():
    return (95 + _K() % 20), ((3 * _K()) % 60), ((11 * _K()) % 60), (17 * _K()) % 10000


def _dms(deg: Column, mn: Column, sec: Column) -> Column:
    return F.concat(_istr(deg), F.lit("° "), _istr(mn), F.lit("' "), _istr(sec), F.lit('"'))


def _decstr(deg: Column, frac: Column) -> Column:
    return F.concat(_istr(deg), F.lit("."), F.lpad(_istr(frac), 4, "0"))


def _coord_raw(variant: Column, deg, mn, sec, frac, hemi: str, prefix_hemi: str) -> Column:
    """Four raw formats: DMS+suffix hemi, decimal+suffix hemi, prefix-hemi
    DMS (southern/western → negates), signed decimal."""
    return (
        F.when(variant == 0, F.concat(_dms(deg, mn, sec), F.lit(" " + hemi)))
        .when(variant == 1, F.concat(_decstr(deg, frac), F.lit(" " + hemi)))
        .when(variant == 2, F.concat(F.lit(prefix_hemi + " "), _dms(deg, mn, sec)))
        .otherwise(F.concat(F.lit("-"), _decstr(deg, frac)))
    )


def _api_raw() -> Column:
    county = F.lpad(_istr(_K() % 999), 3, "0")
    serial = F.lpad(_istr((11 * _K()) % 100000), 5, "0")
    short = F.lpad(_istr((11 * _K()) % 10000), 4, "0")  # 9-digit corrupt form
    v = _K() % 3
    return F.when(_K() % 13 == 0, F.concat(F.lit("33"), county, short)).otherwise(
        F.when(v == 0, F.concat(F.lit("33"), county, serial))
        .when(v == 1, F.concat_ws("-", F.lit("33"), county, serial))
        .otherwise(F.concat_ws(" ", F.lit("33"), county, serial))
    )


_API_RAW_SQL = """
  CASE WHEN k % 13 = 0
       THEN '33' || county || lpad(CAST((11*k) % 10000 AS VARCHAR), 4, '0')
       WHEN k % 3 = 0 THEN '33' || county || serial
       WHEN k % 3 = 1 THEN '33' || '-' || county || '-' || serial
       ELSE '33' || ' ' || county || ' ' || serial END
"""

_SYN_CTE = """
WITH syn AS (
  SELECT c_custkey AS doc_id, c_custkey AS k, c_name,
         40 + c_custkey % 15 AS latd, c_custkey % 60 AS latm,
         (7 * c_custkey) % 60 AS lats,
         CAST(40 + c_custkey % 15 AS VARCHAR) || '.' ||
           lpad(CAST((13 * c_custkey) % 10000 AS VARCHAR), 4, '0') AS latdec,
         95 + c_custkey % 20 AS lond, (3 * c_custkey) % 60 AS lonm,
         (11 * c_custkey) % 60 AS lons,
         CAST(95 + c_custkey % 20 AS VARCHAR) || '.' ||
           lpad(CAST((17 * c_custkey) % 10000 AS VARCHAR), 4, '0') AS londec,
         lpad(CAST(c_custkey % 999 AS VARCHAR), 3, '0') AS county,
         lpad(CAST((11 * c_custkey) % 100000 AS VARCHAR), 5, '0') AS serial,
         (37 * c_custkey) % 100000 AS n_psi
  FROM customer
)
"""

_LAT_TRUTH_SQL = """
  CASE k % 4 WHEN 0 THEN latd + latm/60.0 + lats/3600.0
             WHEN 1 THEN TRY_CAST(latdec AS DOUBLE)
             WHEN 2 THEN -(latd + latm/60.0 + lats/3600.0)
             ELSE -TRY_CAST(latdec AS DOUBLE) END
"""
_LON_TRUTH_SQL = """
  CASE (k+1) % 4 WHEN 0 THEN -(lond + lonm/60.0 + lons/3600.0)
                 WHEN 1 THEN -TRY_CAST(londec AS DOUBLE)
                 WHEN 2 THEN -(lond + lonm/60.0 + lons/3600.0)
                 ELSE -TRY_CAST(londec AS DOUBLE) END
"""
_API_TRUTH_SQL = """
  CASE WHEN k % 13 = 0 THEN NULL
       ELSE '33-' || county || '-' || serial END
"""


def _synth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-customer messy raw fields (parity with a parsed PDF doc)."""
    t = load_tables(spark, sf_dir)
    latd, latm, lats, latf = _lat_parts()
    lond, lonm, lons, lonf = _lon_parts()
    n_psi = (37 * _K()) % 100000
    num_raw = F.concat(
        F.when(
            n_psi >= 1000,
            F.concat(
                _istr(F.floor(n_psi / F.lit(1000)).cast("long")),
                F.lit(","),
                F.lpad(_istr(n_psi % 1000), 3, "0"),
            ),
        ).otherwise(_istr(n_psi)),
        F.when(_K() % 2 == 0, F.lit(" psi")).otherwise(F.lit(" PSI max")),
    )
    return (
        t.customer.join(F.broadcast(t.nation), _K() % 25 == F.col("n_nationkey"))
        .select(
            _K().alias("doc_id"),
            F.col("c_name"),
            F.col("n_name"),
            _coord_raw(_K() % 4, latd, latm, lats, latf, "N", "S").alias("lat_raw"),
            _coord_raw((_K() + 1) % 4, lond, lonm, lons, lonf, "W", "W").alias("lon_raw"),
            _api_raw().alias("api_raw"),
            num_raw.alias("num_raw"),
        )
    )


def _raw_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Assemble a raw multi-line 'document' per well, mixing same-line and
    next-line label styles like the reference's PDFs."""
    s = _synth(spark, sf_dir)
    job = F.when(
        F.col("doc_id") % 2 == 0,
        F.concat(F.lit("Job Type: "), F.col("n_name"), _NL()),
    ).otherwise(F.concat(F.lit("Job Type"), _NL(), F.col("n_name"), _NL()))
    text = F.concat(
        F.lit("Well Operator: "), F.col("c_name"), _NL(),
        job,
        F.lit("API No: "), F.col("api_raw"), _NL(),
        F.lit("Latitude: "), F.col("lat_raw"), _NL(),
        F.lit("Longitude: "), F.col("lon_raw"),
    )
    # Cache barrier: downstream field extractions each reference raw_text;
    # project collapsing would otherwise inline this whole synthesis into
    # every regexp (6× recompute + a >64KB janino method at sf0.1).
    return s.select("doc_id", text.alias("raw_text")).cache()


_SYN_NATION_SQL = "(SELECT n_name FROM nation WHERE n_nationkey = k % 25)"


# ------------------------------------------------------------ extract_fields

_EXTRACT_ORACLE = _SYN_CTE + f"""
SELECT doc_id,
       c_name AS operator,
       {_SYN_NATION_SQL} AS job_type,
       {_API_RAW_SQL} AS api_txt
FROM syn
"""


@register("extract_fields", oracle=_EXTRACT_ORACLE)
def extract_fields(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Labeled-regex extraction with the reference's same-line → next-line
    fallback chain (pdf_extraction.py:96-124,162-189), pure regexp_extract."""
    docs = _raw_docs(spark, sf_dir)
    return docs.select(
        "doc_id",
        extract_field("Well Operator", F.col("raw_text")).alias("operator"),
        extract_field("Job Type", F.col("raw_text")).alias("job_type"),
        extract_inline("API No", F.col("raw_text")).alias("api_txt"),
    )


# -------------------------------------------------------- parse_coordinates

_COORDS_ORACLE = _SYN_CTE + f"""
SELECT doc_id, {_LAT_TRUTH_SQL} AS latitude, {_LON_TRUTH_SQL} AS longitude
FROM syn
"""


@register("parse_coordinates", oracle=_COORDS_ORACLE)
def parse_coordinates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DMS / decimal / hemisphere coordinate parsing
    (pdf_extraction.py:127-151) as one codegen'd expression."""
    s = _synth(spark, sf_dir)
    return s.select(
        "doc_id",
        dms_to_decimal("lat_raw").alias("latitude"),
        dms_to_decimal("lon_raw").alias("longitude"),
    )


# ------------------------------------------------------------- normalize_api

_API_ORACLE = _SYN_CTE + f"SELECT doc_id, {_API_TRUTH_SQL} AS api FROM syn"


@register("api_canonical", oracle=_API_ORACLE)
def api_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """API well-number canonicalization (pdf_extraction.py:277-285)."""
    s = _synth(spark, sf_dir)
    return s.select("doc_id", normalize_api("api_raw").alias("api"))


# ----------------------------------------------------------------- clean_num

_CLEANNUM_ORACLE = _SYN_CTE + "SELECT doc_id, CAST(n_psi AS DOUBLE) AS psi FROM syn"


@register("numeric_sanitize", oracle=_CLEANNUM_ORACLE)
def numeric_sanitize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """clean_num parity (pdf_extraction.py:85-93): '1,234 psi' → 1234.0."""
    s = _synth(spark, sf_dir)
    return s.select("doc_id", clean_num("num_raw").alias("psi"))


# ----------------------------------------------------------------- norm_text

_NORMTEXT_ORACLE = """
SELECT c_custkey AS doc_id,
       'He said "' || c_name || '" - twice.' AS cleaned
FROM customer
"""


@register("text_normalize", oracle=_NORMTEXT_ORACLE)
def text_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unicode punctuation + whitespace normalization (_norm,
    pdf_extraction.py:37-46)."""
    t = load_tables(spark, sf_dir)
    messy = F.concat(
        F.lit("He said “"), F.col("c_name"), F.lit("”  —  twice·")
    )
    return t.customer.select(
        _K().alias("doc_id"), norm_text(messy).alias("cleaned")
    )


# ------------------------------------------------------------ normalize_keys

_NORMKEYS_ORACLE = """
SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment FROM customer
"""


def normalize_columns(df: DataFrame) -> DataFrame:
    """Schema normalization (pdf_to_db.py:75-92): strip BOM/space, lower,
    spaces→underscores, alias → canonical key. Metadata-only (no shuffle)."""
    aliases = {"pdf": "pdf_name", "filename": "pdf_name", "file_name": "pdf_name"}
    names = []
    for c in df.columns:
        nk = c.lstrip("﻿").strip().lower().replace(" ", "_")
        names.append(aliases.get(nk, nk))
    return df.toDF(*names)


@register("normalize_keys", oracle=_NORMKEYS_ORACLE)
def normalize_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    messy = t.customer.toDF(
        "﻿C CustKey", " C Name ", "C NationKey", "C AcctBal", "C MktSegment"
    )
    return normalize_columns(messy)


# ---------------------------------------------------------------- csv_repair

_CSVREPAIR_ORACLE = """
SELECT c_custkey,
       CASE WHEN c_custkey % 5 = 0
            THEN replace(c_name, 'Customer#', 'Customer' || chr(10) || '#')
            ELSE c_name END AS name,
       c_mktsegment AS segment
FROM customer
"""

_RECORD_START = re.compile(r'^\d+,"')


def _commas_outside_quotes(s: str) -> int:
    cnt, inq = 0, False
    for ch in s:
        if ch == '"':
            inq = not inq
        elif ch == "," and not inq:
            cnt += 1
    return cnt


def repair_csv_lines(lines: DataFrame, expected_commas: int, schema: str) -> DataFrame:
    """Reassemble records that were split across physical lines
    (pdf_to_db.py:24-73), quote-aware.

    Sequential semantics are per *file*; files repair in parallel —
    the same contract as Spark's own multiLine CSV reader. Arrow-batched
    applyInPandas, one task per file shard.
    """

    def _repair(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("line_no")
        out, buf = [], None
        for line in pdf["text"]:
            if buf is None:
                if _RECORD_START.match(line):
                    buf = line
                else:
                    continue
            else:
                buf += "\n" + line
            if _commas_outside_quotes(buf) >= expected_commas:
                out.append(buf)
                buf = None
        if buf is not None:
            out.append(buf)
        recs = []
        for rec in out:
            fields = next(_csv.reader(io.StringIO(rec)))
            # a truncated tail record (EOF inside an open quote) still
            # flushes — pad short rows instead of crashing the task
            fields = (fields + [None] * 3)[:3]
            recs.append((int(fields[0]), fields[1], fields[2]))
        return pd.DataFrame(recs, columns=["c_custkey", "name", "segment"])

    return lines.groupBy("file_id").applyInPandas(_repair, schema=schema)


@register("csv_repair")  # rows-only by structure; oracle below is exact
def csv_repair(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthesize a broken CSV (every 5th record's quoted name field contains
    a newline → record spans 2 physical lines), then repair + parse."""
    t = load_tables(spark, sf_dir)
    name_nl = F.when(
        _K() % 5 == 0,
        F.replace(F.col("c_name"), F.lit("Customer#"), F.lit("Customer\n#")),
    ).otherwise(F.col("c_name"))
    record = F.concat(
        _istr(_K()), F.lit(',"'), name_nl, F.lit('",'), F.col("c_mktsegment")
    )
    lines = (
        t.customer.select(_K().alias("k"), F.posexplode(F.split(record, "\n")))
        .select(
            (F.col("k") % 8).alias("file_id"),
            (F.col("k") * 4 + F.col("pos")).alias("line_no"),
            F.col("col").alias("text"),
        )
    )
    return repair_csv_lines(
        lines, expected_commas=2, schema="c_custkey long, name string, segment string"
    )


# set the exact oracle (separate from decorator for readability)
from oil_wells_data_wrangling_spark.plans.registry import REGISTRY as _REG  # noqa: E402

_REG["csv_repair"].oracle = _CSVREPAIR_ORACLE


# ------------------------------------------------------------ dirty + report

def _dirty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lat_raw with injected failures: every 11th empty, every 7th garbage.

    Cached: dms_to_decimal expands into ~12 regexp extractions over its
    input; inlining the synthesis CASE into each blows the 64KB codegen
    method limit (and re-evaluates the synthesis per extraction).
    """
    s = _synth(spark, sf_dir)
    k = F.col("doc_id")
    return s.withColumn(
        "lat_txt",
        F.when(k % 11 == 0, F.lit(""))
        .when(k % 7 == 0, F.lit("bad coord"))
        .otherwise(F.col("lat_raw")),
    ).cache()


_VALIDATE_ORACLE = _SYN_CTE + """
SELECT
  CAST(COUNT(*) AS BIGINT) AS rows_total,
  CAST(COUNT(CASE WHEN k % 11 = 0 THEN 1 END) AS BIGINT) AS lat_none,
  CAST(COUNT(CASE WHEN k % 11 <> 0 AND k % 7 = 0 THEN 1 END) AS BIGINT) AS lat_bad,
  CAST(COUNT(CASE WHEN k % 11 <> 0 AND k % 7 <> 0 THEN 1 END) AS BIGINT) AS lat_ok
FROM syn
"""


@register("validate_report", oracle=_VALIDATE_ORACLE)
def validate_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-pass data-quality report (pdf_to_db.py:259-299): null / bad /
    ok counts via conditional aggregation — one scan, one tiny result."""
    d = _dirty(spark, sf_dir)
    parsed = dms_to_decimal("lat_txt")
    is_none = F.trim(F.col("lat_txt")) == ""
    return d.agg(
        F.count(F.lit(1)).alias("rows_total"),
        F.count(F.when(is_none, 1)).alias("lat_none"),
        F.count(F.when(~is_none & parsed.isNull(), 1)).alias("lat_bad"),
        F.count(F.when(parsed.isNotNull(), 1)).alias("lat_ok"),
    )


_BADROWS_ORACLE = _SYN_CTE + """
SELECT doc_id, 'bad coord' AS lat_txt FROM syn
WHERE k % 11 <> 0 AND k % 7 = 0
"""


@register("bad_rows", oracle=_BADROWS_ORACLE)
def bad_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bad-row export (pdf_to_db.py:284-298): non-empty raw that fails the
    typed parse. Filter pushes into the scan."""
    d = _dirty(spark, sf_dir)
    parsed = dms_to_decimal("lat_txt")
    return d.filter((F.trim(F.col("lat_txt")) != "") & parsed.isNull()).select(
        "doc_id", "lat_txt"
    )


# -------------------------------------------------------------- upsert_latest

_UPSERT_ORACLE = """
SELECT user_id, event_type, event_id,
       make_timestamp(epoch_ns(ts) // 1000) AS ts, value
FROM (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY user_id, event_type
    ORDER BY make_timestamp(epoch_ns(ts) // 1000) DESC, event_id DESC
  ) AS rn FROM events
) WHERE rn = 1
"""


@register("upsert_latest", oracle=_UPSERT_ORACLE)
def upsert_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-write-wins upsert semantics (pdf_to_db.py:202-244's
    ON DUPLICATE KEY UPDATE) as a keyed window: one shuffle on the key,
    deterministic tie-break. This is how a 100 TB merge avoids any
    driver-side state."""
    t = load_tables(spark, sf_dir)
    w = Window.partitionBy("user_id", "event_type").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        t.events.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_type", "event_id", "ts", "value")
    )


# ----------------------------------------------------------- extract_repeated

_REPEATED_ORACLE = _SYN_CTE + """
SELECT doc_id,
       CAST(len(regexp_extract_all(
         'Stage Pressure: ' || CAST(8000 + k % 2000 AS VARCHAR) || chr(10) ||
         'Notes: ok' || chr(10) ||
         'Stage Pressure: ' || CAST(9000 + (3 * k) % 2000 AS VARCHAR) || chr(10) ||
         CASE WHEN k % 2 = 0
              THEN 'Stage Pressure: ' || CAST(7000 + (7 * k) % 2000 AS VARCHAR)
              ELSE 'End of report' END,
         'Stage Pressure: ([0-9]+)', 1)) AS BIGINT) AS n_readings,
       CAST(list_max(list_transform(regexp_extract_all(
         'Stage Pressure: ' || CAST(8000 + k % 2000 AS VARCHAR) || chr(10) ||
         'Notes: ok' || chr(10) ||
         'Stage Pressure: ' || CAST(9000 + (3 * k) % 2000 AS VARCHAR) || chr(10) ||
         CASE WHEN k % 2 = 0
              THEN 'Stage Pressure: ' || CAST(7000 + (7 * k) % 2000 AS VARCHAR)
              ELSE 'End of report' END,
         'Stage Pressure: ([0-9]+)', 1), x -> CAST(x AS BIGINT))) AS BIGINT)
         AS max_pressure
FROM syn
"""


@register("extract_repeated", oracle=_REPEATED_ORACLE)
def extract_repeated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ALL occurrences of a repeated label (the reference's finditer loop,
    pdf_extraction.py:162-189, e.g. per-stage pressure readings):
    regexp_extract_all → typed array → count / max, single scan."""
    t = load_tables(spark, sf_dir)
    k = _K()
    text = F.concat(
        F.lit("Stage Pressure: "), _istr(8000 + k % 2000), _NL(),
        F.lit("Notes: ok"), _NL(),
        F.lit("Stage Pressure: "), _istr(9000 + (3 * k) % 2000), _NL(),
        F.when(
            k % 2 == 0,
            F.concat(F.lit("Stage Pressure: "), _istr(7000 + (7 * k) % 2000)),
        ).otherwise(F.lit("End of report")),
    )
    readings = F.expr(
        "transform(regexp_extract_all(txt, 'Stage Pressure: ([0-9]+)', 1), "
        "x -> cast(x as bigint))"
    )
    return (
        t.customer.select(k.alias("doc_id"), text.alias("txt"))
        .select(
            "doc_id",
            F.size(readings).cast("bigint").alias("n_readings"),
            F.array_max(readings).alias("max_pressure"),
        )
    )


# ---------------------------------------------------------------- fuzzy_match

_FUZZY_ORACLE = """
WITH messy AS (
  SELECT c_custkey + 1000000 AS messy_id,
         CASE c_custkey % 3
           WHEN 0 THEN lower(c_name)
           WHEN 1 THEN replace(c_name, 'Customer#', 'Cust#')
           ELSE c_name || ' LLC' END AS messy_name,
         c_custkey % 100 AS blk
  FROM customer
),
canon AS (
  SELECT c_custkey, c_name, c_custkey % 100 AS blk FROM customer
),
scored AS (
  SELECT messy_id, c_custkey, levenshtein(messy_name, c_name) AS dist
  FROM messy JOIN canon USING (blk)
)
SELECT messy_id, c_custkey AS matched_custkey, CAST(dist AS INTEGER) AS dist
FROM (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY messy_id ORDER BY dist, c_custkey
  ) AS rk FROM scored
) WHERE rk = 1
"""


@register("fuzzy_match_names", oracle=_FUZZY_ORACLE)
def fuzzy_match_names(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy entity resolution: the reference joins scraped rows to
    extracted rows on raw (well_name, api) equality (web_scraping.py:
    287-294), which silently drops every formatting variant. Here messy
    name variants match their canonical record by minimum edit distance
    within a blocking key — the blocked join bounds comparisons, the
    window picks a deterministic best match."""
    t = load_tables(spark, sf_dir)
    # The blocked-pair stage is CPU-bound (one levenshtein per pair),
    # so pin the join's reduce-partition count to the executor core
    # count: AQE coalesces shuffle partitions by BYTES and the pair
    # rows are tiny, so it merged the edit-distance stage down to a
    # few tasks (measured 7.3s -> 1.5s at sf0.1/local[32] with the
    # pin). A keyed repartition on the join key adds NO extra
    # exchange — the join's own exchange takes the user-specified
    # count, which AQE leaves alone — and defaultParallelism scales
    # with the cluster, not with a local constant.
    par = spark.sparkContext.defaultParallelism
    messy = t.customer.select(
        (_K() + 1_000_000).alias("messy_id"),
        F.when(_K() % 3 == 0, F.lower("c_name"))
        .when(_K() % 3 == 1, F.replace(F.col("c_name"), F.lit("Customer#"), F.lit("Cust#")))
        .otherwise(F.concat(F.col("c_name"), F.lit(" LLC")))
        .alias("messy_name"),
        (_K() % 100).alias("blk"),
    ).repartition(par, "blk")
    canon = t.customer.select(
        F.col("c_custkey"), F.col("c_name"), (_K() % 100).alias("cblk")
    )
    scored = messy.join(canon, F.col("blk") == F.col("cblk")).select(
        "messy_id",
        "c_custkey",
        F.levenshtein("messy_name", "c_name").alias("dist"),
    )
    # best match = min over (dist, c_custkey) — an aggregation, not a
    # row_number window: struct min compares lexicographically, i.e.
    # exactly the window's (dist, c_custkey) order, and the partial
    # (map-side) min collapses the blocked pair fan-out BEFORE the
    # exchange, so the shuffle carries one candidate per (task,
    # messy_id) instead of every scored pair (r15; the window form
    # shuffled all |block|x|messy| rows to sort them).
    return (
        scored.groupBy("messy_id")
        .agg(F.min(F.struct("dist", "c_custkey")).alias("best"))
        .select(
            "messy_id",
            F.col("best.c_custkey").alias("matched_custkey"),
            F.col("best.dist").cast("int").alias("dist"),
        )
    )


# ------------------------------------------------------- enrichment (web join)

_ENRICH_ORACLE = f"""
WITH stats AS (
  SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS cnt,
         {sql_dsum('o_totalprice')} AS spend
  FROM orders GROUP BY o_custkey
)
SELECT c_custkey, c_name,
       CASE WHEN cnt IS NULL THEN NULL ELSE 'ACTIVE' END AS well_status,
       CASE WHEN cnt IS NULL OR cnt < 5 THEN NULL
            ELSE CAST(cnt AS VARCHAR) END AS oil_badge,
       CASE WHEN cnt IS NULL OR cnt < 8 THEN NULL
            ELSE CAST(cnt * 2 AS VARCHAR) END AS gas_badge
FROM customer LEFT JOIN stats ON c_custkey = o_custkey
"""


def _web_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scraped-attributes analog (web_scraping.py builds web_table with
    'N/A' sentinels for missing values)."""
    t = load_tables(spark, sf_dir)
    stats = t.orders.groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("cnt"), dsum("o_totalprice").alias("spend")
    )
    cnt = F.col("cnt")
    return (
        t.customer.select("c_custkey", "c_name")
        .join(stats, F.col("c_custkey") == F.col("o_custkey"), "left")
        .select(
            "c_custkey",
            "c_name",
            F.when(cnt.isNull(), "N/A").otherwise(F.lit("ACTIVE")).alias("well_status"),
            F.when(cnt.isNull() | (cnt < 5), "N/A")
            .otherwise(cnt.cast("string"))
            .alias("oil_badge"),
            F.when(cnt.isNull() | (cnt < 8), "N/A")
            .otherwise((cnt * 2).cast("string"))
            .alias("gas_badge"),
        )
    )


@register("enrich_join", oracle=_ENRICH_ORACLE)
def enrich_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Enrichment left-join + N/A→NULL (web_scraping.py:251,287-294).
    The scraped side is per-key aggregates → far smaller than the fact
    side → broadcast."""
    web = _web_table(spark, sf_dir)
    return web.select(
        "c_custkey",
        "c_name",
        na_to_null("well_status").alias("well_status"),
        na_to_null("oil_badge").alias("oil_badge"),
        na_to_null("gas_badge").alias("gas_badge"),
    )


# ----------------------------------------------------------------- na_to_null

_NA_ORACLE = """
SELECT c_custkey AS doc_id,
       CASE WHEN c_custkey % 5 IN (0, 1, 2, 3) THEN NULL
            ELSE 'OK-' || CAST(c_custkey AS VARCHAR) END AS well_status
FROM customer
"""


@register("sentinel_to_null", oracle=_NA_ORACLE)
def sentinel_to_null(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The scraper's missing-value sentinels ('N/A', 'NA', 'null', '')
    normalized to real NULLs (web_scraping.py:251) — pure nullif chain."""
    t = load_tables(spark, sf_dir)
    raw = (
        F.when(_K() % 5 == 0, F.lit("N/A"))
        .when(_K() % 5 == 1, F.lit("NA"))
        .when(_K() % 5 == 2, F.lit("null"))
        .when(_K() % 5 == 3, F.lit(""))
        .otherwise(F.concat(F.lit("OK-"), _istr(_K())))
    )
    return t.customer.select(
        _K().alias("doc_id"), na_to_null(raw).alias("well_status")
    )


# ---------------------------------------------------------------- serve_wells

_SERVE_ORACLE = _SYN_CTE + f"""
, coords AS (
  SELECT doc_id,
         CASE WHEN k % 11 = 0 OR k % 7 = 0 THEN NULL
              ELSE {_LAT_TRUTH_SQL} END AS latitude,
         {_LON_TRUTH_SQL} AS longitude
  FROM syn
), stats AS (
  SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS cnt FROM orders GROUP BY o_custkey
)
SELECT doc_id, latitude, longitude,
       CASE WHEN cnt IS NULL THEN NULL ELSE 'ACTIVE' END AS well_status
FROM coords
LEFT JOIN stats ON doc_id = o_custkey
WHERE latitude IS NOT NULL AND longitude IS NOT NULL
"""


@register("serve_wells", oracle=_SERVE_ORACLE)
def serve_wells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The app's serving query (app.py:21-28): enrich-joined wells with
    non-null coordinates. The null filter prunes before the join."""
    d = _dirty(spark, sf_dir)
    # Cache before the null filter: Catalyst pushes the filter below the
    # projection by substituting the parse expression, doubling generated
    # code past the 64KB method limit.
    coords = d.select(
        "doc_id",
        dms_to_decimal("lat_txt").alias("latitude"),
        dms_to_decimal("lon_raw").alias("longitude"),
    ).cache().filter(F.col("latitude").isNotNull() & F.col("longitude").isNotNull())
    t = load_tables(spark, sf_dir)
    stats = t.orders.groupBy("o_custkey").agg(F.count(F.lit(1)).alias("cnt"))
    return (
        coords.join(stats, F.col("doc_id") == F.col("o_custkey"), "left")
        .select(
            "doc_id",
            "latitude",
            "longitude",
            F.when(F.col("cnt").isNull(), None)
            .otherwise(F.lit("ACTIVE"))
            .alias("well_status"),
        )
    )


# --------------------------------------------------------------- extract_stim

_STIM_HDR = (
    r"Date Stimulated\s+Stimulated Formation\s+Top \(Ft\)\s+Bottom \(Ft\)\s+"
    r"Stimulation Stages\s+Volume\s+Volume Units"
)


def _stim_truth_cols(prefix: str = "") -> str:
    """Oracle ground-truth expressions for the synthesized stim table."""
    return f"""
  CASE WHEN k % 9 = 0 THEN NULL
       ELSE CAST(k % 12 + 1 AS VARCHAR) || '/' || CAST(k % 28 + 1 AS VARCHAR)
            || '/' || CAST(2015 + k % 8 AS VARCHAR) END AS {prefix}date_simulated,
  CASE WHEN k % 9 = 0 THEN NULL
       ELSE 'SHALE-' || CAST(k % 5 AS VARCHAR) END AS {prefix}formation,
  CASE WHEN k % 9 = 0 THEN NULL
       ELSE CAST(9000 + k % 900 AS DOUBLE) END AS {prefix}top_ft,
  CASE WHEN k % 9 = 0 THEN NULL
       ELSE CAST(9150 + k % 900 AS DOUBLE) END AS {prefix}bottom_ft,
  CASE WHEN k % 9 = 0 THEN NULL
       ELSE CAST(k % 50 + 1 AS BIGINT) END AS {prefix}stages,
  CASE WHEN k % 9 = 0 THEN NULL
       ELSE CAST((k * 29) % 90000 + 100 AS DOUBLE) END AS {prefix}volume,
  CASE WHEN k % 9 = 0 THEN NULL
       WHEN k % 2 = 0 THEN 'Barrels' ELSE 'Gallons' END AS {prefix}volume_units
"""


_STIM_ORACLE = _SYN_CTE + f"SELECT doc_id, {_stim_truth_cols()} FROM syn"


def _stim_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthesize the stimulation page: a whitespace-aligned table row
    under the reference's exact column-header line (every 9th doc has no
    stim block, like the reference's empty W11745 rows)."""
    t = load_tables(spark, sf_dir)
    k = _K()
    date_s = F.concat(
        _istr(k % 12 + 1), F.lit("/"), _istr(k % 28 + 1), F.lit("/"), _istr(2015 + k % 8)
    )
    vol = (k * 29) % 90000 + 100
    vol_fmt = F.when(
        vol >= 1000,
        F.concat(
            _istr(F.floor(vol / F.lit(1000)).cast("long")),
            F.lit(","),
            F.lpad(_istr(vol % 1000), 3, "0"),
        ),
    ).otherwise(_istr(vol))
    row = F.concat_ws(
        "  ",
        date_s,
        F.concat(F.lit("SHALE-"), _istr(k % 5)),
        _istr(9000 + k % 900),
        _istr(9150 + k % 900),
        _istr(k % 50 + 1),
        vol_fmt,
        F.when(k % 2 == 0, F.lit("Barrels")).otherwise(F.lit("Gallons")),
    )
    hdr = (
        "Date Stimulated  Stimulated Formation  Top (Ft)  Bottom (Ft)  "
        "Stimulation Stages  Volume  Volume Units"
    )
    text = F.when(k % 9 == 0, F.lit("Details\nno stimulation reported")).otherwise(
        F.concat(F.lit(hdr + "\n"), row, F.lit("\nDetails\nstandard job"))
    )
    return t.customer.select(k.alias("doc_id"), text.alias("stim_text")).cache()


@register("extract_stim", oracle=_STIM_ORACLE)
def extract_stim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stimulation-table extraction (pdf_extraction.py:343-382): locate
    the column-header line, take the next data row, split on 2+ spaces,
    type each column. The reference's second output table, as one scan."""
    docs = _stim_docs(spark, sf_dir)
    row = F.nullif(
        F.regexp_extract("stim_text", _STIM_HDR + r"\s*\n\s*([^\n]+)", 1), F.lit("")
    )
    cols = F.split(row, r" {2,}")
    parsed = docs.select(
        "doc_id",
        F.element_at(cols, 1).alias("date_simulated"),
        F.element_at(cols, 2).alias("formation"),
        clean_num(F.element_at(cols, 3)).alias("top_ft"),
        clean_num(F.element_at(cols, 4)).alias("bottom_ft"),
        clean_num(F.element_at(cols, 5)).cast("bigint").alias("stages"),
        clean_num(F.element_at(cols, 6)).alias("volume"),
        F.element_at(cols, 7).alias("volume_units"),
    ).cache()
    return parsed


# ------------------------------------------------------------ serve_wells_full

_SERVE_FULL_ORACLE = _SYN_CTE + f"""
SELECT doc_id, c_name AS operator,
       {_LAT_TRUTH_SQL} AS latitude,
       {_LON_TRUTH_SQL} AS longitude,
       {_stim_truth_cols()}
FROM syn
"""


@register("serve_wells_full", oracle=_SERVE_FULL_ORACLE)
def serve_wells_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The app's full serving query (app.py:21-28): well_info LEFT JOIN
    well_stimulation on the document key — header coordinates + operator
    plus every stimulation column, one co-partitioned join."""
    s = _synth(spark, sf_dir)
    header = s.select(
        "doc_id",
        F.col("c_name").alias("operator"),
        dms_to_decimal("lat_raw").alias("latitude"),
        dms_to_decimal("lon_raw").alias("longitude"),
    )
    stim = extract_stim(spark, sf_dir)
    return header.join(stim, "doc_id", "left")


# -------------------------------------------------------------- well_pipeline

_PIPELINE_ORACLE = _SYN_CTE + f"""
, stats AS (
  SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS cnt FROM orders GROUP BY o_custkey
)
SELECT doc_id,
       c_name AS operator,
       {_SYN_NATION_SQL} AS job_type,
       {_API_TRUTH_SQL} AS api,
       {_LAT_TRUTH_SQL} AS latitude,
       {_LON_TRUTH_SQL} AS longitude,
       CASE WHEN cnt IS NULL OR cnt < 5 THEN NULL
            ELSE CAST(cnt AS VARCHAR) END AS oil_badge
FROM syn LEFT JOIN stats ON doc_id = o_custkey
WHERE {_LAT_TRUTH_SQL} IS NOT NULL AND {_LON_TRUTH_SQL} IS NOT NULL
"""


@register("well_pipeline", oracle=_PIPELINE_ORACLE, headline=True)
def well_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship end-to-end (all four reference scripts composed): raw doc
    text → regex field extraction → coordinate/API/number normalization →
    enrichment join → serving filter. One scan of the raw docs, one small
    aggregate broadcast, zero Python in the row path."""
    docs = _raw_docs(spark, sf_dir)
    # Stage 1: regex extraction (raw strings). NOT cached: CollapseProject's
    # non-cheap-used-more-than-once guard already refuses to inline these
    # regexes into the coordinate parser's ~12 expansions, so extraction
    # runs once per row into a codegen local — the r3 extraction cache was
    # re-profiled in r12 (stage isolation, min-of-4, codegen-error sweep)
    # and cost ~0.2s of pure materialization overhead at sf0.1 while
    # preventing nothing.
    extracted = docs.select(
        "doc_id",
        extract_field("Well Operator", F.col("raw_text")).alias("operator"),
        extract_field("Job Type", F.col("raw_text")).alias("job_type"),
        extract_inline("API No", F.col("raw_text")).alias("api_str"),
        extract_inline("Latitude", F.col("raw_text")).alias("lat_str"),
        extract_inline("Longitude", F.col("raw_text")).alias("lon_str"),
    )
    # Stage 2: typed normalization on the small extracted strings.
    # Cached so the serve filter below doesn't substitute (and double)
    # the parse expressions past the 64KB codegen method limit — dropping
    # THIS barrier still blows codegen (measured: 8 janino 64KB fallbacks
    # and +0.5s in the r12 variant sweep).
    header = extracted.select(
        "doc_id",
        "operator",
        "job_type",
        normalize_api("api_str").alias("api"),
        dms_to_decimal("lat_str").alias("latitude"),
        dms_to_decimal("lon_str").alias("longitude"),
    ).cache()
    t = load_tables(spark, sf_dir)
    stats = t.orders.groupBy("o_custkey").agg(F.count(F.lit(1)).alias("cnt"))
    cnt = F.col("cnt")
    return (
        header.filter(F.col("latitude").isNotNull() & F.col("longitude").isNotNull())
        .join(stats, F.col("doc_id") == F.col("o_custkey"), "left")
        .select(
            "doc_id",
            "operator",
            "job_type",
            "api",
            "latitude",
            "longitude",
            F.when(cnt.isNull() | (cnt < 5), None)
            .otherwise(cnt.cast("string"))
            .alias("oil_badge"),
        )
    )
