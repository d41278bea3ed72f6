"""Edge-case unit tests for the scalar wrangling functions, with inputs
lifted from the reference's real CSVs (hemisphere suffixes, comma
thousands, unicode punctuation, malformed API numbers)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from oil_wells_data_wrangling_spark.functions.wrangling import (
    clean_num,
    dms_to_decimal,
    na_to_null,
    norm_text,
    normalize_api,
)


def _one(spark, col, value):
    return spark.createDataFrame([(value,)], ["s"]).select(col.alias("v")).first()["v"]


@pytest.mark.parametrize(
    "raw,expected",
    [
        ("48° 12' 30\" N", 48 + 12 / 60 + 30 / 3600),
        ("S 48° 12' 30\"", -(48 + 12 / 60 + 30 / 3600)),
        ("103.73 W", -103.73),
        ("W 103.73", -103.73),
        ("-103.6026139", -103.6026139),
        ("48.05735278", 48.05735278),
        ("48", 48.0),
        ("bad coord", None),
        ("", None),
        ("12° 99' 99\"", None),  # invalid minutes: falls through both forms
    ],
)
def test_dms_to_decimal(spark, raw, expected):
    got = _one(spark, dms_to_decimal(F.col("s")), raw)
    if expected is None:
        assert got is None
    else:
        assert got == pytest.approx(expected, abs=1e-12)


@pytest.mark.parametrize(
    "raw,expected",
    [
        ("33-053-02102", "33-053-02102"),
        ("3305302102", "33-053-02102"),
        ("33 053 02102", "33-053-02102"),
        ("330530210", None),  # 9 digits
        ("not an api", None),
        ("33-053-021029", None),  # 11 digits
    ],
)
def test_normalize_api(spark, raw, expected):
    assert _one(spark, normalize_api(F.col("s")), raw) == expected


@pytest.mark.parametrize(
    "raw,expected",
    [
        ("1,234.56 psi", 1234.56),
        ("9679", 9679.0),
        ("no digits", None),
        ("1.2.3", None),
        ("", None),
    ],
)
def test_clean_num(spark, raw, expected):
    assert _one(spark, clean_num(F.col("s")), raw) == expected


def test_norm_text(spark):
    got = _one(spark, norm_text(F.col("s")), "a“b”  —\tc·d’e")
    assert got == 'a"b" - c.d\'e'


@pytest.mark.parametrize(
    "raw,expected",
    [("N/A", None), ("NA", None), (" null ", None), ("", None), ("ok", "ok")],
)
def test_na_to_null(spark, raw, expected):
    assert _one(spark, na_to_null(F.col("s")), raw) == expected


def test_extract_block_multiline(spark):
    from oil_wells_data_wrangling_spark.functions.wrangling import extract_block

    txt = "Details\nline one\nline two\n\nAFTER BLANK\nmore"
    got = _one(spark, extract_block(r"\bDetails\b", F.col("s")), txt)
    assert got == "line one\nline two"  # stops at the blank line
    capped = _one(
        spark,
        extract_block(r"\bDetails\b", F.col("s"), max_lines=1),
        "Details\na\nb\nc",
    )
    assert capped == "a"
    assert _one(spark, extract_block(r"\bDetails\b", F.col("s")), "no label") is None


def test_extract_block_reference_parity(spark):
    """Mirrors the reference's first_block_after edge cases exactly
    (pdf_extraction.py:194-208, behavior verified empirically)."""
    from oil_wells_data_wrangling_spark.functions.wrangling import extract_block

    fn = extract_block(r"\bDetails\b", F.col("s"))
    # greedy \s* skips blank lines between label and content
    assert _one(spark, fn, "Details:\n\nSome text\nmore") == "Some text\nmore"
    # same-line remainder counts as the first block line
    assert _one(spark, fn, "Details: foo\nbar\n\nafter") == "foo\nbar"
    # whitespace-only line ends the block like a blank line
    assert _one(spark, fn, "Details\nline1\n   \nline3") == "line1"
    # a separator line of dashes/underscores ends the block
    assert _one(spark, fn, "Details\nline1\n----\nline3") == "line1"
    assert _one(spark, fn, "Details\nline1\n____\nline3") == "line1"
    # a line merely containing dashes is NOT a separator
    assert _one(spark, fn, "Details\nline1\n--x-\nline3") == "line1\n--x-\nline3"
    # per-line strip, like the reference's ln.strip()
    assert _one(spark, fn, "Details\n  padded  \nnext") == "padded\nnext"


def test_dsum_skips_non_finite_and_out_of_window(spark, duck):
    from oil_wells_data_wrangling_spark.functions.exact import dsum, sql_dsum

    vals = [1.5, float("nan"), float("inf"), float("-inf"), 2.25, None, 1e18]
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    got = df.agg(dsum("x").alias("s")).first()["s"]
    assert got == 3.75  # NaN/Inf/1e18 skipped, not folded to 0 or clamped

    duck.execute("CREATE OR REPLACE TABLE dsum_probe(x DOUBLE)")
    duck.executemany(
        "INSERT INTO dsum_probe VALUES (?)",
        [("nan",), ("inf",), ("-inf",)] + [(v,) for v in (1.5, 2.25, None, 1e18)],
    )
    oracle = duck.execute(
        f"SELECT {sql_dsum('x')} AS s FROM dsum_probe"
    ).fetchone()[0]
    assert oracle == got


def test_shingle_hashes_arrow_matches_sql_spec(spark, sf_dir):
    """decontaminate's Arrow shingle hasher must equal its SQL spec
    bit-for-bit on the shipped corpus — all-integer arithmetic (md5
    word hash + polynomial combine), so exact multiset equality, not a
    tolerance."""
    from oil_wells_data_wrangling_spark.operators.privacy import (
        shingle_hashes,
        shingle_hashes_sql,
    )
    from oil_wells_data_wrangling_spark.sources.readers import load_tables

    docs = load_tables(spark, sf_dir).documents.select("doc_id", "text")
    fast = shingle_hashes(docs).toPandas()
    spec = shingle_hashes_sql(docs).toPandas()
    key = lambda df: sorted(map(tuple, df[["doc_id", "h"]].to_numpy()))  # noqa: E731
    assert len(fast) == len(spec) > 0
    assert key(fast) == key(spec)


def test_shingle_hashes_arrow_matches_sql_spec_adversarial(spark):
    """Same bit-equality contract on adversarial text shapes the corpus
    never exercises: consecutive/leading/trailing spaces (empty words —
    split() keeps them in BOTH engines), sub-8-word docs (no output),
    exactly-8-word docs (one shingle), repeated words, unicode, and a
    doc that is all spaces."""
    from oil_wells_data_wrangling_spark.operators.privacy import (
        shingle_hashes,
        shingle_hashes_sql,
    )

    texts = [
        "a b c d e f g h",                       # exactly one shingle
        "a b c d e f g",                         # too short: no output
        "",                                      # empty text
        "        ",                              # all spaces: 9 empty words
        "a  b c d e f g h i",                    # double space -> empty word
        " a b c d e f g h ",                     # leading/trailing space
        "x x x x x x x x x x x x",               # repeated word
        "héllo wörld ünïcode ø æ ß µ 漢字 かな",   # non-ascii
        ("w1 " * 40).strip(),                    # longer uniform doc
    ]
    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    ).repartition(3)
    fast = shingle_hashes(docs).toPandas()
    spec = shingle_hashes_sql(docs).toPandas()
    key = lambda df: sorted(map(tuple, df[["doc_id", "h"]].to_numpy()))  # noqa: E731
    assert key(fast) == key(spec)
    # too-short docs must emit nothing from either path
    emitted = set(fast["doc_id"])
    assert 1 not in emitted and 2 not in emitted
    # 8 spaces split to 9 empty words -> 2 shingles, in BOTH engines
    assert 0 in emitted and 3 in emitted
