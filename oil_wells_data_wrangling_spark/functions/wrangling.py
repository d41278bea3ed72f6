"""Column-level wrangling functions (reference parity, SURVEY.md §2.A).

Each mirrors a scalar helper in the reference, re-expressed as a pure
Catalyst column expression — JVM-side, whole-stage-codegen friendly, no
Python UDFs. At 100 TB these run inside the parquet scan stage.

Reference parity:
- norm_text       ← pdf_extraction.py:37-46  (_norm)
- clean_num       ← pdf_extraction.py:85-93 / 191-193 (clean_num)
- normalize_api   ← pdf_extraction.py:277-285 (normalize_api)
- dms_to_decimal  ← pdf_extraction.py:127-151 / pdf_to_db.py:109-134
- extract_inline / extract_next_line ← pdf_extraction.py:96-124
- na_to_null      ← web_scraping.py:251
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Unicode punctuation the reference normalizes (º˚→°, curly quotes→ascii,
# en/em-dash→hyphen, middle dot→period). translate() is a 1:1 char map.
_PUNCT_SRC = "º˚’′“”—–·"
_PUNCT_DST = "°°''\"\"--."


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def norm_text(col: Column | str) -> Column:
    """Normalize unicode punctuation and collapse runs of spaces/tabs."""
    return F.trim(
        F.regexp_replace(F.translate(_c(col), _PUNCT_SRC, _PUNCT_DST), "[ \t]+", " ")
    )


def clean_num(col: Column | str) -> Column:
    """Strip everything but digits and dots, parse as double (NULL on fail).

    ``try_cast`` (not ``cast``) because ANSI mode is on by default in
    Spark 4 and a stray ``1.2.3`` must yield NULL, not a query error.
    """
    return F.regexp_replace(_c(col), "[^0-9.]", "").try_cast("double")


def normalize_api(col: Column | str) -> Column:
    """Canonicalize an API well number to ``NN-NNN-NNNNN``.

    Accepts plain digit runs, dashed, or spaced groups; NULL when the
    digits don't form a valid 10-digit API number.
    """
    digits = F.regexp_replace(_c(col), "[^0-9]", "")
    ok = F.length(digits) == 10
    return F.when(
        ok,
        F.concat_ws(
            "-",
            F.substring(digits, 1, 2),
            F.substring(digits, 3, 3),
            F.substring(digits, 6, 5),
        ),
    )


_DMS_PAT = r"^([NSWE]?)\s*(\d{1,3})°\s*(\d{1,2})'\s*(\d{1,2}(?:\.\d+)?)\"?\s*([NSWE]?)$"
_DEC_PAT = r"^([NSWE]?)\s*(-?\d+(?:\.\d+)?)\s*([NSWE]?)$"


def dms_to_decimal(col: Column | str) -> Column:
    """Coordinate string → decimal degrees.

    Handles ``48° 12' 30" N`` (hemisphere prefix or suffix), plain
    decimals with optional hemisphere (``103.73 W``), and signed
    decimals. S/W hemispheres negate. NULL when unparseable.
    """
    s = norm_text(col)
    # DMS form
    dms_deg = F.regexp_extract(s, _DMS_PAT, 2)
    dms_min = F.regexp_extract(s, _DMS_PAT, 3)
    dms_sec = F.regexp_extract(s, _DMS_PAT, 4)
    dms_hemi = F.coalesce(
        F.nullif(F.regexp_extract(s, _DMS_PAT, 1), F.lit("")),
        F.nullif(F.regexp_extract(s, _DMS_PAT, 5), F.lit("")),
    )
    dms_val = (
        dms_deg.try_cast("double")
        + dms_min.try_cast("double") / F.lit(60.0)
        + dms_sec.try_cast("double") / F.lit(3600.0)
    )
    # Range guard (stricter than the reference, which accepts 99' 99"):
    # minutes/seconds must be < 60 for the DMS form to be meaningful.
    dms_valid = (dms_min.try_cast("double") < 60) & (dms_sec.try_cast("double") < 60)
    dms_val = F.when(dms_valid, dms_val)
    dms_signed = F.when(dms_hemi.isin("S", "W"), -F.abs(dms_val)).otherwise(dms_val)

    # plain decimal form
    dec_raw = F.nullif(F.regexp_extract(s, _DEC_PAT, 2), F.lit(""))
    dec_hemi = F.coalesce(
        F.nullif(F.regexp_extract(s, _DEC_PAT, 1), F.lit("")),
        F.nullif(F.regexp_extract(s, _DEC_PAT, 3), F.lit("")),
    )
    dec_val = dec_raw.try_cast("double")
    dec_signed = F.when(dec_hemi.isin("S", "W"), -F.abs(dec_val)).otherwise(dec_val)

    return F.when(F.nullif(dms_deg, F.lit("")).isNotNull(), dms_signed).otherwise(
        dec_signed
    )


def extract_inline(label_pattern: str, col: Column | str) -> Column:
    """Value on the SAME line after a label (``Label: value``). Empty → NULL."""
    return F.nullif(
        F.trim(F.regexp_extract(_c(col), label_pattern + r"\s*[:：\-]\s*([^\n\r]+)", 1)),
        F.lit(""),
    )


def extract_next_line(label_pattern: str, col: Column | str) -> Column:
    """Value on the NEXT line after a label-only line. Empty → NULL."""
    return F.nullif(
        F.trim(F.regexp_extract(_c(col), label_pattern + r"\s*\n\s*([^\n\r]+)", 1)),
        F.lit(""),
    )


def extract_field(label_pattern: str, col: Column | str) -> Column:
    """Reference fallback chain: same-line value, else next-line value."""
    return F.coalesce(
        extract_inline(label_pattern, col), extract_next_line(label_pattern, col)
    )


def extract_block(label_pattern: str, col: Column | str, max_lines: int = 5) -> Column:
    """Multi-line block after a label (pdf_extraction.py:194-208
    first_block_after): optional same-line remainder counts as the first
    line, leading blank lines after the label are skipped (the
    reference's greedy ``\\s*`` consumes them), and the block stops at
    the first blank/whitespace-only line, separator line of 3+ dashes or
    underscores, or ``max_lines``. Each line is stripped; lines join
    with real newlines. Empty → NULL."""
    line = r"[^\n]*[^ \t\n][^\n]*"  # at least one non-space char
    not_dashes_nl = r"(?![ \t]*[-_]{3,}[ \t]*\n)"
    not_dashes_end = r"(?![ \t]*[-_]{3,}[ \t]*(?:\n|$))"
    pat = (
        label_pattern
        + r"[:#]?\s*((?:"
        + not_dashes_nl
        + line
        + r"\n){0,"
        + str(max_lines - 1)
        + r"}"
        + not_dashes_end
        + line
        + r")"
    )
    raw = F.regexp_extract(_c(col), pat, 1)
    stripped = F.regexp_replace(
        F.regexp_replace(raw, r"[ \t]+\n", "\n"), r"\n[ \t]+", "\n"
    )
    return F.nullif(F.trim(stripped), F.lit(""))


def na_to_null(col: Column | str) -> Column:
    """Map the scraper's ``N/A`` / empty sentinels to NULL."""
    return F.when(F.trim(_c(col)).isin("N/A", "NA", "null", "none", ""), None).otherwise(
        _c(col)
    )
