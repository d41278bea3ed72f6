"""Fixed-width flat-file source — the mainframe/regulator-export format
well-header data classically ships in (state agencies publish
column-position layouts rather than CSV). Parity role: the same front
door as ``csv_wells`` for position-delimited files.

Design: ``spark.read.text`` delivers raw lines; all slicing, trimming,
typing and repair flags are in-scan ``substring``/``trim``/``cast``
expressions — one WholeStageCodegen projection per file, no Python in
the row path. Records that are too short for the layout, or whose typed
fields fail to cast, route to a ``bad`` side output with a reason
(jsonl.py's corrupt-line contract), so ingestion never silently drops
or nulls a row the layout says should parse.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


@dataclass(frozen=True)
class FwField:
    """One column of the layout: 1-based start position, width, and the
    Spark SQL type to cast to ('string' fields only trim)."""

    name: str
    start: int
    width: int
    dtype: str = "string"


def _min_line_len(layout: list[FwField]) -> int:
    return max(f.start + f.width - 1 for f in layout)


def read_fixed_width(
    spark: SparkSession, path: str, layout: list[FwField]
) -> tuple[DataFrame, DataFrame]:
    """Read a fixed-width file into (good, bad) frames.

    good: one typed column per layout field (strings trimmed; empty →
    NULL). bad: (line, reason) for records shorter than the layout or
    with at least one uncastable typed field — the caller decides
    whether to repair or quarantine, exactly like jsonl.py's corrupt
    branch.
    """
    raw = spark.read.text(path)
    min_len = _min_line_len(layout)

    sliced = raw.select(
        "value",
        (F.length("value") >= min_len).alias("_long_enough"),
        *[
            F.trim(
                F.substring("value", f.start, f.width)
            ).alias(f"_raw_{f.name}")
            for f in layout
        ],
    )
    typed = sliced.select(
        "value",
        "_long_enough",
        *[
            (
                F.when(F.col(f"_raw_{f.name}") == "", None)
                .otherwise(F.col(f"_raw_{f.name}"))
                .alias(f.name)
                if f.dtype == "string"
                else F.when(F.col(f"_raw_{f.name}") == "", None)
                .otherwise(F.col(f"_raw_{f.name}").try_cast(f.dtype))
                .alias(f.name)
            )
            for f in layout
        ],
        *[
            (
                # try_cast: ANSI mode makes plain cast THROW on bad
                # input — the repair contract needs NULL-and-flag
                (F.col(f"_raw_{f.name}") != "")
                & F.col(f"_raw_{f.name}").try_cast(f.dtype).isNull()
            ).alias(f"_badcast_{f.name}")
            for f in layout
            if f.dtype != "string"
        ],
    )
    badcast_cols = [c for c in typed.columns if c.startswith("_badcast_")]
    any_badcast = (
        F.greatest(*[F.col(c).cast("int") for c in badcast_cols]) == 1
        if badcast_cols
        else F.lit(False)
    )
    good = typed.filter(F.col("_long_enough") & ~any_badcast).select(
        *[f.name for f in layout]
    )
    bad = typed.filter(~F.col("_long_enough") | any_badcast).select(
        F.col("value").alias("line"),
        F.when(~F.col("_long_enough"), F.lit("short_record"))
        .otherwise(F.lit("bad_cast"))
        .alias("reason"),
    )
    return good, bad


def render_fixed_width(df: DataFrame, layout: list[FwField]) -> DataFrame:
    """The inverse (used by tests and export): render rows to layout
    lines with rpad — values longer than their field width are an
    ERROR surfaced as NULL lines rather than silent truncation."""
    parts = []
    for f in layout:
        s = F.coalesce(F.col(f.name).cast("string"), F.lit(""))
        parts.append(
            F.when(F.length(s) > f.width, None).otherwise(
                F.rpad(s, f.width, " ")
            )
        )
    return df.select(F.concat(*parts).alias("value"))
