"""CSV well-table source with the reference's cleaning semantics.

Parity with pdf_to_db.py:
- open_and_sniff / DictReader      → spark.read.csv with header+quote opts
- normalize_keys_and_alias (75-92) → normalize_columns (metadata-only)
- find_col_name lat/lon hints (94-107) → discover_coord_columns
- to_decimal (109-134)             → dms_to_decimal / clean coordinate cast

Reads the reference's own well_header.csv / well_stimulation.csv files
unchanged (tests do exactly that when the files are present).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from oil_wells_data_wrangling_spark.functions.wrangling import dms_to_decimal
from oil_wells_data_wrangling_spark.operators.wrangle import normalize_columns

_LAT_HINTS = ("lat", "latitude", "lat (dec)", "y (lat)")
_LON_HINTS = ("lon", "long", "longitude", "lng", "x (lon)")


def discover_coord_columns(columns: list[str]) -> tuple[str | None, str | None]:
    """Find the latitude/longitude columns by exact name then hint
    (pdf_to_db.py:94-107)."""

    def find(preferred: str, hints: tuple[str, ...]) -> str | None:
        lower = {c: c.strip().lower() for c in columns}
        for c, low in lower.items():
            if low == preferred:
                return c
        for c, low in lower.items():
            if any(h in low for h in hints):
                return c
        return None

    return find("latitude", _LAT_HINTS), find("longitude", _LON_HINTS)


def read_well_csv(spark: SparkSession, path: str) -> DataFrame:
    """Load a well CSV: multiline-quoted records, normalized column keys,
    lat/lon discovered and parsed to decimal degrees (DMS tolerated)."""
    raw = spark.read.csv(
        path,
        header=True,
        multiLine=True,
        escape='"',
        mode="PERMISSIVE",
    )
    df = normalize_columns(raw)
    lat_col, lon_col = discover_coord_columns(df.columns)
    if lat_col:
        df = df.withColumn("latitude", dms_to_decimal(F.col(lat_col)))
    if lon_col:
        df = df.withColumn("longitude", dms_to_decimal(F.col(lon_col)))
    return df
