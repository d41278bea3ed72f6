"""The reference's end-to-end workflow, composed from engine operators.

Parity map (a reference user can run the same flow here):
- pdf_extraction.py  →  extract_well_tables: folder → header + stim
  DataFrames with the reference's exact field set and fallback chains
  (RX_* regexes at pdf_extraction.py:213-236, parse_header:288-316,
  parse_stimulation:343-467).
- pdf_to_db.py       →  load_well_tables: keyed upsert into parquet
  tables (MySQL ON DUPLICATE KEY UPDATE parity).
- web_scraping.py    →  build_well_info: left join scraped attributes on
  (well_name, api), N/A → NULL (web_scraping.py:251,287-294).
- app.py             →  wells_json: well_info ⋈ stimulation, non-null
  coordinates, JSON rows (app.py:21-31).

Everything distributed: extraction is one binaryFile scan + one
projection; loads are keyed merges; serving is a broadcast join.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from oil_wells_data_wrangling_spark.functions.wrangling import (
    clean_num,
    dms_to_decimal,
    extract_block,
    extract_field,
    extract_inline,
    na_to_null,
    normalize_api,
)
from oil_wells_data_wrangling_spark.sources.pdf_source import read_document_folder
from oil_wells_data_wrangling_spark.sources.sinks import upsert_parquet


def extract_well_tables(
    spark: SparkSession, folder: str
) -> tuple[DataFrame, DataFrame]:
    """Folder of documents → (well_header, well_stimulation) DataFrames
    with the reference's column sets."""
    docs = read_document_folder(spark, folder).cache()
    txt = F.col("raw_text")
    header = docs.select(
        F.col("doc_name").alias("pdf_name"),
        extract_field(r"(?:Well\s+Operator|Operator|Responsible\s+Party)", txt).alias(
            "operator"
        ),
        extract_field(r"Well\s*(?:Name|or\s*Facility\s*Name)", txt).alias("well_name"),
        normalize_api(
            F.regexp_extract(
                txt,
                r"(?:API\s*(?:#|No\.?)?|Well\s*File\s*No\.?)\s*[:\-]?\s*"
                r"([0-9]{5,}|\d{2}\s*-\s*\d{3}\s*-\s*\d{5})",
                1,
            )
        ).alias("api"),
        extract_field(r"Enseco\s*Job#?", txt).alias("enseco_job"),
        extract_field(r"Job\s*Type", txt).alias("job_type"),
        extract_field(r"County\s*,\s*State", txt).alias("county_state"),
        extract_field(r"Well\s*Surface\s*Hole\s*Location\s*\(SHL\)", txt).alias("shl"),
        dms_to_decimal(extract_inline(r"Latitude", txt)).alias("latitude"),
        dms_to_decimal(extract_inline(r"Longitude", txt)).alias("longitude"),
        extract_field(r"Datum", txt).alias("datum"),
    )
    stim = docs.select(
        F.col("doc_name").alias("pdf_name"),
        F.regexp_extract(
            extract_field(r"Date\s*Stimulated", txt),
            r"\d{1,2}[/-]\d{1,2}[/-]\d{2,4}",
            0,
        ).alias("date_simulated"),
        extract_field(r"Stimulated\s*Formation", txt).alias("stimulated_formation"),
        extract_field(r"Type\s*Treatment", txt).alias("type_treatment"),
        clean_num(extract_field(r"Acid\s*%", txt)).alias("acid_pct"),
        clean_num(extract_field(r"Lbs\s*Proppant", txt)).alias("lbs_proppant"),
        clean_num(extract_field(r"Top\s*\(Ft\)", txt)).alias("top_ft"),
        clean_num(extract_field(r"Bottom\s*\(Ft\)", txt)).alias("bottom_ft"),
        clean_num(extract_field(r"Stimulation\s*Stages", txt)).alias(
            "stimulation_stages"
        ),
        clean_num(extract_field(r"\bVolume\b(?!\s*Units)", txt)).alias("volume"),
        extract_field(r"Volume\s*Units", txt).alias("volume_units"),
        clean_num(
            extract_field(r"Maximum\s*Treatment\s*Pressure\s*\(PSI\)", txt)
        ).alias("max_pressure_psi"),
        clean_num(
            extract_field(r"Maximum\s*Treatment\s*Rate\s*\(BBLS/?Min\)", txt)
        ).alias("max_treatment_rate_bbls_min"),
        extract_block(r"\bDetails\b", txt, max_lines=5).alias("details"),
    )
    return header, stim


def load_well_tables(
    header: DataFrame, stim: DataFrame, out_dir: str
) -> tuple[str, str]:
    """Upsert both tables into parquet keyed on pdf_name (pdf_to_db.py
    parity: re-running the load is idempotent, newer extractions win)."""
    header_path = os.path.join(out_dir, "well_header")
    stim_path = os.path.join(out_dir, "well_stimulation")
    upsert_parquet(
        header.withColumn("__v", F.lit(0)), header_path, keys=["pdf_name"], version_col="__v"
    )
    upsert_parquet(
        stim.withColumn("__v", F.lit(0)), stim_path, keys=["pdf_name"], version_col="__v"
    )
    return header_path, stim_path


def build_well_info(header: DataFrame, web: DataFrame) -> DataFrame:
    """well_info = header LEFT JOIN scraped attrs on (well_name, api),
    sentinels normalized to NULL (web_scraping.py:287-294)."""
    scraped = web.select(
        F.col("well_name").alias("w_name"),
        F.col("api").alias("w_api"),
        *[
            na_to_null(c).alias(c)
            for c in ("well_status", "well_type", "closest_city", "oil_badge", "gas_badge")
            if c in web.columns
        ],
    )
    return header.join(
        F.broadcast(scraped),
        (F.col("well_name") == F.col("w_name")) & (F.col("api") == F.col("w_api")),
        "left",
    ).drop("w_name", "w_api")


def wells_json(well_info: DataFrame, stim: DataFrame) -> DataFrame:
    """The /wells endpoint (app.py:15-31): info ⋈ stim, coordinates
    required; call .toJSON() on the result to emit response rows."""
    joined = well_info.join(
        stim.withColumnRenamed("pdf_name", "s_pdf_name"),
        F.col("pdf_name") == F.col("s_pdf_name"),
        "left",
    ).drop("s_pdf_name").filter(
        F.col("latitude").isNotNull() & F.col("longitude").isNotNull()
    )
    # internal bookkeeping columns (upsert version etc.) never serve
    return joined.drop(*[c for c in joined.columns if c.startswith("__")])
