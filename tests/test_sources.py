"""Source/sink connector tests: the reference's own CSVs, a document
folder, and the upsert sink."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from oil_wells_data_wrangling_spark.sources.csv_wells import (
    discover_coord_columns,
    read_well_csv,
)
from oil_wells_data_wrangling_spark.sources.pdf_source import read_document_folder
from oil_wells_data_wrangling_spark.sources.sinks import read_table, upsert_parquet

_REF_HEADER = "/root/reference/well_header.csv"


def test_discover_coord_columns():
    assert discover_coord_columns(["pdf_name", "Latitude", "LONGITUDE"]) == (
        "Latitude",
        "LONGITUDE",
    )
    assert discover_coord_columns(["x (lon)", "y (lat)"]) == ("y (lat)", "x (lon)")
    assert discover_coord_columns(["a", "b"]) == (None, None)


@pytest.mark.skipif(not os.path.exists(_REF_HEADER), reason="reference CSV absent")
def test_read_reference_well_header(spark):
    df = read_well_csv(spark, _REF_HEADER)
    assert "pdf_name" in df.columns and "latitude" in df.columns
    rows = {r["pdf_name"]: r for r in df.collect()}
    assert len(rows) >= 50
    # Known row: W20407.pdf has plain-decimal coordinates
    r = rows["W20407.pdf"]
    assert abs(r["latitude"] - 48.05735278) < 1e-9
    assert abs(r["longitude"] - (-103.6026139)) < 1e-9
    # W11745.pdf: lat 48.1, lon -103
    assert abs(rows["W11745.pdf"]["latitude"] - 48.1) < 1e-9


def test_document_folder_source(spark, tmp_path):
    (tmp_path / "a.txt").write_text("Well Operator: ACME\nLatitude: 48.5 N")
    (tmp_path / "b.txt").write_text("Well Operator: ZETA")
    (tmp_path / "c.bin").write_bytes(b"\xff\xfe\x00\x01")
    df = read_document_folder(spark, str(tmp_path))
    got = {r["doc_name"]: r["raw_text"] for r in df.collect()}
    assert got["a.txt"].startswith("Well Operator: ACME")
    assert got["b.txt"] == "Well Operator: ZETA"
    assert got["c.bin"] == ""  # undecodable → empty, like the reference


def test_upsert_parquet_last_write_wins(spark, tmp_path):
    path = str(tmp_path / "tbl")
    v1 = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 10)], "k long, v string, ver long"
    )
    upsert_parquet(v1, path, keys=["k"], version_col="ver")
    v2 = spark.createDataFrame(
        [(2, "B", 20), (3, "c", 5)], "k long, v string, ver long"
    )
    upsert_parquet(v2, path, keys=["k"], version_col="ver")
    got = {r["k"]: (r["v"], r["ver"]) for r in read_table(spark, path).collect()}
    assert got == {1: ("a", 10), 2: ("B", 20), 3: ("c", 5)}
    # same version: newest write wins the tie
    v3 = spark.createDataFrame([(1, "A2", 10)], "k long, v string, ver long")
    upsert_parquet(v3, path, keys=["k"], version_col="ver")
    got = {r["k"]: r["v"] for r in read_table(spark, path).collect()}
    assert got[1] == "A2"
