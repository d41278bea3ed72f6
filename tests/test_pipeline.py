"""End-to-end reference-workflow test: realistic PDF-style text files →
header/stim tables → upsert load → enrichment → /wells JSON rows."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from oil_wells_data_wrangling_spark.pipeline import (
    build_well_info,
    extract_well_tables,
    load_well_tables,
    wells_json,
)
from oil_wells_data_wrangling_spark.sources.sinks import read_table

_DOC_A = """Well Operator: OASIS PETROLEUM
Well Name: CHALMERS 5300 31-19H
API # 33-053-05924
Job Type: Stimulation
County, State: MCKENZIE, ND
Latitude: 48° 3' 26.47" N
Longitude: 103° 36' 9.41" W
Datum: Mean Sea Level
Date Stimulated
9/20/2014
Stimulated Formation
Bakken
Lbs Proppant
4,000,000
Maximum Treatment Pressure (PSI)
9679
Maximum Treatment Rate (BBLS/Min)
39.5
"""

_DOC_B = """Operator: RIM OPERATING, INC.
Well Name: CORPS OF ENGINEERS 31-10
Well File No. 33-053-02148
Latitude: 48.1
Longitude: -103
"""

_DOC_C = """Well Operator: NO COORDS LLC
Well Name: DRYHOLE 1
API # 33-999-00001
"""


@pytest.fixture(scope="module")
def folder(tmp_path_factory):
    d = tmp_path_factory.mktemp("pdf_texts")
    (d / "W20407.pdf.txt").write_text(_DOC_A)
    (d / "W11920.pdf.txt").write_text(_DOC_B)
    (d / "W99999.pdf.txt").write_text(_DOC_C)
    return str(d)


def test_reference_workflow_end_to_end(spark, folder, tmp_path):
    header, stim = extract_well_tables(spark, folder)
    h = {r["pdf_name"]: r for r in header.collect()}
    assert h["W20407.pdf.txt"]["operator"] == "OASIS PETROLEUM"
    assert h["W20407.pdf.txt"]["api"] == "33-053-05924"
    assert h["W20407.pdf.txt"]["latitude"] == pytest.approx(
        48 + 3 / 60 + 26.47 / 3600, abs=1e-9
    )
    assert h["W20407.pdf.txt"]["longitude"] == pytest.approx(
        -(103 + 36 / 60 + 9.41 / 3600), abs=1e-9
    )
    # alternate labels: Operator / Well File No. / plain decimals
    assert h["W11920.pdf.txt"]["operator"] == "RIM OPERATING, INC."
    assert h["W11920.pdf.txt"]["api"] == "33-053-02148"
    assert h["W11920.pdf.txt"]["latitude"] == pytest.approx(48.1)
    assert h["W11920.pdf.txt"]["longitude"] == pytest.approx(-103.0)

    s = {r["pdf_name"]: r for r in stim.collect()}
    assert s["W20407.pdf.txt"]["date_simulated"] == "9/20/2014"
    assert s["W20407.pdf.txt"]["stimulated_formation"] == "Bakken"
    assert s["W20407.pdf.txt"]["lbs_proppant"] == 4_000_000.0
    assert s["W20407.pdf.txt"]["max_pressure_psi"] == 9679.0
    assert s["W20407.pdf.txt"]["max_treatment_rate_bbls_min"] == 39.5

    # load (idempotent upsert)
    hp, sp = load_well_tables(header, stim, str(tmp_path))
    load_well_tables(header, stim, str(tmp_path))  # re-run: no dup rows
    assert read_table(spark, hp).count() == 3
    assert read_table(spark, sp).count() == 3

    # enrichment + serving
    web = spark.createDataFrame(
        [
            ("CHALMERS 5300 31-19H", "33-053-05924", "ACTIVE", "N/A"),
            ("CORPS OF ENGINEERS 31-10", "33-053-02148", "N/A", "12"),
        ],
        "well_name string, api string, well_status string, oil_badge string",
    )
    info = build_well_info(read_table(spark, hp), web)
    rows = wells_json(info, read_table(spark, sp)).toJSON().collect()
    objs = {json.loads(r)["pdf_name"]: json.loads(r) for r in rows}
    assert set(objs) == {"W20407.pdf.txt", "W11920.pdf.txt"}  # no-coords dropped
    assert objs["W20407.pdf.txt"]["well_status"] == "ACTIVE"
    assert "oil_badge" not in objs["W20407.pdf.txt"]  # N/A → NULL → omitted in JSON
    assert objs["W11920.pdf.txt"]["oil_badge"] == "12"
    assert objs["W20407.pdf.txt"]["stimulated_formation"] == "Bakken"
