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


def _fake_ocr(payload: bytes) -> str:
    """Deterministic OCR stand-in: recognizable text derived from bytes."""
    return f"OCR[{len(payload)}]" if payload else ""


def test_ocr_fallback_routing():
    """Empty-text-layer payloads route through the OCR branch, mirroring
    extract_pages_text (pdf_extraction.py:71-79)."""
    from oil_wells_data_wrangling_spark.sources.pdf_source import _extract_text

    # decodable text layer wins; OCR not consulted
    assert _extract_text(b"plain text", ocr=_fake_ocr) == "plain text"
    # undecodable payload (empty text layer) falls back to OCR
    assert _extract_text(b"\xff\xfe\x00\x01", ocr=_fake_ocr) == "OCR[4]"
    # whitespace-only text layer also counts as empty
    assert _extract_text(b"  \n\t ", ocr=_fake_ocr) == "OCR[5]"
    # prefer_ocr swaps the order
    assert _extract_text(b"plain text", prefer_ocr=True, ocr=_fake_ocr) == "OCR[10]"
    # prefer_ocr with empty OCR output falls back to the text layer
    assert _extract_text(b"", prefer_ocr=True, ocr=_fake_ocr) == ""
    assert _extract_text(b"plain", prefer_ocr=True, ocr=lambda _: "") == "plain"
    # no OCR available → undecodable stays empty, like the reference
    assert _extract_text(b"\xff\xfe\x00\x01") == ""


def test_ocr_fallback_distributed(spark, tmp_path):
    """The injected OCR callable serializes into the mapInPandas closure
    and runs on executors."""
    (tmp_path / "scan.bin").write_bytes(b"\xff\xfe\x00\x01\x02")
    (tmp_path / "text.txt").write_text("has a text layer")

    # defined inline: cloudpickle serializes nested functions by value,
    # so the executor worker doesn't need to import this test module
    def fake_ocr(payload: bytes) -> str:
        return f"OCR[{len(payload)}]" if payload else ""

    df = read_document_folder(spark, str(tmp_path), ocr=fake_ocr)
    got = {r["doc_name"]: r["raw_text"] for r in df.collect()}
    assert got["scan.bin"] == "OCR[5]"
    assert got["text.txt"] == "has a text layer"


def test_parse_well_pages_fixture(spark):
    """Stored-HTML parse matches the reference's DOM reads
    (web_scraping.py:80-128): th/td label lookup, block_stat badges in
    either span/label order, inner_text tag-strip, N/A on missing."""
    from oil_wells_data_wrangling_spark.sources.html_table import parse_well_pages

    full = (
        "<html><body><table>"
        "<tr><th> Well Status </th><td><b>Active</b></td></tr>"
        "<tr><th>Well Type</th><td>Oil \n Well</td></tr>"
        "<tr><th>Closest City</th><td>Williston</td></tr>"
        "</table>"
        '<p class="block_stat"><span class="dropcap">1,234</span>'
        " Barrels of Oil Produced</p>"
        '<p class="block_stat">MCF of Gas Produced '
        '<span class="dropcap">567</span></p>'
        "</body></html>"
    )
    sparse = "<html><body><p>No details found</p></body></html>"
    df = spark.createDataFrame(
        [("W1", "33-001", full), ("W2", "33-002", sparse)],
        "well_name string, api string, html string",
    )
    got = {r["well_name"]: r.asDict() for r in parse_well_pages(df).collect()}
    assert got["W1"]["well_status"] == "Active"
    assert got["W1"]["well_type"] == "Oil Well"
    assert got["W1"]["closest_city"] == "Williston"
    assert got["W1"]["oil_badge"] == "1,234"
    assert got["W1"]["gas_badge"] == "567"
    assert got["W2"] == {
        "well_name": "W2",
        "api": "33-002",
        "well_status": "N/A",
        "well_type": "N/A",
        "closest_city": "N/A",
        "oil_badge": "N/A",
        "gas_badge": "N/A",
    }


def test_upsert_parquet_partitioned_touches_only_batch_partitions(spark, tmp_path):
    """Untouched partitions' files are byte-identical after an upsert;
    touched partitions merge keep-latest; new partitions append."""
    import hashlib

    from oil_wells_data_wrangling_spark.sources.sinks import (
        upsert_parquet_partitioned,
    )

    path = str(tmp_path / "tbl")
    v1 = spark.createDataFrame(
        [(1, "a", 10, "p1"), (2, "b", 10, "p2"), (3, "c", 10, "p3")],
        "k long, v string, ver long, pt string",
    )
    upsert_parquet_partitioned(v1, path, keys=["k"], version_col="ver", partition_col="pt")

    def snapshot(part):
        d = os.path.join(path, f"pt={part}")
        return {
            f: hashlib.md5(open(os.path.join(d, f), "rb").read()).hexdigest()
            for f in sorted(os.listdir(d))
            if not f.startswith((".", "_"))
        }

    p3_before = snapshot("p3")
    assert p3_before  # the partition has data files

    batch = spark.createDataFrame(
        # update k=1 (newer), stale update for k=2 (older ver loses),
        # and a brand-new partition p4
        [(1, "A", 20, "p1"), (2, "stale", 5, "p2"), (4, "d", 1, "p4")],
        "k long, v string, ver long, pt string",
    )
    touched = upsert_parquet_partitioned(
        batch, path, keys=["k"], version_col="ver", partition_col="pt"
    )
    assert sorted(touched) == ["p1", "p2", "p4"]
    assert snapshot("p3") == p3_before  # byte-identical, never rewritten
    got = {r["k"]: (r["v"], r["ver"], r["pt"]) for r in read_table(spark, path).collect()}
    assert got == {
        1: ("A", 20, "p1"),
        2: ("b", 10, "p2"),
        3: ("c", 10, "p3"),
        4: ("d", 1, "p4"),
    }


def test_upsert_parquet_partitioned_null_partition_merges(spark, tmp_path):
    """A NULL partition value in the batch must merge with the existing
    default partition, not silently replace it: isin() pruning is
    three-valued, so pt IS NULL rows would never match and dynamic
    overwrite would drop the partition's history."""
    from oil_wells_data_wrangling_spark.sources.sinks import (
        upsert_parquet_partitioned,
    )

    path = str(tmp_path / "tbl")
    v1 = spark.createDataFrame(
        [(1, "keepme", 10, None), (2, "b", 10, "p2")],
        "k long, v string, ver long, pt string",
    )
    upsert_parquet_partitioned(v1, path, keys=["k"], version_col="ver", partition_col="pt")
    batch = spark.createDataFrame(
        [(9, "new-null-row", 1, None)],
        "k long, v string, ver long, pt string",
    )
    upsert_parquet_partitioned(
        batch, path, keys=["k"], version_col="ver", partition_col="pt"
    )
    got = {r["k"]: (r["v"], r["pt"]) for r in read_table(spark, path).collect()}
    assert got == {
        1: ("keepme", None),  # pre-existing default-partition row survives
        2: ("b", "p2"),
        9: ("new-null-row", None),
    }


def test_compact_parquet_shrinks_file_count(spark, tmp_path):
    from oil_wells_data_wrangling_spark.sources.sinks import compact_parquet

    path = str(tmp_path / "tbl")
    df = spark.range(10_000).selectExpr("id AS k", "id * 2 AS v")
    df.repartition(32).write.parquet(path)  # 32 small files

    def parquet_files():
        return [f for f in os.listdir(path) if f.endswith(".parquet")]

    assert len(parquet_files()) == 32
    before = {(r["k"], r["v"]) for r in read_table(spark, path).collect()}
    n = compact_parquet(spark, path, target_file_bytes=10**9)
    assert n == 1 and len(parquet_files()) == 1
    after = {(r["k"], r["v"]) for r in read_table(spark, path).collect()}
    assert after == before  # lossless


def test_jdbc_merge_sql_dialects():
    from oil_wells_data_wrangling_spark.sources.sinks import jdbc_merge_sql

    cols, keys = ["k", "v", "ver"], ["k"]
    mysql = jdbc_merge_sql("tgt", "stg", cols, keys, dialect="mysql")
    assert mysql == (
        "INSERT INTO tgt (`k`, `v`, `ver`) SELECT `k`, `v`, `ver` FROM stg "
        "ON DUPLICATE KEY UPDATE `v`=VALUES(`v`), `ver`=VALUES(`ver`)"
    )
    ansi = jdbc_merge_sql("tgt", "stg", cols, keys, dialect="ansi")
    assert ansi.startswith("MERGE INTO tgt t USING stg s ON t.k = s.k")
    assert "WHEN MATCHED THEN UPDATE SET v = s.v, ver = s.ver" in ansi
    assert "WHEN NOT MATCHED THEN INSERT (k, v, ver) VALUES (s.k, s.v, s.ver)" in ansi
    with pytest.raises(ValueError):
        jdbc_merge_sql("tgt", "stg", cols, keys, dialect="oracle9i")


def test_write_jdbc_upsert_live_merge(spark):
    """End-to-end upsert against a real SQL engine (DuckDB standing in
    for the JDBC target): batch deduped per key by version, staged, and
    merged server-side — incoming wins key collisions, like the
    reference's ON DUPLICATE KEY UPDATE (pdf_to_db.py:202-244)."""
    import duckdb

    from oil_wells_data_wrangling_spark.sources.sinks import write_jdbc_upsert

    con = duckdb.connect()
    con.execute("CREATE TABLE wells (k BIGINT PRIMARY KEY, v TEXT, ver BIGINT)")
    con.execute("INSERT INTO wells VALUES (1, 'old', 0), (9, 'keep', 0)")

    def stage_writer(sdf, staging_table):
        pdf = sdf.toPandas()  # test-side shim; the real writer is JDBC-parallel
        con.register("_stage_pdf", pdf)
        con.execute(f"CREATE TABLE {staging_table} AS SELECT * FROM _stage_pdf")
        con.unregister("_stage_pdf")

    batch = spark.createDataFrame(
        # two versions of k=1 in one batch: ver=20 must win the dedupe
        [(1, "mid", 10), (1, "new", 20), (2, "ins", 5)],
        "k long, v string, ver long",
    )
    merge = write_jdbc_upsert(
        batch,
        url="jdbc:duckdb:memory",
        table="wells",
        keys=["k"],
        version_col="ver",
        dialect="postgres",
        stage_writer=stage_writer,
        sql_executor=con.execute,
    )
    assert "ON CONFLICT (k) DO UPDATE" in merge
    got = {r[0]: (r[1], r[2]) for r in con.execute("SELECT * FROM wells").fetchall()}
    assert got == {1: ("new", 20), 2: ("ins", 5), 9: ("keep", 0)}
    # staging table was dropped
    stale = con.execute(
        "SELECT count(*) FROM information_schema.tables WHERE table_name LIKE 'wells_staging%'"
    ).fetchone()[0]
    assert stale == 0


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


def test_export_json_partitioned_serving_layout(spark, sf_dir, tmp_path):
    """The map-serving export: wells partitioned by grid cell, each
    viewport fetch = one partition directory of JSON lines."""
    from oil_wells_data_wrangling_spark.operators.spatial import with_coordinates
    from oil_wells_data_wrangling_spark.sources.readers import load_tables
    from oil_wells_data_wrangling_spark.sources.sinks import export_json

    pos = with_coordinates(load_tables(spark, sf_dir).supplier).withColumn(
        "band", (F.col("cell_lat") / 30).cast("int")
    )
    path = str(tmp_path / "wells_json")
    export_json(pos.drop("cell_lat", "cell_lon"), path, partition_col="band")

    # partition directories exist and round-trip through schema-on-read
    bands = [d for d in os.listdir(path) if d.startswith("band=")]
    assert bands, "no partition directories written"
    back = spark.read.json(path)
    assert back.count() == pos.count()
    assert set(back.columns) == {"s_suppkey", "lat", "lon", "band"}


def test_events_ts_normalized_across_encodings(spark, tmp_path):
    """Regression for the r4 data drift: events.ts has shipped as both
    parquet TIMESTAMP(NANOS) (read as bigint under nanosAsLong) and
    timestamp[us] (read as TIMESTAMP_NTZ). Loading via Tables must yield a
    plain ``timestamp`` column with identical instants either way, and
    ``unix_micros(ts)`` — the expression that crashed r4 — must resolve."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from oil_wells_data_wrangling_spark.sources.readers import load_tables

    us = [1_700_000_000_000_000, 1_700_000_123_456_789]
    base = {
        "event_id": pa.array([1, 2], pa.int64()),
        "user_id": pa.array([10, 20], pa.int64()),
    }
    micros_dir = tmp_path / "micros"
    nanos_dir = tmp_path / "nanos"
    for d in (micros_dir, nanos_dir):
        d.mkdir()
    pq.write_table(
        pa.table({**base, "ts": pa.array(us, pa.timestamp("us"))}),
        micros_dir / "events.parquet",
    )
    pq.write_table(
        pa.table({**base, "ts": pa.array([v * 1000 for v in us], pa.timestamp("ns"))}),
        nanos_dir / "events.parquet",
        coerce_timestamps=None,
        version="2.6",
    )

    for d in (micros_dir, nanos_dir):
        ev = load_tables(spark, str(d)).events
        assert dict(ev.dtypes)["ts"] == "timestamp", (d, ev.dtypes)
        got = {
            r["event_id"]: r["us"]
            for r in ev.select("event_id", F.unix_micros("ts").alias("us")).collect()
        }
        assert got == {1: us[0], 2: us[1]}, d
