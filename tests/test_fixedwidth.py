"""Fixed-width source: layout round-trip on real table data, and the
corrupt-record contract (short records and bad casts route to the bad
side with reasons, never silently null into the good frame)."""

from __future__ import annotations

from pyspark.sql import functions as F

from oil_wells_data_wrangling_spark.sources.fixedwidth import (
    FwField,
    read_fixed_width,
    render_fixed_width,
)
from oil_wells_data_wrangling_spark.sources.readers import load_tables

_LAYOUT = [
    FwField("custkey", 1, 12, "bigint"),
    FwField("name", 13, 25, "string"),
    FwField("acctbal", 38, 12, "double"),
    FwField("mktsegment", 50, 10, "string"),
]


def test_fixed_width_round_trip(spark, sf_dir, tmp_path):
    src = (
        load_tables(spark, sf_dir)
        .customer.select(
            F.col("c_custkey").alias("custkey"),
            F.col("c_name").alias("name"),
            F.col("c_acctbal").alias("acctbal"),
            F.col("c_mktsegment").alias("mktsegment"),
        )
        .limit(200)
    )
    path = str(tmp_path / "fw")
    rendered = render_fixed_width(src, _LAYOUT)
    assert rendered.filter(F.col("value").isNull()).count() == 0, (
        "layout too narrow for the data"
    )
    rendered.coalesce(2).write.text(path)

    good, bad = read_fixed_width(spark, path, _LAYOUT)
    assert bad.count() == 0
    want = {
        (r.custkey, r.name, r.acctbal, r.mktsegment)
        for r in src.collect()
    }
    got = {
        (r.custkey, r.name, r.acctbal, r.mktsegment)
        for r in good.collect()
    }
    assert got == want


def test_fixed_width_bad_records_route_with_reasons(spark, tmp_path):
    lines = [
        "000000000001Alice                    00000042.5  BUILDING  ",
        "too short",
        "00000000000XBob                      00000010.0  AUTO      ",
    ]
    path = str(tmp_path / "fw_bad")
    spark.createDataFrame(
        [(l,) for l in lines], "value string"
    ).coalesce(1).write.text(path)

    good, bad = read_fixed_width(spark, path, _LAYOUT)
    g = good.collect()
    assert len(g) == 1 and g[0].custkey == 1 and g[0].name == "Alice"
    assert g[0].acctbal == 42.5
    reasons = {r.line[:9]: r.reason for r in bad.collect()}
    assert reasons["too short"] == "short_record"
    assert reasons["000000000"] == "bad_cast"


def test_fixed_width_stays_jvm_side(spark, sf_dir, tmp_path):
    src = load_tables(spark, sf_dir).customer.select(
        F.col("c_custkey").alias("custkey"),
        F.col("c_name").alias("name"),
        F.col("c_acctbal").alias("acctbal"),
        F.col("c_mktsegment").alias("mktsegment"),
    ).limit(10)
    path = str(tmp_path / "fw_plan")
    render_fixed_width(src, _LAYOUT).coalesce(1).write.text(path)
    good, _bad = read_fixed_width(spark, path, _LAYOUT)
    plan = good._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "Exchange" not in plan, "reader must be a pure scan projection"
