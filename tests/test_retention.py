"""expire_partitions — partition lifecycle with the decode-not-
reconstruct contract (r15 §2.E): dry-run default, keep-latest and
predicate rules, escaped partition values, NULL-partition handling."""

from __future__ import annotations

import os

import pytest

from oil_wells_data_wrangling_spark.sources.retention import (
    expire_partitions,
)


def _table(spark, tmp_path, values):
    path = str(tmp_path / "t")
    rows = [(i, v) for i, v in enumerate(values)]
    (
        spark.createDataFrame(rows, "id int, day string")
        .repartition(1)
        .write.partitionBy("day")
        .parquet(path)
    )
    return path


def _days(path):
    return {
        d.split("=", 1)[1]
        for d in os.listdir(path)
        if d.startswith("day=")
    }


def test_dry_run_default_reports_and_deletes_nothing(spark, tmp_path):
    path = _table(spark, tmp_path, ["2026-01-01", "2026-01-02", "2026-01-03"])
    rep = expire_partitions(path, "day", keep_latest=1)
    assert {r["value"]: r["action"] for r in rep} == {
        "2026-01-01": "would_expire",
        "2026-01-02": "would_expire",
        "2026-01-03": "kept",
    }
    assert all(r["n_files"] > 0 and r["bytes"] > 0 for r in rep)
    assert len(_days(path)) == 3  # nothing deleted


def test_keep_latest_deletes_and_table_still_reads(spark, tmp_path):
    path = _table(
        spark, tmp_path,
        ["2026-01-01", "2026-01-02", "2026-01-03", "2026-01-04"],
    )
    rep = expire_partitions(path, "day", keep_latest=2, dry_run=False)
    assert sum(r["action"] == "expired" for r in rep) == 2
    assert _days(path) == {"2026-01-03", "2026-01-04"}
    got = {
        str(r.day)  # partition-type inference may read dates back typed
        for r in spark.read.parquet(path).select("day").collect()
    }
    assert got == {"2026-01-03", "2026-01-04"}
    # no hidden half-deleted remnants
    assert not [d for d in os.listdir(path) if d.startswith(".expired-")]


def test_predicate_rule_and_escaped_values(spark, tmp_path):
    """Partition values Spark percent-escapes (':' in timestamps) must
    reach the predicate DECODED — reconstructing dir names would miss
    them and retention would silently skip those partitions."""
    path = _table(
        spark, tmp_path,
        ["2026-01-01 00:00", "2026-01-02 00:00", "keep me"],
    )
    # ':' is percent-encoded on disk, space is not (the gotcha pair)
    assert any("%3A" in d for d in os.listdir(path))
    rep = expire_partitions(
        path,
        "day",
        expire_when=lambda v: v is not None and v.startswith("2026-01-01"),
        dry_run=False,
    )
    assert {r["value"]: r["action"] for r in rep} == {
        "2026-01-01 00:00": "expired",
        "2026-01-02 00:00": "kept",
        "keep me": "kept",
    }
    assert _days(path) == {"2026-01-02 00%3A00", "keep me"}


def test_null_partition_handling(spark, tmp_path):
    path = str(tmp_path / "t")
    (
        spark.createDataFrame(
            [(1, "2026-01-01"), (2, None), (3, "2026-01-02")],
            "id int, day string",
        )
        .repartition(1)
        .write.partitionBy("day")
        .parquet(path)
    )
    # keep_latest never expires the NULL partition
    rep = expire_partitions(path, "day", keep_latest=1, dry_run=False)
    actions = {r["value"]: r["action"] for r in rep}
    assert actions[None] == "kept" and actions["2026-01-02"] == "kept"
    assert actions["2026-01-01"] == "expired"
    # a predicate CAN expire it, receiving None
    rep = expire_partitions(
        path, "day", expire_when=lambda v: v is None, dry_run=False
    )
    assert {r["value"]: r["action"] for r in rep} == {
        None: "expired",
        "2026-01-02": "kept",
    }
    got = {
        str(r.day) for r in spark.read.parquet(path).select("day").collect()
    }
    assert got == {"2026-01-02"}


def test_rule_arg_validation(spark, tmp_path):
    path = _table(spark, tmp_path, ["2026-01-01"])
    with pytest.raises(ValueError):
        expire_partitions(path, "day")
    with pytest.raises(ValueError):
        expire_partitions(
            path, "day", keep_latest=1, expire_when=lambda v: False
        )
    with pytest.raises(ValueError):
        expire_partitions(path, "day", keep_latest=0)
