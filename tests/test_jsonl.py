"""JSONL source: explicit-schema parse, corrupt-line capture, and the
streaming twin — batch and stream must see the same rows."""

from __future__ import annotations

import json

import pytest

from oil_wells_data_wrangling_spark.sources.jsonl import (
    DOCUMENTS_SCHEMA,
    read_jsonl,
    read_jsonl_stream,
    split_corrupt,
)

_GOOD = [
    {"doc_id": 1, "text": "alpha beta", "lang": "en", "source": "s0", "n_chars": 10},
    {"doc_id": 2, "text": "gamma", "lang": "de", "source": "s1", "n_chars": 5},
    {"doc_id": 3, "text": "delta eps", "lang": "en", "source": "s0", "n_chars": 9},
]
_BAD = [
    '{"doc_id": 4, "text": "unterminated',  # invalid JSON
    '{"doc_id": "not-a-number", "text": "typed wrong", "n_chars": 1}',  # type break
]


@pytest.fixture(scope="module")
def jsonl_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("jsonl")
    (d / "part-0.jsonl").write_text(
        "\n".join(json.dumps(r) for r in _GOOD[:2]) + "\n" + _BAD[0] + "\n"
    )
    (d / "part-1.jsonl").write_text(
        json.dumps(_GOOD[2]) + "\n" + _BAD[1] + "\n"
    )
    return str(d)


def test_jsonl_batch_split(spark, jsonl_dir):
    df = read_jsonl(spark, jsonl_dir, DOCUMENTS_SCHEMA)
    good, bad = split_corrupt(df)
    rows = {r["doc_id"]: r.asDict() for r in good.collect()}
    assert set(rows) == {1, 2, 3}
    assert rows[1]["text"] == "alpha beta"
    assert rows[2]["n_chars"] == 5 and isinstance(rows[2]["n_chars"], int)
    raw = sorted(r["raw_line"] for r in bad.collect())
    assert raw == sorted(_BAD)
    # the parsed schema is the declared contract, no inference drift
    assert [f.name for f in good.schema.fields] == [
        "doc_id", "text", "lang", "source", "n_chars",
    ]


def test_jsonl_schema_autoappends_corrupt_column(spark, jsonl_dir):
    from pyspark.sql import types as T

    bare = T.StructType(
        [f for f in DOCUMENTS_SCHEMA.fields if f.name != "_corrupt_record"]
    )
    df = read_jsonl(spark, jsonl_dir, bare)
    assert "_corrupt_record" in df.columns


def test_jsonl_stream_matches_batch(spark, jsonl_dir, tmp_path):
    stream = read_jsonl_stream(spark, jsonl_dir, DOCUMENTS_SCHEMA, 1)
    q = (
        stream.writeStream.format("memory")
        .queryName("jsonl_stream_t")
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql(
        "SELECT doc_id FROM jsonl_stream_t WHERE _corrupt_record IS NULL"
    ).collect()
    assert sorted(r["doc_id"] for r in got) == [1, 2, 3]
    n_bad = spark.sql(
        "SELECT count(*) AS n FROM jsonl_stream_t"
        " WHERE _corrupt_record IS NOT NULL"
    ).collect()[0]["n"]
    assert n_bad == 2
