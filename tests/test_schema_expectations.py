"""Loud tripwire for driver test-data drift.

The grading driver regenerates /root/testdata between rounds and
encodings HAVE drifted before: events.ts shipped as parquet
TIMESTAMP(NANOS) through round 3, then timestamp[us] from round 4 —
which Spark and DuckDB interpret differently enough to have silently
broken 3 queries and 9 tests (round 4). This test pins the physical
schema of every table as observed at round 6; when the driver changes
an encoding again, the suite fails HERE with a pointed message instead
of as a scatter of value mismatches.

On failure: diff the actual schema, extend the relevant normalizer
(sources/readers.py — e.g. normalize_event_ts handles all three
observed ts encodings), and update the expectation below.
"""

from __future__ import annotations

import os

import pyarrow.parquet as pq
import pytest

_EXPECT = {
    "region": {"r_regionkey": "int32", "r_name": "string"},
    "nation": {
        "n_nationkey": "int32",
        "n_name": "string",
        "n_regionkey": "int32",
    },
    "customer": {
        "c_custkey": "int64",
        "c_name": "string",
        "c_nationkey": "int32",
        "c_acctbal": "double",
        "c_mktsegment": "string",
    },
    "supplier": {
        "s_suppkey": "int64",
        "s_name": "string",
        "s_nationkey": "int32",
        "s_acctbal": "double",
    },
    "part": {
        "p_partkey": "int64",
        "p_name": "string",
        "p_brand": "string",
        "p_type": "string",
        "p_size": "int32",
        "p_retailprice": "double",
    },
    "orders": {
        "o_orderkey": "int64",
        "o_custkey": "int64",
        "o_orderstatus": "string",
        "o_totalprice": "double",
        "o_orderdate": "timestamp[us]",
        "o_orderpriority": "string",
    },
    "lineitem": {
        "l_orderkey": "int64",
        "l_partkey": "int64",
        "l_suppkey": "int64",
        "l_linenumber": "int32",
        "l_quantity": "double",
        "l_extendedprice": "double",
        "l_discount": "double",
        "l_tax": "double",
        "l_returnflag": "string",
        "l_linestatus": "string",
        "l_shipdate": "timestamp[us]",
    },
    "events": {
        "event_id": "int64",
        # every encoding the readers normalize is tolerated — anything
        # ELSE is new drift (see normalize_event_ts)
        "ts": {"timestamp[us]", "timestamp[ns]", "int64"},
        "user_id": "int64",
        "event_type": "string",
        "value": "double",
        "props": "string",
    },
    "documents": {
        "doc_id": "int64",
        "text": "string",
        "lang": "string",
        "source": "string",
        "n_chars": "int64",
    },
    "embeddings": {
        "vec_id": "int64",
        "embedding": "list<element: float>",
        "label": "int32",
    },
}


def _sf_dir() -> str:
    return os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.mark.parametrize("table", sorted(_EXPECT))
def test_testdata_schema_matches_expectation(table):
    path = os.path.join(_sf_dir(), f"{table}.parquet")
    schema = pq.read_schema(path)
    got = {f.name: str(f.type) for f in schema}
    want = _EXPECT[table]
    assert set(got) == set(want), (
        f"{table}: driver data drift — columns changed: {sorted(got)} vs"
        f" expected {sorted(want)}; update readers + this expectation"
    )
    for name, exp in want.items():
        ok = got[name] in exp if isinstance(exp, set) else got[name] == exp
        assert ok, (
            f"{table}.{name}: driver data drift — on-disk type {got[name]!r}"
            f" (expected {exp!r}). Check sources/readers.py normalizers"
            " (see events-ts round-4 incident) before anything else."
        )
