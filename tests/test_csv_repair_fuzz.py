"""Fuzz the quote-aware CSV repair: any quoted name field — including
embedded newlines, commas, and even lines that mimic a record start —
must be reassembled exactly."""

from __future__ import annotations

import pytest
from hypothesis import given, settings, strategies as st

from oil_wells_data_wrangling_spark.operators.wrangle import repair_csv_lines

pytestmark = pytest.mark.filterwarnings("ignore")

# printable text without double-quotes (CSV writer would double them;
# the synthesized records here don't escape) — newlines and commas and
# digit-comma-quote record-start mimics are all fair game.
_name = st.text(
    alphabet=st.sampled_from('abc 123,\n"'.replace('"', "") + "#."),
    min_size=1,
    max_size=40,
).filter(lambda s: "\n\n" not in s and not s.endswith("\n") and not s.startswith("\n"))


@settings(max_examples=15, deadline=None)
@given(names=st.lists(_name, min_size=1, max_size=6))
def test_repair_recovers_any_quoted_name(spark_fuzz, names):
    rows = []
    line_no = 0
    for i, name in enumerate(names):
        record = f'{i + 1},"{name}",SEG{i % 3}'
        for part in record.split("\n"):
            rows.append((0, line_no, part))
            line_no += 1
    lines = spark_fuzz.createDataFrame(
        rows, "file_id int, line_no long, text string"
    )
    out = repair_csv_lines(
        lines, expected_commas=2, schema="c_custkey long, name string, segment string"
    )
    got = {r["c_custkey"]: (r["name"], r["segment"]) for r in out.collect()}
    want = {i + 1: (name, f"SEG{i % 3}") for i, name in enumerate(names)}
    assert got == want


# Escaped-quote pathologies: names may contain double-quotes (CSV-escaped
# as "" by the writer), including runs of quotes, quotes adjacent to
# commas/newlines, and record-start mimics that can't close the field
# because their quotes are doubled.
_qname = st.text(
    alphabet=st.sampled_from('abc 123,\n"#.'),
    min_size=1,
    max_size=40,
).filter(
    lambda s: "\n\n" not in s and not s.endswith("\n") and not s.startswith("\n")
)


@settings(max_examples=15, deadline=None)
@given(names=st.lists(_qname, min_size=1, max_size=6))
def test_repair_recovers_escaped_quotes(spark_fuzz, names):
    rows = []
    line_no = 0
    for i, name in enumerate(names):
        escaped = name.replace('"', '""')
        record = f'{i + 1},"{escaped}",SEG{i % 3}'
        for part in record.split("\n"):
            rows.append((0, line_no, part))
            line_no += 1
    lines = spark_fuzz.createDataFrame(
        rows, "file_id int, line_no long, text string"
    )
    out = repair_csv_lines(
        lines, expected_commas=2, schema="c_custkey long, name string, segment string"
    )
    got = {r["c_custkey"]: (r["name"], r["segment"]) for r in out.collect()}
    want = {i + 1: (name, f"SEG{i % 3}") for i, name in enumerate(names)}
    assert got == want


@pytest.fixture(scope="module")
def spark_fuzz():
    from oil_wells_data_wrangling_spark.session import get_spark

    return get_spark(app_name="csvfuzz", master="local[2]", shuffle_partitions=2)
