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


def _run_repair(spark_fuzz, physical_lines):
    rows = [(0, i, line) for i, line in enumerate(physical_lines)]
    lines = spark_fuzz.createDataFrame(rows, "file_id int, line_no long, text string")
    out = repair_csv_lines(
        lines, expected_commas=2, schema="c_custkey long, name string, segment string"
    )
    return {r["c_custkey"]: (r["name"], r["segment"]) for r in out.collect()}


def test_repair_drops_junk_preamble_lines(spark_fuzz):
    """Lines before the first record start are discarded, exactly the
    reference's `if not buf: ... else: continue` (pdf_to_db.py:50-54)."""
    got = _run_repair(
        spark_fuzz,
        [
            "this is report preamble, with, many, commas",
            '  leading-space 7,"mimic",X',  # not ^\\d+," — junk
            '1,"alpha",SEG0',
            "trailing junk after a complete record",
            '2,"beta",SEG1',
        ],
    )
    assert got == {1: ("alpha", "SEG0"), 2: ("beta", "SEG1")}


def test_repair_mimic_record_start_inside_open_quote(spark_fuzz):
    """A continuation line that itself looks like a record start must
    merge into the open quoted field, not begin a new record — the
    reference only starts a new row when the buffer is already complete
    (pdf_to_db.py:55-60)."""
    got = _run_repair(
        spark_fuzz,
        [
            '1,"details follow:',
            # raw line matches ^\d+," yet its quotes are doubled (CSV
            # escaping), so the field stays open and it must merge
            '2,""this line mimics a record start"",and,goes,on',
            'closing line",SEG0',
            '2,"real second",SEG1',
        ],
    )
    assert got[1] == (
        'details follow:\n2,"this line mimics a record start",and,goes,on\nclosing line',
        "SEG0",
    )
    assert got[2] == ("real second", "SEG1")


def test_repair_flushes_incomplete_tail_record(spark_fuzz):
    """An unterminated record at EOF still flushes (the reference's
    final `if buf: out_lines.append(buf)`, pdf_to_db.py:66-67) so no
    data silently disappears."""
    got = _run_repair(
        spark_fuzz,
        ['1,"alpha",SEG0', '2,"unterminated tail'],
    )
    assert got[1] == ("alpha", "SEG0")
    assert got[2] == ("unterminated tail", None)  # padded, not dropped/crashed


@settings(max_examples=15, deadline=None)
@given(
    names=st.lists(_qname, min_size=1, max_size=5),
    junk=st.lists(
        st.text(
            alphabet=st.sampled_from("xyz ,.#\""), min_size=1, max_size=20
        ).filter(lambda s: not __import__("re").match(r'^\d+,"', s)),
        max_size=3,
    ),
)
def test_repair_with_junk_and_escaped_quotes(spark_fuzz, names, junk):
    """Reference-shaped corpus: junk preamble + escaped-quote names that
    may contain record-start mimics and embedded newlines."""
    physical = list(junk)  # preamble before any record start: dropped
    for i, name in enumerate(names):
        escaped = name.replace('"', '""')
        record = f'{i + 1},"{escaped}",SEG{i % 3}'
        physical.extend(record.split("\n"))
    got = _run_repair(spark_fuzz, physical)
    want = {i + 1: (name, f"SEG{i % 3}") for i, name in enumerate(names)}
    assert got == want
