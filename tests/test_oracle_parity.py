"""Oracle-parity gate: every registered query with an oracle must match
DuckDB exactly (row count, column names, order-insensitive values) — a
local pre-run of the driver's t2 correctness check.

Float equality is EXACT on purpose: the engine routes double aggregation
through exact decimal arithmetic (functions/exact.py), so any mismatch
here is a real determinism bug, not noise.
"""

from __future__ import annotations

import math

import pandas as pd
import pytest

from oil_wells_data_wrangling_spark.plans.registry import REGISTRY, _load_all

_load_all()
_WITH_ORACLE = sorted(name for name, q in REGISTRY.items() if q.oracle is not None)


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1).copy()
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            df[c] = s.dt.strftime("%Y-%m-%d %H:%M:%S.%f")
        elif s.dtype == object:
            df[c] = s.map(lambda v: repr(v) if isinstance(v, (list, tuple)) else v)
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


def _assert_frames_match(spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame, name: str):
    assert sorted(spark_pdf.columns) == sorted(duck_pdf.columns), (
        f"{name}: column mismatch {sorted(spark_pdf.columns)} vs {sorted(duck_pdf.columns)}"
    )
    assert len(spark_pdf) == len(duck_pdf), (
        f"{name}: row count {len(spark_pdf)} vs {len(duck_pdf)}"
    )
    a, b = _canon(spark_pdf), _canon(duck_pdf)
    for c in a.columns:
        av, bv = a[c].tolist(), b[c].tolist()
        for i, (x, y) in enumerate(zip(av, bv)):
            if isinstance(x, float) and isinstance(y, float):
                if math.isnan(x) and math.isnan(y):
                    continue
                assert x == y, f"{name}.{c}[{i}]: {x!r} != {y!r}"
            else:
                xn = x is None or (isinstance(x, float) and math.isnan(x)) or x is pd.NaT
                yn = y is None or (isinstance(y, float) and math.isnan(y)) or y is pd.NaT
                if xn and yn:
                    continue
                assert x == y, f"{name}.{c}[{i}]: {x!r} != {y!r}"


@pytest.mark.parametrize("name", _WITH_ORACLE)
def test_oracle_parity(name, spark, duck, sf_dir):
    q = REGISTRY[name]
    spark_pdf = q.fn(spark, sf_dir).toPandas()
    duck_pdf = duck.execute(q.oracle).fetchdf()
    _assert_frames_match(spark_pdf, duck_pdf, name)


def test_all_queries_return_rows(spark, sf_dir):
    for name, q in sorted(REGISTRY.items()):
        df = q.fn(spark, sf_dir)
        assert df.count() >= 0, name
