"""Driver contract for the spark-graft builder (PySpark target).

Thin adapter over ``oil_wells_data_wrangling_spark`` — the registry in
``plans/registry.py`` is the single source of truth for the engine's
query surface (one entry per operator in SURVEY.md §2).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from oil_wells_data_wrangling_spark.plans.registry import (
    all_oracle_sql,
    all_queries,
)

_SMOKE_SF_DIR = "/root/testdata/sf0.001"
_FLAGSHIP = "well_pipeline"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return all_queries()[_FLAGSHIP](spark, _SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return all_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable oracle SQL for each SQL-expressible query."""
    return all_oracle_sql()
