from __future__ import annotations

import os

import duckdb
import pytest

from oil_wells_data_wrangling_spark.compat import ensure_protobuf
from oil_wells_data_wrangling_spark.session import get_spark
from oil_wells_data_wrangling_spark.sources.readers import TABLE_NAMES

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")

# Bridge google.protobuf (transformWithStateInPandas worker protocol)
# BEFORE any SparkSession exists: workers inherit the JVM's env, so the
# shim's PYTHONPATH entry must be in place when the JVM launches.
HAVE_PROTOBUF = ensure_protobuf()


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="tests", master="local[4]", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def duck():
    """DuckDB connection with the same parquet tables as views — mirrors
    the driver's oracle environment."""
    con = duckdb.connect()
    for name in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{SF_DIR}/{name}.parquet')"
        )
    yield con
    con.close()


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR
