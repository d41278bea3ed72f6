"""Table loading for the engine's star schema.

Parquet is the canonical storage format (columnar, predicate pushdown,
column pruning). ``Tables`` binds DataFrames lazily *per table* — no
parquet footer is even opened until a query touches that table, so a plan
over ``lineitem`` never pays for ``events``.

``events.ts`` has shipped in two parquet encodings over time: TIMESTAMP(NANOS)
(which Spark's vectorized reader rejects — read as raw nanos via
``spark.sql.legacy.parquet.nanosAsLong``) and plain ``timestamp[us]`` (which
Spark reads as TIMESTAMP_NTZ). ``normalize_event_ts`` folds both into a plain
``timestamp`` column at the source so every downstream operator — batch and
streaming — sees one type. The session timezone is UTC (session.py), so the
NTZ→TIMESTAMP cast is value-preserving and DuckDB ``epoch_us`` oracles agree.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def normalize_event_ts(df: DataFrame) -> DataFrame:
    """Fold every observed on-disk encoding of ``events.ts`` into a plain
    session-tz ``timestamp`` column.

    - ``bigint``: legacy nanos-since-epoch (TIMESTAMP(NANOS) files read
      under ``nanosAsLong``); integral ``div`` keeps full precision —
      double division would not past 2^53.
    - ``timestamp_ntz``: current ``timestamp[us]`` files. The session tz
      is UTC, so the cast re-labels the same instant (value-preserving).
    - ``timestamp``: already normalized; pass through.
    """
    dt = dict(df.dtypes).get("ts")
    if dt == "bigint":
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    if dt == "timestamp_ntz":
        return df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


class Tables:
    """Lazily-bound DataFrames for every table in the test schema."""

    def __init__(self, spark: SparkSession, sf_dir: str):
        self._spark = spark
        self._sf_dir = sf_dir
        self._cache: dict[str, DataFrame] = {}
        try:
            # Runtime-settable; required to read events.parquet (nanos) even
            # when the session wasn't built by our factory.
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        except Exception:
            pass

    def _load(self, name: str) -> DataFrame:
        df = self._spark.read.parquet(os.path.join(self._sf_dir, f"{name}.parquet"))
        if name == "events":
            df = normalize_event_ts(df)
        return df

    def __getattr__(self, name: str) -> DataFrame:
        if name.startswith("_") or name not in TABLE_NAMES:
            raise AttributeError(name)
        if name not in self._cache:
            self._cache[name] = self._load(name)
        return self._cache[name]

    def __getitem__(self, name: str) -> DataFrame:
        return getattr(self, name)

    def register_temp_views(self) -> None:
        for name in TABLE_NAMES:
            self[name].createOrReplaceTempView(name)


def load_tables(spark: SparkSession, sf_dir: str) -> Tables:
    """Bind the table set under ``sf_dir`` (lazy; costs nothing)."""
    return Tables(spark, sf_dir)
