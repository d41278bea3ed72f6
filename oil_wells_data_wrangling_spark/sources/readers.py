"""Table loading for the engine's star schema.

Parquet is the canonical storage format (columnar, predicate pushdown,
column pruning). ``Tables`` binds DataFrames lazily *per table* — no
parquet footer is even opened until a query touches that table, so a plan
over ``lineitem`` never pays for ``events``.

``events.ts`` is stored as parquet TIMESTAMP(NANOS), which Spark's vectorized
reader rejects; we read it as raw nanos (``spark.sql.legacy.parquet.nanosAsLong``)
and normalize to a microsecond timestamp at the source so every downstream
operator sees a plain ``timestamp`` column.
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
        if name == "events" and dict(df.dtypes).get("ts") == "bigint":
            # nanos-since-epoch → microsecond timestamp; integral `div`
            # keeps full precision (double division would not past 2^53).
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
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
