"""JSON-lines corpus source (SURVEY.md §2.E).

The interchange format every training-data pipeline ingests (crawl
dumps, instruction datasets, API exports ship as .jsonl/.jsonl.gz).
Design rules for 100 TB:

- EXPLICIT schema, never ``inferSchema``: inference is a full extra
  pass over the data before the real read, and a schema that drifts
  with the sampled files is a silent correctness bug. The caller
  declares the contract; rows that break it are *captured*, not
  inferred around.
- PERMISSIVE + ``columnNameOfCorruptRecord``: one malformed line must
  not fail a 10^6-file read. Corrupt lines keep their raw text in a
  side column, good rows parse normally; ``split_corrupt`` routes the
  two onto separate DataFrames (the bad-rows sidecar the reference
  writes for CSV, pdf_to_db.py:284-298, applied to JSONL).
- Line-splittable: plain .jsonl splits by newline into per-block tasks
  (multiLine=False — a single-document JSON array would serialize the
  whole file through one task); .gz files are whole-file tasks, so
  shard uploads into many files rather than one big archive.
- The streaming twin is the same reader through ``readStream`` with
  the same explicit schema — used for continuous ingestion landing
  zones; ``maxFilesPerTrigger`` bounds micro-batch size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

_CORRUPT_COL = "_corrupt_record"

# The documents-table contract (TESTDATA.md) as a JSONL schema, plus
# the corrupt-record capture column.
DOCUMENTS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
        T.StructField(_CORRUPT_COL, T.StringType()),
    ]
)


def read_jsonl(
    spark: SparkSession, path: str, schema: T.StructType
) -> DataFrame:
    """Read newline-delimited JSON with an explicit schema and corrupt-
    record capture. ``schema`` must include a string ``_corrupt_record``
    field (Spark requires the capture column to be part of the schema)."""
    if _CORRUPT_COL not in schema.fieldNames():
        schema = T.StructType(
            list(schema.fields)
            + [T.StructField(_CORRUPT_COL, T.StringType())]
        )
    return (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", _CORRUPT_COL)
        .json(path)
    )


def read_jsonl_stream(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    max_files_per_trigger: int = 16,
) -> DataFrame:
    """Streaming twin of :func:`read_jsonl` for a landing-zone folder.

    Identical schema contract; ``maxFilesPerTrigger`` bounds the files
    pulled per micro-batch so one large backlog drain cannot blow the
    executor memory budget."""
    if _CORRUPT_COL not in schema.fieldNames():
        schema = T.StructType(
            list(schema.fields)
            + [T.StructField(_CORRUPT_COL, T.StringType())]
        )
    return (
        spark.readStream.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", _CORRUPT_COL)
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .json(path)
    )


def split_corrupt(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(good, bad): route parsed rows and corrupt raw lines apart.

    ``good`` drops the capture column; ``bad`` carries only the raw
    line — the sidecar a pipeline writes for replay after a parser
    fix (same diagnostic contract as the CSV bad-rows export).

    The frame is cached first, for two reasons: both outputs consume
    the same parse (one materialization, two filters — what a
    production pipeline gets by landing the parsed frame before
    routing), and Spark disallows queries whose file-scan schema is
    ONLY the internal corrupt-record column, which the ``bad`` branch
    would otherwise be (SPARK-21610's documented cache workaround)."""
    df = df.cache()
    good = df.filter(F.col(_CORRUPT_COL).isNull()).drop(_CORRUPT_COL)
    bad = df.filter(F.col(_CORRUPT_COL).isNotNull()).select(
        F.col(_CORRUPT_COL).alias("raw_line")
    )
    return good, bad
