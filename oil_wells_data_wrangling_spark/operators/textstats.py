"""Text-analysis operator family (SURVEY.md §2.C).

Per-document language scoring, quality metrics, token counting, and
fingerprinting over the ``documents`` table — the per-row filters a
training-data pipeline applies before dedup/mixing.

Everything is array/string intrinsics on the row — single scan, no
shuffle, no UDF; ratios are int/int divisions so results are exactly
reproducible across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from oil_wells_data_wrangling_spark.plans.registry import register
from oil_wells_data_wrangling_spark.sources.readers import load_tables

_EN_STOP = ("the", "a", "of", "and", "to", "in", "is", "for")
_STOP_SPARK = "array(" + ", ".join(f"'{w}'" for w in _EN_STOP) + ")"
_STOP_DUCK = "[" + ", ".join(f"'{w}'" for w in _EN_STOP) + "]"


# -------------------------------------------------------------------- lang_id

_LANGID_ORACLE = f"""
WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS words FROM documents
)
SELECT doc_id,
       CAST(len(list_filter(words, w -> list_contains({_STOP_DUCK}, w))) AS BIGINT)
         AS n_stop,
       len(list_filter(words, w -> list_contains({_STOP_DUCK}, w)))
         / len(words) AS stop_ratio,
       CASE WHEN len(list_filter(words, w -> list_contains({_STOP_DUCK}, w)))
                 / len(words) > 0.05
            THEN 'en' ELSE 'und' END AS predicted_lang
FROM t
"""


@register("lang_id", oracle=_LANGID_ORACLE)
def lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-ratio language heuristic (n-gram language ID degenerates
    to seed-set token overlap on the synthetic corpus). The per-language
    seed sets extend by adding more filter() terms — still one scan."""
    t = load_tables(spark, sf_dir)
    words = F.split("text", " ")
    n_stop = F.size(
        F.expr(f"filter(split(text, ' '), w -> array_contains({_STOP_SPARK}, w))")
    )
    ratio = n_stop / F.size(words)
    return t.documents.select(
        "doc_id",
        n_stop.cast("bigint").alias("n_stop"),
        ratio.alias("stop_ratio"),
        F.when(ratio > 0.05, "en").otherwise("und").alias("predicted_lang"),
    )


# -------------------------------------------------------------- quality_score

_QUALITY_ORACLE = """
WITH t AS (
  SELECT doc_id, text, string_split(text, ' ') AS words FROM documents
)
SELECT doc_id,
       CAST(length(text) AS BIGINT) AS n_chars,
       CAST(len(words) AS BIGINT) AS n_words,
       CAST(len(list_distinct(words)) AS BIGINT) AS n_distinct,
       len(list_distinct(words)) / len(words) AS distinct_ratio,
       CAST(list_sum(list_transform(words, w -> length(w))) AS DOUBLE)
         / len(words) AS avg_word_len
FROM t
"""


@register("quality_score", oracle=_QUALITY_ORACLE)
def quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length / vocabulary-diversity / word-size quality metrics — the
    repetition and boilerplate filters of a pretraining pipeline."""
    t = load_tables(spark, sf_dir)
    words = F.split("text", " ")
    n_words = F.size(words)
    n_distinct = F.size(F.array_distinct(words))
    sum_len = F.expr(
        "aggregate(transform(split(text, ' '), w -> length(w)), 0L, (acc, v) -> acc + v)"
    )
    return t.documents.select(
        "doc_id",
        F.length("text").cast("bigint").alias("n_chars"),
        n_words.cast("bigint").alias("n_words"),
        n_distinct.cast("bigint").alias("n_distinct"),
        (n_distinct / n_words).alias("distinct_ratio"),
        (sum_len.cast("double") / n_words).alias("avg_word_len"),
    )


# ---------------------------------------------------------------- token_count

_TOKENS_ORACLE = """
SELECT doc_id,
       CAST(len(string_split(text, ' ')) AS BIGINT) AS ws_tokens,
       CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS BIGINT)
         AS bpe_tokens
FROM documents
"""


@register("token_count", oracle=_TOKENS_ORACLE)
def token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace tokens + a BPE-ish regex tokenizer (letter runs, digit
    runs, single symbols) — the cost estimator for token budgets."""
    t = load_tables(spark, sf_dir)
    return t.documents.select(
        "doc_id",
        F.size(F.split("text", " ")).cast("bigint").alias("ws_tokens"),
        F.regexp_count("text", F.lit("[a-z]+|[0-9]+|[^a-z0-9 ]"))
        .cast("bigint")
        .alias("bpe_tokens"),
    )


# ----------------------------------------------------------- fingerprint_diff

_FPDIFF_ORACLE = """
WITH snap_a AS (
  SELECT doc_id, md5(text) AS fp FROM documents WHERE doc_id % 17 <> 0
),
snap_b AS (
  SELECT doc_id,
         CASE WHEN doc_id % 10 = 0 THEN md5(text || ' v2') ELSE md5(text) END AS fp
  FROM documents
)
SELECT
  CASE WHEN a.doc_id IS NULL THEN 'added'
       WHEN b.doc_id IS NULL THEN 'removed'
       WHEN a.fp <> b.fp THEN 'changed'
       ELSE 'unchanged' END AS status,
  CAST(COUNT(*) AS BIGINT) AS n_docs
FROM snap_a a FULL OUTER JOIN snap_b b ON a.doc_id = b.doc_id
GROUP BY 1
"""


@register("fingerprint_diff", oracle=_FPDIFF_ORACLE)
def fingerprint_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-snapshot dataset diff by content fingerprint: full outer
    join on doc identity, classify added/removed/changed/unchanged —
    the audit step between two crawls/exports. One co-partitioned join;
    only (id, 16-byte hash) pairs move."""
    t = load_tables(spark, sf_dir)
    base = t.documents.select("doc_id", "text")
    snap_a = base.filter(F.col("doc_id") % 17 != 0).select(
        F.col("doc_id").alias("a_id"), F.md5("text").alias("a_fp")
    )
    snap_b = base.select(
        F.col("doc_id").alias("b_id"),
        F.when(
            F.col("doc_id") % 10 == 0, F.md5(F.concat(F.col("text"), F.lit(" v2")))
        )
        .otherwise(F.md5("text"))
        .alias("b_fp"),
    )
    joined = snap_a.join(snap_b, F.col("a_id") == F.col("b_id"), "full_outer")
    status = (
        F.when(F.col("a_id").isNull(), "added")
        .when(F.col("b_id").isNull(), "removed")
        .when(F.col("a_fp") != F.col("b_fp"), "changed")
        .otherwise("unchanged")
    )
    return joined.groupBy(status.alias("status")).agg(
        F.count(F.lit(1)).alias("n_docs")
    )


# ---------------------------------------------------------------- fingerprint

_FP_ORACLE = """
SELECT doc_id,
       md5(lower(trim(regexp_replace(text, '[ \t]+', ' ', 'g')))) AS fp,
       CAST(greatest(len(string_split(text, ' ')) - 2, 0) AS BIGINT) AS n_shingles
FROM documents
"""


@register("fingerprint", oracle=_FP_ORACLE)
def fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalized-content fingerprint (md5 of whitespace-collapsed
    lowercase text) + shingle count — the join key for cross-snapshot
    document identity.

    Plain whitespace-collapse only (no unicode-punctuation translate):
    the normalization must be byte-identical to the oracle's, and a
    fingerprint key wants the cheapest canonical form that survives
    re-wrapping — punctuation variants are near-dup territory
    (dedup_minhash), not identity."""
    t = load_tables(spark, sf_dir)
    return t.documents.select(
        "doc_id",
        F.md5(F.lower(F.trim(F.regexp_replace("text", "[ \\t]+", " ")))).alias("fp"),
        F.greatest(F.size(F.split("text", " ")) - 2, F.lit(0))
        .cast("bigint")
        .alias("n_shingles"),
    )
