"""Similarity-search operator family (SURVEY.md §2.C).

Embedding-space operators over ``embeddings`` (vec_id, embedding
array<float>, label): brute-force cosine top-k (the correctness
baseline), label-blocked near-duplicate pairs, and random-hyperplane
LSH bucketing (the scale path that bounds the candidate set).

Determinism: cosines are computed with sequential double-precision
array folds (zip_with + aggregate) — identical left-to-right order in
Spark and in the DuckDB oracle's list_transform/list_sum — and rounded
to 6 decimals in outputs so the driver's value-hash compare is stable.
(DuckDB's built-in list_cosine_similarity runs in float precision and
is NOT used.)

Scale: brute-force paths are explicitly bounded (fixed query set /
label blocking); the LSH variant is the 100 TB design — each vector
maps to a bucket via 8 fixed hyperplanes, so the self-join degenerates
to bucket-local comparisons.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType
from pyspark.sql.window import Window

from oil_wells_data_wrangling_spark.plans.registry import register
from oil_wells_data_wrangling_spark.sources.readers import load_tables

_DIM = 64


def _dot_spark(a: str, b: str) -> Column:
    """Sequential double-precision dot product of two float-array columns."""
    return F.expr(
        f"aggregate(zip_with({a}, {b}, (x, y) -> cast(x as double) * cast(y as double)), "
        "0D, (acc, v) -> acc + v)"
    )


def _dot_spark_unrolled(a: str, b: str) -> Column:
    """The same left-associated fp addition chain as ``_dot_spark``,
    UNROLLED to {_DIM} explicit element_at terms so it compiles in
    whole-stage codegen instead of dispatching an interpreted lambda
    per element. BIT-equal to the HOF form (same association order;
    0.0+x == x exactly) — A/B measured per shape before use: 1.35×
    faster on embedding_outliers' 16-centroid argmin scan, but NOT
    faster on ann_topk's window-rank shape (the 3×64-term expression
    there neutralizes the win), so callers opt in per operator rather
    than globally. Fixed {_DIM} dims assumed, like ``_dot_duck``; under
    Spark 4's default ANSI mode a short array fails loudly
    (INVALID_ARRAY_INDEX from element_at) rather than silently
    truncating — the HOF form would instead null the sum via
    zip_with's null padding."""
    terms = " + ".join(
        f"cast(element_at({a}, {i}) as double)"
        f" * cast(element_at({b}, {i}) as double)"
        for i in range(1, _DIM + 1)
    )
    return F.expr(terms)


def cosine_unrolled(a: str, b: str) -> Column:
    return _dot_spark_unrolled(a, b) / (
        F.sqrt(_dot_spark_unrolled(a, a)) * F.sqrt(_dot_spark_unrolled(b, b))
    )


def _dot_duck(a: str, b: str) -> str:
    return (
        f"list_sum(list_transform(range(1, {_DIM + 1}), "
        f"i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)))"
    )


def cosine(a: str, b: str) -> Column:
    return _dot_spark(a, b) / (
        F.sqrt(_dot_spark(a, a)) * F.sqrt(_dot_spark(b, b))
    )


def _cos_duck(a: str, b: str) -> str:
    return (
        f"{_dot_duck(a, b)} / (sqrt({_dot_duck(a, a)}) * sqrt({_dot_duck(b, b)}))"
    )


def _fold_dot_np(A, B):
    """Row-wise dot products with the EXACT addition order of
    ``_dot_spark``'s ``aggregate(zip_with(...), 0D, (acc, v) -> acc + v)``
    fold: per-element fp64 products (float→double casts are exact and
    IEEE multiplication is identical in numpy and the JVM), then a
    left-to-right accumulation done as one vectorized column-add per
    element position.  Every row's sum is therefore the same
    left-associated fp64 addition chain the JVM evaluates, so the
    result is BIT-IDENTICAL to the interpreted HOF — not merely close
    (a numpy ``A @ B`` matmul would use pairwise/SIMD summation and
    could differ in the last ulp, which a later round-to-6dp could
    amplify into a rank flip)."""
    import numpy as np

    P = A * B
    acc = np.zeros(P.shape[0], dtype=np.float64)
    for i in range(P.shape[1]):
        acc = acc + P[:, i]
    return acc


def _cos_exact_batch(a, b):
    """Vectorized twin of :func:`cosine` over two pandas Series of
    float arrays — same fp op sequence (dot / (sqrt(aa) * sqrt(bb)));
    numpy sqrt/multiply/divide are the same correctly-rounded IEEE
    ops as the JVM's, so outputs are bit-identical to the HOF form."""
    import numpy as np
    import pandas as pd

    if len(a) == 0:
        return pd.Series([], dtype="float64")
    A = np.array(a.tolist(), dtype=np.float64)
    B = np.array(b.tolist(), dtype=np.float64)
    num = _fold_dot_np(A, B)
    den = np.sqrt(_fold_dot_np(A, A)) * np.sqrt(_fold_dot_np(B, B))
    return pd.Series(num / den)


# Arrow-vectorized exact cosine for pair frames (guide §4.2): replaces
# the per-row interpreted zip_with/aggregate lambda dispatch with numpy
# batch arithmetic while keeping bit-equality (argument above). Used by
# the similarity EVAL operators whose pair rows already carry both
# vectors; operators whose plans win from pure-JVM codegen (ann_topk's
# window shape) deliberately stay on the HOF/unrolled forms.
_cos_exact_pd = F.pandas_udf(_cos_exact_batch, DoubleType())


def _gram_dropped_mask(x, ids, n2, tau_num, tau_den):
    """Per-row "has a smaller-id cluster-mate with cos ≥ τ" verdict for
    the SemDeDup kernels, computed as ROW-CHUNKED exact-int64 Gram
    blocks (guide §5): one chunk × |cluster| block at a time bounds the
    task's Gram memory at ~tens of MB regardless of cluster size — the
    one-shot |cluster|² matmul of a mega-cell would OOM the task where
    the pre-r15 SQL pair join merely spilled. Per-pair arithmetic is
    unchanged (same int64 products, same ``dot>0 AND dot²·τ_den ≥
    τ_num·‖a‖²·‖b‖²`` comparison), so verdicts are bit-identical to the
    unblocked matmul."""
    import numpy as np

    n = len(ids)
    out = np.zeros(n, dtype=bool)
    chunk = max(1, (4 << 20) // max(n, 1))  # ≈32 MB of int64 per block
    for lo in range(0, n, chunk):
        hi = min(lo + chunk, n)
        g = x[lo:hi] @ x.T
        cond = (g > 0) & (
            g * g * tau_den >= tau_num * np.outer(n2[lo:hi], n2)
        )
        smaller = ids[None, :] < ids[lo:hi, None]
        out[lo:hi] = (cond & smaller).any(axis=1)
    return out


# ------------------------------------------------------------------ ann_topk

_TOPK_ORACLE = f"""
WITH q AS (
  SELECT vec_id AS query_id, embedding AS qe FROM embeddings WHERE vec_id < 8
),
c AS (
  SELECT query_id, e.vec_id AS neighbor_id,
         ROUND({_cos_duck('qe', 'e.embedding')}, 6) AS cos_r
  FROM q, embeddings e WHERE e.vec_id <> query_id
)
SELECT query_id, neighbor_id, CAST(rk AS INTEGER) AS rank, cos_r
FROM (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY query_id ORDER BY cos_r DESC, neighbor_id
  ) AS rk FROM c
) WHERE rk <= 5
"""


@register("ann_topk", oracle=_TOPK_ORACLE, headline=True)
def ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-5 for a fixed query set (vec_id < 8).

    The query side is broadcast, so the corpus streams through one scan
    and only (query, k) survivors shuffle for the ranking window. Rank
    on the *rounded* cosine + id so ordering is engine-independent."""
    t = load_tables(spark, sf_dir)
    q = t.embeddings.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe")
    )
    corpus = t.embeddings.select(
        F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("ne")
    )
    scored = (
        corpus.join(F.broadcast(q), F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine("qe", "ne"), 6).alias("cos_r"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_r").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 5)
        .select("query_id", "neighbor_id", "rank", "cos_r")
    )


# ---------------------------------------------------------- vector_normalize

_VNORM_ORACLE = f"""
SELECT vec_id,
       ROUND(sqrt({_dot_duck('embedding', 'embedding')}), 6) AS l2_norm,
       ROUND(embedding[1] / sqrt({_dot_duck('embedding', 'embedding')}), 6)
         AS unit_first
FROM embeddings
"""


@register("vector_normalize", oracle=_VNORM_ORACLE)
def vector_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L2 vector normalization — the prep step that turns cosine ANN into
    dot-product ANN (normalize once, compare cheaply ever after). Emits
    the norm and the first unit-vector component as checkable scalars."""
    t = load_tables(spark, sf_dir)
    norm = F.sqrt(_dot_spark("embedding", "embedding"))
    return t.embeddings.select(
        "vec_id",
        F.round(norm, 6).alias("l2_norm"),
        F.round(F.element_at("embedding", 1).cast("double") / norm, 6).alias(
            "unit_first"
        ),
    )


# ---------------------------------------------------------------- ivf_assign

_IVF_ORACLE = f"""
WITH cent AS (
  SELECT vec_id AS centroid_id, embedding AS ce FROM embeddings WHERE vec_id < 16
),
scored AS (
  SELECT e.vec_id, centroid_id,
         ROUND({_cos_duck('e.embedding', 'ce')}, 6) AS cos_r
  FROM embeddings e, cent
)
SELECT vec_id, centroid_id, cos_r
FROM (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY vec_id ORDER BY cos_r DESC, centroid_id
  ) AS rk FROM scored
) WHERE rk = 1
"""


@register("ivf_assign", oracle=_IVF_ORACLE)
def ivf_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF coarse quantization: assign every vector to its nearest
    centroid (here a fixed deterministic centroid set; in production the
    k-means output). This is the inverted-file ANN scale path — queries
    probe only the top centroid buckets instead of the corpus. Centroids
    broadcast; one window shuffle on vec_id."""
    t = load_tables(spark, sf_dir)
    cent = t.embeddings.filter(F.col("vec_id") < 16).select(
        F.col("vec_id").alias("centroid_id"), F.col("embedding").alias("ce")
    )
    scored = t.embeddings.select("vec_id", "embedding").crossJoin(
        F.broadcast(cent)
    ).select(
        "vec_id",
        "centroid_id",
        F.round(cosine("embedding", "ce"), 6).alias("cos_r"),
    )
    w = Window.partitionBy("vec_id").orderBy(F.col("cos_r").desc(), F.col("centroid_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select("vec_id", "centroid_id", "cos_r")
    )


# ------------------------------------------------------------------- ann_lsh

_N_PLANES = 8


def _planes(n_planes: int = _N_PLANES) -> list[list[float]]:
    """Fixed pseudo-random hyperplanes derived from md5 — reproducible
    everywhere, no RNG state."""
    out = []
    for j in range(n_planes):
        row = []
        for d in range(_DIM):
            h = int(hashlib.md5(f"{j}_{d}".encode()).hexdigest()[:8], 16)
            row.append((h % 1000 - 500) / 500.0)
        out.append(row)
    return out


def _lsh_oracle() -> str:
    planes = _planes()
    bits = []
    for j, row in enumerate(planes):
        arr = "[" + ", ".join(repr(v) for v in row) + "]"
        bits.append(
            f"(CASE WHEN {_dot_duck('embedding', arr)} > 0 THEN {1 << j} ELSE 0 END)"
        )
    bucket = " + ".join(bits)
    return f"""
SELECT CAST({bucket} AS BIGINT) AS bucket, CAST(COUNT(*) AS BIGINT) AS n_vecs
FROM embeddings GROUP BY 1
"""


def _bucket_expr_spark(n_planes: int = _N_PLANES) -> str:
    cols = []
    for j, row in enumerate(_planes(n_planes)):
        arr_sql = "array(" + ", ".join(f"cast({repr(v)} as double)" for v in row) + ")"
        dot_sql = (
            f"aggregate(zip_with(embedding, {arr_sql}, "
            "(x, y) -> cast(x as double) * y), 0D, (acc, v) -> acc + v)"
        )
        cols.append(f"(CASE WHEN {dot_sql} > 0 THEN {1 << j}L ELSE 0L END)")
    return " + ".join(cols)


def _bucket_expr_duck(n_planes: int = _N_PLANES) -> str:
    bits = []
    for j, row in enumerate(_planes(n_planes)):
        arr = "[" + ", ".join(repr(v) for v in row) + "]"
        bits.append(
            f"(CASE WHEN {_dot_duck('embedding', arr)} > 0 THEN {1 << j} ELSE 0 END)"
        )
    return " + ".join(bits)


def _ann_pipeline_oracle() -> str:
    return f"""
WITH bucketed AS (
  SELECT vec_id, embedding, CAST({_bucket_expr_duck()} AS BIGINT) AS bucket
  FROM embeddings
),
scored AS (
  SELECT a.vec_id, a.bucket, b.vec_id AS neighbor_id,
         ROUND({_cos_duck('a.embedding', 'b.embedding')}, 6) AS cos_r
  FROM bucketed a JOIN bucketed b
    ON a.bucket = b.bucket AND a.vec_id <> b.vec_id
)
SELECT vec_id, bucket, neighbor_id, cos_r
FROM (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY vec_id ORDER BY cos_r DESC, neighbor_id
  ) AS rk FROM scored
) WHERE rk = 1
"""


@register("ann_pipeline", oracle=_ann_pipeline_oracle())
def ann_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composed LSH-accelerated nearest neighbor: hyperplane-bucket every
    vector, then search only inside the bucket (≈1/256 of the corpus per
    probe) for the best cosine match. The self-join is bucket-local —
    this is the shape that replaces ann_topk's brute force at scale.
    Vectors in singleton buckets have no neighbor and drop out, exactly
    the recall/efficiency trade LSH makes."""
    emb = load_tables(spark, sf_dir).embeddings
    # No cache: each join side recomputes the 8 plane dots — measured
    # faster than caching (0.63s vs 0.88s at sf0.1), nothing leaks.
    bucketed = emb.select(
        "vec_id", "embedding", F.expr(_bucket_expr_spark()).alias("bucket")
    )
    a = bucketed.select(
        F.col("vec_id").alias("vec_id"),
        F.col("bucket").alias("bucket"),
        F.col("embedding").alias("ea"),
    )
    b = bucketed.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("bucket").alias("b_bucket"),
        F.col("embedding").alias("eb"),
    )
    scored = a.join(
        b,
        (F.col("bucket") == F.col("b_bucket"))
        & (F.col("vec_id") != F.col("neighbor_id")),
    ).select(
        "vec_id",
        "bucket",
        "neighbor_id",
        F.round(cosine("ea", "eb"), 6).alias("cos_r"),
    )
    w = Window.partitionBy("vec_id").orderBy(F.col("cos_r").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select("vec_id", "bucket", "neighbor_id", "cos_r")
    )


@register("ann_lsh", oracle=_lsh_oracle())
def ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Random-hyperplane LSH bucketing: 8 fixed planes → 8 sign bits →
    256 buckets. At scale, ANN search joins only within a bucket (or its
    hamming-1 neighborhood) instead of the full corpus."""
    planes = _planes()
    emb = load_tables(spark, sf_dir).embeddings
    cols = []
    for j, row in enumerate(planes):
        arr_sql = "array(" + ", ".join(f"cast({repr(v)} as double)" for v in row) + ")"
        dot_sql = (
            f"aggregate(zip_with(embedding, {arr_sql}, "
            "(x, y) -> cast(x as double) * y), 0D, (acc, v) -> acc + v)"
        )
        cols.append(f"(CASE WHEN {dot_sql} > 0 THEN {1 << j}L ELSE 0L END)")
    bucket_expr = F.expr(" + ".join(cols))
    return (
        emb.select(bucket_expr.alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n_vecs"))
    )


# -------------------------------------------------------------- embed_neardup


def _neardup_oracle() -> str:
    return f"""
WITH bucketed AS (
  SELECT vec_id, label, embedding,
         CAST({_bucket_expr_duck()} AS BIGINT) AS bucket
  FROM embeddings
)
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       ROUND({_cos_duck('a.embedding', 'b.embedding')}, 6) AS cos_r
FROM bucketed a JOIN bucketed b
  ON a.label = b.label AND a.bucket = b.bucket AND a.vec_id < b.vec_id
WHERE ROUND({_cos_duck('a.embedding', 'b.embedding')}, 6) >= 0.3
"""


@register("embed_neardup", oracle=_neardup_oracle())
def embed_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs, blocked on
    (label, LSH sign-bucket) with an in-bucket exact cosine re-check.

    Label alone is too coarse a block (10 distinct labels → each block
    is O(n²/10), all-pairs over millions of vectors at 100×). Adding the
    8-hyperplane sign bucket splits every label into ≤256 sub-blocks, so
    the self-join compares ~1/256 of each label block — the standard
    LSH near-dup recall/efficiency trade (high-cosine pairs land in the
    same bucket with high probability)."""
    t = load_tables(spark, sf_dir)
    # No cache: each join side recomputes the 8 plane dots (one extra
    # scan of a broadcast-sized projection) — measured faster than the
    # cache (0.42s vs 0.53s at sf0.1) and leaks nothing into storage.
    bucketed = t.embeddings.select(
        "vec_id",
        "label",
        "embedding",
        F.expr(_bucket_expr_spark()).alias("bucket"),
    )
    a = bucketed.select(
        F.col("vec_id").alias("vec_a"),
        F.col("label").alias("la"),
        F.col("bucket").alias("ba"),
        F.col("embedding").alias("ea"),
    )
    b = bucketed.select(
        F.col("vec_id").alias("vec_b"),
        F.col("label").alias("lb"),
        F.col("bucket").alias("bb"),
        F.col("embedding").alias("eb"),
    )
    cos_r = F.round(cosine("ea", "eb"), 6)
    return (
        a.join(
            b,
            (F.col("la") == F.col("lb"))
            & (F.col("ba") == F.col("bb"))
            & (F.col("vec_a") < F.col("vec_b")),
        )
        .select("vec_a", "vec_b", cos_r.alias("cos_r"))
        .filter(F.col("cos_r") >= 0.3)
    )


# ------------------------------------------------------------- vector_quantize

# Shared sub-expressions (kept as strings so Spark and DuckDB evaluate
# the literal same arithmetic: ((x - mn) * 254) / (mx - mn), rounded).
_MN_S = "cast(array_min(embedding) as double)"
_MX_S = "cast(array_max(embedding) as double)"
_MN_D = "CAST(list_min(embedding) AS DOUBLE)"
_MX_D = "CAST(list_max(embedding) AS DOUBLE)"

_Q_S = (
    f"transform(embedding, x -> cast(round((cast(x as double) - {_MN_S}) * 254"
    f" / ({_MX_S} - {_MN_S})) as bigint) - 127)"
)
_Q_D = (
    f"list_transform(embedding, x -> CAST(round((CAST(x AS DOUBLE) - {_MN_D}) * 254"
    f" / ({_MX_D} - {_MN_D})) AS BIGINT) - 127)"
)
_ERR_S = (
    f"transform(embedding, x -> abs(cast(x as double) - ({_MN_S}"
    f" + round((cast(x as double) - {_MN_S}) * 254 / ({_MX_S} - {_MN_S}))"
    f" * ({_MX_S} - {_MN_S}) / 254)))"
)
_ERR_D = (
    f"list_transform(embedding, x -> abs(CAST(x AS DOUBLE) - ({_MN_D}"
    f" + round((CAST(x AS DOUBLE) - {_MN_D}) * 254 / ({_MX_D} - {_MN_D}))"
    f" * ({_MX_D} - {_MN_D}) / 254)))"
)

_VQUANT_ORACLE = f"""
SELECT vec_id,
  ROUND({_MN_D}, 6) AS v_min,
  ROUND({_MX_D}, 6) AS v_max,
  CASE WHEN list_min(embedding) = list_max(embedding) THEN 0
       ELSE CAST(({_Q_D})[1] AS BIGINT) END AS q_first,
  CASE WHEN list_min(embedding) = list_max(embedding) THEN 0
       ELSE CAST(list_sum({_Q_D}) AS BIGINT) END AS q_sum,
  CASE WHEN list_min(embedding) = list_max(embedding) THEN 0.0
       ELSE ROUND(list_sum({_ERR_D}) / {_DIM}, 6) END AS recon_err
FROM embeddings
"""


@register("vector_quantize", oracle=_VQUANT_ORACLE)
def vector_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vector int8 scalar quantization — the 4× memory shrink that
    makes billion-vector ANN indexes fit: q = round((x-min)·254/range)
    - 127 per dimension, dequantization error reported as the mean
    absolute residual. All array intrinsics in one scan; the checkable
    scalars are the first code, the code-sum, and the rounded error."""
    t = load_tables(spark, sf_dir)
    degenerate = F.expr("array_min(embedding) = array_max(embedding)")
    return t.embeddings.select(
        "vec_id",
        F.round(F.expr(_MN_S), 6).alias("v_min"),
        F.round(F.expr(_MX_S), 6).alias("v_max"),
        F.when(degenerate, F.lit(0))
        .otherwise(F.expr(f"element_at({_Q_S}, 1)"))
        .cast("bigint")
        .alias("q_first"),
        F.when(degenerate, F.lit(0))
        .otherwise(F.expr(f"aggregate({_Q_S}, 0L, (acc, v) -> acc + v)"))
        .cast("bigint")
        .alias("q_sum"),
        F.when(degenerate, F.lit(0.0))
        .otherwise(
            F.round(
                F.expr(f"aggregate({_ERR_S}, 0D, (acc, v) -> acc + v)") / _DIM, 6
            )
        )
        .alias("recon_err"),
    )


# ------------------------------------------------------------------- ann_pq

# Product quantization: split the 64-dim vector into 8 subvectors of 8
# dims; each subvector snaps to the nearest of 16 codebook entries (the
# first 16 vectors' corresponding slices — a deterministic stand-in for
# k-means centroids, like ivf_assign's centroid set). Distances are
# sequential double folds rounded to 6, ties break on centroid id.
_PQ_M = 8       # subvectors
_PQ_DSUB = 8    # dims per subvector
_PQ_K = 16      # codebook entries per subspace


def _sub_dot_spark(a: str, b: str, off: int) -> str:
    """Σ (a[off+i] - b[off+i])² over one subvector, as a Spark expr."""
    return (
        f"aggregate(zip_with(slice({a}, {off + 1}, {_PQ_DSUB}),"
        f" slice({b}, {off + 1}, {_PQ_DSUB}),"
        " (x, y) -> (cast(x as double) - cast(y as double))"
        " * (cast(x as double) - cast(y as double))), 0D, (acc, v) -> acc + v)"
    )


def _sub_dot_duck(a: str, b: str, off: int) -> str:
    return (
        f"list_sum(list_transform(range(1, {_PQ_DSUB + 1}),"
        f" i -> (CAST({a}[{off} + i] AS DOUBLE) - CAST({b}[{off} + i] AS DOUBLE))"
        f" * (CAST({a}[{off} + i] AS DOUBLE) - CAST({b}[{off} + i] AS DOUBLE))))"
    )


def _pq_oracle() -> str:
    # same argmin-with-tiebreak as the Spark side: MIN over a (dist, cid)
    # struct compares lexicographically, ties resolve to the lowest cid
    dist_cols = ",\n         ".join(
        f"ROUND({_sub_dot_duck('e.embedding', 'c.ce', m * _PQ_DSUB)}, 6) AS d_{m}"
        for m in range(_PQ_M)
    )
    code_cols = ",\n  ".join(
        f"(MIN(struct_pack(d := d_{m}, c := cid))).c AS code_{m}"
        for m in range(_PQ_M)
    )
    codes = " + ".join(f"code_{m}" for m in range(_PQ_M))
    return f"""
WITH cb AS (
  SELECT vec_id AS cid, embedding AS ce FROM embeddings WHERE vec_id < {_PQ_K}
),
d AS (
  SELECT e.vec_id, c.cid,
         {dist_cols}
  FROM embeddings e CROSS JOIN cb c
),
coded AS (
  SELECT vec_id,
  {code_cols}
  FROM d GROUP BY vec_id
)
SELECT vec_id, CAST(code_0 AS BIGINT) AS code_first,
       CAST({codes} AS BIGINT) AS code_sum
FROM coded
"""


@register("ann_pq", oracle=_pq_oracle())
def ann_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product quantization encode — with ivf_assign this is IVFPQ, the
    billion-vector ANN layout: 64 dims compress to 8 one-byte codes
    (64× smaller than float32), and distance tables over the codebooks
    make scans cheap. The codebook (16 entries × 8 subspaces) broadcasts;
    encoding is a per-row argmin over 16 candidates — no shuffle until
    the final checkable projection."""
    t = load_tables(spark, sf_dir)
    cb = F.broadcast(
        t.embeddings.filter(F.col("vec_id") < _PQ_K).select(
            F.col("vec_id").alias("cid"), F.col("embedding").alias("ce")
        )
    )
    e = t.embeddings.select("vec_id", "embedding").crossJoin(cb)
    dists = e.select(
        "vec_id",
        "cid",
        *[
            F.round(
                F.expr(_sub_dot_spark("embedding", "ce", m * _PQ_DSUB)), 6
            ).alias(f"d_{m}")
            for m in range(_PQ_M)
        ],
    )
    codes = dists.groupBy("vec_id").agg(
        *[
            F.min(F.struct(f"d_{m}", "cid")).getField("cid").alias(f"code_{m}")
            for m in range(_PQ_M)
        ]
    )
    code_sum = sum([F.col(f"code_{m}") for m in range(_PQ_M)], F.lit(0))
    return codes.select(
        "vec_id",
        F.col("code_0").cast("bigint").alias("code_first"),
        code_sum.cast("bigint").alias("code_sum"),
    )


# -------------------------------------------------------------- ivf_pq_search

# The composed IVFPQ QUERY path (ivf_assign builds the cells, ann_pq
# builds the codes; this is the read side a vector database actually
# serves): each query probes its nprobe nearest cells and ranks ONLY
# those cells' members by PQ asymmetric distance — the query's exact
# per-subspace distances to the 16 codebook entries, summed over the
# candidate's 8 stored codes.
_IVFPQ_NPROBE = 4
_IVFPQ_TOPK = 5
_IVFPQ_QLO, _IVFPQ_QHI = 100, 131  # fixed 32-query workload


def _ivfpq_oracle() -> str:
    code_cols = ",\n  ".join(
        f"(MIN(struct_pack(d := ROUND("
        f"{_sub_dot_duck('e.embedding', 'c.ce', m * _PQ_DSUB)}, 6),"
        f" c := c.cid))).c AS code_{m}"
        for m in range(_PQ_M)
    )
    adist = " + ".join(
        f"ROUND({_sub_dot_duck('cand.qe', f'c{m}.ce', m * _PQ_DSUB)}, 6)"
        for m in range(_PQ_M)
    )
    cb_joins = "\n  ".join(
        f"JOIN cb c{m} ON c{m}.cid = cand.code_{m}" for m in range(_PQ_M)
    )
    return f"""
WITH cb AS (
  SELECT vec_id AS cid, embedding AS ce FROM embeddings
  WHERE vec_id < {_PQ_K}
),
assign AS (
  SELECT vec_id, cid AS cell FROM (
    SELECT e.vec_id, c.cid, ROW_NUMBER() OVER (
      PARTITION BY e.vec_id
      ORDER BY ROUND({_cos_duck('e.embedding', 'c.ce')}, 6) DESC, c.cid
    ) AS rk
    FROM embeddings e, cb c
  ) WHERE rk = 1
),
codes AS (
  SELECT e.vec_id,
  {code_cols}
  FROM embeddings e CROSS JOIN cb c GROUP BY e.vec_id
),
q AS (
  SELECT vec_id AS query_id, embedding AS qe FROM embeddings
  WHERE vec_id BETWEEN {_IVFPQ_QLO} AND {_IVFPQ_QHI}
),
qcell AS (
  SELECT query_id, cid AS cell FROM (
    SELECT q.query_id, c.cid, ROW_NUMBER() OVER (
      PARTITION BY q.query_id
      ORDER BY ROUND({_cos_duck('q.qe', 'c.ce')}, 6) DESC, c.cid
    ) AS rk
    FROM q, cb c
  ) WHERE rk <= {_IVFPQ_NPROBE}
),
cand AS (
  SELECT qc.query_id, q.qe, a.vec_id,
         co.code_0, co.code_1, co.code_2, co.code_3,
         co.code_4, co.code_5, co.code_6, co.code_7
  FROM qcell qc
  JOIN assign a ON a.cell = qc.cell
  JOIN codes co ON co.vec_id = a.vec_id
  JOIN q ON q.query_id = qc.query_id
  WHERE a.vec_id <> qc.query_id
),
ad AS (
  SELECT cand.query_id, cand.vec_id,
         ROUND({adist}, 6) AS adist_r
  FROM cand
  {cb_joins}
)
SELECT query_id, vec_id AS neighbor_id, adist_r, CAST(rk AS INTEGER) AS rank
FROM (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY query_id ORDER BY adist_r, vec_id
  ) AS rk FROM ad
) WHERE rk <= {_IVFPQ_TOPK}
"""


@register("ivf_pq_search", oracle=_ivfpq_oracle())
def ivf_pq_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVFPQ search — the production billion-vector ANN read path,
    composing ``ivf_assign`` (coarse cells) and ``ann_pq`` (codes):
    a FIXED 32-query workload probes its 4 nearest cells and ranks
    only those cells' members by PQ asymmetric distance (exact
    query-to-codebook sub-distances, summed over each candidate's 8
    stored codes in a FIXED left-to-right order — deterministic FP on
    both engines, hence the exact oracle).

    Scale shape: centroids and codebook broadcast (16 × 64 floats);
    the index side is one scan producing (vec_id, cell, 8 codes)
    scalars — embeddings never shuffle after the scan; candidates are
    cell-pruned (nprobe/16 of the corpus per query) and carry codes
    not vectors; the query workload is FIXED-size, so total work
    scales linearly with corpus size, never with corpus × corpus.
    The asymmetric distance table (32 queries × 8 × 16 doubles)
    broadcasts as one tiny array-struct frame."""
    t = load_tables(spark, sf_dir)
    emb = t.embeddings.select("vec_id", "embedding")
    # The index-encode stage is CPU-bound (8 interpreted sub-distance
    # folds x 16 centroids per vector) and the whole corpus reads as
    # one file split at bench scale, so it ran single-task; spread to
    # core count when starved (3.4s -> 2.2s min-of-4 interleaved at
    # sf0.1/local[32]) — a no-op at real scale where the scan already
    # has >= cores splits (the r15 fuzzy_match_names lesson: AQE/split
    # sizing balances bytes, not per-row compute).
    par = spark.sparkContext.defaultParallelism
    if emb.rdd.getNumPartitions() < par:
        emb = emb.repartition(par, "vec_id")
    cb = F.broadcast(
        emb.filter(F.col("vec_id") < _PQ_K).select(
            F.col("vec_id").alias("cid"), F.col("embedding").alias("ce")
        )
    )
    # index side: one scan -> cell + 8 codes per vector
    scored = emb.crossJoin(cb).select(
        "vec_id",
        "cid",
        F.round(cosine("embedding", "ce"), 6).alias("cos_r"),
        *[
            F.round(
                F.expr(_sub_dot_spark("embedding", "ce", m * _PQ_DSUB)), 6
            ).alias(f"d_{m}")
            for m in range(_PQ_M)
        ],
    )
    index = scored.groupBy("vec_id").agg(
        *[
            F.min(F.struct(f"d_{m}", "cid")).getField("cid").alias(f"code_{m}")
            for m in range(_PQ_M)
        ],
        # argmax cos with min-cid tie-break: max over (cos_r, -cid)
        F.max(F.struct("cos_r", (-F.col("cid")).alias("nc")))
        .getField("nc")
        .alias("neg_cell"),
    ).select(
        "vec_id",
        (-F.col("neg_cell")).alias("cell"),
        *[F.col(f"code_{m}") for m in range(_PQ_M)],
    )
    # query side: nprobe cells + asymmetric distance table per query
    q = emb.filter(
        F.col("vec_id").between(_IVFPQ_QLO, _IVFPQ_QHI)
    ).select(F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe"))
    qscored = q.crossJoin(cb).select(
        "query_id",
        "cid",
        F.round(cosine("qe", "ce"), 6).alias("cos_r"),
        *[
            F.round(
                F.expr(_sub_dot_spark("qe", "ce", m * _PQ_DSUB)), 6
            ).alias(f"dt_{m}")
            for m in range(_PQ_M)
        ],
    )
    wq = Window.partitionBy("query_id").orderBy(
        F.col("cos_r").desc(), F.col("cid")
    )
    qcell = (
        qscored.withColumn("rk", F.row_number().over(wq))
        .filter(F.col("rk") <= _IVFPQ_NPROBE)
        .select("query_id", F.col("cid").alias("cell"))
    )
    dtab = F.broadcast(
        qscored.groupBy("query_id").agg(
            *[
                F.expr(
                    f"transform(array_sort(collect_list(struct(cid, dt_{m}))),"
                    f" s -> s.dt_{m})"
                ).alias(f"tab_{m}")
                for m in range(_PQ_M)
            ]
        )
    )
    # qcell is 32 queries × nprobe = 128 rows by construction — hint
    # it so the cell join broadcasts even without AQE runtime sizing
    # (otherwise a static planner sort-merge-joins the corpus-sized
    # index against 128 rows).
    cand = (
        F.broadcast(qcell)
        .join(index, "cell")
        .filter(F.col("vec_id") != F.col("query_id"))
        .join(dtab, "query_id")
    )
    adist = F.element_at("tab_0", (F.col("code_0") + 1).cast("int"))
    for m in range(1, _PQ_M):
        adist = adist + F.element_at(
            f"tab_{m}", (F.col(f"code_{m}") + 1).cast("int")
        )
    ranked = cand.select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        F.round(adist, 6).alias("adist_r"),
    )
    wr = Window.partitionBy("query_id").orderBy("adist_r", "neighbor_id")
    return (
        ranked.withColumn("rank", F.row_number().over(wr))
        .filter(F.col("rank") <= _IVFPQ_TOPK)
        .select("query_id", "neighbor_id", "adist_r", "rank")
    )


# ------------------------------------------------------------- ann_recall_eval

def _recall_oracle() -> str:
    return f"""
WITH emb AS (
  SELECT vec_id, embedding, CAST({_bucket_expr_duck()} AS BIGINT) AS bucket
  FROM embeddings
),
q AS (
  SELECT vec_id AS query_id, embedding AS qe, bucket AS qbucket
  FROM emb WHERE vec_id < 8
),
probes AS (
  SELECT query_id, qe,
         unnest([qbucket] || list_transform(range(0, {_N_PLANES}),
                                            j -> xor(qbucket, 1 << j))) AS pbucket
  FROM q
),
gt AS (
  SELECT query_id, neighbor_id FROM (
    SELECT q.query_id, e.vec_id AS neighbor_id,
           ROW_NUMBER() OVER (PARTITION BY q.query_id
             ORDER BY ROUND({_cos_duck('q.qe', 'e.embedding')}, 6) DESC,
                      e.vec_id) AS rk
    FROM q, emb e WHERE e.vec_id <> q.query_id
  ) WHERE rk <= 5
),
cand AS (
  SELECT query_id, neighbor_id FROM (
    SELECT p.query_id, e.vec_id AS neighbor_id,
           ROW_NUMBER() OVER (PARTITION BY p.query_id
             ORDER BY ROUND({_cos_duck('p.qe', 'e.embedding')}, 6) DESC,
                      e.vec_id) AS rk
    FROM probes p JOIN emb e ON e.bucket = p.pbucket AND e.vec_id <> p.query_id
  ) WHERE rk <= 5
)
SELECT g.query_id,
       CAST(COUNT(*) AS BIGINT) AS n_gt,
       CAST(COALESCE(MIN(c.n_lsh), 0) AS BIGINT) AS n_lsh,
       CAST(COUNT(c2.neighbor_id) AS BIGINT) AS n_overlap,
       CAST(COUNT(c2.neighbor_id) AS DOUBLE) / COUNT(*) AS recall
FROM gt g
LEFT JOIN (SELECT query_id, COUNT(*) AS n_lsh FROM cand GROUP BY query_id) c
  ON g.query_id = c.query_id
LEFT JOIN cand c2
  ON g.query_id = c2.query_id AND g.neighbor_id = c2.neighbor_id
GROUP BY g.query_id
"""


@register("ann_recall_eval", oracle=_recall_oracle())
def ann_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@5 of the multi-probe LSH index against brute-force ground
    truth — the evaluation loop every approximate index needs before
    anyone trusts it at 100 TB. Multi-probe: each query probes its own
    bucket plus the 8 hamming-distance-1 buckets, with the probe list
    exploded on the broadcast query side so the candidate lookup stays
    a hash join. Ground truth and candidates rank identically (rounded
    cosine + id tie-break); recall = |gt ∩ lsh| / |gt| per query."""
    t = load_tables(spark, sf_dir)
    emb = t.embeddings.select(
        "vec_id", "embedding", F.expr(_bucket_expr_spark()).alias("bucket")
    )
    q = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qe"),
        F.col("bucket").alias("qbucket"),
    )
    probe_arr = F.array(
        F.col("qbucket"),
        *[
            F.expr(f"qbucket ^ {1 << j}").cast("long")
            for j in range(_N_PLANES)
        ],
    )
    probes = q.select(
        "query_id", "qe", F.explode(probe_arr).alias("pbucket")
    )
    corpus = emb.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("ne"),
        F.col("bucket").alias("nbucket"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_r").desc(), F.col("neighbor_id")
    )

    def top5(joined: DataFrame) -> DataFrame:
        return (
            joined.select(
                "query_id",
                "neighbor_id",
                F.round(_cos_exact_pd("qe", "ne"), 6).alias("cos_r"),
            )
            .withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= 5)
            .select("query_id", "neighbor_id")
        )

    gt = top5(
        corpus.join(F.broadcast(q), F.col("neighbor_id") != F.col("query_id"))
    )
    cand = top5(
        corpus.join(
            F.broadcast(probes),
            (F.col("nbucket") == F.col("pbucket"))
            & (F.col("neighbor_id") != F.col("query_id")),
        )
    )
    n_lsh = cand.groupBy("query_id").agg(F.count(F.lit(1)).alias("n_lsh"))
    return (
        gt.alias("g")
        .join(F.broadcast(n_lsh), "query_id", "left")
        .join(
            cand.alias("c"),
            (F.col("g.query_id") == F.col("c.query_id"))
            & (F.col("g.neighbor_id") == F.col("c.neighbor_id")),
            "left",
        )
        .groupBy("g.query_id")
        .agg(
            F.count(F.lit(1)).alias("n_gt"),
            F.coalesce(F.min("n_lsh"), F.lit(0)).cast("bigint").alias("n_lsh"),
            F.count("c.neighbor_id").alias("n_overlap"),
            (
                F.count("c.neighbor_id").cast("double") / F.count(F.lit(1))
            ).alias("recall"),
        )
        .select(
            F.col("query_id"),
            F.col("n_gt").cast("bigint").alias("n_gt"),
            "n_lsh",
            F.col("n_overlap").cast("bigint").alias("n_overlap"),
            "recall",
        )
    )


# ------------------------------------------------------------------ kmeans_step

def _kmeans_oracle() -> str:
    from oil_wells_data_wrangling_spark.functions.exact import sql_dsum

    return f"""
WITH cent AS (
  SELECT vec_id AS centroid_id, embedding AS ce FROM embeddings WHERE vec_id < 16
),
scored AS (
  SELECT e.vec_id, e.embedding, centroid_id,
         ROUND({_cos_duck('e.embedding', 'ce')}, 6) AS cos_r
  FROM embeddings e, cent
),
assigned AS (
  SELECT vec_id, embedding, centroid_id FROM (
    SELECT *, ROW_NUMBER() OVER (
      PARTITION BY vec_id ORDER BY cos_r DESC, centroid_id) AS rk
    FROM scored) WHERE rk = 1
)
SELECT centroid_id,
       CAST(COUNT(*) AS BIGINT) AS n_members,
       ROUND({sql_dsum('CAST(embedding[1] AS DOUBLE)', 6)} / COUNT(*), 6)
         AS dim1_mean
FROM assigned GROUP BY centroid_id
"""


@register("kmeans_step", oracle=_kmeans_oracle())
def kmeans_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One Lloyd iteration of distributed k-means — the training step
    behind the IVF index (ivf_assign consumes its output in production).
    Assignment is the broadcast-centroid argmax from ivf_assign; the
    update is a partial-agg mean per centroid. Iterating = re-running
    with the new centroids; each step is one broadcast + one shuffle,
    the canonical scalable shape (centroids always broadcast-sized).

    Determinism: the updated mean routes through the scaled-int64 sum
    (functions/exact.py), so re-clustering is bit-reproducible across
    partitionings — emitted here as the first-dimension mean the oracle
    recomputes exactly."""
    from oil_wells_data_wrangling_spark.functions.exact import dsum

    t = load_tables(spark, sf_dir)
    cent = t.embeddings.filter(F.col("vec_id") < 16).select(
        F.col("vec_id").alias("centroid_id"), F.col("embedding").alias("ce")
    )
    scored = (
        t.embeddings.select("vec_id", "embedding")
        .crossJoin(F.broadcast(cent))
        .select(
            "vec_id",
            "embedding",
            "centroid_id",
            F.round(cosine("embedding", "ce"), 6).alias("cos_r"),
        )
    )
    w = Window.partitionBy("vec_id").orderBy(
        F.col("cos_r").desc(), F.col("centroid_id")
    )
    assigned = (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select("vec_id", "embedding", "centroid_id")
    )
    return assigned.groupBy("centroid_id").agg(
        F.count(F.lit(1)).alias("n_members"),
        F.round(
            dsum(F.element_at("embedding", 1).cast("double"), 6)
            / F.count(F.lit(1)),
            6,
        ).alias("dim1_mean"),
    )


# --------------------------------------------------------------- kmeans_iterate

_KM_K = 8
_KM_ITERS = 3
_KM_SCALE = 1_000_000


def _km_ctes(extra_assign: bool = False) -> str:
    """Unrolled Lloyd-iteration CTE chain (cent0..centN, a1..aN, and —
    with ``extra_assign`` — a final assignment a{N+1} under centN).
    Centroid coordinates are quantized to 1e-6 between iterations
    (floor to scaled int, then exact bigint sum / count in double) so
    both engines walk bit-identical centroids."""
    cos = _cos_duck("e.embedding", "c.cd")

    def assign_cte(i: int) -> str:
        return f"""a{i} AS (
  SELECT vec_id, embedding, centroid_id FROM (
    SELECT e.vec_id, e.embedding, c.centroid_id,
           ROW_NUMBER() OVER (PARTITION BY e.vec_id
             ORDER BY ROUND({cos}, 6) DESC, c.centroid_id) AS rk
    FROM embeddings e, cent{i - 1} c
  ) WHERE rk = 1
)"""

    ctes = [
        f"""cent0 AS (
  SELECT vec_id AS centroid_id,
         list_transform(embedding,
           x -> floor(CAST(x AS DOUBLE) * {_KM_SCALE}) / {_KM_SCALE}.0) AS cd,
         CAST(1 AS BIGINT) AS n
  FROM embeddings WHERE vec_id < {_KM_K}
)"""
    ]
    for i in range(1, _KM_ITERS + 1):
        ctes.append(assign_cte(i))
        ctes.append(
            f"""cent{i} AS (
  SELECT centroid_id, list(dval ORDER BY pos) AS cd, MIN(cnt) AS n FROM (
    SELECT centroid_id, pos,
           CAST(SUM(sv) AS DOUBLE) / (COUNT(*) * {_KM_SCALE}.0) AS dval,
           CAST(COUNT(*) AS BIGINT) AS cnt
    FROM (
      SELECT a.centroid_id, u.pos,
             CAST(floor(CAST(a.embedding[u.pos + 1] AS DOUBLE) * {_KM_SCALE})
                  AS BIGINT) AS sv
      FROM a{i} a, UNNEST(range(0, {_DIM})) AS u(pos)
    ) GROUP BY centroid_id, pos
  ) GROUP BY centroid_id
)"""
        )
    if extra_assign:
        ctes.append(assign_cte(_KM_ITERS + 1))
    return ",\n".join(ctes)


def _kmeans_iterate_oracle() -> str:
    return f"""
WITH {_km_ctes()}
SELECT centroid_id, n AS n_members, ROUND(cd[1], 6) AS dim1_mean
FROM cent{_KM_ITERS}
"""


@register("kmeans_iterate", oracle=_kmeans_iterate_oracle())
def kmeans_iterate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-iteration distributed k-means: 3 chained Lloyd steps
    (kmeans_step is one of them), converging the IVF coarse quantizer.

    Per iteration: broadcast the k centroids, argmax-assign via a
    vec_id-partitioned rank window, re-estimate each centroid as the
    exact per-dimension mean. Centroid coordinates are quantized to
    1e-6 between iterations — floor to a scaled int64, exact bigint sum
    and count, one double division — so the centroid walk is
    bit-identical across engines AND across partitionings, which is
    what makes an iterative floating-point algorithm oracle-checkable.

    Scale shape: each iteration = one broadcast (k rows) + one
    (centroid, dim)-keyed partial-agg shuffle; the per-iteration frame is
    localCheckpoint-ed (eager) so the logical plan stays constant-size
    over iterations instead of doubling (the connected-components
    lifecycle, dedup.py) — no analysis blow-up however many iterations
    run."""
    _emb, cent = _km_run(spark, sf_dir)
    return cent.select(
        "centroid_id",
        F.col("n").alias("n_members"),
        F.round(F.element_at("cd", 1), 6).alias("dim1_mean"),
    )


def _km_initial(emb: DataFrame) -> DataFrame:
    return emb.filter(F.col("vec_id") < _KM_K).select(
        F.col("vec_id").alias("centroid_id"),
        F.expr(
            f"transform(embedding, x -> cast(floor(cast(x as double) * {_KM_SCALE})"
            f" as double) / {_KM_SCALE}.0D)"
        ).alias("cd"),
        F.lit(1).cast("bigint").alias("n"),
    )


def _km_assign(emb: DataFrame, cent: DataFrame) -> DataFrame:
    """Broadcast-centroid argmax: (vec_id, embedding, centroid_id)."""
    w = Window.partitionBy("vec_id").orderBy(
        F.col("cos_r").desc(), F.col("centroid_id")
    )
    return (
        emb.crossJoin(F.broadcast(cent))
        .select(
            "vec_id",
            "embedding",
            "centroid_id",
            F.round(cosine("embedding", "cd"), 6).alias("cos_r"),
        )
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select("vec_id", "embedding", "centroid_id")
    )


def _km_update(assigned: DataFrame) -> DataFrame:
    """Exact quantized centroid re-estimation from an assignment."""
    per_dim = (
        assigned.select("centroid_id", F.posexplode("embedding").alias("pos", "x"))
        .select(
            "centroid_id",
            "pos",
            F.floor(F.col("x").cast("double") * _KM_SCALE).cast("bigint").alias("sv"),
        )
        .groupBy("centroid_id", "pos")
        .agg(
            (
                F.sum("sv").cast("double") / (F.count(F.lit(1)) * float(_KM_SCALE))
            ).alias("dval"),
            F.count(F.lit(1)).cast("bigint").alias("cnt"),
        )
    )
    return per_dim.groupBy("centroid_id").agg(
        F.expr(
            "transform(array_sort(collect_list(struct(pos, dval))), s -> s.dval)"
        ).alias("cd"),
        F.min("cnt").alias("n"),
    )


def _km_run(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    """Run the Lloyd loop; returns (embeddings frame, final centroids)."""
    t = load_tables(spark, sf_dir)
    emb = t.embeddings.select("vec_id", "embedding")
    cent = _km_initial(emb)
    for _ in range(_KM_ITERS):
        cent = _km_update(_km_assign(emb, cent)).localCheckpoint(eager=True)
    return emb, cent


_IVF_RECLUSTER_ORACLE = f"""
WITH {_km_ctes(extra_assign=True)}
SELECT a{_KM_ITERS + 1}.centroid_id,
       CAST(COUNT(*) AS BIGINT) AS n_members,
       CAST(SUM(CASE WHEN a1.centroid_id <> a{_KM_ITERS + 1}.centroid_id
                THEN 1 ELSE 0 END) AS BIGINT) AS n_moved
FROM a{_KM_ITERS + 1} JOIN a1 ON a{_KM_ITERS + 1}.vec_id = a1.vec_id
GROUP BY 1
"""


@register("ivf_recluster", oracle=_IVF_RECLUSTER_ORACLE)
def ivf_recluster(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental IVF index maintenance audit: after re-training the
    coarse quantizer (kmeans_iterate's 3 Lloyd steps), how much of the
    inverted index must actually be rewritten? Per final centroid:
    member count and how many members arrived from a DIFFERENT initial
    cell (n_moved) — the write amplification of an in-place re-cluster
    vs a full index rebuild.

    Scale shape: two broadcast-argmax assignment passes (initial and
    final centroids — k rows broadcast each) joined on vec_id, then a
    k-group partial-agg rollup; the Lloyd loop itself is the
    localCheckpoint-ed kmeans_iterate machinery, shared helpers."""
    emb, cent_final = _km_run(spark, sf_dir)
    first = _km_assign(emb, _km_initial(emb)).select(
        "vec_id", F.col("centroid_id").alias("c0")
    )
    final = _km_assign(emb, cent_final).select("vec_id", "centroid_id")
    return (
        final.join(first, "vec_id")
        .groupBy("centroid_id")
        .agg(
            F.count(F.lit(1)).alias("n_members"),
            F.sum(
                F.when(F.col("c0") != F.col("centroid_id"), 1).otherwise(0)
            )
            .cast("bigint")
            .alias("n_moved"),
        )
    )


# ----------------------------------------------------------- pca_top_component

_PCA_S = 10_000  # fixed-point scale of the iterate vector
_PCA_XS = 1000.0  # embedding quantization scale

_PCA_ORACLE = f"""
WITH xi AS (
  SELECT vec_id,
         list_transform(embedding,
           e -> CAST(round(CAST(e AS DOUBLE) * {_PCA_XS}) AS BIGINT)) AS xi
  FROM embeddings
),
flat AS (
  SELECT vec_id, CAST(pos - 1 AS INTEGER) AS pos,
         CAST(xi[pos] AS BIGINT) AS x
  FROM xi, UNNEST(range(1, len(xi) + 1)) AS r(pos)
),
v0 AS (SELECT DISTINCT pos, CAST({_PCA_S} AS BIGINT) AS v FROM flat),
w1 AS (
  SELECT vec_id, CAST(SUM(x * v) AS BIGINT) AS w
  FROM flat JOIN v0 USING (pos) GROUP BY vec_id
),
c1 AS (
  SELECT pos, CAST(SUM(x * w) AS BIGINT) AS c
  FROM flat JOIN w1 USING (vec_id) GROUP BY pos
),
m1 AS (SELECT MAX(ABS(c)) AS m FROM c1),
v1 AS (
  SELECT pos, CAST((c * {_PCA_S}) // m AS BIGINT) AS v
  FROM c1 CROSS JOIN m1
),
w2 AS (
  SELECT vec_id, CAST(SUM(x * v) AS BIGINT) AS w
  FROM flat JOIN v1 USING (pos) GROUP BY vec_id
),
c2 AS (
  SELECT pos, CAST(SUM(x * w) AS BIGINT) AS c
  FROM flat JOIN w2 USING (vec_id) GROUP BY pos
),
m2 AS (SELECT MAX(ABS(c)) AS m FROM c2)
SELECT pos AS dim, CAST((c * {_PCA_S}) // m AS BIGINT) AS component
FROM c2 CROSS JOIN m2
"""


@register("pca_top_component", oracle=_PCA_ORACLE)
def pca_top_component(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top principal component of the embedding matrix by two power
    iterations — the dominant-direction probe an embedding-curation
    pipeline runs to detect collapsed/anisotropic embedding spaces
    (one direction soaking up the variance) and to whiten before
    cosine retrieval.

    Scale shape: the covariance matrix is NEVER materialized — each
    iteration is the two-pass matvec ``w = X·v`` then ``v' = Xᵀ·w``:
    pass 1 joins the flattened (vec_id, dim, x) table with the
    broadcast 64-row iterate and reduces per vector; pass 2 joins the
    per-vector scalars back and reduces per dimension. Both are
    partial-agg shuffles whose results are bounded by n_vectors and
    n_dims respectively; the flattened table is cached once and fed to
    all four passes. Arithmetic is fixed-point bigint throughout —
    embeddings quantized at 1e3, the iterate renormalized to ±1e4 by
    max-|component| integer division after each iteration (both
    engines truncate toward zero, verified) — so the walk is
    bit-identical with no libm and no FP accumulation order. The
    headroom bound (|x|≤1e3 · |w| ≤ n·d·1e7) stays inside int64 up to
    ~1e7 vectors at these scales; beyond that, drop the iterate scale
    one decade per 100× rows."""
    t = load_tables(spark, sf_dir)
    flat = (
        t.embeddings.select(
            "vec_id", F.posexplode("embedding").alias("pos", "e")
        )
        .select(
            "vec_id",
            "pos",
            F.round(F.col("e").cast("double") * _PCA_XS)
            .cast("bigint")
            .alias("x"),
        )
        .cache()
    )
    v = flat.select("pos").distinct().select(
        "pos", F.lit(_PCA_S).cast("bigint").alias("v")
    )
    comp = None
    for _ in range(2):
        if comp is not None:
            m = comp.agg(F.max(F.abs(F.col("c"))).alias("m"))
            v = comp.crossJoin(F.broadcast(m)).select(
                "pos",
                F.expr(f"(c * {_PCA_S}) div m").cast("bigint").alias("v"),
            )
        w = (
            flat.join(F.broadcast(v), "pos")
            .groupBy("vec_id")
            .agg(F.sum(F.col("x") * F.col("v")).cast("bigint").alias("w"))
        )
        comp = (
            flat.join(w, "vec_id")
            .groupBy("pos")
            .agg(F.sum(F.col("x") * F.col("w")).cast("bigint").alias("c"))
        )
    m = comp.agg(F.max(F.abs(F.col("c"))).alias("m"))
    return comp.crossJoin(F.broadcast(m)).select(
        F.col("pos").alias("dim"),
        F.expr(f"(c * {_PCA_S}) div m").cast("bigint").alias("component"),
    )


# ------------------------------------------------------------ semdedup_clusters

_SEM_TAU2_NUM = 8100    # tau^2 = 0.81 as 8100/10000
_SEM_TAU2_DEN = 10000
_SEM_XS = 1000.0        # quantization scale

_SEMDEDUP_ORACLE = f"""
WITH emb2 AS (
  SELECT vec_id, label, embedding FROM embeddings
  UNION ALL
  SELECT vec_id + 100000, label, embedding
  FROM embeddings WHERE vec_id % 7 = 0
  UNION ALL
  SELECT vec_id + 200000, label,
         list_transform(embedding, e -> -e)
  FROM embeddings WHERE vec_id % 11 = 0
),
xi AS (
  SELECT vec_id, label,
         list_transform(embedding,
           e -> CAST(round(CAST(e AS DOUBLE) * {_SEM_XS}) AS BIGINT)) AS xi
  FROM emb2
),
nrm AS (
  SELECT vec_id, label, xi,
         CAST(list_dot_product(xi, xi) AS BIGINT) AS n2
  FROM xi
),
dropped AS (
  SELECT DISTINCT a.vec_id
  FROM nrm a JOIN nrm b
    ON a.label = b.label AND b.vec_id < a.vec_id
  WHERE CAST(list_dot_product(a.xi, b.xi) AS BIGINT) > 0
    AND CAST(list_dot_product(a.xi, b.xi) AS BIGINT)
        * CAST(list_dot_product(a.xi, b.xi) AS BIGINT)
        * {_SEM_TAU2_DEN}
        >= {_SEM_TAU2_NUM} * a.n2 * b.n2
)
SELECT label,
       CAST(COUNT(*) AS BIGINT) AS n_vectors,
       CAST(SUM(CASE WHEN d.vec_id IS NOT NULL THEN 1 ELSE 0 END)
         AS BIGINT) AS n_dropped,
       CAST(SUM(CASE WHEN d.vec_id IS NULL THEN 1 ELSE 0 END)
         AS BIGINT) AS n_kept
FROM nrm LEFT JOIN dropped d ON nrm.vec_id = d.vec_id
GROUP BY label
"""


@register("semdedup_clusters", oracle=_SEMDEDUP_ORACLE)
def semdedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023): inside
    each coarse cluster, drop every vector that has a cluster-mate with
    a smaller id and cosine ≥ 0.9 — keeping one representative per
    semantic near-dup group. The cluster here is the ``label`` column
    standing in for an ``ivf_assign`` coarse assignment; the production
    composition is ivf_assign → this operator, unchanged.

    Scale shape: the pair search is a CLUSTER-LOCAL self-join — the
    whole point of SemDeDup's k-means prepass is that pair cost is
    Σ|cluster|², never n² (same bound our LSH dedup uses bands for).
    The join shuffles (vec_id, 64×int64 array, norm) keyed on the
    cluster id, pairs evaluate a zip_with/aggregate integer dot product
    inline, and the drop verdict aggregates back to a bounded per-
    cluster audit. The cosine test is exact integer arithmetic:
    ``dot > 0 AND dot²·10⁴ ≥ 8100·‖a‖²·‖b‖²`` over 1e3-quantized
    embeddings — no sqrt, no division, no FP accumulation, so both
    engines (and any partitioning) agree on every keep/drop decision;
    the bigint headroom bound holds to ~3e5-dim vectors at this scale.

    The base embeddings are random (no true cos≥0.9 pairs), so the
    query plants positives the way the dedup family does: every seventh
    vector gets an exact duplicate (cos = 1 → must drop) and every
    eleventh a NEGATED copy (cos = −1 → the ``dot > 0`` guard must keep
    it); negation and duplication are FP-exact in both engines."""
    t = load_tables(spark, sf_dir)
    base = t.embeddings.select("vec_id", "label", "embedding")
    # single-scan 3-layer synthesis (r16, guide §6): one embeddings
    # scan explodes into base + exact duplicate (%7) + negated copy
    # (%11) — the union form scanned embeddings 3×
    emb2 = base.select(
        F.explode(
            F.expr(
                "filter(array(struct(vec_id, label, embedding), "
                "struct(vec_id + 100000L as vec_id, label, embedding), "
                "struct(vec_id + 200000L as vec_id, label,"
                " transform(embedding, e -> -e) as embedding)), "
                "(x, i) -> i = 0 or (i = 1 and vec_id % 7 = 0)"
                " or (i = 2 and vec_id % 11 = 0))"
            )
        ).alias("r")
    ).select("r.vec_id", "r.label", "r.embedding")
    xi = F.expr(
        f"transform(embedding, e -> cast(round(cast(e as double) * {_SEM_XS}) as bigint))"
    )
    nrm = emb2.select(
        "vec_id",
        "label",
        xi.alias("xi"),
    ).withColumn(
        "n2",
        F.expr("aggregate(zip_with(xi, xi, (p, q) -> p * q), 0L, (acc, v) -> acc + v)"),
    )
    # Pair test as ONE exact-int64 Gram matmul per cluster (the
    # semdedup_pipeline kernel, r15): the previous bucket self-join
    # evaluated ~|cluster|² interpreted zip_with/aggregate array dots
    # and shuffled the xi arrays on BOTH join sides. One Arrow-batched
    # applyInPandas pass shuffles each vector once, and the decision
    # arithmetic is the same integer comparison — |xi| ≤ 500 over 64
    # dims keeps every term below 2^62, so the numpy int64 matmul is
    # bit-identical to the SQL form (semdedup_pipeline's argument).
    import numpy as np
    import pandas as pd

    tau_num, tau_den = _SEM_TAU2_NUM, _SEM_TAU2_DEN

    def cluster_audit(pdf: pd.DataFrame) -> pd.DataFrame:
        x = np.array(pdf["xi"].tolist(), dtype=np.int64)
        ids = pdf["vec_id"].to_numpy(dtype=np.int64)
        n2 = pdf["n2"].to_numpy(dtype=np.int64)
        # blocked Gram (guide §5): bit-identical verdicts, bounded memory
        dropped = int(
            _gram_dropped_mask(x, ids, n2, tau_num, tau_den).sum()
        )
        return pd.DataFrame(
            {
                "label": pdf["label"].iloc[:1],
                "n_vectors": [len(ids)],
                "n_dropped": [dropped],
                "n_kept": [len(ids) - dropped],
            }
        )

    return nrm.groupBy("label").applyInPandas(
        cluster_audit,
        "label int, n_vectors long, n_dropped long, n_kept long",
    )


# ------------------------------------------------------------ semdedup_pipeline

# SemDeDup with the coarse-clustering prepass WIRED IN and its cell
# count scaling with n — the r6-verdict fix for semdedup_clusters'
# fixed-k Σ|c|² term. Cells are sign-LSH buckets over u hyperplanes
# where u = bitlength(n div TARGET), so the number of cells tracks
# n/TARGET and the expected cell size stays ~TARGET at any corpus
# size. LSH stands in for the k-means assignment deliberately: with k
# ∝ n, brute-force Lloyd assignment is itself O(n·k·d) = O(n²d/TARGET)
# — quadratic in exactly the way the prepass is meant to prevent —
# while the sign-bucket assignment is O(n·u·d) = O(n·d·log n).
_SEMP_TARGET = 128   # target expected vectors per coarse cell
_SEMP_W = 20         # max planes: supports n up to TARGET·2^20 ≈ 1.3e8
_SEMP_U_SQL = (
    f"least(length(bin(greatest(count(*) div {_SEMP_TARGET}, 1))), {_SEMP_W})"
)


def _semp_bits_duck() -> str:
    bits = []
    for row in _planes(_SEMP_W):
        arr = "[" + ", ".join(repr(v) for v in row) + "]"
        bits.append(f"(CASE WHEN {_dot_duck('embedding', arr)} > 0 THEN 1 ELSE 0 END)")
    return "[" + ", ".join(bits) + "]"


_SEMP_ORACLE = f"""
WITH emb2 AS (
  SELECT vec_id, label, embedding FROM embeddings
  UNION ALL
  SELECT vec_id + 100000, label, embedding
  FROM embeddings WHERE vec_id % 7 = 0
  UNION ALL
  SELECT vec_id + 200000, label,
         list_transform(embedding, e -> -e)
  FROM embeddings WHERE vec_id % 11 = 0
),
kp AS (
  SELECT LEAST(LENGTH(bin(GREATEST(COUNT(*) // {_SEMP_TARGET}, 1))), {_SEMP_W}) AS u
  FROM emb2
),
feat AS (
  SELECT vec_id, label,
         list_transform(embedding,
           e -> CAST(round(CAST(e AS DOUBLE) * {_SEM_XS}) AS BIGINT)) AS xi,
         {_semp_bits_duck()} AS bits
  FROM emb2
),
bucketed AS (
  SELECT vec_id, label, xi,
         CAST(list_dot_product(xi, xi) AS BIGINT) AS n2,
         CAST(list_sum(list_transform(range(1, u + 1),
              i -> bits[i] * (CAST(1 AS BIGINT) << (i - 1)))) AS BIGINT) AS bucket
  FROM feat CROSS JOIN kp
),
dropped AS (
  SELECT DISTINCT a.vec_id
  FROM bucketed a JOIN bucketed b
    ON a.bucket = b.bucket AND b.vec_id < a.vec_id
  WHERE CAST(list_dot_product(a.xi, b.xi) AS BIGINT) > 0
    AND CAST(list_dot_product(a.xi, b.xi) AS BIGINT)
        * CAST(list_dot_product(a.xi, b.xi) AS BIGINT)
        * {_SEM_TAU2_DEN}
        >= {_SEM_TAU2_NUM} * a.n2 * b.n2
)
SELECT label,
       CAST(COUNT(*) AS BIGINT) AS n_vectors,
       CAST(COUNT(DISTINCT bucket) AS BIGINT) AS n_cells,
       CAST(SUM(CASE WHEN d.vec_id IS NOT NULL THEN 1 ELSE 0 END)
         AS BIGINT) AS n_dropped,
       CAST(SUM(CASE WHEN d.vec_id IS NULL THEN 1 ELSE 0 END)
         AS BIGINT) AS n_kept
FROM bucketed LEFT JOIN dropped d ON bucketed.vec_id = d.vec_id
GROUP BY label
"""


def _semp_emb2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The planted-duplicate corpus shared with semdedup_clusters:
    every 7th vector duplicated exactly (cos = 1, must drop), every
    11th negated (cos = −1, must keep)."""
    base = load_tables(spark, sf_dir).embeddings.select(
        "vec_id", "label", "embedding"
    )
    # single-scan 3-layer synthesis (r16, guide §6 — see semdedup_clusters)
    return base.select(
        F.explode(
            F.expr(
                "filter(array(struct(vec_id, label, embedding), "
                "struct(vec_id + 100000L as vec_id, label, embedding), "
                "struct(vec_id + 200000L as vec_id, label,"
                " transform(embedding, e -> -e) as embedding)), "
                "(x, i) -> i = 0 or (i = 1 and vec_id % 7 = 0)"
                " or (i = 2 and vec_id % 11 = 0))"
            )
        ).alias("r")
    ).select("r.vec_id", "r.label", "r.embedding")


def _semp_u(n: int) -> int:
    """Cells-per-corpus knob: u = bitlength(n div TARGET), clipped.
    Same formula as the oracle's ``length(bin(greatest(...)))``."""
    return min(max(n // _SEMP_TARGET, 1).bit_length(), _SEMP_W)


def _semp_bucketed_sql(emb2: DataFrame, u: int) -> DataFrame:
    """The SQL-expression form of the coarse-cell assignment — the
    executable SPEC for ``_semp_bucketed``'s numpy fast path (and the
    direct transliteration of the DuckDB oracle's arithmetic): xi is
    ``round(double(e)·XS)`` with Spark/DuckDB's shared half-away-from-
    zero semantics, each plane dot is a strict left-to-right fold of
    ``double(e_i)·p_i`` starting at 0D, and the bucket packs the u
    sign bits. Kept for the bit-equality test in
    tests/test_similarity_blocking.py; queries call the fast twin."""
    planes = _planes(_SEMP_W)[:u]
    bit_terms = []
    for i, row in enumerate(planes):
        arr_sql = "array(" + ", ".join(f"cast({v!r} as double)" for v in row) + ")"
        dot_sql = (
            f"aggregate(zip_with(embedding, {arr_sql}, "
            "(x, y) -> cast(x as double) * y), 0D, (acc, v) -> acc + v)"
        )
        bit_terms.append(f"(CASE WHEN {dot_sql} > 0 THEN {1 << i}L ELSE 0L END)")
    return emb2.select(
        "vec_id",
        "label",
        F.expr(
            f"transform(embedding, e -> cast(round(cast(e as double) * {_SEM_XS})"
            " as bigint))"
        ).alias("xi"),
        F.expr(" + ".join(bit_terms)).alias("bucket"),
    ).withColumn(
        "n2",
        F.expr(
            "aggregate(zip_with(xi, xi, (p, q) -> p * q), 0L, (acc, v) -> acc + v)"
        ),
    )


def _semp_bucketed(emb2: DataFrame) -> DataFrame:
    """Coarse-cell assignment with n-scaled cell count: returns
    (vec_id, label, xi, n2, bucket).

    ``u`` is sized driver-side from one ``count()`` of the corpus
    (a single int-column scan, amortized over the featurization it
    sizes; a production run that already knows n passes it by config).

    Featurization runs as ONE Arrow-batched ``mapInPandas`` pass that
    replicates ``_semp_bucketed_sql``'s arithmetic bit-for-bit:

    - xi: ``v = double(e)·XS`` then half-away-from-zero rounding via
      an EXACT fraction compare (``|v|-floor(|v|) >= 0.5`` — the
      semantics both Spark's BigDecimal HALF_UP ``round(double)`` and
      DuckDB's ``std::round`` implement; ``floor(v+0.5)`` would carry
      values just below a .5 boundary over it);
    - plane dots: a sequential fold over dimensions, vectorized across
      rows (``acc += double(E[:,i])·p_i`` from acc=0), which is the
      SAME IEEE operation sequence as the SQL fold — not ``np.sum``,
      whose pairwise summation would associate differently;
    - n2 and bucket are pure int64 (order-free).

    The SQL twin evaluated ~u interpreted higher-order-function dots
    per row (each allocating intermediate arrays): 24s for 247k rows
    at the 100× spot-check vs well under a second vectorized —
    equality with the spec is pinned by test over the shipped corpora,
    not assumed."""
    import numpy as np
    import pandas as pd

    n = emb2.count()
    u = _semp_u(n)
    planes = _planes(_SEMP_W)[:u]
    xs = _SEM_XS

    def featurize(batches):
        for pdf in batches:
            e = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            v = e * xs
            # half-away-from-zero via exact fraction compare: |v| -
            # floor(|v|) is exact for doubles, so this matches BOTH
            # Spark's BigDecimal HALF_UP round() and DuckDB's
            # std::round on every double — floor(v+0.5) would not
            # (0.49999999999999994 + 0.5 == 1.0 in fp)
            av = np.abs(v)
            flv = np.floor(av)
            xi = (np.sign(v) * (flv + (av - flv >= 0.5))).astype(np.int64)
            n2 = (xi * xi).sum(axis=1)
            bucket = np.zeros(len(e), dtype=np.int64)
            for j, plane in enumerate(planes):
                acc = np.zeros(len(e), dtype=np.float64)
                for i, p in enumerate(plane):
                    acc += e[:, i] * p
                bucket |= (acc > 0).astype(np.int64) << j
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"].astype("int64"),
                    "label": pdf["label"],
                    "xi": list(xi),
                    "bucket": bucket,
                    "n2": n2,
                }
            )

    return emb2.mapInPandas(
        featurize,
        "vec_id long, label int, xi array<bigint>, bucket long, n2 long",
    )


@register("semdedup_pipeline", oracle=_SEMP_ORACLE, headline=True)
def semdedup_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup with the coarse prepass wired in and its cell count
    scaling with n — the production composition the semdedup_clusters
    docstring only described (r6 verdict item #5, turned into code).

    The prepass assigns each vector to a sign-LSH cell over
    u = bitlength(n div 128) hyperplanes (u sized driver-side from one
    corpus count — see _semp_bucketed), so cells ≈ n/128
    and the expected cell size stays ~128 at any corpus size. Within a
    cell, the exact-integer SemDeDup rule drops every vector with a
    smaller-id cell-mate at cosine ≥ 0.9 (``dot > 0 AND dot²·10⁴ ≥
    8100·‖a‖²·‖b‖²`` over 1e3-quantized embeddings — no sqrt, no FP
    accumulation, bit-identical across engines and partitionings).

    Scale shape — both stages ~linear, which is the whole point:
    assignment is O(n·u·d) = O(n·d·log n) per-row map work (20 static
    plane dots, whole-stage codegen, no shuffle); the pair join
    shuffles on ``bucket`` (n/128 distinct keys) and costs Σ|cell|² ≈
    n·128. Contrast the documented-but-unwired alternative — Lloyd
    assignment with k ∝ n — whose assign step alone is O(n²d/128).
    tests/test_similarity_blocking.py measures the candidate-pair
    count at 1× vs 8× corpus and asserts the ~8× (not 64×) growth.

    Planted positives ride the same corpus as semdedup_clusters: exact
    duplicates (identical sign bits → same cell at any u → caught) and
    negated copies (must be KEPT — either blocked apart or rejected by
    the dot>0 guard; same verdict either way, so the LSH recall trade
    cannot flip a planted decision). Audit output: per-label vector /
    cell / dropped / kept counts.

    Physical shape: ONE featurization pass, ONE shuffle (on bucket),
    then the within-cell pair test runs as an Arrow-batched
    ``applyInPandas`` — an exact int64 Gram matmul per cell, so the
    decision arithmetic is identical to the SQL/oracle form (no FP
    anywhere past the sign bits) while ~|cell|² interpreted array-dot
    expressions collapse into one vectorized numpy call. The earlier
    bucket self-join + rejoin recomputed featurization three times and
    evaluated every pair dot through interpreted higher-order
    functions: 3.3s → ~0.8s at sf0.1, same results bit-for-bit."""
    import numpy as np
    import pandas as pd

    tau_num, tau_den = _SEM_TAU2_NUM, _SEM_TAU2_DEN

    def cell_audit(pdf: pd.DataFrame) -> pd.DataFrame:
        x = np.array(pdf["xi"].tolist(), dtype=np.int64)
        ids = pdf["vec_id"].to_numpy(dtype=np.int64)
        n2 = pdf["n2"].to_numpy(dtype=np.int64)
        # |xi| ≤ XS/2 per dim (embeddings in [-0.5, 0.5]) keeps every
        # term below 2^62 — the same int64-range assumption the SQL
        # comparison already makes; blocked Gram bounds task memory
        dropped = _gram_dropped_mask(x, ids, n2, tau_num, tau_den)
        return pd.DataFrame(
            {
                "vec_id": ids,
                "label": pdf["label"].to_numpy(),
                "bucket": pdf["bucket"].to_numpy(),
                "is_dropped": dropped.astype("int32"),
            }
        )

    audit = (
        _semp_bucketed(_semp_emb2(spark, sf_dir))
        .groupBy("bucket")
        .applyInPandas(
            cell_audit,
            "vec_id long, label int, bucket long, is_dropped int",
        )
    )
    return audit.groupBy("label").agg(
        F.count(F.lit(1)).alias("n_vectors"),
        F.countDistinct("bucket").alias("n_cells"),
        F.sum("is_dropped").alias("n_dropped"),
        F.sum(1 - F.col("is_dropped")).alias("n_kept"),
    )


# ---------------------------------------------------------- embedding_outliers

# Distance-to-centroid outlier audit: members sitting far from their
# own IVF cell's centroid are the OOD/noise tail SemDeDup-style
# curation prunes before training. All comparisons run in integer
# micro-units (d = 1e6·(1 − cos), exactly representable after ROUND to
# an integral double), and the outlier test cross-multiplies instead of
# dividing — bit-identical on both engines, no FP mean anywhere.
_EO_CENTROIDS = 16
_EO_RATIO_NUM = 11  # outlier ⇔ d·10 > avg_d·11, i.e. d > 1.1×cell mean
_EO_RATIO_DEN = 10

_EO_ORACLE = f"""
WITH cent AS (
  SELECT vec_id AS centroid_id, embedding AS ce FROM embeddings
  WHERE vec_id < {_EO_CENTROIDS}
),
scored AS (
  SELECT e.vec_id,
         (1000000 - CAST(ROUND({_cos_duck('e.embedding', 'c.ce')} * 1000000,
                               0) AS BIGINT)) * 100 + c.centroid_id AS dkey
  FROM embeddings e CROSS JOIN cent c
),
assign AS (
  SELECT vec_id, MIN(dkey) AS k FROM scored GROUP BY vec_id
),
member AS (
  SELECT vec_id, k % 100 AS centroid_id, k // 100 AS d FROM assign
),
stats AS (
  SELECT centroid_id, CAST(COUNT(*) AS BIGINT) AS n_members,
         CAST(SUM(d) AS BIGINT) AS sd
  FROM member GROUP BY centroid_id
)
SELECT s.centroid_id, s.n_members,
       CAST(s.sd // s.n_members AS BIGINT) AS avg_d,
       CAST(SUM(CASE WHEN m.d * {_EO_RATIO_DEN} * s.n_members
                        > s.sd * {_EO_RATIO_NUM} THEN 1 ELSE 0 END)
            AS BIGINT) AS n_outliers
FROM member m JOIN stats s USING (centroid_id)
GROUP BY s.centroid_id, s.n_members, s.sd
"""


def _eo_assign_sql(t) -> DataFrame:
    """The SPEC assignment: broadcast crossJoin + unrolled-cosine dkey
    + groupBy-min — retained for bit-equality pinning against the
    shipped Arrow form (the minhash_signature_sql pattern)."""
    cent = t.embeddings.filter(F.col("vec_id") < _EO_CENTROIDS).select(
        F.col("vec_id").alias("centroid_id"), F.col("embedding").alias("ce")
    )
    dkey = (
        F.lit(1_000_000)
        - F.round(
            cosine_unrolled("embedding", "ce") * 1_000_000, 0
        ).cast("bigint")
    ) * 100 + F.col("centroid_id")
    return (
        t.embeddings.select("vec_id", "embedding")
        .crossJoin(F.broadcast(cent))
        .select("vec_id", dkey.alias("dkey"))
        .groupBy("vec_id")
        .agg(F.min("dkey").alias("k"))
        .select(
            (F.col("k") % 100).alias("centroid_id"),
            F.expr("k div 100").alias("d"),
        )
    )


def _eo_assign_arrow(spark: SparkSession, t) -> DataFrame:
    """The shipped assignment: the 16×64 cosine argmin as ONE BLAS
    matmul per Arrow batch — measured 85% of the op was this argmin
    arithmetic at 10×/100× and the twin removes almost all of it
    (BASELINE.md round-10 profile; bit-equality vs _eo_assign_sql is
    test-pinned at every SF and the 200k-vector replica).

    Equality with the spec is engineered, not hoped for:

    - rounding is the exact-fraction HALF_UP kernel
      (streaming/events.py::half_up_cents' argument — ``|x|-floor(|x|)``
      is exact for doubles, so comparing the fraction against 0.5
      reproduces BigDecimal HALF_UP; ``floor(|x|+0.5)`` would carry
      values just below a boundary over it);
    - BLAS accumulation order differs from the spec's left-to-right
      fold by ulps, so any entry whose scaled fraction lands within
      ``max(1e-7, |scaled|·1e-12)`` of the .5 boundary is RECOMPUTED
      with the spec's exact sequential fold before rounding — the
      magnitude-scaled window pq_encode_arrow uses (a fixed 1e-7 is
      only a ~14× margin at |scaled| = 1e6, where 64-term BLAS-vs-fold
      drift reaches ~64·eps·1e6 ≈ 7e-9; scaling by |scaled| keeps the
      margin ≥ ~1e4× at every magnitude; the recompute set is empty on
      real data);
    - zero-norm embeddings are out-of-domain and raise, matching the
      SQL spec, whose NaN micro-unit cast errors under ANSI."""
    import numpy as np
    import pandas as pd

    cent_rows = (
        t.embeddings.filter(F.col("vec_id") < _EO_CENTROIDS)
        .select("vec_id", "embedding")
        .collect()
    )
    cent_rows.sort(key=lambda r: r.vec_id)
    C = np.array([r.embedding for r in cent_rows], dtype=np.float64)
    nc = np.sqrt((C * C).sum(axis=1))
    bc = spark.sparkContext.broadcast((C, nc))

    def _seq_scaled(x, c) -> float:
        """cos(x, c)·1e6 in the SPEC's exact operand order: three
        left-to-right 64-term folds, dot/(sqrt·sqrt), one multiply."""
        dot = na = nb = 0.0
        for i in range(len(x)):
            dot += x[i] * c[i]
            na += x[i] * x[i]
            nb += c[i] * c[i]
        return (dot / (np.sqrt(na) * np.sqrt(nb))) * 1_000_000.0

    def _batches(it):
        C_, nc_ = bc.value
        n_cent = len(C_)
        cid = np.arange(n_cent, dtype=np.int64)
        for pdf in it:
            if len(pdf) == 0:  # an empty Arrow batch has no axis-1
                continue
            X = np.array(pdf["embedding"].tolist(), dtype=np.float64)
            nx = np.sqrt((X * X).sum(axis=1))
            if (nx == 0).any():
                raise ValueError(
                    "embedding_outliers: zero-norm embedding is "
                    "out-of-domain (the SQL spec's NaN cast errors too)"
                )
            scaled = (X @ C_.T) / (nx[:, None] * nc_[None, :]) * 1_000_000.0
            ax = np.abs(scaled)
            fl = np.floor(ax)
            frac = ax - fl  # exact for doubles
            risky = np.abs(frac - 0.5) < np.maximum(1e-7, ax * 1e-12)
            for i, j in np.argwhere(risky):
                s2 = _seq_scaled(X[i], C_[j])
                scaled[i, j] = s2
                ax[i, j] = abs(s2)
                fl[i, j] = np.floor(abs(s2))
                frac[i, j] = ax[i, j] - fl[i, j]
            r = (np.sign(scaled) * (fl + (frac >= 0.5))).astype(np.int64)
            dk = (1_000_000 - r) * 100 + cid[None, :]
            k = dk.min(axis=1)
            yield pd.DataFrame(
                {"centroid_id": k % 100, "d": k // 100}
            )

    return t.embeddings.select("embedding").mapInPandas(
        _batches, schema="centroid_id long, d long"
    )


def _eo_report(assign: DataFrame) -> DataFrame:
    """Shared tail: per-cell exact stats + cross-multiplied outlier
    test over a (centroid_id, d) assignment."""
    stats = assign.groupBy("centroid_id").agg(
        F.count(F.lit(1)).alias("n_members"),
        F.sum("d").alias("sd"),
    )
    flagged = assign.join(F.broadcast(stats), "centroid_id").select(
        "centroid_id",
        "n_members",
        "sd",
        (
            F.col("d") * _EO_RATIO_DEN * F.col("n_members")
            > F.col("sd") * _EO_RATIO_NUM
        ).cast("int").alias("is_out"),
    )
    return (
        flagged.groupBy("centroid_id", "n_members", "sd")
        .agg(F.sum("is_out").cast("bigint").alias("n_outliers"))
        .select(
            "centroid_id",
            "n_members",
            F.expr("sd div n_members").alias("avg_d"),
            "n_outliers",
        )
    )


@register("embedding_outliers", oracle=_EO_ORACLE)
def embedding_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space quality audit: assign every vector to its
    nearest of {_EO_CENTROIDS} centroids (ivf_assign's coarse
    quantization), then per cell count the members sitting more than
    1.1× the cell's mean centroid-distance out — the OOD/noise tail a
    SemDeDup-style curation run prunes before training. Distances are
    integer micro-units and the threshold is a cross-multiplication,
    so the audit is exact on both engines (no FP mean, no division).

    Scale shape: centroids broadcast (16 rows); the assignment is the
    Arrow matmul argmin (``_eo_assign_arrow`` — one BLAS (n,64)@(64,16)
    per batch, 3.4× the whole op at 100×, bit-equal to the retained
    SQL spec ``_eo_assign_sql``, both test-pinned); the only
    corpus-sized exchange carries (centroid_id, bigint) pairs. Cell
    stats are {_EO_CENTROIDS} rows, broadcast back for the outlier
    test; the embedding array never leaves the Arrow scan stage."""
    t = load_tables(spark, sf_dir)
    return _eo_report(_eo_assign_arrow(spark, t))


# --------------------------------------------------------------- bitext_mining

# Margin-based bitext mining (the CCMatrix/LASER recipe, simplified to
# the forward margin): for every English document, find its nearest
# non-English neighbor in embedding space and accept the pair only when
# the top-1 cosine clearly dominates the runner-up field — the margin
# criterion that separates true translations from generic topical
# similarity. Candidates come from the hyperplane-LSH bucket plus its
# 1-bit probes (ann_recall_eval's multiprobe pattern), so no all-pairs
# stage exists.
_BT_RUNNERS = 3  # margin denominator = mean cosine of ranks 2..4
_BT_MARGIN_MIN = 1.05
# n-scaled LSH space (the semdedup_pipeline treatment): the plane
# count u grows with the TARGET side so candidates per query stay
# ~constant instead of ~n/2^8. u = bitlen(max(n_tgt // 2, 1)) keeps
# u=8 at the shipped test SFs (bucket identical to the historical
# fixed-8 space there, planes being prefix-stable) and reaches the
# _BT_W=20 cap at n_tgt ≈ 2^20·2 ≈ 2M non-English docs per shard.
_BT_W = 20
_BT_TARGET = 2


def _bt_u(n_tgt: int) -> int:
    """Planes-per-corpus knob — same shape as ``_semp_u``; the oracle
    computes the identical value via ``length(bin(greatest(...)))``."""
    return min(max(n_tgt // _BT_TARGET, 1).bit_length(), _BT_W)


_BITEXT_ORACLE = f"""
WITH params AS (
  SELECT LEAST(LENGTH(BIN(GREATEST(CAST(COUNT(*) AS BIGINT) // {_BT_TARGET},
                                   1))), {_BT_W}) AS u
  FROM documents d JOIN read_parquet_embeddings e ON e.vec_id = d.doc_id
  WHERE d.lang <> 'en'
),
emb AS (
  SELECT d.doc_id, d.lang, e.embedding, p.u,
         CAST({_bucket_expr_duck(_BT_W)} AS BIGINT)
           & ((CAST(1 AS BIGINT) << p.u) - 1) AS bucket
  FROM documents d JOIN read_parquet_embeddings e ON e.vec_id = d.doc_id
  CROSS JOIN params p
),
q AS (
  SELECT doc_id AS query_id, embedding AS qe, bucket AS qbucket, u
  FROM emb WHERE lang = 'en'
),
tgt AS (
  SELECT doc_id AS cand_id, embedding AS ce, bucket FROM emb
  WHERE lang <> 'en'
),
probes AS (
  SELECT query_id, qe,
         unnest([qbucket] || list_transform(range(0, u),
                                            j -> xor(qbucket, 1 << j)))
           AS pbucket
  FROM q
),
scored AS (
  SELECT DISTINCT p.query_id, t.cand_id,
         ROUND({_cos_duck('p.qe', 't.ce')}, 6) AS cos_r
  FROM probes p JOIN tgt t ON t.bucket = p.pbucket
),
ranked AS (
  SELECT query_id, cand_id, cos_r,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cos_r DESC, cand_id) AS rk
  FROM scored
),
agg AS (
  SELECT query_id,
         MAX(CASE WHEN rk = 1 THEN cand_id END) AS match_id,
         MAX(CASE WHEN rk = 1 THEN cos_r END) AS cos_top,
         SUM(CASE WHEN rk BETWEEN 2 AND {1 + _BT_RUNNERS} THEN cos_r END)
           AS runner_sum,
         SUM(CASE WHEN rk BETWEEN 2 AND {1 + _BT_RUNNERS} THEN 1 ELSE 0 END)
           AS n_runners
  FROM ranked GROUP BY query_id
)
SELECT query_id, CAST(match_id AS BIGINT) AS match_id, cos_top,
       CASE WHEN n_runners = {_BT_RUNNERS} AND runner_sum > 0
            THEN ROUND(cos_top * {_BT_RUNNERS} / runner_sum, 6) END
         AS margin_r,
       COALESCE(n_runners = {_BT_RUNNERS} AND runner_sum > 0
                AND cos_top * {_BT_RUNNERS} / runner_sum > {_BT_MARGIN_MIN},
                FALSE) AS accepted
FROM agg
"""


@register(
    "bitext_mining",
    oracle=_BITEXT_ORACLE.replace(
        "read_parquet_embeddings", "embeddings"
    ),
)
def bitext_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Margin-based bitext mining (CCMatrix/LASER, forward margin): for
    every English document, the nearest non-English embedding neighbor,
    accepted only when the top-1 cosine exceeds {_BT_MARGIN_MIN}× the
    mean of the next {_BT_RUNNERS} — translation pairs stand out from
    the topical background by margin, not raw similarity. Queries with
    fewer than {_BT_RUNNERS} runners report NULL margin and are never
    accepted (no margin evidence, no pair).

    Scale shape: multiprobe LSH (own bucket + u 1-bit flips) bounds
    candidates per query — no all-pairs stage; the bucket join's
    exchange carries (bucket, id, embedding) rows exactly as
    ann_lsh's does, the per-query rank is a WindowGroupLimit-eligible
    row_number, and the margin arithmetic runs on the ≤4 surviving
    rows per query. The plane count u is sized DRIVER-SIDE from one
    count() of the non-English side — u = bitlen(max(n_tgt/2, 1)),
    capped at {_BT_W} — so the bucket space grows with the corpus and
    candidates per query stay ~constant: a fixed 8-plane space would
    grow candidate pairs ~n²/256 (measured 6.5× at 10× before this
    sizing; the n-scaled space measures ~linear — see
    test_bitext_candidates_scale_linearly). The oracle computes the
    identical u in SQL (length(bin(greatest(n//2,1)))) and masks a
    {_BT_W}-bit bucket down to u bits — bit-equal to summing the
    first u plane terms, planes being prefix-stable."""
    t = load_tables(spark, sf_dir)
    joined = t.documents.select("doc_id", "lang").join(
        t.embeddings.select(F.col("vec_id").alias("doc_id"), "embedding"),
        "doc_id",
    )
    return _bt_mine(joined)


def _bt_mine(joined: DataFrame) -> DataFrame:
    """Mining core over (doc_id, lang, embedding) — split out so the
    scale test can feed a replicated corpus through the exact
    production path."""
    n_tgt = joined.filter(F.col("lang") != "en").count()
    u = _bt_u(n_tgt)
    scored = _bt_scored(joined, u)
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_r").desc(), "cand_id"
    )
    return _bt_margin(scored, w)


def _bt_scored(joined: DataFrame, u: int) -> DataFrame:
    """Candidate generation + cosine scoring under a u-plane space:
    the stage whose row count the linear-scaling test pins."""
    emb = joined.select(
        "doc_id",
        "lang",
        "embedding",
        F.expr(_bucket_expr_spark(u)).cast("bigint").alias("bucket"),
    )
    q = emb.filter(F.col("lang") == "en").select(
        F.col("doc_id").alias("query_id"),
        F.col("embedding").alias("qe"),
        F.col("bucket").alias("qbucket"),
    )
    tgt = emb.filter(F.col("lang") != "en").select(
        F.col("doc_id").alias("cand_id"),
        F.col("embedding").alias("ce"),
        "bucket",
    )
    probes = q.select(
        "query_id",
        "qe",
        F.explode(
            F.expr(
                f"array(qbucket) || transform(sequence(0, {u - 1}), "
                "j -> qbucket ^ shiftleft(1L, j))"
            )
        ).alias("pbucket"),
    )
    return (
        probes.join(tgt, probes.pbucket == tgt.bucket)
        .select(
            "query_id",
            "cand_id",
            F.round(_cos_exact_pd("qe", "ce"), 6).alias("cos_r"),
        )
        .distinct()
    )


def _bt_margin(scored: DataFrame, w) -> DataFrame:
    ranked = scored.withColumn("rk", F.row_number().over(w)).filter(
        F.col("rk") <= 1 + _BT_RUNNERS
    )
    agg = ranked.groupBy("query_id").agg(
        F.max(F.when(F.col("rk") == 1, F.col("cand_id"))).alias("match_id"),
        F.max(F.when(F.col("rk") == 1, F.col("cos_r"))).alias("cos_top"),
        F.sum(
            F.when(F.col("rk") >= 2, F.col("cos_r"))
        ).alias("runner_sum"),
        F.sum(F.when(F.col("rk") >= 2, F.lit(1)).otherwise(F.lit(0))).alias(
            "n_runners"
        ),
    )
    full = (F.col("n_runners") == _BT_RUNNERS) & (F.col("runner_sum") > 0)
    margin = F.col("cos_top") * _BT_RUNNERS / F.col("runner_sum")
    return agg.select(
        "query_id",
        F.col("match_id").cast("bigint").alias("match_id"),
        "cos_top",
        F.when(full, F.round(margin, 6)).alias("margin_r"),
        F.coalesce(
            full & (margin > _BT_MARGIN_MIN), F.lit(False)
        ).alias("accepted"),
    )


# --------------------------------------------------------------- knn_label_eval

# Intrinsic embedding-quality eval: leave-one-out kNN classification
# over the labeled vectors — if k nearest neighbors vote the right
# label, the space is good enough to drive semantic dedup / retrieval.
# ann_recall_eval measures the INDEX (LSH recall vs brute force); this
# measures the EMBEDDING (do neighborhoods respect labels at all).
_KNN_K = 3
# evals run on a FIXED query panel: an eval set does not grow with the
# corpus (a fixed FRACTION still does, and measured quadratic — the
# candidate volume is queries × n/buckets, so only a constant query
# count makes the whole plan linear in n under fixed planes)
_KNN_QUERY_PANEL = 512

_KNN_ORACLE = f"""
WITH emb AS (
  SELECT vec_id, label, embedding,
         CAST({_bucket_expr_duck()} AS BIGINT) AS bucket
  FROM embeddings
),
probes AS (
  SELECT vec_id AS query_id, label AS true_label, embedding AS qe,
         unnest([bucket] || list_transform(range(0, {_N_PLANES}),
                                           j -> xor(bucket, 1 << j)))
           AS pbucket
  FROM emb WHERE vec_id < {_KNN_QUERY_PANEL}
),
scored AS (
  SELECT DISTINCT p.query_id, p.true_label, e.vec_id AS cand_id,
         e.label AS cand_label,
         ROUND({_cos_duck('p.qe', 'e.embedding')}, 6) AS cos_r
  FROM probes p JOIN emb e
    ON e.bucket = p.pbucket AND e.vec_id <> p.query_id
),
topk AS (
  SELECT query_id, true_label, cand_label FROM (
    SELECT query_id, true_label, cand_label,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY cos_r DESC, cand_id) AS rk
    FROM scored
  ) WHERE rk <= {_KNN_K}
),
votes AS (
  SELECT query_id, true_label, cand_label,
         CAST(COUNT(*) AS BIGINT) AS v
  FROM topk GROUP BY query_id, true_label, cand_label
),
pred AS (
  SELECT query_id, true_label, cand_label AS pred_label FROM (
    SELECT query_id, true_label, cand_label, v,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY v DESC, cand_label) AS rk
    FROM votes
  ) WHERE rk = 1
)
SELECT true_label AS label,
       CAST(COUNT(*) AS BIGINT) AS n_queries,
       CAST(SUM(CASE WHEN pred_label = true_label THEN 1 ELSE 0 END)
            AS BIGINT) AS n_correct,
       CAST(SUM(CASE WHEN pred_label = true_label THEN 1 ELSE 0 END)
            * 1000000 // COUNT(*) AS BIGINT) AS acc_ppm
FROM pred GROUP BY true_label
"""


@register("knn_label_eval", oracle=_KNN_ORACLE)
def knn_label_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leave-one-out {_KNN_K}-NN label accuracy per class — the
    intrinsic embedding-quality eval run before trusting a space for
    semantic dedup or retrieval (``ann_recall_eval`` measures the
    INDEX against brute force; this measures whether neighborhoods
    respect labels at all). Neighbors come from the multiprobe LSH
    buckets, votes break ties by label, accuracy is an exact integer
    ppm. Queries whose probes surface no candidates simply drop from
    the denominator (no vote, no claim). The query side is a FIXED
    {_KNN_QUERY_PANEL}-vector panel — an eval set does not grow with
    the corpus; both every-vector-queries and a fixed FRACTION were
    measured quadratic under fixed planes (candidates = queries ×
    n/buckets), while a constant panel keeps the whole plan linear
    in n.

    Scale shape: the ann_lsh candidate plan (bucket + {_N_PLANES}
    1-bit probes — no all-pairs), two WindowGroupLimit-eligible
    rank-1/rank-k windows keyed per query, and a |labels|-row
    rollup."""
    t = load_tables(spark, sf_dir)
    emb = t.embeddings.select(
        "vec_id",
        "label",
        "embedding",
        F.expr(_bucket_expr_spark()).cast("bigint").alias("bucket"),
    )
    probes = emb.filter(
        F.col("vec_id") < _KNN_QUERY_PANEL
    ).select(
        F.col("vec_id").alias("query_id"),
        F.col("label").alias("true_label"),
        F.col("embedding").alias("qe"),
        F.explode(
            F.expr(
                f"array(bucket) || transform(sequence(0, {_N_PLANES - 1}), "
                "j -> bucket ^ shiftleft(1L, j))"
            )
        ).alias("pbucket"),
    )
    cand = emb.select(
        F.col("vec_id").alias("cand_id"),
        F.col("label").alias("cand_label"),
        F.col("embedding").alias("ce"),
        "bucket",
    )
    scored = (
        probes.join(
            cand,
            (probes.pbucket == cand.bucket)
            & (F.col("cand_id") != F.col("query_id")),
        )
        .select(
            "query_id",
            "true_label",
            "cand_id",
            "cand_label",
            F.round(_cos_exact_pd("qe", "ce"), 6).alias("cos_r"),
        )
        .distinct()
    )
    wk = Window.partitionBy("query_id").orderBy(
        F.col("cos_r").desc(), "cand_id"
    )
    topk = scored.withColumn("rk", F.row_number().over(wk)).filter(
        F.col("rk") <= _KNN_K
    )
    votes = topk.groupBy("query_id", "true_label", "cand_label").agg(
        F.count(F.lit(1)).alias("v")
    )
    wv = Window.partitionBy("query_id").orderBy(
        F.col("v").desc(), "cand_label"
    )
    pred = (
        votes.withColumn("rk", F.row_number().over(wv))
        .filter(F.col("rk") == 1)
        .select("query_id", "true_label", F.col("cand_label").alias("pred"))
    )
    return pred.groupBy(F.col("true_label").alias("label")).agg(
        F.count(F.lit(1)).alias("n_queries"),
        F.sum((F.col("pred") == F.col("true_label")).cast("int"))
        .cast("bigint")
        .alias("n_correct"),
    ).select(
        "label",
        "n_queries",
        "n_correct",
        F.expr("n_correct * 1000000 div n_queries").alias("acc_ppm"),
    )


# -------------------------------------------------------------------- pq_train

# Trained PQ codebooks — the production upgrade over ann_pq's
# first-16-vectors stand-in: per SUBSPACE k-means (8 independent
# 8-dim Lloyd runs, one per PQ slice) minimizing the same squared-L2
# the encoder uses. All 8 runs execute as ONE subspace-keyed frame —
# (sub, vec_id, sv) rows assign against a broadcast (sub, code, cd)
# codebook joined on sub — so the iteration cost is kmeans_iterate's
# (one broadcast + one (sub, code, pos)-keyed partial-agg shuffle per
# step), not 8×. Centroids quantize to 1e-6 between steps
# (kmeans_iterate's floor/scaled-int64/exact-sum walk), making the
# whole training trajectory bit-identical across engines and
# partitionings — which is what lets a trained-FP-algorithm output be
# oracle-checked exactly. One residual ulp-edge assumption (r10
# advice): the ASSIGNMENT tie-break orders by ROUND(l2, 6), and Spark
# rounds via BigDecimal on the shortest decimal repr while DuckDB
# rounds the binary double — an l2 within an ulp of a .xxxxxx5
# decimal boundary could round differently across engines. Distances
# here are sums of ≤8 exactly-representable (q/1e6) differences
# squared, so boundary hits are measure-zero and none occur at any
# tested SF; the fully-closed form would compare cross-multiplied
# integer micro-units as embedding_outliers does.
_PQT_ITERS = 2
_PQT_SCALE = 1_000_000
# Registered training-set bound (r10 verdict item 2): codebook quality
# saturates on a fixed sample (faiss practice ~max(256·k, 1e5) points;
# measured 65.7s → 8.9s at the 100× replica with recall preserved —
# BASELINE.md round-10/11 rows), and "first N vec_ids" is exactly
# replayable in DuckDB, so the REGISTERED pq_train/ann_pq_trained now
# train sample-bounded. At every driver SF (≤ 2k vectors) the bound is
# a no-op, so historical driver rows describe the same computation.
_PQT_SAMPLE_N = 20_000


def _pqt_quant(x: str) -> str:
    return (
        f"cast(floor({x} * {_PQT_SCALE}) as double) / {_PQT_SCALE}.0D"
    )


_PQT_L2_SPARK = (
    "aggregate(zip_with(sv, cd, (x, y) -> (x - y) * (x - y)), 0D,"
    " (acc, v) -> acc + v)"
)
_PQT_L2_DUCK = (
    f"list_sum(list_transform(range(1, {_PQ_DSUB + 1}),"
    " i -> (s.sv[i] - c.cd[i]) * (s.sv[i] - c.cd[i])))"
)


def _pqt_sub_rows(emb: DataFrame) -> DataFrame:
    """(vec_id, sub, sv double[8]): every vector split into its 8 PQ
    slices — one exploded frame so all 8 trainings share each pass."""
    return emb.select(
        "vec_id",
        F.expr(
            f"explode(transform(sequence(0, {_PQ_M - 1}), m -> struct("
            f"m as sub, transform(slice(embedding, m * {_PQ_DSUB} + 1,"
            f" {_PQ_DSUB}), x -> cast(x as double)) as sv)))"
        ).alias("e"),
    ).select("vec_id", "e.sub", "e.sv")


def _pqt_assign(sub_rows: DataFrame, cb: DataFrame) -> DataFrame:
    """Argmin squared-L2 against the broadcast codebook, per subspace;
    ties break to the lowest code id (the encoder's rule). The argmin
    is ann_pq's min(struct(d, code, sv)) HashAggregate — (d_r, code)
    is unique per group so sv is never compared — rather than a
    row_number window (no sort; measured ~equal at 100×, where the
    interpreted HOF distance arithmetic dominates either shape —
    the embedding_outliers profile's conclusion, see pq_train's
    sample_n for the production mitigation)."""
    return (
        sub_rows.join(F.broadcast(cb.select("sub", "code", "cd")), "sub")
        .select(
            "vec_id",
            "sub",
            F.struct(
                F.round(F.expr(_PQT_L2_SPARK), 6).alias("d_r"),
                F.col("code").alias("code"),
                F.col("sv").alias("sv"),
            ).alias("cand"),
        )
        .groupBy("sub", "vec_id")
        .agg(F.min("cand").alias("m"))
        .select(
            "vec_id", "sub", F.col("m.sv").alias("sv"), F.col("m.code").alias("code")
        )
    )


def _pqt_update(assigned: DataFrame) -> DataFrame:
    """Exact quantized centroid re-estimation: floor to scaled int64,
    bigint partial-agg sum per (sub, code, pos), one double division."""
    per_dim = (
        assigned.select(
            "sub", "code", F.posexplode("sv").alias("pos", "x")
        )
        .select(
            "sub",
            "code",
            "pos",
            F.floor(F.col("x") * _PQT_SCALE).cast("bigint").alias("svq"),
        )
        .groupBy("sub", "code", "pos")
        .agg(
            (
                F.sum("svq").cast("double")
                / (F.count(F.lit(1)) * float(_PQT_SCALE))
            ).alias("dval"),
            F.count(F.lit(1)).cast("bigint").alias("cnt"),
        )
    )
    return per_dim.groupBy("sub", "code").agg(
        F.expr(
            "transform(array_sort(collect_list(struct(pos, dval))),"
            " s -> s.dval)"
        ).alias("cd"),
        F.min("cnt").alias("n"),
    )


def pq_train_codebook(
    spark: SparkSession,
    sf_dir: str,
    k: int = _PQ_K,
    iters: int = _PQT_ITERS,
    sample_n: int | None = None,
    emb: DataFrame | None = None,
) -> DataFrame:
    """Train the PQ codebooks; returns (sub, code, cd double[8], n) —
    the frame ``ann_pq``-style encoders consume in place of the
    first-16-vectors stand-in. Init is the first ``k`` vectors' slices
    (quantized), so iteration 0 reproduces the stand-in exactly and
    every Lloyd step strictly improves the encoder's own objective.
    ``k``/``iters`` parameterize production settings (K=256 is one
    more code bit — the plan per step is IDENTICAL: one k·{_PQ_M}-row
    broadcast + one (sub, code, pos)-keyed partial-agg shuffle).

    ``sample_n`` bounds the TRAINING set (first sample_n vec_ids):
    codebook quality saturates on a fixed sample (the faiss practice —
    ~max(256·k, 10^5) points per codebook), so production training is
    O(sample), independent of corpus size; only the one-pass ENCODE is
    corpus-bounded. The registered ``pq_train`` trains sample-bounded
    (sample_n=_PQT_SAMPLE_N — r10 verdict item 2): "first N vec_ids"
    replays exactly in DuckDB, so the oracle checks the identical
    sampled walk.

    ``emb`` overrides the input frame (vec_id, embedding) — the hook
    the OPQ/rotation experiments train through (BASELINE.md round-11
    rotation table); default is the sf_dir embeddings table."""
    if emb is None:
        t = load_tables(spark, sf_dir)
        emb = t.embeddings.select("vec_id", "embedding")
    if sample_n is not None:
        emb = emb.filter(F.col("vec_id") < sample_n)
    sub_rows = _pqt_sub_rows(emb).persist()
    cb = _pqt_sub_rows(emb.filter(F.col("vec_id") < k)).select(
        "sub",
        F.col("vec_id").alias("code"),
        F.expr(f"transform(sv, x -> {_pqt_quant('x')})").alias("cd"),
        F.lit(1).cast("bigint").alias("n"),
    )
    for _ in range(iters):
        cb = _pqt_update(_pqt_assign(sub_rows, cb)).localCheckpoint(
            eager=True
        )
    sub_rows.unpersist()
    return cb


def _pqt_ctes() -> str:
    """Unrolled per-subspace Lloyd chain for the DuckDB oracle:
    pqsub (slices), pqcb0 (quantized init), pa{i}/pqcb{i} per step.
    Training CTEs see only the first {_PQT_SAMPLE_N} vec_ids — the
    registered sample bound — while pqsub stays full so the encode
    consumer (ann_pq_trained) can encode every vector."""
    ctes = [
        f"""pqsub AS (
  SELECT e.vec_id, u.m AS sub,
         list_transform(range(1, {_PQ_DSUB + 1}),
           i -> CAST(e.embedding[u.m * {_PQ_DSUB} + i] AS DOUBLE)) AS sv
  FROM embeddings e, UNNEST(range(0, {_PQ_M})) AS u(m)
)""",
        f"""pqcb0 AS (
  SELECT sub, vec_id AS code,
         list_transform(sv,
           x -> floor(x * {_PQT_SCALE}) / {_PQT_SCALE}.0) AS cd
  FROM pqsub WHERE vec_id < {_PQ_K}
)""",
    ]
    for i in range(1, _PQT_ITERS + 1):
        ctes.append(
            f"""pa{i} AS (
  SELECT vec_id, sub, sv, code FROM (
    SELECT s.vec_id, s.sub, s.sv, c.code,
           ROW_NUMBER() OVER (PARTITION BY s.sub, s.vec_id
             ORDER BY ROUND({_PQT_L2_DUCK}, 6), c.code) AS rk
    FROM pqsub s JOIN pqcb{i - 1} c ON c.sub = s.sub
    WHERE s.vec_id < {_PQT_SAMPLE_N}
  ) WHERE rk = 1
)"""
        )
        ctes.append(
            f"""pqcb{i} AS (
  SELECT sub, code, list(dval ORDER BY pos) AS cd, MIN(cnt) AS n FROM (
    SELECT sub, code, pos,
           CAST(SUM(svq) AS DOUBLE) / (COUNT(*) * {_PQT_SCALE}.0) AS dval,
           CAST(COUNT(*) AS BIGINT) AS cnt
    FROM (
      SELECT a.sub, a.code, u.pos,
             CAST(floor(a.sv[u.pos + 1] * {_PQT_SCALE}) AS BIGINT) AS svq
      FROM pa{i} a, UNNEST(range(0, {_PQ_DSUB})) AS u(pos)
    ) GROUP BY sub, code, pos
  ) GROUP BY sub, code
)"""
        )
    return ",\n".join(ctes)


_PQT_ORACLE = f"""
WITH {_pqt_ctes()}
SELECT CAST(sub AS INTEGER) AS sub, CAST(code AS INTEGER) AS code,
       n AS n_members, ROUND(cd[1], 6) AS dim1_mean
FROM pqcb{_PQT_ITERS}
"""


@register("pq_train", oracle=_PQT_ORACLE)
def pq_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ codebook TRAINING — per-subspace k-means ({_PQ_M} subspaces ×
    {_PQ_K} codes, {_PQT_ITERS} Lloyd steps) minimizing the encoder's
    own squared-L2, replacing ``ann_pq``'s first-16-vectors stand-in
    with real centroids. Per surviving code: member count and the
    centroid's first coordinate (the oracle replays the identical
    quantized walk).

    Scale shape: one exploded (sub, vec_id, slice) frame carries all
    {_PQ_M} trainings together; each step is one broadcast
    ({_PQ_M}×{_PQ_K} rows) + one (sub, code, pos)-keyed partial-agg
    shuffle — kmeans_iterate's per-step cost, NOT {_PQ_M}× it; the
    per-step frame localCheckpoints so the plan stays constant-size.
    Slices are 8 doubles: the corpus-sized exchange carries
    (sub, code, pos, int64) scalars only."""
    cb = pq_train_codebook(spark, sf_dir, sample_n=_PQT_SAMPLE_N)
    return cb.select(
        F.col("sub").cast("int").alias("sub"),
        F.col("code").cast("int").alias("code"),
        F.col("n").alias("n_members"),
        F.round(F.element_at("cd", 1), 6).alias("dim1_mean"),
    )


def pq_standin_codebook(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ann_pq's untrained stand-in as a codebook frame — the first 16
    vectors' slices, (sub, code, cd) — so encoders and evaluations can
    swap it against ``pq_train_codebook`` output directly."""
    t = load_tables(spark, sf_dir)
    return _pqt_sub_rows(
        t.embeddings.filter(F.col("vec_id") < _PQ_K)
    ).select("sub", F.col("vec_id").alias("code"), F.col("sv").alias("cd"))


def pq_encode(emb: DataFrame, cb: DataFrame) -> DataFrame:
    """Encode vectors against a (sub, code, cd) codebook: (vec_id, sub,
    code) — the squared-L2 argmin per slice, lowest-code tie-break
    (identical to ann_pq's rule). Codebook broadcasts; one scan."""
    return _pqt_assign(_pqt_sub_rows(emb), cb).select(
        "vec_id", "sub", "code"
    )


# --------------------------------------------------------------- ann_pq_trained

def _pq_trained_oracle() -> str:
    """Train (the pq_train CTE chain) then encode EVERY vector against
    the trained codebooks — the same argmin/tie-break as ann_pq."""
    return f"""
WITH {_pqt_ctes()},
enc AS (
  SELECT vec_id, sub, code FROM (
    SELECT s.vec_id, s.sub, c.code,
           ROW_NUMBER() OVER (PARTITION BY s.sub, s.vec_id
             ORDER BY ROUND({_PQT_L2_DUCK}, 6), c.code) AS rk
    FROM pqsub s JOIN pqcb{_PQT_ITERS} c ON c.sub = s.sub
  ) WHERE rk = 1
)
SELECT vec_id,
       CAST(MIN(CASE WHEN sub = 0 THEN code END) AS BIGINT) AS code_first,
       CAST(SUM(code) AS BIGINT) AS code_sum
FROM enc GROUP BY vec_id
"""


@register("ann_pq_trained", oracle=_pq_trained_oracle())
def ann_pq_trained(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product quantization encode with TRAINED codebooks — ``ann_pq``
    fed by ``pq_train`` instead of the first-16-vectors stand-in: the
    production IVFPQ write path end-to-end (train → encode in one
    plan). Same checkable scalars as ann_pq (first code + code sum);
    measured recall impact of the trained codebooks is in BASELINE.md
    (§ round-10 pq_train recall evidence: +31-44% relative recall@5
    at identical index size).

    Scale shape: training is pq_train's ({_PQT_ITERS} broadcast +
    partial-agg rounds over the exploded slice frame, SAMPLE-BOUNDED
    to the first _PQT_SAMPLE_N vec_ids — the faiss practice, and the
    registered form since r11); encode is the
    Arrow matmul twin ``pq_encode_arrow`` (one vectorized argmin per
    batch×subspace, bit-equal to the SQL spec ``pq_encode``,
    test-pinned — 128 interpreted-HOF distances per vector measured
    3.5× the whole op at 100×, BASELINE.md round-10 rows); the
    codebook is {_PQ_M}×{_PQ_K} rows however big the corpus, and the
    encode exchange carries (vec_id, sub, code) scalars only."""
    t = load_tables(spark, sf_dir)
    cb = pq_train_codebook(
        spark, sf_dir, sample_n=_PQT_SAMPLE_N
    ).localCheckpoint(eager=True)
    enc = pq_encode_arrow(
        spark, t.embeddings.select("vec_id", "embedding"), cb
    )
    return enc.groupBy("vec_id").agg(
        F.min(F.when(F.col("sub") == 0, F.col("code")))
        .cast("bigint")
        .alias("code_first"),
        F.sum("code").cast("bigint").alias("code_sum"),
    )


def pq_encode_arrow(spark: SparkSession, emb: DataFrame, cb: DataFrame) -> DataFrame:
    """Arrow twin of ``pq_encode`` — the corpus-bounded encode pass as
    one vectorized squared-diff argmin per (batch, subspace) instead of
    128 interpreted-HOF distances per vector (the embedding_outliers
    recipe). Equality with the SQL spec is engineered the same way:

    - distances use the spec's (x-c)² diff form (not the cancellation-
      prone ‖x‖²+‖c‖²-2x·c expansion), scaled to 1e-6 units with the
      exact-fraction HALF_UP kernel;
    - the spec rounds to 6 DECIMALS (``round(l2, 6)``), i.e. BigDecimal
      of the double's shortest repr setScale(6, HALF_UP) — so entries
      within 1e-7 of the .5 boundary recompute the spec's left-to-right
      fold and round via Decimal(repr(x)).quantize (Python's repr is
      the same shortest round-trip string BigDecimal.valueOf sees);
      argmin over the scaled int64s equals argmin over the rounded
      doubles because distinct 6dp decimals stay distinct as doubles;
    - codebook rows sort by code per subspace, and argmin takes the
      FIRST minimum — the spec's lowest-code tie-break.

    The codebook (≤ k·8 tiny rows) collects once and broadcasts."""
    import numpy as np
    import pandas as pd

    rows = cb.select("sub", "code", "cd").collect()
    by_sub: dict[int, list] = {}
    for r in rows:
        by_sub.setdefault(int(r.sub), []).append(
            (int(r.code), np.array(r.cd, dtype=np.float64))
        )
    packed = {
        m: (
            np.array([c for c, _ in sorted(v)], dtype=np.int64),
            np.stack([a for _, a in sorted(v)]),
        )
        for m, v in by_sub.items()
    }
    bc = spark.sparkContext.broadcast(packed)

    def _batches(it):
        from decimal import ROUND_HALF_UP, Decimal

        P = bc.value
        for pdf in it:
            if len(pdf) == 0:
                continue
            X = np.array(pdf["embedding"].tolist(), dtype=np.float64)
            vids = pdf["vec_id"].to_numpy()
            out = []
            for m, (codes, M) in sorted(P.items()):
                Xs = X[:, m * _PQ_DSUB : (m + 1) * _PQ_DSUB]
                diff = Xs[:, None, :] - M[None, :, :]
                scaled = (diff * diff).sum(axis=2) * 1_000_000.0
                fl = np.floor(scaled)
                frac = scaled - fl  # exact for doubles (scaled >= 0)
                r = (fl + (frac >= 0.5)).astype(np.int64)
                # the recompute window must scale with MAGNITUDE: the
                # numpy-vs-spec drift is ~scaled·1e-15 (pairwise vs
                # left fold, ~8 terms), so a fixed window would stop
                # covering it once scaled > ~1e8; 1e-12·scaled keeps a
                # ~500× margin at every magnitude
                window = np.maximum(1e-7, scaled * 1e-12)
                for i, j in np.argwhere(np.abs(frac - 0.5) < window):
                    x, c = Xs[i], M[j]
                    s2 = 0.0
                    for d in range(len(x)):  # the spec's fold order
                        dd = x[d] - c[d]
                        s2 += dd * dd
                    r[i, j] = int(
                        Decimal(repr(s2)).quantize(
                            Decimal("0.000001"), rounding=ROUND_HALF_UP
                        )
                        * 1_000_000
                    )
                jmin = r.argmin(axis=1)  # first min = lowest code
                out.append(
                    pd.DataFrame(
                        {
                            "vec_id": vids,
                            "sub": np.full(len(vids), m, dtype=np.int32),
                            "code": codes[jmin],
                        }
                    )
                )
            yield pd.concat(out, ignore_index=True)

    return emb.select("vec_id", "embedding").mapInPandas(
        _batches, schema="vec_id long, sub int, code long"
    )


# ----------------------------------------------------------------- opq_train

_OPQ_SCALE = 1_000_000


def _opq_rotate(spark: SparkSession, emb: DataFrame, r_int) -> DataFrame:
    """Apply the int-quantized rotation to (vec_id, embedding) —
    DETERMINISTIC regardless of partitioning: inputs quantize to
    int64 (round(x·1e6)), the matmul is exact integer arithmetic
    (|x|·|r| ≤ 1e12, ×{_DIM} terms ≪ int64 range), and only the final
    rescale is floating — so every engine/partitioning computes the
    identical rotated vector."""
    import numpy as np
    import pandas as pd

    bc = spark.sparkContext.broadcast(r_int)

    def _rot(it):
        R = bc.value
        for pdf in it:
            if len(pdf) == 0:
                continue
            X = np.array(pdf["embedding"].tolist(), dtype=np.float64)
            Xi = np.rint(X * _OPQ_SCALE).astype(np.int64)
            Y = (Xi @ R).astype(np.float64) / (_OPQ_SCALE * _OPQ_SCALE)
            yield pd.DataFrame(
                {"vec_id": pdf["vec_id"], "embedding": list(Y)}
            )

    return emb.select("vec_id", "embedding").mapInPandas(
        _rot, schema="vec_id long, embedding array<double>"
    )


def opq_train(
    spark: SparkSession,
    sf_dir: str,
    k: int = _PQ_K,
    iters: int = 3,
    pq_iters: int = _PQT_ITERS,
    sample_n: int | None = _PQT_SAMPLE_N,
    emb: DataFrame | None = None,
):
    """LEARNED OPQ rotation (Ge et al., "Optimized Product
    Quantization", CVPR 2013 — non-parametric alternating
    optimization): find an orthogonal R so that PQ over X·R loses less
    than PQ over X. Each round (a) trains the {_PQ_M}×k codebooks on
    the rotated sample through the EXISTING distributed
    ``pq_train_codebook`` frame, (b) computes the quantized
    reconstruction Y of X·R, and (c) re-solves R by orthogonal
    Procrustes: R = U·Vᵀ from svd(Xᵀ·Y) — the closed-form argmin of
    ‖X·R − Y‖². Init is the IDENTITY, so round 0 reproduces the
    unrotated baseline exactly and the alternation can only reduce the
    training objective (the r11 lesson: a data-BLIND rotation measured
    0.181 vs 0.250 recall@5 — only a learned one is justifiable;
    recall gate + decision in BASELINE.md round-13).

    Returns ``(r_int, cb)``: the rotation as an int64 {_DIM}×{_DIM}
    matrix in 1e6 units (one broadcast-able, engine-portable artifact
    — consumers rotate via ``_opq_rotate`` and encode via
    ``pq_encode_arrow``) and the final codebook frame trained on the
    rotated inputs.

    Scale shape: training is SAMPLE-BOUNDED like ``pq_train`` (faiss
    practice); per round = one Arrow rotate pass + pq_train_codebook's
    broadcast/partial-agg steps + one Arrow encode-and-cross pass
    whose exchange is ONE {_DIM}×{_DIM} int64 partial sum per
    partition (exact integer outer-product accumulation — order-
    independent, so the walk is reproducible on any partitioning);
    the SVD is a {_DIM}×{_DIM} driver-side solve. Nothing in the loop
    grows with the corpus."""
    import numpy as np
    import pandas as pd

    if emb is None:
        t = load_tables(spark, sf_dir)
        emb = t.embeddings.select("vec_id", "embedding")
    if sample_n is not None:
        emb = emb.filter(F.col("vec_id") < sample_n)
    emb = emb.localCheckpoint(eager=True)

    r_int = np.eye(_DIM, dtype=np.int64) * _OPQ_SCALE
    cb = None
    for _ in range(iters):
        rot = _opq_rotate(spark, emb, r_int).localCheckpoint(eager=True)
        cb = pq_train_codebook(
            spark, sf_dir, k=k, iters=pq_iters, emb=rot
        )
        # one Arrow pass: re-rotate each batch from the ORIGINAL
        # vectors (exact int matmul — no join against rot needed),
        # encode against the broadcast codebook (plain float64 argmin,
        # first minimum = lowest code; deterministic per vector), and
        # emit the batch's exact int64 cross-matrix Xᵀ·Y partial sum
        rows = cb.collect()
        by_sub: dict[int, list] = {}
        for r in rows:
            by_sub.setdefault(int(r.sub), []).append(
                (int(r.code), np.array(r.cd, dtype=np.float64))
            )
        packed = {
            m: np.stack([a for _, a in sorted(v)])
            for m, v in by_sub.items()
        }
        bc_cb = spark.sparkContext.broadcast(packed)
        bc_r = spark.sparkContext.broadcast(r_int)

        def _cross(it):
            C = np.zeros((_DIM, _DIM), dtype=np.int64)
            Rl, P = bc_r.value, bc_cb.value
            seen = False
            for pdf in it:
                if len(pdf) == 0:
                    continue
                seen = True
                X = np.array(pdf["embedding"].tolist(), dtype=np.float64)
                Xi = np.rint(X * _OPQ_SCALE).astype(np.int64)
                Xr = (Xi @ Rl).astype(np.float64) / (
                    _OPQ_SCALE * _OPQ_SCALE
                )
                Y = np.empty_like(Xr)
                for m, M in sorted(P.items()):
                    Xs = Xr[:, m * _PQ_DSUB : (m + 1) * _PQ_DSUB]
                    diff = Xs[:, None, :] - M[None, :, :]
                    jmin = (diff * diff).sum(axis=2).argmin(axis=1)
                    Y[:, m * _PQ_DSUB : (m + 1) * _PQ_DSUB] = M[jmin]
                Yi = np.rint(Y * _OPQ_SCALE).astype(np.int64)
                C += Xi.T @ Yi  # exact: |x·y| ≤ 1e12 × |sample| ≪ 2^63
            if seen:
                yield pd.DataFrame({"c": [C.ravel().tolist()]})

        parts = (
            emb.mapInPandas(_cross, schema="c array<long>")
            .collect()
        )
        C = np.zeros(_DIM * _DIM, dtype=np.int64)
        for r in parts:
            C += np.array(r.c, dtype=np.int64)
        C = C.reshape(_DIM, _DIM).astype(np.float64)
        U, _s, Vt = np.linalg.svd(C)
        r_int = np.rint((U @ Vt) * _OPQ_SCALE).astype(np.int64)

    rot = _opq_rotate(spark, emb, r_int).localCheckpoint(eager=True)
    cb = pq_train_codebook(spark, sf_dir, k=k, iters=pq_iters, emb=rot)
    return r_int, cb


# ------------------------------------------------------------- kcenter_select

# Greedy k-center coreset selection (Gonzalez 1985; the "diverse
# subset" selector embedding-curation pipelines run to seed balanced
# fine-tuning sets): start from the lowest vec_id, then repeatedly
# take the point FARTHEST from everything already selected. The
# selection radius sequence is the 2-approximation certificate of the
# optimal k-center cost. Distances are squared L2 over 1e3-quantized
# integer coordinates (the _SEM_XS recipe: round(e·1000) half-away-
# from-zero agrees across engines), so the entire greedy trajectory
# is bit-identical and oracle-checkable — no FP argmax ties to drift.
_KC_XS = 1000
_KC_PICKS = 4  # greedy picks after the seed

_KC_XI_SPARK = (
    f"transform(embedding, e -> cast(round(cast(e as double) * {_KC_XS})"
    " as bigint))"
)
_KC_XI_DUCK = (
    f"list_transform(embedding, e -> CAST(round(CAST(e AS DOUBLE) * {_KC_XS})"
    " AS BIGINT))"
)


def _kc_oracle() -> str:
    dist = (
        f"CAST(list_sum(list_transform(range(1, {_DIM + 1}),"
        " i -> ({a}.xi[i] - {b}.xi[i]) * ({a}.xi[i] - {b}.xi[i])))"
        " AS BIGINT)"
    )
    ctes = [
        f"q AS (SELECT vec_id, {_KC_XI_DUCK} AS xi FROM embeddings)",
        "p0 AS (SELECT vec_id, xi FROM q ORDER BY vec_id LIMIT 1)",
        f"""d0 AS (
  SELECT q.vec_id, q.xi, {dist.format(a='q', b='p')} AS dmin
  FROM q CROSS JOIN p0 p
)""",
    ]
    for s in range(1, _KC_PICKS + 1):
        ctes.append(
            f"""p{s} AS (
  SELECT vec_id, xi, dmin FROM d{s - 1}
  ORDER BY dmin DESC, vec_id LIMIT 1
)"""
        )
        if s < _KC_PICKS:
            ctes.append(
                f"""d{s} AS (
  SELECT d.vec_id, d.xi,
         LEAST(d.dmin, {dist.format(a='d', b='p')}) AS dmin
  FROM d{s - 1} d CROSS JOIN p{s} p
)"""
            )
    tail = ["SELECT CAST(0 AS INTEGER) AS pick, vec_id,"
            " CAST(0 AS BIGINT) AS radius_sq FROM p0"]
    for s in range(1, _KC_PICKS + 1):
        tail.append(
            f"SELECT CAST({s} AS INTEGER) AS pick, vec_id,"
            f" dmin AS radius_sq FROM p{s}"
        )
    return "WITH " + ",\n".join(ctes) + "\n" + "\nUNION ALL\n".join(tail)


@register("kcenter_select", oracle=_kc_oracle())
def kcenter_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy k-center coreset selection (Gonzalez 1985) over the
    embedding table: seed = lowest vec_id, then _KC_PICKS rounds of
    "take the point farthest (max-min squared L2) from the selected
    set", ties to the lower vec_id. Output is the selection
    trajectory — (pick order, vec_id, selection radius) — whose
    radius column is the classic 2-approximation certificate and the
    diminishing-returns curve a curation run reads to choose k.
    Integer-quantized coordinates make the greedy argmax exact on
    both engines.

    Scale shape: each round is ONE distance-update projection against
    the latest pick (inlined as a 64-literal constant — broadcast of
    a 1-row table degenerated to codegen) plus one TakeOrdered(1) —
    no shuffle except the single-row argmax reduction; the quantized
    frame persists across rounds so the corpus scans once. Driver
    state is k rows of 64 ints (the kmeans-centroid collect class).
    k-center at a real 1e9-vector scale runs the identical plan —
    cost is k corpus passes, the known lower bound for exact greedy
    (approximations like k-center++ subsample between rounds; same
    plan shape on a sampled frame)."""
    t = load_tables(spark, sf_dir)
    q = t.embeddings.select(
        "vec_id", F.expr(_KC_XI_SPARK).alias("xi")
    ).persist()
    seed = q.orderBy("vec_id").limit(1).collect()[0]
    picks = [(0, int(seed.vec_id), 0)]

    def dist_to(xs: list) -> str:
        arr = "array(" + ", ".join(f"{int(v)}L" for v in xs) + ")"
        return (
            f"aggregate(zip_with(xi, {arr}, (a, b) -> (a - b) * (a - b)),"
            " 0L, (acc, v) -> acc + v)"
        )

    cur = q.select("vec_id", "xi", F.expr(dist_to(seed.xi)).alias("dmin"))
    for s in range(1, _KC_PICKS + 1):
        far = (
            cur.orderBy(F.desc("dmin"), F.asc("vec_id")).limit(1).collect()[0]
        )
        picks.append((s, int(far.vec_id), int(far.dmin)))
        if s < _KC_PICKS:
            cur = cur.select(
                "vec_id",
                "xi",
                F.least(F.col("dmin"), F.expr(dist_to(far.xi))).alias("dmin"),
            )
    q.unpersist()
    return spark.createDataFrame(
        picks, schema="pick int, vec_id bigint, radius_sq bigint"
    )


# -------------------------------------------------------------- mrl_recall_eval

# Matryoshka truncation evaluation (Kusupati et al. 2022, "Matryoshka
# Representation Learning"): how much recall@5 survives when the ANN
# index stores only the first d dims of each embedding — the
# price/recall curve that decides the stored dimensionality (MRL's
# whole point is that prefixes are usable embeddings; whether THESE
# embeddings behave that way is an empirical readback). Ground truth
# is the full-dim ranking; candidates rank by the same rounded-cosine
# + id rule at each prefix. Brute force over the fixed 32-query panel
# (ann_topk's documented bound — production evaluates on a sample).
_MRL_DIMS = (16, 32, 64)
_MRL_Q_LO, _MRL_Q_HI = 100, 131
_MRL_K = 5


def _dot_spark_d(a: str, b: str, d: int) -> str:
    return (
        f"aggregate(zip_with(slice({a}, 1, {d}), slice({b}, 1, {d}),"
        " (x, y) -> cast(x as double) * cast(y as double)),"
        " 0D, (acc, v) -> acc + v)"
    )


def _cos_spark_d(a: str, b: str, d: int) -> str:
    return (
        f"{_dot_spark_d(a, b, d)} / (sqrt({_dot_spark_d(a, a, d)})"
        f" * sqrt({_dot_spark_d(b, b, d)}))"
    )


def _dot_duck_d(a: str, b: str, d: int) -> str:
    return (
        f"list_sum(list_transform(range(1, {d + 1}),"
        f" i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)))"
    )


def _cos_duck_d(a: str, b: str, d: int) -> str:
    return (
        f"{_dot_duck_d(a, b, d)} / (sqrt({_dot_duck_d(a, a, d)})"
        f" * sqrt({_dot_duck_d(b, b, d)}))"
    )


def _mrl_oracle() -> str:
    tops = []
    for d in _MRL_DIMS:
        tops.append(
            f"""top{d} AS MATERIALIZED (
  SELECT query_id, neighbor_id FROM (
    SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
           ROW_NUMBER() OVER (PARTITION BY q.vec_id
             ORDER BY ROUND({_cos_duck_d('q.embedding', 'e.embedding', d)}, 6)
               DESC, e.vec_id) AS rk
    FROM (SELECT vec_id, embedding FROM embeddings
          WHERE vec_id BETWEEN {_MRL_Q_LO} AND {_MRL_Q_HI}) q,
         embeddings e
    WHERE e.vec_id <> q.vec_id
  ) WHERE rk <= {_MRL_K}
)"""
        )
    unions = "\nUNION ALL\n".join(
        f"""SELECT CAST({d} AS INTEGER) AS dim,
       CAST(COUNT(DISTINCT t.query_id) AS BIGINT) AS n_queries,
       CAST(SUM(CASE WHEN g.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)
            AS BIGINT) AS n_overlap,
       CAST(SUM(CASE WHEN g.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)
            * 1000000 // COUNT(*) AS BIGINT) AS recall_ppm
FROM top{d} t LEFT JOIN top{_MRL_DIMS[-1]} g
  ON g.query_id = t.query_id AND g.neighbor_id = t.neighbor_id"""
        for d in _MRL_DIMS
    )
    return "WITH " + ",\n".join(tops) + "\n" + unions


@register("mrl_recall_eval", oracle=_mrl_oracle())
def mrl_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka dim-truncation recall curve (Kusupati et al. 2022):
    recall@{_MRL_K} of prefix-dim cosine ranking ({_MRL_DIMS}) against
    the full-dim ranking over the fixed query panel — the stored-
    dimensionality decision table for an MRL-style ANN index (store
    16 of 64 dims = 4× memory/bandwidth back IF the recall row holds).
    The full-dim row is the =1e6 sanity anchor.

    Scale shape: candidates = panel × corpus with the panel CLOSED
    OVER an Arrow kernel (bounded 32 vectors — this is the EVALUATION,
    run on a sample in production; the serving path stays ann_lsh/
    ivf_pq), so the corpus is scanned exactly once, with no join; all
    truncation ranks compute in one query-keyed exchange (three
    in-partition sorts), and the only materialized intermediate is the
    ≤ 3·{_MRL_K}·|panel|-row rank survivors — nothing corpus-sized is
    checkpointed (r16; closes the r15 spill-bomb caveat)."""
    import numpy as np
    import pandas as pd

    t = load_tables(spark, sf_dir)
    # The query panel is BOUNDED by construction (32 vec_ids); collect
    # it once and close over it, so the corpus is scanned exactly ONCE
    # with no join at all (guide §8 "broadcast the plan" — here the
    # plan is 32 vectors). The float32→float64 materialization is
    # exact, so the kernel sees the same doubles the JVM cast produces.
    panel = sorted(
        t.embeddings.filter(
            F.col("vec_id").between(_MRL_Q_LO, _MRL_Q_HI)
        )
        .select("vec_id", "embedding")
        .collect(),
        key=lambda r: r["vec_id"],
    )
    q_ids = np.array([r["vec_id"] for r in panel], dtype=np.int64)
    q_mat = np.array([r["embedding"] for r in panel], dtype=np.float64)
    dims = _MRL_DIMS
    # Per-query prefix norms, each via the same left-to-right fold.
    q_norm = {
        d: np.sqrt(_fold_dot_np(q_mat[:, :d], q_mat[:, :d])) for d in dims
    }

    def score(batches):
        """ONE corpus pass emitting every (corpus, panel) pair with all
        truncation cosines as columns. The fp64 arithmetic reproduces
        ``_cos_spark_d`` bit-for-bit: prefix products, left-to-right
        accumulation (``_fold_dot_np``), IEEE sqrt/multiply/divide —
        see _fold_dot_np's equality argument."""
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ids = pdf["neighbor_id"].to_numpy(dtype=np.int64)
            X = np.array(pdf["ne"].tolist(), dtype=np.float64)
            x_norm = {
                d: np.sqrt(_fold_dot_np(X[:, :d], X[:, :d])) for d in dims
            }
            out_q, out_n = [], []
            cos_cols: dict[int, list] = {d: [] for d in dims}
            for j in range(len(q_ids)):
                mask = ids != q_ids[j]
                if not mask.any():
                    continue
                Xm = X[mask]
                out_n.append(ids[mask])
                out_q.append(np.full(int(mask.sum()), q_ids[j]))
                for d in dims:
                    dots = _fold_dot_np(Xm[:, :d], q_mat[j, :d][None, :])
                    cos_cols[d].append(
                        dots / (q_norm[d][j] * x_norm[d][mask])
                    )
            if not out_q:
                continue
            yield pd.DataFrame(
                {
                    "query_id": np.concatenate(out_q),
                    "neighbor_id": np.concatenate(out_n),
                    **{
                        f"cos_{d}": np.concatenate(cos_cols[d])
                        for d in dims
                    },
                }
            )

    # The corpus reads as ONE file split at bench scale, which would
    # run the scoring kernel on a single task; spread it across the
    # executor cores first — at real scale the scan has >= cores
    # splits and the guard is a no-op (r15's split-starvation class).
    corpus_side = t.embeddings.select(
        F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("ne")
    )
    if corpus_side.rdd.getNumPartitions() < spark.sparkContext.defaultParallelism:
        corpus_side = corpus_side.repartition(
            spark.sparkContext.defaultParallelism
        )
    scored = corpus_side.mapInPandas(
        score,
        "query_id long, neighbor_id long, "
        + ", ".join(f"cos_{d} double" for d in dims),
    )
    # All three truncation ranks in ONE window pass over the pair
    # frame: same partitioning exchange (query_id), three in-partition
    # sorts — no per-dim corpus re-scan, no joins, and (unlike r15's
    # form) NO corpus-sized localCheckpoint: the only materialized
    # frame below is the rank-filtered survivors, ≤ 3·K·|panel| rows.
    # Rounding stays in Spark (the same Round expression as before),
    # so rank order is unchanged by construction.
    ranked = scored.select(
        "query_id",
        "neighbor_id",
        *[F.round(F.col(f"cos_{d}"), 6).alias(f"cos_r_{d}") for d in dims],
    )
    for d in dims:
        w = Window.partitionBy("query_id").orderBy(
            F.desc(f"cos_r_{d}"), F.asc("neighbor_id")
        )
        ranked = ranked.withColumn(f"rk_{d}", F.row_number().over(w))
    in_top = {d: F.col(f"rk_{d}") <= _MRL_K for d in dims}
    survivors = ranked.filter(
        in_top[dims[0]] | in_top[dims[1]] | in_top[dims[-1]]
    ).localCheckpoint(eager=True)
    # Recall rollup without joins: a pair is in top_d ∩ top_gt exactly
    # when both rank predicates hold on its single row (each (query,
    # neighbor) pair occurs once), which is what the old
    # tops[d] LEFT JOIN gt counted (gt keys are unique, so that join
    # was row-preserving).
    out = None
    for d in dims:
        row = (
            survivors.filter(in_top[d])
            .agg(
                F.countDistinct("query_id").cast("bigint").alias("n_queries"),
                F.sum(in_top[dims[-1]].cast("int"))
                .cast("bigint")
                .alias("n_overlap"),
                F.count(F.lit(1)).alias("total"),
            )
            .select(
                F.lit(d).cast("int").alias("dim"),
                "n_queries",
                "n_overlap",
                F.expr("n_overlap * 1000000 div total").alias("recall_ppm"),
            )
        )
        out = row if out is None else out.unionByName(row)
    return out


# -------------------------------------------------------- hard_negative_mining

_HNM_K = 5
_HNM_ORACLE = f"""
WITH q AS (
  SELECT vec_id AS query_id, embedding AS qe, label AS qlabel
  FROM embeddings WHERE vec_id < 8
),
c AS (
  SELECT query_id, e.vec_id AS neighbor_id, e.label AS neighbor_label,
         ROUND({_cos_duck('qe', 'e.embedding')}, 6) AS cos_r
  FROM q, embeddings e WHERE e.label <> q.qlabel
)
SELECT query_id, neighbor_id, neighbor_label,
       CAST(rk AS INTEGER) AS rank, cos_r
FROM (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY query_id ORDER BY cos_r DESC, neighbor_id
  ) AS rk FROM c
) WHERE rk <= {_HNM_K}
"""


@register("hard_negative_mining", oracle=_HNM_ORACLE)
def hard_negative_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative mining for contrastive / embedding-model training:
    for each anchor (the fixed query panel, vec_id < 8) the top-k
    highest-cosine corpus vectors with a DIFFERENT label — maximally
    confusable negatives, the sampler behind quality gains in dense
    retrievers (e.g. ANCE-style training). ann_topk's exact-cosine
    machinery with the label-exclusion predicate in the join.

    Scale shape: the anchor panel broadcasts onto one corpus scan (the
    label filter prunes in the join, before any shuffle); ranking is a
    query-keyed rank-limit window (WindowGroupLimit), so only ~k
    survivors per anchor leave each partition. Cosines are the
    sequential-fold doubles rounded to 6dp — rank order is
    engine-independent."""
    t = load_tables(spark, sf_dir)
    q = t.embeddings.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qe"),
        F.col("label").alias("qlabel"),
    )
    corpus = t.embeddings.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("ne"),
        F.col("label").alias("neighbor_label"),
    )
    scored = corpus.join(
        F.broadcast(q), F.col("neighbor_label") != F.col("qlabel")
    ).select(
        "query_id",
        "neighbor_id",
        "neighbor_label",
        F.round(cosine("qe", "ne"), 6).alias("cos_r"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_r").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= _HNM_K)
        .select("query_id", "neighbor_id", "neighbor_label", "rank", "cos_r")
    )


# ----------------------------------------------------------- moe_router_stats

# Fixed ±1 router projection, derived once from md5 on the driver and
# embedded as the SAME literal matrix in both engines — routing is then
# pure integer arithmetic (micro-unit quantized activations × sign
# weights), bit-identical everywhere.
_MOE_E = 8
_MOE_SCALE = 1_000_000


def _moe_signs() -> list[list[int]]:
    return [
        [
            1
            if int(hashlib.md5(f"moe:{e}:{i}".encode()).hexdigest()[:2], 16) % 2
            == 0
            else -1
            for i in range(_DIM)
        ]
        for e in range(_MOE_E)
    ]


def _moe_oracle() -> str:
    signs = _moe_signs()
    score = lambda e: (
        "list_sum(list_transform(range(1, 65), i -> q[i] * "
        f"[{','.join(str(s) for s in signs[e])}][i]))"
    )
    pairs = ", ".join(
        f"{{ns: -({score(e)}), e: {e}}}" for e in range(_MOE_E)
    )
    return f"""
WITH quant AS (
  SELECT vec_id,
         list_transform(embedding,
           x -> CAST(floor(CAST(x AS DOUBLE) * {_MOE_SCALE}) AS BIGINT)) AS q
  FROM embeddings
),
routed AS (
  SELECT vec_id, list_sort([{pairs}]) AS srt FROM quant
),
tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM routed),
slots AS (
  SELECT srt[1].e AS expert, 1 AS is1 FROM routed
  UNION ALL
  SELECT srt[2].e AS expert, 0 AS is1 FROM routed
)
SELECT CAST(expert AS INTEGER) AS expert,
       CAST(SUM(is1) AS BIGINT) AS n_top1,
       CAST(SUM(1 - is1) AS BIGINT) AS n_top2,
       CAST(COUNT(*) AS BIGINT) AS n_routed,
       CAST(COUNT(*) * 1000 // (2 * ANY_VALUE(tot.n)) AS BIGINT)
         AS load_permille
FROM slots CROSS JOIN tot
GROUP BY expert
"""


@register("moe_router_stats", oracle=_moe_oracle())
def moe_router_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixture-of-experts router load audit: top-2-of-8 expert
    assignment per token embedding under a fixed ±1 projection router,
    reporting per-expert top-1/top-2 counts and load permille — the
    balance diagnostic (dropped-token / capacity-factor planning
    signal) an MoE training pipeline watches per batch. Activations
    quantize to integer micro-units (floor(x·1e6) — the same IEEE
    double op in both engines), the router is a literal sign matrix,
    so expert scores are exact bigints and the top-2 argsort
    (lexicographic struct sort on (−score, expert)) is deterministic
    with ties to the lower expert id.

    Scale shape: routing is a single scan projection (zip_with +
    aggregate over the 64-dim array, JVM-side — no Python); the two
    assignment slots explode to (expert, slot) pairs and partial-agg
    to the 8-expert grid, so the ONLY exchange carries ≤ 2 rows per
    input row pre-combine, 8 rows post. The token total is a
    re-aggregation of the GRID (Σ n_top1 — not a second corpus scan;
    plan-pinned to one FileScan) broadcast back for the permille —
    at 100 TB this is scan-bound with a constant-size shuffle."""
    signs = _moe_signs()
    t = load_tables(spark, sf_dir)
    quant = t.embeddings.select(
        "vec_id",
        F.expr(
            f"transform(embedding, x -> cast(floor(cast(x as double) * {_MOE_SCALE}) as bigint))"
        ).alias("q"),
    )
    score = lambda e: (
        f"aggregate(zip_with(q, array({','.join(str(s) + 'L' for s in signs[e])}), "
        "(x, y) -> x * y), 0L, (acc, v) -> acc + v)"
    )
    pairs = ", ".join(
        f"struct(-({score(e)}) as ns, {e} as e)" for e in range(_MOE_E)
    )
    routed = quant.selectExpr("vec_id", f"array_sort(array({pairs})) as srt")
    slots = routed.selectExpr(
        "explode(array(struct(srt[0].e as expert, 1 as is1),"
        " struct(srt[1].e as expert, 0 as is1))) as s"
    ).select("s.expert", "s.is1")
    grid = slots.groupBy("expert").agg(
        F.sum("is1").cast("bigint").alias("n_top1"),
        F.sum(F.lit(1) - F.col("is1")).cast("bigint").alias("n_top2"),
        F.count(F.lit(1)).cast("bigint").alias("n_routed"),
    )
    tot = grid.agg(F.sum("n_top1").cast("bigint").alias("n"))
    return grid.crossJoin(F.broadcast(tot)).select(
        F.col("expert").cast("int").alias("expert"),
        "n_top1",
        "n_top2",
        "n_routed",
        F.expr("n_routed * 1000 div (2 * n)")
        .cast("bigint")
        .alias("load_permille"),
    )
