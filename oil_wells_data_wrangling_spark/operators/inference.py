"""Batched model-inference scaffold (SURVEY.md §2.C).

The quality-classifier pass of a training-data pipeline (fastText /
linear-probe style) runs as BATCHED inference over document features:
featurize in the scan, ship Arrow batches to a worker-side model,
emit scores, filter. This module is that plumbing with a
DETERMINISTIC stub model — integer weights over integer features, so
the score is bit-exact cross-engine and the whole path (feature
extraction → Arrow batch → vectorized model → threshold) is testable
against a DuckDB oracle. Swapping the stub for a real ONNX/linear
model changes ONE function (the weights), none of the Spark plumbing
— which is the part this engine owns.

Reference parity: the reference scores rows one at a time in Python
(pdf_extraction.py's per-row validators); here scoring is vectorized
per Arrow batch and distributed per partition.
"""

from __future__ import annotations

import json
from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window
from pyspark.sql.types import (
    BooleanType,
    DoubleType,
    LongType,
    StructField,
    StructType,
)

from oil_wells_data_wrangling_spark.plans.registry import register
from oil_wells_data_wrangling_spark.sources.readers import load_tables

# Stub linear model: integer weights over integer permille features.
# score = w0 + w1·distinct_permille + w2·stop_permille + w3·min(n_words, 100)
# A real classifier drops in by replacing _MODEL_W and _score_batch's
# dot product with a loaded model's predict — the plumbing is identical.
_MODEL_W = (-300, 2, 5, 3)
_SCORE_CUTOFF = 1000

_STOP = ("the", "a", "of", "and", "to", "in", "is", "for")
_STOP_SPARK = "array(" + ", ".join(f"'{w}'" for w in _STOP) + ")"
_STOP_DUCK = "[" + ", ".join(f"'{w}'" for w in _STOP) + "]"

_OUT_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("score", LongType()),
        StructField("kept", BooleanType()),
    ]
)


def load_weights(path: str) -> tuple[int, int, int, int]:
    """Load linear-model weights from a JSON artifact: [w0, w1, w2, w3]
    integers. This is the production weight-delivery path — train
    offline, ship the artifact with the job, load once on the driver;
    the tuple rides to executors inside the mapInPandas closure (tiny —
    for megabyte-scale models use SparkContext.broadcast the same way)."""
    with open(path) as f:
        w = json.load(f)
    if len(w) != 4 or not all(isinstance(x, int) for x in w):
        raise ValueError(f"weights must be 4 ints, got {w!r}")
    return tuple(w)


def make_scorer(weights: tuple[int, int, int, int], cutoff: int):
    """Bind weights into the Arrow-batch scoring function. The returned
    function is what mapInPandas ships to executors — swapping stub
    weights for a trained artifact changes nothing else."""

    def _score_batch(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        w0, w1, w2, w3 = weights
        for pdf in it:
            score = (
                w0
                + w1 * pdf["distinct_permille"].astype("int64")
                + w2 * pdf["stop_permille"].astype("int64")
                + w3 * pdf["n_words"].astype("int64").clip(upper=100)
            )
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "score": score,
                    "kept": score >= cutoff,
                }
            )

    return _score_batch


def featurize(documents: DataFrame) -> DataFrame:
    """Scan-stage featurization: three int64 permille features per doc
    — shared by the registered query and any externally-weighted run."""
    words = F.split("text", " ")
    return documents.select(
        "doc_id",
        F.size(words).cast("bigint").alias("n_words"),
        F.expr(
            "size(array_distinct(split(text, ' '))) * 1000L"
            " div size(split(text, ' '))"
        ).alias("distinct_permille"),
        F.expr(
            f"size(filter(split(text, ' '), w -> array_contains({_STOP_SPARK}, w)))"
            " * 1000L div size(split(text, ' '))"
        ).alias("stop_permille"),
    )


def score_documents(
    documents: DataFrame,
    weights: tuple[int, int, int, int] = _MODEL_W,
    cutoff: int = _SCORE_CUTOFF,
) -> DataFrame:
    """Featurize + batched inference with the given weights — the
    public API; ``model_score`` is this with the stub weights."""
    return featurize(documents).mapInPandas(
        make_scorer(weights, cutoff), schema=_OUT_SCHEMA
    )


_MODEL_SCORE_ORACLE = f"""
WITH feat AS (
  SELECT doc_id,
         len(string_split(text, ' ')) AS n_words,
         len(list_distinct(string_split(text, ' '))) * 1000
           // len(string_split(text, ' ')) AS distinct_permille,
         len(list_filter(string_split(text, ' '),
                         w -> list_contains({_STOP_DUCK}, w))) * 1000
           // len(string_split(text, ' ')) AS stop_permille
  FROM documents
),
scored AS (
  SELECT doc_id,
         {_MODEL_W[0]} + {_MODEL_W[1]} * CAST(distinct_permille AS BIGINT)
           + {_MODEL_W[2]} * CAST(stop_permille AS BIGINT)
           + {_MODEL_W[3]} * LEAST(n_words, 100) AS score
  FROM feat
)
SELECT doc_id, CAST(score AS BIGINT) AS score,
       score >= {_SCORE_CUTOFF} AS kept
FROM scored
"""


@register("model_score", oracle=_MODEL_SCORE_ORACLE)
def model_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batched-inference quality scoring: featurize documents in the
    scan stage (integer permille features — JVM-side column
    expressions), then run the model worker-side over Arrow batches
    with ``mapInPandas`` and threshold into a keep decision. This is
    the classifier-filter scaffold (fastText-quality / linear-probe
    pass) with a deterministic integer stub standing in for the model
    so the WHOLE path has an exact oracle; the model function is the
    single swap point for real weights.

    Scale shape: features reduce each document to three int64s BEFORE
    the Python exchange, so the Arrow transfer carries ~32 bytes/doc,
    not text; the model is embarrassingly parallel per partition (no
    shuffle anywhere — output partitioning is inherited from the
    scan). Batch size follows
    spark.sql.execution.arrow.maxRecordsPerBatch (10k default): model
    dispatch amortizes over the batch, the win that makes Pandas UDFs
    10-100× row-at-a-time Python. At 100 TB this is a map-only pass —
    executors scale it linearly, and a GPU model slots in by raising
    the batch size and pinning one model instance per worker."""
    t = load_tables(spark, sf_dir)
    return score_documents(t.documents)


# --------------------------------------------------- real-model artifact path
#
# The stub above exists so the WHOLE path has a bit-exact oracle. The
# production swap point is here: a trained artifact loaded from disk
# and run vectorized over the same Arrow batches. Two gates:
#   - .npz (numpy linear / MLP weights): always available — numpy is a
#     hard dependency — so the real-artifact path is TESTED, not just
#     plumbed (tests/test_inference_real.py runs it distributed).
#   - .onnx via onnxruntime: import-gated like pdfplumber/OCR in
#     sources/pdf_source.py — absent runtime raises a clear error at
#     LOAD time on the driver, never inside an executor task.

_FLOAT_OUT_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("score", DoubleType()),
        StructField("kept", BooleanType()),
    ]
)

_FEATURES = ("n_words", "distinct_permille", "stop_permille")


class NumpyLinearModel:
    """w·x + b over the float feature matrix — the shape a fastText /
    logistic quality probe exports. Weights ride to executors in the
    mapInPandas closure (fine at this size; broadcast for MB-scale)."""

    def __init__(self, w: np.ndarray, b: float) -> None:
        self.w = np.asarray(w, dtype=np.float64).reshape(-1)
        if self.w.shape[0] != len(_FEATURES):
            raise ValueError(f"expected {len(_FEATURES)} weights, got {self.w.shape}")
        self.b = float(b)

    def predict(self, x: np.ndarray) -> np.ndarray:
        return x @ self.w + self.b


class NumpyMLPModel:
    """Two-layer ReLU MLP: relu(x@W1 + b1)@W2 + b2 — the smallest
    genuinely non-linear classifier head, exercising a real hidden
    layer through the identical Spark plumbing as the stub."""

    def __init__(
        self, w1: np.ndarray, b1: np.ndarray, w2: np.ndarray, b2: np.ndarray
    ) -> None:
        self.w1 = np.asarray(w1, dtype=np.float64)
        self.b1 = np.asarray(b1, dtype=np.float64)
        self.w2 = np.asarray(w2, dtype=np.float64).reshape(-1)
        self.b2 = float(np.asarray(b2).reshape(()))
        if self.w1.shape[0] != len(_FEATURES):
            raise ValueError(f"W1 must be ({len(_FEATURES)}, h), got {self.w1.shape}")

    def predict(self, x: np.ndarray) -> np.ndarray:
        h = np.maximum(x @ self.w1 + self.b1, 0.0)
        return h @ self.w2 + self.b2


class OnnxModel:
    """onnxruntime-backed scorer. The session is created lazily PER
    EXECUTOR PROCESS (first batch) and cached on the instance — ORT
    sessions don't pickle, so what crosses the closure boundary is the
    model path + input/output names only. Requires onnxruntime at
    score time; ``load_model`` refuses the artifact up front on hosts
    without it so the failure is a driver-side ImportError, not a
    mid-job executor stack trace."""

    def __init__(self, path: str, input_name: str | None = None) -> None:
        try:
            import onnxruntime  # noqa: F401
        except ImportError as e:
            raise ImportError(
                "onnxruntime is required for .onnx artifacts; "
                "install it or export the model to .npz"
            ) from e
        self.path = path
        self.input_name = input_name
        self._session = None

    def __getstate__(self):
        d = dict(self.__dict__)
        d["_session"] = None
        return d

    def predict(self, x: np.ndarray) -> np.ndarray:
        if self._session is None:
            import onnxruntime as ort

            self._session = ort.InferenceSession(
                self.path, providers=["CPUExecutionProvider"]
            )
            if self.input_name is None:
                self.input_name = self._session.get_inputs()[0].name
        out = self._session.run(None, {self.input_name: x.astype(np.float32)})
        return np.asarray(out[0], dtype=np.float64).reshape(len(x))


def load_model(path: str):
    """Load a scoring model artifact by extension:

    - ``.json`` — the integer stub's 4-weight format (`load_weights`);
    - ``.npz`` — numpy arrays: ``w``+``b`` (linear) or
      ``w1``/``b1``/``w2``/``b2`` (2-layer ReLU MLP);
    - ``.onnx`` — onnxruntime session (import-gated).

    Returns an object with ``predict(x: (n,3) float64) -> (n,) float64``
    for the float formats, or the weight tuple for ``.json``.
    """
    if path.endswith(".json"):
        return load_weights(path)
    if path.endswith(".npz"):
        with np.load(path) as z:
            if "w1" in z:
                return NumpyMLPModel(z["w1"], z["b1"], z["w2"], z["b2"])
            return NumpyLinearModel(z["w"], z["b"])
    if path.endswith(".onnx"):
        return OnnxModel(path)
    raise ValueError(f"unsupported model artifact: {path!r}")


def make_model_scorer(
    model, cutoff: float
) -> Callable[[Iterator[pd.DataFrame]], Iterator[pd.DataFrame]]:
    """Bind a real (float) model into the Arrow-batch scoring function —
    the float twin of ``make_scorer``; same batch shape, same
    amortization, model dispatch is one vectorized call per batch."""

    def _score_batch(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            x = np.column_stack(
                [pdf[c].to_numpy(dtype=np.float64) for c in _FEATURES]
            )
            score = model.predict(x)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "score": score,
                    "kept": score >= cutoff,
                }
            )

    return _score_batch


def score_documents_with_model(
    documents: DataFrame, model, cutoff: float
) -> DataFrame:
    """Featurize + batched inference with a LOADED artifact (npz/onnx):
    the production entry point. Identical plan shape to the stub path —
    map-only, 3 int64 features per doc across the Arrow boundary."""
    return featurize(documents).mapInPandas(
        make_model_scorer(model, cutoff), schema=_FLOAT_OUT_SCHEMA
    )


# ----------------------------------------------------------- score_calibration

_CALIB_BIN = 200  # score units per calibration bucket

_CALIB_ORACLE = f"""
WITH feat AS (
  SELECT doc_id,
         len(string_split(text, ' ')) AS n_words,
         len(list_distinct(string_split(text, ' '))) * 1000
           // len(string_split(text, ' ')) AS distinct_permille,
         len(list_filter(string_split(text, ' '),
                         w -> list_contains({_STOP_DUCK}, w))) * 1000
           // len(string_split(text, ' ')) AS stop_permille
  FROM documents
),
scored AS (
  SELECT {_MODEL_W[0]} + {_MODEL_W[1]} * CAST(distinct_permille AS BIGINT)
           + {_MODEL_W[2]} * CAST(stop_permille AS BIGINT)
           + {_MODEL_W[3]} * LEAST(n_words, 100) AS score,
         CASE WHEN stop_permille > 50 THEN 1 ELSE 0 END AS is_pos
  FROM feat
),
b AS (
  SELECT (score - ((score % {_CALIB_BIN}) + {_CALIB_BIN}) % {_CALIB_BIN})
           // {_CALIB_BIN} AS bucket,
         is_pos
  FROM scored
)
SELECT CAST(bucket AS BIGINT) AS bucket,
       CAST(bucket * {_CALIB_BIN} AS BIGINT) AS score_lo,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(is_pos) AS BIGINT) AS n_pos,
       CAST(SUM(is_pos) * 1000000 // COUNT(*) AS BIGINT) AS pos_ppm
FROM b
GROUP BY bucket
"""


@register("score_calibration", oracle=_CALIB_ORACLE)
def score_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classifier calibration / reliability curve: bucket the model's
    scores into fixed-width bins and measure, per bin, how often the
    reference label holds — here ``lang_id``'s English prediction
    (stop ratio > 5%), the weak-supervision label a pipeline actually
    has at corpus scale (a fastText-style tagger's output), which the
    stub's stopword feature predicts while its other two features add
    independent noise. This is the audit run before choosing a filter
    threshold: a rising pos_ppm-vs-bucket curve says the score ranks;
    the bin rates say what a given cutoff actually keeps.

    Scale shape: scoring is the same map-only Arrow path as
    ``model_score`` (3 int64 features per doc cross the Python
    boundary, never text); the label is one more scan-stage integer
    expression co-reads with the features (no second pass over text);
    bucketing is an integer EXPLICIT-floor division (pmod-subtract,
    sign-safe on both engines — scores go negative by construction);
    the single exchange carries (bucket, two int64 partials) with
    map-side combine, output bounded by the score range / bin width."""
    t = load_tables(spark, sf_dir)
    feats = featurize(t.documents)
    scored = feats.mapInPandas(
        make_scorer(_MODEL_W, _SCORE_CUTOFF), schema=_OUT_SCHEMA
    )
    labels = feats.select(
        "doc_id", (F.col("stop_permille") > 50).cast("bigint").alias("is_pos")
    )
    bucket = F.expr(
        f"(score - pmod(score, {_CALIB_BIN})) div {_CALIB_BIN}"
    ).cast("bigint")
    return (
        scored.join(labels, "doc_id")
        .select(bucket.alias("bucket"), "is_pos")
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("is_pos").cast("bigint").alias("n_pos"),
            F.expr("sum(is_pos) * 1000000 div count(1)")
            .cast("bigint")
            .alias("pos_ppm"),
        )
        .select(
            "bucket",
            (F.col("bucket") * _CALIB_BIN).cast("bigint").alias("score_lo"),
            "n_docs",
            "n_pos",
            "pos_ppm",
        )
    )


# ------------------------------------------------------------- grpo_advantage

# Group size: responses to one "prompt" — documents bucketed by
# doc_id % _GRPO_GROUPS stand in for the G sampled completions per
# prompt of an RLVR rollout batch.
_GRPO_GROUPS = 64

_GRPO_REWARD_SQL_DUCK = f"""
  {_MODEL_W[0]} + {_MODEL_W[1]} * (len(list_distinct(string_split(text, ' ')))
      * 1000 // len(string_split(text, ' ')))
    + {_MODEL_W[2]} * (len(list_filter(string_split(text, ' '),
        w -> list_contains({_STOP_DUCK}, w))) * 1000
      // len(string_split(text, ' ')))
    + {_MODEL_W[3]} * LEAST(len(string_split(text, ' ')), 100)
"""

_GRPO_ORACLE = f"""
WITH r AS (
  SELECT doc_id, doc_id % {_GRPO_GROUPS} AS prompt_id,
         CAST({_GRPO_REWARD_SQL_DUCK} AS BIGINT) AS reward
  FROM documents
),
g AS (
  SELECT prompt_id, CAST(COUNT(*) AS BIGINT) AS n_group,
         CAST(SUM(reward) AS BIGINT) AS s,
         CAST(SUM(reward * reward) AS BIGINT) AS ss
  FROM r GROUP BY prompt_id
),
rk AS (
  SELECT r.*, row_number()
           OVER (PARTITION BY prompt_id ORDER BY reward DESC, doc_id) AS rk
  FROM r
)
SELECT rk.doc_id, rk.prompt_id, rk.reward, g.n_group,
       g.n_group * rk.reward - g.s AS adv_num,
       g.n_group * g.ss - g.s * g.s AS var_num,
       (rk.rk - 1) * 1000 // GREATEST(g.n_group - 1, 1) AS pct_rank_permille
FROM rk JOIN g USING (prompt_id)
"""


@register("grpo_advantage", oracle=_GRPO_ORACLE)
def grpo_advantage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group-relative advantage computation — the reward-normalisation
    stage of a GRPO/RLOO post-training loop: per prompt group of G
    sampled responses, center each reward against the group mean (the
    baseline that replaces a learned critic). Documents bucketed by
    ``doc_id % 64`` stand in for rollout groups; the reward is the
    stub quality model's integer score (same features as
    ``model_score`` — the swap point for a real reward model is the
    same one function).

    Exactness: the mean-centered advantage is carried as the integer
    numerator ``n·r − Σr`` (= n × (r − mean)) and the group variance
    as ``n·Σr² − (Σr)²`` (= n² × σ²) — downstream whitening divides
    once, at full precision, instead of this stage rounding. This is
    the Dr. GRPO form (difference only, no σ division baked in), with
    the σ numerator alongside for the classic scaling; the in-group
    percentile rank is the exact integer permille. Everything bigint,
    bit-identical across engines.

    Scale shape: ONE scan, ONE shuffle. The group sums/count ride the
    SAME prompt-keyed exchange as the rank window (whole-partition
    window aggregates, not a separate groupBy + join — plan-pinned:
    one Exchange, one FileScan), so rollout batches of any size
    stream through with group state of 3 bigints per prompt,
    independent of G. At 100 TB of rollouts this is the
    single-exchange shape; no driver collection anywhere."""
    t = load_tables(spark, sf_dir)
    r = featurize(t.documents).select(
        "doc_id",
        (F.col("doc_id") % _GRPO_GROUPS).alias("prompt_id"),
        (
            F.lit(_MODEL_W[0])
            + F.lit(_MODEL_W[1]) * F.col("distinct_permille")
            + F.lit(_MODEL_W[2]) * F.col("stop_permille")
            + F.lit(_MODEL_W[3]) * F.least(F.col("n_words"), F.lit(100))
        )
        .cast("bigint")
        .alias("reward"),
    )
    grp = Window.partitionBy("prompt_id")
    wrk = grp.orderBy(F.col("reward").desc(), "doc_id")
    rk = r.select(
        "doc_id",
        "prompt_id",
        "reward",
        F.count(F.lit(1)).over(grp).cast("bigint").alias("n_group"),
        F.sum("reward").over(grp).cast("bigint").alias("s"),
        F.sum(F.col("reward") * F.col("reward"))
        .over(grp)
        .cast("bigint")
        .alias("ss"),
        F.row_number().over(wrk).alias("rk"),
    )
    return rk.select(
        "doc_id",
        "prompt_id",
        "reward",
        "n_group",
        (F.col("n_group") * F.col("reward") - F.col("s")).alias("adv_num"),
        (F.col("n_group") * F.col("ss") - F.col("s") * F.col("s")).alias(
            "var_num"
        ),
        F.expr("(rk - 1) * 1000 div greatest(n_group - 1, 1)").alias(
            "pct_rank_permille"
        ),
    )


# ------------------------------------------------------------ trace_tool_calls
#
# Pre-staged in r12, ACTIVATED (registered) in r13 — parity test in
# tests/test_prestaged_r13.py + BASELINE scale row.

_TRACE_TOOLS = ("search", "calc")  # the pipeline's allowed tool set

# the synthetic trace: a tool-call JSON per document, built with the
# same string concat in both engines; every 7th trace is truncated
# mid-string (the malformed-generation case), every 11th calls a tool
# outside the allowed set (the hallucinated-tool case)
_TRACE_SPARK = (
    "concat('{\"name\":\"', "
    "CASE WHEN doc_id % 11 = 0 THEN 'fetch_url' "
    "WHEN doc_id % 3 = 0 THEN 'search' ELSE 'calc' END, "
    "'\",\"arguments\":{\"k\":', CAST(doc_id % 5 AS STRING), "
    "',\"q\":\"', lang, '\"}}')"
)
_TRACE_DUCK = (
    "('{\"name\":\"' || "
    "CASE WHEN doc_id % 11 = 0 THEN 'fetch_url' "
    "WHEN doc_id % 3 = 0 THEN 'search' ELSE 'calc' END || "
    "'\",\"arguments\":{\"k\":' || CAST(doc_id % 5 AS VARCHAR) || "
    "',\"q\":\"' || lang || '\"}}')"
)

TRACE_TOOL_CALLS_ORACLE = f"""
WITH raw AS (
  SELECT doc_id, source,
         CASE WHEN doc_id % 7 = 0
              THEN substr({_TRACE_DUCK}, 1, length({_TRACE_DUCK}) - 5)
              ELSE {_TRACE_DUCK} END AS trace
  FROM documents
),
p AS (
  SELECT source,
         json_valid(trace) AS ok,
         CASE WHEN json_valid(trace)
              THEN json_extract_string(trace, '$.name') END AS tool,
         CASE WHEN json_valid(trace)
              THEN CAST(json_extract(trace, '$.arguments.k') AS BIGINT)
              END AS k
  FROM raw
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_traces,
       CAST(COUNT(*) FILTER (ok AND tool IN ('search', 'calc'))
            AS BIGINT) AS n_valid,
       CAST(COUNT(*) FILTER (NOT ok) AS BIGINT) AS n_bad_json,
       CAST(COUNT(*) FILTER (ok AND tool NOT IN ('search', 'calc'))
            AS BIGINT) AS n_unknown_tool,
       CAST(COALESCE(SUM(CASE WHEN ok AND tool IN ('search', 'calc')
                              THEN k END), 0) AS BIGINT) AS k_sum
FROM p GROUP BY source
"""


@register("trace_tool_calls", oracle=TRACE_TOOL_CALLS_ORACLE)
def trace_tool_calls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Agentic-trace audit — the validation pass an SFT/RL pipeline
    runs over model-generated TOOL-CALL transcripts before training on
    them: parse each trace's JSON, split the corpus into valid calls /
    malformed JSON (truncated generations) / hallucinated tools (names
    outside the registry), and roll the counts up per source with an
    argument-mass check (k_sum) that proves arguments were actually
    extracted, not just schema-validated.

    Parsing parity is the interesting contract: Spark's ``from_json``
    (PERMISSIVE mode -> NULL struct on malformed input) and DuckDB's
    ``json_valid``/``json_extract`` must agree on every trace — the
    deterministic corruption (every 7th trace truncated mid-string,
    every 11th calling an unregistered tool) makes both failure
    modes load-bearing in the oracle comparison.

    Scale shape: trace synthesis, JSON parse, and classification all
    run inside the scan projection (one ``from_json`` per row, no
    Python); the only exchange is the |sources|-group partial agg —
    flat at any corpus size."""
    t = load_tables(spark, sf_dir)
    trace = F.when(
        F.col("doc_id") % 7 == 0,
        F.expr(
            f"substr({_TRACE_SPARK}, 1, length({_TRACE_SPARK}) - 5)"
        ),
    ).otherwise(F.expr(_TRACE_SPARK))
    # PERMISSIVE from_json returns a NON-null struct of null fields on
    # malformed input (test-probed), so "did it parse" needs the
    # corrupt-record column, not isNotNull on the struct
    parsed = F.from_json(
        trace,
        "name string, arguments struct<k: bigint, q: string>,"
        " _corrupt string",
        {"columnNameOfCorruptRecord": "_corrupt"},
    )
    ok = parsed["_corrupt"].isNull()
    tool = parsed["name"]
    known = tool.isin(*_TRACE_TOOLS)
    k = parsed["arguments"]["k"]
    return (
        t.documents.select(
            "source",
            ok.alias("ok"),
            F.when(ok, tool).alias("tool"),
            F.when(ok, known).alias("known"),
            F.when(ok, k).alias("k"),
        )
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_traces"),
            F.count_if(F.col("ok") & F.col("known")).alias("n_valid"),
            F.count_if(~F.col("ok")).alias("n_bad_json"),
            F.count_if(F.col("ok") & ~F.col("known")).alias(
                "n_unknown_tool"
            ),
            F.coalesce(
                F.sum(F.when(F.col("ok") & F.col("known"), F.col("k"))),
                F.lit(0),
            )
            .cast("bigint")
            .alias("k_sum"),
        )
    )


# ------------------------------------------------------------ specdecode_accept
#
# Pre-staged in r12, ACTIVATED (registered) in r13 (impl + parity test
# in tests/test_prestaged_r13.py + BASELINE scale row). Checked against
# the registry before building: nothing covers inference-log
# acceptance analytics (the grpo/model_score family scores documents,
# not draft/target token streams).

_SPEC_GAMMA = 4  # draft block length (tokens proposed per target step)

# Draft/target disagreement is CONTENT-derived: the draft model is
# "wrong" at positions where md5(word, doc_id) % 5 == 0 (~20%) — so
# the acceptance math has to touch every token, not replay doc_id
# arithmetic.
_SPEC_MM_S = (
    "cast(conv(substr(md5(concat(w, '_', cast(doc_id as string))), 1, 4),"
    " 16, 10) as bigint) % 5 = 0"
)
_SPEC_MM_D = (
    "CAST('0x' || substr(md5(w || '_' || CAST(doc_id AS VARCHAR)), 1, 4)"
    " AS BIGINT) % 5 = 0"
)

SPECDECODE_ORACLE = f"""
WITH tok AS (
  SELECT doc_id, source,
         unnest(string_split(text, ' ')) AS w,
         generate_subscripts(string_split(text, ' '), 1) - 1 AS pos
  FROM documents
),
flags AS (
  SELECT doc_id, source,
         CAST(pos // {_SPEC_GAMMA} AS BIGINT) AS block,
         CAST(pos % {_SPEC_GAMMA} AS BIGINT) AS ppos,
         ({_SPEC_MM_D}) AS mm
  FROM tok
),
blocks AS (
  SELECT doc_id, source, block,
         CAST(COUNT(*) AS BIGINT) AS n_in_block,
         CAST(LEAST(
           COALESCE(MIN(CASE WHEN mm THEN ppos END), {_SPEC_GAMMA}),
           COUNT(*)
         ) AS BIGINT) AS n_accepted
  FROM flags GROUP BY doc_id, source, block
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_blocks,
       CAST(SUM(n_in_block) AS BIGINT) AS n_draft_tokens,
       CAST(SUM(n_accepted) AS BIGINT) AS n_accepted,
       CAST(SUM(n_accepted) * 1000 // SUM(n_in_block) AS BIGINT)
         AS accept_permille
FROM blocks GROUP BY source
"""


@register("specdecode_accept", oracle=SPECDECODE_ORACLE)
def specdecode_accept(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Speculative-decoding acceptance analytics — the measurement an
    inference-data team runs over logged (draft, target) token streams
    to size the draft model and the block length γ: within each
    γ-token draft block, the target accepts the longest agreeing
    PREFIX (the first mismatch rejects the rest of the block), so the
    per-source acceptance rate is what the expected speedup formula
    eats. Draft/target disagreement here is content-derived per token
    (an md5 over the word and doc — the deterministic stand-in for a
    real draft model's logged mismatches), which forces the acceptance
    math through every token rather than replaying id arithmetic.

    Scale shape: tokenize + position/block/flag arithmetic run inside
    the scan (posexplode emits (doc_id, source, block, ppos, mm)
    scalars — text never leaves the scan); the per-block prefix-match
    is a (doc, block)-keyed partial agg and the per-source rollup is
    |sources| groups. One exchange of scalar rows, integer permille —
    exact in both engines."""
    t = load_tables(spark, sf_dir)
    tok = t.documents.select(
        "doc_id",
        "source",
        F.posexplode(F.split("text", " ")).alias("pos", "w"),
    )
    flags = tok.select(
        "doc_id",
        "source",
        (F.col("pos") / _SPEC_GAMMA).cast("bigint").alias("block"),
        (F.col("pos") % _SPEC_GAMMA).cast("bigint").alias("ppos"),
        F.expr(_SPEC_MM_S).alias("mm"),
    )
    blocks = flags.groupBy("doc_id", "source", "block").agg(
        F.count(F.lit(1)).alias("n_in_block"),
        F.least(
            F.coalesce(
                F.min(F.when(F.col("mm"), F.col("ppos"))),
                F.lit(_SPEC_GAMMA),
            ),
            F.count(F.lit(1)),
        )
        .cast("bigint")
        .alias("n_accepted"),
    )
    return blocks.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_blocks"),
        F.sum("n_in_block").cast("bigint").alias("n_draft_tokens"),
        F.sum("n_accepted").cast("bigint").alias("n_accepted"),
        F.expr("CAST(sum(n_accepted) * 1000 DIV sum(n_in_block) AS BIGINT)")
        .alias("accept_permille"),
    )


# ---------------------------------------------------------- kv_prefix_sharing

# Radix/prefix-cache sizing analytics (the vLLM automatic-prefix-
# caching / SGLang RadixAttention capacity question): over a request
# log, how many prompt tokens are SHARED along the prefix tree within
# the first _KVP_CAP tokens (the cache's depth budget)? Two equivalent
# identities exist: (a) sorted-neighbor — trie nodes =
# sum(len_i - lcp(sorted predecessor)) — which needs a per-source
# GLOBAL sort (parallelism bounded by |sources|: a scale-killer when
# a few sources dominate); (b) level-sum — trie nodes =
# sum over depth d of |distinct depth-d prefixes|, and
# max_lcp = deepest node shared by >= 2 requests. The engine uses (b):
# a pure partial-agg shape with no sort and no window, fully parallel
# at any source skew; the exchange carries (source, d, md5(prefix))
# scalars — <= CAP rows of 16-byte hashes per request, the honest
# trade for killing the serial sort. THREE prefix identities were
# measured at 1x/10x/100x (min-of-2, noop sink): sorted-window
# 0.85/0.93/3.04s (fastest wall-clock but parallelism = |sources| —
# dies on a few-source 100 TB log), per-prefix md5 1.62/7.36/19.2s,
# and a rolling polynomial hash pair 2.29/10.7/28.0s (the O(d)
# aggregate() lambdas are INTERPRETED per element — the SCALE.md §7
# codegen lesson — so "cheap int ops" lose to codegen'd md5). The
# registered form is the per-prefix md5 level-sum: scale-safe and the
# fastest of the scale-safe forms; md5 prefix identity is the
# engine's standard collision assumption, and the trie-identity test
# pins the output against a driver-built ACTUAL prefix tree. Outputs
# are provably identical across all three forms (verified at two SFs
# each).
_KVP_CAP = 48  # cache depth budget (tokens considered for sharing)


def _kvp_requests_expr() -> str:
    """Prompt head (<= _KVP_CAP words) per request: a per-source system
    preamble + the first (10 + doc_id % 30) words of the doc — the
    shared-system-prompt-plus-user-payload shape of production request
    logs, synthesized deterministically from documents."""
    sys_words = (
        "concat(array('system', 'you', 'are', 'a', 'helpful', 'assistant',"
        " 'for'), array(source), array('documents', 'answer', 'briefly'))"
    )
    user = "slice(split(text, ' '), 1, 10 + cast(doc_id % 30 as int))"
    return f"slice(concat({sys_words}, {user}), 1, {_KVP_CAP})"


KV_PREFIX_SHARING_ORACLE = f"""
WITH req AS (
  SELECT doc_id, source,
         list_slice(list_concat(list_concat(
             ['system', 'you', 'are', 'a', 'helpful', 'assistant', 'for'],
             [source]),
             list_concat(['documents', 'answer', 'briefly'],
               list_slice(string_split(text, ' '), 1,
                          10 + CAST(doc_id % 30 AS INT)))),
           1, {_KVP_CAP}) AS head
  FROM documents
),
lv AS (
  SELECT source, d,
         md5(array_to_string(list_slice(head, 1, d), ' ')) AS ph
  FROM req, UNNEST(generate_series(1, len(head))) AS t(d)
),
nodes AS (
  SELECT source, d, ph, COUNT(*) AS c FROM lv GROUP BY source, d, ph
),
trie AS (
  SELECT source,
         CAST(COUNT(*) AS BIGINT) AS trie_tokens,
         CAST(COALESCE(MAX(CASE WHEN c >= 2 THEN d END), 0) AS BIGINT)
           AS max_lcp
  FROM nodes GROUP BY source
),
base AS (
  SELECT source,
         CAST(COUNT(*) AS BIGINT) AS n_requests,
         CAST(SUM(len(head)) AS BIGINT) AS total_tokens
  FROM req GROUP BY source
)
SELECT b.source, b.n_requests, b.total_tokens, t.trie_tokens,
       CAST(b.total_tokens - t.trie_tokens AS BIGINT) AS shared_tokens,
       CAST((b.total_tokens - t.trie_tokens) * 1000 // b.total_tokens
            AS BIGINT) AS share_permille,
       t.max_lcp
FROM base b JOIN trie t ON b.source = t.source
"""


@register("kv_prefix_sharing", oracle=KV_PREFIX_SHARING_ORACLE)
def kv_prefix_sharing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Prefix-cache sharing analytics over a request log — the
    measurement that sizes a radix KV cache (vLLM automatic prefix
    caching / SGLang RadixAttention): per source, how many of the
    first {_KVP_CAP} prompt tokens are shared along the prefix tree vs
    how many distinct trie nodes (KV blocks) the cache must actually
    hold. Uses the LEVEL-SUM trie identity — distinct trie tokens =
    Σ over depth d of |distinct depth-d prefixes|, and the deepest
    node with ≥ 2 visitors IS the max pairwise LCP — so no pairwise
    comparison AND no sort ever happens. (The sorted-neighbor form,
    Σ(len − lcp(sorted predecessor)), computes the same numbers but
    needs a per-source global sort whose parallelism is bounded by
    |sources| — a scale-killer when a few sources dominate a 100 TB
    log; this form was built first, proven output-equal, and
    replaced.) Requests synthesize from documents as per-source
    system preamble + doc-head payload (the production log shape:
    high sharing inside a source via the system prompt, deeper
    sharing where docs repeat).

    Scale shape: prompt heads are CAPPED at {_KVP_CAP} tokens (the
    cache's depth budget — deeper tokens can't be shared anyway);
    each request expands in-scan to ≤ {_KVP_CAP} (source, depth,
    md5(prefix)) scalar rows and everything after is partial-agg
    shuffles on those 16-byte hashes — fully parallel at any source
    skew, no window, no sort, no Python. The trie-identity test pins
    the output against a driver-built ACTUAL prefix tree."""
    t = load_tables(spark, sf_dir)
    req = t.documents.select(
        "source",
        F.expr(_kvp_requests_expr()).alias("head"),
    )
    lv = req.select(
        "source",
        F.posexplode(
            F.expr(
                "transform(sequence(1, size(head)),"
                " d -> md5(array_join(slice(head, 1, d), ' ')))"
            )
        ).alias("d0", "ph"),
    ).select("source", (F.col("d0") + 1).alias("d"), "ph")
    nodes = lv.groupBy("source", "d", "ph").agg(
        F.count(F.lit(1)).alias("c")
    )
    trie = nodes.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("trie_tokens"),
        F.coalesce(
            F.max(F.when(F.col("c") >= 2, F.col("d"))), F.lit(0)
        )
        .cast("bigint")
        .alias("max_lcp"),
    )
    base = req.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_requests"),
        F.sum(F.size("head")).cast("bigint").alias("total_tokens"),
    )
    return base.join(trie, "source").select(
        "source",
        "n_requests",
        "total_tokens",
        "trie_tokens",
        (F.col("total_tokens") - F.col("trie_tokens"))
        .cast("bigint")
        .alias("shared_tokens"),
        F.expr(
            "CAST((total_tokens - trie_tokens) * 1000 DIV total_tokens"
            " AS BIGINT)"
        ).alias("share_permille"),
        "max_lcp",
    )
