"""Privacy & eval-hygiene operators (SURVEY.md §2.C).

Two steps every large-scale training-data pipeline runs that the
dedup/quality families don't cover:

- ``pii_redact``: scrub emails / phone numbers / SSNs before anything
  else sees the text. Single scan, JVM-side regexp chains (RE2-safe
  patterns so the DuckDB oracle replays them verbatim).
- ``decontaminate``: flag training documents sharing any word 8-gram
  with a held-out eval set — test-set decontamination. Eval shingles
  are a broadcast-sized set; training shingles hash to 31-bit ints
  inside the scan, so only (doc_id, hash) pairs explode, never text.

The synthetic documents table contains neither PII nor eval overlap,
so both operators inject deterministic instances first (the
``_docs_with_dups`` pattern from dedup.py:45-65) and the oracles
mirror the same injection.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from oil_wells_data_wrangling_spark.plans.registry import register
from oil_wells_data_wrangling_spark.sources.readers import load_tables

# RE2-compatible (no lookaround) so Spark (Java regex) and DuckDB (RE2)
# match identically.
_EMAIL_RX = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PHONE_RX = r"\b\d{3}-\d{3}-\d{4}\b"
_SSN_RX = r"\b\d{3}-\d{2}-\d{4}\b"


# ------------------------------------------------------------------ pii_redact

_PII_ORACLE = rf"""
WITH pii_docs AS (
  SELECT doc_id,
         CASE WHEN doc_id % 7 = 0 THEN
           text || ' contact user' || CAST(doc_id AS VARCHAR)
                || '@example.com or call 701-555-'
                || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                || ' ssn 123-45-'
                || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
         ELSE text END AS text
  FROM documents
)
SELECT doc_id,
  CAST(len(regexp_extract_all(text, '{_EMAIL_RX}')) AS BIGINT) AS n_emails,
  CAST(len(regexp_extract_all(text, '{_PHONE_RX}')) AS BIGINT) AS n_phones,
  CAST(len(regexp_extract_all(text, '{_SSN_RX}')) AS BIGINT) AS n_ssns,
  md5(regexp_replace(regexp_replace(regexp_replace(text,
      '{_EMAIL_RX}', '[EMAIL]', 'g'),
      '{_PHONE_RX}', '[PHONE]', 'g'),
      '{_SSN_RX}', '[SSN]', 'g')) AS redacted_fp
FROM pii_docs
"""


@register("pii_redact", oracle=_PII_ORACLE)
def pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count and scrub PII in one scan. The 3-2-4 SSN and 3-3-4 phone
    patterns are disjoint under \\b anchoring, so counts are independent
    and redaction order (email, phone, SSN) is purely cosmetic."""
    t = load_tables(spark, sf_dir)
    k = F.col("doc_id")
    pii_tail = F.concat(
        F.lit(" contact user"),
        k.cast("string"),
        F.lit("@example.com or call 701-555-"),
        F.lpad((k % 10000).cast("string"), 4, "0"),
        F.lit(" ssn 123-45-"),
        F.lpad((k % 10000).cast("string"), 4, "0"),
    )
    docs = t.documents.select(
        "doc_id",
        F.when(k % 7 == 0, F.concat(F.col("text"), pii_tail))
        .otherwise(F.col("text"))
        .alias("text"),
    )
    txt = F.col("text")
    redacted = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(txt, _EMAIL_RX, "[EMAIL]"), _PHONE_RX, "[PHONE]"
        ),
        _SSN_RX,
        "[SSN]",
    )
    return docs.select(
        "doc_id",
        F.regexp_count(txt, F.lit(_EMAIL_RX)).cast("bigint").alias("n_emails"),
        F.regexp_count(txt, F.lit(_PHONE_RX)).cast("bigint").alias("n_phones"),
        F.regexp_count(txt, F.lit(_SSN_RX)).cast("bigint").alias("n_ssns"),
        F.md5(redacted).alias("redacted_fp"),
    )


# --------------------------------------------------------------- decontaminate

# Portable 31-bit hash (dedup.py:30-33).
_P = 2_147_483_647
_H32_SPARK = "cast(conv(substr(md5({s}), 1, 8), 16, 10) as bigint) % 2147483647"
_H32_DUCK = "CAST('0x' || substr(md5({s}), 1, 8) AS BIGINT) % 2147483647"

_NGRAM = 8
# 8-gram hash = polynomial combine of per-WORD hashes (base B mod P).
# md5 runs once per word, not once per ~50-char shingle string — measured
# 1.6x faster on the dominant explode stage at sf0.1 (0.74s -> 0.46s);
# products stay < 2^52, exact in int64 on both engines.
_B = 1_000_003


def _poly_duck(idx: str = "i") -> str:
    """Nested DuckDB expression: polynomial combine of hw[idx..idx+7]."""
    e = f"hw[{idx}]"
    for k in range(1, _NGRAM):
        e = f"(({e}) * {_B} + hw[{idx}+{k}]) % {_P}"
    return e

_DECON_ORACLE = f"""
WITH evals AS (
  SELECT doc_id, text FROM documents WHERE doc_id % 11 = 0
),
kc AS (SELECT count(*) AS k FROM evals),
train AS (
  SELECT doc_id, text FROM documents WHERE doc_id % 11 <> 0
),
train2 AS (
  SELECT t.doc_id,
         CASE WHEN e.doc_id IS NULL THEN t.text
              ELSE t.text || ' ' ||
                   array_to_string((string_split(e.text, ' '))[1:{_NGRAM}], ' ')
         END AS text
  FROM train t CROSS JOIN kc
  LEFT JOIN evals e ON e.doc_id = 11 * (t.doc_id % kc.k)
  WHERE t.doc_id % 13 = 0
  UNION ALL
  SELECT doc_id, text FROM train WHERE doc_id % 13 <> 0
),
tw AS (
  SELECT doc_id,
         list_transform(string_split(text, ' '),
                        x -> {_H32_DUCK.format(s='x')}) AS hw
  FROM train2
  WHERE len(string_split(text, ' ')) >= {_NGRAM}
),
tsh AS (
  SELECT doc_id, unnest(list_transform(
    generate_series(1, len(hw) - {_NGRAM - 1}),
    i -> {_poly_duck()}
  )) AS h
  FROM tw
),
ew AS (
  SELECT list_transform(string_split(text, ' '),
                        x -> {_H32_DUCK.format(s='x')}) AS hw
  FROM evals
  WHERE len(string_split(text, ' ')) >= {_NGRAM}
),
esh AS (
  SELECT DISTINCT unnest(list_transform(
    generate_series(1, len(hw) - {_NGRAM - 1}),
    i -> {_poly_duck()}
  )) AS h
  FROM ew
),
ov AS (
  SELECT doc_id, count(DISTINCT tsh.h) AS n_overlap
  FROM tsh JOIN esh ON tsh.h = esh.h
  GROUP BY doc_id
)
SELECT t2.doc_id,
       CAST(COALESCE(ov.n_overlap, 0) AS BIGINT) AS n_overlap,
       COALESCE(ov.n_overlap, 0) > 0 AS contaminated
FROM train2 t2 LEFT JOIN ov ON t2.doc_id = ov.doc_id
"""


def shingle_hashes_sql(docs: DataFrame) -> DataFrame:
    """SQL-expression form of the word-8-gram shingle hasher — the
    executable SPEC for :func:`shingle_hashes`' Arrow fast path, and
    the direct transliteration of the DuckDB oracle's arithmetic: hash
    WORDS once (md5 → 31-bit int), then combine the n word hashes per
    shingle with exact polynomial arithmetic ((g·B + t) mod P) over n
    shifted slices zipped together — O(n) references per ROW, never a
    hash per assembled ~50-char shingle string (the O(n)-not-O(n²)
    shape dedup.py documents). Kept for the bit-equality test in
    tests/test_functions.py; queries call the fast twin."""
    n_sh = f"(size(hw) - {_NGRAM - 1})"
    gram = f"slice(hw, 1, {n_sh})"
    for k in range(2, _NGRAM + 1):
        gram = (
            f"zip_with({gram}, slice(hw, {k}, {n_sh}), "
            f"(g{k}, t{k}) -> (g{k} * {_B} + t{k}) % {_P})"
        )
    words = (
        docs.select("doc_id", F.split("text", " ").alias("w"))
        .filter(F.size("w") >= _NGRAM)
        .select(
            "doc_id",
            F.expr(f"transform(w, x -> {_H32_SPARK.format(s='x')})").alias("hw"),
        )
    )
    return words.select("doc_id", F.explode(F.expr(gram)).alias("h"))


def shingle_hashes(docs: DataFrame) -> DataFrame:
    """(doc_id, 31-bit shingle hash) pairs for every word 8-gram —
    one Arrow-batched ``mapInPandas`` pass replicating
    :func:`shingle_hashes_sql` bit-for-bit (everything is integer
    arithmetic, so equality is exact, not FP-lucky):

    - per-word hash: first 4 md5 bytes big-endian mod P — identical to
      the SQL ``conv(substr(md5(x),1,8),16,10) % P`` (md5 of the same
      UTF-8 bytes; ``str.split(" ")`` and Spark's ``split`` both keep
      empty fields);
    - the batch's whole token stream is FLATTENED once, the words
      deduplicated by ``pd.factorize`` (C-speed), md5 computed only
      per distinct word (amortized further by a cross-batch dict), and
      hashes gathered back by one vectorized take — no per-token
      Python call survives;
    - ONE polynomial combine over the flattened hash array (7 numpy
      passes per BATCH, not per doc; g < P and B ≈ 2²⁰ keep
      g·B + t < 2⁵², no overflow), then a boundary mask drops the
      positions whose 8-gram would straddle two documents.

    Measured ~3.9× the SQL twin at the 100× spot-check (11.0s → 2.8s
    min-of-2 same session; end-to-end decontaminate 100× dropped
    ~11.5s → 5.9s vs r7's per-doc cached loop) even on the word-salted
    replica corpus whose 100× vocabulary is adversarial for caching."""
    import hashlib

    import numpy as np

    b, p, n_gram = _B, _P, _NGRAM

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # Cross-batch word→hash cache, CAPPED: on a natural corpus the
        # hot vocabulary enters early and the cap never binds; on an
        # adversarial one (unbounded vocabulary — e.g. the word-salted
        # scale replicas) an uncapped dict grows with the token stream
        # per worker process, which is a memory liability at 100×, not
        # a win. Past the cap, new words still hash correctly — they
        # just aren't remembered.
        cache_cap = 1 << 20
        cache: dict[str, int] = {}

        for pdf in batches:
            splits = [t.split(" ") for t in pdf["text"]]
            lens = np.fromiter(
                (len(s) for s in splits), dtype=np.int64, count=len(splits)
            )
            total = int(lens.sum())
            if total < n_gram:
                continue
            flat = np.empty(total, dtype=object)
            pos = 0
            for s in splits:
                flat[pos : pos + len(s)] = s
                pos += len(s)
            codes, uniques = pd.factorize(flat, sort=False)
            uh = np.empty(len(uniques), dtype=np.int64)
            room = len(cache) < cache_cap
            for i, w in enumerate(uniques):
                h = cache.get(w)
                if h is None:
                    h = (
                        int.from_bytes(
                            hashlib.md5(w.encode("utf-8")).digest()[:4], "big"
                        )
                        % p
                    )
                    if room:
                        cache[w] = h
                uh[i] = h
            arr = uh[codes]
            n_pos = total - n_gram + 1
            g = arr[:n_pos].copy()
            for k in range(1, n_gram):
                g = (g * b + arr[k : n_pos + k]) % p
            # keep only positions whose full n-gram lies inside one doc
            doc_idx = np.repeat(np.arange(len(lens)), lens)
            valid = doc_idx[:n_pos] == doc_idx[n_gram - 1 :]
            if not valid.any():
                continue
            ids = pdf["doc_id"].to_numpy()[doc_idx[:n_pos][valid]]
            yield pd.DataFrame(
                {"doc_id": ids.astype(np.int64), "h": g[valid]}
            )

    return docs.mapInPandas(run, "doc_id long, h long")


def _contamination_corpus(
    documents: DataFrame,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """The shared (evals, train, train2) scaffold for the contamination
    family: eval split = doc_id % 11; deterministic injection plants
    real contamination (doc_id % 13 training docs get an eval doc's
    leading 8 words appended) so the flags have positives to find.
    Factored out so ``decontaminate`` (train-side flags) and
    ``eval_leakage_report`` (eval-side attribution) audit the SAME
    corpus."""
    base = documents.select("doc_id", "text")
    evals = base.filter(F.col("doc_id") % 11 == 0)
    train = base.filter(F.col("doc_id") % 11 != 0)

    # k collected once and inlined as a literal (the domain_pagerank
    # r15 pattern): a scalar, scale-safe, and it keeps the full-corpus
    # train2 row off any cross-join operator — crossJoin(broadcast(kc))
    # over ALL train rows compiled to a BroadcastNestedLoopJoin Cross
    # that broke codegen and cost ~2× on the bench. Construction
    # becomes eager by one column-pruned count of the eval split.
    k = evals.select("doc_id").count()
    snippets = evals.select(
        F.col("doc_id").alias("pick"),
        F.array_join(F.slice(F.split("text", " "), 1, _NGRAM), " ").alias(
            "snippet"
        ),
    )
    # LEFT join + conditional concat: the donor pick assumes eval ids
    # are the contiguous 11-strided {0, 11, ..., 11*(k-1)}; if ids ever
    # start off 0 or carry gaps, the un-matched train docs keep their
    # original text instead of silently vanishing from train2 (an inner
    # join would drop them — and both engines would agree, so the
    # oracle could never catch the data loss).
    #
    # SINGLE-SCAN form (r16, guide §6): train2 used to be a 2-branch
    # union (injected %13 docs + the rest), so every consumer of
    # train2's text — the corpus-sized Arrow shingle pass — read TWO
    # scans of the documents table. Instead, every train row flows
    # through the same broadcast left join with a CONDITIONAL join key:
    # pick is NULL for non-injected rows, a null key never matches, the
    # snippet comes back NULL and the text passes through unchanged —
    # exactly the old non-injected branch. Same rows, same texts, one
    # scan.
    train2 = (
        train.withColumn(
            "pick",
            F.when(
                F.col("doc_id") % 13 == 0, 11 * (F.col("doc_id") % F.lit(k))
            ),
        )
        .join(F.broadcast(snippets), "pick", "left")
        .select(
            "doc_id",
            F.when(
                F.col("snippet").isNull(), F.col("text")
            ).otherwise(
                F.concat(F.col("text"), F.lit(" "), F.col("snippet"))
            ).alias("text"),
        )
    )
    return evals, train, train2


@register("decontaminate", oracle=_DECON_ORACLE, headline=True)
def decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Test-set decontamination: flag training docs sharing any word
    8-gram with the eval split (doc_id % 11). Deterministic injection
    plants real contamination (doc_id % 13 training docs get an eval
    doc's leading 8 words appended) so the flag has positives to find.

    Scale shape: eval shingle hashes are a broadcast set; the training
    side explodes (doc_id, 31-bit hash) pairs only — text never leaves
    the scan stage. The 8-gram array is built from 8 shifted slices of
    one split (each slice references the word array exactly once), so
    Catalyst's project collapsing inlines split(text) a constant 8
    times per row — never once per shingle — and no cache barrier (or
    its leaked storage) is needed. The injection scaffold picks each
    train doc's snippet donor arithmetically (eval ids are the 11-strided
    ``11*j`` by the split rule, so ``e.doc_id = 11 * (t.doc_id % k)`` is
    a direct key join) — no row_number() over a global order, so the
    whole plan is free of unbounded single-partition stages (pinned by
    the sweep in tests/test_plan_shapes.py)."""
    t = load_tables(spark, sf_dir)
    evals, train, train2 = _contamination_corpus(t.documents)

    eval_set = shingle_hashes(evals).select("h").distinct()
    overlap = (
        shingle_hashes(train2)
        .join(F.broadcast(eval_set), "h")
        .groupBy("doc_id")
        .agg(F.count_distinct("h").alias("n_overlap"))
    )
    # train2's ids == train's ids (injection only appends text), so the
    # output spine can skip rebuilding the union+injection join.
    return (
        train.select("doc_id")
        .join(overlap, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("n_overlap"), F.lit(0)).cast("bigint").alias("n_overlap"),
            (F.coalesce(F.col("n_overlap"), F.lit(0)) > 0).alias("contaminated"),
        )
    )


# ---------------------------------------------------------------- pseudonymize

_PSEUDO_ORACLE = """
WITH s AS (
  SELECT user_id,
         substr(md5('pepper_v1:' || CAST(user_id AS VARCHAR)), 1, 16)
           AS surrogate
  FROM events
)
SELECT surrogate,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_raw_ids
FROM s GROUP BY surrogate
"""


@register("pseudonymize", oracle=_PSEUDO_ORACLE)
def pseudonymize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyed pseudonymization: user ids map to salted-hash surrogates
    (the pepper would live in a secret store; rotating it unlinks all
    history at once — the GDPR-style kill switch raw hashing lacks).
    Join keys survive: the audit proves each surrogate covers exactly
    one raw id (n_raw_ids = 1 everywhere means joins on the surrogate
    behave identically to joins on the raw key), while the surrogate
    itself reveals nothing without the pepper."""
    t = load_tables(spark, sf_dir)
    surrogate = F.substring(
        F.md5(F.concat(F.lit("pepper_v1:"), F.col("user_id").cast("string"))),
        1,
        16,
    )
    return (
        t.events.select(surrogate.alias("surrogate"), "user_id")
        .groupBy("surrogate")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.count_distinct("user_id").alias("n_raw_ids"),
        )
    )


# -------------------------------------------------------- contamination_report

_CONTAM_SCALE = 1_000_000

_CONTAM_REPORT_ORACLE = f"""
WITH d AS (
  {_DECON_ORACLE}
)
SELECT doc.lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN d.contaminated THEN 1 ELSE 0 END) AS BIGINT)
         AS n_contaminated,
       CAST((SUM(CASE WHEN d.contaminated THEN 1 ELSE 0 END)
             * {_CONTAM_SCALE}) // COUNT(*) AS BIGINT) AS rate_ppm
FROM d JOIN documents doc USING (doc_id)
GROUP BY doc.lang
"""


@register("contamination_report", oracle=_CONTAM_REPORT_ORACLE)
def contamination_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language contamination rollup over ``decontaminate``'s
    output — the audit table a curation run publishes: how much of each
    stratum shares an 8-gram with the eval split, as counts and an
    exact ppm rate (integer arithmetic, no float division).

    Scale shape: everything decontaminate's plan already is (broadcast
    eval-shingle set, scalar-only exchanges), plus one lang lookup
    joined on doc_id and a 5-row rollup — the report adds a single
    partial-agg shuffle of (lang, flag) pairs."""
    flags = decontaminate(spark, sf_dir)
    t = load_tables(spark, sf_dir)
    return (
        flags.join(t.documents.select("doc_id", "lang"), "doc_id")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.col("contaminated").cast("int"))
            .cast("bigint")
            .alias("n_contaminated"),
        )
        .select(
            "lang",
            "n_docs",
            "n_contaminated",
            F.expr(f"(n_contaminated * {_CONTAM_SCALE}) div n_docs").alias(
                "rate_ppm"
            ),
        )
    )


# -------------------------------------------------------- eval_leakage_report

# df-cap: shingles shared by more than this many distinct TRAIN docs
# are dropped before the pair join (stopword-like 8-grams would
# otherwise fan out quadratically on a hot key). Natural text never
# reaches the cap at test scale, so exact oracle parity holds while the
# production guard stays live in the plan.
_LEAK_DF_CAP = 100

_LEAK_ORACLE = f"""
WITH evals AS (
  SELECT doc_id, text FROM documents WHERE doc_id % 11 = 0
),
kc AS (SELECT count(*) AS k FROM evals),
train AS (
  SELECT doc_id, text FROM documents WHERE doc_id % 11 <> 0
),
train2 AS (
  SELECT t.doc_id,
         CASE WHEN e.doc_id IS NULL THEN t.text
              ELSE t.text || ' ' ||
                   array_to_string((string_split(e.text, ' '))[1:{_NGRAM}], ' ')
         END AS text
  FROM train t CROSS JOIN kc
  LEFT JOIN evals e ON e.doc_id = 11 * (t.doc_id % kc.k)
  WHERE t.doc_id % 13 = 0
  UNION ALL
  SELECT doc_id, text FROM train WHERE doc_id % 13 <> 0
),
tw AS (
  SELECT doc_id,
         list_transform(string_split(text, ' '),
                        x -> {_H32_DUCK.format(s='x')}) AS hw
  FROM train2
  WHERE len(string_split(text, ' ')) >= {_NGRAM}
),
tsh AS (
  SELECT doc_id, unnest(list_transform(
    generate_series(1, len(hw) - {_NGRAM - 1}),
    i -> {_poly_duck()}
  )) AS h
  FROM tw
),
tpairs AS (SELECT DISTINCT doc_id, h FROM tsh),
ok AS (
  SELECT h FROM tpairs GROUP BY h HAVING count(*) <= {_LEAK_DF_CAP}
),
ew AS (
  SELECT doc_id,
         list_transform(string_split(text, ' '),
                        x -> {_H32_DUCK.format(s='x')}) AS hw
  FROM evals
  WHERE len(string_split(text, ' ')) >= {_NGRAM}
),
esh AS (
  SELECT doc_id, unnest(list_transform(
    generate_series(1, len(hw) - {_NGRAM - 1}),
    i -> {_poly_duck()}
  )) AS h
  FROM ew
),
epairs AS (SELECT DISTINCT doc_id, h FROM esh),
hits AS (
  SELECT e.doc_id AS eval_id, t.doc_id AS train_id, e.h
  FROM epairs e
  JOIN ok USING (h)
  JOIN tpairs t USING (h)
),
agg AS (
  SELECT eval_id,
         count(DISTINCT train_id) AS n_train_docs,
         count(DISTINCT h) AS n_shared
  FROM hits GROUP BY eval_id
)
SELECT ev.doc_id,
       CAST(COALESCE(a.n_train_docs, 0) AS BIGINT) AS n_train_docs,
       CAST(COALESCE(a.n_shared, 0) AS BIGINT) AS n_shared,
       COALESCE(a.n_shared, 0) > 0 AS leaked
FROM evals ev LEFT JOIN agg a ON a.eval_id = ev.doc_id
"""


@register("eval_leakage_report", oracle=_LEAK_ORACLE)
def eval_leakage_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The REVERSE direction of ``decontaminate``: per EVAL document,
    which benchmark items are compromised and how badly — the table a
    benchmark owner publishes (n distinct training docs sharing any
    word 8-gram, n distinct shared shingles, leaked flag), over the
    same injected corpus, so both reports audit one ground truth.

    Scale shape: where decontaminate broadcasts the eval shingle SET
    (per-train attribution needs no eval ids), per-eval attribution
    needs (h → eval_id) — and a full benchmark suite's shingle multimap
    is too big to broadcast at production scale — so this is the
    honest SHUFFLE-path twin: both sides reduce to DISTINCT (doc_id,
    31-bit h) scalar pairs, the join keys on h, and a train-df cap
    (HAVING count ≤ {_LEAK_DF_CAP}) bounds the per-key fan-out before
    any pair materializes — the same df-capped-join guard
    winnow_dup_spans uses, so a stopword-like hot shingle cannot go
    quadratic. Text never leaves the scan stage on either side."""
    t = load_tables(spark, sf_dir)
    evals, _train, train2 = _contamination_corpus(t.documents)

    from pyspark.sql.window import Window

    tpairs = shingle_hashes(train2).distinct()
    # df-cap as a count-over-h WINDOW on the one (doc_id, h) exchange
    # (r16, guide §2.4 — the pattern dup_spans_exact picked by A/B):
    # the old groupBy + join-back re-ran the corpus-sized Arrow shingle
    # pass for the probe side (tpairs is not cached) and paid a second
    # h-exchange. Same rows survive: a row passes iff its h's distinct
    # train-doc count is <= the cap, exactly the old semi-join test.
    # The hot-key fan-in is df (a window partition), never df².
    tok = (
        tpairs.withColumn(
            "df", F.count(F.lit(1)).over(Window.partitionBy("h"))
        )
        .filter(F.col("df") <= _LEAK_DF_CAP)
        .select(F.col("doc_id").alias("train_id"), "h")
    )
    epairs = (
        shingle_hashes(evals)
        .distinct()
        .withColumnRenamed("doc_id", "eval_id")
    )
    hits = epairs.join(tok, "h")
    agg = hits.groupBy("eval_id").agg(
        F.count_distinct("train_id").alias("n_train_docs"),
        F.count_distinct("h").alias("n_shared"),
    )
    return (
        evals.select("doc_id")
        .join(agg, F.col("doc_id") == F.col("eval_id"), "left")
        .select(
            "doc_id",
            F.coalesce("n_train_docs", F.lit(0))
            .cast("bigint")
            .alias("n_train_docs"),
            F.coalesce("n_shared", F.lit(0)).cast("bigint").alias("n_shared"),
            (F.coalesce("n_shared", F.lit(0)) > 0).alias("leaked"),
        )
    )


# ---------------------------------------------------------------- dp_histogram

# suppression threshold (k-anonymity style) and noise bound. Noise is
# a DETERMINISTIC md5-derived integer in [-_DP_B, +_DP_B] so the gate
# can hash-compare engines; production swaps the derivation for a
# calibrated Laplace/discrete-Gaussian sampler — the pipeline shape
# (per-cell noise, sensitivity-1 counts, small-cell suppression) is
# identical and that shape is what this operator pins.
_DP_K = 25
_DP_B = 10

_DP_HIST_ORACLE = f"""
WITH c AS (
  SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS n
  FROM documents GROUP BY lang, source
),
noised AS (
  SELECT lang, source, n,
         n + CAST('0x' || substr(md5('dph_v1_' || lang || '|' || source), 1, 8)
               AS BIGINT) % {2 * _DP_B + 1} - {_DP_B} AS n_noised
  FROM c
)
SELECT lang, source,
       CASE WHEN n >= {_DP_K} THEN GREATEST(n_noised, 0) END AS n_released,
       (n < {_DP_K}) AS suppressed
FROM noised
"""


@register("dp_histogram", oracle=_DP_HIST_ORACLE)
def dp_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Privacy-releasable histogram over (lang, source): per-cell counts
    get bounded integer noise, cells below the suppression threshold k
    release NULL (flagged), and released values clamp at zero — the
    disclosure-control pass run before sharing corpus composition
    stats outside the trust boundary. Noise here is derived
    deterministically from the cell key (so the correctness gate can
    compare engines bit-for-bit); a production release swaps ONE
    expression for a calibrated Laplace sampler at sensitivity 1 —
    suppression, clamping, and the release schema do not change.

    Scale shape: one partial-agg shuffle on the (lang, source) grid —
    the released table is grid-sized, never row-sized; noise and
    suppression are projections over that tiny aggregate, so the
    privacy pass costs nothing beyond the histogram it protects. At
    100 TB the same plan holds: disclosure control composes AFTER
    aggregation, on |grid| rows."""
    t = load_tables(spark, sf_dir)
    c = t.documents.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n")
    )
    noise = (
        F.expr(
            "cast(conv(substr(md5(concat('dph_v1_', lang, '|', source)),"
            " 1, 8), 16, 10) as bigint)"
        )
        % (2 * _DP_B + 1)
        - _DP_B
    )
    return c.select(
        "lang",
        "source",
        F.when(
            F.col("n") >= _DP_K, F.greatest(F.col("n") + noise, F.lit(0))
        ).alias("n_released"),
        (F.col("n") < _DP_K).alias("suppressed"),
    )


# Shared $1000 balance bucketing for the release audits
# (k_anonymity_report + l_diversity_report): explicit FLOOR division
# (subtract pmod first) on offset cents — Spark `div` and DuckDB `//`
# both truncate toward zero today, but truncation vs floor is an
# engine-version detail; this form buckets negative offset-cents
# identically everywhere, with no assumed acctbal range. ONE copy per
# engine so the two companion audits can never disagree on class edges.
_BAL_BUCKET_SPARK = (
    "(cast(round(c_acctbal * 100) as bigint) + 100000"
    " - pmod(cast(round(c_acctbal * 100) as bigint) + 100000, 100000))"
    " div 100000"
)
_BAL_BUCKET_DUCK = (
    "(CAST(round(c_acctbal * 100) AS BIGINT) + 100000"
    " - ((CAST(round(c_acctbal * 100) AS BIGINT) + 100000) % 100000"
    "    + 100000) % 100000) // 100000"
)


# --------------------------------------------------------- k_anonymity_report

_KANON_K = 8

_KANON_ORACLE = f"""
WITH c AS (
  SELECT c_custkey, c_nationkey AS nat, c_mktsegment AS seg,
         {_BAL_BUCKET_DUCK} AS bal_b
  FROM customer
),
g0 AS (SELECT nat, seg, bal_b, CAST(COUNT(*) AS BIGINT) AS cnt
       FROM c GROUP BY nat, seg, bal_b),
g1 AS (SELECT nat, seg, CAST(COUNT(*) AS BIGINT) AS cnt FROM c GROUP BY nat, seg),
g2 AS (SELECT seg, CAST(COUNT(*) AS BIGINT) AS cnt FROM c GROUP BY seg),
lv AS (
  SELECT c.c_custkey,
         CASE WHEN g0.cnt >= {_KANON_K} THEN 0
              WHEN g1.cnt >= {_KANON_K} THEN 1
              WHEN g2.cnt >= {_KANON_K} THEN 2
              ELSE 3 END AS level,
         CASE WHEN g0.cnt >= {_KANON_K}
                THEN 'L0:' || c.nat || '|' || c.seg || '|' || c.bal_b
              WHEN g1.cnt >= {_KANON_K} THEN 'L1:' || c.nat || '|' || c.seg
              WHEN g2.cnt >= {_KANON_K} THEN 'L2:' || c.seg
              ELSE NULL END AS gkey
  FROM c
  JOIN g0 ON g0.nat = c.nat AND g0.seg = c.seg AND g0.bal_b = c.bal_b
  JOIN g1 ON g1.nat = c.nat AND g1.seg = c.seg
  JOIN g2 ON g2.seg = c.seg
)
SELECT level,
       CAST(COUNT(*) AS BIGINT) AS n_records,
       CAST(COUNT(DISTINCT gkey) AS BIGINT) AS n_groups
FROM lv
GROUP BY level
"""


@register("k_anonymity_report", oracle=_KANON_ORACLE)
def k_anonymity_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-record minimal-generalization k-anonymity (k={_KANON_K})
    over the customer quasi-identifiers (nation, market segment,
    $1000 account-balance bucket) — the release-audit step a data
    pipeline runs before customer-level extracts leave the boundary.
    Generalization ladder: full QI triple → drop the balance bucket →
    segment only → suppress; each record reports the FIRST rung whose
    equivalence class reaches k, and the report aggregates records
    and surviving classes per rung.

    Scale shape: every rung's class-count table is bounded by the QI
    DOMAIN (|nations|x|segments|x|balance buckets|), not by record
    count, so all three aggregate small and broadcast back onto the
    record scan — records cross exactly one wide exchange (the final
    per-level agg, 4 rows out). Balance bucketing is EXPLICIT integer
    floor division on offset cents (pmod-subtract before div, so
    truncate-vs-floor engine differences can't move bucket edges at
    any balance, positive or negative); suppressed records carry a
    NULL class key, which both engines exclude from COUNT(DISTINCT)."""
    t = load_tables(spark, sf_dir)
    c = t.customer.select(
        "c_custkey",
        F.col("c_nationkey").alias("nat"),
        F.col("c_mktsegment").alias("seg"),
        F.expr(_BAL_BUCKET_SPARK).alias("bal_b"),
    )
    g0 = c.groupBy("nat", "seg", "bal_b").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt0")
    )
    g1 = c.groupBy("nat", "seg").agg(F.count(F.lit(1)).cast("bigint").alias("cnt1"))
    g2 = c.groupBy("seg").agg(F.count(F.lit(1)).cast("bigint").alias("cnt2"))
    k = F.lit(_KANON_K)
    lv = (
        c.join(F.broadcast(g0), ["nat", "seg", "bal_b"])
        .join(F.broadcast(g1), ["nat", "seg"])
        .join(F.broadcast(g2), ["seg"])
        .select(
            F.when(F.col("cnt0") >= k, F.lit(0))
            .when(F.col("cnt1") >= k, F.lit(1))
            .when(F.col("cnt2") >= k, F.lit(2))
            .otherwise(F.lit(3))
            .alias("level"),
            F.when(
                F.col("cnt0") >= k,
                F.concat(F.lit("L0:"), "nat", F.lit("|"), "seg", F.lit("|"), "bal_b"),
            )
            .when(
                F.col("cnt1") >= k,
                F.concat(F.lit("L1:"), "nat", F.lit("|"), "seg"),
            )
            .when(F.col("cnt2") >= k, F.concat(F.lit("L2:"), "seg"))
            .otherwise(F.lit(None).cast("string"))
            .alias("gkey"),
        )
    )
    return lv.groupBy("level").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_records"),
        F.countDistinct("gkey").cast("bigint").alias("n_groups"),
    )


# --------------------------------------------------------- l_diversity_report

# l-diversity (Machanavajjhala et al. 2007): k-anonymity's companion
# audit — an equivalence class can reach k rows yet still leak the
# sensitive attribute if every row SHARES it (the homogeneity attack).
# Quasi-identifiers here are (nation, $1000 balance bucket) — the
# k_anonymity_report scheme minus the segment, which becomes the
# SENSITIVE attribute: per class, l = distinct segments; the report
# histograms classes and records by l, the distribution a release
# audit reads before deciding the generalization ladder.
_LDIV_ORACLE = f"""
WITH c AS (
  SELECT c_custkey, c_nationkey AS nat, c_mktsegment AS seg,
         {_BAL_BUCKET_DUCK} AS bal_b
  FROM customer
),
cls AS (
  SELECT nat, bal_b,
         CAST(COUNT(*) AS BIGINT) AS n_rows,
         CAST(COUNT(DISTINCT seg) AS BIGINT) AS l
  FROM c GROUP BY nat, bal_b
)
SELECT l,
       CAST(COUNT(*) AS BIGINT) AS n_classes,
       CAST(SUM(n_rows) AS BIGINT) AS n_records
FROM cls GROUP BY l
"""


@register("l_diversity_report", oracle=_LDIV_ORACLE)
def l_diversity_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """l-diversity audit — k-anonymity's companion: a quasi-identifier
    class can reach k records yet still leak the sensitive attribute
    if every record shares it (the homogeneity attack). Per
    (nation, $1000 balance bucket) class, l = distinct market
    segments; the report histograms classes and records by l — the
    distribution a release audit reads before choosing the
    generalization ladder (classes at l=1 are the leak).

    Scale shape: one (nat, bal_b)-keyed partial agg with a distinct
    count bounded by the segment DOMAIN (5 values), then an l-keyed
    rollup over class-count rows — records cross one exchange, the
    class table is QI-domain-bounded. The balance bucketing is
    k_anonymity_report's explicit floor-division-on-offset-cents form
    (truncate-vs-floor engine differences cannot move bucket edges)."""
    t = load_tables(spark, sf_dir)
    c = t.customer.select(
        F.col("c_nationkey").alias("nat"),
        F.col("c_mktsegment").alias("seg"),
        F.expr(_BAL_BUCKET_SPARK).alias("bal_b"),
    )
    cls = c.groupBy("nat", "bal_b").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.countDistinct("seg").cast("bigint").alias("l"),
    )
    return cls.groupBy("l").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_classes"),
        F.sum("n_rows").cast("bigint").alias("n_records"),
    )


# -------------------------------------------------------------- dp_mean_clipped

# DP mean with per-record CLIPPING — the other half of the disclosure
# toolkit next to dp_histogram's counts: each record's contribution is
# clipped to C first (bounding sensitivity to C for the sum and 1 for
# the count — the DP-SGD / smooth-sensitivity recipe), then both
# noised sums release only above the suppression threshold. Noise is
# dp_histogram's deterministic md5 derivation (engine-comparable);
# production swaps the one expression for calibrated Laplace at the
# SAME sensitivities — clipping, suppression, and the release schema
# are what this operator pins. n_at_clip is the calibration readback:
# how many records the clip actually truncated (too many → C too low,
# the released mean is biased; none → C wastes privacy budget).
_DPM_C = 500   # contribution clip (chars)
_DPM_K = 25    # suppression threshold

_DPM_ORACLE = f"""
WITH c AS (
  SELECT lang,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(LEAST(n_chars, {_DPM_C})) AS BIGINT) AS s,
         CAST(SUM(CASE WHEN n_chars >= {_DPM_C} THEN 1 ELSE 0 END)
              AS BIGINT) AS n_at_clip
  FROM documents GROUP BY lang
),
noised AS (
  SELECT lang, n, s, n_at_clip,
         s + CAST('0x' || substr(md5('dpm_s_' || lang), 1, 8) AS BIGINT)
             % {2 * _DPM_C + 1} - {_DPM_C} AS s_noised,
         n + CAST('0x' || substr(md5('dpm_n_' || lang), 1, 8) AS BIGINT)
             % 3 - 1 AS n_noised
  FROM c
)
SELECT lang, n, n_at_clip,
       CASE WHEN n >= {_DPM_K}
            THEN GREATEST(s_noised, 0) / GREATEST(n_noised, 1) END
         AS released_mean,
       (n < {_DPM_K}) AS suppressed
FROM noised
"""


@register("dp_mean_clipped", oracle=_DPM_ORACLE)
def dp_mean_clipped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Privacy-releasable clipped mean of document length per language:
    contributions clip at C (sum sensitivity C, count sensitivity 1 —
    the DP-SGD bounding recipe), deterministic bounded noise lands on
    BOTH the sum and the count, small groups suppress, and the
    released mean divides the clamped noised aggregates. n_at_clip
    reads back how often the clip bound actually bit — the C-tuning
    signal. Swap the two md5 expressions for calibrated Laplace
    samplers and this is the production release; nothing else moves.

    Scale shape: one |langs|-group partial agg (clip applied in-scan);
    noise, suppression, and the divide are projections over the tiny
    aggregate — disclosure control composes AFTER aggregation, on
    |groups| rows, at any corpus size."""
    t = load_tables(spark, sf_dir)
    c = t.documents.groupBy("lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.least(F.col("n_chars"), F.lit(_DPM_C)))
        .cast("bigint")
        .alias("s"),
        F.sum((F.col("n_chars") >= _DPM_C).cast("int"))
        .cast("bigint")
        .alias("n_at_clip"),
    )
    h = lambda salt: F.expr(
        f"cast(conv(substr(md5(concat('{salt}', lang)), 1, 8), 16, 10)"
        " as bigint)"
    )
    noised = c.select(
        "lang",
        "n",
        "n_at_clip",
        (F.col("s") + h("dpm_s_") % (2 * _DPM_C + 1) - _DPM_C).alias(
            "s_noised"
        ),
        (F.col("n") + h("dpm_n_") % 3 - 1).alias("n_noised"),
    )
    return noised.select(
        "lang",
        "n",
        "n_at_clip",
        F.when(
            F.col("n") >= _DPM_K,
            F.greatest(F.col("s_noised"), F.lit(0))
            / F.greatest(F.col("n_noised"), F.lit(1)),
        ).alias("released_mean"),
        (F.col("n") < _DPM_K).alias("suppressed"),
    )


# ---------------------------------------------------------------- secrets_scan

# Credential patterns (RE2-safe, replayed verbatim by DuckDB): AWS
# access-key ids, GitHub personal-access tokens, bare 40-hex secrets
# (SHA-1-shaped API keys). Mutually disjoint by construction: AWS is
# uppercase, ghp_ carries a 36-hex tail (too short for the 40-hex
# rule's \b anchors), so per-pattern counts are independent.
_AWS_RX = r"\bAKIA[0-9A-F]{16}\b"
_GHP_RX = r"\bghp_[0-9a-f]{36}\b"
_HEX40_RX = r"\b[0-9a-f]{40}\b"

# Deterministic secret synthesis — the parquet corpus is secret-free,
# so (like pii_redact's PII tail) docs at doc_id % 5 ∈ {1,2,3} get one
# injected credential each, derived from md5(doc_id) so both engines
# materialize identical bytes.
_SECRETS_ORACLE = f"""
WITH seeded AS (
  SELECT doc_id, source,
         CASE
           WHEN doc_id % 5 = 1 THEN text || ' aws_access_key_id=AKIA'
                || upper(substr(md5(CAST(doc_id AS VARCHAR)), 1, 16))
           WHEN doc_id % 5 = 2 THEN text || ' token: ghp_'
                || substr(md5(CAST(doc_id AS VARCHAR)), 1, 36 - 32)
                || substr(md5(CAST(doc_id AS VARCHAR) || 'x'), 1, 32)
           WHEN doc_id % 5 = 3 THEN text || ' api_secret='
                || substr(md5(CAST(doc_id AS VARCHAR)), 1, 20)
                || substr(md5(CAST(doc_id AS VARCHAR) || 'y'), 1, 20)
           ELSE text
         END AS text
  FROM documents
),
per_doc AS (
  SELECT source,
         len(regexp_extract_all(text, '{_AWS_RX}')) AS c_aws,
         len(regexp_extract_all(text, '{_GHP_RX}')) AS c_ghp,
         len(regexp_extract_all(text, '{_HEX40_RX}')) AS c_hex
  FROM seeded
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(c_aws) AS BIGINT) AS n_aws_keys,
       CAST(SUM(c_ghp) AS BIGINT) AS n_gh_tokens,
       CAST(SUM(c_hex) AS BIGINT) AS n_hex_secrets,
       CAST(SUM(CASE WHEN c_aws + c_ghp + c_hex > 0 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_flagged_docs,
       CAST(SUM(CASE WHEN c_aws + c_ghp + c_hex > 0 THEN 1 ELSE 0 END) * 1000
            // COUNT(*) AS BIGINT) AS flagged_permille
FROM per_doc
GROUP BY source
"""


@register("secrets_scan", oracle=_SECRETS_ORACLE)
def secrets_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Credential-leak audit over a code/web corpus — the
    secrets-hygiene pass every code-training pipeline runs before
    release (AWS key ids, GitHub PATs, bare 40-hex API secrets), here
    as the per-source summary a curation dashboard consumes. The
    corpus is secret-free, so deterministic credentials are injected
    at doc_id % 5 ∈ {1,2,3} (pii_redact's synthesis pattern) and the
    detector is graded on recovering exactly them.

    Scale shape: one scan, all three detectors as JVM-side
    ``regexp_count`` in the same projection (no Python, no second
    pass), then a partial-aggregated rollup to the bounded source set
    — map-side combine makes the shuffle rows-per-source, not
    rows-per-doc. At 100 TB this is scan-bound, exactly what a
    secrets sweep should be."""
    t = load_tables(spark, sf_dir)
    k = F.col("doc_id")
    kstr = k.cast("string")
    seeded = t.documents.select(
        "source",
        F.when(
            k % 5 == 1,
            F.concat(
                F.col("text"),
                F.lit(" aws_access_key_id=AKIA"),
                F.upper(F.substring(F.md5(kstr), 1, 16)),
            ),
        )
        .when(
            k % 5 == 2,
            F.concat(
                F.col("text"),
                F.lit(" token: ghp_"),
                F.substring(F.md5(kstr), 1, 4),
                F.substring(F.md5(F.concat(kstr, F.lit("x"))), 1, 32),
            ),
        )
        .when(
            k % 5 == 3,
            F.concat(
                F.col("text"),
                F.lit(" api_secret="),
                F.substring(F.md5(kstr), 1, 20),
                F.substring(F.md5(F.concat(kstr, F.lit("y"))), 1, 20),
            ),
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    txt = F.col("text")
    per_doc = seeded.select(
        "source",
        F.regexp_count(txt, F.lit(_AWS_RX)).alias("c_aws"),
        F.regexp_count(txt, F.lit(_GHP_RX)).alias("c_ghp"),
        F.regexp_count(txt, F.lit(_HEX40_RX)).alias("c_hex"),
    )
    flagged = (F.col("c_aws") + F.col("c_ghp") + F.col("c_hex") > 0).cast(
        "int"
    )
    return (
        per_doc.withColumn("is_flagged", flagged)
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("c_aws").cast("bigint").alias("n_aws_keys"),
            F.sum("c_ghp").cast("bigint").alias("n_gh_tokens"),
            F.sum("c_hex").cast("bigint").alias("n_hex_secrets"),
            F.sum("is_flagged").cast("bigint").alias("n_flagged_docs"),
            F.expr("sum(is_flagged) * 1000 div count(1)")
            .cast("bigint")
            .alias("flagged_permille"),
        )
    )
