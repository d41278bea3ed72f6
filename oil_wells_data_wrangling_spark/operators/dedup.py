"""Deduplication operator family (SURVEY.md §2.C).

Exact dedup, MinHash+LSH near-dup, SimHash, and exact n-gram Jaccard —
the operators a 100 TB training-data pipeline runs before anything else.

Scale design notes:
- Exact dedup groups by md5(text) so only (hash, id) pairs shuffle; the
  text column never leaves the scan stage.
- MinHash signatures are computed with *array expressions* (transform /
  array_min) inside the scan — no explode, no shuffle, no UDF. Only the
  (doc_id, band_id, band_hash) triples shuffle for the bucket self-join,
  which bounds candidate pairs the way LSH is supposed to.
- All hashing is md5-derived (h = first 8 hex digits as int), portable
  across engines, so even the probabilistic operators have EXACT DuckDB
  oracles: same hashes → same signatures → same buckets → same pairs.

Test-data synthesis: the driver's documents table has no duplicates, so
queries append synthetic dup/near-dup rows (doc_id + 1_000_000, text or
text + a tail) before deduplicating; oracles mirror the same UNION ALL.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from oil_wells_data_wrangling_spark.plans.registry import register
from oil_wells_data_wrangling_spark.sources.readers import load_tables

# Portable 31-bit token hash: first 8 hex digits of md5 mod a Mersenne prime.
_P = 2_147_483_647
_H32_SPARK = "cast(conv(substr(md5({s}), 1, 8), 16, 10) as bigint) % 2147483647"
_H32_DUCK = "CAST('0x' || substr(md5({s}), 1, 8) AS BIGINT) % 2147483647"

_K_PERM = 32  # minhash permutations
_BANDS = 8  # LSH bands (x4 rows each)


def _perm(i: int) -> tuple[int, int]:
    return 2 * i + 1, 7 * i + 3


# ----------------------------------------------------------------- helpers

def _docs_with_dups(
    spark: SparkSession, sf_dir: str, every: int, tail: str
) -> DataFrame:
    """documents ∪ synthetic duplicates (same text + optional tail).

    SINGLE-SCAN form (r16, guide §6): the 2-branch union read the
    documents table twice per consumer; each row now explodes into its
    1–2 output rows from ONE scan (identical multiset — checksum-
    verified and oracle-pinned by every consumer's parity test).
    The duplicate row's text is concat'd per row inside the scan, the
    same expression the dropped branch evaluated."""
    t = load_tables(spark, sf_dir)
    base = t.documents.select("doc_id", "text")
    return base.select(
        F.explode(
            F.expr(
                f"filter(array(struct(doc_id, text), "
                f"struct(doc_id + 1000000L as doc_id,"
                f" concat(text, '{tail}') as text)), "
                f"(x, i) -> i = 0 or doc_id % {every} = 0)"
            )
        ).alias("r")
    ).select("r.doc_id", "r.text")


def _docs2_sql(every: int, tail: str) -> str:
    return f"""
docs2 AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 1000000 AS doc_id, text || '{tail}' AS text
  FROM documents WHERE doc_id % {every} = 0
)"""


# -------------------------------------------------------------- dedup_exact

_EXACT_ORACLE = f"""
WITH {_docs2_sql(4, '')}
SELECT CAST(MIN(doc_id) AS BIGINT) AS keep_id,
       CAST(COUNT(*) AS BIGINT) AS n_copies
FROM docs2 GROUP BY md5(text)
"""


@register("dedup_exact", oracle=_EXACT_ORACLE)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup keep-first: group by content hash, not content —
    at 100 TB only 16-byte hashes shuffle, never the documents."""
    docs = _docs_with_dups(spark, sf_dir, every=4, tail="")
    return (
        docs.groupBy(F.md5("text"))
        .agg(F.min("doc_id").alias("keep_id"), F.count(F.lit(1)).alias("n_copies"))
        .select("keep_id", "n_copies")
    )


# ------------------------------------------------------------ minhash + LSH

_NEAR_TAIL = " near dup tail marker"


# O(n) shingle construction: three slices of one split, zipped — NOT
# element_at(split(text), i) inside a lambda, which Catalyst inlines into
# an O(n²) re-split per element after project collapsing.
_SHINGLES_EXPR = (
    "zip_with("
    "  slice(split(text, ' '), 1, size(split(text, ' ')) - 2),"
    "  zip_with("
    "    slice(split(text, ' '), 2, size(split(text, ' ')) - 2),"
    "    slice(split(text, ' '), 3, size(split(text, ' ')) - 2),"
    "    (b, c) -> concat(b, ' ', c)),"
    "  (a, bc) -> concat(a, ' ', bc))"
)


def hashed_shingles(docs: DataFrame) -> DataFrame:
    """(doc_id, harr): word 3-gram shingles → portable 31-bit hash array.

    Cached: every signature permutation references harr, and Catalyst's
    project collapsing would otherwise inline (and recompute) the md5
    array once *per permutation* — a 32× blowup measured at sf0.1. The
    cache is the materialized pipeline stage a production run would
    persist anyway.
    """
    harr = F.expr(
        "transform(" + _SHINGLES_EXPR + ", s -> " + _H32_SPARK.format(s="s") + ")"
    )
    return (
        docs.filter(F.size(F.split("text", " ")) >= 3)
        .select("doc_id", harr.alias("harr"))
        .cache()
    )


def minhash_signature_sql(docs: DataFrame) -> DataFrame:
    """32-permutation MinHash signature as an array column (no explode).

    The SQL-expression form — the executable SPEC for the Arrow fast
    twin :func:`minhash_signature` (bit-equality pinned in
    tests/test_dedup_fastpath.py); queries call the twin. Cached: the
    8 band expressions each reference ``sig``, and project collapsing
    would re-run all 32 permutation scans per band (measured 2.3×
    slower at sf0.1 without the barrier)."""
    hh = hashed_shingles(docs)
    sigs = [
        F.expr(
            f"array_min(transform(harr, h -> ({a} * h + {b}) % {_P}))"
        ).alias(f"s{i}")
        for i, (a, b) in ((i, _perm(i)) for i in range(_K_PERM))
    ]
    return hh.select("doc_id", F.array(*sigs).alias("sig")).cache()


def minhash_signature(docs: DataFrame) -> DataFrame:
    """Arrow fast twin of :func:`minhash_signature_sql`: one
    ``mapInPandas`` pass from text straight to the 32-slot signature,
    replicating the spec's arithmetic bit-for-bit (all integer ops, so
    equality is exact):

    - same doc filter (``len(text.split(" ")) >= 3`` — Python
      ``str.split(" ")`` and Spark's ``split`` both keep empty
      fields);
    - same shingle hash: md5 of the assembled ``"a b c"`` 3-gram
      string, first 4 bytes big-endian mod P — identical bytes,
      identical ``conv(substr(md5(s),1,8),16,10) % P`` value. Shingles
      are deduplicated per batch by ``pd.factorize`` and md5 runs only
      per DISTINCT shingle (duplicated corpora — the whole point of a
      dedup pipeline — amortize heavily), with a capped cross-batch
      dict on top (cap 2²⁰: past it new shingles still hash
      correctly, they just aren't remembered — an uncapped dict is a
      per-worker memory liability at 100×, measured on the
      word-salted replicas);
    - the 32 permutations run as vectorized numpy passes over the
      batch's FLAT hash array with one ``minimum.reduceat`` per
      permutation against the doc-boundary offsets (a ≤ 63 and
      h < 2³¹ keep a·h + b < 2³⁷ — no int64 overflow).

    At 100 TB this is the map-only signature stage ahead of the banded
    exchange: text never shuffles, and the per-doc cost is C-speed
    md5 + 32 reduceat passes instead of 32 interpreted
    ``array_min(transform(...))`` scans. Cached for the same
    multi-consumer reason as the spec form."""
    import hashlib

    import numpy as np

    p = _P
    perms = [_perm(i) for i in range(_K_PERM)]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cache_cap = 1 << 20
        cache: dict[str, int] = {}

        for pdf in batches:
            ids, shingle_lists = [], []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                w = text.split(" ")
                if len(w) < 3:
                    continue
                ids.append(doc_id)
                shingle_lists.append(
                    [
                        a + " " + b + " " + c
                        for a, b, c in zip(w, w[1:], w[2:])
                    ]
                )
            if not ids:
                continue
            lens = np.fromiter(
                (len(s) for s in shingle_lists),
                dtype=np.int64,
                count=len(shingle_lists),
            )
            flat = np.empty(int(lens.sum()), dtype=object)
            pos = 0
            for s in shingle_lists:
                flat[pos : pos + len(s)] = s
                pos += len(s)
            codes, uniques = pd.factorize(flat, sort=False)
            uh = np.empty(len(uniques), dtype=np.int64)
            room = len(cache) < cache_cap
            for i, s in enumerate(uniques):
                h = cache.get(s)
                if h is None:
                    h = (
                        int.from_bytes(
                            hashlib.md5(s.encode("utf-8")).digest()[:4], "big"
                        )
                        % p
                    )
                    if room:
                        cache[s] = h
                uh[i] = h
            arr = uh[codes]
            starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
            sig = np.empty((len(ids), _K_PERM), dtype=np.int64)
            for i, (a, b) in enumerate(perms):
                sig[:, i] = np.minimum.reduceat((a * arr + b) % p, starts)
            yield pd.DataFrame(
                {
                    "doc_id": np.asarray(ids, dtype=np.int64),
                    "sig": list(sig),
                }
            )

    return docs.mapInPandas(run, "doc_id long, sig array<long>").cache()


def lsh_band_buckets(sig_df: DataFrame) -> DataFrame:
    """Band the signature (8 bands × 4 rows) → (doc_id, band_id, band_hash)."""
    bands = F.array(
        *[
            F.struct(
                F.lit(j).alias("band_id"),
                F.md5(
                    F.expr(
                        f"array_join(transform(slice(sig, {4 * j + 1}, 4), "
                        "x -> cast(x as string)), ',')"
                    )
                ).alias("bh"),
            )
            for j in range(_BANDS)
        ]
    )
    return sig_df.select("doc_id", F.explode(bands).alias("b")).select(
        "doc_id", F.col("b.band_id").alias("band_id"), F.col("b.bh").alias("bh")
    )


def minhash_pairs_ctes(source: str) -> str:
    """DuckDB CTE chain computing MinHash band pairs over ``source``
    (a CTE/table exposing doc_id, text). Appends CTEs tok/sh/hh/sig/
    bands/mh_pairs — reference `mh_pairs(doc_a, doc_b)` afterwards."""
    h = _H32_DUCK.format(s="s")
    mins = ", ".join(
        f"list_min(list_transform(harr, h -> ({a} * h + {b}) % {_P}))"
        for a, b in (_perm(i) for i in range(_K_PERM))
    )
    return f"""
tok AS (
  SELECT doc_id, string_split(text, ' ') AS words FROM {source}
),
sh AS (
  SELECT doc_id,
         list_transform(range(1, len(words) - 1),
                        i -> words[i] || ' ' || words[i+1] || ' ' || words[i+2]) AS shingles
  FROM tok WHERE len(words) >= 3
),
hh AS (
  SELECT doc_id, list_transform(shingles, s -> {h}) AS harr FROM sh
),
sig AS (
  SELECT doc_id, [{mins}] AS sig FROM hh
),
bands AS (
  SELECT doc_id, r.range AS band_id,
         md5(array_to_string(sig[r.range * 4 + 1 : r.range * 4 + 4], ',')) AS bh
  FROM sig, range(0, {_BANDS}) r
),
mh_pairs AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b
    ON a.band_id = b.band_id AND a.bh = b.bh AND a.doc_id < b.doc_id
)"""


def _minhash_oracle() -> str:
    return f"""
WITH {_docs2_sql(10, _NEAR_TAIL)},
{minhash_pairs_ctes('docs2')}
SELECT doc_a, doc_b FROM mh_pairs
"""


def minhash_pairs(docs: DataFrame) -> DataFrame:
    """(doc_a, doc_b) near-dup candidate pairs for any (doc_id, text) df."""
    buckets = lsh_band_buckets(minhash_signature(docs))
    a, b = buckets.alias("a"), buckets.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.bh") == F.col("b.bh"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )


@register("dedup_minhash", oracle=_minhash_oracle(), headline=True)
def dedup_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH near-duplicate candidate pairs.

    shingle → 31-bit md5 hash → 32 minhash perms → 8 bands → bucket
    self-join. Deterministic md5-based hashing makes this probabilistic
    operator exactly reproducible (the DuckDB oracle computes identical
    signatures)."""
    docs = _docs_with_dups(spark, sf_dir, every=10, tail=_NEAR_TAIL)
    return minhash_pairs(docs)


# ------------------------------------------------------------- dedup_clusters

def _clusters_oracle() -> str:
    pairs_sql = _minhash_oracle().strip()
    return f"""
WITH RECURSIVE pairs AS (
{pairs_sql}
),
edges AS (
  SELECT doc_a AS a, doc_b AS b FROM pairs
  UNION
  SELECT doc_b AS a, doc_a AS b FROM pairs
),
reach(node, r) AS (
  SELECT DISTINCT a, a FROM edges
  UNION
  SELECT e.a, reach.r FROM edges e JOIN reach ON e.b = reach.node
)
SELECT node AS doc_id, CAST(MIN(r) AS BIGINT) AS cluster_id
FROM reach GROUP BY node
"""


def connected_components(
    edges: DataFrame, max_rounds: int = 50
) -> tuple[DataFrame, int]:
    """Distributed connected components: label every node with its
    component's minimum node id. ``edges`` is (src, dst), treated as
    undirected. Returns (labels, rounds_used).

    Min-label propagation with pointer halving: each round takes the
    min over neighbors' labels AND jumps one hop through the label
    table (label-of-label), so label information travels ~2× farther
    per round — O(log diameter) rounds instead of O(diameter), the
    difference between ~8 and ~200 shuffles on a long chain. Labels
    stay distributed throughout; the driver loop only reads a scalar
    convergence count per round."""
    sym = (
        edges.select("src", "dst")
        .unionAll(edges.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .distinct()
        .cache()
    )

    def _free_checkpoint(df: DataFrame) -> None:
        """Eagerly drop a superseded localCheckpoint's block storage.

        Dataset.unpersist only clears CacheManager entries; a local
        checkpoint's RDD blocks otherwise wait for Python GC +
        ContextCleaner, so storage accumulates across rounds on large
        graphs. The checkpointed RDD is reachable through the LogicalRDD
        plan node — unpersist it directly; if the internal accessor ever
        moves, fall back to the GC path (correctness is unaffected)."""
        try:
            df._jdf.queryExecution().analyzed().rdd().unpersist(False)
        except Exception:
            pass
    # localCheckpoint (not cache) each round: the halving self-join
    # references the round's frame twice, so without lineage truncation
    # the logical plan doubles per round and Catalyst analysis goes
    # exponential. Checkpointing keeps every round's plan constant-size.
    # (On a cluster with flaky executors, swap for reliable checkpoint.)
    #
    # Fused init (r16): with lbl = node, round 1's neighbor-min join is
    # an identity lookup — min over neighbors of lbl(dst) is just
    # min(dst) — so seed labels directly as least(node, min neighbor)
    # from ONE aggregation over sym. That replaces the init distinct
    # exchange AND round 1's corpus-label join with a single groupBy;
    # the fixpoint (component-min labels) is unchanged, it just arrives
    # one propagation round earlier.
    labels = (
        sym.groupBy("src")
        .agg(F.least(F.col("src"), F.min("dst")).alias("lbl"))
        .select(F.col("src").alias("node"), "lbl")
        .localCheckpoint(eager=True)
    )
    labels_ckpt = labels
    rounds = 0
    for _ in range(max_rounds):
        rounds += 1
        prop = (
            sym.join(labels, sym.dst == labels.node)
            .groupBy("src")
            .agg(F.min("lbl").alias("nlbl"))
        )
        # lbl0 (the round's starting label) rides along so convergence
        # is a narrow filter+count over the checkpointed frame instead
        # of a label-table self-join — one fewer shuffle job per round
        # (r16; labels are monotone non-increasing, so lbl != lbl0 is
        # exactly "changed this round").
        cand = (
            labels.join(prop, labels.node == prop.src, "left")
            .select(
                "node",
                F.col("lbl").alias("lbl0"),
                F.least(F.col("lbl"), F.coalesce(F.col("nlbl"), F.col("lbl"))).alias(
                    "lbl"
                ),
            )
            .localCheckpoint(eager=True)
        )
        # pointer halving: follow node → lbl → lbl(lbl). A label is
        # always a node id in the same component, so the jump is safe
        # and monotone (labels only ever decrease).
        hop = cand.select(F.col("node").alias("h_node"), F.col("lbl").alias("h_lbl"))
        new_full = (
            cand.join(hop, cand.lbl == F.col("h_node"), "left")
            .select(
                "node",
                "lbl0",
                F.least(F.col("lbl"), F.coalesce(F.col("h_lbl"), F.col("lbl"))).alias(
                    "lbl"
                ),
            )
            .localCheckpoint(eager=True)
        )
        changed = new_full.filter(F.col("lbl") != F.col("lbl0")).count()
        # new_full is materialized and the convergence check is done:
        # this round's intermediate (cand) and the previous round's
        # labels are dead — free their checkpoint blocks now.
        _free_checkpoint(cand)
        _free_checkpoint(labels_ckpt)
        labels = new_full.select("node", "lbl")
        labels_ckpt = new_full
        if changed == 0:
            break
    sym.unpersist()
    return labels, rounds


@register("dedup_clusters", oracle=_clusters_oracle())
def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components over the MinHash near-dup pairs: every doc in
    a duplicate cluster labeled with the cluster's minimum doc_id (the
    canonical representative to keep). See ``connected_components`` for
    the O(log diameter) propagation scheme."""
    docs = _docs_with_dups(spark, sf_dir, every=10, tail=_NEAR_TAIL)
    pairs = minhash_pairs(docs)
    edges = pairs.select(
        F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
    )
    labels, _ = connected_components(edges)
    return labels.select(
        F.col("node").alias("doc_id"), F.col("lbl").alias("cluster_id")
    )


# ------------------------------------------------------------ dedup_keep_best

def _keep_best_oracle() -> str:
    pairs_sql = _minhash_oracle().strip()
    return f"""
WITH RECURSIVE pairs AS (
{pairs_sql}
),
edges AS (
  SELECT doc_a AS a, doc_b AS b FROM pairs
  UNION
  SELECT doc_b AS a, doc_a AS b FROM pairs
),
reach(node, r) AS (
  SELECT DISTINCT a, a FROM edges
  UNION
  SELECT e.a, reach.r FROM edges e JOIN reach ON e.b = reach.node
),
labels AS (
  SELECT node AS doc_id, MIN(r) AS cluster_id FROM reach GROUP BY node
),
d AS (
  WITH {_docs2_sql(10, _NEAR_TAIL)}
  SELECT doc_id, len(string_split(text, ' ')) AS n_words FROM docs2
),
lab AS (
  SELECT d.doc_id, COALESCE(l.cluster_id, d.doc_id) AS cluster_id,
         d.n_words
  FROM d LEFT JOIN labels l ON d.doc_id = l.doc_id
),
rn AS (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY cluster_id ORDER BY n_words DESC, doc_id
  ) AS pick
  FROM lab
)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(cluster_id AS BIGINT) AS cluster_id,
       CAST(n_words AS BIGINT) AS n_words,
       pick = 1 AS keep
FROM rn
"""


@register("dedup_keep_best", oracle=_keep_best_oracle())
def dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The APPLY step of near-dup dedup — the decision a pipeline
    actually ships: every doc labeled with its cluster and a keep
    flag. ``dedup_clusters`` names the groups; this picks ONE keeper
    per cluster — the longest doc (the standard keep-the-superset
    heuristic for near-dups, since tails/truncations lose to their
    source), doc_id ascending as the deterministic tie-break — and
    marks everything else droppable. Docs in no cluster are their own
    singleton (cluster_id = doc_id, kept).

    Scale shape: the cluster labels come from the O(log diameter)
    pointer-halving CC (scalar exchanges only); the keeper choice is
    one window over cluster_id — partitions are CLUSTER-sized (dup
    groups, not the corpus), so no unbounded window; the doc length
    is computed in-scan and text never shuffles. Output is the full
    doc list with (cluster_id, n_words, keep) scalars."""
    docs = _docs_with_dups(spark, sf_dir, every=10, tail=_NEAR_TAIL)
    pairs = minhash_pairs(docs)
    labels, _ = connected_components(
        pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
    )
    scored = docs.select(
        "doc_id", F.size(F.split("text", " ")).cast("bigint").alias("n_words")
    )
    lab = (
        scored.join(
            labels.select(
                F.col("node").alias("doc_id"), F.col("lbl").alias("cl")
            ),
            "doc_id",
            "left",
        )
        .select(
            "doc_id",
            F.coalesce("cl", F.col("doc_id")).alias("cluster_id"),
            "n_words",
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy("cluster_id").orderBy(
        F.col("n_words").desc(), F.col("doc_id")
    )
    return lab.select(
        "doc_id",
        "cluster_id",
        "n_words",
        (F.row_number().over(w) == 1).alias("keep"),
    )


# ------------------------------------------------------------ ngram_jaccard

_JACCARD_ORACLE = f"""
WITH {_docs2_sql(10, _NEAR_TAIL)},
pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         list_distinct(string_split(a.text, ' ')) AS wa,
         list_distinct(string_split(b.text, ' ')) AS wb
  FROM docs2 a JOIN docs2 b ON b.doc_id = a.doc_id + 1000000
)
SELECT doc_a, doc_b,
       CAST(len(list_intersect(wa, wb)) AS DOUBLE)
         / (len(wa) + len(wb) - len(list_intersect(wa, wb))) AS jaccard
FROM pairs
"""


@register("ngram_jaccard", oracle=_JACCARD_ORACLE)
def ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact token-set Jaccard for candidate pairs, computed with array
    intrinsics on the pair row — no token explosion, no extra shuffle.
    (In production the pair list comes from dedup_minhash's buckets.)"""
    docs = _docs_with_dups(spark, sf_dir, every=10, tail=_NEAR_TAIL)
    a = docs.select(
        F.col("doc_id").alias("doc_a"),
        F.array_distinct(F.split("text", " ")).alias("wa"),
    )
    b = docs.select(
        F.col("doc_id").alias("doc_b"),
        F.array_distinct(F.split("text", " ")).alias("wb"),
    )
    inter = F.size(F.array_intersect("wa", "wb"))
    union = F.size("wa") + F.size("wb") - inter
    return (
        a.join(b, F.col("doc_b") == F.col("doc_a") + 1_000_000)
        .select(
            "doc_a",
            "doc_b",
            (inter.cast("double") / union).alias("jaccard"),
        )
    )


# --------------------------------------------------------------- dedup_simhash

_SIM_BITS = 32


def _simhash_terms_spark() -> str:
    terms = " + ".join(
        f"(CASE WHEN 2 * size(filter(harr, h -> ((h >> {j}) & 1) = 1)) - size(harr) > 0 "
        f"THEN {1 << j}L ELSE 0L END)"
        for j in range(_SIM_BITS)
    )
    return terms


def _simhash_terms_duck() -> str:
    return " + ".join(
        f"(CASE WHEN 2 * len(list_filter(harr, h -> ((h >> {j}) & 1) = 1)) - len(harr) > 0 "
        f"THEN {1 << j} ELSE 0 END)"
        for j in range(_SIM_BITS)
    )


_SIMHASH_ORACLE = f"""
WITH {_docs2_sql(10, _NEAR_TAIL)},
tok AS (
  SELECT doc_id,
         list_transform(string_split(text, ' '), s -> {_H32_DUCK.format(s='s')}) AS harr
  FROM docs2
)
SELECT doc_id,
       CAST({_simhash_terms_duck()} AS BIGINT) AS simhash,
       CAST(({_simhash_terms_duck()}) // 16777216 AS BIGINT) AS bucket
FROM tok
"""


@register("dedup_simhash", oracle=_SIMHASH_ORACLE)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """32-bit SimHash per document (word-frequency weighted ±1 votes per
    bit), plus a high-8-bit bucket for hamming-neighborhood blocking.
    Pure bit arithmetic over the hash array — single scan, no shuffle."""
    docs = _docs_with_dups(spark, sf_dir, every=10, tail=_NEAR_TAIL)
    harr = F.expr(
        "transform(split(text, ' '), s -> " + _H32_SPARK.format(s="s") + ")"
    )
    # Cache barrier: the 32 per-bit vote expressions each reference harr;
    # without materialization Catalyst inlines the md5 array 64 times.
    hh = docs.select("doc_id", harr.alias("harr")).cache()
    sim = F.expr(_simhash_terms_spark())
    return hh.select(
        "doc_id",
        sim.alias("simhash"),
        (sim / F.lit(16_777_216)).cast("bigint").alias("bucket"),
    )


# --------------------------------------------------------- minhash_jaccard_est

def _jaccard_est_oracle() -> str:
    return f"""
WITH {_docs2_sql(10, _NEAR_TAIL)},
{minhash_pairs_ctes('docs2')},
shset AS (
  SELECT doc_id, list_distinct(shingles) AS ds FROM sh
),
paired AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, sa.sig AS siga, sb.sig AS sigb,
         da.ds AS dsa, db.ds AS dsb
  FROM docs2 a
  JOIN docs2 b ON b.doc_id = a.doc_id + 1000000
  JOIN sig sa ON sa.doc_id = a.doc_id
  JOIN sig sb ON sb.doc_id = b.doc_id
  JOIN shset da ON da.doc_id = a.doc_id
  JOIN shset db ON db.doc_id = b.doc_id
)
SELECT doc_a, doc_b,
       len(list_filter(range(1, {_K_PERM} + 1), i -> siga[i] = sigb[i]))
         / {_K_PERM} AS jaccard_est,
       CAST(len(list_intersect(dsa, dsb)) AS DOUBLE)
         / (len(dsa) + len(dsb) - len(list_intersect(dsa, dsb))) AS jaccard_exact
FROM paired
"""


@register("minhash_jaccard_est", oracle=_jaccard_est_oracle())
def minhash_jaccard_est(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch accuracy, observable: the MinHash signature-agreement
    estimate of Jaccard similarity next to the exact shingle-set value
    for each planted near-dup pair. At 100 TB the estimate costs a
    32-long comparison per pair instead of touching documents at all."""
    docs = _docs_with_dups(spark, sf_dir, every=10, tail=_NEAR_TAIL)
    sig = minhash_signature(docs)
    shingles = docs.filter(F.size(F.split("text", " ")) >= 3).select(
        "doc_id", F.expr(f"array_distinct({_SHINGLES_EXPR})").alias("ds")
    )
    a = sig.select(F.col("doc_id").alias("doc_a"), F.col("sig").alias("siga")).join(
        shingles.select(F.col("doc_id").alias("sa_id"), F.col("ds").alias("dsa")),
        F.col("doc_a") == F.col("sa_id"),
    )
    b = sig.select(F.col("doc_id").alias("doc_b"), F.col("sig").alias("sigb")).join(
        shingles.select(F.col("doc_id").alias("sb_id"), F.col("ds").alias("dsb")),
        F.col("doc_b") == F.col("sb_id"),
    )
    paired = a.join(b, F.col("doc_b") == F.col("doc_a") + 1_000_000)
    est = F.expr(
        f"size(filter(sequence(1, {_K_PERM}), i -> element_at(siga, i) = element_at(sigb, i)))"
    ) / F.lit(_K_PERM)
    inter = F.size(F.array_intersect("dsa", "dsb"))
    exact = inter.cast("double") / (F.size("dsa") + F.size("dsb") - inter)
    return paired.select(
        "doc_a",
        "doc_b",
        est.alias("jaccard_est"),
        exact.alias("jaccard_exact"),
    )


# -------------------------------------------------------------- simhash_pairs

_SIMPAIRS_ORACLE = f"""
WITH {_docs2_sql(10, _NEAR_TAIL)},
tok AS (
  SELECT doc_id,
         list_transform(string_split(text, ' '), s -> {_H32_DUCK.format(s='s')}) AS harr
  FROM docs2
),
sh AS (
  SELECT doc_id, CAST({_simhash_terms_duck()} AS BIGINT) AS simhash FROM tok
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(bit_count(xor(a.simhash, b.simhash)) AS INTEGER) AS hamming
FROM sh a JOIN sh b
  ON a.simhash // 16777216 = b.simhash // 16777216 AND a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= 6
"""


@register("simhash_pairs", oracle=_SIMPAIRS_ORACLE)
def simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup matching: candidates share the high-8-bit bucket
    (blocking), confirmed by hamming distance ≤ 6 on the full 32-bit
    hash. The self-join is bucket-local — the quadratic blowup a direct
    hamming join would cost never materializes."""
    # Materialize the (doc_id, simhash, bucket) scalars once: the
    # self-join consumes the corpus-sized simhash computation on BOTH
    # sides, and without the truncation each side re-embeds the full
    # tokenize+hash subtree (4.1s -> 1.3s at sf0.1; the r15
    # domain_pagerank lesson — AQE stage reuse is partial, a
    # materialized scalar table is guaranteed).
    sims = (
        dedup_simhash(spark, sf_dir)
        .select("doc_id", "simhash", "bucket")
        .localCheckpoint(eager=True)
    )
    a, b = sims.alias("a"), sims.alias("b")
    hamming = F.bit_count(
        F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
    ).cast("int")
    return (
        a.join(
            b,
            (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            hamming.alias("hamming"),
        )
        .filter(F.col("hamming") <= 6)
    )


# ------------------------------------------------------- minhash_containment

_FRAG_WORDS = 24


def _containment_corpus_sql() -> str:
    return f"""
corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 3000000 AS doc_id,
         array_to_string((string_split(text, ' '))[1:{_FRAG_WORDS}], ' ') AS text
  FROM documents WHERE doc_id % 7 = 0
  UNION ALL
  SELECT doc_id + 4000000 AS doc_id,
         text || ' ' ||
         array_to_string((string_split(text, ' '))[1:{_FRAG_WORDS}], ' ') AS text
  FROM documents WHERE doc_id % 7 = 0
)"""


def _containment_oracle() -> str:
    return f"""
WITH {_containment_corpus_sql()},
{minhash_pairs_ctes('corpus')},
hd AS (
  SELECT doc_id, list_distinct(harr) AS hd FROM hh
)
SELECT p.doc_a, p.doc_b,
       ROUND(CAST(len(list_intersect(a.hd, b.hd)) AS DOUBLE)
             / len(b.hd), 6) AS cont_b_in_a,
       ROUND(CAST(len(list_intersect(a.hd, b.hd)) AS DOUBLE)
             / len(a.hd), 6) AS cont_a_in_b
FROM mh_pairs p
JOIN hd a ON a.doc_id = p.doc_a
JOIN hd b ON b.doc_id = p.doc_b
WHERE CAST(len(list_intersect(a.hd, b.hd)) AS DOUBLE)
      / least(len(a.hd), len(b.hd)) >= 0.5
"""


@register("minhash_containment", oracle=_containment_oracle())
def minhash_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric containment detection: is one document's shingle set
    mostly INSIDE another's? Jaccard misses verbatim inclusion — a
    24-word quote inside a 300-word doc has low Jaccard but containment
    ≈ 1 — and inclusion (quotes, boilerplate, licence blocks) is what a
    pretraining dedup pass actually needs to find.

    Scale shape: candidate pairs come from the MinHash band buckets
    (bounded by LSH, never all-pairs); the exact containment re-check
    joins the 31-bit shingle-hash ARRAYS by doc id — the compressed
    representation rides the join, never the text. Synthesis plants
    real containment: doc_id % 7 docs contribute a leading fragment
    (id+3M) and a container with that fragment appended (id+4M)."""
    t = load_tables(spark, sf_dir)
    base = t.documents.select("doc_id", "text")
    # single-scan 3-layer synthesis (r16, guide §6 — see dedup_pipeline):
    # base row + leading fragment (+3M) + container with the fragment
    # appended (+4M), both planted on %7 docs, from ONE documents scan
    frag_sql = f"array_join(slice(split(text, ' '), 1, {_FRAG_WORDS}), ' ')"
    corpus = base.select(
        F.explode(
            F.expr(
                f"filter(array(struct(doc_id, text), "
                f"struct(doc_id + 3000000L as doc_id, {frag_sql} as text), "
                f"struct(doc_id + 4000000L as doc_id,"
                f" concat(text, ' ', {frag_sql}) as text)), "
                f"(x, i) -> i = 0 or doc_id % 7 = 0)"
            )
        ).alias("r")
    ).select("r.doc_id", "r.text")
    pairs = minhash_pairs(corpus)
    hd = hashed_shingles(corpus).select(
        "doc_id", F.array_distinct("harr").alias("hd")
    )
    a = hd.select(F.col("doc_id").alias("doc_a"), F.col("hd").alias("ha"))
    b = hd.select(F.col("doc_id").alias("doc_b"), F.col("hd").alias("hb"))
    inter = F.size(F.array_intersect("ha", "hb")).cast("double")
    return (
        pairs.join(a, "doc_a")
        .join(b, "doc_b")
        .filter(inter / F.least(F.size("ha"), F.size("hb")) >= 0.5)
        .select(
            "doc_a",
            "doc_b",
            F.round(inter / F.size("hb"), 6).alias("cont_b_in_a"),
            F.round(inter / F.size("ha"), 6).alias("cont_a_in_b"),
        )
    )


# ----------------------------------------------------------------- dedup_cross

_CROSS_ORACLE = """
WITH ref AS (
  SELECT DISTINCT md5(text) AS h FROM documents WHERE doc_id % 4 = 0
),
tr AS (
  SELECT doc_id, source, md5(text) AS h FROM documents
)
SELECT tr.source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN r.h IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       CAST(SUM(CASE WHEN r.h IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_removed
FROM tr LEFT JOIN ref r ON tr.h = r.h
GROUP BY tr.source
"""


@register("dedup_cross", oracle=_CROSS_ORACLE)
def dedup_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-corpus exact deduplication: remove from the training corpus
    every document whose exact text already exists in a reference corpus
    (an earlier crawl epoch, a licensed set that must not be re-counted,
    or a benchmark suite) — the doc-level complement of the n-gram-level
    ``decontaminate``. The reference corpus here is the ``doc_id % 4``
    slice of the documents table standing in for the external set; the
    production form is identical with the second corpus read from its
    own path.

    Scale shape: both sides reduce to md5(text) scalars inside their
    scans, so the join exchanges carry (16-byte hash, id, source) only —
    the text column never shuffles. The reference side is
    pre-``distinct``-ed (its own map-side partial), and the join is a
    plain hash join AQE converts to broadcast when the reference corpus
    fits and to a shuffle join when it does not; the removal decision is
    the NULL-ness of the matched hash, so kept-rows output is a filter
    on the same plan (the audit here aggregates per source instead to
    keep the result bounded)."""
    t = load_tables(spark, sf_dir)
    ref = (
        t.documents.filter(F.col("doc_id") % 4 == 0)
        .select(F.md5("text").alias("h"))
        .distinct()
        .withColumn("matched", F.lit(1))
    )
    tr = t.documents.select("doc_id", "source", F.md5("text").alias("h"))
    return (
        tr.join(ref, "h", "left")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.when(F.col("matched").isNull(), 1).otherwise(0)).alias(
                "n_kept"
            ),
            F.sum(F.when(F.col("matched").isNotNull(), 1).otherwise(0)).alias(
                "n_removed"
            ),
        )
    )


# --------------------------------------------------------- dup_ngram_fraction

_DUPFRAC_N = 8

_DUPFRAC_ORACLE = f"""
WITH docs2 AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 1000000 AS doc_id,
         array_to_string(list_slice(string_split(text, ' '), 5, 40), ' ')
           AS text
  FROM documents WHERE doc_id % 5 = 0
),
tok AS (
  SELECT doc_id, string_split(text, ' ') AS words FROM docs2
),
sh AS (
  SELECT DISTINCT doc_id,
         md5(array_to_string(
           list_slice(words, s, s + {_DUPFRAC_N - 1}), ' ')) AS h
  FROM tok, UNNEST(range(1, len(words) - {_DUPFRAC_N - 2})) AS u(s)
  WHERE len(words) >= {_DUPFRAC_N}
),
df AS (
  SELECT h, COUNT(*) AS d FROM sh GROUP BY h
)
SELECT sh.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_shingles,
       CAST(SUM(CASE WHEN df.d >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup,
       CAST((1000 * SUM(CASE WHEN df.d >= 2 THEN 1 ELSE 0 END)) // COUNT(*)
         AS BIGINT) AS dup_permille
FROM sh JOIN df ON sh.h = df.h
GROUP BY sh.doc_id
"""


@register("dup_ngram_fraction", oracle=_DUPFRAC_ORACLE)
def dup_ngram_fraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document duplicated-n-gram fraction: the permille of a doc's
    distinct word 8-grams that also occur in at least one OTHER document
    — the corpus-internal memorization-risk metric from the training-data
    dedup literature (the doc-level signal behind substring-level dedup),
    where ``decontaminate`` measures train-vs-eval overlap this measures
    train-vs-train. Synthetic overlap: every fifth doc contributes a
    36-word excerpt clone (doc_id + 1e6) so the metric has mass to find.

    Scale shape: shingles are built inside the scan (one ``transform``
    over index positions, each an O(n)-total slice of the already-split
    word array) and immediately reduced to md5 scalars + per-doc
    ``distinct``, so the only exchanges carry (doc_id, 16-byte hash)
    pairs. Global shingle frequency is one partial-agg shuffle on the
    hash; the per-doc rollup joins the tiny (hash, count≥2) flag back on
    the same key — text never leaves the scan. Since a distinct 8-gram
    occurs once per doc, COUNT(*) per hash IS the distinct-doc count (no
    count_distinct partials needed). The distinct (doc_id, hash) set is
    cached — the frequency side and the rollup side both consume it, and
    without the cache Catalyst re-runs the shingle explode per consumer
    (the same 2× recompute ``hashed_shingles`` caches against)."""
    t = load_tables(spark, sf_dir)
    base = t.documents.select("doc_id", "text")
    docs2 = base.unionAll(
        base.filter(F.col("doc_id") % 5 == 0).select(
            (F.col("doc_id") + 1_000_000).alias("doc_id"),
            F.array_join(
                F.slice(F.split("text", " "), 5, 36), " "
            ).alias("text"),
        )
    )
    n = _DUPFRAC_N
    sh = (
        docs2.select("doc_id", F.split("text", " ").alias("w"))
        .filter(F.size("w") >= n)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    f"transform(sequence(1, size(w) - {n - 1}),"
                    f" i -> md5(array_join(slice(w, i, {n}), ' ')))"
                )
            ).alias("h"),
        )
        .distinct()
        .cache()
    )
    freq = sh.groupBy("h").agg(F.count(F.lit(1)).alias("d"))
    return (
        sh.join(freq, "h")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.sum(F.when(F.col("d") >= 2, 1).otherwise(0)).alias("n_dup"),
        )
        .select(
            "doc_id",
            "n_shingles",
            "n_dup",
            F.expr("(1000 * n_dup) div n_shingles").alias("dup_permille"),
        )
    )


# ----------------------------------------------------- minhash_band_sensitivity

_BAND_SENS_ORACLE = f"""
WITH {_docs2_sql(10, _NEAR_TAIL)},
{minhash_pairs_ctes('docs2')},
bands2 AS (
  SELECT doc_id, r.range AS band_id,
         md5(array_to_string(sig[r.range * 2 + 1 : r.range * 2 + 2], ',')) AS bh
  FROM sig, range(0, 16) r
),
pairs2 AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands2 a JOIN bands2 b
    ON a.band_id = b.band_id AND a.bh = b.bh AND a.doc_id < b.doc_id
),
s1 AS (
  SELECT '8x4' AS config,
         CAST(COUNT(*) AS BIGINT) AS n_pairs,
         CAST((SELECT COUNT(DISTINCT d) FROM
               (SELECT doc_a AS d FROM mh_pairs
                UNION SELECT doc_b FROM mh_pairs)) AS BIGINT) AS n_docs
  FROM mh_pairs
),
s2 AS (
  SELECT '16x2' AS config,
         CAST(COUNT(*) AS BIGINT) AS n_pairs,
         CAST((SELECT COUNT(DISTINCT d) FROM
               (SELECT doc_a AS d FROM pairs2
                UNION SELECT doc_b FROM pairs2)) AS BIGINT) AS n_docs
  FROM pairs2
)
SELECT * FROM s1 UNION ALL SELECT * FROM s2
"""


def _band_pairs(sig_df: DataFrame, n_bands: int, rows: int) -> DataFrame:
    """(doc_a, doc_b) candidate pairs for an arbitrary banding of the
    32-slot signature."""
    bands = F.array(
        *[
            F.struct(
                F.lit(j).alias("band_id"),
                F.md5(
                    F.expr(
                        f"array_join(transform(slice(sig, {rows * j + 1}, {rows}), "
                        "x -> cast(x as string)), ',')"
                    )
                ).alias("bh"),
            )
            for j in range(n_bands)
        ]
    )
    buckets = sig_df.select("doc_id", F.explode(bands).alias("b")).select(
        "doc_id", F.col("b.band_id").alias("band_id"), F.col("b.bh").alias("bh")
    )
    a, b = buckets.alias("a"), buckets.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.bh") == F.col("b.bh"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )


def _pair_summary(pairs: DataFrame, label: str) -> DataFrame:
    # ONE pass over the candidate pairs (r16, guide §2.4): the old
    # count-crossJoin-countDistinct form referenced ``pairs`` three
    # times (count + doc_a branch + doc_b branch), re-executing the
    # bucket self-join + distinct per reference. Exploding each pair
    # into its two endpoints yields both metrics from a single
    # aggregation — every pair contributes exactly 2 rows, so
    # n_pairs = count(rows) div 2 exactly (integer, no rounding).
    return (
        pairs.select(F.explode(F.array("doc_a", "doc_b")).alias("d"))
        .agg(
            F.expr("count(1) div 2").alias("n_pairs"),
            F.countDistinct("d").alias("n_docs"),
        )
        .select(F.lit(label).alias("config"), "n_pairs", "n_docs")
    )


@register("minhash_band_sensitivity", oracle=_BAND_SENS_ORACLE)
def minhash_band_sensitivity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH S-curve audit: the SAME 32-permutation signatures banded two
    ways — 8 bands × 4 rows (the production default) vs 16 × 2 (the
    recall-heavy setting) — with candidate-pair and touched-doc counts
    side by side. This is the measurement that picks (b, r) for a
    corpus: collision probability is 1−(1−s^r)^b, so fewer rows per
    band slides the S-curve left (more candidates, more recall, more
    join work); the audit shows the actual candidate cost of that
    slide on this corpus before anyone re-runs the full dedup at the
    new setting.

    Scale shape: ONE signature computation (the cached stage both
    bandings read); each banding is the standard bucket self-join that
    exchanges (doc_id, band_id, 16-byte hash) triples only, and the
    audit aggregates are scalars. Work tracks candidate mass exactly
    like dedup_minhash — this query IS dedup_minhash's join run twice
    with different band slicing."""
    docs = _docs_with_dups(spark, sf_dir, every=10, tail=_NEAR_TAIL)
    sig = minhash_signature(docs)
    return _pair_summary(_band_pairs(sig, 8, 4), "8x4").unionAll(
        _pair_summary(_band_pairs(sig, 16, 2), "16x2")
    )


# ---------------------------------------------------- neardup_index_probe


def minhash_band_ctes(source: str, prefix: str) -> str:
    """DuckDB CTE chain computing LSH band buckets over ``source`` (a
    CTE/table exposing doc_id, text), with every CTE name prefixed so
    two instantiations can coexist in one query — reference
    ``<prefix>bands(doc_id, band_id, bh)`` afterwards. Arithmetic is
    identical to :func:`minhash_pairs_ctes` / the Spark helpers."""
    h = _H32_DUCK.format(s="s")
    mins = ", ".join(
        f"list_min(list_transform(harr, h -> ({a} * h + {b}) % {_P}))"
        for a, b in (_perm(i) for i in range(_K_PERM))
    )
    return f"""
{prefix}tok AS (
  SELECT doc_id, string_split(text, ' ') AS words FROM {source}
),
{prefix}sh AS (
  SELECT doc_id,
         list_transform(range(1, len(words) - 1),
                        i -> words[i] || ' ' || words[i+1] || ' ' || words[i+2]) AS shingles
  FROM {prefix}tok WHERE len(words) >= 3
),
{prefix}hh AS (
  SELECT doc_id, list_transform(shingles, s -> {h}) AS harr FROM {prefix}sh
),
{prefix}sig AS (
  SELECT doc_id, [{mins}] AS sig FROM {prefix}hh
),
{prefix}bands AS (
  SELECT doc_id, r.range AS band_id,
         md5(array_to_string(sig[r.range * 4 + 1 : r.range * 4 + 4], ',')) AS bh
  FROM {prefix}sig, range(0, {_BANDS}) r
)"""


# ------------------------------------------------------- winnowing (MOSS)

# Robust winnowing (Schleimer, Wilkerson, Aiken, SIGMOD 2003 — the MOSS
# fingerprinter): hash every k-gram, slide a w-wide window over the
# hash sequence, keep each window's MINIMUM. Guarantee: any two docs
# sharing a contiguous run of >= w + k - 1 tokens share at least one
# selected fingerprint — the detection floor is a tunable span length,
# unlike MinHash whose collision probability tracks whole-doc Jaccard.
# We emit min VALUES (not positions): the guarantee only needs the
# shared window to select the same hash, which a value-set preserves.
_WK = 4  # winnow k-gram length (words)
_WW = 5  # winnow window width (k-grams) -> guaranteed span = 8 words
_WB = 1_000_003  # polynomial base for the k-gram combine (mod _P)
_W_DF_CAP = 50  # drop fingerprints appearing in more docs (boilerplate)
_W_MIN_SHARED = 2  # report pairs sharing at least this many fingerprints


def winnow_fingerprints(docs: DataFrame, materialize: bool = False) -> DataFrame:
    """(doc_id, fp) — distinct winnowed fingerprints per doc.

    ``materialize=True`` additionally caches the exploded (doc_id, fp)
    scalar table — for consumers that reference it MORE than once (the
    df-cap aggregate + both sides of the pair self-join re-embed the
    whole fingerprint subtree otherwise, re-running the O(n·w)
    winnowing transform per reference). Single-pass consumers (index
    build/append/probe) leave it False and pay no cache write.

    k-gram hashes are a polynomial combine of per-WORD md5 hashes
    (base ``_WB`` mod ``_P``, products < 2⁵² — exact int64 on both
    engines, the decontaminate arithmetic), built as ``zip_with`` over
    k shifted slices — O(n) references, never a re-split per element.
    The k-gram array is CACHED before winnowing: the window transform
    references ``hk`` once per position, and project collapsing would
    otherwise inline (and recompute) the whole gram chain per window.
    Winnowing itself is ``array_min`` over ``slice(hk, j, w)`` —
    O(n·w) element references inside the scan, no explode until the
    final distinct fingerprint set."""
    n_kg = f"(size(hw) - {_WK - 1})"
    gram = f"slice(hw, 1, {n_kg})"
    for k in range(2, _WK + 1):
        gram = (
            f"zip_with({gram}, slice(hw, {k}, {n_kg}), "
            f"(g{k}, t{k}) -> (g{k} * {_WB} + t{k}) % {_P})"
        )
    hk_df = (
        docs.select("doc_id", F.split("text", " ").alias("w"))
        .filter(F.size("w") >= _WK + _WW - 1)
        .select(
            "doc_id",
            F.expr(f"transform(w, x -> {_H32_SPARK.format(s='x')})").alias("hw"),
        )
        .select("doc_id", F.expr(gram).alias("hk"))
        .cache()
    )
    fps = F.expr(
        f"array_distinct(transform(sequence(1, size(hk) - {_WW - 1}), "
        f"j -> array_min(slice(hk, j, {_WW}))))"
    )
    fp = hk_df.select("doc_id", F.explode(fps).alias("fp"))
    return fp.cache() if materialize else fp


def _winnow_poly_duck() -> str:
    e = "hw[i]"
    for k in range(1, _WK):
        e = f"(({e}) * {_WB} + hw[i+{k}]) % {_P}"
    return e


_WINNOW_ORACLE = f"""
WITH {_docs2_sql(10, _NEAR_TAIL)},
tw AS (
  SELECT doc_id,
         list_transform(string_split(text, ' '),
                        x -> {_H32_DUCK.format(s='x')}) AS hw
  FROM docs2
  WHERE len(string_split(text, ' ')) >= {_WK + _WW - 1}
),
kg AS (
  SELECT doc_id, list_transform(
    generate_series(1, len(hw) - {_WK - 1}),
    i -> {_winnow_poly_duck()}
  ) AS hk
  FROM tw
),
fp AS (
  SELECT DISTINCT doc_id, unnest(list_transform(
    generate_series(1, len(hk) - {_WW - 1}),
    j -> list_min(list_slice(hk, j, j + {_WW - 1}))
  )) AS fp
  FROM kg
),
keepfp AS (
  SELECT fp FROM fp GROUP BY fp HAVING COUNT(*) <= {_W_DF_CAP}
),
ff AS (SELECT f.doc_id, f.fp FROM fp f JOIN keepfp k ON f.fp = k.fp),
pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_shared
  FROM ff a JOIN ff b ON a.fp = b.fp AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
  HAVING COUNT(*) >= {_W_MIN_SHARED}
)
SELECT CAST(doc_a AS BIGINT) AS doc_a, CAST(doc_b AS BIGINT) AS doc_b,
       CAST(n_shared AS BIGINT) AS n_shared
FROM pairs
"""


@register("winnow_dup_spans", oracle=_WINNOW_ORACLE)
def winnow_dup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-substring near-dup detection via robust winnowing — the
    span-level complement to ``dedup_minhash``: two docs are reported
    iff they share >= ``_W_MIN_SHARED`` winnowed fingerprints, and the
    winnowing guarantee makes any shared run of >= w + k - 1 = 8 words
    detectable regardless of how different the rest of the docs are
    (whole-doc Jaccard can be ~0). This is the Spark-shaped stand-in
    for the suffix-array exact-substring pass of Lee et al. 2022
    ("Deduplicating Training Data Makes Language Models Better") —
    suffix arrays don't distribute, winnowing does.

    Scale shape: fingerprinting is in-scan (arrays, no UDF, no
    shuffle); only (doc_id, int64 fp) pairs ever exchange. The
    doc-frequency cap (<= 50 docs per fingerprint) drops
    boilerplate fingerprints BEFORE the pair join — the standard skew
    guard, bounding any fingerprint's pair fan-out at cap² instead of
    letting one hot phrase go quadratic. Candidate pairs are then
    grouped and thresholded, so the output exchange carries scalar
    triples. Text never shuffles."""
    docs = _docs_with_dups(spark, sf_dir, every=10, tail=_NEAR_TAIL)
    # materialized once: the df-cap agg and both self-join sides would
    # otherwise re-run the winnowing transform (guide §2.4)
    fp = winnow_fingerprints(docs, materialize=True)
    keep = (
        fp.groupBy("fp")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") <= _W_DF_CAP)
        .select("fp")
    )
    ff = fp.join(keep, "fp")
    return (
        ff.alias("a")
        .join(ff.alias("b"), "fp")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= _W_MIN_SHARED)
        .select("doc_a", "doc_b", "n_shared")
    )


# ---------------------------------------------------- persisted LSH index

def neardup_index_build(docs: DataFrame, index_dir: str) -> None:
    """One-time (or periodic) index build: persist the corpus' LSH band
    buckets — (doc_id, band_id, 16-byte band hash) triples, ~200 bytes
    per document regardless of text size — to a parquet table at
    ``index_dir`` (any Spark-readable URI; on a cluster a shared
    filesystem/object-store path). Text never leaves the scan stage."""
    lsh_band_buckets(minhash_signature(docs)).write.parquet(index_dir)


def neardup_index_append(new_docs: DataFrame, index_dir: str) -> None:
    """Complete the ingest loop: after a batch is screened (and the
    kept docs decided), append ITS band buckets to the index so the
    next batch screens against it too. Parquet append — no rewrite of
    existing index files; at 100 TB the index is partitioned by
    band_id so each append touches every band directory once."""
    lsh_band_buckets(minhash_signature(new_docs)).write.mode(
        "append"
    ).parquet(index_dir)


def neardup_index_candidates(
    spark: SparkSession, new_docs: DataFrame, index_dir: str
) -> DataFrame:
    """The recurring incremental run: band-bucket ONLY the new batch,
    join it against the persisted index read back from ``index_dir``
    (history is never re-sketched or re-read as text), and return one
    row per new doc: distinct indexed near-dup candidates + a matched
    flag. The join exchanges (id, band, 16-byte hash) triples; a
    production ingest drops (or routes to review) the matched docs."""
    probe = lsh_band_buckets(minhash_signature(new_docs))
    index = spark.read.parquet(index_dir)
    hits = (
        probe.join(
            index.select(
                F.col("doc_id").alias("idx_id"),
                "band_id",
                F.col("bh"),
            ),
            ["band_id", "bh"],
        )
        .groupBy("doc_id")
        .agg(F.count_distinct("idx_id").alias("n_candidates"))
    )
    return (
        new_docs.filter(F.size(F.split("text", " ")) >= 3)
        .select("doc_id")
        .join(hits, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_candidates", F.lit(0)).cast("bigint").alias(
                "n_candidates"
            ),
            (F.coalesce("n_candidates", F.lit(0)) > 0).alias("matched"),
        )
    )


_IDX_PROBE_ORACLE = f"""
WITH probe_src AS (
  SELECT doc_id + 1000000 AS doc_id, text || '{_NEAR_TAIL}' AS text
  FROM documents WHERE doc_id % 10 = 0
),
{minhash_band_ctes('documents', 'i_')[1:]},
{minhash_band_ctes('probe_src', 'p_')[1:]},
ov AS (
  SELECT p.doc_id, COUNT(DISTINCT i.doc_id) AS n_candidates
  FROM p_bands p JOIN i_bands i
    ON p.band_id = i.band_id AND p.bh = i.bh
  GROUP BY p.doc_id
)
SELECT s.doc_id,
       CAST(COALESCE(ov.n_candidates, 0) AS BIGINT) AS n_candidates,
       COALESCE(ov.n_candidates, 0) > 0 AS matched
FROM (SELECT doc_id FROM probe_src
      WHERE len(string_split(text, ' ')) >= 3) s
LEFT JOIN ov ON s.doc_id = ov.doc_id
"""


@register("neardup_index_probe", oracle=_IDX_PROBE_ORACLE)
def neardup_index_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental near-dup screening against a PERSISTED LSH index —
    the production shape of ``dedup_minhash`` for a corpus that grows:
    the accumulated corpus' band buckets live in a parquet state table
    (built once, appended per ingest); each new batch is sketched
    alone and bucket-joined against the index, so ingest cost tracks
    the BATCH size, never the corpus. This is the batch face of
    ``neardup_incremental`` (streaming/neardup.py) — same index
    layout, same join, micro-batch loop replaced by one probe.

    Here the index half is the full documents table and the probe
    batch is the familiar near-dup injection (every-10th doc re-issued
    with a tail under a new id), so every probe doc has a true indexed
    near-dup to find and the oracle can assert exact candidate counts.

    Scale shape: index entries are (id, band, 16-byte hash) — ~200
    bytes/doc, so a 100 TB corpus indexes in ~100s of GB, partitionable
    by band; the probe join shuffles only the batch's triples (AQE
    broadcasts them when the batch is small); candidate counts are
    band-collision-bounded exactly as in dedup_minhash. Text never
    leaves either scan.

    Demo-harness caveat (mirrors ``hll_persist_incremental``): the
    registered query wires ``index_dir`` to a driver-local tempdir and
    builds the index eagerly at plan-construction; real deployments
    call ``neardup_index_build``/``neardup_index_candidates`` with a
    shared URI, so a bench row times the PROBE, which is the recurring
    cost."""
    import os
    import shutil
    import tempfile

    t = load_tables(spark, sf_dir)
    base = t.documents.select("doc_id", "text")
    new_batch = base.filter(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(_NEAR_TAIL)).alias("text"),
    )
    work = tempfile.mkdtemp(prefix="lsh_index_")
    index_dir = os.path.join(work, "band_index")
    neardup_index_build(base, index_dir)
    out = neardup_index_candidates(spark, new_batch, index_dir).localCheckpoint(
        eager=True
    )
    shutil.rmtree(work, ignore_errors=True)
    return out


# ------------------------------------------------- persisted winnow index

def winnow_index_build(docs: DataFrame, index_dir: str) -> None:
    """Persist the corpus' winnowed fingerprints as the span-level
    dedup index — the ``neardup_index_build`` pattern for
    ``winnow_dup_spans``: (doc_id, int64 fp) pairs in parquet,
    partitionable by fp range at 100 TB."""
    winnow_fingerprints(docs).write.parquet(index_dir)


def winnow_index_append(new_docs: DataFrame, index_dir: str) -> None:
    """Append a screened batch's fingerprints so later batches screen
    against it too — parquet append, no rewrite of existing files."""
    winnow_fingerprints(new_docs).write.mode("append").parquet(index_dir)


def winnow_index_candidates(
    spark: SparkSession, new_docs: DataFrame, index_dir: str
) -> DataFrame:
    """Screen a new batch against the persisted span index: fingerprint
    ONLY the batch, join the index on fp, and report per new doc how
    many indexed docs share >= ``_W_MIN_SHARED`` fingerprints (the
    winnow_dup_spans pair threshold). History is never re-read as
    text; the join exchanges (doc_id, int64) pairs. Production runs
    the ``_W_DF_CAP`` boilerplate cap as an index-maintenance job
    (drop over-frequent fps from the stored index); the demo index is
    small enough to skip it, which only ADDS candidates."""
    probe = winnow_fingerprints(new_docs)
    index = spark.read.parquet(index_dir).select(
        F.col("doc_id").alias("idx_id"), "fp"
    )
    shared = (
        probe.join(index, "fp")
        .groupBy("doc_id", "idx_id")
        .agg(F.count(F.lit(1)).alias("n_fp"))
        .filter(F.col("n_fp") >= _W_MIN_SHARED)
    )
    hits = shared.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_candidates")
    )
    return (
        new_docs.filter(F.size(F.split("text", " ")) >= _WK + _WW - 1)
        .select("doc_id")
        .join(hits, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_candidates", F.lit(0)).cast("bigint").alias(
                "n_candidates"
            ),
            (F.coalesce("n_candidates", F.lit(0)) > 0).alias("matched"),
        )
    )


def winnow_fp_ctes(source: str, prefix: str) -> str:
    """DuckDB CTE chain computing winnowed fingerprints over ``source``
    (a CTE/table exposing doc_id, text). Appends CTEs {p}tw/{p}kg/
    {p}fp — reference ``{p}fp(doc_id, fp)`` afterwards."""
    p = prefix
    return f"""
{p}tw AS (
  SELECT doc_id,
         list_transform(string_split(text, ' '),
                        x -> {_H32_DUCK.format(s='x')}) AS hw
  FROM {source}
  WHERE len(string_split(text, ' ')) >= {_WK + _WW - 1}
),
{p}kg AS (
  SELECT doc_id, list_transform(
    generate_series(1, len(hw) - {_WK - 1}),
    i -> {_winnow_poly_duck()}
  ) AS hk
  FROM {p}tw
),
{p}fp AS (
  SELECT DISTINCT doc_id, unnest(list_transform(
    generate_series(1, len(hk) - {_WW - 1}),
    j -> list_min(list_slice(hk, j, j + {_WW - 1}))
  )) AS fp
  FROM {p}kg
)"""


_WINNOW_IDX_ORACLE = f"""
WITH probe_src AS (
  SELECT doc_id + 1000000 AS doc_id, text || '{_NEAR_TAIL}' AS text
  FROM documents WHERE doc_id % 10 = 0
),
{winnow_fp_ctes('documents', 'i_')[1:]},
{winnow_fp_ctes('probe_src', 'p_')[1:]},
shared AS (
  SELECT p.doc_id, i.doc_id AS idx_id, COUNT(*) AS n_fp
  FROM p_fp p JOIN i_fp i ON p.fp = i.fp
  GROUP BY p.doc_id, i.doc_id
  HAVING COUNT(*) >= {_W_MIN_SHARED}
),
ov AS (
  SELECT doc_id, COUNT(*) AS n_candidates FROM shared GROUP BY doc_id
)
SELECT s.doc_id,
       CAST(COALESCE(ov.n_candidates, 0) AS BIGINT) AS n_candidates,
       COALESCE(ov.n_candidates, 0) > 0 AS matched
FROM (SELECT doc_id FROM probe_src
      WHERE len(string_split(text, ' ')) >= {_WK + _WW - 1}) s
LEFT JOIN ov ON s.doc_id = ov.doc_id
"""


@register("winnow_index_probe", oracle=_WINNOW_IDX_ORACLE)
def winnow_index_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental SPAN-level screening against a persisted winnow
    index — ``neardup_index_probe``'s exact pattern applied to
    ``winnow_dup_spans``' fingerprints: the corpus' fingerprints live
    in parquet; each ingest batch is fingerprinted alone and joined
    against them, so cost tracks the batch. The probe batch re-issues
    every 10th doc with a tail, so each probe shares its source's full
    span — every sufficiently-long probe MUST match (the winnowing
    guarantee, not LSH luck).

    Demo-harness caveat (mirrors ``neardup_index_probe``): index_dir
    is a driver-local tempdir built eagerly at plan construction;
    deployments call winnow_index_build/append/candidates with a
    shared URI."""
    import tempfile

    t = load_tables(spark, sf_dir)
    docs = t.documents.select("doc_id", "text")
    index_dir = tempfile.mkdtemp(prefix="winnow_idx_") + "/fp"
    winnow_index_build(docs, index_dir)
    probe = docs.filter(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"),
        F.concat("text", F.lit(_NEAR_TAIL)).alias("text"),
    )
    return winnow_index_candidates(spark, probe, index_dir)


# ------------------------------------------------------------ dedup_pipeline

def _dedup_pipeline_oracle() -> str:
    return f"""
WITH RECURSIVE docs3 AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 1000000 AS doc_id, text FROM documents
  WHERE doc_id % 4 = 0
  UNION ALL
  SELECT doc_id + 2000000 AS doc_id, text || '{_NEAR_TAIL}' AS text
  FROM documents WHERE doc_id % 10 = 0
),
surv AS (
  SELECT MIN(doc_id) AS doc_id, MIN(text) AS text
  FROM docs3 GROUP BY md5(text)
),
{minhash_pairs_ctes('surv')[1:]},
edges AS (
  SELECT doc_a AS a, doc_b AS b FROM mh_pairs
  UNION
  SELECT doc_b AS a, doc_a AS b FROM mh_pairs
),
reach(node, r) AS (
  SELECT DISTINCT a, a FROM edges
  UNION
  SELECT e.a, reach.r FROM edges e JOIN reach ON e.b = reach.node
),
labels AS (
  SELECT node AS doc_id, MIN(r) AS cluster_id FROM reach GROUP BY node
),
lab AS (
  SELECT s.doc_id, COALESCE(l.cluster_id, s.doc_id) AS cluster_id,
         len(string_split(s.text, ' ')) AS n_words, s.text
  FROM surv s LEFT JOIN labels l ON s.doc_id = l.doc_id
),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY cluster_id ORDER BY n_words DESC, doc_id
  ) AS pick FROM lab
),
kept AS (SELECT doc_id, text FROM ranked WHERE pick = 1),
{winnow_fp_ctes('kept', 'w_')[1:]},
keepfp AS (
  SELECT fp FROM w_fp GROUP BY fp HAVING COUNT(*) <= {_W_DF_CAP}
),
wf AS (SELECT f.doc_id, f.fp FROM w_fp f JOIN keepfp k ON f.fp = k.fp),
span_pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM wf a JOIN wf b ON a.fp = b.fp AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id HAVING COUNT(*) >= {_W_MIN_SHARED}
)
SELECT
  (SELECT CAST(COUNT(*) AS BIGINT) FROM docs3) AS n_in,
  (SELECT CAST(COUNT(*) AS BIGINT) FROM docs3)
    - (SELECT CAST(COUNT(*) AS BIGINT) FROM surv) AS n_exact_dropped,
  (SELECT CAST(COUNT(*) AS BIGINT) FROM surv)
    - (SELECT CAST(COUNT(*) AS BIGINT) FROM kept) AS n_near_dropped,
  (SELECT CAST(COUNT(*) AS BIGINT) FROM kept) AS n_kept,
  (SELECT CAST(COUNT(*) AS BIGINT) FROM span_pairs) AS n_span_pairs
"""


@register("dedup_pipeline", oracle=_dedup_pipeline_oracle())
def dedup_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The COMPLETE dedup stack as one auditable run — what a corpus
    release actually executes, in order, each stage feeding the next's
    SURVIVORS (never re-scanning dropped docs):

    1. exact (``dedup_exact``): md5-group, keep lowest id;
    2. near-dup (``dedup_minhash`` → ``dedup_clusters`` →
       ``dedup_keep_best``): MinHash pairs over exact survivors, CC
       clusters, longest-doc keeper per cluster;
    3. span audit (``winnow_dup_spans``): winnowed-fingerprint pairs
       among the KEPT docs — the residual cross-doc duplication the
       whole-doc stages cannot remove, reported for loss-masking.

    One audit row: (n_in, n_exact_dropped, n_near_dropped, n_kept,
    n_span_pairs). The corpus plants all three layers (exact copies
    every 4, tailed near-dups every 10), so every stage's count is
    exercised and the DuckDB oracle replays the full stack exactly.

    Scale shape: inherits each stage's — hash-only exchanges, banded
    candidates, O(log) CC rounds, df-capped span join; the final row
    assembles via one-row-aggregate cross joins (broadcast scalars)."""
    t = load_tables(spark, sf_dir)
    base = t.documents.select("doc_id", "text")
    # single-scan 3-layer synthesis (r16, guide §6): one documents
    # scan explodes into the base row + its exact copy (%4) + its
    # tailed near-dup (%10) — the union form scanned documents 3×
    docs3 = base.select(
        F.explode(
            F.expr(
                f"filter(array(struct(doc_id, text), "
                f"struct(doc_id + 1000000L as doc_id, text), "
                f"struct(doc_id + 2000000L as doc_id,"
                f" concat(text, '{_NEAR_TAIL}') as text)), "
                f"(x, i) -> i = 0 or (i = 1 and doc_id % 4 = 0)"
                f" or (i = 2 and doc_id % 10 = 0))"
            )
        ).alias("r")
    ).select("r.doc_id", "r.text")
    surv = (
        docs3.groupBy(F.md5("text"))
        .agg(F.min("doc_id").alias("doc_id"), F.min("text").alias("text"))
        .select("doc_id", "text")
        .cache()
    )
    pairs = minhash_pairs(surv)
    labels, _ = connected_components(
        pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
    )
    lab = (
        surv.select(
            "doc_id",
            "text",
            F.size(F.split("text", " ")).cast("bigint").alias("n_words"),
        )
        .join(
            labels.select(
                F.col("node").alias("doc_id"), F.col("lbl").alias("cl")
            ),
            "doc_id",
            "left",
        )
        .select(
            "doc_id",
            "text",
            "n_words",
            F.coalesce("cl", F.col("doc_id")).alias("cluster_id"),
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy("cluster_id").orderBy(
        F.col("n_words").desc(), F.col("doc_id")
    )
    kept = (
        lab.withColumn("pick", F.row_number().over(w))
        .filter(F.col("pick") == 1)
        .select("doc_id", "text")
        .cache()
    )
    fp = winnow_fingerprints(kept, materialize=True)
    keepfp = (
        fp.groupBy("fp")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") <= _W_DF_CAP)
        .select("fp")
    )
    wf = fp.join(keepfp, "fp")
    span_pairs = (
        wf.alias("a")
        .join(wf.alias("b"), "fp")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(F.col("a.doc_id"), F.col("b.doc_id"))
        .agg(F.count(F.lit(1)).alias("n_fp"))
        .filter(F.col("n_fp") >= _W_MIN_SHARED)
    )
    r_in = docs3.agg(F.count(F.lit(1)).cast("bigint").alias("n_in"))
    r_surv = surv.agg(F.count(F.lit(1)).cast("bigint").alias("n_surv"))
    r_kept = kept.agg(F.count(F.lit(1)).cast("bigint").alias("n_kept"))
    r_span = span_pairs.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_span_pairs")
    )
    return (
        r_in.crossJoin(r_surv)
        .crossJoin(r_kept)
        .crossJoin(r_span)
        .select(
            "n_in",
            (F.col("n_in") - F.col("n_surv")).alias("n_exact_dropped"),
            (F.col("n_surv") - F.col("n_kept")).alias("n_near_dropped"),
            "n_kept",
            "n_span_pairs",
        )
    )


# ------------------------------------------------------ dedup_method_agreement

# One corpus, three detectors, known ground truth: every 10th doc
# re-issued VERBATIM (+1M ids), every 7th re-issued with the near-dup
# tail (+2M ids). The agreement table is the methodology audit a
# curation team runs before picking its dedup stack: exact hashing
# must find all verbatim copies and no near-copies; MinHash/SimHash
# must find both; anything outside the planted sets ("other") is
# either a natural duplicate or banding noise — and the count of it
# is exactly what distinguishes the methods' precision.

# exact-group cap: a pathological duplicate group (one boilerplate doc
# copied 10M times at 100 TB) would otherwise emit |group|^2/2 pairs
# from the md5 self-join; groups past the cap are dropped before the
# join — the same df-capped-join guard eval_leakage_report uses. The
# planted corpus never exceeds 3, so oracle parity is unaffected while
# the production guard stays live in the plan.
_AGREE_GROUP_CAP = 10_000

_AGREE_ORACLE = f"""
WITH docs2 AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 1000000 AS doc_id, text
  FROM documents WHERE doc_id % 10 = 0
  UNION ALL
  SELECT doc_id + 2000000 AS doc_id, text || '{_NEAR_TAIL}' AS text
  FROM documents WHERE doc_id % 7 = 0
),
hx AS (SELECT doc_id, md5(text) AS h FROM docs2),
hok AS (
  SELECT h FROM hx GROUP BY h HAVING count(*) <= {_AGREE_GROUP_CAP}
),
x_pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM hx a JOIN hok USING (h) JOIN hx b USING (h)
  WHERE a.doc_id < b.doc_id
),
{minhash_pairs_ctes('docs2')},
stok AS (
  SELECT doc_id,
         list_transform(string_split(text, ' '),
                        s -> {_H32_DUCK.format(s='s')}) AS harr
  FROM docs2
),
ssim AS (
  SELECT doc_id, CAST({_simhash_terms_duck()} AS BIGINT) AS simhash
  FROM stok
),
s_pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM ssim a JOIN ssim b
    ON a.simhash // 16777216 = b.simhash // 16777216
   AND a.doc_id < b.doc_id
  WHERE bit_count(xor(a.simhash, b.simhash)) <= 6
),
tagged AS (
  SELECT 'exact' AS method, doc_a, doc_b FROM x_pairs
  UNION ALL
  SELECT 'minhash' AS method, doc_a, doc_b FROM mh_pairs
  UNION ALL
  SELECT 'simhash' AS method, doc_a, doc_b FROM s_pairs
)
SELECT method,
       CAST(COUNT(*) AS BIGINT) AS n_pairs,
       CAST(SUM(CASE WHEN doc_a < 1000000
                      AND doc_b = doc_a + 1000000 AND doc_a % 10 = 0
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_exact_truth,
       CAST(SUM(CASE WHEN doc_a < 1000000
                      AND doc_b = doc_a + 2000000 AND doc_a % 7 = 0
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_near_truth,
       CAST(SUM(CASE WHEN NOT (doc_a < 1000000
                      AND doc_b = doc_a + 1000000 AND doc_a % 10 = 0)
                      AND NOT (doc_a < 1000000
                      AND doc_b = doc_a + 2000000 AND doc_a % 7 = 0)
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_other
FROM tagged GROUP BY method
"""


@register("dedup_method_agreement", oracle=_AGREE_ORACLE)
def dedup_method_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Method-comparison audit: exact md5, MinHash-LSH, and SimHash run
    over ONE corpus with planted verbatim copies (every 10th doc) and
    near-copies (every 7th, tailed), and each method's pair output is
    scored against the known truth sets — the table a curation team
    reads before picking its dedup stack (exact misses every
    near-copy; the sketch methods catch both but admit banding noise,
    counted in n_other along with cross-copy pairs like (i+1M, i+2M)).

    Scale shape: the union of the three detectors' plans, each already
    scale-audited alone — exact's self-join keys on the 16-byte md5
    behind a group-size cap (a 10M-copy boilerplate group would
    otherwise go quadratic; past-cap groups drop, the df-capped-join
    guard again),
    MinHash reuses the Arrow signature + banded buckets, SimHash is
    in-scan bit votes with high-8-bit blocking; the final agreement
    rollup reduces pairs to (method, 4 counters) map-side. Nothing
    all-pairs anywhere."""
    t = load_tables(spark, sf_dir)
    base = t.documents.select("doc_id", "text")
    # single-scan 3-layer synthesis (r16, guide §6 — see dedup_pipeline)
    docs2 = base.select(
        F.explode(
            F.expr(
                f"filter(array(struct(doc_id, text), "
                f"struct(doc_id + 1000000L as doc_id, text), "
                f"struct(doc_id + 2000000L as doc_id,"
                f" concat(text, '{_NEAR_TAIL}') as text)), "
                f"(x, i) -> i = 0 or (i = 1 and doc_id % 10 = 0)"
                f" or (i = 2 and doc_id % 7 = 0))"
            )
        ).alias("r")
    ).select("r.doc_id", "r.text")

    # Materialize the (doc_id, md5) scalar table ONCE: the exact
    # detector consumes it four times (group-cap agg + join + both
    # self-join sides), each of which would otherwise re-embed the
    # corpus-sized docs2 text union (r15's simhash_pairs
    # materialize-once pattern; the checkpoint is scalar-width).
    hashed = docs2.select(
        "doc_id", F.md5("text").alias("h")
    ).localCheckpoint(eager=True)
    hok = (
        hashed.groupBy("h")
        .agg(F.count(F.lit(1)).alias("gn"))
        .filter(F.col("gn") <= _AGREE_GROUP_CAP)
        .select("h")
    )
    capped = hashed.join(hok, "h")
    ha, hb = capped.alias("a"), capped.alias("b")
    x_pairs = ha.join(
        hb,
        (F.col("a.h") == F.col("b.h"))
        & (F.col("a.doc_id") < F.col("b.doc_id")),
    ).select(
        F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
    )

    mh = minhash_pairs(docs2)

    harr = F.expr(
        "transform(split(text, ' '), s -> " + _H32_SPARK.format(s="s") + ")"
    )
    hh = docs2.select("doc_id", harr.alias("harr"))
    # Same materialize-once for the (doc_id, simhash) scalars: both
    # self-join sides re-embedded the tokenize+hash subtree (the
    # previous .cache() of the token arrays still paid the text scan
    # and stored corpus-sized token arrays; the checkpointed scalar
    # row is 16 bytes).
    sim = hh.select(
        "doc_id", F.expr(_simhash_terms_spark()).alias("simhash")
    ).localCheckpoint(eager=True)
    sa, sb = sim.alias("a"), sim.alias("b")
    s_pairs = (
        sa.join(
            sb,
            (
                F.expr("a.simhash div 16777216")
                == F.expr("b.simhash div 16777216")
            )
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .filter(
            F.bit_count(
                F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
            )
            <= 6
        )
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
    )

    tagged = (
        x_pairs.select(F.lit("exact").alias("method"), "doc_a", "doc_b")
        .unionAll(mh.select(F.lit("minhash").alias("method"), "doc_a", "doc_b"))
        .unionAll(
            s_pairs.select(F.lit("simhash").alias("method"), "doc_a", "doc_b")
        )
    )
    # doc_a < 1M pins the pair's left side to an ORIGINAL — without it
    # a cross-copy pair (i+1M, i+2M) at i % 70 == 0 also satisfies the
    # +1M/stride arithmetic and inflates the truth count
    is_exact = (
        (F.col("doc_a") < 1_000_000)
        & (F.col("doc_b") == F.col("doc_a") + 1_000_000)
        & (F.col("doc_a") % 10 == 0)
    )
    is_near = (
        (F.col("doc_a") < 1_000_000)
        & (F.col("doc_b") == F.col("doc_a") + 2_000_000)
        & (F.col("doc_a") % 7 == 0)
    )
    return tagged.groupBy("method").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum(is_exact.cast("int")).cast("bigint").alias("n_exact_truth"),
        F.sum(is_near.cast("int")).cast("bigint").alias("n_near_truth"),
        F.sum((~is_exact & ~is_near).cast("int"))
        .cast("bigint")
        .alias("n_other"),
    )


# --------------------------------------------------------- soft_dedup_weights

# SoftDeDup (He et al. 2024, "SoftDedup: an Efficient Data Reweighting
# Method for Speeding Up Language Model Pretraining"): instead of
# DROPPING duplicates, keep every copy and downweight it by its
# cluster's commonness — w(doc) = 1/n_copies — so the sampled token
# distribution matches the deduplicated one without losing coverage.
# The per-source rollup is the report a mixture designer reads: how
# much effective mass each source retains after reweighting.
_SOFT_DEDUP_ORACLE = """
WITH docs2 AS (
  SELECT doc_id, source, text FROM documents
  UNION ALL
  SELECT doc_id + 1000000 AS doc_id, source, text
  FROM documents WHERE doc_id % 4 = 0
),
hashed AS (SELECT source, md5(text) AS h FROM docs2),
c AS (SELECT h, CAST(COUNT(*) AS BIGINT) AS n_copies FROM hashed GROUP BY h)
SELECT hashed.source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN c.n_copies > 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_dup_docs,
       CAST(SUM(1000000 // c.n_copies) AS BIGINT) AS sum_weight_ppm,
       CAST(SUM(1000000 // c.n_copies) // COUNT(*) AS BIGINT) AS eff_ppm
FROM hashed JOIN c ON c.h = hashed.h
GROUP BY hashed.source
"""


@register("soft_dedup_weights", oracle=_SOFT_DEDUP_ORACLE)
def soft_dedup_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SoftDeDup reweighting (He et al. 2024): every document keeps a
    sampling weight ``1e6 // n_copies`` of its exact-content cluster
    instead of being dropped — the reweighted corpus matches the
    deduplicated token distribution while keeping full coverage.
    Per-source report: docs, duplicated docs, total retained mass
    (ppm-weighted), and the effective retention ratio — the numbers
    that decide whether a source is mostly mirrors before any
    mixture weight is assigned. Dup synthesis mirrors dedup_exact
    (every 4th doc re-appears under a shifted id).

    Scale shape: text reduces to md5 inside the scan, so the
    cluster-count shuffle and the count-back join carry (hash, source)
    scalars only — the dedup_exact exchange run twice (once to count,
    once to look up), both AQE-planned on the same key; the rollup is
    a |sources|-group partial agg. Weights are integer ppm, exact on
    both engines."""
    base = load_tables(spark, sf_dir).documents.select(
        "doc_id", "source", "text"
    )
    docs2 = base.unionAll(
        base.filter(F.col("doc_id") % 4 == 0).select(
            (F.col("doc_id") + 1_000_000).alias("doc_id"), "source", "text"
        )
    )
    hashed = docs2.select("source", F.md5("text").alias("h"))
    c = hashed.groupBy("h").agg(F.count(F.lit(1)).alias("n_copies"))
    w_ppm = F.expr("1000000 div n_copies")
    return (
        hashed.join(c, "h")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum((F.col("n_copies") > 1).cast("int"))
            .cast("bigint")
            .alias("n_dup_docs"),
            F.sum(w_ppm).cast("bigint").alias("sum_weight_ppm"),
        )
        .select(
            "source",
            "n_docs",
            "n_dup_docs",
            "sum_weight_ppm",
            F.expr("sum_weight_ppm div n_docs").alias("eff_ppm"),
        )
    )


# ------------------------------------------------------------ dup_spans_exact

# EXACT duplicated-substring detection at minimum span length L words —
# the distributed equivalent of the Lee et al. 2022 suffix-array pass
# at a fixed threshold, closing the "true suffix-array substring dedup"
# gap winnow_dup_spans stood in for: a token position is inside a
# duplicated substring of >= L words IFF some L-gram covering it occurs
# >= 2 times in the corpus (within-doc repeats included), so duplicated
# L-gram starts merged into maximal islands are EXACTLY the token mass
# a substring-dedup pass cuts (md5 128-bit gram keys make collisions
# ~2^-64 at any corpus size — the standard identity assumption).
_DSE_L = 8  # matches winnow's w + k - 1 = 8-word guarantee
_DSE_BOILER = (
    "subscribe to our newsletter for the latest oil well reports"
    " today free"
)  # 12 words, injected mid-doc — cross-doc spans at DIFFERENT offsets


def _dse_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents with (a) a 12-word boilerplate injected after word 10
    in every 5th doc — the shared-template span every crawl corpus
    carries, at different offsets per doc — and (b) a whole-doc copy
    (+tail) of every 9th doc, so maximal-island merging is exercised
    on both mid-doc and near-whole-doc spans."""
    base = load_tables(spark, sf_dir).documents.select("doc_id", "text")
    boiler = ", ".join(f"'{w}'" for w in _DSE_BOILER.split(" "))
    injected = base.select(
        "doc_id",
        F.when(
            F.col("doc_id") % 5 == 0,
            F.expr(
                "array_join(concat("
                " slice(split(text, ' '), 1, least(10, size(split(text, ' ')))),"
                f" array({boiler}),"
                " slice(split(text, ' '), least(10, size(split(text, ' '))) + 1,"
                "       size(split(text, ' ')))), ' ')"
            ),
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    # single-scan 2-layer synthesis (r16, guide §6 — see dedup_pipeline):
    # the copies branch re-derived the injected projection from a
    # second documents scan; the explode keeps it to one
    return injected.select(
        F.explode(
            F.expr(
                f"filter(array(struct(doc_id, text), "
                f"struct(doc_id + 1000000L as doc_id,"
                f" concat(text, '{_NEAR_TAIL}') as text)), "
                f"(x, i) -> i = 0 or doc_id % 9 = 0)"
            )
        ).alias("r")
    ).select("r.doc_id", "r.text")


def _dse_corpus_sql() -> str:
    boiler = ", ".join(f"'{w}'" for w in _DSE_BOILER.split(" "))
    inject = (
        "array_to_string(list_concat(list_concat("
        " list_slice(string_split(text, ' '), 1,"
        "            least(10, len(string_split(text, ' ')))),"
        f" [{boiler}]),"
        " list_slice(string_split(text, ' '),"
        "            least(10, len(string_split(text, ' '))) + 1,"
        "            len(string_split(text, ' ')))), ' ')"
    )
    return f"""
dsed AS (
  SELECT doc_id,
         CASE WHEN doc_id % 5 = 0 THEN {inject} ELSE text END AS text
  FROM documents
),
dse2 AS (
  SELECT doc_id, text FROM dsed
  UNION ALL
  SELECT doc_id + 1000000 AS doc_id, text || '{_NEAR_TAIL}' AS text
  FROM dsed WHERE doc_id % 9 = 0
)"""


DUP_SPANS_EXACT_ORACLE = f"""
WITH {_dse_corpus_sql()},
dsw AS (SELECT doc_id, string_split(text, ' ') AS w FROM dse2),
dsg AS (
  SELECT doc_id, i AS pos,
         md5(array_to_string(list_slice(w, i, i + {_DSE_L - 1}), ' ')) AS h
  FROM dsw, UNNEST(generate_series(1, len(w) - {_DSE_L - 1})) AS t(i)
  WHERE len(w) >= {_DSE_L}
),
dsc AS (
  SELECT doc_id, pos, COUNT(*) OVER (PARTITION BY h) AS c FROM dsg
),
dsi AS (
  SELECT doc_id, pos,
         CASE WHEN pos - LAG(pos) OVER (PARTITION BY doc_id ORDER BY pos)
                   > {_DSE_L} THEN 1 ELSE 0 END AS brk
  FROM dsc WHERE c >= 2
),
dss AS (
  SELECT doc_id, pos,
         SUM(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS sid
  FROM dsi
),
dsp AS (
  SELECT doc_id, sid, MIN(pos) AS s, MAX(pos) + {_DSE_L - 1} AS e
  FROM dss GROUP BY doc_id, sid
)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_spans,
       CAST(SUM(e - s + 1) AS BIGINT) AS dup_tokens,
       CAST(MAX(e - s + 1) AS BIGINT) AS max_span_len
FROM dsp GROUP BY doc_id
"""


@register("dup_spans_exact", oracle=DUP_SPANS_EXACT_ORACLE)
def dup_spans_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT duplicated-substring spans at threshold {_DSE_L} words —
    the distributed form of the Lee et al. 2022 suffix-array dedup
    pass (SURVEY "what's missing" item since r9; ``winnow_dup_spans``
    is the sampled stand-in with the same 8-word guarantee, this is
    the exact version): per doc, the maximal token islands covered by
    SOME substring of >= {_DSE_L} words occurring >= 2 times anywhere
    in the corpus (cross-doc or within-doc) — i.e. exactly the token
    mass ExactSubstr dedup cuts. Detection is exact by the L-gram
    reduction: a position is inside such a substring iff one of its
    covering {_DSE_L}-grams repeats, so duplicated gram-starts merged
    into gap-> {_DSE_L} islands reproduce the suffix-array answer
    without materializing a suffix array (which does not distribute).
    Output per affected doc: span count, covered token mass, longest
    span — the numbers a dedup-cut planner reads.

    Scale shape: grams are in-scan array ops (one md5 per token, the
    specdecode/span_corruption per-token class — honest token-linear);
    the duplicate test is one (hash)-keyed exchange carrying
    (doc_id, pos, md5) scalars; island-merging is one doc-keyed
    window over SURVIVING positions only (dup grams, a small fraction
    of tokens). Text never shuffles. Hot template hashes (the whole
    point of the operator) bound the per-hash fan-in at doc-frequency,
    never df² — there is no pair join anywhere. The duplicate test is
    a count-over-hash WINDOW on the one gram exchange, chosen by
    measurement over the groupBy-count + join-back alternative (the
    join recomputes the gram projection for its probe side and pays a
    second hash exchange: 2.38s vs 1.47s at sf0.1, 17.1s vs 7.4s at
    10× — r13 A/B). A single pathologically hot gram concentrates its
    df positions on one window partition; that fan-in is df, not df²,
    and a df-cap filter (the winnow _W_DF_CAP recipe) composes here
    if a corpus ever needs it."""
    docs = _dse_corpus(spark, sf_dir)
    grams = (
        docs.select("doc_id", F.split("text", " ").alias("w"))
        .filter(F.size("w") >= _DSE_L)
        .select(
            "doc_id",
            F.posexplode(
                F.expr(
                    f"transform(sequence(1, size(w) - {_DSE_L - 1}),"
                    f" i -> md5(array_join(slice(w, i, {_DSE_L}), ' ')))"
                )
            ).alias("p0", "h"),
        )
        .select("doc_id", (F.col("p0") + 1).alias("pos"), "h")
    )
    wh = Window.partitionBy("h")
    covered = grams.withColumn(
        "c", F.count(F.lit(1)).over(wh)
    ).filter(F.col("c") >= 2)
    wd = Window.partitionBy("doc_id").orderBy("pos")
    spans = (
        covered.withColumn(
            "brk",
            F.when(
                F.col("pos") - F.lag("pos").over(wd) > _DSE_L, 1
            ).otherwise(0),
        )
        .withColumn(
            "sid",
            F.sum("brk").over(
                wd.rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
        .groupBy("doc_id", "sid")
        .agg(
            F.min("pos").alias("s"),
            (F.max("pos") + (_DSE_L - 1)).alias("e"),
        )
    )
    return spans.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_spans"),
        F.sum(F.col("e") - F.col("s") + 1).cast("bigint").alias("dup_tokens"),
        F.max(F.col("e") - F.col("s") + 1).cast("bigint").alias("max_span_len"),
    )
