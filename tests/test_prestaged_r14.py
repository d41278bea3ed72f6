"""Round-14 pre-staged operators: dup_spans_exact and
kv_prefix_sharing — the registry's FINAL two slots under the 250 cap
(plans/registry.py capacity policy, decided r13).

Both were pre-staged (implemented + parity-gated here) in r13 and
ACTIVATED in r14: @register'ed, leading _WINDOW_PRIORITY with the
48-name r9 cohort, SURVEY §2 rows added — the registry is now FROZEN
at the 250 capacity cap. These tests stay as the operators' standing
parity/property suite. Novelty check done at design time:
dup_spans_exact closes the named "true suffix-array substring dedup"
gap (winnow_dup_spans is the sampled stand-in; nothing exact exists);
kv_prefix_sharing is the first operator on the prefix-sharing/LCP
axis (no existing operator computes trie/radix-cache structure)."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from oil_wells_data_wrangling_spark.operators.dedup import (
    _DSE_L,
    DUP_SPANS_EXACT_ORACLE,
    _dse_corpus,
    dup_spans_exact,
)
from oil_wells_data_wrangling_spark.operators.inference import (
    _KVP_CAP,
    KV_PREFIX_SHARING_ORACLE,
    _kvp_requests_expr,
    kv_prefix_sharing,
)
from tests.test_oracle_parity import _assert_frames_match


def test_dup_spans_exact_matches_oracle(spark, duck, sf_dir):
    sp = dup_spans_exact(spark, sf_dir).toPandas()
    du = duck.execute(DUP_SPANS_EXACT_ORACLE).fetchdf()
    _assert_frames_match(sp, du, "dup_spans_exact")


def test_dup_spans_exact_is_exact(spark, sf_dir):
    """The exactness claim, pinned against BRUTE FORCE: rebuild the
    full corpus gram-count dict driver-side and recompute every doc's
    maximal duplicated islands in plain Python; the operator must
    reproduce them verbatim (not just on planted dups — on every
    natural repeat in the corpus too)."""
    docs = {
        r.doc_id: r.text.split(" ")
        for r in _dse_corpus(spark, sf_dir).collect()
    }
    counts: dict[str, int] = {}
    for w in docs.values():
        for i in range(len(w) - _DSE_L + 1):
            h = hashlib.md5(
                " ".join(w[i : i + _DSE_L]).encode()
            ).hexdigest()
            counts[h] = counts.get(h, 0) + 1
    truth = {}
    for d, w in docs.items():
        starts = [
            i + 1
            for i in range(len(w) - _DSE_L + 1)
            if counts[
                hashlib.md5(" ".join(w[i : i + _DSE_L]).encode()).hexdigest()
            ]
            >= 2
        ]
        if not starts:
            continue
        spans = []
        s = e = starts[0]
        for p in starts[1:]:
            if p - e > _DSE_L:
                spans.append((s, e + _DSE_L - 1))
                s = p
            e = p
        spans.append((s, e + _DSE_L - 1))
        lens = [b - a + 1 for a, b in spans]
        truth[d] = (len(spans), sum(lens), max(lens))
    got = {
        r.doc_id: (r.n_spans, r.dup_tokens, r.max_span_len)
        for r in dup_spans_exact(spark, sf_dir).collect()
    }
    assert got == truth


def test_dup_spans_exact_detects_planted(spark, sf_dir):
    pdf = dup_spans_exact(spark, sf_dir).toPandas()
    ids = set(pdf["doc_id"])
    docs = {
        r.doc_id: r.text.split(" ")
        for r in _dse_corpus(spark, sf_dir).collect()
    }
    # every boilerplate-injected doc (>= L words context) is flagged
    # with at least the 12-token template span
    by_id = pdf.set_index("doc_id")
    for d, w in docs.items():
        if d % 5 == 0 and d < 1_000_000 and len(w) >= 12:
            assert d in ids, d
            assert by_id.loc[d, "dup_tokens"] >= 12
    # whole-copy pairs: original and its +1M copy both flagged, the
    # copy's covered mass spanning nearly its whole length
    copies = [d for d in docs if d >= 1_000_000]
    assert copies
    for c in copies[:5]:
        assert c in ids and (c - 1_000_000) in ids


def test_kv_prefix_sharing_matches_oracle(spark, duck, sf_dir):
    sp = kv_prefix_sharing(spark, sf_dir).toPandas()
    du = duck.execute(KV_PREFIX_SHARING_ORACLE).fetchdf()
    _assert_frames_match(sp, du, "kv_prefix_sharing")


def test_kv_prefix_sharing_trie_identity(spark, sf_dir):
    """trie_tokens must equal the ACTUAL radix-tree size: the number
    of distinct non-empty token prefixes among the capped heads —
    verified by building the prefix set driver-side per source. This
    pins the level-sum trie identity against ground truth, not
    against another LCP implementation."""
    from oil_wells_data_wrangling_spark.sources.readers import load_tables

    t = load_tables(spark, sf_dir)
    heads = (
        t.documents.select(
            "source", F.expr(_kvp_requests_expr()).alias("head")
        )
        .collect()
    )
    by_src: dict[str, list] = {}
    for r in heads:
        by_src.setdefault(r.source, []).append(tuple(r.head))
    got = {
        r.source: (r.trie_tokens, r.total_tokens, r.shared_tokens)
        for r in kv_prefix_sharing(spark, sf_dir).collect()
    }
    for src, hs in by_src.items():
        prefixes = set()
        for h in hs:
            for i in range(1, len(h) + 1):
                prefixes.add(h[:i])
        trie, total, shared = got[src]
        assert trie == len(prefixes), src
        assert shared == total - trie
        assert len(hs[0]) <= _KVP_CAP


def test_kv_prefix_sharing_system_prompt_shared(spark, sf_dir):
    pdf = kv_prefix_sharing(spark, sf_dir).toPandas()
    # the 11-token per-source system preamble guarantees deep sharing
    # inside every source (>= 2 requests per source in the testdata)
    assert (pdf["max_lcp"] >= 11).all()
    assert (pdf["share_permille"] > 0).all()
    assert (
        pdf["shared_tokens"] + pdf["trie_tokens"] == pdf["total_tokens"]
    ).all()


def _plan_str(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_dup_spans_exact_plan_shape(spark, sf_dir):
    """Docstring scale claims, pinned: no pair join anywhere (the
    operator is linear — a join would reintroduce the df² term the
    design avoids), and text never rides an exchange (grams reduce to
    (doc_id, pos, md5) scalars in-scan)."""
    plan = _plan_str(dup_spans_exact(spark, sf_dir))
    assert "Join" not in plan, "dup_spans_exact must not join"
    lines = plan.splitlines()
    for i, line in enumerate(lines):
        if "Exchange" in line and i + 1 < len(lines):
            nxt = lines[i + 1]
            assert "text#" not in nxt, f"text rides an exchange: {nxt}"


def test_kv_prefix_sharing_plan_shape(spark, sf_dir):
    """The level-sum form's scale contract, pinned: NO window and NO
    sort anywhere (the sorted-neighbor alternative serializes each
    source onto one task — the exact failure this operator avoids);
    only partial-agg hash exchanges over (source, depth, md5) scalars,
    never a single-partition collapse."""
    plan = _plan_str(kv_prefix_sharing(spark, sf_dir))
    assert "Window" not in plan, plan
    assert "SortExec" not in plan and "Sort " not in plan, plan
    assert plan.count("Exchange hashpartitioning") <= 3, plan
    assert "Exchange SinglePartition" not in plan, plan


def test_dup_spans_exact_edge_corpora(spark):
    """Hand-picked edge corpora vs brute force: all-same-word docs
    (every gram identical — one island covering the doc), docs exactly
    L words, docs below L (no grams), and a cross-doc shared phrase at
    offset 0 vs mid-doc. Runs the operator's CORE (gram→count→island)
    on an injected frame rather than the registered corpus synth."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from oil_wells_data_wrangling_spark.operators.dedup import _DSE_L

    corpora = {
        1: "a " * 20,                       # 20x same word: full-cover island
        2: "w" + " w".join(str(i) for i in range(_DSE_L - 1)),  # L words, unique
        3: "short doc only",                # < L words: no grams
        4: "p q r s t u v w x y z extra",   # shares 8-gram prefix with 5
        5: "p q r s t u v w other tail words here",
        6: "lead in words p q r s t u v w trailing",  # same phrase mid-doc
    }
    docs = spark.createDataFrame(
        [(k, v.strip()) for k, v in corpora.items()], "doc_id long, text string"
    )
    # replicate the operator's core on this frame
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
    covered = grams.withColumn("c", F.count(F.lit(1)).over(wh)).filter(
        F.col("c") >= 2
    )
    wd = Window.partitionBy("doc_id").orderBy("pos")
    spans = (
        covered.withColumn(
            "brk",
            F.when(F.col("pos") - F.lag("pos").over(wd) > _DSE_L, 1)
            .otherwise(0),
        )
        .withColumn(
            "sid",
            F.sum("brk").over(wd.rowsBetween(Window.unboundedPreceding, 0)),
        )
        .groupBy("doc_id", "sid")
        .agg(F.min("pos").alias("s"), (F.max("pos") + _DSE_L - 1).alias("e"))
    )
    got = {
        (r.doc_id, r.s, r.e) for r in spans.collect()
    }
    # brute force
    import hashlib

    toks = {k: v.strip().split(" ") for k, v in corpora.items()}
    counts: dict[str, int] = {}
    for w in toks.values():
        for i in range(len(w) - _DSE_L + 1):
            h = hashlib.md5(" ".join(w[i : i + _DSE_L]).encode()).hexdigest()
            counts[h] = counts.get(h, 0) + 1
    want = set()
    for d, w in toks.items():
        starts = [
            i + 1
            for i in range(len(w) - _DSE_L + 1)
            if counts[
                hashlib.md5(" ".join(w[i : i + _DSE_L]).encode()).hexdigest()
            ]
            >= 2
        ]
        if not starts:
            continue
        s = e = starts[0]
        for p in starts[1:]:
            if p - e > _DSE_L:
                want.add((d, s, e + _DSE_L - 1))
                s = p
            e = p
        want.add((d, s, e + _DSE_L - 1))
    assert got == want
    # the all-same-word doc must be one island covering positions 1..20
    assert (1, 1, 20) in got
    # the unique L-word doc and the short doc must be absent
    assert not any(d in (2, 3) for d, _, _ in got)
    # the shared phrase flags at offset 1 (doc 4/5) and mid-doc (doc 6)
    assert (4, 1, 8) in got and (5, 1, 8) in got and (6, 4, 11) in got
