"""Semantic checks for the late-round-8 operators (chunk_dedup_rewrite,
eval_leakage_report, anchor_text_stats, mm_audio_neardup). Exact DuckDB
parity is covered by test_oracle_parity.py; these assert the properties
each operator exists to deliver."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from oil_wells_data_wrangling_spark.operators.corpus import chunk_dedup_rewrite
from oil_wells_data_wrangling_spark.operators.graph import anchor_text_stats
from oil_wells_data_wrangling_spark.operators.multimodal import (
    envelope_bits,
    mm_audio_neardup,
)
from oil_wells_data_wrangling_spark.operators.privacy import (
    decontaminate,
    eval_leakage_report,
)
from oil_wells_data_wrangling_spark.sources.readers import load_tables


# ---------------------------------------------------------- chunk_dedup_rewrite


def test_rewrite_absorbs_every_planted_copy(spark, sf_dir):
    """Every planted whole-doc copy (id >= 1M) loses all its segments to
    the original (lower doc_id wins the struct-min) and fingerprints
    NULL; every original that keeps all segments re-assembles to its
    exact original text."""
    rows = chunk_dedup_rewrite(spark, sf_dir).collect()
    planted = [r for r in rows if r.doc_id >= 1_000_000]
    assert planted, "corpus must plant copies"
    assert all(r.n_kept == 0 and r.new_fp is None for r in planted)

    originals = {r.doc_id: r for r in rows if r.doc_id < 1_000_000}
    full = [r for r in originals.values() if r.n_kept == r.n_segs]
    assert full, "some originals must survive intact"

    texts = {
        r.doc_id: r.text
        for r in load_tables(spark, sf_dir)
        .documents.select("doc_id", "text")
        .collect()
    }
    sample = full[:10]
    for r in sample:
        want = hashlib.md5(texts[r.doc_id].encode()).hexdigest()
        assert r.new_fp == want, f"doc {r.doc_id} reassembly drifted"


# ---------------------------------------------------------- eval_leakage_report


def test_leakage_report_two_sided_consistency(spark, sf_dir):
    """The eval-side report and the train-side decontaminate flags audit
    the same injected corpus: both must find contamination, leaked eval
    docs must carry positive attribution counts, and clean ones zero."""
    ev = eval_leakage_report(spark, sf_dir).collect()
    assert ev, "eval split must be non-empty"
    leaked = [r for r in ev if r.leaked]
    clean = [r for r in ev if not r.leaked]
    assert leaked, "injection must leak at least one eval doc"
    assert all(r.n_train_docs >= 1 and r.n_shared >= 1 for r in leaked)
    assert all(r.n_train_docs == 0 and r.n_shared == 0 for r in clean)

    n_contam = (
        decontaminate(spark, sf_dir).filter(F.col("contaminated")).count()
    )
    assert n_contam > 0
    # every contaminated train doc hits >=1 eval doc, so total eval-side
    # attributed train docs is at least the train-side flag count
    assert sum(r.n_train_docs for r in leaked) >= n_contam


# ------------------------------------------------------------ anchor_text_stats


def test_anchor_stats_modal_anchor_and_drop_path(spark, sf_dir):
    """Relative nav links must not create a host; the concentrated
    'see also' anchor (every even doc -> site(doc_id%4)) must be the
    modal anchor on site0/site2, beating the diverse doc-derived
    anchors; per-host counts are internally consistent."""
    rows = anchor_text_stats(spark, sf_dir).collect()
    by_host = {r.host: r for r in rows}
    assert all(h.endswith(".example.com") for h in by_host)
    for h in ("site0.example.com", "site2.example.com"):
        assert by_host[h].top_anchor == "see also", by_host[h]
    n_docs = load_tables(spark, sf_dir).documents.count()
    # out1 contributes one link per doc; 'see also' one per even doc
    assert sum(r.n_links for r in rows) == n_docs + (n_docs + 1) // 2
    assert all(r.top_anchor_n <= r.n_links for r in rows)
    assert all(r.n_anchors >= 1 for r in rows)


# ------------------------------------------------------------ mm_audio_neardup


def test_envelope_is_gain_invariant():
    """Scaling (or monotone-offsetting) every level preserves every
    sign-of-delta comparison — the invariance real audio dedup needs."""
    levels = [10, 50, 30, 30, 90, 10, 77, 76]
    assert envelope_bits(levels) == envelope_bits([x * 2 for x in levels])
    assert envelope_bits(levels) == envelope_bits([x + 7 for x in levels])


def test_audio_neardup_finds_planted_copies(spark, sf_dir):
    """Exact copies (+1M ids) must surface at Hamming 0 with probability
    1 (identical fingerprints collide on every band); gain-bumped
    near-copies (+2M ids) must be overwhelmingly found (the mod-256
    wrap flips ~1.5 bits on average, so a rare doc can exceed the
    threshold — per-doc LSH-style tolerance, not in aggregate)."""
    pairs = mm_audio_neardup(spark, sf_dir).collect()
    docs = load_tables(spark, sf_dir).documents.select("doc_id").collect()
    ids = [r.doc_id for r in docs]
    exact = {(i, i + 1_000_000) for i in ids if i % 10 == 0}
    near = {(i, i + 2_000_000) for i in ids if i % 7 == 0}

    got = {(r.doc_a, r.doc_b): r.hamming for r in pairs}
    found_exact = [p for p in exact if got.get(p) == 0]
    assert len(found_exact) == len(exact), "exact copies are guaranteed"
    found_near = [p for p in near if p in got]
    assert len(found_near) / len(near) >= 0.9, (
        f"only {len(found_near)}/{len(near)} near-copies found"
    )
    assert all(h <= 6 for h in got.values())


# ------------------------------------------------------------- events_cms_topk


def test_cms_never_undercounts(spark, sf_dir):
    """The CMS contract: estimates are exact-or-over, never under (min
    over hash rows bounds collision error from above); ranks are the
    contiguous exact top-k."""
    from oil_wells_data_wrangling_spark.operators.eventops import (
        events_cms_topk,
    )

    rows = sorted(events_cms_topk(spark, sf_dir).collect(), key=lambda r: r.rank)
    assert [r.rank for r in rows] == list(range(1, len(rows) + 1))
    assert all(r.n_est >= r.n_true for r in rows)
    assert all(r.exact == (r.n_est == r.n_true) for r in rows)
    # true counts non-increasing down the ranks
    trues = [r.n_true for r in rows]
    assert trues == sorted(trues, reverse=True)


# ------------------------------------------------------------- bpe_pair_counts


def test_bpe_pairs_are_single_symbols_and_mass_conserves(spark, sf_dir):
    """Merge candidates are (char, char-or-EOW) with non-increasing
    counts; total pair mass over ALL pairs equals sum over tokens of
    len(token) — each word of length L yields L-1 adjacent pairs plus
    one end-of-word pair."""
    from oil_wells_data_wrangling_spark.operators.textstats import (
        bpe_pair_counts,
    )

    rows = sorted(bpe_pair_counts(spark, sf_dir).collect(), key=lambda r: r.rank)
    assert rows and [r.rank for r in rows] == list(range(1, len(rows) + 1))
    counts = [r.n_pair for r in rows]
    assert counts == sorted(counts, reverse=True)
    assert all(len(r.a) == 1 for r in rows)
    assert all(r.b == "</w>" or len(r.b) == 1 for r in rows)

    docs = load_tables(spark, sf_dir).documents
    expect_mass = (
        docs.select(
            F.explode(F.split("text", " ")).alias("w")
        )
        .filter(F.col("w") != "")
        .agg(F.sum(F.length("w")))
        .collect()[0][0]
    )
    # the Spark-side word-frequency reduction conserves mass: summing
    # len(word)*cnt over the vocabulary equals summing len over tokens
    wf = (
        docs.select(F.explode(F.split("text", " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    got = wf.agg(F.sum(F.length("word") * F.col("cnt"))).collect()[0][0]
    assert got == expect_mass


# ------------------------------------------------------------ embedding_outliers


def test_embedding_outliers_tail_is_live_and_consistent(spark, sf_dir):
    """The >1.1×-mean tail must actually fire on the corpus (a dead
    threshold audits nothing), outlier counts stay within membership,
    and every vector lands in exactly one of the 16 cells."""
    from oil_wells_data_wrangling_spark.operators.similarity import (
        embedding_outliers,
    )

    rows = embedding_outliers(spark, sf_dir).collect()
    assert len(rows) <= 16
    assert all(0 <= r.n_outliers <= r.n_members for r in rows)
    assert sum(r.n_outliers for r in rows) > 0, "outlier tail never fires"
    n_vecs = load_tables(spark, sf_dir).embeddings.count()
    assert sum(r.n_members for r in rows) == n_vecs
    assert all(r.avg_d >= 0 for r in rows)


# ------------------------------------------------------------- bpe_train_steps


def test_bpe_training_loop_consistency(spark, sf_dir):
    """Step 1's learned merge must equal bpe_pair_counts' rank-1 pair
    (the loop's first census IS that operator); merges are distinct
    pairs with positive counts; later merges may reference earlier
    merged symbols (multi-char tokens are allowed from step 2 on)."""
    from oil_wells_data_wrangling_spark.operators.textstats import (
        bpe_pair_counts,
        bpe_train_steps,
    )

    steps = sorted(bpe_train_steps(spark, sf_dir).collect(), key=lambda r: r.step)
    assert [r.step for r in steps] == [1, 2, 3]
    assert len({(r.a, r.b) for r in steps}) == 3
    assert all(r.n > 0 for r in steps)

    rank1 = [r for r in bpe_pair_counts(spark, sf_dir).collect() if r.rank == 1][0]
    assert (steps[0].a, steps[0].b, steps[0].n) == (
        rank1.a, rank1.b, rank1.n_pair,
    )


# ------------------------------------------------------ dedup_method_agreement


def test_method_agreement_contracts(spark, sf_dir):
    """Exact hashing finds ALL verbatim copies and ZERO near-copies;
    the sketch methods find all verbatim copies (identical text ->
    identical signature, probability 1) and most near-copies."""
    from oil_wells_data_wrangling_spark.operators.dedup import (
        dedup_method_agreement,
    )

    rows = {r.method: r for r in dedup_method_agreement(spark, sf_dir).collect()}
    assert set(rows) == {"exact", "minhash", "simhash"}
    n_docs = load_tables(spark, sf_dir).documents.count()
    n_exact_planted = sum(1 for r in load_tables(spark, sf_dir)
                          .documents.select("doc_id").collect()
                          if r.doc_id % 10 == 0)
    ex = rows["exact"]
    assert ex.n_exact_truth == n_exact_planted
    assert ex.n_near_truth == 0, "md5 must never match a tailed copy"
    n_near_planted = sum(1 for x in load_tables(spark, sf_dir)
                         .documents.select("doc_id").collect()
                         if x.doc_id % 7 == 0)
    # per-method recall floors document the real trade-off the audit
    # exists to expose: banded MinHash holds high recall on the tailed
    # copies; 32-bit SimHash with hamming<=6 drops short docs whose
    # 4-word tail flips too many bits (and pays a visible n_other
    # precision cost) — both engines agree exactly on all counts
    for m, floor in (("minhash", 0.9), ("simhash", 0.6)):
        r = rows[m]
        assert r.n_exact_truth == n_exact_planted, f"{m} missed a verbatim copy"
        assert r.n_near_truth / n_near_planted >= floor, (
            f"{m}: {r.n_near_truth}/{n_near_planted} near-copies found"
        )
    assert rows["minhash"].n_near_truth > rows["exact"].n_near_truth


# ----------------------------------------------------------------- code_detect


def test_code_detect_flags_injected_code_only(spark, sf_dir):
    """Every injected doc (id % 6 == 0 gets a brace-bearing snippet)
    must flag; the word-salted prose corpus must never flag (no braces
    at all); sym_ppm is internally consistent with the counts."""
    from oil_wells_data_wrangling_spark.operators.textstats import code_detect

    rows = code_detect(spark, sf_dir).collect()
    injected = [r for r in rows if r.doc_id % 6 == 0]
    clean = [r for r in rows if r.doc_id % 6 != 0]
    assert injected and clean
    assert all(r.is_code for r in injected), "injected code must flag"
    assert all(not r.is_code for r in clean), "prose must not flag"
    assert all(r.n_braces >= 1 for r in injected)
    assert all(r.sym_ppm >= 0 for r in rows)


# ---------------------------------------------------------------- bpe_tokenize


def test_bpe_tokenize_saves_symbols_and_bounds(spark, sf_dir):
    """Applying the learned merges can only SHRINK the symbol stream
    (each replace collapses two symbols into one); the corpus-wide
    saving must be positive (the top merges were selected for mass);
    and n_before equals chars + words per doc (each word contributes
    len(w) symbols plus its end-of-word marker)."""
    from oil_wells_data_wrangling_spark.operators.textstats import bpe_tokenize

    rows = bpe_tokenize(spark, sf_dir).collect()
    assert rows
    assert all(r.n_after <= r.n_before for r in rows)
    assert all(r.n_before >= 1 for r in rows)
    assert sum(r.n_before - r.n_after for r in rows) > 0
    assert all(0 <= r.saved_ppm < 1_000_000 for r in rows)

    docs = {
        r.doc_id: r.text
        for r in load_tables(spark, sf_dir)
        .documents.select("doc_id", "text")
        .collect()
    }
    for r in rows[:20]:
        words = [w for w in docs[r.doc_id].split(" ") if w]
        assert r.n_before == sum(len(w) + 1 for w in words)


# -------------------------------------------------------- log_histogram_sketch


def test_log_histogram_quantile_error_bound(spark, sf_dir):
    """The sketch's contract: reading a quantile back from the bucket
    histogram lands within the gamma=2 relative-error bound of the
    exact quantile, and bucket min/max stay inside the bucket's range
    (2^(b-1) <= |cents| < 2^b for positive buckets)."""
    from oil_wells_data_wrangling_spark.operators.eventops import (
        log_histogram_sketch,
    )

    rows = log_histogram_sketch(spark, sf_dir).collect()
    assert rows
    for r in rows:
        if r.bucket > 0:
            lo, hi = 1 << (r.bucket - 1), 1 << r.bucket
            assert lo <= r.min_cents <= r.max_cents < hi, r
        elif r.bucket == 0:
            assert r.min_cents == r.max_cents == 0

    # exact LOWER-median per hour vs sketch read-back: walk buckets in
    # value order until half the mass is covered; the covering bucket
    # must CONTAIN the exact lower-median order statistic (an
    # interpolated percentile can fall between buckets on a bimodal
    # hour, so the order statistic is the right ground truth). Also:
    # total sketch mass equals the event count.
    import collections

    events = load_tables(spark, sf_dir).events
    from pyspark.sql import functions as SF

    cents_rows = events.select(
        SF.date_trunc("hour", "ts").alias("w"),
        SF.expr("cast(round(value * 100, 0) as bigint)").alias("c"),
    ).collect()
    by_w = collections.defaultdict(list)
    for r in cents_rows:
        by_w[r.w].append(r.c)
    assert sum(r.n for r in rows) == len(cents_rows)

    per_win = collections.defaultdict(list)
    for r in rows:
        per_win[r.window_start].append(r)
    for w, bs in per_win.items():
        bs.sort(key=lambda r: r.bucket)
        total = sum(r.n for r in bs)
        acc = 0
        for r in bs:
            acc += r.n
            if acc * 2 >= total:
                break
        vals = sorted(by_w[w])
        true = vals[(len(vals) - 1) // 2]  # exact lower median
        assert r.min_cents <= true <= r.max_cents, (w, true, r.bucket)


# --------------------------------------------------------------- bitext_mining


def test_bitext_margin_semantics(spark, sf_dir):
    """Every English doc with a full runner field gets a margin; every
    accepted pair's margin clears the threshold; matches are always
    non-English; a query with fewer than 3 runners is never accepted."""
    from oil_wells_data_wrangling_spark.operators.similarity import (
        bitext_mining,
    )

    rows = bitext_mining(spark, sf_dir).collect()
    assert rows
    langs = {
        r.doc_id: r.lang
        for r in load_tables(spark, sf_dir)
        .documents.select("doc_id", "lang")
        .collect()
    }
    for r in rows:
        assert langs[r.query_id] == "en"
        if r.match_id is not None:
            assert langs[r.match_id] != "en"
        if r.accepted:
            assert r.margin_r is not None and r.margin_r > 1.05
        if r.margin_r is None:
            assert not r.accepted


def test_log_histogram_merge_and_readback(spark, sf_dir):
    """The sketch's raison d'être, end to end: per-hour cells MERGE
    into daily cells by (SUM n, MIN/MAX cents), and the quantile
    read-back from the MERGED sketch brackets the exact daily median —
    no event re-read anywhere."""
    from oil_wells_data_wrangling_spark.operators.eventops import (
        log_histogram_quantile,
        log_histogram_sketch,
    )

    hourly = log_histogram_sketch(spark, sf_dir)
    daily = (
        hourly.groupBy(
            F.date_trunc("day", "window_start").alias("window_start"),
            "bucket",
        )
        .agg(
            F.sum("n").alias("n"),
            F.min("min_cents").alias("min_cents"),
            F.max("max_cents").alias("max_cents"),
        )
    )
    got = {
        r.window_start: (r.min_cents, r.max_cents)
        for r in log_histogram_quantile(daily, 500_000).collect()
    }
    assert got

    events = load_tables(spark, sf_dir).events
    import collections

    by_day = collections.defaultdict(list)
    for r in events.select(
        F.date_trunc("day", "ts").alias("d"),
        F.expr("cast(round(value * 100, 0) as bigint)").alias("c"),
    ).collect():
        by_day[r.d].append(r.c)
    for d, (lo, hi) in got.items():
        vals = sorted(by_day[d])
        true = vals[(len(vals) - 1) // 2]
        assert lo <= true <= hi, (d, true, lo, hi)


# -------------------------------------------------------------- knn_label_eval


def test_knn_label_eval_bounds_and_coverage(spark, sf_dir):
    """Accuracy stays within [0, 1e6] ppm and is internally consistent
    with the counts; every label class present in the embeddings that
    produced predictions appears in the report."""
    from oil_wells_data_wrangling_spark.operators.similarity import (
        knn_label_eval,
    )

    rows = knn_label_eval(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r.n_correct <= r.n_queries
        assert r.acc_ppm == r.n_correct * 1_000_000 // r.n_queries
    total_q = sum(r.n_queries for r in rows)
    n_sample = (
        load_tables(spark, sf_dir)
        .embeddings.filter(F.col("vec_id") < 512)
        .count()
    )
    # candidate-starved queries may drop, but the vast majority of the
    # sampled queries must receive a prediction for the eval to mean
    # anything
    assert total_q >= 0.9 * n_sample, f"only {total_q}/{n_sample} predicted"
