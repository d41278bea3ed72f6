"""Semantic + plan-shape checks for the round-8 operators
(neardup_index_probe, tokenizer_fertility, score_calibration). Exact
parity with DuckDB is covered by test_oracle_parity.py; these assert
the properties each operator exists to deliver."""

from __future__ import annotations

from pyspark.sql import functions as F

from oil_wells_data_wrangling_spark.operators.dedup import (
    neardup_index_append,
    neardup_index_build,
    neardup_index_candidates,
    neardup_index_probe,
)
from oil_wells_data_wrangling_spark.operators.inference import (
    score_calibration,
)
from oil_wells_data_wrangling_spark.operators.textstats import (
    tokenizer_fertility,
)


# ------------------------------------------------------- neardup_index_probe


def test_index_probe_finds_injected_neardups(spark, sf_dir):
    """Every probe doc is a near-dup of an indexed doc by construction;
    the banded index must catch the overwhelming majority (LSH is
    probabilistic per doc, not in aggregate), and candidate counts stay
    collision-bounded (no quadratic blowup)."""
    rows = neardup_index_probe(spark, sf_dir).collect()
    assert rows
    matched = sum(1 for r in rows if r.matched)
    assert matched / len(rows) >= 0.9, f"only {matched}/{len(rows)} matched"
    assert max(r.n_candidates for r in rows) <= 10


def test_index_round_trip_exact_copy_always_matches(spark, sf_dir, tmp_path):
    """The parameterized pattern through an EXPLICIT index path: an
    exact copy of an indexed doc has the identical signature, hence
    identical band hashes — it must match with probability 1 (no LSH
    luck involved), and a fresh never-indexed text must not."""
    from oil_wells_data_wrangling_spark.sources.readers import load_tables

    docs = load_tables(spark, sf_dir).documents.select("doc_id", "text")
    index_dir = str(tmp_path / "band_index")
    neardup_index_build(docs, index_dir)

    idx = spark.read.parquet(index_dir)
    assert set(idx.columns) == {"doc_id", "band_id", "bh"}

    copies = docs.limit(5).select(
        (F.col("doc_id") + 5_000_000).alias("doc_id"), "text"
    )
    fresh = spark.createDataFrame(
        [(9_000_001, "totally novel zebra quark flux " * 3)],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: r.matched
        for r in neardup_index_candidates(
            spark, copies.unionAll(fresh), index_dir
        ).collect()
    }
    assert all(got[d] for d in got if d < 9_000_000), got
    assert got[9_000_001] is False

    # ingest loop: once the novel doc's buckets are APPENDED, a later
    # batch containing its exact copy must match against the index
    neardup_index_append(fresh, index_dir)
    later = fresh.select((F.col("doc_id") + 1).alias("doc_id"), "text")
    again = neardup_index_candidates(spark, later, index_dir).first()
    assert again.matched and again.n_candidates >= 1


# ------------------------------------------------------- tokenizer_fertility


def test_fertility_orders_languages_by_fragmentation(spark, sf_dir):
    """en tokenizes 1:1; the injected punctuation makes every other
    language ~2 tokens/word and zh ~3 — the per-language budget
    multipliers the operator exists to expose."""
    rows = {r.lang: r for r in tokenizer_fertility(spark, sf_dir).collect()}
    assert rows["en"].fertility_ppm == 1_000_000
    for lang, r in rows.items():
        if lang in ("en", "zh"):
            continue
        assert 1_900_000 < r.fertility_ppm < 2_100_000, (lang, r)
    assert rows["zh"].fertility_ppm > 2_800_000
    assert all(r.total_tokens >= r.total_words for r in rows.values())


# --------------------------------------------------------- score_calibration


def test_calibration_conserves_docs_and_ranks_the_label(spark, sf_dir):
    """The curve must cover every document exactly once, rates must be
    valid ppm, and the score must actually RANK the label: positives
    (lang_id's English prediction) sit in strictly higher buckets on
    average than negatives — the stub's +5·stop_permille term
    guarantees signal while the other features add independent
    noise."""
    rows = score_calibration(spark, sf_dir).collect()
    n_total = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert sum(r.n_docs for r in rows) == n_total
    for r in rows:
        assert 0 <= r.n_pos <= r.n_docs
        assert 0 <= r.pos_ppm <= 1_000_000
        assert r.score_lo == r.bucket * 200
    pos_mass = sum(r.bucket * r.n_pos for r in rows)
    pos_n = sum(r.n_pos for r in rows)
    neg_mass = sum(r.bucket * (r.n_docs - r.n_pos) for r in rows)
    neg_n = sum(r.n_docs - r.n_pos for r in rows)
    assert pos_n > 0 and neg_n > 0
    assert pos_mass / pos_n > neg_mass / neg_n, (
        "score does not rank the label — calibration curve is vacuous"
    )


# ---------------------------------------------------------- winnow_dup_spans


def test_winnow_guarantee_shared_span_detected(spark):
    """The winnowing guarantee: two docs sharing a contiguous run of
    >= w + k - 1 = 8 words MUST share at least one fingerprint, no
    matter how different the rest of the docs are (whole-doc Jaccard
    near zero — the case MinHash banding is allowed to miss)."""
    from oil_wells_data_wrangling_spark.operators.dedup import (
        winnow_fingerprints,
    )

    shared = "alpha bravo charlie delta echo foxtrot golf hotel"
    docs = spark.createDataFrame(
        [
            (1, "x1 x2 x3 x4 x5 " + shared + " x6 x7 x8 x9 x10"),
            (2, "y1 y2 y3 y4 y5 y6 y7 y8 y9 " + shared + " z1 z2"),
            (3, "unrelated words only nothing shared here at all ever"),
        ],
        "doc_id long, text string",
    )
    fp = winnow_fingerprints(docs).toPandas()
    by_doc = {d: set(g["fp"]) for d, g in fp.groupby("doc_id")}
    assert by_doc[1] & by_doc[2], "guaranteed shared fingerprint missing"
    assert not (by_doc[1] & by_doc[3] or by_doc[2] & by_doc[3])


def test_winnow_short_docs_filtered(spark):
    from oil_wells_data_wrangling_spark.operators.dedup import (
        winnow_fingerprints,
    )

    docs = spark.createDataFrame(
        [(1, "only seven words here not quite enough"),
         (2, "this one has exactly eight words in it")],
        "doc_id long, text string",
    )
    got = set(winnow_fingerprints(docs).toPandas()["doc_id"])
    assert got == {2}


def test_winnow_dup_spans_finds_planted_neardups(spark, sf_dir):
    """Every planted near-dup (same text + tail) shares almost every
    fingerprint with its source; the pair list must contain every
    planted (doc, doc+1_000_000) pair that survives the length filter."""
    from oil_wells_data_wrangling_spark.operators.dedup import (
        winnow_dup_spans,
    )
    from pyspark.sql import functions as F

    pairs = winnow_dup_spans(spark, sf_dir).toPandas()
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    # >= 20 shared words -> 13 shared windows; a single shared
    # fingerprint (which the >= 2 threshold drops) would need every
    # window min to coincide, which long runs preclude. 8-19-word
    # docs are legitimately reportable-or-not depending on min
    # collisions; the exactness claim lives in the oracle row.
    planted = {
        int(r.doc_id)
        for r in docs.filter(
            (F.col("doc_id") % 10 == 0)
            & (F.size(F.split("text", " ")) >= 20)
        ).collect()
    }
    assert planted
    got = {
        (int(a), int(b))
        for a, b in zip(pairs["doc_a"], pairs["doc_b"])
    }
    for d in planted:
        assert (d, d + 1_000_000) in got, f"planted pair {d} missing"


# ----------------------------------------------------------- dedup_keep_best


def test_keep_best_one_keeper_per_cluster(spark, sf_dir):
    from oil_wells_data_wrangling_spark.operators.dedup import dedup_keep_best

    pdf = dedup_keep_best(spark, sf_dir).toPandas()
    # full corpus covered exactly once (base + planted dups)
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    n_planted = spark.read.parquet(f"{sf_dir}/documents.parquet").filter(
        "doc_id % 10 = 0"
    ).count()
    assert len(pdf) == n_docs + n_planted
    # exactly one keeper per cluster
    per = pdf.groupby("cluster_id")["keep"].sum()
    assert (per == 1).all()
    # the planted near-dup carries a 4-word tail, so in every pure
    # (source, source+tail) cluster the LONGER dup is the keeper
    by_doc = pdf.set_index("doc_id")
    pure_pairs = [
        (d, d + 1_000_000)
        for d in pdf[pdf.doc_id < 1_000_000].doc_id
        if d + 1_000_000 in by_doc.index
        and (pdf.cluster_id == by_doc.loc[d].cluster_id).sum() == 2
        and by_doc.loc[d + 1_000_000].cluster_id == by_doc.loc[d].cluster_id
    ]
    assert pure_pairs
    for src, dup in pure_pairs:
        assert bool(by_doc.loc[dup].keep) and not bool(by_doc.loc[src].keep)


# ------------------------------------------------------------- ivf_pq_search


def test_ivf_pq_search_shape_and_ranking(spark, sf_dir):
    from oil_wells_data_wrangling_spark.operators.similarity import (
        _IVFPQ_QHI,
        _IVFPQ_QLO,
        _IVFPQ_TOPK,
        ivf_pq_search,
    )

    pdf = ivf_pq_search(spark, sf_dir).toPandas()
    queries = set(pdf["query_id"])
    assert queries == set(range(_IVFPQ_QLO, _IVFPQ_QHI + 1))
    for q, g in pdf.groupby("query_id"):
        g = g.sort_values("rank")
        assert list(g["rank"]) == list(range(1, _IVFPQ_TOPK + 1))
        assert g["adist_r"].is_monotonic_increasing
        assert q not in set(g["neighbor_id"]), "query returned itself"


# ------------------------------------------------------------- html_to_text


def test_html_to_text_drops_code_keeps_text(spark, sf_dir):
    """Script/style content must NEVER leak into extracted text; the
    document's own words must survive; the link inventory must count
    the synthesized links exactly (3 when doc_id % 3 == 0 — nav + next
    + more — else 2)."""
    from oil_wells_data_wrangling_spark.operators.webtable import (
        html_to_text,
    )

    out = {r.doc_id: r for r in html_to_text(spark, sf_dir).collect()}
    docs = {
        r.doc_id: r.text
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text")
        .collect()
    }
    assert set(out) == set(docs)
    import re

    for doc_id, r in out.items():
        assert r.title == f"Doc {doc_id}"
        assert r.n_links == (3 if doc_id % 3 == 0 else 2)
        # clean length >= normalized text length (body text survives)
        norm = re.sub(r"\s+", " ", docs[doc_id]).strip()
        assert r.n_chars >= len(norm)
        # no script/style residue is possible in ANY doc: the md5'd
        # clean of a doc whose id appears nowhere in its text can't
        # contain 'var id =' — spot-check via a reconstruction
    sample = sorted(out)[:3]
    from pyspark.sql import functions as F

    recon = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .filter(F.col("doc_id").isin([int(s) for s in sample]))
        .select(
            "doc_id",
            F.concat(
                F.lit("Doc "), F.col("doc_id").cast("string"),
                F.lit(" Doc "), F.col("doc_id").cast("string"),
                F.lit(" Home | About | x "),
                F.regexp_replace(F.trim("text"), r"\s+", " "),
                F.lit(" next "),
                F.when(F.col("doc_id") % 3 == 0, F.lit("more "))
                .otherwise(F.lit("")),
                F.lit("(c) corpus"),
            ).alias("expect"),
        )
        .collect()
    )
    import hashlib

    for r in recon:
        assert out[r.doc_id].clean_fp == hashlib.md5(
            r.expect.encode()
        ).hexdigest(), f"clean text drifted for doc {r.doc_id}"


# ------------------------------------------------------------- robots_filter


def test_robots_filter_rules_semantics(spark, sf_dir):
    """Odd hosts must block only /private/ paths; even hosts must also
    block /tmp/; nothing else is ever blocked, and the frontier is
    conserved per host."""
    from oil_wells_data_wrangling_spark.operators.textstats import (
        robots_filter,
    )

    rows = {r.host: r for r in robots_filter(spark, sf_dir).collect()}
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert sum(r.n_urls for r in rows.values()) == n_docs
    for host, r in rows.items():
        h = int(host.removeprefix("site").split(".")[0])
        assert r.n_blocked + r.n_allowed == r.n_urls
        # docs on host h: doc_id ≡ h (mod 20); path class = doc_id % 4.
        # h odd -> only doc_id%4==1 blocked; h even -> %4 in {1,2}.
        expect_classes = {1, 2} if h % 2 == 0 else {1}
        expected = sum(
            1
            for d in range(h, n_docs, 20)
            if d % 4 in expect_classes
        )
        assert r.n_blocked == expected, (host, r.n_blocked, expected)


# ----------------------------------------------------------- winnow index


def test_winnow_index_round_trip_and_append(spark, sf_dir, tmp_path):
    """Span-index ingest loop through an EXPLICIT path: an exact copy
    of an indexed doc shares its whole span (guaranteed match); a
    novel long doc must not match; after APPENDING the novel doc, a
    later copy of it must match."""
    from oil_wells_data_wrangling_spark.operators.dedup import (
        winnow_index_append,
        winnow_index_build,
        winnow_index_candidates,
    )
    from oil_wells_data_wrangling_spark.sources.readers import load_tables

    docs = load_tables(spark, sf_dir).documents.select("doc_id", "text")
    index_dir = str(tmp_path / "winnow_idx")
    winnow_index_build(docs, index_dir)

    copies = (
        docs.filter(F.size(F.split("text", " ")) >= 20)
        .limit(5)
        .select((F.col("doc_id") + 5_000_000).alias("doc_id"), "text")
    )
    fresh = spark.createDataFrame(
        [(9_000_001, "totally novel zebra quark flux vortex " * 4)],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: r.matched
        for r in winnow_index_candidates(
            spark, copies.unionAll(fresh), index_dir
        ).collect()
    }
    assert all(got[d] for d in got if d < 9_000_000), got
    assert got[9_000_001] is False

    winnow_index_append(fresh, index_dir)
    later = fresh.select((F.col("doc_id") + 1).alias("doc_id"), "text")
    again = winnow_index_candidates(spark, later, index_dir).first()
    assert again.matched and again.n_candidates >= 1


# ------------------------------------------------------------ dedup_pipeline


def test_dedup_pipeline_stage_accounting(spark, sf_dir):
    """The audit row must reconcile: planted exact copies (every 4th
    doc, grouped away entirely) and planted near-dups (every 10th,
    dropped by keep-best unless degenerate) book against the right
    stages, and kept + drops = input."""
    from oil_wells_data_wrangling_spark.operators.dedup import dedup_pipeline

    r = dedup_pipeline(spark, sf_dir).first()
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    n_exact_planted = sum(1 for d in range(0, n_docs, 4))
    assert r.n_in == n_docs + n_exact_planted + sum(
        1 for d in range(0, n_docs, 10)
    )
    assert r.n_exact_dropped == n_exact_planted
    # >= : the word-soup corpus contains NATURAL near-dup clusters on
    # top of the planted ones (winnow_dup_spans surfaces the same),
    # and keep-best drops one per cluster member beyond the keeper
    assert r.n_near_dropped > 0
    assert r.n_kept == r.n_in - r.n_exact_dropped - r.n_near_dropped
    assert r.n_span_pairs >= 0


# ----------------------------------------------------------- gopher_rules


def test_gopher_rules_accounting_consistent(spark, sf_dir):
    """Per-source failure counts are each bounded by n_docs; n_keep can
    never exceed docs failing zero rules (n_docs - max single-rule
    failures is an upper bound only rule-by-rule, so assert the exact
    complement on a hand-recomputed doc-level frame instead)."""
    from oil_wells_data_wrangling_spark.operators.textstats import gopher_rules
    from oil_wells_data_wrangling_spark.sources.readers import load_tables

    agg = {r["source"]: r for r in gopher_rules(spark, sf_dir).collect()}
    docs = load_tables(spark, sf_dir).documents.select("source", "text").collect()

    import collections

    exp = collections.defaultdict(lambda: [0, 0, 0, 0, 0, 0])
    for r in docs:
        ws = r.text.split(" ")
        n, d = len(ws), len(set(ws))
        sl = sum(len(w) for w in ws)
        st = sum(1 for w in ws if w in ("a", "the"))
        f = [
            int(n < 20 or n > 80),
            int(4 * n > sl or sl > 5 * n),
            int(st < 2),
            int(5 * d < 2 * n),
        ]
        e = exp[r.source]
        e[0] += 1
        for i in range(4):
            e[1 + i] += f[i]
        e[5] += int(sum(f) == 0)
    for src, e in exp.items():
        row = agg[src]
        got = [
            row.n_docs,
            row.fail_word_count,
            row.fail_mean_word_len,
            row.fail_stopword,
            row.fail_repetition,
            row.n_keep,
        ]
        assert got == e, f"{src}: {got} != {e}"


def test_gopher_rules_single_scan_no_explode(spark, sf_dir):
    """The docstring claims the token array never leaves the row: the
    plan must contain no Generate (explode) and exactly the rollup's
    partial+final exchange pair."""
    from oil_wells_data_wrangling_spark.operators.textstats import gopher_rules

    plan = gopher_rules(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert "Generate" not in plan
    assert plan.count("Exchange") <= 2


# --------------------------------------------------------------- c4_rules


def test_c4_rules_accounting_matches_python_recompute(spark, sf_dir):
    """Re-derive every per-source column from a doc-level Python
    recompute of the injected corpus — pins the line chunking, the
    terminal-punct injection phase, both doc-level substring flags,
    and the keep complement."""
    from oil_wells_data_wrangling_spark.operators.textstats import (
        _C4_LINE,
        c4_rules,
    )
    from oil_wells_data_wrangling_spark.sources.readers import load_tables

    agg = {r["source"]: r for r in c4_rules(spark, sf_dir).collect()}
    docs = load_tables(spark, sf_dir).documents.select(
        "doc_id", "source", "text"
    ).collect()

    import collections

    exp = collections.defaultdict(lambda: [0] * 7)
    for r in docs:
        if r.doc_id % 7 == 0:
            text = "lorem ipsum " + r.text
        elif r.doc_id % 11 == 0:
            text = "{ " + r.text
        else:
            text = r.text
        ws = text.split(" ")
        n_lines = (len(ws) + _C4_LINE - 1) // _C4_LINE
        kept = 0
        for pos in range(n_lines):
            line = " ".join(ws[pos * _C4_LINE : (pos + 1) * _C4_LINE])
            if (r.doc_id + pos) % 3 != 2:
                line += "."
            if line.endswith(".") and len(line.split(" ")) >= 3:
                kept += 1
        f_lorem = int("lorem ipsum" in text)
        f_brace = int("{" in text)
        f_short = int(kept < 3)
        e = exp[r.source]
        e[0] += 1
        e[1] += n_lines
        e[2] += kept
        e[3] += f_lorem
        e[4] += f_brace
        e[5] += f_short
        e[6] += int(f_lorem + f_brace + f_short == 0)
    for src, e in exp.items():
        row = agg[src]
        got = [
            row.n_docs,
            row.n_lines,
            row.n_lines_kept,
            row.drop_lorem,
            row.drop_brace,
            row.drop_short,
            row.n_keep,
        ]
        assert got == e, f"{src}: {got} != {e}"


def test_c4_rules_scalar_exchanges_no_hof(spark, sf_dir):
    """The docstring's scale claims: line text never crosses an
    exchange (both exchange rows are id/flag/count scalars — no string
    wider than `source`), the per-line predicate is codegen (no
    interpreted higher-order function in the plan), and there are
    exactly the doc-agg + source-rollup exchange pairs."""
    from oil_wells_data_wrangling_spark.operators.textstats import c4_rules

    qe = c4_rules(spark, sf_dir)._jdf.queryExecution()
    plan = qe.executedPlan().toString()
    # explode of line positions is expected; interpreted HOFs are not
    assert "LambdaFunction" not in plan
    assert plan.count("Exchange") <= 4  # partial/final x (doc agg, rollup)
    # no 'line' or 'text'/'words' column survives into any exchange:
    # every hashpartitioning clause keys on doc_id/source/flags only
    import re

    for m in re.finditer(r"hashpartitioning\(([^)]*)\)", plan):
        keys = m.group(1)
        assert "line" not in keys and "words" not in keys and "text" not in keys, (
            keys
        )


# ------------------------------------------------- tokenizer_fertility twin


def test_tokenizer_fertility_arrow_matches_sql_spec(spark, sf_dir):
    """The registered Arrow twin must be bit-identical to the
    SQL-expression spec — on the real corpus AND on adversarial text
    shapes (empty/whitespace-only/leading/trailing/double spaces,
    2/3/4-byte UTF-8 characters, digit/alpha runs at batch-scale
    lengths, dashes that collide with the zh injection)."""
    from oil_wells_data_wrangling_spark.operators.textstats import (
        tokenizer_fertility_arrow,
        tokenizer_fertility_sql_form,
    )
    from oil_wells_data_wrangling_spark.sources.readers import load_tables

    def canon(df):
        p = df.toPandas().sort_values("lang").reset_index(drop=True)
        return p.reindex(sorted(p.columns), axis=1)

    docs = load_tables(spark, sf_dir).documents
    assert canon(tokenizer_fertility_arrow(docs)).equals(
        canon(tokenizer_fertility_sql_form(docs))
    )

    rows = [
        ("en", ""),
        ("en", " "),
        ("en", "   "),
        ("zh", ""),
        ("zh", "a  b"),
        ("fr", "héllo wörld"),
        ("zh", "abc123!@# end"),
        ("fr", " leading"),
        ("en", "trailing "),
        ("zh", "--already-dashes --"),
        ("fr", "a.b.c . ."),
        ("de", "ümlaut ß€𝄞 astral"),
        ("en", "a" * 5000 + " " + "9" * 5000),
        ("zh", "mixed0a0b0c space  double"),
        ("fr", "."),
        ("en", "{brace}"),
    ]
    adv = spark.createDataFrame(rows, "lang string, text string")
    assert canon(tokenizer_fertility_arrow(adv)).equals(
        canon(tokenizer_fertility_sql_form(adv))
    )


# -------------------------------------------------------- packing_efficiency


def test_packing_efficiency_accounting(spark, sf_dir):
    """Audit columns re-derive exactly from pack_sequences' own bins,
    and the invariants hold: n_bins >= lower_bound_bins is NOT
    guaranteed bin-for-bin by a streaming packer (overflow bins carry
    >budget tokens), but capacity accounting must balance and ppm must
    floor-divide."""
    from oil_wells_data_wrangling_spark.operators.corpus import (
        _BUDGET,
        pack_sequences,
        packing_efficiency,
    )

    bins = pack_sequences(spark, sf_dir).collect()
    import collections

    exp = collections.defaultdict(lambda: [0, 0, 0, 0])
    for r in bins:
        e = exp[r.shard]
        e[0] += 1
        e[1] += r.total_tokens
        e[2] += int(r.total_tokens > _BUDGET)
        e[3] += max(0, _BUDGET - r.total_tokens)
    got = {r.shard: r for r in packing_efficiency(spark, sf_dir).collect()}
    assert set(got) == set(exp)
    for shard, e in exp.items():
        r = got[shard]
        assert [r.n_bins, r.total_tokens, r.n_overflow, r.padding_tokens] == e
        assert r.lower_bound_bins == (e[1] + _BUDGET - 1) // _BUDGET
        assert r.waste_ppm == 1000000 * e[3] // (e[0] * _BUDGET)


def test_packing_efficiency_no_extra_exchange(spark, sf_dir):
    """The audit rollup keys on the shard the packer's window already
    partitioned by — the whole plan must carry exactly the packer's
    one exchange and no SinglePartition."""
    from oil_wells_data_wrangling_spark.operators.corpus import (
        packing_efficiency,
    )

    plan = (
        packing_efficiency(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "SinglePartition" not in plan
    assert plan.count("Exchange") <= 1


# ------------------------------------------------------ link_graph_pagerank


def test_link_edges_real_parsing_drops_relative_and_self(spark):
    """The edge extractor must parse anchors out of real markup: keep
    absolute https cross-host links (weighted by multiplicity), drop
    relative hrefs (no host) and host-level self-loops."""
    from oil_wells_data_wrangling_spark.operators.graph import link_edges

    rows = [
        (
            "a.com",
            '<a href="/rel">r</a><a href="https://a.com/self">s</a>'
            '<a href="https://b.com/x">1</a><a href="https://b.com/y">2</a>',
        ),
        ("b.com", '<a href="https://c.com/z">1</a>'),
        ("c.com", "<p>no links at all</p>"),
    ]
    pages = spark.createDataFrame(rows, "src string, html string")
    edges = {(r.src, r.dst): r.w for r in link_edges(pages).collect()}
    assert edges == {("a.com", "b.com"): 2, ("b.com", "c.com"): 1}


def test_link_graph_pagerank_no_corpus_join(spark, sf_dir):
    """domain_pagerank's synthetic edge stage joins documents to
    documents; this operator must NOT — the corpus-sized stage is one
    scan + explode + partial agg, so the edge subplan carries exactly
    one exchange and zero joins."""
    from oil_wells_data_wrangling_spark.operators.graph import (
        _LG_PAGE_SPARK,
        link_edges,
    )
    from oil_wells_data_wrangling_spark.sources.readers import load_tables

    from pyspark.sql import functions as F

    t = load_tables(spark, sf_dir)
    pages = t.documents.select(
        F.concat(
            F.lit("site"),
            (F.col("doc_id") % 20).cast("string"),
            F.lit(".example.com"),
        ).alias("src"),
        F.expr(_LG_PAGE_SPARK).alias("html"),
    )
    plan = (
        link_edges(pages)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Join" not in plan
    assert plan.count("Exchange") <= 1


# ----------------------------------------------------------- corpus_shuffle


def test_corpus_shuffle_checksum_pins_order(spark, sf_dir):
    """Recompute the per-shard checksum from a Python re-derivation of
    the shuffled order; then prove the checksum is order-SENSITIVE by
    swapping two adjacent positions in the recompute and checking it
    diverges (membership-only checksums would not)."""
    import hashlib

    from oil_wells_data_wrangling_spark.operators.corpus import (
        _SHUF_PRIME,
        _SHUF_SHARDS,
        corpus_shuffle,
    )
    from oil_wells_data_wrangling_spark.sources.readers import load_tables

    ids = [
        r.doc_id
        for r in load_tables(spark, sf_dir).documents.select("doc_id").collect()
    ]
    shards = {}
    for d in ids:
        h = hashlib.md5(f"shuf_v1_{d}".encode()).hexdigest()
        shards.setdefault(int(h[:8], 16) % _SHUF_SHARDS, []).append((h[8:24], d))
    got = {r.shard: r for r in corpus_shuffle(spark, sf_dir).collect()}
    assert set(got) == set(shards)
    p = _SHUF_PRIME
    for shard, members in shards.items():
        order = [d for _, d in sorted(members)]
        chk = sum((d % p) * (pos % p) % p for pos, d in enumerate(order, 1)) % p
        r = got[shard]
        assert (r.n_docs, r.min_doc_id, r.order_checksum) == (
            len(order),
            min(order),
            chk,
        )
        if len(order) >= 2:
            swapped = order[:]
            swapped[0], swapped[1] = swapped[1], swapped[0]
            chk2 = (
                sum((d % p) * (i % p) % p for i, d in enumerate(swapped, 1)) % p
            )
            assert chk2 != chk, "checksum must be order-sensitive"


def test_corpus_shuffle_one_exchange_no_global_sort(spark, sf_dir):
    from oil_wells_data_wrangling_spark.operators.corpus import corpus_shuffle

    plan = (
        corpus_shuffle(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "SinglePartition" not in plan
    assert plan.count("Exchange") <= 1


# -------------------------------------------------------- lm_quality_buckets


def test_lm_quality_buckets_matches_python_recompute(spark, sf_dir):
    """Full re-derivation: train the digit-width bigram LM on the
    reference domain in Python, score every doc, bucket, roll up —
    pins the minsup floor, the unseen-bigram max cost, and the integer
    ppm/bucket arithmetic."""
    import collections

    from oil_wells_data_wrangling_spark.operators.textstats import (
        _LM_MINSUP,
        _LM_REF_SOURCE,
        lm_quality_buckets,
    )
    from oil_wells_data_wrangling_spark.sources.readers import load_tables

    docs = load_tables(spark, sf_dir).documents.select(
        "doc_id", "source", "text"
    ).collect()
    counts = collections.Counter()
    for r in docs:
        if r.source != _LM_REF_SOURCE:
            continue
        w = r.text.split(" ")
        counts.update(f"{a} {b}" for a, b in zip(w, w[1:]))
    lm = {
        bg: len(str(n)) for bg, n in counts.items() if n >= _LM_MINSUP
    }
    maxd = max(lm.values())
    exp = collections.defaultdict(lambda: [0, 0])
    for r in docs:
        w = r.text.split(" ")
        bgs = [f"{a} {b}" for a, b in zip(w, w[1:])]
        if not bgs:
            continue
        cost = sum(maxd - lm.get(bg, 0) for bg in bgs)
        ppm = 1000000 * cost // (len(bgs) * maxd)
        e = exp[(r.source, ppm // 100000)]
        e[0] += 1
        e[1] += ppm
    got = {
        (r.source, r.bucket): (r.n_docs, r.sum_ppm)
        for r in lm_quality_buckets(spark, sf_dir).collect()
    }
    assert got == {k: tuple(v) for k, v in exp.items()}


def test_lm_quality_buckets_broadcasts_lm_table(spark, sf_dir):
    """The LM table must broadcast (the doc-side bigram stream never
    shuffles on the bigram key) and the per-doc agg must partial-agg
    before its exchange."""
    from oil_wells_data_wrangling_spark.operators.textstats import (
        lm_quality_buckets,
    )

    plan = (
        lm_quality_buckets(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin [bg" in plan
    import re

    bg_exchanges = {
        m.group(1)
        for m in re.finditer(r"hashpartitioning\((bg[^,)]*)", plan)
    }
    # only the reference-slice LM construction (count agg + its maxd
    # input; one expr id when the cached table is reused) may shuffle
    # on the bigram key — never the corpus stream (distinct expr ids,
    # not occurrences: InMemoryRelation reprints its subtree per
    # consumer site)
    assert len(bg_exchanges) <= 2, bg_exchanges
    assert re.search(r"hashpartitioning\(doc_id#\d+L, source#\d+", plan)
