"""Round-11 operator tests: an INDEPENDENT pure-Python reference for
ulm_train_steps (the strongest depth check — a second implementation,
not a second run), plus semantic property tests for the new ops that
oracle parity alone can't express (Bloom's no-false-negative guarantee,
k-center's monotone radii, BT's win-order sanity)."""

from __future__ import annotations

from collections import Counter

def _ulm_reference(texts: list[str]):
    """Pure-Python ulm_train_steps: same integer rules, no Spark."""
    from oil_wells_data_wrangling_spark.operators.textstats import (
        _ULM_CAP,
        _ULM_ITERS,
        _ULM_LMAX,
        _ULM_V,
    )

    words = Counter()
    for t in texts:
        for w in t.split(" "):
            words[w[:_ULM_CAP]] += 1

    def instances(w):
        for s in range(len(w)):
            for l in range(1, _ULM_LMAX + 1):
                if s + l <= len(w):
                    yield s, l, w[s : s + l]

    cnt0 = Counter()
    for w, f in words.items():
        for _, _, p in instances(w):
            cnt0[p] += f

    def intlog(x: int) -> int:
        return len(bin(x + 1)) - 2  # bin() prefixes '0b'

    cnt = dict(cnt0)
    for _ in range(_ULM_ITERS):
        lt = intlog(sum(cnt.values()))
        sc = {p: intlog(c) - lt for p, c in cnt.items()}
        new = {p: 0 for p in cnt0}
        for w, f in words.items():
            n = len(w)
            dpf = [0] + [None] * n
            for i in range(1, n + 1):
                dpf[i] = max(
                    dpf[i - l] + sc[w[i - l : i]]
                    for l in range(1, min(_ULM_LMAX, i) + 1)
                )
            dpb = [None] * n + [0]
            for i in range(n - 1, -1, -1):
                dpb[i] = max(
                    dpb[i + l] + sc[w[i : i + l]]
                    for l in range(1, min(_ULM_LMAX, n - i) + 1)
                )
            for s, l, p in instances(w):
                if dpf[s] + sc[p] + dpb[s + l] == dpf[n]:
                    new[p] += f
        cnt = new
    lt = intlog(sum(cnt.values()))
    ranked = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:_ULM_V]
    return {(p, c, intlog(c) - lt) for p, c in ranked}


def test_ulm_matches_pure_python_reference(spark, sf_dir):
    from oil_wells_data_wrangling_spark.operators.textstats import (
        ulm_train_steps,
    )

    texts = [
        r.text
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("text")
        .collect()
    ]
    expect = _ulm_reference(texts)
    got = {
        (r.piece, r.n_used, r.score_fp)
        for r in ulm_train_steps(spark, sf_dir).collect()
    }
    assert got == expect


def test_ulm_every_word_segmentable(spark, sf_dir):
    """Single-char pieces are always in the seed vocabulary, so every
    word must admit a segmentation: the learned vocab's single-char
    pieces must cover the corpus alphabet."""
    from oil_wells_data_wrangling_spark.operators.textstats import (
        _ULM_CAP,
        ulm_train_steps,
    )

    vocab = {r.piece for r in ulm_train_steps(spark, sf_dir).collect()}
    alphabet = set()
    for r in (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("text")
        .collect()
    ):
        for w in r.text.split(" "):
            alphabet |= set(w[:_ULM_CAP])
    # top-V keeps the heavy pieces; chars used by ANY optimal path
    # survive EM with nonzero counts — the corpus alphabet is small
    # enough here that all of it ranks inside V
    assert alphabet <= {p for p in vocab if len(p) == 1} | {
        p[i] for p in vocab for i in range(len(p))
    }


def test_bloom_blocklist_no_false_negatives(spark, sf_dir):
    """Bloom's contract: every exact hit is a bloom hit, per source —
    n_exact_hits <= n_bloom_hits and n_false_pos = bloom - exact >= 0."""
    from oil_wells_data_wrangling_spark.operators.textstats import (
        bloom_blocklist,
    )

    for r in bloom_blocklist(spark, sf_dir).collect():
        assert r.n_exact_hits <= r.n_bloom_hits
        assert r.n_false_pos == r.n_bloom_hits - r.n_exact_hits


def test_kcenter_radii_monotone_nonincreasing(spark, sf_dir):
    """Greedy k-center's selection radius sequence never increases
    (each pick removes the farthest point): the 2-approx certificate
    the docstring sells must actually hold."""
    from oil_wells_data_wrangling_spark.operators.similarity import (
        kcenter_select,
    )

    rows = sorted(kcenter_select(spark, sf_dir).collect(), key=lambda r: r.pick)
    radii = [r.radius_sq for r in rows[1:]]  # seed has radius 0 by def
    assert all(a >= b for a, b in zip(radii, radii[1:])), radii
    assert len({r.vec_id for r in rows}) == len(rows)  # picks distinct


def test_preference_bt_strengths_respect_dominance(spark, sf_dir):
    """The max-normalized top strength is exactly 1e6, every strength
    is in [1, 1e6], and a source that never wins sits at the floor."""
    from oil_wells_data_wrangling_spark.operators.corpus import (
        preference_bt,
    )

    rows = preference_bt(spark, sf_dir).collect()
    assert rows
    assert max(r.bt_fp for r in rows) == 1_000_000
    for r in rows:
        assert 1 <= r.bt_fp <= 1_000_000
        assert 0 <= r.n_wins <= r.n_games
        if r.n_wins == 0:
            assert r.bt_fp == 1


def test_stream_cdc_matches_batch(spark, sf_dir):
    """The streaming snapshot must equal batch cdc_apply row-for-row —
    the exactly-incremental property, checked engine-side (the oracle
    checks it against DuckDB; this checks Spark against Spark)."""
    from oil_wells_data_wrangling_spark.operators.analytics import (
        cdc_apply,
        stream_cdc_apply,
    )

    batch = sorted(map(tuple, cdc_apply(spark, sf_dir).collect()))
    stream = sorted(map(tuple, stream_cdc_apply(spark, sf_dir).collect()))
    assert stream == batch


def test_caption_align_real_png_uses_decoded_pixels(spark):
    """Real PNG payloads must take image features from DECODED pixels,
    not raw file bytes (the decode hook mm_caption_align sells): the
    same pixels re-compressed at a different zlib level give different
    FILE bytes but must produce the IDENTICAL feature vector, and that
    vector must differ from the raw-bytes stub interpretation."""
    import struct
    import zlib

    from oil_wells_data_wrangling_spark.operators.multimodal import (
        _ca_img_vec,
        caption_align_features,
    )
    from tests.test_multimodal_real import _chunk, _gradient, encode_png

    px = _gradient(8, 4)
    png = encode_png(8, 4, px)

    # rebuild with the IDAT re-compressed at level 1: same pixels,
    # different bytes
    raw = b"".join(
        b"\x00" + px[y * 8 * 3 : (y + 1) * 8 * 3] for y in range(4)
    )
    ihdr = struct.pack(">IIBBBBB", 8, 4, 8, 2, 0, 0, 0)
    png2 = (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw, 1))
        + _chunk(b"IEND", b"")
    )
    assert png2 != png
    v_pixels = _ca_img_vec(png)
    assert _ca_img_vec(png2) == v_pixels  # features follow pixels, not bytes
    padded = png + b"\x00" * 16
    v_raw = [
        ((padded[2 * d] << 8) | padded[2 * d + 1]) % 4096 for d in range(8)
    ]
    assert v_pixels != v_raw  # decode hook actually fired

    rows = [
        ("srcA", bytearray(png), "a scenic caption", "wrong caption"),
        ("srcA", bytearray(b"not a png"), "plain caption", "other caption"),
    ]
    df = spark.createDataFrame(
        rows, "source string, payload binary, caption string, caption_x string"
    ).repartition(2)
    rows_out = caption_align_features(df).collect()
    assert len(rows_out) == 2  # one scored row per pair, both paths
    assert all(r.dot_m >= 0 and r.dot_x >= 0 for r in rows_out)


def test_stream_crawl_corpus_matches_batch(spark, sf_dir):
    """The streamed corpus must equal batch crawl_to_corpus row-for-row
    (Spark vs Spark; the oracle checks both vs DuckDB) — including the
    cross-wave dups that only a WORKING persisted state table dedups."""
    from oil_wells_data_wrangling_spark.operators.webtable import (
        crawl_to_corpus,
        stream_crawl_corpus,
    )

    batch = sorted(map(tuple, crawl_to_corpus(spark, sf_dir).collect()))
    stream = sorted(map(tuple, stream_crawl_corpus(spark, sf_dir).collect()))
    assert stream == batch


def test_ulm_tokenize_matches_pure_python_reference(spark, sf_dir):
    """Independent Python implementation of the inference pass: same
    vocab rule (top-V ∪ single chars), same two-chain Viterbi piece
    extraction — per-source fertility must agree exactly."""
    from oil_wells_data_wrangling_spark.operators.textstats import (
        _ULM_CAP,
        _ULM_EXCL,
        _ULM_ITERS,
        _ULM_LMAX,
        _ULM_V,
        ulm_tokenize,
    )

    rows = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("source", "text")
        .collect()
    )
    texts = [r.text for r in rows]

    # rebuild final counts with the training reference
    from collections import Counter

    def intlog(x):
        return len(bin(x + 1)) - 2

    # reuse the trainer reference up to final counts
    ref_vocab = _ulm_reference(texts)  # {(piece, cnt, sc)} top-V
    # final scores for ALL pieces (needed for single-char fill)
    words = Counter()
    for t in texts:
        for w in t.split(" "):
            words[w[:_ULM_CAP]] += 1
    cnt0 = Counter()
    for w, f in words.items():
        for s in range(len(w)):
            for l in range(1, _ULM_LMAX + 1):
                if s + l <= len(w):
                    cnt0[w[s : s + l]] += f
    cnt = dict(cnt0)
    for _ in range(_ULM_ITERS):
        lt = intlog(sum(cnt.values()))
        sc = {p: intlog(c) - lt for p, c in cnt.items()}
        new = {p: 0 for p in cnt0}
        for w, f in words.items():
            n = len(w)
            dpf = [0] + [None] * n
            for i in range(1, n + 1):
                dpf[i] = max(
                    dpf[i - l] + sc[w[i - l : i]]
                    for l in range(1, min(_ULM_LMAX, i) + 1)
                )
            dpb = [None] * n + [0]
            for i in range(n - 1, -1, -1):
                dpb[i] = max(
                    dpb[i + l] + sc[w[i : i + l]]
                    for l in range(1, min(_ULM_LMAX, n - i) + 1)
                )
            for s in range(n):
                for l in range(1, min(_ULM_LMAX, n - s) + 1):
                    p = w[s : s + l]
                    if dpf[s] + sc[p] + dpb[s + l] == dpf[n]:
                        new[p] += f
        cnt = new
    lt = intlog(sum(cnt.values()))
    scf = {p: intlog(c) - lt for p, c in cnt.items()}
    vocab = {p: scf[p] for p, _, _ in ref_vocab}
    vocab.update({p: scf[p] for p in scf if len(p) == 1})

    def seg(w):
        n = len(w)
        A = [0] + [None] * n
        B = [0] + [None] * n
        for i in range(1, n + 1):
            opts_a, opts_b = [], []
            for l in range(1, min(_ULM_LMAX, i) + 1):
                s = vocab.get(w[i - l : i], _ULM_EXCL)
                opts_a.append(A[i - l] + s)
                opts_b.append(B[i - l] + (s * 64 - 1))
            A[i], B[i] = max(opts_a), max(opts_b)
        return A[n], 64 * A[n] - B[n]

    expect = {}
    for r in rows:
        src_ = r.source
        agg = expect.setdefault(src_, [0, 0, 0])
        for w in r.text.split(" "):
            w = w[:_ULM_CAP]
            sstar, pstar = seg(w)
            agg[0] += 1
            agg[1] += pstar
            agg[2] += sstar
    got = {
        r.source: (r.n_tokens, r.n_pieces, r.score_sum, r.fertility_ppm)
        for r in ulm_tokenize(spark, sf_dir).collect()
    }
    assert set(got) == set(expect)
    for s, (nt, np_, sc_) in expect.items():
        assert got[s] == (nt, np_, sc_, np_ * 1_000_000 // nt), (s, got[s])


def _phys_plan(spark, sf_dir, name):
    from oil_wells_data_wrangling_spark.plans.registry import REGISTRY, _load_all

    _load_all()
    return (
        REGISTRY[name].fn(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    )


def test_round11_in_scan_ops_single_exchange(spark, sf_dir):
    """importance_resample / fim_plan / bloom_blocklist compute
    everything inside the scan; the ONLY exchange is the bounded
    rollup. A second exchange means a probe join or a per-token
    shuffle crept in."""
    for name in ("importance_resample", "fim_plan", "bloom_blocklist"):
        plan = _phys_plan(spark, sf_dir, name)
        assert plan.count("Exchange") == 1, f"{name} grew an exchange"
        assert "Join" not in plan, f"{name} grew a join"
        assert "EvalPython" not in plan, name


def test_soft_dedup_no_text_in_exchange(spark, sf_dir):
    """The dedup shuffles must carry (hash, source) scalars — the text
    column never leaves the scan (dedup_exact's contract)."""
    import re

    plan = _phys_plan(spark, sf_dir, "soft_dedup_weights")
    assert not re.search(r"Exchange hashpartitioning\(text", plan)
    assert "EvalPython" not in plan


def _run(spark, sf_dir, name):
    from oil_wells_data_wrangling_spark.plans.registry import REGISTRY, _load_all

    _load_all()
    return REGISTRY[name].fn(spark, sf_dir).toPandas()


def test_grpo_advantage_group_invariants(spark, sf_dir):
    """Mean-centered numerators cancel within every group (Σ adv = 0 —
    the property that makes the group mean a valid baseline), the
    variance numerator is the same nonneg value group-wide, and the
    percentile permille spans [0, 1000]."""
    pdf = _run(spark, sf_dir, "grpo_advantage")
    g = pdf.groupby("prompt_id")
    assert (g["adv_num"].sum() == 0).all()
    assert (pdf["var_num"] >= 0).all()
    assert (g["var_num"].nunique() == 1).all()
    assert pdf["pct_rank_permille"].between(0, 1000).all()
    # adv_num reconstructs as n*r - sum(r)
    s = g["reward"].transform("sum")
    n = g["reward"].transform("count")
    assert (pdf["adv_num"] == n * pdf["reward"] - s).all()


def test_rrf_fusion_score_consistent_with_ranks(spark, sf_dir):
    """Every fused score must equal the RRF formula applied to the two
    contributing ranks (nulls contribute zero), and the fused list is
    ordered by (score desc, doc_id)."""
    pdf = _run(spark, sf_dir, "rrf_fusion").sort_values("fused_rank")
    for _, r in pdf.iterrows():
        exp = 0
        if r["rank_a"] == r["rank_a"] and r["rank_a"] is not None:  # not NaN
            exp += 1_000_000 // (60 + int(r["rank_a"]))
        if r["rank_b"] == r["rank_b"] and r["rank_b"] is not None:
            exp += 1_000_000 // (60 + int(r["rank_b"]))
        assert int(r["rrf_fp"]) == exp
    scores = list(zip(-pdf["rrf_fp"], pdf["doc_id"]))
    assert scores == sorted(scores)


def test_secrets_scan_recovers_exactly_the_injections(spark, sf_dir):
    """Each doc at doc_id % 5 in {1,2,3} carries exactly one injected
    credential; the detectors must flag exactly those docs — no false
    positives from the clean corpus, no misses."""
    import duckdb

    pdf = _run(spark, sf_dir, "secrets_scan")
    exp = duckdb.sql(
        f"SELECT source, count(*) AS n, "
        f"sum(CASE WHEN doc_id % 5 IN (1,2,3) THEN 1 ELSE 0 END) AS f "
        f"FROM read_parquet('{sf_dir}/documents.parquet') GROUP BY source"
    ).df()
    m = pdf.merge(exp, on="source")
    assert (m["n_docs"] == m["n"]).all()
    assert (m["n_flagged_docs"] == m["f"]).all()
    assert (
        m["n_aws_keys"] + m["n_gh_tokens"] + m["n_hex_secrets"]
        == m["n_flagged_docs"]
    ).all()


def test_license_classify_partition_of_sources(spark, sf_dir):
    """License classes partition each source's docs (shares sum to the
    doc count; permille within floor-rounding of 1000) and the
    permissive flag tracks the class."""
    pdf = _run(spark, sf_dir, "license_classify")
    g = pdf.groupby("source")
    per_src = g["n_docs"].sum()
    # every doc classified exactly once
    import duckdb

    exp = duckdb.sql(
        f"SELECT source, count(*) AS n FROM "
        f"read_parquet('{sf_dir}/documents.parquet') GROUP BY source"
    ).df().set_index("source")["n"]
    for src, n in per_src.items():
        assert n == exp[src]
    assert set(pdf["license"]) == {"mit", "apache-2.0", "gpl", "unknown"}
    assert (
        pdf["permissive"] == pdf["license"].isin(["mit", "apache-2.0"])
    ).all()
    # permille floor-rounds: sum within 4 of 1000 per source
    s = g["share_permille"].sum()
    assert ((s <= 1000) & (s >= 1000 - 4)).all()


def test_hard_negative_labels_never_match_anchor(spark, sf_dir):
    """Every mined negative must carry a label different from its
    anchor's, and each anchor gets exactly k negatives."""
    import duckdb

    pdf = _run(spark, sf_dir, "hard_negative_mining")
    labels = duckdb.sql(
        f"SELECT vec_id, label FROM read_parquet('{sf_dir}/embeddings.parquet')"
    ).df().set_index("vec_id")["label"]
    for _, r in pdf.iterrows():
        assert r["neighbor_label"] != labels[r["query_id"]]
        assert r["neighbor_label"] == labels[r["neighbor_id"]]
    assert (pdf.groupby("query_id").size() == 5).all()


def test_moe_router_conservation(spark, sf_dir):
    """Top-1 and top-2 assignments each sum to N (every token routes to
    exactly two distinct experts), and n_routed = n_top1 + n_top2."""
    import duckdb

    pdf = _run(spark, sf_dir, "moe_router_stats")
    n = duckdb.sql(
        f"SELECT count(*) FROM read_parquet('{sf_dir}/embeddings.parquet')"
    ).fetchone()[0]
    assert pdf["n_top1"].sum() == n
    assert pdf["n_top2"].sum() == n
    assert (pdf["n_routed"] == pdf["n_top1"] + pdf["n_top2"]).all()


def test_curriculum_schedule_monotone(spark, sf_dir):
    """Phases ordered by bucket have strictly increasing cumulative
    tokens; the first phase starts at permille 0; cum of the last
    phase equals the corpus total."""
    pdf = _run(spark, sf_dir, "curriculum_schedule").sort_values("phase")
    assert pdf["cum_tokens"].is_monotonic_increasing
    assert pdf.iloc[0]["start_permille"] == 0
    assert pdf.iloc[-1]["cum_tokens"] == pdf["n_tokens"].sum()
    # cum reconstructs as the running sum of per-phase tokens
    assert (pdf["cum_tokens"].values == pdf["n_tokens"].cumsum().values).all()


def test_warc_dedup_digest_crawl_semantics(spark, sf_dir):
    """Crawl 1 owns every payload (zero dups); crawl 2's new payloads
    are exactly the doc_id % 3 == 0 changed pages."""
    import duckdb

    pdf = _run(spark, sf_dir, "warc_dedup_digest").set_index("crawl_id")
    n, changed = duckdb.sql(
        f"SELECT count(*), sum(CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 0 END) "
        f"FROM read_parquet('{sf_dir}/documents.parquet')"
    ).fetchone()
    assert pdf.loc[1, "n_records"] == n and pdf.loc[1, "n_dup_payloads"] == 0
    assert pdf.loc[2, "n_new_payloads"] == changed
    assert pdf.loc[2, "n_dup_payloads"] == n - changed


def test_round11b_single_corpus_pass_shapes(spark, sf_dir):
    """The restructured curation/post-training ops hold their pinned
    single-corpus-pass shapes: grpo = one scan + ONE exchange (window
    aggregates ride the rank window's shuffle); moe = one scan;
    warc_dedup = two crawl scans + window-MIN attribution (no agg+join
    re-scan); the checkpointed ops (license grid, curriculum buckets)
    replay RDD leaves — zero FileScans in the final plan."""
    cases = {
        "grpo_advantage": dict(scans=1, max_exch=1),
        "moe_router_stats": dict(scans=1, max_exch=4),
        "warc_dedup_digest": dict(scans=2, max_exch=2),
        "license_classify": dict(scans=0, max_exch=4),
        "curriculum_schedule": dict(scans=0, max_exch=4),
    }
    for name, want in cases.items():
        p = _phys_plan(spark, sf_dir, name)
        assert p.count("FileScan") == want["scans"], f"{name} re-scans"
        n_exch = p.count("Exchange") - p.count("ReusedExchange")
        assert n_exch <= want["max_exch"], f"{name} grew exchanges: {n_exch}"
        assert "EvalPython" not in p, name


def test_rrf_fusion_rank_filters_compile_to_take_ordered(spark, sf_dir):
    """All three global rank filters must push to per-partition top-K
    (TakeOrderedAndProject) — a plain unpartitioned WindowExec here is
    the single-task choke the sweep bans."""
    p = _phys_plan(spark, sf_dir, "rrf_fusion")
    assert p.count("TakeOrderedAndProject") == 3


def test_moe_router_matches_numpy_reference(spark, sf_dir):
    """Independent second implementation: recompute the routing in
    numpy straight from the parquet (quantize → signed dots → top-2
    with ties to the lower expert id) and compare the full grid."""
    import duckdb
    import numpy as np

    from oil_wells_data_wrangling_spark.operators.similarity import (
        _MOE_E,
        _MOE_SCALE,
        _moe_signs,
    )

    emb = duckdb.sql(
        f"SELECT embedding FROM read_parquet('{sf_dir}/embeddings.parquet') ORDER BY vec_id"
    ).fetchall()
    q = np.floor(
        np.array([e[0] for e in emb], dtype=np.float64) * _MOE_SCALE
    ).astype(np.int64)
    w = np.array(_moe_signs(), dtype=np.int64)  # (E, D)
    scores = q @ w.T  # (N, E) exact int64
    # top-2 with ties to lower expert id: lexsort on (-score, e)
    order = np.lexsort((np.arange(_MOE_E)[None, :].repeat(len(q), 0), -scores), axis=1)
    top1, top2 = order[:, 0], order[:, 1]
    pdf = _run(spark, sf_dir, "moe_router_stats").set_index("expert")
    for e in range(_MOE_E):
        n1 = int((top1 == e).sum())
        n2 = int((top2 == e).sum())
        if n1 + n2 == 0:
            assert e not in pdf.index
            continue
        assert pdf.loc[e, "n_top1"] == n1, e
        assert pdf.loc[e, "n_top2"] == n2, e


def test_surt_properties():
    """surt never raises, is scheme-insensitive, and is idempotent-safe
    on already-keyed input prefixes (no scheme → host parse still
    sound)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from oil_wells_data_wrangling_spark.sources.warc import surt

    @settings(max_examples=200, deadline=None)
    @given(st.text(max_size=80))
    def _never_raises(s):
        r = surt(s)
        assert isinstance(r, str)

    _never_raises()
    assert surt("HTTP://A.B/c") == surt("https://a.b/c")
    assert surt("https://example.com/p") == surt("http://www.example.com/p")
