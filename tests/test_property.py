"""Property-based round-trips: the parsers must recover ground truth for
ANY validly-formatted input, not just the synthesized corpus."""

from __future__ import annotations

import pytest
from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from oil_wells_data_wrangling_spark.functions.wrangling import (
    dms_to_decimal,
    normalize_api,
)

pytestmark = pytest.mark.filterwarnings("ignore")


@st.composite
def dms_case(draw):
    deg = draw(st.integers(0, 179))
    mn = draw(st.integers(0, 59))
    sec = draw(st.integers(0, 59))
    hemi = draw(st.sampled_from(["N", "S", "E", "W"]))
    prefix = draw(st.booleans())
    raw = (
        f"{hemi} {deg}° {mn}' {sec}\"" if prefix else f"{deg}° {mn}' {sec}\" {hemi}"
    )
    val = deg + mn / 60 + sec / 3600
    return raw, -val if hemi in ("S", "W") else val


@settings(max_examples=30, deadline=None)
@given(case=dms_case())
def test_dms_roundtrip(spark_prop, case):
    raw, expected = case
    got = (
        spark_prop.createDataFrame([(raw,)], ["s"])
        .select(dms_to_decimal(F.col("s")).alias("v"))
        .first()["v"]
    )
    assert got == pytest.approx(expected, abs=1e-12), raw


@settings(max_examples=30, deadline=None)
@given(
    a=st.integers(10, 99),
    b=st.integers(0, 999),
    c=st.integers(0, 99999),
    sep=st.sampled_from(["", "-", " "]),
)
def test_api_roundtrip(spark_prop, a, b, c, sep):
    raw = sep.join([f"{a:02d}", f"{b:03d}", f"{c:05d}"])
    got = (
        spark_prop.createDataFrame([(raw,)], ["s"])
        .select(normalize_api(F.col("s")).alias("v"))
        .first()["v"]
    )
    assert got == f"{a:02d}-{b:03d}-{c:05d}", raw


@pytest.fixture(scope="module")
def spark_prop():
    # hypothesis forbids function-scoped fixtures interacting with its
    # examples; reuse one session for the whole module.
    from oil_wells_data_wrangling_spark.session import get_spark

    return get_spark(app_name="props", master="local[2]", shuffle_partitions=4)


def test_vector_quantize_error_bound(spark_prop):
    """int8 scalar quantization guarantees mean |residual| <= half a
    quantization step ((max-min)/254/2) for every vector."""
    import os

    from oil_wells_data_wrangling_spark.operators.similarity import vector_quantize

    sf = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
    rows = vector_quantize(spark_prop, sf).collect()
    assert rows
    for r in rows:
        step = (r["v_max"] - r["v_min"]) / 254
        assert r["recon_err"] <= step / 2 + 1e-6, r["vec_id"]
        assert -127 <= r["q_first"] <= 127


def test_decontaminate_flags_every_injected_doc(spark_prop):
    """Every doc the operator itself contaminates (doc_id % 13, eval
    snippet appended) must come back flagged — no false negatives on
    known contamination."""
    import os

    from oil_wells_data_wrangling_spark.operators.privacy import decontaminate

    sf = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
    rows = {r["doc_id"]: r["contaminated"] for r in decontaminate(spark_prop, sf).collect()}
    injected = [d for d in rows if d % 13 == 0 and d % 11 != 0]
    assert injected
    missed = [d for d in injected if not rows[d]]
    assert not missed, f"injected but unflagged: {missed[:5]}"


@st.composite
def dms_corner(draw):
    """Hemisphere/overflow corners: fractional seconds, decimal-only
    forms with dense whitespace, invalid minute/second overflow (must
    yield NULL under the strict range guard), double hemispheres."""
    kind = draw(st.sampled_from(["frac_sec", "decimal", "overflow", "junk"]))
    if kind == "frac_sec":
        deg = draw(st.integers(0, 89))
        mn = draw(st.integers(0, 59))
        sec10 = draw(st.integers(0, 599))
        hemi = draw(st.sampled_from(["N", "S"]))
        raw = f"{deg}° {mn}' {sec10 / 10}\" {hemi}"
        val = deg + mn / 60 + sec10 / 10 / 3600
        return raw, (-val if hemi == "S" else val)
    if kind == "decimal":
        milli = draw(st.integers(0, 179_999))
        hemi = draw(st.sampled_from(["E", "W", ""]))
        prefix = draw(st.booleans())
        body = f"{milli / 1000}"
        raw = f"{hemi} {body}" if prefix and hemi else f"{body} {hemi}".strip()
        val = milli / 1000
        return raw, (-val if hemi == "W" else val)
    if kind == "overflow":
        # minutes or seconds >= 60: strict guard rejects (reference
        # would happily compute 99'99" — documented deviation)
        deg = draw(st.integers(0, 89))
        mn, sec = draw(
            st.sampled_from([(99, 99), (60, 0), (0, 60), (75, 30)])
        )
        return f"{deg}° {mn}' {sec}\" N", None
    return draw(st.sampled_from(["", "north by northwest", "° ' \""])), None


@settings(max_examples=40, deadline=None)
@given(case=dms_corner())
def test_dms_corner_cases(spark_prop, case):
    raw, expected = case
    got = (
        spark_prop.createDataFrame([(raw,)], ["s"])
        .select(dms_to_decimal(F.col("s")).alias("v"))
        .first()["v"]
    )
    if expected is None:
        assert got is None, (raw, got)
    else:
        assert got == pytest.approx(expected, abs=1e-9), raw


def test_decontaminate_injection_loses_no_train_docs(spark_prop):
    """ADVICE r5: the arithmetic donor pick assumes eval ids are the
    contiguous 11-strided set; with the round-6 LEFT-join rewrite an
    unmatched donor keeps the original text instead of dropping the
    row. Every training doc must appear in the output exactly once."""
    import os

    from oil_wells_data_wrangling_spark.operators.privacy import decontaminate
    from oil_wells_data_wrangling_spark.sources.readers import load_tables

    sf = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
    out_ids = [r["doc_id"] for r in decontaminate(spark_prop, sf).collect()]
    t = load_tables(spark_prop, sf)
    train_ids = {
        r["doc_id"]
        for r in t.documents.filter("doc_id % 11 <> 0").select("doc_id").collect()
    }
    assert len(out_ids) == len(set(out_ids)), "duplicated train docs"
    assert set(out_ids) == train_ids, "train docs lost or invented"


def test_group_split_never_straddles_sources(spark_prop):
    """The leakage-safety invariant group_split is FOR: no source may
    appear in two splits. Checked on the doc-level assignment (the
    audit query aggregates it away), directly on the same expression."""
    from oil_wells_data_wrangling_spark.sources.readers import load_tables

    t = load_tables(spark_prop, "/root/testdata/sf0.001")
    bucket = (
        F.expr(
            "cast(conv(substr(md5(concat('gsplit_v1_', source)),"
            " 1, 8), 16, 10) as bigint)"
        )
        % 100
    )
    split = (
        F.when(bucket < 90, "train").when(bucket < 95, "val").otherwise("test")
    )
    straddlers = (
        t.documents.select("source", split.alias("split"))
        .groupBy("source")
        .agg(F.count_distinct("split").alias("k"))
        .filter(F.col("k") > 1)
        .count()
    )
    assert straddlers == 0


def test_rate_limit_kept_is_min_of_count_and_n(spark_prop):
    """events_rate_limit's kept-per-user must equal the sum over that
    user's minutes of min(minute_count, 3) — the arrival-order-free
    closed form the streaming twin equality also relies on."""
    from oil_wells_data_wrangling_spark.operators.eventops import (
        events_rate_limit,
    )
    from oil_wells_data_wrangling_spark.sources.readers import load_tables

    sf = "/root/testdata/sf0.001"
    got = {
        r["user_id"]: (r["n_events"], r["n_kept"], r["n_dropped"])
        for r in events_rate_limit(spark_prop, sf).collect()
    }
    t = load_tables(spark_prop, sf)
    per_minute = (
        t.events.groupBy(
            "user_id", F.date_trunc("minute", F.col("ts")).alias("m")
        )
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("user_id")
        .agg(
            F.sum("c").alias("n"),
            F.sum(F.least(F.col("c"), F.lit(3))).alias("kept"),
        )
    )
    for r in per_minute.collect():
        n, kept, dropped = got[r["user_id"]]
        assert (n, kept, dropped) == (r["n"], r["kept"], r["n"] - r["kept"])


def test_scd2_attribution_partitions_all_purchases(spark_prop):
    """Every purchase is attributed to exactly one status (or 'none'):
    the per-status n_purchases must sum to the raw purchase count, and
    n_users per status can't exceed n_purchases."""
    from oil_wells_data_wrangling_spark.operators.eventops import (
        scd2_attribution,
    )
    from oil_wells_data_wrangling_spark.sources.readers import load_tables

    sf = "/root/testdata/sf0.001"
    rows = scd2_attribution(spark_prop, sf).collect()
    t = load_tables(spark_prop, sf)
    total = t.events.filter("event_type = 'purchase'").count()
    assert sum(r["n_purchases"] for r in rows) == total
    assert all(r["n_users"] <= r["n_purchases"] for r in rows)


def test_hll_persist_incremental_cleans_tmpdir(spark_prop):
    """The state-table scratch dir must not leak (the registry sweep
    calls every operator repeatedly), and the returned DF must survive
    the dir's removal (lineage severed by localCheckpoint)."""
    import glob
    import os
    import tempfile

    from oil_wells_data_wrangling_spark.operators.eventops import (
        hll_persist_incremental,
    )

    before = set(glob.glob(os.path.join(tempfile.gettempdir(), "hll_state_*")))
    out = hll_persist_incremental(spark_prop, "/root/testdata/sf0.001")
    rows = out.collect()  # after rmtree — lineage must not need the dir
    after = set(glob.glob(os.path.join(tempfile.gettempdir(), "hll_state_*")))
    assert after == before, "hll_persist_incremental leaked its scratch dir"
    assert len(rows) == 1 and rows[0]["union_within_5pct"]
    assert rows[0]["n_days_persisted"] > 0 and rows[0]["n_days_fresh"] > 0


def test_bigram_lift_counts_are_consistent(spark_prop):
    """Survivors obey the published cut exactly: n_pair >= minsup and
    10·n_pair·N > 11·n_w1·n_w2, and a pair can't outnumber either of
    its words."""
    from oil_wells_data_wrangling_spark.operators.textstats import (
        _LIFT_MINSUP,
        bigram_lift,
    )
    from oil_wells_data_wrangling_spark.sources.readers import load_tables

    sf = "/root/testdata/sf0.001"
    rows = bigram_lift(spark_prop, sf).collect()
    assert rows, "threshold filtered everything — cut too tight for testdata"
    t = load_tables(spark_prop, sf)
    n_tokens = (
        t.documents.select(
            F.explode(F.split("text", " ")).alias("w")
        ).count()
    )
    for r in rows:
        assert r["n_pair"] >= _LIFT_MINSUP
        assert r["n_pair"] <= min(r["n_w1"], r["n_w2"])
        assert 10 * r["n_pair"] * n_tokens > 11 * r["n_w1"] * r["n_w2"]


def test_model_score_external_weights(spark_prop, tmp_path):
    """The weight-artifact path: a JSON weights file loads, ships into
    the Arrow scorer, and changes scores exactly per the linear form —
    the swap point a trained model drops into."""
    import json

    from oil_wells_data_wrangling_spark.operators.inference import (
        load_weights,
        score_documents,
    )
    from oil_wells_data_wrangling_spark.sources.readers import load_tables

    wfile = tmp_path / "weights.json"
    wfile.write_text(json.dumps([100, 1, 0, 2]))
    w = load_weights(str(wfile))
    assert w == (100, 1, 0, 2)
    docs = load_tables(spark_prop, "/root/testdata/sf0.001").documents
    got = {
        r["doc_id"]: r["score"]
        for r in score_documents(docs, weights=w, cutoff=500).collect()
    }
    feats = docs.selectExpr(
        "doc_id",
        "size(split(text, ' ')) as nw",
        "size(array_distinct(split(text, ' '))) * 1000L"
        " div size(split(text, ' ')) as dp",
    ).collect()
    for r in feats:
        assert got[r["doc_id"]] == 100 + r["dp"] + 2 * min(r["nw"], 100)


def test_hll_state_round_trip_through_explicit_path(spark_prop, tmp_path):
    """The parameterized pattern: backfill writes per-day sketches to a
    CALLER-CHOSEN state path; a later merge that sees ONLY post-cutoff
    events (history pruned away entirely) still reports every persisted
    day and lands the union estimate within 5% of the exact full-range
    distinct — proving the sketches survive the parquet round-trip and
    history is truly never rescanned."""
    from pyspark.sql import functions as F

    from oil_wells_data_wrangling_spark.operators.eventops import (
        _HLL_PERSIST_CUTOFF,
        hll_state_backfill,
        hll_state_merge,
    )
    from oil_wells_data_wrangling_spark.sources.readers import load_tables

    sf = "/root/testdata/sf0.001"
    events = load_tables(spark_prop, sf).events
    cutoff = F.lit(_HLL_PERSIST_CUTOFF).cast("timestamp")
    state_dir = str(tmp_path / "daily_sketches")

    hll_state_backfill(events, state_dir, cutoff)
    state = spark_prop.read.parquet(state_dir)
    n_hist_days = state.count()
    assert n_hist_days > 0
    assert dict(state.dtypes)["sk"] == "binary"

    # the incremental caller holds ONLY fresh events — no history rescan
    fresh_only = events.filter(F.col("ts") >= cutoff)
    row = hll_state_merge(spark_prop, fresh_only, state_dir, cutoff).first()
    assert row["n_days_persisted"] == n_hist_days
    assert row["n_days_fresh"] > 0
    exact = events.select(F.count_distinct("user_id")).first()[0]
    assert abs(row["n_est"] - exact) / exact <= 0.05


# ---------------------------------------------------- winnowing guarantee

@st.composite
def shared_span_case(draw):
    """Two docs from DISJOINT alphabets except a shared >=8-word run."""
    n_shared = draw(st.integers(8, 14))
    shared = [f"s{i}" for i in range(n_shared)]
    pre_a = [f"a{i}" for i in range(draw(st.integers(0, 10)))]
    post_a = [f"A{i}" for i in range(draw(st.integers(0, 10)))]
    pre_b = [f"b{i}" for i in range(draw(st.integers(0, 10)))]
    post_b = [f"B{i}" for i in range(draw(st.integers(0, 10)))]
    return (
        " ".join(pre_a + shared + post_a),
        " ".join(pre_b + shared + post_b),
    )


@settings(max_examples=10, deadline=None)
@given(case=shared_span_case())
def test_winnow_guarantee_property(spark_prop, case):
    """ANY two docs sharing a contiguous run of >= w + k - 1 = 8 words
    share at least one winnowed fingerprint — the Schleimer et al.
    guarantee, exercised through the actual Spark expression chain."""
    from oil_wells_data_wrangling_spark.operators.dedup import (
        winnow_fingerprints,
    )

    doc_a, doc_b = case
    docs = spark_prop.createDataFrame(
        [(1, doc_a), (2, doc_b)], "doc_id long, text string"
    )
    fp = winnow_fingerprints(docs).toPandas()
    sets = {d: set(g["fp"]) for d, g in fp.groupby("doc_id")}
    assert sets.get(1) and sets.get(2) and (sets[1] & sets[2]), case


# ------------------------------------------------- dHash rescale invariance

@st.composite
def image_case(draw):
    w = draw(st.integers(9, 24))
    h = draw(st.integers(8, 20))
    f = draw(st.integers(2, 4))
    px = bytes(
        draw(st.integers(0, 255)) for _ in range(w * h * 3)
    )
    return w, h, f, px


@settings(max_examples=25, deadline=None)
@given(case=image_case())
def test_phash_invariant_under_any_integer_upscale(case):
    """floor(floor(x·fW/9)/f) = floor(x·W/9): nearest-neighbor
    upscaling by ANY integer factor lands the 9×8 sample grid on the
    same source pixels, so the dHash is bit-identical — the exact
    property that makes phash grouping a rescale-robust dedup key."""
    from oil_wells_data_wrangling_spark.operators.multimodal import (
        nn_resize,
        phash64,
    )

    w, h, f, px = case
    base = {"width": w, "height": h, "channels": 3, "pixels": px}
    up = {
        "width": w * f,
        "height": h * f,
        "channels": 3,
        "pixels": nn_resize(px, w, h, 3, w * f, h * f),
    }
    pb, pu = phash64(base), phash64(up)
    assert pb == pu
    assert -(1 << 63) <= pb < (1 << 63)


# ------------------------------------------------- audio envelope properties


@settings(max_examples=50, deadline=None)
@given(
    levels=st.lists(st.integers(0, 255), min_size=2, max_size=64),
    scale=st.integers(1, 500),
    offset=st.integers(0, 10_000),
)
def test_envelope_invariant_under_any_monotone_transform(levels, scale, offset):
    """envelope_bits must be invariant under ANY strictly increasing
    affine transform of the level scale — the property that makes it a
    loudness-proof audio fingerprint."""
    from oil_wells_data_wrangling_spark.operators.multimodal import (
        envelope_bits,
    )

    base = envelope_bits(levels)
    assert envelope_bits([x * scale + offset for x in levels]) == base


@settings(max_examples=30, deadline=None)
@given(payload=st.binary(min_size=64, max_size=64))
def test_numpy_envelope_matches_pure_python(payload):
    """The Arrow/numpy fingerprint path must agree bit-for-bit with the
    pure-python reference on arbitrary byte payloads."""
    import numpy as np

    from oil_wells_data_wrangling_spark.operators.multimodal import (
        _AE_BITS,
        envelope_bits,
    )

    arr = np.frombuffer(payload, dtype=np.uint8).astype(np.int64)
    bits = (arr[1:] > arr[:-1]).astype(np.int64)
    weights = 1 << np.arange(_AE_BITS, dtype=np.int64)
    got = int((bits * weights).sum())
    assert got == envelope_bits(list(arr))


# --------------------------------------------- BPE padded-replace semantics


@settings(max_examples=25, deadline=None)
@given(
    syms=st.lists(
        st.sampled_from(["a", "b", "ab", "</w>"]), min_size=1, max_size=12
    )
)
def test_bpe_merge_replace_agrees_across_engines(spark_prop, syms):
    """The space-padded plain replace that applies a BPE merge must
    produce the IDENTICAL string in Spark, DuckDB and python's
    str.replace (all left-to-right non-overlapping) — including on
    adversarial runs of identical symbols, where naive regex or
    re-scanning implementations diverge."""
    import duckdb

    s = " " + " ".join(syms) + " "
    pat, rep = " a b ", " ab "
    expect = s.replace(pat, rep)
    got_spark = (
        spark_prop.createDataFrame([(s,)], ["s"])
        .select(F.replace("s", F.lit(pat), F.lit(rep)).alias("r"))
        .first()["r"]
    )
    got_duck = duckdb.connect().execute(
        "SELECT replace(?, ?, ?)", [s, pat, rep]
    ).fetchone()[0]
    assert got_spark == expect, (s, got_spark, expect)
    assert got_duck == expect, (s, got_duck, expect)


# ------------------------------------------------------ WARC truncation fuzz

@st.composite
def _warc_archive(draw):
    """A valid multi-record archive with adversarial bodies (CRLFs,
    'WARC/' lookalikes, binary bytes) plus its per-record payloads."""
    bodies = draw(
        st.lists(
            st.binary(min_size=0, max_size=120), min_size=1, max_size=5
        )
    )
    spice = draw(st.sampled_from([b"", b"\r\n\r\n", b"WARC/1.0\r\n", b"\x00\xff"]))
    recs = []
    for i, body in enumerate(bodies):
        body = body + spice
        hdr = (
            "WARC/1.0\r\n"
            "WARC-Type: resource\r\n"
            f"WARC-Record-ID: <urn:fuzz:{i}>\r\n"
            f"Content-Length: {len(body)}\r\n\r\n"
        ).encode()
        recs.append(hdr + body + b"\r\n\r\n")
    return recs, [b + spice for b in bodies]


@settings(max_examples=60, deadline=None)
@given(case=_warc_archive(), cut=st.integers(0, 1_000))
def test_warc_parser_truncation_never_raises_never_fabricates(case, cut):
    """Cut a valid archive at ANY byte offset: the parser must not
    raise, must return only records that were fully contained in the
    kept bytes, and every returned payload must be byte-exact — a
    silently shortened payload would flow into the corpus as damaged
    text that looks valid."""
    from oil_wells_data_wrangling_spark.sources.warc import parse_warc_bytes

    recs, payloads = case
    full = b"".join(recs)
    data = full[: min(cut, len(full))]
    out = parse_warc_bytes(data, "fuzz.warc")
    assert len(out) <= len(payloads)
    # records parse as an intact prefix, byte-exact
    for got, want in zip(out, payloads):
        assert bytes(got["payload"]) == want
    # and every record whose bytes are FULLY present must be returned
    offset = 0
    fully_contained = 0
    for r in recs:
        offset += len(r)
        if offset <= len(data):
            fully_contained += 1
    assert len(out) >= fully_contained


@given(
    st.lists(
        st.tuples(
            st.binary(max_size=64),
            st.one_of(
                st.none(),
                st.sampled_from(
                    [
                        "text/html",
                        "text/html; charset=utf-8",
                        "text/html; charset=ISO-8859-1",
                        "text/plain; charset=windows-1252",
                        "application/json; charset=UTF-16",
                        'text/html; charset="x-weird-9"',
                        "text/html; charset=",
                    ]
                ),
                st.text(max_size=40),
            ),
        ),
        min_size=1,
        max_size=16,
    )
)
@settings(max_examples=20, deadline=None)
def test_payload_text_total_on_arbitrary_bytes(rows):
    """payload_text must be TOTAL: any byte payload under any declared
    (or garbage, or absent) charset decodes to a non-null string —
    never a MALFORMED_CHARACTER_CODING raise, never a null — because a
    crawl pipeline cannot crash on one bad page."""
    from oil_wells_data_wrangling_spark.session import get_spark
    from oil_wells_data_wrangling_spark.sources.warc import payload_text

    spark = get_spark(
        app_name="props", master="local[2]", shuffle_partitions=4
    )  # module-level session reuse (hypothesis forbids fn fixtures)
    df = spark.createDataFrame(
        rows, "payload binary, content_type string"
    )
    got = [r.text for r in df.select(payload_text()).collect()]
    assert len(got) == len(rows)
    assert all(isinstance(t, str) for t in got)
