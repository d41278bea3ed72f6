"""WARC source: record framing, HTTP envelope split, gzip members,
per-file parallelism, damage tolerance, downstream composability."""

from __future__ import annotations

import gzip

from oil_wells_data_wrangling_spark.sources.warc import (
    parse_warc_bytes,
    read_warc,
    write_wet,
)


def _record(
    warc_type: str,
    block: bytes,
    uri: str = "",
    rid: str = "<urn:uuid:1>",
    date: str = "2026-08-15T00:00:00Z",
    ctype: str = "application/http; msgtype=response",
) -> bytes:
    hdr = (
        f"WARC/1.0\r\n"
        f"WARC-Type: {warc_type}\r\n"
        f"WARC-Record-ID: {rid}\r\n"
        + (f"WARC-Target-URI: {uri}\r\n" if uri else "")
        + f"WARC-Date: {date}\r\n"
        f"Content-Type: {ctype}\r\n"
        f"Content-Length: {len(block)}\r\n\r\n"
    ).encode()
    return hdr + block + b"\r\n\r\n"


def _response_block(body: bytes, status: int = 200, ctype: str = "text/html") -> bytes:
    return (
        f"HTTP/1.1 {status} OK\r\n"
        f"Content-Type: {ctype}\r\n"
        f"Content-Length: {len(body)}\r\n\r\n"
    ).encode() + body


def _sample_warc(i: int) -> bytes:
    info = _record("warcinfo", b"software: test\r\n", ctype="application/warc-fields")
    r1 = _record(
        "response",
        _response_block(f"<html><body>hello world {i}</body></html>".encode()),
        uri=f"http://site{i}.example.com/a",
        rid=f"<urn:uuid:{i}a>",
    )
    r2 = _record(
        "response",
        _response_block(b"<html>page two</html>", status=404, ctype="text/html; charset=utf-8"),
        uri=f"http://site{i}.example.com/b",
        rid=f"<urn:uuid:{i}b>",
    )
    return info + r1 + r2


def test_parse_warc_bytes_fields_and_payload():
    recs = parse_warc_bytes(_sample_warc(0), "f0.warc")
    assert [r["warc_type"] for r in recs] == ["warcinfo", "response", "response"]
    r1 = recs[1]
    assert r1["target_uri"] == "http://site0.example.com/a"
    assert r1["http_status"] == 200
    assert r1["content_type"] == "text/html"
    assert r1["payload"] == b"<html><body>hello world 0</body></html>"
    assert recs[2]["http_status"] == 404
    # warcinfo keeps its raw block and no HTTP status
    assert recs[0]["http_status"] is None
    assert recs[0]["payload"] == b"software: test\r\n"


def test_parse_warc_gzip_multi_member():
    # CommonCrawl layout: one gzip member per record
    raw = _sample_warc(1)
    members = b""
    pos = 0
    # compress each record as its own member by re-splitting on WARC/
    parts = [b"WARC/" + p for p in raw.split(b"WARC/") if p]
    for p in parts:
        members += gzip.compress(p)
    recs = parse_warc_bytes(members, "f1.warc.gz")
    assert len(recs) == 3
    assert recs[1]["payload"] == b"<html><body>hello world 1</body></html>"


def test_parse_warc_truncated_tail_keeps_prefix():
    raw = _sample_warc(2)
    # chop mid-way through the final record's block
    recs_full = parse_warc_bytes(raw)
    cut = raw[: len(raw) - 30]
    recs = parse_warc_bytes(cut)
    assert len(recs) >= len(recs_full) - 1
    assert recs[1]["payload"] == b"<html><body>hello world 2</body></html>"


def test_read_warc_distributed(spark, tmp_path):
    d = tmp_path / "crawl"
    d.mkdir()
    (d / "seg0.warc").write_bytes(_sample_warc(0))
    (d / "seg1.warc.gz").write_bytes(gzip.compress(_sample_warc(1)))
    df = read_warc(spark, str(d))
    rows = {(r.warc_file, r.record_id): r for r in df.collect()}
    assert len(rows) == 6
    r = rows[("seg1.warc.gz", "<urn:uuid:1a>")]
    assert r.http_status == 200
    assert bytes(r.payload) == b"<html><body>hello world 1</body></html>"
    # downstream composability: responses feed the text stack like any table
    from pyspark.sql import functions as F

    texts = (
        df.filter(F.col("warc_type") == "response")
        .select(
            "target_uri",
            F.regexp_replace(
                F.decode("payload", "utf-8"), "<[^>]*>", " "
            ).alias("text"),
        )
        .filter(F.length(F.trim("text")) > 0)
    )
    assert texts.count() == 4
    # no shuffle: the parse is a single map stage over the file scan
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_write_wet_round_trip(spark, tmp_path):
    """WET export: one conversion-record file per partition, written
    executor-side, parseable by our own reader — including bodies that
    embed CRLF pairs and a 'WARC/' lookalike (length framing, not
    sentinel scanning, delimits records)."""
    rows = [
        ("http://a.example.com/1", "plain text body"),
        ("http://a.example.com/2", "tricky\r\n\r\nWARC/1.0\r\nbody"),
        ("http://b.example.com/3", ""),
        ("http://b.example.com/4", "unicode ümlaut 𝄞"),
    ]
    df = spark.createDataFrame(rows, "target_uri string, text string").repartition(2)
    out = str(tmp_path / "wet")
    manifest = write_wet(df, out).collect()
    assert sum(m.n_records for m in manifest) == 4
    import glob as g

    from oil_wells_data_wrangling_spark.sources.warc import parse_warc_bytes

    recs = []
    for f in sorted(g.glob(out + "/*.warc.wet")):
        recs.extend(parse_warc_bytes(open(f, "rb").read(), f))
    assert len(recs) == 4
    by_uri = {r["target_uri"]: r for r in recs}
    assert all(r["warc_type"] == "conversion" for r in recs)
    assert by_uri["http://a.example.com/2"]["payload"].decode() == (
        "tricky\r\n\r\nWARC/1.0\r\nbody"
    )
    assert by_uri["http://b.example.com/4"]["payload"].decode() == (
        "unicode ümlaut 𝄞"
    )
    assert by_uri["http://b.example.com/3"]["payload"] == b""


def test_warc_to_wet_corpus_loop(spark, tmp_path):
    """The full crawl loop: WARC archives in → HTTP 200 filter → tag
    strip → exact text dedup (keep lowest record id) → WET export →
    re-parse. Proves the connector output composes with the standard
    corpus stack and survives a round trip."""
    import gzip

    from pyspark.sql import functions as F

    d = tmp_path / "crawl"
    d.mkdir()
    # seg2 duplicates seg0's page bodies under different URIs
    (d / "seg0.warc").write_bytes(_sample_warc(0))
    (d / "seg1.warc.gz").write_bytes(gzip.compress(_sample_warc(1)))
    (d / "seg2.warc").write_bytes(
        _record(
            "response",
            _response_block(b"<html><body>hello world 0</body></html>"),
            uri="http://mirror.example.com/copy",
            rid="<urn:uuid:dup>",
        )
    )
    docs = (
        read_warc(spark, str(d))
        .filter((F.col("warc_type") == "response") & (F.col("http_status") == 200))
        .select(
            "record_id",
            "target_uri",
            F.trim(
                F.regexp_replace(
                    F.regexp_replace(F.decode("payload", "utf-8"), "<[^>]*>", " "),
                    r"\s+",
                    " ",
                )
            ).alias("text"),
        )
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("text").orderBy("record_id")
    kept = (
        docs.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .drop("rk")
    )
    out = str(tmp_path / "wet")
    manifest = write_wet(kept, out).collect()
    n_out = sum(m.n_records for m in manifest)
    # 3 response-200 pages (0a, dup-of-0a, 1a) -> 2 after dedup
    assert n_out == 2
    import glob as g

    recs = []
    for f in sorted(g.glob(out + "/*.warc.wet")):
        recs.extend(parse_warc_bytes(open(f, "rb").read(), f))
    texts = sorted(r["payload"].decode() for r in recs)
    assert texts == ["hello world 0", "hello world 1"]


def test_write_warc_response_roundtrip(spark, tmp_path):
    """write_warc must emit genuine WARC/1.0 response records: read_warc
    re-parses them with the HTTP envelope split (status + Content-Type
    promoted, body recovered byte-exact), including a body containing
    CRLF-CRLF and a 'WARC/' lookalike line."""
    from oil_wells_data_wrangling_spark.sources.warc import write_warc

    tricky = '<html><body>a\r\n\r\nWARC/1.0 looks like a header\r\nb</body></html>'
    pages = spark.createDataFrame(
        [(f"https://x.example/d/{i}", f"<html><body>page {i}</body></html>")
         for i in range(3)] + [("https://x.example/tricky", tricky)],
        "target_uri string, html string",
    ).repartition(2)
    out = str(tmp_path / "arch")
    manifest = write_warc(pages, out).collect()
    assert sum(m.n_records for m in manifest) == 4
    back = read_warc(spark, out).collect()
    assert len(back) == 4
    by_uri = {r.target_uri: r for r in back}
    for r in back:
        assert r.warc_type == "response"
        assert r.http_status == 200
        assert r.content_type == "text/html"
    assert bytes(by_uri["https://x.example/tricky"].payload).decode() == tricky
    assert bytes(by_uri["https://x.example/d/1"].payload).decode() == (
        "<html><body>page 1</body></html>"
    )


def test_surt_urlkey():
    from oil_wells_data_wrangling_spark.sources.warc import surt

    assert surt("https://News.Example.com/a/b?q=1") == "com,example,news)/a/b?q=1"
    assert surt("http://www.example.com/") == "com,example)/"
    assert surt("https://example.com") == "com,example)/"
    assert surt("https://example.com:8080/x") == "com,example)/x"
    assert surt(None) == "" and surt("") == ""


def test_write_warc_cdx_offsets_address_every_record(spark, tmp_path):
    """cdx=True must produce an index whose every (offset, length) row
    random-access-decodes to exactly its record (the cc-index serving
    contract), with the SURT urlkey and base32-SHA1 payload digest."""
    import base64
    import hashlib

    from oil_wells_data_wrangling_spark.sources.warc import (
        fetch_record,
        read_cdx,
        surt,
        write_warc,
    )

    pages = spark.createDataFrame(
        [
            (f"https://w{i % 2}.example.com/d/{i}", f"<html><body>pg {i}</body></html>")
            for i in range(7)
        ],
        "target_uri string, html string",
    ).repartition(2)
    out = str(tmp_path / "arch")
    manifest = write_warc(pages, out, compress=True, cdx=True).collect()
    assert sum(m.n_records for m in manifest) == 7

    idx = read_cdx(spark, out).collect()
    assert len(idx) == 7
    for row in idx:
        assert row.urlkey == surt(row.url)
        rec = fetch_record(f"{out}/{row.filename}", row.offset, row.length)
        assert rec["target_uri"] == row.url
        body = rec["payload"]
        want = "sha1:" + base64.b32encode(hashlib.sha1(body).digest()).decode()
        assert row.digest == want
        assert body.decode().startswith("<html><body>pg ")
    # index-level dedup: distinct digests == distinct bodies
    assert len({r.digest for r in idx}) == 7


def test_write_warc_cdx_requires_compress(spark, tmp_path):
    import pytest

    from oil_wells_data_wrangling_spark.sources.warc import write_warc

    pages = spark.createDataFrame(
        [("https://x.example/a", "<html></html>")],
        "target_uri string, html string",
    )
    with pytest.raises(ValueError, match="requires compress"):
        write_warc(pages, str(tmp_path / "a"), cdx=True)


def test_cdx_fetch_record_tricky_body(spark, tmp_path):
    """Random access must survive a body containing CRLF-CRLF runs and
    a 'WARC/' lookalike line — the member boundary comes from the CDX
    (offset, length), never from scanning the payload."""
    from oil_wells_data_wrangling_spark.sources.warc import (
        fetch_record,
        read_cdx,
        write_warc,
    )

    tricky = "a\r\n\r\nWARC/1.0 not a header\r\n\r\nHTTP/1.1 200 OK\r\n\r\nb"
    pages = spark.createDataFrame(
        [("https://t.example/x", tricky), ("https://t.example/y", "plain")],
        "target_uri string, html string",
    ).coalesce(1)
    out = str(tmp_path / "arch")
    write_warc(pages, out, compress=True, cdx=True).collect()
    rows = {r.url: r for r in read_cdx(spark, out).collect()}
    rec = fetch_record(
        f"{out}/{rows['https://t.example/x'].filename}",
        rows["https://t.example/x"].offset,
        rows["https://t.example/x"].length,
    )
    assert rec["payload"].decode() == tricky
    rec2 = fetch_record(
        f"{out}/{rows['https://t.example/y'].filename}",
        rows["https://t.example/y"].offset,
        rows["https://t.example/y"].length,
    )
    assert rec2["payload"].decode() == "plain"


def test_cdx_lookup_prefix_range(spark, tmp_path):
    """cdx_lookup is the cc-index query contract: a SURT prefix returns
    exactly the captures under it, in (urlkey, timestamp) replay order,
    and every hit is fetchable; an exact-URL lookup is prefix=surt(url);
    a miss prefix returns zero rows. The 'co' prefix must NOT leak
    'com,...' keys — the range upper bound is next('co')='cp', which
    still covers com; so we assert the tighter contract on a full
    host key instead: 'com,alpha)' never returns beta's captures even
    though both share the 'com,' run."""
    from oil_wells_data_wrangling_spark.sources.warc import (
        cdx_lookup,
        fetch_record,
        surt,
        write_warc,
    )

    pages = spark.createDataFrame(
        [
            ("https://alpha.com/a", "pg a"),
            ("https://alpha.com/b", "pg b"),
            ("https://www.alpha.com/a/deep", "pg deep"),
            ("https://beta.com/x", "pg x"),
            ("https://alphariver.com/z", "pg z"),  # host sharing the prefix string
        ],
        "target_uri string, html string",
    ).repartition(2)
    out = str(tmp_path / "arch")
    write_warc(pages, out, compress=True, cdx=True).collect()

    # domain lookup: alpha.com only — NOT alphariver.com, NOT beta.com
    hits = cdx_lookup(spark, out, "com,alpha)").collect()
    assert sorted(r.url for r in hits) == [
        "https://alpha.com/a",
        "https://alpha.com/b",
        "https://www.alpha.com/a/deep",
    ]
    # replay order: sorted by (urlkey, timestamp)
    assert [(r.urlkey, r.timestamp) for r in hits] == sorted(
        (r.urlkey, r.timestamp) for r in hits
    )
    # every hit is servable via its (offset, length)
    for r in hits:
        rec = fetch_record(f"{out}/{r.filename}", r.offset, r.length)
        assert rec["target_uri"] == r.url
    # exact-URL lookup
    one = cdx_lookup(spark, out, surt("https://beta.com/x")).collect()
    assert len(one) == 1 and one[0].url == "https://beta.com/x"
    # miss
    assert cdx_lookup(spark, out, "org,nosuch)").count() == 0
    # empty prefix = full index scan, still ordered
    assert cdx_lookup(spark, out, "").count() == 5


def test_cdx_indexed_lookup_equals_raw_and_pushes_range(spark, tmp_path):
    """The sorted parquet mirror must return exactly what the raw
    sidecar lookup returns, AND the range predicates must reach the
    parquet scan (PushedFilters) — the pruning contract that makes a
    prefix lookup sublinear on a range-partitioned crawl index."""
    from oil_wells_data_wrangling_spark.sources.warc import (
        build_cdx_index,
        cdx_lookup,
        cdx_lookup_indexed,
        write_warc,
    )

    pages = spark.createDataFrame(
        [
            (f"https://h{i % 5}.example.com/p/{i}", f"pg {i}")
            for i in range(40)
        ],
        "target_uri string, html string",
    ).repartition(3)
    out = str(tmp_path / "arch")
    write_warc(pages, out, compress=True, cdx=True).collect()
    idx_dir = str(tmp_path / "cdx_index")
    build_cdx_index(spark, out, idx_dir, num_files=4)

    prefix = "com,example,h3)"
    raw = cdx_lookup(spark, out, prefix).collect()
    fast = cdx_lookup_indexed(spark, idx_dir, prefix).collect()
    assert len(raw) == 8
    assert [tuple(r) for r in raw] == [tuple(r) for r in fast]

    plan = cdx_lookup_indexed(spark, idx_dir, prefix)._jdf.queryExecution(
    ).executedPlan().toString()
    assert "PushedFilters" in plan
    assert "GreaterThanOrEqual(urlkey" in plan, plan
    assert "LessThan(urlkey" in plan, plan


def _rows_sorted(df):
    return sorted(
        (tuple(r) for r in df.collect()),
        key=lambda t: (t[0], t[1]),
    )


def test_read_warc_paths_equals_read_warc(spark, tmp_path):
    """The path-streaming reader must return EXACTLY read_warc's rows
    on every archive layout: plain, member-per-record gzip, and WET —
    same schema, same HTTP-envelope split, same record set."""
    from oil_wells_data_wrangling_spark.sources.warc import (
        read_warc,
        read_warc_paths,
        write_warc,
        write_wet,
    )

    pages = spark.createDataFrame(
        [
            (f"https://s{i % 3}.example.com/{i}", f"<html>pg {i} é</html>")
            for i in range(23)
        ],
        "target_uri string, html string",
    ).repartition(2)
    plain, gz = str(tmp_path / "plain"), str(tmp_path / "gz")
    write_warc(pages, plain).collect()
    write_warc(pages, gz, compress=True).collect()
    wet = str(tmp_path / "wet")
    write_wet(
        pages.selectExpr("target_uri", "html as text"), wet
    ).collect()

    for folder in (plain, gz, wet):
        a = _rows_sorted(read_warc(spark, folder))
        b = _rows_sorted(read_warc_paths(spark, folder))
        assert a == b and len(a) == 23, folder


def test_read_warc_paths_truncated_tail_drops(spark, tmp_path):
    """Cut an archive mid-record: the streaming reader keeps the intact
    prefix and never surfaces a shortened payload — read_warc's exact
    tolerance contract, byte offsets notwithstanding."""
    import os

    from oil_wells_data_wrangling_spark.sources.warc import (
        read_warc,
        read_warc_paths,
        write_warc,
    )

    pages = spark.createDataFrame(
        [(f"https://t.example/{i}", f"<html>body {i}</html>") for i in range(9)],
        "target_uri string, html string",
    ).coalesce(1)
    out = str(tmp_path / "arch")
    write_warc(pages, out).collect()
    path = out + "/part-00000.warc"
    blob = open(path, "rb").read()
    full = {bytes(r.payload) for r in read_warc_paths(spark, out).collect()}
    for cut in (len(blob) // 3, len(blob) // 2, len(blob) - 7):
        t = str(tmp_path / f"cut{cut}")
        os.makedirs(t)
        open(t + "/part-00000.warc", "wb").write(blob[:cut])
        got = read_warc_paths(spark, t).collect()
        ref = read_warc(spark, t).collect()
        assert _rows_sorted(read_warc_paths(spark, t)) == _rows_sorted(
            read_warc(spark, t)
        )
        assert len(got) < 9
        for r in got:  # every surviving payload is intact, never short
            assert bytes(r.payload) in full


def test_read_warc_paths_truncated_gzip_equals_read_warc(spark, tmp_path):
    """Tear a member-per-record .warc.gz at arbitrary byte offsets:
    both readers must recover the same intact-prefix record set (the
    zlib whole-blob path returns partial plaintext silently; the
    GzipFile streaming path raises EOFError — both must resolve to
    drop-the-torn-tail)."""
    import os

    from oil_wells_data_wrangling_spark.sources.warc import (
        read_warc,
        read_warc_paths,
        write_warc,
    )

    pages = spark.createDataFrame(
        [(f"https://g.example/{i}", f"<html>gz body {i}</html>") for i in range(9)],
        "target_uri string, html string",
    ).coalesce(1)
    out = str(tmp_path / "arch")
    write_warc(pages, out, compress=True).collect()
    path = out + "/part-00000.warc.gz"
    blob = open(path, "rb").read()
    for cut in (len(blob) // 4, len(blob) // 2, len(blob) - 5):
        t = str(tmp_path / f"gzcut{cut}")
        os.makedirs(t)
        open(t + "/part-00000.warc.gz", "wb").write(blob[:cut])
        assert _rows_sorted(read_warc_paths(spark, t)) == _rows_sorted(
            read_warc(spark, t)
        )


def test_prefix_range_equals_startswith_property():
    """The pruning trick cdx_lookup rests on: for ANY key k and prefix
    p, (p <= k < bump(p)) <=> k.startswith(p). Codepoint comparison
    (Python) orders identically to UTF-8 binary comparison (Spark,
    DuckDB, parquet min/max stats) because UTF-8 is order-preserving,
    so proving it here proves it for every engine in the chain."""
    from hypothesis import given, settings, strategies as st

    from oil_wells_data_wrangling_spark.sources.warc import _prefix_upper

    # exclude U+10FFFF-terminal prefixes (bump would overflow) and
    # surrogates (not encodable); SURT prefixes are ASCII in practice,
    # but the invariant holds for the whole encodable range
    chars = st.characters(
        min_codepoint=1, max_codepoint=0x10FFFE, exclude_categories=("Cs",)
    )
    keys = st.text(alphabet=chars, min_size=0, max_size=12)
    # a prefix ending at U+D7FF would bump INTO the surrogate range —
    # unencodable, and impossible for real SURT prefixes (ASCII)
    prefixes = st.text(alphabet=chars, min_size=1, max_size=8).filter(
        lambda p: p[-1] != "퟿"
    )

    @settings(max_examples=2000, deadline=None)
    @given(k=keys, p=prefixes)
    def check(k, p):
        hi = _prefix_upper(p)
        in_range = p <= k < hi
        assert in_range == k.startswith(p), (k, p, hi)
        # and the UTF-8 binary order agrees with the codepoint order
        kb, pb, hb = k.encode(), p.encode(), hi.encode()
        assert (pb <= kb < hb) == in_range

    check()


def test_negative_content_length_drops_tail():
    """A corrupt/malicious 'Content-Length: -N' header must end THAT
    file's parse (tolerant-reader contract), not loop forever
    re-parsing the same record (pre-fix: parse_warc_bytes walked pos
    backward and spun; _iter_warc_stream yielded duplicates forever)."""
    import io

    from oil_wells_data_wrangling_spark.sources.warc import (
        _iter_warc_stream,
        parse_warc_bytes,
    )

    good = (
        b"WARC/1.0\r\nWARC-Type: resource\r\nWARC-Record-ID: <urn:a>\r\n"
        b"Content-Length: 2\r\n\r\nok\r\n\r\n"
    )
    evil = (
        b"WARC/1.0\r\nWARC-Type: resource\r\nWARC-Record-ID: <urn:b>\r\n"
        b"Content-Length: -10000\r\n\r\n"
    )
    blob = good + evil + good
    recs = parse_warc_bytes(blob, "f")
    assert [r["record_id"] for r in recs] == ["<urn:a>"]
    recs2 = list(_iter_warc_stream(io.BytesIO(blob), "f"))
    assert [r["record_id"] for r in recs2] == ["<urn:a>"]


def test_corrupt_gzip_member_keeps_prefix_both_readers(spark, tmp_path):
    """Bit-flip a byte inside one gzip member: BOTH readers must keep
    the intact records and drop only the damaged one — a corrupt
    archive quarantines itself instead of killing the job."""
    from oil_wells_data_wrangling_spark.sources.warc import (
        read_warc,
        read_warc_paths,
        write_warc,
    )

    pages = spark.createDataFrame(
        [(f"https://c.example/{i}", f"<html>cm {i}</html>") for i in range(7)],
        "target_uri string, html string",
    ).coalesce(1)
    out = str(tmp_path / "arch")
    write_warc(pages, out, compress=True).collect()
    path = out + "/part-00000.warc.gz"
    blob = bytearray(open(path, "rb").read())
    blob[len(blob) // 2] ^= 0xFF  # flip a byte mid-archive
    open(path, "wb").write(bytes(blob))

    a = _rows_sorted(read_warc(spark, out))
    b = _rows_sorted(read_warc_paths(spark, out))
    assert a == b
    assert 0 < len(a) < 7  # prefix kept, damaged tail dropped


def test_read_warc_paths_nonseekable_opener(spark, tmp_path):
    """The documented object-store path: opener returns a NON-seekable
    stream — sniffing the gzip magic must not seek."""
    from oil_wells_data_wrangling_spark.sources.warc import (
        read_warc_paths,
        write_warc,
    )

    pages = spark.createDataFrame(
        [(f"https://n.example/{i}", f"<html>ns {i}</html>") for i in range(5)],
        "target_uri string, html string",
    ).coalesce(1)
    for compress in (False, True):
        out = str(tmp_path / f"arch{compress}")
        write_warc(pages, out, compress=compress).collect()

        class NoSeek:
            def __init__(self, p):
                self._f = open(p, "rb")

            def read(self, n=-1):
                return self._f.read(n)

            def close(self):
                self._f.close()

            def seek(self, *a):
                raise OSError("not seekable")

        got = read_warc_paths(spark, out, opener=NoSeek).collect()
        assert len(got) == 5


def test_gzip_decompressors_agree_under_arbitrary_cuts():
    """The whole-blob (_gunzip_members) and streaming (_MultiGzipStream)
    decompressors must produce IDENTICAL plaintext for any member-per-
    record archive cut at any byte offset — and the records framed from
    it must be a prefix of the uncut archive's records. This is the
    invariant the two readers' row-equality rests on."""
    import gzip
    import io

    from hypothesis import given, settings, strategies as st

    from oil_wells_data_wrangling_spark.sources.warc import (
        _gunzip_members,
        _iter_warc_stream,
        _MultiGzipStream,
        parse_warc_bytes,
    )

    bodies = st.lists(st.binary(min_size=0, max_size=60), min_size=1, max_size=6)

    def archive(bs):
        out = b""
        for i, b in enumerate(bs):
            rec = (
                f"WARC/1.0\r\nWARC-Type: resource\r\n"
                f"WARC-Record-ID: <urn:f:{i}>\r\n"
                f"Content-Length: {len(b)}\r\n\r\n"
            ).encode() + b + b"\r\n\r\n"
            out += gzip.compress(rec, mtime=0)
        return out

    def drain(blob):
        s = _MultiGzipStream(io.BytesIO(blob))
        out = b""
        while True:
            chunk = s.read(1 << 20)
            if not chunk:
                break
            out += chunk
        return out

    @settings(max_examples=120, deadline=None)
    @given(bs=bodies, data=st.data())
    def check(bs, data):
        gz = archive(bs)
        full_ids = [r["record_id"] for r in parse_warc_bytes(gz, "f")]
        assert len(full_ids) == len(bs)
        # corruption mode: tear at an arbitrary byte, OR flip a byte
        # in place (the mode the pre-r12 blob decompressor diverged on)
        if data.draw(st.booleans(), label="flip"):
            pos = data.draw(
                st.integers(min_value=0, max_value=len(gz) - 1), label="pos"
            )
            torn = gz[:pos] + bytes([gz[pos] ^ 0xFF]) + gz[pos + 1 :]
        else:
            cut = data.draw(
                st.integers(min_value=0, max_value=len(gz)), label="cut"
            )
            torn = gz[:cut]
        blob_plain = _gunzip_members(torn) if torn[:2] == b"\x1f\x8b" else b""
        assert drain(torn) == blob_plain
        recs = [r["record_id"] for r in _iter_warc_stream(
            _MultiGzipStream(io.BytesIO(torn)), "f")]
        # bit flips can corrupt a header in place rather than ending
        # the stream, so framed records need not be a prefix — but the
        # two readers' byte-equality above must hold regardless; for
        # pure truncation the prefix contract holds too
        if torn == gz[: len(torn)]:
            assert recs == full_ids[: len(recs)]
            if torn == gz:
                assert recs == full_ids

    check()


def test_gzip_decompressors_agree_bitflip_large_single_member():
    """The exact divergence the r11 advice reproduced: a WHOLE-FILE
    gzipped archive (one member larger than the 1 MiB streaming chunk)
    with a mid-member bit flip. The blob decompressor must keep the
    same chunk-aligned plaintext prefix the streaming reader keeps —
    pre-fix it dropped the entire member (0 records vs 20)."""
    import gzip
    import io
    import random

    from oil_wells_data_wrangling_spark.sources.warc import (
        _gunzip_members,
        _iter_warc_stream,
        _MultiGzipStream,
    )

    rng = random.Random(0)  # incompressible payloads so the COMPRESSED
    recs = b""  # stream spans several 1 MiB streaming chunks
    for i in range(30):
        body = rng.randbytes(120_000)
        recs += (
            f"WARC/1.0\r\nWARC-Type: resource\r\n"
            f"WARC-Record-ID: <urn:big:{i}>\r\n"
            f"Content-Length: {len(body)}\r\n\r\n"
        ).encode() + body + b"\r\n\r\n"
    gz = gzip.compress(recs, mtime=0)  # ONE member, whole-file gzip
    assert len(gz) > 2 * (1 << 20)
    blob = bytearray(gz)
    blob[(len(gz) * 3) // 4] ^= 0xFF  # flip mid-member, past chunk 1
    blob = bytes(blob)

    def drain(b):
        s = _MultiGzipStream(io.BytesIO(b))
        out = b""
        while True:
            chunk = s.read(1 << 20)
            if not chunk:
                break
            out += chunk
        return out

    blob_plain = _gunzip_members(blob)
    assert blob_plain == drain(blob)
    assert len(blob_plain) > 0  # prefix before the flip is KEPT
    ids = [
        r["record_id"]
        for r in _iter_warc_stream(_MultiGzipStream(io.BytesIO(blob)), "f")
    ]
    assert ids == [f"<urn:big:{i}>" for i in range(len(ids))] and 0 < len(ids) < 30


def test_payload_text_charset_aware(spark):
    """payload_text (r13, surfaced by the real-bytes e2e run): per-row
    charset routing — UTF-8 with U+FFFD replacement on invalid bytes,
    total Latin-1 for the legacy family, Latin-1 fallback for unknown
    declared charsets. All JVM-side, no session conf."""
    from pyspark.sql import functions as F

    from oil_wells_data_wrangling_spark.sources.warc import payload_text

    rows = [
        ("café utf8".encode(), "text/html; charset=utf-8"),
        (b"caf\xe9 latin1", "text/html; charset=ISO-8859-1"),
        (b"caf\xe9 cp1252", "text/html; charset=windows-1252"),
        (b"\xff\xfe bad utf8", "text/plain"),  # no charset -> utf-8
        (b"caf\xe9 unknown", "text/html; charset=x-mystery"),
    ]
    df = spark.createDataFrame(rows, "payload binary, content_type string")
    got = [r.text for r in df.select(payload_text()).collect()]
    assert got[0] == "café utf8"
    assert got[1] == "café latin1"
    assert got[2] == "café cp1252"
    assert got[3] == "�� bad utf8"  # replaced, not raised
    assert got[4] == "café unknown"  # unknown charset: total fallback


def test_payload_charset_unhandled_flag(spark):
    """r13 advice: multi-byte legacy charsets (shift_jis, gbk, big5,
    euc-kr, utf-16 …) are NOT rare in real archives and payload_text's
    Latin-1 fallback is mojibake for them — the companion flag must
    mark exactly the rows whose DECLARED charset is outside the two
    faithfully-decoded families, so pipelines can quarantine/count
    them instead of silently poisoning downstream stats."""
    from oil_wells_data_wrangling_spark.sources.warc import (
        payload_charset_unhandled,
        payload_text,
    )

    rows = [
        (b"ok", "text/html; charset=utf-8"),
        (b"ok", "text/html; charset=ISO-8859-1"),
        (b"ok", "text/html; charset=windows-1252"),
        (b"ok", "text/plain"),  # no declared charset
        (b"ok", None),  # no content-type at all
        (b"\x83\x65", "text/html; charset=Shift_JIS"),
        (b"\xd6\xd0", "text/html; charset=GBK"),
        (b"ok", 'text/html; charset="EUC-KR"'),
        (b"\xff\xfe", "application/json; charset=UTF-16"),
    ]
    df = spark.createDataFrame(rows, "payload binary, content_type string")
    out = df.select(payload_text(), payload_charset_unhandled()).collect()
    assert [r.charset_unhandled for r in out] == (
        [False] * 5 + [True] * 4
    )
    # the decode itself stays TOTAL on flagged rows — quarantine is
    # the pipeline's choice, not forced
    assert all(r.text is not None for r in out)


def test_decode_payload_text_multibyte_families(spark):
    """r14 verdict item 5: the top multi-byte legacy families decode
    for REAL through the Arrow stdlib-codec leg (WHATWG label folding:
    shift_jis->cp932, euc-kr->cp949, gb*->gb18030), the UTF-8/Latin-1
    majority stays on the JVM codegen leg, and only genuinely
    undecodable declarations keep the quarantine flag."""
    from oil_wells_data_wrangling_spark.sources.warc import (
        decode_payload_text,
    )

    rows = [
        # JVM fast path
        ("id0", "héllo utf8".encode(), "text/html; charset=utf-8"),
        ("id1", b"caf\xe9 latin1", "text/html; charset=ISO-8859-1"),
        # genuine multi-byte bodies, one per family
        ("id2", "日本語テスト".encode("cp932"),
         "text/html; charset=Shift_JIS"),
        ("id3", "中文测试".encode("gb18030"),
         "text/html; charset=GB2312"),
        ("id4", "中文測試".encode("big5"), "text/html; charset=Big5"),
        ("id5", "한국어 시험".encode("cp949"),
         'text/html; charset="EUC-KR"'),
        ("id6", "日本語えぅc".encode("euc_jp"),
         "text/plain; charset=euc-jp"),
        ("id7", "utf16 тест".encode("utf-16"),
         "application/json; charset=UTF-16"),
        # malformed bytes under a multi-byte declaration (dangling
        # cp932 lead byte): replaced, never raised (total decode)
        ("id8", b"\x83\x65 ok \x82", "text/html; charset=sjis"),
        # still-unhandled declaration -> flagged, Latin-1 fallback
        ("id9", b"caf\xe9 koi8", "text/html; charset=KOI8-R"),
    ]
    df = spark.createDataFrame(
        rows, "id string, payload binary, content_type string"
    )
    out = {
        r.id: (r.text, r.charset_unhandled)
        for r in decode_payload_text(df).collect()
    }
    assert len(out) == 10  # split-union loses no rows
    assert out["id0"] == ("héllo utf8", False)
    assert out["id1"] == ("café latin1", False)
    assert out["id2"] == ("日本語テスト", False)
    assert out["id3"] == ("中文测试", False)
    assert out["id4"] == ("中文測試", False)
    assert out["id5"] == ("한국어 시험", False)
    assert out["id6"] == ("日本語えぅc", False)
    assert out["id7"] == ("utf16 тест", False)
    assert out["id8"][0].startswith("テ ok ")  # cp932 lead byte pair
    assert "�" in out["id8"][0] and out["id8"][1] is False
    assert out["id9"] == ("café koi8", True)  # quarantined, total


def test_decode_payload_text_plan_split(spark):
    """Scale posture of the split-union: the JVM leg contains NO
    Python/Arrow evaluation node and the Arrow leg prunes to the
    declared-multibyte predicate — a when/otherwise over the UDF
    would instead drag every row through Arrow."""
    from oil_wells_data_wrangling_spark.sources.warc import (
        decode_payload_text,
    )

    df = spark.createDataFrame(
        [(b"x", "text/html; charset=utf-8")],
        "payload binary, content_type string",
    )
    plan = (
        decode_payload_text(df)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # exactly one Arrow evaluation node, on the filtered slow leg only
    assert plan.count("ArrowEvalPython") == 1
    union_branches = plan.split("Union")[-1]
    assert "ArrowEvalPython" in union_branches


def test_write_warc_rolls_files_and_roundtrips(spark, tmp_path):
    """The r16 file roll: max_file_bytes splits a task's output into
    multiple archives mid-stream, min_files_per_task splits the tail,
    and the record CONTENT round-trips identically either way (file
    boundaries are the only difference)."""
    from oil_wells_data_wrangling_spark.sources.warc import write_warc

    pages = spark.createDataFrame(
        [
            (f"https://x.example/d/{i}", f"<html><body>pg {i} {'x' * 200}</body></html>")
            for i in range(20)
        ],
        "target_uri string, html string",
    ).coalesce(1)

    # (a) byte-cap roll: ~300-byte records, 1 KB cap -> several files
    out_a = str(tmp_path / "cap")
    man_a = write_warc(pages, out_a, max_file_bytes=1024).collect()
    assert len(man_a) > 3
    assert sum(m.n_records for m in man_a) == 20

    # (b) tail split: no cap reached, min_files_per_task forces 4 files
    out_b = str(tmp_path / "tail")
    man_b = write_warc(pages, out_b, min_files_per_task=4).collect()
    assert len(man_b) == 4
    assert sum(m.n_records for m in man_b) == 20

    # (c) unrolled reference: identical records after read_warc
    out_c = str(tmp_path / "one")
    man_c = write_warc(pages, out_c).collect()
    assert len(man_c) == 1

    def snap(folder):
        return sorted(
            (r.target_uri, bytes(r.payload))
            for r in read_warc(spark, folder).collect()
        )

    ref = snap(out_c)
    assert snap(out_a) == ref
    assert snap(out_b) == ref


def test_write_warc_roll_keeps_cdx_contract(spark, tmp_path):
    """CDX sidecars written under a roll must keep per-file offsets:
    every index row random-access-decodes to its own record."""
    from oil_wells_data_wrangling_spark.sources.warc import (
        fetch_record,
        read_cdx,
        write_warc,
    )

    pages = spark.createDataFrame(
        [(f"https://x.example/d/{i}", f"<html><body>pg {i}</body></html>")
         for i in range(9)],
        "target_uri string, html string",
    ).coalesce(1)
    out = str(tmp_path / "arch")
    man = write_warc(
        pages, out, compress=True, cdx=True, min_files_per_task=3
    ).collect()
    assert len(man) == 3
    idx = read_cdx(spark, out).collect()
    assert len(idx) == 9
    assert len({r.filename for r in idx}) == 3
    for row in idx:
        rec = fetch_record(f"{out}/{row.filename}", row.offset, row.length)
        assert rec["target_uri"] == row.url
