"""WARC (Web ARChive, ISO 28500) source — CommonCrawl-shaped ingest.

Parses folders of concatenated WARC/1.0 records into one row per
record: ``(warc_file, record_id, warc_type, target_uri, warc_date,
http_status, content_type, payload binary)``. Response records get
their HTTP envelope split off (status + Content-Type promoted to
columns, body kept as the binary payload); other record types keep the
whole block as payload.

Reference parity: the reference ingests a folder of PDFs
(``pdf_extraction.py``, one file per well report) and scrapes pages one
at a time (``web_scraping.py:139-286``); a 100 TB crawl corpus arrives
as WARC — the same folder-of-binary-files shape at archive scale, and
the front door ahead of ``html_to_text`` / ``lang_id`` / the dedup
stack.

Scale shape: each ``.warc``/``.warc.gz`` FILE is the parallelism unit —
exactly how CommonCrawl shards (~1 GB per file, tens of thousands of
files per crawl), so a 1000-executor cluster saturates on the file
inventory with zero shuffle: one binaryFile scan, one Arrow-batched
per-file parse, records flowing straight into downstream scans. Gzipped
inputs (including multi-member streams, CommonCrawl's record-per-member
layout) decompress inside the task via ``zlib``.
"""

from __future__ import annotations

import io
import zlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType

from oil_wells_data_wrangling_spark.sources.pathutil import local_path

WARC_SCHEMA = (
    "warc_file string, record_id string, warc_type string, "
    "target_uri string, warc_date string, http_status int, "
    "content_type string, payload binary"
)

_GZIP_MAGIC = b"\x1f\x8b"


def _gunzip_members(data: bytes) -> bytes:
    """Decompress a (possibly multi-member) gzip stream to one blob.

    Corruption-tolerant like the truncation contract: a bit-flipped or
    torn member keeps every byte of plaintext produced before the bad
    byte and drops the rest of the FILE (downstream Content-Length
    framing then drops any partial record). One damaged archive must
    quarantine itself, not kill the job.

    Implemented ON TOP of the streaming decompressor so the two
    readers agree on damaged input BY CONSTRUCTION — an earlier
    whole-blob ``zlib.decompressobj`` version diverged on a mid-member
    bit flip (``decompress`` raises without returning partial output,
    dropping the whole member, where the chunked stream keeps the
    plaintext of every 1 MiB chunk decoded before the bad byte)."""
    s = _MultiGzipStream(io.BytesIO(data))
    out = []
    while True:
        chunk = s.read(1 << 20)
        if not chunk:
            break
        out.append(chunk)
    return b"".join(out)


def _parse_headers(block: bytes) -> dict[str, str]:
    headers: dict[str, str] = {}
    for line in block.split(b"\r\n"):
        if b":" in line:
            k, _, v = line.partition(b":")
            headers[k.strip().decode("latin-1").lower()] = v.strip().decode(
                "latin-1", "replace"
            )
    return headers


def parse_warc_bytes(data: bytes, warc_file: str = "") -> list[dict]:
    """Parse one WARC file's bytes into record dicts (WARC_SCHEMA keys).

    Tolerant reader: a record with a malformed version line or an
    unparsable Content-Length aborts the remainder of THAT FILE only
    (archives are append-streams — damage is a truncated tail, not
    random holes); everything parsed so far is kept.
    """
    if data[:2] == _GZIP_MAGIC:
        data = _gunzip_members(data)
    records: list[dict] = []
    pos = 0
    n = len(data)
    while pos < n:
        # skip inter-record blank lines
        while data[pos : pos + 2] == b"\r\n":
            pos += 2
        if pos >= n:
            break
        if not data.startswith(b"WARC/", pos):
            break
        hdr_end = data.find(b"\r\n\r\n", pos)
        if hdr_end < 0:
            break
        headers = _parse_headers(data[pos:hdr_end])
        try:
            clen = int(headers.get("content-length", ""))
        except ValueError:
            break
        if clen < 0:
            # a negative length would walk pos BACKWARD and re-parse
            # the same record forever — corrupt header, drop the tail
            break
        block = data[hdr_end + 4 : hdr_end + 4 + clen]
        if len(block) < clen:
            # truncated tail: a partial payload must NOT surface as a
            # (silently shortened) record — damaged text would flow
            # into the corpus looking valid. Keep the intact prefix.
            break
        pos = hdr_end + 4 + clen
        records.append(_build_record(headers, block, warc_file))
    return records


def _build_record(headers: dict[str, str], block: bytes, warc_file: str) -> dict:
    """One WARC record dict (WARC_SCHEMA keys) from parsed headers +
    content block — the single place the HTTP-envelope split lives, so
    the whole-bytes and streaming parsers cannot drift."""
    status: int | None = None
    ctype = headers.get("content-type", "")
    payload = block
    if headers.get("warc-type") == "response" and block.startswith(b"HTTP/"):
        http_end = block.find(b"\r\n\r\n")
        if http_end >= 0:
            http_headers = _parse_headers(block[:http_end])
            status_line = block.split(b"\r\n", 1)[0].split(b" ")
            if len(status_line) >= 2 and status_line[1].isdigit():
                status = int(status_line[1])
            ctype = http_headers.get("content-type", ctype)
            payload = block[http_end + 4 :]
    return {
        "warc_file": warc_file,
        "record_id": headers.get("warc-record-id", ""),
        "warc_type": headers.get("warc-type", ""),
        "target_uri": headers.get("warc-target-uri", ""),
        "warc_date": headers.get("warc-date", ""),
        "http_status": status,
        "content_type": ctype,
        "payload": payload,
    }


def _iter_warc_stream(f, warc_file: str) -> Iterator[dict]:
    """Incremental record iterator over a DECOMPRESSED WARC byte
    stream: Content-Length framing, one record in memory at a time.
    Same tolerance contract as ``parse_warc_bytes`` — a malformed
    version line, unparsable Content-Length, or short payload ends
    THIS FILE's iteration (truncated tails drop, never surface
    shortened); a torn compressed tail (EOFError/zlib.error from the
    gzip layer) is treated as end-of-stream the same way."""
    buf = b""
    eof = False

    def fill(need: int | None) -> None:
        # grow buf to ``need`` bytes (or by one chunk when None)
        nonlocal buf, eof
        while not eof and (need is None or len(buf) < need):
            try:
                chunk = f.read(1 << 20)
            except (EOFError, zlib.error):
                chunk = b""
            if not chunk:
                eof = True
                return
            buf += chunk
            if need is None:
                return

    while True:
        fill(2)
        while buf[:2] == b"\r\n":
            buf = buf[2:]
            fill(2)
        if not buf:
            return
        fill(5)
        if not buf.startswith(b"WARC/"):
            return
        while (i := buf.find(b"\r\n\r\n")) < 0:
            if eof:
                return
            fill(None)
        headers = _parse_headers(buf[:i])
        try:
            clen = int(headers.get("content-length", ""))
        except ValueError:
            return
        if clen < 0:
            # negative length would leave buf unconsumed and yield the
            # same record forever — corrupt header, drop the tail
            return
        need = i + 4 + clen
        fill(need)
        if len(buf) < need:
            return
        block = buf[i + 4 : need]
        buf = buf[need:]
        yield _build_record(headers, block, warc_file)


def _parse_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Arrow-batched (path, content) → WARC record rows — shared by the
    batch and streaming readers."""
    for pdf in it:
        rows: list[dict] = []
        for path, content in zip(pdf["path"], pdf["content"]):
            rows.extend(
                parse_warc_bytes(bytes(content), path.rsplit("/", 1)[-1])
            )
        if rows:
            yield pd.DataFrame(rows)


def read_warc(
    spark: SparkSession, folder: str, glob: str = "*.warc*"
) -> DataFrame:
    """One row per WARC record for every archive file under ``folder``.

    binaryFile scan (file = split = parallelism unit, CommonCrawl's own
    sharding) + Arrow-batched per-file parse; no shuffle anywhere —
    downstream operators consume this like any other table.
    """
    raw = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .load(folder)
        .select("path", "content")
    )
    return raw.mapInPandas(_parse_batches, schema=WARC_SCHEMA)


def read_warc_stream(
    spark: SparkSession,
    folder: str,
    glob: str = "*.warc*",
    recursive: bool = False,
) -> DataFrame:
    """STREAMING WARC ingest: the same one-row-per-record parse over a
    binaryFile file-source stream — new archive files landing under
    ``folder`` become micro-batches, and the checkpoint's seen-file log
    gives exactly-once per-archive processing (a crawl delivery drop
    never double-ingests on restart). Same schema, same Arrow parse,
    same zero-shuffle shape as ``read_warc``; downstream streaming
    operators (windowed aggs, the neardup stream) consume it like any
    other source."""
    raw = (
        spark.readStream.format("binaryFile")
        .schema(
            "path string, modificationTime timestamp, "
            "length long, content binary"
        )
        .option("pathGlobFilter", glob)
        .option("recursiveFileLookup", "true" if recursive else "false")
        .load(folder)
        .select("path", "content")
    )
    return raw.mapInPandas(_parse_batches, schema=WARC_SCHEMA)


class _MultiGzipStream:
    """Incremental multi-member gzip decompressor — the SINGLE
    corruption-resolution authority (``_gunzip_members`` is a
    drain-to-bytes wrapper over it, so batch and streaming readers
    agree byte-for-byte on damaged input by construction): decompress
    chunk-by-chunk, KEEPING all plaintext produced before a torn or
    corrupt tail. ``gzip.GzipFile``
    is not usable here — its ``read()`` raises ``EOFError`` on a
    truncated member without returning the preceding members'
    plaintext (test-demonstrated: a torn archive read through GzipFile
    yields zero records where the whole-blob zlib path recovers the
    intact prefix)."""

    def __init__(self, f, head: bytes = b""):
        self._f = f
        self._d = None  # active decompressobj, None between members
        self._raw = head  # undecompressed bytes carried across chunks
        self._buf = b""
        self._eof = False

    def read(self, n: int) -> bytes:
        while len(self._buf) < n and not self._eof:
            chunk = self._f.read(1 << 20)
            data = self._raw + chunk
            self._raw = b""
            if not chunk and not data:
                self._eof = True
                break
            while data:
                if self._d is None:
                    if len(data) < 2 and chunk:
                        self._raw = data  # member magic may straddle
                        break
                    if data[:2] != _GZIP_MAGIC:
                        self._eof = True  # trailing garbage: stop here
                        break
                    self._d = zlib.decompressobj(wbits=31)
                try:
                    self._buf += self._d.decompress(data)
                except zlib.error:
                    self._eof = True  # corrupt tail: keep what we have
                    break
                if self._d.eof:
                    data = self._d.unused_data
                    self._d = None
                else:
                    data = b""
            if not chunk:
                self._eof = True  # truncated mid-member: partial kept
        out, self._buf = self._buf[:n], self._buf[n:]
        return out

    def close(self) -> None:
        pass


class _HeadStream:
    """Replay already-sniffed bytes ahead of a NON-seekable stream —
    magic detection must not require ``seek(0)``, or the documented
    ``opener`` object-store case (streaming bodies) breaks."""

    def __init__(self, head: bytes, f):
        self._head = head
        self._f = f

    def read(self, n: int) -> bytes:
        if self._head:
            out, self._head = self._head[:n], self._head[n:]
            if len(out) < n:
                out += self._f.read(n - len(out))
            return out
        return self._f.read(n)


def read_warc_paths(
    spark: SparkSession,
    folder: str,
    glob: str = "*.warc*",
    opener=None,
    batch_records: int = 1024,
) -> DataFrame:
    """``read_warc``'s streaming twin on the MEMORY axis: identical
    rows (test-pinned), but archive bytes never enter the JVM — the
    binaryFile scan is pruned to ``path`` and each task stream-parses
    its archive from storage (incremental multi-member gunzip via
    ``_MultiGzipStream`` + Content-Length framing), yielding records in
    ``batch_records`` Arrow batches. Peak memory is one record + one
    chunk regardless of archive size.

    Why it exists: CommonCrawl archives are ~1 GB each, and the
    whole-file ``content`` path holds several copies per concurrent
    task (JVM row + Arrow transfer + Python bytes) — measured OOMing a
    default heap at 32 × 33 MB files (BASELINE round-11, WebDataset
    reader). Use this reader when archives are big relative to
    executor memory and a task-visible path exists (local/NFS/FUSE —
    or pass ``opener(path) -> file object`` for object stores —
    see THE OPENER CONTRACT in sources/pathutil.py, enforced by
    tests/test_opener_contract.py); ``read_warc`` remains the default
    for modest files and for storage only the JVM can reach."""
    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .load(folder)
        .select("path")
    )

    def _parse(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            for path in pdf["path"]:
                local = local_path(path)
                name = local.rsplit("/", 1)[-1]
                f = opener(local) if opener else open(local, "rb")
                try:
                    # sniff WITHOUT seeking: opener streams (object
                    # stores) are typically not seekable
                    head = f.read(2)
                    src = (
                        _MultiGzipStream(f, head=head)
                        if head == _GZIP_MAGIC
                        else _HeadStream(head, f)
                    )
                    rows: list[dict] = []
                    for rec in _iter_warc_stream(src, name):
                        rows.append(rec)
                        if len(rows) >= batch_records:
                            yield pd.DataFrame(rows)
                            rows = []
                    if rows:
                        yield pd.DataFrame(rows)
                finally:
                    f.close()

    return files.mapInPandas(_parse, schema=WARC_SCHEMA)


def payload_text(
    payload: str = "payload", content_type: str = "content_type"
):
    """Charset-aware text of a WARC payload as a JVM-side Column — the
    decode step a real-archive pipeline needs where the synthetic demos
    could get away with a blind UTF-8 cast (r13: surfaced by the
    first REAL-bytes corpus run, scripts/e2e_real_corpus.py).

    The charset comes from the HTTP Content-Type parameter per row:
    UTF-8 (and unset/ascii/unknown) routes through
    ``make_valid_utf8(cast(payload as string))`` — the raw cast never
    throws and make_valid_utf8 substitutes U+FFFD for invalid
    sequences (errors='replace' semantics, no session conf needed);
    the Latin-1 family (iso-8859-1 / latin1 / windows-1252 / cp1252 —
    the WHATWG-conflated legacy web encodings) routes through
    ``decode(payload, 'iso-8859-1')``, which is total (every byte
    sequence is valid Latin-1). Declared charsets outside both
    families fall back to Latin-1: mojibake over a crashed job, byte
    length preserved — and multi-byte legacy encodings (shift_jis,
    gbk, big5, euc-kr, utf-16 …) are NOT rare in real archives, so
    that fallback is silent data damage if unmarked. Select the
    companion ``payload_charset_unhandled()`` column alongside this
    one to quarantine or count those rows (r13 advice); the decode
    itself stays total either way. Everything stays in whole-stage
    codegen — no Python, no session-global codingErrorAction
    toggle."""
    from pyspark.sql import functions as F

    cs = _declared_charset(content_type)
    utf8ish = cs.isin(*_UTF8ISH)
    # everything non-utf8ish (the Latin-1 family AND unknown legacy
    # charsets) takes the total Latin-1 decode
    return (
        F.when(
            utf8ish,
            F.expr(f"make_valid_utf8(cast({payload} as string))"),
        )
        .otherwise(F.expr(f"decode({payload}, 'iso-8859-1')"))
        .alias("text")
    )


# the two charset families payload_text decodes FAITHFULLY; anything
# else is decoded totally (Latin-1) but is mojibake for multi-byte
# legacy encodings — payload_charset_unhandled marks those rows
_UTF8ISH = ("", "utf-8", "utf8", "ascii", "us-ascii")
_LATIN1ISH = ("iso-8859-1", "iso8859-1", "latin1", "latin-1",
              "windows-1252", "cp1252")


def _declared_charset(content_type: str = "content_type"):
    """Lowercased charset parameter of the HTTP Content-Type header
    ('' when absent) — shared by payload_text and its quarantine
    flag so the two can never disagree on what was declared."""
    from pyspark.sql import functions as F

    return F.lower(
        F.regexp_extract(
            F.coalesce(F.col(content_type), F.lit("")),
            r"""charset\s*=\s*["']?([A-Za-z0-9_\-]+)""",
            1,
        )
    )


def payload_charset_unhandled(content_type: str = "content_type"):
    """Companion flag for ``payload_text`` (r13 advice): TRUE when the
    row DECLARES a charset outside the two faithfully-decoded families
    (UTF-8ish and Latin-1ish) — shift_jis / gbk / big5 / euc-kr /
    utf-16 and friends, which are common in real web archives and
    which payload_text folds into Latin-1 output (total decode, but
    mojibake for multi-byte encodings). Pipelines select this column
    alongside the text to QUARANTINE or count affected rows instead
    of silently feeding mojibake into token/quality/dedup stats.
    Pure codegen; same charset extraction as payload_text.

    ``decode_payload_text`` (below) decodes the top multi-byte
    families for real; use ITS narrowed flag when you take that path —
    this one keeps flagging them because ``payload_text`` alone still
    mojibakes them."""
    cs = _declared_charset(content_type)
    return (
        ~cs.isin(*(_UTF8ISH + _LATIN1ISH))
    ).alias("charset_unhandled")


# Top multi-byte legacy families seen in volume in real CommonCrawl
# (r14 verdict item 5), mapped declared-label -> stdlib codec. Codec
# choices follow the WHATWG encoding spec's label folding, which is
# what browsers did to the bytes these archives captured: shift_jis
# labels mean the windows-31j superset (cp932), euc-kr means the
# windows-949 superset (cp949), the gb* family folds into the gb18030
# superset (strict superset of gbk/gb2312 — every gbk byte sequence
# decodes identically), big5-hkscs is kept distinct from plain big5.
# utf-16/32 are here too: Spark's JVM decode() handles them only with
# a session-global legacy conf on malformed input, while the Arrow
# path is total (errors='replace') with BOM handling. All stdlib — no
# new dependencies.
_MULTIBYTE_CODECS = {
    "shift_jis": "cp932", "shift-jis": "cp932", "sjis": "cp932",
    "x-sjis": "cp932", "windows-31j": "cp932", "cp932": "cp932",
    "ms_kanji": "cp932",
    "gbk": "gb18030", "gb2312": "gb18030", "gb-2312": "gb18030",
    "x-gbk": "gb18030", "gb18030": "gb18030", "chinese": "gb18030",
    "csgb2312": "gb18030",
    "big5": "big5", "big-5": "big5", "csbig5": "big5",
    "big5-hkscs": "big5hkscs",
    "euc-kr": "cp949", "euc_kr": "cp949", "cseuckr": "cp949",
    "ks_c_5601-1987": "cp949", "ksc5601": "cp949", "korean": "cp949",
    "cp949": "cp949", "uhc": "cp949",
    "euc-jp": "euc_jp", "euc_jp": "euc_jp", "cseucpkdfmtjapanese":
    "euc_jp",
    "iso-2022-jp": "iso2022_jp", "csiso2022jp": "iso2022_jp",
    "utf-16": "utf-16", "utf16": "utf-16",
    "utf-16le": "utf-16-le", "utf-16be": "utf-16-be",
    "utf-32": "utf-32", "utf-32le": "utf-32-le",
    "utf-32be": "utf-32-be",
}


@pandas_udf(StringType())  # concrete type: a DDL string would need a
# live session at import time
def _decode_multibyte(payload: pd.Series, charset: pd.Series) -> pd.Series:
    """Arrow-batched total decode for the _MULTIBYTE_CODECS families:
    stdlib codecs with errors='replace' (U+FFFD, never a raised
    exception — same posture as make_valid_utf8 on the JVM path).
    Only ever invoked on rows whose declared charset is in the map;
    an unexpected label degrades to the Latin-1 total fallback rather
    than None so the column stays total."""
    out = []
    for raw, label in zip(payload, charset):
        if raw is None:
            out.append(None)
            continue
        codec = _MULTIBYTE_CODECS.get(label)
        b = bytes(raw)
        if codec is None:
            out.append(b.decode("iso-8859-1"))
        else:
            out.append(b.decode(codec, errors="replace"))
    return pd.Series(out, dtype="object")


def decode_payload_text(
    df: DataFrame,
    payload: str = "payload",
    content_type: str = "content_type",
    text_col: str = "text",
    flag_col: str = "charset_unhandled",
) -> DataFrame:
    """Charset-aware payload decode with REAL multi-byte support (r14
    verdict item 5) — the DataFrame-level face of ``payload_text``:
    adds ``text_col`` (total decode, never null for non-null payloads)
    and ``flag_col`` (TRUE only for declared charsets outside ALL
    handled families — the rows still worth quarantining).

    Routing is a filter-split-union so each family takes its honest
    physical path at scale: UTF-8ish and Latin-1ish rows (the
    overwhelming majority of any real crawl) stay on payload_text's
    whole-stage-codegen JVM expressions — zero Python, zero Arrow
    transfer; only rows DECLARING a multi-byte family (shift_jis /
    gb* / big5 / euc-kr / euc-jp / iso-2022-jp / utf-16/32) cross to
    the Arrow-batched stdlib-codec decode. Both legs prune on the
    same codegen charset predicate, so a parquet-backed source scans
    twice but pushes the split down; the union is by-name and adds no
    shuffle. (A when/otherwise over a Python UDF would instead pull
    EVERY row through Arrow — Spark evaluates extracted Python UDFs
    unconditionally — which is exactly the scale trap this avoids.)

    The leftover ``flag_col`` quarantine set (EBCDIC dialects, KOI8,
    TIS-620, junk labels …) keeps the Latin-1 total fallback, same as
    payload_text."""
    cs = _declared_charset(content_type)
    multibyte = cs.isin(*_MULTIBYTE_CODECS)
    unhandled = (~cs.isin(*(_UTF8ISH + _LATIN1ISH)) & ~multibyte).alias(
        flag_col
    )
    fast = df.filter(~multibyte).select(
        "*",
        payload_text(payload, content_type).alias(text_col),
        unhandled,
    )
    slow = df.filter(multibyte).select(
        "*",
        _decode_multibyte(F.col(payload), cs).alias(text_col),
        F.lit(False).alias(flag_col),
    )
    return fast.unionByName(slow)


def surt(url: str | None) -> str:
    """SURT urlkey (Sort-friendly URI Reordering Transform) — the key
    CommonCrawl's CDX index sorts on: scheme and leading ``www.``
    dropped, host lowercased and dot-reversed, then ``)`` + path.
    ``https://News.Example.com/a/b?q=1`` → ``com,example,news)/a/b?q=1``.
    Pure function so executors and tests share one implementation."""
    if not url:
        return ""
    u = url.strip()
    for scheme in ("https://", "http://"):
        if u.lower().startswith(scheme):
            u = u[len(scheme) :]
            break
    host, sep, rest = u.partition("/")
    host = host.lower()
    if host.startswith("www."):
        host = host[4:]
    host = host.rsplit(":", 1)[0] if ":" in host else host
    key = ",".join(reversed(host.split(".")))
    return key + ")/" + (rest if sep else "")


def write_warc(
    df: DataFrame,
    out_dir: str,
    uri_col: str = "target_uri",
    html_col: str = "html",
    date: str = "1970-01-01T00:00:00Z",
    compress: bool = False,
    cdx: bool = False,
    max_file_bytes: int | None = 1 << 30,
    min_files_per_task: int = 1,
) -> DataFrame:
    """Export pages as WARC/1.0 **response** records — full HTTP
    envelope (status line + Content-Type) ahead of the body, i.e. the
    exact shape CommonCrawl archives and ``read_warc`` re-parses.
    ``write_wet``'s executor-local file-per-partition layout (no
    driver collect, no shuffle); returns the (warc_out_file,
    n_records) manifest — an action on it performs the write.

    ``compress=True`` writes ``.warc.gz`` in CommonCrawl's
    MEMBER-PER-RECORD gzip layout (each record its own gzip member,
    concatenated) — the layout that lets an indexed reader seek to a
    record's byte offset and decompress just that member;
    ``read_warc``'s multi-member gunzip consumes it directly.

    ``cdx=True`` (requires ``compress=True``) writes a
    ``part-NNNNN.cdx`` sidecar per archive file in CDXJ layout —
    ``<surt-urlkey> <ts14> <json{url,digest,offset,length,filename}>``
    one line per record, offsets/lengths of the COMPRESSED gzip member
    — i.e. CommonCrawl's cc-index contract: a reader seeks to
    ``offset``, reads ``length`` bytes, and decompresses exactly one
    record (``fetch_record``). The digest is the base32 SHA-1 of the
    payload (WARC-Payload-Digest convention), so index-level dedup
    works without touching the archives.

    Primary use: archiving a fetched page table; also lets the
    registered ``warc_pipeline`` round-trip the crawl front door
    end-to-end (write → read_warc → envelope split → html_to_text)
    without an external fixture.

    ``max_file_bytes`` ROLLS each task's output to a fresh archive file
    whenever the current file reaches the cap (default 1 GiB — the
    CommonCrawl archive-sizing convention), flushing completed files as
    it goes: a task holding a 10 GB partition no longer buffers 10 GB
    in Python NOR emits one 10 GB unsplittable archive that a
    binaryFile reader cannot parallelize (guide §6 output file sizing).
    ``min_files_per_task`` additionally splits the task's TAIL into at
    least that many byte-balanced files — the shuffle-free
    read-parallelism knob for split-starved writes (a 2-partition bench
    write otherwise yields a 2-split read); it never splits below one
    record per file. The first file keeps the legacy
    ``part-{{pid}}.{{ext}}`` name; rolled files append ``-{{k}}``.
    Record content is byte-identical either way — only file boundaries
    (and CDX offsets/filenames, which are file-layout artifacts by
    definition) change."""
    import base64
    import gzip
    import hashlib
    import json
    import os

    from pyspark import TaskContext

    if cdx and not compress:
        raise ValueError(
            "cdx=True requires compress=True: CDX offsets address "
            "per-record gzip members; an uncompressed archive has no "
            "independently decodable units to index"
        )
    ts14 = "".join(c for c in date if c.isdigit())[:14]

    def _write(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ctx = TaskContext.get()
        pid = ctx.partitionId()
        ext = "warc.gz" if compress else "warc"
        files: list[tuple[str, int]] = []  # committed (path, n_records)

        def _fname(k: int) -> str:
            # first file keeps the legacy single-file name so existing
            # readers/tests addressing part-NNNNN.<ext> stay valid
            return (
                f"part-{pid:05d}.{ext}"
                if k == 0
                else f"part-{pid:05d}-{k:04d}.{ext}"
            )

        def _commit(recs: list[bytes], metas: list[tuple]) -> None:
            """Atomically write one archive file (and its CDX sidecar)
            from a contiguous run of records.

            temp-plus-rename commit: a retried or speculative attempt
            writes its own attempt-suffixed file, then atomically
            renames over the final path — concurrent attempts can
            never interleave bytes, the last completed attempt wins.
            DOT-PREFIXED temp name: Spark's file listing skips names
            starting with '.' or '_', so a leftover temp from a
            killed attempt can never be ingested as an archive (a
            plain "<path>.attempt-N.tmp" would match the reader's
            default '*.warc*' glob)."""
            if not recs:
                return
            fname = _fname(len(files))
            path = os.path.join(out_dir, fname)
            os.makedirs(out_dir, exist_ok=True)
            tmp = os.path.join(
                out_dir, f".{fname}.attempt-{ctx.taskAttemptId()}.tmp"
            )
            with open(tmp, "wb") as f:
                f.write(b"".join(recs))
            os.replace(tmp, path)
            if cdx:
                # CDX offsets are per-file by definition; archive
                # renames FIRST so a committed index never points at a
                # missing file
                lines = []
                offset = 0
                for rec, (urlkey, url, digest) in zip(recs, metas):
                    lines.append(
                        f"{urlkey} {ts14} "
                        + json.dumps(
                            {
                                "url": url,
                                "digest": digest,
                                "offset": offset,
                                "length": len(rec),
                                "filename": fname,
                            },
                            separators=(",", ":"),
                        )
                    )
                    offset += len(rec)
                cdx_name = fname[: -len(ext) - 1] + ".cdx"
                cdx_tmp = os.path.join(
                    out_dir, f".{cdx_name}.attempt-{ctx.taskAttemptId()}.tmp"
                )
                with open(cdx_tmp, "w") as f:
                    f.write("\n".join(lines) + "\n")
                os.replace(cdx_tmp, os.path.join(out_dir, cdx_name))
            files.append((path, len(recs)))

        cur: list[bytes] = []
        cur_meta: list[tuple] = []
        cur_bytes = 0
        n = 0
        for pdf in it:
            for uri, html in zip(pdf[uri_col], pdf[html_col]):
                body = ("" if html is None else str(html)).encode("utf-8")
                http = (
                    "HTTP/1.1 200 OK\r\n"
                    "Content-Type: text/html\r\n"
                    f"Content-Length: {len(body)}\r\n\r\n"
                ).encode()
                block = http + body
                hdr = (
                    "WARC/1.0\r\n"
                    "WARC-Type: response\r\n"
                    f"WARC-Record-ID: <urn:warc:{pid}:{n}>\r\n"
                    f"WARC-Target-URI: {'' if uri is None else uri}\r\n"
                    f"WARC-Date: {date}\r\n"
                    "Content-Type: application/http; msgtype=response\r\n"
                    f"Content-Length: {len(block)}\r\n\r\n"
                ).encode()
                rec = hdr + block + b"\r\n\r\n"
                if compress:
                    # one gzip member per record (CommonCrawl layout);
                    # mtime pinned so archives are byte-deterministic
                    rec = gzip.compress(rec, mtime=0)
                if cdx:
                    digest = (
                        "sha1:"
                        + base64.b32encode(
                            hashlib.sha1(body).digest()
                        ).decode()
                    )
                    cur_meta.append(
                        (surt(uri), "" if uri is None else str(uri), digest)
                    )
                cur.append(rec)
                cur_bytes += len(rec)
                n += 1
                # roll + flush at the size cap: bounded task memory AND
                # bounded (hence read-splittable) archive files
                if max_file_bytes and cur_bytes >= max_file_bytes:
                    _commit(cur, cur_meta)
                    cur, cur_meta, cur_bytes = [], [], 0
        # tail: split into byte-balanced files until the task has
        # min_files_per_task archives (never below one record per file)
        want = min(min_files_per_task - len(files), len(cur))
        if want > 1:
            i = 0
            for j in range(want, 0, -1):  # j files remaining incl. this
                if j == 1:
                    _commit(cur[i:], cur_meta[i:])
                    i = len(cur)
                    break
                target = sum(len(r) for r in cur[i:]) / j
                k, b = i, 0
                while k < len(cur) - (j - 1) and (k == i or b < target):
                    b += len(cur[k])
                    k += 1
                _commit(cur[i:k], cur_meta[i:k])
                i = k
        else:
            _commit(cur, cur_meta)
        if files:
            yield pd.DataFrame(
                {
                    "warc_out_file": [p for p, _ in files],
                    "n_records": [c for _, c in files],
                }
            )

    return df.select(uri_col, html_col).mapInPandas(
        _write, schema="warc_out_file string, n_records long"
    )


def write_wet(
    df: DataFrame,
    out_dir: str,
    uri_col: str = "target_uri",
    text_col: str = "text",
    date: str = "1970-01-01T00:00:00Z",
) -> DataFrame:
    """Export extracted text as WET (WARC conversion records) — the
    format downstream text pipelines consume from CommonCrawl. One
    ``part-{partition}.warc.wet`` file per input partition, written on
    the executor that owns the partition (the exact inverse of
    ``read_warc``'s file-parallel read; no driver collect, no
    shuffle). Returns the (wet_file, n_records) manifest DataFrame —
    an action on it performs the write.

    ``date`` is an explicit parameter (stamped uniformly) so exports
    are deterministic and replay-stable; a production caller passes
    the crawl timestamp.
    """
    import os

    from pyspark import TaskContext

    def _write(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ctx = TaskContext.get()
        pid = ctx.partitionId()
        path = os.path.join(out_dir, f"part-{pid:05d}.warc.wet")
        n = 0
        buf: list[bytes] = []
        for pdf in it:
            for uri, text in zip(pdf[uri_col], pdf[text_col]):
                body = ("" if text is None else str(text)).encode("utf-8")
                hdr = (
                    "WARC/1.0\r\n"
                    "WARC-Type: conversion\r\n"
                    f"WARC-Record-ID: <urn:wet:{pid}:{n}>\r\n"
                    f"WARC-Target-URI: {'' if uri is None else uri}\r\n"
                    f"WARC-Date: {date}\r\n"
                    "Content-Type: text/plain\r\n"
                    f"Content-Length: {len(body)}\r\n\r\n"
                ).encode()
                buf.append(hdr + body + b"\r\n\r\n")
                n += 1
        if n:
            os.makedirs(out_dir, exist_ok=True)
            # same temp-plus-rename commit protocol as write_warc
            # DOT-PREFIXED temp name: Spark's file listing skips names
            # starting with '.' or '_', so a leftover temp from a
            # killed attempt can never be ingested as an archive (a
            # plain "<path>.attempt-N.tmp" would match the reader's
            # default '*.warc*' glob)
            tmp = os.path.join(
                out_dir,
                f".{os.path.basename(path)}.attempt-{ctx.taskAttemptId()}.tmp",
            )
            with open(tmp, "wb") as f:
                f.write(b"".join(buf))
            os.replace(tmp, path)
            yield pd.DataFrame({"wet_file": [path], "n_records": [n]})

    return df.select(uri_col, text_col).mapInPandas(
        _write, schema="wet_file string, n_records long"
    )


_CDX_SCHEMA = (
    "urlkey string, timestamp string, url string, digest string, "
    "offset long, length long, filename string"
)


def read_cdx(spark: SparkSession, folder: str) -> DataFrame:
    """Read ``write_warc(cdx=True)`` sidecars into one index frame —
    (urlkey, timestamp, url, digest, offset, length, filename). The
    parse is JVM-side (two substring_index splits + from_json), so a
    full-crawl index (billions of lines in production) scans like any
    text table: per-file parallelism, no Python, no shuffle. Sorting /
    range-partitioning by urlkey — how cc-index serves prefix lookups —
    is then ordinary DataFrame work on this frame."""
    from pyspark.sql import functions as F

    lines = spark.read.text(folder + "/*.cdx")
    j = F.expr("substring_index(value, ' ', -1)")
    parsed = F.from_json(
        j,
        "url string, digest string, offset long, length long, filename string",
    )
    return lines.select(
        F.expr("substring_index(value, ' ', 1)").alias("urlkey"),
        F.expr("substring_index(substring_index(value, ' ', 2), ' ', -1)").alias(
            "timestamp"
        ),
        parsed["url"].alias("url"),
        parsed["digest"].alias("digest"),
        parsed["offset"].alias("offset"),
        parsed["length"].alias("length"),
        parsed["filename"].alias("filename"),
    )


def _prefix_upper(prefix: str) -> str:
    """Tight exclusive upper bound for a SURT-prefix range: bump the
    last char — SURT keys are ASCII, so this never overflows."""
    return prefix[:-1] + chr(ord(prefix[-1]) + 1)


def build_cdx_index(
    spark: SparkSession, folder: str, out_dir: str, num_files: int = 8
) -> None:
    """Materialize the raw ``.cdx`` sidecars into the parquet mirror
    cc-index actually serves from: urlkey-RANGE-partitioned and sorted
    within files, so every parquet file owns one contiguous urlkey
    interval and carries tight min/max column stats. A prefix lookup
    against this layout prunes non-overlapping files/row-groups at
    scan time (``cdx_lookup_indexed`` + the plan-pin test prove the
    range predicates reach ``PushedFilters``). ``num_files`` sizes the
    mirror — production crawls use thousands; the sort is a one-time
    index-build shuffle over (urlkey, …) scalar rows, never payload
    bytes."""
    (
        read_cdx(spark, folder)
        .repartitionByRange(num_files, "urlkey", "timestamp")
        .sortWithinPartitions("urlkey", "timestamp")
        .write.mode("overwrite")
        .parquet(out_dir)
    )


def cdx_lookup_indexed(
    spark: SparkSession, index_dir: str, prefix: str
) -> DataFrame:
    """``cdx_lookup`` against the sorted parquet mirror — same
    results, but the half-open range compare is now a pushed parquet
    filter over range-partitioned files, so the scan touches only the
    files whose (min, max) urlkey interval overlaps the prefix. This
    is the serving-path plan at crawl scale; the raw-sidecar
    ``cdx_lookup`` is the no-index fallback."""
    from pyspark.sql import functions as F

    idx = spark.read.parquet(index_dir)
    if prefix:
        hi = _prefix_upper(prefix)
        idx = idx.filter((F.col("urlkey") >= prefix) & (F.col("urlkey") < hi))
    return idx.orderBy("urlkey", "timestamp")


def cdx_lookup(spark: SparkSession, folder: str, prefix: str) -> DataFrame:
    """Prefix-range lookup over the CDX index — the cc-index query
    contract ("every capture under ``com,example)/``"; an exact-URL
    lookup is the same call with ``prefix=surt(url)``). The predicate
    is an explicit half-open RANGE ``[prefix, next(prefix))`` rather
    than ``startswith`` because on the production layout — a
    urlkey-SORTED parquet index with per-file min/max zone maps, which
    is exactly how cc-index ships its parquet mirror — a range compare
    prunes non-overlapping files/row-groups at plan time, while a
    generic string predicate needs the row. On the raw ``.cdx``
    sidecars read here it degrades to the same pushed filter either
    way. Rows come back in (urlkey, timestamp) order — replay order,
    oldest capture first; the final sort touches only the matched
    rows, never the index."""
    from pyspark.sql import functions as F

    idx = read_cdx(spark, folder)
    if prefix:
        hi = _prefix_upper(prefix)
        idx = idx.filter((F.col("urlkey") >= prefix) & (F.col("urlkey") < hi))
    return idx.orderBy("urlkey", "timestamp")


def fetch_record(archive_path: str, offset: int, length: int) -> dict:
    """Random-access one record from a member-per-record ``.warc.gz``
    using a CDX row's (offset, length): seek, read exactly one gzip
    member, parse. This is the serving-side contract the index exists
    for (a wayback/cc-index replay tier does exactly this against S3
    range requests); the test suite uses it to prove every index row
    addresses a decodable record."""
    with open(archive_path, "rb") as f:
        f.seek(offset)
        member = f.read(length)
    blob = _gunzip_members(member)
    head, _, rest = blob.partition(b"\r\n\r\n")
    headers = _parse_headers(head)
    http_head, _, body = rest.partition(b"\r\n\r\n")
    return {
        "target_uri": headers.get("warc-target-uri", ""),
        "warc_date": headers.get("warc-date", ""),
        "payload": body.rsplit(b"\r\n\r\n", 1)[0] if body.endswith(b"\r\n\r\n") else body,
    }
