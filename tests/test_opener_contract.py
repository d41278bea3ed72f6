"""The opener contract (sources/pathutil.py module docstring), enforced
once against EVERY path-streaming consumer: read_warc_paths,
read_webdataset, and hash_folder must produce correct results through
an opener whose streams are (a) non-seekable and (b) raw — returning
SHORT reads — once wrapped in ContractStream, and must close every
stream they open. A consumer that seeks, trusts a short read, or leaks
a handle fails here before it fails on an object store."""

from __future__ import annotations

import hashlib
import os

import pytest

from oil_wells_data_wrangling_spark.sources.pathutil import ContractStream


def _make_opener(track_dir: str):
    """Build a contract-hostile opener. The raw body seeks never
    (raises), returns AT MOST 7 bytes per read (the chunked-HTTP
    shape), and records open/close as marker files under ``track_dir``
    (executors are separate processes — a counter dict would mutate a
    pickled copy). Classes are nested so cloudpickle ships them by
    value to executors."""
    import os as _os
    import uuid as _uuid

    class RawShortReads:
        def __init__(self, path):
            self._f = open(path, "rb")
            self._id = _uuid.uuid4().hex
            open(_os.path.join(track_dir, f"opened-{self._id}"), "w").close()

        def read(self, n=-1):
            if n is None or n < 0:
                n = 7
            return self._f.read(min(n, 7))

        def seek(self, *a):
            raise OSError("opener contract clause 2: not seekable")

        def tell(self):
            raise OSError("opener contract clause 2: not seekable")

        def close(self):
            open(_os.path.join(track_dir, f"closed-{self._id}"), "w").close()
            self._f.close()

    return lambda p: ContractStream(RawShortReads(p))


def _counts(track_dir: str) -> tuple[int, int]:
    names = os.listdir(track_dir)
    return (
        sum(1 for n in names if n.startswith("opened-")),
        sum(1 for n in names if n.startswith("closed-")),
    )


def test_contract_stream_full_reads_over_short_raw(tmp_path):
    """Clause 3 in isolation: ContractStream turns a 7-byte-max raw
    into exact-count reads with b'' only at EOF."""
    p = tmp_path / "blob.bin"
    p.write_bytes(bytes(range(256)) * 10)
    track = tmp_path / "track"
    track.mkdir()
    s = _make_opener(str(track))(str(p))
    assert s.read(2) == bytes([0, 1])  # the WARC-sniff shape
    assert s.read(1000) == (bytes(range(256)) * 10)[2:1002]
    rest = s.read(-1)
    assert rest == (bytes(range(256)) * 10)[1002:]
    assert s.read(5) == b""  # EOF, and only EOF, is empty
    s.close()
    assert _counts(str(track)) == (1, 1)


def test_read_warc_paths_honors_contract(spark, tmp_path):
    from oil_wells_data_wrangling_spark.sources.warc import (
        read_warc,
        read_warc_paths,
        write_warc,
    )

    pages = spark.createDataFrame(
        [(f"https://o.example/{i}", f"<html>oc {i}</html>") for i in range(9)],
        "target_uri string, html string",
    ).coalesce(1)
    for compress in (False, True):  # plain AND gzip (2-byte sniff live)
        out = str(tmp_path / f"arch{compress}")
        write_warc(pages, out, compress=compress).collect()
        track = tmp_path / f"track{compress}"
        track.mkdir()
        got = read_warc_paths(
            spark, out, opener=_make_opener(str(track))
        ).collect()
        want = read_warc(spark, out).collect()
        assert sorted(r.record_id for r in got) == sorted(
            r.record_id for r in want
        )
        assert len(got) == 9
        opened, closed = _counts(str(track))
        assert opened >= 1 and opened == closed


def test_read_webdataset_honors_contract(spark, tmp_path):
    from oil_wells_data_wrangling_spark.sources.webdataset import (
        read_webdataset,
        write_webdataset,
    )

    df = spark.createDataFrame(
        [(f"k{i}", f"text {i}") for i in range(6)],
        "doc_id string, text string",
    ).coalesce(2)
    out = str(tmp_path / "shards")
    write_webdataset(df, out).collect()
    track = tmp_path / "track"
    track.mkdir()
    got = read_webdataset(
        spark, out, opener=_make_opener(str(track))
    ).collect()
    assert {(r.key, r.payload.decode()) for r in got} == {
        (f"k{i}", f"text {i}") for i in range(6)
    }
    assert _counts(str(track)) == (2, 2)


def test_hash_folder_honors_contract(spark, tmp_path):
    from oil_wells_data_wrangling_spark.sources.manifest import hash_folder

    folder = tmp_path / "data"
    folder.mkdir()
    blobs = {}
    for i in range(3):
        b = os.urandom(3000 + i)
        (folder / f"f{i}.bin").write_bytes(b)
        blobs[f"f{i}.bin"] = b
    track = tmp_path / "track"
    track.mkdir()
    got = hash_folder(
        spark, str(folder), opener=_make_opener(str(track))
    ).collect()
    assert {r.file: (r.n_bytes, r.sha256) for r in got} == {
        name: (len(b), hashlib.sha256(b).hexdigest())
        for name, b in blobs.items()
    }
    assert _counts(str(track)) == (3, 3)


def test_consumer_list_is_complete():
    """Every opener= parameter in sources/ has a conformance test
    above — adding a new opener consumer without extending this file
    fails here (fetch_record is the documented seekable exception and
    takes (offset, length), not an opener)."""
    import glob as globmod
    import re

    src_dir = os.path.join(
        os.path.dirname(__file__),
        "..",
        "oil_wells_data_wrangling_spark",
        "sources",
    )
    consumers = set()
    for path in globmod.glob(os.path.join(src_dir, "*.py")):
        text = open(path).read()
        for m in re.finditer(
            r"^def (\w+)\([^)]*\bopener\b[^)]*\)", text, re.M | re.S
        ):
            consumers.add(m.group(1))
    # private plumbing shares its public caller's test
    consumers -= {"_parse_shard_paths", "_hash_files"}
    assert consumers == {
        "read_warc_paths",
        "read_webdataset",
        "read_webdataset_stream",  # same plumbing as read_webdataset
        "hash_folder",
        "write_manifest",  # delegates to hash_folder
        "manifest_text",  # delegates to hash_folder
        "verify_manifest",  # delegates to hash_folder
    }, f"new opener consumer(s) need a conformance test: {consumers}"
