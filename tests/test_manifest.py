"""Delivery manifests: every shard hashed, every drift named."""

from __future__ import annotations

import json
import os

from oil_wells_data_wrangling_spark.sources.manifest import (
    MANIFEST_NAME,
    hash_folder,
    verify_manifest,
    write_manifest,
)
from oil_wells_data_wrangling_spark.sources.webdataset import write_webdataset


def _delivery(spark, tmp_path, n=6):
    df = spark.createDataFrame(
        [(f"k{i}", f"text {i}") for i in range(n)],
        "doc_id string, text string",
    ).repartition(3)
    out = str(tmp_path / "delivery")
    write_webdataset(df, out).collect()
    return out


def test_manifest_round_trip_all_ok(spark, tmp_path):
    out = _delivery(spark, tmp_path)
    path = write_manifest(spark, out)
    assert os.path.basename(path) == MANIFEST_NAME
    lines = [json.loads(l) for l in open(path)]
    shards = sorted(f for f in os.listdir(out) if f.endswith(".tar"))
    assert [e["file"] for e in lines] == shards  # sorted, complete
    import hashlib

    for e in lines:  # hashes are real sha256 of the bytes
        blob = open(os.path.join(out, e["file"]), "rb").read()
        assert e["sha256"] == hashlib.sha256(blob).hexdigest()
        assert e["n_bytes"] == len(blob)
    status = {r.file: r.status for r in verify_manifest(spark, out).collect()}
    assert set(status.values()) == {"ok"} and len(status) == len(shards)
    # the manifest does NOT list (or hash) itself: '_' prefix is
    # invisible to Spark's listing, so it can live inside the folder
    assert MANIFEST_NAME not in status
    assert hash_folder(spark, out).filter("file like '\\_%'").count() == 0


def test_manifest_names_every_drift(spark, tmp_path):
    out = _delivery(spark, tmp_path)
    write_manifest(spark, out)
    shards = sorted(f for f in os.listdir(out) if f.endswith(".tar"))
    # corrupt one byte of shard 0
    p0 = os.path.join(out, shards[0])
    blob = bytearray(open(p0, "rb").read())
    blob[10] ^= 0xFF
    open(p0, "wb").write(bytes(blob))
    # delete shard 1, add a stray file
    os.remove(os.path.join(out, shards[1]))
    open(os.path.join(out, "stray.tar"), "wb").write(b"not a delivery file")

    status = {r.file: r.status for r in verify_manifest(spark, out).collect()}
    assert status[shards[0]] == "changed"
    assert status[shards[1]] == "missing"
    assert status["stray.tar"] == "extra"
    for s in shards[2:]:
        assert status[s] == "ok"


def test_manifest_is_byte_deterministic(spark, tmp_path):
    import hashlib

    out = _delivery(spark, tmp_path)
    write_manifest(spark, out)
    h1 = hashlib.sha256(open(out + "/" + MANIFEST_NAME, "rb").read()).digest()
    write_manifest(spark, out)  # rewrite over identical data
    h2 = hashlib.sha256(open(out + "/" + MANIFEST_NAME, "rb").read()).digest()
    assert h1 == h2


def test_manifest_text_round_trip_without_driver_io(spark, tmp_path):
    """The non-POSIX contract: build content with manifest_text, carry
    it out of band, verify with manifest= — no driver open() against
    the folder's manifest at any point."""
    from oil_wells_data_wrangling_spark.sources.manifest import manifest_text

    out = _delivery(spark, tmp_path)
    text = manifest_text(spark, out)
    assert text.endswith("\n") and MANIFEST_NAME not in text
    status = {
        r.file: r.status
        for r in verify_manifest(spark, out, manifest=text).collect()
    }
    assert set(status.values()) == {"ok"}
    # and it is exactly what write_manifest would have written
    path = write_manifest(spark, out)
    assert open(path).read() == text
