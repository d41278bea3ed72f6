"""Dataset delivery manifests — integrity for exported shard folders.

A training-data delivery is a folder of shards (WebDataset tars, WARC
archives, WET files…) handed to another team or copied across storage
systems. The questions the receiver asks — did every file arrive? did
any byte change? is anything extra in here? — are answered by a
manifest: one line per shard with its size and sha256, written next to
the data.

Scale shape: hashing is a PATH-pruned binaryFile listing (no bytes
through the JVM — SCALE.md §11) with the sha256 computed by streaming
each file in 1 MiB chunks inside the task, one task per shard, zero
shuffle. The only driver-side structure is one row per FILE (a shard
inventory, like the CDX file list — bounded by shard count, never by
data volume). The manifest itself is ``_MANIFEST.jsonl``: the
underscore prefix keeps it invisible to Spark's file listings, so it
can live inside the folder it describes without being ingested as a
shard.
"""

from __future__ import annotations

import hashlib
import json
import os
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from oil_wells_data_wrangling_spark.sources.pathutil import local_path

MANIFEST_NAME = "_MANIFEST.jsonl"

_HASH_SCHEMA = "file string, n_bytes long, sha256 string"


def _hash_files(opener=None):
    def _hash(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = {"file": [], "n_bytes": [], "sha256": []}
            for path in pdf["path"]:
                p = local_path(path)
                h = hashlib.sha256()
                n = 0
                f = opener(p) if opener else open(p, "rb")
                try:
                    while True:
                        chunk = f.read(1 << 20)
                        if not chunk:
                            break
                        h.update(chunk)
                        n += len(chunk)
                finally:
                    f.close()
                rows["file"].append(os.path.basename(p))
                rows["n_bytes"].append(n)
                rows["sha256"].append(h.hexdigest())
            if rows["file"]:
                yield pd.DataFrame(rows)

    return _hash


def hash_folder(
    spark: SparkSession, folder: str, glob: str = "*", opener=None
) -> DataFrame:
    """One (file, n_bytes, sha256) row per shard under ``folder`` —
    hashed executor-side off a path-pruned listing. ``opener`` follows
    THE OPENER CONTRACT in sources/pathutil.py (enforced by
    tests/test_opener_contract.py)."""
    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .load(folder)
        .select("path")
    )
    return files.mapInPandas(_hash_files(opener), schema=_HASH_SCHEMA)


def manifest_text(
    spark: SparkSession, folder: str, glob: str = "*", opener=None
) -> str:
    """The manifest CONTENT for ``folder`` — one compact JSON line per
    file, sorted by name, byte-deterministic for identical deliveries.
    This is the non-POSIX entry point: on object stores, hash with
    ``opener`` and PUT this string at ``folder/_MANIFEST.jsonl`` with
    your own storage client (``write_manifest``'s driver-local
    ``open()`` cannot reach a remote folder)."""
    rows = sorted(
        (r.file, r.n_bytes, r.sha256)
        for r in hash_folder(spark, folder, glob, opener).collect()
    )
    return "".join(
        json.dumps(
            {"file": name, "n_bytes": n_bytes, "sha256": sha},
            sort_keys=True,
            separators=(",", ":"),
        )
        + "\n"
        for name, n_bytes, sha in rows
    )


def write_manifest(
    spark: SparkSession, folder: str, glob: str = "*", opener=None
) -> str:
    """Hash every shard and write ``folder/_MANIFEST.jsonl``; returns
    the manifest path. Write the manifest LAST: its presence is the
    delivery's commit marker (the _SUCCESS convention, with integrity
    teeth). The manifest write itself is a driver-local ``open()`` —
    for folders only a storage client can write, build the content
    with ``manifest_text`` and PUT it yourself."""
    text = manifest_text(spark, folder, glob, opener)
    path = os.path.join(folder, MANIFEST_NAME)
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        f.write(text)
    os.replace(tmp, path)
    return path


def verify_manifest(
    spark: SparkSession,
    folder: str,
    glob: str = "*",
    opener=None,
    manifest: str | None = None,
) -> DataFrame:
    """Re-hash ``folder`` and diff against its ``_MANIFEST.jsonl`` —
    one (file, status) row per file with status ``ok`` (bytes match),
    ``changed`` (size or hash differs), ``missing`` (in the manifest,
    not on disk), or ``extra`` (on disk, not in the manifest). A clean
    delivery is all-ok; anything else names exactly what to re-copy.
    ``manifest`` overrides the driver-local read with manifest TEXT
    you fetched yourself — the non-POSIX counterpart of
    ``manifest_text`` (the default read, like the default write, only
    reaches driver-visible paths)."""
    from pyspark.sql import functions as F

    if manifest is None:
        with open(os.path.join(folder, MANIFEST_NAME)) as f:
            manifest = f.read()
    expected = [json.loads(line) for line in manifest.splitlines() if line.strip()]
    exp = spark.createDataFrame(
        [(e["file"], e["n_bytes"], e["sha256"]) for e in expected],
        "file string, exp_bytes long, exp_sha string",
    )
    got = hash_folder(spark, folder, glob, opener)
    joined = exp.join(got, "file", "full_outer")
    return joined.select(
        "file",
        F.when(F.col("exp_sha").isNull(), "extra")
        .when(F.col("sha256").isNull(), "missing")
        .when(
            (F.col("sha256") == F.col("exp_sha"))
            & (F.col("n_bytes") == F.col("exp_bytes")),
            "ok",
        )
        .otherwise("changed")
        .alias("status"),
    )
