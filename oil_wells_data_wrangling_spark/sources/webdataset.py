"""WebDataset tar shards — the dataloader-facing serving format.

Training jobs do not read a lakehouse: PyTorch/JAX input pipelines
stream **tar shards** where each sample is a run of adjacent members
sharing a basename key (``000042.txt`` + ``000042.json`` + optionally
``000042.png`` …) — the WebDataset convention (public spec:
github.com/webdataset/webdataset; same layout tarp/NVIDIA DALI
consume). This module is the bridge from the curated parquet corpus to
that contract, and back.

Reference parity: the reference's serving tier exports query results as
JSON for a web app (``app.py:15-44``); a training-data engine's
equivalent export surface is the shard writer a dataloader mounts.

Scale shape (both directions shuffle-free):
- ``write_webdataset`` is ``write_warc``'s executor-local
  file-per-partition layout — one tar per input partition, written
  inside the task via the dot-prefixed-temp + atomic-rename commit
  protocol. The caller's partitioning IS the shard-size knob
  (``df.repartition(n)`` for ~equal shards, ``repartitionByRange`` for
  key-sorted shards); at 100 TB that is the same file-inventory
  parallelism CommonCrawl uses, no driver involvement, no exchange.
- ``read_webdataset`` scans shards with ``binaryFile`` (one task per
  shard) and parses the tar inside the task with an Arrow-batched
  ``mapInPandas`` — member bytes never cross an exchange; downstream
  projections prune to the suffixes they need.

Determinism: tar metadata is pinned (mtime 0, uid/gid 0, USTAR), member
order is (key, suffix)-sorted within a shard, and JSON sidecars are
compact/sorted-key — so identical input partitions produce
byte-identical shards (the write_warc mtime-pin convention; makes shard
diffs and digest-level dedup meaningful).
"""

from __future__ import annotations

import io
import json
import os
import tarfile
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from oil_wells_data_wrangling_spark.sources.pathutil import local_path

WDS_MEMBER_SCHEMA = "shard string, key string, suffix string, payload binary"


def _jsonable(v, col: str):
    """Arrow→pandas scalars to plain-JSON values, deterministically.
    Values with no faithful JSON form (bytes, arbitrary objects) FAIL
    LOUDLY — ``default=str`` would silently write Python reprs into
    the sidecar and trainers would consume corrupted metadata."""
    import datetime
    import math

    import numpy as np

    if isinstance(v, (list, tuple)):
        return [_jsonable(x, col) for x in v]
    if isinstance(v, np.ndarray):
        return [_jsonable(x, col) for x in v.tolist()]
    if v is None or (not isinstance(v, (str, bytes)) and pd.isna(v)):
        return None
    if isinstance(v, np.generic):
        v = v.item()
    if isinstance(v, (pd.Timestamp, datetime.datetime, datetime.date)):
        return v.isoformat()
    if isinstance(v, float) and math.isinf(v):  # NaN is already null
        # via pd.isna above; json.dumps would emit the non-standard
        # 'Infinity' literal for ±inf — strict parsers reject it,
        # lenient ones misread it; fail loudly like the bytes case
        raise ValueError(
            f"meta column {col!r} has a non-finite float {v!r}:"
            " no strict-JSON form (clip or null it upstream)"
        )
    if isinstance(v, (str, int, float, bool)):
        return v
    raise ValueError(
        f"meta column {col!r} has no faithful JSON form: {type(v).__name__}"
        " (encode bytes yourself, e.g. base64, or drop the column)"
    )


def _tarinfo(name: str, size: int) -> tarfile.TarInfo:
    ti = tarfile.TarInfo(name=name)
    ti.size = size
    ti.mtime = 0
    ti.uid = ti.gid = 0
    ti.uname = ti.gname = ""
    ti.mode = 0o644
    return ti


def write_webdataset(
    df: DataFrame,
    out_dir: str,
    key_col: str = "doc_id",
    text_col: str | None = "text",
    meta_cols: tuple[str, ...] = (),
    bin_members: dict[str, str] | None = None,
) -> DataFrame:
    """Export a corpus as WebDataset tar shards, one per input
    partition: each row becomes a sample — adjacent tar members
    ``{key}.txt`` (utf-8 text), ``{key}.json`` (compact sorted-key
    metadata sidecar, only when ``meta_cols`` given) and one
    ``{key}{suffix}`` per ``bin_members`` entry (binary column →
    member suffix, e.g. ``{"img": ".png"}`` for multimodal samples).
    Returns the ``(shard, n_samples, n_bytes)`` manifest; an action on
    it performs the write. Keys must be dot-free (the dot separates
    key from suffix in the WebDataset contract) — violations fail the
    task loudly rather than writing unloadable shards."""
    from pyspark import TaskContext

    bins = dict(bin_members or {})
    # suffix hygiene, validated DRIVER-side before any task launches:
    # a suffix without the leading dot key-fuses into the basename, and
    # a collision (with '.txt'/'.json' or between two bin columns)
    # writes duplicate member names in one sample — both are unloadable
    # shards of exactly the class the dotted-key and duplicate-key
    # checks fail loudly on
    for col, suffix in bins.items():
        if not suffix.startswith(".") or len(suffix) < 2 or "/" in suffix:
            raise ValueError(
                f"bin_members[{col!r}] suffix {suffix!r} must start"
                " with '.', name an extension (e.g. '.png'), and"
                " contain no '/' (tar readers treat it as a directory"
                " separator and regroup the sample under a wrong key)"
            )
    reserved = ([".json"] if meta_cols else []) + (
        [".txt"] if text_col else []
    )
    all_suffixes = reserved + list(bins.values())
    if len(set(all_suffixes)) != len(all_suffixes):
        raise ValueError(
            f"webdataset member suffixes collide: {sorted(all_suffixes)!r}"
            " (each sample's members must have distinct suffixes)"
        )
    cols = [key_col] + ([text_col] if text_col else [])
    cols += list(meta_cols) + list(bins)

    def _write(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ctx = TaskContext.get()
        pid = ctx.partitionId()
        fname = f"part-{pid:05d}.tar"
        samples = []
        for pdf in it:
            for row in pdf.itertuples(index=False):
                r = dict(zip(pdf.columns, row))
                key = str(r[key_col])
                if "." in key or "/" in key:
                    raise ValueError(
                        "webdataset key may not contain '.' or '/':"
                        f" {key!r}"
                    )
                members: list[tuple[str, bytes]] = []
                if meta_cols:
                    meta = {c: _jsonable(r[c], c) for c in meta_cols}
                    members.append(
                        (
                            key + ".json",
                            json.dumps(
                                meta,
                                sort_keys=True,
                                separators=(",", ":"),
                                allow_nan=False,  # backstop: _jsonable
                                # nulls NaN and rejects ±inf already
                            ).encode("utf-8"),
                        )
                    )
                if text_col:
                    t = r[text_col]
                    members.append(
                        (key + ".txt", ("" if t is None else str(t)).encode())
                    )
                for col, suffix in bins.items():
                    b = r[col]
                    if b is not None:
                        members.append((key + suffix, bytes(b)))
                samples.append((key, sorted(members)))
        if not samples:
            return
        samples.sort()
        # duplicate keys make shards loaders can't group — fail like
        # the dotted-key check, not silently (duplicates across
        # DIFFERENT shards are the caller's keyspace to guarantee)
        from collections import Counter

        dup = [k for k, c in Counter(k for k, _ in samples).items() if c > 1]
        if dup:
            raise ValueError(
                f"duplicate webdataset keys within one shard: {dup[:5]!r}"
            )
        buf = io.BytesIO()
        # USTAR: the oldest, most portable dialect — every dataloader's
        # tar reader accepts it, and it has no vendor extension blocks
        # that could vary across Python versions
        with tarfile.open(
            fileobj=buf, mode="w", format=tarfile.USTAR_FORMAT
        ) as tar:
            for _, members in samples:
                for name, data in members:
                    tar.addfile(_tarinfo(name, len(data)), io.BytesIO(data))
        blob = buf.getbuffer()  # zero-copy view, not a bytes copy
        os.makedirs(out_dir, exist_ok=True)
        path = os.path.join(out_dir, fname)
        # dot-prefixed temp + atomic rename (write_warc protocol): a
        # leftover temp from a killed attempt is invisible to Spark's
        # file listing and can never be ingested as a shard
        tmp = os.path.join(
            out_dir, f".{fname}.attempt-{ctx.taskAttemptId()}.tmp"
        )
        with open(tmp, "wb") as f:
            f.write(blob)
        n_bytes = blob.nbytes
        del blob  # release the view so the BytesIO can be collected
        os.replace(tmp, path)
        yield pd.DataFrame(
            {
                "shard": [path],
                "n_samples": [len(samples)],
                "n_bytes": [n_bytes],
            }
        )

    return df.select(*cols).mapInPandas(
        _write, schema="shard string, n_samples long, n_bytes long"
    )


def repartition_for_shard_size(
    df: DataFrame,
    target_bytes: int,
    key_col: str = "doc_id",
    text_col: str | None = "text",
    meta_cols: tuple[str, ...] = (),
    bin_members: dict[str, str] | None = None,
) -> DataFrame:
    """Size ``write_webdataset``'s shards: estimate the TAR bytes each
    row will produce, compute ``ceil(total / target_bytes)`` partitions
    from ONE aggregate over the frame, and round-robin repartition so
    every shard lands near ``target_bytes`` (production dataloaders
    want ~equal shards in the 100 MB–1 GB band, not whatever the
    upstream shuffle happened to leave).

    Per-row estimate = member payload bytes (``octet_length`` of the
    text / binary columns, a sorted-key JSON guess for ``meta_cols``)
    plus tar framing (one 512-byte header per member, data padded to
    512). The estimate is exact for framing and payloads, approximate
    only for the JSON sidecar — measured within a few percent.

    Skew behavior, documented honestly: round-robin DEALS each input
    partition's rows evenly across shards, so per-shard byte error is
    bounded by ±(input partitions) × max_row_bytes of deal-remainder
    granularity — shards land within ±20% of target whenever they hold
    tens of rows or more (production shards hold thousands), and the
    tested 50× row-size skew stays within ±20%. A single row larger
    than ``target_bytes`` makes its shard oversized (an unsplittable
    sample — cap payloads upstream). Exact contiguous bin-packing
    would need a global cumulative sum, i.e. a SECOND payload
    exchange; deal granularity is not worth that at shard scale.
    Ordering inside each shard remains (key, suffix)-sorted by the
    writer; cross-shard ordering is sacrificed for size balance (use
    ``repartitionByRange(key)`` instead when range-sharding matters
    more than byte balance)."""
    if target_bytes <= 0:
        raise ValueError(f"target_bytes must be positive: {target_bytes}")
    bins = dict(bin_members or {})

    def member(payload_bytes):  # tar framing: header + 512-padding
        p = payload_bytes.cast("bigint")
        return F.lit(512) + F.floor((p + F.lit(511)) / F.lit(512)).cast(
            "bigint"
        ) * F.lit(512)

    per_row = (
        member(F.coalesce(F.octet_length(F.col(text_col)), F.lit(0)))
        if text_col
        else F.lit(0)
    )
    if meta_cols:
        # compact sorted-key JSON: {"k":v,...} — 4 bytes of punctuation
        # per pair + key + value-as-text (nulls are 4 bytes)
        json_len = F.lit(2 + 3 * len(meta_cols) + 1)
        for c in meta_cols:
            json_len = (
                json_len
                + F.lit(len(c))
                + F.coalesce(
                    F.octet_length(F.col(c).cast("string")), F.lit(4)
                )
            )
        per_row = per_row + member(json_len)
    for c in bins:
        per_row = per_row + F.when(
            F.col(c).isNull(), F.lit(0)
        ).otherwise(member(F.octet_length(F.col(c))))
    total = df.agg(
        F.sum(per_row).cast("bigint").alias("b"),
        F.count(F.lit(1)).alias("n"),
    ).collect()[0]
    if not total["n"]:
        return df.coalesce(1)
    n_shards = max(1, -(-int(total["b"]) // int(target_bytes)))
    return df.repartition(n_shards)


def read_webdataset(
    spark: SparkSession,
    folder: str,
    opener=None,
    chunk_members: int = 4096,
) -> DataFrame:
    """Read WebDataset shards back as one row per tar member —
    ``(shard, key, suffix, payload binary)`` in ARCHIVE ORDER (the
    order a sequential dataloader sees; members of one sample are
    adjacent by construction, which the test suite pins). Reassembling
    samples is ordinary DataFrame work on this frame — e.g. filter to
    ``suffix = '.txt'`` for the text view, or group by (shard, key)
    when a sample's members must travel together.

    Memory posture (this is the part that matters at shard scale):
    the binaryFile scan is pruned to the PATH column, so shard bytes
    never enter the JVM or cross the Arrow boundary — each task
    stream-parses its tar straight from storage (``tarfile`` reads
    member-by-member) and yields members in ``chunk_members`` batches.
    Production WebDataset shards run 100 MB–1 GB; a whole-file
    ``content`` read would hold several copies per concurrent task
    (measured: 32 tasks × 33 MB shards OOM a default 1 GB heap), while
    this plan's peak is one member chunk. ``opener(path) -> file
    object`` plugs in non-POSIX storage (object-store client; THE
    OPENER CONTRACT lives in sources/pathutil.py and is enforced by
    tests/test_opener_contract.py); the default opens the
    task-visible filesystem path, which is the local/NFS/FUSE case."""
    files = spark.read.format("binaryFile").load(folder + "/*.tar")
    return files.select("path").mapInPandas(
        _parse_shard_paths(opener, chunk_members), schema=WDS_MEMBER_SCHEMA
    )


def read_webdataset_stream(
    spark: SparkSession,
    folder: str,
    opener=None,
    chunk_members: int = 4096,
) -> DataFrame:
    """STREAMING shard ingest: the same member rows over a binaryFile
    file-source stream — new shards landing under ``folder`` become
    micro-batches, and the checkpoint's seen-file log gives
    exactly-once per-shard processing (a training-data delivery drop
    never double-ingests on restart; ``read_warc_stream``'s contract,
    shard-shaped). Same path-pruned, in-task streaming parse as the
    batch reader: the file-source row carries only (path, mtime,
    length) — shard bytes never enter the JVM in the stream either."""
    files = (
        spark.readStream.format("binaryFile")
        .schema(
            "path string, modificationTime timestamp, "
            "length long, content binary"
        )
        .option("pathGlobFilter", "*.tar")
        .load(folder)
    )
    return files.select("path").mapInPandas(
        _parse_shard_paths(opener, chunk_members), schema=WDS_MEMBER_SCHEMA
    )


def _parse_shard_paths(opener, chunk_members: int):
    def _parse(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            for path in pdf["path"]:
                shard = local_path(path)
                fobj = opener(shard) if opener else open(shard, "rb")
                rows = {"shard": [], "key": [], "suffix": [], "payload": []}
                try:
                    with tarfile.open(fileobj=fobj, mode="r|*") as tar:
                        for m in tar:
                            if not m.isfile():
                                continue
                            base = os.path.basename(m.name)
                            key, dot, suffix = base.partition(".")
                            rows["shard"].append(shard)
                            rows["key"].append(key)
                            rows["suffix"].append(dot + suffix)
                            rows["payload"].append(tar.extractfile(m).read())
                            if len(rows["key"]) >= chunk_members:
                                yield pd.DataFrame(rows)
                                rows = {
                                    "shard": [],
                                    "key": [],
                                    "suffix": [],
                                    "payload": [],
                                }
                finally:
                    fobj.close()
                if rows["key"]:
                    yield pd.DataFrame(rows)

    return _parse
