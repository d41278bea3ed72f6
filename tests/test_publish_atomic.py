"""publish_atomic — all-or-nothing delivery of an output SET (r15
§2.E): staging → one commit record (the atomic commit point) → rename
roll-forward, with deterministic recovery from a crash at every step.
Crash injection = calling the internal pieces exactly as far as the
crash point would have gotten, then asserting recover_publishes lands
on the right side of the commit line."""

from __future__ import annotations

import json
import os

import pytest

from oil_wells_data_wrangling_spark.sources.publish import (
    publish_atomic,
    recover_publishes,
)


def _writer(content: str):
    def write(path: str) -> None:
        os.makedirs(path)
        with open(os.path.join(path, "part-0.txt"), "w") as fh:
            fh.write(content)

    return write


def _read(root: str, name: str) -> str:
    with open(os.path.join(root, name, "part-0.txt")) as fh:
        return fh.read()


def _entries(root: str) -> set[str]:
    return {d for d in os.listdir(root) if not d.startswith(("_", "."))}


def test_happy_path_publishes_all_and_cleans_up(tmp_path):
    root = str(tmp_path / "pub")
    txid = publish_atomic(
        root, {"corpus": _writer("c1"), "stats": _writer("s1")}
    )
    assert txid
    assert _entries(root) == {"corpus", "stats"}
    assert _read(root, "corpus") == "c1" and _read(root, "stats") == "s1"
    # no staging/trash/records left behind
    assert not [d for d in os.listdir(root) if d.startswith(".")]
    assert os.listdir(os.path.join(root, "_txn")) == []
    # republish REPLACES both atomically
    publish_atomic(root, {"corpus": _writer("c2"), "stats": _writer("s2")})
    assert _read(root, "corpus") == "c2" and _read(root, "stats") == "s2"


def test_crash_before_commit_rolls_back(tmp_path):
    """Staging written, record never published → the transaction never
    happened: finals keep the OLD set, staging is swept."""
    root = str(tmp_path / "pub")
    publish_atomic(root, {"corpus": _writer("old"), "stats": _writer("old")})
    # simulate: a second publish crashed after staging both outputs
    _writer("new")(os.path.join(root, ".staging-deadbeef-corpus"))
    _writer("new")(os.path.join(root, ".staging-deadbeef-stats"))
    r = recover_publishes(root)
    assert r["rolled_back"] == 2 and r["rolled_forward"] == []
    assert _read(root, "corpus") == "old" and _read(root, "stats") == "old"
    assert not [d for d in os.listdir(root) if d.startswith(".")]


def test_crash_after_commit_rolls_forward(tmp_path):
    """Record published, no rename done → the transaction HAPPENED:
    recovery must finish both targets."""
    root = str(tmp_path / "pub")
    publish_atomic(root, {"corpus": _writer("old"), "stats": _writer("old")})
    _writer("new")(os.path.join(root, ".staging-feedface-corpus"))
    _writer("new")(os.path.join(root, ".staging-feedface-stats"))
    os.makedirs(os.path.join(root, "_txn"), exist_ok=True)
    with open(os.path.join(root, "_txn", "feedface.json"), "w") as fh:
        json.dump(
            {"txid": "feedface", "targets": ["corpus", "stats"]}, fh
        )
    r = recover_publishes(root)
    assert r["rolled_forward"] == ["feedface"]
    assert _read(root, "corpus") == "new" and _read(root, "stats") == "new"
    assert not [d for d in os.listdir(root) if d.startswith(".")]


def test_crash_mid_renames_completes_the_rest(tmp_path):
    """One target fully renamed, the second still staged, old final in
    trash → recovery finishes the second and sweeps the trash; both
    finals are the NEW set (never a mixed set after recovery)."""
    root = str(tmp_path / "pub")
    publish_atomic(root, {"corpus": _writer("old"), "stats": _writer("old")})
    # corpus: fully rolled forward by the crashed publisher
    os.rename(
        os.path.join(root, "corpus"),
        os.path.join(root, ".trash-cafebabe-corpus"),
    )
    _writer("new")(os.path.join(root, "corpus"))
    # stats: still staged
    _writer("new")(os.path.join(root, ".staging-cafebabe-stats"))
    with open(os.path.join(root, "_txn", "cafebabe.json"), "w") as fh:
        json.dump(
            {"txid": "cafebabe", "targets": ["corpus", "stats"]}, fh
        )
    recover_publishes(root)
    assert _read(root, "corpus") == "new" and _read(root, "stats") == "new"
    assert not [d for d in os.listdir(root) if d.startswith(".")]


def test_invalid_names_and_empty_writer_rejected(tmp_path):
    root = str(tmp_path / "pub")
    with pytest.raises(ValueError):
        publish_atomic(root, {"a/b": _writer("x")})
    with pytest.raises(ValueError):
        publish_atomic(root, {"_txn": _writer("x")})
    with pytest.raises(RuntimeError):
        publish_atomic(root, {"ok": lambda p: None})  # wrote nothing


def test_spark_outputs_publish_together(spark, tmp_path):
    """The real shape: two Spark writes (corpus parquet + stats
    parquet) land as one transaction and read back consistent."""
    root = str(tmp_path / "pub")
    df = spark.range(100).selectExpr("id", "id % 7 as k")
    stats = df.groupBy("k").count()
    publish_atomic(
        root,
        {
            "corpus": lambda p: df.write.parquet(p),
            "stats": lambda p: stats.write.parquet(p),
        },
    )
    assert spark.read.parquet(os.path.join(root, "corpus")).count() == 100
    got = {
        (r.k, r["count"])
        for r in spark.read.parquet(os.path.join(root, "stats")).collect()
    }
    assert got == {(i, 100 // 7 + (1 if i < 100 % 7 else 0)) for i in range(7)}


def test_publish_corpus_with_manifest_inside_the_transaction(
    spark, tmp_path
):
    """Composition shape (r15): the corpus shards AND their integrity
    manifest publish as ONE transaction — the manifest is written
    inside the staged corpus before the commit point, so no reader
    can ever see shards without their manifest (or a manifest naming
    shards that aren't there), and verify_manifest reads clean on the
    published final."""
    from oil_wells_data_wrangling_spark.sources.manifest import (
        verify_manifest,
        write_manifest,
    )

    root = str(tmp_path / "pub")
    df = spark.range(50).selectExpr("id", "cast(id * 2 as long) as v")

    def corpus_writer(stage: str) -> None:
        df.repartition(2).write.parquet(stage)
        write_manifest(spark, stage, glob="*.parquet")

    publish_atomic(root, {"corpus": corpus_writer})
    final = os.path.join(root, "corpus")
    statuses = {
        r.status
        for r in verify_manifest(spark, final, glob="*.parquet").collect()
    }
    assert statuses == {"ok"}
    assert spark.read.parquet(final).count() == 50
