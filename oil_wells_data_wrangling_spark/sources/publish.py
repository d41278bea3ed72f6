"""Atomic multi-output publish — all-or-nothing delivery of a
pipeline's output SET.

A training-data job rarely emits one artifact: a corpus export ships
with its stats table, its manifest, its tokenizer assets. Publishing
them with independent writes leaves real windows where a consumer sees
the new corpus with the old stats (or half of either, after a crash).
``publish_atomic`` gives the folder-of-outputs the same commit
discipline the MOR store gives its deltas:

1. every output is written to a dot-prefixed staging dir next to its
   final path (Spark jobs run at full parallelism — staging changes
   no plan);
2. one COMMIT RECORD (a JSON file listing the transaction's targets)
   is published via temp + ``os.replace`` — this rename is the commit
   point;
3. targets are rolled forward one rename pair each (final → trash,
   staging → final), then the record and trash are removed.

``recover_publishes`` makes any crash point deterministic: a commit
record present means roll FORWARD (finish every target's renames —
each step is idempotent under re-entry); staging dirs with no record
mean the transaction never committed and roll BACK (staging deleted,
finals untouched). Call it before reading a published root the way
``_recover_append_store`` guards the MOR store; the publisher calls
it automatically before starting a new transaction.

Semantics and limits (stated, not hidden — same posture as
sinks.py): single PUBLISHER per root; a reader racing the roll-forward
window can see target A new while B is mid-rename — on a POSIX
filesystem the window is a few renames wide, and a reader that runs
``recover_publishes`` first (or retries on missing paths) always sees
a consistent set. True multi-table isolation needs a table format's
catalog; this is the honest plain-directory equivalent.

Reference parity: the reference writes its two CSV-derived tables and
the serving JSON in separate steps (pdf_to_db.py, app.py) — a crash
between them serves a header table one load newer than stimulation.
"""

from __future__ import annotations

import json
import os
import shutil
import uuid
from collections.abc import Callable


def _txn_dir(root: str) -> str:
    return os.path.join(root, "_txn")


def publish_atomic(
    root: str,
    outputs: dict[str, Callable[[str], None]],
) -> str:
    """Publish every output in ``outputs`` (final-name → writer
    callable, invoked with the staging path — e.g.
    ``lambda p: df.write.parquet(p)``) under ``root`` as one
    transaction. Returns the transaction id. Names must be plain
    entries under root (no separators, no leading '_'/'.')."""
    for name in outputs:
        if (
            os.sep in name
            or "/" in name
            or name.startswith(("_", "."))
            or not name
        ):
            raise ValueError(f"invalid output name {name!r}")
    os.makedirs(root, exist_ok=True)
    recover_publishes(root)  # a prior crash must not leak into ours
    txid = uuid.uuid4().hex[:12]
    staged = {}
    for name, writer in outputs.items():
        stage = os.path.join(root, f".staging-{txid}-{name}")
        writer(stage)
        if not os.path.exists(stage):
            raise RuntimeError(
                f"writer for {name!r} produced nothing at {stage!r}"
            )
        staged[name] = stage
    # commit point: the record lists every target; its rename is atomic
    os.makedirs(_txn_dir(root), exist_ok=True)
    record = os.path.join(_txn_dir(root), f"{txid}.json")
    tmp = record + ".tmp"
    with open(tmp, "w") as fh:
        json.dump({"txid": txid, "targets": sorted(outputs)}, fh)
    os.replace(tmp, record)
    _roll_forward(root, txid, sorted(outputs))
    os.remove(record)
    return txid


def _roll_forward(root: str, txid: str, targets: list[str]) -> None:
    """Finish a committed transaction's renames. Every step checks
    state before acting, so re-entry after a crash at ANY point
    completes the same way."""
    for name in targets:
        stage = os.path.join(root, f".staging-{txid}-{name}")
        final = os.path.join(root, name)
        trash = os.path.join(root, f".trash-{txid}-{name}")
        if os.path.exists(stage):
            if os.path.exists(final) and not os.path.exists(trash):
                os.rename(final, trash)
            if not os.path.exists(final):
                os.rename(stage, final)
        if os.path.exists(trash):
            shutil.rmtree(trash, ignore_errors=True)


def recover_publishes(root: str) -> dict:
    """Deterministic crash recovery for ``publish_atomic`` roots:
    committed transactions (record present) roll FORWARD, uncommitted
    staging rolls BACK, orphan trash is swept. Returns
    ``{"rolled_forward": [...], "rolled_back": n}``."""
    tdir = _txn_dir(root)
    forward = []
    if os.path.isdir(tdir):
        for rec in sorted(os.listdir(tdir)):
            if not rec.endswith(".json"):
                if rec.endswith(".tmp"):
                    os.remove(os.path.join(tdir, rec))  # pre-commit
                continue
            with open(os.path.join(tdir, rec)) as fh:
                meta = json.load(fh)
            _roll_forward(root, meta["txid"], meta["targets"])
            os.remove(os.path.join(tdir, rec))
            forward.append(meta["txid"])
    rolled_back = 0
    if os.path.isdir(root):
        for d in os.listdir(root):
            # staging without a record = uncommitted; trash = done
            if d.startswith((".staging-", ".trash-")):
                shutil.rmtree(os.path.join(root, d), ignore_errors=True)
                rolled_back += d.startswith(".staging-")
    return {"rolled_forward": forward, "rolled_back": rolled_back}
