"""Partition lifecycle — the retention job every date/tenant/band
partitioned table needs at 100 TB.

``expire_partitions`` walks a hive-partitioned table's first-level
partition directories, DECODES each value the way Spark wrote it
(percent-unquote; ``__HIVE_DEFAULT_PARTITION__`` for NULL — never
reconstruct ``col=value`` strings, the r12/r13 partition-path
lessons), classifies each against the retention rule, and removes the
expired directories. Metadata-only: one directory listing plus file
stats for the report — no Spark job, no data read.

Safety posture:
- ``dry_run=True`` is the DEFAULT — a bare call reports what WOULD
  expire and deletes nothing; the delete requires ``dry_run=False``.
- The rule is explicit: either ``keep_latest=N`` (lexicographically
  greatest N partition values survive — ISO dates and zero-padded
  keys sort correctly) or ``expire_when(decoded_value) -> bool``.
  Exactly one must be given.
- The NULL partition (``__HIVE_DEFAULT_PARTITION__``) is never
  expired by ``keep_latest`` (it has no place in a value ordering)
  and reaches ``expire_when`` as ``None`` so the caller decides.
- Deletion goes through a dot-prefixed rename first (invisible to
  Spark listings), then rmtree — a reader that already listed the
  dir can finish its scan with ``ignoreMissingFiles`` as with any
  concurrent-delete layout; new listings never see a half-deleted
  partition.

Returns one report dict per partition: ``{value, action, n_files,
bytes}`` — the audit row a retention job logs.
"""

from __future__ import annotations

import os
import shutil
import uuid
from collections.abc import Callable
from urllib.parse import unquote

_NULL_DIR = "__HIVE_DEFAULT_PARTITION__"


def expire_partitions(
    path: str,
    partition_col: str,
    keep_latest: int | None = None,
    expire_when: Callable[[str | None], bool] | None = None,
    dry_run: bool = True,
) -> list[dict]:
    if (keep_latest is None) == (expire_when is None):
        raise ValueError(
            "exactly one of keep_latest / expire_when is required"
        )
    if keep_latest is not None and keep_latest < 1:
        raise ValueError("keep_latest must be >= 1")
    prefix = f"{partition_col}="
    parts: list[tuple[str | None, str]] = []  # (decoded value, dir)
    for d in sorted(os.listdir(path)):
        if not d.startswith(prefix):
            continue
        raw = d[len(prefix):]
        decoded = None if raw == _NULL_DIR else unquote(raw)
        parts.append((decoded, os.path.join(path, d)))
    if keep_latest is not None:
        valued = sorted(
            [v for v, _ in parts if v is not None], reverse=True
        )
        survivors = set(valued[:keep_latest])
        def _expires(v):  # NULL partition never expires by recency
            return v is not None and v not in survivors
    else:
        _expires = expire_when
    report = []
    for value, dirpath in parts:
        n_files, nbytes = 0, 0
        for root, _dirs, files in os.walk(dirpath):
            for f in files:
                n_files += 1
                nbytes += os.path.getsize(os.path.join(root, f))
        expired = bool(_expires(value))
        action = (
            ("would_expire" if dry_run else "expired")
            if expired
            else "kept"
        )
        if expired and not dry_run:
            # rename out of Spark's visible namespace first, so a new
            # listing never sees a partially-deleted partition
            hidden = os.path.join(
                path, f".expired-{uuid.uuid4().hex[:8]}"
            )
            os.rename(dirpath, hidden)
            shutil.rmtree(hidden, ignore_errors=True)
        report.append(
            {
                "value": value,
                "action": action,
                "n_files": n_files,
                "bytes": nbytes,
            }
        )
    return report
