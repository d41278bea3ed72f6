"""Shared helpers for path-streaming readers (SCALE.md §11)."""

from __future__ import annotations


def local_path(path) -> str:
    """``binaryFile``'s ``path`` column is a URI (``file:/x``,
    ``file:///x``); strip it to a task-openable filesystem path. One
    implementation shared by every path-pruned reader so URI handling
    cannot drift between them.

    A URI with a real AUTHORITY (``file://host/x``) is rejected loudly
    instead of silently folding the host into the path (the pre-r12
    ``lstrip('/')`` bug would open ``/host/x``): NFS/FUSE deployments
    that surface an authority must mount the share and hand the reader
    a local path, or plug in an ``opener``. Parsed by hand rather than
    ``urlsplit`` so member paths containing ``#``/``?`` — legal in
    filenames, fragment/query markers to a URL parser — survive."""
    p = str(path)
    if p.startswith("file://"):
        rest = p[len("file://") :]
        authority, _, tail = rest.partition("/")
        if authority not in ("", "localhost"):
            raise ValueError(
                f"file URI {p!r} has a non-local authority"
                f" {authority!r}; mount it and pass a local path, or"
                " supply opener="
            )
        return "/" + tail
    if p.startswith("file:"):
        return p[len("file:") :]
    return p
