"""Shared helpers for path-streaming readers (SCALE.md §11)."""

from __future__ import annotations


def local_path(path) -> str:
    """``binaryFile``'s ``path`` column is a URI (``file:/x``,
    ``file:///x``); strip it to a task-openable filesystem path. One
    implementation shared by every path-pruned reader so URI handling
    cannot drift between them."""
    p = str(path)
    if p.startswith("file:"):
        p = "/" + p[5:].lstrip("/")
    return p
