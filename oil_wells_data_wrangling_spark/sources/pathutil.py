"""Shared helpers for path-streaming readers (SCALE.md §11) — and THE
OPENER CONTRACT every path-streaming consumer honors.

``opener(path) -> file object`` is how ``read_warc_paths``,
``read_webdataset`` / ``read_webdataset_stream``, and ``hash_folder``
(the manifest writer) plug in non-POSIX storage. The contract, stated
once here so it cannot drift per consumer (it did: r11's gzip sniff
seeked and broke an object-store opener until fixed):

1. ``opener`` receives the ``local_path()``-translated, task-visible
   path string and returns an object with ``read(n) -> bytes`` and
   ``close()``.
2. **Streaming-safe**: consumers never call ``seek``/``tell`` — a
   one-shot object-store body works. (``fetch_record`` is the
   deliberate exception: CDX random access requires ranged reads and
   takes ``(offset, length)``, not an opener.)
3. **Buffered read semantics**: ``read(n)`` returns exactly ``n``
   bytes unless EOF; for ``n > 0``, ``b""`` means EOF and only EOF
   (``read(0)`` is trivially empty and carries no EOF signal —
   consumers don't issue it). Raw bodies that
   may return short reads (``io.RawIOBase``, chunked HTTP) must be
   wrapped — ``ContractStream`` below does it — because consumers
   frame records on exact counts (the WARC magic sniff reads 2 bytes;
   a 1-byte short read would silently misclassify the archive).
4. **Lifecycle**: called once per file per task; the consumer closes
   it in a ``finally``. Transient-failure RETRY belongs inside the
   opener (or to Spark's task retry, which re-invokes it); consumers
   never retry a torn stream themselves — tolerant parsing quarantines
   the damaged tail instead (the warc corruption contract).

``tests/test_opener_contract.py`` runs every consumer against a
non-seekable short-read fake to enforce all four clauses.
"""

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


class ContractStream:
    """Adapt any raw ``read()`` object to the opener contract's
    buffered semantics (clause 3): ``read(n)`` accumulates raw reads
    until exactly ``n`` bytes or EOF, never exposes ``seek``/``tell``,
    and forwards ``close()``. Opener authors wrap one-shot bodies:
    ``opener=lambda p: ContractStream(client.get_object(p))``."""

    def __init__(self, raw):
        self._raw = raw
        self._eof = False

    def read(self, n: int = -1) -> bytes:
        if n == 0:
            # zero-length read: empty WITHOUT meaning EOF (clause 3's
            # "b'' means EOF" applies to n > 0 reads; consumers do not
            # issue read(0), but the adapter must not mislead one that
            # does)
            return b""
        if n is None or n < 0:
            chunks = []
            while True:
                c = self._raw.read(1 << 20)
                if not c:
                    break
                chunks.append(c)
            self._eof = True
            return b"".join(chunks)
        out = bytearray()
        while len(out) < n and not self._eof:
            c = self._raw.read(n - len(out))
            if not c:
                self._eof = True
                break
            out += c
        return bytes(out)

    def close(self) -> None:
        close = getattr(self._raw, "close", None)
        if close:
            close()
