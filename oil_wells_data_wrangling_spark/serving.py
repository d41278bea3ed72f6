"""HTTP serving layer over the partitioned JSON export (reference parity:
app.py:15-38 — Flask ``/wells`` returning the joined, lat/lon-filtered
well rows as JSON for the Leaflet map).

Architecture differs from the reference on purpose: the reference runs
its SQL join per request against MySQL; at lake scale the engine
PRECOMPUTES the serving payload (``serve_wells``/``serve_wells_full`` →
``sinks.export_json`` partitioned by the viewport key) and the web tier
is a dumb static reader — no Spark, no database in the request path.
This module is that web tier, stdlib-only (``http.server``): ``/wells``
streams every partition, ``/wells?<key>=<value>`` reads exactly one
partition directory (the viewport fetch the export layout was designed
for — cf. ``spatial_bbox``). Any WSGI/CDN stack would do the same; a
threaded stdlib server keeps the dependency surface at zero.
"""

from __future__ import annotations

import json
import os
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qsl, urlsplit


def _iter_json_rows(root: str, partition: tuple[str, str] | None):
    """Yield dict rows from a Spark JSON-lines export directory.

    Spark lays out ``<root>/part-*.json`` (unpartitioned) or
    ``<root>/<col>=<value>/part-*.json``; the partition column is
    encoded in the directory name, so it is re-attached to each row."""
    for dirpath, _dirnames, filenames in os.walk(root):
        rel = os.path.relpath(dirpath, root)
        part_kv: dict[str, str] = {}
        ok = True
        if rel != ".":
            for seg in rel.split(os.sep):
                if "=" not in seg:
                    ok = False
                    break
                k, v = seg.split("=", 1)
                part_kv[k] = v
                if partition is not None and k == partition[0] and v != partition[1]:
                    ok = False
                    break
        elif partition is not None:
            ok = False
        if not ok:
            continue
        for fn in sorted(filenames):
            if not fn.startswith("part-") or not fn.endswith(".json"):
                continue
            with open(os.path.join(dirpath, fn), encoding="utf-8") as f:
                for line in f:
                    line = line.strip()
                    if line:
                        row = json.loads(line)
                        row.update(part_kv)
                        yield row


class _WellsHandler(BaseHTTPRequestHandler):
    export_dir: str = "."

    def log_message(self, *args) -> None:  # quiet test runs
        pass

    def do_GET(self) -> None:  # noqa: N802 (http.server API)
        url = urlsplit(self.path)
        if url.path != "/wells":
            self.send_error(404)
            return
        q = dict(parse_qsl(url.query))
        partition = next(iter(q.items())) if q else None
        try:
            rows = list(_iter_json_rows(self.export_dir, partition))
        except OSError:
            self.send_error(500)
            return
        body = json.dumps(rows).encode("utf-8")
        self.send_response(200)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)


def serve_wells_http(
    export_dir: str, host: str = "127.0.0.1", port: int = 0
) -> ThreadingHTTPServer:
    """Start the serving tier over ``export_dir`` (an ``export_json``
    output). ``port=0`` binds an ephemeral port (``server.server_port``);
    the server runs on a daemon thread — call ``server.shutdown()`` to
    stop. Returns the server instance."""
    handler = type("Handler", (_WellsHandler,), {"export_dir": export_dir})
    server = ThreadingHTTPServer((host, port), handler)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    return server
