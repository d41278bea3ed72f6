#!/usr/bin/env python3
"""Vendor Leaflet for air-gapped serving.

Downloads the pinned Leaflet release into
``oil_wells_data_wrangling_spark/static/lib/leaflet/`` so ``/map``
serves with zero network (the page is local-first and falls back to
the CDN only when these files are absent). Run once, anywhere with
network, before deploying to an offline environment:

    python scripts/vendor_leaflet.py [dest_dir]

Integrity: the version is pinned; every downloaded file's SHA-256 is
printed for audit, and optional env pins ``LEAFLET_SHA256_<NAME>``
(e.g. ``LEAFLET_SHA256_LEAFLET_JS``) reject mismatches before anything
is written. Sanity markers (the Leaflet banner / class prefix) guard
against CDN error pages. This script is the only network-touching code
in the repo and is NOT imported by the engine.
"""

from __future__ import annotations

import hashlib
import os
import re
import sys
import urllib.request

VERSION = "1.9.4"
BASE = f"https://unpkg.com/leaflet@{VERSION}/dist/"

# file -> sanity marker that must appear in the payload
FILES = {
    "leaflet.js": b"Leaflet",
    "leaflet.css": b".leaflet-",
    "images/marker-icon.png": b"\x89PNG",
    "images/marker-icon-2x.png": b"\x89PNG",
    "images/marker-shadow.png": b"\x89PNG",
    "images/layers.png": b"\x89PNG",
    "images/layers-2x.png": b"\x89PNG",
}


def fetch(url: str) -> bytes:
    with urllib.request.urlopen(url, timeout=60) as r:
        return r.read()


def main() -> int:
    dest = (
        sys.argv[1]
        if len(sys.argv) > 1
        else os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "oil_wells_data_wrangling_spark",
            "static",
            "lib",
            "leaflet",
        )
    )
    staged: list[tuple[str, bytes]] = []
    for name, marker in FILES.items():
        data = fetch(BASE + name)
        digest = hashlib.sha256(data).hexdigest()
        if marker not in data[: 1 << 20]:
            print(f"REFUSING {name}: payload lacks {marker!r}", file=sys.stderr)
            return 1
        env = "LEAFLET_SHA256_" + re.sub(r"[^A-Z0-9]+", "_", name.upper())
        pinned = os.environ.get(env)
        if pinned and pinned.lower() != digest:
            print(
                f"REFUSING {name}: sha256 {digest} != ${env}={pinned}",
                file=sys.stderr,
            )
            return 1
        print(f"{name}: sha256 {digest} ({len(data)} bytes)")
        staged.append((name, data))
    for name, data in staged:  # all-or-nothing: write only after every fetch
        path = os.path.join(dest, name)
        os.makedirs(os.path.dirname(path), exist_ok=True)
        with open(path, "wb") as f:
            f.write(data)
        print(f"wrote {path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
