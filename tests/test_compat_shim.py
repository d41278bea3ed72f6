"""The protobuf bridge must leave a host EXACTLY as found when it
fails partway: a broken relocated runtime (directory present, import
explodes) must roll back sys.path, sys.meta_path, sys.modules AND the
PYTHONPATH/shim-dir mutations, and ensure_protobuf must report False.

Runs in a subprocess so the probe can't contaminate (or be
contaminated by) this interpreter's real bridge state."""

from __future__ import annotations

import json
import os
import subprocess
import sys
import textwrap


def test_failed_bridge_rolls_back_interpreter_state(tmp_path):
    # a tree that passes the isdir gate but blows up on import
    pkg = tmp_path / "cloudsdk" / "google" / "protobuf"
    pkg.mkdir(parents=True)
    (tmp_path / "cloudsdk" / "__init__.py").write_text("")
    (tmp_path / "cloudsdk" / "google" / "__init__.py").write_text("")
    (pkg / "__init__.py").write_text("raise RuntimeError('broken runtime')\n")

    probe = textwrap.dedent(
        """
        import json, sys, os
        sys.path.insert(0, os.environ["REPO"])
        before = {
            "path": list(sys.path),
            "meta": [type(f).__name__ for f in sys.meta_path],
            "pythonpath": os.environ.get("PYTHONPATH"),
            "mods": sorted(
                m for m in sys.modules
                if m.startswith(("google", "cloudsdk"))
            ),
        }
        from oil_wells_data_wrangling_spark.compat import ensure_protobuf
        ok = ensure_protobuf()
        after = {
            "path": list(sys.path),
            "meta": [type(f).__name__ for f in sys.meta_path],
            "pythonpath": os.environ.get("PYTHONPATH"),
            "mods": sorted(
                m for m in sys.modules
                if m.startswith(("google", "cloudsdk"))
            ),
        }
        print(json.dumps({"ok": ok, "before": before, "after": after}))
        """
    )
    env = dict(os.environ)
    env["SPARK_GRAFT_PROTOBUF_DIR"] = str(tmp_path)
    env["REPO"] = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env.pop("PYTHONPATH", None)
    out = subprocess.run(
        [sys.executable, "-c", probe],
        env=env,
        capture_output=True,
        text=True,
        timeout=120,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    res = json.loads(out.stdout.strip().splitlines()[-1])
    if res["ok"]:
        # host has a real installed protobuf — the shim never engaged,
        # which is itself the no-mutation contract for this test
        assert res["before"]["path"] == res["after"]["path"]
        return
    assert res["before"]["path"] == res["after"]["path"], "sys.path leaked"
    assert res["before"]["meta"] == res["after"]["meta"], "meta_path leaked"
    assert res["before"]["pythonpath"] == res["after"]["pythonpath"], (
        "PYTHONPATH leaked"
    )
    assert res["before"]["mods"] == res["after"]["mods"], "sys.modules leaked"
