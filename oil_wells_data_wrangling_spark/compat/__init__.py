"""Optional-dependency bridges.

The engine's hard dependencies are pyspark + pyarrow + pandas + numpy.
Everything else is import-gated (pdfplumber/OCR in the PDF source,
playwright in the fetch source, onnxruntime in inference) — this
package holds the one gate that needs more than a try/except:
``google.protobuf`` for the ``transformWithStateInPandas`` worker
protocol, bridged from a relocated on-disk runtime when no installed
distribution exists.
"""

from __future__ import annotations

import os
import sys

_SHIM_DIR = os.path.join(os.path.dirname(__file__), "_pb_worker_shim")


def ensure_protobuf() -> bool:
    """Make ``google.protobuf`` importable for the driver AND Spark's
    Python workers, if at all possible. Returns True when protobuf is
    usable afterwards.

    Order: (1) an installed distribution wins untouched; (2) otherwise
    the ``_pb_worker_shim`` bridge package is placed on ``sys.path``
    (driver) and prepended to ``$PYTHONPATH`` (workers inherit the env
    of the JVM, which inherits the driver's — so this MUST run before
    the SparkSession/JVM is created to reach workers). On failure both
    are rolled back so an unrelated host is left exactly as found.
    """
    try:
        import google.protobuf  # noqa: F401

        return True
    except ImportError:
        pass

    old_pythonpath = os.environ.get("PYTHONPATH")
    had_google = "google" in sys.modules
    sys.path.insert(0, _SHIM_DIR)
    os.environ["PYTHONPATH"] = (
        _SHIM_DIR + ((os.pathsep + old_pythonpath) if old_pythonpath else "")
    )
    try:
        import google.protobuf  # noqa: F401

        return True
    except Exception:
        # broad catch: a BROKEN relocated runtime raises whatever its
        # module body raises, not just ImportError — either way the
        # bridge is unusable and the host must be left exactly as
        # found. The shim module unwinds its own sys.path/meta_path/
        # sys.modules side effects before re-raising; this branch
        # restores the two mutations made here.
        sys.path.remove(_SHIM_DIR)
        if old_pythonpath is None:
            del os.environ["PYTHONPATH"]
        else:
            os.environ["PYTHONPATH"] = old_pythonpath
        if not had_google:
            # the failed import can leave the shim's 'google' namespace
            # package cached; drop it only if we introduced it
            sys.modules.pop("google", None)
        return False
