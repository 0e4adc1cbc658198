"""Worker-side protobuf shim hook.

This directory is prepended to PYTHONPATH by the session factory ONLY
when the driver itself needed the vendored-protobuf alias
(batchprocessingetl_spark/compat.py — see that module's docstring).
Python workers (`python -m pyspark.daemon`) import sitecustomize at
interpreter startup, re-installing the alias before pyspark's lazy
``StateMessage_pb2`` imports run inside transformWithState tasks.
Self-locating: compat.py sits one directory up.
"""

import os
import sys

_pkg_root = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
if _pkg_root not in sys.path:
    sys.path.insert(0, _pkg_root)

try:
    from batchprocessingetl_spark.compat import ensure_protobuf

    ensure_protobuf()
except Exception:  # never break an interpreter over an optional shim
    pass
