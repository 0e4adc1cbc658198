"""compat.py shim behaviors that matter outside this container.

The protobuf alias itself is exercised end-to-end by the
transformWithState tests; what those can't cover is the synthesized
``google`` parent package created when NO real google distribution is
importable at alias time — that branch must not freeze an empty
``__path__`` that would block google.* subpackages installed later in
the same process (ADVICE r12). Pinned here directly against
``_DynamicNamespacePath``.
"""

from __future__ import annotations

import importlib
import sys
import types

from batchprocessingetl_spark.compat import _DynamicNamespacePath


def test_dynamic_namespace_path_sees_late_subpackages(tmp_path, monkeypatch):
    pkg = "gns_compat_probe"
    parent = types.ModuleType(pkg)
    parent.__path__ = _DynamicNamespacePath(pkg)
    monkeypatch.setitem(sys.modules, pkg, parent)

    # nothing on sys.path yet -> the path is empty, import fails
    assert len(parent.__path__) == 0
    # a distribution appears AFTER the parent was synthesized
    sub = tmp_path / pkg / "latearrival"
    sub.mkdir(parents=True)
    (sub / "__init__.py").write_text("X = 42\n")
    monkeypatch.syspath_prepend(str(tmp_path))

    assert list(parent.__path__) == [str(tmp_path / pkg)]
    mod = importlib.import_module(f"{pkg}.latearrival")
    try:
        assert mod.X == 42
    finally:
        sys.modules.pop(f"{pkg}.latearrival", None)


def test_dynamic_namespace_path_is_sequence_like(tmp_path):
    p = _DynamicNamespacePath("nonexistent_pkg_zz")
    assert len(p) == 0
    assert list(p) == []
    assert "nonexistent_pkg_zz" in repr(p)
