"""Guard: no module may define the same top-level name twice.

Round 13 re-implemented ``cms_rollup_stream`` in ``streaming/jobs.py``
without noticing the round-8 definition earlier in the same module —
Python silently shadows the first, leaving ~60 unreachable lines and a
test that exercised a different function than it named (VERDICT r13).
This AST scan fails on any re-offense, anywhere in the package.
"""

from __future__ import annotations

import ast
from collections import Counter
from pathlib import Path

PKG = Path(__file__).resolve().parent.parent / "batchprocessingetl_spark"


def _top_level_defs(tree: ast.Module) -> list[str]:
    names = []
    for node in tree.body:
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)):
            names.append(node.name)
    return names


def test_no_duplicate_top_level_definitions():
    offenders: dict[str, list[str]] = {}
    for path in sorted(PKG.rglob("*.py")):
        tree = ast.parse(path.read_text(), filename=str(path))
        dupes = [n for n, c in Counter(_top_level_defs(tree)).items() if c > 1]
        if dupes:
            offenders[str(path.relative_to(PKG.parent))] = sorted(dupes)
    assert not offenders, f"shadowed top-level definitions: {offenders}"
