#!/usr/bin/env python
"""Minimal static-analysis net (this image ships no ruff/flake8/mypy).

Checks, per Python file:
  - syntax (compile)
  - unused imports (AST walk; `# noqa` on the import line opts out)
  - duplicate imports
  - mutable default arguments (list/dict/set literals)
  - bare `except:`
  - tabs in indentation
  - lines > 100 chars

Exit code 1 when any finding is reported. Parity: the reference wires
lint + static analysis into CI (reference: ci/lint.sh,
ci/scripts/run_static_analysis.sh, .github/workflows CodeQL/clippy);
this is the rebuild's in-repo equivalent, runnable via `make lint`.
"""

from __future__ import annotations

import ast
import sys
from pathlib import Path

MAX_LINE = 100


def iter_py_files(roots):
    for root in roots:
        p = Path(root)
        if p.is_file() and p.suffix == ".py":
            yield p
        elif p.is_dir():
            yield from sorted(p.rglob("*.py"))


class ImportCollector(ast.NodeVisitor):
    def __init__(self):
        self.imports = {}  # name -> (lineno, full)
        self.used = set()

    def visit_Import(self, node):
        for a in node.names:
            name = (a.asname or a.name).split(".")[0]
            self.imports.setdefault(name, []).append(node.lineno)

    def visit_ImportFrom(self, node):
        if node.module == "__future__":
            return  # always effectful
        for a in node.names:
            if a.name == "*":
                continue
            name = a.asname or a.name
            self.imports.setdefault(name, []).append(node.lineno)

    def visit_Name(self, node):
        self.used.add(node.id)

    def visit_Attribute(self, node):
        self.generic_visit(node)


def check_file(path: Path):
    findings = []
    try:
        src = path.read_text()
    except UnicodeDecodeError:
        return [(0, "not utf-8")]
    try:
        tree = ast.parse(src, filename=str(path))
    except SyntaxError as e:
        return [(e.lineno or 0, f"syntax error: {e.msg}")]

    lines = src.splitlines()
    noqa = {i + 1 for i, line in enumerate(lines) if "noqa" in line}

    # unused / duplicate imports — MODULE-LEVEL only (function-local
    # lazy imports are a deliberate pattern here: they defer heavy
    # deps and dodge circular imports)
    coll = ImportCollector()
    for stmt in tree.body:
        if isinstance(stmt, (ast.Import, ast.ImportFrom)):
            coll.visit(stmt)
    for node in ast.walk(tree):
        if isinstance(node, ast.Name):
            coll.used.add(node.id)
    used = set(coll.used)
    for node in ast.walk(tree):
        if isinstance(node, ast.Constant):
            v = node.value
            if isinstance(v, str) and v.isidentifier():
                used.add(v)
    is_init = path.name == "__init__.py"
    for name, linenos in coll.imports.items():
        live = [ln for ln in linenos if ln not in noqa]
        if not live:
            continue
        if len(linenos) > 1:
            findings.append((live[-1], f"duplicate import '{name}'"))
        if name not in used and not is_init:
            findings.append((live[0], f"unused import '{name}'"))

    for node in ast.walk(tree):
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)):
            for d in node.args.defaults + node.args.kw_defaults:
                if isinstance(d, (ast.List, ast.Dict, ast.Set)):
                    findings.append(
                        (node.lineno,
                         f"mutable default argument in '{node.name}'"))
        if isinstance(node, ast.ExceptHandler) and node.type is None:
            if node.lineno not in noqa:
                findings.append((node.lineno, "bare except"))

    for i, line in enumerate(lines, 1):
        if i in noqa:
            continue
        stripped = line.expandtabs(4)
        if line != stripped and line[: len(line) - len(line.lstrip())].count(
                "\t"):
            findings.append((i, "tab in indentation"))
        if len(line) > MAX_LINE:
            findings.append((i, f"line too long ({len(line)} > {MAX_LINE})"))
    return findings


def main() -> int:
    roots = sys.argv[1:] or ["trackiellm_tpu", "tools", "examples",
                             "bench.py", "__graft_entry__.py"]
    total = 0
    for f in iter_py_files(roots):
        for lineno, msg in check_file(f):
            print(f"{f}:{lineno}: {msg}")
            total += 1
    if total:
        print(f"\n{total} finding(s)")
        return 1
    print("lint clean")
    return 0


if __name__ == "__main__":
    sys.exit(main())
