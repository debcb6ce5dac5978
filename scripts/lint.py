#!/usr/bin/env python
"""One-command lint gate: `python scripts/lint.py`.

Runs ruff + mypy when they are installed (CI), and always runs a stdlib
fallback so the gate is meaningful on minimal images too: byte-compile
every file, flag lines over the limit, unused imports, bare excepts and
accidental `print` calls in the library (the CLI and scripts are allowed
to print). Exit code 0 = clean.
"""

from __future__ import annotations

import ast
import pathlib
import shutil
import subprocess
import sys

ROOT = pathlib.Path(__file__).resolve().parents[1]
PACKAGE = ROOT / "salamander_tpu"
TESTS = ROOT / "tests"
LINE_LIMIT = 88
# files whose job is user-facing terminal output
PRINT_OK = {"cli.py", "__main__.py", "profiling.py"}


def external_tools() -> int:
    rc = 0
    if shutil.which("ruff"):
        rc |= subprocess.call(
            ["ruff", "check", str(PACKAGE), str(TESTS)], cwd=ROOT
        )
    else:
        print("lint: ruff not installed; stdlib checks only")
    if shutil.which("mypy"):
        rc |= subprocess.call(["mypy", str(PACKAGE)], cwd=ROOT)
    else:
        print("lint: mypy not installed; stdlib checks only")
    return rc


class _Imports(ast.NodeVisitor):
    """Collect imported names and every name used anywhere in the file."""

    def __init__(self) -> None:
        self.imported: dict[str, int] = {}
        self.used: set[str] = set()

    def visit_Import(self, node: ast.Import) -> None:
        for alias in node.names:
            name = alias.asname or alias.name.split(".")[0]
            self.imported[name] = node.lineno

    def visit_ImportFrom(self, node: ast.ImportFrom) -> None:
        if node.module == "__future__":
            return
        for alias in node.names:
            if alias.name == "*":
                continue
            self.imported[alias.asname or alias.name] = node.lineno

    def visit_Name(self, node: ast.Name) -> None:
        self.used.add(node.id)

    def visit_Attribute(self, node: ast.Attribute) -> None:
        self.generic_visit(node)


def check_file(path: pathlib.Path) -> list[str]:
    problems: list[str] = []
    rel = path.relative_to(ROOT)
    text = path.read_text()
    for i, line in enumerate(text.splitlines(), 1):
        if len(line) > LINE_LIMIT and "noqa" not in line:
            problems.append(f"{rel}:{i}: line too long ({len(line)})")
        if line != line.rstrip():
            problems.append(f"{rel}:{i}: trailing whitespace")
    try:
        tree = ast.parse(text, filename=str(path))
    except SyntaxError as err:
        return [f"{rel}:{err.lineno}: syntax error: {err.msg}"]

    is_init = path.name == "__init__.py"
    visitor = _Imports()
    visitor.visit(tree)
    # names in __all__ strings and doctest-ish usage count as used
    for node in ast.walk(tree):
        if isinstance(node, ast.Constant) and isinstance(node.value, str):
            visitor.used.add(node.value)
    if not is_init:
        for name, lineno in sorted(visitor.imported.items()):
            if name not in visitor.used and not name.startswith("_"):
                problems.append(f"{rel}:{lineno}: unused import '{name}'")

    in_package = PACKAGE in path.parents
    lines = text.splitlines()
    for node in ast.walk(tree):
        if isinstance(node, ast.ExceptHandler) and node.type is None:
            problems.append(f"{rel}:{node.lineno}: bare 'except:'")
        if (
            in_package
            and path.name not in PRINT_OK
            and isinstance(node, ast.Call)
            and isinstance(node.func, ast.Name)
            and node.func.id == "print"
        ):
            # verbose/debug-gated prints are the reference's own idiom
            context = " ".join(
                lines[max(0, node.lineno - 3):node.lineno]
            )
            if any(w in context for w in ("verbos", "debug", "noqa")):
                continue
            problems.append(
                f"{rel}:{node.lineno}: unguarded print() in library code "
                "(use warnings/logging, gate on verbose, or move to cli.py)"
            )
    return problems


def stdlib_gate() -> int:
    problems: list[str] = []
    for base in (PACKAGE, TESTS):
        for path in sorted(base.rglob("*.py")):
            if "__pycache__" in path.parts:
                continue
            problems.extend(check_file(path))
    for p in problems:
        print(p)
    print(f"lint (stdlib): {len(problems)} problem(s)")
    return 1 if problems else 0


if __name__ == "__main__":
    sys.exit(external_tools() | stdlib_gate())
