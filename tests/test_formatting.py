"""Style/format gate — the analog of the reference's formatting test
(reference tests/test_formatting.py:8-15 runs `black --diff` + ruff as
a test). This container has neither tool, so the gate is import-gated:
use ruff when present, otherwise enforce a stdlib subset (parseable
source, no tabs-in-indent, no trailing whitespace, newline at EOF, no
wildcard imports, no bare except, no unused imports, bounded line
length)."""

from __future__ import annotations

import ast
import pathlib
import subprocess
import sys

ROOT = pathlib.Path(__file__).resolve().parent.parent
SOURCES = sorted(
    p
    for sub in ("github_etl_spark", "tests", "tools")
    for p in (ROOT / sub).rglob("*.py")
) + [ROOT / "bench.py", ROOT / "__spark_entry__.py"]
MAX_LINE = 140  # SQL oracle strings run long; code lines stay far under


def _ruff_available() -> bool:
    try:
        subprocess.run(
            [sys.executable, "-m", "ruff", "--version"],
            capture_output=True,
            check=True,
        )
        return True
    except Exception:
        return False


def test_style_gate():
    if _ruff_available():
        proc = subprocess.run(
            [sys.executable, "-m", "ruff", "check", *map(str, SOURCES)],
            capture_output=True,
            text=True,
        )
        assert proc.returncode == 0, proc.stdout[-4000:]
        return

    problems: list[str] = []
    for path in SOURCES:
        rel = path.relative_to(ROOT)
        text = path.read_text(encoding="utf-8")
        if text and not text.endswith("\n"):
            problems.append(f"{rel}: missing newline at EOF")
        for i, line in enumerate(text.splitlines(), 1):
            if line != line.rstrip():
                problems.append(f"{rel}:{i}: trailing whitespace")
            if "\t" in line:
                problems.append(f"{rel}:{i}: tab character")
            if len(line) > MAX_LINE:
                problems.append(f"{rel}:{i}: line longer than {MAX_LINE}")
        try:
            tree = ast.parse(text, filename=str(rel))
        except SyntaxError as e:
            problems.append(f"{rel}: syntax error: {e}")
            continue
        problems += _ast_lint(tree, rel, text)
    assert not problems, "\n".join(problems[:50])


def _ast_lint(tree: ast.AST, rel, text: str) -> list[str]:
    out = []
    lines = text.splitlines()
    imported: dict[str, int] = {}  # name -> lineno
    for node in ast.walk(tree):
        if isinstance(node, ast.ImportFrom):
            for alias in node.names:
                if alias.name == "*":
                    out.append(f"{rel}:{node.lineno}: wildcard import")
                elif node.module != "__future__":
                    imported[alias.asname or alias.name] = node.lineno
        elif isinstance(node, ast.Import):
            for alias in node.names:
                imported[(alias.asname or alias.name).split(".")[0]] = node.lineno
        elif isinstance(node, ast.ExceptHandler) and node.type is None:
            out.append(f"{rel}:{node.lineno}: bare except")
    if rel.name == "__init__.py":
        return out  # re-export surface: imports are the point
    used = {
        n.id for n in ast.walk(tree) if isinstance(n, ast.Name)
    } | {
        a for n in ast.walk(tree) if isinstance(n, ast.Attribute)
        for a in [getattr(n.value, "id", None)] if a
    }
    for name, lineno in imported.items():
        line = lines[lineno - 1] if lineno - 1 < len(lines) else ""
        if name not in used and "noqa" not in line:
            out.append(f"{rel}:{lineno}: unused import {name!r}")
    return out
