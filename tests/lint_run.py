#!/usr/bin/env python3
"""Static checks (the reference's lint tier, dependency-free: no
pylint/mypy in this environment): syntax-compile every module and flag
unused imports via AST."""

from __future__ import annotations

import ast
import os
import sys

ROOT = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "neuralmonkey_tpu")

# names imported for re-export or side effects
ALLOW_UNUSED = {"__init__.py"}


def check_file(path: str) -> list:
    problems = []
    with open(path, encoding="utf-8") as f:
        source = f.read()
    try:
        tree = ast.parse(source, filename=path)
    except SyntaxError as exc:
        return [f"{path}:{exc.lineno}: syntax error: {exc.msg}"]

    if os.path.basename(path) in ALLOW_UNUSED:
        return problems

    imported = {}
    for node in ast.walk(tree):
        if isinstance(node, ast.Import):
            for alias in node.names:
                name = (alias.asname or alias.name).split(".")[0]
                imported[name] = node.lineno
        elif isinstance(node, ast.ImportFrom):
            for alias in node.names:
                if alias.name == "*":
                    continue
                imported[alias.asname or alias.name] = node.lineno

    used = set()
    for node in ast.walk(tree):
        if isinstance(node, ast.Name):
            used.add(node.id)
        elif isinstance(node, ast.Attribute):
            inner = node
            while isinstance(inner, ast.Attribute):
                inner = inner.value
            if isinstance(inner, ast.Name):
                used.add(inner.id)
    # string annotations / docstrings may reference types
    text_uses = source

    for name, lineno in sorted(imported.items()):
        if name in used or name in text_uses:
            continue
        problems.append(f"{path}:{lineno}: unused import '{name}'")
    return problems


def main() -> int:
    all_problems = []
    for dirpath, _, filenames in os.walk(ROOT):
        for filename in sorted(filenames):
            if filename.endswith(".py"):
                all_problems.extend(
                    check_file(os.path.join(dirpath, filename)))
    for problem in all_problems:
        print(problem)
    print(f"lint: {len(all_problems)} problem(s)")
    return 1 if all_problems else 0


if __name__ == "__main__":
    sys.exit(main())
