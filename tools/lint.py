#!/usr/bin/env python
"""Zero-dependency lint for the repo (the fmt+clippy slot of the reference's
CI, reference .github/workflows/ci.yml:49-56 / Cargo.toml:23-43 — no
third-party linters exist in this environment, so the checks are built on
ast/tokenize):

  * syntax errors (compileall equivalent, via ast.parse)
  * unused imports (module scope; `__init__.py` re-exports exempt)
  * tabs in indentation, trailing whitespace, lines > 100 chars
  * bare `except:`
  * mutable default arguments (list/dict/set literals)
  * f-strings with no placeholders

Usage: python tools/lint.py [paths...]   (default: fastlanes_tpu tools
tests benchmarks bench.py cli entry points). Exit 1 on any finding.
"""

from __future__ import annotations

import ast
import os
import sys

MAX_LINE = 100
DEFAULT_PATHS = ["fastlanes_tpu", "tools", "tests", "benchmarks",
                 "examples", "bench.py", "__graft_entry__.py"]


def iter_py(paths):
    for p in paths:
        if os.path.isfile(p) and p.endswith(".py"):
            yield p
        elif os.path.isdir(p):
            for root, _dirs, files in os.walk(p):
                for f in sorted(files):
                    if f.endswith(".py"):
                        yield os.path.join(root, f)


def _used_names(tree):
    used = set()
    for node in ast.walk(tree):
        if isinstance(node, ast.Name):
            used.add(node.id)
        elif isinstance(node, ast.Attribute):
            base = node
            while isinstance(base, ast.Attribute):
                base = base.value
            if isinstance(base, ast.Name):
                used.add(base.id)
    return used


def check_file(path):
    findings = []
    with open(path, encoding="utf-8") as f:
        src = f.read()
    try:
        tree = ast.parse(src, filename=path)
    except SyntaxError as e:
        return [(path, e.lineno or 0, f"syntax error: {e.msg}")]

    lines = src.splitlines()
    for i, line in enumerate(lines, 1):
        stripped = line.rstrip("\n")
        if stripped != stripped.rstrip():
            findings.append((path, i, "trailing whitespace"))
        indent = stripped[:len(stripped) - len(stripped.lstrip())]
        if "\t" in indent:
            findings.append((path, i, "tab in indentation"))
        if len(stripped) > MAX_LINE:
            findings.append((path, i, f"line longer than {MAX_LINE} chars"))

    # unused module-scope imports (skip __init__.py: re-export surface)
    if not path.endswith("__init__.py"):
        used = _used_names(tree)
        in_all = set()
        for node in tree.body:
            if (isinstance(node, ast.Assign) and len(node.targets) == 1
                    and isinstance(node.targets[0], ast.Name)
                    and node.targets[0].id == "__all__"
                    and isinstance(node.value, (ast.List, ast.Tuple))):
                in_all = {c.value for c in node.value.elts
                          if isinstance(c, ast.Constant)}
        for node in tree.body:
            if isinstance(node, ast.Import):
                for alias in node.names:
                    name = (alias.asname or alias.name).split(".")[0]
                    if name not in used and name not in in_all:
                        findings.append((path, node.lineno, f"unused import {name!r}"))
            elif isinstance(node, ast.ImportFrom):
                if node.module == "__future__":
                    continue
                for alias in node.names:
                    if alias.name == "*":
                        continue
                    name = alias.asname or alias.name
                    if name not in used and name not in in_all:
                        findings.append((path, node.lineno, f"unused import {name!r}"))

    # format specs are JoinedStr nodes themselves — not user f-strings
    spec_ids = {id(n.format_spec) for n in ast.walk(tree)
                if isinstance(n, ast.FormattedValue) and n.format_spec is not None}
    for node in ast.walk(tree):
        if isinstance(node, ast.ExceptHandler) and node.type is None:
            findings.append((path, node.lineno, "bare except"))
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)):
            for default in node.args.defaults + node.args.kw_defaults:
                if isinstance(default, (ast.List, ast.Dict, ast.Set)):
                    findings.append((path, default.lineno,
                                     "mutable default argument"))
        if isinstance(node, ast.JoinedStr) and id(node) not in spec_ids:
            if not any(isinstance(v, ast.FormattedValue) for v in node.values):
                findings.append((path, node.lineno, "f-string without placeholders"))
    return findings


def main(argv):
    paths = argv[1:] or DEFAULT_PATHS
    all_findings = []
    n_files = 0
    for path in iter_py(paths):
        n_files += 1
        all_findings.extend(check_file(path))
    for path, line, msg in all_findings:
        print(f"{path}:{line}: {msg}")
    print(f"# linted {n_files} files, {len(all_findings)} findings")
    return 1 if all_findings else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv))
