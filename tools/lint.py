#!/usr/bin/env python
"""Self-contained lint pass (no third-party linters in this image).

Implements the checks the reference enforces through flake8 +
pre-commit (reference: .pre-commit-config.yaml, .flake8) using only the
stdlib, so `python tools/lint.py` works offline and in CI:

  * syntax: every file must compile
  * F401-style unused imports (module scope, ast-based)
  * tabs in indentation, trailing whitespace, CRLF line endings
  * merge-conflict markers
  * leftover debugger calls (pdb / breakpoint)
  * line length (max 100; URLs and noqa lines exempt)

Exit code 0 = clean.  `--fix` rewrites whitespace-only findings
(trailing whitespace, CRLF, missing final newline) in place.

A `# noqa` comment on the offending line suppresses any finding.
"""
import argparse
import ast
import re
import sys
from pathlib import Path

MAX_LINE = 100
EXCLUDE_DIRS = {".git", "__pycache__", ".pytest_cache", "build", "dist",
                "node_modules", ".eggs"}
CONFLICT = re.compile(r"^(<{7} |={7}$|>{7} )")
DEBUGGER = re.compile(r"(^|\W)(pdb\.set_trace|breakpoint)\s*\(")


def iter_py(root: Path):
    for p in sorted(root.rglob("*.py")):
        if not EXCLUDE_DIRS.intersection(p.parts):
            yield p


def iter_text(root: Path):
    for pat in ("*.py", "*.md", "*.yaml", "*.yml", "*.sh", "*.cc", "*.h"):
        for p in sorted(root.rglob(pat)):
            if not EXCLUDE_DIRS.intersection(p.parts):
                yield p


def _used_names(tree: ast.AST):
    used = set()
    for node in ast.walk(tree):
        if isinstance(node, ast.Name):
            used.add(node.id)
        elif isinstance(node, ast.Attribute):
            # a.b.c -> record the root name "a"
            obj = node
            while isinstance(obj, ast.Attribute):
                obj = obj.value
            if isinstance(obj, ast.Name):
                used.add(obj.id)
    # names referenced in __all__ strings and docstring-level usage
    for node in ast.walk(tree):
        if isinstance(node, ast.Constant) and isinstance(node.value, str):
            used.add(node.value)
    return used


def unused_imports(path: Path, tree: ast.AST, lines):
    findings = []
    used = _used_names(tree)
    # only flag module-level imports; function-local ones are often
    # deliberate lazy imports keeping jax off the import path
    for node in tree.body:
        if isinstance(node, ast.Import):
            for a in node.names:
                name = (a.asname or a.name).split(".")[0]
                if name not in used:
                    findings.append((node.lineno, f"F401 unused import "
                                                  f"'{a.name}'"))
        elif isinstance(node, ast.ImportFrom):
            if node.module == "__future__":
                continue
            for a in node.names:
                if a.name == "*":
                    continue
                name = a.asname or a.name
                if name not in used:
                    findings.append((node.lineno,
                                     f"F401 unused import '{a.name}'"))
    return [(ln, msg) for ln, msg in findings
            if "noqa" not in lines[ln - 1]]


def check_file(path: Path, fix: bool):
    findings = []
    raw = path.read_bytes()
    text = raw.decode("utf-8", errors="replace")
    changed = False
    if b"\r\n" in raw:
        if fix:
            text = text.replace("\r\n", "\n")
            changed = True
        else:
            findings.append((0, "CRLF line endings"))
    lines = text.split("\n")
    is_py = path.suffix == ".py"
    for i, line in enumerate(lines, 1):
        if "noqa" in line:
            continue
        if CONFLICT.match(line):
            findings.append((i, "merge-conflict marker"))
        if line.rstrip() != line:
            if fix:
                lines[i - 1] = line.rstrip()
                changed = True
            else:
                findings.append((i, "trailing whitespace"))
        if is_py:
            stripped = line.lstrip()
            if "\t" in line[:len(line) - len(stripped)]:
                findings.append((i, "tab in indentation"))
            if DEBUGGER.search(line) and not stripped.startswith("#"):
                findings.append((i, "leftover debugger call"))
            if len(line) > MAX_LINE and "http" not in line:
                findings.append((i, f"line too long ({len(line)})"))
    if text and not text.endswith("\n"):
        if fix:
            lines.append("")
            changed = True
        else:
            findings.append((len(lines), "no newline at end of file"))
    if changed:
        path.write_text("\n".join(lines), encoding="utf-8")
    if is_py:
        try:
            tree = ast.parse(text, filename=str(path))
        except SyntaxError as e:
            findings.append((e.lineno or 0, f"syntax error: {e.msg}"))
        else:
            findings.extend(unused_imports(path, tree, lines + [""]))
    return findings


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("paths", nargs="*", default=["."])
    parser.add_argument("--fix", action="store_true",
                        help="rewrite whitespace findings in place")
    args = parser.parse_args(argv)

    total = 0
    for root in args.paths:
        root = Path(root)
        targets = [root] if root.is_file() else list(iter_text(root))
        for p in targets:
            for lineno, msg in check_file(p, args.fix):
                print(f"{p}:{lineno}: {msg}")
                total += 1
    if total:
        print(f"{total} finding(s)")
    return 1 if total else 0


if __name__ == "__main__":
    sys.exit(main())
