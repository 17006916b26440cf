"""Offline API-reference generator (markdown).

The reference ships a Sphinx tree + readthedocs config
(/root/reference/docs/Makefile, docs/src/); this image has no sphinx,
so this tool fills the same role with a zero-dependency AST walk: it
parses every module under ``parakeet_tpu/`` (no imports — JAX startup
and the axon backend stay out of the doc build), extracts module /
class / function docstrings and signatures, and writes one markdown
page per top-level subpackage into ``docs/api/``.

Deterministic output (sorted walks, no timestamps), so the generated
tree is checked in and ``tests/test_api_docs.py`` gates drift: if a
public signature or docstring changes, regenerate with

    python tools/gen_api_docs.py
"""
import argparse
import ast
import pathlib
import sys

REPO = pathlib.Path(__file__).resolve().parents[1]
PACKAGE = "parakeet_tpu"


def _is_public(name: str) -> bool:
    return not name.startswith("_")


def _signature(node: ast.AST) -> str:
    """Render a def's signature from its AST (defaults elided to '...'
    when they are not simple literals, keeping output stable)."""
    args = node.args
    parts = []

    def fmt(a, default):
        s = a.arg
        if a.annotation is not None:
            s += ": " + ast.unparse(a.annotation)
        if default is not None:
            try:
                d = ast.unparse(default)
            except Exception:
                d = "..."
            if len(d) > 40:
                d = "..."
            s += "=" + d
        return s

    pos = args.posonlyargs + args.args
    defaults = [None] * (len(pos) - len(args.defaults)) + list(args.defaults)
    for a, d in zip(pos, defaults):
        parts.append(fmt(a, d))
        if args.posonlyargs and a is args.posonlyargs[-1]:
            parts.append("/")
    if args.vararg:
        parts.append("*" + args.vararg.arg)
    elif args.kwonlyargs:
        parts.append("*")
    for a, d in zip(args.kwonlyargs, args.kw_defaults):
        parts.append(fmt(a, d))
    if args.kwarg:
        parts.append("**" + args.kwarg.arg)
    sig = "(" + ", ".join(parts) + ")"
    if getattr(node, "returns", None) is not None:
        sig += " -> " + ast.unparse(node.returns)
    return sig


def _doc(node) -> str:
    d = ast.get_docstring(node)
    return d.strip() if d else ""


def _first_para(doc: str) -> str:
    return doc.split("\n\n")[0].strip() if doc else ""


def _dataclass_like_fields(cls: ast.ClassDef):
    """Annotated class-level assignments (flax.linen module hyperparams
    are declared this way); returned as (name, annotation, default)."""
    out = []
    for stmt in cls.body:
        if isinstance(stmt, ast.AnnAssign) and isinstance(stmt.target, ast.Name):
            name = stmt.target.id
            if not _is_public(name):
                continue
            ann = ast.unparse(stmt.annotation)
            default = ast.unparse(stmt.value) if stmt.value is not None else ""
            if len(default) > 48:
                default = "..."
            out.append((name, ann, default))
    return out


def _render_function(fn, level: str, lines: list, qualprefix: str = ""):
    deco = {ast.unparse(d).split("(")[0] for d in fn.decorator_list}
    tag = ""
    if "staticmethod" in deco:
        tag = " *(static)*"
    elif "classmethod" in deco:
        tag = " *(classmethod)*"
    elif "property" in deco:
        tag = " *(property)*"
    lines.append(f"{level} `{qualprefix}{fn.name}{_signature(fn)}`{tag}")
    lines.append("")
    doc = _doc(fn)
    if doc:
        lines.append(doc)
        lines.append("")


def _render_module(path: pathlib.Path, tree: ast.Module, lines: list):
    rel = path.relative_to(REPO)
    modname = str(rel.with_suffix("")).replace("/", ".")
    if modname.endswith(".__init__"):
        modname = modname[: -len(".__init__")]
    lines.append(f"## `{modname}`")
    lines.append("")
    lines.append(f"Source: `{rel}`")
    lines.append("")
    doc = _doc(tree)
    if doc:
        lines.append(doc)
        lines.append("")

    for node in tree.body:
        if isinstance(node, ast.ClassDef) and _is_public(node.name):
            bases = ", ".join(ast.unparse(b) for b in node.bases)
            head = f"### class `{node.name}`"
            if bases:
                head += f" ({bases})"
            lines.append(head)
            lines.append("")
            cdoc = _doc(node)
            if cdoc:
                lines.append(cdoc)
                lines.append("")
            fields = _dataclass_like_fields(node)
            if fields:
                lines.append("| attribute | type | default |")
                lines.append("|---|---|---|")
                for name, ann, default in fields:
                    dd = f"`{default}`" if default else ""
                    lines.append(f"| `{name}` | `{ann}` | {dd} |")
                lines.append("")
            for sub in node.body:
                if isinstance(sub, (ast.FunctionDef, ast.AsyncFunctionDef)):
                    if _is_public(sub.name) or sub.name == "__call__":
                        _render_function(sub, "####", lines,
                                         qualprefix=node.name + ".")
        elif isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)):
            if _is_public(node.name):
                _render_function(node, "### ", lines)


def _module_sort_key(path: pathlib.Path):
    # __init__.py first within a directory, then alphabetical.
    return (path.parent, path.name != "__init__.py", path.name)


def generate(out_dir: pathlib.Path) -> dict:
    pkg = REPO / PACKAGE
    groups = {}
    for path in sorted(pkg.rglob("*.py"), key=_module_sort_key):
        rel = path.relative_to(pkg)
        if any(p.startswith("_") and p != "__init__.py" for p in rel.parts):
            continue
        top = rel.parts[0] if len(rel.parts) > 1 else "core"
        top = top[:-3] if top.endswith(".py") else top
        groups.setdefault(top, []).append(path)

    out_dir.mkdir(parents=True, exist_ok=True)
    pages = {}
    for top in sorted(groups):
        lines = [f"# API reference — `{PACKAGE}.{top}`"
                 if top != "core" else f"# API reference — `{PACKAGE}` (top level)",
                 "", "_Generated by `tools/gen_api_docs.py`; do not edit by hand._",
                 ""]
        for path in groups[top]:
            try:
                tree = ast.parse(path.read_text())
            except SyntaxError as e:  # pragma: no cover
                print(f"SKIP (syntax error): {path}: {e}", file=sys.stderr)
                continue
            _render_module(path, tree, lines)
        pages[top] = "\n".join(lines).rstrip() + "\n"

    index = ["# `parakeet_tpu` API reference", "",
             "_Generated by `tools/gen_api_docs.py`; regenerate after any",
             "public-surface change (CI gate: `tests/test_api_docs.py`)._", "",
             "| page | modules |", "|---|---|"]
    for top in sorted(groups):
        n = len(groups[top])
        label = f"`{PACKAGE}.{top}`" if top != "core" else "top-level modules"
        index.append(f"| [{top}]({top}.md) | {label} ({n} files) |")
    pages["index"] = "\n".join(index) + "\n"

    for name, text in pages.items():
        (out_dir / f"{name}.md").write_text(text)
    return pages


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--out", default=str(REPO / "docs" / "api"))
    args = ap.parse_args()
    pages = generate(pathlib.Path(args.out))
    total = sum(p.count("\n") for p in pages.values())
    print(f"wrote {len(pages)} pages, {total} lines -> {args.out}")


if __name__ == "__main__":
    main()
