"""Drift gate for the generated API reference (docs/api).

The reference ships a Sphinx/readthedocs API build; this repo's
equivalent is the AST-based markdown generator (tools/gen_api_docs.py,
no imports, so this test is cheap).  If a public signature or
docstring changes, run `python tools/gen_api_docs.py` and commit the
regenerated pages.
"""
import pathlib
import sys

REPO = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO / "tools"))


def test_api_docs_in_sync(tmp_path):
    import gen_api_docs
    pages = gen_api_docs.generate(tmp_path)
    checked = 0
    for name, text in pages.items():
        committed = REPO / "docs" / "api" / f"{name}.md"
        assert committed.exists(), (
            f"docs/api/{name}.md missing — run tools/gen_api_docs.py")
        assert committed.read_text() == text, (
            f"docs/api/{name}.md is stale — run tools/gen_api_docs.py")
        checked += 1
    assert checked >= 10  # all subpackages present


def test_api_docs_no_extra_pages(tmp_path):
    # Committed pages must all be produced by the generator (no orphans).
    import gen_api_docs
    pages = gen_api_docs.generate(tmp_path)
    committed = {p.name for p in (REPO / "docs" / "api").glob("*.md")}
    produced = {f"{n}.md" for n in pages}
    assert committed == produced, (
        f"orphan pages: {committed - produced}; missing: {produced - committed}")
