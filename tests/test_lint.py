"""CI gate on the offline linter (reference ships flake8+pre-commit;
this image has neither, so tools/lint.py implements the enforced
subset — syntax, unused module-level imports, whitespace hygiene,
debugger leftovers, line length)."""
import pathlib
import subprocess
import sys

REPO = pathlib.Path(__file__).resolve().parents[1]


def test_tree_is_lint_clean():
    proc = subprocess.run(
        [sys.executable, str(REPO / "tools" / "lint.py"), str(REPO)],
        capture_output=True, text=True)
    assert proc.returncode == 0, "lint findings:\n" + proc.stdout
