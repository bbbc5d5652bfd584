"""Every committed script must at least parse and have a main guard —
the round-2 review found scripts/profile_breakdown.py crashing against a
drifted kernel API; this is the cheap tripwire (full runs are manual, on
hardware)."""
import ast
import pathlib

SCRIPTS = pathlib.Path(__file__).resolve().parent.parent / "scripts"


def test_scripts_parse_and_have_main_guard():
    assert SCRIPTS.is_dir()
    checked = 0
    for f in sorted(SCRIPTS.glob("*.py")):
        src = f.read_text()
        tree = ast.parse(src, filename=str(f))   # raises on syntax error
        assert "__main__" in src, f"{f.name} has no main guard"
        assert tree.body, f.name
        checked += 1
    assert checked >= 10
