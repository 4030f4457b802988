"""Execution receipts for the runnable examples (VERDICT r4 item 6).

Every ``examples/*.py`` is RUN in a subprocess at a smoke budget
(``VIABEL_EXAMPLES_SCALE``, see examples/_smoke.py) — the counterpart of
the notebooks' ``make notebooks`` receipts; parsing alone (tools/lint.py)
lets examples rot silently.  A seeded-breakage test proves the gate
actually fails on a broken script.
"""

import os
import subprocess
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

from run_examples import REPO, run_examples  # noqa: E402

EXAMPLES = sorted(
    f for f in os.listdir(os.path.join(REPO, "examples"))
    if f.endswith(".py") and not f.startswith("_"))


def test_examples_discovered():
    """The gate sees the whole directory (7 scripts at round 5; a new
    example auto-joins via the directory listing)."""
    assert len(EXAMPLES) >= 7


@pytest.mark.slow
@pytest.mark.parametrize("script", EXAMPLES)
def test_example_executes(script):
    path = os.path.join(REPO, "examples", script)
    (_, code, _), = run_examples([path], scale="0.02", timeout=900)
    assert code == 0, f"{script} failed at the smoke budget (see output)"


def test_seeded_breakage_fails_the_gate(tmp_path):
    """A broken example must produce a non-zero runner verdict."""
    bad = tmp_path / "broken_example.py"
    bad.write_text("import sys\nsys.exit('seeded breakage')\n")
    (_, code, _), = run_examples([str(bad)], scale="0.02", timeout=60)
    assert code != 0
    ok = tmp_path / "fine_example.py"
    ok.write_text("print('ok')\n")
    (_, code, _), = run_examples([str(ok)], scale="0.02", timeout=60)
    assert code == 0


def test_smoke_knob_validates():
    """The shared knob rejects nonsense scales instead of silently running
    the full budgets."""
    env = dict(os.environ, VIABEL_EXAMPLES_SCALE="7")
    proc = subprocess.run(
        [sys.executable, "-c",
         "import sys; sys.path.insert(0, 'examples'); import _smoke"],
        env=env, cwd=REPO, capture_output=True, text=True)
    assert proc.returncode != 0
    assert "VIABEL_EXAMPLES_SCALE" in proc.stderr
