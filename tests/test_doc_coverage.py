"""Doc-coverage checker: page coverage grading + spec-quality findings
(reference analog: utils/doc_coverage.py DocCoverageChecker + CI gate)."""

from pathlib import Path

from waveformanalysis_tpu.context.context import Context
from waveformanalysis_tpu.plugins.base import Option, Plugin
from waveformanalysis_tpu.utils.doc_coverage import (
    SEV_ERROR,
    SEV_WARNING,
    DocCoverageChecker,
)
from waveformanalysis_tpu.utils.plugin_doc_generator import PluginDocGenerator


class GoodPlugin(Plugin):
    provides = "good_data"
    depends_on = []
    description = "A fully described plugin."
    version = "1.0.0"
    save_when = "never"
    output_dtype = [("x", "f4")]
    options = {"knob": Option(default=1, type=int, help="a knob")}

    def compute(self, context, run_id, **kwargs):  # pragma: no cover
        return None


class SparsePlugin(Plugin):
    provides = "sparse_data"
    depends_on = []
    version = "0.0.0"  # placeholder
    save_when = "never"
    options = {"mystery": Option(default=None)}  # no help text

    def compute(self, context, run_id, **kwargs):  # pragma: no cover
        return None


SparsePlugin.__doc__ = None


def _ctx(tmp_path):
    ctx = Context(storage_dir=str(tmp_path / "s"),
                  config={"show_progress": False})
    ctx.register(GoodPlugin(), SparsePlugin())
    return ctx


def test_missing_and_stale_pages_are_errors(tmp_path):
    ctx = _ctx(tmp_path)
    docs = tmp_path / "docs"
    docs.mkdir()
    checker = DocCoverageChecker(ctx, docs)
    report = checker.check()
    assert report.total_plugins == 2 and report.pages_ok == 0
    assert report.coverage_percent == 0.0
    assert not report.passed
    assert {i.data_name for i in report.errors} == {"good_data", "sparse_data"}

    # generate pages -> coverage recovers; then a stale page fails again
    PluginDocGenerator(ctx).generate_all(docs)
    report = checker.check()
    assert report.pages_ok == 2 and report.coverage_percent == 100.0
    assert report.passed

    (docs / "good_data.md").write_text("outdated")
    report = checker.check()
    assert any(
        i.severity == SEV_ERROR and "stale" in i.message
        for i in report.issues
    )


def test_spec_quality_warnings_and_gate(tmp_path):
    ctx = _ctx(tmp_path)
    docs = tmp_path / "docs"
    PluginDocGenerator(ctx).generate_all(docs)
    report = DocCoverageChecker(ctx, docs).check()
    warn_msgs = [i.message for i in report.warnings
                 if i.data_name == "sparse_data"]
    assert any("description" in m for m in warn_msgs)
    assert any("version" in m for m in warn_msgs)
    assert any("mystery" in m for m in warn_msgs)
    assert any("output_dtype" in m for m in warn_msgs)
    # good plugin contributes no warnings
    assert not [i for i in report.warnings if i.data_name == "good_data"]
    # gates: clean pages pass; strict fails on the warnings
    assert report.gate(min_coverage=100.0)
    assert not report.gate(strict=True)
    assert not report.gate(min_coverage=101.0)
    # formatting mentions both severities
    text = report.format()
    assert "warning" in text and "pages current" in text


def test_cli_coverage_command(tmp_path, capsys):
    """waveform-docs coverage wires the checker (synthetic profile ctx is
    exercised by the CI job; here we call the checker path directly)."""
    ctx = _ctx(tmp_path)
    docs = tmp_path / "docs"
    PluginDocGenerator(ctx).generate_all(docs)
    report = DocCoverageChecker(ctx, docs).check(require_spec_quality=False)
    assert report.passed and not report.issues
