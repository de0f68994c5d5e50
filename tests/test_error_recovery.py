"""Failure detection / recovery semantics (SURVEY §5; reference analog:
context_execution.py:150-183 severity branching + error.py:56-147 context
snapshots): PluginError severity, on_error/cleanup hook ordering, error
manager records, and stats integration on failure.
"""

import numpy as np
import pytest

from waveformanalysis_tpu.dtypes.table import Table
from waveformanalysis_tpu.foundation.exceptions import (
    ErrorSeverity,
    PluginError,
)
from waveformanalysis_tpu.plugins.base import Plugin
from waveformanalysis_tpu.testing.fixtures import make_tiny_context


class Hooked(Plugin):
    provides = "hooked"
    depends_on = []
    save_when = "never"
    fail_with = None  # set per test

    def __init__(self):
        self.events = []

    def compute(self, context, run_id, **kwargs):
        self.events.append("compute")
        if self.fail_with is not None:
            raise self.fail_with
        return Table({"x": np.arange(2)})

    def on_error(self, context, exc):
        self.events.append(f"on_error:{type(exc).__name__}")

    def cleanup(self, context):
        self.events.append("cleanup")


class TestSeverityBranching:
    def test_success_runs_cleanup_not_on_error(self, tmp_path):
        ctx = make_tiny_context(tmp_path)
        p = Hooked()
        p.fail_with = None
        ctx.register(p)
        ctx.get_data("test_run", "hooked")
        assert p.events == ["compute", "cleanup"]

    def test_fatal_error_propagates_with_hooks(self, tmp_path):
        ctx = make_tiny_context(tmp_path)
        p = Hooked()
        p.fail_with = PluginError("boom", severity=ErrorSeverity.FATAL)
        ctx.register(p)
        with pytest.raises(PluginError, match="boom"):
            ctx.get_data("test_run", "hooked")
        assert p.events == ["compute", "on_error:PluginError", "cleanup"]

    def test_recoverable_error_still_raises_but_logs(self, tmp_path, caplog):
        import logging

        ctx = make_tiny_context(tmp_path)
        p = Hooked()
        p.fail_with = PluginError(
            "soft", severity=ErrorSeverity.RECOVERABLE,
        )
        ctx.register(p)
        with caplog.at_level(logging.WARNING):
            with pytest.raises(PluginError):
                ctx.get_data("test_run", "hooked")
        assert any("Recoverable" in r.message for r in caplog.records)

    def test_on_error_hook_failure_does_not_mask(self, tmp_path):
        class BadHook(Hooked):
            provides = "badhook"

            def on_error(self, context, exc):
                raise RuntimeError("hook exploded")

        ctx = make_tiny_context(tmp_path)
        p = BadHook()
        p.fail_with = ValueError("original")
        ctx.register(p)
        with pytest.raises(ValueError, match="original"):
            ctx.get_data("test_run", "badhook")


class TestErrorManager:
    def test_error_recorded_with_context_snapshot(self, tmp_path):
        ctx = make_tiny_context(tmp_path)
        p = Hooked()
        p.fail_with = ValueError("snap")
        ctx.register(p)
        with pytest.raises(ValueError):
            ctx.get_data("test_run", "hooked")
        summary = ctx.error_manager.summary()
        assert "hooked" in summary and "snap" in summary

    def test_multiple_errors_accumulate(self, tmp_path):
        ctx = make_tiny_context(tmp_path)
        p = Hooked()
        ctx.register(p)
        for i in range(3):
            p.fail_with = ValueError(f"e{i}")
            with pytest.raises(ValueError):
                ctx.get_data("test_run", "hooked")
        summary = ctx.error_manager.summary()
        assert all(f"e{i}" in summary for i in range(3))

    def test_stats_mark_failure(self, tmp_path):
        ctx = make_tiny_context(tmp_path)
        ctx.stats.mode = "basic"
        p = Hooked()
        p.fail_with = ValueError("statfail")
        ctx.register(p)
        with pytest.raises(ValueError):
            ctx.get_data("test_run", "hooked")
        recs = ctx.stats.get_records("hooked")
        assert recs and recs[0].success is False
        assert "statfail" in (recs[0].error or "")


class TestFailureIsolation:
    def test_failed_plugin_not_cached(self, tmp_path):
        ctx = make_tiny_context(tmp_path)
        p = Hooked()
        p.fail_with = ValueError("fail once")
        ctx.register(p)
        with pytest.raises(ValueError):
            ctx.get_data("test_run", "hooked")
        # recovery: fix the failure mode and recompute (no poisoned cache)
        p.fail_with = None
        out = ctx.get_data("test_run", "hooked")
        assert len(out) == 2

    def test_failure_in_mid_dag_stops_downstream(self, tmp_path):
        class Down(Plugin):
            provides = "down"
            depends_on = ["hooked"]
            save_when = "never"
            ran = False

            def compute(self, context, run_id, **kwargs):
                data = context.get_data(run_id, "hooked")
                Down.ran = True
                return data

        Down.ran = False
        ctx = make_tiny_context(tmp_path)
        p = Hooked()
        p.fail_with = ValueError("upstream dead")
        ctx.register(p, Down())
        with pytest.raises(ValueError, match="upstream dead"):
            ctx.get_data("test_run", "down")
        assert Down.ran is False

    def test_reentrancy_guard_reports_cycle(self, tmp_path):
        class Sneaky(Plugin):
            provides = "sneaky"
            depends_on = []
            save_when = "never"

            def compute(self, context, run_id, **kwargs):
                # runtime circular dependency: computes itself
                return context.get_data(run_id, "sneaky")

        ctx = make_tiny_context(tmp_path)
        ctx.register(Sneaky())
        with pytest.raises(Exception, match="[Cc]ircular"):
            ctx.get_data("test_run", "sneaky")
