"""Failure handling: ErrorManager records, severity branching, hooks.

Behavioral analog of the reference failure-detection layer
(reference: core/foundation/error.py:23-147, exceptions.py:12-70,
context_execution.py:150-183): errors record with plugin/config/input
snapshots, RECOVERABLE severity logs instead of aborting upstream state,
on_error and cleanup hooks always run.
"""

import numpy as np
import pytest

from waveformanalysis_tpu.context.context import Context
from waveformanalysis_tpu.foundation.error import ErrorManager
from waveformanalysis_tpu.foundation.exceptions import (
    ErrorSeverity,
    PluginError,
)
from waveformanalysis_tpu.plugins.base import Option, Plugin


class TestErrorManager:
    def test_record_and_summary(self):
        em = ErrorManager()
        try:
            raise ValueError("boom")
        except ValueError as e:
            em.record(e, plugin_name="p1", run_id="r1")
        recs = em.records
        assert len(recs) == 1
        assert recs[0].plugin_name == "p1"
        assert "boom" in recs[0].message
        assert "p1" in em.summary()

    def test_bounded_history(self):
        em = ErrorManager(max_records=3)
        for i in range(10):
            em.record(RuntimeError(f"e{i}"), plugin_name="p", run_id="r")
        recs = em.records
        assert len(recs) == 3
        assert recs[-1].message == "e9"

    def test_clear(self):
        em = ErrorManager()
        em.record(RuntimeError("x"), plugin_name="p", run_id="r")
        em.clear()
        assert em.records == []

    def test_collect_context_snapshots_config(self, tmp_path):
        class P(Plugin):
            provides = "ec_data"
            options = {"knob": Option(default=7, type=int)}

            def compute(self, context, run_id, **kwargs):
                return np.zeros(1, dtype=[("v", "i4")])

        ctx = Context(storage_dir=str(tmp_path),
                      config={"show_progress": False})
        plugin = P()
        ctx.register(plugin)
        snapshot = ctx.error_manager.collect_context(plugin=plugin, context=ctx)
        assert snapshot  # plugin identity + resolved config captured
        text = str(snapshot)
        assert "ec_data" in text or "P" in text


class TestSeverityBranching:
    def _ctx(self, tmp_path):
        return Context(storage_dir=str(tmp_path),
                       config={"show_progress": False})

    def test_fatal_error_propagates_and_records(self, tmp_path):
        class Fails(Plugin):
            provides = "fatal_data"

            def compute(self, context, run_id, **kwargs):
                raise PluginError("hard failure", plugin_name="fatal_data",
                                  severity=ErrorSeverity.FATAL)

        ctx = self._ctx(tmp_path)
        ctx.register(Fails())
        with pytest.raises(PluginError, match="hard failure"):
            ctx.get_data("r", "fatal_data")
        recs = ctx.error_manager.records
        assert recs and recs[-1].plugin_name == "fatal_data"

    def test_recoverable_error_still_raises_but_logs_warning(
        self, tmp_path, caplog
    ):
        import logging

        class Recov(Plugin):
            provides = "recov_data"

            def compute(self, context, run_id, **kwargs):
                raise PluginError("soft failure", plugin_name="recov_data",
                                  severity=ErrorSeverity.RECOVERABLE)

        ctx = self._ctx(tmp_path)
        ctx.register(Recov())
        with caplog.at_level(logging.WARNING):
            with pytest.raises(PluginError):
                ctx.get_data("r", "recov_data")
        assert any("Recoverable" in r.message for r in caplog.records)

    def test_on_error_and_cleanup_hooks_always_run(self, tmp_path):
        events = []

        class Hooked(Plugin):
            provides = "hooked_data"

            def compute(self, context, run_id, **kwargs):
                raise RuntimeError("die")

            def on_error(self, context, exc):
                events.append(("on_error", str(exc)))

            def cleanup(self, context):
                events.append(("cleanup", None))

        ctx = self._ctx(tmp_path)
        ctx.register(Hooked())
        with pytest.raises(RuntimeError):
            ctx.get_data("r", "hooked_data")
        assert ("on_error", "die") in events
        assert ("cleanup", None) in events

    def test_cleanup_runs_on_success_too(self, tmp_path):
        events = []

        class Ok(Plugin):
            provides = "ok_data"
            save_when = "never"

            def compute(self, context, run_id, **kwargs):
                return np.zeros(2, dtype=[("v", "i4")])

            def cleanup(self, context):
                events.append("cleanup")

        ctx = self._ctx(tmp_path)
        ctx.register(Ok())
        ctx.get_data("r", "ok_data")
        assert events == ["cleanup"]

    def test_failing_on_error_hook_does_not_mask_original(self, tmp_path):
        class DoubleFail(Plugin):
            provides = "dbl_data"

            def compute(self, context, run_id, **kwargs):
                raise ValueError("original")

            def on_error(self, context, exc):
                raise RuntimeError("hook broke")

        ctx = self._ctx(tmp_path)
        ctx.register(DoubleFail())
        with pytest.raises(ValueError, match="original"):
            ctx.get_data("r", "dbl_data")

    def test_upstream_results_survive_downstream_failure(self, tmp_path):
        """A failing consumer must not poison its cached producer — the
        re-run resumes from the producer's cache (checkpoint semantics)."""
        calls = {"up": 0}

        class Up(Plugin):
            provides = "up_data"
            save_when = "always"

            def compute(self, context, run_id, **kwargs):
                calls["up"] += 1
                return np.zeros(3, dtype=[("v", "i4")])

        class Down(Plugin):
            provides = "down_data"
            depends_on = ["up_data"]
            attempts = 0

            def compute(self, context, run_id, **kwargs):
                Down.attempts += 1
                if Down.attempts == 1:
                    raise RuntimeError("first attempt dies")
                up = context.get_data(run_id, "up_data")
                return np.asarray(up).copy()

        ctx = self._ctx(tmp_path)
        ctx.register(Up(), Down())
        with pytest.raises(RuntimeError):
            ctx.get_data("r", "down_data")
        out = ctx.get_data("r", "down_data")
        assert len(out) == 3
        assert calls["up"] == 1  # producer computed once, resumed from cache

    def test_error_records_expose_run_and_plugin(self, tmp_path):
        class Fails(Plugin):
            provides = "meta_fail"

            def compute(self, context, run_id, **kwargs):
                raise RuntimeError("meta")

        ctx = self._ctx(tmp_path)
        ctx.register(Fails())
        with pytest.raises(RuntimeError):
            ctx.get_data("run_42", "meta_fail")
        rec = ctx.error_manager.records[-1]
        assert rec.run_id == "run_42"
        assert rec.to_dict()["plugin_name"] == "meta_fail"
