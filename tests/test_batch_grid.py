"""Batch processor depth: config grids, storage strategies, retries,
polling mode, process_func (reference analog: batch_processor.py:197-1068
and tests/test_batch_processor_*).
"""

import threading
import time

import numpy as np
import pytest

from waveformanalysis_tpu.data.batch_processor import BatchProcessor
from waveformanalysis_tpu.dtypes.table import Table
from waveformanalysis_tpu.plugins.base import Option, Plugin
from waveformanalysis_tpu.testing.fixtures import make_tiny_context


class ScaledPlugin(Plugin):
    provides = "scaled"
    depends_on = []
    save_when = "never"
    options = {"factor": Option(default=1.0, type=float)}

    def compute(self, context, run_id, **kwargs):
        f = context.get_config(self, "factor")
        return Table({"x": np.arange(4) * f})


class FlakyPlugin(Plugin):
    provides = "flaky"
    depends_on = []
    save_when = "never"
    attempts = {}
    lock = threading.Lock()

    def compute(self, context, run_id, **kwargs):
        with FlakyPlugin.lock:
            n = FlakyPlugin.attempts.get(run_id, 0) + 1
            FlakyPlugin.attempts[run_id] = n
        if run_id == "bad" and n < 3:
            raise RuntimeError(f"transient failure #{n}")
        return Table({"x": np.arange(2)})


class TestConfigGrid:
    def test_grid_sweep_results(self, tmp_path):
        ctx = make_tiny_context(tmp_path)
        ctx.register(ScaledPlugin())
        bp = BatchProcessor(ctx, executor_type="thread", max_workers=2)
        grid = [{"scaled": {"factor": f}} for f in (1.0, 2.0, 3.0)]
        result = bp.process_runs_with_config_grid(["rA", "rB"], "scaled", grid)
        assert len(result.succeeded) == 6
        # each (run, config) cell computed with its own factor
        sums = sorted(
            float(np.sum(np.asarray(result.get(k).data["x"])))
            for k in result.succeeded
        )
        # sum(0..3) = 6 -> factors 1,2,3 twice each
        assert sums == [6.0, 6.0, 12.0, 12.0, 18.0, 18.0]

    def test_grid_isolated_configs(self, tmp_path):
        # the sweep must not leak config between cells: base context config
        # is unchanged afterwards
        ctx = make_tiny_context(tmp_path)
        ctx.register(ScaledPlugin())
        before = ctx.get_config("scaled", "factor")
        bp = BatchProcessor(ctx, executor_type="thread", max_workers=1)
        bp.process_runs_with_config_grid(
            ["r1"], "scaled", [{"scaled": {"factor": 9.0}}]
        )
        assert ctx.get_config("scaled", "factor") == before


class TestRetries:
    def test_retries_recover_transient_failures(self, tmp_path):
        FlakyPlugin.attempts = {}
        ctx = make_tiny_context(tmp_path)
        ctx.register(FlakyPlugin())
        bp = BatchProcessor(ctx, executor_type="thread", max_workers=1,
                            retries=3, on_error="continue")
        result = bp.process_runs(["ok", "bad"], "flaky")
        assert len(result.succeeded) == 2
        assert FlakyPlugin.attempts["bad"] == 3
        assert result.get("bad").attempts == 3

    def test_on_error_continue_records_failures(self, tmp_path):
        FlakyPlugin.attempts = {}
        ctx = make_tiny_context(tmp_path)
        ctx.register(FlakyPlugin())
        bp = BatchProcessor(ctx, executor_type="thread", max_workers=1,
                            retries=0, on_error="continue")
        result = bp.process_runs(["ok", "bad", "ok2"], "flaky")
        assert len(result.succeeded) == 2
        assert result.failed == ["bad"]
        assert "transient" in result.get("bad").error

    def test_on_error_raise(self, tmp_path):
        FlakyPlugin.attempts = {}
        ctx = make_tiny_context(tmp_path)
        ctx.register(FlakyPlugin())
        bp = BatchProcessor(ctx, executor_type="thread", max_workers=1,
                            retries=0, on_error="raise")
        with pytest.raises(RuntimeError, match="transient"):
            bp.process_runs(["bad"], "flaky")


class TestPollingAndProgress:
    def test_polling_mode_reports_progress(self, tmp_path):
        ctx = make_tiny_context(tmp_path)
        ctx.register(ScaledPlugin())
        bp = BatchProcessor(ctx, executor_type="thread", max_workers=2)
        seen = []
        result = bp.process_runs(
            [f"r{i}" for i in range(5)], "scaled",
            poll_interval_s=0.01,
            on_progress=lambda done, total: seen.append((done, total)),
        )
        assert len(result.succeeded) == 5
        assert seen and seen[-1] == (5, 5)

    def test_process_func(self, tmp_path):
        ctx = make_tiny_context(tmp_path)
        ctx.register(ScaledPlugin())
        bp = BatchProcessor(ctx, executor_type="thread", max_workers=2)
        result = bp.process_func(
            ["a", "b", "c"], lambda ctx_, rid: rid * 2,
        )
        assert sorted(result.get(r).data for r in result.succeeded) == [
            "aa", "bb", "cc"
        ]
