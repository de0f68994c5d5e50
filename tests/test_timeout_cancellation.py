"""Timeout + cancellation integration (VERDICT r1 item 6).

Covers: per-plugin timeout through the Context execution path, the
TimeoutManager primitives, cooperative cancellation tokens aborting batch
runs mid-flight, SIGINT-token plumbing, and error-severity handling on
timeout. Reference analog: core/execution/timeout.py:31-210 +
core/cancellation.py:44-296 + the batch error-strategy tests.
"""

import threading
import time

import numpy as np
import pytest

from waveformanalysis_tpu.data.batch_processor import BatchProcessor
from waveformanalysis_tpu.dtypes.table import Table
from waveformanalysis_tpu.execution.cancellation import (
    CancellationManager,
    CancellationToken,
)
from waveformanalysis_tpu.execution.timeout import TimeoutManager, with_timeout
from waveformanalysis_tpu.foundation.exceptions import TimeoutError_
from waveformanalysis_tpu.plugins.base import Plugin
from waveformanalysis_tpu.testing.fixtures import make_tiny_context


class SleepyPlugin(Plugin):
    provides = "sleepy"
    depends_on = []
    save_when = "never"
    timeout = 0.2
    sleep_s = 10.0

    def compute(self, context, run_id, **kwargs):
        time.sleep(self.sleep_s)
        return Table({"x": np.arange(3)})


class QuickPlugin(SleepyPlugin):
    provides = "quick"
    sleep_s = 0.0
    timeout = 5.0


class TestPluginTimeout:
    def test_timeout_raises_through_context(self, tmp_path):
        ctx = make_tiny_context(tmp_path)
        ctx.register(SleepyPlugin())
        t0 = time.perf_counter()
        with pytest.raises(TimeoutError_, match="sleepy"):
            ctx.get_data("test_run", "sleepy")
        assert time.perf_counter() - t0 < 5.0  # did not wait for the sleep

    def test_fast_plugin_unaffected_by_timeout(self, tmp_path):
        ctx = make_tiny_context(tmp_path)
        ctx.register(QuickPlugin())
        out = ctx.get_data("test_run", "quick")
        assert len(out) == 3

    def test_timeout_records_error_and_stats(self, tmp_path):
        ctx = make_tiny_context(tmp_path)
        ctx.stats.mode = "basic"
        ctx.register(SleepyPlugin())
        with pytest.raises(TimeoutError_):
            ctx.get_data("test_run", "sleepy")
        assert "sleepy" in ctx.error_manager.summary()
        recs = ctx.stats.get_records("sleepy")
        assert recs and not recs[0].success


class TestTimeoutManager:
    def test_run_with_timeout_passthrough(self):
        tm = TimeoutManager()
        assert tm.run_with_timeout(lambda: 42, timeout_s=2.0) == 42

    def test_run_with_timeout_expires(self):
        tm = TimeoutManager()
        with pytest.raises(TimeoutError_):
            tm.run_with_timeout(lambda: time.sleep(5), timeout_s=0.1)

    def test_decorator(self):
        @with_timeout(0.1)
        def slow():
            time.sleep(5)

        with pytest.raises(TimeoutError_):
            slow()

    def test_exception_inside_fn_propagates(self):
        tm = TimeoutManager()
        with pytest.raises(ValueError, match="inner"):
            tm.run_with_timeout(
                lambda: (_ for _ in ()).throw(ValueError("inner")),
                timeout_s=1.0,
            )


class CountingPlugin(Plugin):
    provides = "counted"
    depends_on = []
    save_when = "never"
    computed_runs = []
    lock = threading.Lock()

    def compute(self, context, run_id, **kwargs):
        with CountingPlugin.lock:
            CountingPlugin.computed_runs.append(run_id)
        time.sleep(0.05)
        return Table({"x": np.arange(2)})


class TestBatchCancellation:
    def test_pre_cancelled_token_aborts_immediately(self, tmp_path):
        CountingPlugin.computed_runs = []
        ctx = make_tiny_context(tmp_path)
        ctx.register(CountingPlugin())
        bp = BatchProcessor(ctx, executor_type="thread", max_workers=2)
        token = CancellationToken("t")
        token.cancel()
        result = bp.process_runs([f"r{i}" for i in range(6)], "counted",
                                 cancellation_token=token)
        assert result.cancelled
        assert len(CountingPlugin.computed_runs) == 0

    def test_mid_flight_cancellation_stops_remaining(self, tmp_path):
        CountingPlugin.computed_runs = []
        ctx = make_tiny_context(tmp_path)
        ctx.register(CountingPlugin())
        bp = BatchProcessor(ctx, executor_type="thread", max_workers=1)
        token = CancellationToken("t")

        def cancel_soon():
            time.sleep(0.12)
            token.cancel()

        threading.Thread(target=cancel_soon, daemon=True).start()
        result = bp.process_runs([f"r{i}" for i in range(30)], "counted",
                                 cancellation_token=token)
        assert result.cancelled
        assert len(CountingPlugin.computed_runs) < 30

    def test_cancel_callback_fires(self):
        token = CancellationToken("cb")
        fired = []
        token.on_cancel(lambda: fired.append(1))
        token.cancel()
        assert fired == [1]
        assert token.cancelled

    def test_manager_cancel_all(self):
        mgr = CancellationManager()
        tokens = [mgr.create_token(f"t{i}") for i in range(3)]
        n = mgr.cancel_all()
        assert n == 3
        assert all(t.cancelled for t in tokens)

    def test_token_wait_unblocks_on_cancel(self):
        token = CancellationToken("w")
        threading.Timer(0.05, token.cancel).start()
        t0 = time.perf_counter()
        assert token.wait(timeout=5.0)
        assert time.perf_counter() - t0 < 2.0
