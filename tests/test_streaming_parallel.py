"""Direct tests for StreamingPlugin._compute_parallel (VERDICT r1 item 6):
ordered yield, fail-fast cancellation, pickle-probe thread fallback,
stateful-forces-serial, and batch boundaries.

Reference analog: the batched ordered parallel executor
(waveform_analysis/core/plugins/core/streaming.py:740-880) and its tests.
"""

import threading
import time

import numpy as np
import pytest

from waveformanalysis_tpu.dtypes.table import Table
from waveformanalysis_tpu.plugins.streaming import StreamingConfig, StreamingPlugin
from waveformanalysis_tpu.testing.fixtures import make_tiny_context


def _timed_table(times):
    times = np.asarray(times, dtype=np.int64)
    return Table({
        "time": times,
        "value": times.astype(np.float64) / 1000.0,
    })


class SlowSquare(StreamingPlugin):
    """Squares values; first chunks sleep longer, so unordered executors
    would yield out of order."""

    provides = "slow_square_stream"
    depends_on = ["source_data"]
    save_when = "never"

    def compute_chunk(self, context, run_id, chunk):
        idx = int(chunk.metadata.get("chunk_index", 0) or 0)
        time.sleep(0.05 if idx == 0 else 0.001)
        return Table({
            "time": np.asarray(chunk.data["time"]),
            "value": np.asarray(chunk.data["value"]) ** 2,
        })


class BoomOnThird(StreamingPlugin):
    provides = "boom3_stream"
    depends_on = ["source_data"]
    save_when = "never"
    computed = None  # set per-test

    def compute_chunk(self, context, run_id, chunk):
        with BoomOnThird.lock:
            BoomOnThird.computed.append(np.asarray(chunk.data["time"])[0])
        if np.asarray(chunk.data["time"])[0] >= 3000:
            raise RuntimeError("boom on third chunk")
        return chunk.data


BoomOnThird.lock = threading.Lock()


class StatefulCounter(StreamingPlugin):
    provides = "stateful_stream"
    depends_on = ["source_data"]
    save_when = "never"
    is_stateful = True

    def __init__(self):
        self.count = 0
        self.resets = 0

    def reset_state(self):
        self.resets += 1
        self.count = 0

    def compute_chunk(self, context, run_id, chunk):
        self.count += len(chunk)
        return Table({
            "time": np.asarray(chunk.data["time"]),
            "value": np.full(len(chunk), self.count, dtype=np.float64),
        })


class Unpicklable(StreamingPlugin):
    provides = "unpicklable_stream"
    depends_on = ["source_data"]
    save_when = "never"

    def __init__(self):
        self.lock = threading.Lock()  # makes the instance unpicklable

    def compute_chunk(self, context, run_id, chunk):
        return chunk.data


@pytest.fixture
def pctx(tmp_path):
    ctx = make_tiny_context(tmp_path)
    times = (np.arange(40, dtype=np.int64) + 1) * 1000
    ctx.inject_data("test_run", "source_data", _timed_table(times))
    return ctx


class TestParallelOrdering:
    def test_ordered_yield_despite_slow_first_chunk(self, pctx):
        pctx.register(SlowSquare())
        pctx.set_config({"slow_square_stream": {"streaming_config": {
            "chunk_size": 5, "parallel": True, "executor_type": "thread",
            "max_workers": 4,
        }}})
        chunks = list(pctx.get_data("test_run", "slow_square_stream"))
        assert len(chunks) == 8
        times = np.concatenate([np.asarray(c.data["time"]) for c in chunks])
        np.testing.assert_array_equal(times, np.sort(times))
        vals = np.concatenate([np.asarray(c.data["value"]) for c in chunks])
        np.testing.assert_allclose(vals, (times / 1000.0) ** 2)

    def test_parallel_equals_serial(self, pctx):
        pctx.register(SlowSquare())
        base = {"chunk_size": 7}
        pctx.set_config({"slow_square_stream": {"streaming_config": dict(
            base, parallel=True, executor_type="thread", max_workers=3,
        )}})
        par = [np.asarray(c.data["value"])
               for c in pctx.get_data("test_run", "slow_square_stream")]
        pctx.set_config({"slow_square_stream": {"streaming_config": dict(
            base, parallel=False,
        )}})
        ser = [np.asarray(c.data["value"])
               for c in pctx.get_data("test_run", "slow_square_stream")]
        np.testing.assert_array_equal(np.concatenate(par), np.concatenate(ser))

    @pytest.mark.parametrize("batch_size", [1, 2, 100])
    def test_batch_size_boundaries(self, pctx, batch_size):
        pctx.register(SlowSquare())
        pctx.set_config({"slow_square_stream": {"streaming_config": {
            "chunk_size": 5, "parallel": True, "executor_type": "thread",
            "max_workers": 2, "parallel_batch_size": batch_size,
        }}})
        chunks = list(pctx.get_data("test_run", "slow_square_stream"))
        total = sum(len(c) for c in chunks)
        assert total == 40


class TestFailFast:
    def test_exception_propagates(self, pctx):
        BoomOnThird.computed = []
        pctx.register(BoomOnThird())
        pctx.set_config({"boom3_stream": {"streaming_config": {
            "chunk_size": 1, "parallel": True, "executor_type": "thread",
            "max_workers": 2, "parallel_batch_size": 4,
        }}})
        with pytest.raises(RuntimeError, match="boom on third"):
            list(pctx.get_data("test_run", "boom3_stream"))

    def test_failure_does_not_drain_all_batches(self, pctx):
        # batch granularity fail-fast: later batches never submit
        BoomOnThird.computed = []
        pctx.register(BoomOnThird())
        pctx.set_config({"boom3_stream": {"streaming_config": {
            "chunk_size": 1, "parallel": True, "executor_type": "thread",
            "max_workers": 2, "parallel_batch_size": 4,
        }}})
        with pytest.raises(RuntimeError):
            list(pctx.get_data("test_run", "boom3_stream"))
        # 40 chunks total; the failing chunk is in the first batch of 4 —
        # nothing beyond the first batch may have started
        assert len(BoomOnThird.computed) <= 4


class TestFallbacks:
    def test_unpicklable_process_falls_back_to_thread(self, pctx, caplog):
        import logging

        pctx.register(Unpicklable())
        pctx.set_config({"unpicklable_stream": {"streaming_config": {
            "chunk_size": 10, "parallel": True, "executor_type": "process",
            "max_workers": 2,
        }}})
        with caplog.at_level(logging.WARNING):
            chunks = list(pctx.get_data("test_run", "unpicklable_stream"))
        assert sum(len(c) for c in chunks) == 40
        assert any("not picklable" in r.message for r in caplog.records)

    def test_stateful_forces_serial_and_resets_on_breaks(self, tmp_path, caplog):
        import logging

        ctx = make_tiny_context(tmp_path)
        # two segments separated by a >break_threshold gap
        t1 = (np.arange(10, dtype=np.int64) + 1) * 1000
        t2 = t1 + 10**14
        ctx.inject_data("test_run", "source_data",
                        _timed_table(np.concatenate([t1, t2])))
        plugin = StatefulCounter()
        ctx.register(plugin)
        ctx.set_config({"stateful_stream": {"streaming_config": {
            "chunk_size": 4, "parallel": True,  # must be ignored
            "break_threshold_ps": 1e9,
        }}})
        with caplog.at_level(logging.WARNING):
            chunks = list(ctx.get_data("test_run", "stateful_stream"))
        assert any("stateful" in r.message for r in caplog.records)
        assert plugin.resets >= 1  # reset at the segment break
        assert sum(len(c) for c in chunks) == 20
