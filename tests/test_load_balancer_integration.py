"""Load-balancer integration: suggestions drive real pool execution.

Behavioral analog of the reference integration suite
(reference: tests/test_load_balancer_integration.py over
core/load_balancer.py:33-296 and the streaming engine's worker bucketing,
streaming.py:212-258): suggestions quantize to power-of-two buckets, react
to load thresholds, learn from task history, and compose with the
ExecutorManager and the streaming parallel path end-to-end.
"""

import time

import numpy as np
import pytest

from waveformanalysis_tpu.execution.load_balancer import (
    DynamicLoadBalancer,
    quantize_workers,
)
from waveformanalysis_tpu.execution.manager import (
    get_executor,
    parallel_map,
)


class TestQuantization:
    @pytest.mark.parametrize("n,expected", [
        (1, 1), (2, 2), (3, 2), (4, 4), (7, 4), (8, 8), (31, 16), (64, 64),
    ])
    def test_power_of_two_buckets(self, n, expected):
        assert quantize_workers(n) == expected

    def test_max_workers_cap_applies_before_bucketing(self):
        assert quantize_workers(64, max_workers=6) == 4

    def test_never_below_one(self):
        assert quantize_workers(0) == 1
        assert quantize_workers(-3) == 1


class TestSuggestions:
    def test_requested_respected_under_light_load(self, monkeypatch):
        lb = DynamicLoadBalancer()
        monkeypatch.setattr(
            lb, "system_load",
            lambda: {"cpu_percent": 10.0, "memory_percent": 10.0},
        )
        assert lb.get_optimal_workers(requested=8, max_workers=16) == 8

    def test_cpu_pressure_halves_workers(self, monkeypatch):
        lb = DynamicLoadBalancer(cpu_threshold=50.0)
        monkeypatch.setattr(
            lb, "system_load",
            lambda: {"cpu_percent": 95.0, "memory_percent": 10.0},
        )
        assert lb.get_optimal_workers(requested=8, max_workers=16) == 4

    def test_cpu_and_memory_pressure_quarter_workers(self, monkeypatch):
        lb = DynamicLoadBalancer(cpu_threshold=50.0, memory_threshold=50.0)
        monkeypatch.setattr(
            lb, "system_load",
            lambda: {"cpu_percent": 95.0, "memory_percent": 95.0},
        )
        assert lb.get_optimal_workers(requested=16, max_workers=32) == 4

    def test_pressure_never_drops_below_one(self, monkeypatch):
        lb = DynamicLoadBalancer(cpu_threshold=1.0, memory_threshold=1.0)
        monkeypatch.setattr(
            lb, "system_load",
            lambda: {"cpu_percent": 99.0, "memory_percent": 99.0},
        )
        assert lb.get_optimal_workers(requested=1) == 1

    def test_batch_size_respects_memory_budget(self):
        lb = DynamicLoadBalancer()
        # 1 MB/item, 64 MB budget -> 64-item batches (min_batch floor off)
        assert lb.suggest_batch_size(
            10_000, 1 << 20, memory_budget_bytes=64 << 20, min_batch=1
        ) == 64
        # never exceeds the item count
        assert lb.suggest_batch_size(10, 1, memory_budget_bytes=1 << 30) == 10
        # degenerate bytes/item -> everything in one batch
        assert lb.suggest_batch_size(123, 0) == 123


class TestHistoryLearning:
    def test_throughput_by_workers_aggregates(self):
        lb = DynamicLoadBalancer()
        lb.record_task(duration_s=1.0, n_items=100, workers=2)
        lb.record_task(duration_s=1.0, n_items=300, workers=4)
        lb.record_task(duration_s=1.0, n_items=100, workers=4)
        tp = lb.throughput_by_workers()
        assert tp[2] == pytest.approx(100.0)
        assert tp[4] == pytest.approx(200.0)
        assert lb.best_known_workers() == 4

    def test_zero_duration_records_ignored(self):
        lb = DynamicLoadBalancer()
        lb.record_task(duration_s=0.0, n_items=100, workers=2)
        assert lb.throughput_by_workers() == {}
        assert lb.best_known_workers() is None

    def test_history_bounded(self):
        lb = DynamicLoadBalancer(history_size=4)
        for i in range(10):
            lb.record_task(1.0, i, workers=2)
        assert len(lb._history) == 4


class TestExecutorIntegration:
    def test_suggested_workers_run_a_real_pool(self, monkeypatch):
        lb = DynamicLoadBalancer()
        monkeypatch.setattr(
            lb, "system_load",
            lambda: {"cpu_percent": 0.0, "memory_percent": 0.0},
        )
        workers = lb.get_optimal_workers(requested=4, max_workers=4)
        with get_executor("lb_test", executor_type="thread",
                          max_workers=workers) as pool:
            futs = [pool.submit(lambda x: x * x, i) for i in range(16)]
            assert sorted(f.result() for f in futs) == [
                i * i for i in range(16)
            ]

    def test_parallel_map_with_suggestion_and_history(self, monkeypatch):
        lb = DynamicLoadBalancer()
        monkeypatch.setattr(
            lb, "system_load",
            lambda: {"cpu_percent": 0.0, "memory_percent": 0.0},
        )
        workers = lb.get_optimal_workers(requested=2, max_workers=2)
        items = list(range(40))
        t0 = time.perf_counter()
        out = parallel_map(lambda x: x + 1, items, max_workers=workers,
                           executor_type="thread", show_progress=False)
        lb.record_task(time.perf_counter() - t0, len(items), workers)
        assert out == [x + 1 for x in items]
        assert lb.throughput_by_workers()  # the run landed in history

    def test_streaming_parallel_respects_worker_bucketing(self, tmp_path):
        """End-to-end: a parallel StreamingPlugin run with max_workers from
        the balancer produces the same ordered chunk stream as serial."""
        from waveformanalysis_tpu.dtypes.table import Table
        from waveformanalysis_tpu.plugins.streaming import StreamingPlugin
        from waveformanalysis_tpu.testing.fixtures import (
            make_fake_st_waveforms,
            make_tiny_context,
        )

        class Echo(StreamingPlugin):
            provides = "lb_echo_stream"
            depends_on = ["st_waveforms"]
            save_when = "never"

            def compute_chunk(self, context, run_id, chunk):
                data = chunk.data
                if not isinstance(data, Table):
                    data = Table.from_numpy(data)
                return data

        st = make_fake_st_waveforms(n_events=60, wave_length=32)
        lb = DynamicLoadBalancer()
        workers = quantize_workers(
            lb.get_optimal_workers(requested=4, max_workers=4)
        )

        def run_with(streaming_config, sub):
            ctx = make_tiny_context(tmp_path / sub, st_waveforms=st)
            ctx.register(Echo())
            ctx.set_config({"lb_echo_stream": {
                "streaming_config": streaming_config,
            }})
            return list(ctx.get_data("test_run", "lb_echo_stream"))

        serial = run_with({"chunk_size": 8}, "s")
        par = run_with({"chunk_size": 8, "parallel": True,
                        "max_workers": workers}, "p")
        assert len(serial) == len(par) == 8
        for a, b in zip(serial, par):
            np.testing.assert_array_equal(
                np.asarray(a.data["timestamp"]),
                np.asarray(b.data["timestamp"]),
            )
