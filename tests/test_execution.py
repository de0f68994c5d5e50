"""Execution layer tests: pools, timeouts, validation, cancellation, balancer."""

import threading
import time

import numpy as np
import pytest

from waveformanalysis_tpu.execution import (
    EXECUTOR_CONFIGS,
    CancellationManager,
    CancellationToken,
    DynamicLoadBalancer,
    ExecutorManager,
    TaskCancelledException,
    TimeoutManager,
    ValidationManager,
    get_executor,
    is_picklable,
    parallel_apply,
    parallel_map,
    quantize_workers,
    resolve_executor_config,
    with_timeout,
)
from waveformanalysis_tpu.foundation.exceptions import TimeoutError_, ValidationError


class TestExecutorManager:
    def test_pool_reuse_and_refcount(self):
        mgr = ExecutorManager()
        with mgr.get_executor("t", "thread", 2) as e1:
            with mgr.get_executor("t", "thread", 2) as e2:
                assert e1 is e2
        stats = mgr.get_stats()
        assert stats["created"] == 1
        assert stats["reused"] == 1
        assert mgr.shutdown_idle() == 1

    def test_no_reuse(self):
        mgr = ExecutorManager()
        with mgr.get_executor("x", "thread", 2, reuse=False) as e1:
            pass
        with mgr.get_executor("x", "thread", 2, reuse=False) as e2:
            pass
        assert mgr.get_stats()["active_pools"] == 0

    def test_bad_type(self):
        mgr = ExecutorManager()
        with pytest.raises(ValueError):
            with mgr.get_executor("x", "fiber", 2):
                pass

    def test_named_configs(self):
        cfg = resolve_executor_config("io_intensive")
        assert cfg["executor_type"] == "thread"
        assert cfg["max_workers"] == 16
        with pytest.raises(KeyError):
            resolve_executor_config("nope")
        assert "cpu_intensive" in EXECUTOR_CONFIGS


class TestParallelHelpers:
    def test_parallel_map_ordered(self):
        out = parallel_map(lambda x: x * 2, range(20), max_workers=4)
        assert out == [x * 2 for x in range(20)]

    def test_parallel_map_single_worker(self):
        out = parallel_map(lambda x: x + 1, [1, 2, 3], max_workers=1)
        assert out == [2, 3, 4]

    def test_parallel_apply(self):
        out = parallel_apply([lambda: 1, lambda: 2, lambda: 3], max_workers=2)
        assert out == [1, 2, 3]

    def test_exception_propagates(self):
        def boom(x):
            if x == 3:
                raise RuntimeError("x3")
            return x

        with pytest.raises(RuntimeError, match="x3"):
            parallel_map(boom, range(6), max_workers=2)

    def test_is_picklable(self):
        assert is_picklable([1, 2, 3])
        assert not is_picklable(lambda x: x)


class TestTimeout:
    def test_thread_timeout(self):
        mgr = TimeoutManager()

        def slow():
            time.sleep(1.0)

        def run_in_thread():
            with pytest.raises(TimeoutError_):
                mgr.run_with_timeout(slow, 0.1, task_name="slow")

        t = threading.Thread(target=run_in_thread)
        t.start()
        t.join()
        assert mgr.stats["timed_out"] == 1

    def test_signal_timeout_main_thread(self):
        mgr = TimeoutManager()
        with pytest.raises(TimeoutError_):
            mgr.run_with_timeout(lambda: time.sleep(1.0), 0.1, task_name="s")

    def test_no_timeout_passthrough(self):
        mgr = TimeoutManager()
        assert mgr.run_with_timeout(lambda: 42, None) == 42

    def test_decorator(self):
        @with_timeout(5.0)
        def quick():
            return "ok"

        assert quick() == "ok"

    def test_exception_passthrough(self):
        mgr = TimeoutManager()
        with pytest.raises(KeyError):
            mgr.run_with_timeout(lambda: {}["missing"], 1.0)


class TestCancellation:
    def test_token_lifecycle(self):
        token = CancellationToken("t1")
        assert not token.cancelled
        token.check()  # no raise
        token.cancel()
        assert token.cancelled
        with pytest.raises(TaskCancelledException):
            token.check()

    def test_on_cancel_callbacks(self):
        token = CancellationToken()
        fired = []
        token.on_cancel(lambda: fired.append(1))
        token.cancel()
        assert fired == [1]
        token.on_cancel(lambda: fired.append(2))  # late registration fires
        assert fired == [1, 2]

    def test_manager_cancel_all(self):
        mgr = CancellationManager()
        t1, t2 = mgr.create_token("a"), mgr.create_token("b")
        assert mgr.cancel_all() == 2
        assert t1.cancelled and t2.cancelled
        mgr.unregister(t1)
        assert "a" not in mgr.active_tokens


class TestLoadBalancer:
    def test_quantize(self):
        assert quantize_workers(5) == 4
        assert quantize_workers(16) == 16
        assert quantize_workers(0) == 1
        assert quantize_workers(9, max_workers=6) == 4

    def test_optimal_workers_is_power_of_two(self):
        lb = DynamicLoadBalancer()
        w = lb.get_optimal_workers(requested=6)
        assert w & (w - 1) == 0

    def test_history_throughput(self):
        lb = DynamicLoadBalancer()
        lb.record_task(1.0, 100, workers=2)
        lb.record_task(1.0, 300, workers=4)
        assert lb.best_known_workers() == 4

    def test_batch_size(self):
        lb = DynamicLoadBalancer()
        assert lb.suggest_batch_size(10_000, bytes_per_item=1 << 20,
                                     memory_budget_bytes=1 << 30) == 1024
        assert lb.suggest_batch_size(100, bytes_per_item=8) == 100


class TestValidationManager:
    def test_input_dtype_validation(self, tmp_path):
        from waveformanalysis_tpu.context.context import Context
        from waveformanalysis_tpu.dtypes.table import Table
        from waveformanalysis_tpu.plugins.base import Plugin

        class Consumer(Plugin):
            provides = "consumer"
            depends_on = ["upstream"]
            input_dtype = {"upstream": np.dtype([("time", "i8"), ("v", "f4")])}

            def compute(self, context, run_id, **kwargs):
                return np.zeros(1)

        ctx = Context(storage_dir=str(tmp_path), config={"show_progress": False})
        vm = ValidationManager(ctx)
        plugin = Consumer()
        ctx.register(plugin)
        # good input
        ctx.inject_data("r", "upstream", Table({
            "time": np.zeros(2, np.int64), "v": np.zeros(2, np.float32)}))
        ctx._results[("r", "upstream")] = ctx._results[("r", "upstream")]
        assert vm.validate_input_dtypes(plugin, "r") == []
        # bad input
        ctx.inject_data("r2", "upstream", Table({"other": np.zeros(2)}))
        with pytest.raises(ValidationError, match="missing fields"):
            vm.validate_input_dtypes(plugin, "r2")


class TestAsyncSave:
    """Async cache writes: hidden from the critical path, visible to reads."""

    def _ctx(self, tmp_path, async_save=True):
        from waveformanalysis_tpu.testing.fixtures import (
            make_fake_st_waveforms,
            make_tiny_context,
        )
        from waveformanalysis_tpu.plugins.builtin.basic_features import (
            BasicFeaturesPlugin,
        )

        ctx = make_tiny_context(
            tmp_path, st_waveforms=make_fake_st_waveforms(64, 64)
        )
        ctx.config["async_save"] = async_save
        ctx.register(BasicFeaturesPlugin())
        return ctx

    def test_async_save_persists_and_clone_reads(self, tmp_path):
        import numpy as np

        ctx = self._ctx(tmp_path)
        out = ctx.get_data("test_run", "basic_features")
        # clone() barriers on in-flight writes, then reads from disk
        clone = ctx.clone()
        from waveformanalysis_tpu.testing.fixtures import make_fake_st_waveforms

        clone.inject_data("test_run", "st_waveforms",
                          make_fake_st_waveforms(64, 64))
        again = clone.get_data("test_run", "basic_features")
        np.testing.assert_array_equal(
            np.asarray(out["area"]), np.asarray(again["area"])
        )
        assert "plugin.basic_features.compute" not in str(
            clone.profiler.summary()
        )

    def test_flush_saves_explicit(self, tmp_path):
        ctx = self._ctx(tmp_path)
        ctx.get_data("test_run", "basic_features")
        ctx.flush_saves()
        key = ctx.key_for("test_run", "basic_features")
        assert ctx.storage.exists(key, run_id="test_run")

    def test_sync_mode_unchanged(self, tmp_path):
        ctx = self._ctx(tmp_path, async_save=False)
        ctx.get_data("test_run", "basic_features")
        key = ctx.key_for("test_run", "basic_features")
        # no flush needed: the save completed inline
        assert ctx.storage.exists(key, run_id="test_run")

    def test_writer_failure_surfaces_at_barrier(self, tmp_path):
        import pytest

        ctx = self._ctx(tmp_path)

        def boom(*a, **k):
            raise OSError("disk gone")

        ctx.storage.save_memmap = boom
        ctx.get_data("test_run", "basic_features")  # submit succeeds
        with pytest.raises(OSError, match="disk gone"):
            ctx.flush_saves()

    def test_context_manager_flushes_on_exit(self, tmp_path):
        import tempfile

        from waveformanalysis_tpu.context.context import Context
        from waveformanalysis_tpu.plugins.builtin.basic_features import (
            BasicFeaturesPlugin,
        )
        from waveformanalysis_tpu.testing.fixtures import make_fake_st_waveforms

        # the with-form must settle async writes before the tempdir goes
        with tempfile.TemporaryDirectory() as tmp:
            with Context(storage_dir=tmp,
                         config={"show_progress": False}) as ctx:
                ctx.register(BasicFeaturesPlugin())
                ctx.inject_data("r", "st_waveforms",
                                make_fake_st_waveforms(64, 64))
                ctx.get_data("r", "basic_features")
                key = ctx.key_for("r", "basic_features")
            assert ctx.storage.exists(key, run_id="r")
