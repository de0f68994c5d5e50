"""Progress utilities: tracker, global tracker, decorator, iter/map, formats.

Mirrors the reference progress suite
(reference: tests/test_progress_decorator.py over foundation/progress.py:
tracker basics, context-manager close, with_progress on generator /
list-returning / regular functions, progress_iter auto-total, progress_map,
global tracker get/reset, format_time / format_throughput).
"""

import numpy as np
import pytest

from waveformanalysis_tpu.foundation.progress import (
    ProgressTracker,
    format_throughput,
    format_time,
    get_global_tracker,
    progress_iter,
    progress_map,
    reset_global_tracker,
    with_progress,
)


@pytest.fixture(autouse=True)
def _fresh_global_tracker():
    reset_global_tracker()
    yield
    reset_global_tracker()


class TestProgressTracker:
    def test_create_update_close(self):
        t = ProgressTracker(use_tqdm=False)
        t.track("job", total=10)
        t.update("job", 3)
        st = t.stats("job")
        assert st["done"] == 3 and st["total"] == 10
        t.close("job")
        assert t.stats("job") is None

    def test_update_unknown_bar_is_noop(self):
        t = ProgressTracker(use_tqdm=False)
        t.update("nope")  # must not raise

    def test_disabled_tracker_records_nothing(self):
        t = ProgressTracker(enabled=False, use_tqdm=False)
        t.track("job", total=5)
        t.update("job")
        assert t.stats("job") is None

    def test_nested_bars(self):
        t = ProgressTracker(use_tqdm=False)
        t.track("outer", total=2)
        t.track("inner", total=4)
        t.update("inner", 4)
        t.update("outer", 1)
        assert t.stats("outer")["done"] == 1
        assert t.stats("inner")["done"] == 4
        t.close_all()
        assert t.stats("outer") is None and t.stats("inner") is None

    def test_context_manager_closes_all(self):
        with ProgressTracker(use_tqdm=False) as t:
            t.track("a", total=1)
            t.track("b")
        assert t.stats("a") is None and t.stats("b") is None

    def test_throughput_and_eta(self):
        t = ProgressTracker(use_tqdm=False)
        t.track("job", total=100)
        t.update("job", 50)
        st = t.stats("job")
        assert st["rate"] > 0
        assert st["eta_s"] is not None and st["eta_s"] >= 0


class TestWithProgress:
    def test_generator_function(self):
        tracker = ProgressTracker(use_tqdm=False)

        @with_progress(total=5, tracker=tracker, bar_name="gen")
        def produce():
            for i in range(5):
                yield i

        out = list(produce())
        assert out == [0, 1, 2, 3, 4]
        assert tracker.stats("gen") is None  # closed after exhaustion

    def test_generator_partial_consumption_closes_on_gc(self):
        tracker = ProgressTracker(use_tqdm=False)

        @with_progress(tracker=tracker, bar_name="gen2")
        def produce():
            for i in range(100):
                yield i

        g = produce()
        assert next(g) == 0
        g.close()
        assert tracker.stats("gen2") is None

    def test_function_returning_list(self):
        @with_progress()
        def load():
            return [1, 2, 3]

        assert load() == [1, 2, 3]

    def test_regular_function(self):
        @with_progress()
        def compute(x, y=1):
            return x + y

        assert compute(2, y=3) == 5

    def test_disable_passthrough(self):
        @with_progress(disable=True)
        def f():
            return "ok"

        assert f() == "ok"

    def test_function_metadata_preserved(self):
        @with_progress()
        def documented():
            """docstring here"""
            return None

        assert documented.__name__ == "documented"
        assert "docstring" in documented.__doc__


class TestProgressIter:
    def test_basic_iteration(self):
        tracker = ProgressTracker(use_tqdm=False)
        out = list(progress_iter(range(7), tracker=tracker, name="it"))
        assert out == list(range(7))
        assert tracker.stats("it") is None

    def test_auto_total_from_len(self):
        tracker = ProgressTracker(use_tqdm=False)
        data = [10, 20, 30]
        it = progress_iter(data, tracker=tracker, name="it")
        assert next(it) == 10
        assert tracker.stats("it")["total"] == 3
        list(it)

    def test_generator_input_no_total(self):
        tracker = ProgressTracker(use_tqdm=False)
        gen = (i * i for i in range(4))
        it = progress_iter(gen, tracker=tracker, name="it")
        assert next(it) == 0
        assert tracker.stats("it")["total"] is None
        assert list(it) == [1, 4, 9]

    def test_early_break_closes_bar(self):
        tracker = ProgressTracker(use_tqdm=False)
        it = progress_iter(range(100), tracker=tracker, name="it")
        for x in it:
            if x == 2:
                break
        it.close()
        assert tracker.stats("it") is None


class TestProgressMap:
    def test_basic_map(self):
        assert progress_map(lambda x: x * 2, [1, 2, 3]) == [2, 4, 6]

    def test_map_empty(self):
        assert progress_map(len, []) == []

    def test_map_with_numpy(self):
        arrs = [np.arange(3), np.arange(5)]
        assert progress_map(len, arrs) == [3, 5]


class TestGlobalTracker:
    def test_get_returns_same_instance(self):
        assert get_global_tracker() is get_global_tracker()

    def test_reset_discards_instance(self):
        t1 = get_global_tracker()
        t1.track("x", total=1)
        reset_global_tracker()
        t2 = get_global_tracker()
        assert t2 is not t1
        assert t2.stats("x") is None

    def test_decorator_uses_global_by_default(self):
        @with_progress(bar_name="gjob")
        def f():
            return [1]

        f()
        # bar closed after the call; global tracker still functional
        assert get_global_tracker().stats("gjob") is None


class TestFormatting:
    def test_format_time_seconds(self):
        assert format_time(42.7) == "42s"

    def test_format_time_minutes(self):
        assert format_time(65.5) == "01:05"

    def test_format_time_hours(self):
        assert format_time(3665.2) == "01:01:05"

    def test_format_throughput_bands(self):
        assert format_throughput(0.5, "runs") == "0.50 runs/s"
        assert format_throughput(5.12, "it") == "5.1 it/s"
        assert format_throughput(123.456, "items") == "123 items/s"
