"""Profiling & observability reports: timers, performance report, analysis.

Behavioral analog of the reference observability layer
(reference: core/foundation/utils.py:92-207 Profiler,
core/plugins/core/stats.py:103-400, core/data/dependency_analysis.py:245):
timers aggregate per key, the Context performance report reflects executed
plugins and cache hits, and the dependency analyzer derives critical paths
and exports markdown.
"""

import time

import numpy as np
import pytest

from waveformanalysis_tpu.context.context import Context
from waveformanalysis_tpu.data.dependency_analysis import DependencyAnalyzer
from waveformanalysis_tpu.foundation.profiler import Profiler
from waveformanalysis_tpu.plugins.base import Plugin


class _Slow(Plugin):
    provides = "prof_slow"
    save_when = "always"

    def compute(self, context, run_id, **kwargs):
        time.sleep(0.05)
        return np.zeros(4, dtype=[("v", "i4")])


class _Fast(Plugin):
    provides = "prof_fast"
    depends_on = ["prof_slow"]
    save_when = "always"

    def compute(self, context, run_id, **kwargs):
        context.get_data(run_id, "prof_slow")
        return np.zeros(4, dtype=[("v", "i4")])


@pytest.fixture
def ctx(tmp_path):
    ctx = Context(storage_dir=str(tmp_path), config={"show_progress": False})
    ctx.register(_Slow(), _Fast())
    return ctx


class TestProfiler:
    def test_timers_aggregate(self):
        prof = Profiler()
        for _ in range(3):
            with prof.time("step"):
                time.sleep(0.005)
        stats = prof.get("step")
        assert stats["count"] == 3
        assert stats["total_s"] >= 0.015
        assert stats["max_s"] >= stats["min_s"] > 0

    def test_record_direct_and_reset(self):
        prof = Profiler()
        prof.record("manual", 1.25)
        assert prof.get("manual")["total_s"] == pytest.approx(1.25)
        prof.reset()
        assert prof.get("manual") is None

    def test_disabled_profiler_is_free(self):
        prof = Profiler(enabled=False)
        with prof.time("never"):
            pass
        assert prof.get("never") is None

    def test_summary_sorts_by_total(self):
        prof = Profiler()
        prof.record("small", 0.001)
        prof.record("big", 2.0)
        s = prof.summary()
        assert s.index("big") < s.index("small")

    def test_exceptions_still_record(self):
        prof = Profiler()
        with pytest.raises(ValueError):
            with prof.time("failing"):
                raise ValueError("x")
        assert prof.get("failing")["count"] == 1


class TestContextReports:
    def test_pipeline_timers_recorded(self, ctx):
        ctx.get_data("r", "prof_fast")
        stats = ctx.profiler.stats()
        assert any(k.startswith("plugin.prof_slow") for k in stats)
        assert "context.resolve_dependencies" in stats

    def test_performance_report_lists_plugins_and_hits(self, ctx):
        ctx.stats.mode = "detailed"
        ctx.get_data("r", "prof_fast")
        ctx.get_data("r", "prof_fast")  # memory-cache hit
        report = ctx.get_performance_report()
        assert "prof_slow" in report and "prof_fast" in report

    def test_stats_records_cache_hits(self, ctx):
        ctx.stats.mode = "basic"
        ctx.get_data("r", "prof_fast")
        records = ctx.stats.get_records("prof_fast")
        assert len(records) == 1
        assert records[0].cache_hit is False
        # prof_slow re-entered via get_data inside prof_fast's compute:
        # the second touch is a memory-cache hit
        slow = ctx.stats.get_records("prof_slow")
        assert any(r.cache_hit for r in slow) or len(slow) == 1
        # a repeat request serves from the memory cache without a new
        # execution record (the plan's needed set is empty)
        ctx.get_data("r", "prof_fast")
        assert len(ctx.stats.get_records("prof_fast")) == 1
        assert ctx._cache_manager.get_stats()["memory_hits"] >= 1


class TestDependencyAnalyzer:
    def test_critical_path_prefers_slow_chain(self, ctx):
        ctx.stats.mode = "basic"
        ctx.get_data("r", "prof_fast")
        result = DependencyAnalyzer(ctx).analyze("prof_fast")
        assert result.critical_path[0] == "prof_slow"
        assert result.critical_path[-1] == "prof_fast"

    def test_markdown_export(self, ctx, tmp_path):
        ctx.stats.mode = "basic"
        ctx.get_data("r", "prof_fast")
        result = DependencyAnalyzer(ctx).analyze("prof_fast")
        md = result.to_markdown(str(tmp_path / "report.md"))
        assert "prof_fast" in md
        assert (tmp_path / "report.md").read_text() == md

    def test_to_dict_round_trips_json(self, ctx):
        import json

        ctx.get_data("r", "prof_fast")
        result = DependencyAnalyzer(ctx).analyze("prof_fast")
        payload = json.loads(json.dumps(result.to_dict()))
        assert "critical_path" in payload
