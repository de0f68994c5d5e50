"""Execution-plan caching and cache-aware plan pruning.

Behavioral analog of the reference cache-optimization suite
(reference: tests/test_cache_optimization.py over
core/context_execution.py:30-63): plans are resolved once per target and
reused across runs; cache-valid subtrees are pruned from the needed set so
upstream plugins never recompute; plan caches invalidate on re-registration.
"""

import numpy as np
import pytest

from waveformanalysis_tpu.context.context import Context
from waveformanalysis_tpu.dtypes.schema import Field, Schema
from waveformanalysis_tpu.dtypes.table import Table
from waveformanalysis_tpu.plugins.base import Option, Plugin

SCHEMA = Schema("opt", (Field("v", "i4"),))


def _table(vals):
    return Table({"v": np.asarray(vals, dtype=np.int32)}, schema=SCHEMA)


class CountingPlugin(Plugin):
    """Counts compute invocations (class-level so clones share it)."""

    save_when = "always"
    output_dtype = SCHEMA
    calls: dict = {}

    def compute(self, context, run_id, **kwargs):
        CountingPlugin.calls[self.provides] = (
            CountingPlugin.calls.get(self.provides, 0) + 1
        )
        vals = [len(self.provides)]
        for dep in self.depends_on:
            upstream = context.get_data(run_id, dep)
            vals.append(int(np.asarray(upstream["v"]).sum()))
        return _table(vals)


def _chain_plugins():
    CountingPlugin.calls = {}

    class A(CountingPlugin):
        provides = "data_a"

    class B(CountingPlugin):
        provides = "data_b"
        depends_on = ["data_a"]

    class C(CountingPlugin):
        provides = "data_c"
        depends_on = ["data_b"]

    return A(), B(), C()


@pytest.fixture
def ctx(tmp_path):
    ctx = Context(storage_dir=str(tmp_path), config={"show_progress": False})
    ctx.register(*_chain_plugins())
    return ctx


class TestExecutionPlanCache:
    def test_plan_cached_after_first_resolution(self, ctx):
        ctx.get_data("run_001", "data_c")
        assert "data_c" in ctx._execution_plan_cache
        assert ctx._execution_plan_cache["data_c"] == [
            "data_a", "data_b", "data_c"
        ]

    def test_cached_plan_reused_across_runs(self, ctx):
        ctx.get_data("run_001", "data_c")
        plan_obj = ctx._execution_plan_cache["data_c"]
        out = ctx.get_data("run_002", "data_c")
        assert ctx._execution_plan_cache["data_c"] == plan_obj
        assert len(out) == 2

    def test_plan_cache_invalidated_on_register(self, ctx):
        ctx.get_data("run_001", "data_c")
        assert ctx._execution_plan_cache

        class D(CountingPlugin):
            provides = "data_d"
            depends_on = ["data_c"]

        ctx.register(D())
        # registering must not leave stale plans referencing the old graph
        assert "data_d" not in ctx._execution_plan_cache
        plan = ctx.execution_domain.resolve_execution_plan("data_d", "run_001")
        assert plan == ["data_a", "data_b", "data_c", "data_d"]

    def test_plan_is_topologically_sorted_for_diamond(self, tmp_path):
        CountingPlugin.calls = {}

        class A(CountingPlugin):
            provides = "dia_a"

        class L(CountingPlugin):
            provides = "dia_l"
            depends_on = ["dia_a"]

        class R(CountingPlugin):
            provides = "dia_r"
            depends_on = ["dia_a"]

        class T(CountingPlugin):
            provides = "dia_t"
            depends_on = ["dia_l", "dia_r"]

        ctx = Context(storage_dir=str(tmp_path),
                      config={"show_progress": False})
        ctx.register(A(), L(), R(), T())
        plan = ctx.execution_domain.resolve_execution_plan("dia_t", "r")
        assert plan.index("dia_a") < plan.index("dia_l")
        assert plan.index("dia_a") < plan.index("dia_r")
        assert plan[-1] == "dia_t"
        ctx.get_data("r", "dia_t")
        # the shared root computed exactly once
        assert CountingPlugin.calls["dia_a"] == 1


class TestCacheAwarePruning:
    def test_cached_subtree_not_recomputed(self, ctx):
        ctx.get_data("run_001", "data_c")
        assert CountingPlugin.calls == {
            "data_a": 1, "data_b": 1, "data_c": 1
        }
        ctx.flush_saves()

        # a FRESH context over the same storage resumes from the deepest
        # cached layer: nothing recomputes
        ctx2 = ctx.clone()
        out = ctx2.get_data("run_001", "data_c")
        assert CountingPlugin.calls == {
            "data_a": 1, "data_b": 1, "data_c": 1
        }
        assert len(out) == 2

    def test_needed_set_empty_on_full_cache(self, ctx):
        ctx.get_data("run_001", "data_c")
        ctx.flush_saves()
        ctx2 = ctx.clone()
        plan = ctx2.execution_domain.resolve_execution_plan(
            "data_c", "run_001"
        )
        needed = ctx2.execution_domain.compute_needed_set(
            plan, "data_c", "run_001"
        )
        assert needed == set()

    def test_mid_chain_cache_prunes_upstream(self, ctx):
        """Only data_b cached: data_a must NOT be needed (the reference's
        compute_needed_set contract: a cached node cuts its subtree)."""
        ctx.get_data("run_001", "data_b")
        ctx.flush_saves()
        ctx2 = ctx.clone()
        plan = ctx2.execution_domain.resolve_execution_plan(
            "data_c", "run_001"
        )
        needed = ctx2.execution_domain.compute_needed_set(
            plan, "data_c", "run_001"
        )
        assert needed == {"data_c"}
        before = dict(CountingPlugin.calls)
        ctx2.get_data("run_001", "data_c")
        assert CountingPlugin.calls["data_a"] == before["data_a"]
        assert CountingPlugin.calls["data_b"] == before["data_b"]
        assert CountingPlugin.calls["data_c"] == before.get("data_c", 0) + 1

    def test_config_change_recomputes_only_downstream_cone(self, tmp_path):
        CountingPlugin.calls = {}

        class A(CountingPlugin):
            provides = "cfg_a"

        class B(CountingPlugin):
            provides = "cfg_b"
            depends_on = ["cfg_a"]
            options = {"knob": Option(default=1, type=int)}

            def compute(self, context, run_id, **kwargs):
                CountingPlugin.calls["cfg_b"] = (
                    CountingPlugin.calls.get("cfg_b", 0) + 1
                )
                k = context.get_config(self, "knob")
                up = context.get_data(run_id, "cfg_a")
                return _table([int(np.asarray(up["v"]).sum()) + k])

        ctx = Context(storage_dir=str(tmp_path),
                      config={"show_progress": False})
        ctx.register(A(), B())
        first = ctx.get_data("r", "cfg_b")
        ctx.flush_saves()
        ctx.set_config({"cfg_b": {"knob": 5}})
        second = ctx.get_data("r", "cfg_b")
        # upstream untouched, downstream recomputed with the new knob
        assert CountingPlugin.calls["cfg_a"] == 1
        assert CountingPlugin.calls["cfg_b"] == 2
        assert int(second["v"][0]) == int(first["v"][0]) + 4

    def test_memory_cache_beats_disk(self, ctx):
        ctx.get_data("run_001", "data_c")
        base = ctx._cache_manager.get_stats()["memory_hits"]
        ctx.get_data("run_001", "data_c")
        assert ctx._cache_manager.get_stats()["memory_hits"] > base


class TestPlanCacheStress:
    def test_deep_chain_plans_linear(self, tmp_path):
        """A 30-deep chain resolves and caches once; re-resolution is a
        dict lookup (the reference asserts resolution speedups; here we
        assert the structural guarantee instead of wall-clock)."""
        CountingPlugin.calls = {}
        plugins = []
        prev = None
        for i in range(30):
            name = f"deep_{i:02d}"
            attrs = {"provides": name}
            if prev is not None:
                attrs["depends_on"] = [prev]
            plugins.append(type(f"Deep{i}", (CountingPlugin,), attrs)())
            prev = name
        ctx = Context(storage_dir=str(tmp_path),
                      config={"show_progress": False})
        ctx.register(*plugins)
        plan = ctx.execution_domain.resolve_execution_plan("deep_29", "r")
        assert len(plan) == 30
        assert ctx._execution_plan_cache["deep_29"] == plan
        ctx.get_data("r", "deep_29")
        assert all(v == 1 for v in CountingPlugin.calls.values())

    def test_multi_target_union_plan(self, ctx):
        """get_data(run, [names]) resolves one union plan and computes the
        shared prefix once."""
        out = ctx.get_data("run_u", ["data_b", "data_c"])
        assert set(out) == {"data_b", "data_c"}
        assert CountingPlugin.calls["data_a"] == 1
        assert CountingPlugin.calls["data_b"] == 1
