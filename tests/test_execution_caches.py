"""Performance-cache semantics: plan cache, needed-set pruning, key caches.

Mirrors the reference cache-optimization suite
(reference: tests/test_cache_optimization.py over context_execution.py):
execution plans are computed once per target; cached mid-chain nodes prune
their upstream subtree (memory AND disk); run_plugin loads disk caches
instead of recomputing; lineage/key caches rotate on register/set_config.
"""

from typing import Any

import numpy as np
import pytest

from waveformanalysis_tpu.context.context import Context
from waveformanalysis_tpu.dtypes.table import Table
from waveformanalysis_tpu.plugins.base import Plugin


def _mk_chain(counter):
    """A -> B -> C chain whose computes count invocations."""

    class PluginA(Plugin):
        provides = "a"
        depends_on: tuple = ()
        save_when = "always"
        version = "1.0"

        def compute(self, context: Any, run_id: str, **kw: Any) -> Table:
            counter["a"] = counter.get("a", 0) + 1
            return Table({"x": np.arange(4, dtype=np.int64)})

    class PluginB(Plugin):
        provides = "b"
        depends_on = ("a",)
        save_when = "always"
        version = "1.0"

        def compute(self, context: Any, run_id: str, **kw: Any) -> Table:
            counter["b"] = counter.get("b", 0) + 1
            a = context.get_data(run_id, "a")
            return Table({"x": np.asarray(a["x"]) * 2})

    class PluginC(Plugin):
        provides = "c"
        depends_on = ("b",)
        save_when = "always"
        version = "1.0"

        def compute(self, context: Any, run_id: str, **kw: Any) -> Table:
            counter["c"] = counter.get("c", 0) + 1
            b = context.get_data(run_id, "b")
            return Table({"x": np.asarray(b["x"]) + 1})

    return PluginA(), PluginB(), PluginC()


@pytest.fixture()
def chain_ctx(tmp_path):
    counter: dict = {}
    ctx = Context(storage_dir=str(tmp_path), config={"show_progress": False})
    ctx.register(*_mk_chain(counter))
    return ctx, counter


def test_execution_plan_cached_per_target(chain_ctx):
    ctx, _ = chain_ctx
    p1 = ctx.execution_domain.resolve_execution_plan("c")
    assert "c" in ctx._execution_plan_cache
    p2 = ctx.execution_domain.resolve_execution_plan("c")
    assert p1 == p2 == ["a", "b", "c"]


def test_plan_cache_invalidated_on_register(chain_ctx):
    ctx, counter = chain_ctx
    ctx.execution_domain.resolve_execution_plan("c")
    assert "c" in ctx._execution_plan_cache

    class PluginC2(Plugin):
        provides = "c"
        depends_on = ("a",)  # different upstream!
        save_when = "always"
        version = "2.0"

        def compute(self, context: Any, run_id: str, **kw: Any) -> Table:
            a = context.get_data(run_id, "a")
            return Table({"x": np.asarray(a["x"]) * 10})

    ctx.register(PluginC2())
    plan = ctx.execution_domain.resolve_execution_plan("c")
    assert plan == ["a", "c"]


def test_full_chain_computes_each_once(chain_ctx):
    ctx, counter = chain_ctx
    out = ctx.get_data("r", "c")
    np.testing.assert_array_equal(np.asarray(out["x"]), [1, 3, 5, 7])
    assert counter == {"a": 1, "b": 1, "c": 1}
    ctx.flush_saves()


def test_memory_cached_mid_node_prunes_upstream(chain_ctx):
    ctx, counter = chain_ctx
    ctx.get_data("r", "b")
    assert counter == {"a": 1, "b": 1}
    ctx.get_data("r", "c")
    # b (and thus a) served from memory: only c computes
    assert counter == {"a": 1, "b": 1, "c": 1}
    ctx.flush_saves()


def test_disk_cached_mid_node_prunes_upstream(tmp_path):
    c1: dict = {}
    ctx1 = Context(storage_dir=str(tmp_path), config={"show_progress": False})
    ctx1.register(*_mk_chain(c1))
    ctx1.get_data("r", "b")
    ctx1.flush_saves()

    c2: dict = {}
    ctx2 = Context(storage_dir=str(tmp_path), config={"show_progress": False})
    ctx2.register(*_mk_chain(c2))
    needed = ctx2.execution_domain.compute_needed_set(["a", "b", "c"], "c", "r")
    assert needed == {"c"}, "disk-cached b must prune a and b"
    out = ctx2.get_data("r", "c")
    np.testing.assert_array_equal(np.asarray(out["x"]), [1, 3, 5, 7])
    assert c2 == {"c": 1}
    ctx2.flush_saves()


def test_run_plugin_loads_disk_cache_for_target(tmp_path):
    c1: dict = {}
    ctx1 = Context(storage_dir=str(tmp_path), config={"show_progress": False})
    ctx1.register(*_mk_chain(c1))
    ctx1.get_data("r", "c")
    ctx1.flush_saves()

    c2: dict = {}
    ctx2 = Context(storage_dir=str(tmp_path), config={"show_progress": False})
    ctx2.register(*_mk_chain(c2))
    out = ctx2.get_data("r", "c")
    np.testing.assert_array_equal(np.asarray(out["x"]), [1, 3, 5, 7])
    assert c2 == {}, "fully-cached target must not recompute anything"


def test_key_cache_consistent_and_rotates_on_version(chain_ctx):
    ctx, _ = chain_ctx
    k1 = ctx.key_for("r", "c")
    assert ctx.key_for("r", "c") == k1  # cached + stable

    class PluginCv2(Plugin):
        provides = "c"
        depends_on = ("b",)
        save_when = "always"
        version = "2.0"

        def compute(self, context: Any, run_id: str, **kw: Any) -> Table:
            return Table({"x": np.zeros(1, np.int64)})

    ctx.register(PluginCv2())
    assert ctx.key_for("r", "c") != k1


def test_upstream_version_bump_rotates_downstream_key(chain_ctx):
    ctx, counter = chain_ctx
    k_c = ctx.key_for("r", "c")

    class PluginAv2(Plugin):
        provides = "a"
        depends_on: tuple = ()
        save_when = "always"
        version = "9.9"

        def compute(self, context: Any, run_id: str, **kw: Any) -> Table:
            return Table({"x": np.arange(4, dtype=np.int64)})

    ctx.register(PluginAv2())
    assert ctx.key_for("r", "c") != k_c, \
        "lineage is recursive: upstream version is part of downstream keys"


def test_nested_dependency_recompute_scope(chain_ctx):
    """Changing only c's config recomputes c, not a/b."""
    ctx, counter = chain_ctx
    ctx.get_data("r", "c")
    before = dict(counter)

    class PluginCOpt(Plugin):
        provides = "c"
        depends_on = ("b",)
        save_when = "always"
        version = "1.0"
        options = {}

        def compute(self, context: Any, run_id: str, **kw: Any) -> Table:
            counter["c"] = counter.get("c", 0) + 1
            b = context.get_data(run_id, "b")
            return Table({"x": np.asarray(b["x"]) + 100})

    ctx.register(PluginCOpt())
    out = ctx.get_data("r", "c")
    np.testing.assert_array_equal(np.asarray(out["x"]), [100, 102, 104, 106])
    assert counter["a"] == before["a"] and counter["b"] == before["b"]
    ctx.flush_saves()
