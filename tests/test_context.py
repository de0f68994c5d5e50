"""Context integration tests: registration, execution, caching, lineage."""

import numpy as np
import pytest

from waveformanalysis_tpu.context.context import Context
from waveformanalysis_tpu.context.resolution import (
    CircularDependencyError,
    MissingDependencyError,
    VersionConflictError,
)
from waveformanalysis_tpu.foundation.exceptions import PluginError
from waveformanalysis_tpu.plugins.base import Option, Plugin


def make_source_dtype():
    return np.dtype([("time", "i8"), ("value", "f4"), ("channel", "i2")])


class SourcePlugin(Plugin):
    provides = "source"
    depends_on = []
    version = "1.0.0"
    save_when = "always"
    output_dtype = make_source_dtype()
    options = {"n": Option(default=10, type=int)}
    compute_count = 0

    def compute(self, context, run_id, **kwargs):
        type(self).compute_count += 1
        n = context.get_config(self, "n")
        arr = np.zeros(n, dtype=self.output_dtype)
        arr["time"] = np.arange(n)
        arr["value"] = np.arange(n, dtype=np.float32) * 2
        arr["channel"] = np.arange(n) % 2
        return arr


class DoublerPlugin(Plugin):
    provides = "doubled"
    depends_on = ["source"]
    version = "1.0.0"
    save_when = "always"
    output_dtype = make_source_dtype()
    options = {"factor": Option(default=2.0, type=float)}

    def compute(self, context, run_id, **kwargs):
        src = context.get_data(run_id, "source")
        factor = context.get_config(self, "factor")
        out = np.array(src, copy=True)
        out["value"] = out["value"] * factor
        return out


@pytest.fixture
def ctx(tmp_path):
    SourcePlugin.compute_count = 0
    c = Context(storage_dir=str(tmp_path / "store"),
                config={"show_progress": False})
    c.register(SourcePlugin(), DoublerPlugin())
    return c


class TestRegistration:
    def test_register_class_or_instance(self, tmp_path):
        c = Context(storage_dir=str(tmp_path), config={"show_progress": False})
        c.register(SourcePlugin)  # class
        assert "source" in c.plugins

    def test_register_invalid(self, tmp_path):
        c = Context(storage_dir=str(tmp_path))
        with pytest.raises(TypeError):
            c.register(object())

        class NoProvides(Plugin):
            def compute(self, context, run_id, **kwargs):
                return None

        with pytest.raises(ValueError):
            c.register(NoProvides())

    def test_spec_attached(self, ctx):
        plugin = ctx.get_plugin("source")
        assert plugin._validated_spec is not None
        assert plugin._validated_spec.provides == "source"


class TestExecution:
    def test_get_data_computes_chain(self, ctx):
        out = ctx.get_data("run1", "doubled")
        np.testing.assert_allclose(out["value"], np.arange(10) * 4.0)

    def test_memory_cache_hit(self, ctx):
        ctx.get_data("run1", "source")
        assert SourcePlugin.compute_count == 1
        ctx.get_data("run1", "source")
        assert SourcePlugin.compute_count == 1  # no recompute

    def test_disk_cache_after_restart(self, ctx, tmp_path):
        ctx.get_data("run1", "doubled")
        assert SourcePlugin.compute_count == 1
        # fresh context, same storage
        c2 = Context(storage_dir=str(tmp_path / "store"),
                     config={"show_progress": False})
        c2.register(SourcePlugin(), DoublerPlugin())
        out = c2.get_data("run1", "doubled")
        np.testing.assert_allclose(out["value"], np.arange(10) * 4.0)
        assert SourcePlugin.compute_count == 1  # loaded from disk

    def test_missing_plugin_raises(self, ctx):
        with pytest.raises(KeyError):
            ctx.get_data("run1", "nonexistent")

    def test_unknown_dependency(self, tmp_path):
        class Orphan(Plugin):
            provides = "orphan"
            depends_on = ["missing_dep"]

            def compute(self, context, run_id, **kwargs):
                return context.get_data(run_id, "missing_dep")

        c = Context(storage_dir=str(tmp_path), config={"show_progress": False})
        c.register(Orphan())
        with pytest.raises((MissingDependencyError, KeyError)):
            c.get_data("r", "orphan")

    def test_circular_dependency_detected(self, tmp_path):
        class A(Plugin):
            provides = "a"
            depends_on = ["b"]

            def compute(self, context, run_id, **kwargs):
                return np.zeros(1)

        class B(Plugin):
            provides = "b"
            depends_on = ["a"]

            def compute(self, context, run_id, **kwargs):
                return np.zeros(1)

        c = Context(storage_dir=str(tmp_path), config={"show_progress": False})
        c.register(A(), B())
        with pytest.raises(CircularDependencyError):
            c.get_data("r", "a")

    def test_version_constraint(self, tmp_path):
        class NeedsNew(Plugin):
            provides = "consumer"
            depends_on = [("source", ">=2.0.0")]

            def compute(self, context, run_id, **kwargs):
                return np.zeros(1)

        c = Context(storage_dir=str(tmp_path), config={"show_progress": False})
        c.register(SourcePlugin(), NeedsNew())
        with pytest.raises(VersionConflictError):
            c.get_data("r", "consumer")

    def test_inject_data(self, ctx):
        manual = np.zeros(3, dtype=make_source_dtype())
        ctx.inject_data("run1", "source", manual)
        out = ctx.get_data("run1", "doubled")
        assert len(out) == 3
        assert SourcePlugin.compute_count == 0


class TestCacheContract:
    """Reference analog: tests/contracts/test_cache_consistency.py."""

    def test_same_inputs_same_key(self, ctx, tmp_path):
        k1 = ctx.key_for("run1", "doubled")
        c2 = Context(storage_dir=str(tmp_path / "other"),
                     config={"show_progress": False})
        c2.register(SourcePlugin(), DoublerPlugin())
        assert c2.key_for("run1", "doubled") == k1

    def test_config_change_changes_key(self, ctx):
        k1 = ctx.key_for("run1", "doubled")
        ctx.set_config({"doubled": {"factor": 3.0}})
        k2 = ctx.key_for("run1", "doubled")
        assert k1 != k2

    def test_upstream_config_change_propagates(self, ctx):
        k1 = ctx.key_for("run1", "doubled")
        ctx.set_config({"source": {"n": 20}})
        assert ctx.key_for("run1", "doubled") != k1

    def test_version_bump_changes_key(self, ctx):
        k1 = ctx.key_for("run1", "source")

        class SourceV2(SourcePlugin):
            version = "2.0.0"

        ctx.register(SourceV2())
        assert ctx.key_for("run1", "source") != k1

    def test_kernel_version_changes_key(self, ctx):
        k1 = ctx.key_for("run1", "source")

        class SourceK(SourcePlugin):
            kernel_version = "pallas-v2"

        ctx.register(SourceK())
        assert ctx.key_for("run1", "source") != k1

    def test_config_change_invalidates_memory(self, ctx):
        ctx.get_data("run1", "doubled")
        assert SourcePlugin.compute_count == 1
        ctx.set_config({"doubled": {"factor": 5.0}})
        out = ctx.get_data("run1", "doubled")
        np.testing.assert_allclose(out["value"], np.arange(10) * 10.0)

    def test_lineage_mismatch_on_disk_recomputes(self, ctx, tmp_path):
        ctx.get_data("run1", "doubled")
        c2 = Context(storage_dir=str(tmp_path / "store"),
                     config={"show_progress": False, "doubled": {"factor": 7.0}})
        c2.register(SourcePlugin(), DoublerPlugin())
        out = c2.get_data("run1", "doubled")
        np.testing.assert_allclose(out["value"], np.arange(10) * 14.0)

    def test_clear_cache_downstream(self, ctx):
        ctx.get_data("run1", "doubled")
        n = ctx.clear_cache_for("run1", "source", downstream=True)
        assert n >= 2  # source + doubled (memory and/or disk)
        assert ctx._results == {}


class TestLineage:
    def test_lineage_structure(self, ctx):
        lin = ctx.get_lineage("doubled")
        assert lin["plugin_class"] == "DoublerPlugin"
        assert lin["plugin_version"] == "1.0.0"
        assert "source" in lin["depends_on"]
        assert lin["depends_on"]["source"]["plugin_class"] == "SourcePlugin"
        assert "spec_hash" in lin

    def test_lineage_includes_tracked_defaults(self, ctx):
        # Tracked defaults participate in lineage so a changed plugin default
        # invalidates caches (reference: context.py get_lineage config loop).
        lin = ctx.get_lineage("doubled")
        assert lin["config"]["factor"] == 2.0
        ctx.set_config({"doubled": {"factor": 9.0}})
        lin2 = ctx.get_lineage("doubled")
        assert lin2["config"]["factor"] == 9.0

    def test_untracked_option_excluded(self, tmp_path):
        class P(Plugin):
            provides = "p"
            options = {
                "tracked_opt": Option(default=0, type=int),
                "perf_knob": Option(default=0, type=int, track=False),
            }

            def compute(self, context, run_id, **kwargs):
                return np.zeros(1, dtype=[("channel", "i2")])

        c = Context(storage_dir=str(tmp_path), config={"show_progress": False})
        c.register(P())
        c.set_config({"p": {"tracked_opt": 1, "perf_knob": 2}})
        lin = c.get_lineage("p")
        assert lin["config"] == {"tracked_opt": 1}

    def test_manual_data_lineage(self, ctx):
        ctx.inject_data("r", "extra", np.zeros(2))
        assert ctx.get_lineage("extra")["plugin_class"] == "ManualData"


class TestPreviewAndIntrospection:
    def test_preview_execution(self, ctx):
        prev = ctx.preview_execution("run1", "doubled")
        assert prev["plan"] == ["source", "doubled"]
        assert prev["will_compute"] == ["source", "doubled"]
        ctx.get_data("run1", "doubled")
        prev2 = ctx.preview_execution("run1", "doubled")
        assert prev2["will_compute"] == []

    def test_preview_execution_config_deltas(self, ctx):
        assert ctx.preview_execution("run1", "doubled")["config_deltas"] == {}
        ctx.set_config({"source.n": 5})
        deltas = ctx.preview_execution("run1", "doubled")["config_deltas"]
        assert deltas["source"]["n"] == {"value": 5, "source": "explicit"}

    def test_help(self, ctx):
        text = ctx.help()
        assert "source" in text and "doubled" in text
        detail = ctx.help("source")
        assert "n (default=10)" in detail

    def test_search_field(self, ctx):
        assert set(ctx.search_field("value")) == {"source", "doubled"}

    def test_quickstart(self, ctx):
        text = ctx.quickstart()
        assert "Quickstart" in text
        assert "get_data" in text
        assert "doubled" in text  # names the registered plugins


class TestCloneAndFactory:
    def test_clone_shares_storage(self, ctx):
        ctx.get_data("run1", "source")
        clone = ctx.clone()
        assert clone.storage is ctx.storage
        assert "doubled" in clone.plugins
        # fresh memory cache but disk hit
        out = clone.get_data("run1", "source")
        assert len(out) == 10

    def test_clone_kwarg_updates(self, ctx):
        clone = ctx.clone(some_key=5)
        assert clone.config["some_key"] == 5
        assert "some_key" not in ctx.config

    def test_clone_config_dict_is_updates(self, ctx):
        # clone(config={...}) mirrors Context(config=...); treating it as
        # a literal global key named "config" would silently change no
        # plugin's lineage — the footgun this pins.
        clone = ctx.clone(config={"some_key": 7}, other=1)
        assert clone.config["some_key"] == 7
        assert clone.config["other"] == 1
        assert "config" not in clone.config

    def test_clone_config_non_dict_raises(self, ctx):
        import pytest as _pytest

        with _pytest.raises(TypeError):
            ctx.clone(config=7)

    def test_factory_pickles(self, ctx):
        import pickle

        factory = ctx.create_context_factory()
        blob = pickle.dumps(factory)
        factory2 = pickle.loads(blob)
        new_ctx = factory2()
        assert "source" in new_ctx.plugins
        assert new_ctx.storage_dir == ctx.storage_dir


class TestErrorHandling:
    def test_failing_plugin_records_error(self, tmp_path):
        class Boom(Plugin):
            provides = "boom"

            def compute(self, context, run_id, **kwargs):
                raise RuntimeError("kapow")

        c = Context(storage_dir=str(tmp_path), config={"show_progress": False})
        c.register(Boom())
        with pytest.raises(RuntimeError):
            c.get_data("r", "boom")
        assert len(c.error_manager.records) == 1
        assert c.error_manager.records[0].plugin_name == "boom"

    def test_cleanup_always_called(self, tmp_path):
        calls = []

        class WithCleanup(Plugin):
            provides = "wc"

            def compute(self, context, run_id, **kwargs):
                raise RuntimeError("x")

            def cleanup(self, context):
                calls.append("cleanup")

        c = Context(storage_dir=str(tmp_path), config={"show_progress": False})
        c.register(WithCleanup())
        with pytest.raises(RuntimeError):
            c.get_data("r", "wc")
        assert calls == ["cleanup"]

    def test_flat_channel_contract(self, tmp_path):
        class BadFeatures(Plugin):
            provides = "basic_features"

            def compute(self, context, run_id, **kwargs):
                return [np.zeros(2), np.zeros(2)]  # list, not flat

        c = Context(storage_dir=str(tmp_path), config={"show_progress": False})
        c.register(BadFeatures())
        with pytest.raises(Exception, match="flat"):
            c.get_data("r", "basic_features")
