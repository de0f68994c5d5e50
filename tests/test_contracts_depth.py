"""Contract depth suite (reference analogs: tests/contracts/
test_cache_consistency.py, test_compat_deprecation.py,
test_plugin_contracts.py, test_golden_path.py).

Covers the behaviors the slimmer test_contracts.py does not: cache-key
generation invariants, lineage/version interaction (incl. transitive
invalidation), tracked-vs-untracked option hashing, hit/miss recompute
counting, watched-file signatures, deprecation expiry (raises once the
package version passes removed_in), the CompatManager introspection API,
and register-time spec rejection.
"""

import re
import time
import warnings

import numpy as np
import pytest

from waveformanalysis_tpu.config.compat import (
    CompatManager,
    DeprecationInfo,
    compare_versions,
    get_current_version,
)
from waveformanalysis_tpu.config.option import Option
from waveformanalysis_tpu.context.context import Context
from waveformanalysis_tpu.plugins.base import Plugin
from waveformanalysis_tpu.storage.function_cache import (
    CacheManager,
    file_signature,
)


def _ctx(tmp_path, sub="store"):
    d = tmp_path / sub
    return Context(storage_dir=str(d), config={"show_progress": False})


def _make_plugin(provides="depth_data", version="1.0.0", deps=(),
                 options=None, body=None):
    """Build a fresh Plugin subclass (fresh class => fresh lineage hash)."""
    return type(
        f"Depth_{provides}",
        (Plugin,),
        {
            "provides": provides,
            "version": version,
            "depends_on": list(deps),
            "options": dict(options or {}),
            "save_when": "always",
            "compute": body or (
                lambda self, context, run_id, **kw: np.arange(4.0)),
        },
    )


class TestCacheKeyGeneration:
    """reference analog: test_cache_consistency.py::TestCacheKeyGeneration"""

    def test_same_inputs_same_key(self, tmp_path):
        ctx = _ctx(tmp_path)
        ctx.register(_make_plugin()())
        assert ctx.key_for("run_a", "depth_data") == ctx.key_for(
            "run_a", "depth_data")

    def test_different_run_different_key(self, tmp_path):
        ctx = _ctx(tmp_path)
        ctx.register(_make_plugin()())
        assert ctx.key_for("run_a", "depth_data") != ctx.key_for(
            "run_b", "depth_data")

    def test_different_config_different_key(self, tmp_path):
        ctx = _ctx(tmp_path)
        ctx.register(_make_plugin(
            options={"gain": Option(default=1.0, type=float)})())
        k1 = ctx.key_for("r", "depth_data")
        ctx.set_config({"depth_data": {"gain": 2.0}})
        assert ctx.key_for("r", "depth_data") != k1

    def test_different_version_different_key(self, tmp_path):
        c1, c2 = _ctx(tmp_path, "a"), _ctx(tmp_path, "b")
        c1.register(_make_plugin(version="1.0.0")())
        c2.register(_make_plugin(version="1.0.1")())
        assert c1.key_for("r", "depth_data") != c2.key_for("r", "depth_data")

    def test_key_is_deterministic_across_contexts(self, tmp_path):
        c1, c2 = _ctx(tmp_path, "a"), _ctx(tmp_path, "b")
        c1.register(_make_plugin()())
        c2.register(_make_plugin()())
        assert c1.key_for("r", "depth_data") == c2.key_for("r", "depth_data")

    def test_key_format_is_hex_digest(self, tmp_path):
        ctx = _ctx(tmp_path)
        ctx.register(_make_plugin()())
        key = ctx.key_for("r", "depth_data")
        assert re.fullmatch(r"[0-9a-f]{8,40}", key.split("-")[-1]) or \
            re.search(r"[0-9a-f]{8,}", key)


class TestLineageHash:
    """reference analog: test_cache_consistency.py::TestLineageHash"""

    def test_lineage_includes_version(self, tmp_path):
        ctx = _ctx(tmp_path)
        ctx.register(_make_plugin(version="3.1.4")())
        lineage = ctx.get_lineage("depth_data")
        assert "3.1.4" in str(lineage)

    def test_transitive_version_change_changes_downstream_key(self, tmp_path):
        def mk(version):
            up = _make_plugin(provides="depth_up", version=version)

            def body(self, context, run_id, **kw):
                return np.asarray(context.get_data(run_id, "depth_up")) * 2

            down = _make_plugin(provides="depth_down", deps=["depth_up"],
                                body=body)
            return up, down

        c1, c2 = _ctx(tmp_path, "a"), _ctx(tmp_path, "b")
        u1, d1 = mk("1.0.0")
        u2, d2 = mk("2.0.0")
        c1.register(u1(), d1())
        c2.register(u2(), d2())
        assert c1.key_for("r", "depth_down") != c2.key_for("r", "depth_down")

    def test_same_version_same_lineage(self, tmp_path):
        c1, c2 = _ctx(tmp_path, "a"), _ctx(tmp_path, "b")
        c1.register(_make_plugin()())
        c2.register(_make_plugin()())
        assert c1.get_lineage("depth_data") == c2.get_lineage("depth_data")


class TestConfigChangeInvalidatesCache:
    """reference analog: test_cache_consistency.py::TestConfigChangeInvalidatesCache"""

    def _counting(self, counter, track=True):
        opts = {"gain": Option(default=1.0, type=float, track=track)}

        def body(self, context, run_id, **kw):
            counter["n"] += 1
            return np.full(3, context.get_config("depth_data", "gain"))

        return _make_plugin(options=opts, body=body)

    def test_default_config_cache_hit(self, tmp_path):
        counter = {"n": 0}
        ctx = _ctx(tmp_path)
        ctx.register(self._counting(counter)())
        ctx.get_data("r", "depth_data")
        ctx.get_data("r", "depth_data")
        assert counter["n"] == 1

    def test_changed_config_cache_miss(self, tmp_path):
        counter = {"n": 0}
        ctx = _ctx(tmp_path)
        ctx.register(self._counting(counter)())
        ctx.get_data("r", "depth_data")
        ctx.set_config({"depth_data": {"gain": 5.0}})
        out = ctx.get_data("r", "depth_data")
        assert counter["n"] == 2
        np.testing.assert_allclose(np.asarray(out), 5.0)

    def test_untracked_config_no_cache_miss(self, tmp_path):
        counter = {"n": 0}
        ctx = _ctx(tmp_path)
        ctx.register(self._counting(counter, track=False)())
        k1 = ctx.key_for("r", "depth_data")
        ctx.get_data("r", "depth_data")
        ctx.set_config({"depth_data": {"gain": 9.0}})
        assert ctx.key_for("r", "depth_data") == k1
        ctx.get_data("r", "depth_data")
        assert counter["n"] == 1  # untracked change does not recompute


class TestCacheHitMissBehavior:
    """reference analog: test_cache_consistency.py::TestCacheHitMissBehavior"""

    def test_cache_hit_no_recompute_and_new_run_recomputes(self, tmp_path):
        counter = {"n": 0}

        def body(self, context, run_id, **kw):
            counter["n"] += 1
            return np.arange(2.0)

        ctx = _ctx(tmp_path)
        ctx.register(_make_plugin(body=body)())
        ctx.get_data("run_001", "depth_data")
        ctx.get_data("run_001", "depth_data")
        assert counter["n"] == 1
        ctx.get_data("run_002", "depth_data")
        assert counter["n"] == 2

    def test_cache_survives_new_context(self, tmp_path):
        counter = {"n": 0}

        def body(self, context, run_id, **kw):
            counter["n"] += 1
            return np.arange(5.0)

        ctx = _ctx(tmp_path)
        ctx.register(_make_plugin(body=body)())
        ctx.get_data("r", "depth_data")
        ctx.flush_saves()
        ctx2 = Context(storage_dir=str(tmp_path / "store"),
                       config={"show_progress": False})
        ctx2.register(_make_plugin(body=body)())
        out = ctx2.get_data("r", "depth_data")
        assert counter["n"] == 1
        np.testing.assert_allclose(np.asarray(out), np.arange(5.0))


class TestWatchSignature:
    """reference analog: test_cache_consistency.py::TestWatchSignature"""

    def test_signature_changes_with_file(self, tmp_path):
        f = tmp_path / "watched.csv"
        f.write_text("1,2,3")
        sig1 = file_signature(f)
        time.sleep(0.05)
        f.write_text("1,2,3,4,5,6,7,8,9,10")
        assert file_signature(f) != sig1

    def test_signature_stable_for_unchanged_file(self, tmp_path):
        f = tmp_path / "watched.csv"
        f.write_text("1,2,3")
        assert file_signature(f) == file_signature(f)

    def test_missing_file_signature(self, tmp_path):
        assert "missing" in file_signature(tmp_path / "nope.csv")

    def test_cached_function_invalidates_on_file_change(self, tmp_path):
        mgr = CacheManager(tmp_path / "fc")
        f = tmp_path / "input.txt"
        f.write_text("alpha")
        calls = {"n": 0}

        @mgr.cached(watch_files=[f])
        def load():
            calls["n"] += 1
            return f.read_text()

        assert load() == "alpha"
        assert load() == "alpha"
        assert calls["n"] == 1
        time.sleep(0.05)
        f.write_text("beta-longer")
        assert load() == "beta-longer"
        assert calls["n"] == 2


class TestDeprecationExpiry:
    """reference analog: test_compat_deprecation.py::TestDeprecationExpiry"""

    def test_expired_deprecation_raises(self):
        CompatManager.register_deprecation(DeprecationInfo(
            old_name="depth_expired", new_name="depth_new",
            deprecated_in="0.0.1", removed_in="0.0.2"))
        try:
            mgr = CompatManager()
            if compare_versions(get_current_version(), "0.0.2") >= 0:
                with pytest.raises(ValueError, match="depth_expired"):
                    mgr.warn_deprecation("depth_expired")
        finally:
            CompatManager._deprecations.pop("depth_expired", None)

    def test_future_deprecation_only_warns(self):
        CompatManager.register_deprecation(DeprecationInfo(
            old_name="depth_future", new_name="depth_new",
            deprecated_in="0.0.1", removed_in="99.0.0"))
        try:
            mgr = CompatManager()
            with warnings.catch_warnings(record=True) as rec:
                warnings.simplefilter("always")
                mgr.warn_deprecation("depth_future")
            assert any(issubclass(w.category, DeprecationWarning)
                       for w in rec)
        finally:
            CompatManager._deprecations.pop("depth_future", None)

    def test_warning_includes_migration_info(self):
        info = DeprecationInfo(old_name="old_x", new_name="new_x",
                               deprecated_in="1.0", removed_in="2.0")
        msg = info.get_warning_message()
        assert "old_x" in msg and "new_x" in msg and "2.0" in msg

    def test_custom_message_wins(self):
        info = DeprecationInfo(old_name="o", new_name="n",
                               deprecated_in="1.0", removed_in="2.0",
                               message="use the new thing")
        assert info.get_warning_message() == "use the new thing"

    def test_unknown_removed_in_never_raises(self):
        CompatManager.register_deprecation(DeprecationInfo(
            old_name="depth_unknown", new_name="n",
            deprecated_in="0.0.1", removed_in="?"))
        try:
            with warnings.catch_warnings(record=True):
                warnings.simplefilter("always")
                CompatManager().warn_deprecation("depth_unknown")
        finally:
            CompatManager._deprecations.pop("depth_unknown", None)


class TestCompatManagerAPI:
    """reference analog: test_compat_deprecation.py::TestCompatManagerAPI"""

    def setup_method(self):
        CompatManager.register_alias(
            "depth_old", "depth_canon", plugin_name="depth_plug",
            deprecated_in="0.0.1", removed_in="99.0.0")

    def teardown_method(self):
        CompatManager.unregister_alias("depth_old", "depth_plug")

    def test_resolve_alias_scoped_and_unknown(self):
        mgr = CompatManager()
        assert mgr.resolve_alias("depth_plug", "depth_old") == (
            "depth_canon", True)
        # other plugin scope does not see the alias
        assert mgr.resolve_alias("other_plug", "depth_old") == (
            "depth_old", False)
        assert mgr.resolve_alias("depth_plug", "unknown") == (
            "unknown", False)

    def test_get_aliases_for(self):
        mgr = CompatManager()
        assert "depth_old" in mgr.get_aliases_for("depth_plug", "depth_canon")
        assert mgr.get_aliases_for("other_plug", "depth_canon") == []

    def test_is_deprecated_and_info(self):
        mgr = CompatManager()
        assert mgr.is_deprecated("depth_old")
        info = mgr.get_deprecation_info("depth_old")
        assert info is not None and info.new_name == "depth_canon"
        assert not mgr.is_deprecated("depth_canon")
        assert mgr.get_deprecation_info("depth_canon") is None

    def test_list_aliases_and_deprecations(self):
        mgr = CompatManager()
        assert mgr.list_aliases("depth_plug")["depth_old"] == "depth_canon"
        assert "depth_old" not in mgr.list_aliases("other_plug")
        assert any(i.old_name == "depth_old"
                   for i in mgr.list_deprecations())

    def test_summary_renders(self):
        s = CompatManager().summary()
        assert "depth_old" in s and "depth_canon" in s

    def test_unregister_nonexistent_returns_false(self):
        assert CompatManager.unregister_alias("never_registered") is False

    def test_warns_once_per_scope(self):
        mgr = CompatManager()
        with warnings.catch_warnings(record=True) as rec:
            warnings.simplefilter("always")
            mgr.warn_deprecation("depth_old", "depth_plug")
            mgr.warn_deprecation("depth_old", "depth_plug")
        assert len([w for w in rec
                    if issubclass(w.category, DeprecationWarning)]) == 1


class TestRegistrationContracts:
    """reference analog: test_plugin_contracts.py::TestRegistrationWithSpec"""

    def test_register_non_plugin_rejected(self, tmp_path):
        ctx = _ctx(tmp_path)
        with pytest.raises(TypeError, match="not a Plugin"):
            ctx.register(object())

    def test_register_reserved_name_rejected(self, tmp_path):
        from waveformanalysis_tpu.context.context import RESERVED_DATA_NAMES

        if not RESERVED_DATA_NAMES:
            pytest.skip("no reserved names")
        reserved = sorted(RESERVED_DATA_NAMES)[0]
        ctx = _ctx(tmp_path)
        with pytest.raises(ValueError, match="reserved"):
            ctx.register(_make_plugin(provides=reserved)())

    def test_register_class_instantiates(self, tmp_path):
        ctx = _ctx(tmp_path)
        ctx.register(_make_plugin())  # class, not instance
        assert "depth_data" in ctx.plugins

    def test_reregister_replaces(self, tmp_path):
        ctx = _ctx(tmp_path)
        ctx.register(_make_plugin(version="1.0.0")())
        k1 = ctx.key_for("r", "depth_data")
        ctx.register(_make_plugin(version="1.0.1")())
        assert ctx.key_for("r", "depth_data") != k1

    def test_unregister(self, tmp_path):
        ctx = _ctx(tmp_path)
        ctx.register(_make_plugin()())
        assert ctx.unregister("depth_data") is True
        assert "depth_data" not in ctx.plugins
        assert ctx.unregister("depth_data") is False


class TestGoldenPathErrorHandling:
    """reference analog: test_golden_path.py::TestGoldenPathErrorHandling"""

    def test_missing_dependency_error(self, tmp_path):
        ctx = _ctx(tmp_path)
        ctx.register(_make_plugin(provides="needs_up",
                                  deps=["depth_never_registered"])())
        with pytest.raises(Exception, match="depth_never_registered"):
            ctx.get_data("r", "needs_up")

    def test_compute_error_propagates_with_plugin_name(self, tmp_path):
        def body(self, context, run_id, **kw):
            raise RuntimeError("boom in depth_data")

        ctx = _ctx(tmp_path)
        ctx.register(_make_plugin(body=body)())
        with pytest.raises(Exception, match="boom"):
            ctx.get_data("r", "depth_data")
        # a failed compute must not poison the cache
        assert not ctx.is_cache_hit("r", "depth_data")
