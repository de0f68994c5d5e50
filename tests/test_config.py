"""Config system tests: Option validation, resolver precedence, compat aliases."""

import warnings

import pytest

from waveformanalysis_tpu.config import (
    AdapterInfo,
    CompatManager,
    ConfigResolver,
    ConfigSource,
    Option,
    option,
    takes_config,
)


class FakePlugin:
    provides = "myplug"
    options = {
        "threshold": Option(default=10.0, type=float, min_value=0.0),
        "mode": Option(default="auto", type=str, choices=["auto", "manual"]),
        "dt": Option(default=None, type=int),
        "window_ns": Option(default=100.0, type=float, unit="ns", internal_unit="ps"),
    }


@pytest.fixture
def plugin():
    return FakePlugin()


@pytest.fixture
def adapter_info():
    return AdapterInfo(
        name="fake_daq",
        sampling_rate_hz=500e6,
        timestamp_unit="ps",
        raw_timestamp_mode="unit",
        dt_ns=2,
        dt_ps=2000,
    )


class TestOption:
    def test_type_coercion(self):
        opt = Option(default=1, type=int)
        assert opt.validate_value("x", "5") == 5
        opt_b = Option(default=False, type=bool)
        assert opt_b.validate_value("x", "yes") is True
        assert opt_b.validate_value("x", "false") is False

    def test_type_rejection(self):
        opt = Option(default=1, type=int)
        with pytest.raises(TypeError):
            opt.validate_value("x", "not_a_number")

    def test_choices_and_range(self):
        opt = Option(default="a", choices=["a", "b"])
        with pytest.raises(ValueError):
            opt.validate_value("x", "c")
        rng = Option(default=1.0, type=float, min_value=0.0, max_value=10.0)
        with pytest.raises(ValueError):
            rng.validate_value("x", -1.0)
        with pytest.raises(ValueError):
            rng.validate_value("x", 11.0)

    def test_unit_conversion(self):
        opt = Option(default=1.0, type=float, unit="ns", internal_unit="ps")
        assert opt.validate_value("x", 2.0) == 2000.0

    def test_none_passthrough(self):
        opt = Option(default=None, type=int)
        assert opt.validate_value("x", None) is None

    def test_deprecated_warns(self):
        opt = Option(default=1, deprecated=True, deprecated_message="use new_x")
        with warnings.catch_warnings(record=True) as rec:
            warnings.simplefilter("always")
            opt.validate_value("x", 2)
        assert any("deprecated" in str(w.message) for w in rec)

    def test_custom_validator(self):
        opt = Option(default=2, type=int, validate=lambda v: v % 2 == 0)
        assert opt.validate_value("x", 4) == 4
        with pytest.raises(ValueError):
            opt.validate_value("x", 3)

    def test_decorators(self):
        @option("alpha", default=1)
        @takes_config({"beta": Option(default=2)})
        class P:
            options = {}

        assert P.options["alpha"].default == 1
        assert P.options["beta"].default == 2


class TestResolverPrecedence:
    def test_plugin_scoped_beats_dotted_beats_global(self, plugin):
        r = ConfigResolver()
        config = {
            "threshold": 1.0,
            "myplug.threshold": 2.0,
            "myplug": {"threshold": 3.0},
        }
        resolved = r.resolve(plugin, config)
        assert resolved["threshold"] == 3.0
        assert resolved.get_value("threshold").source == ConfigSource.EXPLICIT

        resolved2 = r.resolve(plugin, {"threshold": 1.0, "myplug.threshold": 2.0})
        assert resolved2["threshold"] == 2.0

        resolved3 = r.resolve(plugin, {"threshold": 1.0})
        assert resolved3["threshold"] == 1.0

    def test_explicit_beats_adapter(self, plugin, adapter_info):
        r = ConfigResolver()
        resolved = r.resolve(plugin, {"dt": 7}, adapter_info=adapter_info)
        assert resolved["dt"] == 7

    def test_adapter_beats_default(self, plugin, adapter_info):
        r = ConfigResolver()
        resolved = r.resolve(plugin, {}, adapter_info=adapter_info)
        assert resolved["dt"] == 2  # dt_ns from adapter
        cv = resolved.get_value("dt")
        assert cv.source == ConfigSource.ADAPTER_INFERRED
        assert cv.inferred_from == "fake_daq.dt"

    def test_default_when_nothing_set(self, plugin):
        r = ConfigResolver()
        resolved = r.resolve(plugin, {})
        assert resolved["threshold"] == 10.0
        assert resolved.get_value("threshold").source == ConfigSource.PLUGIN_DEFAULT

    def test_unit_conversion_applies_to_explicit(self, plugin):
        r = ConfigResolver()
        resolved = r.resolve(plugin, {"window_ns": 5.0})
        assert resolved["window_ns"] == 5000.0  # ns -> ps

    def test_lineage_dict_filters_defaults(self, plugin, adapter_info):
        r = ConfigResolver()
        resolved = r.resolve(plugin, {"threshold": 5.0}, adapter_info=adapter_info)
        lineage = resolved.to_lineage_dict()
        assert "threshold" in lineage  # explicit
        assert "dt" in lineage  # inferred
        assert "mode" not in lineage  # default

    def test_resolve_single_value(self, plugin):
        r = ConfigResolver()
        cv = r.resolve_value(plugin, "mode", {"mode": "manual"})
        assert cv.value == "manual"
        with pytest.raises(KeyError):
            r.resolve_value(plugin, "nonexistent", {})


class TestCompat:
    def test_alias_resolution(self, plugin):
        CompatManager.register_alias(
            "old_threshold", "threshold", plugin_name="myplug",
            deprecated_in="1.0", removed_in="2.0",
        )
        try:
            cm = CompatManager()
            r = ConfigResolver(compat_manager=cm)
            with warnings.catch_warnings(record=True) as rec:
                warnings.simplefilter("always")
                resolved = r.resolve(plugin, {"old_threshold": 42.0})
            assert resolved["threshold"] == 42.0
            assert any("deprecated" in str(w.message).lower() for w in rec)
        finally:
            CompatManager.unregister_alias("old_threshold", "myplug")

    def test_option_level_alias(self):
        class P:
            provides = "p"
            options = {"new_key": Option(default=0, type=int, alias="legacy_key")}

        r = ConfigResolver()
        resolved = r.resolve(P(), {"legacy_key": 9})
        assert resolved["new_key"] == 9
