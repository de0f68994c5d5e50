"""Option validation matrix (reference analog: base.py:38-275 Option +
core/config/tests/test_config.py): type coercion, choices, numeric ranges,
unit auto-conversion, custom validators, deprecation warnings, track flag
interaction with lineage, and the @option / @takes_config decorators.
"""

import warnings

import numpy as np
import pytest

from waveformanalysis_tpu.config.option import Option, option, takes_config
from waveformanalysis_tpu.dtypes.table import Table
from waveformanalysis_tpu.plugins.base import Plugin
from waveformanalysis_tpu.testing.fixtures import make_tiny_context


def _probe(opts):
    class P(Plugin):
        provides = "opt_probe"
        depends_on = []
        save_when = "never"
        options = opts

        def compute(self, context, run_id, **kwargs):
            return Table({"x": np.arange(1)})

    return P()


class TestValidation:
    def test_type_check(self, tmp_path):
        ctx = make_tiny_context(tmp_path)
        ctx.register(_probe({"k": Option(default=1, type=int)}))
        ctx.set_config({"opt_probe": {"k": "not-an-int"}})
        with pytest.raises(Exception):
            ctx.get_data("test_run", "opt_probe")

    def test_choices_enforced(self, tmp_path):
        ctx = make_tiny_context(tmp_path)
        ctx.register(_probe({"mode": Option(default="a", type=str,
                                            choices=["a", "b"])}))
        ctx.set_config({"opt_probe": {"mode": "z"}})
        with pytest.raises(Exception, match="must be one of"):
            ctx.get_data("test_run", "opt_probe")

    def test_numeric_range(self, tmp_path):
        ctx = make_tiny_context(tmp_path)
        ctx.register(_probe({"v": Option(default=1.0, type=float,
                                         min_value=0.0, max_value=10.0)}))
        ctx.set_config({"opt_probe": {"v": 11.0}})
        with pytest.raises(Exception):
            ctx.get_data("test_run", "opt_probe")
        ctx.set_config({"opt_probe": {"v": 10.0}})
        ctx.get_data("test_run", "opt_probe")  # boundary value passes

    def test_custom_validator(self, tmp_path):
        ctx = make_tiny_context(tmp_path)
        ctx.register(_probe({"even": Option(
            default=2, type=int, validate=lambda v: v % 2 == 0,
        )}))
        ctx.set_config({"opt_probe": {"even": 3}})
        with pytest.raises(Exception):
            ctx.get_data("test_run", "opt_probe")

    def test_unit_conversion(self, tmp_path):
        ctx = make_tiny_context(tmp_path)
        probe = _probe({"window": Option(
            default=100.0, type=float, unit="ns", internal_unit="ps",
        )})
        ctx.register(probe)
        # user sets ns; the plugin reads ps
        ctx.set_config({"opt_probe": {"window": 2.0}})
        assert ctx.get_config(probe, "window") == 2000.0

    def test_default_also_converted(self, tmp_path):
        ctx = make_tiny_context(tmp_path)
        probe = _probe({"window": Option(
            default=1.0, type=float, unit="ns", internal_unit="ps",
        )})
        ctx.register(probe)
        assert ctx.get_config(probe, "window") == 1000.0


class TestDeprecationAndTracking:
    def test_deprecated_option_warns(self, tmp_path):
        ctx = make_tiny_context(tmp_path)
        probe = _probe({"old_knob": Option(
            default=1, type=int, deprecated=True,
            deprecated_message="use new_knob",
        )})
        ctx.register(probe)
        ctx.set_config({"opt_probe": {"old_knob": 5}})
        with warnings.catch_warnings(record=True) as rec:
            warnings.simplefilter("always")
            ctx.get_config(probe, "old_knob")
        assert any("new_knob" in str(w.message) for w in rec)

    def test_untracked_option_not_in_lineage(self, tmp_path):
        ctx = make_tiny_context(tmp_path)
        ctx.register(_probe({
            "tracked": Option(default=1, type=int),
            "perf_knob": Option(default=2, type=int, track=False),
        }))
        lineage = ctx.get_lineage("opt_probe")
        assert "tracked" in lineage["config"]
        assert "perf_knob" not in lineage["config"]


class TestDecorators:
    def test_takes_config_decorator(self, tmp_path):
        @takes_config({
            "alpha": Option(default=1.5, type=float),
            "beta": Option(default="x", type=str),
        })
        @option("gamma", default=7, type=int)
        class Decorated(Plugin):
            provides = "decorated"
            depends_on = []
            save_when = "never"

            def compute(self, context, run_id, **kwargs):
                return Table({
                    "a": np.asarray([context.get_config(self, "alpha")]),
                })

        ctx = make_tiny_context(tmp_path)
        ctx.register(Decorated())
        out = ctx.get_data("test_run", "decorated")
        assert float(np.asarray(out["a"])[0]) == 1.5

    def test_option_inheritance_merge(self, tmp_path):
        class Base(Plugin):
            provides = "base_x"
            depends_on = []
            save_when = "never"
            options = {"a": Option(default=1, type=int)}

            def compute(self, context, run_id, **kwargs):
                return None

        class Child(Base):
            provides = "child_x"
            options = {"b": Option(default=2, type=int)}

        child = Child()
        assert set(child.options) >= {"a", "b"}
        # child override replaces the parent's option object
        class Child2(Base):
            provides = "child2_x"
            options = {"a": Option(default=99, type=int)}

        ctx = make_tiny_context(tmp_path)
        c2 = Child2()
        ctx.register(c2)
        assert ctx.get_config(c2, "a") == 99
