"""Strax compatibility layer: plugin wrapping, dtype conversion, facade.

Behavioral analog of the reference strax-compat coverage
(reference: core/plugins/core/adapters.py:29-440): strax-style plugin
classes wrap into native plugins, dtypes convert both ways losslessly, and
the context facade serves strax idioms (get_array / get_df / search_field).
"""

import numpy as np
import pytest

from waveformanalysis_tpu.context.context import Context
from waveformanalysis_tpu.plugins.adapters import (
    StraxContextAdapter,
    StraxPluginAdapter,
    convert_dtype_from_strax,
    convert_dtype_to_strax,
    convert_strax_options,
    wrap_strax_plugin,
)
from waveformanalysis_tpu.plugins.base import Plugin


class FakeStraxOption:
    """Minimal strax.Option look-alike."""

    def __init__(self, name, default=None, help="", type=None):
        self.name = name
        self.default = default
        self.help = help
        self.type = type


class FakeStraxPlugin:
    """Minimal strax.Plugin look-alike (duck-typed attributes)."""

    provides = "strax_peaks"
    depends_on = ("strax_records",)
    data_kind = "peaks"
    __version__ = "2.1.0"
    save_when = 3  # strax SaveWhen.ALWAYS
    dtype = [("time", np.int64), ("area", np.float32), ("channel", np.int16)]
    takes_config = {
        "threshold": FakeStraxOption("threshold", default=5.0,
                                     help="cut", type=float),
    }

    def compute(self, records):
        n = len(records)
        out = np.zeros(n, dtype=self.dtype)
        out["time"] = records["time"]
        out["area"] = records["amp"] * 2.0
        out["channel"] = records["channel"]
        return out


class RecordsSource(Plugin):
    provides = "strax_records"
    save_when = "never"

    def compute(self, context, run_id, **kwargs):
        n = 8
        out = np.zeros(n, dtype=[("time", np.int64), ("amp", np.float32),
                                 ("channel", np.int16)])
        out["time"] = np.arange(n) * 10
        out["amp"] = np.arange(n, dtype=np.float32)
        out["channel"] = np.arange(n) % 2
        return out


class TestDtypeConversion:
    def test_round_trip(self):
        dt = np.dtype([("time", "<i8"), ("area", "<f4"), ("tag", "U4")])
        descr = convert_dtype_to_strax(dt)
        back = convert_dtype_from_strax(descr)
        assert back == dt

    def test_strax_tuple_titles_accepted(self):
        # strax uses (('doc', 'name'), dtype) title pairs
        descr = [(("Peak time", "time"), np.int64),
                 (("Peak area", "area"), np.float32)]
        dt = convert_dtype_from_strax(descr)
        assert dt.names == ("time", "area")
        assert dt["time"] == np.int64

    def test_options_convert(self):
        opts = convert_strax_options(FakeStraxPlugin)
        assert "threshold" in opts
        assert opts["threshold"].default == 5.0


class TestPluginWrapping:
    def test_wrap_class_and_instance(self):
        for source in (FakeStraxPlugin, FakeStraxPlugin()):
            adapted = wrap_strax_plugin(source)
            assert isinstance(adapted, StraxPluginAdapter)
            assert adapted.provides == "strax_peaks"
            assert list(adapted.depends_on) == ["strax_records"]
            assert adapted.version == "2.1.0"
            assert "threshold" in adapted.options

    def test_wrapped_plugin_computes_through_context(self, tmp_path):
        ctx = Context(storage_dir=str(tmp_path),
                      config={"show_progress": False})
        ctx.register(RecordsSource(), wrap_strax_plugin(FakeStraxPlugin))
        out = ctx.get_data("r", "strax_peaks")
        arr = np.asarray(out) if not hasattr(out, "columns") else out
        assert len(arr) == 8
        np.testing.assert_allclose(
            np.asarray(arr["area"]), np.arange(8, dtype=np.float32) * 2.0
        )

    def test_wrapped_plugin_lineage_contains_version(self, tmp_path):
        ctx = Context(storage_dir=str(tmp_path),
                      config={"show_progress": False})
        ctx.register(RecordsSource(), wrap_strax_plugin(FakeStraxPlugin))
        lineage = ctx.get_lineage("strax_peaks")
        assert "2.1.0" in str(lineage)


class TestContextFacade:
    @pytest.fixture
    def facade(self, tmp_path):
        ctx = Context(storage_dir=str(tmp_path),
                      config={"show_progress": False})
        ctx.register(RecordsSource(), wrap_strax_plugin(FakeStraxPlugin))
        return StraxContextAdapter(ctx)

    def test_get_array(self, facade):
        arr = facade.get_array("r", "strax_peaks")
        assert isinstance(arr, np.ndarray)
        assert arr.dtype.names == ("time", "area", "channel")

    def test_get_df(self, facade):
        df = facade.get_df("r", "strax_peaks")
        assert list(df.columns) == ["time", "area", "channel"]
        assert len(df) == 8

    def test_search_field(self, facade):
        hits = facade.search_field("area")
        assert "area" in hits.get("strax_peaks", [])
        assert facade.search_field("nonexistent_xyz") == {}

    def test_key_for_delegates(self, facade):
        key = facade.key_for("r", "strax_peaks")
        assert key.startswith("r-strax_peaks-")
