"""Plugin-behavior depth: dual baseline, df fallbacks/gains, preview dry-run.

Mirrors three reference suites over the corresponding subsystems:
- tests/test_dual_baseline.py (record dtype carries baseline AND
  baseline_upstream; the structurer fills/NaNs/guards the upstream column);
- tests/test_dataframe_plugin.py (gain column gating, partial maps, invalid
  keys, run-config fallback, explicit override, dependency shape);
- tests/test_context_core_preview.py (preview_execution plan/cache-status/
  errors + visualization smoke).
"""

import json

import numpy as np
import pytest

from waveformanalysis_tpu.context.context import Context
from waveformanalysis_tpu.dtypes.schema import (
    RECORDS_SCHEMA,
    ST_WAVEFORM_SCHEMA,
    create_record_dtype,
)
from waveformanalysis_tpu.plugins.builtin.basic_features import BasicFeaturesPlugin
from waveformanalysis_tpu.plugins.builtin.dataframe import DataFramePlugin
from waveformanalysis_tpu.plugins.builtin.waveforms import structure_channel_array
from waveformanalysis_tpu.formats.vx2730 import VX2730_SPEC
from waveformanalysis_tpu.testing.fixtures import make_fake_st_waveforms


# ---------------------------------------------------------------------------
# dual baseline
# ---------------------------------------------------------------------------

class TestDualBaseline:
    def test_record_dtype_has_both_baselines(self):
        dtype = create_record_dtype(64)
        assert "baseline" in dtype.names
        assert "baseline_upstream" in dtype.names

    def test_schemas_have_both_baselines(self):
        for schema in (ST_WAVEFORM_SCHEMA, RECORDS_SCHEMA):
            names = [f.name for f in schema.fields]
            assert "baseline" in names and "baseline_upstream" in names

    def _raw(self, n=6, n_samples=40, baseline=1000):
        cols = VX2730_SPEC.columns
        width = cols.samples_start + n_samples
        raw = np.zeros((n, width))
        raw[:, cols.board] = 0
        raw[:, cols.channel] = 3
        raw[:, cols.timestamp] = np.arange(n) * 1000
        raw[:, cols.samples_start:] = baseline
        return raw

    def test_without_upstream_baseline(self):
        out = structure_channel_array(
            self._raw(), VX2730_SPEC, dt_ns=2, wave_length=40
        )
        assert np.all(np.isnan(out["baseline_upstream"]))
        np.testing.assert_allclose(out["baseline"], 1000.0)

    def test_with_upstream_baseline(self):
        up = np.linspace(990, 995, 6)
        out = structure_channel_array(
            self._raw(), VX2730_SPEC, dt_ns=2, wave_length=40,
            upstream_baseline=up,
        )
        np.testing.assert_allclose(out["baseline_upstream"], up)
        # computed baseline is INDEPENDENT of the upstream one
        np.testing.assert_allclose(out["baseline"], 1000.0)

    def test_upstream_length_mismatch_ignored(self):
        out = structure_channel_array(
            self._raw(n=6), VX2730_SPEC, dt_ns=2, wave_length=40,
            upstream_baseline=np.ones(4),
        )
        assert np.all(np.isnan(out["baseline_upstream"]))

    def test_channel_mapping_lut(self):
        out = structure_channel_array(
            self._raw(), VX2730_SPEC, dt_ns=2, wave_length=40,
            channel_mapping={(0, 3): 7},
        )
        assert np.all(out["channel"] == 7)


# ---------------------------------------------------------------------------
# DataFrame plugin
# ---------------------------------------------------------------------------

@pytest.fixture()
def df_ctx(tmp_path):
    ctx = Context(storage_dir=str(tmp_path), config={"show_progress": False})
    ctx.register(BasicFeaturesPlugin(), DataFramePlugin())
    st = make_fake_st_waveforms(n_events=16, pulse_height=300,
                                polarity="positive")
    st["channel"] = (np.arange(16) % 2).astype(np.int16)
    ctx.inject_data("r", "st_waveforms", st)
    return ctx


class TestDataFramePlugin:
    def test_no_gain_columns_by_default(self, df_ctx):
        df = df_ctx.get_data("r", "df")
        assert "area_pe" not in df.columns and "height_pe" not in df.columns
        df_ctx.flush_saves()

    def test_partial_gain_map_nans_unmapped(self, df_ctx):
        df_ctx.set_config({"df": {"gain_adc_per_pe": {"0:0": 10.0}}})
        df = df_ctx.get_data("r", "df")
        ch = df["channel"].to_numpy()
        assert np.all(np.isfinite(df["area_pe"].to_numpy()[ch == 0]))
        assert np.all(np.isnan(df["area_pe"].to_numpy()[ch == 1]))
        df_ctx.flush_saves()

    def test_invalid_gain_key_warns_and_skips(self, df_ctx, caplog):
        df_ctx.set_config({"df": {"gain_adc_per_pe":
                                  {"not-a-key": 5.0, "0:1": 10.0}}})
        with caplog.at_level("WARNING"):
            df = df_ctx.get_data("r", "df")
        assert any("invalid channel key" in r.message for r in caplog.records)
        ch = df["channel"].to_numpy()
        assert np.all(np.isfinite(df["area_pe"].to_numpy()[ch == 1]))
        df_ctx.flush_saves()

    def test_non_positive_gain_nans_channel(self, df_ctx, caplog):
        df_ctx.set_config({"df": {"gain_adc_per_pe": {"0:0": -3.0,
                                                      "0:1": 10.0}}})
        with caplog.at_level("WARNING"):
            df = df_ctx.get_data("r", "df")
        ch = df["channel"].to_numpy()
        assert np.all(np.isnan(df["area_pe"].to_numpy()[ch == 0]))
        df_ctx.flush_saves()

    def test_explicit_gain_overrides_run_config(self, tmp_path):
        daq = tmp_path / "daq"
        (daq / "r").mkdir(parents=True)
        (daq / "r" / "run_config.json").write_text(json.dumps({
            "calibration": {"gain_adc_per_pe": {"0:0": 5.0, "0:1": 5.0}},
        }))
        ctx = Context(storage_dir=str(tmp_path / "store"),
                      config={"show_progress": False, "data_root": str(daq)})
        ctx.register(BasicFeaturesPlugin(), DataFramePlugin())
        st = make_fake_st_waveforms(n_events=8, pulse_height=300,
                                    polarity="positive")
        st["channel"] = (np.arange(8) % 2).astype(np.int16)
        ctx.inject_data("r", "st_waveforms", st)
        ctx.set_config({"df": {"gain_adc_per_pe": {"0:0": 10.0,
                                                   "0:1": 10.0}}})
        df = ctx.get_data("r", "df")
        np.testing.assert_allclose(df["area_pe"], df["area"] / 10.0)
        ctx.flush_saves()

    def test_df_depends_on_wave_source_and_features(self, df_ctx):
        plugin = df_ctx.get_plugin("df")
        deps = plugin.resolve_depends_on(df_ctx, "r")
        assert "basic_features" in deps

    def test_empty_input_gives_empty_df(self, tmp_path):
        ctx = Context(storage_dir=str(tmp_path),
                      config={"show_progress": False})
        ctx.register(BasicFeaturesPlugin(), DataFramePlugin())
        ctx.inject_data("r", "st_waveforms",
                        make_fake_st_waveforms(n_events=1)[:0])
        df = ctx.get_data("r", "df")
        assert len(df) == 0
        ctx.flush_saves()


# ---------------------------------------------------------------------------
# preview_execution
# ---------------------------------------------------------------------------

class TestPreviewExecution:
    def test_basic_plan_and_needed(self, df_ctx):
        info = df_ctx.preview_execution("r", "df")
        assert info["plan"][-1] == "df"
        assert "basic_features" in info["plan"]
        assert set(info["needed"]) >= {"basic_features", "df"}
        assert all(v == "miss" for k, v in info["cache_status"].items()
                   if k in ("basic_features", "df"))

    def test_cache_status_after_compute(self, df_ctx):
        df_ctx.get_data("r", "df")
        info = df_ctx.preview_execution("r", "df")
        assert info["cache_status"]["df"] in ("memory", "disk")
        assert info["needed"] == [] or "df" not in info["needed"]
        df_ctx.flush_saves()

    def test_invalid_data_name_raises(self, df_ctx):
        with pytest.raises(Exception):
            df_ctx.preview_execution("r", "definitely_not_registered")

    def test_preview_does_not_compute(self, df_ctx):
        df_ctx.preview_execution("r", "df")
        assert df_ctx._results.get(("r", "df")) is None

    def test_config_deltas_reported(self, df_ctx):
        df_ctx.set_config({"df": {"gain_adc_per_pe": {"0:0": 10.0}}})
        info = df_ctx.preview_execution("r", "df")
        deltas = info.get("config_deltas", {}).get("df", {})
        assert "gain_adc_per_pe" in deltas

    def test_visualization_smoke(self, df_ctx):
        import matplotlib

        matplotlib.use("Agg", force=True)
        ax = df_ctx.plot_lineage("df")
        assert ax is not None
