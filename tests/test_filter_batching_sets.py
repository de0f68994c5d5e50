"""Filter batching invariances + plugin-set registry shape.

Mirrors the reference suites
(reference: tests/plugins/test_filtered_waveforms_batching.py,
tests/plugins/test_plugin_set_peaks_compat.py): batch_size / max_workers
are pure execution knobs (outputs identical and lineage unchanged), SG on
too-short waves degrades gracefully, outputs are float32 with metadata
preserved, and the plugin-set registry exposes the reference's named sets.
"""

import numpy as np
import pytest

from waveformanalysis_tpu.context.context import Context
from waveformanalysis_tpu.plugins.builtin.filtering import FilteredWaveformsPlugin
from waveformanalysis_tpu.plugins.plugin_sets import (
    PLUGIN_SETS,
    get_plugin_set,
    get_profile,
)
from waveformanalysis_tpu.testing.fixtures import make_fake_st_waveforms


def _ctx(tmp_path, sub, cfg=None):
    ctx = Context(storage_dir=str(tmp_path / sub),
                  config={"show_progress": False})
    ctx.register(FilteredWaveformsPlugin())
    base = {"filtered_waveforms": {"filter_type": "BW", "filter_order": 2,
                                   "lowcut": 0.02, "highcut": 0.1}}
    if cfg:
        base["filtered_waveforms"].update(cfg)
    ctx.set_config(base)
    st = make_fake_st_waveforms(n_events=96, wave_length=128,
                                pulse_height=250, polarity="positive",
                                noise_rms=4.0, seed=8)
    st["channel"] = (np.arange(96) % 3).astype(np.int16)
    ctx.inject_data("r", "st_waveforms", st)
    return ctx


class TestFilterBatching:
    def test_batch_size_matches_whole_channel(self, tmp_path):
        whole = _ctx(tmp_path, "whole").get_data("r", "filtered_waveforms")
        batched = _ctx(tmp_path, "batched", {"batch_size": 7}).get_data(
            "r", "filtered_waveforms"
        )
        np.testing.assert_array_equal(
            np.asarray(whole["wave"]), np.asarray(batched["wave"])
        )

    def test_max_workers_matches_serial(self, tmp_path):
        serial = _ctx(tmp_path, "serial", {"max_workers": 1}).get_data(
            "r", "filtered_waveforms"
        )
        par = _ctx(tmp_path, "par", {"max_workers": 4,
                                     "batch_size": 16}).get_data(
            "r", "filtered_waveforms"
        )
        np.testing.assert_array_equal(
            np.asarray(serial["wave"]), np.asarray(par["wave"])
        )

    def test_execution_knobs_do_not_rotate_lineage(self, tmp_path):
        a = _ctx(tmp_path, "a")
        b = _ctx(tmp_path, "b", {"batch_size": 9, "max_workers": 2})
        assert a.key_for("r", "filtered_waveforms") == \
            b.key_for("r", "filtered_waveforms")

    def test_output_float32_and_metadata_preserved(self, tmp_path):
        ctx = _ctx(tmp_path, "meta")
        st = ctx.get_data("r", "st_waveforms")
        out = ctx.get_data("r", "filtered_waveforms")
        assert np.asarray(out["wave"]).dtype == np.float32
        for col in ("timestamp", "board", "channel", "record_id",
                    "baseline", "event_length"):
            np.testing.assert_array_equal(
                np.asarray(st[col]), np.asarray(out[col]), err_msg=col
            )

    def test_sg_short_wave_degrades_gracefully(self, tmp_path):
        """SG window longer than the wave: output equals the input wave
        (reference: sg short-wave passthrough)."""
        ctx = Context(storage_dir=str(tmp_path / "sg"),
                      config={"show_progress": False})
        ctx.register(FilteredWaveformsPlugin())
        ctx.set_config({"filtered_waveforms": {
            "filter_type": "SG", "sg_window_size": 31, "sg_poly_order": 2,
        }})
        st = make_fake_st_waveforms(n_events=4, wave_length=8,
                                    pulse_height=100)
        ctx.inject_data("r", "st_waveforms", st)
        out = ctx.get_data("r", "filtered_waveforms")
        np.testing.assert_allclose(
            np.asarray(out["wave"]),
            np.asarray(st["wave"]).astype(np.float32),
        )


class TestPluginSetRegistry:
    def test_registry_contains_reference_keys(self):
        for key in ("io", "waveform", "records", "peaks", "basic_features",
                    "tabular", "events"):
            assert key in PLUGIN_SETS, key

    def test_peaks_set_provides_hits(self):
        provides = {p.provides for p in get_plugin_set("peaks")}
        assert "hit" in provides and "hit_threshold" in provides

    def test_waveform_set_includes_st_waveforms(self):
        provides = {p.provides for p in get_plugin_set("waveform")}
        assert "st_waveforms" in provides

    def test_records_set_includes_records(self):
        provides = {p.provides for p in get_plugin_set("records")}
        assert {"records", "wave_pool"} <= provides

    def test_default_profile_covers_the_dag(self):
        provides = {p.provides for p in get_profile("default")}
        for name in ("raw_files", "st_waveforms", "records", "hit",
                     "basic_features", "df", "df_events", "df_paired",
                     "s1_s2"):
            assert name in provides, name

    def test_unknown_set_and_profile_raise(self):
        with pytest.raises(KeyError):
            get_plugin_set("nope")
        with pytest.raises(KeyError):
            get_profile("nope")
