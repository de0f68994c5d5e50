"""Per-hardware-channel filter overrides (reference analog:
filtering.py:47 resolve_filter_config + per-channel batches at :339-408):
a channel can run a different filter family/parameters than the base
config, each batch matching its standalone single-channel application.
"""

import numpy as np
import pytest
from scipy.signal import savgol_filter

from waveformanalysis_tpu.plugins.builtin.filtering import (
    FilteredWaveformsPlugin,
    resolve_filter_config,
)
from waveformanalysis_tpu.testing.fixtures import (
    make_fake_st_waveforms,
    make_tiny_context,
)


def _two_channel_st(n=12, L=64):
    st = make_fake_st_waveforms(n_events=n, wave_length=L, pulse_height=200,
                                noise_rms=3.0, seed=3)
    st["channel"] = (np.arange(n) % 2).astype(np.int16)
    return st


class TestResolveFilterConfig:
    def test_base_sg_defaults(self, tmp_path):
        ctx = make_tiny_context(tmp_path)
        plugin = FilteredWaveformsPlugin()
        ctx.register(plugin)
        cfg = resolve_filter_config(ctx, plugin)
        assert cfg["filter_type"] == "SG"
        assert cfg["sg_window_size"] % 2 == 1

    def test_channel_override_changes_family(self, tmp_path):
        ctx = make_tiny_context(tmp_path)
        plugin = FilteredWaveformsPlugin()
        ctx.register(plugin)
        ctx.set_config({"filtered_waveforms": {"channel_config": {
            "0:1": {"filter_type": "BW", "filter_order": 2,
                    "lowcut": 0.01, "highcut": 0.2, "fs": 0.5},
        }}})
        base = resolve_filter_config(ctx, plugin, run_id="r", board=0, channel=0)
        over = resolve_filter_config(ctx, plugin, run_id="r", board=0, channel=1)
        assert base["filter_type"] == "SG"
        assert over["filter_type"] == "BW"
        assert over["bw_sos"] is not None

    def test_even_sg_window_clamped_odd(self, tmp_path):
        ctx = make_tiny_context(tmp_path)
        plugin = FilteredWaveformsPlugin()
        ctx.register(plugin)
        ctx.set_config({"filtered_waveforms": {"sg_window_size": 8}})
        cfg = resolve_filter_config(ctx, plugin)
        assert cfg["sg_window_size"] == 9

    def test_invalid_configs_raise(self, tmp_path):
        ctx = make_tiny_context(tmp_path)
        plugin = FilteredWaveformsPlugin()
        ctx.register(plugin)
        ctx.set_config({"filtered_waveforms": {"filter_type": "FFT"}})
        # rejected either by Option choices or the resolver itself
        with pytest.raises(Exception, match="FFT|one of|Unsupported"):
            resolve_filter_config(ctx, plugin)
        ctx.set_config({"filtered_waveforms": {"filter_type": "SG"}})
        ctx.set_config({"filtered_waveforms": {
            "filter_type": "SG", "sg_window_size": 5, "sg_poly_order": 7,
        }})
        with pytest.raises(ValueError, match="poly order"):
            resolve_filter_config(ctx, plugin)


class TestPerChannelApplication:
    def test_channels_filtered_independently(self, tmp_path):
        st = _two_channel_st()
        ctx = make_tiny_context(tmp_path, st_waveforms=st)
        ctx.register(FilteredWaveformsPlugin())
        ctx.set_config({"filtered_waveforms": {
            "sg_window_size": 7, "sg_poly_order": 2,
            "channel_config": {
                "0:1": {"sg_window_size": 15, "sg_poly_order": 3},
            },
        }})
        out = ctx.get_data("test_run", "filtered_waveforms")
        waves_out = np.asarray(out["wave"])
        ch = np.asarray(out["channel"])
        src = np.asarray(st["wave"]).astype(np.float64)

        # channel 0: window 7 / poly 2 — matches scipy exactly
        for i in np.flatnonzero(ch == 0)[:3]:
            expected = savgol_filter(src[i], 7, 2, mode="interp")
            np.testing.assert_allclose(
                waves_out[i], expected.astype(np.float32), atol=2e-3,
            )
        # channel 1: window 15 / poly 3
        for i in np.flatnonzero(ch == 1)[:3]:
            expected = savgol_filter(src[i], 15, 3, mode="interp")
            np.testing.assert_allclose(
                waves_out[i], expected.astype(np.float32), atol=2e-3,
            )
        # cross-check: the two parameterizations actually differ
        i1 = int(np.flatnonzero(ch == 1)[0])
        not_base = savgol_filter(src[i1], 7, 2, mode="interp")
        assert not np.allclose(waves_out[i1], not_base, atol=1e-4)

    def test_override_rotates_lineage(self, tmp_path):
        ctx = make_tiny_context(tmp_path, st_waveforms=_two_channel_st())
        ctx.register(FilteredWaveformsPlugin())
        k1 = ctx.key_for("test_run", "filtered_waveforms")
        ctx.set_config({"filtered_waveforms": {"channel_config": {
            "0:1": {"sg_window_size": 15},
        }}})
        k2 = ctx.key_for("test_run", "filtered_waveforms")
        assert k1 != k2
