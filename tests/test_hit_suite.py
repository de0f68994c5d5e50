"""Hit / width / merge / S1-S2 plugin chain tests with reference parity checks."""

import numpy as np
import pytest

from waveformanalysis_tpu.dtypes.table import Table
from waveformanalysis_tpu.ops import hits as HT
from waveformanalysis_tpu.ops import hit_merge as HM
from waveformanalysis_tpu.plugins.builtin.basic_features import BasicFeaturesPlugin
from waveformanalysis_tpu.plugins.builtin.hit_finder import ThresholdHitPlugin
from waveformanalysis_tpu.plugins.builtin.hit_merge import (
    HitMergeClustersPlugin,
    HitMergedComponentsPlugin,
    HitMergePlugin,
)
from waveformanalysis_tpu.plugins.builtin.peak_finding import HitFinderPlugin
from waveformanalysis_tpu.plugins.builtin.s1_s2_classifier import S1S2ClassifierPlugin
from waveformanalysis_tpu.plugins.builtin.waveform_width import WaveformWidthPlugin
from waveformanalysis_tpu.plugins.builtin.waveform_width_integral import (
    WaveformWidthIntegralPlugin,
)
from waveformanalysis_tpu.testing.fixtures import make_fake_st_waveforms, make_tiny_context


def gaussian_pulse_waveforms(n_events=8, wave_length=256, baseline=1000.0,
                             amp=300.0, width=12.0, start=80, seed=0):
    """Positive-going Gaussian pulses (waveform_width assumes positive
    corrected peaks, mirroring the reference's convention)."""
    rng = np.random.default_rng(seed)
    st = make_fake_st_waveforms(n_events=n_events, wave_length=wave_length,
                               baseline=baseline, pulse_height=0,
                               polarity="positive")
    t = np.arange(wave_length)
    waves = np.full((n_events, wave_length), baseline)
    for i in range(n_events):
        c = start + rng.integers(0, 40)
        waves[i] += amp * np.exp(-((t - c) ** 2) / (2 * width**2))
    st["wave"] = np.round(waves).astype(np.int16)
    st["baseline"] = baseline
    return st


@pytest.fixture
def chain_ctx(tmp_path):
    st = gaussian_pulse_waveforms()
    ctx = make_tiny_context(tmp_path, st_waveforms=st)
    ctx.register(
        HitFinderPlugin(), ThresholdHitPlugin(), HitMergePlugin(),
        HitMergeClustersPlugin(), HitMergedComponentsPlugin(),
        WaveformWidthPlugin(), WaveformWidthIntegralPlugin(),
        BasicFeaturesPlugin(), S1S2ClassifierPlugin(),
    )
    return ctx


class TestHitPlugin:
    def test_derivative_mode_finds_pulses(self, chain_ctx):
        # smooth sigma=12 Gaussians have small per-sample derivatives
        chain_ctx.set_config({"hit": {"height": 5.0, "prominence": 0.7,
                                      "width": 2}})
        hits = chain_ctx.get_data("test_run", "hit")
        assert len(hits) >= 8  # at least one hit per event
        assert np.all(np.asarray(hits["height"]) > 0)
        # global ts = event ts + pos * dt * 1000
        h0 = hits[np.asarray(hits["record_id"]) == 0]
        pos = np.asarray(h0["position"])[0]
        assert np.asarray(h0["timestamp"])[0] == 0 + pos * 2 * 1000

    def test_inversion_mode(self, chain_ctx):
        chain_ctx.set_config({"hit": {"use_derivative": False, "height": 100.0,
                                      "prominence": 50.0, "width": 2}})
        hits = chain_ctx.get_data("test_run", "hit")
        assert len(hits) == 8  # exactly one Gaussian per event
        # inversion-mode position is the pulse extremum (max for positive)
        st = chain_ctx._results[("test_run", "st_waveforms")]
        for rid in range(8):
            h = hits[np.asarray(hits["record_id"]) == rid]
            wave = st["wave"][rid]
            assert abs(int(np.asarray(h["position"])[0]) - int(np.argmax(wave))) <= 1

    def test_threshold_option_filters(self, chain_ctx):
        # scipy neighbor-threshold (supported since hit 3.2.0): an
        # impossible requirement (both neighbor diffs >= 1e6) kills every
        # peak; a permissive one changes nothing
        base = chain_ctx.clone()
        base.set_config({"hit": {"use_derivative": False, "height": 100.0,
                                 "prominence": 50.0, "width": 2}})
        n_base = len(base.get_data("test_run", "hit"))
        assert n_base > 0

        strict = chain_ctx.clone()
        strict.set_config({"hit": {"use_derivative": False, "height": 100.0,
                                   "prominence": 50.0, "width": 2,
                                   "threshold": 1e6}})
        assert len(strict.get_data("test_run", "hit")) == 0

        loose = chain_ctx.clone()
        loose.set_config({"hit": {"use_derivative": False, "height": 100.0,
                                  "prominence": 50.0, "width": 2,
                                  "threshold": (None, 1e6)}})
        assert len(loose.get_data("test_run", "hit")) == n_base

    def test_threshold_option_malformed(self, chain_ctx):
        chain_ctx.set_config({"hit": {"threshold": (1.0, 2.0, 3.0)}})
        with pytest.raises(ValueError, match="2-sequence"):
            chain_ctx.get_data("test_run", "hit")


class TestThresholdHits:
    def test_runs_and_times(self):
        # synthetic: one clean square pulse
        signal = np.zeros((1, 64), np.float32)
        signal[0, 20:30] = 50.0
        import jax.numpy as jnp

        res = HT.threshold_hits_batch(
            jnp.asarray(signal), jnp.asarray(np.array([10.0], np.float32)),
            jnp.asarray(np.array([64], np.int32)),
            left_extension=2, right_extension=2,
        )
        res = {k: np.asarray(v) for k, v in res.items()}
        assert res["valid"][0].sum() == 1
        assert res["run_start"][0, 0] == 20
        assert res["run_end"][0, 0] == 30
        assert res["seg_start"][0, 0] == 18
        assert res["seg_end"][0, 0] == 32
        assert res["height"][0, 0] == 50.0
        assert res["integral"][0, 0] == 500.0

    def test_plugin_end_to_end(self, chain_ctx):
        chain_ctx.set_config({"hit_threshold": {"threshold": 100.0}})
        hits = chain_ctx.get_data("test_run", "hit_threshold")
        assert len(hits) == 8
        # rise/fall in ns using dt=2
        assert np.all(np.asarray(hits["rise_time"]) % 2 == 0)
        assert np.all(np.asarray(hits["width"]) > 0)

    def test_per_channel_threshold_override(self, chain_ctx):
        chain_ctx.set_config({"hit_threshold": {
            "threshold": 100.0,
            "channel_config": {"channels": {"0:1": {"threshold": 1e9}}},
        }})
        hits = chain_ctx.get_data("test_run", "hit_threshold")
        # channel 1 suppressed by absurd threshold
        assert set(np.asarray(hits["channel"]).tolist()) == {0}


class TestHitMerge:
    def test_cluster_gap_rule(self):
        # 3 hits on one channel: first two within gap, third far away
        hits = {
            "position": np.array([10, 40, 500], np.int64),
            "height": np.array([10.0, 20.0, 5.0], np.float32),
            "integral": np.array([1.0, 2.0, 3.0], np.float32),
            "edge_start": np.array([8, 38, 498], np.int64),
            "edge_end": np.array([12, 42, 502], np.int64),
            "width": np.array([4.0, 4.0, 4.0], np.float32),
            "dt": np.array([2, 2, 2], np.int64),
            "rise_time": np.zeros(3, np.float32),
            "fall_time": np.zeros(3, np.float32),
            # ts(ps): windows [8,12],[38,42] at dt=2ns -> gap 26 samples = 52ns
            "timestamp": np.array([10 * 2000, 40 * 2000, 500 * 2000], np.int64),
            "board": np.zeros(3, np.int16),
            "channel": np.zeros(3, np.int16),
            "record_id": np.zeros(3, np.int64),
        }
        merged, clusters, comps = HM.merge_hits(hits, merge_gap_ns=60.0)
        assert len(merged["position"]) == 2
        # first merged: anchor = higher hit (idx 1), window union, summed integral
        assert merged["height"][0] == 20.0
        assert merged["integral"][0] == 3.0
        assert merged["sample_start"][0] == 8
        assert merged["sample_end"][0] == 42
        assert merged["component_count"].tolist() == [2, 1]
        assert comps[:, 1].tolist() == [0, 1, 2]

        # smaller gap: no merging
        merged2, _, _ = HM.merge_hits(hits, merge_gap_ns=10.0)
        assert len(merged2["position"]) == 3

    def test_plugin_chain(self, chain_ctx):
        chain_ctx.set_config({"hit_threshold": {"threshold": 100.0}})
        merged = chain_ctx.get_data("test_run", "hit_merged")
        clusters = chain_ctx.get_data("test_run", "hit_merge_clusters")
        comps = chain_ctx.get_data("test_run", "hit_merged_components")
        assert len(merged) > 0
        assert len(comps) == int(np.asarray(merged["component_count"]).sum())
        assert len(clusters) == len(comps)


class TestWaveformWidth:
    def test_gaussian_width_math(self, chain_ctx):
        chain_ctx.set_config({"hit": {"use_derivative": False, "height": 100.0,
                                      "prominence": 50.0, "width": 2}})
        widths = chain_ctx.get_data("test_run", "waveform_width")
        assert len(widths) == 8
        rt = np.asarray(widths["rise_time_samples"])
        ft = np.asarray(widths["fall_time_samples"])
        # Gaussian sigma=12: 10%-90% distance = sigma*(sqrt(2ln10)-sqrt(2ln(10/9)))
        expected = 12.0 * (np.sqrt(2 * np.log(10)) - np.sqrt(2 * np.log(10 / 9)))
        np.testing.assert_allclose(rt, expected, atol=0.6)
        np.testing.assert_allclose(ft, expected, atol=0.6)
        # ns conversion at default 0.5 GHz: ns = samples / 0.5
        np.testing.assert_allclose(
            np.asarray(widths["rise_time"]), rt / 0.5, rtol=1e-6
        )

    def test_skips_nonpositive_peaks(self, tmp_path):
        st = make_fake_st_waveforms(n_events=2, wave_length=64, pulse_height=0)
        ctx = make_tiny_context(tmp_path, st_waveforms=st)
        ctx.register(HitFinderPlugin(), WaveformWidthPlugin())
        ctx.inject_data("test_run", "hit", Table({
            "position": np.array([30], np.int64),
            "height": np.array([1.0], np.float32),
            "integral": np.zeros(1, np.float32),
            "edge_start": np.zeros(1, np.float32),
            "edge_end": np.zeros(1, np.float32),
            "dt": np.array([2], np.int32),
            "timestamp": np.zeros(1, np.int64),
            "board": np.zeros(1, np.int16),
            "channel": np.zeros(1, np.int16),
            "record_id": np.array([0], np.int64),
        }))
        widths = ctx.get_data("test_run", "waveform_width")
        assert len(widths) == 0  # flat wave -> corrected peak <= 0 -> skipped


class TestWidthIntegral:
    def test_quantile_parity_with_numpy(self, chain_ctx):
        out = chain_ctx.get_data("test_run", "waveform_width_integral")
        st = chain_ctx._results[("test_run", "st_waveforms")]
        assert len(out) == 8
        for i in range(8):
            wave = st["wave"][i].astype(np.float64)
            signal = np.maximum(wave - st["baseline"][i], 0)  # positive polarity
            q_total = signal.sum()
            csum = np.cumsum(signal)
            t_low = np.searchsorted(csum, 0.10 * q_total, side="left")
            t_high = np.searchsorted(csum, 0.90 * q_total, side="left")
            assert np.asarray(out["t_low_samples"])[i] == t_low
            assert np.asarray(out["t_high_samples"])[i] == t_high
            np.testing.assert_allclose(np.asarray(out["q_total"])[i], q_total,
                                       rtol=1e-5)


class TestS1S2:
    def test_classification(self, chain_ctx):
        chain_ctx.set_config({
            "hit": {"use_derivative": False, "height": 100.0,
                    "prominence": 50.0, "width": 2},
            "s1_s2": {
                "width_unit": "samples",
                "s1_width_range": (0, 10),      # narrower than our Gaussians
                "s2_width_range": (20, 500),    # matches sigma=12 pulses
            },
        })
        out = chain_ctx.get_data("test_run", "s1_s2")
        assert len(out) == 8
        labels = np.asarray(out["label"])
        np.testing.assert_array_equal(labels, 2)  # all S2
        assert not np.any(np.isnan(np.asarray(out["area"])))

    def test_conflict_policy(self, chain_ctx):
        chain_ctx.set_config({
            "hit": {"use_derivative": False, "height": 100.0,
                    "prominence": 50.0, "width": 2},
            "s1_s2": {
                "width_unit": "samples",
                "s1_width_range": (0, 1000),
                "s2_width_range": (0, 1000),
                "conflict_policy": "prefer_s1",
            },
        })
        out = chain_ctx.get_data("test_run", "s1_s2")
        np.testing.assert_array_equal(np.asarray(out["label"]), 1)

    def test_strict_without_criteria(self, chain_ctx):
        chain_ctx.set_config({"s1_s2": {"strict": True}})
        with pytest.raises(ValueError, match="criteria"):
            chain_ctx.get_data("test_run", "s1_s2")
