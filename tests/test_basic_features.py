"""basic_features parity tests: device kernel vs an independent NumPy
reference implementation (tolerance-based, per SURVEY §4 test strategy)."""

import numpy as np
import pytest

from waveformanalysis_tpu.dtypes.table import Table
from waveformanalysis_tpu.ops import features as F
from waveformanalysis_tpu.plugins.builtin.basic_features import BasicFeaturesPlugin
from waveformanalysis_tpu.testing.fixtures import make_fake_st_waveforms, make_tiny_context


def numpy_reference_features(waves, baselines, polarities, height_range, area_range):
    """Independent NumPy implementation of the reference per-event loop
    semantics (basic_features.py:224-265) for parity checking."""
    n = len(waves)
    height = np.zeros(n, np.float32)
    amp = np.zeros(n, np.float32)
    area = np.zeros(n, np.float32)
    mad = np.zeros(n, np.float32)
    sp, ep = height_range
    sc, ec = area_range
    for i in range(n):
        wave = waves[i]
        b = float(baselines[i])
        pol = polarities[i] if polarities[i] in ("positive", "negative") else "negative"
        wp = wave[sp:ep]
        if wp.size > 0:
            wmin, wmax = float(np.min(wp)), float(np.max(wp))
            height[i] = (wmax - b) if pol == "positive" else (b - wmin)
            amp[i] = wmax - wmin
        wc = wave[sc:ec].astype(np.float64)
        if wc.size > 0:
            area[i] = float(np.sum(wc - b)) if pol == "positive" else float(np.sum(b - wc))
        if wave.size > 1:
            mad[i] = float(np.max(np.abs(np.diff(wave.astype(np.float64)))))
    return height, amp, area, mad


@pytest.mark.parametrize("polarity", ["negative", "positive"])
@pytest.mark.parametrize("height_range,area_range", [
    ((40, 90), (0, None)),
    ((0, None), (10, 100)),
    ((0, 5), (0, 5)),
])
def test_kernel_parity_with_numpy(polarity, height_range, area_range):
    rng = np.random.default_rng(7)
    n, L = 64, 128
    waves = rng.integers(500, 1500, size=(n, L)).astype(np.int16)
    baselines = 1000.0 + rng.normal(0, 3, n)
    pol_codes = np.full(n, 1 if polarity == "positive" else -1, dtype=np.int8)
    event_length = np.full(n, L, dtype=np.int32)

    feats = F.basic_features_from_waves(
        waves, event_length, baselines, pol_codes,
        height_range=height_range, area_range=area_range,
    )
    h, a, ar, mad = numpy_reference_features(
        waves, baselines, [polarity] * n, height_range, area_range
    )
    np.testing.assert_array_equal(feats["height"], h)
    np.testing.assert_array_equal(feats["amp"], a)
    np.testing.assert_array_equal(feats["area"], ar)  # exact: f64 combine
    np.testing.assert_array_equal(feats["max_abs_diff"], mad)


def test_variable_event_length():
    """Padding beyond event_length must not leak into features."""
    n, L = 8, 64
    waves = np.full((n, L), 1000, dtype=np.int16)
    waves[:, 30:40] = 800  # pulse
    waves[:, 50:] = -30000  # garbage in the padded tail
    event_length = np.full(n, 50, dtype=np.int32)
    feats = F.basic_features_from_waves(
        waves, event_length, np.full(n, 1000.0), np.full(n, -1, np.int8),
        height_range=(0, None), area_range=(0, None),
    )
    np.testing.assert_array_equal(feats["height"], np.full(n, 200.0, np.float32))
    np.testing.assert_array_equal(feats["area"], np.full(n, 2000.0, np.float32))
    # diff at the 49->50 boundary must be excluded
    assert feats["max_abs_diff"].max() == 200.0


def test_empty_window_gives_zero():
    n, L = 4, 32
    waves = np.full((n, L), 1000, dtype=np.int16)
    feats = F.basic_features_from_waves(
        waves, np.full(n, L, np.int32), np.full(n, 1000.0), np.full(n, -1, np.int8),
        height_range=(40, 90),  # beyond L -> empty
        area_range=(0, None),
    )
    np.testing.assert_array_equal(feats["height"], np.zeros(n, np.float32))
    np.testing.assert_array_equal(feats["amp"], np.zeros(n, np.float32))


def test_device_combine_close_to_host():
    rng = np.random.default_rng(3)
    n, L = 32, 256
    waves = rng.integers(0, 4000, size=(n, L)).astype(np.int16)
    baselines = 2000.0 + rng.normal(0, 5, n)
    pol = np.full(n, -1, np.int8)
    el = np.full(n, L, np.int32)
    exact = F.basic_features_from_waves(waves, el, baselines, pol, host_combine=True)
    approx = F.basic_features_from_waves(waves, el, baselines, pol, host_combine=False)
    np.testing.assert_allclose(approx["area"], exact["area"], rtol=1e-5, atol=0.5)
    np.testing.assert_allclose(approx["height"], exact["height"], rtol=1e-6, atol=1e-3)


def test_compute_baselines():
    waves = np.array([[10, 20, 30, 40, 50, 60]], dtype=np.int16)
    b = F.compute_baselines(waves, window=(0, 4))
    np.testing.assert_allclose(b, [25.0])
    b2 = F.compute_baselines(waves, window=(0, 20))  # clamped to wave length
    np.testing.assert_allclose(b2, [35.0])


class TestBasicFeaturesPlugin:
    def test_end_to_end_on_fixture(self, tmp_path):
        st = make_fake_st_waveforms(n_events=12, wave_length=128, pulse_start=50,
                                    pulse_width=10, pulse_height=200)
        ctx = make_tiny_context(tmp_path, st_waveforms=st)
        ctx.register(BasicFeaturesPlugin())
        out = ctx.get_data("test_run", "basic_features")
        assert isinstance(out, Table)
        assert len(out) == 12
        # pulse 200 below baseline within default height_range (40, 90)
        np.testing.assert_allclose(np.asarray(out["height"]), 200.0)
        np.testing.assert_allclose(np.asarray(out["area"]), 2000.0)  # 10 * 200
        np.testing.assert_array_equal(
            np.asarray(out["channel"]), st["channel"]
        )

    def test_parity_against_reference_loop(self, tmp_path):
        st = make_fake_st_waveforms(n_events=24, wave_length=96, noise_rms=5.0,
                                    seed=11)
        ctx = make_tiny_context(tmp_path, st_waveforms=st)
        ctx.register(BasicFeaturesPlugin())
        ctx.set_config({"basic_features": {"height_range": (10, 80),
                                           "area_range": (5, 90)}})
        out = ctx.get_data("test_run", "basic_features")
        h, a, ar, mad = numpy_reference_features(
            st["wave"], st["baseline"], list(st["polarity"]), (10, 80), (5, 90)
        )
        np.testing.assert_array_equal(np.asarray(out["height"]), h)
        np.testing.assert_array_equal(np.asarray(out["amp"]), a)
        np.testing.assert_array_equal(np.asarray(out["area"]), ar)
        np.testing.assert_array_equal(np.asarray(out["max_abs_diff"]), mad)

    def test_fixed_baseline_channel_override(self, tmp_path):
        st = make_fake_st_waveforms(n_events=8, wave_length=64, pulse_start=20,
                                    pulse_width=5, pulse_height=100)
        ctx = make_tiny_context(tmp_path, st_waveforms=st)
        ctx.register(BasicFeaturesPlugin())
        ctx.set_config({
            "basic_features": {
                "height_range": (0, None),
                "channel_config": {"channels": {"0:1": {"fixed_baseline": 1100.0}}},
            }
        })
        out = ctx.get_data("test_run", "basic_features")
        ch = np.asarray(out["channel"])
        h = np.asarray(out["height"])
        np.testing.assert_allclose(h[ch == 0], 100.0)  # baseline 1000
        np.testing.assert_allclose(h[ch == 1], 200.0)  # overridden baseline 1100

    def test_cache_roundtrip(self, tmp_path):
        st = make_fake_st_waveforms(n_events=6, wave_length=64)
        ctx = make_tiny_context(tmp_path / "s", st_waveforms=st)
        ctx.register(BasicFeaturesPlugin())
        out1 = ctx.get_data("test_run", "basic_features")
        # fresh context, same storage; re-inject manual upstream
        ctx2 = make_tiny_context(tmp_path / "s", st_waveforms=st)
        ctx2.register(BasicFeaturesPlugin())
        out2 = ctx2.get_data("test_run", "basic_features")
        assert isinstance(out2, Table)
        np.testing.assert_array_equal(
            np.asarray(out1["area"]), np.asarray(out2["area"])
        )

    def test_empty_input(self, tmp_path):
        st = make_fake_st_waveforms(n_events=0, wave_length=64)
        ctx = make_tiny_context(tmp_path, st_waveforms=st)
        ctx.register(BasicFeaturesPlugin())
        out = ctx.get_data("test_run", "basic_features")
        assert len(out) == 0
